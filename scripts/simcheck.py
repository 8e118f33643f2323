"""Normalized similarity check between repo files and reference counterparts.

Strips comments, docstrings, and blank lines, then computes difflib ratio.
Used to verify rewrites are genuinely original (target < 0.5).
"""

import difflib
import io
import re
import sys
import tokenize

PAIRS = {
    'daydreamer_tpu/replay/stores.py': 'embodied/replay/store.py',
    'daydreamer_tpu/core/config.py': 'embodied/core/config.py',
    'daydreamer_tpu/core/wrappers.py': 'embodied/core/wrappers.py',
    'daydreamer_tpu/replay/fixed_length.py': 'embodied/replay/fixed_length.py',
    'daydreamer_tpu/replay/consecutive.py': 'embodied/replay/consecutive.py',
    'daydreamer_tpu/core/driver.py': 'embodied/core/driver.py',
    'daydreamer_tpu/core/when.py': 'embodied/core/when.py',
    'daydreamer_tpu/core/batch.py': 'embodied/core/batch.py',
    'daydreamer_tpu/replay/priorities.py': 'embodied/replay/prios.py',
    'daydreamer_tpu/core/base.py': 'embodied/core/base.py',
    'daydreamer_tpu/core/flags.py': 'embodied/core/flags.py',
    'daydreamer_tpu/core/counter.py': 'embodied/core/counter.py',
    'daydreamer_tpu/replay/prioritized.py': 'embodied/replay/prioritized.py',
    'daydreamer_tpu/run/train_eval.py': 'embodied/run/train_eval.py',
    'daydreamer_tpu/run/train_fixed_eval.py': 'embodied/run/train_fixed_eval.py',
    'daydreamer_tpu/run/acting.py': 'embodied/run/acting.py',
    'daydreamer_tpu/run/train.py': 'embodied/run/train.py',
    'daydreamer_tpu/envs/atari.py': 'embodied/envs/atari.py',
    'daydreamer_tpu/run/learning.py': 'embodied/run/learning.py',
    'daydreamer_tpu/core/path.py': 'embodied/core/path.py',
    'daydreamer_tpu/core/timer.py': 'embodied/core/timer.py',
    'daydreamer_tpu/envs/__init__.py': 'embodied/envs/__init__.py',
    'daydreamer_tpu/core/logger.py': 'embodied/core/logger.py',
    'daydreamer_tpu/core/space.py': 'embodied/core/space.py',
    'daydreamer_tpu/envs/gym.py': 'embodied/envs/gym.py',
}


def normalize(text):
  out = []
  try:
    toks = list(tokenize.generate_tokens(io.StringIO(text).readline))
  except Exception:
    toks = None
  if toks is not None:
    lines = text.splitlines()
    drop = set()
    for tok in toks:
      if tok.type == tokenize.COMMENT:
        continue
      if tok.type == tokenize.STRING and tok.string.startswith(('"""', "'''", 'r"""', "r'''")):
        for ln in range(tok.start[0], tok.end[0] + 1):
          drop.add(ln)
    for i, line in enumerate(lines, 1):
      if i in drop:
        continue
      line = re.sub(r'#.*$', '', line).rstrip()
      if line.strip():
        out.append(line)
    return '\n'.join(out)
  for line in text.splitlines():
    line = re.sub(r'#.*$', '', line).rstrip()
    if line.strip():
      out.append(line)
  return '\n'.join(out)


def main():
  import pathlib
  repo = pathlib.Path('/root/repo')
  ref = pathlib.Path('/root/reference')
  rows = []
  for ours, theirs in PAIRS.items():
    a = repo / ours
    b = ref / theirs
    if not a.exists() or not b.exists():
      rows.append((ours, float('nan')))
      continue
    na = normalize(a.read_text())
    nb = normalize(b.read_text())
    ratio = difflib.SequenceMatcher(None, na, nb).ratio()
    rows.append((ours, ratio))
  bad = 0
  for name, ratio in sorted(rows, key=lambda r: -r[1]):
    flag = ' <-- HIGH' if ratio >= 0.5 else ''
    if ratio >= 0.5:
      bad += 1
    print(f'{ratio:.3f}  {name}{flag}')
  sys.exit(1 if bad else 0)


if __name__ == '__main__':
  main()
