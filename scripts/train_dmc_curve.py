"""Externally-anchored Dreamer curve: dmc_proprio walker_walk.

Unlike the in-house A1/xarm sim curves, walker_walk has publicly known
Dreamer performance to compare against: the DreamerV2 paper (Hafner et
al. 2021, arxiv 2010.02193) reports walker_walk reaching ~900 within
~0.5M env frames (proprio variants converge faster than vision), and the
reference's dmc_proprio config block targets exactly this suite
(reference: embodied/agents/dreamerv2plus/configs.yaml dmc_proprio —
default model size, env.repeat 2, train_every 2).

This run pins `--configs dmc_proprio --task dmc_walker_walk --run train`
with the reference hyperparameters (default-size nets, deter 1024). The
only intended degrees of freedom are --seed and --steps (frame budget).
env.render=False skips the unused 64x64 camera render (proprio encoder;
~25ms/frame software EGL on this box) — an execution-speed knob only,
observations and training are unchanged.

Writes scores/dmc_walker_walk_tpu.json (x = env frames, y = episode
return) + provenance under scores/provenance/dmc_walker_walk_seed{N}/.

Usage: python scripts/train_dmc_curve.py --seed 0 [--steps 400000]
"""

import argparse
import json
import pathlib
import shutil
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--seed', type=int, default=0)
  parser.add_argument('--steps', type=int, default=400000,
                      help='env frames (logger steps; repeat-2 included)')
  parser.add_argument('--logdir', default='')
  parser.add_argument('--export', action='store_true', default=True)
  parser.add_argument('--no-export', dest='export', action='store_false')
  args, extra = parser.parse_known_args()
  if extra:
    print('train_dmc_curve EXTRA OVERRIDES:', extra, flush=True)

  logdir = pathlib.Path(
      args.logdir or (ROOT / 'runs' / f'dmc_walker_seed{args.seed}'))

  from daydreamer_tpu.agents.dreamer.train import main as train_main
  flags = {
      'configs': 'dmc_proprio',
      'task': 'dmc_walker_walk',
      'run': 'train',
      'logdir': str(logdir),
      'seed': str(args.seed),
      'env.render': 'False',
      'env.parallel': 'process',
      'jax.policy_devices': 'cpu',
      'train.steps': str(args.steps),
      'train.log_every': '2000',
      'train.eval_every': '25000',
  }
  argv = []
  for key, value in flags.items():
    argv += [f'--{key}', value]
  argv += extra
  print('train_dmc_curve argv:', argv, flush=True)
  start = time.time()
  train_main(argv)
  duration = time.time() - start
  print(f'dmc curve run (seed {args.seed}) finished in {duration:.0f}s',
        flush=True)

  if not args.export:
    return
  prov = ROOT / 'scores' / 'provenance' / f'dmc_walker_walk_seed{args.seed}'
  prov.mkdir(parents=True, exist_ok=True)
  for name in ('config.yaml', 'metrics.jsonl', 'scores.jsonl'):
    src = logdir / name
    if src.exists():
      shutil.copy2(src, prov / name)
  (prov / 'RUN.json').write_text(json.dumps({
      'argv': argv,
      'script': 'scripts/train_dmc_curve.py',
      'duration_s': round(duration),
      'external_anchor': (
          'DreamerV2 (arxiv 2010.02193) walker_walk: ~900 by ~0.5M '
          'frames; ~600+ typical by ~200-300k frames'),
  }, indent=2))

  from scripts.scores import cmd_export
  suffix = '' if args.seed == 0 else f'_s{args.seed}'
  out = ROOT / 'scores' / f'dmc_walker_walk_tpu{suffix}.json'
  # Logger steps already count env frames (multiplier env.repeat=2 over
  # wrapped driver steps); episode score is the raw return, directly
  # comparable to published walker_walk curves (0-1000 scale).
  ns = argparse.Namespace(
      logdir=[str(logdir)], task='dmc_walker_walk', method='dreamer_tpu',
      out=str(out), xdiv=1, ydiv=1)
  cmd_export(ns)
  runs = json.loads(out.read_text())
  for run in runs:
    run['seed'] = str(args.seed)
  out.write_text(json.dumps(runs))
  print(f'exported {out}')


if __name__ == '__main__':
  main()
