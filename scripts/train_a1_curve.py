"""Full-scale A1 walking curve run with pinned, reproducible provenance.

Reproduces the scores/a1_dreamer_tpu*.json curve runs: `--configs a1
--task a1_sim --run train` (MuJoCo A1, RMA stand+walk reward, proprio-only
world model per the a1 config block), TPU learner with the host-CPU policy
mirror, env render off, 105k env steps (the reference's a1_dreamer.json
spans ~94k; BASELINE.md). The ONLY intended degree of freedom between runs
is --seed.

After the run finishes this script copies the provenance the curve needs
to be reproducible — the resolved config.yaml, metrics.jsonl, and
scores.jsonl — into scores/provenance/a1_seed{N}/, and exports the curve
to scores/a1_dreamer_tpu{_sN}.json in the reference format (per-step
reward vs env steps; reference: scores/a1_dreamer.json).

Usage: python scripts/train_a1_curve.py --seed 1 [--steps 105000]
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
  parser.add_argument('--seed', type=int, required=True)
  parser.add_argument('--steps', type=int, default=105000)
  parser.add_argument('--logdir', default='')
  parser.add_argument('--export', action='store_true', default=True)
  parser.add_argument('--no-export', dest='export', action='store_false')
  args, extra = parser.parse_known_args()
  if extra:
    # Extra flags (smoke tests shrink the nets); RUN.json records them so
    # a curve produced with overrides can never masquerade as pinned.
    print('train_a1_curve EXTRA OVERRIDES:', extra, flush=True)

  logdir = pathlib.Path(
      args.logdir or (ROOT / 'runs' / f'a1_seed{args.seed}'))

  from daydreamer_tpu.agents.dreamer.train import main as train_main
  flags = {
      'configs': 'a1',
      'task': 'a1_sim',
      'run': 'train',
      'logdir': str(logdir),
      # train.py derives env.seed from (seed, worker), so this one flag
      # pins both the agent and environment seed streams.
      'seed': str(args.seed),
      'env.render': 'False',
      'env.parallel': 'process',
      # Robot-actor policy path: jit the policy on the host CPU against
      # the tracked param mirror; every policy call then avoids the
      # tunneled-backend RPC round trip (~25 ms floor).
      'jax.policy_devices': 'cpu',
      'train.steps': str(args.steps),
      'train.log_every': '250',
      'train.eval_every': '5000',
  }
  argv = []
  for key, value in flags.items():
    argv += [f'--{key}', value]
  argv += extra
  print('train_a1_curve argv:', argv, flush=True)
  start = time.time()
  train_main(argv)
  print(f'A1 curve run (seed {args.seed}) finished in '
        f'{time.time() - start:.0f}s', flush=True)

  if not args.export:
    return
  # Provenance: resolved config + raw metric streams, committed verbatim.
  prov = ROOT / 'scores' / 'provenance' / f'a1_seed{args.seed}'
  prov.mkdir(parents=True, exist_ok=True)
  for name in ('config.yaml', 'metrics.jsonl', 'scores.jsonl'):
    src = logdir / name
    if src.exists():
      shutil.copy2(src, prov / name)
  (prov / 'RUN.json').write_text(json.dumps({
      'argv': argv,
      'script': 'scripts/train_a1_curve.py',
      'duration_s': round(time.time() - start),
  }, indent=2))

  from scripts.scores import cmd_export
  suffix = '' if args.seed == 0 else f'_s{args.seed}'
  out = ROOT / 'scores' / f'a1_dreamer_tpu{suffix}.json'
  # xdiv undoes the logger's env.repeat=50 frame multiplier (curve x-axis
  # is env steps, matching reference scores/a1_dreamer.json: ~251/episode);
  # ydiv converts episode score to per-step reward (env.length=250).
  ns = argparse.Namespace(
      logdir=[str(logdir)], task='a1_walk', method='dreamer_tpu',
      out=str(out), xdiv=50, ydiv=250)
  cmd_export(ns)
  # Stamp the real seed (cmd_export numbers runs by position).
  runs = json.loads(out.read_text())
  for run in runs:
    run['seed'] = str(args.seed)
  out.write_text(json.dumps(runs))
  print(f'exported {out}')


if __name__ == '__main__':
  main()
