"""End-to-end train throughput: rssm.impl=pallas vs scan on the real chip.

The PALLAS_PROOF standalone rows show the fused observe chain wins ~1.8x
on its own; this measures what that buys the FULL fused train step
(device-replay learner path, the bench.py methodology) at the a1 and
xarm training shapes. The SURVEY rule gates making pallas the default on
this number.

Usage: python scripts/fused_impl_bench.py [--out FUSED_IMPL_BENCH.json]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench


def run_shape(name, task, overrides, K, budget):
  rows = {}
  for impl in ('scan', 'pallas'):
    agent, data = bench.build_agent(task, {
        **overrides, 'rssm.impl': impl})
    res, _ = bench.measure_updates(
        agent, data, K=K, sample_budget_s=budget, calls=1)
    rows[impl] = {k: res[k] for k in
                  ('updates_per_s', 'compile_time_s', 'mfu')}
    print(name, impl, json.dumps(rows[impl]), flush=True)
  rows['speedup'] = round(
      rows['pallas']['updates_per_s'] / rows['scan']['updates_per_s'], 4)
  return rows


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--out', default='')
  args = parser.parse_args()
  result = {}
  result['a1'] = run_shape('a1', 'a1_dummy', {
      'replay_chunk': 32, 'batch_size': 32,
      'rssm.deter': 256, 'rssm.units': 256,
      'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^',
      'encoder.mlp_keys': 'vector', 'decoder.mlp_keys': 'vector',
  }, K=64, budget=90.0)
  result['xarm'] = run_shape('xarm', 'xarm_dummy', {
      'replay_chunk': 32, 'batch_size': 32,
      'rssm.deter': 512, 'rssm.units': 512,
      'encoder.cnn_keys': 'image|depth', 'decoder.cnn_keys': 'image|depth',
      'encoder.mlp_keys': 'cartesian|joint|gripper|grasped',
      'decoder.mlp_keys': 'cartesian|joint|gripper|grasped',
  }, K=16, budget=90.0)
  print(json.dumps(result))
  if args.out:
    pathlib.Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == '__main__':
  main()
