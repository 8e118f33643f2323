"""End-to-end train throughput: imag_impl=pallas vs scan on the real chip.

Measures what the fused policy-in-the-loop imagination rollout
(ops/pallas_rssm.imagine_actor_pallas) buys the FULL fused train step at
the xarm training shape — the discrete/reinforce robot config where the
fused path engages. The a1 flagship is continuous (backprop-through-
dynamics): its rollout runs inside the actor loss, so the forward-only
kernel does not apply and the scan stays (documented fallback in
ImagActorCritic._fused_imagine_ok).

The SURVEY rule gates default-flipping imag_impl on this number.

Usage: python scripts/imag_impl_bench.py [--out IMAG_IMPL_BENCH.json]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench

XARM = {
    'replay_chunk': 32, 'batch_size': 32,
    'rssm.deter': 512, 'rssm.units': 512,
    'encoder.cnn_keys': 'image|depth', 'decoder.cnn_keys': 'image|depth',
    'encoder.mlp_keys': 'cartesian|joint|gripper|grasped',
    'decoder.mlp_keys': 'cartesian|joint|gripper|grasped',
    'rssm.impl': 'pallas',
}


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--out', default='')
  parser.add_argument('--budget', type=float, default=90.0)
  args = parser.parse_args()
  rows = {}
  for impl in ('scan', 'pallas'):
    agent, data = bench.build_agent('xarm_dummy', {
        **XARM, 'imag_impl': impl})
    res, _ = bench.measure_updates(
        agent, data, K=16, sample_budget_s=args.budget, calls=1)
    rows[impl] = {k: res[k] for k in
                  ('updates_per_s', 'compile_time_s', 'mfu')}
    print('xarm imag_impl', impl, json.dumps(rows[impl]), flush=True)
  rows['speedup'] = round(
      rows['pallas']['updates_per_s'] / rows['scan']['updates_per_s'], 4)
  result = {'xarm': rows, 'note': (
      'both arms include the round-5 decoder 1x1-convT dense path and '
      'the fused-observe unimix fix; compare against BENCH_r04 xarm '
      '41.2 updates/s for the combined round-5 delta')}
  print(json.dumps(result))
  if args.out:
    pathlib.Path(args.out).write_text(json.dumps(result, indent=2) + '\n')


if __name__ == '__main__':
  main()
