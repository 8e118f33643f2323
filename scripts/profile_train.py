"""Per-op cost profile of the fused device-replay train step on the chip.

Answers "where do the milliseconds of one gradient update go" for the
production shapes (bench.py --shape a1/xarm): captures a jax.profiler
trace of the warm `agent.train_device` dispatch, parses the XLA-op plane
of the resulting xplane.pb directly (tensorflow.tsl xplane proto — the
tensorboard profile plugin's converters need an older protobuf), and
writes a ranked per-op / per-category table plus a roofline summary
(device-busy vs wall, MXU flops vs memory-bound categories).

Usage:  python scripts/profile_train.py --shape xarm --out PROFILE_XARM.json
"""

import argparse
import collections
import glob
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def categorize(name):
  """Map an XLA op event name to a coarse cost category."""
  # Event names look like: '%convolution_reduce_fusion.3 = bf16[...]
  # fusion(...), kind=kOutput, calls=%fused_computation.3'.
  label = name.split(' = ')[0].lstrip('%')
  # Output type may be a tuple '(f32[...], ...)'; match the opcode as the
  # word right before the operand list instead of assuming a scalar type.
  m = (re.search(r' = \S+ ([\w-]+)\(', name)
       or re.search(r'\) ([\w-]+)\(', name))
  opcode = m.group(1) if m else name.split('(')[0].strip('%')
  if opcode in ('copy-start', 'copy-done', 'copy'):
    return 'copy'
  if 'custom-call' in opcode:
    if 'tpu_custom_call' in name or 'mosaic' in name.lower():
      return 'pallas_kernel'
    return 'custom_call'
  if opcode == 'convolution' or label.startswith('convolution'):
    return 'conv'
  if opcode == 'dot' or label.startswith(('dot', 'matmul')):
    return 'matmul'
  if opcode == 'fusion':
    # Attribute fusions by their auto-generated name prefix, which names
    # the root/most expensive op XLA fused into them.
    head = re.split(r'[.\d]', label)[0]
    if 'convolution' in head:
      return 'conv_fusion'
    if 'dot' in head or 'matmul' in head:
      return 'matmul_fusion'
    if any(k in head for k in ('reduce', 'all_reduce')):
      return 'reduce_fusion'
    if any(k in head for k in ('scatter', 'gather', 'dynamic')):
      return 'gather_scatter_fusion'
    if 'rng' in head or 'bitcast' in head:
      return 'rng_fusion'
    return 'elementwise_fusion'
  if opcode in ('while', 'conditional', 'call'):
    return 'control_flow'
  if 'rng' in opcode:
    return 'rng'
  if opcode in ('dynamic-update-slice', 'dynamic-slice', 'gather', 'scatter'):
    return 'gather_scatter'
  return opcode


def parse_xplane(path):
  """Parse the TPU plane into leaf-op totals with region attribution.

  `while`/control-flow events on the XLA-Ops line INCLUDE their nested
  ops' time (and the nested ops are also logged individually), so naive
  summing double-counts. We instead attribute each LEAF event to its
  innermost enclosing while span — inferred by interval containment on
  the timeline — and report leaf sums per (region, op).
  """
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  xs = xplane_pb2.XSpace()
  with open(path, 'rb') as f:
    xs.ParseFromString(f.read())
  device = None
  for plane in xs.planes:
    if plane.name.startswith('/device:TPU'):
      device = plane
      break
  assert device is not None, [p.name for p in xs.planes]

  events = []      # (start_ps, end_ps, name, is_ctrl)
  modules_ps = 0
  for line in device.lines:
    if line.name == 'XLA Modules':
      for ev in line.events:
        modules_ps += ev.duration_ps
    elif line.name == 'XLA Ops':
      for ev in line.events:
        name = device.event_metadata[ev.metadata_id].name
        label = name.split(' = ')[0].lstrip('%')
        is_ctrl = label.startswith(('while', 'conditional', 'call'))
        events.append(
            (ev.offset_ps, ev.offset_ps + ev.duration_ps, name, is_ctrl))

  # Innermost-enclosing-while attribution via a sweep: sort by start,
  # maintain a stack of control spans covering the current position.
  events.sort(key=lambda e: (e[0], -(e[1] - e[0])))
  stack = []  # (end_ps, label)
  ops = collections.defaultdict(lambda: [0, 0])    # (region, name) -> [ps, n]
  ctrl = collections.defaultdict(lambda: [0, 0])   # name -> [ps, n] inclusive
  for start, end, name, is_ctrl in events:
    while stack and stack[-1][0] <= start:
      stack.pop()
    if is_ctrl:
      label = name.split(' = ')[0].lstrip('%')
      rec = ctrl[label]
      rec[0] += end - start
      rec[1] += 1
      stack.append((end, label))
    else:
      region = stack[-1][1] if stack else 'top'
      rec = ops[(region, name)]
      rec[0] += end - start
      rec[1] += 1
  return ops, ctrl, modules_ps


def profile_shape(shape, trace_dispatches):
  import bench
  import jax

  task, overrides, K = {
      'test': ('dummy_discrete', {
          'replay_chunk': 8, 'batch_size': 8,
          r'.*\.layers': 2, r'.*\.units': 128,
          r'.*\.cnn_depth': 16}, 256),
      'a1': ('a1_dummy', {
          'replay_chunk': 32, 'batch_size': 32,
          'rssm.deter': 256, 'rssm.units': 256,
          'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^',
          'encoder.mlp_keys': 'vector', 'decoder.mlp_keys': 'vector'}, 64),
      'xarm': ('xarm_dummy', {
          'replay_chunk': 32, 'batch_size': 32,
          'rssm.deter': 512, 'rssm.units': 512,
          'encoder.cnn_keys': 'image|depth',
          'decoder.cnn_keys': 'image|depth',
          'encoder.mlp_keys': 'cartesian|joint|gripper|grasped',
          'decoder.mlp_keys': 'cartesian|joint|gripper|grasped',
          'rssm.impl': 'pallas'}, 16),
  }[shape]
  agent, data = bench.build_agent(task, overrides)
  replay = agent.make_device_replay(capacity=4096, block=64)
  episode = {k: v.reshape((-1,) + v.shape[2:]) for k, v in data.items()}
  for _ in range(4096 // len(next(iter(episode.values()))) + 1):
    replay.add_steps(episode)

  start = time.time()
  outs, state, mets = agent.train_device(replay, K)
  jax.block_until_ready(state)
  _ = float(np.asarray(mets['model_loss_mean']).ravel()[-1])
  compile_s = time.time() - start

  # Warm steady-state timing (fetch-synchronized: materialize a metric,
  # see FUSED_DISPATCH_ANOMALY.json).
  for _ in range(2):
    outs, state, mets = agent.train_device(replay, K, state)
  jax.block_until_ready(state)
  _ = float(np.asarray(mets['model_loss_mean']).ravel()[-1])

  tmp = tempfile.mkdtemp(prefix=f'profile_{shape}_')
  start = time.time()
  with jax.profiler.trace(tmp):
    for _ in range(trace_dispatches):
      outs, state, mets = agent.train_device(replay, K, state)
    jax.block_until_ready(state)
    _ = float(np.asarray(mets['model_loss_mean']).ravel()[-1])
  wall_s = time.time() - start

  paths = glob.glob(os.path.join(tmp, 'plugins/profile/*/*.xplane.pb'))
  assert paths, tmp
  ops, ctrl, modules_ps = parse_xplane(paths[0])
  updates = trace_dispatches * K
  return dict(agent=agent, K=K, compile_s=compile_s, wall_s=wall_s,
              updates=updates, ops=ops, ctrl=ctrl, modules_ps=modules_ps,
              trace_dir=tmp)


def build_report(shape, res, top_n=40):
  device_s = res['modules_ps'] * 1e-12
  per_update_ms = 1e3 * res['wall_s'] / res['updates']
  device_per_update_ms = 1e3 * device_s / res['updates']
  per_upd_ms = lambda ps: 1e3 * ps * 1e-12 / res['updates']

  cats = collections.defaultdict(lambda: [0.0, 0])
  regions = collections.defaultdict(lambda: [0.0, 0])
  rows = []
  total_op_ps = sum(v[0] for v in res['ops'].values())
  for (region, name), (ps, count) in res['ops'].items():
    cat = categorize(name)
    cats[cat][0] += ps
    cats[cat][1] += count
    regions[region][0] += ps
    regions[region][1] += count
    rows.append((ps, count, cat, region, name))
  rows.sort(reverse=True)

  def clean(name, limit=160):
    return re.sub(r'\s+', ' ', name)[:limit]

  top_ops = [{
      'ms_per_update': round(per_upd_ms(ps), 4),
      'pct_of_leaf': round(100.0 * ps / max(total_op_ps, 1), 2),
      'count': count, 'category': cat, 'region': region,
      'op': clean(name),
  } for ps, count, cat, region, name in rows[:top_n]]

  categories = sorted(
      ({'category': c,
        'ms_per_update': round(per_upd_ms(v[0]), 4),
        'pct_of_leaf': round(100.0 * v[0] / max(total_op_ps, 1), 2),
        'events': v[1]} for c, v in cats.items()),
      key=lambda r: -r['ms_per_update'])
  region_rows = sorted(
      ({'region': r, 'ms_per_update': round(per_upd_ms(v[0]), 4),
        'events': v[1]} for r, v in regions.items()),
      key=lambda r: -r['ms_per_update'])
  ctrl_rows = sorted(
      ({'while': name, 'inclusive_ms_per_update': round(per_upd_ms(v[0]), 4),
        'executions': v[1]} for name, v in res['ctrl'].items()),
      key=lambda r: -r['inclusive_ms_per_update'])[:8]

  return {
      'shape': shape,
      'fused_K': res['K'],
      'updates_traced': res['updates'],
      'compile_time_s': round(res['compile_s'], 1),
      'wall_ms_per_update': round(per_update_ms, 3),
      'device_busy_ms_per_update': round(device_per_update_ms, 3),
      'leaf_op_ms_per_update': round(per_upd_ms(total_op_ps), 3),
      'dispatch_gap_ms_per_update': round(
          per_update_ms - device_per_update_ms, 3),
      'device_busy_fraction': round(device_s / res['wall_s'], 4),
      'regions': region_rows,
      'control_flow_inclusive': ctrl_rows,
      'categories': categories,
      'top_ops': top_ops,
  }


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--shape', default='xarm',
                      choices=['test', 'a1', 'xarm'])
  parser.add_argument('--dispatches', type=int, default=8)
  parser.add_argument('--out', default=None)
  args = parser.parse_args(argv)

  res = profile_shape(args.shape, args.dispatches)
  report = build_report(args.shape, res)
  text = json.dumps(report, indent=1)
  if args.out:
    with open(args.out, 'w') as f:
      f.write(text + '\n')
  print(text)


if __name__ == '__main__':
  main()
