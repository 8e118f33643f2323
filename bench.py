"""Benchmark: steady-state gradient updates/s of agent.train on one chip.

Three shapes, all on the run=learning hot path (device-resident replay,
K gradient updates fused into one jitted dispatch):

  1. TEST_CONFIG (batch 8, chunk 8, layers 2, units 128, cnn_depth 16) —
     the reference's asserted steady-state train latency is 0.02 s/step
     (50 updates/s) on one GPU with XLA jit at this shape (reference:
     embodied/agents/dreamerv2plus/tests.py:26-71). Headline metric.
  2. a1 training shape (proprio-only, deter/units 256, batch 32,
     chunk 32, default 4x512 heads) — the flagship robot config
     (configs.yaml a1 block).
  3. xarm training shape (RGB image + proprio, deter/units 512,
     cnn_depth 64, batch 32, chunk 32, imag_horizon 15) — the largest
     robot config; reports a real MFU figure.

The reference's own "default-size" budget (0.115 s/step XLA auto-jit,
tests/test_xla_auto.py:19-20) is NOT a comparable workload: its helper
builds the batch as make_data(batch_dims=[batch_size,
config.replay_fixed.length]) with replay_fixed.length = 0
(tests/helpers.py:18-33,95-101 + configs.yaml:12), i.e. a ZERO-length
sequence — the RSSM scan runs no iterations and imagination starts from
0 lanes, so that number times an empty program's dispatch overhead. The
a1/xarm rows below run the real chunk lengths and report MFU so the work
content is explicit.

Also measures policy latency (training device and host-CPU policy
mirror) as a median over windows of calls with a congestion guard — the
tunneled shared backend can serve multi-second windows that a single
unguarded average would absorb (this happened in BENCH_r03) — plus the
backend's null-RPC round-trip floor for context, and gates the results
against the robot budgets (50 ms host mirror, reference
robot_interface.py:293; device-minus-null-RTT <= 10 ms).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

import numpy as np

BASELINE_UPDATES_PER_S = 1.0 / 0.02  # reference tests.py:70-71

# Peak dense bf16 FLOP/s per chip, keyed by jax device_kind.
PEAK_BF16 = {
    'TPU v4': 275e12,
    'TPU v5 lite': 197e12,  # v5e
    'TPU v5': 459e12,       # v5p
    'TPU v5p': 459e12,
    'TPU v6 lite': 918e12,  # Trillium
}

# Peak HBM bandwidth per chip (bytes/s).
PEAK_HBM = {
    'TPU v4': 1228e9,
    'TPU v5 lite': 819e9,   # v5e
    'TPU v5': 2765e9,       # v5p
    'TPU v5p': 2765e9,
    'TPU v6 lite': 1640e9,  # Trillium
}


def plain_train_cost(agent, data):
  """XLA cost analysis of ONE gradient update, from the plain (non-fused)
  train program — the unambiguous per-update figure.

  The fused K-step program's cost_analysis counts its lax.scan BODY once
  (verified on-chip: identical flops for K=4 and K=8), i.e. roughly TWO
  updates under fused_metrics=last (quiet body + unrolled metrics body),
  NOT K — dividing by K undercounted BENCH_r04's flops 8-32x. Returns
  {'flops', 'bytes'} per update or None."""
  import numpy as np
  agent._create()
  data = agent._filter_data(dict(data))
  data.pop('key', None)
  try:
    carry, _ = agent._jit_train_initial(
        agent.varibs, np.uint32(0), agent.config.batch_size)
    lowered = agent._jit_train.lower(
        agent.varibs, np.uint32(0), data, carry)
    cost = lowered.compile().cost_analysis()
  except Exception:
    return None
  if isinstance(cost, (list, tuple)):
    cost = cost[0] if cost else None
  if not cost or not cost.get('flops'):
    return None
  return {'flops': float(cost['flops']),
          'bytes': float(cost.get('bytes accessed', 0.0))}


def build_agent(task, overrides):
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env

  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'env.parallel': 'none',
      r'.*\.wd$': 0.0,
      # Partial unroll: full unroll degrades the shared compile service
      # to >25min; rolled scans (unroll=1) compile fastest but leave ~15%
      # steady-state throughput on the table. (2,3) is the measured knee
      # (scripts/unroll_experiment.py, UNROLL_MATRIX_r03.json): ~+12%
      # median updates/s for ~2x the compile time.
      'rssm.unroll': 2,
      'imag_unroll': 3,
      # Only the final fused update packs metrics; XLA dead-code-
      # eliminates the other K-1 updates' metric reductions (+8% median
      # updates/s). Logger-observable behavior matches the reference,
      # which also reads only the current step's metrics at log time.
      'jax.fused_metrics': 'last',
      **overrides,
  })
  env = load_env(task, amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)

  B, T = config.batch_size, config.replay_chunk
  rng = np.random.default_rng(0)
  data = {}
  for key, space in env.obs_space.items():
    if key.startswith('log_'):
      continue
    if space.dtype == np.uint8:
      data[key] = rng.integers(
          0, 255, (B, T) + space.shape, np.uint8)
    else:
      data[key] = np.zeros((B, T) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (B, T) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  data['reward'] = rng.uniform(0, 1, (B, T)).astype(np.float32)
  env.close()
  return agent, data


def measure_updates(agent, data, K, sample_budget_s, windows=60, calls=2):
  """Median steady-state updates/s of the fused device-replay train path.

  The backend's throughput fluctuates between windows for the same
  program (the tunneled backend is shared), so sample windows within a
  time budget and report the MEDIAN: the steady-state number a user
  would actually see, not a lucky window."""
  import jax
  replay = agent.make_device_replay(capacity=4096, block=64)
  episode = {
      k: v.reshape((-1,) + v.shape[2:]) for k, v in data.items()}
  for _ in range(4096 // len(next(iter(episode.values()))) + 1):
    replay.add_steps(episode)
  assert replay.filled == 4096

  start = time.time()
  outs, state, mets = agent.train_device(replay, K)
  jax.block_until_ready(state)  # First execution included, not just trace.
  _ = mets['model_loss_mean']
  compile_time = time.time() - start

  rates = []
  deadline = time.time() + sample_budget_s
  for _ in range(windows):
    start = time.time()
    for _ in range(calls):
      outs, state, mets = agent.train_device(replay, K, state)
    jax.block_until_ready(state)
    duration = time.time() - start
    rates.append(calls * K / duration)
    if time.time() > deadline or (
        len(rates) >= 12
        and np.median(rates) > 20 * BASELINE_UPDATES_PER_S):
      break
    if duration > 4.0 * calls * K / max(rates):
      time.sleep(2.0)  # Congested window; give the backend air.
  updates_per_s = float(np.median(rates))

  # MFU and HBM-bandwidth utilization from XLA's own cost model for ONE
  # update (the plain train program; see plain_train_cost for why the
  # fused program's cost cannot be divided by K). The compiler's counts
  # are the work the program actually contains post-fusion, so these are
  # honest utilization figures for the whole train step.
  mfu = None
  hbm = None
  flops_per_update = None
  bytes_per_update = None
  cost = plain_train_cost(agent, data)
  kind = jax.devices()[0].device_kind
  peak = PEAK_BF16.get(kind)
  peak_bw = PEAK_HBM.get(kind)
  if cost and peak:
    flops_per_update = cost['flops']
    bytes_per_update = cost['bytes']
    mfu = flops_per_update * updates_per_s / peak
    if peak_bw and bytes_per_update:
      hbm = bytes_per_update * updates_per_s / peak_bw
  return {
      'updates_per_s': round(updates_per_s, 3),
      'compile_time_s': round(compile_time, 1),
      'rate_windows': [round(r, 1) for r in rates],
      'flops_per_update': flops_per_update,
      'bytes_per_update': bytes_per_update,
      'mfu': round(mfu, 4) if mfu is not None else None,
      'hbm_bw_util': round(hbm, 4) if hbm is not None else None,
  }, state


def measure_latency(fn, warmup=2, calls=25, max_windows=8, budget_s=90.0):
  """Median-of-window-medians latency with a congestion guard.

  Windows whose median exceeds 5x the best window's are discarded as
  congestion artifacts of the shared tunneled backend (and noted), so a
  multi-second outlier window can never be committed as the steady-state
  number again (BENCH_r03 committed 2.07 s for a 27 ms call this way)."""
  for _ in range(warmup):
    fn()
  window_medians = []
  dropped = 0
  deadline = time.time() + budget_s
  for _ in range(max_windows):
    samples = []
    for _ in range(calls):
      start = time.time()
      fn()
      samples.append(time.time() - start)
    window_medians.append(float(np.median(samples)))
    if time.time() > deadline:
      break
    time.sleep(0.2)
  best = min(window_medians)
  kept = [m for m in window_medians if m <= 5 * best]
  dropped = len(window_medians) - len(kept)
  return {
      'median_s': float(np.median(kept)),
      'best_window_s': best,
      'windows': [round(m, 5) for m in window_medians],
      'congested_windows_dropped': dropped,
  }


def measure_policy(agent, data):
  """Policy latency on the training device and the host-CPU mirror, plus
  the backend's null round-trip floor.

  The real-robot actor budget is ~50 ms at 20 Hz on the host (reference:
  robot_interface.py:293); the reference asserts 0.007 s steady on its
  training device (tests.py:87-89)."""
  import jax
  import jax.numpy as jnp

  obs = {k: v[:1, 0] for k, v in data.items() if k != 'action'}

  null = jax.jit(lambda x: x + 1)
  x = jnp.zeros((8,))
  np.asarray(null(x))
  rtt = measure_latency(
      lambda: np.asarray(null(x)), calls=25, max_windows=4, budget_s=20.0)

  def policy_fn():
    state = [None]

    def call():
      acts, state[0] = agent.policy(obs, state[0], mode='eval')
    return call

  agent._policy_device = None
  device = measure_latency(policy_fn(), budget_s=60.0)
  try:
    agent._policy_device = jax.local_devices(backend='cpu')[0]
    agent._mirror = None
    mirror = measure_latency(policy_fn(), budget_s=60.0)
  except RuntimeError:
    mirror = {'median_s': float('nan'), 'best_window_s': float('nan'),
              'windows': [], 'congested_windows_dropped': 0}
  agent._policy_device = None
  return {'null_rtt': rtt, 'device': device, 'cpu_mirror': mirror}


def cache_state():
  cache = os.environ.get(
      'DAYDREAMER_COMPILE_CACHE',
      os.path.join(
          os.path.expanduser('~'), '.cache', 'daydreamer_tpu', 'xla'))
  try:
    entries = len(os.listdir(cache))
  except OSError:
    entries = 0
  return cache, entries


SWEEP_SHAPES = {
    'a1': ('a1_dummy', {
        'replay_chunk': 32,
        'rssm.deter': 256, 'rssm.units': 256,
        'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^',
        'encoder.mlp_keys': 'vector', 'decoder.mlp_keys': 'vector'},
     (32, 256, 1024)),
    'xarm': ('xarm_dummy', {
        'replay_chunk': 32,
        'rssm.deter': 512, 'rssm.units': 512,
        'encoder.cnn_keys': 'image|depth', 'decoder.cnn_keys': 'image|depth',
        'encoder.mlp_keys': 'cartesian|joint|gripper|grasped',
        'decoder.mlp_keys': 'cartesian|joint|gripper|grasped',
        'rssm.impl': 'pallas'},
     (32, 64, 128, 256)),
}


def sweep(budget_s=45.0):
  """Batch-scaling throughput: updates/s, replayed-steps/s and MFU vs
  batch size at the production shapes.

  The robot configs run the reference batch sizes (32) for curve parity;
  this measures where the MXU actually saturates and names the
  throughput-mode operating point (BASELINE.json north star: '1024
  batched imagination rollouts'). K shrinks as batch grows to keep the
  dispatch ~1-2s."""
  out = {}
  for name, (task, overrides, batches) in SWEEP_SHAPES.items():
    rows = []
    for batch in batches:
      # K shrinks with batch so dispatch stays ~1-2s and the program
      # (K x batch unrolled buffers) stays within the compile helper's
      # limits (batch 128+ with K=64 crashed the remote compiler).
      K = max(2, min(64, 512 // batch if name == 'xarm'
                     else 2048 // batch))
      agent, data = build_agent(task, {**overrides, 'batch_size': batch})
      try:
        res, _ = measure_updates(
            agent, data, K=K, sample_budget_s=budget_s, windows=20, calls=1)
      except Exception as e:  # e.g. HBM OOM at the largest batches.
        rows.append({'batch': batch, 'fused_K': K,
                     'error': f'{type(e).__name__}: {e}'[:300]})
        print(name, batch, 'FAILED:', type(e).__name__, flush=True)
        continue
      row = {
          'batch': batch, 'fused_K': K,
          'updates_per_s': res['updates_per_s'],
          'replay_steps_per_s': round(
              res['updates_per_s'] * batch
              * int(agent.config.replay_chunk)),
          'compile_time_s': res['compile_time_s'],
          'mfu': res['mfu'],
      }
      rows.append(row)
      print(name, json.dumps(row), flush=True)
    out[name] = rows
  return out


def main(argv=None):
  import argparse
  parser = argparse.ArgumentParser()
  parser.add_argument(
      '--shape', default='all',
      choices=['all', 'test', 'a1', 'xarm'],
      help='measure one shape in isolation (same methodology as the '
           'full run: warmup materializes a metric, so timings are '
           'fetch-synchronized - see FUSED_DISPATCH_ANOMALY.json).')
  parser.add_argument(
      '--sweep', default='',
      help='run the batch-scaling sweep instead and write the result '
           'to this path (e.g. BENCH_SWEEP.json)')
  args = parser.parse_args(argv)
  cache_dir, cache_entries = cache_state()

  if args.sweep:
    result = sweep()
    text = json.dumps(result, indent=1)
    with open(args.sweep, 'w') as f:
      f.write(text + '\n')
    print(text)
    return

  if args.shape != 'all':
    shape = {'test': ('dummy_discrete', {
                 'replay_chunk': 8, 'batch_size': 8,
                 r'.*\.layers': 2, r'.*\.units': 128,
                 r'.*\.cnn_depth': 16}, 256),
             'a1': ('a1_dummy', {
                 'replay_chunk': 32, 'batch_size': 32,
                 'rssm.deter': 256, 'rssm.units': 256,
                 'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^',
                 'encoder.mlp_keys': 'vector',
                 'decoder.mlp_keys': 'vector'}, 64),
             'xarm': ('xarm_dummy', {
                 'replay_chunk': 32, 'batch_size': 32,
                 'rssm.deter': 512, 'rssm.units': 512,
                 'encoder.cnn_keys': 'image|depth',
                 'decoder.cnn_keys': 'image|depth',
                 'encoder.mlp_keys': 'cartesian|joint|gripper|grasped',
                 'decoder.mlp_keys': 'cartesian|joint|gripper|grasped',
                 'rssm.impl': 'pallas'}, 16)}[args.shape]
    task, overrides, K = shape
    agent, data = build_agent(task, overrides)
    res, _ = measure_updates(
        agent, data, K=K, sample_budget_s=180.0, calls=1)
    print(json.dumps({'metric': f'{args.shape}_updates_per_s',
                      'value': res['updates_per_s'], **res}))
    return

  # 1. TEST_CONFIG shape (headline; reference bar 50 updates/s).
  agent, data = build_agent('dummy_discrete', {
      'replay_chunk': 8,
      'batch_size': 8,
      r'.*\.layers': 2,
      r'.*\.units': 128,
      r'.*\.cnn_depth': 16,
  })
  test_res, _ = measure_updates(agent, data, K=256, sample_budget_s=300.0)

  # Policy latency on the TEST_CONFIG agent (comparable to
  # POLICY_LATENCY.json and the reference policy budget).
  policy = measure_policy(agent, data)

  # 2. a1 training shape (configs.yaml a1 block: proprio-only MLPs,
  # deter/units 256, batch 32 x chunk 32, default 4x512 heads).
  agent_a1, data_a1 = build_agent('a1_dummy', {
      'replay_chunk': 32,
      'batch_size': 32,
      'rssm.deter': 256,
      'rssm.units': 256,
      'encoder.cnn_keys': '$^',
      'decoder.cnn_keys': '$^',
      'encoder.mlp_keys': 'vector',
      'decoder.mlp_keys': 'vector',
  })
  a1_res, _ = measure_updates(
      agent_a1, data_a1, K=64, sample_budget_s=120.0, calls=1)

  # 3. xarm training shape (configs.yaml xarm block: image CNN depth 64 +
  # proprio, deter/units 512, batch 32 x chunk 32, imag_horizon 15).
  agent_xarm, data_xarm = build_agent('xarm_dummy', {
      'replay_chunk': 32,
      'batch_size': 32,
      'rssm.deter': 512,
      'rssm.units': 512,
      'encoder.cnn_keys': 'image|depth',
      'decoder.cnn_keys': 'image|depth',
      'encoder.mlp_keys': 'cartesian|joint|gripper|grasped',
      'decoder.mlp_keys': 'cartesian|joint|gripper|grasped',
      # The fused Pallas observe chain wins +12% end-to-end at this shape
      # (FUSED_IMPL_BENCH.json); it is the production default for the
      # deter-512 robot configs.
      'rssm.impl': 'pallas',
  })
  xarm_res, _ = measure_updates(
      agent_xarm, data_xarm, K=16, sample_budget_s=120.0, calls=1)

  gates = {
      'policy_mirror_le_50ms':
          bool(policy['cpu_mirror']['median_s'] <= 0.050),
      'policy_device_minus_null_rtt_le_10ms':
          bool(policy['device']['median_s']
               - policy['null_rtt']['median_s'] <= 0.010),
  }

  result = {
      'metric': 'train_gradient_updates_per_s',
      'value': test_res['updates_per_s'],
      'unit': ('updates/s median (batch8,chunk8 TEST_CONFIG, '
               'device-replay fused x256, last-step metrics, 1 chip)'),
      'vs_baseline': round(
          test_res['updates_per_s'] / BASELINE_UPDATES_PER_S, 3),
      'compile_time_s': test_res['compile_time_s'],
      'compile_cache': {'dir': cache_dir, 'entries_before': cache_entries,
                        'warm': cache_entries > 0},
      'policy_device_s': round(policy['device']['median_s'], 4),
      'policy_device_best_window_s': round(
          policy['device']['best_window_s'], 4),
      'policy_cpu_mirror_s': round(policy['cpu_mirror']['median_s'], 4),
      'policy_null_rtt_s': round(policy['null_rtt']['median_s'], 4),
      'policy_congested_windows_dropped':
          policy['device']['congested_windows_dropped']
          + policy['cpu_mirror']['congested_windows_dropped'],
      'gates': gates,
      'shapes': {
          'test_config': test_res,
          'a1': {**a1_res,
                 'unit': ('updates/s median (a1 shape: proprio deter256, '
                          'batch32,chunk32, fused x64, 1 chip)')},
          'xarm': {**xarm_res,
                   'unit': ('updates/s median (xarm shape: image cnn64 + '
                            'proprio, deter512, batch32,chunk32, '
                            'fused x16, 1 chip)')},
      },
      'reference_default_note': (
          'reference default-size budget 0.115s/step (test_xla_auto.py:'
          '19-20) is measured at sequence length 0 (helpers.py make_data '
          'with replay_fixed.length=0) - an empty-scan program; the a1/'
          'xarm rows above run real chunk-32 sequences'),
  }
  print(json.dumps(result))
  import sys
  print(f'cache={cache_dir} entries_before={cache_entries} '
        f'policy={policy} gates={gates} a1={a1_res} xarm={xarm_res}',
        file=sys.stderr)


if __name__ == '__main__':
  main()
