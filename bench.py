"""Benchmark: steady-state gradient updates/s of agent.train on one chip.

Compares against the reference's asserted steady-state train latency of
0.02 s/step (50 updates/s) on one GPU with XLA jit under TEST_CONFIG
(batch 8, chunk 8, layers 2, units 128, cnn_depth 16; reference:
embodied/agents/dreamerv2plus/tests.py:26-71).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_UPDATES_PER_S = 1.0 / 0.02  # reference tests.py:70-71


def main():
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env

  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'env.parallel': 'none',
      'replay_chunk': 8,
      'batch_size': 8,
      r'.*\.layers': 2,
      r'.*\.units': 128,
      r'.*\.cnn_depth': 16,
      r'.*\.wd$': 0.0,
      # Partial unroll: full unroll degrades the shared compile service
      # to >25min; rolled scans (unroll=1) compile fastest but leave ~15%
      # steady-state throughput on the table at this shape. (2,3) is the
      # measured knee (scripts/unroll_experiment.py): ~+12% median
      # updates/s for ~2x the compile time.
      'rssm.unroll': 2,
      'imag_unroll': 3,
      # Only the final fused update packs metrics; XLA dead-code-
      # eliminates the other K-1 updates' metric reductions (+8% median
      # updates/s, scripts/unroll_experiment.py). The logger-observable
      # behavior matches the reference, which also reads only the current
      # step's metrics when the log cadence fires.
      'jax.fused_metrics': 'last',
  })
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  step = ddt.Counter()
  agent = Agent(env.obs_space, env.act_space, step, config)

  B, T = config.batch_size, config.replay_chunk
  data = {}
  for key, space in env.obs_space.items():
    data[key] = np.zeros((B, T) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (B, T) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  data['reward'] = np.random.uniform(0, 1, (B, T)).astype(np.float32)
  data['image'] = np.random.randint(0, 255, (B, T, 64, 64, 3), np.uint8)
  env.close()

  import jax

  # Device-replay learner path (the default for run=learning): episodes
  # are mirrored into TPU HBM once; chunk sampling AND K gradient updates
  # run inside ONE jitted dispatch (lax.scan over the train step), so the
  # steady state has no per-update host->device transfer and one RPC per
  # K updates. This is exactly the run=learning hot loop.
  K = 256
  replay = agent.make_device_replay(capacity=4096, block=64)
  episode = dict(data)
  for key, value in episode.items():
    episode[key] = value.reshape((-1,) + value.shape[2:])  # [B*T, ...]
  for _ in range(4096 // len(next(iter(episode.values()))) + 1):
    replay.add_steps(episode)
  assert replay.filled == 4096

  # Warmup: creation + compile of the fused sample+train program.
  start = time.time()
  outs, state, mets = agent.train_device(replay, K)
  jax.block_until_ready(state)  # Include the first execution, not just trace.
  _ = mets['model_loss_mean']
  compile_time = time.time() - start

  # The backend's throughput fluctuates between windows for the same
  # program (the tunneled backend is shared), so sample windows within a
  # time budget and report the MEDIAN: the steady-state number a user
  # would actually see, not a lucky window.
  rates = []
  deadline = time.time() + 300.0
  for window in range(60):
    calls = 2
    start = time.time()
    for _ in range(calls):
      outs, state, mets = agent.train_device(replay, K, state)
    jax.block_until_ready(state)
    duration = time.time() - start
    rates.append(calls * K / duration)
    if time.time() > deadline or (
        len(rates) >= 12 and np.median(rates) > 20 * BASELINE_UPDATES_PER_S):
      break
    if duration > 2.0:
      time.sleep(2.0)  # Congested window; give the backend air.
  updates_per_s = float(np.median(rates))

  # Synchronous latency per fused call (metrics fetched each call).
  start = time.time()
  for _ in range(5):
    outs, state, mets = agent.train_device(replay, K, state)
    _ = mets['model_loss_mean']
  sync_latency = (time.time() - start) / 5 / K

  # Policy latency: the real-robot actor budget is ~50 ms at 20 Hz on the
  # host (reference: robot_interface.py:293) and the reference asserts
  # 0.007 s steady on its training device (tests.py:87-89). Measure both
  # the host-CPU policy mirror (the robot-actor path) and the training
  # device policy.
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  obs = {k: v[:1] for k, v in obs.items()}

  def timed_policy(label):
    pstate = None
    acts, pstate = agent.policy(obs, pstate, mode='eval')  # Compile.
    start = time.time()
    n = 50
    for _ in range(n):
      acts, pstate = agent.policy(obs, pstate, mode='eval')
    return (time.time() - start) / n

  agent._policy_device = None
  policy_dev_s = timed_policy('device')
  try:
    agent._policy_device = jax.local_devices(backend='cpu')[0]
    agent._mirror = None
    policy_cpu_s = timed_policy('cpu-mirror')
  except RuntimeError:
    policy_cpu_s = float('nan')

  print(json.dumps({
      'metric': 'train_gradient_updates_per_s',
      'value': round(updates_per_s, 3),
      'unit': ('updates/s median (batch8,chunk8 TEST_CONFIG, '
               'device-replay fused x256, last-step metrics, 1 chip)'),
      'vs_baseline': round(updates_per_s / BASELINE_UPDATES_PER_S, 3),
      'compile_time_s': round(compile_time, 1),
      'policy_device_s': round(policy_dev_s, 4),
      'policy_cpu_mirror_s': round(policy_cpu_s, 4),
  }))
  import sys
  print(f'compile_time_s={compile_time:.1f} '
        f'sync_latency_s={sync_latency:.4f} '
        f'rate_windows={[round(r, 1) for r in rates]} '
        f'policy_device_s={policy_dev_s:.4f} '
        f'policy_cpu_mirror_s={policy_cpu_s:.4f} '
        f'(reference policy budget 0.007s, robot budget 0.05s)',
        file=sys.stderr)


if __name__ == '__main__':
  main()
