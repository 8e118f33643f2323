"""Break down agent.policy latency (device vs host-CPU mirror).

The reference asserts 0.007 s steady policy latency on its training GPU
(embodied/agents/dreamerv2plus/tests.py:87-89); the robot actor budget is
50 ms at 20 Hz (robot_interface.py:293). On a tunneled TPU backend every
dispatch pays RPC round trips, so the robot path uses the host-CPU policy
mirror (jaxagent.py `_policy_varibs`). This script separates, per call:

  - host prep (np conversion + seed generation)
  - jit dispatch (call until futures returned, async)
  - device sync + fetch (block_until_ready + device_get)

for both the training-device policy and the CPU mirror, at batch 1 with
TEST_CONFIG nets, and prints one JSON line per variant.

Usage: python scripts/policy_latency.py [--reps 50]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_agent(shape='test'):
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env
  config = ddt.Config(Agent.configs['defaults'])
  if shape == 'test':
    config = config.update({
        'env.parallel': 'none', 'replay_chunk': 8, 'batch_size': 8,
        r'.*\.layers': 2, r'.*\.units': 128, r'.*\.cnn_depth': 16,
        r'.*\.wd$': 0.0,
    })
    task = 'dummy_discrete'
  elif shape == 'a1':
    # The actual robot-actor shape: proprio-only a1 config. The TEST
    # shape's CPU-mirror number is dominated by its batch-1 image CNN,
    # which the quadruped policy does not run.
    config = config.update(Agent.configs['a1'])
    config = config.update({'env.parallel': 'none', r'.*\.wd$': 0.0})
    task = 'a1_dummy'
  else:
    raise NotImplementedError(shape)
  env = load_env(task, amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  obs = {}
  for key, space in env.obs_space.items():
    obs[key] = np.zeros((1,) + space.shape, space.dtype)
  if 'image' in obs:
    obs['image'] = np.random.randint(0, 255, (1, 64, 64, 3), np.uint8)
  obs['is_first'][:] = True
  env.close()
  return agent, obs


def measure(agent, obs, reps):
  import jax
  pstate = None
  acts, pstate = agent.policy(obs, pstate, mode='eval')  # Compile.
  acts, pstate = agent.policy(obs, pstate, mode='eval')
  # Whole-call latency.
  start = time.time()
  for _ in range(reps):
    acts, pstate = agent.policy(obs, pstate, mode='eval')
  whole = (time.time() - start) / reps
  # Dispatch-only: call the jit directly, do not fetch outs.
  varibs = agent._policy_varibs()
  seed = jax.random.PRNGKey(0)
  start = time.time()
  for _ in range(reps):
    (outs, pstate2), _ = agent._jit_policy(
        varibs, seed, obs, pstate, mode='eval')
  dispatch = (time.time() - start) / reps
  jax.block_until_ready(pstate2)
  # Dispatch + sync (no host fetch of outs).
  start = time.time()
  for _ in range(reps):
    (outs, pstate2), _ = agent._jit_policy(
        varibs, seed, obs, pstate, mode='eval')
    jax.block_until_ready(outs)
  synced = (time.time() - start) / reps
  return dict(
      whole_ms=round(whole * 1e3, 2),
      dispatch_ms=round(dispatch * 1e3, 2),
      synced_ms=round(synced * 1e3, 2),
      fetch_ms=round((whole - synced) * 1e3, 2))


def null_rtt(reps):
  """Dispatch+sync+fetch of a trivial jitted op: the backend's round-trip
  floor that any policy call must pay regardless of model size."""
  import jax
  import jax.numpy as jnp
  f = jax.jit(lambda x: x + 1)
  x = jnp.zeros((8,))
  np.asarray(f(x))
  start = time.time()
  for _ in range(reps):
    np.asarray(f(x))
  return round((time.time() - start) / reps * 1e3, 2)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--reps', type=int, default=50)
  parser.add_argument('--shape', default='test', choices=['test', 'a1'])
  parser.add_argument('--out', default='')
  parser.add_argument('--gate', action='store_true',
                      help='assert the robot budgets: mirror whole-call '
                           '<= 50 ms and device whole-call minus null RTT '
                           '<= 10 ms; exit nonzero on failure')
  args = parser.parse_args()
  import jax
  results = {'backend': str(jax.devices()[0]),
             'shape': args.shape,
             'null_rtt_ms': null_rtt(args.reps),
             'note': ('whole_ms is the gated number; the dispatch/synced/'
                      'fetch breakdown is measured in separate loops and '
                      'is approximate under backend jitter (the CPU-mirror '
                      'jit also blocks differently, so its breakdown rows '
                      'can disagree with whole_ms)')}
  agent, obs = build_agent(args.shape)
  agent._policy_device = None
  results['device'] = measure(agent, obs, args.reps)
  # The tunnel's round-trip floor drifts minute to minute; bracket the
  # device measurement with a second RTT sample and gate against the max
  # (the most generous estimate of the floor the device calls paid).
  results['null_rtt_after_ms'] = null_rtt(args.reps)
  print(json.dumps({'variant': 'device', **results['device']}), flush=True)
  try:
    agent._policy_device = jax.local_devices(backend='cpu')[0]
    agent._mirror = None
    results['cpu_mirror'] = measure(agent, obs, args.reps)
    print(json.dumps(
        {'variant': 'cpu_mirror', **results['cpu_mirror']}), flush=True)
  except RuntimeError:
    pass
  print(json.dumps({'null_rtt_ms': results['null_rtt_ms']}), flush=True)
  if args.gate:
    # Robot budgets: 50 ms host actor loop (reference
    # robot_interface.py:293) and <=10 ms of true device compute beyond
    # the backend's round-trip floor (reference tests.py:87-89 asserts
    # 7 ms on a local device).
    mirror = results.get('cpu_mirror', {}).get('whole_ms', float('nan'))
    floor = max(results['null_rtt_ms'], results['null_rtt_after_ms'])
    over_rtt = results['device']['whole_ms'] - floor
    results['gates'] = {
        'mirror_le_50ms': bool(mirror <= 50.0),
        'device_minus_null_rtt_le_10ms': bool(over_rtt <= 10.0)}
    print(json.dumps(results['gates']), flush=True)
  if args.out:
    pathlib.Path(args.out).write_text(json.dumps(results, indent=2))
  if args.gate:
    assert all(results['gates'].values()), results


if __name__ == '__main__':
  main()
