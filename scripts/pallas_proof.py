"""Prove or refute the Pallas λ-return kernels on the real TPU.

SURVEY §7 step 7: only keep Pallas kernels that beat `lax.scan`. This
measures the GVE backward recursion both standalone (kernel vs scan as
isolated jitted programs) and in context (the fused train_device program
with `return_impl` pallas vs scan), on the bench TEST_CONFIG shapes.

Writes PALLAS_PROOF.json at the repo root; bench/configs defaults should
follow its verdict.

Usage: python scripts/pallas_proof.py [--skip-train]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent


def timeit(fn, *args, reps=200, warmup=5):
  import jax
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  start = time.time()
  for _ in range(reps):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.time() - start) / reps


def standalone(horizon, lanes):
  import jax
  from daydreamer_tpu.ops import lambda_returns as lr
  rng = np.random.default_rng(0)
  interm = jax.device_put(
      rng.normal(size=(horizon, lanes)).astype(np.float32))
  disc = jax.device_put(
      rng.uniform(0.9, 1.0, size=(horizon, lanes)).astype(np.float32))
  boot = jax.device_put(rng.normal(size=(lanes,)).astype(np.float32))
  lam = 0.95

  scan = jax.jit(lambda i, d, b: lr.gve_scan(i, d, b, lam))
  pallas = lambda i, d, b: lr.gve_pallas(i, d, b, lam)

  out_scan = np.asarray(scan(interm, disc, boot))
  out_pallas = np.asarray(pallas(interm, disc, boot))
  np.testing.assert_allclose(out_scan, out_pallas, rtol=1e-6)

  t_scan = timeit(scan, interm, disc, boot)
  t_pallas = timeit(pallas, interm, disc, boot)
  return {'horizon': horizon, 'lanes': lanes,
          'scan_us': round(t_scan * 1e6, 1),
          'pallas_us': round(t_pallas * 1e6, 1),
          'speedup': round(t_scan / t_pallas, 3)}


def fused_train(return_impl, K=256):
  """Median updates/s of the fused device-replay train program."""
  import jax
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env
  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'env.parallel': 'none', 'replay_chunk': 8, 'batch_size': 8,
      r'.*\.layers': 2, r'.*\.units': 128, r'.*\.cnn_depth': 16,
      r'.*\.wd$': 0.0, 'return_impl': return_impl,
  })
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
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
  replay = agent.make_device_replay(capacity=4096, block=64)
  episode = {k: v.reshape((-1,) + v.shape[2:]) for k, v in data.items()}
  for _ in range(4096 // len(next(iter(episode.values()))) + 1):
    replay.add_steps(episode)
  start = time.time()
  outs, state, mets = agent.train_device(replay, K)
  jax.block_until_ready(state)
  compile_time = time.time() - start
  rates = []
  for _ in range(12):
    start = time.time()
    for _ in range(2):
      outs, state, mets = agent.train_device(replay, K, state)
    jax.block_until_ready(state)
    rates.append(2 * K / (time.time() - start))
  return {'return_impl': return_impl,
          'compile_s': round(compile_time, 1),
          'median_updates_per_s': round(float(np.median(rates)), 1)}


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--skip-train', action='store_true')
  args = parser.parse_args()
  result = {'standalone': [], 'fused': []}
  # Bench shape (B*T = 64 lanes) and larger-batch shapes.
  for horizon, lanes in [(15, 64), (15, 256), (15, 2048)]:
    row = standalone(horizon, lanes)
    print('standalone', row, flush=True)
    result['standalone'].append(row)
  if not args.skip_train:
    for impl in ('scan', 'pallas'):
      row = fused_train(impl)
      print('fused', row, flush=True)
      result['fused'].append(row)
  out = ROOT / 'PALLAS_PROOF.json'
  out.write_text(json.dumps(result, indent=2))
  print(f'wrote {out}')


if __name__ == '__main__':
  main()
