"""Measure fused train_device throughput vs scan unroll factors.

The fused device-replay program (bench.py) runs rolled scans (unroll=1)
because fully-unrolled programs degrade the shared compile service to
>25 min. This sweeps partial unroll factors to find the best
throughput-per-compile-second point.

Usage: python scripts/unroll_experiment.py [rssm_unroll imag_unroll [K]]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
  rssm_unroll = int(sys.argv[1]) if len(sys.argv) > 1 else 2
  imag_unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 3
  K = int(sys.argv[3]) if len(sys.argv) > 3 else 256
  fused_metrics = sys.argv[4] if len(sys.argv) > 4 else 'all'

  import jax
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env

  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'env.parallel': 'none', 'replay_chunk': 8, 'batch_size': 8,
      r'.*\.layers': 2, r'.*\.units': 128, r'.*\.cnn_depth': 16,
      r'.*\.wd$': 0.0,
      'rssm.unroll': rssm_unroll, 'imag_unroll': imag_unroll,
      'jax.fused_metrics': fused_metrics,
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
  jax.block_until_ready(state)  # Include the first execution, not just trace.
  _ = mets['model_loss_mean']
  compile_time = time.time() - start
  print(f'unroll=({rssm_unroll},{imag_unroll}) metrics={fused_metrics} '
        f'compile_time_s={compile_time:.1f}', flush=True)

  rates = []
  deadline = time.time() + 150.0
  for _ in range(24):
    start = time.time()
    for _ in range(2):
      outs, state, mets = agent.train_device(replay, K, state)
    jax.block_until_ready(state)
    rates.append(2 * K / (time.time() - start))
    if time.time() > deadline:
      break
  print(f'unroll=({rssm_unroll},{imag_unroll}) metrics={fused_metrics} '
        f'median={np.median(rates):.1f} updates/s '
        f'windows={[round(r, 1) for r in rates]}', flush=True)


if __name__ == '__main__':
  main()
