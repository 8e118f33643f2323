"""Breakdown of per-step train cost on the current device: world-model-only
vs full step, at the TEST_CONFIG bench shape. Run on TPU: python
scripts/profile_train.py"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import daydreamer_tpu as ddt
from daydreamer_tpu import nn
from daydreamer_tpu.agents.dreamer import Agent
from daydreamer_tpu.envs import load_env


def timeit(fn, n=30, warmup=3):
  import jax
  import numpy as _np
  for _ in range(warmup):
    out = fn()
  # Force a device->host fetch: on the tunneled axon backend
  # block_until_ready does not truly synchronize until the process has
  # fetched once (FUSED_DISPATCH_ANOMALY.json) - without this the loop
  # times async enqueue, not execution.
  _np.asarray(jax.tree.leaves(out)[0])
  jax.block_until_ready(out)
  start = time.time()
  for _ in range(n):
    out = fn()
  jax.block_until_ready(out)
  return (time.time() - start) / n


def main():
  import argparse
  import jax
  parser = argparse.ArgumentParser()
  parser.add_argument('--shape', default='test', choices=['test', 'a1'])
  args = parser.parse_args()
  config = ddt.Config(Agent.configs['defaults'])
  if args.shape == 'test':
    config = config.update({
        'replay_chunk': 8, 'batch_size': 8,
        r'.*\.layers': 2, r'.*\.units': 128, r'.*\.cnn_depth': 16,
        r'.*\.wd$': 0.0,
    })
    task, B, T = 'dummy_discrete', 8, 8
  else:
    config = config.update(Agent.configs['a1'])
    config = config.update({
        'env.parallel': 'none', r'.*\.wd$': 0.0,
        'rssm.unroll': 2, 'imag_unroll': 3})
    task, B, T = 'a1_dummy', 32, 32
  env = load_env(task, amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  env.close()
  agent._create()
  data = agent._dummy_batch(B, T)
  data = {k: v for k, v in data.items() if k != 'reset'}

  inner = agent.agent  # The pure Agent module.
  varibs = agent.varibs

  pre = nn.pure(lambda d: inner.preprocess(d))

  def wm_only(d, carry):
    d2 = inner.preprocess(d)
    return inner.wm.train(d2, carry)

  wm_fn = jax.jit(nn.pure(wm_only))
  carry0, _ = agent._jit_train_initial(varibs, np.uint32(0), B)

  out, varibs2 = wm_fn(varibs, np.uint32(0), data, carry0)
  t_wm = timeit(lambda: wm_fn(varibs, np.uint32(1), data, carry0))
  print(f'wm.train only: {t_wm * 1000:.2f} ms')

  full_fn = jax.jit(agent._pure_train)  # No donation for profiling.
  full_fn(varibs, np.uint32(0), data, carry0)
  t_full = timeit(lambda: full_fn(varibs, np.uint32(2), data, carry0))
  print(f'full train:    {t_full * 1000:.2f} ms')

  def obs_only(d, carry):
    d2 = inner.preprocess(d)
    embed = inner.wm.encoder(d2)
    post, prior = inner.wm.rssm.observe(
        embed, d2['action'], d2['is_first'], carry)
    return post['deter']

  obs_fn = jax.jit(nn.pure(obs_only))
  obs_fn(varibs, np.uint32(0), data, carry0)
  t_obs = timeit(lambda: obs_fn(varibs, np.uint32(1), data, carry0))
  print(f'encoder+observe fwd: {t_obs * 1000:.2f} ms')

  # Imagination forward probe: the rollout chain at its production width
  # (B*T flattened lanes, imag_horizon steps, actions given).
  H = int(config.imag_horizon)
  act_dim = int(np.prod(agent.act_space['action'].shape))
  imag_actions = np.zeros((B * T, H, act_dim), np.float32)

  def imag_only(acts):
    start = inner.wm.rssm.initial(B * T)
    return inner.wm.rssm.imagine(acts, start)['deter']

  imag_fn = jax.jit(nn.pure(imag_only))
  imag_fn(varibs, np.uint32(0), imag_actions)
  t_imag = timeit(lambda: imag_fn(varibs, np.uint32(1), imag_actions))
  print(f'imagination fwd (H={H}, {B * T} lanes): {t_imag * 1000:.2f} ms')

  def policy_once():
    obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
    import jax
    return agent._jit_policy(
        varibs, jax.random.PRNGKey(3), obs,
        agent._jit_policy_initial(varibs, np.uint32(0), B)[0],
        mode='train')

  policy_once()
  t_pol = timeit(policy_once, n=20)
  print(f'policy: {t_pol * 1000:.2f} ms')


if __name__ == '__main__':
  main()
