"""Perf experiments: donation cost and unroll-vs-compile-time trade-off."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
  import jax
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env

  def build(unroll):
    config = ddt.Config(Agent.configs['defaults'])
    config = config.update({
        'replay_chunk': 8, 'batch_size': 8,
        r'.*\.layers': 2, r'.*\.units': 128, r'.*\.cnn_depth': 16,
        r'.*\.wd$': 0.0,
        'rssm.unroll': unroll, 'imag_unroll': unroll,
    })
    env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
    agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
    env.close()
    agent._create()
    data = agent._dummy_batch(8, 8)
    data.pop('reset', None)
    carry, _ = agent._jit_train_initial(agent.varibs, np.uint32(0), 8)
    return agent, data, carry

  agent, data, carry = build(unroll=8)

  # Donation vs no donation, pipelined.
  nodon = jax.jit(agent._pure_train_packed)
  t0 = time.time()
  out = nodon(agent.varibs, np.uint32(0), data, carry)
  jax.block_until_ready(out)
  print(f'no-donation compile: {time.time() - t0:.0f}s')
  for variant, fn, state in [('no-donation', nodon, agent.varibs)]:
    t0 = time.time()
    for i in range(50):
      (outs, carry2, packed), _ = fn(state, np.uint32(i), data, carry)
    jax.block_until_ready(carry2)
    dt = (time.time() - t0) / 50
    print(f'{variant}: {dt * 1000:.2f} ms/step -> {1 / dt:.1f} updates/s')

  # Donating path (the default wrapper).
  state = dict(agent.varibs)
  t0 = time.time()
  for i in range(50):
    (outs, carry2, packed), state = agent._jit_train(
        state, np.uint32(i), data, carry)
  jax.block_until_ready(carry2)
  dt = (time.time() - t0) / 50
  print(f'donation: {dt * 1000:.2f} ms/step -> {1 / dt:.1f} updates/s')

  # Unroll=1 compile time.
  agent1, data1, carry1 = build(unroll=1)
  fn1 = jax.jit(agent1._pure_train_packed)
  t0 = time.time()
  out = fn1(agent1.varibs, np.uint32(0), data1, carry1)
  jax.block_until_ready(out)
  print(f'unroll=1 compile: {time.time() - t0:.0f}s')
  t0 = time.time()
  for i in range(50):
    (o, c2, p), _ = fn1(agent1.varibs, np.uint32(i), data1, carry1)
  jax.block_until_ready(c2)
  dt = (time.time() - t0) / 50
  print(f'unroll=1: {dt * 1000:.2f} ms/step -> {1 / dt:.1f} updates/s')


if __name__ == '__main__':
  main()
