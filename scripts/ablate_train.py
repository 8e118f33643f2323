"""Ablation: per-phase device time of the TEST_CONFIG train step.

Times jitted sub-programs of Agent.train (WM fwd, WM train, imagination
fwd, behavior train, full train) to locate where the step's latency goes.
Run on the TPU; results are backend-load sensitive, so compare phases
within one run only.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def bench(fn, *args, n=30, warmup=3):
  import jax
  out = None
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.time()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.time() - t0) / n


def main():
  import jax
  import daydreamer_tpu as ddt
  from daydreamer_tpu import nn
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env

  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'replay_chunk': 8, 'batch_size': 8,
      r'.*\.layers': 2, r'.*\.units': 128, r'.*\.cnn_depth': 16,
      r'.*\.wd$': 0.0, 'rssm.unroll': 1, 'imag_unroll': 1,
  })
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  wrapper = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  env.close()
  wrapper._create()
  inner = wrapper.agent
  varibs = wrapper.varibs
  data = wrapper._dummy_batch(8, 8)
  data.pop('reset', None)
  carry, _ = wrapper._jit_train_initial(varibs, np.uint32(0), 8)
  seed = np.uint32(7)

  def timed(name, fn, *args):
    jfn = jax.jit(nn.pure(fn))
    t0 = time.time()
    out = jfn(varibs, seed, *args)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    dt = bench(jfn, varibs, seed, *args)
    print(f'{name:28s} {dt*1e3:8.2f} ms   (compile {compile_s:.0f}s)')
    return dt

  pre = inner.preprocess(jax.tree.map(np.asarray, data))

  timed('encoder fwd', lambda: inner.wm.encoder(pre))

  def observe_fwd():
    embed = inner.wm.encoder(pre)
    return inner.wm.rssm.observe(
        embed, pre['action'], pre['is_first'], carry)
  timed('encoder+observe fwd', observe_fwd)

  def wm_loss_fwd():
    return inner.wm.loss(pre, carry, training=False)
  timed('wm loss fwd', wm_loss_fwd)

  def wm_train():
    return inner.wm.train(pre, carry)
  timed('wm train (fwd+bwd+opt)', wm_train)

  post, _ = jax.jit(nn.pure(observe_fwd))(varibs, seed)[0]
  context = {**pre, **post}
  start = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), context)

  def imagine_fwd():
    return inner.wm.imagine(
        inner.task_behavior.policy, start, {}, config.imag_horizon)
  timed('imagination fwd', imagine_fwd)

  def behavior_train():
    return inner.task_behavior.train(inner.wm.imagine, start, context)
  timed('behavior train', behavior_train)

  def full_train():
    return inner.train(pre, carry)
  timed('full agent.train', full_train)


if __name__ == '__main__':
  main()
