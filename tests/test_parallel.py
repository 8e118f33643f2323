"""Process-parallelism tests without a cluster
(reference: embodied/tests/test_parallel.py:14-87): thread and process env
strategies produce correct episodes, parallel stepping is actually
concurrent, and worker cleanup is prompt."""

import time

import numpy as np
import pytest

import daydreamer_tpu as ddt
from daydreamer_tpu.core import wrappers
from daydreamer_tpu.envs.dummy import Dummy


class Delay(ddt.Wrapper):

  def __init__(self, env, delay):
    super().__init__(env)
    self._delay = delay

  def step(self, action):
    time.sleep(self._delay)
    return self.env.step(action)


def make_ctor(delay=0.0, length=5):
  def ctor():
    env = Dummy('discrete', length=length)
    env = wrappers.OneHotAction(env)
    if delay:
      return Delay(env, delay)
    return env
  return ctor


def onehot(batch, classes=5):
  action = np.zeros((batch, classes), np.float32)
  action[:, 1] = 1.0
  return action


@pytest.mark.parametrize('strategy', ['thread', 'process'])
def test_parallel_episodes(strategy):
  ctor = make_ctor()
  envs = [ddt.Parallel(ctor, strategy) for _ in range(4)]
  env = ddt.BatchEnv(envs, parallel=True)
  driver = ddt.Driver(env)
  episodes = []
  driver.on_episode(lambda ep, worker: episodes.append(worker))
  policy = lambda obs, state: ({'action': onehot(4)}, state)
  driver(policy, episodes=8)
  assert len(episodes) >= 8
  env.close()


def test_parallel_is_concurrent():
  delay = 0.1
  ctor = make_ctor(delay=delay, length=3)
  envs = [ddt.Parallel(ctor, 'process') for _ in range(4)]
  env = ddt.BatchEnv(envs, parallel=True)
  acts = {'action': onehot(4), 'reset': np.ones(4, bool)}
  env.step(acts)  # Warmup reset.
  start = time.time()
  for _ in range(2):
    acts = {'action': onehot(4), 'reset': np.zeros(4, bool)}
    env.step(acts)
  duration = time.time() - start
  # 4 envs x 2 steps x 0.1s would be 0.8s sequentially; concurrent ~0.2s.
  assert duration < 0.55, duration
  env.close()


def test_sequential_control():
  delay = 0.1
  ctor = make_ctor(delay=delay, length=3)
  envs = [ctor() for _ in range(4)]
  env = ddt.BatchEnv(envs, parallel=False)
  acts = {'action': onehot(4), 'reset': np.ones(4, bool)}
  env.step(acts)
  start = time.time()
  acts = {'action': onehot(4), 'reset': np.zeros(4, bool)}
  env.step(acts)
  duration = time.time() - start
  assert duration >= 0.4, duration
  env.close()


def test_worker_cleanup_prompt():
  ctor = make_ctor()
  env = ddt.Parallel(ctor, 'process')
  start = time.time()
  env.close()
  assert time.time() - start < 2.0
