"""Episode-protocol tests mirroring the reference driver contract
(reference: embodied/tests/test_driver.py:10-123)."""

import numpy as np

import daydreamer_tpu as ddt
from daydreamer_tpu.envs.dummy import Dummy


def make_env(length=5):
  from daydreamer_tpu.core.wrappers import OneHotAction
  env = OneHotAction(Dummy('discrete', length=length))
  return ddt.BatchEnv([env], parallel=False)


def onehot(index=1, batch=1, classes=5):
  action = np.zeros((batch, classes), np.float32)
  action[:, index] = 1.0
  return action


class TestDriver:

  def test_episode_boundaries(self):
    env = make_env(length=3)
    driver = ddt.Driver(env)
    seq = []
    driver.on_step(lambda tran, worker: seq.append(tran.copy()))
    episodes = []
    driver.on_episode(lambda ep, worker: episodes.append(ep))
    policy = lambda obs, state: ({'action': onehot()}, state)
    driver(policy, episodes=2)
    firsts = [t['is_first'] for t in seq]
    lasts = [t['is_last'] for t in seq]
    resets = [t['reset'] for t in seq]
    # First step resets (driver starts with is_last=True).
    assert firsts[0] and resets[0]
    # An episode of length 3: first + 3 steps.
    assert lasts[3]
    assert firsts[4] and resets[4]
    assert len(episodes) == 2
    assert len(episodes[0]['is_first']) == 4

  def test_action_zeroed_on_reset(self):
    env = make_env(length=3)
    driver = ddt.Driver(env)
    seq = []
    driver.on_step(lambda tran, worker: seq.append(tran.copy()))
    policy = lambda obs, state: ({'action': onehot()}, state)
    driver(policy, steps=5)
    # On reset steps the action must be zeroed.
    for tran in seq:
      if tran['reset']:
        assert (tran['action'] == 0).all()
      else:
        assert tran['action'].sum() == 1.0

  def test_state_threading(self):
    env = make_env()
    driver = ddt.Driver(env)
    states = []
    def policy(obs, state):
      state = 0 if state is None else state + 1
      states.append(state)
      return {'action': onehot()}, state
    driver(policy, steps=4)
    assert states == [0, 1, 2, 3]

  def test_episode_content(self):
    env = make_env(length=3)
    driver = ddt.Driver(env)
    episodes = []
    driver.on_episode(lambda ep, worker: episodes.append(ep))
    policy = lambda obs, state: ({'action': onehot()}, state)
    driver(policy, episodes=1)
    ep = episodes[0]
    assert list(ep['step']) == [0, 1, 2, 3]
    assert list(ep['is_first']) == [True, False, False, False]
    assert list(ep['is_last']) == [False, False, False, True]


class TestWrappers:

  def test_onehot_action(self):
    from daydreamer_tpu.core.wrappers import OneHotAction
    env = OneHotAction(Dummy('discrete', length=5))
    space = env.act_space['action']
    assert space.shape == (5,)
    assert space.discrete
    sample = space.sample()
    assert sample.sum() == 1.0
    obs = env.step({'action': sample, 'reset': True})
    assert obs['is_first']
    obs = env.step({'action': sample, 'reset': False})
    assert not obs['is_first']

  def test_normalize_action(self):
    from daydreamer_tpu.core.wrappers import NormalizeAction
    env = NormalizeAction(Dummy('continuous', length=5))
    space = env.act_space['action']
    assert (space.low == -1).all() or not np.isfinite(space.low).all()

  def test_time_limit(self):
    from daydreamer_tpu.core.wrappers import TimeLimit
    env = TimeLimit(Dummy('discrete', length=100), duration=4)
    obs = env.step({'action': 0, 'reset': True})
    count = 0
    while not obs['is_last']:
      obs = env.step({'action': 0, 'reset': False})
      count += 1
    assert count == 4

  def test_action_repeat(self):
    from daydreamer_tpu.core.wrappers import ActionRepeat
    env = ActionRepeat(Dummy('discrete', length=10), repeat=3)
    obs = env.step({'action': 0, 'reset': True})
    obs = env.step({'action': 0, 'reset': False})
    assert obs['reward'] == 3.0
    assert obs['step'] == 3
