"""Behavior and exploration module tests (Explore, DisagWhen, plan2explore
intrinsic rewards)."""

import numpy as np
import pytest

import daydreamer_tpu as ddt
from daydreamer_tpu.envs import load_env


def make_config(**overrides):
  from daydreamer_tpu.agents.dreamer import Agent
  config = ddt.Config(Agent.configs['defaults'])
  config = config.update(Agent.configs['debug'])
  config = config.update({
      'jax.platform': 'cpu',
      'batch_size': 4,
      'replay_chunk': 6,
      'imag_horizon': 2,
      'disag_models': 2,
      **overrides,
  })
  return config


def make_batch(env, config):
  B, T = config.batch_size, config.replay_chunk
  data = {}
  for key, space in env.obs_space.items():
    if key.startswith('log_'):
      continue
    data[key] = np.zeros((B, T) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (B, T) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  return data


@pytest.mark.slow
def test_plan2explore():
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(
      expl_behavior='Explore',
      **{'expl_rewards.extr': 1.0, 'expl_rewards.disag': 0.1})
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  outs, state, mets = agent.train(data)
  assert np.isfinite(mets['model_loss_mean'])
  assert any(k.startswith('expl_') for k in mets.keys())
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  acts, _ = agent.policy(obs, mode='explore')
  assert np.isfinite(acts['action']).all()
  env.close()


@pytest.mark.slow
def test_disag_when():
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(
      task_behavior='DisagWhen', expl_when_buffer=16)
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  # DisagWhen.train consumes posterior deter states from the context.
  outs, state, mets = agent.train(data)
  assert np.isfinite(mets['model_loss_mean'])
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  acts, pstate = agent.policy(obs)
  assert np.isfinite(acts['action']).all()
  acts, pstate = agent.policy(obs, pstate)
  env.close()
