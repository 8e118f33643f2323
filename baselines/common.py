"""Shared utilities for the comparison baselines (reference: ppo.py,
pytorch_sac/, rainbow/, drqv2/ — independent trees reusing the embodied
env API to produce scores/)."""

import numpy as np


def flatten_obs(obs, keys):
  """Concatenate selected observation keys into one float vector."""
  parts = []
  for key in keys:
    value = np.asarray(obs[key], np.float32)
    if value.dtype == np.uint8:
      value = value / 255.0
    parts.append(value.reshape(value.shape[0], -1)
                 if value.ndim > 1 else value[:, None])
  return np.concatenate(parts, -1)


def obs_keys(env):
  skip = ('is_first', 'is_last', 'is_terminal', 'reward')
  keys = []
  for key, space in env.obs_space.items():
    if key in skip or key.startswith('log_'):
      continue
    if len(space.shape) >= 3:
      continue  # Proprio baselines skip images.
    keys.append(key)
  return keys


class EpisodeLogger:

  def __init__(self, logger):
    self.logger = logger

  def __call__(self, ep, worker=0):
    score = float(np.asarray(ep['reward'], np.float64).sum())
    length = len(ep['reward']) - 1
    print(f'Episode has {length} steps and return {score:.1f}.')
    self.logger.add(
        {'score': score, 'length': length}, prefix='episode')
    self.logger.write()
