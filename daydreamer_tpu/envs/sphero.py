"""Sphero rolling-robot navigation env (reference: embodied/envs/sphero.py:40-330).

Dummy mode exposes the obs/act spaces (image + continuous 2-dim action, goal
distance reward) and a small random-walk simulation; real mode would attach
the spherov2 SDK + overhead RealSense tracking, gated behind imports.
"""

import dataclasses

import numpy as np

from ..core import base
from ..core import space as spacelib


@dataclasses.dataclass
class EnvConfig:
  use_real: bool = False
  length: int = 100


class SpheroEnv(base.Env):

  def __init__(self, cfg: EnvConfig):
    self.cfg = cfg
    if cfg.use_real:
      raise NotImplementedError(
          'Real Sphero requires the spherov2 SDK and RealSense tracking.')
    self._step_count = 0
    self._done = False
    self._pos = np.zeros(2, np.float32)
    self._goal = np.array([0.5, 0.5], np.float32)

  @property
  def obs_space(self):
    return {
        'image': spacelib.Space(np.uint8, (64, 64, 3)),
        'reward': spacelib.Space(np.float32),
        'is_first': spacelib.Space(bool),
        'is_last': spacelib.Space(bool),
        'is_terminal': spacelib.Space(bool),
        'log_dist': spacelib.Space(np.float32),
    }

  @property
  def act_space(self):
    return {
        'action': spacelib.Space(np.float32, (2,), -1.0, 1.0),
        'reset': spacelib.Space(bool),
    }

  def step(self, action):
    if action['reset'] or self._done:
      self._step_count = 0
      self._done = False
      self._pos = np.random.uniform(-1, 1, 2).astype(np.float32)
      return self._obs(0.0, is_first=True)
    act = np.clip(np.asarray(action['action'], np.float32), -1, 1)
    self._pos = np.clip(self._pos + 0.1 * act, -1, 1)
    self._step_count += 1
    self._done = self._step_count >= self.cfg.length
    dist = float(np.linalg.norm(self._pos - self._goal))
    return self._obs(-dist, is_last=self._done)

  def _obs(self, reward, is_first=False, is_last=False):
    image = np.zeros((64, 64, 3), np.uint8)
    px, py = ((self._pos + 1) / 2 * 63).astype(int)
    gx, gy = ((self._goal + 1) / 2 * 63).astype(int)
    image[py, px] = (255, 255, 255)
    image[gy, gx] = (0, 255, 0)
    dist = float(np.linalg.norm(self._pos - self._goal))
    return dict(
        image=image,
        reward=np.float32(reward),
        is_first=is_first,
        is_last=is_last,
        is_terminal=False,
        log_dist=np.float32(dist),
    )
