"""Minecraft (MineRL) adapter (reference: embodied/envs/minecraft.py:10-197).
Import-gated on minerl."""

import functools

import numpy as np

from ..core import base
from ..core import space as spacelib


class Minecraft(base.Env):

  NOOP = dict(
      camera=(0, 0), forward=0, back=0, left=0, right=0, attack=0, sprint=0,
      jump=0, sneak=0, craft='none', nearbyCraft='none', nearbySmelt='none',
      place='none', equip='none')

  ACTIONS = [
      {},
      {'forward': 1},
      {'back': 1},
      {'left': 1},
      {'right': 1},
      {'camera': (-15, 0)},
      {'camera': (15, 0)},
      {'camera': (0, -15)},
      {'camera': (0, 15)},
      {'jump': 1, 'forward': 1},
      {'attack': 1},
  ]

  def __init__(self, task, repeat=1, size=(64, 64), length=24000):
    import minerl  # noqa: F401
    import gym as openai_gym
    self._env = openai_gym.make({
        'discover': 'MineRLObtainDiamondShovel-v0',
        'diamond': 'MineRLObtainDiamond-v0',
    }.get(task, task))
    self._repeat = repeat
    self._size = size
    self._length = length
    self._step = 0
    self._done = True

  @functools.cached_property
  def obs_space(self):
    return {
        'image': spacelib.Space(np.uint8, self._size + (3,)),
        'reward': spacelib.Space(np.float32),
        'is_first': spacelib.Space(bool),
        'is_last': spacelib.Space(bool),
        'is_terminal': spacelib.Space(bool),
    }

  @functools.cached_property
  def act_space(self):
    return {
        'action': spacelib.Space(np.int32, (), 0, len(self.ACTIONS)),
        'reset': spacelib.Space(bool),
    }

  def step(self, action):
    if action['reset'] or self._done:
      self._done = False
      self._step = 0
      obs = self._env.reset()
      return self._obs(obs, 0.0, is_first=True)
    act = dict(self.NOOP)
    act.update(self.ACTIONS[int(action['action'])])
    reward = 0.0
    for _ in range(self._repeat):
      obs, rew, done, info = self._env.step(act)
      reward += rew
      self._step += 1
      if done:
        break
    self._done = done or self._step >= self._length
    return self._obs(obs, reward, is_last=self._done, is_terminal=done)

  def _obs(self, obs, reward, is_first=False, is_last=False,
           is_terminal=False):
    image = obs['pov'] if isinstance(obs, dict) else obs
    if image.shape[:2] != self._size:
      import cv2
      image = cv2.resize(image, self._size, interpolation=cv2.INTER_AREA)
    return dict(
        image=np.asarray(image, np.uint8),
        reward=np.float32(reward),
        is_first=is_first,
        is_last=is_last,
        is_terminal=is_terminal,
    )
