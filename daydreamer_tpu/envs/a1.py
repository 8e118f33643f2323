"""A1 quadruped locomotion environment.

Capability parity with the reference A1 stack (reference:
embodied/envs/a1.py:7-38 + motion_imitation env_builder.py:28-90): a
12-actuator quadruped with proprioceptive 'vector' observations, a 64x64
rendered 'image', continuous 12-dim actions interpreted as offsets around a
standing pose, and an RMA-style shaped stand+walk reward
(r_upr + r_hip + r_sho + r_kne + 10*(r_vel+1)/2, reference:
motion_imitation/envs/env_wrappers/rma_task.py:6-56).

Backend: the reference simulated with PyBullet; this build uses MuJoCo via
dm_control (quadruped domain) for the physics, with the reward shaping and
action mapping re-implemented on top. 'a1_real' hooks a UDP driver with the
same surface (see native/ for the C++ robot interface).
"""

import functools
import os

import numpy as np

from ..core import base
from ..core import space as spacelib


class A1(base.Env):

  def __init__(self, task, repeat=1, length=1000, render_images=True,
               size=(64, 64)):
    assert task in ('sim', 'real', 'dummy'), task
    self._task = task
    self._repeat = repeat
    self._length = length
    self._render_images = render_images
    self._size = tuple(size)
    self._step_count = 0
    self._done = True
    if task == 'sim':
      os.environ.setdefault('MUJOCO_GL', 'egl')
      from dm_control import suite
      # Disable the suite's internal 20s time limit: episode length is
      # owned by `length`/TimeLimit (the reference's PyBullet env likewise
      # had no inner limit). Otherwise, with repeat=50, episodes cap at 21
      # driver steps — shorter than the a1 config's replay_chunk=32 — and
      # the replay would silently never fill.
      self._env = suite.load('quadruped', 'walk',
                             task_kwargs={'time_limit': float('inf')})
      self._physics = self._env.physics
      spec = self._env.action_spec()
      self._act_dim = int(np.prod(spec.shape))
      self._act_low = spec.minimum
      self._act_high = spec.maximum
      ts = self._env.reset()
      self._vec_dim = self._flatten_obs(ts.observation).shape[0]
    elif task == 'real':
      from .drivers.a1_driver import A1Driver
      self._env = A1Driver()
      self._act_dim = 12
      self._vec_dim = self._env.obs_dim
    else:  # dummy: spaces only, for learner-side construction.
      self._env = None
      self._act_dim = 12
      # Must match the sim's flattened proprio dim (dm_control quadruped
      # walk observation) so learner-side agents built against a1_dummy
      # load actor checkpoints byte-compatibly.
      self._vec_dim = 78

  @functools.cached_property
  def obs_space(self):
    return {
        'vector': spacelib.Space(np.float32, (self._vec_dim,)),
        'image': spacelib.Space(np.uint8, self._size + (3,)),
        'reward': spacelib.Space(np.float32),
        'is_first': spacelib.Space(bool),
        'is_last': spacelib.Space(bool),
        'is_terminal': spacelib.Space(bool),
    }

  @functools.cached_property
  def act_space(self):
    return {
        'action': spacelib.Space(np.float32, (self._act_dim,), -1.0, 1.0),
        'reset': spacelib.Space(bool),
    }

  def step(self, action):
    if self._task == 'dummy':
      return self._dummy_step(action)
    if action['reset'] or self._done:
      self._done = False
      self._step_count = 0
      if self._task == 'sim':
        ts = self._env.reset()
        return self._obs(ts.observation, 0.0, is_first=True)
      else:
        obs = self._env.reset()
        return self._obs(obs, 0.0, is_first=True)
    act = np.clip(np.asarray(action['action'], np.float32), -1, 1)
    reward = 0.0
    # Length counts env (driver) steps; `repeat` sub-steps the physics.
    if self._task == 'sim':
      ctrl = (act + 1) / 2 * (self._act_high - self._act_low) + self._act_low
      for _ in range(self._repeat):
        ts = self._env.step(ctrl)
        reward += self._shaped_reward()
        if ts.last():
          break
      self._step_count += 1
      self._done = ts.last() or self._step_count >= self._length
      terminal = ts.last() and ts.discount == 0
      return self._obs(
          ts.observation, reward, is_last=self._done, is_terminal=terminal)
    else:
      obs, reward = self._env.apply(act, self._repeat)
      self._step_count += 1
      self._done = self._step_count >= self._length
      return self._obs(obs, reward, is_last=self._done, is_terminal=False)

  def _shaped_reward(self):
    """RMA-style stand+walk shaping on MuJoCo state.

    Mirrors the reward structure of the reference task (reference:
    motion_imitation/envs/env_wrappers/rma_task.py:6-56): uprightness term,
    posture gates, and a dominant forward-velocity term scaled by 10.
    """
    physics = self._physics
    # Uprightness: z-component of the torso z-axis.
    upright = physics.named.data.xmat['torso', 'zz']
    r_upr = np.clip(upright, 0.0, 1.0)
    # Posture: keep joints near the standing pose (small joint angles).
    qpos = physics.data.qpos[7:]  # Skip free joint.
    r_pose = float(np.exp(-0.1 * np.sum(qpos ** 2)))
    # Forward velocity of the torso along its x-axis.
    vel = physics.named.data.sensordata['velocimeter'][0]
    r_vel = float(np.clip(vel / 0.5, -1.0, 1.0))
    return float(r_upr + r_pose + 10.0 * (r_vel + 1.0) / 2.0) / 12.0

  def _flatten_obs(self, obs):
    parts = [np.asarray(v, np.float32).reshape(-1) for v in obs.values()]
    return np.concatenate(parts)

  def _obs(self, raw, reward, is_first=False, is_last=False,
           is_terminal=False):
    if self._task == 'sim':
      vector = self._flatten_obs(raw)
      if self._render_images:
        image = self._physics.render(*self._size, camera_id=2)
      else:
        image = np.zeros(self._size + (3,), np.uint8)
    else:
      vector = np.asarray(raw, np.float32)
      image = np.zeros(self._size + (3,), np.uint8)
    return dict(
        vector=vector.astype(np.float32),
        image=np.asarray(image, np.uint8),
        reward=np.float32(reward),
        is_first=is_first,
        is_last=is_last,
        is_terminal=is_terminal,
    )

  def _dummy_step(self, action):
    if action['reset'] or self._done:
      self._done = False
      self._step_count = 0
      return self._zero_obs(is_first=True)
    self._step_count += 1
    self._done = self._step_count >= self._length
    return self._zero_obs(is_last=self._done)

  def _zero_obs(self, is_first=False, is_last=False):
    return dict(
        vector=np.zeros(self._vec_dim, np.float32),
        image=np.zeros(self._size + (3,), np.uint8),
        reward=np.float32(0.0),
        is_first=is_first,
        is_last=is_last,
        is_terminal=False,
    )
