"""Clip-tracking imitation task on the quadruped sim.

Re-implements the reference's imitation task structure (reference:
motion_imitation/envs/env_wrappers/imitation_task.py:1-1215 — pose /
velocity / root tracking rewards with exponential kernels, phase
observation, and deviation-based early termination from
imitation_terminal_conditions.py) on this framework's MuJoCo A1 env.
"""

import numpy as np

from ..envs.a1 import A1
from .motion_clip import synthesize_gait

# dm_control quadruped: qpos = 7 (free root) + 4 legs x (yaw, pitch, knee,
# ankle); the actuated triplet per leg is (yaw, pitch, knee), which the
# clip's (hip_swing, upper, knee) layout maps onto 1:1.
_ACTUATED = np.array([7 + 4 * leg + j for leg in range(4) for j in range(3)])

# Reward mixture weights; same structure as the reference's
# imitation_task.py (pose/velocity/root terms with exp kernels).
WEIGHTS = dict(pose=0.5, velocity=0.1, height=0.15, upright=0.25)
SCALES = dict(pose=2.0, velocity=0.005, height=20.0, upright=5.0)


class ImitationA1(A1):
  """A1 sim whose reward tracks a reference motion clip.

  The vector observation is the base env's proprio vector extended with
  the clip phase (sin, cos) and the 12 target joint angles at the
  current sim time, mirroring the reference's target-pose observations
  (imitation_task.py builds future target frames into the obs).
  """

  def __init__(self, clip=None, gait='trot', repeat=1, length=1000,
               render_images=False, size=(64, 64), terminate_on_fall=True):
    self._clip = clip or synthesize_gait(gait)
    self._terminate_on_fall = terminate_on_fall
    # The base __init__ measures _vec_dim through our overridden
    # _flatten_obs, so the +14 phase/target features are included.
    super().__init__('sim', repeat=repeat, length=length,
                     render_images=render_images, size=size)

  def _clip_time(self):
    return float(self._physics.data.time)

  def _target_features(self):
    t = self._clip_time()
    phase = 2 * np.pi * self._clip.phase(t)
    target = self._clip.joints_at(t)
    return np.concatenate([[np.sin(phase), np.cos(phase)], target])

  def _flatten_obs(self, obs):
    base = super()._flatten_obs(obs)
    return np.concatenate([base, self._target_features()]).astype(np.float32)

  def _fallen(self):
    # The dm_control quadruped spawns with a randomized root orientation
    # (upright as low as ~0.4) and settles over the first steps, so only
    # terminate once clearly overturned or collapsed, after a short
    # settling grace period (reference imitation_terminal_conditions.py
    # likewise gates on gross pose deviation, not small errors).
    if self._step_count < 10:
      return False
    upright = self._physics.named.data.xmat['torso', 'zz']
    height = self._physics.named.data.xpos['torso', 'z']
    return upright < 0.0 or height < 0.15

  def _shaped_reward(self):
    physics = self._physics
    t = self._clip_time()
    target_q = self._clip.joints_at(t)
    target_qd = self._clip.joint_velocity_at(t)
    target_h = self._clip.pose_at(t)[2]
    q = physics.data.qpos[_ACTUATED]
    qd = physics.data.qvel[_ACTUATED - 1]  # qvel has no quat 4th component.
    r_pose = np.exp(-SCALES['pose'] * np.sum((q - target_q) ** 2))
    r_vel = np.exp(-SCALES['velocity'] * np.sum((qd - target_qd) ** 2))
    height = physics.named.data.xpos['torso', 'z']
    r_height = np.exp(-SCALES['height'] * (height - target_h) ** 2)
    upright = physics.named.data.xmat['torso', 'zz']
    r_upr = np.exp(-SCALES['upright'] * (1.0 - max(upright, 0.0)) ** 2)
    return float(WEIGHTS['pose'] * r_pose + WEIGHTS['velocity'] * r_vel +
                 WEIGHTS['height'] * r_height + WEIGHTS['upright'] * r_upr)

  def step(self, action):
    obs = super().step(action)
    if (self._terminate_on_fall and not obs['is_first']
        and not self._done and self._fallen()):
      self._done = True
      obs = dict(obs, is_last=True, is_terminal=True)
    return obs
