"""Robot arm pick-and-place environments (XArm / UR5).

Parity with the reference robot env (reference:
embodied/envs/robot_interface.py:279-828): the dummy variants
(``xarm_dummy``, ``ur5_dummy``) skip all hardware and exist to expose
obs/act spaces to the learner half of an async actor/learner pair
(reference: robot_interface.py:319-322 with train.py:91 closing the env) and
to make the full agent stack exercisable in tests. Real-hardware drivers
(xarm SDK / urx + RealSense) attach behind the same interface when their
SDKs are importable; they are intentionally thin host-side Python since no
robot hardware touches the TPU compute path.
"""

import dataclasses
import enum
import time

import numpy as np

from ..core import base
from ..core import space as spacelib


class RobotType(enum.Enum):
  XARM = 'xarm'
  UR5 = 'ur5'

  def joints(self):
    return {'xarm': 7, 'ur5': 6}[self.value]


class Rate:
  """Fixed-rate sleeper for real-robot control loops (~20 Hz)."""

  def __init__(self, rate_hz):
    self.last = time.time()
    self.rate = rate_hz

  def sleep(self):
    while self.last + 1.0 / self.rate > time.time():
      time.sleep(0.001)
    self.last = time.time()


@dataclasses.dataclass
class EnvConfig:
  max_delta_m: float = 0.04
  control_rate_hz: float = 20
  with_camera: bool = True
  use_real: bool = False
  robot_type: RobotType = RobotType.XARM
  enable_z: bool = True
  length: int = 100


class PickPlace(base.Env):
  """Discrete pick-and-place: +-x, +-y, toggle gripper, (optional) z-toggle.

  In dummy mode a tiny kinematic simulation stands in for the arm so the env
  produces consistent transitions for tests and pipeline development:
  the virtual object is grasped when the gripper closes nearby and a +10
  reward fires on transferring it across the workspace midline, matching
  the reference's shaped reward structure (+1 grasp / -1 drop / +10
  transfer, reference: robot_interface.py:776-828).
  """

  def __init__(self, cfg: EnvConfig):
    self.cfg = cfg
    self._num_actions = 6 if cfg.enable_z else 5
    self._step_count = 0
    self._done = False
    if cfg.use_real:
      self._arm = self._make_real_arm()
      self._rate = Rate(cfg.control_rate_hz)
    else:
      self._arm = None
    self._reset_sim()

  def _make_real_arm(self):
    if self.cfg.robot_type == RobotType.XARM:
      from .drivers.xarm_driver import XArmDriver
      return XArmDriver()
    elif self.cfg.robot_type == RobotType.UR5:
      from .drivers.ur5_driver import UR5Driver
      return UR5Driver()
    raise NotImplementedError(self.cfg.robot_type)

  @property
  def obs_space(self):
    return {
        'image': spacelib.Space(np.uint8, (64, 64, 3)),
        'depth': spacelib.Space(np.uint8, (64, 64, 1)),
        'cartesian_position': spacelib.Space(np.float32, (6,)),
        'joint_positions': spacelib.Space(
            np.float32, (self.cfg.robot_type.joints(),)),
        'gripper_pos': spacelib.Space(np.float32, (1,)),
        'gripper_side': spacelib.Space(np.float32, (3,)),
        'grasped_side': spacelib.Space(np.float32, (3,)),
        'reward': spacelib.Space(np.float32),
        'is_first': spacelib.Space(bool),
        'is_last': spacelib.Space(bool),
        'is_terminal': spacelib.Space(bool),
    }

  @property
  def act_space(self):
    return {
        'action': spacelib.Space(np.int32, (), 0, self._num_actions),
        'reset': spacelib.Space(bool),
    }

  def step(self, action):
    if action['reset'] or self._done:
      self._step_count = 0
      self._done = False
      self._reset_sim()
      return self._obs(0.0, is_first=True)
    reward = self._apply(int(action['action']))
    self._step_count += 1
    if self.cfg.length:
      self._done = self._step_count >= self.cfg.length
    return self._obs(reward, is_last=self._done, is_terminal=False)

  def close(self):
    if self._arm is not None:
      self._arm.close()

  # -- tiny kinematic stand-in ------------------------------------------------

  def _reset_sim(self):
    self._pos = np.zeros(2, np.float32)  # gripper xy on [-1, 1] grid
    self._grip = 0.0
    self._hover = True
    self._obj = np.array([0.5, 0.0], np.float32)
    self._grasped = False
    self._obj_side = 1.0  # +1 right, -1 left

  def _apply(self, act):
    delta = self.cfg.max_delta_m / 0.04 * 0.1
    reward = 0.0
    if act == 0:
      self._pos[0] = min(1.0, self._pos[0] + delta)
    elif act == 1:
      self._pos[0] = max(-1.0, self._pos[0] - delta)
    elif act == 2:
      self._pos[1] = min(1.0, self._pos[1] + delta)
    elif act == 3:
      self._pos[1] = max(-1.0, self._pos[1] - delta)
    elif act == 4:  # Toggle gripper.
      self._grip = 1.0 - self._grip
      near = np.linalg.norm(self._pos - self._obj) < 0.15
      if self._grip and near and not self._grasped:
        self._grasped = True
        reward += 1.0
      elif not self._grip and self._grasped:
        self._grasped = False
        side = 1.0 if self._pos[0] > 0 else -1.0
        if side != self._obj_side:
          reward += 10.0
          self._obj_side = side
        else:
          reward -= 1.0
        self._obj = self._pos.copy()
    elif act == 5:  # Toggle hover height.
      self._hover = not self._hover
    if self._grasped:
      self._obj = self._pos.copy()
    if self._arm is not None:
      self._arm.apply_discrete(act)
      self._rate.sleep()
    return reward

  def _obs(self, reward, is_first=False, is_last=False, is_terminal=False):
    if self._arm is not None:
      image, depth = self._arm.get_frames()
      cartesian, joints, gripper = self._arm.get_state()
    else:
      image = np.zeros((64, 64, 3), np.uint8)
      depth = np.zeros((64, 64, 1), np.uint8)
      # Render gripper and object positions into the image so the world
      # model has visual signal even in dummy mode.
      gx, gy = ((self._pos + 1) / 2 * 63).astype(int)
      ox, oy = ((self._obj + 1) / 2 * 63).astype(int)
      image[gy, gx] = (255, 0, 0)
      image[oy, ox] = (0, 255, 0)
      cartesian = np.concatenate(
          [self._pos, [0.1 if self._hover else 0.0], np.zeros(3)]
      ).astype(np.float32)
      joints = np.zeros(self.cfg.robot_type.joints(), np.float32)
      gripper = np.array([self._grip], np.float32)
    side = np.zeros(3, np.float32)
    side[0 if self._pos[0] > 0 else 1] = 1.0
    grasped_side = np.zeros(3, np.float32)
    grasped_side[2 if not self._grasped else (0 if self._obj_side > 0 else 1)] = 1.0
    return dict(
        image=image,
        depth=depth,
        cartesian_position=np.asarray(cartesian, np.float32),
        joint_positions=np.asarray(joints, np.float32),
        gripper_pos=np.asarray(gripper, np.float32),
        gripper_side=side,
        grasped_side=grasped_side,
        reward=np.float32(reward),
        is_first=is_first,
        is_last=is_last,
        is_terminal=is_terminal,
    )
