"""XArm hardware driver (reference: embodied/envs/robot_interface.py:150-276).

Thin host-side wrapper over the vendor xarm SDK with RealSense frames,
including the reference's error-clearing retry loops. Import-gated: raises
a clear error when the SDK is absent (e.g. on the learner host)."""

import time

import numpy as np


class XArmDriver:

  Z_TABLE = 0.075
  Z_HOVER = 0.30

  def __init__(self, ip='192.168.1.208'):
    try:
      from xarm.wrapper import XArmAPI
    except ImportError:
      raise ImportError(
          'xarm SDK not installed; xarm_real requires the robot host '
          'environment. Use xarm_dummy on the learner.')
    self._arm = XArmAPI(ip)
    self._clear_errors()
    self._arm.motion_enable(True)
    self._arm.set_mode(0)
    self._arm.set_state(0)
    self._camera = _RealSense()

  def _clear_errors(self, attempts=10):
    for _ in range(attempts):
      if not self._arm.has_err_warn:
        return
      self._arm.clean_error()
      self._arm.clean_warn()
      time.sleep(0.1)

  def apply_discrete(self, act):
    # Discrete deltas handled by the PickPlace env logic; the driver only
    # executes cartesian moves and gripper toggles.
    pass

  def move_to(self, pose):
    self._clear_errors()
    self._arm.set_position(*pose, wait=False)

  def set_gripper(self, closed):
    self._arm.set_gripper_position(0 if closed else 850, wait=False)

  def get_state(self):
    code, pose = self._arm.get_position()
    code, joints = self._arm.get_servo_angle()
    code, gripper = self._arm.get_gripper_position()
    return (np.asarray(pose[:6], np.float32),
            np.asarray(joints[:7], np.float32),
            np.asarray([gripper / 850.0], np.float32))

  def get_frames(self):
    return self._camera.frames()

  def close(self):
    try:
      self._arm.disconnect()
    except Exception:
      pass


class _RealSense:
  """RGB + depth capture, cropped/normalized to 64x64
  (reference: robot_interface.py:358-389)."""

  def __init__(self):
    try:
      import pyrealsense2 as rs
    except ImportError:
      self._pipeline = None
      return
    import cv2
    self._rs = rs
    self._cv2 = cv2
    ctx = rs.context()
    for dev in ctx.query_devices():
      dev.hardware_reset()
    time.sleep(2)
    self._pipeline = rs.pipeline()
    config = rs.config()
    config.enable_stream(rs.stream.depth, 640, 480, rs.format.z16, 30)
    config.enable_stream(rs.stream.color, 640, 480, rs.format.bgr8, 30)
    self._pipeline.start(config)

  def frames(self):
    if self._pipeline is None:
      return (np.zeros((64, 64, 3), np.uint8),
              np.zeros((64, 64, 1), np.uint8))
    frames = self._pipeline.wait_for_frames()
    color = np.asanyarray(frames.get_color_frame().get_data())
    depth = np.asanyarray(frames.get_depth_frame().get_data())
    depth = self._cv2.convertScaleAbs(depth, alpha=0.03)
    image = self._cv2.resize(color, (64, 64))[:, :, ::-1]
    depth = self._cv2.resize(depth, (64, 64))[:, :, None]
    depth = depth.astype(np.float32) / 255
    nearest, farthest = 0.050, 0.120
    depth = (depth - nearest) / (farthest - nearest)
    depth = (255 * np.clip(depth, 0, 1)).astype(np.uint8)
    return image.astype(np.uint8), depth
