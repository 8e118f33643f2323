"""Env adapter tests: protocol compliance for each available suite."""

import numpy as np
import pytest

from daydreamer_tpu.envs import load_env, load_single_env


def rollout(env, steps=10):
  acts = {'action': np.stack([env.act_space['action'].sample()
                              for _ in range(len(env))]),
          'reset': np.ones(len(env), bool)}
  obs = env.step(acts)
  for key, space in env.obs_space.items():
    assert obs[key].shape == (len(env),) + space.shape, key
  assert obs['is_first'].all()
  for _ in range(steps):
    acts = {'action': np.stack([env.act_space['action'].sample()
                                for _ in range(len(env))]),
            'reset': np.zeros(len(env), bool)}
    obs = env.step(acts)
  return obs


class TestRobotEnvs:

  @pytest.mark.parametrize('task', ['xarm_dummy', 'ur5_dummy'])
  def test_pickplace_dummy(self, task):
    env = load_env(task, amount=1, parallel='none', length=20)
    assert 'image' in env.obs_space
    assert 'depth' in env.obs_space
    assert 'cartesian_position' in env.obs_space
    assert env.act_space['action'].discrete
    rollout(env)
    env.close()

  def test_pickplace_reward_logic(self):
    from daydreamer_tpu.envs.robot import PickPlace, EnvConfig, RobotType
    env = PickPlace(EnvConfig(use_real=False, robot_type=RobotType.XARM,
                              length=1000))
    obs = env.step({'action': 0, 'reset': True})
    # Drive gripper onto the object at (0.5, 0) and grasp.
    total = 0.0
    for _ in range(6):
      obs = env.step({'action': 1, 'reset': False})  # +x
      total += obs['reward']
    obs = env.step({'action': 4, 'reset': False})  # Close gripper.
    total += obs['reward']
    assert total >= 1.0  # Grasp reward fired.

  def test_real_arm_actuation_command_stream(self):
    """Scripted pick-and-transfer against a fake driver: the env must
    actuate the arm (bounded grid moves, gripper, z dips) and pay the
    +1 grasp / +10 transfer rewards from real state feedback."""
    from daydreamer_tpu.envs import robot as rb

    class FakeArm:
      workspace = rb.Workspace(
          left_min=(0.24, 0.08), left_max=(0.52, 0.16),
          right_min=(0.24, -0.16), right_max=(0.52, -0.08),
          z_table=0.18, z_hover=0.30, axis=1)

      def __init__(self):
        self.log = []
        self.pos = np.array([0.28, 0.12, self.workspace.z_table])
        self.closed = False
        self.object_xy = None  # Set by the test after reset.
        self.attached = False

      def move_to(self, x, y, z=None):
        if z is None:
          z = self.pos[2]
        self.log.append(('move', round(x, 4), round(y, 4), round(z, 4)))
        self.pos = np.array([x, y, z])
        if self.attached:
          self.object_xy = self.pos[:2].copy()

      def set_gripper(self, closed):
        self.log.append(('grip', closed))
        self.closed = closed
        near = (self.object_xy is not None and
                np.linalg.norm(self.pos[:2] - self.object_xy) < 0.02 and
                self.pos[2] < 0.2)
        self.attached = bool(closed and (self.attached or near))

      def get_state(self):
        if not self.closed:
          grip = 0.0            # Fully open.
        elif self.attached:
          grip = 0.5            # Stopped on the object: holding.
        else:
          grip = 1.0            # Fully closed, empty.
        cart = np.concatenate([self.pos, np.zeros(3)]).astype(np.float32)
        return cart, np.zeros(7, np.float32), np.array([grip], np.float32)

      def get_frames(self):
        return (np.zeros((64, 64, 3), np.uint8),
                np.zeros((64, 64, 1), np.uint8))

      def close(self):
        self.log.append(('close',))

    fake = FakeArm()
    env = rb.PickPlace(rb.EnvConfig(
        robot_type=rb.RobotType.XARM, enable_z=True, length=0,
        control_rate_hz=1000, driver=fake, seed=0))
    obs = env.step({'action': 0, 'reset': True})
    assert obs['is_first']
    # Reset opened the gripper and parked the arm at a grid point in the
    # left bin at table height.
    assert ('grip', False) in fake.log
    park = fake.log[-1]
    assert park[0] == 'move' and park[3] == 0.18
    assert 0.08 <= park[2] <= 0.16  # Left bin.
    # Plant the object one grid cell +y of the arm and scoop it.
    fake.object_xy = fake.pos[:2] + np.array([0.0, 0.04])
    obs = env.step({'action': 3, 'reset': False})  # +y onto the object.
    move = fake.log[-1]
    assert move[0] == 'move' and move[3] == 0.18
    assert abs(move[2] - fake.object_xy[1]) < 1e-6
    obs = env.step({'action': 4, 'reset': False})  # Close: grasp.
    assert obs['reward'] == 1.0
    assert fake.log[-1] == ('grip', True)
    obs = env.step({'action': 5, 'reset': False})  # Dip-and-lift to hover.
    assert obs['reward'] == 0.0
    assert fake.pos[2] == 0.30
    # Carry across the divide (-y) until the transfer pays out.
    total, crossed = 0.0, False
    for _ in range(12):
      obs = env.step({'action': 2, 'reset': False})  # -y.
      total += obs['reward']
      if obs['reward'] == 10.0:
        crossed = True
        break
    assert crossed, fake.log
    # Transfer auto-released and re-parked at the table.
    assert ('grip', False) in fake.log[-4:]
    assert fake.pos[2] == 0.18
    assert -0.16 + 0.03 <= fake.object_xy[1] <= -0.08 - 0.03  # Right safe.
    env.close()
    assert fake.log[-1] == ('close',)

  def test_sphero_dummy(self):
    env = load_env('sphero_dummy', amount=1, parallel='none', length=20)
    obs = rollout(env)
    assert obs['image'].shape == (1, 64, 64, 3)
    env.close()

  def test_a1_dummy_spaces(self):
    env = load_env('a1_dummy', amount=1, parallel='none', length=20)
    # 12 motor angles + IMU [roll, pitch, droll, dpitch], matching the sim
    # (reference env_builder.py:62-73 sensor suite).
    assert env.obs_space['vector'].shape == (16,)
    assert env.act_space['action'].shape == (12,)
    rollout(env)
    env.close()


class TestHRLGrid:

  def test_reaches_goal(self):
    env = load_single_env('hrlgrid_4')
    obs = env.step({'action': np.eye(5, dtype=np.float32)[0],
                    'reset': True})
    # Sweep right then down; should eventually collect goal reward.
    total = 0.0
    for _ in range(60):
      act = np.eye(5, dtype=np.float32)[np.random.randint(1, 5)]
      obs = env.step({'action': act, 'reset': False})
      total += obs['reward']
    assert np.isfinite(total)


class TestGamepad:
  """Evdev gamepad reader driven by a synthetic event stream."""

  def _run(self, events):
    import io
    import time
    from daydreamer_tpu.envs.drivers import gamepad as gp
    stream = io.BytesIO(b''.join(events))
    pad = gp.Gamepad(vel_scale_x=0.4, vel_scale_y=0.4, vel_scale_rot=1.0,
                     device=stream)
    deadline = time.time() + 2.0
    while pad._thread.is_alive() and time.time() < deadline:
      time.sleep(0.01)
    pad.is_running = False
    return pad

  def test_stick_to_velocity_mapping(self):
    from daydreamer_tpu.envs.drivers import gamepad as gp
    pad = self._run([
        gp.pack_event(gp.EV_ABS, gp.ABS_Y, -32768),  # Full forward.
        gp.pack_event(gp.EV_ABS, gp.ABS_X, 16384),   # Half right.
        gp.pack_event(gp.EV_ABS, gp.ABS_RX, -32768),  # Full left yaw.
    ])
    vx, vy, wz = pad.speed_command()
    assert vx == pytest.approx(0.4)
    assert vy == pytest.approx(-0.2)
    assert wz == pytest.approx(1.0)
    assert not pad.estop_flagged

  def test_estop_latches_and_zeroes(self):
    from daydreamer_tpu.envs.drivers import gamepad as gp
    pad = self._run([
        gp.pack_event(gp.EV_ABS, gp.ABS_Y, -32768),
        gp.pack_event(gp.EV_KEY, gp.BTN_TL, 1),
        gp.pack_event(gp.EV_KEY, gp.BTN_TR, 1),
        gp.pack_event(gp.EV_ABS, gp.ABS_Y, -32768),  # After estop: ignored.
    ])
    assert pad.estop_flagged
    assert pad.speed_command() == (0.0, 0.0, 0.0)


class TestA1Model:
  """Unitree A1 MuJoCo model: action map, reward shaping, reset safety."""

  def test_action_mapping_roundtrip(self):
    from daydreamer_tpu.envs import a1_model as m
    acts = np.linspace(-1, 1, 12)
    angles = m.unnormalize_action(acts)
    assert (angles >= m.MOTOR_MINS - 1e-9).all()
    assert (angles <= m.MOTOR_MAXS + 1e-9).all()
    np.testing.assert_allclose(m.normalize_action(angles), acts, atol=1e-9)

  def test_standing_beats_fallen(self):
    from daydreamer_tpu.envs import a1_model as m
    robot = m.A1Robot(action_repeat=20, seed=0)
    task = m.RMATask()
    robot.reset()
    stand_pose = m.STANDING_POSE
    for _ in range(60):
      robot.apply_action(stand_pose)
    r_stand = task(robot)
    # Knock it over: zero torques while tipped.
    robot.data.qpos[3:7] = [0.7071, 0.7071, 0, 0]  # 90deg roll.
    robot.data.qpos[2] = 0.15
    robot._mujoco.mj_forward(robot.model, robot.data)
    r_fallen = task(robot)
    # Standing opens the posture gates (+~4) over a fallen robot; both
    # carry the +5 zero-velocity floor (rma_task.py:6-56 shape).
    assert r_stand > 8.0, r_stand
    assert r_fallen < 6.5, r_fallen
    assert r_stand > r_fallen + 2.0
    robot.close()

  def test_safe_joints_reset_restores_bounds(self):
    from daydreamer_tpu.envs import a1_model as m
    robot = m.A1Robot(action_repeat=20, seed=0)
    robot.reset()
    # Force a joint out of bounds, then reset at current position.
    robot.data.qpos[7] = m.MOTOR_MAXS[0] + 0.3
    robot._mujoco.mj_forward(robot.model, robot.data)
    robot.reset(at_current_position=True)
    q = robot.motor_angles
    assert (q <= m.MOTOR_MAXS - 0.02).all(), q
    assert (q >= m.MOTOR_MINS + 0.02).all(), q
    robot.close()

  def test_sensor_latency_delays_observation(self):
    # With latency configured, observation() reads the state snapshotted
    # `latency` seconds in the past (reference minitaur.py's delayed
    # observation buffer); zero latency reads the live state.
    from daydreamer_tpu.envs import a1_model as m
    lag = 5  # Substeps.
    robot = m.A1Robot(
        action_repeat=10, seed=0, sensor_latency=lag * m.SIM_TIMESTEP)
    robot.reset()
    seen = []
    push = np.clip(m.normalize_action(m.STANDING_POSE) + 0.3, -1, 1)
    for _ in range(4):
      robot.apply_action(push)
      seen.append(robot.observation().copy())
    live = robot._raw_observation()
    delayed = robot.observation()
    assert not np.allclose(delayed, live)  # Joints are still moving.
    # The buffer holds exactly lag+1 snapshots: the head is lag substeps old.
    assert len(robot._obs_history) == lag + 1
    robot.reset()
    assert not robot._obs_history  # History must not leak across episodes.
    robot.close()

  def test_reward_velocity_term(self):
    from daydreamer_tpu.envs import a1_model as m
    robot = m.A1Robot(action_repeat=20, seed=0)
    task = m.RMATask(des_forward_speed=0.3)
    robot.reset()
    for _ in range(60):
      robot.apply_action(m.STANDING_POSE)
    r_still = task(robot)
    # Inject forward base velocity along heading: r_vel term activates.
    robot.data.qvel[0] = 0.3
    r_moving = task(robot)
    assert r_moving > r_still + 3.0, (r_moving, r_still)
    robot.close()


@pytest.mark.slow
class TestMuJoCoEnvs:
  """Rendering envs run in env subprocesses (parallel='process'), the same
  isolation production uses: creating an EGL context inside the main test
  process intermittently segfaults in Mesa after the suite's earlier
  TF/XLA/torch activity, and a fresh env process sidesteps that entirely."""

  def test_a1_sim(self):
    env = load_env('a1_sim', amount=1, parallel='process', length=20)
    obs = rollout(env, steps=5)
    assert obs['vector'].shape[-1] == 16
    assert np.isfinite(obs['reward']).all()
    assert obs['image'].sum() > 0  # Rendered, not blank.
    env.close()

  def test_dmc_vision(self):
    env = load_env('dmc_walker_walk', amount=1, parallel='process',
                   repeat=2)
    obs = rollout(env, steps=5)
    assert obs['image'].shape == (1, 64, 64, 3)
    env.close()


class TestMinecraftControls:
  """The MineRL adapter's control shaping and task tables, minerl-free
  (reference: embodied/envs/minecraft.py:160-180, minerl_internal.py)."""

  def test_action_tables(self):
    from daydreamer_tpu.envs import minerl_tasks as mt
    for task in ('wood', 'table', 'axe', 'diamond', 'discover'):
      table = mt.full_actions(task)
      assert 'attack' in table and 'jump' in table
      for action in table.values():
        assert set(action) == set(mt.NOOP)
    assert 'craft_wooden_axe' in mt.full_actions('axe')
    assert 'smelt_iron_ingot' in mt.full_actions('diamond')
    assert len(mt.full_actions('discover')) > len(mt.full_actions('diamond'))
    # Reward schedules end on the target item with the largest payout.
    for task, info in mt.REWARDS.items():
      items, rewards = zip(*info['schedule'])
      assert items[-1] == info['target']
      assert rewards[-1] == max(rewards)

  def test_sticky_attack_suppresses_jump(self):
    from daydreamer_tpu.envs.minecraft import ActionSmoother
    from daydreamer_tpu.envs import minerl_tasks as mt
    smoother = ActionSmoother(sticky_attack=3, sticky_jump=2)
    attack = dict(mt.NOOP, attack=1)
    jump = dict(mt.NOOP, jump=1)
    out = smoother(attack)
    assert out['attack'] == 1
    out = smoother(jump)  # Attack still sticky: jump suppressed.
    assert out['attack'] == 1 and out['jump'] == 0
    out = smoother(dict(mt.NOOP))
    assert out['attack'] == 1  # Third sticky step.
    out = smoother(dict(mt.NOOP))
    assert out['attack'] == 0

  def test_sticky_jump_holds_forward(self):
    from daydreamer_tpu.envs.minecraft import ActionSmoother
    from daydreamer_tpu.envs import minerl_tasks as mt
    smoother = ActionSmoother(sticky_attack=0, sticky_jump=2)
    out = smoother(dict(mt.NOOP, jump=1))
    assert out['jump'] == 1 and out['forward'] == 1
    out = smoother(dict(mt.NOOP))
    assert out['jump'] == 1 and out['forward'] == 1
    out = smoother(dict(mt.NOOP))
    assert out['jump'] == 0 and out['forward'] == 0

  def test_pitch_clamp(self):
    from daydreamer_tpu.envs.minecraft import ActionSmoother
    from daydreamer_tpu.envs import minerl_tasks as mt
    smoother = ActionSmoother(
        sticky_attack=0, sticky_jump=0, pitch_limit=(-30, 30))
    up = dict(mt.NOOP, camera=(-15, 0))
    assert smoother(up)['camera'] == (-15, 0)
    assert smoother(up)['camera'] == (-15, 0)
    # At -30 now: further up is clamped, yaw preserved.
    out = smoother(dict(mt.NOOP, camera=(-15, 5)))
    assert out['camera'] == (0, 5)
    # Down is still allowed.
    assert smoother(dict(mt.NOOP, camera=(15, 0)))['camera'] == (15, 0)


class TestSpheroTracker:

  def test_tracker_locates_ball(self):
    from daydreamer_tpu.envs.sphero import BallTracker
    import numpy as np
    frame = np.zeros((480, 640, 3), np.uint8)
    frame[:] = (40, 35, 30)
    cv_y, cv_x = 220, 330
    yy, xx = np.ogrid[:480, :640]
    frame[(xx - cv_x) ** 2 + (yy - cv_y) ** 2 <= 400] = (250, 250, 250)
    tracker = BallTracker((0, 0, 160), (180, 80, 255), (193, 67), (480, 370))
    pos, mask, found = tracker(frame)
    assert found
    expect = (np.array([cv_x, cv_y]) - (193, 67)) / (
        np.array([480, 370]) - (193, 67))
    np.testing.assert_allclose(pos, expect, atol=0.02)
    # Ball removed: tracker reports last seen position, found=False.
    empty = np.zeros((480, 640, 3), np.uint8)
    pos2, _, found2 = tracker(empty)
    assert not found2
    np.testing.assert_allclose(pos2, pos)

  def test_reward_geometry_and_success(self):
    from daydreamer_tpu.envs.sphero import SpheroEnv, EnvConfig
    import numpy as np
    env = SpheroEnv(EnvConfig(length=10, seed=0))
    obs = env.step({'reset': True, 'action': np.zeros(2, np.float32)})
    # Park the simulated ball exactly on the goal: reward ~ 0, success.
    env._camera.pos = np.asarray(env.cfg.goal, np.float64)
    obs = env.step({'reset': False, 'action': np.zeros(2, np.float32)})
    assert obs['reward'] > -0.05, obs['reward']
    assert obs['log_success'] == 1
    # Far corner: strongly negative reward, no success.
    env._camera.pos = np.array([0.1, 0.9])
    obs = env.step({'reset': False, 'action': np.zeros(2, np.float32)})
    assert obs['reward'] < -0.5
    assert obs['log_success'] == 0
    env.close()

  def test_actions_move_the_ball(self):
    from daydreamer_tpu.envs.sphero import SpheroEnv, EnvConfig
    import numpy as np
    env = SpheroEnv(EnvConfig(length=50, seed=1))
    env.step({'reset': True, 'action': np.zeros(2, np.float32)})
    start = env._camera.pos.copy()
    for _ in range(10):
      env.step({'reset': False, 'action': np.ones(2, np.float32)})
    assert np.linalg.norm(env._camera.pos - start) > 0.05
    env.close()
