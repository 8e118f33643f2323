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
      obs = env.step({'action': 0, 'reset': False})  # +x
      total += obs['reward']
    obs = env.step({'action': 4, 'reset': False})  # Close gripper.
    total += obs['reward']
    assert total >= 1.0  # Grasp reward fired.

  def test_sphero_dummy(self):
    env = load_env('sphero_dummy', amount=1, parallel='none', length=20)
    obs = rollout(env)
    assert obs['image'].shape == (1, 64, 64, 3)
    env.close()

  def test_a1_dummy_spaces(self):
    env = load_env('a1_dummy', amount=1, parallel='none', length=20)
    assert env.obs_space['vector'].shape == (78,)
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


@pytest.mark.slow
class TestMuJoCoEnvs:

  def test_a1_sim(self):
    env = load_env('a1_sim', amount=1, parallel='none', length=20)
    obs = rollout(env, steps=5)
    assert obs['vector'].shape[-1] == env.obs_space['vector'].shape[0]
    assert np.isfinite(obs['reward']).all()
    assert obs['image'].sum() > 0  # Rendered, not blank.
    env.close()

  def test_dmc_vision(self):
    env = load_env('dmc_walker_walk', amount=1, parallel='none', repeat=2)
    obs = rollout(env, steps=5)
    assert obs['image'].shape == (1, 64, 64, 3)
    env.close()
