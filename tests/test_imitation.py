"""Motion-imitation harness tests: clip math, PPO update, task env."""

import numpy as np
import pytest

from daydreamer_tpu.imitation import MotionClip, synthesize_gait
from daydreamer_tpu.imitation.motion_clip import FRAME_DIM, JOINTS


class TestMotionClip:

  def test_synthesized_gait_shape_and_loop(self):
    clip = synthesize_gait('trot', period=0.6, n_frames=20, speed=0.4)
    assert clip.frames.shape == (21, FRAME_DIM)
    assert clip.duration == pytest.approx(0.6)
    # Joints wrap: pose at t and t+duration match (cycle offset on root).
    a, b = clip.pose_at(0.1), clip.pose_at(0.1 + clip.duration)
    np.testing.assert_allclose(a[JOINTS], b[JOINTS], atol=1e-9)
    # Root x advances by speed*period per cycle.
    assert b[0] - a[0] == pytest.approx(0.4 * 0.6)

  def test_interpolation_and_phase(self):
    frames = np.zeros((3, FRAME_DIM))
    frames[:, 3:7] = (0, 0, 0, 1)
    frames[0, 7], frames[1, 7], frames[2, 7] = 0.0, 1.0, 2.0
    clip = MotionClip(frames, 0.5, loop='Clamp')
    assert clip.joints_at(0.25)[0] == pytest.approx(0.5)
    assert clip.joints_at(99.0)[0] == pytest.approx(2.0)  # Clamped.
    assert clip.phase(0.5) == pytest.approx(0.5)

  def test_file_roundtrip(self, tmp_path):
    clip = synthesize_gait('pace', n_frames=8)
    path = str(tmp_path / 'pace.txt')
    clip.save(path)
    loaded = MotionClip.from_file(path)
    np.testing.assert_allclose(loaded.frames, clip.frames)
    assert loaded.frame_duration == pytest.approx(clip.frame_duration)

  def test_joint_velocity_matches_slope(self):
    frames = np.zeros((3, FRAME_DIM))
    frames[:, 3:7] = (0, 0, 0, 1)
    frames[:, 7] = (0.0, 1.0, 2.0)  # Slope 2 rad/s at dt=0.5.
    clip = MotionClip(frames, 0.5, loop='Clamp')
    assert clip.joint_velocity_at(0.5)[0] == pytest.approx(2.0, rel=1e-2)


class TestPPOImitation:

  def test_update_improves_objective_on_synthetic_data(self):
    from daydreamer_tpu.imitation import PPOImitation
    agent = PPOImitation(6, 3, epochs=4, minibatches=2, seed=1)
    rng = np.random.default_rng(0)
    obs = rng.normal(size=(64, 6)).astype(np.float32)
    action, logp, value = agent.act(obs)
    assert action.shape == (64, 3)
    assert np.isfinite(logp).all() and np.isfinite(value).all()
    # Advantage points toward action[:, 0] > 0: after updates the policy
    # mean for dim 0 should increase.
    adv = np.sign(action[:, 0]).astype(np.float32)
    rollout = dict(obs=obs, action=action, logp=logp, adv=adv,
                   ret=value + adv)
    before = agent.mean_act(obs)[:, 0].mean()
    for _ in range(5):
      metrics = agent.update(rollout)
    assert np.isfinite(metrics['policy_loss'])
    after = agent.mean_act(obs)[:, 0].mean()
    assert after > before

  def test_gae_matches_manual(self):
    from daydreamer_tpu.imitation import PPOImitation
    agent = PPOImitation(2, 2, gamma=0.9, lam=1.0)
    rewards = np.array([1.0, 1.0], np.float32)
    values = np.array([0.0, 0.0], np.float32)
    conts = np.array([1.0, 0.0], np.float32)
    adv, ret = agent.gae(rewards, values, conts, last_value=5.0)
    # Terminal at t=1: adv[1]=1; adv[0]=1+0.9*0+0.9*1*adv[1]... manual:
    # delta1 = 1 + 0.9*0*5 - 0 = 1; delta0 = 1 + 0.9*1*0 - 0 = 1;
    # adv0 = delta0 + 0.9*1*adv1 = 1.9
    np.testing.assert_allclose(adv, [1.9, 1.0], atol=1e-6)
    np.testing.assert_allclose(ret, adv + values)

  def test_save_load_roundtrip(self):
    from daydreamer_tpu.imitation import PPOImitation
    agent = PPOImitation(4, 2)
    obs = np.ones((3, 4), np.float32)
    a1 = agent.act(obs)
    data = agent.save()
    agent2 = PPOImitation(4, 2)
    agent2.load(data)
    agent2._seed, agent2._step_i = agent._seed, agent._step_i
    # Deterministic value head must match after load.
    np.testing.assert_allclose(agent.act(obs)[2], agent2.act(obs)[2],
                               atol=1e-6)


@pytest.mark.slow
class TestImitationEnv:

  def test_task_obs_and_reward(self):
    from daydreamer_tpu.imitation import ImitationA1
    env = ImitationA1(gait='trot', length=20)
    obs = env.step({'action': np.zeros(12, np.float32), 'reset': True})
    assert obs['is_first']
    # Vector = base proprio + 14 target features.
    assert obs['vector'].shape[0] == env.obs_space['vector'].shape[0]
    total = 0.0
    for _ in range(5):
      obs = env.step({'action': np.zeros(12, np.float32), 'reset': False})
      total += obs['reward']
      assert 0.0 <= obs['reward'] <= 1.0 + 1e-6
    assert total > 0.0
    env.close()
