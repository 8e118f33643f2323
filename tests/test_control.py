"""Whole-body locomotion controller tests: kinematics vs MuJoCo, gait
phase allocation, stance/swing torque allocation, and a short closed-loop
trot in the MuJoCo A1 sim."""

import numpy as np
import pytest

from daydreamer_tpu.control import gait as gaitlib
from daydreamer_tpu.control import kinematics as kin
from daydreamer_tpu.control import (
    GaitScheduler, LocomotionController, StanceForceController, run_sim)


class TestKinematics:

  def test_fk_matches_mujoco(self):
    import mujoco
    from daydreamer_tpu.envs.a1_model import A1Robot, LEGS
    robot = A1Robot(action_repeat=1)
    m, d = robot.model, robot.data
    rng = np.random.default_rng(0)
    for _ in range(5):
      q = rng.uniform([-0.7, -0.9, -2.5] * 4, [0.7, 3.9, -1.0] * 4)
      d.qpos[7:] = q
      d.qpos[:7] = [0, 0, 0.5, 1, 0, 0, 0]
      mujoco.mj_forward(m, d)
      trunk = d.xpos[m.body('trunk').id]
      for i, (name, _, _) in enumerate(LEGS):
        mj_pos = d.geom_xpos[m.geom(f'{name}_foot').id] - trunk
        fk = kin.HIP_OFFSETS[i] + kin.foot_position(i, q[3 * i: 3 * i + 3])
        assert np.allclose(mj_pos, fk, atol=1e-12)

  def test_ik_roundtrip(self):
    rng = np.random.default_rng(1)
    for trial in range(40):
      leg = trial % 4
      q = rng.uniform([-0.7, -0.2, -2.5], [0.7, 2.0, -1.0])
      target = kin.foot_position(leg, q)
      again = kin.foot_position(leg, kin.foot_ik(leg, target))
      assert np.allclose(target, again, atol=1e-9)

  def test_ik_projects_unreachable(self):
    q = kin.foot_ik(0, np.array([0.0, -kin.D, -1.0]))  # Beyond leg length.
    reached = kin.foot_position(0, q)
    assert abs(np.linalg.norm(reached) - 0.4047) < 0.01  # Full extension.

  def test_jacobian_matches_finite_differences(self):
    rng = np.random.default_rng(2)
    eye = np.eye(3)
    for trial in range(12):
      leg = trial % 4
      q = rng.uniform([-0.7, -0.2, -2.5], [0.7, 2.0, -1.0])
      jac = kin.foot_jacobian(leg, q)
      eps = 1e-6
      num = np.stack([
          (kin.foot_position(leg, q + eps * eye[k])
           - kin.foot_position(leg, q - eps * eye[k])) / (2 * eps)
          for k in range(3)], 1)
      assert np.allclose(jac, num, atol=1e-8)


class TestGait:

  def test_trot_diagonal_pairs_antiphase(self):
    gait = GaitScheduler()  # Trot preset: FR/RL vs FL/RR.
    for t in np.linspace(0.0, 1.0, 17):
      gait.update(t, contacts=(False,) * 4)
      states = [leg.nominal_state for leg in gait.legs]
      assert states[0] == states[3]  # FR == RL
      assert states[1] == states[2]  # FL == RR
    # Anti-phase: over a cycle each pair must take both states.
    seen = set()
    for t in np.linspace(0.0, 0.5, 26):
      gait.update(t, contacts=(False,) * 4)
      seen.add((gait.legs[0].nominal_state, gait.legs[1].nominal_state))
    assert (gaitlib.SWING, gaitlib.STANCE) in seen
    assert (gaitlib.STANCE, gaitlib.SWING) in seen

  def test_duty_factor_controls_stance_share(self):
    gait = GaitScheduler(duty_factor=(0.75,) * 4)
    stance_ticks = 0
    ticks = 400
    for t in np.linspace(0.0, 2.0, ticks):
      gait.update(t, contacts=(False,) * 4)
      stance_ticks += gait.legs[0].nominal_state == gaitlib.STANCE
    assert abs(stance_ticks / ticks - 0.75) < 0.05

  def test_contact_refines_state(self):
    gait = GaitScheduler(duty_factor=(0.5,) * 4, initial_phase=(0.0,) * 4,
                         stance_duration=(0.3,) * 4)
    # Late swing with contact -> EARLY_CONTACT, treated as stance.
    gait.update(0.57, contacts=(True,) * 4)  # Swing phase 0.9, near land.
    assert gait.legs[0].nominal_state == gaitlib.SWING
    assert gait.legs[0].state == gaitlib.EARLY_CONTACT
    assert 0 in gait.stance_legs()
    # Stance without contact -> LOSE_CONTACT, treated as swing.
    gait.update(0.1, contacts=(False,) * 4)
    assert gait.legs[0].nominal_state == gaitlib.STANCE
    assert gait.legs[0].state == gaitlib.LOSE_CONTACT
    assert 0 in gait.swing_legs()


class TestStance:

  def _standing_pose(self):
    from daydreamer_tpu.envs import a1_model
    return a1_model.unnormalize_action(a1_model.STANDING_POSE)

  def test_qp_supports_weight_four_legs(self):
    gait = GaitScheduler(**gaitlib.STAND)
    stance = StanceForceController(gait)
    wrench = np.array([0.0, 0.0, stance._mass * 9.81, 0.0, 0.0, 0.0])
    feet = kin.all_foot_positions(self._standing_pose())
    forces = stance.contact_forces(wrench, feet, [0, 1, 2, 3])
    total = sum(forces.values())
    assert abs(total[2] - wrench[2]) < 1.0
    for force in forces.values():
      assert force[2] > 0  # Pushing up.
      assert abs(force[0]) <= stance._mu * force[2] + 1e-6
      assert abs(force[1]) <= stance._mu * force[2] + 1e-6

  def test_qp_two_leg_stance_balances_torque(self):
    gait = GaitScheduler()
    stance = StanceForceController(gait)
    wrench = np.array([0.0, 0.0, stance._mass * 9.81, 0.0, 0.0, 0.0])
    feet = kin.all_foot_positions(self._standing_pose())
    forces = stance.contact_forces(wrench, feet, [0, 3])  # FR + RL diag.
    total_force = sum(forces.values())
    torque = sum(np.cross(feet[leg], forces[leg]) for leg in forces)
    assert abs(total_force[2] - wrench[2]) < 2.0
    assert np.abs(torque).max() < 2.0  # Diagonal pair cancels moments.

  def test_leg_torques_use_jacobian_transpose(self):
    gait = GaitScheduler()
    stance = StanceForceController(gait)
    q = self._standing_pose()
    force = np.array([0.0, 0.0, 30.0])
    torques = stance.leg_torques(q, {1: force})
    expected = kin.foot_jacobian(1, q.reshape(4, 3)[1]).T @ (-force)
    assert np.allclose(torques[1], expected)


class TestLocomotion:

  def test_swing_stance_split_covers_all_legs(self):
    from daydreamer_tpu.envs.a1_model import A1Robot
    robot = A1Robot(action_repeat=1, seed=0)
    robot.reset()
    controller = LocomotionController()
    controller.reset()
    tau = controller.torques(robot, (0.3, 0.0), 0.0)
    assert tau.shape == (12,)
    stance = set(controller.gait.stance_legs())
    swing = set(controller.gait.swing_legs())
    assert stance | swing == {0, 1, 2, 3}
    assert not stance & swing

  def test_trot_moves_forward_and_stays_up(self):
    stats = run_sim(seconds=2.0, command=(0.4, 0.0), seed=0)
    assert stats['displacement'][0] > 0.1, stats
    assert stats['min_uprightness'] > 0.7, stats
    assert 0.2 < stats['mean_height'] < 0.32, stats

  @pytest.mark.slow
  def test_trot_turns_under_yaw_command(self):
    stats = run_sim(seconds=3.0, command=(0.0, 0.0), yaw_rate=0.5, seed=0)
    assert stats['yaw_change'] > 0.3, stats
    assert stats['min_uprightness'] > 0.7, stats
