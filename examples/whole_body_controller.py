"""Stance-force MPC example using the native QP solver.

Counterpart of the reference's whole-body controller examples
(reference: motion_imitation/examples/whole_body_controller_example.py,
backed by vendored qpOASES/OSQP): allocates contact forces for a quadruped
stance by solving a box-constrained QP that tracks desired body wrench
while respecting per-leg normal-force limits and friction-pyramid bounds.

Run: python -m examples.whole_body_controller
"""

import numpy as np

MASS = 12.0      # kg, A1-ish.
GRAVITY = 9.81
MU = 0.6         # Friction coefficient.
F_MAX = 120.0    # Max normal force per leg, N.

# Foot positions in the body frame (x forward, y left), standing pose.
FOOT_POS = np.array([
    [+0.17, -0.13, -0.3],   # FR
    [+0.17, +0.13, -0.3],   # FL
    [-0.20, -0.13, -0.3],   # RR
    [-0.20, +0.13, -0.3],   # RL
])


def skew(v):
  return np.array([
      [0, -v[2], v[1]],
      [v[2], 0, -v[0]],
      [-v[1], v[0], 0]])


def friction_pyramid_constraints():
  """True friction-pyramid rows (the reference's OSQP/qpOASES MPC
  formulation): per leg |fx| <= MU fz, |fy| <= MU fz, 0 <= fz <= F_MAX."""
  G = np.zeros((20, 12))
  lo = np.zeros(20)
  hi = np.zeros(20)
  big = 1e20
  for i in range(4):
    r, c = 5 * i, 3 * i
    G[r + 0, c + 0], G[r + 0, c + 2] = 1.0, -MU   # fx - mu fz <= 0
    G[r + 1, c + 0], G[r + 1, c + 2] = -1.0, -MU  # -fx - mu fz <= 0
    G[r + 2, c + 1], G[r + 2, c + 2] = 1.0, -MU   # fy - mu fz <= 0
    G[r + 3, c + 1], G[r + 3, c + 2] = -1.0, -MU  # -fy - mu fz <= 0
    G[r + 4, c + 2] = 1.0                         # 0 <= fz <= F_MAX
    lo[r:r + 4] = -big
    hi[r:r + 4] = 0.0
    lo[r + 4], hi[r + 4] = 0.0, F_MAX
  return G, lo, hi


def stance_force_qp(desired_wrench, weight_force=1e-4):
  """Solve min ||A f - w||^2 + reg ||f||^2 under the friction pyramid.

  f stacks 4 legs x 3 force components (body frame). Constraints are the
  true pyramid rows |f_t| <= MU f_z coupled to the live normal force (not
  a box relaxation), solved by the native linearly-constrained ADMM QP."""
  from daydreamer_tpu.native.qp import solve_qp
  A = np.zeros((6, 12))
  for i, pos in enumerate(FOOT_POS):
    A[:3, 3 * i: 3 * i + 3] = np.eye(3)       # Net force.
    A[3:, 3 * i: 3 * i + 3] = skew(pos)       # Net torque.
  P = A.T @ A + weight_force * np.eye(12)
  q = -A.T @ desired_wrench
  G, lo, hi = friction_pyramid_constraints()
  forces, iters = solve_qp(2 * P, 2 * q, G, lo, hi)
  residual = A @ forces - desired_wrench
  return forces.reshape(4, 3), iters, residual


def command_to_wrench(vx, vy, wz, kx=20.0, ky=20.0, kw=6.0):
  """Map a teleop velocity command to a desired body wrench."""
  return np.array([kx * vx, ky * vy, MASS * GRAVITY, 0.0, 0.0, kw * wz])


def trot_demo(seconds=12.0):
  """Trot the MuJoCo A1 through a scripted command profile (reference:
  whole_body_controller_example.py _generate_example_linear_angular_speed
  steps through forward / lateral / turning segments)."""
  from daydreamer_tpu.control import LocomotionController, run_sim
  from daydreamer_tpu.envs.a1_model import A1Robot
  robot = A1Robot(action_repeat=1, seed=0)
  robot.reset()
  controller = LocomotionController()
  controller.reset()
  segments = [
      ((0.0, 0.0), 0.0, 'settle'),
      ((0.4, 0.0), 0.0, 'trot forward'),
      ((0.0, 0.0), 0.5, 'turn left'),
      ((0.3, 0.0), 0.0, 'trot forward'),
      ((0.0, 0.0), 0.0, 'halt'),
  ]
  per = seconds / len(segments)
  for command, yaw_rate, label in segments:
    stats = run_sim(seconds=per, command=command, yaw_rate=yaw_rate,
                    robot=robot, controller=controller)
    dx, dy = stats['displacement']
    print(f'{label:14s} v={command} wz={yaw_rate:+.1f} -> '
          f'moved ({dx:+.2f}, {dy:+.2f}) m, '
          f'yaw {stats["yaw_change"]:+.2f} rad, '
          f'min upright {stats["min_uprightness"]:.2f}')
    assert stats['min_uprightness'] > 0.5, 'robot fell'
  print('Trot demo complete; robot stayed upright throughout. OK')


def teleop(use_trot):
  import time
  from daydreamer_tpu.envs.drivers.gamepad import Gamepad
  pad = Gamepad()
  print('Teleop: left stick = vx/vy, right stick x = yaw; LB+RB stops.')
  if use_trot:
    from daydreamer_tpu.control import LocomotionController
    from daydreamer_tpu.envs.a1_model import A1Robot, SIM_TIMESTEP
    robot = A1Robot(action_repeat=1, seed=0)
    robot.reset()
    controller = LocomotionController()
    controller.reset()
    try:
      while not pad.estop_flagged:
        vx, vy, wz = pad.speed_command()
        tau = controller.torques(robot, (vx, vy), wz)
        for _ in range(2):
          robot.substep_torque(tau)
        print(f'\rv=({vx:+.2f},{vy:+.2f},{wz:+.2f}) '
              f'x={robot.data.qpos[0]:+.2f} y={robot.data.qpos[1]:+.2f} '
              f'up={robot.rot_mat[2, 2]:.2f}', end='')
        time.sleep(2 * SIM_TIMESTEP)
    finally:
      pad.stop()
    return
  try:
    while not pad.estop_flagged:
      vx, vy, wz = pad.speed_command()
      forces, iters, _ = stance_force_qp(command_to_wrench(vx, vy, wz))
      fz = ' '.join(f'{f:6.1f}' for f in forces[:, 2])
      print(f'\rv=({vx:+.2f},{vy:+.2f},{wz:+.2f}) fz=[{fz}] '
            f'({iters} it)', end='')
      time.sleep(0.05)
  finally:
    pad.stop()


def main(argv=None):
  import argparse
  parser = argparse.ArgumentParser()
  parser.add_argument('--teleop', action='store_true',
                      help='Read vx/vy/wz from a gamepad (reference: '
                           'whole_body_controller_example.py uses the '
                           'F710 gamepad reader); LB+RB stops.')
  parser.add_argument('--trot', action='store_true',
                      help='Run the full whole-body trot in the MuJoCo '
                           'sim (gait + swing + stance QP), scripted '
                           'command profile or gamepad with --teleop.')
  args = parser.parse_args(argv)
  if args.trot and not args.teleop:
    trot_demo()
    return
  if args.teleop:
    teleop(args.trot)
    return
  # Desired wrench: support body weight, small forward push, zero torque.
  desired = np.array([8.0, 0.0, MASS * GRAVITY, 0.0, 0.0, 0.0])
  forces, iters, residual = stance_force_qp(desired)
  print('Per-leg contact forces (body frame, N):')
  for name, f in zip(['FR', 'FL', 'RR', 'RL'], forces):
    print(f'  {name}: fx={f[0]:7.2f}  fy={f[1]:7.2f}  fz={f[2]:7.2f}')
  print(f'QP iterations: {iters}')
  print(f'Wrench residual: {np.abs(residual).max():.4f}')
  total_fz = forces[:, 2].sum()
  assert abs(total_fz - MASS * GRAVITY) < 1.0, total_fz
  print(f'Total normal force {total_fz:.1f} N supports '
        f'{MASS * GRAVITY:.1f} N weight. OK')


if __name__ == '__main__':
  main()
