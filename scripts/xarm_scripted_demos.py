"""Scripted pick-and-place demonstrations for the xarm dummy sim.

The reference bootstrapped its real-robot arm runs with teleoperated
demonstration episodes written straight into the replay directory
(reference: embodied/envs/xarm_demos.py). The dummy kinematic sim admits a
scripted demonstrator instead: it reads only the public observations
(image blob for the object, proprio for the gripper), performs repeated
grasp-carry-release transfers, and writes episodes through the same replay
store the training run loads from.

Usage:
  python scripts/xarm_scripted_demos.py --logdir runs/xarm_curve \
      --episodes 30 [--task xarm_dummy]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def locate_object(image):
  """Object pixel blob -> world xy in [-1, 1] (green, see robot.py _obs)."""
  green = (image[:, :, 1] > 200) & (image[:, :, 0] < 100)
  if not green.any():
    return None
  ys, xs = np.nonzero(green)
  return np.array([xs.mean(), ys.mean()]) / 63.0 * 2.0 - 1.0


class ScriptedPicker:
  """Observation-driven demonstrator for PickPlace (discrete actions)."""

  STEP = 0.1  # Dummy-sim grid step (robot.py _apply_sim).

  def __init__(self, num_actions):
    self.num_actions = num_actions
    self.last_obj = None  # The gripper blob occludes the object up close.

  def __call__(self, obs):
    image = obs['image']
    pos = np.asarray(obs['cartesian_position'][:2], np.float64)
    holding = obs['grasped_side'][2] < 0.5
    grip_closed = obs['gripper_pos'][0] > 0.5
    if holding:
      # grasped_side: 0 = object belongs right, 1 = left. Carry across.
      target_x = -0.5 if obs['grasped_side'][0] > 0.5 else 0.5
      if np.sign(pos[0]) == np.sign(target_x) and abs(pos[0]) >= 0.15:
        self.last_obj = pos.copy()  # Object drops where we release it.
        return 4  # Release over the far bin: transfer.
      return 0 if target_x < pos[0] else 1
    if grip_closed:
      return 4  # Open an empty closed gripper.
    obj = locate_object(image)
    if obj is not None:
      self.last_obj = obj
    elif self.last_obj is None:
      return 1  # Never seen the object yet: explore +x.
    delta = self.last_obj - pos
    if np.linalg.norm(delta) < 0.14:
      return 4  # Close: grasp.
    if abs(delta[0]) >= abs(delta[1]):
      return 0 if delta[0] < 0 else 1
    return 2 if delta[1] < 0 else 3


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--logdir', required=True)
  parser.add_argument('--episodes', type=int, default=30)
  parser.add_argument('--task', default='xarm_dummy')
  parser.add_argument('--length', type=int, default=100)
  parser.add_argument('--epsilon', type=float, default=0.1,
                      help='Random-action rate for demo state diversity.')
  parser.add_argument('--seed', type=int, default=0)
  args = parser.parse_args(argv)

  import daydreamer_tpu as ddt
  from daydreamer_tpu import replay as replaylib
  from daydreamer_tpu.envs import load_env

  env = load_env(args.task, amount=1, parallel='none', length=args.length)
  num_actions = env.act_space['action'].shape[0]
  picker = ScriptedPicker(num_actions)

  directory = pathlib.Path(args.logdir) / 'episodes'
  store = replaylib.CkptRAMStore(str(directory), capacity=int(1e6))
  replay = replaylib.FixedLength(store, chunk=32)

  scores = []
  rng = np.random.default_rng(args.seed)

  def policy(obs, state):
    act = picker({k: v[0] for k, v in obs.items()})
    if rng.uniform() < args.epsilon:
      act = int(rng.integers(num_actions))
    onehot = np.zeros((1, num_actions), np.float32)
    onehot[0, act] = 1.0
    return {'action': onehot}, state

  def on_episode(ep, worker):
    scores.append(float(ep['reward'].sum()))
    print(f'Demo episode {len(scores)}: return {scores[-1]:.1f}')

  driver = ddt.Driver(env)
  driver.on_step(replay.add)
  driver.on_episode(on_episode)
  driver(policy, episodes=args.episodes)
  env.close()
  print(f'Wrote {len(scores)} demos to {directory}; '
        f'mean return {np.mean(scores):.1f}')
  assert np.mean(scores) > 10, 'Scripted demos failed to transfer objects.'


if __name__ == '__main__':
  main()
