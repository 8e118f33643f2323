"""Replay the action sequence of a recorded trajectory on a live env.

Counterpart of the reference's utility (reference:
motion_imitation/examples/replay_actions.py, which re-executes logged
robot actions): loads one npz trajectory written by the replay
DiskStore (filename encodes {time}-{key}-len{L}-rew{R}) and steps the
env with its stored actions — useful to reproduce an episode on the
sim or to re-run a teleop demo on hardware.

Run: python -m examples.replay_actions --traj <file.npz> --task a1_sim
"""

import argparse

import numpy as np


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--traj', required=True,
                      help='npz trajectory file written by DiskStore.')
  parser.add_argument('--task', default='a1_sim')
  parser.add_argument('--repeat', type=int, default=1)
  args = parser.parse_args(argv)

  with open(args.traj, 'rb') as f:
    traj = dict(np.load(f))
  assert 'action' in traj, sorted(traj.keys())
  actions = traj['action']
  print(f'Replaying {len(actions)} actions from {args.traj}')

  from daydreamer_tpu.envs import load_single_env
  env = load_single_env(args.task, repeat=args.repeat)
  obs = env.step({'action': np.zeros_like(actions[0]), 'reset': True})
  total = 0.0
  for t, action in enumerate(actions):
    if obs['is_last']:
      print(f'env ended early at step {t}')
      break
    obs = env.step({'action': action, 'reset': False})
    total += float(obs['reward'])
  recorded = float(traj['reward'].sum()) if 'reward' in traj else None
  print(f'replayed return {total:.2f}'
        + (f' (recorded {recorded:.2f})' if recorded is not None else ''))
  env.close()


if __name__ == '__main__':
  main()
