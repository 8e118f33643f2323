"""Step an environment with uniform random actions and print stats.

Counterpart of the reference's smoke utility (reference:
motion_imitation/examples/random_action.py): the quickest way to check
an env (sim or real) is alive, obeys its spaces, and produces sane
rewards, without any agent in the loop.

Run: python -m examples.random_action --task a1_sim --steps 100
"""

import argparse

import numpy as np


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--task', default='a1_sim')
  parser.add_argument('--steps', type=int, default=100)
  parser.add_argument('--repeat', type=int, default=1)
  args = parser.parse_args(argv)

  from daydreamer_tpu.envs import load_single_env
  env = load_single_env(args.task, repeat=args.repeat)
  print('obs space:', {k: (v.dtype, v.shape) for k, v in
                       env.obs_space.items()})
  print('act space:', {k: (v.dtype, v.shape) for k, v in
                       env.act_space.items()})
  obs = env.step({'action': env.act_space['action'].sample(),
                  'reset': True})
  total, episodes = 0.0, 0
  for i in range(args.steps):
    obs = env.step({'action': env.act_space['action'].sample(),
                    'reset': False})
    total += float(obs['reward'])
    if obs['is_last']:
      episodes += 1
      obs = env.step({'action': env.act_space['action'].sample(),
                      'reset': True})
  print(f'{args.steps} steps, {episodes} episodes, '
        f'total reward {total:.2f}')
  env.close()


if __name__ == '__main__':
  main()
