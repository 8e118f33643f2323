"""Sinusoidal joint exercise for the A1 (sim or real).

Counterpart of the reference's hardware check (reference:
motion_imitation/examples/a1_robot_exercise.py, which swings the legs
through a sinusoidal trajectory around the standing pose to verify
motors, comms, and safety limits before training). On 'sim' it drives
the MuJoCo quadruped; on 'real' it goes through the UDP robot driver
whose C++ safety clamp bounds every command.

Run: python -m examples.a1_exercise --task sim --seconds 5
"""

import argparse
import time

import numpy as np


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--task', default='sim', choices=['sim', 'real'])
  parser.add_argument('--seconds', type=float, default=5.0)
  parser.add_argument('--freq_hz', type=float, default=0.5)
  parser.add_argument('--amplitude', type=float, default=0.3,
                      help='Fraction of the action range to sweep.')
  parser.add_argument('--rate_hz', type=float, default=20.0)
  args = parser.parse_args(argv)

  from daydreamer_tpu.envs.a1 import A1
  env = A1(args.task, repeat=1, length=10 ** 9, render_images=False)
  env.step({'action': np.zeros(12, np.float32), 'reset': True})
  start = time.time()
  n = 0
  while time.time() - start < args.seconds:
    t = time.time() - start
    # All legs in phase: a gentle squat/extend oscillation around the
    # standing pose (action 0 = standing in this env's normalization).
    act = np.zeros(12, np.float32)
    act[1::3] = args.amplitude * np.sin(2 * np.pi * args.freq_hz * t)
    act[2::3] = -args.amplitude * np.sin(2 * np.pi * args.freq_hz * t)
    obs = env.step({'action': act, 'reset': False})
    n += 1
    if args.task == 'real':
      time.sleep(max(0.0, 1.0 / args.rate_hz - (time.time() - start - t)))
  print(f'{n} exercise steps in {args.seconds:.1f}s; '
        f'final reward {float(obs["reward"]):.3f}')
  env.close()


if __name__ == '__main__':
  main()
