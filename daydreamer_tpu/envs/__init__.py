"""Environment loading and suite dispatch (reference: embodied/envs/__init__.py:17-102).

Suite-prefixed tasks (``dummy_continuous``, ``a1_sim``, ``xarm_dummy``,
``dmc_walker_walk``, ...) build per-index seeded envs, optionally in their
own processes, wrapped with crash-restart and action-space adapters, and
batched into one BatchEnv.
"""

import functools

from .. import core
from ..core import wrappers
from .dummy import Dummy
from .a1 import A1
from .robot import PickPlace, EnvConfig, RobotType
from .sphero import SpheroEnv


def load_env(
    task, amount=1, parallel='none', daemon=False, restart=False, seed=None,
    kbreset=False, **kwargs):
  ctors = []
  for index in range(amount):
    ctor = functools.partial(load_single_env, task, **kwargs)
    if seed is not None:
      ctor = functools.partial(ctor, seed=hash((seed, index)) % (2 ** 31 - 1))
    if parallel != 'none':
      ctor = functools.partial(core.Parallel, ctor, parallel, daemon)
    if restart:
      ctor = functools.partial(wrappers.RestartOnException, ctor)
    if kbreset:
      from .kbreset import KBReset
      ctor = functools.partial(KBReset, ctor)
    ctors.append(ctor)
  envs = [ctor() for ctor in ctors]
  return core.BatchEnv(envs, parallel=(parallel != 'none'))


def load_single_env(
    task, size=(64, 64), repeat=1, mode='train', camera=-1, gray=False,
    length=0, logdir='/dev/null', discretize=0, sticky=True, lives=False,
    episodic=True, resets=True, render=True, seed=None):
  suite, task = task.split('_', 1)
  if suite == 'dummy':
    env = Dummy(task, size, length or 100)
  elif suite == 'gym':
    from .gym import Gym
    env = Gym(task)
  elif suite == 'a1':
    # `render` gates the per-step 64x64 camera render: software EGL costs
    # ~80ms/frame, dominating proprio-only training where the image is
    # never encoded (a1 config uses cnn_keys '$^').
    env = A1(task, repeat, length or 1000, render, size)
  elif suite == 'xarm':
    assert task in ('real', 'dummy')
    env = PickPlace(EnvConfig(
        use_real=(task == 'real'), robot_type=RobotType.XARM, enable_z=True,
        length=length or 100))
  elif suite == 'ur5':
    assert task in ('real', 'dummy')
    env = PickPlace(EnvConfig(
        use_real=(task == 'real'), robot_type=RobotType.UR5,
        length=length or 100))
  elif suite == 'sphero':
    from .sphero import EnvConfig as SpheroConfig
    assert task in ('real', 'dummy')
    env = SpheroEnv(SpheroConfig(use_real=(task == 'real'),
                                 length=length or 100))
  elif suite == 'dmc':
    from .dmc import DMC
    env = DMC(task, repeat, size, camera)
  elif suite == 'atari':
    from .atari import Atari
    env = Atari(task, repeat, size, gray, lives=lives, sticky=sticky)
  elif suite == 'crafter':
    from .crafter import Crafter
    assert repeat == 1
    outdir = core.Path(logdir) / 'crafter' if mode == 'train' else None
    env = Crafter(task, size, outdir)
  elif suite == 'dmlab':
    from .dmlab import DMLab
    env = DMLab(task, repeat, size, mode, seed=seed, episodic=episodic)
  elif suite == 'minecraft':
    from .minecraft import Minecraft
    env = Minecraft(task, repeat, size)
  elif suite == 'loconav':
    from .loconav import LocoNav
    env = LocoNav(task, repeat, size, camera)
  elif suite == 'hrlgrid':
    from .hrlgrid import HRLGrid
    assert repeat == 1
    env = HRLGrid(int(task), length or 1000)
  else:
    raise NotImplementedError(suite)
  for name, space in env.act_space.items():
    if name == 'reset':
      continue
    if space.discrete:
      env = wrappers.OneHotAction(env, name)
    elif discretize:
      env = wrappers.DiscretizeAction(env, name, discretize)
    else:
      env = wrappers.NormalizeAction(env, name)
  if suite == 'a1' and repeat > 1:
    pass  # A1 handles repeat internally at the physics rate.
  if length:
    env = wrappers.TimeLimit(env, length, resets)
  return env


__all__ = [
    'load_env', 'load_single_env', 'Dummy', 'A1', 'PickPlace', 'EnvConfig',
    'RobotType', 'SpheroEnv',
]
