"""daydreamer_tpu: a TPU-native world-model RL framework.

A from-scratch JAX/XLA/pjit/Pallas re-design of the capabilities of
DayDreamer (danijar/daydreamer): DreamerV2+ world-model agents trained
asynchronously on real robots and simulators, rebuilt TPU-first.
"""

__version__ = '0.1.0'

from .core import *  # noqa: F401,F403
from .core import when, wrappers  # noqa: F401
from . import replay  # noqa: F401
from . import envs  # noqa: F401
from . import run  # noqa: F401
