import os

# Force a deterministic 8-device virtual CPU mesh for all tests so multi-chip
# sharding logic is exercised without TPU hardware (the driver separately
# dry-runs the multi-chip path; bench.py runs on the real chip).
#
# Note: the env var JAX_PLATFORMS is not honored by the axon TPU plugin in
# this image, so we must use jax.config before the backend initializes.
# MuJoCo locks its GL backend the first time the `mujoco` package is
# imported anywhere in the process. Tests import mujoco in arbitrary order
# (some before the env modules whose constructors setdefault MUJOCO_GL), so
# pin the headless EGL backend up front; otherwise the auto backend picks
# GLFW, which needs a DISPLAY, and every later render fails with
# `gladLoadGL error`.
os.environ.setdefault('MUJOCO_GL', 'egl')

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('JAX_TRACEBACK_FILTERING', 'off')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: most of the suite's wall-clock is repeated
# CPU jit compiles of near-identical tiny agents, so repeat runs get the
# compiled programs back from disk. Lives under the home dir (durable:
# this box wipes /tmp on reboot, which would re-pay the full compile cost
# every boot) in a tests-only namespace separate from the runtime default
# in jaxagent._setup.
cache_dir = os.environ.setdefault(
    'DAYDREAMER_COMPILE_CACHE',
    os.path.join(
        os.path.expanduser('~'), '.cache', 'daydreamer_tpu', 'xla_tests'))
try:
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', cache_dir)
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:
  pass

import pytest  # noqa: E402


def pytest_configure(config):
  config.addinivalue_line('markers', 'slow: long-running integration test')
