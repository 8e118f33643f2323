"""Latency-budget regression gates for the jitted agent entry points.

Mirrors the reference's wall-clock budget tests (reference:
embodied/agents/dreamerv2plus/tests.py:44-106: compile + steady budgets for
train/policy/report under a shrunken TEST_CONFIG, and a 500-step run=train
budget) and its static-vs-dynamic unroll matrix (reference:
tests/test_xla_unroll.py:17-27).

All numbers here are for the 8-virtual-device CPU mesh the test suite runs
on (see conftest.py), so they gate relative regressions of THIS codebase,
not absolute TPU performance (bench.py measures that on the real chip).
One agent is created and timed once in a module fixture; the tests
themselves are pure asserts, so adding budgets costs no extra compiles.
"""

import time

import numpy as np
import pytest

import daydreamer_tpu as ddt
from daydreamer_tpu.envs import load_env

SLACK = 1.5  # Tight: catches a 1.5x regression of any entry point.

# Calibrated on this box in a QUIET window (2026-08-21, 2-CPU box, cold
# compile cache): train 75.1s compile / 2.45s steady, policy 3.5s / 0.24s,
# report 9.9s / 0.71s. Budgets are measured + ~10% headroom; the absolute
# gates only run when the box is quiet (see _box_loaded) — under
# concurrent load the load-insensitive ratio gates below still apply.
BUDGETS = {
    'train_compile': 80.0,
    'train_steady': 2.6,
    'policy_compile': 6.0,
    'policy_steady': 0.27,
    'report_compile': 12.0,
    'report_steady': 0.8,
}


# Quiet wall time of the contention probe on the CALIBRATION box (the box
# the BUDGETS dict above was measured on). Other hosts self-calibrate: the
# minimum probe time ever observed on a host is persisted per-hostname and
# used as that host's quiet baseline, and the absolute budgets scale by
# (host_quiet / _PROBE_CALIB_S) — so a 2x-slower machine gets 2x budgets
# instead of permanently skipping every absolute gate.
_PROBE_CALIB_S = 0.055


def _probe_seconds():
  x = np.random.rand(512, 512).astype(np.float32)
  for _ in range(5):
    x @ x  # Warm the BLAS threads.
  start = time.time()
  for _ in range(50):
    x @ x
  return time.time() - start


def _host_quiet_probe(measured):
  """Persisted per-host quiet baseline: min probe time ever seen here."""
  import json
  import pathlib
  import socket
  path = pathlib.Path.home() / '.cache' / 'daydreamer_tpu' / 'budget_probe.json'
  host = socket.gethostname()
  try:
    table = json.loads(path.read_text())
  except (OSError, ValueError):
    table = {}
  quiet = min(measured, table.get(host, measured))
  if table.get(host) != quiet:
    table[host] = quiet
    try:
      path.parent.mkdir(parents=True, exist_ok=True)
      path.write_text(json.dumps(table))
    except OSError:
      pass  # Read-only home: fall back to in-process calibration.
  return quiet


def _contention_factor():
  """How much slower a fixed CPU workload runs right now vs this host when
  quiet.

  Run immediately before timing the entry points: pytest executes tests
  sequentially, so anything competing with the probe is an EXTERNAL
  process. When the box is contended the absolute wall-clock budgets are
  meaningless and the tests skip VISIBLY (not silently absorbed by a
  larger slack, which would also absorb real regressions); the
  load-insensitive ratio gates below still apply. Returns
  (contention, budget_scale)."""
  measured = _probe_seconds()
  quiet = _host_quiet_probe(measured)
  return measured / quiet, quiet / _PROBE_CALIB_S


def _test_config(**overrides):
  from daydreamer_tpu.agents.dreamer import Agent
  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'jax.platform': 'cpu',
      'jax.precision': 'float32',
      'batch_size': 8,
      'replay_chunk': 8,
      'imag_horizon': 5,
      r'.*\.layers': 2,
      r'.*\.units': 128,
      r'.*\.cnn_depth': 16,
      r'.*\.wd$': 0.0,
      'rssm.unroll': 1,
      'imag_unroll': 1,
      **overrides,
  })
  return config


def _batch(env, config):
  B, T = config.batch_size, config.replay_chunk
  data = {}
  for key, space in env.obs_space.items():
    data[key] = np.zeros((B, T) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (B, T) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  return data


def _time_entry_points(config, entries=('train', 'policy', 'report')):
  """Compile + steady latencies for the requested entry points."""
  from daydreamer_tpu.agents.dreamer import Agent
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = _batch(env, config)
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  env.close()
  out = {}

  if 'train' in entries:
    start = time.time()
    outs, state, mets = agent.train(data)
    _ = float(mets['model_loss_mean'])  # Materialize = block.
    out['train_compile'] = time.time() - start
    start = time.time()
    steps = 5
    for _ in range(steps):
      outs, state, mets = agent.train(data, state)
    _ = float(mets['model_loss_mean'])
    out['train_steady'] = (time.time() - start) / steps

  if 'policy' in entries:
    start = time.time()
    acts, pstate = agent.policy(obs, mode='train')
    out['policy_compile'] = time.time() - start
    start = time.time()
    steps = 10
    for _ in range(steps):
      acts, pstate = agent.policy(obs, pstate, mode='train')
    np.asarray(acts['action'])
    out['policy_steady'] = (time.time() - start) / steps

  if 'report' in entries:
    start = time.time()
    agent.report(data)
    out['report_compile'] = time.time() - start
    start = time.time()
    steps = 3
    for _ in range(steps):
      report = agent.report(data)
    out['report_steady'] = (time.time() - start) / steps
  return out


@pytest.fixture(scope='module')
def timings():
  # External load (e.g. a concurrent training run) is bursty: sample the
  # contention probe before AND after the timed section and gate on the
  # worst, so a quiet instant at fixture start cannot launder a loaded
  # timing window into a failure.
  before, scale_before = _contention_factor()
  out = _time_entry_points(_test_config())
  after, scale_after = _contention_factor()
  out['contention'] = max(before, after)
  # A later, smaller quiet baseline means the earlier factor was computed
  # against a stale (too large) baseline; use the final scale.
  out['budget_scale'] = min(scale_before, scale_after)
  return out


@pytest.mark.parametrize('name', sorted(BUDGETS))
def test_budget(timings, name):
  if timings['contention'] > 1.6:
    pytest.skip(
        f'box contended ({timings["contention"]:.1f}x probe slowdown); '
        'absolute budgets gated on quiet boxes only')
  measured = timings[name]
  budget = BUDGETS[name] * SLACK * timings['budget_scale']
  print(f'{name}: {measured:.4f}s (budget {budget:.3f}s)')
  assert measured < budget, (name, measured, budget)


def test_entry_point_ratios(timings):
  """Load-insensitive gates: all entry points slow down together under
  box contention, so their ratios catch dispatch/compile regressions the
  absolute budgets (SLACK 2.5) would let through. The policy does <1/30
  of the train step's work; report is a forward-only pass."""
  assert timings['policy_steady'] < 0.5 * timings['train_steady'] + 0.02, (
      timings)
  assert timings['report_steady'] < 1.5 * timings['train_steady'] + 0.05, (
      timings)
  # Compile must stay within ~two orders of magnitude of steady state;
  # catches accidental retrace-per-call (compile cost leaking into steady)
  # and runaway program growth.
  assert timings['train_compile'] > timings['train_steady'], timings


@pytest.mark.slow
def test_unroll_matrix():
  """Static unroll trades compile time for steady-state step time
  (the reference's biggest perf knob, reference:
  tests/test_xla_unroll.py:17-27). Both modes must work; the unrolled
  program may not be catastrophically slower at steady state.

  Uses its own shrunken config (half units, no CNN) and times only the
  train entry point — the unroll knob affects only the scans inside
  train, and NOT sharing the module fixture keeps `-m slow` from paying
  the full TEST_CONFIG fixture compile."""
  small = {
      r'.*\.units': 64, 'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^'}
  rolled = _time_entry_points(_test_config(**small), entries=('train',))
  unrolled = _time_entry_points(_test_config(**{
      **small, 'rssm.unroll': 8, 'imag_unroll': 5}), entries=('train',))
  print('rolled:', rolled)
  print('unrolled:', unrolled)
  assert np.isfinite(list(rolled.values())).all()
  assert np.isfinite(list(unrolled.values())).all()
  # The unrolled program must stay within 3x of the rolled steady state
  # (they are usually close; a large gap means scan unrolling broke).
  assert unrolled['train_steady'] < 3 * rolled['train_steady'] + 0.2


@pytest.mark.slow
def test_run_small_budget(tmp_path):
  """500-step run=train end-to-end budget (reference tests.py:52-53)."""
  from daydreamer_tpu.agents.dreamer import train as train_cli
  start = time.time()
  train_cli.main([
      '--configs', 'debug',
      '--task', 'dummy_discrete',
      '--run', 'train',
      '--jax.platform', 'cpu',
      '--jax.precision', 'float32',
      '--train.steps', '500',
      '--train.train_fill', '100',
      '--logdir', str(tmp_path / 'run'),
  ])
  duration = time.time() - start
  print(f'500-step run=train: {duration:.1f}s')
  assert duration < 300 * SLACK
