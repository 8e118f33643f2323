"""Run-mode integration: train_eval and train_fixed_eval on the Dummy env.

Covers the two eval-bearing run loops (reference:
embodied/run/train_eval.py:9-121 and train_fixed_eval.py:9-122) that the
async tests and plain-train tests do not touch: separate eval env and
replay, eval episodes between train bursts, and fixed-dataset reports.
"""

import numpy as np
import pytest

import daydreamer_tpu as ddt
from daydreamer_tpu import run as runlib
from daydreamer_tpu import replay as replaylib
from daydreamer_tpu.envs import load_env


def build(tmp_path, **overrides):
  from daydreamer_tpu.agents.dreamer import Agent
  config = ddt.Config(Agent.configs['defaults'])
  config = config.update(Agent.configs['debug'])
  config = config.update({
      'task': 'dummy_discrete',
      'jax.platform': 'cpu',
      'batch_size': 4,
      'replay_chunk': 8,
      'imag_horizon': 3,
      'env.amount': 1,
      'env.length': 10,
      'env.parallel': 'none',
      'logdir': str(tmp_path),
      **overrides,
  })
  env = load_env(config.task, mode='train', **config.env)
  step = ddt.Counter()
  agent = Agent(env.obs_space, env.act_space, step, config)
  logger = ddt.Logger(step, [ddt.JSONLOutput(str(tmp_path))])
  return config, env, agent, step, logger


def read_metrics(tmp_path):
  import json
  path = tmp_path / 'metrics.jsonl'
  return [json.loads(l) for l in path.read_text().splitlines()]


@pytest.mark.slow
def test_train_eval(tmp_path):
  config, env, agent, step, logger = build(tmp_path)
  eval_env = load_env(config.task, mode='eval', **config.env)
  make_replay = lambda: replaylib.FixedLength(
      replaylib.RAMStore(int(1e5)), chunk=config.replay_chunk)
  args = ddt.Config(
      logdir=str(tmp_path), **config.train).update(
      steps=60, train_fill=30, eval_fill=30, train_every=10,
      log_every=20, eval_every=30, eval_eps=1, eval_samples=1)
  runlib.train_eval(
      agent, env, eval_env, make_replay(), make_replay(), logger, args)
  rows = read_metrics(tmp_path)
  trains = [r for r in rows if any(k.startswith('train_episode') for k in r)]
  evals = [r for r in rows if 'eval_episode/score' in r]
  assert int(step) >= 60
  assert trains, 'no train episodes logged'
  assert evals, 'no eval episodes logged'
  env.close()
  eval_env.close()


@pytest.mark.slow
def test_train_fixed_eval(tmp_path):
  config, env, agent, step, logger = build(tmp_path)
  make_replay = lambda: replaylib.FixedLength(
      replaylib.RAMStore(int(1e5)), chunk=config.replay_chunk)
  args = ddt.Config(
      logdir=str(tmp_path), **config.train).update(
      steps=60, train_fill=30, eval_fill=16, train_every=10,
      log_every=20, eval_every=30, eval_samples=1)
  runlib.train_fixed_eval(
      agent, env, make_replay(), make_replay(), logger, args)
  rows = read_metrics(tmp_path)
  reports = [r for r in rows if any('eval' in k for k in r)]
  assert int(step) >= 60
  assert reports, 'no fixed-eval report logged'
  env.close()


@pytest.mark.slow
def test_learning_fused(tmp_path):
  """run=learning with train_fused>1: K updates per dispatch, step counter
  advances by K, PER-less metrics aggregate normally."""
  config, env, agent, step, logger = build(tmp_path)
  store = replaylib.RAMStore(int(1e5))
  train_replay = replaylib.Stats(store)
  # Prefill the store with random episodes directly.
  driver = ddt.Driver(env)
  fixed = replaylib.FixedLength(train_replay, chunk=config.replay_chunk)
  driver.on_step(fixed.add)
  driver(ddt.RandomAgent(env.act_space).policy, steps=40)
  eval_replay = replaylib.FixedLength(
      replaylib.RAMStore(int(1e5)), chunk=config.replay_chunk)
  # The learner's first eval fires immediately; give the eval replay data
  # so its dataset never blocks.
  eval_driver = ddt.Driver(env)
  eval_driver.on_step(eval_replay.add)
  eval_driver(ddt.RandomAgent(env.act_space).policy, steps=25)
  args = ddt.Config(
      logdir=str(tmp_path), **config.train,
      batch_size=config.batch_size,
      replay_chunk=config.replay_chunk).update(
      steps=4, train_fill=20, sync_every=300, log_every=300,
      eval_every=300, eval_samples=1, train_fused=2)
  runlib.learning(agent, fixed, eval_replay, logger, args)
  assert int(step) >= 4
  assert (tmp_path / 'agent.pkl').exists()
  env.close()


@pytest.mark.slow
def test_learning_device_replay(tmp_path):
  """run=learning with the device-resident replay path: episodes are
  mirrored into the device ring and the learner trains without host
  batches (uniform sampler, no PER)."""
  config, env, agent, step, logger = build(tmp_path)
  store = replaylib.RAMStore(int(1e5))
  train_replay = replaylib.Stats(store)
  driver = ddt.Driver(env)
  fixed = replaylib.FixedLength(train_replay, chunk=config.replay_chunk)
  driver.on_step(fixed.add)
  driver(ddt.RandomAgent(env.act_space).policy, steps=40)
  eval_replay = replaylib.FixedLength(
      replaylib.RAMStore(int(1e5)), chunk=config.replay_chunk)
  eval_driver = ddt.Driver(env)
  eval_driver.on_step(eval_replay.add)
  eval_driver(ddt.RandomAgent(env.act_space).policy, steps=25)
  args = ddt.Config(
      logdir=str(tmp_path), **config.train,
      batch_size=config.batch_size,
      replay_chunk=config.replay_chunk).update(
      steps=4, train_fill=20, sync_every=300, log_every=300,
      eval_every=300, eval_samples=1, train_fused=2,
      device_replay=True, device_replay_steps=200)
  import io
  import contextlib
  out = io.StringIO()
  with contextlib.redirect_stdout(out):
    runlib.learning(agent, fixed, eval_replay, logger, args)
  # The device path must ENGAGE for uniform replays (regression: the
  # universal no-op Replay.prioritize once tripped a hasattr PER check
  # and silently fell back to host sampling for every uniform config).
  assert 'Device-resident replay engaged' in out.getvalue()
  assert 'falling back to host sampling' not in out.getvalue()
  assert int(step) >= 4
  assert (tmp_path / 'agent.pkl').exists()
  env.close()


def test_cli_async_dispatch_parses_learner_addr(tmp_path, monkeypatch):
  """The learning/acting CLI branches read --learner_addr from the OUTER
  flag parser (it is not a config key); regression for an AttributeError
  that broke both async entry points when launched via the CLI."""
  from daydreamer_tpu.agents.dreamer import train as train_cli

  calls = {}
  monkeypatch.setattr(
      ddt.run, 'learning',
      lambda agent, replay, eval_replay, logger, args: calls.setdefault(
          'learning', replay))
  monkeypatch.setattr(
      ddt.run, 'acting',
      lambda agent, env, replay, logger, outdir, args: calls.setdefault(
          'acting', replay))
  common = [
      '--configs', 'debug', '--task', 'dummy_discrete',
      '--jax.platform', 'cpu', '--env.parallel', 'none',
  ]
  import socket
  with socket.socket() as s:
    s.bind(('', 0))
    port = s.getsockname()[1]
  train_cli.main(common + [
      '--run', 'learning', '--logdir', str(tmp_path / 'learn'),
      '--learner_addr', f'localhost:{port}'])
  assert 'learning' in calls
  train_cli.main(common + [
      '--run', 'acting', '--logdir', str(tmp_path / 'act'),
      '--learner_addr', f'localhost:{port}'])
  assert 'acting' in calls
