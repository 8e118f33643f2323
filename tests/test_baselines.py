"""Smoke tests for the comparison baselines (reference: ppo.py, rainbow/,
pytorch_sac/, drqv2/ trees producing scores/*.json curves).

Each baseline's full main() runs for a handful of env steps on a cheap
task with the train threshold lowered so at least one gradient update
executes. This catches import rot, env-API drift, and shape bugs without
waiting for a learning curve (those are produced by scripts/baselines_run.py).
"""

import json
import pathlib

import pytest


def _run(main, argv, logdir):
  main(argv + ['--logdir', str(logdir)])
  scores = pathlib.Path(logdir) / 'scores.jsonl'
  assert scores.exists(), 'baseline produced no scores.jsonl'
  lines = [json.loads(x) for x in scores.read_text().splitlines()]
  assert any('episode/score' in line for line in lines)


def test_sac_smoke(tmp_path):
  from baselines.sac import main
  _run(main, [
      '--task', 'a1_dummy', '--steps', '130', '--length', '40',
      '--train_fill', '50', '--batch_size', '16'], tmp_path)


def test_ppo_smoke(tmp_path):
  from baselines.ppo import main
  _run(main, [
      '--task', 'xarm_dummy', '--steps', '130', '--length', '40',
      '--horizon', '64'], tmp_path)


def test_rainbow_smoke(tmp_path):
  from baselines.rainbow import main
  _run(main, [
      '--task', 'xarm_dummy', '--steps', '130', '--length', '40',
      '--train_fill', '50', '--batch_size', '16', '--history', '2'],
      tmp_path)


def test_drqv2_smoke(tmp_path):
  from baselines.drqv2 import main
  _run(main, [
      '--task', 'sphero_dummy', '--steps', '130', '--length', '40',
      '--train_fill', '50', '--batch_size', '8'], tmp_path)
