"""Async actor/learner integration: episodes flow over ZMQ, weights flow
through the shared-filesystem checkpoint (reference capability:
embodied/run/learning.py + acting.py, developed against dummy envs)."""

import socket
import threading
import time

import numpy as np
import pytest

import daydreamer_tpu as ddt
from daydreamer_tpu import replay as replaylib
from daydreamer_tpu.envs import load_env


def free_port():
  with socket.socket() as s:
    s.bind(('', 0))
    return s.getsockname()[1]


@pytest.mark.slow
def test_actor_learner_pair(tmp_path):
  from daydreamer_tpu.agents.dreamer import Agent
  port = free_port()
  logdir = str(tmp_path)

  config = ddt.Config(Agent.configs['defaults'])
  config = config.update(Agent.configs['debug'])
  config = config.update({
      'task': 'dummy_discrete',
      'jax.platform': 'cpu',
      'batch_size': 8,
      'replay_chunk': 8,
      'imag_horizon': 3,
      'logdir': logdir,
  })
  args = ddt.Config(
      logdir=logdir, **config.train,
      batch_size=config.batch_size, replay_chunk=config.replay_chunk)
  args = args.update({
      'steps': 3, 'train_fill': 30, 'sync_every': 30,
      'log_every': 1000, 'eval_every': 1000, 'eval_samples': 1})

  # Learner side: server store + agent training loop.
  learner_store = replaylib.Stats(replaylib.RAMStore())
  server = replaylib.StoreServer(learner_store, port)
  train_replay = replaylib.FixedLength(learner_store, 8)
  eval_replay = replaylib.FixedLength(replaylib.RAMStore(), 8)
  # The learner's first eval fires immediately (Every semantics match the
  # reference); give the eval replay data so it never blocks.
  eval_replay.add_traj({
      'action': np.zeros((12, 5), np.float32),
      'image': np.zeros((12, 64, 64, 3), np.uint8),
      'vector': np.zeros((12, 7), np.float32),
      'step': np.arange(12, dtype=np.int32),
      'reward': np.zeros(12, np.float32),
      'is_first': np.eye(12, dtype=bool)[0],
      'is_last': np.eye(12, dtype=bool)[11],
      'is_terminal': np.zeros(12, bool),
  })

  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  learner_agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)

  logger = ddt.Logger(ddt.Counter(), [])

  errors = []

  def learner():
    try:
      ddt.run.learning(
          learner_agent, train_replay, eval_replay, logger, args)
    except Exception as e:
      errors.append(e)

  thread = threading.Thread(target=learner, daemon=True)
  thread.start()

  # Actor side: push episodes through the ZMQ client.
  client = replaylib.StoreClient(f'localhost:{port}')
  actor_replay = replaylib.FixedLength(client, 8)
  actor_env = load_env('dummy_discrete', amount=1, parallel='none',
                       length=10)
  driver = ddt.Driver(actor_env)
  driver.on_step(actor_replay.add)
  random_agent = ddt.RandomAgent(actor_env.act_space)
  driver(random_agent.policy, steps=60, episodes=1)

  thread.join(timeout=600)
  assert not thread.is_alive(), 'learner did not finish'
  assert not errors, errors
  # The learner published weights for the actor: the full state for
  # crash-resume AND the policy-only fast-sync snapshot.
  assert (tmp_path / 'agent.pkl').exists()
  assert (tmp_path / 'policy.pkl').exists()
  # The actor can load them.
  actor_agent = Agent(
      actor_env.obs_space, actor_env.act_space, ddt.Counter(), config)
  cp = ddt.Checkpoint(str(tmp_path / 'agent.pkl'), log=False)
  cp.agent = actor_agent
  age = cp.load()
  assert age >= 0
  # The policy snapshot is a strict parameter subset that merges into
  # the live state (the actor's per-sync payload).
  pcp = ddt.Checkpoint(str(tmp_path / 'policy.pkl'), log=False)
  pcp.agent = actor_agent
  assert pcp.load() >= 0
  obs = {
      k: np.zeros((1,) + v.shape, v.dtype)
      for k, v in actor_env.obs_space.items()}
  acts, _ = actor_agent.policy(obs)
  assert acts['action'].shape[0] == 1
  env.close()
  actor_env.close()
