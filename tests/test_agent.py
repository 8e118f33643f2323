"""Agent integration tests on the Dummy env, mirroring the reference's
shrunken TEST_CONFIG regression setup (reference:
embodied/agents/dreamerv2plus/tests.py:26-53)."""

import jax
import numpy as np
import pytest

import daydreamer_tpu as ddt
from daydreamer_tpu.envs import load_env


def make_config(**overrides):
  from daydreamer_tpu.agents.dreamer import Agent
  config = ddt.Config(Agent.configs['defaults'])
  config = config.update(Agent.configs['debug'])
  config = config.update({
      'jax.platform': 'cpu',
      'batch_size': 8,
      'replay_chunk': 8,
      'imag_horizon': 3,
      'env.amount': 1,
      'env.length': 10,
      **overrides,
  })
  return config


def make_batch(env, config, T=None):
  B = config.batch_size
  T = T or config.replay_chunk
  data = {}
  for key, space in env.obs_space.items():
    if key.startswith('log_'):
      continue
    data[key] = np.zeros((B, T) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (B, T) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  data['reward'] = np.random.uniform(0, 1, data['reward'].shape).astype(
      np.float32)
  return data


@pytest.mark.parametrize('task', ['dummy_discrete', 'dummy_continuous'])
def test_train_and_policy(task):
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task=task)
  env = load_env(task, amount=1, parallel='none', length=10)
  step = ddt.Counter()
  agent = Agent(env.obs_space, env.act_space, step, config)
  data = make_batch(env, config)
  # Train twice with state threading; losses must be finite.
  outs, state, mets = agent.train(data)
  outs, state, mets = agent.train(data, state)
  assert np.isfinite(mets['model_loss_mean'])
  assert np.isfinite(mets['model_opt_loss'])
  assert np.isfinite(mets['extr_critic_opt_loss'])
  assert np.isfinite(mets['actor_opt_loss'])
  assert mets['model_opt_grad_steps'] == 2
  # Policy produces valid actions and threads state.
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  for mode in ('train', 'eval', 'explore'):
    acts, pstate = agent.policy(obs, mode=mode)
    action = acts['action']
    assert action.shape == (config.batch_size,) + \
        env.act_space['action'].shape
    assert np.isfinite(action).all()
    acts2, pstate = agent.policy(obs, pstate, mode=mode)
  env.close()


def test_policy_rng_evolves():
  """The policy RNG key threads through the jitted call and is fed back
  (jaxagent._keyed_policy), so stochastic-policy actions must differ
  across repeated calls on the SAME observation — a key-threading bug
  would freeze the sample/noise and repeat one action forever."""
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_continuous', batch_size=2)
  env = load_env('dummy_continuous', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  actions, keys, pstate = [], [], None
  for _ in range(4):
    acts, pstate = agent.policy(obs, pstate, mode='train')
    actions.append(np.asarray(acts['action']))
    keys.append(np.asarray(agent._policy_rng).copy())
  diffs = [np.abs(a - b).max() for a, b in zip(actions, actions[1:])]
  assert max(diffs) > 1e-6, diffs
  for a, b in zip(keys, keys[1:]):  # The key itself must evolve.
    assert not np.array_equal(a, b), keys
  env.close()


def test_losses_decrease():
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_continuous')
  env = load_env('dummy_continuous', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  state = None
  losses = []
  for i in range(10):
    _, state, mets = agent.train(data, state)
    losses.append(float(mets['model_loss_mean']))
  # World model should fit the fixed batch quickly.
  assert losses[-1] < losses[0], losses
  env.close()


def test_report():
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete')
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  report = agent.report(data)
  assert 'openl_image' in report
  video = report['openl_image']
  assert video.ndim == 4  # T, H, W*B, C
  assert np.isfinite(np.asarray(
      report['model_loss_mean']))
  env.close()


def test_save_load_roundtrip():
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete')
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  agent.train(data)
  values = agent.save()
  agent2 = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  agent2.load(values)
  values2 = agent2.save()
  for key in values:
    assert np.allclose(values[key], values2[key]), key
  env.close()


def test_fixed_seed_determinism():
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete')
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  data = None
  results = []
  for _ in range(2):
    agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
    data = make_batch(env, config) if data is None else data
    np.random.seed(0)
    _, _, mets = agent.train(data)
    results.append(float(mets['model_loss_mean']))
  assert results[0] == results[1], results
  env.close()


@pytest.mark.slow
def test_eager_mode_matches_jit():
  """Compiler-mode matrix (reference: tests/test_xla_off.py et al.): the
  eager (jit=False) path must reproduce the jitted path's outputs — same
  seeded creation, same eval-policy actions, same report losses. Forward
  paths only: a full eager train step is dominated by thousands of
  single-op XLA compiles (~2 min for one update) while adding no parity
  signal beyond what report covers; eager-vs-jit gradient parity is
  covered at the module level by test_nn.py::test_eager_grads_match_jit."""
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete', batch_size=2,
                       replay_chunk=3, imag_horizon=2, seed=0)
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  data = make_batch(env, config, T=3)
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  results = {}
  for jit in (False, True):
    cfg = config.update({'jax.jit': jit})
    agent = Agent(env.obs_space, env.act_space, ddt.Counter(), cfg)
    acts, _ = agent.policy(obs, None, mode='eval')
    rep = agent.report(data)
    results[jit] = (acts, rep)
  env.close()
  acts_e, rep_e = results[False]
  acts_j, rep_j = results[True]
  np.testing.assert_allclose(
      np.asarray(acts_e['action'], np.float32),
      np.asarray(acts_j['action'], np.float32), atol=1e-4)
  keys = sorted(set(rep_e.keys()) & set(rep_j.keys()))
  assert 'model_loss_mean' in keys
  checked = 0
  for key in keys:
    a, b = float(np.mean(rep_e[key])), float(np.mean(rep_j[key]))
    if np.isnan(a) and np.isnan(b):  # Empty-slice metrics (e.g. neg_acc).
      continue
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3, err_msg=key)
    checked += 1
  assert checked >= 10, keys


def test_train_multi_matches_sequential():
  """Fused K-step train (one dispatch, lax.scan over the train step) must
  reproduce K sequential `train` calls exactly: same seed stream, same
  final agent state, same per-step metrics."""
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete', batch_size=4,
                       replay_chunk=6, imag_horizon=2)
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  np.random.seed(0)
  data1 = make_batch(env, config, T=6)
  np.random.seed(1)
  data2 = make_batch(env, config, T=6)

  seq = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  state = None
  seq_mets = []
  for data in (data1, data2):
    _, state, mets = seq.train(data, state)
    seq_mets.append(dict(mets))

  fused = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  outs, fstate, fmets = fused.train_multi([data1, data2])

  # Same final TBPTT carry and same trained parameters.
  for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(fstate)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
  for key in seq.varibs:
    np.testing.assert_allclose(
        np.asarray(seq.varibs[key]), np.asarray(fused.varibs[key]),
        atol=1e-5, err_msg=key)
  # Fused metrics are the mean over the K steps.
  want = np.mean([m['model_loss_mean'] for m in seq_mets])
  assert abs(float(fmets['model_loss_mean']) - want) < 1e-4
  env.close()


def test_train_multi_per_priorities():
  """PER priorities come back with a leading K axis and per-step keys."""
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete', batch_size=4,
                       replay_chunk=6, imag_horizon=2, replay='prio')
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  datas = []
  for i in range(2):
    data = make_batch(env, config, T=6)
    data['key'] = np.arange(8, dtype=np.int64).reshape(4, 2) + i
    data['prob'] = np.full((4, 6), 0.5, np.float32)
    datas.append(data)
  outs, state, mets = agent.train_multi(datas)
  assert outs['priority'].shape[0] == 2
  assert outs['key'].shape == (2, 4, 2)
  env.close()


def test_device_feed_matches_list_path():
  """train_multi fed by device_feed (prestacked, device-resident groups)
  must match the list-of-batches path exactly, including PER keys."""
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(task='dummy_discrete', batch_size=4,
                       replay_chunk=6, imag_horizon=2, replay='prio')
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  datas = []
  for i in range(4):
    np.random.seed(i)
    data = make_batch(env, config, T=6)
    data['key'] = np.arange(8, dtype=np.int64).reshape(4, 2) + i
    data['prob'] = np.full((4, 6), 0.5, np.float32)
    datas.append(data)

  ref = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  r_outs, r_state, r_mets = ref.train_multi(datas[:2])
  r_outs2, r_state, _ = ref.train_multi(datas[2:], r_state)

  fed = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  feed = fed.device_feed(iter(datas), 2)
  f_outs, f_state, f_mets = fed.train_multi(next(feed))
  f_outs2, f_state, _ = fed.train_multi(next(feed), f_state)

  np.testing.assert_array_equal(r_outs['key'], f_outs['key'])
  np.testing.assert_allclose(
      r_outs['priority'], f_outs['priority'], atol=1e-5)
  np.testing.assert_allclose(
      r_outs2['priority'], f_outs2['priority'], atol=1e-5)
  for key in ref.varibs:
    np.testing.assert_allclose(
        np.asarray(ref.varibs[key]), np.asarray(fed.varibs[key]),
        atol=1e-5, err_msg=key)
  assert abs(float(r_mets['model_loss_mean']) -
             float(f_mets['model_loss_mean'])) < 1e-4
  env.close()


def test_cpu_policy_mirror():
  """The host policy mirror serves a stale-but-consistent param subset."""
  from daydreamer_tpu.agents.dreamer import Agent
  config = make_config(
      task='dummy_discrete',
      **{'jax.policy_devices': 'cpu', 'jax.policy_sync': 2})
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = make_batch(env, config)
  obs = {k: v[:, 0] for k, v in data.items() if k != 'action'}
  acts, state = agent.policy(obs, mode='eval')
  assert agent._mirror is not None
  # The mirror holds only what the policy reads: no optimizer slots, and a
  # strict subset of the full state.
  assert len(agent._mirror) < len(agent.varibs)
  assert not any('_opt/' in k for k in agent._mirror)
  # Any encoder/actor param must be included.
  assert any('actor' in k for k in agent._mirror)
  synced_at = agent._mirror_at
  # One train step: below the sync cadence, the mirror must stay stale.
  _, tstate, _ = agent.train(data)
  agent.policy(obs, state, mode='eval')
  assert agent._mirror_at == synced_at
  # Crossing the cadence refreshes it.
  agent.train(data, tstate)
  agent.policy(obs, state, mode='eval')
  assert agent._mirror_at == 2
  # Refreshed mirror policy agrees with the unmirrored policy on params:
  # mirror values must match the live varibs for every mirrored key.
  import jax as _jax
  live = _jax.device_get({k: agent.varibs[k] for k in agent._mirror})
  host = _jax.device_get(dict(agent._mirror))
  for key in live:
    np.testing.assert_allclose(live[key], host[key])
  env.close()
