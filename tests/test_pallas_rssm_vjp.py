"""Gradient correctness of the fused Pallas observe chain.

Compares jax.grad of the fused custom-VJP path (Pallas forward +
backward kernels in interpreter mode on CPU) against jax.grad of the
pure-jnp scan reference `observe_scan_full` — same cell math, autodiff
backward — for a loss touching every output, w.r.t. every parameter and
every differentiable input.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daydreamer_tpu.ops import pallas_rssm as pr
from daydreamer_tpu.ops import pallas_rssm_vjp as prv

D, U, S, C, A, E = 128, 128, 8, 16, 12, 64
B, T = 8, 5
UNIMIX = 0.01


def _params_from_flat(flat):
  (w_in_s, w_in_a, g1, b1, w_gru_d, w_gru_x, gg, bg, outw, outs, outb,
   w_st, b_st, w_obs_d, w_obs_e, g2, b2, w_post, b_post) = flat
  return {
      'w_in_s': w_in_s, 'w_in_a': w_in_a,
      'ln_in_scale': g1, 'ln_in_bias': b1,
      'w_gru_d': w_gru_d, 'w_gru_x': w_gru_x,
      'ln_gru_scale': gg, 'ln_gru_bias': bg,
      'w_out': list(outw), 'ln_out_scale': list(outs),
      'ln_out_bias': list(outb),
      'w_st': w_st, 'b_st': b_st,
      'w_obs_d': w_obs_d, 'w_obs_e': w_obs_e,
      'ln_obs_scale': g2, 'ln_obs_bias': b2,
      'w_post': w_post, 'b_post': b_post,
      'stoch_n': S, 'classes': C,
  }


@pytest.fixture(scope='module')
def setup():
  key = jax.random.PRNGKey(3)
  params = pr.make_params(key, D, U, S, C, A, E, prior_layers=2)
  flat, _ = prv._flatten_params(params)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  stoch0 = jax.nn.one_hot(
      jax.random.randint(k1, (B, S), 0, C), C).reshape(B, S * C)
  stoch0 = stoch0.astype(jnp.float32)
  deter0 = jax.random.normal(k2, (B, D), jnp.float32) * 0.1
  actions = jax.random.normal(k3, (T, B, A), jnp.float32)
  embeds = jax.random.normal(k4, (T, B, E), jnp.float32)
  is_first = jnp.zeros((T, B), bool).at[0].set(True).at[3, :3].set(True)
  # Fixed cotangent-defining mixing weights so the loss touches every
  # output with distinct scales.
  kd, kp, kr, ks = jax.random.split(jax.random.PRNGKey(9), 4)
  wd = jax.random.normal(kd, (T, B, D), jnp.float32)
  wp = jax.random.normal(kp, (T, B, S * C), jnp.float32)
  wr = jax.random.normal(kr, (T, B, S * C), jnp.float32)
  ws = jax.random.normal(ks, (T, B, S * C), jnp.float32)
  return flat, stoch0, deter0, actions, embeds, is_first, (wd, wp, wr, ws)


def _mk_loss(fn, is_first, mix):
  wd, wp, wr, ws = mix

  def loss(flat, stoch0, deter0, actions, embeds):
    dt, plog, prlog, st = fn(flat, stoch0, deter0, actions, embeds,
                             is_first)
    return (jnp.sum(dt * wd) + jnp.sum(plog * wp)
            + jnp.sum(prlog * wr) + jnp.sum(st * ws))
  return loss


def test_fused_forward_matches_scan(setup):
  flat, stoch0, deter0, actions, embeds, is_first, _ = setup
  params = _params_from_flat(flat)
  ref = prv.observe_scan_full(
      params, stoch0, deter0, actions, embeds, is_first, 0,
      unimix=UNIMIX, sample=False)
  got = prv.observe_fused(
      params, stoch0, deter0, actions, embeds, is_first, 0,
      unimix=UNIMIX, sample=False, interpret=True)
  for name, r, g in zip(('deter', 'post', 'prior', 'stoch'), ref, got):
    np.testing.assert_allclose(
        np.asarray(r, np.float32), np.asarray(g, np.float32),
        rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_gradients_match_scan(setup):
  flat, stoch0, deter0, actions, embeds, is_first, mix = setup

  def scan_fn(flat, s0, d0, a, e, f):
    return prv.observe_scan_full(
        _params_from_flat(flat), s0, d0, a, e, f, 0,
        unimix=UNIMIX, sample=False)

  def fused_fn(flat, s0, d0, a, e, f):
    return prv.observe_fused(
        _params_from_flat(flat), s0, d0, a, e, f, 0,
        unimix=UNIMIX, sample=False, interpret=True)

  loss_scan = _mk_loss(scan_fn, is_first, mix)
  loss_fused = _mk_loss(fused_fn, is_first, mix)
  args = (flat, stoch0, deter0, actions, embeds)
  g_scan = jax.grad(loss_scan, argnums=(0, 1, 2, 3, 4))(*args)
  g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)

  flat_s, _ = jax.tree.flatten(g_scan)
  flat_f, _ = jax.tree.flatten(g_fused)
  names = [str(i) for i in range(len(flat_s))]
  assert len(flat_s) == len(flat_f)
  for name, a, b in zip(names, flat_s, flat_f):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = max(1e-3, float(np.abs(a).max()))
    np.testing.assert_allclose(
        a / scale, b / scale, rtol=5e-3, atol=5e-3,
        err_msg=f'grad leaf {name}')


def test_fused_impl_logits_are_unimix_logprobs():
  """RSSM.observe with impl=pallas must package the SAME distribution as
  the scan path: unimix log-probs, not the kernel's raw stats logits
  (regression for a silent KL-objective change in xarm/ur5/sphero
  configs, which combine unimix 0.01 with impl: pallas)."""
  from daydreamer_tpu import nn
  from daydreamer_tpu.models.nets import RSSM

  unimix = 0.01
  kw = dict(deter=32, stoch=4, classes=8, unimix=unimix, units=32,
            act='elu', norm='layer')
  rng = np.random.default_rng(0)
  Bn, Tn, An, En = 3, 4, 5, 16
  embed = jnp.asarray(rng.normal(size=(Bn, Tn, En)), jnp.float32)
  action = jnp.asarray(rng.normal(size=(Bn, Tn, An)), jnp.float32)
  is_first = jnp.zeros((Bn, Tn), bool).at[:, 0].set(True)

  def run(impl, state, create):
    model = RSSM('rssm', impl=impl, **kw)
    fn = nn.pure(lambda: model.observe(embed, action, is_first))
    (post, prior), state = fn(state, 0, create=create)
    return post, prior, state

  _, _, state = run('scan', {}, True)
  post_s, prior_s, _ = run('scan', state, False)
  post_p, prior_p, _ = run('pallas', state, False)

  floor = unimix / kw['classes']
  for name, st in (('post', post_p), ('prior', prior_p)):
    probs = np.exp(np.asarray(st['logit'], np.float32))
    np.testing.assert_allclose(
        probs.sum(-1), 1.0, atol=1e-3, err_msg=f'{name} not log-probs')
    assert probs.min() >= floor * 0.98, (name, probs.min(), floor)

  # Step 0 resets state on is_first, so both impls see identical inputs
  # there regardless of their different posterior-sampling RNG streams.
  for name, a, b in (('post', post_s, post_p), ('prior', prior_s, prior_p)):
    np.testing.assert_allclose(
        np.asarray(a['logit'][:, 0], np.float32),
        np.asarray(b['logit'][:, 0], np.float32),
        rtol=1e-3, atol=1e-3, err_msg=f'{name} step-0 logit mismatch')


def _tiny_agent(impl, task='dummy_continuous', **overrides):
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env
  config = ddt.Config(Agent.configs['defaults'])
  config = config.update({
      'env.parallel': 'none', 'jax.platform': 'cpu',
      'jax.precision': 'float32', 'batch_size': 4, 'replay_chunk': 6,
      'imag_horizon': 3, r'.*\.layers': 2, r'.*\.units': 32,
      'rssm.deter': 32, 'rssm.units': 32, 'rssm.stoch': 4,
      'rssm.classes': 8, 'rssm.unroll': 1, 'imag_unroll': 1,
      'rssm.impl': impl,
      'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^',
      r'.*\.wd$': 0.0,
      **overrides,
  })
  env = load_env(task, amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
  data = {}
  for key, space in env.obs_space.items():
    data[key] = np.zeros((4, 6) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (4, 6) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  data['reward'] = np.random.default_rng(0).uniform(
      0, 1, (4, 6)).astype(np.float32)
  env.close()
  return agent, data


@pytest.mark.slow
def test_fused_imagine_trains_end_to_end():
  """imag_impl=pallas (policy-in-the-loop rollout fused with the actor
  MLP): full reinforce train steps run with the SAME parameter set as the
  scan rollout, finite decreasing loss, and actor/critic updates applied
  (discrete task, interpret mode on CPU)."""
  agent_p, data = _tiny_agent(
      'scan', task='dummy_discrete', **{'imag_impl': 'pallas'})
  agent_s, _ = _tiny_agent(
      'scan', task='dummy_discrete', **{'imag_impl': 'scan'})
  agent_p._create()
  agent_s._create()
  assert sorted(agent_p.varibs) == sorted(agent_s.varibs)

  losses, actor_metrics = [], []
  state = None
  for _ in range(6):
    outs, state, mets = agent_p.train(data, state)
    losses.append(float(mets['model_loss_mean']))
    actor_metrics.append(float(mets['actor_opt_loss']))
  assert np.isfinite(losses).all(), losses
  assert losses[-1] < losses[0], losses
  assert np.isfinite(actor_metrics).all(), actor_metrics


@pytest.mark.slow
def test_fused_impl_trains_end_to_end():
  """rssm.impl=pallas: full agent train steps run (interpret mode on CPU)
  with finite decreasing world-model loss and the SAME parameter set as
  the scan implementation (creation runs the scan path, so checkpoints
  and optimizer wiring are identical)."""
  agent_p, data = _tiny_agent('pallas')
  agent_s, _ = _tiny_agent('scan')
  agent_p._create()
  agent_s._create()
  assert sorted(agent_p.varibs) == sorted(agent_s.varibs)

  losses = []
  state = None
  for _ in range(6):
    outs, state, mets = agent_p.train(data, state)
    losses.append(float(mets['model_loss_mean']))
  assert np.isfinite(losses).all(), losses
  assert losses[-1] < losses[0], losses
