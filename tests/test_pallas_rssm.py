"""Pallas RSSM sequence kernels vs the lax.scan reference implementation.

The kernels run in interpreter mode here (tests are CPU-only); the real-
chip timing comparison lives in scripts/pallas_proof.py / PALLAS_PROOF.json
(SURVEY §7 step 7: only kernels that beat `lax.scan(unroll=k)` are kept).
"""

import jax
import jax.numpy as jnp
import pytest

from daydreamer_tpu.ops import pallas_rssm as pr

D, U, S, C, A, E = 128, 128, 8, 16, 12, 64
B, H = 8, 4


@pytest.fixture(scope='module')
def setup():
  key = jax.random.PRNGKey(0)
  params = pr.make_params(key, D, U, S, C, A, E, prior_layers=2)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  stoch0 = jax.nn.one_hot(
      jax.random.randint(k1, (B, S), 0, C), C).reshape(B, S * C)
  stoch0 = stoch0.astype(jnp.float32)
  deter0 = jax.random.normal(k2, (B, D), jnp.float32) * 0.1
  actions = jax.random.normal(k3, (H, B, A), jnp.float32)
  embeds = jax.random.normal(k4, (H, B, E), jnp.float32)
  is_first = jnp.zeros((H, B), bool).at[0].set(True).at[2, :3].set(True)
  return params, stoch0, deter0, actions, embeds, is_first


def test_imagine_kernel_matches_scan(setup):
  params, stoch0, deter0, actions, _, _ = setup
  d1, l1, s1 = pr.imagine_scan(
      params, stoch0, deter0, actions, 0, sample=False)
  d2, l2, s2 = pr.imagine_pallas(
      params, stoch0, deter0, actions, 0, sample=False, interpret=True)
  assert jnp.abs(d1 - d2).max() < 1e-5
  assert jnp.abs(l1 - l2).max() < 1e-4
  assert (s1 == s2).all()


def test_observe_kernel_matches_scan(setup):
  params, stoch0, deter0, actions, embeds, is_first = setup
  d1, l1, s1 = pr.observe_scan(
      params, stoch0, deter0, actions, embeds, is_first, 0, sample=False)
  d2, l2, s2 = pr.observe_pallas(
      params, stoch0, deter0, actions, embeds, is_first, 0, sample=False,
      interpret=True)
  assert jnp.abs(d1 - d2).max() < 1e-5
  assert jnp.abs(l1 - l2).max() < 1e-4
  assert (s1 == s2).all()


def test_imagine_actor_kernel_matches_scan(setup):
  """Policy-in-the-loop rollout: fused kernel must match the scan
  reference cell-for-cell in deterministic mode (argmax latents and
  argmax actions), including the actor MLP folded into the chain."""
  params, stoch0, deter0, _, _, _ = setup
  actor = pr.make_actor_params(jax.random.PRNGKey(7), D, U, S, C, A)
  action0 = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A, dtype=jnp.float32)
  d1, l1, s1, a1 = pr.imagine_actor_scan(
      params, actor, stoch0, deter0, action0, H, 0, sample=False)
  d2, l2, s2, a2 = pr.imagine_actor_pallas(
      params, actor, stoch0, deter0, action0, H, 0, sample=False,
      interpret=True)
  assert jnp.abs(d1 - d2).max() < 1e-5
  assert jnp.abs(l1 - l2).max() < 1e-4
  assert (s1 == s2).all()
  assert (a1 == a2).all()


def test_imagine_actor_sampling_valid(setup):
  """Sampled rollouts emit exact one-hot latents AND one-hot actions,
  and the action marginals are non-degenerate (unimix floor explores)."""
  params, stoch0, deter0, _, _, _ = setup
  actor = pr.make_actor_params(jax.random.PRNGKey(7), D, U, S, C, A)
  action0 = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A, dtype=jnp.float32)
  H_long = 16
  d, l, s, a = pr.imagine_actor_scan(
      params, actor, stoch0, deter0, action0, H_long, 3, sample=True,
      act_unimix=0.3)
  assert (s.reshape(H_long, B, S, C).sum(-1) == 1).all()
  assert (a.sum(-1) == 1).all()
  # With a 0.3 uniform floor over H*B=128 draws, more than one action
  # class must appear.
  assert (a.reshape(-1, A).sum(0) > 0).sum() > 1


def test_scan_unroll_invariance(setup):
  """unroll is a compile-time knob only: results must be identical."""
  params, stoch0, deter0, actions, _, _ = setup
  d1, l1, s1 = pr.imagine_scan(
      params, stoch0, deter0, actions, 3, sample=True, unroll=1)
  d2, l2, s2 = pr.imagine_scan(
      params, stoch0, deter0, actions, 3, sample=True, unroll=2)
  assert jnp.abs(d1 - d2).max() < 1e-5
  assert (s1 == s2).all()


def test_scan_sampling_valid_onehots(setup):
  params, stoch0, deter0, actions, _, _ = setup
  _, _, stochs = pr.imagine_scan(
      params, stoch0, deter0, actions, 5, sample=True)
  sums = stochs.reshape(H, B, S, C).sum(-1)
  assert (sums == 1).all()
  assert (stochs[0] != stochs[1]).any()
