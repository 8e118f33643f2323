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
