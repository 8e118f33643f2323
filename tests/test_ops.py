"""Pallas kernel numerics: λ-return recursions vs lax.scan reference."""

import jax.numpy as jnp
import numpy as np

from daydreamer_tpu import ops


def test_gve_pallas_matches_scan():
  rng = np.random.RandomState(0)
  H, N = 15, 96
  interm = jnp.asarray(rng.rand(H, N), jnp.float32)
  disc = jnp.asarray(rng.uniform(0.9, 1.0, (H, N)), jnp.float32)
  boot = jnp.asarray(rng.rand(N), jnp.float32)
  expected = ops.gve_scan(interm, disc, boot, 0.95)
  got = ops.gve_pallas(interm, disc, boot, 0.95, interpret=True)
  assert np.allclose(np.asarray(expected), np.asarray(got), atol=1e-5)


def test_gae_pallas_matches_scan():
  rng = np.random.RandomState(1)
  H, N = 10, 64
  deltas = jnp.asarray(rng.randn(H, N), jnp.float32)
  disc = jnp.asarray(rng.uniform(0.9, 1.0, (H, N)), jnp.float32)
  expected = ops.gae_scan(deltas, disc, 0.9)
  got = ops.gae_pallas(deltas, disc, 0.9, interpret=True)
  assert np.allclose(np.asarray(expected), np.asarray(got), atol=1e-5)


def test_lane_padding():
  rng = np.random.RandomState(2)
  H, N = 5, 130  # Not a multiple of 128.
  interm = jnp.asarray(rng.rand(H, N), jnp.float32)
  disc = jnp.asarray(rng.uniform(0.9, 1.0, (H, N)), jnp.float32)
  boot = jnp.asarray(rng.rand(N), jnp.float32)
  expected = ops.gve_scan(interm, disc, boot, 0.95)
  got = ops.gve_pallas(interm, disc, boot, 0.95, interpret=True)
  assert got.shape == (H, N)
  assert np.allclose(np.asarray(expected), np.asarray(got), atol=1e-5)
