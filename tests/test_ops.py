"""λ-return recursion numerics vs a NumPy reference implementation."""

import jax.numpy as jnp
import numpy as np

from daydreamer_tpu import ops


def np_gve(interm, disc, boot, lam):
  out = np.zeros_like(interm)
  carry = boot
  for t in reversed(range(len(interm))):
    carry = interm[t] + disc[t] * lam * carry
    out[t] = carry
  return out


def test_gve_scan_matches_numpy():
  rng = np.random.RandomState(0)
  H, N = 15, 96
  interm = rng.rand(H, N).astype(np.float32)
  disc = rng.uniform(0.9, 1.0, (H, N)).astype(np.float32)
  boot = rng.rand(N).astype(np.float32)
  got = ops.gve_scan(
      jnp.asarray(interm), jnp.asarray(disc), jnp.asarray(boot), 0.95)
  assert np.allclose(np_gve(interm, disc, boot, 0.95), np.asarray(got),
                     atol=1e-5)


def test_gae_scan_matches_numpy():
  rng = np.random.RandomState(1)
  H, N = 10, 64
  deltas = rng.randn(H, N).astype(np.float32)
  disc = rng.uniform(0.9, 1.0, (H, N)).astype(np.float32)
  got = ops.gae_scan(jnp.asarray(deltas), jnp.asarray(disc), 0.9)
  # GAE is GVE with zero bootstrap.
  expected = np_gve(deltas, disc, np.zeros(N, np.float32), 0.9)
  assert np.allclose(expected, np.asarray(got), atol=1e-5)


def test_lambda_return_multidim():
  rng = np.random.RandomState(2)
  H, B, T = 5, 4, 3
  interm = rng.rand(H, B, T).astype(np.float32)
  disc = rng.uniform(0.9, 1.0, (H, B, T)).astype(np.float32)
  boot = rng.rand(B, T).astype(np.float32)
  got = ops.lambda_return(
      jnp.asarray(interm), jnp.asarray(disc), jnp.asarray(boot), 0.95)
  assert got.shape == (H, B, T)
  flat = np_gve(interm.reshape(H, -1), disc.reshape(H, -1),
                boot.reshape(-1), 0.95)
  assert np.allclose(flat.reshape(H, B, T), np.asarray(got), atol=1e-5)
