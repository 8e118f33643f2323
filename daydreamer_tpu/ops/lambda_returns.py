"""λ-return backward recursions (reference: embodied/agents/dreamerv2plus/
agent.py:422-442) as `lax.scan` programs.

A Pallas TPU kernel version of these recursions was built and measured on
the real chip (scripts/pallas_proof.py, results in PALLAS_PROOF.json): the
standalone kernel is at best ~1.3x faster than the jitted scan at
dispatch-bound sizes, and inside the fused train program the end-to-end
throughput is identical (494.7 vs 495.3 updates/s) because XLA already
fuses the H elementwise steps and the recursion is a negligible slice of
the update. Per the design rule that only kernels that beat `lax.scan` are
kept, the scan implementation is the single implementation.
"""

import jax
import jax.numpy as jnp


def gve_scan(interm, disc, bootstrap, lam):
  """ret[t] = interm[t] + disc[t]*lam*ret[t+1]; ret[H] = bootstrap.

  interm, disc: [H, ...]; bootstrap: [...]. Returns [H, ...].
  """
  def body(carry, inp):
    interm_t, disc_t = inp
    value = interm_t + disc_t * lam * carry
    return value, value
  _, values = jax.lax.scan(body, bootstrap, (interm, disc), reverse=True)
  return values


def gae_scan(deltas, disc, lam):
  """adv[t] = deltas[t] + disc[t]*lam*adv[t+1]; adv[H] = 0."""
  def body(carry, inp):
    delta_t, disc_t = inp
    value = delta_t + disc_t * lam * carry
    return value, value
  _, values = jax.lax.scan(
      body, jnp.zeros_like(deltas[0]), (deltas, disc), reverse=True)
  return values


def lambda_return(interm, disc, bootstrap, lam):
  return gve_scan(interm, disc, bootstrap, lam)
