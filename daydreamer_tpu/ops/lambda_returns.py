"""λ-return backward recursions as a single Pallas TPU kernel.

The GVE/GAE recursions (reference: embodied/agents/dreamerv2plus/
agent.py:422-442) are sequential over the imagination horizon with tiny
elementwise work per step — as a `lax.scan` that is H dispatches of
VPU-starved kernels. Here the whole recursion runs inside one kernel with
all operands resident in VMEM: for H=15 and N=B*T lanes the working set is
a few hundred KB, far under the ~16 MB VMEM budget.

Numerics match the scan implementation exactly (same order of operations).
Falls back to `lax.scan` off-TPU; `interpret=True` covers CPU tests.
"""

import functools

import jax
import jax.numpy as jnp

LANE = 128


def _gve_kernel(interm_ref, disc_ref, boot_ref, out_ref, *, horizon, lam):
  carry = boot_ref[:]
  # Walk time backwards; each step is one VPU op over all lanes.
  for t in reversed(range(horizon)):
    carry = interm_ref[t] + disc_ref[t] * lam * carry
    out_ref[t] = carry


def _gae_kernel(delta_ref, disc_ref, out_ref, *, horizon, lam):
  carry = jnp.zeros_like(delta_ref[0])
  for t in reversed(range(horizon)):
    carry = delta_ref[t] + disc_ref[t] * lam * carry
    out_ref[t] = carry


def _pad_lanes(x, lanes):
  pad = (-x.shape[-1]) % lanes
  if pad:
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
  return x


def _resolve_interpret(interpret):
  """Pallas must run in interpret mode off-TPU. The eager creation pass
  dispatches under `jax.default_device(cpu)` even when the training
  backend is a TPU, so check the active default device first."""
  if interpret is not None:
    return interpret
  device = jax.config.jax_default_device
  if device is not None:
    return device.platform not in ('tpu', 'axon')
  return not _on_tpu()


def gve_pallas(interm, disc, bootstrap, lam, interpret=None):
  """ret[t] = interm[t] + disc[t]*lam*ret[t+1]; ret[H] = bootstrap.

  interm, disc: [H, N]; bootstrap: [N]. Returns [H, N] float32.
  """
  return _gve_pallas(
      interm, disc, bootstrap, lam, _resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=('lam', 'interpret'))
def _gve_pallas(interm, disc, bootstrap, lam, interpret=False):
  from jax.experimental import pallas as pl
  horizon, n = interm.shape
  interm = _pad_lanes(interm.astype(jnp.float32), LANE)
  disc = _pad_lanes(disc.astype(jnp.float32), LANE)
  boot = _pad_lanes(bootstrap.astype(jnp.float32), LANE)
  out = pl.pallas_call(
      functools.partial(_gve_kernel, horizon=horizon, lam=lam),
      out_shape=jax.ShapeDtypeStruct(interm.shape, jnp.float32),
      interpret=interpret,
  )(interm, disc, boot)
  return out[:, :n]


def gae_pallas(deltas, disc, lam, interpret=None):
  """adv[t] = deltas[t] + disc[t]*lam*adv[t+1]; adv[H] = 0."""
  return _gae_pallas(deltas, disc, lam, _resolve_interpret(interpret))


@functools.partial(jax.jit, static_argnames=('lam', 'interpret'))
def _gae_pallas(deltas, disc, lam, interpret=False):
  from jax.experimental import pallas as pl
  horizon, n = deltas.shape
  deltas = _pad_lanes(deltas.astype(jnp.float32), LANE)
  disc = _pad_lanes(disc.astype(jnp.float32), LANE)
  out = pl.pallas_call(
      functools.partial(_gae_kernel, horizon=horizon, lam=lam),
      out_shape=jax.ShapeDtypeStruct(deltas.shape, jnp.float32),
      interpret=interpret,
  )(deltas, disc)
  return out[:, :n]


def gve_scan(interm, disc, bootstrap, lam):
  def body(carry, inp):
    interm_t, disc_t = inp
    value = interm_t + disc_t * lam * carry
    return value, value
  _, values = jax.lax.scan(body, bootstrap, (interm, disc), reverse=True)
  return values


def gae_scan(deltas, disc, lam):
  def body(carry, inp):
    delta_t, disc_t = inp
    value = delta_t + disc_t * lam * carry
    return value, value
  _, values = jax.lax.scan(
      body, jnp.zeros_like(deltas[0]), (deltas, disc), reverse=True)
  return values


def lambda_return(interm, disc, bootstrap, lam, impl='auto'):
  """Dispatch between the Pallas kernel and the lax.scan fallback."""
  if impl == 'auto':
    impl = 'pallas' if _on_tpu() else 'scan'
  if impl == 'pallas':
    flat_i = interm.reshape(interm.shape[0], -1)
    flat_d = disc.reshape(disc.shape[0], -1)
    flat_b = bootstrap.reshape(-1)
    out = gve_pallas(flat_i, flat_d, flat_b, float(lam))
    return out.reshape(interm.shape)
  return gve_scan(interm, disc, bootstrap, lam)


def _on_tpu():
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False
