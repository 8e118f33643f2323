"""Prove or refute a Pallas λ-return kernel on the real TPU.

SURVEY §7 step 7: only keep Pallas kernels that beat `lax.scan`. This
script holds the candidate kernel (a single-kernel GVE backward recursion
with all operands in VMEM) and measures it against the library's
`ops.gve_scan` as isolated jitted programs.

Measured 2026-08-21 on one TPU v5e chip (PALLAS_PROOF.json): standalone
the kernel wins at most 1.3x at dispatch-bound sizes, and with
`return_impl=pallas` wired into the fused train program the end-to-end
throughput was identical to scan (494.7 vs 495.3 updates/s) — the
recursion is a negligible, already-fused slice of the update. Verdict:
the kernel was removed from the library (ops/lambda_returns.py keeps the
scan implementation only); it lives on here so the measurement can be
reproduced.

Usage: python scripts/pallas_proof.py
"""

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
LANE = 128


def _gve_kernel(interm_ref, disc_ref, boot_ref, out_ref, *, horizon, lam):
  carry = boot_ref[:]
  # Walk time backwards; each step is one VPU op over all lanes.
  for t in reversed(range(horizon)):
    carry = interm_ref[t] + disc_ref[t] * lam * carry
    out_ref[t] = carry


@functools.partial(
    __import__('jax').jit, static_argnames=('lam', 'interpret'))
def gve_pallas(interm, disc, bootstrap, lam, interpret=False):
  import jax
  import jax.numpy as jnp
  from jax.experimental import pallas as pl

  def pad(x):
    extra = (-x.shape[-1]) % LANE
    if extra:
      x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, extra)])
    return x

  horizon, n = interm.shape
  interm = pad(interm.astype(jnp.float32))
  disc = pad(disc.astype(jnp.float32))
  boot = pad(bootstrap.astype(jnp.float32))
  out = pl.pallas_call(
      functools.partial(_gve_kernel, horizon=horizon, lam=lam),
      out_shape=jax.ShapeDtypeStruct(interm.shape, jnp.float32),
      interpret=interpret,
  )(interm, disc, boot)
  return out[:, :n]


def timeit(fn, *args, reps=200, warmup=5):
  import jax
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  start = time.time()
  for _ in range(reps):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.time() - start) / reps


def standalone(horizon, lanes):
  import jax
  from daydreamer_tpu.ops import lambda_returns as lr
  rng = np.random.default_rng(0)
  interm = jax.device_put(
      rng.normal(size=(horizon, lanes)).astype(np.float32))
  disc = jax.device_put(
      rng.uniform(0.9, 1.0, size=(horizon, lanes)).astype(np.float32))
  boot = jax.device_put(rng.normal(size=(lanes,)).astype(np.float32))
  lam = 0.95

  scan = jax.jit(lambda i, d, b: lr.gve_scan(i, d, b, lam))
  interpret = jax.devices()[0].platform not in ('tpu', 'axon')
  pallas = lambda i, d, b: gve_pallas(i, d, b, lam, interpret)

  out_scan = np.asarray(scan(interm, disc, boot))
  out_pallas = np.asarray(pallas(interm, disc, boot))
  np.testing.assert_allclose(out_scan, out_pallas, rtol=1e-6)

  t_scan = timeit(scan, interm, disc, boot)
  t_pallas = timeit(pallas, interm, disc, boot)
  return {'horizon': horizon, 'lanes': lanes,
          'scan_us': round(t_scan * 1e6, 1),
          'pallas_us': round(t_pallas * 1e6, 1),
          'speedup': round(t_scan / t_pallas, 3)}


def main():
  rows = []
  for horizon, lanes in [(15, 64), (15, 256), (15, 2048)]:
    row = standalone(horizon, lanes)
    print('standalone', row, flush=True)
    rows.append(row)
  print(json.dumps(rows))


if __name__ == '__main__':
  main()
