"""Prove or refute the Pallas kernels for the SURVEY §7 hot-loop candidates.

SURVEY §7 step 7 names three candidate fusions, and the design rule is:
only keep Pallas kernels that beat `lax.scan(unroll=k)`. This script holds
the measurements behind PALLAS_PROOF.json:

  `rssm`    — the RSSM observe chain and the imagination rollout cell
              (ops/pallas_rssm.py whole-sequence kernels with VMEM-resident
              weights) vs the identical cell math as lax.scan at unroll
              1/2/8, at the a1 and xarm production shapes, in the
              production compute dtype (bf16).
  `returns` — the λ-return GVE backward recursion kernel vs ops.gve_scan.

λ-return verdict (measured 2026-08-21, one TPU v5e): standalone the kernel
wins at most ~1.3x at dispatch-bound sizes; wired into the fused train
program end-to-end throughput was identical (494.7 vs 495.3 updates/s), so
the kernel was removed from the library (ops/lambda_returns.py keeps the
scan only). NOTE: the fused half of that record is HISTORICAL — the
`return_impl` switch was deleted with the kernel, so only the standalone
rows remain reproducible (via `--which returns`; the kernel lives on in
this file).

Usage: python scripts/pallas_proof.py [--which rssm|returns|all]
       [--out PALLAS_PROOF.json]
"""

import argparse
import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
LANE = 128


# ---------------------------------------------------------------------------
# λ-return candidate (removed from the library; kept here for reproduction).
# ---------------------------------------------------------------------------


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


def timeit(fn, *args, reps=50, warmup=3):
  import jax
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  times = []
  for _ in range(5):  # Windows; median guards against congested windows.
    start = time.time()
    for _ in range(reps):
      out = fn(*args)
    jax.block_until_ready(out)
    times.append((time.time() - start) / reps)
  return float(np.median(times))


def returns_standalone(horizon, lanes):
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

  t_scan = timeit(scan, interm, disc, boot, reps=200)
  t_pallas = timeit(pallas, interm, disc, boot, reps=200)
  return {'horizon': horizon, 'lanes': lanes,
          'scan_us': round(t_scan * 1e6, 1),
          'pallas_us': round(t_pallas * 1e6, 1),
          'speedup': round(t_scan / t_pallas, 3)}


# ---------------------------------------------------------------------------
# RSSM sequence cells.
# ---------------------------------------------------------------------------


def rssm_case(name, cell, B, T, D, U, S, C, A, E, dtype_name, unrolls):
  """Time scan (at each unroll) and the Pallas kernel for one cell/shape."""
  import jax
  import jax.numpy as jnp
  from daydreamer_tpu.ops import pallas_rssm as pr

  dtype = dict(float32=jnp.float32, bfloat16=jnp.bfloat16)[dtype_name]
  on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
  key = jax.random.PRNGKey(0)
  params = pr.make_params(key, D, U, S, C, A, E, prior_layers=3,
                          dtype=dtype)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  stoch0 = jax.nn.one_hot(
      jax.random.randint(k1, (B, S), 0, C), C).reshape(B, S * C)
  stoch0 = stoch0.astype(dtype)
  deter0 = (jax.random.normal(k2, (B, D)) * 0.1).astype(dtype)
  actions = jax.random.normal(k3, (T, B, A)).astype(dtype)
  embeds = jax.random.normal(k4, (T, B, E)).astype(dtype)
  is_first = jnp.zeros((T, B), bool).at[0].set(True)

  # Close over params (static ints stoch_n/classes live in the dict, so
  # it cannot be a traced jit argument; the weights become executable
  # constants, identically for both implementations).
  if cell == 'imagine':
    scan_fn = lambda unroll: jax.jit(
        lambda st, de, ac: pr.imagine_scan(
            params, st, de, ac, 3, sample=True, unroll=unroll))
    pallas_fn = jax.jit(
        lambda st, de, ac: pr.imagine_pallas(
            params, st, de, ac, 3, sample=True, interpret=not on_tpu))
    args = (stoch0, deter0, actions)
  else:
    scan_fn = lambda unroll: jax.jit(
        lambda st, de, ac, em, fi: pr.observe_scan(
            params, st, de, ac, em, fi, 3, sample=True, unroll=unroll))
    pallas_fn = jax.jit(
        lambda st, de, ac, em, fi: pr.observe_pallas(
            params, st, de, ac, em, fi, 3, sample=True,
            interpret=not on_tpu))
    args = (stoch0, deter0, actions, embeds, is_first)

  row = {'cell': cell, 'shape': name, 'dtype': dtype_name,
         'B': B, 'T': T, 'deter': D, 'units': U, 'stoch': [S, C]}
  compile_s = {}
  for unroll in unrolls:
    fn = scan_fn(unroll)
    start = time.time()
    jax.block_until_ready(fn(*args))
    compile_s[f'scan_u{unroll}'] = round(time.time() - start, 1)
    row[f'scan_u{unroll}_us'] = round(timeit(fn, *args) * 1e6, 1)
  start = time.time()
  jax.block_until_ready(pallas_fn(*args))
  compile_s['pallas'] = round(time.time() - start, 1)
  row['pallas_us'] = round(timeit(pallas_fn, *args) * 1e6, 1)
  row['compile_s'] = compile_s
  best_scan = min(v for k, v in row.items()
                  if k.startswith('scan_') and k.endswith('_us'))
  row['speedup_vs_best_scan'] = round(best_scan / row['pallas_us'], 3)
  return row


def rssm_correctness():
  """Deterministic (sample=False) f32 agreement on the current backend."""
  import jax
  import jax.numpy as jnp
  from daydreamer_tpu.ops import pallas_rssm as pr
  on_tpu = jax.devices()[0].platform in ('tpu', 'axon')
  key = jax.random.PRNGKey(1)
  params = pr.make_params(key, 256, 256, 32, 32, 12, 512, prior_layers=3)
  k1, k2, k3, k4 = jax.random.split(key, 4)
  B, T = 16, 6
  stoch0 = jax.nn.one_hot(
      jax.random.randint(k1, (B, 32), 0, 32), 32).reshape(B, 1024)
  stoch0 = stoch0.astype(jnp.float32)
  deter0 = jax.random.normal(k2, (B, 256), jnp.float32) * 0.1
  actions = jax.random.normal(k3, (T, B, 12), jnp.float32)
  embeds = jax.random.normal(k4, (T, B, 512), jnp.float32)
  isf = jnp.zeros((T, B), bool).at[0].set(True)
  d1, l1, s1 = jax.jit(lambda: pr.imagine_scan(
      params, stoch0, deter0, actions, 0, sample=False))()
  d2, l2, s2 = jax.jit(lambda: pr.imagine_pallas(
      params, stoch0, deter0, actions, 0, sample=False,
      interpret=not on_tpu))()
  dmax = float(jnp.abs(d1 - d2).max())
  agree = float((s1 == s2).mean())
  od1, ol1, os1 = jax.jit(lambda: pr.observe_scan(
      params, stoch0, deter0, actions, embeds, isf, 0, sample=False))()
  od2, ol2, os2 = jax.jit(lambda: pr.observe_pallas(
      params, stoch0, deter0, actions, embeds, isf, 0, sample=False,
      interpret=not on_tpu))()
  out = {
      'imagine_deter_maxdiff': dmax, 'imagine_stoch_agree': agree,
      'observe_deter_maxdiff': float(jnp.abs(od1 - od2).max()),
      'observe_stoch_agree': float((os1 == os2).mean()),
  }
  if on_tpu:
    # Sampling sanity on the real chip (the kernel PRNG path does not run
    # in interpreter mode): every group must be exactly one-hot, steps
    # must differ, and the empirical class histogram must roughly track
    # the unimix-mixture probabilities.
    _, _, s3 = jax.jit(lambda: pr.imagine_pallas(
        params, stoch0, deter0, actions, 11, sample=True))()
    sums = s3.reshape(T, B, 32, 32).sum(-1)
    out['sample_onehot_ok'] = bool((sums == 1.0).all())
    out['sample_steps_differ'] = bool((s3[0] != s3[1]).any())
  return out


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--which', default='rssm',
                      choices=['rssm', 'returns', 'all'])
  parser.add_argument('--out', default='')
  args = parser.parse_args()
  import jax
  result = {'backend': str(jax.devices()[0])}

  if args.which in ('rssm', 'all'):
    print('correctness (f32, sample=False):', flush=True)
    result['rssm_correctness'] = rssm_correctness()
    print(json.dumps(result['rssm_correctness']), flush=True)
    rows = []
    cases = [
        # (name, cell, B, T, D, U, S, C, A, E)
        ('a1', 'observe', 32, 32, 256, 256, 32, 32, 12, 512),
        ('a1', 'imagine', 1024, 15, 256, 256, 32, 32, 12, 512),
        ('xarm', 'observe', 32, 32, 512, 512, 32, 32, 5, 512),
        ('xarm', 'imagine', 1024, 15, 512, 512, 32, 32, 5, 512),
    ]
    for (name, cell, B, T, D, U, S, C, A, E) in cases:
      row = rssm_case(name, cell, B, T, D, U, S, C, A, E, 'bfloat16',
                      unrolls=(1, 2, 8))
      print('rssm', json.dumps(row), flush=True)
      rows.append(row)
    result['rssm_cells'] = rows

  if args.which in ('returns', 'all'):
    rows = []
    for horizon, lanes in [(15, 64), (15, 256), (15, 2048)]:
      row = returns_standalone(horizon, lanes)
      print('returns', json.dumps(row), flush=True)
      rows.append(row)
    result['lambda_returns_standalone'] = rows

  print(json.dumps(result))
  if args.out:
    pathlib.Path(args.out).write_text(json.dumps(result, indent=2))


if __name__ == '__main__':
  main()
