"""Pallas TPU kernels for the RSSM sequence cells (SURVEY §7 step 7).

The RSSM observe scan and the imagination rollout are the sequential hot
loops of the train step (reference: embodied/agents/dreamerv2plus/
nets.py:66-76,149-160 and agent.py:234-261). Under `lax.scan` XLA emits a
while-loop whose body re-streams every weight matrix from HBM on each of
the T (chunk) / H (imag_horizon) iterations. These kernels instead run the
WHOLE sequence inside one Pallas program with a grid over time: weight
blocks use a constant index map, so Mosaic keeps them resident in VMEM
across the sequential grid steps and the loop body pays only the
activation traffic.

Layout notes:
  - The recurrent carries (deter [B,D], stoch [B,S*C]) live in VMEM
    scratch, which persists across grid steps on TPU (sequential grid).
  - The stoch/action concat matmuls are expressed as split matmuls
    (stoch @ W_s + act @ W_a), keeping every contraction dimension a
    multiple of 128 regardless of the action width.
  - Categorical (gumbel-max) sampling uses the per-core PRNG
    (pltpu.prng_seed / prng_random_bits), reseeded per grid step from a
    scalar-prefetched seed so every step draws fresh bits.
  - Matmuls accumulate in f32 (preferred_element_type); layernorm runs in
    f32 like nn.layers.Norm (eps 1e-3); activations stay in the compute
    dtype between layers.

These kernels are FORWARD-ONLY and exist for the measured comparison
against `lax.scan(unroll=k)` in scripts/pallas_proof.py (PALLAS_PROOF.json
records the verdict). Only a kernel that beats the scan end-to-end earns a
custom-VJP production path; see the module docstring of
ops/lambda_returns.py for the same rule applied to the λ-return kernel.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32


# ---------------------------------------------------------------------------
# Shared cell math (plain jnp, usable both inside kernels and in the
# lax.scan reference implementation so the comparison is like-for-like).
# ---------------------------------------------------------------------------


def _elu(x):
  """ELU without expm1 (unimplemented in Mosaic lowering); used by both
  the kernels and the scan reference so the math is identical."""
  xf = x.astype(f32)
  return jnp.where(xf > 0, xf, jnp.exp(xf) - 1.0).astype(x.dtype)


def _layernorm(x, scale, bias, eps=1e-3):
  dtype = x.dtype
  x = x.astype(f32)
  mean = x.mean(-1, keepdims=True)
  var = ((x - mean) ** 2).mean(-1, keepdims=True)
  x = (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
  return x.astype(dtype)


def _linear_ln_elu(x, w, scale, bias):
  y = jnp.dot(x, w, preferred_element_type=f32).astype(x.dtype)
  return _elu(_layernorm(y, scale, bias))


def _gru_core(deter, x, params):
  """Custom GRU with update-1 bias (models/nets.py:171-187), split matmul."""
  g = (jnp.dot(deter, params['w_gru_d'], preferred_element_type=f32)
       + jnp.dot(x, params['w_gru_x'], preferred_element_type=f32))
  g = _layernorm(g.astype(x.dtype), params['ln_gru_scale'],
                 params['ln_gru_bias'])
  reset, cand, update = jnp.split(g, 3, -1)
  reset = jax.nn.sigmoid(f32(reset))
  cand = jnp.tanh(reset * f32(cand))
  update = jax.nn.sigmoid(f32(update) - 1)
  deter = update * cand + (1 - update) * f32(deter)
  return deter.astype(x.dtype)


def _img_cell(stoch, deter, action, params, unimix):
  """One img_step: returns (deter', logit_f32) (models/nets.py:142-161)."""
  x = (jnp.dot(stoch, params['w_in_s'], preferred_element_type=f32)
       + jnp.dot(action, params['w_in_a'], preferred_element_type=f32))
  x = _elu(_layernorm(
      x.astype(stoch.dtype), params['ln_in_scale'], params['ln_in_bias']))
  deter = _gru_core(deter, x, params)
  h = deter
  for i in range(len(params['w_out'])):
    h = _linear_ln_elu(h, params['w_out'][i], params['ln_out_scale'][i],
                       params['ln_out_bias'][i])
  logit = jnp.dot(h, params['w_st'], preferred_element_type=f32)
  logit = logit + params['b_st'].astype(f32)
  return deter, logit


def _unimix_logits(logit, stoch_n, classes, unimix):
  """[B, S*C] f32 logits -> unimix log-probs, as [B, S, C]."""
  z = logit.reshape(logit.shape[0], stoch_n, classes)
  probs = jax.nn.softmax(z, -1)
  if unimix:
    probs = (1 - unimix) * probs + unimix / classes
  return jnp.log(probs)


def _onehot_from_scores(scores):
  """Hard one-hot of the argmax over the last axis (ties impossible with
  continuous gumbel noise)."""
  top = jnp.max(scores, -1, keepdims=True)
  return (scores >= top).astype(scores.dtype)


def _seg_max(x, classes, roll):
  """Max within each contiguous group of `classes` lanes of a [B, S*C]
  array, broadcast back to every lane of the group — butterfly of
  doubling circular rolls with group-boundary masks. Avoids the 2D->3D
  reshape that Mosaic cannot lower (`unsupported shape cast`)."""
  n = x.shape[-1]
  pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
  pos = pos % classes
  neg = jnp.float32(-1e30)
  shift = 1
  while shift < classes:
    fwd = roll(x, shift)       # lane i reads lane i-shift
    bwd = roll(x, n - shift)   # lane i reads lane i+shift (circular)
    x = jnp.maximum(x, jnp.where(pos >= shift, fwd, neg))
    x = jnp.maximum(x, jnp.where(pos < classes - shift, bwd, neg))
    shift *= 2
  return x


def _kernel_sample_onehot(z, classes, unimix, sample, roll):
  """One-hot categorical sample per group of `classes` lanes from raw
  logits z [B, S*C] f32, matching the unimix-mixture distribution of
  nn.dists.OneHotDist(log((1-u)*softmax(z) + u/C)) WITHOUT computing the
  softmax: gumbel-max is shift-invariant on unnormalized logits, and the
  unimix term is realized as its literal mixture — with probability u the
  group resamples uniformly (gumbel-max over constant logits). The
  deterministic mode is argmax(z), identical to argmax of the mixed
  log-probs because the mixing is strictly monotone in the probabilities.
  `classes` must be a power of two (production uses 32)."""
  assert classes & (classes - 1) == 0, classes
  if not sample:
    return (z >= _seg_max(z, classes, roll)).astype(z.dtype)
  pos = jax.lax.broadcasted_iota(jnp.int32, z.shape, len(z.shape) - 1)
  pos = pos % classes
  def uniform01():
    # Mosaic has no uint32->f32 convert; build the uniform by bit tricks:
    # 23 random mantissa bits under exponent 0 give [1, 2), minus 1.
    bits = pltpu.bitcast(pltpu.prng_random_bits(z.shape), jnp.uint32)
    mant = (bits >> 9) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant, f32) - 1.0
  gumbel = -jnp.log(-jnp.log(uniform01()))
  scores = z + gumbel
  if unimix:
    # One uniform per group (lane 0's draw broadcast via segmented max).
    r = jnp.where(pos == 0, uniform01(), -1.0)
    r = _seg_max(r, classes, roll)
    # Uniform class pick == gumbel-max over constant logits.
    g2 = -jnp.log(-jnp.log(uniform01()))
    scores = jnp.where(r < unimix, g2, scores)
  return (scores >= _seg_max(scores, classes, roll)).astype(z.dtype)


# ---------------------------------------------------------------------------
# Reference implementation: the same cell as a lax.scan (what XLA runs
# today inside the train step), parameterized by unroll.
# ---------------------------------------------------------------------------


def imagine_scan(params, stoch0, deter0, actions, seed, unimix=0.01,
                 sample=True, unroll=1):
  """H-step imagination rollout via lax.scan. actions: [H, B, A]."""
  stoch_n = params['stoch_n']
  classes = params['classes']

  def step(carry, inp):
    stoch, deter, key = carry
    action = inp
    deter, logit = _img_cell(stoch, deter, action, params, unimix)
    logp = _unimix_logits(logit, stoch_n, classes, unimix)
    key, sub = jax.random.split(key)
    if sample:
      g = jax.random.gumbel(sub, logp.shape, f32)
      onehot = _onehot_from_scores(logp + g)
    else:
      onehot = _onehot_from_scores(logp)
    stoch = onehot.reshape(onehot.shape[0], -1).astype(stoch.dtype)
    return (stoch, deter, key), (deter, logit, stoch)

  key = jax.random.PRNGKey(seed)
  (_, _, _), (deters, logits, stochs) = jax.lax.scan(
      step, (stoch0, deter0, key), actions, unroll=unroll)
  return deters, logits, stochs


# ---------------------------------------------------------------------------
# Pallas kernel: whole-rollout imagination with VMEM-resident weights.
# ---------------------------------------------------------------------------


def _imagine_kernel(unimix, stoch_n, classes, n_out, sample, interpret,
                    seed_ref, action_ref, *refs):
  (w_in_s, w_in_a, ln_in_s, ln_in_b, w_gru_d, w_gru_x, ln_gru_s,
   ln_gru_b) = refs[:8]
  outw = refs[8:8 + n_out]
  outs = refs[8 + n_out:8 + 2 * n_out]
  outb = refs[8 + 2 * n_out:8 + 3 * n_out]
  (w_st, b_st, stoch0_ref, deter0_ref,
   deter_out, logit_out, stoch_out,
   stoch_c, deter_c) = refs[8 + 3 * n_out:]

  t = pl.program_id(0)
  b = pl.program_id(1)
  if sample:
    pltpu.prng_seed(seed_ref[0] + t * pl.num_programs(1) + b)
  blk = action_ref.shape[1]
  rows = pl.ds(b * blk, blk)

  @pl.when(t == 0)
  def _():
    stoch_c[rows] = stoch0_ref[rows]
    deter_c[rows] = deter0_ref[rows]

  params = {
      'w_in_s': w_in_s[:], 'w_in_a': w_in_a[:],
      'ln_in_scale': ln_in_s[0, :], 'ln_in_bias': ln_in_b[0, :],
      'w_gru_d': w_gru_d[:], 'w_gru_x': w_gru_x[:],
      'ln_gru_scale': ln_gru_s[0, :], 'ln_gru_bias': ln_gru_b[0, :],
      'w_out': [w[:] for w in outw],
      'ln_out_scale': [s[0, :] for s in outs],
      'ln_out_bias': [b[0, :] for b in outb],
      'w_st': w_st[:], 'b_st': b_st[0, :],
  }
  stoch, deter = stoch_c[rows], deter_c[rows]
  action = action_ref[0]
  deter, logit = _img_cell(stoch, deter, action, params, unimix)
  roll = ((lambda a, k: jnp.roll(a, k, axis=-1)) if interpret else
          (lambda a, k: pltpu.roll(a, shift=k, axis=len(a.shape) - 1)))
  onehot = _kernel_sample_onehot(logit, classes, unimix, sample, roll)
  stoch = onehot.astype(stoch.dtype)

  deter_out[0] = deter
  logit_out[0] = logit.reshape(logit.shape[0], -1).astype(jnp.float32)
  stoch_out[0] = stoch
  stoch_c[rows] = stoch
  deter_c[rows] = deter


def _auto_block_rows(B, D, U, SC, A, weights_bytes, budget=12 * 2**20):
  """Largest row block whose estimated VMEM working set fits the budget
  (the Mosaic scoped-VMEM limit is 16MB; leave headroom for spills)."""
  itemsize = 2  # bf16 activations; logits are f32 (x2 below).
  carries = B * (SC + D) * itemsize
  for blk in (512, 256, 128, 64, 32, 16, 8):
    if blk > B:
      continue
    stepped = 2 * blk * (A + D + SC + 2 * SC) * itemsize  # double-buffered
    live = blk * (3 * D + 2 * U + 2 * SC) * 4              # f32 temps
    if weights_bytes + carries + stepped + live <= budget:
      return blk
  return 8


def imagine_pallas(params, stoch0, deter0, actions, seed, unimix=0.01,
                   sample=True, interpret=False, block_rows=None):
  """H-step imagination rollout as ONE Pallas program.

  Grid is (time, row-blocks): row blocks bound the per-step VMEM working
  set (imagination runs on B*T flattened lanes, e.g. 1024 — the full
  per-step activations plus double-buffered outputs would blow the 16 MB
  scoped VMEM limit), while the full-size recurrent carries persist in
  VMEM scratch across the sequential grid and each block updates its own
  row slice.

  params: dict with w_in_s [S*C,U], w_in_a [A,U], ln_in_* [U],
  w_gru_d [D,3D], w_gru_x [U,3D], ln_gru_* [3D], w_out (list of [.,U]),
  ln_out_* (lists of [U]), w_st [U,S*C], b_st [S*C], stoch_n, classes.
  actions: [H, B, A]. Returns (deters [H,B,D], logits [H,B,S*C] f32,
  stochs [H,B,S*C]).
  """
  H, B, A = actions.shape
  D = params['w_gru_d'].shape[0]
  SC = params['w_st'].shape[1]
  n_out = len(params['w_out'])
  dtype = stoch0.dtype
  if block_rows is None:
    U = params['w_in_s'].shape[1]
    weights_bytes = sum(
        int(np.prod(w.shape)) * w.dtype.itemsize
        for w in (params['w_in_s'], params['w_in_a'], params['w_gru_d'],
                  params['w_gru_x'], params['w_st'], *params['w_out']))
    block_rows = _auto_block_rows(B, D, U, SC, A, weights_bytes)
  blk = min(block_rows, B)
  while B % blk:
    blk -= 1  # Largest divisor of B within the VMEM budget.
  nb = B // blk

  row = lambda v: v.reshape(1, -1)
  weights = [
      params['w_in_s'], params['w_in_a'],
      row(params['ln_in_scale']), row(params['ln_in_bias']),
      params['w_gru_d'], params['w_gru_x'],
      row(params['ln_gru_scale']), row(params['ln_gru_bias']),
      *params['w_out'],
      *[row(s) for s in params['ln_out_scale']],
      *[row(b) for b in params['ln_out_bias']],
      params['w_st'], row(params['b_st']),
  ]

  # Index maps receive (t, b, *scalar_prefetch_refs) under
  # PrefetchScalarGridSpec; the seed ref is unused for indexing.
  const = lambda shape: pl.BlockSpec(
      shape, lambda t, b, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
  stepped = lambda shape: pl.BlockSpec(
      (1, blk) + shape, lambda t, b, *_: (t, b) + (0,) * len(shape),
      memory_space=pltpu.VMEM)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(H, nb),
      in_specs=[
          stepped((A,)),
          *[const(w.shape) for w in weights],
          const((B, SC)),
          const((B, D)),
      ],
      out_specs=[
          stepped((D,)),
          stepped((SC,)),
          stepped((SC,)),
      ],
      scratch_shapes=[
          pltpu.VMEM((B, SC), dtype),
          pltpu.VMEM((B, D), dtype),
      ],
  )
  kernel = functools.partial(
      _imagine_kernel, unimix, params['stoch_n'], params['classes'],
      n_out, sample, interpret)
  deters, logits, stochs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((H, B, D), dtype),
          jax.ShapeDtypeStruct((H, B, SC), jnp.float32),
          jax.ShapeDtypeStruct((H, B, SC), dtype),
      ],
      interpret=interpret,
  )(jnp.asarray([seed], jnp.int32), actions, *weights, stoch0, deter0)
  return deters, logits, stochs


# ---------------------------------------------------------------------------
# Policy-in-the-loop imagination: img_step + actor MLP + action sampling
# fused over the horizon (the training-path rollout of
# ImagActorCritic.train, reference: agent.py:234-261 + 295-300). The
# reinforce path stop-gradients the whole trajectory, so this chain is
# forward-only by construction — no VJP needed.
# ---------------------------------------------------------------------------


def _actor_cell(stoch, deter, actor):
  """Actor MLP on one latent state: returns raw action logits [B, A] f32.

  Mirrors nets.MLP(inputs=[deter, stoch]) + DistLayer('onehot'): the
  concat input is realized as a split matmul, hidden layers are
  Linear+LayerNorm+ELU (no bias under norm), the head is a plain
  biased Linear."""
  x = (jnp.dot(deter, actor['w_d'], preferred_element_type=f32)
       + jnp.dot(stoch, actor['w_s'], preferred_element_type=f32))
  x = _elu(_layernorm(
      x.astype(stoch.dtype), actor['ln_scale'][0], actor['ln_bias'][0]))
  for i, w in enumerate(actor['w_h']):
    x = _linear_ln_elu(
        x, w, actor['ln_scale'][i + 1], actor['ln_bias'][i + 1])
  logits = jnp.dot(x, actor['w_out'], preferred_element_type=f32)
  return logits + actor['b_out'].astype(f32)


def imagine_actor_scan(params, actor, stoch0, deter0, action0, horizon,
                       seed, unimix=0.01, act_unimix=0.01, sample=True,
                       unroll=1):
  """H-step policy-in-the-loop rollout via lax.scan (the XLA baseline).

  Step t consumes (state_t, action_t) and emits (state_{t+1},
  action_{t+1} = sample(actor(state_{t+1}))). Returns deters [H,B,D],
  prior logits [H,B,S*C] f32, stochs [H,B,S*C], actions [H,B,A]."""
  stoch_n, classes = params['stoch_n'], params['classes']

  def step(carry, _):
    stoch, deter, action, key = carry
    deter, logit = _img_cell(stoch, deter, action, params, unimix)
    logp = _unimix_logits(logit, stoch_n, classes, unimix)
    key, k1, k2 = jax.random.split(key, 3)
    if sample:
      g = jax.random.gumbel(k1, logp.shape, f32)
      onehot = _onehot_from_scores(logp + g)
    else:
      onehot = _onehot_from_scores(logp)
    stoch = onehot.reshape(onehot.shape[0], -1).astype(stoch.dtype)
    alogit = _actor_cell(stoch, deter, actor)
    if act_unimix:
      probs = jax.nn.softmax(alogit, -1)
      alogit = jnp.log((1 - act_unimix) * probs
                       + act_unimix / alogit.shape[-1])
    if sample:
      g = jax.random.gumbel(k2, alogit.shape, f32)
      action = _onehot_from_scores(alogit + g)
    else:
      action = _onehot_from_scores(alogit)
    action = action.astype(action0.dtype)
    return (stoch, deter, action, key), (deter, logit, stoch, action)

  key = jax.random.PRNGKey(seed)
  _, (deters, logits, stochs, actions) = jax.lax.scan(
      step, (stoch0, deter0, action0, key), jnp.arange(horizon),
      unroll=unroll)
  return deters, logits, stochs, actions


def _imagine_actor_kernel(unimix, act_unimix, stoch_n, classes, n_out,
                          n_act, sample, interpret, seed_ref, *refs):
  if interpret and sample:
    # Interpreter mode (CPU tests) has no pltpu PRNG lowering: gumbel
    # noise arrives as inputs, generated with jax.random in the wrapper.
    # On TPU the kernel draws from the per-core PRNG instead, avoiding
    # H*B*S*C of HBM noise traffic per rollout.
    g_s_ref, g_a_ref = refs[:2]
    refs = refs[2:]
  (w_in_s, w_in_a, ln_in_s, ln_in_b, w_gru_d, w_gru_x, ln_gru_s,
   ln_gru_b) = refs[:8]
  refs = refs[8:]
  outw, refs = refs[:n_out], refs[n_out:]
  outs, refs = refs[:n_out], refs[n_out:]
  outb, refs = refs[:n_out], refs[n_out:]
  w_st, b_st, a_w_d, a_w_s = refs[:4]
  refs = refs[4:]
  a_wh, refs = refs[:n_act - 1], refs[n_act - 1:]
  a_lns, refs = refs[:n_act], refs[n_act:]
  a_lnb, refs = refs[:n_act], refs[n_act:]
  (a_w_out, a_b_out, stoch0_ref, deter0_ref, action0_ref,
   deter_out, logit_out, stoch_out, action_out,
   stoch_c, deter_c, act_c) = refs

  t = pl.program_id(0)
  b = pl.program_id(1)
  if sample and not interpret:
    pltpu.prng_seed(seed_ref[0] + t * pl.num_programs(1) + b)
  blk = stoch_out.shape[1]
  rows = pl.ds(b * blk, blk)

  @pl.when(t == 0)
  def _():
    stoch_c[rows] = stoch0_ref[rows]
    deter_c[rows] = deter0_ref[rows]
    act_c[rows] = action0_ref[rows]

  params = {
      'w_in_s': w_in_s[:], 'w_in_a': w_in_a[:],
      'ln_in_scale': ln_in_s[0, :], 'ln_in_bias': ln_in_b[0, :],
      'w_gru_d': w_gru_d[:], 'w_gru_x': w_gru_x[:],
      'ln_gru_scale': ln_gru_s[0, :], 'ln_gru_bias': ln_gru_b[0, :],
      'w_out': [w[:] for w in outw],
      'ln_out_scale': [s[0, :] for s in outs],
      'ln_out_bias': [b_[0, :] for b_ in outb],
      'w_st': w_st[:], 'b_st': b_st[0, :],
  }
  actor = {
      'w_d': a_w_d[:], 'w_s': a_w_s[:],
      'w_h': [w[:] for w in a_wh],
      'ln_scale': [s[0, :] for s in a_lns],
      'ln_bias': [b_[0, :] for b_ in a_lnb],
      'w_out': a_w_out[:], 'b_out': a_b_out[0, :],
  }
  stoch, deter, action = stoch_c[rows], deter_c[rows], act_c[rows]
  deter, logit = _img_cell(stoch, deter, action, params, unimix)
  roll = ((lambda a, k: jnp.roll(a, k, axis=-1)) if interpret else
          (lambda a, k: pltpu.roll(a, shift=k, axis=len(a.shape) - 1)))
  if interpret and sample:
    # Plain-jax sampling on the unimix log-probs with input gumbels.
    probs = jax.nn.softmax(
        logit.reshape(logit.shape[0], stoch_n, classes), -1)
    if unimix:
      probs = (1 - unimix) * probs + unimix / classes
    scores = jnp.log(probs).reshape(logit.shape) + g_s_ref[0]
    onehot = (scores >= _seg_max(scores, classes, roll)).astype(logit.dtype)
  else:
    onehot = _kernel_sample_onehot(logit, classes, unimix, sample, roll)
  stoch = onehot.astype(stoch_c.dtype)

  alogit = _actor_cell(stoch, deter, actor)
  if act_unimix:
    probs = jax.nn.softmax(alogit, -1)
    alogit = jnp.log((1 - act_unimix) * probs
                     + act_unimix / alogit.shape[-1])

  # alogit already holds the unimix-mixed log-probs, so gumbel-max over
  # it realizes the mixture exactly — no resampling branch needed.
  if interpret and sample:
    action = _onehot_from_scores(alogit + g_a_ref[0])
  elif sample:
    # [0, 1) from 23 random mantissa bits (Mosaic has no uint32->f32).
    bits = pltpu.bitcast(pltpu.prng_random_bits(alogit.shape), jnp.uint32)
    mant = (bits >> 9) | jnp.uint32(0x3F800000)
    u = pltpu.bitcast(mant, f32) - 1.0
    action = _onehot_from_scores(alogit - jnp.log(-jnp.log(u)))
  else:
    action = _onehot_from_scores(alogit)
  action = action.astype(act_c.dtype)

  deter_out[0] = deter
  logit_out[0] = logit.reshape(logit.shape[0], -1).astype(jnp.float32)
  stoch_out[0] = stoch
  action_out[0] = action
  stoch_c[rows] = stoch
  deter_c[rows] = deter
  act_c[rows] = action


def imagine_actor_pallas(params, actor, stoch0, deter0, action0, horizon,
                         seed, unimix=0.01, act_unimix=0.01, sample=True,
                         interpret=False, block_rows=None):
  """H-step policy-in-the-loop rollout as ONE Pallas program.

  Fuses the actor MLP and its categorical action sampling into the
  imagination chain, so the rollout's weights (RSSM cell + actor) stay
  VMEM-resident across the sequential horizon instead of re-streaming
  from HBM every step.

  actor: dict with w_d [D,U], w_s [S*C,U], w_h (list of [U,U]),
  ln_scale/ln_bias (lists of [U], one per dense layer), w_out [U,A],
  b_out [A]. Returns (deters [H,B,D], logits [H,B,S*C] f32,
  stochs [H,B,S*C], actions [H,B,A])."""
  B = stoch0.shape[0]
  A = action0.shape[-1]
  D = params['w_gru_d'].shape[0]
  SC = params['w_st'].shape[1]
  n_out = len(params['w_out'])
  n_act = len(actor['ln_scale'])
  assert len(actor['w_h']) == n_act - 1
  dtype = stoch0.dtype
  if block_rows is None:
    U = params['w_in_s'].shape[1]
    weights_bytes = sum(
        int(np.prod(w.shape)) * w.dtype.itemsize
        for w in (params['w_in_s'], params['w_in_a'], params['w_gru_d'],
                  params['w_gru_x'], params['w_st'], *params['w_out'],
                  actor['w_d'], actor['w_s'], *actor['w_h'],
                  actor['w_out']))
    block_rows = _auto_block_rows(B, D, U, SC, A, weights_bytes)
  blk = min(block_rows, B)
  while B % blk:
    blk -= 1  # Largest divisor of B within the VMEM budget.
  nb = B // blk

  row = lambda v: v.reshape(1, -1)
  weights = [
      params['w_in_s'], params['w_in_a'],
      row(params['ln_in_scale']), row(params['ln_in_bias']),
      params['w_gru_d'], params['w_gru_x'],
      row(params['ln_gru_scale']), row(params['ln_gru_bias']),
      *params['w_out'],
      *[row(s) for s in params['ln_out_scale']],
      *[row(b) for b in params['ln_out_bias']],
      params['w_st'], row(params['b_st']),
      actor['w_d'], actor['w_s'],
      *actor['w_h'],
      *[row(s) for s in actor['ln_scale']],
      *[row(b) for b in actor['ln_bias']],
      actor['w_out'], row(actor['b_out']),
  ]

  const = lambda shape: pl.BlockSpec(
      shape, lambda t, b, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
  stepped = lambda shape: pl.BlockSpec(
      (1, blk) + shape, lambda t, b, *_: (t, b) + (0,) * len(shape),
      memory_space=pltpu.VMEM)

  noise = []
  noise_specs = []
  if interpret and sample:
    # Interpreter mode (tests): gumbel noise as inputs; see the kernel.
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    noise = [jax.random.gumbel(k1, (horizon, B, SC), f32),
             jax.random.gumbel(k2, (horizon, B, A), f32)]
    noise_specs = [stepped((SC,)), stepped((A,))]

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(horizon, nb),
      in_specs=[
          *noise_specs,
          *[const(w.shape) for w in weights],
          const((B, SC)),
          const((B, D)),
          const((B, A)),
      ],
      out_specs=[
          stepped((D,)),
          stepped((SC,)),
          stepped((SC,)),
          stepped((A,)),
      ],
      scratch_shapes=[
          pltpu.VMEM((B, SC), dtype),
          pltpu.VMEM((B, D), dtype),
          pltpu.VMEM((B, A), dtype),
      ],
  )
  kernel = functools.partial(
      _imagine_actor_kernel, unimix, act_unimix, params['stoch_n'],
      params['classes'], n_out, n_act, sample, interpret)
  deters, logits, stochs, actions = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((horizon, B, D), dtype),
          jax.ShapeDtypeStruct((horizon, B, SC), jnp.float32),
          jax.ShapeDtypeStruct((horizon, B, SC), dtype),
          jax.ShapeDtypeStruct((horizon, B, A), dtype),
      ],
      interpret=interpret,
  )(jnp.asarray([seed], jnp.int32), *noise, *weights, stoch0, deter0,
    action0.astype(dtype))
  return deters, logits, stochs, actions


# ---------------------------------------------------------------------------
# Observe (posterior) sequence: obs_step chain over the chunk.
# ---------------------------------------------------------------------------


def observe_scan(params, stoch0, deter0, actions, embeds, is_first, seed,
                 unimix=0.01, sample=True, unroll=1):
  """T-step posterior scan via lax.scan (models/nets.py:87-98,120-140).

  actions [T,B,A], embeds [T,B,E], is_first [T,B]. Returns post logits,
  deters, stochs (prior stats omitted: the standalone comparison times the
  recurrent chain; prior logits come for free in both impls)."""
  stoch_n, classes = params['stoch_n'], params['classes']

  def step(carry, inp):
    stoch, deter, key = carry
    action, embed, first = inp
    keep = (1.0 - first.astype(f32))[:, None]
    stoch = (stoch.astype(f32) * keep).astype(stoch.dtype)
    deter = (deter.astype(f32) * keep).astype(deter.dtype)
    action = (action.astype(f32) * keep[:, :1]).astype(action.dtype)
    deter2, _ = _img_cell(stoch, deter, action, params, unimix)
    x = (jnp.dot(deter2, params['w_obs_d'], preferred_element_type=f32)
         + jnp.dot(embed, params['w_obs_e'], preferred_element_type=f32))
    x = _elu(_layernorm(
        x.astype(stoch.dtype), params['ln_obs_scale'],
        params['ln_obs_bias']))
    logit = jnp.dot(x, params['w_post'], preferred_element_type=f32)
    logit = logit + params['b_post'].astype(f32)
    logp = _unimix_logits(logit, stoch_n, classes, unimix)
    key, sub = jax.random.split(key)
    if sample:
      g = jax.random.gumbel(sub, logp.shape, f32)
      onehot = _onehot_from_scores(logp + g)
    else:
      onehot = _onehot_from_scores(logp)
    stoch = onehot.reshape(onehot.shape[0], -1).astype(stoch.dtype)
    return (stoch, deter2, key), (deter2, logit, stoch)

  key = jax.random.PRNGKey(seed)
  actions = (actions.astype(f32)
             * (1.0 - is_first.astype(f32))[..., None]).astype(actions.dtype)
  _, (deters, logits, stochs) = jax.lax.scan(
      step, (stoch0, deter0, key), (actions, embeds, is_first),
      unroll=unroll)
  return deters, logits, stochs


def _observe_kernel(unimix, stoch_n, classes, n_out, sample, interpret,
                    seed_ref, action_ref, embed_ref, first_ref, *refs):
  (w_in_s, w_in_a, ln_in_s, ln_in_b, w_gru_d, w_gru_x, ln_gru_s,
   ln_gru_b) = refs[:8]
  outw = refs[8:8 + n_out]
  outs = refs[8 + n_out:8 + 2 * n_out]
  outb = refs[8 + 2 * n_out:8 + 3 * n_out]
  (w_st, b_st, w_obs_d, w_obs_e, ln_obs_s, ln_obs_b, w_post, b_post,
   stoch0_ref, deter0_ref,
   deter_out, logit_out, stoch_out,
   stoch_c, deter_c) = refs[8 + 3 * n_out:]

  t = pl.program_id(0)
  if sample:
    pltpu.prng_seed(seed_ref[0] + t)

  @pl.when(t == 0)
  def _():
    stoch_c[:] = stoch0_ref[:]
    deter_c[:] = deter0_ref[:]

  params = {
      'w_in_s': w_in_s[:], 'w_in_a': w_in_a[:],
      'ln_in_scale': ln_in_s[0, :], 'ln_in_bias': ln_in_b[0, :],
      'w_gru_d': w_gru_d[:], 'w_gru_x': w_gru_x[:],
      'ln_gru_scale': ln_gru_s[0, :], 'ln_gru_bias': ln_gru_b[0, :],
      'w_out': [w[:] for w in outw],
      'ln_out_scale': [s[0, :] for s in outs],
      'ln_out_bias': [b[0, :] for b in outb],
      'w_st': w_st[:], 'b_st': b_st[0, :],
  }
  # is_first arrives as [1, B, 1] (scalar blocks are not lowerable).
  keep = 1.0 - first_ref[0].astype(f32)
  stoch = (stoch_c[:].astype(f32) * keep).astype(stoch_c.dtype)
  deter = (deter_c[:].astype(f32) * keep).astype(deter_c.dtype)
  action = (action_ref[0].astype(f32) * keep[:, :1]).astype(
      action_ref.dtype)
  deter, _ = _img_cell(stoch, deter, action, params, unimix)
  embed = embed_ref[0]
  x = (jnp.dot(deter, w_obs_d[:], preferred_element_type=f32)
       + jnp.dot(embed, w_obs_e[:], preferred_element_type=f32))
  x = _elu(_layernorm(
      x.astype(stoch.dtype), ln_obs_s[0, :], ln_obs_b[0, :]))
  logit = jnp.dot(x, w_post[:], preferred_element_type=f32)
  logit = logit + b_post[0, :].astype(f32)
  roll = ((lambda a, k: jnp.roll(a, k, axis=-1)) if interpret else
          (lambda a, k: pltpu.roll(a, shift=k, axis=len(a.shape) - 1)))
  onehot = _kernel_sample_onehot(logit, classes, unimix, sample, roll)
  stoch = onehot.astype(stoch_c.dtype)

  deter_out[0] = deter
  logit_out[0] = logit.reshape(logit.shape[0], -1).astype(jnp.float32)
  stoch_out[0] = stoch
  stoch_c[:] = stoch
  deter_c[:] = deter


def observe_pallas(params, stoch0, deter0, actions, embeds, is_first, seed,
                   unimix=0.01, sample=True, interpret=False):
  """T-step posterior chain as ONE Pallas program (grid over time)."""
  T, B, A = actions.shape
  E = embeds.shape[-1]
  D = params['w_gru_d'].shape[0]
  SC = params['w_st'].shape[1]
  n_out = len(params['w_out'])
  dtype = stoch0.dtype

  row = lambda v: v.reshape(1, -1)
  weights = [
      params['w_in_s'], params['w_in_a'],
      row(params['ln_in_scale']), row(params['ln_in_bias']),
      params['w_gru_d'], params['w_gru_x'],
      row(params['ln_gru_scale']), row(params['ln_gru_bias']),
      *params['w_out'],
      *[row(s) for s in params['ln_out_scale']],
      *[row(b) for b in params['ln_out_bias']],
      params['w_st'], row(params['b_st']),
      params['w_obs_d'], params['w_obs_e'],
      row(params['ln_obs_scale']), row(params['ln_obs_bias']),
      params['w_post'], row(params['b_post']),
  ]

  # Index maps receive (t, *scalar_prefetch_refs) under
  # PrefetchScalarGridSpec; the seed ref is unused for indexing.
  const = lambda shape: pl.BlockSpec(
      shape, lambda t, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
  stepped = lambda shape: pl.BlockSpec(
      (1,) + shape, lambda t, *_: (t,) + (0,) * len(shape),
      memory_space=pltpu.VMEM)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(T,),
      in_specs=[
          stepped((B, A)),
          stepped((B, E)),
          stepped((B, 1)),
          *[const(w.shape) for w in weights],
          const((B, SC)),
          const((B, D)),
      ],
      out_specs=[
          stepped((B, D)),
          stepped((B, SC)),
          stepped((B, SC)),
      ],
      scratch_shapes=[
          pltpu.VMEM((B, SC), dtype),
          pltpu.VMEM((B, D), dtype),
      ],
  )
  kernel = functools.partial(
      _observe_kernel, unimix, params['stoch_n'], params['classes'],
      n_out, sample, interpret)
  deters, logits, stochs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((T, B, D), dtype),
          jax.ShapeDtypeStruct((T, B, SC), jnp.float32),
          jax.ShapeDtypeStruct((T, B, SC), dtype),
      ],
      interpret=interpret,
  )(jnp.asarray([seed], jnp.int32), actions, embeds,
    is_first.reshape(T, B, 1), *weights, stoch0, deter0)
  return deters, logits, stochs


# ---------------------------------------------------------------------------
# Parameter factory for tests / the proof harness.
# ---------------------------------------------------------------------------


def make_actor_params(key, deter, units, stoch, classes, action_dim,
                      layers=4, dtype=jnp.float32):
  """Random actor-MLP parameters in the production layout (nets.MLP with
  inputs [deter, stoch] + DistLayer onehot)."""
  SC = stoch * classes
  keys = iter(jax.random.split(key, 4 + 2 * layers))
  uni = lambda shape: jax.random.uniform(
      next(keys), shape, f32,
      -np.sqrt(3.0 / np.mean(shape)), np.sqrt(3.0 / np.mean(shape))
  ).astype(dtype)
  return {
      'w_d': uni((deter, units)), 'w_s': uni((SC, units)),
      'w_h': [uni((units, units)) for _ in range(layers - 1)],
      'ln_scale': [jnp.ones((units,), f32) for _ in range(layers)],
      'ln_bias': [jnp.zeros((units,), f32) for _ in range(layers)],
      'w_out': uni((units, action_dim)),
      'b_out': jnp.zeros((action_dim,), f32),
  }


def make_params(key, deter, units, stoch, classes, action_dim, embed_dim,
                prior_layers=3, dtype=jnp.float32):
  """Random cell parameters in the production layout."""
  SC = stoch * classes
  keys = iter(jax.random.split(key, 32))
  uni = lambda shape: jax.random.uniform(
      next(keys), shape, f32,
      -np.sqrt(3.0 / np.mean(shape)), np.sqrt(3.0 / np.mean(shape))
  ).astype(dtype)
  ones = lambda n: jnp.ones((n,), f32)
  zeros = lambda n: jnp.zeros((n,), f32)
  w_out, so, bo = [], [], []
  for i in range(prior_layers):
    w_out.append(uni((deter if i == 0 else units, units)))
    so.append(ones(units))
    bo.append(zeros(units))
  return {
      'w_in_s': uni((SC, units)), 'w_in_a': uni((action_dim, units)),
      'ln_in_scale': ones(units), 'ln_in_bias': zeros(units),
      'w_gru_d': uni((deter, 3 * deter)), 'w_gru_x': uni((units, 3 * deter)),
      'ln_gru_scale': ones(3 * deter), 'ln_gru_bias': zeros(3 * deter),
      'w_out': w_out, 'ln_out_scale': so, 'ln_out_bias': bo,
      'w_st': uni((units, SC)), 'b_st': zeros(SC),
      'w_obs_d': uni((deter, units)), 'w_obs_e': uni((embed_dim, units)),
      'ln_obs_scale': ones(units), 'ln_obs_bias': zeros(units),
      'w_post': uni((units, SC)), 'b_post': zeros(SC),
      'stoch_n': stoch, 'classes': classes,
  }
