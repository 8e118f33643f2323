"""Differentiable fused RSSM observe chain: Pallas forward + backward.

PALLAS_PROOF.json shows the whole-sequence VMEM-resident forward beats the
best `lax.scan` unroll ~1.8x at the production shapes. This module makes
that win usable in TRAINING by giving the chain a custom VJP:

  - forward: the whole T-step posterior chain in one Pallas program
    (weights resident in VMEM across the sequential time grid), emitting
    the full production outputs (deter, post logits, prior logits, stoch
    samples with straight-through gradients).
  - backward: the sequential part of BPTT — the per-step activation
    adjoint chain — as a second Pallas program walking time in reverse
    with the (transposed) weights resident in VMEM. It emits the per-step
    pre-activation adjoints (dz1, dzg, dq_i, dz2, d post-logit) plus the
    input/initial-state gradients.
  - epilogue (plain XLA): all WEIGHT gradients are batched [T*B, .]
    matmuls over the emitted adjoints and (cheaply recomputed) layer
    inputs — large GEMMs the MXU runs at high efficiency, with no
    sequential dependence. This keeps the backward kernel's VMEM to
    weights + one step of activations (f32 weight-grad accumulators for
    the xarm shape alone would need ~18 MB and blow the 16 MB scoped
    limit).

Cell math matches models/nets.py obs_step/img_step (GRU with update-1
bias, LN(eps 1e-3) in f32, ELU, unimix posterior) with two documented
divergences, both gated behind the `rssm.impl` config:
  - RNG: samples come from the per-core TPU PRNG (gumbel-max with the
    unimix term realized as its literal mixture), not jax.random — the
    distribution is identical, the stream is not.
  - The prior's stoch sample (unused by the world-model loss, which only
    reads prior logits) is not drawn.

Gradient correctness is pinned against jax.grad of the pure-jnp scan
reference (`observe_scan_full`) in tests/test_pallas_rssm_vjp.py.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_rssm import _seg_max

f32 = jnp.float32


def _roll_for(interpret):
  if interpret:
    return lambda a, k: jnp.roll(a, k, axis=-1)
  return lambda a, k: pltpu.roll(a, shift=k, axis=len(a.shape) - 1)


def _seg_sum(x, classes, roll):
  """Sum within each contiguous group of `classes` lanes, broadcast back
  to every lane (suffix-scan by doubling shifts, then a masked max
  broadcast of the group-leader total)."""
  n = x.shape[-1]
  pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, len(x.shape) - 1)
  pos = pos % classes
  shift = 1
  while shift < classes:
    y = roll(x, n - shift)  # lane i reads lane i+shift (circular)
    x = x + jnp.where(pos < classes - shift, y, 0.0)
    shift *= 2
  total = jnp.where(pos == 0, x, -1e30)
  return _seg_max(total, classes, roll)


def _seg_softmax(z, classes, roll):
  m = _seg_max(z, classes, roll)
  e = jnp.exp(z - m)
  return e / _seg_sum(e, classes, roll)


def _ln_fwd(z, scale, bias, eps=1e-3):
  """Returns (out, xhat, inv_std) in f32 for reuse in the adjoint."""
  z = z.astype(f32)
  mean = z.mean(-1, keepdims=True)
  var = ((z - mean) ** 2).mean(-1, keepdims=True)
  inv = jax.lax.rsqrt(var + eps)
  xhat = (z - mean) * inv
  return xhat * scale + bias, xhat, inv


def _ln_bwd(dn, xhat, inv, scale):
  """dz given dn (grad at LN output), all f32."""
  dxhat = dn * scale
  return inv * (
      dxhat - dxhat.mean(-1, keepdims=True)
      - xhat * (dxhat * xhat).mean(-1, keepdims=True))


def _elu_grad(n):
  nf = n.astype(f32)
  return jnp.where(nf > 0, 1.0, jnp.exp(nf))


# ---------------------------------------------------------------------------
# Pure-jnp reference with full production outputs (for jax.grad checks and
# as the scan baseline of the fused comparison).
# ---------------------------------------------------------------------------


def observe_scan_full(params, stoch0, deter0, actions, embeds, is_first,
                      seed, unimix=0.01, sample=True, unroll=1):
  """T-step posterior chain emitting (deters, post_logits, prior_logits,
  stochs). stochs carry straight-through gradients via the unimix probs.
  """
  stoch_n, classes = params['stoch_n'], params['classes']
  SC = stoch_n * classes

  def step(carry, inp):
    stoch, deter, key = carry
    action, embed, first = inp
    keep = (1.0 - first.astype(f32))[:, None]
    s_m = stoch.astype(f32) * keep
    d_m = deter.astype(f32) * keep
    a_m = action.astype(f32) * keep[:, :1]
    z1 = s_m @ f32(params['w_in_s']) + a_m @ f32(params['w_in_a'])
    n1, _, _ = _ln_fwd(z1, f32(params['ln_in_scale']),
                       f32(params['ln_in_bias']))
    x1 = jnp.where(n1 > 0, n1, jnp.exp(n1) - 1.0)
    zg = d_m @ f32(params['w_gru_d']) + x1 @ f32(params['w_gru_x'])
    ng, _, _ = _ln_fwd(zg, f32(params['ln_gru_scale']),
                       f32(params['ln_gru_bias']))
    gr, gc, gu = jnp.split(ng, 3, -1)
    r = jax.nn.sigmoid(gr)
    c = jnp.tanh(r * gc)
    u = jax.nn.sigmoid(gu - 1)
    d_t = u * c + (1 - u) * d_m
    # Prior head (logits only; the WM loss reads no prior sample).
    p = d_t
    for i in range(len(params['w_out'])):
      q = p @ f32(params['w_out'][i])
      m, _, _ = _ln_fwd(q, f32(params['ln_out_scale'][i]),
                        f32(params['ln_out_bias'][i]))
      p = jnp.where(m > 0, m, jnp.exp(m) - 1.0)
    prior_logit = p @ f32(params['w_st']) + f32(params['b_st'])
    # Posterior head.
    z2 = d_t @ f32(params['w_obs_d']) + embed.astype(f32) @ f32(
        params['w_obs_e'])
    n2, _, _ = _ln_fwd(z2, f32(params['ln_obs_scale']),
                       f32(params['ln_obs_bias']))
    x2 = jnp.where(n2 > 0, n2, jnp.exp(n2) - 1.0)
    post_logit = x2 @ f32(params['w_post']) + f32(params['b_post'])
    # Unimix probs + straight-through sample.
    z = post_logit.reshape(-1, stoch_n, classes)
    probs = jax.nn.softmax(z, -1)
    if unimix:
      probs = (1 - unimix) * probs + unimix / classes
    key, sub = jax.random.split(key)
    if sample:
      g = jax.random.gumbel(sub, z.shape, f32)
      idx = jnp.argmax(jnp.log(probs) + g, -1)
    else:
      idx = jnp.argmax(probs, -1)
    onehot = jax.nn.one_hot(idx, classes, dtype=f32)
    st = jax.lax.stop_gradient(onehot) + probs - jax.lax.stop_gradient(
        probs)
    s_t = st.reshape(-1, SC)
    return ((s_t.astype(stoch.dtype), d_t.astype(deter.dtype), key),
            (d_t, post_logit, prior_logit, s_t))

  key = jax.random.PRNGKey(seed)
  _, (deters, post_logits, prior_logits, stochs) = jax.lax.scan(
      step, (stoch0, deter0, key), (actions, embeds, is_first),
      unroll=unroll)
  return deters, post_logits, prior_logits, stochs


# ---------------------------------------------------------------------------
# Forward kernel (full production outputs).
# ---------------------------------------------------------------------------

def _unpack(refs, n_out):
  (w_in_s, w_in_a, ln_in_s, ln_in_b, w_gru_d, w_gru_x, ln_gru_s,
   ln_gru_b) = refs[:8]
  outw = refs[8:8 + n_out]
  outs = refs[8 + n_out:8 + 2 * n_out]
  outb = refs[8 + 2 * n_out:8 + 3 * n_out]
  rest = refs[8 + 3 * n_out:]
  return dict(
      w_in_s=w_in_s, w_in_a=w_in_a, ln_in_s=ln_in_s, ln_in_b=ln_in_b,
      w_gru_d=w_gru_d, w_gru_x=w_gru_x, ln_gru_s=ln_gru_s,
      ln_gru_b=ln_gru_b, outw=outw, outs=outs, outb=outb), rest


def _cell_fwd(w, s_prev, d_prev, a, keep):
  """Recompute all forward intermediates of one step (f32). Returns a dict."""
  s_m = s_prev.astype(f32) * keep
  d_m = d_prev.astype(f32) * keep
  a_m = a.astype(f32) * keep[:, :1]
  z1 = (jnp.dot(s_m, f32(w['w_in_s'][:]), preferred_element_type=f32)
        + jnp.dot(a_m, f32(w['w_in_a'][:]), preferred_element_type=f32))
  n1, xh1, inv1 = _ln_fwd(z1, f32(w['ln_in_s'][0, :]),
                          f32(w['ln_in_b'][0, :]))
  x1 = jnp.where(n1 > 0, n1, jnp.exp(n1) - 1.0)
  zg = (jnp.dot(d_m, f32(w['w_gru_d'][:]), preferred_element_type=f32)
        + jnp.dot(x1, f32(w['w_gru_x'][:]), preferred_element_type=f32))
  ng, xhg, invg = _ln_fwd(zg, f32(w['ln_gru_s'][0, :]),
                          f32(w['ln_gru_b'][0, :]))
  gr, gc, gu = jnp.split(ng, 3, -1)
  r = jax.nn.sigmoid(gr)
  c = jnp.tanh(r * gc)
  u = jax.nn.sigmoid(gu - 1)
  d_t = u * c + (1 - u) * d_m
  ps = [d_t]
  lns = []
  for i in range(len(w['outw'])):
    q = jnp.dot(ps[-1], f32(w['outw'][i][:]), preferred_element_type=f32)
    m, xh, inv = _ln_fwd(q, f32(w['outs'][i][0, :]),
                         f32(w['outb'][i][0, :]))
    lns.append((m, xh, inv))
    ps.append(jnp.where(m > 0, m, jnp.exp(m) - 1.0))
  return dict(s_m=s_m, d_m=d_m, a_m=a_m, n1=n1, xh1=xh1, inv1=inv1,
              x1=x1, xhg=xhg, invg=invg, r=r, c=c, u=u, gc=gc, d_t=d_t,
              ps=ps, lns=lns)


def _post_fwd(w_obs_d, w_obs_e, ln_s, ln_b, w_post, b_post,
              d_t, e, unimix, classes, roll):
  z2 = (jnp.dot(d_t, f32(w_obs_d[:]), preferred_element_type=f32)
        + jnp.dot(e.astype(f32), f32(w_obs_e[:]),
                  preferred_element_type=f32))
  n2, xh2, inv2 = _ln_fwd(z2, f32(ln_s[0, :]), f32(ln_b[0, :]))
  x2 = jnp.where(n2 > 0, n2, jnp.exp(n2) - 1.0)
  post_logit = jnp.dot(x2, f32(w_post[:]), preferred_element_type=f32)
  post_logit = post_logit + f32(b_post[0, :])
  sm = _seg_softmax(post_logit, classes, roll)
  probs = (1 - unimix) * sm + unimix / classes if unimix else sm
  return dict(n2=n2, xh2=xh2, inv2=inv2, x2=x2,
              post_logit=post_logit, sm=sm, probs=probs)


def _obs_fwd_kernel(unimix, classes, n_out, sample, interpret,
                    action_ref, embed_ref, first_ref, gumbel_ref, *refs):
  w, rest = _unpack(refs, n_out)
  (w_st, b_st, w_obs_d, w_obs_e, ln_obs_s, ln_obs_b, w_post, b_post,
   stoch0_ref, deter0_ref,
   deter_out, post_out, prior_out, stoch_out,
   stoch_c, deter_c) = rest

  t = pl.program_id(0)
  roll = _roll_for(interpret)

  @pl.when(t == 0)
  def _():
    stoch_c[:] = stoch0_ref[:]
    deter_c[:] = deter0_ref[:]

  keep = 1.0 - first_ref[0].astype(f32)
  fw = _cell_fwd(w, stoch_c[:], deter_c[:], action_ref[0], keep)
  prior_logit = jnp.dot(fw['ps'][-1], f32(w_st[:]),
                        preferred_element_type=f32) + f32(b_st[0, :])
  po = _post_fwd(w_obs_d, w_obs_e, ln_obs_s, ln_obs_b, w_post, b_post,
                 fw['d_t'], embed_ref[0], unimix, classes, roll)
  z = po['post_logit']
  if sample:
    # Gumbel noise arrives as an input (generated with jax.random in the
    # wrapper): identical behavior on TPU and in interpreter tests, and
    # the HBM read is negligible next to the chain's compute.
    scores = jnp.log(po['probs']) + gumbel_ref[0].astype(f32)
  else:
    scores = po['probs']
  onehot = (scores >= _seg_max(scores, classes, roll)).astype(f32)

  dtype = stoch_c.dtype
  deter_out[0] = fw['d_t'].astype(dtype)
  post_out[0] = z
  prior_out[0] = prior_logit
  stoch_out[0] = onehot.astype(dtype)
  stoch_c[:] = onehot.astype(dtype)
  deter_c[:] = fw['d_t'].astype(dtype)


def _obs_bwd_kernel(unimix, classes, n_out, interpret,
                    s_prev_ref, d_prev_ref, action_ref, eproj_ref,
                    first_ref, post_logit_ref,
                    dd_out_ref, dpl_ref, dprl_ref, ds_out_ref, *refs):
  """Reverse-time activation adjoint chain. Grid step g visits t=T-1-g
  (the index maps reverse time); carries (ds, dd) persist in scratch.

  Emits per-step pre-activation adjoints (f32): for each LN layer both
  the post-LN-backward grad (dz*, the input to the layer-below weight
  grads) and the pre-LN-backward grad (dn*, for the LN scale/bias grads),
  plus the total posterior-logit grad. Weight gradients themselves are
  batched GEMMs in the epilogue."""
  w, rest = _unpack(refs, n_out)
  (w_st, w_obs_d, ln_obs_s, ln_obs_b, w_post,
   dz1_out, dn1_out, dzg_out, dng_out, dz2_out, dn2_out,
   *tail) = rest
  dq_outs = tail[:n_out]
  dm_outs = tail[n_out:2 * n_out]
  (dpl_tot_out, ds0_out, dd0_out, ds_c, dd_c) = tail[2 * n_out:]

  g = pl.program_id(0)
  last = pl.num_programs(0) - 1
  roll = _roll_for(interpret)

  @pl.when(g == 0)  # First grid step = LAST time step: zero the carries.
  def _():
    ds_c[:] = jnp.zeros_like(ds_c)
    dd_c[:] = jnp.zeros_like(dd_c)

  keep = 1.0 - first_ref[0].astype(f32)
  fw = _cell_fwd(w, s_prev_ref[0], d_prev_ref[0], action_ref[0], keep)

  ct = lambda a, m: jax.lax.dot_general(
      a, m[:], (((1,), (1,)), ((), ())), preferred_element_type=f32)

  # --- Posterior logit grad: direct + straight-through via probs --------
  ds_total = ds_out_ref[0].astype(f32) + ds_c[:]
  sm = _seg_softmax(post_logit_ref[0].astype(f32), classes, roll)
  dsm = (1.0 - unimix) * ds_total if unimix else ds_total
  dpl_st = sm * (dsm - _seg_sum(dsm * sm, classes, roll))
  dpl_total = dpl_ref[0].astype(f32) + dpl_st
  dpl_tot_out[0] = dpl_total

  # --- Posterior head adjoints ------------------------------------------
  z2 = (jnp.dot(fw['d_t'], f32(w_obs_d[:]), preferred_element_type=f32)
        + eproj_ref[0].astype(f32))
  n2, xh2, inv2 = _ln_fwd(z2, f32(ln_obs_s[0, :]), f32(ln_obs_b[0, :]))
  dx2 = ct(dpl_total, w_post)
  dn2 = dx2 * _elu_grad(n2)
  dz2 = _ln_bwd(dn2, xh2, inv2, f32(ln_obs_s[0, :]))
  dn2_out[0] = dn2
  dz2_out[0] = dz2
  dd_t = dd_out_ref[0].astype(f32) + dd_c[:] + ct(dz2, w_obs_d)

  # --- Prior head adjoints ----------------------------------------------
  dp = ct(dprl_ref[0].astype(f32), w_st)
  for i in reversed(range(n_out)):
    m, xh, inv = fw['lns'][i]
    dm = dp * _elu_grad(m)
    dq = _ln_bwd(dm, xh, inv, f32(w['outs'][i][0, :]))
    dm_outs[i][0] = dm
    dq_outs[i][0] = dq
    dp = ct(dq, w['outw'][i])
  dd_t = dd_t + dp

  # --- GRU adjoints ------------------------------------------------------
  c, u, r, gc, d_m = fw['c'], fw['u'], fw['r'], fw['gc'], fw['d_m']
  du = dd_t * (c - d_m)
  dc = dd_t * u
  dd_m = dd_t * (1.0 - u)
  dcbar = dc * (1.0 - c * c)
  dr = dcbar * gc
  dgc = dcbar * r
  dgr = dr * r * (1.0 - r)
  dgu = du * u * (1.0 - u)
  dng = jnp.concatenate([dgr, dgc, dgu], -1)
  dzg = _ln_bwd(dng, fw['xhg'], fw['invg'], f32(w['ln_gru_s'][0, :]))
  dng_out[0] = dng
  dzg_out[0] = dzg
  dx1 = ct(dzg, w['w_gru_x'])
  dd_m = dd_m + ct(dzg, w['w_gru_d'])
  dn1 = dx1 * _elu_grad(fw['n1'])
  dz1 = _ln_bwd(dn1, fw['xh1'], fw['inv1'], f32(w['ln_in_s'][0, :]))
  dn1_out[0] = dn1
  dz1_out[0] = dz1
  ds_m = ct(dz1, w['w_in_s'])

  ds_c[:] = ds_m * keep
  dd_c[:] = dd_m * keep

  @pl.when(g == last)
  def _():
    ds0_out[:] = ds_c[:]
    dd0_out[:] = dd_c[:]


# ---------------------------------------------------------------------------
# custom_vjp wrapper + weight-gradient epilogue.
# ---------------------------------------------------------------------------


def _flatten_params(params):
  n_out = len(params['w_out'])
  flat = (params['w_in_s'], params['w_in_a'],
          params['ln_in_scale'], params['ln_in_bias'],
          params['w_gru_d'], params['w_gru_x'],
          params['ln_gru_scale'], params['ln_gru_bias'],
          tuple(params['w_out']),
          tuple(params['ln_out_scale']), tuple(params['ln_out_bias']),
          params['w_st'], params['b_st'],
          params['w_obs_d'], params['w_obs_e'],
          params['ln_obs_scale'], params['ln_obs_bias'],
          params['w_post'], params['b_post'])
  return flat, n_out


def _weight_list(flat):
  """Kernel input list for the fwd kernel (row-vector LN params)."""
  (w_in_s, w_in_a, g1, b1, w_gru_d, w_gru_x, gg, bg, outw, outs, outb,
   w_st, b_st, w_obs_d, w_obs_e, g2, b2, w_post, b_post) = flat
  row = lambda v: v.reshape(1, -1)
  return [
      w_in_s, w_in_a, row(g1), row(b1), w_gru_d, w_gru_x, row(gg),
      row(bg), *outw, *[row(x) for x in outs], *[row(x) for x in outb],
      w_st, row(b_st), w_obs_d, w_obs_e, row(g2), row(b2),
      w_post, row(b_post)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _observe_fused(cfg, flat, stoch0, deter0, actions, embeds, is_first,
                   gumbel):
  out, _ = _observe_fused_fwd(cfg, flat, stoch0, deter0, actions, embeds,
                              is_first, gumbel)
  return out


def _observe_fused_fwd(cfg, flat, stoch0, deter0, actions, embeds,
                       is_first, gumbel):
  unimix, sample, interpret, classes = cfg
  n_out = len(flat[8])
  T, B, A = actions.shape
  E = embeds.shape[-1]
  D = flat[4].shape[0]
  SC = flat[11].shape[1]
  dtype = stoch0.dtype
  weights = _weight_list(flat)

  const = lambda shape: pl.BlockSpec(
      shape, lambda t, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
  stepped = lambda shape: pl.BlockSpec(
      (1,) + shape, lambda t, *_: (t,) + (0,) * len(shape),
      memory_space=pltpu.VMEM)

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=0,
      grid=(T,),
      in_specs=[
          stepped((B, A)), stepped((B, E)), stepped((B, 1)),
          stepped((B, SC)),
          *[const(w.shape) for w in weights],
          const((B, SC)), const((B, D)),
      ],
      out_specs=[
          stepped((B, D)), stepped((B, SC)), stepped((B, SC)),
          stepped((B, SC)),
      ],
      scratch_shapes=[
          pltpu.VMEM((B, SC), dtype),
          pltpu.VMEM((B, D), dtype),
      ],
  )
  kernel = functools.partial(
      _obs_fwd_kernel, unimix, classes, n_out, sample, interpret)
  deters, post_logits, prior_logits, stochs = pl.pallas_call(
      kernel,
      grid_spec=grid_spec,
      out_shape=[
          jax.ShapeDtypeStruct((T, B, D), dtype),
          jax.ShapeDtypeStruct((T, B, SC), f32),
          jax.ShapeDtypeStruct((T, B, SC), f32),
          jax.ShapeDtypeStruct((T, B, SC), dtype),
      ],
      interpret=interpret,
  )(actions, embeds, is_first.reshape(T, B, 1), gumbel,
    *weights, stoch0, deter0)
  out = (deters, post_logits, prior_logits, stochs)
  res = (flat, stoch0, deter0, actions, embeds, is_first,
         deters, post_logits, stochs)
  return out, res


def _observe_fused_bwd(cfg, res, cts):
  unimix, sample, interpret, classes = cfg
  del sample
  (flat, stoch0, deter0, actions, embeds, is_first,
   deters, post_logits, stochs) = res
  dd_out, dpl, dprl, ds_out = [x.astype(f32) for x in cts]
  (w_in_s, w_in_a, g1, b1, w_gru_d, w_gru_x, gg, bg, outw, outs, outb,
   w_st, b_st, w_obs_d, w_obs_e, g2, b2, w_post, b_post) = flat
  n_out = len(outw)
  T, B, A = actions.shape
  E = embeds.shape[-1]
  D = w_gru_d.shape[0]
  U = w_in_s.shape[1]
  SC = w_st.shape[1]

  s_prev = jnp.concatenate([stoch0[None].astype(stochs.dtype),
                            stochs[:-1]], 0)
  d_prev = jnp.concatenate([deter0[None].astype(deters.dtype),
                            deters[:-1]], 0)
  e_proj = jnp.einsum('tbe,eu->tbu', embeds.astype(f32), f32(w_obs_e))

  # Backward kernel: sequential adjoint chain, time reversed.
  bwd_weights = _weight_list(flat)
  # Slice the fwd weight list down to what the bwd kernel consumes:
  # the img-cell group + (w_st, w_obs_d, ln_obs scale/bias, w_post).
  head = bwd_weights[:8 + 3 * n_out]
  row = lambda v: v.reshape(1, -1)
  bwd_ws = head + [w_st, w_obs_d, row(g2), row(b2), w_post]

  rev = lambda shape: pl.BlockSpec(
      (1,) + shape, lambda g: (T - 1 - g,) + (0,) * len(shape),
      memory_space=pltpu.VMEM)
  const = lambda shape: pl.BlockSpec(
      shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM)

  out_shapes = (
      [jax.ShapeDtypeStruct((T, B, U), f32),      # dz1
       jax.ShapeDtypeStruct((T, B, U), f32),      # dn1
       jax.ShapeDtypeStruct((T, B, 3 * D), f32),  # dzg
       jax.ShapeDtypeStruct((T, B, 3 * D), f32),  # dng
       jax.ShapeDtypeStruct((T, B, U), f32),      # dz2
       jax.ShapeDtypeStruct((T, B, U), f32)]      # dn2
      + [jax.ShapeDtypeStruct((T, B, U), f32)] * n_out   # dq_i
      + [jax.ShapeDtypeStruct((T, B, U), f32)] * n_out   # dm_i
      + [jax.ShapeDtypeStruct((T, B, SC), f32),  # dpl_total
         jax.ShapeDtypeStruct((B, SC), f32),     # ds0
         jax.ShapeDtypeStruct((B, D), f32)])     # dd0
  out_specs = (
      [rev((B, U)), rev((B, U)), rev((B, 3 * D)), rev((B, 3 * D)),
       rev((B, U)), rev((B, U))]
      + [rev((B, U))] * n_out + [rev((B, U))] * n_out
      + [rev((B, SC)), const((B, SC)), const((B, D))])

  kernel = functools.partial(
      _obs_bwd_kernel, unimix, classes, n_out, interpret)
  results = pl.pallas_call(
      kernel,
      grid=(T,),
      in_specs=(
          [rev((B, SC)), rev((B, D)), rev((B, A)), rev((B, U)),
           rev((B, 1)), rev((B, SC)),
           rev((B, D)), rev((B, SC)), rev((B, SC)), rev((B, SC))]
          + [const(w.shape) for w in bwd_ws]),
      out_specs=out_specs,
      out_shape=out_shapes,
      scratch_shapes=[
          pltpu.VMEM((B, SC), f32),
          pltpu.VMEM((B, D), f32),
      ],
      interpret=interpret,
  )(s_prev, d_prev, actions, e_proj.astype(actions.dtype),
    is_first.reshape(T, B, 1), post_logits,
    dd_out, dpl, dprl, ds_out, *bwd_ws)
  (dz1, dn1, dzg, dng, dz2, dn2, *tail2) = results
  dqs = tail2[:n_out]
  dms = tail2[n_out:2 * n_out]
  dpl_total, ds0, dd0 = tail2[2 * n_out:]

  # ---- Epilogue: weight grads as batched GEMMs over T*B rows -----------
  keep = (1.0 - is_first.astype(f32))[..., None]
  s_m = stoch0.dtype.type if False else None
  del s_m
  s_mf = s_prev.astype(f32) * keep
  d_mf = d_prev.astype(f32) * keep
  a_mf = actions.astype(f32) * keep
  e_f = embeds.astype(f32)
  d_tf = deters.astype(f32)

  flat2 = lambda x: x.reshape(-1, x.shape[-1])
  mm = lambda a, b: jnp.einsum('ni,nj->ij', flat2(a), flat2(b))

  # Recompute layer inputs that the GEMMs need (batched, no seq dep).
  z1 = jnp.einsum('tbs,su->tbu', s_mf, f32(w_in_s)) + jnp.einsum(
      'tba,au->tbu', a_mf, f32(w_in_a))
  _, xh1, _ = _ln_fwd(z1, f32(g1), f32(b1))
  n1v = xh1 * f32(g1) + f32(b1)
  x1 = jnp.where(n1v > 0, n1v, jnp.exp(n1v) - 1.0)
  zg = jnp.einsum('tbd,dk->tbk', d_mf, f32(w_gru_d)) + jnp.einsum(
      'tbu,uk->tbk', x1, f32(w_gru_x))
  _, xhg, _ = _ln_fwd(zg, f32(gg), f32(bg))
  ps = [d_tf]
  xhqs = []
  for i in range(n_out):
    q = jnp.einsum('tbd,du->tbu', ps[-1], f32(outw[i]))
    _, xh, _ = _ln_fwd(q, f32(outs[i]), f32(outb[i]))
    xhqs.append(xh)
    mv = xh * f32(outs[i]) + f32(outb[i])
    ps.append(jnp.where(mv > 0, mv, jnp.exp(mv) - 1.0))
  z2 = jnp.einsum('tbd,du->tbu', d_tf, f32(w_obs_d)) + jnp.einsum(
      'tbe,eu->tbu', e_f, f32(w_obs_e))
  _, xh2, _ = _ln_fwd(z2, f32(g2), f32(b2))
  n2v = xh2 * f32(g2) + f32(b2)
  x2 = jnp.where(n2v > 0, n2v, jnp.exp(n2v) - 1.0)

  sum01 = lambda x: x.sum((0, 1))
  grads = (
      mm(s_mf, dz1),                       # w_in_s
      mm(a_mf, dz1),                       # w_in_a
      sum01(dn1 * xh1),                    # ln_in_scale
      sum01(dn1),                          # ln_in_bias
      mm(d_mf, dzg),                       # w_gru_d
      mm(x1, dzg),                         # w_gru_x
      sum01(dng * xhg),                    # ln_gru_scale
      sum01(dng),                          # ln_gru_bias
      tuple(mm(ps[i], dqs[i]) for i in range(n_out)),      # w_out
      tuple(sum01(dms[i] * xhqs[i]) for i in range(n_out)),
      tuple(sum01(dms[i]) for i in range(n_out)),
      mm(ps[-1], dprl),                    # w_st
      sum01(dprl),                         # b_st
      mm(d_tf, dz2),                       # w_obs_d
      mm(e_f, dz2),                        # w_obs_e
      sum01(dn2 * xh2),                    # ln_obs_scale
      sum01(dn2),                          # ln_obs_bias
      mm(x2, dpl_total),                   # w_post
      sum01(dpl_total),                    # b_post
  )
  # Cast weight grads to the params' dtypes.
  grads = jax.tree.map(
      lambda g, p: g.astype(p.dtype), grads, flat)

  da = jnp.einsum('tbu,au->tba', dz1, f32(w_in_a)) * keep
  de = jnp.einsum('tbu,eu->tbe', dz2, f32(w_obs_e))
  zero_f0 = np.zeros(is_first.shape, jax.dtypes.float0)
  T_, B_, SC_ = dpl.shape
  zero_gum = jnp.zeros((T_, B_, SC_), f32)
  return (grads, ds0.astype(stoch0.dtype), dd0.astype(deter0.dtype),
          da.astype(actions.dtype), de.astype(embeds.dtype),
          zero_f0, zero_gum)


_observe_fused.defvjp(_observe_fused_fwd, _observe_fused_bwd)


def observe_fused(params, stoch0, deter0, actions, embeds, is_first, seed,
                  unimix=0.01, sample=True, interpret=False):
  """Differentiable fused observe chain (see module docstring).

  Returns (deters, post_logits, prior_logits, stochs); gradients flow to
  all params and to stoch0/deter0/actions/embeds, matching jax.grad of
  `observe_scan_full` (stoch samples use straight-through gradients)."""
  flat, _ = _flatten_params(params)
  cfg = (float(unimix), bool(sample), bool(interpret),
         int(params['classes']))
  T, B = actions.shape[:2]
  SC = params['w_st'].shape[1]
  if sample:
    gumbel = jax.random.gumbel(
        jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)), (T, B, SC), f32)
  else:
    gumbel = jnp.zeros((T, B, SC), f32)
  return _observe_fused(cfg, flat, stoch0, deter0, actions, embeds,
                        is_first, gumbel)
