"""Training utilities: adaptive loss-scale controllers, return normalizers,
action noise, and logging helpers.

Functional re-designs of the reference's mutable-state utilities
(reference: embodied/agents/dreamerv2plus/tfutils.py:77-93, 390-527): all
EMA/scale state threads through the flat state dict.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import dists
from .module import Module
from .dists import symlog, symexp  # noqa: F401  (re-exported)

f32 = jnp.float32
sg = jax.lax.stop_gradient


def action_noise(action, amount, act_space, key):
  """Exploration noise (reference: tfutils.py:85-93)."""
  if amount == 0:
    return action
  if act_space.discrete:
    probs = amount / action.shape[-1] + (1 - amount) * action
    return dists.OneHotDist(probs=probs).sample(key)
  else:
    noisy = action + amount * jax.random.normal(key, action.shape, f32)
    return jnp.clip(noisy, -1, 1)


def video_grid(video):
  B, T, H, W, C = video.shape
  return video.transpose((1, 2, 0, 3, 4)).reshape((T, H, B * W, C))


def balance_stats(dist, target, thres):
  """Positive/negative prediction diagnostics (reference: tfutils.py:395-411).
  NaN when a batch has no positives/negatives; aggregate with nanmean."""
  pos = (f32(target) > thres).astype(f32)
  neg = (f32(target) <= thres).astype(f32)
  pred = (f32(dist.mean()) > thres).astype(f32)
  loss = -dist.log_prob(target)
  return dict(
      pos_loss=(loss * pos).sum() / pos.sum(),
      neg_loss=(loss * neg).sum() / neg.sum(),
      pos_acc=(pred * pos).sum() / pos.sum(),
      neg_acc=((1 - pred) * neg).sum() / neg.sum(),
      rate=pos.mean(),
      avg=f32(target).mean(),
      pred=f32(dist.mean()).mean(),
  )


class AutoAdapt(Module):
  """Proportional/multiplicative Lagrange-style loss-scale controller
  (reference: tfutils.py:414-482). Keeps a regularizer near `target` by
  adapting its scale inside [min, max]."""

  def __init__(self, name, shape, impl, scale, target, min, max,
               vel=0.1, thres=0.1, inverse=False):
    super().__init__(name)
    self._shape = tuple(shape)
    self._impl = impl
    self._fixed_scale = scale
    self._target = target
    self._min = min
    self._max = max
    self._vel = vel
    self._inverse = inverse
    self._thres = thres

  @property
  def shape(self):
    return self._shape

  def __call__(self, reg, update=True):
    update and self.update(reg)
    scale = self.scale()
    loss = scale * (-reg if self._inverse else reg)
    metrics = {
        'mean': reg.mean(), 'std': reg.std(),
        'scale_mean': scale.mean(), 'scale_std': scale.std()}
    return loss, metrics

  def scale(self):
    if self._impl == 'fixed':
      return jnp.full(self._shape, self._fixed_scale, f32)
    scale = self.value(
        'scale', jnp.ones(self._shape, f32), trainable=False)
    return sg(scale)

  def update(self, reg):
    if self._impl == 'fixed':
      return
    avg = sg(reg).mean(
        tuple(range(len(reg.shape) - len(self._shape))))
    scale = self.value(
        'scale', jnp.ones(self._shape, f32), trainable=False)
    if self._impl == 'mult':
      below = avg < (1 / (1 + self._thres)) * self._target
      above = avg > (1 + self._thres) * self._target
      if self._inverse:
        below, above = above, below
      inside = ~below & ~above
      adjusted = (
          above.astype(f32) * scale * (1 + self._vel) +
          below.astype(f32) * scale / (1 + self._vel) +
          inside.astype(f32) * scale)
      self.write('scale', jnp.clip(adjusted, self._min, self._max))
    elif self._impl == 'prop':
      direction = avg - self._target
      if self._inverse:
        direction = -direction
      self.write('scale', jnp.clip(
          scale + self._vel * direction, self._min, self._max))
    else:
      raise NotImplementedError(self._impl)


class Normalize(Module):
  """EMA mean/std normalizer with bias correction
  (reference: tfutils.py:485-527)."""

  def __init__(self, name, impl='mean_std', decay=0.99, max=1e8, vareps=0.0,
               stdeps=0.0):
    super().__init__(name)
    self._impl = impl
    self._decay = decay
    self._max = max
    self._stdeps = stdeps
    self._vareps = vareps

  def __call__(self, values, update=True):
    update and self.update(values)
    return self.transform(values)

  def update(self, values):
    x = sg(f32(values))
    m = self._decay
    step = self.value('step', jnp.zeros((), jnp.int32), trainable=False)
    mean = self.value('mean', jnp.zeros((), f32), trainable=False)
    sqrs = self.value('sqrs', jnp.zeros((), f32), trainable=False)
    self.write('step', step + 1)
    self.write('mean', m * mean + (1 - m) * x.mean())
    self.write('sqrs', m * sqrs + (1 - m) * (x ** 2).mean())

  def transform(self, values):
    if self._impl == 'off':
      return values
    step = self.value('step', jnp.zeros((), jnp.int32), trainable=False)
    mean = self.value('mean', jnp.zeros((), f32), trainable=False)
    sqrs = self.value('sqrs', jnp.zeros((), f32), trainable=False)
    correction = 1 - self._decay ** jnp.maximum(f32(step), 1.0)
    mean = mean / correction
    var = (sqrs / correction) - mean ** 2
    if self._max > 0.0:
      scale = jax.lax.rsqrt(
          jnp.maximum(var, 1 / self._max ** 2 + self._vareps) + self._stdeps)
    else:
      scale = jax.lax.rsqrt(var + self._vareps) + self._stdeps
    if self._impl == 'mean_std':
      values = values - sg(mean.astype(values.dtype))
      values = values * sg(scale.astype(values.dtype))
    elif self._impl == 'std':
      values = values * sg(scale.astype(values.dtype))
    else:
      raise NotImplementedError(self._impl)
    return values
