"""Minimal JAX distribution classes for the agent's heads.

Replaces the reference's tensorflow_probability usage with closed-form
implementations (reference: embodied/agents/dreamerv2plus/tfutils.py:305-387
and nets.py:447-492): straight-through OneHot categorical, diagonal Normal
with Independent event dims, truncated Normal, Bernoulli, and the MSE /
Symlog pseudo-likelihoods. All math in float32 regardless of compute dtype.
"""

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32


def symlog(x):
  return jnp.sign(x) * jnp.log(1 + jnp.abs(x))


def symexp(x):
  return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1)


class OneHotDist:
  """Categorical over one-hot vectors with straight-through gradients
  (reference: tfutils.py:359-387). Batch shape = logits.shape[:-1]."""

  def __init__(self, logits=None, probs=None):
    if logits is None:
      logits = jnp.log(jnp.clip(probs, 1e-8, 1.0))
    self.logits = jax.nn.log_softmax(f32(logits), -1)
    self.num_classes = logits.shape[-1]

  @property
  def probs(self):
    return jnp.exp(self.logits)

  def sample(self, key):
    indices = jax.random.categorical(key, self.logits)
    sample = jax.nn.one_hot(indices, self.num_classes, dtype=f32)
    # Straight-through biased gradient estimator: forward pass is the hard
    # sample, backward pass flows through the softmax probabilities.
    probs = self.probs
    sample = jax.lax.stop_gradient(sample) + probs - jax.lax.stop_gradient(
        probs)
    return sample

  def mode(self):
    return jax.nn.one_hot(
        jnp.argmax(self.logits, -1), self.num_classes, dtype=f32)

  def log_prob(self, value):
    return jnp.sum(f32(value) * self.logits, -1)

  def entropy(self):
    return -jnp.sum(jnp.exp(self.logits) * self.logits, -1)

  def kl(self, other):
    return jnp.sum(
        jnp.exp(self.logits) * (self.logits - other.logits), -1)


class Independent:
  """Sums log-probs/entropies over the trailing `dims` batch dims of `dist`."""

  def __init__(self, dist, dims):
    self.dist = dist
    self.dims = dims
    # Forward entropy-normalization annotations when present.
    for attr in ('minent', 'maxent'):
      if hasattr(dist, attr):
        setattr(self, attr, getattr(dist, attr))

  @property
  def inner(self):
    return self.dist

  def _reduce(self, x):
    return jnp.sum(x, axis=tuple(range(-self.dims, 0))) if self.dims else x

  def sample(self, key):
    return self.dist.sample(key)

  def mode(self):
    return self.dist.mode()

  def mean(self):
    return self.dist.mean()

  def log_prob(self, value):
    return self._reduce(self.dist.log_prob(value))

  def entropy(self):
    return self._reduce(self.dist.entropy())

  def kl(self, other):
    other = other.dist if isinstance(other, Independent) else other
    return self._reduce(self.dist.kl(other))


class Normal:

  def __init__(self, mean, std):
    self._mean = f32(mean)
    self._std = f32(std)

  def sample(self, key):
    return self._mean + self._std * jax.random.normal(
        key, self._mean.shape, f32)

  def mode(self):
    return self._mean

  def mean(self):
    return self._mean

  def log_prob(self, value):
    var = self._std ** 2
    return -0.5 * (
        jnp.log(2 * np.pi) + 2 * jnp.log(self._std)
        + (f32(value) - self._mean) ** 2 / var)

  def entropy(self):
    return 0.5 * jnp.log(2 * np.pi * np.e) + jnp.log(self._std)

  def kl(self, other):
    return (
        jnp.log(other._std) - jnp.log(self._std)
        + (self._std ** 2 + (self._mean - other._mean) ** 2)
        / (2 * other._std ** 2) - 0.5)


class MultivariateNormalDiag:
  """Diagonal Gaussian whose event dim is the last axis."""

  def __init__(self, mean, std):
    self._inner = Normal(mean, std)

  def sample(self, key):
    return self._inner.sample(key)

  def mode(self):
    return self._inner.mode()

  def mean(self):
    return self._inner.mean()

  def log_prob(self, value):
    return jnp.sum(self._inner.log_prob(value), -1)

  def entropy(self):
    return jnp.sum(self._inner.entropy(), -1)

  def kl(self, other):
    return jnp.sum(self._inner.kl(other._inner), -1)


class TruncNormal:
  """Normal truncated to [low, high] (reference actor dist 'trunc_normal')."""

  def __init__(self, mean, std, low=-1.0, high=1.0):
    self._mean = f32(mean)
    self._std = f32(std)
    self._low = low
    self._high = high

  def _alpha_beta(self):
    alpha = (self._low - self._mean) / self._std
    beta = (self._high - self._mean) / self._std
    return alpha, beta

  def _z(self):
    alpha, beta = self._alpha_beta()
    return _ndtr(beta) - _ndtr(alpha)

  def sample(self, key):
    alpha, beta = self._alpha_beta()
    lo = _ndtr(alpha)
    hi = _ndtr(beta)
    u = jax.random.uniform(
        key, self._mean.shape, f32, minval=1e-6, maxval=1 - 1e-6)
    x = _ndtri(lo + u * (hi - lo))
    return jnp.clip(self._mean + self._std * x, self._low, self._high)

  def mode(self):
    return jnp.clip(self._mean, self._low, self._high)

  def mean(self):
    alpha, beta = self._alpha_beta()
    z = self._z()
    return self._mean + self._std * (_npdf(alpha) - _npdf(beta)) / z

  def log_prob(self, value):
    x = (f32(value) - self._mean) / self._std
    log_unnorm = -0.5 * x ** 2 - 0.5 * jnp.log(2 * np.pi)
    return log_unnorm - jnp.log(self._std) - jnp.log(self._z() + 1e-12)

  def entropy(self):
    alpha, beta = self._alpha_beta()
    z = self._z()
    term = (alpha * _npdf(alpha) - beta * _npdf(beta)) / (2 * z + 1e-12)
    return 0.5 * jnp.log(2 * np.pi * np.e) + jnp.log(
        self._std * z + 1e-12) + term


class Bernoulli:

  def __init__(self, logits):
    self.logits = f32(logits)

  def sample(self, key):
    return (jax.random.uniform(key, self.logits.shape, f32)
            < jax.nn.sigmoid(self.logits)).astype(f32)

  def mode(self):
    return (self.logits > 0).astype(f32)

  def mean(self):
    return jax.nn.sigmoid(self.logits)

  def log_prob(self, value):
    value = f32(value)
    return -(jnp.maximum(self.logits, 0) - self.logits * value
             + jnp.log1p(jnp.exp(-jnp.abs(self.logits))))

  def entropy(self):
    probs = jax.nn.sigmoid(self.logits)
    return -(probs * jnp.log(probs + 1e-12)
             + (1 - probs) * jnp.log(1 - probs + 1e-12))


class MSEDist:
  """Squared-error pseudo-likelihood (reference: tfutils.py:305-329)."""

  def __init__(self, mode, dims, agg='sum'):
    self._mode = f32(mode)
    self._dims = tuple(range(-dims, 0))
    self._agg = agg

  def mode(self):
    return self._mode

  def mean(self):
    return self._mode

  def log_prob(self, value):
    assert self._mode.shape == value.shape, (self._mode.shape, value.shape)
    distance = (self._mode - f32(value)) ** 2
    if self._agg == 'mean':
      loss = distance.mean(self._dims) if self._dims else distance
    elif self._agg == 'sum':
      loss = distance.sum(self._dims) if self._dims else distance
    else:
      raise NotImplementedError(self._agg)
    return -loss


class SymlogDist:
  """MSE in symlog space, decoded with symexp (reference: tfutils.py:332-356)."""

  def __init__(self, mode, dims, agg='sum'):
    self._mode = f32(mode)
    self._dims = tuple(range(-dims, 0))
    self._agg = agg

  def mode(self):
    return symexp(self._mode)

  def mean(self):
    return symexp(self._mode)

  def log_prob(self, value):
    assert self._mode.shape == value.shape, (self._mode.shape, value.shape)
    distance = (self._mode - symlog(f32(value))) ** 2
    if self._agg == 'mean':
      loss = distance.mean(self._dims) if self._dims else distance
    elif self._agg == 'sum':
      loss = distance.sum(self._dims) if self._dims else distance
    else:
      raise NotImplementedError(self._agg)
    return -loss


def _ndtr(x):
  return 0.5 * (1 + jax.lax.erf(x / np.sqrt(2)))


def _ndtri(p):
  from jax.scipy.special import ndtri
  return ndtri(p)


def _npdf(x):
  return jnp.exp(-0.5 * x ** 2) / np.sqrt(2 * np.pi)


def kl_divergence(lhs, rhs):
  return lhs.kl(rhs)
