"""Hand-rolled layers with the reference's uniform fan-in initialization
(reference: embodied/agents/dreamerv2plus/nets.py:495-626).

Params are stored float32 and cast to the compute dtype (bf16 on TPU) at
read time, so matmuls/convs hit the MXU in bf16 while the optimizer state
stays full precision.
"""

import jax
import jax.numpy as jnp
import numpy as np

from . import module as nj
from .module import Module, cast_to_compute


def get_act(name):
  if callable(name):
    return name
  elif name == 'none':
    return lambda x: x
  elif name == 'mish':
    return lambda x: x * jnp.tanh(jax.nn.softplus(x))
  elif name == 'elu':
    return jax.nn.elu
  elif name == 'relu':
    return jax.nn.relu
  elif name == 'gelu':
    return lambda x: jax.nn.gelu(x, approximate=True)
  elif name == 'silu' or name == 'swish':
    return jax.nn.silu
  elif name == 'tanh':
    return jnp.tanh
  elif name == 'sigmoid':
    return jax.nn.sigmoid
  else:
    raise NotImplementedError(name)


class Linear(Module):

  def __init__(self, name, units, act='none', norm='none', bias=True,
               outscale=1.0):
    super().__init__(name)
    self._units = units
    self._act = get_act(act)
    self._norm = norm
    self._bias = bias and norm == 'none'
    self._outscale = outscale

  def __call__(self, x):
    shape = (x.shape[-1], self._units)
    limit = np.sqrt(3.0 * self._outscale / np.mean(shape))
    kernel = self.value(
        'kernel',
        lambda key: jax.random.uniform(
            key, shape, jnp.float32, -limit, limit))
    kernel = cast_to_compute(kernel)
    x = x @ kernel
    if self._bias:
      bias = self.value('bias', jnp.zeros(self._units, jnp.float32))
      x = x + cast_to_compute(bias)
    if self._norm != 'none':
      x = self.sub('norm', Norm, self._norm)(x)
    return self._act(x)


class Conv2D(Module):

  def __init__(self, name, depth, kernel, stride=1, transp=False, act='none',
               norm='none', pad='same', bias=True, preact=False):
    super().__init__(name)
    self._depth = depth
    self._kernel = kernel
    self._stride = stride
    self._transp = transp
    self._act = get_act(act)
    self._norm = norm
    self._pad = pad.upper()
    self._preact = preact
    self._bias = bias and norm == 'none'

  def __call__(self, x):
    if self._preact:
      x = self.sub('norm', Norm, self._norm)(x)
      x = self._act(x)
      return self._layer(x)
    x = self._layer(x)
    x = self.sub('norm', Norm, self._norm)(x)
    return self._act(x)

  def _layer(self, x):
    if self._transp:
      shape = (self._kernel, self._kernel, self._depth, x.shape[-1])
      limit = np.sqrt(
          3.0 / (np.prod(shape[:-2]) * np.mean(shape[-2:])))
      kernel = self.value(
          'kernel',
          lambda key: jax.random.uniform(
              key, shape, jnp.float32, -limit, limit))
      kernel = cast_to_compute(kernel)
      if x.shape[1] == x.shape[2] == 1 and self._pad == 'VALID':
        # A transposed conv over a 1x1 input IS a dense layer: every
        # output pixel (i, j) reads the single input pixel through its
        # own k x k filter slice. The matmul form runs on the MXU with
        # full lanes; the conv form is the single most expensive op of
        # the image decoder at production shapes (the first stage maps
        # the [deter+stoch] feature to k*k*depth through the largest
        # filter in the model — PROFILE_XARM.json). Same parameters,
        # same math: conv_transpose applies the spatially-flipped
        # kernel (verified against lax.conv_transpose in
        # tests/test_nn.py::test_convT_1x1_dense_path).
        w = kernel[::-1, ::-1].transpose(3, 0, 1, 2)
        w = w.reshape(x.shape[-1], -1)
        y = x.reshape(x.shape[0], x.shape[-1]) @ w
        x = y.reshape(
            x.shape[0], self._kernel, self._kernel, self._depth)
      else:
        x = jax.lax.conv_transpose(
            x, kernel.transpose(0, 1, 3, 2),
            (self._stride, self._stride), self._pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    else:
      shape = (self._kernel, self._kernel, x.shape[-1], self._depth)
      limit = np.sqrt(3.0 / np.mean(shape[-2:]))
      kernel = self.value(
          'kernel',
          lambda key: jax.random.uniform(
              key, shape, jnp.float32, -limit, limit))
      kernel = cast_to_compute(kernel)
      x = jax.lax.conv_general_dilated(
          x, kernel, (self._stride, self._stride), self._pad,
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if self._bias:
      bias = self.value('bias', jnp.zeros(self._depth, jnp.float32))
      x = x + cast_to_compute(bias)
    return x


class Norm(Module):

  def __init__(self, name, impl):
    super().__init__(name)
    self._impl = impl

  def __call__(self, x):
    if self._impl == 'none':
      return x
    elif self._impl == 'layer':
      scale = self.value('scale', jnp.ones(x.shape[-1], jnp.float32))
      bias = self.value('bias', jnp.zeros(x.shape[-1], jnp.float32))
      dtype = x.dtype
      x = x.astype(jnp.float32)
      mean = x.mean(-1, keepdims=True)
      var = ((x - mean) ** 2).mean(-1, keepdims=True)
      x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
      return x.astype(dtype)
    else:
      raise NotImplementedError(self._impl)


class Input:
  """Gathers, flattens, and concatenates named features
  (reference: nets.py:605-626). E.g. Input(['deter', 'stoch'])."""

  def __init__(self, keys=('tensor',), dims=None):
    assert isinstance(keys, (list, tuple)), keys
    self._keys = tuple(keys)
    self._dims = dims or self._keys[0]

  def __call__(self, inputs):
    if not isinstance(inputs, dict):
      inputs = {'tensor': inputs}
    if not all(k in inputs for k in self._keys):
      needs = f'{{{", ".join(self._keys)}}}'
      found = f'{{{", ".join(inputs.keys())}}}'
      raise KeyError(f'Cannot find keys {needs} among inputs {found}.')
    values = [inputs[k] for k in self._keys]
    dims = len(inputs[self._dims].shape)
    for i, value in enumerate(values):
      if len(value.shape) > dims:
        shape = value.shape[:dims - 1] + (
            int(np.prod(value.shape[dims - 1:])),)
        values[i] = value.reshape(shape)
    values = [x.astype(inputs[self._dims].dtype) for x in values]
    return jnp.concatenate(values, -1)
