"""World-model networks: RSSM, multi-modal encoders/decoders, dist heads.

TPU-native re-design of the reference networks (reference:
embodied/agents/dreamerv2plus/nets.py:11-492):

- RSSM observe/imagine are `lax.scan`s over the time axis with a
  configurable `unroll` factor (compile-time vs step-time knob, replacing
  the reference's static-unroll python loop, tfutils.py:50-70).
- All dense/conv compute runs in the compute dtype (bf16 on TPU) to hit the
  MXU; distribution statistics are float32.
- The batch axis stays fully shardable: no layer mixes batch entries, so
  pjit shards every op along the `data` mesh axis without resharding.
"""

import math
import re

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn
from ..nn import Module, Linear, Conv2D, Norm, Input
from ..nn import dists as distslib

f32 = jnp.float32
sg = jax.lax.stop_gradient
cast = nn.cast_to_compute


class RSSM(Module):
  """Discrete-latent recurrent state-space model (reference: nets.py:11-183).

  State: {deter, logit, stoch[stoch x classes]} (or Gaussian {mean, std,
  stoch} when classes=0). Learned initial state variants zeros/learned/
  learned2; `unimix` uniform-mixture logits; KL balancing.
  """

  def __init__(self, name, deter=1024, stoch=32, classes=32, unroll=1,
               initial='zeros', unimix=0.0, prior_layers=1, post_layers=1,
               gru_layers=1, impl='scan', **kw):
    super().__init__(name)
    self._deter = deter
    self._stoch = stoch
    self._classes = classes
    self._unroll = unroll
    self._initial = initial
    self._unimix = unimix
    self._prior_layers = prior_layers
    self._post_layers = post_layers
    self._gru_layers = gru_layers
    self._impl = impl
    self._kw = kw

  def initial(self, batch_size):
    if self._classes:
      state = dict(
          deter=jnp.zeros([batch_size, self._deter], f32),
          logit=jnp.zeros([batch_size, self._stoch, self._classes], f32),
          stoch=jnp.zeros([batch_size, self._stoch, self._classes], f32))
    else:
      state = dict(
          deter=jnp.zeros([batch_size, self._deter], f32),
          mean=jnp.zeros([batch_size, self._stoch], f32),
          std=jnp.ones([batch_size, self._stoch], f32),
          stoch=jnp.zeros([batch_size, self._stoch], f32))
    state = cast(state)
    if self._initial == 'zeros':
      return state
    elif self._initial == 'learned':
      deter = self.value(
          'initial_deter', jnp.zeros(self._deter, f32), trainable=True)
      stoch = self.value(
          'initial_stoch', jnp.zeros(state['stoch'].shape[1:], f32),
          trainable=True)
      state['deter'] = jnp.repeat(cast(deter)[None], batch_size, 0)
      state['stoch'] = jnp.repeat(cast(stoch)[None], batch_size, 0)
      return state
    elif self._initial == 'learned2':
      deter = self.value(
          'initial_deter', jnp.zeros(self._deter, f32), trainable=True)
      state['deter'] = jnp.repeat(cast(jnp.tanh(deter))[None], batch_size, 0)
      state['stoch'] = self.get_stoch(state['deter'])
      return state
    else:
      raise NotImplementedError(self._initial)

  def observe(self, embed, action, is_first, state=None):
    # Time-major scan over the chunk; batch axis stays sharded.
    swap = lambda x: jnp.swapaxes(x, 0, 1)
    if state is None:
      state = self.initial(action.shape[0])
    if self._impl == 'pallas' and not nn.creating():
      return self._observe_fused(embed, action, is_first, state)
    step = lambda prev, inputs: self.obs_step(prev[0], *inputs)
    inputs = (swap(action), swap(embed), swap(is_first))
    start = (state, state)
    post, prior = nn.scan(step, inputs, start, self._unroll)
    post = {k: swap(v) for k, v in post.items()}
    prior = {k: swap(v) for k, v in prior.items()}
    return post, prior

  @property
  def fused_compatible(self):
    """Whether the fused Pallas kernels can express this RSSM: discrete
    latents with power-of-two classes and single post/GRU layers."""
    return bool(
        self._classes and (self._classes & (self._classes - 1)) == 0
        and self._post_layers == 1 and self._gru_layers == 1)

  def fused_img_params(self):
    """img_step cell weights for the fused Pallas kernels, sliced from
    the SAME named state entries the scan path creates (checkpoint and
    optimizer parity); concat kernels split into their two operands
    (concat(a,b) @ W == a @ W[:n] + b @ W[n:])."""
    assert self.fused_compatible, (
        self._classes, self._post_layers, self._gru_layers)
    ctx = nn.context().state
    get = lambda k: cast(ctx[f'{self.path}/{k}'])
    SC = self._stoch * self._classes
    D = self._deter
    w_img_in = get('img_in/kernel')
    w_gru = get('gru_out/kernel')
    return {
        'w_in_s': w_img_in[:SC], 'w_in_a': w_img_in[SC:],
        'ln_in_scale': get('img_in/norm/scale'),
        'ln_in_bias': get('img_in/norm/bias'),
        'w_gru_d': w_gru[:D], 'w_gru_x': w_gru[D:],
        'ln_gru_scale': get('gru_out/norm/scale'),
        'ln_gru_bias': get('gru_out/norm/bias'),
        'w_out': [get(f'img_out_{i}/kernel')
                  for i in range(self._prior_layers)],
        'ln_out_scale': [get(f'img_out_{i}/norm/scale')
                         for i in range(self._prior_layers)],
        'ln_out_bias': [get(f'img_out_{i}/norm/bias')
                        for i in range(self._prior_layers)],
        'w_st': get('img_stats/kernel'), 'b_st': get('img_stats/bias'),
        'stoch_n': self._stoch, 'classes': self._classes,
    }

  def _observe_fused(self, embed, action, is_first, state):
    """Whole-chunk posterior chain as one Pallas program with a custom
    VJP (ops/pallas_rssm_vjp.py; measured 1.8x vs the best scan unroll,
    PALLAS_PROOF.json). Opt-in via `rssm.impl: pallas`.

    Parameter creation always runs the scan path, so the fused path can
    read the SAME named state entries (checkpoint/optimizer parity);
    the concat weight matrices are sliced into their two operands
    (concat(a,b) @ W == a @ W[:n] + b @ W[n:]). Divergences vs the scan:
    the posterior sample uses one gumbel draw on the whole chunk rather
    than per-step key splits (identical distribution, different stream),
    and the prior's unused stoch sample is its mode.
    """
    from ..ops import pallas_rssm_vjp as prv
    swap = lambda x: jnp.swapaxes(x, 0, 1)
    ctx = nn.context().state
    get = lambda k: cast(ctx[f'{self.path}/{k}'])
    SC = self._stoch * self._classes
    D = self._deter
    w_obs = get('obs_out/kernel')
    params = {
        **self.fused_img_params(),
        'w_obs_d': w_obs[:D], 'w_obs_e': w_obs[D:],
        'ln_obs_scale': get('obs_out/norm/scale'),
        'ln_obs_bias': get('obs_out/norm/bias'),
        'w_post': get('obs_stats/kernel'), 'b_post': get('obs_stats/bias'),
    }
    B = action.shape[0]
    stoch0 = cast(state['stoch']).reshape(B, SC)
    deter0 = cast(state['deter'])
    acts = cast(swap(action))
    if acts.ndim > 3:  # 2D (onehot-matrix) actions flatten like img_step.
      acts = acts.reshape(acts.shape[:2] + (-1,))
    seed = jax.random.randint(nn.rng(), (), 0, np.int32(2**31 - 1))
    deters, post_logits, prior_logits, stochs = prv.observe_fused(
        params, stoch0, deter0, acts, cast(swap(embed)), swap(is_first),
        seed, unimix=self._unimix, sample=True,
        interpret=jax.devices()[0].platform not in ('tpu', 'axon'))
    shape = lambda x: x.reshape(
        x.shape[:2] + (self._stoch, self._classes))
    dtype = stoch0.dtype
    # The kernel returns RAW stats-layer logits; the scan path stores
    # unimix log-probs (see _stats_layer), which get_dist/kl_loss consume.
    # Apply the same mixture here so both impls optimize the same KL; the
    # plain-jnp transform composes with the kernel's custom VJP.
    post_logit = self._unimix_logit(swap(shape(post_logits)))
    post = {
        'stoch': swap(shape(stochs)).astype(dtype),
        'deter': swap(deters).astype(dtype),
        'logit': post_logit.astype(dtype)}
    prior_logit = self._unimix_logit(swap(shape(prior_logits)))
    prior_mode = jax.nn.one_hot(
        jnp.argmax(prior_logit, -1), self._classes, dtype=f32)
    prior = {
        'stoch': sg(prior_mode).astype(dtype),
        'deter': post['deter'],
        'logit': prior_logit.astype(dtype)}
    return post, prior

  def imagine(self, action, state=None):
    swap = lambda x: jnp.swapaxes(x, 0, 1)
    if state is None:
      state = self.initial(action.shape[0])
    assert isinstance(state, dict), state
    action = swap(action)
    prior = nn.scan(
        lambda prev, act: self.img_step(prev, act), action, state,
        self._unroll)
    prior = {k: swap(v) for k, v in prior.items()}
    return prior

  def get_dist(self, state):
    if self._classes:
      logit = f32(state['logit'])
      return distslib.Independent(distslib.OneHotDist(logit), 1)
    else:
      return distslib.MultivariateNormalDiag(
          f32(state['mean']), f32(state['std']))

  def obs_step(self, prev_state, prev_action, embed, is_first):
    prev_state, prev_action = jax.tree.map(
        cast, (prev_state, prev_action))
    is_first = cast(is_first)
    mask = lambda x, m: jnp.einsum('b...,b->b...', x, m)
    prev_state = jax.tree.map(
        lambda x: mask(x, 1.0 - is_first), prev_state)
    prev_action = mask(prev_action, 1.0 - is_first)
    init = self.initial(is_first.shape[0])
    prev_state = jax.tree.map(
        lambda x, y: x + mask(cast(y), is_first), prev_state, init)
    prior = self.img_step(prev_state, prev_action)
    x = jnp.concatenate([prior['deter'], embed], -1)
    for i in range(self._post_layers - 1):
      x = self.sub(f'obs_out_{i}', Linear, **self._kw)(x)
    x = self.sub('obs_out', Linear, **self._kw)(x)
    stats = self._stats_layer('obs_stats', x)
    dist = self.get_dist(stats)
    stoch = cast(dist.sample(nn.rng()))
    post = {'stoch': stoch, 'deter': prior['deter'], **stats}
    return post, prior

  def img_step(self, prev_state, prev_action):
    prev_stoch = cast(prev_state['stoch'])
    prev_action = cast(prev_action)
    if self._classes:
      shape = prev_stoch.shape[:-2] + (self._stoch * self._classes,)
      prev_stoch = prev_stoch.reshape(shape)
    if len(prev_action.shape) > len(prev_stoch.shape):  # 2D actions.
      shape = prev_action.shape[:-2] + (
          int(np.prod(prev_action.shape[-2:])),)
      prev_action = prev_action.reshape(shape)
    x = jnp.concatenate([prev_stoch, prev_action], -1)
    x = self.sub('img_in', Linear, **self._kw)(x)
    x, deter = self._gru(x, prev_state['deter'])
    for i in range(self._prior_layers):
      x = self.sub(f'img_out_{i}', Linear, **self._kw)(x)
    stats = self._stats_layer('img_stats', x)
    dist = self.get_dist(stats)
    stoch = cast(dist.sample(nn.rng()))
    prior = {'stoch': stoch, 'deter': deter, **stats}
    return prior

  def get_stoch(self, deter):
    x = deter
    for i in range(self._prior_layers):
      x = self.sub(f'img_out_{i}', Linear, **self._kw)(x)
    stats = self._stats_layer('img_stats', x)
    dist = self.get_dist(stats)
    return cast(dist.mode())

  def _gru(self, x, deter):
    """Custom GRU with update-bias -1 (reference: nets.py:149-160).

    The fused 3*deter matmul keeps a single large MXU op per step instead
    of three small ones.
    """
    x = jnp.concatenate([cast(deter), x], -1)
    for i in range(self._gru_layers - 1):
      x = self.sub(f'gru_{i}', Linear, **self._kw)(x)
    kw = {**self._kw, 'act': 'none', 'units': 3 * self._deter}
    x = self.sub('gru_out', Linear, **kw)(x)
    reset, cand, update = jnp.split(x, 3, -1)
    reset = jax.nn.sigmoid(reset)
    cand = jnp.tanh(reset * cand)
    update = jax.nn.sigmoid(update - 1)
    deter = update * cand + (1 - update) * cast(deter)
    return deter, deter

  def _unimix_logit(self, logit):
    # Mix the categorical with a uniform floor and store log-probs, so
    # every consumer (KL, entropy, sampling) sees the same distribution.
    if not self._unimix:
      return logit
    dtype = logit.dtype
    probs = jax.nn.softmax(f32(logit), -1)
    uniform = jnp.ones_like(probs) / probs.shape[-1]
    probs = (1 - self._unimix) * probs + self._unimix * uniform
    return jnp.log(probs).astype(dtype)

  def _stats_layer(self, name, x):
    # Stats stay in the compute dtype so the scan carry has a uniform
    # dtype; get_dist casts to float32 for the distribution math.
    if self._classes:
      x = self.sub(name, Linear, self._stoch * self._classes)(x)
      logit = x.reshape(
          x.shape[:-1] + (self._stoch, self._classes))
      logit = self._unimix_logit(logit)
      return {'logit': logit}
    else:
      x = self.sub(name, Linear, 2 * self._stoch)(x)
      mean, std = jnp.split(x, 2, -1)
      std = 2 * jax.nn.sigmoid(f32(std) / 2) + 0.1
      return {'mean': mean, 'std': std.astype(x.dtype)}

  def kl_loss(self, post, prior, balance=0.8):
    """KL balancing (reference: nets.py:178-183)."""
    post_const = jax.tree.map(sg, post)
    prior_const = jax.tree.map(sg, prior)
    lhs = self.get_dist(post_const).kl(self.get_dist(prior))
    rhs = self.get_dist(post).kl(self.get_dist(prior_const))
    return balance * lhs + (1 - balance) * rhs


class MultiEncoder(Module):
  """Regex-keyed fusion of image (CNN) + proprio (MLP) observations
  (reference: nets.py:186-232)."""

  def __init__(self, name, shapes, cnn_keys=r'.*', mlp_keys=r'.*',
               mlp_layers=4, mlp_units=512, cnn='simple', cnn_depth=48,
               cnn_kernels=(4, 4, 4, 4), cnn_blocks=2, **kw):
    super().__init__(name)
    excluded = ('is_first', 'is_last')
    shapes = {k: v for k, v in shapes.items() if k not in excluded}
    self.cnn_shapes = {
        k: v for k, v in shapes.items()
        if re.match(cnn_keys, k) and len(v) == 3}
    self.mlp_shapes = {
        k: v for k, v in shapes.items()
        if re.match(mlp_keys, k) and len(v) in (0, 1)}
    self.shapes = {**self.cnn_shapes, **self.mlp_shapes}
    assert self.shapes, (shapes, cnn_keys, mlp_keys)
    self._cnn_impl = cnn
    if self.cnn_shapes:
      if cnn == 'simple':
        self._cnn = self.sub(
            'cnn', ImageEncoderSimple, cnn_depth, cnn_kernels, **kw)
      elif cnn == 'resnet':
        self._cnn = self.sub(
            'cnn', ImageEncoderResnet, cnn_depth, cnn_blocks, **kw)
      else:
        raise NotImplementedError(cnn)
    if self.mlp_shapes:
      self._mlp = self.sub(
          'mlp', MLP, None, mlp_layers, mlp_units, dist='none', **kw)

  def __call__(self, data):
    some_key, some_shape = list(self.shapes.items())[0]
    batch_dims = data[some_key].shape[:len(data[some_key].shape)
                                      - len(some_shape)]
    data = {
        k: v.reshape((-1,) + v.shape[len(batch_dims):])
        for k, v in data.items()}
    outputs = []
    if self.cnn_shapes:
      inputs = jnp.concatenate([data[k] for k in self.cnn_shapes], -1)
      output = self._cnn(inputs)
      output = output.reshape((output.shape[0], -1))
      outputs.append(output)
    if self.mlp_shapes:
      inputs = [
          data[k][..., None] if len(self.shapes[k]) == 0 else data[k]
          for k in self.mlp_shapes]
      inputs = jnp.concatenate([cast(f32(x)) for x in inputs], -1)
      outputs.append(self._mlp(inputs))
    outputs = jnp.concatenate(outputs, -1)
    outputs = outputs.reshape(batch_dims + outputs.shape[1:])
    return outputs


class MultiDecoder(Module):
  """Splits CNN output channels back per image key; MLP heads for vectors
  (reference: nets.py:235-288)."""

  def __init__(self, name, shapes, inputs=('tensor',), cnn_keys=r'.*',
               mlp_keys=r'.*', mlp_layers=4, mlp_units=512, cnn='simple',
               cnn_depth=48, cnn_kernels=(5, 5, 6, 6), cnn_blocks=2,
               image_dist='mse', **kw):
    super().__init__(name)
    excluded = ('is_first', 'is_last', 'is_terminal', 'reward')
    shapes = {k: v for k, v in shapes.items() if k not in excluded}
    self.cnn_shapes = {
        k: v for k, v in shapes.items()
        if re.match(cnn_keys, k) and len(v) == 3}
    self.mlp_shapes = {
        k: v for k, v in shapes.items()
        if re.match(mlp_keys, k) and len(v) == 1}
    self.shapes = {**self.cnn_shapes, **self.mlp_shapes}
    if self.cnn_shapes:
      merged_shapes = list(self.cnn_shapes.values())
      assert all(x[:-1] == merged_shapes[0][:-1] for x in merged_shapes)
      merged = merged_shapes[0][:-1] + (
          sum(x[-1] for x in merged_shapes),)
      if cnn == 'simple':
        self._cnn = self.sub(
            'cnn', ImageDecoderSimple, merged, cnn_depth, cnn_kernels, **kw)
      elif cnn == 'resnet':
        self._cnn = self.sub(
            'cnn', ImageDecoderResnet, merged, cnn_depth, cnn_blocks, **kw)
      else:
        raise NotImplementedError(cnn)
    if self.mlp_shapes:
      self._mlp = self.sub(
          'mlp', MLP, self.mlp_shapes, mlp_layers, mlp_units, **kw)
    self._inputs = Input(inputs)
    self._image_dist = image_dist

  def __call__(self, inputs):
    features = self._inputs(inputs)
    dists = {}
    if self.cnn_shapes:
      flat = features.reshape([-1, features.shape[-1]])
      output = self._cnn(flat)
      output = output.reshape(features.shape[:-1] + output.shape[1:])
      split_sizes = [v[-1] for v in self.cnn_shapes.values()]
      means = jnp.split(output, np.cumsum(split_sizes)[:-1].tolist(), -1)
      dists.update({
          key: self._make_image_dist(key, mean)
          for (key, shape), mean in zip(self.cnn_shapes.items(), means)})
    if self.mlp_shapes:
      dists.update(self._mlp(features))
    return dists

  def _make_image_dist(self, name, mean):
    mean = f32(mean)
    if self._image_dist == 'normal':
      return distslib.Independent(distslib.Normal(mean, 1.0), 3)
    if self._image_dist == 'mse':
      return distslib.MSEDist(mean, 3, 'sum')
    raise NotImplementedError(self._image_dist)


class ImageEncoderSimple(Module):
  """Stride-2 valid convs with doubling depth (reference: nets.py:291-305)."""

  def __init__(self, name, depth, kernels, **kw):
    super().__init__(name)
    self._depth = depth
    self._kernels = kernels
    self._kw = kw

  def __call__(self, x):
    x = cast(f32(x))
    depth = self._depth
    for i, kernel in enumerate(self._kernels):
      x = self.sub(
          f'conv{i}', Conv2D, depth, kernel, stride=2, pad='valid',
          **self._kw)(x)
      depth *= 2
    return x


class ImageDecoderSimple(Module):
  """Transposed convs, sigmoid output (reference: nets.py:308-327)."""

  def __init__(self, name, shape, depth, kernels, **kw):
    super().__init__(name)
    self._shape = shape
    self._depth = depth
    self._kernels = kernels
    self._kw = kw

  def __call__(self, features):
    x = cast(features)
    x = x.reshape([-1, 1, 1, x.shape[-1]])
    depth = self._depth * 2 ** (len(self._kernels) - 2)
    for i, kernel in enumerate(self._kernels[:-1]):
      x = self.sub(
          f'conv{i}', Conv2D, depth, kernel, transp=True, stride=2,
          pad='valid', **self._kw)(x)
      depth //= 2
    x = self.sub(
        'out', Conv2D, self._shape[-1], self._kernels[-1], transp=True,
        stride=2, pad='valid')(x)
    x = jax.nn.sigmoid(x)
    assert x.shape[-3:] == self._shape, (x.shape, self._shape)
    return x


class ImageEncoderResnet(Module):
  """Preact residual blocks, x0.1 residual scale (reference: nets.py:330-358)."""

  def __init__(self, name, depth, blocks, **kw):
    super().__init__(name)
    self._depth = depth
    self._blocks = blocks
    self._kw = {**kw, 'preact': True}

  def __call__(self, image):
    x = cast(f32(image))
    stages = int(np.log2(image.shape[-2])) - 2
    depth = self._depth
    x = self.sub('in', Conv2D, depth, 3)(x)
    for i in range(stages):
      x = jax.lax.reduce_window(
          x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), 'SAME') / 4.0
      for j in range(self._blocks):
        x = self._block(f's{i}b{j}', depth, x)
      depth *= 2
    x = x.reshape([x.shape[0], int(np.prod(x.shape[1:]))])
    x = self.sub('out', Linear, 1024)(x)
    return x

  def _block(self, name, depth, x):
    skip = x
    if skip.shape[-1] != depth:
      skip = self.sub(f'{name}s', Conv2D, depth, 1, bias=False)(skip)
    x = self.sub(f'{name}a', Conv2D, depth, 3, **self._kw)(x)
    x = self.sub(f'{name}b', Conv2D, depth, 3, **self._kw)(x)
    return skip + 0.1 * x


class ImageDecoderResnet(Module):
  """Residual upsampling decoder (reference: nets.py:361-391)."""

  def __init__(self, name, shape, depth, blocks, **kw):
    super().__init__(name)
    self._shape = shape
    self._depth = depth
    self._blocks = blocks
    self._kw = {**kw, 'preact': True}

  def __call__(self, features):
    x = cast(features)
    stages = int(np.log2(self._shape[0])) - 2
    depth = 2 ** stages * self._depth
    x = self.sub('in', Linear, 16 * depth)(x)
    x = x.reshape([-1, 4, 4, depth])
    for i in range(stages):
      for j in range(self._blocks):
        x = self._block(f's{i}b{j}', depth, x)
      x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)  # Nearest upsample.
      depth //= 2
    x = self.sub('out', Conv2D, self._shape[-1], 3)(x)
    x = jax.nn.sigmoid(x)
    return x

  def _block(self, name, depth, x):
    skip = x
    if skip.shape[-1] != depth:
      skip = self.sub(f'{name}s', Conv2D, depth, 1, bias=False)(skip)
    x = self.sub(f'{name}a', Conv2D, depth, 3, **self._kw)(x)
    x = self.sub(f'{name}b', Conv2D, depth, 3, **self._kw)(x)
    return skip + 0.1 * x


class MLP(Module):
  """Shape-dict-aware MLP with distribution heads (reference: nets.py:394-425)."""

  def __init__(self, name, shape, layers, units, inputs=('tensor',),
               dims=None, **kw):
    super().__init__(name)
    assert shape is None or isinstance(shape, (int, tuple, dict)), shape
    if isinstance(shape, int):
      shape = (shape,)
    self._shape = shape
    self._layers = layers
    self._units = units
    self._inputs = Input(inputs, dims=dims)
    distkeys = ('dist', 'outscale', 'minstd', 'maxstd', 'outnorm', 'unimix')
    self._dense = {k: v for k, v in kw.items() if k not in distkeys}
    self._dist = {k: v for k, v in kw.items() if k in distkeys}
    if self._dist.get('dist') == 'none':
      self._dist.pop('dist')
      self._shape = None if shape is None else shape

  def __call__(self, inputs):
    feat = self._inputs(inputs)
    x = cast(feat)
    for i in range(self._layers):
      x = self.sub(f'dense{i}', Linear, self._units, **self._dense)(x)
    if self._shape is None:
      return x
    elif isinstance(self._shape, tuple):
      return self._out('out', self._shape, x)
    elif isinstance(self._shape, dict):
      return {k: self._out(k, v, x) for k, v in self._shape.items()}
    else:
      raise ValueError(self._shape)

  def _out(self, name, shape, x):
    return self.sub(f'dist_{name}', DistLayer, shape, **self._dist)(x)


class DistLayer(Module):
  """Output head producing a distribution (reference: nets.py:428-492)."""

  def __init__(self, name, shape, dist='mse', outscale=0.1, minstd=0.1,
               maxstd=1.0, unimix=0.0):
    super().__init__(name)
    assert all(isinstance(dim, int) for dim in shape), shape
    self._shape = shape
    self._dist = dist
    self._minstd = minstd
    self._maxstd = maxstd
    self._unimix = unimix
    self._outscale = outscale

  def __call__(self, inputs):
    out = self.sub(
        'out', Linear, int(np.prod(self._shape)) or 1,
        outscale=self._outscale)(inputs)
    if not self._shape:
      out = out[..., 0]
    else:
      out = out.reshape(inputs.shape[:-1] + tuple(self._shape))
    out = f32(out)
    if self._dist in ('normal', 'trunc_normal'):
      std = self.sub('std', Linear, int(np.prod(self._shape)) or 1)(inputs)
      if not self._shape:
        std = std[..., 0]
      else:
        std = std.reshape(inputs.shape[:-1] + tuple(self._shape))
      std = f32(std)
    if self._dist == 'symlog':
      return distslib.SymlogDist(out, len(self._shape), 'sum')
    if self._dist == 'mse':
      return distslib.MSEDist(out, len(self._shape), 'sum')
    if self._dist == 'normal':
      lo, hi = self._minstd, self._maxstd
      std = (hi - lo) * jax.nn.sigmoid(std) + lo
      dist = distslib.Independent(
          distslib.Normal(jnp.tanh(out), std), len(self._shape))
      dist.minent = float(
          np.prod(self._shape) * (0.5 * np.log(2 * np.pi * np.e)
                                  + np.log(lo)))
      dist.maxent = float(
          np.prod(self._shape) * (0.5 * np.log(2 * np.pi * np.e)
                                  + np.log(hi)))
      return dist
    if self._dist == 'binary':
      return distslib.Independent(
          distslib.Bernoulli(out), len(self._shape))
    if self._dist == 'trunc_normal':
      lo, hi = self._minstd, self._maxstd
      std = (hi - lo) * jax.nn.sigmoid(std) + lo
      dist = distslib.Independent(
          distslib.TruncNormal(jnp.tanh(out), std, -1, 1), 1)
      dist.minent = float(
          np.prod(self._shape) * (0.5 * np.log(2 * np.pi * np.e)
                                  + np.log(lo)))
      dist.maxent = float(
          np.prod(self._shape) * (0.5 * np.log(2 * np.pi * np.e)
                                  + np.log(hi)))
      return dist
    if self._dist == 'onehot':
      if self._unimix:
        probs = jax.nn.softmax(out, -1)
        uniform = jnp.ones_like(probs) / probs.shape[-1]
        probs = (1 - self._unimix) * probs + self._unimix * uniform
        out = jnp.log(probs)
      dist = distslib.OneHotDist(out)
      if len(self._shape) > 1:
        dist = distslib.Independent(dist, len(self._shape) - 1)
      dist.minent = 0.0
      dist.maxent = float(
          np.prod(self._shape[:-1]) * np.log(self._shape[-1]))
      return dist
    raise NotImplementedError(self._dist)
