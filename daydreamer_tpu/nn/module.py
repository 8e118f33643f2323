"""Functional module system for JAX with a flat named state dict.

Design rationale (replacing the reference's Sonnet/tf.Variable stack,
reference: embodied/agents/dreamerv2plus/tfutils.py:96-140): every
parameter, optimizer slot, and controller statistic lives in ONE flat
``{'path/to/value': jnp.ndarray}`` dict that is threaded through pure
functions. This gives:

- stable, sorted flat naming -> checkpoint format parity with the
  reference's name-sorted save/load (tfutils.py:116-131);
- trivial sharding annotation (params replicated, batch sharded) because
  the whole train state is a single pytree;
- functional updates for the reference's mutable controllers (AutoAdapt,
  Normalize, slow-target counters, Adam moments) without breaking jit.

Usage: modules are built eagerly (no context); calls run inside a
``pure(fn)(state, seed, *args) -> (out, new_state)`` transform. The first
call with ``create=True`` runs eagerly (outside jit) on tiny data to
allocate values; subsequent calls are jitted.

Mutable-state writes must happen outside ``scan`` bodies; parameter reads
anywhere are fine (they become scan constants).
"""

import contextlib
import re

import jax
import jax.numpy as jnp
import numpy as np

COMPUTE_DTYPE = jnp.float32

# Static metadata (trainable flags) keyed by value path. Populated once at
# creation time; not part of the traced state pytree.
META = {}


def set_compute_dtype(dtype):
  global COMPUTE_DTYPE
  COMPUTE_DTYPE = dtype


def cast_to_compute(values):
  return jax.tree.map(
      lambda x: x.astype(COMPUTE_DTYPE)
      if jnp.issubdtype(x.dtype, jnp.floating) else x, values)


class _ReadLogDict(dict):
  """State dict that records every key returned through item access.

  Used to discover the exact state subset an entry point touches (e.g.
  which parameters the policy needs), so device mirrors can transfer only
  that subset."""

  def __init__(self, data, log):
    super().__init__(data)
    self.log = log

  def __getitem__(self, key):
    self.log.add(key)
    return super().__getitem__(key)

  def get(self, key, default=None):
    self.log.add(key)
    return super().get(key, default)


class Context:

  def __init__(self, state, rng, create=False, read_log=None):
    if read_log is None:
      self.state = dict(state)
    else:
      self.state = _ReadLogDict(state, read_log)
    self.rng = rng
    self.create = create

  def next_rng(self):
    self.rng, key = jax.random.split(self.rng)
    return key


_CONTEXT = []


def context():
  if not _CONTEXT:
    raise RuntimeError(
        'No active context. Call modules through nn.pure(fn)(state, seed).')
  return _CONTEXT[-1]


def creating():
  return bool(_CONTEXT) and _CONTEXT[-1].create


@contextlib.contextmanager
def _activate(ctx):
  _CONTEXT.append(ctx)
  try:
    yield ctx
  finally:
    _CONTEXT.pop()


def pure(fn):
  """Wrap a module-using function into (state, seed, *args) -> (out, state)."""

  def purified(state, seed, *args, create=False, read_log=None, **kwargs):
    if hasattr(seed, 'dtype') and jnp.issubdtype(
        getattr(seed, 'dtype', None), jax.dtypes.prng_key):
      rng = seed
    else:
      seed = jnp.asarray(seed)
      rng = jax.random.PRNGKey(seed) if seed.shape == () else seed
    ctx = Context(state, rng, create, read_log)
    with _activate(ctx):
      out = fn(*args, **kwargs)
    return out, ctx.state

  return purified


def rng():
  return context().next_rng()


def value_and_grad(lossfn, keys, *args, has_aux=True):
  """Differentiate lossfn w.r.t. the state entries named in `keys`.

  lossfn must return a scalar loss or (loss, *aux). State writes performed
  inside lossfn (metric accumulators etc.) persist via the aux channel.
  Returns (loss, params, grads, aux).
  """
  ctx = context()
  before = dict(ctx.state)
  params = {k: before[k] for k in keys}

  def forward(p):
    ctx.state.update(p)
    out = lossfn(*args)
    if isinstance(out, tuple):
      loss, aux = out[0], out[1:]
    else:
      loss, aux = out, ()
    return loss, (aux, dict(ctx.state))

  (loss, (aux, after)), grads = jax.value_and_grad(
      forward, has_aux=True)(params)
  ctx.state.clear()
  ctx.state.update(after)
  return loss, params, grads, aux


class Module:
  """Base class: explicit-name modules forming a `/`-separated path tree."""

  def __init__(self, name):
    assert isinstance(name, str) and re.match(r'^[A-Za-z0-9_/]+$', name), name
    self._path = name
    self._subs = {}

  @property
  def path(self):
    return self._path

  def __repr__(self):
    return f'{type(self).__name__}({self._path})'

  def sub(self, name, ctor=None, *args, **kwargs):
    """Get-or-create a named child module."""
    if name not in self._subs:
      assert ctor is not None, (self._path, name)
      self._subs[name] = ctor(f'{self._path}/{name}', *args, **kwargs)
    return self._subs[name]

  def value(self, name, init, *args, trainable=True, dtype=None):
    """Get-or-create a named state entry.

    `init` is either a concrete array/scalar or a callable taking a PRNG key
    (plus *args) and returning the initial value.
    """
    key = f'{self._path}/{name}'
    ctx = context()
    if key not in ctx.state:
      if not ctx.create:
        raise KeyError(
            f'Unknown state entry {key}. Run a creation pass first.')
      if callable(init):
        value = init(ctx.next_rng(), *args)
      else:
        value = jnp.asarray(init, dtype)
      ctx.state[key] = jnp.asarray(value, dtype)
      META[key] = {'trainable': trainable}
    return ctx.state[key]

  def write(self, name, value):
    """Functionally update a state entry (must already exist unless creating)."""
    key = f'{self._path}/{name}'
    ctx = context()
    if key not in ctx.state and not ctx.create:
      raise KeyError(f'Cannot write unknown state entry {key}.')
    ctx.state[key] = value
    if key not in META:
      META[key] = {'trainable': False}
    return value

  def read(self, name):
    return context().state[f'{self._path}/{name}']

  def keys(self, trainable=None, pattern=r'.*'):
    """All state keys under this module's path, filtered by trainability."""
    ctx = context()
    prefix = self._path + '/'
    regex = re.compile(pattern)
    result = []
    for key in ctx.state:
      if not (key.startswith(prefix) or key == self._path):
        continue
      if trainable is not None:
        if META.get(key, {}).get('trainable', False) != trainable:
          continue
      if regex.search(key):
        result.append(key)
    return sorted(result)


def scan(fn, inputs, start, unroll=1, reverse=False, modify=False):
  """Time-axis scan with per-step RNG threading.

  fn(carry, inp) -> new_carry; returns the stacked new-carries (matching the
  reference scan contract, reference: tfutils.py:50-70). ``unroll`` trades
  compile time for step time (the reference's biggest perf knob,
  reference: tests/test_xla_unroll.py). In creation mode runs an eager
  python loop so values can be allocated inside the body.
  """
  ctx = context()
  length = len(jax.tree.leaves(inputs)[0])
  keys = jax.random.split(ctx.next_rng(), length)
  outer_rng = ctx.rng  # Restore after the body consumed per-step keys.
  if ctx.create:
    indices = range(length)
    if reverse:
      indices = reversed(indices)
    last = start
    outputs = []
    for index in indices:
      ctx.rng = keys[index]
      inp = jax.tree.map(lambda x: x[index], inputs)
      last = fn(last, inp)
      outputs.append(last)
    if reverse:
      outputs = list(reversed(outputs))
    ctx.rng = outer_rng
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *outputs)

  def body(carry, xs):
    key, inp = xs
    ctx.rng = key
    new = fn(carry, inp)
    return new, new

  _, outs = jax.lax.scan(
      body, start, (keys, inputs), reverse=reverse, unroll=unroll)
  ctx.rng = outer_rng  # Drop the traced key leaked from the scan body.
  return outs
