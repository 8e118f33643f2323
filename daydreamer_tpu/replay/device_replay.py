"""Device-resident replay: training data lives in TPU HBM.

TPU-native redesign of the learner-side data path (reference capability:
embodied/replay/fixed_length.py + tf.data feed, agent.py:108-121). The
reference re-feeds every sampled chunk over the host->device link; here
each step crosses the link exactly ONCE when added, and chunk sampling is
a gather that runs INSIDE the jitted train program. With the fused
multi-update train this removes the per-update transfer entirely — the
learner's steady-state is pure device compute.

Semantics: a flat ring of steps (capacity rows per key). Chunks are
uniform random windows over the step stream; episode boundaries inside a
window are handled by the stored `is_first` flags (the RSSM resets state
on is_first, nets.py obs_step masking), and `is_first[:, 0]` is forced
True like the reference sampler (fixed_length.py:79-80). Windows never
cross the ring's write seam.

Steps are flushed to the device in fixed `block`-row slabs so the scatter
program compiles once (capacity % block == 0 keeps the cursor aligned; a
partial tail stays staged host-side until it fills).
"""

import numpy as np

import jax
import jax.numpy as jnp


class DeviceReplay:

  def __init__(self, capacity, chunk, block=64, sharding=None):
    assert capacity % block == 0, (capacity, block)
    assert capacity >= 2 * max(chunk, block), (capacity, chunk, block)
    self.capacity = int(capacity)
    self.chunk = int(chunk)
    self.block = int(block)
    self.sharding = sharding
    self.buffers = None    # {key: jnp [capacity, ...]} device rings.
    self.cursor = 0        # Next write row (multiple of block).
    self.filled = 0        # Valid rows (<= capacity).
    self._staged = []      # Host-side steps awaiting a full block.
    self._staged_count = 0
    self._scatter = jax.jit(self._scatter_impl, donate_argnums=0)

  def __len__(self):
    return self.filled

  @staticmethod
  def _scatter_impl(buffers, slab, cursor):
    return {
        k: jax.lax.dynamic_update_slice_in_dim(buffers[k], slab[k], cursor, 0)
        for k in buffers}

  def add_steps(self, steps):
    """Append a {key: [n, ...]} dict of steps (host numpy) to the ring."""
    steps = {k: np.asarray(v) for k, v in steps.items()}
    n = len(next(iter(steps.values())))
    assert all(len(v) == n for v in steps.values()), (
        {k: v.shape for k, v in steps.items()})
    self._staged.append(steps)
    self._staged_count += n
    while self._staged_count >= self.block:
      self._flush_block()

  def _flush_block(self):
    merged = {}
    take, rest = [], []
    need = self.block
    for steps in self._staged:
      n = len(next(iter(steps.values())))
      if need <= 0:
        rest.append(steps)
      elif n <= need:
        take.append(steps)
        need -= n
      else:
        take.append({k: v[:need] for k, v in steps.items()})
        rest.append({k: v[need:] for k, v in steps.items()})
        need = 0
    self._staged = rest
    self._staged_count -= self.block
    merged = {
        k: np.concatenate([s[k] for s in take]) if len(take) > 1
        else take[0][k]
        for k in take[0]}
    if self.buffers is None:
      self.buffers = {}
      for key, value in merged.items():
        buf = jnp.zeros((self.capacity,) + value.shape[1:], value.dtype)
        if self.sharding is not None:
          buf = jax.device_put(buf, self.sharding)
        self.buffers[key] = buf
    assert set(merged) == set(self.buffers), (
        sorted(merged), sorted(self.buffers))
    slab = jax.device_put(merged)  # The one host->device crossing.
    # Cursor as a device scalar: keeps the scatter program compiled once.
    self.buffers = self._scatter(self.buffers, slab, jnp.int32(self.cursor))
    self.cursor = (self.cursor + self.block) % self.capacity
    self.filled = min(self.filled + self.block, self.capacity)

  @property
  def state(self):
    """(buffers, filled, cursor) pytree for passing into a jitted program."""
    return (self.buffers, jnp.int32(self.filled), jnp.int32(self.cursor))


class StoreMirror:
  """Incrementally mirrors a host replay store into a DeviceReplay.

  The host replay stays authoritative (persistence, ZMQ ingest,
  checkpoint/resume); the device ring holds the most recent
  `device.capacity` steps for on-device sampling. Each trajectory's steps
  cross the host->device link once, at mirror time.
  """

  def __init__(self, replay, device):
    self.store = replay.store
    self.device = device
    self.seen = set()

  def sync(self):
    """Push steps of trajectories not yet mirrored; returns step count."""
    added = 0
    for key in self.store.keys():
      if key in self.seen:
        continue
      traj = self.store[key]
      steps = {k: np.asarray(v) for k, v in traj.items()
               if not k.startswith('log_')}
      self.device.add_steps(steps)
      self.seen.add(key)
      added += len(next(iter(steps.values())))
    return added


def sample(state, rng, batch, chunk):
  """Draw a [batch, chunk, ...] dict from a DeviceReplay state.

  Pure function for use inside jit. Window starts are uniform over all
  rows whose windows hold valid, seam-free data:
  - ring not yet full: starts in [0, filled - chunk];
  - ring full: starts at cursor + [0, capacity - chunk] (mod capacity),
    so no window crosses the write seam at `cursor`.
  """
  buffers, filled, cursor = state
  capacity = len(next(iter(buffers.values())))
  full = filled >= capacity
  span = jnp.where(full, capacity - chunk, jnp.maximum(filled - chunk, 0))
  base = jnp.where(full, cursor, 0)
  offset = jax.random.randint(rng, (batch,), 0, span + 1)
  starts = (base + offset) % capacity
  rows = (starts[:, None] + jnp.arange(chunk)[None, :]) % capacity
  out = {k: jnp.take(v, rows, axis=0) for k, v in buffers.items()}
  if 'is_first' in out:
    out['is_first'] = out['is_first'].at[:, 0].set(True)
  return out
