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


# Raw priority assigned to steps never yet sampled. The host PER uses
# np.inf (unseen windows sample first); on device a large finite value
# keeps the categorical logits finite while still dominating sampling.
UNSEEN_PRIORITY = 1e6


class DeviceReplay:

  def __init__(self, capacity, chunk, block=64, sharding=None,
               prioritized=False):
    assert capacity % block == 0, (capacity, block)
    assert capacity >= 2 * max(chunk, block), (capacity, chunk, block)
    self.capacity = int(capacity)
    self.chunk = int(chunk)
    self.block = int(block)
    self.sharding = sharding
    self.prioritized = bool(prioritized)
    self.buffers = None    # {key: jnp [capacity, ...]} device rings.
    self.prios = None      # jnp [capacity] raw step priorities (PER).
    self.cursor = 0        # Next write row (multiple of block).
    self.filled = 0        # Valid rows (<= capacity).
    self._staged = []      # Host-side steps awaiting a full block.
    self._staged_count = 0
    self._scatter = jax.jit(self._scatter_impl, donate_argnums=0)
    self._mark_unseen = jax.jit(
        lambda p, c: jax.lax.dynamic_update_slice_in_dim(
            p, jnp.full((self.block,), UNSEEN_PRIORITY, jnp.float32), c, 0),
        donate_argnums=0)

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
    if self.prioritized:
      if self.prios is None:
        self.prios = jnp.zeros((self.capacity,), jnp.float32)
      self.prios = self._mark_unseen(self.prios, jnp.int32(self.cursor))
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
    self._cursor = 0       # Store insertion clock; sync is O(new trajs).
    self._seen = set()     # Fallback only, for stores without added_since.

  def sync(self):
    """Push steps of trajectories not yet mirrored; returns step count."""
    if hasattr(self.store, 'added_since'):
      fresh, self._cursor = self.store.added_since(self._cursor)
    else:
      fresh = [k for k in self.store.keys() if k not in self._seen]
      self._seen.update(fresh)
    added = 0
    for key in fresh:
      try:
        traj = self.store[key]
      except KeyError:
        continue  # Evicted between listing and fetch.
      steps = {k: np.asarray(v) for k, v in traj.items()
               if not k.startswith('log_')}
      self.device.add_steps(steps)
      added += len(next(iter(steps.values())))
    return added


def sample(state, rng, batch, chunk, prio_ends=0.0):
  """Draw a [batch, chunk, ...] dict from a DeviceReplay state.

  Pure function for use inside jit. Window starts are uniform over all
  rows whose windows hold valid, seam-free data:
  - ring not yet full: starts in [0, filled - chunk];
  - ring full: starts at cursor + [0, capacity - chunk] (mod capacity),
    so no window crosses the write seam at `cursor`.

  ``prio_ends`` reproduces the host FixedLength sampler's episode-boundary
  oversampling (fixed_length.py): each episode end inside the valid span
  contributes ``chunk * prio_ends`` virtual window positions that clip onto
  the window ending exactly at the episode's last step. Implemented as a
  mixture: with the matching probability, a lane samples uniformly among
  end-aligned windows instead of uniformly over all starts.
  """
  buffers, filled, cursor = state
  capacity = len(next(iter(buffers.values())))
  full = filled >= capacity
  span = jnp.where(full, capacity - chunk, jnp.maximum(filled - chunk, 0))
  base = jnp.where(full, cursor, 0)
  rng, rng_uni = jax.random.split(rng)
  offset = jax.random.randint(rng_uni, (batch,), 0, span + 1)
  if prio_ends and 'is_last' in buffers:
    rng_end, rng_mix = jax.random.split(rng)
    # Offsets are relative to `base`; roll the termination flags so index i
    # corresponds to offset i, then mask window-END offsets that are
    # episode ends and whose window start lies in the valid span.
    flags = jnp.roll(buffers['is_last'].astype(bool), -base)
    pos = jnp.arange(capacity)
    end_ok = flags & (pos >= chunk - 1) & (pos <= span + chunk - 1)
    n_ends = end_ok.sum()
    end_pick = jax.random.categorical(
        rng_end, jnp.where(end_ok, 0.0, -jnp.inf), shape=(batch,))
    end_offset = jnp.maximum(end_pick - (chunk - 1), 0)
    # Host-sampler equivalent mass: every episode end adds chunk*prio_ends
    # virtual positions on top of the span+1 uniform ones.
    extra = n_ends.astype(jnp.float32) * (chunk * prio_ends)
    gate = extra / (extra + span.astype(jnp.float32) + 1.0)
    take_end = (n_ends > 0) & (
        jax.random.uniform(rng_mix, (batch,)) < gate)
    offset = jnp.where(take_end, end_offset, offset)
  starts = (base + offset) % capacity
  rows = (starts[:, None] + jnp.arange(chunk)[None, :]) % capacity
  out = {k: jnp.take(v, rows, axis=0) for k, v in buffers.items()}
  if 'is_first' in out:
    out['is_first'] = out['is_first'].at[:, 0].set(True)
  return out


def sample_prioritized(state, prios, rng, batch, chunk,
                       exponent=0.5, constant=0.0):
  """Priority-proportional window sampling on device (fused-path PER).

  Device-side counterpart of the host Prioritized sampler
  (replay/prioritized.py): window weight = sum over the window of
  |priority|**exponent + constant (the host's conv(f(p), ones(chunk))
  aggregation), window start drawn from the categorical over valid
  starts, and `prob` returned for importance correction. Never-sampled
  steps carry UNSEEN_PRIORITY so fresh data is drawn first, mirroring the
  host's inf-priority-for-unseen. Window starts are offsets into the flat
  step ring (episodes back-to-back) rather than the host's two-level
  (episode, offset) table; boundary handling comes from the stored
  is_first flags as in uniform `sample`.

  Returns (chunk_dict incl. 'prob', rows [batch, chunk]) so the caller can
  scatter fresh priorities back into the ring after the train step.
  """
  buffers, filled, cursor = state
  capacity = len(next(iter(buffers.values())))
  full = filled >= capacity
  span = jnp.where(full, capacity - chunk, jnp.maximum(filled - chunk, 0))
  base = jnp.where(full, cursor, 0)
  # Window weights over all candidate offsets via a rolled cumsum.
  rolled = jnp.roll(prios, -base)
  stepw = jnp.abs(rolled) ** exponent + constant
  csum = jnp.concatenate([jnp.zeros((1,), stepw.dtype), jnp.cumsum(stepw)])
  offsets = jnp.arange(capacity - chunk + 1)
  weights = csum[offsets + chunk] - csum[offsets]
  weights = jnp.where(offsets <= span, jnp.maximum(weights, 1e-9), 0.0)
  total = weights.sum()
  logits = jnp.log(jnp.maximum(weights, 1e-30))
  rng, rng_pick = jax.random.split(rng)
  offset = jax.random.categorical(rng_pick, logits, shape=(batch,))
  prob = weights[offset] / total
  starts = (base + offset) % capacity
  rows = (starts[:, None] + jnp.arange(chunk)[None, :]) % capacity
  out = {k: jnp.take(v, rows, axis=0) for k, v in buffers.items()}
  if 'is_first' in out:
    out['is_first'] = out['is_first'].at[:, 0].set(True)
  out['prob'] = jnp.broadcast_to(
      prob.astype(jnp.float32)[:, None], (batch, chunk))
  return out, rows
