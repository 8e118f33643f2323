"""JAX backend wrapper: device placement, jit, sharding, checkpointing.

TPU-native counterpart of the reference's TFAgent (reference:
embodied/agents/dreamerv2plus/tfagent.py:14-178). Key differences:

- One pjit program per entry point over a device mesh instead of
  tf.distribute strategies; batches are sharded on the `data` axis, the
  agent state (params + optimizer + controllers) is replicated, and XLA
  inserts the gradient collectives.
- Variable creation is an explicit eager pass on dummy zero batches built
  from the spaces at construction time, so the jitted functions never
  branch on creation.
- The agent state is a flat {name: array} dict; save/load use name-sorted
  zipping for parity with the reference checkpoint wire format
  (reference: tfutils.py:116-131).
"""

import collections
import functools
import threading

import numpy as np

import jax
import jax.numpy as jnp

from ... import nn
from ...parallel import mesh as meshlib


# A group of `steps` training batches already stacked along a leading axis
# and (usually) resident on device: the payload of the fused train path.
# `keys` holds the per-step host-side PER keys (or None).
Prestacked = collections.namedtuple('Prestacked', 'data keys steps')


class LazyMetrics(dict):
  """Metrics view that defers the device->host transfer until first read.

  The jitted train step returns all scalar metrics packed in one device
  array; materializing lazily lets the learner loop submit steps
  back-to-back (async dispatch pipelines over the device) and only sync
  when metrics are actually logged."""

  def __init__(self, names, packed, fused=False):
    super().__init__()
    self._names = names
    self._packed = packed
    self._fused = fused
    self._done = False

  @classmethod
  def materialize_all(cls, mets_list):
    """Fetch every pending packed array in ONE device_get.

    Materializing a long list one-by-one costs a device round-trip per
    entry (minutes per log flush on a high-latency tunneled backend);
    fetching the batch as a single pytree lets the backend pipeline the
    transfers."""
    pending = [m for m in mets_list
               if isinstance(m, cls) and not m._done]
    if pending:
      fetched = jax.device_get([m._packed for m in pending])
      for m, values in zip(pending, fetched):
        m._materialize(np.asarray(values))
    return mets_list

  def ensure_done(self):
    """Block until this dispatch has EXECUTED, via a one-element fetch.

    Used as loop backpressure: an async-dispatch loop can otherwise
    enqueue unboundedly far ahead of the device, making every later
    fetch (log flush, weight publish) wait behind minutes of backlog.
    A tiny device_get is used instead of block_until_ready because the
    latter returns before execution completes on the tunneled axon
    backend (see FUSED_DISPATCH_ANOMALY.json)."""
    if self._done or getattr(self, '_synced', False):
      return
    if self._packed is not None:
      index = (0,) * getattr(self._packed, 'ndim', 1)
      np.asarray(self._packed[index])
    self._synced = True

  def _materialize(self, values=None):
    if not self._done:
      values = np.asarray(self._packed) if values is None else values
      if self._fused:  # Fused multi-step train: [steps, metrics].
        assert values.ndim == 2, values.shape
        merged = {}
        for i, name in enumerate(self._names):
          col = values[:, i]
          # Extremes keep their meaning across the fused group; everything
          # else is averaged like the logger would over separate steps.
          if name.endswith('_max'):
            merged[name] = col.max()
          elif name.endswith('_min'):
            merged[name] = col.min()
          else:
            merged[name] = col.mean()
        super().update(merged)
      else:
        super().update(dict(zip(self._names, values)))
      self._done = True
      self._packed = None

  def __getitem__(self, key):
    self._materialize()
    return super().__getitem__(key)

  def __contains__(self, key):
    self._materialize()
    return super().__contains__(key)

  def __iter__(self):
    self._materialize()
    return super().__iter__()

  def __len__(self):
    self._materialize()
    return super().__len__()

  def keys(self):
    self._materialize()
    return super().keys()

  def values(self):
    self._materialize()
    return super().values()

  def items(self):
    self._materialize()
    return super().items()


def Wrapper(agent_cls):
  class Agent(JAXAgent):
    configs = agent_cls.configs
    inner = agent_cls

    def __init__(self, obs_space, act_space, step, config):
      super().__init__(agent_cls, obs_space, act_space, step, config)
  return Agent


class JAXAgent:

  def __init__(self, agent_cls, obs_space, act_space, step, config):
    self.config = config
    self.obs_space = obs_space
    self.act_space = act_space
    self._setup(config.jax)
    self.agent = agent_cls('agent', obs_space, act_space, step, config)
    self._jit = config.jax.jit
    self._seed = np.random.SeedSequence(config.seed)
    self._counter = 0

    self._pure_policy = nn.pure(self.agent.policy)
    self._pure_train = nn.pure(self.agent.train)
    self._pure_report = nn.pure(self.agent.report)
    # Jitted train packs the ~100 scalar metrics into ONE stacked array so
    # fetching them is a single small transfer instead of one round trip
    # per scalar (significant over a tunneled TPU connection).
    self._metric_names = None

    def train_packed(state, seed, data, carry):
      (outs, carry, mets), varibs = self._pure_train(
          state, seed, data, carry)
      names = sorted(mets.keys())
      packed = jnp.stack([jnp.asarray(mets[k], jnp.float32)
                          for k in names])
      return (outs, carry, packed), varibs

    self._pure_train_packed = train_packed

    # Fused-dispatch metric policy: 'all' packs every update's metrics
    # (averaged at fetch time); 'last' packs only the final update's, so
    # XLA dead-code-eliminates the ~80 per-update metric reductions in the
    # other K-1 updates (the reference likewise logs the current step's
    # metrics when the log cadence fires, not an average; tfutils metrics
    # are read per logged step).
    self._fused_metrics = str(config.jax.get('fused_metrics', 'all'))

    def train_multi_packed(state, seeds, datas, carry):
      # K gradient updates inside ONE device dispatch: a lax.scan over the
      # train step threading the full agent state. Amortizes per-dispatch
      # overhead (host->device RPC latency dominates small-model steps on
      # tunneled backends) and lets XLA keep the state in HBM across steps.
      def body(loop, inp):
        varibs, carry = loop
        seed, data = inp
        (outs, carry, packed), varibs = train_packed(
            varibs, seed, data, carry)
        return (varibs, carry), (outs, packed)
      if self._fused_metrics == 'last':
        def quiet(loop, inp):
          (varibs, carry), (outs, _) = body(loop, inp)
          return (varibs, carry), outs
        head = jax.tree.map(lambda x: x[:-1], (seeds, datas))
        tail = jax.tree.map(lambda x: x[-1], (seeds, datas))
        (state, carry), outs_head = jax.lax.scan(
            quiet, (state, carry), head)
        (state, carry), (outs_tail, packed) = body((state, carry), tail)
        outs = jax.tree.map(
            lambda h, t: jnp.concatenate([h, t[None]], 0),
            outs_head, outs_tail)
        return (outs, carry, packed[None]), state
      (state, carry), (outs, packeds) = jax.lax.scan(
          body, (state, carry), (seeds, datas))
      return (outs, carry, packeds), state

    self._pure_train_multi = train_multi_packed

    def train_device_packed(state, seeds, buffers, filled, cursor, carry):
      # K gradient updates sampling straight from the device-resident
      # replay ring: no per-update host->device transfer at all (the
      # TPU-native replacement for the reference's tf.data feed; see
      # replay/device_replay.py).
      from ...replay import device_replay as drlib
      B = self.config.batch_size
      chunk = self.config.replay_chunk
      # Match the host FixedLength sampler's episode-boundary oversampling
      # so run=learning has the same data distribution on both paths.
      prio_ends = float(self.config.replay_fixed.prio_ends)

      def body(loop, seed):
        varibs, carry = loop
        key = jax.random.PRNGKey(seed)
        skey, tkey = jax.random.split(key)
        batch = drlib.sample(
            (buffers, filled, cursor), skey, B, chunk, prio_ends)
        (outs, carry, packed), varibs = train_packed(
            varibs, tkey, batch, carry)
        return (varibs, carry), packed

      if self._fused_metrics == 'last':
        def quiet(loop, seed):
          loop, _ = body(loop, seed)
          return loop, None
        (state, carry), _ = jax.lax.scan(
            quiet, (state, carry), seeds[:-1])
        (state, carry), packed = body((state, carry), seeds[-1])
        return (carry, packed[None]), state
      (state, carry), packeds = jax.lax.scan(body, (state, carry), seeds)
      return (carry, packeds), state

    self._pure_train_device = train_device_packed

    def train_device_per_packed(
        state, seeds, buffers, filled, cursor, prios, carry):
      # Device-side PER: priority-proportional window sampling AND the
      # priority feedback loop run inside the fused dispatch. The priority
      # ring threads through the scan, so update K sees the priorities
      # written by update K-1 (restores the host Prioritized sampler's
      # capability on the fastest learner path).
      from ...replay import device_replay as drlib
      B = self.config.batch_size
      chunk = self.config.replay_chunk
      exponent = float(self.config.replay_prio.exponent)
      constant = float(self.config.replay_prio.constant)

      def body(loop, seed):
        varibs, carry, prios = loop
        key = jax.random.PRNGKey(seed)
        skey, tkey = jax.random.split(key)
        batch, rows = drlib.sample_prioritized(
            (buffers, filled, cursor), prios, skey, B, chunk,
            exponent, constant)
        (outs, carry, packed), varibs = train_packed(
            varibs, tkey, batch, carry)
        fresh = jnp.asarray(outs['priority'], jnp.float32).reshape(-1)
        prios = prios.at[rows.reshape(-1)].set(fresh)
        return (varibs, carry, prios), packed

      if self._fused_metrics == 'last':
        def quiet(loop, seed):
          loop, _ = body(loop, seed)
          return loop, None
        (state, carry, prios), _ = jax.lax.scan(
            quiet, (state, carry, prios), seeds[:-1])
        (state, carry, prios), packed = body((state, carry, prios), seeds[-1])
        return (carry, packed[None], prios), state
      (state, carry, prios), packeds = jax.lax.scan(
          body, (state, carry, prios), seeds)
      return (carry, packeds, prios), state

    self._pure_train_device_per = train_device_per_packed
    self._pure_policy_initial = nn.pure(self.agent.policy_initial)
    self._pure_train_initial = nn.pure(self.agent.train_initial)

    self.varibs = {}
    self._created = False

    # Host-CPU policy mirror (jax.policy_devices == 'cpu'): the policy jit
    # runs on the host against a periodically-refreshed subset of the
    # parameters. On tunneled/remote TPU backends every policy call pays
    # the link round-trip (~50-100ms), which dominates real-time actors
    # (robot budget: ~50ms at 20Hz, reference: robot_interface.py:293);
    # the nets are small enough that host inference takes single-digit ms.
    # The mirror refreshes at most every `policy_sync` train steps, giving
    # the same staleness semantics as the reference's actor/learner
    # checkpoint polling (reference: acting.py:82-96) without the file.
    self._policy_read_log = set()
    self._policy_device = None
    if str(config.jax.policy_devices) == 'cpu':
      try:
        self._policy_device = jax.local_devices(backend='cpu')[0]
      except RuntimeError:
        self._policy_device = None
    self._policy_sync = int(config.jax.get('policy_sync', 64))
    self._mirror = None
    self._mirror_at = -1
    self._train_steps = 0
    # Device-resident policy RNG: the key threads through the jitted call
    # (split inside), so the steady-state policy pays no per-call seed
    # upload or host SeedSequence work — one less round trip per robot
    # step on tunneled backends.
    self._policy_rng = None
    self._policy_rng_dev = False  # Sentinel != None: force first init.
    # The key read-modify-write in policy() is guarded so two in-process
    # callers (e.g. an eval driver alongside acting) can never consume the
    # same key and emit identical action noise.
    self._policy_rng_lock = threading.Lock()

    if self._jit:
      # Shardings declared on the jit itself: host numpy batches are
      # passed straight in and XLA overlaps the h2d transfer with
      # dispatch (an explicit device_put per call costs ~10x the step
      # time on tunneled TPU backends). On a single-device mesh we skip
      # the annotations entirely: they add compile time for no benefit.
      #
      # Buffer donation is intentionally NOT used: on tunneled backends
      # donating the 10-100MB agent state costs ~500x the step time
      # (measured 802ms vs 1.6ms per step); without donation XLA
      # double-buffers the state in HBM, which is cheap.
      multi = self.mesh.devices.size > 1
      repl = self._repl_sharding
      data_sh = self._data_sharding
      train_kw = dict(
          in_shardings=(repl, repl, data_sh, data_sh),
          out_shardings=((repl, data_sh, repl), repl)) if multi else {}
      report_kw = dict(
          in_shardings=(repl, repl, data_sh)) if multi else {}
      init_kw = dict(out_shardings=(data_sh, repl)) if multi else {}
      multi_kw = dict(
          in_shardings=(
              repl, repl, meshlib.batch_sharded(self.mesh, leading=1),
              data_sh),
          out_shardings=((repl, data_sh, repl), repl)) if multi else {}
      self._jit_policy = jax.jit(
          self._keyed_policy, static_argnames=('mode',))
      device_kw = dict(
          in_shardings=(repl, repl, repl, repl, repl, data_sh),
          out_shardings=((data_sh, repl), repl)) if multi else {}
      device_per_kw = dict(
          in_shardings=(repl, repl, repl, repl, repl, repl, data_sh),
          out_shardings=((data_sh, repl, repl), repl)) if multi else {}
      self._jit_train = jax.jit(self._pure_train_packed, **train_kw)
      self._jit_train_multi = jax.jit(self._pure_train_multi, **multi_kw)
      self._jit_train_device = jax.jit(self._pure_train_device, **device_kw)
      self._jit_train_device_per = jax.jit(
          self._pure_train_device_per, **device_per_kw)
      self._jit_report = jax.jit(self._pure_report, **report_kw)
      self._jit_policy_initial = jax.jit(
          self._pure_policy_initial, static_argnums=(2,))
      self._jit_train_initial = jax.jit(
          self._pure_train_initial, static_argnums=(2,), **init_kw)
    else:
      self._jit_policy = self._keyed_policy
      self._jit_train = self._pure_train_packed
      self._jit_train_multi = self._pure_train_multi
      self._jit_train_device = self._pure_train_device
      self._jit_train_device_per = self._pure_train_device_per
      self._jit_report = self._pure_report
      self._jit_policy_initial = self._pure_policy_initial
      self._jit_train_initial = self._pure_train_initial

  def _setup(self, jaxcfg):
    if jaxcfg.platform == 'cpu':
      jax.config.update('jax_platforms', 'cpu')
    if jaxcfg.precision == 'bfloat16':
      nn.set_compute_dtype(jnp.bfloat16)
    elif jaxcfg.precision == 'float32':
      nn.set_compute_dtype(jnp.float32)
    else:
      raise NotImplementedError(jaxcfg.precision)
    if jaxcfg.debug_nans:
      jax.config.update('jax_debug_nans', True)
    # Persistent compilation cache: repeated runs skip the multi-minute
    # XLA compile. Defaults to a home-dir path (durable across reboots;
    # many boxes wipe /tmp). Set DAYDREAMER_COMPILE_CACHE to a path to
    # relocate it, or to '0' to disable (e.g. if a tunneled backend stalls
    # serializing large executables).
    import os
    cache = os.environ.get(
        'DAYDREAMER_COMPILE_CACHE',
        os.path.join(
            os.path.expanduser('~'), '.cache', 'daydreamer_tpu', 'xla'))
    if cache and cache != '0':
      try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update(
            'jax_persistent_cache_min_compile_time_secs', 1.0)
      except Exception:
        pass
    # Batch-parallel mesh over as many devices as divide the batch size.
    devices = jax.devices()
    n = len(devices)
    while self.config.batch_size % n:
      n -= 1
    self.mesh = meshlib.make_mesh({'data': n}, devices[:n])
    self._data_sharding = meshlib.batch_sharded(self.mesh)
    self._repl_sharding = meshlib.replicated(self.mesh)

  # -- creation --------------------------------------------------------------

  def _create(self):
    """Eager creation pass on dummy zero batches derived from the spaces.

    Runs on the host CPU backend regardless of the training platform: the
    creation pass dispatches thousands of tiny eager ops (python-loop
    scans), which would each round-trip to the TPU; param initial values
    are platform-independent and are replicated onto the mesh afterwards.
    """
    if self._created:
      return
    # Param shapes do not depend on batch dims, so create on a tiny batch;
    # T >= 8 keeps the report open-loop slicing valid.
    B, T = 2, 8
    data = self._dummy_batch(B, T)
    obs = {k: v[:, 0] for k, v in data.items()
           if k not in ('action', 'reset')}
    try:
      cpu = jax.local_devices(backend='cpu')[0]
    except RuntimeError:
      cpu = jax.devices()[0]
    with jax.default_device(cpu):
      varibs = self.varibs
      carry0, varibs = self._pure_train_initial(varibs, 0, B, create=True)
      (_, _, mets), varibs = self._pure_train(
          varibs, 0, data, carry0, create=True)
      self._metric_names = sorted(mets.keys())
      # Track the state subset the policy reads (all modes) so the CPU
      # policy mirror only transfers those entries, not optimizer state.
      log = self._policy_read_log
      state0, varibs = self._pure_policy_initial(
          varibs, 0, B, create=True, read_log=log)
      _, varibs = self._pure_policy(
          varibs, 0, obs, state0, mode='train', create=True, read_log=log)
      for mode in ('eval', 'explore'):
        _, varibs = self._pure_policy(
            varibs, 0, obs, state0, mode=mode, create=True, read_log=log)
      _, varibs = self._pure_report(varibs, 0, data, create=True)
      varibs = jax.device_get(varibs)
    self.varibs = meshlib.replicate(varibs, self.mesh)
    self._created = True
    params = sum(
        int(np.prod(v.shape)) for k, v in varibs.items()
        if nn.META.get(k, {}).get('trainable'))
    total = sum(int(np.prod(v.shape)) for v in varibs.values())
    print(f'Created agent state: {params:,} trainable parameters, '
          f'{total:,} total values.')

  def _dummy_batch(self, B, T):
    data = {}
    for key, space in self.obs_space.items():
      if key.startswith('log_'):
        continue
      data[key] = np.zeros((B, T) + space.shape, space.dtype)
    for key, space in self.act_space.items():
      if key == 'reset':
        continue
      data[key] = np.zeros((B, T) + space.shape, space.dtype)
    data['is_first'][:, 0] = True
    return data

  def _next_seed(self):
    self._counter += 1
    return np.uint32(
        np.random.SeedSequence(
            (self.config.seed, self._counter)).generate_state(1)[0])

  # -- entry points ----------------------------------------------------------

  def _policy_varibs(self):
    """Parameters for the policy jit: the live state, or a host mirror.

    The mirror holds only the entries the policy actually reads (captured
    during creation) and refreshes from the training state at most every
    `policy_sync` train steps."""
    if self._policy_device is None:
      return self.varibs
    stale = self._mirror is None or (
        self._train_steps - self._mirror_at >= self._policy_sync
        and self._mirror_at != self._train_steps)
    if stale:
      subset = {k: self.varibs[k] for k in sorted(self._policy_read_log)
                if k in self.varibs}
      host = jax.device_get(subset)
      self._mirror = jax.device_put(host, self._policy_device)
      self._mirror_at = self._train_steps
    return self._mirror

  def _keyed_policy(self, varibs, key, obs, state, mode):
    """Policy step with the RNG key threaded through the call: the split
    happens inside the (jitted) program and the evolved key is returned,
    so the key never leaves the device between steps."""
    key, sub = jax.random.split(key)
    (outs, state), _ = self._pure_policy(varibs, sub, obs, state, mode=mode)
    return (outs, state), key

  def _policy_key(self):
    """The device-resident policy RNG key, (re)seeded from the host seed
    stream whenever the policy device changes (e.g. mirror toggling)."""
    dev = self._policy_device
    if self._policy_rng is None or self._policy_rng_dev is not dev:
      key = jax.random.PRNGKey(self._next_seed())
      if dev is not None:
        key = jax.device_put(key, dev)
      self._policy_rng = key
      self._policy_rng_dev = dev
    return self._policy_rng

  def policy(self, obs, state=None, mode='train'):
    self._create()
    obs = {k: np.asarray(v) for k, v in obs.items()}
    batch = len(obs['is_first'])
    varibs = self._policy_varibs()
    if state is None:
      state, _ = self._jit_policy_initial(varibs, self._next_seed(), batch)
    with self._policy_rng_lock:
      (outs, state), self._policy_rng = self._jit_policy(
          varibs, self._policy_key(), obs, state, mode=mode)
    outs = jax.device_get(outs)
    return outs, state

  def train(self, data, state=None):
    self._create()
    data = self._filter_data(data)
    keys = data.pop('key', None)  # Host-side PER keys (int64 uuid pairs).
    if state is None:
      batch = len(next(iter(data.values())))
      state, _ = self._jit_train_initial(
          self.varibs, self._next_seed(), batch)
    ((outs, state, packed), varibs) = self._jit_train(
        self.varibs, self._next_seed(), data, state)
    self.varibs = varibs
    self._train_steps += 1
    assert self._metric_names is not None  # Captured during creation.
    mets = LazyMetrics(self._metric_names, packed)
    if outs:
      outs = jax.device_get(outs)
    if keys is not None and 'priority' in outs:
      outs['key'] = keys
    return outs, state, mets

  def train_multi(self, datas, state=None):
    """Run len(datas) gradient updates in ONE device dispatch.

    Semantically equivalent to calling `train` once per batch (same pure
    step, same seed stream, TBPTT state threaded through), but the K steps
    run as a lax.scan inside a single jitted program: one host->device
    dispatch, one metrics fetch. On latency-dominated backends this
    multiplies learner throughput by ~K.

    Returns (outs, state, metrics) where outs arrays have a leading K axis
    (e.g. PER priorities per step) and metrics are averaged over the K
    steps.
    """
    self._create()
    if isinstance(datas, Prestacked):
      stacked, keys, steps = datas
    else:
      assert len(datas) >= 1
      datas = [self._filter_data(dict(d)) for d in datas]
      keys = [d.pop('key', None) for d in datas]
      stacked = {
          k: np.stack([d[k] for d in datas]) for k in datas[0].keys()}
      steps = len(datas)
    if state is None:
      batch = next(iter(stacked.values())).shape[1]
      state, _ = self._jit_train_initial(
          self.varibs, self._next_seed(), batch)
    # Drawn after the initial-state seed so the seed stream matches K
    # sequential `train` calls exactly (tested in tests/test_agent.py).
    seeds = np.stack([self._next_seed() for _ in range(steps)])
    ((outs, state, packeds), varibs) = self._jit_train_multi(
        self.varibs, seeds, stacked, state)
    self.varibs = varibs
    self._train_steps += steps
    assert self._metric_names is not None
    mets = LazyMetrics(self._metric_names, packeds, fused=True)
    if outs:
      outs = jax.device_get(outs)
    if keys and keys[0] is not None and 'priority' in outs:
      outs['key'] = np.stack(keys)
    return outs, state, mets

  def device_feed(self, source, steps):
    """Iterator of Prestacked groups for `train_multi`, one group ahead.

    Pulls `steps` batches from `source`, stacks them along a leading axis
    (GIL-released C++ gather), and starts their host->device transfer one
    group before the consumer needs it: jax dispatch is asynchronous, so
    the stack+upload of group N+1 runs while the device still trains on
    group N (reference capability: tf.data prefetch-to-device,
    agent.py:108-121; here the transfer is the explicit pipeline stage
    because the TPU link, not sampling, is the learner-side cost).
    Deliberately single-threaded: a background producer thread starves
    under the learner thread's GIL pressure on congested backends, while
    inline production simply fills the device-compute gap.
    """
    self._create()
    sharding = None
    if len(self.mesh.devices.flat) > 1:
      sharding = meshlib.batch_sharded(self.mesh, leading=1)
    from ...replay.batcher import native_stack
    it = iter(source)

    def produce():
      datas = [self._filter_data(dict(next(it))) for _ in range(steps)]
      keys = [d.pop('key', None) for d in datas]
      stacked = native_stack(datas)
      if sharding is not None:
        stacked = jax.device_put(stacked, sharding)
      else:
        stacked = jax.device_put(stacked)
      return Prestacked(stacked, keys, steps)

    def groups():
      while True:
        # Produced on demand: the consumer's previous group is still
        # training (async dispatch), so stack+upload overlap with it.
        yield produce()

    return groups()

  def train_device(self, replay, steps, state=None):
    """Run `steps` gradient updates sampling from a DeviceReplay.

    One device dispatch: chunk sampling (uniform windows over the
    device-resident step ring) AND the K train steps run inside a single
    jitted program, so no training data crosses the host->device link.
    PER is not available on this path (uniform sampling only).

    Returns (outs, state, metrics) like `train`, with outs empty.
    """
    self._create()
    assert replay.filled >= replay.chunk, (replay.filled, replay.chunk)
    assert replay.chunk == self.config.replay_chunk, (
        replay.chunk, self.config.replay_chunk)
    if state is None:
      state, _ = self._jit_train_initial(
          self.varibs, self._next_seed(), self.config.batch_size)
    seeds = np.stack([self._next_seed() for _ in range(steps)])
    buffers, filled, cursor = replay.state
    if getattr(replay, 'prioritized', False):
      assert replay.prios is not None
      ((state, packeds, prios), varibs) = self._jit_train_device_per(
          self.varibs, seeds, buffers, filled, cursor, replay.prios, state)
      replay.prios = prios
    else:
      ((state, packeds), varibs) = self._jit_train_device(
          self.varibs, seeds, buffers, filled, cursor, state)
    self.varibs = varibs
    self._train_steps += steps
    assert self._metric_names is not None
    mets = LazyMetrics(self._metric_names, packeds, fused=True)
    return {}, state, mets

  def train_device_cost(self, replay, steps, state):
    """XLA cost analysis of the fused sample+train program.

    Returns the compiler's estimate for ONE dispatch of `steps` updates
    ({'flops': ..., 'bytes accessed': ...}), or None when unavailable
    (jit disabled, or a backend without cost analysis). Divide flops by
    `steps` and by the measured step time for an MFU estimate against the
    chip's peak. The lowering reuses the already-compiled executable via
    the jit/persistent caches, so this costs no extra compile after the
    first train_device call."""
    if not self._jit:
      return None
    self._create()
    seeds = np.stack([self._next_seed() for _ in range(steps)])
    buffers, filled, cursor = replay.state
    try:
      if getattr(replay, 'prioritized', False):
        lowered = self._jit_train_device_per.lower(
            self.varibs, seeds, buffers, filled, cursor, replay.prios,
            state)
      else:
        lowered = self._jit_train_device.lower(
            self.varibs, seeds, buffers, filled, cursor, state)
      analysis = lowered.compile().cost_analysis()
    except Exception:
      return None
    if isinstance(analysis, (list, tuple)):
      analysis = analysis[0] if analysis else None
    return dict(analysis) if analysis else None

  def make_device_replay(self, capacity=None, block=None, prioritized=None):
    """Construct a DeviceReplay matching this agent's batch layout."""
    from ...replay.device_replay import DeviceReplay
    chunk = self.config.replay_chunk
    if block is None:
      block = min(64, chunk)  # Small blocks flush promptly at prefill.
    if capacity is None:
      capacity = int(self.config.replay_size)
    if prioritized is None:
      prioritized = str(self.config.replay) == 'prio'
    capacity = max(capacity, 2 * max(chunk, block))
    capacity = (capacity + block - 1) // block * block
    return DeviceReplay(capacity, chunk, block=block, prioritized=prioritized)

  def report(self, data):
    self._create()
    data = self._filter_data(data)
    data.pop('key', None)
    (report, _) = self._jit_report(self.varibs, self._next_seed(), data)
    return jax.device_get(report)

  def dataset(self, generator):
    loader = self.config.data_loader
    if loader == 'native' and hasattr(generator, '__self__'):
      # Threaded C++ batch assembly straight from the replay's store.
      from ...replay.batcher import NativeBatcher
      return NativeBatcher(generator.__self__, self.config.batch_size)
    from ...core import Prefetch
    return Prefetch(
        sources=[generator] * self.config.batch_size,
        workers=8, prefetch=4)

  def _filter_data(self, data):
    # jax.Arrays pass through untouched: on multi-host runs they are
    # globally sharded (host_local_batch) and cannot be fetched to numpy.
    return {
        k: v if isinstance(v, jax.Array) else np.asarray(v)
        for k, v in data.items() if not k.startswith('log_')}

  # -- checkpointing ---------------------------------------------------------

  def save(self):
    self._create()
    values = jax.device_get(self.varibs)
    count = int(sum(np.prod(x.shape) for x in values.values()))
    print(f'Saving agent with {len(values)} tensors and {count} values.')
    return values

  def save_policy(self):
    """Snapshot of ONLY the entries the policy reads (captured at
    creation) — the actor weight-sync payload. A fraction of the full
    state (no optimizer moments, no critic/decoder heads), so publishing
    it over a slow link fits a tight sync cadence where the full save
    cannot (measured 49.7s for the full 30M-value a1 state on the
    tunneled backend)."""
    self._create()
    subset = {k: self.varibs[k] for k in sorted(self._policy_read_log)
              if k in self.varibs}
    values = jax.device_get(subset)
    count = int(sum(np.prod(x.shape) for x in values.values()))
    print(f'Saving policy snapshot with {len(values)} tensors and '
          f'{count} values.')
    return values

  def load(self, values):
    self._create()
    existing = self.varibs
    count = int(sum(np.prod(x.shape) for x in values.values()))
    print(f'Loading agent with {len(values)} tensors and {count} values.')
    if set(values.keys()) == set(existing.keys()):
      loaded = {k: jnp.asarray(values[k]) for k in existing}
    elif set(values.keys()) < set(existing.keys()):
      # Partial (e.g. policy-only) snapshot: merge into the live state.
      loaded = {k: (jnp.asarray(values[k]) if k in values else existing[k])
                for k in existing}
    else:
      # Name-sorted zip load for wire-format parity with checkpoints that
      # used different module naming (reference: tfutils.py:116-131).
      src = [v for _, v in sorted(values.items())]
      dst = sorted(existing.keys())
      assert len(src) == len(dst), (len(src), len(dst))
      loaded = {}
      for key, value in zip(dst, src):
        assert existing[key].shape == value.shape, (
            key, existing[key].shape, value.shape)
        loaded[key] = jnp.asarray(value)
    self.varibs = meshlib.replicate(loaded, self.mesh)
    self._mirror = None  # Host policy mirror must refresh after a load.
