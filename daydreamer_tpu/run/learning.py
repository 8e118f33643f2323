"""Learner half of the async actor/learner pair
(reference: embodied/run/learning.py:9-90).

No environment: episodes arrive through the replay's StoreServer (ZMQ) or a
shared-filesystem DiskStore sync; the train loop runs continuously on the
TPU; weights are published for actors every `sync_every` wall-clock seconds
via an atomically-written checkpoint file.
"""

import collections
import concurrent.futures
import time
import warnings

import numpy as np

from .. import core
from ..core import when as whenlib
from .common import limit_inflight, materialize_metrics


def learning(agent, train_replay, eval_replay, logger, args):
  logdir = core.Path(args.logdir)
  logdir.mkdirs()
  print('Logdir', logdir)
  should_sync = whenlib.Clock(args.sync_every)
  should_log = whenlib.Clock(args.sync_every)
  should_eval = whenlib.Every(args.eval_every)
  step = logger.step

  timer = core.Timer()
  timer.wrap('agent', agent, ['train', 'report', 'save'])
  if hasattr(train_replay, '_sample'):
    timer.wrap('replay', train_replay, ['_sample'])

  print('Initializing training replay...')
  dataset_train = iter(agent.dataset(train_replay.dataset))
  dataset_eval = None  # Initialized on first eval.

  agent_cp = core.Checkpoint(logdir / 'agent.pkl')
  agent_cp.agent = agent
  agent_cp.load_or_save()

  # Fast actor weight-sync channel: only the policy-read parameter subset
  # (if the agent supports it), published every sync tick; the full state
  # (optimizer moments, critics) goes to agent.pkl on a 10x slower clock
  # for learner crash-resume. Actors prefer policy.pkl when present.
  policy_cp = None
  if hasattr(agent, 'save_policy'):
    class _PolicySnapshot:
      def save(self):
        return agent.save_policy()
      def load(self, values):
        agent.load(values)
    policy_cp = core.Checkpoint(logdir / 'policy.pkl')
    policy_cp.agent = _PolicySnapshot()
  should_full_sync = whenlib.Clock(10 * args.sync_every)
  # Clocks fire on their first call; the full state was just written by
  # load_or_save, so consume the initial tick — otherwise the large
  # full-state fetch lands at loop start and, on slow links, queues the
  # first minutes of dispatches behind it.
  should_full_sync(step)

  learner_cp = core.Checkpoint(logdir / 'learner.pkl')
  learner_cp.train_replay = train_replay
  learner_cp.step = step
  learner_cp.load_or_save()

  # Wait for prefill data from at least one actor to avoid overfitting to
  # the first few episodes.
  while len(train_replay) < args.train_fill:
    print('Waiting for train data prefill '
          f'({len(train_replay)}/{args.train_fill})...')
    time.sleep(10)

  print('Initializing agent...')
  state = None
  # Possibly-lazy metric dicts, materialized (in one batched device
  # fetch) at log time. Bounded: on a fast learner thousands of entries
  # can accumulate between wall-clock log ticks, and fetching them all
  # once took minutes on a high-latency backend (ASYNC_SOAK) — the
  # logged value is a window mean either way, so the window is capped
  # at the most recent 64 dispatches.
  metrics = collections.deque(maxlen=64)

  print('Start loop...')
  batch = None
  feed = None
  publisher = concurrent.futures.ThreadPoolExecutor(
      max_workers=1, thread_name_prefix='weight-publish')
  publish = None
  fused = max(1, int(getattr(args, 'train_fused', 1)))
  # Device-resident replay: mirror episodes into TPU HBM once and let the
  # fused train program sample on-device — no per-update host->device
  # transfer at all. With a prioritized replay config the sampling AND the
  # priority feedback loop run device-side (jaxagent.train_device PER).
  mirror = None
  if (fused > 1 and getattr(args, 'device_replay', True)
      and hasattr(train_replay, 'store')):
    from ..replay.device_replay import StoreMirror
    from ..replay.prioritized import Prioritized
    capacity = int(getattr(args, 'device_replay_steps', 2e5))
    device_replay = agent.make_device_replay(capacity=capacity)
    mirror = StoreMirror(train_replay, device_replay)
    # NOTE: every Replay has a (no-op) `prioritize` method, so the PER
    # check must be by type — a hasattr check here once disabled the
    # device path for ALL uniform replays (regression-tested in
    # tests/test_run_modes.py).
    if isinstance(train_replay, Prioritized):
      if device_replay.prioritized:
        print('Prioritized replay runs DEVICE-SIDE: the host PER table is '
              'bypassed; priorities live in a device ring updated inside '
              'the fused train dispatch.')
      else:
        print('WARNING: host replay is prioritized but the device replay '
              'is not; falling back to host sampling.')
        mirror = None
    if mirror is not None:
      print('Device-resident replay engaged '
            f'(capacity {device_replay.capacity} steps).')
  try:
    while step < args.steps:
      on_device = False
      if mirror is not None:
        mirror.sync()
        on_device = device_replay.filled >= device_replay.chunk
      if on_device:
        # Device-resident replay: sampling AND the K updates run in one
        # jitted dispatch; no training data crosses the host->device link.
        outs, state, mets = agent.train_device(device_replay, fused, state)
        metrics.append(mets)
        limit_inflight(metrics)
        step.increment(fused)
      elif fused > 1:
        # Fused path: K gradient updates per device dispatch (the learner
        # has no per-step host work besides replay sampling, so batching
        # dispatches multiplies throughput on latency-bound backends), fed
        # by a host->device prefetch that overlaps the in-flight group.
        if feed is None:
          feed = agent.device_feed(dataset_train, fused)
        group = next(feed)
        outs, state, mets = agent.train_multi(group, state)
        metrics.append(mets)
        limit_inflight(metrics)
        if 'priority' in outs:
          for i in range(fused):
            train_replay.prioritize(outs['key'][i], outs['priority'][i])
        step.increment(fused)
      else:
        batch = next(dataset_train)
        outs, state, mets = agent.train(batch, state)
        metrics.append(mets)
        limit_inflight(metrics)
        if 'priority' in outs:
          train_replay.prioritize(outs['key'], outs['priority'])
        step.increment()

      if should_log(step):
        with warnings.catch_warnings():
          warnings.simplefilter('ignore', category=RuntimeWarning)
          materialize_metrics(list(metrics))
          lists = collections.defaultdict(list)
          for mets in metrics:
            for name, value in mets.items():
              lists[name].append(value)
          agg = {
              k: np.nanmean(x, dtype=np.float64) for k, x in lists.items()}
          logger.add(agg, prefix='train')
          metrics.clear()
        if feed is not None or mirror is not None or batch is None:
          # Fused/device paths: train batches live on device only; sample a
          # fresh host batch for the report.
          batch = next(dataset_train)
        logger.add(agent.report(batch), prefix='report')
        if dataset_eval:
          logger.add(agent.report(next(dataset_eval)), prefix='report_eval')
        logger.add(train_replay.stats, prefix='replay')
        logger.add(eval_replay.stats, prefix='replay_eval')
        logger.add(timer.stats(), prefix='timer')
        logger.write(fps=True)

      if should_sync(step):
        # Publish asynchronously: fetching the full agent state can take
        # tens of seconds on a tunneled backend (measured 49.7s for a
        # 30M-value a1 agent, ASYNC_SOAK.json), which would stall the
        # train loop for multiples of the sync cadence. One in-flight
        # publish at a time; a still-running one just skips this tick.
        # The per-tick payload is the policy-only snapshot; the full
        # state publishes on the 10x slower clock.
        if publish is None or publish.done():
          full = policy_cp is None or should_full_sync(step)
          def _publish(full=full):
            if policy_cp is not None:
              policy_cp.save()
            if full:
              agent_cp.save()
              learner_cp.save()
          publish = publisher.submit(_publish)
        else:
          print('Skipping weight publish: previous one still in flight.')

      if should_eval(step):
        if not len(eval_replay):
          # No eval actor is feeding this learner (yet); blocking on an
          # empty dataset would silently STOP training forever.
          print('Skipping evaluation: eval replay is empty.')
        else:
          print('Evaluation.')
          if not dataset_eval:
            print('Initializing eval replay...')
            dataset_eval = iter(agent.dataset(eval_replay.dataset))
          scalars = collections.defaultdict(list)
          for _ in range(args.eval_samples):
            for key, value in agent.report(next(dataset_eval)).items():
              if np.asarray(value).shape == ():
                scalars[key].append(value)
          logger.add(
              {k: np.mean(xs) for k, xs in scalars.items()}, prefix='eval')
          logger.write()
  finally:
    if publish is not None:
      publish.result()  # Surface publish errors; finish the last write.
    publisher.shutdown(wait=True)
    # Join loader threads on the exception path too; leaked Prefetch
    # workers race with later in-process work.
    for loader in (dataset_train, dataset_eval):
      if loader is not None:
        getattr(loader, 'close', lambda: None)()
