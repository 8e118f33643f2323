"""Shared orchestration pieces for the synchronous training run modes.

The reference repeats episode logging, replay prefill, and the train-burst
closure inside each run mode (embodied/run/train.py, train_eval.py,
train_fixed_eval.py). Here those live once: ``EpisodeReporter`` builds the
per-episode logging callbacks, ``fill_replay`` handles random prefill, and
``UpdateLoop`` owns the dataset iterator, TBPTT state, fused multi-update
dispatch, PER feedback, and metric aggregation.
"""

import collections
import re
import warnings

import numpy as np

from .. import core


def limit_inflight(mets_seq, max_inflight=3):
  """Backpressure for async-dispatch train loops.

  Dispatch is asynchronous: a loop that only enqueues can run thousands
  of updates ahead of the device, and then every later device fetch
  (log flush, weight publish) waits behind the whole backlog — measured
  as 250s log gaps and minutes-stale published weights in ASYNC_SOAK.
  Force completion of all but the newest `max_inflight` dispatches via
  their metrics handles (a one-element fetch each)."""
  pending = [m for m in mets_seq
             if getattr(m, '_done', True) is False
             and not getattr(m, '_synced', False)]
  cut = len(pending) - max_inflight
  for mets in pending[:max(cut, 0)]:
    mets.ensure_done()


def materialize_metrics(mets_list):
  """Batch-fetch pending lazy metric dicts before aggregation.

  Lazy metrics hold one packed device array each; reading a long list
  one-by-one costs a device round-trip per entry (minutes per log flush
  on a high-latency tunneled backend). Any metrics class exposing a
  `materialize_all` classmethod gets the whole list in one fetch."""
  for mets in mets_list:
    batched = getattr(type(mets), 'materialize_all', None)
    if batched is not None:
      return batched(mets_list)
  return mets_list


class EpisodeReporter:
  """Per-episode score/length/video logging with zero-suppression."""

  def __init__(self, logger, args, step):
    self._logger = logger
    self._args = args
    self._step = step
    self._ever_nonzero = set()

  def callback(self, replay, video_when, section='episode',
               logs_section='logs', label='Episode'):

    def on_episode(ep, worker):
      del worker
      args = self._args
      steps = len(ep['reward']) - 1
      ret = float(ep['reward'].astype(np.float64).sum())
      print(f'{label} has {steps} steps and return {ret:.1f}.')
      summary = {
          'length': steps,
          'score': ret,
          'reward_rate':
              float((ep['reward'] - ep['reward'].min() >= 0.1).mean()),
      }
      if video_when(self._step):
        for key in args.log_keys_video:
          if key in ep:
            summary[f'policy_{key}'] = ep[key]
      details = {}
      for key, column in ep.items():
        silent = key not in self._ever_nonzero and (column == 0).all()
        if silent and not args.log_zeros:
          continue
        self._ever_nonzero.add(key)
        if re.match(args.log_keys_sum, key):
          details[f'sum_{key}'] = column.sum()
        if re.match(args.log_keys_mean, key):
          details[f'mean_{key}'] = column.mean()
        if re.match(args.log_keys_max, key):
          details[f'max_{key}'] = column.max(0).mean()
      self._logger.add(summary, prefix=section)
      self._logger.add(details, prefix=logs_section)
      self._logger.add(replay.stats, prefix='replay')
      self._logger.write()

    return on_episode


def fill_replay(driver, act_space, replay, target, label):
  """Collect random-policy steps until the replay holds ``target`` steps."""
  need = max(0, int(target) - len(replay))
  if need:
    print(f'Fill {label} dataset ({need} steps).')
    driver(core.RandomAgent(act_space).policy, steps=need, episodes=1)
  return need


class UpdateLoop:
  """Gradient updates over a replay dataset with TBPTT state threading."""

  def __init__(self, agent, replay, args):
    self._agent = agent
    self._replay = replay
    self._dataset = iter(agent.dataset(replay.dataset))
    self._state = None
    # Possibly-lazy metric dicts, drained at flush. Bounded: wall-clock
    # log cadences can accumulate thousands of entries on a fast
    # learner; the logged value is a window mean either way.
    self._pending = collections.deque(maxlen=64)
    self.last_batch = None
    # Number of updates fused into one device dispatch, when supported.
    self._fused = max(1, int(getattr(args, 'train_fused', 1)))
    if self._fused > 1 and not hasattr(agent, 'train_multi'):
      self._fused = 1

  def pretrain(self, count):
    assert count > 0, 'At least one update is needed to build variables.'
    for _ in range(int(count)):
      self._single()

  def updates(self, count):
    count = int(count)
    if self._fused > 1 and count >= self._fused:
      for _ in range(count // self._fused):
        self._grouped()
      count %= self._fused
    for _ in range(count):
      self._single()

  def _single(self):
    self.last_batch = next(self._dataset)
    outs, self._state, mets = self._agent.train(
        self.last_batch, self._state)
    self._pending.append(mets)
    limit_inflight(self._pending)
    if 'priority' in outs:
      self._replay.prioritize(outs['key'], outs['priority'])

  def _grouped(self):
    batches = [next(self._dataset) for _ in range(self._fused)]
    self.last_batch = batches[-1]
    outs, self._state, mets = self._agent.train_multi(batches, self._state)
    self._pending.append(mets)
    limit_inflight(self._pending)
    if 'priority' in outs:
      for lane in range(self._fused):
        self._replay.prioritize(outs['key'][lane], outs['priority'][lane])

  def close(self):
    """Shut down the data loader's worker threads. Leaked loader threads
    outlive the run and can race with later in-process work (e.g. GL
    context creation in the same interpreter)."""
    closer = getattr(self._dataset, 'close', None)
    if closer:
      closer()

  def flush(self, logger, reports=()):
    """Log aggregated train metrics plus named report sections."""
    with warnings.catch_warnings():  # Empty windows produce nan slices.
      warnings.simplefilter('ignore', category=RuntimeWarning)
      merged = collections.defaultdict(list)
      materialize_metrics(list(self._pending))
      for mets in self._pending:
        for name, value in mets.items():
          merged[name].append(value)
      self._pending.clear()
      for name, values in merged.items():
        logger.scalar(f'train/{name}', np.nanmean(values, dtype=np.float64))
    for section, data in reports:
      logger.add(self._agent.report(data), prefix=section)
