"""Sequential chunk streamer for TBPTT state carry-over.

Parity with the reference sampler (reference:
embodied/replay/consecutive.py:10-83): streams contiguous chunks through
whole episodes so the recurrent state carried between train calls stays
valid; optional random start offsets.
"""

import collections
import threading
import time
import uuid

import numpy as np

from ..core import base
from ..core.convert import convert


class Consecutive(base.Replay):

  def __init__(self, store, chunk=64, randomize=False, sync=0, seed=0):
    self.store = store
    self.chunk = chunk
    self.randomize = randomize
    self.random = np.random.RandomState(seed=seed)
    self.ongoing = collections.defaultdict(
        lambda: collections.defaultdict(list))
    if sync:
      self.last_scan = time.time()
      self.thread = threading.Thread(
          target=self._sync, args=(sync,), daemon=True)
      self.thread.start()

  def __len__(self):
    return self.store.steps

  @property
  def stats(self):
    return {f'replay_{k}': v for k, v in self.store.stats().items()}

  def add(self, tran, worker=0):
    if tran['is_first']:
      self.ongoing[worker].clear()
    episode = self.ongoing[worker]
    [episode[k].append(v) for k, v in tran.items()]
    if tran['is_last']:
      self.add_traj(self.ongoing.pop(worker))

  def add_traj(self, traj):
    traj = {k: v for k, v in traj.items() if not k.startswith('log_')}
    traj = {k: convert(v) for k, v in traj.items()}
    self.store[uuid.uuid4().hex] = traj

  def dataset(self):
    source, index = None, None
    while True:
      chunk, missing = None, self.chunk
      while missing > 0:
        if not source or index >= len(source['action']):
          source, index = self._sample(), 0
        if not chunk:
          chunk = {k: v[index: index + missing] for k, v in source.items()}
        else:
          chunk = {
              k: np.concatenate([chunk[k], v[index: index + missing]], 0)
              for k, v in source.items()}
        index += missing
        missing = self.chunk - len(chunk['action'])
      assert missing == 0, missing
      yield chunk

  def _sample(self):
    keys = self.store.keys()
    while not len(keys):
      print('Waiting for episodes.')
      time.sleep(1)
      keys = self.store.keys()
    traj = self.store[keys[self.random.randint(0, len(keys))]]
    if self.randomize:
      length = len(next(iter(traj.values())))
      start = self.random.randint(0, max(1, length - self.chunk))
      traj = {k: v[start:] for k, v in traj.items()}
      traj['is_first'][:1] = True
    return traj

  def _sync(self, interval):
    while True:
      time.sleep(max(0, self.last_scan + interval - time.time()))
      self.last_scan = time.time()
      self.store.sync()
