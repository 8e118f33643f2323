"""Thread-pool batcher over generator sources (reference: embodied/core/prefetch.py:6-67).

N generator sources are drained round-robin by W worker threads into bounded
queues; batches stack source dicts along a new leading dimension. This is the
host-side data loader feeding `jax.device_put`; pair it with
`parallel.feed.DeviceFeed` for double-buffered device transfer.
"""

import queue as queuelib
import threading

import numpy as np


class Prefetch:

  def __init__(self, sources, workers=8, prefetch=4):
    self._sources = sources
    self._batch = len(sources)
    self._workers = min(workers, len(sources))
    self._queues = [
        queuelib.Queue(maxsize=prefetch) for _ in range(len(sources))]
    self._threads = []
    self._running = False

  def __iter__(self):
    self._start()
    return self

  def __next__(self):
    self._start()
    elems = [queue.get() for queue in self._queues]
    for elem in elems:
      if isinstance(elem, Exception):
        raise elem
    batch = {
        k: np.stack([elem[k] for elem in elems], 0)
        for k in elems[0].keys()}
    return batch

  def close(self):
    self._running = False

  def _start(self):
    if self._running:
      return
    self._running = True
    assignments = [[] for _ in range(self._workers)]
    for index in range(len(self._sources)):
      assignments[index % self._workers].append(index)
    for indices in assignments:
      thread = threading.Thread(
          target=self._worker, args=(indices,), daemon=True)
      thread.start()
      self._threads.append(thread)

  def _worker(self, indices):
    try:
      iterators = [self._sources[i]() for i in indices]
      while self._running:
        for index, iterator in zip(indices, iterators):
          self._queues[index].put(next(iterator))
    except Exception as e:
      for index in indices:
        self._queues[index].put(e)
      raise
