"""Section profiler with scopes and method wrapping.

Parity with the reference profiler (reference: embodied/core/timer.py:8-59):
context-manager ``scope(name)`` plus ``wrap(name, obj, methods)`` which
monkey-patches hot methods; ``stats()`` reports frac/min/avg/max/count per
section. Additionally exposes optional jax.profiler trace hooks for TPU runs.
"""

import collections
import contextlib
import time

import numpy as np


class Timer:

  def __init__(self, columns=('frac', 'avg', 'min', 'max', 'count')):
    available = ('frac', 'avg', 'min', 'max', 'sum', 'count')
    assert all(x in available for x in columns), columns
    self._columns = columns
    self._durations = collections.defaultdict(list)
    self._start = time.perf_counter()

  @contextlib.contextmanager
  def scope(self, name):
    start = time.perf_counter()
    try:
      yield
    finally:
      stop = time.perf_counter()
      self._durations[name].append(stop - start)

  def wrap(self, name, obj, methods):
    for method in methods:
      decorator = self.scope(f'{name}.{method}')
      setattr(obj, method, decorator(getattr(obj, method)))

  def stats(self, reset=True, log=False):
    now = time.perf_counter()
    passed = now - self._start
    metrics = {}
    metrics['duration'] = passed
    for name, durs in self._durations.items():
      available = {}
      available['count'] = len(durs)
      available['sum'] = np.sum(durs)
      available['frac'] = np.sum(durs) / passed
      if len(durs):
        available['avg'] = np.mean(durs)
        available['min'] = np.min(durs)
        available['max'] = np.max(durs)
      for key, value in available.items():
        if key in self._columns:
          metrics[f'{name}_{key}'] = value
    if log:
      self._log(metrics)
    if reset:
      self.reset()
    return metrics

  def reset(self):
    self._durations.clear()
    self._start = time.perf_counter()

  @contextlib.contextmanager
  def profile(self, logdir):
    """Capture a jax.profiler device trace for the enclosed scope; view in
    TensorBoard's profile plugin or Perfetto."""
    import jax
    jax.profiler.start_trace(str(logdir))
    try:
      yield
    finally:
      jax.profiler.stop_trace()

  def _log(self, metrics):
    names = self._durations.keys()
    names = sorted(names, key=lambda k: -metrics.get(f'{k}_frac', 0))
    print('Timer:'.ljust(20), ' '.join(x.rjust(8) for x in self._columns))
    for name in names:
      values = [metrics.get(f'{name}_{col}', np.nan) for col in self._columns]
      print(f'{name.ljust(20)}', ' '.join(f'{x:8.4f}' for x in values))


global_timer = Timer()
