"""Prioritized replay tests (reference: embodied/tests/test_replay.py plus
PER-specific behavior)."""

import numpy as np

from daydreamer_tpu import replay as replaylib


def add_episode(replay, length, reward=1.0):
  for t in range(length):
    replay.add({
        'action': np.zeros(2, np.float32),
        'reward': np.float32(reward),
        'is_first': t == 0,
        'is_last': t == length - 1,
        'is_terminal': False,
        'step': np.int32(t),
    })


def make(chunk=4, **kwargs):
  store = replaylib.RAMStore()
  return replaylib.Prioritized(store, chunk=chunk, **kwargs), store


class TestPrioritized:

  def test_sample_has_keys_and_probs(self):
    replay, store = make()
    add_episode(replay, 10)
    chunk = next(replay.dataset())
    assert chunk['action'].shape == (4, 2)
    assert chunk['key'].shape == (4, 3)  # uuid (16B) + index (8B) as int64.
    assert chunk['prob'].shape == (4,)
    assert chunk['is_first'][0]

  def test_prioritize_roundtrip(self):
    replay, store = make()
    add_episode(replay, 10)
    add_episode(replay, 10)
    batch_keys = []
    it = replay.dataset()
    for _ in range(3):
      chunk = next(it)
      batch_keys.append(chunk['key'])
    keys = np.stack(batch_keys)  # (B, chunk, 3)
    priorities = np.random.uniform(0.1, 1.0, (3, 4))
    replay.prioritize(keys, priorities)  # Should not raise.
    stats = replay.stats
    assert 'update_min' in stats

  def test_unseen_sampled_first(self):
    replay, store = make(fraction=1.0, prio_starts=0.0, prio_ends=0.0)
    add_episode(replay, 10)
    # Second episode with distinguishable reward.
    add_episode(replay, 10, reward=2.0)
    it = replay.dataset()
    chunk = next(it)
    key1 = tuple(chunk['key'][0].tolist())
    # Mark the first sampled window with zero priority; infinite-priority
    # episodes should dominate subsequent samples.
    seen_episodes = set()
    for _ in range(20):
      chunk = next(it)
      seen_episodes.add(bytes(chunk['key'][0, :2].tobytes()))
    assert len(seen_episodes) == 2

  def test_eviction_tolerated(self):
    store = replaylib.RAMStore(capacity=12)
    replay = replaylib.Prioritized(store, chunk=4)
    for _ in range(4):
      add_episode(replay, 10)
    # Priorities table still holds evicted episodes; sampling must recover.
    it = replay.dataset()
    for _ in range(10):
      chunk = next(it)
      assert chunk['action'].shape == (4, 2)


class TestPriorities:

  def test_two_level_sampling(self):
    agg = lambda p: np.convolve(np.abs(p), np.ones(4), 'valid')
    prios = replaylib.Priorities(agg, fraction=1.0, prio_starts=0,
                                 prio_ends=0)
    prios.add('a', np.full(10, np.inf, np.float64))
    prios.add('b', np.full(10, np.inf, np.float64))
    key, index, prob = prios.sample()
    assert key in ('a', 'b')
    assert 0 <= index <= 6
    assert 0 < prob <= 1

  def test_update_shifts_distribution(self):
    agg = lambda p: np.convolve(np.abs(p), np.ones(2), 'valid')
    prios = replaylib.Priorities(agg, fraction=1.0, prio_starts=0,
                                 prio_ends=0)
    prios.add('a', np.zeros(6, np.float64))
    prios.add('b', np.zeros(6, np.float64))
    prios.update('b', 0, np.full(6, 100.0))
    counts = {'a': 0, 'b': 0}
    for _ in range(50):
      key, _, _ = prios.sample()
      counts[key] += 1
    assert counts['b'] > counts['a']

  def test_save_load(self):
    agg = lambda p: np.convolve(np.abs(p), np.ones(2), 'valid')
    prios = replaylib.Priorities(agg)
    prios.add('a', np.ones(6, np.float64))
    data = prios.save()
    prios2 = replaylib.Priorities(agg)
    prios2.load(data)
    assert 'a' in prios2
