"""Replay suite over the store x sampler matrix
(reference: embodied/tests/test_replay.py:11-170)."""

import numpy as np
import pytest

from daydreamer_tpu import replay as replaylib


def make_store(kind, tmp_path, capacity=None):
  if kind == 'ram':
    return replaylib.RAMStore(capacity)
  if kind == 'disk':
    return replaylib.DiskStore(str(tmp_path / 'eps'), capacity)
  if kind == 'ckpt':
    return replaylib.CkptRAMStore(str(tmp_path / 'eps'), capacity)
  raise NotImplementedError(kind)


def make_traj(length, value=0.0):
  return {
      'action': np.zeros((length, 2), np.float32),
      'reward': np.full(length, value, np.float32),
      'is_first': np.array([True] + [False] * (length - 1)),
      'is_last': np.array([False] * (length - 1) + [True]),
      'is_terminal': np.zeros(length, bool),
      'step': np.arange(length, dtype=np.int32),
  }


def add_episode(replay, length):
  for t in range(length):
    replay.add({
        'action': np.zeros(2, np.float32),
        'reward': np.float32(t),
        'is_first': t == 0,
        'is_last': t == length - 1,
        'is_terminal': False,
        'step': np.int32(t),
    })


STORES = ['ram', 'disk', 'ckpt']
SAMPLERS = ['fixed', 'consec']


def make_replay(sampler, store, chunk=4):
  if sampler == 'fixed':
    return replaylib.FixedLength(store, chunk=chunk)
  if sampler == 'consec':
    return replaylib.Consecutive(store, chunk=chunk)
  raise NotImplementedError(sampler)


@pytest.mark.parametrize('store_kind', STORES)
@pytest.mark.parametrize('sampler', SAMPLERS)
class TestMatrix:

  def test_add_and_sample(self, tmp_path, store_kind, sampler):
    store = make_store(store_kind, tmp_path)
    replay = make_replay(sampler, store, chunk=4)
    add_episode(replay, 10)
    assert len(replay) == 10
    chunk = next(replay.dataset())
    assert chunk['action'].shape == (4, 2)
    assert chunk['is_first'][0] or sampler == 'consec'

  def test_chunk_step_continuity(self, tmp_path, store_kind, sampler):
    store = make_store(store_kind, tmp_path)
    replay = make_replay(sampler, store, chunk=4)
    add_episode(replay, 10)
    chunk = next(replay.dataset())
    steps = chunk['step']
    assert ((np.diff(steps) == 1) | (steps[1:] == 0)).all()


class TestFixedLength:

  def test_skips_short(self, tmp_path, capsys):
    store = replaylib.RAMStore()
    replay = replaylib.FixedLength(store, chunk=8)
    add_episode(replay, 4)  # Shorter than chunk.
    assert len(replay) == 0

  def test_window_uniformity(self):
    store = replaylib.RAMStore()
    replay = replaylib.FixedLength(
        store, chunk=4, prio_starts=0.0, prio_ends=0.0)
    add_episode(replay, 8)
    starts = set()
    it = replay.dataset()
    for _ in range(200):
      starts.add(int(next(it)['step'][0]))
    assert starts == {0, 1, 2, 3, 4}

  def test_forces_is_first(self):
    store = replaylib.RAMStore()
    replay = replaylib.FixedLength(store, chunk=4)
    add_episode(replay, 10)
    chunk = next(replay.dataset())
    assert chunk['is_first'][0]
    assert not chunk['is_first'][1:].any()


class TestCapacity:

  def test_ram_eviction(self):
    store = replaylib.RAMStore(capacity=25)
    replay = replaylib.FixedLength(store, chunk=4)
    for _ in range(5):
      add_episode(replay, 10)
    assert len(replay) <= 25 or len(store) == 1

  def test_disk_reload(self, tmp_path):
    store = replaylib.DiskStore(str(tmp_path / 'eps'))
    replay = replaylib.FixedLength(store, chunk=4)
    add_episode(replay, 10)
    # New store re-scans the directory.
    store2 = replaylib.DiskStore(str(tmp_path / 'eps'))
    assert store2.steps == 10
    key = store2.keys()[0]
    traj = store2[key]
    assert traj['action'].shape == (10, 2)

  def test_ckpt_sync(self, tmp_path):
    store = replaylib.CkptRAMStore(str(tmp_path / 'eps'))
    replay = replaylib.FixedLength(store, chunk=4)
    add_episode(replay, 10)
    store2 = replaylib.CkptRAMStore(str(tmp_path / 'eps'))
    assert store2.steps == 10


class TestStats:

  def test_episode_stats(self):
    store = replaylib.Stats(replaylib.RAMStore())
    replay = replaylib.FixedLength(store, chunk=4)
    add_episode(replay, 10)
    add_episode(replay, 10)
    stats = store.stats()
    assert stats['episodes'] == 2
    assert stats['ep_length'] == 10
    assert stats['ep_return'] == sum(range(10))


class TestServerClient:

  def test_roundtrip(self):
    import socket
    with socket.socket() as s:
      s.bind(('', 0))
      port = s.getsockname()[1]
    store = replaylib.RAMStore()
    server = replaylib.StoreServer(store, port)
    client = replaylib.StoreClient(f'localhost:{port}')
    traj = make_traj(6, value=1.0)
    client['abc'] = traj
    keys = client.keys()
    assert keys == ('abc',)
    fetched = client['abc']
    assert (fetched['reward'] == 1.0).all()
    assert client.steps == 6


class TestDispatch:

  def test_round_robin(self):
    replays = [
        replaylib.FixedLength(replaylib.RAMStore(), chunk=4)
        for _ in range(2)]
    dispatch = replaylib.Dispatch(replays)
    add_episode(dispatch, 10)  # worker=0 -> first replay
    assert len(replays[0]) == 10
    assert len(replays[1]) == 0
    dispatch.add_traj(make_traj(8))
    dispatch.add_traj(make_traj(8))
    # add_traj round-robins across replays.
    assert len(replays[0]) == 18
    assert len(replays[1]) == 8
    assert len(dispatch) == 26
