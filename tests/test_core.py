"""Unit tests for the pure-Python core runtime."""

import pathlib
import pickle

import numpy as np
import pytest

import daydreamer_tpu as ddt


class TestSpace:

  def test_box(self):
    space = ddt.Space(np.float32, (3,), -1.0, 1.0)
    assert space.shape == (3,)
    assert not space.discrete
    assert space.sample() in space
    assert np.zeros(3, np.float32) in space
    assert 2 * np.ones(3, np.float32) not in space

  def test_discrete(self):
    space = ddt.Space(np.int32, (), 0, 5)
    assert space.discrete
    assert np.int32(3) in space

  def test_bool(self):
    space = ddt.Space(bool)
    assert space.discrete
    assert np.bool_(True) in space


class TestConvert:

  def test_dtypes(self):
    assert ddt.convert(np.zeros(3, np.float64)).dtype == np.float32
    assert ddt.convert(np.zeros(3, np.int64)).dtype == np.int32
    assert ddt.convert(np.zeros(3, np.uint8)).dtype == np.uint8
    assert ddt.convert(True).dtype == bool


class TestConfig:

  def test_nested_access(self):
    config = ddt.Config({'a': {'b': 1, 'c': 2.5}, 'd': 'hello'})
    assert config.a.b == 1
    assert config['a.c'] == 2.5
    assert config.d == 'hello'

  def test_update_typed(self):
    config = ddt.Config({'a': 1, 'b': 2.5})
    config = config.update({'a': '3'})
    assert config.a == 3
    with pytest.raises(KeyError):
      config.update({'unknown': 1})

  def test_update_pattern(self):
    config = ddt.Config({'x': {'lr': 1.0}, 'y': {'lr': 2.0}, 'z': 3})
    config = config.update({r'.*\.lr': 5.0})
    assert config.x.lr == 5.0
    assert config.y.lr == 5.0
    assert config.z == 3

  def test_immutable(self):
    config = ddt.Config({'a': 1})
    with pytest.raises(AttributeError):
      config.a = 2

  def test_pickle_roundtrip(self):
    config = ddt.Config({'a': {'b': 1}})
    assert pickle.loads(pickle.dumps(config)).a.b == 1


class TestFlags:

  def test_basic(self):
    flags = ddt.Flags({'a': 1, 'b': 'text', 'c': [1, 2]})
    parsed = flags.parse(['--a', '5', '--b=world', '--c', '3,4'])
    assert parsed.a == 5
    assert parsed.b == 'world'
    assert parsed.c == (3, 4)

  def test_scientific_int(self):
    flags = ddt.Flags({'steps': 100})
    assert flags.parse(['--steps', '1e4']).steps == 10000

  def test_parse_known(self):
    flags = ddt.Flags({'a': 1})
    parsed, remaining = flags.parse_known(['--a', '2', '--other', 'x'])
    assert parsed.a == 2
    assert remaining == ['--other', 'x']


class TestCounter:

  def test_ops(self):
    counter = ddt.Counter()
    counter.increment()
    counter.increment(4)
    assert counter == 5
    assert counter < 6
    assert counter >= 5
    data = counter.save()
    other = ddt.Counter()
    other.load(data)
    assert other == 5


class TestWhen:

  def test_every(self):
    every = ddt.when.Every(3)
    results = [every(i) for i in range(10)]
    assert results == [
        True, False, False, True, False, False, True, False, False, True]

  def test_once(self):
    once = ddt.when.Once()
    assert once()
    assert not once()

  def test_until(self):
    until = ddt.when.Until(3)
    assert until(2)
    assert not until(3)


class TestPath:

  def test_parts(self):
    path = ddt.Path('/tmp/foo/bar.txt')
    assert path.name == 'bar.txt'
    assert path.stem == 'bar'
    assert path.suffix == '.txt'
    assert str(path.parent) == '/tmp/foo'

  def test_io(self, tmp_path):
    path = ddt.Path(str(tmp_path)) / 'sub' / 'file.txt'
    path.parent.mkdirs()
    path.write('hello')
    assert path.read() == 'hello'
    assert path.exists()
    assert len(list(path.parent.glob('*.txt'))) == 1


class TestCheckpoint:

  def test_roundtrip(self, tmp_path):
    counter = ddt.Counter()
    counter.increment(7)
    cp = ddt.Checkpoint(str(tmp_path / 'cp.pkl'), log=False)
    cp.step = counter
    cp.save()
    counter2 = ddt.Counter()
    cp2 = ddt.Checkpoint(str(tmp_path / 'cp.pkl'), log=False)
    cp2.step = counter2
    age = cp2.load()
    assert counter2 == 7
    assert age >= 0

  def test_load_or_save(self, tmp_path):
    cp = ddt.Checkpoint(str(tmp_path / 'cp.pkl'), log=False)
    cp.step = ddt.Counter()
    cp.load_or_save()
    assert pathlib.Path(tmp_path / 'cp.pkl').exists()


class TestWorker:

  @pytest.mark.parametrize('strategy', ['none', 'thread', 'process'])
  def test_run(self, strategy):
    worker = ddt.Worker(strategy)
    promise = worker.run(lambda state, x: x * 2, 21)
    assert promise() == 42
    worker.close()

  def test_state_persists(self):
    worker = ddt.Worker('thread')
    def setter(state):
      state['x'] = 13
      return True
    def getter(state):
      return state['x']
    worker.run(setter)()
    assert worker.run(getter)() == 13
    worker.close()


class TestLogger:

  def test_scalars_and_fps(self, tmp_path, capsys):
    step = ddt.Counter()
    logger = ddt.Logger(step, [
        ddt.TerminalOutput(),
        ddt.JSONLOutput(str(tmp_path), parallel=False),
    ], multiplier=2)
    step.increment(5)
    logger.scalar('loss', 1.5)
    logger.add({'acc': 0.9}, prefix='train')
    logger.write(fps=True)
    lines = (tmp_path / 'metrics.jsonl').read_text().splitlines()
    assert len(lines) == 1
    import json
    record = json.loads(lines[0])
    assert record['step'] == 10  # multiplier applied
    assert record['loss'] == 1.5
    assert record['train/acc'] == 0.9


class TestTimer:

  def test_scope_and_wrap(self):
    timer = ddt.Timer()
    with timer.scope('foo'):
      pass
    class Thing:
      def method(self):
        return 1
    thing = Thing()
    timer.wrap('thing', thing, ['method'])
    thing.method()
    stats = timer.stats()
    assert 'foo_count' in stats
    assert stats['thing.method_count'] == 1


class TestPrefetch:

  def test_batches_and_close_joins_blocked_workers(self):
    # Workers fill their bounded queues and block in put(); close() must
    # actually stop and join them (a leaked loader thread outlives the run
    # and can race with later in-process work, e.g. GL context creation).
    import numpy as np

    from daydreamer_tpu.core import Prefetch

    def source():
      i = 0
      while True:
        yield {'x': np.full((2,), i, np.float32)}
        i += 1

    loader = Prefetch([source] * 4, workers=2, prefetch=2)
    batch = next(iter(loader))
    assert batch['x'].shape == (4, 2)
    workers = list(loader._threads)
    assert workers and all(t.is_alive() for t in workers)
    loader.close()
    assert all(not t.is_alive() for t in workers)
    assert not loader._threads  # close() clears after joining.


def test_terminal_format_value():
  """Compact number formatting incl. the nan/inf path (a learner crashed
  on formatting a NaN metric when the exponent branch assumed a finite
  value)."""
  fmt = ddt.TerminalOutput()._format_value
  assert fmt(0) == '0'
  assert fmt(1.5) == '1.5'
  assert fmt(2.0) == '2'
  assert fmt(1234.567) == '1234.57'
  assert fmt(1.5e-5) == '1.5e-5'
  assert fmt(2e8) == '2e8'
  assert fmt(float('nan')) == 'nan'
  assert fmt(float('inf')) == 'inf'
  assert fmt(float('-inf')) == '-inf'
