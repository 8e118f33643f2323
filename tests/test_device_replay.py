"""Device-resident replay: ring correctness, on-device sampling, mirror,
and the fused sample+train path (replay/device_replay.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import daydreamer_tpu as ddt
from daydreamer_tpu.envs import load_env
from daydreamer_tpu.replay import device_replay as drlib


def make_steps(start, n):
  return {
      'value': np.arange(start, start + n, dtype=np.int32),
      'is_first': np.zeros(n, bool),
  }


class TestDeviceReplayRing:

  def test_fill_and_sample_consecutive(self):
    replay = drlib.DeviceReplay(capacity=64, chunk=4, block=8)
    replay.add_steps(make_steps(0, 40))
    assert replay.filled == 40
    rng = jax.random.PRNGKey(0)
    batch = jax.device_get(drlib.sample(replay.state, rng, 16, 4))
    assert batch['value'].shape == (16, 4)
    # Every window is consecutive and within the added range.
    for row in batch['value']:
      assert (np.diff(row) == 1).all(), row
      assert 0 <= row[0] and row[-1] < 40, row
    assert batch['is_first'][:, 0].all()

  def test_partial_block_stays_staged(self):
    replay = drlib.DeviceReplay(capacity=64, chunk=4, block=8)
    replay.add_steps(make_steps(0, 5))
    assert replay.filled == 0  # Less than one block: staged host-side.
    replay.add_steps(make_steps(5, 5))
    assert replay.filled == 8  # One block flushed, 2 staged.
    replay.add_steps(make_steps(10, 30))
    assert replay.filled == 40

  def test_wraparound_never_crosses_seam(self):
    replay = drlib.DeviceReplay(capacity=32, chunk=4, block=8)
    replay.add_steps(make_steps(0, 80))  # 2.5x capacity.
    assert replay.filled == 32
    assert replay.cursor == 80 % 32
    for seed in range(20):
      rng = jax.random.PRNGKey(seed)
      batch = jax.device_get(drlib.sample(replay.state, rng, 8, 4))
      for row in batch['value']:
        assert (np.diff(row) == 1).all(), row  # Consecutive: no seam.
        assert 48 <= row[0] and row[-1] < 80, row  # Only newest 32 steps.

  def test_prio_ends_oversamples_episode_ends(self):
    # Matches the host FixedLength sampler: each episode end contributes
    # chunk*prio_ends virtual positions for the window that ends on it.
    replay = drlib.DeviceReplay(capacity=64, chunk=4, block=8)
    steps = make_steps(0, 64)
    steps['is_last'] = np.zeros(64, bool)
    ends = [19, 39]
    steps['is_last'][ends] = True
    replay.add_steps(steps)
    chunk, batch, prio = 4, 4096, 1.0
    rng = jax.random.PRNGKey(3)
    out = jax.device_get(
        drlib.sample(replay.state, rng, batch, chunk, prio_ends=prio))
    last = out['value'][:, -1]
    frac = np.isin(last, ends).mean()
    # Expected mass: mixture gate + uniform windows landing there anyway.
    span = 64 - chunk
    gate = (len(ends) * chunk * prio) / (len(ends) * chunk * prio + span + 1)
    expect = gate + (1 - gate) * len(ends) / (span + 1)
    assert abs(frac - expect) < 0.03, (frac, expect)
    # Without prio_ends the same windows are rare.
    out0 = jax.device_get(drlib.sample(replay.state, rng, batch, chunk))
    frac0 = np.isin(out0['value'][:, -1], ends).mean()
    assert frac0 < 0.1, frac0

  def test_sampling_covers_buffer(self):
    replay = drlib.DeviceReplay(capacity=64, chunk=4, block=8)
    replay.add_steps(make_steps(0, 64))
    rng = jax.random.PRNGKey(1)
    batch = jax.device_get(drlib.sample(replay.state, rng, 256, 4))
    starts = batch['value'][:, 0]
    # Uniform over the valid start range: decent spread expected.
    assert len(np.unique(starts)) > 20


class TestStoreMirror:

  def test_sync_is_incremental(self):
    from daydreamer_tpu import replay as replaylib
    store = replaylib.RAMStore(int(1e4))
    fixed = replaylib.FixedLength(store, chunk=4)
    env = load_env('dummy_discrete', amount=2, parallel='none', length=10)
    driver = ddt.Driver(env)
    driver.on_step(fixed.add)
    driver(ddt.RandomAgent(env.act_space).policy, steps=44)
    device = drlib.DeviceReplay(capacity=64, chunk=4, block=8)
    mirror = drlib.StoreMirror(fixed, device)
    added = mirror.sync()
    assert added > 0
    assert device.filled > 0
    assert mirror.sync() == 0  # No new trajectories.
    driver(ddt.RandomAgent(env.act_space).policy, steps=22)
    assert mirror.sync() > 0
    # Ring rows hold the env's step keys, not log_ keys.
    assert 'is_first' in device.buffers
    assert not any(k.startswith('log_') for k in device.buffers)
    env.close()


class TestTrainDevice:

  def test_train_device_runs_and_is_deterministic(self):
    from daydreamer_tpu.agents.dreamer import Agent
    from tests.test_agent import make_config
    config = make_config(task='dummy_discrete', batch_size=4,
                         replay_chunk=6, imag_horizon=2)
    env = load_env('dummy_discrete', amount=1, parallel='none', length=10)

    def build_replay(agent):
      from daydreamer_tpu import replay as replaylib
      store = replaylib.RAMStore(int(1e4))
      fixed = replaylib.FixedLength(store, chunk=6)
      driver = ddt.Driver(env)
      driver.on_step(fixed.add)
      driver(ddt.RandomAgent(env.act_space).policy, steps=40)
      device = agent.make_device_replay(capacity=128, block=8)
      drlib.StoreMirror(fixed, device).sync()
      return device

    results = []
    for _ in range(2):
      np.random.seed(0)  # RandomAgent prefill must match across builds.
      agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
      device = build_replay(agent)
      assert device.filled >= device.chunk
      outs, state, mets = agent.train_device(device, steps=3)
      assert np.isfinite(mets['model_loss_mean'])
      results.append({k: np.asarray(v) for k, v in agent.varibs.items()})
    for key in results[0]:
      np.testing.assert_allclose(
          results[0][key], results[1][key], atol=1e-5, err_msg=key)
    env.close()

  def test_fused_metrics_last_matches_all(self):
    """jax.fused_metrics 'last' must produce the same parameters as 'all'
    (metrics computation is observational; DCE must not change training)
    and report the final update's metrics."""
    from daydreamer_tpu.agents.dreamer import Agent
    from tests.test_agent import make_config
    env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
    results = {}
    for mode in ('all', 'last'):
      config = make_config(task='dummy_discrete', batch_size=4,
                           replay_chunk=6, imag_horizon=2)
      config = config.update({'jax.fused_metrics': mode})
      np.random.seed(0)
      agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
      from daydreamer_tpu import replay as replaylib
      store = replaylib.RAMStore(int(1e4))
      fixed = replaylib.FixedLength(store, chunk=6)
      driver = ddt.Driver(env)
      driver.on_step(fixed.add)
      driver(ddt.RandomAgent(env.act_space).policy, steps=40)
      device = agent.make_device_replay(capacity=128, block=8)
      drlib.StoreMirror(fixed, device).sync()
      outs, state, mets = agent.train_device(device, steps=3)
      assert np.isfinite(mets['model_loss_mean'])
      results[mode] = {k: np.asarray(v) for k, v in agent.varibs.items()}
    for key in results['all']:
      np.testing.assert_allclose(
          results['all'][key], results['last'][key], atol=1e-5, err_msg=key)
    env.close()


class TestDevicePER:

  def test_prioritized_sampling_matches_host_weighting(self):
    """Empirical window-start distribution matches the host Prioritized
    sampler's conv(|p|**exponent, ones(chunk)) window weighting."""
    capacity, chunk, exponent = 64, 4, 0.5
    replay = drlib.DeviceReplay(
        capacity=capacity, chunk=chunk, block=8, prioritized=True)
    replay.add_steps(make_steps(0, 32))
    # Overwrite the unseen-initialized ring with a known priority pattern.
    prios = np.zeros(capacity, np.float32)
    prios[:32] = 0.01
    prios[10] = 100.0  # One hot step.
    replay.prios = jnp.asarray(prios)
    # Expected window weights over valid starts [0, filled - chunk].
    stepw = np.abs(prios[:32]) ** exponent
    weights = np.convolve(stepw, np.ones(chunk), 'valid')  # starts 0..28
    expected = weights / weights.sum()
    draws = []
    for seed in range(200):
      out, rows = drlib.sample_prioritized(
          replay.state, replay.prios, jax.random.PRNGKey(seed),
          16, chunk, exponent, 0.0)
      draws.append(np.asarray(rows[:, 0]))
    starts = np.concatenate(draws)
    hot = ((starts >= 7) & (starts <= 10)).mean()
    hot_expected = expected[7:11].sum()
    assert abs(hot - hot_expected) < 0.05, (hot, hot_expected)
    # probs match the categorical weights for the drawn starts.
    out, rows = drlib.sample_prioritized(
        replay.state, replay.prios, jax.random.PRNGKey(0),
        16, chunk, exponent, 0.0)
    got = np.asarray(out['prob'][:, 0])
    want = expected[np.asarray(rows[:, 0])]
    np.testing.assert_allclose(got, want, rtol=1e-4)

  def test_unseen_steps_sample_first(self):
    replay = drlib.DeviceReplay(
        capacity=64, chunk=4, block=8, prioritized=True)
    replay.add_steps(make_steps(0, 32))
    # Mark the first 24 steps as already-seen with tiny priority; the last
    # block keeps UNSEEN_PRIORITY.
    prios = np.full(64, 0.0, np.float32)
    prios[:24] = 1e-4
    prios[24:32] = drlib.UNSEEN_PRIORITY
    replay.prios = jnp.asarray(prios)
    out, rows = drlib.sample_prioritized(
        replay.state, replay.prios, jax.random.PRNGKey(1), 32, 4, 0.5, 0.0)
    starts = np.asarray(rows[:, 0])
    # Nearly every draw should cover the unseen block (starts >= 21).
    assert (starts >= 21).mean() > 0.95, starts

  def test_train_device_per_updates_priorities(self):
    from daydreamer_tpu.agents.dreamer import Agent
    from tests.test_agent import make_config
    config = make_config(task='dummy_discrete', batch_size=4,
                         replay_chunk=6, imag_horizon=2, replay='prio')
    env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
    agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)
    from daydreamer_tpu import replay as replaylib
    store = replaylib.RAMStore(int(1e4))
    fixed = replaylib.FixedLength(store, chunk=6)
    driver = ddt.Driver(env)
    driver.on_step(fixed.add)
    driver(ddt.RandomAgent(env.act_space).policy, steps=40)
    device = agent.make_device_replay(capacity=128, block=8)
    assert device.prioritized
    drlib.StoreMirror(fixed, device).sync()
    before = np.asarray(device.prios).copy()
    assert (before[:device.filled] == drlib.UNSEEN_PRIORITY).all()
    outs, state, mets = agent.train_device(device, steps=3)
    assert np.isfinite(mets['model_loss_mean'])
    after = np.asarray(device.prios)
    # Sampled rows received fresh (finite, small) priorities from the
    # train step; something must have changed from the unseen marker.
    assert (after[:device.filled] != drlib.UNSEEN_PRIORITY).any()
    assert np.isfinite(after).all()
    env.close()
