"""Mesh/sharding layer tests on the 8-device virtual CPU mesh.

Analog of the reference's logical-device multi-GPU tests (reference:
embodied/tests/test_multi_gpu_logical.py:12-16, which split one GPU into
two logical devices to exercise MirroredStrategy): conftest.py forces 8
virtual CPU devices, so the pjit data-parallel layout runs for real.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from daydreamer_tpu.parallel import mesh as meshlib
from daydreamer_tpu.parallel import distributed


class TestMesh:

  def test_make_mesh_all_devices(self):
    mesh = meshlib.make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ('data',)

  def test_make_mesh_2d(self):
    mesh = meshlib.make_mesh({'data': 4, 'model': -1})
    assert mesh.shape['data'] == 4
    assert mesh.shape['model'] == len(jax.devices()) // 4

  def test_make_mesh_rejects_nondivisible(self):
    with pytest.raises(AssertionError):
      meshlib.make_mesh({'data': 3, 'model': -1})

  def test_shard_batch_places_rows_across_devices(self):
    mesh = meshlib.make_mesh()
    n = mesh.devices.size
    batch = {'x': np.arange(n * 4, dtype=np.float32).reshape(n, 4)}
    sharded = meshlib.shard_batch(batch, mesh)
    shards = sharded['x'].addressable_shards
    assert len(shards) == n
    # Each device holds exactly one distinct row.
    rows = sorted(int(s.data[0, 0]) // 4 for s in shards)
    assert rows == list(range(n))

  def test_replicate_places_full_copy_everywhere(self):
    mesh = meshlib.make_mesh()
    tree = {'w': np.ones((3, 3), np.float32)}
    rep = meshlib.replicate(tree, mesh)
    for shard in rep['w'].addressable_shards:
      assert shard.data.shape == (3, 3)

  def test_psum_rides_the_mesh(self):
    """A sharded-mean loss implies a cross-device reduction: check the
    jitted program produces the global mean over a sharded batch."""
    mesh = meshlib.make_mesh()
    n = mesh.devices.size

    @jax.jit
    def global_mean(x):
      return x.mean()

    batch = np.arange(n * 2, dtype=np.float32).reshape(n * 2)
    x = jax.device_put(
        batch, jax.sharding.NamedSharding(mesh, P('data')))
    np.testing.assert_allclose(global_mean(x), batch.mean(), rtol=1e-6)


class TestDistributed:

  def test_initialize_noop_single_process(self):
    assert distributed.initialize() is False

  def test_is_main_process(self):
    assert distributed.is_main_process()

  def test_host_local_batch_single_process(self):
    mesh = meshlib.make_mesh()
    n = mesh.devices.size
    local = {'x': np.arange(n * 3, dtype=np.float32).reshape(n, 3)}
    out = distributed.host_local_batch(local, mesh)
    # Single process: global batch == local batch, sharded over `data`.
    assert out['x'].shape == (n, 3)
    np.testing.assert_allclose(np.asarray(out['x']), local['x'])
    assert len(out['x'].addressable_shards) == n

  def test_host_local_batch_leading_axis(self):
    # Fused-update groups: leading K axis unsharded, batch axis sharded
    # (the train_multi layout used by the multihost learner bench).
    mesh = meshlib.make_mesh()
    n = mesh.devices.size
    local = {'x': np.arange(2 * n * 3, dtype=np.float32).reshape(2, n, 3)}
    out = distributed.host_local_batch(local, mesh, leading=1)
    assert out['x'].shape == (2, n, 3)
    np.testing.assert_allclose(np.asarray(out['x']), local['x'])
    shard_shapes = {s.data.shape for s in out['x'].addressable_shards}
    assert shard_shapes == {(2, 1, 3)}  # K unsharded, batch split.
