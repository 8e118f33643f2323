"""Device mesh and sharding helpers.

TPU-native replacement for the reference's tf.distribute strategies
(reference: embodied/agents/dreamerv2plus/tfagent.py:136-178): instead of
MirroredStrategy/TPUStrategy with PerReplica input splitting, the train step
is ONE pjit program over a `jax.sharding.Mesh`. The batch axis is sharded
along the `data` mesh axis; params/state are replicated; XLA inserts the
gradient all-reduce (psum over ICI) automatically because the loss is a
mean over the globally-sharded batch (replacing the explicit all_reduce at
tfutils.py:221-223).

Multi-host: `jax.distributed.initialize()` + the same mesh over all devices
of the pod slice; each host feeds its local shard via
`jax.make_array_from_process_local_data`.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes=None, devices=None):
  """Build a mesh. axes: dict of axis name -> size, with at most one -1
  (remaining devices). Default: all devices on one 'data' axis."""
  devices = devices if devices is not None else jax.devices()
  axes = dict(axes or {'data': -1})
  sizes = list(axes.values())
  total = len(devices)
  if -1 in sizes:
    known = int(np.prod([s for s in sizes if s != -1]))
    assert total % known == 0, (axes, total)
    sizes[sizes.index(-1)] = total // known
  assert int(np.prod(sizes)) == total, (axes, total)
  array = np.asarray(devices).reshape(sizes)
  return Mesh(array, tuple(axes.keys()))


def replicated(mesh):
  return NamedSharding(mesh, P())


def batch_sharded(mesh, axis='data', leading=0):
  """Shard the batch dimension along the given mesh axis.

  `leading` extra dimensions (e.g. a fused-train-steps axis) before the
  batch dimension stay unsharded."""
  return NamedSharding(mesh, P(*([None] * leading + [axis])))


def shard_batch(tree, mesh, axis='data'):
  """Device-put a host batch with the leading dim sharded over the mesh."""
  sharding = batch_sharded(mesh, axis)
  return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh):
  sharding = replicated(mesh)
  return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
