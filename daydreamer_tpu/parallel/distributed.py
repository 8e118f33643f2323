"""Multi-host pod-slice support.

The reference scaled with TPUStrategy/MirroredStrategy inside one process
(reference: embodied/agents/dreamerv2plus/tfagent.py:136-178). The
TPU-native layout is SPMD over all devices of the slice:

- every host runs the same program; `jax.distributed.initialize()` wires
  the hosts together (ICI within the slice, DCN across hosts);
- the mesh spans all global devices; params replicate, the batch shards;
- each host contributes its process-local share of the global batch via
  `jax.make_array_from_process_local_data` — env workers and replay live
  host-local, so env-steps/s scales with hosts while the learner stays a
  single jitted program;
- logging/eval run on process 0.
"""

import numpy as np

import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None):
  """Wire up multi-host JAX. No-ops when running single-process. Reads
  cluster env vars (TPU metadata / JAX_COORDINATOR_ADDRESS) when args are
  omitted."""
  import os
  if num_processes in (None, 1) and not (
      coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS')):
    return False
  jax.distributed.initialize(
      coordinator_address=coordinator_address,
      num_processes=num_processes,
      process_id=process_id)
  return True


def is_main_process():
  return jax.process_index() == 0


def host_local_batch(batch, mesh, axis='data', leading=0):
  """Build a globally-sharded batch from this host's local shard.

  `batch` holds this process's rows; the returned arrays are global with
  the batch dim = local_rows * process_count, sharded over `axis`.
  With `leading=1` the arrays carry an unsharded leading axis (e.g. the
  K fused-update groups of `train_multi`) and the batch dim is axis 1.
  """
  from jax.sharding import NamedSharding, PartitionSpec as P
  spec = P(*([None] * leading + [axis]))
  sharding = NamedSharding(mesh, spec)

  def make(x):
    x = np.asarray(x)
    global_shape = list(x.shape)
    global_shape[leading] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, x, tuple(global_shape))

  return jax.tree.map(make, batch)
