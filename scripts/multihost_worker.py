"""One process of an N-process jax.distributed CPU cluster.

Used by tests/test_multihost.py and scripts/multihost_bench.py to validate
the multi-host learner path (VERDICT: multi-host claims need a real
multi-process run) without TPU pod hardware: each process owns
`--local-devices` virtual CPU devices, the mesh spans all processes, every
process feeds its host-local batch shard through
`parallel.distributed.host_local_batch`, and the fused train step runs as
one SPMD program across the cluster.

Usage: python scripts/multihost_worker.py PORT NUM_PROCS PROC_ID [STEPS]

Prints one line: RESULT <proc_id> <model_loss> <updates_per_s>
"""

import os
import sys
import time


def main(argv):
  port, nproc, pid = argv[0], int(argv[1]), int(argv[2])
  steps = int(argv[3]) if len(argv) > 3 else 3
  local_devices = int(os.environ.get('MULTIHOST_LOCAL_DEVICES', '4'))
  # Optional per-process CPU pinning: emulates each "host" owning its own
  # cores, so scaling numbers measure runtime overhead, not single-box
  # core contention (real pod hosts do not share CPUs).
  cpu = os.environ.get('MULTIHOST_CPU', '')
  if cpu:
    os.sched_setaffinity(0, {int(c) for c in cpu.split(',')})
  flags = os.environ.get('XLA_FLAGS', '')
  os.environ['XLA_FLAGS'] = (
      flags + f' --xla_force_host_platform_device_count={local_devices}'
  ).strip()

  import jax
  jax.config.update('jax_platforms', 'cpu')
  cache = os.environ.get('DAYDREAMER_COMPILE_CACHE', '')
  if cache:
    try:
      os.makedirs(cache, exist_ok=True)
      jax.config.update('jax_compilation_cache_dir', cache)
      jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
      pass
  jax.distributed.initialize(f'localhost:{port}', nproc, pid)
  assert jax.process_count() == nproc, jax.process_count()
  assert jax.device_count() == nproc * local_devices

  import numpy as np
  import daydreamer_tpu as ddt
  from daydreamer_tpu.agents.dreamer import Agent
  from daydreamer_tpu.envs import load_env
  from daydreamer_tpu.parallel import distributed

  config = ddt.Config(Agent.configs['defaults'])
  config = config.update(Agent.configs['debug'])
  config = config.update({
      'jax.platform': 'cpu',
      'batch_size': jax.device_count(),  # One row per global device.
      'replay_chunk': 8,
      'imag_horizon': 3,
      'env.amount': 1,
  })
  if os.environ.get('MULTIHOST_TINY', ''):
    # Correctness-test mode (tests/test_multihost.py): the SPMD loss
    # identity holds for any model, so compile the smallest one. The
    # scaling bench does NOT set this — its efficiency ratio must be
    # measured on the real per-device workload.
    config = config.update({
        'encoder.cnn_keys': '$^', 'decoder.cnn_keys': '$^',
        'replay_chunk': 4,
        'rssm': {'units': 32, 'deter': 32, 'stoch': 4, 'classes': 4},
        r'.*\.units': 32,
    })
  env = load_env('dummy_discrete', amount=1, parallel='none', length=10)
  agent = Agent(env.obs_space, env.act_space, ddt.Counter(), config)

  # Host-local shard: this process's rows of the global batch. Identical
  # content everywhere keeps the loss comparable across processes.
  local_rows = config.batch_size // nproc
  T = config.replay_chunk
  data = {}
  for key, space in env.obs_space.items():
    data[key] = np.zeros((local_rows, T) + space.shape, space.dtype)
  data['action'] = np.zeros(
      (local_rows, T) + env.act_space['action'].shape, np.float32)
  data['is_first'][:, 0] = True
  data['reward'][:] = np.linspace(0, 1, T, dtype=np.float32)
  env.close()

  # Measure the path run=learning actually uses: K fused gradient updates
  # per dispatch (train_multi), so per-dispatch host/gRPC coordination is
  # amortized exactly as in the real learner hot loop. The K groups are
  # pre-stacked host-locally and shared into one global array (leading K
  # axis unsharded, batch axis sharded over processes).
  from daydreamer_tpu.agents.dreamer.jaxagent import Prestacked
  fused = int(os.environ.get('MULTIHOST_FUSED', '4'))
  stacked_local = {
      k: np.stack([v] * fused) for k, v in data.items()}
  stacked = distributed.host_local_batch(
      stacked_local, agent.mesh, leading=1)
  batches = Prestacked(stacked, [None] * fused, fused)
  outs, state, mets = agent.train_multi(batches)  # Create + compile.
  loss = float(mets['model_loss_mean'])

  jax.block_until_ready(agent.varibs)
  start = time.time()
  for _ in range(steps):
    outs, state, mets = agent.train_multi(batches, state)
  jax.block_until_ready(agent.varibs)
  final = float(mets['model_loss_mean'])
  rate = steps * fused / (time.time() - start)

  assert np.isfinite(final), final
  print(f'RESULT {pid} {final:.6f} {rate:.3f}', flush=True)


if __name__ == '__main__':
  main(sys.argv[1:])
