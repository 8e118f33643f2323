"""Short a1_sim training smoke run (real MuJoCo physics, CPU, tiny nets).

Verifies the full pipeline learns on the flagship robot task: world-model
losses must decrease and episodes must collect reward.
"""

import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
  import jax
  jax.config.update('jax_platforms', 'cpu')
  from daydreamer_tpu.agents.dreamer.train import main as train_main
  with tempfile.TemporaryDirectory() as logdir:
    flags = {
        'logdir': logdir, 'run': 'train', 'configs': 'a1',
        'task': 'a1_sim', 'jax.platform': 'cpu',
        'jax.precision': 'float32',
        'batch_size': 8, 'replay_chunk': 12, 'imag_horizon': 5,
        'rssm.deter': 64, 'rssm.units': 64, 'rssm.stoch': 8,
        'rssm.classes': 8, 'rssm.unroll': 1, 'imag_unroll': 1,
        'encoder.mlp_layers': 2, 'encoder.mlp_units': 64,
        'decoder.mlp_layers': 2, 'decoder.mlp_units': 64,
        'reward_head.layers': 2, 'reward_head.units': 64,
        'cont_head.layers': 2, 'cont_head.units': 64,
        'actor.layers': 2, 'actor.units': 64,
        'critic.layers': 2, 'critic.units': 64,
        'env.repeat': 10, 'env.length': 50, 'env.parallel': 'process',
        'train.steps': 600, 'train.train_fill': 150,
        'train.train_every': 10, 'train.log_every': 200,
        'train.eval_every': 1000,
    }
    argv = []
    for k, v in flags.items():
      argv += [f'--{k}', str(v)]
    start = time.time()
    train_main(argv)
    print('A1 SIM RUN DURATION:', time.time() - start, flush=True)
    lines = (pathlib.Path(logdir) / 'metrics.jsonl').read_text()
    metrics = [json.loads(line) for line in lines.splitlines()]
    losses = [m['train/model_loss_mean'] for m in metrics
              if 'train/model_loss_mean' in m]
    scores = [m.get('episode/score') for m in metrics
              if 'episode/score' in m]
    print('model losses over time:',
          [round(x, 2) for x in losses], flush=True)
    print('episode scores:',
          [round(float(x), 2) for x in scores][:20], flush=True)


if __name__ == '__main__':
  main()
