"""Single-process run mode: env collection + interleaved training.

Parity with the reference loop (reference: embodied/run/train.py:9-103):
prefill with RandomAgent, pretrain to build/compile variables, per-episode
metrics with regex-selected sum/mean/max logs, train bursts every
`train_every` env steps with TBPTT state threading, periodic checkpoints.
"""

import collections
import re
import warnings

import numpy as np

from .. import core
from ..core import when as whenlib


def train(agent, env, replay, logger, args):
  logdir = core.Path(args.logdir)
  logdir.mkdirs()
  print('Logdir', logdir)
  should_train = whenlib.Every(args.train_every)
  should_log = whenlib.Every(args.log_every)
  should_expl = whenlib.Until(args.expl_until)
  should_video = whenlib.Every(args.eval_every)
  step = logger.step

  timer = core.Timer()
  timer.wrap('agent', agent, ['policy', 'train', 'report', 'save'])
  timer.wrap('env', env, ['step'])
  if hasattr(replay, '_sample'):
    timer.wrap('replay', replay, ['_sample'])

  nonzeros = set()

  def per_episode(ep):
    metrics = {}
    length = len(ep['reward']) - 1
    score = float(ep['reward'].astype(np.float64).sum())
    print(f'Episode has {length} steps and return {score:.1f}.')
    metrics['length'] = length
    metrics['score'] = score
    metrics['reward_rate'] = (ep['reward'] - ep['reward'].min() >= 0.1).mean()
    logs = {}
    for key, value in ep.items():
      if not args.log_zeros and key not in nonzeros and (value == 0).all():
        continue
      nonzeros.add(key)
      if re.match(args.log_keys_sum, key):
        logs[f'sum_{key}'] = ep[key].sum()
      if re.match(args.log_keys_mean, key):
        logs[f'mean_{key}'] = ep[key].mean()
      if re.match(args.log_keys_max, key):
        logs[f'max_{key}'] = ep[key].max(0).mean()
    if should_video(step):
      for key in args.log_keys_video:
        if key in ep:
          metrics[f'policy_{key}'] = ep[key]
    logger.add(metrics, prefix='episode')
    logger.add(logs, prefix='logs')
    logger.add(replay.stats, prefix='replay')
    logger.write()

  driver = core.Driver(env)
  driver.on_episode(lambda ep, worker: per_episode(ep))
  driver.on_step(lambda tran, _: step.increment())
  driver.on_step(replay.add)

  train_fill = max(0, args.train_fill - len(replay))
  if train_fill:
    print(f'Fill train dataset ({train_fill} steps).')
    random_agent = core.RandomAgent(env.act_space)
    driver(random_agent.policy, steps=train_fill, episodes=1)
  if not len(replay):
    # Loud diagnosis for silent starvation: every collected trajectory was
    # rejected (e.g. episodes shorter than replay_chunk), so training
    # would wait forever while collection continues happily.
    print('WARNING: replay is empty after prefill; if episodes are '
          'shorter than replay_chunk they are skipped at insert time.')

  dataset = iter(agent.dataset(replay.dataset))
  state = [None]  # Writable from the train step closure below.
  assert args.pretrain > 0  # At least one step to initialize variables.
  for _ in range(args.pretrain):
    _, state[0], _ = agent.train(next(dataset), state[0])

  metrics = []  # Possibly-lazy metric dicts; materialized at log time.
  batch = [None]

  fused = max(1, int(getattr(args, 'train_fused', 1)))

  def train_step(tran, worker):
    if should_train(step):
      if fused > 1 and args.train_steps >= fused:
        # Fused path: K gradient updates per device dispatch.
        for _ in range(int(args.train_steps) // fused):
          batches = [next(dataset) for _ in range(fused)]
          batch[0] = batches[-1]
          outs, state[0], mets = agent.train_multi(batches, state[0])
          metrics.append(mets)
          if 'priority' in outs:
            for i in range(fused):
              replay.prioritize(outs['key'][i], outs['priority'][i])
        remainder = int(args.train_steps) % fused
      else:
        remainder = int(args.train_steps)
      for _ in range(remainder):
        batch[0] = next(dataset)
        outs, state[0], mets = agent.train(batch[0], state[0])
        metrics.append(mets)
        if 'priority' in outs:
          replay.prioritize(outs['key'], outs['priority'])
    if should_log(step):
      with warnings.catch_warnings():  # Ignore empty slice warnings.
        warnings.simplefilter('ignore', category=RuntimeWarning)
        agg = collections.defaultdict(list)
        for mets in metrics:
          for name, value in mets.items():
            agg[name].append(value)
        for name, values in agg.items():
          logger.scalar(
              'train/' + name, np.nanmean(values, dtype=np.float64))
        metrics.clear()
      logger.add(agent.report(batch[0]), prefix='report')
      logger.add(timer.stats(), prefix='timer')
      logger.write(fps=True)

  driver.on_step(train_step)

  checkpoint = core.Checkpoint(logdir / 'checkpoint.pkl')
  checkpoint.step = step
  checkpoint.agent = agent
  checkpoint.replay = replay
  checkpoint.load_or_save()

  print('Start training loop.')
  policy = lambda *a: agent.policy(
      *a, mode='explore' if should_expl(step) else 'train')
  while step < args.steps:
    driver(policy, steps=args.eval_every)
    checkpoint.save()
