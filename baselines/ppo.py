"""PPO baseline on the embodied env API (PyTorch).

Counterpart of the reference's ppo.py (reference: ppo.py:19-107, which used
stable-baselines3 PPO + frozen R3M features on xarm_real): a compact PPO
with GAE, clipped surrogate objective, and entropy bonus, supporting both
discrete (one-hot) and continuous action spaces, driven through this
framework's Driver/logger.

Usage: python -m baselines.ppo --task xarm_dummy --logdir ~/logdir/ppo
"""

import numpy as np
import torch
import torch.nn as nn

import daydreamer_tpu as embodied
from daydreamer_tpu import envs as envslib

from .common import flatten_obs, obs_keys, EpisodeLogger


class ActorCritic(nn.Module):

  def __init__(self, obs_dim, act_dim, discrete, hidden=256):
    super().__init__()
    self.discrete = discrete
    self.body = nn.Sequential(
        nn.Linear(obs_dim, hidden), nn.Tanh(),
        nn.Linear(hidden, hidden), nn.Tanh())
    self.policy = nn.Linear(hidden, act_dim)
    self.value = nn.Linear(hidden, 1)
    if not discrete:
      self.log_std = nn.Parameter(torch.zeros(act_dim))

  def dist(self, obs):
    feat = self.body(obs)
    if self.discrete:
      return torch.distributions.Categorical(logits=self.policy(feat))
    mean = torch.tanh(self.policy(feat))
    return torch.distributions.Independent(
        torch.distributions.Normal(mean, self.log_std.exp()), 1)

  def forward(self, obs):
    feat = self.body(obs)
    return self.policy(feat), self.value(feat)[:, 0]


class PPO:

  def __init__(self, obs_dim, act_dim, discrete, lr=3e-4, gamma=0.99,
               lam=0.95, clip=0.2, epochs=10, minibatch=64, ent_coef=0.01):
    self.net = ActorCritic(obs_dim, act_dim, discrete)
    self.opt = torch.optim.Adam(self.net.parameters(), lr)
    self.discrete = discrete
    self.gamma = gamma
    self.lam = lam
    self.clip = clip
    self.epochs = epochs
    self.minibatch = minibatch
    self.ent_coef = ent_coef

  def act(self, obs):
    with torch.no_grad():
      obs = torch.as_tensor(obs, dtype=torch.float32)
      dist = self.net.dist(obs)
      action = dist.sample()
      logp = dist.log_prob(action)
      value = self.net.body(obs)
      value = self.net.value(value)[:, 0]
    return action.numpy(), logp.numpy(), value.numpy()

  def update(self, rollout):
    obs = torch.as_tensor(rollout['obs'], dtype=torch.float32)
    actions = torch.as_tensor(rollout['action'])
    old_logp = torch.as_tensor(rollout['logp'], dtype=torch.float32)
    advantages = torch.as_tensor(rollout['adv'], dtype=torch.float32)
    returns = torch.as_tensor(rollout['ret'], dtype=torch.float32)
    advantages = (advantages - advantages.mean()) / (
        advantages.std() + 1e-8)
    n = len(obs)
    metrics = {}
    for _ in range(self.epochs):
      for start in range(0, n, self.minibatch):
        idx = slice(start, start + self.minibatch)
        dist = self.net.dist(obs[idx])
        logp = dist.log_prob(actions[idx])
        ratio = (logp - old_logp[idx]).exp()
        surr1 = ratio * advantages[idx]
        surr2 = torch.clamp(
            ratio, 1 - self.clip, 1 + self.clip) * advantages[idx]
        policy_loss = -torch.min(surr1, surr2).mean()
        feat = self.net.body(obs[idx])
        value = self.net.value(feat)[:, 0]
        value_loss = ((value - returns[idx]) ** 2).mean()
        entropy = dist.entropy().mean()
        loss = policy_loss + 0.5 * value_loss - self.ent_coef * entropy
        self.opt.zero_grad()
        loss.backward()
        nn.utils.clip_grad_norm_(self.net.parameters(), 0.5)
        self.opt.step()
        metrics = dict(
            policy_loss=float(policy_loss), value_loss=float(value_loss),
            entropy=float(entropy))
    return metrics

  def compute_gae(self, rewards, values, conts, last_value):
    T = len(rewards)
    adv = np.zeros(T, np.float32)
    carry = 0.0
    values_ext = np.concatenate([values, [last_value]])
    for t in reversed(range(T)):
      delta = rewards[t] + self.gamma * conts[t] * values_ext[t + 1] \
          - values_ext[t]
      carry = delta + self.gamma * self.lam * conts[t] * carry
      adv[t] = carry
    return adv, adv + values


def main(argv=None):
  flags = embodied.Flags(
      task='xarm_dummy', logdir='/dev/null', steps=int(1e6), horizon=2048,
      length=0, repeat=1, seed=0,
  ).parse(argv)
  env = envslib.load_env(
      flags.task, amount=1, parallel='none', repeat=flags.repeat,
      length=flags.length)
  keys = obs_keys(env)
  obs_dim = sum(
      int(np.prod(env.obs_space[k].shape)) or 1 for k in keys)
  act_space = env.act_space['action']
  discrete = act_space.discrete
  act_dim = int(act_space.shape[-1] if discrete
                else np.prod(act_space.shape))
  agent = PPO(obs_dim, act_dim, discrete)

  step = embodied.Counter()
  logger = embodied.Logger(step, [
      embodied.TerminalOutput(),
      embodied.JSONLOutput(flags.logdir, 'scores.jsonl'),
  ])
  driver = embodied.Driver(env)
  driver.on_episode(EpisodeLogger(logger))
  driver.on_step(lambda tran, worker: step.increment())

  rollout = {k: [] for k in ('obs', 'action', 'logp', 'value', 'reward',
                             'cont')}

  def add(tran, worker):
    if tran['reset']:
      return
    rollout['reward'].append(tran['reward'])
    rollout['cont'].append(0.0 if tran['is_terminal'] else 1.0)
    if len(rollout['reward']) >= flags.horizon:
      _update()

  def _update():
    T = min(len(rollout['obs']), len(rollout['reward']))
    values = np.asarray(rollout['value'][:T], np.float32)
    rewards = np.asarray(rollout['reward'][:T], np.float32)
    conts = np.asarray(rollout['cont'][:T], np.float32)
    adv, ret = agent.compute_gae(rewards, values, conts, 0.0)
    batch = dict(
        obs=np.asarray(rollout['obs'][:T], np.float32),
        action=np.asarray(rollout['action'][:T]),
        logp=np.asarray(rollout['logp'][:T], np.float32),
        adv=adv, ret=ret)
    metrics = agent.update(batch)
    logger.add(metrics, prefix='train')
    logger.write()
    for v in rollout.values():
      v.clear()

  driver.on_step(add)

  def policy(obs, state=None):
    flat = flatten_obs(obs, keys)
    action, logp, value = agent.act(flat)
    # A call on an is_last observation becomes a reset step: the driver
    # zeroes the action and the on_step callback skips the transition
    # (tran['reset']). Recording it here would shift obs/action relative
    # to the reward stream by one entry per episode and corrupt every
    # advantage target after the first boundary.
    if not bool(np.asarray(obs['is_last'])[0]):
      rollout['obs'].append(flat[0])
      rollout['action'].append(action[0])
      rollout['logp'].append(logp[0])
      rollout['value'].append(value[0])
    if discrete:
      onehot = np.zeros((len(action), act_dim), np.float32)
      onehot[np.arange(len(action)), action] = 1.0
      return {'action': onehot}, state
    return {'action': np.clip(action, -1, 1)}, state

  driver(policy, steps=flags.steps)
  env.close()


if __name__ == '__main__':
  main()
