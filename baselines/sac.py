"""Soft Actor-Critic baseline on the embodied env API (PyTorch, CPU/GPU).

Counterpart of the reference's pytorch_sac tree (reference: pytorch_sac/
train.py:29,51 trained on the A1 via env_builder): a compact, standard SAC
with twin Q networks, tanh-Gaussian actor, and automatic temperature
tuning, driven through this framework's Driver/replay/logger so it
produces comparable score curves.

Usage: python -m baselines.sac --task a1_sim --logdir ~/logdir/sac
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import daydreamer_tpu as embodied
from daydreamer_tpu import envs as envslib

from .common import flatten_obs, obs_keys, EpisodeLogger


class MLP(nn.Module):

  def __init__(self, inp, out, hidden=256):
    super().__init__()
    self.net = nn.Sequential(
        nn.Linear(inp, hidden), nn.ReLU(),
        nn.Linear(hidden, hidden), nn.ReLU(),
        nn.Linear(hidden, out))

  def forward(self, x):
    return self.net(x)


class Actor(nn.Module):

  LOG_STD_MIN, LOG_STD_MAX = -5.0, 2.0

  def __init__(self, obs_dim, act_dim):
    super().__init__()
    self.net = MLP(obs_dim, 2 * act_dim)
    self.act_dim = act_dim

  def forward(self, obs):
    mean, log_std = self.net(obs).chunk(2, -1)
    log_std = torch.clamp(log_std, self.LOG_STD_MIN, self.LOG_STD_MAX)
    return mean, log_std.exp()

  def sample(self, obs):
    mean, std = self(obs)
    dist = torch.distributions.Normal(mean, std)
    raw = dist.rsample()
    action = torch.tanh(raw)
    logp = dist.log_prob(raw).sum(-1)
    logp = logp - torch.log(1 - action.pow(2) + 1e-6).sum(-1)
    return action, logp


class SAC:

  def __init__(self, obs_dim, act_dim, lr=3e-4, gamma=0.99, tau=0.005):
    self.actor = Actor(obs_dim, act_dim)
    self.q1 = MLP(obs_dim + act_dim, 1)
    self.q2 = MLP(obs_dim + act_dim, 1)
    self.q1_target = MLP(obs_dim + act_dim, 1)
    self.q2_target = MLP(obs_dim + act_dim, 1)
    self.q1_target.load_state_dict(self.q1.state_dict())
    self.q2_target.load_state_dict(self.q2.state_dict())
    self.log_alpha = torch.zeros(1, requires_grad=True)
    self.target_entropy = -float(act_dim)
    self.gamma = gamma
    self.tau = tau
    self.actor_opt = torch.optim.Adam(self.actor.parameters(), lr)
    self.q_opt = torch.optim.Adam(
        list(self.q1.parameters()) + list(self.q2.parameters()), lr)
    self.alpha_opt = torch.optim.Adam([self.log_alpha], lr)

  @property
  def alpha(self):
    return self.log_alpha.exp().detach()

  def act(self, obs, deterministic=False):
    with torch.no_grad():
      obs = torch.as_tensor(obs, dtype=torch.float32)
      if deterministic:
        mean, _ = self.actor(obs)
        return torch.tanh(mean).numpy()
      action, _ = self.actor.sample(obs)
      return action.numpy()

  def update(self, batch):
    obs, action, reward, next_obs, cont = [
        torch.as_tensor(x, dtype=torch.float32) for x in batch]
    with torch.no_grad():
      next_action, next_logp = self.actor.sample(next_obs)
      q_next = torch.min(
          self.q1_target(torch.cat([next_obs, next_action], -1)),
          self.q2_target(torch.cat([next_obs, next_action], -1)))[:, 0]
      target = reward + self.gamma * cont * (
          q_next - self.alpha * next_logp)
    q1 = self.q1(torch.cat([obs, action], -1))[:, 0]
    q2 = self.q2(torch.cat([obs, action], -1))[:, 0]
    q_loss = F.mse_loss(q1, target) + F.mse_loss(q2, target)
    self.q_opt.zero_grad()
    q_loss.backward()
    self.q_opt.step()

    new_action, logp = self.actor.sample(obs)
    q_new = torch.min(
        self.q1(torch.cat([obs, new_action], -1)),
        self.q2(torch.cat([obs, new_action], -1)))[:, 0]
    actor_loss = (self.alpha * logp - q_new).mean()
    self.actor_opt.zero_grad()
    actor_loss.backward()
    self.actor_opt.step()

    alpha_loss = -(self.log_alpha.exp() * (
        logp.detach() + self.target_entropy)).mean()
    self.alpha_opt.zero_grad()
    alpha_loss.backward()
    self.alpha_opt.step()

    with torch.no_grad():
      for net, target_net in [(self.q1, self.q1_target),
                              (self.q2, self.q2_target)]:
        for p, tp in zip(net.parameters(), target_net.parameters()):
          tp.mul_(1 - self.tau).add_(self.tau * p)
    return dict(
        q_loss=float(q_loss.detach()), actor_loss=float(actor_loss.detach()),
        alpha=float(self.alpha))


class TransitionBuffer:

  def __init__(self, obs_dim, act_dim, capacity=int(1e6)):
    self.capacity = capacity
    self.obs = np.zeros((capacity, obs_dim), np.float32)
    self.action = np.zeros((capacity, act_dim), np.float32)
    self.reward = np.zeros(capacity, np.float32)
    self.next_obs = np.zeros((capacity, obs_dim), np.float32)
    self.cont = np.zeros(capacity, np.float32)
    self.index = 0
    self.full = False
    self._last_obs = {}

  def add(self, tran, worker=0, keys=None):
    obs = flatten_obs({k: np.asarray(v)[None] for k, v in tran.items()
                       if k in keys}, keys)[0]
    if worker in self._last_obs and not tran['is_first']:
      i = self.index
      self.obs[i] = self._last_obs[worker]
      self.action[i] = np.asarray(tran['action'], np.float32)
      self.reward[i] = tran['reward']
      self.next_obs[i] = obs
      self.cont[i] = 0.0 if tran['is_terminal'] else 1.0
      self.index = (self.index + 1) % self.capacity
      self.full = self.full or self.index == 0
    self._last_obs[worker] = obs

  def sample(self, batch):
    size = self.capacity if self.full else self.index
    idx = np.random.randint(0, size, batch)
    return (self.obs[idx], self.action[idx], self.reward[idx],
            self.next_obs[idx], self.cont[idx])

  def __len__(self):
    return self.capacity if self.full else self.index


def main(argv=None):
  flags = embodied.Flags(
      task='a1_sim', logdir='/dev/null', steps=int(1e6), train_fill=5000,
      train_every=1, batch_size=256, length=0, repeat=1, seed=0,
      render=False,  # Proprio-only agent; skip the 45ms/step EGL render.
  ).parse(argv)
  env = envslib.load_env(
      flags.task, amount=1, parallel='none', repeat=flags.repeat,
      length=flags.length, render=flags.render)
  keys = obs_keys(env)
  obs_dim = sum(
      int(np.prod(env.obs_space[k].shape)) or 1 for k in keys)
  act_dim = int(np.prod(env.act_space['action'].shape))
  agent = SAC(obs_dim, act_dim)
  buffer = TransitionBuffer(obs_dim, act_dim)

  step = embodied.Counter()
  logger = embodied.Logger(step, [
      embodied.TerminalOutput(),
      embodied.JSONLOutput(flags.logdir, 'scores.jsonl'),
  ])
  driver = embodied.Driver(env)
  driver.on_step(lambda tran, worker: buffer.add(tran, worker, keys=keys))
  driver.on_step(lambda tran, worker: step.increment())
  driver.on_episode(EpisodeLogger(logger))

  def train_callback(tran, worker):
    if len(buffer) >= flags.train_fill and step % flags.train_every == 0:
      agent.update(buffer.sample(flags.batch_size))

  driver.on_step(train_callback)

  def policy(obs, state=None):
    flat = flatten_obs(obs, keys)
    if len(buffer) < flags.train_fill:
      action = np.stack([
          env.act_space['action'].sample()
          for _ in range(len(obs['is_first']))])
    else:
      action = agent.act(flat)
    return {'action': action}, state

  driver(policy, steps=flags.steps)
  env.close()


if __name__ == '__main__':
  main()
