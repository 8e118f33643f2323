"""DrQ-v2 baseline on the embodied env API (PyTorch).

Counterpart of the reference's drqv2/ tree (reference:
drqv2/train_embodied.py + embodied_to_dm.py): pixel-based deterministic
actor-critic with random-shift image augmentation, twin critics, n-step
returns, and scheduled exploration noise, driven through this framework's
Driver/logger.

Usage: python -m baselines.drqv2 --task sphero_dummy --logdir ~/logdir/drq
"""

import collections

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import daydreamer_tpu as embodied
from daydreamer_tpu import envs as envslib

from .common import EpisodeLogger


def random_shift(images, pad=4):
  """Random-shift augmentation: pad by replication then random crop."""
  n, c, h, w = images.shape
  padded = F.pad(images, (pad,) * 4, mode='replicate')
  eps = 1.0 / (h + 2 * pad)
  arange = torch.linspace(-1.0 + eps, 1.0 - eps, h + 2 * pad)[:h]
  arange = arange.unsqueeze(0).repeat(h, 1).unsqueeze(2)
  base_grid = torch.cat([arange, arange.transpose(1, 0)], dim=2)
  base_grid = base_grid.unsqueeze(0).repeat(n, 1, 1, 1)
  shift = torch.randint(0, 2 * pad + 1, size=(n, 1, 1, 2)).float()
  shift *= 2.0 / (h + 2 * pad)
  grid = base_grid + shift
  return F.grid_sample(padded, grid, padding_mode='zeros',
                       align_corners=False)


class Encoder(nn.Module):

  def __init__(self, channels):
    super().__init__()
    self.net = nn.Sequential(
        nn.Conv2d(channels, 32, 3, stride=2), nn.ReLU(),
        nn.Conv2d(32, 32, 3, stride=1), nn.ReLU(),
        nn.Conv2d(32, 32, 3, stride=1), nn.ReLU(),
        nn.Conv2d(32, 32, 3, stride=1), nn.ReLU())
    with torch.no_grad():
      dummy = torch.zeros(1, channels, 64, 64)
      self.out_dim = int(np.prod(self.net(dummy).shape[1:]))

  def forward(self, x):
    return self.net(x / 255.0 - 0.5).flatten(1)


class Actor(nn.Module):

  def __init__(self, feat_dim, act_dim, hidden=256):
    super().__init__()
    self.trunk = nn.Sequential(
        nn.Linear(feat_dim, 50), nn.LayerNorm(50), nn.Tanh())
    self.policy = nn.Sequential(
        nn.Linear(50, hidden), nn.ReLU(),
        nn.Linear(hidden, hidden), nn.ReLU(),
        nn.Linear(hidden, act_dim))

  def forward(self, feat, std):
    mu = torch.tanh(self.policy(self.trunk(feat)))
    return mu, torch.ones_like(mu) * std


class Critic(nn.Module):

  def __init__(self, feat_dim, act_dim, hidden=256):
    super().__init__()
    self.trunk = nn.Sequential(
        nn.Linear(feat_dim, 50), nn.LayerNorm(50), nn.Tanh())
    def q():
      return nn.Sequential(
          nn.Linear(50 + act_dim, hidden), nn.ReLU(),
          nn.Linear(hidden, hidden), nn.ReLU(),
          nn.Linear(hidden, 1))
    self.q1 = q()
    self.q2 = q()

  def forward(self, feat, action):
    h = torch.cat([self.trunk(feat), action], -1)
    return self.q1(h)[:, 0], self.q2(h)[:, 0]


class DrQV2:

  def __init__(self, channels, act_dim, lr=1e-4, gamma=0.99, tau=0.01,
               n_step=3, std_start=1.0, std_end=0.1, std_steps=100000):
    self.encoder = Encoder(channels)
    self.actor = Actor(self.encoder.out_dim, act_dim)
    self.critic = Critic(self.encoder.out_dim, act_dim)
    self.critic_target = Critic(self.encoder.out_dim, act_dim)
    self.critic_target.load_state_dict(self.critic.state_dict())
    self.enc_opt = torch.optim.Adam(self.encoder.parameters(), lr)
    self.actor_opt = torch.optim.Adam(self.actor.parameters(), lr)
    self.critic_opt = torch.optim.Adam(self.critic.parameters(), lr)
    self.gamma = gamma
    self.tau = tau
    self.n_step = n_step
    self.std_schedule = (std_start, std_end, std_steps)
    self.step = 0

  def std(self):
    start, end, steps = self.std_schedule
    frac = min(1.0, self.step / steps)
    return start + frac * (end - start)

  def act(self, image, eval_mode=False):
    with torch.no_grad():
      x = torch.as_tensor(image, dtype=torch.float32)[None]
      feat = self.encoder(x)
      mu, std = self.actor(feat, self.std())
      if eval_mode:
        return mu[0].numpy()
      action = mu + std * torch.randn_like(mu)
      return action.clamp(-1, 1)[0].numpy()

  def update(self, batch):
    self.step += 1
    obs, action, ret, next_obs, cont = [
        torch.as_tensor(x, dtype=torch.float32) for x in batch]
    obs = random_shift(obs)
    next_obs = random_shift(next_obs)
    feat = self.encoder(obs)
    with torch.no_grad():
      next_feat = self.encoder(next_obs)
      mu, std = self.actor(next_feat, self.std())
      noise = (torch.randn_like(mu) * std).clamp(-0.3, 0.3)
      next_action = (mu + noise).clamp(-1, 1)
      tq1, tq2 = self.critic_target(next_feat, next_action)
      target = ret + (self.gamma ** self.n_step) * cont * torch.min(
          tq1, tq2)
    q1, q2 = self.critic(feat, action)
    critic_loss = F.mse_loss(q1, target) + F.mse_loss(q2, target)
    self.enc_opt.zero_grad()
    self.critic_opt.zero_grad()
    critic_loss.backward()
    self.enc_opt.step()
    self.critic_opt.step()

    feat = self.encoder(obs).detach()
    mu, std = self.actor(feat, self.std())
    noise = (torch.randn_like(mu) * std).clamp(-0.3, 0.3)
    new_action = (mu + noise).clamp(-1, 1)
    aq1, aq2 = self.critic(feat, new_action)
    actor_loss = -torch.min(aq1, aq2).mean()
    self.actor_opt.zero_grad()
    actor_loss.backward()
    self.actor_opt.step()

    with torch.no_grad():
      for p, tp in zip(self.critic.parameters(),
                       self.critic_target.parameters()):
        tp.mul_(1 - self.tau).add_(self.tau * p)
    return dict(critic_loss=float(critic_loss),
                actor_loss=float(actor_loss))


def main(argv=None):
  flags = embodied.Flags(
      task='sphero_dummy', logdir='/dev/null', steps=int(1e6),
      train_fill=4000, train_every=2, batch_size=64, length=0, repeat=1,
      capacity=int(1e5),
  ).parse(argv)
  env = envslib.load_env(
      flags.task, amount=1, parallel='none', repeat=flags.repeat,
      length=flags.length)
  assert not env.act_space['action'].discrete, 'DrQ-v2 is continuous-only.'
  act_dim = int(np.prod(env.act_space['action'].shape))
  channels = env.obs_space['image'].shape[-1]
  agent = DrQV2(channels, act_dim)

  from .rainbow import PrioritizedTransitions  # Reuse the n-step buffer.
  buffer = PrioritizedTransitions(
      flags.capacity, (channels, 64, 64), agent.n_step, agent.gamma,
      alpha=0.0)

  step = embodied.Counter()
  logger = embodied.Logger(step, [
      embodied.TerminalOutput(),
      embodied.JSONLOutput(flags.logdir, 'scores.jsonl'),
  ])
  driver = embodied.Driver(env)
  driver.on_episode(EpisodeLogger(logger))
  driver.on_step(lambda tran, worker: step.increment())

  last_action = [np.zeros(act_dim, np.float32)]

  def on_step(tran, worker):
    image = np.asarray(tran['image']).transpose(2, 0, 1)
    buffer.add_step(
        image, 0, float(tran['reward']),
        bool(tran['is_terminal']), bool(tran['is_last']))
    # Store the continuous action alongside (the rainbow buffer keys
    # actions as int; patch the float action in a side array).
    if not hasattr(buffer, 'cont_actions'):
      buffer.cont_actions = np.zeros(
          (buffer.capacity, act_dim), np.float32)
    buffer.cont_actions[(buffer.index - 1) % buffer.capacity] = \
        last_action[0]
    if buffer.size >= flags.train_fill and \
        step % flags.train_every == 0:
      idx, batch, _ = buffer.sample(flags.batch_size)
      obs, _, ret, next_obs, cont = batch
      actions = buffer.cont_actions[idx]
      agent.update((obs, actions, ret, next_obs, cont))

  driver.on_step(on_step)

  def policy(obs, state=None):
    image = np.asarray(obs['image'][0]).transpose(2, 0, 1)
    if buffer.size < flags.train_fill:
      action = np.random.uniform(-1, 1, act_dim).astype(np.float32)
    else:
      action = agent.act(image)
    last_action[0] = action
    return {'action': action[None]}, state

  driver(policy, steps=flags.steps)
  env.close()


if __name__ == '__main__':
  main()
