"""Rainbow-style distributional DQN baseline on the embodied env API.

Counterpart of the reference's rainbow/ tree (reference:
rainbow/{main,agent,model,memory}.py, used for the UR5/XArm discrete
pick-place comparisons): C51 distributional value learning with a dueling
head, double-Q action selection, n-step returns, and proportional
prioritized replay. Exploration uses epsilon-greedy instead of noisy
linear layers (simplification; noted for parity).

Usage: python -m baselines.rainbow --task xarm_dummy --logdir ~/logdir/rb
"""

import collections

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import daydreamer_tpu as embodied
from daydreamer_tpu import envs as envslib

from .common import EpisodeLogger


class C51Net(nn.Module):

  def __init__(self, in_channels, num_actions, atoms=51, history=4):
    super().__init__()
    self.num_actions = num_actions
    self.atoms = atoms
    self.conv = nn.Sequential(
        nn.Conv2d(in_channels * history, 32, 8, stride=4), nn.ReLU(),
        nn.Conv2d(32, 64, 4, stride=2), nn.ReLU(),
        nn.Conv2d(64, 64, 3, stride=1), nn.ReLU())
    with torch.no_grad():
      dummy = torch.zeros(1, in_channels * history, 64, 64)
      conv_out = int(np.prod(self.conv(dummy).shape[1:]))
    self.value = nn.Sequential(
        nn.Linear(conv_out, 512), nn.ReLU(), nn.Linear(512, atoms))
    self.advantage = nn.Sequential(
        nn.Linear(conv_out, 512), nn.ReLU(),
        nn.Linear(512, num_actions * atoms))

  def forward(self, x):
    feat = self.conv(x).flatten(1)
    value = self.value(feat).view(-1, 1, self.atoms)
    adv = self.advantage(feat).view(-1, self.num_actions, self.atoms)
    logits = value + adv - adv.mean(1, keepdim=True)
    return F.log_softmax(logits, -1)


class Rainbow:

  def __init__(self, in_channels, num_actions, atoms=51, vmin=-10.0,
               vmax=10.0, gamma=0.99, n_step=3, lr=1e-4, history=4):
    self.num_actions = num_actions
    self.atoms = atoms
    self.support = torch.linspace(vmin, vmax, atoms)
    self.delta = (vmax - vmin) / (atoms - 1)
    self.vmin, self.vmax = vmin, vmax
    self.gamma = gamma
    self.n_step = n_step
    self.history = history
    self.net = C51Net(in_channels, num_actions, atoms, history)
    self.target = C51Net(in_channels, num_actions, atoms, history)
    self.target.load_state_dict(self.net.state_dict())
    self.opt = torch.optim.Adam(self.net.parameters(), lr, eps=1.5e-4)
    self.updates = 0

  def act(self, stacked, epsilon):
    if np.random.rand() < epsilon:
      return np.random.randint(self.num_actions)
    with torch.no_grad():
      x = torch.as_tensor(stacked, dtype=torch.float32)[None] / 255.0
      log_probs = self.net(x)
      q = (log_probs.exp() * self.support).sum(-1)
      return int(q.argmax(-1).item())

  def update(self, batch, weights):
    obs, action, ret, next_obs, cont = batch
    obs = torch.as_tensor(obs, dtype=torch.float32) / 255.0
    next_obs = torch.as_tensor(next_obs, dtype=torch.float32) / 255.0
    action = torch.as_tensor(action, dtype=torch.int64)
    ret = torch.as_tensor(ret, dtype=torch.float32)
    cont = torch.as_tensor(cont, dtype=torch.float32)
    weights = torch.as_tensor(weights, dtype=torch.float32)
    B = len(obs)

    log_probs = self.net(obs)[torch.arange(B), action]
    with torch.no_grad():
      next_q = (self.net(next_obs).exp() * self.support).sum(-1)
      next_action = next_q.argmax(-1)  # Double-Q selection.
      next_dist = self.target(next_obs).exp()[
          torch.arange(B), next_action]
      # Distributional Bellman projection.
      tz = ret[:, None] + (self.gamma ** self.n_step) * cont[:, None] \
          * self.support[None]
      tz = tz.clamp(self.vmin, self.vmax)
      b = (tz - self.vmin) / self.delta
      lower = b.floor().long().clamp(0, self.atoms - 1)
      upper = b.ceil().long().clamp(0, self.atoms - 1)
      target_dist = torch.zeros_like(next_dist)
      offset = torch.arange(B)[:, None] * self.atoms
      target_dist.view(-1).index_add_(
          0, (lower + offset).view(-1),
          (next_dist * (upper.float() - b)).view(-1))
      target_dist.view(-1).index_add_(
          0, (upper + offset).view(-1),
          (next_dist * (b - lower.float())).view(-1))

    loss = -(target_dist * log_probs).sum(-1)
    weighted = (weights * loss).mean()
    self.opt.zero_grad()
    weighted.backward()
    nn.utils.clip_grad_norm_(self.net.parameters(), 10.0)
    self.opt.step()
    self.updates += 1
    if self.updates % 2000 == 0:
      self.target.load_state_dict(self.net.state_dict())
    return loss.detach().numpy()


class PrioritizedTransitions:

  def __init__(self, capacity, shape, n_step, gamma, alpha=0.5, beta=0.4):
    self.capacity = capacity
    self.obs = np.zeros((capacity,) + shape, np.uint8)
    self.action = np.zeros(capacity, np.int64)
    self.ret = np.zeros(capacity, np.float32)
    self.next_obs = np.zeros((capacity,) + shape, np.uint8)
    self.cont = np.zeros(capacity, np.float32)
    self.prios = np.zeros(capacity, np.float64)
    self.alpha = alpha
    self.beta = beta
    self.index = 0
    self.full = False
    self.n_step = n_step
    self.gamma = gamma
    self.pending = collections.deque(maxlen=n_step)

  def add_step(self, stacked, action, reward, terminal, last):
    self.pending.append((stacked, action, reward))
    if len(self.pending) == self.n_step or last:
      obs0, act0, _ = self.pending[0]
      ret = sum(
          r * self.gamma ** i
          for i, (_, _, r) in enumerate(self.pending))
      i = self.index
      self.obs[i] = obs0
      self.action[i] = act0
      self.ret[i] = ret
      self.next_obs[i] = stacked
      self.cont[i] = 0.0 if terminal else 1.0
      self.prios[i] = self.prios.max() if self.size else 1.0
      self.index = (self.index + 1) % self.capacity
      self.full = self.full or self.index == 0
      if last:
        self.pending.clear()
      else:
        self.pending.popleft()

  @property
  def size(self):
    return self.capacity if self.full else self.index

  def sample(self, batch):
    probs = self.prios[:self.size] ** self.alpha
    probs /= probs.sum()
    idx = np.random.choice(self.size, batch, p=probs)
    weights = (self.size * probs[idx]) ** -self.beta
    weights /= weights.max()
    batch_data = (self.obs[idx], self.action[idx], self.ret[idx],
                  self.next_obs[idx], self.cont[idx])
    return idx, batch_data, weights

  def update_prios(self, idx, losses):
    self.prios[idx] = np.abs(losses) + 1e-6


def main(argv=None):
  flags = embodied.Flags(
      task='xarm_dummy', logdir='/dev/null', steps=int(1e6),
      train_fill=2000, train_every=4, batch_size=32, history=4,
      epsilon=0.05, length=0, repeat=1, capacity=int(2e5),
  ).parse(argv)
  env = envslib.load_env(
      flags.task, amount=1, parallel='none', repeat=flags.repeat,
      length=flags.length)
  assert env.act_space['action'].discrete
  num_actions = env.act_space['action'].shape[-1]
  channels = env.obs_space['image'].shape[-1]
  agent = Rainbow(channels, num_actions, history=flags.history)
  shape = (channels * flags.history, 64, 64)
  buffer = PrioritizedTransitions(
      flags.capacity, shape, agent.n_step, agent.gamma)
  frames = collections.deque(maxlen=flags.history)

  step = embodied.Counter()
  logger = embodied.Logger(step, [
      embodied.TerminalOutput(),
      embodied.JSONLOutput(flags.logdir, 'scores.jsonl'),
  ])
  driver = embodied.Driver(env)
  driver.on_episode(EpisodeLogger(logger))
  driver.on_step(lambda tran, worker: step.increment())

  def stack():
    while len(frames) < flags.history:
      frames.appendleft(frames[0] if frames else np.zeros(
          (channels, 64, 64), np.uint8))
    return np.concatenate(list(frames), 0)

  last_action = [0]

  def on_step(tran, worker):
    image = np.asarray(tran['image']).transpose(2, 0, 1)
    if tran['is_first']:
      frames.clear()
    frames.append(image)
    buffer.add_step(
        stack(), last_action[0], float(tran['reward']),
        bool(tran['is_terminal']), bool(tran['is_last']))
    if buffer.size >= flags.train_fill and \
        step % flags.train_every == 0:
      idx, batch, weights = buffer.sample(flags.batch_size)
      losses = agent.update(batch, weights)
      buffer.update_prios(idx, losses)

  driver.on_step(on_step)

  def policy(obs, state=None):
    image = np.asarray(obs['image'][0]).transpose(2, 0, 1)
    if not frames:
      frames.append(image)
    if buffer.size < flags.train_fill:
      action = np.random.randint(num_actions)
    else:
      action = agent.act(stack(), flags.epsilon)
    last_action[0] = action
    onehot = np.zeros((1, num_actions), np.float32)
    onehot[0, action] = 1.0
    return {'action': onehot}, state

  driver(policy, steps=flags.steps)
  env.close()


if __name__ == '__main__':
  main()
