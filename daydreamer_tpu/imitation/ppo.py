"""JAX PPO trainer for motion imitation.

Replaces the reference's TF1 stable-baselines PPO1 imitation stack
(reference: motion_imitation/learning/ppo_imitation.py:1-394 with
imitation_policies.py MLP actor-critic and imitation_runners.py segment
collection): a clipped-surrogate PPO with GAE, built on this framework's
functional nn module system so the update step is one jitted pure
function (TPU or CPU) over the whole rollout — no minibatch host loop;
minibatching happens via a fixed epoch x shuffle schedule inside jit.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import nn
from ..nn import dists
from ..nn.module import Module
from ..models.nets import MLP


class ActorCritic(Module):

  def __init__(self, name, act_dim, layers=2, units=256):
    super().__init__(name)
    self._actor = self.sub('actor', MLP, None, layers, units, act='tanh')
    self._mean = self.sub('mean', nn.Linear, act_dim, outscale=0.01)
    self._critic = self.sub('critic', MLP, (), layers, units, act='tanh',
                            dist='mse')

  def dist(self, obs):
    feat = self._actor({'tensor': obs})
    mean = jnp.tanh(self._mean(feat))
    log_std = self.value('log_std', jnp.zeros(mean.shape[-1], jnp.float32))
    return dists.Independent(dists.Normal(mean, jnp.exp(log_std)), 1)

  def value_fn(self, obs):
    return self._critic({'tensor': obs}).mode()


class PPOImitation:
  """PPO agent with the embodied policy surface (obs dict in, act out)."""

  def __init__(self, obs_dim, act_dim, lr=3e-4, gamma=0.95, lam=0.95,
               clip=0.2, epochs=10, minibatches=4, ent_coef=0.0,
               horizon=2048, seed=0):
    self.net = ActorCritic('ppo', act_dim)
    self.opt = nn.Optimizer('ppo_opt', lr, eps=1e-5, clip=0.5)
    self.gamma, self.lam, self.clip = gamma, lam, clip
    self.epochs, self.minibatches = epochs, minibatches
    self.ent_coef = ent_coef
    self.horizon = horizon
    self.state = {}
    self._seed = seed
    self._step_i = 0

    self._pure_act = nn.pure(self._act_fn)
    self._pure_mean_act = nn.pure(self._mean_act_fn)
    self._pure_update = nn.pure(self._update_fn)
    # Creation pass on tiny data allocates all values eagerly.
    obs = np.zeros((1, obs_dim), np.float32)
    (_, _), self.state = self._pure_act(self.state, 0, obs, create=True)
    batch = dict(obs=np.zeros((8, obs_dim), np.float32),
                 action=np.zeros((8, act_dim), np.float32),
                 logp=np.zeros(8, np.float32), adv=np.zeros(8, np.float32),
                 ret=np.zeros(8, np.float32))
    _, self.state = self._pure_update(self.state, 0, batch, create=True)
    self._jit_act = jax.jit(self._pure_act)
    self._jit_update = jax.jit(self._pure_update)

  def _act_fn(self, obs):
    d = self.net.dist(obs)
    action = d.sample(nn.rng())
    return (action, d.log_prob(action)), self.net.value_fn(obs)

  def _mean_act_fn(self, obs):
    return self.net.dist(obs).mode()

  def _loss(self, batch):
    d = self.net.dist(batch['obs'])
    logp = d.log_prob(batch['action'])
    ratio = jnp.exp(logp - batch['logp'])
    adv = batch['adv']
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    surr = jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1 - self.clip, 1 + self.clip) * adv)
    value = self.net.value_fn(batch['obs'])
    vloss = ((value - batch['ret']) ** 2).mean()
    ent = d.entropy().mean()
    loss = -surr.mean() + 0.5 * vloss - self.ent_coef * ent
    return loss, {'policy_loss': -surr.mean(), 'value_loss': vloss,
                  'entropy': ent}

  def _update_fn(self, batch):
    n = batch['obs'].shape[0]
    assert n % self.minibatches == 0, (n, self.minibatches)
    mb = n // self.minibatches
    metrics = {}
    for epoch in range(self.epochs):
      perm = jax.random.permutation(nn.rng(), n)
      shuffled = {k: v[perm] for k, v in batch.items()}
      for j in range(self.minibatches):
        sl = {k: v[j * mb:(j + 1) * mb] for k, v in shuffled.items()}
        mets, (aux,) = self.opt(self._loss, [self.net], sl)
        metrics = {**mets, **aux}
    return metrics

  def act(self, obs):
    self._step_i += 1
    (action, logp), value = self._jit_act(
        self.state, np.uint32(self._seed * 100003 + self._step_i), obs)[0]
    return np.asarray(action), np.asarray(logp), np.asarray(value)

  def mean_act(self, obs):
    """Deterministic (mode) action, used for evaluation."""
    action, _ = self._pure_mean_act(self.state, 0, obs)
    return np.asarray(action)

  def gae(self, rewards, values, conts, last_value):
    """Host-side GAE over one rollout segment."""
    n = len(rewards)
    adv = np.zeros(n, np.float32)
    lastgaelam = 0.0
    for t in reversed(range(n)):
      nextv = last_value if t == n - 1 else values[t + 1]
      delta = rewards[t] + self.gamma * conts[t] * nextv - values[t]
      lastgaelam = delta + self.gamma * self.lam * conts[t] * lastgaelam
      adv[t] = lastgaelam
    return adv, adv + values

  def update(self, rollout):
    self._step_i += 1
    metrics, self.state = self._jit_update(
        self.state, np.uint32(self._seed * 99991 + self._step_i), rollout)
    return {k: float(np.asarray(v)) for k, v in metrics.items()}

  def save(self):
    return {k: np.asarray(v) for k, v in self.state.items()}

  def load(self, data):
    self.state = {k: jnp.asarray(v) for k, v in data.items()}
