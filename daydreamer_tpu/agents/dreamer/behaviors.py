"""Task and exploration behaviors (reference:
embodied/agents/dreamerv2plus/behaviors.py:9-253)."""

import jax
import jax.numpy as jnp

from ... import nn
from ...models import nets
from . import agent as agentlib
from . import expl

f32 = jnp.float32


class Greedy(nn.Module):
  """Actor-critic on the extrinsic reward (reference: behaviors.py:9-46)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.wm = wm
    self.config = config
    rewfn = lambda s: wm.heads['reward'](s).mean()[1:]
    if config.critic_type == 'vfunction':
      critics = {'extr': self.sub('critic', agentlib.VFunction, rewfn,
                                  config)}
    elif config.critic_type == 'qfunction':
      critics = {'extr': self.sub('critic', agentlib.QFunction, rewfn,
                                  config)}
    elif config.critic_type == 'qtwin':
      critics = {'extr': self.sub('critic', agentlib.TwinQFunction, rewfn,
                                  config)}
    else:
      raise NotImplementedError(config.critic_type)
    self.ac = self.sub(
        'ac', agentlib.ImagActorCritic, critics, {'extr': 1.0}, act_space,
        config, wm=wm)

  def initial(self, batch_size):
    return self.ac.initial(batch_size)

  def policy(self, latent, state):
    return self.ac.policy(latent, state)

  def train(self, imagine, start, data):
    return self.ac.train(imagine, start, data)

  def report(self, data):
    metrics = {}
    context, _ = self.wm.rssm.observe(
        self.wm.encoder(data)[:6, :5], data['action'][:6, :5],
        data['is_first'][:6, :5])
    start = {k: v[:, -1] for k, v in context.items()}
    start['is_terminal'] = data['is_terminal'][:6, 4]
    traj, _ = self.wm.imagine(
        self.policy, start, self.initial(6), self.config.imag_horizon)
    dists = self.wm.heads['decoder'](traj)
    for key in self.wm.heads['decoder'].cnn_shapes.keys():
      video = dists[key].mode().transpose((1, 0, 2, 3, 4))
      metrics[f'imag_{key}'] = nn.video_grid(video)
    return metrics


class Random(nn.Module):
  """Uniform policy (reference: behaviors.py:97-120)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.config = config
    self.act_space = act_space

  def initial(self, batch_size):
    return jnp.zeros(batch_size)

  def policy(self, latent, state):
    batch_size = len(state)
    shape = (batch_size,) + self.act_space.shape
    if self.act_space.discrete:
      dist = nn.OneHotDist(jnp.zeros(shape))
    else:
      dist = _Uniform(shape)
    return {'action': dist}, state

  def train(self, imagine, start, data):
    return None, {}

  def report(self, data):
    return {}


class _Uniform:

  def __init__(self, shape):
    self._shape = shape

  def sample(self, key):
    return jax.random.uniform(key, self._shape, f32, -1.0, 1.0)

  def mode(self):
    return jnp.zeros(self._shape, f32)

  def entropy(self):
    import numpy as np
    return jnp.full(self._shape[:-1], self._shape[-1] * np.log(2.0))


class KnownReward(nn.Module):
  """Actor-critic on a hand-specified reward over decoded observations
  (reference: behaviors.py:49-94)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.wm = wm
    self.config = config
    self.ac = self.sub(
        'ac', agentlib.ImagActorCritic,
        {'manual': self.sub('critic', agentlib.VFunction, self.rewfn,
                            config)},
        {'manual': 1.0}, act_space, config, wm=wm)

  def rewfn(self, s):
    if self.config.known_reward == 'none':
      return jnp.zeros(s['deter'][1:, ..., 0].shape, f32)
    raise NotImplementedError(self.config.known_reward)

  def initial(self, batch_size):
    return self.ac.initial(batch_size)

  def policy(self, latent, state):
    return self.ac.policy(latent, state)

  def train(self, imagine, start, data):
    return self.ac.train(imagine, start, data)

  def report(self, data):
    return {}


class DisagWhen(nn.Module):
  """Switches between achiever and explorer policies when ensemble
  disagreement exceeds a buffer quantile (reference: behaviors.py:170-253).

  The disagreement buffer is functional state: a [capacity, deter] ring of
  high-disagreement states plus their scores, updated each train step by a
  top-k merge (replacing the reference's tf.Variable assignments)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    config = config.update({'disag_head.inputs': ['deter']})
    self.act_space = act_space
    self.config = config
    rewfn = lambda s: wm.heads['reward'](s).mean()[1:]
    self.achiever = self.sub(
        'achiever', agentlib.ImagActorCritic,
        {'extr': self.sub('critic_extr', agentlib.VFunction, rewfn,
                          config)},
        {'extr': 1.0}, act_space, config, wm=wm)
    self.disag = self.sub('disag', expl.Disag, wm, act_space, config)
    self.explorer = self.sub(
        'explorer', agentlib.ImagActorCritic,
        {'expl': self.sub('critic_expl', agentlib.VFunction, self.disag,
                          config)},
        {'expl': 1.0}, act_space, config, wm=wm)
    self.capacity = int(config.expl_when_buffer)

  def initial(self, batch_size):
    return {
        'achiever': self.achiever.initial(batch_size),
        'explorer': self.explorer.initial(batch_size),
        'exploring': jnp.zeros(batch_size, bool),
        'counter': jnp.zeros(batch_size, jnp.int32),
    }

  def _buffer(self):
    deter = self.config.rssm.deter
    buffer = self.value(
        'buffer', jnp.zeros((self.capacity, deter), f32), trainable=False)
    disags = self.value(
        'disags', jnp.zeros(self.capacity, f32), trainable=False)
    return buffer, disags

  def policy(self, latent, state):
    _, disags = self._buffer()
    disag = self._disagreement(latent['deter'])
    higher = disag[:, None] > disags[None, :]
    frac = higher.astype(f32).sum(1) / self.capacity
    exploring = jnp.where(
        state['counter'] > 0, state['exploring'],
        frac > self.config.expl_when_frac)
    counter = (state['counter'] + 1) % self.config.expl_when_every
    ac_out, ac_state = self.achiever.policy(latent, state['achiever'])
    ex_out, ex_state = self.explorer.policy(latent, state['explorer'])
    ac_dist = ac_out['action']
    if self.config.expl_when_random:
      shape = (len(state['counter']),) + self.act_space.shape
      if self.act_space.discrete:
        ac_dist = nn.OneHotDist(jnp.zeros(shape))
      else:
        ac_dist = _Uniform(shape)
    act = jnp.where(
        exploring[:, None],
        ex_out['action'].sample(nn.rng()),
        ac_dist.sample(nn.rng()))
    state = {
        'achiever': ac_state, 'explorer': ex_state,
        'exploring': exploring, 'counter': counter}
    return {'action': _Deterministic(act)}, state

  def train(self, imagine, start, data):
    metrics = {}
    metrics.update(self.disag.train(data))
    traj, mets = self.explorer.train(imagine, start, data)
    metrics.update({f'explorer_{k}': v for k, v in mets.items()})
    traj, mets = self.achiever.train(imagine, start, data)
    metrics.update({f'achiever_{k}': v for k, v in mets.items()})
    # Update the disagreement buffer with the batch's mid-sequence states.
    buffer, disags = self._buffer()
    states = f32(data['deter'][:, data['deter'].shape[1] // 2])
    merged = jnp.concatenate([buffer, states], 0)
    merged_disags = jnp.concatenate(
        [disags, self._disagreement(states)], 0)
    indices = jnp.argsort(merged_disags)[-self.capacity:]
    self.write('buffer', merged[indices])
    self.write('disags', merged_disags[indices])
    return traj, metrics

  def _disagreement(self, deter):
    return self.disag(
        {'deter': jnp.concatenate([deter[:1], deter], 0)})

  def report(self, data):
    return {}


class _Deterministic:

  def __init__(self, value):
    self._value = value

  def sample(self, key):
    return self._value

  def mode(self):
    return self._value

  def entropy(self):
    return jnp.zeros(self._value.shape[:-1], f32)


class Explore(nn.Module):
  """Multi-reward exploration actor-critic (reference: behaviors.py:123-167):
  extrinsic plus disagreement/VAE/control/PBE intrinsic critics."""

  REWARDS = {
      'disag': expl.Disag,
      'vae': expl.LatentVAE,
      'ctrl': expl.CtrlDisag,
      'pbe': expl.PBE,
  }

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.config = config
    self.rewards = {}
    critics = {}
    for key, scale in config.expl_rewards.items():
      if not scale:
        continue
      if key == 'extr':
        reward = lambda traj: wm.heads['reward'](traj).mean()[1:]
        critics[key] = self.sub(
            f'critic_{key}', agentlib.VFunction, reward, config)
      else:
        reward = self.sub(
            f'reward_{key}', self.REWARDS[key], wm, act_space, config)
        critics[key] = self.sub(
            f'critic_{key}', agentlib.VFunction, reward, config.update(
                discount=config.expl_discount,
                retnorm=dict(config.expl_retnorm),
                scorenorm=dict(config.expl_scorenorm)))
        self.rewards[key] = reward
    scales = {k: v for k, v in config.expl_rewards.items() if v}
    self.ac = self.sub(
        'ac', agentlib.ImagActorCritic, critics, scales, act_space, config,
        wm=wm)

  def initial(self, batch_size):
    return self.ac.initial(batch_size)

  def policy(self, latent, state):
    return self.ac.policy(latent, state)

  def train(self, imagine, start, data):
    metrics = {}
    for key, reward in self.rewards.items():
      metrics.update(reward.train(data))
    traj, mets = self.ac.train(imagine, start, data)
    metrics.update(mets)
    return traj, metrics

  def report(self, data):
    return {}
