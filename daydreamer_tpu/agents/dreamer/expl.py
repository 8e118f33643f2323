"""Intrinsic reward modules (reference:
embodied/agents/dreamerv2plus/expl.py:9-134)."""

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...models import nets

f32 = jnp.float32
sg = jax.lax.stop_gradient


class Disag(nn.Module):
  """Ensemble disagreement: std of N MLPs predicting the next stoch
  (reference: expl.py:9-46)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    # The ensemble heads consume the already-gathered feature tensor;
    # only the outer Input uses the configured keys (reference:
    # expl.py:12-15).
    self.config = config.update({'disag_head.inputs': ['tensor']})
    self.opt = self.sub('opt', nn.Optimizer, **config.expl_opt)
    self.inputs = nets.Input(config.disag_head.inputs, dims='deter')
    self.target = nets.Input(config.disag_target, dims='deter')
    self._nets = None

  def __call__(self, traj):
    self._build(traj)
    inputs = self.inputs(traj)
    preds = jnp.stack([head(inputs).mode() for head in self._nets], 0)
    disag = preds.std(0).mean(-1)
    if 'action' in self.config.disag_head.inputs:
      return disag[:-1]
    else:
      return disag[1:]

  def train(self, data):
    # Shift actions so action[t] leads to state[t+1], matching imagination
    # convention (reference: expl.py:29-36).
    data = {**data, 'action': jnp.concatenate(
        [data['action'][:, 1:], 0 * data['action'][:, :1]], 1)}
    self._build(data)
    inputs = sg(self.inputs(data)[:, :-1])
    target = sg(f32(self.target(data)[:, 1:]))

    def lossfn():
      preds = [head(inputs) for head in self._nets]
      return -sum(pred.log_prob(target).mean() for pred in preds)

    mets, _ = self.opt(lossfn, self._nets)
    return mets

  def _build(self, data):
    if not self._nets:
      size = self.target(data).shape[-1]
      self._nets = [
          self.sub(f'head{i}', nets.MLP, size, **self.config.disag_head)
          for i in range(self.config.disag_models)]


class LatentVAE(nn.Module):
  """ELBO surprise reward (reference: expl.py:49-92)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.config = config
    self.enc = self.sub('enc', nets.MLP, **config.expl_enc)
    self.dec = self.sub(
        'dec', nets.MLP, config.rssm.deter, **config.expl_dec)
    shape = tuple(config.expl_enc.shape)
    self._shape = shape
    self.kl = self.sub('kl', nn.AutoAdapt, (), **config.expl_kl)
    self.opt = self.sub('opt', nn.Optimizer, **config.expl_opt)

  def _prior(self):
    shape = self._shape
    if self.config.expl_enc.dist == 'onehot':
      prior = nn.OneHotDist(jnp.zeros(shape))
      return nn.Independent(prior, len(shape) - 1)
    else:
      prior = nn.Normal(jnp.zeros(shape), jnp.ones(shape))
      return nn.Independent(prior, len(shape))

  def _flatten(self, x):
    dims = len(self._shape)
    return x.reshape(x.shape[:-dims] + (int(np.prod(x.shape[-dims:])),))

  def __call__(self, traj):
    dist = self.enc(traj)
    target = sg(f32(traj['deter']))
    ll = self.dec(self._flatten(dist.sample(nn.rng()))).log_prob(target)
    if self.config.expl_vae_elbo:
      kl = dist.kl(self._prior())
      reward = kl - ll / self.kl.scale()
    else:
      reward = -ll
    return reward[1:]

  def train(self, data):
    metrics = {}
    target = sg(f32(data['deter']))

    def lossfn():
      dist = self.enc(data)
      kl = dist.kl(self._prior())
      kl, mets = self.kl(kl)
      ll = self.dec(self._flatten(dist.sample(nn.rng()))).log_prob(target)
      assert kl.shape == ll.shape, (kl.shape, ll.shape)
      loss = (kl - ll).mean()
      return loss, kl.mean(), ll.mean(), mets

    omets, (vae_kl, vae_ll, mets) = self.opt(lossfn, [self.enc, self.dec])
    metrics.update({f'kl_{k}': v for k, v in mets.items()})
    metrics['vae_kl'] = vae_kl
    metrics['vae_ll'] = vae_ll
    metrics.update(omets)
    return metrics


class CtrlDisag(nn.Module):
  """Disagreement in a controllability embedding trained by inverse
  dynamics (reference: expl.py:95-115)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.disag = self.sub(
        'disag', Disag, wm, act_space,
        config.update({'disag_target': ['ctrl']}))
    self.embed = self.sub(
        'embed', nets.MLP, (config.ctrl_size,), **config.ctrl_embed)
    self.head = self.sub(
        'head', nets.MLP, act_space.shape, **config.ctrl_head)
    self.opt = self.sub('opt', nn.Optimizer, **config.ctrl_opt)

  def __call__(self, traj):
    return self.disag({**traj, 'ctrl': self.embed(traj).mode()})

  def train(self, data):
    metrics = {}

    def lossfn():
      ctrl = self.embed(data).mode()
      dist = self.head({'current': ctrl[:, :-1], 'next': ctrl[:, 1:]})
      loss = -dist.log_prob(data['action'][:, 1:]).mean()
      return loss, ctrl

    mets, (ctrl,) = self.opt(lossfn, [self.embed, self.head])
    metrics.update(mets)
    metrics.update(self.disag.train({**data, 'ctrl': ctrl}))
    return metrics


class PBE(nn.Module):
  """Particle-based entropy via kNN distances (reference: expl.py:118-134)."""

  def __init__(self, name, wm, act_space, config):
    super().__init__(name)
    self.config = config
    self.inputs = nets.Input(config.pbe_inputs, dims='deter')

  def __call__(self, traj):
    feat = self.inputs(traj)
    flat = feat.reshape([-1, feat.shape[-1]])
    dists = jnp.linalg.norm(flat[:, None, :] - flat[None, :, :], axis=-1)
    knn = -jax.lax.top_k(-dists, self.config.pbe_knn)[0]
    rew = knn.mean(-1)
    return f32(rew.reshape(feat.shape[:-1]))

  def train(self, data):
    return {}
