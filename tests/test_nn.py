"""Tests for the functional module system, dists, and networks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daydreamer_tpu import nn
from daydreamer_tpu.models import nets


class TestModule:

  def test_create_and_apply(self):
    layer = nn.Linear('lin', 4)
    fn = nn.pure(lambda x: layer(x))
    x = jnp.ones((2, 3))
    out, state = fn({}, 0, x, create=True)
    assert out.shape == (2, 4)
    assert 'lin/kernel' in state
    assert 'lin/bias' in state
    out2, state2 = fn(state, 0, x)
    assert np.allclose(out, out2)

  def test_jit_apply(self):
    layer = nn.Linear('lin2', 4)
    fn = nn.pure(lambda x: layer(x))
    x = jnp.ones((2, 3))
    _, state = fn({}, 0, x, create=True)
    jitted = jax.jit(lambda s, x: fn(s, 42, x))
    out, _ = jitted(state, x)
    assert out.shape == (2, 4)

  def test_trainable_flags(self):
    class Thing(nn.Module):
      def __call__(self):
        self.value('w', jnp.zeros(3), trainable=True)
        self.value('stat', jnp.zeros(()), trainable=False)
        return self.keys(trainable=True)
    thing = Thing('thing')
    keys, state = nn.pure(lambda: thing())({}, 0, create=True)
    assert keys == ['thing/w']

  def test_value_and_grad(self):
    layer = nn.Linear('lin3', 1, bias=False)
    def loss(x):
      out = layer(x)
      return (out ** 2).sum()
    def step(x):
      keys = layer.keys(trainable=True)
      return nn.value_and_grad(loss, keys, x)
    x = jnp.ones((2, 3))
    # Creation pass.
    nn.pure(lambda x: layer(x))({}, 0, x, create=True)
    _, state = nn.pure(lambda x: layer(x))({}, 0, x, create=True)
    (l, params, grads, aux), state2 = nn.pure(step)(state, 0, x)
    assert set(grads.keys()) == {'lin3/kernel'}
    assert np.isfinite(l)

  def test_scan_matches_loop(self):
    cell = nn.Linear('cell', 3, bias=False)
    def rollout(inputs, start):
      return nn.scan(lambda carry, x: jnp.tanh(cell(carry) + x),
                     inputs, start, unroll=1)
    inputs = jnp.ones((5, 2, 3)) * 0.1
    start = jnp.zeros((2, 3))
    outs_create, state = nn.pure(rollout)({}, 0, inputs, start, create=True)
    outs_apply, _ = nn.pure(rollout)(state, 0, inputs, start)
    assert outs_apply.shape == (5, 2, 3)
    assert np.allclose(outs_create, outs_apply, atol=1e-5)


class TestDists:

  def test_onehot_straight_through(self):
    logits = jnp.array([[1.0, 2.0, 0.5]])
    dist = nn.OneHotDist(logits)
    key = jax.random.PRNGKey(0)
    sample = dist.sample(key)
    assert sample.shape == (1, 3)
    assert np.isclose(np.asarray(sample).sum(), 1.0)
    # Gradients flow through probs.
    def f(logits):
      return nn.OneHotDist(logits).sample(key).sum()
    grad = jax.grad(f)(logits)
    assert np.abs(np.asarray(grad)).sum() > 0

  def test_onehot_kl(self):
    a = nn.OneHotDist(jnp.array([1.0, 2.0, 3.0]))
    b = nn.OneHotDist(jnp.array([1.0, 2.0, 3.0]))
    assert np.isclose(float(a.kl(b)), 0.0, atol=1e-6)
    c = nn.OneHotDist(jnp.array([3.0, 2.0, 1.0]))
    assert float(a.kl(c)) > 0

  def test_normal(self):
    dist = nn.Normal(jnp.zeros(3), jnp.ones(3))
    lp = dist.log_prob(jnp.zeros(3))
    assert np.allclose(np.asarray(lp), -0.5 * np.log(2 * np.pi), atol=1e-5)
    kl = nn.Normal(jnp.zeros(3), jnp.ones(3)).kl(
        nn.Normal(jnp.zeros(3), jnp.ones(3)))
    assert np.allclose(np.asarray(kl), 0, atol=1e-6)

  def test_bernoulli(self):
    dist = nn.Bernoulli(jnp.zeros(4))
    assert np.allclose(np.asarray(dist.mean()), 0.5)
    lp = dist.log_prob(jnp.ones(4))
    assert np.allclose(np.asarray(lp), np.log(0.5), atol=1e-5)

  def test_symlog_dist(self):
    dist = nn.SymlogDist(nn.symlog(jnp.array([3.0])), 1, 'sum')
    assert np.allclose(np.asarray(dist.mode()), [3.0], atol=1e-5)

  def test_trunc_normal(self):
    dist = nn.TruncNormal(jnp.zeros(2), 0.5 * jnp.ones(2))
    s = dist.sample(jax.random.PRNGKey(0))
    assert (np.asarray(s) >= -1).all() and (np.asarray(s) <= 1).all()
    assert np.isfinite(np.asarray(dist.entropy())).all()


class TestOptimizer:

  def test_descends(self):
    layer = nn.Linear('optlin', 1, bias=False)
    opt = nn.Optimizer('opt', lr=0.1)
    x = jnp.ones((4, 3))
    y = jnp.ones((4, 1))
    def lossfn():
      pred = layer(x)
      return ((pred - y) ** 2).mean()
    def train():
      metrics, aux = opt(lossfn, [layer])
      return metrics
    _, state = nn.pure(train)({}, 0, create=True)
    losses = []
    for i in range(20):
      metrics, state = nn.pure(train)(state, i)
      losses.append(float(metrics['opt_loss']))
    assert losses[-1] < losses[0] * 0.5

  def test_eager_grads_match_jit(self):
    # Module-level half of the compiler-mode matrix: the eager and jitted
    # executions of one optimizer step (value_and_grad + clip + Adam) must
    # produce the same loss and the same updated parameters. The
    # agent-level test (test_agent.py::test_eager_mode_matches_jit) covers
    # forward parity; this pins the gradient path cheaply.
    layer = nn.Linear('eglin', 2, bias=True)
    opt = nn.Optimizer('egopt', lr=0.05)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
    y = jnp.ones((4, 2))
    def lossfn():
      pred = layer(x)
      return ((pred - y) ** 2).mean()
    def train():
      metrics, aux = opt(lossfn, [layer])
      return metrics
    _, state0 = nn.pure(train)({}, 0, create=True)
    eager_mets, eager_state = nn.pure(train)(state0, 7)
    jit_mets, jit_state = jax.jit(
        lambda s: nn.pure(train)(s, 7))(state0)
    assert np.allclose(
        float(eager_mets['egopt_loss']), float(jit_mets['egopt_loss']),
        atol=1e-6)
    for key in state0:
      np.testing.assert_allclose(
          np.asarray(eager_state[key]), np.asarray(jit_state[key]),
          atol=1e-6, err_msg=key)

  def test_overflow_skips_update(self):
    # Nonfinite gradients must leave params and Adam moments untouched and
    # surface as the `_overflow` metric; the next finite step must apply
    # normally (sanitizer role of the reference's overflow skip,
    # tfutils.py:225-250).
    layer = nn.Linear('oflin', 1, bias=False)
    opt = nn.Optimizer('ofopt', lr=0.1)
    x = jnp.ones((4, 3))
    def train(bad):
      def lossfn():
        loss = (layer(x) ** 2).mean()
        return loss * jnp.inf if bad else loss
      return opt(lossfn, [layer])[0]
    _, state = nn.pure(lambda: train(False))({}, 0, create=True)
    before = {k: np.asarray(v) for k, v in state.items()}
    metrics, state = nn.pure(lambda: train(True))(state, 0)
    assert float(metrics['ofopt_overflow']) == 1.0
    for key, value in before.items():
      assert np.allclose(value, np.asarray(state[key]), equal_nan=True), key
    metrics, state = nn.pure(lambda: train(False))(state, 1)
    assert float(metrics['ofopt_overflow']) == 0.0
    assert not np.allclose(
        before['oflin/kernel'], np.asarray(state['oflin/kernel']))

  def test_weight_decay_pattern(self):
    layer = nn.Linear('wdlin', 2)
    opt = nn.Optimizer('wdopt', lr=0.0, wd=0.5, wd_pattern='kernel')
    x = jnp.ones((2, 3))
    def lossfn():
      return layer(x).sum() * 0.0
    def train():
      return opt(lossfn, [layer])[0]
    _, state = nn.pure(train)({}, 0, create=True)
    # lr=0 means wd has no effect (decoupled wd scales with lr).
    before = np.asarray(state['wdlin/kernel'])
    _, state = nn.pure(train)(state, 0)
    assert np.allclose(before, np.asarray(state['wdlin/kernel']))


class TestRSSM:

  @pytest.mark.parametrize('classes', [8, 0])
  def test_observe_shapes(self, classes):
    rssm = nets.RSSM(
        'rssm', deter=16, stoch=4, classes=classes, units=16,
        initial='learned2', unimix=0.01)
    B, T, E, A = 2, 5, 12, 3
    embed = jnp.zeros((B, T, E))
    action = jnp.zeros((B, T, A))
    is_first = jnp.zeros((B, T), bool).at[:, 0].set(True)
    def observe():
      return rssm.observe(embed, action, is_first)
    (post, prior), state = nn.pure(observe)({}, 0, create=True)
    (post, prior), _ = nn.pure(observe)(state, 0)
    assert post['deter'].shape == (B, T, 16)
    if classes:
      assert post['stoch'].shape == (B, T, 4, classes)
      assert post['logit'].shape == (B, T, 4, classes)
    else:
      assert post['stoch'].shape == (B, T, 4)
    kl, _ = nn.pure(lambda: rssm.kl_loss(post, prior))(state, 0)
    assert kl.shape == (B, T)
    assert np.isfinite(np.asarray(kl)).all()

  def test_imagine(self):
    rssm = nets.RSSM('rssm2', deter=16, stoch=4, classes=8, units=16)
    B, T, A = 2, 6, 3
    action = jnp.zeros((B, T, A))
    def run():
      state = rssm.initial(B)
      return rssm.imagine(action, state)
    _, varibs = nn.pure(run)({}, 0, create=True)
    prior, _ = nn.pure(run)(varibs, 0)
    assert prior['deter'].shape == (B, T, 16)

  def test_is_first_resets_state(self):
    rssm = nets.RSSM('rssm3', deter=8, stoch=2, classes=4, units=8)
    B, T = 1, 4
    embed = jnp.ones((B, T, 6))
    action = jnp.ones((B, T, 2))
    all_first = jnp.ones((B, T), bool)
    def observe(is_first):
      return rssm.observe(embed, action, is_first)
    _, varibs = nn.pure(observe)({}, 0, all_first, create=True)
    # With is_first everywhere, every step starts from the initial state, so
    # all posterior deters along time should be identical.
    (post, _), _ = nn.pure(observe)(varibs, 7, all_first)
    deter = np.asarray(post['deter'])
    assert np.allclose(deter[:, 0], deter[:, 1], atol=1e-5)


class TestEncoders:

  def test_multi_encoder_decoder(self):
    shapes = {'image': (16, 16, 3), 'vector': (7,), 'step': ()}
    enc = nets.MultiEncoder(
        'enc', shapes, cnn_depth=8, cnn_kernels=(4, 4), mlp_layers=2,
        mlp_units=16)
    B, T = 2, 3
    data = {
        'image': jnp.zeros((B, T, 16, 16, 3)),
        'vector': jnp.zeros((B, T, 7)),
        'step': jnp.zeros((B, T)),
    }
    embed, state = nn.pure(lambda: enc(data))({}, 0, create=True)
    assert embed.shape[:2] == (B, T)
    dec = nets.MultiDecoder(
        'dec', shapes, inputs=['feat'], cnn_depth=8, cnn_kernels=(5, 8),
        mlp_layers=2, mlp_units=16)
    feat = jnp.zeros((B, T, 32))
    dists, state2 = nn.pure(
        lambda: dec({'feat': feat}))({}, 0, create=True)
    assert dists['image'].mode().shape == (B, T, 16, 16, 3)
    assert dists['vector'].mode().shape == (B, T, 7)

  def test_mlp_dist_heads(self):
    for dist in ['mse', 'symlog', 'binary']:
      mlp = nets.MLP(f'mlp_{dist}', (), 2, 16, dist=dist)
      out, _ = nn.pure(
          lambda: mlp(jnp.zeros((3, 8))))({}, 0, create=True)
      assert out.log_prob(jnp.zeros(3)).shape == (3,)
    for dist in ['normal', 'trunc_normal', 'onehot']:
      mlp = nets.MLP(f'mlp_{dist}', (4,), 2, 16, dist=dist)
      out, state = nn.pure(
          lambda: mlp(jnp.zeros((3, 8))))({}, 0, create=True)
      sample, _ = nn.pure(
          lambda: mlp(jnp.zeros((3, 8))).sample(nn.rng()))(state, 0)
      assert sample.shape == (3, 4)


def test_convT_1x1_dense_path():
  """Conv2D(transp) on a 1x1 input takes the dense fast path; it must
  produce EXACTLY what lax.conv_transpose computes with the same stored
  kernel (the decoder's first stage depends on this equivalence)."""
  import jax
  from daydreamer_tpu.nn.layers import Conv2D
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(3, 1, 1, 24)), jnp.float32)
  conv = Conv2D('convt', depth=7, kernel=5, stride=2, transp=True,
                pad='valid')
  y, state = nn.pure(lambda: conv(x))({}, 0, create=True)
  kernel = state['convt/kernel']
  ref = jax.lax.conv_transpose(
      x, jnp.asarray(kernel).transpose(0, 1, 3, 2), (2, 2), 'VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  ref = ref + state['convt/bias']
  assert y.shape == ref.shape == (3, 5, 5, 7)
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
