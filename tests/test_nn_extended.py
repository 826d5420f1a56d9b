"""Tests for straight-through ops, note masks, ResNet, dilated conv, VQ.

Mirrors the reference's nn_test.py patterns: shape checks, losslessness of
polyphase resampling, straight-through gradient identity, note-mask
region semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu import nn as dnn


RNG = np.random.RandomState(7)


class TestStraightThrough:

  def test_int_quantization_values_and_grads(self):
    x = jnp.asarray([0.2, 1.7, -0.6])
    y = dnn.straight_through_int_quantization(x)
    np.testing.assert_allclose(np.asarray(y), [0.0, 2.0, -1.0])
    g = jax.grad(lambda a: jnp.sum(
        dnn.straight_through_int_quantization(a)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)

  def test_softmax_one_hot_and_grad(self):
    logits = jnp.asarray(RNG.randn(4, 8).astype(np.float32))
    sample, probs = dnn.straight_through_softmax(
        logits, key=jax.random.PRNGKey(0))
    s = np.asarray(sample)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-6)
    assert set(np.unique(s.round(6))).issubset({0.0, 1.0})
    assert probs.shape == logits.shape
    g = jax.grad(lambda l: jnp.sum(
        dnn.straight_through_softmax(l, key=jax.random.PRNGKey(0))[0] *
        jnp.arange(8.0)))(logits)
    assert np.any(np.asarray(g) != 0)

  def test_choice_deterministic_is_argmax(self):
    logits = jnp.asarray([[10.0, 0.0, -10.0]])
    values = jnp.asarray([[3.0, 5.0, 7.0]])
    y = dnn.straight_through_choice(logits, values)
    np.testing.assert_allclose(np.asarray(y), [[3.0]], atol=1e-4)


class TestNoteMasks:

  def _q_pitch(self):
    # Two notes (60 then 62) separated by silence.
    pitch = np.concatenate([
        np.zeros(3), np.full(4, 60.0), np.zeros(2), np.full(5, 62.0),
        np.zeros(2)])
    return jnp.asarray(pitch[None, :, None].astype(np.float32))

  def test_note_mask_regions(self):
    q = self._q_pitch()
    mask = dnn.get_note_mask(q, max_regions=8, note_on_only=True)
    assert mask.shape == (1, 16, 8)
    m = np.asarray(mask)
    # Exactly the 9 on-pitch frames are covered.
    assert m.sum() == 9
    lengths = dnn.get_note_lengths(mask)
    counts = sorted(l for l in np.asarray(lengths)[0] if l > 0)
    assert counts == [4, 5]

  def test_note_mask_all_regions_without_note_on(self):
    q = self._q_pitch()
    mask = dnn.get_note_mask(q, max_regions=8, note_on_only=False)
    # Every timestep belongs to exactly one region.
    np.testing.assert_allclose(np.asarray(mask).sum(-1), 1.0)

  def test_note_mask_from_onset(self):
    q = self._q_pitch()
    onset = np.zeros((1, 16, 1), dtype=np.float32)
    onset[0, 3] = 1.0
    onset[0, 9] = 1.0
    mask = dnn.get_note_mask_from_onset(q, jnp.asarray(onset),
                                        max_regions=8)
    m = np.asarray(mask)
    assert m.shape == (1, 16, 8)
    assert m.sum() == 9  # note-on frames only

  def test_note_moments_and_pooling(self):
    q = self._q_pitch()
    mask = dnn.get_note_mask(q, max_regions=8)
    x = jnp.asarray(RNG.rand(1, 16, 3).astype(np.float32))
    mean, std = dnn.get_note_moments(x, mask)
    assert mean.shape == (1, 8, 3) and std.shape == (1, 8, 3)
    pooled_mean, pooled_std = dnn.pool_over_notes(x, mask)
    assert pooled_mean.shape == (1, 16, 3)
    assert pooled_std.shape == (1, 16, 3)
    # Pooled values are constant within a note region.
    pm = np.asarray(pooled_mean)
    assert np.allclose(pm[0, 3:7], pm[0, 3], atol=1e-6)

  def test_short_note_loss_mask(self):
    q = self._q_pitch()
    mask = dnn.get_note_mask(q, max_regions=8)
    lengths = dnn.get_note_lengths(mask)
    pitches = dnn.get_note_moments(q[:, :, 0], mask, return_std=False)
    loss_mask = dnn.get_short_note_loss_mask(mask, lengths, pitches,
                                             min_length=5)
    # Only the 4-frame note counts as short.
    assert np.asarray(loss_mask).sum() == 4


class TestPolyphaseResample:

  def test_down_up_lossless(self):
    x = jnp.asarray(RNG.rand(2, 8, 4).astype(np.float32))
    down = dnn.polyphase_resample(x, 2, 'down')
    assert down.shape == (2, 4, 8)
    up = dnn.polyphase_resample(down, 2, 'up')
    np.testing.assert_allclose(np.asarray(up), np.asarray(x))

  def test_pad_on_indivisible(self):
    x = jnp.asarray(RNG.rand(1, 7, 4).astype(np.float32))
    down = dnn.polyphase_resample(x, 2, 'down', 'pad')
    assert down.shape == (1, 4, 8)
    trim = dnn.polyphase_resample(x, 2, 'down', 'trim')
    assert trim.shape == (1, 3, 8)

  def test_module(self):
    x = jnp.asarray(RNG.rand(1, 8, 4).astype(np.float32))
    mod = dnn.PolyphaseResample(stride=2, resample_type='down')
    y = mod.apply({}, x)
    assert y.shape == (1, 4, 8)


class TestResNet:

  def test_small_resnet_shapes(self):
    # Tiny logmel-like input [batch, time, freq, 1].
    x = jnp.asarray(RNG.rand(1, 8, 64, 1).astype(np.float32))
    model = dnn.ResNet(size='small')
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    # Time axis preserved; freq downsampled 2*2*2*2*2 = 32x; ch = 8*32*4.
    assert y.shape == (1, 8, 2, 1024)

  def test_conditional_norm(self):
    x = jnp.asarray(RNG.rand(2, 4, 1, 8).astype(np.float32))
    z = jnp.asarray(RNG.rand(2, 4, 1, 3).astype(np.float32))
    mod = dnn.ConditionalNorm(norm_type='instance')
    variables = mod.init(jax.random.PRNGKey(0), x, z)
    y = mod.apply(variables, x, z)
    assert y.shape == x.shape

  def test_residual_stack_grad(self):
    x = jnp.asarray(RNG.rand(1, 4, 16, 4).astype(np.float32))
    model = dnn.ResidualStack([4], [2], [2], 'layer')
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v):
      return jnp.mean(model.apply(v, x)**2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


class TestDilatedConvStack:

  def test_basic_shape(self):
    x = jnp.asarray(RNG.rand(1, 16, 3).astype(np.float32))
    model = dnn.DilatedConvStack(ch=8, layers_per_stack=2, stacks=2,
                                 norm_type='layer')
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 16, 8)

  def test_downsample(self):
    x = jnp.asarray(RNG.rand(1, 16, 3).astype(np.float32))
    model = dnn.DilatedConvStack(ch=8, layers_per_stack=2, stacks=2,
                                 norm_type='layer',
                                 resample_type='downsample',
                                 resample_stride=2, stacks_per_resample=1)
    variables = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(variables, x).shape == (1, 4, 8)

  def test_upsample_conditional(self):
    x = jnp.asarray(RNG.rand(1, 8, 3).astype(np.float32))
    # With resampling, conditioning must broadcast over time (global z).
    z = jnp.asarray(RNG.rand(1, 1, 2).astype(np.float32))
    model = dnn.DilatedConvStack(ch=8, layers_per_stack=2, stacks=2,
                                 norm_type='layer', conditional=True,
                                 resample_type='upsample',
                                 resample_stride=2, stacks_per_resample=1)
    variables = model.init(jax.random.PRNGKey(0), x, z)
    assert model.apply(variables, x, z).shape == (1, 32, 8)

  def test_spectral_norm(self):
    x = jnp.asarray(RNG.rand(1, 8, 3).astype(np.float32))
    model = dnn.DilatedConvStack(ch=4, layers_per_stack=1, stacks=1,
                                 norm_type='layer', spectral_norm=True)
    variables = model.init(jax.random.PRNGKey(0), x, training=True)
    y, updates = model.apply(variables, x, training=True,
                             mutable=['batch_stats'])
    assert y.shape == (1, 8, 4)
    assert 'batch_stats' in updates


class TestVectorQuantization:

  def test_quantize_shapes_and_codes(self):
    vq = dnn.VectorQuantization(k=16)
    x = jnp.asarray(RNG.rand(2, 10, 8).astype(np.float32))
    variables = vq.init({'params': jax.random.PRNGKey(0),
                         'vq': jax.random.PRNGKey(1)}, x, training=True)
    (z, c), updates = vq.apply(variables, x, training=True,
                               mutable=['vq_stats'],
                               rngs={'vq': jax.random.PRNGKey(2)})
    assert z.shape == x.shape
    assert c.shape == (2, 10, 1)
    assert np.all(np.asarray(c) >= 0) and np.all(np.asarray(c) < 16)
    # EMA stats updated.
    assert float(jnp.sum(updates['vq_stats']['counts'])) > 0

  def test_ema_convergence_to_clusters(self):
    # Two well-separated clusters; after EMA updates the codes split them.
    vq = dnn.VectorQuantization(k=2, gamma=0.5)
    a = RNG.randn(64, 4).astype(np.float32) * 0.01 + 1.0
    b = RNG.randn(64, 4).astype(np.float32) * 0.01 - 1.0
    x = jnp.asarray(np.concatenate([a, b])[None])
    variables = vq.init({'params': jax.random.PRNGKey(0),
                         'vq': jax.random.PRNGKey(1)}, x, training=True)
    stats = {'vq_stats': variables['vq_stats']}
    for i in range(10):
      (z, c), updates = vq.apply(stats, x, training=True,
                                 mutable=['vq_stats'],
                                 rngs={'vq': jax.random.PRNGKey(i)})
      stats = updates
    c = np.asarray(c)[0, :, 0]
    assert len(set(c[:64])) == 1 and len(set(c[64:])) == 1
    assert c[0] != c[64]
    # Quantized values close to the cluster centers.
    z = np.asarray(z)[0]
    np.testing.assert_allclose(z[:64].mean(0), np.full(4, 1.0), atol=0.1)

  def test_straight_through_grads(self):
    vq = dnn.VectorQuantization(k=4)
    x = jnp.asarray(RNG.rand(1, 6, 4).astype(np.float32))
    variables = vq.init({'params': jax.random.PRNGKey(0),
                         'vq': jax.random.PRNGKey(1)}, x, training=True)
    # One training step to populate the centroids (they init to zero, which
    # would make d(sum z^2)/dx = 2*z_q = 0 despite the identity gradient).
    _, variables = vq.apply(variables, x, training=True,
                            mutable=['vq_stats'],
                            rngs={'vq': jax.random.PRNGKey(2)})

    def loss(x):
      z, _ = vq.apply(variables, x, training=False)
      return jnp.sum(z**2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0)

  def test_multihead(self):
    vq = dnn.VectorQuantization(k=8, num_heads=2)
    x = jnp.asarray(RNG.rand(2, 5, 8).astype(np.float32))
    variables = vq.init({'params': jax.random.PRNGKey(0),
                         'vq': jax.random.PRNGKey(1)}, x, training=True)
    z, c = vq.apply(variables, x, training=False)
    assert z.shape == x.shape
    assert c.shape == (2, 5, 2)


class TestSmallLayers:

  def test_single_gru(self):
    x = jnp.asarray(RNG.rand(2, 6, 4).astype(np.float32))
    mod = dnn.SingleGru(gru_dim=8)
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(variables, x).shape == (2, 6, 8)

  def test_fc_stack_out(self):
    x = jnp.asarray(RNG.rand(2, 6, 4).astype(np.float32))
    mod = dnn.FcStackOut(ch=8, layers=2, n_out=3)
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(variables, x).shape == (2, 6, 3)

  def test_embedding(self):
    idx = jnp.asarray([[1], [5]])
    mod = dnn.Embedding(vocab_size=10, n_dims=6)
    variables = mod.init(jax.random.PRNGKey(0), idx)
    assert mod.apply(variables, idx).shape == (2, 1, 6)


class TestIdentity:

  def test_passthrough(self):
    x = jnp.asarray(RNG.randn(2, 5).astype(np.float32))
    y, _ = dnn.Identity().init_with_output(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_normalize_none_passes_through_with_scale_shift():
  """norm_type=None applies only the learned scale/shift (reference
  nn.py:561 passes through on None) - DilatedConvStack's default."""
  import jax
  import jax.numpy as jnp
  from ddsp_tpu.nn import layers as nn_layers
  x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 4).astype(np.float32))
  m = nn_layers.Normalize(norm_type=None)
  v = m.init(jax.random.PRNGKey(0), x)
  y = m.apply(v, x)
  # Fresh params are scale=1/shift=0: exact pass-through.
  np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0)


def test_dilated_conv_stack_default_norm_runs():
  import jax
  import jax.numpy as jnp
  from ddsp_tpu import nn as dnn
  x = jnp.zeros((1, 16, 1))
  model = dnn.DilatedConvStack(ch=4, layers_per_stack=1, stacks=1)
  v = model.init(jax.random.PRNGKey(0), x)
  y = model.apply(v, x)
  assert np.isfinite(np.asarray(y)).all()
