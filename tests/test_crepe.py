"""Tests for the CREPE port: architecture shapes, f0 decode math, viterbi.

The published pip-package weights are unavailable offline, but the repo
commits weights trained in-env on synthetic harmonic data
(scripts/train_tiny_crepe.py -> assets/crepe/model-tiny.h5), so the
weights-gated accuracy classes run with *learned* weights; the rest pins
the architecture contract (shapes, activation layers), the
activations->f0 decode math (weight-independent), and the plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import losses, nn as dnn, ops
from ddsp_tpu.ops import crepe


RNG = np.random.RandomState(5)


class TestCrepeModel:

  def test_tiny_output_shape(self):
    model = crepe.CrepeModel(model_capacity='tiny')
    x = jnp.asarray(RNG.randn(3, 1024).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == (3, 360)
    # Sigmoid outputs in [0, 1].
    assert np.all(np.asarray(y) >= 0) and np.all(np.asarray(y) <= 1)

  def test_param_structure_matches_keras_names(self):
    model = crepe.CrepeModel(model_capacity='tiny')
    x = jnp.zeros((1, 1024))
    v = model.init(jax.random.PRNGKey(0), x)
    names = set(v['params'])
    assert names == {'conv1', 'conv2', 'conv3', 'conv4', 'conv5', 'conv6',
                     'classifier'} | {f'conv{i}_BN' for i in range(1, 7)}
    # Tiny capacity: first conv has 32*4=128 filters of width 512.
    assert v['params']['conv1']['kernel'].shape == (512, 1, 1, 128)
    # Classifier in from conv6 filters x remaining spatial size.
    assert v['params']['classifier']['kernel'].shape[-1] == 360

  def test_activation_layer_outputs(self):
    x = jnp.asarray(RNG.randn(2, 1024).astype(np.float32))
    for layer in ['conv1-BN', 'conv2-maxpool', 'classifier', None]:
      model = crepe.CrepeModel(model_capacity='tiny',
                               activation_layer=layer)
      v = model.init(jax.random.PRNGKey(0), x)
      y = model.apply(v, x)
      assert y.ndim == 2 and y.shape[0] == 2


class TestH5WeightImport:

  def _write_keras_h5(self, path, variables):
    """Write flax CrepeModel variables in the crepe pip package's keras
    h5 layout (model_weights/<layer>/<layer>/<weight>:0)."""
    import h5py
    params = variables['params']
    stats = variables['batch_stats']
    with h5py.File(path, 'w') as f:
      root = f.create_group('model_weights')

      def put(layer, name, value):
        grp = root.require_group(layer).require_group(layer)
        grp.create_dataset(f'{name}:0', data=np.asarray(value))

      for i in range(1, 7):
        conv = f'conv{i}'
        put(conv, 'kernel', params[conv]['kernel'])
        put(conv, 'bias', params[conv]['bias'])
        bn = f'{conv}-BN'
        put(bn, 'gamma', params[f'{conv}_BN']['scale'])
        put(bn, 'beta', params[f'{conv}_BN']['bias'])
        put(bn, 'moving_mean', stats[f'{conv}_BN']['mean'])
        put(bn, 'moving_variance', stats[f'{conv}_BN']['var'])
      put('classifier', 'kernel', params['classifier']['kernel'])
      put('classifier', 'bias', params['classifier']['bias'])

  def test_round_trip(self, tmp_path):
    """Write keras-layout h5 -> load_weights_from_h5 -> identical trees
    and identical network output (pins the keras<->flax layout mapping,
    which no real weights file exists on this box to pin)."""
    model = crepe.CrepeModel(model_capacity='tiny')
    x = jnp.asarray(RNG.randn(2, 1024).astype(np.float32))
    v = model.init(jax.random.PRNGKey(1), x)
    path = str(tmp_path / 'model-tiny.h5')
    self._write_keras_h5(path, v)

    loaded = crepe.load_weights_from_h5(path, 'tiny')
    flat_v = jax.tree_util.tree_leaves_with_path(
        {'params': v['params'], 'batch_stats': v['batch_stats']})
    flat_l = jax.tree_util.tree_leaves_with_path(loaded)
    assert [k for k, _ in flat_v] == [k for k, _ in flat_l]
    for (_, a), (_, b) in zip(flat_v, flat_l):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y_orig = model.apply(v, x)
    y_loaded = model.apply(loaded, x)
    np.testing.assert_array_equal(np.asarray(y_orig), np.asarray(y_loaded))

  def test_capacity_mismatch_raises(self, tmp_path):
    model = crepe.CrepeModel(model_capacity='tiny')
    v = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 1024)))
    path = str(tmp_path / 'model-tiny.h5')
    self._write_keras_h5(path, v)
    with pytest.raises(ValueError, match='capacity'):
      crepe.load_weights_from_h5(path, 'full')

  def test_random_fallback_warns(self, caplog, monkeypatch):
    import logging
    # Simulate a weights-free environment (no env dir, no repo asset).
    monkeypatch.setattr(crepe, 'default_weights_path', lambda *a: None)
    with caplog.at_level(logging.WARNING):
      model = crepe.PretrainedCrepe(model_capacity='tiny')
    assert not model.pretrained
    assert any('RANDOM weights' in r.message for r in caplog.records)


@pytest.mark.skipif(
    crepe.default_weights_path('tiny') is None,
    reason='trained CREPE weights not available (set $CREPE_WEIGHTS_DIR or '
           'commit assets/crepe/model-tiny.h5 via scripts/train_tiny_crepe.py)')
class TestPretrainedPitchAccuracy:

  def test_sinusoid_within_20_cents(self):
    """With real weights: a clean 440 Hz sinusoid decodes within 20 cents
    (one pitch bin). Skipped when no weights are on disk."""
    model = crepe.PretrainedCrepe(model_capacity='tiny', hop_size=160)
    assert model.pretrained
    sr, secs, hz = 16000, 1.0, 440.0
    t = np.arange(int(sr * secs)) / sr
    audio = jnp.asarray((0.7 * np.sin(2 * np.pi * hz * t))
                        .astype(np.float32))[jnp.newaxis]
    f0, conf = model.predict_f0_and_confidence(audio, padding='center')
    f0 = np.asarray(f0)[0][2:-2]  # trim edge frames
    cents_err = np.abs(1200 * np.log2(f0 / hz))
    assert np.median(cents_err) < 20, (np.median(cents_err), f0[:5])


class TestActivationsToF0:

  def test_peaked_activation_decodes_bin_frequency(self):
    # One-hot activation at a known bin -> cents -> Hz.
    for bin_idx in [40, 180, 300]:
      acts = np.full((1, 360), 1e-6, np.float32)
      acts[0, bin_idx] = 1.0
      f0_hz, conf = crepe.activations_to_f0_and_confidence(
          jnp.asarray(acts))
      expected_cent = crepe._CENT_MAPPING[bin_idx]
      expected_hz = 10 * 2**(expected_cent / 1200.0)
      np.testing.assert_allclose(float(f0_hz[0]), expected_hz, rtol=1e-3)
      np.testing.assert_allclose(float(conf[0, 0]), 1.0)

  def test_local_weighting_interpolates(self):
    # Two equal neighboring bins -> f0 between the two bin frequencies.
    acts = np.full((1, 360), 1e-9, np.float32)
    acts[0, 100] = 1.0
    acts[0, 101] = 1.0
    f0, _ = crepe.activations_to_f0_and_confidence(jnp.asarray(acts))
    lo = 10 * 2**(crepe._CENT_MAPPING[100] / 1200.0)
    hi = 10 * 2**(crepe._CENT_MAPPING[101] / 1200.0)
    assert lo < float(f0[0]) < hi

  def test_viterbi_centers_smooth_outliers(self):
    # Track at bin 100 with one outlier spike; viterbi should remove it.
    t = 20
    acts = np.full((1, t, 360), 1e-4, np.float32)
    acts[0, :, 100] = 0.9
    acts[0, 10, 100] = 1e-4
    acts[0, 10, 300] = 0.95  # outlier far away
    centers = crepe.crepe_viterbi_centers(jnp.asarray(acts))
    c = np.asarray(centers)[0]
    assert c.shape == (t,)
    assert np.all(np.abs(c - 100) <= 2), c


class TestPretrainedCrepe:

  def test_predict_shapes(self):
    model = crepe.PretrainedCrepe(model_capacity='tiny', hop_size=160)
    audio = jnp.asarray(RNG.randn(2, 3200).astype(np.float32) * 0.1)
    f0, conf = model.predict_f0_and_confidence(audio, padding='center')
    # center padding (librosa-style): n_frames = 3200//160 + 1 = 21.
    assert f0.shape == (2, 21)
    assert conf.shape == (2, 21)
    assert np.all(np.isfinite(np.asarray(f0)))

  def test_compute_f0_api(self):
    audio = RNG.randn(3200).astype(np.float32) * 0.1
    f0, conf = ops.compute_f0(audio, frame_rate=100, viterbi=False)
    assert f0.shape == (21,) and conf.shape == (21,)
    assert isinstance(f0, np.ndarray)


class TestOnlineF0PowerPreprocessor:

  def test_online_features(self):
    pre = dnn.OnlineF0PowerPreprocessor(
        frame_rate=100, frame_size=1024, padding='center',
        compute_power=True, compute_f0=True, crepe_model_capacity='tiny')
    audio = jnp.asarray(RNG.randn(1, 3200).astype(np.float32) * 0.1)
    features = {'audio': audio}
    v = pre.init(jax.random.PRNGKey(0), features)
    out = pre.apply(v, features)
    assert out['f0_hz'].shape == (1, 21, 1)
    assert out['pw_db'].shape == (1, 21, 1)
    assert out['f0_scaled'].shape == (1, 21, 1)
    assert np.all(np.asarray(out['f0_scaled']) >= 0)
    assert np.all(np.asarray(out['f0_scaled']) <= 1)

  def test_precomputed_f0_passthrough(self):
    pre = dnn.OnlineF0PowerPreprocessor(
        frame_rate=100, frame_size=1024, padding='center',
        compute_power=True, compute_f0=False)
    f0 = np.full((1, 21), 220.0, np.float32)
    conf = np.ones((1, 21), np.float32)
    features = {'audio': jnp.asarray(
        RNG.randn(1, 3200).astype(np.float32) * 0.1),
                'f0_hz': jnp.asarray(f0), 'f0_confidence': jnp.asarray(conf)}
    out = dnn.OnlineF0PowerPreprocessor(
        frame_rate=100, frame_size=1024, compute_f0=False).apply(
            {}, features)
    np.testing.assert_allclose(np.asarray(out['f0_hz'])[:, :, 0], f0)

  def test_grad_blocked_through_f0(self):
    pre = dnn.OnlineF0PowerPreprocessor(
        frame_rate=100, frame_size=1024, compute_power=True,
        compute_f0=True, crepe_model_capacity='tiny')
    audio = jnp.asarray(RNG.randn(1, 3200).astype(np.float32) * 0.1)

    def f0_sum(a):
      out = pre.apply({}, {'audio': a})
      return jnp.sum(out['f0_hz'])

    g = jax.grad(f0_sum)(audio)
    np.testing.assert_allclose(np.asarray(g), 0.0)


class TestCrepeEmbeddingLoss:

  def test_loss_runs_and_grads_flow_to_audio_only(self):
    loss_mod = losses.PretrainedCREPEEmbeddingLoss(
        model_capacity='tiny', activation_layer='conv2-maxpool')
    target = jnp.asarray(RNG.randn(1, 2048).astype(np.float32) * 0.1)
    audio = jnp.asarray(RNG.randn(1, 2048).astype(np.float32) * 0.1)
    v = loss_mod.init(jax.random.PRNGKey(0), target, audio)
    # Frozen CREPE: no trainable params belong to the loss.
    assert not v.get('params', {})
    val = loss_mod.apply(v, target, audio)
    assert np.isfinite(float(val)) and float(val) > 0
    same = loss_mod.apply(v, target, target)
    np.testing.assert_allclose(float(same), 0.0, atol=1e-5)
    g = jax.grad(lambda a: loss_mod.apply(v, target, a))(audio)
    assert np.any(np.asarray(g) != 0)


@pytest.mark.skipif(
    crepe.default_weights_path('tiny') is None,
    reason='trained CREPE weights not available')
class TestCrepeEvalMetricsWithWeights:

  def test_f0gen_crepe_rpa_on_held_out_tones(self):
    """F0GenMetrics(estimator='crepe') reports RPA >= 0.9 on held-out
    synthetic tones with the committed in-env-trained weights."""
    from ddsp_tpu.eval import metrics as metrics_lib
    sr, frame_rate, secs = 16000, 250, 1.0
    t = np.arange(int(sr * secs)) / sr
    tones = [233.1, 311.1, 466.2, 622.3]  # between training-grid pitches
    audio = np.stack([
        (0.6 * np.sin(2 * np.pi * hz * t) +
         0.15 * np.sin(2 * np.pi * 2 * hz * t)).astype(np.float32)
        for hz in tones])
    from ddsp_tpu.ops import spectral
    n_frames, _ = spectral.get_framed_lengths(audio.shape[1], 1024,
                                              sr // frame_rate, 'center')
    batch = {
        'f0_hz': np.tile(np.asarray(tones, np.float32)[:, None],
                         (1, n_frames)),
        'f0_confidence': np.ones((len(tones), n_frames), np.float32),
    }
    m = metrics_lib.F0GenMetrics(sr, frame_rate, estimator='crepe')
    m.update_state(batch, audio)
    res = m.flush(step=0)
    assert res['metrics/f0_crepe/raw_pitch_accuracy'] >= 0.9, res
    assert res['metrics/f0_crepe/outlier_ratio'] == 0.0
