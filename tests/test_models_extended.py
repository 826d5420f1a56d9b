"""Integration tests for MidiAutoencoder, ZMidiAutoencoder, InverseSynthesis.

Mirror of the reference's de-facto system test pattern: build the full model
at small sizes, run a forward pass on random audio, check output shapes and
finite losses (reference autoencoder_test.py:29-78).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import losses as ddsp_losses
from ddsp_tpu import models, nn as dnn


RNG = np.random.RandomState(11)

N_SAMPLES = 4000
TIME_STEPS = 50
SR = 16000


def _features(b=1):
  f0 = 220.0 + 220.0 * RNG.rand(b, TIME_STEPS, 1)
  pianoroll = np.zeros((b, TIME_STEPS, 128), np.float32)
  pianoroll[:, :, 57] = 1.0
  return {
      'audio': jnp.asarray(RNG.randn(b, N_SAMPLES).astype(np.float32) * .1),
      'f0_hz': jnp.asarray(f0.astype(np.float32)),
      'loudness_db': jnp.asarray(
          (-30 - 20 * RNG.rand(b, TIME_STEPS, 1)).astype(np.float32)),
      'note_active_velocities': jnp.asarray(pianoroll),
      'instrument_id': jnp.asarray(np.zeros((b,), np.int32)),
  }


def _recon_loss_group():
  return ddsp_losses.LossGroup(dag=[
      (ddsp_losses.SpectralLoss(fft_sizes=(256, 128),
                                name='synth_spectral_loss'),
       ['audio', 'synth_audio']),
      (ddsp_losses.ParamLoss(weight=50.0, loss_type='L2', name='f0_loss'),
       ['f0_midi', 'f0_midi_pred', 'f0_loss_weights']),
      (ddsp_losses.ParamLoss(weight=0.5, name='amps_loss'),
       ['amps', 'amps_pred']),
      (ddsp_losses.ParamLoss(weight=500.0, name='hd_loss'),
       ['hd', 'hd_pred']),
      (ddsp_losses.ParamLoss(weight=0.5, name='noise_loss'),
       ['noise', 'noise_pred']),
  ])


def _synthcoder():
  return dnn.RnnFcDecoder(
      rnn_channels=16, ch=16, layers_per_stack=1,
      input_keys=('ld_scaled', 'f0_scaled'),
      output_splits=(('amplitudes', 1), ('harmonic_distribution', 12),
                     ('magnitudes', 9)))


def _z_synthcoder():
  return dnn.RnnFcDecoder(
      rnn_channels=16, ch=16, layers_per_stack=1,
      input_keys=('ld_scaled', 'f0_scaled', 'z'),
      output_splits=(('amplitudes', 1), ('harmonic_distribution', 12),
                     ('magnitudes', 9)))


def _midi_decoder():
  return dnn.MidiToHarmonicDecoder(
      net=dnn.FcStack(ch=16, layers=1),
      output_splits=(('f0_midi', 1), ('amplitudes', 1),
                     ('harmonic_distribution', 12), ('magnitudes', 9)))


def _preprocessor():
  return dnn.F0LoudnessPreprocessor(time_steps=TIME_STEPS)


class TestMidiAutoencoder:

  def _run(self, model, features):
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, features, training=True,
                           return_losses=True)
    outputs, losses = model.apply(
        variables, features, training=True, return_losses=True,
        rngs={'noise': jax.random.PRNGKey(2)})
    return variables, outputs, losses

  def test_gt_midi_path(self):
    # midi_encoder=None: ground-truth MIDI from the piano roll.
    model = models.MidiAutoencoder(
        synthcoder=_synthcoder(),
        midi_decoder=_midi_decoder(),
        preprocessor=_preprocessor(),
        reconstruction_losses=_recon_loss_group(),
        qpitch_f0rec_loss=models.MarginLoss(weight=50.0, margin=0.5,
                                            name='q_pitch_f0_rec'),
        n_samples=N_SAMPLES, reverb_length=1000, reverb=True)
    features = _features()
    _, outputs, losses = self._run(model, features)
    assert outputs['synth_audio'].shape == (1, N_SAMPLES)
    assert outputs['midi_audio'].shape == (1, N_SAMPLES)
    assert outputs['pianoroll'].shape == (1, TIME_STEPS, 128)
    # GT pitch comes from the piano roll (note 57).
    np.testing.assert_allclose(np.asarray(outputs['q_pitch'])[0, :, 0], 57.0)
    # Note: flax names field-bound submodules by field name, so the margin
    # loss lands under 'qpitch_f0rec_loss'.
    for k in ['synth_spectral_loss', 'f0_loss', 'qpitch_f0rec_loss',
              'total_loss']:
      assert k in losses, sorted(losses)
      assert np.isfinite(float(losses[k])), k

  def test_midi_encoder_path(self):
    model = models.MidiAutoencoder(
        synthcoder=_synthcoder(),
        midi_encoder=dnn.HarmonicToMidiEncoder(
            net=dnn.FcStack(ch=16, layers=1)),
        midi_decoder=_midi_decoder(),
        preprocessor=_preprocessor(),
        reconstruction_losses=_recon_loss_group(),
        pitch_qpitch_loss=ddsp_losses.ParamLoss(name='pitch_qpitch'),
        midi_slowness_loss=models.SlownessLoss(weight=1.0, name='slowness'),
        n_samples=N_SAMPLES, reverb=False)
    features = _features()
    _, outputs, losses = self._run(model, features)
    assert 'z_pitch' in outputs
    # Quantized pitch is integer-valued.
    q = np.asarray(outputs['q_pitch'])
    np.testing.assert_allclose(q, np.round(q), atol=1e-5)
    assert 'pitch_qpitch_loss' in losses and 'midi_slowness_loss' in losses
    assert np.isfinite(float(losses['total_loss']))

  def test_grads_flow(self):
    model = models.MidiAutoencoder(
        synthcoder=_synthcoder(),
        midi_decoder=_midi_decoder(),
        preprocessor=_preprocessor(),
        reconstruction_losses=_recon_loss_group(),
        n_samples=N_SAMPLES, reverb=False)
    features = _features()
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, features, training=True,
                           return_losses=True)

    def loss_fn(params):
      _, losses = model.apply({'params': params}, features, training=True,
                              return_losses=True,
                              rngs={'noise': jax.random.PRNGKey(2)})
      return losses['total_loss']

    val, grads = jax.value_and_grad(loss_fn)(variables['params'])
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # The synthcoder must receive gradients through the synth branch.
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    synth_grads = [l for p, l in flat if 'synthcoder' in str(p)]
    assert any(np.any(np.asarray(g) != 0) for g in synth_grads)


class TestZMidiAutoencoder:

  def test_full_z_path(self):
    model = models.ZMidiAutoencoder(
        synthcoder=_z_synthcoder(),
        midi_decoder=dnn.MidiToHarmonicDecoder(
            net=dnn.DilatedConvStack(ch=16, layers_per_stack=1, stacks=1,
                                     norm_type='layer', conditional=True),
            output_splits=(('f0_midi', 1), ('amplitudes', 1),
                           ('harmonic_distribution', 12),
                           ('magnitudes', 9))),
        preprocessor=_preprocessor(),
        reconstruction_losses=_recon_loss_group(),
        z_synth_encoders=(dnn.OneHotEncoder(vocab_size=4, z_dims=8),),
        z_global_encoders=(
            dnn.ExpressionEncoder(
                net=dnn.FcStack(ch=16, layers=1), z_dims=8,
                input_keys=('f0_scaled', 'amps_scaled', 'hd_scaled',
                            'noise_scaled'), pool_time=True),),
        z_note_encoder=dnn.ExpressionEncoder(
            net=dnn.FcStack(ch=16, layers=1), z_dims=8,
            input_keys=('f0_scaled', 'amps_scaled', 'hd_scaled',
                        'noise_scaled'), pool_time=False),
        z_preconditioning_stack=dnn.FcStackOut(ch=16, layers=1, n_out=8),
        n_samples=N_SAMPLES, reverb=False)
    features = _features()
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, features, training=True,
                           return_losses=True)
    outputs, losses = model.apply(
        variables, features, training=True, return_losses=True,
        rngs={'noise': jax.random.PRNGKey(2)})
    assert outputs['synth_audio'].shape == (1, N_SAMPLES)
    assert outputs['midi_audio'].shape == (1, N_SAMPLES)
    assert 'z_global' in outputs and 'z_notes' in outputs
    assert np.isfinite(float(losses['total_loss']))


class TestInverseSynthesis:

  def _model(self, harmonic_encoder=True, **kwargs):
    n_sin, freq_depth = 8, 4
    sin_enc = dnn.ResnetSinusoidalEncoder(
        output_splits=(('frequencies', n_sin * freq_depth),
                       ('amplitudes', n_sin),
                       ('noise_magnitudes', 5)))
    harm_enc = None
    if harmonic_encoder:
      harm_enc = dnn.SinusoidalToHarmonicEncoder(
          net=dnn.RnnSandwich(fc_stack_ch=8, rnn_ch=8),
          n_harmonics=12, f0_depth=4)
    return models.InverseSynthesis(
        sinusoidal_encoder=sin_enc,
        harmonic_encoder=harm_enc,
        losses=(ddsp_losses.SpectralLoss(fft_sizes=(256, 128),
                                         name='spectral_loss'),),
        freq_depth=freq_depth,
        n_samples=N_SAMPLES, sample_rate=SR, reverb=False, **kwargs)

  def test_sinusoidal_only(self):
    model = self._model(harmonic_encoder=False)
    features = {'audio': jnp.asarray(
        RNG.randn(1, N_SAMPLES).astype(np.float32) * 0.1)}
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, features, training=True,
                           return_losses=True)
    outputs, losses = model.apply(
        variables, features, training=True, return_losses=True,
        rngs={'noise': jax.random.PRNGKey(2)})
    assert outputs['sin_audio'].shape == (1, N_SAMPLES)
    assert 'sin_spectral_loss' in losses
    assert np.isfinite(float(losses['total_loss']))

  def test_hierarchical_with_consistency(self):
    model = self._model(
        harmonic_encoder=True,
        sinusoidal_consistency_losses=(
            ddsp_losses.KDEConsistencyLoss(name='kde_consistency'),),
        twm_loss=ddsp_losses.TWMLoss(name='twm_loss'))
    features = {'audio': jnp.asarray(
        RNG.randn(1, N_SAMPLES).astype(np.float32) * 0.1)}
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, features, training=True,
                           return_losses=True)
    outputs, losses = model.apply(
        variables, features, training=True, return_losses=True,
        rngs={'noise': jax.random.PRNGKey(2)})
    assert outputs['harm_audio'].shape == (1, N_SAMPLES)
    assert outputs['harm_dist'].shape[-1] == 12
    for k in ['sin_spectral_loss', 'harm_spectral_loss', 'kde_consistency_loss',
              'twm_loss']:
      assert k in losses, sorted(losses)
    assert np.isfinite(float(losses['total_loss']))

  def test_self_supervised_batch(self):
    # Ground-truth controls at the encoder's frame rate: fft hop 256 over
    # 4000 samples (pad_end) -> 16 frames.
    n_sin, t = 8, 16
    model = self._model(
        harmonic_encoder=False,
        sinusoidal_consistency_losses=(
            ddsp_losses.KDEConsistencyLoss(name='kde_consistency'),),
        filtered_noise_consistency_loss=(
            ddsp_losses.FilteredNoiseConsistencyLoss(name='fn_consistency')))
    features = {
        'sin_amps': jnp.asarray(
            RNG.rand(1, t, n_sin).astype(np.float32) * 0.1),
        'sin_freqs': jnp.asarray(
            (100 + 2000 * RNG.rand(1, t, n_sin)).astype(np.float32)),
        'noise_magnitudes': jnp.asarray(
            RNG.rand(1, t, 5).astype(np.float32) * 0.01),
    }
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = model.init(rngs, features, training=True,
                           return_losses=True)
    outputs, losses = model.apply(
        variables, features, training=True, return_losses=True,
        rngs={'noise': jax.random.PRNGKey(2)})
    assert 'ss_kde_consistency_loss' in losses
    assert 'ss_filtered_noise_consistency_loss' in losses
    assert np.isfinite(float(losses['total_loss']))
