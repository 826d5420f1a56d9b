"""Tests for the extended encoder/decoder families.

Shape/property tests mirroring the reference's encoders/decoders tests:
every module builds, runs, and emits the declared keys at the right shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu import nn as dnn


RNG = np.random.RandomState(3)
KEY = jax.random.PRNGKey(0)


def _features(b=1, t=50, n_samples=16000):
  return {
      'audio': jnp.asarray(RNG.randn(b, n_samples).astype(np.float32) * 0.1),
      'f0_scaled': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
      'ld_scaled': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
      'f0_midi': jnp.asarray(
          (60 + 12 * RNG.rand(b, t, 1)).astype(np.float32)),
      'loudness': jnp.asarray(
          (-40 + 20 * RNG.rand(b, t, 1)).astype(np.float32)),
  }


class TestEncoders:

  def test_aggregate_features_encoder(self):
    f = _features()
    enc = dnn.AggregateFeaturesEncoder(ch=16)
    v = enc.init(KEY, f)
    z = enc.apply(v, f)['z']
    assert z.shape == (1, 50, 16)
    # Aggregated: constant over time.
    assert np.allclose(np.asarray(z)[0, 0], np.asarray(z)[0, -1], atol=1e-5)

  def test_mfcc_encoder(self):
    f = _features()
    enc = dnn.MfccEncoder(time_steps=50)
    v = enc.init(KEY, f)
    z = enc.apply(v, f)['z']
    assert z.shape == (1, 50, 30)

  def test_mfcc_rnn_encoder(self):
    f = _features()
    enc = dnn.MfccRnnEncoder(rnn_channels=16, z_dims=8)
    v = enc.init(KEY, f)
    z = enc.apply(v, f)['z']
    assert z.shape == (1, 50, 8)

  def test_expression_encoder_with_audio(self):
    f = _features()
    enc = dnn.ExpressionEncoder(
        net=dnn.FcStack(ch=16, layers=2), z_dims=8,
        input_keys=('f0_scaled', 'ld_scaled', 'audio'))
    v = enc.init(KEY, f)
    z = enc.apply(v, f)['z']
    assert z.shape == (1, 50, 8)

  def test_midi_encoder(self):
    f = _features()
    enc = dnn.MidiEncoder(net=dnn.FcStack(ch=16, layers=1))
    v = enc.init(KEY, f)
    out = enc.apply(v, f)
    assert out['z_pitch'].shape == (1, 50, 1)
    assert out['z_vel'].shape == (1, 50, 1)

  def test_harmonic_to_midi_encoder(self):
    b, t = 1, 50
    inputs = {
        'f0_midi': jnp.asarray(
            (60 + RNG.rand(b, t, 1)).astype(np.float32)),
        'amps': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
        'hd': jnp.asarray(RNG.rand(b, t, 20).astype(np.float32)),
        'noise': jnp.asarray(RNG.rand(b, t, 17).astype(np.float32)),
    }
    enc = dnn.HarmonicToMidiEncoder(net=dnn.FcStack(ch=16, layers=1))
    v = enc.init(KEY, inputs)
    out = enc.apply(v, inputs)
    assert out['z_pitch'].shape == (b, t, 1)

  def test_sinusoidal_to_harmonic_encoder(self):
    b, t, k = 1, 20, 16
    inputs = {
        'sin_freqs': jnp.asarray(
            (100 + 4000 * RNG.rand(b, t, k)).astype(np.float32)),
        'sin_amps': jnp.asarray(RNG.rand(b, t, k).astype(np.float32)),
    }
    enc = dnn.SinusoidalToHarmonicEncoder(
        net=dnn.RnnSandwich(fc_stack_ch=16, rnn_ch=16), n_harmonics=24,
        f0_depth=8)
    v = enc.init(KEY, inputs)
    out = enc.apply(v, inputs)
    assert out['harm_amp'].shape == (b, t, 1)
    assert out['harm_dist'].shape == (b, t, 24)
    assert out['f0_hz'].shape == (b, t, 1)
    # Frequencies bounded by the softmax range.
    f0 = np.asarray(out['f0_hz'])
    assert np.all(f0 >= 20.0) and np.all(f0 <= 1200.0)
    # Harmonic distribution normalized.
    np.testing.assert_allclose(np.asarray(out['harm_dist']).sum(-1), 1.0,
                               atol=1e-4)

  def test_resnet_sinusoidal_encoder(self):
    f = {'audio': jnp.asarray(
        RNG.randn(1, 16000).astype(np.float32) * 0.1)}
    enc = dnn.ResnetSinusoidalEncoder(
        output_splits=(('frequencies', 8 * 4), ('amplitudes', 8),
                       ('noise_magnitudes', 5)))
    v = enc.init(KEY, f)
    out = enc.apply(v, f)
    n_frames = out['amplitudes'].shape[1]
    assert out['frequencies'].shape == (1, n_frames, 32)
    assert out['amplitudes'].shape == (1, n_frames, 8)
    assert out['noise_magnitudes'].shape == (1, n_frames, 5)


class TestDecoders:

  def test_midi_decoder(self):
    b, t = 1, 50
    inputs = {'z_pitch': jnp.asarray(
        (60 + RNG.rand(b, t, 1)).astype(np.float32))}
    dec = dnn.MidiDecoder(net=dnn.FcStack(ch=16, layers=1))
    v = dec.init(KEY, inputs)
    out = dec.apply(v, inputs)
    assert out['f0_midi'].shape == (b, t, 1)
    assert out['loudness'].shape == (b, t, 1)
    # Center-loudness maps the head into the typical dB range.
    assert np.all(np.asarray(out['loudness']) < 0)

  def test_midi_to_harmonic_decoder(self):
    b, t = 1, 50
    inputs = {'z_pitch': jnp.asarray(
        (60 + RNG.rand(b, t, 1)).astype(np.float32))}
    dec = dnn.MidiToHarmonicDecoder(
        net=dnn.FcStack(ch=16, layers=1),
        output_splits=(('f0_midi', 1), ('amplitudes', 1),
                       ('harmonic_distribution', 12), ('magnitudes', 9)))
    v = dec.init(KEY, inputs)
    out = dec.apply(v, inputs)
    assert out['f0_hz'].shape == (b, t, 1)
    assert out['harmonic_distribution'].shape == (b, t, 12)
    # f0_hz consistent with f0_midi.
    from ddsp_tpu.ops.core import midi_to_hz
    np.testing.assert_allclose(
        np.asarray(out['f0_hz']),
        np.asarray(midi_to_hz(out['f0_midi'], midi_zero_silence=True)),
        rtol=1e-5)

  def test_dilated_conv_decoder_conditional(self):
    b, t = 1, 16
    inputs = {
        'ld_scaled': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
        'f0_scaled': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
        'z': jnp.asarray(RNG.rand(b, t, 4).astype(np.float32)),
    }
    dec = dnn.DilatedConvDecoder(
        ch=8, layers_per_stack=2, stacks=1,
        output_splits=(('amps', 1), ('harmonic_distribution', 12)))
    v = dec.init(KEY, inputs)
    out = dec.apply(v, inputs)
    assert out['amps'].shape == (b, t, 1)
    assert out['harmonic_distribution'].shape == (b, t, 12)

  def test_dilated_conv_decoder_unconditional(self):
    b, t = 1, 16
    inputs = {
        'ld_scaled': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
        'f0_scaled': jnp.asarray(RNG.rand(b, t, 1).astype(np.float32)),
    }
    dec = dnn.DilatedConvDecoder(
        ch=8, layers_per_stack=2, stacks=1, conditioning_keys=(),
        output_splits=(('amps', 1), ('harmonic_distribution', 12)))
    v = dec.init(KEY, inputs)
    out = dec.apply(v, inputs)
    assert out['amps'].shape == (b, t, 1)


class TestComputeDtype:

  def test_bf16_decoder_f32_params_and_outputs(self):
    """compute_dtype='bfloat16' runs GEMMs in bf16 but keeps float32
    params and float32 outputs, staying close to the f32 result."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ddsp_tpu import nn as dnn
    rng = np.random.RandomState(0)
    x = {'f0_scaled': jnp.asarray(rng.rand(2, 40, 1).astype(np.float32)),
         'ld_scaled': jnp.asarray(rng.rand(2, 40, 1).astype(np.float32))}
    outs = {}
    for dt in ('float32', 'bfloat16'):
      dec = dnn.RnnFcDecoder(
          rnn_channels=32, ch=32, layers_per_stack=2, compute_dtype=dt,
          input_keys=('ld_scaled', 'f0_scaled'),
          output_splits=(('amps', 1), ('harmonic_distribution', 10)))
      v = dec.init(jax.random.PRNGKey(0), x)
      assert all(l.dtype == jnp.float32
                 for l in jax.tree_util.tree_leaves(v))
      o = dec.apply(v, x)
      assert all(val.dtype == jnp.float32 for val in o.values())
      outs[dt] = np.asarray(o['harmonic_distribution'])
    scale = np.abs(outs['float32']).max() + 1e-9
    assert np.abs(outs['bfloat16'] - outs['float32']).max() / scale < 0.1

  def test_bf16_honored_on_all_rnn_branches(self):
    """bidir, non-fast GRU, LSTM, and StatelessRnn all run bf16 compute
    with float32 params and float32 outputs (no silent ignore)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ddsp_tpu.nn import layers as nn_layers
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 8).astype(np.float32))
    for mod in (
        nn_layers.Rnn(dims=16, bidir=True, compute_dtype='bfloat16'),
        nn_layers.Rnn(dims=16, use_fast_gru=False,
                      compute_dtype='bfloat16'),
        nn_layers.Rnn(dims=16, rnn_type='lstm', compute_dtype='bfloat16'),
    ):
      v = mod.init(jax.random.PRNGKey(0), x)
      assert all(l.dtype == jnp.float32
                 for l in jax.tree_util.tree_leaves(v))
      y = mod.apply(v, x)
      assert y.dtype == jnp.float32
      assert np.isfinite(np.asarray(y)).all()
    srnn = nn_layers.StatelessRnn(dims=16, rnn_type='lstm',
                                  compute_dtype='bfloat16')
    state = jnp.zeros((2, 32), jnp.float32)
    v = srnn.init(jax.random.PRNGKey(0), x, state)
    y, new_state = srnn.apply(v, x, state)
    assert y.dtype == jnp.float32 and new_state.dtype == jnp.float32
