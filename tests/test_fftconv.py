"""Tests for ddsp_tpu.ops.fftconv.

Mirrors reference core_test.py:734-823: fft_convolve vs
scipy.signal.fftconvolve with mean |diff| <= 1e-3, group-delay compensation,
error contracts; plus overlap_and_add / frame goldens vs tf.signal.
"""

import numpy as np
import pytest
import scipy.signal

from ddsp_tpu import ops


def test_frame_matches_tf_signal():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(0)
  x = rng.randn(2, 1000).astype(np.float32)
  for frame_length, frame_step, pad_end in [(256, 64, True), (256, 64, False),
                                            (100, 100, True), (33, 7, False)]:
    got = np.asarray(ops.frame(x, frame_length, frame_step, pad_end=pad_end))
    want = tf.signal.frame(x, frame_length, frame_step,
                           pad_end=pad_end).numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_overlap_and_add_matches_tf_signal():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(0)
  for shape, hop in [((2, 10, 256), 64), ((3, 5, 100), 100),
                     ((1, 7, 33), 13), ((2, 4, 3, 50), 17)]:
    frames = rng.randn(*shape).astype(np.float32)
    got = np.asarray(ops.overlap_and_add(frames, hop))
    want = tf.signal.overlap_and_add(frames, hop).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize('audio_size,ir_size',
                         [(1000, 10), (1000, 100), (1000, 1000), (64000, 257)])
def test_fft_convolve_is_accurate_lti(audio_size, ir_size):
  """LTI case vs scipy.signal.fftconvolve (reference tolerance 1e-3)."""
  rng = np.random.RandomState(0)
  audio = rng.randn(2, audio_size).astype(np.float32)
  ir = (rng.randn(2, ir_size) * np.hanning(ir_size)).astype(np.float32)

  got = np.asarray(ops.fft_convolve(audio, ir, padding='valid',
                                    delay_compensation=0))
  want = np.stack(
      [scipy.signal.fftconvolve(audio[i], ir[i]) for i in range(2)])
  assert got.shape == want.shape == (2, audio_size + ir_size - 1)
  assert np.mean(np.abs(got - want)) <= 1e-3


def test_fft_convolve_same_padding_shape():
  audio = np.random.randn(2, 1000).astype(np.float32)
  ir = np.random.randn(2, 50).astype(np.float32)
  out = ops.fft_convolve(audio, ir, padding='same')
  assert out.shape == (2, 1000)


@pytest.mark.parametrize('gain', [1.0, 0.1])
def test_delay_compensation_corrects_group_delay(gain):
  """Flat-magnitude filter output is in phase with the input.

  Reference config (core_test.py:763-785): 1025 frequencies, window 257.
  """
  rng = np.random.RandomState(0)
  audio = rng.randn(1, 1000).astype(np.float32)
  magnitudes = gain * np.ones((1, 1025), np.float32)
  ir = ops.frequency_impulse_response(magnitudes, window_size=257)
  out = np.asarray(ops.fft_convolve(audio, ir, padding='same'))
  assert out.shape == audio.shape
  assert np.mean(np.abs(gain * audio - out)) <= 1e-3


def test_fft_convolve_time_varying():
  """LTV filtering: each audio frame convolved with its own IR."""
  rng = np.random.RandomState(0)
  batch, n_frames, frame_size, ir_size = 1, 4, 250, 20
  audio_size = n_frames * frame_size
  audio = rng.randn(batch, audio_size).astype(np.float32)
  irs = (rng.randn(batch, n_frames, ir_size)).astype(np.float32)

  got = np.asarray(ops.fft_convolve(audio, irs, padding='valid',
                                    delay_compensation=0))

  # Numpy reference: per-frame convolution then overlap-add.
  want = np.zeros((batch, audio_size + ir_size - 1))
  for f in range(n_frames):
    seg = audio[0, f * frame_size:(f + 1) * frame_size]
    conv = np.convolve(seg, irs[0, f])
    want[0, f * frame_size:f * frame_size + len(conv)] += conv
  assert np.mean(np.abs(got - want)) <= 1e-3


def test_fft_convolve_batch_mismatch_raises():
  with pytest.raises(ValueError):
    ops.fft_convolve(np.zeros((2, 100), np.float32),
                     np.zeros((3, 10), np.float32))


def test_fft_convolve_ir_broadcast():
  audio = np.random.randn(4, 1000).astype(np.float32)
  ir = np.random.randn(1, 20).astype(np.float32)
  out = ops.fft_convolve(audio, ir, padding='same')
  assert out.shape == (4, 1000)


def test_fft_convolve_bad_padding_raises():
  with pytest.raises(ValueError):
    ops.fft_convolve(np.zeros((1, 100), np.float32),
                     np.zeros((1, 10), np.float32), padding='bogus')


def test_fft_convolve_frame_mismatch_raises():
  with pytest.raises(ValueError):
    # 3 IR frames cannot evenly divide 100 samples (ceil(100/3)=34 -> 3
    # frames of 34 = 102 > 100 works; use a case that mismatches).
    ops.fft_convolve(np.zeros((1, 100), np.float32),
                     np.zeros((1, 70, 10), np.float32))


def test_get_fft_size():
  assert ops.get_fft_size(1000, 10) == 1024
  assert ops.get_fft_size(1000, 100) == 2048
  assert ops.get_fft_size(4000, 48000) == 65536


def test_frequency_impulse_response_windowing():
  """IR is causal-form, correct size, and windowed."""
  # window_size > ir_size clamps to ir_size (= 2 * (n_freqs - 1)).
  magnitudes = np.ones((1, 65), np.float32)
  ir = np.asarray(ops.frequency_impulse_response(magnitudes,
                                                 window_size=257))
  assert ir.shape[-1] == 128
  # Flat magnitude response -> (windowed) impulse centered at ir_size // 2.
  peak = np.argmax(np.abs(ir[0]))
  assert int(peak) == 64
  # Requested window smaller than ir crops the IR to window_size.
  magnitudes = np.ones((1, 1025), np.float32)
  ir = np.asarray(ops.frequency_impulse_response(magnitudes,
                                                 window_size=257))
  assert ir.shape[-1] == 257
  assert abs(int(np.argmax(np.abs(ir[0]))) - 128) <= 1


def test_frequency_impulse_response_matches_tf_reference():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(0)
  magnitudes = rng.rand(2, 3, 65).astype(np.float32)

  # Reproduce the reference computation with tf ops (irfft + hann window
  # rolled to causal form; reference core.py:1476-1564).
  def tf_reference(mags, window_size):
    ir = tf.signal.irfft(tf.complex(mags, tf.zeros_like(mags)))
    ir_size = int(ir.shape[-1])
    if (window_size <= 0) or (window_size > ir_size):
      window_size_ = ir_size
    else:
      window_size_ = window_size
    window = tf.signal.hann_window(window_size_)
    padding = ir_size - window_size_
    if padding > 0:
      half_idx = (window_size_ + 1) // 2
      window = tf.concat([window[half_idx:], tf.zeros([padding]),
                          window[:half_idx]], axis=0)
    else:
      window = tf.signal.fftshift(window, axes=-1)
    window = tf.broadcast_to(window, ir.shape)
    ir = window * tf.math.real(ir)
    if padding > 0:
      first_half_start = (ir_size - (half_idx - 1)) + 1
      second_half_end = half_idx + 1
      ir = tf.concat([ir[..., first_half_start:], ir[..., :second_half_end]],
                     axis=-1)
    else:
      ir = tf.signal.fftshift(ir, axes=-1)
    return ir.numpy()

  for window_size in [0, 65, 33]:
    got = np.asarray(ops.frequency_impulse_response(magnitudes, window_size))
    want = tf_reference(magnitudes, window_size)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sinc_impulse_response_unity_gain():
  cutoff = 0.5 * np.ones((1, 1, 1), np.float32)
  ir = np.asarray(ops.sinc_impulse_response(cutoff, window_size=256))
  assert ir.shape == (1, 1, 257)
  np.testing.assert_allclose(np.abs(ir.sum(-1)), 1.0, rtol=1e-4)


def test_sinc_filter_lowpass_attenuates_high_freq():
  sample_rate = 16000
  t = np.arange(16000) / sample_rate
  low = np.sin(2 * np.pi * 200.0 * t)
  high = np.sin(2 * np.pi * 6000.0 * t)
  audio = (low + high)[np.newaxis, :].astype(np.float32)
  cutoff = 1000.0 * np.ones((1, 1, 1), np.float32)
  out = np.asarray(ops.sinc_filter(audio, cutoff, window_size=512,
                                   sample_rate=sample_rate))
  # Compare spectra: high frequency energy reduced by > 20 dB.
  spec_in = np.abs(np.fft.rfft(audio[0, 2000:-2000]))
  spec_out = np.abs(np.fft.rfft(out[0, 2000:-2000]))
  freqs = np.fft.rfftfreq(len(audio[0]) - 4000, 1 / sample_rate)
  hi_bin = np.argmin(np.abs(freqs - 6000))
  lo_bin = np.argmin(np.abs(freqs - 200))
  assert spec_out[hi_bin] < spec_in[hi_bin] * 0.1
  assert spec_out[lo_bin] > spec_in[lo_bin] * 0.5


def test_frequency_filter_ltv_shapes():
  audio = np.random.randn(2, 64000).astype(np.float32)
  magnitudes = np.abs(np.random.randn(2, 250, 65)).astype(np.float32)
  out = ops.frequency_filter(audio, magnitudes, window_size=257)
  assert out.shape == (2, 64000)


def test_valid_padding_pow2_conv_length_not_empty():
  """'valid' padding with frame+ir-1 exactly a power of two used to slice
  to an EMPTY array (the -0 footgun in crop_and_compensate_delay)."""
  import jax.numpy as jnp
  from ddsp_tpu.ops import fftconv
  audio = jnp.ones((1, 961))
  ir = jnp.ones((1, 64)) / 64.0
  out = fftconv.fft_convolve(audio, ir, padding='valid')
  assert out.shape == (1, 961 + 64 - 1), out.shape
  assert np.isfinite(np.asarray(out)).all()


def test_frame_step_one_uses_gather_path():
  """frame(x, L, 1) (variable_length_delay's shape) must not unroll into
  L slices; pin the structure (one gather, no L-operand concat), not just
  the values (which both paths produce identically)."""
  import jax
  import jax.numpy as jnp
  from ddsp_tpu.ops import fftconv
  x = jnp.arange(32, dtype=jnp.float32)[jnp.newaxis, :]
  frames = fftconv.frame(x, 8, 1, pad_end=False)
  assert frames.shape == (1, 25, 8)
  expect = np.stack([np.arange(i, i + 8) for i in range(25)])
  np.testing.assert_array_equal(np.asarray(frames[0]), expect)

  # Large k (the delay-line case: k = frame_length / 1 = 400 for ModDelay)
  # must take the single-gather path, not emit k slices + a k-way concat.
  x2 = jnp.arange(128, dtype=jnp.float32)[jnp.newaxis, :]
  jaxpr = jax.make_jaxpr(lambda a: fftconv.frame(a, 32, 1,
                                                 pad_end=False))(x2)
  prims = [str(eqn.primitive) for eqn in jaxpr.jaxpr.eqns]
  assert prims.count('slice') < 8, prims
  assert 'concatenate' not in prims, prims
