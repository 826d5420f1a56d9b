"""Tests for ddsp_tpu.ops.spectral: STFT/mel/MFCC/loudness goldens.

Mirrors reference spectral_ops_test.py: stft consistency, loudness
tf-vs-np parity, framing math; golden targets here are tf.signal (which
defines the semantics being matched) and scipy.
"""

import numpy as np
import pytest

from ddsp_tpu import ops
from ddsp_tpu.ops import spectral


def gen_np_sinusoid(frequency, amp, sample_rate, audio_len_sec):
  x = np.linspace(0, audio_len_sec, int(audio_len_sec * sample_rate))
  return amp * np.sin(2.0 * np.pi * frequency * x).astype(np.float32)


def test_stft_matches_tf_signal():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(0)
  audio = rng.randn(2, 16000).astype(np.float32)
  for frame_size, overlap, pad_end in [(2048, 0.75, True), (1024, 0.5, True),
                                       (512, 0.75, False), (256, 0.5, False)]:
    got = np.asarray(ops.stft(audio, frame_size=frame_size, overlap=overlap,
                              pad_end=pad_end))
    want = tf.signal.stft(audio, frame_length=frame_size,
                          frame_step=int(frame_size * (1 - overlap)),
                          fft_length=None, pad_end=pad_end).numpy()
    assert got.shape == want.shape
    # Compare the complex values (real+imag), not just magnitudes: the
    # contract includes phase (conjugation/window-sign bugs must fail).
    np.testing.assert_allclose(np.real(got), np.real(want), atol=2e-3)
    np.testing.assert_allclose(np.imag(got), np.imag(want), atol=2e-3)


def test_compute_mag_shape():
  audio = np.random.randn(3, 16000).astype(np.float32)
  mag = ops.compute_mag(audio, size=1024, overlap=0.75)
  # pad_end: n_frames = ceil(16000 / 256) = 63 (62.5 -> 63).
  assert mag.shape == (3, 63, 513)


def test_mel_matrix_matches_tf():
  tf = pytest.importorskip('tensorflow')
  got = spectral.linear_to_mel_matrix_np(64, 1025, 16000, 20.0, 8000.0)
  want = tf.signal.linear_to_mel_weight_matrix(
      64, 1025, 16000, 20.0, 8000.0).numpy()
  # float32 vs float64 evaluation of the triangle slopes -> ~1e-5 noise.
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_mfcc_matches_tf():
  tf = pytest.importorskip('tensorflow')
  rng = np.random.RandomState(0)
  audio = rng.randn(1, 16000).astype(np.float32)
  got = np.asarray(ops.compute_mfcc(audio, mel_bins=128, mfcc_bins=13))

  # tf reference computation.
  s = tf.signal.stft(audio, 1024, 256, pad_end=True)
  mag = tf.abs(s)
  mel_m = tf.signal.linear_to_mel_weight_matrix(128, 513, 16000, 20.0,
                                                8000.0)
  mel = tf.tensordot(mag, mel_m, 1)
  logmel = tf.math.log(tf.maximum(mel, 1e-5))
  want = tf.signal.mfccs_from_log_mel_spectrograms(logmel)[..., :13].numpy()
  np.testing.assert_allclose(got, want, atol=1e-2)


def test_loudness_sine_wave_level():
  """A full-scale 1 kHz sine has loudness near ref level; quiet is lower."""
  sr = 16000
  loud = gen_np_sinusoid(1000.0, 1.0, sr, 1.0)
  quiet = gen_np_sinusoid(1000.0, 0.01, sr, 1.0)
  l_loud = np.mean(np.asarray(ops.compute_loudness(loud, sample_rate=sr)))
  l_quiet = np.mean(np.asarray(ops.compute_loudness(quiet, sample_rate=sr)))
  # 40 dB amplitude difference -> ~40 dB loudness difference.
  np.testing.assert_allclose(l_loud - l_quiet, 40.0, atol=2.0)


def test_loudness_batch_matches_single():
  rng = np.random.RandomState(0)
  audio = rng.randn(3, 16000).astype(np.float32) * 0.1
  batch = np.asarray(ops.compute_loudness(audio))
  singles = np.stack([np.asarray(ops.compute_loudness(a)) for a in audio])
  np.testing.assert_allclose(batch, singles, atol=1e-4)
  # 250 frames/sec with center padding -> 251 frames for 1 sec.
  assert batch.shape == (3, 251)


def test_a_weighting_zero_at_1khz():
  w = spectral.a_weighting_np((1000.0,))
  np.testing.assert_allclose(w, 0.0, atol=0.2)
  # Low frequencies strongly attenuated; floor at -80 dB.
  w_low = spectral.a_weighting_np((0.0, 10.0))
  assert w_low[0] == -80.0
  assert w_low[1] < -60


@pytest.mark.parametrize('padding,expected_frames', [
    ('valid', (16000 - 512) // 256 + 1),
    ('same', int(np.ceil(16000 / 256))),
    ('center', (16000 + 512 - 512) // 256 + 1),
])
def test_get_framed_lengths(padding, expected_frames):
  n_frames, _ = spectral.get_framed_lengths(16000, 512, 256, padding)
  assert n_frames == expected_frames


def test_pad_modes():
  x = np.ones((2, 100), np.float32)
  same = spectral.pad(x, 16, 8, 'same')
  center = spectral.pad(x, 16, 8, 'center')
  valid = spectral.pad(x, 16, 8, 'valid')
  assert valid.shape == (2, 100)
  assert center.shape == (2, 116)
  _, padded_len = spectral.get_framed_lengths(100, 16, 8, 'same')
  assert same.shape == (2, padded_len)


def test_pad_hop_greater_than_frame_raises():
  with pytest.raises(ValueError):
    spectral.pad(np.ones((1, 100)), 8, 16, 'same')


def test_compute_rms_energy_constant_signal():
  audio = 0.5 * np.ones((1, 16000), np.float32)
  rms = np.asarray(ops.compute_rms_energy(audio))
  # Interior frames see a constant 0.5 signal.
  np.testing.assert_allclose(rms[0, 5:-5], 0.5, atol=1e-4)


def test_compute_power_db_scale():
  audio = 1.0 * np.ones((1, 16000), np.float32)
  power = np.asarray(ops.compute_power(audio))
  # Amplitude 1.0 -> RMS 1.0 -> 0 dB.
  np.testing.assert_allclose(power[0, 5:-5], 0.0, atol=0.1)


def test_pad_or_trim():
  v = np.arange(10, dtype=np.float32)
  assert ops.pad_or_trim_to_expected_length(v, 15).shape == (15,)
  assert ops.pad_or_trim_to_expected_length(v, 5).shape == (5,)
  with pytest.raises(ValueError):
    ops.pad_or_trim_to_expected_length(v, 100)


class TestWeightedPowerGemm:

  def test_quadratic_form_equals_weighted_fft_power(self):
    """The loudness GEMM path: f @ Q @ f == sum_k w_k |rfft(f)_k|^2."""
    import jax.numpy as jnp
    from ddsp_tpu.ops import fft_matmul
    rng = np.random.RandomState(0)
    frame_size, fft_size = 512, 512
    frames = rng.randn(3, 7, frame_size).astype(np.float32)
    w = rng.rand(fft_size // 2 + 1).astype(np.float64)

    got = np.asarray(fft_matmul.matmul_weighted_power(
        jnp.asarray(frames), fft_size, tuple(w.tolist())))
    spec = np.fft.rfft(frames, fft_size, axis=-1)
    want = (np.abs(spec)**2 * w).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-4)

  def test_compute_loudness_matches_reference_branch(self):
    """The TPU (GEMM) and generic (FFT) loudness branches agree in dB."""
    import jax.numpy as jnp
    from unittest import mock
    from ddsp_tpu.ops import spectral as spectral_mod
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(2, 8000).astype(np.float32) * 0.2)
    ld_fft = np.asarray(spectral_mod.compute_loudness(audio))
    with mock.patch('jax.default_backend', return_value='tpu'):
      ld_gemm = np.asarray(spectral_mod.compute_loudness(audio))
    np.testing.assert_allclose(ld_gemm, ld_fft, atol=2e-3)

  def test_compute_loudness_gemm_non_pow2_nfft(self):
    """The GEMM branch pads non-pow2 n_fft and stays close to the FFT
    branch (both average A-weighted power on the padded bin grid)."""
    import jax.numpy as jnp
    from ddsp_tpu.ops import spectral as spectral_mod
    rng = np.random.RandomState(3)
    audio = jnp.asarray(rng.randn(1, 8000).astype(np.float32) * 0.2)
    ld_fft = np.asarray(spectral_mod.compute_loudness(
        audio, n_fft=500, frame_rate=250, use_matmul=False))
    ld_gemm = np.asarray(spectral_mod.compute_loudness(
        audio, n_fft=500, frame_rate=250, use_matmul=True))
    assert ld_gemm.shape == ld_fft.shape
    np.testing.assert_allclose(ld_gemm, ld_fft, atol=2e-3)

  def test_stft_mag_bf16_close_to_f32(self):
    """bf16 DFT GEMMs stay within ~0.5% relative of the f32 magnitudes."""
    import jax.numpy as jnp
    from ddsp_tpu.ops import fft_matmul
    rng = np.random.RandomState(2)
    frames = jnp.asarray(rng.randn(2, 5, 256).astype(np.float32) * 0.3)
    m32 = np.asarray(fft_matmul.matmul_stft_mag(frames, 256))
    m16 = np.asarray(fft_matmul.matmul_stft_mag(
        frames, 256, compute_dtype='bfloat16'))
    assert np.abs(m16 - m32).max() / (np.abs(m32).max() + 1e-9) < 5e-3
