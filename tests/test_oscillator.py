"""Tests for ddsp_tpu.ops.oscillator.

Mirrors reference core_test.py:400-589: accuracy of synthesized waveforms vs
a float64 numpy synthesis, nyquist silence, shape contracts; plus new tests
for the factored fast path and streaming phase carry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import ops


def create_wave_np(batch_size, frequency_envelopes, amplitude_envelopes,
                   sample_rate):
  """Float64 numpy reference synthesis with exact cumsum phase."""
  freq = np.asarray(frequency_envelopes, np.float64)
  amp = np.asarray(amplitude_envelopes, np.float64)
  omega = freq * 2.0 * np.pi / sample_rate
  phase = np.cumsum(omega, axis=1)
  return np.sum(amp * np.sin(phase), axis=-1)


@pytest.mark.parametrize(
    'batch_size,f0,n_harmonics,sample_rate,seconds',
    [(2, 62.4, 5, 16000, 2), (8, 100, 1, 8000, 0.5), (1, 2000, 2, 4000, 1.3)])
def test_oscillator_bank_is_accurate(batch_size, f0, n_harmonics,
                                     sample_rate, seconds):
  n_samples = int(sample_rate * seconds)
  frequencies = f0 * np.arange(1, n_harmonics + 1)
  amplitudes = np.ones_like(frequencies) / n_harmonics

  ones = np.ones([batch_size, n_samples, n_harmonics])
  frequency_envelopes = ones * frequencies[np.newaxis, np.newaxis, :]
  amplitude_envelopes = ones * amplitudes[np.newaxis, np.newaxis, :]

  wav_np = create_wave_np(batch_size, frequency_envelopes,
                          amplitude_envelopes, sample_rate)
  wav = np.asarray(ops.oscillator_bank(
      frequency_envelopes, amplitude_envelopes, sample_rate=sample_rate))
  # float32 phase accumulation bounds accuracy; max phase here is ~1e4 rad.
  np.testing.assert_allclose(wav, wav_np, atol=2e-2)
  assert np.mean(np.abs(wav - wav_np)) < 2e-3


@pytest.mark.parametrize('sum_sinusoids', [True, False])
def test_oscillator_bank_shape(sum_sinusoids):
  envelopes = np.ones([2, 1000, 3], np.float32) * 400.0
  amps = np.ones([2, 1000, 3], np.float32)
  wav = ops.oscillator_bank(envelopes, amps, sum_sinusoids=sum_sinusoids)
  expected = (2, 1000) if sum_sinusoids else (2, 1000, 3)
  assert wav.shape == expected


@pytest.mark.parametrize('sample_rate', [4000, 16000, 44100])
def test_silent_above_nyquist(sample_rate):
  nyquist = sample_rate / 2
  frequencies = np.array([1.1, 1.5, 2.0]) * nyquist
  ones = np.ones([2, 1000, 3])
  frequency_envelopes = ones * frequencies[np.newaxis, np.newaxis, :]
  amplitude_envelopes = ones
  wav = np.asarray(ops.oscillator_bank(
      frequency_envelopes, amplitude_envelopes, sample_rate=sample_rate))
  np.testing.assert_allclose(wav, np.zeros_like(wav), atol=1e-7)


def test_angular_cumsum_matches_plain_cumsum_mod_2pi():
  rng = np.random.RandomState(0)
  omega = np.abs(rng.rand(2, 5000, 3)).astype(np.float32) * 0.3
  plain = np.cumsum(omega.astype(np.float64), axis=1) % (2 * np.pi)
  chunked = np.asarray(ops.angular_cumsum(jnp.asarray(omega),
                                          chunk_size=1000))
  # Compare on the circle (sin/cos) to avoid wrap-around at 0/2pi.
  np.testing.assert_allclose(np.sin(chunked), np.sin(plain), atol=1e-3)
  np.testing.assert_allclose(np.cos(chunked), np.cos(plain), atol=1e-3)
  assert np.all(np.asarray(chunked) >= 0.0)
  assert np.all(np.asarray(chunked) <= 2 * np.pi + 1e-5)


def test_angular_cumsum_non_divisible_length():
  omega = np.ones((1, 1234, 1), np.float32) * 0.1
  out = ops.angular_cumsum(jnp.asarray(omega), chunk_size=1000)
  assert out.shape == (1, 1234, 1)


def test_angular_cumsum_more_accurate_for_long_signals():
  """Chunked mod-2pi carry keeps error bounded where plain cumsum drifts."""
  sample_rate = 16000
  n = 400000  # 25 seconds
  f0 = 441.7
  omega = np.full((1, n, 1), f0 * 2 * np.pi / sample_rate, np.float32)
  exact = (np.cumsum(omega.astype(np.float64), axis=1)) % (2 * np.pi)
  chunked = np.asarray(ops.angular_cumsum(jnp.asarray(omega)))
  plain = np.asarray(jnp.cumsum(jnp.asarray(omega), axis=1))
  err_chunked = np.abs(np.sin(chunked) - np.sin(exact)).max()
  err_plain = np.abs(np.sin(plain) - np.sin(exact)).max()
  assert err_chunked < err_plain
  assert err_chunked < 0.1


def test_normalize_harmonics_sums_to_one_below_nyquist():
  hd = np.abs(np.random.RandomState(0).rand(2, 10, 8)).astype(np.float32)
  f0 = 400.0 * np.ones((2, 10, 1), np.float32)
  out = np.asarray(ops.normalize_harmonics(hd, f0, sample_rate=16000))
  np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_normalize_harmonics_removes_above_nyquist():
  hd = np.ones((1, 4, 10), np.float32)
  f0 = 3000.0 * np.ones((1, 4, 1), np.float32)  # harmonics 3+ above 8k
  out = np.asarray(ops.normalize_harmonics(hd, f0, sample_rate=16000))
  assert np.all(out[..., 3:] == 0.0)
  np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize('batch_size,f0,amplitude,n_frames',
                         [(2, 20, 0.1, 100), (1, 100, 0.2, 1000),
                          (4, 2000, 0.5, 100)])
def test_harmonic_synthesis_is_accurate_one_frequency(batch_size, f0,
                                                      amplitude, n_frames):
  sample_rate = 16000
  n_samples = 16000
  frequencies = f0 * np.ones([batch_size, n_frames, 1])
  amplitudes = amplitude * np.ones([batch_size, n_frames, 1])

  frequencies_np = f0 * np.ones([batch_size, n_samples, 1])
  amplitudes_np = amplitude * np.ones([batch_size, n_samples, 1])
  wav_np = create_wave_np(batch_size, frequencies_np, amplitudes_np,
                          sample_rate)

  wav = np.asarray(ops.harmonic_synthesis(
      frequencies, amplitudes, n_samples=n_samples, sample_rate=sample_rate))
  pad = n_samples // n_frames  # Ignore edge effects of the window resample.
  np.testing.assert_allclose(wav[:, pad:-pad], wav_np[:, pad:-pad],
                             atol=2e-2)
  assert np.mean(np.abs(wav[:, pad:-pad] - wav_np[:, pad:-pad])) < 2e-3


@pytest.mark.parametrize('n_harmonics', [1, 20, 40])
def test_harmonic_synthesis_factored_matches_unfactored(n_harmonics):
  """TPU fast path (phase * ratios) vs reference path (per-harmonic cumsum)."""
  rng = np.random.RandomState(0)
  batch, n_frames, n_samples = 2, 100, 16000
  f0 = 200.0 + 50.0 * rng.rand(batch, n_frames, 1).astype(np.float32)
  amps = 0.5 * rng.rand(batch, n_frames, 1).astype(np.float32)
  hd = rng.rand(batch, n_frames, n_harmonics).astype(np.float32)
  hd /= hd.sum(-1, keepdims=True)

  fast = np.asarray(ops.harmonic_synthesis(
      f0, amps, harmonic_distribution=hd, n_samples=n_samples,
      factored_phase=True))
  ref = np.asarray(ops.harmonic_synthesis(
      f0, amps, harmonic_distribution=hd, n_samples=n_samples,
      factored_phase=False))
  assert np.mean(np.abs(fast - ref)) < 2e-3


def test_harmonic_synthesis_with_shifts_accurate():
  """harmonic_shifts path (general oscillator bank)."""
  rng = np.random.RandomState(0)
  batch, n_frames, n_samples, n_harmonics = 2, 100, 16000, 8
  sample_rate = 16000
  f0 = 440.0
  harmonic_shifts = np.abs(rng.randn(1, 1, n_harmonics))
  harmonic_distribution = np.abs(rng.randn(1, 1, n_harmonics))

  frequencies = f0 * np.ones([batch, n_frames, 1])
  amplitudes = 0.1 * np.ones([batch, n_frames, 1])
  shifts = np.tile(harmonic_shifts, [batch, n_frames, 1])
  dist = np.tile(harmonic_distribution, [batch, n_frames, 1])

  # np reference: frequency of harmonic h = f0 * h * (1 + shift).
  ratios = np.arange(1, n_harmonics + 1)[np.newaxis, np.newaxis, :]
  freqs_np = f0 * ratios * (1.0 + harmonic_shifts) * np.ones(
      [batch, n_samples, n_harmonics])
  amps_np = 0.1 * harmonic_distribution * np.ones(
      [batch, n_samples, n_harmonics])
  amps_np = np.where(freqs_np >= sample_rate / 2, 0.0, amps_np)
  wav_np = create_wave_np(batch, freqs_np, amps_np, sample_rate)

  wav = np.asarray(ops.harmonic_synthesis(
      frequencies, amplitudes, harmonic_shifts=shifts,
      harmonic_distribution=dist, n_samples=n_samples,
      sample_rate=sample_rate))
  pad = n_samples // n_frames
  assert np.mean(np.abs(wav[:, pad:-pad] - wav_np[:, pad:-pad])) < 5e-3


def test_streaming_phase_carry_is_exact():
  """Chunked harmonic_oscillator_bank with phase carry == one-shot run."""
  rng = np.random.RandomState(0)
  batch, n_samples, n_harmonics = 2, 8000, 6
  sample_rate = 16000
  f0 = (300.0 + 100.0 * rng.rand(batch, n_samples, 1)).astype(np.float32)
  amps = rng.rand(batch, n_samples, n_harmonics).astype(np.float32)

  full, full_phase = ops.harmonic_oscillator_bank(
      f0, amps, sample_rate=sample_rate)
  full = np.asarray(full)

  chunk = 2000
  phase = None
  outs = []
  for i in range(0, n_samples, chunk):
    audio, phase = ops.harmonic_oscillator_bank(
        f0[:, i:i + chunk], amps[:, i:i + chunk], initial_phase=phase,
        sample_rate=sample_rate)
    outs.append(np.asarray(audio))
  streamed = np.concatenate(outs, axis=1)

  np.testing.assert_allclose(streamed, full, atol=2e-3)
  # Final phases agree on the circle (carry chaining is not reduced mod 2pi).
  np.testing.assert_allclose(np.sin(np.asarray(phase)),
                             np.sin(np.asarray(full_phase)), atol=2e-3)
  np.testing.assert_allclose(np.cos(np.asarray(phase)),
                             np.cos(np.asarray(full_phase)), atol=2e-3)


def test_get_harmonic_frequencies():
  f0 = 100.0 * np.ones((1, 4, 1), np.float32)
  freqs = np.asarray(ops.get_harmonic_frequencies(f0, 5))
  np.testing.assert_allclose(freqs[0, 0], [100, 200, 300, 400, 500],
                             rtol=1e-5)
