"""Sinusoidal / harmonic oscillator banks with phase accumulation.

Reference behavior: /root/reference/ddsp/core.py:797-1164 (`angular_cumsum`,
`remove_above_nyquist`, `normalize_harmonics`, `oscillator_bank`,
`harmonic_oscillator_bank`, `get_harmonic_frequencies`, `harmonic_synthesis`,
`streaming_harmonic_synthesis`).

TPU-first design notes:
  * `harmonic_synthesis` defaults to a factored phase path: the fundamental
    phase is accumulated once ([batch, time, 1] cumsum) and multiplied by the
    integer harmonic ratios, instead of accumulating an independent cumsum per
    harmonic ([batch, time, n_harmonics]). Because the frame->audio resampling
    of frequencies is linear (and h * f0 envelopes are exact scalar multiples
    of the f0 envelope), the two formulations agree to float32 rounding while
    doing O(T) instead of O(T*H) serial-scan work and touching H times less
    HBM. Set `factored_phase=False` to reproduce the reference op-for-op.
  * `angular_cumsum` keeps phase bounded with a chunked mod-2pi carry, the
    same decomposition used to shard the time axis across devices (each shard
    computes a local cumsum; carries are exchanged with a tiny collective
    scan). See ddsp_tpu/parallel for the sharded version.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.core import jnp_float32, pad_axis, safe_divide
from ddsp_tpu.ops.resample import resample

Array = jax.Array


def angular_cumsum(angular_frequency: Array, chunk_size: int = 1000) -> Array:
  """Accumulate phase with a chunked, wrap-around-carrying cumsum.

  A single float32 cumsum over a long signal accumulates rounding error that
  becomes audible pitch drift. Splitting the time axis into fixed chunks,
  summing within each chunk, and threading a mod-2*pi carry between chunks
  keeps every partial sum small. Because only phase mod 2*pi matters to a
  sinusoid, wrapping the carries changes nothing mathematically - it just
  keeps the floats in a well-conditioned range. (This same chunk/carry
  decomposition is what ddsp_tpu.parallel.time_shard lifts onto the device
  mesh.)

  Args:
    angular_frequency: Radians per sample, [batch, time, ...].
    chunk_size: Samples per chunk.

  Returns:
    Wrapped accumulated phase in [0, 2*pi], same shape as the input.
  """
  n_batch = angular_frequency.shape[0]
  n_time = angular_frequency.shape[1]
  n_dims = angular_frequency.ndim
  n_ch_dims = n_dims - 2

  remainder = n_time % chunk_size
  if remainder:
    pad_amount = chunk_size - remainder
    angular_frequency = pad_axis(angular_frequency, (0, pad_amount), axis=1)

  length = angular_frequency.shape[1]
  n_chunks = int(length / chunk_size)
  chunks = jnp.reshape(
      angular_frequency,
      (n_batch, n_chunks, chunk_size) + angular_frequency.shape[2:])
  phase = jnp.cumsum(chunks, axis=2)

  # Each chunk starts where the previous one ended: take every chunk's
  # final phase (wrapped), shift right by one chunk, and prefix-sum those
  # carries so chunk k receives the wrapped total of chunks 0..k-1.
  offsets = phase[:, :, -1:, ...] % (2.0 * np.pi)
  offsets = pad_axis(offsets, (1, 0), axis=1)
  offsets = offsets[:, :-1, ...]
  offsets = jnp.cumsum(offsets, axis=1) % (2.0 * np.pi)
  phase = phase + offsets

  phase = phase % (2.0 * np.pi)
  phase = jnp.reshape(phase, (n_batch, length) + angular_frequency.shape[2:])

  if remainder:
    phase = phase[:, :n_time]
  return phase


def remove_above_nyquist(frequency_envelopes: Array,
                         amplitude_envelopes: Array,
                         sample_rate: int = 16000) -> Array:
  """Zero out any oscillator whose frequency exceeds the nyquist limit.

  Frequencies at or above sample_rate / 2 would alias; silencing them (as
  the reference does, core.py:869) rather than clipping keeps the op
  differentiable w.r.t. the amplitudes.

  Args:
    frequency_envelopes: Per-sample oscillator frequencies in Hz,
      [batch, n_samples, n_sinusoids].
    amplitude_envelopes: Per-sample amplitudes, same shape.
    sample_rate: Audio sample rate in Hz.

  Returns:
    Amplitudes with the aliasing oscillators muted, same shape.
  """
  frequency_envelopes = jnp_float32(frequency_envelopes)
  amplitude_envelopes = jnp_float32(amplitude_envelopes)
  return jnp.where(frequency_envelopes >= sample_rate / 2.0,
                   jnp.zeros_like(amplitude_envelopes), amplitude_envelopes)


def normalize_harmonics(harmonic_distribution: Array,
                        f0_hz: Optional[Array] = None,
                        sample_rate: Optional[int] = None) -> Array:
  """Normalize the harmonic distribution, optionally removing above nyquist."""
  if sample_rate is not None and f0_hz is not None:
    n_harmonics = int(harmonic_distribution.shape[-1])
    harmonic_frequencies = get_harmonic_frequencies(f0_hz, n_harmonics)
    harmonic_distribution = remove_above_nyquist(
        harmonic_frequencies, harmonic_distribution, sample_rate)

  harmonic_distribution = safe_divide(
      harmonic_distribution,
      jnp.sum(harmonic_distribution, axis=-1, keepdims=True))
  return harmonic_distribution


def oscillator_bank(frequency_envelopes: Array,
                    amplitude_envelopes: Array,
                    sample_rate: int = 16000,
                    sum_sinusoids: bool = True,
                    use_angular_cumsum: bool = False) -> Array:
  """Additive synthesis: integrate frequencies to phase, sum sinusoids.

  The core additive-synth primitive (reference core.py:912): each of the
  n_sinusoids channels carries its own instantaneous frequency and
  amplitude per sample; audio is amp * sin(cumsum(2*pi*f/sr)), optionally
  summed over the sinusoid axis.

  Args:
    frequency_envelopes: Per-sample frequencies in Hz,
      [batch, n_samples, n_sinusoids].
    amplitude_envelopes: Per-sample amplitudes, same shape.
    sample_rate: Audio sample rate in Hz.
    sum_sinusoids: Reduce over the sinusoid axis before returning.
    use_angular_cumsum: Accumulate phase with the chunk/carry scheme
      (bounded float32 error; worth it past ~100k samples, unnecessary at
      training lengths).

  Returns:
    Audio, [batch, n_samples] when summed, else
    [batch, n_samples, n_sinusoids].
  """
  frequency_envelopes = jnp_float32(frequency_envelopes)
  amplitude_envelopes = jnp_float32(amplitude_envelopes)

  # Don't exceed nyquist.
  amplitude_envelopes = remove_above_nyquist(frequency_envelopes,
                                             amplitude_envelopes,
                                             sample_rate)

  # Angular frequency, Hz -> radians per sample.
  omegas = frequency_envelopes * (2.0 * np.pi) / float(sample_rate)

  if use_angular_cumsum:
    phases = angular_cumsum(omegas)
  else:
    phases = jnp.cumsum(omegas, axis=1)

  wavs = jnp.sin(phases)
  audio = amplitude_envelopes * wavs  # [batch, n_samples, n_sinusoids]
  if sum_sinusoids:
    audio = jnp.sum(audio, axis=-1)  # [batch, n_samples]
  return audio


def harmonic_oscillator_bank(
    frequency: Array,
    amplitude_envelopes: Array,
    initial_phase: Optional[Array] = None,
    sample_rate: int = 16000,
    use_angular_cumsum: bool = True) -> Tuple[Array, Array]:
  """Streaming oscillator bank for harmonic frequencies.

  Accumulates the fundamental phase once and multiplies by integer harmonic
  ratios; takes/returns phase for frame-by-frame streaming synthesis.

  Args:
    frequency: Sample-wise fundamental frequencies (Hz).
      Shape [batch_size, n_samples, 1].
    amplitude_envelopes: Sample-wise oscillator amplitudes.
      Shape [batch_size, n_samples, n_sinusoids].
    initial_phase: Starting phase. Shape [batch_size, 1, 1].
    sample_rate: Sample rate in samples per second.
    use_angular_cumsum: Use chunked angular cumsum for bounded phase error.

  Returns:
    (audio, final_phase): audio shape [batch_size, n_samples], final_phase
      shape [batch_size, 1, 1].
  """
  frequency = jnp_float32(frequency)
  amplitude_envelopes = jnp_float32(amplitude_envelopes)

  # Angular frequency, Hz -> radians per sample.
  omega = frequency * (2.0 * np.pi) / float(sample_rate)

  if use_angular_cumsum:
    phases = angular_cumsum(omega)
  else:
    phases = jnp.cumsum(omega, axis=1)

  if initial_phase is None:
    initial_phase = jnp.zeros((phases.shape[0], 1, 1), dtype=jnp.float32)

  phases = phases + initial_phase
  final_phase = phases[:, -1:, 0:1]

  n_harmonics = int(amplitude_envelopes.shape[-1])
  f_ratios = jnp.linspace(1.0, float(n_harmonics), int(n_harmonics))
  f_ratios = f_ratios[jnp.newaxis, jnp.newaxis, :]
  phases = phases * f_ratios

  wavs = jnp.sin(phases)
  audio = amplitude_envelopes * wavs  # [batch, n_samples, n_sinusoids]
  audio = jnp.sum(audio, axis=-1)  # [batch, n_samples]
  return audio, final_phase


def get_harmonic_frequencies(frequencies: Array, n_harmonics: int) -> Array:
  """Expand an f0 track into its first n integer harmonics (f, 2f, .., nf).

  Args:
    frequencies: Fundamental frequency in Hz, [batch, time, 1].
    n_harmonics: How many multiples to produce.

  Returns:
    [batch, time, n_harmonics] harmonic frequencies.
  """
  frequencies = jnp_float32(frequencies)
  f_ratios = jnp.linspace(1.0, float(n_harmonics), int(n_harmonics))
  f_ratios = f_ratios[jnp.newaxis, jnp.newaxis, :]
  return frequencies * f_ratios


def harmonic_synthesis(frequencies: Array,
                       amplitudes: Array,
                       harmonic_shifts: Optional[Array] = None,
                       harmonic_distribution: Optional[Array] = None,
                       n_samples: int = 64000,
                       sample_rate: int = 16000,
                       amp_resample_method: str = 'window',
                       use_angular_cumsum: bool = False,
                       factored_phase: bool = True,
                       use_pallas: Optional[bool] = None) -> Array:
  """Render audio from frame-rate harmonic controls (the training synth).

  Takes an f0 track plus per-frame amplitude/harmonic-distribution
  controls, upsamples them to audio rate, and runs the oscillator bank over
  the harmonic stack (reference core.py:1048 semantics).

  Args:
    frequencies: Frame-rate fundamental in Hz, [batch, n_frames, 1].
    amplitudes: Frame-rate overall amplitude, [batch, n_frames, 1].
    harmonic_shifts: Optional per-harmonic detuning, zero-centered; harmonic
      h sounds at f0 * h * (1 + shift_h). [batch, n_frames, n_harmonics].
    harmonic_distribution: Optional per-harmonic amplitude weights in
      [0, 1]; harmonic h's amplitude is amplitudes * weight_h.
      [batch, n_frames, n_harmonics].
    n_samples: Output audio length.
    sample_rate: Audio sample rate in Hz.
    amp_resample_method: Interpolation used to upsample the amplitude
      controls ('window', 'linear', 'cubic', 'nearest').
    use_angular_cumsum: Accumulate phase with the chunk/carry scheme (for
      long-form inference accuracy).
    factored_phase: When harmonic_shifts is None, accumulate only the
      fundamental phase and multiply by harmonic ratios (TPU fast path, O(T)
      scan instead of O(T*H)). Equal to the unfactored path within float32
      rounding.
    use_pallas: Use the fused Pallas TPU kernel (interp + nyquist mask +
      sin + harmonic reduce in one VMEM pass, custom VJP). None = auto:
      enabled on TPU when shapes conform (see
      pallas_kernels.harmonic_kernel_supported).

  Returns:
    audio: [batch, n_samples].
  """
  frequencies = jnp_float32(frequencies)
  amplitudes = jnp_float32(amplitudes)

  if harmonic_distribution is not None:
    harmonic_distribution = jnp_float32(harmonic_distribution)
    n_harmonics = int(harmonic_distribution.shape[-1])
  elif harmonic_shifts is not None:
    harmonic_shifts = jnp_float32(harmonic_shifts)
    n_harmonics = int(harmonic_shifts.shape[-1])
  else:
    n_harmonics = 1

  # Create harmonic amplitudes [batch_size, n_frames, n_harmonics].
  if harmonic_distribution is not None:
    harmonic_amplitudes = amplitudes * harmonic_distribution
  else:
    harmonic_amplitudes = amplitudes

  if harmonic_shifts is None and factored_phase:
    # TPU fast path: one phase accumulation for the fundamental; harmonics
    # are integer multiples of it. Since frequency resampling is linear,
    # resample(h * f0) == h * resample(f0) exactly, so this matches the
    # unfactored formulation up to float32 rounding of the scan.
    f0_envelope = resample(frequencies, n_samples)  # [batch, n_samples, 1]
    omega = f0_envelope * (2.0 * np.pi) / float(sample_rate)
    if use_angular_cumsum:
      phase0 = angular_cumsum(omega)
    else:
      phase0 = jnp.cumsum(omega, axis=1)

    n_frames = int(harmonic_amplitudes.shape[1])
    if use_pallas is None:
      from ddsp_tpu.ops import pallas_kernels  # pylint: disable=g-import-not-at-top
      use_pallas = (jax.default_backend() == 'tpu' and
                    amp_resample_method in ('window', 'linear') and
                    pallas_kernels.harmonic_kernel_supported(
                        n_samples, n_frames, n_harmonics))
    if use_pallas:
      # Fused VMEM pass: 2-tap amp upsampling + nyquist mask + sin +
      # harmonic reduction, never materializing [batch, n_samples,
      # n_harmonics] in HBM. Custom VJP mirrors it for the backward.
      from ddsp_tpu.ops import pallas_kernels  # pylint: disable=g-import-not-at-top
      return pallas_kernels.fused_harmonic_synthesis(
          phase0[..., 0], f0_envelope[..., 0], harmonic_amplitudes,
          sample_rate=sample_rate,
          amp_resample_method=amp_resample_method)

    amplitude_envelopes = resample(harmonic_amplitudes, n_samples,
                                   method=amp_resample_method)
    f_ratios = jnp.linspace(1.0, float(n_harmonics), int(n_harmonics))
    f_ratios = f_ratios[jnp.newaxis, jnp.newaxis, :]
    # Nyquist mask in terms of the fundamental envelope.
    amplitude_envelopes = remove_above_nyquist(
        f0_envelope * f_ratios, amplitude_envelopes, sample_rate)
    wavs = jnp.sin(phase0 * f_ratios)
    return jnp.sum(amplitude_envelopes * wavs, axis=-1)

  amplitude_envelopes = resample(harmonic_amplitudes, n_samples,
                                 method=amp_resample_method)

  # General (reference-shaped) path: per-sinusoid phase accumulation.
  harmonic_frequencies = get_harmonic_frequencies(frequencies, n_harmonics)
  if harmonic_shifts is not None:
    harmonic_frequencies *= (1.0 + harmonic_shifts)
  frequency_envelopes = resample(harmonic_frequencies, n_samples)
  return oscillator_bank(frequency_envelopes,
                         amplitude_envelopes,
                         sample_rate=sample_rate,
                         use_angular_cumsum=use_angular_cumsum)


def streaming_harmonic_synthesis(
    frequencies: Array,
    amplitudes: Array,
    harmonic_distribution: Optional[Array] = None,
    initial_phase: Optional[Array] = None,
    n_samples: int = 64000,
    sample_rate: int = 16000,
    amp_resample_method: str = 'linear') -> Tuple[Array, Array]:
  """Generate audio from frames with explicit phase carry for streaming.

  Args:
    frequencies: Frame-wise fundamental frequency in Hz.
      Shape [batch_size, n_frames, 1].
    amplitudes: Frame-wise oscillator peak amplitude.
      Shape [batch_size, n_frames, 1].
    harmonic_distribution: Harmonic amplitude variations.
      Shape [batch_size, n_frames, n_harmonics].
    initial_phase: Starting phase. Shape [batch_size, 1, 1].
    n_samples: Total length of output audio.
    sample_rate: Sample rate.
    amp_resample_method: Mode to resample amplitude envelopes with.

  Returns:
    (audio, final_phase): audio shape [batch_size, n_samples].
  """
  frequencies = jnp_float32(frequencies)
  amplitudes = jnp_float32(amplitudes)

  if harmonic_distribution is not None:
    harmonic_distribution = jnp_float32(harmonic_distribution)
    harmonic_distribution = normalize_harmonics(
        harmonic_distribution, frequencies, sample_rate)
    harmonic_amplitudes = amplitudes * harmonic_distribution
  else:
    harmonic_amplitudes = amplitudes

  frequencies = resample(frequencies, n_samples)
  amplitude_envelopes = resample(harmonic_amplitudes, n_samples,
                                 method=amp_resample_method)

  audio, final_phase = harmonic_oscillator_bank(
      frequencies,
      amplitude_envelopes,
      initial_phase,
      sample_rate=sample_rate)
  return audio, final_phase
