"""Wavetable synthesis and variable-length delay lines.

Reference behavior: /root/reference/ddsp/core.py:1167-1313 (`linear_lookup`,
`harmonic_distribution_to_wavetable`, `wavetable_synthesis`,
`variable_length_delay`).

TPU-first note: the reference's `linear_lookup` computes a dense [batch,
time, n_wavetable] distance matrix (relu(1 - |dphase| * n) weighting) — an
O(T * W) elementwise job that XLA fuses well and that avoids gathers with
dynamic indices. We keep that formulation: on TPU the dense broadcast beats a
2-point gather for typical wavetable sizes, and it is exactly differentiable
w.r.t. phase.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ddsp_tpu.ops.core import jnp_float32
from ddsp_tpu.ops.fftconv import frame as frame_signal
from ddsp_tpu.ops.resample import resample

Array = jax.Array


def linear_lookup(phase: Array, wavetables: Array,
                  wrap: bool = True) -> Array:
  """Lookup from wavetables with linear interpolation.

  Args:
    phase: Instantaneous phase of the base oscillator, in [0, 1], giving the
      lookup position. Shape [batch_size, n_samples, 1].
    wavetables: Wavetables to read from. Shape [batch_size, n_samples,
      n_wavetable] or [batch_size, n_wavetable].
    wrap: Periodic-table semantics: phase near 1.0 interpolates back toward
      entry 0 (correct for oscillator wavetables). False clamps at the last
      entry instead - required for non-periodic tables like delay lines,
      where wrapping would blend the longest delay with the dry sample.

  Returns:
    Audio from linearly interpolated lookup, shape [batch_size, n_samples].
  """
  phase, wavetables = jnp_float32(phase), jnp_float32(wavetables)

  if wavetables.ndim == 2:
    wavetables = wavetables[:, jnp.newaxis, :]
  if phase.ndim == 2:
    phase = phase[:, :, jnp.newaxis]

  # Extend by one entry so the phase grid has n_wavetable+1 points: the
  # first sample again (smooth wraparound) or a clamp duplicate.
  edge = wavetables[..., 0:1] if wrap else wavetables[..., -1:]
  wavetables = jnp.concatenate([wavetables, edge], axis=-1)
  n_wavetable = int(wavetables.shape[-1])

  # Phase position of each wavetable point.
  phase_wavetables = jnp.linspace(0.0, 1.0, n_wavetable)

  # Pairwise distances oscillator phase -> wavetable points,
  # in units of wavetable samples. [batch, time, n_wavetable].
  phase_distance = jnp.abs(
      phase - phase_wavetables[jnp.newaxis, jnp.newaxis, :])
  phase_distance *= n_wavetable - 1

  # Weights are nonzero only for the two nearest neighbors; their relu(1-d)
  # weighting is exactly linear interpolation.
  weights = jax.nn.relu(1.0 - phase_distance)
  return jnp.sum(weights * wavetables, axis=-1)


def harmonic_distribution_to_wavetable(harmonic_distribution: Array,
                                       n_wavetable: int = 2048) -> Array:
  """Convert a harmonic distribution into a wavetable for synthesis.

  Args:
    harmonic_distribution: Shape [batch, time, n_harmonics], last axis
      normalized (sums to 1.0).
    n_wavetable: Number of samples in the wavetable.

  Returns:
    A series of wavetables, shape [batch, time, n_wavetable].
  """
  harmonic_distribution = jnp_float32(harmonic_distribution)
  n_harmonics = harmonic_distribution.shape[-1]
  n_pad = int(n_wavetable / 2 - n_harmonics)
  # Pad left for the DC component, right for wavetable interpolation.
  fft_in = jnp.pad(harmonic_distribution, ((0, 0), (0, 0), (1, n_pad)))
  wavetable = jnp.fft.irfft(fft_in.astype(jnp.complex64)) * (n_wavetable / 2)
  return wavetable.astype(jnp.float32)


def wavetable_synthesis(frequencies: Array,
                        amplitudes: Array,
                        wavetables: Array,
                        n_samples: int = 64000,
                        sample_rate: int = 16000) -> Array:
  """Monophonic wavetable synthesizer.

  Args:
    frequencies: Frame-wise fundamental frequency in Hz.
      Shape [batch_size, n_frames, 1].
    amplitudes: Frame-wise amplitude envelope.
      Shape [batch_size, n_frames, 1].
    wavetables: Frame-wise wavetables to look up from.
      Shape [batch_size, n_wavetable] or [batch_size, n_frames, n_wavetable].
    n_samples: Total length of output audio.
    sample_rate: Samples per second.

  Returns:
    audio: Shape [batch_size, n_samples].
  """
  wavetables = jnp_float32(wavetables)

  amplitude_envelope = resample(amplitudes, n_samples,
                                method='window')[:, :, 0]
  frequency_envelope = resample(frequencies, n_samples)  # cycles / sec

  if wavetables.ndim == 3 and wavetables.shape[1] > 1:
    wavetables = resample(wavetables, n_samples)

  # Accumulate phase in cycles (0.0 to 1.0), exclusive cumsum.
  phase_velocity = frequency_envelope / float(sample_rate)
  phase_velocity_shifted = jnp.concatenate(
      [jnp.zeros_like(phase_velocity[:, :1]), phase_velocity[:, :-1]], axis=1)
  phase = jnp.cumsum(phase_velocity_shifted, axis=1) % 1.0

  audio = linear_lookup(phase, wavetables)
  return audio * amplitude_envelope


def variable_length_delay(phase: Array,
                          audio: Array,
                          max_length: int = 512) -> Array:
  """Delay audio by a time-varying amount using linear interpolation.

  Useful for modulation effects such as vibrato, chorus, and flanging.

  Args:
    phase: Normalized instantaneous delay length in [0, 1], corresponding to
      a delay of 0 to max_length samples. Shape [batch_size, n_samples, 1].
    audio: Audio signal to be delayed. Shape [batch_size, n_samples].
    max_length: Maximum delay in samples.

  Returns:
    The delayed audio signal, shape [batch_size, n_samples].
  """
  phase, audio = jnp_float32(phase), jnp_float32(audio)

  # Make causal by zero-padding audio up front.
  audio = jnp.pad(audio, ((0, 0), (max_length - 1, 0)))
  # Cut audio into max_length frames with hop 1 (one frame per out sample).
  frames = frame_signal(audio, max_length, 1, pad_end=False)
  # Reverse frames so [0, 1] phase corresponds to [0, max_length] delay.
  frames = frames[..., ::-1]
  # Read audio from the past frames. wrap=False: saturated phase clamps at
  # the maximum delay instead of wrapping around to the dry signal
  # (the reference inherits linear_lookup's periodic wraparound here,
  # which glitches at max modulation depth; reference core.py:1288-1313).
  return linear_lookup(phase, frames, wrap=False)
