"""Synthesizer processors: Harmonic, FilteredNoise, Wavetable, Sinusoidal.

Reference behavior: /root/reference/ddsp/synths.py (TensorToAudio:24,
Harmonic:56, FilteredNoise:150, Wavetable:200, Sinusoidal:261).

Randomness (FilteredNoise) uses flax's rng plumbing: pass
`rngs={'noise': key}` to `.apply()`; falls back to a fixed key when the
'noise' stream is not provided (deterministic eval).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops import oscillator as osc
from ddsp_tpu.ops import wavetable as wavetable_ops
from ddsp_tpu.ops.fftconv import frequency_filter
from ddsp_tpu.ops.resample import resample
from ddsp_tpu.proc.processors import Processor

Array = jax.Array
TensorDict = Dict[str, Any]


class TensorToAudio(Processor):
  """Identity "synth" returning input samples with channel dim removed."""

  def get_controls(self, samples: Array) -> TensorDict:
    """samples: [batch, time, 1] network "controls" (really samples)."""
    return {'samples': samples}

  def get_signal(self, samples: Array) -> Array:
    """Remove channel dimension: [batch, time, 1] -> [batch, time]."""
    return jnp.squeeze(samples, 2)


class Harmonic(Processor):
  """Synthesize audio with a bank of harmonic sinusoidal oscillators.

  Attributes:
    n_samples: Fixed length of output audio.
    sample_rate: Samples per second.
    scale_fn: Scale function for amplitude and harmonic distribution inputs.
    normalize_below_nyquist: Remove harmonics above nyquist and normalize the
      remaining harmonic distribution to sum to 1.0.
    amp_resample_method: One of ['nearest', 'linear', 'cubic', 'window'].
    use_angular_cumsum: Chunked angular cumsum for bounded phase error on
      long generations (slower; not needed for training lengths).
  """

  n_samples: int = 64000
  sample_rate: int = 16000
  scale_fn: Optional[Callable[[Array], Array]] = ops_core.exp_sigmoid
  normalize_below_nyquist: bool = True
  amp_resample_method: str = 'window'
  use_angular_cumsum: bool = False

  def get_controls(self, amplitudes: Array, harmonic_distribution: Array,
                   f0_hz: Array) -> TensorDict:
    """Convert network outputs into a dict of synthesizer controls.

    Args:
      amplitudes: [batch, time, 1].
      harmonic_distribution: [batch, time, n_harmonics].
      f0_hz: Fundamental frequencies in hertz, [batch, time, 1].
    """
    if self.scale_fn is not None:
      amplitudes = self.scale_fn(amplitudes)
      harmonic_distribution = self.scale_fn(harmonic_distribution)

    harmonic_distribution = osc.normalize_harmonics(
        harmonic_distribution, f0_hz,
        self.sample_rate if self.normalize_below_nyquist else None)

    return {'amplitudes': amplitudes,
            'harmonic_distribution': harmonic_distribution,
            'f0_hz': f0_hz}

  def get_signal(self, amplitudes: Array, harmonic_distribution: Array,
                 f0_hz: Array) -> Array:
    """Synthesize audio; returns [batch, n_samples]."""
    return osc.harmonic_synthesis(
        frequencies=f0_hz,
        amplitudes=amplitudes,
        harmonic_distribution=harmonic_distribution,
        n_samples=self.n_samples,
        sample_rate=self.sample_rate,
        amp_resample_method=self.amp_resample_method,
        use_angular_cumsum=self.use_angular_cumsum)


class FilteredNoise(Processor):
  """Synthesize audio by filtering white noise.

  Attributes:
    n_samples: Length of output audio.
    window_size: Window size for the frequency-sampled FIR filter.
    scale_fn: Scale function for the magnitudes.
    initial_bias: Shift network outputs by this before scale_fn so training
      starts with quiet noise.
  """

  n_samples: int = 64000
  window_size: int = 257
  scale_fn: Optional[Callable[[Array], Array]] = ops_core.exp_sigmoid
  initial_bias: float = -5.0

  def get_controls(self, magnitudes: Array) -> TensorDict:
    """magnitudes: [batch, time, n_filter_banks] network outputs."""
    if self.scale_fn is not None:
      magnitudes = self.scale_fn(magnitudes + self.initial_bias)
    return {'magnitudes': magnitudes}

  def get_signal(self, magnitudes: Array) -> Array:
    """Filter white noise through the time-varying FIR; [batch, n_samples]."""
    batch_size = int(magnitudes.shape[0])
    if self.has_rng('noise'):
      key = self.make_rng('noise')
    else:
      key = jax.random.PRNGKey(0)
    signal = jax.random.uniform(
        key, (batch_size, self.n_samples), minval=-1.0, maxval=1.0)
    return frequency_filter(signal, magnitudes,
                            window_size=self.window_size)


class Wavetable(Processor):
  """Synthesize audio from a series of wavetables.

  Attributes:
    n_samples: Length of output audio.
    sample_rate: Samples per second.
    scale_fn: Scale function for amplitudes and wavetables.
  """

  n_samples: int = 64000
  sample_rate: int = 16000
  scale_fn: Optional[Callable[[Array], Array]] = ops_core.exp_sigmoid

  def get_controls(self, amplitudes: Array, wavetables: Array,
                   f0_hz: Array) -> TensorDict:
    """amplitudes [b,t,1], wavetables [b,t,n_wavetable], f0_hz [b,t,1]."""
    if self.scale_fn is not None:
      amplitudes = self.scale_fn(amplitudes)
      wavetables = self.scale_fn(wavetables)
    return {'amplitudes': amplitudes,
            'wavetables': wavetables,
            'f0_hz': f0_hz}

  def get_signal(self, amplitudes: Array, wavetables: Array,
                 f0_hz: Array) -> Array:
    """Synthesize audio; returns [batch, n_samples]."""
    wavetables = resample(wavetables, self.n_samples)
    return wavetable_ops.wavetable_synthesis(
        frequencies=f0_hz,
        amplitudes=amplitudes,
        wavetables=wavetables,
        n_samples=self.n_samples,
        sample_rate=self.sample_rate)


class Sinusoidal(Processor):
  """Synthesize audio with a bank of arbitrary sinusoidal oscillators.

  Attributes:
    n_samples: Length of output audio.
    sample_rate: Samples per second.
    amp_scale_fn: Scale function for amplitudes.
    freq_scale_fn: Scale function converting network outputs to frequencies
      in hertz.
  """

  n_samples: int = 64000
  sample_rate: int = 16000
  amp_scale_fn: Optional[Callable[[Array], Array]] = ops_core.exp_sigmoid
  freq_scale_fn: Callable[[Array], Array] = ops_core.frequencies_softmax

  def get_controls(self, amplitudes: Array, frequencies: Array) -> TensorDict:
    """amplitudes [b,t,n_sin], frequencies [b,t,n_sin(*depth)] outputs."""
    if self.amp_scale_fn is not None:
      amplitudes = self.amp_scale_fn(amplitudes)

    if self.freq_scale_fn is not None:
      frequencies = self.freq_scale_fn(frequencies)
      amplitudes = osc.remove_above_nyquist(frequencies, amplitudes,
                                            self.sample_rate)

    return {'amplitudes': amplitudes, 'frequencies': frequencies}

  def get_signal(self, amplitudes: Array, frequencies: Array) -> Array:
    """Synthesize audio; returns [batch, n_samples]."""
    amplitude_envelopes = resample(amplitudes, self.n_samples,
                                   method='window')
    frequency_envelopes = resample(frequencies, self.n_samples)
    return osc.oscillator_bank(frequency_envelopes, amplitude_envelopes,
                               sample_rate=self.sample_rate)
