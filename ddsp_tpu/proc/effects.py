"""Effect processors: reverbs, LTV-FIR filter, modulated delay.

Reference behavior: /root/reference/ddsp/effects.py (Reverb:28,
ExpDecayReverb:121, FilteredNoiseReverb:202, FIRFilter:283, ModDelay:328).

Trainable reverb parameters are flax params created in setup(); randomness
(exp-decay noise) is drawn from the 'noise' rng stream.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops import wavetable as wavetable_ops
from ddsp_tpu.ops.fftconv import fft_convolve, frequency_filter
from ddsp_tpu.proc.processors import Processor
from ddsp_tpu.proc import synths

Array = jax.Array
TensorDict = Dict[str, Any]


def _mask_dry_ir(ir: Array) -> Array:
  """Set the first impulse response sample to zero to mask the dry signal."""
  if ir.ndim == 1:
    ir = ir[jnp.newaxis, :]
  if ir.ndim == 3:
    ir = ir[:, :, 0]
  dry_mask = jnp.zeros((int(ir.shape[0]), 1), jnp.float32)
  return jnp.concatenate([dry_mask, ir[:, 1:]], axis=1)


def _match_dimensions(audio: Array, ir: Array) -> Array:
  """Tile the impulse response variable to match the audio batch size."""
  if ir.ndim == 1:
    ir = ir[jnp.newaxis, :]
  batch_size = int(audio.shape[0])
  return jnp.tile(ir, (batch_size, 1))


class Reverb(Processor):
  """Convolutional (FIR) reverb.

  Attributes:
    trainable: Learn the impulse response as a single variable for the
      entire dataset.
    reverb_length: Length of the impulse response (trainable=True only).
    add_dry: Add the dry signal to the reverberated signal on output.
  """

  trainable: bool = False
  reverb_length: int = 48000
  add_dry: bool = True

  def setup(self):
    if self.trainable:
      self._ir = self.param(
          'ir', nn.initializers.normal(stddev=1e-6), (self.reverb_length,))

  def get_controls(self, audio: Array,
                   ir: Optional[Array] = None) -> TensorDict:
    """audio: dry audio [batch, n_samples]; ir: [batch, ir_size(, 1)]."""
    if self.trainable:
      ir = _match_dimensions(audio, self._ir)
    elif ir is None:
      raise ValueError('Must provide "ir" tensor if Reverb trainable=False.')
    return {'audio': audio, 'ir': ir}

  def get_signal(self, audio: Array, ir: Array) -> Array:
    """Apply impulse response; returns [batch, n_samples]."""
    audio = ops_core.jnp_float32(audio)
    ir = _mask_dry_ir(ops_core.jnp_float32(ir))
    if self.trainable:
      # The controls dict carries the IR tiled to the batch (reference
      # contract), but every row is the one shared trainable IR - hand
      # fft_convolve the single row so the partitioned path transforms
      # it once and broadcasts in the frequency domain (same gradient:
      # the broadcast's adjoint sums the batch contributions).
      ir = ir[:1]
    wet = fft_convolve(audio, ir, padding='same', delay_compensation=0)
    return (wet + audio) if self.add_dry else wet


class ExpDecayReverb(Reverb):
  """Reverb whose impulse response is an exponentially decaying noise burst.

  ir = scale_fn(gain) * exp(-(2 + exp(decay)) * t) * noise, t in [0, 1].
  """

  scale_fn: Callable[[Array], Array] = ops_core.exp_sigmoid

  def setup(self):
    if self.trainable:
      self._gain = self.param('gain', nn.initializers.constant(2.0), (1,))
      self._decay = self.param('decay', nn.initializers.constant(4.0), (1,))

  def _get_ir(self, gain: Array, decay: Array) -> Array:
    """Simple exponential decay of white noise."""
    gain = self.scale_fn(gain)
    decay_exponent = 2.0 + jnp.exp(decay)
    time = jnp.linspace(0.0, 1.0, self.reverb_length)[jnp.newaxis, :]
    if self.has_rng('noise'):
      key = self.make_rng('noise')
    else:
      key = jax.random.PRNGKey(0)
    noise = jax.random.uniform(key, (1, self.reverb_length),
                               minval=-1.0, maxval=1.0)
    return gain * jnp.exp(-decay_exponent * time) * noise

  def get_controls(self, audio: Array,
                   gain: Optional[Array] = None,
                   decay: Optional[Array] = None) -> TensorDict:
    """audio [batch, n], gain/decay [batch, 1] (unused if trainable)."""
    if self.trainable:
      gain, decay = self._gain[jnp.newaxis, :], self._decay[jnp.newaxis, :]
    elif gain is None or decay is None:
      raise ValueError('Must provide "gain" and "decay" tensors if '
                       'ExpDecayReverb trainable=False.')

    ir = self._get_ir(gain, decay)
    if self.trainable:
      ir = _match_dimensions(audio, ir)
    return {'audio': audio, 'ir': ir}


class FilteredNoiseReverb(Reverb):
  """Reverb whose impulse response is produced by a filtered noise synth.

  Attributes:
    window_size: Window size for the filtered noise synthesizer.
    n_frames: Time resolution of magnitudes (trainable=True only).
    n_filter_banks: Frequency resolution of magnitudes (trainable=True only).
    scale_fn: Scale function for the magnitudes.
    initial_bias: Shift the synth inputs by this before scale_fn.
  """

  window_size: int = 257
  n_frames: int = 1000
  n_filter_banks: int = 16
  scale_fn: Callable[[Array], Array] = ops_core.exp_sigmoid
  initial_bias: float = -3.0

  def setup(self):
    self._synth = synths.FilteredNoise(n_samples=self.reverb_length,
                                       window_size=self.window_size,
                                       scale_fn=self.scale_fn,
                                       initial_bias=self.initial_bias,
                                       name='ir_synth')
    if self.trainable:
      self._magnitudes = self.param(
          'magnitudes', nn.initializers.normal(stddev=1e-2),
          (self.n_frames, self.n_filter_banks))

  def get_controls(self, audio: Array,
                   magnitudes: Optional[Array] = None) -> TensorDict:
    """audio [batch, n]; magnitudes [batch, n_frames, n_filter_banks]."""
    if self.trainable:
      magnitudes = self._magnitudes[jnp.newaxis, :]
    elif magnitudes is None:
      raise ValueError('Must provide "magnitudes" tensor if '
                       'FilteredNoiseReverb trainable=False.')

    ir = self._synth(magnitudes)
    if self.trainable:
      ir = _match_dimensions(audio, ir)
    return {'audio': audio, 'ir': ir}


class FIRFilter(Processor):
  """Linear time-varying finite impulse response (LTV-FIR) filter."""

  window_size: int = 257
  scale_fn: Optional[Callable[[Array], Array]] = ops_core.exp_sigmoid

  def get_controls(self, audio: Array, magnitudes: Array) -> TensorDict:
    """audio [batch, n]; magnitudes [batch, time, n_filter_banks]."""
    if self.scale_fn is not None:
      magnitudes = self.scale_fn(magnitudes)
    return {'audio': audio, 'magnitudes': magnitudes}

  def get_signal(self, audio: Array, magnitudes: Array) -> Array:
    """Filter audio with the LTV-FIR filter; returns [batch, n_samples]."""
    return frequency_filter(audio, magnitudes, window_size=self.window_size)


class ModDelay(Processor):
  """Modulated delay times used in chorus, flanger, and vibrato effects."""

  center_ms: float = 15.0
  depth_ms: float = 10.0
  sample_rate: int = 16000
  gain_scale_fn: Optional[Callable[[Array], Array]] = ops_core.exp_sigmoid
  phase_scale_fn: Optional[Callable[[Array], Array]] = jax.nn.sigmoid
  add_dry: bool = True

  def get_controls(self, audio: Array, gain: Array,
                   phase: Array) -> TensorDict:
    """audio [b, n]; gain [b, n, 1]; phase (relative delay time) [b, n, 1]."""
    if self.gain_scale_fn is not None:
      gain = self.gain_scale_fn(gain)
    if self.phase_scale_fn is not None:
      phase = self.phase_scale_fn(phase)
    return {'audio': audio, 'gain': gain, 'phase': phase}

  def get_signal(self, audio: Array, gain: Array, phase: Array) -> Array:
    """Time-varying delay; returns [batch, n_samples]."""
    max_delay_ms = self.center_ms + self.depth_ms
    max_length_samples = int(self.sample_rate / 1000.0 * max_delay_ms)

    depth_phase = self.depth_ms / max_delay_ms
    center_phase = self.center_ms / max_delay_ms
    phase = phase * depth_phase + center_phase
    wet_audio = wavetable_ops.variable_length_delay(
        audio=audio, phase=phase, max_length=max_length_samples)

    if gain.ndim == 3:
      gain = gain[..., 0]

    wet_audio = wet_audio * gain
    return (wet_audio + audio) if self.add_dry else wet_audio
