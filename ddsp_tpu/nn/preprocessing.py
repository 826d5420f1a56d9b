"""Preprocessors: scale and resample conditioning features.

Reference behavior: /root/reference/ddsp/training/preprocessing.py
(scale_db:37, scale_f0_hz:47, F0LoudnessPreprocessor:59,
F0PowerPreprocessor:105).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ddsp_tpu.nn.layers import DictModule
from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops import spectral
from ddsp_tpu.ops.resample import resample

Array = jax.Array

F0_RANGE = spectral.F0_RANGE  # 127.0 MIDI
DB_RANGE = ops_core.DB_RANGE  # 80.0 dB


def at_least_3d(x: Array) -> Array:
  """Optionally adds time, batch, then channel dimension."""
  x = jnp.asarray(x)
  if x.ndim == 0:
    x = x[jnp.newaxis]
  if x.ndim == 1:
    x = x[jnp.newaxis, :]
  if x.ndim == 2:
    x = x[:, :, jnp.newaxis]
  return x


def scale_db(db: Array) -> Array:
  """Scales [-DB_RANGE, 0] to [0, 1]."""
  return (db / DB_RANGE) + 1.0


def inv_scale_db(db_scaled: Array) -> Array:
  """Scales [0, 1] to [-DB_RANGE, 0]."""
  return (db_scaled - 1.0) * DB_RANGE


def scale_f0_hz(f0_hz: Array) -> Array:
  """Scales [0, Nyquist] Hz to [0, 1.0] MIDI-scaled."""
  return ops_core.hz_to_midi(f0_hz) / F0_RANGE


def inv_scale_f0_hz(f0_scaled: Array) -> Array:
  """Scales [0, 1.0] MIDI-scaled to [0, Nyquist] Hz."""
  return ops_core.midi_to_hz(f0_scaled * F0_RANGE)


class F0LoudnessPreprocessor(DictModule):
  """Resamples and scales 'f0_hz' and 'loudness_db' features.

  Attributes:
    time_steps: Resample features to this many frames.
    frame_rate: Frame rate for in-graph loudness computation.
    sample_rate: Audio sample rate.
    compute_loudness_fresh: Recompute loudness from audio in-graph instead
      of using the dataset value.
  """

  time_steps: int = 1000
  frame_rate: int = 250
  sample_rate: int = 16000
  compute_loudness_fresh: bool = True
  input_keys: tuple = ('loudness_db', 'f0_hz', 'audio')
  output_keys: tuple = ('f0_hz', 'loudness_db', 'f0_scaled', 'ld_scaled')

  def _input_keys(self):
    if self.compute_loudness_fresh:
      return self.input_keys
    return self.input_keys[:2]

  def _optional_input_keys(self):
    # When loudness is recomputed from audio, a dataset loudness label is
    # unnecessary (and immediately discarded).
    return ('loudness_db',) if self.compute_loudness_fresh else ()

  def forward(self, loudness_db: Optional[Array], f0_hz: Array,
              audio: Optional[Array] = None, **unused_kwargs):
    if self.compute_loudness_fresh:
      if audio is None:
        raise ValueError(
            "F0LoudnessPreprocessor(compute_loudness_fresh=True) requires "
            "'audio' in the features.")
      loudness_db = spectral.compute_loudness(
          audio, sample_rate=self.sample_rate, frame_rate=self.frame_rate)
    elif loudness_db is None:
      raise ValueError("F0LoudnessPreprocessor requires 'loudness_db' when "
                       'compute_loudness_fresh=False.')

    f0_hz = self.resample(f0_hz)
    loudness_db = self.resample(loudness_db)
    # For NN training, scale frequency and loudness to the range [0, 1].
    f0_scaled = scale_f0_hz(f0_hz)
    ld_scaled = scale_db(loudness_db)
    return f0_hz, loudness_db, f0_scaled, ld_scaled

  @staticmethod
  def invert_scaling(f0_scaled: Array,
                     ld_scaled: Array) -> Tuple[Array, Array]:
    """Puts scaled f0 and loudness back to hz & db scales."""
    return inv_scale_f0_hz(f0_scaled), inv_scale_db(ld_scaled)

  def resample(self, x: Array) -> Array:
    return resample(at_least_3d(x), self.time_steps)


class F0PowerPreprocessor(F0LoudnessPreprocessor):
  """Scales 'f0_hz' and computes 'power_db' on the fly if not provided.

  Attributes:
    frame_size: Frame size for in-graph power computation.
  """

  frame_size: int = 64
  input_keys: tuple = ('f0_hz', 'power_db', 'audio')
  output_keys: tuple = ('f0_hz', 'pw_db', 'f0_scaled', 'pw_scaled')

  def _input_keys(self):
    return self.input_keys

  def _optional_input_keys(self):
    return ('power_db', 'audio')

  def forward(self, f0_hz: Array, power_db: Optional[Array] = None,
              audio: Optional[Array] = None, **unused_kwargs):
    f0_hz = self.resample(f0_hz)
    f0_scaled = scale_f0_hz(f0_hz)

    if power_db is not None:
      pw_db = power_db
    elif audio is not None:
      pw_db = spectral.compute_power(audio,
                                     sample_rate=self.sample_rate,
                                     frame_rate=self.frame_rate,
                                     frame_size=self.frame_size)
    else:
      raise ValueError('Power preprocessing requires either "power_db" or '
                       '"audio" keys to be provided in the dataset.')
    pw_db = self.resample(pw_db)
    pw_scaled = scale_db(pw_db)
    return f0_hz, pw_db, f0_scaled, pw_scaled

  @staticmethod
  def invert_scaling(f0_scaled: Array,
                     pw_scaled: Array) -> Tuple[Array, Array]:
    return inv_scale_f0_hz(f0_scaled), inv_scale_db(pw_scaled)


class OnlineF0PowerPreprocessor(DictModule):
  """Computes power_db and f0_hz (CREPE) on the fly, in-graph.

  Reference behavior: preprocessing.py:155 (OnlineF0PowerPreprocessor).
  CREPE runs as captured frozen constants (stop_gradient on f0), so pitch
  tracking happens on-accelerator inside the same XLA program.

  Attributes:
    frame_rate: Output feature frame rate (Hz).
    frame_size: Analysis frame size (CREPE expects 1024 @ 16 kHz).
    padding: 'center', 'same', or 'valid' framing.
    compute_power: Compute power_db from audio.
    compute_f0: Run CREPE for f0 (else f0_hz/f0_confidence inputs
      required).
    crepe_model_capacity: CREPE size for on-the-fly pitch.
    crepe_weights_path: Optional .h5 weights (see ops.crepe).
    viterbi: Viterbi-decode the CREPE activations.
  """

  frame_rate: int = 250
  frame_size: int = 1024
  padding: str = 'center'
  compute_power: bool = True
  compute_f0: bool = True
  crepe_model_capacity: str = 'tiny'
  crepe_weights_path: Optional[str] = None
  viterbi: bool = False
  input_keys: tuple = ('audio', 'f0_hz', 'f0_confidence', 'audio_16k',
                       'power_db')
  output_keys: tuple = ('f0_hz', 'pw_db', 'f0_scaled', 'pw_scaled',
                        'f0_confidence')

  def _optional_input_keys(self):
    return ('f0_hz', 'f0_confidence', 'audio_16k', 'power_db')

  @property
  def sample_rate(self) -> int:
    # Preprocessing at 16 kHz because CREPE is trained at 16 kHz.
    from ddsp_tpu.ops.crepe import CREPE_SAMPLE_RATE
    return CREPE_SAMPLE_RATE

  @property
  def hop_size(self) -> int:
    return self.sample_rate // self.frame_rate

  def setup(self):
    if self.compute_f0:
      from ddsp_tpu.ops.crepe import PretrainedCrepe
      # Plain attribute (not a flax submodule): weights are frozen
      # constants, never trainable params.
      self._crepe = PretrainedCrepe(
          model_capacity=self.crepe_model_capacity,
          weights_path=self.crepe_weights_path,
          hop_size=self.hop_size)

  def forward(self, audio: Array, f0_hz: Optional[Array] = None,
              f0_confidence: Optional[Array] = None,
              audio_16k: Optional[Array] = None,
              power_db: Optional[Array] = None, **unused_kwargs):
    if audio_16k is not None:
      audio = audio_16k

    pw_db = power_db
    if not self.compute_power and pw_db is None:
      raise ValueError('OnlineF0PowerPreprocessor needs compute_power=True '
                       "or a 'power_db' feature.")
    if self.compute_power:
      pw_db = spectral.compute_power(audio,
                                     sample_rate=self.sample_rate,
                                     frame_rate=self.frame_rate,
                                     frame_size=self.frame_size,
                                     padding=self.padding)

    if self.compute_f0:
      f0_hz, f0_confidence = self._crepe.predict_f0_and_confidence(
          audio, viterbi=self.viterbi, padding=self.padding)
      f0_hz = jax.lax.stop_gradient(f0_hz)
      f0_confidence = jax.lax.stop_gradient(f0_confidence)
    elif f0_hz is None or f0_confidence is None:
      raise ValueError('Preprocessor must either have `compute_f0=True`, or'
                       ' be supplied [audio, f0_hz, f0_confidence].')

    pw_db = at_least_3d(pw_db)
    f0_hz = at_least_3d(f0_hz)
    pw_scaled = scale_db(pw_db)
    f0_scaled = scale_f0_hz(f0_hz)

    # Strict frame-count validation (no interpolation) - reference :226-240.
    n_t = audio.shape[1]
    time_steps, _ = spectral.get_framed_lengths(
        n_t, self.frame_size, self.hop_size, self.padding)
    for k, output in {'f0_hz': f0_hz, 'pw_db': pw_db,
                      'f0_scaled': f0_scaled, 'pw_scaled': pw_scaled}.items():
      if output.shape[1] != time_steps:
        raise ValueError(
            f'OnlineF0PowerPreprocessor output ({k}) does not have '
            f'{time_steps} timesteps. Output shape: {output.shape}. '
            f'Inputs: seconds ({n_t / self.sample_rate}), '
            f'frame_rate ({self.frame_rate}), padding ("{self.padding}").')

    return f0_hz, pw_db, f0_scaled, pw_scaled, f0_confidence
