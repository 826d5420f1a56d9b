"""Encoders: audio/features -> latent z or synthesizer controls.

Reference behavior: /root/reference/ddsp/training/encoders.py (ZEncoder:27,
MfccTimeDistributedRnnEncoder:66, ResnetSinusoidalEncoder:131,
SinusoidalToHarmonicEncoder:177, OneHotEncoder:255,
AggregateFeaturesEncoder:287, MfccEncoder:301, MfccRnnEncoder:338,
MidiEncoder:377, HarmonicToMidiEncoder:419, ExpressionEncoder:463).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.nn import layers as nn_layers
from ddsp_tpu.nn.resnet import ResNet
from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops import oscillator
from ddsp_tpu.ops import spectral
from ddsp_tpu.ops.resample import resample

Array = jax.Array

# fft_size/overlap lookup to land MFCC frames at the desired z_time_steps
# for 4 s of 16 kHz audio (reference encoders.py:79-100).
_Z_AUDIO_SPEC = {
    63: dict(fft_size=2048, overlap=0.5),
    125: dict(fft_size=1024, overlap=0.5),
    250: dict(fft_size=1024, overlap=0.75),
    500: dict(fft_size=512, overlap=0.75),
    1000: dict(fft_size=256, overlap=0.75),
}


class ZEncoder(nn_layers.DictModule):
  """Base class for encoders producing a latent z, resampled to time_steps.

  Subclasses implement compute_z(*inputs). The last declared input
  ('f0_scaled' by convention) is only used to read the target number of
  timesteps.
  """

  output_keys: tuple = ('z',)

  def forward(self, *args, **unused_kwargs):
    time_steps = int(args[-1].shape[1])
    inputs = args[:-1]  # Last input just used for time_steps.
    z = self.compute_z(*inputs)
    return (self.expand_z(z, time_steps),)

  def expand_z(self, z: Array, time_steps: int) -> Array:
    """Make sure z has the same temporal resolution as other conditioning."""
    if z.ndim == 2:
      z = z[:, jnp.newaxis, :]
    z_time_steps = int(z.shape[1])
    if z_time_steps != time_steps:
      z = resample(z, time_steps)
    return z

  def compute_z(self, *inputs) -> Array:
    raise NotImplementedError


class MfccTimeDistributedRnnEncoder(ZEncoder):
  """MFCCs -> instance norm -> RNN -> dense as latent z per timestep."""

  rnn_channels: int = 512
  rnn_type: str = 'gru'
  z_dims: int = 32
  z_time_steps: int = 250
  input_keys: tuple = ('audio', 'f0_scaled')

  def setup(self):
    if self.z_time_steps not in _Z_AUDIO_SPEC:
      raise ValueError('`z_time_steps` currently limited to '
                       f'{sorted(_Z_AUDIO_SPEC)}')
    spec = _Z_AUDIO_SPEC[self.z_time_steps]
    self.fft_size = spec['fft_size']
    self.overlap = spec['overlap']
    self.z_norm = nn_layers.Normalize('instance')
    self.rnn = nn_layers.Rnn(self.rnn_channels, self.rnn_type)
    self.dense_out = nn.Dense(self.z_dims)

  def compute_z(self, audio: Array) -> Array:
    mfccs = spectral.compute_mfcc(
        audio,
        lo_hz=20.0,
        hi_hz=8000.0,
        fft_size=self.fft_size,
        mel_bins=128,
        mfcc_bins=30,
        overlap=self.overlap,
        pad_end=True)

    # Normalize.
    z = self.z_norm(mfccs[:, :, jnp.newaxis, :])[:, :, 0, :]
    # Run an RNN over the latents.
    z = self.rnn(z)
    # Bounce down to compressed z dimensions.
    return self.dense_out(z)


class OneHotEncoder(ZEncoder):
  """Embeds an integer instrument/class id as the latent z."""

  vocab_size: int = 1
  z_dims: int = 32
  input_keys: tuple = ('instrument_id', 'f0_scaled')

  def setup(self):
    self.embedding = nn.Embed(self.vocab_size, self.z_dims)

  def compute_z(self, instrument_id: Array) -> Array:
    ids = jnp.asarray(instrument_id).astype(jnp.int32)
    if ids.ndim == 1:
      ids = ids[:, jnp.newaxis]
    return self.embedding(ids)


class ResnetSinusoidalEncoder(nn_layers.DictModule):
  """Audio -> logmel -> ResNet -> dense heads of sinusoidal controls.

  Maps directly from audio to synthesizer parameters (an encoder and
  decoder in one). Reference: encoders.py:131.
  """

  output_splits: tuple = (('frequencies', 100 * 64),
                          ('amplitudes', 100),
                          ('noise_magnitudes', 60))
  size: str = 'tiny'
  input_keys: tuple = ('audio',)

  def _output_keys(self):
    return [v[0] for v in self.output_splits]

  def setup(self):
    # 'tiny' maps onto the reference's small ResNet for test-scale runs.
    resnet_size = 'small' if self.size == 'tiny' else self.size
    self.resnet = ResNet(size=resnet_size)
    self.dense_outs = [nn.Dense(v[1], name=f'dense_{v[0]}')
                       for v in self.output_splits]

  def forward(self, audio: Array, **unused_kwargs):
    # [batch, time, n_mels]
    mag = spectral.compute_logmel(audio, lo_hz=0.0, hi_hz=8000.0, bins=229,
                                  fft_size=1024, overlap=0.75)
    x = self.resnet(mag[:, :, :, jnp.newaxis])
    # Collapse the frequency dimension.
    x = jnp.reshape(x, (x.shape[0], x.shape[1], -1))
    return {key: layer(x)
            for key, layer in zip(self._output_keys(), self.dense_outs)}


class SinusoidalToHarmonicEncoder(nn_layers.DictModule):
  """Predicts harmonic controls from sinusoidal controls.

  Reference: encoders.py:177. The `net` submodule (e.g. RnnSandwich) does
  the heavy lifting; heads predict amp, harmonic distribution, and f0
  (via frequencies_softmax over a depth-64 bin embedding).
  """

  net: Optional[nn.Module] = None
  n_harmonics: int = 100
  f0_depth: int = 64
  hz_min: float = 20.0
  hz_max: float = 1200.0
  sample_rate: int = 16000
  input_keys: tuple = ('sin_freqs', 'sin_amps')
  output_keys: tuple = ('harm_amp', 'harm_dist', 'f0_hz')

  def setup(self):
    self.amp_out = nn.Dense(1)
    self.hd_out = nn.Dense(self.n_harmonics)
    self.f0_out = nn.Dense(self.f0_depth)

  def forward(self, sin_freqs: Array, sin_amps: Array, **unused_kwargs):
    nyquist = self.sample_rate / 2.0
    sin_freqs_unit = ops_core.hz_to_unit(sin_freqs, hz_min=0.0,
                                         hz_max=nyquist)
    x = jnp.concatenate([sin_freqs_unit, sin_amps], axis=-1)
    x = self.net(x)
    x = x['out'] if isinstance(x, dict) else x

    harm_amp = ops_core.exp_sigmoid(self.amp_out(x))
    harm_dist = ops_core.exp_sigmoid(self.hd_out(x))
    f0_hz = ops_core.frequencies_softmax(self.f0_out(x), depth=self.f0_depth,
                                         hz_min=self.hz_min,
                                         hz_max=self.hz_max)

    # Filter harmonic distribution above nyquist and renormalize.
    harm_dist = oscillator.normalize_harmonics(harm_dist, f0_hz,
                                               self.sample_rate)
    return harm_amp, harm_dist, f0_hz


class AggregateFeaturesEncoder(ZEncoder):
  """Mean over time of a dense embedding of (f0, loudness) features."""

  ch: int = 512
  input_keys: tuple = ('f0_scaled', 'ld_scaled')

  def setup(self):
    self.fc = nn.Dense(self.ch)

  def forward(self, *args, **unused_kwargs):
    # Unlike other ZEncoders, all declared inputs feed compute_z; the
    # timestep count comes from the first one.
    time_steps = int(args[0].shape[1])
    z = self.compute_z(*args)
    return (self.expand_z(z, time_steps),)

  def compute_z(self, f0_scaled: Array, ld_scaled: Array) -> Array:
    x = jnp.concatenate([f0_scaled, ld_scaled], axis=-1)
    return jnp.mean(self.fc(x), axis=1, keepdims=True)


class MfccEncoder(ZEncoder):
  """Instance-normalized (multi-resolution) MFCCs as latent z."""

  fft_sizes: tuple = (1024,)
  mel_bins: tuple = (128,)
  mfcc_bins: tuple = (30,)
  time_steps: int = 250
  input_keys: tuple = ('audio', 'f0_scaled')

  def setup(self):
    self.norm_out = nn_layers.Normalize('instance')

  def compute_z(self, audio: Array) -> Array:
    mfccs = []
    for fft_size, mel_bin, mfcc_bin in zip(self.fft_sizes, self.mel_bins,
                                           self.mfcc_bins):
      mfcc = spectral.compute_mfcc(audio, lo_hz=20.0, hi_hz=8000.0,
                                   fft_size=fft_size, mel_bins=mel_bin,
                                   mfcc_bins=mfcc_bin)
      mfccs.append(resample(mfcc, self.time_steps))
    mfccs = jnp.concatenate(mfccs, axis=-1)
    return self.norm_out(mfccs[:, :, jnp.newaxis, :])[:, :, 0, :]


class MfccRnnEncoder(ZEncoder):
  """MFCCs -> RNN compressed to a single timestep latent."""

  rnn_channels: int = 512
  rnn_type: str = 'gru'
  z_dims: int = 512
  mean_aggregate: bool = False
  input_keys: tuple = ('audio', 'f0_scaled')

  def setup(self):
    self.norm_in = nn_layers.Normalize('instance')
    self.rnn = nn_layers.Rnn(self.rnn_channels, self.rnn_type,
                             return_sequences=self.mean_aggregate)
    self.dense_z = nn.Dense(self.z_dims)

  def compute_z(self, audio: Array) -> Array:
    mfccs = spectral.compute_mfcc(audio, lo_hz=20.0, hi_hz=8000.0,
                                  fft_size=1024, mel_bins=128, mfcc_bins=30)
    z = self.norm_in(mfccs[:, :, jnp.newaxis, :])[:, :, 0, :]
    if self.mean_aggregate:
      z = self.rnn(z)
      z = jnp.mean(z, axis=1, keepdims=True)
    else:
      z = self.rnn(z)[:, jnp.newaxis, :]  # Final state only.
    return self.dense_z(z)


class MidiEncoder(nn_layers.DictModule):
  """Encodes f0 & loudness curves to (unquantized) MIDI pitch/velocity."""

  net: Optional[nn.Module] = None
  f0_residual: bool = True
  input_keys: tuple = ('f0_midi', 'loudness')
  output_keys: tuple = ('z_pitch', 'z_vel')

  def setup(self):
    self.dense_out = nn.Dense(2)
    self.norm = nn_layers.Normalize('layer')

  def forward(self, f0_midi: Array, loudness: Array, **unused_kwargs):
    x = jnp.concatenate([f0_midi, loudness], axis=-1)
    x = self.net(x)
    x = self.norm(x)
    x = self.dense_out(x)

    z_pitch = x[..., 0:1]
    z_vel = x[..., 1:2]
    if self.f0_residual:
      z_pitch += f0_midi
    return z_pitch, z_vel


class HarmonicToMidiEncoder(nn_layers.DictModule):
  """Encodes harmonic synth parameters to MIDI pitch/velocity."""

  net: Optional[nn.Module] = None
  f0_residual: bool = True
  input_keys: tuple = ('f0_midi', 'amps', 'hd', 'noise')
  output_keys: tuple = ('z_pitch', 'z_vel')

  def setup(self):
    self.dense_out = nn.Dense(2)
    self.norm = nn_layers.Normalize('layer')

  def forward(self, f0_midi: Array, amps: Array, hd: Array, noise: Array,
              **unused_kwargs):
    x = jnp.concatenate([f0_midi, amps, hd, noise], axis=-1)
    x = self.net(x)
    x = self.norm(x)
    x = self.dense_out(x)

    z_pitch = x[..., 0:1]
    z_vel = x[..., 1:2]
    if self.f0_residual:
      z_pitch += f0_midi
    return z_pitch, z_vel


class ExpressionEncoder(ZEncoder):
  """Latent from (optionally) MFCCs plus loudness and pitch features."""

  net: Optional[nn.Module] = None
  z_dims: int = 128
  input_keys: tuple = ('f0_scaled', 'ld_scaled')
  mfcc_bins: int = 60
  fft_size: int = 1024
  mel_bins: int = 128
  pool_time: bool = True

  def setup(self):
    self.norm = nn_layers.Normalize('layer')
    self.dense_out = nn.Dense(self.z_dims)
    if 'audio' in self.input_keys:
      self.norm_mfcc = nn_layers.Normalize('instance')

  def forward(self, *args, **unused_kwargs):
    # All declared inputs feed compute_z (no trailing timing-only key).
    time_steps = int(args[0].shape[1])
    if 'audio' in self.input_keys:
      # Timestep count comes from the first non-audio input.
      audio_idx = list(self.input_keys).index('audio')
      non_audio = [x for i, x in enumerate(args) if i != audio_idx]
      time_steps = int(non_audio[0].shape[1])
    z = self.compute_z(*args)
    return (self.expand_z(z, time_steps),)

  def compute_z(self, *inputs) -> Array:
    inputs = list(inputs)
    if 'audio' in self.input_keys:
      audio_idx = list(self.input_keys).index('audio')
      audio = inputs.pop(audio_idx)
      n_t = int(inputs[0].shape[1])
      mfccs = spectral.compute_mfcc(audio, lo_hz=20.0, hi_hz=8000.0,
                                    fft_size=self.fft_size,
                                    mel_bins=self.mel_bins,
                                    mfcc_bins=self.mfcc_bins)
      mfccs_scaled = self.norm_mfcc(mfccs)
      mfccs_scaled = resample(mfccs_scaled, n_t)
      inputs.append(mfccs_scaled)

    x = jnp.concatenate(inputs, axis=-1)
    z = self.net(x)
    z = self.norm(z)
    z = self.dense_out(z)
    if self.pool_time:
      z = jnp.mean(z, axis=1, keepdims=True)
    return z
