"""Encoders: audio/features -> latent z.

Reference behavior: /root/reference/ddsp/training/encoders.py (ZEncoder:27,
MfccTimeDistributedRnnEncoder:66, OneHotEncoder:255).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.nn import layers as nn_layers
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
