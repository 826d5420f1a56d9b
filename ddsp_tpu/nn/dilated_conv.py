"""WaveNet-style dilated convolution stacks with optional FiLM conditioning.

Reference behavior: /root/reference/ddsp/training/nn.py (DilatedConvStack:
1153, polyphase_resample:615, PolyphaseResample:678, SpectralNormalization:
948 - here provided by flax.linen.SpectralNorm).

Convolutions are 2-D with a singleton width axis ([batch, time, 1, ch]) so
the time axis is the conv height, matching the reference layout.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.nn.layers import Normalize, ensure_4d
from ddsp_tpu.nn.resnet import ConditionalNorm

Array = jax.Array


def polyphase_resample(x: Array, stride: int = 2,
                       resample_type: str = 'down',
                       trim_or_pad: str = 'pad') -> Array:
  """Resample by 'space_to_depth' interleaving of time and channels.

  Downsampling: [batch, time, ch] -> [batch, time/stride, ch*stride].
  Upsampling:   [batch, time, ch] -> [batch, time*stride, ch/stride].
  Lossless (a reshape), like a polyphase filterbank decomposition.
  """
  is_4d = x.ndim == 4
  if is_4d:
    x = x[:, :, 0, :]

  n_time, n_ch = x.shape[1], x.shape[2]

  if resample_type == 'down':
    if trim_or_pad == 'pad':
      pad = (stride - n_time % stride) % stride
      x = jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad > 0 else x
    else:
      trim = n_time % stride
      x = x[:, :-trim, :] if trim > 0 else x
    n_time = x.shape[1]
    x = jnp.reshape(x, (-1, n_time // stride, n_ch * stride))
  elif resample_type == 'up':
    if trim_or_pad == 'pad':
      pad = (stride - n_ch % stride) % stride
      x = jnp.pad(x, ((0, 0), (0, 0), (0, pad))) if pad > 0 else x
    else:
      trim = n_ch % stride
      x = x[:, :, :-trim] if trim > 0 else x
    n_ch = x.shape[2]
    x = jnp.reshape(x, (-1, n_time * stride, n_ch // stride))
  else:
    raise ValueError('`resample_type` must be either "up" or "down"')

  return x[:, :, jnp.newaxis, :] if is_4d else x


class PolyphaseResample(nn.Module):
  """Resample by interleaving time and channels (lossless reshape)."""

  stride: int = 2
  resample_type: str = 'down'
  trim_or_pad: str = 'pad'

  def __call__(self, x: Array) -> Array:
    return polyphase_resample(x, self.stride, self.resample_type,
                              self.trim_or_pad)


class DilatedConvStack(nn.Module):
  """Stack of dilated convs with residual connections and conditioning.

  Output time axis is (stacks // stacks_per_resample) * resample_stride
  times smaller (downsample) or larger (upsample) than the input.

  Attributes:
    ch: Channels per convolution layer.
    layers_per_stack: Conv layers per stack; dilation grows exponentially
      with depth inside a stack (or shrinks, if `dilation` is negative).
    stacks: Number of stacks.
    kernel_size: Conv kernel size (time axis).
    dilation: Exponent base of the dilation factor.
    norm_type: 'layer' / 'instance' / 'group' normalization.
    resample_type: None, 'upsample', or 'downsample'.
    resample_stride: Stride of resampling convs.
    stacks_per_resample: Stacks between resampling layers.
    resample_after_convolve: Resample after (True) or before (False) each
      group of stacks.
    spectral_norm: Power-iteration spectral normalization on conv kernels.
    ortho_init: Orthogonal kernel init.
    shift_only: FiLM shift-only conditioning.
    conditional: FiLM-condition the normalizations on a z input.
  """

  ch: int = 256
  layers_per_stack: int = 5
  stacks: int = 2
  kernel_size: int = 3
  dilation: int = 2
  norm_type: Optional[str] = None
  resample_type: Optional[str] = None
  resample_stride: int = 1
  stacks_per_resample: int = 1
  resample_after_convolve: bool = True
  spectral_norm: bool = False
  ortho_init: bool = False
  shift_only: bool = False
  conditional: bool = False

  @nn.compact
  def __call__(self, x: Array, z: Optional[Array] = None,
               training: bool = False) -> Array:
    init = (nn.initializers.orthogonal() if self.ortho_init
            else nn.initializers.glorot_uniform())

    def conv(ch, k, stride=1, dilation=1, transpose=False):
      if transpose:
        layer = nn.ConvTranspose(ch, (k, 1), strides=(stride, 1),
                                 padding='SAME', kernel_init=init)
      else:
        layer = nn.Conv(ch, (k, 1), strides=(stride, 1),
                        kernel_dilation=(dilation, 1), padding='SAME',
                        kernel_init=init)
      if self.spectral_norm:
        return nn.SpectralNorm(layer)
      return layer

    def apply_conv(layer, x):
      if self.spectral_norm:
        # SpectralNorm keeps power-iteration state in 'batch_stats'.
        return layer(x, update_stats=training)
      return layer(x)

    def norm():
      if self.conditional:
        return ConditionalNorm(norm_type=self.norm_type,
                               shift_only=self.shift_only)
      return Normalize(norm_type=self.norm_type)

    def resample_layer():
      if self.resample_type == 'downsample':
        return conv(self.ch, self.resample_stride, self.resample_stride)
      elif self.resample_type == 'upsample':
        return conv(self.ch, self.resample_stride * 2, self.resample_stride,
                    transpose=True)
      raise ValueError(f'invalid resample type: {self.resample_type}, '
                       'must be either `upsample` or `downsample`.')

    x = ensure_4d(x)
    if self.conditional:
      if z is None:
        raise ValueError('conditional DilatedConvStack requires z.')
      z = ensure_4d(z)

    x = apply_conv(conv(self.ch, self.kernel_size), x)

    for i in range(self.stacks):
      if (self.resample_type and not self.resample_after_convolve and
          i % self.stacks_per_resample == 0):
        x = apply_conv(resample_layer(), x)

      for j in range(self.layers_per_stack):
        if self.dilation > 0:
          dilation_rate = int(self.dilation**j)
        else:
          # Negative base: decrease dilation with depth instead.
          dilation_rate = int((-self.dilation)**
                              (self.layers_per_stack - j - 1))
        y = jax.nn.relu(x)
        y = apply_conv(conv(self.ch, self.kernel_size, 1, dilation_rate), y)
        if self.conditional:
          x += norm()(y, z)
        else:
          x += norm()(y)

      if (self.resample_type and self.resample_after_convolve and
          (i + 1) % self.stacks_per_resample == 0):
        x = apply_conv(resample_layer(), x)

    return x[:, :, 0, :]  # Back to 3-D [batch, time, ch].
