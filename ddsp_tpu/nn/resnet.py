"""Residual networks (bottleneck ResNet) and FiLM conditional normalization.

Reference behavior: /root/reference/ddsp/training/nn.py (NormReluConv:699,
ResidualLayer:713, ResidualStack:760, ResNet:806,
ConditionalScaleAndShift:1075, ConditionalNorm:1103).

Used by the sinusoidal encoder on log-mel spectrograms: convolutions stride
over the frequency (width) axis only, preserving the time axis. Inputs are
NHWC [batch, time, freq, ch]; convs map straight onto the MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.nn.layers import (Normalize, ensure_4d, get_nonlinearity,
                                normalize_op)

Array = jax.Array


class ConditionalScaleAndShift(nn.Module):
  """Conditional (FiLM) scaling and shifting after normalization."""

  shift_only: bool = False

  @nn.compact
  def __call__(self, x: Array, z: Array) -> Array:
    x_ch = x.shape[-1]
    ch = x_ch if self.shift_only else 2 * x_ch
    scale_shift = nn.Dense(ch)(z)
    if self.shift_only:
      return x + scale_shift
    scale = scale_shift[..., :x_ch]
    shift = scale_shift[..., x_ch:]
    return x * scale + shift


class ConditionalNorm(nn.Module):
  """Normalization followed by conditional scale and shift (FiLM)."""

  norm_type: str = 'instance'
  shift_only: bool = False

  @nn.compact
  def __call__(self, x: Array, z: Array) -> Array:
    x = normalize_op(x, norm_type=self.norm_type)
    return ConditionalScaleAndShift(shift_only=self.shift_only)(x, z)


def get_norm(norm_type: str, conditional: bool, shift_only: bool):
  """Normalization layer: learned params, or FiLM-conditioned."""
  if conditional:
    return ConditionalNorm(norm_type=norm_type, shift_only=shift_only)
  return Normalize(norm_type=norm_type)


class NormReluConv(nn.Module):
  """Norm -> ReLU -> Conv, downsampling frequency (width) by stride."""

  ch: int
  k: int
  s: int
  norm_type: str

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = Normalize(self.norm_type)(x)
    x = jax.nn.relu(x)
    return nn.Conv(self.ch, (self.k, self.k), strides=(1, self.s),
                   padding='SAME')(x)


class ResidualLayer(nn.Module):
  """Single bottleneck ResNet layer (channels x4 out)."""

  ch: int
  stride: int
  shortcut: bool
  norm_type: str
  conditional: bool = False
  shift_only: bool = False

  @nn.compact
  def __call__(self, x: Array, z: Optional[Array] = None) -> Array:
    ch_out = 4 * self.ch
    r = x
    x = ensure_4d(x)
    if self.conditional:
      z = ensure_4d(z)
      x = jax.nn.relu(
          get_norm(self.norm_type, True, self.shift_only)(x, z))
    else:
      x = jax.nn.relu(get_norm(self.norm_type, False, self.shift_only)(x))

    # Projection shortcut comes after the first norm+relu (1x1 conv).
    if self.shortcut:
      r = nn.Conv(ch_out, (1, 1), strides=(1, self.stride), padding='SAME',
                  name='conv_proj')(x)
    x = nn.Conv(self.ch, (1, 1), strides=(1, 1), padding='SAME')(x)
    x = NormReluConv(self.ch, 3, self.stride, self.norm_type)(x)
    x = NormReluConv(ch_out, 1, 1, self.norm_type)(x)
    return x + r


class ResidualStack(nn.Module):
  """Stacks of residual layers, one shortcut+stride layer per block."""

  filters: Sequence[int]
  block_sizes: Sequence[int]
  strides: Sequence[int]
  norm_type: str
  conditional: bool = False
  shift_only: bool = False
  nonlinearity: str = 'relu'

  @nn.compact
  def __call__(self, x: Array, z: Optional[Array] = None) -> Array:
    def res(layer, x):
      return layer(x, z) if self.conditional else layer(x)

    for (ch, n_layers, stride) in zip(self.filters, self.block_sizes,
                                      self.strides):
      # Only the first block per stack uses the shortcut and stride.
      x = res(ResidualLayer(ch, stride, True, self.norm_type,
                            self.conditional, self.shift_only), x)
      for _ in range(1, n_layers):
        x = res(ResidualLayer(ch, 1, False, self.norm_type,
                              self.conditional, self.shift_only), x)
    x = Normalize(self.norm_type)(x)
    return get_nonlinearity(self.nonlinearity)(x)


class ResNet(nn.Module):
  """Residual network over spectrogram-like inputs.

  Input [batch, time, freq, ch] (or 3-D, auto-expanded); frequency is
  downsampled 2x at the stem, 2x at the pool, and by the stack strides.
  """

  size: str = 'large'
  norm_type: str = 'layer'
  conditional: bool = False
  shift_only: bool = False

  @nn.compact
  def __call__(self, x: Array, z: Optional[Array] = None) -> Array:
    size_dict = {
        'small': (32, [2, 3, 4]),
        'medium': (32, [3, 4, 6]),
        'large': (64, [3, 4, 6]),
    }
    ch, blocks = size_dict[self.size]

    x = ensure_4d(x)
    x = nn.Conv(64, (7, 7), strides=(1, 2), padding='SAME')(x)
    x = nn.max_pool(x, (1, 3), strides=(1, 2), padding='SAME')

    def res(stack, x):
      return stack(x, z) if self.conditional else stack(x)

    x = res(ResidualStack([ch, 2 * ch, 4 * ch], blocks, [1, 2, 2],
                          self.norm_type, self.conditional,
                          self.shift_only), x)
    x = res(ResidualStack([8 * ch], [3], [2], self.norm_type,
                          self.conditional, self.shift_only), x)
    return x
