"""Decoders: conditioning features -> synthesizer controls.

Reference behavior: /root/reference/ddsp/training/decoders.py
(RnnFcDecoder:27, MidiDecoder:113, MidiToHarmonicDecoder:164,
DilatedConvDecoder:222).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.nn import layers as nn_layers
from ddsp_tpu.nn.dilated_conv import DilatedConvStack
from ddsp_tpu.ops import core as ops_core

Array = jax.Array


class RnnFcDecoder(nn_layers.DictModule):
  """Per-input FC stacks -> RNN -> FC stack -> dense -> split to controls.

  Attributes:
    rnn_channels: Dims of the RNN layer.
    rnn_type: 'gru' or 'lstm'.
    ch: Dims of the fully connected layers.
    layers_per_stack: FC layers per stack.
    stateless: Explicitly pass RNN state in and out (for streaming
      inference). Adds 'state' to input and output keys.
    input_keys: One FC stack is created per input.
    output_splits: (name, n_channels) pairs the final dense layer is split
      into.
  """

  rnn_channels: int = 512
  rnn_type: str = 'gru'
  ch: int = 512
  layers_per_stack: int = 3
  stateless: bool = False
  input_keys: tuple = ('ld_scaled', 'f0_scaled', 'z')
  output_splits: tuple = (('amps', 1), ('harmonic_distribution', 40))
  # 'bfloat16' runs the FC-stack and hoisted-GRU GEMMs on the MXU's
  # 4x-rate bf16 path (float32 params, accumulation, LayerNorm, and
  # recurrent carry); the output head stays float32.
  compute_dtype: str = 'bfloat16'

  def _input_keys(self):
    keys = list(self.input_keys)
    if self.stateless:
      keys.append('state')
    return keys

  def _output_keys(self):
    keys = [v[0] for v in self.output_splits]
    if self.stateless:
      keys.append('state')
    return keys

  def setup(self):
    n_stacks = len(self.input_keys)
    self.input_stacks = [
        nn_layers.FcStack(self.ch, self.layers_per_stack,
                          compute_dtype=self.compute_dtype,
                          name=f'in_stack_{i}')
        for i in range(n_stacks)
    ]
    if self.stateless:
      self.rnn = nn_layers.StatelessRnn(self.rnn_channels, self.rnn_type,
                                        compute_dtype=self.compute_dtype)
    else:
      self.rnn = nn_layers.Rnn(self.rnn_channels, self.rnn_type,
                               compute_dtype=self.compute_dtype)
    self.out_stack = nn_layers.FcStack(self.ch, self.layers_per_stack,
                                       compute_dtype=self.compute_dtype)
    n_out = sum(v[1] for v in self.output_splits)
    # Output head always float32 (also re-anchors bf16-mode activations so
    # control outputs keep the float32 contract).
    self.dense_out = nn.Dense(n_out, dtype=jnp.float32)

  def forward(self, *inputs, **unused_kwargs):
    inputs = list(inputs)
    if self.stateless:
      state = inputs.pop()

    # Initial processing with a stack per input.
    inputs = [stack(x) for stack, x in zip(self.input_stacks, inputs)]

    # Run an RNN over the latents.
    x = jnp.concatenate(inputs, axis=-1)
    if self.stateless:
      x, new_state = self.rnn(x, state)
    else:
      x = self.rnn(x)
    dt = jnp.dtype(self.compute_dtype)
    if dt != jnp.float32:
      # The RNN emits float32; concatenating it with the bf16 stack
      # outputs would promote the whole [B, T, 3ch] skip tensor to f32.
      # The out-stack's first Dense casts its input to bf16 regardless,
      # so casting before the concat is bit-identical downstream and
      # halves the HBM traffic of this materialization (fwd and bwd).
      x = x.astype(dt)
    x = jnp.concatenate(inputs + [x], axis=-1)

    # Final processing.
    x = self.out_stack(x)
    x = self.dense_out(x)

    output_dict = nn_layers.split_to_dict(x, self.output_splits)
    if self.stateless:
      output_dict['state'] = new_state
    return output_dict


class FcStackDecoder(nn_layers.DictModule):
  """Simple decoder: concat inputs -> FC stack -> dense -> split.

  A lighter-weight alternative when no recurrence is needed.
  """

  ch: int = 256
  layers_per_stack: int = 3
  input_keys: tuple = ('ld_scaled', 'f0_scaled')
  output_splits: tuple = (('amps', 1), ('harmonic_distribution', 40))

  def _output_keys(self):
    return [v[0] for v in self.output_splits]

  def setup(self):
    self.stack = nn_layers.FcStack(self.ch, self.layers_per_stack)
    n_out = sum(v[1] for v in self.output_splits)
    self.dense_out = nn.Dense(n_out)

  def forward(self, *inputs, **unused_kwargs):
    x = jnp.concatenate(list(inputs), axis=-1)
    x = self.stack(x)
    x = self.dense_out(x)
    return nn_layers.split_to_dict(x, self.output_splits)


class MidiDecoder(nn_layers.DictModule):
  """Decodes MIDI pitch (& velocity) back to f0 and loudness curves.

  Reference: decoders.py:113. The loudness head is recentered to the
  typical dB range (x*30 - 70).
  """

  net: Optional[nn.Module] = None
  f0_residual: bool = True
  center_loudness: bool = True
  norm: bool = True
  input_keys: tuple = ('z_pitch',)
  output_keys: tuple = ('f0_midi', 'loudness')

  def _optional_input_keys(self):
    return ('z_vel', 'z')

  def setup(self):
    self.dense_out = nn.Dense(2)
    if self.norm:
      self.norm_layer = nn_layers.Normalize('layer')

  def forward(self, z_pitch: Array, z_vel: Optional[Array] = None,
              z: Optional[Array] = None, **unused_kwargs):
    del z_vel  # TODO in the reference as well: allow velocity.
    x = z_pitch
    x = self.net(x) if z is None else self.net(x, z)
    if self.norm:
      x = self.norm_layer(x)
    x = self.dense_out(x)

    f0_midi = x[..., 0:1]
    loudness = x[..., 1:2]
    if self.f0_residual:
      f0_midi += z_pitch
    if self.center_loudness:
      loudness = loudness * 30.0 - 70.0
    return f0_midi, loudness


class MidiToHarmonicDecoder(nn_layers.DictModule):
  """Decodes MIDI pitch (& velocity) to full harmonic synth controls.

  Reference: decoders.py:164. Outputs f0 both in MIDI (residual) and Hz.
  """

  net: Optional[nn.Module] = None
  f0_residual: bool = True
  norm: bool = True
  output_splits: tuple = (('f0_midi', 1),
                          ('amplitudes', 1),
                          ('harmonic_distribution', 60),
                          ('magnitudes', 65))
  midi_zero_silence: bool = True
  input_keys: tuple = ('z_pitch',)

  def _optional_input_keys(self):
    return ('z_vel', 'z')

  def _output_keys(self):
    return [v[0] for v in self.output_splits] + ['f0_hz']

  def setup(self):
    n_out = sum(v[1] for v in self.output_splits)
    self.dense_out = nn.Dense(n_out)
    if self.norm:
      self.norm_layer = nn_layers.Normalize('layer')

  def forward(self, z_pitch: Array, z_vel: Optional[Array] = None,
              z: Optional[Array] = None, **unused_kwargs):
    del z_vel  # TODO in the reference as well: allow velocity.
    x = z_pitch
    x = self.net(x) if z is None else self.net(x, z)
    if self.norm:
      x = self.norm_layer(x)
    x = self.dense_out(x)

    outputs = nn_layers.split_to_dict(x, self.output_splits)
    if self.f0_residual:
      outputs['f0_midi'] += z_pitch
    outputs['f0_hz'] = ops_core.midi_to_hz(
        outputs['f0_midi'], midi_zero_silence=self.midi_zero_silence)
    return outputs


class DilatedConvDecoder(nn_layers.DictModule):
  """WaveNet-style dilated conv decoder with optional z conditioning.

  Reference: decoders.py:222. Conditioning inputs (conditioning_keys) are
  concatenated into z and FiLM-modulate the conv stack's normalizations.
  """

  ch: int = 256
  kernel_size: int = 3
  layers_per_stack: int = 5
  stacks: int = 2
  dilation: int = 2
  norm_type: str = 'layer'
  resample_stride: int = 1
  stacks_per_resample: int = 1
  resample_after_convolve: bool = True
  input_keys: tuple = ('ld_scaled', 'f0_scaled')
  output_splits: tuple = (('amps', 1), ('harmonic_distribution', 60))
  conditioning_keys: tuple = ('z',)
  precondition_stack: Optional[nn.Module] = None
  spectral_norm: bool = False
  ortho_init: bool = False

  def _input_keys(self):
    return list(self.input_keys) + list(self.conditioning_keys or ())

  def _output_keys(self):
    return [v[0] for v in self.output_splits]

  @property
  def conditional(self) -> bool:
    return bool(self.conditioning_keys)

  def setup(self):
    if not self.conditional and self.precondition_stack is not None:
      raise ValueError('You must specify conditioning keys if you specify '
                       'a precondition stack.')
    self.dilated_conv_stack = DilatedConvStack(
        ch=self.ch,
        kernel_size=self.kernel_size,
        layers_per_stack=self.layers_per_stack,
        stacks=self.stacks,
        dilation=self.dilation,
        norm_type=self.norm_type,
        resample_type='upsample' if self.resample_stride > 1 else None,
        resample_stride=self.resample_stride,
        stacks_per_resample=self.stacks_per_resample,
        resample_after_convolve=self.resample_after_convolve,
        conditional=self.conditional,
        spectral_norm=self.spectral_norm,
        ortho_init=self.ortho_init)
    n_out = sum(v[1] for v in self.output_splits)
    self.dense_out = nn.Dense(n_out)

  def forward(self, *inputs, training: bool = False, **unused_kwargs):
    n_cond = len(self.conditioning_keys or ())
    if self.conditional:
      x = jnp.concatenate(inputs[:-n_cond], axis=-1)
      z = jnp.concatenate(inputs[-n_cond:], axis=-1)
      if self.precondition_stack is not None:
        z = self.precondition_stack(z)
      y = self.dilated_conv_stack(x, z, training=training)
    else:
      x = jnp.concatenate(list(inputs), axis=-1)
      y = self.dilated_conv_stack(x, training=training)
    y = self.dense_out(y)
    return nn_layers.split_to_dict(y, self.output_splits)
