"""Decoders: conditioning features -> synthesizer controls.

Reference behavior: /root/reference/ddsp/training/decoders.py
(RnnFcDecoder:27).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.nn import layers as nn_layers

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
        nn_layers.FcStack(self.ch, self.layers_per_stack, name=f'in_stack_{i}')
        for i in range(n_stacks)
    ]
    if self.stateless:
      self.rnn = nn_layers.StatelessRnn(self.rnn_channels, self.rnn_type)
    else:
      self.rnn = nn_layers.Rnn(self.rnn_channels, self.rnn_type)
    self.out_stack = nn_layers.FcStack(self.ch, self.layers_per_stack)
    n_out = sum(v[1] for v in self.output_splits)
    self.dense_out = nn.Dense(n_out)

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
