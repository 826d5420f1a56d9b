"""Processor base class, ProcessorGroup, and routing processors.

Reference behavior: /root/reference/ddsp/processors.py (Processor:37,
ProcessorGroup:80, Add:163, Mix:180, Crop:237).

A Processor converts network outputs to standardized controls
(`get_controls`) and controls to a signal (`get_signal`). A ProcessorGroup
executes a DAG of processors over a nested dict of arrays, producing
outputs[name] = {'signal': ..., 'controls': {...}} per node and
outputs['out']['signal'] as the final audio.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.ops.resample import resample
from ddsp_tpu.proc.dags import DAGModule

Array = jax.Array
TensorDict = Dict[str, Any]


class Processor(nn.Module):
  """Abstract base class for signal processors.

  Subclasses implement `get_controls(*nn_outputs) -> dict` and
  `get_signal(**controls) -> signal`. Calling the processor runs both.
  """

  def __call__(self, *args, return_outputs_dict: bool = False,
               **kwargs) -> Array:
    """Convert input tensor arguments into a signal tensor."""
    for k in ['training', 'mask']:
      kwargs.pop(k, None)
    controls = self.get_controls(*args, **kwargs)
    signal = self.get_signal(**controls)
    if return_outputs_dict:
      return dict(signal=signal, controls=controls)
    return signal

  def get_controls(self, *args, **kwargs) -> TensorDict:
    """Convert input tensor arguments into a dict of processor controls."""
    raise NotImplementedError

  def get_signal(self, *args, **kwargs) -> Array:
    """Convert control tensors into a signal tensor."""
    raise NotImplementedError


class ProcessorGroup(DAGModule):
  """A DAG of Processor modules ending in an output signal.

  dag: list of (processor, [input_key, ...]) nodes; see DAGModule. The final
  node's signal is the group output ('out/signal').
  """

  def __call__(self, inputs: TensorDict,
               return_outputs_dict: bool = False, **kwargs):
    controls = self.get_controls(inputs, **kwargs)
    signal = self.get_signal(controls)
    if return_outputs_dict:
      return dict(signal=signal, controls=controls)
    return signal

  def get_controls(self, inputs: TensorDict, **kwargs) -> TensorDict:
    """Run the DAG and return the complete nested outputs dictionary."""
    return self.run_dag(inputs, **kwargs)

  def get_signal(self, outputs: TensorDict) -> Array:
    """Extract the output signal from the dag outputs."""
    return outputs['out']['signal']


# --------------------------------------------------------------------------
# Routing processors
# --------------------------------------------------------------------------
class Add(Processor):
  """Sum two signals."""

  def get_controls(self, signal_one: Array, signal_two: Array) -> TensorDict:
    return {'signal_one': signal_one, 'signal_two': signal_two}

  def get_signal(self, signal_one: Array, signal_two: Array) -> Array:
    return signal_one + signal_two


class Mix(Processor):
  """Constant-power crossfade between two signals."""

  def get_controls(self, signal_one: Array, signal_two: Array,
                   nn_out_mix_level: Array) -> TensorDict:
    """Squash the raw mix level into [0, 1] and resample it to audio rate.

    Args:
      signal_one: First signal, [batch, n_time(, ch)]; must be the same
        length as signal_two.
      signal_two: Second signal, same shape contract.
      nn_out_mix_level: Raw network output [batch, frames, 1] that sets
        the balance between the two signals (sigmoid-squashed here).

    Returns:
      Controls dict {signal_one, signal_two, mix_level}.
    """
    n_time_one = int(signal_one.shape[1])
    n_time_two = int(signal_two.shape[1])
    if n_time_one != n_time_two:
      raise ValueError(f'Mix needs equal-length signals; got {n_time_one} '
                       f'vs {n_time_two} samples.')

    mix_level = jax.nn.sigmoid(nn_out_mix_level)
    mix_level = resample(mix_level, n_time_one)
    # Align ranks: a [batch, n, 1] level against 2-D [batch, n] signals
    # would broadcast get_signal to [batch, n, n] (quadratic memory, not
    # audio).
    if mix_level.ndim == signal_one.ndim + 1:
      mix_level = mix_level[..., 0]
    return {
        'signal_one': signal_one,
        'signal_two': signal_two,
        'mix_level': mix_level,
    }

  def get_signal(self, signal_one: Array, signal_two: Array,
                 mix_level: Array) -> Array:
    """Constant-power crossfade between two signals."""
    mix_level_one = jnp.sqrt(jnp.abs(mix_level))
    mix_level_two = 1.0 - jnp.sqrt(jnp.abs(mix_level - 1.0))
    return mix_level_one * signal_one + mix_level_two * signal_two


class Crop(Processor):
  """Trim synthesis produced by padding frames off one or both ends.

  One full frame_size of samples is removed in total: all from the start
  ('front'), all from the end ('back'), or split evenly ('center' - the
  same two half-frames that centered framing added, rounded down so odd
  frame sizes trim symmetrically).
  """

  frame_size: int = 1024
  crop_location: str = 'back'

  def get_controls(self, audio: Array) -> TensorDict:
    return {'audio': audio}

  def get_signal(self, audio: Array) -> Array:
    half = int(self.frame_size // 2)
    if self.crop_location == 'front':
      return audio[:, 2 * half:]
    elif self.crop_location == 'center':
      return audio[:, half:-half]
    elif self.crop_location == 'back':
      return audio[:, :-2 * half]
    else:
      raise ValueError(f'Unknown crop_location {self.crop_location!r}; '
                       "expected 'front', 'center', or 'back'.")
