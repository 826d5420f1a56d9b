"""Model base class.

Reference behavior: /root/reference/ddsp/training/models/model.py (Model:26,
__call__:33, _update_losses_dict:66, get_audio_from_outputs:112).

In JAX there is no hidden loss state: `__call__(features, training=True,
return_losses=True)` returns `(outputs, losses_dict)` where losses_dict
includes 'total_loss'. With return_losses=False it returns just the outputs
dictionary.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
TensorDict = Dict[str, Any]


class Model(nn.Module):
  """Wrap the model function for loss computation and audio extraction."""

  def __call__(self, features: TensorDict, training: bool = True,
               return_losses: bool = False, **kwargs):
    """Run the forward pass, optionally adding losses.

    Args:
      features: Input dictionary of arrays.
      training: Run in training mode (losses computed against target audio).
      return_losses: Also return a dictionary of scalar losses, including
        'total_loss'.
      **kwargs: Extra kwargs for the forward pass.

    Returns:
      outputs, or (outputs, losses_dict) if return_losses.
    """
    outputs, losses_dict = self.forward_with_losses(
        features, training=training, compute_losses=return_losses,
        **kwargs)
    if return_losses:
      losses_dict = dict(losses_dict)
      losses_dict['total_loss'] = jnp.sum(
          jnp.asarray(list(losses_dict.values()))) if losses_dict else 0.0
      return outputs, losses_dict
    return outputs

  def forward_with_losses(self, features: TensorDict, training: bool = True,
                          compute_losses: bool = True,
                          **kwargs) -> Tuple[TensorDict, TensorDict]:
    """Subclasses return (outputs, losses_dict).

    Unlike the reference (which only fills its hidden losses dict when
    training=True, leaving eval losses empty - autoencoder.py:67), losses
    are computed whenever requested, so eval reports true losses while
    `training` controls only network behavior (dropout/stats updates).
    """
    raise NotImplementedError

  def get_audio_from_outputs(self, outputs: TensorDict) -> Array:
    """Extract audio output tensor from outputs dict of call()."""
    raise NotImplementedError
