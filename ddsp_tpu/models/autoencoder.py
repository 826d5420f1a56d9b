"""The flagship DDSP Autoencoder model.

Reference behavior: /root/reference/ddsp/training/models/autoencoder.py
(Autoencoder:21, encode:38-44, decode:47-53, call:55-71).

Dataflow: features -> preprocessor -> [encoder] -> decoder ->
ProcessorGroup -> audio_synth; losses compare (features['audio'],
audio_synth).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax

from ddsp_tpu.models.model import Model
from ddsp_tpu.proc.dags import loss_module_name

Array = jax.Array
TensorDict = Dict[str, Any]


class Autoencoder(Model):
  """Wrap the model function for dependency injection with configs.

  Attributes:
    preprocessor: DictModule scaling raw features (f0/loudness).
    encoder: Optional DictModule producing latent 'z'.
    decoder: DictModule producing synthesizer control features.
    processor_group: ProcessorGroup DAG turning controls into audio.
    losses: Sequence of Loss modules applied to (audio, audio_synth).
  """

  preprocessor: Any = None
  encoder: Any = None
  decoder: Any = None
  processor_group: Any = None
  losses: Sequence[Any] = ()

  def encode(self, features: TensorDict, training: bool = True) -> TensorDict:
    """Get conditioning by preprocessing then encoding."""
    features = dict(features)
    if self.preprocessor is not None:
      features.update(self.preprocessor(features, training=training))
    if self.encoder is not None:
      features.update(self.encoder(features))
    return features

  def decode(self, features: TensorDict, training: bool = True) -> TensorDict:
    """Decode conditioning to audio: decoder then ProcessorGroup.

    Returns the ProcessorGroup outputs dict: per-processor controls plus
    the final audio under 'audio_synth' (reference decode() returns the
    bare signal; here the dict keeps one decode path shared with
    forward_with_losses - take ['audio_synth'] for the audio alone).
    """
    features = dict(features)
    features.update(self.decoder(features, training=training))
    pg_out = self.processor_group(features, return_outputs_dict=True)
    outputs = dict(pg_out['controls'])
    outputs['audio_synth'] = pg_out['signal']
    return outputs

  def forward_with_losses(self, features: TensorDict, training: bool = True,
                          compute_losses: bool = True,
                          **kwargs) -> Tuple[TensorDict, TensorDict]:
    """Run the core of the network, get predictions and loss."""
    features = self.encode(features, training=training)
    outputs = self.decode(features, training=training)

    losses_dict = {}
    if compute_losses:
      for loss_obj in self.losses:
        # Stable name from the class (linen renames tuple-field submodules
        # positionally to 'losses_<i>'), uniquified on collision.
        name = loss_module_name(loss_obj)
        while name in losses_dict:
          name += '_'
        losses_dict[name] = loss_obj(features['audio'],
                                     outputs['audio_synth'])
    return outputs, losses_dict

  def get_audio_from_outputs(self, outputs: TensorDict) -> Array:
    """Extract audio output tensor from outputs dict of call()."""
    return outputs['audio_synth']
