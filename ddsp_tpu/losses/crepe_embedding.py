"""Perceptual embedding loss on frozen CREPE activations.

Reference behavior: /root/reference/ddsp/losses.py (EmbeddingLoss:361,
PretrainedCREPEEmbeddingLoss:390, PretrainedCREPE layer:424): L1 distance
between frozen-CREPE layer activations of target and synthesized audio,
with a per-layer scale table.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ddsp_tpu.losses.spectral import Loss, mean_difference
from ddsp_tpu.ops.crepe import CrepeModel, load_weights_from_h5

Array = jax.Array

# Scale per activation layer to comparable loss magnitudes
# (reference losses.py:399-413).
_LAYER_SCALES = {
    'conv1-BN': 1.3, 'conv1-maxpool': 1.0,
    'conv2-BN': 1.4, 'conv2-maxpool': 1.1,
    'conv3-BN': 1.9, 'conv3-maxpool': 1.6,
    'conv4-BN': 1.5, 'conv4-maxpool': 1.4,
    'conv5-BN': 1.9, 'conv5-maxpool': 1.7,
    'conv6-BN': 30, 'conv6-maxpool': 25,
    'classifier': 130,
}

# linen clones modules (re-running __post_init__) on every bind/init/apply,
# so the frozen CREPE variables are cached per config: without this each
# jit trace of the enclosing model would re-read the .h5 from disk (or
# re-run a full CrepeModel.init).
_CREPE_VARIABLES_CACHE = {}


def _frozen_crepe_variables(crepe: CrepeModel, weights_path: Optional[str],
                            model_capacity: str):
  key = (weights_path, model_capacity, crepe.activation_layer)
  if key not in _CREPE_VARIABLES_CACHE:
    if weights_path:
      variables = load_weights_from_h5(weights_path, model_capacity)
    else:
      variables = crepe.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024)))
    _CREPE_VARIABLES_CACHE[key] = variables
  return _CREPE_VARIABLES_CACHE[key]


class EmbeddingLoss(Loss):
  """Perceptual loss on activations of a frozen pretrained model.

  Reference behavior: losses.py:361 (EmbeddingLoss). Comparing audio in a
  pretrained model's feature space rewards matching harmonic structure that
  plain spectral losses blur out. Subclasses provide the embedding by
  overriding `_embedding(audio) -> [batch, frames, depth]`; the loss is
  `weight * scale * mean_difference` between target and synth embeddings,
  with the target's embedding detached.

  Attributes:
    weight: Loss weight.
    loss_type: Distance type ('L1', 'L2', 'COSINE').
    scale: Extra multiplier applied on top of weight (layer balancing).
  """

  weight: float = 1.0
  loss_type: str = 'L1'
  scale: float = 1.0

  def _embedding(self, audio: Array) -> Array:
    raise NotImplementedError

  def __call__(self, target_audio: Array, audio: Array) -> Array:
    loss = 0.0
    if self.weight > 0.0:
      target_emb = jax.lax.stop_gradient(self._embedding(target_audio))
      synth_emb = self._embedding(audio)
      loss = (self.scale * self.weight *
              mean_difference(target_emb, synth_emb, self.loss_type))
    return loss


class PretrainedCREPEEmbeddingLoss(EmbeddingLoss):
  """L1 loss between frozen-CREPE activations of two audio signals.

  Attributes:
    weight: Base loss weight (scaled by 20 * layer scale, as reference).
    loss_type: Distance type.
    model_capacity: CREPE size ('tiny' default).
    activation_layer: Which layer's activations to compare.
    weights_path: Optional crepe .h5 weights (random init if absent).
  """

  weight: float = 1.0
  loss_type: str = 'L1'
  model_capacity: str = 'tiny'
  activation_layer: str = 'classifier'
  weights_path: Optional[str] = None

  def __post_init__(self):
    # CREPE stays FROZEN: its weights are captured constants built at
    # construction time (outside any flax trace), not flax params - no
    # gradients flow into them and they never appear in optimizer state.
    if self.activation_layer not in _LAYER_SCALES:
      raise ValueError(
          f'activation layer {self.activation_layer} not found, valid '
          f'names are {sorted(_LAYER_SCALES)}')
    # 20x base scaling plus the per-layer balance factor (losses.py:398).
    object.__setattr__(self, 'scale',
                       20.0 * _LAYER_SCALES[self.activation_layer])
    crepe = CrepeModel(model_capacity=self.model_capacity,
                       activation_layer=self.activation_layer)
    variables = _frozen_crepe_variables(crepe, self.weights_path,
                                        self.model_capacity)
    # object.__setattr__ bypasses linen's submodule registration: the model
    # stays a plain frozen attribute.
    object.__setattr__(self, '_crepe', crepe)
    object.__setattr__(self, '_crepe_variables', variables)
    super().__post_init__()

  def _embedding(self, audio: Array) -> Array:
    """[batch, n] audio (n divisible by 1024) -> [batch, frames, depth]."""
    frame_length, hop_length = 1024, 1024
    # Center frames on their timestamps.
    pad = frame_length // 2
    audio = jnp.pad(audio, ((0, 0), (pad, pad)))
    n = audio.shape[-1]
    n_frames = 1 + (n - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length +
           jnp.arange(frame_length)[None, :])
    frames = audio[:, idx]

    # Per-frame normalization expected by CREPE.
    mean = jnp.mean(frames, axis=-1, keepdims=True)
    var = jnp.var(frames, axis=-1, keepdims=True)
    frames = (frames - mean) / (var**0.5 + 1e-5)

    batch_size, n_frames = frames.shape[0], frames.shape[1]
    flat = jnp.reshape(frames, (-1, frame_length))
    acts = self._crepe.apply(self._crepe_variables, flat)
    return jnp.reshape(acts, (batch_size, n_frames, -1))
