"""CREPE pitch tracker as a flax module, for on-accelerator batch f0.

Reference behavior: /root/reference/ddsp/spectral_ops.py (PretrainedCREPE:
432, activations_to_f0_and_confidence:457, create_hmm:525,
viterbi_decode:559, compute_f0:328) and the public CREPE architecture
(Kim et al. 2018): six Conv-BN-MaxPool-Dropout blocks over 1024-sample
frames, sigmoid classifier over 360 20-cent pitch bins.

Weights: `load_weights_from_h5` reads the pip package's model-<size>.h5
files (keras layer naming) into the flax param tree. Without weights the
module runs with random init - fine for plumbing tests; real pitch
tracking requires the pretrained weights on disk (no network access is
assumed).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops import hmm as hmm_ops

Array = jax.Array

CREPE_SAMPLE_RATE = 16000
CREPE_FRAME_SIZE = 1024
_N_BINS = 360


def default_weights_path(model_capacity: str) -> Optional[str]:
  """First model-<size>.h5 found: $CREPE_WEIGHTS_DIR, then the repo's
  committed assets/crepe (weights trained in-env on synthetic harmonic
  data by scripts/train_tiny_crepe.py - a working learned tracker for
  clean harmonic material, NOT the published CREPE)."""
  candidates = []
  env_dir = os.environ.get('CREPE_WEIGHTS_DIR', '')
  if env_dir:
    candidates.append(env_dir)
  candidates.append(os.path.join(
      os.path.dirname(os.path.dirname(os.path.dirname(
          os.path.abspath(__file__)))), 'assets', 'crepe'))
  for d in candidates:
    p = os.path.join(d, f'model-{model_capacity}.h5')
    if os.path.exists(p):
      return p
  return None

# Capacity multiplier per model size (public CREPE).
_CAPACITIES = {'tiny': 4, 'small': 8, 'medium': 16, 'large': 24, 'full': 32}
_FILTERS = (32, 4, 4, 4, 8, 16)
_WIDTHS = (512, 64, 64, 64, 64, 64)
_STRIDES = (4, 1, 1, 1, 1, 1)

# Pitch bin centers in cents above 10 Hz (CREPE convention).
_CENT_MAPPING = (np.linspace(0, 7180, _N_BINS) +
                 1997.3794084376191).astype(np.float32)


class CrepeModel(nn.Module):
  """The CREPE network: 1024 audio samples -> 360 pitch-bin activations.

  Layer naming matches the keras original (conv1..conv6, conv{i}-BN,
  conv{i}-maxpool, classifier) so weight import and the embedding-loss layer
  selection line up. `activation_layer` optionally returns an intermediate
  activation instead of the classifier output.
  """

  model_capacity: str = 'tiny'
  activation_layer: Optional[str] = None

  @nn.compact
  def __call__(self, frames: Array, training: bool = False) -> Array:
    """frames: [batch, 1024] normalized audio -> [batch, 360] (sigmoid)."""
    capacity = _CAPACITIES[self.model_capacity]
    x = frames[:, :, jnp.newaxis, jnp.newaxis]  # NHWC: [b, 1024, 1, 1]

    for i, (f, w, s) in enumerate(zip(_FILTERS, _WIDTHS, _STRIDES)):
      layer_n = i + 1
      x = nn.Conv(f * capacity, (w, 1), strides=(s, 1), padding='SAME',
                  name=f'conv{layer_n}')(x)
      x = jax.nn.relu(x)
      x = nn.BatchNorm(use_running_average=not training, momentum=0.99,
                       epsilon=1e-3, name=f'conv{layer_n}_BN')(x)
      if self.activation_layer == f'conv{layer_n}-BN':
        return jnp.reshape(x, (x.shape[0], -1))
      x = nn.max_pool(x, (2, 1), strides=(2, 1))
      if self.activation_layer == f'conv{layer_n}-maxpool':
        return jnp.reshape(x, (x.shape[0], -1))
      # Dropout(0.25) in the original; inference-only here.

    x = jnp.reshape(x, (x.shape[0], -1))
    x = nn.Dense(_N_BINS, name='classifier')(x)
    return jax.nn.sigmoid(x)


def load_weights_from_h5(path: str,
                         model_capacity: str = 'tiny') -> Dict[str, Any]:
  """Read a crepe pip-package model-<size>.h5 into a flax variables dict.

  Returns {'params': ..., 'batch_stats': ...} for CrepeModel.apply.
  """
  import h5py  # pylint: disable=g-import-not-at-top

  params, batch_stats = {}, {}
  with h5py.File(path, 'r') as f:
    weights = f['model_weights'] if 'model_weights' in f else f

    def arr(group, name):
      return np.asarray(weights[group][group][name])

    for i in range(1, 7):
      conv = f'conv{i}'
      # Keras Conv2D kernel [h, w, in, out] matches flax.
      params[conv] = {'kernel': jnp.asarray(arr(conv, 'kernel:0')),
                      'bias': jnp.asarray(arr(conv, 'bias:0'))}
      bn = f'{conv}-BN'
      params[f'{conv}_BN'] = {
          'scale': jnp.asarray(arr(bn, 'gamma:0')),
          'bias': jnp.asarray(arr(bn, 'beta:0'))}
      batch_stats[f'{conv}_BN'] = {
          'mean': jnp.asarray(arr(bn, 'moving_mean:0')),
          'var': jnp.asarray(arr(bn, 'moving_variance:0'))}
    params['classifier'] = {
        'kernel': jnp.asarray(arr('classifier', 'kernel:0')),
        'bias': jnp.asarray(arr('classifier', 'bias:0'))}

  # Validate the file matches the requested capacity up front (a mismatch
  # would otherwise surface as an opaque flax shape error at apply time).
  expected = _FILTERS[0] * _CAPACITIES[model_capacity]
  got = params['conv1']['kernel'].shape[-1]
  if got != expected:
    raise ValueError(
        f'Weights file {path!r} has {got} conv1 filters but capacity '
        f'{model_capacity!r} expects {expected}.')
  return {'params': params, 'batch_stats': batch_stats}


def activations_to_f0_and_confidence(
    activations: Array, centers: Optional[Array] = None
) -> Tuple[Array, Array]:
  """Convert [batch, 360] activations to (f0_hz, confidence).

  Local weighted average of cents in a 10-bin neighborhood around the
  argmax (or provided centers), as in the reference (spectral_ops.py:457).
  """
  cent_mapping = jnp.asarray(_CENT_MAPPING)

  confidence = jnp.max(activations, axis=-1, keepdims=True)
  if centers is None:
    centers = jnp.argmax(activations, axis=-1)
  centers = centers.astype(jnp.int32)

  start = centers - 4
  idx_list = start[:, jnp.newaxis] + jnp.arange(0, 10)
  idx_list = jnp.clip(idx_list, 0, _N_BINS - 1)

  weights = jnp.take_along_axis(activations, idx_list, axis=-1)
  cents = cent_mapping[idx_list]
  f0_cent = jnp.sum(weights * cents, axis=-1) / jnp.sum(weights, axis=-1)
  f0_hz = 10 * 2**(f0_cent / 1200.0)
  return f0_hz, confidence


def crepe_viterbi_centers(activations: Array) -> Array:
  """Viterbi-smoothed pitch bin centers, [batch, time, 360] -> [batch, time].

  Same HMM as the original CREPE decoder: uniform initial state, triangular
  transition kernel favoring small pitch jumps, emission that boosts the
  self bin (reference spectral_ops.py:525-563), run with the jnp viterbi.
  """
  bins = np.arange(_N_BINS, dtype=np.float32)
  xx, yy = np.meshgrid(bins, bins)
  transition = np.maximum(12 - np.abs(xx - yy), 1e-5)
  transition = transition / transition.sum(axis=1, keepdims=True)
  log_transition = jnp.log(jnp.asarray(transition, jnp.float32))
  log_initial = jnp.full((_N_BINS,), -np.log(_N_BINS), dtype=jnp.float32)

  # Emission: p(obs | state) with fixed self-emission mass. With Multinomial
  # (total_count=1) observations of the activation vector, the per-step
  # observation log-likelihood reduces to sum_j act_j * log(emission[s, j]).
  self_emission = 0.1
  emission = (np.eye(_N_BINS) * self_emission +
              np.ones((_N_BINS, _N_BINS)) * ((1 - self_emission) / _N_BINS))
  log_emission = jnp.asarray(np.log(emission.T), jnp.float32)  # [obs, state]

  obs_ll = jnp.einsum('bto,os->bts', activations, log_emission)
  return hmm_ops.viterbi_decode(log_initial, log_transition, obs_ll)


class PretrainedCrepe:
  """Batch pitch prediction on accelerator with a (pretrained) CREPE.

  Mirrors the reference PretrainedCREPE (spectral_ops.py:432): frame,
  normalize, run the network, decode f0/confidence (optionally viterbi).

  Args:
    model_capacity: One of 'tiny', 'small', 'medium', 'large', 'full'.
    weights_path: Optional model-<size>.h5 from the crepe pip package. If
      None, looks at $CREPE_WEIGHTS_DIR/model-<size>.h5; falls back to
      random init (plumbing only) when absent.
    hop_size: Samples between frames (160 = 100 Hz at 16 kHz).
  """

  def __init__(self, model_capacity: str = 'tiny',
               weights_path: Optional[str] = None, hop_size: int = 160):
    self.model_capacity = model_capacity
    self.hop_size = hop_size
    self.frame_size = CREPE_FRAME_SIZE
    self.sample_rate = CREPE_SAMPLE_RATE
    self.model = CrepeModel(model_capacity=model_capacity)

    if weights_path is None:
      weights_path = default_weights_path(model_capacity)

    if weights_path is not None:
      self.variables = load_weights_from_h5(weights_path, model_capacity)
      self.pretrained = True
    else:
      import logging  # pylint: disable=g-import-not-at-top
      logging.warning(
          'PretrainedCrepe(%s): no pretrained weights found (weights_path '
          'not given and $CREPE_WEIGHTS_DIR has no model-%s.h5). Running '
          'with RANDOM weights - pitch predictions are garbage; only '
          'plumbing/shape tests are meaningful.', model_capacity,
          model_capacity)
      dummy = jnp.zeros((1, self.frame_size))
      self.variables = self.model.init(jax.random.PRNGKey(0), dummy)
      self.pretrained = False

  def batch_frames(self, audio: Array) -> Array:
    """Chop [batch, n] audio into frames pushed onto the batch axis."""
    if audio.shape[-1] == self.frame_size:
      return audio
    n = audio.shape[-1]
    n_frames = 1 + (n - self.frame_size) // self.hop_size
    idx = (jnp.arange(n_frames)[:, None] * self.hop_size +
           jnp.arange(self.frame_size)[None, :])
    frames = audio[:, idx]  # [batch, n_frames, frame_size]
    return jnp.reshape(frames, (-1, self.frame_size))

  @staticmethod
  def normalize_frames(frames: Array) -> Array:
    mu = jnp.mean(frames, axis=-1, keepdims=True)
    var = jnp.var(frames, axis=-1, keepdims=True)
    std = jnp.where(jnp.abs(var) > 0, jnp.sqrt(var), 1e-8)
    return (frames - mu) / std

  def activations(self, audio: Array) -> Array:
    """[batch, n] audio -> [batch, n_frames, 360] activations."""
    batch_size = audio.shape[0]
    frames = self.normalize_frames(self.batch_frames(audio))
    acts = self.model.apply(self.variables, frames)
    return jnp.reshape(acts, (batch_size, -1, _N_BINS))

  def predict_f0_and_confidence(self, audio: Array, viterbi: bool = False,
                                padding: str = 'center'):
    """[batch, n] (or [n]) audio -> (f0_hz, confidence), [batch, n_frames]."""
    from ddsp_tpu.ops.spectral import pad  # circular-import guard

    audio = audio[jnp.newaxis, :] if audio.ndim == 1 else audio
    batch_size = audio.shape[0]
    audio = pad(audio, self.frame_size, self.hop_size, padding=padding)

    acts = self.activations(audio)
    acts_flat = jnp.reshape(acts, (-1, _N_BINS))

    centers = None
    if viterbi:
      centers = jnp.reshape(crepe_viterbi_centers(acts), (-1,))

    f0_hz, confidence = activations_to_f0_and_confidence(acts_flat, centers)
    return (jnp.reshape(f0_hz, (batch_size, -1)),
            jnp.reshape(confidence, (batch_size, -1)))
