"""Straight-through estimators and note masking/pooling ops.

Reference behavior: /root/reference/ddsp/training/nn.py
(straight_through_softmax:343, straight_through_choice:353,
straight_through_int_quantization:359, get_note_mask:375,
get_note_mask_from_onset:428, get_note_lengths:478, get_note_moments:484,
pool_over_notes:523, get_short_note_loss_mask:550).

All pure jnp; categorical sampling takes an explicit PRNG key instead of
drawing from global state.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ddsp_tpu.ops.core import diff, safe_divide

Array = jax.Array


def straight_through_softmax(
    logits: Array, key: Optional[Array] = None) -> Tuple[Array, Array]:
  """Straight-through estimator of a one-hot categorical distribution.

  Args:
    logits: Unnormalized log-probabilities, [..., n_classes].
    key: PRNG key for sampling. If None, takes the argmax (mode) instead of
      sampling - the deterministic/eval behavior.

  Returns:
    (sample, probs): one-hot sample with straight-through gradients into
    probs, and the softmax probabilities.
  """
  probs = jax.nn.softmax(logits)
  if key is None:
    idx = jnp.argmax(probs, axis=-1)
  else:
    idx = jax.random.categorical(key, logits, axis=-1)
  sample = jax.nn.one_hot(idx, logits.shape[-1], dtype=jnp.float32)
  p_sample = probs * sample
  sample = jax.lax.stop_gradient(sample - p_sample) + p_sample
  return sample, probs


def straight_through_choice(logits: Array, values: Array,
                            key: Optional[Array] = None) -> Array:
  """Straight-through estimator of choosing a value via a one-hot mask."""
  choice, _ = straight_through_softmax(logits, key)
  return jnp.sum(choice * values, axis=-1, keepdims=True)


def straight_through_int_quantization(x: Array) -> Array:
  """Round to nearest integer with identity (straight-through) gradients."""
  return x + jax.lax.stop_gradient(jnp.round(x) - x)


# ------------------ Note masking / pooling ------------------------------------
def get_note_mask(q_pitch: Array, max_regions: int = 100,
                  note_on_only: bool = True) -> Array:
  """Binary mask for each note region of a monophonic pitch track.

  Each transition of the quantized pitch value starts a new region.

  Args:
    q_pitch: Quantized pitch, [batch, time] or [batch, time, 1].
    max_regions: Maximum note regions (channel dim of the output mask).
    note_on_only: Zero out regions whose pitch is 0 (note off).

  Returns:
    Binary mask [batch, time, max_regions].
  """
  if q_pitch.ndim == 3:
    q_pitch = q_pitch[:, :, 0]

  # Onset/offset edges; endpoints count as region starts/ends.
  edges = jnp.abs(diff(q_pitch, axis=1)) > 0
  edges = edges[:, :-1]
  edges = jnp.pad(edges, ((0, 0), (1, 0)), constant_values=True)
  edges = jnp.pad(edges, ((0, 0), (0, 1)), constant_values=False)
  edges = edges.astype(jnp.int32)

  # -1 so the 0th region is the first note.
  edge_idx = jnp.cumsum(edges, axis=1) - 1

  note_mask = (edge_idx[..., jnp.newaxis] ==
               jnp.arange(max_regions)).astype(jnp.float32)

  if note_on_only:
    note_pitches = get_note_moments(q_pitch, note_mask, return_std=False)
    note_on = (note_pitches > 0.0).astype(jnp.float32)[:, jnp.newaxis, :]
    note_mask *= note_on

  return note_mask


def get_note_mask_from_onset(q_pitch: Array, onset: Array,
                             max_regions: int = 100,
                             note_on_only: bool = True) -> Array:
  """Binary mask for each note region, with regions started by onsets."""
  if q_pitch.ndim == 3:
    q_pitch = q_pitch[:, :, 0]
  if onset.ndim == 3:
    onset = onset[:, :, 0]

  edges = onset[:, 1:]
  edges = jnp.pad(edges, ((0, 0), (1, 0)), constant_values=True)
  edges = edges.astype(jnp.int32)

  edge_idx = jnp.cumsum(edges, axis=1) - 1

  note_mask = (edge_idx[..., jnp.newaxis] ==
               jnp.arange(max_regions)).astype(jnp.float32)

  if note_on_only:
    note_on = (q_pitch > 0.0).astype(jnp.float32)[:, :, jnp.newaxis]
    note_mask *= note_on

  return note_mask


def get_note_lengths(note_mask: Array) -> Array:
  """Length of each note: [batch, time, notes] -> [batch, notes]."""
  return jnp.sum(note_mask, axis=1)


def get_note_moments(x: Array, note_mask: Array, return_std: bool = True):
  """Moments of x pooled over each note region.

  Args:
    x: Values to pool, [batch, time, dims] or [batch, time].
    note_mask: Binary note mask, [batch, time, notes].
    return_std: Also return the per-note standard deviation.

  Returns:
    Mean (and optionally std) pooled per note, [batch, notes, dims] (or
    [batch, notes] for 2-D input).
  """
  is_2d = x.ndim == 2
  if is_2d:
    x = x[:, :, jnp.newaxis]

  note_mask_d = note_mask[..., jnp.newaxis]  # [b, t, n, 1]
  note_lengths = jnp.sum(note_mask_d, axis=1)  # [b, n, 1]

  x_masked = x[:, :, jnp.newaxis, :] * note_mask_d  # [b, t, n, d]
  x_mean = safe_divide(jnp.sum(x_masked, axis=1), note_lengths)

  numerator = (x[:, :, jnp.newaxis, :] -
               x_mean[:, jnp.newaxis, :, :]) * note_mask_d
  numerator = jnp.sum(numerator**2.0, axis=1)
  x_std = safe_divide(numerator, note_lengths)**0.5

  x_mean = x_mean[:, :, 0] if is_2d else x_mean
  x_std = x_std[:, :, 0] if is_2d else x_std

  return (x_mean, x_std) if return_std else x_mean


def pool_over_notes(x: Array, note_mask: Array, return_std: bool = True):
  """Time-distributed per-note average of x.

  Args:
    x: Values to pool, [batch, time, dims].
    note_mask: Binary note mask, [batch, time, notes].
    return_std: Also return the note standard deviation (time-distributed).

  Returns:
    Pooled values [batch, time, dims] (mean, or (mean, std)).
  """
  x_notes, x_notes_std = get_note_moments(x, note_mask, return_std=True)
  x_time_notes = x_notes[:, jnp.newaxis, ...] * note_mask[..., jnp.newaxis]
  pooled_mean = jnp.sum(x_time_notes, axis=2)
  if return_std:
    x_time_std = (x_notes_std[:, jnp.newaxis, ...] *
                  note_mask[..., jnp.newaxis])
    return pooled_mean, jnp.sum(x_time_std, axis=2)
  return pooled_mean


def get_short_note_loss_mask(note_mask: Array, note_lengths: Array,
                             note_pitches: Array,
                             min_length: float = 40) -> Array:
  """Binary [batch, time] mask selecting notes shorter than min_length."""
  short_notes = jnp.logical_and(note_lengths < min_length,
                                note_pitches > 0.0).astype(jnp.float32)
  short_note_mask = note_mask * short_notes[:, jnp.newaxis, :]
  return jnp.sum(short_note_mask, axis=-1)
