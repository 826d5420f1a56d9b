"""Consistency losses on synthesizer controls and sinusoid traces.

Reference behavior: /root/reference/ddsp/losses.py (amp_loss:492,
freq_loss:507, FilteredNoiseConsistencyLoss:517, HarmonicConsistencyLoss:534,
WassersteinConsistencyLoss:585, wasserstein_distance:632,
KDEConsistencyLoss:690).

Gaussian mixtures are hand-rolled in jnp (logsumexp over components) rather
than depending on a distributions library; everything traces into one XLA
program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ddsp_tpu.ops.core import hz_to_midi, log10, safe_divide
from ddsp_tpu.losses.spectral import Loss, mean_difference

Array = jax.Array

_LOG_2PI = 1.8378770664093453


def normal_log_prob(x: Array, loc: Array, scale) -> Array:
  """Log-density of a univariate normal, broadcasting over inputs."""
  z = (x - loc) / scale
  return -0.5 * (z * z + _LOG_2PI) - jnp.log(jnp.asarray(scale, x.dtype))


def mixture_log_prob(x: Array, probs: Array, locs: Array, scale) -> Array:
  """Log-density of a mixture of normals along the last component axis.

  Args:
    x: Evaluation points, shape [..., n_points].
    probs: Mixture weights (sum to 1 along last axis), shape [..., n_comp].
    locs: Component means, shape [..., n_comp].
    scale: Component stddev, scalar or broadcastable to locs.

  Returns:
    log p(x), shape [..., n_points].
  """
  # [..., n_points, n_comp]
  component_ll = normal_log_prob(x[..., :, jnp.newaxis],
                                 locs[..., jnp.newaxis, :], scale)
  log_w = jnp.log(jnp.maximum(probs, 1e-37))[..., jnp.newaxis, :]
  return jax.nn.logsumexp(component_ll + log_w, axis=-1)


def amp_loss(amp: Array, amp_target: Array, loss_type: str = 'L1',
             weights: Optional[Array] = None, log: bool = False,
             amin: float = 1e-5) -> Array:
  """Loss comparing two amplitudes (optionally on a log scale)."""
  if log:
    amp = log10(jnp.maximum(amin, amp))
    amp_target = log10(jnp.maximum(amin, amp_target))
  return mean_difference(amp, amp_target, loss_type, weights)


def freq_loss(f_hz: Array, f_hz_target: Array, loss_type: str = 'L1',
              weights: Optional[Array] = None) -> Array:
  """Loss comparing two frequencies on a MIDI (log) scale."""
  return mean_difference(hz_to_midi(f_hz), hz_to_midi(f_hz_target),
                         loss_type, weights)


class FilteredNoiseConsistencyLoss(Loss):
  """Consistency loss between two sets of filtered-noise magnitudes."""

  weight: float = 1.0

  def __call__(self, noise_magnitudes: Array,
               noise_magnitudes_target: Array) -> Array:
    return self.weight * amp_loss(noise_magnitudes, noise_magnitudes_target)


class HarmonicConsistencyLoss(Loss):
  """Consistency losses between two sets of harmonic synth controls.

  Returns a dict of losses (amp, distribution, f0), masking the
  distribution/f0 terms where the target amplitude is below threshold.
  """

  amp_weight: float = 1.0
  dist_weight: float = 1.0
  f0_weight: float = 1.0
  amp_threshold: float = 1e-4

  def __call__(self, harm_amp: Array, harm_amp_target: Array,
               harm_dist: Array, harm_dist_target: Array,
               f0_hz: Array, f0_hz_target: Array):
    # Mask loss where target audio is below threshold amplitude.
    weights = (harm_amp_target >= self.amp_threshold).astype(jnp.float32)
    return {
        'harm_amp_loss':
            self.amp_weight * amp_loss(harm_amp, harm_amp_target),
        'harm_dist_loss':
            self.dist_weight * amp_loss(harm_dist, harm_dist_target,
                                        weights=weights),
        'f0_hz_loss':
            self.f0_weight * freq_loss(f0_hz, f0_hz_target, weights=weights),
    }

  def get_losses_dict(self, *args, **kwargs):
    return self(*args, **kwargs)


def wasserstein_distance(u_values: Array, v_values: Array,
                         u_weights: Optional[Array] = None,
                         v_weights: Optional[Array] = None,
                         p: float = 1.0) -> Array:
  """Differentiable 1-D Wasserstein distance between weighted samples.

  Same CDF construction as scipy.stats.wasserstein_distance, batched over
  leading axes. Shapes [..., n_samples] -> [...].
  """
  u_sorted = jnp.sort(u_values, axis=-1)
  v_sorted = jnp.sort(v_values, axis=-1)

  all_values = jnp.sort(jnp.concatenate([u_values, v_values], axis=-1),
                        axis=-1)
  deltas = jnp.diff(all_values, axis=-1)

  # Positions of the pooled values within each distribution's sorted samples.
  search = jax.vmap(lambda a, v: jnp.searchsorted(a, v, side='right'))
  flat = lambda x: jnp.reshape(x, (-1, x.shape[-1]))
  batch_shape = all_values.shape[:-1]
  u_cdf_indices = search(flat(u_sorted), flat(all_values[..., :-1]))
  v_cdf_indices = search(flat(v_sorted), flat(all_values[..., :-1]))
  u_cdf_indices = jnp.reshape(u_cdf_indices, batch_shape + (-1,))
  v_cdf_indices = jnp.reshape(v_cdf_indices, batch_shape + (-1,))

  def weighted_cdf(values, sorter_weights, cdf_indices, n):
    if sorter_weights is None:
      return cdf_indices / float(n)
    cumweights = jnp.concatenate(
        [jnp.zeros_like(sorter_weights[..., :1]),
         jnp.cumsum(sorter_weights, axis=-1)], axis=-1)
    cdf = jnp.take_along_axis(cumweights, cdf_indices, axis=-1)
    return safe_divide(cdf, cumweights[..., -1:])

  if u_weights is not None:
    u_sorter = jnp.argsort(u_values, axis=-1)
    u_w_sorted = jnp.take_along_axis(u_weights, u_sorter, axis=-1)
  else:
    u_w_sorted = None
  if v_weights is not None:
    v_sorter = jnp.argsort(v_values, axis=-1)
    v_w_sorted = jnp.take_along_axis(v_weights, v_sorter, axis=-1)
  else:
    v_w_sorted = None

  u_cdf = weighted_cdf(u_values, u_w_sorted, u_cdf_indices,
                       u_values.shape[-1])
  v_cdf = weighted_cdf(v_values, v_w_sorted, v_cdf_indices,
                       v_values.shape[-1])

  integral = jnp.sum(deltas * jnp.abs(u_cdf - v_cdf)**p, axis=-1)
  return integral**(1.0 / p)


class WassersteinConsistencyLoss(Loss):
  """Wasserstein distance between two amplitude-weighted sinusoid traces."""

  weight: float = 1.0
  midi: bool = True

  def __call__(self, amps_a: Array, freqs_a: Array,
               amps_b: Array, freqs_b: Array) -> Array:
    loss = 0.0
    if self.weight > 0.0 and self.midi:
      freqs_a = hz_to_midi(freqs_a)
      freqs_b = hz_to_midi(freqs_b)
      loss = wasserstein_distance(freqs_a, freqs_b, amps_a, amps_b, p=1.0)
      loss = jnp.mean(self.weight * loss)
    return loss


class KDEConsistencyLoss(Loss):
  """Two-way gaussian-KDE NLL between two sinusoid traces (Jeffreys-like).

  Each trace's sinusoids define a gaussian mixture in MIDI space (weights =
  normalized amplitudes); the loss is the amplitude-weighted NLL of each
  trace under the other's mixture, plus a mean-amplitude matching term.
  """

  weight_a: float = 1.0
  weight_b: float = 1.0
  weight_mean_amp: float = 1.0
  scale_a: float = 0.1
  scale_b: float = 0.1

  def __call__(self, amps_a: Array, freqs_a: Array,
               amps_b: Array, freqs_b: Array) -> Array:
    loss = 0.0
    if self.weight_a > 0.0:
      loss += jnp.mean(self.weight_a * self.nll(
          amps_a, freqs_a, amps_b, freqs_b, self.scale_b))
    if self.weight_b > 0.0:
      loss += jnp.mean(self.weight_b * self.nll(
          amps_b, freqs_b, amps_a, freqs_a, self.scale_a))
    if self.weight_mean_amp > 0.0:
      mean_amp_a = jnp.mean(amps_a, axis=-1)
      mean_amp_b = jnp.mean(amps_b, axis=-1)
      loss += self.weight_mean_amp * jnp.mean(jnp.abs(mean_amp_a -
                                                      mean_amp_b))
    return loss

  def nll(self, amps: Array, freqs: Array, amps_target: Array,
          freqs_target: Array, scale_target: float) -> Array:
    """Amplitude-weighted -log p(source sinusoids | target KDE).

    Shapes [batch, time, freq] -> [batch, time].
    """
    freqs_target_midi = hz_to_midi(freqs_target)
    amps_target = jnp.where(amps_target == 0.0, 1e-7, amps_target)
    probs = safe_divide(amps_target,
                        jnp.sum(amps_target, axis=-1, keepdims=True))

    freqs_midi = hz_to_midi(freqs)
    nll = -mixture_log_prob(freqs_midi, probs, freqs_target_midi,
                            scale_target)

    amps_norm = safe_divide(amps, jnp.sum(amps, axis=-1, keepdims=True))
    return jnp.mean(nll * amps_norm, axis=-1)
