"""Differentiable Two-way Mismatch (TWM) loss.

Reference behavior: /root/reference/ddsp/losses.py (TWMLoss:820,
get_loss_tensors:946, predict_f0:924).

A probabilistic, differentiable adaptation of the Maher & Beauchamp (1993)
two-way mismatch f0 estimator: for each f0 candidate, score
-log p(sinusoids | candidate harmonics) - log p(harmonics | sinusoids) with
gaussian mixtures, then softmin over candidates. Gaussian mixtures are
hand-rolled in jnp (see consistency.mixture_log_prob).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.losses.consistency import mixture_log_prob
from ddsp_tpu.losses.spectral import Loss
from ddsp_tpu.ops.core import hz_to_midi, safe_divide

Array = jax.Array


class TWMLoss(Loss):
  """Encourages sinusoids to be harmonics of the best f0 candidate.

  Attributes:
    sinusoids_weight: Weight for the -log p(sinusoids|harmonics) term.
    harmonics_weight: Weight for the -log p(harmonics|sinusoids) term.
    sinusoids_scale: Stddev of gaussians around each sinusoid (MIDI).
    harmonics_scale: Stddev of gaussians around each harmonic (ratio).
    n_harmonic_points: Harmonic points per candidate for
      p(harmonics|sinusoids).
    n_harmonic_gaussians: Gaussians per candidate for
      p(sinusoids|harmonics).
    softmin_temperature: Lower values focus more on the single best
      candidate.
    sample_rate: Hz, to ignore harmonics above nyquist.
  """

  sinusoids_weight: float = 1.0
  harmonics_weight: float = 1.0
  sinusoids_scale: float = 0.5
  harmonics_scale: float = 0.2
  n_harmonic_points: int = 10
  n_harmonic_gaussians: int = 30
  softmin_temperature: float = 1.0
  sample_rate: int = 16000

  def __call__(self, f0_candidates: Array, freqs: Array,
               amps: Array) -> Array:
    """Returns the TWM loss scalar.

    Args:
      f0_candidates: Candidate frequencies in hertz, [batch, time, c].
      freqs: Sinusoid frequencies in hertz, [batch, time, freq].
      amps: Sinusoid amplitudes (> 0), [batch, time, freq].
    """
    sinusoids_loss, harmonics_loss = self.get_loss_tensors(
        f0_candidates, freqs, amps)
    combined_loss = (self.sinusoids_weight * sinusoids_loss +
                     self.harmonics_weight * harmonics_loss)
    # Softmin over candidates keeps the loss differentiable while focusing
    # on the best (lowest-cost) f0 candidate.
    softmin_loss = combined_loss * jax.nn.softmax(
        -combined_loss / self.softmin_temperature, axis=-1)
    return jnp.mean(softmin_loss)

  def predict_f0(self, f0_candidates, freqs, amps) -> np.ndarray:
    """Most likely f0 among the candidates (non-differentiable, numpy)."""
    sinusoids_loss, harmonics_loss = self.get_loss_tensors(
        f0_candidates, freqs, amps)
    loss = np.asarray(self.sinusoids_weight * sinusoids_loss +
                      self.harmonics_weight * harmonics_loss)
    f0_idx = np.nanargmin(loss, axis=-1)[..., np.newaxis]
    return np.take_along_axis(np.asarray(f0_candidates), f0_idx, axis=-1)

  def get_loss_tensors(self, f0_candidates: Array, freqs: Array,
                       amps: Array):
    """Per-candidate loss traces, both shape [batch, time, candidate]."""
    # ----- P(sinusoids | candidate_harmonics) -----
    # Uniform mixture of gaussians at integer harmonic numbers, evaluated at
    # each sinusoid's frequency ratio to the candidate.
    freq_ratios = safe_divide(freqs[:, :, jnp.newaxis, :],
                              f0_candidates[:, :, :, jnp.newaxis])
    harm_locs = jnp.arange(1, self.n_harmonic_gaussians + 1,
                           dtype=jnp.float32)
    harm_probs = jnp.full((self.n_harmonic_gaussians,),
                          1.0 / self.n_harmonic_gaussians)
    # [batch, time, candidate, partial]
    nll_sinusoids = -mixture_log_prob(freq_ratios, harm_probs, harm_locs,
                                      self.harmonics_scale)

    a = amps[:, :, jnp.newaxis, :]
    # Weighted mean by sinusoid amplitude -> [batch, time, candidate].
    sinusoids_loss = safe_divide(jnp.sum(nll_sinusoids * a, axis=-1),
                                 jnp.sum(a, axis=-1))

    # ----- P(candidate_harmonics | sinusoids) -----
    # Gaussian KDE at each sinusoid (MIDI, amp-weighted), evaluated at each
    # candidate's harmonic series.
    harmonics = self.get_candidate_harmonics(f0_candidates, as_midi=True)

    sinusoids_midi = hz_to_midi(freqs)
    amps_pos = jnp.where(amps == 0.0, 1e-7, amps)
    probs = safe_divide(amps_pos, jnp.sum(amps_pos, axis=-1, keepdims=True))

    b, t, c, h = harmonics.shape
    harmonics_flat = jnp.reshape(harmonics, (b, t, c * h))
    nll_harmonics = -mixture_log_prob(harmonics_flat, probs, sinusoids_midi,
                                      self.sinusoids_scale)
    nll_harmonics = jnp.reshape(nll_harmonics, (b, t, c, h))

    # Prior decreasing importance of upper harmonics.
    amps_prior = jnp.linspace(1.0, 1.0 / self.n_harmonic_points,
                              self.n_harmonic_points)
    harmonics_loss = nll_harmonics * amps_prior

    # Mask harmonics above nyquist, reweighting by the fraction kept so the
    # loss doesn't just favor the highest candidate.
    nyquist_midi = hz_to_midi(self.sample_rate / 2.0)
    nyquist_mask = (harmonics < nyquist_midi).astype(jnp.float32)
    harmonics_loss *= safe_divide(
        nyquist_mask, jnp.mean(nyquist_mask, axis=-1, keepdims=True))

    harmonics_loss = jnp.mean(harmonics_loss, axis=-1)
    return sinusoids_loss, harmonics_loss

  def get_candidate_harmonics(self, f0_candidates: Array,
                              as_midi: bool = True) -> Array:
    """Harmonic series off each candidate, [batch, time, cand, harmonic]."""
    n = jnp.arange(1, self.n_harmonic_points + 1, dtype=jnp.float32)
    harmonics = f0_candidates[:, :, :, jnp.newaxis] * n
    if as_midi:
      harmonics = hz_to_midi(harmonics)
    return harmonics
