"""Vector quantization with EMA codebook updates (VQ-VAE).

Reference behavior: /root/reference/ddsp/training/nn.py
(VectorQuantization:1342): EMA cluster counts/sums, dead-code restart from
batch elements, straight-through quantization, commitment loss.

EMA statistics live in the 'vq_stats' mutable variable collection (the flax
analog of non-trainable tf.Variables); pass mutable=['vq_stats'] to apply()
during training. Dead-code restarts draw from the 'vq' PRNG stream.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_tpu.losses.spectral import mean_difference

Array = jax.Array


class VectorQuantization(nn.Module):
  """EMA vector quantizer with dead-codebook restarts.

  Attributes:
    k: Codebook size.
    gamma: EMA decay of the cluster counts/sums.
    restart_threshold: Restart centroids whose EMA count falls below
      threshold * n / k (0 restarts only never-used codes).
    num_heads: Split input depth into this many independent quantizations.
    commitment_loss_weight: Weight of the encoder commitment loss.
  """

  k: int
  gamma: float = 0.99
  restart_threshold: float = 0.0
  num_heads: int = 1
  commitment_loss_weight: float = 0.2

  @nn.compact
  def __call__(self, x: Array, training: bool = False) -> Tuple[Array, Array]:
    """Quantize x; returns (z, codes).

    Args:
      x: Input, [..., depth].
      training: Update EMA stats (requires mutable=['vq_stats'] and, for
        restarts, a 'vq' rng) and enable dead-code restarts.

    Returns:
      z: Quantized x (straight-through gradients), same shape.
      codes: Integer code indices, [..., num_heads].
    """
    depth = x.shape[-1]
    if depth % self.num_heads != 0:
      raise ValueError('Input depth must be a multiple of the number of '
                       'heads.')
    head_depth = depth // self.num_heads

    counts = self.variable('vq_stats', 'counts',
                           lambda: jnp.zeros((self.k,), jnp.float32))
    sums = self.variable('vq_stats', 'sums',
                         lambda: jnp.zeros((self.k, head_depth),
                                           jnp.float32))

    x_flat = jnp.reshape(x, (-1, depth))
    # Stack head segments along the batch axis.
    x_flat = jnp.concatenate(jnp.split(x_flat, self.num_heads, axis=1),
                             axis=0)
    n = x_flat.shape[0]

    ema_mean = sums.value / jnp.maximum(counts.value, 1e-12)[:, jnp.newaxis]
    ema_mean = jnp.where(counts.value[:, jnp.newaxis] > 0, ema_mean, 0.0)

    if training:
      # Restart centroids with too few assignments using batch elements
      # (uniform noise as fallback when the batch is smaller than the
      # number of restarts).
      keep = counts.value * self.k > self.restart_threshold * n
      if self.has_rng('vq'):
        key_u, key_s = jax.random.split(self.make_rng('vq'))
      else:
        key_u, key_s = jax.random.split(jax.random.PRNGKey(0))
      e_restart = jax.random.uniform(key_u, (self.k, head_depth))
      shuffled = jax.random.permutation(key_s, x_flat, axis=0)
      # Scatter the first min(k, n) batch rows into restart slots, in
      # restart order (matching tensor_scatter_nd_update semantics).
      restart_rank = jnp.cumsum((~keep).astype(jnp.int32)) - 1
      use_batch = jnp.logical_and(~keep, restart_rank < n)
      batch_rows = shuffled[jnp.clip(restart_rank, 0, n - 1)]
      e_restart = jnp.where(use_batch[:, jnp.newaxis], batch_rows,
                            e_restart)
      e = jnp.where(keep[:, jnp.newaxis], ema_mean, e_restart)
    else:
      e = ema_mean

    # Nearest centroid for each input vector.
    distances = (jnp.sum(x_flat**2, axis=1, keepdims=True) -
                 2 * x_flat @ e.T +
                 jnp.sum(e**2, axis=1)[jnp.newaxis, :])
    c = jnp.argmin(distances, axis=1)

    # Straight-through quantization.
    z = e[c]
    z = jnp.concatenate(jnp.split(z, self.num_heads, axis=0), axis=1)
    z = jnp.reshape(z, x.shape)
    z = x + jax.lax.stop_gradient(z - x)

    if training and not self.is_initializing():
      oh = jax.nn.one_hot(c, self.k, dtype=jnp.float32)
      batch_counts = jnp.sum(oh, axis=0)
      batch_sums = oh.T @ x_flat
      counts.value = counts.value - (1 - self.gamma) * (counts.value -
                                                        batch_counts)
      sums.value = sums.value - (1 - self.gamma) * (sums.value - batch_sums)

    c = jnp.stack(jnp.split(c, self.num_heads, axis=0), axis=1)
    c = jnp.reshape(c, x.shape[:-1] + (self.num_heads,))
    return z, c

  def unquantize(self, c: Array) -> Array:
    """Codes [..., num_heads] -> centroid vectors [..., depth]."""
    counts = self.get_variable('vq_stats', 'counts')
    sums = self.get_variable('vq_stats', 'sums')
    e = sums / jnp.maximum(counts, 1e-12)[:, jnp.newaxis]
    e = jnp.where(counts[:, jnp.newaxis] > 0, e, 0.0)
    z = e[c]  # [..., num_heads, head_depth]
    return jnp.reshape(z, c.shape[:-1] + (-1,))

  def commitment_loss(self, z: Array, z_q: Array) -> Array:
    """Encourage encoder outputs to stay close to their centroids."""
    loss = mean_difference(z, jax.lax.stop_gradient(z_q), loss_type='L2')
    return self.commitment_loss_weight * loss

  def get_losses_dict(self, z: Array, z_q: Array):
    name = self.name if self.name else 'vector_quantization'
    return {name + '_commitment_loss': self.commitment_loss(z, z_q)}
