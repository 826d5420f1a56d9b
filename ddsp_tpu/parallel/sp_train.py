"""Sequence-parallel training: train on audio longer than one chip's HBM.

A new capability beyond the reference (SURVEY.md section 5.7): the full
training step runs over a Mesh(('data', 'time')) with the audio time axis
sharded. Frame-rate control networks are cheap and compute replicated
across the 'time' axis; the audio-rate pipeline - harmonic synthesis
(phase-carry exchange), filtered noise + LTV/reverb filtering (overlap-add
halo exchange), and the multi-scale spectral loss (STFT halo exchange +
psum) - keeps every [batch, n_samples] intermediate sharded, so per-chip
memory is O(n_samples / n_time_shards). Gradients flow through the
collectives (their transposes are inserted by shard_map), and the gradient
all-reduce over 'data' is inserted by pjit as usual.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops import fftconv as fftconv_ops
from ddsp_tpu.parallel import time_shard

Array = jax.Array


def sp_synth_and_loss(mesh: Mesh,
                      target_audio: Array,
                      f0_hz: Array,
                      amps_raw: Array,
                      hd_raw: Array,
                      noise_raw: Array,
                      noise_ir: Array,
                      n_samples: int,
                      sample_rate: int = 16000,
                      fft_sizes=(2048, 1024, 512, 256, 128, 64),
                      mag_weight: float = 1.0,
                      logmag_weight: float = 1.0) -> Array:
  """Time-sharded synthesis + filtering + spectral loss.

  Args:
    mesh: Mesh with a 'time' axis (and optionally 'data').
    target_audio: [batch, n_samples], sharded or shardable P(None, 'time').
    f0_hz: [batch, n_frames, 1] frame-rate fundamental (replicated).
    amps_raw / hd_raw: Raw decoder outputs (exp_sigmoid applied here),
      [batch, n_frames, 1] / [batch, n_frames, n_harmonics].
    noise_raw: Raw filtered-noise magnitudes, [batch, n_frames, n_mags];
      turned into a frequency-sampled FIR applied to the noise IR input.
    noise_ir: Precomputed white-noise signal [batch, n_samples] (explicit
      PRNG: draw outside and reuse within the step).
    n_samples: Global audio length.
    sample_rate: Hz.
    fft_sizes / mag_weight / logmag_weight: Spectral loss config.

  Returns:
    Scalar loss (replicated).
  """
  amps = ops_core.exp_sigmoid(amps_raw)
  hd = ops_core.exp_sigmoid(hd_raw)

  harm = time_shard.time_sharded_harmonic_synthesis(
      mesh, f0_hz, amps, hd, n_samples=n_samples, sample_rate=sample_rate)

  # Filtered noise: frequency-sampled FIR from the magnitudes, applied to
  # the time-sharded white noise via the halo-exchanging convolution.
  mags = ops_core.exp_sigmoid(noise_raw - 5.0)
  ir = fftconv_ops.frequency_impulse_response(mags, window_size=0)
  noise = time_shard.time_sharded_fft_convolve(mesh, noise_ir, ir)

  audio = harm + noise
  return time_shard.time_sharded_spectral_loss(
      mesh, target_audio, audio, fft_sizes=fft_sizes,
      mag_weight=mag_weight, logmag_weight=logmag_weight)


def make_sp_train_step(mesh: Mesh,
                       decoder,
                       optimizer,
                       n_samples: int,
                       sample_rate: int = 16000,
                       fft_sizes=(2048, 1024, 512, 256, 128, 64)):
  """Build a jitted sequence-parallel train step.

  The decoder (a DictModule like RnnFcDecoder/FcStackDecoder emitting
  'amps', 'harmonic_distribution', 'noise_magnitudes') runs on frame-rate
  features (replicated over 'time'); everything audio-rate stays sharded.

  Args:
    mesh: Mesh(('data', 'time')).
    decoder: Control network module.
    optimizer: optax optimizer.
    n_samples: Global audio length per example.
    sample_rate: Hz.
    fft_sizes: Spectral loss sizes.

  Returns:
    (train_step, shard_batch): train_step(params, opt_state, batch, noise)
    -> (params, opt_state, loss); shard_batch places host arrays with
    audio sharded over ('data', 'time') and frames over ('data',).
  """
  audio_sharding = NamedSharding(mesh, P('data', 'time'))
  frame_sharding = NamedSharding(mesh, P('data'))

  def loss_fn(params, batch, noise):
    controls = decoder.apply({'params': params}, batch, training=True)
    return sp_synth_and_loss(
        mesh, batch['audio'], batch['f0_hz'], controls['amps'],
        controls['harmonic_distribution'], controls['noise_magnitudes'],
        noise, n_samples=n_samples, sample_rate=sample_rate,
        fft_sizes=fft_sizes)

  @functools.partial(jax.jit, donate_argnums=(0, 1))
  def train_step(params, opt_state, batch, noise):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch, noise)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    return params, opt_state, loss

  def shard_batch(batch: Dict[str, Any], noise: Any):
    out = {}
    for k, v in batch.items():
      v = jnp.asarray(v)
      sharding = audio_sharding if (v.ndim == 2 and
                                    v.shape[-1] == n_samples) else (
                                        frame_sharding)
      out[k] = jax.device_put(v, sharding)
    return out, jax.device_put(jnp.asarray(noise), audio_sharding)

  return train_step, shard_batch
