"""Shard-vs-single-device equivalence tests for time-axis sharding.

The correctness bar for the sequence-parallel kernels: N-shard results
must equal the 1-device ops within float tolerance, for forward AND
gradients (halo exchange must transpose correctly).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import ops
from ddsp_tpu.parallel import create_mesh
from ddsp_tpu.parallel import time_shard


def time_mesh(n_time):
  return create_mesh(n_data=1, n_time=n_time)


@pytest.mark.parametrize('n_shards', [2, 4, 8])
def test_sharded_phase_cumsum_matches_single_device(n_shards):
  rng = np.random.RandomState(0)
  omega = (0.1 * rng.rand(2, 8000, 1)).astype(np.float32)
  mesh = time_mesh(n_shards)

  from jax.sharding import PartitionSpec as P
  sharded = jax.jit(jax.shard_map(
      time_shard.local_phase_cumsum, mesh=mesh,
      in_specs=P(None, 'time'), out_specs=P(None, 'time')))(omega)
  single = jnp.cumsum(jnp.asarray(omega), axis=1)
  # Phases agree on the circle (the carry is kept mod 2*pi).
  np.testing.assert_allclose(np.sin(np.asarray(sharded)),
                             np.sin(np.asarray(single)), atol=2e-3)
  np.testing.assert_allclose(np.cos(np.asarray(sharded)),
                             np.cos(np.asarray(single)), atol=2e-3)


@pytest.mark.parametrize('n_shards', [2, 4])
def test_sharded_harmonic_synthesis_matches_single_device(n_shards):
  rng = np.random.RandomState(1)
  batch, n_frames, n_samples, n_harm = 2, 20, 8000, 8
  f0 = (200.0 + 100.0 * rng.rand(batch, n_frames, 1)).astype(np.float32)
  amps = rng.rand(batch, n_frames, 1).astype(np.float32)
  hd = rng.rand(batch, n_frames, n_harm).astype(np.float32)
  hd /= hd.sum(-1, keepdims=True)

  single = np.asarray(ops.harmonic_synthesis(
      f0, amps, harmonic_distribution=hd, n_samples=n_samples))

  mesh = time_mesh(n_shards)
  sharded = np.asarray(time_shard.time_sharded_harmonic_synthesis(
      mesh, f0, amps, hd, n_samples=n_samples))

  assert sharded.shape == single.shape
  np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_sharded_harmonic_non_hop_aligned_matches_single_device():
  # hop = 8000 / 25 = 320; t_local = 8000 / 4 = 2000 is NOT a multiple of
  # 320, so this exercises the general-offset gather path for both the
  # 'window' (amps) and 'linear' (f0) envelopes.
  rng = np.random.RandomState(3)
  batch, n_frames, n_samples, n_harm = 2, 25, 8000, 6
  f0 = (200.0 + 100.0 * rng.rand(batch, n_frames, 1)).astype(np.float32)
  amps = rng.rand(batch, n_frames, 1).astype(np.float32)
  hd = rng.rand(batch, n_frames, n_harm).astype(np.float32)
  hd /= hd.sum(-1, keepdims=True)

  single = np.asarray(ops.harmonic_synthesis(
      f0, amps, harmonic_distribution=hd, n_samples=n_samples))
  mesh = time_mesh(4)
  sharded = np.asarray(time_shard.time_sharded_harmonic_synthesis(
      mesh, f0, amps, hd, n_samples=n_samples))
  assert sharded.shape == single.shape
  np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_sharded_harmonic_non_hop_aligned_stays_memory_sharded():
  # The non-aligned path must never materialize the global envelope: the
  # compiled per-device program may hold 2000-long (t_local) buffers but
  # never an 8000-long (n_samples) one.
  batch, n_frames, n_samples, n_harm = 2, 25, 8000, 6
  rng = np.random.RandomState(4)
  f0 = (200.0 + 100.0 * rng.rand(batch, n_frames, 1)).astype(np.float32)
  amps = rng.rand(batch, n_frames, 1).astype(np.float32)
  hd = rng.rand(batch, n_frames, n_harm).astype(np.float32)
  mesh = time_mesh(4)

  compiled = jax.jit(lambda f, a, h: time_shard.time_sharded_harmonic_synthesis(
      mesh, f, a, h, n_samples=n_samples)).lower(f0, amps, hd).compile()
  hlo = '\n'.join(m.to_string()
                  for m in compiled.runtime_executable().hlo_modules())
  assert f'{n_samples}]' not in hlo and f'{n_samples},' not in hlo, (
      'non-hop-aligned SP synthesis materialized a global-time-axis buffer')


def test_sharded_harmonic_non_integer_hop_raises():
  # 8000 / 30 is not an integer hop: there is no memory-sharded upsample,
  # and silently computing the dense envelope is forbidden.
  batch, n_frames, n_samples = 1, 30, 8000
  f0 = (220.0 * np.ones((batch, n_frames, 1))).astype(np.float32)
  amps = np.ones((batch, n_frames, 1), np.float32)
  mesh = time_mesh(4)
  with pytest.raises(ValueError, match='memory-sharded'):
    time_shard.time_sharded_harmonic_synthesis(
        mesh, f0, amps, None, n_samples=n_samples)


def test_sharded_harmonic_synthesis_gradients_match():
  rng = np.random.RandomState(2)
  batch, n_frames, n_samples, n_harm = 1, 10, 4000, 4
  f0 = (300.0 * np.ones((batch, n_frames, 1))).astype(np.float32)
  amps = rng.rand(batch, n_frames, 1).astype(np.float32)
  hd = rng.rand(batch, n_frames, n_harm).astype(np.float32)
  hd /= hd.sum(-1, keepdims=True)
  mesh = time_mesh(4)

  def loss_single(amps, hd):
    audio = ops.harmonic_synthesis(f0, amps, harmonic_distribution=hd,
                                   n_samples=n_samples)
    return jnp.mean(audio**2)

  def loss_sharded(amps, hd):
    audio = time_shard.time_sharded_harmonic_synthesis(
        mesh, f0, amps, hd, n_samples=n_samples)
    return jnp.mean(audio**2)

  g_single = jax.grad(loss_single, argnums=(0, 1))(amps, hd)
  g_sharded = jax.grad(loss_sharded, argnums=(0, 1))(amps, hd)
  for gs, gd in zip(g_single, g_sharded):
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize('n_shards,n_ir_frames,ir_size', [
    (2, 8, 64),     # LTV small IR
    (4, 8, 64),
    (4, 4, 2000),   # long IR: tail spans multiple shards
    (8, 8, 257),    # typical filtered-noise window
])
def test_sharded_fft_convolve_matches_single_device(n_shards, n_ir_frames,
                                                    ir_size):
  rng = np.random.RandomState(3)
  batch, t = 2, 8000
  audio = rng.randn(batch, t).astype(np.float32)
  ir = (rng.randn(batch, n_ir_frames, ir_size) *
        np.hanning(ir_size)).astype(np.float32)

  single = np.asarray(ops.fft_convolve(audio, ir, padding='same',
                                       delay_compensation=-1))
  mesh = time_mesh(n_shards)
  sharded = np.asarray(time_shard.time_sharded_fft_convolve(
      mesh, audio, ir, delay_compensation=-1))

  assert sharded.shape == single.shape
  np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_sharded_fft_convolve_delay_spans_shards():
  """The canonical 48000-tap reverb IR at 8 shards: the group delay
  (~24000) spans 3 shard lengths (8000), so the left-halo ring must run
  multiple steps. Values and gradients must match single-device."""
  rng = np.random.RandomState(7)
  batch, t, ir_size = 1, 64000, 48000
  audio = rng.randn(batch, t).astype(np.float32)
  ir = (rng.randn(batch, 1, ir_size) *
        np.exp(-np.arange(ir_size) / 4000.0) * 0.3).astype(np.float32)
  mesh = time_mesh(8)

  single = np.asarray(ops.fft_convolve(audio, ir, padding='same',
                                       delay_compensation=-1))
  sharded = np.asarray(time_shard.time_sharded_fft_convolve(
      mesh, audio, ir, delay_compensation=-1))
  np.testing.assert_allclose(sharded, single, atol=5e-4)

  def loss_single(audio, ir):
    return jnp.mean(ops.fft_convolve(audio, ir, padding='same')**2)

  def loss_sharded(audio, ir):
    return jnp.mean(
        time_shard.time_sharded_fft_convolve(mesh, audio, ir)**2)

  g_single = jax.grad(loss_single, argnums=(0, 1))(audio, ir)
  g_sharded = jax.grad(loss_sharded, argnums=(0, 1))(audio, ir)
  for gs, gd in zip(g_single, g_sharded):
    scale = np.abs(np.asarray(gs)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(gd) / scale,
                               np.asarray(gs) / scale, atol=1e-4)


def test_sharded_fft_convolve_zero_delay_compensation():
  """delay_compensation=0 (the Reverb setting) also matches."""
  rng = np.random.RandomState(4)
  batch, t = 1, 8000
  audio = rng.randn(batch, t).astype(np.float32)
  ir = (rng.randn(batch, 1, 3000) * 0.1).astype(np.float32)

  single = np.asarray(ops.fft_convolve(audio, ir, padding='same',
                                       delay_compensation=0))
  mesh = time_mesh(4)
  sharded = np.asarray(time_shard.time_sharded_fft_convolve(
      mesh, audio, ir, delay_compensation=0))
  np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_sharded_fft_convolve_gradients_match():
  rng = np.random.RandomState(5)
  batch, t, n_frames, ir_size = 1, 4000, 4, 200
  audio = rng.randn(batch, t).astype(np.float32)
  ir = (rng.randn(batch, n_frames, ir_size) * 0.1).astype(np.float32)
  mesh = time_mesh(4)

  def loss_single(audio, ir):
    return jnp.mean(ops.fft_convolve(audio, ir, padding='same')**2)

  def loss_sharded(audio, ir):
    return jnp.mean(
        time_shard.time_sharded_fft_convolve(mesh, audio, ir)**2)

  g_single = jax.grad(loss_single, argnums=(0, 1))(audio, ir)
  g_sharded = jax.grad(loss_sharded, argnums=(0, 1))(audio, ir)
  for gs, gd in zip(g_single, g_sharded):
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gs),
                               atol=1e-4, rtol=1e-3)


class TestTimeShardedSpectralLoss:

  def _mesh(self, n_time):
    import jax
    from ddsp_tpu.parallel import create_mesh
    return create_mesh(n_data=1, n_time=n_time,
                       devices=jax.devices()[:n_time])

  def test_matches_single_device(self):
    import jax.numpy as jnp
    from ddsp_tpu import losses
    from ddsp_tpu.parallel import time_shard
    rng = np.random.RandomState(0)
    target = rng.randn(2, 16384).astype(np.float32) * 0.1
    audio = target * 0.8 + 0.01 * rng.randn(2, 16384).astype(np.float32)

    sizes = (2048, 512, 64)
    ref = float(losses.SpectralLoss(fft_sizes=sizes, mag_weight=1.0,
                                    logmag_weight=1.0)(
                                        jnp.asarray(target),
                                        jnp.asarray(audio)))
    for n_time in (2, 4):
      mesh = self._mesh(n_time)
      got = float(time_shard.time_sharded_spectral_loss(
          mesh, jnp.asarray(target), jnp.asarray(audio), fft_sizes=sizes,
          mag_weight=1.0, logmag_weight=1.0))
      np.testing.assert_allclose(got, ref, rtol=2e-5)

  def test_all_six_terms_match_single_device(self):
    import jax.numpy as jnp
    from ddsp_tpu import losses
    from ddsp_tpu.parallel import time_shard
    rng = np.random.RandomState(3)
    target = rng.randn(2, 16384).astype(np.float32) * 0.1
    audio = target * 0.7 + 0.02 * rng.randn(2, 16384).astype(np.float32)

    sizes = (2048, 512, 64)
    weights = dict(mag_weight=1.0, delta_time_weight=0.5,
                   delta_freq_weight=0.4, cumsum_freq_weight=0.3,
                   logmag_weight=1.0, loudness_weight=0.2)
    ref = float(losses.SpectralLoss(fft_sizes=sizes, **weights)(
        jnp.asarray(target), jnp.asarray(audio)))
    for n_time in (2, 4, 8):
      mesh = self._mesh(n_time)
      got = float(time_shard.time_sharded_spectral_loss(
          mesh, jnp.asarray(target), jnp.asarray(audio), fft_sizes=sizes,
          **weights))
      np.testing.assert_allclose(got, ref, rtol=2e-4)

  def test_extra_terms_gradients_match(self):
    import jax
    import jax.numpy as jnp
    from ddsp_tpu import losses
    from ddsp_tpu.parallel import time_shard
    rng = np.random.RandomState(4)
    target = jnp.asarray(rng.randn(1, 8192).astype(np.float32) * 0.1)
    audio = jnp.asarray(rng.randn(1, 8192).astype(np.float32) * 0.1)
    sizes = (2048, 512)
    weights = dict(mag_weight=0.0, delta_time_weight=1.0,
                   delta_freq_weight=1.0, cumsum_freq_weight=1.0,
                   loudness_weight=1.0)

    g_ref = jax.grad(lambda a: losses.SpectralLoss(
        fft_sizes=sizes, **weights)(target, a))(audio)
    mesh = self._mesh(4)
    g_sp = jax.grad(lambda a: time_shard.time_sharded_spectral_loss(
        mesh, target, a, fft_sizes=sizes, **weights))(audio)
    scale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_sp) / scale,
                               np.asarray(g_ref) / scale, atol=1e-4)

  def test_gradients_match(self):
    import jax
    import jax.numpy as jnp
    from ddsp_tpu import losses
    from ddsp_tpu.parallel import time_shard
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.randn(1, 8192).astype(np.float32) * 0.1)
    audio = jnp.asarray(rng.randn(1, 8192).astype(np.float32) * 0.1)
    sizes = (512, 64)

    g_ref = jax.grad(lambda a: losses.SpectralLoss(
        fft_sizes=sizes, mag_weight=1.0)(target, a))(audio)
    mesh = self._mesh(4)
    g_sp = jax.grad(lambda a: time_shard.time_sharded_spectral_loss(
        mesh, target, a, fft_sizes=sizes, mag_weight=1.0))(audio)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=1e-6)


class TestSequenceParallelTraining:

  def test_sp_train_step_runs_and_learns(self):
    import jax
    import jax.numpy as jnp
    import optax
    from ddsp_tpu import nn as dnn
    from ddsp_tpu.parallel import create_mesh, make_sp_train_step

    n_data, n_time = 2, 4
    mesh = create_mesh(n_data=n_data, n_time=n_time,
                       devices=jax.devices()[:n_data * n_time])
    n_frames, hop = 16, 512
    n_samples = n_frames * hop  # 8192, sharded 2048/time-shard

    rng = np.random.RandomState(0)
    sr = 16000
    t = np.arange(n_samples) / sr
    target = (0.3 * np.sin(2 * np.pi * 220 * t) +
              3e-3 * rng.randn(n_samples)).astype(np.float32)
    batch = {
        'audio': np.stack([target] * n_data),
        'f0_hz': np.full((n_data, n_frames, 1), 220.0, np.float32),
        'ld_scaled': np.full((n_data, n_frames, 1), 0.6, np.float32),
        'f0_scaled': np.full((n_data, n_frames, 1), 0.55, np.float32),
    }
    noise = rng.uniform(-1, 1, (n_data, n_samples)).astype(np.float32)

    decoder = dnn.FcStackDecoder(
        ch=16, layers_per_stack=1,
        input_keys=('ld_scaled', 'f0_scaled'),
        output_splits=(('amps', 1), ('harmonic_distribution', 8),
                       ('noise_magnitudes', 5)))
    params = decoder.init(jax.random.PRNGKey(0), batch)['params']
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    train_step, shard_batch = make_sp_train_step(
        mesh, decoder, optimizer, n_samples=n_samples,
        fft_sizes=(512, 64))
    sharded, noise_dev = shard_batch(batch, noise)

    losses = []
    for _ in range(10):
      params, opt_state, loss = train_step(params, opt_state, sharded,
                                           noise_dev)
      losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses

  def test_sp_loss_matches_unsharded_pipeline(self):
    import jax
    import jax.numpy as jnp
    from ddsp_tpu import losses as losses_lib, ops
    from ddsp_tpu.parallel import create_mesh, sp_synth_and_loss

    mesh = create_mesh(n_data=1, n_time=4, devices=jax.devices()[:4])
    rng = np.random.RandomState(3)
    n_frames, n_samples = 8, 4096
    f0 = np.full((1, n_frames, 1), 330.0, np.float32)
    amps_raw = rng.randn(1, n_frames, 1).astype(np.float32)
    hd_raw = rng.randn(1, n_frames, 6).astype(np.float32)
    noise_raw = rng.randn(1, n_frames, 5).astype(np.float32)
    noise_sig = rng.uniform(-1, 1, (1, n_samples)).astype(np.float32)
    target = (0.1 * rng.randn(1, n_samples)).astype(np.float32)
    sizes = (512, 64)

    sp = float(sp_synth_and_loss(
        mesh, jnp.asarray(target), jnp.asarray(f0), jnp.asarray(amps_raw),
        jnp.asarray(hd_raw), jnp.asarray(noise_raw),
        jnp.asarray(noise_sig), n_samples=n_samples, fft_sizes=sizes))

    # Unsharded reference with identical math.
    amps = ops.exp_sigmoid(jnp.asarray(amps_raw))
    hd = ops.exp_sigmoid(jnp.asarray(hd_raw))
    harm = ops.harmonic_synthesis(jnp.asarray(f0), amps,
                                  harmonic_distribution=hd,
                                  n_samples=n_samples)
    mags = ops.exp_sigmoid(jnp.asarray(noise_raw) - 5.0)
    ir = ops.frequency_impulse_response(mags, window_size=0)
    noise = ops.fft_convolve(jnp.asarray(noise_sig), ir, padding='same')
    audio = harm + noise
    ref = float(losses_lib.SpectralLoss(fft_sizes=sizes, mag_weight=1.0,
                                        logmag_weight=1.0)(
                                            jnp.asarray(target), audio))
    # The logmag term amplifies float differences between the sharded
    # (wrapped per-shard phase carries) and unsharded (plain cumsum) paths
    # on near-silent bins; 2% agreement of the scalar is the right bar
    # (the audio itself matches to 1e-4 - see the fft_convolve and
    # harmonic-synthesis shard-equality tests above).
    np.testing.assert_allclose(sp, ref, rtol=2e-2)


class TestDataParallelComposition:
  """The wrappers must shard the batch over 'data', not replicate it.

  Regression tests for a bug where every in_spec used P(None, 'time'):
  values were right but each device all-gathered and processed the FULL
  global batch, defeating the DP x SP composition sp_train sets up."""

  def _mesh(self, n_data, n_time):
    return create_mesh(n_data=n_data, n_time=n_time,
                       devices=jax.devices()[:n_data * n_time])

  def test_synthesis_output_batch_sharded_over_data(self):
    from jax.sharding import PartitionSpec as P
    rng = np.random.RandomState(0)
    batch, n_frames, n_samples = 4, 10, 4000
    f0 = np.full((batch, n_frames, 1), 220.0, np.float32)
    amps = rng.rand(batch, n_frames, 1).astype(np.float32)
    hd = rng.rand(batch, n_frames, 4).astype(np.float32)
    hd /= hd.sum(-1, keepdims=True)

    mesh = self._mesh(2, 4)
    out = time_shard.time_sharded_harmonic_synthesis(
        mesh, f0, amps, hd, n_samples=n_samples)
    assert out.sharding.spec == P('data', 'time'), out.sharding.spec

    single = np.asarray(ops.harmonic_synthesis(
        f0, amps, harmonic_distribution=hd, n_samples=n_samples))
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-3)

  def test_fft_convolve_dp_values_and_sharding(self):
    from jax.sharding import PartitionSpec as P
    rng = np.random.RandomState(1)
    batch, t, ir_size = 4, 4000, 64
    audio = rng.randn(batch, t).astype(np.float32)
    ir = (rng.randn(batch, 4, ir_size) *
          np.hanning(ir_size)).astype(np.float32)

    mesh = self._mesh(2, 4)
    out = time_shard.time_sharded_fft_convolve(mesh, audio, ir)
    assert out.sharding.spec == P('data', 'time'), out.sharding.spec
    single = np.asarray(ops.fft_convolve(audio, ir, padding='same'))
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-4)

  def test_spectral_loss_dp_matches_single_device(self):
    rng = np.random.RandomState(2)
    batch = 4
    target = rng.randn(batch, 4096).astype(np.float32) * 0.1
    audio = target * 0.7 + 0.02 * rng.randn(batch, 4096).astype(np.float32)
    sizes = (512, 64)

    from ddsp_tpu import losses
    ref = float(losses.SpectralLoss(fft_sizes=sizes, mag_weight=1.0,
                                    logmag_weight=1.0)(
                                        jnp.asarray(target),
                                        jnp.asarray(audio)))
    mesh = self._mesh(2, 4)
    got = float(time_shard.time_sharded_spectral_loss(
        mesh, jnp.asarray(target), jnp.asarray(audio), fft_sizes=sizes,
        mag_weight=1.0, logmag_weight=1.0))
    np.testing.assert_allclose(got, ref, rtol=2e-5)

  def test_spectral_loss_dp_gradients_match(self):
    rng = np.random.RandomState(3)
    target = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.1)
    audio = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.1)
    from ddsp_tpu import losses
    g_ref = jax.grad(lambda a: losses.SpectralLoss(
        fft_sizes=(512,), mag_weight=1.0)(target, a))(audio)
    mesh = self._mesh(2, 2)
    g_sp = jax.grad(lambda a: time_shard.time_sharded_spectral_loss(
        mesh, target, a, fft_sizes=(512,), mag_weight=1.0))(audio)
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               atol=1e-6)

  def test_pallas_halo_dp_stays_in_data_row(self):
    """halo_impl='pallas' on a (2 data x 2 time) mesh: interpret-mode
    remote copies must address flat logical ids, not time-axis indices,
    or halos leak between data rows (distinct batch rows catch that)."""
    rng = np.random.RandomState(4)
    batch, t, ir_size = 2, 4000, 500
    audio = rng.randn(batch, t).astype(np.float32)
    ir = (rng.randn(batch, 1, ir_size) *
          np.exp(-np.arange(ir_size) / 100.0)).astype(np.float32)
    single = np.asarray(ops.fft_convolve(audio, ir, padding='same'))
    mesh = self._mesh(2, 2)
    sharded = np.asarray(time_shard.time_sharded_fft_convolve(
        mesh, audio, ir, halo_impl='pallas'))
    np.testing.assert_allclose(sharded, single, atol=2e-4)


def test_local_stft_window_matches_compute_mag_for_odd_size():
  """local_stft_mag must use the same periodic hann as compute_mag
  (denominator N-1 for odd N), or the sharded loss diverges."""
  from ddsp_tpu import losses
  rng = np.random.RandomState(5)
  target = rng.randn(1, 4096).astype(np.float32) * 0.1
  audio = rng.randn(1, 4096).astype(np.float32) * 0.1
  sizes = (63,)
  ref = float(losses.SpectralLoss(fft_sizes=sizes, mag_weight=1.0)(
      jnp.asarray(target), jnp.asarray(audio)))
  mesh = time_mesh(4)
  got = float(time_shard.time_sharded_spectral_loss(
      mesh, jnp.asarray(target), jnp.asarray(audio), fft_sizes=sizes,
      mag_weight=1.0))
  np.testing.assert_allclose(got, ref, rtol=2e-5)
