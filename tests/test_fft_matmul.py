"""Tests for the four-step matmul FFT against numpy's FFT."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu.ops import fft_matmul as fm


RNG = np.random.RandomState(4)


class TestMatmulFFT:

  @pytest.mark.parametrize('n', [16384, 32768, 131072])
  def test_rfft_matches_numpy(self, n):
    x = RNG.randn(2, n - 777).astype(np.float32)
    yr, yi = fm.matmul_rfft(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr) / scale, ref.real / scale,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(yi) / scale, ref.imag / scale,
                               atol=2e-5)

  def test_irfft_round_trip(self):
    n = 16384
    x = RNG.randn(3, n).astype(np.float32)
    yr, yi = fm.matmul_rfft(jnp.asarray(x), n)
    back = np.asarray(fm.matmul_irfft(yr, yi, n))
    np.testing.assert_allclose(back, x, atol=1e-4)

  def test_convolution_identity(self):
    # Convolving with a delayed delta shifts the signal.
    n = 16384
    x = RNG.randn(1, 8000).astype(np.float32)
    delta = np.zeros((1, 100), np.float32)
    delta[0, 10] = 1.0
    ar, ai = fm.matmul_rfft(jnp.asarray(x), n)
    br, bi = fm.matmul_rfft(jnp.asarray(delta), n)
    pr, pi = fm.complex_multiply(ar, ai, br, bi)
    out = np.asarray(fm.matmul_irfft(pr, pi, n))
    np.testing.assert_allclose(out[0, 10:8010], x[0], atol=1e-4)

  def test_use_matmul_fft_gating(self):
    from unittest import mock
    # Pin BOTH branches explicitly (computing the expected value from the
    # implementation's own backend check would be tautological on CPU CI).
    with mock.patch('jax.default_backend', return_value='tpu'):
      assert fm.use_matmul_fft(131072)
      assert not fm.use_matmul_fft(8192)      # too small
      assert not fm.use_matmul_fft(100000)    # not a power of two
    with mock.patch('jax.default_backend', return_value='cpu'):
      assert not fm.use_matmul_fft(131072)


class TestMatmulSmallFFT:

  @pytest.mark.parametrize('n,m', [(512, 512), (512, 384), (2048, 100)])
  def test_rfft_small_matches_numpy(self, n, m):
    x = RNG.randn(3, 7, m).astype(np.float32)
    yr, yi = fm.matmul_rfft_small(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(yr) / scale, ref.real / scale,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(yi) / scale, ref.imag / scale,
                               atol=2e-6)

  @pytest.mark.parametrize('n', [256, 512, 1024])
  def test_irfft_small_round_trip(self, n):
    x = RNG.randn(4, n).astype(np.float32)
    yr, yi = fm.matmul_rfft_small(jnp.asarray(x), n)
    back = np.asarray(fm.matmul_irfft_small(yr, yi, n))
    np.testing.assert_allclose(back, x, atol=1e-5)

  def test_irfft_small_matches_numpy(self):
    n = 512
    spec = RNG.randn(2, n // 2 + 1) + 1j * RNG.randn(2, n // 2 + 1)
    # Hermitian endpoints (DC and nyquist real) so numpy irfft agrees.
    yr = spec.real.astype(np.float32)
    yi = spec.imag.astype(np.float32)
    yi[:, 0] = 0.0
    yi[:, -1] = 0.0
    ref = np.fft.irfft(yr + 1j * yi, n)
    out = np.asarray(fm.matmul_irfft_small(jnp.asarray(yr),
                                           jnp.asarray(yi), n))
    np.testing.assert_allclose(out, ref, atol=1e-6)

  def test_irfft_real_spectrum(self):
    mags = RNG.rand(2, 5, 65).astype(np.float32)
    out = np.asarray(fm.matmul_irfft_real_spectrum(jnp.asarray(mags), 128))
    ref = np.fft.irfft(mags.astype(np.complex64), 128)
    np.testing.assert_allclose(out, ref, atol=1e-6)

  def test_small_convolution_matches_fft(self):
    n = 512
    x = RNG.randn(2, 4, 256).astype(np.float32)
    h = RNG.randn(2, 4, 128).astype(np.float32)
    ar, ai = fm.matmul_rfft_small(jnp.asarray(x), n)
    br, bi = fm.matmul_rfft_small(jnp.asarray(h), n)
    pr, pi = fm.complex_multiply(ar, ai, br, bi)
    out = np.asarray(fm.matmul_irfft_small(pr, pi, n))
    ref = np.fft.irfft(np.fft.rfft(x, n) * np.fft.rfft(h, n), n)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)

  def test_use_matmul_small_fft_gating(self):
    from unittest import mock
    with mock.patch('jax.default_backend', return_value='tpu'):
      assert fm.use_matmul_small_fft(512)
      assert not fm.use_matmul_small_fft(8192)   # too large
      assert not fm.use_matmul_small_fft(384)    # not a power of two
      # use_matmul_stft delegates to the same predicate.
      assert fm.use_matmul_stft(512)
    with mock.patch('jax.default_backend', return_value='cpu'):
      assert not fm.use_matmul_small_fft(512)


class TestFusedFrequencyFilter:
  """The fused GEMM LTV filter must match the reference design+convolve."""

  @pytest.mark.parametrize('window_size', [0, 64, 100])
  @pytest.mark.parametrize('n_freqs', [33, 65])
  def test_matches_reference_path(self, window_size, n_freqs):
    from ddsp_tpu.ops import fftconv
    rng = np.random.RandomState(1)
    audio = rng.randn(2, 4000).astype(np.float32)
    mags = rng.rand(2, 50, n_freqs).astype(np.float32)
    ref = np.asarray(fftconv.frequency_filter(
        jnp.asarray(audio), jnp.asarray(mags), window_size=window_size))
    ir_size = fftconv.designed_ir_size(n_freqs, window_size)
    fft_size = fftconv.get_fft_size(80, ir_size, power_of_2=True)
    out = np.asarray(fftconv._fused_frequency_filter(
        jnp.asarray(audio), jnp.asarray(mags), window_size, 'same',
        80, ir_size, fft_size))
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=1e-5)

  def test_designed_ir_size_matches_pipeline(self):
    from ddsp_tpu.ops import fftconv
    for n_freqs, ws in [(65, 0), (65, 64), (65, 100), (33, 17), (17, 32)]:
      ir = fftconv.frequency_impulse_response(
          jnp.ones((1, 1, n_freqs)), window_size=ws)
      assert ir.shape[-1] == fftconv.designed_ir_size(n_freqs, ws), (
          n_freqs, ws)

  def test_gradients_match_reference_path(self):
    from ddsp_tpu.ops import fftconv
    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(1, 1000).astype(np.float32))
    mags = jnp.asarray(rng.rand(1, 10, 17).astype(np.float32))
    def loss_ref(m):
      return jnp.mean(jnp.abs(fftconv.frequency_filter(audio, m)))
    ir_size = fftconv.designed_ir_size(17, 0)
    fft_size = fftconv.get_fft_size(100, ir_size, power_of_2=True)
    def loss_fused(m):
      return jnp.mean(jnp.abs(fftconv._fused_frequency_filter(
          audio, m, 0, 'same', 100, ir_size, fft_size)))
    g_ref = np.asarray(jax.grad(loss_ref)(mags))
    g_fused = np.asarray(jax.grad(loss_fused)(mags))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_fused / scale, g_ref / scale, atol=1e-5)


class TestPartitionedConvolve:

  @pytest.mark.parametrize('t,s,block', [(5000, 3000, 1024),
                                         (8192, 4096, 2048),
                                         (4000, 6000, 1024)])
  def test_matches_scipy_linear_convolution(self, t, s, block):
    import scipy.signal
    audio = RNG.randn(2, t).astype(np.float32)
    ir = RNG.randn(2, s).astype(np.float32)
    out = np.asarray(fm.partitioned_convolve(
        jnp.asarray(audio), jnp.asarray(ir), block_size=block))
    conv_len = t + s - 1
    assert out.shape[-1] >= conv_len
    ref = np.stack([scipy.signal.fftconvolve(audio[i], ir[i])
                    for i in range(2)])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out[:, :conv_len] / scale, ref / scale,
                               atol=2e-5)
    # Samples beyond the true convolution length are zero.
    np.testing.assert_allclose(out[:, conv_len:] / scale,
                               np.zeros_like(out[:, conv_len:]), atol=2e-5)

  def test_shared_ir_broadcasts_over_batch(self):
    import scipy.signal
    audio = RNG.randn(3, 4000).astype(np.float32)
    ir = RNG.randn(1, 2500).astype(np.float32)
    out = np.asarray(fm.partitioned_convolve(
        jnp.asarray(audio), jnp.asarray(ir), block_size=1024))
    ref = np.stack([scipy.signal.fftconvolve(audio[i], ir[0])
                    for i in range(3)])
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out[:, :ref.shape[-1]] / scale, ref / scale,
                               atol=2e-5)

  def test_fft_convolve_dispatch_equivalence(self, monkeypatch):
    # Force the partitioned branch and pin it against the default path for
    # both paddings, including the group-delay crop semantics.
    from ddsp_tpu.ops import fftconv
    audio = jnp.asarray(RNG.randn(2, 4000).astype(np.float32))
    ir = jnp.asarray(RNG.randn(1, 3000).astype(np.float32))
    for padding in ('same', 'valid'):
      ref = np.asarray(fftconv.fft_convolve(audio, ir, padding=padding))
      monkeypatch.setattr(fm, 'use_partitioned_fft', lambda *a: True)
      monkeypatch.setattr(fm, '_PARTITION_BLOCK', 1024)
      out = np.asarray(fftconv.fft_convolve(audio, ir, padding=padding))
      monkeypatch.undo()
      assert out.shape == ref.shape
      scale = np.abs(ref).max()
      np.testing.assert_allclose(out / scale, ref / scale, atol=2e-5)

  def test_gradients_flow_through_ir(self):
    audio = jnp.asarray(RNG.randn(1, 2000).astype(np.float32))
    ir0 = RNG.randn(1, 1500).astype(np.float32)
    conv_len = 2000 + 1500 - 1

    def loss_part(ir):
      out = fm.partitioned_convolve(audio, ir, block_size=512)
      return jnp.sum(jnp.abs(out[:, :conv_len]))

    def loss_ref(ir):
      full = jnp.fft.irfft(jnp.fft.rfft(audio, 4096)
                           * jnp.fft.rfft(ir, 4096), 4096)
      return jnp.sum(jnp.abs(full[:, :conv_len]))

    g_part = np.asarray(jax.grad(loss_part)(jnp.asarray(ir0)))
    g_ref = np.asarray(jax.grad(loss_ref)(jnp.asarray(ir0)))
    scale = np.abs(g_ref).max()
    np.testing.assert_allclose(g_part / scale, g_ref / scale, atol=2e-4)

  def test_windowed_output_matches_full(self):
    audio = jnp.asarray(RNG.randn(2, 4000).astype(np.float32))
    ir = jnp.asarray(RNG.randn(1, 2500).astype(np.float32))
    full = np.asarray(fm.partitioned_convolve(audio, ir, block_size=1024))
    for start, length in [(0, 4000), (1200, 1000), (3000, 5000), (0, 9000)]:
      win = np.asarray(fm.partitioned_convolve(
          audio, ir, block_size=1024, out_start=start, out_len=length))
      assert win.shape == (2, length)
      avail = min(length, full.shape[-1] - start)
      np.testing.assert_allclose(win[:, :avail], full[:, start:start + avail],
                                 atol=1e-6)
      # Window past the computed convolution is zero-padded.
      np.testing.assert_array_equal(win[:, avail:], 0.0)
