"""Tests for the fused Pallas harmonic-synthesis kernel (interpret mode).

Verifies exact agreement (same float32 math) with the jnp factored path in
forward and gradients, across 'window'/'linear' resampling, nyquist masking,
and non-block-aligned frame counts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu.ops import oscillator
from ddsp_tpu.ops.pallas_kernels import (fused_harmonic_synthesis,
                                         harmonic_kernel_supported)
from ddsp_tpu.ops.resample import resample


RNG = np.random.RandomState(0)
SR = 16000


def _controls(b=2, t=16, h=20, f_lo=200.0, f_hi=2200.0):
  f0 = jnp.asarray((f_lo + (f_hi - f_lo) *
                    RNG.rand(b, t, 1)).astype(np.float32))
  amps = jnp.asarray(RNG.rand(b, t, 1).astype(np.float32))
  hd = jnp.asarray(RNG.rand(b, t, h).astype(np.float32))
  return f0, amps, hd


def _pallas(f0, amps, hd, n, method='window'):
  ham = amps * hd
  f0_env = resample(f0, n)
  phase0 = jnp.cumsum(f0_env * 2 * np.pi / SR, axis=1)[..., 0]
  return fused_harmonic_synthesis(phase0, f0_env[..., 0], ham,
                                  sample_rate=SR,
                                  amp_resample_method=method,
                                  interpret=True)


def _jnp(f0, amps, hd, n, method='window'):
  return oscillator.harmonic_synthesis(
      f0, amps, harmonic_distribution=hd, n_samples=n, sample_rate=SR,
      amp_resample_method=method, use_pallas=False)


class TestFusedHarmonic:

  def test_supported_shapes(self):
    assert harmonic_kernel_supported(64000, 250, 100)
    assert harmonic_kernel_supported(64000, 500, 60)
    assert harmonic_kernel_supported(64000, 1000, 100)  # hop 64 (packed 2/row)
    assert harmonic_kernel_supported(64000, 2000, 60)   # hop 32 (packed 4/row)
    assert harmonic_kernel_supported(64320, 201, 60)    # VST 16k: hop 320
    assert harmonic_kernel_supported(192960, 201, 60)   # VST 48k: hop 960
    assert harmonic_kernel_supported(7680, 40, 60)      # hop 192 (P=2 W=384)
    assert not harmonic_kernel_supported(64000, 250, 200)  # >128 harmonics
    assert not harmonic_kernel_supported(64000, 251, 100)  # non-divisible
    assert not harmonic_kernel_supported(16000, 1000, 100)  # hop 16

  @pytest.mark.parametrize('method', ['window', 'linear'])
  def test_matches_jnp_forward(self, method):
    n = 4096
    f0, amps, hd = _controls()
    a = np.asarray(_jnp(f0, amps, hd, n, method))
    b = np.asarray(_pallas(f0, amps, hd, n, method))
    np.testing.assert_allclose(a, b, atol=4e-3)

  @pytest.mark.parametrize('method', ['window', 'linear'])
  @pytest.mark.parametrize('hop', [32, 64])
  def test_matches_jnp_forward_packed_hops(self, method, hop):
    # hop < 128: multiple hops share one 128-lane row (the canonical
    # presets' hop=64 path).
    t = 40
    n = t * hop
    f0, amps, hd = _controls(t=t)
    a = np.asarray(_jnp(f0, amps, hd, n, method))
    b = np.asarray(_pallas(f0, amps, hd, n, method))
    np.testing.assert_allclose(a, b, atol=4e-3)

  @pytest.mark.parametrize('method', ['window', 'linear'])
  @pytest.mark.parametrize('hop', [96, 320])
  def test_matches_jnp_forward_wide_packed_rows(self, method, hop):
    # hop not dividing 128 but gcd(hop, 128) >= 32: rows wider than one
    # 128-lane tile (hop 320 = the 50 Hz VST hop at 16 kHz -> W=640;
    # hop 96 -> P=4, W=384).
    t = 15
    n = t * hop
    f0, amps, hd = _controls(t=t, h=12)
    a = np.asarray(_jnp(f0, amps, hd, n, method))
    b = np.asarray(_pallas(f0, amps, hd, n, method))
    np.testing.assert_allclose(a, b, atol=4e-3)

  @pytest.mark.parametrize('hop', [32, 64, 320])
  def test_matches_jnp_gradients_packed_hops(self, hop):
    t = 24
    n = t * hop
    f0, amps, hd = _controls(t=t)
    ga = jax.grad(lambda a, h, f: jnp.mean(_jnp(f, a, h, n)**2),
                  argnums=(0, 1, 2))(amps, hd, f0)
    gb = jax.grad(lambda a, h, f: jnp.mean(_pallas(f, a, h, n)**2),
                  argnums=(0, 1, 2))(amps, hd, f0)
    for da, db in zip(ga, gb):
      da, db = np.asarray(da), np.asarray(db)
      scale = np.abs(da).max() + 1e-12
      np.testing.assert_allclose(da / scale, db / scale, atol=5e-3)

  def test_packed_hops_odd_frame_count(self):
    # 33 frames at hop 64: rows = ceil(33/2) = 17, exercises both the
    # partial final row (one real hop + one padded hop) and row padding.
    t, hop = 33, 64
    n = t * hop
    f0, amps, hd = _controls(t=t, h=12)
    a = np.asarray(_jnp(f0, amps, hd, n))
    b = np.asarray(_pallas(f0, amps, hd, n))
    np.testing.assert_allclose(a, b, atol=4e-3)
    ga = jax.grad(lambda h: jnp.sum(_jnp(f0, amps, h, n)**2))(hd)
    gb = jax.grad(lambda h: jnp.sum(_pallas(f0, amps, h, n)**2))(hd)
    scale = np.abs(np.asarray(ga)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(ga) / scale,
                               np.asarray(gb) / scale, atol=5e-3)

  def test_matches_jnp_gradients(self):
    n = 4096
    f0, amps, hd = _controls()
    ga = jax.grad(lambda a, h, f: jnp.mean(_jnp(f, a, h, n)**2),
                  argnums=(0, 1, 2))(amps, hd, f0)
    gb = jax.grad(lambda a, h, f: jnp.mean(_pallas(f, a, h, n)**2),
                  argnums=(0, 1, 2))(amps, hd, f0)
    for da, db in zip(ga, gb):
      da, db = np.asarray(da), np.asarray(db)
      scale = np.abs(da).max() + 1e-12
      np.testing.assert_allclose(da / scale, db / scale, atol=5e-3)

  def test_nyquist_masking(self):
    # High f0: upper harmonics silent in both paths.
    n = 2048
    f0, amps, hd = _controls(t=8, h=16, f_lo=3000.0, f_hi=5000.0)
    a = np.asarray(_jnp(f0, amps, hd, n))
    b = np.asarray(_pallas(f0, amps, hd, n))
    np.testing.assert_allclose(a, b, atol=4e-3)

  def test_non_block_aligned_frames(self):
    # 10 frames: not a multiple of the 8-hop block (exercises padding).
    n = 1280  # hop 128
    f0, amps, hd = _controls(t=10, h=12)
    a = np.asarray(_jnp(f0, amps, hd, n))
    b = np.asarray(_pallas(f0, amps, hd, n))
    np.testing.assert_allclose(a, b, atol=4e-3)

  def test_gradient_finite_difference(self):
    # Independent check of the custom VJP against finite differences.
    n = 1024
    f0, amps, hd = _controls(b=1, t=8, h=6)
    ham = amps * hd

    def loss(ham):
      f0_env = resample(f0, n)
      phase0 = jnp.cumsum(f0_env * 2 * np.pi / SR, axis=1)[..., 0]
      audio = fused_harmonic_synthesis(phase0, f0_env[..., 0], ham,
                                       sample_rate=SR, interpret=True)
      return jnp.sum(audio**2)

    g = np.asarray(jax.grad(loss)(ham))
    eps = 1e-3
    for idx in [(0, 2, 1), (0, 5, 3), (0, 7, 0)]:
      dh = np.zeros_like(np.asarray(ham))
      dh[idx] = eps
      fd = (float(loss(ham + dh)) - float(loss(ham - dh))) / (2 * eps)
      np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)

  def test_long_phase_accuracy(self):
    # The kernel wraps phase before multiplying by harmonic ratios, so its
    # error vs a float64 golden must not meaningfully exceed the jnp
    # path's (same-order float32 noise; the bound below allows 5%).
    n = 16384
    f0, amps, hd = _controls(t=16, h=24)
    f0_env = np.asarray(resample(f0, n), np.float64)
    amp_env = np.asarray(resample(amps * hd, n, method='window'),
                         np.float64)
    phase = np.cumsum(f0_env * 2 * np.pi / SR, axis=1)
    ratios = np.arange(1, 25, dtype=np.float64)
    mask = (f0_env * ratios) < SR / 2
    golden = np.sum(np.where(mask, amp_env, 0.0) * np.sin(phase * ratios),
                    axis=-1)
    b = np.asarray(_pallas(f0, amps, hd, n))
    a = np.asarray(_jnp(f0, amps, hd, n))
    assert np.abs(b - golden).mean() <= np.abs(a - golden).mean() * 1.05
    assert np.abs(b - golden).mean() < 5e-3


def test_vmem_gate_rejects_degenerate_shapes():
  """Shapes whose kernel footprint exceeds scoped VMEM must fall back to
  the jnp path instead of failing at Mosaic compile time."""
  from ddsp_tpu.ops.pallas_kernels.harmonic import harmonic_kernel_supported
  # Canonical shapes stay supported.
  assert harmonic_kernel_supported(64000, 250, 100)   # hop 256
  assert harmonic_kernel_supported(64000, 1000, 60)   # hop 64
  assert harmonic_kernel_supported(16000, 50, 100)    # VST hop 320
  # One frame covering the whole 4-s signal: W = 64000, blocks blow VMEM.
  assert not harmonic_kernel_supported(64000, 1, 100)
  # Hour-long audio at hop 128: resident taps alone exceed VMEM.
  assert not harmonic_kernel_supported(16000 * 3600, 16000 * 3600 // 128,
                                       100)
