"""Tests for the fused Pallas GRU sequence kernel (interpret mode).

Correctness bar: exact-math agreement with the FastGRU lax.scan path
(same float32 gate arithmetic) for hidden states, final carry, and all
cotangents (inputs, recurrent weights, bias, initial state).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu.ops.pallas_kernels import fused_gru, gru_kernel_supported

RNG = np.random.RandomState(0)


def _scan_gru(xp, wh, bn, h0):
  h_dim = wh.shape[0]

  def step(h, xp_t):
    hp = h @ wh
    r = jax.nn.sigmoid(xp_t[:, :h_dim] + hp[:, :h_dim])
    z = jax.nn.sigmoid(xp_t[:, h_dim:2 * h_dim] + hp[:, h_dim:2 * h_dim])
    n = jnp.tanh(xp_t[:, 2 * h_dim:] + r * (hp[:, 2 * h_dim:] + bn))
    h = (1.0 - z) * n + z * h
    return h, h

  h_final, ys = jax.lax.scan(step, h0, jnp.swapaxes(xp, 0, 1))
  return jnp.swapaxes(ys, 0, 1), h_final


def _inputs(b=8, t=24, h=128, seed=0):
  rng = np.random.RandomState(seed)
  xp = jnp.asarray(rng.randn(b, t, 3 * h).astype(np.float32) * 0.3)
  wh = jnp.asarray((rng.randn(h, 3 * h) / np.sqrt(h)).astype(np.float32))
  bn = jnp.asarray(rng.randn(h).astype(np.float32) * 0.1)
  h0 = jnp.asarray(rng.randn(b, h).astype(np.float32) * 0.1)
  return xp, wh, bn, h0


def test_supported_shapes():
  assert gru_kernel_supported(64, 1000, 512)
  assert gru_kernel_supported(8, 24, 128)
  assert not gru_kernel_supported(64, 1000, 100)  # H not lane-aligned
  # Off-sublane batches are supported via zero-padding in FastGRU.
  assert gru_kernel_supported(3, 1000, 512)
  assert not gru_kernel_supported(8, 4, 128)      # too short to matter
  # VMEM gate: big batches still fit by shrinking block_t, but shapes
  # whose resident wh+dwh (6*H^2 floats) blow the budget even at
  # block_t=1 must fall back to the scan path.
  assert gru_kernel_supported(128, 1000, 512)
  assert not gru_kernel_supported(64, 1000, 1024)


@pytest.mark.parametrize('t', [24, 25])  # block 8 and odd (block 1)
def test_forward_matches_scan(t):
  xp, wh, bn, h0 = _inputs(t=t)
  ys_p, hf_p = fused_gru(xp, wh, bn, h0, True)
  ys_s, hf_s = _scan_gru(xp, wh, bn, h0)
  np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s),
                             atol=1e-6, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_s),
                             atol=1e-6, rtol=1e-6)


def test_gradients_match_scan():
  xp, wh, bn, h0 = _inputs()
  w = jnp.asarray(RNG.randn(*(8, 24, 128)).astype(np.float32))

  def loss(fn, xp, wh, bn, h0):
    ys, hf = fn(xp, wh, bn, h0)
    return jnp.sum(ys * w) + jnp.sum(hf**2)

  gp = jax.grad(lambda *a: loss(
      lambda *b: fused_gru(*b, True), *a), argnums=(0, 1, 2, 3))(
          xp, wh, bn, h0)
  gs = jax.grad(lambda *a: loss(_scan_gru, *a), argnums=(0, 1, 2, 3))(
      xp, wh, bn, h0)
  for a, b in zip(gp, gs):
    a, b = np.asarray(a), np.asarray(b)
    scale = np.abs(b).max() + 1e-12
    np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


def test_gradient_directional_finite_difference():
  """Directional derivative along a dense random direction: a full-matrix
  probe is well-conditioned in float32 where single-entry FD is not."""
  xp, wh, bn, h0 = _inputs(b=8, t=8, h=128, seed=3)
  rng = np.random.RandomState(7)
  d = jnp.asarray((rng.randn(*wh.shape) / np.sqrt(wh.size))
                  .astype(np.float32))

  def loss(wh):
    ys, _ = fused_gru(xp, wh, bn, h0, True)
    return jnp.mean(ys**2)

  g = jax.grad(loss)(wh)
  analytic = float(jnp.sum(g * d))
  eps = 1e-2
  fd = (float(loss(wh + eps * d)) - float(loss(wh - eps * d))) / (2 * eps)
  np.testing.assert_allclose(analytic, fd, rtol=5e-2, atol=1e-6)


def test_fastgru_uses_kernel_when_forced():
  """FastGRU(use_pallas=True) equals FastGRU(use_pallas=False)."""
  from ddsp_tpu.nn import layers as L
  rng = np.random.RandomState(5)
  x = jnp.asarray(rng.randn(8, 16, 64).astype(np.float32) * 0.3)
  # Exact equality is an f32-mode contract (the bf16 default is covered
  # by the tolerance tests below).
  m_scan = L.FastGRU(128, use_pallas=False, compute_dtype='float32')
  m_pal = L.FastGRU(128, use_pallas=True, compute_dtype='float32')
  v = m_scan.init(jax.random.PRNGKey(0), x)
  y_scan = np.asarray(m_scan.apply(v, x))
  y_pal = np.asarray(m_pal.apply(v, x))
  np.testing.assert_allclose(y_pal, y_scan, atol=1e-6, rtol=1e-6)

  g_scan = jax.grad(lambda v: jnp.mean(m_scan.apply(v, x)**2))(v)
  g_pal = jax.grad(lambda v: jnp.mean(m_pal.apply(v, x)**2))(v)
  for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                  jax.tree_util.tree_leaves(g_scan)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize('b', [1, 4, 6])
def test_fastgru_pads_off_sublane_batch(b):
  """Batches that aren't a multiple of 8 run zero-padded, same numbers."""
  from ddsp_tpu.nn import layers as L
  rng = np.random.RandomState(11)
  x = jnp.asarray(rng.randn(b, 16, 64).astype(np.float32) * 0.3)
  m_scan = L.FastGRU(128, use_pallas=False, compute_dtype='float32')
  m_pal = L.FastGRU(128, use_pallas=True, compute_dtype='float32')
  v = m_scan.init(jax.random.PRNGKey(0), x)
  y_pal, hf_pal = m_pal.apply(v, x, return_state=True)
  y_scan, hf_scan = m_scan.apply(v, x, return_state=True)
  assert y_pal.shape == (b, 16, 128) and hf_pal.shape == (b, 128)
  np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan),
                             atol=1e-6, rtol=1e-6)
  np.testing.assert_allclose(np.asarray(hf_pal), np.asarray(hf_scan),
                             atol=1e-6, rtol=1e-6)
  g_scan = jax.grad(lambda v: jnp.mean(m_scan.apply(v, x)**2))(v)
  g_pal = jax.grad(lambda v: jnp.mean(m_pal.apply(v, x)**2))(v)
  for a, c in zip(jax.tree_util.tree_leaves(g_pal),
                  jax.tree_util.tree_leaves(g_scan)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                               atol=1e-6, rtol=1e-5)


def test_streaming_state_round_trip():
  """Explicit initial/final state: two half-sequences equal one full."""
  xp, wh, bn, h0 = _inputs(t=16)
  ys_full, hf_full = fused_gru(xp, wh, bn, h0, True)
  ys_a, hf_a = fused_gru(xp[:, :8], wh, bn, h0, True)
  ys_b, hf_b = fused_gru(xp[:, 8:], wh, bn, hf_a, True)
  np.testing.assert_allclose(np.asarray(jnp.concatenate([ys_a, ys_b], 1)),
                             np.asarray(ys_full), atol=1e-6)
  np.testing.assert_allclose(np.asarray(hf_b), np.asarray(hf_full),
                             atol=1e-6)


def test_large_batch_shrinks_block_t():
  """B=128/H=512 must pick a block_t whose backward fits the VMEM budget."""
  from ddsp_tpu.ops.pallas_kernels import gru as gru_mod
  blk = gru_mod._pick_block_t_vmem(1000, 128, 512, gru_mod._bwd_vmem_bytes,
                                   max_block=4)
  assert gru_mod._bwd_vmem_bytes(blk, 128, 512) <= gru_mod._VMEM_BUDGET_BYTES
  assert blk >= 1
  # And the canonical shape keeps its fast block: 4 for bwd, 8 for fwd.
  assert gru_mod._pick_block_t_vmem(1000, 64, 512, gru_mod._bwd_vmem_bytes,
                                    max_block=4) == 4
  assert gru_mod._pick_block_t_vmem(1000, 64, 512,
                                    gru_mod._fwd_vmem_bytes) == 8
  # Numerics are block_t-independent: run a batch that forces block 1.
  xp, wh, bn, h0 = _inputs(t=24, b=11)
  ys_p, hf_p = fused_gru(xp, wh, bn, h0, True)
  ys_s, hf_s = _scan_gru(xp, wh, bn, h0)
  np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s),
                             atol=1e-6, rtol=1e-6)


def test_bf16_stream_matches_f32_within_tolerance():
  """bf16 xp selects the mixed-precision kernel; outputs stay f32 and
  track the f32 recurrence within bf16 rounding accumulation."""
  xp, wh, bn, h0 = _inputs(b=16, t=64, h=128, seed=9)
  ys_f, hf_f = fused_gru(xp, wh, bn, h0, True)
  ys_b, hf_b = fused_gru(xp.astype(jnp.bfloat16), wh, bn, h0, True)
  assert ys_b.dtype == jnp.float32 and hf_b.dtype == jnp.float32
  # Hidden states are tanh/sigmoid-bounded; bf16 operand rounding (~0.4%
  # relative) stays bounded through the gated recurrence.
  assert np.abs(np.asarray(ys_b) - np.asarray(ys_f)).max() < 5e-2
  np.testing.assert_allclose(np.asarray(hf_b), np.asarray(hf_f),
                             atol=5e-2)


def test_bf16_gradients_dtypes_and_direction():
  xp, wh, bn, h0 = _inputs(b=16, t=32, h=128, seed=10)

  def loss(xp, wh, bn, h0):
    ys, hf = fused_gru(xp, wh, bn, h0, True)
    return jnp.mean(ys**2) + jnp.mean(hf**2)

  g_f = jax.grad(loss, argnums=(0, 1, 2, 3))(xp, wh, bn, h0)
  g_b = jax.grad(loss, argnums=(0, 1, 2, 3))(
      xp.astype(jnp.bfloat16), wh, bn, h0)
  # Cotangent of the bf16 primal is bf16; weight/bias/state stay f32.
  assert g_b[0].dtype == jnp.bfloat16
  assert all(g.dtype == jnp.float32 for g in g_b[1:])
  for a, b in zip(g_b, g_f):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    cos = a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
    assert cos > 0.99, cos


def test_fastgru_bf16_close_to_f32_scan():
  """FastGRU(compute_dtype='bfloat16', pallas) tracks the f32 scan."""
  from ddsp_tpu.nn import layers as L
  rng = np.random.RandomState(21)
  x = jnp.asarray(rng.randn(4, 32, 64).astype(np.float32) * 0.3)
  m_f32 = L.FastGRU(128, use_pallas=False, compute_dtype='float32')
  m_b = L.FastGRU(128, use_pallas=True, compute_dtype='bfloat16')
  v = m_f32.init(jax.random.PRNGKey(0), x)
  y_f = np.asarray(m_f32.apply(v, x))
  y_b = np.asarray(m_b.apply(v, x))
  assert y_b.dtype == np.float32
  assert np.abs(y_b - y_f).max() < 5e-2
  g_f = jax.tree_util.tree_leaves(
      jax.grad(lambda v: jnp.mean(m_f32.apply(v, x)**2))(v))
  g_b = jax.tree_util.tree_leaves(
      jax.grad(lambda v: jnp.mean(m_b.apply(v, x)**2))(v))
  for a, b in zip(g_b, g_f):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    cos = a @ b / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12)
    assert cos > 0.99, cos
