"""Fused GRU sequence kernel: the whole recurrence in one Pallas launch.

The decoder's recurrent scan (nn/layers.py FastGRU) is the serial floor of
the training step: 1000 tiny [B, H] x [H, 3H] GEMMs under lax.scan, each
paying loop/dispatch overhead and HBM round trips for the carry. This
kernel runs the entire sequence inside one pallas_call: the recurrent
weight matrix stays resident in VMEM, timestep blocks of the (pre-computed,
hoisted) input projections stream through double-buffered DMA, and the
hidden-state carry lives in VMEM scratch across the sequential TPU grid.

The backward is a second kernel walking the grid in reverse (reversed
BlockSpec index maps): gates are recomputed in-kernel from the streamed
inputs and the saved hidden states (nothing beyond the forward's natural
outputs is saved), the weight/bias cotangents accumulate into
constant-index output blocks that persist in VMEM across grid steps, and
the carry cotangent rides scratch.

Gate math matches flax.linen.GRUCell (reset-after convention), same as the
scan path in nn/layers.py FastGRU:
  hp = h_prev @ wh
  r = sigmoid(xr + hp_r);  z = sigmoid(xz + hp_z)
  n = tanh(xn + r * (hp_n + bn))
  h = (1 - z) * n + z * h_prev
with xp = [xr, xz, xn] already containing the input projection + bias.

Replaces the compute of the reference's GRU layers (tf.keras GRU inside
RnnFcDecoder, reference decoders.py:27/nn.py:866) on the training path;
parity with the scan implementation is pinned by tests/test_pallas_gru.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_LANES = 128
_SUBLANES = 8


# Per-core VMEM budget the kernels must fit in (v5e has 16 MiB scoped
# VMEM; leave headroom for Mosaic's own temporaries).
_VMEM_BUDGET_BYTES = int(16 * 1024 * 1024 * 0.9)


def _pad8(batch: int) -> int:
  return -(-batch // _SUBLANES) * _SUBLANES


def _fwd_vmem_bytes(block_t: int, batch: int, h_dim: int,
                    itemsize: int = 4) -> int:
  # Double-buffered streams (xp in at stream itemsize, ys out f32) +
  # resident wh (stream itemsize) / h0 / scratch / bn.
  b = _pad8(batch)
  return (itemsize * (2 * block_t * b * 3 * h_dim + 3 * h_dim * h_dim) +
          4 * (2 * block_t * b * h_dim + 2 * b * h_dim + 2 * h_dim))


def _bwd_vmem_bytes(block_t: int, batch: int, h_dim: int,
                    itemsize: int = 4) -> int:
  # Streams: g + h_prev in (f32), xp in + dxp out (stream itemsize), all
  # double-buffered; resident wh (stream itemsize) + dwh accumulator (f32)
  # + dh0 + scratch + biases.
  b = _pad8(batch)
  return (itemsize * (2 * block_t * b * 6 * h_dim + 3 * h_dim * h_dim) +
          4 * (2 * block_t * b * 2 * h_dim + 3 * h_dim * h_dim +
               2 * b * h_dim + 4 * h_dim))


def gru_kernel_supported(batch: int, seq_len: int, hidden: int) -> bool:
  """Tile-friendly shapes that fit VMEM (else FastGRU's lax.scan runs).

  Batch rows are independent, so callers zero-pad them up to the 8-row
  sublane tile (see nn/layers.py FastGRU); but VMEM scales with
  batch x hidden, so shapes whose backward cannot fit the scoped-VMEM
  budget even at block_t=1 (e.g. H=1024 at B=64, where the resident
  wh + dwh alone take 6*H^2 floats) fall back to the scan path instead
  of failing at Mosaic compile time.
  """
  return (hidden % _LANES == 0 and seq_len >= 8 and
          _bwd_vmem_bytes(1, batch, hidden) <= _VMEM_BUDGET_BYTES)


def _stream_dtype(compute_dtype) -> jnp.dtype:
  """dtype for the streamed xp/dxp and the resident wh.

  bfloat16 halves both the HBM stream traffic and, on the per-step
  recurrent GEMMs, quadruples the MXU rate (f32 inputs run at ~1/4 the
  bf16 rate on v5e). The carry, gate math, ys, and every gradient
  accumulator stay float32.
  """
  dt = jnp.dtype(compute_dtype)
  return dt if dt in (jnp.dtype(jnp.bfloat16),) else jnp.dtype(jnp.float32)


def _pick_block_t(seq_len: int, max_block: int = 8) -> int:
  for b in (8, 4, 2):
    if b <= max_block and seq_len % b == 0:
      return b
  return 1


def _pick_block_t_vmem(seq_len: int, batch: int, h_dim: int, vmem_fn,
                       max_block: int = 8, itemsize: int = 4) -> int:
  """Largest divisor block_t whose kernel footprint fits the budget."""
  while (max_block > 1 and
         vmem_fn(_pick_block_t(seq_len, max_block), batch, h_dim,
                 itemsize) > _VMEM_BUDGET_BYTES):
    max_block = _pick_block_t(seq_len, max_block) // 2
  return _pick_block_t(seq_len, max_block)


def _gates(xp_t, hp, bn, h_dim):
  r = jax.nn.sigmoid(xp_t[:, :h_dim] + hp[:, :h_dim])
  z = jax.nn.sigmoid(xp_t[:, h_dim:2 * h_dim] + hp[:, h_dim:2 * h_dim])
  n = jnp.tanh(xp_t[:, 2 * h_dim:] + r * (hp[:, 2 * h_dim:] + bn))
  return r, z, n


def _fwd_kernel(h0_ref, xp_ref, wh_ref, bn_ref, ys_ref, h_scratch, *,
                block_t: int, h_dim: int):
  """One time block: advance the carry block_t steps, emit hidden states.

  xp_ref/ys_ref blocks: [block_t, B, 3H] / [block_t, B, H] (time-major so
  each step slices a leading index); wh resident [H, 3H]; carry in
  h_scratch [B, H] persists across the sequential grid.
  """
  from jax.experimental import pallas as pl  # pylint: disable=g-import-not-at-top

  @pl.when(pl.program_id(0) == 0)
  def _():
    h_scratch[...] = h0_ref[...]

  h = h_scratch[...]
  wh = wh_ref[...]
  bn = bn_ref[0:1, :]
  for j in range(block_t):
    # Streams may be bf16 (gate math is always f32); the recurrent GEMM
    # runs at the stream dtype's MXU rate with f32 accumulation.
    xp_t = xp_ref[j].astype(jnp.float32)
    hp = jnp.dot(h.astype(wh.dtype), wh, preferred_element_type=jnp.float32)
    _, z, n = _gates(xp_t, hp, bn, h_dim)
    h = (1.0 - z) * n + z * h
    ys_ref[j] = h
  h_scratch[...] = h


def _bwd_kernel(g_ref, xp_ref, hprev_ref, wh_ref, bn_ref,
                dxp_ref, dh0_ref, dwh_ref, dbn_ref, dh_scratch, *,
                block_t: int, h_dim: int):
  """Reverse-time block: recompute gates, emit input/weight cotangents.

  Runs with reversed index maps (grid step i touches time block n-1-i).
  dwh/dbn are constant-index output blocks used as cross-step VMEM
  accumulators; dh0 is written when the first time block (last grid step)
  finishes.
  """
  from jax.experimental import pallas as pl  # pylint: disable=g-import-not-at-top

  i = pl.program_id(0)
  last = pl.num_programs(0) - 1

  @pl.when(i == 0)
  def _():
    dh_scratch[...] = jnp.zeros_like(dh_scratch)
    dwh_ref[...] = jnp.zeros_like(dwh_ref)
    dbn_ref[...] = jnp.zeros_like(dbn_ref)

  wh = wh_ref[...]
  bn = bn_ref[0:1, :]
  dh = dh_scratch[...]
  for j in reversed(range(block_t)):
    xp_t = xp_ref[j].astype(jnp.float32)
    # In bf16 mode h_prev streams at bf16: both GEMM consumers cast it to
    # the stream dtype anyway, so only the elementwise (h_prev - n) term
    # sees the rounding - covered by the bf16 tolerance tests.
    h_prev = hprev_ref[j].astype(jnp.float32)
    hp = jnp.dot(h_prev.astype(wh.dtype), wh,
                 preferred_element_type=jnp.float32)
    r, z, n = _gates(xp_t, hp, bn, h_dim)

    dht = dh + g_ref[j]
    dn = dht * (1.0 - z)
    dz = dht * (h_prev - n) * z * (1.0 - z)
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * (hp[:, 2 * h_dim:] + bn)
    dr_pre = dr * r * (1.0 - r)
    dhn = dn_pre * r

    dxp = jnp.concatenate([dr_pre, dz, dn_pre], axis=1)
    dxp_ref[j] = dxp.astype(dxp_ref.dtype)
    dhp = jnp.concatenate([dr_pre, dz, dhn], axis=1).astype(wh.dtype)
    # dh_prev: the direct z-gated path + the recurrent-projection path
    # (contract over the 3H axis directly - an explicit wh.T would
    # materialize a 3 MB stack copy per unrolled step). GEMM operands run
    # at the stream dtype; accumulation is always f32.
    dh = dht * z + jax.lax.dot_general(
        dhp, wh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # Weight/bias cotangents: sum over batch, accumulated straight into
    # the resident output blocks (no live local accumulator on the stack).
    dwh_ref[...] += jax.lax.dot_general(
        h_prev.astype(wh.dtype), dhp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbn_ref[...] += jnp.sum(dhn, axis=0, keepdims=True)

  dh_scratch[...] = dh

  @pl.when(i == last)
  def _():
    dh0_ref[...] = dh


def _pallas_gru_fwd(h0, xp_t_major, wh, bn2, *, block_t, interpret):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  seq_len, batch, three_h = xp_t_major.shape
  h_dim = three_h // 3
  grid = (seq_len // block_t,)

  return pl.pallas_call(
      functools.partial(_fwd_kernel, block_t=block_t, h_dim=h_dim),
      grid=grid,
      in_specs=[
          pl.BlockSpec((batch, h_dim), lambda i: (0, 0)),
          pl.BlockSpec((block_t, batch, three_h), lambda i: (i, 0, 0)),
          pl.BlockSpec((h_dim, three_h), lambda i: (0, 0)),
          pl.BlockSpec((1, h_dim), lambda i: (0, 0)),
      ],
      out_specs=pl.BlockSpec((block_t, batch, h_dim),
                             lambda i: (i, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((seq_len, batch, h_dim), jnp.float32),
      scratch_shapes=[pltpu.VMEM((batch, h_dim), jnp.float32)],
      interpret=interpret,
  )(h0, xp_t_major, wh, bn2)


def _pallas_gru_bwd(g_t_major, xp_t_major, hprev_t_major, wh, bn2, *,
                    block_t, interpret):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  seq_len, batch, three_h = xp_t_major.shape
  h_dim = three_h // 3
  n_blocks = seq_len // block_t
  grid = (n_blocks,)
  rev = lambda i: (n_blocks - 1 - i, 0, 0)

  return pl.pallas_call(
      functools.partial(_bwd_kernel, block_t=block_t, h_dim=h_dim),
      grid=grid,
      in_specs=[
          pl.BlockSpec((block_t, batch, h_dim), rev),
          pl.BlockSpec((block_t, batch, three_h), rev),
          # h_prev streams at its array's dtype (bf16 in mixed mode).
          pl.BlockSpec((block_t, batch, h_dim), rev),
          pl.BlockSpec((h_dim, three_h), lambda i: (0, 0)),
          pl.BlockSpec((1, h_dim), lambda i: (0, 0)),
      ],
      out_specs=(
          pl.BlockSpec((block_t, batch, three_h), rev),
          pl.BlockSpec((batch, h_dim), lambda i: (0, 0)),
          pl.BlockSpec((h_dim, three_h), lambda i: (0, 0)),
          pl.BlockSpec((1, h_dim), lambda i: (0, 0)),
      ),
      out_shape=(
          # dxp streams back at the xp stream dtype (the cotangent of a
          # bf16 primal is bf16); weight/bias/carry cotangents stay f32.
          jax.ShapeDtypeStruct((seq_len, batch, three_h),
                               xp_t_major.dtype),
          jax.ShapeDtypeStruct((batch, h_dim), jnp.float32),
          jax.ShapeDtypeStruct((h_dim, three_h), jnp.float32),
          jax.ShapeDtypeStruct((1, h_dim), jnp.float32),
      ),
      scratch_shapes=[pltpu.VMEM((batch, h_dim), jnp.float32)],
      interpret=interpret,
  )(g_t_major, xp_t_major, hprev_t_major, wh, bn2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_gru(xp: Array, wh: Array, bn: Array, h0: Array,
              interpret: bool = False) -> Tuple[Array, Array]:
  """Run the full GRU recurrence as one Pallas kernel.

  Args:
    xp: Hoisted input projections incl. bias, [batch, time, 3H]
      ([reset, update, candidate] gate order). float32 or bfloat16: a
      bf16 xp selects the mixed-precision kernel - bf16 streams and
      recurrent-GEMM operands (4x MXU rate on v5e, half the HBM
      traffic) with float32 gate math, carry, and accumulation.
    wh: Recurrent weights, [H, 3H] (cast to the stream dtype internally).
    bn: Candidate recurrent bias, [H].
    h0: Initial hidden state, [batch, H].
    interpret: Pallas interpret mode (auto-selected by callers off-TPU).

  Returns:
    (ys, h_final): hidden states [batch, time, H] and final carry
    [batch, H], always float32.
  """
  ys, _, _ = _run_fwd(xp, wh, bn, h0, interpret)
  return ys, ys[:, -1, :]


def _run_fwd(xp, wh, bn, h0, interpret):
  sdt = _stream_dtype(xp.dtype)
  block_t = _pick_block_t_vmem(xp.shape[1], xp.shape[0], wh.shape[0],
                               _fwd_vmem_bytes, itemsize=sdt.itemsize)
  xp_t_major = jnp.swapaxes(xp, 0, 1)
  ys_t_major = _pallas_gru_fwd(h0.astype(jnp.float32), xp_t_major,
                               wh.astype(sdt),
                               bn.reshape(1, -1), block_t=block_t,
                               interpret=interpret)
  ys = jnp.swapaxes(ys_t_major, 0, 1)
  return ys, ys_t_major, xp_t_major


def _fused_gru_fwd(xp, wh, bn, h0, interpret):
  # Residuals keep the TIME-MAJOR xp (the backward streams time blocks):
  # saving the layout the kernel consumes avoids re-transposing ~100 MB
  # at canonical decoder shapes.
  ys, ys_t_major, xp_t_major = _run_fwd(xp, wh, bn, h0, interpret)
  return (ys, ys[:, -1, :]), (xp_t_major, wh, bn, h0, ys_t_major)


def _fused_gru_bwd(interpret, residuals, cotangents):
  xp_t_major, wh, bn, h0, ys_t_major = residuals
  g_ys, g_hfinal = cotangents
  sdt = _stream_dtype(xp_t_major.dtype)
  # The backward streams four block arrays (g, xp, h_prev, dxp) plus the
  # resident wh and the dwh accumulator; block_t 8 overflows the 16 MB
  # scoped VMEM at the canonical H=512/B=64 shape, 4 fits — and larger
  # batches shrink block_t further to stay inside the budget.
  block_t = _pick_block_t_vmem(xp_t_major.shape[0], xp_t_major.shape[1],
                               wh.shape[0], _bwd_vmem_bytes, max_block=4,
                               itemsize=sdt.itemsize)

  g_t_major = jnp.swapaxes(g_ys, 0, 1).astype(jnp.float32)
  # The final carry is ys[:, -1]: fold its cotangent into the last step.
  g_t_major = g_t_major.at[-1].add(g_hfinal.astype(jnp.float32))
  # h_prev stream: h0 followed by ys[:-1], at the stream dtype (bf16 in
  # mixed mode - both in-kernel GEMM consumers cast to it regardless, and
  # halving this 130 MB stream is worth the one elementwise rounding).
  hprev_t_major = jnp.concatenate(
      [h0.astype(sdt)[jnp.newaxis], ys_t_major[:-1].astype(sdt)], axis=0)
  dxp_t, dh0, dwh, dbn2 = _pallas_gru_bwd(
      g_t_major, xp_t_major, hprev_t_major, wh.astype(sdt),
      bn.reshape(1, -1), block_t=block_t, interpret=interpret)
  return (jnp.swapaxes(dxp_t, 0, 1), dwh, dbn2[0],
          dh0.astype(h0.dtype))


fused_gru.defvjp(_fused_gru_fwd, _fused_gru_bwd)
