"""Fused harmonic-synthesis Pallas TPU kernel.

The training hot loop (SURVEY.md section 2.1 'oscillator bank'): given the
accumulated fundamental phase, synthesize

  audio[b, n] = sum_h mask(f0[n]*h) * A[b, n, h] * sin(phase0[b, n] * h)

where A is the 2-tap (hann 'window' or 'linear') upsampling of frame-rate
harmonic amplitudes. The jnp path materializes A and the per-harmonic phases
([batch, n_samples, n_harmonics], ~400 MB at the canonical workload) in HBM;
this kernel streams lane-aligned sample blocks through VMEM and fuses
interpolation, nyquist masking, sin, and the harmonic reduction into one
pass, writing only the [batch, n_samples] audio. A custom VJP runs the
mirrored fused backward (d_phase per sample; d_amplitude accumulated per
(row, tap) then folded to frames outside the kernel).

Layout: samples are viewed as rows of width W on the 128-wide lane axis.
  * hop % 128 == 0: one hop per row, W = hop. Each sample needs the 2
    amplitude taps of frames k / k+1.
  * otherwise, when gcd(hop, 128) >= 32: P = 128 // gcd consecutive hops
    are packed per lane-aligned row, W = P * hop (a multiple of 128). A
    row spanning hops [P*r, P*r+P) needs the P+1 frames [P*r, P*r+P];
    tap j's interpolation weight is nonzero only on lane segments j
    (fall) and j-1 (rise), so the per-sample amplitude is a sum of P+1
    per-row scalars times fixed lane-weight vectors. This covers the
    canonical presets (time_steps=1000 over 64000 samples -> hop 64,
    P=2 W=128) and the 50 Hz VST streaming hops (320 @ 16 kHz -> P=2
    W=640; 960 @ 48 kHz -> P=2 W=1920) that a hop-aligned-only kernel
    would miss.
The frame-amplitude taps are pre-gathered outside the kernel into
[batch, P+1, n_rows, 128-lane harmonics] so the kernel does no gathers.

Replaces the compute of the reference's oscillator_bank
(/root/reference/ddsp/core.py:912) + upsample_with_windows
(/root/reference/ddsp/core.py:645) composition as used by
harmonic_synthesis (/root/reference/ddsp/core.py:1048); numerical parity
is pinned against the jnp path in tests/test_pallas_harmonic.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_LANES = 128


def _pick_block_rows(n_rows: int) -> int:
  """Largest power-of-two block (8..64) with <= 15% row padding waste.

  Bigger blocks amortize per-instruction VPU overhead (measured ~20% faster
  at 64 vs 8 on v5e for the canonical 250-hop workload); small row counts
  fall back to small blocks to bound the zero-padding waste.
  """
  best = 8
  for b in (8, 16, 32, 64):
    padded = -(-n_rows // b) * b
    if padded <= 1.15 * n_rows or b == 8:
      best = b
  return best


def _packing(hop: int) -> Optional[Tuple[int, int]]:
  """(P hops-per-row, W row width) for a supported hop, else None.

  Any hop whose gcd with the 128-lane width is >= 32 packs P = 128/gcd
  hops per row of width W = P*hop (a multiple of 128, so rows stay
  lane-aligned). P=1 hops (hop % 128 == 0) use the resident-taps layout;
  packed rows bound the tap count at P+1 <= 5. Covers hop 64 (canonical
  1000-frame presets), 32, and the 50 Hz VST hops 320 (16 kHz) and
  960 (48 kHz).
  """
  if hop % _LANES == 0:
    return 1, hop
  g = np.gcd(hop, _LANES)
  if g >= 32:
    p = _LANES // g
    return p, p * hop
  return None


# Per-core VMEM the kernels must fit in (v5e has 16 MiB scoped VMEM;
# leave headroom for Mosaic temporaries).
_VMEM_BUDGET_BYTES = int(16 * 1024 * 1024 * 0.9)


def _kernel_vmem_bytes(n_samples: int, hop: int) -> int:
  """Worst-case (backward) per-core VMEM footprint of the fused kernel.

  Streams (double-buffered): phase, f0, upstream grad in; dphase out -
  each a [block_rows, W] block - plus the taps: resident
  [n_rows_pad + 1, LANES] when P == 1 (held across a row's grid steps),
  else a [n_taps, block_rows, LANES] block.
  """
  p, w = _packing(hop)
  n_rows = -(-n_samples // w)
  block_rows = _pick_block_rows(n_rows)
  n_rows_pad = -(-n_rows // block_rows) * block_rows
  streams = 2 * 4 * block_rows * w * 4
  if p == 1:
    taps = (n_rows_pad + 1) * _LANES * 4
  else:
    taps = 2 * (p + 1) * block_rows * _LANES * 4
  return streams + taps


def harmonic_kernel_supported(n_samples: int, n_frames: int,
                              n_harmonics: int) -> bool:
  """Shape constraints for the fused kernel (else use the jnp path)."""
  if n_harmonics > _LANES:
    return False
  if n_samples % n_frames != 0:
    return False
  hop = n_samples // n_frames
  # Lane-friendly hops: either a multiple of the 128-lane width, or a
  # power-of-two fraction of it (multiple hops packed per lane row).
  if _packing(hop) is None:
    return False
  # VMEM bound: degenerate shapes (hop the size of the whole signal, or
  # resident taps for hours-long audio) would fail at Mosaic compile
  # time; fall back to the jnp path instead. Long audio should use
  # parallel.time_shard anyway.
  return _kernel_vmem_bytes(n_samples, hop) <= _VMEM_BUDGET_BYTES


def _weights(hop: int, method: str) -> Tuple[np.ndarray, np.ndarray]:
  """Per-sample (rise, fall) interpolation weights within a hop.

  'window': periodic-hann overlap-add taps (resample.upsample_with_windows);
  'linear': linear interpolation taps (resample._interp_linear with
  add_endpoint, whose source coords are n/hop exactly when n_out = T*hop).
  """
  d = np.arange(hop, dtype=np.float64)
  if method == 'window':
    window_length = 2 * hop
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(window_length) /
                             window_length)
    rise = win[:hop]
    fall = win[hop:]
  elif method == 'linear':
    rise = d / hop
    fall = 1.0 - d / hop
  else:
    raise ValueError(f'Unsupported amp_resample_method {method!r} for the '
                     'fused kernel.')
  return rise.astype(np.float32), fall.astype(np.float32)


def _tap_weights(hop: int, p: int, w: int, method: str) -> np.ndarray:
  """Lane-weight matrix [P+1, W]: row j = tap j's per-lane weight.

  Tap j covers frame P*r + j of row r: it contributes its 'fall' half on
  lane segment j (samples of hop P*r+j interpolating down from frame
  P*r+j) and its 'rise' half on segment j-1 (samples of hop P*r+j-1
  interpolating up toward frame P*r+j). For P=1 this is just
  [[fall], [rise]].
  """
  rise, fall = _weights(hop, method)
  rf = np.zeros((p + 1, w), dtype=np.float32)
  for j in range(p + 1):
    if j < p:
      rf[j, j * hop:(j + 1) * hop] += fall
    if j >= 1:
      rf[j, (j - 1) * hop:j * hop] += rise
  return rf


def _load_taps(taps_ref, n_taps, k, i, resident):
  """The n_taps per-row amplitude frames for this row block, [K, LANES] each.

  resident (P == 1): taps_ref is the full endpoint-extended frame array
  [1, n_frames_ext, LANES], constant across grid steps (stays in VMEM);
  taps j / j+1 are overlapping row windows - no precomputed copies.
  streamed (P > 1): taps_ref is the pre-gathered [1, n_taps, K, LANES]
  block (frames P*r + j interleave with stride P, which Mosaic can't
  slice from a resident array directly).
  """
  import jax.experimental.pallas as pl  # pylint: disable=g-import-not-at-top
  if resident:
    blk = taps_ref[0, pl.ds(i * k, k + 1), :]             # [K+1, LANES]
    return [blk[:k, :], blk[1:, :]]
  return [taps_ref[0, j, :, :] for j in range(n_taps)]


def _fwd_kernel(phase_ref, f0_ref, taps_ref, rf_ref, out_ref, *,
                nyquist: float, n_harmonics: int, n_taps: int,
                resident: bool):
  """One (batch, row-block): fused interp + mask + synth + reduce.

  Instead of 128-lane sin evaluations per sample, harmonics are generated
  with the Chebyshev recurrence sin((h+1)p) = 2cos(p)sin(hp) - sin((h-1)p):
  two transcendentals per sample total, then n_taps MACs per harmonic on
  the VPU. The harmonic loop is unrolled with static lane indices (no
  dynamic lane slicing).

  phase_ref/f0_ref/out_ref: [1, K, W]; taps_ref: see _load_taps;
  rf_ref: [n_taps, W] lane weights.
  """
  import jax.experimental.pallas as pl  # pylint: disable=g-import-not-at-top
  phase = phase_ref[0, :, :]                              # [K, W]
  f0 = f0_ref[0, :, :]
  tap_amps = _load_taps(taps_ref, n_taps, phase.shape[0],
                        pl.program_id(1), resident)

  s_curr = jnp.sin(phase)
  two_c1 = 2.0 * jnp.cos(phase)
  s_prev = jnp.zeros_like(phase)
  # Hoist the nyquist threshold out of the harmonic loop: comparing the
  # per-sample max harmonic index against the (static) loop index saves
  # the f0 * h multiply per sample per harmonic (~3% of kernel time;
  # identical mask: f0 * h >= nyquist  <=>  h >= nyquist / f0).
  hmax = nyquist / jnp.maximum(f0, 1e-20)

  accs = [jnp.zeros_like(phase) for _ in range(n_taps)]
  for h in range(1, n_harmonics + 1):
    s_m = jnp.where(hmax <= float(h), 0.0, s_curr)
    for j in range(n_taps):
      accs[j] += tap_amps[j][:, h - 1:h] * s_m
    if h < n_harmonics:
      s_next = two_c1 * s_curr - s_prev
      s_prev, s_curr = s_curr, s_next

  out = rf_ref[0:1, :] * accs[0]
  for j in range(1, n_taps):
    out += rf_ref[j:j + 1, :] * accs[j]
  out_ref[0, :, :] = out


def _bwd_taps_kernel(phase_ref, f0_ref, rf_ref, g_ref, dtaps_ref, *,
                     nyquist: float, n_harmonics: int, n_taps: int):
  """Amplitude-tap cotangents (the training hot path; no taps input).

  dtaps[j, k, h] = sum_l rf[j, l] * g[k, l] * mask * sin(h p). Needs only
  the sin Chebyshev chain.
  """
  phase = phase_ref[0, :, :]
  f0 = f0_ref[0, :, :]
  g = g_ref[0, :, :]

  s_curr = jnp.sin(phase)
  two_c1 = 2.0 * jnp.cos(phase)
  s_prev = jnp.zeros_like(phase)
  # Same hoisted-threshold mask as the forward (keeps fwd/bwd masks
  # bit-identical at nyquist boundaries).
  hmax = nyquist / jnp.maximum(f0, 1e-20)

  # Weighted upstream gradients, one per tap (hoisted out of the h loop).
  gw = [rf_ref[j:j + 1, :] * g for j in range(n_taps)]
  k = phase.shape[0]

  cols = [[] for _ in range(n_taps)]
  for h in range(1, n_harmonics + 1):
    s_m = jnp.where(hmax <= float(h), 0.0, s_curr)
    for j in range(n_taps):
      cols[j].append(jnp.sum(gw[j] * s_m, axis=1, keepdims=True))
    if h < n_harmonics:
      s_next = two_c1 * s_curr - s_prev
      s_prev, s_curr = s_curr, s_next

  pad = _LANES - n_harmonics
  zeros = [jnp.zeros((k, pad), jnp.float32)] if pad else []
  for j in range(n_taps):
    dtaps_ref[0, j, :, :] = jnp.concatenate(cols[j] + zeros, axis=1)


def _bwd_phase_kernel(phase_ref, f0_ref, taps_ref, rf_ref, g_ref,
                      dphase_ref, *, nyquist: float, n_harmonics: int,
                      n_taps: int, resident: bool):
  """Phase cotangent: dphase[s] = g[s] * sum_h A_h[s] * h * cos(h p) * mask.

  A separate kernel from the tap cotangents so that models whose f0 comes
  from the dataset (no gradient path through the phase - the flagship
  training configs) let XLA dead-code-eliminate this call entirely. Needs
  only the cos Chebyshev chain.
  """
  import jax.experimental.pallas as pl  # pylint: disable=g-import-not-at-top
  phase = phase_ref[0, :, :]
  f0 = f0_ref[0, :, :]
  g = g_ref[0, :, :]
  tap_amps = _load_taps(taps_ref, n_taps, phase.shape[0],
                        pl.program_id(1), resident)

  c_curr = jnp.cos(phase)
  two_c1 = 2.0 * c_curr
  c_prev = jnp.ones_like(phase)
  hmax = nyquist / jnp.maximum(f0, 1e-20)

  dphase_acc = jnp.zeros_like(phase)
  for h in range(1, n_harmonics + 1):
    c_m = jnp.where(hmax <= float(h), 0.0, c_curr)
    a_h = tap_amps[0][:, h - 1:h] * rf_ref[0:1, :]
    for j in range(1, n_taps):
      a_h += tap_amps[j][:, h - 1:h] * rf_ref[j:j + 1, :]
    dphase_acc += a_h * (float(h) * c_m)
    if h < n_harmonics:
      c_next = two_c1 * c_curr - c_prev
      c_prev, c_curr = c_curr, c_next

  dphase_ref[0, :, :] = g * dphase_acc


def _taps_spec(taps, n_taps, block_rows, resident):
  from jax.experimental import pallas as pl
  if resident:
    # Full frame array, constant index map: fetched once per batch row and
    # kept resident in VMEM across that row's grid steps.
    return pl.BlockSpec((1, taps.shape[1], _LANES), lambda b, i: (b, 0, 0))
  return pl.BlockSpec((1, n_taps, block_rows, _LANES),
                      lambda b, i: (b, 0, i, 0))


def _pallas_fwd(phase_r, f0_r, taps, rf, *, w, nyquist, n_harmonics,
                n_taps, block_rows, resident, interpret):
  """phase_r/f0_r: [B, n_rows, W]; taps: resident [B, n_rows + 1, LANES]
  or streamed [B, n_taps, n_rows, LANES]."""
  from jax.experimental import pallas as pl

  batch, n_rows = phase_r.shape[0], phase_r.shape[1]
  grid = (batch, n_rows // block_rows)
  blk3 = lambda b, i: (b, i, 0)

  return pl.pallas_call(
      functools.partial(_fwd_kernel, nyquist=nyquist,
                        n_harmonics=n_harmonics, n_taps=n_taps,
                        resident=resident),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, block_rows, w), blk3),
          pl.BlockSpec((1, block_rows, w), blk3),
          _taps_spec(taps, n_taps, block_rows, resident),
          pl.BlockSpec((n_taps, w), lambda b, i: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, block_rows, w), blk3),
      out_shape=jax.ShapeDtypeStruct((batch, n_rows, w), jnp.float32),
      interpret=interpret,
  )(phase_r, f0_r, taps, rf)


def _pallas_bwd_taps(phase_r, f0_r, rf, g_r, *, w, nyquist, n_harmonics,
                     n_taps, block_rows, interpret):
  from jax.experimental import pallas as pl

  batch, n_rows = phase_r.shape[0], phase_r.shape[1]
  grid = (batch, n_rows // block_rows)
  blk3 = lambda b, i: (b, i, 0)

  return pl.pallas_call(
      functools.partial(_bwd_taps_kernel, nyquist=nyquist,
                        n_harmonics=n_harmonics, n_taps=n_taps),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, block_rows, w), blk3),
          pl.BlockSpec((1, block_rows, w), blk3),
          pl.BlockSpec((n_taps, w), lambda b, i: (0, 0)),
          pl.BlockSpec((1, block_rows, w), blk3),
      ],
      out_specs=pl.BlockSpec((1, n_taps, block_rows, _LANES),
                             lambda b, i: (b, 0, i, 0)),
      out_shape=jax.ShapeDtypeStruct((batch, n_taps, n_rows, _LANES),
                                     jnp.float32),
      interpret=interpret,
  )(phase_r, f0_r, rf, g_r)


def _pallas_bwd_phase(phase_r, f0_r, taps, rf, g_r, *, w, nyquist,
                      n_harmonics, n_taps, block_rows, resident,
                      interpret):
  from jax.experimental import pallas as pl

  batch, n_rows = phase_r.shape[0], phase_r.shape[1]
  grid = (batch, n_rows // block_rows)
  blk3 = lambda b, i: (b, i, 0)

  return pl.pallas_call(
      functools.partial(_bwd_phase_kernel, nyquist=nyquist,
                        n_harmonics=n_harmonics, n_taps=n_taps,
                        resident=resident),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, block_rows, w), blk3),
          pl.BlockSpec((1, block_rows, w), blk3),
          _taps_spec(taps, n_taps, block_rows, resident),
          pl.BlockSpec((n_taps, w), lambda b, i: (0, 0)),
          pl.BlockSpec((1, block_rows, w), blk3),
      ],
      out_specs=pl.BlockSpec((1, block_rows, w), blk3),
      out_shape=jax.ShapeDtypeStruct((batch, n_rows, w), jnp.float32),
      interpret=interpret,
  )(phase_r, f0_r, taps, rf, g_r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(phase0: Array, f0_env: Array, ham: Array,
           sample_rate: int, method: str, interpret: bool) -> Array:
  audio, _ = _fused_fwd(phase0, f0_env, ham, sample_rate, method, interpret)
  return audio


def _prep(phase0, f0_env, ham, method):
  """Reshape to row-blocked layout; pad rows to a block multiple.

  Returns (phase_r, f0_r, taps, rf, geometry...) where taps[b, j, r, :] is
  frame P*r + j of the endpoint-extended, zero-padded, 128-lane-padded
  amplitude array — the P+1 frames each packed row interpolates between.
  """
  batch, n_samples = phase0.shape
  n_frames = ham.shape[1]
  hop = n_samples // n_frames
  p, w = _packing(hop)
  n_taps = p + 1
  n_hops = n_frames

  n_rows = -(-n_hops // p)
  block_rows = _pick_block_rows(n_rows)
  n_rows_pad = -(-n_rows // block_rows) * block_rows
  hops_pad = n_rows_pad * p - n_hops

  # Wrap the fundamental phase: with integer harmonic ratios,
  # sin(h * (phi mod 2pi)) == sin(h * phi) exactly, and the much smaller
  # arguments improve float32 sin accuracy for long signals.
  phase0 = phase0 % (2.0 * np.pi)
  if hops_pad:
    phase0 = jnp.pad(phase0, ((0, 0), (0, hops_pad * hop)))
    f0_env = jnp.pad(f0_env, ((0, 0), (0, hops_pad * hop)))
  phase_r = phase0.reshape(batch, n_rows_pad, w)
  f0_r = f0_env.reshape(batch, n_rows_pad, w)

  # Endpoint frame + hop padding (zero amps -> padded hops contribute 0)
  # + lane padding; then gather the P+1 interleaved tap streams.
  ham_ext = jnp.concatenate([ham, ham[:, -1:, :]], axis=1)
  frames_needed = n_rows_pad * p + 1
  extra = frames_needed - ham_ext.shape[1]
  if extra > 0:
    ham_ext = jnp.concatenate(
        [ham_ext, jnp.zeros((batch, extra, ham.shape[-1]),
                            ham_ext.dtype)], axis=1)
  lane_pad = _LANES - ham.shape[-1]
  ham_pad = jnp.pad(ham_ext, ((0, 0), (0, 0), (0, lane_pad)))
  if p == 1:
    # Resident layout: the kernel windows taps j / j+1 out of the frame
    # array directly (stride-1 overlapping rows), no gathered copies.
    taps = ham_pad  # [B, n_rows_pad + 1, LANES]
  else:
    taps = jnp.stack(
        [ham_pad[:, j:j + p * n_rows_pad:p, :] for j in range(n_taps)],
        axis=1)  # [B, n_taps, n_rows_pad, LANES]

  rf = jnp.asarray(_tap_weights(hop, p, w, method))
  return (phase_r, f0_r, taps, rf, n_rows, n_rows_pad, hop, p, w,
          block_rows)


def _fused_fwd(phase0, f0_env, ham, sample_rate, method, interpret):
  (phase_r, f0_r, taps, rf, n_rows, n_rows_pad, hop, p, w,
   block_rows) = _prep(phase0, f0_env, ham, method)
  del n_rows, hop
  audio = _pallas_fwd(phase_r, f0_r, taps, rf, w=w,
                      nyquist=sample_rate / 2.0,
                      n_harmonics=ham.shape[-1], n_taps=rf.shape[0],
                      block_rows=block_rows, resident=(p == 1),
                      interpret=interpret)
  batch, n_samples = phase0.shape
  audio = audio.reshape(batch, n_rows_pad * w)[:, :n_samples]
  return audio, (phase0, f0_env, ham)


def _fused_bwd(sample_rate, method, interpret, residuals, g):
  phase0, f0_env, ham = residuals
  (phase_r, f0_r, taps, rf, n_rows, n_rows_pad, hop, p, w,
   block_rows) = _prep(phase0, f0_env, ham, method)
  del n_rows
  batch, n_samples = phase0.shape
  n_taps = rf.shape[0]
  if n_rows_pad * w != n_samples:
    g = jnp.pad(g, ((0, 0), (0, n_rows_pad * w - n_samples)))
  g_r = g.reshape(batch, n_rows_pad, w)

  # Two independent kernels: when the phase cotangent is unused downstream
  # (f0 from the dataset - the flagship training case), XLA removes the
  # phase kernel entirely; each kernel also only runs the half of the
  # sin/cos Chebyshev chains it needs.
  dtaps = _pallas_bwd_taps(
      phase_r, f0_r, rf, g_r, w=w, nyquist=sample_rate / 2.0,
      n_harmonics=ham.shape[-1], n_taps=n_taps, block_rows=block_rows,
      interpret=interpret)
  dphase_r = _pallas_bwd_phase(
      phase_r, f0_r, taps, rf, g_r, w=w, nyquist=sample_rate / 2.0,
      n_harmonics=ham.shape[-1], n_taps=n_taps, block_rows=block_rows,
      resident=(p == 1), interpret=interpret)

  dphase = dphase_r.reshape(batch, n_rows_pad * w)[:, :n_samples]
  # Scatter per-(row, tap) contributions back to frames: frame P*r + j
  # receives tap j of row r (padded rows contribute zero because the
  # upstream gradient was zero-padded); then the endpoint frame's gradient
  # folds onto the last real frame because the endpoint was a copy of it.
  n_h = ham.shape[-1]
  n_frames = ham.shape[1]
  dham_full = jnp.zeros((batch, n_rows_pad * p + 1, n_h), jnp.float32)
  for j in range(n_taps):
    dham_full = dham_full.at[:, j:j + p * n_rows_pad:p, :].add(
        dtaps[:, j, :, :n_h])
  dham = dham_full[:, :n_frames, :]
  dham = dham.at[:, -1, :].add(dham_full[:, n_frames, :])
  # No gradient to f0 through the (piecewise-constant) nyquist mask.
  return dphase, jnp.zeros_like(f0_env), dham


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_harmonic_synthesis(phase0: Array, f0_env: Array, ham: Array,
                             sample_rate: int = 16000,
                             amp_resample_method: str = 'window',
                             interpret: Optional[bool] = None) -> Array:
  """Fused audio synthesis from fundamental phase + frame amplitudes.

  Args:
    phase0: Accumulated fundamental phase (radians), [batch, n_samples].
    f0_env: Fundamental frequency envelope (Hz), [batch, n_samples]
      (nyquist masking only).
    ham: Frame-rate harmonic amplitudes (amplitude * harmonic distribution),
      [batch, n_frames, n_harmonics]; n_samples % n_frames == 0.
    sample_rate: Hz.
    amp_resample_method: 'window' or 'linear' 2-tap upsampling.
    interpret: Force pallas interpret mode (auto: True off-TPU).

  Returns:
    audio: [batch, n_samples].
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  return _fused(phase0, f0_env, ham, sample_rate, amp_resample_method,
                bool(interpret))
