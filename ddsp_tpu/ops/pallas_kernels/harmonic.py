"""Fused harmonic-synthesis Pallas TPU kernel.

The training hot loop (SURVEY.md section 2.1 'oscillator bank'): given the
accumulated fundamental phase, synthesize

  audio[b, n] = sum_h mask(f0[n]*h) * A[b, n, h] * sin(phase0[b, n] * h)

where A is the 2-tap (hann 'window' or 'linear') upsampling of frame-rate
harmonic amplitudes. The jnp path materializes A and the per-harmonic phases
([batch, n_samples, n_harmonics], ~400 MB at the canonical workload) in HBM;
this kernel streams hop-aligned blocks through VMEM and fuses interpolation,
nyquist masking, sin, and the harmonic reduction into one pass, writing only
the [batch, n_samples] audio. A custom VJP runs the mirrored fused backward
(d_phase per sample; d_amplitude accumulated per (hop, tap) then folded to
frames outside the kernel).

Layout: samples are viewed as [n_hops, hop] so the 2 amplitude taps per
sample are frame rows k / k+1 - no gathers. Harmonics live on the 128-wide
lane axis (padded with zero amplitude). The frame-amplitude array is small
([n_frames+1, 128] per batch) and stays resident in VMEM across a batch
row's grid steps (constant block index -> no re-fetch).

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



def _pick_block_hops(n_hops: int) -> int:
  """Largest power-of-two block (8..64) with <= 15% hop padding waste.

  Bigger blocks amortize per-instruction VPU overhead (measured ~20% faster
  at 64 vs 8 on v5e for the canonical 250-hop workload); small frame counts
  fall back to small blocks to bound the zero-padding waste.
  """
  best = 8
  for b in (8, 16, 32, 64):
    padded = -(-n_hops // b) * b
    if padded <= 1.15 * n_hops or b == 8:
      best = b
  return best


def harmonic_kernel_supported(n_samples: int, n_frames: int,
                              n_harmonics: int) -> bool:
  """Shape constraints for the fused kernel (else use the jnp path)."""
  if n_harmonics > _LANES:
    return False
  if n_samples % n_frames != 0:
    return False
  hop = n_samples // n_frames
  # Lane-friendly hop; tiny hops are better served by XLA fusion.
  return hop % 128 == 0


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


def _fwd_kernel(phase_ref, f0_ref, ham_ref, rf_ref, out_ref, *,
                nyquist: float, block_hops: int, n_harmonics: int):
  """One (batch, hop-block): fused interp + mask + synth + reduce.

  Instead of 128-lane sin evaluations per sample, harmonics are generated
  with the Chebyshev recurrence sin((h+1)p) = 2cos(p)sin(hp) - sin((h-1)p):
  two transcendentals per sample total, then 2 MACs per harmonic on the VPU.
  The harmonic loop is unrolled with static lane indices (no dynamic lane
  slicing).

  phase_ref/f0_ref/out_ref: [1, K, hop]; ham_ref: [1, n_frames+1, LANES]
  (full frame axis, resident); rf_ref: [2, hop] (rise; fall).
  """
  import jax.experimental.pallas as pl  # pylint: disable=g-import-not-at-top

  k = phase_ref.shape[1]
  i = pl.program_id(1)

  phase = phase_ref[0, :, :]                              # [K, hop]
  f0 = f0_ref[0, :, :]
  rise = rf_ref[0:1, :]                                   # [1, hop]
  fall = rf_ref[1:2, :]

  ham_blk = ham_ref[0, pl.ds(i * block_hops, k + 1), :]   # [K+1, LANES]
  ham_lo = ham_blk[:k, :]
  ham_hi = ham_blk[1:, :]

  s_curr = jnp.sin(phase)
  two_c1 = 2.0 * jnp.cos(phase)
  s_prev = jnp.zeros_like(phase)

  acc_lo = jnp.zeros_like(phase)
  acc_hi = jnp.zeros_like(phase)
  for h in range(1, n_harmonics + 1):
    s_m = jnp.where(f0 * float(h) >= nyquist, 0.0, s_curr)
    acc_lo += ham_lo[:, h - 1:h] * s_m
    acc_hi += ham_hi[:, h - 1:h] * s_m
    if h < n_harmonics:
      s_next = two_c1 * s_curr - s_prev
      s_prev, s_curr = s_curr, s_next

  out_ref[0, :, :] = fall * acc_lo + rise * acc_hi


def _bwd_kernel(phase_ref, f0_ref, ham_ref, rf_ref, g_ref,
                dphase_ref, dham_parts_ref, *, nyquist: float,
                block_hops: int, n_harmonics: int):
  """Fused backward via the same sin/cos recurrences.

  dphase[s] = g[s] * sum_h A_h[s] * h * cos(h p_s) * mask
  dham_parts[0, k, h] = sum_d fall[d] * g[k, d] * mask * sin(h p)
  dham_parts[1, k, h] = sum_d rise[d] * g[k, d] * mask * sin(h p)
  """
  import jax.experimental.pallas as pl  # pylint: disable=g-import-not-at-top

  k = phase_ref.shape[1]
  i = pl.program_id(1)

  phase = phase_ref[0, :, :]
  f0 = f0_ref[0, :, :]
  rise = rf_ref[0:1, :]
  fall = rf_ref[1:2, :]
  g = g_ref[0, :, :]

  ham_blk = ham_ref[0, pl.ds(i * block_hops, k + 1), :]
  ham_lo = ham_blk[:k, :]
  ham_hi = ham_blk[1:, :]

  s_curr = jnp.sin(phase)
  c_curr = jnp.cos(phase)
  two_c1 = 2.0 * c_curr
  s_prev = jnp.zeros_like(phase)
  c_prev = jnp.ones_like(phase)

  gf = fall * g
  gr = rise * g

  dphase_acc = jnp.zeros_like(phase)
  lo_cols = []
  hi_cols = []
  for h in range(1, n_harmonics + 1):
    mask = f0 * float(h) < nyquist
    s_m = jnp.where(mask, s_curr, 0.0)
    c_m = jnp.where(mask, c_curr, 0.0)

    a_h = ham_lo[:, h - 1:h] * fall + ham_hi[:, h - 1:h] * rise
    dphase_acc += a_h * (float(h) * c_m)

    lo_cols.append(jnp.sum(gf * s_m, axis=1, keepdims=True))
    hi_cols.append(jnp.sum(gr * s_m, axis=1, keepdims=True))

    if h < n_harmonics:
      s_next = two_c1 * s_curr - s_prev
      c_next = two_c1 * c_curr - c_prev
      s_prev, s_curr = s_curr, s_next
      c_prev, c_curr = c_curr, c_next

  dphase_ref[0, :, :] = g * dphase_acc

  pad = _LANES - n_harmonics
  zeros = [jnp.zeros((k, pad), jnp.float32)] if pad else []
  dham_parts_ref[0, 0, :, :] = jnp.concatenate(lo_cols + zeros, axis=1)
  dham_parts_ref[0, 1, :, :] = jnp.concatenate(hi_cols + zeros, axis=1)


def _pallas_fwd(phase_r, f0_r, ham_pad, rf, *, n_hops, hop, nyquist,
                n_harmonics, block_hops, interpret):
  """phase_r/f0_r: [B, n_hops, hop]; ham_pad: [B, n_hops + 1, LANES]."""
  from jax.experimental import pallas as pl

  batch = phase_r.shape[0]
  n_frames_ext = ham_pad.shape[1]
  grid = (batch, n_hops // block_hops)
  blk3 = lambda b, i: (b, i, 0)

  return pl.pallas_call(
      functools.partial(_fwd_kernel, nyquist=nyquist,
                        block_hops=block_hops, n_harmonics=n_harmonics),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, block_hops, hop), blk3),
          pl.BlockSpec((1, block_hops, hop), blk3),
          pl.BlockSpec((1, n_frames_ext, _LANES), lambda b, i: (b, 0, 0)),
          pl.BlockSpec((2, hop), lambda b, i: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, block_hops, hop), blk3),
      out_shape=jax.ShapeDtypeStruct((batch, n_hops, hop), jnp.float32),
      interpret=interpret,
  )(phase_r, f0_r, ham_pad, rf)


def _pallas_bwd(phase_r, f0_r, ham_pad, rf, g_r, *, n_hops, hop, nyquist,
                n_harmonics, block_hops, interpret):
  from jax.experimental import pallas as pl

  batch = phase_r.shape[0]
  n_frames_ext = ham_pad.shape[1]
  grid = (batch, n_hops // block_hops)
  blk3 = lambda b, i: (b, i, 0)

  return pl.pallas_call(
      functools.partial(_bwd_kernel, nyquist=nyquist,
                        block_hops=block_hops, n_harmonics=n_harmonics),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, block_hops, hop), blk3),
          pl.BlockSpec((1, block_hops, hop), blk3),
          pl.BlockSpec((1, n_frames_ext, _LANES), lambda b, i: (b, 0, 0)),
          pl.BlockSpec((2, hop), lambda b, i: (0, 0)),
          pl.BlockSpec((1, block_hops, hop), blk3),
      ],
      out_specs=(
          pl.BlockSpec((1, block_hops, hop), blk3),
          pl.BlockSpec((1, 2, block_hops, _LANES),
                       lambda b, i: (b, 0, i, 0)),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((batch, n_hops, hop), jnp.float32),
          jax.ShapeDtypeStruct((batch, 2, n_hops, _LANES), jnp.float32),
      ),
      interpret=interpret,
  )(phase_r, f0_r, ham_pad, rf, g_r)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(phase0: Array, f0_env: Array, ham: Array,
           sample_rate: int, method: str, interpret: bool) -> Array:
  audio, _ = _fused_fwd(phase0, f0_env, ham, sample_rate, method, interpret)
  return audio


def _prep(phase0, f0_env, ham, method):
  """Reshape to hop-blocked layout; pad hops to a block multiple."""
  batch, n_samples = phase0.shape
  n_frames = ham.shape[1]
  hop = n_samples // n_frames
  n_hops = n_frames
  block_hops = _pick_block_hops(n_hops)
  n_hops_pad = -(-n_hops // block_hops) * block_hops
  pad_h = n_hops_pad - n_hops

  # Wrap the fundamental phase: with integer harmonic ratios,
  # sin(h * (phi mod 2pi)) == sin(h * phi) exactly, and the much smaller
  # arguments improve float32 sin accuracy for long signals.
  phase0 = phase0 % (2.0 * np.pi)
  phase_r = phase0.reshape(batch, n_hops, hop)
  f0_r = f0_env.reshape(batch, n_hops, hop)
  if pad_h:
    phase_r = jnp.pad(phase_r, ((0, 0), (0, pad_h), (0, 0)))
    f0_r = jnp.pad(f0_r, ((0, 0), (0, pad_h), (0, 0)))

  # Endpoint frame + hop padding (zero amps -> padded hops contribute 0)
  # + lane padding.
  ham_ext = jnp.concatenate([ham, ham[:, -1:, :]], axis=1)
  if pad_h:
    ham_ext = jnp.concatenate(
        [ham_ext, jnp.zeros((batch, pad_h, ham.shape[-1]),
                            ham_ext.dtype)], axis=1)
  lane_pad = _LANES - ham.shape[-1]
  ham_pad = jnp.pad(ham_ext, ((0, 0), (0, 0), (0, lane_pad)))

  rise, fall = _weights(hop, method)
  rf = jnp.asarray(np.stack([rise, fall]))
  return phase_r, f0_r, ham_pad, rf, n_hops, n_hops_pad, hop, block_hops


def _fused_fwd(phase0, f0_env, ham, sample_rate, method, interpret):
  (phase_r, f0_r, ham_pad, rf, n_hops, n_hops_pad, hop,
   block_hops) = _prep(phase0, f0_env, ham, method)
  audio = _pallas_fwd(phase_r, f0_r, ham_pad, rf, n_hops=n_hops_pad,
                      hop=hop, nyquist=sample_rate / 2.0,
                      n_harmonics=ham.shape[-1], block_hops=block_hops,
                      interpret=interpret)
  batch, n_samples = phase0.shape
  audio = audio[:, :n_hops, :].reshape(batch, n_samples)
  return audio, (phase0, f0_env, ham)


def _fused_bwd(sample_rate, method, interpret, residuals, g):
  phase0, f0_env, ham = residuals
  (phase_r, f0_r, ham_pad, rf, n_hops, n_hops_pad, hop,
   block_hops) = _prep(phase0, f0_env, ham, method)
  batch, n_samples = phase0.shape
  g_r = g.reshape(batch, n_hops, hop)
  if n_hops_pad != n_hops:
    g_r = jnp.pad(g_r, ((0, 0), (0, n_hops_pad - n_hops), (0, 0)))

  dphase_r, dham_parts = _pallas_bwd(
      phase_r, f0_r, ham_pad, rf, g_r, n_hops=n_hops_pad, hop=hop,
      nyquist=sample_rate / 2.0, n_harmonics=ham.shape[-1],
      block_hops=block_hops, interpret=interpret)

  dphase = dphase_r[:, :n_hops, :].reshape(batch, n_samples)
  # Fold per-hop tap contributions back to frames: frame t gets the 'fall'
  # part of hop t plus the 'rise' part of hop t-1; the endpoint frame's
  # rise part (hop T-1 -> frame T) folds back onto frame T-1 because the
  # endpoint was a copy of it.
  n_h = ham.shape[-1]
  fall_part = dham_parts[:, 0, :n_hops, :n_h]            # hop t -> frame t
  rise_part = dham_parts[:, 1, :n_hops, :n_h]            # hop t -> frame t+1
  dham = fall_part
  dham = dham.at[:, 1:, :].add(rise_part[:, :-1, :])
  dham = dham.at[:, -1:, :].add(rise_part[:, -1:, :])
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
