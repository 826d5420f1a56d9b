"""Large FFTs as MXU matmuls (four-step Cooley-Tukey).

XLA's TPU FFT runs far below the chip's matmul throughput (measured
~4.4 ms for a 131072-point rfft x16 batch on v5e - the dominant cost of
48k-tap reverbs). The four-step decomposition N = N1 * N2 turns one large
FFT into two batches of small DFTs, each expressed as a dense
[N1, N1] / [N2, N2] matrix product that maps straight onto the MXU, plus a
twiddle multiply:

  n = N2*n1 + n2,  k = k1 + N1*k2
  X[k1 + N1 k2] = sum_{n2} W_N^{k1 n2} W_{N2}^{k2 n2}
                  (sum_{n1} x[N2 n1 + n2] W_{N1}^{k1 n1})

Complex arithmetic is carried as (real, imag) float32 pairs so everything
stays in plain matmuls (differentiable through XLA as usual; no custom
VJP needed - the op is linear).

Used by fft_convolve for fft_size >= _MIN_MATMUL_FFT; jnp.fft remains the
path for small sizes (where XLA's FFT is fine) and on CPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_MIN_MATMUL_FFT = 16384


def _split_factors(n: int) -> Tuple[int, int]:
  """n = n1 * n2 with both factors pow2 and as square as possible."""
  log = int(np.log2(n))
  l1 = log // 2
  return 2**l1, 2**(log - l1)


@functools.lru_cache(maxsize=None)
def _dft_matrices(n: int) -> Tuple[np.ndarray, np.ndarray]:
  """[n, n] DFT matrix W^(jk) as (cos, -sin) float32 pair."""
  k = np.arange(n)
  ang = -2.0 * np.pi * np.outer(k, k) / n
  return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _twiddles(n1: int, n2: int) -> Tuple[np.ndarray, np.ndarray]:
  """[n1, n2] twiddle W_N^(k1 n2) as (cos, sin) float32 pair."""
  n = n1 * n2
  ang = -2.0 * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
  return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


# The TPU default decomposes f32 GEMMs into bf16 passes, which costs
# ~3.5e-3 mean error on 131k-point transforms - beyond the reference's
# 1e-3 convolution tolerance. HIGH (more bf16 passes) brings it to ~3e-5
# while staying ~1.75x faster than XLA's FFT; HIGHEST would be exact but
# forfeits most of the speedup.
_PRECISION = jax.lax.Precision.HIGH


def _einsum(spec, a, b):
  return jnp.einsum(spec, a, b, precision=_PRECISION)


def _fft_core(xr: Array, xi: Array, n: int,
              n_nonzero: int = 0) -> Tuple[Array, Array]:
  """Complex DFT of [..., n] via four-step matmuls; returns (re, im).

  n_nonzero > 0 asserts that only x[..., :n_nonzero] may be nonzero
  (zero-padded transforms): stage 1 then contracts only the
  ceil(n_nonzero / n2) live rows of the [n1, n2] input view, skipping the
  GEMM flops the padding would spend multiplying zeros. For the
  convolution path (frames padded 2x for linear convolution) this halves
  stage-1 work.
  """
  n1, n2 = _split_factors(n)
  batch_shape = xr.shape[:-1]
  # x[N2*n1 + n2] -> [batch, n1, n2]
  xr = xr.reshape(batch_shape + (n1, n2))
  xi = xi.reshape(batch_shape + (n1, n2))

  c1, s1 = _dft_matrices(n1)
  w1r, w1i = jnp.asarray(c1), jnp.asarray(s1)
  if 0 < n_nonzero < n:
    # Rows n1 >= ceil(n_nonzero / n2) of the input view are all zero
    # (x[N2*n1 + n2] with N2*n1 >= n_nonzero): slice them out of the
    # contraction entirely.
    live = -(-n_nonzero // n2)
    xr = xr[..., :live, :]
    xi = xi[..., :live, :]
    w1r = w1r[:, :live]
    w1i = w1i[:, :live]
  # A[k1, n2] = sum_n1 W1[k1, n1] x[n1, n2], contracting over n1 (axis -2).
  ar = (_einsum('kn,...nm->...km', w1r, xr) -
        _einsum('kn,...nm->...km', w1i, xi))
  ai = (_einsum('kn,...nm->...km', w1r, xi) +
        _einsum('kn,...nm->...km', w1i, xr))

  tc, ts = _twiddles(n1, n2)
  twr, twi = jnp.asarray(tc), jnp.asarray(ts)
  br = ar * twr - ai * twi
  bi = ar * twi + ai * twr

  c2, s2 = _dft_matrices(n2)
  w2r, w2i = jnp.asarray(c2), jnp.asarray(s2)
  # X[k1, k2] = sum_n2 B[k1, n2] W2[n2, k2]
  yr = (_einsum('...kn,nm->...km', br, w2r) -
        _einsum('...kn,nm->...km', bi, w2i))
  yi = (_einsum('...kn,nm->...km', br, w2i) +
        _einsum('...kn,nm->...km', bi, w2r))

  # k = k1 + N1*k2 -> flatten with k2 major.
  yr = jnp.swapaxes(yr, -1, -2).reshape(batch_shape + (n,))
  yi = jnp.swapaxes(yi, -1, -2).reshape(batch_shape + (n,))
  return yr, yi


def matmul_rfft(x: Array, fft_size: int) -> Tuple[Array, Array]:
  """rfft of real x (zero-padded to fft_size); returns (re, im) halves.

  Shapes: [..., m] -> ([..., fft_size//2 + 1],) * 2.

  Full-size four-step transform of the zero-imag input (XLA folds the
  imaginary-part GEMMs of the literal-zero operand), with stage-1 rows
  beyond the zero padding sliced out of the contraction (n_nonzero). A
  half-size even/odd-packed variant (fft(x[0::2] + i x[1::2]) + an O(N)
  untangle pass) was built and benchmarked in round 4: despite ~3x fewer
  GEMM MACs it measured ~0.5 ms/step SLOWER on the canonical reverb chain
  on v5e - the untangle's lane reversals and concats are HBM-bound VPU
  work that costs more than the (already fast, MXU-resident) GEMMs it
  saves - so the full-size transform is the shipped path.
  """
  m = x.shape[-1]
  if m > fft_size:
    # jnp.fft.rfft would truncate; no caller wants that silently, and the
    # four-step reshape below would fail with an opaque shape error.
    raise ValueError(f'matmul_rfft: frame length {m} exceeds fft_size '
                     f'{fft_size}; crop the input or raise fft_size.')
  if m < fft_size:
    pad = [(0, 0)] * (x.ndim - 1) + [(0, fft_size - m)]
    x = jnp.pad(x, pad)
  yr, yi = _fft_core(x, jnp.zeros_like(x), fft_size, n_nonzero=m)
  half = fft_size // 2 + 1
  return yr[..., :half], yi[..., :half]


def matmul_irfft(yr: Array, yi: Array, fft_size: int) -> Array:
  """Inverse rfft from (re, im) half-spectra -> real [..., fft_size].

  Reconstructs the hermitian full spectrum and evaluates the inverse DFT
  with the same four-step forward machinery on the conjugate
  (ifft(X) = conj(fft(conj(X))) / N; the result is real by symmetry).
  """
  # Full spectrum: X[n - k] = conj(X[k]) for k = 1..n/2-1.
  tail_r = yr[..., 1:-1][..., ::-1]
  tail_i = -yi[..., 1:-1][..., ::-1]
  full_r = jnp.concatenate([yr, tail_r], axis=-1)
  full_i = jnp.concatenate([yi, tail_i], axis=-1)
  # conj -> forward fft -> conj -> /N; real part (imag is ~0 by symmetry).
  zr, _ = _fft_core(full_r, -full_i, fft_size)
  return zr / fft_size


def complex_multiply(ar, ai, br, bi):
  """Elementwise complex multiply on (re, im) pairs."""
  return ar * br - ai * bi, ar * bi + ai * br


@functools.lru_cache(maxsize=None)
def _dft_half_matrices(size: int, fft_size: int, hann: bool = False):
  """[size, fft_size//2+1] half-spectrum DFT matrices (cos, sin pair).

  Equivalent to rfft of a size-point frame zero-padded to fft_size,
  evaluated as one GEMM (for magnitude-only STFTs in losses). hann=True
  folds a periodic hann window into the matrix rows (diag(w) @ D), so the
  STFT needs NO separate windowing pass over the frame tensor - XLA does
  not fuse elementwise producers into dot operands, so the explicit
  multiply costs a full read+write of the frames in HBM.
  """
  k = np.arange(size)[:, None] * np.arange(fft_size // 2 + 1)[None, :]
  ang = -2.0 * np.pi * k / fft_size
  c = np.cos(ang)
  s = np.sin(ang)
  if hann:
    # Same semantics as fftconv.hann_window (tf.signal periodic hann:
    # denominator N for even sizes, N-1 for odd).
    denom = size if size % 2 == 0 else size - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(size) / max(denom, 1))
    c = w[:, None] * c
    s = w[:, None] * s
  return (c.astype(np.float32), s.astype(np.float32))


def matmul_stft_mag(frames: Array, fft_size: int,
                    compute_dtype: str = 'float32',
                    hann: bool = False) -> Array:
  """|rfft(frames, fft_size)| via one MXU GEMM per (cos, sin).

  frames: [..., frame_size] frames (pre-windowed, or raw with hann=True
  to fold the periodic hann window into the DFT matrices). Returns
  [..., fft_size//2 + 1] magnitudes. ~2x faster than XLA's TPU FFT for the
  multi-scale spectral loss at training sizes, and never materializes
  complex intermediates. compute_dtype='bfloat16' runs the DFT GEMMs on
  the MXU bf16 path with float32 accumulation (~1.4x again; magnitudes
  within ~0.2% relative - fine for training losses, not for goldens).
  """
  c, s = _dft_half_matrices(frames.shape[-1], fft_size, hann=hann)
  dt = jnp.dtype(compute_dtype)
  if dt != jnp.float32:
    dn = (((frames.ndim - 1,), (0,)), ((), ()))
    fb = frames.astype(dt)
    re = jax.lax.dot_general(fb, jnp.asarray(c, dt), dn,
                             preferred_element_type=jnp.float32)
    im = jax.lax.dot_general(fb, jnp.asarray(s, dt), dn,
                             preferred_element_type=jnp.float32)
  else:
    re = _einsum('...s,sk->...k', frames, jnp.asarray(c))
    im = _einsum('...s,sk->...k', frames, jnp.asarray(s))
  # Floor at 1e-5 (= sqrt(1e-10)): matches safe_log's clamp for exactly
  # silent bins, so loss values agree with the |stft| path there.
  return jnp.sqrt(re * re + im * im + 1e-10)


@functools.lru_cache(maxsize=None)
def _irdft_half_matrices(fft_size: int):
  """[fft_size//2+1, fft_size] inverse-rfft matrices (A, B pair).

  x[t] = yr @ A + yi @ B for a hermitian half spectrum (yr, yi):
  x[t] = (1/N) [X0 + 2 sum_{0<k<N/2} (Re Xk cos - Im Xk sin) + XN/2 cos],
  folded into per-row weights w_k in {1, 2}.
  """
  n = fft_size
  half = n // 2 + 1
  ang = 2.0 * np.pi * np.outer(np.arange(half), np.arange(n)) / n
  w = np.full((half, 1), 2.0)
  w[0, 0] = 1.0
  w[-1, 0] = 1.0
  return ((w * np.cos(ang) / n).astype(np.float32),
          (-w * np.sin(ang) / n).astype(np.float32))


def matmul_rfft_small(x: Array, fft_size: int) -> Tuple[Array, Array]:
  """rfft of real [..., m<=fft_size] as two GEMMs; returns (re, im) halves.

  Direct (single-step) DFT matrices - for small transforms where the
  [m, fft_size//2+1] matrix is tiny; use matmul_rfft (four-step) for
  large sizes.
  """
  c, s = _dft_half_matrices(x.shape[-1], fft_size)
  return (_einsum('...s,sk->...k', x, jnp.asarray(c)),
          _einsum('...s,sk->...k', x, jnp.asarray(s)))


def matmul_irfft_small(yr: Array, yi: Array, fft_size: int) -> Array:
  """Inverse rfft from (re, im) half-spectra as two GEMMs -> [..., fft_size]."""
  a, b = _irdft_half_matrices(fft_size)
  return (_einsum('...k,kt->...t', yr, jnp.asarray(a)) +
          _einsum('...k,kt->...t', yi, jnp.asarray(b)))


def matmul_irfft_real_spectrum(yr: Array, fft_size: int) -> Array:
  """Inverse rfft of a purely-real (zero-phase) half spectrum: one GEMM.

  Used for frequency-sampling filter design, where the target spectrum is
  a magnitude curve (imag = 0).
  """
  a, _ = _irdft_half_matrices(fft_size)
  return _einsum('...k,kt->...t', yr, jnp.asarray(a))


@functools.lru_cache(maxsize=None)
def _filter_design_matrices(n_freqs: int, window_size: int, fft_size: int):
  """[n_freqs, fft_size//2+1] matrices: magnitude curve -> FIR spectrum.

  frequency_impulse_response (zero-phase irfft -> hann window -> causal
  rotation) followed by rfft at fft_size is linear in the magnitudes, so
  the whole frequency-sampling filter design collapses into one complex
  matrix, built here by pushing an identity batch through the reference
  pipeline (ops/fftconv.py). Returns (re, im) float32 numpy arrays.
  """
  from ddsp_tpu.ops import fftconv  # pylint: disable=g-import-not-at-top
  eye = np.eye(n_freqs, dtype=np.float32)
  # ensure_compile_time_eval: this builder may first be reached while
  # tracing a jit'd step (omnistaging would otherwise stage the windowing
  # ops and make the np.asarray below fail on a tracer); the matrices are
  # shape-only constants, so force eager evaluation and cache them.
  with jax.ensure_compile_time_eval():
    ir = np.asarray(fftconv.apply_window_to_impulse_response(
        np.fft.irfft(eye, axis=-1).astype(np.float32), window_size))
  assert ir.shape[-1] == fftconv.designed_ir_size(n_freqs, window_size), (
      ir.shape, n_freqs, window_size)
  spec = np.fft.rfft(ir, fft_size, axis=-1)
  return (spec.real.astype(np.float32), spec.imag.astype(np.float32))


def matmul_filter_design(magnitudes: Array, window_size: int,
                         fft_size: int) -> Tuple[Array, Array]:
  """FIR spectra for frequency-sampling design: two GEMMs.

  magnitudes: [..., n_freqs] transfer curve. Returns the rfft (re, im) of
  the windowed causal impulse response, zero-padded to fft_size - skipping
  the time-domain IR entirely.
  """
  c, s = _filter_design_matrices(int(magnitudes.shape[-1]), window_size,
                                 fft_size)
  return (_einsum('...m,mk->...k', magnitudes, jnp.asarray(c)),
          _einsum('...m,mk->...k', magnitudes, jnp.asarray(s)))


@functools.lru_cache(maxsize=None)
def _weighted_power_matrix(frame_size: int, fft_size: int,
                           weights: tuple, hann: bool = False):
  """Q [frame, frame] with sum_k w_k |rfft(f)_k|^2 == f @ Q @ f.

  The spectral reduction in A-weighted loudness is a fixed quadratic form
  of the (windowed) frame: |X_k|^2 = (f.C_k)^2 + (f.S_k)^2, so the
  weighted bin sum collapses to Q = C diag(w) C^T + S diag(w) S^T - one
  MXU GEMM + an elementwise multiply-reduce per frame instead of
  thousands of small FFTs. hann=True additionally folds the periodic hann
  analysis window into the form (Q' = diag(h) Q diag(h)), so the caller
  never materializes a windowed copy of the frame tensor. Built in
  float64, returned float32.
  """
  k = np.arange(frame_size)[:, None] * np.arange(fft_size // 2 + 1)[None, :]
  ang = -2.0 * np.pi * k / fft_size
  c = np.cos(ang)
  s = np.sin(ang)
  w = np.asarray(weights, np.float64)
  q = (c * w) @ c.T + (s * w) @ s.T
  if hann:
    denom = frame_size if frame_size % 2 == 0 else frame_size - 1
    h = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame_size)
                           / max(denom, 1))
    q = h[:, None] * q * h[None, :]
  return q.astype(np.float32)


def matmul_weighted_power(frames: Array, fft_size: int,
                          weights: tuple, hann: bool = False) -> Array:
  """sum_k weights[k] * |rfft(frames, fft_size)[..., k]|^2 via one GEMM.

  frames: [..., frame_size] (pre-windowed, or raw with hann=True to fold
  the periodic hann window into the quadratic form). Returns [...].
  """
  q = jnp.asarray(_weighted_power_matrix(frames.shape[-1], fft_size,
                                         tuple(weights), hann=hann))
  return jnp.sum(_einsum('...s,st->...t', frames, q) * frames, axis=-1)


# -----------------------------------------------------------------------
# Partitioned (block) convolution for long time-invariant FIRs.
# -----------------------------------------------------------------------
# A 48000-tap reverb over 4 s @ 16 kHz needs a 131072-point FFT when done
# as one transform; as four-step GEMMs that is ~39 GFLOP of matmul per
# chain step and was measured at 2.67 ms on v5e (~44% of the whole train
# step). Splitting the IR and audio into L-sample blocks and convolving
# in the frequency domain with a block delay line (uniform partitioned
# convolution: Y[m] = sum_{k+p=m} X[k] H[p], 2L-point FFTs) computes the
# identical linear convolution with ~3x fewer four-step GEMM flops
# (N(n1+n2) shrinks with N) while every transform still rides the MXU.
_PARTITION_BLOCK = 16384


def partitioned_convolve(audio: Array, impulse_response: Array,
                         block_size: int = 0,
                         out_start: int = 0,
                         out_len: int = 0) -> Array:
  """Linear convolution of audio with a long LTI FIR via block FFTs.

  Args:
    audio: [batch, time].
    impulse_response: [batch_ir, ir_size] with batch_ir in {1, batch}.
    block_size: Partition length L (power of two); 0 -> default.
    out_start: First sample of the zero-padded convolution to return.
    out_len: Number of samples to return; 0 -> everything from out_start
      to the end ((K + P) * L total, zero past time + ir_size - 1). Output
      frames entirely outside [out_start, out_start + out_len) are never
      inverse-transformed - e.g. reverb's 'same'/delay-0 crop drops the
      last ir_size samples of the tail, ~1/3 of the inverse FFT rows.

  Returns:
    Samples [out_start, out_start + out_len) of the linear convolution,
    [batch, out_len].
  """
  from ddsp_tpu.ops import fftconv  # pylint: disable=g-import-not-at-top
  block = block_size or _PARTITION_BLOCK
  fft_size = 2 * block
  batch, _ = audio.shape

  audio_frames = fftconv.frame(audio, block, block, pad_end=True)
  ir_frames = fftconv.frame(impulse_response, block, block, pad_end=True)
  n_audio_frames = int(audio_frames.shape[1])
  n_ir_frames = int(ir_frames.shape[1])
  n_out = n_audio_frames + n_ir_frames - 1
  total = (n_out + 1) * block  # OLA length: (n_out - 1) * L + 2L.

  if out_len <= 0:
    out_len = total - out_start
  if out_start < 0:
    raise ValueError(f'out_start must be >= 0, got {out_start}.')
  # The window may extend past the computed OLA length (delay-compensated
  # 'valid' crops reach into the all-zero tail); those samples are padded.
  avail = max(0, min(out_len, total - out_start))
  tail_pad = out_len - avail
  if avail == 0:
    # Degenerate window entirely past the convolution's support: all
    # zeros. (Also keeps the frame-slice math below from producing
    # zero-width matmul operands when out_start >= total.)
    return jnp.zeros((batch, max(out_len, 0)), dtype=jnp.float32)
  # Output frame m spans samples [m*L, m*L + 2L); keep frames overlapping
  # the requested window.
  m0 = max(0, -(-(out_start - fft_size + 1) // block))
  m1 = min(n_out, (out_start + max(avail, 1) - 1) // block + 1)
  m1 = max(m1, m0 + 1)

  ar, ai = matmul_rfft(audio_frames, fft_size)
  hr, hi = matmul_rfft(ir_frames, fft_size)

  # Frequency-domain block delay line: output frame m collects every
  # (audio frame k) x (ir block p) product with k + p = m. P is small and
  # static, so this unrolls to P fused multiply-accumulate slices (VPU
  # work ~1% of the GEMMs). Frames outside [m0, m1) are sliced away
  # before the inverse transform, and XLA dead-code-eliminates their
  # accumulation.
  half = fft_size // 2 + 1
  yr = jnp.zeros((batch, n_out, half), dtype=jnp.float32)
  yi = jnp.zeros((batch, n_out, half), dtype=jnp.float32)
  for p in range(n_ir_frames):
    pr, pi = complex_multiply(ar, ai, hr[:, p:p + 1], hi[:, p:p + 1])
    yr = yr.at[:, p:p + n_audio_frames].add(pr)
    yi = yi.at[:, p:p + n_audio_frames].add(pi)

  out_frames = matmul_irfft(yr[:, m0:m1], yi[:, m0:m1], fft_size)
  out = fftconv.overlap_and_add(out_frames, block)
  local_start = min(out_start, total) - m0 * block
  out = out[:, local_start:local_start + avail]
  if tail_pad:
    out = jnp.pad(out, ((0, 0), (0, tail_pad)))
  return out


def use_partitioned_fft(fft_size: int, n_ir_frames: int) -> bool:
  """Partitioned convolution pays off for long single-frame (LTI) FIRs."""
  return (n_ir_frames == 1 and fft_size >= _MIN_MATMUL_FFT and
          (fft_size & (fft_size - 1)) == 0 and
          jax.default_backend() == 'tpu')


_FORCE_MATMUL_DFT = False


class force_matmul_dft:  # pylint: disable=invalid-name
  """Context: take the GEMM-DFT paths regardless of backend.

  Used by the TFLite exporter - TFLite cannot legalize stablehlo.fft, but
  the direct-DFT GEMMs convert to plain fully-connected ops.
  """

  def __init__(self, enabled: bool = True):
    self._enabled = enabled
    self._prev = None

  def __enter__(self):
    global _FORCE_MATMUL_DFT
    self._prev = _FORCE_MATMUL_DFT
    _FORCE_MATMUL_DFT = self._enabled
    return self

  def __exit__(self, *exc):
    global _FORCE_MATMUL_DFT
    _FORCE_MATMUL_DFT = self._prev
    return False


def use_matmul_small_fft(fft_size: int) -> bool:
  """Direct-GEMM (i)rfft pays off for small batched transforms on TPU.

  The FilteredNoise LTV path does thousands of ~512-point transforms per
  step; XLA's TPU FFT is far from the MXU roofline there while the dense
  [N, N/2+1] DFT matrices are at most a few MB.
  """
  return (fft_size <= 4096 and (fft_size & (fft_size - 1)) == 0 and
          (_FORCE_MATMUL_DFT or jax.default_backend() == 'tpu'))


def use_matmul_stft(fft_size: int) -> bool:
  """Magnitude STFT via GEMM pays off at loss sizes on TPU."""
  return use_matmul_small_fft(fft_size)


def use_matmul_fft(fft_size: int) -> bool:
  """Matmul FFT pays off for large power-of-two sizes on TPU."""
  return (fft_size >= _MIN_MATMUL_FFT and
          (fft_size & (fft_size - 1)) == 0 and
          jax.default_backend() == 'tpu')
