"""Time-varying FFT convolution and FIR filter design.

Reference behavior: /root/reference/ddsp/core.py:1316-1691 (`get_fft_size`,
`crop_and_compensate_delay`, `fft_convolve`,
`apply_window_to_impulse_response`, `frequency_impulse_response`, `sinc`,
`sinc_impulse_response`, `frequency_filter`, `sinc_filter`).

TPU-first design notes:
  * FFT sizes are constrained to powers of two (TPU FFT requirement, which
    the reference also notes).
  * `overlap_and_add` is implemented as a pad-and-fold: each frame is split
    into ceil(fft/hop) hop-sized chunks and the k diagonals are added as k
    statically-shifted slice updates. Fully vectorized, no scatter.
  * Everything is differentiable through jnp.fft rfft/irfft.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.core import jnp_float32

Array = jax.Array


def hann_window(window_size: int) -> Array:
  """Periodic hann window matching tf.signal.hann_window(periodic=True).

  TF extends to a symmetric window of length N+1 and drops the last sample;
  for odd N this reduces to a denominator of N-1, for even N to N.
  """
  denom = window_size if window_size % 2 == 0 else window_size - 1
  t = jnp.arange(window_size, dtype=jnp.float32)
  return 0.5 - 0.5 * jnp.cos(2.0 * np.pi * t / max(denom, 1))


def get_fft_size(frame_size: int, ir_size: int,
                 power_of_2: bool = True) -> int:
  """Calculate final size for efficient FFT (next power of 2)."""
  convolved_frame_size = ir_size + frame_size - 1
  if power_of_2:
    fft_size = int(2**np.ceil(np.log2(convolved_frame_size)))
  else:
    import scipy.fftpack  # pylint: disable=g-import-not-at-top
    fft_size = int(scipy.fftpack.helper.next_fast_len(convolved_frame_size))
  return fft_size


def frame(signal: Array,
          frame_length: int,
          frame_step: int,
          pad_end: bool = False,
          pad_value: float = 0.0,
          axis: int = -1) -> Array:
  """Frame a signal into overlapping windows along an axis.

  Equivalent semantics to tf.signal.frame: with pad_end=True the signal is
  zero-padded so n_frames = ceil(T / frame_step); with pad_end=False
  n_frames = 1 + (T - frame_length) // frame_step.
  """
  signal = jnp.asarray(signal)
  axis = axis % signal.ndim
  n = signal.shape[axis]

  if pad_end:
    n_frames = -(-n // frame_step)  # ceil
    pad_len = max(0, (n_frames - 1) * frame_step + frame_length - n)
    if pad_len:
      pads = [(0, 0)] * signal.ndim
      pads[axis] = (0, pad_len)
      signal = jnp.pad(signal, pads, constant_values=pad_value)
  else:
    n_frames = 1 + (n - frame_length) // frame_step if n >= frame_length else 0

  if (frame_length % frame_step == 0 and axis == signal.ndim - 1 and
      frame_length // frame_step <= 16):
    # TPU fast path: when the hop divides the frame, overlapping frames are
    # k = frame/hop shifted views of hop-sized chunks - k static slices +
    # one concat instead of a gather (gathers don't tile well on TPU).
    # Only worth it for small k: frame_step=1 (variable_length_delay)
    # would emit frame_length slices + a frame_length-operand concat,
    # bloating the HLO far beyond the general path's single gather.
    k = frame_length // frame_step
    total = (n_frames + k - 1) * frame_step
    length = signal.shape[-1]
    if total != length:
      pads = [(0, 0)] * (signal.ndim - 1) + [(0, max(0, total - length))]
      signal = jnp.pad(signal[..., :total], pads)
    chunks = jnp.reshape(signal,
                         signal.shape[:-1] + (n_frames + k - 1, frame_step))
    parts = [chunks[..., j:j + n_frames, :] for j in range(k)]
    return jnp.concatenate(parts, axis=-1)

  # General path: gather with a static index matrix.
  idx = (np.arange(n_frames)[:, None] * frame_step
         + np.arange(frame_length)[None, :])
  frames = jnp.take(signal, jnp.asarray(idx.astype(np.int32)), axis=axis)
  # jnp.take inserts the new axes in place of `axis`:
  # result shape [..., n_frames, frame_length, ...].
  return frames


def overlap_and_add(frames: Array, frame_step: int) -> Array:
  """Reconstruct a signal from overlapping frames (tf.signal.overlap_and_add).

  Args:
    frames: Shape [..., n_frames, frame_length].
    frame_step: Hop size between frames.

  Returns:
    Signal of shape [..., (n_frames - 1) * frame_step + frame_length].

  Implementation: pad-and-fold. Pad frame_length up to a multiple of
  frame_step (k chunks), view as k diagonals of hop-sized segments, and add
  the k statically-shifted diagonals. k is small and static, so this compiles
  to k fused slice-adds - no scatter, no serial loop.
  """
  frames = jnp.asarray(frames)
  *batch_shape, n_frames, frame_length = frames.shape
  out_length = (n_frames - 1) * frame_step + frame_length

  k = -(-frame_length // frame_step)  # ceil(frame_length / frame_step)
  padded_len = k * frame_step
  if padded_len != frame_length:
    frames = jnp.pad(
        frames,
        [(0, 0)] * len(batch_shape) + [(0, 0), (0, padded_len - frame_length)])

  # [..., n_frames, k, frame_step]
  chunks = jnp.reshape(frames,
                       tuple(batch_shape) + (n_frames, k, frame_step))

  # Output segment s = sum_j chunks[s - j, j]; accumulate k shifted diagonals.
  n_segments = n_frames + k - 1
  seg_axis = len(batch_shape)
  out = jnp.zeros(tuple(batch_shape) + (n_segments, frame_step),
                  dtype=frames.dtype)
  for j in range(k):
    out = jax.lax.dynamic_update_slice_in_dim(
        out,
        jax.lax.dynamic_slice_in_dim(out, j, n_frames, axis=seg_axis)
        + chunks[..., :, j, :],
        j,
        axis=seg_axis)
  out = jnp.reshape(out, tuple(batch_shape) + (n_segments * frame_step,))
  return out[..., :out_length]


def crop_and_compensate_delay(audio: Array, audio_size: int, ir_size: int,
                              padding: str,
                              delay_compensation: int) -> Array:
  """Crop audio output from convolution to compensate for group delay.

  Args:
    audio: Audio after convolution. Shape [batch, time_steps].
    audio_size: Initial size of the audio before convolution.
    ir_size: Size of the convolving impulse response.
    padding: 'valid' or 'same'. 'same' returns audio_size samples, 'valid'
      returns audio_size + ir_size - 1.
    delay_compensation: Samples to crop from the start of the output to
      compensate for the filter group delay; if negative, defaults to the
      constant group delay of a windowed linear-phase filter from
      frequency_impulse_response ((ir_size - 1) // 2 - 1).

  Returns:
    Cropped and shifted audio.
  """
  if padding == 'valid':
    crop_size = ir_size + audio_size - 1
  elif padding == 'same':
    crop_size = audio_size
  else:
    raise ValueError(f"Padding must be 'valid' or 'same', instead of "
                     f'{padding}.')

  total_size = int(audio.shape[-1])
  crop = total_size - crop_size
  start = ((ir_size - 1) // 2 - 1 if delay_compensation < 0
           else delay_compensation)
  end = crop - start
  # `audio[:, start:-end]` with end <= 0 would slice to EMPTY (the -0
  # footgun), which happens for 'valid' padding whenever the conv length
  # is exactly a power of two (crop == 0 < start). The delay-compensated
  # window extends past the computed convolution, whose remaining samples
  # are genuinely zero - pad them so the output still has crop_size
  # samples.
  if end <= 0:
    return jnp.pad(audio[:, start:total_size], ((0, 0), (0, -end)))
  return audio[:, start:-end]


def fft_convolve(audio: Array,
                 impulse_response: Array,
                 padding: str = 'same',
                 delay_compensation: int = -1) -> Array:
  """Filter audio with frames of time-varying impulse responses.

  Given audio [batch, n_samples] and impulse responses [batch, n_frames,
  ir_size], splits the audio into non-overlapping frames (one per IR frame),
  multiplies in the frequency domain, and overlap-adds the filtered frames.

  Args:
    audio: Input audio. Shape [batch, audio_timesteps].
    impulse_response: FIR filters. Either [batch, ir_size] (LTI) or
      [batch, ir_frames, ir_size] (LTV).
    padding: 'valid' or 'same'.
    delay_compensation: Samples to crop from the start (see
      crop_and_compensate_delay).

  Returns:
    audio_out: Convolved audio, [batch, audio_timesteps + ir_size - 1]
      ('valid') or [batch, audio_timesteps] ('same').

  Raises:
    ValueError: If audio and impulse response have incompatible batch sizes,
      or the audio cannot be evenly framed.
  """
  audio = jnp_float32(audio)
  impulse_response = jnp_float32(impulse_response)

  batch_size, audio_size = audio.shape

  if impulse_response.ndim == 2:
    impulse_response = impulse_response[:, jnp.newaxis, :]

  batch_size_ir, n_ir_frames, ir_size = impulse_response.shape
  if batch_size_ir not in (1, batch_size):
    raise ValueError(f'Batch size of audio ({batch_size}) and impulse '
                     f'response ({batch_size_ir}) must be the same.')

  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
  if padding not in ('valid', 'same'):
    raise ValueError(f"Padding must be 'valid' or 'same', instead of "
                     f'{padding}.')
  crop_start = ((ir_size - 1) // 2 - 1 if delay_compensation < 0
                else delay_compensation)
  if fft_matmul.use_partitioned_fft(
      get_fft_size(int(np.ceil(audio_size / n_ir_frames)), ir_size,
                   power_of_2=True), n_ir_frames) and crop_start >= 0:
    # Long time-invariant FIR (48k-tap reverb): uniform partitioned
    # convolution with 2L-point block FFTs instead of one huge transform -
    # identical linear convolution, ~3x fewer GEMM flops (fft_matmul.py).
    # Runs before the batch tile so a shared (batch-1) IR is transformed
    # once and broadcast in the frequency domain; the crop window is
    # pushed into the kernel so fully-cropped output frames are never
    # inverse-transformed.
    crop_size = (ir_size + audio_size - 1 if padding == 'valid'
                 else audio_size)
    return fft_matmul.partitioned_convolve(audio,
                                           impulse_response[:, 0, :],
                                           out_start=crop_start,
                                           out_len=crop_size)

  if batch_size_ir == 1 and batch_size > 1:
    impulse_response = jnp.tile(impulse_response, (batch_size, 1, 1))

  # Cut audio into non-overlapping frames, one per IR frame.
  frame_size = int(np.ceil(audio_size / n_ir_frames))
  hop_size = frame_size
  audio_frames = frame(audio, frame_size, hop_size, pad_end=True)

  n_audio_frames = int(audio_frames.shape[1])
  if n_audio_frames != n_ir_frames:
    raise ValueError(
        f'Number of Audio frames ({n_audio_frames}) and impulse response '
        f'frames ({n_ir_frames}) do not match. For small hop size = '
        'ceil(audio_size / n_ir_frames), number of impulse response frames '
        'must be a multiple of the audio size.')

  fft_size = get_fft_size(frame_size, ir_size, power_of_2=True)

  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
  if fft_matmul.use_matmul_fft(fft_size):
    # Large FFTs (48k-tap reverbs -> 131072 points) run ~4x faster as
    # four-step MXU matmuls than through XLA's TPU FFT.
    a_r, a_i = fft_matmul.matmul_rfft(audio_frames, fft_size)
    i_r, i_i = fft_matmul.matmul_rfft(impulse_response, fft_size)
    p_r, p_i = fft_matmul.complex_multiply(a_r, a_i, i_r, i_i)
    audio_frames_out = fft_matmul.matmul_irfft(p_r, p_i, fft_size)
  elif fft_matmul.use_matmul_small_fft(fft_size):
    # Small LTV transforms (FilteredNoise: thousands of ~512-point FFTs
    # per step) as direct DFT GEMMs on the MXU.
    a_r, a_i = fft_matmul.matmul_rfft_small(audio_frames, fft_size)
    i_r, i_i = fft_matmul.matmul_rfft_small(impulse_response, fft_size)
    p_r, p_i = fft_matmul.complex_multiply(a_r, a_i, i_r, i_i)
    audio_frames_out = fft_matmul.matmul_irfft_small(p_r, p_i, fft_size)
  else:
    audio_fft = jnp.fft.rfft(audio_frames, fft_size)
    ir_fft = jnp.fft.rfft(impulse_response, fft_size)
    audio_ir_fft = audio_fft * ir_fft
    audio_frames_out = jnp.fft.irfft(audio_ir_fft,
                                     fft_size).astype(jnp.float32)
  audio_out = overlap_and_add(audio_frames_out, hop_size)

  return crop_and_compensate_delay(audio_out, audio_size, ir_size, padding,
                                   delay_compensation)


# ---------------------------------------------------------------------------
# Filter design
# ---------------------------------------------------------------------------
def apply_window_to_impulse_response(impulse_response: Array,
                                     window_size: int = 0,
                                     causal: bool = False) -> Array:
  """Apply a hann window to an impulse response and put in causal form.

  Args:
    impulse_response: IR frames to window, shape [batch, n_frames, ir_size].
    window_size: Size of the window in the time domain. If < 1, defaults to
      the impulse response size.
    causal: Input is in causal form (peak in the middle).

  Returns:
    Windowed impulse response in causal form, last dimension cropped to
    window_size if 0 < window_size < ir_size.
  """
  impulse_response = jnp_float32(impulse_response)

  # If IR is in causal form, put it in zero-phase form.
  if causal:
    impulse_response = jnp.fft.fftshift(impulse_response, axes=-1)

  ir_size = int(impulse_response.shape[-1])
  if (window_size <= 0) or (window_size > ir_size):
    window_size = ir_size
  window = hann_window(window_size)

  # Zero pad the window and put in zero-phase form.
  padding = ir_size - window_size
  if padding > 0:
    half_idx = (window_size + 1) // 2
    window = jnp.concatenate([window[half_idx:],
                              jnp.zeros([padding]),
                              window[:half_idx]], axis=0)
  else:
    window = jnp.fft.fftshift(window, axes=-1)

  # Apply the window to get a new IR (both in zero-phase form).
  window = jnp.broadcast_to(window, impulse_response.shape)
  impulse_response = window * jnp.real(impulse_response)

  # Put IR in causal form and trim zero padding.
  if padding > 0:
    first_half_start = (ir_size - (half_idx - 1)) + 1
    second_half_end = half_idx + 1
    impulse_response = jnp.concatenate(
        [impulse_response[..., first_half_start:],
         impulse_response[..., :second_half_end]],
        axis=-1)
  else:
    impulse_response = jnp.fft.fftshift(impulse_response, axes=-1)

  return impulse_response


def designed_ir_size(n_freqs: int, window_size: int) -> int:
  """Length of the IR produced by frequency_impulse_response.

  Mirrors apply_window_to_impulse_response's crop arithmetic; the fused
  GEMM filter path needs the size before building any arrays (and the
  design-matrix builder asserts agreement with the actual pipeline).
  """
  ir_size = 2 * (n_freqs - 1)
  ws = ir_size if (window_size <= 0 or window_size > ir_size) else window_size
  if ir_size - ws > 0:
    half_idx = (ws + 1) // 2
    return 2 * half_idx - 1
  return ir_size


def frequency_impulse_response(magnitudes: Array,
                               window_size: int = 0) -> Array:
  """Get windowed impulse responses via the frequency sampling method.

  Args:
    magnitudes: Frequency transfer curve, shape [batch, n_frames,
      n_frequencies] or [batch, n_frequencies]. Frequencies of the last
      dimension are ordered [0, f_nyquist / (n_frequencies - 1), ...,
      f_nyquist].
    window_size: Size of the time-domain window; if < 1 defaults to the
      full impulse response size.

  Returns:
    impulse_response: Time-domain FIR filter,
      shape [batch, frames, window_size] or [batch, window_size].
  """
  magnitudes = jnp_float32(magnitudes)
  # Zero-phase IR from real (zero-phase) spectrum.
  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
  fft_size = 2 * (int(magnitudes.shape[-1]) - 1)
  if fft_size > 0 and fft_matmul.use_matmul_small_fft(fft_size):
    impulse_response = fft_matmul.matmul_irfft_real_spectrum(
        magnitudes, fft_size)
  else:
    impulse_response = jnp.fft.irfft(
        magnitudes.astype(jnp.complex64)).astype(jnp.float32)
  return apply_window_to_impulse_response(impulse_response, window_size)


def sinc(x: Array, threshold: float = 1e-20) -> Array:
  """Normalized zero-phase sinc (peak at zero)."""
  x = jnp_float32(x)
  x = jnp.where(jnp.abs(x) < threshold, threshold * jnp.ones_like(x), x)
  x = np.pi * x
  return jnp.sin(x) / x


def sinc_impulse_response(cutoff_frequency: Array,
                          window_size: int = 512,
                          sample_rate: Optional[int] = None,
                          high_pass: bool = False) -> Array:
  """Get a sinc impulse response for a set of low-pass cutoff frequencies.

  Args:
    cutoff_frequency: Frequency cutoff for the low-pass sinc filter. In Hz if
      sample_rate is given, else a ratio of nyquist in [0, 1].
      Shape [batch_size, n_time, 1].
    window_size: Size of the Hamming window to apply to the impulse.
    sample_rate: Optionally provide the sample rate.
    high_pass: If True, filter removes frequencies below cutoff (spectral
      inversion of the unity-gain low-pass).

  Returns:
    impulse_response: Shape [batch_size, n_time, (window_size // 2) * 2 + 1].
  """
  cutoff_frequency = jnp_float32(cutoff_frequency)
  if sample_rate is not None:
    cutoff_frequency = cutoff_frequency * 2.0 / float(sample_rate)

  half_size = window_size // 2
  full_size = half_size * 2 + 1
  idx = jnp.arange(-half_size, half_size + 1, dtype=jnp.float32)
  idx = idx[jnp.newaxis, jnp.newaxis, :]

  impulse_response = sinc(cutoff_frequency * idx)

  # Periodic hamming window (tf.signal.hamming_window; odd N uses
  # denominator N-1, same convention as hann_window above).
  denom = full_size if full_size % 2 == 0 else full_size - 1
  n = jnp.arange(full_size, dtype=jnp.float32)
  window = 0.54 - 0.46 * jnp.cos(2.0 * np.pi * n / denom)
  impulse_response = window * jnp.real(impulse_response)

  # Normalize for unity gain.
  impulse_response = impulse_response / jnp.abs(
      jnp.sum(impulse_response, axis=-1, keepdims=True))

  if high_pass:
    pass_through = jnp.zeros_like(impulse_response)
    pass_through = pass_through.at[..., half_size].set(1.0)
    impulse_response = pass_through - impulse_response

  return impulse_response


def frequency_filter(audio: Array,
                     magnitudes: Array,
                     window_size: int = 0,
                     padding: str = 'same') -> Array:
  """Filter audio with a (time-varying) FIR designed by frequency sampling.

  Args:
    audio: Input audio, shape [batch, audio_timesteps].
    magnitudes: Frequency transfer curve, shape [batch, n_frames,
      n_frequencies] or [batch, n_frequencies].
    window_size: Time-domain window size; if < 1, defaults to n_frequencies.
    padding: 'valid' or 'same'.

  Returns:
    Filtered audio, [batch, audio_timesteps (+ window_size - 1 for 'valid')].
  """
  magnitudes = jnp_float32(magnitudes)
  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
  if magnitudes.ndim == 3:
    # LTV fast path (TPU): filter design AND filtering as GEMMs - the
    # magnitude->windowed-causal-IR->spectrum chain is linear, so it
    # collapses into one precomputed [n_freqs, n_bins] matrix pair and the
    # time-domain IR is never materialized.
    audio32 = jnp_float32(audio)
    audio_size = int(audio32.shape[-1])
    n_ir_frames = int(magnitudes.shape[1])
    frame_size = int(np.ceil(audio_size / n_ir_frames))
    ir_size = designed_ir_size(int(magnitudes.shape[-1]), window_size)
    fft_size = get_fft_size(frame_size, ir_size, power_of_2=True)
    if fft_matmul.use_matmul_small_fft(fft_size):
      return _fused_frequency_filter(audio32, magnitudes, window_size,
                                     padding, frame_size, ir_size, fft_size)
  impulse_response = frequency_impulse_response(magnitudes,
                                                window_size=window_size)
  return fft_convolve(audio, impulse_response, padding=padding)


def _fused_frequency_filter(audio: Array, magnitudes: Array,
                            window_size: int, padding: str,
                            frame_size: int, ir_size: int,
                            fft_size: int) -> Array:
  """LTV frequency_filter with design + filtering fused into MXU GEMMs."""
  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
  batch_size, audio_size = audio.shape
  if magnitudes.shape[0] == 1 and batch_size > 1:
    magnitudes = jnp.tile(magnitudes, (batch_size, 1, 1))
  if magnitudes.shape[0] != batch_size:
    raise ValueError(f'Batch size of audio ({batch_size}) and magnitudes '
                     f'({magnitudes.shape[0]}) must be the same.')

  audio_frames = frame(audio, frame_size, frame_size, pad_end=True)
  n_audio_frames = int(audio_frames.shape[1])
  if n_audio_frames != magnitudes.shape[1]:
    raise ValueError(
        f'Number of Audio frames ({n_audio_frames}) and magnitude frames '
        f'({magnitudes.shape[1]}) do not match.')

  a_r, a_i = fft_matmul.matmul_rfft_small(audio_frames, fft_size)
  i_r, i_i = fft_matmul.matmul_filter_design(magnitudes, window_size,
                                             fft_size)
  p_r, p_i = fft_matmul.complex_multiply(a_r, a_i, i_r, i_i)
  audio_frames_out = fft_matmul.matmul_irfft_small(p_r, p_i, fft_size)
  audio_out = overlap_and_add(audio_frames_out, frame_size)
  return crop_and_compensate_delay(audio_out, audio_size, ir_size, padding,
                                   -1)


def sinc_filter(audio: Array,
                cutoff_frequency: Array,
                window_size: int = 512,
                sample_rate: Optional[int] = None,
                padding: str = 'same',
                high_pass: bool = False) -> Array:
  """Filter audio with a (time-varying) sinc low-pass/high-pass filter."""
  impulse_response = sinc_impulse_response(cutoff_frequency,
                                           window_size=window_size,
                                           sample_rate=sample_rate,
                                           high_pass=high_pass)
  return fft_convolve(audio, impulse_response, padding=padding)
