"""Spectral ops: STFT, mel/MFCC, loudness, power, framing math.

Reference behavior: /root/reference/ddsp/spectral_ops.py (stft:34,
compute_mag:68, compute_mel:74, compute_logmag:93, compute_logmel:98,
compute_mfcc:113, get_framed_lengths:136, pad:171, compute_rms_energy:223,
compute_power:237, compute_loudness:253).

All differentiable ops are pure jnp. The A-weighting curve and mel filterbank
are precomputed with numpy at trace time (shapes are static), so inside jit
they are constants folded into the XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.core import amplitude_to_db
from ddsp_tpu.ops.core import DB_RANGE
from ddsp_tpu.ops.core import jnp_float32
from ddsp_tpu.ops.core import power_to_db
from ddsp_tpu.ops.core import safe_log
from ddsp_tpu.ops import fftconv

Array = jax.Array

F0_RANGE = 127.0  # MIDI
_MEL_BREAK_FREQUENCY_HERTZ = 700.0
_MEL_HIGH_FREQUENCY_Q = 1127.0


# ---------------------------------------------------------------------------
# Framing math
# ---------------------------------------------------------------------------
def get_framed_lengths(input_length: int,
                       frame_size: int,
                       hop_size: int,
                       padding: str = 'center'):
  """Given strided framing, return (n_frames, padded_length).

  padding: 'valid' (no-op), 'same' (pad end so n_frames = ceil(n_t /
  hop_size)), or 'center' (pad both ends so each frame timestamp is centered
  and n_frames = n_t / hop_size + 1).
  """
  def get_n_frames(length):
    return int(np.floor((length - frame_size) // hop_size)) + 1

  if padding == 'valid':
    padded_length = input_length
    n_frames = get_n_frames(input_length)
  elif padding == 'center':
    padded_length = input_length + frame_size
    n_frames = get_n_frames(padded_length)
  elif padding == 'same':
    n_frames = int(np.ceil(input_length / hop_size))
    padded_length = (n_frames - 1) * hop_size + frame_size
  else:
    raise ValueError(f'Invalid padding: {padding}')
  return n_frames, padded_length


def pad(x: Array,
        frame_size: int,
        hop_size: int,
        padding: str = 'center',
        axis: int = 1,
        mode: str = 'constant',
        constant_values: float = 0) -> Array:
  """Pad an array for strided framing."""
  x = jnp_float32(x)

  if padding == 'valid':
    return x

  if hop_size > frame_size:
    raise ValueError(f'During padding, frame_size ({frame_size})'
                     f' must be greater than hop_size ({hop_size}).')

  if x.ndim <= 1:
    axis = 0

  n_t = x.shape[axis]
  _, n_t_padded = get_framed_lengths(n_t, frame_size, hop_size, padding)
  pads = [(0, 0) for _ in range(x.ndim)]

  if padding == 'same':
    pad_amount = int(n_t_padded - n_t)
    pads[axis] = (0, pad_amount)
  elif padding == 'center':
    pad_amount = int(frame_size // 2)  # Symmetric even padding like librosa.
    pads[axis] = (pad_amount, pad_amount)
  else:
    raise ValueError("`padding` must be one of ['center', 'same', 'valid'], "
                     f'received ({padding}).')

  kwargs = {}
  if mode.lower() == 'constant':
    kwargs['constant_values'] = constant_values
  return jnp.pad(x, pads, mode=mode.lower(), **kwargs)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------
def stft(audio: Array,
         frame_size: int = 2048,
         overlap: float = 0.75,
         pad_end: bool = True) -> Array:
  """Differentiable batched STFT.

  Matches tf.signal.stft semantics: hann (periodic) window, hop =
  frame_size * (1 - overlap), fft_length = enclosing power of 2 of
  frame_size, pad_end pads with zeros so n_frames = ceil(T / hop).

  Args:
    audio: Shape [batch, time] or [time] (or [batch, time, 1]).
    frame_size: Window/frame length in samples.
    overlap: Fractional window overlap.
    pad_end: Pad the end of the signal with zeros.

  Returns:
    Complex STFT, shape [batch, n_frames, fft_size // 2 + 1].
  """
  audio = jnp_float32(audio)
  if audio.ndim == 3:
    audio = jnp.squeeze(audio, axis=-1)

  hop_size = int(frame_size * (1.0 - overlap))
  fft_size = int(2**np.ceil(np.log2(frame_size)))

  frames = fftconv.frame(audio, frame_size, hop_size, pad_end=pad_end)
  # tf.signal.hann_window semantics for odd sizes too (denominator N-1).
  frames = frames * fftconv.hann_window(frame_size)
  return jnp.fft.rfft(frames, fft_size)


def compute_mag(audio: Array,
                size: int = 2048,
                overlap: float = 0.75,
                pad_end: bool = True,
                compute_dtype: str = 'float32') -> Array:
  """Magnitude spectrogram.

  On TPU the magnitudes are computed as a windowed-frame GEMM against the
  half-spectrum DFT matrix (fft_matmul.matmul_stft_mag) - ~2x faster than
  XLA's TPU FFT for the multi-scale loss sizes and complex-free. Results
  match |stft(...)| to ~1e-4 absolute.
  """
  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
  if fft_matmul.use_matmul_stft(int(2**np.ceil(np.log2(size)))):
    audio = jnp_float32(audio)
    if audio.ndim == 3:
      audio = audio[..., 0]
    is_1d = audio.ndim == 1
    if is_1d:
      audio = audio[jnp.newaxis, :]
    hop_size = int(size * (1.0 - overlap))
    fft_size = int(2**np.ceil(np.log2(size)))
    frames = fftconv.frame(audio, size, hop_size, pad_end=pad_end)
    # The hann window rides inside the DFT matrices (diag(w) @ D): the
    # explicit frames * window pass costs a full HBM read+write of the
    # frame tensor per size per signal (~2 ms/step at the canonical
    # batch-64 loss) that XLA cannot fuse into the GEMM.
    mags = fft_matmul.matmul_stft_mag(frames, fft_size,
                                      compute_dtype=compute_dtype,
                                      hann=True)
    # Same rank contract as the FFT branch: 1-D audio -> [n_frames, bins].
    return mags[0] if is_1d else mags
  mag = jnp.abs(stft(audio, frame_size=size, overlap=overlap,
                     pad_end=pad_end))
  return mag.astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def linear_to_mel_matrix_np(num_mel_bins: int = 64,
                            num_spectrogram_bins: int = 1025,
                            sample_rate: int = 16000,
                            lower_edge_hertz: float = 0.0,
                            upper_edge_hertz: float = 8000.0) -> np.ndarray:
  """Mel filterbank matrix matching tf.signal.linear_to_mel_weight_matrix.

  HTK mel scale, triangular filters in the mel domain, with the DC bin
  dropped from the interpolation (first row is zero).
  """
  def hz_to_mel(f):
    return _MEL_HIGH_FREQUENCY_Q * np.log1p(f / _MEL_BREAK_FREQUENCY_HERTZ)

  nyquist = sample_rate / 2.0
  linear_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)[1:]
  spectrogram_bins_mel = hz_to_mel(linear_freqs)[:, np.newaxis]

  band_edges_mel = np.linspace(
      hz_to_mel(lower_edge_hertz), hz_to_mel(upper_edge_hertz),
      num_mel_bins + 2)
  lower_edge_mel = band_edges_mel[np.newaxis, :-2]
  center_mel = band_edges_mel[np.newaxis, 1:-1]
  upper_edge_mel = band_edges_mel[np.newaxis, 2:]

  lower_slopes = (spectrogram_bins_mel - lower_edge_mel) / (
      center_mel - lower_edge_mel)
  upper_slopes = (upper_edge_mel - spectrogram_bins_mel) / (
      upper_edge_mel - center_mel)
  mel_weights = np.maximum(0.0, np.minimum(lower_slopes, upper_slopes))

  # Re-add the DC bin dropped above.
  return np.pad(mel_weights, [[1, 0], [0, 0]]).astype(np.float32)


def compute_mel(audio: Array,
                lo_hz: float = 0.0,
                hi_hz: float = 8000.0,
                bins: int = 64,
                fft_size: int = 2048,
                overlap: float = 0.75,
                pad_end: bool = True,
                sample_rate: int = 16000) -> Array:
  """Mel spectrogram."""
  mag = compute_mag(audio, fft_size, overlap, pad_end)
  num_spectrogram_bins = int(mag.shape[-1])
  mel_matrix = jnp.asarray(
      linear_to_mel_matrix_np(bins, num_spectrogram_bins, sample_rate,
                              lo_hz, hi_hz))
  return jnp.tensordot(mag, mel_matrix, axes=1)


def compute_logmag(audio: Array,
                   size: int = 2048,
                   overlap: float = 0.75,
                   pad_end: bool = True) -> Array:
  """Log magnitude spectrogram."""
  return safe_log(compute_mag(audio, size, overlap, pad_end))


def compute_logmel(audio: Array,
                   lo_hz: float = 80.0,
                   hi_hz: float = 7600.0,
                   bins: int = 64,
                   fft_size: int = 2048,
                   overlap: float = 0.75,
                   pad_end: bool = True,
                   sample_rate: int = 16000) -> Array:
  """Log mel spectrogram."""
  mel = compute_mel(audio, lo_hz, hi_hz, bins, fft_size, overlap, pad_end,
                    sample_rate)
  return safe_log(mel)


@functools.lru_cache(maxsize=None)
def _dct_ii_matrix_np(n: int) -> np.ndarray:
  """DCT-II matrix ([n_mels, n_mels]) applied as x @ M.

  tf.signal.mfccs_from_log_mel_spectrograms scales the unnormalized DCT-II
  by 1/sqrt(2N) - like 'ortho' but WITHOUT the extra 1/sqrt(2) on the DC
  coefficient - so we match that exactly.
  """
  k = np.arange(n)[np.newaxis, :]
  i = np.arange(n)[:, np.newaxis]
  m = np.cos(np.pi * k * (2 * i + 1) / (2 * n)) * np.sqrt(2.0 / n)
  return m.astype(np.float32)


def compute_mfcc(audio: Array,
                 lo_hz: float = 20.0,
                 hi_hz: float = 8000.0,
                 fft_size: int = 1024,
                 mel_bins: int = 128,
                 mfcc_bins: int = 13,
                 overlap: float = 0.75,
                 pad_end: bool = True,
                 sample_rate: int = 16000) -> Array:
  """Mel-frequency cepstral coefficients.

  Matches tf.signal.mfccs_from_log_mel_spectrograms (TF-scaled (1/sqrt(2N), non-orthonormal) DCT-II),
  truncated to mfcc_bins.
  """
  logmel = compute_logmel(
      audio,
      lo_hz=lo_hz,
      hi_hz=hi_hz,
      bins=mel_bins,
      fft_size=fft_size,
      overlap=overlap,
      pad_end=pad_end,
      sample_rate=sample_rate)
  dct_m = jnp.asarray(_dct_ii_matrix_np(mel_bins))
  mfccs = jnp.tensordot(logmel, dct_m, axes=1)
  return mfccs[..., :mfcc_bins]


# ---------------------------------------------------------------------------
# Loudness and power
# ---------------------------------------------------------------------------
def compute_rms_energy(audio: Array,
                       sample_rate: int = 16000,
                       frame_rate: int = 250,
                       frame_size: int = 512,
                       padding: str = 'center') -> Array:
  """Root-mean-squared energy of audio, framed at frame_rate."""
  audio = jnp_float32(audio)
  hop_size = sample_rate // frame_rate
  audio = pad(audio, frame_size, hop_size, padding=padding)
  audio_frames = fftconv.frame(audio, frame_size, hop_size, pad_end=False)
  return jnp.mean(audio_frames**2.0, axis=-1)**0.5


def compute_power(audio: Array,
                  sample_rate: int = 16000,
                  frame_rate: int = 250,
                  frame_size: int = 512,
                  ref_db: float = 0.0,
                  range_db: float = DB_RANGE,
                  padding: str = 'center') -> Array:
  """Power of audio in dB."""
  rms_energy = compute_rms_energy(audio, sample_rate, frame_rate, frame_size,
                                  padding=padding)
  return amplitude_to_db(rms_energy, ref_db=ref_db, range_db=range_db)


@functools.lru_cache(maxsize=None)
def a_weighting_np(frequencies: tuple, min_db: Optional[float] = -80.0):
  """A-weighting curve in dB for the given frequencies (IEC 61672).

  Same formula as librosa.A_weighting (the reference's source for the
  perceptual weighting in compute_loudness).
  """
  f_sq = np.asarray(frequencies, dtype=np.float64)**2.0
  const = np.array([12194.217, 20.598997, 107.65265, 737.86223])**2.0
  with np.errstate(divide='ignore'):
    weights = 2.0 + 20.0 * (
        np.log10(const[0])
        + 2 * np.log10(f_sq)
        - np.log10(f_sq + const[0])
        - np.log10(f_sq + const[1])
        - 0.5 * np.log10(f_sq + const[2])
        - 0.5 * np.log10(f_sq + const[3]))
  if min_db is not None:
    weights = np.maximum(min_db, weights)
  return weights.astype(np.float32)


def fft_frequencies(sample_rate: int, n_fft: int) -> np.ndarray:
  """Center frequencies of rfft bins."""
  return np.linspace(0, sample_rate / 2.0, n_fft // 2 + 1)


def compute_loudness(audio: Array,
                     sample_rate: int = 16000,
                     frame_rate: int = 250,
                     n_fft: int = 512,
                     range_db: float = DB_RANGE,
                     ref_db: float = 0.0,
                     padding: str = 'center',
                     use_matmul: Optional[bool] = None) -> Array:
  """Perceptual loudness (A-weighted power) in dB. Differentiable.

  Args:
    audio: Shape [batch_size, audio_length] or [audio_length].
    sample_rate: Audio sample rate in Hz.
    frame_rate: Rate of loudness frames in Hz.
    n_fft: FFT window size.
    range_db: Dynamic range of loudness in decibels.
    ref_db: Reference maximum perceptual loudness.
    padding: 'same', 'valid', or 'center'.
    use_matmul: Compute the A-weighted power as one quadratic-form GEMM
      instead of per-frame FFTs. Default (None) picks the GEMM on TPU.

  Returns:
    Loudness in decibels, shape [batch_size, n_frames] or [n_frames].
  """
  frame_size = n_fft
  hop_size = sample_rate // frame_rate
  audio = pad(audio, frame_size, hop_size, padding=padding)

  is_1d = audio.ndim == 1
  if is_1d:
    audio = audio[jnp.newaxis, :]

  # Both branches transform on the enclosing power-of-two grid (stft pads
  # its frames the same way), so derive the A-weights on those bin centers
  # — with a non-pow2 n_fft the spectrum simply gets sampled more densely.
  fft_size = int(2**np.ceil(np.log2(frame_size)))
  frequencies = tuple(fft_frequencies(sample_rate, fft_size).tolist())
  a_weighting = a_weighting_np(frequencies)
  # Perform weighting in linear scale; a_weighting given in decibels.
  weighting = 10**(a_weighting / 10)
  n_bins = fft_size // 2 + 1

  if use_matmul is None:
    use_matmul = jax.default_backend() == 'tpu'
  if use_matmul:
    # A-weighted average power is a fixed quadratic form of the windowed
    # frame; one MXU GEMM replaces the per-frame FFTs (~5x on the
    # canonical batch-64 preprocessor; see fft_matmul).
    from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top
    frames = fftconv.frame(audio, frame_size, hop_size, pad_end=False)
    # The hann window is folded into the quadratic form
    # (diag(h) Q diag(h)) - no windowed copy of the frame tensor.
    avg_power = fft_matmul.matmul_weighted_power(
        frames, fft_size, tuple(np.ravel(weighting).tolist()),
        hann=True) / n_bins
  else:
    overlap = 1 - hop_size / frame_size
    s = stft(audio, frame_size=frame_size, overlap=overlap, pad_end=False)
    power = jnp.abs(s)**2
    power = power * jnp.asarray(weighting[np.newaxis, np.newaxis, :])
    avg_power = jnp.mean(power, axis=-1)
  loudness = power_to_db(avg_power, ref_db=ref_db, range_db=range_db)

  return loudness[0] if is_1d else loudness


def pad_or_trim_to_expected_length(vector: Array,
                                   expected_len: int,
                                   pad_value: float = 0.0,
                                   len_tolerance: int = 20) -> Array:
  """Make vector equal to the expected length (edge-pad or trim).

  Args:
    vector: Shape [(batch,) vector_length].
    expected_len: Target length.
    pad_value: Value to pad with (only used for constant padding).
    len_tolerance: Raise if difference is larger than this.

  Returns:
    vector of length expected_len.
  """
  vector = jnp.asarray(vector)
  original_len = vector.shape[-1]
  if abs(original_len - expected_len) > len_tolerance:
    raise ValueError(f'Vector length {original_len} differs from expected '
                     f'length {expected_len} beyond tolerance '
                     f'{len_tolerance}.')
  is_1d = vector.ndim == 1
  if is_1d:
    vector = vector[jnp.newaxis, :]
  if original_len < expected_len:
    n_padding = expected_len - original_len
    vector = jnp.pad(vector, ((0, 0), (0, n_padding)),
                     mode='constant', constant_values=pad_value)
  elif original_len > expected_len:
    vector = vector[..., :expected_len]
  return vector[0] if is_1d else vector


# Lazily constructed global CREPE (reference: crepe's module-level models).
_CREPE_CACHE = {}


def reset_crepe():
  """Drop cached CREPE models (force rebuild / weight reload)."""
  _CREPE_CACHE.clear()


def _get_crepe(model_capacity: str = 'tiny'):
  from ddsp_tpu.ops.crepe import PretrainedCrepe  # circular-import guard
  if model_capacity not in _CREPE_CACHE:
    _CREPE_CACHE[model_capacity] = PretrainedCrepe(
        model_capacity=model_capacity)
  return _CREPE_CACHE[model_capacity]


def compute_f0(audio, frame_rate: int, viterbi: bool = True,
               padding: str = 'center', model_capacity: str = 'tiny'):
  """Fundamental frequency estimate using the flax CREPE port.

  Reference behavior: /root/reference/ddsp/spectral_ops.py:328 (there via
  the crepe pip package, non-differentiable numpy; here batched jnp on
  accelerator). Requires pretrained weights ($CREPE_WEIGHTS_DIR) for
  meaningful pitch; random-init otherwise (plumbing only).

  Args:
    audio: Single example [n_samples] or batch [batch, n_samples] @ 16 kHz.
    frame_rate: Rate of f0 frames in Hz.
    viterbi: Use Viterbi decoding to estimate f0.
    padding: 'same', 'valid', or 'center'.
    model_capacity: CREPE model size.

  Returns:
    f0_hz, f0_confidence: numpy arrays, shape [(batch,) n_frames].
  """
  import numpy as _np
  crepe_model = _get_crepe(model_capacity)
  hop_size = crepe_model.sample_rate // frame_rate

  was_1d = _np.ndim(audio) == 1
  audio = jnp.atleast_2d(jnp_float32(audio))
  crepe_model.hop_size = hop_size
  f0_hz, f0_confidence = crepe_model.predict_f0_and_confidence(
      audio, viterbi=viterbi, padding=padding)

  f0_hz = _np.asarray(f0_hz, dtype=_np.float32)
  f0_confidence = _np.nan_to_num(
      _np.asarray(f0_confidence, dtype=_np.float32))
  if was_1d:
    f0_hz, f0_confidence = f0_hz[0], f0_confidence[0]
  return f0_hz, f0_confidence


def stft_np(audio, frame_size: int = 2048, overlap: float = 0.75,
            pad_end: bool = True):
  """Non-differentiable numpy STFT matching stft() (reference :50).

  The reference delegates to librosa; this computes the same frames/window
  in numpy directly (periodic hann, hop = frame_size * (1 - overlap)).
  """
  import numpy as _np
  audio = _np.asarray(audio, _np.float32)
  is_1d = audio.ndim == 1
  if is_1d:
    audio = audio[_np.newaxis, :]

  hop_size = int(frame_size * (1.0 - overlap))
  if pad_end:
    n_frames = int(_np.ceil(audio.shape[1] / hop_size))
    pad = max(0, (n_frames - 1) * hop_size + frame_size - audio.shape[1])
    audio = _np.pad(audio, ((0, 0), (0, pad)))
  n_frames = 1 + (audio.shape[1] - frame_size) // hop_size
  idx = (_np.arange(n_frames)[:, None] * hop_size +
         _np.arange(frame_size)[None, :])
  frames = audio[:, idx]

  denom = frame_size if frame_size % 2 == 0 else frame_size - 1
  window = 0.5 - 0.5 * _np.cos(
      2.0 * _np.pi * _np.arange(frame_size) / max(denom, 1))
  fft_size = int(2**_np.ceil(_np.log2(frame_size)))
  s = _np.fft.rfft(frames * window, fft_size)
  return s[0] if is_1d else s
