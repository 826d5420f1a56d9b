"""Frame-rate to audio-rate resampling of control signals.

Reference behavior: /root/reference/ddsp/core.py:573-729 (`resample`,
`upsample_with_windows`, `center_crop`). The reference uses
tf.compat.v1.image.resize (legacy pixel-coordinate conventions:
align_corners = not add_endpoint, half_pixel_centers=False); we reproduce that
index math directly with gathers, which XLA fuses cleanly on TPU.

`upsample_with_windows` (hann-window overlap-add) is implemented without a
generic overlap_and_add: with 50%-overlapping windows the output is just the
sum of two broadcast-multiplied shifted frame products, a fully vectorized
form that maps to pure VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu.ops.core import jnp_float32

Array = jax.Array


def _source_coords(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
  """Legacy tf.image.resize source coordinates for each output index."""
  if align_corners and n_out > 1:
    scale = (n_in - 1) / (n_out - 1)
  else:
    scale = n_in / n_out
  return np.arange(n_out, dtype=np.float64) * scale


def _interp_nearest(x: Array, n_out: int, align_corners: bool) -> Array:
  """Nearest-neighbor along axis 1 with legacy index conventions."""
  n_in = x.shape[1]
  src = _source_coords(n_in, n_out, align_corners)
  if align_corners:
    # Legacy tf.image.resize rounds halves away from zero (roundf), not
    # banker's rounding; np.floor(x + 0.5) matches for non-negative coords.
    idx = np.floor(src + 0.5)
  else:
    idx = np.floor(src)
  idx = np.minimum(idx, n_in - 1).astype(np.int32)
  return jnp.take(x, jnp.asarray(idx), axis=1)


def _interp_linear(x: Array, n_out: int, align_corners: bool) -> Array:
  """Bilinear along axis 1 with legacy index conventions."""
  n_in = x.shape[1]
  src = _source_coords(n_in, n_out, align_corners)
  lo = np.floor(src).astype(np.int64)
  frac = (src - lo).astype(np.float32)
  lo = np.clip(lo, 0, n_in - 1)
  hi = np.clip(lo + 1, 0, n_in - 1)

  # Integer-ratio upsampling (the audio-rate envelope case): when the
  # gather indices form regular hop blocks (lo == i over block i, hi ==
  # i+1 held at the end), build the output as broadcast segments instead
  # of gathers. Bit-identical values (same precomputed frac), but the
  # backward is a per-block reduction instead of a scatter-add - measured
  # 1.53 -> ~0.2 ms fwd+bwd for the [16, 250] -> [16, 64000] f0 envelope
  # on v5e (the scatter dominated the whole harmonic-processor backward).
  if n_out % n_in == 0 and n_out > n_in:
    hop = n_out // n_in
    lo_blocks = lo.reshape(n_in, hop)
    hi_blocks = hi.reshape(n_in, hop)
    regular = (np.all(lo_blocks == np.arange(n_in)[:, None]) and
               np.all(hi_blocks == np.minimum(np.arange(n_in) + 1,
                                              n_in - 1)[:, None]))
    if regular:
      ext = jnp.concatenate([x, x[:, -1:]], axis=1)
      x_lo = ext[:, :-1]  # [batch, n_in, ...]
      x_hi = ext[:, 1:]
      w = jnp.asarray(frac.reshape(n_in, hop)).reshape(
          (1, n_in, hop) + (1,) * (x.ndim - 2))
      seg = (x_lo[:, :, jnp.newaxis] * (1.0 - w) +
             x_hi[:, :, jnp.newaxis] * w)
      return seg.reshape((x.shape[0], n_out) + x.shape[2:])

  x_lo = jnp.take(x, jnp.asarray(lo.astype(np.int32)), axis=1)
  x_hi = jnp.take(x, jnp.asarray(hi.astype(np.int32)), axis=1)
  frac = jnp.asarray(frac).reshape((1, n_out) + (1,) * (x.ndim - 2))
  return x_lo * (1.0 - frac) + x_hi * frac


def _cubic_weights(frac: np.ndarray, a: float = -0.75) -> np.ndarray:
  """Keys cubic convolution weights for 4 taps (legacy tf bicubic, A=-0.75)."""
  x = frac
  w0 = a * (x + 1) ** 3 - 5 * a * (x + 1) ** 2 + 8 * a * (x + 1) - 4 * a
  w1 = (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
  w2 = (a + 2) * (1 - x) ** 3 - (a + 3) * (1 - x) ** 2 + 1
  w3 = a * (2 - x) ** 3 - 5 * a * (2 - x) ** 2 + 8 * a * (2 - x) - 4 * a
  return np.stack([w0, w1, w2, w3], axis=-1)


def _interp_cubic(x: Array, n_out: int, align_corners: bool) -> Array:
  """Bicubic along axis 1 with legacy index conventions."""
  n_in = x.shape[1]
  src = _source_coords(n_in, n_out, align_corners)
  lo = np.floor(src).astype(np.int64)
  frac = (src - lo).astype(np.float64)
  weights = _cubic_weights(frac).astype(np.float32)  # [n_out, 4]
  out = None
  for tap in range(4):
    idx = np.clip(lo + tap - 1, 0, n_in - 1).astype(np.int32)
    x_tap = jnp.take(x, jnp.asarray(idx), axis=1)
    w = jnp.asarray(weights[:, tap]).reshape(
        (1, n_out) + (1,) * (x.ndim - 2))
    out = x_tap * w if out is None else out + x_tap * w
  return out


def upsample_with_windows(inputs: Array,
                          n_timesteps: int,
                          add_endpoint: bool = True) -> Array:
  """Upsample a series of frames using overlapping (periodic) hann windows.

  Good for amplitude envelopes. Constant-overlap-add with hop = half window.

  Args:
    inputs: Framewise 3-D array, shape [batch_size, n_frames, n_channels].
    n_timesteps: The time resolution of the output signal.
    add_endpoint: Hold the last timestep for an additional step as the
      endpoint. Then n_timesteps is divided evenly into n_frames segments.
      If False, use the last timestep as the endpoint, producing
      (n_frames - 1) segments of length n_timesteps / (n_frames - 1).

  Returns:
    Upsampled 3-D array, shape [batch_size, n_timesteps, n_channels].
  """
  inputs = jnp_float32(inputs)

  if inputs.ndim != 3:
    raise ValueError('Upsample_with_windows() only supports 3 dimensions, '
                     f'not {inputs.shape}.')

  # Mimic behavior of tf.image.resize: hold value for last interval.
  if add_endpoint:
    inputs = jnp.concatenate([inputs, inputs[:, -1:, :]], axis=1)

  n_frames = int(inputs.shape[1])
  n_intervals = n_frames - 1

  if n_frames >= n_timesteps:
    raise ValueError('Upsample with windows cannot be used for downsampling. '
                     f'More input frames ({n_frames}) than output timesteps '
                     f'({n_timesteps})')

  if n_timesteps % n_intervals != 0.0:
    minus_one = '' if add_endpoint else ' - 1'
    raise ValueError(
        'For upsampling, the target number of timesteps must be divisible '
        f'by the number of input frames{minus_one}. (timesteps:{n_timesteps},'
        f' frames:{n_frames}, add_endpoint={add_endpoint}).')

  hop_size = n_timesteps // n_intervals
  window_length = 2 * hop_size
  # Periodic hann window (matches tf.signal.hann_window default).
  t = jnp.arange(window_length, dtype=jnp.float32)
  window = 0.5 - 0.5 * jnp.cos(2.0 * np.pi * t / window_length)

  # With 50% overlapping windows, after trimming the first/last half-window
  # the output decomposes into (n_frames - 1) hop-sized segments:
  #   out_seg[i] = x[i+1] * window[:hop] + x[i] * window[hop:]
  # which is two broadcast multiplies and one add - no overlap_and_add needed.
  rise = window[:hop_size]  # [hop]
  fall = window[hop_size:]  # [hop]
  x = inputs[..., jnp.newaxis]  # [batch, n_frames, channels, 1]
  segments = (x[:, 1:, :, :] * rise[jnp.newaxis, jnp.newaxis, jnp.newaxis, :]
              + x[:, :-1, :, :] * fall[jnp.newaxis, jnp.newaxis, jnp.newaxis,
                                       :])
  # [batch, n_intervals, channels, hop] -> [batch, n_timesteps, channels]
  segments = jnp.transpose(segments, (0, 1, 3, 2))
  batch_size, _, _, n_channels = segments.shape
  return jnp.reshape(segments, (batch_size, n_timesteps, n_channels))


def resample(inputs: Array,
             n_timesteps: int,
             method: str = 'linear',
             add_endpoint: bool = True) -> Array:
  """Interpolate an array from n_frames to n_timesteps along the time axis.

  Args:
    inputs: Framewise 1-D, 2-D, 3-D, or 4-D array. Shape [n_frames],
      [batch_size, n_frames], [batch_size, n_frames, channels], or
      [batch_size, n_frames, n_freq, channels].
    n_timesteps: Time resolution of the output signal.
    method: One of ['nearest', 'linear', 'cubic', 'window']. 'window' uses
      overlapping hann windows (upsampling only), smoother for amplitude
      envelopes with large frame sizes.
    add_endpoint: Hold the last timestep for an additional step as the
      endpoint (legacy align_corners=False conventions). If False, use the
      last timestep as the endpoint (align_corners=True).

  Returns:
    Interpolated array with time axis resized to n_timesteps.

  Raises:
    ValueError: If method is 'window' and input is 4-D, or method invalid.
  """
  inputs = jnp_float32(inputs)
  is_1d = inputs.ndim == 1
  is_2d = inputs.ndim == 2
  is_4d = inputs.ndim == 4

  # Ensure inputs are at least 3-D.
  if is_1d:
    inputs = inputs[jnp.newaxis, :, jnp.newaxis]
  elif is_2d:
    inputs = inputs[:, :, jnp.newaxis]

  align_corners = not add_endpoint
  if method == 'nearest':
    outputs = _interp_nearest(inputs, n_timesteps, align_corners)
  elif method == 'linear':
    outputs = _interp_linear(inputs, n_timesteps, align_corners)
  elif method == 'cubic':
    outputs = _interp_cubic(inputs, n_timesteps, align_corners)
  elif method == 'window':
    if is_4d:
      raise ValueError("method 'window' is not supported for 4-D inputs.")
    outputs = upsample_with_windows(inputs, n_timesteps, add_endpoint)
  else:
    raise ValueError(f'Method ({method}) is invalid. Must be one of '
                     "['nearest', 'linear', 'cubic', 'window'].")

  if is_1d:
    outputs = outputs[0, :, 0]
  elif is_2d:
    outputs = outputs[:, :, 0]
  return outputs


def center_crop(audio: Array, frame_size: int) -> Array:
  """Remove padding introduced from centering frames (inverse of center pad).

  Args:
    audio: Input, shape [batch, time, ...].
    frame_size: Size of each frame.

  Returns:
    audio_cropped: Shape [batch, time - (frame_size // 2) * 2, ...].
  """
  pad_amount = int(frame_size // 2)
  if pad_amount == 0:
    return audio  # audio[:, 0:-0] would slice to empty.
  return audio[:, pad_amount:-pad_amount]
