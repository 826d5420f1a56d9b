"""Core math helpers, unit conversions, and control nonlinearities.

TPU-native (JAX) reimplementation of the DDSP core math surface.
Behavioral parity targets (reference: /root/reference/ddsp/core.py):
  - helpers: core.py:31-243
  - unit conversions: core.py:247-382
  - scaling nonlinearities: core.py:386-569

All functions are pure jnp, float32 by default, and safe to use under
`jax.jit` / `pjit` / `shard_map` (static shapes, no python control flow on
traced values).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Number = Union[float, int, np.ndarray, Array]

DB_RANGE = 80.0


# ---------------------------------------------------------------------------
# Basic helpers
# ---------------------------------------------------------------------------
def jnp_float32(x: Any) -> Array:
  """Ensure input is a float32 jnp array (cf. reference tf_float32)."""
  return jnp.asarray(x, dtype=jnp.float32)


# Backwards-friendly alias used across the codebase.
f32 = jnp_float32


def make_iterable(x: Any) -> Sequence[Any]:
  """Coerce x to a list: None -> [], scalars/strings -> [x], iterables -> list(x)."""
  if x is None:
    return []
  if isinstance(x, (np.ndarray, jax.Array)):
    # Wrap single arrays so we don't iterate over the batch dim.
    return [x]
  if isinstance(x, (list, tuple)):
    return x
  try:
    iter(x)
  except TypeError:
    return [x]
  return x


def to_dict(x: Any, keys: Sequence[str]) -> Dict[str, Any]:
  """Zip output values with their key names into a dict (length-checked)."""
  if isinstance(x, dict):
    return x
  x = make_iterable(x)
  if len(keys) != len(x):
    raise ValueError(f'Keys: {keys} must be the same length as {x}')
  return dict(zip(keys, x))


def nested_keys(nested_dict: Dict[str, Any],
                delimiter: str = '/',
                prefix: str = '') -> List[str]:
  """All leaf paths of a nested dict as 'a/b/c' strings."""
  keys = []
  for k, v in nested_dict.items():
    key = k if not prefix else f'{prefix}{delimiter}{k}'
    if isinstance(v, dict):
      keys += nested_keys(v, delimiter=delimiter, prefix=key)
    else:
      keys.append(key)
  return keys


def nested_lookup(nested_key: str,
                  nested_dict: Dict[str, Any],
                  delimiter: str = '/') -> Any:
  """Look up a slash-separated path ('a/b/c') in a nested dict."""
  keys = nested_key.split(delimiter)
  value = nested_dict
  for key in keys:
    try:
      value = value[key]
    except (KeyError, TypeError) as e:
      raise KeyError(
          f"Key '{key}' as a part of nested key '{nested_key}' not found "
          f'during nested dictionary lookup, out of available keys: '
          f'{nested_keys(nested_dict)}') from e
  return value


def leaf_key(nested_key: str, delimiter: str = '/') -> str:
  """Last component of a slash-separated key path."""
  return nested_key.split(delimiter)[-1]


def map_shape(x: Dict[str, Any]) -> Dict[str, Any]:
  """Shape of every array leaf in a (nested) dict, as lists."""
  return jax.tree_util.tree_map(lambda t: list(jnp.shape(t)), x)


def pad_axis(x: Array, padding=(0, 0), axis: int = 0, **pad_kwargs) -> Array:
  """jnp.pad restricted to a single axis."""
  n_end_dims = x.ndim - axis - 1
  n_end_dims *= n_end_dims > 0
  paddings = [(0, 0)] * axis + [tuple(padding)] + [(0, 0)] * n_end_dims
  return jnp.pad(x, paddings, **pad_kwargs)


def diff(x: Array, axis: int = -1) -> Array:
  """First-order difference x[i+1] - x[i] along an axis (length shrinks by 1)."""
  ndim = x.ndim
  if axis >= ndim:
    raise ValueError(f'Invalid axis index: {axis} for tensor with only '
                     f'{ndim} axes.')
  axis = axis % ndim
  front = jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis)
  back = jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)
  return front - back


# ---------------------------------------------------------------------------
# Math
# ---------------------------------------------------------------------------
def nan_to_num(x: Array, value: float = 0.0) -> Array:
  """Substitute a fixed value wherever x is NaN."""
  return jnp.where(jnp.isnan(x), jnp.full_like(x, value), x)


def safe_divide(numerator: Array, denominator: Array, eps: float = 1e-7):
  """Division that swaps exact-zero denominators for eps first."""
  safe_denominator = jnp.where(denominator == 0.0, eps, denominator)
  return numerator / safe_denominator


def safe_log(x: Array, eps: float = 1e-5) -> Array:
  """log(x) with non-positive inputs clamped to eps beforehand."""
  safe_x = jnp.where(x <= 0.0, eps, x)
  return jnp.log(safe_x)


def logb(x: Array, base: float = 2.0, eps: float = 1e-5) -> Array:
  """log_base(x) via the ratio of two safe_logs."""
  return safe_divide(safe_log(x, eps), safe_log(jnp_float32(base), eps), eps)


def log10(x: Array, eps: float = 1e-5) -> Array:
  """Base-10 logarithm (safe at zero)."""
  return logb(x, base=10.0, eps=eps)


def log_scale(x: Array, min_x: float, max_x: float) -> Array:
  """Map [-1, 1] onto [min_x, max_x] with geometric (log-domain) spacing."""
  x = jnp_float32(x)
  x = (x + 1.0) / 2.0  # Scale [-1, 1] to [0, 1].
  return jnp.exp((1.0 - x) * np.log(min_x) + x * np.log(max_x))


def soft_limit(x: Array, x_min: float = 0.0, x_max: float = 1.0) -> Array:
  """Smooth double-softplus saturation onto [x_min, x_max]."""
  return jax.nn.softplus(x) + x_min - jax.nn.softplus(x - (x_max - x_min))


@jax.custom_vjp
def gradient_reversal(x: Array) -> Array:
  """Forward identity whose VJP negates the cotangent (adversarial branches)."""
  return x


def _gradient_reversal_fwd(x):
  return x, None


def _gradient_reversal_bwd(_, g):
  return (-g,)


gradient_reversal.defvjp(_gradient_reversal_fwd, _gradient_reversal_bwd)


# ---------------------------------------------------------------------------
# Unit conversions
# ---------------------------------------------------------------------------
def amplitude_to_db(amplitude: Array,
                    ref_db: float = 0.0,
                    range_db: float = DB_RANGE) -> Array:
  """Converts amplitude in linear scale to power in decibels."""
  power = jnp_float32(amplitude)**2.0
  return power_to_db(power, ref_db=ref_db, range_db=range_db)


def power_to_db(power: Array,
                ref_db: float = 0.0,
                range_db: float = DB_RANGE) -> Array:
  """Converts power from linear scale to decibels."""
  pmin = 10**-(range_db / 10.0)
  power = jnp.maximum(pmin, jnp_float32(power))
  db = 10.0 * log10(power)
  db -= ref_db
  return jnp.maximum(db, -range_db)


def db_to_amplitude(db: Array) -> Array:
  """Converts power in decibels to amplitude in linear scale."""
  return db_to_power(jnp_float32(db) / 2.0)


def db_to_power(db: Array) -> Array:
  """Converts power from decibels to linear scale."""
  return 10.0**(jnp_float32(db) / 10.0)


def midi_to_hz(notes: Number, midi_zero_silence: bool = False) -> Array:
  """Converts MIDI pitch to frequency in hertz."""
  notes = jnp_float32(notes)
  hz = 440.0 * (2.0**((notes - 69.0) / 12.0))
  if midi_zero_silence:
    hz = jnp.where(notes == 0.0, 0.0, hz)
  return hz


def hz_to_midi(frequencies: Number) -> Array:
  """Converts frequency in hertz to MIDI pitch (0 Hz -> MIDI 0)."""
  frequencies = jnp_float32(frequencies)
  notes = 12.0 * (logb(frequencies, 2.0) - logb(jnp_float32(440.0), 2.0)) + 69.0
  return jnp.where(frequencies <= 0.0, 0.0, notes)


def unit_to_midi(unit: Number,
                 midi_min: Number = 20.0,
                 midi_max: Number = 90.0,
                 clip: bool = False) -> Array:
  """Map the unit interval [0, 1] to MIDI notes."""
  unit = jnp.clip(unit, 0.0, 1.0) if clip else jnp_float32(unit)
  return midi_min + (midi_max - midi_min) * unit


def midi_to_unit(midi: Number,
                 midi_min: Number = 20.0,
                 midi_max: Number = 90.0,
                 clip: bool = False) -> Array:
  """Map MIDI notes to the unit interval [0, 1]."""
  unit = (jnp_float32(midi) - midi_min) / (midi_max - midi_min)
  return jnp.clip(unit, 0.0, 1.0) if clip else unit


def unit_to_hz(unit: Number,
               hz_min: Number,
               hz_max: Number,
               clip: bool = False) -> Array:
  """Map unit interval [0, 1] to [hz_min, hz_max], scaling logarithmically."""
  midi = unit_to_midi(unit,
                      midi_min=hz_to_midi(hz_min),
                      midi_max=hz_to_midi(hz_max),
                      clip=clip)
  return midi_to_hz(midi)


def hz_to_unit(hz: Number,
               hz_min: Number,
               hz_max: Number,
               clip: bool = False) -> Array:
  """Map [hz_min, hz_max] to unit interval [0, 1], scaling logarithmically."""
  midi = hz_to_midi(hz)
  return midi_to_unit(midi,
                      midi_min=hz_to_midi(hz_min),
                      midi_max=hz_to_midi(hz_max),
                      clip=clip)


def hz_to_bark(hz: Number) -> Array:
  """Frequency in hertz to Bark scale (Traunmuller 1990)."""
  return 26.81 / (1.0 + (1960.0 / jnp_float32(hz))) - 0.53


def bark_to_hz(bark: Number) -> Array:
  """Bark scale to frequency in hertz (Traunmuller 1990)."""
  return 1960.0 / (26.81 / (jnp_float32(bark) + 0.53) - 1.0)


def hz_to_mel(hz: Number) -> Array:
  """Frequency in hertz to mel scale (HTK convention)."""
  return 2595.0 * logb(1.0 + jnp_float32(hz) / 700.0, 10.0)


def mel_to_hz(mel: Number) -> Array:
  """Mel scale to frequency in hertz (HTK convention)."""
  return 700.0 * (10.0**(jnp_float32(mel) / 2595.0) - 1.0)


def hz_to_erb(hz: Number) -> Array:
  """Equivalent Rectangular Bandwidth (Moore & Glasberg 1996)."""
  return 0.108 * jnp_float32(hz) + 24.7


# ---------------------------------------------------------------------------
# Scaling / control nonlinearities
# ---------------------------------------------------------------------------
def exp_sigmoid(x: Array,
                exponent: float = 10.0,
                max_value: float = 2.0,
                threshold: float = 1e-7) -> Array:
  """Exponentiated sigmoid pointwise nonlinearity.

  Bounds input to [threshold, max_value] with slope given by exponent. This is
  the canonical DDSP control nonlinearity for amplitudes and magnitudes.
  """
  x = jnp_float32(x)
  return max_value * jax.nn.sigmoid(x)**jnp.log(jnp_float32(exponent)) \
      + threshold


def sym_exp_sigmoid(x: Array, width: float = 8.0) -> Array:
  """Symmetrical version of exp_sigmoid centered at (0, 1e-7)."""
  x = jnp_float32(x)
  return exp_sigmoid(width * (jnp.abs(x) / 2.0 - 1.0))


def _add_depth_axis(freqs: Array, depth: int = 1) -> Array:
  """Turns [batch, time, sinusoids*depth] to [batch, time, sinusoids, depth]."""
  freqs = freqs[..., jnp.newaxis]
  n_batch, n_time, n_combined, _ = freqs.shape
  n_sinusoids = int(n_combined) // depth
  return jnp.reshape(freqs, (n_batch, n_time, n_sinusoids, depth))


def frequencies_softmax(freqs: Array,
                        depth: int = 1,
                        hz_min: float = 20.0,
                        hz_max: float = 8000.0) -> Array:
  """Softmax to logarithmically scale network outputs to frequencies.

  Args:
    freqs: Network outputs, [batch, time, n_sinusoids * depth] or
      [batch, time, n_sinusoids, depth].
    depth: If freqs is 3-D, number of softmax components per sinusoid to
      unroll from the last dimension.
    hz_min: Lowest frequency to consider.
    hz_max: Highest frequency to consider.

  Returns:
    A tensor of frequencies in hertz [batch, time, n_sinusoids].
  """
  if freqs.ndim == 3:
    freqs = _add_depth_axis(freqs, depth)
  else:
    depth = int(freqs.shape[-1])

  f_probs = jax.nn.softmax(freqs, axis=-1)

  # [1, 1, 1, D]
  unit_bins = jnp.linspace(0.0, 1.0, depth)
  unit_bins = unit_bins[jnp.newaxis, jnp.newaxis, jnp.newaxis, :]

  f_unit = jnp.sum(unit_bins * f_probs, axis=-1)
  return unit_to_hz(f_unit, hz_min=hz_min, hz_max=hz_max)


def frequencies_sigmoid(freqs: Array,
                        depth: int = 1,
                        hz_min: float = 0.0,
                        hz_max: float = 8000.0) -> Array:
  """Sum of sigmoids to logarithmically scale network outputs to frequencies.

  Args:
    freqs: Network outputs, [batch, time, n_sinusoids * depth] or
      [batch, time, n_sinusoids, depth].
    depth: If freqs is 3-D, number of sigmoid components per sinusoid to
      unroll from the last dimension.
    hz_min: Lowest frequency to consider.
    hz_max: Highest frequency to consider.

  Returns:
    A tensor of frequencies in hertz [batch, time, n_sinusoids].
  """
  if freqs.ndim == 3:
    freqs = _add_depth_axis(freqs, depth)
  else:
    depth = int(freqs.shape[-1])

  # Probs: [B, T, N, D].
  f_probs = jax.nn.sigmoid(freqs)

  # Partition frequency space in factors of 2, limited to [hz_min, hz_max].
  hz_scales = []
  hz_min_copy = hz_min
  remainder = hz_max - hz_min
  scale_factor = remainder**(1.0 / depth)
  for i in range(depth):
    if i == (depth - 1):
      # Last depth element goes between minimum and remainder.
      hz_max = remainder
      hz_min = hz_min_copy
    else:
      # Reduce max by a constant factor for each depth element.
      hz_max = remainder * (1.0 - 1.0 / scale_factor)
      hz_min = 0
      remainder -= hz_max

    hz_scales.append(unit_to_hz(f_probs[..., i], hz_min=hz_min, hz_max=hz_max))

  return jnp.sum(jnp.stack(hz_scales, axis=-1), axis=-1)


def get_deviation_hz(midi_interval: float, frequency_hz: Array) -> Array:
  """Convert a midi interval to a deviation in hz at a given frequency."""
  frequency_midi = hz_to_midi(frequency_hz)
  return midi_to_hz(frequency_midi + midi_interval) - frequency_hz


def frequencies_critical_bands(freqs: Array,
                               depth: int = 1,
                               depth_scale: float = 10.0,
                               bandwidth_scale: float = 1.0,
                               hz_min: float = 20.0,
                               hz_max: float = 8000.0,
                               scale: str = 'bark') -> Array:
  """Center frequencies on the mel or bark scale, with ranges given by ERB.

  Each sinusoid gets a fixed center frequency (spaced evenly on a critical
  band scale) plus a tanh-bounded deviation whose width is the equivalent
  rectangular bandwidth (ERB) at that frequency. Depth components contribute
  at geometrically decreasing scales (depth_scale**-i).
  """
  if freqs.ndim == 3:
    freqs = _add_depth_axis(freqs, depth)
  else:
    depth = int(freqs.shape[-1])

  n_sinusoids = int(freqs.shape[-2])

  # Center frequencies evenly spaced on the critical band scale.
  if scale == 'bark':
    bark_min = hz_to_bark(hz_min)
    bark_max = hz_to_bark(hz_max)
    linear_bark = jnp.linspace(float(bark_min), float(bark_max), n_sinusoids)
    f_center = bark_to_hz(linear_bark)
  else:
    mel_min = hz_to_mel(hz_min)
    mel_max = hz_to_mel(hz_max)
    linear_mel = jnp.linspace(float(mel_min), float(mel_max), n_sinusoids)
    f_center = mel_to_hz(linear_mel)

  # Bandwidths given by equivalent rectangular bandwidth (ERB).
  bw = hz_to_erb(f_center)

  modifier = jnp.tanh(freqs)
  depth_modifier = depth_scale**-jnp.arange(depth, dtype=jnp.float32)
  modifier = jnp.sum(
      modifier * depth_modifier[jnp.newaxis, jnp.newaxis, jnp.newaxis, :],
      axis=-1)

  f_modifier = bandwidth_scale * bw[jnp.newaxis, jnp.newaxis, :] * modifier
  return soft_limit(f_center + f_modifier, hz_min, hz_max)
