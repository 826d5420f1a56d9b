"""Time-axis (sequence-parallel) sharding of audio synthesis.

A new capability beyond the reference (SURVEY.md section 5.7): the audio
time axis is sharded across the 'time' mesh axis, so arbitrarily long
audio can be synthesized/filtered with per-chip memory bounded by the
shard length. The decompositions:

  * phase accumulation: each shard computes a local cumsum of angular
    frequency; per-shard totals are exchanged (all_gather over the tiny
    [batch, 1, 1] totals rides ICI) and an exclusive prefix gives each
    shard its carry - exactly the reference's `angular_cumsum` chunk-carry
    trick (reference core.py:800-866) lifted to the device mesh.
  * fft_convolve: each shard convolves its own audio frames locally
    (block FFT + overlap-add); the OLA tail that spills past the shard
    boundary is ring-propagated to following shards with
    `jax.lax.ppermute` and accumulated (overlap-save halo exchange).
    Group-delay compensation is folded in by pre-cropping the local
    output, so the result equals the single-device
    `fft_convolve(..., 'same', delay_compensation)` exactly.

Everything is differentiable: collectives transpose automatically
(all_gather <-> reduce-scatter, ppermute <-> reverse ppermute), so the
sharded forward has a correct halo-accumulating adjoint for free.

All functions here are written to run *inside* `jax.shard_map` with a mesh
axis named 'time'; `time_sharded_harmonic_synthesis` and
`time_sharded_fft_convolve` are user-facing wrappers that apply shard_map
over a provided mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ddsp_tpu.ops import fftconv as fftconv_ops
from ddsp_tpu.ops import oscillator as osc_ops
from ddsp_tpu.parallel.pallas_halo import neighbor_shift
# Note: the ops package __init__ shadows the `resample` submodule name with
# the function of the same name; import the function directly.
from ddsp_tpu.ops.resample import resample as resample_fn

Array = jax.Array
TIME_AXIS = 'time'
DATA_AXIS = 'data'


def _batch_axis(mesh: Mesh, batch_size: Optional[int] = None):
  """Mesh axis the batch dim shards over ('data' when present, else None).

  The user-facing wrappers shard every batched operand over this axis so
  data parallelism composes with time sharding: each device touches only
  its local batch rows (no all-gather of the global batch onto every
  time shard). A batch not divisible by the data-axis size (e.g. one
  long clip evaluated on the training mesh) falls back to replication so
  the call still works.
  """
  if DATA_AXIS not in mesh.axis_names:
    return None
  n = mesh.shape[DATA_AXIS]
  if batch_size is not None and batch_size % n != 0:
    return None
  return DATA_AXIS


# ---------------------------------------------------------------------------
# Inside-shard_map building blocks
# ---------------------------------------------------------------------------
def local_phase_cumsum(omega_local: Array,
                       axis_name: str = TIME_AXIS) -> Array:
  """Phase cumsum over a time-sharded angular-frequency array.

  Args:
    omega_local: Local shard of radians-per-sample, [batch, t_local, ...].
    axis_name: Mesh axis the time dimension is sharded over.

  Returns:
    Local shard of the *global* cumulative phase (shard-count invariant up
    to float rounding of the carry, which is kept mod 2*pi).
  """
  local = jnp.cumsum(omega_local, axis=1)
  totals = local[:, -1:, ...] % (2.0 * np.pi)
  # [n_shards, batch, 1, ...] tiny; rides ICI.
  all_totals = jax.lax.all_gather(totals, axis_name)
  n = all_totals.shape[0]
  idx = jax.lax.axis_index(axis_name)
  mask = (jnp.arange(n) < idx).astype(local.dtype)
  mask = mask.reshape((n,) + (1,) * totals.ndim)
  carry = jnp.sum(all_totals * mask, axis=0) % (2.0 * np.pi)
  return local + carry


def local_fft_convolve_same(audio_local: Array,
                            ir: Array,
                            n_ir_frames: int,
                            ir_size: int,
                            delay_compensation: int = -1,
                            axis_name: str = TIME_AXIS,
                            halo_impl: str = 'xla') -> Array:
  """Time-sharded LTV fft_convolve with 'same' padding.

  Args:
    audio_local: Local audio shard, [batch, t_local]. The *global* length
      t_local * n_shards must be divisible by n_ir_frames, and the frame
      size must divide t_local (frames don't straddle shard boundaries).
    ir: Impulse responses, replicated: [batch, n_ir_frames, ir_size].
    n_ir_frames: Global number of IR frames.
    ir_size: IR length in samples.
    delay_compensation: Group-delay pre-crop; -1 = (ir_size - 1) // 2 - 1
      (the linear-phase default, reference core.py:1338-1380).
    axis_name: Mesh axis name for the time dimension.

  Returns:
    Local shard of fft_convolve(audio, ir, 'same', delay_compensation).
  """
  n_shards = jax.lax.axis_size(axis_name)
  my_idx = jax.lax.axis_index(axis_name)
  batch, t_local = audio_local.shape
  t_global = t_local * n_shards

  frame_size = int(np.ceil(t_global / n_ir_frames))
  # Convolution is time-invariant within one IR frame, so a frame larger
  # than the shard can be split into shard-sized sub-frames that reuse the
  # same IR (the LTI/reverb case where n_ir_frames < n_shards).
  sub_frame = min(frame_size, t_local)
  if t_local % sub_frame != 0 or frame_size % sub_frame != 0:
    raise ValueError(
        f'Shard length {t_local} and frame size {frame_size} '
        '(= ceil(T / n_ir_frames)) must align; pick shard counts so frames '
        'do not straddle shard boundaries.')
  frames_per_shard = t_local // sub_frame

  # IR frame index for each of my local sub-frames.
  sub_starts = my_idx * t_local + jnp.arange(frames_per_shard) * sub_frame
  ir_idx = sub_starts // frame_size
  ir_local = jnp.take(ir, ir_idx, axis=1)

  # Local block convolution.
  fft_size = fftconv_ops.get_fft_size(sub_frame, ir_size, power_of_2=True)
  audio_frames = jnp.reshape(audio_local,
                             (batch, frames_per_shard, sub_frame))
  audio_fft = jnp.fft.rfft(audio_frames, fft_size)
  ir_fft = jnp.fft.rfft(ir_local, fft_size)
  frames_out = jnp.fft.irfft(audio_fft * ir_fft,
                             fft_size).astype(jnp.float32)
  # Local overlap-add: length (frames_per_shard - 1) * frame + fft.
  out_local = fftconv_ops.overlap_and_add(frames_out, sub_frame)

  # Fold in group-delay compensation by pre-cropping: global output
  # position p gets sum of out_i[p + delay - i * t_local].
  delay = ((ir_size - 1) // 2 - 1 if delay_compensation < 0
           else delay_compensation)
  head = out_local[:, :delay] if delay > 0 else None
  if delay > 0:
    out_local = out_local[:, delay:]

  result = out_local[:, :t_local]
  if result.shape[1] < t_local:
    result = jnp.pad(result, ((0, 0), (0, t_local - result.shape[1])))
  tail = out_local[:, t_local:]

  # Ring-propagate the spilled tail to the following shards.
  tail_len = tail.shape[1]
  k_steps = max(1, -(-tail_len // t_local)) if tail_len else 0
  if tail_len:
    pad = k_steps * t_local - tail_len
    carry = jnp.pad(tail, ((0, 0), (0, pad)))
    for _ in range(k_steps):
      carry = neighbor_shift(carry, +1, axis_name, impl=halo_impl)
      result = result + carry[:, :t_local]
      carry = jnp.concatenate(
          [carry[:, t_local:], jnp.zeros_like(carry[:, :t_local])], axis=1)

  # Left halo: the delay shift makes the tail output positions of the
  # preceding ceil(delay / t_local) shards draw on shard i's *head* (its
  # first `delay` raw samples, pre-crop). Ring the heads left; step s
  # delivers the buffer chunk aligned with the receiver's own output span.
  # With delay > t_local (e.g. the canonical 48000-tap reverb at high
  # shard counts) the head simply rides the ring for multiple steps.
  # Right-edge shards correctly accumulate zeros flowing in off the ring's
  # end: their own raw OLA output already spans every raw position their
  # window needs.
  if head is not None and head.shape[1] > 0:
    k_left = -(-delay // t_local)
    # Buffer covers output positions [(i - k_left) * t_local, i * t_local);
    # the head occupies its last `delay` entries.
    carry = jnp.pad(head, ((0, 0), (k_left * t_local - delay, 0)))
    for s in range(1, k_left + 1):
      carry = neighbor_shift(carry, -1, axis_name, impl=halo_impl)
      result = result + carry[:, (k_left - s) * t_local:
                              (k_left - s + 1) * t_local]
  return result


def _local_upsample_2tap(frames: Array, n_samples: int, t_local: int,
                         start: Array, method: str) -> Array:
  """The [start, start + t_local) window of resample(frames, n_samples).

  For hop-aligned windows (t_local a multiple of hop = n_samples //
  n_frames) both 'window' (overlap-add hann) and 'linear' resampling are
  2-tap interpolations with a per-hop-periodic weight pattern, so the
  local window needs only its own t_local // hop + 1 frames - the whole
  point of time sharding is that a shard never materializes an
  O(n_samples)-long envelope. 'window' reproduces the global
  upsample_with_windows bit for bit (identical per-interval weights);
  'linear' matches up to one f64->f32 rounding of the fractional
  coordinate.

  Args:
    frames: [batch, n_frames, channels] frame-rate controls (replicated).
    n_samples: GLOBAL output length the full resample would produce.
    t_local: This shard's window length.
    start: Traced first global sample index of the window (hop-aligned).
    method: 'window' or 'linear'.

  Returns:
    [batch, t_local, channels] local envelope window.
  """
  n_frames = int(frames.shape[1])
  hop = n_samples // n_frames
  n_loc = t_local // hop
  if method == 'window':
    # Same construction as resample.upsample_with_windows (periodic hann).
    t = jnp.arange(2 * hop, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * np.pi * t / (2 * hop))
    rise, fall = w[:hop], w[hop:]
  elif method == 'linear':
    d = (np.arange(hop, dtype=np.float64) / hop).astype(np.float32)
    rise, fall = jnp.asarray(d), jnp.asarray(1.0 - d)
  else:
    raise ValueError(f'Unsupported 2-tap method: {method!r}')
  # Endpoint extension (hold the last frame), as in the global resample.
  ext = jnp.concatenate([frames, frames[:, -1:, :]], axis=1)
  q0 = start // hop
  blk = jax.lax.dynamic_slice_in_dim(ext, q0, n_loc + 1, axis=1)
  seg = (blk[:, 1:, :, jnp.newaxis] * rise
         + blk[:, :-1, :, jnp.newaxis] * fall)
  seg = jnp.transpose(seg, (0, 1, 3, 2))
  return seg.reshape(frames.shape[0], t_local, frames.shape[-1])


def _local_upsample_2tap_gather(frames: Array, n_samples: int, t_local: int,
                                start: Array, method: str) -> Array:
  """General-offset variant of _local_upsample_2tap (any integer hop).

  Handles windows that are NOT hop-aligned: output position p = start + j
  reads frames p // hop and p // hop + 1 with the per-hop-periodic 2-tap
  weights, so a gather over a (t_local // hop + 2)-frame block covers any
  offset. Memory stays O(t_local + hop) - no global envelope is ever
  materialized. Same math as the aligned reshape path, just indexed
  per-sample instead of per-hop-block.
  """
  n_frames = int(frames.shape[1])
  hop = n_samples // n_frames
  if method == 'window':
    t = jnp.arange(2 * hop, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos(2.0 * np.pi * t / (2 * hop))
    rise, fall = w[:hop], w[hop:]
  elif method == 'linear':
    d = (np.arange(hop, dtype=np.float64) / hop).astype(np.float32)
    rise, fall = jnp.asarray(d), jnp.asarray(1.0 - d)
  else:
    raise ValueError(f'Unsupported 2-tap method: {method!r}')
  # Enough held-last frames that the dynamic slice never clamps (held
  # values match the endpoint-extension semantics anyway).
  n_blk = t_local // hop + 2
  ext = jnp.concatenate(
      [frames, jnp.repeat(frames[:, -1:, :], n_blk, axis=1)], axis=1)
  q0 = start // hop
  blk = jax.lax.dynamic_slice_in_dim(ext, q0, n_blk, axis=1)
  p = start + jnp.arange(t_local)
  ql = p // hop - q0          # frame index within blk, in [0, n_blk - 2]
  r = p % hop                 # position within the hop
  lo = jnp.take(blk, ql, axis=1)
  hi = jnp.take(blk, ql + 1, axis=1)
  wr = jnp.take(rise, r)[jnp.newaxis, :, jnp.newaxis]
  wf = jnp.take(fall, r)[jnp.newaxis, :, jnp.newaxis]
  return hi * wr + lo * wf


def local_harmonic_synthesis(frequencies: Array,
                             amplitudes: Array,
                             harmonic_distribution: Optional[Array],
                             n_samples: int,
                             sample_rate: int = 16000,
                             amp_resample_method: str = 'window',
                             axis_name: str = TIME_AXIS) -> Array:
  """Time-sharded harmonic synthesis (controls replicated, audio sharded).

  Frame-rate controls are tiny (and replicated); each shard materializes
  only its own t_local-long slice of the audio-rate envelopes
  (_local_upsample_2tap - never the O(n_samples) full envelope),
  accumulates its local phase, and exchanges one scalar carry per batch
  element. Output is the local shard of [batch, n_samples] audio.
  """
  n_shards = jax.lax.axis_size(axis_name)
  my_idx = jax.lax.axis_index(axis_name)
  if n_samples % n_shards:
    raise ValueError(f'n_samples {n_samples} must divide over {n_shards} '
                     'time shards.')
  t_local = n_samples // n_shards

  if harmonic_distribution is not None:
    n_harmonics = int(harmonic_distribution.shape[-1])
    harmonic_amplitudes = amplitudes * harmonic_distribution
  else:
    n_harmonics = 1
    harmonic_amplitudes = amplitudes

  start = my_idx * t_local

  def hop_aligned(arr):
    n_frames = int(arr.shape[1])
    return (n_samples % n_frames == 0
            and t_local % (n_samples // n_frames) == 0)

  def local_env(arr, method):
    """Local envelope window; always O(t_local) memory when sharded.

    n_shards == 1 keeps the exact global code path (bit-identical to the
    dense forward, which the trivial-mesh equivalence test pins). Sharded
    windows use the reshape fast path when hop-aligned and the per-sample
    gather otherwise - neither ever materializes the O(n_samples) global
    envelope. Configurations with no memory-sharded implementation
    (non-integer hop, or a method other than 'window'/'linear') raise
    instead of silently computing the dense envelope: silent un-sharding
    is exactly the OOM path time sharding exists to avoid.
    """
    if n_shards == 1:
      env = resample_fn(arr, n_samples, method=method)
      return jax.lax.dynamic_slice_in_dim(env, start, t_local, axis=1)
    n_frames = int(arr.shape[1])
    if method in ('window', 'linear') and n_samples % n_frames == 0:
      if hop_aligned(arr):
        return _local_upsample_2tap(arr, n_samples, t_local, start, method)
      return _local_upsample_2tap_gather(arr, n_samples, t_local, start,
                                         method)
    raise ValueError(
        'Time-sharded harmonic synthesis has no memory-sharded upsampling '
        f'path for method={method!r} with n_frames={n_frames}, '
        f'n_samples={n_samples} (hop must be an integer and the method '
        "'window' or 'linear'). Falling back to the dense global envelope "
        'would defeat time sharding; pick n_samples divisible by n_frames '
        'or run unsharded.')

  amp_env = local_env(harmonic_amplitudes, amp_resample_method)
  f0_env = local_env(frequencies, 'linear')

  omega = f0_env * (2.0 * np.pi) / float(sample_rate)
  phase0 = local_phase_cumsum(omega, axis_name)

  f_ratios = jnp.linspace(1.0, float(n_harmonics), int(n_harmonics))
  f_ratios = f_ratios[jnp.newaxis, jnp.newaxis, :]
  amp_env = osc_ops.remove_above_nyquist(f0_env * f_ratios, amp_env,
                                         sample_rate)
  wavs = jnp.sin(phase0 * f_ratios)
  return jnp.sum(amp_env * wavs, axis=-1)


# ---------------------------------------------------------------------------
# User-facing shard_map wrappers
# ---------------------------------------------------------------------------
def time_sharded_harmonic_synthesis(mesh: Mesh,
                                    frequencies: Array,
                                    amplitudes: Array,
                                    harmonic_distribution: Optional[Array],
                                    n_samples: int,
                                    sample_rate: int = 16000,
                                    amp_resample_method: str = 'window'
                                    ) -> Array:
  """Harmonic synthesis with audio sharded over the mesh 'time' axis.

  Controls ([batch, n_frames, ...]) are replicated; the returned audio
  [batch, n_samples] is sharded P(None, 'time').
  """
  kwargs = dict(n_samples=n_samples, sample_rate=sample_rate,
                amp_resample_method=amp_resample_method)
  b = _batch_axis(mesh, int(frequencies.shape[0]))
  if harmonic_distribution is None:
    fn = functools.partial(local_harmonic_synthesis,
                           harmonic_distribution=None, **kwargs)
    return jax.shard_map(
        lambda f, a: fn(f, a), mesh=mesh, in_specs=(P(b), P(b)),
        out_specs=P(b, TIME_AXIS))(frequencies, amplitudes)
  fn = functools.partial(local_harmonic_synthesis, **kwargs)
  return jax.shard_map(
      fn, mesh=mesh, in_specs=(P(b), P(b), P(b)),
      out_specs=P(b, TIME_AXIS))(
          frequencies, amplitudes, harmonic_distribution)


def time_sharded_fft_convolve(mesh: Mesh,
                              audio: Array,
                              impulse_response: Array,
                              delay_compensation: int = -1,
                              halo_impl: str = 'xla') -> Array:
  """fft_convolve(audio, ir, 'same') with audio sharded over 'time'.

  audio: [batch, T] sharded P(None, 'time') (or replicated host array);
  impulse_response: [batch, n_ir_frames, ir_size], replicated.
  """
  if impulse_response.ndim == 2:
    impulse_response = impulse_response[:, jnp.newaxis, :]
  _, n_ir_frames, ir_size = impulse_response.shape
  fn = functools.partial(
      local_fft_convolve_same,
      n_ir_frames=n_ir_frames,
      ir_size=ir_size,
      delay_compensation=delay_compensation,
      halo_impl=halo_impl)
  # check_vma=False: the vma type checker rejects the FFT transpose with a
  # replicated ir operand; the shard_map transpose still inserts the psum
  # for the replicated input's cotangent (verified by the gradient
  # equivalence test).
  b = _batch_axis(mesh, int(audio.shape[0]))
  return jax.shard_map(
      fn, mesh=mesh,
      in_specs=(P(b, TIME_AXIS), P(b)),
      out_specs=P(b, TIME_AXIS),
      check_vma=False)(audio, impulse_response)


# ---------------------------------------------------------------------------
# Time-sharded STFT magnitudes + multi-scale spectral loss
# ---------------------------------------------------------------------------
def local_stft_mag(audio_local: Array,
                   size: int,
                   overlap: float = 0.75,
                   axis_name: str = TIME_AXIS,
                   halo_impl: str = 'xla'):
  """Local STFT magnitudes of a time-sharded signal, with halo exchange.

  Matches ops.spectral.compute_mag(audio, size, overlap, pad_end=True) on
  the gathered signal: global frame starts are every hop samples; each
  shard computes the frames that *start* inside it, fetching up to
  (size - 1) halo samples from the right neighbor (the last shard's halo is
  zeros, which reproduces pad_end). Because shard boundaries need not be
  hop-aligned, every shard allocates floor(t_local/hop) + 1 frame slots and
  returns a validity mask.

  Args:
    audio_local: Local shard, [batch, t_local] (t_local >= size).
    size: Frame/window size.
    overlap: Fractional overlap (hop = size * (1 - overlap)).
    axis_name: Mesh axis of the time dimension.

  Returns:
    (mags, mask): [batch, n_slots, size // 2 + 1] local magnitudes and
    [n_slots] float validity mask (1 = real frame).
  """
  n_shards = jax.lax.axis_size(axis_name)
  my_idx = jax.lax.axis_index(axis_name)
  batch, t_local = audio_local.shape
  hop = int(size * (1.0 - overlap))
  if t_local < size:
    raise ValueError(f'Shard length ({t_local}) must be >= frame size '
                     f'({size}) for the single-neighbor halo exchange.')

  # Right halo: first (size - 1) samples of the right neighbor; ppermute
  # leaves the last shard's halo zero = pad_end semantics.
  halo = size - 1
  right_halo = neighbor_shift(audio_local[:, :halo], -1, axis_name,
                              impl=halo_impl)
  ext = jnp.concatenate([audio_local, right_halo], axis=1)

  # Global frame starts are k * hop; my frames are those with
  # shard_start <= k * hop < shard_end. First local start offset:
  shard_start = my_idx * t_local
  first_k = -(-shard_start // hop)  # ceil div (traced)
  offset = first_k * hop - shard_start
  n_slots = t_local // hop + 1
  total_frames = (t_local * n_shards + hop - 1) // hop  # global ceil

  starts = offset + jnp.arange(n_slots) * hop
  valid = ((first_k + jnp.arange(n_slots)) < total_frames) & (
      starts < t_local)

  idx = starts[:, jnp.newaxis] + jnp.arange(size)[jnp.newaxis, :]
  # Invalid slots clamp to 0 (masked out of any reduction).
  idx = jnp.where(valid[:, jnp.newaxis], idx, 0)
  frames = ext[:, idx]  # [batch, n_slots, size]

  # Same periodic hann as compute_mag's framing (matters for odd sizes).
  window = fftconv_ops.hann_window(size)
  fft_size = int(2**np.ceil(np.log2(size)))
  mags = jnp.abs(jnp.fft.rfft(frames * window, fft_size))
  mask = valid.astype(jnp.float32)
  return mags.astype(jnp.float32), mask


def _prepend_left_neighbor_frame(mags: Array, mask: Array,
                                 axis_name: str,
                                 halo_impl: str = 'xla') -> Array:
  """[batch, n_slots, bins] of each slot's *previous* global frame.

  Valid slots are a prefix of the slot axis and frames partition
  consecutively across shards, so slot j's predecessor is slot j - 1
  locally, and slot 0's predecessor is the left neighbor's last valid
  frame - one [batch, 1, bins] ring exchange. Shard 0 receives zeros
  (masked out by the caller's global-index check).
  """
  n_valid = jnp.maximum(jnp.sum(mask).astype(jnp.int32), 1)
  last = jax.lax.dynamic_slice_in_dim(mags, n_valid - 1, 1, axis=1)
  received = neighbor_shift(last, +1, axis_name, impl=halo_impl)
  return jnp.concatenate([received, mags[:, :-1]], axis=1)


def local_loudness(audio_local: Array,
                   sample_rate: int = 16000,
                   frame_rate: int = 250,
                   n_fft: int = 2048,
                   range_db: float = None,
                   ref_db: float = 0.0,
                   axis_name: str = TIME_AXIS,
                   halo_impl: str = 'xla'):
  """Per-frame A-weighted loudness of a time-sharded signal.

  Matches ops.spectral.compute_loudness(audio, sample_rate, frame_rate,
  n_fft, padding='center') on the gathered signal. 'center' padding means
  global frame k starts at k * hop - n_fft // 2; frames are owned by the
  shard containing that start (shard 0 also owns the negative-start
  frames, reading its local zero pad), and each shard fetches an n_fft
  right halo from its neighbor.

  Returns:
    (loudness, mask): [batch, n_slots] local loudness frames in dB and
    [n_slots] float validity mask.
  """
  from ddsp_tpu.ops import spectral  # pylint: disable=g-import-not-at-top
  from ddsp_tpu.ops.core import DB_RANGE  # pylint: disable=g-import-not-at-top
  if range_db is None:
    range_db = DB_RANGE

  n_shards = jax.lax.axis_size(axis_name)
  my_idx = jax.lax.axis_index(axis_name)
  batch, t_local = audio_local.shape
  frame_size = n_fft
  hop = sample_rate // frame_rate
  pad_left = frame_size // 2
  if t_local < frame_size:
    raise ValueError(f'Shard length ({t_local}) must be >= n_fft '
                     f'({frame_size}) for the single-neighbor halo '
                     'exchange in the loudness term.')
  t_global = t_local * n_shards
  total_frames = t_global // hop + 1  # 'center' padding frame count.

  right = neighbor_shift(audio_local[:, :frame_size], -1, axis_name,
                         impl=halo_impl)
  ext = jnp.concatenate(
      [jnp.zeros((batch, pad_left), audio_local.dtype), audio_local, right],
      axis=1)

  # first_k(i) = 0 for shard 0, else ceil((i * t_local + pad_left) / hop);
  # consecutive shards' ranges partition the global frame sequence.
  shard_start = my_idx * t_local
  first_k = jnp.where(my_idx == 0, 0,
                      -(-(shard_start + pad_left) // hop))
  next_first = jnp.where(
      my_idx == n_shards - 1, total_frames,
      jnp.minimum(-(-(shard_start + t_local + pad_left) // hop),
                  total_frames))
  n_slots = (t_local + pad_left) // hop + 2

  ks = first_k + jnp.arange(n_slots)
  valid = ks < next_first
  # ext index of frame k's start: k * hop - shard_start (>= 0 for owned
  # frames; shard 0's negative-start frames land in its zero pad).
  starts = jnp.where(valid, ks * hop - shard_start, 0)
  idx = starts[:, jnp.newaxis] + jnp.arange(frame_size)[jnp.newaxis, :]
  frames = ext[:, idx] * fftconv_ops.hann_window(frame_size)

  fft_size = int(2**np.ceil(np.log2(frame_size)))
  freqs = tuple(spectral.fft_frequencies(sample_rate, fft_size).tolist())
  weighting = 10**(np.asarray(spectral.a_weighting_np(freqs)) / 10)
  n_bins = fft_size // 2 + 1
  power = jnp.abs(jnp.fft.rfft(frames, fft_size))**2
  avg_power = jnp.sum(power * jnp.asarray(weighting, jnp.float32),
                      axis=-1) / n_bins
  loudness = spectral.power_to_db(avg_power, ref_db=ref_db,
                                  range_db=range_db)
  return loudness.astype(jnp.float32), valid.astype(jnp.float32)


def local_spectral_loss(target_local: Array,
                        audio_local: Array,
                        fft_sizes=(2048, 1024, 512, 256, 128, 64),
                        mag_weight: float = 1.0,
                        delta_time_weight: float = 0.0,
                        delta_freq_weight: float = 0.0,
                        cumsum_freq_weight: float = 0.0,
                        logmag_weight: float = 0.0,
                        loudness_weight: float = 0.0,
                        axis_name: str = TIME_AXIS,
                        batch_axis_name: Optional[str] = None,
                        halo_impl: str = 'xla') -> Array:
  """Multi-scale spectral loss over time-sharded signals - all 6 terms.

  Equals losses.SpectralLoss(...) on the gathered signals: per-size local
  masked sums are psum'd and divided by the global element count. The
  frequency-axis terms (delta_freq, cumsum_freq) are frame-local; the
  delta_time term exchanges one boundary frame per shard; the loudness
  term runs its own 'center'-padded framing with an n_fft halo.
  Differentiable (the halo ppermute transposes to a reverse-permute
  accumulate).

  Args:
    batch_axis_name: Mesh axis the batch dim is sharded over, if any. The
      sums then also psum over it, so the returned scalar is the
      global-batch mean (replicated over every mesh axis, as the wrapper's
      out_specs=P() promises).
  """
  from ddsp_tpu.ops.core import safe_log  # pylint: disable=g-import-not-at-top

  sum_axes = ((axis_name,) if batch_axis_name is None
              else (axis_name, batch_axis_name))
  n_batch_shards = (1 if batch_axis_name is None
                    else jax.lax.axis_size(batch_axis_name))
  my_idx = jax.lax.axis_index(axis_name)

  def masked_mean(diff_abs, m, count):
    return jax.lax.psum(jnp.sum(diff_abs * m), sum_axes) / count

  loss = 0.0
  for size in fft_sizes:
    target_mag, mask = local_stft_mag(target_local, size,
                                      axis_name=axis_name,
                                      halo_impl=halo_impl)
    value_mag, _ = local_stft_mag(audio_local, size, axis_name=axis_name,
                                  halo_impl=halo_impl)
    m = mask[jnp.newaxis, :, jnp.newaxis]
    n_bins = target_mag.shape[-1]
    batch = target_mag.shape[0] * n_batch_shards
    n_frames = jax.lax.psum(jnp.sum(mask), axis_name)
    count = n_frames * batch * n_bins
    if mag_weight > 0:
      loss += mag_weight * masked_mean(
          jnp.abs(target_mag - value_mag), m, count)
    if delta_time_weight > 0:
      t_prev = _prepend_left_neighbor_frame(target_mag, mask, axis_name,
                                            halo_impl)
      v_prev = _prepend_left_neighbor_frame(value_mag, mask, axis_name,
                                            halo_impl)
      # Global frame 0 has no predecessor: mask shard 0's first slot.
      first_global = (my_idx == 0) & (jnp.arange(mask.shape[0]) == 0)
      dm = (mask * (1.0 - first_global.astype(jnp.float32)))[
          jnp.newaxis, :, jnp.newaxis]
      d_count = (n_frames - 1.0) * batch * n_bins
      loss += delta_time_weight * masked_mean(
          jnp.abs((target_mag - t_prev) - (value_mag - v_prev)), dm,
          d_count)
    if delta_freq_weight > 0:
      td = jnp.diff(target_mag, axis=2)
      vd = jnp.diff(value_mag, axis=2)
      loss += delta_freq_weight * masked_mean(
          jnp.abs(td - vd), m, n_frames * batch * (n_bins - 1))
    if cumsum_freq_weight > 0:
      tc = jnp.cumsum(target_mag, axis=2)
      vc = jnp.cumsum(value_mag, axis=2)
      loss += cumsum_freq_weight * masked_mean(jnp.abs(tc - vc), m, count)
    if logmag_weight > 0:
      loss += logmag_weight * masked_mean(
          jnp.abs(safe_log(target_mag) - safe_log(value_mag)), m, count)

  if loudness_weight > 0:
    t_loud, l_mask = local_loudness(target_local, n_fft=2048,
                                    axis_name=axis_name,
                                    halo_impl=halo_impl)
    v_loud, _ = local_loudness(audio_local, n_fft=2048,
                               axis_name=axis_name, halo_impl=halo_impl)
    lm = l_mask[jnp.newaxis, :]
    batch = t_loud.shape[0] * n_batch_shards
    l_count = jax.lax.psum(jnp.sum(l_mask), axis_name) * batch
    loss += loudness_weight * masked_mean(jnp.abs(t_loud - v_loud), lm,
                                          l_count)
  return loss


def time_sharded_spectral_loss(mesh: Mesh,
                               target_audio: Array,
                               audio: Array,
                               fft_sizes=(2048, 1024, 512, 256, 128, 64),
                               mag_weight: float = 1.0,
                               delta_time_weight: float = 0.0,
                               delta_freq_weight: float = 0.0,
                               cumsum_freq_weight: float = 0.0,
                               logmag_weight: float = 0.0,
                               loudness_weight: float = 0.0,
                               halo_impl: str = 'xla') -> Array:
  """SpectralLoss with both signals sharded P(None, 'time') over the mesh.

  The building block for fully sequence-parallel training: synthesis,
  LTV filtering, and the training loss all stay time-sharded; only scalar
  psums and tiny halos cross chips. Supports all six SpectralLoss terms.
  """
  b = _batch_axis(mesh, int(audio.shape[0]))
  fn = functools.partial(local_spectral_loss, fft_sizes=tuple(fft_sizes),
                         mag_weight=mag_weight,
                         delta_time_weight=delta_time_weight,
                         delta_freq_weight=delta_freq_weight,
                         cumsum_freq_weight=cumsum_freq_weight,
                         logmag_weight=logmag_weight,
                         loudness_weight=loudness_weight,
                         batch_axis_name=b,
                         halo_impl=halo_impl)
  # check_vma=False: as with time_sharded_fft_convolve, the vma type
  # checker rejects the FFT transpose; gradient equivalence is pinned by
  # tests instead.
  return jax.shard_map(
      fn, mesh=mesh,
      in_specs=(P(b, TIME_AXIS), P(b, TIME_AXIS)),
      out_specs=P(), check_vma=False)(target_audio, audio)
