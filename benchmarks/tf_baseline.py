"""Measure the reference's TF-CPU throughput for the BASELINE.md workloads.

The reference (magenta/ddsp) publishes no benchmark numbers, so BASELINE.md
calls for measuring its TF implementation on CPU. The reference package
itself cannot be imported here (librosa/crepe/gin not installed), so this
script reproduces the exact op sequence of its signal chain with raw TF ops
(tf.cumsum/tf.sin oscillator bank per reference core.py:912-962;
rfft/irfft/overlap_and_add fft_convolve per core.py:1382-1473;
frequency-sampling FIR per core.py:1476-1564) and times forward+grad.

Run once; results land in benchmarks/baseline_measurements.json and are
committed so bench.py can report vs_baseline without re-measuring.

Usage: python benchmarks/tf_baseline.py [--iters N]
"""

import argparse
import json
import os
import time

import numpy as np
import tensorflow as tf


SR = 16000
N_SAMPLES = 64000
N_FRAMES = 250
N_HARMONICS = 100
N_NOISE_MAGS = 65
REVERB_LEN = 48000


def exp_sigmoid(x, exponent=10.0, max_value=2.0, threshold=1e-7):
  return max_value * tf.nn.sigmoid(x)**tf.math.log(exponent) + threshold


def resample_linear(x, n_timesteps):
  """tf.compat.v1.image.resize bilinear, align_corners=False."""
  y = tf.compat.v1.image.resize(
      x[:, :, tf.newaxis, :], [n_timesteps, 1],
      method=tf.compat.v1.image.ResizeMethod.BILINEAR,
      align_corners=False)
  return y[:, :, 0, :]


def upsample_with_windows(x, n_timesteps):
  x = tf.concat([x, x[:, -1:, :]], axis=1)
  n_intervals = int(x.shape[1]) - 1
  hop = n_timesteps // n_intervals
  window = tf.signal.hann_window(2 * hop)
  xw = tf.transpose(x, (0, 2, 1))[:, :, :, tf.newaxis] * window
  y = tf.signal.overlap_and_add(xw, hop)
  return tf.transpose(y, (0, 2, 1))[:, hop:-hop, :]


def oscillator_bank(freq_env, amp_env):
  amp_env = tf.where(freq_env >= SR / 2.0, tf.zeros_like(amp_env), amp_env)
  omegas = freq_env * (2.0 * np.pi) / SR
  phases = tf.cumsum(omegas, axis=1)
  return tf.reduce_sum(amp_env * tf.sin(phases), axis=-1)


def harmonic_synthesis(f0, amps, hd):
  ratios = tf.linspace(1.0, float(N_HARMONICS),
                       N_HARMONICS)[tf.newaxis, tf.newaxis, :]
  harm_freqs = f0 * ratios
  hd = tf.where(harm_freqs >= SR / 2.0, tf.zeros_like(hd), hd)
  hd = hd / (tf.reduce_sum(hd, axis=-1, keepdims=True) + 1e-7)
  freq_env = resample_linear(harm_freqs, N_SAMPLES)
  amp_env = upsample_with_windows(amps * hd, N_SAMPLES)
  return oscillator_bank(freq_env, amp_env)


def fft_convolve(audio, ir):
  """LTV fft convolution, 'same' padding, no delay comp."""
  batch = int(audio.shape[0])
  audio_size = int(audio.shape[1])
  n_ir_frames = int(ir.shape[1])
  ir_size = int(ir.shape[2])
  frame_size = int(np.ceil(audio_size / n_ir_frames))
  audio_frames = tf.signal.frame(audio, frame_size, frame_size, pad_end=True)
  fft_size = int(2**np.ceil(np.log2(ir_size + frame_size - 1)))
  audio_fft = tf.signal.rfft(audio_frames, [fft_size])
  ir_fft = tf.signal.rfft(ir, [fft_size])
  frames_out = tf.signal.irfft(audio_fft * ir_fft)
  out = tf.signal.overlap_and_add(frames_out, frame_size)
  return out[:, :audio_size]


def frequency_impulse_response(magnitudes, window_size=257):
  ir = tf.signal.irfft(tf.complex(magnitudes, tf.zeros_like(magnitudes)))
  ir_size = int(ir.shape[-1])
  if window_size > ir_size:
    window_size = ir_size
  window = tf.signal.hann_window(window_size)
  padding = ir_size - window_size
  half_idx = (window_size + 1) // 2
  if padding > 0:
    window = tf.concat([window[half_idx:], tf.zeros([padding]),
                        window[:half_idx]], axis=0)
  else:
    window = tf.signal.fftshift(window, axes=-1)
  ir = window * ir
  if padding > 0:
    ir = tf.concat([ir[..., (ir_size - (half_idx - 1)) + 1:],
                    ir[..., :half_idx + 1]], axis=-1)
  else:
    ir = tf.signal.fftshift(ir, axes=-1)
  return ir


def chain_forward(amps, hd, f0, noise_mags, reverb_ir, noise):
  """Harmonic + FilteredNoise + Add + Reverb, reference op-for-op."""
  harmonic = harmonic_synthesis(f0, exp_sigmoid(amps), exp_sigmoid(hd))
  ir = frequency_impulse_response(exp_sigmoid(noise_mags - 5.0), 257)
  noise_sig = fft_convolve(noise, ir)
  mixed = harmonic + noise_sig
  rev_ir = tf.tile(reverb_ir[tf.newaxis, tf.newaxis, :],
                   [int(mixed.shape[0]), 1, 1])
  wet = fft_convolve(mixed, rev_ir)
  return wet + mixed


def bench_chain(batch_size=16, iters=3):
  rng = np.random.RandomState(0)
  amps = tf.constant(rng.randn(batch_size, N_FRAMES, 1), tf.float32)
  hd = tf.constant(rng.randn(batch_size, N_FRAMES, N_HARMONICS), tf.float32)
  f0 = tf.constant(
      220.0 * np.ones((batch_size, N_FRAMES, 1)), tf.float32)
  noise_mags = tf.constant(
      rng.randn(batch_size, N_FRAMES, N_NOISE_MAGS), tf.float32)
  reverb_ir = tf.Variable(
      rng.randn(REVERB_LEN).astype(np.float32) * 1e-6)
  noise = tf.constant(
      rng.uniform(-1, 1, (batch_size, N_SAMPLES)), tf.float32)

  @tf.function
  def step():
    with tf.GradientTape() as tape:
      tape.watch([amps, hd, noise_mags])
      out = chain_forward(amps, hd, f0, noise_mags, reverb_ir, noise)
      loss = tf.reduce_mean(out**2)
    grads = tape.gradient(loss, [amps, hd, noise_mags, reverb_ir])
    return loss, grads

  # Warmup (trace + compile).
  step()
  t0 = time.time()
  for _ in range(iters):
    loss, _ = step()
  _ = float(loss)
  dt = (time.time() - t0) / iters
  samples_per_s = batch_size * N_SAMPLES / dt
  return dict(seconds_per_step=dt, audio_samples_per_s=samples_per_s,
              batch_size=batch_size, n_samples=N_SAMPLES)


def bench_harmonic_forward(iters=3):
  """Workload 1: Harmonic synth forward, batch 1 (reference synths.py:56)."""
  rng = np.random.RandomState(0)
  amps = tf.constant(rng.randn(1, N_FRAMES, 1), tf.float32)
  hd = tf.constant(rng.randn(1, N_FRAMES, N_HARMONICS), tf.float32)
  f0 = tf.constant(200 + 100 * rng.rand(1, N_FRAMES, 1), tf.float32)

  @tf.function
  def fwd():
    return harmonic_synthesis(f0, exp_sigmoid(amps), exp_sigmoid(hd))

  _ = fwd()
  t0 = time.time()
  for _ in range(iters):
    out = fwd()
  _ = float(tf.reduce_sum(out))
  dt = (time.time() - t0) / iters
  return dict(seconds_per_step=dt, audio_samples_per_s=N_SAMPLES / dt)


def bench_filtered_noise(iters=3):
  """Workload 2: FilteredNoise (65-band FIR on noise), batch 8
  (reference synths.py:150 = frequency_filter, core.py:1628)."""
  rng = np.random.RandomState(0)
  batch = 8
  audio = tf.constant(rng.randn(batch, N_SAMPLES) * 0.1, tf.float32)
  mags = tf.constant(rng.rand(batch, N_FRAMES, N_NOISE_MAGS), tf.float32)

  @tf.function
  def fwd():
    ir = frequency_impulse_response(exp_sigmoid(mags), 257)
    return fft_convolve(audio, ir)

  _ = fwd()
  t0 = time.time()
  for _ in range(iters):
    out = fwd()
  _ = float(tf.reduce_sum(out))
  dt = (time.time() - t0) / iters
  return dict(seconds_per_step=dt,
              audio_samples_per_s=batch * N_SAMPLES / dt)


def _spectral_loss(target, audio):
  """Reference SpectralLoss: 6 fft sizes, mag + logmag L1 (losses.py:132)."""
  loss = 0.0
  for size in (2048, 1024, 512, 256, 128, 64):
    hop = int(size * 0.25)
    tmag = tf.abs(tf.signal.stft(target, size, hop, size, pad_end=True))
    amag = tf.abs(tf.signal.stft(audio, size, hop, size, pad_end=True))
    loss += tf.reduce_mean(tf.abs(tmag - amag))
    loss += tf.reduce_mean(tf.abs(
        tf.math.log(tmag + 1e-5) - tf.math.log(amag + 1e-5)))
  return loss


def _build_rnn_fc_decoder(ch=512, layers_per_stack=3, rnn_ch=512):
  """Keras replica of the reference RnnFcDecoder (decoders.py:27):
  per-input FcStack -> concat -> GRU -> concat -> FcStack -> dense heads."""
  def fc_stack():
    layers = []
    for _ in range(layers_per_stack):
      layers += [tf.keras.layers.Dense(ch),
                 tf.keras.layers.LayerNormalization(),
                 tf.keras.layers.LeakyReLU()]
    return tf.keras.Sequential(layers)

  f0_stack, ld_stack, out_stack = fc_stack(), fc_stack(), fc_stack()
  gru = tf.keras.layers.GRU(rnn_ch, return_sequences=True)
  head = tf.keras.layers.Dense(1 + N_HARMONICS + N_NOISE_MAGS)

  def call(f0_scaled, ld_scaled):
    inputs = [f0_stack(f0_scaled), ld_stack(ld_scaled)]
    x = gru(tf.concat(inputs, axis=-1))
    x = out_stack(tf.concat(inputs + [x], axis=-1))
    y = head(x)
    return (y[..., :1], y[..., 1:1 + N_HARMONICS],
            y[..., 1 + N_HARMONICS:])

  modules = [f0_stack, ld_stack, gru, out_stack, head]
  return call, modules


def bench_train_step(batch_size=4, iters=2):
  """Workload 4/5 shape: full solo_instrument train step (preprocessor ->
  RnnFcDecoder -> harmonic+noise+reverb chain -> 6-size spectral loss ->
  Adam), matching run_all.py's train_steps benchmarks."""
  rng = np.random.RandomState(0)
  n_frames = 1000  # canonical time_steps (reference gin/models/ae.gin:15)
  f0_scaled = tf.constant(rng.rand(batch_size, n_frames, 1), tf.float32)
  ld_scaled = tf.constant(rng.rand(batch_size, n_frames, 1), tf.float32)
  f0_hz = tf.constant(200 + 100 * rng.rand(batch_size, n_frames, 1),
                      tf.float32)
  target = tf.constant(rng.randn(batch_size, N_SAMPLES) * 0.1, tf.float32)
  noise = tf.constant(rng.uniform(-1, 1, (batch_size, N_SAMPLES)),
                      tf.float32)
  reverb_ir = tf.Variable(rng.randn(REVERB_LEN).astype(np.float32) * 1e-6)

  decoder, modules = _build_rnn_fc_decoder()
  # Build variables.
  decoder(f0_scaled, ld_scaled)
  variables = sum([m.trainable_variables for m in modules], []) + [reverb_ir]
  opt = tf.keras.optimizers.Adam(3e-4)

  @tf.function
  def step():
    with tf.GradientTape() as tape:
      amps, hd, noise_mags = decoder(f0_scaled, ld_scaled)
      harmonic = harmonic_synthesis(
          f0_hz, exp_sigmoid(amps), exp_sigmoid(hd))
      ir = frequency_impulse_response(exp_sigmoid(noise_mags - 5.0), 257)
      noise_sig = fft_convolve(noise, ir)
      mixed = harmonic + noise_sig
      rev_ir = tf.tile(reverb_ir[tf.newaxis, tf.newaxis, :],
                       [batch_size, 1, 1])
      out = fft_convolve(mixed, rev_ir) + mixed
      loss = _spectral_loss(target, out)
    grads = tape.gradient(loss, variables)
    opt.apply_gradients(zip(grads, variables))
    return loss

  _ = step()  # trace + compile
  t0 = time.time()
  for _ in range(iters):
    loss = step()
  _ = float(loss)
  dt = (time.time() - t0) / iters
  return dict(seconds_per_step=dt, steps_per_s=1.0 / dt,
              audio_samples_per_s=batch_size * N_SAMPLES / dt,
              batch_size=batch_size)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--iters', type=int, default=3)
  parser.add_argument('--skip_batch64', action='store_true',
                      help='Skip the slow batch-64 train-step baseline')
  args = parser.parse_args()

  tf.config.set_visible_devices([], 'GPU')
  result = {
      'description': 'reference-equivalent TF ops on CPU '
                     '(BASELINE.md workloads)',
      'hardware': 'CPU (%d threads)' % os.cpu_count(),
      'harmonic_forward_batch1': bench_harmonic_forward(args.iters),
      'filtered_noise_batch8': bench_filtered_noise(args.iters),
      'chain_fwd_grad_batch16': bench_chain(16, args.iters),
      'train_steps_batch4': bench_train_step(4, max(1, args.iters // 2)),
  }
  if not args.skip_batch64:
    result['train_steps_batch64_tpu_canonical'] = bench_train_step(64, 1)
  out_path = os.path.join(os.path.dirname(__file__),
                          'baseline_measurements.json')
  with open(out_path, 'w') as f:
    json.dump(result, f, indent=2)
  print(json.dumps(result, indent=2))


if __name__ == '__main__':
  main()
