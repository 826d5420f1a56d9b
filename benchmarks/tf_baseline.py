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


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--iters', type=int, default=3)
  args = parser.parse_args()

  tf.config.set_visible_devices([], 'GPU')
  result = {
      'description': 'reference-equivalent TF ops on CPU, '
                     'harmonic+noise+reverb chain fwd+grad',
      'hardware': 'CPU (%d threads)' % os.cpu_count(),
      'chain_fwd_grad_batch16': bench_chain(16, args.iters),
  }
  out_path = os.path.join(os.path.dirname(__file__),
                          'baseline_measurements.json')
  with open(out_path, 'w') as f:
    json.dump(result, f, indent=2)
  print(json.dumps(result, indent=2))


if __name__ == '__main__':
  main()
