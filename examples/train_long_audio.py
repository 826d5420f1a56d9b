"""Sequence-parallel training on audio longer than one chip's memory.

Demonstrates the Mesh(('data', 'time')) training step
(ddsp_tpu.parallel.make_sp_train_step): the decoder runs on frame-rate
controls while synthesis, filtering, and the multi-scale spectral loss stay
sharded along the audio time axis - per-chip memory is
O(n_samples / n_time_shards), so minutes-long audio trains on chips that
could never hold the [batch, n_samples, n_harmonics] intermediates.

On a dev box this runs on simulated CPU devices (mechanism demo); on a TPU
slice, point it at real devices.

Usage:
  python examples/train_long_audio.py --seconds 30 --time_shards 4
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--seconds', type=float, default=8.0)
  parser.add_argument('--time_shards', type=int, default=4)
  parser.add_argument('--data_shards', type=int, default=1)
  parser.add_argument('--steps', type=int, default=50)
  # On a real TPU slice pass --no-simulate_cpu to use the actual devices.
  parser.add_argument('--simulate_cpu', default=True,
                      action=argparse.BooleanOptionalAction)
  args = parser.parse_args(argv)

  n_devices = args.time_shards * args.data_shards
  if args.simulate_cpu:
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
      os.environ['XLA_FLAGS'] = (
          flags +
          f' --xla_force_host_platform_device_count={n_devices}').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

  import jax
  if args.simulate_cpu:
    jax.config.update('jax_platforms', 'cpu')
  import numpy as np
  import optax
  from ddsp_tpu import nn as dnn
  from ddsp_tpu.parallel import create_mesh, make_sp_train_step

  logging.basicConfig(level=logging.INFO)
  sr, frame_rate = 16000, 250
  hop = sr // frame_rate
  n_frames = int(args.seconds * frame_rate)
  n_samples = n_frames * hop
  if n_samples % args.time_shards:
    raise ValueError('n_samples must divide over time shards')

  mesh = create_mesh(n_data=args.data_shards, n_time=args.time_shards,
                     devices=jax.devices()[:n_devices])
  print(f'{args.seconds:.0f}s audio ({n_samples} samples) over mesh '
        f'{mesh.shape}; {n_samples // args.time_shards} samples/chip')

  # Target: long vibrato tone with a slow loudness arc + noise floor.
  rng = np.random.RandomState(0)
  t = np.arange(n_samples) / sr
  f0 = 220.0 * (1 + 0.005 * np.sin(2 * np.pi * 5 * t))
  phase = 2 * np.pi * np.cumsum(f0) / sr
  env = 0.5 + 0.4 * np.sin(2 * np.pi * t / args.seconds)
  target = (0.4 * env * np.sin(phase) +
            3e-3 * rng.randn(n_samples)).astype(np.float32)
  fi = (np.arange(n_frames) * hop).astype(int)
  b = args.data_shards
  batch = {
      'audio': np.stack([target] * b),
      'f0_hz': np.tile(f0[fi].astype(np.float32)[None, :, None], (b, 1, 1)),
      'ld_scaled': np.tile(env[fi].astype(np.float32)[None, :, None],
                           (b, 1, 1)),
      'f0_scaled': np.full((b, n_frames, 1), 0.55, np.float32),
  }
  noise = rng.uniform(-1, 1, (b, n_samples)).astype(np.float32)

  decoder = dnn.FcStackDecoder(
      ch=64, layers_per_stack=2,
      input_keys=('ld_scaled', 'f0_scaled'),
      output_splits=(('amps', 1), ('harmonic_distribution', 40),
                     ('noise_magnitudes', 33)))
  params = decoder.init(jax.random.PRNGKey(0), batch)['params']
  optimizer = optax.adam(1e-3)
  opt_state = optimizer.init(params)

  train_step, shard_batch = make_sp_train_step(
      mesh, decoder, optimizer, n_samples=n_samples,
      fft_sizes=(2048, 512, 128))
  sharded, noise_dev = shard_batch(batch, noise)

  for step in range(1, args.steps + 1):
    params, opt_state, loss = train_step(params, opt_state, sharded,
                                         noise_dev)
    if step % 10 == 0 or step == 1:
      print(f'step {step:4d} loss {float(loss):8.4f}')
  print('Done.')
  return float(loss)


if __name__ == '__main__':
  main()
