"""Data-parallel scaling-efficiency benchmark (BASELINE.md workload 5).

Measures full-model train-step throughput over meshes of 1..N devices with
a fixed per-chip batch (weak scaling), reporting samples/s/chip and the
scaling efficiency vs 1 chip. On a TPU slice this is the ">=80% efficiency
1 chip -> N" north-star metric; on this dev box it runs on simulated CPU
devices (mechanism check, not absolute numbers).

Usage:
  python benchmarks/scaling.py [--devices 8] [--per_chip_batch 4] \
      [--preset tiny] [--simulate_cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--devices', type=int, default=0,
                      help='Max devices (0 = all available)')
  parser.add_argument('--per_chip_batch', type=int, default=4)
  parser.add_argument('--iters', type=int, default=10)
  parser.add_argument('--preset', default='tiny')
  parser.add_argument('--model_kwargs', default='{}')
  parser.add_argument('--simulate_cpu', action='store_true',
                      help='Force N virtual CPU devices (mechanism check)')
  parser.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'scaling_results.json'))
  args = parser.parse_args()

  if args.simulate_cpu:
    n = args.devices or 8
    flags = os.environ.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
      os.environ['XLA_FLAGS'] = (
          flags + f' --xla_force_host_platform_device_count={n}').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    jax.config.update('jax_platforms', 'cpu')

  import jax
  from ddsp_tpu import utils
  from ddsp_tpu.data import SyntheticSinusoidProvider
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer

  devices = jax.devices()
  max_devices = min(args.devices or len(devices), len(devices))
  model_kwargs = json.loads(args.model_kwargs)
  model = utils.build_model(args.preset, **model_kwargs)
  n_samples = model_kwargs.get('n_samples', 16000
                               if args.preset == 'tiny' else 64000)

  counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= max_devices]
  results = {'backend': jax.default_backend(),
             'per_chip_batch': args.per_chip_batch, 'runs': {}}
  base_per_chip = None
  for n in counts:
    batch_size = args.per_chip_batch * n
    provider = SyntheticSinusoidProvider(
        n_samples=n_samples, frame_rate=250, n_examples=batch_size)
    batch = next(provider.get_batch(batch_size, shuffle=False))
    mesh = create_mesh(n_data=n, devices=devices[:n])
    trainer = Trainer(model, mesh=mesh)
    state = trainer.init(batch)
    # Shard over the mesh up front: a bare device_put would commit the
    # whole batch to device 0 and every timed step would pay the
    # redistribution, biasing multi-device numbers.
    from ddsp_tpu.parallel.mesh import shard_batch  # pylint: disable=g-import-not-at-top
    batch = shard_batch(batch, mesh)

    state, losses = trainer.train_step(state, batch)
    np.asarray(jax.tree_util.tree_leaves(losses)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(args.iters):
      state, losses = trainer.train_step(state, batch)
    np.asarray(jax.tree_util.tree_leaves(losses)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / args.iters

    samples_per_s = batch_size * n_samples / dt
    per_chip = samples_per_s / n
    if base_per_chip is None:
      base_per_chip = per_chip
    efficiency = per_chip / base_per_chip
    results['runs'][str(n)] = {
        'seconds_per_step': dt,
        'audio_samples_per_s': samples_per_s,
        'samples_per_s_per_chip': per_chip,
        'scaling_efficiency': efficiency,
    }
    print(f'{n:3d} devices: {dt*1e3:8.2f} ms/step, '
          f'{per_chip/1e6:8.2f}M samples/s/chip, '
          f'efficiency {efficiency:.2%}')

  with open(args.out, 'w') as f:
    json.dump(results, f, indent=2, sort_keys=True)
  print('Wrote', args.out)


if __name__ == '__main__':
  main()
