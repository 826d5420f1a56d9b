"""Run every BASELINE.md workload on the current backend and save JSON.

Workloads (BASELINE.md, derived from BASELINE.json):
  1. Harmonic synth forward: batch 1, 4 s @ 16 kHz, 100 harmonics.
  2. FilteredNoise: 65-band frequency-sampled FIR, batch 8.
  3. ProcessorGroup chain (harmonic + noise + reverb), batch 16, fwd+grad
     - this is bench.py's headline metric.
  4. Single-sound training loop (full model + multi-scale spectral loss +
     Adam), steps/s.

Usage: python benchmarks/run_all.py [--iters 30] [--out results.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
N_SAMPLES = 64000
N_FRAMES = 250


def _time(fn, args, iters):
  import jax
  from benchmarks.timing import measure
  # Steady-state training keeps data on-device; don't measure host->device
  # transfers (which cross a network tunnel on this box). measure() also
  # repeats the trial until post-compile device contention drains (see
  # benchmarks/timing.py).
  args = jax.device_put(args)
  return measure(fn, args, iters)


def bench_harmonic_forward(iters):
  # Sub-millisecond workload: the per-window sync RTT (~25 ms) dwarfs a
  # 30-call window, so the subtracted estimate gets noisy - use long
  # windows to keep the fixed cost <5% of the window.
  iters = max(iters, 300)
  import jax, jax.numpy as jnp
  from ddsp_tpu import ops
  rng = np.random.RandomState(0)
  f0 = jnp.asarray(200 + 100 * rng.rand(1, N_FRAMES, 1).astype(np.float32))
  amps = jnp.asarray(rng.rand(1, N_FRAMES, 1).astype(np.float32))
  hd = jnp.asarray(rng.rand(1, N_FRAMES, 100).astype(np.float32))
  fn = jax.jit(lambda a, h, f: ops.harmonic_synthesis(
      f, a, harmonic_distribution=h, n_samples=N_SAMPLES))
  dt = _time(fn, (amps, hd, f0), iters)
  return {'seconds_per_step': dt, 'audio_samples_per_s': N_SAMPLES / dt}


def bench_filtered_noise(iters):
  iters = max(iters, 300)  # sub-ms workload; see bench_harmonic_forward.
  import jax, jax.numpy as jnp
  from ddsp_tpu import ops
  rng = np.random.RandomState(0)
  batch = 8
  audio = jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * .1)
  mags = jnp.asarray(rng.rand(batch, N_FRAMES, 65).astype(np.float32))
  fn = jax.jit(lambda a, m: ops.frequency_filter(
      a, ops.exp_sigmoid(m), window_size=257))
  dt = _time(fn, (audio, mags), iters)
  return {'seconds_per_step': dt,
          'audio_samples_per_s': batch * N_SAMPLES / dt}


def bench_chain_fwd_grad(iters):
  import jax, jax.numpy as jnp
  from ddsp_tpu import proc
  batch = 16
  dag = [
      (proc.Harmonic(n_samples=N_SAMPLES, sample_rate=SR, name='harmonic'),
       ['amps', 'harmonic_distribution', 'f0_hz']),
      (proc.FilteredNoise(n_samples=N_SAMPLES, window_size=257,
                          name='filtered_noise'), ['noise_magnitudes']),
      (proc.Add(name='add'), ['filtered_noise/signal', 'harmonic/signal']),
      (proc.Reverb(trainable=True, reverb_length=48000, name='reverb'),
       ['add/signal']),
  ]
  pg = proc.ProcessorGroup(dag=dag)
  rng = np.random.RandomState(0)
  inputs = {
      'amps': rng.randn(batch, N_FRAMES, 1).astype(np.float32),
      'harmonic_distribution': rng.randn(batch, N_FRAMES,
                                         100).astype(np.float32),
      # Constant 220 Hz - MUST match bench.py and tf_baseline.py exactly:
      # all three publish/compare under the 'chain_fwd_grad_batch16' key,
      # and input-dependent paths (nyquist masks) shift with f0.
      'f0_hz': (220.0 * np.ones((batch, N_FRAMES, 1))).astype(np.float32),
      'noise_magnitudes': rng.randn(batch, N_FRAMES,
                                    65).astype(np.float32),
  }
  variables = pg.init({'params': jax.random.PRNGKey(0),
                       'noise': jax.random.PRNGKey(1)}, inputs)

  def loss_fn(params, inputs):
    audio = pg.apply({'params': params}, inputs,
                     rngs={'noise': jax.random.PRNGKey(2)})
    return jax.numpy.mean(audio**2)

  # Grads w.r.t. params AND control inputs - see bench.py: params-only
  # would DCE the synth backward (reverb IR is the only parameter here)
  # and the TF baseline differentiates w.r.t. the controls too.
  fn = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
  dt = _time(fn, (variables.get('params', {}), inputs), iters)
  return {'seconds_per_step': dt,
          'audio_samples_per_s': batch * N_SAMPLES / dt}


def bench_training_steps_tpu_batch(iters):
  """The TPU-canonical training config: solo_instrument at batch 64.

  The reference trains at batch 64 on TPU
  (/root/reference/ddsp/training/gin/optimization/base_tpu.gin:4-5) with the
  solo_instrument chain; this is the per-chip number that matters for
  production training throughput.
  """
  import jax
  from ddsp_tpu import utils
  from ddsp_tpu.data import SyntheticSinusoidProvider
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer
  batch_size = 64
  model = utils.build_model('solo_instrument')
  provider = SyntheticSinusoidProvider(n_samples=N_SAMPLES, sample_rate=SR,
                                       frame_rate=250,
                                       n_examples=batch_size)
  batch = next(provider.get_batch(batch_size, shuffle=False))
  trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                            devices=jax.devices()[:1]))
  state = trainer.init(batch)
  batch = jax.device_put(batch)
  from benchmarks.timing import measure
  cell = [state]

  def step_once(batch):
    cell[0], losses = trainer.train_step(cell[0], batch)
    return losses

  dt = measure(step_once, (batch,), iters)
  return {'seconds_per_step': dt, 'steps_per_s': 1.0 / dt,
          'audio_samples_per_s': batch_size * N_SAMPLES / dt,
          'batch_size': batch_size}


def bench_training_steps(iters):
  import jax
  from ddsp_tpu import utils
  from ddsp_tpu.data import SyntheticSinusoidProvider
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer

  model = utils.build_model('solo_instrument')
  provider = SyntheticSinusoidProvider(n_samples=N_SAMPLES, sample_rate=SR,
                                       frame_rate=250, n_examples=4)
  batch = next(provider.get_batch(4, shuffle=False))
  trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                            devices=jax.devices()[:1]))
  state = trainer.init(batch)
  batch = jax.device_put(batch)
  from benchmarks.timing import measure
  cell = [state]

  def step_once(batch):
    cell[0], losses = trainer.train_step(cell[0], batch)
    return losses

  dt = measure(step_once, (batch,), iters)
  return {'seconds_per_step': dt, 'steps_per_s': 1.0 / dt,
          'batch_size': 4}


_WORKLOADS = [('harmonic_forward_batch1', bench_harmonic_forward),
              ('filtered_noise_batch8', bench_filtered_noise),
              ('chain_fwd_grad_batch16', bench_chain_fwd_grad),
              ('train_steps_batch4', bench_training_steps),
              ('train_steps_batch64_tpu_canonical',
               bench_training_steps_tpu_batch)]


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--iters', type=int, default=30)
  parser.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'results.json'))
  parser.add_argument('--only', default=None, help=argparse.SUPPRESS)
  args = parser.parse_args()

  if args.only:
    fn = dict(_WORKLOADS)[args.only]
    print('RESULT ' + json.dumps({args.only: fn(args.iters)}), flush=True)
    return

  # One fresh subprocess per workload: running them in one process was
  # measured to inflate later workloads ~15% (the chain read 5.3 ms
  # in-process vs 4.6 ms standalone in the same session - allocator/
  # autotuner state pollution), so each workload gets the clean-backend
  # timing a real job sees.
  import subprocess
  import jax
  results = {'backend': jax.default_backend(),
             'device': str(jax.devices()[0])}
  for name, _ in _WORKLOADS:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--iters',
         str(args.iters), '--only', name],
        capture_output=True, text=True, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if proc.returncode != 0:
      raise RuntimeError(f'{name} failed:\n{proc.stderr[-2000:]}')
    line = [l for l in proc.stdout.splitlines()
            if l.startswith('RESULT ')][-1]
    results.update(json.loads(line[len('RESULT '):]))
    print(name, json.dumps(results[name]), flush=True)

  with open(args.out, 'w') as f:
    json.dump(results, f, indent=2, sort_keys=True)
  print('Wrote', args.out)


if __name__ == '__main__':
  main()
