"""Benchmark: harmonic+noise+reverb chain forward+grad throughput.

The BASELINE.md config #3 workload (the north-star metric): ProcessorGroup
DAG of Harmonic(100 harmonics) + FilteredNoise(65 bins) + Add + trainable
Reverb(48000 taps), batch 16, 4 s @ 16 kHz, forward + gradients.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio_samples/s", "vs_baseline": N}
vs_baseline compares against the reference-equivalent TF implementation
measured on CPU (benchmarks/baseline_measurements.json, measured by
benchmarks/tf_baseline.py; reference publishes no numbers - see BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SR = 16000
N_SAMPLES = 64000
N_FRAMES = 250
BATCH = 16


def main():
  import threading

  # The axon TPU plugin blocks FOREVER in backend init when the device
  # tunnel is down; fail fast with a diagnosable message instead of
  # hanging the driver. (Disarmed the moment jax.devices() returns.)
  backend_ready = threading.Event()

  def _watchdog():
    if not backend_ready.wait(timeout=180):
      print('bench.py: TPU backend failed to initialize within 180 s '
            '(device tunnel down?); aborting instead of hanging.',
            file=sys.stderr, flush=True)
      os._exit(3)

  threading.Thread(target=_watchdog, daemon=True).start()

  import jax
  import jax.numpy as jnp
  from ddsp_tpu import proc

  devices = jax.devices()
  backend_ready.set()

  dag = [
      (proc.Harmonic(n_samples=N_SAMPLES, sample_rate=SR, name='harmonic'),
       ['amps', 'harmonic_distribution', 'f0_hz']),
      (proc.FilteredNoise(n_samples=N_SAMPLES, window_size=257,
                          name='filtered_noise'),
       ['noise_magnitudes']),
      (proc.Add(name='add'), ['filtered_noise/signal', 'harmonic/signal']),
      (proc.Reverb(trainable=True, reverb_length=48000, name='reverb'),
       ['add/signal']),
  ]
  pg = proc.ProcessorGroup(dag=dag)

  rng = np.random.RandomState(0)
  inputs = {
      'amps': rng.randn(BATCH, N_FRAMES, 1).astype(np.float32),
      'harmonic_distribution':
          rng.randn(BATCH, N_FRAMES, 100).astype(np.float32),
      'f0_hz': (220.0 * np.ones((BATCH, N_FRAMES, 1))).astype(np.float32),
      'noise_magnitudes':
          rng.randn(BATCH, N_FRAMES, 65).astype(np.float32),
  }
  rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
  variables = pg.init(rngs, inputs)
  params = variables.get('params', {})
  noise_key = jax.random.PRNGKey(2)

  def loss_fn(params, inputs):
    signal = pg.apply({'params': params}, inputs,
                      rngs={'noise': noise_key})
    return jnp.mean(signal**2)

  # Differentiate w.r.t. params AND the frame-rate control inputs: in this
  # chain the only parameter is the reverb IR, so params-only grads would
  # let XLA dead-code-eliminate the entire harmonic/noise backward - and
  # the TF-CPU baseline (benchmarks/tf_baseline.py) takes
  # tape.gradient(loss, [amps, hd, noise_mags, reverb_ir]). Matching
  # definitions keeps vs_baseline apples-to-apples; in a full model the
  # synth backward is live anyway (decoder params sit upstream), which the
  # train_steps benchmarks cover.
  step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))

  # Move inputs to device once (steady-state training keeps data on-device).
  params = jax.device_put(params)
  inputs = jax.device_put(inputs)

  # Timed steady state. measure_full() repeats 60-iteration windows until
  # the post-compile contention on the shared remote-compile TPU drains
  # and the running minimum stabilizes (benchmarks/timing.py) - a single
  # window right after the compile over-reports by 10-100x on this box.
  from benchmarks.timing import measure_full
  m = measure_full(step, (params, inputs), iters=60)
  dt = m.best
  samples_per_s = BATCH * N_SAMPLES / dt

  baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'benchmarks', 'baseline_measurements.json')
  vs_baseline = None
  if os.path.exists(baseline_path):
    with open(baseline_path) as f:
      baseline = json.load(f)
    ref = baseline['chain_fwd_grad_batch16']['audio_samples_per_s']
    vs_baseline = samples_per_s / ref

  # Publish the full spread, not just the point estimate: every window's
  # ms/step goes to stderr (and into the JSON line as windows_ms) so a
  # session-to-session delta can be attributed to tunnel/compile-service
  # contention (big spread, stable min) vs a real regression (min moved).
  print(f'bench.py windows (ms/step): '
        f'{[round(w * 1e3, 3) for w in m.windows]} '
        f'min={m.best * 1e3:.3f} mean={m.mean * 1e3:.3f} '
        f'spread={m.spread * 100:.1f}% '
        f'sync_rtt_subtracted={m.sync_overhead * 1e3:.1f}ms/window',
        file=sys.stderr, flush=True)
  print(json.dumps({
      'metric': 'harmonic+noise+reverb chain fwd+grad, batch 16, '
                f'4s@16kHz, on {devices[0].device_kind}',
      'value': round(samples_per_s, 1),
      'unit': 'audio_samples/s',
      'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
      'windows_ms': [round(w * 1e3, 3) for w in m.windows],
      'mean_value': round(BATCH * N_SAMPLES / m.mean, 1),
  }))


if __name__ == '__main__':
  main()
