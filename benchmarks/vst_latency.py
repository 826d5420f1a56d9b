"""VST streaming per-hop latency: the real-time serve-path benchmark.

The reference's serve story is a real-time audio plugin running at a 50 Hz
hop (320 samples @ 16 kHz = a 20 ms deadline per hop; reference
inference.py:444-478, gin/models/vst/vst.gin). This measures the full
per-hop pipeline - extract features -> predict controls (GRU 512,
explicit state) -> synthesize one hop with phase carry - at the canonical
VST model size on CPU (where a plugin would run), reporting p50/p95/p99
wall latency per stage and end-to-end against the 20 ms budget.

Feature extraction runs without CREPE (no pretrained pitch weights ship in
this environment; the reference plugin also supports sigmoid/heuristic f0
sources). Results land in benchmarks/vst_latency.json.

Usage: [JAX_PLATFORMS=cpu] python benchmarks/vst_latency.py [--hops 300]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--hops', type=int, default=300)
  parser.add_argument('--platform', default='cpu',
                      help="jax platform to serve from (default 'cpu': "
                           'a VST plugin runs on the host)')
  parser.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'vst_latency.json'))
  args = parser.parse_args()

  import jax
  if args.platform:
    jax.config.update('jax_platforms', args.platform)

  from ddsp_tpu import infer, utils
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer

  # Canonical VST model size (reference gin/models/vst/vst.gin): 50 Hz
  # frames, 1024-sample analysis window, GRU 512, 60 harmonics, 65 noise
  # bands. Reverb is an offline render effect, not part of the per-hop
  # loop (the reference exports it as a separate IR for the plugin host).
  kw = dict(sample_rate=16000, frame_rate=50, frame_size=1024,
            n_harmonics=60, n_noise_magnitudes=65, rnn_channels=512,
            ch=256, layers_per_stack=1, seconds=1.0, reverb=False)
  save_dir = tempfile.mkdtemp(prefix='vst_latency_')
  model = utils.build_model('vst', **kw)
  utils.save_spec(save_dir, 'vst', **kw)

  from ddsp_tpu.data import SyntheticSinusoidProvider
  # Training audio is seconds*sr; the synth renders one extra (center-pad)
  # hop internally and crops it, so audio_synth matches this length. The
  # preset takes f0 from the data at the centered frame count.
  n_samples = int(kw['seconds'] * kw['sample_rate'])
  hop = kw['sample_rate'] // kw['frame_rate']
  n_frames = n_samples // hop + 1
  provider = SyntheticSinusoidProvider(
      n_samples=n_samples, sample_rate=16000, frame_rate=50, n_examples=1)
  batch = next(provider.get_batch(1, shuffle=False))
  batch['f0_hz'] = np.full((1, n_frames), 220.0, np.float32)
  batch['f0_confidence'] = np.ones((1, n_frames), np.float32)
  trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                            devices=jax.devices()[:1]))
  state = trainer.init(batch)
  trainer.save(state, save_dir)

  extract = infer.VSTExtractFeatures(save_dir, compute_f0=False)
  predict = infer.VSTStatelessPredictControls(save_dir)
  synth = infer.VSTSynthesize(save_dir)

  hop = synth.hop_size
  frame_size = extract.frame_size
  budget_ms = 1000.0 * hop / synth.sample_rate

  rng = np.random.RandomState(0)
  sr = synth.sample_rate
  t = np.arange(frame_size + args.hops * hop) / sr
  stream = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)

  rnn_state = predict.initial_state()
  phase = synth.initial_phase()
  amps = np.zeros(1, np.float32)
  hd = np.zeros(kw['n_harmonics'], np.float32)
  noise = np.zeros(kw['n_noise_magnitudes'], np.float32)

  t_extract, t_predict, t_synth, t_total = [], [], [], []
  # Warmup hops (jit compilation + cache) excluded from percentiles; keep
  # at least one measured hop for small --hops values.
  warmup = min(20, max(0, args.hops - 1))
  for i in range(args.hops):
    frame = stream[i * hop:i * hop + frame_size]

    t0 = time.perf_counter()
    f0_hz, f0_scaled, pw_db, pw_scaled = extract(frame)
    np.asarray(f0_scaled)
    t1 = time.perf_counter()
    prev = (amps, hd, noise)
    amps, hd, noise, rnn_state = predict(f0_scaled, pw_scaled, rnn_state)
    np.asarray(amps)
    t2 = time.perf_counter()
    f0_prev = f0_cur if i else np.asarray(f0_hz).reshape(1)
    f0_cur = np.asarray(f0_hz).reshape(1)
    audio, phase = synth(np.asarray(amps).reshape(1), prev[0].reshape(1),
                         hd, prev[1], f0_cur, f0_prev, noise, phase)
    np.asarray(audio)
    t3 = time.perf_counter()

    amps, hd, noise = (np.asarray(amps), np.asarray(hd), np.asarray(noise))
    if i >= warmup:  # skip jit warmup hops
      t_extract.append(t1 - t0)
      t_predict.append(t2 - t1)
      t_synth.append(t3 - t2)
      t_total.append(t3 - t0)

  def pct(xs):
    xs = 1000.0 * np.asarray(xs)
    return {'p50_ms': round(float(np.percentile(xs, 50)), 3),
            'p95_ms': round(float(np.percentile(xs, 95)), 3),
            'p99_ms': round(float(np.percentile(xs, 99)), 3)}

  result = {
      'platform': jax.default_backend(),
      'hop_size': hop,
      'budget_ms': budget_ms,
      'hops_measured': len(t_total),
      'extract': pct(t_extract),
      'predict': pct(t_predict),
      'synthesize': pct(t_synth),
      'total': pct(t_total),
      'meets_budget_p99': bool(
          1000.0 * np.percentile(t_total, 99) < budget_ms),
  }
  with open(args.out, 'w') as f:
    json.dump(result, f, indent=2)
  print(json.dumps(result, indent=2))


if __name__ == '__main__':
  main()
