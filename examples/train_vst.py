"""Train the streaming (VST) model and run it hop-by-hop.

The reference's Train_VST demo (reference: ddsp/colab/demos/Train_VST.ipynb
+ inference.py VST* modules): train the vst preset (online power features,
GRU decoder, harmonic + filtered-noise synthesis), then stream audio
through the per-hop VST pipeline - extract features -> predict controls
with explicit GRU state -> synthesize one hop with phase carry - exactly
what a real-time plugin host would call.

Usage:
  python examples/train_vst.py --steps 200 --save_dir /tmp/vst_run
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--steps', type=int, default=200)
  parser.add_argument('--save_dir', default='/tmp/ddsp_tpu_vst')
  parser.add_argument('--batch_size', type=int, default=2)
  parser.add_argument('--platform', default='')
  parser.add_argument('--seconds', type=float, default=1.0)
  parser.add_argument('--frame_rate', type=int, default=50)
  parser.add_argument('--n_harmonics', type=int, default=20)
  parser.add_argument('--n_noise_magnitudes', type=int, default=20)
  parser.add_argument('--rnn_channels', type=int, default=64)
  parser.add_argument('--stream_hops', type=int, default=25)
  args = parser.parse_args(argv)

  logging.basicConfig(level=logging.INFO)
  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  import jax
  import numpy as np
  from ddsp_tpu import infer, utils
  from ddsp_tpu.data import SyntheticSinusoidProvider
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer, train

  sr = 16000
  hop = sr // args.frame_rate
  n_samples = int(args.seconds * sr)
  n_frames = n_samples // hop + 1  # center framing

  kwargs = dict(seconds=args.seconds, frame_rate=args.frame_rate,
                n_harmonics=args.n_harmonics,
                n_noise_magnitudes=args.n_noise_magnitudes,
                rnn_channels=args.rnn_channels, ch=args.rnn_channels,
                reverb=False, stateless=False)
  model = utils.build_model('vst', **kwargs)
  utils.save_spec(args.save_dir, 'vst', **kwargs)

  # Training data: synthetic sinusoid notes; the vst preset computes power
  # online and takes f0 from the data at the centered frame count.
  provider = SyntheticSinusoidProvider(
      n_samples=n_samples, sample_rate=sr, frame_rate=args.frame_rate,
      n_examples=max(16, 2 * args.batch_size))

  def with_f0(iterator):
    for batch in iterator:
      batch = dict(batch)
      b = batch['audio'].shape[0]
      if batch['f0_hz'].shape[1] != n_frames:
        batch['f0_hz'] = np.full((b, n_frames),
                                 batch['f0_hz'].mean(), np.float32)
        batch['f0_confidence'] = np.ones((b, n_frames), np.float32)
      yield batch

  trainer = Trainer(model,
                    mesh=create_mesh(n_data=1, devices=jax.devices()[:1]))
  train(with_f0(provider.get_batch(args.batch_size, shuffle=True,
                                   repeats=-1)),
        trainer, num_steps=args.steps,
        steps_per_summary=max(10, args.steps // 10),
        steps_per_save=args.steps, save_dir=args.save_dir,
        restore_dir=args.save_dir)

  # Stream: the per-hop plugin pipeline with explicit carries.
  extract = infer.VSTExtractFeatures(args.save_dir, compute_f0=False)
  predict = infer.VSTStatelessPredictControls(args.save_dir)
  synth = infer.VSTSynthesize(args.save_dir)

  frame_size = extract.frame_size
  t = np.arange(frame_size + args.stream_hops * hop) / sr
  stream = (0.5 * np.sin(2 * np.pi * 330.0 * t)).astype(np.float32)

  state = predict.initial_state()
  phase = synth.initial_phase()
  amps = np.zeros(1, np.float32)
  hd = np.zeros(args.n_harmonics, np.float32)
  noise = np.zeros(args.n_noise_magnitudes, np.float32)
  f0_prev = np.full(1, 330.0, np.float32)
  out = []
  for i in range(args.stream_hops):
    frame = stream[i * hop:i * hop + frame_size]
    f0_hz, f0_scaled, pw_db, pw_scaled = extract(frame)
    prev = (amps, hd, noise)
    amps, hd, noise, state = predict(f0_scaled, pw_scaled, state)
    f0_cur = np.asarray(f0_hz).reshape(1)
    audio, phase = synth(np.asarray(amps).reshape(1), prev[0].reshape(1),
                         hd, prev[1], f0_cur, f0_prev, noise, phase)
    f0_prev = f0_cur
    amps, hd, noise = (np.asarray(amps), np.asarray(hd), np.asarray(noise))
    out.append(np.asarray(audio))

  audio = np.concatenate(out)
  assert audio.shape == (args.stream_hops * hop,)
  assert np.all(np.isfinite(audio))
  rms = float(np.sqrt((audio**2).mean()))
  print(f'streamed {args.stream_hops} hops ({len(audio)} samples), '
        f'rms {rms:.4f}')
  return rms


if __name__ == '__main__':
  main()
