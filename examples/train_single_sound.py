"""Overfit the solo-instrument model on a single sound (tutorial workload).

The reference's tutorial-3 "train an autoencoder on one sound" demo
(reference: ddsp/colab/tutorials/3_training.ipynb): synthesize a 4-second
target, train the harmonic+noise(+reverb) autoencoder to reconstruct it,
and write audio samples along the way.

Usage:
  python examples/train_single_sound.py --steps 300 --save_dir /tmp/single
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--steps', type=int, default=300)
  parser.add_argument('--save_dir', default='/tmp/ddsp_tpu_single_sound')
  parser.add_argument('--seconds', type=float, default=1.0)
  parser.add_argument('--platform', default='')
  args = parser.parse_args(argv)

  logging.basicConfig(level=logging.INFO)
  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  import jax
  import numpy as np
  from ddsp_tpu import utils
  from ddsp_tpu.data import ArrayDataProvider
  from ddsp_tpu.eval import summaries
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer, train

  sr = 16000
  frame_rate = 250
  hop = sr // frame_rate
  # Whole number of frames (n_samples must divide evenly for synthesis).
  n_frames = max(1, int(round(args.seconds * frame_rate)))
  n_samples = n_frames * hop

  # One synthetic "recording": vibrato sine with decaying loudness.
  t = np.arange(n_samples) / sr
  f0 = 220.0 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t))
  phase = 2 * np.pi * np.cumsum(f0) / sr
  env = np.exp(-t * 0.8)
  audio = 0.7 * env * np.sin(phase)
  # A realistic noise floor (~-50 dB) matters: the logmag spectral loss is
  # pathological on numerically-pristine targets (in the reference's TF
  # formulation too) because silent bins dominate the log distance.
  audio = (audio + 3e-3 * np.random.RandomState(0).randn(n_samples)
           ).astype(np.float32)
  frame_idx = (np.arange(n_frames) * (n_samples / n_frames)).astype(int)
  example = {
      'audio': audio,
      'f0_hz': f0[frame_idx].astype(np.float32),
      'f0_confidence': np.ones(n_frames, np.float32),
      'loudness_db': (20 * np.log10(np.maximum(env[frame_idx], 1e-5))
                      ).astype(np.float32),
  }
  provider = ArrayDataProvider([example], sample_rate=sr,
                               frame_rate=frame_rate)

  kw = dict(n_samples=n_samples, time_steps=n_frames, n_harmonics=60,
            n_noise_magnitudes=65, reverb_length=min(n_samples, 16000),
            rnn_channels=128, ch=128)
  model = utils.build_model('solo_instrument', **kw)
  utils.save_spec(args.save_dir, 'solo_instrument', **kw)

  mesh = create_mesh(n_data=1, devices=jax.devices()[:1])
  trainer = Trainer(model, mesh=mesh, learning_rate=1e-3)
  iterator = provider.get_batch(1, shuffle=False, repeats=-1)
  state = train(iterator, trainer, num_steps=args.steps,
                steps_per_summary=50, steps_per_save=args.steps,
                save_dir=args.save_dir)

  # Resynthesize and write a sample.
  batch = next(provider.get_batch(1, shuffle=False))
  outputs = model.apply({'params': jax.device_get(state.params)}, batch,
                        training=False,
                        rngs={'noise': jax.random.PRNGKey(0)})
  audio_synth = np.asarray(outputs['audio_synth'])
  summaries.sample_batch(args.save_dir, int(state.step), batch,
                         audio_synth, sr)
  print(f'Done. Samples in {args.save_dir}/samples/')
  return float(np.sqrt(np.mean(audio_synth**2)))


if __name__ == '__main__':
  main()
