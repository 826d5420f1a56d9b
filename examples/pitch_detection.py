"""Self-supervised pitch detection with the InverseSynthesis model.

The reference's pitch-detection demo
(reference: ddsp/colab/demos/pitch_detection.ipynb, model from the ICML
2020 self-supervised paper): train InverseSynthesis on synthetic
harmonic notes (audio rendered on the fly from random control
trajectories - the network never sees a pitch label directly, the
consistency losses tie its decomposition to the generating controls),
then read the model's predicted f0 back and compare to the known
generating f0.

Usage:
  python examples/pitch_detection.py --steps 200 --save_dir /tmp/pitch
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--steps', type=int, default=200)
  parser.add_argument('--save_dir', default='/tmp/ddsp_tpu_pitch')
  parser.add_argument('--batch_size', type=int, default=4)
  parser.add_argument('--platform', default='')
  parser.add_argument('--n_samples', type=int, default=16128,
                      help='Multiple of the logmel hop (256) so controls '
                           'and encoder frames line up.')
  parser.add_argument('--n_sinusoids', type=int, default=32)
  parser.add_argument('--n_harmonics', type=int, default=32)
  args = parser.parse_args(argv)

  logging.basicConfig(level=logging.INFO)
  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  import jax
  import numpy as np
  from ddsp_tpu import utils
  from ddsp_tpu.data import SyntheticNotesProvider
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer, train
  from ddsp_tpu.ops.core import hz_to_midi

  # The ResnetSinusoidalEncoder frames audio at a 256-sample hop
  # (pad_end), so the control trajectories must use the matching count.
  n_timesteps = -(-args.n_samples // 256)

  # Self-supervised training data: random harmonic control trajectories;
  # the model renders them to audio in-graph (no pitch labels consumed).
  provider = SyntheticNotesProvider(
      n_timesteps=n_timesteps, n_harmonics=args.n_harmonics, n_mags=65,
      sample_rate=16000, n_examples=max(64, 2 * args.batch_size))

  kwargs = dict(n_samples=args.n_samples, n_sinusoids=args.n_sinusoids,
                n_harmonics=args.n_harmonics)
  model = utils.build_model('inverse_synthesis', **kwargs)
  utils.save_spec(args.save_dir, 'inverse_synthesis', **kwargs)

  trainer = Trainer(model,
                    mesh=create_mesh(n_data=1, devices=jax.devices()[:1]))
  iterator = provider.get_batch(args.batch_size, shuffle=True, repeats=-1)
  train(iterator, trainer, num_steps=args.steps,
        steps_per_summary=max(10, args.steps // 10),
        steps_per_save=args.steps, save_dir=args.save_dir,
        restore_dir=args.save_dir)

  # Evaluate: predict f0 on fresh labeled notes and report the error.
  batch = next(provider.get_batch(args.batch_size, shuffle=False))
  state = trainer.restore(trainer.init(batch), args.save_dir)
  outputs, _ = jax.jit(
      lambda params, b: model.apply(
          {'params': params}, b, training=False, return_losses=True,
          rngs={'noise': jax.random.PRNGKey(0)}))(state.params, batch)
  f0_pred = np.asarray(outputs['f0_hz'])[..., 0]
  f0_true = np.asarray(batch['f0_hz'])
  if f0_true.ndim == 3:
    f0_true = f0_true[..., 0]
  midi_err = np.abs(np.asarray(hz_to_midi(f0_pred)) -
                    np.asarray(hz_to_midi(f0_true)))
  print(f'median |f0 error|: {np.median(midi_err):.2f} semitones '
        f'({args.steps} steps; accuracy improves with more training)')
  return float(np.median(midi_err))


if __name__ == '__main__':
  main()
