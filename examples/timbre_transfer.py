"""Timbre transfer: play any (f0, loudness) through a trained model.

The reference's flagship demo (ddsp/colab/demos/timbre_transfer.ipynb):
extract f0/loudness features from input audio, normalize loudness with the
training-set statistics (quantile transform), optionally auto-tune the
pitch, and resynthesize with a trained checkpoint.

Usage:
  python examples/timbre_transfer.py --input in.wav --model_dir /tmp/run \
      --output out.wav [--stats stats.pkl --autotune 0.8]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--input', required=True, help='Input WAV')
  parser.add_argument('--model_dir', required=True,
                      help='Train dir (operative spec + checkpoints)')
  parser.add_argument('--output', required=True, help='Output WAV')
  parser.add_argument('--stats', default='',
                      help='Pickled dataset statistics for loudness '
                           'normalization (see '
                           'eval.postprocessing.save_dataset_statistics)')
  parser.add_argument('--autotune', type=float, default=0.0,
                      help='0..1 amount of pitch quantization')
  parser.add_argument('--octave_shift', type=int, default=0)
  parser.add_argument('--loudness_shift_db', type=float, default=0.0)
  parser.add_argument('--f0_estimator', choices=('auto', 'yin', 'crepe'),
                      default='auto',
                      help="Pitch tracker for feature extraction: 'crepe' "
                           "(needs $CREPE_WEIGHTS_DIR), 'yin' "
                           "(weights-free classical), or 'auto' (crepe "
                           "when weights exist, else yin)")
  parser.add_argument('--platform', default='')
  args = parser.parse_args(argv)

  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  import numpy as np
  from ddsp_tpu import infer, ops
  from ddsp_tpu.data.prepare import load_audio
  from ddsp_tpu.eval import postprocessing, summaries
  from ddsp_tpu.ops.core import hz_to_midi, midi_to_hz

  sr, frame_rate = 16000, 250
  audio = load_audio(args.input, sr)

  # Extract features. CREPE needs pretrained weights; the YIN fallback
  # (eval.metrics.compute_f0_yin) is weights-free, so the demo works on a
  # bare machine.
  from ddsp_tpu.eval.metrics import compute_f0_yin, crepe_weights_available
  estimator = args.f0_estimator
  if estimator == 'auto':
    estimator = 'crepe' if crepe_weights_available() else 'yin'
  if estimator == 'crepe':
    f0_hz, f0_conf = ops.compute_f0(audio, frame_rate=frame_rate)
  else:
    f0_hz, f0_conf = compute_f0_yin(audio, sample_rate=sr,
                                    frame_rate=frame_rate)
  loudness_db = np.asarray(ops.compute_loudness(
      audio[np.newaxis], sample_rate=sr, frame_rate=frame_rate))[0]
  n = min(len(f0_hz), len(loudness_db))
  f0_hz, f0_conf, loudness_db = f0_hz[:n], f0_conf[:n], loudness_db[:n]

  # Loudness normalization to the training distribution.
  if args.stats:
    stats = postprocessing.load_dataset_statistics(args.stats)
    mask_on, _ = postprocessing.detect_notes(loudness_db[None],
                                             f0_conf[None])
    if np.any(mask_on):
      _, loudness_norm = postprocessing.fit_quantile_transform(
          loudness_db[None], mask_on,
          inv_quantile=stats['quantile_transform'])
      loudness_db = loudness_norm.ravel()[:n]
    else:
      print('No note-on frames detected; skipping loudness normalization.')

  loudness_db = loudness_db + args.loudness_shift_db

  # Pitch shifting / auto-tune.
  f0_midi = np.asarray(hz_to_midi(f0_hz))
  if args.octave_shift:
    f0_midi = f0_midi + 12 * args.octave_shift
  if args.autotune > 0:
    mask_on = f0_conf > 0.5
    if mask_on.any():
      tuning = postprocessing.get_tuning_factor(f0_midi, f0_conf, mask_on)
      f0_midi = postprocessing.auto_tune(f0_midi, tuning, mask_on,
                                         amount=args.autotune)
  f0_hz = np.asarray(midi_to_hz(f0_midi))

  # Resynthesize.
  length_seconds = n / frame_rate
  model = infer.AutoencoderInference(args.model_dir,
                                     length_seconds=length_seconds)
  n_frames = model.n_frames
  features = {
      'f0_hz': f0_hz[:n_frames].astype(np.float32),
      'loudness_db': loudness_db[:n_frames].astype(np.float32),
  }
  audio_out = np.asarray(model.get_audio(features))[0]
  summaries.write_wav(args.output, audio_out, sr)
  print(f'Wrote {args.output} ({len(audio_out)/sr:.2f}s)')
  return float(np.sqrt(np.mean(audio_out**2)))


if __name__ == '__main__':
  main()
