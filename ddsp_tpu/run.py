"""Command-line entry point: train / eval / sample.

Reference behavior: /root/reference/ddsp/training/ddsp_run.py (flags:80-115,
parse_gin:128, main:173). Flags select run topology; the model architecture
comes from a preset name + JSON overrides (the config system playing gin's
role), written to save_dir as the operative spec and re-read on eval/resume.

Usage:
  python -m ddsp_tpu.run --mode=train --preset=solo_instrument \
      --save_dir=/tmp/run --data=synthetic --num_steps=1000
  python -m ddsp_tpu.run --mode=eval --save_dir=/tmp/run --data=synthetic
  python -m ddsp_tpu.run --mode=sample --save_dir=/tmp/run --data=synthetic
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys


def build_data_provider(spec: str, n_samples: int, sample_rate: int,
                        frame_rate: int, model_kwargs=None):
  """Data spec -> DataProvider.

  Specs: 'synthetic[:n]' (sinusoids), 'tfrecord:<pattern>',
  'synthetic_notes[:pattern]' (self-supervised controls, generated on the
  fly when no pattern given), 'urmp:<dir>[:instrument]' (MIDI-annotated).
  """
  from ddsp_tpu import data as data_lib
  model_kwargs = model_kwargs or {}
  kind, _, arg = spec.partition(':')
  if kind == 'synthetic':
    n_examples = int(arg) if arg else 64
    return data_lib.SyntheticSinusoidProvider(
        n_samples=n_samples, sample_rate=sample_rate, frame_rate=frame_rate,
        n_examples=n_examples)
  elif kind == 'tfrecord':
    return data_lib.TFRecordProvider(
        arg, example_secs=n_samples / sample_rate,
        sample_rate=sample_rate, frame_rate=frame_rate)
  elif kind == 'synthetic_notes':
    return data_lib.SyntheticNotesProvider(
        n_timesteps=model_kwargs.get('time_steps', 125),
        n_harmonics=model_kwargs.get('n_harmonics',
                                     model_kwargs.get('n_sinusoids', 100)),
        n_mags=model_kwargs.get('n_noise_magnitudes', 65),
        file_pattern=arg or None,
        sample_rate=sample_rate)
  elif kind == 'urmp':
    base_dir, _, instrument = arg.partition(':')
    return data_lib.UrmpMidi(base_dir,
                             instrument_key=instrument or 'all',
                             sample_rate=sample_rate,
                             frame_rate=frame_rate)
  elif kind == 'nsynth':
    # 'nsynth[:split[:data_dir]]' - the ICLR2020 NSynth experiment feed.
    split, _, data_dir = arg.partition(':')
    kwargs = dict(split=split or 'train',
                  sample_rate=sample_rate, frame_rate=frame_rate)
    if data_dir:
      kwargs['data_dir'] = data_dir
    return data_lib.NSynthTfds(**kwargs)
  elif kind == 'tfds':
    # 'tfds:<name>[:<version>]:<split>[:data_dir]' - any TFDS dataset with
    # the canonical audio/f0_hz/f0_confidence/loudness_db features. A
    # version-like segment (e.g. '2.3.0') after the name is folded back
    # into the TFDS name, so versioned names like
    # 'nsynth/gansynth_subset.f0_and_loudness:2.3.0' parse correctly.
    name, _, rest = arg.partition(':')
    head, _, tail = rest.partition(':')
    if re.fullmatch(r'\d+(\.\d+)*', head or ''):
      name, rest = f'{name}:{head}', tail
      head, _, tail = rest.partition(':')
    # Everything after the split is the data_dir verbatim - it may itself
    # contain colons (gs://bucket/path).
    split, data_dir = head, tail
    return data_lib.TfdsProvider(name, split or 'train',
                                 data_dir=data_dir or None,
                                 sample_rate=sample_rate,
                                 frame_rate=frame_rate)
  else:
    raise ValueError(
        f'Unknown data spec {spec!r} '
        "(use 'synthetic[:n]', 'tfrecord:<pattern>', "
        "'synthetic_notes[:pattern]', 'urmp:<dir>[:inst]', "
        "'nsynth[:split[:data_dir]]', or 'tfds:<name>:<split>')")


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--mode', default='train',
                      choices=['train', 'eval', 'sample'])
  parser.add_argument('--preset', default='solo_instrument',
                      help='Model preset name (see ddsp_tpu.utils.list_presets)')
  parser.add_argument('--model_kwargs', default='{}',
                      help='JSON kwargs overriding the preset')
  parser.add_argument('--save_dir', required=True)
  parser.add_argument('--restore_dir', default='',
                      help='Defaults to save_dir')
  parser.add_argument('--data', default='synthetic',
                      help="'synthetic[:n]' or 'tfrecord:<glob>'")
  parser.add_argument('--batch_size', type=int, default=32)
  parser.add_argument('--num_steps', type=int, default=1000000)
  parser.add_argument('--steps_per_summary', type=int, default=300)
  parser.add_argument('--steps_per_save', type=int, default=300)
  parser.add_argument('--learning_rate', type=float, default=3e-4)
  parser.add_argument('--early_stop_loss_value', type=float, default=None)
  parser.add_argument('--sample_rate', type=int, default=16000)
  parser.add_argument('--frame_rate', type=int, default=250)
  parser.add_argument('--num_eval_batches', type=int, default=4)
  parser.add_argument('--run_once', action='store_true')
  parser.add_argument('--platform', default='',
                      help="Force a jax platform (e.g. 'cpu')")
  parser.add_argument('--profile_dir', default='',
                      help='Capture a jax.profiler trace to this directory')
  parser.add_argument('--multihost', action='store_true',
                      help='Initialize jax.distributed for multi-host TPU '
                           'pods (coordinator/worker config from the TPU '
                           'environment)')
  parser.add_argument('--n_devices', type=int, default=0,
                      help='Limit device count (0 = all)')
  parser.add_argument('--time_shards', type=int, default=1,
                      help='Shard the audio time axis over this many '
                           'devices (sequence parallelism); the mesh '
                           'becomes (data=n_devices/time_shards, '
                           'time=time_shards) and the train step routes '
                           'synthesis/filtering/loss through the '
                           'halo-exchanging shard_map kernels')
  parser.add_argument('--halo_impl', choices=('xla', 'pallas'),
                      default='xla',
                      help="Neighbor-exchange implementation for the "
                           "time-sharded kernels: 'xla' (ppermute "
                           "collectives, default) or 'pallas' (in-kernel "
                           "chip-to-chip RDMA over ICI; needs a real "
                           "multi-chip TPU slice - on CPU meshes it "
                           "falls back to interpret mode / ppermute)")
  args = parser.parse_args(argv)

  logging.basicConfig(
      level=logging.INFO,
      format='%(asctime)s %(name)s %(levelname)s: %(message)s')

  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  import jax
  if args.multihost:
    # Multi-host data parallelism: one process per host; the mesh spans all
    # hosts (ICI within slice, DCN across); each host feeds its local shard
    # of the batch (reference MultiWorkerMirroredStrategy, train_util.py:63).
    jax.distributed.initialize()
  from ddsp_tpu import utils
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer, train

  model_kwargs = json.loads(args.model_kwargs)

  if args.mode == 'train':
    preset_name = args.preset
    model = utils.build_model(args.preset, **model_kwargs)
    utils.save_spec(args.save_dir, args.preset, **model_kwargs)
  else:
    # Reconstruct the exact trained architecture from the operative spec —
    # including its preset name, so eval/sample geometry below follows the
    # TRAINED preset's defaults, not the CLI's --preset default.
    model = utils.model_from_spec(args.restore_dir or args.save_dir,
                                  **model_kwargs)
    spec = utils.load_spec(args.restore_dir or args.save_dir)
    preset_name = spec['preset']
    model_kwargs = dict(spec['kwargs'], **model_kwargs)

  # Resolve provider geometry from the preset's own defaults merged with
  # overrides (a preset like 'tiny' has n_samples=16000; 'vst' specifies
  # seconds and frame_rate) so the dataset matches the model out of the box.
  import inspect
  preset_fn = utils.get_preset(preset_name)
  preset_defaults = {
      k: p.default for k, p in inspect.signature(preset_fn).parameters.items()
      if p.default is not inspect.Parameter.empty}
  resolved = dict(preset_defaults, **model_kwargs)
  sample_rate = resolved.get('sample_rate', args.sample_rate)
  frame_rate = resolved.get('frame_rate', args.frame_rate)
  if 'n_samples' in resolved:
    n_samples = resolved['n_samples']
  elif 'seconds' in resolved:
    n_samples = int(resolved['seconds'] * sample_rate)
  else:
    n_samples = 64000
  provider = build_data_provider(args.data, n_samples, sample_rate,
                                 frame_rate, resolved)

  devices = jax.devices()
  if args.n_devices:
    devices = devices[:args.n_devices]
  if len(devices) % args.time_shards:
    raise SystemExit(f'--time_shards {args.time_shards} must divide the '
                     f'device count ({len(devices)})')
  mesh = create_mesh(n_data=len(devices) // args.time_shards,
                     n_time=args.time_shards, devices=devices)
  trainer = Trainer(model, mesh=mesh, learning_rate=args.learning_rate,
                    halo_impl=args.halo_impl)

  if args.mode == 'train':
    iterator = provider.get_batch(args.batch_size, shuffle=True, repeats=-1)
    train(iterator, trainer,
          num_steps=args.num_steps,
          steps_per_summary=args.steps_per_summary,
          steps_per_save=args.steps_per_save,
          save_dir=args.save_dir,
          restore_dir=args.restore_dir or args.save_dir,
          early_stop_loss_value=args.early_stop_loss_value,
          profile_dir=args.profile_dir or None)
  else:
    from ddsp_tpu.eval import eval_util
    eval_util.evaluate_or_sample(
        provider, trainer,
        save_dir=args.save_dir,
        restore_dir=args.restore_dir or args.save_dir,
        mode=args.mode,
        batch_size=min(args.batch_size, 4),
        num_batches=args.num_eval_batches,
        run_once=args.run_once)


if __name__ == '__main__':
  main()
