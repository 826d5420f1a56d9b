"""Train a tiny CREPE on synthetic harmonic audio with known f0, in-env.

The reference ships pretrained CREPE weights via the `crepe` pip package
(/root/reference/ddsp/spectral_ops.py:432-564); this environment has no
network access and no `.h5` on disk, which left the CREPE pipeline
(activations -> f0 decode, viterbi, eval metrics, embedding loss)
validated only against random weights. Pitch labels are free - synthetic
harmonic tones with known f0 - so this script trains the tiny-capacity
`ops.crepe.CrepeModel` from scratch on the attached accelerator, writes
the weights in the same keras-h5 layout `load_weights_from_h5` reads, and
validates raw pitch accuracy (RPA) on held-out tones.

The result is NOT the published CREPE (different training data); it is a
working learned pitch tracker for clean/lightly-noisy harmonic material,
committed as assets/crepe/model-tiny.h5 so the weights-gated tests and
the CREPE eval/embedding paths run with *learned* weights in this repo.

Usage:
  python scripts/train_tiny_crepe.py [--steps 6000] [--batch 256] \
      [--out assets/crepe/model-tiny.h5]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
FRAME = 1024
N_BINS = 360
# CREPE bin centers: cents above 10 Hz (ops/crepe.py _CENT_MAPPING).
CENTS = np.linspace(0, 7180, N_BINS) + 1997.3794084376191
FMIN_CENT, FMAX_CENT = CENTS[4], CENTS[-5]  # keep targets inside the grid


def synth_batch(rng: np.random.RandomState, batch: int):
  """(frames [batch, 1024], target [batch, 360]) with gaussian cent targets.

  Mix of harmonic tones (random f0, spectral slope, phase, light noise)
  and ~8% unpitched frames (noise/silence, all-zero target), the CREPE
  training recipe's 25-cent gaussian blur on the 20-cent bin grid.
  """
  t = np.arange(FRAME) / SR
  cents = rng.uniform(FMIN_CENT, FMAX_CENT, batch)
  f0 = 10.0 * 2.0 ** (cents / 1200.0)
  n_h = 12
  h = np.arange(1, n_h + 1)
  slope = rng.uniform(0.3, 2.0, (batch, 1))
  amps = rng.uniform(0.3, 1.0, (batch, n_h)) / h[None, :] ** slope
  amps = np.where(f0[:, None] * h[None, :] < SR / 2, amps, 0.0)
  phases = rng.uniform(0, 2 * np.pi, (batch, n_h))
  audio = np.einsum(
      'bh,bht->bt', amps,
      np.sin(2 * np.pi * f0[:, None, None] * h[None, :, None] * t[None, None,
                                                                  :]
             + phases[:, :, None])).astype(np.float32)
  audio *= rng.uniform(0.05, 1.0, (batch, 1)).astype(np.float32)
  audio += (rng.randn(batch, FRAME) *
            rng.uniform(0.0, 0.04, (batch, 1))).astype(np.float32)

  target = np.exp(-0.5 * ((CENTS[None, :] - cents[:, None]) / 25.0) ** 2)

  # Unpitched frames: pure noise or near-silence, all-zero target.
  n_unpitched = max(1, batch // 12)
  idx = rng.choice(batch, n_unpitched, replace=False)
  audio[idx] = (rng.randn(n_unpitched, FRAME) *
                rng.uniform(0.001, 0.3, (n_unpitched, 1))).astype(np.float32)
  target[idx] = 0.0
  return audio, target.astype(np.float32)


def save_keras_h5(path: str, variables) -> None:
  """Write flax CrepeModel variables in the layout load_weights_from_h5
  reads (model_weights/<layer>/<layer>/<param>:0, keras naming)."""
  import h5py  # pylint: disable=g-import-not-at-top
  import jax  # pylint: disable=g-import-not-at-top

  params = jax.device_get(variables['params'])
  stats = jax.device_get(variables['batch_stats'])
  os.makedirs(os.path.dirname(path), exist_ok=True)
  with h5py.File(path, 'w') as f:
    root = f.create_group('model_weights')

    def put(layer, name, value):
      g = root.require_group(layer).require_group(layer)
      g.create_dataset(name, data=np.asarray(value))

    for i in range(1, 7):
      conv = f'conv{i}'
      put(conv, 'kernel:0', params[conv]['kernel'])
      put(conv, 'bias:0', params[conv]['bias'])
      bn = f'{conv}-BN'
      put(bn, 'gamma:0', params[f'{conv}_BN']['scale'])
      put(bn, 'beta:0', params[f'{conv}_BN']['bias'])
      put(bn, 'moving_mean:0', stats[f'{conv}_BN']['mean'])
      put(bn, 'moving_variance:0', stats[f'{conv}_BN']['var'])
    put('classifier', 'kernel:0', params['classifier']['kernel'])
    put('classifier', 'bias:0', params['classifier']['bias'])


def main():
  ap = argparse.ArgumentParser(description=__doc__)
  ap.add_argument('--steps', type=int, default=6000)
  ap.add_argument('--batch', type=int, default=256)
  ap.add_argument('--lr', type=float, default=2e-4)
  ap.add_argument('--seed', type=int, default=0)
  ap.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      'assets', 'crepe', 'model-tiny.h5'))
  args = ap.parse_args()

  import jax
  import jax.numpy as jnp
  import optax
  from ddsp_tpu.ops import crepe

  model = crepe.CrepeModel(model_capacity='tiny')
  rng = np.random.RandomState(args.seed)
  x0, _ = synth_batch(rng, 2)
  variables = model.init(jax.random.PRNGKey(args.seed),
                         jnp.asarray(crepe.PretrainedCrepe.normalize_frames(
                             jnp.asarray(x0))), training=True)
  params, batch_stats = variables['params'], variables['batch_stats']

  tx = optax.adam(args.lr)
  opt_state = tx.init(params)

  @jax.jit
  def train_step(params, batch_stats, opt_state, frames, target):
    frames = crepe.PretrainedCrepe.normalize_frames(frames)

    def loss_fn(p):
      acts, mut = model.apply({'params': p, 'batch_stats': batch_stats},
                              frames, training=True,
                              mutable=['batch_stats'])
      eps = 1e-7
      acts = jnp.clip(acts, eps, 1.0 - eps)
      bce = -(target * jnp.log(acts) + (1 - target) * jnp.log(1 - acts))
      return jnp.mean(jnp.sum(bce, axis=-1)), mut['batch_stats']

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_stats, opt_state, loss

  t0 = time.time()
  for step in range(1, args.steps + 1):
    frames, target = synth_batch(rng, args.batch)
    params, batch_stats, opt_state, loss = train_step(
        params, batch_stats, opt_state, jnp.asarray(frames),
        jnp.asarray(target))
    if step % 500 == 0 or step == 1:
      print(f'step {step}: bce_sum {float(loss):.3f} '
            f'({time.time() - t0:.0f}s)', flush=True)

  save_keras_h5(args.out, {'params': params, 'batch_stats': batch_stats})
  print('wrote', args.out)

  # Held-out validation: RPA (<=50 cents) on clean sinusoids + harmonics.
  tracker = crepe.PretrainedCrepe(model_capacity='tiny',
                                  weights_path=args.out)
  assert tracker.pretrained
  val_rng = np.random.RandomState(1234)
  errs = []
  for hz in (65.4, 110.0, 220.0, 440.0, 587.3, 880.0, 1318.5):
    t = np.arange(SR) / SR
    audio = (0.6 * np.sin(2 * np.pi * hz * t)).astype(np.float32)
    audio += sum((0.2 / k) * np.sin(2 * np.pi * hz * k * t + val_rng.rand())
                 for k in (2, 3)).astype(np.float32)
    f0, conf = tracker.predict_f0_and_confidence(
        jnp.asarray(audio)[jnp.newaxis])
    f0 = np.asarray(f0)[0][2:-2]
    cents_err = np.abs(1200 * np.log2(np.maximum(f0, 1e-6) / hz))
    rpa = float(np.mean(cents_err < 50))
    errs.append(rpa)
    print(f'  {hz:7.1f} Hz: RPA(50c) {rpa:.3f} median '
          f'{np.median(cents_err):.1f} cents', flush=True)
  print(f'mean RPA {np.mean(errs):.3f}')


if __name__ == '__main__':
  main()
