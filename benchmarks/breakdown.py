"""Per-component wall-clock breakdown of the canonical training step.

Times each stage of the solo_instrument train step in isolation
(preprocessor, decoder, processor group, spectral loss, full step) at the
TPU-canonical batch 64 (reference trains at batch 64 on TPU,
/root/reference/ddsp/training/gin/optimization/base_tpu.gin:4-5), so
optimization effort goes at the biggest measured slice instead of guesses.

Usage: python benchmarks/breakdown.py [--batch 64] [--iters 30]
Prints one line per component and a JSON summary.
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


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--batch', type=int, default=64)
  parser.add_argument('--iters', type=int, default=30)
  parser.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'breakdown.json'))
  args = parser.parse_args()

  import jax
  import jax.numpy as jnp
  from ddsp_tpu import utils
  from ddsp_tpu.data import SyntheticSinusoidProvider
  from ddsp_tpu.parallel import create_mesh
  from ddsp_tpu.train import Trainer

  def sync(tree):
    # 1-element transfer fence: block_until_ready under-reports through
    # the device tunnel, full-array np.asarray over-reports (transfer).
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(jnp.ravel(leaf)[:1])

  results = {}

  def bench(name, fn, *fargs):
    from benchmarks.timing import measure
    t_c = time.perf_counter()
    r = fn(*fargs)
    sync(r)
    compile_s = time.perf_counter() - t_c
    dt = measure(fn, fargs, args.iters)
    results[name] = dt
    print(f'{name:28s} {dt*1e3:8.2f} ms   (compile {compile_s:.1f}s)',
          flush=True)
    return r

  model = utils.build_model('solo_instrument')
  provider = SyntheticSinusoidProvider(n_samples=N_SAMPLES, sample_rate=SR,
                                       frame_rate=250, n_examples=args.batch)
  batch = next(provider.get_batch(args.batch, shuffle=False))
  trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                            devices=jax.devices()[:1]))
  state = trainer.init(batch)
  batch = jax.device_put(batch)
  params = state.params
  noise_rng = jax.random.PRNGKey(7)


  def loss_fn(params, batch):
    _, losses = model.apply({'params': params}, batch, training=True,
                            rngs={'noise': noise_rng},
                            method=model.forward_with_losses)
    return sum(jax.tree_util.tree_leaves(losses))

  bench('fwd_grad_total', jax.jit(jax.value_and_grad(loss_fn)), params, batch)
  bench('fwd_only', jax.jit(loss_fn), params, batch)

  def encode_fn(params, batch):
    return model.apply({'params': params}, batch, training=True,
                       method=model.encode)

  features = bench('preprocessor_fwd', jax.jit(encode_fn), params, batch)
  features = jax.device_put(jax.tree.map(np.asarray, features))

  def dec_fn(params, features):
    return model.apply(
        {'params': params}, features, training=True,
        method=lambda m, f, training: m.decoder(f, training=training))

  dec_out = bench('decoder_fwd', jax.jit(dec_fn), params, features)

  def dec_loss(params, features):
    out = dec_fn(params, features)
    return sum(jnp.mean(v**2) for v in jax.tree_util.tree_leaves(out))

  bench('decoder_fwd_grad', jax.jit(jax.value_and_grad(dec_loss)),
        params, features)

  decoded = dict(features)
  decoded.update(jax.tree.map(np.asarray, dec_out))
  decoded = jax.device_put(decoded)

  def pg_fn(params, decoded):
    return model.apply({'params': params}, decoded, rngs={'noise': noise_rng},
                       method=lambda m, f: m.processor_group(f))

  audio_synth = bench('processor_group_fwd', jax.jit(pg_fn), params, decoded)

  def pg_loss(params, decoded):
    return jnp.mean(pg_fn(params, decoded)**2)

  bench('processor_group_fwd_grad',
        jax.jit(jax.value_and_grad(pg_loss, argnums=(0, 1))), params, decoded)

  audio_synth = jax.device_put(np.asarray(audio_synth))

  def sl_fn(params, audio, audio_synth):
    return model.apply({'params': params}, audio, audio_synth,
                       method=lambda m, a, b: m.losses[0](a, b))

  bench('spectral_loss_fwd', jax.jit(sl_fn), params, batch['audio'],
        audio_synth)
  bench('spectral_loss_fwd_grad',
        jax.jit(jax.value_and_grad(sl_fn, argnums=2)),
        params, batch['audio'], audio_synth)

  # The jitted step donates the state buffers, so carry the state through
  # the timing loop instead of using the generic helper.
  t_c = time.perf_counter()
  state2, losses = trainer.train_step(state, batch)
  sync(losses)
  compile_s = time.perf_counter() - t_c
  t0 = time.perf_counter()
  for _ in range(args.iters):
    state2, losses = trainer.train_step(state2, batch)
  sync(losses)
  dt = (time.perf_counter() - t0) / args.iters
  results['full_train_step'] = dt
  print(f'{"full_train_step":28s} {dt*1e3:8.2f} ms   '
        f'(compile {compile_s:.1f}s)', flush=True)
  del state2

  summary = {k: round(v, 6) for k, v in results.items()}
  print(json.dumps(summary))
  with open(args.out, 'w') as f:
    json.dump(summary, f, indent=2, sort_keys=True)
  print('Wrote', args.out)


if __name__ == '__main__':
  main()
