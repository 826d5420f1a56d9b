"""End-to-end model tests (the reference's de-facto system test).

Mirrors reference autoencoder_test.py:29-78: build full models from presets,
run one forward pass on random audio, check generated audio shape == input;
plus a short training run asserting the loss decreases, and a data-parallel
sharded step on the 8-device CPU mesh.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ddsp_tpu import nn  # noqa: F401
from ddsp_tpu.data import SyntheticSinusoidProvider
from ddsp_tpu.parallel import create_mesh, single_device_mesh
from ddsp_tpu.train import Trainer, train
from ddsp_tpu.utils import build_model, list_presets


N_SAMPLES = 16000
SR = 16000


def get_batch(batch_size=2, n_samples=N_SAMPLES):
  provider = SyntheticSinusoidProvider(n_samples=n_samples, sample_rate=SR,
                                       n_examples=batch_size * 2)
  return next(provider.get_batch(batch_size, shuffle=False))


RNGS = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}


def test_presets_registered():
  presets = list_presets()
  for name in ['ae', 'solo_instrument', 'tiny']:
    assert name in presets


@pytest.mark.parametrize('preset,kwargs', [
    ('tiny', {}),
    ('solo_instrument',
     dict(n_samples=N_SAMPLES, time_steps=250, n_harmonics=20,
          n_noise_magnitudes=33, reverb_length=4000, rnn_channels=32,
          ch=32, layers_per_stack=1)),
    ('ae',
     dict(n_samples=N_SAMPLES, time_steps=250, n_harmonics=20,
          n_noise_magnitudes=33, z_dims=8, z_time_steps=250,
          rnn_channels=32, ch=32, layers_per_stack=1)),
])
def test_autoencoder_forward_generates_audio(preset, kwargs):
  model = build_model(preset, **kwargs)
  batch = get_batch()
  variables = model.init(RNGS, batch, training=True, return_losses=True)
  outputs, losses = model.apply(variables, batch, training=True,
                                return_losses=True,
                                rngs={'noise': jax.random.PRNGKey(2)})
  audio_synth = model.apply(variables, outputs,
                            method=model.get_audio_from_outputs)
  assert audio_synth.shape == batch['audio'].shape
  assert np.all(np.isfinite(np.asarray(audio_synth)))
  assert np.isfinite(float(losses['total_loss']))
  assert float(losses['total_loss']) > 0
  assert 'spectral_loss' in losses


def test_autoencoder_eval_mode_no_losses():
  model = build_model('tiny')
  batch = get_batch()
  variables = model.init(RNGS, batch, training=True, return_losses=True)
  outputs = model.apply(variables, batch, training=False,
                        rngs={'noise': jax.random.PRNGKey(2)})
  assert 'audio_synth' in outputs
  # Controls from every dag node present with the reference key contract.
  assert 'harmonic' in outputs
  assert 'signal' in outputs['harmonic']
  assert 'controls' in outputs['harmonic']


def test_training_loss_decreases_single_device():
  """Mini single-sound overfit: loss after 12 steps < loss at start."""
  model = build_model('tiny')
  provider = SyntheticSinusoidProvider(n_samples=16000, n_examples=1,
                                       seed=3)
  iterator = provider.get_batch(batch_size=1, shuffle=False, repeats=-1)
  trainer = Trainer(model, mesh=single_device_mesh(), learning_rate=1e-3)
  state = trainer.init(next(iterator))

  losses_hist = []
  for _ in range(12):
    state, losses = trainer.train_step(state, next(iterator))
    losses_hist.append(float(losses['total_loss']))
  assert np.isfinite(losses_hist).all()
  assert min(losses_hist[-3:]) < losses_hist[0]
  assert int(state.step) == 12


def test_training_step_data_parallel_8_devices():
  """Same step on an 8-device data-parallel mesh; loss matches 1-device."""
  assert len(jax.devices()) == 8, 'conftest must force 8 cpu devices'
  model = build_model('tiny')
  provider = SyntheticSinusoidProvider(n_samples=16000, n_examples=8,
                                       seed=4)
  batch = next(provider.get_batch(batch_size=8, shuffle=False))

  mesh8 = create_mesh(n_data=8)
  trainer8 = Trainer(model, mesh=mesh8)
  state8 = trainer8.init(batch)
  state8, losses8 = trainer8.train_step(state8, batch)

  trainer1 = Trainer(model, mesh=single_device_mesh())
  state1 = trainer1.init(batch)
  state1, losses1 = trainer1.train_step(state1, batch)

  # Identical global computation: loss scalars agree across shardings.
  np.testing.assert_allclose(float(losses8['total_loss']),
                             float(losses1['total_loss']), rtol=1e-4)
  # Params stay in sync too.
  p8 = jax.tree_util.tree_leaves(state8.params)[0]
  p1 = jax.tree_util.tree_leaves(state1.params)[0]
  np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-5)


def test_train_loop_with_checkpointing(tmp_path):
  """train() end to end: checkpoints written, resumable, spec saved."""
  from ddsp_tpu.utils import save_spec, model_from_spec

  save_dir = str(tmp_path / 'run')
  model = build_model('tiny')
  provider = SyntheticSinusoidProvider(n_samples=16000, n_examples=2,
                                       seed=5)
  iterator = provider.get_batch(batch_size=1, shuffle=False, repeats=-1)
  trainer = Trainer(model, mesh=single_device_mesh(),
                    checkpoints_to_keep=2)
  save_spec(save_dir, 'tiny')

  state = train(iterator, trainer, num_steps=4, steps_per_save=2,
                steps_per_summary=2, save_dir=save_dir)
  assert int(state.step) == 4

  # Resume: a fresh trainer restores step 4 and continues.
  model2 = model_from_spec(save_dir)
  trainer2 = Trainer(model2, mesh=single_device_mesh(),
                     checkpoints_to_keep=2)
  state2 = train(iterator, trainer2, num_steps=6, steps_per_save=2,
                 steps_per_summary=2, save_dir=save_dir)
  assert int(state2.step) == 6

  import os
  assert os.path.exists(os.path.join(save_dir, 'metrics.jsonl'))
  assert os.path.exists(os.path.join(save_dir, 'operative_spec.json'))


def test_partial_restore_by_submodule(tmp_path):
  """restore_keys restores only chosen param subtrees (VST-style)."""
  save_dir = str(tmp_path / 'run')
  model = build_model('tiny')
  batch = get_batch(batch_size=1)
  trainer = Trainer(model, mesh=single_device_mesh())
  state = trainer.init(batch)
  state, _ = trainer.train_step(state, batch)
  trainer.save(state, save_dir)

  trainer2 = Trainer(model, mesh=single_device_mesh(), seed=99)
  fresh = trainer2.init(batch)
  restored = trainer2.restore(fresh, save_dir, restore_keys=['decoder'])
  # Decoder matches the checkpoint...
  ckpt_dec = jax.tree_util.tree_leaves(state.params['decoder'])[0]
  rest_dec = jax.tree_util.tree_leaves(restored.params['decoder'])[0]
  np.testing.assert_allclose(np.asarray(ckpt_dec), np.asarray(rest_dec))
  # ...while other modules keep their fresh (seed=99) initialization:
  # some non-decoder leaf must DIFFER from the checkpoint, or the
  # restore_keys filter restored everything.
  other = [k for k in restored.params if k != 'decoder']
  assert other
  differs = False
  for k in other:
    for cl, rl in zip(jax.tree_util.tree_leaves(state.params[k]),
                      jax.tree_util.tree_leaves(restored.params[k])):
      if not np.allclose(np.asarray(cl), np.asarray(rl)):
        differs = True
  assert differs, 'non-decoder params matched the checkpoint'
  assert int(restored.step) == 0
