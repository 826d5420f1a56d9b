"""Tests for TFDS providers (fake-loader fixture; no tfds dependency).

Covers the NSynth feature remap (reference data.py:175-197), the generic
TfdsProvider pass-through, batching through the provider protocol, the
run.py data-spec dispatch, and an ae-preset end-to-end smoke on a fake
NSynth batch.
"""

import numpy as np
import pytest

from ddsp_tpu import data as data_lib

SR = 16000
N_SAMPLES = 16000
N_FRAMES = 1001  # 4s at 250Hz, center-framed, scaled down: 1s -> 251


def _fake_nsynth_examples(n=6, n_samples=N_SAMPLES, n_frames=251):
  rng = np.random.RandomState(0)
  for i in range(n):
    yield {
        'audio': rng.randn(n_samples).astype(np.float32) * 0.1,
        'f0': {
            'hz': (200.0 * np.ones(n_frames)).astype(np.float32),
            'confidence': np.ones(n_frames, np.float32),
        },
        'loudness': {
            'db': (-30.0 * np.ones(n_frames)).astype(np.float32),
        },
        'pitch': np.int64(60 + i),
        'instrument': {
            'source': np.int64(0),
            'family': np.int64(i % 3),
            'label': np.int64(i),
        },
        'id': b'fake',  # extra key: must not leak through the remap
    }


def _fake_loader(name, split, data_dir, shuffle):
  del name, split, data_dir, shuffle
  return _fake_nsynth_examples()


class TestNSynthTfds:

  def test_feature_remap(self):
    p = data_lib.NSynthTfds(data_dir='/nonexistent', loader=_fake_loader)
    ex = next(iter(p.get_dataset(shuffle=False)))
    assert set(ex) == {'audio', 'f0_hz', 'f0_confidence', 'loudness_db',
                       'pitch', 'instrument_source', 'instrument_family',
                       'instrument'}
    assert ex['audio'].shape == (N_SAMPLES,)
    assert ex['f0_hz'].shape == (251,)
    assert ex['f0_hz'].dtype == np.float32

  def test_without_note_labels(self):
    p = data_lib.NSynthTfds(data_dir='/nonexistent',
                            include_note_labels=False,
                            loader=_fake_loader)
    ex = next(iter(p.get_dataset(shuffle=False)))
    assert set(ex) == {'audio', 'f0_hz', 'f0_confidence', 'loudness_db'}

  def test_batching(self):
    p = data_lib.NSynthTfds(data_dir='/nonexistent', loader=_fake_loader)
    batch = next(p.get_batch(4, shuffle=False, repeats=1))
    assert batch['audio'].shape == (4, N_SAMPLES)
    assert batch['f0_hz'].shape == (4, 251)
    assert batch['pitch'].shape == (4,)

  def test_missing_tfds_raises_clearly(self):
    p = data_lib.NSynthTfds(data_dir='/nonexistent')
    with pytest.raises(ImportError, match='tensorflow_datasets'):
      next(iter(p.get_dataset(shuffle=False)))

  def test_ae_preset_end_to_end(self):
    """A fake-NSynth batch trains one step through the ae preset."""
    import jax
    from ddsp_tpu.parallel import create_mesh
    from ddsp_tpu.train import Trainer
    from ddsp_tpu.utils import build_model

    p = data_lib.NSynthTfds(data_dir='/nonexistent',
                            include_note_labels=False,
                            loader=_fake_loader)
    batch = next(p.get_batch(2, shuffle=False, repeats=1))
    model = build_model('ae', n_samples=N_SAMPLES, time_steps=250,
                        n_harmonics=12, n_noise_magnitudes=17, z_dims=8,
                        z_time_steps=250, rnn_channels=16, ch=16,
                        layers_per_stack=1)
    trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                              devices=jax.devices()[:1]))
    state = trainer.init(batch)
    state, losses = trainer.train_step(state, batch)
    assert np.isfinite(float(losses['total_loss']))


class TestTfdsProvider:

  def test_passthrough(self):
    def loader(name, split, data_dir, shuffle):
      assert name == 'some_ds'
      assert split == 'train'
      for i in range(3):
        yield {'audio': np.zeros(100, np.float32) + i}

    p = data_lib.TfdsProvider('some_ds', 'train', loader=loader)
    exs = list(p.get_dataset(shuffle=False))
    assert len(exs) == 3
    assert exs[2]['audio'][0] == 2.0


class TestRunCliDataSpec:

  def test_nsynth_spec(self):
    from ddsp_tpu.run import build_data_provider
    p = build_data_provider('nsynth:train:/tmp/tfds', 64000, SR, 250)
    assert isinstance(p, data_lib.NSynthTfds)

  def test_tfds_spec(self):
    from ddsp_tpu.run import build_data_provider
    p = build_data_provider('tfds:myset:test', 64000, SR, 250)
    assert isinstance(p, data_lib.TfdsProvider)
    assert not isinstance(p, data_lib.NSynthTfds)


class TestProviderVariants:

  def _write_records(self, path, n=3, with_16k=True):
    from ddsp_tpu.data import tfrecord
    rng = np.random.RandomState(0)
    records = []
    for _ in range(n):
      feats = {
          'audio': rng.randn(800).astype(np.float32),
          'f0_hz': rng.rand(51).astype(np.float32) * 200,
          'f0_confidence': np.ones(51, np.float32),
          'loudness_db': -np.abs(rng.randn(51)).astype(np.float32) * 30,
      }
      if with_16k:
        feats['audio_16k'] = rng.randn(800).astype(np.float32)
      records.append(tfrecord.serialize_example(feats))
    tfrecord.write_records(path, records)

  def test_tfrecord_provider_passes_audio_16k(self, tmp_path):
    path = str(tmp_path / 'data.tfrecord')
    self._write_records(path, with_16k=True)
    p = data_lib.TFRecordProvider(path, example_secs=1, sample_rate=800,
                                  frame_rate=50)
    ex = next(iter(p.get_dataset(shuffle=False)))
    assert 'audio_16k' in ex
    assert ex['audio_16k'].shape == (800,)

  def test_legacy_provider_omits_audio_16k(self, tmp_path):
    path = str(tmp_path / 'data.tfrecord')
    self._write_records(path, with_16k=True)
    p = data_lib.LegacyTFRecordProvider(path, example_secs=1,
                                        sample_rate=800, frame_rate=50)
    ex = next(iter(p.get_dataset(shuffle=False)))
    assert set(ex) == {'audio', 'f0_hz', 'f0_confidence', 'loudness_db'}

  def test_experimental_provider_round_trip(self, tmp_path):
    tf = pytest.importorskip('tensorflow')
    data = {'audio': np.random.RandomState(0).randn(4, 100)
            .astype(np.float32)}
    ds = tf.data.Dataset.from_tensor_slices(data)
    snap = str(tmp_path / 'snapshot')
    ds.save(snap)
    p = data_lib.ExperimentalDataProvider(snap, sample_rate=800,
                                          frame_rate=50)
    exs = list(p.get_dataset())
    assert len(exs) == 4
    assert exs[0]['audio'].shape == (100,)
