"""Tests for postprocessing, heuristics, synthetic data, providers, prep.

Patterns from the reference: prepare pipeline end-to-end on a tiny wav in
temp dirs with feature-length assertions (prepare_tfrecord_lib_test.py:
100-218); quantile transform round trips; note segmentation on synthetic
control tracks.
"""

import os

import numpy as np
import pytest

from ddsp_tpu import data as data_lib
from ddsp_tpu.data import synthetic_data
from ddsp_tpu.eval import heuristics, postprocessing


RNG = np.random.RandomState(9)


class TestPostprocessing:

  def test_smooth_shapes(self):
    x = RNG.rand(100).astype(np.float32)
    y = postprocessing.smooth(x, 7)
    assert y.shape == x.shape
    x2 = RNG.rand(2, 50).astype(np.float32)
    assert postprocessing.smooth(x2, 4).shape == x2.shape
    # Smoothing a constant keeps it (interior).
    c = postprocessing.smooth(np.ones(20, np.float32), 5)
    np.testing.assert_allclose(c[3:-3], 1.0, atol=1e-6)

  def test_detect_notes(self):
    t = 200
    loudness = np.full((1, t), -60.0)
    conf = np.full((1, t), 0.1)
    # One loud, confident note in the middle.
    loudness[0, 80:120] = -20.0
    conf[0, 80:120] = 0.95
    mask_on, ratio = postprocessing.detect_notes(loudness, conf)
    assert mask_on.shape == (1, t) and ratio.shape == (1, t)
    assert mask_on[0, 100]
    assert not mask_on[0, 10]

  def test_quantile_transform_round_trip(self):
    x = RNG.randn(500, 1).astype(np.float64) * 10 - 40
    qt = postprocessing.QuantileTransformer(n_quantiles=100)
    y = qt.fit_transform(x)
    assert np.all(y >= 0) and np.all(y <= 1)
    x_rec = qt.inverse_transform(y)
    np.testing.assert_allclose(x_rec[:, 0], x[:, 0], atol=0.5)

  def test_quantile_matches_sklearn_semantics(self):
    # Uniform output: the transform of the data is ~its empirical CDF.
    x = np.sort(RNG.rand(1000))[:, None]
    qt = postprocessing.QuantileTransformer(n_quantiles=1000)
    y = qt.fit_transform(x)[:, 0]
    np.testing.assert_allclose(y, np.linspace(0, 1, 1000), atol=0.01)

  def test_fit_quantile_transform_with_inverse(self):
    loudness = RNG.randn(4, 100) * 5 - 40
    mask = np.ones_like(loudness, bool)
    pretrained = postprocessing.fit_quantile_transform(loudness, mask)
    _, loudness_norm = postprocessing.fit_quantile_transform(
        loudness - 10, mask, inv_quantile=pretrained)
    # Renormalized toward the pretrained distribution (mean restored).
    assert abs(np.mean(loudness_norm) - np.mean(loudness)) < 2.0

  def test_compute_dataset_statistics(self):
    provider = data_lib.SyntheticSinusoidProvider(
        n_samples=4000, sample_rate=16000, frame_rate=50, n_examples=4)
    stats = postprocessing.compute_dataset_statistics(
        provider, batch_size=2, power_frame_size=1024, power_frame_rate=50)
    for key in ['mean_pitch', 'std_loudness', 'mean_max_power',
                'quantile_transform']:
      assert key in stats
    assert np.isfinite(stats['mean_pitch'])

  def test_tuning_factor_and_autotune(self):
    t = 500
    # f0 detuned 30 cents sharp from A440 grid.
    f0_midi = np.full(t, 69.0) + 0.3 + 0.01 * RNG.randn(t)
    conf = np.ones(t)
    mask = np.ones(t, bool)
    tuning = postprocessing.get_tuning_factor(f0_midi, conf, mask)
    assert abs(tuning - 0.3) < 0.05
    tuned = postprocessing.auto_tune(f0_midi, tuning, mask, amount=1.0,
                                     chromatic=True)
    # Fully tuned: lands on the tuning-offset grid. Circular distance to
    # the nearest integer (residues epsilon below 1.0 are also on-grid).
    r = (tuned - tuning) % 1.0
    assert np.all(np.minimum(r, 1.0 - r) < 0.05)


class TestHeuristics:

  def _controls(self, t=400):
    f0 = np.concatenate([np.full(t // 2, 220.0), np.full(t // 2, 440.0)])
    # Slight variation: perfectly constant amps are degenerate for the
    # std-dev outlier binarizer (strict <, zero std).
    amps = 0.5 + 0.01 * np.sin(np.arange(t))
    return {
        'f0_hz': f0[:, None].astype(np.float32),
        'harmonic': {'controls': {
            'amplitudes': amps[:, None, None].astype(np.float32)}},
    }

  def test_segment_notes_two_notes(self):
    controls = self._controls()
    seq = heuristics.segment_notes(
        binarize_f=heuristics.midi_heuristic,
        pick_f0_f=heuristics.median_f0,
        pick_amps_f=heuristics.median_amps,
        controls=controls, frame_rate=250)
    assert isinstance(seq, heuristics.NoteSequence)
    assert len(seq.notes) == 2
    pitches = sorted(n.pitch for n in seq.notes)
    assert pitches == [57, 69]  # A3, A4
    assert seq.total_time == 400 / 250

  def test_segment_notes_batch(self):
    controls = self._controls()
    batch = {
        'f0_hz': np.stack([controls['f0_hz']] * 2),
        'harmonic': {'controls': {'amplitudes': np.stack(
            [controls['harmonic']['controls']['amplitudes']] * 2)}},
    }
    seqs = heuristics.segment_notes_batch(
        heuristics.midi_heuristic, heuristics.median_f0,
        heuristics.median_amps, batch)
    assert len(seqs) == 2
    assert all(len(s.notes) == 2 for s in seqs)

  def test_remove_short(self):
    vec = np.zeros(50, bool)
    vec[10:12] = True  # too short
    vec[20:45] = True
    out = heuristics.remove_short(vec.copy(), min_samples=5)
    assert not out[10:12].any()
    assert out[20:45].all()

  def test_active_frame_indices(self):
    pr = np.zeros((6, 3))
    pr[1:4, 1] = 1
    active = heuristics.get_active_frame_indices(pr)
    np.testing.assert_array_equal(active[:, 1], [0, 1, 2, 3, 0, 0])


class TestSyntheticData:

  def test_generate_notes_shapes(self):
    rng = np.random.RandomState(0)
    c = synthetic_data.generate_notes(2, 100, n_harmonics=20, n_mags=9,
                                      random_state=rng)
    assert c['harm_amp'].shape == (2, 100, 1)
    assert c['harm_dist'].shape == (2, 100, 20)
    assert c['f0_hz'].shape == (2, 100, 1)
    assert c['sin_amps'].shape == (2, 100, 20)
    assert c['sin_freqs'].shape == (2, 100, 20)
    assert c['noise_magnitudes'].shape == (2, 100, 9)
    # Controls: harm_dist normalized, f0 in midi range 24-84.
    np.testing.assert_allclose(c['harm_dist'].sum(-1), 1.0, atol=1e-3)
    assert np.all(c['f0_hz'] > 20) and np.all(c['f0_hz'] < 1200)

  def test_generate_notes_v2(self):
    rng = np.random.RandomState(1)
    c = synthetic_data.generate_notes_v2(1, 125, n_harmonics=16, n_mags=9,
                                         random_state=rng)
    assert c['harm_dist'].shape == (1, 125, 16)
    assert np.all(np.isfinite(c['harm_dist']))
    sums = c['harm_dist'].sum(-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)

  def test_provider_on_the_fly(self):
    provider = data_lib.SyntheticNotesProvider(
        n_timesteps=50, n_harmonics=8, n_mags=5, n_examples=4)
    batch = next(provider.get_batch(2, shuffle=False))
    assert batch['sin_amps'].shape == (2, 50, 8)
    assert batch['noise_magnitudes'].shape == (2, 50, 5)


class TestMultiProviders:

  def _providers(self):
    return [
        data_lib.SyntheticSinusoidProvider(n_samples=2000, frame_rate=50,
                                           n_examples=4, seed=0),
        data_lib.SyntheticSinusoidProvider(n_samples=2000, frame_rate=50,
                                           n_examples=4, seed=1),
    ]

  def test_zipped_provider(self):
    zp = data_lib.ZippedProvider(self._providers())
    batch = next(zp.get_batch(2, shuffle=False))
    assert isinstance(batch, tuple) and len(batch) == 2
    assert batch[0]['audio'].shape == (2, 2000)
    assert batch[1]['audio'].shape == (2, 2000)

  def test_zipped_provider_ratios(self):
    zp = data_lib.ZippedProvider(self._providers(),
                                 batch_size_ratios=(2, 1))
    batch = next(zp.get_batch(3, shuffle=False))
    assert batch[0]['audio'].shape[0] == 2
    assert batch[1]['audio'].shape[0] == 1

  def test_mixed_provider(self):
    mp = data_lib.MixedProvider(self._providers(), seed=0)
    examples = [next(mp.get_dataset(shuffle=False)) for _ in range(3)]
    assert all('audio' in e for e in examples)

  def test_zipped_epoch_is_finite_and_repeats_works(self):
    """get_dataset yields ONE epoch (zip ends at the shortest provider)
    so repeats=1 consumers terminate instead of looping forever."""
    zp = data_lib.ZippedProvider(self._providers())
    epoch = list(zp.get_dataset(shuffle=False))
    assert len(epoch) == 4  # min provider length
    batches = list(zp.get_batch(2, shuffle=False, repeats=1))
    assert len(batches) == 2

  def test_mixed_epoch_is_finite_and_ratio_weighted(self):
    """One Mixed epoch samples by ratio and STOPS when a provider
    exhausts (tf.data stop_on_empty semantics): finite, so get_batch's
    repeats works, and the realized mix tracks batch_size_ratios."""
    mp = data_lib.MixedProvider(self._providers(), seed=0)
    epoch = list(mp.get_dataset(shuffle=False))
    assert 4 <= len(epoch) <= 8  # ends at the first exhausted provider
    batches = list(mp.get_batch(2, shuffle=False, repeats=1))
    assert 2 <= len(batches) <= 4

    # A zero ratio must never be sampled (and never crash): the epoch is
    # exactly provider 0's examples.
    mp0 = data_lib.MixedProvider(self._providers(),
                                 batch_size_ratios=(1.0, 0.0), seed=0)
    epoch0 = list(mp0.get_dataset(shuffle=False))
    assert len(epoch0) == 4


class TestPrepareRecords:

  def test_end_to_end_tiny_wav(self, tmp_path):
    from scipy.io import wavfile
    sr = 16000
    t = np.arange(6 * sr) / sr
    audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav_path = str(tmp_path / 'test.wav')
    wavfile.write(wav_path, sr, (audio * 32767).astype(np.int16))

    out_prefix = str(tmp_path / 'data')
    written = data_lib.prepare_records(
        [wav_path], out_prefix, frame_rate=250, example_secs=4,
        hop_secs=1, chunk_secs=6.0, center=True, compute_f0=False)
    assert len(written) == 1

    provider = data_lib.TFRecordProvider(written[0], example_secs=4,
                                         frame_rate=250, centered=True)
    batch = next(provider.get_batch(2, shuffle=False))
    assert batch['audio'].shape == (2, 64000)
    # Centered features: 4s * 250 fps + 1.
    assert batch['loudness_db'].shape == (2, 1001)
    assert batch['f0_hz'].shape == (2, 1001)
    assert np.all(np.isfinite(batch['loudness_db']))

  def test_eval_split(self, tmp_path):
    from scipy.io import wavfile
    sr = 16000
    audio = RNG.randn(8 * sr).astype(np.float32) * 0.1
    wav_path = str(tmp_path / 'x.wav')
    wavfile.write(wav_path, sr, (audio * 32767).astype(np.int16))
    written = data_lib.prepare_records(
        [wav_path], str(tmp_path / 'out'), frame_rate=50, example_secs=2,
        hop_secs=1, chunk_secs=2.0, eval_split_fraction=0.25,
        compute_f0=False)
    names = [os.path.basename(p) for p in written]
    assert any('train' in n for n in names)
    assert any('eval' in n for n in names)


class TestPrefetch:

  def test_prefetch_yields_device_batches(self):
    import jax
    from ddsp_tpu.data.prefetch import prefetch_to_device
    from ddsp_tpu.parallel import create_mesh
    from ddsp_tpu.parallel.mesh import batch_sharding

    provider = data_lib.SyntheticSinusoidProvider(
        n_samples=2000, frame_rate=50, n_examples=8)
    mesh = create_mesh(n_data=1, devices=jax.devices()[:1])
    it = prefetch_to_device(provider.get_batch(2, shuffle=False, repeats=1),
                            size=2, sharding=batch_sharding(mesh))
    batches = list(it)
    assert len(batches) == 4
    assert all(isinstance(b['audio'], jax.Array) for b in batches)

  def test_prefetch_propagates_errors(self):
    from ddsp_tpu.data.prefetch import prefetch_to_device

    def bad_iterator():
      yield {'x': np.zeros(3, np.float32)}
      raise RuntimeError('boom')

    it = prefetch_to_device(bad_iterator(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match='boom'):
      for _ in it:
        pass

  def test_prefetch_slow_consumer_still_terminates(self):
    """The end-of-data sentinel must reach a consumer slower than the
    producer (full queue when the iterator exhausts) - a dropped sentinel
    hangs training at the end of a finite dataset."""
    import time
    from ddsp_tpu.data.prefetch import prefetch_to_device

    def finite():
      for _ in range(4):
        yield {'x': np.zeros(3, np.float32)}

    it = prefetch_to_device(finite(), size=1)
    got = 0
    for _ in it:
      time.sleep(0.1)  # let the producer finish with the queue full
      got += 1
    assert got == 4

  def test_prefetch_close_unblocks_producer(self):
    """Abandoning the iterator early (train early-stop) must stop the
    producer thread instead of leaving it blocked on a full queue."""
    import threading
    import time
    from ddsp_tpu.data.prefetch import prefetch_to_device

    started = threading.active_count()

    def infinite():
      while True:
        yield {'x': np.zeros(3, np.float32)}

    it = prefetch_to_device(infinite(), size=1)
    next(it)  # producer is now blocked on a full queue
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > started and time.time() < deadline:
      time.sleep(0.05)
    assert threading.active_count() <= started


class TestNotebookUtils:

  def test_wav_round_trip(self, tmp_path):
    from ddsp_tpu.utils import notebook
    rng = np.random.RandomState(0)
    audio = (rng.randn(4000) * 0.2).astype(np.float32)
    wav = notebook.audio_to_wav_bytes(audio, 16000)
    back = notebook.audio_bytes_to_np(wav, sample_rate=16000)
    assert back.shape == audio.shape
    np.testing.assert_allclose(back, np.clip(audio, -1, 1), atol=2e-4)

  def test_resampling_on_load(self):
    from ddsp_tpu.utils import notebook
    t = np.arange(8000) / 8000.0
    audio = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    wav = notebook.audio_to_wav_bytes(audio, 8000)
    back = notebook.audio_bytes_to_np(wav, sample_rate=16000)
    assert abs(len(back) - 16000) <= 1

  def test_play_headless_writes_wav(self, tmp_path):
    from ddsp_tpu.utils import notebook
    path = str(tmp_path / 'out.wav')
    out = notebook.play(np.zeros(1000, np.float32), out_path=path)
    assert out == path and os.path.exists(path)

  def test_record_upload_raise_clearly(self):
    from ddsp_tpu.utils import notebook
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match='frontend'):
      notebook.record()
    with _pytest.raises(RuntimeError, match='frontend'):
      notebook.upload()


def test_modulate_per_batch_stddev():
  """modulate() with n_batch > 1 draws one stddev per batch row
  (regression: the noise draw used a [1, n_t, 1] size that could not
  broadcast against the [n_batch] scale vector)."""
  from ddsp_tpu.data import synthetic_data
  rng = np.random.RandomState(0)
  signal = np.ones((3, 100, 2), np.float32)
  out = synthetic_data.modulate(signal, maxval=0.5, n_t=10,
                                random_state=rng)
  assert out.shape == signal.shape
  assert np.isfinite(out).all()
  # Rows got different modulation envelopes.
  assert not np.allclose(out[0], out[1])


def test_synthetic_provider_shuffles_across_epochs():
  """shuffle=True must change the example order between epochs (content
  stays seed-deterministic)."""
  provider = data_lib.SyntheticSinusoidProvider(
      n_samples=2000, frame_rate=50, n_examples=6, seed=0)
  epoch1 = [e['f0_hz'][0] for e in provider.get_dataset(shuffle=True)]
  epoch2 = [e['f0_hz'][0] for e in provider.get_dataset(shuffle=True)]
  assert sorted(epoch1) == sorted(epoch2)  # same content
  assert epoch1 != epoch2                  # different order
  # shuffle=False keeps the canonical order.
  fixed1 = [e['f0_hz'][0] for e in provider.get_dataset(shuffle=False)]
  fixed2 = [e['f0_hz'][0] for e in provider.get_dataset(shuffle=False)]
  assert fixed1 == fixed2
