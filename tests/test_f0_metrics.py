"""Weights-free pitch metrics: YIN estimator accuracy on known sinusoids.

Round-4 requirement: eval pitch metrics (f0_dist / RPA / RCA) must be real
in an environment with no CREPE .h5 weights. The classical YIN tracker is
validated on synthetic signals with known f0 (the same fixture style as
the reference's metrics tests).
"""

import numpy as np

from ddsp_tpu.eval import metrics as metrics_lib
from ddsp_tpu.utils.test_util import gen_np_sinusoid

SR = 16000
FRAME_RATE = 250


class TestComputeF0Yin:

  def _sin(self, hz, secs=2.0, amp=0.5):
    return gen_np_sinusoid(hz, amp, SR, secs).astype(np.float32)

  def test_pure_tone_within_50_cents(self):
    for hz in (110.0, 220.0, 440.0, 880.0):
      f0, conf = metrics_lib.compute_f0_yin(self._sin(hz), SR, FRAME_RATE)
      cents = 1200 * np.abs(np.log2(np.maximum(f0, 1e-6) / hz))
      # Interior frames (the 2048-sample window spans 32 hops, so edge
      # frames see zero padding and read lower confidence).
      inner = slice(20, -20)
      assert np.median(cents[inner]) < 10, hz
      assert np.mean(cents[inner] < 50) > 0.95, hz
      assert np.mean(conf[inner] > 0.85) > 0.9, hz

  def test_batch_shape_matches_framing(self):
    audio = np.stack([self._sin(220.0), self._sin(440.0)])
    f0, conf = metrics_lib.compute_f0_yin(audio, SR, FRAME_RATE)
    from ddsp_tpu.ops import spectral
    n_frames, _ = spectral.get_framed_lengths(audio.shape[1], 2048,
                                              SR // FRAME_RATE, 'center')
    assert f0.shape == conf.shape == (2, n_frames)

  def test_harmonic_tone_tracks_fundamental(self):
    t = np.arange(int(2.0 * SR)) / SR
    audio = sum((0.5 / h) * np.sin(2 * np.pi * 220.0 * h * t)
                for h in range(1, 6)).astype(np.float32)
    f0, _ = metrics_lib.compute_f0_yin(audio, SR, FRAME_RATE)
    cents = 1200 * np.abs(np.log2(np.maximum(f0, 1e-6) / 220.0))
    assert np.mean(cents[4:-4] < 50) > 0.95

  def test_chirp_tracks_per_frame(self):
    # Frequency-VARYING input - the timbre-transfer case. A 220->440 Hz
    # linear glissando over 2 s; each frame's estimate must follow the
    # instantaneous frequency at that frame's center, not the average.
    secs = 2.0
    t = np.arange(int(secs * SR)) / SR
    f_inst = 220.0 + (440.0 - 220.0) * t / secs
    phase = 2 * np.pi * np.cumsum(f_inst) / SR
    audio = (0.5 * np.sin(phase)).astype(np.float32)
    f0, conf = metrics_lib.compute_f0_yin(audio, SR, FRAME_RATE)
    hop = SR // FRAME_RATE
    inner = slice(20, -20)  # away from the zero-padded edge frames
    # Against the frame-center truth: within 50 cents everywhere.
    centers = np.minimum(np.arange(len(f0)) * hop, len(t) - 1)
    cents = 1200 * np.abs(np.log2(np.maximum(f0, 1e-6) / f_inst[centers]))
    assert np.mean(cents[inner] < 50) > 0.95
    assert np.mean(conf[inner] > 0.8) > 0.9
    # YIN's integration head spans [center - w, center), so the estimate's
    # effective epoch is center - w/2 (w = frame_size // 2 = 1024). At
    # that epoch the tracker is tight on a glissando.
    epoch = np.clip(np.arange(len(f0)) * hop - 512, 0, len(t) - 1)
    cents_e = 1200 * np.abs(np.log2(np.maximum(f0, 1e-6) / f_inst[epoch]))
    assert np.median(cents_e[inner]) < 5

  def test_vibrato_follows_modulation(self):
    # 6 Hz vibrato, +/-60 cents around 330 Hz. The 1024-sample YIN
    # integration window (~64 ms, 0.38 vibrato cycles) low-passes the
    # modulation, so per-frame tolerance is looser than for the chirp -
    # but the estimate must genuinely FOLLOW the modulation (high
    # correlation with the true contour), not flatten to the mean.
    secs = 2.0
    depth_cents = 60.0
    t = np.arange(int(secs * SR)) / SR
    f_inst = 330.0 * 2.0 ** (depth_cents / 1200.0 * np.sin(2 * np.pi * 6.0 * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / SR
    audio = (0.5 * np.sin(phase)).astype(np.float32)
    f0, _ = metrics_lib.compute_f0_yin(audio, SR, FRAME_RATE)
    hop = SR // FRAME_RATE
    # Truth at the estimator's effective epoch (center - w/2; see the
    # chirp test) - without it, the 6 Hz modulation's ~0.19-cycle phase
    # lag alone would destroy the correlation.
    epoch = np.clip(np.arange(len(f0)) * hop - 512, 0, len(t) - 1)
    truth = f_inst[epoch]
    inner = slice(20, -20)
    cents_err = 1200 * np.abs(np.log2(np.maximum(f0, 1e-6) / truth))
    assert np.mean(cents_err[inner] < 50) > 0.9
    est_cents = 1200 * np.log2(np.maximum(f0[inner], 1e-6) / 330.0)
    true_cents = 1200 * np.log2(truth[inner] / 330.0)
    corr = np.corrcoef(est_cents, true_cents)[0, 1]
    assert corr > 0.9, corr

  def test_silence_has_zero_confidence(self):
    f0, conf = metrics_lib.compute_f0_yin(np.zeros(SR, np.float32), SR,
                                          FRAME_RATE)
    assert conf.max() == 0.0

  def test_noise_is_low_confidence(self):
    rng = np.random.RandomState(0)
    noise = (0.3 * rng.randn(SR)).astype(np.float32)
    _, conf = metrics_lib.compute_f0_yin(noise, SR, FRAME_RATE)
    assert np.mean(conf > metrics_lib.MIN_F0_CONFIDENCE) < 0.2


class TestF0GenMetrics:

  def _batch_and_audio(self, hz_gen, hz_gt=440.0, secs=2.0):
    audio_gt = gen_np_sinusoid(hz_gt, 0.5, SR, secs).astype(np.float32)
    audio_gen = gen_np_sinusoid(hz_gen, 0.5, SR, secs).astype(np.float32)
    n_frames, _ = __import__('ddsp_tpu.ops.spectral', fromlist=['x']
                             ).get_framed_lengths(
        len(audio_gt), 2048, SR // FRAME_RATE, 'center')
    batch = {
        'audio': audio_gt[np.newaxis],
        'f0_hz': np.full((1, n_frames), hz_gt, np.float32),
        'f0_confidence': np.ones((1, n_frames), np.float32),
    }
    return batch, audio_gen[np.newaxis]

  def test_matching_pitch_scores_high(self):
    m = metrics_lib.F0GenMetrics(SR, FRAME_RATE, estimator='yin')
    batch, audio_gen = self._batch_and_audio(hz_gen=440.0)
    m.update_state(batch, audio_gen)
    results = m.flush(step=0)
    assert results['metrics/f0_yin/raw_pitch_accuracy'] >= 0.9
    assert results['metrics/f0_yin/raw_chroma_accuracy'] >= 0.9
    assert results['metrics/f0_yin/f0_dist'] < 0.5
    assert results['metrics/f0_yin/outlier_ratio'] == 0.0

  def test_wrong_pitch_scores_low(self):
    m = metrics_lib.F0GenMetrics(SR, FRAME_RATE, estimator='yin')
    # A fifth plus an octave off: every frame outside 50 cents.
    batch, audio_gen = self._batch_and_audio(hz_gen=660.0)
    m.update_state(batch, audio_gen)
    results = m.flush(step=0)
    assert results['metrics/f0_yin/raw_pitch_accuracy'] < 0.1

  def test_octave_error_forgiven_by_chroma(self):
    m = metrics_lib.F0GenMetrics(SR, FRAME_RATE, estimator='yin')
    batch, audio_gen = self._batch_and_audio(hz_gen=880.0)
    m.update_state(batch, audio_gen)
    results = m.flush(step=0)
    assert results['metrics/f0_yin/raw_pitch_accuracy'] < 0.1
    assert results['metrics/f0_yin/raw_chroma_accuracy'] >= 0.9


class TestF0LdEvaluatorAutoFallback:

  def test_auto_picks_yin_without_weights(self, monkeypatch):
    # Simulate a weights-free environment (no env dir AND no committed
    # assets/crepe file) - auto must fall back to the YIN tracker.
    monkeypatch.setattr(metrics_lib, 'crepe_weights_available',
                        lambda *a, **k: False)
    from ddsp_tpu.eval.evaluators import F0LdEvaluator
    ev = F0LdEvaluator(SR, FRAME_RATE)
    assert ev._f0_gen_metrics is not None
    assert ev._f0_gen_metrics._estimator == 'yin'

  def test_auto_picks_crepe_with_weights(self, monkeypatch):
    monkeypatch.setattr(metrics_lib, 'crepe_weights_available',
                        lambda *a, **k: True)
    from ddsp_tpu.eval.evaluators import F0LdEvaluator
    ev = F0LdEvaluator(SR, FRAME_RATE)
    assert ev._f0_gen_metrics._estimator == 'crepe'

  def test_run_f0_crepe_alias(self):
    from ddsp_tpu.eval.evaluators import F0LdEvaluator
    ev = F0LdEvaluator(SR, FRAME_RATE, run_f0_crepe=True)
    assert ev._f0_gen_metrics._estimator == 'crepe'

  def test_evaluate_reports_pitch_metrics(self):
    from ddsp_tpu.eval.evaluators import F0LdEvaluator
    audio = gen_np_sinusoid(330.0, 0.5, SR, 2.0).astype(
        np.float32)[np.newaxis]
    from ddsp_tpu.ops import spectral
    n_frames, _ = spectral.get_framed_lengths(audio.shape[1], 2048,
                                              SR // FRAME_RATE, 'center')
    batch = {'audio': audio,
             'f0_hz': np.full((1, n_frames), 330.0, np.float32)}
    outputs = {'audio_synth': audio}
    ev = F0LdEvaluator(SR, FRAME_RATE, f0_estimator='yin')
    ev.evaluate(batch, outputs, losses={})
    results = ev.flush(step=0)
    assert results['metrics/f0_yin/raw_pitch_accuracy'] >= 0.9
    assert 'metrics/loudness/loudness_db_l1' in results
