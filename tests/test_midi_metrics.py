"""Tests for MIDI transcription metrics and the extended evaluators."""

import numpy as np
import pytest

from ddsp_tpu.eval import evaluators, metrics
from ddsp_tpu.eval.heuristics import Note, NoteSequence


def _seq(notes):
  return NoteSequence(notes=[Note(pitch=p, start_time=s, end_time=e)
                             for p, s, e in notes],
                      total_time=max(e for _, _, e in notes))


class TestMatchNotes:

  def test_exact_match(self):
    intervals = np.array([[0.0, 1.0], [1.5, 2.0]])
    pitches = np.array([220.0, 440.0])
    matches = metrics.match_notes(intervals, pitches, intervals, pitches)
    assert len(matches) == 2

  def test_onset_tolerance(self):
    ref = np.array([[0.0, 1.0]])
    est_close = np.array([[0.04, 1.0]])
    est_far = np.array([[0.2, 1.0]])
    p = np.array([220.0])
    assert len(metrics.match_notes(ref, p, est_close, p,
                                   offset_ratio=None)) == 1
    assert len(metrics.match_notes(ref, p, est_far, p,
                                   offset_ratio=None)) == 0

  def test_pitch_tolerance(self):
    iv = np.array([[0.0, 1.0]])
    ref_p = np.array([220.0])
    est_close = np.array([220.0 * 2**(30 / 1200)])  # 30 cents
    est_far = np.array([220.0 * 2**(80 / 1200)])  # 80 cents
    assert len(metrics.match_notes(iv, ref_p, iv, est_close)) == 1
    assert len(metrics.match_notes(iv, ref_p, iv, est_far)) == 0

  def test_offset_matching(self):
    ref = np.array([[0.0, 1.0]])
    est_bad_offset = np.array([[0.0, 2.0]])
    p = np.array([220.0])
    # Fails with offsets, matches onset-only.
    assert len(metrics.match_notes(ref, p, est_bad_offset, p)) == 0
    assert len(metrics.match_notes(ref, p, est_bad_offset, p,
                                   offset_ratio=None)) == 1

  def test_one_to_one(self):
    # Two estimated notes near one reference: only one can match.
    ref = np.array([[0.0, 1.0]])
    est = np.array([[0.0, 1.0], [0.01, 1.0]])
    p1 = np.array([220.0])
    p2 = np.array([220.0, 220.0])
    assert len(metrics.match_notes(ref, p1, est, p2)) == 1


class TestEvalCounts:

  def test_prf(self):
    c = metrics.EvalCounts(tp=3, fp=1, fn=2)
    assert c.precision == 0.75
    assert c.recall == 0.6
    np.testing.assert_allclose(c.f1, 2 * .75 * .6 / (0.75 + 0.6))


class TestPianorollConversion:

  def test_round_trip(self):
    seq = _seq([(60, 0.0, 0.5), (64, 0.6, 1.0)])
    roll = metrics.note_sequence_to_pianoroll(seq, frames_per_second=100)
    assert roll.shape == (100, 128)
    seq2 = metrics.pianoroll_to_note_sequence(roll, frames_per_second=100)
    assert len(seq2.notes) == 2
    assert sorted(n.pitch for n in seq2.notes) == [60, 64]
    np.testing.assert_allclose(seq2.notes[0].start_time, 0.0, atol=0.02)
    np.testing.assert_allclose(seq2.notes[1].end_time, 1.0, atol=0.02)


class TestMidiMetrics:

  def test_perfect_prediction(self):
    frame_rate = 100
    seq = _seq([(60, 0.0, 0.5), (64, 0.6, 1.0)])
    roll = metrics.note_sequence_to_pianoroll(seq, frame_rate)
    mm = metrics.MidiMetrics(frames_per_second=frame_rate, tag='test',
                             align_midi_with_f0=False)
    mm.update_state({'note_active_velocities': roll[None]}, [seq])
    results = mm.flush(step=0)
    assert results['metrics/midi/test/onset/f1'] == 1.0
    assert results['metrics/midi/test/frame/f1'] == 1.0

  def test_missed_note(self):
    frame_rate = 100
    gt = _seq([(60, 0.0, 0.5), (64, 0.6, 1.0)])
    pred = _seq([(60, 0.0, 0.5)])
    roll = metrics.note_sequence_to_pianoroll(gt, frame_rate)
    mm = metrics.MidiMetrics(frames_per_second=frame_rate, tag='t',
                             align_midi_with_f0=False)
    mm.update_state({'note_active_velocities': roll[None]}, [pred])
    results = mm.flush(step=0)
    assert results['metrics/midi/t/onset/recall'] == 0.5
    assert results['metrics/midi/t/onset/precision'] == 1.0


class TestEvaluators:

  def test_midi_heuristic_evaluator(self):
    frame_rate = 250
    t = 500
    f0 = np.full((1, t, 1), 220.0, np.float32)
    amps = (0.5 + 0.01 * np.sin(np.arange(t))).reshape(1, t, 1)
    roll = np.zeros((1, t, 128), np.float32)
    roll[0, :, 57] = 1.0
    outputs = {
        'f0_hz': f0,
        'note_active_velocities': roll,
        'harmonic': {'controls': {
            'amplitudes': amps.astype(np.float32)}},
    }
    ev = evaluators.MidiHeuristicEvaluator(frame_rate=frame_rate)
    ev.evaluate({}, outputs, {})
    results = ev.flush(step=0)
    assert results['metrics/midi/heuristic/frame/f1'] > 0.9

  def test_midi_autoencoder_evaluator(self):
    frame_rate = 250
    t = 500
    roll = np.zeros((1, t, 128), np.float32)
    roll[0, 100:400, 57] = 1.0
    outputs = {
        'pianoroll': roll,
        'note_active_velocities': roll,
        'f0_hz': np.full((1, t, 1), 220.0, np.float32),
    }
    ev = evaluators.MidiAutoencoderEvaluator(frame_rate=frame_rate)
    ev.evaluate({}, outputs, {})
    results = ev.flush(step=0)
    assert results['metrics/midi/learned/frame/f1'] == 1.0

  def test_twm_evaluator(self):
    t, k = 20, 8
    n = np.arange(1, k + 1, dtype=np.float32)
    freqs = np.tile(220.0 * n, (1, t, 1)).reshape(1, t, k)
    amps = np.tile(1.0 / n, (1, t, 1)).reshape(1, t, k)
    outputs = {'sinusoidal': {'controls': {
        'frequencies': freqs, 'amplitudes': amps}}}
    batch = {'f0_hz': np.full((1, t), 220.0, np.float32),
             'f0_confidence': np.ones((1, t), np.float32)}
    ev = evaluators.TWMEvaluator(frame_rate=250)
    ev.evaluate(batch, outputs, {})
    results = ev.flush(step=0)
    # TWM picks 220 among the partials -> near-zero distance, high RPA.
    key = [k for k in results if 'raw_pitch_accuracy' in k]
    assert key and results[key[0]] > 0.9


class TestMidiAESummaries:

  def _outputs(self, t=100, k=8, m=5):
    rng = np.random.RandomState(0)
    return {
        'q_pitch': np.full((1, t, 1), 57.0, np.float32),
        'q_vel': np.full((1, t, 1), 4.0, np.float32),
        'f0_midi_pred': np.full((1, t, 1), 57.2, np.float32),
        'z_pitch': np.full((1, t, 1), 56.9, np.float32),
        'amps': rng.rand(1, t, 1).astype(np.float32),
        'hd': rng.rand(1, t, k).astype(np.float32),
        'noise': rng.rand(1, t, m).astype(np.float32),
        'amps_pred': rng.rand(1, t, 1).astype(np.float32),
        'hd_pred': rng.rand(1, t, k).astype(np.float32),
        'noise_pred': rng.rand(1, t, m).astype(np.float32),
        'loudness_db_pred': np.full((1, t, 1), -30.0, np.float32),
    }

  def test_summary_artifacts(self, tmp_path):
    pytest.importorskip('matplotlib')
    from ddsp_tpu.eval import summaries
    out = str(tmp_path)
    outputs = self._outputs()
    f0_hz = np.full((1, 100, 1), 220.0, np.float32)
    ld = np.full((1, 100, 1), -35.0, np.float32)
    summaries.midiae_f0_summary(out, f0_hz, outputs)
    summaries.midiae_ld_summary(out, ld, outputs)
    summaries.midiae_sp_summary(out, outputs)
    import os
    for name in ['0_midiae_f0.png', '0_midiae_ld.png', '0_midiae_amps.png',
                 '0_midiae_hd.png', '0_midiae_noise.png']:
      assert os.path.exists(os.path.join(out, name)), name

  def test_evaluator_sample_writes_plots(self, tmp_path):
    pytest.importorskip('matplotlib')
    import os
    t = 100
    outputs = self._outputs(t=t)
    outputs['pianoroll'] = np.zeros((1, t, 128), np.float32)
    outputs['synth_audio'] = np.zeros((1, 4000), np.float32)
    batch = {'audio': np.zeros((1, 4000), np.float32),
             'f0_hz': np.full((1, t, 1), 220.0, np.float32),
             'loudness_db': np.full((1, t, 1), -35.0, np.float32)}
    ev = evaluators.MidiAutoencoderEvaluator(frame_rate=25)
    ev.sample(batch, outputs, str(tmp_path), step=3)
    out_dir = os.path.join(str(tmp_path), 'samples', 'step_3')
    assert os.path.exists(os.path.join(out_dir, '0_midiae_f0.png'))
    assert os.path.exists(os.path.join(out_dir, '0_midiae_hd.png'))
