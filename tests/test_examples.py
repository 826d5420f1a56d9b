"""Smoke tests for the example scripts (tiny configs, in-process)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_pitch_detection_example(tmp_path):
  from examples import pitch_detection
  err = pitch_detection.main([
      '--steps', '2', '--batch_size', '2', '--n_samples', '4096',
      '--n_sinusoids', '8', '--n_harmonics', '8', '--platform', 'cpu',
      '--save_dir', str(tmp_path / 'pitch')])
  assert np.isfinite(err) and err >= 0.0  # finite metric, end to end


@pytest.mark.slow
def test_train_vst_example(tmp_path):
  from examples import train_vst
  rms = train_vst.main([
      '--steps', '2', '--stream_hops', '4', '--platform', 'cpu',
      '--save_dir', str(tmp_path / 'vst')])
  assert np.isfinite(rms) and rms >= 0.0


@pytest.mark.slow
def test_tutorial_synths_and_effects(tmp_path):
  from examples import tutorial_synths_and_effects
  rms = tutorial_synths_and_effects.main([
      '--seconds', '0.1', '--platform', 'cpu',
      '--save_dir', str(tmp_path / 'synths')])
  assert rms > 0.0
  assert (tmp_path / 'synths' / '1_chorus.wav').exists()


@pytest.mark.slow
def test_tutorial_processor_group(tmp_path):
  from examples import tutorial_processor_group
  rms = tutorial_processor_group.main([
      '--seconds', '0.1', '--platform', 'cpu',
      '--save_dir', str(tmp_path / 'pg')])
  assert rms > 0.0
  assert (tmp_path / 'pg' / 'rewired.wav').exists()


@pytest.mark.slow
def test_train_single_sound_example(tmp_path):
  from examples import train_single_sound
  rms = train_single_sound.main([
      '--steps', '2', '--seconds', '0.1', '--platform', 'cpu',
      '--save_dir', str(tmp_path / 'single')])
  assert np.isfinite(rms) and rms >= 0.0
  wavs = list((tmp_path / 'single').rglob('*.wav'))
  assert wavs, 'no resynthesis wav written'


@pytest.mark.slow
def test_train_long_audio_example():
  from examples import train_long_audio
  # Constraints: t_local >= the largest loss fft size (2048) and the LTV
  # filter frame size (64) must divide t_local -> 0.512 s over 2 shards
  # (4096 samples/shard).
  loss = train_long_audio.main([
      '--seconds', '0.512', '--time_shards', '2', '--data_shards', '1',
      '--steps', '2'])
  assert np.isfinite(loss) and loss > 0.0


@pytest.mark.slow
def test_timbre_transfer_example(tmp_path):
  """End-to-end demo path: train 2 steps -> extract features from a wav
  (YIN, no CREPE weights) -> resynthesize through the checkpoint."""
  from examples import timbre_transfer, train_single_sound
  from ddsp_tpu.eval import summaries

  model_dir = str(tmp_path / 'model')
  train_single_sound.main([
      '--steps', '2', '--seconds', '0.1', '--platform', 'cpu',
      '--save_dir', model_dir])

  sr = 16000
  t = np.arange(int(0.2 * sr)) / sr
  wav_in = str(tmp_path / 'in.wav')
  summaries.write_wav(wav_in, (0.4 * np.sin(2 * np.pi * 330 * t)
                               ).astype(np.float32), sr)
  out = str(tmp_path / 'out.wav')
  rms = timbre_transfer.main([
      '--input', wav_in, '--model_dir', model_dir, '--output', out,
      '--autotune', '0.5', '--platform', 'cpu'])
  assert np.isfinite(rms)
  import os
  assert os.path.exists(out)
