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
