"""System test for the CLI: train -> eval -> sample round trip."""

import json
import os
import subprocess
import sys

import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
  env = dict(os.environ, JAX_PLATFORMS='cpu', PYTHONPATH=REPO)
  return subprocess.run(
      [sys.executable, '-m', 'ddsp_tpu.run', '--platform', 'cpu'] + args,
      cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)


@pytest.mark.slow
def test_train_eval_sample_round_trip(tmp_path):
  save_dir = str(tmp_path / 'run')
  common = [
      '--save_dir', save_dir, '--data', 'synthetic:4',
      '--preset', 'tiny',
      '--model_kwargs', json.dumps(dict(
          n_samples=4000, time_steps=50, n_harmonics=10,
          n_noise_magnitudes=9, reverb_length=1000)),
      '--batch_size', '2', '--n_devices', '1',
  ]
  r = _run(['--mode', 'train', '--num_steps', '3',
            '--steps_per_save', '3', '--steps_per_summary', '3'] + common)
  assert r.returncode == 0, r.stderr[-2000:]
  assert os.path.exists(os.path.join(save_dir, 'operative_spec.json'))
  assert os.path.exists(os.path.join(save_dir, 'metrics.jsonl'))

  r = _run(['--mode', 'eval', '--run_once', '--num_eval_batches', '1']
           + common)
  assert r.returncode == 0, r.stderr[-2000:]

  r = _run(['--mode', 'sample', '--run_once', '--num_eval_batches', '1']
           + common)
  assert r.returncode == 0, r.stderr[-2000:]
  samples = []
  for root, _, files in os.walk(save_dir):
    samples += [f for f in files if f.endswith('.wav')]
  assert samples, 'no sample wavs written'
