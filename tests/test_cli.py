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

  # Eval/sample without --preset/--model_kwargs: geometry and architecture
  # must come from the operative spec (not the CLI's --preset default).
  spec_only = ['--save_dir', save_dir, '--data', 'synthetic:4',
               '--batch_size', '2', '--n_devices', '1']
  r = _run(['--mode', 'eval', '--run_once', '--num_eval_batches', '1']
           + spec_only)
  assert r.returncode == 0, r.stderr[-2000:]
  # Pitch metrics must be REAL: with the repo's committed trained CREPE
  # asset the evaluator auto-selects 'crepe'; in a weights-free env it
  # falls back to YIN - either way RPA of the generated audio must be in
  # eval/metrics.jsonl.
  eval_metrics_file = os.path.join(save_dir, 'eval', 'metrics.jsonl')
  assert os.path.exists(eval_metrics_file)
  eval_metrics = json.loads(
      open(eval_metrics_file).read().strip().split('\n')[-1])
  assert ('metrics/f0_crepe/raw_pitch_accuracy' in eval_metrics or
          'metrics/f0_yin/raw_pitch_accuracy' in eval_metrics), eval_metrics
  assert 'metrics/loudness/loudness_db_l1' in eval_metrics

  r = _run(['--mode', 'sample', '--run_once', '--num_eval_batches', '1']
           + spec_only)
  assert r.returncode == 0, r.stderr[-2000:]
  samples = []
  for root, _, files in os.walk(save_dir):
    samples += [f for f in files if f.endswith('.wav')]
  assert samples, 'no sample wavs written'


def test_multihost_flag_calls_distributed_initialize(tmp_path, monkeypatch):
  """--multihost must initialize jax.distributed before any device use
  (in-process, with the initializer mocked: no real cluster here)."""
  import jax
  from ddsp_tpu import run as run_mod

  events = []
  monkeypatch.setattr(jax.distributed, 'initialize',
                      lambda *a, **k: events.append('dist_init'))
  real_devices = jax.devices
  monkeypatch.setattr(jax, 'devices',
                      lambda *a, **k: (events.append('devices'),
                                       real_devices(*a, **k))[1])
  save_dir = str(tmp_path / 'mh_run')
  run_mod.main([
      '--mode', 'train', '--multihost', '--platform', 'cpu',
      '--save_dir', save_dir, '--data', 'synthetic:2',
      '--preset', 'tiny',
      '--model_kwargs', json.dumps(dict(
          n_samples=4000, time_steps=50, n_harmonics=6,
          n_noise_magnitudes=9, reverb_length=500)),
      '--batch_size', '2', '--n_devices', '1', '--num_steps', '2',
      '--steps_per_save', '2', '--steps_per_summary', '2',
  ])
  assert events.count('dist_init') == 1
  # The invariant: distributed init happens BEFORE any device query (on a
  # real pod, initializing after backend init fails).
  assert 'devices' in events
  assert events.index('dist_init') < events.index('devices')
  assert os.path.exists(os.path.join(save_dir, 'operative_spec.json'))


def test_unknown_data_spec_raises():
  from ddsp_tpu.run import build_data_provider
  with pytest.raises(ValueError, match='Unknown data spec'):
    build_data_provider('bogus:thing', 64000, 16000, 250)


def test_eval_reconstructs_model_from_spec(tmp_path, monkeypatch):
  """--mode=eval rebuilds the exact architecture from the operative spec
  written at train time (the reference's operative-gin round trip)."""
  from ddsp_tpu import run as run_mod

  save_dir = str(tmp_path / 'spec_run')
  kwargs = dict(n_samples=4000, time_steps=50, n_harmonics=6,
                n_noise_magnitudes=9, reverb_length=500)
  run_mod.main([
      '--mode', 'train', '--platform', 'cpu',
      '--save_dir', save_dir, '--data', 'synthetic:2',
      '--preset', 'tiny', '--model_kwargs', json.dumps(kwargs),
      '--batch_size', '2', '--n_devices', '1', '--num_steps', '2',
      '--steps_per_save', '2', '--steps_per_summary', '2',
  ])
  # Eval with NO model_kwargs: everything must come from the spec.
  run_mod.main([
      '--mode', 'eval', '--platform', 'cpu', '--run_once',
      '--save_dir', save_dir, '--data', 'synthetic:2',
      '--preset', 'tiny', '--batch_size', '2', '--n_devices', '1',
      '--num_eval_batches', '1',
  ])
  assert os.path.exists(os.path.join(save_dir, 'metrics.jsonl'))


@pytest.mark.slow
def test_train_time_sharded(tmp_path):
  """--time_shards trains the flagship preset on a (data, time) mesh."""
  save_dir = str(tmp_path / 'sp_run')
  r = _run(['--mode', 'train', '--num_steps', '2', '--steps_per_save', '2',
            '--steps_per_summary', '2',
            '--save_dir', save_dir, '--data', 'synthetic:4',
            '--preset', 'tiny',
            '--model_kwargs', json.dumps(dict(
                n_samples=16384, time_steps=128, n_harmonics=8,
                n_noise_magnitudes=9, reverb_length=3000)),
            '--batch_size', '2', '--time_shards', '4', '--n_devices', '8'])
  assert r.returncode == 0, r.stderr[-2000:]
  assert os.path.exists(os.path.join(save_dir, 'metrics.jsonl'))
  with open(os.path.join(save_dir, 'metrics.jsonl')) as f:
    lines = [json.loads(l) for l in f if l.strip()]
  assert lines and any('total_loss' in l for l in lines)


@pytest.mark.slow
def test_train_time_sharded_pallas_halo(tmp_path):
  """--halo_impl pallas trains on a time-sharded mesh (interpret mode on
  CPU; chip-to-chip RDMA on a real multi-chip slice)."""
  save_dir = str(tmp_path / 'sp_pallas_run')
  r = _run(['--mode', 'train', '--num_steps', '2', '--steps_per_save', '2',
            '--steps_per_summary', '2',
            '--save_dir', save_dir, '--data', 'synthetic:4',
            '--preset', 'tiny',
            '--model_kwargs', json.dumps(dict(
                n_samples=16384, time_steps=128, n_harmonics=8,
                n_noise_magnitudes=9, reverb_length=3000)),
            '--batch_size', '2', '--time_shards', '4', '--n_devices', '4',
            '--halo_impl', 'pallas'])
  assert r.returncode == 0, r.stderr[-2000:]
  with open(os.path.join(save_dir, 'metrics.jsonl')) as f:
    lines = [json.loads(l) for l in f if l.strip()]
  assert lines and any('total_loss' in l for l in lines)
