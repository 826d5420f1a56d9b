"""Evaluation metrics (numpy-side, outside the jit path).

Reference behavior: /root/reference/ddsp/training/metrics.py
(compute_audio_features:58, f0_dist_conf_thresh:74, LoudnessMetrics:173,
F0Metrics:281). mir_eval is not available in this environment, so raw/chroma
pitch accuracy are computed directly (50-cent tolerance, same definition
mir_eval.melody uses).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import numpy as np

from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops import spectral

logger = logging.getLogger('ddsp_tpu')

MIN_F0_CONFIDENCE = 0.85
OUTLIER_MIDI_THRESH = 12


def compute_audio_features(audio: np.ndarray,
                           n_fft: int = 512,
                           sample_rate: int = 16000,
                           frame_rate: int = 250) -> Dict[str, np.ndarray]:
  """Compute loudness (and hooks for f0) features of audio."""
  audio = np.asarray(audio)
  if audio.ndim == 1:
    audio = audio[np.newaxis, :]
  loudness_db = np.asarray(spectral.compute_loudness(
      audio, sample_rate=sample_rate, frame_rate=frame_rate, n_fft=n_fft))
  return {'audio': audio, 'loudness_db': loudness_db}


def l1_distance(prediction: np.ndarray, ground_truth: np.ndarray):
  """L1 distance, trimming to the shorter length."""
  prediction, ground_truth = np.asarray(prediction), np.asarray(ground_truth)
  min_length = min(prediction.shape[-1], ground_truth.shape[-1])
  return np.abs(prediction[..., :min_length] - ground_truth[..., :min_length])


def f0_dist_conf_thresh(f0_hz: np.ndarray,
                        f0_hz_gen: np.ndarray,
                        f0_confidence: Optional[np.ndarray] = None,
                        f0_confidence_thresh: float = MIN_F0_CONFIDENCE):
  """L1 MIDI distance between f0s, masked by confidence; None if outlier.

  Reference metrics.py:74-118: examples whose mean distance exceeds 12 MIDI
  or with no confident frames are treated as outliers.
  """
  f0_hz = np.asarray(f0_hz).squeeze()
  f0_hz_gen = np.asarray(f0_hz_gen).squeeze()
  if f0_confidence is None:
    f0_confidence = np.ones_like(f0_hz)
  else:
    f0_confidence = np.asarray(f0_confidence).squeeze()

  if np.max(f0_confidence) < f0_confidence_thresh:
    return None

  f0_midi = np.asarray(ops_core.hz_to_midi(f0_hz))
  f0_midi_gen = np.asarray(ops_core.hz_to_midi(f0_hz_gen))
  freq_dist = l1_distance(f0_midi_gen, f0_midi)
  mask = (f0_confidence[..., :freq_dist.shape[-1]]
          >= f0_confidence_thresh).astype(np.float32)
  freq_dist = np.sum(freq_dist * mask) / max(np.sum(mask), 1e-8)
  if freq_dist > OUTLIER_MIDI_THRESH:
    return None
  return float(freq_dist)


def _cents_diff(f0_ref: np.ndarray, f0_est: np.ndarray) -> np.ndarray:
  ref = np.maximum(np.asarray(f0_ref, np.float64), 1e-8)
  est = np.maximum(np.asarray(f0_est, np.float64), 1e-8)
  return 1200.0 * np.log2(est / ref)


def raw_pitch_accuracy(f0_ref, f0_est, voicing, cent_tolerance=50.0):
  """Fraction of voiced frames within cent_tolerance (mir_eval definition)."""
  voicing = np.asarray(voicing, bool)
  if voicing.sum() == 0:
    return 0.0
  diff = np.abs(_cents_diff(f0_ref, f0_est))
  return float(np.mean(diff[voicing] <= cent_tolerance))


def raw_chroma_accuracy(f0_ref, f0_est, voicing, cent_tolerance=50.0):
  """Like RPA but octave errors are forgiven."""
  voicing = np.asarray(voicing, bool)
  if voicing.sum() == 0:
    return 0.0
  diff = _cents_diff(f0_ref, f0_est)
  diff = np.abs(diff - 1200.0 * np.round(diff / 1200.0))
  return float(np.mean(diff[voicing] <= cent_tolerance))


class BaseMetrics:
  """Base object for computing metrics on generated audio samples."""

  def __init__(self, sample_rate: int, frame_rate: int, name: str):
    self._sample_rate = sample_rate
    self._frame_rate = frame_rate
    self._name = name
    self._metrics: Dict[str, list] = {}

  @property
  def metrics(self):
    return self._metrics

  def _add(self, key: str, value: float):
    self._metrics.setdefault(key, []).append(float(value))

  def update_state(self, batch, audio_gen):
    raise NotImplementedError

  def flush(self, step: int) -> Dict[str, float]:
    """Return mean metrics and reset accumulators."""
    results = {f'metrics/{self._name}/{k}': float(np.mean(v))
               for k, v in self._metrics.items() if v}
    for k, v in results.items():
      logger.info('step %d %s = %.4f', step, k, v)
    self._metrics = {}
    return results


class LoudnessMetrics(BaseMetrics):
  """Mean L1 loudness difference in dB between real and generated audio."""

  def __init__(self, sample_rate=16000, frame_rate=250, name='loudness'):
    super().__init__(sample_rate, frame_rate, name)

  def update_state(self, batch: Dict[str, Any], audio_gen: np.ndarray):
    if 'loudness_db' in batch:
      loudness_original = np.asarray(batch['loudness_db'])
    else:
      loudness_original = np.asarray(spectral.compute_loudness(
          np.asarray(batch['audio']), sample_rate=self._sample_rate,
          frame_rate=self._frame_rate))
    loudness_gen = np.asarray(spectral.compute_loudness(
        np.asarray(audio_gen), sample_rate=self._sample_rate,
        frame_rate=self._frame_rate))
    ld_dist = float(np.mean(l1_distance(loudness_original, loudness_gen)))
    self._add('loudness_db_l1', ld_dist)


class F0Metrics(BaseMetrics):
  """F0 metrics against resynthesized f0 (reference F0Metrics:281).

  Compares ground-truth f0 against the f0 the model used for synthesis
  (available in outputs), with RPA/RCA at 50-cent tolerance and mean L1
  MIDI distance.
  """

  def __init__(self, sample_rate=16000, frame_rate=250, rpa_tolerance=50.0,
               name='f0'):
    super().__init__(sample_rate, frame_rate, name)
    self._rpa_tolerance = rpa_tolerance

  def update_state(self, batch: Dict[str, Any], f0_hz_predict: np.ndarray):
    f0_ref = np.asarray(batch['f0_hz']).squeeze()
    f0_est = np.asarray(f0_hz_predict).squeeze()
    if f0_ref.ndim == 1:
      f0_ref, f0_est = f0_ref[np.newaxis], f0_est[np.newaxis]
    conf = batch.get('f0_confidence')
    for i in range(f0_ref.shape[0]):
      ref = f0_ref[i]
      n = min(len(ref), f0_est[i].shape[-1])
      ref, est = ref[:n], f0_est[i][:n]
      voicing = ref > 0
      self._add('raw_pitch_accuracy',
                raw_pitch_accuracy(ref, est, voicing, self._rpa_tolerance))
      self._add('raw_chroma_accuracy',
                raw_chroma_accuracy(ref, est, voicing, self._rpa_tolerance))
      conf_i = np.asarray(conf)[i][:n] if conf is not None else None
      dist = f0_dist_conf_thresh(ref, est, conf_i)
      if dist is not None:
        self._add('f0_dist_midi_l1', dist)
