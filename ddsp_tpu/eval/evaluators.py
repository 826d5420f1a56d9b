"""Evaluator classes dispatched by the eval loop.

Reference behavior: /root/reference/ddsp/training/evaluators.py
(BaseEvaluator:25, BasicEvaluator:52, F0LdEvaluator:95).
"""

from __future__ import annotations

import logging
from typing import Any, Dict

import numpy as np

from ddsp_tpu.eval import metrics as metrics_lib
from ddsp_tpu.eval import summaries

logger = logging.getLogger('ddsp_tpu')


class BaseEvaluator:
  """Base class for evaluators: evaluate() metrics, sample() artifacts."""

  def __init__(self, sample_rate: int = 16000, frame_rate: int = 250):
    self._sample_rate = sample_rate
    self._frame_rate = frame_rate

  def evaluate(self, batch: Dict[str, Any], outputs: Dict[str, Any],
               losses: Dict[str, float]):
    """Accumulate metrics for one batch."""

  def sample(self, batch: Dict[str, Any], outputs: Dict[str, Any],
             save_dir: str, step: int):
    """Write sample artifacts for one batch."""

  def flush(self, step: int) -> Dict[str, float]:
    """Aggregate, log, and reset; returns scalars."""
    return {}


class BasicEvaluator(BaseEvaluator):
  """Mean losses + audio sample artifacts."""

  def __init__(self, sample_rate=16000, frame_rate=250):
    super().__init__(sample_rate, frame_rate)
    self._loss_sums: Dict[str, list] = {}

  def evaluate(self, batch, outputs, losses):
    for k, v in losses.items():
      self._loss_sums.setdefault(k, []).append(float(v))

  def sample(self, batch, outputs, save_dir, step):
    audio_gen = np.asarray(outputs['audio_synth'])
    summaries.sample_batch(save_dir, step, batch, audio_gen,
                           self._sample_rate)

  def flush(self, step):
    results = {f'losses/{k}': float(np.mean(v))
               for k, v in self._loss_sums.items() if v}
    for k, v in results.items():
      logger.info('step %d %s = %.4f', step, k, v)
    self._loss_sums = {}
    return results


class F0LdEvaluator(BaseEvaluator):
  """Loudness and f0 metrics (reference F0LdEvaluator:95)."""

  def __init__(self, sample_rate=16000, frame_rate=250,
               run_f0_crepe: bool = False):
    super().__init__(sample_rate, frame_rate)
    self._loudness_metrics = metrics_lib.LoudnessMetrics(
        sample_rate, frame_rate)
    self._f0_metrics = metrics_lib.F0Metrics(sample_rate, frame_rate)
    self._run_f0_crepe = run_f0_crepe  # CREPE port pending.

  def evaluate(self, batch, outputs, losses):
    audio_gen = np.asarray(outputs['audio_synth'])
    self._loudness_metrics.update_state(batch, audio_gen)
    # f0 the model synthesized with, when the DAG exposes it.
    f0_synth = None
    if 'harmonic' in outputs:
      controls = outputs['harmonic'].get('controls', {})
      f0_synth = controls.get('f0_hz')
    if f0_synth is not None and 'f0_hz' in batch:
      self._f0_metrics.update_state(batch, np.asarray(f0_synth))

  def flush(self, step):
    results = {}
    results.update(self._loudness_metrics.flush(step))
    results.update(self._f0_metrics.flush(step))
    return results
