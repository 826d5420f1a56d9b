"""The training loop.

Reference behavior: /root/reference/ddsp/training/train_util.py (train:212,
write_gin_config:171, get_latest_checkpoint:119): iterate batches, track
mean losses, log steps/sec, periodic checkpoints and summaries, early stop,
operative-spec artifact written at start.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np

from ddsp_tpu.train.trainer import Trainer, TrainState

logger = logging.getLogger('ddsp_tpu')


class MetricsWriter:
  """Scalar metrics -> JSONL file (+ optional TensorBoard if available)."""

  def __init__(self, log_dir: str, use_tensorboard: bool = True):
    os.makedirs(log_dir, exist_ok=True)
    self._path = os.path.join(log_dir, 'metrics.jsonl')
    self._file = open(self._path, 'a')
    self._tb = None
    if use_tensorboard:
      try:
        import tensorflow as tf  # pylint: disable=g-import-not-at-top
        self._tb = tf.summary.create_file_writer(log_dir)
      except Exception:  # pylint: disable=broad-except
        self._tb = None

  def scalars(self, step: int, values: Dict[str, float]):
    record = {'step': int(step)}
    record.update({k: float(v) for k, v in values.items()})
    self._file.write(json.dumps(record) + '\n')
    self._file.flush()
    if self._tb is not None:
      import tensorflow as tf  # pylint: disable=g-import-not-at-top
      with self._tb.as_default():
        for k, v in values.items():
          tf.summary.scalar(k, float(v), step=int(step))

  def close(self):
    self._file.close()


def train(data_iterator: Iterator[Dict[str, Any]],
          trainer: Trainer,
          num_steps: int = 1000000,
          steps_per_summary: int = 300,
          steps_per_save: int = 300,
          save_dir: Optional[str] = None,
          restore_dir: Optional[str] = None,
          early_stop_loss_value: Optional[float] = None,
          report_loss_to_hypertune: bool = False) -> TrainState:
  """Main training loop.

  Args:
    data_iterator: Iterator yielding feature-dict batches (host arrays).
    trainer: A Trainer binding model, optimizer, and mesh.
    num_steps: Total training steps.
    steps_per_summary: Interval for scalar summaries / steps-per-sec logs.
    steps_per_save: Interval for checkpoints.
    save_dir: Where to write checkpoints/summaries; None disables saving.
    restore_dir: Where to restore from (defaults to save_dir).
    early_stop_loss_value: Stop early when total_loss <= this value.
    report_loss_to_hypertune: Placeholder for cloud hypertune parity.

  Returns:
    The final TrainState.
  """
  batch = next(data_iterator)
  state = trainer.init(batch)
  logger.info('Trainer initialized: %d params.', trainer.param_count(state))

  restore_dir = restore_dir or save_dir
  if restore_dir and os.path.isdir(restore_dir):
    state = trainer.restore(state, restore_dir)
    if int(jax.device_get(state.step)) > 0:
      logger.info('Restored at step %d.', int(state.step))

  writer = MetricsWriter(save_dir) if save_dir else None

  loss_sums: Dict[str, float] = {}
  loss_counts = 0
  last_summary_time = time.time()
  step = int(jax.device_get(state.step))

  while step < num_steps:
    state, losses = trainer.train_step(state, batch)
    batch = next(data_iterator)
    step += 1

    losses = {k: float(v) for k, v in jax.device_get(losses).items()}
    for k, v in losses.items():
      loss_sums[k] = loss_sums.get(k, 0.0) + v
    loss_counts += 1

    log_str = f'step: {step}\t' + '\t'.join(
        f'{k}: {v:.2f}' for k, v in losses.items())
    logger.info(log_str)

    if step % steps_per_summary == 0 and loss_counts:
      mean_losses = {k: v / loss_counts for k, v in loss_sums.items()}
      elapsed = time.time() - last_summary_time
      steps_per_sec = steps_per_summary / max(elapsed, 1e-9)
      if writer:
        writer.scalars(step, dict(mean_losses,
                                  steps_per_sec=steps_per_sec))
      loss_sums, loss_counts = {}, 0
      last_summary_time = time.time()

    if save_dir and step % steps_per_save == 0:
      save_time = trainer.save(state, save_dir)
      logger.info('Saved checkpoint at step %d (%.2fs).', step, save_time)

    if (early_stop_loss_value is not None
        and losses.get('total_loss', np.inf) <= early_stop_loss_value):
      logger.info('Total loss reached early stop value %s at step %d.',
                  early_stop_loss_value, step)
      break

  if save_dir:
    trainer.save(state, save_dir)
    if writer:
      writer.close()
  logger.info('Training finished at step %d.', step)
  return state
