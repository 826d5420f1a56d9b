"""The training loop.

Reference behavior: /root/reference/ddsp/training/train_util.py (train:212,
write_gin_config:171, get_latest_checkpoint:119): iterate batches, track
mean losses, log steps/sec, periodic checkpoints and summaries, early stop,
operative-spec artifact written at start.

TPU-native notes: loss scalars stay on-device between summary intervals so
the dispatch queue never blocks on a host transfer (a per-step device_get
would serialize the pipeline); jax.profiler trace capture is first-class
(`profile_dir`), covering steps [profile_start, profile_start+profile_steps).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Iterator, List, Optional

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
          report_loss_to_hypertune: bool = False,
          profile_dir: Optional[str] = None,
          profile_start: int = 10,
          profile_steps: int = 10,
          log_every_step: bool = False,
          prefetch: int = 2) -> TrainState:
  """Main training loop.

  Args:
    data_iterator: Iterator yielding feature-dict batches (host arrays).
    trainer: A Trainer binding model, optimizer, and mesh.
    num_steps: Total training steps.
    steps_per_summary: Interval for scalar summaries / steps-per-sec logs.
      Loss values only cross to the host at this interval (and at early-stop
      checks), keeping the device dispatch queue full.
    steps_per_save: Interval for checkpoints.
    save_dir: Where to write checkpoints/summaries; None disables saving.
    restore_dir: Where to restore from (defaults to save_dir).
    early_stop_loss_value: Stop early when total_loss <= this value
      (checked at summary intervals).
    report_loss_to_hypertune: Placeholder for cloud hypertune parity.
    profile_dir: Capture a jax.profiler trace (viewable in TensorBoard /
      Perfetto) into this directory.
    profile_start: First step of the trace window.
    profile_steps: Number of steps to trace.
    log_every_step: Log losses every step (forces per-step host sync; debug
      only - the reference's behavior).
    prefetch: Background host->device prefetch depth (0 disables); plays
      tf.data prefetch's role so the accelerator never waits on the host.

  Returns:
    The final TrainState.
  """
  if prefetch:
    from ddsp_tpu.data.prefetch import prefetch_to_device  # pylint: disable=g-import-not-at-top
    from ddsp_tpu.parallel.mesh import batch_sharding  # pylint: disable=g-import-not-at-top
    data_iterator = prefetch_to_device(
        data_iterator, size=prefetch,
        sharding=batch_sharding(trainer.mesh))
  try:
    batch = next(data_iterator)
    state = trainer.init(batch)
    logger.info('Trainer initialized: %d params.', trainer.param_count(state))

    restore_dir = restore_dir or save_dir
    if restore_dir and os.path.isdir(restore_dir):
      state = trainer.restore(state, restore_dir)
      if int(jax.device_get(state.step)) > 0:
        logger.info('Restored at step %d.', int(state.step))

    writer = MetricsWriter(save_dir) if save_dir else None

    # On-device loss accumulation between summaries: no host syncs inside
    # the hot loop.
    pending_losses: List[Dict[str, Any]] = []
    last_summary_time = time.time()
    last_summary_step = step = int(jax.device_get(state.step))
    profiling = False

    while step < num_steps:
      if profile_dir and step == profile_start and not profiling:
        jax.profiler.start_trace(profile_dir)
        profiling = True

      state, losses = trainer.train_step(state, batch)
      step += 1
      if step < num_steps:
        # Don't pull past the end: a finite iterator with exactly enough
        # batches would raise StopIteration here and skip the final save.
        try:
          batch = next(data_iterator)
        except StopIteration:
          logger.info('Data iterator exhausted at step %d.', step)
          pending_losses.append(losses)
          break
      pending_losses.append(losses)

      if profiling and step >= profile_start + profile_steps:
        jax.block_until_ready(losses)
        jax.profiler.stop_trace()
        profiling = False
        logger.info('Wrote profiler trace to %s', profile_dir)

      if log_every_step:
        host_losses = {k: float(v)
                       for k, v in jax.device_get(losses).items()}
        logger.info('step: %d\t%s', step, '\t'.join(
            f'{k}: {v:.2f}' for k, v in host_losses.items()))

      if step % steps_per_summary == 0 and pending_losses:
        # One batched transfer for the whole interval (a per-scalar
        # device_get would pay a blocking host round-trip per step).
        host = jax.device_get(pending_losses)
        mean_losses = {
            k: float(np.mean([h[k] for h in host])) for k in host[0]}
        elapsed = time.time() - last_summary_time
        steps_per_sec = (step - last_summary_step) / max(elapsed, 1e-9)
        logger.info('step: %d\tsteps/s: %.2f\t%s', step, steps_per_sec,
                    '\t'.join(f'{k}: {v:.2f}'
                              for k, v in mean_losses.items()))
        if writer:
          writer.scalars(step, dict(mean_losses,
                                    steps_per_sec=steps_per_sec))
        mean_total = float(mean_losses.get('total_loss', np.inf))
        pending_losses = []
        last_summary_time = time.time()
        last_summary_step = step

        # Reference semantics (train_util.py:313-318): stop on the interval
        # MEAN of the total loss, not a single noisy step.
        if (early_stop_loss_value is not None
            and mean_total <= early_stop_loss_value):
          logger.info('Total loss reached early stop value %s at step %d.',
                      early_stop_loss_value, step)
          break

      if save_dir and step % steps_per_save == 0:
        save_time = trainer.save(state, save_dir)
        logger.info('Saved checkpoint at step %d (%.2fs).', step, save_time)

    if profiling:
      jax.profiler.stop_trace()

    if save_dir:
      trainer.save(state, save_dir)
      if writer:
        writer.close()
    logger.info('Training finished at step %d.', step)
    return state
  finally:
    if prefetch:
      # Stop the producer thread and release its queued device
      # batches - on EVERY exit (normal, early-stop, exception).
      data_iterator.close()
