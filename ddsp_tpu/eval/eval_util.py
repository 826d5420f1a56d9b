"""Evaluation / sampling loop (the train job's sidecar).

Reference behavior: /root/reference/ddsp/training/eval_util.py
(evaluate_or_sample:28): poll for new checkpoints, restore, run
num_batches through the model in eval mode, dispatch to evaluators, flush
scalar summaries.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional, Sequence

import jax
import numpy as np

from ddsp_tpu.eval.evaluators import BaseEvaluator, BasicEvaluator
from ddsp_tpu.eval.evaluators import F0LdEvaluator
from ddsp_tpu.train.train_loop import MetricsWriter

logger = logging.getLogger('ddsp_tpu')


def _latest_checkpoint_step(restore_dir: str) -> Optional[int]:
  """Latest orbax step directory in restore_dir, or None."""
  if not os.path.isdir(restore_dir):
    return None
  steps = []
  for name in os.listdir(restore_dir):
    if name.isdigit() and os.path.isdir(os.path.join(restore_dir, name)):
      steps.append(int(name))
  return max(steps) if steps else None


def checkpoints_iterator(restore_dir: str,
                         delay_secs: float = 10.0,
                         timeout_secs: Optional[float] = None,
                         run_once: bool = False):
  """Yield new checkpoint steps as they appear (filesystem polling)."""
  seen = set()
  start = time.time()
  while True:
    step = _latest_checkpoint_step(restore_dir)
    if step is not None and step not in seen:
      seen.add(step)
      yield step
      if run_once:
        return
      start = time.time()
    else:
      if run_once and step is None:
        logger.warning('No checkpoint found in %s', restore_dir)
        return
      if timeout_secs is not None and time.time() - start > timeout_secs:
        return
      time.sleep(delay_secs)


def evaluate_or_sample(data_provider,
                       trainer,
                       save_dir: str,
                       restore_dir: Optional[str] = None,
                       mode: str = 'eval',
                       evaluators: Optional[Sequence[BaseEvaluator]] = None,
                       batch_size: int = 4,
                       num_batches: int = 4,
                       ckpt_delay_secs: float = 10.0,
                       run_once: bool = True,
                       run_until_step: int = 0):
  """Run evaluation or sampling over checkpoints as they appear.

  Args:
    data_provider: DataProvider for eval batches.
    trainer: Trainer binding the model (provides init/restore/mesh).
    save_dir: Where to write summaries and samples.
    restore_dir: Checkpoint directory (defaults to save_dir).
    mode: 'eval' (metrics) or 'sample' (audio/image artifacts).
    evaluators: Evaluator instances; default [BasicEvaluator, F0LdEvaluator].
    batch_size: Eval batch size.
    num_batches: Batches per checkpoint.
    ckpt_delay_secs: Poll interval.
    run_once: Evaluate only the latest checkpoint then return.
    run_until_step: Stop when a checkpoint >= this step was evaluated.
  """
  restore_dir = restore_dir or save_dir
  if evaluators is None:
    evaluators = [
        BasicEvaluator(data_provider.sample_rate, data_provider.frame_rate),
        F0LdEvaluator(data_provider.sample_rate, data_provider.frame_rate),
    ]

  # Build state once from one batch (defines shapes for restore).
  iterator = data_provider.get_batch(batch_size, shuffle=False, repeats=-1)
  # A FIXED evaluation set: the same batches for every checkpoint, so the
  # metric curve reflects the model, not data drift.
  eval_batches = [next(iterator) for _ in range(num_batches)]
  first_batch = eval_batches[0]
  state = trainer.init(first_batch)
  writer = MetricsWriter(os.path.join(save_dir, mode))

  model = trainer.model
  # training=False (eval-mode network behavior); losses are still computed
  # because return_losses=True - a deliberate improvement over the
  # reference, whose eval losses are empty (autoencoder.py:67).
  # When the trainer's mesh time-shards, route through the same
  # sequence-parallel forward as training (sp_forward_with_losses): a
  # model trained at audio lengths needing N chips' memory can then also
  # be evaluated at that length (the dense forward would OOM one chip).
  from ddsp_tpu.parallel import mesh as mesh_lib  # pylint: disable=g-import-not-at-top
  from ddsp_tpu.parallel import sp_model  # pylint: disable=g-import-not-at-top
  mesh = getattr(trainer, 'mesh', None)
  use_sp = mesh is not None and sp_model.has_time_sharding(mesh)
  if use_sp:
    halo_impl = getattr(trainer, 'halo_impl', 'xla')
    apply_fn = jax.jit(
        lambda params, batch: model.apply(
            {'params': params}, batch, mesh=mesh, training=False,
            halo_impl=halo_impl,
            method=sp_model.sp_forward_with_losses,
            rngs={'noise': jax.random.PRNGKey(0)}))
    eval_batches = [mesh_lib.shard_batch(b, mesh) for b in eval_batches]
  else:
    apply_fn = jax.jit(
        lambda params, batch: model.apply(
            {'params': params}, batch, training=False, return_losses=True,
            rngs={'noise': jax.random.PRNGKey(0)}))

  for ckpt_step in checkpoints_iterator(restore_dir, ckpt_delay_secs,
                                        run_once=run_once):
    state = trainer.restore(state, restore_dir)
    step = int(jax.device_get(state.step))
    logger.info('Evaluating checkpoint at step %d.', step)

    for batch_idx, batch in enumerate(eval_batches):
      t0 = time.time()
      outputs, losses = apply_fn(state.params, batch)
      outputs = jax.device_get(outputs)
      losses = {k: float(v) for k, v in jax.device_get(losses).items()}
      logger.info('Predictions for batch %d/%d took %.2fs',
                  batch_idx + 1, num_batches, time.time() - t0)

      for evaluator in evaluators:
        if mode == 'eval':
          evaluator.evaluate(batch, outputs, losses)
        else:
          evaluator.sample(batch, outputs, save_dir, step)

    if mode == 'eval':
      scalars = {}
      for evaluator in evaluators:
        scalars.update(evaluator.flush(step))
      writer.scalars(step, scalars)

    if run_until_step and step >= run_until_step:
      break
  writer.close()
