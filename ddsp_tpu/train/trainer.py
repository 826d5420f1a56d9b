"""Trainer: optimizer, sharded train step, checkpointing.

Reference behavior: /root/reference/ddsp/training/trainers.py (Trainer:26,
Adam + ExponentialDecay lr 3e-4/0.98/10k:63, step_fn with
clip_by_global_norm(3.0):163, psum of loss scalars:131-160, ckpt
save/restore:66-124).

TPU-native design: one jitted train step over a jax.sharding.Mesh - batch
sharded on the 'data' axis, params replicated; XLA inserts the gradient
all-reduce (the reference's psum) automatically. Buffers are donated so
optimizer state updates in place in HBM.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ddsp_tpu.parallel import mesh as mesh_lib

Array = jax.Array


@flax.struct.dataclass
class TrainState:
  """Replicated training state: step, params, optimizer state."""

  step: Array
  params: Any
  opt_state: Any


class Trainer:
  """Class to bind a model, optimizer, mesh, and train step function.

  Attributes:
    model: A ddsp_tpu Model (flax module).
    mesh: jax.sharding.Mesh with a 'data' axis; defaults to all devices.
    learning_rate / lr_decay_steps / lr_decay_rate: Adam with exponential
      decay (reference defaults 3e-4, 10k, 0.98).
    grad_clip_norm: Global-norm gradient clipping (reference 3.0).
  """

  def __init__(self,
               model,
               mesh=None,
               learning_rate: float = 3e-4,
               lr_decay_steps: int = 10000,
               lr_decay_rate: float = 0.98,
               grad_clip_norm: float = 3.0,
               checkpoints_to_keep: int = 100,
               seed: int = 0,
               halo_impl: str = 'xla'):
    """halo_impl: 'xla' (ppermute collectives) or 'pallas' (in-kernel ICI
    RDMA, parallel/pallas_halo.py) for the time-sharded kernels' neighbor
    exchanges. Only meaningful when the mesh time-shards."""
    if halo_impl not in ('xla', 'pallas'):
      raise ValueError(f"halo_impl must be 'xla' or 'pallas', "
                       f'got {halo_impl!r}')
    self.model = model
    self.mesh = mesh if mesh is not None else mesh_lib.create_mesh()
    self.halo_impl = halo_impl
    self.checkpoints_to_keep = checkpoints_to_keep
    self.seed = seed

    self.lr_schedule = optax.exponential_decay(
        init_value=learning_rate,
        transition_steps=lr_decay_steps,
        decay_rate=lr_decay_rate)
    self.optimizer = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adam(self.lr_schedule))

    self._jit_step = None
    self._ckpt_mgr = None

  # ----------------------------------------------------------------------
  # Build / init
  # ----------------------------------------------------------------------
  def init(self, batch: Dict[str, Any]) -> TrainState:
    """Initialize parameters and optimizer state from one example batch.

    When the mesh time-shards, initialization runs through the same
    sequence-parallel program as the train step (sp_forward_with_losses),
    jitted with the batch audio sharded over ('data', 'time') - so param
    creation never materializes an unsharded [batch, n_samples]-scale
    intermediate on one chip. Audio lengths that need N chips' memory to
    train therefore also initialize (and the param tree is identical:
    both paths reach every setup()-created param).
    """
    rngs = {'params': jax.random.PRNGKey(self.seed),
            'noise': jax.random.PRNGKey(self.seed + 1)}
    from ddsp_tpu.parallel import sp_model  # pylint: disable=g-import-not-at-top
    if sp_model.has_time_sharding(self.mesh):
      model, mesh = self.model, self.mesh
      halo_impl = self.halo_impl
      sharded = mesh_lib.shard_batch(batch, mesh)

      def init_fn(b):
        if halo_impl == 'pallas':
          from ddsp_tpu.parallel import pallas_halo  # pylint: disable=g-import-not-at-top
          pallas_halo.reset_collective_id_counter()  # trace-time
        return model.init(rngs, b, mesh=mesh, training=True,
                          halo_impl=halo_impl,
                          method=sp_model.sp_forward_with_losses)

      variables = jax.jit(
          init_fn,
          out_shardings=mesh_lib.replicated_sharding(mesh))(sharded)
    else:
      variables = self.model.init(rngs, batch, training=True,
                                  return_losses=True)
    params = variables.get('params', {})
    opt_state = self.optimizer.init(params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=opt_state)
    return mesh_lib.replicate(state, self.mesh)

  def param_count(self, state: TrainState) -> int:
    return int(sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(state.params)))

  # ----------------------------------------------------------------------
  # Train step
  # ----------------------------------------------------------------------
  def _build_step(self):
    model = self.model
    optimizer = self.optimizer
    base_key = jax.random.PRNGKey(self.seed + 2)
    # Sequence-parallel step: when the mesh shards the 'time' axis, route
    # the forward through the shard_map kernels (parallel/sp_model.py) so
    # audio-rate intermediates stay sharded. Same losses contract, same
    # optimizer/ckpt machinery.
    from ddsp_tpu.parallel import sp_model  # pylint: disable=g-import-not-at-top
    use_sp = sp_model.has_time_sharding(self.mesh)
    mesh = self.mesh
    halo_impl = self.halo_impl

    def step_fn(state: TrainState, batch) -> Tuple[TrainState, Dict]:
      if use_sp and halo_impl == 'pallas':
        # Trace-time: deterministic collective_ids per program, so SPMD
        # hosts with different warm-up histories compile identical
        # barrier wiring (pallas_halo module docstring).
        from ddsp_tpu.parallel import pallas_halo  # pylint: disable=g-import-not-at-top
        pallas_halo.reset_collective_id_counter()
      rng = jax.random.fold_in(base_key, state.step)

      def loss_fn(params):
        if use_sp:
          _, losses = model.apply(
              {'params': params}, batch, mesh=mesh, training=True,
              halo_impl=halo_impl,
              method=sp_model.sp_forward_with_losses, rngs={'noise': rng})
        else:
          _, losses = model.apply({'params': params}, batch, training=True,
                                  return_losses=True, rngs={'noise': rng})
        return losses['total_loss'], losses

      grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
      (_, losses), grads = grad_fn(state.params)
      updates, opt_state = optimizer.update(grads, state.opt_state,
                                            state.params)
      params = optax.apply_updates(state.params, updates)
      new_state = TrainState(step=state.step + 1, params=params,
                             opt_state=opt_state)
      return new_state, losses

    batch_sharding = mesh_lib.batch_sharding(self.mesh)
    repl = mesh_lib.replicated_sharding(self.mesh)
    # SP batches carry mixed per-leaf shardings (audio over ('data',
    # 'time'), frame features over ('data',)) placed by shard_batch; leave
    # them unspecified so jit inherits the committed placement instead of
    # forcing everything to P('data').
    return jax.jit(
        step_fn,
        in_shardings=(repl, None) if use_sp else (repl, batch_sharding),
        out_shardings=(repl, repl),
        donate_argnums=(0,))

  def train_step(self, state: TrainState, batch) -> Tuple[TrainState, Dict]:
    """One optimization step. batch: host pytree or sharded arrays."""
    if self._jit_step is None:
      self._jit_step = self._build_step()
    batch = mesh_lib.shard_batch(batch, self.mesh)
    return self._jit_step(state, batch)

  # ----------------------------------------------------------------------
  # Checkpointing (orbax)
  # ----------------------------------------------------------------------
  def _checkpoint_manager(self, directory: str):
    import orbax.checkpoint as ocp  # pylint: disable=g-import-not-at-top
    if self._ckpt_mgr is None or self._ckpt_dir != directory:
      options = ocp.CheckpointManagerOptions(
          max_to_keep=self.checkpoints_to_keep, create=True)
      self._ckpt_mgr = ocp.CheckpointManager(
          os.path.abspath(directory), options=options)
      self._ckpt_dir = directory
    return self._ckpt_mgr

  def save(self, state: TrainState, save_dir: str):
    """Saves model and optimizer to a checkpoint (step-numbered)."""
    start_time = time.time()
    step = int(state.step)
    mgr = self._checkpoint_manager(save_dir)
    import orbax.checkpoint as ocp  # pylint: disable=g-import-not-at-top
    mgr.save(step, args=ocp.args.StandardSave(
        {'params': state.params, 'opt_state': state.opt_state,
         'step': state.step}))
    mgr.wait_until_finished()
    return time.time() - start_time

  def restore(self, state: TrainState, restore_dir: str,
              restore_keys: Optional[list] = None) -> TrainState:
    """Restore model and optimizer from the latest checkpoint, if any.

    Args:
      state: A freshly initialized TrainState (provides the pytree
        structure / shapes).
      restore_dir: Directory with step-numbered checkpoints.
      restore_keys: Optional list of top-level param-subtree names to
        restore (partial restore, e.g. ['decoder']); other subtrees keep
        their fresh initialization. Mirrors reference
        model.restore(restore_keys) (models/model.py:73-107).

    Returns:
      The restored TrainState (or the input state if no checkpoint found).
    """
    import orbax.checkpoint as ocp  # pylint: disable=g-import-not-at-top
    mgr = self._checkpoint_manager(restore_dir)
    # The manager caches the step list at construction; a separate train
    # process writes new step dirs it can't see. Re-scan, so the eval
    # sidecar's repeated restore() calls pick up fresh checkpoints.
    mgr.reload()
    step = mgr.latest_step()
    if step is None:
      return state

    target = {'params': jax.tree_util.tree_map(np.asarray, state.params),
              'opt_state': jax.tree_util.tree_map(np.asarray,
                                                  state.opt_state),
              'step': np.asarray(state.step)}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))

    if restore_keys is None:
      new_state = TrainState(step=jnp.asarray(restored['step']),
                             params=restored['params'],
                             opt_state=restored['opt_state'])
    else:
      # Partial restore: swap in only the chosen param subtrees, keep the
      # fresh optimizer state and step. Keys absent from the checkpoint or
      # the fresh tree are skipped (e.g. no encoder in this preset), same
      # as _SpecInference's partial restore.
      params = dict(state.params)
      for k in restore_keys:
        if k in restored['params'] and k in params:
          params[k] = restored['params'][k]
      new_state = TrainState(step=state.step, params=params,
                             opt_state=state.opt_state)
    return mesh_lib.replicate(new_state, self.mesh)
