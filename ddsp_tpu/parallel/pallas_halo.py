"""Kernel-level neighbor halo exchange via Pallas async remote DMA.

The time-sharded DSP kernels (ddsp_tpu.parallel.time_shard) exchange
overlap-add tails, group-delay heads, and STFT halos between neighbor
shards. The default implementation uses XLA collectives
(`jax.lax.ppermute`); this module provides the same single-step neighbor
shift as a Pallas TPU kernel using `pltpu.make_async_remote_copy`, i.e.
direct chip-to-chip RDMA over ICI initiated from inside a kernel (SURVEY.md
section 5.7/5.8, the 'kernel-level RDMA' plan). On a real slice this lets
the halo ride ICI without a separate XLA collective dispatch and can be
fused with compute; on CPU meshes it runs in interpret mode, where
correctness vs. the XLA path is pinned by tests/test_pallas_halo.py.

Design: the non-wrapping shift (boundary shard receives zeros - the
semantics every halo pattern here needs) is implemented as a *wrapping*
ring send plus a boundary mask. Wrapping keeps the kernel symmetric SPMD -
every shard both sends and receives exactly once, so the send/recv
semaphore pairing is uniform and deadlock-free; the wrapped-around value is
then zeroed at the boundary shard. The pair (shift_right, shift_left) are
each other's linear transposes, wired up as custom VJPs so the halo
exchange is differentiable exactly like `ppermute` (halo exchange
transposes to halo accumulation in the adjoint).
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Mosaic maps collective_id -> barrier semaphore; exchanges that can be
# concurrently in flight on different chips must use distinct ids or one
# exchange's barrier signals can satisfy another's wait. Ids are handed
# out round-robin at trace time (same order on every device - SPMD), so
# adjacent exchanges in program order always differ; since each barrier
# bounds inter-chip drift to one exchange, that suffices.
#
# MULTIHOST CAVEAT: the counter is process-local, so hosts must trace the
# same programs in the same order (the normal SPMD setup, e.g. run.py
# --multihost). If one host traces extra programs first, pass explicit
# `collective_id`s so the shared program gets identical ids everywhere.
_COLLECTIVE_ID_POOL = 16
_collective_id_counter = itertools.count()


def _next_collective_id() -> int:
  return next(_collective_id_counter) % _COLLECTIVE_ID_POOL


def reset_collective_id_counter():
  """Restart the round-robin collective_id allocator at 0.

  Call at the START of tracing a jitted program that uses the pallas halo
  impl (the Trainer does this inside its step function body, which runs
  at trace time): ids then depend only on the program's own exchange
  order, not on process history - so SPMD hosts that traced different
  warm-up programs still compile identical barrier wiring for the shared
  step. Safe across programs: executions are serialized per device and
  every barrier completes within its program, so two sequentially-run
  executables may reuse ids.
  """
  global _collective_id_counter
  _collective_id_counter = itertools.count()


def _interpret_needs_xla_fallback() -> bool:
  """True when the enclosing shard_map mesh has more than one named axis.

  Interpret-mode remote DMA only supports single-axis meshes
  (`dma_start_p` raises NotImplementedError otherwise), so on CPU test
  meshes like ('data', 'time') the pallas impl must fall back to the
  numerically identical XLA ppermute. On hardware MESH device ids address
  the shifted axis correctly under any mesh, so no fallback is needed.
  """
  try:
    return len(jax.sharding.get_abstract_mesh().shape) > 1
  except Exception:  # pylint: disable=broad-except
    return False


def _shift_kernel(x_ref, out_ref, comm_buf, send_sem, recv_sem, *,
                  axis_name: str, direction: int, interpret: bool):
  """Send my block to the neighbor `direction` steps away on the ring.

  comm_buf[0] is the send slot, comm_buf[1] the receive slot (written by
  the neighbor's RDMA). A neighbor barrier brackets the exchange so no
  shard's buffers go out of scope while a peer is still copying.

  Device addressing: on hardware, MESH device ids ({axis: index}; unnamed
  axes keep this device's own coordinate) address the time-axis neighbor
  under the full mesh. The interpret-mode simulator only implements
  scalar LOGICAL ids over a single named axis (multi-axis meshes take the
  XLA fallback before reaching this kernel).
  """
  my_id = jax.lax.axis_index(axis_name)
  n = jax.lax.axis_size(axis_name)
  dst = jax.lax.rem(my_id + direction + n, n)
  src = jax.lax.rem(my_id - direction + n, n)

  comm_buf[0] = x_ref[:]

  if interpret:
    # The simulator models remote DMA synchronously, only supports scalar
    # LOGICAL ids, and cannot lower get_barrier_semaphore; skip the
    # hardware-only neighbor barrier.
    dst_id, src_id = dst, src
    id_type = pltpu.DeviceIdType.LOGICAL
  else:
    dst_id, src_id = {axis_name: dst}, {axis_name: src}
    id_type = pltpu.DeviceIdType.MESH
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(barrier, inc=1, device_id=dst_id,
                           device_id_type=id_type)
    pltpu.semaphore_signal(barrier, inc=1, device_id=src_id,
                           device_id_type=id_type)
    pltpu.semaphore_wait(barrier, 2)

  rdma = pltpu.make_async_remote_copy(
      src_ref=comm_buf.at[0],
      dst_ref=comm_buf.at[1],
      send_sem=send_sem,
      recv_sem=recv_sem,
      device_id=dst_id,
      device_id_type=id_type)
  rdma.start()
  rdma.wait()

  # Non-wrapping semantics: the shard whose source would wrap around the
  # ring end receives zeros instead of the wrapped value.
  wrapped = jnp.logical_or(
      jnp.logical_and(direction > 0, my_id < direction),
      jnp.logical_and(direction < 0, my_id >= n + direction))
  out_ref[:] = jnp.where(wrapped, jnp.zeros_like(comm_buf[1]), comm_buf[1])


def _shift(x: Array, direction: int, axis_name: str,
           interpret: bool, collective_id: int) -> Array:
  return pl.pallas_call(
      functools.partial(_shift_kernel, axis_name=axis_name,
                        direction=direction, interpret=interpret),
      out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((2,) + x.shape, x.dtype),
          pltpu.SemaphoreType.DMA(()),
          pltpu.SemaphoreType.DMA(()),
      ],
      compiler_params=pltpu.CompilerParams(
          has_side_effects=True, collective_id=collective_id),
      interpret=interpret,
  )(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def shift_right(x: Array, axis_name: str = 'time',
                interpret: Optional[bool] = None,
                collective_id: Optional[int] = None) -> Array:
  """Shard i's x goes to shard i+1; shard 0 receives zeros.

  Equivalent to `jax.lax.ppermute(x, axis_name, [(i, i + 1) for i in
  range(n - 1)])`, executed as an in-kernel RDMA to the right ICI
  neighbor. Differentiable (adjoint is shift_left).

  collective_id None (default) allocates a fresh barrier id per call so
  independent back-to-back exchanges never share a barrier semaphore; the
  adjoint likewise allocates its own.
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  if interpret and _interpret_needs_xla_fallback():
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name,
                            [(i, i + 1) for i in range(n - 1)])
  if collective_id is None:
    collective_id = _next_collective_id()
  return _shift(x, +1, axis_name, bool(interpret), collective_id)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def shift_left(x: Array, axis_name: str = 'time',
               interpret: Optional[bool] = None,
               collective_id: Optional[int] = None) -> Array:
  """Shard i's x goes to shard i-1; the last shard receives zeros.

  Equivalent to `jax.lax.ppermute(x, axis_name, [(i + 1, i) for i in
  range(n - 1)])` as an in-kernel RDMA. Differentiable (adjoint is
  shift_right). See shift_right for collective_id semantics.
  """
  if interpret is None:
    interpret = jax.default_backend() != 'tpu'
  if interpret and _interpret_needs_xla_fallback():
    n = jax.lax.axis_size(axis_name)
    return jax.lax.ppermute(x, axis_name,
                            [(i + 1, i) for i in range(n - 1)])
  if collective_id is None:
    collective_id = _next_collective_id()
  return _shift(x, -1, axis_name, bool(interpret), collective_id)


def _shift_right_fwd(x, axis_name, interpret, collective_id):
  return shift_right(x, axis_name, interpret, collective_id), None


def _shift_right_bwd(axis_name, interpret, collective_id, _, g):
  return (shift_left(g, axis_name, interpret, collective_id),)


def _shift_left_fwd(x, axis_name, interpret, collective_id):
  return shift_left(x, axis_name, interpret, collective_id), None


def _shift_left_bwd(axis_name, interpret, collective_id, _, g):
  return (shift_right(g, axis_name, interpret, collective_id),)


shift_right.defvjp(_shift_right_fwd, _shift_right_bwd)
shift_left.defvjp(_shift_left_fwd, _shift_left_bwd)


def neighbor_shift(x: Array, direction: int, axis_name: str = 'time',
                   impl: str = 'xla',
                   collective_id: Optional[int] = None) -> Array:
  """Unified neighbor shift: +1 = toward higher shard ids, -1 = lower.

  impl='xla' uses `jax.lax.ppermute` (default; XLA schedules the
  collective); impl='pallas' uses the in-kernel RDMA shift above. Both have
  non-wrapping zero-fill semantics and correct adjoints.

  collective_id (pallas impl only): explicit Mosaic barrier-semaphore id.
  Required for multihost safety when hosts may trace programs in
  different orders - the default round-robin allocator is process-local
  (see module docstring); pass a stable id so every host compiles the
  same barrier wiring.
  """
  if impl == 'pallas':
    return (shift_right if direction > 0 else shift_left)(
        x, axis_name, collective_id=collective_id)
  n = jax.lax.axis_size(axis_name)
  if direction > 0:
    perm = [(i, i + 1) for i in range(n - 1)]
  else:
    perm = [(i + 1, i) for i in range(n - 1)]
  return jax.lax.ppermute(x, axis_name, perm)
