"""Device mesh setup and sharding helpers.

The TPU-native replacement for the reference's tf.distribute strategies
(reference train_util.py:29-78). One global `Mesh(('data', 'time'))`:

  * 'data': batch-parallel axis (the reference's only parallelism).
  * 'time': audio-time-axis sharding for long-form synthesis - a new
    capability (SURVEY.md section 5.7); kernels exchange overlap-add halos
    and phase carries across this axis.

Multi-host: call `jax.distributed.initialize()` per host before creating
the mesh; `jax.devices()` then spans all hosts and the same code applies.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: Optional[int] = None,
                n_time: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
  """Create a ('data', 'time') mesh over the available devices.

  Args:
    n_data: Size of the data axis. Defaults to n_devices // n_time.
    n_time: Size of the time axis (audio-sample sharding).
    devices: Devices to use (default jax.devices(), all hosts).

  Returns:
    A Mesh with axes ('data', 'time').
  """
  devices = list(devices if devices is not None else jax.devices())
  if n_data is None:
    n_data = len(devices) // n_time
  if n_data * n_time != len(devices):
    devices = devices[:n_data * n_time]
  device_array = np.asarray(devices).reshape(n_data, n_time)
  return Mesh(device_array, ('data', 'time'))


def single_device_mesh() -> Mesh:
  """A trivial 1x1 mesh (single chip)."""
  return create_mesh(n_data=1, n_time=1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for batched arrays: batch dim over 'data'."""
  return NamedSharding(mesh, P('data'))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  """Fully replicated sharding (params, scalars)."""
  return NamedSharding(mesh, P())


def audio_sharding(mesh: Mesh) -> NamedSharding:
  """Sharding for [batch, n_samples] audio: ('data', 'time')."""
  return NamedSharding(mesh, P('data', 'time'))


def shard_batch(batch, mesh: Mesh):
  """Place a pytree of host arrays on the mesh, batch-dim sharded.

  When the mesh time axis is non-trivial, audio-rate 2-D leaves (last dim
  long and divisible by the time-axis size) are additionally sharded over
  'time' so per-device memory stays O(n_samples / n_time). Frame-rate
  features (loudness/f0, ~1k frames) stay below the length threshold and
  shard over 'data' only. This is a placement heuristic - the shard_map
  in_specs enforce layouts regardless; a 'wrong' guess only costs a
  reshard copy.
  """
  data_s = batch_sharding(mesh)
  n_time = dict(mesh.shape).get('time', 1)
  audio_s = audio_sharding(mesh)

  def spec_for(x):
    is_audio_rate = (n_time > 1 and getattr(x, 'ndim', 0) == 2
                     and x.shape[-1] >= 8192 and x.shape[-1] % n_time == 0)
    return audio_s if is_audio_rate else data_s

  if jax.process_count() > 1:
    # Multi-host: each process feeds its LOCAL batch rows; the global
    # array is assembled across hosts along the sharded batch dim (the
    # reference's per-worker dataset sharding, trainers.py:145-150).
    # Leaves that are already global jax.Arrays (e.g. a batch passed back
    # from a previous step, which train_step explicitly allows) must not
    # go through np.asarray - a non-fully-addressable array cannot be
    # pulled to one host; they are already placed, so pass them through.
    def put_global(x):
      if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x
      return jax.make_array_from_process_local_data(spec_for(x),
                                                    np.asarray(x))
    return jax.tree_util.tree_map(put_global, batch)

  return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec_for(x)),
                                batch)


def replicate(tree, mesh: Mesh):
  """Place a pytree fully replicated on the mesh.

  Multi-host: every process must hold the same host values (e.g. params
  initialized from the same seed); they are stitched into one global
  replicated array per leaf.
  """
  if jax.process_count() > 1:
    from jax.experimental import multihost_utils  # pylint: disable=g-import-not-at-top
    return multihost_utils.host_local_array_to_global_array(
        jax.tree_util.tree_map(np.asarray, tree), mesh, P())
  sharding = replicated_sharding(mesh)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), tree)
