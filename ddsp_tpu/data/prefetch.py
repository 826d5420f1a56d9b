"""Device prefetching for the training input pipeline.

The reference relies on tf.data's prefetch (data.py:58-80) to overlap host
batch preparation and host->device transfer with the train step. Here a
small background thread performs sharded device_put ahead of consumption,
so the accelerator never waits on the host between steps (important when
the host link is slow, e.g. remote-attached TPUs).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterator[Dict[str, Any]],
                       size: int = 2,
                       sharding=None,
                       mesh=None) -> Iterator[Dict[str, Any]]:
  """Wrap a host batch iterator with background device placement.

  Args:
    iterator: Yields host (numpy) feature dicts.
    size: Prefetch depth (2 = double buffering).
    sharding: Optional jax.sharding.Sharding for the batches (e.g.
      NamedSharding(mesh, P('data'))). None = default device placement.
    mesh: Convenience alternative to `sharding`: builds a batch-axis
      NamedSharding over the mesh's 'data' axis.

  Yields:
    Batches already resident on device (sharded committed arrays).
  """
  if sharding is None and mesh is not None:
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P('data'))

  q: 'queue.Queue' = queue.Queue(maxsize=size)
  sentinel = object()
  error: list = []
  # Set when the consumer goes away (generator close / early train exit):
  # unblocks the producer so neither the thread nor its queued device
  # batches outlive the loop that created them.
  stop = threading.Event()

  def producer():
    try:
      for batch in iterator:
        if stop.is_set():
          return
        if sharding is not None:
          batch = jax.device_put(batch, sharding)
        else:
          batch = jax.device_put(batch)
        while not stop.is_set():
          try:
            q.put(batch, timeout=0.2)
            break
          except queue.Full:
            continue
    except Exception as e:  # pylint: disable=broad-except
      error.append(e)
    finally:
      # The sentinel MUST reach the consumer (it may be slower than the
      # producer, with the queue momentarily full) — keep trying until it
      # lands or the consumer has explicitly gone away.
      while not stop.is_set():
        try:
          q.put(sentinel, timeout=0.2)
          break
        except queue.Full:
          continue

  thread = threading.Thread(target=producer, daemon=True)
  thread.start()

  try:
    while True:
      item = q.get()
      if item is sentinel:
        if error:
          raise error[0]
        return
      yield item
  finally:
    stop.set()
    # Drain one slot in case the producer is mid-put.
    try:
      q.get_nowait()
    except queue.Empty:
      pass
