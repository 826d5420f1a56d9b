"""Steady-state timing for TPU benchmarks behind the axon device tunnel.

Measurement hazards on this box, all empirically verified (round 5 ran a
three-way fence comparison at two window sizes on the canonical chain):

 1. Post-compile contention. XLA compilation is served by a remote-compile
    service that shares the physical TPU; for seconds after a compile
    returns, kernels time 10-100x slower than steady state. A single
    warmup call does not clear it -> repeat windows, keep the minimum.
 2. Per-leaf fencing overhead. `jax.block_until_ready` on every output
    leaf costs a tunnel round trip PER LEAF (~25 ms extra per window on a
    ~30-leaf tree) - that is host<->tunnel latency, not device work. The
    correct full-tree fence is a single probe program that sums one
    element OF EVERY leaf: one dispatch + one device->host fetch, and its
    data dependency covers the whole tree. (Measured: the probe fence
    equals a loss-only fence to <0.5%, proving the device completes all
    outputs together; block_until_ready-per-leaf reads ~0.2-0.9 ms/step
    higher purely from RTTs.)
 3. The sync fetch itself costs one tunnel round trip (~25 ms) per
    window, inflating the naive per-step number by RTT/iters (+0.8 ms/step
    at iters=30, +0.4 at 60). measure() times the fence on already-
    resident data and subtracts that fixed cost from each window - the
    published number is the device's steady-state step time, which is
    what an on-host training job (no per-step host fetch) actually sees.

measure() repeats the timing trial until the running minimum stops
improving and reports that minimum. measure_full() returns the full
per-window record (min, mean, every window, the subtracted sync cost).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Sequence


def _make_probe():
  import jax
  import jax.numpy as jnp

  @jax.jit
  def probe_of(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.ravel(l)[0].astype(jnp.float32) for l in leaves)

  return probe_of


_PROBE = None


def _sync(tree) -> None:
  """Fence on completion of EVERY leaf with ONE round trip.

  Fetches a scalar that data-depends on every output leaf - the device
  cannot produce it before finishing the whole tree, and the host pays a
  single dispatch + a single 4-byte fetch (vs a round trip per leaf for
  block_until_ready on this box's tunnel).
  """
  global _PROBE
  import numpy as np
  leaves_probe = _PROBE
  if leaves_probe is None:
    leaves_probe = _PROBE = _make_probe()
  np.asarray(leaves_probe(tree))


@dataclasses.dataclass
class Measurement:
  """Per-window record of one measure() run (all times in seconds/call)."""
  best: float            # fastest window mean - the steady-state estimate
  mean: float            # mean over all windows (includes contended ones)
  windows: list          # every window's seconds-per-call, in order
  iters: int             # calls per window
  sync_overhead: float   # fixed per-window fence cost subtracted (seconds)

  @property
  def spread(self) -> float:
    """(slowest - fastest) / fastest over the measured windows."""
    return (max(self.windows) - self.best) / self.best if self.windows else 0.0


def measure_full(fn: Callable[..., Any], args: Sequence[Any],
                 iters: int = 30, min_trials: int = 3, max_trials: int = 12,
                 patience: int = 2) -> Measurement:
  """Measurement of fn(*args) at uncontended steady state.

  Runs up to max_trials timing windows of `iters` calls each, stopping
  early once the running minimum has not improved AT ALL for `patience`
  consecutive windows (after at least min_trials windows). Any
  improvement - however small - resets the staleness counter, so
  slowly-decaying contention (~2%/window) keeps the loop alive instead of
  freezing a contended plateau into the result. Each window subtracts the
  measured fixed cost of its single sync round trip (hazard 3 above).
  """
  r = fn(*args)
  _sync(r)

  # The fence's own cost on already-computed data: pure host/tunnel
  # latency that a window pays exactly once.
  sync_cost = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    _sync(r)
    sync_cost = min(sync_cost, time.perf_counter() - t0)

  windows = []
  best = float('inf')
  stale = 0
  for trial in range(max_trials):
    t0 = time.perf_counter()
    for _ in range(iters):
      r = fn(*args)
    _sync(r)
    dt = max(time.perf_counter() - t0 - sync_cost, 0.0) / iters
    windows.append(dt)
    if dt < best:
      best = dt
      stale = 0
    else:
      stale += 1
      if trial + 1 >= min_trials and stale >= patience:
        break
  return Measurement(best=best, mean=sum(windows) / len(windows),
                     windows=windows, iters=iters, sync_overhead=sync_cost)


def measure(fn: Callable[..., Any], args: Sequence[Any], iters: int = 30,
            min_trials: int = 3, max_trials: int = 12,
            patience: int = 2) -> float:
  """Seconds per call of fn(*args) at uncontended steady state (fastest
  window mean; see measure_full for the per-window record)."""
  return measure_full(fn, args, iters=iters, min_trials=min_trials,
                      max_trials=max_trials, patience=patience).best
