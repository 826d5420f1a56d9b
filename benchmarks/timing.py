"""Steady-state timing for TPU benchmarks behind the axon device tunnel.

Two measurement hazards on this box, both empirically verified on the
48k-tap reverb workload (see docs/DESIGN.md "measurement methodology"):

 1. Post-compile contention. XLA compilation is served by a remote-compile
    service that shares the physical TPU; for seconds after a compile
    returns, kernels time 10-100x slower than steady state (measured
    1.5 ms vs 0.02 ms for the identical executable). A single warmup call
    does not clear it.
 2. Under-fencing. Fetching one element of the FIRST output leaf (the
    loss scalar) returns ~0.5 ms/step EARLY on the canonical chain: the
    runtime hands back the last program's loss buffer before the large
    gradient outputs have fully materialized (measured round 5, two
    interleaved A/B runs: loss-only fence 4.21-4.25 ms/step vs full
    fence 4.71-4.88 ms/step for the identical executable). Rounds 1-4
    fenced loss-only, so their published chain numbers are ~10%
    optimistic; measurements here block_until_ready the WHOLE output
    tree, then do a 1-element device->host transfer.

measure() therefore repeats the timing trial until the running minimum
stops improving, and reports that minimum - the uncontended steady state a
training job (compile once, run for hours) actually sees. Trials are
cheap relative to compile time; the loop typically converges in 3-5
trials once the compile service drains.

measure_full() returns the full per-window record (min, mean, every
window) so callers can publish the spread instead of a bare point
estimate; measure() is the float-returning convenience wrapper.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Sequence


def _sync(tree) -> None:
  """Fence on real completion of EVERY leaf, then a 1-element transfer.

  block_until_ready on the whole tree covers sharded / multi-device
  outputs (a single-leaf fence can under-report); the trailing 1-element
  device->host transfer defeats any remaining tunnel-side sync slack.
  """
  import jax
  import jax.numpy as jnp
  import numpy as np
  leaves = jax.tree_util.tree_leaves(tree)
  if leaves:
    jax.block_until_ready(leaves)
    np.asarray(jnp.ravel(leaves[0])[:1])


@dataclasses.dataclass
class Measurement:
  """Per-window record of one measure() run (all times in seconds/call)."""
  best: float            # fastest window mean - the steady-state estimate
  mean: float            # mean over all windows (includes contended ones)
  windows: list          # every window's seconds-per-call, in order
  iters: int             # calls per window

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
  freezing a contended plateau into the result.
  """
  r = fn(*args)
  _sync(r)

  windows = []
  best = float('inf')
  stale = 0
  for trial in range(max_trials):
    t0 = time.perf_counter()
    for _ in range(iters):
      r = fn(*args)
    _sync(r)
    dt = (time.perf_counter() - t0) / iters
    windows.append(dt)
    if dt < best:
      best = dt
      stale = 0
    else:
      stale += 1
      if trial + 1 >= min_trials and stale >= patience:
        break
  return Measurement(best=best, mean=sum(windows) / len(windows),
                     windows=windows, iters=iters)


def measure(fn: Callable[..., Any], args: Sequence[Any], iters: int = 30,
            min_trials: int = 3, max_trials: int = 12,
            patience: int = 2) -> float:
  """Seconds per call of fn(*args) at uncontended steady state (fastest
  window mean; see measure_full for the per-window record)."""
  return measure_full(fn, args, iters=iters, min_trials=min_trials,
                      max_trials=max_trials, patience=patience).best
