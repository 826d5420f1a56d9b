"""Steady-state timing for TPU benchmarks behind the axon device tunnel.

Two measurement hazards on this box, both empirically verified on the
48k-tap reverb workload (see docs/DESIGN.md "measurement methodology"):

 1. Post-compile contention. XLA compilation is served by a remote-compile
    service that shares the physical TPU; for seconds after a compile
    returns, kernels time 10-100x slower than steady state (measured
    1.5 ms vs 0.02 ms for the identical executable). A single warmup call
    does not clear it.
 2. Tunnel sync slack. block_until_ready can under-report through the
    tunnel; measurements fence with a 1-element device->host transfer.

measure() therefore repeats the timing trial until the running minimum
stops improving, and reports that minimum - the uncontended steady state a
training job (compile once, run for hours) actually sees. Trials are
cheap relative to compile time; the loop typically converges in 3-5
trials once the compile service drains.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence


def _sync(tree) -> None:
  """Fence on real completion: 1-element device->host transfer."""
  import jax
  import jax.numpy as jnp
  import numpy as np
  leaves = jax.tree_util.tree_leaves(tree)
  if leaves:
    np.asarray(jnp.ravel(leaves[0])[:1])


def measure(fn: Callable[..., Any], args: Sequence[Any], iters: int = 30,
            min_trials: int = 3, max_trials: int = 10,
            improve_tol: float = 0.03, patience: int = 2) -> float:
  """Seconds per call of fn(*args) at uncontended steady state.

  Runs up to max_trials timing windows of `iters` calls each and returns
  the fastest window mean, stopping early once the running minimum has
  not improved by more than improve_tol for `patience` consecutive
  windows (after at least min_trials windows).
  """
  r = fn(*args)
  _sync(r)

  best = float('inf')
  stale = 0
  for trial in range(max_trials):
    t0 = time.perf_counter()
    for _ in range(iters):
      r = fn(*args)
    _sync(r)
    dt = (time.perf_counter() - t0) / iters
    if dt < best * (1.0 - improve_tol):
      best = min(best, dt)
      stale = 0
    else:
      best = min(best, dt)
      stale += 1
      if trial + 1 >= min_trials and stale >= patience:
        break
  return best
