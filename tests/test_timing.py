"""Sanity tests for the benchmark timing harness (CPU).

The TPU-specific hazards (tunnel RTT, per-leaf block_until_ready cost)
can't be reproduced on CPU; these pin the harness CONTRACT: the probe
fence depends on every leaf, windows are recorded, and the subtracted
sync overhead can never drive a window negative.
"""

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks import timing


def test_measure_full_returns_record():
  x = jnp.arange(1024.0)
  f = jax.jit(lambda x: {'a': x * 2.0, 'b': (x + 1.0, jnp.sum(x))})
  m = timing.measure_full(f, (x,), iters=3, min_trials=2, max_trials=3)
  assert m.best > 0 and m.mean >= m.best
  assert 2 <= len(m.windows) <= 3
  assert all(w >= 0 for w in m.windows)
  assert m.sync_overhead >= 0
  assert m.iters == 3
  assert m.spread >= 0


def test_measure_matches_measure_full_best():
  x = jnp.ones((64, 64))
  f = jax.jit(lambda x: x @ x)
  dt = timing.measure(f, (x,), iters=2, min_trials=2, max_trials=2)
  assert dt >= 0


def test_probe_fence_covers_nested_trees():
  # The fence must traverse arbitrary pytrees without error; its probe
  # value depends on every leaf (a jitted sum of one element per leaf).
  tree = {'x': jnp.zeros(5), 'y': [jnp.ones((2, 3)), (jnp.arange(4.0),)]}
  timing._sync(tree)  # must not raise
  timing._sync(jnp.zeros(1))
