"""Tests for the Pallas RDMA neighbor-shift halo exchange (interpret mode).

The kernel-level halo path must be drop-in equivalent to the XLA
`ppermute` path: same non-wrapping shift semantics, same adjoint, and the
time-sharded convolution/loss results must be identical under either
implementation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ddsp_tpu import ops
from ddsp_tpu.parallel import create_mesh, pallas_halo, time_shard


def time_mesh(n_time):
  # Interpret-mode remote DMA only supports single-axis meshes (the
  # simulator's dma_start discharge rule); on real TPUs the MESH device-id
  # form works under the full ('data', 'time') mesh. Use a pure 'time'
  # mesh here so the RDMA path is exercised end to end on CPU.
  from jax.sharding import Mesh
  return Mesh(np.asarray(jax.devices()[:n_time]), ('time',))


def _apply_shift(mesh, fn, x):
  return jax.jit(jax.shard_map(
      fn, mesh=mesh, in_specs=P(None, 'time'),
      out_specs=P(None, 'time'), check_vma=False))(x)


@pytest.mark.parametrize('n_shards', [2, 4, 8])
@pytest.mark.parametrize('direction', [+1, -1])
def test_shift_matches_ppermute(n_shards, direction):
  rng = np.random.RandomState(0)
  x = rng.randn(2, 16 * n_shards).astype(np.float32)
  mesh = time_mesh(n_shards)

  got = _apply_shift(
      mesh, functools.partial(pallas_halo.neighbor_shift,
                              direction=direction, impl='pallas'), x)
  want = _apply_shift(
      mesh, functools.partial(pallas_halo.neighbor_shift,
                              direction=direction, impl='xla'), x)
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_boundary_shards_receive_zeros():
  n_shards = 4
  x = np.ones((1, 8 * n_shards), np.float32)
  mesh = time_mesh(n_shards)
  right = np.asarray(_apply_shift(
      mesh, functools.partial(pallas_halo.neighbor_shift, direction=+1,
                              impl='pallas'), x))
  # Shard 0's slice is zeros after a right shift.
  np.testing.assert_array_equal(right[:, :8], 0.0)
  np.testing.assert_array_equal(right[:, 8:], 1.0)
  left = np.asarray(_apply_shift(
      mesh, functools.partial(pallas_halo.neighbor_shift, direction=-1,
                              impl='pallas'), x))
  np.testing.assert_array_equal(left[:, -8:], 0.0)
  np.testing.assert_array_equal(left[:, :-8], 1.0)


@pytest.mark.parametrize('direction', [+1, -1])
def test_shift_adjoint_matches_ppermute(direction):
  """grad through the pallas shift == grad through the XLA shift."""
  n_shards = 4
  rng = np.random.RandomState(1)
  x = rng.randn(1, 8 * n_shards).astype(np.float32)
  w = rng.randn(1, 8 * n_shards).astype(np.float32)
  mesh = time_mesh(n_shards)

  def loss(impl, x):
    y = jax.shard_map(lambda a: pallas_halo.neighbor_shift(
        a, direction, impl=impl), mesh=mesh,
        in_specs=P(None, 'time'), out_specs=P(None, 'time'),
        check_vma=False)(x)
    return jnp.sum(y * w)

  g_pallas = jax.grad(functools.partial(loss, 'pallas'))(x)
  g_xla = jax.grad(functools.partial(loss, 'xla'))(x)
  np.testing.assert_array_equal(np.asarray(g_pallas), np.asarray(g_xla))


def test_fft_convolve_pallas_halo_matches_xla():
  """The full time-sharded convolution is identical under either halo
  implementation (values and gradients), including a multi-step delay
  ring (ir 2000 at t_local 1000)."""
  rng = np.random.RandomState(3)
  batch, t, ir_size, n_shards = 1, 8000, 2000, 8
  audio = rng.randn(batch, t).astype(np.float32)
  ir = (rng.randn(batch, 1, ir_size) * 0.1).astype(np.float32)
  mesh = time_mesh(n_shards)

  out_x = np.asarray(time_shard.time_sharded_fft_convolve(
      mesh, audio, ir, halo_impl='xla'))
  out_p = np.asarray(time_shard.time_sharded_fft_convolve(
      mesh, audio, ir, halo_impl='pallas'))
  np.testing.assert_array_equal(out_p, out_x)

  def loss(impl, audio, ir):
    return jnp.mean(time_shard.time_sharded_fft_convolve(
        mesh, audio, ir, halo_impl=impl)**2)

  gx = jax.grad(functools.partial(loss, 'xla'), argnums=(0, 1))(audio, ir)
  gp = jax.grad(functools.partial(loss, 'pallas'),
                argnums=(0, 1))(audio, ir)
  for a, b in zip(gx, gp):
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-6, atol=1e-7)


def test_spectral_loss_pallas_halo_matches_xla():
  rng = np.random.RandomState(4)
  target = rng.randn(1, 8192).astype(np.float32)
  audio = rng.randn(1, 8192).astype(np.float32)
  mesh = time_mesh(4)
  kwargs = dict(fft_sizes=(512, 128), mag_weight=1.0, logmag_weight=1.0)

  lx = float(time_shard.time_sharded_spectral_loss(
      mesh, target, audio, halo_impl='xla', **kwargs))
  lp = float(time_shard.time_sharded_spectral_loss(
      mesh, target, audio, halo_impl='pallas', **kwargs))
  np.testing.assert_allclose(lp, lx, rtol=1e-6)
