"""Tests for ddsp_tpu.ops.resample.

Golden tests vs tf.compat.v1.image.resize (the reference's implementation of
`resample`, reference core.py:573-729) across dimensionalities and endpoint
modes, mirroring reference core_test.py:145-374.
"""

import numpy as np
import pytest

from ddsp_tpu import ops

tf = pytest.importorskip('tensorflow')


def tf_resample_reference(inputs, n_timesteps, method, add_endpoint):
  """Reference semantics via tf.compat.v1.image.resize."""
  x = np.asarray(inputs, np.float32)
  is_1d = x.ndim == 1
  is_2d = x.ndim == 2
  is_4d = x.ndim == 4
  if is_1d:
    x = x[np.newaxis, :, np.newaxis]
  elif is_2d:
    x = x[:, :, np.newaxis]
  outputs = x[:, :, np.newaxis, :] if not is_4d else x
  methods = {
      'nearest': tf.compat.v1.image.ResizeMethod.NEAREST_NEIGHBOR,
      'linear': tf.compat.v1.image.ResizeMethod.BILINEAR,
      'cubic': tf.compat.v1.image.ResizeMethod.BICUBIC,
  }
  out = tf.compat.v1.image.resize(outputs,
                                  [n_timesteps, outputs.shape[2]],
                                  method=methods[method],
                                  align_corners=not add_endpoint).numpy()
  out = out[:, :, 0, :] if not is_4d else out
  if is_1d:
    out = out[0, :, 0]
  elif is_2d:
    out = out[:, :, 0]
  return out


@pytest.mark.parametrize('method', ['nearest', 'linear', 'cubic'])
@pytest.mark.parametrize('add_endpoint', [True, False])
@pytest.mark.parametrize('ndim', [1, 2, 3, 4])
def test_resample_matches_tf_image_resize(method, add_endpoint, ndim):
  rng = np.random.RandomState(0)
  shapes = {1: (11,), 2: (2, 11), 3: (2, 11, 3), 4: (2, 11, 4, 3)}
  x = rng.randn(*shapes[ndim]).astype(np.float32)
  n_timesteps = 44
  got = np.asarray(ops.resample(x, n_timesteps, method=method,
                                add_endpoint=add_endpoint))
  want = tf_resample_reference(x, n_timesteps, method, add_endpoint)
  assert got.shape == want.shape
  # TF's legacy bicubic uses a 1024-bucket quantized coefficient table in
  # some paths, bounding agreement at ~2e-3; we compute exact Keys weights.
  atol = 4e-3 if method == 'cubic' else 1e-4
  np.testing.assert_allclose(got, want, atol=atol)


@pytest.mark.parametrize('add_endpoint', [True, False])
def test_resample_downsampling_linear(add_endpoint):
  rng = np.random.RandomState(1)
  x = rng.randn(2, 100, 3).astype(np.float32)
  got = np.asarray(ops.resample(x, 25, method='linear',
                                add_endpoint=add_endpoint))
  want = tf_resample_reference(x, 25, 'linear', add_endpoint)
  np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize('add_endpoint', [True, False])
def test_window_constant_input_is_constant(add_endpoint):
  """COLA property: constant frames upsample to a constant signal."""
  n_frames = 10
  n_timesteps = 1000 if add_endpoint else 900
  x = 3.0 * np.ones((2, n_frames, 1), np.float32)
  out = np.asarray(ops.resample(x, n_timesteps, method='window',
                                add_endpoint=add_endpoint))
  assert out.shape == (2, n_timesteps, 1)
  np.testing.assert_allclose(out, 3.0, atol=1e-5)


def test_window_matches_tf_reference():
  """Golden: reproduce the reference upsample_with_windows with tf.signal."""
  rng = np.random.RandomState(2)
  n_frames, n_timesteps = 10, 1000
  x = rng.rand(2, n_frames, 3).astype(np.float32)

  # Reference computation (hann window overlap-and-add), done with tf ops.
  inputs = np.concatenate([x, x[:, -1:, :]], axis=1)
  hop_size = n_timesteps // (inputs.shape[1] - 1)
  window_length = 2 * hop_size
  window = tf.signal.hann_window(window_length).numpy()
  xt = np.transpose(inputs, (0, 2, 1))[:, :, :, np.newaxis]
  x_windowed = xt * window[np.newaxis, np.newaxis, np.newaxis, :]
  ola = tf.signal.overlap_and_add(
      tf.convert_to_tensor(x_windowed, tf.float32), hop_size).numpy()
  want = np.transpose(ola, (0, 2, 1))[:, hop_size:-hop_size, :]

  got = np.asarray(ops.upsample_with_windows(x, n_timesteps,
                                             add_endpoint=True))
  np.testing.assert_allclose(got, want, atol=1e-5)


def test_window_4d_raises():
  with pytest.raises(ValueError):
    ops.resample(np.zeros((2, 10, 4, 3), np.float32), 100, method='window')


def test_window_downsample_raises():
  with pytest.raises(ValueError):
    ops.upsample_with_windows(np.zeros((1, 100, 1), np.float32), 50)


def test_window_non_divisible_raises():
  with pytest.raises(ValueError):
    ops.upsample_with_windows(np.zeros((1, 10, 1), np.float32), 1001)


def test_invalid_method_raises():
  with pytest.raises(ValueError):
    ops.resample(np.zeros((1, 10, 1), np.float32), 100, method='bogus')


def test_center_crop():
  x = np.ones((2, 100, 1))
  out = ops.center_crop(x, 10)
  assert out.shape == (2, 90, 1)


def test_center_crop_frame_size_one_is_noop():
  """frame_size < 2 used to slice to empty ([:, 0:-0])."""
  import jax.numpy as jnp
  from ddsp_tpu.ops.resample import center_crop
  x = jnp.ones((1, 10))
  assert center_crop(x, 1).shape == (1, 10)
  assert center_crop(x, 0).shape == (1, 10)
  assert center_crop(x, 4).shape == (1, 6)
