"""Tests for ddsp_tpu.ops.core: conversions, scaling, helpers.

Mirrors the reference test strategy (reference core_test.py:27-40, 929-957):
numerical goldens vs closed-form numpy formulas.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import ops


def test_midi_to_hz_golden():
  # A4 = 440 Hz at MIDI 69; C4 = MIDI 60.
  midi = np.array([69.0, 60.0, 81.0, 0.0])
  expected = 440.0 * 2.0 ** ((midi - 69.0) / 12.0)
  np.testing.assert_allclose(ops.midi_to_hz(midi), expected, rtol=1e-5)


def test_midi_to_hz_zero_silence():
  hz = ops.midi_to_hz(np.array([0.0, 69.0]), midi_zero_silence=True)
  assert hz[0] == 0.0
  np.testing.assert_allclose(hz[1], 440.0, rtol=1e-5)


def test_hz_to_midi_inverts_midi_to_hz():
  midi = np.linspace(1.0, 127.0, 50)
  round_trip = ops.hz_to_midi(ops.midi_to_hz(midi))
  # float32 log precision bounds the round trip at ~2e-3 midi.
  np.testing.assert_allclose(round_trip, midi, atol=3e-3)


def test_hz_to_midi_zero_maps_to_zero():
  assert float(ops.hz_to_midi(0.0)) == 0.0


def test_db_amplitude_round_trip():
  amp = np.array([1.0, 0.5, 0.1, 0.01])
  db = ops.amplitude_to_db(amp)
  np.testing.assert_allclose(db, 20.0 * np.log10(amp), atol=1e-4)
  np.testing.assert_allclose(ops.db_to_amplitude(db), amp, rtol=1e-4)


def test_power_db_round_trip():
  power = np.array([1.0, 0.25, 1e-3])
  db = ops.power_to_db(power)
  np.testing.assert_allclose(db, 10.0 * np.log10(power), atol=1e-4)
  np.testing.assert_allclose(ops.db_to_power(db), power, rtol=1e-4)


def test_power_to_db_clips_at_range():
  db = ops.power_to_db(np.array([1e-20]), range_db=80.0)
  np.testing.assert_allclose(db, -80.0)


def test_unit_hz_round_trip():
  unit = np.linspace(0.0, 1.0, 20)
  hz = ops.unit_to_hz(unit, hz_min=20.0, hz_max=8000.0)
  assert float(jnp.min(hz)) >= 19.99
  assert float(jnp.max(hz)) <= 8000.5
  round_trip = ops.hz_to_unit(hz, hz_min=20.0, hz_max=8000.0)
  np.testing.assert_allclose(round_trip, unit, atol=1e-4)


def test_mel_conversions_htk():
  hz = np.array([440.0, 1000.0])
  expected = 2595.0 * np.log10(1.0 + hz / 700.0)
  np.testing.assert_allclose(ops.hz_to_mel(hz), expected, rtol=1e-4)
  np.testing.assert_allclose(ops.mel_to_hz(ops.hz_to_mel(hz)), hz, rtol=1e-4)


def test_bark_round_trip():
  hz = np.array([100.0, 440.0, 4000.0])
  np.testing.assert_allclose(
      ops.bark_to_hz(ops.hz_to_bark(hz)), hz, rtol=1e-4)


def test_exp_sigmoid_bounds_and_midpoint():
  x = np.linspace(-50.0, 50.0, 101).astype(np.float32)
  y = np.asarray(ops.exp_sigmoid(x))
  assert np.all(y >= 1e-7)
  assert np.all(y <= 2.0 + 1e-6)
  # At x=0: 2.0 * 0.5**log(10) + 1e-7
  np.testing.assert_allclose(
      np.asarray(ops.exp_sigmoid(0.0)),
      2.0 * 0.5 ** np.log(10.0) + 1e-7,
      rtol=1e-5)
  # Monotonic.
  assert np.all(np.diff(y) >= 0)


def test_exp_sigmoid_exponent_slope():
  # In the nonlinear regime (but above the 1e-7 floor), output varies by
  # ~`exponent` per unit change of x.
  y1 = float(ops.exp_sigmoid(-5.0))
  y2 = float(ops.exp_sigmoid(-6.0))
  np.testing.assert_allclose(y1 / y2, 10.0, rtol=0.1)


def test_sym_exp_sigmoid_symmetric():
  x = np.linspace(-3, 3, 7).astype(np.float32)
  y = np.asarray(ops.sym_exp_sigmoid(x))
  np.testing.assert_allclose(y, y[::-1], rtol=1e-5)


def test_safe_divide_no_nan():
  out = np.asarray(ops.safe_divide(jnp.ones(3), jnp.zeros(3)))
  assert np.all(np.isfinite(out))


def test_safe_log_no_nan():
  out = np.asarray(ops.safe_log(jnp.array([-1.0, 0.0, 1.0])))
  assert np.all(np.isfinite(out))
  np.testing.assert_allclose(out[2], 0.0, atol=1e-6)


def test_log_scale():
  out = np.asarray(ops.log_scale(jnp.array([-1.0, 1.0]), 2.0, 100.0))
  np.testing.assert_allclose(out, [2.0, 100.0], rtol=1e-5)


def test_soft_limit_limits():
  x = np.linspace(-100, 100, 11).astype(np.float32)
  y = np.asarray(ops.soft_limit(x, 1.0, 2.0))
  assert np.all(y >= 1.0 - 1e-4)
  assert np.all(y <= 2.0 + 1e-4)


def test_gradient_reversal():
  import jax
  g = jax.grad(lambda x: ops.gradient_reversal(x * 2.0))(3.0)
  np.testing.assert_allclose(g, -2.0)
  # Forward is identity.
  np.testing.assert_allclose(float(ops.gradient_reversal(5.0)), 5.0)


def test_diff_matches_np():
  x = np.random.randn(2, 5, 3).astype(np.float32)
  np.testing.assert_allclose(ops.diff(x, axis=1), np.diff(x, axis=1),
                             atol=1e-6)
  np.testing.assert_allclose(ops.diff(x, axis=-1), np.diff(x, axis=-1),
                             atol=1e-6)


def test_diff_invalid_axis_raises():
  with pytest.raises(ValueError):
    ops.diff(np.zeros((2, 3)), axis=2)


def test_pad_axis():
  x = np.ones((2, 3, 4))
  out = ops.pad_axis(jnp.asarray(x), (1, 2), axis=1)
  assert out.shape == (2, 6, 4)
  np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0)


def test_nested_lookup():
  d = {'a': {'b': {'c': 1}}, 'x': 2}
  assert ops.nested_lookup('a/b/c', d) == 1
  assert ops.nested_lookup('x', d) == 2
  with pytest.raises(KeyError):
    ops.nested_lookup('a/b/missing', d)


def test_nested_keys():
  d = {'a': {'b': 1, 'c': 2}, 'd': 3}
  assert set(ops.nested_keys(d)) == {'a/b', 'a/c', 'd'}


def test_frequencies_softmax_bounds():
  x = np.random.randn(2, 10, 40).astype(np.float32)
  hz = np.asarray(ops.frequencies_softmax(x, depth=4, hz_min=20.0,
                                          hz_max=8000.0))
  assert hz.shape == (2, 10, 10)
  assert np.all(hz >= 19.99)
  assert np.all(hz <= 8000.01)


def test_frequencies_sigmoid_bounds():
  x = np.random.randn(2, 10, 40).astype(np.float32)
  hz = np.asarray(ops.frequencies_sigmoid(x, depth=4, hz_min=0.0,
                                          hz_max=8000.0))
  assert hz.shape == (2, 10, 10)
  assert np.all(hz >= -1e-3)
  assert np.all(hz <= 8000.01 * 1.01)


def test_frequencies_critical_bands_bounds():
  x = np.random.randn(2, 10, 30).astype(np.float32)
  hz = np.asarray(ops.frequencies_critical_bands(
      x, depth=3, hz_min=20.0, hz_max=8000.0, scale='bark'))
  assert hz.shape == (2, 10, 10)
  assert np.all(hz >= 19.0)
  assert np.all(hz <= 8010.0)
