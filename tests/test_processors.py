"""Tests for the Processor protocol, synths, effects, and ProcessorGroup DAG.

Mirrors reference synths_test.py:25-105, effects_test.py:37-115,
processors_test.py:26-88, dags_test.py:32-84.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import ops
from ddsp_tpu import proc


RNGS = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}


def init_and_apply(module, *args, rngs=None, method=None, **kwargs):
  rngs = dict(RNGS) if rngs is None else rngs
  variables = module.init(rngs, *args, **kwargs)
  out = module.apply(variables, *args,
                     rngs={'noise': jax.random.PRNGKey(2)}, **kwargs)
  return out, variables


class TestSynths:

  def test_harmonic_output_shape(self):
    synth = proc.Harmonic(n_samples=8000, sample_rate=16000)
    batch, n_frames, n_harmonics = 3, 100, 13
    amp = np.random.randn(batch, n_frames, 1).astype(np.float32)
    hd = np.random.randn(batch, n_frames, n_harmonics).astype(np.float32)
    f0 = 440.0 * np.ones((batch, n_frames, 1), np.float32)
    out, _ = init_and_apply(synth, amp, hd, f0)
    assert out.shape == (batch, 8000)

  def test_harmonic_controls_normalized(self):
    synth = proc.Harmonic(n_samples=16000)
    batch, n_frames, n_harmonics = 2, 10, 8
    amp = np.random.randn(batch, n_frames, 1).astype(np.float32)
    hd = np.random.randn(batch, n_frames, n_harmonics).astype(np.float32)
    f0 = 440.0 * np.ones((batch, n_frames, 1), np.float32)
    out, variables = init_and_apply(synth, amp, hd, f0,
                                    return_outputs_dict=True)
    controls = out['controls']
    np.testing.assert_allclose(
        np.asarray(controls['harmonic_distribution']).sum(-1), 1.0,
        atol=1e-4)
    assert np.all(np.asarray(controls['amplitudes']) > 0)

  def test_filtered_noise_output_shape_and_rng(self):
    synth = proc.FilteredNoise(n_samples=4000, window_size=65)
    mags = np.random.randn(2, 20, 33).astype(np.float32)
    variables = synth.init(RNGS, mags)
    out1 = synth.apply(variables, mags, rngs={'noise': jax.random.PRNGKey(1)})
    out2 = synth.apply(variables, mags, rngs={'noise': jax.random.PRNGKey(1)})
    out3 = synth.apply(variables, mags, rngs={'noise': jax.random.PRNGKey(9)})
    assert out1.shape == (2, 4000)
    np.testing.assert_allclose(out1, out2)  # Same key -> same noise.
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6

  def test_sinusoidal_output_shape_and_nyquist(self):
    synth = proc.Sinusoidal(n_samples=4000, sample_rate=16000)
    amps = np.random.randn(2, 100, 10).astype(np.float32)
    freqs = np.random.randn(2, 100, 10).astype(np.float32)
    out, _ = init_and_apply(synth, amps, freqs, return_outputs_dict=True)
    assert out['signal'].shape == (2, 4000)
    f = np.asarray(out['controls']['frequencies'])
    assert np.all(f >= 0)
    assert np.all(f <= 8000.01)

  def test_wavetable_output_shape(self):
    synth = proc.Wavetable(n_samples=4000)
    amps = np.random.randn(2, 50, 1).astype(np.float32)
    wavetables = np.random.randn(2, 50, 128).astype(np.float32)
    f0 = 440 * np.ones((2, 50, 1), np.float32)
    out, _ = init_and_apply(synth, amps, wavetables, f0)
    assert out.shape == (2, 4000)

  def test_tensor_to_audio(self):
    synth = proc.TensorToAudio()
    x = np.random.randn(2, 1000, 1).astype(np.float32)
    out, _ = init_and_apply(synth, x)
    assert out.shape == (2, 1000)


class TestEffects:

  def test_reverb_provided_ir(self):
    effect = proc.Reverb(trainable=False)
    audio = np.random.randn(2, 4000).astype(np.float32)
    ir = np.random.randn(2, 1000).astype(np.float32) * 0.1
    out, _ = init_and_apply(effect, audio, ir)
    assert out.shape == (2, 4000)

  def test_reverb_trainable_param(self):
    effect = proc.Reverb(trainable=True, reverb_length=2000)
    audio = np.random.randn(2, 4000).astype(np.float32)
    variables = effect.init(RNGS, audio)
    assert variables['params']['ir'].shape == (2000,)
    out = effect.apply(variables, audio)
    assert out.shape == (2, 4000)

  def test_reverb_add_dry_false(self):
    effect = proc.Reverb(trainable=False, add_dry=False)
    audio = np.random.randn(1, 8000).astype(np.float32)
    # Identity IR (dry masked, so output should be near zero).
    ir = np.zeros((1, 100), np.float32)
    ir[0, 0] = 1.0
    out, _ = init_and_apply(effect, audio, ir)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

  def test_exp_decay_reverb_trainable(self):
    effect = proc.ExpDecayReverb(trainable=True, reverb_length=2000)
    audio = np.random.randn(2, 4000).astype(np.float32)
    variables = effect.init(RNGS, audio)
    assert variables['params']['gain'].shape == (1,)
    assert variables['params']['decay'].shape == (1,)
    out = effect.apply(variables, audio,
                       rngs={'noise': jax.random.PRNGKey(0)})
    assert out.shape == (2, 4000)

  def test_exp_decay_reverb_controls(self):
    effect = proc.ExpDecayReverb(trainable=False, reverb_length=4000)
    audio = np.random.randn(1, 8000).astype(np.float32)
    gain = np.ones((1, 1), np.float32)
    decay = np.ones((1, 1), np.float32) * 3.0
    out, _ = init_and_apply(effect, audio, gain, decay)
    assert out.shape == (1, 8000)

  def test_filtered_noise_reverb(self):
    effect = proc.FilteredNoiseReverb(trainable=True, reverb_length=2000,
                                      n_frames=20, n_filter_banks=16)
    audio = np.random.randn(2, 4000).astype(np.float32)
    variables = effect.init(RNGS, audio)
    assert variables['params']['magnitudes'].shape == (20, 16)
    out = effect.apply(variables, audio,
                       rngs={'noise': jax.random.PRNGKey(0)})
    assert out.shape == (2, 4000)

  def test_fir_filter(self):
    effect = proc.FIRFilter(window_size=65)
    audio = np.random.randn(2, 4000).astype(np.float32)
    mags = np.random.randn(2, 20, 33).astype(np.float32)
    out, _ = init_and_apply(effect, audio, mags)
    assert out.shape == (2, 4000)

  def test_mod_delay(self):
    effect = proc.ModDelay(sample_rate=16000)
    n = 2000
    audio = np.random.randn(1, n).astype(np.float32)
    gain = np.random.randn(1, n, 1).astype(np.float32)
    phase = np.random.randn(1, n, 1).astype(np.float32)
    out, _ = init_and_apply(effect, audio, gain, phase)
    assert out.shape == (1, n)


class TestRouting:

  def test_add(self):
    module = proc.Add()
    a = np.ones((2, 100), np.float32)
    b = 2 * np.ones((2, 100), np.float32)
    out, _ = init_and_apply(module, a, b)
    np.testing.assert_allclose(np.asarray(out), 3.0)

  def test_mix_crossfade_formula(self):
    module = proc.Mix()
    a = np.ones((1, 100, 1), np.float32)
    b = -np.ones((1, 100, 1), np.float32)
    level = np.zeros((1, 10, 1), np.float32)  # sigmoid -> 0.5
    out, _ = init_and_apply(module, a, b, level)
    # Reference formula: sqrt(|m|)*a + (1 - sqrt(|m - 1|))*b at m=0.5.
    want = np.sqrt(0.5) * 1.0 + (1.0 - np.sqrt(0.5)) * -1.0
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-3)

  def test_mix_2d_signals_keep_rank(self):
    """A [batch, n, 1] mix level against 2-D signals must yield 2-D audio
    (the old broadcast built a [batch, n, n] matrix instead)."""
    module = proc.Mix()
    a = np.ones((1, 100), np.float32)
    b = -np.ones((1, 100), np.float32)
    level = np.zeros((1, 10, 1), np.float32)
    out, _ = init_and_apply(module, a, b, level)
    assert out.shape == (1, 100), out.shape
    want = np.sqrt(0.5) * 1.0 + (1.0 - np.sqrt(0.5)) * -1.0
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-3)

  def test_mix_length_mismatch_raises(self):
    module = proc.Mix()
    a = np.ones((1, 100), np.float32)
    b = np.ones((1, 50), np.float32)
    level = np.ones((1, 10, 1), np.float32)
    with pytest.raises(ValueError):
      module.init(RNGS, a, b, level)

  @pytest.mark.parametrize('location,expected',
                           [('front', (1, 900)), ('center', (1, 900)),
                            ('back', (1, 900))])
  def test_crop(self, location, expected):
    module = proc.Crop(frame_size=100, crop_location=location)
    x = np.random.randn(1, 1000).astype(np.float32)
    out, _ = init_and_apply(module, x)
    assert out.shape == expected


class TestProcessorGroup:
  """Full harmonic + noise + add + reverb chain from a dag list."""

  def _get_dag_and_inputs(self):
    n_samples, n_frames = 4000, 50
    batch = 2
    dag = [
        (proc.Harmonic(n_samples=n_samples, name='harmonic'),
         ['amps', 'harmonic_distribution', 'f0_hz']),
        (proc.FilteredNoise(n_samples=n_samples, name='filtered_noise'),
         ['noise_magnitudes']),
        (proc.Add(name='add'),
         ['filtered_noise/signal', 'harmonic/signal']),
        (proc.ExpDecayReverb(trainable=True, reverb_length=2000,
                             name='reverb'),
         ['add/signal']),
    ]
    inputs = {
        'amps': np.random.randn(batch, n_frames, 1).astype(np.float32),
        'harmonic_distribution':
            np.random.randn(batch, n_frames, 20).astype(np.float32),
        'f0_hz': 440.0 * np.ones((batch, n_frames, 1), np.float32),
        'noise_magnitudes':
            np.random.randn(batch, n_frames, 33).astype(np.float32),
    }
    return dag, inputs, batch, n_samples

  def test_dag_outputs_structure(self):
    dag, inputs, batch, n_samples = self._get_dag_and_inputs()
    pg = proc.ProcessorGroup(dag=dag)
    variables = pg.init(RNGS, inputs, return_outputs_dict=True)
    out = pg.apply(variables, inputs, return_outputs_dict=True,
                   rngs={'noise': jax.random.PRNGKey(0)})
    assert out['signal'].shape == (batch, n_samples)
    controls = out['controls']
    # Per-node nested outputs with reference key contract.
    for key in ['harmonic/signal',
                'harmonic/controls/amplitudes',
                'harmonic/controls/harmonic_distribution',
                'harmonic/controls/f0_hz',
                'filtered_noise/signal',
                'filtered_noise/controls/magnitudes',
                'add/signal',
                'reverb/signal',
                'reverb/controls/ir',
                'out/signal']:
      v = ops.nested_lookup(key, controls)
      assert v is not None
    np.testing.assert_allclose(
        np.asarray(ops.nested_lookup('out/signal', controls)),
        np.asarray(out['signal']))

  def test_trainable_params_nested_under_node_names(self):
    dag, inputs, _, _ = self._get_dag_and_inputs()
    pg = proc.ProcessorGroup(dag=dag)
    variables = pg.init(RNGS, inputs)
    params = variables['params']
    assert 'reverb' in params
    assert set(params['reverb'].keys()) == {'gain', 'decay'}

  def test_signal_only_call(self):
    dag, inputs, batch, n_samples = self._get_dag_and_inputs()
    pg = proc.ProcessorGroup(dag=dag)
    variables = pg.init(RNGS, inputs)
    signal = pg.apply(variables, inputs,
                      rngs={'noise': jax.random.PRNGKey(0)})
    assert signal.shape == (batch, n_samples)

  def test_dag_is_jittable_and_differentiable(self):
    dag, inputs, _, _ = self._get_dag_and_inputs()
    pg = proc.ProcessorGroup(dag=dag)
    variables = pg.init(RNGS, inputs)

    @jax.jit
    def loss_fn(params, inputs):
      signal = pg.apply({'params': params}, inputs,
                        rngs={'noise': jax.random.PRNGKey(0)})
      return jnp.mean(signal**2)

    loss, grads = jax.value_and_grad(loss_fn)(variables['params'], inputs)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    # Trainable reverb gets a NONZERO gradient (>= 0 would be vacuous).
    assert np.abs(np.asarray(grads['reverb']['decay'])).max() > 0.0


class TestDagModule:

  def test_output_keys_for_non_dict_module(self):
    """Plain callables returning tuples get keyed by output_keys."""

    class Splitter(proc.Processor):

      def get_controls(self, x):
        return {'x': x}

      def get_signal(self, x):
        return x * 2.0

    dag = [(Splitter(name='doubler'), ['x'])]
    pg = proc.ProcessorGroup(dag=dag)
    x = np.ones((1, 10), np.float32)
    variables = pg.init(RNGS, {'x': x})
    out = pg.apply(variables, {'x': x}, return_outputs_dict=True)
    np.testing.assert_allclose(
        np.asarray(out['controls']['doubler']['signal']), 2.0)

  def test_duplicate_names_raise(self):
    dag = [
        (proc.Add(name='a'), ['x', 'x']),
        (proc.Add(name='a'), ['x', 'x']),
    ]
    pg = proc.ProcessorGroup(dag=dag)
    with pytest.raises(ValueError):
      pg.init(RNGS, {'x': np.ones((1, 4), np.float32)})

  def test_inputs_accessible_via_inputs_prefix(self):
    dag = [(proc.Add(name='add'), ['inputs/x', 'x'])]
    pg = proc.ProcessorGroup(dag=dag)
    x = np.ones((1, 4), np.float32)
    variables = pg.init(RNGS, {'x': x})
    out = pg.apply(variables, {'x': x})
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_variable_length_delay_saturated_phase_clamps():
  """Phase 1.0 must read the MAXIMUM delay, not wrap around and blend in
  the dry (zero-delay) sample."""
  import jax.numpy as jnp
  from ddsp_tpu.ops.wavetable import variable_length_delay
  n, max_len = 64, 16
  audio = jnp.asarray(np.arange(1, n + 1, dtype=np.float32))[jnp.newaxis, :]
  phase = jnp.ones((1, n, 1))
  out = np.asarray(variable_length_delay(phase, audio, max_length=max_len))
  # Delay of max_length - 1 samples: out[t] = audio[t - (max_len - 1)]
  # (zero-padded history before that).
  expect = np.concatenate([np.zeros(max_len - 1),
                           np.arange(1, n - max_len + 2)]).astype(np.float32)
  np.testing.assert_allclose(out[0], expect, atol=1e-5)
