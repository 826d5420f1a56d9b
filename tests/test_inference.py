"""End-to-end inference tests: train -> checkpoint -> streaming modules.

Mirrors the reference's VST serve story (SURVEY.md section 3.5): explicit
(GRU state, previous controls, oscillator phase) carries across per-frame
calls, plus offline AutoencoderInference reconstruction from the operative
spec, plus export artifacts.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddsp_tpu import infer, utils
from ddsp_tpu.data import SyntheticSinusoidProvider
from ddsp_tpu.parallel import create_mesh
from ddsp_tpu.train import Trainer


SR = 16000
FRAME_RATE = 50
HOP = SR // FRAME_RATE  # 320
SECONDS = 0.2  # 3200 samples + 320 extra
VST_KW = dict(seconds=SECONDS, frame_rate=FRAME_RATE, n_harmonics=8,
              n_noise_magnitudes=5, rnn_channels=16, ch=16, reverb=False)


@pytest.fixture(scope='module')
def vst_ckpt_dir(tmp_path_factory):
  """Train the tiny vst preset for 2 steps and save a checkpoint."""
  save_dir = str(tmp_path_factory.mktemp('vst_run'))
  model = utils.build_model('vst', **VST_KW)
  utils.save_spec(save_dir, 'vst', **VST_KW)

  # Training audio is seconds*sr; the synth renders one extra (center-pad)
  # hop and crops it back, so audio_synth matches the target length.
  n_samples = int(SECONDS * SR)
  n_frames = n_samples // HOP + 1  # center framing
  provider = SyntheticSinusoidProvider(
      n_samples=n_samples, sample_rate=SR, frame_rate=FRAME_RATE,
      n_examples=2)
  batch = next(provider.get_batch(2, shuffle=False))
  # The vst preset computes power online but takes f0 from the data at the
  # centered frame count.
  batch['f0_hz'] = np.full((2, n_frames), 220.0, np.float32)
  batch['f0_confidence'] = np.ones((2, n_frames), np.float32)

  trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                            devices=jax.devices()[:1]))
  state = trainer.init(batch)
  for _ in range(2):
    state, losses = trainer.train_step(state, batch)
  assert np.isfinite(float(losses['total_loss']))
  trainer.save(state, save_dir)
  return save_dir


class TestAutoencoderInference:

  @pytest.fixture(scope='class')
  def ae_ckpt_dir(self, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp('ae_run'))
    kw = dict(n_samples=4000, time_steps=50, n_harmonics=8,
              n_noise_magnitudes=5, reverb_length=1000,
              rnn_channels=16, ch=16, layers_per_stack=1)
    model = utils.build_model('solo_instrument', **kw)
    utils.save_spec(save_dir, 'solo_instrument', **kw)
    provider = SyntheticSinusoidProvider(n_samples=4000, sample_rate=SR,
                                         frame_rate=250, n_examples=2)
    batch = next(provider.get_batch(2, shuffle=False))
    trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                              devices=jax.devices()[:1]))
    state = trainer.init(batch)
    state, _ = trainer.train_step(state, batch)
    trainer.save(state, save_dir)
    return save_dir

  def test_rebuild_and_generate(self, ae_ckpt_dir):
    # New length (0.5 s), reverb removed, angular cumsum on.
    inference = infer.AutoencoderInference(ae_ckpt_dir, length_seconds=0.5,
                                           remove_reverb=True)
    assert inference.n_samples == int(0.5 * SR) // inference.hop_size * \
        inference.hop_size
    n_frames = inference.n_frames
    features = {
        'f0_hz': np.full((n_frames,), 220.0, np.float32),
        'loudness_db': np.full((n_frames,), -30.0, np.float32),
    }
    outputs = inference(features)
    audio = inference.get_audio(features)
    assert audio.shape == (1, inference.n_samples)
    assert np.all(np.isfinite(np.asarray(audio)))
    assert 'audio_synth' in outputs

  def test_rebuild_from_non_solo_preset(self, tmp_path):
    """Presets that don't accept the solo_instrument mutation kwargs
    (use_angular_cumsum etc.) must still load - unsupported overrides are
    dropped like gin mutations of bindings the config never had."""
    save_dir = str(tmp_path / 'tiny_run')
    kw = dict(n_samples=4000, time_steps=50, n_harmonics=8,
              n_noise_magnitudes=5, reverb_length=1000)
    model = utils.build_model('tiny', **kw)
    utils.save_spec(save_dir, 'tiny', **kw)
    provider = SyntheticSinusoidProvider(n_samples=4000, sample_rate=SR,
                                         frame_rate=250, n_examples=2)
    batch = next(provider.get_batch(2, shuffle=False))
    trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                              devices=jax.devices()[:1]))
    state = trainer.init(batch)
    trainer.save(state, save_dir)

    for remove_reverb in (False, True):
      inference = infer.AutoencoderInference(save_dir, length_seconds=0.25,
                                             remove_reverb=remove_reverb)
      audio = inference.get_audio({
          'f0_hz': np.full((inference.n_frames,), 220.0, np.float32),
          'loudness_db': np.full((inference.n_frames,), -30.0, np.float32),
      })
      assert np.all(np.isfinite(np.asarray(audio)))

  def test_keep_reverb_restores_all(self, ae_ckpt_dir):
    inference = infer.AutoencoderInference(ae_ckpt_dir, length_seconds=0.25,
                                           remove_reverb=False)
    audio = inference.get_audio({
        'f0_hz': np.full((inference.n_frames,), 330.0, np.float32),
        'loudness_db': np.full((inference.n_frames,), -25.0, np.float32),
    })
    assert np.all(np.isfinite(np.asarray(audio)))

  def test_export_params_and_stablehlo(self, ae_ckpt_dir, tmp_path):
    out = str(tmp_path / 'export')
    path = infer.export_model(ae_ckpt_dir, out, fmt='params',
                              length_seconds=0.25)
    assert os.path.exists(path)
    flat = np.load(path)
    assert len(flat.files) > 0
    from ddsp_tpu.infer.export import unflatten
    tree = unflatten({k: flat[k] for k in flat.files})
    assert 'decoder' in tree

    hlo_path = infer.export_model(ae_ckpt_dir, out, fmt='stablehlo',
                                  length_seconds=0.25)
    assert os.path.getsize(hlo_path) > 1000


  def test_export_impulse_response(self, ae_ckpt_dir, tmp_path):
    out = str(tmp_path / 'ir')
    path = infer.export_impulse_response(ae_ckpt_dir, out, target_sr=8000)
    import wave
    with wave.open(path) as w:
      assert w.getframerate() == SR
      assert w.getnframes() == 1000  # reverb_length of the fixture
    resampled = os.path.join(out, 'reverb_ir_8000_hz.wav')
    with wave.open(resampled) as w:
      assert w.getframerate() == 8000
      assert w.getnframes() == 500


class TestTFExport:
  """SavedModel / TFLite export parity (reference ddsp_export.py)."""

  @pytest.fixture(scope='class')
  def ae_ckpt_dir(self, tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp('ae_tf_run'))
    kw = dict(n_samples=4000, time_steps=50, n_harmonics=8,
              n_noise_magnitudes=5, reverb_length=1000,
              rnn_channels=16, ch=16, layers_per_stack=1)
    model = utils.build_model('solo_instrument', **kw)
    utils.save_spec(save_dir, 'solo_instrument', **kw)
    provider = SyntheticSinusoidProvider(n_samples=4000, sample_rate=SR,
                                         frame_rate=250, n_examples=2)
    batch = next(provider.get_batch(2, shuffle=False))
    trainer = Trainer(model, mesh=create_mesh(n_data=1,
                                              devices=jax.devices()[:1]))
    state = trainer.init(batch)
    trainer.save(state, save_dir)
    return save_dir

  def test_savedmodel_autoencoder_parity(self, ae_ckpt_dir, tmp_path):
    tf = pytest.importorskip('tensorflow')
    sm = infer.export_model(ae_ckpt_dir, str(tmp_path / 'sm'),
                            fmt='savedmodel', length_seconds=0.25)
    assert os.path.exists(os.path.join(sm, 'saved_model.pb'))
    # Mutated spec written next to the artifact.
    assert os.path.exists(os.path.join(str(tmp_path / 'sm'),
                                       'operative_spec.json'))

    inference = infer.AutoencoderInference(ae_ckpt_dir, length_seconds=0.25)
    n = inference.n_frames
    f0 = np.full((1, n, 1), 220.0, np.float32)
    ld = np.full((1, n, 1), -30.0, np.float32)
    want = np.asarray(inference._call(  # pylint: disable=protected-access
        inference.params, {'f0_hz': f0, 'loudness_db': ld})['audio_synth'])

    loaded = tf.saved_model.load(sm)
    out = loaded.signatures['serving_default'](
        f0_hz=tf.constant(f0), loudness_db=tf.constant(ld))
    got = list(out.values())[0].numpy()
    assert got.shape == want.shape == (1, inference.n_samples)
    np.testing.assert_allclose(got, want, atol=1e-4)

  def test_savedmodel_vst_predict_controls_parity(self, vst_ckpt_dir,
                                                  tmp_path):
    tf = pytest.importorskip('tensorflow')
    sm = infer.export_model(vst_ckpt_dir, str(tmp_path / 'sm'),
                            fmt='savedmodel',
                            inference_model='vst_stateless_predict_controls')
    predict = infer.VSTStatelessPredictControls(vst_ckpt_dir)
    f0 = np.asarray([0.5], np.float32)
    pw = np.asarray([0.6], np.float32)
    state = np.asarray(predict.initial_state())
    want = [np.asarray(t) for t in predict(f0, pw, state)]

    loaded = tf.saved_model.load(sm)
    out = loaded.signatures['serving_default'](
        f0_scaled=tf.constant(f0), pw_scaled=tf.constant(pw),
        state=tf.constant(state))
    got = [out[f'output_{i}'].numpy() for i in range(4)]
    for g, w in zip(got, want):
      np.testing.assert_allclose(g, w, atol=1e-5)

  def test_tflite_synthesize_noise(self, vst_ckpt_dir, tmp_path):
    tf = pytest.importorskip('tensorflow')
    path = infer.export_model(vst_ckpt_dir, str(tmp_path / 'lite'),
                              fmt='tflite',
                              inference_model='vst_synthesize_noise')
    assert os.path.getsize(path) > 100
    # Run the converted model when the flex delegate is available.
    try:
      interp = tf.lite.Interpreter(model_path=path)
      interp.allocate_tensors()
    except Exception:  # pylint: disable=broad-except
      return  # conversion itself is the contract; flex runtime optional
    inp = interp.get_input_details()[0]
    interp.set_tensor(inp['index'], np.full((5,), 0.1, np.float32))
    interp.invoke()
    audio = interp.get_tensor(interp.get_output_details()[0]['index'])
    synth = infer.VSTSynthesizeNoise(vst_ckpt_dir)
    want = np.asarray(synth(jnp.full((5,), 0.1)))
    np.testing.assert_allclose(audio, want, atol=1e-5)

  def test_tfjs_raises(self, vst_ckpt_dir, tmp_path):
    with pytest.raises(NotImplementedError):
      infer.export_model(vst_ckpt_dir, str(tmp_path / 'x'), fmt='tfjs')


class TestVSTStreaming:

  def test_extract_features(self, vst_ckpt_dir):
    extract = infer.VSTExtractFeatures(vst_ckpt_dir, compute_f0=False)
    audio = np.random.RandomState(0).randn(1024).astype(np.float32) * 0.1
    f0_hz, f0_scaled, pw_db, pw_scaled = extract(audio)
    for t in [f0_hz, f0_scaled, pw_db, pw_scaled]:
      assert t.shape == (1,)
    assert float(pw_db[0]) < 0  # quiet noise

  def test_stateless_predict_controls_and_synthesize(self, vst_ckpt_dir):
    predict = infer.VSTStatelessPredictControls(vst_ckpt_dir)
    synth = infer.VSTSynthesize(vst_ckpt_dir)

    state = predict.initial_state()
    phase = synth.initial_phase()
    prev = None

    audio_chunks = []
    rng = np.random.RandomState(1)
    states = []
    for i in range(4):
      f0_scaled = jnp.asarray([0.55 + 0.001 * i])
      pw_scaled = jnp.asarray([0.6])
      amps, hd, noise, state = predict(f0_scaled, pw_scaled, state)
      assert amps.shape == (1,)
      assert hd.shape == (8,)
      assert noise.shape == (5,)
      assert state.shape == (16,)
      states.append(np.asarray(state))
      if prev is None:
        prev = (amps, hd, f0_scaled)
      audio, phase = synth(amps, prev[0], hd, prev[1],
                           jnp.asarray([220.0 + i]), jnp.asarray([220.0]),
                           noise, phase)
      assert audio.shape == (HOP,)
      assert phase.shape == (1,)
      assert np.all(np.isfinite(np.asarray(audio)))
      prev = (amps, hd, f0_scaled)
      audio_chunks.append(np.asarray(audio))

    # State evolves across calls (real recurrence).
    assert not np.allclose(states[0], states[-1])

  def test_stateful_predict_controls_carries_state(self, vst_ckpt_dir):
    """The stateful variant == stateless variant with a threaded state.

    Reference VSTPredictControls holds Keras GRU state across calls
    (inference.py:249-299); here the wrapper carries it. reset() must
    reproduce the from-scratch sequence.
    """
    stateful = infer.VSTPredictControls(vst_ckpt_dir)
    stateless = infer.VSTStatelessPredictControls(vst_ckpt_dir)

    def run_stateful(n):
      outs = []
      for i in range(n):
        f0 = jnp.asarray([0.5 + 0.01 * i])
        pw = jnp.asarray([0.6])
        outs.append([np.asarray(t) for t in stateful(f0, pw)])
      return outs

    outs1 = run_stateful(3)

    # Same sequence through the stateless API.
    state = stateless.initial_state()
    for i in range(3):
      f0 = jnp.asarray([0.5 + 0.01 * i])
      pw = jnp.asarray([0.6])
      amps, hd, noise, state = stateless(f0, pw, state)
      for got, want in zip(outs1[i], (amps, hd, noise)):
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)

    # Second repetition WITHOUT reset differs (state carried over) ...
    outs2 = run_stateful(3)
    assert not np.allclose(outs1[0][1], outs2[0][1], atol=1e-7)
    # ... and WITH reset reproduces the original sequence exactly.
    stateful.reset()
    outs3 = run_stateful(3)
    for a, b in zip(outs1, outs3):
      for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

  def test_phase_carry_continuity(self, vst_ckpt_dir):
    """Streaming two hops with carry == synthesizing one long segment."""
    synth = infer.VSTSynthesize(vst_ckpt_dir)
    amps = jnp.asarray([0.5])
    hd = jnp.ones((8,)) / 8.0
    f0 = jnp.asarray([440.0])
    noise = jnp.zeros((5,)) + 1e-8

    phase = synth.initial_phase()
    a1, phase = synth(amps, amps, hd, hd, f0, f0, noise, phase)
    a2, phase = synth(amps, amps, hd, hd, f0, f0, noise, phase)
    streamed = np.concatenate([np.asarray(a1), np.asarray(a2)])

    # Reference: constant controls, one 2-hop segment via the same op.
    from ddsp_tpu.ops import oscillator
    f02 = jnp.full((1, 2, 1), 440.0)
    amps2 = jnp.full((1, 2, 1), 0.5)
    hd2 = jnp.ones((1, 2, 8)) / 8.0
    long_audio, _ = oscillator.streaming_harmonic_synthesis(
        frequencies=f02, amplitudes=amps2, harmonic_distribution=hd2,
        initial_phase=jnp.zeros((1, 1, 1)), n_samples=2 * HOP,
        sample_rate=SR, amp_resample_method='linear')
    # Compare the harmonic part (noise is ~0).
    np.testing.assert_allclose(streamed, np.asarray(long_audio)[0],
                               atol=1e-3)

  def test_harmonic_and_noise_only_variants(self, vst_ckpt_dir):
    synth_h = infer.VSTSynthesizeHarmonic(vst_ckpt_dir)
    amps = jnp.asarray([0.5])
    hd = jnp.ones((8,)) / 8.0
    f0 = jnp.asarray([440.0])
    audio, phase = synth_h(amps, amps, hd, hd, f0, f0,
                           synth_h.initial_phase())
    assert audio.shape == (HOP,)
    assert np.any(np.asarray(audio) != 0)

    synth_n = infer.VSTSynthesizeNoise(vst_ckpt_dir)
    noise_audio = synth_n(jnp.full((5,), 0.1))
    assert noise_audio.shape == (HOP,)
    assert np.any(np.asarray(noise_audio) != 0)


class TestDeviceIndependentRestore:

  def test_load_params_without_target_returns_host_arrays(self, tmp_path):
    """A mesh-trained checkpoint must load in a process with a DIFFERENT
    device set (e.g. single-chip inference of a pod-trained model). The
    no-target path restores to host numpy via the checkpoint's own
    metadata instead of recreating the saved shardings."""
    provider = SyntheticSinusoidProvider(n_samples=8192, sample_rate=16000,
                                         frame_rate=250, n_examples=2)
    batch = next(provider.get_batch(2, shuffle=False))
    # t_local (8192/2) must clear the largest loss fft size (2048).
    model = utils.build_model('tiny', n_samples=8192, time_steps=64,
                              n_harmonics=6, n_noise_magnitudes=9,
                              reverb_length=500)
    mesh = create_mesh(n_data=2, n_time=2, devices=jax.devices()[:4])
    trainer = Trainer(model, mesh=mesh)
    state = trainer.init(batch)
    state, _ = trainer.train_step(state, batch)
    trainer.save(state, str(tmp_path))

    params = infer.load_params(str(tmp_path))
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(isinstance(l, np.ndarray) for l in leaves)
