"""Tests for consistency, Wasserstein, KDE, TWM, and HMM losses.

Mirrors the reference's test strategy (losses_test.py): golden values vs
scipy where available, shape/finiteness/behavioral properties otherwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from ddsp_tpu import losses
from ddsp_tpu.ops import hmm


RNG = np.random.RandomState(42)


class TestWassersteinDistance:

  def test_matches_scipy_weighted(self):
    u = RNG.rand(16).astype(np.float32) * 10
    v = RNG.rand(16).astype(np.float32) * 10
    uw = RNG.rand(16).astype(np.float32) + 0.1
    vw = RNG.rand(16).astype(np.float32) + 0.1
    got = losses.wasserstein_distance(u[None], v[None], uw[None], vw[None])
    want = scipy.stats.wasserstein_distance(u, v, uw, vw)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4)

  def test_matches_scipy_unweighted(self):
    u = RNG.rand(32).astype(np.float32)
    v = RNG.rand(32).astype(np.float32)
    got = losses.wasserstein_distance(u[None], v[None])
    want = scipy.stats.wasserstein_distance(u, v)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4)

  def test_zero_for_identical(self):
    u = RNG.rand(2, 3, 8).astype(np.float32)
    w = RNG.rand(2, 3, 8).astype(np.float32) + 0.1
    got = losses.wasserstein_distance(u, u, w, w)
    np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-5)

  def test_batched_shape(self):
    u = RNG.rand(2, 5, 8).astype(np.float32)
    v = RNG.rand(2, 5, 8).astype(np.float32)
    got = losses.wasserstein_distance(u, v)
    assert got.shape == (2, 5)

  def test_differentiable(self):
    u = jnp.asarray(RNG.rand(1, 8).astype(np.float32))
    v = jnp.asarray(RNG.rand(1, 8).astype(np.float32))
    g = jax.grad(lambda a: jnp.sum(losses.wasserstein_distance(a, v)))(u)
    assert np.all(np.isfinite(np.asarray(g)))


class TestMixtureLogProb:

  def test_matches_scipy_gmm(self):
    locs = np.array([60.0, 64.0, 67.0], dtype=np.float32)
    probs = np.array([0.5, 0.3, 0.2], dtype=np.float32)
    scale = 0.7
    x = np.linspace(55, 70, 11).astype(np.float32)
    got = losses.mixture_log_prob(jnp.asarray(x), jnp.asarray(probs),
                                  jnp.asarray(locs), scale)
    want = np.log(sum(p * scipy.stats.norm.pdf(x, m, scale)
                      for p, m in zip(probs, locs)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TestConsistencyLosses:

  def test_filtered_noise_zero_when_equal(self):
    mags = jnp.asarray(RNG.rand(2, 10, 65).astype(np.float32))
    loss_mod = losses.FilteredNoiseConsistencyLoss()
    assert float(loss_mod(mags, mags)) == 0.0
    assert float(loss_mod(mags, mags + 0.5)) > 0.0

  def test_harmonic_consistency_returns_dict(self):
    b, t = 2, 10
    harm_amp = jnp.asarray(RNG.rand(b, t, 1).astype(np.float32))
    harm_dist = jnp.asarray(RNG.rand(b, t, 20).astype(np.float32))
    f0 = jnp.asarray(200 + 100 * RNG.rand(b, t, 1).astype(np.float32))
    loss_mod = losses.HarmonicConsistencyLoss()
    out = loss_mod(harm_amp, harm_amp, harm_dist, harm_dist, f0, f0)
    assert set(out) == {'harm_amp_loss', 'harm_dist_loss', 'f0_hz_loss'}
    for v in out.values():
      np.testing.assert_allclose(float(v), 0.0, atol=1e-6)

  def test_harmonic_consistency_amp_threshold_masks(self):
    # Below-threshold target amps mask the dist/f0 terms entirely.
    b, t = 1, 4
    harm_amp = jnp.full((b, t, 1), 1e-6)
    harm_dist_a = jnp.asarray(RNG.rand(b, t, 8).astype(np.float32))
    harm_dist_b = jnp.asarray(RNG.rand(b, t, 8).astype(np.float32))
    f0_a = jnp.full((b, t, 1), 200.0)
    f0_b = jnp.full((b, t, 1), 400.0)
    out = losses.HarmonicConsistencyLoss()(
        harm_amp, harm_amp, harm_dist_a, harm_dist_b, f0_a, f0_b)
    np.testing.assert_allclose(float(out['harm_dist_loss']), 0.0, atol=1e-7)
    np.testing.assert_allclose(float(out['f0_hz_loss']), 0.0, atol=1e-7)

  def test_wasserstein_consistency_scalar(self):
    b, t, k = 2, 5, 10
    amps = jnp.asarray(RNG.rand(b, t, k).astype(np.float32))
    freqs = jnp.asarray(100 + 1000 * RNG.rand(b, t, k).astype(np.float32))
    loss_mod = losses.WassersteinConsistencyLoss()
    same = float(loss_mod(amps, freqs, amps, freqs))
    diff = float(loss_mod(amps, freqs, amps, freqs * 2.0))
    np.testing.assert_allclose(same, 0.0, atol=1e-4)
    assert diff > same

  def test_kde_consistency(self):
    b, t, k = 2, 5, 10
    amps = jnp.asarray(RNG.rand(b, t, k).astype(np.float32) + 0.1)
    freqs = jnp.asarray(100 + 1000 * RNG.rand(b, t, k).astype(np.float32))
    loss_mod = losses.KDEConsistencyLoss()
    same = float(loss_mod(amps, freqs, amps, freqs))
    far = float(loss_mod(amps, freqs, amps, freqs * 3.0))
    assert np.isfinite(same) and np.isfinite(far)
    assert far > same

  def test_kde_differentiable(self):
    b, t, k = 1, 3, 6
    amps = jnp.asarray(RNG.rand(b, t, k).astype(np.float32) + 0.1)
    freqs_a = jnp.asarray(100 + 500 * RNG.rand(b, t, k).astype(np.float32))
    freqs_b = jnp.asarray(100 + 500 * RNG.rand(b, t, k).astype(np.float32))
    loss_mod = losses.KDEConsistencyLoss()
    g = jax.grad(lambda f: loss_mod(amps, f, amps, freqs_b))(freqs_a)
    assert np.all(np.isfinite(np.asarray(g)))


class TestTWMLoss:

  def _sinusoids(self, f0=220.0, n_partials=8, b=1, t=5):
    n = np.arange(1, n_partials + 1, dtype=np.float32)
    freqs = np.tile(f0 * n, (b, t, 1))
    amps = np.tile(1.0 / n, (b, t, 1))
    return jnp.asarray(freqs), jnp.asarray(amps)

  def test_predict_f0_finds_fundamental(self):
    f0_true = 220.0
    freqs, amps = self._sinusoids(f0_true)
    candidates = jnp.asarray(
        np.tile(np.linspace(110.0, 440.0, 31, dtype=np.float32), (1, 5, 1)))
    twm = losses.TWMLoss()
    f0_pred = twm.predict_f0(candidates, freqs, amps)
    np.testing.assert_allclose(f0_pred, f0_true, rtol=0.03)

  def test_loss_scalar_and_grad(self):
    freqs, amps = self._sinusoids()
    candidates = jnp.asarray(
        np.tile(np.linspace(110.0, 440.0, 16, dtype=np.float32), (1, 5, 1)))
    twm = losses.TWMLoss()
    val, g = jax.value_and_grad(
        lambda f: twm(candidates, f, amps))(freqs)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))


class TestHmm:

  def test_forward_matches_brute_force(self):
    # Tiny 2-state HMM: compare lax.scan forward to explicit enumeration.
    n_states, t = 2, 4
    rng = np.random.RandomState(0)
    init = rng.dirichlet(np.ones(n_states)).astype(np.float32)
    trans = rng.dirichlet(np.ones(n_states), size=n_states).astype(np.float32)
    obs_ll = rng.randn(1, t, n_states).astype(np.float32)

    got = hmm.forward_log_prob(jnp.log(init), jnp.log(trans),
                               jnp.asarray(obs_ll))

    # Brute force over all state paths.
    total = 0.0
    import itertools
    for path in itertools.product(range(n_states), repeat=t):
      p = init[path[0]] * np.exp(obs_ll[0, 0, path[0]])
      for i in range(1, t):
        p *= trans[path[i - 1], path[i]] * np.exp(obs_ll[0, i, path[i]])
      total += p
    np.testing.assert_allclose(float(got[0]), np.log(total), rtol=1e-5)

  def test_viterbi_recovers_clean_path(self):
    n_states, t = 4, 12
    true_path = np.array([0, 0, 0, 2, 2, 2, 2, 1, 1, 3, 3, 3])
    obs_ll = np.full((1, t, n_states), -10.0, dtype=np.float32)
    obs_ll[0, np.arange(t), true_path] = 0.0
    init = jnp.full((n_states,), np.log(1.0 / n_states))
    trans = jnp.log(jnp.full((n_states, n_states), 1.0 / n_states))
    got = hmm.viterbi_decode(init, trans, jnp.asarray(obs_ll))
    np.testing.assert_array_equal(np.asarray(got)[0], true_path)

  def test_transcriber_nll_and_decode(self):
    transcriber = losses.HmmTranscriber.create(n_pitches=32, avg_length=5)
    t = 20
    # Pitch trace: note 10 then note 20, amps "on".
    pitch = np.concatenate([np.full(10, 10.0), np.full(10, 20.0)])
    pitch = pitch[None, :, None].astype(np.float32)
    pitch_noisy = pitch + 0.2 * RNG.randn(1, t, 1).astype(np.float32)
    amps = np.full((1, t, 1), 1.5, dtype=np.float32)

    nll = transcriber.nll(jnp.asarray(pitch_noisy), jnp.asarray(amps))
    assert np.isfinite(float(nll))

    q = transcriber.predict_midi(jnp.asarray(pitch_noisy), jnp.asarray(amps))
    assert q.shape == (1, t, 1)
    np.testing.assert_array_equal(np.asarray(q)[0, :, 0],
                                  pitch[0, :, 0].round())

  def test_transcriber_off_state(self):
    transcriber = losses.HmmTranscriber.create(n_pitches=32, avg_length=5)
    t = 8
    pitch = np.full((1, t, 1), 16.0, dtype=np.float32)
    amps = np.zeros((1, t, 1), dtype=np.float32)  # silent -> off state 0
    q = transcriber.predict_midi(jnp.asarray(pitch), jnp.asarray(amps))
    np.testing.assert_array_equal(np.asarray(q), 0.0)

  def test_straight_through(self):
    x = jnp.asarray([1.2, 2.7])
    xq = jnp.round(x)
    y = losses.HmmTranscriber.straight_through(x, xq)
    np.testing.assert_allclose(np.asarray(y), [1.0, 3.0])
    g = jax.grad(lambda a: jnp.sum(
        losses.HmmTranscriber.straight_through(a, jnp.round(a))))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])


class TestLossGroupWithNewLosses:

  def test_amp_freq_helpers(self):
    a = jnp.asarray(RNG.rand(2, 4).astype(np.float32) + 0.1)
    assert float(losses.amp_loss(a, a)) == 0.0
    assert float(losses.amp_loss(a, a, log=True)) == 0.0
    f = jnp.asarray(200 + RNG.rand(2, 4).astype(np.float32) * 100)
    assert float(losses.freq_loss(f, f)) == 0.0
    # freq_loss is in MIDI: octave apart = 12.
    np.testing.assert_allclose(float(losses.freq_loss(f, 2 * f)), 12.0,
                               rtol=1e-4)


class TestEmbeddingLossBase:

  def test_subclass_embedding_distance(self):
    class FrameEmbedding(losses.EmbeddingLoss):
      """Trivial embedding: non-overlapping 4-sample frames."""

      def _embedding(self, audio):
        return jnp.reshape(audio, (audio.shape[0], -1, 4))

    audio_a = jnp.asarray(RNG.randn(2, 64).astype(np.float32))
    audio_b = jnp.asarray(RNG.randn(2, 64).astype(np.float32))
    loss_fn = FrameEmbedding(weight=2.0, scale=3.0, loss_type='L1')
    got = float(loss_fn(audio_a, audio_b))
    want = 6.0 * float(jnp.mean(jnp.abs(audio_a - audio_b)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # Identical inputs and zero weight are both exactly zero.
    assert float(loss_fn(audio_a, audio_a)) == 0.0
    assert float(FrameEmbedding(weight=0.0)(audio_a, audio_b)) == 0.0

  def test_target_embedding_detached(self):
    class FrameEmbedding(losses.EmbeddingLoss):

      def _embedding(self, audio):
        return jnp.reshape(audio, (audio.shape[0], -1, 4))

    loss_fn = FrameEmbedding(weight=1.0)
    audio = jnp.asarray(RNG.randn(1, 16).astype(np.float32))
    target = jnp.asarray(RNG.randn(1, 16).astype(np.float32))
    # Gradient flows into the synthesized audio but not the target.
    g_target = jax.grad(lambda t: loss_fn(t, audio))(target)
    g_audio = jax.grad(lambda a: loss_fn(target, a))(audio)
    assert float(jnp.abs(g_target).max()) == 0.0
    assert float(jnp.abs(g_audio).max()) > 0.0

  def test_crepe_loss_inherits_base(self):
    assert issubclass(losses.PretrainedCREPEEmbeddingLoss,
                      losses.EmbeddingLoss)


class TestSpectralLossBf16Default:
  """The bf16-by-default GEMM loss stays within 0.5% of float32.

  The bf16 path only engages on the TPU GEMM-DFT magnitudes; on CPU it is
  exercised through force_matmul_dft. This is the escape-hatch golden the
  default flip is conditioned on (spectral GEMMs default to 'bfloat16').
  """

  def test_default_is_bfloat16(self):
    assert losses.SpectralLoss().compute_dtype == 'bfloat16'

  def test_bf16_loss_within_half_percent_of_f32(self):
    from ddsp_tpu.ops import fft_matmul
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.3)
    audio = jnp.asarray(rng.randn(2, 4096).astype(np.float32) * 0.3)
    sizes = (1024, 512, 256, 128, 64)
    kw = dict(fft_sizes=sizes, mag_weight=1.0, logmag_weight=1.0)
    with fft_matmul.force_matmul_dft():
      l16 = float(losses.SpectralLoss(compute_dtype='bfloat16', **kw)(
          target, audio))
      l32 = float(losses.SpectralLoss(compute_dtype='float32', **kw)(
          target, audio))
    assert abs(l16 - l32) / abs(l32) < 5e-3

  def test_f32_escape_hatch_matches_fft_path(self):
    from ddsp_tpu.ops import fft_matmul
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.randn(1, 2048).astype(np.float32))
    audio = jnp.asarray(rng.randn(1, 2048).astype(np.float32))
    kw = dict(fft_sizes=(512, 128), mag_weight=1.0, logmag_weight=1.0,
              compute_dtype='float32')
    ref = float(losses.SpectralLoss(**kw)(target, audio))
    with fft_matmul.force_matmul_dft():
      gemm = float(losses.SpectralLoss(**kw)(target, audio))
    np.testing.assert_allclose(gemm, ref, rtol=2e-4)
