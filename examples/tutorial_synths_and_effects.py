"""Tour of every synthesizer, effect, and the core-function layer.

Script equivalent of the reference's tutorials 0/1/4
(ddsp/colab/tutorials/0_processor.ipynb, 1_synths_and_effects.ipynb,
4_core_functions.ipynb): drive each Processor standalone through its
get_controls -> get_signal contract, then the raw ops layer underneath,
writing a wav per section.

Usage:
  python examples/tutorial_synths_and_effects.py --save_dir /tmp/synths
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--save_dir', default='/tmp/ddsp_tpu_synths_tour')
  parser.add_argument('--seconds', type=float, default=0.5)
  parser.add_argument('--sample_rate', type=int, default=16000)
  parser.add_argument('--platform', default='')
  args = parser.parse_args(argv)

  if args.platform:
    import jax
    jax.config.update('jax_platforms', args.platform)

  import jax
  import jax.numpy as jnp
  import numpy as np
  from ddsp_tpu import ops, proc
  from ddsp_tpu.eval.summaries import write_wav

  os.makedirs(args.save_dir, exist_ok=True)
  sr = args.sample_rate
  frame_rate = 250
  hop = sr // frame_rate
  n_frames = max(8, int(round(args.seconds * frame_rate)))
  n_samples = n_frames * hop
  rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
  rms_all = []

  def run(processor, *inputs, label):
    """init/apply a Processor and write its output audio as a wav."""
    variables = processor.init(rngs, *inputs)
    audio = processor.apply(variables, *inputs,
                            rngs={'noise': jax.random.PRNGKey(2)})
    audio = np.asarray(audio)
    rms = float(np.sqrt(np.mean(audio**2)))
    rms_all.append(rms)
    write_wav(os.path.join(args.save_dir, f'{label}.wav'), audio[0], sr)
    print(f'{label:24s} shape={audio.shape} rms={rms:.4f}')
    return audio

  # ---- 0. The Processor contract (reference tutorial 0) ----------------
  # A Processor maps raw network outputs to interpretable controls
  # (get_controls), then controls to audio (get_signal); __call__ chains
  # the two. Controls are inspectable as a dict:
  t = np.linspace(0, 1, n_frames, dtype=np.float32)[None, :, None]
  f0_hz = 220.0 * 2.0**t                      # one-octave sweep
  amps_raw = jnp.asarray(2.0 * (1 - t))       # pre-sigmoid amplitude
  hd_raw = jnp.asarray(
      np.random.RandomState(0).randn(1, n_frames, 24).astype(np.float32))

  harmonic = proc.Harmonic(n_samples=n_samples, sample_rate=sr)
  variables = harmonic.init(rngs, amps_raw, hd_raw, f0_hz)
  controls = harmonic.apply(variables, amps_raw, hd_raw, f0_hz,
                            method=harmonic.get_controls)
  print('Harmonic controls:', {k: v.shape for k, v in controls.items()})
  run(harmonic, amps_raw, hd_raw, f0_hz, label='0_harmonic_sweep')

  # ---- 1. Synthesizers (reference tutorial 1) --------------------------
  noise_mags = jnp.asarray(
      np.linspace(6.0, 0.0, n_frames * 16, dtype=np.float32)
      .reshape(1, n_frames, 16))
  run(proc.FilteredNoise(n_samples=n_samples), noise_mags,
      label='1_filtered_noise')

  n_wavetable = 512
  saw = jnp.linspace(-1.0, 1.0, n_wavetable)[None, None, :]
  wavetables = jnp.tile(saw, (1, n_frames, 1))
  run(proc.Wavetable(n_samples=n_samples, sample_rate=sr, scale_fn=None),
      jnp.asarray(0.3 * np.ones((1, n_frames, 1), np.float32)),
      wavetables, f0_hz, label='1_wavetable_saw')

  n_sin = 16
  sin_amps = jnp.asarray(
      np.random.RandomState(1).randn(1, n_frames, n_sin).astype(np.float32) - 4.0)
  sin_freqs = jnp.asarray(
      np.random.RandomState(2).randn(1, n_frames, n_sin).astype(np.float32))
  run(proc.Sinusoidal(n_samples=n_samples, sample_rate=sr),
      sin_amps, sin_freqs, label='1_sinusoidal')

  # ---- 1b. Effects -----------------------------------------------------
  dry = run(harmonic, amps_raw, hd_raw, f0_hz, label='1_dry')
  dry = jnp.asarray(dry)

  gain = jnp.zeros((1, 1))
  decay = jnp.ones((1, 1)) * 4.0
  run(proc.ExpDecayReverb(trainable=False, reverb_length=n_samples),
      dry, gain, decay, label='1_exp_decay_reverb')

  rev_mags = jnp.asarray(
      np.linspace(0.0, -4.0, 8 * 16, dtype=np.float32).reshape(1, 8, 16))
  run(proc.FilteredNoiseReverb(trainable=False, reverb_length=n_samples // 2,
                               n_frames=8, n_filter_banks=16),
      dry, rev_mags, label='1_filtered_noise_reverb')

  lp_mags = jnp.asarray(
      np.concatenate([np.ones((1, n_frames, 4)),
                      -4.0 * np.ones((1, n_frames, 12))],
                     axis=-1).astype(np.float32))
  run(proc.FIRFilter(window_size=129), dry, lp_mags, label='1_fir_lowpass')

  mod_gain = jnp.zeros((1, n_samples, 1))
  mod_phase = jnp.asarray(
      np.sin(2 * np.pi * 2.0 * np.arange(n_samples) / sr)
      .astype(np.float32)[None, :, None])
  run(proc.ModDelay(sample_rate=sr, center_ms=10.0, depth_ms=5.0),
      dry, mod_gain, mod_phase, label='1_chorus')

  # ---- 4. Core functions (reference tutorial 4) ------------------------
  # The ops layer underneath the processors is plain jnp-in/jnp-out.
  midi = ops.hz_to_midi(jnp.asarray([220.0, 440.0]))
  print('hz_to_midi(220, 440) =', np.asarray(midi))
  sig = ops.exp_sigmoid(jnp.linspace(-5, 5, 5))
  print('exp_sigmoid ramp =', np.round(np.asarray(sig), 4))

  f0_env = ops.resample(jnp.asarray(f0_hz), n_samples)
  amp_env = ops.resample(ops.exp_sigmoid(amps_raw), n_samples,
                         method='window')
  audio = ops.oscillator_bank(f0_env[..., 0][..., None],
                              amp_env[..., 0][..., None], sample_rate=sr)
  write_wav(os.path.join(args.save_dir, '4_oscillator_bank.wav'),
            np.asarray(audio)[0], sr)
  rms_all.append(float(np.sqrt(np.mean(np.asarray(audio)**2))))

  print(f'Done. Wavs in {args.save_dir}')
  return float(np.mean(rms_all))


if __name__ == '__main__':
  main()
