"""Inference-only model wrappers and streaming (VST) modules.

Reference behavior: /root/reference/ddsp/training/inference.py
(AutoencoderInference:47, VSTBaseModule:130, VSTExtractFeatures:191,
VSTPredictControls:249, VSTStatelessPredictControls:301, VSTSynthesize:362,
VSTSynthesizeHarmonic:482, VSTSynthesizeNoise:542).

The reference rebuilds models from the gin operative config and exports
tf.function signatures; here models rebuild from the JSON operative spec
(ddsp_tpu.utils), restore params from orbax checkpoints, and each module
exposes one jitted call with the same explicit-carry signatures (GRU state,
previous controls, oscillator phase) for frame-by-frame streaming.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu import utils
from ddsp_tpu.nn.preprocessing import inv_scale_f0_hz
from ddsp_tpu.ops import oscillator
from ddsp_tpu.ops.fftconv import frequency_filter

Array = jax.Array


def load_params(save_dir: str, target_params=None):
  """Load the latest checkpoint's params from a train directory.

  Args:
    save_dir: Directory with step-numbered orbax checkpoints.
    target_params: Optional param pytree providing structure/shapes (enables
      strict shape checking). If None, restores without a target.

  Returns:
    The params pytree.
  """
  import orbax.checkpoint as ocp  # pylint: disable=g-import-not-at-top
  mgr = ocp.CheckpointManager(os.path.abspath(save_dir))
  step = mgr.latest_step()
  if step is None:
    raise FileNotFoundError(f'No checkpoints found in {save_dir!r}')
  if target_params is not None:
    target = {'params': jax.tree_util.tree_map(np.asarray, target_params)}
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    return restored['params']
  # No target: restore to HOST (numpy) arrays via a target built from the
  # checkpoint's own metadata. A raw restore would try to recreate the
  # shardings the checkpoint was SAVED with, which fails whenever the
  # device set differs - e.g. a model trained on an N-device mesh loaded
  # by a single-device inference process.
  item_dir = os.path.join(os.path.abspath(save_dir), str(step), 'default')
  ckptr = ocp.StandardCheckpointer()
  meta = ckptr.metadata(item_dir)
  tree = getattr(meta, 'item_metadata', meta)
  target = jax.tree_util.tree_map(
      lambda m: np.zeros(m.shape, m.dtype), tree,
      is_leaf=lambda x: hasattr(x, 'shape') and hasattr(x, 'dtype'))
  restored = ckptr.restore(item_dir, target=target)
  return restored['params']


class _SpecInference:
  """Shared setup: rebuild the model from spec, restore params."""

  def __init__(self, save_dir: str, overrides: Optional[Dict] = None,
               example_features: Optional[Dict] = None,
               restore_keys: Optional[list] = None):
    self.save_dir = save_dir
    self.spec = utils.load_spec(save_dir)
    self.model = utils.model_from_spec(save_dir, **(overrides or {}))

    # Shapes for restore come from a fresh init on example features.
    rngs = {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1)}
    variables = self.model.init(rngs, example_features, training=False)
    fresh = variables.get('params', {})

    restored = load_params(save_dir)
    if restore_keys is None:
      self.params = restored
    else:
      # Partial restore (reference restore_keys, trainers.py:104-122):
      # only the chosen submodules come from the checkpoint; keys absent
      # from either tree (e.g. no encoder in this preset) are skipped.
      params = dict(fresh)
      for k in restore_keys:
        if k in restored and k in fresh:
          params[k] = restored[k]
      self.params = params


class AutoencoderInference(_SpecInference):
  """Inference-only autoencoder rebuilt from the operative spec.

  Mirrors reference AutoencoderInference (inference.py:47): mutates the
  architecture for a new generation length, switches the oscillator to
  angular cumsum (bounded phase error for long renders), and optionally
  removes the room reverb (timbre transfer into a new space).

  Call with {'f0_hz': [n_frames], 'loudness_db': [n_frames]}-style features
  (unbatched 1-D inputs accepted).
  """

  def __init__(self, save_dir: str, length_seconds: float = 4,
               remove_reverb: bool = True, **overrides):
    spec = utils.load_spec(save_dir)
    kwargs = spec['kwargs']

    self.sample_rate = kwargs.get('sample_rate', 16000)
    n_samples_train = kwargs.get('n_samples', 64000)
    time_steps_train = kwargs.get('time_steps', 1000)
    self.hop_size = n_samples_train // time_steps_train
    self.n_frames = int(length_seconds * self.sample_rate / self.hop_size)
    self.n_samples = self.n_frames * self.hop_size

    mutations = {
        'n_samples': self.n_samples,
        'time_steps': self.n_frames,
        'use_angular_cumsum': True,
        # Inference runs from (f0, loudness) features alone - no audio.
        'compute_loudness_fresh': False,
    }
    if remove_reverb:
      mutations['reverb'] = False
    mutations.update(overrides)

    example = {
        'f0_hz': jnp.zeros((1, self.n_frames, 1)),
        'loudness_db': jnp.zeros((1, self.n_frames, 1)),
    }
    # Restore everything except processor-group params when the dag was
    # mutated (reverb removed): the param tree no longer lines up, and a
    # reverb IR is exactly what we don't want.
    super().__init__(save_dir, overrides=mutations,
                     example_features=example,
                     restore_keys=(['decoder', 'encoder', 'preprocessor']
                                   if remove_reverb else None))
    # The spec mutations this inference model was built with (export
    # writes them into the artifact's operative spec so spec and params
    # stay consistent).
    self.applied_mutations = dict(mutations)
    if remove_reverb:
      # Drop keys that don't exist in this model (e.g. no encoder).
      self.params = {k: v for k, v in self.params.items() if v}

    model = self.model

    def call(params, features):
      return model.apply({'params': params}, features, training=False,
                         rngs={'noise': jax.random.PRNGKey(0)})

    self._call = jax.jit(call)

  def __call__(self, features: Dict[str, Any]) -> Dict[str, Any]:
    features = dict(features)
    for k, v in features.items():
      v = jnp.asarray(v, jnp.float32)
      if v.ndim == 1:
        v = v[jnp.newaxis, :, jnp.newaxis]
      features[k] = v
    return self._call(self.params, features)

  def get_audio(self, features: Dict[str, Any]) -> Array:
    return self(features)['audio_synth']


class _VSTBase(_SpecInference):
  """Shared config parsing for the VST modules (vst preset specs)."""

  def __init__(self, save_dir: str, overrides=None, restore_keys=None,
               stateless: bool = False):
    spec = utils.load_spec(save_dir)
    kwargs = spec['kwargs']
    self.sample_rate = kwargs.get('sample_rate', 16000)
    self.frame_rate = kwargs.get('frame_rate', 50)
    self.frame_size = kwargs.get('frame_size', 1024)
    self.hop_size = self.sample_rate // self.frame_rate
    self.n_harmonics = kwargs.get('n_harmonics', 60)
    self.n_noise = kwargs.get('n_noise_magnitudes', 65)
    self.state_size = kwargs.get('rnn_channels', 512)
    self.n_samples = (int(kwargs.get('seconds', 4.0) * self.sample_rate) +
                      self.hop_size)
    from ddsp_tpu.ops.spectral import get_framed_lengths
    n_frames, _ = get_framed_lengths(self.n_samples, self.frame_size,
                                     self.hop_size, 'center')
    example = {
        'audio': jnp.zeros((1, self.n_samples)),
        'f0_hz': jnp.zeros((1, n_frames)),
        'f0_confidence': jnp.zeros((1, n_frames)),
    }
    if stateless:
      example['state'] = jnp.zeros((1, self.state_size))
    super().__init__(save_dir, overrides=overrides,
                     example_features=example,
                     restore_keys=restore_keys)


class VSTExtractFeatures:
  """Per-frame feature extraction: audio[frame_size] -> f0/power scalars.

  Standalone (no checkpoint needed - feature extraction has no trained
  params; the reference leaves the preprocessor un-restored too,
  inference.py:166-170). The reference runs CREPE in-graph here; pitch
  tracking requires CREPE weights on disk (ops.crepe), power works always.
  """

  def __init__(self, save_dir: str, compute_f0: bool = True,
               crepe_model_capacity: str = 'tiny',
               crepe_weights_path: Optional[str] = None):
    from ddsp_tpu.nn.preprocessing import OnlineF0PowerPreprocessor
    spec = utils.load_spec(save_dir)
    kwargs = spec['kwargs']
    self.sample_rate = kwargs.get('sample_rate', 16000)
    self.frame_rate = kwargs.get('frame_rate', 50)
    self.frame_size = kwargs.get('frame_size', 1024)

    pre = OnlineF0PowerPreprocessor(
        frame_rate=self.frame_rate,
        frame_size=self.frame_size,
        padding='valid',
        compute_power=True,
        compute_f0=compute_f0,
        crepe_model_capacity=crepe_model_capacity,
        crepe_weights_path=crepe_weights_path,
        viterbi=False)

    def call(audio):
      audio = jnp.reshape(audio, (1, self.frame_size))
      features = {'audio': audio}
      if not compute_f0:
        features['f0_hz'] = jnp.zeros((1, 1))
        features['f0_confidence'] = jnp.zeros((1, 1))
      out = pre.apply({}, features)
      return (out['f0_hz'][0, 0], out['f0_scaled'][0, 0],
              out['pw_db'][0, 0], out['pw_scaled'][0, 0])

    self._call = jax.jit(call)

  def __call__(self, audio: Array):
    """audio: [frame_size] -> (f0_hz, f0_scaled, pw_db, pw_scaled), [1]."""
    return self._call(jnp.asarray(audio, jnp.float32))


class VSTPredictControls(_VSTBase):
  """Frame controls: (f0_scaled, pw_scaled) -> (amps, hd, noise).

  Stateful variant: matches the reference's VSTPredictControls
  (inference.py:249-299), whose Keras GRU carries hidden state across
  calls. JAX has no hidden layer state, so the wrapper holds the GRU
  state between calls and threads it through an explicitly-stateless
  decoder; `reset()` plays the role of Keras `reset_states()`. Prefer
  VSTStatelessPredictControls when the host (e.g. a VST plugin) wants to
  own the state buffer itself.
  """

  def __init__(self, save_dir: str):
    super().__init__(save_dir, overrides={'stateless': True},
                     restore_keys=['decoder'], stateless=True)
    self._build_call(stateless=True)
    self._state = np.zeros((self.state_size,), np.float32)

  def reset(self):
    """Zero the carried GRU state (reference Keras reset_states())."""
    self._state = np.zeros((self.state_size,), np.float32)

  def _decoder_controls(self, params, inputs):
    """Run decoder then the synth control nonlinearities."""
    outputs = self.model.decoder.apply({'params': params['decoder']},
                                       inputs, training=False)
    f0_hz = inv_scale_f0_hz(inputs['f0_scaled'])

    # Processor get_controls (param-free modules -> apply with {}).
    pg = self.model.processor_group
    harmonic = pg.dag[0][0].module
    filtered_noise = pg.dag[1][0].module
    harm_controls = harmonic.apply(
        {}, outputs['amps'], outputs['harmonic_distribution'], f0_hz,
        method=harmonic.get_controls)
    noise_controls = filtered_noise.apply(
        {}, outputs['noise_magnitudes'],
        method=filtered_noise.get_controls)
    return outputs, harm_controls, noise_controls

  def _build_call(self, stateless: bool):
    def call(f0_scaled, pw_scaled, state=None):
      inputs = {
          'f0_scaled': jnp.reshape(f0_scaled, (1, 1, 1)),
          'pw_scaled': jnp.reshape(pw_scaled, (1, 1, 1)),
      }
      if stateless:
        inputs['state'] = jnp.reshape(state, (1, self.state_size))
      outputs, harm, noise = self._decoder_controls(self.params, inputs)
      amps = harm['amplitudes'][0, 0]
      hd = harm['harmonic_distribution'][0, 0]
      noise_m = noise['magnitudes'][0, 0]
      if stateless:
        return amps, hd, noise_m, outputs['state'][0]
      return amps, hd, noise_m

    self._call = jax.jit(call)

  def __call__(self, f0_scaled, pw_scaled):
    """(f0_scaled [1], pw_scaled [1]) -> (amps [1], hd [K], noise [N]).

    The GRU state is carried inside the wrapper across calls.
    """
    amps, hd, noise, state = self._call(
        jnp.asarray(f0_scaled), jnp.asarray(pw_scaled), self._state)
    self._state = state
    return amps, hd, noise


class VSTStatelessPredictControls(VSTPredictControls):
  """Predict VST controls with explicit GRU state carry."""

  def __init__(self, save_dir: str):  # pylint: disable=super-init-not-called
    _VSTBase.__init__(self, save_dir, overrides={'stateless': True},
                      restore_keys=['decoder'], stateless=True)
    self._build_call(stateless=True)

  def initial_state(self) -> Array:
    return jnp.zeros((self.state_size,))

  def __call__(self, f0_scaled, pw_scaled, state):
    """Adds state [state_size] in and out."""
    return self._call(jnp.asarray(f0_scaled), jnp.asarray(pw_scaled),
                      jnp.asarray(state))


class VSTSynthesize:
  """Per-hop streaming synthesis with explicit phase carry.

  Reference: inference.py:362 (VSTSynthesize). Interpolates between the
  previous and current frame controls over one hop of audio, carrying the
  oscillator phase between calls (core.streaming_harmonic_synthesis).
  """

  include_noise: bool = True
  include_harmonic: bool = True

  def __init__(self, save_dir: str, new_hop_size: Optional[int] = None,
               noise_seed: int = 0):
    spec = utils.load_spec(save_dir)
    kwargs = spec['kwargs']
    self.sample_rate = kwargs.get('sample_rate', 16000)
    frame_rate = kwargs.get('frame_rate', 50)
    self.hop_size = new_hop_size or self.sample_rate // frame_rate
    self.n_harmonics = kwargs.get('n_harmonics', 60)
    self.n_noise = kwargs.get('n_noise_magnitudes', 65)
    self.resample_method = 'linear'

    # The per-hop noise key is fixed, so FilteredNoise's uniform draw is a
    # constant; precompute it eagerly. This also keeps threefry PRNG ops
    # out of exported graphs (TFLite cannot legalize them).
    noise_signal = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(noise_seed), (1, self.hop_size),
        minval=-1.0, maxval=1.0))

    def call(amps, prev_amps, hd, prev_hd, f0, prev_f0, noise, prev_phase):
      # Two frames for interpolation across the hop.
      amps2 = jnp.stack([prev_amps, amps])[jnp.newaxis]        # [1, 2, 1]
      hd2 = jnp.stack([prev_hd, hd])[jnp.newaxis]              # [1, 2, K]
      f02 = jnp.stack([prev_f0, f0])[jnp.newaxis]              # [1, 2, 1]
      phase = jnp.reshape(prev_phase, (1, 1, 1))

      audio, final_phase = oscillator.streaming_harmonic_synthesis(
          frequencies=f02,
          amplitudes=amps2,
          harmonic_distribution=hd2,
          initial_phase=phase,
          n_samples=self.hop_size,
          sample_rate=self.sample_rate,
          amp_resample_method=self.resample_method)

      if self.include_noise:
        # Incoming magnitudes were already nonlinearized by
        # VSTPredictControls (get_controls); filter the fixed noise
        # buffer directly as the reference does (inference.py:473).
        noise2 = jnp.stack([noise, noise])[jnp.newaxis]        # [1, 2, N]
        noise_audio = frequency_filter(noise_signal, noise2, window_size=0)
        audio = audio + noise_audio if self.include_harmonic else noise_audio
      return audio[0], final_phase[0, 0]

    self._call = jax.jit(call)

  def initial_phase(self) -> Array:
    return jnp.zeros((1,))

  def __call__(self, amps, prev_amps, hd, prev_hd, f0, prev_f0, noise,
               prev_phase):
    """1-D per-frame controls -> (audio [hop_size], final_phase [1])."""
    args = [jnp.asarray(a, jnp.float32) for a in
            (amps, prev_amps, hd, prev_hd, f0, prev_f0, noise, prev_phase)]
    return self._call(*args)


class VSTSynthesizeHarmonic(VSTSynthesize):
  """Harmonic-only streaming synthesis (no noise branch)."""

  include_noise = False

  def __call__(self, amps, prev_amps, hd, prev_hd, f0, prev_f0, prev_phase):
    dummy_noise = jnp.zeros((self.n_noise,))
    return super().__call__(amps, prev_amps, hd, prev_hd, f0, prev_f0,
                            dummy_noise, prev_phase)


class VSTSynthesizeNoise(VSTSynthesize):
  """Noise-only streaming synthesis."""

  include_harmonic = False

  def __call__(self, noise):
    z1 = jnp.zeros((1,))
    zk = jnp.zeros((self.n_harmonics,))
    audio, _ = super().__call__(z1, z1, zk, zk, z1, z1, noise,
                                jnp.zeros((1,)))
    return audio
