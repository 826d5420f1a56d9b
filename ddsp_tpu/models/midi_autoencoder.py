"""Autoencoders with a (quantized) MIDI representation at the bottleneck.

Reference behavior: /root/reference/ddsp/training/models/midi_autoencoder.py
(MidiAutoencoder:28, ZMidiAutoencoder:394) and the gin wiring in
/root/reference/ddsp/training/gin/models/midiae/.

Two stacked autoencoder branches:
  * SynthCoder branch: (f0, loudness) -> synth params -> audio (the
    standard DDSP autoencoder).
  * MIDI branch: synth params -> MidiEncoder -> quantized pitch
    (straight-through) -> MidiToHarmonicDecoder -> synth params -> audio.

Losses are returned functionally (no hidden keras loss state): the
reconstruction LossGroup runs over the combined outputs dict, plus optional
closeness/slowness/prior terms.

The reference's gin files cite MarginLoss/SlownessLoss classes that do not
exist in its Python source (experimental dead config); minimal versions are
provided here so the documented configuration surface works.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ddsp_tpu.losses.spectral import Loss, mean_difference
from ddsp_tpu.models.model import Model
from ddsp_tpu.nn import stops
from ddsp_tpu.ops.core import amplitude_to_db, diff, hz_to_midi, midi_to_hz
from ddsp_tpu.proc.effects import FilteredNoiseReverb
from ddsp_tpu.proc.processors import Add, ProcessorGroup
from ddsp_tpu.proc.synths import FilteredNoise, Harmonic

Array = jax.Array
TensorDict = Dict[str, Any]


class MarginLoss(Loss):
  """Penalizes values above a margin: weight * mean(relu(x - margin)).

  Used on |pitch - f0| closeness tensors (reference gin:
  midiae/mixins/hmm_prior.gin qpitch/MarginLoss).
  """

  weight: float = 1.0
  margin: float = 0.5

  def __call__(self, x: Array) -> Array:
    return self.weight * jnp.mean(jax.nn.relu(jnp.abs(x) - self.margin))


class SlownessLoss(Loss):
  """Penalizes temporal variation of a latent, masked per-timestep.

  Encourages the pitch latent to be piecewise constant (slow) within short
  notes (reference: MidiAutoencoder.add_slowness_loss, applied with a
  short-note loss mask).
  """

  weight: float = 1.0

  def __call__(self, z: Array, loss_mask: Optional[Array] = None) -> Array:
    dz = diff(z[..., 0] if z.ndim == 3 else z, axis=1)
    dz = jnp.abs(dz)
    if loss_mask is not None:
      dz = dz * loss_mask[:, 1:]
    return self.weight * jnp.mean(dz)


class MidiAutoencoder(Model):
  """Autoencoder with a quantized MIDI pitch bottleneck.

  Attributes:
    synthcoder: Decoder network (f0/ld -> amps, harmonic_distribution,
      magnitudes), e.g. DilatedConvDecoder with output_splits
      (('amplitudes', 1), ('harmonic_distribution', K), ('magnitudes', N)).
    midi_encoder: Optional network (f0_midi, amps, hd, noise) ->
      (z_pitch, z_vel). If None, ground-truth MIDI comes from
      features['note_active_velocities'].
    midi_decoder: MidiToHarmonicDecoder (q_pitch -> synth controls + f0).
    preprocessor: F0LoudnessPreprocessor or F0PowerPreprocessor.
    sg_before_midiae: Stop gradients between the branches.
    reverb: Append a trainable FilteredNoiseReverb to the processor group.
    processor_group: Optional override of the default
      harmonic+noise+add(+reverb) ProcessorGroup.
    reconstruction_losses: LossGroup over the outputs dict.
    qpitch_f0rec_loss / pitch_f0rec_loss: Losses on |pitch - f0_rec|.
    pitch_qpitch_loss: Loss between unquantized and quantized pitch.
    midi_slowness_loss: SlownessLoss on the pitch latent for short notes.
    mask_f0_loss: Mask the f0 reconstruction loss where f0 and MIDI differ
      by >= 2 semitones.
    n_samples / sample_rate / reverb_length: Default processor group dims.
  """

  synthcoder: Any = None
  midi_encoder: Any = None
  midi_decoder: Any = None
  sg_before_midiae: bool = True
  reverb: bool = True
  preprocessor: Any = None
  processor_group: Any = None
  reconstruction_losses: Any = None
  qpitch_f0rec_loss: Any = None
  pitch_f0rec_loss: Any = None
  pitch_qpitch_loss: Any = None
  midi_slowness_loss: Any = None
  mask_f0_loss: bool = True
  n_samples: int = 64000
  sample_rate: int = 16000
  reverb_length: int = 24000

  @property
  def db_key(self) -> str:
    # F0PowerPreprocessor emits 'pw_scaled'/'pw_db'; loudness otherwise.
    out_keys = tuple(getattr(self.preprocessor, 'output_keys', ()))
    return 'power_db' if 'pw_scaled' in out_keys else 'loudness_db'

  def setup(self):
    if self.processor_group is None:
      dag = [
          (Harmonic(n_samples=self.n_samples, sample_rate=self.sample_rate,
                    name='harmonic'),
           ['amplitudes', 'harmonic_distribution', 'f0_hz']),
          (FilteredNoise(n_samples=self.n_samples, name='filtered_noise'),
           ['magnitudes']),
          (Add(name='add'), ['filtered_noise/signal', 'harmonic/signal']),
      ]
      if self.reverb:
        dag.append((FilteredNoiseReverb(
            trainable=True, reverb_length=self.reverb_length, n_frames=500,
            n_filter_banks=32, name='reverb'), ['add/signal']))
      self.default_pg = ProcessorGroup(dag=dag)

  def _pg(self) -> ProcessorGroup:
    return (self.processor_group if self.processor_group is not None
            else self.default_pg)

  # ----- MIDI helpers -------------------------------------------------------
  def encode_to_midi(self, *args):
    """Encodes (f0_midi, amps, hd, noise) into quantized MIDI pitch."""
    if self.sg_before_midiae:
      args = [jax.lax.stop_gradient(a) for a in args]
    enc_out = self.midi_encoder(*args)
    z_pitch, z_vel = enc_out['z_pitch'], enc_out['z_vel']
    q_pitch = stops.straight_through_int_quantization(z_pitch)
    z_vel = z_vel * 0.0  # Velocities unused (as in the reference).
    return z_pitch, q_pitch, z_vel, z_vel

  @staticmethod
  def extract_harm_controls(synth_params: TensorDict, log_scale: bool = True,
                            stop_gradient: bool = False):
    """Pull (amps, hd, noise) controls out of processor-group outputs."""
    amps = synth_params['harmonic']['controls']['amplitudes']
    hd = synth_params['harmonic']['controls']['harmonic_distribution']
    noise = synth_params['filtered_noise']['controls']['magnitudes']
    if log_scale:
      amps = amplitude_to_db(amps)
      noise = amplitude_to_db(noise)
    if stop_gradient:
      amps = jax.lax.stop_gradient(amps)
      hd = jax.lax.stop_gradient(hd)
      noise = jax.lax.stop_gradient(noise)
    return amps, hd, noise

  @staticmethod
  def pianoroll_to_midi(pianoroll: Array):
    """Piano roll -> (notes, velocities) conditioning (monophonic)."""
    notes = jnp.argmax(pianoroll, axis=-1).astype(jnp.float32)[..., None]
    velocities = jnp.max(pianoroll, axis=-1)[..., None]
    return notes, velocities

  @staticmethod
  def midi_to_pianoroll(q_pitch: Array, q_vel: Array, piano_keys: int = 128,
                        thresh: float = 20.0) -> Array:
    """Quantized MIDI pitch -> one-hot piano roll (monophonic)."""
    del q_vel  # Velocity ignored (as in the reference).
    midi_space = q_pitch[..., 0] if q_pitch.ndim == 3 else q_pitch
    if thresh > 0.0:
      midi_space = midi_space * (midi_space > thresh).astype(
          midi_space.dtype)
    return jax.nn.one_hot(midi_space.astype(jnp.int32), piano_keys)

  # ----- Branches -----------------------------------------------------------
  def preprocess(self, features: TensorDict) -> TensorDict:
    features = dict(features)
    features.update(self.preprocessor(features))
    features['f0_midi'] = hz_to_midi(features['f0_hz'])
    features['db'] = features[self.db_key]
    return features

  def synthesize_audio(self, features: TensorDict, z: Optional[Array] = None,
                       training: bool = False):
    """Run synthcoder and processor group; returns (audio, synth_params)."""
    features = dict(features)
    if z is not None:
      features['z'] = z
    features.update(self.synthcoder(features, training=training))
    synth_params = self._pg().get_controls(features)
    audio = self._pg().get_signal(synth_params)
    return audio, synth_params

  def midi_to_audio(self, q_pitch: Array, q_vel: Array,
                    z: Optional[Array] = None,
                    return_synth_params: bool = False):
    """Decode MIDI to audio through the shared processor group."""
    pg_in = self.midi_decoder(q_pitch, q_vel, z)
    midi_synth_params = self._pg().get_controls(pg_in)
    midi_audio = self._pg().get_signal(midi_synth_params)
    if return_synth_params:
      return midi_audio, midi_synth_params
    return midi_audio

  def get_gt_midi(self, features: TensorDict):
    """Ground-truth MIDI conditioning from a piano roll feature."""
    pr = features['note_active_velocities']
    q_pitch, q_vel = self.pianoroll_to_midi(pr)
    q_vel = q_vel * 0.0
    f0_loss_weights = None
    if self.mask_f0_loss:
      f0_loss_weights = (
          jnp.abs(features['f0_midi'] - q_pitch) < 2.0).astype(jnp.float32)
    return q_pitch, q_vel, f0_loss_weights

  # ----- Loss helpers -------------------------------------------------------
  def _loss_name(self, loss_obj, fallback: str) -> str:
    name = getattr(loss_obj, 'name', None)
    return name if name else fallback

  def _closeness_loss(self, losses_dict, loss_obj, f0, pitch, fallback):
    if loss_obj is not None:
      losses_dict[self._loss_name(loss_obj, fallback)] = loss_obj(
          jnp.abs(pitch - f0))

  def _slowness_loss(self, losses_dict, z_pitch, q_pitch):
    if self.midi_slowness_loss is not None:
      note_mask = stops.get_note_mask(q_pitch, note_on_only=False)
      note_lengths = stops.get_note_lengths(note_mask)
      note_pitches = stops.get_note_moments(q_pitch[..., 0], note_mask,
                                            return_std=False)
      loss_mask = stops.get_short_note_loss_mask(
          note_mask, note_lengths, note_pitches, min_length=40)
      losses_dict[self._loss_name(self.midi_slowness_loss,
                                  'slowness_loss')] = (
          self.midi_slowness_loss(z_pitch, loss_mask))

  def _zpitch_losses(self, losses_dict, z_pitch, q_pitch, f0_midi_pred):
    if z_pitch is not None:
      self._slowness_loss(losses_dict, z_pitch, q_pitch)
      if self.pitch_qpitch_loss is not None:
        losses_dict[self._loss_name(self.pitch_qpitch_loss,
                                    'pitch_qpitch_loss')] = (
            self.pitch_qpitch_loss(z_pitch, q_pitch))
      self._closeness_loss(losses_dict, self.pitch_f0rec_loss, f0_midi_pred,
                           z_pitch, 'pitch_f0rec_loss')

  # ----- Forward ------------------------------------------------------------
  def forward_with_losses(self, features: TensorDict, training: bool = True,
                          compute_losses: bool = True,
                          **kwargs) -> Tuple[TensorDict, TensorDict]:
    losses_dict = {}
    features = self.preprocess(features)

    # --- Synthcoder branch.
    synth_audio, synth_params = self.synthcoder_branch(features, training)
    amps, hd, noise = self.extract_harm_controls(synth_params)

    # --- MIDI encoding.
    z_pitch = None
    if self.midi_encoder is not None:
      f0_midi = features['f0_midi']
      f0_loss_weights = jnp.ones_like(f0_midi)
      z_pitch, q_pitch, _, q_vel = self.encode_to_midi(f0_midi, amps, hd,
                                                       noise)
    else:
      q_pitch, q_vel, f0_loss_weights = self.get_gt_midi(features)

    # --- MIDI decoding.
    if self.midi_decoder is None:
      f0_midi_pred = q_pitch
      midi_synth_params = synth_params
      midi_audio = synth_audio
      amps_pred, hd_pred, noise_pred = amps, hd, noise
    else:
      pg_in = self.midi_decoder(q_pitch, q_vel)
      f0_midi_pred = pg_in['f0_midi']
      midi_synth_params = self._pg().get_controls(pg_in)
      amps_pred, hd_pred, noise_pred = self.extract_harm_controls(
          midi_synth_params)
      midi_audio = self._pg().get_signal(midi_synth_params)

      if compute_losses:
        self._zpitch_losses(losses_dict, z_pitch, q_pitch, f0_midi_pred)
        self._closeness_loss(losses_dict, self.qpitch_f0rec_loss,
                             f0_midi_pred, q_pitch, 'qpitch_f0rec_loss')

    outputs = self._assemble_outputs(
        features, losses_dict, compute_losses, synth_params, synth_audio,
        midi_synth_params, midi_audio, q_pitch, q_vel, f0_midi_pred,
        amps, hd, noise, amps_pred, hd_pred, noise_pred, f0_loss_weights,
        extra_outputs={'z_pitch': z_pitch})
    return outputs, losses_dict

  def _assemble_outputs(self, features, losses_dict, compute_losses,
                        synth_params, synth_audio, midi_synth_params,
                        midi_audio, q_pitch, q_vel, f0_midi_pred,
                        amps, hd, noise, amps_pred, hd_pred, noise_pred,
                        f0_loss_weights, extra_outputs=None):
    """Shared outputs-dict assembly + reconstruction losses (both classes)."""
    outputs = {
        'synth_params': synth_params,
        'synth_audio': synth_audio,
        'midi_synth_params': midi_synth_params,
        'midi_audio': midi_audio,
        'q_pitch': q_pitch,
        'q_vel': q_vel,
        'pianoroll': self.midi_to_pianoroll(q_pitch, q_vel),
        'f0_midi_pred': f0_midi_pred,
        'f0_hz_pred': midi_to_hz(f0_midi_pred),
        'amps': amps,
        'hd': hd,
        'noise': noise,
        'amps_pred': amps_pred,
        'hd_pred': hd_pred,
        'noise_pred': noise_pred,
        'f0_loss_weights': f0_loss_weights,
        f'{self.db_key}_pred': features['db'],
    }
    outputs.update(extra_outputs or {})
    outputs = {k: v for k, v in outputs.items() if v is not None}
    outputs.update({k: v for k, v in features.items() if k not in outputs})
    outputs.update(synth_params)

    if compute_losses and self.reconstruction_losses is not None:
      losses_dict.update(self.reconstruction_losses(outputs))
    return outputs

  def synthcoder_branch(self, features: TensorDict, training: bool,
                        z: Optional[Array] = None):
    return self.synthesize_audio(features, z=z, training=training)

  def get_audio_from_outputs(self, outputs: TensorDict) -> Array:
    return (outputs['midi_audio'] if self.midi_decoder is None else
            outputs['synth_audio'])


class ZMidiAutoencoder(MidiAutoencoder):
  """MidiAutoencoder with additional synth / global / per-note z latents.

  Attributes (additions over MidiAutoencoder):
    z_synth_encoders: Encoders whose concatenated z conditions the
      synthcoder.
    z_global_encoders: Encoders whose concatenated z conditions the MIDI
      decoder globally.
    z_note_encoder: Encoder pooled per-note (via the quantized pitch note
      mask) conditioning the MIDI decoder.
    z_preconditioning_stack: Network applied to the packed decoder z.
    z_global_prior / z_note_prior: Optional prior loss modules (called for
      a loss and again to sample the posterior).
  """

  z_synth_encoders: Sequence[Any] = ()
  z_global_encoders: Sequence[Any] = ()
  z_note_encoder: Any = None
  z_preconditioning_stack: Any = None
  z_global_prior: Any = None
  z_note_prior: Any = None

  def z_synth_encode(self, features: TensorDict) -> Optional[Array]:
    if not self.z_synth_encoders:
      return None
    z = [enc(features)['z'] for enc in self.z_synth_encoders]
    return jnp.concatenate(z, axis=-1)

  def z_global_encode(self, features: TensorDict) -> Optional[Array]:
    if not self.z_global_encoders:
      return None
    z = [enc(features)['z'] for enc in self.z_global_encoders]
    return jnp.concatenate(z, axis=-1)

  def z_note_encode(self, features: TensorDict,
                    q_pitch: Array) -> Optional[Array]:
    if self.z_note_encoder is None:
      return None
    z_notes = self.z_note_encoder(features)['z']
    note_mask = stops.get_note_mask(q_pitch)
    z_notes, _ = stops.pool_over_notes(z_notes, note_mask)
    return z_notes

  def forward_with_losses(self, features: TensorDict, training: bool = True,
                          compute_losses: bool = True,
                          **kwargs) -> Tuple[TensorDict, TensorDict]:
    losses_dict = {}
    features = self.preprocess(features)

    # --- Synthcoder branch (with synth z conditioning).
    z_synth = self.z_synth_encode(features)
    synth_audio, synth_params = self.synthcoder_branch(features, training,
                                                       z_synth)
    amps, hd, noise = self.extract_harm_controls(synth_params)

    # Expose scaled controls for the expression/note encoders.
    features['amps_scaled'] = amps
    features['hd_scaled'] = hd
    features['noise_scaled'] = noise

    # --- MIDI encoding.
    z_pitch, z_vel = None, None
    if self.midi_encoder is not None:
      f0_midi = features['f0_midi']
      f0_loss_weights = jnp.ones_like(f0_midi)
      z_pitch, q_pitch, _, q_vel = self.encode_to_midi(f0_midi, amps, hd,
                                                       noise)
    else:
      q_pitch, q_vel, f0_loss_weights = self.get_gt_midi(features)

    # --- MIDI decoding with packed z.
    if self.midi_decoder is None:
      f0_midi_pred = q_pitch
      midi_synth_params = synth_params
      midi_audio = synth_audio
      amps_pred, hd_pred, noise_pred = amps, hd, noise
      z_global, z_notes = None, None
    else:
      z_global = self.z_global_encode(features)
      z_notes = self.z_note_encode(features, q_pitch)

      if self.z_global_prior is not None:
        losses_dict.update(self.z_global_prior.get_losses_dict(z_global))
        z_global = self.z_global_prior(z_global)
      if self.z_note_prior is not None:
        losses_dict.update(self.z_note_prior.get_losses_dict(z_notes))
        z_notes = self.z_note_prior(z_notes)

      if z_notes is None:
        z_midi_decoder = z_global
      elif z_global is None:
        z_midi_decoder = z_notes
      else:
        z_midi_decoder = jnp.concatenate([z_global, z_notes], axis=-1)
      if self.z_preconditioning_stack is not None:
        z_midi_decoder = self.z_preconditioning_stack(z_midi_decoder)

      pg_in = self.midi_decoder(q_pitch, q_vel, z_midi_decoder)
      f0_midi_pred = pg_in['f0_midi']
      midi_synth_params = self._pg().get_controls(pg_in)
      amps_pred, hd_pred, noise_pred = self.extract_harm_controls(
          midi_synth_params)
      midi_audio = self._pg().get_signal(midi_synth_params)

      if compute_losses:
        self._closeness_loss(losses_dict, self.qpitch_f0rec_loss,
                             f0_midi_pred, q_pitch, 'qpitch_f0rec_loss')
        self._zpitch_losses(losses_dict, z_pitch, q_pitch, f0_midi_pred)

    outputs = self._assemble_outputs(
        features, losses_dict, compute_losses, synth_params, synth_audio,
        midi_synth_params, midi_audio, q_pitch, q_vel, f0_midi_pred,
        amps, hd, noise, amps_pred, hd_pred, noise_pred, f0_loss_weights,
        extra_outputs={'z_pitch': z_pitch, 'z_vel': z_vel,
                       'z_global': z_global, 'z_notes': z_notes})
    return outputs, losses_dict
