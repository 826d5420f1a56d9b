"""Inverse synthesis (ddsp-inv): Audio -> Sinusoids -> Harmonics -> Audio.

Reference behavior: /root/reference/ddsp/training/models/inverse_synthesis.py
(InverseSynthesis:24, forward:264, append_losses:190,
parse_zipped_features:127).

A hierarchical self-supervised model: a sinusoidal encoder predicts
sinusoid/noise controls straight from audio; a harmonic encoder compresses
the sinusoids into harmonic controls; both levels resynthesize audio through
a shared Sinusoidal+FilteredNoise+Reverb processor group. Self-supervised
batches carry ground-truth controls ('sin_amps' etc.) from which audio is
synthesized on the fly.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ddsp_tpu.losses.consistency import HarmonicConsistencyLoss
from ddsp_tpu.models.model import Model
from ddsp_tpu.ops import core as ops_core
from ddsp_tpu.ops.oscillator import get_harmonic_frequencies
from ddsp_tpu.proc.dags import loss_module_name
from ddsp_tpu.proc.effects import FilteredNoiseReverb
from ddsp_tpu.proc.processors import Add, ProcessorGroup
from ddsp_tpu.proc.synths import FilteredNoise, Sinusoidal

Array = jax.Array
TensorDict = Dict[str, Any]


class InverseSynthesis(Model):
  """Inverse synthesis model (ddsp-inv).

  Attributes:
    sinusoidal_encoder: Network audio -> raw (frequencies, amplitudes,
      noise_magnitudes) (e.g. ResnetSinusoidalEncoder); scaling
      nonlinearities are applied here in the model.
    harmonic_encoder: Network (sin_freqs, sin_amps) -> (harm_amp,
      harm_dist, f0_hz) (e.g. SinusoidalToHarmonicEncoder).
    losses: Audio reconstruction losses applied at both levels.
    sinusoidal_consistency_losses: Losses between the sinusoidal and
      harmonic sinusoids (e.g. KDEConsistencyLoss).
    harmonic_consistency_losses: Self-supervised losses on harmonic
      controls.
    filtered_noise_consistency_loss: Self-supervised loss on noise
      magnitudes.
    twm_loss: Two-way mismatch loss between sinusoids and f0 candidates.
    harmonic_distribution_prior: Prior loss on the harmonic distribution.
    freq_depth: Depth of the frequencies_softmax scaling.
    reverb: Append a trainable FilteredNoiseReverb.
    n_samples / sample_rate: Audio dimensions.
    stop_gradient: Block harmonic-level gradients from reaching the
      sinusoidal encoder.
  """

  sinusoidal_encoder: Any = None
  harmonic_encoder: Any = None
  losses: Sequence[Any] = ()
  sinusoidal_consistency_losses: Sequence[Any] = ()
  harmonic_consistency_losses: Sequence[Any] = ()
  filtered_noise_consistency_loss: Any = None
  twm_loss: Any = None
  harmonic_distribution_prior: Any = None
  freq_depth: int = 64
  reverb: bool = True
  n_samples: int = 64000
  sample_rate: int = 16000
  stop_gradient: bool = True

  def setup(self):
    self.sinusoidal_synth = Sinusoidal(
        n_samples=self.n_samples, sample_rate=self.sample_rate,
        amp_scale_fn=None, freq_scale_fn=None, name='sinusoidal')
    self.filtered_noise_synth = FilteredNoise(
        n_samples=self.n_samples, window_size=0, scale_fn=None,
        name='filtered_noise')
    dag = [
        (self.sinusoidal_synth, ['amplitudes', 'frequencies']),
        (self.filtered_noise_synth, ['noise_magnitudes']),
        (Add(name='add'), ['filtered_noise/signal', 'sinusoidal/signal']),
    ]
    if self.reverb:
      dag.append((FilteredNoiseReverb(
          reverb_length=int(self.sample_rate * 2), window_size=257,
          n_frames=500, n_filter_banks=16, trainable=True,
          name='reverb'), ['add/signal']))
    self.processor_group = ProcessorGroup(dag=dag)

  def _freq_scale(self, x: Array) -> Array:
    return ops_core.frequencies_softmax(x, depth=self.freq_depth)

  def generate_synthetic_audio(self, features: TensorDict) -> Array:
    """Convert ground-truth synthetic controls into audio."""
    return self.processor_group({
        'amplitudes': features['sin_amps'],
        'frequencies': features['sin_freqs'],
        'noise_magnitudes': features['noise_magnitudes'],
    })

  @staticmethod
  def parse_zipped_features(features) -> Tuple[TensorDict, TensorDict]:
    """Order a (normal, self-supervised) pair of feature dicts."""
    assert len(features) == 2
    ss_idx = int(features[1].get('sin_amps') is not None)
    s_idx = int(not ss_idx)
    return features[s_idx], features[ss_idx]

  def get_audio_from_outputs(self, outputs: TensorDict) -> Array:
    return (outputs['sin_audio'] if self.harmonic_encoder is None else
            outputs['harm_audio'])

  def forward_with_losses(self, features, training: bool = True,
                          compute_losses: bool = True,
                          **kwargs) -> Tuple[TensorDict, TensorDict]:
    losses_dict = {}
    if isinstance(features, (list, tuple)):
      # Train on both normal and self-supervised data, concatenated along
      # the batch for one shared forward pass.
      features, ss_features = self.parse_zipped_features(features)
      ss_features = dict(ss_features)
      ss_features['audio'] = self.generate_synthetic_audio(ss_features)

      batch_size = features['audio'].shape[0]
      inputs = {'audio': jnp.concatenate(
          [features['audio'], ss_features['audio']], axis=0)}
      all_outputs = self.forward(inputs, training)

      outputs = {k: v[:batch_size] for k, v in all_outputs.items()
                 if not isinstance(v, dict)}
      ss_outputs = {k: v[batch_size:] for k, v in all_outputs.items()
                    if not isinstance(v, dict)}
      if compute_losses:
        self.append_losses(losses_dict, outputs)
        self.append_losses(losses_dict, ss_outputs, ss_features)
    elif features.get('sin_amps') is not None:
      # Self-supervised pretraining.
      ss_features = dict(features)
      ss_features['audio'] = self.generate_synthetic_audio(ss_features)
      outputs = self.forward(ss_features, training)
      if compute_losses:
        self.append_losses(losses_dict, outputs)
        self.append_losses(losses_dict, outputs, ss_features)
    else:
      outputs = self.forward(features, training)
      if compute_losses:
        self.append_losses(losses_dict, outputs)
    return outputs, losses_dict

  def _name(self, loss_obj) -> str:
    return loss_module_name(loss_obj)

  def append_losses(self, losses_dict: TensorDict, outputs: TensorDict,
                    self_supervised_features: Optional[TensorDict] = None):
    """Compute and accumulate losses into losses_dict."""
    o = outputs
    f = self_supervised_features

    if f is None:
      # Sinusoidal autoencoder loss.
      for loss_obj in self.losses:
        losses_dict[f'sin_{self._name(loss_obj)}'] = loss_obj(
            o['audio'], o['sin_audio'])

      if self.harmonic_encoder is not None:
        if self.harmonic_distribution_prior is not None:
          losses_dict.update(
              self.harmonic_distribution_prior.get_losses_dict(
                  o['harm_dist']))

        for loss_obj in self.losses:
          losses_dict[f'harm_{self._name(loss_obj)}'] = loss_obj(
              o['audio'], o['harm_audio'])

        if self.sinusoidal_consistency_losses:
          sin_amps, sin_freqs = o['sin_amps'], o['sin_freqs']
          if self.stop_gradient:
            # Don't propagate harmonic errors to sinusoidal predictions.
            sin_amps = jax.lax.stop_gradient(sin_amps)
            sin_freqs = jax.lax.stop_gradient(sin_freqs)
          for loss_obj in self.sinusoidal_consistency_losses:
            losses_dict[self._name(loss_obj)] = loss_obj(
                sin_amps, sin_freqs, o['harm_amps'], o['harm_freqs'])

      if self.twm_loss is not None:
        f0_c = (o['sin_freqs'] if self.harmonic_encoder is None
                else o['f0_hz'])
        losses_dict[self._name(self.twm_loss)] = self.twm_loss(
            f0_c, o['sin_freqs'], o['sin_amps'])
    else:
      # Self-supervised losses against ground-truth controls.
      for loss_obj in self.sinusoidal_consistency_losses:
        losses_dict[f'ss_{self._name(loss_obj)}'] = loss_obj(
            o['sin_amps'], o['sin_freqs'], f['sin_amps'], f['sin_freqs'])

      fncl = self.filtered_noise_consistency_loss
      if fncl is not None:
        losses_dict[f'ss_{self._name(fncl)}'] = fncl(
            o['noise_magnitudes'], f['noise_magnitudes'])

      if self.harmonic_encoder is not None:
        for loss_obj in self.harmonic_consistency_losses:
          if isinstance(loss_obj, HarmonicConsistencyLoss):
            losses = loss_obj(o['harm_amp'], f['harm_amp'],
                              o['harm_dist'], f['harm_dist'],
                              o['f0_hz'], f['f0_hz'])
            losses_dict.update({'ss_' + k: v for k, v in losses.items()})
          else:
            losses_dict[f'ss_harm_{self._name(loss_obj)}'] = loss_obj(
                o['harm_amp'], o['f0_hz'], f['harm_amp'], f['f0_hz'])

  def forward(self, features: TensorDict, training: bool = True):
    """Forward pass (no losses): audio -> sinusoids -> harmonics."""
    audio = features['audio']

    # Audio -> sinusoids.
    pg_in = dict(self.sinusoidal_encoder(features, training=training))

    # Manually apply the scaling nonlinearities.
    sin_freqs = self._freq_scale(pg_in['frequencies'])
    sin_amps = ops_core.exp_sigmoid(pg_in['amplitudes'])
    noise_magnitudes = ops_core.exp_sigmoid(pg_in['noise_magnitudes'])
    pg_in['frequencies'] = sin_freqs
    pg_in['amplitudes'] = sin_amps
    pg_in['noise_magnitudes'] = noise_magnitudes

    controls = self.processor_group.get_controls(pg_in)
    sin_audio = self.processor_group.get_signal(controls)

    outputs = {
        'audio': audio,
        'noise_magnitudes': noise_magnitudes,
        'sin_audio': sin_audio,
        'sin_amps': sin_amps,
        'sin_freqs': sin_freqs,
    }
    outputs.update(controls)

    # Sinusoids -> harmonics.
    if self.stop_gradient:
      sin_freqs = jax.lax.stop_gradient(sin_freqs)
      sin_amps = jax.lax.stop_gradient(sin_amps)
      noise_magnitudes = jax.lax.stop_gradient(noise_magnitudes)

    if self.harmonic_encoder is not None:
      h_out = self.harmonic_encoder(sin_freqs, sin_amps)
      harm_amp = h_out['harm_amp']
      harm_dist = h_out['harm_dist']
      f0_hz = h_out['f0_hz']

      # Decode harmonics back to sinusoids.
      n_harmonics = int(harm_dist.shape[-1])
      harm_freqs = get_harmonic_frequencies(f0_hz, n_harmonics)
      harm_amps = harm_amp * harm_dist

      pg_in['frequencies'] = harm_freqs
      pg_in['amplitudes'] = harm_amps
      pg_in['noise_magnitudes'] = noise_magnitudes
      harm_audio = self.processor_group(pg_in)

      outputs.update({
          'harm_audio': harm_audio,
          'harm_amp': harm_amp,
          'harm_dist': harm_dist,
          'f0_hz': f0_hz,
          'harm_freqs': harm_freqs,
          'harm_amps': harm_amps,
      })

    return outputs
