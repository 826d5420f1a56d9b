"""Model presets mirroring the reference gin configs.

Reference behavior: /root/reference/ddsp/training/gin/models/ae.gin,
solo_instrument.gin, vst/vst.gin. These play the role gin plays in the
reference: the architecture is data. Here each preset is a plain Python
factory keyed in a registry, overridable by kwargs, and serializable to a
JSON "operative spec" (see ddsp_tpu.utils.spec) so checkpoints can
reconstruct the exact model.
"""

from __future__ import annotations

from typing import Optional

from ddsp_tpu import losses as losses_lib
from ddsp_tpu import nn
from ddsp_tpu import proc
from ddsp_tpu.models import Autoencoder
from ddsp_tpu.utils.registry import register_preset


@register_preset('ae')
def ae(n_samples: int = 64000,
       sample_rate: int = 16000,
       time_steps: int = 1000,
       n_harmonics: int = 100,
       n_noise_magnitudes: int = 65,
       z_dims: int = 16,
       z_time_steps: int = 125,
       rnn_channels: int = 512,
       ch: int = 512,
       layers_per_stack: int = 3,
       compute_loudness_fresh: bool = True,
       compute_dtype: str = 'bfloat16') -> Autoencoder:
  """NSynth-style autoencoder decoding from (loudness, f0, z).

  Reference: gin/models/ae.gin. compute_dtype (default 'bfloat16') runs
  the decoder and spectral-loss GEMMs on the MXU bf16 path.
  """
  return Autoencoder(
      preprocessor=nn.F0LoudnessPreprocessor(
          time_steps=time_steps, sample_rate=sample_rate,
          compute_loudness_fresh=compute_loudness_fresh),
      encoder=nn.MfccTimeDistributedRnnEncoder(rnn_channels=rnn_channels,
                                               rnn_type='gru',
                                               z_dims=z_dims,
                                               z_time_steps=z_time_steps),
      decoder=nn.RnnFcDecoder(
          rnn_channels=rnn_channels,
          rnn_type='gru',
          ch=ch,
          layers_per_stack=layers_per_stack,
          compute_dtype=compute_dtype,
          input_keys=('ld_scaled', 'f0_scaled', 'z'),
          output_splits=(('amps', 1),
                         ('harmonic_distribution', n_harmonics),
                         ('noise_magnitudes', n_noise_magnitudes))),
      processor_group=proc.ProcessorGroup(dag=[
          (proc.Harmonic(n_samples=n_samples, sample_rate=sample_rate,
                         name='harmonic'),
           ['amps', 'harmonic_distribution', 'f0_hz']),
          (proc.FilteredNoise(n_samples=n_samples, window_size=0,
                              name='filtered_noise'),
           ['noise_magnitudes']),
          (proc.Add(name='add'),
           ['filtered_noise/signal', 'harmonic/signal']),
      ]),
      losses=(losses_lib.SpectralLoss(loss_type='L1', mag_weight=1.0,
                                      logmag_weight=1.0,
                                      compute_dtype=compute_dtype),))


@register_preset('solo_instrument')
def solo_instrument(n_samples: int = 64000,
                    sample_rate: int = 16000,
                    time_steps: int = 1000,
                    n_harmonics: int = 60,
                    n_noise_magnitudes: int = 65,
                    reverb_length: int = 48000,
                    rnn_channels: int = 512,
                    ch: int = 512,
                    layers_per_stack: int = 3,
                    reverb: bool = True,
                    use_angular_cumsum: bool = False,
                    compute_loudness_fresh: bool = True,
                    compute_dtype: str = 'bfloat16') -> Autoencoder:
  """Decodes from (loudness, f0) with a trainable reverb.

  Reference: gin/models/solo_instrument.gin. Training data should all come
  from the same acoustic environment. compute_dtype (default 'bfloat16')
  runs the decoder and spectral-loss GEMMs on the MXU bf16 path (float32
  params/accumulation, ≤0.5% relative loss error); pass 'float32' for
  bit-golden comparisons.
  """
  return Autoencoder(
      preprocessor=nn.F0LoudnessPreprocessor(
          time_steps=time_steps, sample_rate=sample_rate,
          compute_loudness_fresh=compute_loudness_fresh),
      encoder=None,
      decoder=nn.RnnFcDecoder(
          rnn_channels=rnn_channels,
          rnn_type='gru',
          ch=ch,
          layers_per_stack=layers_per_stack,
          compute_dtype=compute_dtype,
          input_keys=('ld_scaled', 'f0_scaled'),
          output_splits=(('amps', 1),
                         ('harmonic_distribution', n_harmonics),
                         ('noise_magnitudes', n_noise_magnitudes))),
      processor_group=proc.ProcessorGroup(dag=(
          [(proc.Harmonic(n_samples=n_samples, sample_rate=sample_rate,
                          use_angular_cumsum=use_angular_cumsum,
                          name='harmonic'),
            ['amps', 'harmonic_distribution', 'f0_hz']),
           (proc.FilteredNoise(n_samples=n_samples, window_size=0,
                               name='filtered_noise'),
            ['noise_magnitudes']),
           (proc.Add(name='add'),
            ['filtered_noise/signal', 'harmonic/signal'])] +
          ([(proc.Reverb(trainable=True, reverb_length=reverb_length,
                         name='reverb'),
             ['add/signal'])] if reverb else []))),
      losses=(losses_lib.SpectralLoss(loss_type='L1', mag_weight=1.0,
                                      logmag_weight=1.0,
                                      compute_dtype=compute_dtype),))


@register_preset('tiny')
def tiny(n_samples: int = 16000,
         sample_rate: int = 16000,
         time_steps: int = 250,
         n_harmonics: int = 20,
         n_noise_magnitudes: int = 33,
         reverb_length: int = 8000,
         **kwargs) -> Autoencoder:
  """Small solo-instrument model for tests/CI and single-core machines.

  Extra kwargs pass through to solo_instrument, so inference-time spec
  mutations (use_angular_cumsum, compute_loudness_fresh, reverb, ...)
  work on tiny checkpoints exactly as on the flagship preset.
  """
  kwargs.setdefault('rnn_channels', 64)
  kwargs.setdefault('ch', 64)
  kwargs.setdefault('layers_per_stack', 1)
  return solo_instrument(n_samples=n_samples,
                         sample_rate=sample_rate,
                         time_steps=time_steps,
                         n_harmonics=n_harmonics,
                         n_noise_magnitudes=n_noise_magnitudes,
                         reverb_length=reverb_length,
                         **kwargs)


@register_preset('vst')
def vst(sample_rate: int = 16000,
        frame_rate: int = 50,
        frame_size: int = 1024,
        n_harmonics: int = 60,
        n_noise_magnitudes: int = 65,
        rnn_channels: int = 512,
        ch: int = 256,
        layers_per_stack: int = 1,
        reverb_length: int = 24000,
        seconds: float = 4.0,
        stateless: bool = False,
        reverb: bool = True,
        use_angular_cumsum: bool = False) -> Autoencoder:
  """Streaming (VST) autoencoder decoding from (power, f0).

  Reference: gin/models/vst/vst.gin. Synthesizes one extra hop for center
  padding and crops it from the back (generation is forward-looking).
  """
  hop_size = sample_rate // frame_rate
  n_samples = int(seconds * sample_rate) + hop_size  # Extra center frame.

  dag = [
      (proc.Harmonic(n_samples=n_samples, sample_rate=sample_rate,
                     amp_resample_method='linear',
                     use_angular_cumsum=use_angular_cumsum,
                     name='harmonic'),
       ['amps', 'harmonic_distribution', 'f0_hz']),
      (proc.FilteredNoise(n_samples=n_samples, window_size=0,
                          name='filtered_noise'),
       ['noise_magnitudes']),
      (proc.Add(name='add'),
       ['filtered_noise/signal', 'harmonic/signal']),
  ]
  if reverb:
    dag.append((proc.FilteredNoiseReverb(
        trainable=True, reverb_length=reverb_length, n_frames=500,
        n_filter_banks=32, name='reverb'), ['add/signal']))
    crop_input = 'reverb/signal'
  else:
    crop_input = 'add/signal'
  # Remove the extra frame of synthesis from centering.
  dag.append((proc.Crop(frame_size=hop_size, crop_location='back',
                        name='crop'), [crop_input]))

  return Autoencoder(
      preprocessor=nn.OnlineF0PowerPreprocessor(
          frame_rate=frame_rate,
          frame_size=frame_size,
          padding='center',
          compute_power=True,
          compute_f0=False),
      encoder=None,
      decoder=nn.RnnFcDecoder(
          rnn_channels=rnn_channels,
          rnn_type='gru',
          ch=ch,
          layers_per_stack=layers_per_stack,
          stateless=stateless,
          input_keys=('pw_scaled', 'f0_scaled'),
          output_splits=(('amps', 1),
                         ('harmonic_distribution', n_harmonics),
                         ('noise_magnitudes', n_noise_magnitudes))),
      processor_group=proc.ProcessorGroup(dag=dag),
      losses=(losses_lib.SpectralLoss(loss_type='L1', mag_weight=1.0,
                                      logmag_weight=1.0),))


@register_preset('midiae')
def midiae(n_samples: int = 64000,
           sample_rate: int = 16000,
           time_steps: int = 1000,
           n_harmonics: int = 60,
           n_noise_magnitudes: int = 65,
           ch: int = 128,
           layers_per_stack: int = 9,
           stacks: int = 2,
           reverb: bool = True,
           reverb_length: int = 24000,
           use_midi_encoder: bool = True):
  """MidiAutoencoder: DDSP synthcoder + quantized-MIDI bottleneck.

  Reference: gin/models/midiae/midiae.gin (+ the midi_encoder mixin):
  DilatedConvDecoder synthcoder, MidiToHarmonicDecoder, reconstruction
  LossGroup (spectral + f0/amps/hd/noise params). With
  use_midi_encoder=False, ground-truth MIDI comes from
  features['note_active_velocities'] (URMP-style data).
  """
  from ddsp_tpu.models import MarginLoss, MidiAutoencoder

  midi_encoder = None
  if use_midi_encoder:
    midi_encoder = nn.HarmonicToMidiEncoder(
        net=nn.DilatedConvStack(ch=ch, layers_per_stack=5, stacks=4,
                                norm_type='layer'))

  recon_losses = losses_lib.LossGroup(dag=[
      (losses_lib.SpectralLoss(loss_type='L1', mag_weight=1.0,
                               logmag_weight=1.0,
                               name='synth_spectral_loss'),
       ['audio', 'synth_audio']),
      (losses_lib.ParamLoss(weight=50.0, loss_type='L2', name='f0_loss'),
       ['f0_midi', 'f0_midi_pred', 'f0_loss_weights']),
      (losses_lib.ParamLoss(weight=0.5, name='amps_loss'),
       ['amps', 'amps_pred']),
      (losses_lib.ParamLoss(weight=500.0, name='hd_loss'),
       ['hd', 'hd_pred']),
      (losses_lib.ParamLoss(weight=0.5, name='noise_loss'),
       ['noise', 'noise_pred']),
  ])

  return MidiAutoencoder(
      preprocessor=nn.F0LoudnessPreprocessor(time_steps=time_steps,
                                             sample_rate=sample_rate),
      synthcoder=nn.DilatedConvDecoder(
          ch=ch, layers_per_stack=layers_per_stack, stacks=stacks,
          norm_type='layer', conditioning_keys=(),
          input_keys=('ld_scaled', 'f0_scaled'),
          output_splits=(('amplitudes', 1),
                         ('harmonic_distribution', n_harmonics),
                         ('magnitudes', n_noise_magnitudes))),
      midi_encoder=midi_encoder,
      midi_decoder=nn.MidiToHarmonicDecoder(
          net=nn.DilatedConvStack(ch=ch, layers_per_stack=5, stacks=4,
                                  norm_type='layer'),
          f0_residual=True,
          output_splits=(('f0_midi', 1), ('amplitudes', 1),
                         ('harmonic_distribution', n_harmonics),
                         ('magnitudes', n_noise_magnitudes))),
      reconstruction_losses=recon_losses,
      qpitch_f0rec_loss=MarginLoss(weight=50.0, margin=0.5),
      n_samples=n_samples, sample_rate=sample_rate,
      reverb=reverb, reverb_length=reverb_length)


@register_preset('inverse_synthesis')
def inverse_synthesis(n_samples: int = 64000,
                      sample_rate: int = 16000,
                      n_sinusoids: int = 100,
                      freq_depth: int = 64,
                      n_harmonics: int = 100,
                      n_noise_magnitudes: int = 65,
                      resnet_size: str = 'small',
                      reverb: bool = False):
  """DDSP-INV self-supervised hierarchical model.

  Reference: gin/papers/icml2020/pretrain_model.gin: ResnetSinusoidalEncoder
  ('small', logmel 229 bins), SinusoidalToHarmonicEncoder (RnnSandwich),
  KDE sinusoidal consistency, harmonic + filtered-noise consistency.
  """
  from ddsp_tpu.models import InverseSynthesis

  return InverseSynthesis(
      sinusoidal_encoder=nn.ResnetSinusoidalEncoder(
          size=resnet_size,
          output_splits=(('frequencies', n_sinusoids * freq_depth),
                         ('amplitudes', n_sinusoids),
                         ('noise_magnitudes', n_noise_magnitudes))),
      harmonic_encoder=nn.SinusoidalToHarmonicEncoder(
          net=nn.RnnSandwich(), n_harmonics=n_harmonics,
          f0_depth=freq_depth),
      losses=(losses_lib.SpectralLoss(loss_type='L1', mag_weight=1.0,
                                      logmag_weight=1.0),),
      sinusoidal_consistency_losses=(
          losses_lib.KDEConsistencyLoss(weight_a=1.0, weight_b=1.0,
                                        scale_a=0.1, scale_b=0.1),),
      harmonic_consistency_losses=(
          losses_lib.HarmonicConsistencyLoss(amp_weight=1.0,
                                             dist_weight=1.0,
                                             f0_weight=1.0),),
      filtered_noise_consistency_loss=(
          losses_lib.FilteredNoiseConsistencyLoss(weight=1.0)),
      freq_depth=freq_depth,
      n_samples=n_samples, sample_rate=sample_rate, reverb=reverb)
