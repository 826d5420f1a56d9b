"""Sequence-parallel forward for full models (SP as a product feature).

`sp_forward_with_losses` runs a complete Autoencoder-style model with the
audio time axis sharded over the mesh's 'time' axis, reachable from the
Trainer (and `run.py --time_shards N`). Frame-rate work (preprocessor,
encoder, decoder, every processor's `get_controls`) executes as ordinary
sharded XLA; the audio-rate signal path is re-routed through the
shard_map kernels in `parallel.time_shard`:

  * Harmonic            -> time_sharded_harmonic_synthesis (phase carry)
  * FilteredNoise       -> frame-rate FIR design + halo-exchanging
                           time_sharded_fft_convolve on sharded noise
  * Reverb (+subclasses)-> time_sharded_fft_convolve, delay 0, dry mask
  * FIRFilter           -> FIR design + time_sharded_fft_convolve
  * anything else       -> the processor's own get_signal on the global
                           arrays (correct under GSPMD - XLA gathers as
                           needed - just not memory-sharded)
  * SpectralLoss (L1)   -> time_sharded_spectral_loss (all six terms)
  * other losses        -> called on the global arrays (GSPMD fallback)

The dispatch preserves single-device semantics exactly (including the
'noise' rng stream: draws happen in each processor's own scope, so
sharded and unsharded steps see identical noise), which the equivalence
tests pin.

This extends the reference's capability set: the reference (tf.distribute,
/root/reference/ddsp/training/train_util.py:29-78) is data-parallel only;
SURVEY.md section 5.7 defines this time-axis sharding as the framework's
new capability.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ddsp_tpu.losses.spectral import SpectralLoss
from ddsp_tpu.ops import fftconv as fftconv_ops
from ddsp_tpu.ops.core import nested_lookup, to_dict
from ddsp_tpu.parallel import time_shard
from ddsp_tpu.proc import dags
from ddsp_tpu.proc import effects as effects_lib
from ddsp_tpu.proc import synths as synths_lib
from ddsp_tpu.proc.dags import loss_module_name

Array = jax.Array
TensorDict = Dict[str, Any]


def has_time_sharding(mesh: Mesh) -> bool:
  """True when the mesh actually shards the audio time axis."""
  return (time_shard.TIME_AXIS in mesh.axis_names
          and mesh.shape[time_shard.TIME_AXIS] > 1)


def _sp_get_signal(module, controls: TensorDict, mesh: Mesh,
                   halo_impl: str) -> Array:
  """Processor get_signal with audio-rate work routed through shard_map."""
  if isinstance(module, synths_lib.Harmonic):
    return time_shard.time_sharded_harmonic_synthesis(
        mesh,
        controls['f0_hz'],
        controls['amplitudes'],
        controls['harmonic_distribution'],
        n_samples=module.n_samples,
        sample_rate=module.sample_rate,
        amp_resample_method=module.amp_resample_method)

  if isinstance(module, synths_lib.FilteredNoise):
    # Same scope + shape as the module's own draw, so the noise is
    # bit-identical to the unsharded step.
    if module.has_rng('noise'):
      key = module.make_rng('noise')
    else:
      key = jax.random.PRNGKey(0)
    batch_size = int(controls['magnitudes'].shape[0])
    noise = jax.random.uniform(key, (batch_size, module.n_samples),
                               minval=-1.0, maxval=1.0)
    ir = fftconv_ops.frequency_impulse_response(
        controls['magnitudes'], window_size=module.window_size)
    return time_shard.time_sharded_fft_convolve(mesh, noise, ir,
                                                halo_impl=halo_impl)

  if isinstance(module, effects_lib.Reverb):
    # Covers ExpDecayReverb / FilteredNoiseReverb: their specialization is
    # entirely in get_controls (already run); the signal path is shared.
    audio = controls['audio']
    ir = effects_lib._mask_dry_ir(controls['ir'])  # pylint: disable=protected-access
    wet = time_shard.time_sharded_fft_convolve(mesh, audio, ir,
                                               delay_compensation=0,
                                               halo_impl=halo_impl)
    return (wet + audio) if module.add_dry else wet

  if isinstance(module, effects_lib.FIRFilter):
    ir = fftconv_ops.frequency_impulse_response(
        controls['magnitudes'], window_size=module.window_size)
    return time_shard.time_sharded_fft_convolve(mesh, controls['audio'], ir,
                                                halo_impl=halo_impl)

  # Elementwise routing (Add/Mix/Crop/TensorToAudio) is shape-preserving
  # and works on sharded arrays as-is; anything else (Wavetable,
  # Sinusoidal, ModDelay) falls back to its single-device implementation
  # on the global arrays - GSPMD inserts the gathers, so results stay
  # correct; only the memory-sharding benefit is lost for that node.
  return module.get_signal(**controls)


def sp_run_dag(pg, inputs: TensorDict, mesh: Mesh,
               halo_impl: str = 'xla') -> TensorDict:
  """ProcessorGroup.run_dag with time-sharded signal generation.

  Mirrors DAGModule.run_dag (proc/dags.py) node for node: same
  processor/loss/plain-module dispatch, same nested-key routing, same
  outputs contract ({name: {signal, controls}}, 'out' alias). Only
  processor nodes get the time-sharded signal path; loss and plain
  network nodes run their ordinary implementation on the global arrays.
  """
  outputs = dict(inputs)
  outputs['inputs'] = inputs

  module_outputs = {}
  for module, name, in_keys, out_keys in zip(pg.dag_modules, pg.node_names,
                                             pg.node_input_keys,
                                             pg.node_output_keys):
    node_inputs = [nested_lookup(key, outputs) for key in in_keys]
    if dags.is_processor(module):
      controls = module.get_controls(*node_inputs)
      signal = _sp_get_signal(module, controls, mesh, halo_impl)
      module_outputs = dict(signal=signal, controls=controls)
    elif dags.is_loss(module):
      module_outputs = module.get_losses_dict(*node_inputs)
    else:
      module_outputs = module(*node_inputs)
      if not isinstance(module_outputs, dict):
        module_outputs = to_dict(module_outputs, out_keys)
    outputs[name] = module_outputs

  outputs['out'] = module_outputs
  return outputs


def _sp_loss(loss_obj, target_audio: Array, audio: Array, mesh: Mesh,
             halo_impl: str) -> Array:
  """SpectralLoss via the time-sharded kernels; others on global arrays."""
  if (isinstance(loss_obj, SpectralLoss)
      and loss_obj.loss_type.upper() == 'L1'):
    return time_shard.time_sharded_spectral_loss(
        mesh, target_audio, audio,
        fft_sizes=tuple(loss_obj.fft_sizes),
        mag_weight=loss_obj.mag_weight,
        delta_time_weight=loss_obj.delta_time_weight,
        delta_freq_weight=loss_obj.delta_freq_weight,
        cumsum_freq_weight=loss_obj.cumsum_freq_weight,
        logmag_weight=loss_obj.logmag_weight,
        loudness_weight=loss_obj.loudness_weight,
        halo_impl=halo_impl)
  return loss_obj(target_audio, audio)


def sp_forward_with_losses(model, features: TensorDict, mesh: Mesh,
                           halo_impl: str = 'xla',
                           training: bool = True
                           ) -> Tuple[TensorDict, TensorDict]:
  """Full-model forward + losses with the audio time axis sharded.

  Use as a flax apply method on an Autoencoder-style model (preprocessor /
  optional encoder / decoder / processor_group / losses):

    outputs, losses = model.apply(
        {'params': params}, batch, mesh=mesh,
        method=sp_forward_with_losses, rngs={'noise': rng})

  Returns the same (outputs, losses_dict-with-total_loss) contract as
  Model.__call__(return_losses=True).
  """
  features = model.encode(features, training=training)
  features = dict(features)
  features.update(model.decoder(features, training=training))

  dag_out = sp_run_dag(model.processor_group, features, mesh,
                       halo_impl=halo_impl)
  outputs = dict(dag_out)
  outputs['audio_synth'] = dag_out['out']['signal']

  losses_dict = {}
  for loss_obj in model.losses:
    name = loss_module_name(loss_obj)
    while name in losses_dict:
      name += '_'
    losses_dict[name] = _sp_loss(loss_obj, features['audio'],
                                 outputs['audio_synth'], mesh, halo_impl)
  losses_dict['total_loss'] = jnp.sum(
      jnp.asarray([v for v in losses_dict.values()]))
  return outputs, losses_dict
