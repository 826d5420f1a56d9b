"""Model export: portable artifacts from a train directory.

Reference behavior: /root/reference/ddsp/training/ddsp_export.py
(ckpt -> SavedModel -> TFJS -> TFLite). TPU-native equivalents:

  * 'params': spec + params as a .npz flat dict (always available) - the
    deployment artifact for any JAX runtime.
  * 'stablehlo': serialized StableHLO of the jitted forward via
    jax.export - compiler-level artifact, runnable by any
    StableHLO-compatible runtime (IREE, XLA).
  * 'savedmodel': TF SavedModel via jax2tf (weights baked in as
    constants, like the reference's ckpt->SavedModel path) with concrete
    per-signature functions for the autoencoder and each VST module.
  * 'tflite': the SavedModel converted with tf.lite.TFLiteConverter
    (TFLITE_BUILTINS + SELECT_TF_OPS, matching the reference's converter
    settings, ddsp_export.py:186-199).

TFJS conversion requires the tensorflowjs package (not in this
environment); export_model raises a clear error for that format.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_tpu import utils


def _flatten(tree: Dict[str, Any], prefix: str = '') -> Dict[str, Any]:
  flat = {}
  for k, v in tree.items():
    key = f'{prefix}/{k}' if prefix else k
    if isinstance(v, dict):
      flat.update(_flatten(v, key))
    else:
      flat[key] = np.asarray(v)
  return flat


def unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
  """Inverse of the exporter's flattening ('a/b/c' keys -> nested dict)."""
  tree: Dict[str, Any] = {}
  for key, v in flat.items():
    parts = key.split('/')
    node = tree
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = v
  return tree


def _write_operative_spec(save_dir: str, export_dir: str, model) -> None:
  """Write the MUTATED inference spec next to the artifact.

  A runtime rebuilding the model from this JSON gets the exact
  architecture the exported params belong to (reverb removal and the new
  n_samples/time_steps included), not the train-time one.
  """
  spec = dict(utils.load_spec(save_dir))
  spec['kwargs'] = dict(getattr(model, 'spec', spec)['kwargs'], **getattr(
      model, 'applied_mutations', {}))
  with open(os.path.join(export_dir, 'operative_spec.json'), 'w') as f:
    json.dump(spec, f, indent=2, sort_keys=True)


def _tf_export_signature(save_dir: str, inference_model: str,
                         length_seconds: float, kwargs: Dict[str, Any]):
  """(module, pure jax fn, ordered {name: example}) per inference model.

  Mirrors the reference's --inference_model enum (ddsp_export.py:70-85):
  one concrete signature per exported model. The stateful
  'vst_predict_controls' exports the stateless signature (explicit state
  in/out) - a SavedModel produced by jax2tf has no variables to carry
  hidden state, so the host owns the state buffer, exactly like the
  reference's VSTStatelessPredictControls export.
  """
  from ddsp_tpu.infer import inference as inf

  if inference_model == 'autoencoder':
    m = inf.AutoencoderInference(save_dir, length_seconds=length_seconds,
                                 **kwargs)

    def fn(f0_hz, loudness_db):
      out = m._call(m.params,  # pylint: disable=protected-access
                    {'f0_hz': f0_hz, 'loudness_db': loudness_db})
      return out['audio_synth']

    args = {'f0_hz': np.zeros((1, m.n_frames, 1), np.float32),
            'loudness_db': np.zeros((1, m.n_frames, 1), np.float32)}
    return m, fn, args

  if inference_model == 'vst_extract_features':
    m = inf.VSTExtractFeatures(save_dir, **kwargs)
    args = {'audio': np.zeros((m.frame_size,), np.float32)}
    return m, m._call, args  # pylint: disable=protected-access

  if inference_model in ('vst_predict_controls',
                         'vst_stateless_predict_controls'):
    m = inf.VSTStatelessPredictControls(save_dir)
    args = {'f0_scaled': np.zeros((1,), np.float32),
            'pw_scaled': np.zeros((1,), np.float32),
            'state': np.zeros((m.state_size,), np.float32)}
    return m, m._call, args  # pylint: disable=protected-access

  if inference_model == 'vst_synthesize':
    m = inf.VSTSynthesize(save_dir, **kwargs)
    z1 = np.zeros((1,), np.float32)
    args = {'amps': z1, 'prev_amps': z1,
            'hd': np.zeros((m.n_harmonics,), np.float32),
            'prev_hd': np.zeros((m.n_harmonics,), np.float32),
            'f0': z1, 'prev_f0': z1,
            'noise': np.zeros((m.n_noise,), np.float32),
            'prev_phase': z1}
    return m, m._call, args  # pylint: disable=protected-access

  if inference_model == 'vst_synthesize_harmonic':
    m = inf.VSTSynthesizeHarmonic(save_dir, **kwargs)
    z1 = np.zeros((1,), np.float32)
    args = {'amps': z1, 'prev_amps': z1,
            'hd': np.zeros((m.n_harmonics,), np.float32),
            'prev_hd': np.zeros((m.n_harmonics,), np.float32),
            'f0': z1, 'prev_f0': z1, 'prev_phase': z1}
    return m, m.__call__, args

  if inference_model == 'vst_synthesize_noise':
    m = inf.VSTSynthesizeNoise(save_dir, **kwargs)
    args = {'noise': np.zeros((m.n_noise,), np.float32)}
    return m, m.__call__, args

  raise ValueError(f'Unknown inference_model {inference_model!r}')


def _export_tf(save_dir: str, export_dir: str, fmt: str,
               inference_model: str, length_seconds: float,
               kwargs: Dict[str, Any]) -> str:
  """SavedModel / TFLite export through jax2tf.

  Reference: ddsp_export.py:116-199 (ckpt -> SavedModel -> TFLite with
  TFLITE_BUILTINS + SELECT_TF_OPS). Weights are baked into the graph as
  constants, which is what the reference's SavedModel effectively ships
  for inference too.
  """
  import tensorflow as tf  # pylint: disable=g-import-not-at-top
  from jax.experimental import jax2tf  # pylint: disable=g-import-not-at-top

  from ddsp_tpu.ops import fft_matmul  # pylint: disable=g-import-not-at-top

  module, fn, args = _tf_export_signature(save_dir, inference_model,
                                          length_seconds, kwargs)
  _write_operative_spec(save_dir, export_dir, module)

  tf_fn = jax2tf.convert(fn, with_gradient=False)
  wrapper = tf.Module()
  signature = [tf.TensorSpec(np.shape(v), tf.float32, name=k)
               for k, v in args.items()]
  wrapper.__call__ = tf.function(lambda *a: tf_fn(*a),
                                 input_signature=signature, autograph=False)
  # TFLite cannot legalize stablehlo.fft; trace the GEMM-DFT paths
  # instead (pure matmuls) when converting for it.
  with fft_matmul.force_matmul_dft(fmt == 'tflite'):
    concrete = wrapper.__call__.get_concrete_function()

  sm_dir = os.path.join(export_dir, 'savedmodel')
  tf.saved_model.save(wrapper, sm_dir, signatures=concrete)
  if fmt == 'savedmodel':
    return sm_dir

  converter = tf.lite.TFLiteConverter.from_saved_model(sm_dir)
  converter.target_spec.supported_ops = [
      tf.lite.OpsSet.TFLITE_BUILTINS,
      tf.lite.OpsSet.SELECT_TF_OPS,
  ]
  blob = converter.convert()
  path = os.path.join(export_dir, f'{inference_model}.tflite')
  with open(path, 'wb') as f:
    f.write(blob)
  return path


def export_model(save_dir: str, export_dir: str,
                 fmt: str = 'params',
                 inference_model: str = 'autoencoder',
                 length_seconds: float = 4,
                 **kwargs) -> str:
  """Export a trained model directory to a deployment artifact.

  Args:
    save_dir: Train directory (operative spec + orbax checkpoints).
    export_dir: Output directory.
    fmt: 'params' (npz + spec json), 'stablehlo' (jax.export bytes),
      'savedmodel' (TF SavedModel via jax2tf), or 'tflite'.
    inference_model: 'autoencoder' or one of the six VST signatures
      (vst_extract_features, vst_predict_controls,
      vst_stateless_predict_controls, vst_synthesize,
      vst_synthesize_harmonic, vst_synthesize_noise). 'params' and
      'stablehlo' support 'autoencoder' only.
    length_seconds: Generation length baked into the exported program.
    **kwargs: Overrides for the inference model (e.g. remove_reverb).

  Returns:
    Path of the main exported file.
  """
  from ddsp_tpu.infer.inference import AutoencoderInference

  os.makedirs(export_dir, exist_ok=True)
  if fmt in ('savedmodel', 'tflite'):
    return _export_tf(save_dir, export_dir, fmt, inference_model,
                      length_seconds, kwargs)
  if fmt == 'tfjs':
    raise NotImplementedError(
        "'tfjs' export requires the tensorflowjs package, which is not "
        "part of this environment. Export fmt='savedmodel' and convert "
        'with tensorflowjs_converter where it is installed.')
  if fmt not in ('params', 'stablehlo'):
    raise ValueError(f'Unknown export format {fmt!r}')
  if inference_model != 'autoencoder':
    raise ValueError(
        f"fmt={fmt!r} supports inference_model='autoencoder' only; VST "
        "signatures export via fmt='savedmodel' or 'tflite'.")

  model = AutoencoderInference(save_dir, length_seconds=length_seconds,
                               **kwargs)
  _write_operative_spec(save_dir, export_dir, model)

  if fmt == 'params':
    path = os.path.join(export_dir, 'params.npz')
    np.savez(path, **_flatten(model.params))
    return path
  # stablehlo
  from jax import export as jax_export  # pylint: disable=g-import-not-at-top
  example = {
      'f0_hz': jnp.zeros((1, model.n_frames, 1)),
      'loudness_db': jnp.zeros((1, model.n_frames, 1)),
  }

  def forward(features):
    out = model._call(model.params, features)  # pylint: disable=protected-access
    return out['audio_synth']

  exported = jax_export.export(jax.jit(forward))(example)
  path = os.path.join(export_dir, 'model.stablehlo')
  with open(path, 'wb') as f:
    f.write(exported.serialize())
  return path


def export_impulse_response(save_dir: str, export_dir: str,
                            target_sr: int = None) -> str:
  """Extract a trained model's reverb impulse response and save it as wav.

  Mirrors reference ddsp_export.py:273 (export_impulse_response): restore
  the autoencoder with its room reverb intact, run one silent forward pass,
  and pull the 'ir' control out of the reverb processor's outputs.

  Args:
    save_dir: Train directory (operative spec + orbax checkpoints).
    export_dir: Output directory for reverb_ir_<sr>_hz.wav.
    target_sr: Optionally also write a linearly-resampled copy at this rate.

  Returns:
    Path of the impulse-response wav at the model's native sample rate.
  """
  from ddsp_tpu.eval.summaries import write_wav
  from ddsp_tpu.infer.inference import AutoencoderInference

  model = AutoencoderInference(save_dir, length_seconds=1,
                               remove_reverb=False)
  sr = model.sample_rate
  outputs = model({
      'f0_hz': np.full((model.n_frames,), 220.0, np.float32),
      'loudness_db': np.full((model.n_frames,), -40.0, np.float32),
  })
  ir = None
  for value in outputs.values():
    if isinstance(value, dict) and 'ir' in value.get('controls', {}):
      ir = np.asarray(value['controls']['ir'])[0]
      break
  if ir is None:
    raise ValueError(f'No reverb processor with an "ir" control found in '
                     f'the model restored from {save_dir!r}')
  print(f'Reverb impulse response is {ir.shape[0] / sr:.3f} seconds long')

  os.makedirs(export_dir, exist_ok=True)
  path = os.path.join(export_dir, f'reverb_ir_{sr}_hz.wav')
  write_wav(path, ir, sr)
  if target_sr is not None and target_sr != sr:
    from ddsp_tpu.ops.resample import resample
    n_target = int(round(ir.shape[0] * target_sr / sr))
    ir_rs = np.asarray(resample(jnp.asarray(ir)[jnp.newaxis, :], n_target,
                                method='linear', add_endpoint=False))[0]
    write_wav(os.path.join(export_dir, f'reverb_ir_{target_sr}_hz.wav'),
              ir_rs, target_sr)
  return path
