"""Model export: portable artifacts from a train directory.

Reference behavior: /root/reference/ddsp/training/ddsp_export.py
(ckpt -> SavedModel -> TFJS -> TFLite). TPU-native equivalents:

  * 'params': spec + params as a .npz flat dict (always available) - the
    deployment artifact for any JAX runtime.
  * 'stablehlo': serialized StableHLO of the jitted forward via
    jax.export - compiler-level artifact, runnable by any
    StableHLO-compatible runtime (IREE, XLA).

TFJS/TFLite conversion requires the tensorflow toolchain (not assumed
installed); export_model raises a clear error for those formats when the
dependency is missing.
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


def export_model(save_dir: str, export_dir: str,
                 fmt: str = 'params',
                 inference_model: str = 'autoencoder',
                 length_seconds: float = 4,
                 **kwargs) -> str:
  """Export a trained model directory to a deployment artifact.

  Args:
    save_dir: Train directory (operative spec + orbax checkpoints).
    export_dir: Output directory.
    fmt: 'params' (npz + spec json) or 'stablehlo' (jax.export bytes).
    inference_model: 'autoencoder' (others route through the same path).
    length_seconds: Generation length baked into the exported program.
    **kwargs: Overrides for the inference model (e.g. remove_reverb).

  Returns:
    Path of the main exported file.
  """
  from ddsp_tpu.infer.inference import AutoencoderInference

  os.makedirs(export_dir, exist_ok=True)
  del inference_model  # Single routing for now.
  model = AutoencoderInference(save_dir, length_seconds=length_seconds,
                               **kwargs)

  # Always write the spec next to the artifact - the MUTATED inference
  # spec, so a runtime rebuilding the model from this JSON gets the exact
  # architecture the exported params belong to (reverb removal and the
  # new n_samples/time_steps included), not the train-time one.
  spec = dict(utils.load_spec(save_dir))
  spec['kwargs'] = dict(model.spec['kwargs'], **getattr(
      model, 'applied_mutations', {}))
  with open(os.path.join(export_dir, 'operative_spec.json'), 'w') as f:
    json.dump(spec, f, indent=2, sort_keys=True)

  if fmt == 'params':
    path = os.path.join(export_dir, 'params.npz')
    np.savez(path, **_flatten(model.params))
    return path
  elif fmt == 'stablehlo':
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
  elif fmt in ('tfjs', 'tflite', 'savedmodel'):
    raise NotImplementedError(
        f'{fmt!r} export requires the tensorflow toolchain, which is not '
        "part of this environment. Use fmt='params' or 'stablehlo'.")
  else:
    raise ValueError(f'Unknown export format {fmt!r}')


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
