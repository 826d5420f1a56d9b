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

  # Always write the spec next to the artifact.
  spec = utils.load_spec(save_dir)
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
