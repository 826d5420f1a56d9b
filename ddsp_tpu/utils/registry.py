"""Preset registry and the serialized "operative spec" artifact.

Plays the role of gin's operative config in the reference (SURVEY.md
section 5.4/5.6): the (preset name, kwargs) pair is written alongside
checkpoints at train time, and re-parsed at eval/inference time to
reconstruct (and optionally mutate - e.g. different n_samples,
use_angular_cumsum) the exact model.
"""

from __future__ import annotations

import inspect
import json
import logging
import os
from typing import Any, Callable, Dict, Optional

_PRESETS: Dict[str, Callable[..., Any]] = {}


def register_preset(name: str):
  """Decorator registering a model factory under a preset name."""

  def wrap(fn):
    _PRESETS[name] = fn
    return fn

  return wrap


def get_preset(name: str) -> Callable[..., Any]:
  # Importing configs registers the built-in presets.
  import ddsp_tpu.configs  # noqa: F401  pylint: disable=g-import-not-at-top
  if name not in _PRESETS:
    raise KeyError(f'Unknown preset {name!r}. Available: '
                   f'{sorted(_PRESETS)}')
  return _PRESETS[name]


def list_presets():
  import ddsp_tpu.configs  # noqa: F401  pylint: disable=g-import-not-at-top
  return sorted(_PRESETS)


def build_model(name: str, **kwargs):
  """Instantiate a registered preset with overrides."""
  return get_preset(name)(**kwargs)


# ---------------------------------------------------------------------------
# Operative spec: the serialized architecture artifact
# ---------------------------------------------------------------------------
SPEC_FILENAME = 'operative_spec.json'


def save_spec(save_dir: str, preset: str, **kwargs) -> str:
  """Write the (preset, kwargs) model spec next to checkpoints."""
  os.makedirs(save_dir, exist_ok=True)
  path = os.path.join(save_dir, SPEC_FILENAME)
  with open(path, 'w') as f:
    json.dump({'preset': preset, 'kwargs': kwargs}, f, indent=2,
              sort_keys=True)
  return path


def load_spec(save_dir: str) -> Dict[str, Any]:
  """Read the model spec from a train directory."""
  path = os.path.join(save_dir, SPEC_FILENAME)
  with open(path) as f:
    return json.load(f)


def model_from_spec(save_dir: str, **overrides):
  """Reconstruct the model from a saved spec, with optional mutations.

  Mirrors the reference pattern of re-parsing the operative gin config at
  inference time and mutating it (reference inference.py:39-105). Like a
  gin mutation of a binding the config never had, an override the preset
  function does not accept is dropped (with a log line) instead of
  crashing - AutoencoderInference applies the same mutation set
  (use_angular_cumsum, reverb, ...) to every preset, and each preset
  honors the subset it understands.
  """
  spec = load_spec(save_dir)
  kwargs = dict(spec['kwargs'])
  kwargs.update(overrides)
  preset_fn = get_preset(spec['preset'])
  sig_params = inspect.signature(preset_fn).parameters
  takes_var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD
                     for p in sig_params.values())
  if not takes_var_kw:
    dropped = sorted(set(kwargs) - set(sig_params))
    if dropped:
      # warning on the project logger: root logging.info is invisible at
      # default config and a typo'd override would vanish silently.
      logging.getLogger('ddsp_tpu').warning(
          'model_from_spec: preset %r does not accept %s; dropping those '
          'overrides.', spec['preset'], dropped)
      kwargs = {k: v for k, v in kwargs.items() if k in sig_params}
  return build_model(spec['preset'], **kwargs)
