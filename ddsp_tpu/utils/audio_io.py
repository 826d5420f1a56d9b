"""Shared PCM-to-float audio conversion.

One definition of the WAV dtype normalization + stereo downmix used by
both the dataset-prep loader (data/prepare.py) and the notebook helpers
(utils/notebook.py), so a fix to the conversion reaches every entry
point. (Resampling intentionally stays per-caller: prep uses scipy's FFT
resampler for quality, notebooks use np.interp for weight.)
"""

from __future__ import annotations

import numpy as np


def pcm_to_float_mono(data: np.ndarray) -> np.ndarray:
  """int/uint/float PCM array -> float32 in [-1, 1], stereo averaged."""
  data = np.asarray(data)
  if data.dtype.kind == 'i':
    data = data.astype(np.float32) / np.iinfo(data.dtype).max
  elif data.dtype.kind == 'u':
    info = np.iinfo(data.dtype)
    data = (data.astype(np.float32) - info.max / 2) / (info.max / 2)
  else:
    data = data.astype(np.float32)
  if data.ndim == 2:  # channels -> mono
    data = data.mean(axis=1)
  return data
