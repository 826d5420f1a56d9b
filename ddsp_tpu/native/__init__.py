"""Native (C) runtime components, loaded via ctypes.

Currently: the TFRecord codec (CRC32C + record framing), the hot part of
dataset writing/verification. Compiled lazily on first use with the system
C compiler and cached next to the source; every caller must handle
`load_codec()` returning None (pure-Python fallback).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger('ddsp_tpu')

_SRC = os.path.join(os.path.dirname(__file__), 'tfrecord_codec.c')
_LIB = os.path.join(os.path.dirname(__file__), 'libtfrecord_codec.so')
_codec = None
_codec_failed = False


def _build() -> bool:
  for cc in ('cc', 'gcc', 'clang'):
    try:
      subprocess.run([cc, '-O3', '-shared', '-fPIC', _SRC, '-o', _LIB],
                     check=True, capture_output=True, timeout=120)
      return True
    except (OSError, subprocess.SubprocessError):
      continue
  return False


def load_codec() -> Optional[ctypes.CDLL]:
  """Load (building if needed) the native codec; None if unavailable."""
  global _codec, _codec_failed
  if _codec is not None or _codec_failed:
    return _codec
  try:
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB) <
                                    os.path.getmtime(_SRC)):
      if not _build():
        raise OSError('no working C compiler')
    lib = ctypes.CDLL(_LIB)
    lib.ddsp_crc32c.restype = ctypes.c_uint32
    lib.ddsp_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.ddsp_masked_crc.restype = ctypes.c_uint32
    lib.ddsp_masked_crc.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.ddsp_frame_record.restype = ctypes.c_size_t
    lib.ddsp_frame_record.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_char_p]
    lib.ddsp_check_record.restype = ctypes.c_longlong
    lib.ddsp_check_record.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    _codec = lib
  except OSError as e:
    logger.info('Native tfrecord codec unavailable (%s); using pure '
                'Python.', e)
    _codec_failed = True
  return _codec


def crc32c(data: bytes) -> Optional[int]:
  lib = load_codec()
  if lib is None:
    return None
  return int(lib.ddsp_crc32c(data, len(data)))


def masked_crc(data: bytes) -> Optional[int]:
  lib = load_codec()
  if lib is None:
    return None
  return int(lib.ddsp_masked_crc(data, len(data)))


def frame_record(payload: bytes) -> Optional[bytes]:
  """Frame one TFRecord (length + masked CRCs) natively."""
  lib = load_codec()
  if lib is None:
    return None
  out = ctypes.create_string_buffer(12 + len(payload) + 4)
  n = lib.ddsp_frame_record(payload, len(payload), out)
  return out.raw[:n]


def check_record(framed: bytes) -> Optional[int]:
  """Verify one framed record (both masked CRCs) in a single native call.

  Returns the payload length on success, a negative error code on
  failure (-1 truncated, -2 length-CRC, -3 data-CRC), or None when the
  native codec is unavailable (caller falls back to pure Python).
  """
  lib = load_codec()
  if lib is None:
    return None
  return int(lib.ddsp_check_record(framed, len(framed)))
