"""Tests for the native (C) TFRecord codec against the Python reference."""

import numpy as np
import pytest

from ddsp_tpu import native
from ddsp_tpu.data import tfrecord


RNG = np.random.RandomState(2)


def _py_masked_crc(data):
  crc = tfrecord.crc32c(data)
  return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


class TestNativeCodec:

  def test_crc32c_matches_python(self):
    if native.load_codec() is None:
      pytest.skip('no C compiler available')
    for n in [0, 1, 3, 8, 15, 16, 255, 4096, 100001]:
      data = RNG.bytes(n)
      assert native.crc32c(data) == tfrecord.crc32c(data)
      assert native.masked_crc(data) == _py_masked_crc(data)

  def test_crc32c_known_vector(self):
    # RFC 3720 test vector: crc32c of 32 zero bytes.
    if native.load_codec() is None:
      pytest.skip('no C compiler available')
    assert native.crc32c(b'\x00' * 32) == 0x8A9136AA

  def test_frame_record_round_trip(self, tmp_path):
    if native.load_codec() is None:
      pytest.skip('no C compiler available')
    payload = RNG.bytes(1000)
    framed = native.frame_record(payload)
    path = str(tmp_path / 'one.tfrecord')
    with open(path, 'wb') as f:
      f.write(framed)
    records = list(tfrecord.read_records(path, verify_crc=True))
    assert records == [payload]

  def test_write_read_examples_with_native_path(self, tmp_path):
    examples = [{
        'audio': RNG.randn(1000).astype(np.float32),
        'f0_hz': RNG.rand(10).astype(np.float32),
    } for _ in range(3)]
    path = str(tmp_path / 'ex.tfrecord')
    tfrecord.write_examples(path, examples)
    back = list(tfrecord.read_examples(path))
    assert len(back) == 3
    for ex, b in zip(examples, back):
      # Compare EVERY feature (a parser bug could round-trip the first
      # feature while corrupting the rest).
      assert set(b) >= set(ex)
      for k in ex:
        np.testing.assert_allclose(ex[k], b[k], err_msg=k)


def test_native_check_record_validates_and_rejects():
  from ddsp_tpu import native
  if native.load_codec() is None:
    import pytest
    pytest.skip('no native codec on this box')
  payload = b'hello tfrecord'
  framed = native.frame_record(payload)
  assert native.check_record(framed) == len(payload)
  # Truncated buffer.
  assert native.check_record(framed[:-2]) == -1
  # Corrupt length CRC.
  bad = bytearray(framed); bad[9] ^= 0xFF
  assert native.check_record(bytes(bad)) == -2
  # Corrupt payload.
  bad = bytearray(framed); bad[13] ^= 0xFF
  assert native.check_record(bytes(bad)) == -3
  # Huge forged length must not wrap the bounds check: forge len and a
  # VALID masked CRC over the forged length header.
  import struct
  forged_len = struct.pack('<Q', (1 << 64) - 16)
  crc = native.masked_crc(forged_len)
  forged = forged_len + struct.pack('<I', crc) + framed[12:]
  assert native.check_record(forged) == -1


def test_read_records_native_verify_path(tmp_path):
  from ddsp_tpu import native
  from ddsp_tpu.data import tfrecord
  path = str(tmp_path / 'x.tfrecord')
  recs = [b'a' * 10, b'b' * 100]
  tfrecord.write_records(path, recs)
  assert list(tfrecord.read_records(path, verify_crc=True)) == recs
  # Corrupt a payload byte: verify must raise.
  with open(path, 'r+b') as f:
    f.seek(13)
    f.write(b'Z')
  import pytest
  with pytest.raises(IOError, match='CRC'):
    list(tfrecord.read_records(path, verify_crc=True))
