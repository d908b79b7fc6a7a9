"""Unit tests for CRCs, UTF-8-like coding, and the bit sink."""

import numpy as np
import pytest

from flacenc_tpu.bitio import BitSink
from flacenc_tpu.errors import RangeError
from flacenc_tpu.utils import crc8, crc16, encode_to_utf8like, utf8like_bytesize


def test_utf8like_goldens():
    # goldens from reference component.rs:60-77
    assert encode_to_utf8like(0x56) == bytes([0x56])
    assert encode_to_utf8like(0x1024) == bytes([0xE1, 0x80, 0xA4])
    assert encode_to_utf8like(0xF_FFFF_FFFF) == bytes(
        [0xFE, 0xBF, 0xBF, 0xBF, 0xBF, 0xBF, 0xBF]
    )
    with pytest.raises(RangeError):
        encode_to_utf8like(0x10_0000_0000)


def test_utf8like_roundtrip_and_size():
    from flacenc_tpu.component.parser import BitReader, parse_utf8like

    for v in [0, 1, 127, 128, 2047, 2048, 65535, (1 << 31) - 1, (1 << 36) - 1]:
        enc = encode_to_utf8like(v)
        assert len(enc) == utf8like_bytesize(v)
        r = BitReader(enc)
        assert parse_utf8like(r) == v


def test_crc8_known_vector():
    # CRC-8/SMBUS check value: crc8("123456789") == 0xF4
    assert crc8(b"123456789") == 0xF4


def test_crc16_known_vector():
    # CRC-16/UMTS (poly 0x8005, init 0, no reflect): check == 0xFEE8
    assert crc16(b"123456789") == 0xFEE8


def test_bitsink_patterns():
    s = BitSink()
    s.write_lsbs(0b101, 3)
    s.write_lsbs(0b01, 2)
    s.write_zeros(3)
    assert s.as_bytes() == bytes([0b10101000])

    s = BitSink()
    s.write_twoc(-1, 4)
    s.write_twoc(3, 4)
    assert s.as_bytes() == bytes([0b11110011])

    s = BitSink()
    s.write_unary(9)  # 9 zeros then a one
    s.align_to_byte()
    assert s.as_bytes() == bytes([0b00000000, 0b01000000])

    s = BitSink()
    s.write_lsbs(0xDEADBEEF, 32)
    assert s.as_bytes() == bytes([0xDE, 0xAD, 0xBE, 0xEF])


def test_bitsink_bitstring():
    s = BitSink()
    s.write_lsbs(0b0111, 4)
    assert s.to_bitstring() == "0111****"


def test_bitsink_msb_goldens():
    # bitsink.rs:775-793 (bytevec_write_msb)
    s = BitSink()
    s.write_msbs(0xFF, 8, 3)
    s.write_msbs(0x0, 64, 12)
    s.write_msbs(0xFFFF_FFFF, 32, 9)
    s.write_msbs(0x0, 16, 8)
    assert s.to_bitstring() == "11100000_00000001_11111111_00000000"

    s = BitSink()
    s.write_msbs(0xA0, 8, 3)
    assert s.to_bitstring() == "101*****"

    s = BitSink()
    s.write_msbs(0x00, 8, 2)
    s.write_msbs(0xFF, 8, 3)
    s.write_msbs(0x00, 8, 2)
    assert s.to_bitstring() == "0011100*"


def test_bitsink_align_semantics():
    # bitsink.rs:752-764
    s = BitSink()
    s.write_lsbs(0x01, 1)
    s.align_to_byte()
    assert len(s) == 8
    s.align_to_byte()
    assert len(s) == 8
    s.write_lsbs(0x01, 2)
    assert len(s) == 10
    s.align_to_byte()
    assert len(s) == 16


def test_bitsink_twoc_golden():
    # bitsink.rs:766-772
    s = BitSink()
    s.write_twoc(-7, 4)
    assert s.to_bitstring() == "1001****"
