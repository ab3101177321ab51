"""Golden codec tests -- byte-exact ports of the reference test vectors.

Sources (semantics only, reimplemented):
- ProtocolBuffers.Tests/ProtobufReaderTests.cs:11-39 (protobuf docs vectors)
- HuffmanCoding.Tests/StorageHelpersTests.cs:11-33 (MSB-first varint lengths)
- HuffmanCoding.Tests/DeltaWriterReaderTests.cs:12-37 (zigzag-delta roundtrip)
"""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from osm_pbf_convert_spark.codecs import (
    coord_as_int,
    decode_varints,
    decode_varints_msb,
    delta_decode,
    delta_encode,
    encode_varints,
    encode_varints_msb,
    int_to_coord,
    zigzag_decode,
    zigzag_encode,
)


class TestProtobufVarint:
    def test_field1_varint_150(self):
        # wire bytes 08 96 01 = field 1 (varint), value 150
        buf = bytes([0x08, 0x96, 0x01])
        vals = decode_varints(buf)
        key, value = int(vals[0]), int(vals[1])
        assert key >> 3 == 1 and key & 7 == 0
        assert value == 150

    def test_field2_string_testing(self):
        # wire bytes 12 07 "testing" = field 2 (len), "testing"
        buf = bytes([0x12, 0x07]) + b"testing"
        hdr = decode_varints(buf[:2])
        assert int(hdr[0]) >> 3 == 2 and int(hdr[0]) & 7 == 2
        assert int(hdr[1]) == 7
        assert buf[2:] == b"testing"

    def test_roundtrip_vectorized(self):
        vals = [0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1]
        assert decode_varints(encode_varints(vals)).tolist() == vals

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
    def test_roundtrip_property(self, vals):
        assert decode_varints(encode_varints(vals)).tolist() == vals


class TestMsbVarint:
    """StorageHelpersTests.cs: encoded-length assertions."""

    @pytest.mark.parametrize(
        "value,nbytes",
        [(0, 1), (1, 1), (127, 1), (128, 2), (16384, 3), (16383, 2), (2**64 - 1, 10)],
    )
    def test_encoded_length(self, value, nbytes):
        # reference vectors: 0,1,127 -> 1B; 128 -> 2B; ulong.MaxValue -> 10B.
        # (16384 needs 15 bits -> 3 groups; 16383 is the 2-byte max.)
        assert len(encode_varints_msb([value])) == nbytes

    def test_msb_byte_order(self):
        # 300 = 0b10_0101100 -> groups MSB-first: 0x82 0x2C
        assert encode_varints_msb([300]) == bytes([0x82, 0x2C])

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
    def test_roundtrip(self, vals):
        assert decode_varints_msb(encode_varints_msb(vals)).tolist() == vals

    def test_differs_from_protobuf_flavor(self):
        assert encode_varints_msb([300]) != encode_varints([300])


class TestZigZagDelta:
    def test_reference_sequence(self):
        # DeltaWriterReaderTests.cs: 10,15,7,12,1 (non-monotonic)
        seq = np.array([10, 15, 7, 12, 1], dtype=np.int64)
        deltas = delta_encode(seq)
        zz = zigzag_encode(deltas)
        wire = encode_varints(zz.tolist())
        back = delta_decode(zigzag_decode(decode_varints(wire)))
        assert back.tolist() == seq.tolist()

    @pytest.mark.parametrize(
        "v,z", [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4), (2**62, 2**63), (-(2**63), 2**64 - 1)]
    )
    def test_zigzag_vectors(self, v, z):
        assert int(zigzag_encode(np.array([v]))[0]) == z
        assert int(zigzag_decode(np.array([z], dtype=np.uint64))[0]) == v

    @given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
    def test_zigzag_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.int64)
        assert zigzag_decode(zigzag_encode(arr)).tolist() == vals


class TestQuantization:
    def test_truncation_toward_zero(self):
        # C# (int) truncates toward zero -- negatives differ from floor
        degs = np.array([0.0, 90.0, -90.0, 180.0, -180.0, 1e-7, -1e-7, 47.5, -47.5])
        got = coord_as_int(degs)
        expected = [int(d / 180 * 2147483647) for d in degs]  # python int() truncates too
        assert got.tolist() == expected

    def test_edge_values(self):
        assert coord_as_int(np.array([180.0]))[0] == 2147483647
        assert coord_as_int(np.array([-180.0]))[0] == -2147483647

    @given(st.floats(min_value=-180.0, max_value=180.0, allow_nan=False))
    def test_roundtrip_error_bound(self, deg):
        i = coord_as_int(np.array([deg]))[0]
        back = int_to_coord(np.array([i]))[0]
        assert abs(back - deg) < 1e-7  # one quantum is ~8.4e-8 degrees
