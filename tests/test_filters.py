"""Byte-exact filter-chain interop (chain.clj / lz4.clj / deflate.clj).

The LZ4 cross-validation runs against net.jpountz.lz4 — the exact
library the reference links (project.clj) — which ships on Spark's own
classpath, via the session JVM.  That makes "byte-exact" a tested
property, not a claim: reference-compressed bytes decode here, and
bytes compressed here decode with the reference's decompressor.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from mandoline_spark.filters import (
    chain_apply,
    chain_reverse,
    lz4_block_compress,
    lz4_block_decompress,
)


def _samples():
    rng = np.random.default_rng(0)
    return [
        b"",
        b"a",
        b"abcd" * 4,
        b"x" * 10_000,  # highly compressible
        rng.integers(0, 256, 54_000, dtype=np.uint8).tobytes(),  # random
        (np.arange(27_000, dtype="<i2") % 1000).tobytes(),  # perf-chunk-like
        b"the quick brown fox " * 700,
    ]


def test_lz4_roundtrip_pure_python():
    for data in _samples():
        comp = lz4_block_compress(data)
        assert lz4_block_decompress(comp, len(data)) == data


def test_lz4_cross_validates_against_jpountz(spark):
    jvm = spark.sparkContext._jvm
    factory = jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    jcomp = factory.fastCompressor()
    jhc = factory.highCompressor()
    jdec = factory.fastDecompressor()
    for data in _samples():
        if not data:
            continue
        # reference-compressed (fast AND hc) -> our decoder
        for c in (jcomp, jhc):
            ref_bytes = bytes(c.compress(bytearray(data)))
            assert lz4_block_decompress(ref_bytes, len(data)) == data
        # our encoder -> reference decoder
        ours = lz4_block_compress(data)
        got = bytes(jdec.decompress(bytearray(ours), len(data)))
        assert got == data


def test_chain_envelope_layout():
    """Exact header bytes per chain.clj:1-18 and lz4.clj:1-21."""
    chunk = b"z" * 4_000  # compressible -> lz4 marker 1
    buf = chain_apply(chunk, ["lz4"])
    assert buf[0] == 0  # header version
    assert buf[1] == 1  # filter count
    assert buf[2] == 1  # lz4 code
    assert buf[3] == 1  # compressed marker
    assert int.from_bytes(buf[4:8], "little") == len(chunk)
    assert chain_reverse(buf) == chunk

    # incompressible payload -> marker 0, raw passthrough
    rnd = np.random.default_rng(1).integers(0, 256, 500, dtype=np.uint8)
    buf = chain_apply(rnd.tobytes(), ["lz4"])
    assert buf[3] == 0
    assert buf[4:] == rnd.tobytes()
    assert chain_reverse(buf) == rnd.tobytes()


def test_chain_deflate_and_stacked_filters():
    chunk = (np.arange(13_500, dtype="<i4") % 37).tobytes()
    for filters in (["deflate"], ["lz4", "deflate"], ["deflate", "lz4hc"]):
        buf = chain_apply(chunk, filters)
        assert buf[1] == len(filters)
        assert chain_reverse(buf) == chunk
    # deflate payload is RFC-1950 zlib: decode marker-1 body directly
    buf = chain_apply(chunk, ["deflate"])
    assert buf[3] == 1
    assert zlib.decompress(bytes(buf[8:])) == chunk


def test_chain_rejects_garbage():
    with pytest.raises(ValueError):
        chain_reverse(b"")
    with pytest.raises(ValueError):
        chain_reverse(b"\x07\x01\x01data")  # unknown version
    with pytest.raises(ValueError):
        chain_reverse(b"\x00\x01\x63data")  # unknown filter code
    with pytest.raises(ValueError):
        chain_apply(b"x", ["zstd"])  # not a reference filter
    with pytest.raises(ValueError):
        # marker-1 lz4 with truncated stream
        chain_reverse(b"\x00\x01\x01\x01\xff\x00\x00\x00\x10")
    # every corruption path raises ValueError, never struct.error /
    # IndexError (the module's error contract for store corruption)
    with pytest.raises(ValueError):
        # marker-1 payload truncated inside the 4-byte length prefix
        chain_reverse(b"\x00\x01\x01\x01\x10\x00")
    with pytest.raises(ValueError):
        # negative declared output length
        chain_reverse(b"\x00\x01\x01\x01\xff\xff\xff\xff\x00")
    with pytest.raises(ValueError):
        # literal length extension runs off the end (token F0 then EOF)
        lz4_block_decompress(b"\xf0", 32)
    with pytest.raises(ValueError):
        # match length extension runs off the end
        lz4_block_decompress(b"\x1f\x61\x01\x00", 64)


def test_lz4_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=2000), st.integers(0, 3))
    def check(data, rep):
        payload = data * (rep + 1)
        assert (
            lz4_block_decompress(lz4_block_compress(payload), len(payload))
            == payload
        )

    check()
