"""Byte-exact reference chunk filter chain (lz4 / lz4hc / deflate).

Implements the reference's on-disk chunk envelope so an existing
mandoline store's chunk BYTES can be decoded (and produced) by this
engine — the migration path SURVEY §7.3 previously deferred:

- chain envelope (chain.clj:1-54): ``[version=0][filter_count][codes…]
  [payload]``; codes 1=lz4, 2=lz4hc, 3=deflate; reverse applies the
  filters back-to-front.
- lz4 filter (lz4.clj:1-89): ``[marker]`` 0 → raw payload follows;
  1 → ``[uncompressed_len int32 LE][LZ4 *block* data]`` (jpountz block
  format, no frame).  Writers fall back to marker 0 when the ratio is
  < 1.2.
- deflate filter (deflate.clj:1-79): same marker scheme; payload is
  zlib-wrapped DEFLATE (java.util.zip Deflater default = RFC 1950),
  which is exactly Python's :mod:`zlib`.

The engine's own storage stays Parquet+zstd (SURVEY §2A.8); this module
exists for interop, so the LZ4 block codec is pure Python (correct and
dependency-free, not hot-path fast).  Both directions are
cross-validated in tests against ``net.jpountz.lz4`` — the very library
the reference links — via the Spark JVM.

lz4 vs lz4hc: both emit the standard LZ4 block stream (HC only searches
harder), so code 2 decodes identically to code 1; this encoder's greedy
output is a valid stream for either code.
"""

from __future__ import annotations

import struct
import zlib

_MIN_RATIO = 1.2  # reference writers store raw below this (lz4.clj:27)

FILTER_LZ4 = 1
FILTER_LZ4HC = 2
FILTER_DEFLATE = 3

_MIN_MATCH = 4


def lz4_block_decompress(data: bytes, out_len: int, pos: int = 0) -> bytes:
    """Decode an LZ4 *block* (the jpountz/raw format, no frame header).

    Mirrors LZ4FastDecompressor.decompress(src, off, dst, 0, out_len):
    decoding stops once ``out_len`` bytes are produced.
    """
    src = memoryview(data)
    dst = bytearray(out_len)
    d = 0
    n = len(src)
    while d < out_len:
        if pos >= n:
            raise ValueError("truncated LZ4 block")
        token = src[pos]
        pos += 1
        # literals
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 literal length")
                b = src[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if lit:
            if pos + lit > n or d + lit > out_len:
                raise ValueError("truncated LZ4 literals")
            dst[d : d + lit] = src[pos : pos + lit]
            d += lit
            pos += lit
        if d >= out_len:
            break  # last sequence is literals-only
        # match
        if pos + 2 > n:
            raise ValueError("truncated LZ4 offset")
        offset = src[pos] | (src[pos + 1] << 8)
        pos += 2
        if offset == 0 or offset > d:
            raise ValueError(f"corrupt LZ4 offset {offset} at {d}")
        mlen = (token & 0xF) + _MIN_MATCH
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated LZ4 match length")
                b = src[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if d + mlen > out_len:
            raise ValueError("LZ4 match overruns output")
        # overlapping copy semantics: byte-at-a-time when ranges overlap
        start = d - offset
        if offset >= mlen:
            dst[d : d + mlen] = dst[start : start + mlen]
            d += mlen
        else:
            for i in range(mlen):
                dst[d] = dst[start + i]
                d += 1
    return bytes(dst)


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder (spec-compliant stream:
    12-byte end-of-block match guard, closing literal run).  Any
    standard LZ4 block decoder — including the reference's jpountz
    fast decompressor — decodes it back to ``data``."""
    src = data
    n = len(src)
    out = bytearray()

    def emit(lit_start: int, lit_end: int, mlen: int, offset: int) -> None:
        lit = lit_end - lit_start
        tok_lit = 15 if lit >= 15 else lit
        tok_m = 0 if mlen == 0 else mlen - _MIN_MATCH
        tok_match = 15 if tok_m >= 15 else tok_m
        out.append((tok_lit << 4) | (tok_match if mlen else 0))
        rem = lit - 15
        while rem >= 0:
            out.append(min(rem, 255))
            if rem < 255:
                break
            rem -= 255
        out.extend(src[lit_start:lit_end])
        if mlen:
            out.extend(struct.pack("<H", offset))
            rem = tok_m - 15
            while rem >= 0:
                out.append(min(rem, 255))
                if rem < 255:
                    break
                rem -= 255

    if n < 13:  # too short for any match per the spec's end rules
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[bytes, int] = {}
    anchor = 0
    i = 0
    match_limit = n - 12  # last match must start 12+ bytes from end
    while i <= match_limit:
        key = src[i : i + _MIN_MATCH]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF or src[cand : cand + 4] != key:
            i += 1
            continue
        # extend the match forward (may not cover the last 5 bytes)
        end_cap = n - 5
        mlen = _MIN_MATCH
        while i + mlen < end_cap and src[cand + mlen] == src[i + mlen]:
            mlen += 1
        emit(anchor, i, mlen, i - cand)
        i += mlen
        anchor = i
    emit(anchor, n, 0, 0)
    return bytes(out)


def _marker_apply(payload: bytes, compress) -> bytes:
    comp = compress(payload)
    if len(payload) / max(len(comp), 1) < _MIN_RATIO:
        return b"\x00" + payload
    return b"\x01" + struct.pack("<i", len(payload)) + comp


def _marker_reverse(buf: bytes, decompress) -> bytes:
    if not buf:
        raise ValueError("empty filter payload")
    if buf[0] == 0:
        return bytes(buf[1:])
    if len(buf) < 5:
        raise ValueError("truncated filter length prefix")
    (out_len,) = struct.unpack_from("<i", buf, 1)
    if out_len < 0:
        raise ValueError(f"corrupt filter length prefix {out_len}")
    return decompress(bytes(buf[5:]), out_len)


def _lz4_apply(chunk: bytes) -> bytes:
    return _marker_apply(chunk, lz4_block_compress)


def _lz4_reverse(buf: bytes) -> bytes:
    return _marker_reverse(buf, lz4_block_decompress)


def _deflate_apply(chunk: bytes, level: int = 6) -> bytes:
    return _marker_apply(chunk, lambda b: zlib.compress(b, level))


def _deflate_reverse(buf: bytes) -> bytes:
    return _marker_reverse(
        buf, lambda b, out_len: zlib.decompress(b, bufsize=out_len)
    )


_APPLY = {
    FILTER_LZ4: _lz4_apply,
    FILTER_LZ4HC: _lz4_apply,  # HC stream == LZ4 stream, harder search
    FILTER_DEFLATE: _deflate_apply,
}
_REVERSE = {
    FILTER_LZ4: _lz4_reverse,
    FILTER_LZ4HC: _lz4_reverse,
    FILTER_DEFLATE: _deflate_reverse,
}
_NAME_CODE = {"lz4": FILTER_LZ4, "lz4hc": FILTER_LZ4HC,
              "deflate": FILTER_DEFLATE}


def chain_apply(chunk: bytes, filters: list[str] = ["lz4"]) -> bytes:
    """Encode raw chunk bytes into the reference chain envelope
    (chain.clj:55-82; the stock deployment uses ``["lz4"]``,
    compressed_store.clj:7)."""
    codes = []
    for name in filters:
        if name not in _NAME_CODE:
            raise ValueError(f"{name} isn't a known filter")
        codes.append(_NAME_CODE[name])
    payload = chunk
    for c in codes:
        payload = _APPLY[c](payload)
    return bytes([0, len(codes), *codes]) + payload


def chain_reverse(buf: bytes) -> bytes:
    """Decode a chain-enveloped chunk back to raw bytes
    (chain.clj:84-95)."""
    if len(buf) < 2:
        raise ValueError("truncated chain header")
    if buf[0] != 0:
        raise ValueError(f"unknown chain header version {buf[0]}")
    count = buf[1]
    if len(buf) < 2 + count:
        raise ValueError("truncated chain filter list")
    codes = list(buf[2 : 2 + count])
    payload = bytes(buf[2 + count :])
    for c in reversed(codes):
        if c not in _REVERSE:
            raise ValueError(f"unknown filter code {c}")
        payload = _REVERSE[c](payload)
    return payload
