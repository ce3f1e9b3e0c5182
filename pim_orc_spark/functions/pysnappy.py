"""Pure-Python Snappy BLOCK codec — the reference's hot algorithm as a
tested kernel.

The reference engine exists to accelerate exactly this: the Snappy
tag-stream decode loop (dpu_decompress.c:224-300 — literal / copy-1 /
copy-2 / copy-4 elements, element types dpu_decompress.h:29-35, offset
decode dpu_decompress.c:58-100, long-literal sizes :114-125) behind a
varint32 uncompressed-length preamble (pim_snappy.c:112-126). SURVEY
§2.9 maps D1/D2 to Spark codec CONFIGURATION for the storage path;
this module implements the same format as runnable code so the parity
is demonstrated, not only mapped — and it is CROSS-VALIDATED against
an independent implementation, the JVM's own snappy-java on Spark's
classpath (tests/test_multimodal.py): this decoder must decode
snappy-java's output and snappy-java must decode this encoder's.

Format notes (the public Snappy block format):
- preamble: uncompressed length as varint32 (7 bits/byte, LSB first);
- elements: tag byte, low 2 bits = type.
  00 literal: len-1 in tag>>2; 60..63 mean 1..4 little-endian length
     bytes follow;
  01 copy-1: len = ((tag>>2)&7)+4 (4..11), offset = 3 tag bits << 8 |
     next byte (< 2048);
  10 copy-2: len = (tag>>2)+1 (1..64), 2-byte LE offset;
  11 copy-4: len = (tag>>2)+1, 4-byte LE offset.
- copies may OVERLAP their own output (offset < len) — the RLE idiom
  (one literal byte + copy offset 1) the encoder below uses for runs;
  the decoder must copy byte-at-a-time in that regime, exactly the
  window-aware copy the reference's WRAM writer implements
  (dpu_decompress.c:171-219).
"""

from __future__ import annotations


def varint_encode(n: int) -> bytes:
    if n < 0:
        raise ValueError("varint32 encodes non-negative lengths")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def varint_decode(buf: bytes, pos: int = 0) -> tuple[int, int]:
    """Returns (value, next_pos); the preamble parse of
    pim_snappy.c:112-126 (reject >5 bytes / truncation)."""
    result, shift = 0, 0
    for _ in range(5):
        if pos >= len(buf):
            raise ValueError("truncated varint32 preamble")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
    raise ValueError("varint32 longer than 5 bytes")


def snappy_decompress(buf: bytes) -> bytes:
    """The tag-stream loop (dpu_decompress.c:224-300), strict: a
    truncated element, an offset pointing before the stream start, or
    a final length disagreeing with the preamble raises instead of
    returning garbage."""
    n, pos = varint_decode(buf, 0)
    out = bytearray()
    L = len(buf)
    while pos < L:
        tag = buf[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > L:
                    raise ValueError("truncated literal length bytes")
                ln = int.from_bytes(buf[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > L:
                raise ValueError("truncated literal body")
            out += buf[pos : pos + ln]
            pos += ln
            continue
        if t == 1:  # copy-1
            if pos >= L:
                raise ValueError("truncated copy-1 offset")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif t == 2:  # copy-2
            if pos + 2 > L:
                raise ValueError("truncated copy-2 offset")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 2], "little")
            pos += 2
        else:  # copy-4
            if pos + 4 > L:
                raise ValueError("truncated copy-4 offset")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError(
                f"copy offset {off} outside the produced stream "
                f"({len(out)} bytes)"
            )
        start = len(out) - off
        if off >= ln:  # disjoint: slice copy
            out += out[start : start + ln]
        else:  # overlapping (RLE regime): byte-at-a-time window copy
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != n:
        raise ValueError(
            f"decompressed {len(out)} bytes, preamble declared {n}"
        )
    return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    i = 0
    while i < len(chunk):
        piece = chunk[i : i + (1 << 16)]  # bounded pieces keep it simple
        i += len(piece)
        ln = len(piece) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nb = (ln.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out += ln.to_bytes(nb, "little")
        out += piece


def snappy_compress(data: bytes) -> bytes:
    """A deterministic VALID Snappy encoder: byte-runs of length ≥ 5
    become one history byte + overlapping offset-1 copy-2 elements
    (the classic Snappy RLE form, ≤64 bytes per element with the
    standard ≥4-byte tail split); everything else is emitted as
    literals. Not a ratio-chaser — a format exerciser whose output any
    conformant decoder (snappy-java cross-checked in tests) must
    accept, covering both element families this module's decoder
    implements."""
    out = bytearray(varint_encode(len(data)))
    n = len(data)
    i = 0
    lit_start = 0
    while i < n:
        j = i
        while j < n and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 5:
            # flush pending literal INCLUDING the run's first byte (the
            # copy needs one byte of history)
            _emit_literal(out, data[lit_start : i + 1])
            rem = run - 1
            while rem:
                c = min(64, rem)
                if rem - c in (1, 2, 3):  # keep the tail element ≥ 4
                    c = rem - 4
                out.append(((c - 1) << 2) | 2)  # copy-2 tag
                out += (1).to_bytes(2, "little")  # offset 1 (overlap)
                rem -= c
            lit_start = j
        i = j
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)
