"""Pure-Python ORC footer reader — planning metadata without py4j.

The reference's planning loop reads exactly this information
(reader.cc:104-107: ``getNumberOfStripes()`` /
``getStripe(s)->getNumberOfRows()``) before any row data moves; this
module reproduces it from the PUBLIC ORC file format specification
(https://orc.apache.org/specification/ORCv1/), so ``orc_metadata``
needs no JVM round-trip and works under Spark Connect:

    [data] [metadata] [footer] [postscript] [1-byte postscript length]

* The postscript is an UNCOMPRESSED protobuf carrying footerLength,
  compression kind, compressionBlockSize and the "ORC" magic.
* The footer is a protobuf wrapped in the file's generic compressed
  stream framing: chunks of ``3-byte little-endian header h`` where
  ``h & 1`` marks a stored-original chunk and ``h >> 1`` is the chunk
  byte length, followed by the (compressed or original) bytes.
* Footer fields used here: stripes (repeated StripeInformation, whose
  field 5 is numberOfRows), numberOfRows, rowIndexStride.

Snappy-compressed footers (the reference's codec, and this engine's
write-path parity default) are inflated by the repo's own pure-Python
block codec (``functions/pysnappy.py``) — the codec demonstrated for
D1/D2 parity here decompresses REAL ORC streams, not only synthetic
payloads. ZLIB footers use raw-deflate via ``zlib``; other codecs
raise with the kind named. Only the minimal protobuf wire format is
implemented (varint / fixed / length-delimited), keyed by the field
numbers in the public ``orc_proto.proto``.

tests/test_sources.py cross-validates every fact against the JVM ORC
reader on the same files (the pycms/pysnappy discipline).
"""

from __future__ import annotations

import os
import struct
import zlib

COMPRESSION_KINDS = ("NONE", "ZLIB", "SNAPPY", "LZO", "LZ4", "ZSTD")

# a footer + postscript for these planning fields is well under this;
# re-read happens automatically when the postscript says otherwise
_TAIL_GUESS = 256 * 1024


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Iterate protobuf wire fields: yields (field_no, value) where
    value is an int for varint/fixed and bytes for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wire == 1:  # fixed64
            (val,) = struct.unpack_from("<Q", buf, i)
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            if i + ln > n:  # torn/corrupt length: fail loudly, never
                #             return a silently short stripe inventory
                raise ValueError(
                    f"protobuf field {field} declares {ln} bytes with "
                    f"only {n - i} remaining"
                )
            val = buf[i : i + ln]
            i += ln
        elif wire == 5:  # fixed32
            (val,) = struct.unpack_from("<I", buf, i)
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        yield field, val


def _decode_stream(data: bytes, kind: str) -> bytes:
    """Unwrap ORC's generic compressed-stream framing (3-byte LE chunk
    headers; bit 0 = stored original) and inflate each chunk."""
    if kind == "NONE":
        return data
    out = []
    i = 0
    while i < len(data):
        h = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16)
        i += 3
        original, ln = h & 1, h >> 1
        chunk = data[i : i + ln]
        i += ln
        if original:
            out.append(chunk)
        elif kind == "SNAPPY":
            from pim_orc_spark.functions.pysnappy import snappy_decompress

            out.append(snappy_decompress(chunk))
        elif kind == "ZLIB":
            out.append(zlib.decompress(chunk, -15))  # raw deflate
        else:
            raise NotImplementedError(
                f"ORC footer compressed with {kind}; only "
                "NONE/SNAPPY/ZLIB are implemented here"
            )
    return b"".join(out)


def read_orc_footer_facts(path: str) -> dict:
    """Planning facts of one ORC file, footer-only (O(footer bytes),
    no row data touched): stripe count, rows per stripe, total rows,
    compression kind, compression block size, row-index stride."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        fh.seek(max(0, size - _TAIL_GUESS))
        tail = fh.read()
        ps_len = tail[-1]
        ps = dict()
        for field, val in _fields(tail[-1 - ps_len : -1]):
            ps.setdefault(field, val)
        magic = ps.get(8000, b"")
        if magic != b"ORC":
            raise ValueError(f"{path}: postscript magic {magic!r} != b'ORC'")
        footer_len = ps[1]
        kind = COMPRESSION_KINDS[ps.get(2, 0)]
        if footer_len + ps_len + 1 > len(tail):  # rare: huge footer
            fh.seek(size - 1 - ps_len - footer_len)
            footer_raw = fh.read(footer_len)
        else:
            footer_raw = tail[-1 - ps_len - footer_len : -1 - ps_len]
    footer = _decode_stream(footer_raw, kind)
    stripe_rows: list[int] = []
    num_rows = row_index_stride = 0
    for field, val in _fields(footer):
        if field == 3:  # StripeInformation; its field 5 = numberOfRows
            stripe_rows.append(
                next((v for f, v in _fields(val) if f == 5), 0)
            )
        elif field == 6:
            num_rows = val
        elif field == 8:
            row_index_stride = val
    return {
        "file": os.path.basename(path),
        "num_stripes": len(stripe_rows),
        "stripe_rows": stripe_rows,
        "num_rows": num_rows,
        "compression": kind,
        "compression_block_size": ps.get(3, 0),
        "row_index_stride": row_index_stride,
    }
