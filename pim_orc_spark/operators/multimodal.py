"""Multimodal column operators (north star: image/audio/video as opaque
binary columns + typed metadata, processed by Arrow-batched Python).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_image`` raises NotImplementedError; tests
exercise a deterministic fake). Everything around it — the binary
column schema, Arrow batch shape, ``mapInPandas`` plumbing, partition
behavior — is real and oracle-checked:

- ``multimodal_features`` materializes a binary payload column (the
  UTF-8 bytes of the document text standing in for an image blob) plus
  a metadata struct, then runs an Arrow-batched ``mapInPandas`` feature
  extractor (byte length + rolling checksum). This is the exact
  pipeline shape for real decode/resize/embed stages at 100 TB:
  map-only, no shuffle, Python touched once per batch (10k rows/Arrow
  batch), output schema declared up front.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from pim_orc_spark.catalog import load_table

CHECKSUM_MOD = 997

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


def decode_image(payload: bytes) -> Any:
    """Decode an image payload into (height, width, channels, pixels).

    STUB: the runtime image libraries are not available in this
    container. The Spark-side plumbing (binary column → Arrow batch →
    per-batch Python) is real; swap this body for PIL/libvips when
    deploying.
    """
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; use fake_decode for deterministic tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for decode: (byte length, rolling
    checksum). Same arithmetic as the oracle SQL. Scalar REFERENCE form
    — the mapInPandas kernels use the vectorized ``_checksums`` fold,
    which must stay bit-identical to this."""
    acc = 0
    for b in payload:
        acc = (acc * 31 + b) % CHECKSUM_MOD
    return len(payload), acc


def _pow31(n: int) -> np.ndarray:
    """31^k mod CHECKSUM_MOD for k in [0, n): one O(max payload length)
    scalar pass per Arrow batch, amortized over every byte in it."""
    out = np.empty(max(n, 1), dtype=np.int64)
    p = 1
    for k in range(len(out)):
        out[k] = p
        p = (p * 31) % CHECKSUM_MOD
    return out


def _checksum_np(codes: np.ndarray, pows: np.ndarray) -> int:
    """Vectorized rolling checksum: fold(acc*31+b) mod m over bytes ==
    Σ b_i · 31^(n-1-i) mod m — one numpy dot per payload, no per-byte
    Python. Every term ≤ 255·(m-1) so the int64 sum is exact up to
    ~3.6e13 bytes per payload."""
    n = len(codes)
    if n == 0:
        return 0
    return int((codes * pows[n - 1 :: -1]).sum() % CHECKSUM_MOD)


def _extract_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one Arrow batch in, one feature frame out.
    Per-row loop over the batch's payloads, but the per-BYTE work — the
    only part that scales with data volume — is a numpy polynomial fold
    (``_checksum_np``); a real deployment swaps that fold for the C
    decoder and keeps the same shape."""
    for pdf in batches:
        payloads = [bytes(p) for p in pdf["payload"]]
        pows = _pow31(max((len(p) for p in payloads), default=0))
        lengths = [len(p) for p in payloads]
        checks = [
            _checksum_np(np.frombuffer(p, dtype=np.uint8).astype(np.int64), pows)
            for p in payloads
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": pd.Series(lengths, dtype="int64"),
                "checksum": pd.Series(checks, dtype="int64"),
            }
        )


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary column + typed metadata struct — the
    canonical multimodal row layout (payload BINARY, meta STRUCT)."""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("declared_len"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: payload → mapInPandas feature extraction.
    Map-only plan: FileScan → Project(encode) → ArrowEvalPython; scales
    linearly, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(d)
    return payloads.mapInPandas(_extract_features, FEATURE_SCHEMA)


# Sized so fixture documents (≤ ~600 bytes) produce several frames each;
# a video deployment would use real frame boundaries from the container
# format instead of fixed byte windows.
FRAME_BYTES = 64
FRAME_STRIDE = 2  # keep every 2nd frame

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


def _sample_frames(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: split each payload into fixed-size frames,
    keep every FRAME_STRIDE-th, emit per-frame features. The streaming
    shape of video frame-sampling: one row in, ~len/(bytes×stride) rows
    out, all inside one Arrow batch."""
    for pdf in batches:
        pows = _pow31(FRAME_BYTES)
        doc_ids, idxs, lens, checks = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            codes = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
            n_frames = (len(data) + FRAME_BYTES - 1) // FRAME_BYTES
            for fi in range(0, n_frames, FRAME_STRIDE):
                chunk = codes[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                doc_ids.append(int(doc_id))
                idxs.append(fi)
                lens.append(len(chunk))
                checks.append(_checksum_np(chunk, pows))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "n_bytes": pd.Series(lens, dtype="int64"),
                "checksum": pd.Series(checks, dtype="int64"),
            }
        )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline over the opaque payload column: fan each
    binary blob out into strided fixed-size frames with per-frame
    features. Map-only (the fan-out happens inside the Arrow batch);
    at 100 TB the same kernel wraps a real video decoder and the
    partitioning/schema/batch shape is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(d)
    return payloads.mapInPandas(_sample_frames, FRAME_SCHEMA)


RESIZE_FACTOR = 4  # keep every 4th byte — the decimation stand-in

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
        StructField("checksum", LongType()),
    ]
)


def _resize_payloads(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for the resize stage: decode → transform →
    re-encode, stood in by byte decimation (every RESIZE_FACTOR-th
    byte). A real deployment swaps the body for decode_image →
    interpolate → encode; the batch shape, schema, and map-only plan
    are exactly this."""
    for pdf in batches:
        payloads = [bytes(p) for p in pdf["payload"]]
        pows = _pow31(
            max(
                (
                    (len(p) + RESIZE_FACTOR - 1) // RESIZE_FACTOR
                    for p in payloads
                ),
                default=0,
            )
        )
        ids, orig, resized, checks = [], [], [], []
        for doc_id, data in zip(pdf["doc_id"], payloads):
            small = np.frombuffer(data, dtype=np.uint8)[::RESIZE_FACTOR].astype(
                np.int64
            )
            ids.append(int(doc_id))
            orig.append(len(data))
            resized.append(len(small))
            checks.append(_checksum_np(small, pows))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "orig_bytes": pd.Series(orig, dtype="int64"),
                "resized_bytes": pd.Series(resized, dtype="int64"),
                "checksum": pd.Series(checks, dtype="int64"),
            }
        )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline over the opaque payload column — the third stage
    of the brief's decode/feature/resize/frame-sample set. Map-only like
    its siblings: FileScan → Project(encode) → ArrowEvalPython, linear
    at any corpus size, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(d)
    return payloads.mapInPandas(_resize_payloads, RESIZE_SCHEMA)


def multimodal_integrity_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Payload/metadata consistency audit — the validation pass a
    multimodal ingest runs before training: per origin, how many
    payloads disagree with their declared metadata length, and the
    worst absolute drift. On this fixture the correct answer is zero
    mismatches (ASCII text ⇒ byte length == declared n_chars); the
    AUDIT is the capability — a corrupted or truncated blob column
    surfaces here before a decoder segfaults an executor.

    Scale shape: pure Catalyst (length(payload) vs meta.declared_len
    — NO Python), map-side partial aggregate, |origins| output rows."""
    d = load_table(spark, sf_dir, "documents")
    p = with_binary_payload(d)
    drift = F.abs(
        F.length(F.col("payload")) - F.col("meta.declared_len")
    )
    return (
        p.select(F.col("meta.origin").alias("origin"), drift.alias("drift"))
        .groupBy("origin")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum(F.when(F.col("drift") != 0, 1).otherwise(0))
            .cast("long")
            .alias("n_mismatched"),
            F.max("drift").cast("long").alias("max_drift"),
        )
    )


QUERIES = {
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_resize": multimodal_resize,
    "multimodal_integrity_audit": multimodal_integrity_audit,
}

# Fixture text is pure ASCII, so UTF-8 bytes == character codes and the
# checksum is expressible in SQL over ascii() codes; n_bytes = strlen.
ORACLES = {
    "multimodal_integrity_audit": """
        SELECT source AS origin,
               COUNT(*) AS n_payloads,
               CAST(SUM(CASE WHEN abs(strlen(text) - n_chars) <> 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_mismatched,
               CAST(MAX(abs(strlen(text) - n_chars)) AS BIGINT)
                 AS max_drift
        FROM documents GROUP BY source
    """,
    "multimodal_features": f"""
        SELECT doc_id,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               CAST(CASE WHEN strlen(text) = 0 THEN 0 ELSE
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, strlen(text) + 1),
                                    i -> CAST(ascii(text[i:i]) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % {CHECKSUM_MOD})
               END AS BIGINT) AS checksum
        FROM documents
    """,
    # Frames = strided fixed-size byte windows; ASCII text ⇒ substr on
    # characters == slicing bytes, so the frame checksum is the same
    # rolling hash over the chunk's character codes.
    "multimodal_frame_sample": f"""
        WITH frames AS (
          SELECT doc_id, text,
                 unnest(range(0,
                   CAST(ceil(strlen(text) / {FRAME_BYTES}.0) AS BIGINT),
                   {FRAME_STRIDE})) AS frame_idx
          FROM documents
        ), chunks AS (
          SELECT doc_id, frame_idx,
                 substr(text, frame_idx * {FRAME_BYTES} + 1,
                        {FRAME_BYTES}) AS chunk
          FROM frames
        )
        SELECT doc_id, frame_idx,
               CAST(strlen(chunk) AS BIGINT) AS n_bytes,
               CAST(CASE WHEN strlen(chunk) = 0 THEN 0 ELSE
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, strlen(chunk) + 1),
                                    i -> CAST(ascii(chunk[i:i]) AS BIGINT))),
                   (a, b) -> (a * 31 + b) % {CHECKSUM_MOD})
               END AS BIGINT) AS checksum
        FROM chunks
    """,
    # Decimated payload = characters at positions 1, 1+F, 1+2F, ...
    # (ASCII ⇒ byte positions); checksum is the same rolling hash over
    # the kept codes.
    "multimodal_resize": f"""
        WITH kept AS (
          SELECT doc_id,
                 strlen(text) AS orig_bytes,
                 list_transform(
                   range(1, strlen(text) + 1, {RESIZE_FACTOR}),
                   i -> CAST(ascii(text[i:i]) AS BIGINT)) AS codes
          FROM documents
        )
        SELECT doc_id,
               CAST(orig_bytes AS BIGINT) AS orig_bytes,
               CAST(len(codes) AS BIGINT) AS resized_bytes,
               CAST(CASE WHEN len(codes) = 0 THEN 0 ELSE
                 list_reduce(
                   list_prepend(CAST(0 AS BIGINT), codes),
                   (a, b) -> (a * 31 + b) % {CHECKSUM_MOD})
               END AS BIGINT) AS checksum
        FROM kept
    """,
}
