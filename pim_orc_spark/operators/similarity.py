"""Similarity search over the `embeddings` table (north star: ANN).

- ``ann_cosine_topk`` — brute-force cosine top-k: broadcast the query
  set, per-row codegen'd cosine, per-query top-k via window. The exact
  baseline; at 100 TB it is a single pass over the corpus with no
  shuffle of the corpus itself (queries broadcast; the window shuffles
  only |queries| × |corpus-partition winners| candidate rows after a
  partial per-partition filter... in practice rank-k selection cost is
  dominated by the scan, which is the floor for exact ANN).
- ``ann_lsh_bucketed`` — the scale path: random-hyperplane LSH buckets
  (sign-bit signature from deterministic hyperplanes) restrict each
  query to its bucket. Bucket assignment is map-side; the join shuffles
  on bucket id. Recall < 1 by design; the operator's contract (and its
  oracle) IS the bucketed result, deterministically derived from the
  LCG hyperplanes, so it hash-matches across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pim_orc_spark.catalog import load_table
from pim_orc_spark.functions.vector import (
    as_double_vec,
    cosine_sql,
    dot_unrolled,
    dot_unrolled_sql,
    unit_vec,
)
from pim_orc_spark.plans import spread

# Minimum rows a vector-scan partition must hold before fanning out
# further (r17, guide §4 / the spread docstring's rows_per_part
# contract): every partition of the mapInPandas kernels costs one
# Python-worker round trip (~10-20 ms task launch + Arrow
# (de)serialization) while the numpy batch kernels score >1M rows/s/
# core — below ~512 rows/partition the round trip outweighs the
# compute. Keyed on input size (parquet footer row counts), so the cap
# only binds under 512 × parallelism rows (16k at local[32]); at real
# corpus sizes the fan-out is unchanged. Measured at sf0.1 (2000-row
# embeddings, identical output): 32 parts min 1.65 s vs 4 parts
# 0.60 s for the shared cosine scan kernel.
VEC_ROWS_PER_PART = 512


def _unit_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings as L2-normalized double vectors, spread past the
    single file split BEFORE normalization so the per-row unit_vec work
    parallelizes (computed after a later repartition it would run on
    one core)."""
    e = spread(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        rows_per_part=VEC_ROWS_PER_PART,
    )
    return e.select("vec_id", as_double_vec("embedding", DIM).alias("v0")).select(
        "vec_id", unit_vec(F.col("v0"), DIM).alias("v")
    )

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors
N_PLANES = 4  # 16 buckets — sized for the fixture corpus; at 100 TB use
#               ~16-20 planes (64k-1M buckets) + multi-probe

DIM = 64
_LCG_MOD = 2_147_483_647


def _hyperplanes(n_planes: int = N_PLANES, dim: int = DIM, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes via LCG → values in
    [-1, 1). Same constants regenerate identically here and in the
    oracle SQL (no RNG library dependence)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 48271) % _LCG_MOD
            row.append((state / _LCG_MOD) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _bucket_col(vec: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-bit signature: bit i set iff dot(vec, plane_i) > 0."""
    sig = F.lit(0)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for each query vector (vec_id<5),
    self excluded; deterministic tie-break on neighbor id. Vectors are
    unit-normalized once per row; per pair = one unrolled 64-term dot."""
    v = _unit_vectors(spark, sf_dir)
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    sim = dot_unrolled(F.col("qv"), F.col("v"), DIM)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        v.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round(F.col("sim"), 4).alias("cos_sim"),
        )
    )


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-restricted top-k: each query only scans its own hyperplane
    bucket. Join on bucket id, then per-query window top-k. Bucket
    assignment uses the RAW vector (sign of dot with each hyperplane is
    scale-invariant, so unit-normalizing first would not change it)."""
    planes = _hyperplanes()
    e = spread(spark, load_table(spark, sf_dir, "embeddings"))
    v = (
        e.select("vec_id", as_double_vec("embedding", DIM).alias("v0"))
        .withColumn("bucket", _bucket_col(F.col("v0"), planes))
        .select("vec_id", unit_vec(F.col("v0"), DIM).alias("v"), "bucket")
    )
    q = v.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket"),
    )
    sim = dot_unrolled(F.col("qv"), F.col("v"), DIM)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        v.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round(F.col("sim"), 4).alias("cos_sim"),
        )
    )


def _vectorized_topk_scan(
    v: DataFrame, q_source: DataFrame | None = None
) -> DataFrame:
    """The shared 100 TB exact-ANN scan kernel, dimension-agnostic:
    Arrow-batched numpy matmul with per-partition PARTIAL top-k, then
    a final top-k over the tiny candidate set. ``v`` is any
    (vec_id, v: array<double>) relation; queries are its vec_id <
    N_QUERIES rows, collected and closed over (bounded: a query
    workload, not a table). The shuffle carries ≤ partitions ×
    |queries| × k candidate rows, independent of corpus size.
    Consumed by ``ann_cosine_topk_vectorized`` (full-dim vectors) and
    ``ann_rp_topk`` (random-projected vectors) — one kernel, one
    audit surface.

    Float64 accumulation order differs from the oracle's sequential
    fold by ≲1 ulp — far below the 4-dp rounding the contract
    exposes."""
    import numpy as np
    import pandas as pd

    # Collect the bounded query block from ``q_source`` (the
    # UNSPREAD relation) when given: filtering the spread frame runs
    # the full repartition shuffle just to pull N_QUERIES rows (the
    # vec_id predicate cannot push below a repartition) — measured
    # 0.56 s/warm-invocation at sf0.1 vs a pushed-down parquet filter
    # on the raw scan (r16, guide §5 — the collect is bounded either
    # way, only WHERE it reads from changes; same rows by definition).
    qrows = (
        (v if q_source is None else q_source)
        .filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_schema = "query_id long, neighbor_id long, sim double"

    def partial_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            V = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Vn @ Qn.T  # (batch, queries)
            frames = []
            for j in range(len(q_ids)):
                s = S[:, j]
                mask = ids != q_ids[j]
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                # partial top-k: k best by (sim desc, vec_id asc)
                order = np.lexsort((ids[cand_idx], -s[cand_idx]))
                take = cand_idx[order[:TOP_K]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(take.size, q_ids[j]),
                            "neighbor_id": ids[take],
                            "sim": s[take],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cands = v.mapInPandas(partial_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim"), 4).alias("cos_sim"),
        )
    )


def ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k via the shared partial-top-k scan kernel
    (``_vectorized_topk_scan``): same result set as the window-ranked
    exact baseline (``ann_cosine_topk``) and the same oracle, but the
    shuffle is corpus-size-independent where the baseline shuffles
    O(|corpus| × |queries|) similarity rows."""
    e = load_table(spark, sf_dir, "embeddings")
    v0 = e.select("vec_id", as_double_vec("embedding", DIM).alias("v"))
    return _vectorized_topk_scan(
        spread(spark, v0, rows_per_part=VEC_ROWS_PER_PART), q_source=v0
    )


RP_DIM = 16  # Johnson-Lindenstrauss target dimension (64 → 16)


def ann_rp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection ANN (Johnson–Lindenstrauss): project every
    embedding 64 → 16 dims with deterministic LCG hyperplanes, then
    run the exact top-k IN THE PROJECTED SPACE — 4× less vector
    bandwidth and per-pair compute, recall < 1 by design (the
    projection approximately preserves angles; the oracle IS the
    projected-space result, deterministically derived from the same
    planes). The compression path embedding pipelines use when int8
    quantization (``ann_sq_topk``) isn't small enough.

    Determinism: the 16 projection dots run in CATALYST as sequential
    folds (IEEE-identical to the oracle's list_dot_product on the
    same plane literals); normalization + similarity happen once in
    the shared numpy kernel against the oracle's raw-vector cosine —
    the same ≲1-ulp-vs-4dp-rounding trade the vectorized exact path
    has carried green since round 2. Scale shape: projection is
    map-side (16 × 64 multiply-adds per row); the scan is the shared
    partial-top-k kernel — shuffle O(parts × q × k)."""
    planes = _hyperplanes(n_planes=RP_DIM, dim=DIM, seed=11)
    e = load_table(spark, sf_dir, "embeddings")
    v0 = e.select("vec_id", as_double_vec("embedding", DIM).alias("v0"))
    proj = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("v0"),
                    F.array(*[F.lit(x) for x in p]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for p in planes
        ]
    )
    v = v0.select("vec_id", proj.alias("v"))
    return _vectorized_topk_scan(
        spread(spark, v, rows_per_part=VEC_ROWS_PER_PART), q_source=v
    )


CENTROID_STRIDE = 61  # coarse quantizer: centroids = vec_id % stride == 0
IVF_MAX_CENTROIDS = 4096  # hard cap on the quantizer size (driver bound)
N_PROBE = 2  # each query probes its N_PROBE nearest centroids


def _ivf_stride(n_rows: int) -> int:
    """Sampling stride for the deterministic coarse quantizer: every
    ``stride``-th vec_id is a centroid. ``max(61, ceil(n/4096))`` keeps
    the centroid count ≤ IVF_MAX_CENTROIDS at ANY corpus size (round-2
    verdict: the fixed stride of 61 made the quantizer — and the driver
    collect, the task closure, and the per-batch assignment matmul —
    grow as n/61, ~16M centroids at 1B vectors). 4096 centroids × 64
    dims × 8 B ≈ 2 MB: constant driver memory and a bounded
    (batch × 4096) assignment matmul regardless of corpus."""
    import math

    return max(CENTROID_STRIDE, math.ceil(n_rows / IVF_MAX_CENTROIDS))


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN beside the hyperplane LSH: corpus vectors
    are assigned to their nearest centroid (the inverted lists); each
    query scans only its ``N_PROBE`` nearest centroids' lists.

    The coarse quantizer here is a deterministic corpus sample:
    vec_id % stride == 0, with ``stride = _ivf_stride(count)`` so the
    centroid count is CAPPED at IVF_MAX_CENTROIDS (≈2 MB of float64)
    no matter the corpus size — the driver collect, the task-serialized
    closure, and the per-batch assignment matmul are all O(cap), not
    O(n). In a production IVF system the quantizer is k-means-trained
    OFFLINE and shipped as an artifact (the train step is never part of
    the query); this operator consumes its centroid set exactly that
    way. Deterministic centroids also make the operator's contract (and
    its oracle, which computes the same stride from COUNT(*))
    reproducible across engines.

    Scale shape: one map-side pass over the corpus (Arrow-batched numpy:
    one (batch × centroids) matmul assigns, one slice per probed list
    scores), partial top-k per batch, final top-k over
    ≤ partitions × queries × k candidate rows — the same
    corpus-size-independent shuffle as ``ann_cosine_topk_vectorized``.
    Recall < 1 by design (unprobed lists are never scored); ties in
    assignment break to the smaller centroid id in both engines.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v0 = e.select("vec_id", as_double_vec("embedding", DIM).alias("v"))
    v = spread(spark, v0, rows_per_part=VEC_ROWS_PER_PART)
    c_ids, Cn, q_ids, Qn = _ivf_quantizer_and_queries(
        spark, sf_dir, v, q_source=v0
    )
    return _ivf_search(v, c_ids, Cn, q_ids, Qn)


def _ivf_quantizer_and_queries(spark, sf_dir, v, q_source=None):
    """The shipped-quantizer artifact plus the collected query block,
    shared by ``ann_ivf_topk`` and ``ann_ivf_add_batch`` — ONE
    definition of the stride/centroid derivation, because both write
    the same ``ivf_quantizer`` cache key and a drifting copy would
    make results invocation-order-dependent.

    QUANTIZER ARTIFACT REUSE: the contract is that the coarse
    quantizer is trained offline and SHIPPED — it only changes when
    the corpus does. The (stride, ids, normalized centroids) artifact
    is cached per (application, table directory) via the shared
    artifact store (immutable within a process) so repeat queries
    skip the count + centroid-collect jobs, the same resident-artifact
    trade the dedup signature index makes."""
    import numpy as np

    from pim_orc_spark.artifacts import cached_artifact

    def _build_ivf():
        stride = _ivf_stride(v.count())
        crows = (
            v.filter(F.col("vec_id") % stride == 0)
            .orderBy("vec_id")
            .collect()
        )
        c_ids = np.array([r["vec_id"] for r in crows], dtype=np.int64)
        C = np.stack([np.asarray(r["v"], dtype=np.float64) for r in crows])
        return stride, c_ids, C / np.linalg.norm(C, axis=1, keepdims=True)

    stride, c_ids, Cn = cached_artifact(
        "ivf_quantizer", spark, sf_dir, _build_ivf
    )
    qs = v if q_source is None else q_source
    qrows = qs.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    return c_ids, Cn, q_ids, Qn


def _ivf_search(v, c_ids, Cn, q_ids, Qn):
    """The IVF probe/scan stage over any (vec_id, v) corpus frame with
    a SHIPPED quantizer (c_ids, Cn) and collected queries — shared by
    ``ann_ivf_topk`` (full build) and ``ann_ivf_add_batch``
    (incremental maintenance: same artifact, grown corpus)."""
    import numpy as np
    import pandas as pd

    # Multi-probe routing table: centroid id -> query indices probing it.
    # argsort columns are c_ids-ascending, so lexsort's tie-break matches
    # the oracle's (csim DESC, cid ASC).
    qc = Qn @ Cn.T
    probe: dict[int, list[int]] = {}
    for j in range(len(q_ids)):
        for ci in np.lexsort((c_ids, -qc[j]))[:N_PROBE]:
            probe.setdefault(int(c_ids[ci]), []).append(j)

    out_schema = "query_id long, neighbor_id long, sim double"

    def ivf_partial_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            # assignment: argmax over centroid sims; np.argmax returns
            # the FIRST max and columns are cid-ascending → ties to the
            # smaller cid, matching the oracle's window order
            assigned = c_ids[np.argmax(Vn @ Cn.T, axis=1)]
            frames = []
            for cid, qjs in probe.items():
                lmask = assigned == cid
                if not lmask.any():
                    continue
                sub_ids = ids[lmask]
                sub = Vn[lmask]
                for j in qjs:
                    s = sub @ Qn[j]
                    cand = np.nonzero(sub_ids != q_ids[j])[0]
                    if cand.size == 0:
                        continue
                    order = np.lexsort((sub_ids[cand], -s[cand]))
                    take = cand[order[:TOP_K]]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(take.size, q_ids[j]),
                                "neighbor_id": sub_ids[take],
                                "sim": s[take],
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cands = v.mapInPandas(ivf_partial_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("sim"), 4).alias("cos_sim"),
        )
    )


INCR_ID_SHIFT = 1_000_000  # new-batch ids = query id + this shift


def ann_ivf_add_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF INDEX MAINTENANCE without a rebuild — the operation a
    production vector store performs on every ingest: NEW vectors are
    assigned to the EXISTING shipped quantizer's inverted lists (the
    quantizer artifact is immutable between retrains; only postings
    grow), and queries immediately see them. Rebuilding the quantizer
    per batch would be a full corpus pass per ingest — the non-scale
    path this operator exists to avoid.

    The delta here is a deterministic clone of each query vector under
    ``vec_id + INCR_ID_SHIFT``, which makes the maintenance contract
    SHARP and assertable: after the add, every query's rank-1 neighbor
    must be its own clone at cos_sim 1.0 (pytest), and the tail of the
    list must be the original index's neighbors shifted one rank down.
    Same ``_ivf_search`` stage, same cached ``ivf_quantizer`` artifact
    as ``ann_ivf_topk`` (one shared derivation,
    ``_ivf_quantizer_and_queries``) — only the corpus frame differs
    (a UNION, no artifact rebuild, no second quantizer collect).

    PRECONDITION (guarded): corpus vec_ids must stay below
    ``INCR_ID_SHIFT``, or clone ids would collide with real vectors
    and the contract silently corrupts — a corpus with ≥1M vectors
    needs the shift raised above ``max(vec_id)``."""
    e = spread(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        rows_per_part=VEC_ROWS_PER_PART,
    )
    v = e.select("vec_id", as_double_vec("embedding", DIM).alias("v"))
    max_id = v.agg(F.max("vec_id")).collect()[0][0]  # 1-row collect
    if max_id is not None and max_id >= INCR_ID_SHIFT:
        raise ValueError(
            f"ann_ivf_add_batch: corpus max vec_id {max_id} >= "
            f"INCR_ID_SHIFT {INCR_ID_SHIFT}; clone ids would collide "
            "with real vectors — raise the shift above max(vec_id)"
        )
    c_ids, Cn, q_ids, Qn = _ivf_quantizer_and_queries(spark, sf_dir, v)
    delta = v.filter(F.col("vec_id") < N_QUERIES).select(
        (F.col("vec_id") + F.lit(INCR_ID_SHIFT)).alias("vec_id"), "v"
    )
    return _ivf_search(v.unionByName(delta), c_ids, Cn, q_ids, Qn)


def ivf_scan_stats(spark: SparkSession, sf_dir: str) -> dict:
    """Counted probe evidence for the IVF index — the IVF analogue of
    ``lsh_band_candidates``: the structural invariant host noise
    cannot move (the admission-rate argument, test_scale_slope.py) is
    how much of the corpus the queries' probed inverted lists cover.

    Returns ``{n, n_centroids, probed_rows, scan_fraction}`` where
    ``probed_rows`` = Σ_query |rows in that query's probed lists| and
    ``scan_fraction`` = probed_rows / (n_queries · n) — the fraction
    of per-query corpus work the probe admits (exact scan ≡ 1.0; the
    tuning signal for N_PROBE alongside ``ann_recall``'s quality
    signal). The assignment pass is DISTRIBUTED: the same Arrow-batched
    argmax the search kernel runs, reduced inside each task to
    per-centroid counts and finished by a JVM groupBy over ≤
    IVF_MAX_CENTROIDS rows — no corpus rows reach the driver. The
    routing table is the search's own lexsort (same tie-break), so the
    counted lists are exactly the lists ``_ivf_search`` scans. In the
    capped-quantizer regime (n ≥ CENTROID_STRIDE · IVF_MAX_CENTROIDS)
    the expected fraction is ~N_PROBE / IVF_MAX_CENTROIDS independent
    of corpus size — the flat-across-the-decade invariant the slope
    harness bounds at two scales."""
    import numpy as np
    import pandas as pd

    e = spread(
        spark,
        load_table(spark, sf_dir, "embeddings"),
        rows_per_part=VEC_ROWS_PER_PART,
    )
    v = e.select("vec_id", as_double_vec("embedding", DIM).alias("v"))
    c_ids, Cn, q_ids, Qn = _ivf_quantizer_and_queries(spark, sf_dir, v)

    def assign_counts(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            assigned = c_ids[np.argmax(Vn @ Cn.T, axis=1)]
            cid, cnt = np.unique(assigned, return_counts=True)
            yield pd.DataFrame({"cid": cid, "list_size": cnt})

    # ≤ IVF_MAX_CENTROIDS rows after the combine — checkpoint so the
    # two roll-up actions below don't re-scan the corpus
    sizes = (
        v.mapInPandas(assign_counts, "cid long, list_size long")
        .groupBy("cid")
        .agg(F.sum("list_size").alias("list_size"))
        .localCheckpoint()
    )
    qc = Qn @ Cn.T
    routing = [
        (int(q_ids[j]), int(c_ids[ci]))
        for j in range(len(q_ids))
        for ci in np.lexsort((c_ids, -qc[j]))[:N_PROBE]
    ]
    probed = spark.createDataFrame(routing, "query_id long, cid long")
    n = sizes.agg(F.sum("list_size")).collect()[0][0] or 0
    # inner join: a probed-but-empty list contributes 0 scanned rows
    probed_rows = (
        probed.join(sizes, "cid").agg(F.sum("list_size")).collect()[0][0]
        or 0
    )
    frac = float(probed_rows) / (len(q_ids) * n) if n else 0.0
    return {
        "n": int(n),
        "n_centroids": int(len(c_ids)),
        "probed_rows": int(probed_rows),
        "scan_fraction": frac,
    }


def ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of each approximate ANN path against the exact baseline
    — the tuning signal a user of N_PLANES / N_PROBE flies blind
    without (round-2 verdict, missing #4). One row per (method,
    query): ``n_hits`` = approximate neighbors that appear in the exact
    top-k, ``recall_at_k`` = n_hits / k.

    Both sides are deterministic (fixed LCG hyperplanes, capped stride
    quantizer), so recall itself is deterministic and oracle-checkable —
    the oracle recomputes both result sets in SQL and counts the same
    intersection. Scale: the joins are on (query, neighbor) candidate
    sets — O(queries × k) rows — so the metric costs two candidate
    queries plus the exact baseline, never a new corpus pass of its own.
    """
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    qids = exact.select("query_id").distinct()
    parts = []
    for method, fn in (
        ("ann_lsh_bucketed", ann_lsh_bucketed),
        ("ann_ivf_topk", ann_ivf_topk),
        ("ann_sq_topk", ann_sq_topk),
        ("ann_rp_topk", ann_rp_topk),
        ("ann_pq_topk", ann_pq_topk),
    ):
        approx = fn(spark, sf_dir).select("query_id", "neighbor_id")
        counts = (
            approx.join(exact, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        parts.append(
            qids.join(counts, "query_id", "left").select(
                F.lit(method).alias("method"),
                "query_id",
                F.coalesce(F.col("n_hits"), F.lit(0))
                .cast("long")
                .alias("n_hits"),
                (
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.lit(float(TOP_K))
                ).alias("recall_at_k"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


SQ_SCALE = 127  # int8-style scalar quantization of unit components
SQ_CAND = 30  # candidate pool per query before exact re-rank


def ann_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized first pass + exact re-rank — the production
    two-stage ANN pattern the other variants don't cover: every unit
    component is quantized to an int8-range value (round(u·127)), the
    cheap INTEGER dot product selects SQ_CAND candidates per query, and
    only those candidates pay the exact double cosine.

    Determinism: quantization uses only IEEE correctly-rounded ops
    (sqrt, multiply, divide — bit-identical across engines), so the
    integer first-pass scores and therefore the candidate sets are
    EXACTLY reproducible in the oracle; ties break on vec_id at both
    stages.

    Scale shape: the quantized corpus is ~8× smaller than float64
    vectors (scan bandwidth and cache footprint); the first pass is
    the per-partition partial-top-k kernel (one integer matmul per
    Arrow batch, top-SQ_CAND per query per batch), so the rank
    shuffle carries ≤ partitions × |queries| × SQ_CAND candidate rows
    of (query_id, vec_id, int) — corpus-size-independent, the same
    shuffle shape as ``ann_cosine_topk_vectorized`` — and the double
    vectors join back onto the SQ_CAND×|queries| SURVIVORS only.
    Partial-then-global top-k reproduces the oracle's global window
    rank EXACTLY because integer scores with the (iscore DESC, vec_id
    ASC) tie-break are a total order. Quantization stays Spark-side
    (F.round = HALF_UP, matching the oracle's round()) so the int
    scores are bit-identical in both engines; the numpy matmul over
    already-rounded int64 values is exact integer arithmetic."""
    import numpy as np
    import pandas as pd

    v = _unit_vectors(spark, sf_dir)
    q8_only = v.select(
        "vec_id",
        F.transform(F.col("v"), lambda x: F.round(x * SQ_SCALE, 0)).alias(
            "q8"
        ),
    )
    qrows = (
        q8_only.filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id")
        .collect()
    )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    # q8 components are small exact integers stored as doubles; the
    # int64 cast is lossless
    Q8 = np.stack(
        [np.asarray(r["q8"], dtype=np.float64) for r in qrows]
    ).astype(np.int64)

    cand_schema = "query_id long, vec_id long, iscore long"

    def sq_partial_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            V8 = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["q8"]]
            ).astype(np.int64)
            S = V8 @ Q8.T  # exact integer scores, (batch, queries)
            frames = []
            for j in range(len(q_ids)):
                s = S[:, j]
                cand = np.nonzero(ids != q_ids[j])[0]
                if cand.size == 0:
                    continue
                order = np.lexsort((ids[cand], -s[cand]))
                take = cand[order[:SQ_CAND]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(take.size, q_ids[j]),
                            "vec_id": ids[take],
                            "iscore": s[take],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    wc = Window.partitionBy("query_id").orderBy(
        F.col("iscore").desc(), F.col("vec_id").asc()
    )
    cands = (
        q8_only.mapInPandas(sq_partial_topk, cand_schema)
        .withColumn("crank", F.row_number().over(wc))
        .filter(F.col("crank") <= SQ_CAND)
        # exact re-rank inputs: double vectors attach to the tiny
        # survivor set (corpus side by key, query side broadcast),
        # never to pre-rank rows
        .join(v, "vec_id")
        .join(
            F.broadcast(
                v.filter(F.col("vec_id") < N_QUERIES).select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                )
            ),
            "query_id",
        )
    )
    sim = dot_unrolled(F.col("qv"), F.col("v"), DIM)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    return (
        cands.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "rank",
            F.round(F.col("sim"), 4).alias("cos_sim"),
        )
    )


PQ_M = 8  # subspaces (64 dims → 8 sub-vectors of 8 dims)
PQ_MAX_CODES = 256  # codebook cap per subspace (8-bit codes)


def _pq_stride(n_rows: int) -> int:
    """Deterministic codebook sampling stride, capped at PQ_MAX_CODES
    codes — the same capped-artifact rule as ``_ivf_stride``."""
    import math

    return max(CENTROID_STRIDE, math.ceil(n_rows / PQ_MAX_CODES))


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the FAISS-style ADC search) — the
    remaining major ANN compression family beside scalar quantization
    (``ann_sq_topk``) and random projection (``ann_rp_topk``): each
    unit vector splits into PQ_M 8-dim sub-vectors, each sub-vector is
    replaced by the id of its nearest codebook entry (argmin squared
    distance, ties to the smaller code id), and a query scores a
    corpus vector as the SUM of per-subspace lookup-table dots —
    8 bytes per corpus vector instead of 512, with the scan reduced
    to table lookups. Recall < 1 by design; the contract (and the
    oracle) IS the ADC result from the same deterministic codebooks.

    The codebook is a capped deterministic corpus sample (every
    ``_pq_stride``-th unit vector's sub-vectors) — like the IVF
    quantizer, a production system trains it offline with k-means and
    ships it; this operator consumes the artifact exactly that way
    (cached per application × table).

    Determinism: unit vectors come from CATALYST (IEEE-identical to
    the oracle's fold); encode/score run in numpy with the SAME
    a − 2b + c distance decomposition the oracle computes, code
    assignment argmins over 9-dp-QUANTIZED distances (an assignment
    flip would change 4-dp output, so the argmin key absorbs
    summation-order ulps the way the rank key does), and the final
    ranking orders by round(score, 6) with a vec_id tie-break —
    ulp-level noise cannot reorder a quantized key. Scale shape:
    encode+score is the shared partial-top-k scan pattern — one
    map-side pass, shuffle O(parts × q × k)."""
    import numpy as np
    import pandas as pd

    v = _unit_vectors(spark, sf_dir)
    from pim_orc_spark.artifacts import cached_artifact

    def _build_pq():
        stride = _pq_stride(v.count())
        crows = (
            v.filter(F.col("vec_id") % stride == 0)
            .orderBy("vec_id")
            .collect()
        )
        # (n_codes, DIM) — subspace s uses C[:, s*8:(s+1)*8]
        return stride, np.stack(
            [np.asarray(r["v"], dtype=np.float64) for r in crows]
        )

    _stride, C = cached_artifact("pq_codebook", spark, sf_dir, _build_pq)
    d_sub = DIM // PQ_M

    qrows = v.filter(F.col("vec_id") < N_QUERIES).orderBy("vec_id").collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["v"], dtype=np.float64) for r in qrows])

    # per-subspace lookup tables: LUT[s][j][c] = dot(q_j_s, code_c_s)
    LUT = [
        Q[:, s * d_sub : (s + 1) * d_sub]
        @ C[:, s * d_sub : (s + 1) * d_sub].T
        for s in range(PQ_M)
    ]
    c2 = [
        np.einsum(
            "ij,ij->i",
            C[:, s * d_sub : (s + 1) * d_sub],
            C[:, s * d_sub : (s + 1) * d_sub],
        )
        for s in range(PQ_M)
    ]

    out_schema = "query_id long, neighbor_id long, score double"

    def pq_partial_topk(batches):
        for pdf in batches:
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            X = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            # encode: per subspace, argmin ||x_s - c_s||² via the
            # a − 2b + c decomposition; np.argmin takes the FIRST
            # minimum → ties to the smaller code id, like the oracle
            codes = np.empty((len(ids), PQ_M), dtype=np.int64)
            for s in range(PQ_M):
                Xs = X[:, s * d_sub : (s + 1) * d_sub]
                x2 = np.einsum("ij,ij->i", Xs, Xs)
                dist = (
                    x2[:, None]
                    - 2.0 * (Xs @ C[:, s * d_sub : (s + 1) * d_sub].T)
                    + c2[s][None, :]
                )
                # argmin on 9-dp-QUANTIZED distances: BLAS summation
                # order differs from the oracle's sequential fold at
                # ulp level, and an assignment flip (unlike a rank
                # flip) changes 4-dp output — quantizing the argmin
                # key absorbs the ulp noise in both engines, ties
                # break to the smaller code id (np.argmin = first min)
                codes[:, s] = np.argmin(np.round(dist, 9), axis=1)
            frames = []
            for j in range(len(q_ids)):
                # ADC: sequential s-order accumulation. The oracle's
                # scored CTE is a SUM(...) GROUP BY whose accumulation
                # order is unspecified — cross-engine agreement rests
                # on round(score, 6) absorbing summation-order ulps
                # (8 doubles ~1e2 magnitude: worst-case reorder error
                # ~1e-13, far under the 5e-7 rounding step; exact
                # .5-at-6dp ties are unreachable for binary doubles)
                score = LUT[0][j][codes[:, 0]].copy()
                for s in range(1, PQ_M):
                    score = score + LUT[s][j][codes[:, s]]
                score = np.round(score, 6)
                cand = np.nonzero(ids != q_ids[j])[0]
                if cand.size == 0:
                    continue
                order = np.lexsort((ids[cand], -score[cand]))
                take = cand[order[:TOP_K]]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(take.size, q_ids[j]),
                            "neighbor_id": ids[take],
                            "score": score[take],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cands = v.mapInPandas(pq_partial_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("score"), 4).alias("adc_score"),
        )
    )


KM_K = 8  # clusters — fixture-sized; the plan is k-independent
KM_ITERS = 2  # Lloyd iterations (fixed => SQL-unrollable oracle)
KM_ROUND = 6  # dp rounding making centroid updates cross-engine exact
KM_TARGET_CLUSTER_ROWS = 4096  # SemDeDup regime: k ≈ n / cluster size
KM_MAX_K = 65536  # k×dim×8B broadcast cap: 64-dim → 32 MB centroids


def _km_k(n_rows: int) -> int:
    """Scale-derived cluster count, the `_ivf_stride` policy applied
    to Lloyd training: k ≈ n / KM_TARGET_CLUSTER_ROWS (the SemDeDup
    regime — cluster size, not cluster count, is what the within-
    cluster pair join's cost depends on), floored at the fixture's
    KM_K and capped at KM_MAX_K so the broadcast centroid relation
    stays bounded (64-dim float64 → ≤ 32 MB) at ANY corpus size. The
    EXPORTED queries stay pinned at k=KM_K so the unrolled SQL oracle
    survives; production callers pass k=_km_k(count) to `_km_state`."""
    if n_rows <= 0:
        return KM_K
    return max(KM_K, min(KM_MAX_K, n_rows // KM_TARGET_CLUSTER_ROWS))


def _km_assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """Assignment step: nearest centroid by squared L2, computed as
    v·v − 2v·c + c·c with the shared sequential-fold dot kernel (DuckDB
    ``list_dot_product`` matches it term-for-term — proven in
    test_kernel_contract), rounded so both engines argmin over
    IDENTICAL keys; ties break to the lowest cluster id via a
    lexicographic struct-min (never arg_min, whose tie pick is
    engine-dependent). The centroid side is k×dim — always broadcast;
    the corpus is never shuffled by assignment."""
    # One parsed SQL string instead of Column algebra: building the
    # three unrolled dots with Column operators costs ~3·dim py4j
    # round-trips PER DOT and _km_assign runs once per Lloyd iteration;
    # F.expr is a single gateway call with identical semantics
    # (left-associated adds, 0-based subscript == getItem).
    d2 = F.round(
        F.expr(
            f"{dot_unrolled_sql('v', 'v', DIM)}"
            f" - 2 * {dot_unrolled_sql('v', 'c', DIM)}"
            f" + {dot_unrolled_sql('c', 'c', DIM)}"
        ),
        KM_ROUND,
    )
    return (
        pts.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", F.struct(d2.alias("d"), F.col("cid").alias("c")).alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").alias("m"), F.first("v").alias("v"))
        .select(
            "vec_id",
            "v",
            F.col("m.c").alias("cid"),
            # distance to the ASSIGNED centroid (already KM_ROUND-
            # rounded) — free here, consumed by the medoid report
            F.col("m.d").alias("d2"),
        )
    )


def _km_state(
    spark: SparkSession, sf_dir: str, k: int = KM_K
) -> tuple[DataFrame, DataFrame, tuple[int, ...]]:
    """Shared KM_ITERS-iteration Lloyd run → (final assignment, final
    centroids, hot cluster ids), held as ONE RESIDENT ARTIFACT per
    (application, table version): a production system trains its
    clustering once and every consumer (cluster report, medoids,
    purity, separation, semantic dedup) reads the trained state —
    re-running Lloyd per query was the anomaly (review fix; the
    minhash-index argument). The assignment is (vec_id, v, cid, d2);
    centroids are (cid, c), k×dim — both checkpointed. The hot set
    (clusters whose size exceeds SEM_HOT_CLUSTER — the clusters the
    semantic-dedup pair join must salt) is a PURE FUNCTION of the
    assignment, so it is computed once here — one k-row aggregate at
    build time, ≤ k ints held driver-side like the codebooks — instead
    of a probe job per `dedup_semantic_pairs` call (r10 verdict #3).
    The probe is the single-partition touch — the corpus-sized-artifact
    trade the signature index documents (a full count per hit would
    pay a whole pass).

    ``k``: cluster count, default the fixture-pinned KM_K (what every
    exported query uses, keeping the unrolled SQL oracle valid). A
    production caller scales it with `_km_k(corpus_rows)`; each k gets
    its own artifact cache entry."""
    from pim_orc_spark.artifacts import cached_artifact

    def _build() -> tuple[DataFrame, DataFrame, tuple[int, ...]]:
        e = spread(spark, load_table(spark, sf_dir, "embeddings"))
        pts = e.select(
            "vec_id", as_double_vec("embedding", DIM).alias("v")
        )
        cents = pts.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("c")
        )
        for _ in range(KM_ITERS):
            assigned = _km_assign(pts, cents)
            cents = (
                assigned.select(
                    "cid", F.posexplode("v").alias("pos", "x")
                )
                .groupBy("cid", "pos")
                .agg(F.round(F.avg("x"), KM_ROUND).alias("cx"))
                .groupBy("cid")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "cx"))
                    ).alias("pc")
                )
                .select("cid", F.col("pc.cx").alias("c"))
                # materialize the k×dim centroid state each iteration:
                # without this the plan recurses (iteration i
                # re-derives every earlier assignment+update),
                # multiplying stages — measured 6.7 s → ~1 s at
                # fixture scale. Centroids are metadata-sized by
                # construction, exactly what a production trainer
                # persists between iterations.
                .localCheckpoint()
            )
        assigned = _km_assign(pts, cents).localCheckpoint()
        hot_cids = tuple(
            sorted(
                r["cid"]
                for r in assigned.groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > SEM_HOT_CLUSTER)
                .collect()
            )
        )
        return assigned, cents, hot_cids

    def _probe(art: tuple[DataFrame, DataFrame, tuple[int, ...]]) -> bool:
        art[0].isEmpty()
        return True

    return cached_artifact(
        "km_state" if k == KM_K else f"km_state_k{k}",
        spark,
        sf_dir,
        _build,
        probe=_probe,
    )


def _km_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final Lloyd assignment view of the shared ``_km_state``
    artifact (see its docstring for the caching contract)."""
    return _km_state(spark, sf_dir)[0]


def ann_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means over the embedding corpus — the
    clustering primitive behind semantic dedup (SemDeDup-style: near-
    duplicate pruning WITHIN semantic clusters) and offline IVF/PQ
    quantizer training (ann_ivf_topk's histogram quantizer documents
    that a production system trains its partitioner exactly this way).

    Deterministic contract (hash-matched against an unrolled-SQL
    oracle): seeds = the K lowest vec_ids' vectors; KM_ITERS fixed
    Lloyd iterations; distances and per-dimension centroid means
    rounded to KM_ROUND dp each step so summation-order ulps can never
    flip an argmin across engines; ties to the lowest cluster id.

    100 TB shape: assignment broadcasts the k×dim centroid relation
    and never shuffles the corpus; the update is posexplode →
    partial-aggregated groupBy(cid, dim) — the shuffle carries
    k×dim×partitions partial sums, not rows — and the new centroid
    relation is rebuilt DISTRIBUTED (sorted collect_list per cid;
    k×dim values total), no driver collect anywhere. Exported output
    is integer-only per-cluster facts (size + vec_id checksum), so
    the driver hash exercises every assignment without floating
    output columns."""
    final = _km_assignments(spark, sf_dir)
    return (
        final.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .orderBy("cluster_id")
    )


def ann_cluster_medoids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster MEDOID report — the member closest to its final
    centroid, with the cluster's mean squared distance (inertia/size):
    the representative-example step of every clustering workflow
    (inspect one real document per semantic cluster; seed SemDeDup's
    keep-one-per-group choice; pick IVF probe exemplars).

    Rides the shared Lloyd run: the assignment step already computes
    each member's KM_ROUND-rounded squared distance to its assigned
    centroid (``_km_assign``'s struct-min), so the medoid is ONE more
    aggregate over the final assignment — ``min(struct(d2, vec_id))``
    per cluster, ties to the lowest vec_id, the same
    engine-independent tie rule the assignment uses. No extra corpus
    pass, no new shuffle beyond the k-row aggregate. Inertia stays
    exact across engines as a SUM of KM_ROUND-rounded doubles scaled
    to integer micro-units (each d2 has ≤ KM_ROUND dp, so ×10^6 is
    integral and the sum order-independent), presented as double."""
    a = _km_assignments(spark, sf_dir)
    micro = F.round(F.col("d2") * 10**KM_ROUND).cast("decimal(38,0)")
    return (
        a.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min(
                F.struct(
                    F.col("d2").alias("d"), F.col("vec_id").alias("m")
                )
            ).alias("mm"),
            (
                F.sum(micro).cast("double")
                / (10**KM_ROUND * F.count(F.lit(1)))
            ).alias("mean_d2"),
        )
        .select(
            "cluster_id",
            "n_members",
            F.col("mm.m").alias("medoid_id"),
            F.col("mm.d").alias("medoid_d2"),
            "mean_d2",
        )
        .orderBy("cluster_id")
    )


def ann_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTERNAL CLUSTERING EVALUATION — k-means clusters scored
    against the corpus' ground-truth ``label`` column (the embeddings
    fixture ships one; this is its first consumer): per cluster, the
    member count, the majority label, and how many members carry it —
    the purity contingency every clustering/semantic-dedup deployment
    reports before trusting cluster-scoped decisions (SemDeDup prunes
    WITHIN clusters, so impure clusters silently under-dedup).

    Ties break to the LOWEST label via ``min(struct(-n, label))`` —
    the same engine-independent struct-order rule the assignment
    argmin uses. Integer-only output; one (cid, label) aggregate over
    the final assignment (map-side partial, ≤ k×|labels| rows) then a
    k-row collapse — no new corpus pass beyond the label join, which
    broadcasts nothing and shuffles only (vec_id, label) pairs."""
    a = _km_assignments(spark, sf_dir).select("vec_id", "cid")
    lab = spread(
        spark, load_table(spark, sf_dir, "embeddings")
    ).select("vec_id", "label")
    cl = (
        a.join(lab, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    best = F.min(
        F.struct((-F.col("n")).alias("neg_n"), F.col("label").alias("l"))
    )
    return (
        cl.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.sum("n").cast("long").alias("n_members"),
            best.alias("b"),
        )
        .select(
            "cluster_id",
            "n_members",
            F.col("b.l").cast("long").alias("majority_label"),
            (-F.col("b.neg_n")).cast("long").alias("n_majority"),
        )
        .orderBy("cluster_id")
    )


def ann_cluster_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INTERNAL clustering evaluation — pairwise squared distances
    between the final centroids (the between-cluster half of a
    Davies-Bouldin-style report; ``ann_cluster_purity`` is the
    external half, ``ann_cluster_medoids`` carries within-cluster
    inertia): close centroid pairs flag clusters a SemDeDup pass
    should treat as one semantic group, and the minimum separation is
    the k-selection diagnostic every clustering deployment watches.

    Reads the k×dim centroid relation straight from the shared
    ``_km_state`` artifact — no corpus pass at all; the k²/2 pair
    relation is metadata-sized (k ≪ √corpus by construction), so the
    self-join broadcasts. Distances use the same sequential-fold dot
    kernel and KM_ROUND rounding as the assignment step, so both
    engines compute identical doubles."""
    _, cents, _ = _km_state(spark, sf_dir)
    a = cents.select(
        F.col("cid").alias("cid_a"), F.col("c").alias("ca")
    )
    b = cents.select(
        F.col("cid").alias("cid_b"), F.col("c").alias("cb")
    )
    d2 = F.round(
        F.expr(
            f"{dot_unrolled_sql('ca', 'ca', DIM)}"
            f" - 2 * {dot_unrolled_sql('ca', 'cb', DIM)}"
            f" + {dot_unrolled_sql('cb', 'cb', DIM)}"
        ),
        KM_ROUND,
    )
    return (
        a.join(F.broadcast(b), F.col("cid_a") < F.col("cid_b"))
        .select("cid_a", "cid_b", d2.alias("dist2"))
        .orderBy("cid_a", "cid_b")
    )


def _separation_sql() -> str:
    return (
        _kmeans_cte_prefix()
        + f"""
SELECT a.cid AS cid_a, b.cid AS cid_b,
       round(list_dot_product(a.c, a.c)
             - 2 * list_dot_product(a.c, b.c)
             + list_dot_product(b.c, b.c), {KM_ROUND}) AS dist2
FROM c{KM_ITERS} a JOIN c{KM_ITERS} b ON a.cid < b.cid
ORDER BY cid_a, cid_b
"""
    )


def _purity_sql() -> str:
    return (
        _kmeans_cte_prefix()
        + """,
cl AS (
  SELECT a.cid, e.label, COUNT(*) AS n
  FROM af a JOIN embeddings e ON e.vec_id = a.vec_id
  GROUP BY a.cid, e.label
)
SELECT cid AS cluster_id,
       CAST(SUM(n) AS BIGINT) AS n_members,
       CAST((min(struct_pack(neg_n := -n, l := label))).l AS BIGINT)
         AS majority_label,
       CAST(-(min(struct_pack(neg_n := -n, l := label))).neg_n AS BIGINT)
         AS n_majority
FROM cl GROUP BY cid ORDER BY cluster_id
"""
    )


def _medoids_sql() -> str:
    d = (
        "round(list_dot_product(p.v, p.v)"
        " - 2 * list_dot_product(p.v, c.c)"
        f" + list_dot_product(c.c, c.c), {KM_ROUND})"
    )
    return (
        _kmeans_cte_prefix()
        + f""",
md AS (
  SELECT a.cid, p.vec_id, {d} AS d2
  FROM af a
  JOIN pts p ON p.vec_id = a.vec_id
  JOIN c{KM_ITERS} c ON c.cid = a.cid
)
SELECT cid AS cluster_id,
       COUNT(*) AS n_members,
       (min(struct_pack(d := d2, m := vec_id))).m AS medoid_id,
       (min(struct_pack(d := d2, m := vec_id))).d AS medoid_d2,
       CAST(SUM(CAST(round(d2 * {10**KM_ROUND}) AS HUGEINT)) AS DOUBLE)
         / ({10**KM_ROUND} * COUNT(*)) AS mean_d2
FROM md GROUP BY cid ORDER BY cluster_id
"""
    )


SEM_TAU = 0.4  # fixture-calibrated default: this synthetic corpus is
#               diffuse (max within-cluster cosine ≈ 0.51), so the
#               semantic-dup cut sits where the fixture HAS
#               near-neighbors; on real text embeddings the same
#               operator runs at ~0.9+. Production retuning is a
#               kwarg away: derived_sem_tau() reads the cut off the
#               corpus's own cosine distribution.
SEM_SALT = 8  # tasks a hot cluster's pair work is split across
SEM_HOT_CLUSTER = 32  # rows — above this a cluster's |c|²/2 pair
#               evals no longer belong in ONE join task. Deliberately
#               low so the fixture (≈60 rows/cluster at sf0.01)
#               exercises the salted path in every driver sweep; at
#               100 TB with a production k, essentially every cluster
#               crosses it, which is the regime the salt exists for.
#               derived_hot_threshold() reads it off the cluster-size
#               histogram instead; the exported entry keeps the pin
#               because the pair OUTPUT is threshold-invariant anyway
#               (property-tested) — only the shuffle layout moves.
SEM_HOT_QUANTILE = 0.99  # histogram anchor for the derived threshold
SEM_HOT_FACTOR = 0.5  # hot = bigger than factor × the p99 cluster
SEM_TAU_QUANTILE = 0.95  # keep the densest 5% of candidate cosines


def derived_hot_threshold(
    assigned: DataFrame,
    quantile: float = SEM_HOT_QUANTILE,
    factor: float = SEM_HOT_FACTOR,
) -> int:
    """Hot-cluster threshold FROM the data: ``factor`` × the
    ``quantile`` of the cluster-size histogram. A cluster close to the
    corpus's own large-cluster regime gets salted; the magic row count
    pinned in ``SEM_HOT_CLUSTER`` becomes a fixture convenience rather
    than a scaling assumption. The histogram is k rows (one per
    cluster), so the exact percentile is a metadata-sized aggregate —
    no sampling, no extra corpus pass beyond the groupBy the hot-set
    build already runs."""
    row = (
        assigned.groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.expr(f"percentile(n, {quantile})").alias("q"))
        .collect()[0]
    )
    return max(1, int((row["q"] or 0) * factor))


def derived_sem_tau(
    nv: DataFrame,
    quantile: float = SEM_TAU_QUANTILE,
    per_cluster_cap: int = 50,
) -> float:
    """Semantic-dup cut FROM the data: the ``quantile`` of the
    within-cluster candidate-cosine distribution, estimated on a
    deterministic per-cluster sample (first ``per_cluster_cap`` rows
    by vec_id — ids carry no semantic order, so this is an unbiased
    cheap sample that never exceeds k × cap²/2 pair evals regardless
    of corpus size). Callers that retune for a real corpus pass the
    result as ``dedup_semantic_pairs(..., tau=...)``; the exported
    entry keeps the pinned SEM_TAU so the fixture oracle stays a
    constant."""
    from pyspark.sql import Window

    capped = (
        nv.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cid").orderBy("vec_id")
            ),
        )
        .filter(F.col("rn") <= per_cluster_cap)
        .drop("rn")
    )
    b = capped.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nrm_b"),
        "cid",
    )
    cos = F.round(
        dot_unrolled(F.col("v"), F.col("vb"), DIM)
        / (F.col("nrm") * F.col("nrm_b")),
        6,
    )
    row = (
        capped.hint("shuffle_merge")
        .join(b, "cid")
        .filter(F.col("vec_id") < F.col("vec_b"))
        .select(cos.alias("cos"))
        .agg(F.expr(f"percentile(cos, {quantile})").alias("tau"))
        .collect()[0]
    )
    if row["tau"] is None:
        # every cluster sampled ≤1 row → zero candidate pairs → the
        # percentile is NULL; name the condition instead of letting
        # float(None) raise an opaque TypeError (ADVICE r12)
        raise ValueError(
            "derived_sem_tau: empty within-cluster candidate "
            "distribution (no cluster contributed ≥2 sampled rows); "
            "raise per_cluster_cap or fall back to SEM_TAU"
        )
    return float(row["tau"])


def _semantic_pairs_from(
    nv: DataFrame,
    salt: int = SEM_SALT,
    hot_threshold: int = SEM_HOT_CLUSTER,
    hot_cids: tuple[int, ...] | None = None,
    tau: float = SEM_TAU,
) -> DataFrame:
    """Within-cluster cosine pair join over (vec_id, v, cid, nrm),
    with hot clusters SALTED: the equi-key of the self-join is the
    cluster id, and with k ≪ n every cluster is a straggler-sized
    bucket — one join task per cluster, Θ(|c|²) pair evals in it
    (exactly the degenerate-band-key problem `_salted_band_candidates`
    solves for MinHash, dedup.py:210-376; same fix here, learned
    buckets instead of hashed ones).

    Mechanics mirror the band join: clusters > ``hot_threshold`` form
    the hot set (≤ k ids — metadata-sized by construction); the left
    side gets salt = xxhash64(vec_id) % ``salt`` for hot clusters (0
    otherwise); the right side explodes all ``salt`` values for hot
    clusters. Every (a, b) pair still meets on exactly one (cid, salt)
    cell — the OUTPUT IS IDENTICAL to the unsalted join for any salt
    count (property-tested) — but a hot cluster's pair work now
    spreads across ``salt`` tasks. The join is pinned sort-merge: at
    corpus scale neither side broadcasts, and a deterministic strategy
    keeps the measured plan stable across SFs. When no cluster is hot
    the plain cid join runs (no tagging, no explode).

    ``hot_cids``: the precomputed hot set. ``dedup_semantic_pairs``
    passes it from the shared ``_km_state`` artifact (where it is a
    build-time byproduct of the assignment), so reusing the trained
    state costs ZERO extra jobs here (r10 verdict #3 — previously a
    probe aggregate ran per call). When None (ad-hoc callers, the
    salt-invariance property test), one bounded k-row aggregate
    derives it. Hotness is tagged with an ``isin`` literal over ≤ k
    ints — a codegen-resident predicate, cheaper than the broadcast
    tag join it replaces."""
    b_cols = [
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nrm_b"),
        "cid",
    ]
    cos = F.round(
        dot_unrolled(F.col("v"), F.col("vb"), DIM)
        / (F.col("nrm") * F.col("nrm_b")),
        6,
    )

    def finish(joined: DataFrame) -> DataFrame:
        return (
            joined.filter(F.col("vec_id") < F.col("vec_b"))
            .select(
                F.col("vec_id").alias("vec_a"),
                "vec_b",
                cos.alias("cos"),
            )
            .filter(F.col("cos") >= tau)
            .orderBy("vec_a", "vec_b")
        )

    if hot_cids is None:
        hot_cids = tuple(
            sorted(
                r["cid"]
                for r in nv.groupBy("cid")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > hot_threshold)
                .collect()
            )
        )
    if not hot_cids:
        left = nv.hint("shuffle_merge")
        return finish(left.join(nv.select(*b_cols), "cid"))
    tagged = nv.withColumn("is_hot", F.col("cid").isin(*hot_cids))
    left = tagged.select(
        "vec_id",
        "v",
        "nrm",
        "cid",
        F.when(F.col("is_hot"), F.pmod(F.xxhash64("vec_id"), F.lit(salt)))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("salt"),
    ).hint("shuffle_merge")
    right = tagged.select(
        *b_cols,
        F.explode(
            F.when(
                F.col("is_hot"), F.sequence(F.lit(0), F.lit(salt - 1))
            ).otherwise(F.array(F.lit(0)))
        ).alias("salt"),
    )
    return finish(left.join(right, ["cid", "salt"]))


def dedup_semantic_pairs(
    spark: SparkSession,
    sf_dir: str,
    tau: float = SEM_TAU,
    hot_threshold: int | None = None,
) -> DataFrame:
    """SEMANTIC DEDUP (SemDeDup-shape): near-duplicate pairs by
    embedding cosine, with the pair search scoped to k-means clusters —
    the composition that makes embedding dedup tractable at corpus
    scale. A global cosine self-join is O(n²); clustering first bounds
    the candidate space to within-cluster pairs (Σ|cluster|², tuned
    via k in the SemDeDup regime k ≈ n / target-cluster-size — the
    fixture pins KM_K so the Lloyd oracle stays SQL-unrollable, and
    the salt below carries the load k would at production scale), and
    the join shuffles ON THE CLUSTER ID — the same candidate-
    restriction trade the MinHash band join and the hyperplane-LSH
    dedup make, here with learned rather than hashed buckets. Hot
    clusters are salted across SEM_SALT tasks (see
    `_semantic_pairs_from`), so no single cluster decides the job's
    wall clock even when k is small relative to the corpus.

    Reuses the shared _km_state Lloyd run (identical contract to
    ann_kmeans_clusters, so the oracle reuses the same unrolled CTE
    prefix), localCheckpointed ONCE: both sides of the self-join read
    the materialized assignment instead of re-deriving the Lloyd
    lineage (a self-join over an unmaterialized iterative lineage
    computes it twice), and the hot-cluster set arrives precomputed
    from the artifact — artifact reuse launches no probe job at all.
    Norms are precomputed per row BEFORE the pair join (never per
    pair); the rounded cosine is compared against SEM_TAU identically
    in both engines."""
    # the assignment + hot set are the shared resident artifact
    # (already checkpointed); project the columns this path needs
    assigned, _, hot_cids = _km_state(spark, sf_dir)
    nv = assigned.select(
        "vec_id",
        "v",
        "cid",
        F.sqrt(dot_unrolled(F.col("v"), F.col("v"), DIM)).alias("nrm"),
    )
    if hot_threshold is not None:
        # caller-derived threshold (e.g. derived_hot_threshold):
        # recompute the hot set from the assignment instead of using
        # the artifact's pinned-threshold byproduct
        return _semantic_pairs_from(
            nv, hot_threshold=hot_threshold, tau=tau
        )
    return _semantic_pairs_from(nv, hot_cids=hot_cids, tau=tau)


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_kmeans_clusters": ann_kmeans_clusters,
    "ann_cluster_medoids": ann_cluster_medoids,
    "ann_cluster_purity": ann_cluster_purity,
    "ann_cluster_separation": ann_cluster_separation,
    "dedup_semantic_pairs": dedup_semantic_pairs,
    "ann_cosine_topk_vectorized": ann_cosine_topk_vectorized,
    "ann_rp_topk": ann_rp_topk,
    "ann_pq_topk": ann_pq_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_add_batch": ann_ivf_add_batch,
    "ann_sq_topk": ann_sq_topk,
    "ann_recall": ann_recall,
}


def _plane_sql_literal(p: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in p) + "]"


def _bucket_sql(vec_expr: str) -> str:
    planes = _hyperplanes()
    terms = []
    for i, p in enumerate(planes):
        lit = _plane_sql_literal(p)
        terms.append(
            f"CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), "
            f"CAST({lit} AS DOUBLE[])) > 0 THEN {1 << i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


_ANN_EXACT_SQL = f"""
        WITH v AS (SELECT vec_id, embedding FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
              WHERE vec_id < {N_QUERIES}),
        sims AS (
          SELECT q.query_id, v.vec_id,
                 {cosine_sql('q.qe', 'v.embedding')} AS sim
          FROM v CROSS JOIN q WHERE v.vec_id <> q.query_id
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, vec_id AS neighbor_id, rank,
               round(sim, 4) AS cos_sim
        FROM ranked WHERE rank <= {TOP_K}
    """

_ANN_IVF_SQL = f"""
        WITH stride AS (
          -- same capped quantizer stride as _ivf_stride(count)
          SELECT GREATEST({CENTROID_STRIDE},
                          CAST(ceil(COUNT(*) / {IVF_MAX_CENTROIDS}.0)
                               AS BIGINT)) AS s
          FROM embeddings
        ),
        c AS (
          SELECT vec_id AS cid, embedding AS ce FROM embeddings
          WHERE vec_id % (SELECT s FROM stride) = 0
        ),
        assigned AS (
          SELECT vec_id, embedding, cid FROM (
            SELECT v.vec_id, v.embedding, c.cid,
                   row_number() OVER (
                     PARTITION BY v.vec_id
                     ORDER BY {cosine_sql('v.embedding', 'c.ce')} DESC,
                              c.cid ASC) AS rn
            FROM embeddings v CROSS JOIN c
          ) WHERE rn = 1
        ),
        probe AS (
          SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (
                     PARTITION BY q.vec_id
                     ORDER BY {cosine_sql('q.embedding', 'c.ce')} DESC,
                              c.cid ASC) AS rn
            FROM embeddings q CROSS JOIN c WHERE q.vec_id < {N_QUERIES}
          ) WHERE rn <= {N_PROBE}
        ),
        sims AS (
          SELECT p.query_id, a.vec_id,
                 {cosine_sql('q.embedding', 'a.embedding')} AS sim
          FROM probe p
          JOIN assigned a ON a.cid = p.cid
          JOIN embeddings q ON q.vec_id = p.query_id
          WHERE a.vec_id <> p.query_id
        ),
        ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, vec_id AS neighbor_id, rank,
               round(sim, 4) AS cos_sim
        FROM ranked WHERE rank <= {TOP_K}
    """

_ANN_LSH_SQL = f"""
        WITH v AS (
          SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
          FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM v
              WHERE vec_id < {N_QUERIES}),
        sims AS (
          SELECT q.query_id, v.vec_id,
                 {cosine_sql('q.qe', 'v.embedding')} AS sim
          FROM v JOIN q ON v.bucket = q.bucket
          WHERE v.vec_id <> q.query_id
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, vec_id AS neighbor_id, rank,
               round(sim, 4) AS cos_sim
        FROM ranked WHERE rank <= {TOP_K}
    """

def _rp_sql() -> str:
    """Projected-space exact top-k: the same LCG planes as literals,
    projection via list_dot_product (sequential fold == the Catalyst
    aggregate), cosine over the raw projected vectors."""
    planes = _hyperplanes(n_planes=RP_DIM, dim=DIM, seed=11)
    proj = ", ".join(
        f"list_dot_product(CAST(embedding AS DOUBLE[]), "
        f"CAST({_plane_sql_literal(p)} AS DOUBLE[]))"
        for p in planes
    )
    return f"""
        WITH pr AS (
          SELECT vec_id, [{proj}] AS p FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, p AS qp FROM pr
              WHERE vec_id < {N_QUERIES}),
        sims AS (
          SELECT q.query_id, pr.vec_id,
                 {cosine_sql('q.qp', 'pr.p')} AS sim
          FROM pr CROSS JOIN q WHERE pr.vec_id <> q.query_id
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM sims
        )
        SELECT query_id, vec_id AS neighbor_id, rank,
               round(sim, 4) AS cos_sim
        FROM ranked WHERE rank <= {TOP_K}
    """



def _pq_sql() -> str:
    """ADC search recomputed in SQL: same unit vectors, same capped
    stride codebook, same a − 2b + c distances (ties to the smaller
    code id), rank key = round(score, 6) with vec_id tie-break."""
    d = DIM // PQ_M

    def sl(expr: str, sp: str) -> str:
        return f"array_slice({expr}, {sp} * {d} + 1, ({sp} + 1) * {d})"

    return f"""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 1.0 / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[])))
                   AS inv
          FROM embeddings
        ), uu AS (
          SELECT vec_id, list_transform(e, x -> x * inv) AS u FROM n
        ), st AS (
          SELECT GREATEST({CENTROID_STRIDE},
                          CAST(ceil(COUNT(*) / {PQ_MAX_CODES}.0)
                               AS BIGINT)) AS s
          FROM embeddings
        ), c AS (
          SELECT vec_id AS cid, u AS cu FROM uu
          WHERE vec_id % (SELECT s FROM st) = 0
        ), subs AS (
          SELECT unnest(range({PQ_M})) AS sp
        ), dists AS (
          SELECT v.vec_id, subs.sp, c.cid,
                 list_dot_product({sl('v.u', 'subs.sp')},
                                  {sl('v.u', 'subs.sp')})
                 - 2 * list_dot_product({sl('v.u', 'subs.sp')},
                                        {sl('c.cu', 'subs.sp')})
                 + list_dot_product({sl('c.cu', 'subs.sp')},
                                    {sl('c.cu', 'subs.sp')}) AS dist
          FROM uu v CROSS JOIN subs CROSS JOIN c
        ), assign AS (
          SELECT vec_id, sp, cid FROM (
            SELECT *, row_number() OVER (
              PARTITION BY vec_id, sp
              ORDER BY round(dist, 9) ASC, cid ASC) AS rn
            FROM dists
          ) WHERE rn = 1
        ), scored AS (
          SELECT q.vec_id AS query_id, a.vec_id,
                 round(SUM(list_dot_product({sl('q.u', 'a.sp')},
                                            {sl('c.cu', 'a.sp')})), 6)
                   AS score
          FROM assign a
          JOIN c ON c.cid = a.cid
          CROSS JOIN (SELECT vec_id, u FROM uu
                      WHERE vec_id < {N_QUERIES}) q
          WHERE a.vec_id <> q.vec_id
          GROUP BY q.vec_id, a.vec_id
        ), ranked AS (
          SELECT query_id, vec_id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, vec_id ASC)
                   AS rank
          FROM scored
        )
        SELECT query_id, vec_id AS neighbor_id, rank,
               round(score, 4) AS adc_score
        FROM ranked WHERE rank <= {TOP_K}
    """


# Recall@k: both result sets are recomputed as CTEs (a CTE body may
# itself carry a WITH clause) and intersected per query.
# Quantization mirrors Spark's exact arithmetic: unit components are
# x * (1.0 / nrm) — multiply by reciprocal, NOT x / nrm — because both
# engines round each IEEE op identically only when the ops are the
# same ones in the same order.
_ANN_SQ_SQL = f"""
        WITH n AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 1.0 / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                             CAST(embedding AS DOUBLE[]))) AS inv
          FROM embeddings
        ), u AS (
          SELECT vec_id,
                 list_transform(e, x -> x * inv) AS u,
                 list_transform(e, x -> round(x * inv * {SQ_SCALE})) AS q8
          FROM n
        ), q AS (
          SELECT vec_id AS query_id, u AS qu, q8 AS qq8
          FROM u WHERE vec_id < {N_QUERIES}
        ), cand AS (
          SELECT q.query_id, u.vec_id,
                 list_dot_product(q.qq8, u.q8) AS iscore,
                 list_dot_product(q.qu, u.u) AS sim
          FROM u CROSS JOIN q WHERE u.vec_id <> q.query_id
        ), cr AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY iscore DESC, vec_id ASC)
                   AS crank
          FROM cand
        ), ranked AS (
          SELECT query_id, vec_id, sim,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
          FROM cr WHERE crank <= {SQ_CAND}
        )
        SELECT query_id, vec_id AS neighbor_id, rank,
               round(sim, 4) AS cos_sim
        FROM ranked WHERE rank <= {TOP_K}
    """

_ANN_RECALL_SQL = f"""
        WITH exact_r AS ({_ANN_EXACT_SQL}),
        lsh_r AS ({_ANN_LSH_SQL}),
        ivf_r AS ({_ANN_IVF_SQL}),
        qids AS (SELECT DISTINCT query_id FROM exact_r),
        lsh_hits AS (
          SELECT q.query_id, COUNT(m.neighbor_id) AS n_hits
          FROM qids q LEFT JOIN (
            SELECT l.query_id, l.neighbor_id
            FROM lsh_r l JOIN exact_r e
              ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
          ) m ON m.query_id = q.query_id
          GROUP BY q.query_id
        ),
        ivf_hits AS (
          SELECT q.query_id, COUNT(m.neighbor_id) AS n_hits
          FROM qids q LEFT JOIN (
            SELECT l.query_id, l.neighbor_id
            FROM ivf_r l JOIN exact_r e
              ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
          ) m ON m.query_id = q.query_id
          GROUP BY q.query_id
        ),
        sq_r AS ({_ANN_SQ_SQL}),
        sq_hits AS (
          SELECT q.query_id, COUNT(m.neighbor_id) AS n_hits
          FROM qids q LEFT JOIN (
            SELECT l.query_id, l.neighbor_id
            FROM sq_r l JOIN exact_r e
              ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
          ) m ON m.query_id = q.query_id
          GROUP BY q.query_id
        ),
        rp_r AS ({_rp_sql()}),
        rp_hits AS (
          SELECT q.query_id, COUNT(m.neighbor_id) AS n_hits
          FROM qids q LEFT JOIN (
            SELECT l.query_id, l.neighbor_id
            FROM rp_r l JOIN exact_r e
              ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
          ) m ON m.query_id = q.query_id
          GROUP BY q.query_id
        ),
        pq_r AS ({_pq_sql()}),
        pq_hits AS (
          SELECT q.query_id, COUNT(m.neighbor_id) AS n_hits
          FROM qids q LEFT JOIN (
            SELECT l.query_id, l.neighbor_id
            FROM pq_r l JOIN exact_r e
              ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
          ) m ON m.query_id = q.query_id
          GROUP BY q.query_id
        )
        SELECT 'ann_lsh_bucketed' AS method, query_id,
               n_hits, n_hits / {TOP_K}.0 AS recall_at_k
        FROM lsh_hits
        UNION ALL
        SELECT 'ann_ivf_topk' AS method, query_id,
               n_hits, n_hits / {TOP_K}.0 AS recall_at_k
        FROM ivf_hits
        UNION ALL
        SELECT 'ann_sq_topk' AS method, query_id,
               n_hits, n_hits / {TOP_K}.0 AS recall_at_k
        FROM sq_hits
        UNION ALL
        SELECT 'ann_rp_topk' AS method, query_id,
               n_hits, n_hits / {TOP_K}.0 AS recall_at_k
        FROM rp_hits
        UNION ALL
        SELECT 'ann_pq_topk' AS method, query_id,
               n_hits, n_hits / {TOP_K}.0 AS recall_at_k
        FROM pq_hits
    """

def _km_assign_sql(pts: str, cents: str, out: str) -> str:
    """One unrolled assignment step; struct-min ties to lowest cid
    (mirrors _km_assign — see its docstring for the rounding contract)."""
    return f"""
{out} AS (
  SELECT vec_id,
         (min(struct_pack(d := round(
              list_dot_product(p.v, p.v)
              - 2 * list_dot_product(p.v, c.c)
              + list_dot_product(c.c, c.c), {KM_ROUND}), c := c.cid))).c AS cid
  FROM {pts} p CROSS JOIN {cents} c
  GROUP BY vec_id
)"""


def _km_update_sql(asg: str, pts: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT cid, list(cx ORDER BY i) AS c FROM (
    SELECT a.cid, r.i, round(avg(p.v[CAST(r.i AS INT)]), {KM_ROUND}) AS cx
    FROM {asg} a JOIN {pts} p USING (vec_id), range(1, {DIM + 1}) r(i)
    GROUP BY a.cid, r.i
  ) GROUP BY cid
)"""


def _kmeans_cte_prefix() -> str:
    """The WITH-chain ending in ``af`` (the final assignment) — shared
    by the k-means oracle and the semantic-dedup oracle."""
    steps, prev = [], "c0"
    for it in range(1, KM_ITERS + 1):
        steps.append(_km_assign_sql("pts", prev, f"a{it}"))
        steps.append(_km_update_sql(f"a{it}", "pts", f"c{it}"))
        prev = f"c{it}"
    steps.append(_km_assign_sql("pts", prev, "af"))
    body = ",".join(steps)
    return f"""
WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (SELECT vec_id AS cid, v AS c FROM pts WHERE vec_id < {KM_K}),
{body}
"""


def _kmeans_sql() -> str:
    return (
        _kmeans_cte_prefix()
        + """
SELECT cid AS cluster_id, COUNT(*) AS n_members,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM af GROUP BY cid ORDER BY cluster_id
"""
    )


def _semantic_pairs_sql() -> str:
    return (
        _kmeans_cte_prefix()
        + f""",
nv AS (SELECT p.vec_id, p.v, a.cid, sqrt(list_dot_product(p.v, p.v)) AS nrm
       FROM pts p JOIN af a ON a.vec_id = p.vec_id)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
FROM nv a JOIN nv b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= {SEM_TAU}
ORDER BY vec_a, vec_b
"""
    )


ORACLES = {
    "ann_cosine_topk": _ANN_EXACT_SQL,
    "ann_kmeans_clusters": _kmeans_sql(),
    "ann_cluster_medoids": _medoids_sql(),
    "ann_cluster_purity": _purity_sql(),
    "ann_cluster_separation": _separation_sql(),
    "dedup_semantic_pairs": _semantic_pairs_sql(),
    "ann_rp_topk": _rp_sql(),
    "ann_pq_topk": _pq_sql(),
    "ann_sq_topk": _ANN_SQ_SQL,
    # the vectorized plan must reproduce the exact baseline's output
    "ann_cosine_topk_vectorized": _ANN_EXACT_SQL,
    "ann_ivf_topk": _ANN_IVF_SQL,
    # the incremental-add contract in SQL, derived from the ORIGINAL
    # index's oracle (the point: maintenance changes no existing
    # posting). The delta clones EVERY query vector, so three row
    # classes exist per query j: j's own clone at rank 1 / sim 1.0;
    # original neighbors, pushed down by 1 (own clone) plus one for
    # each clone of an EARLIER-ranked query-vector neighbor; and the
    # clone of any query-vector neighbor k (identical unrounded sim,
    # id tiebreak k < k+SHIFT puts it immediately AFTER its source).
    # Modeled by rank arithmetic over orig — never by re-sorting the
    # ROUNDED sims, which could disagree with Spark's unrounded order.
    # PRECONDITION (fixture-verified, like the INCR_ID_SHIFT guard):
    # no two distinct embeddings are exactly equal, so a clone's only
    # exact-sim tie is its own source — an exact tie with a THIRD
    # vector whose id falls between k and k+SHIFT would interleave and
    # break the "immediately after" rank arithmetic. Clone rows come
    # from the same vec_id < N_QUERIES predicate the engine uses, so a
    # query with zero original IVF neighbors still gets its own clone.
    "ann_ivf_add_batch": f"""
        WITH orig AS ({_ANN_IVF_SQL}),
        base AS (
          SELECT query_id, neighbor_id, cos_sim, rank,
                 CASE WHEN neighbor_id < {N_QUERIES} THEN 1 ELSE 0 END
                   AS isq,
                 SUM(CASE WHEN neighbor_id < {N_QUERIES} THEN 1
                          ELSE 0 END)
                   OVER (PARTITION BY query_id ORDER BY rank) AS cum_q
          FROM orig
        ),
        aug AS (
          SELECT query_id,
                 CAST(query_id + {INCR_ID_SHIFT} AS BIGINT)
                   AS neighbor_id,
                 CAST(1 AS BIGINT) AS rank,
                 CAST(1.0 AS DOUBLE) AS cos_sim
          FROM (SELECT vec_id AS query_id FROM embeddings
                WHERE vec_id < {N_QUERIES})
          UNION ALL
          SELECT query_id, neighbor_id,
                 CAST(1 + rank + (cum_q - isq) AS BIGINT) AS rank,
                 cos_sim
          FROM base
          UNION ALL
          SELECT query_id,
                 CAST(neighbor_id + {INCR_ID_SHIFT} AS BIGINT),
                 CAST(1 + rank + cum_q AS BIGINT) AS rank, cos_sim
          FROM base WHERE isq = 1
        )
        SELECT query_id, neighbor_id, rank, cos_sim
        FROM aug WHERE rank <= {TOP_K}
    """,
    "ann_lsh_bucketed": _ANN_LSH_SQL,
    "ann_recall": _ANN_RECALL_SQL,
}
