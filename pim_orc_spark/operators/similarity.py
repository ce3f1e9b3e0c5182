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
    unit_vec,
)
from pim_orc_spark.plans import spread


def _unit_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings as L2-normalized double vectors, spread past the
    single file split BEFORE normalization so the per-row unit_vec work
    parallelizes (computed after a later repartition it would run on
    one core)."""
    e = spread(spark, load_table(spark, sf_dir, "embeddings"))
    return e.select("vec_id", as_double_vec("embedding").alias("v0")).select(
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
        e.select("vec_id", as_double_vec("embedding").alias("v0"))
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


def ann_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k, restructured for 100 TB: Arrow-batched numpy matmul
    with per-partition PARTIAL top-k, then a final top-k over the tiny
    candidate set.

    The window formulation (``ann_cosine_topk``) shuffles every
    (query, corpus-row) similarity — O(|corpus| × |queries|) rows —
    into per-query partitions before ranking. Here each Arrow batch
    computes its own top-k per query inside numpy (one BLAS matmul),
    so the shuffle carries ≤ partitions × |queries| × k candidate rows,
    independent of corpus size. Same result set as the exact baseline
    and the same oracle.

    The query set is collected to the driver and closed over (bounded:
    a query workload, not a table). Float64 accumulation order differs
    from the sequential fold by ≲1 ulp — far below the 4-dp rounding
    the contract exposes.
    """
    import numpy as np
    import pandas as pd

    e = spread(spark, load_table(spark, sf_dir, "embeddings"))
    v = e.select("vec_id", as_double_vec("embedding").alias("v"))
    qrows = (
        v.filter(F.col("vec_id") < N_QUERIES)
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


QUERIES = {
    "ann_cosine_topk": ann_cosine_topk,
    "ann_cosine_topk_vectorized": ann_cosine_topk_vectorized,
    "ann_lsh_bucketed": ann_lsh_bucketed,
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

ORACLES = {
    "ann_cosine_topk": _ANN_EXACT_SQL,
    # the vectorized plan must reproduce the exact baseline's output
    "ann_cosine_topk_vectorized": _ANN_EXACT_SQL,
    "ann_lsh_bucketed": f"""
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
    """,
}
