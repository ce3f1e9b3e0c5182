"""Cogrouped-map and Arrow-native grouped-map UDx operators — the last
cells of the §2.8 extension matrix (SURVEY.md §2.8; the reference has
no counterpart — its engine exposes no user-defined per-group kernels,
so these are pure north-star surface).

Three cells, one business shape (per-nation reconciliation of the
customer and supplier balance books):

- ``cogroup_balance_align`` — ``df.groupBy(k).cogroup(other.groupBy(k))
  .applyInPandas``: each key's two groups arrive as a pandas pair and
  the kernel POSITIONALLY aligns them (rank i of one side against rank
  i of the other — the alignment itself is the custom logic; SQL
  expresses it as two ROW_NUMBER CTEs + a FULL OUTER join, which is
  exactly the oracle).
- ``cogroup_arrow_align`` — the same cogroup through Spark 4's
  Arrow-native ``applyInArrow``: the kernel receives ``pyarrow.Table``
  pairs (no pandas conversion on the worker). Identical oracle — the
  two entries must be bit-equal, which is itself the cross-API test.
- ``grouped_arrow_stats`` — ``GroupedData.applyInArrow`` (single-input
  grouped map): per-group exact median/min/max computed with pyarrow
  compute kernels.

Scale design (100 TB lens): the cogroup kernels run AFTER a JVM-side
top-K prune (rank window, filter rnk ≤ K), so Python receives at most
2·K rows per key no matter how large the corpus — the declarative
engine does the heavy lifting, the UDx does only the genuinely custom
alignment. ``cogroup`` shuffles both sides by the group key once (the
same exchange a join would pay). ``grouped_arrow_stats`` ships whole
groups by necessity — exact median is holistic — and documents the
trade: production kernels that tolerate error should stay declarative
(``percentile_approx``); the group-key cardinality (nations) bounds
fan-in, and a skewed key would be salted upstream like every other
grouped operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pim_orc_spark.catalog import load_table

TOP_K = 5  # per-nation book depth the alignment compares

_ALIGN_SCHEMA = (
    "n_name string, rnk bigint, cust_name string, "
    "supp_name string, bal_gap double"
)
_STATS_SCHEMA = (
    "n_name string, n_cust bigint, min_bal double, "
    "max_bal double, median_bal double"
)


def _ranked_side(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    name_col: str,
    bal_col: str,
    key_col: str,
) -> DataFrame:
    """One side of the alignment, pruned JVM-side to its per-nation
    top-K by balance (rank window + filter) so the Python kernel never
    sees more than K rows per group. Ties broken by name — names are
    unique, so the ranking (and therefore the whole operator) is
    deterministic."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    t = load_table(spark, sf_dir, table)
    w = Window.partitionBy("n_name").orderBy(
        F.col("bal").desc(), F.col("name")
    )
    return (
        t.join(F.broadcast(nation), t[key_col] == nation["n_nationkey"])
        .select(
            "n_name",
            F.col(name_col).alias("name"),
            F.col(bal_col).alias("bal"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
    )


def _align_pandas(left, right):
    """Positional alignment of two pre-ranked groups. Receives the
    top-K rows of ONE nation from each side (either may be empty —
    cogroup delivers key-disjoint groups too); emits one row per rank
    up to the longer side, with the absent side's name NULL and its
    balance treated as 0 in the gap (the oracle's COALESCE)."""
    import pandas as pd

    la = left.sort_values("rnk").reset_index(drop=True)
    ra = right.sort_values("rnk").reset_index(drop=True)
    n = max(len(la), len(ra))
    if n == 0:  # defensive: cogroup never delivers two empty groups
        return pd.DataFrame(
            {
                "n_name": pd.array([], dtype="object"),
                "rnk": pd.array([], dtype="int64"),
                "cust_name": pd.array([], dtype="object"),
                "supp_name": pd.array([], dtype="object"),
                "bal_gap": pd.array([], dtype="float64"),
            }
        )
    key = la["n_name"].iat[0] if len(la) else ra["n_name"].iat[0]
    pad = n - len(la)
    cust = list(la["name"]) + [None] * pad
    cbal = list(la["bal"]) + [0.0] * pad
    pad = n - len(ra)
    supp = list(ra["name"]) + [None] * pad
    sbal = list(ra["bal"]) + [0.0] * pad
    return pd.DataFrame(
        {
            "n_name": [key] * n,
            "rnk": pd.array(range(1, n + 1), dtype="int64"),
            "cust_name": cust,
            "supp_name": supp,
            # raw IEEE subtraction — no rounding, so the value is
            # bit-identical to the oracle's (both engines subtract the
            # same parquet doubles)
            "bal_gap": [a - b for a, b in zip(cbal, sbal)],
        }
    )


def _align_arrow(left, right):
    """The same alignment on raw ``pyarrow.Table`` pairs (Spark 4
    ``applyInArrow`` — no pandas materialization on the worker). Sort
    and take stay in Arrow compute; the ≤2·K-row padding loop is plain
    Python on an already-pruned group."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def ordered(t):
        return t.take(pc.sort_indices(t, sort_keys=[("rnk", "ascending")]))

    lt, rt = ordered(left), ordered(right)
    n = max(lt.num_rows, rt.num_rows)
    if n == 0:  # defensive twin of _align_pandas' empty-both branch
        return pa.table(
            {
                "n_name": pa.array([], pa.string()),
                "rnk": pa.array([], pa.int64()),
                "cust_name": pa.array([], pa.string()),
                "supp_name": pa.array([], pa.string()),
                "bal_gap": pa.array([], pa.float64()),
            }
        )
    key = (
        lt.column("n_name")[0].as_py()
        if lt.num_rows
        else rt.column("n_name")[0].as_py()
    )

    def pad(t, col, fill):
        vals = t.column(col).to_pylist()
        return vals + [fill] * (n - len(vals))

    cbal = pad(lt, "bal", 0.0)
    sbal = pad(rt, "bal", 0.0)
    return pa.table(
        {
            "n_name": pa.array([key] * n, pa.string()),
            "rnk": pa.array(range(1, n + 1), pa.int64()),
            "cust_name": pa.array(pad(lt, "name", None), pa.string()),
            "supp_name": pa.array(pad(rt, "name", None), pa.string()),
            "bal_gap": pa.array(
                [a - b for a, b in zip(cbal, sbal)], pa.float64()
            ),
        }
    )


def _aligned(
    spark: SparkSession, sf_dir: str, kernel, arrow: bool
) -> DataFrame:
    cust = _ranked_side(
        spark, sf_dir, "customer", "c_name", "c_acctbal", "c_nationkey"
    )
    supp = _ranked_side(
        spark, sf_dir, "supplier", "s_name", "s_acctbal", "s_nationkey"
    )
    cg = cust.groupBy("n_name").cogroup(supp.groupBy("n_name"))
    applied = (
        cg.applyInArrow(kernel, _ALIGN_SCHEMA)
        if arrow
        else cg.applyInPandas(kernel, _ALIGN_SCHEMA)
    )
    return applied.orderBy("n_name", "rnk")


def cogroup_balance_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation positional alignment of the top-K customers vs top-K
    suppliers by account balance, via ``cogroup(...).applyInPandas``.
    A nation with no suppliers (present at sf0.001) exercises the
    one-sided-group contract; a shallower supplier book (4 < K at
    sf0.01) exercises the padded-rank rows."""
    return _aligned(spark, sf_dir, _align_pandas, arrow=False)


def cogroup_arrow_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cogroup(...).applyInArrow`` twin of ``cogroup_balance_align``
    — same oracle, bit-equal output required."""
    return _aligned(spark, sf_dir, _align_arrow, arrow=True)


def _stats_arrow(t):
    import pyarrow as pa
    import pyarrow.compute as pc

    b = t.column("bal")
    mm = pc.min_max(b)
    # exact linear-interpolated median — for even group sizes the mean
    # of the two middle values, the same definition DuckDB's MEDIAN
    # uses on quantitative types
    med = pc.quantile(b, q=0.5, interpolation="linear")[0].as_py()
    return pa.table(
        {
            "n_name": pa.array(
                [t.column("n_name")[0].as_py()], pa.string()
            ),
            "n_cust": pa.array([t.num_rows], pa.int64()),
            "min_bal": pa.array([mm["min"].as_py()], pa.float64()),
            "max_bal": pa.array([mm["max"].as_py()], pa.float64()),
            "median_bal": pa.array([med], pa.float64()),
        }
    )


def grouped_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation exact balance stats via ``GroupedData.applyInArrow``
    (single-input Arrow-native grouped map): count, min, max, and the
    EXACT median — the holistic statistic that justifies shipping the
    group to a kernel at all (count/min/max ride along for the oracle;
    a production pipeline computes those declaratively and reserves
    this cell for what Catalyst cannot express)."""
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    c = load_table(spark, sf_dir, "customer")
    grouped = (
        c.join(
            F.broadcast(nation), c["c_nationkey"] == nation["n_nationkey"]
        )
        .select("n_name", F.col("c_acctbal").alias("bal"))
        .groupBy("n_name")
    )
    return grouped.applyInArrow(_stats_arrow, _STATS_SCHEMA).orderBy(
        "n_name"
    )


_ALIGN_ORACLE = f"""
WITH c AS (
  SELECT n_name, c_name AS name, c_acctbal AS bal,
         row_number() OVER (
           PARTITION BY n_name ORDER BY c_acctbal DESC, c_name
         ) AS rnk
  FROM customer JOIN nation ON c_nationkey = n_nationkey
), s AS (
  SELECT n_name, s_name AS name, s_acctbal AS bal,
         row_number() OVER (
           PARTITION BY n_name ORDER BY s_acctbal DESC, s_name
         ) AS rnk
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
), ck AS (SELECT * FROM c WHERE rnk <= {TOP_K}),
   sk AS (SELECT * FROM s WHERE rnk <= {TOP_K})
SELECT COALESCE(ck.n_name, sk.n_name) AS n_name,
       CAST(COALESCE(ck.rnk, sk.rnk) AS BIGINT) AS rnk,
       ck.name AS cust_name,
       sk.name AS supp_name,
       COALESCE(ck.bal, 0) - COALESCE(sk.bal, 0) AS bal_gap
FROM ck FULL OUTER JOIN sk
  ON ck.n_name = sk.n_name AND ck.rnk = sk.rnk
ORDER BY n_name, rnk
"""

QUERIES = {
    "cogroup_balance_align": cogroup_balance_align,
    "cogroup_arrow_align": cogroup_arrow_align,
    "grouped_arrow_stats": grouped_arrow_stats,
}

ORACLES = {
    "cogroup_balance_align": _ALIGN_ORACLE,
    # the Arrow cogroup twin must reproduce the pandas entry exactly
    "cogroup_arrow_align": _ALIGN_ORACLE,
    "grouped_arrow_stats": """
    SELECT n_name,
           COUNT(*) AS n_cust,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           MEDIAN(c_acctbal) AS median_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
}
