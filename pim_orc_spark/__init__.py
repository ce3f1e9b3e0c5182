"""pim_orc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (UBC-ECE-Sasha/PIM-ORC, studied read-only at
/root/reference/): partitioned columnar ORC scans, projection, NULL-aware
filtering, and partial/final aggregation (reference: orc-parser/reader.cc),
generalized to the full relational surface Spark provides, plus
LLM-training-data pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Design stance (SURVEY.md §7.0): declare logical plans with the
DataFrame/SQL API and let Catalyst + Tungsten pick physical strategy;
Pandas UDFs / applyInPandas only where built-ins cannot express the
semantics. Zero custom Catalyst rules are needed for reference parity.
"""

from pim_orc_spark.session import get_spark, ensure_parity_confs


def __getattr__(name: str):
    """Lazy re-exports of the first-class operator KERNELS — the
    user-facing API beyond the named queries (import cost of the
    operator modules is deferred so `import pim_orc_spark` stays
    cheap):

    - ``asof_join(left, right, key, left_ts, right_ts, value_cols)``
    - ``sessionize(df, key, ts, gap_seconds, order_cols=())``
    - ``salted_join(large, small, key, n_salts=8)``
    - ``minhash_pairs(spark, docs)`` — near-duplicate pairs, J ≥ 0.8
    - ``bfs_min_hops(spark, edges, source, max_hops)`` — min hop counts
    - ``triangle_counts(und)`` — per-node triangle membership
    """
    kernels = {
        "asof_join": ("pim_orc_spark.operators.relational", "asof_join"),
        "sessionize": ("pim_orc_spark.operators.relational", "sessionize"),
        "salted_join": (
            "pim_orc_spark.operators.relational",
            "salted_join",
        ),
        "minhash_pairs": ("pim_orc_spark.operators.dedup", "minhash_pairs"),
        "bfs_min_hops": (
            "pim_orc_spark.operators.relational",
            "bfs_min_hops",
        ),
        "triangle_counts": (
            "pim_orc_spark.operators.relational",
            "triangle_counts",
        ),
    }
    if name in kernels:
        import importlib

        mod, attr = kernels[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "get_spark",
    "ensure_parity_confs",
    "asof_join",
    "sessionize",
    "salted_join",
    "minhash_pairs",
    "bfs_min_hops",
    "triangle_counts",
]
__version__ = "0.1.0"
