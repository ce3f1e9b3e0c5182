"""Text-analysis operators over the `documents` table (north star:
language-ID, quality scoring, token counting, fingerprinting).

Everything here is Catalyst-only (regexp/array/aggregate expressions) —
no Python UDFs — so at 100 TB each operator is a single codegen'd scan
stage with map-side partial aggregation where grouped; per-doc outputs
shuffle nothing at all.

Shared tokenizer contract: functions/textfns.py (identical DuckDB SQL
fragments keep the oracle bit-compatible).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pim_orc_spark.catalog import load_table
from pim_orc_spark.plans import spread
from pim_orc_spark.functions.hashing import MOD, poly_hash, poly_hash_sql
from pim_orc_spark.functions.textfns import (
    STOPWORDS,
    stopword_hits,
    stopword_hits_sql,
    tokens,
    tokens_sql,
)

# BPE-ish token pattern: letter runs, digit runs, or single non-space
# symbols — constructs with identical Java-regex / RE2 semantics.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), aggregated per
    source: the per-corpus token-budget accounting query."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    ws = F.size(F.filter(F.split(F.col("text"), " +"), lambda x: x != F.lit("")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    return (
        d.select("source", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("bpe_tokens").alias("total_bpe_tokens"),
        )
        .orderBy("source")
    )


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, mean token length,
    stopword ratio, and a deterministic composite score — ratios of
    integers divided in double (bit-identical across engines)."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = tokens("text")
    n_tok = F.size(tok)
    total_len = F.aggregate(tok, F.lit(0), lambda a, x: a + F.length(x))
    sw = stopword_hits(tok, "en")
    # Explicit zero-token guard: both engines emit NULL ratios for an
    # empty document instead of relying on each engine's x/0 behavior.
    mean_len = F.when(n_tok > 0, total_len.cast("double") / n_tok)
    sw_ratio = F.when(n_tok > 0, sw.cast("double") / n_tok)
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    score = F.round(sw_ratio * 0.3 + len_score * 0.4 + F.lit(0.3), 6)
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        score.alias("quality_score"),
    )


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language ID heuristic: argmax of stoplist hits over
    {en,de,fr,es}, fixed priority order on ties, 'und' when zero hits."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = tokens("text")
    hits = {lang: stopword_hits(tok, lang) for lang in STOPWORDS}
    mx = F.greatest(*hits.values())
    pred = F.when(mx == 0, F.lit("und"))
    for lang in ("en", "de", "fr", "es"):  # fixed tie-break priority
        pred = pred.when(hits[lang] == mx, F.lit(lang))
    return d.select(
        "doc_id",
        "lang",
        pred.alias("pred_lang"),
        mx.alias("max_hits"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of the normalized text plus the
    31-polynomial rolling hash (functions/hashing.py) — the join key for
    exact dedup at scale."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    norm = F.concat_ws(" ", tokens("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("md5_fp"),
        poly_hash(norm).alias("roll_fp"),
    )


def _tok_sql() -> str:
    return tokens_sql("text")


SAMPLE_PCT = 10  # keep ~10% of documents


def text_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-gated sampling — the reproducible way to cut
    train/eval splits at 100 TB. ``df.sample`` draws from a
    partition-dependent RNG stream (unreproducible across engines,
    partitionings, and reruns); gating on a portable content hash
    (poly_hash of the doc id rendered as text, mod 100) keeps the SAME
    documents everywhere, forever, with no coordination. Map-only plan;
    per-source counts prove the gate is unbiased across strata."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    gate = poly_hash(F.col("doc_id").cast("string")) % 100 < SAMPLE_PCT
    return (
        d.filter(gate)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def text_median_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source median document length via a GROUPED_AGG pandas
    UDF — the Arrow-batched UDAF surface (§2.8). Exact medians aren't a
    Spark built-in (percentile_approx is a sketch); the group's values
    arrive as one pandas Series per group, so this is also the template
    for any custom per-group statistic. Group cardinality is the only
    scale bound (one group's values must fit an Arrow batch) — at
    100 TB, heavy groups switch to a two-pass count/offset median."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # a GROUPED_AGG pandas UDF cannot share an agg() with JVM aggregates
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        median_udaf("n_chars").alias("median_chars"),
    )


QUERIES = {
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_hash_sample": text_hash_sample,
    "text_median_len": text_median_len,
}


def _langid_sql() -> str:
    tok = _tok_sql()
    hit_exprs = {
        lang: stopword_hits_sql(tok, lang) for lang in STOPWORDS
    }
    mx = "greatest(" + ", ".join(f"h_{lang}" for lang in STOPWORDS) + ")"
    case = "CASE WHEN mx = 0 THEN 'und' " + " ".join(
        f"WHEN h_{lang} = mx THEN '{lang}'" for lang in ("en", "de", "fr", "es")
    ) + " END"
    hits_select = ", ".join(f"{e} AS h_{lang}" for lang, e in hit_exprs.items())
    return f"""
        WITH h AS (
          SELECT doc_id, lang, {hits_select} FROM documents
        ), m AS (
          SELECT doc_id, lang, h_en, h_de, h_fr, h_es, {mx} AS mx FROM h
        )
        SELECT doc_id, lang, {case} AS pred_lang, mx AS max_hits FROM m
    """


ORACLES = {
    "text_tokens": f"""
        SELECT source,
               COUNT(*) AS n_docs,
               -- DuckDB SUM(BIGINT) → HUGEINT; cast back to match Spark
               CAST(SUM(len(list_filter(regexp_split_to_array(text, ' +'), x -> x <> ''))) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT) AS total_bpe_tokens
        FROM documents GROUP BY source ORDER BY source
    """,
    "text_quality": f"""
        WITH t AS (
          SELECT doc_id, {_tok_sql()} AS tok FROM documents
        ), s AS (
          SELECT doc_id,
                 len(tok) AS n_tokens,
                 list_sum(list_transform(tok, x -> len(x))) AS total_len,
                 {stopword_hits_sql('tok', 'en')} AS sw
          FROM t
        )
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens > 0
                    THEN round(CAST(total_len AS DOUBLE) / n_tokens, 6) END
                 AS mean_token_len,
               CASE WHEN n_tokens > 0
                    THEN round(CAST(sw AS DOUBLE) / n_tokens, 6) END
                 AS stopword_ratio,
               CASE WHEN n_tokens > 0
                    THEN round((CAST(sw AS DOUBLE) / n_tokens) * 0.3
                               + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                               + 0.3, 6) END
                 AS quality_score
        FROM s
    """,
    "text_langid": _langid_sql(),
    "text_fingerprint": f"""
        WITH n AS (
          -- list_aggregate over an empty token list is NULL in DuckDB;
          -- Spark's concat_ws yields '' — coalesce to match
          SELECT doc_id,
                 coalesce(list_aggregate({_tok_sql()}, 'string_agg', ' '), '') AS norm
          FROM documents
        )
        SELECT doc_id, md5(norm) AS md5_fp,
               {poly_hash_sql('norm')} AS roll_fp
        FROM n
    """,
    "text_hash_sample": f"""
        SELECT source, COUNT(*) AS n_sampled,
               MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
        FROM documents
        WHERE ({poly_hash_sql("CAST(doc_id AS VARCHAR)")}) % 100 < {SAMPLE_PCT}
        GROUP BY source
    """,
    "text_median_len": """
        SELECT source,
               CAST(median(n_chars) AS DOUBLE) AS median_chars
        FROM documents GROUP BY source
    """,
}
