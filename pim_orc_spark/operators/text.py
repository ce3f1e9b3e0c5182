"""Text-analysis operators over the `documents` table (north star:
language-ID, quality scoring, token counting, fingerprinting).

Everything here is Catalyst-only (regexp/array/aggregate expressions)
except the two deliberate Arrow-batched pandas_udf entries — the
GROUPED_AGG exact median (text_median_len) and the scalar NFC
normalizer (text_nfc_normalize, canonical composition has no JVM-side
function) — so at 100 TB each operator is a single codegen'd scan
stage with map-side partial aggregation where grouped; per-doc outputs
shuffle nothing at all.

Shared tokenizer contract: functions/textfns.py (identical DuckDB SQL
fragments keep the oracle bit-compatible).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# PII patterns — simple character-class regexes chosen to parse
# identically under Java regex (Spark) and RE2 (DuckDB): no
# lookarounds, no dialect-specific escapes.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{4}"


def _pii_raw_spark() -> F.Column:
    """Deterministic PII enrichment: every third document gets a
    synthetic contact line appended (the fixture corpus is clean word
    soup, so the redactor needs seeded positives to prove it fires —
    the oracle applies the IDENTICAL enrichment, so what's compared
    is the redaction, not the seeding)."""
    return F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII SCRUB — the redaction pass every training-data pipeline
    runs before packing: detect + replace emails and phone-shaped
    tokens, report per-document counts and the redacted length (the
    audit trail a compliance review asks for).

    All-JVM Catalyst hot path: regexp_count / regexp_replace are
    codegen'd string expressions — no Python, no shuffle; the operator
    is map-only at any corpus size (the 100 TB cost is exactly one
    scan). Counts are computed BEFORE replacement so the audit can't
    disagree with the scrub."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    raw = _pii_raw_spark()
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _PII_EMAIL, "<EMAIL>"),
        _PII_PHONE,
        "<PHONE>",
    )
    n_emails = F.regexp_count(raw, F.lit(_PII_EMAIL)).cast("long")
    n_phones = F.regexp_count(raw, F.lit(_PII_PHONE)).cast("long")
    return d.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        (n_emails + n_phones > 0).cast("int").alias("has_pii"),
        F.length(redacted).cast("long").alias("redacted_len"),
    )


_URL_RE = r"https?://([A-Za-z0-9.-]+)"
# C4-style blocklist: at production scale this is a multi-million-row
# relation (hence the JOIN below, not an IN-list literal)
_URL_BLOCKLIST = tuple(
    f"site{k}.example{j}.com" for k in (1, 4) for j in (0, 1, 2)
)


def _url_raw_spark() -> F.Column:
    """Deterministic URL enrichment (the fixture corpus has no URLs):
    every fourth document gets a synthetic link whose domain varies
    with doc_id — the oracle applies the identical enrichment."""
    return F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".com/page"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))


def text_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/DOMAIN BLOCKLIST FILTER — the C4-style provenance gate:
    extract each document's source domain, mark documents whose domain
    appears in a blocklist relation, report the per-source funnel
    (docs, with-URL, blocked, kept).

    100 TB shape: the domain extraction is one codegen'd
    regexp_extract (map-only); the blocklist check is a BROADCAST
    LEFT join against the blocklist RELATION — at production scale a
    blocklist is millions of domains maintained as a table, so the
    mechanism must be a join, not an inlined IN-list; Spark streams
    the corpus past the broadcast hash table with no shuffle of the
    documents. The final per-source aggregate is map-side combined."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    dom = F.regexp_extract(_url_raw_spark(), _URL_RE, 1)
    docs = d.select("doc_id", "source", dom.alias("domain"))
    bl = spark.createDataFrame(
        [(b,) for b in _URL_BLOCKLIST], "bad: string"
    )
    j = docs.join(
        F.broadcast(bl), docs.domain == bl.bad, "left"
    ).select(
        "source",
        (F.col("domain") != "").cast("int").alias("has_url"),
        F.col("bad").isNotNull().cast("int").alias("blocked"),
    )
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("has_url").cast("long").alias("n_with_url"),
        F.sum("blocked").cast("long").alias("n_blocked"),
        (F.count(F.lit(1)) - F.sum("blocked")).cast("long").alias("n_kept"),
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


def word_ngrams(tok: F.Column, n: int) -> F.Column:
    """Word n-grams of a token array: positions 1..size-n+1 joined with
    single spaces. Guarded with ``when`` because Spark's ``sequence(1,
    0)`` DESCENDS ([1, 0]) instead of returning empty — an unguarded
    short document would emit junk grams."""
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams_sql(tok_expr: str, n: int) -> str:
    """DuckDB fragment producing the identical word n-gram list
    (range() is end-exclusive; list_slice is 1-based inclusive)."""
    return (
        f"CASE WHEN len({tok_expr}) >= {n} THEN "
        f"list_transform(range(1, len({tok_expr}) - {n - 2}), "
        f"i -> array_to_string(list_slice({tok_expr}, i, i + {n - 1}), ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


NGRAM_TOP_K = 25


def text_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-k word bigrams/trigrams — the boilerplate /
    template-text detector a training-data pipeline runs before dedup
    (repeated high-frequency n-grams flag scraped navigation chrome,
    license headers, SEO spam).

    Scale shape: one scan; both gram sizes are generated in a single
    ``explode`` (an array of (n, gram) structs per doc), counted with
    map-side partial aggregation on (n, gram), and the final top-k per n
    ranks only the distinct-gram table — the full gram stream is never
    shuffled row-per-gram without combining first. Tokens are let-bound
    through a select so the tokenizer runs once per row, not once per
    gram (see char_ngrams)."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    t = d.select(tokens("text").alias("tok"))
    def _tag(n: int):
        # single-argument lambda: a two-arg one would be given
        # (element, INDEX) by F.transform and shadow n with the index
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("ngram"))

    tagged = F.concat(
        *[F.transform(word_ngrams(F.col("tok"), n), _tag(n)) for n in (2, 3)]
    )
    w = Window.partitionBy("n").orderBy(
        F.col("cnt").desc(), F.col("ngram").asc()
    )
    return (
        t.select(F.explode(tagged).alias("s"))
        .select("s.n", "s.ngram")
        .groupBy("n", "ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= NGRAM_TOP_K)
    )


BENCH_MOD = 50  # doc_id % 50 == 0 → the "benchmark" (eval-set) documents


def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: which corpus documents contain
    an eval-set document's content? For each (corpus doc, benchmark doc)
    pair, containment = |shared distinct word trigrams| / |benchmark
    trigrams|; pairs at ≥ 0.5 are flagged (the fixture corpus separates
    cleanly: true contaminations sit at 1.0, background overlap ≤ 0.08).
    The threshold compares integers (2·n_shared ≥ n_bench), never a
    rounded float at the boundary.

    Scale shape — the decontamination pattern for a 100 TB corpus vs a
    bounded eval suite: the benchmark postings list (bench_id, gram) is
    BROADCAST (eval suites are MBs), so corpus postings never shuffle —
    the map-side join emits only matching (doc, bench, gram) hits, and
    the only shuffle is the count aggregation on (doc_id, bench_id),
    bounded by true-overlap volume. n_bench joins in as a second
    broadcast. No all-pairs stage exists at any size."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    tri = d.select(
        "doc_id",
        F.array_distinct(
            word_ngrams(tokens("text"), 3)
        ).alias("g"),
    )
    bench = tri.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), F.explode("g").alias("gram")
    )
    n_bench = bench.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_bench")
    )
    corpus = tri.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        "doc_id", F.explode("g").alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(F.broadcast(n_bench), "bench_id")
        .filter(F.col("n_shared") * 2 >= F.col("n_bench"))
        .select(
            "doc_id",
            "bench_id",
            "n_shared",
            "n_bench",
            F.round(
                F.col("n_shared") / F.col("n_bench").cast("double"), 6
            ).alias("containment"),
        )
    )


CHUNK_SIZE = 200  # characters per chunk
CHUNK_STRIDE = 150  # CHUNK_SIZE - 50 overlap between consecutive chunks


def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking — fixed-size character windows with overlap,
    the standard prep step before embedding / tokenizing long documents
    for training. Chunk starts advance by ``CHUNK_STRIDE`` (50-char
    overlap keeps sentences that straddle a boundary intact in one of
    the two neighbors); the final chunk is short rather than padded.

    Scale shape: pure map-side generate (one codegen'd scan stage, no
    shuffle at all) — each doc expands to ceil(len/stride) rows
    independently, so it parallelizes per input split at any corpus
    size. Chunk content is attested by md5 + length; downstream
    pipelines would carry the substring itself.
    """
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    chunks = F.expr(
        f"transform(sequence(1, greatest(n_chars, 1), {CHUNK_STRIDE}), "
        f"o -> substr(text, o, {CHUNK_SIZE}))"
    )
    return d.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk")
    ).select(
        "doc_id",
        "chunk_idx",
        F.length("chunk").alias("chunk_len"),
        F.md5(F.col("chunk")).alias("chunk_md5"),
    )


PACK_BUDGET = 512  # BPE-ish tokens per pack


def text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — concat-and-split pack assignment: documents
    are laid out as one token stream per source (doc_id order) and each
    doc joins the pack its first token lands in (pack = ``floor(stream
    offset / PACK_BUDGET)``) — the GPT-style packing layout that turns
    ragged documents into fixed-budget training rows without padding.
    Returns per-pack occupancy (doc count, token total, doc_id range).

    Scale shape: one running-sum window partitioned by source (packs
    are per-source streams, so sources pack in parallel) + one grouped
    aggregation. Within a source the running sum is a sequential
    prefix-scan; at 100 TB the stream key widens to (source, shard) so
    no single partition owns a whole source — the assignment stays
    deterministic because shard boundaries, like source boundaries,
    start a fresh pack."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = d.select("source", "doc_id", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    pack = F.floor((F.col("cum") - F.col("n_tok")) / PACK_BUDGET)
    return (
        t.withColumn("pack_id", pack)
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
    )


ABBREVIATIONS = ("dr", "mr", "mrs", "e.g", "i.e", "etc")


def split_sentences(text: str) -> list[str]:
    """Imperative sentence splitter: break after [.!?] + space, except
    when the period terminates a known abbreviation — the lookbehind
    state that makes this a poor fit for a single regex and a natural
    fit for a UDTF. Pure function shared by the Spark UDTF and the
    test's reference implementation."""
    out, start, i, n = [], 0, 0, len(text)
    while i < n:
        if text[i] in ".!?" and i + 1 < n and text[i + 1] == " ":
            word = text[start:i].rsplit(" ", 1)[-1].lower()
            if not (text[i] == "." and word in ABBREVIATIONS):
                seg = text[start : i + 1].strip()
                if seg:
                    out.append(seg)
                start = i + 1
        i += 1
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    return out


def text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation via a PYTHON UDTF — the table-function
    corner of the §2.8 UDx matrix (grouped-agg pandas UDF, mapInPandas,
    applyInPandasWithState cover the others). One input row fans out to
    one row per sentence through ``lateralJoin``; the splitter keeps
    imperative abbreviation state a single regex can't.

    Scale: a UDTF evaluates per-row in Python — the slow path by this
    repo's own rules — so it is the right tool only when the fan-out
    logic is genuinely imperative (here) or needs per-call state;
    bulk-vectorizable fan-out belongs in mapInPandas (see
    multimodal_frame_sample) or Catalyst posexplode (text_chunk). No
    SQL oracle by nature (the abbreviation lookbehind is not
    SQL-expressible); the pytest compares against the shared pure-
    Python reference row-for-row, and the driver runs a rows-only
    check."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(split_sentences(text)):
                yield i, s, len(s)

    spark.udtf.register("sentence_split", SentenceSplit)
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    d.select("doc_id", "text").createOrReplaceTempView("docs_for_sentences")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM docs_for_sentences d, LATERAL sentence_split(d.text) s
        """
    )


def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document sentence statistics THROUGH the UDTF — the
    oracle-checkable projection of ``text_sentences`` (r5 verdict #3:
    after five rounds the §2.8 UDTF surface had no green driver row
    because the per-sentence export is oracle-less by nature). The
    plan still contains the LATERAL UDTF eval — the Python splitter
    runs for every document — but the exported columns are per-doc
    scalars (count / total chars / max chars), which ARE
    SQL-expressible: the abbreviation lookbehind the row-level split
    needs becomes, at the aggregate level, a length-preserving
    protection rewrite (each abbreviation's final period swapped for
    a sentinel via one non-lookaround regex, exploiting that a
    protected period was never a split point) followed by an ordinary
    regex split. Docs that yield zero sentences drop out through the
    inner lateral join in both engines.

    Scale: identical to ``text_sentences`` — the UDTF is the one
    justified per-row Python path, and the added per-doc aggregate is
    a map-side-partial HashAggregate on the already-partitioned
    doc_id."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, s in enumerate(split_sentences(text)):
                yield i, s, len(s)

    spark.udtf.register("sentence_split_stats", SentenceSplit)
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    d.select("doc_id", "text").createOrReplaceTempView(
        "docs_for_sentence_stats"
    )
    return spark.sql(
        """
        SELECT d.doc_id,
               COUNT(*) AS n_sentences,
               CAST(SUM(s.n_chars) AS BIGINT) AS total_sent_chars,
               CAST(MAX(s.n_chars) AS BIGINT) AS max_sent_chars
        FROM docs_for_sentence_stats d,
             LATERAL sentence_split_stats(d.text) s
        GROUP BY d.doc_id
        """
    )


def text_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source z-score of document length via GROUPED-MAP
    ``applyInPandas`` — the remaining corner of the §2.8 UDx matrix
    (grouped-agg pandas UDF, mapInPandas, applyInPandasWithState, and
    the UDTF cover the others). The whole group arrives as one pandas
    frame, is normalized vectorized, and returns row-per-row — the
    template for per-group logic that needs the full group (fitting a
    per-key model, rank-based transforms).

    This particular statistic IS window-expressible, which is exactly
    what makes it oracle-checkable (the SQL form is the oracle); a
    production plan would prefer the Catalyst window for it and reserve
    grouped-map for group-wise logic SQL can't express. Scale bound:
    one group must fit an Arrow batch — the same contract as
    ``text_median_len``, with the same two-pass fallback for heavy
    groups. Single-doc / zero-variance groups yield NULL in both
    engines (never NaN, which would hash-diverge)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["n_chars"].astype("float64")
        sd = v.std()  # ddof=1 == stddev_samp
        if pd.isna(sd) or sd == 0.0:
            # Nullable Float64 with pd.NA makes the NULL intent explicit
            # in the Arrow frame itself (a float64 NaN would also reach
            # Spark as NULL, but only via the serializer's NaN-as-null
            # coercion — an implicit dependency).
            z = pd.array([pd.NA] * len(v), dtype="Float64")
        else:
            z = ((v - v.mean()) / sd).round(6)
        return pdf.assign(z=z)

    return d.groupBy("source").applyInPandas(
        normalize, "doc_id long, source string, n_chars long, z double"
    )


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals — the standard filter for
    degenerate generated/boilerplate text: distinct-token ratio and the
    share of the single most frequent token.

    Plan: explode tokens → ONE groupBy (doc_id, token) with map-side
    combine → ONE groupBy doc_id folding count/sum/max. Shuffles carry
    (doc_id, token, partial count) — never document bodies — and both
    aggregates are codegen HashAggregates, so the operator is two
    skinny shuffles at any corpus size."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    tok_counts = (
        d.select("doc_id", F.explode(tokens("text")).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        tok_counts.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_count") / F.col("n_tokens"), 6).alias(
                "top_token_share"
            ),
        )
    )


IDF_SMOOTH = 1.0  # add-one smoothing: idf = ln((N+1)/(df+1))


def _idf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, df, idf) over the corpus: document frequency counts one
    hit per (doc, distinct token) — map-side combined — and the corpus
    size N joins in as a broadcast single-row aggregate (no eager
    driver count, the plan stays lazy)."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    doc_tokens = d.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    df_counts = doc_tokens.groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    return df_counts.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.round(
            F.log((F.col("n_docs") + IDF_SMOOTH) / (F.col("df") + IDF_SMOOTH)),
            6,
        ).alias("idf"),
    )


def text_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus IDF table — the shared statistic behind tf-idf scoring,
    rare-token quality filters, and keyword extraction. The vocabulary
    is bounded (tokens, not n-grams), so the result is a broadcastable
    dimension any downstream stage can join map-side."""
    return _idf_table(spark, sf_dir)


TFIDF_TOPK = 3


def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k salient tokens per document by tf-idf — keyword extraction
    as one pipeline: tf via grouped count, idf derived FROM the same tf
    aggregate (one (doc, token) row per distinct token per doc, so
    grouping it by token IS the document frequency — the corpus is
    tokenized and exploded exactly once, not once per statistic) and
    broadcast-joined back, rank via a doc-partitioned window. N comes
    from a column-pruned count of the documents table (it must include
    token-less documents, which never reach tf). Ordering is pinned
    cross-engine: score ROUNDED to 6 dp first, then token — a
    raw-double sort key could flip ranks on a final-ulp difference
    between engines."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    idf = df_counts.crossJoin(F.broadcast(n_docs)).select(
        "token",
        F.round(
            F.log((F.col("n_docs") + IDF_SMOOTH) / (F.col("df") + IDF_SMOOTH)),
            6,
        ).alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.col("idf"), 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "rank", "token", "score")
    )


LM_MIN_COUNT = 2  # model prune: drop singleton bigrams (the long tail)
LM_VOCAB_CAP = 65536  # HARD cap on model rows: top-V by (count, bg)
# Unseen-bigram backoff: ln(1e-7) in micro-nats, the shared literal
# floor both engines add for any doc bigram outside the pruned model
LM_UNSEEN_MICRO = -16_118_096


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram language-model score per document — the
    perplexity-proxy quality filter (KenLM-style) of production
    curation pipelines: documents whose token transitions are unusual
    for the corpus score low and get culled.

    Model: P(w2|w1) = c(w1 w2) / c(w1·) from corpus bigram counts,
    PRUNED the way real KenLM pipelines prune — singleton bigrams
    (c2 < LM_MIN_COUNT) are dropped, then a hard top-LM_VOCAB_CAP cap
    by (count DESC, bg ASC) bounds the model at 65,536 rows no matter
    the corpus size; any doc bigram outside the model scores the
    shared unseen floor LM_UNSEEN_MICRO (ln 1e-7). Determinism: each
    surviving bigram's log-prob is quantized ONCE to integer
    micro-nats (round(ln p × 1e6)), the floor is an integer literal,
    so the per-doc mean is an exact integer sum ÷ count —
    order-independent — and the cap's total order (count, bg) is
    tie-free.

    Scale shape: the broadcast model is provably O(LM_VOCAB_CAP) — the
    prune runs on the aggregated count table and the cap is a
    distributed TakeOrderedAndProject (per-partition partial top-V,
    merge of V-row slices), never a single-partition global sort; the
    c1 join broadcasts the ≤cap-row capped side, not the unbounded
    unigram table. Scoring is one explode + bounded broadcast LEFT
    join + groupBy doc — two corpus passes total (model + score),
    both linear. Docs with < 2 tokens have no bigrams and are
    excluded by contract (both engines)."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    tok = tokens("text")
    with_tok = d.select("doc_id", tok.alias("tok")).filter(
        F.size("tok") >= 2
    )
    bigrams = with_tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(tok) - 1), "
                "i -> concat(element_at(tok, i), ' ', element_at(tok, i + 1)))"
            )
        ).alias("bg"),
    )
    c2 = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    # prune + cap: orderBy().limit() plans TakeOrderedAndProject
    # (distributed partial top-V), and (c2 DESC, bg ASC) is a total
    # order so the capped set is deterministic across engines
    capped = (
        c2.filter(F.col("c2") >= LM_MIN_COUNT)
        .orderBy(F.col("c2").desc(), F.col("bg").asc())
        .limit(LM_VOCAB_CAP)
    )
    c1 = (
        bigrams.select(F.substring_index("bg", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    model = (
        c1.join(
            F.broadcast(
                capped.withColumn("w1", F.substring_index("bg", " ", 1))
            ),
            "w1",
        )
        .select(
            "bg",
            F.round(F.log(F.col("c2") / F.col("c1")) * 1e6)
            .cast("long")
            .alias("micro_ln_p"),
        )
    )
    return (
        bigrams.join(F.broadcast(model), "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(
                    F.coalesce(
                        F.col("micro_ln_p"), F.lit(LM_UNSEEN_MICRO)
                    )
                )
                / (F.count(F.lit(1)) * 1e6),
                6,
            ).alias("lm_score"),
        )
    )


MIX_TOKEN_BUDGET = 600  # per-source token target after rebalancing
MIX_GATE_MOD = 1_000_000  # hash-gate resolution (micro-rate units)


def text_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-rebalancing sampler — the data-MIXING step of a training
    run: each source is downsampled toward a per-source token budget
    (mixture weights), so over-represented sources stop dominating the
    mixture. The keep decision is a deterministic hash gate (same
    poly_hash contract as ``text_hash_sample``): rate_micro =
    min(1e6, 1e6 × budget ÷ source_tokens) in EXACT integer division,
    and a doc survives iff hash(doc_id) mod 1e6 < its source's
    rate_micro — reproducible across engines, partitionings, and
    reruns, no RNG stream.

    Scale shape: one map-side-partial aggregate computes per-source
    token totals (|sources| rows), the micro-rates broadcast back onto
    the corpus, and the gate is map-only — two linear passes, no
    corpus shuffle. At 100 TB the rates table is exactly the mixture
    config artifact a production run ships; computing it in-engine
    keeps the weights consistent with the corpus actually present."""
    d = spread(spark, load_table(spark, sf_dir, "documents"))
    per_doc = d.select(
        "doc_id", "source", F.size(tokens("text")).alias("n_tok")
    )
    totals = per_doc.groupBy("source").agg(
        F.sum("n_tok").alias("source_tokens")
    )
    rates = totals.select(
        "source",
        F.least(
            F.lit(MIX_GATE_MOD).cast("long"),
            F.expr(
                f"CAST({MIX_GATE_MOD * MIX_TOKEN_BUDGET} AS BIGINT)"
                " div source_tokens"
            ),
        ).alias("rate_micro"),
    )
    # Gate input is SALTED AND PADDED ("mix:<id>:gate"), not the bare
    # id string: poly_hash of a short string never wraps the 2^31-1
    # modulus (a 3-digit id hashes below ~55k), so `% 1e6` on the bare
    # id would pass everything. The fixed affix guarantees ≥ 9 folded
    # chars — the hash wraps several times and the low 6 decimal
    # digits mix.
    gate_key = F.concat(
        F.lit("mix:"), F.col("doc_id").cast("string"), F.lit(":gate")
    )
    kept = per_doc.join(F.broadcast(rates), "source").filter(
        poly_hash(gate_key) % MIX_GATE_MOD < F.col("rate_micro")
    )
    return kept.groupBy("source").agg(
        F.min("rate_micro").alias("rate_micro"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_tok").cast("long").alias("tokens_kept"),
    )


# Combining-mark suffix for the NFC fixture: three decomposed pairs
# (a+grave, e+acute, o+circumflex) that NFC composes to single
# codepoints — appended because the synthetic corpus is pure ASCII
# (where normalization is the identity and would test nothing).
NFC_SUFFIX = "àéô"


def text_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNICODE NFC NORMALIZATION via a SCALAR Arrow ``pandas_udf`` —
    the text-cleaning step every multilingual corpus runs BEFORE
    fingerprinting (decomposed "e + combining acute" and precomposed
    "é" are different byte strings, so un-normalized text defeats
    exact dedup and span matching). Canonical composition is not
    expressible in Catalyst (no JVM-side normalizer function), which
    makes this the §2.8 matrix's scalar-pandas_udf cell: a
    one-column-in/one-column-out vectorized kernel
    (``unicodedata.normalize`` per Arrow batch), unlike the GROUPED_AGG
    (text_median_len), applyInPandas (stream state), mapInPandas
    (codecs), and UDTF (sentences) entries.

    The fixture corpus is ASCII, so each doc gets a deterministic
    decomposed suffix (doc_id % 3 + 1 repeats of three combining-mark
    pairs); the oracle recomputes with DuckDB's ``nfc_normalize`` —
    both implement the same Unicode canonical-composition tables, so
    codepoint lengths and change flags must agree exactly.

    Plan: map-only — Project (suffix build, JVM) → ArrowEvalPython
    (normalize) → Project (codepoint lengths, JVM); no shuffle."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(col: pd.Series) -> pd.Series:
        import unicodedata

        return col.map(lambda s: unicodedata.normalize("NFC", s))

    d = spread(spark, load_table(spark, sf_dir, "documents"))
    s = F.concat(
        F.col("text"),
        F.expr(f"repeat('{NFC_SUFFIX}', 1 + doc_id % 3)"),
    )
    return d.select(
        "doc_id", s.alias("s"), nfc(s).alias("n")
    ).select(
        "doc_id",
        F.length("s").cast("long").alias("len_before"),
        F.length("n").cast("long").alias("len_after"),
        (F.col("s") != F.col("n")).cast("long").alias("changed"),
    )


_NFC_SQL = """
WITH s AS (
  SELECT doc_id,
         text || repeat('a' || chr(768) || 'e' || chr(769)
                        || 'o' || chr(770), 1 + doc_id % 3) AS s
  FROM documents
)
SELECT doc_id,
       CAST(length(s) AS BIGINT) AS len_before,
       CAST(length(nfc_normalize(s)) AS BIGINT) AS len_after,
       CAST(CASE WHEN nfc_normalize(s) <> s THEN 1 ELSE 0 END AS BIGINT)
         AS changed
FROM s
"""


QUERIES = {
    "text_tokens": text_tokens,
    "text_nfc_normalize": text_nfc_normalize,
    "text_source_mix": text_source_mix,
    "text_lm_score": text_lm_score,
    "text_repetition": text_repetition,
    "text_idf": text_idf,
    "text_tfidf_topk": text_tfidf_topk,
    "text_quality": text_quality,
    "text_pii_redact": text_pii_redact,
    "text_url_filter": text_url_filter,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "text_hash_sample": text_hash_sample,
    "text_median_len": text_median_len,
    "text_ngram_topk": text_ngram_topk,
    "text_contamination": text_contamination,
    "text_chunk": text_chunk,
    "text_pack": text_pack,
    # no ORACLES entry (abbreviation lookbehind is not SQL-expressible):
    # tests compare row-for-row against the shared split_sentences
    # reference; a driver export would run as a rows-only check
    "text_sentences": text_sentences,
    "text_sentence_stats": text_sentence_stats,
    "text_zscore": text_zscore,
}


def _sentence_stats_sql() -> str:
    """Aggregate-level oracle for the sentence splitter.

    The splitter's rule — break after [.!?]+space unless the period
    ends a whole abbreviation word — is not RE2-expressible per row
    (no lookbehind), but the per-doc AGGREGATES are: (1) PROTECT each
    abbreviation's sentence-final period by swapping it for chr(1)
    (length-preserving, so character counts survive; the leading
    `(^| )` anchor replicates the splitter's whole-last-word check,
    and consuming the LEADING space never starves a following match
    because the pattern leaves its trailing context unread); (2)
    split on '[.!?] '; (3) each non-tail fragment is the Python
    segment minus its leading space and trailing punct, so its
    stripped length is len(ltrim(frag)) + 1; the tail fragment is
    compared fully trimmed. Python's str.strip() maps to the explicit
    ' \\t\\n\\r' trim set (fixture text is ASCII)."""
    ws = "' ' || chr(9) || chr(10) || chr(13)"
    return f"""
        WITH prot AS (
          SELECT doc_id,
                 regexp_replace(
                   text, '(^| )(mrs|mr|dr|e\\.g|i\\.e|etc)\\.',
                   '\\1\\2' || chr(1), 'gi') AS t
          FROM documents
        ), parts AS (
          SELECT doc_id, regexp_split_to_array(t, '[.!?] ') AS arr
          FROM prot
        ), lens AS (
          SELECT doc_id,
                 list_transform(arr[1:len(arr) - 1],
                                x -> len(ltrim(x, {ws})) + 1) AS body_lens,
                 len(trim(arr[len(arr)], {ws})) AS tail_len
          FROM parts
        ), stats AS (
          SELECT doc_id,
                 len(body_lens)
                   + CASE WHEN tail_len > 0 THEN 1 ELSE 0 END
                   AS n_sentences,
                 CAST(coalesce(list_sum(body_lens), 0)
                   + CASE WHEN tail_len > 0 THEN tail_len ELSE 0 END
                   AS BIGINT) AS total_sent_chars,
                 CAST(greatest(
                   coalesce(list_max(body_lens), 0),
                   CASE WHEN tail_len > 0 THEN tail_len ELSE 0 END)
                   AS BIGINT) AS max_sent_chars
          FROM lens
        )
        SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
               total_sent_chars, max_sent_chars
        FROM stats WHERE n_sentences > 0
    """


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


def _idf_sql() -> str:
    return f"""
        tok AS (
          SELECT doc_id, unnest(list_distinct({_tok_sql()})) AS token
          FROM documents
        ), n AS (
          SELECT COUNT(*) AS n_docs FROM documents
        ), idf AS (
          SELECT token, COUNT(*) AS df,
                 round(ln((n_docs + {IDF_SMOOTH}) / (COUNT(*) + {IDF_SMOOTH})), 6) AS idf
          FROM tok, n GROUP BY token, n_docs
        )
    """


ORACLES = {
    "text_lm_score": f"""
        WITH t AS (
          SELECT doc_id, {_tok_sql()} AS tok FROM documents
        ), bg AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(tok)),
                        i -> tok[i] || ' ' || tok[i + 1])) AS bg
          FROM t WHERE len(tok) >= 2
        ), c2 AS (
          SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg
        ), capped AS (
          SELECT bg, c2 FROM c2 WHERE c2 >= {LM_MIN_COUNT}
          QUALIFY row_number() OVER (ORDER BY c2 DESC, bg ASC)
                    <= {LM_VOCAB_CAP}
        ), c1 AS (
          SELECT split_part(bg, ' ', 1) AS w1, COUNT(*) AS c1
          FROM bg GROUP BY 1
        ), model AS (
          SELECT capped.bg,
                 CAST(round(ln(CAST(capped.c2 AS DOUBLE) / c1.c1) * 1e6)
                      AS BIGINT) AS micro_ln_p
          FROM capped JOIN c1 ON split_part(capped.bg, ' ', 1) = c1.w1
        )
        SELECT b.doc_id,
               COUNT(*) AS n_bigrams,
               round(CAST(SUM(coalesce(m.micro_ln_p, {LM_UNSEEN_MICRO}))
                          AS DOUBLE)
                     / (COUNT(*) * 1e6), 6) AS lm_score
        FROM bg b LEFT JOIN model m ON b.bg = m.bg
        GROUP BY b.doc_id
    """,
    "text_repetition": f"""
        WITH tc AS (
          SELECT doc_id, t, COUNT(*) AS c
          FROM (SELECT doc_id, unnest({_tok_sql()}) AS t FROM documents)
          GROUP BY doc_id, t
        )
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               round(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_ratio,
               round(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6) AS top_token_share
        FROM tc GROUP BY doc_id
    """,
    "text_idf": f"""
        WITH {_idf_sql()}
        SELECT token, df, idf FROM idf
    """,
    "text_tfidf_topk": f"""
        WITH {_idf_sql()}, tf AS (
          SELECT doc_id, token, COUNT(*) AS tf
          FROM (SELECT doc_id, unnest({_tok_sql()}) AS token FROM documents)
          GROUP BY doc_id, token
        ), scored AS (
          SELECT tf.doc_id, tf.token, round(tf.tf * idf.idf, 6) AS score
          FROM tf JOIN idf USING (token)
        ), ranked AS (
          SELECT doc_id, token, score,
                 CAST(row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, token) AS INT) AS rank
          FROM scored
        )
        SELECT doc_id, rank, token, score FROM ranked
        WHERE rank <= {TFIDF_TOPK}
    """,
    "text_nfc_normalize": _NFC_SQL,
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
    # same enrichment as _url_raw_spark; blocklist as a VALUES relation
    "text_url_filter": f"""
        WITH raw AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 4 = 0
                      THEN text || ' see https://site' || (doc_id % 7)
                           || '.example' || (doc_id % 3)
                           || '.com/page' || doc_id
                      ELSE text END AS t
          FROM documents
        ), d AS (
          SELECT doc_id, source,
                 regexp_extract(t, 'https?://([A-Za-z0-9.-]+)', 1)
                   AS domain
          FROM raw
        ), bl AS (
          SELECT * FROM (VALUES
            {", ".join(f"('{b}')" for b in _URL_BLOCKLIST)}
          ) b(bad)
        ), j AS (
          SELECT d.source,
                 CASE WHEN d.domain <> '' THEN 1 ELSE 0 END AS has_url,
                 CASE WHEN bl.bad IS NOT NULL THEN 1 ELSE 0 END
                   AS blocked
          FROM d LEFT JOIN bl ON d.domain = bl.bad
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(has_url) AS BIGINT) AS n_with_url,
               CAST(SUM(blocked) AS BIGINT) AS n_blocked,
               CAST(COUNT(*) - SUM(blocked) AS BIGINT) AS n_kept
        FROM j GROUP BY source
    """,
    # same deterministic enrichment as _pii_raw_spark, so the compared
    # surface is the redaction; 'g' flag = Spark's replace-all default
    "text_pii_redact": f"""
        WITH raw AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0
                      THEN text || ' contact user' || doc_id
                           || '@example.com call 555-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE text END AS raw
          FROM documents
        ), counted AS (
          SELECT doc_id,
                 CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}'))
                      AS BIGINT) AS n_emails,
                 CAST(len(regexp_extract_all(raw, '{_PII_PHONE}'))
                      AS BIGINT) AS n_phones,
                 regexp_replace(
                   regexp_replace(raw, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g') AS redacted
          FROM raw
        )
        SELECT doc_id, n_emails, n_phones,
               CAST(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END
                    AS INTEGER) AS has_pii,
               CAST(length(redacted) AS BIGINT) AS redacted_len
        FROM counted
    """,
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
    "text_source_mix": f"""
        WITH per_doc AS (
          SELECT doc_id, source, len({_tok_sql()}) AS n_tok
          FROM documents
        ), totals AS (
          SELECT source, CAST(SUM(n_tok) AS BIGINT) AS source_tokens
          FROM per_doc GROUP BY source
        ), rates AS (
          SELECT source,
                 least(CAST({MIX_GATE_MOD} AS BIGINT),
                       CAST({MIX_GATE_MOD * MIX_TOKEN_BUDGET} AS BIGINT)
                         // source_tokens) AS rate_micro
          FROM totals
        ), kept AS (
          SELECT p.source, p.n_tok, r.rate_micro
          FROM per_doc p JOIN rates r ON p.source = r.source
          WHERE ({poly_hash_sql("('mix:' || CAST(p.doc_id AS VARCHAR) || ':gate')")})
                  % {MIX_GATE_MOD} < r.rate_micro
        )
        SELECT source, MIN(rate_micro) AS rate_micro,
               COUNT(*) AS n_kept,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
        FROM kept GROUP BY source
    """,
    "text_median_len": """
        SELECT source,
               CAST(median(n_chars) AS DOUBLE) AS median_chars
        FROM documents GROUP BY source
    """,
    "text_ngram_topk": f"""
        WITH t AS (SELECT {_tok_sql()} AS tok FROM documents),
        g AS (
          SELECT 2 AS n, unnest({word_ngrams_sql('tok', 2)}) AS ngram FROM t
          UNION ALL
          SELECT 3 AS n, unnest({word_ngrams_sql('tok', 3)}) AS ngram FROM t
        ), c AS (
          SELECT n, ngram, COUNT(*) AS cnt FROM g GROUP BY n, ngram
        ), r AS (
          SELECT n, ngram, cnt,
                 CAST(row_number() OVER (
                   PARTITION BY n ORDER BY cnt DESC, ngram ASC
                 ) AS INTEGER) AS rnk
          FROM c
        )
        SELECT n, ngram, cnt, rnk FROM r WHERE rnk <= {NGRAM_TOP_K}
    """,
    "text_chunk": f"""
        WITH c AS (
          SELECT doc_id,
                 list_transform(range(1, greatest(n_chars, 1) + 1,
                                      {CHUNK_STRIDE}),
                                o -> substr(text, CAST(o AS INTEGER),
                                            {CHUNK_SIZE})) AS chunks
          FROM documents
        )
        SELECT doc_id,
               CAST(generate_subscripts(chunks, 1) - 1 AS INTEGER)
                 AS chunk_idx,
               CAST(len(unnest(chunks)) AS INTEGER) AS chunk_len,
               md5(unnest(chunks)) AS chunk_md5
        FROM c
    """,
    "text_pack": f"""
        WITH t AS (
          SELECT source, doc_id,
                 len(regexp_extract_all(text, '{BPE_RE}')) AS n_tok
          FROM documents
        ), c AS (
          SELECT source, doc_id, n_tok,
                 SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
          FROM t
        )
        SELECT source,
               CAST(floor((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT)
                 AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS pack_tokens,
               MIN(doc_id) AS first_doc_id,
               MAX(doc_id) AS last_doc_id
        FROM c GROUP BY source, pack_id
    """,
    "text_sentence_stats": _sentence_stats_sql(),
    "text_zscore": """
        SELECT doc_id, source, n_chars,
               CASE WHEN stddev_samp(n_chars) OVER w IS NULL
                      OR stddev_samp(n_chars) OVER w = 0 THEN NULL
                    ELSE round((n_chars - avg(n_chars) OVER w)
                               / stddev_samp(n_chars) OVER w, 6)
               END AS z
        FROM documents WINDOW w AS (PARTITION BY source)
    """,
    "text_contamination": f"""
        WITH tri AS (
          SELECT doc_id,
                 list_distinct({word_ngrams_sql(_tok_sql(), 3)}) AS g
          FROM documents
        ),
        b AS (
          SELECT doc_id AS bench_id, unnest(g) AS gram FROM tri
          WHERE doc_id % {BENCH_MOD} = 0
        ),
        nb AS (SELECT bench_id, COUNT(*) AS n_bench FROM b GROUP BY bench_id),
        c AS (
          SELECT doc_id, unnest(g) AS gram FROM tri
          WHERE doc_id % {BENCH_MOD} <> 0
        ),
        sh AS (
          SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
          FROM c JOIN b USING (gram) GROUP BY c.doc_id, b.bench_id
        )
        SELECT doc_id, bench_id, n_shared, n_bench,
               round(n_shared / CAST(n_bench AS DOUBLE), 6) AS containment
        FROM sh JOIN nb USING (bench_id)
        WHERE n_shared * 2 >= n_bench
    """,
}
