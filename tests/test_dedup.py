from __future__ import annotations

import pytest

from pim_orc_spark.operators import dedup
from pim_orc_spark.oracle import compare


@pytest.mark.parametrize("name", sorted(dedup.QUERIES))
def test_dedup_matches_oracle(spark, sf_dir, name):
    df = dedup.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, dedup.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def _py_grams(text: str) -> set[str]:
    """Pure-Python replica of char_ngrams(tokens-joined text, 3) — the
    independent third implementation the property test compares the
    bitset engine against (Catalyst and DuckDB being the other two)."""
    import re

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    s = " ".join(toks)
    return {s[i : i + 3] for i in range(max(len(s) - 2, 1))}


def test_containment_matches_bruteforce_property(spark):
    """Hypothesis over small random corpora: the bitset containment
    engine must equal a pure-Python brute force of the same
    definition (C(a→b) = |G(a)∩G(b)|/|G(a)| ≥ t, |G(a)| ≥ min_grams,
    a ≠ b) — catching dictionary-encode, gate, and popcount bugs
    independently of DuckDB."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pim_orc_spark.operators.dedup import (
        CONTAIN_MIN_GRAMS,
        CONTAIN_T,
        containment_pairs,
    )

    word = st.sampled_from(
        "alpha beta gamma delta epsilon zeta eta theta".split()
    )
    doc = st.lists(word, min_size=0, max_size=30).map(" ".join)

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=2, max_size=6))
    def check(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        got = {
            (r.doc_inner, r.doc_outer): r.containment
            for r in containment_pairs(
                spark,
                spark.createDataFrame(rows, "doc_id long, text string"),
            ).collect()
        }
        grams = {i: _py_grams(t) for i, t in rows}
        want = {}
        for a in grams:
            for b in grams:
                if a == b or len(grams[a]) < CONTAIN_MIN_GRAMS:
                    continue
                c = round(len(grams[a] & grams[b]) / len(grams[a]), 6)
                if c >= CONTAIN_T:
                    want[(a, b)] = c
        assert got == want, (got, want, texts)

    check()


def test_containment_prefix_equals_allpairs_and_prunes(spark, sf_dir):
    """The prefix-filter engine is LOSSLESS (pigeonhole bound): its
    pair set must equal the all-pairs engine's on the fixture corpus
    — and on a sparse synthetic corpus with planted contained
    excerpts, its candidate join must actually PRUNE (the point of
    the scale path): candidates well under the all-ordered-pairs
    count while every planted pair survives."""
    from pim_orc_spark.catalog import load_table
    from pim_orc_spark.operators.dedup import (
        containment_pairs,
        containment_pairs_prefix,
    )

    docs = load_table(spark, sf_dir, "documents")
    key = lambda r: (r.doc_inner, r.doc_outer, r.containment)
    allp = {key(r) for r in containment_pairs(spark, docs).collect()}
    pref = {
        key(r)
        for r in containment_pairs_prefix(spark, docs).collect()
    }
    assert pref == allp, (
        f"prefix lost/added pairs: -{allp - pref} +{pref - allp}"
    )

    # sparse corpus: 60 docs of disjoint-ish vocabulary (base-26 word
    # ids), 5 planted excerpts = full prefix of their source doc
    def words(seed, n):
        out = []
        x = seed
        for _ in range(n):
            x = (x * 48271) % 2147483647
            w, y = [], x
            for _ in range(4):
                w.append(chr(ord("a") + y % 26))
                y //= 26
            out.append("".join(w))
        return out

    rows = [(i, " ".join(words(i + 1, 40))) for i in range(60)]
    rows += [
        (100 + i, " ".join(words(i + 1, 40)[:24])) for i in range(5)
    ]
    sparse = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_inner, r.doc_outer)
        for r in containment_pairs_prefix(spark, sparse).collect()
    }
    assert {(100 + i, i) for i in range(5)} <= pairs
    assert pairs == {
        (r.doc_inner, r.doc_outer)
        for r in containment_pairs(spark, sparse).collect()
    }
    # the pruning claim, counted at TWO scales: 65 docs → 5 of 4160
    # ordered pairs admitted (0.12%); 650 docs → ~2.5% (the 19.7k
    # char-3-gram universe saturates and df rises — the same
    # information-theoretic ceiling the round-12 LSH slope work
    # documented; a word-shingle dictionary keeps df light at scale).
    # Both stay ≥95% pruned, and recall is exact at both.
    from pim_orc_spark.operators.dedup import (
        _containment_prefix_candidates,
        _grams_of,
    )

    for scale, cap in ((1, 0.02), (10, 0.05)):
        n = 60 * scale
        srows = [(i, " ".join(words(i + 1, 40))) for i in range(n)]
        srows += [
            (10000 + i, " ".join(words(i + 1, 40)[:24]))
            for i in range(5 * scale)
        ]
        corpus = spark.createDataFrame(
            srows, "doc_id long, text string"
        )
        tot = n + 5 * scale
        n_cand = _containment_prefix_candidates(
            # the helper's contract: callers pass a MATERIALIZED frame
            _grams_of(spark, corpus).localCheckpoint()
        ).count()
        assert n_cand <= tot * (tot - 1) * cap, (
            f"scale {scale}: admitted {n_cand} of {tot * (tot - 1)}"
        )
        got = {
            (r.doc_inner, r.doc_outer)
            for r in containment_pairs_prefix(spark, corpus).collect()
        }
        assert {(10000 + i, i) for i in range(5 * scale)} <= got


def test_word_prefix_containment_flat_rate_and_bruteforce(spark):
    """The df-light regime, counted: over WORD shingles the universe
    is ~unbounded, so the prefix join's admission rate must stay FLAT
    from 65 to 650 docs (unlike char-3-grams, whose 19.7k ceiling
    saturates); and the engine must equal a pure-Python brute force
    of the word-set containment definition at the small scale."""
    from pim_orc_spark.operators.dedup import (
        CONTAIN_MIN_GRAMS,
        CONTAIN_T,
        _containment_prefix_candidates,
        containment_pairs_prefix_words,
    )
    from pyspark.sql import functions as F

    def words(seed, n):
        out = []
        x = seed
        for _ in range(n):
            x = (x * 48271) % 2147483647
            w, y = [], x
            for _ in range(4):
                w.append(chr(ord("a") + y % 26))
                y //= 26
            out.append("".join(w))
        return out

    rates = {}
    for scale in (1, 10):
        n = 60 * scale
        rows = [(i, " ".join(words(i + 1, 40))) for i in range(n)]
        rows += [
            (10000 + i, " ".join(words(i + 1, 40)[:24]))
            for i in range(5 * scale)
        ]
        corpus = spark.createDataFrame(
            rows, "doc_id long, text string"
        )
        tot = n + 5 * scale
        gramframe = corpus.select(
            "doc_id",
            F.array_distinct(
                F.split(F.lower("text"), r"\s+")
            ).alias("grams"),
        )
        n_cand = _containment_prefix_candidates(gramframe).count()
        rates[scale] = n_cand / (tot * (tot - 1))
        got = {
            (r.doc_inner, r.doc_outer): r.containment
            for r in containment_pairs_prefix_words(
                spark, corpus
            ).collect()
        }
        assert {
            (10000 + i, i) for i in range(5 * scale)
        } <= set(got), f"scale {scale}: planted pairs missing"
        if scale == 1:
            sets = {i: set(t.split()) for i, t in rows}
            want = {}
            for a in sets:
                for b in sets:
                    if a == b or len(sets[a]) < CONTAIN_MIN_GRAMS:
                        continue
                    c = round(
                        len(sets[a] & sets[b]) / len(sets[a]), 6
                    )
                    if c >= CONTAIN_T:
                        want[(a, b)] = c
            assert got == want, (got, want)
    assert rates[10] <= 3 * rates[1] and rates[10] <= 0.01, rates


def test_fixture_corpus_band_admission_is_adversarial(spark, sf_dir):
    """Measure (not cite) the claim underpinning the scale-slope
    corpus choice: on the fixture documents table banding admits MOST
    of all pairs (background char-3-gram J ≈ 0.6 over a ~377-gram
    dictionary), i.e. the corpus is in the adversarial regime where
    LSH candidates are Θ(n²) BY INFORMATION CONTENT — the reason the
    slope test generates a diverse corpus instead, and the counting
    contrast to its flat ~0.4% admission rate (SLOPE_r13.json)."""
    from pim_orc_spark.catalog import load_table
    from pim_orc_spark.operators.dedup import lsh_band_candidates

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    cands = lsh_band_candidates(spark, docs).count()
    rate = cands / (n * (n - 1) / 2)
    assert rate > 0.5, rate


def test_containment_sees_asymmetric_pairs_jaccard_misses(spark):
    """The semantic point of the containment operator: a small doc
    fully inside a much larger one has containment 1.0 but Jaccard
    ≈ |A|/|B| far below the near-dup threshold — symmetric dedup
    keeps it, containment dedup flags it."""
    small = "the quick brown fox jumps over the lazy dog near the river"
    big = small + " " + " ".join(
        f"padding sentence number {i} with plenty of extra unrelated "
        "words to inflate the gram set of the outer document"
        for i in range(12)
    )
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "completely different content here")],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in dedup.containment_pairs(spark, docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 0.9
    assert (2, 1) not in pairs  # the big doc is NOT inside the small
    assert not any(3 in p for p in pairs)
    # and the symmetric engine misses it: J ≈ |A|/|B| ≪ 0.8
    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup.bitset_pairs(spark, docs).collect()
    }
    assert (1, 2) not in jac and (2, 1) not in jac


def test_collated_dedup_merges_case_variants(spark):
    """UTF8_LCASE grouping must merge case variants that binary
    grouping keeps apart, without touching genuinely distinct texts."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "Hello World"),
            (1, "hello world"),
            (2, "HELLO WORLD"),
            (3, "another doc"),
        ],
        "doc_id long, text string",
    )
    merged = (
        docs.groupBy(F.collate("text", "UTF8_LCASE").alias("k"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_doc_id", "n_copies")
        .collect()
    )
    got = {(r.keep_doc_id, r.n_copies) for r in merged}
    assert got == {(0, 3), (3, 1)}
    # binary grouping sees three distinct variants
    assert docs.select("text").distinct().count() == 4


def test_gate_fraction_is_lower_bound():
    """ADVICE r12: the size gate's rational bound must never round
    ABOVE the Jaccard threshold — fr > t would make the documented
    'lossless' prefilter lossy (pairs with J ≥ t but size ratio in
    (fr⁻, t) wrongly pruned). limit_denominator alone fails this for
    e.g. 0.4999 → 1/2; the helper must fall back to a truncated grid
    fraction and stay within 2e-6 of the threshold (tight enough that
    the gate still prunes what it should)."""
    from fractions import Fraction

    for t in (0.8, 0.4999, 0.7, 1 / 3, 0.866025, 0.999999, 0.5):
        fr = dedup._gate_fraction(t)
        assert fr <= Fraction(t), (t, fr)
        assert float(fr) > t - 2e-6, (t, fr)
    # the default threshold resolves to the exact representable 4/5
    assert dedup._gate_fraction() == Fraction(4, 5)


def test_gate_fraction_lossless_property():
    """Property form over arbitrary thresholds: the bound never
    exceeds t (losslessness — the property that keeps the gate from
    ever pruning a true pair) and never trails it by more than
    limit_denominator(1000)'s worst-case 1/1000 gap (tightness — the
    gate still prunes; hypothesis found 71/126 sitting 4e-6 under
    t ≈ 0.5634961, which is fine, merely a marginally looser gate)."""
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=0.01, max_value=0.999999))
    def check(t):
        fr = dedup._gate_fraction(t)
        assert fr <= Fraction(t), (t, fr)
        assert float(fr) > t - 1.1e-3, (t, fr)

    check()


def test_minhash_lsh_equals_exact_baseline(spark, sf_dir):
    """The LSH path must reproduce the exact all-pairs result (recall
    bound (1-J^4)^32 ≈ 5e-8 at the 0.8 threshold)."""
    lsh = {
        tuple(r)
        for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    exact = {
        tuple(r)
        for r in dedup.dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert lsh == exact


def test_minhash_lsh_join_attach_path(spark, sf_dir, monkeypatch):
    """The wide-mask branch (masks attached to candidates with two
    doc-keyed joins instead of riding the banded rows) must produce the
    identical pair set — it is the path a wide-dictionary corpus takes."""
    carried = {
        tuple(r) for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    monkeypatch.setattr(dedup, "CARRY_MASK_MAX_WORDS", 0)
    attached = {
        tuple(r) for r in dedup.dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert attached == carried


def test_containment_prefix_attach_path_equals_inline(
    spark, sf_dir, monkeypatch
):
    """The containment engine's two verify shapes must agree pair-for-
    pair: the narrow inline path (bitsets ride the pigeonhole gram
    join, verify in the join stage, DISTINCT over survivors) and the
    wide fallback (candidate DISTINCT, then two doc-keyed mask-attach
    joins) — the latter is what a past-CARRY_MASK_MAX_WORDS dictionary
    takes, forced here by zeroing the threshold."""
    from pim_orc_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    key = lambda r: (r.doc_inner, r.doc_outer, r.containment)
    inline = {
        key(r)
        for r in dedup.containment_pairs_prefix(spark, docs).collect()
    }
    monkeypatch.setattr(dedup, "CARRY_MASK_MAX_WORDS", 0)
    attached = {
        key(r)
        for r in dedup.containment_pairs_prefix(spark, docs).collect()
    }
    assert attached == inline
    assert inline  # non-degenerate: the fixture corpus has pairs


def test_containment_mask_attach_strategy_is_output_invariant(
    spark, sf_dir
):
    """r17: the narrow index-space path attaches the posting-side
    verify bitset after the candidate join, broadcast only while the
    index's known footprint fits MASK_ATTACH_BROADCAST_BYTES. The
    strategy choice must be OUTPUT-invariant: the planner-chosen
    (non-broadcast) attach a past-threshold corpus takes must produce
    the identical pair set — forced here by lying that the index is
    huge (n_docs=None disables the hint) — and the plan must carry the
    broadcast only on the hinted side."""
    from pim_orc_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    g, enc, nb, n_docs = dedup._containment_grams_artifact(spark, docs)
    assert n_docs == docs.count()
    key = lambda r: (r.doc_inner, r.doc_outer, r.containment)
    hinted_df = dedup._prefix_pairs_from_artifact(spark, g, enc, nb, n_docs)
    planner_df = dedup._prefix_pairs_from_artifact(spark, g, enc, nb, None)
    hinted = {key(r) for r in hinted_df.collect()}
    planner = {key(r) for r in planner_df.collect()}
    assert hinted == planner
    assert hinted  # non-degenerate
    # the fixture-sized index must take the broadcast attach
    plan = hinted_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_containment_integer_gate_matches_round_filter(spark):
    """r17: the verify pipeline REPLACES the per-row
    ``round(n/sz, 6) >= CONTAIN_T`` filter (a BigDecimal construction
    per occurrence, and — kept post-distinct — pushed back into the
    join condition by Catalyst) with the exact LONG predicate
    ``2e6·n ≥ B·sz`` from _round6_boundary. Exhaustively over every
    (n_common, sza) with sza ≤ 600, the two predicates must agree —
    pinned with Spark's own round/compare semantics, not a Python
    replica — and the grid must exercise both sides of the boundary."""
    from pyspark.sql import functions as F

    from pim_orc_spark.operators.dedup import CONTAIN_T, _round6_boundary

    bnd = _round6_boundary(CONTAIN_T)
    assert bnd % 2 == 1  # odd by construction: boundary can't be hit
    grid = spark.range(1, 601).selectExpr(
        "id AS sza", "explode(sequence(0, id)) AS n_common"
    )
    both = grid.select(
        "sza",
        "n_common",
        (
            F.col("n_common") * F.lit(2_000_000) >= F.col("sza") * F.lit(bnd)
        ).alias("gate"),
        (
            F.round(
                F.col("n_common").cast("double") / F.col("sza"), 6
            )
            >= F.lit(CONTAIN_T)
        ).alias("rounded"),
    )
    assert both.filter("gate != rounded").count() == 0
    # the grid exercises both sides of the boundary
    assert both.filter("gate").count() > 0
    assert both.filter("NOT gate").count() > 0


def test_clusters_edge_source_has_no_cross_join(spark, sf_dir):
    """The clusters pipeline's edge stage must be the bucketed LSH plan:
    a 100 TB run dies on any all-pairs product, so the physical plan of
    the pair source may not contain a cartesian/broadcast-nested-loop
    join (those are reserved for the labeled quadratic baselines)."""
    pairs = dedup.dedup_minhash_lsh(spark, sf_dir)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_star_contraction_chain_is_log_rounds(spark):
    """A 256-node chain is the worst case for min-label propagation
    (256 diameter-bound rounds); star contraction must finish in
    O(log n) and still land every node on the component minimum."""
    from pyspark.sql import functions as F

    n = 256
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    stars, rounds = dedup.star_contraction_components(edges)
    got = {(r["src"], r["dst"]) for r in stars.collect()}
    assert got == {(i, 0) for i in range(1, n)}
    assert rounds <= 12, rounds


def test_star_contraction_raises_when_capped(spark):
    """Unconverged labels are never returned (silent wrong cluster ids);
    an insufficient round budget must raise."""
    from pyspark.sql import functions as F

    edges = spark.range(255).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.star_contraction_components(edges, max_rounds=2)


def _skewed_banded(spark, n_docs=400, hot_frac=0.6):
    """Synthetic (doc_id, band, key) where one band key holds >50% of
    docs — the degenerate-template corpus shape."""
    from pyspark.sql import functions as F

    n_hot = int(n_docs * hot_frac)
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    return d.select(
        "doc_id",
        F.lit(0).alias("band"),
        F.when(F.col("doc_id") < n_hot, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), F.col("doc_id")))
        .alias("key"),
    )


def test_salted_band_candidates_identical_output(spark):
    """Salting must not change the candidate set: every pair meets on
    exactly one (band, key, salt)."""
    banded = _skewed_banded(spark)
    salted = {
        tuple(r)
        for r in dedup._salted_band_candidates(
            banded, salt=8, hot_threshold=50
        ).collect()
    }
    unsalted = {
        tuple(r)
        for r in dedup._salted_band_candidates(
            banded, salt=8, hot_threshold=10**9
        ).collect()
    }
    n_hot = 240
    assert len(unsalted) == n_hot * (n_hot - 1) // 2
    assert salted == unsalted


def test_salted_band_candidates_bounds_bucket(spark):
    """With salting, no (band, key, salt) group on the probe side holds
    more than ~1/salt of a hot bucket (binomial spread), so the hot
    key's join work is split across `salt` tasks instead of one."""
    from pyspark.sql import functions as F

    banded = _skewed_banded(spark)
    salt, hot_threshold = 8, 50
    left_groups = (
        banded.join(
            F.broadcast(
                banded.groupBy("band", "key")
                .count()
                .filter(F.col("count") > hot_threshold)
                .select("band", "key")
            ),
            ["band", "key"],
        )
        .select(
            "band",
            "key",
            F.pmod(F.xxhash64("doc_id"), F.lit(salt)).alias("salt"),
        )
        .groupBy("band", "key", "salt")
        .count()
        .collect()
    )
    n_hot = 240
    max_group = max(r["count"] for r in left_groups)
    assert len(left_groups) == salt  # hot bucket actually split 8 ways
    # binomial(240, 1/8) stays well under half the bucket
    assert max_group < n_hot // 2, max_group


def test_salted_band_candidates_rejects_uncovered_bands(spark):
    """A keys array wider than the first-collision CASE covers would
    silently duplicate pairs; the runtime guard must raise instead."""
    from pyspark.sql import functions as F

    banded = (
        spark.range(4)
        .select(
            F.col("id").alias("doc_id"),
            F.array(F.lit(1), F.lit(2), F.lit(3)).alias("keys"),
        )
        .select("doc_id", "keys", F.posexplode("keys").alias("band", "key"))
    )
    with pytest.raises(Exception, match="more bands than n_bands"):
        dedup._salted_band_candidates(banded, n_bands=2).collect()


def test_pair_engines_handle_empty_corpus(spark):
    """An empty documents table must yield an empty pair set with the
    contract schema — not a crash building 0-word masks (a fresh
    partition/source with no data yet is a normal production state)."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    for engine in (dedup.minhash_pairs, dedup.bitset_pairs):
        out = engine(spark, empty)
        assert out.columns == ["doc_a", "doc_b", "jaccard"]
        assert out.count() == 0


def _synthetic_low_similarity_corpus(spark, n_docs=1200, n_dups=15):
    """Deterministic corpus with ~zero background similarity — the
    realistic regime the fixture corpus deliberately inverts (its ~30
    shared words give background J ≈ 0.6; see SURVEY §8.5). Each doc is
    ~60 tokens drawn from an effectively unbounded random vocabulary,
    so two unrelated docs share almost no char-3-grams; ``n_dups`` docs
    are near-copies (a few tokens mutated) planted as the true pairs."""
    import random

    rng = random.Random(42)

    def word():
        return "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8)
        )

    rows = []
    for i in range(n_docs - n_dups):
        rows.append((i, " ".join(word() for _ in range(60))))
    for d in range(n_dups):
        base_id, base_text = rows[d * 7]
        toks = base_text.split()
        for j in range(2):  # mutate 2 of 60 tokens: J stays >= 0.8
            toks[rng.randrange(len(toks))] = word()
        rows.append((n_docs - n_dups + d, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_candidate_reduction_and_pair_parity(spark, monkeypatch):
    """The CORRECTNESS half of SURVEY §8.5's scale claim, always run:
    on a corpus with low background similarity (the 100 TB regime),
    LSH banding must admit a candidate set ≪ n²/2 and return the pair
    set identical to the all-pairs bitset baseline. On the adversarial
    driver fixture the candidate relation inverts (documented) — this
    corpus is the one the scale claim is actually about."""
    docs = _synthetic_low_similarity_corpus(spark).localCheckpoint()
    n = docs.count()

    # Candidate volume: with the Jaccard threshold disabled, the LSH
    # engine's output IS its post-banding candidate set (exactly-once
    # per pair via the first-collision filter).
    monkeypatch.setattr(dedup, "JACCARD_T", -1.0)
    n_candidates = dedup.minhash_pairs(spark, docs).count()
    monkeypatch.undo()
    all_pairs = n * (n - 1) // 2
    assert n_candidates < all_pairs / 100, (
        f"banding admitted {n_candidates} of {all_pairs} pairs — "
        "not a candidate reduction"
    )

    lsh = {tuple(r) for r in dedup.minhash_pairs(spark, docs).collect()}
    exact = {tuple(r) for r in dedup.bitset_pairs(spark, docs).collect()}
    assert lsh == exact
    assert len(lsh) >= 10  # the planted near-dups were actually found


@pytest.mark.perf
def test_lsh_beats_all_pairs_on_realistic_corpus(spark):
    """The WALL-CLOCK half of the scale claim: LSH must finish faster
    than the all-pairs baseline on the low-background-similarity
    corpus. Marked ``perf`` and excluded from the default correctness
    run (pytest.ini addopts) because sustained co-tenant load can fail
    it on a performance fact rather than a code defect; run with
    ``pytest -m perf`` to measure.

    Min-of-N INTERLEAVED samples per engine: a single sample each is
    flakier than the effect being measured (a co-tenant stall during
    one engine's window inverts the result with no code defect — the
    same reason bench.py reports mins). Two rounds normally; if the
    race is inverted after two, sample up to two more rounds before
    failing, so only a SUSTAINED inversion (a real performance fact,
    not one stall) goes red."""
    import time

    docs = _synthetic_low_similarity_corpus(spark).localCheckpoint()

    t_lsh, t_exact = [], []
    lsh = exact = None
    for attempt in range(4):
        t0 = time.perf_counter()
        lsh = {tuple(r) for r in dedup.minhash_pairs(spark, docs).collect()}
        t_lsh.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        exact = {tuple(r) for r in dedup.bitset_pairs(spark, docs).collect()}
        t_exact.append(time.perf_counter() - t0)
        if attempt >= 1 and min(t_lsh) < min(t_exact):
            break

    assert lsh == exact
    assert min(t_lsh) < min(t_exact), (
        f"LSH {min(t_lsh):.1f}s did not beat all-pairs {min(t_exact):.1f}s "
        f"across {len(t_lsh)} interleaved samples on a "
        "low-background-similarity corpus"
    )


def test_star_contraction_random_graphs_match_union_find(spark):
    """Property: on arbitrary random graphs, star contraction labels
    every node with its component's minimum — checked against a pure
    Python union-find. Covers graph shapes (self-loops, duplicate and
    reversed edges, disjoint components, dense blobs) the fixture
    corpus never produces."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=40),
                st.integers(min_value=0, max_value=40),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def check(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for a, b in edges:
            union(a, b)
        # expected: node -> component min, only for nodes with a
        # non-self edge (star contraction drops isolated self-loops)
        nodes = {n for a, b in edges if a != b for n in (a, b)}
        expected = {
            n: min(m for m in parent if find(m) == find(n)) for n in nodes
        }

        df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in edges], "src long, dst long"
        )
        stars, _rounds = dedup.star_contraction_components(df)
        got = {r["src"]: r["dst"] for r in stars.collect()}
        # every non-isolated node labeled with its component minimum
        # (component minima may appear as src->itself or be implicit)
        for n in nodes:
            assert got.get(n, n) == expected[n], (n, got, expected)

    check()


def test_simhash_band_admission_stays_near_birthday_floor(spark, tmp_path):
    """The sharper half of the dead-bit tripwire: the byte-block
    candidate join's admission RATE on a diverse corpus must stay
    near the four-block birthday floor (~1.6% for well-mixed 32-bit
    hashes; measured 1.66% at 5k docs post-fmix32). The regression
    this catches is categorical, not marginal: dead high bits made
    one block corpus-constant and admission exactly 100%."""
    from test_scale_slope import _synth_docs

    out = str(tmp_path / "diverse")
    n = 500
    _synth_docs(spark, n, out)
    sim = dedup.dedup_simhash(spark, out)
    cand = dedup.simhash_band_candidates(sim).count()
    rate = cand / (n * (n - 1) / 2)
    assert rate < 0.05, (cand, rate)


def test_simhash_bits_unbiased_on_diverse_corpus(spark, tmp_path):
    """Regression tripwire for the dead-bit defect fmix32 fixes: raw
    short-token poly_hash values sit below ~2^23, so simhash bits
    13..31 were corpus-CONSTANT on a diverse 50k-word vocabulary
    (set-fraction exactly 0 or 1) — the contiguous top pigeonhole
    block of dedup_simhash_pairs then matched every doc pair and the
    banded join silently degraded to 100.0000% candidate admission
    (all-pairs). With the finalizer, every bit's set-fraction sits
    near 1/2 on the same corpus class (measured 0.41-0.50 at 5k docs;
    candidate admission 1.66% vs the 1.56% four-block birthday
    ideal)."""
    from test_scale_slope import _synth_docs

    out = str(tmp_path / "diverse")
    _synth_docs(spark, 500, out)
    rows = dedup.dedup_simhash(spark, out).collect()
    n = len(rows)
    assert n == 500
    for b in range(32):
        frac = sum((r.simhash >> b) & 1 for r in rows) / n
        assert 0.2 < frac < 0.8, (b, frac)
