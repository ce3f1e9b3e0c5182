from __future__ import annotations

import pytest

from pim_orc_spark.operators import text
from pim_orc_spark.oracle import compare


# Explicit allowlist of queries with no SQL oracle BY NATURE. Anything
# else missing an ORACLES entry is a bug (an accidentally-omitted
# oracle must fail the test, not silently skip).
NO_SQL_ORACLE = frozenset({
    # UDTF with an abbreviation lookbehind no SQL dialect expresses;
    # covered row-for-row against split_sentences below
    "text_sentences",
})


@pytest.mark.parametrize("name", sorted(text.QUERIES))
def test_text_matches_oracle(spark, sf_dir, name):
    if name in NO_SQL_ORACLE:
        pytest.skip(f"{name} has no SQL oracle by nature")
    assert name in text.ORACLES, f"{name} is missing its oracle SQL"
    df = text.QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, text.ORACLES[name], sf_dir)
    assert ok, f"{name}: {msg}"


def test_polymorphic_udtf_analyze_schema(spark, sf_dir):
    """The last UDTF sub-feature: a POLYMORPHIC UDTF whose output
    schema is computed by ``analyze()`` from a constant argument
    (Spark 4) — the shape config-driven wide-table expansions take
    (k feature columns decided per call site, not hardcoded in the
    return type). Asserts the schema really is argument-dependent and
    the LATERAL expansion's values are exactly the expected padded
    token tuples on a controlled fixture."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstTokens:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [
                        StructField(f"tok{i}", StringType())
                        for i in range(n.value)
                    ]
                )
            )

        def eval(self, text, n):
            toks = (text or "").split()
            yield tuple(
                toks[i] if i < len(toks) else None for i in range(n)
            )

    spark.udtf.register("first_tokens", FirstTokens)
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "solo"), (3, "")],
        "doc_id int, text string",
    ).createOrReplaceTempView("docs_for_udtf")
    for k, expected in (
        (1, {(1, "alpha"), (2, "solo"), (3, None)}),
        (
            3,
            {
                (1, "alpha", "beta", "gamma"),
                (2, "solo", None, None),
                (3, None, None, None),
            },
        ),
    ):
        got = spark.sql(
            f"""
            SELECT d.doc_id, t.* FROM docs_for_udtf d,
                   LATERAL first_tokens(d.text, {k}) t
            """
        )
        assert got.columns == ["doc_id"] + [f"tok{i}" for i in range(k)]
        rows = {tuple(r) for r in got.collect()}
        assert rows == expected, f"k={k}: {rows}"


def test_text_sentences_matches_reference(spark, sf_dir):
    """The UDTF output must equal the shared pure-Python splitter
    row-for-row on the fixture corpus (no SQL oracle: the abbreviation
    lookbehind is not SQL-expressible)."""
    got = {}
    for r in text.text_sentences(spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence, r.n_chars))
    from pim_orc_spark.catalog import load_table

    for d in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect():
        exp = [(i, s, len(s)) for i, s in enumerate(text.split_sentences(d.text))]
        assert sorted(got.get(d.doc_id, [])) == exp, d.doc_id


def test_sentence_stats_plan_contains_udtf(spark, sf_dir):
    """The exported aggregate must still EVALUATE the UDTF (the point
    of the entry is a green driver row whose plan contains the LATERAL
    Python UDTF eval, not a rewrite into pure SQL)."""
    df = text.text_sentence_stats(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "sentence_split_stats" in plan or "PythonUDTF" in plan, plan


def test_sentence_stats_oracle_formula_on_adversarial_strings():
    """The DuckDB-side protection-regex + ltrim+1 length model must
    agree with the Python splitter on the corners that motivated each
    piece: abbreviation chains (leading-space consumption), internal
    space before punctuation (the ltrim-not-trim case), consecutive
    delimiters, abbreviation look-alikes, empty tails."""
    import duckdb

    cases = [
        "Dr. Smith arrived. He sat down.",
        "Use tools e.g. hammers. Then stop!  Next case",
        "See mr. dr. smith. Next sentence.",  # adjacent abbreviations
        "hello . world",  # internal space before punct
        "a.  . b",  # whitespace-only segment
        "adr. splits here. tail",  # abbreviation look-alike suffix
        "Mrs. X met mrs. Y. Done.",  # mrs vs mr alternation order
        "ends with abbrev etc.",
        "trailing punct and space. ",
        "no punctuation at all",
        "i.e. at the start. Then more. etc. follows e.g. here.",
        "double.. periods. here",
        "bang! bang! ! x",
    ]
    con = duckdb.connect()
    rows = ", ".join(
        f"({i}, '{c.replace(chr(39), chr(39) * 2)}')"
        for i, c in enumerate(cases)
    )
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows})"
        " t(doc_id, text)"
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(text._sentence_stats_sql()).fetchall()
    }
    for i, c in enumerate(cases):
        segs = text.split_sentences(c)
        if not segs:
            assert i not in got, c
            continue
        exp = (
            len(segs),
            sum(len(s) for s in segs),
            max(len(s) for s in segs),
        )
        assert got.get(i) == exp, f"{c!r}: oracle {got.get(i)} != {exp}"


def test_split_sentences_abbreviation_state():
    """The imperative lookbehind that justifies the UDTF: periods after
    known abbreviations must not split, sentence punctuation must."""
    cases = {
        "Dr. Smith arrived. He sat down.": [
            "Dr. Smith arrived.",
            "He sat down.",
        ],
        "Use tools e.g. hammers. Then stop!  Next case": [
            "Use tools e.g. hammers.",
            "Then stop!",
            "Next case",
        ],
        "No punctuation here": ["No punctuation here"],
        "": [],
    }
    for text_in, expected in cases.items():
        assert text.split_sentences(text_in) == expected, text_in
