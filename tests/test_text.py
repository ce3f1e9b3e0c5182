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
