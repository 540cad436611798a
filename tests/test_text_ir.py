"""Unit semantics for the lexical-IR operators (tfidf_top_terms,
bm25_scores) on hand-built micro-corpora; end-to-end oracle parity
runs per-query in test_queries_oracle.py.
"""

from __future__ import annotations

import math

from big_data_project_implementation_spark.operators import text

SCHEMA = "doc_id long, text string"


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "apple apple apple banana common"),
            (1, "banana banana cherry common"),
            (2, "cherry date common common"),
        ],
        SCHEMA,
    )


def test_tfidf_rank_prefers_frequent_then_rare(spark):
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df)
        for r in text.tfidf_top_terms(_docs(spark), k=2).collect()
    }
    # doc0: apple tf=3 wins; banana (df=2) beats common (df=3) at tf=1
    assert out[(0, 1)] == ("apple", 3, 1)
    assert out[(0, 2)] == ("banana", 1, 2)
    # doc2: common tf=2 wins despite being in every doc; then cherry
    # (df=2) ties date (df=1) on tf=1 -> df ASC puts date first
    assert out[(2, 1)] == ("common", 2, 3)
    assert out[(2, 2)] == ("date", 1, 1)


def test_tfidf_score_value(spark):
    rows = {
        (r.doc_id, r.term): r.tfidf
        for r in text.tfidf_top_terms(_docs(spark), k=2).collect()
    }
    assert rows[(0, "apple")] == round(3 * math.log(3 / 1), 6)
    # 'common' appears in all docs -> idf = ln(1) = 0
    assert rows[(2, "common")] == 0.0


def test_bm25_matches_hand_computation(spark):
    out = {
        r.doc_id: (r.n_terms, r.score)
        for r in text.bm25_scores(
            _docs(spark), ("apple", "cherry"), k1=1.2, b=0.75
        ).collect()
    }
    # doc1 matches only 'cherry'; doc0 only 'apple'; doc2 only 'cherry'
    assert set(out) == {0, 1, 2}
    assert out[0][0] == 1 and out[1][0] == 1 and out[2][0] == 1
    n, avgdl = 3, (5 + 4 + 4) / 3
    def bm25(tf, df, dl):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert out[0][1] == round(bm25(3, 1, 5), 6)  # apple: tf=3 in doc0
    assert out[2][1] == round(bm25(1, 2, 4), 6)  # cherry in doc2


def test_bm25_omits_nonmatching_docs(spark):
    out = text.bm25_scores(_docs(spark), ("date",)).collect()
    assert [r.doc_id for r in out] == [2]


def test_bm25_null_text_does_not_skew_avgdl(spark):
    """A null-text doc must be skipped by avgdl (not counted as
    size(null) = -1) and emit no score row; it still counts toward N.
    DuckDB's len(string_split(NULL)) is NULL -> SUM skips it; the
    Spark side must agree or the oracle hash flips on real corpora."""
    import math

    docs = spark.createDataFrame(
        [(0, "apple apple apple banana common"), (1, None)], SCHEMA
    )
    out = {r.doc_id: r.score for r in text.bm25_scores(docs, ("apple",)).collect()}
    assert set(out) == {0}
    n, avgdl = 2, 5 / 2  # N counts the null doc; avgdl does not
    idf = math.log(1.0 + (n - 1 + 0.5) / (1 + 0.5))
    expect = idf * (3 * 2.2) / (3 + 1.2 * (1 - 0.75 + 0.75 * 5 / avgdl))
    assert out[0] == round(expect, 6)


def test_bm25_sums_multi_term_matches(spark):
    out = {
        r.doc_id: r.n_terms
        for r in text.bm25_scores(_docs(spark), ("banana", "cherry")).collect()
    }
    assert out[1] == 2  # doc1 matches both terms
