"""Unit semantics for operators.dedup.duplicated_spans (ExactSubstr-
style duplicated-span detection); end-to-end oracle parity runs in
test_queries_oracle.py as dedup_spans.
"""

from __future__ import annotations

from big_data_project_implementation_spark.operators import dedup

SCHEMA = "doc_id long, text string"


def _spans(spark, rows, k=3):
    df = spark.createDataFrame(rows, SCHEMA)
    return sorted(
        (r.doc_id, r.span_start, r.span_tokens, r.n_grams)
        for r in dedup.duplicated_spans(df, k=k).collect()
    )


def test_cross_doc_shared_span(spark):
    # docs share the 5-token run "a b c d e" -> one maximal span each,
    # covering grams at positions 0..2 (k=3): span_tokens = 5
    out = _spans(
        spark,
        [(0, "a b c d e x y"), (1, "q r a b c d e")],
    )
    assert out == [(0, 0, 5, 3), (1, 2, 5, 3)]


def test_within_doc_repeat_counts(spark):
    # "a b c" twice inside ONE doc: both occurrences are duplicated
    out = _spans(spark, [(0, "a b c p q r s a b c")])
    assert out == [(0, 0, 3, 1), (0, 7, 3, 1)]


def test_adjacent_grams_merge_to_maximal_span(spark):
    # shared 4-token run -> two overlapping duplicated 3-grams merge
    # into ONE maximal span of 4 tokens, not two 3-token spans
    out = _spans(spark, [(0, "a b c d"), (1, "a b c d")])
    assert out == [(0, 0, 4, 2), (1, 0, 4, 2)]


def test_unique_text_emits_nothing(spark):
    assert _spans(spark, [(0, "p q r s t"), (1, "u v w x y")]) == []


def test_short_docs_skipped(spark):
    # doc shorter than k has no grams; must not error or emit
    out = _spans(spark, [(0, "a b"), (1, "a b c d"), (2, "a b c d")])
    assert out == [(1, 0, 4, 2), (2, 0, 4, 2)]


def test_normalization_folds_case_and_whitespace(spark):
    out = _spans(spark, [(0, "A  b\tC d"), (1, "a b c d")])
    assert out == [(0, 0, 4, 2), (1, 0, 4, 2)]
