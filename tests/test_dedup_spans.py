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


def _mass(spark, rows, k=3):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_fraction, r.action)
        for r in dedup.duplicated_mass(df, k=k).collect()
    }


def test_mass_overlapping_spans_count_tokens_once(spark):
    # doc0 tokens: a b c X a b c — grams "a b c" duplicated at pos 0
    # and 4 (7 tokens, 2x3 covered, no overlap); doc1 identical text
    # would be trivial, use a doc sharing only the gram
    out = _mass(spark, [(0, "a b c x a b c"), (1, "q a b c r s t")])
    # 6/7 = .857 >= the 0.8 drop threshold -> doc0 drops; doc1 trims
    assert out[0] == (7, 6, round(6 / 7, 6), "drop")
    assert out[1] == (7, 3, round(3 / 7, 6), "trim")


def test_mass_full_dup_drops_and_clean_keeps(spark):
    out = _mass(spark, [(0, "a b c d"), (1, "a b c d"), (2, "u v w x")])
    assert out[0] == (4, 4, 1.0, "drop")
    assert out[1] == (4, 4, 1.0, "drop")
    assert out[2] == (4, 0, 0.0, "keep")


def test_mass_every_doc_gets_a_row(spark):
    out = _mass(spark, [(0, "a b"), (1, None)])
    assert out[0] == (2, 0, 0.0, "keep")
    assert out[1] == (0, 0, 0.0, "keep")


def test_mass_overlap_within_k(spark):
    # "a b a b a b": 2-grams "a b"(0), "b a"(1), "a b"(2), "b a"(3),
    # "a b"(4) — all duplicated; covered tokens = all 6, not 10
    out = _mass(spark, [(0, "a b a b a b")], k=2)
    assert out[0] == (6, 6, 1.0, "drop")
