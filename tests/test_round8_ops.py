"""Round-8 additions: loud-failure guards on degenerate inputs
(ADVICE r7 — silent NaN/Inf from zero denominators would hash-certify
garbage), star-mode precision-knob guard, and the per-doc streaming
verdict contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import dedup, text
from tests.conftest import SF_DIR


def test_classifier_auc_single_class_fails_loudly(spark):
    """AUC over one-class labels must raise, not emit NaN."""
    df = spark.createDataFrame(
        [(i, 0.1 * i) for i in range(10)], "id long, score double"
    )
    out = text.classifier_auc(df, "score", F.lit(1))
    with pytest.raises(Exception, match="classifier_auc undefined"):
        out.collect()
    # exact rational columns still come through for valid input
    ok = text.classifier_auc(df, "score", (F.col("id") >= 5).cast("int"))
    row = ok.collect()[0]
    assert row.auc_q6 == 1.0 and row.auc_den == 2 * 5 * 5


def test_score_drift_empty_slice_fails_loudly(spark):
    df = spark.createDataFrame(
        [(i, 0.1 * (i % 10)) for i in range(20)], "id long, score double"
    )
    empty = df.filter(F.col("id") < 0)
    out = text.score_drift(df, empty, "score")
    with pytest.raises(Exception, match="score_drift undefined"):
        out.collect()
    ok = text.score_drift(
        df.filter(F.col("id") < 10), df.filter(F.col("id") >= 10), "score"
    )
    rows = ok.collect()
    assert rows and all(r.tv_q6 == 0.0 for r in rows)  # identical dists


def test_star_mode_rejects_min_band_collisions(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="unsupported in star mode"):
        dedup.minhash_lsh_pairs(docs, mode="star", min_band_collisions=2)


def test_stream_neardup_verdict_is_per_doc_and_matches_pairs(spark):
    """The verdict shape must (a) emit at most one row per arriving
    doc, (b) agree with the pair shape on who is a near-dup and what
    the best agreement is — the same stateless match plan feeds both."""
    from big_data_project_implementation_spark.queries import REGISTRY

    pairs = REGISTRY["stream_neardup_vs_corpus"].fn(spark, SF_DIR).collect()
    verdicts = REGISTRY["stream_neardup_verdict"].fn(spark, SF_DIR).collect()
    by_arr: dict[int, list] = {}
    for r in pairs:
        by_arr.setdefault(r.arriving_id, []).append(r)
    assert len(verdicts) == len(by_arr)
    for v in verdicts:
        matches = by_arr[v.arriving_id]
        best = max(m.n_agree for m in matches)
        assert v.max_agree == best
        assert v.n_matches == len(matches)
        assert v.best_match == min(
            m.corpus_id for m in matches if m.n_agree == best
        )
