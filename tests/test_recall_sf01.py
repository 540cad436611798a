"""Recall floors for the approximate operators at BENCH scale (sf0.1),
pinned against their exact twins (VERDICT r4 #6).

The approximate paths (MinHash-LSH clustering, hyperplane-LSH /
IVF ANN, LSH near-dup) are rows-only in the driver gate by design;
these tests are their correctness contract: measured recall at sf0.1
must stay above a documented floor. All randomness is hash-seeded, so
measured recall is deterministic — the floors sit a little below the
measured values (clusters 1.00, near-dup 0.62, LSH top-k 0.68,
IVF 1.00) to absorb tuning, not noise.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_implementation_spark.queries import REGISTRY

SF01 = "/root/testdata/sf0.1"


def _component_pairs(df):
    """(doc_a < doc_b) pairs sharing a component — Spark-side, the
    6.9M-pair exact set never hits the driver."""
    a = df.select(F.col("doc_id").alias("doc_a"), "component")
    b = df.select(F.col("doc_id").alias("doc_b"), "component")
    return (
        a.join(b, "component")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )


def test_dedup_clusters_lsh_pair_recall(spark):
    exact = _component_pairs(REGISTRY["dedup_clusters"].fn(spark, SF01))
    approx = _component_pairs(REGISTRY["dedup_clusters_lsh"].fn(spark, SF01))
    n_exact = exact.count()
    n_hit = exact.join(approx, ["doc_a", "doc_b"], "left_semi").count()
    assert n_exact > 0
    recall = n_hit / n_exact
    assert recall >= 0.95, f"LSH cluster pair recall {recall:.3f} < 0.95"


def test_embedding_near_dup_lsh_recall_and_soundness(spark):
    exact = REGISTRY["embedding_near_dup"].fn(spark, SF01).select("id_a", "id_b")
    approx = (
        REGISTRY["embedding_near_dup_lsh"].fn(spark, SF01).select("id_a", "id_b")
    )
    n_exact = exact.count()
    n_hit = exact.join(approx, ["id_a", "id_b"], "left_semi").count()
    n_approx = approx.count()
    n_sound = approx.join(exact, ["id_a", "id_b"], "left_semi").count()
    assert n_exact > 0
    recall = n_hit / n_exact
    assert recall >= 0.55, f"near-dup LSH recall {recall:.3f} < 0.55"
    # soundness: every reported pair is a true near-dup (scores are
    # exact cosine over candidate pairs, so no false positives)
    assert n_sound == n_approx, f"{n_approx - n_sound} unsound pairs"


def test_similarity_lsh_and_ivf_topk_recall(spark):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["similarity_bruteforce_topk"].fn(spark, SF01).collect()
    }
    assert exact
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["similarity_lsh_topk"].fn(spark, SF01).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["similarity_ivf_topk"].fn(spark, SF01).collect()
    }
    lsh_recall = len(exact & lsh) / len(exact)
    ivf_recall = len(exact & ivf) / len(exact)
    assert lsh_recall >= 0.6, f"LSH top-k recall {lsh_recall:.3f} < 0.6"
    assert ivf_recall >= 0.9, f"IVF top-k recall {ivf_recall:.3f} < 0.9"


def test_similarity_ivfpq_topk_recall(spark):
    """The composed IVF-PQ + ADC + exact-rerank path: the shortlist is
    PQ-approximate, but the refine-factor re-rank should land near the
    exact top-k."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["similarity_bruteforce_topk"].fn(spark, SF01).collect()
    }
    assert exact
    got = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["similarity_ivfpq_topk"].fn(spark, SF01).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.75, f"IVF-PQ top-k recall {recall:.3f} < 0.75"


def test_similarity_ivfpq_serve_parity_at_bench_scale(spark):
    """The persisted-index serve path must match the inline IVF-PQ path
    row-for-row at sf0.1 too (same training code + same serve function
    — _ivfpq_serve), which transfers the inline path's 0.75 recall
    floor to the serve path exactly."""
    inline = sorted(
        map(tuple, REGISTRY["similarity_ivfpq_topk"].fn(spark, SF01).collect())
    )
    served = sorted(
        map(tuple, REGISTRY["similarity_ivfpq_serve"].fn(spark, SF01).collect())
    )
    assert served == inline
