"""Round-13 optimization-round pins: the rewritten kernels must stay
value-identical to the shapes they replaced (the optimization round's
contract — same results, cheaper plans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import dedup, graph


def test_bitmask_pairs_match_array_intersect_reference(spark):
    """The flat-bigint popcount kernel (round-13 rewrite) returns the
    exact pairs+jaccard the generic array_intersect path computes."""
    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),  # exact dup of 1
        (3, "a b c d f"),  # 4/6 = 0.667 vs 1
        (4, "a b c d e f"),  # 5/6 = 0.833 vs 1
        (5, "x y z"),
        (6, "x y z w"),  # 3/4 = 0.75
        (7, "q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        dedup.ngram_jaccard_pairs(
            df, text_col="text", id_col="doc_id", k=1, threshold=0.8
        ).collect()
    )
    # reference: brute-force exact jaccard over normalized token sets
    import itertools

    toks = {r[0]: set(r[1].split()) for r in rows}
    want = []
    for a, b in itertools.combinations(sorted(toks), 2):
        inter = len(toks[a] & toks[b])
        union = len(toks[a] | toks[b])
        j = inter / union
        if j >= 0.8:
            want.append((a, b, round(j, 6)))
    assert [(r.id_a, r.id_b, r.jaccard) for r in got] == sorted(want)


def test_bitmask_pairs_multiword_masks(spark):
    """Vocabulary > 64 words exercises the multi-word (L > 1) unrolled
    popcount sum."""
    base = [f"w{i}" for i in range(130)]  # L = 3 mask words
    rows = [
        (1, " ".join(base)),
        (2, " ".join(base)),               # identical → J = 1
        (3, " ".join(base[:117])),          # 117/130 = 0.9 vs 1
        (4, " ".join(base[:60])),           # 60/130 < 0.8 vs 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            df, text_col="text", id_col="doc_id", k=1, threshold=0.8
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == round(117 / 130, 6)
    assert got[(2, 3)] == round(117 / 130, 6)
    assert (1, 4) not in got and (2, 4) not in got


def test_lpa_mode_sweep_tiebreak_smallest_label(spark):
    """The round-13 mode() sweep keeps LPA's argmax contract: most
    frequent neighbor label, SMALLEST label on ties. Node 3's
    neighbors {1, 2} tie 1-1 in round one → it must adopt 1, not 2."""
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (1, 2)], "src long, dst long"
    )
    out = {
        r.node: r.label
        for r in graph.label_propagation(edges, iterations=4).collect()
    }
    # triangle {1,2,3}: everyone converges to the smallest label 1
    assert out == {1: 1, 2: 1, 3: 1}


def test_cc_sized_coalesce_preserves_components(spark):
    """connected_components' size-adaptive coalesce (round 13) must not
    change the fixpoint: a 3-chain plus a 2-chain labels by min id."""
    pairs = spark.createDataFrame(
        [(5, 6), (6, 7), (10, 11)], "id_a long, id_b long"
    )
    got = sorted(
        (r.id, r.component)
        for r in dedup.connected_components(pairs).collect()
    )
    assert got == [(5, 5), (6, 5), (7, 5), (10, 10), (11, 10)]
