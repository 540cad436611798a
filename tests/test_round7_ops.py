"""Round-7 additions: overflow guards on the integer-quantized ANN
entry points, NULL-text safety for the BFD packer, and the
convergence-flag return contract."""

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import similarity as sim
from big_data_project_implementation_spark.operators import text


def _vecs(spark, comps):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(comps)],
        "vec_id long, embedding array<float>",
    )


def test_q6_guard_passes_unit_vectors(spark):
    """Normal (unit-ish) embeddings flow through the guarded quantize
    unchanged — same values the unchecked _q6 yields."""
    df = _vecs(spark, [[0.5, -0.25, 1.0, 0.0]] * 3)
    out = df.select(
        sim._q6_checked(F.col("embedding")).alias("q")
    ).collect()
    assert [r.q for r in out] == [[500000, -250000, 1000000, 0]] * 3


def test_q6_guard_rejects_overflow_magnitude(spark):
    """ADVICE r6: components large enough that int64 dot/norm sums
    would silently wrap now fail the job LOUDLY at the quantize step.
    dim 4 bound is sqrt(2^63/4)/2 ≈ 7.6e8 micro-units (|x| ≈ 759) —
    1e6 is far past it."""
    df = _vecs(spark, [[1e6, 0.0, 0.0, 0.0]])
    with pytest.raises(Exception, match="integer-exact bound"):
        df.select(sim._q6_checked(F.col("embedding")).alias("q")).collect()


def test_ivf_centroids_guarded_end_to_end(spark):
    """The guard fires through the public entry point, not just the
    helper: ivf_centroids on poisoned vectors raises instead of
    training on wrapped bigint arithmetic."""
    bad = _vecs(spark, [[1e7] * 8, [0.1] * 8, [0.2] * 8, [0.3] * 8])
    with pytest.raises(Exception, match="integer-exact bound"):
        sim.ivf_centroids(bad, n_cells=2, iters=1).collect()


def test_lsh_md5_pairs_decimal_bound(spark):
    """lsh_md5_pairs carries the tighter decimal(38,0) bound
    (sqrt(1e17/dim) micro-units ≈ 111 at dim 8): components of ~1000
    pass the generic int64 bound but must fail here, because the
    square-compare would overflow the decimal and silently drop
    pairs."""
    bad = _vecs(spark, [[1000.0] * 8, [999.0] * 8])
    with pytest.raises(Exception, match="integer-exact bound"):
        sim.lsh_md5_pairs(bad, dim=8, n_planes=2, n_tables=1).collect()
    ok = _vecs(spark, [[0.9] * 8, [0.9] * 8])
    rows = sim.lsh_md5_pairs(ok, dim=8, n_planes=2, n_tables=1).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(0, 1)]  # identical vecs


def test_pack_bfd_null_text_excluded(spark):
    """ADVICE r6: a NULL-text doc yields NULL n_tokens, which would
    poison the packing state (int(NaN) in the Arrow loop). The query
    path excludes NULL text on both sides; the operator itself still
    packs the non-NULL rows."""
    d = spark.createDataFrame(
        [(0, "a b c", "en"), (1, None, "en"), (2, "d e", "en")],
        "doc_id long, text string, lang string",
    )
    packed = text.pack_sequences_bfd(
        d.filter(F.col("text").isNotNull()).withColumn(
            "n_tokens", text.token_count("text")
        ),
        budget=4,
    ).collect()
    assert {r.doc_id for r in packed} == {0, 2}
    assert all(r.pack_fill <= 4 for r in packed)


def test_lsh_md5_topk_matches_python_recompute(spark):
    """Round 7 (VERDICT r6 #4): the certified top-k LSH composition —
    md5 hyperplane signs, bucket candidacy across tables, exact-integer
    cosine, (cos desc, id asc) rank, top-k truncate — recomputed in
    pure Python as the THIRD independent implementation (alongside
    Spark and the DuckDB gate oracle)."""
    import hashlib
    import math

    dim, n_planes, n_tables, k = 8, 4, 2, 3
    vecs = {
        0: [0.9, 0.1, -0.3, 0.5, 0.0, 0.2, -0.1, 0.4],
        1: [0.8, 0.2, -0.3, 0.5, 0.1, 0.2, -0.1, 0.4],  # near 0
        2: [-0.5, 0.9, 0.2, -0.4, 0.3, -0.2, 0.6, 0.1],
        3: [-0.5, 0.8, 0.2, -0.4, 0.3, -0.2, 0.7, 0.1],  # near 2
        4: [0.9, 0.1, -0.3, 0.5, 0.0, 0.2, -0.1, 0.4],  # dup of 0
        5: [0.1, -0.7, 0.5, 0.3, -0.6, 0.4, 0.2, -0.3],
    }

    def q6(v):
        return [math.floor(float(x) * 1e6 + 0.5) for x in v]

    def w(t, p):
        return [
            int(hashlib.md5(f"lsh{t}:{p}:{d}".encode()).hexdigest()[:15], 16)
            % 2001
            - 1000
            for d in range(dim)
        ]

    qv = {i: q6(v) for i, v in vecs.items()}
    bucket = {
        (i, t): sum(
            (1 << p)
            for p in range(n_planes)
            if sum(a * b for a, b in zip(qv[i], w(t, p))) > 0
        )
        for i in vecs
        for t in range(n_tables)
    }
    queries = [0, 2]
    expected = []
    for qi in queries:
        cands = {
            c
            for c in vecs
            if c != qi
            and any(bucket[(qi, t)] == bucket[(c, t)] for t in range(n_tables))
        }
        scored = sorted(
            (
                (
                    -sum(a * b for a, b in zip(qv[qi], qv[c]))
                    / (
                        math.sqrt(sum(a * a for a in qv[qi]))
                        * math.sqrt(sum(b * b for b in qv[c]))
                    ),
                    c,
                )
                for c in cands
            ),
        )[:k]
        for rank, (neg_cos, c) in enumerate(scored, 1):
            expected.append(
                (qi, c, math.floor(-neg_cos * 1e6 + 0.5) / 1e6, rank)
            )

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    got = [
        (r.query_id, r.neighbor_id, r.cos_q6, r.rank)
        for r in sim.lsh_md5_topk(
            df.filter(F.col("vec_id").isin(queries)),
            df,
            dim=dim,
            k=k,
            n_planes=n_planes,
            n_tables=n_tables,
        )
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert sorted(got) == sorted(expected)
    assert (0, 4, 1.0, 1) in got  # the exact dup ranks first at cos 1.0


@pytest.mark.parametrize(
    "sf_dir",
    [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ],
)
def test_hll_rollup_holds_lgk_error_bound(spark, sf_dir):
    """Round 7 (VERDICT r6 #7): replace the flat ±5% HLL tolerance
    with the sketch's OWN accuracy contract. Spark's hll_sketch_agg is
    an Apache DataSketches HLL_4 at default lgConfigK=12, whose
    published relative standard error is 1.04/sqrt(2^lgK) ≈ 1.625%;
    we assert every key's estimate is inside 3·RSE (≈ 4.88%) of the
    EXACT bitmap rollup — same keys, same partials pattern, so the
    comparison also re-proves partial-merge correctness — at all
    three SFs. Statistically this is a >=99.7% per-key bound; it holds
    deterministically here because the estimator is seed-fixed, so any
    future drift past it means the sketch config or merge changed."""
    from big_data_project_implementation_spark.operators import sketch
    from big_data_project_implementation_spark.sources.catalog import load_table

    lgk = 12
    rse = 1.04 / (2 ** (lgk / 2))
    ev_df = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    est = {
        r.event_type: r.approx_distinct_ids
        for r in sketch.hll_distinct_rollup(
            ev_df, ["event_type"], "day", "user_id"
        ).collect()
    }
    exact = {
        r.event_type: r.distinct_ids
        for r in sketch.bitmap_distinct_rollup(
            ev_df, ["event_type"], "day", "user_id"
        ).collect()
    }
    assert set(est) == set(exact)
    for key, v in exact.items():
        bound = max(2, 3 * rse * v)
        assert abs(est[key] - v) <= bound, (sf_dir, key, est[key], v, bound)


def test_classifier_step_certified_matches_python_recompute(spark):
    """The certified first gradient step (md5 buckets, integer
    micro-unit features, w=0 so sigmoid ≡ 0.5 exactly) recomputed in
    pure Python — the third independent implementation alongside Spark
    and the DuckDB gate oracle (the md5-certification convention)."""
    import hashlib

    nf = 8
    rows = [
        (1, "a b a", "en"),
        (2, "c d", "fr"),
        (3, "a d", "en"),
        (4, "c c b", "de"),
        (5, None, "en"),  # NULL text drops out entirely
        (6, "", "fr"),  # no non-empty tokens -> drops out
    ]

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % nf

    agg: dict[int, int] = {}
    n_docs = 0
    for _id, txt, lang in rows:
        if not txt:
            continue
        toks = [w for w in txt.lower().split(" ") if w]
        if not toks:
            continue
        n_docs += 1
        y = 1 if lang == "en" else 0
        s = 1 - 2 * y
        counts: dict[int, int] = {}
        for w in toks:
            counts[bucket(w)] = counts.get(bucket(w), 0) + 1
        for pos, c in counts.items():
            agg[pos] = agg.get(pos, 0) + (c * 1_000_000 // len(toks)) * s
        agg[nf] = agg.get(nf, 0) + 1_000_000 * s  # bias

    from big_data_project_implementation_spark.operators import text as T

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.pos: (r.g2n_q6, r.n_docs)
        for r in T.classifier_gradient_step_q(
            df, label=F.col("lang") == "en", n_features=nf
        ).collect()
    }
    assert got == {pos: (g, n_docs) for pos, g in agg.items()}


def test_minhash_star_mode_matches_pairs_mode_components(spark):
    """mode="star" emits a spanning SUBSET of mode="pairs" whose
    transitive closure is the same wherever hub edges pass the verify
    (round 7: the 100× probe measured 749M verified pairs under
    all-pairs family enumeration — the clustering consumer needs
    connectivity, not enumeration). On this corpus of exact + near
    dup families the components must be identical, and the star edge
    count must be linear in family size, not quadratic."""
    from big_data_project_implementation_spark.operators import dedup

    fam = [
        (i, "the quick brown fox jumps over the lazy dog " + ("extra" if i % 2 else ""))
        for i in range(10)
    ]
    other = [(20 + i, f"document number {i} about completely distinct topic {i}") for i in range(5)]
    df = spark.createDataFrame(fam + other, "doc_id long, text string")
    kw = dict(text_col="text", id_col="doc_id", k=1, num_hashes=32, bands=8, threshold=0.7)

    pairs = dedup.minhash_lsh_pairs(df, **kw)
    star = dedup.minhash_lsh_pairs(df, mode="star", **kw)
    n_pairs, n_star = pairs.count(), star.count()
    assert n_star <= n_pairs
    assert n_star <= 10 * 9  # linear-ish: ≤ (docs × bands), not C(10,2)×dups

    def comps(edges):
        out = dedup.assign_dedup_clusters(df, edges, id_col="doc_id")
        return {(r.doc_id, r.component) for r in out.collect()}

    assert comps(star) == comps(pairs)


def test_minhash_signature_projection_matches_aggregation(spark):
    """dedup.minhash_md5_signature (the stream-safe single-projection
    form) must be value-identical to minhash_md5_pairs' explode+groupBy
    signature on every doc — including the short-doc whole-text shingle
    clamp — or the streaming near-dup gate silently diverges from the
    certified batch family."""
    from big_data_project_implementation_spark.operators import dedup

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "short doc"),  # < k tokens: whole-doc shingle clamp
        (3, "Tabs\tand   space   runs normalize\nidentically"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, nh = 3, 8
    proj = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", dedup.minhash_md5_signature("text", k=k, num_hashes=nh).alias("sig")
        ).collect()
    }
    agg = {
        r.id: [r[f"h{i}"] for i in range(nh)]
        for r in (
            df.select(F.col("doc_id").alias("id"), F.explode(dedup.shingles("text", k)).alias("s"))
            .groupBy("id")
            .agg(
                *[
                    F.min(
                        dedup._md5long(F.concat(F.lit(f"mh{i}:"), F.col("s")))
                    ).alias(f"h{i}")
                    for i in range(nh)
                ]
            )
            .collect()
        )
    }
    assert proj == agg


def test_classifier_auc_matches_reference_with_ties(spark):
    """classifier_auc's grouped-rank formulation must equal the
    textbook Mann-Whitney AUC with average-rank ties, recomputed in
    pure Python on data with heavy ties and unsorted arrival order."""
    rows = [
        # (score, label): ties across and within classes
        (0.1, 0), (0.1, 1), (0.4, 0), (0.4, 0), (0.4, 1),
        (0.7, 1), (0.7, 1), (0.2, 0), (0.9, 1), (0.9, 0),
    ]
    df = spark.createDataFrame(rows, "s double, y int")
    got = text.classifier_auc(
        df, score_col="s", label=F.col("y") == 1
    ).collect()[0]

    # pure-python reference: average ranks
    scores = sorted(range(len(rows)), key=lambda i: rows[i][0])
    ranks = [0.0] * len(rows)
    i = 0
    while i < len(scores):
        j = i
        while j < len(scores) and rows[scores[j]][0] == rows[scores[i]][0]:
            j += 1
        avg = (i + 1 + j) / 2  # average of ranks i+1..j
        for t_ in range(i, j):
            ranks[scores[t_]] = avg
        i = j
    n_pos = sum(y for _, y in rows)
    n_neg = len(rows) - n_pos
    r_pos = sum(r for r, (_, y) in zip(ranks, rows) if y)
    auc = (r_pos - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    assert (got.n_pos, got.n_neg) == (n_pos, n_neg)
    assert got.auc_num / got.auc_den == auc
    assert abs(got.auc_q6 - auc) < 1e-6
    # sanity: a perfect ranking scores 1.0 and a random one ~0.5
    perfect = spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)], "s double, y int"
    )
    assert text.classifier_auc(
        perfect, "s", F.col("y") == 1
    ).collect()[0].auc_q6 == 1.0


def test_classifier_reliability_bins_are_integer_exact(spark):
    """Bin boundaries come from integer arithmetic on the 4dp-scaled
    score: 0.3 lands in bin 3, not bin 2 (floor(0.3*10) on a double is
    2 — the misrounding the operator exists to avoid)."""
    df = spark.createDataFrame(
        [(0.3, 1), (0.2999, 0), (0.9999, 1), (1.0, 1), (0.0, 0)],
        "s double, y int",
    )
    out = {r.bin: (r.n, r.n_pos) for r in text.classifier_reliability(
        df, "s", F.col("y") == 1, bins=10
    ).collect()}
    assert out == {0: (1, 0), 2: (1, 0), 3: (1, 1), 9: (2, 2)}


def test_filter_agreement_kappa_matches_reference(spark):
    """filter_agreement's exact rational must equal the textbook
    Cohen's kappa on a hand-checkable contingency table."""
    rows = [(1, 1)] * 40 + [(0, 0)] * 30 + [(1, 0)] * 20 + [(0, 1)] * 10
    df = spark.createDataFrame(rows, "a int, b int")
    got = text.filter_agreement(
        df, F.col("a") == 1, F.col("b") == 1
    ).collect()[0]
    from fractions import Fraction

    n, n11, n00, n10, n01 = 100, 40, 30, 20, 10
    po = Fraction(n11 + n00, n)
    pe = Fraction(
        (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10), n**2
    )
    kappa = (po - pe) / (1 - pe)
    assert (got.n, got.n00, got.n01, got.n10, got.n11) == (n, n00, n01, n10, n11)
    assert Fraction(got.kappa_num, got.kappa_den) == kappa
    assert abs(got.kappa_q6 - float(kappa)) < 1e-6
    # degenerate guards: perfect agreement is exactly 1
    same = spark.createDataFrame([(1, 1)] * 3 + [(0, 0)] * 2, "a int, b int")
    assert text.filter_agreement(
        same, F.col("a") == 1, F.col("b") == 1
    ).collect()[0].kappa_q6 == 1.0


def test_score_drift_tv_matches_reference(spark):
    """score_drift's exact rational TV must equal the hand-computed
    total-variation distance on disjoint and identical slices."""
    from fractions import Fraction

    a = spark.createDataFrame([(0.05,), (0.15,), (0.15,), (0.95,)], "s double")
    b = spark.createDataFrame([(0.15,), (0.85,), (0.95,), (0.95,)], "s double")
    rows = text.score_drift(a, b, score_col="s", bins=10).collect()
    got_tv = Fraction(rows[0].tv_num, rows[0].tv_den)
    # bins: a -> {0:1, 1:2, 9:1}; b -> {1:1, 8:1, 9:2}; n=4 each
    expect = Fraction(1, 2) * (
        Fraction(1, 4) + abs(Fraction(2, 4) - Fraction(1, 4))
        + Fraction(1, 4) + abs(Fraction(1, 4) - Fraction(2, 4))
    )
    assert got_tv == expect
    assert {(r.bin, r.n_a, r.n_b) for r in rows} == {
        (0, 1, 0), (1, 2, 1), (8, 0, 1), (9, 1, 2)
    }
    # identical slices: TV exactly 0
    same = text.score_drift(a, a, score_col="s", bins=10).collect()
    assert same[0].tv_num == 0 and same[0].tv_q6 == 0.0
