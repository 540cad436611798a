"""Round-9 additions: loud-failure guard on classifier_pr_curve's
zero-positive degenerate input (ADVICE r8 — the one 'div 0 → silent
NULL' site the round-8 assert_true sweep missed), and the Kafka sink's
NULL-partition routing contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import text


def test_classifier_pr_curve_zero_positives_fails_loudly(spark):
    """Recall with pos=0 must raise (assert_true convention), not emit
    a silent-NULL recall a hash gate could certify."""
    df = spark.createDataFrame(
        [(i, 0.1 * (i % 10)) for i in range(20)], "id long, score double"
    )
    out = text.classifier_pr_curve(df, "score", F.lit(0))
    with pytest.raises(Exception, match="zero positive labels"):
        out.collect()
    # valid input still yields the exact curve, recall non-null
    ok = text.classifier_pr_curve(
        df, "score", (F.col("id") >= 10).cast("int")
    )
    rows = ok.collect()
    assert rows and all(r.recall_q6 is not None for r in rows)
    # bin 0 keeps everything: recall 1.0 exactly
    assert rows[0].recall_q6 == 1.0


def test_ann_index_claim_survives_concurrent_builders(spark, tmp_path):
    """VERDICT r8 stretch: race two builders through the cached-index
    claim path (pipeline_q._ann_index_cached). Contract under race:
    both callers get the SAME path, the published index is complete,
    a COMPLETE index is never deleted by a later claimer (sentinel
    survives), and every caller serves identical answers."""
    import os
    import shutil
    import threading
    import uuid

    from big_data_project_implementation_spark.operators import (
        similarity as sim,
    )
    from big_data_project_implementation_spark.queries.pipeline_q import (
        _ann_index_cached,
    )
    from big_data_project_implementation_spark.queries.registry import t
    from tests.conftest import SF_DIR

    emb = t(spark, SF_DIR, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    variant = f"_race_{uuid.uuid4().hex[:8]}"

    def serve(path):
        return sorted(
            tuple(r)
            for r in sim.ivfpq_topk_from_index(
                qs, emb, path, k=5, nprobe=4, refine=16
            ).collect()
        )

    results: list = [None, None]
    errs: list = []

    def build(i):
        try:
            p = _ann_index_cached(emb, SF_DIR, variant=variant)
            results[i] = (p, serve(p))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [
        threading.Thread(target=build, args=(i,)) for i in range(2)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    (p0, a0), (p1, a1) = results
    assert p0 == p1
    assert os.path.exists(os.path.join(p0, "codes", "_SUCCESS"))
    assert a0 == a1 and len(a0) == 25
    try:
        # a COMPLETE index must never be claimed-and-deleted: stamp a
        # sentinel inside it, race two more claimers, sentinel lives
        sentinel = os.path.join(p0, "SENTINEL")
        open(sentinel, "w").write("complete-index-must-survive")
        threads = [
            threading.Thread(target=build, args=(i,)) for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs, errs
        assert os.path.exists(sentinel), "complete index was rebuilt"
        assert results[0][0] == p0 and results[0][1] == a0

        # repair race: kill the _SUCCESS marker (dead partial build) —
        # two concurrent repairers must produce ONE complete index and
        # never rmtree the same live path out from under each other
        os.remove(os.path.join(p0, "codes", "_SUCCESS"))
        threads = [
            threading.Thread(target=build, args=(i,)) for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errs, errs
        assert os.path.exists(os.path.join(p0, "codes", "_SUCCESS"))
        assert results[0][1] == a0 == results[1][1]
    finally:
        shutil.rmtree(p0, ignore_errors=True)


def test_neardup_verdict_xxhash64_family_catches_exact_dups(spark):
    """The uncertified xxhash64 variant of the verdict gate (round 9 —
    the family a deployment swaps in when it doesn't need DuckDB
    replay; SCALING.md quantifies the swap) must behave as the same
    GATE: an arriving doc whose text is byte-identical to a corpus doc
    has an identical signature in ANY hash family, collides on every
    band, agrees on all hashes — so every corpus member with a
    signature MUST receive a verdict, with max_agree == num_hashes,
    and the per-doc output shape holds."""
    import shutil
    import tempfile

    from big_data_project_implementation_spark.operators import dedup
    from big_data_project_implementation_spark.queries.streaming_q import (
        _neardup_verdict_machinery,
    )
    from tests.conftest import SF_DIR

    out_dir = tempfile.mkdtemp(prefix="verdict_xx_out_")
    ckpt = tempfile.mkdtemp(prefix="verdict_xx_ckpt_")
    build, gate = _neardup_verdict_machinery(
        spark, SF_DIR, out_dir, hash_family="xxhash64"
    )
    try:
        sub = spark.newSession()
        sub.conf.set("spark.sql.shuffle.partitions", "8")
        q = (
            build(sub)
            .writeStream.foreachBatch(gate)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = (
            spark.read.option("basePath", out_dir)
            .parquet(f"{out_dir}/batch_id=*")
            .select("arriving_id", "best_match", "max_agree", "n_matches")
            .collect()
        )
        got = {r.arriving_id: r for r in rows}
        assert len(got) == len(rows), "more than one verdict per doc"
        # every corpus doc (even doc_id, non-null signature) is its own
        # exact dup: all 8 hashes agree
        corpus = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter((F.col("doc_id") % 2 == 0) & F.col("text").isNotNull())
            .select(
                "doc_id",
                dedup.minhash_signature(
                    dedup.shingles("text", 3), num_hashes=8
                ).alias("sig"),
            )
            .filter(F.element_at("sig", 1).isNotNull())
        )
        for cid in (r.doc_id for r in corpus.collect()):
            assert cid in got, f"corpus doc {cid} missed by its exact dup"
            assert got[cid].max_agree == 8
        assert all(r.n_matches >= 1 for r in rows)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_neardup_verdict_rejects_unknown_hash_family(spark):
    import pytest as _pytest

    from big_data_project_implementation_spark.queries.streaming_q import (
        _neardup_verdict_machinery,
    )
    from tests.conftest import SF_DIR

    with _pytest.raises(ValueError, match="unknown hash_family"):
        _neardup_verdict_machinery(
            spark, SF_DIR, "/tmp/x", hash_family="sha1"
        )


def test_minhash_md5_signatures_groupby_matches_projection(spark):
    """The round-9 codegen form (dedup.minhash_md5_signatures) must be
    value-identical to the HOF projection form on every doc — short-doc
    shingle clamp, whitespace normalization, NULL text (all-null
    signature row kept), and duplicate shingles included — or the gate
    rows silently diverge from the certified md5 family."""
    from big_data_project_implementation_spark.operators import dedup

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "short doc"),
        (3, "Tabs\tand   space   runs normalize\nidentically"),
        (4, None),
        (5, "dup dup dup dup dup dup dup dup"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    k, nh = 3, 8
    proj = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id",
            dedup.minhash_md5_signature(
                "text", k=k, num_hashes=nh
            ).alias("sig"),
        ).collect()
    }
    agg = {
        r.id: r.sig
        for r in dedup.minhash_md5_signatures(
            df, "text", "doc_id", k=k, num_hashes=nh
        ).collect()
    }
    assert agg == proj
    assert agg[4] == [None] * nh  # NULL text keeps an all-null row


def test_delta_join_refresh_bag_semantics_and_empty_deltas(spark):
    """delta_join_refresh == full recompute under BAG semantics: hand
    data with duplicate join keys and duplicate ROWS on both sides
    (multiplicities must survive — a set-semantics union would eat
    them), plus the empty-delta and delta-only-match edge cases."""
    from big_data_project_implementation_spark.operators import relational

    a_old = spark.createDataFrame(
        [(1, "a1"), (1, "a1"), (2, "a2")], "k long, av string"
    )
    delta_a = spark.createDataFrame(
        [(2, "a2"), (3, "a3")], "k long, av string"
    )
    b_old = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2")], "k long, bv string"
    )
    delta_b = spark.createDataFrame(
        [(1, "b1x"), (3, "b3"), (3, "b3")], "k long, bv string"
    )

    def bag(df):
        out: dict = {}
        for r in df.collect():
            key = tuple(r)
            out[key] = out.get(key, 0) + 1
        return out

    view = a_old.join(b_old, ["k"])
    refreshed = relational.delta_join_refresh(
        view, a_old, delta_a, b_old, delta_b, on=["k"]
    )
    full = a_old.unionByName(delta_a).join(
        b_old.unionByName(delta_b), ["k"]
    )
    assert bag(refreshed) == bag(full)
    # key 3 matches only delta x delta: the cross-delta term must fire
    assert bag(refreshed)[(3, "a3", "b3")] == 2

    # empty deltas: refresh is exactly the view
    empty_a = delta_a.filter(F.lit(False))
    empty_b = delta_b.filter(F.lit(False))
    same = relational.delta_join_refresh(
        view, a_old, empty_a, b_old, empty_b, on=["k"]
    )
    assert bag(same) == bag(view)
    # broadcast_deltas=False path is value-identical
    plain = relational.delta_join_refresh(
        view, a_old, delta_a, b_old, delta_b, on=["k"],
        broadcast_deltas=False,
    )
    assert bag(plain) == bag(full)


def test_delta_join_increment_is_exactly_the_new_rows(spark):
    """delta_join_increment == full recompute MINUS the old view under
    bag semantics (the append contract): every new-contributor row
    exactly once, no old-view row re-emitted."""
    from big_data_project_implementation_spark.operators import relational

    a_old = spark.createDataFrame(
        [(1, "a1"), (1, "a1"), (2, "a2")], "k long, av string"
    )
    delta_a = spark.createDataFrame(
        [(2, "a2"), (3, "a3")], "k long, av string"
    )
    b_old = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2")], "k long, bv string"
    )
    delta_b = spark.createDataFrame(
        [(1, "b1x"), (3, "b3"), (3, "b3")], "k long, bv string"
    )

    def bag(df):
        out: dict = {}
        for r in df.collect():
            key = tuple(r)
            out[key] = out.get(key, 0) + 1
        return out

    inc = bag(
        relational.delta_join_increment(
            a_old, delta_a, b_old, delta_b, on=["k"]
        )
    )
    full = bag(
        a_old.unionByName(delta_a).join(b_old.unionByName(delta_b), ["k"])
    )
    view = bag(a_old.join(b_old, ["k"]))
    want = {
        key: n - view.get(key, 0)
        for key, n in full.items()
        if n - view.get(key, 0) > 0
    }
    assert inc == want
    # and view ⊎ increment == full (the refresh identity)
    merged = dict(view)
    for key, n in inc.items():
        merged[key] = merged.get(key, 0) + n
    assert merged == full


def test_delta_join_retract_bag_semantics(spark):
    """delta_join_retract == post-delete recompute under BAG
    semantics: duplicates, a row deleted on BOTH sides (must be
    removed once, not twice), and empty retractions."""
    from big_data_project_implementation_spark.operators import relational

    a = spark.createDataFrame(
        [(1, "a1"), (1, "a1"), (2, "a2"), (3, "a3")], "k long, av string"
    )
    b = spark.createDataFrame(
        [(1, "b1"), (2, "b2"), (2, "b2"), (3, "b3")], "k long, bv string"
    )
    # delete one copy of (1, a1) and one copy of (2, b2); key 3 deleted
    # on BOTH sides -> its pair must vanish exactly once
    ra = spark.createDataFrame([(1, "a1"), (3, "a3")], "k long, av string")
    rb = spark.createDataFrame([(2, "b2"), (3, "b3")], "k long, bv string")
    a_new = a.exceptAll(ra)
    b_new = b.exceptAll(rb)

    def bag(df):
        out: dict = {}
        for r in df.collect():
            key = tuple(r)
            out[key] = out.get(key, 0) + 1
        return out

    view = a.join(b, ["k"])
    kept = relational.delta_join_retract(
        view, a_new, ra, b_new, rb, on=["k"]
    )
    assert bag(kept) == bag(a_new.join(b_new, ["k"]))
    # (1, a1, b1) had 2 copies, one contributor deleted -> 1 remains
    assert bag(kept)[(1, "a1", "b1")] == 1
    assert (3, "a3", "b3") not in bag(kept)
    # empty retractions: view unchanged
    none_a = ra.filter(F.lit(False))
    none_b = rb.filter(F.lit(False))
    same = relational.delta_join_retract(
        view, a, none_a, b, none_b, on=["k"]
    )
    assert bag(same) == bag(view)


def test_ivm_join_algebra_property(spark):
    """Property test over the full IVM join algebra: for random bags
    with duplicate keys and duplicate rows, random append deltas and
    random sub-bag deletions — increment == full − view,
    refresh == recompute, retract == post-delete recompute. Driven by
    hypothesis over compact integer encodings (one Spark plan per
    example is slow, so examples are few but adversarial: heavy key
    collision by construction)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from big_data_project_implementation_spark.operators import relational

    row = st.tuples(st.integers(0, 3), st.integers(0, 2))  # (key, value)
    bags = st.tuples(
        st.lists(row, min_size=0, max_size=6),  # a_old
        st.lists(row, min_size=0, max_size=4),  # delta_a
        st.lists(row, min_size=0, max_size=6),  # b_old
        st.lists(row, min_size=0, max_size=4),  # delta_b
    )

    def bag(df):
        out: dict = {}
        for r in df.collect():
            key = tuple(r)
            out[key] = out.get(key, 0) + 1
        return out

    def mk(rows, col):
        return spark.createDataFrame(
            [(k, f"{col}{v}") for k, v in rows] or [(None, None)],
            f"k long, {col}v string",
        ).filter(F.col("k").isNotNull())

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(bags)
    def check(data):
        ra, da, rb, db = data
        a_old, delta_a = mk(ra, "a"), mk(da, "a")
        b_old, delta_b = mk(rb, "b"), mk(db, "b")
        view = a_old.join(b_old, ["k"])
        full = a_old.unionByName(delta_a).join(
            b_old.unionByName(delta_b), ["k"]
        )
        fb, vb = bag(full), bag(view)
        # refresh == recompute
        assert bag(
            relational.delta_join_refresh(
                view, a_old, delta_a, b_old, delta_b, on=["k"]
            )
        ) == fb
        # increment == full − view
        want_inc = {
            key: n - vb.get(key, 0)
            for key, n in fb.items()
            if n - vb.get(key, 0) > 0
        }
        assert bag(
            relational.delta_join_increment(
                a_old, delta_a, b_old, delta_b, on=["k"]
            )
        ) == want_inc
        # retract: delete the deltas back OUT of the full view
        assert bag(
            relational.delta_join_retract(
                full, a_old, delta_a, b_old, delta_b, on=["k"]
            )
        ) == vb

    check()


def test_retract_agg_state_repairs_only_touched_extremes(spark):
    """retract_agg_state: n/sum retract by arithmetic everywhere;
    min/max recount ONLY where the deleted extreme touched the state
    extreme. Hand case with one key per branch: untouched-extremes
    (arithmetic only), deleted-min (repair), deleted-max (repair),
    fully-deleted key (drops out), untouched key (passes through)."""
    from big_data_project_implementation_spark.operators import relational

    rows = [
        # key 'arith': delete a MIDDLE value -> min/max survive as-is
        ("arith", 1), ("arith", 5), ("arith", 9),
        # key 'remin': delete the MIN -> repair must rescan
        ("remin", 2), ("remin", 6), ("remin", 8),
        # key 'remax': delete the MAX -> repair must rescan
        ("remax", 3), ("remax", 4), ("remax", 7),
        # key 'gone': every row deleted -> key drops out
        ("gone", 10), ("gone", 11),
        # key 'keep': nothing deleted -> passes through
        ("keep", 42),
    ]
    deleted_rows = [
        ("arith", 5), ("remin", 2), ("remax", 7), ("gone", 10), ("gone", 11),
    ]
    base = spark.createDataFrame(rows, "k string, v long")
    deleted = spark.createDataFrame(deleted_rows, "k string, v long")
    remaining = base.exceptAll(deleted)
    state = relational.mergeable_agg_state(base, ["k"], "v")
    got = {
        r.k: (r.n, r.sum, r.min, r.max)
        for r in relational.retract_agg_state(
            state, deleted, remaining, ["k"], "v"
        ).collect()
    }
    want = {
        r.k: (r.n, r.sum, r.min, r.max)
        for r in relational.mergeable_agg_state(
            remaining, ["k"], "v"
        ).collect()
    }
    assert got == want
    assert "gone" not in got
    assert got["arith"] == (2, 10, 1, 9)
    assert got["remin"] == (2, 14, 6, 8)
    assert got["remax"] == (2, 7, 3, 4)
    assert got["keep"] == (1, 42, 42, 42)


def test_ab_welch_t2_matches_textbook_and_fails_loudly(spark):
    """ab_welch_t2's exact rational equals the textbook Welch t²
    recomputed in pure Python floats (to q6 floor precision), heavy
    units collapse to one sample each, and degenerate inputs raise."""
    from big_data_project_implementation_spark.operators import events as ev

    rows = [
        # (unit, variant, x)  — variant 0: [3,5,4,6]; variant 1: [7,8,6]
        (1, 0, 3), (2, 0, 5), (3, 0, 4), (4, 0, 6),
        (5, 1, 7), (6, 1, 8), (7, 1, 6),
    ]
    # a heavy unit: unit 1's metric arrives as three events summing to 3
    df = spark.createDataFrame(
        [(1, 0, 1), (1, 0, 1), (1, 0, 1)]
        + [r for r in rows if r[0] != 1],
        "u long, v int, x long",
    )
    out = ev.ab_welch_t2(
        df, variant=F.col("v"), metric=F.col("x"), unit_col="u"
    ).collect()[0]
    assert out.n_a == 4 and out.n_b == 3
    assert out.sum_a == 18 and out.sum_b == 21

    def welch_t2(xs, ys):
        import statistics as st

        m1, m2 = st.mean(xs), st.mean(ys)
        v1, v2 = st.variance(xs), st.variance(ys)
        return (m1 - m2) ** 2 / (v1 / len(xs) + v2 / len(ys))

    want = welch_t2([3, 5, 4, 6], [7, 8, 6])
    assert abs(out.t2_q6 - want) < 1e-6 + 1e-9 * want
    # one-unit variant: undefined, must raise (not NaN/NULL)
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(1, 0, 3), (2, 0, 5), (3, 1, 7)], "u long, v int, x long"
    )
    with _pytest.raises(Exception, match="ab_welch_t2 undefined"):
        ev.ab_welch_t2(
            bad, variant=F.col("v"), metric=F.col("x"), unit_col="u"
        ).collect()
