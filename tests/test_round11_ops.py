"""Round-11 operator tests — the ADVICE round-10 fixes first:
null-safe top-k view maintenance, compaction manifest durability /
quarantine, numeric compacted-segment ids, and the huge-denominator
t2_q6 branch certified against exact Python-int floor division."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_implementation_spark.operators import events, relational


def _canon(df):
    return sorted(
        tuple((x is None, x) for x in r) for r in df.collect()
    )


def _topk(df, keys, order, k):
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


@pytest.mark.parametrize("broadcast", [True, False])
def test_topk_view_refresh_null_keyed_group_reranks_as_one(spark, broadcast):
    """ADVICE r10 (medium): the touched/untouched split must treat a
    NULL group key like ROW_NUMBER's partitioning does (NULLs group
    together) — with plain column-name joins the NULL group's state
    rows pass through as untouched while its delta rows re-rank
    separately, yielding more than k rows for that group."""
    base = spark.createDataFrame(
        [(None, 5, 1), (None, 3, 2), (None, 8, 3), (1, 9, 4), (1, 7, 5)],
        "g int, v int, tb int",
    )
    order = [F.col("v").asc(), F.col("tb").asc()]
    state = _topk(base, ["g"], order, 2)
    delta = spark.createDataFrame(
        [(None, 1, 6), (2, 4, 7)], "g int, v int, tb int"
    )
    got = relational.topk_view_refresh(
        state, delta, ["g"], order, 2, broadcast_deltas=broadcast
    )
    want = _topk(base.unionByName(delta), ["g"], order, 2)
    assert _canon(got) == _canon(want)
    # the NULL group holds exactly k rows, not k + pass-through
    assert sum(1 for r in got.collect() if r["g"] is None) == 2


@pytest.mark.parametrize("broadcast", [True, False])
def test_topk_view_retract_null_value_row_is_detected(spark, broadcast):
    """ADVICE r10 (medium): a deleted STORED row carrying a NULL in a
    non-key column must still flag its group as broken (value-level
    eqNullSafe semi join); under plain equality the dead row survived
    in the view, silently breaking refresh == recompute."""
    base = spark.createDataFrame(
        [(1, None, 1), (1, 4, 2), (1, 9, 3), (None, 2, 4), (None, 6, 5)],
        "g int, v int, tb int",
    )
    # nulls first so the (1, NULL) row is INSIDE the stored top-2
    order = [F.col("v").asc_nulls_first(), F.col("tb").asc()]
    state = _topk(base, ["g"], order, 2)
    retract = spark.createDataFrame(
        [(1, None, 1), (None, 2, 4)], "g int, v int, tb int"
    )
    remaining = base.exceptAll(retract)
    got = relational.topk_view_retract(
        state, retract, remaining, ["g"], order, 2,
        broadcast_deltas=broadcast,
    )
    want = _topk(remaining, ["g"], order, 2)
    assert _canon(got) == _canon(want)
    vals = {(r["g"], r["v"], r["tb"]) for r in got.collect()}
    assert (1, None, 1) not in vals  # the dead NULL-valued row is gone


def test_compact_batch_view_numeric_ids_and_manifest_quarantine(spark):
    """ADVICE r10 (low x2): compacted segments use NEGATIVE numeric
    batch ids so the inferred partition column stays an integer for
    every basePath reader; and a corrupt manifest is quarantined by
    recovery instead of wedging every future compaction."""
    from big_data_project_implementation_spark import streaming as st_mod

    out_dir = tempfile.mkdtemp(prefix="compact_r11_")
    try:
        base = spark.range(0, 30).selectExpr("id", "id % 3 AS v")
        for b in range(4):
            base.filter(F.col("id") % 4 == b).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/batch_id={b}")
        n, seg = st_mod.compact_batch_view(spark, out_dir, keep_last=1)
        assert n == 3 and seg == "batch_id=-1"
        read = spark.read.option("basePath", out_dir).parquet(
            f"{out_dir}/batch_id=*"
        )
        # partition column inferred as an integer type, not string
        assert dict(read.dtypes)["batch_id"] in ("int", "bigint")
        assert read.count() == 30
        assert set(
            r["batch_id"] for r in read.select("batch_id").distinct().collect()
        ) == {-1, 3}

        # corrupt the manifest: recovery quarantines it and returns,
        # and a subsequent compaction still runs (folds -1 + 3 in)
        mf = f"{out_dir}/batch_id=-1/_COMPACTED_IDS"
        with open(mf, "w") as fh:
            fh.write('["batch_id=0", "batch_id')  # truncated json
        assert st_mod.recover_batch_view_compaction(out_dir) == 0
        assert not os.path.exists(mf)
        assert os.path.exists(mf + ".corrupt")
        base.filter(F.col("id") % 4 == 0).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id=4"
        )
        n2, seg2 = st_mod.compact_batch_view(spark, out_dir, keep_last=1)
        assert n2 == 2 and seg2 == "batch_id=-2"
        again = spark.read.option("basePath", out_dir).parquet(
            f"{out_dir}/batch_id=*"
        )
        assert again.count() == 30 + base.filter(F.col("id") % 4 == 0).count()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _welch_exact_q6(rows):
    """Exact-rational Welch t² floor at the 10⁻⁶ quantum, in unbounded
    Python ints — the independent oracle for the pre-shrink branch."""
    a = [x for v, x in rows if v == 0]
    b = [x for v, x in rows if v == 1]
    na, nb = len(a), len(b)
    s1a, s1b = sum(a), sum(b)
    s2a, s2b = sum(x * x for x in a), sum(x * x for x in b)
    num = (s1a * nb - s1b * na) ** 2 * (na - 1) * (nb - 1)
    ta = (na * s2a - s1a * s1a) * nb * nb * (nb - 1)
    tb = (nb * s2b - s1b * s1b) * na * na * (na - 1)
    den = ta + tb
    return num, den, (num * 10**6) // den


@pytest.mark.parametrize(
    "n_per_arm, expect_shrink",
    [(2000, False), (12000, True)],
)
def test_ab_welch_t2_denominator_branches_vs_exact_floor(
    spark, n_per_arm, expect_shrink
):
    """ADVICE r10 (low): the den >= 1e32 pre-shrink branch of t2_q6 was
    certified only against a byte-identical oracle expression — here
    both branches are driven (the parametrization asserts which side
    of the boundary the data actually lands on) and compared to exact
    Python-int floor division: the exact branch must match to the last
    micro-unit, the pre-shrink branch within its documented ~4e-13
    relative envelope."""
    rows = []
    for i in range(n_per_arm):
        rows.append((0, (i * 137 + 11) % 2_000_001))
        rows.append((1, (i * 251 + 977_003) % 2_000_001))
    num, den, exact_floor_q6 = _welch_exact_q6(rows)
    assert (den >= 10**32) == expect_shrink, f"den={den:.3e}"
    df = spark.createDataFrame(
        [(v, i, x) for i, (v, x) in enumerate(rows)],
        "variant int, user_id bigint, x bigint",
    )
    out = events.ab_welch_t2(
        df, F.col("variant"), F.col("x"), unit_col="user_id"
    ).collect()[0]
    got = out["t2_q6"]
    exact = exact_floor_q6 / 1e6
    if expect_shrink:
        assert exact > 0
        assert abs(got - exact) <= max(1e-6, 5e-13 * exact)
    else:
        assert got == pytest.approx(exact, abs=0)


# ---- MaterializedView unified API (round 11, VERDICT r10 #1) ----------


def test_materialized_view_dispatch_contract(spark):
    """The declarative front door refuses malformed declarations
    loudly — wrong kind, missing parameters, keyed retraction on a
    non-inner view — instead of silently picking an algebra."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    with pytest.raises(ValueError, match="unknown view kind"):
        MaterializedView("outer", on=["k"])
    with pytest.raises(ValueError, match="join keys"):
        MaterializedView("inner")
    with pytest.raises(ValueError, match="needs keys"):
        MaterializedView("agg", value="v")
    with pytest.raises(ValueError, match="needs keys"):
        MaterializedView("topk", keys=["g"], k=2)
    with pytest.raises(ValueError, match="needs cols"):
        MaterializedView("distinct")
    with pytest.raises(ValueError, match="inner-join shape"):
        MaterializedView("left", on=["k"], a_id="id")
    with pytest.raises(ValueError, match="BOTH a_id and b_id"):
        MaterializedView("inner", on=["k"], a_id="rid")
    with pytest.raises(ValueError, match="True, False or 'auto'"):
        MaterializedView("inner", on=["k"], broadcast_deltas="maybe")
    mv = MaterializedView("semi", on=["k"])
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="join-view shape"):
        MaterializedView("agg", keys=["k"], value="k").increment(
            df, df, df, df
        )
    with pytest.raises(ValueError, match="no one-sided streaming"):
        mv.stream_gate("/tmp/nowhere", static_a=df)
    with pytest.raises(ValueError, match="distinct-view shape"):
        mv.apply(df, df, df)


def test_materialized_view_auto_broadcast_resolution(spark):
    """broadcast_deltas='auto' counts each delta with a LIMIT-bounded
    job: arrival-sized deltas resolve to a forced broadcast, a
    backfill-sized delta resolves to False (let AQE pick) — the
    round-9/10 driver-OOM lesson as an automatic policy."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    mv = MaterializedView(
        "inner", on=["k"], broadcast_deltas="auto", auto_broadcast_rows=100
    )
    small = spark.range(10).withColumnRenamed("id", "k")
    big = spark.range(1000).withColumnRenamed("id", "k")
    assert mv._bcast(small, small) is True
    assert mv._bcast(small, big) is False
    assert mv._bcast(None, small) is True
    # and the resolved flag feeds the certified algebra unchanged:
    # refresh == recompute either way
    a = spark.range(50).selectExpr("id AS k", "id * 2 AS av")
    b = spark.range(30).selectExpr("id AS k", "id + 7 AS bv")
    a_old, delta_a = a.filter("k < 40"), a.filter("k >= 40")
    b_old, delta_b = b.filter("k < 20"), b.filter("k >= 20")
    view = mv.compute(a_old, b_old)
    got = sorted(
        tuple(r)
        for r in mv.refresh(
            view, a_old=a_old, delta_a=delta_a, b_old=b_old, delta_b=delta_b
        ).collect()
    )
    want = sorted(tuple(r) for r in a.join(b, ["k"]).collect())
    assert got == want


def test_materialized_view_skew_advice(spark):
    """skew_advice surfaces key_skew_stats plus the decision rule: a
    tiny delta → broadcast; a dominant-key delta above the broadcast
    bound → AQE skew-split guidance."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    mv = MaterializedView("inner", on=["k"], auto_broadcast_rows=50)
    tiny = spark.range(10).withColumnRenamed("id", "k")
    adv = mv.skew_advice(tiny)
    assert adv["advice"].startswith("broadcast")
    hot = spark.range(500).selectExpr("CAST(id % 10 = 0 AS INT) * id AS k")
    adv2 = mv.skew_advice(hot)  # ~90% of rows share k=0
    assert adv2["n_rows"] == 500
    assert adv2["top_share"] > 0.2
    assert "AQE" in adv2["advice"]


def test_materialized_view_agg_topk_distinct_roundtrip(spark):
    """Single-base kinds through the unified surface: compute →
    refresh → retract equals recompute for agg, topk and distinct on
    the same CDC history (the API-level twin of the per-function
    round-9/10 tests)."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = spark.range(200).selectExpr(
        "id % 7 AS g", "id * 13 % 101 AS v", "id AS tb"
    )
    arrivals = spark.range(200, 260).selectExpr(
        "id % 7 AS g", "id * 13 % 101 AS v", "id AS tb"
    )
    full = base.unionByName(arrivals)
    dead = full.filter("tb % 9 = 0")
    remaining = full.filter("tb % 9 <> 0")

    # agg
    agg = MaterializedView("agg", keys=["g"], value="v")
    state = agg.retract(
        agg.refresh(agg.compute(base), delta=arrivals),
        deleted=dead,
        base_remaining=remaining,
    )
    want = agg.compute(remaining)
    assert sorted(map(tuple, state.collect())) == sorted(
        map(tuple, want.collect())
    )

    # topk
    topk = MaterializedView(
        "topk", keys=["g"], order_by=[F.col("v").desc(), F.col("tb").asc()],
        k=3,
    )
    tstate = topk.retract(
        topk.refresh(topk.compute(base), delta=arrivals),
        deleted=dead,
        base_remaining=remaining,
    )
    assert sorted(map(tuple, tstate.collect())) == sorted(
        map(tuple, topk.compute(remaining).collect())
    )

    # distinct (apply folds inserts and deletes in one CDC batch)
    dv = MaterializedView("distinct", cols=["g", "v"])
    dstate = dv.apply(dv.compute(base), inserts=arrivals, deletes=dead)
    got = sorted(map(tuple, dstate.select("g", "v").collect()))
    want_d = sorted(
        map(tuple, remaining.select("g", "v").distinct().collect())
    )
    assert got == want_d


def test_keylog_compaction_merges_by_distinct(spark):
    """compact_batch_view(distinct=True) — the key-log shape (VERDICT
    r10 #6): segments holding overlapping key sets consolidate to the
    distinct keys (bounded by key cardinality, not batch count), and
    the read-back key SET is unchanged mid-compaction."""
    from big_data_project_implementation_spark import streaming as st_mod

    out_dir = tempfile.mkdtemp(prefix="keylog_r11_")
    try:
        # 4 batches, heavy overlap: every batch re-announces keys 0-9
        for b in range(4):
            spark.range(10 + b).withColumnRenamed("id", "k").write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/batch_id={b}")

        def keyset():
            return set(
                r["k"]
                for r in spark.read.option("basePath", out_dir)
                .parquet(f"{out_dir}/batch_id=*")
                .select("k")
                .distinct()
                .collect()
            )

        before = keyset()
        n, seg = st_mod.compact_batch_view(
            spark, out_dir, keep_last=1, distinct=True
        )
        assert n == 3 and seg == "batch_id=-1"
        assert keyset() == before
        # the consolidated segment holds each key ONCE (12 keys from
        # batches 0-2), not sum-of-batches (10+11+12=33 rows)
        seg_rows = spark.read.parquet(f"{out_dir}/batch_id=-1").count()
        assert seg_rows == 12
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_prune_state_chain_keeps_replay_window(spark):
    """prune_state_chain retains the newest version AND its
    predecessor (the replay-read window) and removes older versions;
    idempotent on a pruned chain."""
    from big_data_project_implementation_spark import streaming as st_mod

    out_dir = tempfile.mkdtemp(prefix="chain_r11_")
    try:
        for v in range(5):
            spark.range(v + 1).write.mode("overwrite").parquet(
                f"{out_dir}/v={v}"
            )
        os.makedirs(f"{out_dir}/v=_tmp_stage")  # stray dir: must not wedge
        removed, newest = st_mod.prune_state_chain(out_dir, keep_last=1)
        assert removed == 3 and newest == "v=4"
        left = sorted(os.listdir(out_dir))
        assert left == ["v=3", "v=4", "v=_tmp_stage"]
        assert st_mod.prune_state_chain(out_dir, keep_last=1) == (0, "v=4")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("kind", ["topk", "distinct"])
def test_stream_view_twins_state_chain_replay_idempotent(spark, kind):
    """The round-11 streaming twins (VERDICT r10 #4): the top-k and
    DISTINCT view state chains are pure functions of (v=N-1, batch N),
    so a replayed batch rewrites its own version value-identically, a
    checkpointed restart replays nothing, and the final version equals
    the one-pass batch recompute over the full table."""
    import glob

    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )
    from big_data_project_implementation_spark.queries.registry import (
        events_stream,
        t,
    )

    state_dir = tempfile.mkdtemp(prefix=f"twin_{kind}_")
    ckpt = tempfile.mkdtemp(prefix=f"twin_{kind}_ckpt_")
    if kind == "topk":
        mv = MaterializedView(
            "topk",
            keys=["event_type"],
            order_by=[F.col("v_micro").desc(), F.col("event_id").asc()],
            k=5,
        )

        def prepare(df):
            return df.select(
                "event_type",
                "event_id",
                F.floor(F.col("value") * 1000000 + F.lit(0.5))
                .cast("bigint")
                .alias("v_micro"),
            )

    else:
        mv = MaterializedView("distinct", cols=["event_type", "user_bucket"])

        def prepare(df):
            return df.select(
                "event_type",
                (F.col("user_id") % 50).cast("bigint").alias("user_bucket"),
            )

    gate = mv.stream_gate(state_dir, prepare=prepare)

    def run_once():
        sub = spark.newSession()
        sub.conf.set("spark.sql.shuffle.partitions", "8")
        q = (
            events_stream(sub, SF_DIR, max_files_per_trigger=1)
            .writeStream.foreachBatch(gate)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def snapshot():
        return sorted(map(tuple, mv.stream_read(spark, state_dir).collect()))

    try:
        run_once()
        first = snapshot()
        assert first, "state chain is empty"
        full = prepare(t(spark, SF_DIR, "events"))
        if kind == "topk":
            truth = sorted(map(tuple, mv.compute(full).collect()))
        else:
            truth = sorted(
                map(tuple, full.select(*mv.cols).distinct().collect())
            )
        assert first == truth
        # empty-delta fold at a new version: identity on the view
        top = max(
            int(p.rsplit("=", 1)[1]) for p in glob.glob(f"{state_dir}/v=*")
        )
        gate(t(spark, SF_DIR, "events").limit(0), top + 1)
        assert snapshot() == first, "empty-delta fold changed the view"
        # checkpointed restart replays nothing
        run_once()
        assert snapshot() == first
        # retention: pruning old versions keeps the replay window
        from big_data_project_implementation_spark import streaming as st

        st.prune_state_chain(state_dir, keep_last=1)
        assert snapshot() == first
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@pytest.mark.parametrize("broadcast", [True, False])
def test_window_view_refresh_interleaved_arrivals_shift_later_rows(
    spark, broadcast
):
    """Round-11 window IVM: an arriving row that sorts BEFORE existing
    rows of its key must shift every later running value — and a NULL
    key is one window partition (null-safe key joins), matching the
    SUM-OVER recompute."""
    from big_data_project_implementation_spark.operators import relational

    base = spark.createDataFrame(
        [(1, 10, 5), (1, 30, 7), (None, 20, 11), (2, 40, 13)],
        "g int, seq int, v int",
    )
    order = [F.col("seq").asc()]
    state = relational.running_window_view(base, ["g"], order, "v", "rs")
    # seq=20 arrives for g=1 (shifts the seq=30 row); NULL key arrival
    delta = spark.createDataFrame(
        [(1, 20, 100), (None, 5, 3)], "g int, seq int, v int"
    )
    got = relational.window_view_refresh(
        state, delta, ["g"], order, "v", "rs", broadcast_deltas=broadcast
    )
    want = relational.running_window_view(
        base.unionByName(delta), ["g"], order, "v", "rs"
    )
    assert _canon(got) == _canon(want)
    g1 = {r["seq"]: r["rs"] for r in got.collect() if r["g"] == 1}
    assert g1 == {10: 5, 20: 105, 30: 112}  # the shift happened


@pytest.mark.parametrize("broadcast", [True, False])
def test_window_view_retract_shifts_without_base_rescan(spark, broadcast):
    """Round-11 window IVM deletions: removing a row re-windows its
    key from the SURVIVING STATE rows alone (state ⋉ keys exceptAll
    deleted) — equals the post-delete recompute."""
    from big_data_project_implementation_spark.operators import relational

    base = spark.createDataFrame(
        [(1, 10, 5), (1, 20, 7), (1, 30, 9), (2, 10, 2), (None, 10, 4)],
        "g int, seq int, v int",
    )
    order = [F.col("seq").asc()]
    state = relational.running_window_view(base, ["g"], order, "v", "rs")
    deleted = spark.createDataFrame([(1, 20, 7)], "g int, seq int, v int")
    got = relational.window_view_retract(
        state, deleted, ["g"], order, "v", "rs", broadcast_deltas=broadcast
    )
    want = relational.running_window_view(
        base.exceptAll(deleted), ["g"], order, "v", "rs"
    )
    assert _canon(got) == _canon(want)
    g1 = {r["seq"]: r["rs"] for r in got.collect() if r["g"] == 1}
    assert g1 == {10: 5, 30: 14}  # later row re-shifted down


def test_window_view_delta_consistent_with_refresh(spark):
    """The deployment shape (window_view_delta / MaterializedView.delta)
    is exactly the refresh's rewritten half: untouched pass-through ∪
    delta == refresh, bag-exactly."""
    from big_data_project_implementation_spark.operators import relational
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    base = spark.range(120).selectExpr(
        "id % 11 AS g", "id AS seq", "id * 7 % 31 AS v"
    )
    arrivals = spark.range(120, 150).selectExpr(
        "id % 17 AS g", "id AS seq", "id * 7 % 31 AS v"
    )
    mv = MaterializedView(
        "window", keys=["g"], order_by=[F.col("seq").asc()], value="v",
        out_col="rs",
    )
    state = mv.compute(base)
    refresh = mv.refresh(state, delta=arrivals)
    delta_rows = mv.delta(state, arrivals)
    touched = arrivals.select("g").distinct()
    untouched = relational._nullsafe_semi_anti(state, touched, ["g"], "anti")
    recombined = untouched.unionByName(delta_rows)
    assert _canon(recombined) == _canon(refresh)
    assert _canon(refresh) == _canon(mv.compute(base.unionByName(arrivals)))


def test_window_ivm_algebra_property(spark):
    """Property test over the round-11 window shapes (the round-10
    algebra test's style): for random bags with heavy key collision,
    duplicate rows, and random sub-bag deletions — refresh == SUM-OVER
    recompute and retract == post-delete recompute, through the
    MaterializedView surface. The total order includes a synthetic
    tie-break column so duplicates cannot make ROW-frame running sums
    ambiguous."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    row = st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(0, 2))
    bags = st.tuples(
        st.lists(row, min_size=0, max_size=8),  # base (g, seq, v)
        st.lists(row, min_size=0, max_size=5),  # arrivals
        st.data(),
    )

    def mk(rows):
        return spark.createDataFrame(
            [(g, s, v, i) for i, (g, s, v) in enumerate(rows)]
            or [(None, None, None, None)],
            "g long, seq long, v long, tb long",
        ).filter(F.col("tb").isNotNull())

    mv = MaterializedView(
        "window",
        keys=["g"],
        order_by=[F.col("seq").asc(), F.col("v").asc(), F.col("tb").asc()],
        value="v",
        out_col="rs",
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(bags)
    def check(data):
        base_rows, arr_rows, rnd = data
        base, arrivals = mk(base_rows), mk(arr_rows)
        state = mv.compute(base)
        got = mv.refresh(state, delta=arrivals)
        want = mv.compute(base.unionByName(arrivals))
        assert _canon(got) == _canon(want)
        # random sub-bag deletion from the refreshed base
        full_rows = base_rows + [
            (g, s, v) for (g, s, v) in arr_rows
        ]
        n_del = rnd.draw(st.integers(0, min(3, len(full_rows))))
        idx = rnd.draw(
            st.permutations(range(len(full_rows)))
        )[:n_del] if full_rows else []
        # rebuild with stable tb indices matching mk() enumeration
        full = spark.createDataFrame(
            [(g, s, v, i) for i, (g, s, v) in enumerate(full_rows)]
            or [(None, None, None, None)],
            "g long, seq long, v long, tb long",
        ).filter(F.col("tb").isNotNull())
        dead = full.filter(F.col("tb").isin([int(i) for i in idx]) if idx else F.lit(False))
        survivors = full.filter(~F.col("tb").isin([int(i) for i in idx]) if idx else F.lit(True))
        state2 = mv.compute(full)
        got2 = mv.retract(state2, deleted=dead)
        want2 = mv.compute(survivors)
        assert _canon(got2) == _canon(want2)

    check()


@pytest.mark.parametrize("broadcast", [True, False])
def test_retract_agg_state_null_keyed_group(spark, broadcast):
    """Round-11 proactive sweep (the ADVICE r10 defect class, agg
    twin): GROUP BY puts NULL keys in one group, so the state carries
    a NULL-keyed row — its deletions must subtract and its extreme
    repair must fire like any other key's. Under plain column-name
    joins both were silently skipped."""
    from big_data_project_implementation_spark.operators import relational

    base = spark.createDataFrame(
        [(None, 10), (None, 3), (None, 7), (1, 5), (1, 9), (2, 4)],
        "g int, v int",
    )
    # delete the NULL group's MIN (forces the repair path) and one
    # non-extreme row of group 1 (arithmetic path)
    deleted = spark.createDataFrame([(None, 3), (1, 5)], "g int, v int")
    remaining = base.exceptAll(deleted)
    state = relational.mergeable_agg_state(base, ["g"], "v")
    got = relational.retract_agg_state(
        state, deleted, remaining, ["g"], "v",
        broadcast_repair_keys=broadcast,
    )
    want = relational.mergeable_agg_state(remaining, ["g"], "v")
    assert _canon(got) == _canon(want)
    null_row = [r for r in got.collect() if r["g"] is None]
    assert len(null_row) == 1
    assert (null_row[0]["n"], null_row[0]["sum"], null_row[0]["min"],
            null_row[0]["max"]) == (2, 17, 7, 10)


@pytest.mark.parametrize("broadcast", [True, False])
def test_lexical_index_ivm_matches_rebuild(spark, broadcast):
    """Round-11 text IVM: the maintained inverted-index state under
    arrivals AND deletions equals a from-scratch rebuild — including a
    NULL-text document (dl stays NULL, counted in n, skipped in sumdl)
    and a word whose last document dies leaving the vocabulary."""
    from big_data_project_implementation_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "spark joins spark"),
            (2, "vector search"),
            (3, None),
            (4, "unique zanzibar token"),
            (5, "spark vector"),
            (None, "spark ghost"),  # NULL-id doc: state groups it,
        ],                          # so deletion must drop it too
        "doc_id long, text string",
    )
    old = docs.filter("doc_id <= 3")
    delta = docs.filter("doc_id > 3 OR doc_id IS NULL")
    refreshed = text.lexical_index_refresh(
        text.lexical_index_state(old), delta
    )
    rebuilt = text.lexical_index_state(docs)
    for got, want in zip(refreshed, rebuilt):
        assert _canon(got) == _canon(want)

    dead = docs.filter("doc_id = 4 OR doc_id IS NULL")
    kept = text.lexical_index_retract(
        refreshed, dead, broadcast_deltas=broadcast
    )
    survivors = docs.filter("doc_id <> 4 AND doc_id IS NOT NULL")
    want_state = text.lexical_index_state(survivors)
    for got, want in zip(kept, want_state):
        assert _canon(got) == _canon(want)
    vocab = {r["word"] for r in kept[2].collect()}
    assert "zanzibar" not in vocab  # last doc died -> word left
    assert "ghost" not in vocab  # the NULL-id doc's word left too
    # and its postings did not survive as zombies
    assert kept[0].filter(F.col("id").isNull()).count() == 0
    # scoring from the maintained state == from-scratch scoring
    q = ("spark", "vector")
    got_scores = text.bm25_from_index(kept, q)
    want_scores = text.bm25_scores(survivors, q)
    assert _canon(got_scores) == _canon(want_scores)


def test_stream_bm25_index_replay_idempotent(spark):
    """The continuously-maintained search index is exactly-once under
    replay: postings/lens partitions rewrite themselves, the
    docfreq/stats chains fold v=N purely from (v=N-1, batch N), a
    checkpointed restart replays nothing, and the final state scores
    identically to a from-scratch build."""
    from big_data_project_implementation_spark.operators import text
    from big_data_project_implementation_spark.queries.registry import t
    from big_data_project_implementation_spark.queries.streaming_q import (
        _stream_bm25_machinery,
    )

    out_dir = tempfile.mkdtemp(prefix="bm25_idx_test_")
    ckpt = tempfile.mkdtemp(prefix="bm25_idx_ckpt_")
    src_dir = tempfile.mkdtemp(prefix="bm25_idx_src_")
    try:
        raw = t(spark, SF_DIR, "documents")
        raw.repartition(3).write.mode("overwrite").parquet(src_dir)
        gate, read_state = _stream_bm25_machinery(spark, out_dir)

        def run_once():
            sub = spark.newSession()
            sub.conf.set("spark.sql.shuffle.partitions", "8")
            q = (
                sub.readStream.schema(raw.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
                .writeStream.foreachBatch(gate)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        def score():
            return _canon(
                text.bm25_from_index(read_state(spark), ("customer", "spark"))
            )

        run_once()
        first = score()
        assert first
        want = _canon(text.bm25_scores(raw, ("customer", "spark")))
        assert first == want
        # empty-delta fold at a new version: chains are identities
        import glob

        top = max(
            int(p.rsplit("=", 1)[1])
            for p in glob.glob(f"{out_dir}/docfreq/v=*")
        )
        gate(raw.limit(0), top + 1)
        assert score() == first
        run_once()  # checkpointed restart replays nothing
        assert score() == first
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(src_dir, ignore_errors=True)



def test_stream_gate_missing_predecessor_raises(spark):
    """A state-chain gate must REFUSE to fold when v=N-1 is missing
    (data loss), never silently re-initialize the view from one
    batch."""
    from big_data_project_implementation_spark.operators.views import (
        MaterializedView,
    )

    out_dir = tempfile.mkdtemp(prefix="chain_guard_")
    try:
        mv = MaterializedView("agg", keys=["g"], value="v")
        gate = mv.stream_gate(out_dir)
        batch = spark.createDataFrame([(1, 2), (1, 3)], "g int, v int")
        gate(batch, 0)
        gate(batch, 1)
        shutil.rmtree(f"{out_dir}/v=1")  # simulate external damage
        with pytest.raises(ValueError, match="missing"):
            gate(batch, 2)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
