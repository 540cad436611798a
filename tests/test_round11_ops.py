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
