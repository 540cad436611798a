"""Unit semantics for the event-analytics operators (operators.events)
on hand-built micro-fixtures; end-to-end oracle parity runs per-query
in test_queries_oracle.py.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import events as ev

SCHEMA = "user_id long, ts timestamp, event_type string"


def _ts(day: int, hour: int = 0) -> datetime:
    return datetime(2024, 1, day, hour)


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_funnel_requires_strict_order(spark):
    df = _ev(
        spark,
        [
            # u1 converts fully, in order
            (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
            # u2: purchase BEFORE view — must not count past step 1
            (2, _ts(2), "purchase"), (2, _ts(3), "view"),
            # u3: click only — never enters the funnel at all
            (3, _ts(1), "click"),
        ],
    )
    out = {
        r.step: r.n_users
        for r in ev.funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert out == {"view": 2, "click": 1, "purchase": 1}


def test_funnel_same_timestamp_is_not_after(spark):
    # click at the exact same instant as view: strict > excludes it
    df = _ev(spark, [(1, _ts(1), "view"), (1, _ts(1), "click")])
    out = {
        r.step: r.n_users
        for r in ev.funnel_counts(df, ["view", "click"]).collect()
    }
    assert out == {"view": 1, "click": 0}


def test_funnel_uses_first_qualifying_occurrence(spark):
    # u1 views twice; the click lands between the views — it is after
    # the FIRST view, so it counts
    df = _ev(
        spark,
        [(1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "view")],
    )
    per_user = ev.funnel_times(df, ["view", "click"]).collect()[0]
    assert per_user.t1 == _ts(1)
    assert per_user.t2 == _ts(2)


def test_retention_counts_user_once_per_cell(spark):
    # u1's first event Mon Jan 1 -> cohort 2024-01-01; 100 events in
    # week 0 and two in week 1 still count once per cell
    rows = [(1, _ts(1, h % 24), "view") for h in range(100)]
    rows += [(1, _ts(8), "view"), (1, _ts(9), "view")]
    out = {
        (r.cohort, r.week_offset): r.n_active
        for r in ev.retention_cohorts(_ev(spark, rows)).collect()
    }
    assert out == {
        (datetime(2024, 1, 1), 0): 1,
        (datetime(2024, 1, 1), 1): 1,
    }


def test_retention_cohort_is_first_week(spark):
    # u2 first appears in week 2 -> separate cohort, offset 0
    df = _ev(spark, [(1, _ts(1), "view"), (2, _ts(8), "view")])
    out = {
        (r.cohort, r.week_offset): r.n_active
        for r in ev.retention_cohorts(df).collect()
    }
    assert out == {
        (datetime(2024, 1, 1), 0): 1,
        (datetime(2024, 1, 8), 0): 1,
    }


def test_rolling_active_window_edges(spark):
    # u1 active day 1; u2 active days 1 and 8. Day 8's trailing-7
    # window is days 2..8: u1 has aged out, u2 counts once.
    df = _ev(spark, [(1, _ts(1), "view"), (2, _ts(1), "view"), (2, _ts(8), "view")])
    out = {r.day: (r.dau, r.wau) for r in ev.rolling_active_users(df).collect()}
    assert out == {
        datetime(2024, 1, 1): (2, 2),
        datetime(2024, 1, 8): (1, 1),
    }


def test_rolling_active_dedups_within_window(spark):
    # u1 active days 1 and 3: day 3's window sees the user twice but
    # counts once (wau=1); both days report dau=1
    df = _ev(spark, [(1, _ts(1), "view"), (1, _ts(3), "view")])
    out = {r.day: (r.dau, r.wau) for r in ev.rolling_active_users(df).collect()}
    assert out == {
        datetime(2024, 1, 1): (1, 1),
        datetime(2024, 1, 3): (1, 1),
    }


def test_funnel_single_exchange(spark):
    """The stacked per-step window mins must reuse ONE user-key
    exchange — step count must not add shuffles."""
    from big_data_project_implementation_spark import plans

    df = _ev(spark, [(1, _ts(1), "view")])
    three = ev.funnel_times(df, ["view", "click", "purchase"])
    five = ev.funnel_times(df, ["view", "click", "purchase", "view", "click"])
    assert plans.count_shuffles(three) == plans.count_shuffles(five)


# --------------------------------------------------------- MAD anomalies


def test_mad_flags_injected_outlier_only(spark):
    from big_data_project_implementation_spark.operators import events as ev

    rows = [(i, "click", 10.0 + (i % 5) * 0.1) for i in range(40)]
    rows.append((99, "click", 500.0))  # the outlier
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = ev.anomalies_mad(df).collect()
    assert [r.event_id for r in out] == [99]
    assert out[0].mz > 3.5


def test_mad_baseline_not_dragged_by_outliers(spark):
    """Even with 20% wild values, the median/MAD baseline holds and
    every wild value is flagged (mean/stddev would mask them)."""
    from big_data_project_implementation_spark.operators import events as ev

    rows = [(i, "x", 100.0 + (i % 7)) for i in range(40)]
    rows += [(100 + i, "x", 10000.0 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    flagged = {r.event_id for r in ev.anomalies_mad(df).collect()}
    assert flagged == {100 + i for i in range(10)}


# ------------------------------------------------------------ attribution


def test_attribution_credits_most_recent_view_within_window(spark):
    from datetime import datetime, timedelta

    from big_data_project_implementation_spark.queries import REGISTRY  # noqa: F401
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    t0 = datetime(2024, 3, 1, 12, 0)
    rows = [
        # u1: view(1) ... view(2) ... purchase(3) → credits view 2
        (1, t0, 1, "view", 0.0),
        (1, t0 + timedelta(hours=1), 2, "view", 0.0),
        (1, t0 + timedelta(hours=2), 3, "purchase", 9.0),
        # u2: view 8 days before purchase → outside the 7d window
        (2, t0 - timedelta(days=8), 4, "view", 0.0),
        (2, t0, 5, "purchase", 5.0),
        # u3: purchase with no view at all
        (3, t0, 6, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string, value double"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    out = (
        df.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.last(view_id, ignorenulls=True).over(w).alias("last_view_id"),
            F.last(view_ts, ignorenulls=True).over(w).alias("last_view_ts"),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("last_view_ts").isNotNull()
            & (F.col("last_view_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .collect()
    )
    assert [(r.event_id, r.last_view_id) for r in out] == [(3, 2)]
