"""Event-log analytics queries: ordered funnel, retention cohorts,
rolling active users (operators.events).

The reference covers event analytics only as generic SQL over its
relational operators; these register the engineered compositions with
exact DuckDB oracles — all-integer outputs, so the hash compare has no
float edge at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import events as ev
from big_data_project_implementation_spark.queries.registry import query, t

FUNNEL_STEPS = ["view", "click", "purchase"]


@query(
    "events_funnel",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > t1.t
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN t2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t2.t
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
             (SELECT CAST(count(*) AS BIGINT) FROM t1) AS n_users
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'click',
             (SELECT CAST(count(*) AS BIGINT) FROM t2)
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'purchase',
             (SELECT CAST(count(*) AS BIGINT) FROM t3)
    ) ORDER BY step_idx
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view->click->purchase: users counted at step i
    only if step i happened strictly after their first qualifying
    step i-1 (operators.events.funnel_counts — one exchange on user,
    stacked window mins; the oracle's per-step join chain is the
    textbook SQL the single-shuffle plan replaces)."""
    e = t(spark, sf_dir, "events")
    return ev.funnel_counts(e, FUNNEL_STEPS)


@query(
    "events_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT f.cohort,
             CAST(floor(date_diff('day', CAST(f.cohort AS DATE),
                                  CAST(date_trunc('day', e.ts) AS DATE))
                        / 7) AS BIGINT) AS week_offset,
             e.user_id
      FROM events e JOIN f USING (user_id)
    )
    SELECT cohort, week_offset, CAST(count(*) AS BIGINT) AS n_active
    FROM act GROUP BY cohort, week_offset
    ORDER BY cohort, week_offset
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users cohorted by ISO week of first
    event; n_active = distinct cohort members active k weeks later
    (operators.events.retention_cohorts — the (cohort, offset, user)
    triple-distinct bounds the shuffle by active users, not events)."""
    e = t(spark, sf_dir, "events")
    return ev.retention_cohorts(e)


@query(
    "events_rolling_active",
    oracle="""
    WITH du AS (
      SELECT DISTINCT date_trunc('day', ts) AS d, user_id AS u FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    wau AS (
      SELECT days.d AS day, CAST(count(DISTINCT du.u) AS BIGINT) AS wau
      FROM days JOIN du
        ON du.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      GROUP BY days.d
    ),
    dau AS (
      SELECT d AS day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d
    )
    SELECT day, dau.dau, wau.wau
    FROM dau JOIN wau USING (day)
    ORDER BY day
    """,
)
def events_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU + trailing-7-day actives (operators.events
    .rolling_active_users): distinct-over-range-window recast as a
    bounded explode + groupBy — the oracle's range join is the
    quadratic shape the explode replaces at scale."""
    e = t(spark, sf_dir, "events")
    return ev.rolling_active_users(e, window_days=7)


@query(
    "events_sessionize",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS session_idx
      FROM o
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_idx
    ORDER BY user_id, session_idx
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization, 30-minute gap
    (operators.events.sessionize): lag-change flag, cumulative-sum
    session index, (user, session) rollup — all on ONE user-key
    exchange. The batch twin of stream_sessionize's session_window,
    certified against the textbook two-window SQL."""
    e = t(spark, sf_dir, "events")
    return ev.sessionize(e, gap_minutes=30)


@query(
    "events_scd2",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, state, ts, event_id FROM marked
      WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
)
def events_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 compaction of an event log (operators.events
    .scd2_intervals): consecutive same-state runs per user collapse to
    effective-dated (valid_from, valid_to, is_current) rows — the CDC
    dimension-load shape, one user-key exchange, non-change rows
    dropped before the interval-close window."""
    e = t(spark, sf_dir, "events")
    return ev.scd2_intervals(e)


@query(
    "events_scd2_incremental",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, state, ts, event_id FROM marked
      WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) IS NULL AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
)
def events_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained SCD2 dimension (round 10,
    operators.events.scd2_apply_arrivals — the IVM family composed
    with events_scd2): the history is materialized over the first 23
    days of the log, then the remaining week of arrivals folds in —
    open intervals of users whose state changed CLOSE at the user's
    first arriving change, new runs APPEND, and a user whose arrivals
    repeat their open state extends that interval with NO new row (the
    boundary seam, seeded by joining the open state under the
    arrivals' first lag slot). The ORACLE recomputes scd2_intervals
    over the FULL log, so the hash match certifies refresh ==
    recompute across the seam: a double-opened interval, a missed
    close, a wrong close ts, or end-date churn on a repeated state all
    break it. Closed intervals are immutable — a deployment
    partitioning by is_current rewrites only the open partition."""
    e = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-24").cast("timestamp")
    hist = ev.scd2_intervals(e.filter(F.col("ts") < cut))
    out = ev.scd2_apply_arrivals(hist, e.filter(F.col("ts") >= cut))
    return out.orderBy("user_id", "valid_from")


@query(
    "events_point_in_interval",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type AS state, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_state
      FROM events
    ),
    changes AS (
      SELECT user_id, state, ts, event_id FROM marked
      WHERE prev_state IS NULL OR prev_state <> state
    ),
    iv AS (
      SELECT user_id, state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS valid_to
      FROM changes
    )
    SELECT e.event_id, e.user_id, e.ts, iv.state
    FROM events e JOIN iv
      ON e.user_id = iv.user_id
     AND e.ts >= iv.valid_from
     AND (iv.valid_to IS NULL OR e.ts < iv.valid_to)
    ORDER BY e.event_id
    """,
)
def events_point_in_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-validity join (operators.relational.interval_join over
    operators.events.scd2_intervals): label every event with the SCD2
    state in effect at its timestamp — [from, to) semantics, so each
    event matches exactly one interval and the output is row-for-row
    the event table. The join is equi on user_id with the range as
    residual condition: a hash exchange, never a theta blowup."""
    from big_data_project_implementation_spark.operators import relational

    e = t(spark, sf_dir, "events")
    iv = ev.scd2_intervals(e).select(
        "user_id", "state", "valid_from", "valid_to"
    )
    facts = e.select("event_id", "user_id", "ts")
    return relational.interval_join(facts, iv, "user_id").orderBy("event_id")


@query(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, FLOOR(quantile_cont(value, 0.5) * 1e6 + 0.5) / 1e6 AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, abs(e.value - m.med) AS dev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, FLOOR(quantile_cont(dev, 0.5) * 1e6 + 0.5) / 1e6 AS mad
      FROM dev GROUP BY 1
    )
    SELECT e.event_id, e.event_type, ROUND(e.value, 2) AS value,
           FLOOR(abs(e.value - m.med)
                 / (1.4826 * GREATEST(a.mad, 1e-12)) * 1e4 + 0.5) / 1e4 AS mz
    FROM events e JOIN med m USING (event_type) JOIN mad a USING (event_type)
    WHERE FLOOR(abs(e.value - m.med)
                / (1.4826 * GREATEST(a.mad, 1e-12)) * 1e4 + 0.5) / 1e4 > 3.5
    ORDER BY e.event_id
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier gate (operators.events.anomalies_mad):
    modified z-score over median/MAD baselines — the data-quality
    filter whose baseline can't be dragged by the outliers it hunts.
    Two key-shuffled exact-percentile aggs, then a broadcast of the
    per-type baseline into a codegen filter."""
    e = t(spark, sf_dir, "events")
    return (
        ev.anomalies_mad(e)
        .select(
            "event_id",
            "event_type",
            F.round("value", 2).alias("value"),
            "mz",
        )
        .orderBy("event_id")
    )


@query(
    "events_attribution",
    oracle="""
    SELECT event_id AS purchase_id, user_id, last_view_id,
           CAST(FLOOR(epoch(ts)) - FLOOR(epoch(last_view_ts)) AS BIGINT)
               AS seconds_since_view
    FROM (
      SELECT event_id, user_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view' THEN event_id END
                        IGNORE NULLS) OVER w AS last_view_id,
             last_value(CASE WHEN event_type = 'view' THEN ts END
                        IGNORE NULLS) OVER w AS last_view_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    WHERE event_type = 'purchase'
      AND last_view_ts IS NOT NULL
      AND last_view_ts >= ts - INTERVAL 7 DAY
    ORDER BY purchase_id
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent preceding view within a 7-day window — one user-keyed
    window pass over the mixed event stream (IGNORE NULLS last_value
    over an exclusive-of-current frame), no self-join, no per-type
    sub-streams. The marketing-attribution / conversion-lag primitive;
    swap last_value for first_value for first-touch."""
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_id = F.when(F.col("event_type") == "view", F.col("event_id"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.select(
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
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            "last_view_id",
            F.floor(
                F.unix_timestamp("ts") - F.unix_timestamp("last_view_ts")
            )
            .cast("bigint")
            .alias("seconds_since_view"),
        )
        .orderBy("purchase_id")
    )


@query(
    "events_winsorize",
    oracle="""
    WITH b AS (
      SELECT event_type,
             FLOOR(quantile_cont(value, 0.05) * 1e6 + 0.5) / 1e6 AS lo,
             FLOOR(quantile_cont(value, 0.95) * 1e6 + 0.5) / 1e6 AS hi
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(LEAST(GREATEST(e.value, b.lo), b.hi)
                               AS DECIMAL(28,10))) AS DOUBLE) / count(*), 6)
               AS winsorized_mean,
           ROUND(CAST(SUM(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE)
                 / count(*), 6) AS raw_mean
    FROM events e JOIN b USING (event_type)
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type means: values clamped to the [p05, p95]
    exact-percentile band before averaging — the tail-robust KPI that
    pairs with events_anomaly_mad (detect there, bound influence
    here). Percentile baselines are a tiny broadcast; the clamp is
    codegen; sums are decimal-exact per the registry convention."""
    e = t(spark, sf_dir, "events")
    b = e.groupBy("event_type").agg(
        (F.floor(F.expr("percentile(value, 0.05)") * 1e6 + 0.5) / 1e6).alias("lo"),
        (F.floor(F.expr("percentile(value, 0.95)") * 1e6 + 0.5) / 1e6).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(b), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(
                F.sum(clamped.cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("winsorized_mean"),
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).cast("double")
                / F.count("*"),
                6,
            ).alias("raw_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "events_attribution_multitouch",
    oracle="""
    WITH tch AS (
      SELECT user_id, event_id AS touch_id, ts AS touch_ts
      FROM events WHERE event_type = 'view'
    ),
    cnv AS (
      SELECT user_id, event_id AS conversion_id, ts AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    p AS (
      SELECT c.conversion_id, c.user_id, t.touch_id,
             CAST(FLOOR(epoch(c.conv_ts)) - FLOOR(epoch(t.touch_ts))
                  AS DOUBLE) AS age
      FROM cnv c JOIN tch t USING (user_id)
      WHERE t.touch_ts < c.conv_ts
        AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY
    )
    SELECT conversion_id, user_id, touch_id,
           FLOOR(1.0 / (COUNT(*) OVER w) * 1e6 + 0.5) / 1e6
               AS linear_weight,
           FLOOR((1.0 / (1.0 + age / 86400.0))
                 / (SUM(1.0 / (1.0 + age / 86400.0)) OVER w) * 1e6 + 0.5)
               / 1e6 AS decay_weight
    FROM p
    WINDOW w AS (PARTITION BY conversion_id)
    ORDER BY conversion_id, touch_id
    """,
)
def events_attribution_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution (operators.events.attribution_multitouch):
    every purchase splits credit over ALL its user's views in the 7-day
    lookback — linear 1/n plus harmonic time-decay weights, both
    normalized per conversion. One user-key equi-join between two
    slices of the same scan plus one conversion-key window pass; the
    weights are pure IEEE arithmetic (no libm), so engine-exact."""
    e = t(spark, sf_dir, "events")
    return ev.attribution_multitouch(e).orderBy("conversion_id", "touch_id")


@query(
    "events_markov_transitions",
    oracle="""
    WITH hops AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS to_type
      FROM events
    ),
    cnt AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM hops WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ),
    tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS row_total
      FROM cnt GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n, t.row_total,
           (c.n * 1000000 // t.row_total) / 1e6 AS prob_q6
    FROM cnt c JOIN tot t USING (from_type)
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream
    (round 8, operators.events.markov_transitions): per-user
    chronological chains collapsed to (from, to) counts with
    row-normalized probabilities — every observed path at once where
    the funnel checks one hand-picked path. Deterministic (ts,
    event_id) ordering (ts alone ties at log granularity — the
    matrix would be partitioning-dependent without the tiebreak);
    one user-keyed window exchange + a |types|²-cell groupBy; floor
    integer-division probabilities, so the matrix hash-matches."""
    e = t(spark, sf_dir, "events")
    return ev.markov_transitions(e)


@query(
    "events_ab_welch",
    oracle="""
    WITH per_user AS (
      SELECT user_id % 2 AS variant, user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT
        CAST(COUNT(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN variant = 0 THEN x END) AS BIGINT) AS sum_a,
        CAST(SUM(CASE WHEN variant = 0 THEN x * x END) AS BIGINT) AS s2a,
        CAST(COUNT(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN variant = 1 THEN x END) AS BIGINT) AS sum_b,
        CAST(SUM(CASE WHEN variant = 1 THEN x * x END) AS BIGINT) AS s2b
      FROM per_user
    ),
    tt AS (
      SELECT *,
        (CAST(sum_a AS HUGEINT) * n_b - CAST(sum_b AS HUGEINT) * n_a)
          * (CAST(sum_a AS HUGEINT) * n_b - CAST(sum_b AS HUGEINT) * n_a)
          * (n_a - 1) * (n_b - 1) AS num,
        (CAST(n_a AS HUGEINT) * s2a - CAST(sum_a AS HUGEINT) * sum_a)
          * n_b * n_b * (n_b - 1) AS ta,
        (CAST(n_b AS HUGEINT) * s2b - CAST(sum_b AS HUGEINT) * sum_b)
          * n_a * n_a * (n_a - 1) AS tb
      FROM r
    ),
    uu AS (
      SELECT *, ta + tb AS den,
        GREATEST(ta, tb) AS thi, LEAST(ta, tb) AS tlo,
        CASE WHEN ta >= tb THEN n_b - 1 ELSE n_a - 1 END AS whi,
        CASE WHEN ta >= tb THEN n_a - 1 ELSE n_b - 1 END AS wlo
      FROM tt
    ),
    vv AS (
      SELECT *,
        CASE WHEN thi <= 0 THEN CAST(0 AS HUGEINT)
             WHEN thi < 100000000000000000000000000
               THEN (tlo * 1000000000) // thi
             ELSE ((tlo // 20000000000000000000) * 1000000000)
                  // (thi // 20000000000000000000) END AS uq
      FROM uu
    ),
    dd AS (
      SELECT *,
        (CAST(1000000000 + uq AS HUGEINT) * (1000000000 + uq))
          * (n_a - 1) * (n_b - 1) AS dfnum,
        CAST(whi AS HUGEINT) * 1000000000000000000
          + CAST(uq AS HUGEINT) * uq * wlo AS dfden
      FROM vv
    )
    SELECT n_a, n_b, sum_a, sum_b,
           CAST(sum_a * 1000000 // n_a AS DOUBLE) / 1e6 AS mean_a_q6,
           CAST(sum_b * 1000000 // n_b AS DOUBLE) / 1e6 AS mean_b_q6,
           CASE WHEN den < 100000000000000000000000000000000
                THEN CAST((num // den) * 1000000
                          + ((num % den) * 1000000) // den AS DOUBLE) / 1e6
                ELSE CAST(((num // 20000000000000000000) * 1000000)
                          // (den // 20000000000000000000) AS DOUBLE) / 1e6
           END AS t2_q6,
           CAST((dfnum // dfden) * 1000000
                + ((dfnum % dfden) * 1000000) // dfden AS DOUBLE)
             / 1e6 AS df_q6
    FROM dd
    """,
)
def events_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment analysis (round 9, operators.events.ab_welch_t2):
    Welch's t² between two assignment arms (user_id parity stands in
    for the md5 assigner) on per-USER purchase counts — the unit of
    randomization is the unit of analysis, so heavy users cannot
    masquerade as many samples. The statistic is ONE exact integer
    rational floor-divided to t2_q6 (the kappa/AUC exact-rational
    discipline), so the DuckDB oracle replays the entire analysis —
    assignment, per-unit aggregation, moment sums, and the Welch
    algebra — and the hash match certifies it end to end. Round 10
    completes the row with df_q6, the Welch–Satterthwaite degrees of
    freedom as a second deterministic rational of the same (n, S1, S2)
    sufficient statistics (reduced by max(Ta,Tb) through one q9
    fixed-point so nothing overflows 38 digits — see the operator
    docstring for the algebra and the magnitude envelope), and the
    zero-arm / overflow degenerate paths now fail loudly instead of
    yielding an empty or NULL row. With df in hand, t² > F(1, df)
    at .05 ≈ 3.84-4.0 for these n reads as significance."""
    e = t(spark, sf_dir, "events")
    return ev.ab_welch_t2(
        e,
        variant=F.col("user_id") % 2,
        metric=F.when(F.col("event_type") == "purchase", 1).otherwise(0),
    )
