"""Event-log analytics operators: ordered funnels, retention cohorts,
rolling active users.

The reference engine exposes event analytics only through generic SQL
over its relational operators (reference `EXE/basicOperators.scala`,
`EXE/Aggregate.scala`); these are the engineered Spark compositions a
product-analytics workload runs hot, shaped so each keeps exactly one
logical shuffle per key:

- ``funnel_times``: ONE hash exchange on the user key; the per-step
  "first occurrence after the previous step" mins are stacked
  WindowExecs that reuse the same partitioning (no exchange per step).
- ``retention_cohorts``: one exchange on the user key (cohort
  assignment), one on the (cohort, offset) group — both map-side
  combined.
- ``rolling_active_users``: turns a distinct-count-over-range-window
  (which no engine's window operator supports) into a bounded explode
  (factor = window_days) + groupBy, the standard scale-out shape; the
  shuffle carries (day, user) pairs already deduped per day.

At 100 TB: all three shuffle compact key/timestamp pairs, never event
payloads (``props`` is pruned at the scan — assert via ReadSchema).
Skewed power users inflate a single funnel/retention partition only by
that user's own event count; there is no cross-user blowup anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel timestamps: one row per user with
    ``t1..tk`` where ``t_i`` is the user's FIRST occurrence of
    ``steps[i-1]`` strictly after ``t_{i-1}`` (NULL from the first
    step the user never reaches — later steps stay NULL too, so an
    out-of-order 'purchase' before 'view' never counts).

    Plan shape: a single hash exchange on ``user_col``; each step adds
    a WindowExec over the same partitioning, so step count never adds
    shuffles."""
    w = Window.partitionBy(user_col)
    df = events
    step_cols: list[str] = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if step_cols:
            prev = F.col(step_cols[-1])
            # strict ordering: NULL prev makes the AND null -> excluded
            cond = cond & prev.isNotNull() & (F.col(ts_col) > prev)
        name = f"t{i + 1}"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        step_cols.append(name)
    return df.groupBy(user_col).agg(
        *[F.min(c).alias(c) for c in step_cols]
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Funnel conversion summary: for each step, how many users reached
    it in order (``n_users`` is monotonically non-increasing by
    construction). The per-user intermediate is user-cardinality, so
    the final rollup is a tiny single-stage aggregate."""
    per_user = funnel_times(events, steps, user_col, ts_col, type_col)
    agg = per_user.agg(
        *[
            F.count(f"t{i + 1}").cast("bigint").alias(f"n{i + 1}")
            for i in range(len(steps))
        ]
    )
    rows = [
        F.struct(
            F.lit(i + 1).cast("bigint").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"n{i + 1}").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return (
        agg.select(F.explode(F.array(*rows)).alias("s"))
        .select("s.step_idx", "s.step", "s.n_users")
        .orderBy("step_idx")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users are cohorted by the ISO week of their
    first event; ``n_active`` counts distinct cohort members active
    ``week_offset`` periods later.

    Two shuffle-bounded passes: cohort assignment is a window min over
    the user partitioning (one exchange, reused from any upstream
    user-keyed stage), then distinct (cohort, offset, user) triples
    roll up per cell. The triple-distinct is the scale trick: a user
    active 10k times in a week still contributes ONE shuffled row per
    (cohort, offset) cell."""
    w = Window.partitionBy(user_col)
    offs = (
        events.withColumn(
            "cohort", F.date_trunc("week", F.min(ts_col).over(w))
        )
        .select(
            "cohort",
            F.floor(
                F.datediff(F.date_trunc("day", F.col(ts_col)), F.col("cohort"))
                / period_days
            )
            .cast("bigint")
            .alias("week_offset"),
            F.col(user_col).alias("u"),
        )
        .distinct()
    )
    return (
        offs.groupBy("cohort", "week_offset")
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .orderBy("cohort", "week_offset")
    )


def rolling_active_users(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Per-day DAU and trailing-``window_days`` active users (WAU for
    the default 7). COUNT(DISTINCT) over a RANGE window is
    inexpressible in any engine's window operator; the scale-out shape
    is a bounded explode: each (day, user) pair posts itself to the
    ``window_days`` report days it is visible from, then one groupBy
    counts. Expansion factor is the constant ``window_days``, and the
    input is pre-deduped per day, so the shuffle is bounded by
    days x active-users x window, independent of raw event count."""
    du = events.select(
        F.date_trunc("day", F.col(ts_col)).alias("d"),
        F.col(user_col).alias("u"),
    ).distinct()
    # du feeds three consumers (day grid, postings, DAU); materialize
    # the compacted day x user table once rather than re-scanning raw
    # events three times — it is smaller than the source by the
    # per-day event multiplicity, which is exactly the factor that
    # matters at 100 TB. localCheckpoint (not cache) so the blocks are
    # reclaimed when the result plan is dropped — repeated invocations
    # (bench + scale probes) must not accumulate executor storage.
    du = du.localCheckpoint(eager=True)
    days = du.select("d").distinct()
    posted = (
        du.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(window_days - 1))
            ).alias("i"),
            "d",
            "u",
        )
        .select(
            (F.col("d") + F.make_interval(days=F.col("i"))).alias("report_d"),
            "u",
        )
        # only report days that actually occur in the data (keeps the
        # tail past max(day) out, and the oracle trivially equivalent)
        .join(F.broadcast(days).withColumnRenamed("d", "report_d"), "report_d")
        .distinct()
    )
    wau = posted.groupBy("report_d").agg(
        F.count("*").cast("bigint").alias("wau")
    )
    dau = du.groupBy("d").agg(F.count("*").cast("bigint").alias("dau"))
    return (
        dau.withColumnRenamed("d", "day")
        .join(wau.withColumnRenamed("report_d", "day"), "day")
        .orderBy("day")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch gaps-and-islands sessionization: a new session starts when
    a user's inter-event gap exceeds ``gap_minutes``.

    The streaming twin is ``stream_sessionize`` (session_window); this
    is the batch/backfill shape every analytics stack needs for
    reprocessing history. Exactly ONE hash exchange on the user key:
    the lag/cum-sum windows and the final (user, session) groupBy all
    reuse the same HashPartitioning(user) — Spark satisfies a groupBy
    whose keys are a superset of the existing partitioning without a
    second exchange. Skewed power users cost only their own event
    count; there is no cross-user state.

    Reference parity: reference sessionization ships as generic SQL
    over window operators (reference `EXE/Window.scala`); the DuckDB
    oracle in queries/events_q.py is that textbook two-window SQL.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    is_new = (
        prev_ts.isNull()
        | (
            F.col(ts_col).cast("long") - prev_ts.cast("long")
            > gap_minutes * 60
        )
    ).cast("bigint")
    with_idx = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("event_id"),
    ).withColumn(
        "session_idx",
        F.sum(is_new).over(
            Window.partitionBy(user_col)
            .orderBy(ts_col, id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_idx.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id", "session_idx")
    )


def scd2_intervals(
    events: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an event log:
    collapse each user's consecutive runs of the same ``state_col``
    into effective-dated rows (valid_from, valid_to, is_current).

    The CDC-to-dimension compaction every warehouse load runs: change
    detection is a lag() over (user ORDER BY ts), interval close is a
    lead() over the surviving change rows — both windows and the
    change filter reuse ONE HashPartitioning(user) exchange, and the
    filter drops the (usually dominant) non-change rows before the
    second window touches them. Payload columns never shuffle twice.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    changes = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("event_id"),
        )
        .withColumn("prev_state", F.lag("state").over(w))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            "state",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "valid_from")
    )


def scd2_apply_arrivals(
    history: DataFrame,
    arrivals: DataFrame,
    user_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Incrementally maintain a materialized SCD2 history under
    ARRIVING events (round 10) — the IVM algebra composed with
    :func:`scd2_intervals`: the stored dimension is never recomputed
    from the event log; arriving events only (a) CLOSE the open
    interval of a user whose state changed — ``valid_to`` = the ts of
    that user's FIRST state change among the arrivals — and (b) APPEND
    the new runs as effective-dated rows. Closed intervals are
    immutable, so a deployment that partitions the view by
    ``is_current`` rewrites ONLY the (tiny) open partition and appends
    to the closed one; this function re-emits the full view so the
    registry row's oracle — :func:`scd2_intervals` recomputed over the
    union of the event log — can certify refresh == recompute by hash.

    The boundary seam is the novel bit: the first arriving run of a
    user whose state EQUALS their open interval's state is NOT a
    change (the open interval simply extends — SCD2 rows carry no
    end-date churn for repeated states), which the recompute oracle
    enforces because lag() sees the historical run. Here the seam is
    seeded by joining each user's open state under the arrivals' first
    lag() slot.

    Requires arrivals to sort strictly after each user's history
    (append-only CDC; ts then ``id_col`` is the order). Late/
    out-of-order events need interval retraction — the documented
    non-goal here, same class as keyless bag deletion
    (:func:`big_data_project_implementation_spark.operators.relational.delta_join_retract`).

    Scale shape: ONE user-key exchange over the ARRIVALS (two windows
    + the change filter share it, as in :func:`scd2_intervals`); the
    history is touched by one broadcast-probed scan (no shuffle, no
    exceptAll) — per-user open rows are unique so removal is keyed,
    not bag-subtracted. ``broadcast_deltas=False`` for backfills where
    the arriving-user set rivals the dimension."""
    maybe_b = F.broadcast if broadcast_deltas else (lambda d: d)
    out_cols = ["user_id", "state", "valid_from", "valid_to", "is_current"]
    open_iv = history.filter(F.col("is_current"))

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seed = open_iv.select(
        F.col("user_id"), F.col("state").alias("_open_state")
    )
    marked = (
        arrivals.select(
            F.col(user_col).alias("user_id"),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("event_id"),
        )
        .withColumn("prev_state", F.lag("state").over(w))
        .join(maybe_b(seed), "user_id", "left")
    )
    changes = marked.filter(
        F.when(
            F.col("prev_state").isNull(),
            F.col("_open_state").isNull()
            | (F.col("_open_state") != F.col("state")),
        ).otherwise(F.col("prev_state") != F.col("state"))
    )
    new_rows = (
        changes.select(
            "user_id",
            "state",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*out_cols)
    )
    # first change per user: min(struct(ts, id)) = (ts, id_col) order
    first_change = changes.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id"))["ts"].alias("_close_ts")
    )
    # ONE history scan: open rows of changed users close (keyed by
    # (user, is_current) — an SCD2 view has at most one open row per
    # user), everything else passes through untouched
    joined = history.join(maybe_b(first_change), "user_id", "left")
    untouched = joined.filter(
        ~F.col("is_current") | F.col("_close_ts").isNull()
    ).select(*out_cols)
    closed = (
        joined.filter(F.col("is_current") & F.col("_close_ts").isNotNull())
        .withColumn("valid_to", F.col("_close_ts"))
        .withColumn("is_current", F.lit(False))
        .select(*out_cols)
    )
    return untouched.unionByName(closed).unionByName(new_rows)


def anomalies_mad(
    events: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier detection per key: flag rows whose modified
    z-score |x - median| / (1.4826 * MAD) exceeds ``threshold``
    (Iglewicz-Hoaglin). Median/MAD instead of mean/stddev so the
    baseline itself is immune to the outliers it hunts — the standard
    data-quality gate before a corpus lands in training.

    Two grouped exact-percentile passes (median, then MAD = median of
    absolute deviations) — each one shuffle on the key, then the tiny
    per-key baseline table broadcasts back into a codegen filter over
    the full stream. Exact percentile sorts within groups; at extreme
    per-key cardinalities swap both for approx_percentile(0.5) — the
    plan shape is unchanged."""
    # baselines pinned at 6dp via the repo's floor(x*1e6+0.5)/1e6
    # convention (NOT F.round / SQL ROUND, whose half-up-vs-half-even
    # tie rules differ between engines): percentile interpolation is
    # the one libm-ish input here; pinning it makes every downstream
    # double op bit-identical across engines
    med = events.groupBy(key_col).agg(
        (F.floor(F.expr(f"percentile({value_col}, 0.5)") * 1e6 + 0.5) / 1e6)
        .alias("_med")
    )
    mad = (
        events.join(F.broadcast(med), key_col)
        .select(key_col, F.abs(F.col(value_col) - F.col("_med")).alias("_dev"))
        .groupBy(key_col)
        .agg(
            (F.floor(F.expr("percentile(_dev, 0.5)") * 1e6 + 0.5) / 1e6)
            .alias("_mad")
        )
    )
    base = med.join(mad, key_col)
    score = F.abs(F.col(value_col) - F.col("_med")) / (
        F.lit(1.4826) * F.greatest(F.col("_mad"), F.lit(1e-12))
    )
    return (
        events.join(F.broadcast(base), key_col)
        .withColumn("mz", F.floor(score * 1e4 + 0.5) / 1e4)
        .filter(F.col("mz") > threshold)
    )


def attribution_multitouch(
    events: DataFrame,
    credit_type: str = "view",
    convert_type: str = "purchase",
    window_days: int = 7,
) -> DataFrame:
    """Multi-touch attribution with linear + position decay: every
    ``convert_type`` event splits credit across ALL of the user's
    preceding ``credit_type`` touches inside the lookback window —
    linear (1/n each) and time-decayed (recency-weighted, weights
    normalized per conversion) — the standard upgrades over
    last-touch (:func:`attribution` keeps the single-touch form).

    Returns one row per (conversion, touch) with both weights; weight
    columns sum to 1.0 per conversion by construction.

    Scale shape: touches and conversions are two slices of ONE event
    scan, equi-joined on user_id with the time-band filter applied on
    the join output (the user key bounds the fan-out; per-user event
    counts are Zipf-bounded, the same contract as sessionize). One
    user-key exchange, one window pass for the per-conversion
    normalizers — no self-cartesian."""
    touches = events.filter(F.col("event_type") == credit_type).select(
        F.col("user_id"),
        F.col("event_id").alias("touch_id"),
        F.col("ts").alias("touch_ts"),
    )
    convs = events.filter(F.col("event_type") == convert_type).select(
        F.col("user_id"),
        F.col("event_id").alias("conversion_id"),
        F.col("ts").alias("conv_ts"),
    )
    paired = convs.join(touches, "user_id").filter(
        (F.col("touch_ts") < F.col("conv_ts"))
        & (
            F.col("touch_ts")
            >= F.col("conv_ts") - F.expr(f"INTERVAL {window_days} DAYS")
        )
    )
    w = Window.partitionBy("conversion_id")
    age_sec = (
        F.unix_timestamp("conv_ts") - F.unix_timestamp("touch_ts")
    ).cast("double")
    # harmonic time decay 1/(1 + age_days), normalized per conversion:
    # pure IEEE-754 arithmetic (no libm exp), so the weights are
    # bit-identical on any engine — the oracle-parity discipline
    decay = F.lit(1.0) / (F.lit(1.0) + age_sec / F.lit(86400.0))
    return (
        paired.withColumn("n_touches", F.count("*").over(w))
        .withColumn("_decay", decay)
        .withColumn("_decay_sum", F.sum("_decay").over(w))
        .select(
            "conversion_id",
            "user_id",
            "touch_id",
            (F.floor(F.lit(1.0) / F.col("n_touches") * 1e6 + 0.5) / 1e6).alias(
                "linear_weight"
            ),
            (
                F.floor(F.col("_decay") / F.col("_decay_sum") * 1e6 + 0.5) / 1e6
            ).alias("decay_weight"),
        )
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of the event stream
    (round 8): per-user chronological event chains collapsed to
    (from_type, to_type) counts plus row-normalized transition
    probabilities — the funnel's generalization (a funnel is one
    hand-picked path; the matrix is every observed path at once,
    feeding drop-off diagnosis and next-action prediction).

    Ordering is DETERMINISTIC: (ts, event_id) — ts alone carries ties
    at event-log granularity, which would make ``lead`` and therefore
    the whole matrix partitioning-dependent. Scale shape: one
    user-keyed window pass (the events family's standard single
    exchange) + one (from, to)-cell groupBy whose state is
    |types|² cells; probabilities are floor integer divisions of
    exact longs (prob_q6 = n·10⁶ div row_total), so the matrix
    hash-matches. Returns (from_type, to_type, n, row_total,
    prob_q6) ordered."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    hops = (
        events.select(
            F.col(user_col),
            F.col(type_col).alias("from_type"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    totals = hops.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("row_total")
    )
    return (
        hops.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            "row_total",
            (F.expr("n * 1000000 div row_total") / 1e6).alias("prob_q6"),
        )
        .orderBy("from_type", "to_type")
    )


def ab_welch_t2(
    df: DataFrame,
    variant: Column,
    metric: Column,
    unit_col: str = "user_id",
) -> DataFrame:
    """Two-variant A/B analysis on a per-unit metric (round 9): Welch's
    t² between variant 0 and variant 1 of ``variant`` (an assignment
    expression — production assigns via ``text.hash_split``'s md5
    buckets), with the per-unit metric aggregated first so heavy users
    can't masquerade as many independent samples (the classic A/B
    pitfall; the unit of randomization is the unit of analysis).

    Exact-integer discipline (the kappa/AUC/regression house style):
    per-variant (n, S1=Σx, S2=Σx²) are exact bigints, and

        t² = (S1a·nb − S1b·na)² · (na−1)(nb−1)
             ────────────────────────────────────────────────────────
             (na·S2a − S1a²)·nb²(nb−1) + (nb·S2b − S1b²)·na²(na−1)

    is that statistic as ONE exact rational (the (na·nb)² factors of
    the mean-difference and variance terms cancel), carried in
    decimal(38,0) and floor-divided to ``t2_q6`` — bit-identical on
    any engine, which is what lets the DuckDB oracle certify the whole
    analysis. Welch (unequal variances), not pooled Student: variant
    populations in real experiments rarely share variance.

    ``df_q6`` (round 10) completes the analysis with the
    Welch–Satterthwaite degrees of freedom. With Qa = na·S2a − S1a²
    and Ta = Qa·nb²(nb−1), Tb = Qb·na²(na−1) — the two terms already
    summed in the t² denominator — the df collapses to

        df = (Ta+Tb)² (na−1)(nb−1) / (Ta²(nb−1) + Tb²(na−1))

    whose Ta² would overflow 38 digits at production magnitudes, so it
    is computed through ONE fixed-point reduction by max(Ta,Tb):
    u_q9 = ⌊min/max · 10⁹⌋, then df from (u_q9, na, nb) in exact
    integer arithmetic with a two-step floor division (no 10⁶
    blow-up). Every step is integer ops both engines replay
    bit-identically (the integer-Lloyd convention); the only
    approximation is u's 10⁻⁹ quantization — relative df error
    < 2·10⁻⁹. One-sided variance (Tlo = 0) lands exactly on the
    textbook limit df = n_hi − 1.

    Magnitude envelope (the kappa/AUC convention): the t² numerator
    (S1a·nb − S1b·na)²(na−1)(nb−1) must fit DECIMAL(38,0) — holds when
    |S1a·nb − S1b·na|·√(na·nb) < 10¹⁹, e.g. micro-unit per-unit means
    up to 10⁶ with arms up to ~3·10⁶ units. PAST the envelope the
    result is never silently NULL: overflow NULLs are caught by the
    assert and fail loudly, and inside the envelope the t² floor is a
    two-step form (quotient·1e6 + scaled remainder) with an exact 2e19
    pre-shrink branch for denominators past 10³², so no intermediate
    of the division itself can overflow either. df_q6's reduced form
    has no practical ceiling (exact to arms of ~10¹³ units).

    Scale shape: one per-unit groupBy (map-side combined), then one
    always-exactly-one-row conditional rollup — no corpus-sized
    shuffle beyond the unit aggregation, and (round 10) no crossJoin:
    a MISSING arm can no longer yield a silent empty result — the
    rollup emits its single row regardless and the n_a/n_b guard
    fails loudly (assert_true, the classifier_auc convention), as do
    n < 2 or zero variance in both arms."""
    arm_a = F.col("variant") == 0
    arm_b = F.col("variant") == 1
    per_unit = (
        df.select(
            variant.cast("int").alias("variant"),
            F.col(unit_col).alias("unit"),
            metric.cast("bigint").alias("x"),
        )
        .groupBy("variant", "unit")
        .agg(F.sum("x").cast("bigint").alias("x"))
    )
    xx = F.col("x") * F.col("x")
    row = per_unit.groupBy().agg(
        F.count(F.when(arm_a, True)).cast("bigint").alias("n_a"),
        F.sum(F.when(arm_a, F.col("x"))).cast("bigint").alias("sum_a"),
        F.sum(F.when(arm_a, xx)).cast("bigint").alias("_s2a"),
        F.count(F.when(arm_b, True)).cast("bigint").alias("n_b"),
        F.sum(F.when(arm_b, F.col("x"))).cast("bigint").alias("sum_b"),
        F.sum(F.when(arm_b, xx)).cast("bigint").alias("_s2b"),
    )
    d38 = "decimal(38,0)"
    num = (
        f"CAST((CAST(sum_a AS {d38}) * n_b - CAST(sum_b AS {d38}) * n_a) *"
        f" (CAST(sum_a AS {d38}) * n_b - CAST(sum_b AS {d38}) * n_a) *"
        " (n_a - 1) * (n_b - 1) AS DECIMAL(38,0))"
    )
    w = row.select(
        "*",
        F.expr(num).alias("_num"),
        F.expr(
            f"CAST((CAST(n_a AS {d38}) * _s2a - CAST(sum_a AS {d38}) * sum_a)"
            f" * n_b * n_b * (n_b - 1) AS {d38})"
        ).alias("_ta"),
        F.expr(
            f"CAST((CAST(n_b AS {d38}) * _s2b - CAST(sum_b AS {d38}) * sum_b)"
            f" * n_a * n_a * (n_a - 1) AS {d38})"
        ).alias("_tb"),
    ).select(
        "*",
        F.expr(f"CAST(_ta + _tb AS {d38})").alias("_den"),
        F.expr("greatest(_ta, _tb)").alias("_thi"),
        F.expr("least(_ta, _tb)").alias("_tlo"),
        F.expr("CASE WHEN _ta >= _tb THEN n_b - 1 ELSE n_a - 1 END").alias(
            "_whi"
        ),
        F.expr("CASE WHEN _ta >= _tb THEN n_a - 1 ELSE n_b - 1 END").alias(
            "_wlo"
        ),
    ).select(
        "*",
        # u_q9 = floor(Tlo/Thi * 1e9); the huge-Thi branch (T >= 1e26)
        # pre-shrinks BOTH terms by 2e19 so every div quotient fits a
        # long (Spark's div returns bigint) and no product overflows
        # 38 digits — both branches are pure integer ops an oracle
        # replays exactly
        F.expr(
            "CASE WHEN _thi <= 0 THEN CAST(0 AS BIGINT)"
            "     WHEN _thi < CAST(100000000000000000000000000 AS"
            f"      {d38}) THEN CAST(_tlo * 1000000000 AS {d38}) div _thi"
            "     ELSE CAST(_tlo div 20000000000000000000 AS"
            f"      {d38}) * 1000000000 div"
            "      (_thi div 20000000000000000000) END"
        ).alias("_u"),
    ).select(
        "*",
        F.expr(
            f"CAST((CAST(1000000000 + _u AS {d38}) *"
            f" (1000000000 + _u)) * (n_a - 1) * (n_b - 1) AS {d38})"
        ).alias("_dfnum"),
        F.expr(
            f"CAST(CAST(_whi AS {d38}) * 1000000000000000000 +"
            f" CAST(_u AS {d38}) * _u * _wlo AS {d38})"
        ).alias("_dfden"),
    )
    ok = F.expr(
        "n_a >= 2 AND n_b >= 2 AND _num IS NOT NULL AND _den IS NOT NULL"
        " AND _den > 0"
    )
    err = F.lit(
        "ab_welch_t2 undefined: each variant needs n >= 2, the variance"
        " term must be positive, and the exact numerator must fit"
        " DECIMAL(38,0) (see the magnitude envelope in the docstring)"
    )
    guarded = F.assert_true(ok, err).isNull()
    return w.select(
        "n_a",
        "n_b",
        "sum_a",
        "sum_b",
        (F.expr("sum_a * 1000000 div n_a") / 1e6).alias("mean_a_q6"),
        (F.expr("sum_b * 1000000 div n_b") / 1e6).alias("mean_b_q6"),
        # two-step floor (exact, no 1e6 blow-up of a near-38-digit
        # numerator); a denominator past 10^32 — where even the
        # remainder·1e6 product would overflow — takes the same exact
        # 2e19 pre-shrink branch as the _u fixed-point (relative error
        # ~4e-13, below the q6 quantum), so t2_q6 is NEVER silently
        # NULL inside the guard
        F.when(
            guarded,
            F.expr(
                "CASE WHEN _den < CAST("
                f" 100000000000000000000000000000000 AS {d38})"
                " THEN CAST((_num div _den) * 1000000 +"
                f" (CAST(_num % _den AS {d38}) * 1000000) div _den"
                " AS DOUBLE)"
                " ELSE CAST((CAST(_num div 20000000000000000000 AS"
                f" {d38}) * 1000000) div"
                " (_den div 20000000000000000000) AS DOUBLE) END"
            )
            / 1e6,
        ).alias("t2_q6"),
        # two-step floor: floor(1e6 N/D) = 1e6 floor(N/D) +
        # floor(1e6 (N mod D) / D) — exact without the 1e6 blow-up
        F.when(
            guarded,
            F.expr(
                "CAST((_dfnum div _dfden) * 1000000 +"
                " (CAST(_dfnum % _dfden AS DECIMAL(38,0)) * 1000000)"
                " div _dfden AS DOUBLE)"
            )
            / 1e6,
        ).alias("df_q6"),
    )
