"""Round-12 operator tests — the VERDICT r11 / ADVICE r11 items:
the LexicalIndex front door (hardened state chains + compaction),
duplicate-tombstone retraction, the compact_batch_view keep_last
guard, Hadoop-FS path resolution, and the state_files fan-out policy.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import text
from big_data_project_implementation_spark.operators.views import (
    LexicalIndex,
    MaterializedView,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(df):
    return sorted(
        tuple((x is None, x) for x in r) for r in df.collect()
    )


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark joins spark"),
            (2, "vector search engine"),
            (3, "spark vector"),
            (4, "unique zanzibar token"),
            (5, "customer spark"),
        ],
        "doc_id long, text string",
    )


# -- VERDICT r11 what's-wrong #1: the bm25 chains refuse data loss -------


def test_lexical_stream_gate_refuses_missing_predecessor(spark):
    """A missing v=N-1 in the docfreq/stats chains is DATA LOSS — the
    round-11 machinery silently re-initialized from the one batch,
    truncating idf/corpus stats for every later fold. The LexicalIndex
    gate must RAISE instead (the views.py stream_gate discipline)."""
    out_dir = tempfile.mkdtemp(prefix="lx_refuse_")
    try:
        lx = LexicalIndex()
        gate = lx.stream_gate(out_dir)
        docs = _docs(spark)
        gate(docs.filter("doc_id <= 2"), 0)
        gate(docs.filter("doc_id = 3"), 1)
        shutil.rmtree(f"{out_dir}/docfreq/v=1")
        with pytest.raises(ValueError, match="refusing to re-initialize"):
            gate(docs.filter("doc_id = 4"), 2)
        # the stats chain refuses independently of docfreq's
        gate2 = LexicalIndex().stream_gate(out_dir + "_2")
        gate2(docs.filter("doc_id <= 2"), 0)
        gate2(docs.filter("doc_id = 3"), 1)
        shutil.rmtree(f"{out_dir}_2/stats/v=1")
        with pytest.raises(ValueError, match="stats state chain"):
            gate2(docs.filter("doc_id = 4"), 2)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(out_dir + "_2", ignore_errors=True)


def test_lexical_stream_compaction_preserves_scores(spark):
    """VERDICT r11 what's-wrong #3: the postings/lens stores route
    through compact_batch_view — mid-lifecycle compaction must be
    non-vacuous and leave BM25 scores bit-identical (bag-exact
    segment merge), with the chains pruned to the replay window."""
    out_dir = tempfile.mkdtemp(prefix="lx_compact_")
    try:
        lx = LexicalIndex()
        gate = lx.stream_gate(out_dir)
        docs = _docs(spark)
        for i in range(4):
            gate(docs.filter(F.col("doc_id") % 4 == i), i)
        before = _canon(
            lx.search(lx.stream_read(spark, out_dir), ("spark", "vector"))
        )
        n_merged, _seg = lx.compact(spark, out_dir, keep_last=1)
        # postings 3 + lens 3 merged, docfreq 2 + stats 2 pruned
        assert n_merged >= 8
        after = _canon(
            lx.search(lx.stream_read(spark, out_dir), ("spark", "vector"))
        )
        assert before == after
        want = _canon(text.bm25_scores(docs, ("spark", "vector")))
        assert after == want
        # the chain retains exactly the replay window: newest + its
        # predecessor (the replayed in-flight batch reads v=N-1)
        import glob

        assert sorted(glob.glob(f"{out_dir}/docfreq/v=*")) == [
            f"{out_dir}/docfreq/v=2",
            f"{out_dir}/docfreq/v=3",
        ]
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_lexical_index_batch_verbs_match_free_functions(spark):
    """The front door dispatches to the same certified algebra — same
    results as the round-11 free functions, custom columns included."""
    docs = _docs(spark).select(
        F.col("doc_id").alias("id_"), F.col("text").alias("body")
    )
    lx = LexicalIndex(text_col="body", id_col="id_")
    old = docs.filter("id_ <= 3")
    delta = docs.filter("id_ > 3")
    got = lx.search(
        lx.refresh(lx.compute(old), delta), ("spark", "customer")
    )
    want = text.bm25_scores(docs, ("spark", "customer"), "body", "id_")
    assert _canon(got) == _canon(want)


# -- ADVICE r11: duplicate tombstones must not double-subtract -----------


def test_lexical_index_retract_duplicate_tombstones(spark):
    """A CDC feed repeating a deletion row must subtract the document's
    docfreq/stats exactly once (the anti join drops its postings/lens
    rows once either way) — duplicates previously under-counted df and
    n vs a rebuild."""
    docs = _docs(spark)
    dead_once = docs.filter("doc_id = 4")
    dead_dup = dead_once.unionByName(dead_once).unionByName(dead_once)
    state = text.lexical_index_state(docs)
    got = text.lexical_index_retract(state, dead_dup)
    want = text.lexical_index_state(docs.filter("doc_id <> 4"))
    for g, w in zip(got, want):
        assert _canon(g) == _canon(w)


# -- ADVICE r11: compact_batch_view guards the replay tail ---------------


def test_compact_batch_view_rejects_keep_last_zero(spark):
    from big_data_project_implementation_spark import streaming as st_mod

    out_dir = tempfile.mkdtemp(prefix="cbv_guard_")
    try:
        with pytest.raises(ValueError, match="keep_last must be >= 1"):
            st_mod.compact_batch_view(spark, out_dir, keep_last=0)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


# -- ADVICE r11: stores navigate via the Hadoop FileSystem ---------------


def test_state_chain_resolves_file_uris(spark):
    """stream_gate / stream_read / prune_state_chain must work when
    out_dir is a URI the driver's os.path cannot see as-is — file:/
    exercises the Hadoop FileSystem path end-to-end (HDFS/s3a resolve
    through the identical API)."""
    local = tempfile.mkdtemp(prefix="mv_uri_")
    out_dir = "file:" + local
    try:
        mv = MaterializedView("agg", keys=["g"], value="v")
        gate = mv.stream_gate(out_dir)
        for i, rows in enumerate([[(1, 2), (2, 3)], [(1, 5)], [(2, 1)]]):
            gate(spark.createDataFrame(rows, "g int, v int"), i)
        got = _canon(mv.stream_read(spark, out_dir))
        want = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 5), (2, 1)], "g int, v int"
        )
        from big_data_project_implementation_spark.operators import relational

        assert got == _canon(relational.mergeable_agg_state(want, ["g"], "v"))
        # a replayed batch folds from its predecessor, not from itself
        gate(spark.createDataFrame([(2, 1)], "g int, v int"), 2)
        assert _canon(mv.stream_read(spark, out_dir)) == got
        from big_data_project_implementation_spark import streaming as st_mod

        removed, newest = st_mod.prune_state_chain(out_dir, keep_last=1)
        assert (removed, newest) == (1, "v=2")
    finally:
        shutil.rmtree(local, ignore_errors=True)


def test_fsio_glob_and_delete(spark):
    import os

    from big_data_project_implementation_spark.sources import fsio

    d = tempfile.mkdtemp(prefix="fsio_")
    try:
        os.makedirs(f"{d}/v=0")
        os.makedirs(f"{d}/v=1")
        open(f"{d}/v=stray", "w").close()  # file, not a version dir
        assert fsio.exists(spark, f"{d}/v=0")
        assert not fsio.exists(spark, f"{d}/v=9")
        dirs = fsio.list_glob(spark, f"{d}/v=*", dirs_only=True)
        assert sorted(p.rsplit("=", 1)[1] for p in dirs) == ["0", "1"]
        assert fsio.delete(spark, f"{d}/v=0")
        assert not fsio.exists(spark, f"{d}/v=0")
        assert not fsio.delete(spark, f"{d}/v=0")  # already gone
    finally:
        shutil.rmtree(d, ignore_errors=True)


# -- VERDICT r11 what's-wrong #2: state_files fan-out policy -------------


def _n_parquet_files(path):
    import glob as _g

    return len(_g.glob(f"{path}/*.parquet"))


def test_state_files_policy_regimes(spark):
    """'auto' writes one file while the state is small and falls back
    to the plan's own parallelism once it crosses state_file_rows; an
    int pins the fan-out; bad values are rejected at construction."""
    out = tempfile.mkdtemp(prefix="mv_fanout_")
    try:
        rows = spark.range(100).select(
            (F.col("id") % 50).alias("g"), F.col("id").alias("v")
        )
        small = MaterializedView("agg", keys=["g"], value="v")
        small.stream_gate(f"{out}/small")(rows, 0)
        assert _n_parquet_files(f"{out}/small/v=0") == 1
        # past the row bound, "auto" leaves the plan's own parallelism
        # untouched (identity — no forced coalesce; at test scale AQE
        # may still legitimately shrink that to one partition)
        from big_data_project_implementation_spark.operators.views import (
            _sized_state,
        )

        big = _sized_state(rows, "auto", 10)
        assert big.rdd.getNumPartitions() > 1  # no forced coalesce
        assert _sized_state(rows, "auto", 1_000_000).rdd.getNumPartitions() == 1
        pinned = MaterializedView("agg", keys=["g"], value="v", state_files=3)
        pinned.stream_gate(f"{out}/pinned")(rows, 0)
        assert _n_parquet_files(f"{out}/pinned/v=0") == 3
        with pytest.raises(ValueError, match="state_files"):
            MaterializedView("agg", keys=["g"], value="v", state_files=0)
        with pytest.raises(ValueError, match="state_files"):
            LexicalIndex(state_files="never")
    finally:
        shutil.rmtree(out, ignore_errors=True)


# -- VERDICT r11 #2: the storage-aware deployment surface ----------------


def _agg_mv():
    return MaterializedView("agg", keys=["g"], value="v")


def test_materialized_agg_store_matches_recompute(spark):
    """materialize → apply_delta → apply_retract through the
    key-bucketed store equals the in-memory state over the final base,
    including the surgical extreme repair under deletion."""
    from big_data_project_implementation_spark.operators import relational

    root = tempfile.mkdtemp(prefix="mv_store_test_")
    path = f"{root}/agg"
    try:
        rows = [(g, v) for g in range(20) for v in (g, g + 5, g + 9)]
        base = spark.createDataFrame(rows, "g int, v int")
        old = base.filter("v % 2 = 0")
        delta = base.filter("v % 2 = 1")
        mv = _agg_mv()
        mv.materialize(mv.compute(old), path, buckets=8)
        touched = mv.apply_delta(spark, path, delta)
        assert touched and all(0 <= b < 8 for b in touched)
        got = mv.read_materialized(spark, path)
        want = relational.mergeable_agg_state(base, ["g"], "v")
        assert _canon(got) == _canon(want)
        # deletion with the repair scan, through the store
        deleted = base.filter("v = g + 9")
        remaining = base.exceptAll(deleted)
        mv.apply_retract(spark, path, deleted, base_remaining=remaining)
        got2 = mv.read_materialized(spark, path)
        want2 = relational.mergeable_agg_state(remaining, ["g"], "v")
        assert _canon(got2) == _canon(want2)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_materialized_store_drops_emptied_bucket(spark):
    """A touched bucket whose every row died must lose its files —
    dynamic partition overwrite alone leaves them stale (zombie rows
    on the next read)."""
    import glob

    root = tempfile.mkdtemp(prefix="mv_store_empty_")
    path = f"{root}/win"
    try:
        mv = MaterializedView(
            "window", keys=["g"], order_by=[F.col("o").asc()], value="v",
        )
        # pick two keys that land in DIFFERENT buckets of 16
        probe = spark.createDataFrame(
            [(k,) for k in range(40)], "g int"
        ).select("g", mv._kb(16).alias("kb"))
        by_bucket = {}
        for r in probe.collect():
            by_bucket.setdefault(r["kb"], r["g"])
        (b1, k1), (b2, k2) = list(by_bucket.items())[:2]
        base = spark.createDataFrame(
            [(k1, 1, 10), (k1, 2, 20), (k2, 1, 30)], "g int, o int, v int"
        )
        mv.materialize(mv.compute(base), path, buckets=16)
        # kill every row of k1 -> its bucket empties entirely
        mv.apply_retract(spark, path, base.filter(F.col("g") == k1))
        assert not glob.glob(f"{path}/kb={b1}/*.parquet")
        got = mv.read_materialized(spark, path)
        assert [(r["g"], r["running_sum"]) for r in got.collect()] == [
            (k2, 30)
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)


# -- ADVICE r11: byte-aware 'auto' broadcast policy -----------------------


def test_auto_broadcast_is_byte_aware(spark):
    """A wide-row delta under the ROW cap must not be force-broadcast:
    the 'auto' policy byte-checks a sampled row width × the bounded
    count against auto_broadcast_bytes."""
    wide = spark.createDataFrame(
        [(i, "x" * 10_000) for i in range(100)], "g int, v string"
    )
    narrow = spark.createDataFrame([(i, "y") for i in range(100)], "g int, v string")
    mv = MaterializedView(
        "distinct", cols=["g"], broadcast_deltas="auto",
        auto_broadcast_rows=1_000, auto_broadcast_bytes=200_000,
    )
    assert mv._bcast(narrow) is True
    assert mv._bcast(wide) is False  # ~1 MB projected > 200 kB ceiling
    assert mv._bcast(narrow, wide) is False  # any oversized delta vetoes
    # row cap still vetoes first, and None disables the byte check
    small_cap = MaterializedView(
        "distinct", cols=["g"], broadcast_deltas="auto",
        auto_broadcast_rows=10,
    )
    assert small_cap._bcast(narrow) is False
    no_bytes = MaterializedView(
        "distinct", cols=["g"], broadcast_deltas="auto",
        auto_broadcast_rows=1_000, auto_broadcast_bytes=None,
    )
    assert no_bytes._bcast(wide) is True
    with pytest.raises(ValueError, match="auto_broadcast_bytes"):
        MaterializedView(
            "distinct", cols=["g"], auto_broadcast_bytes=0
        )
    # ADVICE r12: a SIZE-ORDERED delta (narrow head, wide tail) must be
    # vetoed too — a prefix sample sees only the narrow head and passes
    # exactly the delta the byte guard exists to catch
    tailheavy = spark.createDataFrame(
        [(i, "y") for i in range(900)]
        + [(i, "x" * 10_000) for i in range(900, 1000)],
        "g int, v string",
    ).coalesce(1)  # one ordered partition: the wide rows ARE the tail
    assert mv._bcast(tailheavy) is False


# -- VERDICT r11 #5 (missing): two-sided streaming views ------------------


def test_stream_join_contracts(spark):
    """stream_join refuses the kinds/shapes that cannot maintain
    exactly-once, and produces USING semantics (one coalesced key) for
    full joins — checked on batch frames, where the join mechanics are
    identical."""
    with pytest.raises(ValueError, match="two-sided streaming"):
        MaterializedView("semi", on=["k"]).stream_join(None, None)
    with pytest.raises(ValueError, match="time_bound"):
        MaterializedView("left", on=["k"]).stream_join(None, None)
    a = spark.createDataFrame([(1, 10, "x"), (2, 10, "y")], "k int, t int, av string")
    b = spark.createDataFrame([(1, 11, "p"), (3, 11, "q")], "k int, t2 int, bv string")
    mv = MaterializedView("full", on=["k"])
    out = mv.stream_join(
        a, b, time_bound=F.col("t2") >= F.col("t")
    )
    assert out.columns == ["k", "t", "av", "t2", "bv"]
    rows = {(r["k"], r["av"], r["bv"]) for r in out.collect()}
    assert rows == {(1, "x", "p"), (2, "y", None), (3, None, "q")}
    inner = MaterializedView("inner", on=["k"]).stream_join(a, b)
    assert inner.columns == ["k", "t", "av", "t2", "bv"]
    assert inner.count() == 1


# -- VERDICT r11 #3: the SQL front door ----------------------------------


def _sqlcat(spark):
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    return SqlViewCatalog(spark)


def test_sql_catalog_single_base_kinds(spark):
    """distinct / agg / topk views created from SQL, refreshed and
    retracted by statement, always equal to recomputing the defining
    query over the current base."""
    cat = _sqlcat(spark)
    rows = [(g, o, g * 10 + o) for g in (1, 2) for o in range(1, 5)]
    base = spark.createDataFrame(rows, "g int, o int, v int")
    base.createOrReplaceTempView("r12_t")
    delta = spark.createDataFrame([(1, 9, 99), (3, 1, 31)], "g int, o int, v int")
    delta.createOrReplaceTempView("r12_d")
    merged = base.unionByName(delta)

    cat.sql("CREATE MATERIALIZED VIEW r12_vd AS SELECT DISTINCT g FROM r12_t")
    cat.sql("REFRESH MATERIALIZED VIEW r12_vd USING r12_d")
    assert _canon(spark.table("r12_vd")) == _canon(merged.select("g").distinct())
    # distinct retraction needs only the deleted rows
    spark.createDataFrame([(3, 1, 31)], "g int, o int, v int").createOrReplaceTempView("r12_del")
    cat.sql("ALTER MATERIALIZED VIEW r12_vd RETRACT USING r12_del")
    assert _canon(spark.table("r12_vd")) == _canon(base.select("g").distinct())

    cat.sql(
        "CREATE MATERIALIZED VIEW r12_va AS SELECT g, COUNT(*) AS n,"
        " SUM(v) AS sum, MIN(v) AS min, MAX(v) AS max FROM r12_t GROUP BY g"
    )
    cat.sql("REFRESH MATERIALIZED VIEW r12_va USING r12_d")
    want = spark.sql(
        "SELECT g, COUNT(*) AS n, SUM(v) AS sum, MIN(v) AS min,"
        " MAX(v) AS max FROM (SELECT * FROM r12_t UNION ALL"
        " SELECT * FROM r12_d) GROUP BY g"
    )
    got = spark.table("r12_va")
    assert sorted((r["g"], r["n"], r["sum"], r["min"], r["max"])
                  for r in got.collect()) == \
        sorted((r["g"], r["n"], r["sum"], r["min"], r["max"])
               for r in want.collect())
    # agg retraction repairs extremes from the remaining base
    merged.filter("v <> 14").createOrReplaceTempView("r12_rem")
    spark.createDataFrame([(1, 4, 14)], "g int, o int, v int").createOrReplaceTempView("r12_del2")
    cat.sql(
        "ALTER MATERIALIZED VIEW r12_va RETRACT USING r12_del2"
        " REMAINING r12_rem"
    )
    g1 = {r["g"]: r for r in spark.table("r12_va").collect()}
    assert (g1[1]["n"], g1[1]["max"]) == (4, 99)

    cat.sql(
        "CREATE MATERIALIZED VIEW r12_vt AS SELECT g, o, v FROM"
        " (SELECT *, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v DESC, o)"
        " AS rn FROM r12_t) WHERE rn <= 2"
    )
    cat.sql("REFRESH MATERIALIZED VIEW r12_vt USING r12_d")
    want_tk = spark.sql(
        "SELECT g, o, v FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY g"
        " ORDER BY v DESC, o) AS rn FROM (SELECT * FROM r12_t UNION ALL"
        " SELECT * FROM r12_d)) WHERE rn <= 2"
    )
    assert _canon(spark.table("r12_vt")) == _canon(want_tk)
    names = {r["name"] for r in cat.sql("SHOW MATERIALIZED VIEWS").collect()}
    assert {"r12_vd", "r12_va", "r12_vt"} <= names
    cat.sql("DROP MATERIALIZED VIEW r12_vt")
    assert "r12_vt" not in {
        r["name"] for r in cat.sql("SHOW MATERIALIZED VIEWS").collect()
    }


def test_sql_spelling_adds_nothing_to_the_plan(spark):
    """The SQL front door dispatches to the same algebra as the Python
    API — the lifecycle rows' PHYSICAL plans must carry identical
    shuffle counts and join multisets (the r11 proof that the API adds
    nothing to the plan, extended to the parser)."""
    import re as _re

    from big_data_project_implementation_spark import plans
    from big_data_project_implementation_spark.queries import REGISTRY

    join_re = _re.compile(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
        r"|BroadcastNestedLoopJoin|CartesianProduct)"
    )

    def fp(name):
        df = REGISTRY[name].fn(spark, SF_DIR)
        return (
            plans.count_shuffles(df),
            tuple(sorted(join_re.findall(plans.physical_plan(df)))),
        )

    assert fp("view_sql_lifecycle") == fp("view_api_lifecycle")


def test_sql_stored_view_maintains_on_disk(spark):
    """CREATE … STORED AT puts the view in its bucketed layout;
    REFRESH/RETRACT rewrite touched buckets on disk, and the store is
    plain parquet readable outside the catalog; DROP unregisters but
    leaves the files (a store is a table, not session state)."""
    import glob

    root = tempfile.mkdtemp(prefix="sqlstore_")
    path = f"{root}/agg"
    cat = _sqlcat(spark)
    base = spark.createDataFrame(
        [(g, v) for g in range(6) for v in (g, g + 3)], "g int, v int"
    )
    base.createOrReplaceTempView("r12_st")
    delta = spark.createDataFrame([(1, 99), (7, 70)], "g int, v int")
    delta.createOrReplaceTempView("r12_sd")
    try:
        cat.sql(
            f"CREATE MATERIALIZED VIEW r12_sv STORED AT '{path}' BUCKETS 8"
            " AS SELECT g, COUNT(*) AS n, SUM(v) AS sum, MIN(v) AS min,"
            " MAX(v) AS max FROM r12_st GROUP BY g"
        )
        assert glob.glob(f"{path}/kb=*"), "store not materialized"
        cat.sql("REFRESH MATERIALIZED VIEW r12_sv USING r12_sd")
        # the registered name reads the maintained STORE
        got = {r["g"]: r["max"] for r in spark.table("r12_sv").collect()}
        assert got[1] == 99 and got[7] == 70
        # and so does a catalog-less reader (plain parquet)
        raw = spark.read.parquet(path)
        assert raw.filter("g = 7").count() == 1
        # deletion with extreme repair, on disk
        spark.createDataFrame([(1, 99)], "g int, v int").createOrReplaceTempView("r12_sdel")
        base.unionByName(delta).filter("v <> 99").createOrReplaceTempView("r12_srem")
        cat.sql(
            "ALTER MATERIALIZED VIEW r12_sv RETRACT USING r12_sdel"
            " REMAINING r12_srem"
        )
        got = {r["g"]: (r["n"], r["max"]) for r in spark.table("r12_sv").collect()}
        assert got[1] == (2, 4)
        cat.sql("DROP MATERIALIZED VIEW r12_sv")
        assert glob.glob(f"{path}/kb=*"), "DROP must leave the store files"
        # left/full outer kinds refuse STORED AT (null flips are
        # two-sided — they deploy via the stream store); inner/semi/
        # anti gained a bucketed store in round 13 (test_round13_ops)
        spark.createDataFrame([(1, "x")], "g int, s string").createOrReplaceTempView("r12_sj")
        with pytest.raises(ValueError, match="append-only streaming"):
            cat.sql(
                f"CREATE MATERIALIZED VIEW r12_bad STORED AT '{root}/j' AS"
                " SELECT * FROM r12_st LEFT JOIN r12_sj USING (g)"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_sql_catalog_refusals(spark):
    """What can't be maintained incrementally is refused at CREATE
    with the supported spelling — never silently recomputed."""
    cat = _sqlcat(spark)
    spark.createDataFrame(
        [(1, 1, 2)], "g int, o int, v int"
    ).createOrReplaceTempView("r12_rt")
    spark.createDataFrame([(1, 5)], "k int, bv int").createOrReplaceTempView(
        "r12_rb"
    )
    spark.createDataFrame([(1, "x")], "k int, av string").createOrReplaceTempView(
        "r12_ra"
    )
    cases = {
        # lossy aggregate: not the mergeable state
        "CREATE MATERIALIZED VIEW b1 AS SELECT g, SUM(v) AS s FROM r12_rt"
        " GROUP BY g": "mergeable state",
        # default RANGE frame diverges under ties
        "CREATE MATERIALIZED VIEW b2 AS SELECT g, o, v, SUM(v) OVER"
        " (PARTITION BY g ORDER BY o) AS rs FROM r12_rt": "ROWS BETWEEN",
        # theta join
        "CREATE MATERIALIZED VIEW b3 AS SELECT * FROM r12_ra JOIN r12_rb"
        " ON r12_ra.k < r12_rb.k": "equi-join",
        # subquery join side
        "CREATE MATERIALIZED VIEW b4 AS SELECT * FROM (SELECT * FROM"
        " r12_ra WHERE k > 0) x JOIN r12_rb USING (k)": "not a registered",
        # no maintainable node at all
        "CREATE MATERIALIZED VIEW b5 AS SELECT av FROM r12_ra":
            "cannot infer",
        # join keys with two names
        "CREATE MATERIALIZED VIEW b6 AS SELECT * FROM r12_ra JOIN r12_rb"
        " ON r12_ra.k = r12_rb.bv": "share one name",
        # a single-base kind over a join: the join would be silently
        # dropped from the maintained state
        "CREATE MATERIALIZED VIEW b7 AS SELECT k, COUNT(*) AS n,"
        " SUM(bv) AS sum, MIN(bv) AS min, MAX(bv) AS max FROM r12_ra"
        " JOIN r12_rb USING (k) GROUP BY k": "silently DROP",
    }
    for stmt, msg in cases.items():
        with pytest.raises(ValueError, match=msg):
            cat.sql(stmt)
    assert cat.sql("SHOW MATERIALIZED VIEWS").count() == 0
    # unknown view on maintenance verbs
    with pytest.raises(ValueError, match="no materialized view"):
        cat.sql("REFRESH MATERIALIZED VIEW ghost USING r12_rt")
    # passthrough still works
    assert cat.sql("SELECT 41 + 1 AS x").collect()[0]["x"] == 42


def test_sql_catalog_self_review_refusals(spark):
    """Round-12 self-review fixes, updated for round 13: derivations
    the maintained state CAN fold are maintained (one deterministic
    WHERE over the base — see test_sql_filtered_views), while the ones
    it can't are still refused (expression keys, expression order
    terms, HAVING-style filters on the view's own output, a join under
    a single-base kind); duplicate CREATE needs OR REPLACE."""
    cat = _sqlcat(spark)
    spark.createDataFrame(
        [(1, 1, 2), (1, 2, 3), (2, 1, 4)], "g int, o int, v int"
    ).createOrReplaceTempView("r12_rv")
    with pytest.raises(ValueError, match="plain columns"):
        cat.sql(
            "CREATE MATERIALIZED VIEW rb2 AS SELECT g, o, v, SUM(v) OVER"
            " (PARTITION BY g % 2 ORDER BY o ROWS BETWEEN UNBOUNDED"
            " PRECEDING AND CURRENT ROW) AS rs FROM r12_rv"
        )
    with pytest.raises(ValueError, match="ORDER BY terms"):
        cat.sql(
            "CREATE MATERIALIZED VIEW rb3 AS SELECT g, o, v FROM"
            " (SELECT *, ROW_NUMBER() OVER (PARTITION BY g"
            " ORDER BY o, v + o) AS rn FROM r12_rv) WHERE rn <= 1"
        )
    # a filter on the VIEW'S OWN OUTPUT and a pruning projection over
    # the state are read-time since round 13: the state stays the full
    # mergeable (n, sum, min, max) and the public read prunes/filters
    out_rb5 = cat.sql(
        "CREATE MATERIALIZED VIEW rb5 AS SELECT g, n FROM"
        " (SELECT g, COUNT(*) AS n, SUM(v) AS sum, MIN(v) AS min,"
        " MAX(v) AS max FROM r12_rv GROUP BY g) WHERE n > 1"
    )
    assert sorted(tuple(r) for r in out_rb5.collect()) == [(1, 2)]
    cat.sql("DROP MATERIALIZED VIEW rb5")
    # the ADVICE r12 case: an integer '<= k' outer filter over a SUM
    # window is NOT mis-classified as a top-k bound — since round 13
    # it maintains as a read-time filter over the running-sum view
    out_rb6 = cat.sql(
        "CREATE MATERIALIZED VIEW rb6 AS SELECT * FROM"
        " (SELECT g, o, v, SUM(v) OVER (PARTITION BY g ORDER BY o"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs"
        " FROM r12_rv) WHERE rs <= 3"
    )
    assert sorted(tuple(r) for r in out_rb6.collect()) == sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT * FROM (SELECT g, o, v, SUM(v) OVER (PARTITION BY g"
            " ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT"
            " ROW) AS rs FROM r12_rv) WHERE rs <= 3"
        ).collect()
    )
    cat.sql("DROP MATERIALIZED VIEW rb6")
    # ADVICE r12 (high): a JOIN hidden inside the top-k inline subquery
    # escaped the r12 string-prefix scan — the structural walk refuses
    spark.createDataFrame([(1, 5)], "g int, b int").createOrReplaceTempView(
        "r12_rvb"
    )
    with pytest.raises(ValueError, match="silently DROP"):
        cat.sql(
            "CREATE MATERIALIZED VIEW rb7 AS SELECT g, o, v FROM"
            " (SELECT r12_rv.*, ROW_NUMBER() OVER (PARTITION BY r12_rv.g"
            " ORDER BY v DESC, o) AS rn FROM r12_rv JOIN r12_rvb"
            " USING (g)) WHERE rn <= 1"
        )
    assert cat.sql("SHOW MATERIALIZED VIEWS").count() == 0
    # duplicate CREATE refused; OR REPLACE rebinds
    cat.sql("CREATE MATERIALIZED VIEW r12_dup AS SELECT DISTINCT g FROM r12_rv")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql(
            "CREATE MATERIALIZED VIEW r12_dup AS SELECT DISTINCT o FROM r12_rv"
        )
    out = cat.sql(
        "CREATE OR REPLACE MATERIALIZED VIEW r12_dup AS"
        " SELECT DISTINCT o FROM r12_rv"
    )
    assert out.columns == ["o"]
    # a pre-filtered NAMED base is legitimate (the Filter sits BELOW
    # the base's View node, maintained as part of the base definition)
    spark.table("r12_rv").filter("g = 1").createOrReplaceTempView("r12_rvf")
    ok = cat.sql(
        "CREATE MATERIALIZED VIEW r12_okf AS SELECT DISTINCT g FROM r12_rvf"
    )
    assert [r["g"] for r in ok.collect()] == [1]


def test_apply_delta_rejects_mismatched_key_types(spark):
    """The bucket hash is type-sensitive (Murmur3 of INT 1 != BIGINT 1)
    — a delta whose key dtype differs from the materialized layout
    must be refused, or its keys route to the wrong buckets and stale
    rows survive beside the new ones."""
    root = tempfile.mkdtemp(prefix="mv_types_")
    path = f"{root}/agg"
    try:
        mv = _agg_mv()
        base = spark.createDataFrame([(1, 2), (2, 3)], "g bigint, v int")
        mv.materialize(mv.compute(base), path, buckets=8)
        bad = spark.createDataFrame([(1, 9)], "g int, v int")
        with pytest.raises(ValueError, match="type-sensitive"):
            mv.apply_delta(spark, path, bad)
        mv.apply_delta(spark, path, bad.withColumn("g", F.col("g").cast("bigint")))
        got = {r["g"]: r["n"] for r in mv.read_materialized(spark, path).collect()}
        assert got == {1: 2, 2: 1}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_compaction_accepts_file_uri_and_refuses_remote_schemes(spark):
    from big_data_project_implementation_spark import streaming as st_mod

    local = tempfile.mkdtemp(prefix="cbv_uri_")
    try:
        df = spark.createDataFrame([(1,), (2,)], "x int")
        for i in range(3):
            df.write.mode("overwrite").parquet(f"{local}/batch_id={i}")
        n, seg = st_mod.compact_batch_view(spark, "file:" + local, keep_last=1)
        assert n == 2 and seg == "batch_id=-1"
        with pytest.raises(ValueError, match="local-filesystem-only"):
            st_mod.compact_batch_view(spark, "s3a://bucket/view", keep_last=1)
    finally:
        shutil.rmtree(local, ignore_errors=True)


def test_materialized_store_layout_guards(spark):
    root = tempfile.mkdtemp(prefix="mv_store_guard_")
    path = f"{root}/agg"
    try:
        base = spark.createDataFrame([(1, 2), (2, 3)], "g int, v int")
        mv = _agg_mv()
        mv.materialize(mv.compute(base), path, buckets=4)
        other = MaterializedView("agg", keys=["v"], value="g")
        with pytest.raises(ValueError, match="layout at"):
            other.apply_delta(spark, path, base)
        # round 13: inner/semi/anti gained a bucketed store; the
        # two-sided outer kinds still refuse with the reason
        with pytest.raises(ValueError, match="append-only streaming"):
            MaterializedView("left", on=["g"]).materialize(base, path)
        with pytest.raises(ValueError, match="buckets must be"):
            mv.materialize(base, f"{root}/bad", buckets=0)
    finally:
        shutil.rmtree(root, ignore_errors=True)
