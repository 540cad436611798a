"""SparkSession factory with a scale-aware config policy.

Reference parity: SQLContext/HiveContext construction
(/root/reference sql/core/src/main/scala/org/apache/spark/sql/SQLContext.scala:64)
— in modern Spark a single SparkSession covers both.

The config policy is tuned for correctness-vs-oracle first, then for
the 100 TB design goals:

- **AQE on** (coalesce shuffle partitions, skew-join splitting, runtime
  broadcast demotion/promotion) — the modern superset of the reference's
  ExchangeCoordinator (sql/core/.../execution/ExchangeCoordinator.scala:79).
- **Session timezone UTC** so timestamp-derived values (year/hour/...)
  match an independent oracle engine regardless of host timezone.
- **Arrow enabled** so any Python-side batch exchange
  (pandas_udf / mapInPandas / toPandas) is vectorized, never
  row-pickled (the reference's BatchPythonEvaluation,
  sql/core/.../execution/python.scala:356, is the slow ancestor).
- **shuffle.partitions** defaults to the local core count; on a real
  cluster this should be ~2-3x total cores — AQE coalesces down, so
  err high. Overridable via SPARK_GRAFT_SHUFFLE_PARTITIONS.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _master_already_configured() -> bool:
    """True when spark-submit / shell args already set a master.

    Under ``spark-submit`` the JVM starts first and ``SparkConf()``
    sees the ``spark.master`` system property; interactive ``pyspark``
    shells carry ``--master`` in PYSPARK_SUBMIT_ARGS. Checking here
    keeps ``get_session()`` from clobbering a cluster deployment with
    local[N]. (Deliberately NOT keyed on generic env vars like MASTER —
    an unrelated shell export must not suppress the local fallback.)
    """
    if "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", ""):
        return True
    try:
        from pyspark import SparkConf

        return SparkConf().contains("spark.master")
    except Exception:
        return False


def get_session(
    app_name: str = "big-data-project-implementation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine's SparkSession.

    On a cluster, ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = _default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", max(cpus, 8))
        )
    builder = (
        SparkSession.builder.appName(app_name)
        # -- determinism / oracle alignment -------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- heap: in local mode the driver JVM hosts all executor threads;
        #    the 1g default OOMs under 32 concurrent tasks. On a cluster
        #    this is superseded by spark-submit --driver-memory/--executor-memory.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        )
        .config("spark.driver.maxResultSize", "4g")
        # -- adaptive execution (runtime re-planning at shuffle boundaries)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing ------------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # keep scan partitions meaty: 128 MiB splits like a real cluster.
        # Scale-dependent (guide §6: 512 MiB - 1 GiB cuts task-scheduling
        # overhead and the map-task count feeding shuffles on large
        # sequential scans), so overridable per deployment; the local
        # default stays 128 MiB to keep the driver's bench comparable.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # -- python boundary: Arrow everywhere -----------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- joins: broadcast small dims (reference CanBroadcast,
        #    sql/core/.../execution/SparkStrategies.scala:55)
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # -- scans: make sure pushdown is on (it is by default; pin it)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # -- streaming state: RocksDB, not the default executor-heap
        #    HDFSBackedStateStore. Heap state is the first thing that
        #    falls over at 100 TB stream volume (windowed distinct /
        #    sessionize / stream-stream joins hold state proportional
        #    to key arrival x watermark delay; the heap store keeps
        #    EVERY version of it on-heap and GC-thrashes well before
        #    OOM). RocksDB spills to local disk with bounded block
        #    cache, changelog-checkpoints incrementally, and is the
        #    documented provider for large-state production streams.
        #    All stateful queries + checkpoint/restart exactly-once
        #    tests run under it (tests/test_streaming.py);
        #    SPARK_GRAFT_STATE_STORE=hdfs restores the heap store.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
            if os.environ.get("SPARK_GRAFT_STATE_STORE") == "hdfs"
            else "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        # unmodified state files from past versions are reused, not
        # re-uploaded, at each RocksDB checkpoint — the incremental
        # behavior a long-running 100 TB stream needs
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not _master_already_configured():
        # No master from the caller, spark-submit, or spark-defaults:
        # fall back to local[N] mirroring one executor. A submitted
        # --master yarn/k8s always wins — never override it here.
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
