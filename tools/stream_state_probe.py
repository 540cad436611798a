"""Stateful-stream STATE evidence under RocksDB at scale (VERDICT r7 #2).

The r7 100× streaming probes covered the stateless ingest gates only;
this tool drives the STATE-HEAVY family — sessionize, windowed
distinct (HLL), stream-stream interval join — through a time-shifted
scaled replica of the events table and records per-batch
`stateOperators` metrics (rows total/updated/removed, memory bytes,
RocksDB custom metrics). The evidence sought: with watermark eviction,
state size is bounded by the ACTIVE window, not by total ingested
volume — numRowsTotal plateaus across batches while input grows ~N×,
and numRowsRemoved accounts for the evicted remainder.

Replica construction (unlike tools/scale_probe.py, which scales KEYS
but leaves event time alone): replica i shifts ts by i × 31 days and
user/event ids by i × stride, written as ONE parquet file per replica
with monotonically increasing mtimes. The file source with
maxFilesPerTrigger=1 then processes replicas as ordered micro-batches,
so event time advances monotonically across batches — the real ingest
shape — and the watermark closes each replica's windows as the next
arrives. Identical keys would also plateau by accident; shifted keys
make the plateau PROOF of eviction (leaked state would grow ~N×).

Usage:
    python tools/stream_state_probe.py [--factor 100] [--src /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY_NANOS = 86_400_000_000_000
SHIFT_NANOS = 31 * DAY_NANOS  # > the 30-day fixture span: no overlap
KEY_STRIDE = 10_000_000


def build_stream_dir(spark, src: str, dst: str, factor: int) -> None:
    """Write `factor` time+key-shifted replicas of events as ordered
    single parquet files under dst (fresh build each run)."""
    from pyspark.sql import functions as F

    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    base = spark.read.parquet(f"{src}/events.parquet")
    nanos = base.schema["ts"].dataType.simpleString() == "bigint"
    for i in range(factor):
        rep = base
        if nanos:
            rep = rep.withColumn("ts", F.col("ts") + F.lit(i * SHIFT_NANOS))
        else:
            # fixture may decode as TIMESTAMP_NTZ — shift via cast
            rep = rep.withColumn(
                "ts",
                F.timestamp_micros(
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    + F.lit(i * (SHIFT_NANOS // 1000))
                ).cast(rep.schema["ts"].dataType.simpleString()),
            )
        rep = rep.withColumn(
            "user_id", F.col("user_id") + F.lit(i * KEY_STRIDE)
        ).withColumn("event_id", F.col("event_id") + F.lit(i * KEY_STRIDE))
        tmp = f"{dst}/.build_{i}"
        rep.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = f"{dst}/replica_{i:04d}.parquet"
        os.rename(f"{tmp}/{part}", final)
        shutil.rmtree(tmp)
        # file source orders batches by (mtime, path): pin both
        os.utime(final, (1_700_000_000 + i, 1_700_000_000 + i))


def _events_stream(spark, data_dir: str):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(data_dir).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(data_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def _builders():
    """name -> (session, dir) -> streaming DF. Append-mode eviction
    shapes mirroring the registry's stateful rows."""
    from pyspark.sql import functions as F

    def sessionize(s, d):
        return (
            _events_stream(s, d)
            .withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .agg(F.count("*").alias("n_events"))
        )

    def windowed_distinct(s, d):
        return (
            _events_stream(s, d)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(
                F.approx_count_distinct("user_id").alias("approx_users"),
                F.count("*").alias("n_events"),
            )
        )

    def stream_stream_join(s, d):
        clicks = (
            _events_stream(s, d)
            .filter(F.col("event_type") == "click")
            .select(
                "user_id",
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "1 hour")
        )
        purchases = (
            _events_stream(s, d)
            .filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("p_ts"),
            )
            .withWatermark("p_ts", "1 hour")
        )
        return clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_ts") >= F.col("click_ts"))
            & (F.col("p_ts") <= F.col("click_ts") + F.expr("INTERVAL 2 HOURS")),
        ).select("user_id", "click_id", "purchase_id")

    return {
        "sessionize": sessionize,
        "windowed_distinct": windowed_distinct,
        "stream_stream_join": stream_stream_join,
    }


def run_probe(spark, name: str, build, data_dir: str) -> dict:
    import tempfile
    import uuid

    sub = spark.newSession()
    sub.conf.set("spark.sql.shuffle.partitions", "8")
    # keep every batch's progress (default retains last 100)
    sub.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")
    ckpt = tempfile.mkdtemp(prefix=f"state_probe_{name}_")
    t0 = time.time()
    q = (
        build(sub, data_dir)
        .writeStream.format("noop")
        .queryName("p" + uuid.uuid4().hex[:8])
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.time() - t0, 1)
    batches = []
    for p in q.recentProgress:
        if not p.get("stateOperators"):
            continue
        so = p["stateOperators"][0]
        batches.append(
            {
                "batch": p["batchId"],
                "input": p["numInputRows"],
                "rows_total": so["numRowsTotal"],
                "rows_removed": so["numRowsRemoved"],
                "mem_mb": round(so["memoryUsedBytes"] / 1e6, 2),
                "rocksdb": any(
                    k.startswith("rocksdb")
                    for k in so.get("customMetrics", {})
                ),
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    totals = {
        "query": name,
        "wall_s": wall,
        "n_batches": len(batches),
        "input_rows": sum(b["input"] for b in batches),
        "state_rows_max": max((b["rows_total"] for b in batches), default=0),
        "state_rows_final": batches[-1]["rows_total"] if batches else 0,
        "rows_removed_total": sum(b["rows_removed"] for b in batches),
        "mem_mb_max": max((b["mem_mb"] for b in batches), default=0.0),
        "rocksdb": all(b["rocksdb"] for b in batches) and bool(batches),
    }
    return {"totals": totals, "batches": batches}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep-dir", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from big_data_project_implementation_spark import get_session

    spark = get_session("stream-state-probe")
    data_dir = f"/tmp/stream_state_probe_{args.factor}x"
    print(f"building {args.factor} replicas under {data_dir} ...")
    build_stream_dir(spark, args.src, data_dir, args.factor)

    builders = _builders()
    names = args.names or list(builders)
    for name in names:
        res = run_probe(spark, name, builders[name], data_dir)
        print(json.dumps(res["totals"]))
        # per-batch trace for the first/median/last batches (the shape
        # a SCALING.md reader needs: plateau, not growth)
        b = res["batches"]
        for probe_point in {0, len(b) // 2, len(b) - 1} if b else set():
            print("  batch", json.dumps(b[probe_point]))
    if not args.keep_dir:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
