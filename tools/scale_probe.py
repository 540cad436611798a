"""Scale-up probe: does the plan hold when the data grows NX?

Synthesizes an NX replica of the fact tables (lineitem/orders/events —
keys shifted per replica so join fan-outs and group cardinalities scale
realistically; dims stay fixed like real star schemas) under /tmp, then
times a probe set at sf0.1 and at the scaled copy and prints the
wall-time ratio per query. A scalable plan shows ~linear growth
(ratio ≈ N on a fixed-core box); a quadratic candidate join or a
driver-side bottleneck shows super-linear blowup.

Usage: python tools/scale_probe.py [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q13_customer_distribution",
    "join_inner_shuffle",
    "window_running_agg",
    "agg_function_library",
    "topk_order_limit",
]

# training-data pipeline probe (--pipeline): documents text is perturbed
# per replica (~10 replica-specific tokens vs ~23 originals pushes
# cross-replica Jaccard to ~0.53, under the dedup thresholds) so the
# TRUE near-dup structure scales linearly with the corpus — otherwise
# every replica is an exact dup and the output itself grows N², which
# measures output size, not operator scalability.
# dedup_word_jaccard is deliberately absent: exact all-pairs Jaccard is
# the small-scale ORACLE for the approximate methods; on a corpus built
# to resist pruning it is Θ(distinct_sets²) by nature. At corpus scale
# the answer is minhash_lsh (probed here), not a faster exact loop.
PIPELINE_QUERIES = [
    "dedup_exact_prefix",
    "dedup_minhash_lsh",
    "dedup_clusters_lsh",
    "dedup_spans",
    "text_stats",
    "text_language_id",
    "text_tfidf_topk",
    "text_bm25_search",
    "similarity_bruteforce_topk",
    "events_funnel",
    "events_retention",
    "events_rolling_active",
    "data_dsir_weights",
]

SCALED = ("lineitem", "orders", "events", "customer", "documents", "embeddings")
KEYED = {
    # columns to shift by replica so keys stay consistent ACROSS tables
    # (join graph preserved: every replica is a self-contained shard)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
KEY_STRIDE = 10_000_000


def build_scaled(
    spark, src: str, dst: str, factor: int, only: list[str] | None = None
) -> None:
    from pyspark.sql import functions as F

    from big_data_project_implementation_spark.sources.catalog import TABLES

    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        if only and name not in only and name in SCALED:
            # targeted probes (e.g. a documents-only operator at 100x)
            # symlink the un-scaled table instead of replicating a
            # fact table the probe queries never read
            out = f"{dst}/{name}.parquet"
            if not os.path.exists(out):
                os.symlink(f"{src}/{name}.parquet", out)
            continue
        out = f"{dst}/{name}.parquet"
        if os.path.exists(out):
            continue
        if name == "events":
            # keep raw nanos ts (load_table does the conversion)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{src}/{name}.parquet")
        if name in SCALED:
            rep = df.withColumn(
                "_r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
            )
            for key in KEYED[name]:
                rep = rep.withColumn(key, F.col(key) + F.col("_r") * F.lit(KEY_STRIDE))
            if name == "documents":
                salt_toks = F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(9)),
                        lambda j: F.concat(
                            F.lit("z"), F.col("_r").cast("string"), F.lit("w"), j.cast("string")
                        ),
                    ),
                )
                rep = rep.withColumn("text", F.concat("text", F.lit(" "), salt_toks))
            df = rep.drop("_r")
        df.write.mode("overwrite").parquet(out)


def time_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    from big_data_project_implementation_spark.queries import REGISTRY

    out: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--pipeline", action="store_true", help="probe dedup/text/similarity instead"
    )
    ap.add_argument(
        "--tables",
        nargs="*",
        help="only replicate these tables at --factor; other SCALED "
        "tables are symlinked un-scaled (targeted heavy-op probes)",
    )
    ap.add_argument(
        "--queries",
        nargs="*",
        help="explicit probe list (overrides --pipeline), e.g. the "
        "worst-case 100x dedup_spans + dedup_mass pressure test",
    )
    args = ap.parse_args()

    from big_data_project_implementation_spark import get_session

    spark = get_session("scale-probe")
    dst = f"/tmp/scaleprobe_x{args.factor}"
    t0 = time.time()
    build_scaled(spark, args.src, dst, args.factor, only=args.tables)
    print(f"built {args.factor}x copy in {round(time.time() - t0, 1)}s", flush=True)

    names = args.queries or (PIPELINE_QUERIES if args.pipeline else PROBE_QUERIES)
    base = time_queries(spark, args.src, names)  # warm + baseline
    scaled = time_queries(spark, dst, names)
    report = {
        q: {
            "base_s": base[q],
            "scaled_s": scaled[q],
            "ratio": round(scaled[q] / base[q], 2) if base[q] else None,
        }
        for q in names
    }
    print(json.dumps({"factor": args.factor, "queries": report}, indent=2))
    if not args.keep:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
