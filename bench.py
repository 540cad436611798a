"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
a JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} — followed, when that line outgrows
the driver's ~2000-byte stdout tail window, by a compact same-schema
line (slowest queries only, "trimmed": true) so the last JSON line on
stdout always parses and always carries the headline total.

Each query is executed to completion (count() action — full pipeline,
no driver materialization of payload rows). A warmup run of the first
query absorbs JVM/codegen startup so per-query numbers reflect steady
state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: the queries a 100 TB deployment actually runs hot
BENCH_QUERIES = [
    "q1_pricing_summary",
    # round 8: the full 22-query TPC-H sweep (VERDICT r7 #5 — q2/q11/
    # q15/q20/q22 were gate-green but unbenched; their scalar-subquery
    # broadcasts are exactly the shapes worth pinning)
    "q2_min_price_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_value",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_join",
    "q20_potential_promotion",
    "q21_waiting_orders",
    "q22_global_sales",
    "join_inner_shuffle",
    "agg_function_library",
    "window_running_agg",
    "text_stats",
    "dedup_exact_prefix",
    "dedup_spans",
    "dedup_word_jaccard",
    "dedup_clusters",
    "dedup_minhash_lsh",
    "similarity_bruteforce_topk",
    "similarity_lsh_topk",
    "events_funnel",
    "events_rolling_active",
    "text_tfidf_topk",
    "dedup_mass",
    "text_bm25_search",
    "pipeline_curate_end_to_end",
    "text_repetition_signals",
    "text_ngram_novelty",
    "embedding_semdedup",
    "text_classifier_score",
    "join_band_self",
    "pipeline_curate_v2",
    "sketch_bitmap_distinct",
    "text_vocab_coverage",
    "data_temperature_mixture",
    "relational_zip_with_index",
    "data_dsir_weights",
    "sql_recursive_cte",
    "text_bpe_merges",
    "text_bigram_logprob",
    "graph_label_propagation",
    "events_anomaly_mad",
    "audit_table_fingerprint",
    "window_time_range_frame",
    "pipeline_curate_v3",
    "dedup_containment",
    "events_attribution",
    "embedding_covariance",
    "sample_weighted_es",
    # round-5 session additions (the heavy ones — sub-second ops like
    # table_diff/epoch_shuffle/source_quota are gate-covered but add
    # only fixed-overhead noise to a wall-time bench)
    "text_passage_dedup",
    "text_pmi_topk",
    "events_attribution_multitouch",
    "text_bpe_encode",
    "text_train_classifier",
    "similarity_ivfpq_topk",
    # serve-only ANN: the index builds lazily on the first pass, so the
    # two-pass min reports the persisted-index serving cost (the number
    # a deployment cares about — VERDICT r5 #5)
    "similarity_ivfpq_serve",
    # streaming ingest path (micro-batch wall time incl. stream setup;
    # the query fns run their stream to completion eagerly, so the
    # regular timing loop captures them — VERDICT r4 #9)
    "stream_sessionize",
    "stream_stream_left_join",
    # round 6: the remaining stateful-stream family (VERDICT r5 #7)
    "stream_stream_full_join",
    "stream_windowed_distinct",
    # round 6: Bloom decontamination (3 md5s per corpus gram — the
    # heavy certified-sketch path) and the stream-static ingest dedup
    "text_bloom_decontaminate",
    "stream_dedup_vs_corpus",
    # round 7: the stateless streaming NEAR-dup ingest gate (minhash
    # signature as one projection + stream-static banding joins)
    "stream_neardup_vs_corpus",
    # round 8: the per-doc VERDICT shape of the same gate — output
    # bounded by arriving volume, the 100 TB ingest contract
    # (VERDICT r7 #1)
    "stream_neardup_verdict",
    # round 8: online ANN serving — per-micro-batch IVF-PQ answers
    # from the persisted index (the similarity-service deployment
    # shape; index build amortized by the per-user cache, so the
    # min-of-2 reports steady-state serving)
    "stream_ann_serve",
    # round 8: index MAINTENANCE — frozen-model encode of arriving
    # vectors appended as segments (the other half of the service)
    "stream_ann_index_update",
    # round 8: cluster-balanced curation sampling (IVF cells +
    # temperature quotas) and the materialized-view refresh pattern
    "embedding_cluster_mixture",
    "incremental_agg_refresh",
    # round 9: the JOIN half of the IVM story — delta refresh of a
    # materialized join with broadcast deltas (neither base shuffles)
    "incremental_join_refresh",
    # round 10: the outer-join completion of the IVM algebra — the
    # null-extension flip maintained in both delta directions
    "incremental_left_join_refresh",
    # round 10: rowid-keyed deletion — two anti-joins, no view-sized
    # exceptAll shuffle (the keyless form's honest cost, avoided)
    "incremental_join_retract_keyed",
    # round 10: the FULL OUTER completion — null flips maintained on
    # BOTH sides (arriving facts before their dimension member, and
    # the member landing later)
    "incremental_full_join_refresh",
    # round 10: per-group top-k maintenance — anti/semi pass-through
    # for untouched groups, delta-sized re-rank for touched ones
    "topk_view_refresh",
    # round 11: the unified MaterializedView API driven through a full
    # compute -> refresh -> retract life cycle (dispatch layer must add
    # zero plan cost over the free-function algebra it routes to)
    "view_api_lifecycle",
]

# localCheckpoint-heavy iterative rows: same-box wall times on these
# swung ±30% across three harnesses in round 7 WITH provably identical
# plans (fingerprints green) — JVM/GC noise, not regression. They get
# a third in-session pass so the reported min is a steadier floor
# (VERDICT r7 #4).
ITERATIVE_ROWS = [
    "dedup_clusters",
    "graph_label_propagation",
    "similarity_ivfpq_topk",
    "text_bpe_merges",
    "text_bpe_encode",
    "dedup_word_jaccard",
    # round 8: widest clean-session envelope of r8 ([5.2, 12.5] across
    # 4 sessions with identical plans) — the per-step localCheckpoints
    # make it the same GC-noise class as the rows above
    "text_train_classifier",
]


# Fixed membership order for the compact (trimmed) stdout line: the
# committed clean-bench ordering (BENCH_clean_r13_opt.json, slowest
# first, top 48 — more than the ~41 that ever fit the byte budget).
# Pinned so the trimmed set is identical from run to run; see the
# comment at the print site.
TRIMMED_PRIORITY = [
    "similarity_ivfpq_topk",
    "dedup_clusters",
    "graph_label_propagation",
    "embedding_semdedup",
    "dedup_minhash_lsh",
    "stream_stream_full_join",
    "stream_stream_left_join",
    "dedup_word_jaccard",
    "text_train_classifier",
    "embedding_cluster_mixture",
    "view_api_lifecycle",
    "stream_neardup_vs_corpus",
    "stream_neardup_verdict",
    "dedup_containment",
    "stream_ann_index_update",
    "pipeline_curate_end_to_end",
    "text_bpe_encode",
    "text_pmi_topk",
    "incremental_left_join_refresh",
    "pipeline_curate_v2",
    "incremental_join_refresh",
    "text_bloom_decontaminate",
    "pipeline_curate_v3",
    "text_passage_dedup",
    "stream_ann_serve",
    "sql_recursive_cte",
    "stream_sessionize",
    "dedup_mass",
    "embedding_covariance",
    "incremental_full_join_refresh",
    "text_repetition_signals",
    "dedup_spans",
    "similarity_ivfpq_serve",
    "incremental_join_retract_keyed",
    "similarity_lsh_topk",
    "text_bigram_logprob",
    "text_bpe_merges",
    "audit_table_fingerprint",
    "q21_waiting_orders",
    "data_dsir_weights",
    "stream_windowed_distinct",
    "join_band_self",
    "text_ngram_novelty",
    "join_inner_shuffle",
    "text_tfidf_topk",
    "stream_dedup_vs_corpus",
    "q18_large_volume_customer",
    "q8_market_share",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from big_data_project_implementation_spark import get_session, plans
    from big_data_project_implementation_spark.queries import REGISTRY

    spark = get_session("bench")

    if "--explain" in sys.argv:
        # plan audit instead of timing: formatted plan + shuffle count
        # per headline query (the 100 TB review loop)
        for name in BENCH_QUERIES:
            df = REGISTRY[name].fn(spark, sf_dir)
            print(f"==== {name} (shuffles={plans.count_shuffles(df)}) ====")
            print(plans.formatted_plan(df))
        return

    def run(name: str) -> None:
        # noop sink executes the full pipeline (count() would let the
        # optimizer prune projections) without driver materialization
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        # caches are per-query working state (e.g. dedup membership);
        # drop them so queries are measured independently
        spark.catalog.clearCache()
        # localCheckpoint blocks are NOT in the catalog cache and
        # otherwise accumulate for the JVM's lifetime — 70 queries in,
        # iterative rows (LPA, clusters, PQ) were paying GC debt from
        # every predecessor's checkpoints (~25% wall inflation
        # measured on graph_label_propagation: 7.9s in-bench vs 5-6s
        # solo). Queries are independent, so dropping them between
        # measurements is safe and measures the plan, not the debt.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # warmup: JVM + codegen + parquet footer caches
    run("q1_pricing_summary")
    # ...and the Arrow Python workers (one per core, lazily forked on
    # first pandas_udf use — ~10s once; steady-state is what we measure)
    from pyspark.sql.functions import pandas_udf

    _ident = pandas_udf(lambda s: s, "long")
    try:
        _parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # e.g. 'auto' on managed platforms
        _parts = spark.sparkContext.defaultParallelism
    (
        spark.range(100_000)
        .repartition(_parts)
        .select(_ident("id"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )

    # two passes, min per query: ambient load on a shared box inflates
    # single-shot wall times by 2-3x; the min is the steady-state cost
    # of the plan, which is what the engine controls
    timings: dict[str, float] = {}
    # every individual pass, in order (VERDICT r8 #3: the published
    # envelope must be computed over raw per-pass times, not
    # min-of-session minima, or normal GC/contention noise escapes it)
    passes: dict[str, list[float]] = {}

    def measure(name: str) -> None:
        t0 = time.time()
        run(name)
        dt = round(time.time() - t0, 3)
        passes.setdefault(name, []).append(dt)
        if name not in timings or dt < timings[name]:
            timings[name] = dt

    for _pass in range(2):
        for name in BENCH_QUERIES:
            measure(name)
    # third pass for the GC-noise-prone iterative rows (min-of-3)
    for name in ITERATIVE_ROWS:
        measure(name)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline query wall time at sf" + str(sf),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
    }
    passes_out = os.environ.get("SPARK_GRAFT_BENCH_PASSES_OUT")
    if passes_out:
        with open(passes_out, "w") as fh:
            json.dump({"sf": float(sf), "passes": passes}, fh)
    line = json.dumps(payload)
    print(line)
    # The driver records only the LAST ~2000 bytes of stdout; when the
    # full line outgrows that window its HEAD (metric/value + first
    # queries) is cut and the headline is lost to truncation (r6:
    # "parsed": null). Guard: follow the full line with a compact line
    # — same schema, a FIXED-priority subset of queries kept until a
    # conservative byte budget — so the final (and therefore
    # surviving) JSON line always parses and always carries the
    # headline value. Round 14 (VERDICT r13 #5): membership used to
    # follow the current run's sort order, so rows at the time
    # boundary flapped in/out between runs and the round-over-round
    # comparison reported phantom dropped/new queries
    # (data_dsir_weights / join_band_self in r13). The order is now
    # the committed clean-bench ordering (BENCH_clean_r13_opt.json,
    # slowest first) — same byte budget, same schema, but the SAME
    # rows survive trimming every run; queries added to the bench
    # later append after the pinned names by measured time.
    if len(line) > 1500:
        compact = dict(payload, queries={}, trimmed=True)
        ordered = [n for n in TRIMMED_PRIORITY if n in timings]
        ordered += sorted(
            (n for n in timings if n not in TRIMMED_PRIORITY),
            key=lambda n: -timings[n],
        )
        for name in ordered:
            compact["queries"][name] = timings[name]
            if len(json.dumps(compact)) > 1400:
                del compact["queries"][name]
                break
        print(json.dumps(compact))


if __name__ == "__main__":
    main()
