"""Graph-family 100x probe (round 9, VERDICT r8 #2): do bfs_levels,
personalized_pagerank, and link_prediction_jaccard hold when the
near-dup graph grows NX?

Fixture: the sf0.01 exact word-jaccard near-dup graph (the same edge
rule as the certified gate rows: k=1, threshold 0.8) replicated N
times with a node-id stride — N disjoint, isomorphic shards, so the
TRUE per-round frontier sizes, walk mass, and wedge work scale exactly
N and the wall ratio measures the engine, not a changing answer
(the perturbed-documents discipline of scale_probe.py, applied at the
edge-list level because these operators are public API over ANY edge
list, not just the one ngram_jaccard_pairs builds).

Reported per operator, beyond wall ratios:
- BFS: the per-round frontier sizes (the dist histogram IS the
  frontier ledger — free from the output).
- PPR: total walk mass at both scales (conservation: sum(rank) stays
  ~1.0 whatever the graph size — floor-shaving only).
- Link prediction: wedge work Sum C(min(deg, cap), 2), candidate
  count, and the Observation's capped/total postings.

Hub stress (--hub-degree, default 100_000): unions ONE synthetic hub
star onto the scaled graph — the viral-boilerplate shape VERDICT r8
What's-wrong #1 names (a 1e5-degree middle node costs C(1e5, 2)
~= 5e9 wedge rows uncapped). With the round-9 default cap the run
must complete in ~the hub-free wall, with the avoided wedges reported
arithmetically and the cap visible in the Observation.

Usage: python tools/graph_scale_probe.py [--factor 100]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 10_000_000  # divisible by 10: the %10 seed rule survives


def build_edges(spark, src: str, path: str):
    from big_data_project_implementation_spark.operators import dedup

    d = spark.read.parquet(f"{src}/documents.parquet")
    pairs = dedup.ngram_jaccard_pairs(
        d, text_col="text", id_col="doc_id", k=1, threshold=0.8
    ).select("id_a", "id_b")
    pairs.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def replicate(spark, base, factor: int, path: str):
    from pyspark.sql import functions as F

    rep = base.withColumn(
        "_r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )
    rep = (
        rep.withColumn("id_a", F.col("id_a") + F.col("_r") * F.lit(KEY_STRIDE))
        .withColumn("id_b", F.col("id_b") + F.col("_r") * F.lit(KEY_STRIDE))
        .drop("_r")
    )
    rep.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def seeds_of(edges):
    from pyspark.sql import functions as F

    nodes = (
        edges.select(F.col("id_a").alias("id"))
        .unionByName(edges.select(F.col("id_b").alias("id")))
        .distinct()
    )
    return nodes.filter(F.col("id") % 10 == 0)


def graph_stats(edges) -> dict:
    from pyspark.sql import functions as F

    sym = edges.select(F.col("id_a").alias("u")).unionByName(
        edges.select(F.col("id_b").alias("u"))
    )
    row = (
        sym.groupBy("u")
        .count()
        .agg(
            F.count("*").alias("nodes"),
            F.max("count").alias("max_deg"),
            F.sum(F.col("count") * F.col("count")).alias("sum_deg2"),
        )
        .first()
    )
    return {
        "edges": edges.count(),
        "nodes": row["nodes"],
        "max_deg": row["max_deg"],
        "sum_deg2": row["sum_deg2"],
    }


def probe_bfs(edges) -> dict:
    from pyspark.sql import functions as F

    from big_data_project_implementation_spark.operators import graph

    t0 = time.time()
    out = graph.bfs_levels(edges, seeds_of(edges))
    hist = {
        int(r["dist"]): r["n"]
        for r in out.groupBy("dist")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return {
        "wall_s": round(time.time() - t0, 1),
        "reached": sum(hist.values()),
        "frontier_per_round": [hist[k] for k in sorted(hist)],
    }


def probe_ppr(edges) -> dict:
    from pyspark.sql import functions as F

    from big_data_project_implementation_spark.operators import graph

    t0 = time.time()
    out = graph.personalized_pagerank(edges, seeds_of(edges))
    row = out.agg(
        F.count("*").alias("n"), F.sum("rank").alias("mass")
    ).first()
    return {
        "wall_s": round(time.time() - t0, 1),
        "ranked": row["n"],
        "total_mass": round(float(row["mass"]), 9),
    }


def probe_linkpred(edges, max_degree: int) -> dict:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from big_data_project_implementation_spark.operators import graph

    sym = edges.select(F.col("id_a").alias("u")).unionByName(
        edges.select(F.col("id_b").alias("u"))
    )
    wedge_work = (
        sym.groupBy("u")
        .count()
        .select(
            F.sum(
                F.when(F.col("count") <= max_degree,
                       F.col("count") * (F.col("count") - 1) / 2)
                .otherwise(0)
            ).alias("w"),
            F.sum(
                F.when(F.col("count") > max_degree,
                       F.col("count") * (F.col("count") - 1) / 2)
                .otherwise(0)
            ).alias("avoided"),
        )
        .first()
    )
    obs = Observation()
    t0 = time.time()
    n = graph.link_prediction_jaccard(
        edges, max_degree=max_degree, hub_observation=obs
    ).count()
    wall = round(time.time() - t0, 1)
    got = obs.get if n else {"capped_postings": None, "total_postings": None}
    return {
        "wall_s": wall,
        "candidates": n,
        "wedges_enumerated": int(wedge_work["w"]),
        "wedges_avoided_by_cap": int(wedge_work["avoided"]),
        "capped_postings": got["capped_postings"],
        "total_postings": got["total_postings"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.01")
    ap.add_argument("--hub-degree", type=int, default=100_000)
    ap.add_argument("--max-degree", type=int, default=4096)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--skip-hub", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from big_data_project_implementation_spark import get_session
    from big_data_project_implementation_spark.operators import graph

    spark = get_session("graph-scale-probe")
    work = f"/tmp/graphprobe_x{args.factor}"
    os.makedirs(work, exist_ok=True)

    t0 = time.time()
    base = build_edges(spark, args.src, f"{work}/base.parquet")
    scaled = replicate(spark, base, args.factor, f"{work}/scaled.parquet")
    print(f"built edges in {round(time.time() - t0, 1)}s", flush=True)

    report: dict = {"factor": args.factor, "src": args.src}
    report["base_graph"] = graph_stats(base)
    report["scaled_graph"] = graph_stats(scaled)
    print(json.dumps({"graphs": report}, default=str), flush=True)

    for name, fn in (
        ("bfs_levels", probe_bfs),
        ("personalized_pagerank", probe_ppr),
    ):
        b, s = fn(base), fn(scaled)
        report[name] = {
            "base": b,
            "scaled": s,
            "wall_ratio": round(s["wall_s"] / b["wall_s"], 2)
            if b["wall_s"]
            else None,
        }
        print(json.dumps({name: report[name]}), flush=True)

    b = probe_linkpred(base, args.max_degree)
    s = probe_linkpred(scaled, args.max_degree)
    report["link_prediction"] = {
        "base": b,
        "scaled": s,
        "wall_ratio": round(s["wall_s"] / b["wall_s"], 2) if b["wall_s"] else None,
    }
    print(json.dumps({"link_prediction": report["link_prediction"]}), flush=True)

    if not args.skip_hub:
        # ONE viral hub star unioned onto the scaled graph: the
        # unguarded shape costs C(hub_degree, 2) wedge rows through
        # the hub middle; the cap must keep the wall ~the hub-free
        # run. Spokes are FRESH node ids so the hub's degree (and the
        # avoided-wedge arithmetic) is exact regardless of graph size.
        hub_id = (args.factor + 1) * KEY_STRIDE
        n_spokes = args.hub_degree
        spokes = spark.range(hub_id + 1, hub_id + 1 + n_spokes)
        hubbed = scaled.unionByName(
            spokes.select(
                F.lit(hub_id).cast("long").alias("id_a"),
                F.col("id").cast("long").alias("id_b"),
            )
        )
        hubbed.write.mode("overwrite").parquet(f"{work}/hubbed.parquet")
        hubbed = spark.read.parquet(f"{work}/hubbed.parquet")
        h = probe_linkpred(hubbed, args.max_degree)
        h["hub_degree"] = n_spokes
        h["hub_wedges_avoided"] = n_spokes * (n_spokes - 1) // 2
        report["link_prediction_hub_stress"] = h
        print(json.dumps({"link_prediction_hub_stress": h}), flush=True)

    print(json.dumps(report, default=str))
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
