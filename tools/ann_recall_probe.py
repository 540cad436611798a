"""ANN recall at scale (round 12, VERDICT r11 #7): the serve-path
LATENCY was probed flat at 100× (similarity_ivfpq_serve), but the
recall floors lived only at sf0.1 (tests/test_recall_sf01.py) — and a
replicated corpus CHANGES the neighbor structure, so recall must be
measured once at scale, not assumed to transfer.

Corpus: ``embeddings`` replicated ``factor``×; every replica r > 0 is
component-wise perturbed by a deterministic hash-seeded ±5% factor
(xxhash64(vec_id, dim) — reproducible, no RNG), so replicas are NEAR
duplicates, not exact ones: each query's true neighbor set mixes its
own perturbed replicas with its original sf0.1 neighbors — a real
structure instead of 100-way distance ties.

Measured: recall@k vs exact brute-force cosine over the SAME scaled
corpus, for a fixed query sample, for
- IVF with cell count scaled to the corpus (n_cells 256, nprobe 16 —
  ~6% of the corpus probed, a tighter fraction than sf0.1's 4/16),
- the full IVF-PQ + ADC + exact-rerank path at the production row's
  PQ parameters.

Usage: python tools/ann_recall_probe.py [--factor 100] [--k 5]
Record the output row in SCALING.md next to the latency row.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 10_000_000


def build_corpus(spark, src: str, dst: str, factor: int):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    rep = (
        emb.withColumn(
            "_r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
        )
        .withColumn(
            "vec_id", F.col("vec_id") + F.col("_r").cast("bigint") * F.lit(KEY_STRIDE)
        )
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: (
                    x
                    * (
                        F.lit(1.0)
                        + F.when(F.col("_r") == 0, F.lit(0.0)).otherwise(
                            (
                                F.pmod(
                                    F.xxhash64(F.col("vec_id"), i),
                                    F.lit(1000),
                                ).cast("double")
                                / 1000.0
                                - 0.5
                            )
                            * 0.1
                        )
                    )
                ).cast("float"),
            ),
        )
        .drop("_r")
    )
    rep.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst)


def topk_pairs(df) -> set[tuple[int, int]]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=100)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-queries", type=int, default=25)
    ap.add_argument("--methods", default="ivf,ivfpq")
    # "auto" = the round-13 density-adaptive default (adaptive_refine):
    # the probe's job is to certify the DEFAULTS, so it measures what a
    # caller passing nothing would get
    ap.add_argument("--refine", default="auto")
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--codes", type=int, default=16)
    args = ap.parse_args()
    methods = set(args.methods.split(","))

    from pyspark.sql import functions as F

    from big_data_project_implementation_spark import get_session
    from big_data_project_implementation_spark.operators import similarity

    spark = get_session("ann-recall-probe")
    work = "/tmp/ann_recall_work"
    os.makedirs(work, exist_ok=True)
    t0 = time.time()
    corpus = build_corpus(
        spark, args.src, f"{work}/emb.parquet", args.factor
    )
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") < args.n_queries)
    t_build = round(time.time() - t0, 1)

    t0 = time.time()
    exact = topk_pairs(
        similarity.brute_force_topk(queries, corpus, k=args.k)
    )
    t_exact = round(time.time() - t0, 1)

    n_cells, nprobe = 256, 16
    ivf, t_ivf = None, None
    if "ivf" in methods:
        t0 = time.time()
        cents = similarity.ivf_centroids(corpus, n_cells=n_cells, iters=2)
        ivf = topk_pairs(
            similarity.ivf_topk(
                queries, corpus, cents, k=args.k, nprobe=nprobe
            )
        )
        t_ivf = round(time.time() - t0, 1)

    ivfpq, t_ivfpq, refine_info = None, None, args.refine
    if "ivfpq" in methods:
        t0 = time.time()
        if args.refine == "auto":
            # resolve the adaptive default OUTSIDE ivfpq_topk so the
            # chosen value lands in the probe record; same estimator,
            # same codebooks (training is deterministic)
            books = similarity.pq_codebooks(
                corpus, m=args.m, k=args.codes
            ).localCheckpoint(eager=True)
            chosen = similarity.adaptive_refine(corpus, books, k=args.k)
            refine = chosen["refine"]
            refine_info = {
                "mode": "auto",
                **{k2: round(v, 6) if isinstance(v, float) else v
                   for k2, v in chosen.items()},
            }
        else:
            refine = int(args.refine)
        ivfpq = topk_pairs(
            similarity.ivfpq_topk(
                queries, corpus, k=args.k, nprobe=nprobe, n_cells=n_cells,
                m=args.m, n_codes=args.codes, refine=refine,
            )
        )
        t_ivfpq = round(time.time() - t0, 1)

    print(
        json.dumps(
            {
                "factor": args.factor,
                "corpus_vectors": n,
                "k": args.k,
                "n_queries": args.n_queries,
                "n_cells": n_cells,
                "nprobe": nprobe,
                "probed_fraction": round(nprobe / n_cells, 4),
                "pq_m": args.m,
                "pq_codes": args.codes,
                "refine": refine_info,
                "exact_pairs": len(exact),
                "recall_ivf": (
                    round(len(exact & ivf) / len(exact), 4)
                    if ivf is not None
                    else None
                ),
                "recall_ivfpq": (
                    round(len(exact & ivfpq) / len(exact), 4)
                    if ivfpq is not None
                    else None
                ),
                "build_s": t_build,
                "bruteforce_s": t_exact,
                "ivf_s": t_ivf,
                "ivfpq_s": t_ivfpq,
            },
            indent=2,
        )
    )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
