"""Skewed-key join probe (round 11, VERDICT r10 #5): the brief's
canonical scale-killer is "a full shuffle on a skewed key" — this
measures, on ONE synthetic power-law key at 100×-probe scale, four
strategies:

1. plain shuffle sort-merge join (AQE skew split OFF) — the naive
   plan: the hot key's entire row set lands in one task;
2. AQE skew-join split at DEFAULT thresholds
   (skewedPartitionThresholdInBytes=256m — the engine default in
   session.py);
3. AQE skew-join split with the threshold LOWERED to 16m — the knob
   that decides whether the splitter actually fires;
4. manual ``relational.salted_join`` — the pre-AQE folklore fix: the
   fact side spreads each row across ``salt`` sub-keys, the dim side
   replicates ×salt.

Both joins are forced down the shuffle path
(autoBroadcastJoinThreshold=-1) to model a dimension too large to
broadcast — when the dim DOES fit, broadcasting it makes skew moot and
is always the first answer (measured separately as the reference
line).

Data: facts with a Zipf-like key — HOT_SHARE of all rows on key 0, the
rest uniform over N_KEYS — joined to an N_KEYS-row dimension. Written
to parquet first so generation cost and missing stats don't pollute
the timing; min-of-2 noop-sink writes, quiet-box discipline
(tools/ivm_probe.py's).

The measured decision rule (the RECORDED run is SCALING.md round-11
and ``salted_join``'s docstring — this header mirrors it): broadcast
when the dim fits (0.38s, 14.5× over the plain shuffle); else AQE's
splitter handles it ONLY once the hot partition crosses
skewedPartitionThresholdInBytes — the ~240 MB hot partition sat under
the 256 MB default and AQE silently did nothing (5.06s ≈ plain SMJ's
5.52s), while the threshold lowered to 16m split it to 1.75s, beating
the manual salt's 2.35s. At true 100 TB a hot key dwarfs 256 MB and
the default fires; in the mid-scale gap, lower the threshold or salt.

Usage: python tools/skew_probe.py [--rows 30000000] [--keys 100000]
       [--hot-share 0.5] [--salt 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(df) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=30_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--hot-share", type=float, default=0.5)
    ap.add_argument("--salt", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from big_data_project_implementation_spark import get_session
    from big_data_project_implementation_spark.operators import relational

    spark = get_session("skew-probe")
    work = tempfile.mkdtemp(prefix="skew_probe_")
    try:
        # hot rows = the requested PER-MILLE share exactly (the old
        # round(1/share) modulus silently clamped any --hot-share
        # above 0.5 down to 0.5); cold rows map consecutive ids over
        # the full key range
        hot_permille = max(1, min(999, int(args.hot_share * 1000)))
        # cold keys spread by a hash so they cover the FULL key range
        # regardless of how keys relates to the per-mille modulus
        facts = spark.range(args.rows).select(
            F.when(F.pmod("id", F.lit(1000)) < hot_permille, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(args.keys)))
            .cast("bigint")
            .alias("k"),
            (F.col("id") % 997).cast("bigint").alias("v"),
        )
        dim = spark.range(args.keys).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("attr"),
        )
        facts.write.mode("overwrite").parquet(f"{work}/facts")
        dim.write.mode("overwrite").parquet(f"{work}/dim")
        facts = spark.read.parquet(f"{work}/facts")
        dim = spark.read.parquet(f"{work}/dim")

        skew = relational.key_skew_stats(facts, "k").collect()[0].asDict()

        agg = lambda j: j.groupBy().agg(  # noqa: E731 — tiny sink reducer
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )

        def with_confs(confs: dict, df_fn):
            saved = {k: spark.conf.get(k, None) for k in confs}
            try:
                for k, v in confs.items():
                    spark.conf.set(k, v)
                return timed(df_fn())
            finally:
                for k, v in saved.items():
                    if v is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, v)

        no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
        t_plain = with_confs(
            {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
            lambda: agg(facts.join(dim, ["k"])),
        )
        t_aqe = with_confs(
            {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "true"},
            lambda: agg(facts.join(dim, ["k"])),
        )
        t_aqe_tuned = with_confs(
            {
                **no_bcast,
                "spark.sql.adaptive.skewJoin.enabled": "true",
                "spark.sql.adaptive.skewJoin."
                "skewedPartitionThresholdInBytes": "16m",
                "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            },
            lambda: agg(facts.join(dim, ["k"])),
        )
        t_salt = with_confs(
            {**no_bcast, "spark.sql.adaptive.skewJoin.enabled": "false"},
            lambda: agg(
                relational.salted_join(facts, dim, ["k"], salt=args.salt)
            ),
        )
        # the reference line: when the dim is broadcastable, skew is moot
        t_bcast = timed(agg(facts.join(F.broadcast(dim), ["k"])))

        print(
            json.dumps(
                {
                    "rows": args.rows,
                    "keys": args.keys,
                    "skew": skew,
                    "plain_smj_s": t_plain,
                    "aqe_default_threshold_s": t_aqe,
                    "aqe_16m_threshold_s": t_aqe_tuned,
                    "salted_join_s": t_salt,
                    "broadcast_dim_s": t_bcast,
                    "plain_over_aqe_default": round(t_plain / t_aqe, 2),
                    "plain_over_aqe_16m": round(t_plain / t_aqe_tuned, 2),
                    "plain_over_salt": round(t_plain / t_salt, 2),
                },
                indent=2,
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
