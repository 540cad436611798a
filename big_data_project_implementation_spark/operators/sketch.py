"""Probabilistic sketch operators: bounded-memory frequency estimation.

A 100 TB heavy-hitter pass cannot always afford the exact gram rollup
(`text.ngram_heavy_hitters` shuffles distinct-gram cardinality); a
count-min sketch caps the aggregation state at ``depth × width``
counters regardless of corpus size, at the cost of one-sided
overestimation (Cormode & Muthukrishnan 2005). Everything here is pure
DataFrame ops — the sketch IS a tiny (d, bucket, cnt) table, so it
broadcasts, persists, and merges (sum by cell) like any other relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, d: int, width: int):
    # independent-ish hash rows via per-row seed strings; pmod keeps
    # the bucket non-negative (xxhash64 is signed)
    return F.pmod(F.xxhash64(F.concat(F.lit(f"cm{d}:"), col)), F.lit(width))


def count_min_build(
    df: DataFrame, item_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a count-min sketch of ``item_col`` occurrences: one row
    per (hash-row, bucket) cell with its collision-summed count.

    Scale shape: the only shuffle is a map-side-combined groupBy onto
    at most ``depth × width`` keys — executor state is bounded by the
    sketch size, not by distinct-item cardinality, which is the entire
    point at 100 TB. Merging sketches of two corpora = unionByName +
    the same groupBy (counts are additive)."""
    cells = None
    col = F.col(item_col).cast("string")
    for d in range(depth):
        o = df.select(
            F.lit(d).alias("d"), _bucket(col, d, width).alias("bucket")
        )
        cells = o if cells is None else cells.unionByName(o)
    return cells.groupBy("d", "bucket").agg(
        F.count("*").cast("bigint").alias("cnt")
    )


def count_min_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimate the frequency of every row of ``items`` from a built
    sketch: min over the ``depth`` hash rows of the bucket counts.
    Guarantees est ≥ true count (never under), overestimates by the
    collision mass of each bucket.

    Scale shape: items hash to their (d, bucket) coordinates and join
    the sketch — ``depth × width`` rows, always broadcastable — then
    one groupBy(item).min. Absent cells mean count 0 (no occurrence
    hashed there), restored via coalesce after a left join."""
    col = F.col(item_col).cast("string")
    coords = None
    for d in range(depth):
        o = items.select(
            F.col(item_col).alias("item"),
            F.lit(d).alias("d"),
            _bucket(col, d, width).alias("bucket"),
        )
        coords = o if coords is None else coords.unionByName(o)
    return (
        coords.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )
