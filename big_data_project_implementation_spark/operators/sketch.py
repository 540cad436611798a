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
    # independent-ish hash rows via per-row seed strings. md5-derived
    # (first 15 hex chars → 60-bit int), NOT xxhash64: md5 exists in
    # every engine, so the whole sketch — build, estimate, one-sided
    # error — is reproducible by the DuckDB oracle (round 6; the
    # hashed_linear_quality_score precedent). ~2x slower per hash than
    # xxhash64, irrelevant next to the gram explode feeding it.
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(f"cm{d}:"), col)), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(width),
    )


def _cm_coords(df: DataFrame, item_col: str, width: int, depth: int):
    """(item, d, bucket) sketch coordinates for every (row, hash-row)
    pair, exploded from one array projection so the source is scanned
    exactly once regardless of ``depth``."""
    col = F.col(item_col).cast("string")
    return df.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _bucket(col, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("_c"),
    ).select("item", F.col("_c.d").alias("d"), F.col("_c.bucket").alias("bucket"))


def count_min_build(
    df: DataFrame, item_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a count-min sketch of ``item_col`` occurrences: one row
    per (hash-row, bucket) cell with its collision-summed count.

    Scale shape: the only shuffle is a map-side-combined groupBy onto
    at most ``depth × width`` keys — executor state is bounded by the
    sketch size, not by distinct-item cardinality, which is the entire
    point at 100 TB. Merging sketches of two corpora = unionByName +
    the same groupBy (counts are additive).

    One scan: the ``depth`` (d, bucket) coordinates explode from a
    single array projection (the ``_bloom_coords`` shape below) — a
    union of per-hash projections over the same source re-reads (and
    for exploded gram streams, re-EXPLODES) the input once per hash
    row, i.e. ``depth×`` the corpus work."""
    return (
        _cm_coords(df, item_col, width, depth)
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("bigint").alias("cnt"))
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
    hashed there), restored via coalesce after a left join. Like the
    build, coordinates explode from one array projection — single scan
    of ``items``."""
    coords = _cm_coords(items, item_col, width, depth)
    return (
        coords.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )


def bitmap_distinct_rollup(
    df: DataFrame, key_cols: list[str], part_col: str, id_col: str
) -> DataFrame:
    """EXACT distinct-``id_col`` per key, computed as a two-level
    roaring-style bitmap rollup: per-(key, ``part_col``) partial
    bitmaps first, then a bitwise-OR merge across partitions.

    This is THE reaggregation pattern for 100 TB distinct counts: the
    raw event stream is touched once to build small per-day (or
    per-file, per-hour) bitmap partials; every later rollup — weekly,
    monthly, all-time — merges 4 KB bitmap cells instead of
    re-shuffling user ids. Unlike HLL the answer stays exact, which is
    why Spark grew ``bitmap_construct_agg``/``bitmap_or_agg`` for its
    materialized-view stack. Shuffle volume: level 1 moves one
    (key, part, bucket) row per 32768-id range actually present;
    level 2 moves the merged cells only. Ids must be non-negative
    integers (ours are synthetic bigints ≥ 0)."""
    lvl1 = df.groupBy(
        *key_cols,
        F.col(part_col).alias("_part"),
        F.bitmap_bucket_number(F.col(id_col)).alias("_bkt"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col(id_col))).alias("_bm"))
    merged = lvl1.groupBy(*key_cols, "_bkt").agg(
        F.bitmap_or_agg("_bm").alias("_bm")
    )
    return merged.groupBy(*key_cols).agg(
        F.sum(F.bitmap_count("_bm")).cast("bigint").alias("distinct_ids")
    )


def hll_distinct_rollup(
    df: DataFrame, key_cols: list[str], part_col: str, id_col: str
) -> DataFrame:
    """Approximate twin of ``bitmap_distinct_rollup``: per-partition
    Datasketches HLL partials (``hll_sketch_agg``) merged with
    ``hll_union_agg``. Fixed ~KB state per (key, part) regardless of
    cardinality — the cheaper trade when ids are high-cardinality or
    adversarially sparse (a bitmap bucket per 32k-id range degrades to
    one cell per id; HLL never does). Estimate error ~1.6% at the
    default lgConfigK=12, pinned in pytest against the exact count."""
    lvl1 = df.groupBy(*key_cols, F.col(part_col).alias("_part")).agg(
        F.hll_sketch_agg(F.col(id_col)).alias("_sk")
    )
    return lvl1.groupBy(*key_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk"))
        .cast("bigint")
        .alias("approx_distinct_ids")
    )


def _bloom_pos(col, i: int, n_bits: int):
    # md5-derived bit position — same engine-portable idiom as _bucket,
    # so the filter an external SQL oracle rebuilds is bit-identical
    # (including which false positives it produces).
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), col)), 1, 15), 16, 10)
        .cast("bigint"),
        F.lit(n_bits),
    )


#: Bits packed per bigint word. 62, not 64: shifting into bit 63 is a
#: sign-bit wrap in the JVM but an overflow ERROR in some SQL engines
#: (DuckDB raises on ``1::BIGINT << 63``), and the oracle must rebuild
#: the identical words — so no mask ever touches the top two bits.
_BITS_PER_WORD = 62


def _bloom_coords(
    df: DataFrame, item_col: str, n_bits: int, n_hashes: int, keep: list[str] = []
):
    """(*keep, item, word, mask) bit coordinates for every (row, hash)
    pair: word = pos // 62, mask = 1 << (pos % 62), packed into bigint
    words so the whole filter is ``ceil(n_bits / 62)`` rows.

    One scan: the ``n_hashes`` positions explode from a single array
    projection rather than a union of per-hash branches — a union of
    projections over the same source re-reads (and for exploded gram
    streams, re-EXPLODES) the input once per hash."""
    col = F.col(item_col).cast("string")
    return df.select(
        *keep,
        F.col(item_col).alias("item"),
        F.explode(
            F.array(*[_bloom_pos(col, i, n_bits) for i in range(n_hashes)])
        ).alias("pos"),
    ).select(
        *keep,
        "item",
        F.floor(F.col("pos") / _BITS_PER_WORD).cast("bigint").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BITS_PER_WORD} AS INT))"
        ).alias("mask"),
    )


def bloom_build(
    df: DataFrame, item_col: str, n_bits: int = 8192, n_hashes: int = 3
) -> DataFrame:
    """Build a Bloom filter of ``item_col`` membership as a relation of
    (word, bits) bigint rows — ``ceil(n_bits / 62)`` rows total, i.e.
    a fixed ~``n_bits / 8``-byte object regardless of item cardinality.

    Why this exists next to the exact semi-join (text.decontaminate):
    at 100 TB the eval-gram table itself can outgrow comfortable
    broadcast range, while the equivalent 1%-FP Bloom filter for 10M
    grams is ~12 MB — always broadcastable, and probe-side the corpus
    grams never shuffle at all. One-sided error: false positives only
    (over-flagging is the safe direction for decontamination), never
    false negatives; and with the md5-derived family the false
    positives are deterministic, so an external engine reproduces the
    flag set exactly.

    Scale shape: coordinates are map-local projections; the only
    shuffle is a map-side-combined bit_or groupBy onto ≤ ceil(n_bits/62)
    keys — aggregation state is the filter size, not the item count
    (the count_min_build contract, bitwise)."""
    return (
        _bloom_coords(df, item_col, n_bits, n_hashes)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Membership test for every DISTINCT item (``items`` is deduped
    here): (item, bloom_member). member = every hash position's bit set
    (bool_and); an absent word row means those 62 packed bits are all
    zero (left join + coalesce; words carry ``_BITS_PER_WORD`` = 62
    bits each, never 64 — see the packing note above).

    The filter side is broadcast by construction (≤ ceil(n_bits/62) rows);
    the probe is embarrassingly parallel over the items scan and the
    only shuffle is the per-item bool_and groupBy — at 100 TB join
    callers should probe DISTINCT grams (this function dedups) and
    semi-join the members back against their corpus."""
    coords = _bloom_coords(items.select(item_col).distinct(), item_col, n_bits, n_hashes)
    return (
        coords.join(F.broadcast(sketch), "word", "left")
        .withColumn(
            "_hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")))
            == F.col("mask"),
        )
        .groupBy("item")
        .agg(F.bool_and("_hit").alias("bloom_member"))
    )


def bloom_probe_count(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    group_col: str,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Grouped membership counting in ONE pass over the item stream:
    (group, n_items, n_member) — for each ``group_col`` key, how many
    of its DISTINCT items exist in the filter (items are deduplicated
    within each group by the per-(group, item) bool_and stage, so
    repeated items count once in both n_items and n_member). The
    decontamination shape
    (group = document, items = its grams) without materializing the
    distinct-item membership table and re-joining it against the
    stream: coordinates explode once, meet the broadcast filter, and
    two map-side-combined groupBys do the rest. Probe cost is
    n_hashes coordinate rows per item, streamed — never a second scan
    of the item source."""
    coords = _bloom_coords(items, item_col, n_bits, n_hashes, keep=[group_col])
    return (
        coords.join(F.broadcast(sketch), "word", "left")
        .withColumn(
            "_hit",
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")))
            == F.col("mask"),
        )
        .groupBy(group_col, "item")
        .agg(F.bool_and("_hit").alias("_member"))
        .groupBy(group_col)
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.col("_member").cast("int")).cast("bigint").alias("n_member"),
        )
    )
