"""Z-order clustering layout: file-level data skipping.

The point of ``zorder_layout`` is that parquet per-file min/max stats
become tight in BOTH dimensions, so a conjunctive 2-D predicate can
prune most files — versus a single-key sort where the second dimension
spans the full range in every file. These tests measure that directly
from the parquet footers (pyarrow), engine-independently, and pin that
the layout is a pure reshuffle (row-set preserved, no rows invented).
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import relational
from big_data_project_implementation_spark.sources.catalog import load_table
from tests.conftest import SF_DIR

X, Y = "l_partkey", "l_suppkey"


def _files_intersecting(path: str, x_rng, y_rng) -> tuple[int, int]:
    """(#files whose [min,max] box intersects the predicate box, total)."""
    hit, total = 0, 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        xmn = ymn = None
        xmx = ymx = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None:
                    continue
                name = col.path_in_schema
                if name == X:
                    xmn = st.min if xmn is None else min(xmn, st.min)
                    xmx = st.max if xmx is None else max(xmx, st.max)
                elif name == Y:
                    ymn = st.min if ymn is None else min(ymn, st.min)
                    ymx = st.max if ymx is None else max(ymx, st.max)
        total += 1
        if xmn is None or ymn is None:
            hit += 1  # no stats → cannot skip
        elif xmn <= x_rng[1] and xmx >= x_rng[0] and ymn <= y_rng[1] and ymx >= y_rng[0]:
            hit += 1
    return hit, total


def test_zorder_prunes_more_files_than_single_key_sort(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(X, Y)
    n_files = 16
    linear = str(tmp_path / "linear")
    zord = str(tmp_path / "zorder")
    # single-key layout: range-partition + sort on X only
    li.repartitionByRange(n_files, X).sortWithinPartitions(X).write.parquet(linear)
    relational.zorder_layout(li, X, Y, n_files=n_files).write.parquet(zord)

    mx = li.agg(F.max(X), F.max(Y)).collect()[0]
    full_x, full_y = (0, mx[0]), (0, mx[1])
    x_sel = (1, max(1, mx[0] // 8))  # ~1/8 of the X axis
    y_sel = (1, max(1, mx[1] // 8))  # ~1/8 of the Y axis

    # predicate on Y alone: the X-sorted layout cannot skip anything
    # (every file spans the full Y range); Z-order files are tight in
    # both dimensions and must skip at least half
    lin_y, lin_total = _files_intersecting(linear, full_x, y_sel)
    z_y, z_total = _files_intersecting(zord, full_x, y_sel)
    assert lin_total == z_total == n_files
    assert lin_y == n_files
    assert z_y <= n_files // 2, z_y

    # the canonical trade: sorting is perfect on its own key and
    # useless on the other; Z-order bounds the WORST case over both
    # single-dimension predicates
    lin_x, _ = _files_intersecting(linear, x_sel, full_y)
    z_x, _ = _files_intersecting(zord, x_sel, full_y)
    assert max(z_x, z_y) < max(lin_x, lin_y), (z_x, z_y, lin_x, lin_y)


def test_zorder_layout_preserves_rows(spark, tmp_path):
    li = load_table(spark, SF_DIR, "lineitem").select(X, Y)
    out = str(tmp_path / "z")
    relational.zorder_layout(li, X, Y, n_files=8).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    assert back.columns == [X, Y]
    a = li.groupBy(X, Y).count().collect()
    b = back.groupBy(X, Y).count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_zorder_value_interleaves_bits(spark):
    df = spark.range(1).select(
        relational.zorder_value(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
    )
    # x bits at even positions (1,0,1 -> 0b010001... let's compute):
    # x=5 (101), y=3 (011): z = x0<<0|y0<<1|x1<<2|y1<<3|x2<<4|y2<<5
    #   = 1 + 2 + 0 + 8 + 16 + 0 = 27
    assert df.collect()[0].z == 27
