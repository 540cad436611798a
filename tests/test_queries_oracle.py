"""checkAnswer-style end-to-end test per registered query (the
reference's QueryTest.checkAnswer pattern, SURVEY §5.2, with DuckDB as
the independent oracle, §5.3) at sf0.001.
"""

from __future__ import annotations

import pytest

from big_data_project_implementation_spark.queries import REGISTRY
from tests.conftest import SF_DIR
from tools.check_correctness import compare

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        # rows-only contract: must run and produce a stable schema
        assert spark_pdf is not None
        assert len(sdf.columns) > 0
        return
    duck_pdf = duck.execute(spec.oracle).fetchdf()
    ok, msg = compare(spark_pdf, duck_pdf)
    assert ok, f"{name}: {msg}"


def test_dedup_clusters_unrolled_oracle_matches_recursive_closure():
    """The registered dedup_clusters oracle unrolls 8 star-contraction
    rounds (fast at any SF); the recursive-CTE closure is the exact
    reference (quadratic in component size, sf0.01-only). They must
    agree row-for-row, and the unrolled form must emit no poison row."""
    import duckdb

    from big_data_project_implementation_spark.queries import pipeline_q

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    unrolled = con.execute(REGISTRY["dedup_clusters"].oracle).fetchall()
    closure = con.execute(pipeline_q.DEDUP_CLUSTERS_CLOSURE_SQL).fetchall()
    con.close()
    assert not any(r[0] == -1 for r in unrolled), "poison row: not converged"
    assert sorted(unrolled) == sorted(closure)
