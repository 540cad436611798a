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
