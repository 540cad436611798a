"""Round 13: ADVICE r12 fixes + VERDICT r12 next-round items —
structural plan introspection, filtered maintained views, ATTACH,
join-view disk deployment, density-adaptive IVF-PQ refine."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators.views import (
    MaterializedView,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def _sqlcat(spark, **kw):
    from big_data_project_implementation_spark.operators.view_sql import (
        SqlViewCatalog,
    )

    return SqlViewCatalog(spark, **kw)


# -- VERDICT r12 what's-wrong #2: prose counts are generated ---------------


def test_readme_registry_count_matches_generator():
    """README's registry-count block is generated from the registry
    (tools/gen_staleness.sync_readme) — the doc must equal the
    generator's output so the count can never drift again."""
    import tools.gen_staleness as gs

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "README.md")) as fh:
        text = fh.read()
    assert gs.readme_counts_line() in text
