"""Registry output-contract tests.

The driver's correctness canonicalizer sorts and hashes every output
cell; Python ``list``/``dict`` cells are unhashable, so a query that
emits a bare array/struct/map column fails the graded gate even when
its values are correct (round-1 lesson: fn_complex_types et al.).
Enforce the registry convention (queries/registry.py docstring): all
output columns are atomic — complex types must be serialized with
array_join / to_json before they leave the query.
"""

from __future__ import annotations

import pytest

from big_data_project_implementation_spark.queries import REGISTRY
from tests.conftest import SF_DIR

COMPLEX = ("ArrayType", "MapType", "StructType")

# streaming queries execute on .fn() (memory-sink round trip) — schema
# checked in their own tests; skip here to keep this test instant.
BATCH = sorted(n for n in REGISTRY if not n.startswith("stream_"))


@pytest.mark.parametrize("name", BATCH)
def test_output_columns_are_atomic(spark, name):
    schema = REGISTRY[name].fn(spark, SF_DIR).schema
    offenders = [
        f.name for f in schema.fields if type(f.dataType).__name__ in COMPLEX
    ]
    assert not offenders, (
        f"{name} emits driver-unhashable complex-typed columns {offenders}; "
        "serialize with array_join/to_json (registry convention)"
    )
