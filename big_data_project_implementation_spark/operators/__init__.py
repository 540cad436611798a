"""Operator library.

``relational`` covers the reference's surface (thin, tested contracts
over DataFrame ops); ``dedup`` / ``similarity`` / ``text`` /
``multimodal`` are the beyond-reference training-data-pipeline
operators, all designed partition-parallel for 100 TB inputs.
"""

from big_data_project_implementation_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
