"""PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing capability
surface of the reference repo (Vinayak2002/Big-Data-Project-Implementation,
which is an Apache Spark 1.6.1 source tree — see SURVEY.md) on modern
PySpark: DataFrame/SQL + Catalyst + Structured Streaming, extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Design rules (100 TB first):
- Declarative DataFrame/SQL plans so Catalyst owns pushdown, pruning,
  join selection, and AQE re-planning.
- No driver-side collects inside operators; broadcast only under
  threshold; every operator partition-parallel.
- Python UDFs only where built-ins cannot express the semantics, and
  then always Arrow-batched (pandas_udf / mapInPandas / applyInPandas).
"""

from big_data_project_implementation_spark import operators, plans, sources, streaming
from big_data_project_implementation_spark.session import get_session

__version__ = "0.1.0"

__all__ = [
    "get_session",
    "operators",
    "plans",
    "sources",
    "streaming",
    "__version__",
]
