"""Function namespace — 1:1 parity with the reference's registry
(CAT/analysis/FunctionRegistry.scala:118-286, SURVEY §2.8) plus the
engine's own text/similarity expression helpers.

Everything maps to ``pyspark.sql.functions`` (JVM-side, codegen'd).
This module re-exports the whole namespace so engine users write
``from big_data_project_implementation_spark import functions as F`` and get both the
standard library and the extensions; the explicit alias table below
documents the handful of reference names whose modern spelling differs.
"""

from pyspark.sql.functions import *  # noqa: F401,F403 — parity namespace
from pyspark.sql import functions as _F

# Reference-name → modern-name aliases (1.6 registry names kept callable)
lcase = _F.lower  # FunctionRegistry.scala:224
ucase = _F.upper  # :239
nvl = _F.coalesce  # :127 (2-arg nvl ⊂ coalesce)
substr = _F.substring  # :235
to_unix_timestamp = _F.unix_timestamp  # :266
approx_count_distinct = _F.approx_count_distinct  # HLL++ (:183)

# engine extensions (text analysis + vector math as pure expressions)
from big_data_project_implementation_spark.operators.similarity import (  # noqa: E402
    cosine,
    dot,
    norm,
)
from big_data_project_implementation_spark.operators.text import (  # noqa: E402
    bpe_token_count,
    detect_language,
    fingerprint,
    quality_score,
    token_count,
)
