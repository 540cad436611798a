"""Round-9 additions: loud-failure guard on classifier_pr_curve's
zero-positive degenerate input (ADVICE r8 — the one 'div 0 → silent
NULL' site the round-8 assert_true sweep missed), and the Kafka sink's
NULL-partition routing contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators import text


def test_classifier_pr_curve_zero_positives_fails_loudly(spark):
    """Recall with pos=0 must raise (assert_true convention), not emit
    a silent-NULL recall a hash gate could certify."""
    df = spark.createDataFrame(
        [(i, 0.1 * (i % 10)) for i in range(20)], "id long, score double"
    )
    out = text.classifier_pr_curve(df, "score", F.lit(0))
    with pytest.raises(Exception, match="zero positive labels"):
        out.collect()
    # valid input still yields the exact curve, recall non-null
    ok = text.classifier_pr_curve(
        df, "score", (F.col("id") >= 10).cast("int")
    )
    rows = ok.collect()
    assert rows and all(r.recall_q6 is not None for r in rows)
    # bin 0 keeps everything: recall 1.0 exactly
    assert rows[0].recall_q6 == 1.0
