"""Relational helpers that go beyond a 1:1 DataFrame mapping.

Most of the reference's relational surface (SURVEY §2.2-§2.7) needs no
wrapper — the queries/ registry exercises it directly on the DataFrame
API. This module holds the pieces that encode a *strategy*, not just a
call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with key salting for extreme skew.

    AQE's skew-join splitting (on in ``session.py``) handles most skew
    by splitting oversized *partitions*; salting is the remaining tool
    when a single KEY is so hot that one task would still own it.
    Mechanics: the large/skewed ``left`` spreads each row across
    ``salt`` sub-keys via a deterministic row hash; ``right`` replicates
    each row to all sub-keys (×salt blowup — keep the replicated side
    the smaller one). Result is row-identical to the plain join.

    Reference context: Spark 1.6 had neither AQE nor skew handling —
    users hand-salted exactly like this (no citation; folklore the
    engine now owns).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join preserves semantics only for inner/left joins; "
            f"got {how!r}"
        )
    left_s = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int"),
    )
    right_s = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return left_s.join(right_s, on + ["_salt"], how).drop("_salt")
