"""Unit semantics for operators.text.token_budget_sample (data-mixture
sampling); end-to-end oracle parity runs in test_queries_oracle.py as
data_token_budget_mixture.
"""

from __future__ import annotations

from big_data_project_implementation_spark.operators import text

SCHEMA = "doc_id long, source string, text string"


def _docs(spark, n=40):
    rows = [
        (i, "web" if i % 2 == 0 else "code", " ".join(["w"] * (5 + i % 7)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_budget_is_respected_per_source(spark):
    out = text.token_budget_sample(
        _docs(spark), {"web": 30, "code": 15}
    ).collect()
    by_src: dict[str, int] = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + r.n_tokens
    assert by_src["web"] <= 30
    assert by_src["code"] <= 15
    # greedy prefix actually fills: adding ANY unkept doc (all >= 5
    # tokens) would overflow — totals land within 11 of the budget
    assert by_src["web"] > 30 - 12
    assert by_src["code"] > 15 - 12


def test_unbudgeted_sources_are_dropped(spark):
    out = text.token_budget_sample(_docs(spark), {"web": 50}).collect()
    assert {r.source for r in out} == {"web"}


def test_deterministic_across_partitionings(spark):
    d = _docs(spark)
    a = {r.doc_id for r in text.token_budget_sample(d, {"web": 40}).collect()}
    b = {
        r.doc_id
        for r in text.token_budget_sample(d.repartition(7), {"web": 40}).collect()
    }
    assert a == b and a


def test_seed_changes_the_draw(spark):
    d = _docs(spark, n=200)
    a = {r.doc_id for r in text.token_budget_sample(d, {"web": 60}).collect()}
    b = {
        r.doc_id
        for r in text.token_budget_sample(d, {"web": 60}, seed="s2").collect()
    }
    assert a != b  # 200 docs, ~10 kept: identical draws are (1e-10)-unlikely


def test_bucketed_variant_holds_total_budget(spark):
    d = _docs(spark, n=400)
    out = text.token_budget_sample(d, {"web": 200, "code": 100}, buckets=4).collect()
    by_src: dict[str, int] = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + r.n_tokens
    # B buckets of budget/B each can never exceed the source budget
    assert by_src["web"] <= 200
    assert by_src["code"] <= 100
    # and parallel greedy still fills most of it
    assert by_src["web"] > 100
    assert by_src["code"] > 50
