"""Query registry: every operator capability exposed as a named query.

Each entry pairs a Spark DataFrame program with (when SQL-expressible)
an equivalent DuckDB oracle SQL string. The driver's correctness gate
runs both at sf0.01 and hash-compares; tests/tools do the same locally.

Import order populates the registry.
"""

from big_data_project_implementation_spark.queries.registry import (
    REGISTRY,
    QuerySpec,
    query,
)

# registration side effects — keep sorted
from big_data_project_implementation_spark.queries import (  # noqa: E402,F401
    aggregates_q,
    events_q,
    functions_q,
    joins_q,
    pipeline_q,
    relational_q,
    streaming_q,
    tpch_q,
    udf_q,
    windows_q,
)

# The driver's correctness gate certifies only the FIRST 50 registry entries
# per round, so registration order decides which families get driver rows.
# Rounds 1-2 certified the agg/fn/join/pipeline families (slots 0-49); this
# window rotates the so-far-uncertified families in: all of TPC-H, windows,
# UDF, streaming, multimodal_features, plus 9 relational/set-op queries.
# The 7 entries left over (5 oracled relational + 2 rows-only) rotate into
# the window next round — schedule documented in COVERAGE.md.
_CERTIFICATION_WINDOW = [
    # TPC-H (22) — the reference's own benchmark-correctness class
    "q1_pricing_summary", "q2_min_price_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q11_important_value", "q12_priority_shipping",
    "q13_customer_distribution", "q14_promo_effect", "q15_top_supplier",
    "q16_supplier_cnt", "q17_small_quantity_revenue",
    "q18_large_volume_customer", "q19_disjunctive_join",
    "q20_potential_promotion", "q21_waiting_orders", "q22_global_sales",
    # windows (7)
    "window_ranking", "window_lag_lead", "window_running_agg",
    "window_range_frame", "window_topn_per_group", "window_share_of_total",
    "window_named_sql",
    # UDF surface (6)
    "udf_pandas_scalar", "udf_grouped_agg", "udf_apply_in_pandas",
    "udf_map_in_pandas", "udf_cogroup", "udf_classic_python",
    # streaming (5)
    "stream_tumbling_window", "stream_sliding_window", "stream_per_key_counts",
    "stream_stream_join", "stream_sessionize",
    # multimodal features (de-stubbed this round; oracled via the
    # synthesize→header-parse closed-form round trip)
    "multimodal_features",
    # relational / set-ops (9 of 15)
    "project_filter", "predicates_null_in_like", "union_all",
    "intersect_distinct", "except_distinct", "except_all_bag",
    "intersect_all_bag", "explode_lateral_view", "sql_front_door",
]

_window_set = set(_CERTIFICATION_WINDOW)
_missing = _window_set - set(REGISTRY)
if _missing:  # fail loudly at import — a typo here silently shrinks the gate
    raise RuntimeError(f"certification window names not in registry: {_missing}")
_ordered = {n: REGISTRY[n] for n in _CERTIFICATION_WINDOW}
_ordered.update((n, s) for n, s in list(REGISTRY.items()) if n not in _window_set)
REGISTRY.clear()
REGISTRY.update(_ordered)

__all__ = ["REGISTRY", "QuerySpec", "query", "_CERTIFICATION_WINDOW"]
