"""Pin the driver certification window (first 50 registry entries).

The driver's correctness gate only certifies the first 50 entries of
``queries()``, so registration order is a graded contract.  Round 3
rotates the families that had no driver rows after rounds 1-2 (TPC-H,
windows, UDF, streaming, relational/set-ops, multimodal_features) into
the window; see COVERAGE.md "Certification rotation".
"""

from __future__ import annotations

from big_data_project_implementation_spark.queries import (
    REGISTRY,
    _CERTIFICATION_WINDOW,
)


def test_window_is_first_50():
    assert len(_CERTIFICATION_WINDOW) == 50
    assert list(REGISTRY)[:50] == _CERTIFICATION_WINDOW


def test_window_composition():
    """The round-3 window holds every previously-uncertified family."""
    window = set(_CERTIFICATION_WINDOW)
    tpch = {n for n in REGISTRY if n.startswith("q") and n[1].isdigit()}
    windows = {n for n in REGISTRY if n.startswith("window_")}
    udf = {n for n in REGISTRY if n.startswith("udf_")}
    streaming = {n for n in REGISTRY if n.startswith("stream_")}
    assert tpch <= window and len(tpch) == 22
    assert windows <= window and len(windows) == 7
    assert udf <= window and len(udf) == 6
    # the 5 round-2-era streaming queries are in the window;
    # round-3 additions rotate in next round (schedule in COVERAGE.md)
    assert len(streaming & window) == 5
    assert streaming - window <= {
        "stream_dedup_exact",
        "stream_quality_filter",
        "stream_static_join",
    }


def test_window_maximizes_oracled_entries():
    """Every window entry carries a DuckDB oracle (multimodal_features
    gained one via the synthesize→parse closed-form round trip)."""
    no_oracle = [
        n for n in _CERTIFICATION_WINDOW if REGISTRY[n].oracle is None
    ]
    assert no_oracle == []
