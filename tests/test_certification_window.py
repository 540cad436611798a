"""Pin the driver certification window (first 50 registry entries).

The driver's correctness gate only certifies the first 50 entries of
``queries()``, so registration order is a graded contract.  From round
4 on the window is COMPUTED from the driver's own CORRECTNESS_r*.json
history — red rows first, then never-certified, then stalest green —
so newly added queries take slots automatically and no family's driver
row goes stale.  These tests exercise the pure rotation function on
synthetic histories (deterministic, environment-independent) and pin
only structural invariants of the live window, so the suite stays
green after the driver writes each round's files (round 3's suite went
red at round-4 start for exactly that mistake — VERDICT r3 #2).
"""

from __future__ import annotations

import glob
import json
import math

from big_data_project_implementation_spark.queries import (
    REGISTRY,
    _CERTIFICATION_WINDOW,
    _WINDOW_R3,
    _WINDOW_R4,
    _WINDOW_R5,
    _WINDOW_SIZE,
    _computed_window,
    _driver_history,
    _round_number,
    _rows_only_latest,
)


def test_window_is_first_50():
    assert len(_CERTIFICATION_WINDOW) == _WINDOW_SIZE
    assert list(REGISTRY)[:_WINDOW_SIZE] == list(_CERTIFICATION_WINDOW)


def test_active_window_matches_history():
    """The live window is exactly what the rotation computes from the
    committed driver files (any round ≥ 4)."""
    r = _round_number()
    if r <= 3:
        assert _CERTIFICATION_WINDOW is _WINDOW_R3
    else:
        upgraded = {
            n
            for n in _rows_only_latest()
            if n in REGISTRY and REGISTRY[n].oracle is not None
        }
        expected = _computed_window(
            list(REGISTRY), _driver_history(), upgraded=upgraded
        )
        assert list(_CERTIFICATION_WINDOW) == expected


def test_live_window_priorities():
    """Live invariants, derived from the real driver files: every red
    row and every never-certified entry takes a slot before any green
    one (as long as they fit)."""
    if _round_number() <= 3:
        return
    hist = _driver_history()
    window = set(_CERTIFICATION_WINDOW)
    red = [n for n in REGISTRY if n in hist and not hist[n][1]]
    never = [n for n in REGISTRY if n not in hist]
    need = red + never
    if len(need) <= _WINDOW_SIZE:
        assert set(need) <= window, sorted(set(need) - window)
    else:
        assert all(n in window for n in red)
        assert len(window & set(need)) == _WINDOW_SIZE


def test_driver_history_parses_real_files():
    """Invariants of the parser against the live driver files — never
    pin a (round, ok) snapshot here: the driver rewrites history every
    round and snapshots go stale (VERDICT r3 #2 and r4 #1).  Exact
    value checks live in test_driver_history_exact_on_fixtures."""
    hist = _driver_history()
    files = sorted(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    if not files:
        return
    newest = max(int(p.rsplit("r", 1)[1].split(".")[0]) for p in files)
    raw = {k for p in files for k in json.load(open(p))}
    # history covers exactly the names the driver ever wrote
    assert set(hist) == raw
    for name, (rnd, ok) in hist.items():
        assert 1 <= rnd <= newest
        assert isinstance(ok, bool)
    # independently recompute "newest round per name" and compare
    per_name_newest: dict[str, int] = {}
    for p in files:
        rnd = int(p.rsplit("r", 1)[1].split(".")[0])
        for k in json.load(open(p)):
            per_name_newest[k] = max(per_name_newest.get(k, 0), rnd)
    assert {n: r for n, (r, _) in hist.items()} == per_name_newest


def test_driver_history_exact_on_fixtures(tmp_path):
    """Exact-value checks on synthetic driver files (green, red,
    rows-only, malformed, superseded) — immune to live-repo drift."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "green_then_red": {"rows_match": True, "schema_match": True,
                           "hash_match": True, "spark_rows": 5,
                           "oracle_rows": 5, "err": None},
        "stays_green": {"rows_match": True, "schema_match": True,
                        "hash_match": True, "spark_rows": 1,
                        "oracle_rows": 1, "err": None},
        "malformed_row": "not-a-dict",
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "green_then_red": {"rows_match": True, "schema_match": False,
                           "hash_match": False, "spark_rows": 5,
                           "oracle_rows": 4, "err": None},
        "rows_only_ok": {"rows_match": None, "schema_match": None,
                         "hash_match": None, "spark_rows": 7,
                         "oracle_rows": None, "err": "no_oracle"},
        "rows_only_crashed": {"rows_match": None, "schema_match": None,
                              "hash_match": None, "spark_rows": None,
                              "oracle_rows": None, "err": "no_oracle"},
        "errored": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "spark_rows": 3,
                    "oracle_rows": 3, "err": "boom"},
    }))
    hist = _driver_history(root=str(tmp_path))
    assert hist["green_then_red"] == (2, False)  # newest round wins
    assert hist["stays_green"] == (1, True)
    assert hist["rows_only_ok"] == (2, True)  # no_oracle = by-design pass
    assert hist["rows_only_crashed"] == (2, False)
    assert hist["errored"] == (2, False)
    assert "malformed_row" not in hist
    assert _round_number(root=str(tmp_path)) == 3


def test_suite_survives_future_driver_write(tmp_path):
    """Dropping a synthetic next-round driver file must not break the
    rotation: simulate CORRECTNESS_r{next} (all window entries green)
    and re-check every live invariant against the merged history."""
    import shutil

    for p in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        shutil.copy(p, tmp_path)
    nxt = _round_number()
    window_now = _computed_window(list(REGISTRY), _driver_history())
    fake = {n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 1, "oracle_rows": 1,
                "err": None} for n in window_now}
    (tmp_path / f"CORRECTNESS_r{nxt:02d}.json").write_text(json.dumps(fake))
    hist2 = _driver_history(root=str(tmp_path))
    for n in window_now:
        assert hist2[n] == (nxt, True)
    # the next window computes cleanly and re-prioritizes reds/nevers
    w2 = _computed_window(list(REGISTRY), hist2)
    assert len(w2) == _WINDOW_SIZE
    red = [n for n in REGISTRY if n in hist2 and not hist2[n][1]]
    never = [n for n in REGISTRY if n not in hist2]
    need = red + never
    if len(need) <= _WINDOW_SIZE:
        assert set(need) <= set(w2)


def test_computed_window_priorities_synthetic():
    names = [f"q{i:02d}" for i in range(8)]
    hist = {
        "q01": (3, False),  # red → always first
        "q02": (1, True),  # stalest green
        "q03": (3, True),  # fresh green
        "q05": (2, True),
    }
    # q00, q04, q06, q07 never certified
    w = _computed_window(names, hist, size=6)
    assert set(w) == {"q01", "q00", "q04", "q06", "q07", "q02"}
    # registration order is preserved within the window
    assert w == [n for n in names if n in set(w)]
    # one fewer slot → the stale green falls out before any never/red
    w5 = _computed_window(names, hist, size=5)
    assert set(w5) == {"q01", "q00", "q04", "q06", "q07"}


def test_computed_window_oracle_upgrades_jump_the_green_queue():
    """A query whose latest driver row was rows-only but which has
    since gained an oracle gets its hash-match row next round — after
    reds and never-certifieds, before any plain stale green (round-6
    rule for the rows-only → oracled conversions)."""
    names = [f"q{i:02d}" for i in range(8)]
    hist = {
        "q01": (3, False),   # red
        "q02": (1, True),    # stalest green
        "q03": (2, True),    # rows-only at its latest row, now oracled
        "q05": (1, True),    # equally stale green
        "q06": (3, True),
        "q07": (3, True),
    }
    # q00, q04 never certified
    w = _computed_window(names, hist, size=4, upgraded={"q03"})
    assert set(w) == {"q01", "q00", "q04", "q03"}
    # without the upgrade flag the same entry loses to the staler greens
    w0 = _computed_window(names, hist, size=4)
    assert "q03" not in w0


def test_rows_only_latest_on_fixtures(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "always_ro": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "spark_rows": 4,
                      "oracle_rows": None, "err": "no_oracle"},
        "was_ro_now_oracled": {"rows_match": None, "schema_match": None,
                               "hash_match": None, "spark_rows": 9,
                               "oracle_rows": None, "err": "no_oracle"},
        "always_green": {"rows_match": True, "schema_match": True,
                         "hash_match": True, "spark_rows": 1,
                         "oracle_rows": 1, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        # newest row is a real hash-match → no longer rows-only
        "was_ro_now_oracled": {"rows_match": True, "schema_match": True,
                               "hash_match": True, "spark_rows": 9,
                               "oracle_rows": 9, "err": None},
        "ro_crashed": {"rows_match": None, "schema_match": None,
                       "hash_match": None, "spark_rows": None,
                       "oracle_rows": None, "err": "no_oracle"},
    }))
    ro = _rows_only_latest(root=str(tmp_path))
    assert ro == {"always_ro"}  # crashed rows-only is red, not rows-only


def test_round6_conversions_take_r6_slots():
    """Every rows-only → oracled conversion of round 6 must be in the
    live round-6 window alongside the 8 never-certified entries, so
    CORRECTNESS_r06 records their first hash-match rows."""
    if _round_number() != 6:
        return
    for n in (
        "multimodal_entropy", "embedding_pq_codes", "text_bpe_encode",
        "similarity_ivf_topk", "similarity_ivfpq_topk",
        "similarity_ivfpq_serve", "embedding_semdedup", "graph_pagerank",
        "text_pack_bfd", "sketch_count_min_topk",
    ):
        assert REGISTRY[n].oracle is not None
        assert n in _CERTIFICATION_WINDOW, n
    for n in (
        "stream_stream_full_join", "stream_windowed_distinct",
        "stream_topk_trending", "udf_arrow_python", "udf_map_in_arrow",
        "udtf_lateral_split", "window_ignore_nulls",
        "window_time_range_frame",
    ):
        assert n in _CERTIFICATION_WINDOW, n


def test_computed_window_ties_break_by_registration_order():
    names = [f"n{i}" for i in range(10)]
    w = _computed_window(names, {}, size=4)
    assert w == names[:4]


def test_rotation_certifies_everything_within_bound():
    """Simulate the driver loop: every entry gets a fresh driver row at
    least every ceil(N/50) rounds, forever, even as queries keep being
    added."""
    names = list(REGISTRY)
    hist = dict(_driver_history())
    start = _round_number()
    bound = math.ceil(len(names) / _WINDOW_SIZE)
    last_seen = {n: hist[n][0] for n in names if n in hist}
    for rnd in range(start, start + 8):
        window = _computed_window(names, hist)
        assert len(window) == _WINDOW_SIZE
        for n in window:  # driver certifies the window green
            hist[n] = (rnd, True)
            last_seen[n] = rnd
        for n, seen in last_seen.items():
            assert rnd - seen < bound + 1, (n, seen, rnd)
    # steady state: everything has a row within the last `bound` rounds
    assert min(last_seen.values()) > start + 8 - 1 - bound
    assert set(last_seen) == set(names)


def test_rotation_reprioritizes_failures():
    names = list(REGISTRY)
    hist = dict(_driver_history())
    window = _computed_window(names, hist)
    victim = window[0]
    for n in window:
        hist[n] = (4, n != victim)  # one red row in round 4
    assert victim in _computed_window(names, hist)  # recertifies next


def test_fallback_windows_still_valid():
    """The pinned R3/R4/R5 lists remain the rotation's fallback; they
    must stay real, duplicate-free, full-size registry names."""
    for w in (_WINDOW_R3, _WINDOW_R4, _WINDOW_R5):
        assert len(w) == _WINDOW_SIZE
        assert len(set(w)) == _WINDOW_SIZE
        assert set(w) <= set(REGISTRY), sorted(set(w) - set(REGISTRY))


def test_window_r3_composition():
    """The round-3 window held every family uncertified after r1-r2
    (historical fact — the r03 driver files were produced under it)."""
    window = set(_WINDOW_R3)
    tpch = {n for n in REGISTRY if n.startswith("q") and n[1].isdigit()}
    # the SEVEN R3-vintage window queries — pinned, not derived: later
    # rounds add more window_* entries (ignore-nulls, time-range) that
    # certify via the computed window
    windows = {
        "window_ranking", "window_lag_lead", "window_running_agg",
        "window_range_frame", "window_topn_per_group",
        "window_share_of_total", "window_named_sql",
    }
    # the six R3-vintage UDF queries (udf_arrow_python/udf_map_in_arrow
    # arrived in round 4 and certify via the computed window instead)
    udf_r3 = {
        "udf_pandas_scalar", "udf_grouped_agg", "udf_apply_in_pandas",
        "udf_map_in_pandas", "udf_cogroup", "udf_classic_python",
    }
    assert tpch <= window and len(tpch) == 22
    assert windows <= window and len(windows) == 7
    assert udf_r3 <= window and udf_r3 <= set(REGISTRY)
    assert [n for n in _WINDOW_R3 if REGISTRY[n].oracle is None] == []


def test_round_detection_counts_driver_files():
    n_files = len(glob.glob("/root/repo/CORRECTNESS_r*.json"))
    assert _round_number() == n_files + 1
