"""Assemble the clean-session bench reference (BENCH_clean_rN.json)
from per-pass dumps (VERDICT r8 #3).

Round 8 published per-row envelopes as [min, max] of the three
per-session min-of-2/3 values — an envelope "normal contention"
routinely escaped (five green-fingerprint driver rows sat above it),
so an out-of-envelope driver row wasn't actionable. This rebuilds the
envelope over the RAW individual passes (6-9 per row across 3
sessions): reported value stays the min (the steady-state cost of the
plan), the envelope becomes [min, p90-of-all-passes], so a driver row
above it means "slower than 90% of everything a clean box ever showed"
— worth reading — instead of "lost a min-of-mins lottery".

Usage:
  SPARK_GRAFT_BENCH_PASSES_OUT=/tmp/p1.json python bench.py
  (x3 sessions)
  python tools/gen_clean_bench.py BENCH_clean_r09.json /tmp/p1.json /tmp/p2.json /tmp/p3.json
"""

from __future__ import annotations

import json
import math
import sys


def p90(xs: list[float]) -> float:
    """Nearest-rank p90 (ceil convention): small-n safe, never
    interpolates above the observed max."""
    s = sorted(xs)
    return s[max(0, math.ceil(0.9 * len(s)) - 1)]


def main() -> None:
    out_path, *pass_paths = sys.argv[1:]
    assert len(pass_paths) >= 2, "need at least 2 sessions"
    dumps = [json.load(open(p)) for p in pass_paths]
    sf = dumps[0]["sf"]
    assert all(d["sf"] == sf for d in dumps)
    names = list(dumps[0]["passes"])
    assert all(list(d["passes"]) == names for d in dumps)

    queries: dict[str, float] = {}
    envelope: dict[str, list] = {}
    all_passes: dict[str, list[float]] = {}
    for name in names:
        xs = [t for d in dumps for t in d["passes"][name]]
        all_passes[name] = xs
        queries[name] = min(xs)
        envelope[name] = [min(xs), p90(xs)]

    session_totals = [
        round(sum(min(d["passes"][n]) for n in names), 3) for d in dumps
    ]
    payload = {
        "metric": (
            f"headline query wall time at sf{sf} (clean-session builder "
            "reference; min across sessions, per-row [min, p90-of-all-"
            "passes] envelope over raw per-pass times — VERDICT r8 #3)"
        ),
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "envelope": envelope,
        "passes": all_passes,
        "session_totals": session_totals,
        "sf": sf,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    worst = sorted(
        names, key=lambda n: envelope[n][1] / max(envelope[n][0], 1e-9)
    )[-8:]
    print(f"wrote {out_path}: total {payload['value']}s over {len(names)} rows")
    print("widest envelopes (p90/min):")
    for n in reversed(worst):
        lo, hi = envelope[n]
        print(f"  {n}: [{lo}, {hi}] ({hi / max(lo, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
