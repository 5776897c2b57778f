#!/usr/bin/env python
"""Diff two bench payloads per query — the regression detector for
round-over-round analysis.

    python tools/bench_compare.py OLD.json NEW.json [threshold]

Accepts either a raw one-line bench payload or a driver BENCH_r*.json
wrapper (uses its "parsed" field). Prints queries whose time moved more
than ``threshold`` (default 1.3x) in either direction, plus totals.
Exit code 0 always — this is a report, not a gate (host noise at this
scale is +-15%; see README "Bench methodology").
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' field (not a bench payload?)")
    return doc


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    oq, nq = old["queries"], new["queries"]

    moved = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            moved.append((name, a, b, None))
            continue
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        if ratio > thresh or ratio < 1 / thresh:
            moved.append((name, a, b, ratio))

    print(f"{'query':26s} {'old':>8s} {'new':>8s} {'ratio':>7s}")
    for name, a, b, r in moved:
        if r is None:
            tag = "ADDED" if a is None else "REMOVED"
            print(f"{name:26s} {a if a is not None else '-':>8} "
                  f"{b if b is not None else '-':>8} {tag:>7s}")
        else:
            arrow = "SLOWER" if r > 1 else "faster"
            print(f"{name:26s} {a:8.3f} {b:8.3f} {r:6.2f}x {arrow}")
    if not moved:
        print(f"(no per-query move beyond {thresh}x)")

    for k in ("value", "oracle_value", "ratio_vs_oracle", "host_steal_pct"):
        print(f"{k}: {old.get(k)} -> {new.get(k)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
