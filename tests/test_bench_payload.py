"""Pins the truncation-defensive payload ordering of bench.py.

The driver archives only the TAIL of bench stdout (BENCH_r{N}.json
keeps a fixed number of trailing bytes), so any key that precedes the
cut is lost. The r10 artifact lost ``host_steal_pct`` and
``oracle_value`` this way and its outlier ratio could not be diagnosed
from the artifact alone. These tests fail if the payload construction
ever emits a bulky per-query dict after the scalar trust anchors, or
pushes the anchors out of the final ~200 bytes.

bench.py is exercised statically (key-order extraction from a driven
``main()`` would need a full Spark+DuckDB run); the contract is the
serialization order of the payload dict, which insertion order fully
determines, so we drive the construction with a stubbed run instead.
"""

from __future__ import annotations

import json
import os

# every scalar a reader needs to trust/triage a run, in required order
TRUST_ANCHORS = [
    "value",
    "sf",
    "pass_totals",
    "host_steal_pct",
    "oracle_value",
    "oracle_coverage",
    "spark_covered_value",
    "ratio_vs_oracle",
]
BULKY = ["queries", "samples", "oracle_queries"]


def _build_payload(per_query, oracle_best, samples=None, scaling_probe=None):
    """Re-run bench.py's payload-construction block on stub data by
    executing the real module source between the payload markers —
    guarantees the test can't drift from the code it pins."""
    src_path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py")
    with open(src_path) as f:
        src = f.read()
    start = src.index("    payload = {")
    end = src.index("    print(json.dumps(payload))")
    block = "\n".join(line[4:] for line in src[start:end].splitlines())
    env = {
        "os": os,
        "per_query": per_query,
        "oracle_best": oracle_best,
        "samples": samples or {},
        "oracle_on": bool(oracle_best),
        "total": round(sum(t for t in per_query.values() if t >= 0), 3),
        "sf": 0.1,
        "pass_totals": [1.0, 0.9],
        "_cpu_jiffies": lambda: (10, 1000),
        "steal0": 0,
        "total0": 0,
        "scaling_probe": scaling_probe,
    }
    exec(block, env)  # noqa: S102 - executing our own repo source
    return env["payload"]


def test_trust_anchors_are_last_and_ordered():
    per_query = {f"q{i}": 0.1 * i for i in range(40)}
    oracle_best = {f"q{i}": 0.05 * i for i in range(40)}
    payload = _build_payload(per_query, oracle_best)
    keys = list(payload)
    # all anchors present and in pinned relative order
    anchor_pos = [keys.index(k) for k in TRUST_ANCHORS if k in keys]
    assert anchor_pos == sorted(anchor_pos)
    assert set(TRUST_ANCHORS) <= set(keys)
    # nothing bulky at or after the first anchor
    first_anchor = keys.index("value")
    assert not any(k in BULKY for k in keys[first_anchor:]), keys[first_anchor:]
    # anchors fit inside the artifact's surviving tail with margin:
    # the serialized suffix from "value" onward stays under 250 bytes
    line = json.dumps(payload)
    suffix = line[line.index('"value"') :]
    assert len(suffix) < 250, len(suffix)


def test_spark_top_sits_between_oracle_dict_and_anchors():
    """The Spark slow-tail must survive truncation: placed AFTER the
    bulky oracle dict, BEFORE the scalar anchors, and the serialized
    suffix from spark_top onward stays inside the surviving ~500-byte
    artifact tail (the r11 artifact's visible per-query dict was the
    oracle's — per-query Spark analysis was impossible)."""
    per_query = {f"q{i}": 0.1 * i for i in range(40)}
    per_query["flaky"] = -1.0  # failure sentinel must never enter
    oracle_best = {f"q{i}": 0.05 * i for i in range(40)}
    payload = _build_payload(per_query, oracle_best)
    keys = list(payload)
    assert keys.index("oracle_queries") < keys.index("spark_top") < keys.index("value")
    # exactly the 10 slowest Spark queries, slowest first, no sentinel
    top = payload["spark_top"]
    assert list(top) == [f"q{i}" for i in range(39, 29, -1)]
    assert list(top.values()) == sorted(top.values(), reverse=True)
    line = json.dumps(payload)
    suffix = line[line.index('"spark_top"') :]
    assert len(suffix) < 500, len(suffix)


def test_scaling_probe_is_diagnostic_not_anchor():
    """The shuffle=cpus scaling-probe dict (r12 verdict task #2) is a
    bulky diagnostic: it must sit after the oracle dict and BEFORE
    spark_top and the scalar anchors, so truncation eats it before the
    trust anchors."""
    per_query = {f"q{i}": 0.1 * i for i in range(40)}
    oracle_best = {f"q{i}": 0.05 * i for i in range(40)}
    probe = {
        "shuffle_partitions": 32,
        "total": 1.0,
        "queries": {f"q{i}": 0.09 * i for i in range(40)},
    }
    payload = _build_payload(per_query, oracle_best, scaling_probe=probe)
    keys = list(payload)
    assert (
        keys.index("oracle_queries")
        < keys.index("scaling_probe")
        < keys.index("spark_top")
        < keys.index("value")
    )
    # absent probe (SPARK_GRAFT_SCALING_PROBE=0) leaves the payload shape intact
    payload2 = _build_payload(per_query, oracle_best)
    assert "scaling_probe" not in payload2


def test_anchors_survive_without_oracle():
    """oracle_off runs (SPARK_GRAFT_ORACLE=0) must still end on the
    scalar block — value/sf/pass_totals/host_steal_pct last."""
    per_query = {"q0": 0.5, "q1": -1.0}
    payload = _build_payload(per_query, {})
    keys = list(payload)
    assert keys[-1] == "host_steal_pct"
    assert keys[-4:] == ["value", "sf", "pass_totals", "host_steal_pct"]
    assert "oracle_value" not in payload
    # failed-query sentinel excluded from the total
    assert payload["value"] == 0.5


def test_failed_spark_query_drops_from_both_sums():
    """A query with only a -1 sentinel must not contribute oracle time
    to the ratio (identical-workload invariant)."""
    per_query = {"ok": 1.0, "bad": -1.0}
    oracle_best = {"ok": 0.5, "bad": 0.25}
    payload = _build_payload(per_query, oracle_best)
    assert payload["oracle_value"] == 0.5
    assert payload["spark_covered_value"] == 1.0
    assert payload["oracle_coverage"] == 1
    assert payload["ratio_vs_oracle"] == 2.0
