#!/usr/bin/env python
"""Build an adversarial-regime copy of a testdata SF directory, for
running the full oracle gate on mutated data:

    python tools/mutate_corpus.py null /root/testdata/sf0.01 /tmp/sf_null
    python tools/check_oracle.py /tmp/sf_null

Regimes (the same recipes the pytest regressions use —
tests/test_null_injection.py / test_skew_extremes.py /
test_unicode_parity.py — at whatever SF you point at):

- ``null``    every 7th row carries NULLs in its nullable value/text
              columns (3VL comparisons, NULL group keys, try_divide)
- ``skew``    every document identical, every event from ONE user of
              ONE type, every embedding identical (hot keys, capped
              LSH buckets, rank ties)
- ``unicode`` multilingual + whitespace-class + trim-charset edge
              texts rotated through both text edges
- ``degenerate-history`` every per-user events series takes one of the
              hard time-series shapes the Python-port parity fixture
              encodes (tests/test_python_ports.py): constant value
              (std = 0 → z ≡ 0), all-null series, zero-heavy series
              with 0 → nonzero steps (the pct_change ±inf / prev == 0
              guard), singleton users (below every n-obs guard), and
              gappy alternating-null series (pad-fill / dropna paths)
- ``hostile-keys`` grouping/partition-key columns carry the two shapes
              that hid real bugs from the gate for eight rounds
              (VERDICT r9): values embedding ``: / = % #`` (the %XX
              partition-directory escaping class — the escaped-purge
              bug) and non-ASCII-adjacent digit runs like ``é1234é``
              (the Java-vs-RE2 word-boundary class — the PII ``\\b``
              bug). Texts keep their original content and gain a
              hostile suffix, so dedup/similarity queries stay
              meaningful.
- ``tiny``    every table cut to its first 3 rows (the vanishing
              corpus): single-element windows/groups, empty join
              sides, ANN corpora smaller than k, zero-pair candidate
              stages, stddev/regression aggregates over 1-2 values,
              near-empty streaming drains.
- ``empty``   every table cut to ZERO rows, schema preserved: the
              dead-feed case. Pins zero-row scans, global aggregates
              over nothing, empty grouping sets (found the ANSI
              grand-total-row divergence in rollup_time's oracle),
              and empty streaming sources end-to-end.
- ``nonfinite`` NaN / +Inf / -Inf injected into ``events.value``:
              certifies the finite_or_null discipline (NaN/Inf -> NULL
              before integer-cents casts and quantiles) and that both
              engines' documented NaN ordering ("equal to itself,
              greater than everything") agrees through sums, windows,
              BETWEEN filters, and streaming state. Magnitude attacks
              (1e300) are deliberately NOT included: the integer-cents
              cast contract is a LOUD ANSI overflow abort in both
              engines, not a silent value, so they crash the gate by
              design.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# THE table list comes from the engine package's dependency-free
# ``tableset`` module — check_oracle.py (the downstream consumer of
# mutated corpora) registers views for exactly this list, so a
# hardcoded copy here would let a new table silently fall out of
# every regime corpus. Importing tableset (not queries.common) keeps
# this tool pyarrow-only: no pyspark import cost, and a broken
# pyspark install can't break corpus mutation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dbt_economic_indicators_eu_spark.tableset import TABLES  # noqa: E402

NULLABLE = {
    "documents": ["text", "lang", "source"],
    # ts included since round 9: NULL event times exercise the
    # engines' divergent NULL sort order (Spark ASC first, DuckDB
    # last) through every window/session/transition query — the
    # queries declare drop-NULL-ts semantics and mirror it in their
    # oracles, matching Spark's own window()/session_window() rules
    "events": ["value", "props", "event_type", "ts"],
    "orders": ["o_orderstatus", "o_orderpriority", "o_totalprice"],
    "customer": ["c_mktsegment", "c_name", "c_acctbal"],
    "lineitem": ["l_returnflag", "l_discount"],
    "part": ["p_type", "p_brand"],
    "supplier": ["s_name"],
}

UNI = [
    "café naïve résumé coöperate",
    "中文 文本 数据 处理 系统",
    "ΣΊΣΥΦΟΣ sigma ΤΕΛΟΣ",
    "İstanbul I i İ ı",
    "emoji 😀 🌍 test 🎉 done",
    "combining é vs precomposed é",
    "ß STRASSE straße",
    "मिश्रित देवनागरी पाठ",
    # \x0b: in Java-regex \s but NOT RE2 \s — explicit whitespace class
    "vertical\x0btab\x0b\x0bsplit mixed \x0b ws",
    "tab\tnewline\nformfeed\fcarriage\rmix",
    # trim-charset pins: only 0x20 strips at text edges in all engines
    " nbsp leading and trailing ",
    " line separator edge ",
    "\x1cfile separator edge\x1f",
    "　ideographic space edge　",
]

SKEW_TEXT = "the same boilerplate text repeated across every document in the corpus"


def mutate_null(tbl: pa.Table, name: str) -> pa.Table:
    cols = [c for c in NULLABLE.get(name, []) if c in tbl.column_names]
    if not cols:
        return tbl
    n = tbl.num_rows
    mask = pa.array([(i % 7) == 3 for i in range(n)])
    for c in cols:
        arr = tbl.column(c)
        new = pc.if_else(mask, pa.nulls(n, arr.type), arr.combine_chunks())
        tbl = tbl.set_column(tbl.column_names.index(c), c, new)
    return tbl


def mutate_skew(tbl: pa.Table, name: str) -> pa.Table:
    n = tbl.num_rows
    if name == "documents":
        return (
            tbl.set_column(tbl.column_names.index("text"), "text", pa.array([SKEW_TEXT] * n))
            .set_column(tbl.column_names.index("lang"), "lang", pa.array(["en"] * n))
            .set_column(tbl.column_names.index("source"), "source", pa.array(["src0"] * n))
            .set_column(
                tbl.column_names.index("n_chars"), "n_chars",
                pa.array([len(SKEW_TEXT)] * n, pa.int64()),
            )
        )
    if name == "events":
        return (
            tbl.set_column(
                tbl.column_names.index("user_id"), "user_id", pa.array([1] * n, pa.int64())
            ).set_column(
                tbl.column_names.index("event_type"), "event_type", pa.array(["click"] * n)
            )
        )
    if name == "embeddings":
        one = tbl.column("embedding").combine_chunks()[0]
        return tbl.set_column(
            tbl.column_names.index("embedding"), "embedding",
            pa.array([one.as_py()] * n, tbl.schema.field("embedding").type),
        )
    return tbl


def mutate_unicode(tbl: pa.Table, name: str) -> pa.Table:
    if name != "documents":
        return tbl
    n = tbl.num_rows
    # rotate each edge-case text through BOTH text positions (leading
    # and trailing edge chars)
    texts = [f"{UNI[i % len(UNI)]} doc{i} {UNI[(i + 3) % len(UNI)]}" for i in range(n)]
    return tbl.set_column(
        tbl.column_names.index("text"), "text", pa.array(texts)
    ).set_column(
        tbl.column_names.index("n_chars"), "n_chars",
        pa.array([len(x) for x in texts], pa.int64()),
    )


def mutate_degenerate_history(tbl: pa.Table, name: str) -> pa.Table:
    """Per-user series shapes keyed by ``user_id % 5`` (the WHOLE series
    takes the shape — a constant series mixed with live rows would not
    hit the std = 0 branch): 0 constant, 1 all-null, 2 zero-heavy with
    occasional 0 → 7.5 steps, 3 singleton users (every event its own
    user — sub-guard history length), 4 alternating nulls. Values stay
    2-decimal so the anomaly query's quartile-rounding contract
    (queries/ml.py r6 note) keeps holding."""
    if name != "events":
        return tbl
    import numpy as np

    df = tbl.to_pandas()
    uid = df["user_id"].fillna(-1).astype("int64")
    eid = df["event_id"].astype("int64")
    cls = (uid % 5).where(uid >= 0, -1)
    val = df["value"].astype("float64")
    val = val.mask(cls == 0, 42.0)
    val = val.mask(cls == 1, np.nan)
    val = val.mask(cls == 2, np.where(eid % 7 == 0, 7.5, 0.0))
    val = val.mask((cls == 4) & (eid % 2 == 0), np.nan)
    df["value"] = val
    # singleton ids rebase ABOVE the corpus's max user_id: a fixed
    # offset could collide with a live user at a larger SF, merging a
    # reassigned row into that user's series and breaking the
    # whole-series-shape invariant. The new ids stay ≡ 3 (mod 5) so
    # ``user_id % 5`` still recovers the class after mutation (the
    # regression test's shape audit depends on this).
    singleton_base = int(uid.max()) + 1 if len(uid) else 0
    singleton_base += (3 - singleton_base % 5) % 5
    df.loc[cls == 3, "user_id"] = singleton_base + 5 * eid[cls == 3]
    return pa.Table.from_pandas(df, schema=tbl.schema, preserve_index=False)


# Key values embedding every character class Spark %XX-escapes in
# 'col=value' partition directories (':' '/' '=' '%' '#'), plus
# non-ASCII-adjacent digit runs. Cycled by row index — deterministic.
HOSTILE_KEYS = [
    "web:crawl/2024",
    "s3://bucket/path=x",
    "100%organic#frag",
    "a=b:c/d%e#f",
    "é1234é",
    "key=value",
]

# Text suffixes putting digit runs (SSN/phone/email shapes included)
# directly against non-ASCII letters — the boundary class where Java
# regex \b (Unicode-aware) and RE2 \b (ASCII) disagree.
HOSTILE_TEXT = [
    "contact é1234é and ü5678ü runs",
    "ssn 123-45-6789 beside é123-45-6789é",
    "mail a@b.cé phone +49 1234 567890é end",
    "path /var/x=1:2%33#4 token №777",
    "straße9876 digits7890ß adjacent",
]


def mutate_hostile_keys(tbl: pa.Table, name: str) -> pa.Table:
    n = tbl.num_rows

    def cycle(values: list[str]) -> pa.Array:
        return pa.array([values[i % len(values)] for i in range(n)])

    if name == "documents":
        texts = [
            f"{t} {HOSTILE_TEXT[i % len(HOSTILE_TEXT)]}" if t is not None else t
            for i, t in enumerate(tbl.column("text").to_pylist())
        ]
        return (
            tbl.set_column(tbl.column_names.index("text"), "text", pa.array(texts))
            .set_column(
                tbl.column_names.index("source"), "source", cycle(HOSTILE_KEYS)
            )
            .set_column(
                tbl.column_names.index("n_chars"), "n_chars",
                pa.array(
                    [len(t) if t is not None else None for t in texts], pa.int64()
                ),
            )
        )
    if name == "events":
        return tbl.set_column(
            tbl.column_names.index("event_type"), "event_type", cycle(HOSTILE_KEYS)
        )
    if name == "customer":
        return tbl.set_column(
            tbl.column_names.index("c_mktsegment"), "c_mktsegment",
            cycle(HOSTILE_KEYS),
        )
    return tbl


def mutate_tiny(tbl: pa.Table, name: str) -> pa.Table:
    """Cut every table to its first 3 rows (deterministic head slice).
    The vanishing-corpus regime: single-element windows and groups,
    empty join/anti-join sides, ANN corpora smaller than k, candidate
    stages that produce zero pairs, aggregates over 1-2 values
    (stddev_samp -> NULL, regression slopes -> NULL), and streaming
    drains with almost no events. Referential integrity is deliberately
    NOT preserved (independent head slices orphan FKs) — both engines
    see the same orphans, and the relationship tests are violation
    queries that must agree on them."""
    return tbl.slice(0, 3)


def mutate_nonfinite(tbl: pa.Table, name: str) -> pa.Table:
    """Every 13th events.value becomes NaN, every 17th +Inf, every
    19th -Inf (first match wins; other rows keep their value). Only
    ``events.value`` is mutated: it is the one measure column whose
    consumers declare non-finite semantics (finite_or_null); money
    columns carry a loud-overflow cast contract instead."""
    if name != "events":
        return tbl
    vals = tbl.column("value").to_pylist()
    out = []
    for i, v in enumerate(vals):
        if i % 13 == 3:
            out.append(float("nan"))
        elif i % 17 == 5:
            out.append(float("inf"))
        elif i % 19 == 7:
            out.append(float("-inf"))
        else:
            out.append(v)
    return tbl.set_column(
        tbl.column_names.index("value"), "value", pa.array(out, pa.float64())
    )


def mutate_empty(tbl: pa.Table, name: str) -> pa.Table:
    """Cut every table to ZERO rows (schema preserved) — the dead-feed
    case: zero-row scans, global aggregates over nothing, empty
    grouping sets (ANSI emits a grand-total row over zero input while
    Spark's rollup emits nothing — the divergence this regime found in
    rollup_time, now pinned in its oracle twin), and streaming drains
    whose source never produces a batch."""
    return tbl.slice(0, 0)


REGIMES = {
    "null": mutate_null,
    "skew": mutate_skew,
    "unicode": mutate_unicode,
    "degenerate-history": mutate_degenerate_history,
    "hostile-keys": mutate_hostile_keys,
    "tiny": mutate_tiny,
    "nonfinite": mutate_nonfinite,
    "empty": mutate_empty,
}


def build(regime: str, src: str, dst: str) -> None:
    fn = REGIMES[regime]
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        pq.write_table(fn(pq.read_table(f"{src}/{t}.parquet"), t), f"{dst}/{t}.parquet")


def main() -> int:
    if len(sys.argv) != 4 or sys.argv[1] not in REGIMES:
        print(__doc__)
        return 2
    regime, src, dst = sys.argv[1:4]
    build(regime, src, dst)
    print(f"built {regime} corpus at {dst} from {src}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
