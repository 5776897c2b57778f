"""Property-based pins of the custom operators against INDEPENDENT
references (hypothesis over random inputs):

- ``asof_join`` vs pandas ``merge_asof`` — the industry-reference
  as-of semantics, including NULL timestamps and boundary ties;
- ``range_join`` vs a brute-force filter join — bin bucketing must be
  invisible in the result for any bin size;
- ``money4_sum_r2`` vs exact ``fractions.Fraction`` arithmetic — the
  integer-cents pipeline must equal true-decimal half-up rounding for
  ANY 4-decimal inputs, not just the engineered boundary cases of
  ``test_twin_pins.py``;
- ``candidate_pairs`` vs the quadratic per-bucket reference on a
  randomized skewed bucket assignment — exact pair set, multiplicity
  1, and exact hot-bucket drop accounting.

The oracle gate checks Spark-vs-DuckDB agreement; these check that the
AGREED answer is the RIGHT answer.
"""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from dbt_economic_indicators_eu_spark.operators.asof import asof_join
from dbt_economic_indicators_eu_spark.operators.rangejoin import range_join
from dbt_economic_indicators_eu_spark.queries.common import money4_sum_r2

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_EPOCH = dt.datetime(2024, 1, 1)


def _t(minutes):
    return None if minutes is None else _EPOCH + dt.timedelta(minutes=int(minutes))


# right side: unique (key, ts) rows — tie discipline on the right is the
# caller's pre-aggregation job, so the property holds on the operator's
# declared input domain. NULL ts allowed on both sides (a NULL right_ts
# row must match NOTHING — the poison-row guard).
ts_strategy = st.one_of(st.none(), st.integers(0, 30))
right_strategy = st.dictionaries(
    st.tuples(st.integers(0, 2), st.one_of(st.none(), st.integers(0, 30))),
    st.floats(0, 100, allow_nan=False, width=32),
    max_size=8,
).map(lambda d: [(k, m, round(v, 2)) for (k, m), v in d.items()])
left_strategy = st.lists(
    st.tuples(st.integers(0, 2), ts_strategy), min_size=1, max_size=10
)


@settings(**_SETTINGS)
@given(left=left_strategy, right=right_strategy, forward=st.booleans())
def test_asof_matches_pandas_merge_asof(spark, left, right, forward):
    lrows = [(k, _t(m), i) for i, (k, m) in enumerate(left)]
    rrows = [(k, _t(m), v) for k, m, v in right]
    ldf = spark.createDataFrame(lrows, "key bigint, lts timestamp, lid bigint")
    rdf = spark.createDataFrame(
        rrows if rrows else [(0, _t(0), 0.0)],
        "key bigint, rts timestamp, px double",
    )
    if not rrows:
        rdf = rdf.filter(F.lit(False))
    direction = "forward" if forward else "backward"
    out_rows = asof_join(
        ldf, rdf, on=["key"], left_ts="lts", right_ts="rts",
        values=["px"], direction=direction,
    ).collect()
    # cardinality contract FIRST: exactly one output row per left row
    # (a dict alone would silently collapse duplicate emissions)
    assert len(out_rows) == len(lrows)
    assert len({r.lid for r in out_rows}) == len(lrows)
    got = {r.lid: r.px for r in out_rows}

    lpd = pd.DataFrame(lrows, columns=["key", "lts", "lid"]).sort_values("lts")
    rpd = pd.DataFrame(rrows, columns=["key", "rts", "px"]).sort_values("rts")
    rpd = rpd[rpd.rts.notna()]  # NULL right_ts never matches (reference side)
    # pandas merge_asof rejects NULL ts on the left — match them to no
    # result manually (the semantics asof_join pins)
    null_left = lpd[lpd.lts.isna()]
    lpd = lpd[lpd.lts.notna()]
    if len(lpd) and len(rpd):
        m = pd.merge_asof(
            lpd, rpd, left_on="lts", right_on="rts", by="key",
            direction=direction, allow_exact_matches=True,
        )
        want = {int(r.lid): (None if pd.isna(r.px) else float(r.px)) for r in m.itertuples()}
    else:
        want = {int(r.lid): None for r in lpd.itertuples()}
    want.update({int(r.lid): None for r in null_left.itertuples()})
    got_norm = {k: (None if v is None else round(v, 6)) for k, v in got.items()}
    want_norm = {k: (None if v is None else round(v, 6)) for k, v in want.items()}
    assert got_norm == want_norm


interval_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 20)),  # (start_min, length)
    min_size=0, max_size=6,
)
fact_strategy = st.lists(st.integers(0, 70), min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(intervals=interval_strategy, facts=fact_strategy, bin_minutes=st.sampled_from([1, 5, 60]))
def test_range_join_equals_brute_force(spark, intervals, facts, bin_minutes):
    irows = [(i, _t(s), _t(s + ln)) for i, (s, ln) in enumerate(intervals)]
    frows = [(i, _t(m)) for i, m in enumerate(facts)]
    idf = spark.createDataFrame(
        irows if irows else [(0, _t(0), _t(1))], "wid bigint, ws timestamp, we timestamp"
    )
    if not irows:
        idf = idf.filter(F.lit(False))
    fdf = spark.createDataFrame(
        frows if frows else [(0, _t(0))], "fid bigint, fts timestamp"
    )
    if not frows:
        fdf = fdf.filter(F.lit(False))
    got = sorted(
        (r.fid, r.wid)
        for r in range_join(
            fdf, "fts", idf, "ws", "we", bin_seconds=bin_minutes * 60
        ).collect()
    )
    # brute force: half-open [ws, we). Compare as sorted LISTS, not
    # sets — the operator's documented invariant is "a pair meets in
    # exactly one bin, no post-join dedup", and a multi-bin duplicate
    # emission regression must fail here, not be collapsed away.
    want = sorted(
        (fid, wid)
        for fid, fm in enumerate(facts)
        for wid, (s, ln) in enumerate(intervals)
        if s <= fm < s + ln
    )
    assert got == want


money_strategy = st.lists(
    st.integers(0, 10**9).map(lambda n: n / 10000.0),  # exact 4-decimal values
    min_size=1, max_size=20,
)


@settings(**_SETTINGS)
@given(values=money_strategy)
def test_money4_sum_equals_exact_decimal_halfup(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(money4_sum_r2(F.col("x")).alias("s")).collect()[0].s
    # exact reference: Fraction arithmetic on the true 4-decimal values,
    # half-up to cents
    total = sum(Fraction(round(v * 10000)) for v in values) / 10000
    cents = (total * 100 + Fraction(1, 2)).__floor__()
    want = float(Fraction(cents, 100))
    assert got == pytest.approx(want, abs=0)


def test_candidate_pairs_equal_brute_force(spark):
    """operators/banding.candidate_pairs == the quadratic reference on
    randomized bucket assignments: exactly the distinct ordered pairs
    of ids sharing a bucket whose occupancy is within the cap — with
    multiplicity 1 (a pair sharing several buckets emits once), and
    drop accounting equal to the over-cap buckets. Pins the dedup core
    the minhash/simhash/embedding paths all ride."""
    import itertools
    import random

    from pyspark.sql import Observation

    from dbt_economic_indicators_eu_spark.operators.banding import candidate_pairs

    rng = random.Random(7)
    cap = 8
    rows = []
    for i in range(300):
        # skewed bucket draw: a few hot buckets exceed the cap
        b = int(rng.random() ** 3 * 20)
        rows.append((rng.randrange(3), f"b{b}", i))
    banded = spark.createDataFrame(rows, "band_idx int, band_hash string, doc_id long")

    obs = Observation("prop_pairs")
    got = candidate_pairs(
        banded, ["band_idx", "band_hash"], "doc_id", "a", "b",
        cap=cap, observation=obs,
    ).collect()
    got_pairs = [(r.a, r.b) for r in got]

    buckets: dict[tuple, set[int]] = {}
    for band, bh, i in rows:
        buckets.setdefault((band, bh), set()).add(i)
    expected, dropped_buckets, dropped_ids = set(), 0, 0
    for members in buckets.values():
        if len(members) > cap:
            dropped_buckets += 1
            dropped_ids += len(members)
            continue
        for x, y in itertools.combinations(sorted(members), 2):
            expected.add((x, y))

    assert len(got_pairs) == len(set(got_pairs)), "duplicate pair emitted"
    assert set(got_pairs) == expected
    assert obs.get["hot_buckets_dropped"] == dropped_buckets
    assert obs.get["hot_ids_dropped"] == dropped_ids
