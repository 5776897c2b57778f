"""Interval (range) join — point-in-interval matching without a
nested-loop join.

Spark plans a raw inequality join (``fact.ts BETWEEN i.start AND
i.end``) as BroadcastNestedLoopJoin: every fact row is tested against
every interval — O(|facts| * |intervals|), catastrophic at scale. The
bin-bucketed rewrite turns it into an equi-join:

1. Each interval is exploded into the fixed-width time bins it covers
   (``sequence`` of bin ids — JVM-side, no UDF).
2. Each fact row computes its single bin id (a projection, no shuffle).
3. Bins join hash-equi (shuffle or broadcast), then the exact
   containment predicate filters within the bin.

Each fact lands in exactly one bin, so a (fact, interval) pair meets at
most once — no post-join dedup. Cost: |facts| + sum(interval_len /
bin_width) join inputs; pick ``bin_seconds`` close to the typical
interval length so intervals explode into ~1-2 bins. Skewed bins (a bin
covered by many intervals) are ordinary join skew — AQE's skew-join
splitting applies, unlike the nested-loop plan which has no such rescue.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def _bin_of(ts: Column, bin_seconds: int) -> Column:
    # epoch_micros is tz-inert for DATE and TIMESTAMP_NTZ inputs
    # (calendar-field arithmetic — unlike unix_micros, which rejects
    # NTZ). A TIMESTAMP (LTZ) input is first RENDERED in the session
    # zone by the cast below, so LTZ callers must pin the zone they
    # mean; NTZ/DATE callers (all engine queries) need nothing.
    from ..queries.common import epoch_micros

    micros = epoch_micros(ts.cast("timestamp_ntz"))
    # never floor(double /): bigint/int division promotes to double,
    # which rounds |micros| >= 2^53 (past ~year 2255 — e.g. a
    # 9999-12-31 open-interval sentinel) by up to 16+ µs, so a
    # boundary-adjacent ts can floor into the WRONG bin and silently
    # drop matching pairs (same int64-exactness rule as
    # queries/common.py:legacy_nanos_to_ntz). Instead: subtract the
    # exact int64 floor-remainder (Column % is integral for bigint),
    # leaving an exact multiple k*width; its double image errs by
    # < 1024 absolute (< width/2 for any width >= 1s), so ROUND of the
    # quotient — never floor — recovers k exactly for the full int64
    # domain.
    width = bin_seconds * 1_000_000
    exact_multiple = micros - F.pmod(micros, F.lit(width))
    return F.round(exact_multiple / F.lit(width)).cast("long")


def range_join(
    facts: DataFrame,
    fact_ts: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Inner-join ``facts`` to every interval with ``start <= ts < end``
    (half-open). Output columns: all fact columns + all interval
    columns; names must not collide (caller renames).

    ``broadcast_intervals=True`` broadcasts the exploded interval side —
    right whenever intervals fit in memory (the common case: intervals
    are a dimension, facts are the 100 TB side).
    """
    clash = set(facts.columns) & set(intervals.columns)
    if clash:
        raise ValueError(f"column collision between facts and intervals: {sorted(clash)}")
    # reserved internal: withColumn would silently OVERWRITE a user
    # column of this name and drop(_BIN) would then delete the user's
    # data from the output — fail loudly like asof_join's guard
    reserved = {_BIN} & set(facts.columns + intervals.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with range_join internals: {sorted(reserved)}"
        )

    f_binned = facts.withColumn(_BIN, _bin_of(F.col(fact_ts), bin_seconds))
    i_binned = (
        intervals.filter(F.col(start_col) < F.col(end_col))
        .withColumn(
            _BIN,
            F.explode(
                F.sequence(
                    _bin_of(F.col(start_col), bin_seconds),
                    _bin_of(
                        F.timestamp_add(
                            "MICROSECOND", F.lit(-1), F.col(end_col).cast("timestamp_ntz")
                        ),
                        bin_seconds,
                    ),
                )
            ),
        )
    )
    if broadcast_intervals:
        i_binned = F.broadcast(i_binned)
    return (
        f_binned.join(i_binned, _BIN)
        .filter((F.col(fact_ts) >= F.col(start_col)) & (F.col(fact_ts) < F.col(end_col)))
        .drop(_BIN)
    )
