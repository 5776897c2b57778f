"""As-of (nearest-prior) join — an operator Spark's DataFrame API lacks
natively, re-expressed as a single-shuffle window pass.

Semantics: for each left row, attach the value columns of the right row
with the greatest ``right_ts <= left_ts`` (backward direction, inclusive)
within the same key group — the standard time-series enrichment join
(pandas ``merge_asof``, DuckDB ``ASOF JOIN``, kdb ``aj``). The economic
-indicator analogue: attach the most recent published indicator reading
to every observation date.

Scale design (the whole point of this shape):

- **Union + window, not a range join.** A naive implementation joins on
  key with ``l.ts >= r.ts`` and keeps the max — a quadratic blow-up per
  key. Instead both sides are tagged and unioned, sorted once per key by
  ``(ts, side)``, and the right payload is carried forward with
  ``last(ignorenulls)`` over an unbounded-preceding window. Cost: ONE
  shuffle of |left|+|right| rows on the key, linear scan per partition —
  the same plan shape Spark uses for any window aggregate, so it
  inherits spill handling and AQE skew splitting.
- **Row atomicity.** The right payload travels as a single struct
  column, so all value columns come from the SAME matched right row
  (per-column ``last(ignorenulls)`` could mix rows when a value column
  is legitimately null).
- **Tie discipline.** Right rows sort before left rows at equal
  timestamps (side 0 < 1), making the backward join inclusive. Rows
  that tie on ``(key, right_ts)`` are the caller's job to pre-aggregate
  (e.g. ``max_by``) — the operator asserts nothing about which wins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_VAL = "__asof_val"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    values: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """Enrich ``left`` with ``values`` from the as-of matching row of
    ``right``. Output has all left columns plus one column per entry in
    ``values`` (null when no right row qualifies).

    ``direction='backward'`` matches the greatest ``right_ts <=
    left_ts``; ``'forward'`` the smallest ``right_ts >= left_ts``.
    Value column names must not collide with left column names.

    NULL timestamps follow pandas ``merge_asof`` / DuckDB ``ASOF``
    semantics: a NULL ``right_ts`` row never matches anything (without
    the filter below it would sort NULLS-FIRST ahead of every real row
    and ``last(ignorenulls)`` would propagate its payload to every
    otherwise-unmatched left row in the key group), and a NULL
    ``left_ts`` row matches nothing (guarded explicitly — under the
    forward scan's DESC order NULLs sort LAST and would otherwise
    inherit the smallest ``right_ts`` payload).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right = right.filter(F.col(right_ts).isNotNull())
    on = list(on)
    # NULL join keys never match — SQL equality semantics, same as
    # DuckDB ASOF JOIN's ON predicate. Window.partitionBy would
    # otherwise group NULL keys TOGETHER and as-of-match a NULL-key
    # left row to a NULL-key right row. Dropping NULL-key right rows
    # implements it: NULL-key left rows land in a partition with no
    # right rows and pass through unmatched (LEFT-join shape).
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    values = list(values)
    clash = set(values) & set(left.columns)
    if clash:
        raise ValueError(f"value columns collide with left columns: {sorted(clash)}")
    # reserved internals: an input column with one of these names would
    # duplicate it in l_tagged/r_tagged and make the window/filter
    # references ambiguous (or silently bind the wrong column)
    reserved = {_TS, _SIDE, _VAL} & set(left.columns + right.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with asof_join internals: {sorted(reserved)}"
        )

    left_payload = [c for c in left.columns if c not in on]
    val_struct = F.struct(*[F.col(c) for c in values])
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *left_payload,
        F.lit(None).cast(
            right.select(val_struct.alias(_VAL)).schema[_VAL].dataType
        ).alias(_VAL),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        val_struct.alias(_VAL),
    )

    u = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        order = [F.col(_TS).asc(), F.col(_SIDE).asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    else:  # forward: scan from the future backwards; right still wins ties
        order = [F.col(_TS).desc(), F.col(_SIDE).asc()]
        frame = (Window.unboundedPreceding, Window.currentRow)
    w = Window.partitionBy(*on).orderBy(*order).rowsBetween(*frame)

    filled = u.withColumn(_VAL, F.last(_VAL, ignorenulls=True).over(w))
    no_match_guard = F.col(_TS).isNotNull()  # NULL left_ts: no match
    return filled.filter(F.col(_SIDE) == 1).select(
        *on,
        *left_payload,
        *[
            F.when(no_match_guard, F.col(f"{_VAL}.{c}")).alias(c)
            for c in values
        ],
    )
