from .expressions import (
    month_start,
    null_safe_pct_change,
    rank_within_group,
    rolling_average,
    safe_divide,
    surrogate_key,
    yoy_change,
)

__all__ = [
    "surrogate_key",
    "safe_divide",
    "yoy_change",
    "rolling_average",
    "rank_within_group",
    "null_safe_pct_change",
    "month_start",
]
