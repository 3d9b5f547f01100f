from .aggregate import AggRule, aggregate_records, update_speeds
from .windows import (
    dedup_by_order,
    ffill,
    bfill,
    headway_minutes,
    interpolate_monthly,
    lag_delta_minutes,
    running_sum,
    sessionize,
    trend_diff,
)
from .weighting import calc_weights
from .imputation import impute_from_prior_month
from .interval_lookup import interval_lookup, missing_keys
from .crosstab import crosstab_with_margins

__all__ = [
    "AggRule",
    "aggregate_records",
    "update_speeds",
    "dedup_by_order",
    "ffill",
    "bfill",
    "headway_minutes",
    "interpolate_monthly",
    "lag_delta_minutes",
    "running_sum",
    "sessionize",
    "trend_diff",
    "calc_weights",
    "impute_from_prior_month",
    "interval_lookup",
    "missing_keys",
    "crosstab_with_margins",
]
