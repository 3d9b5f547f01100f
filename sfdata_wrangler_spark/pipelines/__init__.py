from .cascade import run_cascade
from .clipper import infer_linked_trips
from .demand import (
    annual_to_monthly_step,
    cpi_deflate,
    crosswalk_rollup,
    scaling_factor_join,
)
from .expansion import clean_avl, expand_and_weight
from .mapmatch import Link, Network, match_trips
from .reports import performance_panel, route_profile
from .taxi import aggregate_link_times, geofence, identify_gps_trips

__all__ = [
    "run_cascade",
    "infer_linked_trips",
    "annual_to_monthly_step",
    "cpi_deflate",
    "crosswalk_rollup",
    "scaling_factor_join",
    "clean_avl",
    "expand_and_weight",
    "Link",
    "Network",
    "match_trips",
    "performance_panel",
    "route_profile",
    "aggregate_link_times",
    "geofence",
    "identify_gps_trips",
]
