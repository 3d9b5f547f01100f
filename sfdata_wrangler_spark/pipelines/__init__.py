from .clipper import infer_linked_trips
from .expansion import expand_and_weight
from .taxi import aggregate_link_times, identify_gps_trips

__all__ = [
    "infer_linked_trips",
    "expand_and_weight",
    "aggregate_link_times",
    "identify_gps_trips",
]
