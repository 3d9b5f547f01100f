from .fixed_width import ColSpec, read_fixed_width
from .gtfs import build_trip_stops, read_gtfs_feed
from .lake import write_partitioned

__all__ = [
    "ColSpec",
    "read_fixed_width",
    "build_trip_stops",
    "read_gtfs_feed",
    "write_partitioned",
]
