from geomesa_ray.curve.zorder import (
    split21,
    combine21,
    split32,
    combine32,
    z3_encode,
    z3_decode,
    z2_encode,
    z2_decode,
)
from geomesa_ray.curve.sfc import (
    Z3SFC,
    Z2Grid,
    SECONDS_PER_WEEK,
    lonlat_to_xy,
    time_to_week_t,
    merge_ranges,
    zranges_3d,
    zranges_2d,
)

__all__ = [
    "split21",
    "combine21",
    "split32",
    "combine32",
    "z3_encode",
    "z3_decode",
    "z2_encode",
    "z2_decode",
    "Z3SFC",
    "Z2Grid",
    "SECONDS_PER_WEEK",
    "lonlat_to_xy",
    "time_to_week_t",
    "merge_ranges",
    "zranges_3d",
    "zranges_2d",
]
