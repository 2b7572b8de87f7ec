from geomesa_ray.geom.kernels import (
    Polygon,
    points_in_polygon,
    points_in_bbox,
    haversine_m,
    planar_sq_deg,
    normalize_lon,
    split_idl_polygon,
)
from geomesa_ray.geom.wkt import parse_wkt_polygon, polygon_to_wkt

__all__ = [
    "Polygon",
    "points_in_polygon",
    "points_in_bbox",
    "haversine_m",
    "planar_sq_deg",
    "normalize_lon",
    "split_idl_polygon",
    "parse_wkt_polygon",
    "polygon_to_wkt",
]
