from geomesa_ray.sources.fixtures import (
    ensure_fixtures,
    fixture_dir_for,
    gen_images_table,
    gen_regions_table,
    gen_probes_table,
    splitmix64,
    DTG_BASE_S,
    DTG_SPAN_S,
)
from geomesa_ray.sources.io import read_images, read_table

__all__ = [
    "ensure_fixtures",
    "fixture_dir_for",
    "gen_images_table",
    "gen_regions_table",
    "gen_probes_table",
    "splitmix64",
    "DTG_BASE_S",
    "DTG_SPAN_S",
    "read_images",
    "read_table",
]
