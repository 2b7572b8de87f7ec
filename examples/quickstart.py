#!/usr/bin/env python
"""Quickstart: the engine's main surfaces in one script.

Run: python examples/quickstart.py
"""

import os
import sys
import tempfile

import numpy as np
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ray.init(address="local", num_cpus=8, include_dashboard=False,
         log_to_driver=False)

from geomesa_ray.engine import GeoMesaRayEngine  # noqa: E402
from geomesa_ray.planner import QuerySpec, Strategy  # noqa: E402
from geomesa_ray.pipelines.scan import SpatialQuery  # noqa: E402
from geomesa_ray.sources.fixtures import ensure_fixtures  # noqa: E402

# 1. A corpus: image+caption parquet with phash-derived geometry
corpus = ensure_fixtures("/root/testdata/sf0.001")
eng = GeoMesaRayEngine(corpus)

# 2. Ingest into the spatial store (cell-bucketed, sorted, manifested);
# include the attributes CQL queries will reference
stats = eng.ingest_store(tempfile.mkdtemp(prefix="quickstart_store_"),
                         columns=["image_id", "phash", "caption", "fmt"])
print(f"ingested {stats['rows']} rows into {stats['partitions']} partitions "
      f"(skew {stats['skew_factor']:.2f})")

# 3. Strategy-decided queries (record / attribute / z3 / st)
print("by ids:", eng.query(QuerySpec(ids=["img00000010", "img00000042"]))
      .count(), "rows")
print("bbox+time:",
      eng.query(QuerySpec(bbox=(-10, 25, -5, 30),
                          interval_s=(1704067200, 1704067200 + 7 * 86400)))
      .count(), "rows  (strategy:",
      Strategy.Z3.value + ", store-pruned + rowgroup-pushdown)")

# 4. Analytic processes
import pyarrow.parquet as pq  # noqa: E402

regions = pq.read_table(f"{corpus}/regions.parquet")
print("PIP join:", eng.pip_join(regions).count(), "pairs")
print("kNN (indexed, geodesic):", len(eng.knn_indexed(metric="haversine")), "rows")
print("density grid:", eng.density().count(), "pixels")
print("tiles:", eng.tiles(level=8).count(), "assignments")

# 5. Proximity + sorted export
print("within 300 km of (10, 45):",
      eng.proximity(np.array([10.0]), np.array([45.0]), ["p"], 3e5).count())
print("sorted export:",
      eng.sorted_export(SpatialQuery(-60, 60, -60, 60)).count(), "rows")

# 6. Arbitrary geometry: polygon-with-holes / MULTIPOLYGON / corridor
from geomesa_ray.pipelines.pip_join import pip_join  # noqa: E402
from geomesa_ray.sources.fixtures import gen_complex_regions_table  # noqa: E402

print("complex-geometry join:",
      pip_join(corpus, regions=gen_complex_regions_table(),
               kinds=("poly", "multipoly", "line")).count(), "pairs")

# 6b. CQL — planner subset AND the full boolean grammar
print("CQL bbox+time:",
      eng.cql("BBOX(geom, -10, -5, 25, 30) AND "
              "dtg DURING 2024-01-01T00:00:00Z/2024-01-08T00:00:00Z")
      .count(), "rows")
print("CQL boolean tree:",
      eng.cql("(BBOX(geom, -10, -5, 25, 30) OR BBOX(geom, 5, 10, 40, 45)) "
              "AND NOT fmt = 'png' AND phash BETWEEN -1e19 AND 0")
      .count(), "rows")

# 7. Versioned snapshots: append, then time-travel to the prior state
from geomesa_ray.sources.fixtures import gen_images_table_range  # noqa: E402
from geomesa_ray.state.store import (  # noqa: E402
    append_store,
    read_store,
    snapshot_store,
    write_store,
)

snap_store = tempfile.mkdtemp(prefix="quickstart_snap_")
write_store(corpus, snap_store)
v1 = snapshot_store(snap_store)
append_store(snap_store, gen_images_table_range(6000, 25))
print(f"store now {read_store(snap_store).count()} rows; "
      f"as of v{v1}: {read_store(snap_store, version=v1).count()} rows")

# 8. Continuous ingest: a consumer tails a landing directory
import pyarrow.parquet as _pq  # noqa: E402

from geomesa_ray.state.consumer import continuous_ingest  # noqa: E402

landing = tempfile.mkdtemp(prefix="quickstart_landing_")
_pq.write_table(gen_images_table_range(6025, 25),
                os.path.join(landing, "batch000.parquet"))
out = continuous_ingest(landing, snap_store, poll_interval_s=0.1,
                        max_polls=1)
print(f"consumer applied {out['files_applied']} files "
      f"({out['rows_applied']} rows); store now "
      f"{read_store(snap_store).count()} rows")

# 9. Visibility labels: secured rows filter by authorizations
import pyarrow as pa  # noqa: E402

from geomesa_ray.sources.fixtures import gen_images_table  # noqa: E402

sec_fix = tempfile.mkdtemp(prefix="quickstart_sec_")
t = gen_images_table(1000)
t = t.append_column("vis", pa.array(
    ["" if i % 2 else "admin&fr" for i in range(t.num_rows)], pa.string()))
_pq.write_table(t, os.path.join(sec_fix, "images.parquet"))
sec_store = tempfile.mkdtemp(prefix="quickstart_secstore_")
write_store(sec_fix, sec_store, columns=["image_id", "phash", "vis"])
print("public rows:", read_store(sec_store, auths=[]).count(),
      "| admin+fr rows:",
      read_store(sec_store, auths=["admin", "fr"]).count())

ray.shutdown()
