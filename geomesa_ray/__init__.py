"""geomesa_ray — a Ray-Data-native spatial indexing + query engine.

A from-scratch reimplementation of the query/data-processing capabilities of
GeoMesa (reference: /root/reference, v1.2.0-SNAPSHOT era) re-expressed as
Ray Data pipelines over zero-copy Arrow batches:

- Space-filling-curve kernels (Z3 space-time curve, Z2 hierarchical cells —
  the H3/S2-style stand-in for GeoMesa's geohash/Z3 index tables) as
  vectorized NumPy bit ops inside ``map_batches``.
- Range planning (octree decomposition of query boxes into covering
  Z-ranges, reference ``Z3.zranges``) as a driver-side plan step used for
  partition pruning + coarse vectorized filters.
- Point-in-polygon spatial joins (broadcast small-side and
  groupby-cell co-partitioned variants with hot-cell salting), kNN,
  density / temporal-density aggregates, tiling, BIN export.
- Training-data ops: exact + MinHash-LSH + SimHash dedup, similarity
  search over embeddings, text quality/language heuristics.
- Resumable partitioned writes with per-partition lineage manifests.

No code is copied from the reference; citations in docstrings are
``file:line`` pointers into /root/reference for semantic parity checks.
"""

__version__ = "0.1.0"
