"""Public engine facade — the analog of GeoMesa's WPS process surface.

Reference parity: each GeoTools ``@DescribeProcess`` (``process/*``) maps
to one method returning a ``ray.data.Dataset``; the datastore lifecycle
(createSchema / feature writer / feature reader) maps to
``ingest_store`` / ``query``. A user of the reference's query +
processing surface drives every capability from this one class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.pipelines.scan import SpatialQuery
from geomesa_ray.planner import (QuerySpec, Strategy, choose_strategy,
                                 intersect_id_sets, normalize_range)


def _planner_parses(clause: str) -> bool:
    """True when the planner subset can parse this (single) disjunct."""
    from geomesa_ray.cql import parse_cql

    try:
        parse_cql(clause)
        return True
    except ValueError:
        return False


class GeoMesaRayEngine:
    """Engine over one image+caption corpus directory (parquet or lance)."""

    def __init__(self, fixture_dir: str, store_dir: str | None = None):
        self.fixture_dir = fixture_dir
        self.store_dir = store_dir

    # ---- datastore lifecycle

    def ingest_store(self, store_dir: str, **kw) -> dict:
        """createSchema + feature-writer analog: cell-bucketed sorted
        layout with lineage manifests (resumable)."""
        from geomesa_ray.state.store import write_store

        self.store_dir = store_dir
        return write_store(self.fixture_dir, store_dir, **kw)

    # ---- source selection

    def _source(self, columns: list[str],
                optional: list[str] | None = None) -> ray.data.Dataset:
        """The engine's ROW SOURCE for non-spatial scans: the attached
        store when one exists (so consume()/append() results are visible
        to EVERY strategy — spatial, attribute, record, and the CQL tree
        scan — consistently), else the fixture table. A store missing a
        QUERY-REFERENCED column is a clear error, not a silent fixture
        fallback (which would resurrect pre-append data); ``optional``
        columns (output-only projections like caption) are simply
        dropped when a thin store lacks them."""
        from geomesa_ray.sources.io import read_images

        optional = optional or []
        if self.store_dir is None:
            return read_images(self.fixture_dir,
                               columns=[*columns, *optional])
        from geomesa_ray.state.store import read_meta, read_store

        # ingested columns PLUS the derived key columns every partition
        # stores (derive_and_encode + add_bucket write these on ingest)
        have = set(read_meta(self.store_dir).get("columns", [])) | {
            "lon", "lat", "dtg", "dtg_s", "week", "z3", "cell", "bucket"}
        missing = set(columns) - have
        if missing:
            raise ValueError(
                f"query references columns {sorted(missing)} not ingested "
                f"into the attached store (has {sorted(have)}); "
                "ingest_store(columns=[...]) with them, or query an "
                "engine without a store to scan the source table")
        cols = [*columns, *[c for c in optional if c in have]]
        return read_store(self.store_dir, columns=cols)

    # ---- query path (strategy-decided)

    def query(self, spec: QuerySpec,
              strategy_override: Strategy | None = None,
              limit: int | None = None,
              columns: list[str] | None = None) -> ray.data.Dataset:
        """Cost-based strategy choice, then the matching pipeline; exact
        refinement of remaining predicates is always applied. ``limit``
        mirrors GeoTools maxFeatures (``AccumuloFeatureReader.scala:44-58``);
        ``columns`` is the requested projection (GeoTools propertyNames) —
        pushed into the attribute-index path, where a projection covered
        by the carried index value is served straight off the index with
        NO record join (``AttributeIdxStrategy.scala:85-104``, the
        IndexCoverage.FULL / covered-query decision, chosen per query).
        """
        from geomesa_ray.pipelines.scan import scan
        from geomesa_ray.planner import record_lookup

        strat = choose_strategy(spec, strategy_override)
        if strat is Strategy.RECORD:
            ids = intersect_id_sets(spec)
            # projection must carry every column later predicates refine
            # on; caption is output-only (dropped if a thin store lacks it)
            cols = list(dict.fromkeys(
                ["image_id", "phash", *spec.attr_eq.keys(),
                 *spec.attr_range.keys()]))
            ds = record_lookup(
                self.fixture_dir, ids or [],
                columns=[*cols, "caption"],
                source_ds=self._source(cols, optional=["caption"])
                if self.store_dir is not None else None)
            out = self._refine(ds, spec, skip_ids=True)
        elif strat is Strategy.ATTRIBUTE:
            ds, spatial_done = self._attribute_scan(spec, columns=columns)
            out = self._refine(ds, spec, skip_attr=True,
                               skip_spatial=spatial_done)
        else:
            q = self._to_spatial_query(spec)
            if self.store_dir is not None:
                from geomesa_ray.state.store import read_store

                ds = read_store(self.store_dir, q)
            else:
                ds = scan(self.fixture_dir, q)
            out = self._refine(ds, spec, skip_spatial=True)
        if columns is not None and set(columns) != set(out.schema().names):
            out = out.select_columns(columns)
        if limit is not None:
            out = out.limit(limit)
        return out

    def cql(self, expr: str, limit: int | None = None) -> ray.data.Dataset:
        """Execute an (E)CQL query string — the reference's user-facing
        query language (GeoTools ECQL parse -> QueryFilterSplitter).
        BBOX/time/id/attr clauses — including numeric comparisons and
        BETWEEN (-> attr_range, served by a secondary attribute index
        when the attached store has one) — go through the cost-based
        planner; INTERSECTS dispatches the PIP join against the WKT
        geometry; DWITHIN dispatches the proximity join. Expressions
        beyond that planner subset — NOT, nested parenthesized boolean
        trees — fall back to a full scan with ONE fused vectorized
        filter-tree mask (the reference's refine-only execution when no
        index strategy applies). See geomesa_ray.cql for both
        grammars."""
        from geomesa_ray.cql import parse_cql, split_or
        from geomesa_ray.pipelines.proximity import id_setop

        disjuncts = split_or(expr)
        if len(disjuncts) > 1:
            # OR-split only pays off when at least one disjunct can use
            # a planner strategy (pruned scan / join); if EVERY disjunct
            # is tree-grammar, one fused-mask scan beats N full scans +
            # a union shuffle
            if not any(_planner_parses(d) for d in disjuncts):
                return self._cql_tree_scan(expr, limit)
            # OR: execute each disjunct (each independently picks the
            # planner or tree path) and union-distinct the id sets
            # DISTRIBUTED (bucketed groupby — the reference's OR-split
            # normalization without a single-task combine)
            out = id_setop([self.cql(d).select_columns(["image_id"])
                            for d in disjuncts], require=1)
            return out.limit(limit) if limit is not None else out
        # the except is NARROW: only the PARSE decides the fallback —
        # execution errors from the planner path must surface, not be
        # silently retried through the tree scan
        try:
            q = parse_cql(expr)
        except ValueError:
            return self._cql_tree_scan(expr, limit)
        return self._cql_planner(q, limit)

    def _cql_tree_scan(self, expr: str,
                       limit: int | None = None) -> ray.data.Dataset:
        """Full-grammar CQL: scan + fused boolean-tree mask per batch,
        over :meth:`_source` (the attached store when one exists — the
        same row source every other strategy uses, so consume()/append()
        results are visible to all grammars consistently)."""
        from geomesa_ray.cql import eval_tree, parse_cql_tree, tree_columns
        from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat

        tree = parse_cql_tree(expr)
        cols = sorted({"image_id", "phash"} | tree_columns(tree))

        def fn(batch: pa.Table) -> pa.Table:
            ph = batch.column("phash").to_numpy(zero_copy_only=False)
            lon, lat = phash_to_lonlat(ph)
            m = eval_tree(tree, batch, lon, lat, phash_to_dtg_s(ph))
            return batch.filter(pa.array(m)).select(["image_id"])

        out = self._source(cols).map_batches(fn, batch_format="pyarrow")
        return out.limit(limit) if limit is not None else out

    def _cql_planner(self, q, limit: int | None = None) -> ray.data.Dataset:
        from geomesa_ray.pipelines.proximity import id_setop

        spec = q.spec
        rest = (spec.ids is not None or spec.id_sets is not None
                or bool(spec.attr_eq) or bool(spec.attr_range)
                or spec.bbox is not None or spec.interval_s is not None)

        # every parsed conjunct becomes one id-producing branch; the
        # result is the INTERSECTION of all branches (semi-joins against
        # the first branch's stream) — nothing silently dropped
        def intersects_ds(wkt: str) -> ray.data.Dataset:
            from geomesa_ray.geom.wkt import parse_wkt_geometry

            kind, _ = parse_wkt_geometry(wkt)
            # time participates via the planner branch; the region's own
            # window is wide open (0 .. ~year 141000), NOT tied to any
            # corpus constants
            t0, t1 = 0, 1 << 42
            regions = pa.table({
                "region_id": pa.array(["cql"], pa.string()),
                "kind": pa.array([kind], pa.string()),
                "lon_min": pa.array([0.0]), "lon_max": pa.array([0.0]),
                "lat_min": pa.array([0.0]), "lat_max": pa.array([0.0]),
                "wkt": pa.array([wkt], pa.string()),
                "t_start": pa.array([t0 * 1_000_000], pa.timestamp("us")),
                "t_end": pa.array([t1 * 1_000_000], pa.timestamp("us")),
            })
            return self.pip_join(regions, kinds=(kind,)) \
                .select_columns(["image_id"])

        branches = [lambda w=w: intersects_ds(w) for w in q.geometry_wkts]
        branches += [
            lambda d=d: self.proximity(np.array([d[0]]), np.array([d[1]]),
                                       ["cql"], d[2])
            .select_columns(["image_id"])
            for d in q.dwithins
        ]
        if not branches:
            return self.query(spec, limit=limit)
        if rest:
            branches.append(
                lambda: self.query(spec).select_columns(["image_id"]))

        if len(branches) == 1:
            out = branches[0]()
        else:
            # AND: distributed intersection of the branch id streams —
            # ids bucketed by hash, kept when present in EVERY branch
            # (no branch result ever materializes on the driver)
            out = id_setop([br() for br in branches],
                           require=len(branches))
        return out.limit(limit) if limit is not None else out

    def _to_spatial_query(self, spec: QuerySpec) -> SpatialQuery:
        bbox = spec.bbox or (-180.0, 180.0, -90.0, 90.0)
        t0, t1 = spec.interval_s or (None, None)
        return SpatialQuery(*bbox, t0, t1)

    def _attribute_scan(self, spec: QuerySpec,
                        columns: list[str] | None = None):
        """-> (dataset, spatial_done). ``spatial_done`` is True when the
        index path already applied the spatio-temporal refinement on the
        carried index value (the caller must not re-apply it).
        ``columns`` (when given) is pushed into the index read: a
        projection covered by the carried index value is decoded straight
        off the index with NO record join — the per-query
        IndexCoverage.FULL / covered-query choice of
        ``AttributeIdxStrategy.scala:85-104``."""
        from geomesa_ray.stages.encode import derive_and_encode

        pred_cols = list(dict.fromkeys(
            [*spec.attr_eq.keys(), *spec.attr_range.keys()]))
        if self.store_dir is not None and len(pred_cols) == 1:
            # AttributeIdxStrategy: secondary-index scan + record join
            # when the attached store has a CURRENT index on the
            # predicate column (value-pruned partitions, no full scan).
            # A stale index (store appended/deleted since the build)
            # falls back to the scan so every strategy keeps seeing the
            # same rows.
            from geomesa_ray.state.attr_index import (attr_index_current,
                                                      query_attr_index)

            c = pred_cols[0]
            if attr_index_current(self.store_dir, c):
                lo, hi, ls, hs = normalize_range(
                    spec.attr_range.get(c, (None, None)))
                q = self._to_spatial_query(spec) \
                    if (spec.bbox is not None or spec.interval_s) else None
                idx_cols = None
                if columns is not None:
                    # the projection pushed to the index must also carry
                    # whatever the residual refinement filters on: the
                    # id predicate reads image_id (spatial/attr are
                    # already applied inside the index path)
                    idx_cols = list(dict.fromkeys(
                        [*columns, *(["image_id"]
                                     if intersect_id_sets(spec) is not None
                                     else [])]))
                return query_attr_index(self.store_dir, c,
                                        eq=spec.attr_eq.get(c),
                                        lo=lo, hi=hi, lo_strict=ls,
                                        hi_strict=hs, query=q,
                                        columns=idx_cols), q is not None

        derived = {"lon", "lat", "dtg", "dtg_s", "week", "z3", "cell"}
        cols = list({"image_id", "phash", *pred_cols,
                     *(c for c in (columns or []) if c not in derived)})

        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from geomesa_ray.cql import range_mask

            m = np.ones(batch.num_rows, dtype=bool)
            for col, val in spec.attr_eq.items():
                from geomesa_ray.cql import eq_mask

                m &= eq_mask(batch, col, val)
            for col, r in spec.attr_range.items():
                m &= range_mask(batch, col, r)
            return batch.filter(pa.array(m))

        ds = self._source(cols)
        return ds.map_batches(keep, batch_format="pyarrow").map_batches(
            derive_and_encode, batch_format="pyarrow"), False

    def _refine(self, ds: ray.data.Dataset, spec: QuerySpec, skip_ids=False,
                skip_attr=False, skip_spatial=False) -> ray.data.Dataset:
        import pyarrow.compute as pc

        from geomesa_ray.pipelines.scan import exact_mask
        from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat

        ids = None if skip_ids else intersect_id_sets(spec)
        attr = {} if skip_attr else spec.attr_eq
        rng = {} if skip_attr else spec.attr_range
        q = None
        if not skip_spatial and (spec.bbox is not None or spec.interval_s):
            q = self._to_spatial_query(spec)

        if ids is None and not attr and not rng and q is None:
            return ds

        want = np.array(sorted(ids), dtype=object) if ids is not None else None

        def fn(batch: pa.Table) -> pa.Table:
            m = np.ones(batch.num_rows, dtype=bool)
            if want is not None:
                from geomesa_ray.util import id_membership_mask

                m &= id_membership_mask(batch.column("image_id"), want)
            for col, val in attr.items():
                from geomesa_ray.cql import eq_mask

                m &= eq_mask(batch, col, val)
            for col, r in rng.items():
                from geomesa_ray.cql import range_mask

                m &= range_mask(batch, col, r)
            if q is not None:
                ph = batch.column("phash").to_numpy(zero_copy_only=False)
                lon, lat = phash_to_lonlat(ph)
                m &= exact_mask(q, lon, lat, phash_to_dtg_s(ph))
            return batch.filter(pa.array(m))

        return ds.map_batches(fn, batch_format="pyarrow")

    # ---- analytic processes (WPS analogs)

    def pip_join(self, regions: pa.Table, **kw) -> ray.data.Dataset:
        from geomesa_ray.pipelines.pip_join import pip_join

        return pip_join(self.fixture_dir, regions=regions, **kw)

    def knn(self, probes: pa.Table | None = None, **kw) -> ray.data.Dataset:
        from geomesa_ray.pipelines.knn import knn

        return knn(self.fixture_dir, probes, **kw)

    def knn_indexed(self, probes: pa.Table | None = None,
                    metric: str = "planar") -> pa.Table:
        """Index-pruned kNN (requires ingest_store first)."""
        from geomesa_ray.pipelines.knn import knn_indexed

        if self.store_dir is None:
            raise ValueError("ingest_store(...) first: indexed kNN reads the store")
        return knn_indexed(self.store_dir, probes, fixture_dir=self.fixture_dir,
                           metric=metric)

    def append(self, new_images: pa.Table) -> dict:
        """Incremental upsert into the store (affected buckets only)."""
        from geomesa_ray.state.store import append_store

        if self.store_dir is None:
            raise ValueError("ingest_store(...) first")
        return append_store(self.store_dir, new_images)

    def consume(self, incoming_dir: str, **kw) -> dict:
        """Run the continuous-ingest consumer loop against a landing
        directory (the live Kafka consumer analog — see
        state.consumer)."""
        from geomesa_ray.state.consumer import continuous_ingest

        if self.store_dir is None:
            raise ValueError("ingest_store(...) first")
        return continuous_ingest(incoming_dir, self.store_dir, **kw)

    def read_secured(self, auths: list[str],
                     query: SpatialQuery | None = None,
                     **kw) -> ray.data.Dataset:
        """Store read under an authorization label set — rows whose
        ``vis`` expression the auths don't satisfy are filtered before
        any refinement (AuthorizationsProvider analog)."""
        from geomesa_ray.state.store import read_store

        if self.store_dir is None:
            raise ValueError("ingest_store(...) first")
        return read_store(self.store_dir, query, auths=auths, **kw)

    def proximity(self, lon, lat, ids, dist_m: float) -> ray.data.Dataset:
        from geomesa_ray.pipelines.proximity import proximity_join

        return proximity_join(self.fixture_dir, lon, lat, ids, dist_m)

    def tube_select(self, **kw) -> ray.data.Dataset:
        from geomesa_ray.pipelines.tube import tube_select

        return tube_select(self.fixture_dir, **kw)

    def density(self, **kw) -> ray.data.Dataset:
        from geomesa_ray.pipelines.density import density

        return density(self.fixture_dir, **kw)

    def unique(self, sf_dir: str, table: str, col: str) -> ray.data.Dataset:
        from geomesa_ray.pipelines.aggregates import unique_values

        return unique_values(sf_dir, table, col)

    def tiles(self, level: int = 8) -> ray.data.Dataset:
        from geomesa_ray.pipelines.tiles import tile_assignment

        return tile_assignment(self.fixture_dir, level)

    def mosaic(self, level: int = 8) -> ray.data.Dataset:
        from geomesa_ray.pipelines.tiles import mosaic

        return mosaic(self.fixture_dir, level)

    def bbox_union(self) -> pa.Table:
        """BBOX-combiner analog (``BBOXCombiner.scala:24-50``): envelope
        union of the corpus (per-batch partials, driver combine)."""
        from geomesa_ray.sources.io import read_images
        from geomesa_ray.stages.derive import derive_geometry

        def partial(batch: pa.Table) -> pa.Table:
            lon = batch.column("lon").to_numpy(zero_copy_only=False)
            lat = batch.column("lat").to_numpy(zero_copy_only=False)
            return pa.table({
                "lon_min": pa.array([float(lon.min())]),
                "lon_max": pa.array([float(lon.max())]),
                "lat_min": pa.array([float(lat.min())]),
                "lat_max": pa.array([float(lat.max())]),
            })

        ds = read_images(self.fixture_dir, columns=["phash"]).map_batches(
            derive_geometry, batch_format="pyarrow").map_batches(
            partial, batch_format="pyarrow")
        rows = ds.take_all()
        return pa.table({
            "lon_min": pa.array([min(r["lon_min"] for r in rows)]),
            "lon_max": pa.array([max(r["lon_max"] for r in rows)]),
            "lat_min": pa.array([min(r["lat_min"] for r in rows)]),
            "lat_max": pa.array([max(r["lat_max"] for r in rows)]),
        })

    def sorted_export(self, query: SpatialQuery) -> ray.data.Dataset:
        """Globally-ordered export by (week, z3, image_id) — the
        LazySortedIterator analog as a distributed range-partition sort
        (``QueryPlanner.scala:394-448``)."""
        from geomesa_ray.pipelines.scan import scan

        ds = scan(self.fixture_dir, query)
        return ds.sort(["week", "z3", "image_id"])
