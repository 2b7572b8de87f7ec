"""Command-line tools — the ``geomesa-tools`` analog.

Reference parity: the reference's primary user surface is the
``geomesa`` CLI (``geomesa-tools/.../Runner.scala`` command registry:
``IngestCommand``, ``ExportCommand``, ``DescribeCommand``,
``ListCommand``, ``ExplainCommand``, ``QueryStatsCommand``,
``RemoveSchemaCommand``, ``VersionCommand`` under
``geomesa-tools/src/main/scala/org/locationtech/geomesa/tools/commands/``).
Each subcommand here maps onto the library API the same way those
commands map onto the datastore: a user who drives the reference from
its CLI can drive this engine from ``python -m geomesa_ray``.

Ray session ownership: the CLI initialises Ray itself (guarded — it
never re-inits a running session and only shuts down a session it
started), per the driver contract that library code must not own the
session.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def _ray_session(args):
    """Init Ray if not already running; returns True when WE started it
    (and therefore own the shutdown)."""
    import ray

    if ray.is_initialized():
        return False
    kw = {"address": "local", "include_dashboard": False,
          "log_to_driver": False}
    if getattr(args, "num_cpus", None):
        kw["num_cpus"] = args.num_cpus
    ray.init(**kw)
    return True


def _engine(args):
    from geomesa_ray.engine import GeoMesaRayEngine

    if not args.src and not args.store:
        print(f"{args.command}: pass --store and/or --src",
              file=sys.stderr)
        raise SystemExit(2)
    if not args.src:
        # geometry joins (INTERSECTS / DWITHIN) read the SOURCE table,
        # not the store — catch the misuse before a mid-query crash
        from geomesa_ray.cql import parse_cql, split_or

        for d in split_or(args.cql):
            try:
                q = parse_cql(d)
            except ValueError:
                continue  # tree grammar runs over the store source
            if q.geometry_wkts or q.dwithins:
                print(f"{args.command}: INTERSECTS/DWITHIN queries read "
                      "the source table; pass --src", file=sys.stderr)
                raise SystemExit(2)
    return GeoMesaRayEngine(args.src, store_dir=args.store)


def cmd_version(args) -> int:
    from geomesa_ray import __version__

    print(__version__)
    return 0


def cmd_ingest(args) -> int:
    """IngestCommand analog: source table -> cell-bucketed store
    (resumable; prints the skew/row metrics the manifests record)."""
    from geomesa_ray.state.store import write_store

    kw = {}
    if args.cell_level is not None:
        kw["cell_level"] = args.cell_level
    if args.bucket_level is not None:
        kw["bucket_level"] = args.bucket_level
    if args.columns:
        kw["columns"] = args.columns.split(",")
    if args.hot_threshold is not None:
        kw["hot_rows_threshold"] = args.hot_threshold
        kw["n_salt"] = args.n_salt
    stats = write_store(args.src, args.store, **kw)
    print(json.dumps(stats))
    return 0


def cmd_describe(args) -> int:
    """DescribeCommand analog: schema + partitioning + versions +
    secondary indexes of a store."""
    from geomesa_ray.state.manifest import (completed_partitions,
                                            list_versions)
    from geomesa_ray.state.store import read_meta

    meta = read_meta(args.store)
    manifests = completed_partitions(args.store)
    rows = sum(m.get("rows", 0) for m in manifests.values())
    idx_root = os.path.join(args.store, "attr_idx")
    indexes = sorted(os.listdir(idx_root)) if os.path.isdir(idx_root) \
        else []
    print(json.dumps({
        "columns": meta.get("columns"),
        "format": meta.get("format"),
        "sort_key": meta.get("sort_key"),
        "cell_level": meta.get("cell_level"),
        "bucket_level": meta.get("bucket_level"),
        "salted": meta.get("salted", False),
        "partitions": len(manifests),
        "rows": rows,
        "versions": list_versions(args.store),
        "attr_indexes": indexes,
    }))
    return 0


def cmd_list(args) -> int:
    """ListCommand analog: stores (dirs with a catalog meta.json) under
    a root."""
    out = sorted(
        name for name in os.listdir(args.root)
        if os.path.exists(os.path.join(args.root, name, "meta.json")))
    for name in out:
        print(name)
    return 0


def cmd_explain(args) -> int:
    """ExplainCommand analog: print the strategy the planner would pick
    and the partition pruning it would achieve, without executing."""
    from geomesa_ray.cql import parse_cql
    from geomesa_ray.planner import choose_strategy

    try:
        q = parse_cql(args.cql)
    except ValueError:
        print(json.dumps({
            "strategy": "scan",
            "plan": "full scan with one fused vectorized filter-tree "
                    "mask (no index strategy applies)"}))
        return 0
    strat = choose_strategy(q.spec)
    plan = {"strategy": strat.value, "cost": strat.cost}
    if q.geometry_wkts:
        plan["joins"] = [f"pip_join({w[:40]}...)" if len(w) > 40 else
                         f"pip_join({w})" for w in q.geometry_wkts]
    if q.dwithins:
        plan["joins"] = plan.get("joins", []) + [
            f"proximity(lon={d[0]}, lat={d[1]}, dist_m={d[2]})"
            for d in q.dwithins]
    if args.store:
        from geomesa_ray.state.manifest import completed_partitions

        manifests = completed_partitions(args.store)
        if q.spec.bbox is not None:
            from geomesa_ray.pipelines.scan import SpatialQuery
            from geomesa_ray.state.store import (read_meta,
                                                 store_buckets_for_query)

            meta = read_meta(args.store)
            n_salt = meta.get("n_salt", 1) if meta.get("salted") else 1
            keep = store_buckets_for_query(
                SpatialQuery(*q.spec.bbox, None, None),
                meta["bucket_level"])
            buckets = sorted(int(b) for b in manifests)
            plan["partitions"] = {
                "total": len(buckets),
                "scanned": len([b for b in buckets
                                if (b // n_salt) in keep])}
        pred_cols = list(dict.fromkeys(
            [*q.spec.attr_eq, *q.spec.attr_range]))
        if len(pred_cols) == 1:
            from geomesa_ray.planner import normalize_range
            from geomesa_ray.state.attr_index import (attr_index_current,
                                                      parts_for_predicate)

            c = pred_cols[0]
            # same gate the ENGINE uses: a stale index (store appended/
            # deleted since the build) falls back to the scan, so
            # explain must not claim an index-pruned plan for it
            if attr_index_current(args.store, c):
                lo, hi, _, _ = normalize_range(
                    q.spec.attr_range.get(c, (None, None)))
                parts = parts_for_predicate(
                    args.store, c, eq=q.spec.attr_eq.get(c),
                    lo=lo, hi=hi)
                plan["attr_index"] = {"column": c,
                                      "partitions_scanned": len(parts)}
    print(json.dumps(plan))
    return 0


def cmd_export(args) -> int:
    """ExportCommand analog: run a CQL query, export the result."""
    from geomesa_ray.sources.exports import (export_csv, export_geojson,
                                             export_gml, export_json)

    eng = _engine(args)
    ds = eng.cql(args.cql, limit=args.max_features)
    if args.format in ("geojson", "gml"):
        if "lon" not in ds.schema().names:
            print("export: result has no lon/lat columns for "
                  f"{args.format}; use csv/json", file=sys.stderr)
            return 2
        (export_geojson if args.format == "geojson" else export_gml)(
            ds, args.out)
    elif args.format == "json":
        export_json(ds, args.out)
    else:
        export_csv(ds, args.out)
    n = sum(1 for name in os.listdir(args.out)
            if not name.startswith("."))
    print(json.dumps({"out": args.out, "format": args.format,
                      "files": n}))
    return 0


def cmd_transcode(args) -> int:
    """Corpus-wide payload re-encode (RasterUtils imageToBytes analog):
    read the source images, re-encode every payload into --format
    (png/jpeg/bmp/raw) through the codec actor stage, write parquet."""
    from geomesa_ray.stages.image_ops import transcode

    ds = transcode(args.src, args.format, quality=args.quality,
                   use_actors=not args.no_actors)
    os.makedirs(args.out, exist_ok=True)
    ds.write_parquet(args.out)
    n = sum(1 for name in os.listdir(args.out)
            if name.endswith(".parquet"))
    print(json.dumps({"out": args.out, "format": args.format,
                      "files": n}))
    return 0


def cmd_query_stats(args) -> int:
    """QueryStatsCommand analog: execute and audit-record a query
    (strategy, rows, wall time) — the query-audit row the reference
    writes per query."""
    from geomesa_ray.cql import parse_cql
    from geomesa_ray.planner import choose_strategy

    eng = _engine(args)
    t0 = time.perf_counter()
    n = eng.cql(args.cql).count()
    dt = time.perf_counter() - t0
    try:
        strat = choose_strategy(parse_cql(args.cql).spec).value
    except ValueError:
        strat = "scan"
    print(json.dumps({"cql": args.cql, "strategy": strat, "rows": n,
                      "seconds": round(dt, 3)}))
    return 0


def cmd_attr_index(args) -> int:
    """AttributeIndexJob analog: build a secondary index over the
    store."""
    from geomesa_ray.state.attr_index import build_attr_index

    parts = build_attr_index(args.store, args.attribute,
                             n_parts=args.n_parts,
                             coverage=args.coverage)
    print(json.dumps({"column": args.attribute, "coverage": args.coverage,
                      "partitions": len(parts),
                      "rows": sum(m["rows"] for m in parts.values())}))
    return 0


def cmd_stats(args) -> int:
    """Stats over a source table column: histogram / unique counts /
    min-max / approximate distinct (the stats surface of the tools)."""
    from geomesa_ray.stages.sketches import approx_distinct

    if args.kind == "approx-distinct":
        row = approx_distinct(args.src, args.table,
                              args.col).take_all()[0]
        print(json.dumps({"approx_distinct": row["approx_distinct"]}))
        return 0
    if args.kind == "quantiles":
        from geomesa_ray.stages.sketches import quantile_sketch

        rows = quantile_sketch(args.src, args.table, args.col).take_all()
        print(json.dumps({"n": rows[0]["n"],
                          "quantiles": {str(r["q"]): r["value"]
                                        for r in rows}}))
        return 0
    if args.kind == "describe":
        from geomesa_ray.stages.sketches import descriptive_stats

        (row,) = descriptive_stats(args.src, args.table,
                                   [args.col]).take_all()
        print(json.dumps({k: row[k] for k in
                          ("n", "mean", "variance", "min", "max")}))
        return 0
    if args.kind == "minmax":
        import ray.data
        from ray.data.aggregate import Max, Min

        ds = ray.data.read_parquet(
            os.path.join(args.src, f"{args.table}.parquet"),
            columns=[args.col])
        agg = ds.aggregate(Min(args.col), Max(args.col))
        print(json.dumps({"min": agg[f"min({args.col})"],
                          "max": agg[f"max({args.col})"]},
                         default=str))
        return 0
    # histogram / unique: value -> count rows, via the distributed
    # EXACT top-k (never materializes the full distinct-value histogram
    # on the driver — only the k winners come back)
    from geomesa_ray.stages.sketches import topk_values

    rows = topk_values(args.src, args.table, args.col,
                       k=args.top).take_all()
    for r in rows:
        print(f"{r[args.col]}\t{r['cnt']}")
    return 0


def cmd_remove_schema(args) -> int:
    """RemoveSchemaCommand analog; refuses without --force (the
    PromptConfirm role)."""
    if not os.path.exists(os.path.join(args.store, "meta.json")):
        print(f"remove-schema: {args.store} is not a store "
              "(no meta.json)", file=sys.stderr)
        return 2
    if not args.force:
        print("remove-schema: pass --force to confirm deletion",
              file=sys.stderr)
        return 2
    shutil.rmtree(args.store)
    print(json.dumps({"removed": args.store}))
    return 0


def cmd_blob_put(args) -> int:
    """Blobstore put (reference: AccumuloBlobStore.put via the
    blobstore command surface): land a local file, deriving geometry
    through the named handler registry (wkt params, exif GPS, ...);
    prints the assigned blob id."""
    from geomesa_ray.state.blobstore import put_blobs, resolve_blob_handler

    handler = resolve_blob_handler(args.handler)
    if args.handler == "wkt" and not args.wkt:
        print("blob-put: --wkt is required with the wkt handler",
              file=sys.stderr)
        return 2
    with open(args.file, "rb") as f:
        data = f.read()
    t = handler([(os.path.basename(args.file), data)],
                [{"wkt": args.wkt, "dtg_s": args.dtg_s}])
    if t.num_rows == 0:
        print(f"blob-put: handler {args.handler!r} cannot process "
              f"{args.file}", file=sys.stderr)
        return 2
    put_blobs(args.store, t)
    print(json.dumps({"blob_id": t.column("blob_id")[0].as_py(),
                      "rows": t.num_rows}))
    return 0


def cmd_blob_put_bulk(args) -> int:
    """Bulk blobstore ingest (the file-manifest path): every file under
    a directory streams through ``ray.data.read_binary_files`` -> the
    named handler per batch -> the Dataset-scale put. Payload bytes are
    never gathered on the driver; files the handler cannot process
    (e.g. no EXIF GPS) are skipped, mirroring single-file put."""
    import pyarrow as pa

    import ray.data

    from geomesa_ray.state.blobstore import put_blobs, resolve_blob_handler

    resolve_blob_handler(args.handler)  # fail fast on unknown names
    if args.handler == "wkt" and not args.wkt:
        print("blob-put-bulk: --wkt is required with the wkt handler",
              file=sys.stderr)
        return 2
    handler_name, wkt, dtg_s = args.handler, args.wkt, args.dtg_s

    def to_rows(batch: pa.Table) -> pa.Table:
        h = resolve_blob_handler(handler_name)
        files = [(os.path.basename(p), b)
                 for p, b in zip(batch.column("path").to_pylist(),
                                 batch.column("bytes").to_pylist())]
        return h(files, [{"wkt": wkt, "dtg_s": dtg_s} for _ in files])

    ds = ray.data.read_binary_files(args.dir, include_paths=True) \
        .map_batches(to_rows, batch_format="pyarrow")
    stats = put_blobs(args.store, ds)
    print(json.dumps(stats))
    return 0


def cmd_blob_get(args) -> int:
    """Blobstore get: fetch one payload by id to a local file."""
    from geomesa_ray.state.blobstore import get_blob

    data, name = get_blob(args.store, args.id)
    if not name:
        print(f"blob-get: {args.id} not found", file=sys.stderr)
        return 2
    out = args.out or name
    with open(out, "wb") as f:
        f.write(data)
    print(json.dumps({"blob_id": args.id, "filename": name,
                      "bytes": len(data), "out": out}))
    return 0


def cmd_blob_ids(args) -> int:
    """Blobstore getIds(filter): spatially-pruned id listing."""
    from geomesa_ray.state.blobstore import get_ids

    bbox = tuple(float(x) for x in args.bbox.split(",")) \
        if args.bbox else None
    rows = get_ids(args.store, bbox=bbox).select_columns(
        ["blob_id", "filename"]).take_all()
    for r in sorted(rows, key=lambda r: r["blob_id"]):
        print(f"{r['blob_id']}\t{r['filename']}")
    return 0


def cmd_blob_delete(args) -> int:
    from geomesa_ray.state.blobstore import delete_blobs

    print(json.dumps(delete_blobs(args.store, args.ids)))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="geomesa-ray",
        description="GeoMesa-parity tools over the Ray Data engine")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="num_cpus for a fresh local Ray session")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("version", help="print version")
    sp.set_defaults(fn=cmd_version, needs_ray=False)

    sp = sub.add_parser("ingest", help="ingest a source dir into a store")
    sp.add_argument("src")
    sp.add_argument("store")
    sp.add_argument("--cell-level", type=int, default=None)
    sp.add_argument("--bucket-level", type=int, default=None)
    sp.add_argument("--columns", default=None,
                    help="comma-separated columns to store")
    sp.add_argument("--hot-threshold", type=int, default=None,
                    help="rows/bucket above which buckets are salted")
    sp.add_argument("--n-salt", type=int, default=4)
    sp.set_defaults(fn=cmd_ingest, needs_ray=True)

    sp = sub.add_parser("describe", help="describe a store")
    sp.add_argument("store")
    sp.set_defaults(fn=cmd_describe, needs_ray=False)

    sp = sub.add_parser("list", help="list stores under a root dir")
    sp.add_argument("root")
    sp.set_defaults(fn=cmd_list, needs_ray=False)

    sp = sub.add_parser("explain", help="explain a CQL query plan")
    sp.add_argument("cql")
    sp.add_argument("--store", default=None)
    sp.set_defaults(fn=cmd_explain, needs_ray=False)

    sp = sub.add_parser("export", help="run a CQL query and export")
    sp.add_argument("cql")
    sp.add_argument("out")
    sp.add_argument("--format", default="csv",
                    choices=["csv", "json", "geojson", "gml"])
    sp.add_argument("--store", default=None)
    sp.add_argument("--src", default=None,
                    help="source table dir (when no store)")
    sp.add_argument("--max-features", type=int, default=None)
    sp.set_defaults(fn=cmd_export, needs_ray=True)

    sp = sub.add_parser("transcode",
                        help="re-encode image payloads (png/jpeg/bmp/raw)")
    sp.add_argument("--src", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--format", default="png",
                    choices=["png", "jpeg", "bmp", "raw"])
    sp.add_argument("--quality", type=int, default=98)
    sp.add_argument("--no-actors", action="store_true",
                    help="task-based stage (skip actor-pool spawn)")
    sp.set_defaults(fn=cmd_transcode, needs_ray=True)

    sp = sub.add_parser("query-stats",
                        help="execute a CQL query and audit-record it")
    sp.add_argument("cql")
    sp.add_argument("--store", default=None)
    sp.add_argument("--src", default=None)
    sp.set_defaults(fn=cmd_query_stats, needs_ray=True)

    sp = sub.add_parser("attr-index",
                        help="build a secondary attribute index")
    sp.add_argument("store")
    sp.add_argument("attribute")
    sp.add_argument("--n-parts", type=int, default=16)
    sp.add_argument("--coverage", default="join",
                    choices=["join", "full"])
    sp.set_defaults(fn=cmd_attr_index, needs_ray=True)

    sp = sub.add_parser("stats", help="column stats over a source table")
    sp.add_argument("src")
    sp.add_argument("table")
    sp.add_argument("col")
    sp.add_argument("--kind", default="histogram",
                    choices=["histogram", "minmax", "approx-distinct",
                             "quantiles", "describe"])
    sp.add_argument("--top", type=int, default=20)
    sp.set_defaults(fn=cmd_stats, needs_ray=True)

    sp = sub.add_parser("remove-schema", help="delete a store")
    sp.add_argument("store")
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_remove_schema, needs_ray=False)

    sp = sub.add_parser("blob-put", help="land a file in a blob store")
    sp.add_argument("store")
    sp.add_argument("file")
    sp.add_argument("--handler", default="wkt",
                    help="put-param handler (wkt, exif, or registered)")
    sp.add_argument("--wkt", default=None,
                    help="geometry param, e.g. 'POINT (10.5 -3.2)' "
                         "(wkt handler)")
    sp.add_argument("--dtg-s", type=int, required=True,
                    help="epoch seconds (exif: fallback when the file "
                         "has no DateTimeOriginal)")
    sp.set_defaults(fn=cmd_blob_put, needs_ray=True)

    sp = sub.add_parser("blob-put-bulk",
                        help="bulk-ingest a directory of files "
                             "(streaming Dataset put)")
    sp.add_argument("store")
    sp.add_argument("dir")
    sp.add_argument("--handler", default="wkt",
                    help="put-param handler (wkt, exif, or registered)")
    sp.add_argument("--wkt", default=None,
                    help="geometry applied to every file (wkt handler)")
    sp.add_argument("--dtg-s", type=int, default=0,
                    help="epoch seconds (exif: fallback date)")
    sp.set_defaults(fn=cmd_blob_put_bulk, needs_ray=True)

    sp = sub.add_parser("blob-get", help="fetch a blob payload by id")
    sp.add_argument("store")
    sp.add_argument("id")
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_blob_get, needs_ray=False)

    sp = sub.add_parser("blob-ids",
                        help="list blob ids (optional bbox filter)")
    sp.add_argument("store")
    sp.add_argument("--bbox", default=None,
                    help="lon_min,lon_max,lat_min,lat_max")
    sp.set_defaults(fn=cmd_blob_ids, needs_ray=True)

    sp = sub.add_parser("blob-delete", help="delete blobs by id")
    sp.add_argument("store")
    sp.add_argument("ids", nargs="+")
    sp.set_defaults(fn=cmd_blob_delete, needs_ray=True)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    started = False
    if getattr(args, "needs_ray", False):
        started = _ray_session(args)
    try:
        return args.fn(args)
    finally:
        if started:
            import ray

            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
