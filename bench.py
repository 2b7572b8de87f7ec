#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line.

Default: time the headline pipeline (spatial PIP join + tile assignment)
and a battery of operator pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS or 32).

--scaling: run the headline at num_cpus=8 and num_cpus=32 in fresh
subprocesses on the same input and report both throughputs + scaling
efficiency E = (T8/T32)/4 (the sandbox stand-in for the N vs 4N node
rule; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _consume(ds) -> int:
    """Drive a pipeline to completion, returning row count (no driver
    materialization of column data)."""
    if hasattr(ds, "count"):
        return ds.count()
    return len(ds)


def run_bench(sf_dir: str, num_cpus: int, headline_only: bool = False,
              repeat_input: int = 1) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    from geomesa_ray.pipelines.flagship import flagship
    from geomesa_ray.sources.fixtures import ensure_fixtures, rows_for_sf

    fdir = ensure_fixtures(sf_dir)
    n_input = rows_for_sf(sf_dir) * repeat_input

    queries: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        rows = fn()
        dt = time.perf_counter() - t0
        queries[name] = round(dt, 3)
        return rows, dt

    ray.data.range(num_cpus * 2).map_batches(lambda b: b).count()  # warm workers

    # headline: spatial join + tile assignment, one streaming pass.
    # repeat_input > 1 reads the same parquet N times (a larger scaling
    # workload without extra disk).
    def run_headline():
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pqt
        import ray.data

        from geomesa_ray.pipelines.pip_join import pip_join_points
        from geomesa_ray.stages.encode import derive_and_encode

        if repeat_input == 1:
            return _consume(flagship(fdir))
        paths = [os.path.join(fdir, "images.parquet")] * repeat_input
        regions = pqt.read_table(os.path.join(fdir, "regions.parquet"))
        ds = ray.data.read_parquet(paths, columns=["image_id", "phash"])
        ds = ds.map_batches(derive_and_encode, batch_format="pyarrow")
        out = pip_join_points(ds, regions, emit_cols=("image_id", "cell"))

        def add_tile(batch):
            cell = batch.column("cell").to_numpy(zero_copy_only=False)
            return pa.table({
                "image_id": batch.column("image_id"),
                "region_id": batch.column("region_id"),
                "tile": pa.array(cell >> np.int64(8)),
            })

        return _consume(out.map_batches(add_tile, batch_format="pyarrow"))

    join_rows, headline_s = timed("headline_join_tile", run_headline)

    result = {
        "metric": "spatial-join + tile-assignment throughput",
        "value": round(headline_s, 3),
        "unit": "sec",
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "input_rows": n_input,
        "join_rows": join_rows,
        "rows_per_sec": round(n_input / headline_s, 1),
        "queries": queries,
    }
    if headline_only:
        ray.shutdown()
        return result

    from geomesa_ray.pipelines import aggregates, density, knn, pip_join, scan, tiles
    from geomesa_ray.stages import dedup, similarity, text_ops
    from geomesa_ray.state.store import read_store, write_store

    q = scan.SpatialQuery(-10.0, 25.0, -5.0, 30.0)
    timed("scan_bbox", lambda: _consume(scan.scan(fdir, q)))
    timed("pip_join_all", lambda: _consume(pip_join.pip_join(fdir)))
    timed("tile_assign", lambda: _consume(tiles.tile_assignment(fdir)))
    timed("knn_planar", lambda: _consume(knn.knn(fdir)))
    timed("density_grid", lambda: _consume(density.density(fdir)))
    timed("dedup_exact", lambda: _consume(dedup.exact_dedup(sf_dir)))
    timed("minhash_lsh_pairs", lambda: _consume(dedup.minhash_lsh_pairs(sf_dir)))
    timed("similarity_topk", lambda: _consume(similarity.topk_cosine(sf_dir)))
    timed("token_count", lambda: _consume(text_ops.token_counts(sf_dir)))

    store_dir = f"/tmp/graft_store_bench_{num_cpus}"
    import shutil

    shutil.rmtree(store_dir, ignore_errors=True)
    t0 = time.perf_counter()
    stats = write_store(fdir, store_dir)
    queries["store_write"] = round(time.perf_counter() - t0, 3)
    timed("store_read_pruned", lambda: _consume(read_store(store_dir, q)))
    result["store"] = stats

    ray.shutdown()
    return result


def run_scaling(sf_dir: str, cpus_list=(8, 32), repeat_input: int = 4) -> dict:
    runs = []
    for c in cpus_list:
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(c)
        env["GRAFT_SF_DIR"] = sf_dir
        out = subprocess.run(
            [sys.executable, __file__, "--headline-only",
             f"--repeat-input={repeat_input}"],
            capture_output=True, text=True, env=env, timeout=1800)
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        runs.append(json.loads(line))
    t = [r["value"] for r in runs]
    rps = [r["rows_per_sec"] for r in runs]
    eff = (rps[1] / rps[0]) / (cpus_list[1] / cpus_list[0])
    return {
        "metric": "scaling efficiency (N -> 4N cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "cpus": list(cpus_list),
        "elapsed_s": t,
        "rows_per_sec": rps,
        "input_rows": runs[0]["input_rows"],
        "queries": {f"headline_cpus{c}": r["value"]
                    for c, r in zip(cpus_list, runs)},
    }


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    headline_only = "--headline-only" in sys.argv
    repeat = 1
    for a in sys.argv[1:]:
        if a.startswith("--repeat-input="):
            repeat = int(a.split("=")[1])
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(sf_dir)))
    else:
        print(json.dumps(run_bench(sf_dir, num_cpus, headline_only, repeat)))


if __name__ == "__main__":
    main()
