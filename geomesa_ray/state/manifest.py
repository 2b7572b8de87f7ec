"""Per-partition lineage manifests — the checkpoint/restart substrate.

The reference has no query checkpointing (ingest restart = idempotent
re-run by feature id, ``AccumuloFeatureWriter``; Kafka replay is the
streaming analog, ``ReplayKafkaConsumerFeatureSource.scala:32-72``). The
north rule instead demands batch resumability: every completed partition
commits a manifest atomically (write-to-tmp + rename), and a restarted run
filters completed partitions BEFORE the shuffle/write, so finished work is
neither recomputed nor rewritten.
"""

from __future__ import annotations

import json
import os
import tempfile


def manifest_path(out_dir: str, partition: int | str) -> str:
    return os.path.join(out_dir, f"part={partition}", "manifest.json")


def commit_partition(out_dir: str, partition: int | str,
                     table, payload: dict) -> None:
    """THE shared partition-commit protocol (point + extent stores):
    write parquet to a tmp name, atomically rename, then commit the
    manifest — any change to the durability protocol lands here once."""
    import pyarrow.parquet as pq

    pdir = os.path.join(out_dir, f"part={partition}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    pq.write_table(table, tmp, row_group_size=65536)
    os.replace(tmp, os.path.join(pdir, "data.parquet"))
    write_manifest(out_dir, partition, payload)


def write_manifest(out_dir: str, partition: int | str, payload: dict) -> str:
    """Atomically commit a partition manifest (tmp file + rename)."""
    pdir = os.path.join(out_dir, f"part={partition}")
    os.makedirs(pdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=pdir, prefix=".manifest_")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f)
    dest = manifest_path(out_dir, partition)
    os.replace(tmp, dest)
    return dest


def completed_partitions(out_dir: str) -> dict[str, dict]:
    """partition-id -> manifest payload for every committed partition."""
    out = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if not name.startswith("part="):
            continue
        mf = os.path.join(out_dir, name, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as f:
                out[name[len("part="):]] = json.load(f)
    return out


def _versions_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "versions")


def list_versions(out_dir: str) -> list[int]:
    vdir = _versions_dir(out_dir)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def read_snapshot(out_dir: str, version: int | None = None) -> dict:
    """Snapshot payload {"version": N, "files": {partition: filename}};
    latest when ``version`` is None. Raises if none exist."""
    versions = list_versions(out_dir)
    if not versions:
        raise FileNotFoundError(f"{out_dir}: no committed snapshots")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"unknown snapshot version {v}; have {versions}")
    with open(os.path.join(_versions_dir(out_dir), f"v{v}.json")) as f:
        return json.load(f)


def commit_snapshot(out_dir: str, files: dict[str, str]) -> int:
    """Atomically commit the next snapshot version mapping partition ->
    immutable data filename."""
    vdir = _versions_dir(out_dir)
    os.makedirs(vdir, exist_ok=True)
    versions = list_versions(out_dir)
    ver = (versions[-1] + 1) if versions else 1
    fd, tmp = tempfile.mkstemp(dir=vdir, prefix=".v_")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": ver, "files": files}, f)
    os.replace(tmp, os.path.join(vdir, f"v{ver}.json"))
    return ver


def skew_stats(manifests: dict[str, dict], key: str = "rows") -> dict:
    """Aggregate per-partition metrics incl. the skew factor
    (max/mean rows) the north rule asks to be emitted."""
    rows = [m.get(key, 0) for m in manifests.values()]
    if not rows:
        return {"partitions": 0, "rows": 0, "skew_factor": 0.0}
    mean = sum(rows) / len(rows)
    return {
        "partitions": len(rows),
        "rows": int(sum(rows)),
        "max_partition_rows": int(max(rows)),
        "mean_partition_rows": mean,
        "skew_factor": (max(rows) / mean) if mean else 0.0,
    }
