"""Continuous-ingest consumer process — the live streaming surface.

Reference parity: GeoMesa's Kafka data store runs a long-lived consumer
that tails a topic and applies each record batch to the live feature
cache (``LiveKafkaConsumerFeatureSource.scala:136-160``), with consumer
OFFSETS making the process restartable and replay possible
(``ReplayKafkaConsumerFeatureSource.scala:32-72``). This module is the
file-landing-zone analog of that process — the shape object stores and
CDC pipelines actually use at 100 TB (files land; a consumer tails the
directory):

- the "topic" is a landing directory that parquet files arrive in;
- each poll discovers unconsumed files (offset analog: a commit log of
  consumed file names under the store, written AFTER the append
  commits, so a crash between append and log replays the file — safe,
  because ``append_store`` upserts by image_id and replaying a batch is
  a no-op);
- each consumed batch is applied through :func:`append_store` (touched
  buckets only) and commits a snapshot version, so
  ``read_store(version=...)`` replays any generation and
  ``read_store_changes`` is the CDC stream between polls.

The poll loop itself is intentionally a plain driver loop (the consumer
is a coordinator, not a data path): each applied batch fans out through
the distributed append (shuffle by bucket, atomic partition rewrites).
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow.parquet as pq

INGEST_LOG = "_ingest_log.json"


def consumed_files(store_dir: str) -> list[dict]:
    """The consumer's commit log (offset analog): one entry per applied
    file with rows + the snapshot version that committed it."""
    path = os.path.join(store_dir, INGEST_LOG)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def _commit_log(store_dir: str, entries: list[dict]) -> None:
    path = os.path.join(store_dir, INGEST_LOG)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entries, f)
    os.replace(tmp, path)


KNOWN_EXTS = (".parquet", ".avro", ".csv", ".json", ".jsonl", ".ndjson")
_UNSET = object()  # lazy-schema sentinel (None is a valid schema result)


def read_landed(path: str, schema=None) -> "object":
    """Read one landed file by extension — parquet natively, csv/json/
    avro through the converter surface (the reference's streaming ingest
    is likewise converter-fed). Returns an arrow Table.

    ``schema`` (the store's input schema) is pushed INTO the csv/json
    readers so type inference never runs on those columns — a cast
    after inference could not recover e.g. the leading zeros of an
    all-digit string id that inference turned into int64."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".parquet":
        return pq.read_table(path)
    if ext == ".avro":
        from geomesa_ray.sources.avro import read_avro_file

        return read_avro_file(path)
    if ext == ".csv":
        import pyarrow.csv as pcsv

        conv = None
        if schema is not None:
            conv = pcsv.ConvertOptions(
                column_types={f.name: f.type for f in schema})
        return pcsv.read_csv(path, convert_options=conv)
    if ext in (".json", ".jsonl", ".ndjson"):
        import pyarrow.json as pjson

        popts = None
        if schema is not None:
            popts = pjson.ParseOptions(explicit_schema=schema)
        return pjson.read_json(path, parse_options=popts)
    raise ValueError(f"unsupported landed format {ext!r} ({path})")


def _store_input_schema(store_dir: str):
    """The store's INPUT column schema (names from meta, types from a
    committed partition footer) — landed csv/json tables are CAST to it
    so type inference ('00123' -> int64) can't poison partitions."""
    import pyarrow as pa

    from geomesa_ray.state.manifest import completed_partitions
    from geomesa_ray.state.store import read_meta

    cols = read_meta(store_dir).get("columns", [])
    parts = completed_partitions(store_dir)
    if not parts:
        return None
    b = sorted(int(k) for k in parts)[0]
    full = pq.read_schema(
        os.path.join(store_dir, f"part={b}", "data.parquet"))
    return pa.schema([full.field(c) for c in cols if c in full.names])


def poll_once(incoming_dir: str, store_dir: str,
              pattern: str = "*.*",
              min_quiesce_s: float = 0.0,
              max_batch_bytes: int = 256 << 20) -> list[dict]:
    """Discover-and-apply one poll: every landed file with a KNOWN
    extension not yet in the commit log is applied (in name order — the
    deterministic offset order) and logged. Unknown extensions (editor
    temp files, producers' ``.tmp`` staging names) are IGNORED, so the
    recommended atomic-rename landing pattern composes cleanly.

    ``min_quiesce_s`` skips files modified less than that many seconds
    ago — the stabilization guard for producers that write text formats
    IN PLACE (a truncated csv/jsonl parses 'successfully'; parquet
    self-protects via its footer). Prefer atomic rename; the guard is
    for producers you don't control.

    A file that fails to READ or CAST is DEAD-LETTERED: logged with an
    ``error`` and never retried (a poison pill must not wedge the
    loop); fix and re-land it under a new name. Failures INSIDE the
    append itself (disk full, task errors) are NOT dead-lettered — they
    propagate, the files stay un-logged, and the next poll replays them
    (``append_store`` upserts by id, so replay is a no-op for the rows
    that did land). Returns the new log entries (applied and
    dead-lettered).

    Readable files discovered by one poll apply as batched upserts of
    at most ``max_batch_bytes`` per chunk (amortizing the
    affected-bucket rewrite — a normal poll is ONE append — while a
    large backlog never concats into one unbounded driver-side table);
    the files of a chunk share one snapshot version. An image_id landed
    by several files in the same poll keeps the LAST file's row (name
    order): within a chunk by explicit keep-last dedup, across chunks
    because chunks apply in file order and ``append_store`` upserts by
    id. The commit log is written AFTER each chunk's append commits —
    a crash replays only the un-logged chunks, which the id-upsert
    makes a no-op."""
    import time as _time

    import pyarrow as pa

    from geomesa_ray.state.store import append_store

    log = consumed_files(store_dir)
    seen = {e["file"] for e in log}
    schema = _UNSET  # computed lazily: idle polls never touch the store
    new = []
    batch: list[tuple[str, pa.Table]] = []
    dead = []
    for path in sorted(glob.glob(os.path.join(incoming_dir, pattern))):
        name = os.path.basename(path)
        if name in seen or not name.lower().endswith(KNOWN_EXTS):
            continue
        if min_quiesce_s > 0.0:
            try:
                age = _time.time() - os.path.getmtime(path)
            except OSError:
                continue  # renamed/deleted mid-poll; next poll resolves
            if age < min_quiesce_s:
                continue  # still settling; next poll picks it up
        if schema is _UNSET:
            schema = _store_input_schema(store_dir)
        try:
            t = read_landed(path, schema=schema)
            if schema is not None:
                t = t.select(schema.names).cast(schema)
        except FileNotFoundError:
            continue  # vanished mid-poll (mover/compactor); next poll
        except (pa.ArrowInvalid, KeyError, ValueError) as e:
            # PARSE errors only: a malformed landing is a poison pill —
            # retrying can never succeed, so record and move on.
            # Transient I/O errors (EIO/ESTALE on network storage) must
            # NOT be dead-lettered: they propagate like append-side
            # failures and the next poll replays the file.
            dead.append({"file": name, "rows": 0, "error": str(e)[:500]})
            continue
        batch.append((name, t))

    if dead:
        # dead letters commit immediately (independently of the append):
        # they must never be retried even if the append below fails
        log.extend(dead)
        _commit_log(store_dir, log)
        new.extend(dead)
    if not batch:
        return new

    # one batched upsert per <=max_batch_bytes chunk of landed files (a
    # backlog of N large files must not concat into one driver-side
    # table — peak memory stays bounded at the chunk cap, while a
    # normal poll still amortizes to a single append). Chunks apply in
    # file order, and append_store upserts by id, so a later chunk's
    # row still wins over an earlier chunk's — sequential semantics.
    chunks: list[list[tuple[str, pa.Table]]] = [[]]
    size = 0
    for name, t in batch:
        if chunks[-1] and size + t.nbytes > max_batch_bytes:
            chunks.append([])
            size = 0
        chunks[-1].append((name, t))
        size += t.nbytes

    applied = []
    for chunk in chunks:
        merged = pa.concat_tables([t for _, t in chunk]) \
            if len(chunk) > 1 else chunk[0][1]
        if len(chunk) > 1:
            # cross-file upsert order within the chunk: keep each id's
            # LAST row (file name order = offset order), matching
            # sequential application
            import numpy as np

            ids = np.asarray(merged.column("image_id").to_pylist(),
                             dtype=object)
            _, first_in_rev = np.unique(ids[::-1], return_index=True)
            keep = np.sort(len(ids) - 1 - first_in_rev)
            if len(keep) != len(ids):
                merged = merged.take(pa.array(keep))
        out = append_store(store_dir, merged, snapshot=True)
        entries = [{"file": name, "rows": t.num_rows,
                    "snapshot_version": out.get("snapshot_version"),
                    "touched_buckets": out.get("touched_buckets")}
                   for name, t in chunk]
        applied.extend(entries)
        # commit after EACH chunk's append: a crash replays only the
        # chunks that hadn't landed (replay is an id-upsert no-op)
        log.extend(entries)
        _commit_log(store_dir, log)
    new.extend(applied)
    return new


def continuous_ingest(incoming_dir: str, store_dir: str,
                      poll_interval_s: float = 1.0,
                      max_polls: int | None = None,
                      idle_polls_to_stop: int | None = None,
                      pattern: str = "*.*",
                      min_quiesce_s: float = 0.0) -> dict:
    """Run the consumer loop: poll the landing directory, apply new
    files, sleep, repeat. Bounded by ``max_polls`` and/or
    ``idle_polls_to_stop`` (consecutive empty polls) so tests and batch
    jobs terminate; run unbounded in a real deployment. Restartable at
    any time — the commit log skips consumed files. ``pattern`` and
    ``min_quiesce_s`` pass through to :func:`poll_once`; dead-lettered
    files count in ``files_dead_lettered``, not ``files_applied``."""
    polls = applied = rows = dead = 0
    idle = 0
    while True:
        new = poll_once(incoming_dir, store_dir, pattern=pattern,
                        min_quiesce_s=min_quiesce_s)
        polls += 1
        if new:
            idle = 0
            applied += sum(1 for e in new if "error" not in e)
            dead += sum(1 for e in new if "error" in e)
            rows += sum(e["rows"] for e in new)
        else:
            idle += 1
        if max_polls is not None and polls >= max_polls:
            break
        if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
            break
        time.sleep(poll_interval_s)
    out = {"polls": polls, "files_applied": applied, "rows_applied": rows}
    if dead:
        out["files_dead_lettered"] = dead
    return out
