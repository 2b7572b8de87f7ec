"""As-of (temporal) join: each event matched to the latest image at or
before its timestamp.

The reference's closest analog is the interval intersection of tube-select
bins (``TubeBuilder.scala``); this is the general as-of shape from the
Ray-Data join playbook: sort the small (right) side once, broadcast it,
and probe with a vectorized ``searchsorted`` per batch — no shuffle. For
a right side too large to broadcast, co-partition both sides by time
bucket and apply the same kernel per bucket (``merge_asof`` pattern).

Determinism: image timestamps can collide, so the right side is first
reduced to one row per timestamp (min image_id) — making the result
unique and exactly reproducible by DuckDB's ASOF JOIN over the same
reduced relation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from geomesa_ray.sources.io import read_images, read_table
from geomesa_ray.stages.derive import derive_geometry
from geomesa_ray.util import gather_combine, resolve_broadcast


def _image_time_index(fixture_dir: str):
    """(sorted unique dtg_us, min image_id per dtg) — built with one
    distributed pass + small combine, then broadcast."""
    ds = read_images(fixture_dir, columns=["image_id", "phash"])
    ds = ds.map_batches(derive_geometry, batch_format="pyarrow")

    def min_id_per_ts(batch: pa.Table) -> pa.Table:
        """One row per timestamp, min image id — used as both the partial
        combiner and the final combine (it is idempotent)."""
        dtg = batch.column("dtg_s").to_numpy(zero_copy_only=False)
        ids = np.asarray(batch.column("image_id").to_pylist(), dtype=object)
        order = np.lexsort((ids, dtg))
        d_s, i_s = dtg[order], ids[order]
        uniq, start = np.unique(d_s, return_index=True)
        return pa.table({"dtg_s": pa.array(uniq),
                         "image_id": pa.array(i_s[start].tolist(), pa.string())})

    t = gather_combine(ds.map_batches(min_id_per_ts, batch_format="pyarrow"),
                       min_id_per_ts).take_all()
    dtg = np.array([r["dtg_s"] for r in t], dtype=np.int64)
    ids = np.asarray([r["image_id"] for r in t], dtype=object)
    return dtg, ids


def asof_join_events(sf_dir: str, fixture_dir: str) -> ray.data.Dataset:
    """(event_id, image_id): latest image with dtg <= event ts (events
    earlier than every image are dropped — inner as-of)."""
    dtg_s, ids = _image_time_index(fixture_dir)
    ref = ray.put((dtg_s * 1_000_000, ids))  # epoch micros for comparison

    def probe(batch: pa.Table) -> pa.Table:
        dtg_us, ids_ = resolve_broadcast(ref)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dtg_us, ts, "right") - 1
        keep = pos >= 0
        sel = np.nonzero(keep)[0]
        return pa.table({
            "event_id": batch.column("event_id").take(pa.array(sel)),
            "image_id": pa.array(ids_[pos[sel]].tolist(), pa.string()),
        })

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])
    return ds.map_batches(probe, batch_format="pyarrow", batch_size=65536)
