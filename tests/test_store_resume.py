"""SpatialStore + resumability tests (FIXTURES.md F6): kill mid-write,
restart, assert completed partitions untouched and output identical."""

import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from geomesa_ray.pipelines.scan import SpatialQuery, exact_mask
from geomesa_ray.sources.fixtures import gen_images_table
from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat
from geomesa_ray.state.manifest import completed_partitions
from geomesa_ray.state.store import read_store, store_buckets_for_query, write_store


@pytest.fixture()
def store_dir(tmp_path):
    return str(tmp_path / "store")


class TestWriteRead:
    def test_write_then_read_roundtrip(self, ray_session, tiny_fixtures, store_dir):
        stats = write_store(tiny_fixtures, store_dir)
        assert stats["rows"] == 6000
        assert stats["partitions"] > 10
        assert stats["skew_factor"] < 3.0  # uniform corpus, mild skew
        ds = read_store(store_dir)
        ids = [r["image_id"] for r in ds.select_columns(["image_id"]).take_all()]
        assert len(ids) == 6000 and len(set(ids)) == 6000

    def test_store_rows_sorted_by_week_z3(self, ray_session, tiny_fixtures, store_dir):
        write_store(tiny_fixtures, store_dir)
        part = sorted(p for p in os.listdir(store_dir) if p.startswith("part="))[0]
        t = pq.read_table(os.path.join(store_dir, part, "data.parquet"))
        week = t.column("week").to_numpy()
        z3 = t.column("z3").to_numpy()
        key = week.astype(np.float64) * 2**63 + z3
        assert (np.diff(key) >= 0).all()

    def test_caption_byte_equality_through_store(self, ray_session, tiny_fixtures,
                                                 store_dir):
        write_store(tiny_fixtures, store_dir)
        got = {r["image_id"]: r["caption"]
               for r in read_store(store_dir).select_columns(
                   ["image_id", "caption"]).take_all()}
        ref = gen_images_table(6000)
        for i, c in zip(ref.column("image_id").to_pylist(),
                        ref.column("caption").to_pylist()):
            assert got[i] == c

    def test_pruned_query_read(self, ray_session, tiny_fixtures, store_dir):
        write_store(tiny_fixtures, store_dir)
        q = SpatialQuery(-10.0, 25.0, -5.0, 30.0)
        got = {r["image_id"] for r in read_store(store_dir, q).select_columns(
            ["image_id"]).take_all()}
        ref = gen_images_table(6000)
        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        dtg = phash_to_dtg_s(ref.column("phash").to_numpy())
        m = exact_mask(q, lon, lat, dtg)
        want = set(np.array(ref.column("image_id").to_pylist())[m].tolist())
        assert got == want

    def test_pruning_reads_fewer_buckets(self, ray_session):
        q = SpatialQuery(-10.0, 25.0, -5.0, 30.0)
        assert len(store_buckets_for_query(q, 3)) < 64


class TestResume:
    def test_restart_skips_completed(self, ray_session, tiny_fixtures, store_dir):
        # full reference run
        ref_dir = store_dir + "_ref"
        write_store(tiny_fixtures, ref_dir)

        # simulate a crashed run: copy only some completed partitions
        os.makedirs(store_dir)
        all_parts = sorted(p for p in os.listdir(ref_dir) if p.startswith("part="))
        parts = all_parts[: len(all_parts) // 2]
        for p in parts:
            shutil.copytree(os.path.join(ref_dir, p), os.path.join(store_dir, p))
        # the scheme meta is committed before any partition writes, so a
        # crashed run always carries it
        shutil.copy(os.path.join(ref_dir, "meta.json"),
                    os.path.join(store_dir, "meta.json"))
        mtimes = {p: os.path.getmtime(os.path.join(store_dir, p, "manifest.json"))
                  for p in parts}

        stats = write_store(tiny_fixtures, store_dir)  # resume
        # completed partitions were not rewritten
        for p, mt in mtimes.items():
            assert os.path.getmtime(os.path.join(store_dir, p, "manifest.json")) == mt

        # final output identical to the uninterrupted run
        a = completed_partitions(store_dir)
        b = completed_partitions(ref_dir)
        assert a == b
        assert stats["rows"] == 6000
        ids_a = sorted(r["image_id"] for r in read_store(store_dir)
                       .select_columns(["image_id"]).take_all())
        ids_b = sorted(r["image_id"] for r in read_store(ref_dir)
                       .select_columns(["image_id"]).take_all())
        assert ids_a == ids_b


class TestSaltedStore:
    def test_salted_write_and_pruned_read(self, ray_session, tiny_fixtures,
                                          tmp_path):
        from geomesa_ray.state.store import read_meta

        store = str(tmp_path / "salted")
        # low threshold: many buckets go hot and get split 4 ways
        stats = write_store(tiny_fixtures, store, hot_rows_threshold=50,
                            n_salt=4)
        assert stats["rows"] == 6000
        meta = read_meta(store)
        assert meta["salted"] and meta["n_salt"] == 4
        assert len(meta["hot_buckets"]) > 0
        # pruned query over the salted layout still exact
        q = SpatialQuery(-10.0, 25.0, -5.0, 30.0)
        got = {r["image_id"] for r in read_store(store, q)
               .select_columns(["image_id"]).take_all()}
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.pipelines.scan import exact_mask
        from geomesa_ray.stages.derive import phash_to_dtg_s, phash_to_lonlat

        ref = gen_images_table(6000)
        lon, lat = phash_to_lonlat(ref.column("phash").to_numpy())
        dtg = phash_to_dtg_s(ref.column("phash").to_numpy())
        m = exact_mask(q, lon, lat, dtg)
        want = set(np.array(ref.column("image_id").to_pylist())[m].tolist())
        assert got == want

    def test_salting_reduces_skew(self, ray_session, tiny_fixtures, tmp_path):
        plain = write_store(tiny_fixtures, str(tmp_path / "plain"))
        salted = write_store(tiny_fixtures, str(tmp_path / "salt"),
                             hot_rows_threshold=80, n_salt=4)
        assert salted["max_partition_rows"] < plain["max_partition_rows"]

    def test_indexed_knn_on_salted_store(self, ray_session, tiny_fixtures,
                                         tmp_path):
        from geomesa_ray.pipelines.knn import knn, knn_indexed

        store = str(tmp_path / "sknn")
        write_store(tiny_fixtures, store, hot_rows_threshold=50, n_salt=4)
        got = {(r["probe_id"], r["knn_rank"], r["image_id"])
               for r in knn_indexed(store, fixture_dir=tiny_fixtures).to_pylist()}
        want = {(r["probe_id"], r["knn_rank"], r["image_id"])
                for r in knn(tiny_fixtures, metric="planar").take_all()}
        assert got == want


class TestAppend:
    def test_append_upsert_idempotent(self, ray_session, tiny_fixtures, tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table_range
        from geomesa_ray.state.store import append_store

        store = str(tmp_path / "app")
        write_store(tiny_fixtures, store)
        new = gen_images_table_range(6000, 100)
        r1 = append_store(store, new)
        assert r1["touched_buckets"] > 0
        total = sum(m["rows"] for m in completed_partitions(store).values())
        assert total == 6100
        # idempotent: re-append the same rows -> unchanged
        append_store(store, new)
        total2 = sum(m["rows"] for m in completed_partitions(store).values())
        assert total2 == 6100
        # appended rows are queryable with payload intact
        ids = {r["image_id"] for r in read_store(store)
               .select_columns(["image_id"]).take_all()}
        assert "img00006050" in ids and len(ids) == 6100


class TestKillRestart:
    def test_sigkill_mid_ingest_then_restart(self, ray_session, tmp_path):
        """FIXTURES.md F6 faithful variant: SIGKILL a separate ingest
        process mid-run, restart, assert completed partitions untouched
        and final output identical to an uninterrupted run."""
        import subprocess
        import sys
        import time

        fdir = "/tmp/graft_fixtures/sf0.01"
        from geomesa_ray.sources.fixtures import ensure_fixtures

        ensure_fixtures("/root/testdata/sf0.01")
        store = str(tmp_path / "killed")
        ref = str(tmp_path / "ref")

        code = f"""
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, log_to_driver=False)
import sys; sys.path.insert(0, "/root/repo")
from geomesa_ray.state.store import write_store
write_store({fdir!r}, {store!r}, bucket_level=4)
"""
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        # kill once a meaningful fraction of partitions committed
        deadline = time.time() + 120
        while time.time() < deadline:
            done = len(completed_partitions(store))
            if done >= 40:
                break
            if proc.poll() is not None:
                break  # finished before we could kill: still a valid run
            time.sleep(0.05)
        killed = proc.poll() is None
        if killed:
            proc.kill()
            proc.wait()
        partial = completed_partitions(store)
        mtimes = {b: os.path.getmtime(os.path.join(store, f"part={b}",
                                                   "manifest.json"))
                  for b in partial}

        # restart in-process (same semantics as re-running the job)
        write_store(fdir, store, bucket_level=4)
        for b, mt in mtimes.items():
            assert os.path.getmtime(
                os.path.join(store, f"part={b}", "manifest.json")) == mt, \
                f"completed partition {b} was recomputed"

        write_store(fdir, ref, bucket_level=4)
        a = completed_partitions(store)
        b = completed_partitions(ref)
        assert a == b
        ids_a = sorted(r["image_id"] for r in read_store(store)
                       .select_columns(["image_id"]).take_all())
        assert len(ids_a) == 60000


class TestSchemeGuard:
    def test_resume_with_different_salting_raises(self, ray_session,
                                                  tiny_fixtures, tmp_path):
        import shutil as sh

        ref = str(tmp_path / "a")
        write_store(tiny_fixtures, ref)
        # simulate crash: keep meta + some partitions
        crashed = str(tmp_path / "b")
        os.makedirs(crashed)
        sh.copy(os.path.join(ref, "meta.json"), os.path.join(crashed, "meta.json"))
        parts = sorted(p for p in os.listdir(ref) if p.startswith("part="))[:5]
        for p in parts:
            sh.copytree(os.path.join(ref, p), os.path.join(crashed, p))
        with pytest.raises(ValueError, match="different partitioning scheme"):
            write_store(tiny_fixtures, crashed, hot_rows_threshold=50, n_salt=4)
        # same scheme resumes fine
        stats = write_store(tiny_fixtures, crashed)
        assert stats["rows"] == 6000

    def test_resume_with_different_columns_raises(self, ray_session,
                                                  tiny_fixtures, tmp_path):
        import shutil as sh

        ref = str(tmp_path / "c1")
        write_store(tiny_fixtures, ref, columns=["image_id", "phash"])
        crashed = str(tmp_path / "c2")
        os.makedirs(crashed)
        sh.copy(os.path.join(ref, "meta.json"), os.path.join(crashed, "meta.json"))
        p = sorted(x for x in os.listdir(ref) if x.startswith("part="))[0]
        sh.copytree(os.path.join(ref, p), os.path.join(crashed, p))
        with pytest.raises(ValueError, match="different partitioning scheme"):
            write_store(tiny_fixtures, crashed,
                        columns=["image_id", "phash", "caption"])


class TestSnapshotReplay:
    """Versioned snapshots — the batch replay surface
    (ReplayKafkaConsumerFeatureSource semantics: read state as of a
    committed generation)."""

    def test_time_travel_read(self, ray_session, tiny_fixtures, tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table_range
        from geomesa_ray.state.manifest import list_versions
        from geomesa_ray.state.store import append_store, snapshot_store

        store = str(tmp_path / "snap")
        write_store(tiny_fixtures, store)
        v1 = snapshot_store(store)
        assert v1 == 1
        r = append_store(store, gen_images_table_range(6000, 50))
        assert r["snapshot_version"] == 2
        r2 = append_store(store, gen_images_table_range(6050, 25))
        assert r2["snapshot_version"] == 3
        assert list_versions(store) == [1, 2, 3]
        # replay: row counts as of each generation
        n1 = read_store(store, version=1).count()
        n2 = read_store(store, version=2).count()
        n3 = read_store(store, version=3).count()
        nl = read_store(store).count()
        assert (n1, n2, n3) == (6000, 6050, 6075)
        assert nl == n3
        # version-1 files are immutable: ids added later must be absent
        ids1 = {r["image_id"] for r in read_store(store, version=1)
                .select_columns(["image_id"]).take_all()}
        assert "img00006010" not in ids1 and len(ids1) == 6000

    def test_pre_append_state_auto_pinned(self, ray_session, tiny_fixtures,
                                          tmp_path):
        """append_store on a never-snapshotted store pins the pre-state
        first, so the original generation is always replayable."""
        from geomesa_ray.sources.fixtures import gen_images_table_range
        from geomesa_ray.state.manifest import list_versions
        from geomesa_ray.state.store import append_store

        store = str(tmp_path / "auto")
        write_store(tiny_fixtures, store)
        append_store(store, gen_images_table_range(6000, 10))
        assert list_versions(store) == [1, 2]
        assert read_store(store, version=1).count() == 6000
        assert read_store(store, version=2).count() == 6010

    def test_versioned_query_pruning(self, ray_session, tiny_fixtures,
                                     tmp_path):
        from geomesa_ray.pipelines.scan import SpatialQuery
        from geomesa_ray.state.store import snapshot_store

        store = str(tmp_path / "vq")
        write_store(tiny_fixtures, store)
        snapshot_store(store)
        q = SpatialQuery(-10.0, 25.0, -5.0, 30.0)
        latest = {r["image_id"] for r in read_store(store, q)
                  .select_columns(["image_id"]).take_all()}
        v1 = {r["image_id"] for r in read_store(store, q, version=1)
              .select_columns(["image_id"]).take_all()}
        assert v1 == latest  # same state -> same pruned query result


class TestSnapshotCrashRecovery:
    def test_stale_hardlink_from_crashed_snapshot_is_refreshed(
            self, ray_session, tiny_fixtures, tmp_path):
        """A crashed snapshot attempt leaves data_v2.parquet hardlinks;
        after an append rewrites data.parquet, a new snapshot must NOT
        reuse the stale links (that would commit a mixed-generation,
        never-existed state)."""
        import os

        from geomesa_ray.sources.fixtures import gen_images_table_range
        from geomesa_ray.state.store import append_store, snapshot_store

        store = str(tmp_path / "crash")
        write_store(tiny_fixtures, store)
        snapshot_store(store)  # v1
        # simulate the crash: v2 links exist but versions/v2.json doesn't
        for name in os.listdir(store):
            if name.startswith("part="):
                src = os.path.join(store, name, "data.parquet")
                os.link(src, os.path.join(store, name, "data_v2.parquet"))
        append_store(store, gen_images_table_range(6000, 40),
                     snapshot=False)
        v2 = snapshot_store(store)
        assert v2 == 2
        assert read_store(store, version=2).count() == \
            read_store(store).count() == 6040


class TestStoreChanges:
    def test_cdc_between_versions(self, ray_session, tiny_fixtures, tmp_path):
        """read_store_changes = the live-consumer offset semantics:
        exactly the rows added/updated between two snapshots."""
        import pyarrow as pa

        from geomesa_ray.sources.fixtures import (
            gen_images_table,
            gen_images_table_range,
        )
        from geomesa_ray.state.store import (
            append_store,
            read_store_changes,
            snapshot_store,
        )

        store = str(tmp_path / "cdc")
        write_store(tiny_fixtures, store)
        snapshot_store(store)  # v1
        added = gen_images_table_range(6000, 30)
        append_store(store, added)  # v2
        # update: re-append one EXISTING row with a changed caption
        one = gen_images_table(6000).slice(10, 1)
        cols = {c: one.column(c) for c in one.column_names}
        cols["caption"] = pa.array(["EDITED caption"], pa.string())
        append_store(store, pa.table(cols))  # v3

        ch12 = read_store_changes(store, 1, 2).take_all()
        assert len(ch12) == 30
        assert all(r["change"] == "added" for r in ch12)
        assert {r["image_id"] for r in ch12} == set(
            added.column("image_id").to_pylist())

        ch23 = read_store_changes(store, 2, 3).take_all()
        assert len(ch23) == 1
        assert ch23[0]["change"] == "updated"
        assert ch23[0]["caption"] == "EDITED caption"

        ch13 = read_store_changes(store, 1, 3).take_all()
        assert len(ch13) == 31

        # no changes between identical versions
        assert read_store_changes(store, 3, 3).count() == 0


class TestDelete:
    def test_delete_by_id_and_time_travel(self, ray_session, tiny_fixtures,
                                          tmp_path):
        from geomesa_ray.state.store import delete_store, snapshot_store

        store = str(tmp_path / "del")
        write_store(tiny_fixtures, store)
        ids = ["img00000010", "img00000042", "img00005000"]
        r = delete_store(store, ids)
        assert r["deleted_rows"] == 3
        assert r["touched_buckets"] >= 1
        left = {x["image_id"] for x in read_store(store)
                .select_columns(["image_id"]).take_all()}
        assert not (set(ids) & left) and len(left) == 5997
        # deleting again is a no-op (idempotent)
        r2 = delete_store(store, ids)
        assert r2["deleted_rows"] == 0
        # pre-delete state is replayable
        assert read_store(store, version=1).count() == 6000


class TestCdcDeletions:
    def test_deletes_appear_in_change_feed(self, ray_session, tiny_fixtures,
                                           tmp_path):
        from geomesa_ray.state.store import (
            delete_store,
            read_store_changes,
            snapshot_store,
        )

        store = str(tmp_path / "cdcdel")
        write_store(tiny_fixtures, store)
        snapshot_store(store)  # v1
        r = delete_store(store, ["img00000010", "img00000042"])
        assert r["deleted_rows"] == 2 and r["snapshot_version"] == 2
        ch = read_store_changes(store, 1, 2).take_all()
        assert len(ch) == 2
        assert all(c["change"] == "deleted" for c in ch)
        assert {c["image_id"] for c in ch} == {"img00000010", "img00000042"}
        # deleted rows carry the old generation's payload
        assert all(c["caption"] for c in ch)
        # idempotent re-delete mints no new version
        r2 = delete_store(store, ["img00000010"])
        assert r2["deleted_rows"] == 0 and "snapshot_version" not in r2


class TestExpire:
    def test_age_off_by_week(self, ray_session, tiny_fixtures, tmp_path):
        """expire_store drops every row older than the cutoff week,
        prunes all-newer partitions at the manifest level, and leaves
        the pre-expiry generation replayable (KafkaDataStore
        expirationPeriod semantics, batch-deterministic)."""
        from geomesa_ray.state.store import expire_store

        store = str(tmp_path / "ageoff")
        write_store(tiny_fixtures, store)
        weeks = np.array([r["week"] for r in read_store(store)
                          .select_columns(["week"]).take_all()])
        cutoff = int(np.median(weeks))
        expect_gone = int((weeks < cutoff).sum())
        assert 0 < expect_gone < len(weeks)  # cutoff splits the corpus

        r = expire_store(store, before_week=cutoff)
        assert r["expired_rows"] == expect_gone
        assert r["snapshot_version"] == 2  # pre-state pinned as v1
        after = np.array([x["week"] for x in read_store(store)
                          .select_columns(["week"]).take_all()])
        assert len(after) == len(weeks) - expect_gone
        assert after.min() >= cutoff
        # pre-expiry generation fully replayable
        assert read_store(store, version=1).count() == len(weeks)
        # idempotent: nothing older than the cutoff remains
        r2 = expire_store(store, before_week=cutoff)
        assert r2["expired_rows"] == 0 and "snapshot_version" not in r2
        # second call prunes everything at the manifest level: every
        # surviving partition has week_min >= cutoff
        assert r2["touched_buckets"] == 0

    def test_fully_expired_partition_not_recandidated(
            self, ray_session, tiny_fixtures, tmp_path):
        """A partition expired to zero rows records a NULL week range
        (not fabricated 0/0 stats) and is never a candidate for later
        expire passes."""
        from geomesa_ray.state.store import expire_store

        store = str(tmp_path / "agezero")
        write_store(tiny_fixtures, store)
        weeks = np.array([r["week"] for r in read_store(store)
                          .select_columns(["week"]).take_all()])
        cutoff = int(weeks.max()) + 1  # expire EVERYTHING
        r = expire_store(store, before_week=cutoff, snapshot=False)
        assert r["expired_rows"] == len(weeks)
        manifests = completed_partitions(store)
        assert all(m["rows"] == 0 and m["week_min"] is None
                   and m["week_max"] is None for m in manifests.values())
        # a later pass prunes every emptied partition at the manifest
        # level — no re-read, no touch
        r2 = expire_store(store, before_week=cutoff + 10, snapshot=False)
        assert r2["expired_rows"] == 0 and r2["touched_buckets"] == 0
        assert r2["pruned_buckets"] == len(manifests)

    def test_manifest_prune_skips_new_partitions(self, ray_session,
                                                 tiny_fixtures, tmp_path):
        from geomesa_ray.state.store import expire_store

        store = str(tmp_path / "ageprune")
        write_store(tiny_fixtures, store)
        manifests = completed_partitions(store)
        wmins = sorted(int(m["week_min"]) for m in manifests.values())
        cutoff = wmins[0] + 1  # only the oldest-starting partitions qualify
        r = expire_store(store, before_week=cutoff, snapshot=False)
        n_cand = sum(1 for m in manifests.values()
                     if int(m["week_min"]) < cutoff)
        assert r["pruned_buckets"] == len(manifests) - n_cand
        assert r["touched_buckets"] <= n_cand


class TestVacuum:
    def test_retire_old_snapshots(self, ray_session, tiny_fixtures, tmp_path):
        """vacuum_store removes retired version records and their
        now-unreferenced pinned hardlinks; retained time travel and the
        live view survive."""
        from geomesa_ray.sources.fixtures import gen_images_table_range
        from geomesa_ray.state.manifest import list_versions
        from geomesa_ray.state.store import (
            append_store,
            snapshot_store,
            vacuum_store,
        )

        store = str(tmp_path / "vac")
        write_store(tiny_fixtures, store)
        snapshot_store(store)                               # v1
        append_store(store, gen_images_table_range(6000, 40))   # v2
        append_store(store, gen_images_table_range(6040, 20))   # v3
        n3 = read_store(store, version=3).count()

        r = vacuum_store(store, keep_last=1)
        assert r["retired_versions"] == [1, 2]
        assert r["unlinked_files"] > 0
        assert list_versions(store) == [3]
        # retained version and live view still read correctly
        assert read_store(store, version=3).count() == n3 == 6060
        assert read_store(store).count() == 6060
        # retired versions are gone
        with pytest.raises(ValueError):
            read_store(store, version=1).count()
        # only the retained pins remain on disk
        for b in completed_partitions(store):
            pins = [f for f in os.listdir(os.path.join(store, f"part={b}"))
                    if f.startswith("data_v")]
            assert len(pins) <= 1
        # idempotent
        r2 = vacuum_store(store, keep_last=1)
        assert r2["retired_versions"] == [] and r2["unlinked_files"] == 0

    def test_keep_last_validation_and_shared_pins(self, ray_session,
                                                 tiny_fixtures, tmp_path):
        """keep_last=0 refuses (latest snapshot anchors append CDC);
        a vacuum keeping several versions preserves each one's reads."""
        from geomesa_ray.sources.fixtures import gen_images_table_range
        from geomesa_ray.state.manifest import list_versions
        from geomesa_ray.state.store import (
            append_store,
            snapshot_store,
            vacuum_store,
        )

        store = str(tmp_path / "vac2")
        write_store(tiny_fixtures, store)
        snapshot_store(store)
        append_store(store, gen_images_table_range(6000, 10))
        append_store(store, gen_images_table_range(6010, 10))
        with pytest.raises(ValueError):
            vacuum_store(store, keep_last=0)
        r = vacuum_store(store, keep_last=2)
        assert r["retired_versions"] == [1]
        assert list_versions(store) == [2, 3]
        assert read_store(store, version=2).count() == 6010
        assert read_store(store, version=3).count() == 6020


class TestReindex:
    def test_repartition_to_finer_buckets(self, ray_session, tiny_fixtures,
                                          tmp_path):
        """reindex_store reads ONLY the committed source layout and
        rebuilds under a new scheme (SortedIndexUpdateJob semantics);
        contents survive byte-for-byte, partitioning changes."""
        from geomesa_ray.state.store import read_meta, reindex_store

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        write_store(tiny_fixtures, src, bucket_level=2)
        stats = reindex_store(src, dst, bucket_level=3)
        assert stats["rows"] == 6000
        assert read_meta(dst)["bucket_level"] == 3
        assert len(completed_partitions(dst)) > len(completed_partitions(src))

        def keyed(store):
            rows = read_store(store).select_columns(
                ["image_id", "caption", "phash", "week", "z3"]).take_all()
            return {r["image_id"]: (r["caption"], r["phash"], r["week"],
                                    r["z3"]) for r in rows}

        assert keyed(dst) == keyed(src)

    def test_copy_job_defaults_from_source_meta(self, ray_session,
                                                tiny_fixtures, tmp_path):
        from geomesa_ray.state.store import read_meta, reindex_store

        src = str(tmp_path / "csrc")
        dst = str(tmp_path / "cdst")
        write_store(tiny_fixtures, src)
        reindex_store(src, dst)  # SchemaCopyJob analog
        ms, md = read_meta(src), read_meta(dst)
        assert (ms["cell_level"], ms["bucket_level"], ms["columns"]) == \
               (md["cell_level"], md["bucket_level"], md["columns"])
        assert read_store(dst).count() == read_store(src).count()

    def test_enable_salting_via_reindex(self, ray_session, tiny_fixtures,
                                        tmp_path):
        """Salting can be switched on after the fact — the skew
        histogram pre-pass runs over the store, not the fixtures."""
        from geomesa_ray.state.store import read_meta, reindex_store

        src = str(tmp_path / "ssrc")
        dst = str(tmp_path / "sdst")
        write_store(tiny_fixtures, src)
        reindex_store(src, dst, hot_rows_threshold=50, n_salt=4)
        md = read_meta(dst)
        assert md["salted"] and md["hot_buckets"]
        assert read_store(dst).count() == 6000
        # pruned query reads agree between layouts
        q = SpatialQuery(-10.0, 25.0, -5.0, 30.0)
        a = {r["image_id"] for r in read_store(src, q)
             .select_columns(["image_id"]).take_all()}
        b = {r["image_id"] for r in read_store(dst, q)
             .select_columns(["image_id"]).take_all()}
        assert a == b

    def test_same_dir_rejected(self, ray_session, tiny_fixtures, tmp_path):
        from geomesa_ray.state.store import reindex_store

        src = str(tmp_path / "samedir")
        write_store(tiny_fixtures, src)
        with pytest.raises(ValueError):
            reindex_store(src, src)
