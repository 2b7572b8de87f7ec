"""Continuous-ingest consumer (reference: live Kafka consumer,
LiveKafkaConsumerFeatureSource.scala:136-160; replay
ReplayKafkaConsumerFeatureSource.scala:32-72) — landed files apply
incrementally, the commit log makes restarts skip consumed offsets, and
snapshots give replay + CDC between polls."""

import os

import pyarrow as pa
import pytest
import pyarrow.parquet as pq

from geomesa_ray.state.consumer import consumed_files, continuous_ingest, poll_once


def _slice_to_file(t: pa.Table, lo: int, hi: int, path: str) -> None:
    pq.write_table(t.slice(lo, hi - lo), path)


class TestConsumer:
    def _base(self, tmp_path, n_seed=1200):
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.state.store import write_store

        t = gen_images_table(2400)
        fdir = str(tmp_path / "seed")
        os.makedirs(fdir)
        _slice_to_file(t, 0, n_seed, os.path.join(fdir, "images.parquet"))
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "caption"])
        incoming = str(tmp_path / "incoming")
        os.makedirs(incoming)
        return t, store, incoming

    def test_lands_apply_in_order_and_log_commits(self, ray_session,
                                                  tmp_path):
        from geomesa_ray.state.store import read_store

        t, store, incoming = self._base(tmp_path)
        _slice_to_file(t, 1200, 1800, os.path.join(incoming, "b000.parquet"))
        _slice_to_file(t, 1800, 2400, os.path.join(incoming, "b001.parquet"))
        out = continuous_ingest(incoming, store, poll_interval_s=0.01,
                                max_polls=1)
        assert out["files_applied"] == 2 and out["rows_applied"] == 1200
        got = {r["image_id"] for r in read_store(store).take_all()}
        assert got == set(t.column("image_id").to_pylist())
        log = consumed_files(store)
        assert [e["file"] for e in log] == ["b000.parquet", "b001.parquet"]
        assert all(e["snapshot_version"] is not None for e in log)

    def test_restart_skips_consumed_and_replay_is_noop(self, ray_session,
                                                       tmp_path):
        from geomesa_ray.state.store import read_store

        t, store, incoming = self._base(tmp_path)
        _slice_to_file(t, 1200, 1800, os.path.join(incoming, "b000.parquet"))
        assert len(poll_once(incoming, store)) == 1
        before = {r["image_id"] for r in read_store(store).take_all()}
        # restart: same landing dir — nothing new to do
        assert poll_once(incoming, store) == []
        # a later file lands; only it applies
        _slice_to_file(t, 1800, 2400, os.path.join(incoming, "b001.parquet"))
        new = poll_once(incoming, store)
        assert [e["file"] for e in new] == ["b001.parquet"]
        after = {r["image_id"] for r in read_store(store).take_all()}
        assert before < after and len(after) == 2400

    def test_snapshots_give_cdc_between_polls(self, ray_session, tmp_path):
        from geomesa_ray.state.store import read_store_changes

        t, store, incoming = self._base(tmp_path)
        _slice_to_file(t, 1200, 1800, os.path.join(incoming, "b000.parquet"))
        entries = poll_once(incoming, store)
        v1 = entries[0]["snapshot_version"]
        _slice_to_file(t, 1800, 2400, os.path.join(incoming, "b001.parquet"))
        v2 = poll_once(incoming, store)[0]["snapshot_version"]
        changed = read_store_changes(store, v1, v2).take_all()
        added = {r["image_id"] for r in changed if r["change"] == "added"}
        assert added == set(t.column("image_id").to_pylist()[1800:2400])

    def test_converter_formats_land_too(self, ray_session, tmp_path):
        """CSV / JSON-lines / Avro landings apply through the converter
        surface, mirroring the reference's converter-fed streaming."""
        import pyarrow.csv as pcsv

        from geomesa_ray.sources.avro import write_avro_file
        from geomesa_ray.state.store import read_meta, read_store

        t, store, incoming = self._base(tmp_path)
        cols = read_meta(store)["columns"]
        pcsv.write_csv(t.slice(1200, 300).select(cols),
                       os.path.join(incoming, "a.csv"))
        avro_schema = {"type": "record", "name": "img", "fields": [
            {"name": "image_id", "type": "string"},
            {"name": "phash", "type": "long"},
            {"name": "caption", "type": "string"}]}
        write_avro_file(os.path.join(incoming, "b.avro"), avro_schema,
                        t.slice(1500, 300).select(cols).to_pylist())
        with open(os.path.join(incoming, "c.jsonl"), "w") as f:
            for r in t.slice(1800, 600).select(cols).to_pylist():
                import json

                f.write(json.dumps(r) + "\n")
        new = poll_once(incoming, store)
        assert [e["file"] for e in new] == ["a.csv", "b.avro", "c.jsonl"]
        got = {r["image_id"] for r in read_store(store).take_all()}
        assert got == set(t.column("image_id").to_pylist())

    def test_idle_stop_bound(self, ray_session, tmp_path):
        _, store, incoming = self._base(tmp_path)
        out = continuous_ingest(incoming, store, poll_interval_s=0.01,
                                idle_polls_to_stop=3)
        assert out == {"polls": 3, "files_applied": 0, "rows_applied": 0}


class TestConsumerHardening:
    """Review-r03 consumer hardening: stray files are ignored (atomic-
    rename staging composes), poison files dead-letter instead of
    wedging the loop, the store schema is pushed into text readers so
    inference can't poison partitions, and a quiesce window guards
    in-place writers."""

    def _base(self, tmp_path, n_seed=1200):
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.state.store import write_store

        t = gen_images_table(2400)
        fdir = str(tmp_path / "seed")
        os.makedirs(fdir)
        _slice_to_file(t, 0, n_seed, os.path.join(fdir, "images.parquet"))
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "caption"])
        incoming = str(tmp_path / "incoming")
        os.makedirs(incoming)
        return t, store, incoming

    def test_unknown_extensions_ignored(self, ray_session, tmp_path):
        t, store, incoming = self._base(tmp_path)
        staged = os.path.join(incoming, "b000.parquet.tmp")
        _slice_to_file(t, 1200, 1800, staged)
        with open(os.path.join(incoming, "notes.txt"), "w") as f:
            f.write("hello")
        assert poll_once(incoming, store) == []
        # atomic rename completes the landing; next poll applies it
        os.rename(staged, os.path.join(incoming, "b000.parquet"))
        new = poll_once(incoming, store)
        assert [e["file"] for e in new] == ["b000.parquet"]
        assert new[0]["rows"] == 600

    def test_poison_file_dead_letters_and_loop_continues(
            self, ray_session, tmp_path):
        t, store, incoming = self._base(tmp_path)
        with open(os.path.join(incoming, "aa_bad.parquet"), "wb") as f:
            f.write(b"this is not parquet")
        _slice_to_file(t, 1200, 1800,
                       os.path.join(incoming, "zz_good.parquet"))
        new = poll_once(incoming, store)
        assert [e["file"] for e in new] == \
            ["aa_bad.parquet", "zz_good.parquet"]
        assert new[0]["rows"] == 0 and "error" in new[0]
        assert new[1]["rows"] == 600 and "error" not in new[1]
        # the poison entry is committed: never retried
        assert poll_once(incoming, store) == []

    def test_schema_pushed_into_csv_reader(self, ray_session, tmp_path):
        """All-digit string ids land via CSV: inference alone would
        read them int64 and lose leading zeros; the store schema is
        pushed into the reader so they stay strings bit-exactly."""
        import pyarrow.csv as pcsv

        from geomesa_ray.state.store import read_meta, read_store

        t, store, incoming = self._base(tmp_path)
        cols = read_meta(store)["columns"]
        sl = t.slice(1200, 100).select(cols)
        digit_ids = pa.array([f"{900000 + i:010d}" for i in range(100)])
        sl = sl.set_column(sl.schema.get_field_index("image_id"),
                           "image_id", digit_ids)
        pcsv.write_csv(sl, os.path.join(incoming, "d.csv"))
        new = poll_once(incoming, store)
        assert new[0]["rows"] == 100 and "error" not in new[0]
        got = {r["image_id"] for r in read_store(store).take_all()}
        assert "0000900000" in got and "0000900099" in got

    def test_quiesce_defers_fresh_files(self, ray_session, tmp_path):
        import time as _t

        t, store, incoming = self._base(tmp_path)
        path = os.path.join(incoming, "b000.parquet")
        _slice_to_file(t, 1200, 1800, path)
        assert poll_once(incoming, store, min_quiesce_s=60.0) == []
        old = _t.time() - 120
        os.utime(path, (old, old))
        new = poll_once(incoming, store, min_quiesce_s=60.0)
        assert [e["file"] for e in new] == ["b000.parquet"]


class TestDeadLetterScope:
    """Dead-lettering is scoped to read/cast failures only: an append
    failure propagates and leaves the file un-logged so the next poll
    replays it (upsert-by-id makes replay safe)."""

    def _base(self, tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.state.store import write_store

        t = gen_images_table(2400)
        fdir = str(tmp_path / "seed")
        os.makedirs(fdir)
        _slice_to_file(t, 0, 1200, os.path.join(fdir, "images.parquet"))
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "caption"])
        incoming = str(tmp_path / "incoming")
        os.makedirs(incoming)
        return t, store, incoming

    def test_append_failure_propagates_and_file_replays(
            self, ray_session, tmp_path, monkeypatch):
        from geomesa_ray.state import store as store_mod
        from geomesa_ray.state.store import read_store

        t, store, incoming = self._base(tmp_path)
        _slice_to_file(t, 1200, 1800, os.path.join(incoming, "b.parquet"))

        def boom(*a, **kw):
            raise OSError("disk full")

        monkeypatch.setattr(store_mod, "append_store", boom)
        with pytest.raises(OSError, match="disk full"):
            poll_once(incoming, store)
        # NOT dead-lettered: the commit log has no entry for the file
        assert consumed_files(store) == []
        monkeypatch.undo()
        new = poll_once(incoming, store)  # replay applies it
        assert [e["file"] for e in new] == ["b.parquet"]
        got = {r["image_id"] for r in read_store(store).take_all()}
        assert len(got) == 1800

    def test_dead_letters_counted_separately(self, ray_session, tmp_path):
        t, store, incoming = self._base(tmp_path)
        with open(os.path.join(incoming, "bad.csv"), "wb") as f:
            f.write(b"\x00\x01\x02 not a csv \xff")
        _slice_to_file(t, 1200, 1800, os.path.join(incoming, "ok.parquet"))
        out = continuous_ingest(incoming, store, poll_interval_s=0.01,
                                max_polls=1)
        assert out["files_applied"] == 1 and out["rows_applied"] == 600
        assert out["files_dead_lettered"] == 1


class TestBatchedPoll:
    """All files discovered in one poll apply as ONE batched upsert
    (amortized bucket rewrite, one snapshot per poll); cross-file
    duplicate ids keep the last file's row — exactly the sequential
    semantics."""

    def _base(self, tmp_path):
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.state.store import write_store

        t = gen_images_table(2400)
        fdir = str(tmp_path / "seed")
        os.makedirs(fdir)
        _slice_to_file(t, 0, 1200, os.path.join(fdir, "images.parquet"))
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "caption"])
        incoming = str(tmp_path / "incoming")
        os.makedirs(incoming)
        return t, store, incoming

    def test_one_append_per_poll(self, ray_session, tmp_path, monkeypatch):
        from geomesa_ray.state import store as store_mod
        from geomesa_ray.state.store import read_store

        t, store, incoming = self._base(tmp_path)
        for i in range(4):
            _slice_to_file(t, 1200 + 300 * i, 1500 + 300 * i,
                           os.path.join(incoming, f"b{i:03d}.parquet"))
        calls = []
        real = store_mod.append_store

        def counting(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(store_mod, "append_store", counting)
        new = poll_once(incoming, store)
        assert len(new) == 4 and len(calls) == 1
        # one snapshot version shared by the whole poll
        assert len({e["snapshot_version"] for e in new}) == 1
        got = {r["image_id"] for r in read_store(store).take_all()}
        assert got == set(t.column("image_id").to_pylist())

    def test_cross_file_duplicate_keeps_last(self, ray_session, tmp_path):
        from geomesa_ray.state.store import read_store

        t, store, incoming = self._base(tmp_path)
        dup_id = t.column("image_id")[1200].as_py()
        early = t.slice(1200, 1).set_column(
            t.schema.get_field_index("caption"), "caption",
            pa.array(["EARLY"]))
        late = t.slice(1200, 1).set_column(
            t.schema.get_field_index("caption"), "caption",
            pa.array(["LATE"]))
        pq.write_table(early, os.path.join(incoming, "a0.parquet"))
        pq.write_table(late, os.path.join(incoming, "z9.parquet"))
        new = poll_once(incoming, store)
        assert [e["file"] for e in new] == ["a0.parquet", "z9.parquet"]
        rows = [r for r in read_store(store).take_all()
                if r["image_id"] == dup_id]
        assert len(rows) == 1 and rows[0]["caption"] == "LATE"


class TestChunkedPoll:
    """A poll's merge is bounded by max_batch_bytes: a backlog applies
    in file-order chunks (bounded driver memory), each chunk one append
    with its own snapshot; sequential semantics preserved."""

    def test_backlog_applies_in_chunks(self, ray_session, tmp_path,
                                       monkeypatch):
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.state import store as store_mod
        from geomesa_ray.state.store import read_store, write_store

        t = gen_images_table(2400)
        fdir = str(tmp_path / "seed")
        os.makedirs(fdir)
        _slice_to_file(t, 0, 1200, os.path.join(fdir, "images.parquet"))
        store = str(tmp_path / "store")
        write_store(fdir, store, columns=["image_id", "phash", "caption"])
        incoming = str(tmp_path / "incoming")
        os.makedirs(incoming)
        for i in range(4):
            _slice_to_file(t, 1200 + 300 * i, 1500 + 300 * i,
                           os.path.join(incoming, f"b{i:03d}.parquet"))
        calls = []
        real = store_mod.append_store

        def counting(store_dir, tbl, **kw):
            calls.append(tbl.num_rows)
            return real(store_dir, tbl, **kw)

        monkeypatch.setattr(store_mod, "append_store", counting)
        # nbytes of the table as the consumer actually batches it:
        # landed files are projected/cast to the store's input schema
        one_file_bytes = pq.read_table(
            os.path.join(incoming, "b000.parquet")).select(
            ["image_id", "phash", "caption"]).nbytes
        new = poll_once(incoming, store,
                        max_batch_bytes=2 * one_file_bytes)
        assert len(new) == 4
        assert len(calls) == 2 and calls == [600, 600]  # 2 files/chunk
        # chunks got distinct snapshots; all files logged
        assert len({e["snapshot_version"] for e in new}) == 2
        got = {r["image_id"] for r in read_store(store).take_all()}
        assert got == set(t.column("image_id").to_pylist())
