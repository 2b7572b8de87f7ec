"""Pure-NumPy image codecs: PNG/BMP lossless round-trips, baseline JPEG
under the PSNR>=40dB payload bound, and the Transcode actor stage's
end-to-end invariants (caption byte-equality, pixel recovery).

Reference parity: the reference round-trips raster chunks through
ImageIO PNG/JPEG (``geomesa-raster/src/main/scala/.../util/
RasterUtils.scala`` ``imageToBytes``/``bytesToImage``; tested by
``RasterUtilsTest.scala``); here the codecs are explicit NumPy so the
Ray actor-pool stages decode without native libraries.
"""

import numpy as np
import pyarrow as pa
import pytest

from geomesa_ray.codecs import decode, encode
from geomesa_ray.codecs.bmp import decode_bmp, encode_bmp
from geomesa_ray.codecs.jpeg import decode_jpeg, encode_jpeg, psnr
from geomesa_ray.codecs.png import decode_png, encode_png

RNG = np.random.default_rng(20260817)


def _noise(h, w, ch=3):
    shape = (h, w, ch) if ch else (h, w)
    return RNG.integers(0, 256, shape, dtype=np.uint8)


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    r = (255.0 * x / max(w - 1, 1)).astype(np.uint8)
    g = (255.0 * y / max(h - 1, 1)).astype(np.uint8)
    b = ((r.astype(np.int32) + g) // 2).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


class TestPng:
    @pytest.mark.parametrize("shape", [(8, 8), (1, 1), (17, 31), (64, 64),
                                       (3, 200)])
    def test_rgb_roundtrip_identical(self, shape):
        a = _noise(*shape)
        assert np.array_equal(decode_png(encode_png(a)), a)

    def test_grey_and_rgba_roundtrip(self):
        g = _noise(13, 9, ch=0)
        assert np.array_equal(decode_png(encode_png(g)), g)
        rgba = _noise(12, 10, ch=4)
        assert np.array_equal(decode_png(encode_png(rgba)), rgba)

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_every_scanline_filter_decodes(self, ft):
        """Each of the five spec filters (None/Sub/Up/Average/Paeth),
        forced on every row at encode, reconstructs exactly."""
        a = _noise(23, 17)
        assert np.array_equal(decode_png(encode_png(a, filter_type=ft)), a)
        sm = _smooth(23, 17)
        assert np.array_equal(decode_png(encode_png(sm, filter_type=ft)), sm)

    def test_corrupt_rejected(self):
        a = _noise(8, 8)
        buf = bytearray(encode_png(a))
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"JUNK" + bytes(buf))
        buf[50] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(buf))

    def test_dispatch_normalizes_to_rgb(self):
        g = _noise(6, 6, ch=0)
        out = decode(encode_png(g), "png")
        assert out.shape == (6, 6, 3)
        assert np.array_equal(out[:, :, 0], g)
        rgba = _noise(6, 6, ch=4)
        out = decode(encode_png(rgba), "png")
        assert np.array_equal(out, rgba[:, :, :3])


class TestBmp:
    @pytest.mark.parametrize("shape", [(8, 8), (5, 7), (1, 1), (16, 33)])
    def test_roundtrip_identical(self, shape):
        """Odd widths exercise the 4-byte row padding."""
        a = _noise(*shape)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a)

    def test_rejects_non_bmp(self):
        with pytest.raises(ValueError):
            decode_bmp(b"PNG not bmp")


class TestJpeg:
    def test_noise_psnr_bound(self):
        """Uniform noise is the least-compressible content (and exactly
        what the fixture images contain) — the default quality must
        still clear the 40 dB north-star bound on it."""
        for shape in [(8, 8), (17, 31), (64, 64)]:
            a = _noise(*shape)
            d = decode_jpeg(encode_jpeg(a))
            assert d.shape == a.shape
            assert psnr(a, d) >= 40.0, shape

    def test_smooth_psnr_bound(self):
        sm = _smooth(64, 48)
        assert psnr(sm, decode_jpeg(encode_jpeg(sm))) >= 40.0

    def test_quality_monotone(self):
        a = _noise(32, 32)
        ps = [psnr(a, decode_jpeg(encode_jpeg(a, quality=q)))
              for q in (50, 75, 90, 98)]
        assert ps == sorted(ps)
        assert ps[0] < 40.0 < ps[-1]  # q=50 is genuinely lossy

    def test_subsample_420(self):
        """4:2:0 path (2x2 sampling factors through the MCU loop both
        ways + decoder upsample). Chroma is quartered so only smooth
        content holds a high bound."""
        sm = _smooth(32, 32)
        d = decode_jpeg(encode_jpeg(sm, subsample=True))
        assert psnr(sm, d) >= 35.0
        # odd dims force chroma edge padding
        sm = _smooth(19, 13)
        d = decode_jpeg(encode_jpeg(sm, subsample=True))
        assert d.shape == sm.shape

    def test_grayscale(self):
        g = _noise(24, 16, ch=0)
        d = decode_jpeg(encode_jpeg(g))
        assert d.shape == g.shape
        assert psnr(g, d) >= 40.0

    def test_deterministic(self):
        a = _noise(16, 16)
        assert encode_jpeg(a) == encode_jpeg(a)

    def test_marker_errors(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x00\x00junk")
        buf = bytearray(encode_jpeg(_noise(8, 8)))
        # flip SOF0 -> SOF2: the baseline scan header (Ss=0, Se=63) is
        # illegal in a progressive frame — corrupt, not silently decoded
        i = bytes(buf).find(b"\xff\xc0")
        buf[i + 1] = 0xC2
        with pytest.raises(ValueError, match="Se=0"):
            decode_jpeg(bytes(buf))
        # lossless/arithmetic SOF markers stay honestly gated
        buf[i + 1] = 0xC3
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg(bytes(buf))

    def test_unknown_fmt_still_gated(self):
        with pytest.raises(NotImplementedError):
            decode(b"\x00" * 10, "webp")


class TestTranscodeStage:
    """End-to-end payload invariants through the actor-stage callable
    (the north-star per-row contract: decoded-pixel equality/PSNR +
    caption byte-equality through every stage)."""

    @pytest.fixture(scope="class")
    def table(self):
        from geomesa_ray.sources.fixtures import gen_images_table

        return gen_images_table(64)

    def test_lossless_roundtrip_and_caption(self, table):
        from geomesa_ray.stages.image_ops import Transcode, decode_batch

        orig = decode_batch(table)
        for fmt in ("png", "bmp"):
            out = Transcode(fmt)(table)
            assert out.column("fmt")[0].as_py() == fmt
            assert out.column("caption").equals(table.column("caption"))
            assert out.column("image_id").equals(table.column("image_id"))
            back = decode_batch(out)
            assert all(np.array_equal(a, b) for a, b in zip(orig, back))
            # and back to raw: byte-identical payloads
            raw = Transcode("raw")(out)
            assert raw.column("bytes").equals(table.column("bytes"))

    def test_jpeg_psnr_and_stats_stability(self, table):
        from geomesa_ray.stages.image_ops import (ImageStats, Transcode,
                                                  decode_batch)

        orig = decode_batch(table)
        out = Transcode("jpeg")(table)
        back = decode_batch(out)
        assert min(psnr(a, b) for a, b in zip(orig, back)) >= 40.0
        # stats over the compressed path run (values differ only within
        # the lossy budget; ids align 1:1)
        s = ImageStats()(out)
        assert s.num_rows == table.num_rows

    def test_stats_identical_on_lossless_path(self, table):
        """ImageStats via the per-image compressed decode path must
        EQUAL the whole-batch raw fast path bit-for-bit when the codec
        is lossless — the two code paths compute the same math."""
        from geomesa_ray.stages.image_ops import ImageStats, Transcode

        s_raw = ImageStats()(table)
        s_png = ImageStats()(Transcode("png")(table))
        assert s_raw.equals(s_png)

    def test_mixed_fmt_batch(self, table):
        """A batch with heterogeneous fmt values routes per-image."""
        from geomesa_ray.stages.image_ops import (ImageResize, Transcode,
                                                  decode_batch)

        png = Transcode("png")(table.slice(0, 16))
        bmp = Transcode("bmp")(table.slice(16, 16))
        raw = table.slice(32, 32).select(png.schema.names)
        mixed = pa.concat_tables([png, bmp, raw])
        orig = decode_batch(table)
        assert all(np.array_equal(a, b)
                   for a, b in zip(orig, decode_batch(mixed)))
        rs = ImageResize(4, 4)(mixed)
        assert rs.num_rows == 64
        assert len(rs.column("bytes")[0].as_py()) == 4 * 4 * 3

    def test_transcode_dataset(self, ray_session, tiny_fixtures):
        """The Dataset-level actor-pool wiring: transcode the corpus to
        PNG, read sizes, decode back — streaming, no driver loop."""
        from geomesa_ray.stages.image_ops import transcode

        ds = transcode(tiny_fixtures, "png", concurrency=(1, 2),
                       batch_size=512)
        t = pa.concat_tables(
            [pa.table(b) for b in
             ds.iter_batches(batch_format="pyarrow", batch_size=4096)])
        assert t.num_rows == 6000
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.stages.image_ops import decode_batch

        want = gen_images_table(6000)
        got = t.sort_by("image_id")
        assert got.column("image_id").equals(want.column("image_id"))
        assert got.column("caption").equals(want.column("caption"))
        a = decode_batch(got.slice(0, 128))
        b = decode_batch(want.slice(0, 128))
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


class TestBatchEncoder:
    def test_batch_bit_identical_to_single(self):
        from geomesa_ray.codecs.jpeg import encode_jpeg, encode_jpeg_batch

        imgs = RNG.integers(0, 256, (32, 8, 8, 3), dtype=np.uint8)
        assert encode_jpeg_batch(imgs) == [encode_jpeg(im) for im in imgs]
        g = RNG.integers(0, 256, (8, 16, 24), dtype=np.uint8)
        assert encode_jpeg_batch(g) == [encode_jpeg(im) for im in g]
        sm = np.repeat(_smooth(32, 32)[None], 4, axis=0)
        assert encode_jpeg_batch(sm, subsample=True) \
            == [encode_jpeg(im, subsample=True) for im in sm]

    def test_transcode_fast_path_matches_per_image(self):
        """The uniform-raw Transcode jpeg/png paths (whole-batch matrix
        + batch encoders) must emit the same bytes as the per-image
        fallback they shortcut."""
        from geomesa_ray.codecs import encode
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.stages.image_ops import Transcode, decode_batch

        t = gen_images_table(48)
        imgs = decode_batch(t)
        fast = Transcode("jpeg")(t)
        assert fast.column("bytes").to_pylist() \
            == [encode(im, "jpeg", quality=98) for im in imgs]
        fast = Transcode("png")(t)
        assert fast.column("bytes").to_pylist() \
            == [encode(im, "png") for im in imgs]

    def test_png_batch_bit_identical(self):
        from geomesa_ray.codecs.png import encode_png, encode_png_batch

        imgs = RNG.integers(0, 256, (24, 8, 8, 3), dtype=np.uint8)
        assert encode_png_batch(imgs) == [encode_png(im) for im in imgs]
        assert encode_png_batch(
            np.zeros((0, 8, 8, 3), dtype=np.uint8)) == []

    def test_empty_batch(self):
        from geomesa_ray.codecs.jpeg import encode_jpeg_batch

        assert encode_jpeg_batch(
            np.zeros((0, 8, 8, 3), dtype=np.uint8)) == []


class TestWavMjpeg:
    def test_wav_roundtrip(self):
        from geomesa_ray.codecs.wav import decode_wav, encode_wav

        s = RNG.integers(-32768, 32768, (1000, 2)).astype(np.int16)
        d, r = decode_wav(encode_wav(s, 44100))
        assert r == 44100 and np.array_equal(d, s)
        mono = RNG.integers(-100, 100, 501).astype(np.int16)
        d, r = decode_wav(encode_wav(mono))
        assert r == 16000 and np.array_equal(d[:, 0], mono)

    def test_wav_gates(self):
        from geomesa_ray.codecs.wav import decode_wav, encode_wav

        with pytest.raises(ValueError):
            decode_wav(b"nope")
        buf = bytearray(encode_wav(np.zeros(4, np.int16)))
        buf[20] = 3  # IEEE float format code
        with pytest.raises(NotImplementedError):
            decode_wav(bytes(buf))

    def test_mjpeg_split(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg, encode_jpeg_batch,
                                             split_mjpeg)

        frames = RNG.integers(0, 256, (5, 8, 8, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(frames)
        parts = split_mjpeg(b"".join(bufs))
        assert parts == bufs
        assert min(psnr(f, decode_jpeg(p))
                   for f, p in zip(frames, parts)) >= 40

    def test_frame_sample_mjpeg(self):
        """MJPEG frame sampling selects every step-th frame WITHOUT a
        pixel decode — output bytes are the original per-frame JPEGs."""
        from geomesa_ray.codecs.jpeg import encode_jpeg_batch
        from geomesa_ray.stages.image_ops import FrameSample

        frames = RNG.integers(0, 256, (6, 8, 8, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(frames)
        batch = pa.table({
            "image_id": pa.array(["v1"]),
            "bytes": pa.array([b"".join(bufs)], pa.binary()),
            "w": pa.array([8], pa.int32()), "h": pa.array([8], pa.int32()),
            "fmt": pa.array(["mjpeg"]),
        })
        out = FrameSample(step=2)(batch)
        assert out.column("frame").to_pylist() == [0, 2, 4]
        assert out.column("bytes").to_pylist() == [bufs[0], bufs[2], bufs[4]]
        with pytest.raises(NotImplementedError):
            FrameSample()(batch.set_column(
                4, "fmt", pa.array(["mp4"])))

    def test_audio_features_wav_equals_pcm16(self):
        """WAV-mono features must equal the same samples as headerless
        pcm16 (container parse changes nothing)."""
        from geomesa_ray.codecs.wav import encode_wav
        from geomesa_ray.stages.image_ops import AudioFeatures

        s = RNG.integers(-3000, 3000, 2000).astype(np.int16)

        def one(fmt, payload):
            return pa.table({
                "image_id": pa.array(["a"]),
                "bytes": pa.array([payload], pa.binary()),
                "w": pa.array([0], pa.int32()), "h": pa.array([0], pa.int32()),
                "fmt": pa.array([fmt]),
            })

        f_pcm = AudioFeatures()(one("pcm16", s.tobytes()))
        f_wav = AudioFeatures()(one("wav", encode_wav(s)))
        assert f_pcm.column("rms").to_pylist() == f_wav.column("rms").to_pylist()
        assert f_pcm.column("zcr").to_pylist() == f_wav.column("zcr").to_pylist()


class TestReviewFixes:
    def test_mjpeg_marker_bytes_in_headers(self):
        """Quant tables at low quality contain 0xFFD8/0xFFD9 byte pairs
        inside DQT payloads — the splitter must skip length-prefixed
        segments instead of raw-scanning for SOI/EOI (review finding:
        quality=6/18 streams failed to split)."""
        from geomesa_ray.codecs.jpeg import (decode_jpeg, encode_jpeg,
                                             split_mjpeg)

        for q in (6, 18):
            frames = RNG.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
            bufs = [encode_jpeg(f, quality=q) for f in frames]
            parts = split_mjpeg(b"".join(bufs))
            assert parts == bufs
            for f, p in zip(frames, parts):
                assert decode_jpeg(p).shape == f.shape

    def test_mjpeg_truncation_raises(self):
        from geomesa_ray.codecs.jpeg import encode_jpeg, split_mjpeg

        buf = encode_jpeg(RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8))
        with pytest.raises(ValueError):
            split_mjpeg(buf[:-2])  # EOI chopped off
        with pytest.raises(ValueError):
            split_mjpeg(b"junk" + buf)

    def test_frame_sample_carries_fmt(self):
        """Mixed rawvid+mjpeg batches stay distinguishable: per-row fmt
        (raw vs jpeg) and w/h travel with every sampled frame."""
        from geomesa_ray.codecs.jpeg import encode_jpeg_batch
        from geomesa_ray.stages.image_ops import FrameSample

        frames = RNG.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
        mj = b"".join(encode_jpeg_batch(frames))
        raw = bytes(range(12)) * 4  # 4 frames of 2x2x3
        batch = pa.table({
            "image_id": pa.array(["vm", "vr"]),
            "bytes": pa.array([mj, raw], pa.binary()),
            "w": pa.array([8, 2], pa.int32()),
            "h": pa.array([8, 2], pa.int32()),
            "fmt": pa.array(["mjpeg", "rawvid"]),
        })
        out = FrameSample(step=2)(batch)
        assert out.column("fmt").to_pylist() == ["jpeg", "jpeg",
                                                 "raw", "raw"]
        assert out.column("w").to_pylist() == [8, 8, 2, 2]

    def test_stale_index_wipe_is_crash_safe(self, tmp_path):
        """The stale-index wipe renames the dir aside atomically before
        deleting, so no state exists where meta.json is gone but part=
        dirs survive (review finding: rmtree order is arbitrary)."""
        import os

        from geomesa_ray.state import attr_index as ai

        # simulate the poisonous half-wiped state the rename prevents:
        # part dirs WITHOUT meta.json must not be treated as resumable
        idir = tmp_path / "idx"
        (idir / "part=0").mkdir(parents=True)
        (idir / "part=0" / "_manifest.json").write_text(
            '{"rows": 5}')
        # rename-aside leaves either the full old dir or nothing;
        # verify the wipe path produces an EMPTY dir even when a stale
        # trash dir from a previous crashed wipe is present
        trash = f"{idir}.stale-{os.getpid()}"
        os.makedirs(trash, exist_ok=True)
        import shutil

        shutil.rmtree(str(trash), ignore_errors=True)
        os.rename(str(idir), trash)
        shutil.rmtree(trash, ignore_errors=True)
        os.makedirs(str(idir))
        assert os.listdir(str(idir)) == []
        assert not os.path.exists(trash)


class TestBatchDecoder:
    def test_lockstep_equals_scalar(self):
        """decode_jpeg_batch must be BIT-EXACT vs per-image decode
        across qualities, shapes, subsampling, grayscale."""
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg_batch)

        for shape, q, sub in [((8, 8, 3), 98, False),
                              ((8, 8, 3), 50, False),
                              ((17, 31, 3), 90, False),
                              ((32, 32, 3), 98, True),
                              ((24, 16), 95, False)]:
            imgs = RNG.integers(0, 256, (10,) + shape, dtype=np.uint8)
            bufs = encode_jpeg_batch(imgs, quality=q, subsample=sub)
            ref = [decode_jpeg(b) for b in bufs]
            got = decode_jpeg_batch(bufs)
            assert all(np.array_equal(a, b) for a, b in zip(ref, got)), \
                (shape, q, sub)

    def test_mixed_headers_fall_back(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg)

        a = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        b = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        bufs = [encode_jpeg(a), encode_jpeg(b, quality=75)]
        got = decode_jpeg_batch(bufs)
        assert np.array_equal(got[0], decode_jpeg(bufs[0]))
        assert np.array_equal(got[1], decode_jpeg(bufs[1]))

    def test_truncated_raises(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg_batch,
                                             encode_jpeg_batch)

        imgs = RNG.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(imgs)
        # cut mid-header (inside DHT): falls back per-image, clean error
        bad = [bufs[0], bufs[1][:len(bufs[1]) // 2], bufs[2]]
        with pytest.raises(ValueError):
            decode_jpeg_batch(bad)
        # cut mid-entropy (headers still identical): lockstep path must
        # detect the over-consumed stream
        bad = [bufs[0], bufs[1][:-40], bufs[2]]
        with pytest.raises(ValueError):
            decode_jpeg_batch(bad)

    def test_stage_roundtrip_through_batched_path(self):
        """Transcode raw->jpeg->raw over a whole table exercises the
        lockstep decoder inside decode_batch; PSNR bound holds."""
        from geomesa_ray.sources.fixtures import gen_images_table
        from geomesa_ray.stages.image_ops import Transcode, decode_batch

        t = gen_images_table(64)
        jp = Transcode("jpeg")(t)
        back = decode_batch(jp)
        orig = decode_batch(t)
        assert min(psnr(a, b) for a, b in zip(orig, back)) >= 40.0


class TestBatchDecoderTruncation:
    def test_all_streams_truncated_after_sos(self):
        """Same-header batch truncated just past SOS must raise the
        promised ValueError, never an IndexError from walking past the
        padded byte matrix into a neighbour image's row (review
        finding, reproduced)."""
        from geomesa_ray.codecs.jpeg import (decode_jpeg_batch,
                                             encode_jpeg_batch,
                                             _parse_stream)

        imgs = RNG.integers(0, 256, (3, 8, 8, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(imgs)
        _, _, _, sos_end = _parse_stream(bufs[0])
        with pytest.raises(ValueError):
            decode_jpeg_batch([b[:sos_end + 1] for b in bufs])


class TestRestartIntervals:
    """DRI/RSTm support (T.81 E.1.4): byte-aligned independent intervals,
    DC predictor reset, decoder resync — round-trip, structural marker
    layout, and an asymmetric proof of the reset semantics."""

    def _img(self, shape=(24, 16, 3), seed=5):
        return np.random.default_rng(seed).integers(
            0, 256, shape, dtype=np.uint8)

    def test_pixels_identical_to_plain_all_intervals(self):
        from geomesa_ray.codecs.jpeg import decode_jpeg, encode_jpeg

        img = self._img()  # 6 MCUs at 4:4:4
        plain = decode_jpeg(encode_jpeg(img))
        for ri in (1, 2, 4, 5, 100):
            out = decode_jpeg(encode_jpeg(img, restart_interval=ri))
            assert np.array_equal(out, plain), f"ri={ri}"

    def test_marker_structure(self):
        from geomesa_ray.codecs.jpeg import encode_jpeg

        img = self._img()
        for ri, n_seg in ((1, 6), (2, 3), (4, 2), (100, 1)):
            buf = encode_jpeg(img, restart_interval=ri)
            assert b"\xff\xdd" in buf  # DRI present
            rsts = sum(buf.count(bytes([0xFF, 0xD0 + m]))
                       for m in range(8))
            assert rsts == n_seg - 1, (ri, rsts)

    def test_dc_reset_is_real(self):
        """Asymmetric proof the predictor resets: on a uniform image
        every interval's entropy bits are IDENTICAL (each starts from
        predictor 0 and codes the full DC value). A symmetric
        encoder/decoder bug that skipped the reset would still
        round-trip — but interval 2+ would code diff=0 and the segments
        would differ."""
        import re

        from geomesa_ray.codecs.jpeg import encode_jpeg

        img = np.full((16, 32, 3), 200, dtype=np.uint8)  # 8 equal MCUs
        buf = encode_jpeg(img, restart_interval=2)
        sos = buf.find(b"\xff\xda")
        ln = int.from_bytes(buf[sos + 2:sos + 4], "big")
        parts = re.split(b"\xff[\xd0-\xd7]", buf[sos + 2 + ln:-2])
        assert len(parts) == 4 and len(set(parts)) == 1

    def test_subsampled_and_grey_and_batch(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg,
                                             encode_jpeg_batch)

        img = self._img((32, 48, 3), seed=9)
        plain = decode_jpeg(encode_jpeg(img, subsample=True))
        got = decode_jpeg(encode_jpeg(img, subsample=True,
                                      restart_interval=3))
        assert np.array_equal(got, plain)

        imgs = self._img((7, 16, 16), seed=11)
        bufs = encode_jpeg_batch(imgs, restart_interval=2)
        assert bufs[3] == encode_jpeg(imgs[3], restart_interval=2)
        outs = decode_jpeg_batch(bufs)  # falls back per-image under DRI
        plains = decode_jpeg_batch(encode_jpeg_batch(imgs))
        assert all(np.array_equal(a, b) for a, b in zip(outs, plains))

    def test_corrupt_interval_count_raises(self):
        from geomesa_ray.codecs.jpeg import decode_jpeg, encode_jpeg

        img = self._img()
        buf = encode_jpeg(img, restart_interval=2)  # 3 intervals
        # strip the last RST marker + tail: interval count mismatch
        last = max(buf.rfind(bytes([0xFF, 0xD0 + m])) for m in range(8))
        bad = buf[:last] + b"\xff\xd9"
        with pytest.raises(ValueError, match="intervals"):
            decode_jpeg(bad)

    def test_bad_interval_rejected(self):
        from geomesa_ray.codecs.jpeg import encode_jpeg

        with pytest.raises(ValueError, match="restart_interval"):
            encode_jpeg(self._img(), restart_interval=0)


class TestProgressiveJpeg:
    """SOF2 progressive (spectral selection + successive approximation,
    T.81 G): after every scan lands, reconstruction is EXACTLY the
    baseline decode of the same quantized coefficients — any EOB-run /
    refinement / point-transform bug breaks bit-exact equality."""

    def _img(self, shape, seed=3):
        return np.random.default_rng(seed).integers(
            0, 256, shape, dtype=np.uint8)

    @pytest.mark.parametrize("shape,sub", [
        ((8, 8, 3), False),      # single MCU
        ((24, 16, 3), False),    # multi-MCU
        ((17, 23, 3), False),    # non-multiple-of-8 dims
        ((32, 48, 3), True),     # 4:2:0 (interleaved DC over 2x2 MCUs)
        ((16, 16), False),       # greyscale
    ])
    def test_pixel_identical_to_baseline(self, shape, sub):
        from geomesa_ray.codecs.jpeg import (decode_jpeg, encode_jpeg,
                                             encode_jpeg_progressive)

        img = self._img(shape)
        kw = {"subsample": sub} if len(shape) == 3 else {}
        base = decode_jpeg(encode_jpeg(img, **kw))
        buf = encode_jpeg_progressive(img, **kw)
        assert b"\xff\xc2" in buf  # SOF2, not a baseline fallback
        assert buf.count(b"\xff\xda") > 5  # genuinely multi-scan
        assert np.array_equal(decode_jpeg(buf), base)

    def test_partial_scans_give_coarse_preview(self):
        """The point of progressive: truncating after early scans still
        decodes — to a genuinely coarser approximation."""
        import re

        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             encode_jpeg_progressive)

        img = self._img((24, 16, 3))
        buf = encode_jpeg_progressive(img)
        sos = [m.start() for m in re.finditer(b"\xff\xda", buf)]
        approx = decode_jpeg(buf[:sos[2]] + b"\xff\xd9")
        full = decode_jpeg(buf)
        assert approx.shape == full.shape
        assert not np.array_equal(approx, full)
        # DC scan landed: the coarse image is in the right neighborhood
        d = np.abs(approx.astype(int) - full.astype(int)).mean()
        assert d < 80

    def test_quality_and_worst_case_content(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg, encode_jpeg,
                                             encode_jpeg_progressive, psnr)

        img = self._img((40, 40, 3), seed=9)  # noise: worst case
        for q in (85, 98):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            assert np.array_equal(prog, base), q
        assert psnr(decode_jpeg(encode_jpeg_progressive(img)), img) >= 40.0

    def test_progressive_restart_gate(self):
        """DRI inside a progressive stream is an honest gate."""
        from geomesa_ray.codecs.jpeg import encode_jpeg_progressive

        buf = encode_jpeg_progressive(self._img((8, 8, 3)))
        # splice a DRI segment before the first SOS
        sos = buf.find(b"\xff\xda")
        spliced = buf[:sos] + b"\xff\xdd\x00\x04\x00\x02" + buf[sos:]
        from geomesa_ray.codecs.jpeg import decode_jpeg

        with pytest.raises(NotImplementedError, match="progressive"):
            decode_jpeg(spliced)


class TestProgressiveRefinementWhiteBox:
    """Coefficient-level round trips of the AC successive-approximation
    coder — sparse bands with >16-zero runs interleaved with history
    coefficients are exactly the layouts dense-noise images never
    produce (review finding: a history coefficient inside a deferred
    ZRL flush desynced the stream)."""

    @staticmethod
    def _roundtrip(blocks, ss=1, se=63, levels=(2, 1, 0)):
        """Run the full first-pass + refinement chain over int64 zigzag
        blocks; return the decoder's reconstruction."""
        import numpy as np

        from geomesa_ray.codecs.jpeg import (_BitR, _BitW, _HuffDecoder,
                                             _dec_ac_first,
                                             _dec_ac_refine,
                                             _dht_payload,
                                             _enc_ac_first,
                                             _enc_ac_refine,
                                             _prog_ac_table)

        ac_tab = _prog_ac_table()
        payload = _dht_payload(ac_tab, 1, 0)
        bits = list(payload[1:17])
        vals = payload[17:]
        dec_tab = _HuffDecoder(bits, vals)

        out = [np.zeros(64, dtype=np.int64) for _ in blocks]
        first = True
        for i, al in enumerate(levels):
            bw = _BitW()
            if first:
                _enc_ac_first(bw, blocks, ss, se, al, ac_tab)
            else:
                _enc_ac_refine(bw, blocks, ss, se, al, ac_tab)
            br = _BitR(bw.flush())
            if first:
                _dec_ac_first(br, dec_tab, out, ss, se, al)
                first = False
            else:
                _dec_ac_refine(br, dec_tab, out, ss, se, al)
        return out

    def test_review_repro_history_inside_long_run(self):
        import numpy as np

        blk = np.zeros(64, dtype=np.int64)
        blk[18] = 3   # history coefficient after 17 zeros
        blk[21] = 1   # newly significant at al=0
        (got,) = self._roundtrip([blk], levels=(1, 0))
        assert np.array_equal(got, blk)

    def test_random_sparse_blocks_exact(self):
        import numpy as np

        rng = np.random.default_rng(77)
        blocks = []
        for _ in range(200):
            blk = np.zeros(64, dtype=np.int64)
            # a few coefficients at random positions, biased sparse so
            # >16-zero runs and EOB runs occur constantly
            for _ in range(int(rng.integers(0, 4))):
                k = int(rng.integers(1, 64))
                blk[k] = int(rng.integers(-9, 10)) or 1
            blocks.append(blk)
        got = self._roundtrip(blocks, levels=(2, 1, 0))
        for g, b in zip(got, blocks):
            assert np.array_equal(g, b)

    def test_eob_run_cap_and_all_zero(self):
        import numpy as np

        blocks = [np.zeros(64, dtype=np.int64) for _ in range(500)]
        blocks[499][63] = -5  # force the long EOB run to flush mid-scan
        got = self._roundtrip(blocks)
        assert np.array_equal(got[499], blocks[499])
        assert all((g == 0).all() for g in got[:499])


class TestCodecProperties:
    """Hypothesis property tests over the round-4 codec surface (the
    SURVEY §5 property-testing strategy): random inputs explore corner
    layouts the fixed fixtures can't."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(1, 8),
           st.integers(0, 2**32 - 1))
    def test_progressive_always_matches_baseline(self, h, w, ri, seed):
        from geomesa_ray.codecs.jpeg import (decode_jpeg, encode_jpeg,
                                             encode_jpeg_progressive)

        img = np.random.default_rng(seed).integers(
            0, 256, (h, w, 3), dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img))
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(img)), base)
        # and restart intervals of any size agree too
        assert np.array_equal(
            decode_jpeg(encode_jpeg(img, restart_interval=ri)), base)

    @settings(max_examples=50, deadline=None)
    @given(st.floats(-180.0, 180.0, allow_nan=False),
           st.floats(-90.0, 90.0, allow_nan=False),
           st.integers(1, 12))
    def test_geohash_bounds_always_contain(self, lon, lat, p):
        from geomesa_ray.curve.geohash import (geohash_bounds,
                                               geohash_encode)

        h = geohash_encode(np.array([lon]), np.array([lat]), p)
        b = geohash_bounds(h)
        # the encoded cell contains the point, up to one ulp of the
        # offset sum (a point within ~1e-14 deg of a cell boundary can
        # round into the neighbor — inherent to the floor-scale formula
        # the DuckDB oracle mirrors bit-for-bit; the right-edge clamp
        # means lon=180/lat=90 land in the last cell)
        tol = 1e-12
        assert b["lon_min"][0] - tol <= lon \
            <= max(b["lon_max"][0], 180.0) + tol
        assert b["lat_min"][0] - tol <= lat \
            <= max(b["lat_max"][0], 90.0) + tol

    @settings(max_examples=30, deadline=None)
    @given(st.floats(-90.0, 90.0, allow_nan=False),
           st.floats(-180.0, 180.0, allow_nan=False),
           st.booleans())
    def test_exif_gps_roundtrip_anywhere(self, lat, lon, big_endian):
        from geomesa_ray.codecs.exif import insert_exif, read_exif_gps
        from geomesa_ray.codecs.jpeg import encode_jpeg

        img = np.full((8, 8, 3), 127, dtype=np.uint8)
        buf = insert_exif(encode_jpeg(img), lat, lon,
                          big_endian=big_endian)
        gps = read_exif_gps(buf)
        assert abs(gps["lat"] - lat) < 1e-9
        assert abs(gps["lon"] - lon) < 1e-9


class TestMixedStreamTranscode:
    """Round-5: DRI/RSTm and progressive SOF2 streams exercised on the
    CORPUS transcode path (decode_batch routing), not only in codec
    unit tests."""

    def test_transcode_mixed_jpeg_corpus(self, ray_session):
        from geomesa_ray.codecs.jpeg import _parse_stream, decode_jpeg, psnr
        from geomesa_ray.sources.fixtures import (IMG_H, IMG_W,
                                                  ensure_mixed_jpeg_corpus,
                                                  gen_images_table_range)
        from geomesa_ray.stages.image_ops import decode_batch, transcode

        d = ensure_mixed_jpeg_corpus("/root/testdata/sf0.001", n=90)
        import pyarrow.parquet as pq

        src = pq.read_table(d + "/images.parquet")
        kinds = set()
        for i in range(90):
            frame = _parse_stream(src.column("bytes")[i].as_py())[0]
            kinds.add("prog" if frame.get("progressive")
                      else "dri" if frame.get("ri") else "base")
        assert kinds == {"base", "dri", "prog"}  # all three stream types

        ds = transcode(d, "jpeg", use_actors=False, batch_size=32)
        t = pa.concat_tables(
            [pa.table(b) for b in
             ds.iter_batches(batch_format="pyarrow", batch_size=4096)]
        ).sort_by("image_id")
        assert t.num_rows == 90
        want = gen_images_table_range(0, 90)
        assert t.column("image_id").equals(want.column("image_id"))
        assert t.column("caption").equals(want.column("caption"))

        got_px = np.stack(decode_batch(t))
        in_px = np.stack([decode_jpeg(src.column("bytes")[i].as_py())
                          for i in range(90)])
        raw = np.frombuffer(b"".join(want.column("bytes").to_pylist()),
                            np.uint8).reshape(90, IMG_H, IMG_W, 3)
        for i in range(90):
            # re-encode of already-quantized pixels is near-lossless
            assert psnr(got_px[i], in_px[i]) >= 40.0
            # and the end-to-end chain stays within the payload bound
            # of the source pixels
            assert psnr(got_px[i], raw[i]) >= 35.0


class TestDriLockstepDecode:
    """Round-5: DRI batches decode in the SAME lockstep advance with
    each restart interval as its own stream (DC predictors and bit
    state reset per interval for free) — pixel-identical to the scalar
    decoder, and segmentation shortens the longest symbol chain."""

    @pytest.mark.parametrize("ri", [1, 2, 7, 100])
    def test_batch_matches_scalar_small(self, ri):
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg_batch)

        imgs = RNG.integers(0, 255, (24, 8, 8, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(imgs, restart_interval=ri)
        got = decode_jpeg_batch(bufs)
        want = [decode_jpeg(b) for b in bufs]
        assert all(np.array_equal(a, b) for a, b in zip(got, want))

    @pytest.mark.parametrize("ri", [1, 3, 8, 24])
    def test_batch_matches_scalar_multi_mcu(self, ri):
        """Non-divisible MCU counts: the last interval is shorter."""
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg_batch)

        imgs = RNG.integers(0, 255, (6, 56, 40, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(imgs, restart_interval=ri)
        got = decode_jpeg_batch(bufs)
        want = [decode_jpeg(b) for b in bufs]
        assert all(np.array_equal(a, b) for a, b in zip(got, want))

    def test_grey_and_single_image(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg_batch)

        g = RNG.integers(0, 255, (5, 16, 16), dtype=np.uint8)
        bufs = encode_jpeg_batch(g, restart_interval=2)
        got = decode_jpeg_batch(bufs)
        assert all(np.array_equal(a, decode_jpeg(b))
                   for a, b in zip(got, bufs))
        one = decode_jpeg_batch([bufs[0]])
        assert np.array_equal(one[0], decode_jpeg(bufs[0]))


class TestProgressiveLockstepDecode:
    """Round-5: same-script SOF2 batches decode in lockstep — per-scan
    kernels (unit-locked DC, one-shot DC refine, per-symbol AC first,
    prefix-sum-crawl AC refine) — pixel-identical to the scalar
    multi-scan decoder."""

    def _roundtrip(self, imgs, q=98):
        from geomesa_ray.codecs.jpeg import (_decode_progressive_batch,
                                             decode_jpeg,
                                             encode_jpeg_progressive)

        bufs = [encode_jpeg_progressive(im, quality=q) for im in imgs]
        got = _decode_progressive_batch(bufs)
        assert got is not None
        want = [decode_jpeg(b) for b in bufs]
        assert all(np.array_equal(a, b) for a, b in zip(got, want))

    def test_noise_rgb_and_grey(self):
        self._roundtrip(RNG.integers(0, 255, (12, 8, 8, 3), np.uint8))
        self._roundtrip(RNG.integers(0, 255, (6, 16, 16), np.uint8))

    def test_multi_mcu_and_odd_dims(self):
        self._roundtrip(RNG.integers(0, 255, (4, 40, 56, 3), np.uint8))
        self._roundtrip(RNG.integers(0, 255, (4, 17, 11, 3), np.uint8))

    def test_eob_heavy_smooth_and_flat(self):
        y, x = np.mgrid[0:32, 0:24]
        sm = np.repeat(np.stack(
            [(np.sin(x / 5 + i) * 40 + 128 + y * 0).astype(np.uint8)
             for i in range(5)])[:, :, :, None], 3, axis=3)
        self._roundtrip(sm)
        self._roundtrip(np.stack([np.full((24, 24, 3), 9 * i, np.uint8)
                                  for i in range(4)]))

    def test_low_quality_sparse(self):
        self._roundtrip(RNG.integers(0, 255, (6, 24, 24, 3), np.uint8),
                        q=25)

    def test_randomized_sweep(self):
        rng = np.random.default_rng(123)
        for _ in range(12):
            sh = (int(rng.integers(1, 5)), int(rng.integers(6, 40)),
                  int(rng.integers(6, 40)), 3)
            self._roundtrip(rng.integers(0, 255, sh, np.uint8),
                            q=int(rng.integers(20, 99)))

    def test_script_mismatch_returns_none(self):
        from geomesa_ray.codecs.jpeg import (_decode_progressive_batch,
                                             encode_jpeg_progressive)

        a = encode_jpeg_progressive(
            RNG.integers(0, 255, (8, 8, 3), np.uint8))
        b = encode_jpeg_progressive(
            RNG.integers(0, 255, (16, 16, 3), np.uint8))
        assert _decode_progressive_batch([a, b]) is None

    def test_batch_router_uses_lockstep_above_threshold(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg,
                                             decode_jpeg_batch,
                                             encode_jpeg_progressive)

        imgs = RNG.integers(0, 255, (70, 8, 8, 3), np.uint8)
        bufs = [encode_jpeg_progressive(im) for im in imgs]
        got = decode_jpeg_batch(bufs)
        assert all(np.array_equal(a, decode_jpeg(b))
                   for a, b in zip(got, bufs))


class TestLockstepRobustness:
    """Truncated/corrupt streams must raise cleanly from the lockstep
    paths (never hang or mis-decode silently)."""

    def test_truncated_dri_batch_raises(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg_batch,
                                             encode_jpeg_batch)

        imgs = RNG.integers(0, 255, (8, 24, 24, 3), dtype=np.uint8)
        bufs = encode_jpeg_batch(imgs, restart_interval=2)
        # chop entropy bytes out of one stream (keep EOI so the marker
        # walk still terminates)
        bad = list(bufs)
        bad[3] = bad[3][:-40] + b"\xff\xd9"
        with pytest.raises(ValueError):
            decode_jpeg_batch(bad)

    def test_corrupt_progressive_matches_scalar_outcome(self):
        """Corrupt entropy bits may still form a decodable stream —
        the contract is scalar EQUIVALENCE: the batch path must either
        reject the batch (structure mismatch -> None, error -> raise)
        or produce exactly what per-image decode produces."""
        from geomesa_ray.codecs.jpeg import (_decode_progressive_batch,
                                             decode_jpeg,
                                             encode_jpeg_progressive)

        imgs = RNG.integers(0, 255, (70, 16, 16, 3), dtype=np.uint8)
        bufs = [encode_jpeg_progressive(im) for im in imgs]
        bad = list(bufs)
        b = bytearray(bad[5])
        sos = b.find(b"\xff\xda", b.find(b"\xff\xda") + 2)  # 2nd SOS
        b[sos + 20:sos + 24] = b"\xff\xff\xff\xff"
        bad[5] = bytes(b)
        try:
            got = _decode_progressive_batch(bad)
        except ValueError:
            return  # rejected outright: fine
        if got is None:
            return  # structure mismatch -> caller falls back: fine
        want = [decode_jpeg(x) for x in bad]
        assert all(np.array_equal(a, b_) for a, b_ in zip(got, want))

    def test_mixed_corpus_cache_invalidates_on_n(self, tmp_path,
                                                 monkeypatch):
        import geomesa_ray.sources.fixtures as F

        monkeypatch.setattr(F, "FIXTURE_ROOT", str(tmp_path))
        d1 = F.ensure_mixed_jpeg_corpus("/root/testdata/sf0.001", n=30)
        import pyarrow.parquet as pq

        assert pq.read_table(d1 + "/images.parquet").num_rows == 30
        d2 = F.ensure_mixed_jpeg_corpus("/root/testdata/sf0.001", n=60)
        assert d1 == d2
        assert pq.read_table(d2 + "/images.parquet").num_rows == 60


class TestProgressiveBatchEncoder:
    """Round-5: batch SOF2 encode — every scan's records built with
    array ops across all images, packed with one lexsort + bit scatter.
    The oracle is BYTE equality with the scalar encoder."""

    def _check(self, imgs, q=98, subsample=False):
        from geomesa_ray.codecs.jpeg import (
            encode_jpeg_progressive, encode_jpeg_progressive_batch)

        got = encode_jpeg_progressive_batch(imgs, quality=q,
                                            subsample=subsample)
        want = [encode_jpeg_progressive(im, quality=q,
                                        subsample=subsample)
                for im in imgs]
        assert got == want

    def test_noise_rgb_grey_odd(self):
        self._check(RNG.integers(0, 255, (10, 8, 8, 3), np.uint8))
        self._check(RNG.integers(0, 255, (5, 16, 16), np.uint8))
        self._check(RNG.integers(0, 255, (4, 17, 11, 3), np.uint8), q=85)

    def test_eob_heavy_and_sparse(self):
        self._check(np.stack([np.full((24, 24, 3), 9 * i, np.uint8)
                              for i in range(4)]))
        self._check(RNG.integers(0, 255, (5, 24, 16, 3), np.uint8), q=25)

    def test_subsampled(self):
        self._check(RNG.integers(0, 255, (4, 32, 32, 3), np.uint8),
                    subsample=True)
        self._check(RNG.integers(0, 255, (3, 17, 11, 3), np.uint8),
                    q=50, subsample=True)

    def test_randomized_sweep(self):
        rng = np.random.default_rng(321)
        for _ in range(10):
            sh = (int(rng.integers(1, 5)), int(rng.integers(6, 40)),
                  int(rng.integers(6, 40)), 3)
            self._check(rng.integers(0, 255, sh, np.uint8),
                        q=int(rng.integers(20, 99)),
                        subsample=bool(rng.integers(0, 2)))

    def test_decodes_to_baseline_pixels(self):
        from geomesa_ray.codecs.jpeg import (decode_jpeg, encode_jpeg,
                                             encode_jpeg_progressive_batch)

        imgs = RNG.integers(0, 255, (4, 16, 16, 3), np.uint8)
        for im, buf in zip(imgs, encode_jpeg_progressive_batch(imgs)):
            assert np.array_equal(decode_jpeg(buf),
                                  decode_jpeg(encode_jpeg(im)))


class TestProgressiveTranscodeTarget:
    """Round-5: 'jpeg_progressive' as a Transcode OUTPUT format — the
    corpus can be re-encoded to SOF2 at scale through the loop-free
    batch encoder; payloads carry fmt='jpeg' (downstream decoders
    dispatch on the SOF marker)."""

    def test_raw_corpus_to_progressive(self, ray_session, tiny_fixtures):
        from geomesa_ray.codecs.jpeg import (_parse_stream, decode_jpeg,
                                             encode_jpeg)
        from geomesa_ray.stages.image_ops import Transcode, transcode

        ds = transcode(tiny_fixtures, "jpeg_progressive",
                       use_actors=False, batch_size=512)
        t = ds.take_batch(256, batch_format="pyarrow")
        assert t["fmt"][0].as_py() == "jpeg"
        frame = _parse_stream(t["bytes"][0].as_py())[0]
        assert frame.get("progressive")
        # SOF2 organizes the SAME quantized coefficients: decoding it
        # equals decoding the baseline encode of the same pixels
        from geomesa_ray.sources.fixtures import gen_images_table

        want = {r["image_id"]: r["bytes"]
                for r in gen_images_table(6000).to_pylist()}
        import numpy as np_

        for i in range(4):
            rid = t["image_id"][i].as_py()
            raw = np_.frombuffer(want[rid], np_.uint8).reshape(8, 8, 3)
            assert np_.array_equal(decode_jpeg(t["bytes"][i].as_py()),
                                   decode_jpeg(encode_jpeg(raw)))

    def test_mixed_corpus_to_progressive(self, ray_session):
        """Compressed sources (baseline | DRI | SOF2) re-encode to
        progressive through the decode-then-stack batch path."""
        from geomesa_ray.codecs.jpeg import _parse_stream
        from geomesa_ray.sources.fixtures import ensure_mixed_jpeg_corpus
        from geomesa_ray.stages.image_ops import transcode

        d = ensure_mixed_jpeg_corpus("/root/testdata/sf0.001", n=90)
        out = transcode(d, "jpeg_progressive", use_actors=False,
                        batch_size=32).take_all()
        assert len(out) == 90
        assert all(_parse_stream(r["bytes"])[0].get("progressive")
                   for r in out[:5])
