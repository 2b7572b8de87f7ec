"""Multimodal (image) stages: decode, feature-extract, resize.

The corpus stores images as opaque ``binary`` with typed metadata
(w/h/fmt). Stages are actor-pool ``map_batches`` classes — decoder state
initialised once per actor (``__init__``), batches streamed through
``__call__`` — mirroring the reference's raster chunk handling
(``geomesa-raster/.../data/Raster.scala:21-60``,
``RasterIngest.scala``) re-expressed for Ray Data.

Formats:
- ``fmt == "raw"`` (the fixture default) decodes zero-copy via NumPy —
  the whole-batch matrix fast path.
- ``png`` / ``jpeg`` / ``bmp`` decode for real through the pure-NumPy
  codecs in :mod:`geomesa_ray.codecs` (PNG/BMP lossless pixel-exact,
  baseline JPEG with the PSNR>=40dB payload bound) — per-image work, so
  these run in the actor-pool variants where decoder tables are built
  once per actor.
- anything else (webp/avif/...) still raises NotImplementedError
  (honest gate; swap in PIL/turbojpeg in a full environment).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from geomesa_ray.sources.io import read_images


def _decode_compressed(buf: bytes, fmt: str) -> np.ndarray:
    from geomesa_ray import codecs

    return codecs.decode(buf, fmt)


def decode_batch(batch: pa.Table) -> list[np.ndarray]:
    """binary column -> list of (h, w, 3) uint8 arrays.

    Uniform-jpeg batches route through the LOCKSTEP batched decoder
    (one vectorized symbol step for every image at once; same-header
    streams, which a transcoded corpus always is — mixed headers fall
    back per image inside it)."""
    if batch.num_rows > 1 and _uniform_fmt(batch) in ("jpeg", "jpg"):
        from geomesa_ray.codecs.jpeg import decode_jpeg_batch

        out = decode_jpeg_batch(batch.column("bytes").to_pylist())
        return [im if im.ndim == 3 else np.repeat(im[:, :, None], 3, 2)
                for im in out]
    w = batch.column("w").to_numpy(zero_copy_only=False)
    h = batch.column("h").to_numpy(zero_copy_only=False)
    fmts = batch.column("fmt").to_pylist()
    bufs = batch.column("bytes").to_pylist()
    out = []
    for i, buf in enumerate(bufs):
        if fmts[i] == "raw":
            out.append(np.frombuffer(buf, dtype=np.uint8).reshape(h[i], w[i], 3))
        else:
            out.append(_decode_compressed(buf, fmts[i]))
    return out


def _uniform_fmt(batch: pa.Table) -> str | None:
    """The batch's single fmt value, or None if mixed — probed with an
    Arrow unique (no 64k-string to_pylist per batch on the hot path)."""
    import pyarrow.compute as pc

    u = pc.unique(batch.column("fmt"))
    return u[0].as_py() if len(u) == 1 else None


class ImageStats:
    """Feature extraction: per-channel means + a recomputed average-hash
    (the verifiable stand-in for model-based feature extraction).

    Fast path: uniform raw batches decode as ONE (n, h*w*3) zero-copy
    matrix and all stats vectorize across the whole batch; mixed/
    compressed batches fall back to per-image decode.
    """

    @staticmethod
    def _stats_from_matrix(m: np.ndarray):
        """(n, npx, 3) uint8 stack -> (means (n, 3), ahash list).

        Exact integer results via the FAST reduction shapes: numpy's
        dtype-promoting axis sums over uint8 are scalar-loop slow
        (measured 8x), so channel sums go through one float32 BLAS
        matmul (exact: each sum <= npx*255 < 2^24) and the per-pixel
        gray sum is two elementwise adds into int16 (<= 765).
        """
        n, npx = m.shape[:2]
        flat = m.reshape(n, npx * 3)
        if npx * 255 < (1 << 24):
            sel = np.zeros((npx * 3, 3), dtype=np.float32)
            sel[np.arange(npx * 3), np.arange(npx * 3) % 3] = 1.0
            ch_sums = (flat.astype(np.float32) @ sel).astype(np.int64)
        else:  # gigantic frames: exactness over speed
            ch_sums = m.sum(axis=1, dtype=np.int64)
        means = ch_sums / float(npx)  # (n, 3)
        g3 = m[:, :, 0].astype(np.int16) + m[:, :, 1] + m[:, :, 2]
        g3 = g3.astype(np.int64)  # (n, hw) gray*3
        # g > mean(g)  <=>  hw * g3 > sum(g3)   (exact rationals)
        total = g3.sum(axis=1)
        bits = (g3[:, :64] * np.int64(npx) > total[:, None]) \
            .astype(np.uint64)
        weights = np.uint64(1) << np.arange(bits.shape[1],
                                            dtype=np.uint64)
        av = (bits * weights[None, :]).sum(axis=1, dtype=np.uint64)
        return means, av.view(np.int64).tolist()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import binary_column_to_matrix

        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        uniform_dims = (len(np.unique(w)) == 1 and len(np.unique(h)) == 1)
        if uniform_dims and _uniform_fmt(batch) == "raw":
            npx = int(w[0]) * int(h[0])
            m = binary_column_to_matrix(batch.column("bytes"), npx * 3) \
                .reshape(batch.num_rows, npx, 3)
            means, ahash = self._stats_from_matrix(m)
        elif uniform_dims and batch.num_rows:
            # compressed-but-uniform corpus: decode (batched where the
            # codec supports it), stack, reuse the exact whole-batch math
            m = np.stack(decode_batch(batch)) \
                .reshape(batch.num_rows, -1, 3)
            means, ahash = self._stats_from_matrix(m)
        else:
            imgs = decode_batch(batch)
            means = np.array([im.reshape(-1, 3).mean(axis=0) for im in imgs])
            ahash = []
            for im in imgs:
                g = im.mean(axis=2)
                bits = (g > g.mean()).astype(np.uint64).ravel()[:64]
                v = int((bits << np.arange(len(bits), dtype=np.uint64))
                        .sum(dtype=np.uint64))
                ahash.append(v - (1 << 64) if v >= (1 << 63) else v)
        return pa.table({
            "image_id": batch.column("image_id"),
            "mean_r": pa.array(means[:, 0]),
            "mean_g": pa.array(means[:, 1]),
            "mean_b": pa.array(means[:, 2]),
            "ahash": pa.array(ahash, pa.int64()),
        })


class ImageResize:
    """Nearest-neighbor resize to (out_w, out_h), re-encoded as raw bytes.

    Stateless math, but kept as an actor stage so a real codec/resampler
    (which has setup cost) slots in without pipeline changes.
    """

    def __init__(self, out_w: int = 4, out_h: int = 4):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomesa_ray.util import binary_column_to_matrix

        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        n = batch.num_rows
        uniform_raw = (_uniform_fmt(batch) == "raw"
                       and len(np.unique(w)) == 1 and len(np.unique(h)) == 1)
        if uniform_raw:
            hh, ww = int(h[0]), int(w[0])
            m = binary_column_to_matrix(batch.column("bytes"), hh * ww * 3) \
                .reshape(n, hh, ww, 3)
            yi = (np.arange(self.out_h) * hh) // self.out_h
            xi = (np.arange(self.out_w) * ww) // self.out_w
            resized = np.ascontiguousarray(m[:, yi][:, :, xi])  # (n, oh, ow, 3)
            flat = resized.reshape(n, -1)
            nb_out = self.out_h * self.out_w * 3
            offsets = pa.array(np.arange(n + 1, dtype=np.int32) * nb_out)
            out_arr = pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, offsets.buffers()[1], pa.py_buffer(flat.tobytes())])
        else:
            imgs = decode_batch(batch)
            bufs = []
            for im in imgs:
                ih, iw, _ = im.shape
                yi = (np.arange(self.out_h) * ih) // self.out_h
                xi = (np.arange(self.out_w) * iw) // self.out_w
                bufs.append(im[yi][:, xi].tobytes())
            out_arr = pa.array(bufs, pa.binary())
        return pa.table({
            "image_id": batch.column("image_id"),
            "bytes": out_arr,
            "w": pa.array(np.full(n, self.out_w, dtype=np.int32)),
            "h": pa.array(np.full(n, self.out_h, dtype=np.int32)),
            "fmt": pa.array(["raw"] * n, pa.string()),
        })


def image_stats(fixture_dir: str, use_actors: bool = False) -> ray.data.Dataset:
    """use_actors=True pins an actor pool — only pay the spawn cost when a
    real codec with setup state replaces the raw fast path."""
    ds = read_images(fixture_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    if use_actors:
        return ds.map_batches(ImageStats, batch_format="pyarrow",
                              concurrency=(1, 8), batch_size=1024)
    return ds.map_batches(ImageStats(), batch_format="pyarrow")


def image_resize(fixture_dir: str, out_w: int = 4, out_h: int = 4,
                 use_actors: bool = False) -> ray.data.Dataset:
    ds = read_images(fixture_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    if use_actors:
        return ds.map_batches(ImageResize, fn_constructor_args=(out_w, out_h),
                              batch_format="pyarrow", concurrency=(1, 8),
                              batch_size=1024)
    return ds.map_batches(ImageResize(out_w, out_h), batch_format="pyarrow")


class FrameSample:
    """Video frame sampling: every ``step``-th frame of a video payload.

    - ``fmt == "rawvid"``: (n_frames, h, w, 3) uint8 stacks; sampled
      frames are raw RGB slices (zero decode).
    - ``fmt == "mjpeg"``: concatenated baseline JPEG frames, split at
      SOI/EOI boundaries (``codecs.jpeg.split_mjpeg``); sampled frames
      are the per-frame JPEG bytes, untouched — frame SELECTION never
      needs a pixel decode, which is the operation's whole point at
      100 TB.
    - containers needing a real demuxer (mp4/webm) raise
      NotImplementedError until pyav/ffmpeg is available.
    """

    def __init__(self, step: int = 2):
        self.step = step

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, fidx, ofmt, ow, oh = [], [], [], [], [], []
        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        fmts = batch.column("fmt").to_pylist()
        for i, buf in enumerate(batch.column("bytes").to_pylist()):
            rid = batch.column("image_id")[i].as_py()
            if fmts[i] == "rawvid":
                frame_bytes = int(w[i]) * int(h[i]) * 3
                n = len(buf) // frame_bytes
                sel = range(0, n, self.step)
                frames.extend(buf[f * frame_bytes:(f + 1) * frame_bytes]
                              for f in sel)
                out_fmt = "raw"
            elif fmts[i] == "mjpeg":
                from geomesa_ray.codecs.jpeg import split_mjpeg

                parts = split_mjpeg(buf)
                sel = range(0, len(parts), self.step)
                frames.extend(parts[f] for f in sel)
                out_fmt = "jpeg"
            else:
                raise NotImplementedError(
                    f"fmt={fmts[i]!r} needs a video demuxer (pyav/ffmpeg)")
            ids.extend(rid for _ in sel)
            fidx.extend(sel)
            # per-row fmt/w/h: mixed rawvid+mjpeg batches stay
            # distinguishable downstream (raw RGB vs JFIF payloads)
            ofmt.extend(out_fmt for _ in sel)
            ow.extend(int(w[i]) for _ in sel)
            oh.extend(int(h[i]) for _ in sel)
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "frame": pa.array(fidx, pa.int64()),
            "bytes": pa.array(frames, pa.binary()),
            "w": pa.array(ow, pa.int32()),
            "h": pa.array(oh, pa.int32()),
            "fmt": pa.array(ofmt, pa.string()),
        })


class AudioFeatures:
    """Audio feature extraction: int16 PCM -> RMS + zero-crossing rate
    (real vectorized math). ``fmt == "pcm16"`` is headerless samples;
    ``fmt == "wav"`` parses the RIFF container (16-bit PCM; multi-channel
    is averaged to mono before features); lossy codecs (mp3/opus) raise
    until a decoder is available."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zcr = [], []
        for i, buf in enumerate(batch.column("bytes").to_pylist()):
            f = batch.column("fmt")[i].as_py()
            if f == "pcm16":
                x = np.frombuffer(buf, dtype="<i2").astype(np.float64)
            elif f == "wav":
                from geomesa_ray.codecs.wav import decode_wav

                samples, _ = decode_wav(buf)
                x = samples.astype(np.float64).mean(axis=1)
            else:
                raise NotImplementedError(
                    f"audio fmt={f!r} needs a codec (pcm16/wav only)")
            rms.append(float(np.sqrt(np.mean(x * x))) if len(x) else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                       if len(x) > 1 else 0.0)
        return pa.table({
            "image_id": batch.column("image_id"),
            "rms": pa.array(rms),
            "zcr": pa.array(zcr),
        })


# the >=40 dB payload-invariant metric lives with the codecs; re-exported
# here for the stage-level tests and pipelines
from geomesa_ray.codecs.jpeg import psnr  # noqa: E402,F401


class Transcode:
    """Re-encode every image payload into ``out_fmt`` (raw/png/jpeg/bmp).

    The canonical payload transform at corpus scale: decode + re-encode
    inside an actor pool, with codec state (DCT basis, quantization and
    Huffman tables for the target quality) built ONCE per actor in
    ``__init__`` and reused across batches. Captions and ids pass
    through untouched (byte-equality invariant); ``w``/``h`` are
    preserved, only ``bytes``/``fmt`` change. Lossless targets
    (png/bmp/raw) round-trip pixel-identical; jpeg satisfies the
    PSNR >= 40 dB bound at the default quality.

    Reference parity: raster chunk re-encoding through ImageIO writers
    (``geomesa-raster/.../util/RasterUtils.scala`` ``imageToBytes`` /
    ``renderedImageToBytes``) re-expressed as a Ray Data actor stage.
    """

    def __init__(self, out_fmt: str = "png", quality: int = 98,
                 keep_caption: bool = True):
        from geomesa_ray import codecs

        out_fmt = out_fmt.lower()
        if out_fmt not in ("raw", "jpeg_progressive") \
                and out_fmt not in codecs.SUPPORTED:
            raise NotImplementedError(
                f"transcode target {out_fmt!r} (supported: "
                f"{codecs.SUPPORTED} + 'raw' + 'jpeg_progressive')")
        self.out_fmt = out_fmt
        self.quality = quality
        self.keep_caption = keep_caption
        # per-actor codec warm-up: the encoder's Huffman tables are
        # lru_cache'd module-wide, so touching them here pins the (tiny)
        # build cost to actor startup; every batch then hits the cache
        if out_fmt in ("jpeg", "jpg"):
            from geomesa_ray.codecs.jpeg import (_flat_ac_table,
                                                 _flat_dc_table)

            _flat_dc_table()
            _flat_ac_table()
        elif out_fmt == "jpeg_progressive":
            from geomesa_ray.codecs.jpeg import (_flat_dc_table,
                                                 _prog_ac_table)

            _flat_dc_table()
            _prog_ac_table()

    def _encode_stack(self, m: np.ndarray) -> list[bytes]:
        """Uniform-shape stack -> per-image payloads via the batch
        encoders (bit-identical to the per-image paths they shortcut)."""
        if self.out_fmt == "png":
            from geomesa_ray.codecs.png import encode_png_batch

            return encode_png_batch(m)
        if self.out_fmt == "jpeg_progressive":
            from geomesa_ray.codecs.jpeg import \
                encode_jpeg_progressive_batch

            return encode_jpeg_progressive_batch(m, quality=self.quality)
        from geomesa_ray.codecs.jpeg import encode_jpeg_batch

        return encode_jpeg_batch(m, quality=self.quality)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from geomesa_ray import codecs

        w = batch.column("w").to_numpy(zero_copy_only=False)
        h = batch.column("h").to_numpy(zero_copy_only=False)
        if (self.out_fmt in ("jpeg", "jpg", "png", "jpeg_progressive")
                and _uniform_fmt(batch) == "raw"
                and len(np.unique(w)) == 1 and len(np.unique(h)) == 1):
            # whole-batch fast path: zero-copy pixel matrix + ONE
            # vectorized pass over every image (bit-identical to
            # per-image encode; ~20x less per-image overhead)
            from geomesa_ray.util import binary_column_to_matrix

            hh, ww = int(h[0]), int(w[0])
            m = binary_column_to_matrix(batch.column("bytes"),
                                        hh * ww * 3) \
                .reshape(batch.num_rows, hh, ww, 3)
            bufs = self._encode_stack(m)
        else:
            imgs = decode_batch(batch)
            if (self.out_fmt in ("jpeg", "jpg", "png",
                                 "jpeg_progressive")
                    and len(imgs) > 1
                    and len({im.shape for im in imgs}) == 1
                    and imgs[0].ndim == 3):
                # compressed-source batches still re-encode as ONE
                # vectorized pass once decoded to a uniform stack
                bufs = self._encode_stack(np.stack(imgs))
            elif self.out_fmt == "jpeg_progressive":
                from geomesa_ray.codecs.jpeg import \
                    encode_jpeg_progressive

                bufs = [encode_jpeg_progressive(im, quality=self.quality)
                        for im in imgs]
            else:
                kw = {"quality": self.quality} \
                    if self.out_fmt in ("jpeg", "jpg") else {}
                bufs = [codecs.encode(im, self.out_fmt, **kw)
                        for im in imgs]
        # a progressive stream is still a JPEG payload: downstream
        # stages route by fmt, and the decoders dispatch on SOF marker
        ofmt = "jpeg" if self.out_fmt == "jpeg_progressive" \
            else self.out_fmt
        cols = {
            "image_id": batch.column("image_id"),
            "bytes": pa.array(bufs, pa.binary()),
            "w": batch.column("w"),
            "h": batch.column("h"),
            "fmt": pa.array([ofmt] * batch.num_rows, pa.string()),
        }
        for extra in ("caption", "phash"):
            if self.keep_caption and extra in batch.schema.names:
                cols[extra] = batch.column(extra)
        return pa.table(cols)


def transcode(fixture_dir: str, out_fmt: str = "png", quality: int = 98,
              concurrency=(1, 8), batch_size: int = 1024,
              use_actors: bool = True) -> ray.data.Dataset:
    """Corpus-wide format conversion. ``use_actors=True`` (default) pins
    an actor pool — the production shape once a codec with real setup
    state (libjpeg handles, GPU decoders) replaces the NumPy tables;
    ``use_actors=False`` runs task-based (the NumPy codec's setup is
    microseconds, so tasks skip the ~1s/actor spawn cost per run)."""
    ds = read_images(fixture_dir)
    if use_actors:
        return ds.map_batches(Transcode,
                              fn_constructor_kwargs={"out_fmt": out_fmt,
                                                     "quality": quality},
                              batch_format="pyarrow",
                              concurrency=concurrency,
                              batch_size=batch_size)
    return ds.map_batches(Transcode(out_fmt=out_fmt, quality=quality),
                          batch_format="pyarrow", batch_size=batch_size)
