"""Pure-NumPy baseline JPEG codec (ITU-T T.81 sequential DCT, JFIF).

Implements the lossy path of the corpus payload contract: the
north-star invariant is decoded-pixel ``PSNR >= 40 dB`` for lossy
formats, which this codec satisfies at the default ``quality=98`` even
on the worst-case content — the fixture images are uniform noise, the
least compressible signal (measured: 43.7 dB at q=98 on noise, 35.8 dB
at q=95; smooth content clears 40 dB from q~90).

Encoder: RGB -> YCbCr (BT.601 full-range per JFIF), optional 4:2:0
chroma subsampling (default 4:4:4), 8x8 forward DCT as one einsum over
every block, Annex-K quantization tables scaled by the IJG quality
curve, zigzag + DC-differential + run-length/magnitude coding, and a
canonical Huffman bitstream with 0xFF byte stuffing. The Huffman tables
are built programmatically (flat canonical code lengths: 4-bit DC,
8-bit AC) rather than hand-typing Annex K's 324 constants — any valid
table is legal since DHT segments carry the tables in-stream; the
decoder reads whatever tables the file declares, so Annex-K-encoded
files from other encoders also decode.

Decoder: full marker parse (SOI/APPn/COM/DQT/SOF0/DHT/SOS/EOI), general
canonical Huffman decode (mincode/maxcode per T.81 F.2.2.3), arbitrary
sampling factors up to 2x2, dequantize + inverse zigzag + IDCT
vectorized per component, nearest-neighbour chroma upsample, YCbCr ->
RGB clip.

Reference parity: the reference round-trips raster chunks through
ImageIO JPEG (`geomesa-raster/.../util/RasterUtils.scala` imageToBytes /
bytesToImage); the actor-pool image stages call this codec instead.
Restart intervals (DRI/RSTm, T.81 E.1.4) are supported on both sides:
``encode_jpeg(restart_interval=n)`` emits byte-aligned independent
intervals joined by RSTm, and the decoder resets bit state + DC
predictors at each marker; the BATCH decoder treats every interval as
its own lockstep stream, so DRI batches vectorize and segmentation
shortens the serial symbol chain (measured 18x on 128-px frames at
ri=4 vs the unsegmented lockstep). Progressive (SOF2, spectral selection +
successive approximation, T.81 G) is supported on both sides too — see
the progressive section at the bottom. Arithmetic coding, 12-bit
precision, lossless/hierarchical modes, and restarts inside progressive
scans raise ``NotImplementedError`` (honest gates).
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 base quantization tables (natural order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 1..100 -> scaled table clipped to [1, 255]."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _huff_canonical(lengths: dict[int, int]):
    """symbol -> (code, nbits) from {symbol: length}, canonical order
    (shorter codes first, then symbol order)."""
    syms = sorted(lengths, key=lambda s: (lengths[s], s))
    code = 0
    prev_len = 0
    out = {}
    for s in syms:
        ln = lengths[s]
        code <<= (ln - prev_len)
        out[s] = (code, ln)
        code += 1
        prev_len = ln
    return out


@functools.lru_cache(maxsize=None)
def _flat_dc_table():
    return _huff_canonical({s: 4 for s in range(12)})


@functools.lru_cache(maxsize=None)
def _flat_ac_table():
    syms = [0x00] + [(r << 4) | s for r in range(16)
                     for s in range(1, 11)] + [0xF0]
    return _huff_canonical({s: 8 for s in syms})


def _dht_payload(table, tc: int, th: int) -> bytes:
    """DHT body for a canonical table: Tc/Th, BITS[1..16], HUFFVAL."""
    by_len: dict[int, list[int]] = {}
    for sym, (code, ln) in table.items():
        by_len.setdefault(ln, []).append((code, sym))
    bits = bytearray(16)
    vals = bytearray()
    for ln in range(1, 17):
        entries = sorted(by_len.get(ln, []))
        bits[ln - 1] = len(entries)
        vals.extend(sym for _, sym in entries)
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


# ---------------------------------------------------------------- color


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(.., 3) uint8 -> float64 YCbCr (JFIF full-range BT.601)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255) \
        .astype(np.uint8)


# ---------------------------------------------------------------- encode


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """blocks (n, 8, 8) centered -> quantized int32 coeffs (n, 64) zigzag."""
    f = _C @ blocks @ _C.T  # broadcast matmul: C B C^T per block
    q = np.round(f / qt[None]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


_POW2 = (np.int64(1) << np.arange(32, dtype=np.int64))


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact integer bit length per element (0 -> 0), no float log."""
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


def _encode_scan(comp_zz: list[np.ndarray], samp: list[tuple[int, int]],
                 dc_tab, ac_tab, ri: int | None = None) -> list[bytes]:
    """Entropy-code interleaved scans for a whole IMAGE BATCH, vectorized.

    Instead of a per-coefficient Python bit-writer loop (measured
    ~1.5 ms per 8x8 image), every Huffman/magnitude emission becomes a
    RECORD ``(key, seq, code, code_len, mag, mag_len)`` built with array
    ops across ALL images at once: DC diffs along each component's MCU
    traversal (restarting per image), AC run-lengths from nonzero
    positions, ZRL expansion via repeat, EOB per unfinished block. The
    key embeds (image, mcu, component, unit) so ONE lexsort puts records
    in T.81 interleave order for every image simultaneously; bit packing
    expands (value, nbits) pairs into a bit matrix, mask-selects valid
    bits row-major, and the flat bit stream is split at per-image
    boundaries, padded with 1s, byte-packed and 0xFF-stuffed per image.
    Cost amortizes across the batch: ~20 us per 8x8 image at
    batch_size=1024 vs ~1.5 ms scalar.

    ``comp_zz[ci]`` is (n_img, nby, nbx, 64) zigzag coeffs padded to
    the MCU grid (nby = mcuy*vi, nbx = mcux*hi). Returns one entropy
    segment per image.

    ``ri`` (restart interval, T.81 §B.2.4.4/E.1.4): the MCU sequence
    splits into ceil(n_mcu/ri) restart intervals, each an independent
    bit stream (DC predictors reset, byte-aligned 1-pad) joined by RSTm
    markers (m = interval % 8) — expressed here by widening the stream
    key from per-image to per-(image, interval), so the exact same
    sort/pad/pack machinery handles both layouts.
    """
    n_img = comp_zz[0].shape[0]
    # symbol -> (code, len) dicts to flat LUT arrays
    dc_code = np.zeros(16, dtype=np.int64)
    dc_len = np.zeros(16, dtype=np.int64)
    for s, (c, ln) in dc_tab.items():
        dc_code[s], dc_len[s] = c, ln
    ac_code = np.zeros(256, dtype=np.int64)
    ac_len = np.zeros(256, dtype=np.int64)
    for s, (c, ln) in ac_tab.items():
        ac_code[s], ac_len[s] = c, ln

    total_units = sum(hi * vi for hi, vi in samp)
    unit_off = np.cumsum([0] + [hi * vi for hi, vi in samp])
    n_mcu = (comp_zz[0].shape[1] // samp[0][1]) \
        * (comp_zz[0].shape[2] // samp[0][0])
    K = n_mcu * total_units  # interleave keys per image
    n_seg = -(-n_mcu // ri) if ri else 1  # restart intervals per image

    keys, seqs, f1v, f1l, f2v, f2l = [], [], [], [], [], []

    def emit(key, seq, cv, cl, mv, ml):
        keys.append(key)
        seqs.append(seq)
        f1v.append(cv)
        f1l.append(cl)
        f2v.append(mv)
        f2l.append(ml)

    for ci, zz4 in enumerate(comp_zz):
        hi, vi = samp[ci]
        nby, nbx = zz4.shape[1:3]
        mcux = nbx // hi
        nb = nby * nbx
        by, bx = np.divmod(np.arange(nb), nbx)
        mcu = (by // vi) * mcux + (bx // hi)
        local = (by % vi) * hi + (bx % hi)
        order = np.lexsort((local, mcu))  # MCU traversal order
        zz = zz4.reshape(n_img, nb, 64)[:, order].astype(np.int64)
        mcu_ord = mcu[order]
        seg_ord = (mcu_ord // ri) if ri else np.zeros(nb, dtype=np.int64)
        gk_base = mcu_ord * total_units + unit_off[ci] + local[order]
        # stream id = image * n_seg + restart interval: every interval
        # gets its own byte-aligned padded stream below
        gk = ((np.arange(n_img, dtype=np.int64)[:, None] * n_seg
               + seg_ord[None, :]) * K + gk_base[None, :]).reshape(-1)

        # ---- DC: differential along each image's traversal, predictor
        # reset at every restart-interval boundary (T.81 E.1.4)
        dc = zz[:, :, 0]
        diff = dc.copy()
        diff[:, 1:] -= dc[:, :-1]
        if ri:
            resets = np.nonzero(seg_ord[1:] != seg_ord[:-1])[0] + 1
            diff[:, resets] = dc[:, resets]
        diff = diff.reshape(-1)
        s = _bit_length(np.abs(diff))
        mag = np.where(diff >= 0, diff, diff + _POW2[s] - 1)
        emit(gk, np.zeros(n_img * nb, dtype=np.int64),
             dc_code[s], dc_len[s], mag, s)

        # ---- AC: run-length over nonzeros (block ids are globally
        # unique across images, so run tracking resets per block AND
        # per image for free)
        zzf = zz.reshape(n_img * nb, 64)
        nzb, nzk = np.nonzero(zzf[:, 1:])
        pos = nzk + 1
        v = zzf[nzb, pos]
        firsts = np.concatenate(([True], nzb[1:] != nzb[:-1])) \
            if len(nzb) else np.zeros(0, dtype=bool)
        prev = np.where(firsts, 0, np.concatenate(([0], pos[:-1]))
                        if len(pos) else pos)
        run = pos - prev - 1
        nzrl = run >> 4
        rem = run & 15
        s = _bit_length(np.abs(v))
        sym = (rem << 4) | s
        mag = np.where(v >= 0, v, v + _POW2[s] - 1)
        emit(gk[nzb], pos * 2 + 1, ac_code[sym], ac_len[sym], mag, s)
        zmask = nzrl > 0
        if zmask.any():
            zkey = np.repeat(gk[nzb][zmask], nzrl[zmask])
            zseq = np.repeat(pos[zmask] * 2, nzrl[zmask])
            zc, zl = ac_tab[0xF0]
            emit(zkey, zseq, np.full(len(zkey), zc, dtype=np.int64),
                 np.full(len(zkey), zl, dtype=np.int64),
                 np.zeros(len(zkey), dtype=np.int64),
                 np.zeros(len(zkey), dtype=np.int64))

        # ---- EOB for blocks whose last nonzero isn't coefficient 63
        lastpos = np.zeros(n_img * nb, dtype=np.int64)
        if len(nzb):
            np.maximum.at(lastpos, nzb, pos)
        emask = lastpos < 63
        ec, el = ac_tab[0x00]
        ne = int(emask.sum())
        emit(gk[emask], np.full(ne, 200, dtype=np.int64),
             np.full(ne, ec, dtype=np.int64),
             np.full(ne, el, dtype=np.int64),
             np.zeros(ne, dtype=np.int64), np.zeros(ne, dtype=np.int64))

    key = np.concatenate(keys)
    seq = np.concatenate(seqs)
    srt = np.lexsort((seq, key))
    # fuse each record's (code, magnitude) into ONE bit-field write
    m_len = np.concatenate(f2l)[srt]
    value = (np.concatenate(f1v)[srt] << m_len) | np.concatenate(f2v)[srt]
    nbits = np.concatenate(f1l)[srt] + m_len

    # bit layout: each stream (one per image, or one per restart
    # interval per image) starts byte-aligned; the gap between a
    # stream's last record and its byte boundary is a 1s-pad record
    # (T.81 F.1.2.3)
    n_streams = n_img * n_seg
    rec_img = key[srt] // K  # stream id
    tot = np.bincount(rec_img, weights=nbits,
                      minlength=n_streams).astype(np.int64)
    padded = (tot + 7) & ~np.int64(7)
    img_base = np.concatenate(([0], np.cumsum(padded)))
    cs = np.cumsum(nbits) - nbits
    unpadded_base = np.concatenate(([0], np.cumsum(tot)))[:-1]
    start = img_base[rec_img] + (cs - unpadded_base[rec_img])
    pad = padded - tot
    pmask = pad > 0
    if pmask.any():
        start = np.concatenate([start, img_base[:-1][pmask] + tot[pmask]])
        value = np.concatenate([value, _POW2[pad[pmask]] - 1])
        nbits = np.concatenate([nbits, pad[pmask]])

    # vectorized bit scatter: every record ORs a 40-bit window (max
    # 16-bit code + 11-bit magnitude + 7-bit misalignment) into the
    # output byte array; windows of adjacent records overlap only in
    # zero bits, so the ORs commute
    nbytes = int(img_base[-1]) >> 3
    out_b = np.zeros(nbytes + 4, dtype=np.uint8)
    byte0 = start >> 3
    v40 = value << (40 - (start & 7) - nbits)
    for k in range(5):
        np.bitwise_or.at(out_b, byte0 + k,
                         ((v40 >> (32 - 8 * k)) & 0xFF).astype(np.uint8))
    out_b = out_b[:nbytes]

    # per-stream: slice at byte boundaries, stuff 0xFF -> 0xFF 0x00;
    # an image's restart intervals join with RSTm markers (m = s % 8),
    # markers BETWEEN intervals only (none after the last)
    bb = img_base >> 3
    out: list[bytes] = []
    for i in range(n_img):
        parts = []
        for s in range(n_seg):
            st = i * n_seg + s
            b = out_b[bb[st]:bb[st + 1]]
            ff = np.nonzero(b == 0xFF)[0]
            if len(ff):
                b = np.insert(b, ff + 1, 0)
            if s:
                parts.append(bytes([0xFF, 0xD0 + ((s - 1) % 8)]))
            parts.append(b.tobytes())
        out.append(b"".join(parts))
    return out


def encode_jpeg_batch(imgs: np.ndarray, quality: int = 98,
                      subsample: bool = False,
                      restart_interval: int | None = None) -> list[bytes]:
    """(n, h, w, 3) uint8 RGB (or (n, h, w) grey) stack -> n JFIF byte
    strings, all sharing one header (same dims/tables) with per-image
    entropy segments produced by ONE vectorized pass over every block
    of every image — the whole-batch fast path the Transcode actor
    stage uses on uniform corpora. Bit-identical to calling
    :func:`encode_jpeg` per image (tested)."""
    imgs = np.asarray(imgs)
    grey = imgs.ndim == 3
    n_img, h, w = imgs.shape[:3]
    if n_img == 0:
        return []
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image too large for JPEG")
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    dc_tab, ac_tab = _flat_dc_table(), _flat_ac_table()

    if grey:
        planes = [imgs.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(imgs)  # (n, h, w, 3)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, 0), (0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, 0), (0, ph), (0, pw)), mode="edge")
            hh, ww = cb.shape[1:]
            cb = cb.reshape(n_img, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            cr = cr.reshape(n_img, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized blocks, padded to the MCU grid
    comp_blocks = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        ph, pw = -plane.shape[1] % 8, -plane.shape[2] % 8
        if ph or pw:
            plane = np.pad(plane, ((0, 0), (0, ph), (0, pw)), mode="edge")
        nn, hh, ww = plane.shape
        bl = (plane - 128.0).reshape(nn, hh // 8, 8, ww // 8, 8) \
            .transpose(0, 1, 3, 2, 4)  # (n, nby, nbx, 8, 8)
        nby, nbx = bl.shape[1:3]
        need_y, need_x = mcuy * vi, mcux * hi
        if nby < need_y or nbx < need_x:
            bl = np.pad(bl, ((0, 0), (0, need_y - nby), (0, need_x - nbx),
                             (0, 0), (0, 0)), mode="edge")
            nby, nbx = need_y, need_x
        qt = qt_l if ci == 0 else qt_c
        zz = _fdct_quant(bl.reshape(-1, 8, 8), qt) \
            .reshape(n_img, nby, nbx, 64)
        comp_blocks.append(zz)

    if restart_interval is not None and restart_interval < 1:
        raise ValueError("restart_interval must be >= 1")
    segments = _encode_scan(comp_blocks, samp, dc_tab, ac_tab,
                            ri=restart_interval)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    head = bytearray(b"\xff\xd8")  # SOI
    head += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += seg(0xFFDB, b"\x00" + bytes(qt_l.reshape(64)[ZIGZAG]
                                        .astype(np.uint8)))
    if not grey:
        head += seg(0xFFDB, b"\x01" + bytes(qt_c.reshape(64)[ZIGZAG]
                                            .astype(np.uint8)))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    head += seg(0xFFC0, sof)
    head += seg(0xFFC4, _dht_payload(dc_tab, 0, 0))
    head += seg(0xFFC4, _dht_payload(ac_tab, 1, 0))
    if restart_interval is not None:
        head += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    head += seg(0xFFDA, sos)
    head = bytes(head)
    return [head + entropy + b"\xff\xd9" for entropy in segments]


def encode_jpeg(arr: np.ndarray, quality: int = 98,
                subsample: bool = False,
                restart_interval: int | None = None) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grey) -> baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 chroma (higher compression, lower
    chroma fidelity); default 4:4:4 keeps the PSNR>=40dB bound on
    arbitrary content. Batches of same-shape images should go through
    :func:`encode_jpeg_batch` (identical output, ~100x less per-image
    overhead).
    """
    return encode_jpeg_batch(np.asarray(arr)[None], quality=quality,
                             subsample=subsample,
                             restart_interval=restart_interval)[0]


# ---------------------------------------------------------------- decode


_LUT_CACHE: dict[bytes, tuple[list, list]] = {}


class _HuffDecoder:
    """Flat 16-bit lookup decode: ``lut[peek16] -> (symbol, length)``.

    Each canonical code of length L owns the 2^(16-L) LUT slots whose
    16-bit prefix starts with it, so one table lookup replaces the
    bit-by-bit mincode/maxcode walk of T.81 F.2.2.3. LUTs are cached
    process-wide by the DHT payload (a corpus encoded with one table
    set — e.g. ours — builds them once). Unused slots hold length 0 so
    a corrupt stream is detected, not mis-decoded.
    """

    def __init__(self, bits: list[int], vals: bytes):
        if len(vals) < sum(bits):
            raise ValueError("truncated DHT segment")
        key = bytes(bits) + bytes(vals)
        cached = _LUT_CACHE.get(key)
        if cached is None:
            if len(_LUT_CACHE) >= 16:  # ~1MB per entry; corpora with
                _LUT_CACHE.clear()     # many distinct DHTs must not grow it
                                       # unboundedly inside a worker
            sym = np.zeros(1 << 16, dtype=np.int32)
            lnl = np.zeros(1 << 16, dtype=np.int32)
            code = 0
            k = 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    lo = code << (16 - ln)
                    hi = lo + (1 << (16 - ln))
                    sym[lo:hi] = vals[k]
                    lnl[lo:hi] = ln
                    code += 1
                    k += 1
                code <<= 1
            # lists for the scalar symbol loop (no numpy scalar
            # overhead per lookup), arrays for the batched decoder
            cached = (sym.tolist(), lnl.tolist(), sym, lnl)
            _LUT_CACHE[key] = cached
        self.lut_sym, self.lut_len, self.np_sym, self.np_len = cached


def decode_jpeg(buf: bytes) -> np.ndarray:
    """JFIF bytes (baseline SOF0 or progressive SOF2) -> (h, w, 3)
    uint8 RGB (grey -> (h, w))."""
    frame, scan, qts, sos_end = _parse_stream(buf)
    if frame.get("progressive"):
        return _decode_progressive(buf)
    return _decode_scan(buf, sos_end, frame, scan, qts)


def _parse_stream(buf: bytes):
    """Marker walk up to (and including) SOS: returns
    (frame, scan, qts, entropy_start)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
    ri_val = 0
    n = len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (length,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2:pos + length]
        seg_end = pos + length
        pos = seg_end
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body, dtype=np.uint8, count=64, offset=p) \
                    .astype(np.int64)[UNZIGZAG].reshape(8, 8)
                qts[tq] = t
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = body[p + 17:p + 17 + nv]
                dec = _HuffDecoder(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = dec
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(dict(cid=cid, h=hv >> 4, v=hv & 0xF, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps,
                         progressive=marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            # lossless / hierarchical / ARITHMETIC-coded modes. The
            # arithmetic gate is deliberate, not deferred: the QM-coder
            # needs T.81 Table D.3's 46-row Qe state machine verbatim,
            # and this sandbox has no authoritative copy nor a libjpeg
            # to cross-check against — a from-memory table would pass
            # every local round-trip test (encoder and decoder would
            # share the error) while emitting non-compliant streams.
            # An honest error beats silently wrong interop.
            raise NotImplementedError(
                f"unsupported JPEG mode (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI: restart interval in MCUs (0 = none)
            (ri_val,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["cid"] == cs)
                dct = dc_tabs.get(tt >> 4)
                act = ac_tabs.get(tt & 0xF)
                # a BASELINE scan always uses both tables: an undefined
                # reference is a clean parse error here, not an
                # AttributeError deep in the entropy loop. Progressive
                # refinement scans may legally reference tables they
                # never read, so None passes through for SOF2.
                if not frame.get("progressive") and (dct is None
                                                     or act is None):
                    raise ValueError(
                        f"SOS references undefined Huffman table "
                        f"(Td={tt >> 4}, Ta={tt & 0xF})")
                scan.append((comp, dct, act))
            frame["ri"] = ri_val
            return frame, scan, qts, seg_end
        # APPn / COM skipped
    raise ValueError("no SOS in JPEG")


def _destuff_arr(arr: np.ndarray) -> bytes:
    """Remove 0xFF00 stuffing from a marker-free entropy slice."""
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    drop = ff[arr[ff + 1] == 0] + 1
    if len(drop):
        keep = np.ones(len(arr), dtype=bool)
        keep[drop] = False
        arr = arr[keep]
    return arr.tobytes()


def _destuff(buf: bytes, pos: int) -> bytes:
    """Entropy bytes from ``pos`` to the next marker, with the 0xFF00
    stuffing removed — one vectorized pass instead of per-byte checks
    in the bit reader."""
    arr = np.frombuffer(buf, dtype=np.uint8)[pos:]
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1]
    real = ff[nxt != 0]  # first non-stuffed 0xFF starts a marker
    end = int(real[0]) if len(real) else len(arr)
    return _destuff_arr(arr[:end])


def _split_restart_segments(buf: bytes, pos: int) -> list[bytes]:
    """Destuffed entropy streams of each restart interval: the scan data
    from ``pos`` split at RSTm markers (any non-stuffed 0xFF 0xD0-0xD7;
    other markers end the scan). T.81 E.1.4."""
    arr = np.frombuffer(buf, dtype=np.uint8)[pos:]
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1]
    segs = []
    start = 0
    for f, nx in zip(ff.tolist(), nxt.tolist()):
        if nx == 0 or f < start:
            continue  # stuffed byte, or marker byte inside a skip
        segs.append(_destuff_arr(arr[start:f]))
        if 0xD0 <= nx <= 0xD7:
            start = f + 2
            continue
        return segs  # EOI or any other marker ends the scan
    segs.append(_destuff_arr(arr[start:]))
    return segs


def _decode_scan(buf: bytes, pos: int, frame, scan, qts) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    coeffs = []
    for ci, (comp, dct, act) in enumerate(scan):
        nby, nbx = mcuy * comp["v"], mcux * comp["h"]
        coeffs.append(np.zeros((nby, nbx, 64), dtype=np.int32))

    # ---- entropy decode: destuffed stream + local-variable bit
    # accumulator + 16-bit LUT per symbol (see _HuffDecoder); ~6x
    # faster than the per-bit reader this replaces. With a restart
    # interval, each interval is an independent stream: bit state and
    # DC predictors reset at every boundary (T.81 E.1.4).
    ri = frame.get("ri", 0)
    if ri:
        segments = _split_restart_segments(buf, pos)
        want_segs = -(-(mcuy * mcux) // ri)
        if len(segments) != want_segs:
            raise ValueError(
                f"restart stream has {len(segments)} intervals, "
                f"expected {want_segs}")
        stream = segments[0]
    else:
        stream = _destuff(buf, pos)
    ns = len(stream)
    acc = 0
    nb = 0
    sp = 0
    preds = [0] * len(scan)
    for mi in range(mcuy * mcux):
        if ri and mi and mi % ri == 0:
            if sp - (nb >> 3) > ns:
                raise ValueError("JPEG entropy stream truncated")
            stream = segments[mi // ri]
            ns, acc, nb, sp = len(stream), 0, 0, 0
            preds = [0] * len(scan)
        my, mx = divmod(mi, mcux)
        for ci, (comp, dct, act) in enumerate(scan):
            dsym, dlen = dct.lut_sym, dct.lut_len
            asym, alen = act.lut_sym, act.lut_len
            cv = comp["v"]
            for bidx in range(cv * comp["h"]):
                zz = coeffs[ci][my * cv + bidx // comp["h"],
                                mx * comp["h"] + bidx % comp["h"]]
                # -- DC
                while nb < 16:
                    acc = (acc << 8) | (stream[sp] if sp < ns else 0)
                    sp += 1
                    nb += 8
                peek = (acc >> (nb - 16)) & 0xFFFF
                s = dsym[peek]
                ln = dlen[peek]
                if ln == 0:
                    raise ValueError("invalid Huffman code")
                nb -= ln
                if s:
                    while nb < s:
                        acc = (acc << 8) | (stream[sp] if sp < ns else 0)
                        sp += 1
                        nb += 8
                    r = (acc >> (nb - s)) & ((1 << s) - 1)
                    nb -= s
                    diff = r if r >= (1 << (s - 1)) else r - (1 << s) + 1
                else:
                    diff = 0
                preds[ci] += diff
                zz[0] = preds[ci]
                acc &= (1 << nb) - 1
                # -- AC
                k = 1
                while k <= 63:
                    while nb < 16:
                        acc = (acc << 8) | (stream[sp] if sp < ns else 0)
                        sp += 1
                        nb += 8
                    peek = (acc >> (nb - 16)) & 0xFFFF
                    rs = asym[peek]
                    ln = alen[peek]
                    if ln == 0:
                        raise ValueError("invalid Huffman code")
                    nb -= ln
                    s = rs & 0xF
                    if s == 0:
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += rs >> 4
                    if k > 63:
                        raise ValueError("AC run past end of block")
                    while nb < s:
                        acc = (acc << 8) | (stream[sp] if sp < ns else 0)
                        sp += 1
                        nb += 8
                    r = (acc >> (nb - s)) & ((1 << s) - 1)
                    nb -= s
                    zz[k] = r if r >= (1 << (s - 1)) \
                        else r - (1 << s) + 1
                    k += 1
                acc &= (1 << nb) - 1
    if sp - (nb >> 3) > ns:
        raise ValueError("JPEG entropy stream truncated")

    return _idct_planes([c for c, _, _ in scan], coeffs, qts, h, w,
                        hmax, vmax)


def _idct_planes(comps: list[dict], coeffs: list[np.ndarray], qts,
                 h: int, w: int, hmax: int, vmax: int) -> np.ndarray:
    """Shared back half of both decoders: zigzag coeff grids ->
    dequantize -> IDCT -> upsample -> crop -> RGB/grey pixels."""
    planes = []
    for ci, comp in enumerate(comps):
        qt = qts[comp["tq"]]
        zz = coeffs[ci]
        nby, nbx = zz.shape[:2]
        nat = zz.reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8) \
            .astype(np.float64) * qt[None]
        px = _C.T @ nat @ _C  # broadcast matmul: C^T F C per block
        px = px.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3) \
            .reshape(nby * 8, nbx * 8) + 128.0
        # upsample to full resolution (nearest) then crop
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            px = np.repeat(np.repeat(px, ry, axis=0), rx, axis=1)
        planes.append(px[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(planes, axis=-1))



def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def split_mjpeg(buf: bytes) -> list[bytes]:
    """Split a concatenated-JPEG (MJPEG) stream into frame byte slices.

    Marker-aware: length-prefixed segments (DQT/DHT/SOF/... — whose
    payloads are NOT 0xFF-stuffed and may contain marker-like byte
    pairs) are skipped by their declared length; only entropy-coded
    data after SOS is scanned, where 0xFF is always followed by 0x00
    (stuffing) or an RST marker, so the first other marker terminates
    the scan. A raw FFD8/FFD9 byte scan would miscount frames whenever
    a quant table or dimension happens to contain those pairs.
    """
    arr = np.frombuffer(buf, dtype=np.uint8)
    n = len(buf)
    ff = np.nonzero(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1]
    # positions where entropy-coded data legally ENDS: 0xFF followed by
    # neither a stuffed 0x00 nor an RST marker
    entropy_end = ff[(nxt != 0x00) & ~((nxt >= 0xD0) & (nxt <= 0xD7))]
    out = []
    pos = 0
    while pos < n:
        if pos + 2 > n or buf[pos] != 0xFF or buf[pos + 1] != 0xD8:
            raise ValueError(f"expected SOI at offset {pos} in MJPEG stream")
        start = pos
        pos += 2
        while True:
            if pos + 2 > n:
                raise ValueError("truncated MJPEG frame (no EOI)")
            if buf[pos] != 0xFF:
                raise ValueError(f"expected marker at offset {pos}")
            m = buf[pos + 1]
            if m == 0xD9:  # EOI
                pos += 2
                out.append(buf[start:pos])
                break
            if m == 0x01 or 0xD0 <= m <= 0xD7:  # standalone
                pos += 2
                continue
            if pos + 4 > n:
                raise ValueError("truncated MJPEG segment header")
            (length,) = struct.unpack_from(">H", buf, pos + 2)
            pos += 2 + length
            if m == 0xDA:  # SOS: skip entropy to the next real marker
                i = np.searchsorted(entropy_end, pos)
                if i >= len(entropy_end):
                    raise ValueError("unterminated entropy stream in MJPEG")
                pos = int(entropy_end[i])
    return out


def decode_jpeg_batch(bufs: list[bytes]) -> list[np.ndarray]:
    """Decode a batch of SAME-HEADER JPEGs in lockstep, vectorized.

    The per-image decoder spends ~1 us of Python per Huffman symbol; a
    uniform corpus (e.g. everything this codec's batch encoder emits)
    shares one header, so all images can advance ONE symbol per
    iteration together: peek a 32-bit window per active image with one
    gather, look every symbol up in one fancy-indexed LUT read, apply
    the DC/AC state transitions as masked array ops. Iteration count is
    the per-image symbol count (~200 for an 8x8), not images x symbols.
    Bit-exact against :func:`decode_jpeg` (tested); mixed-header inputs
    fall back to per-image decode.
    """
    if not bufs:
        return []
    frame, scan, qts, sos_end = _parse_stream(bufs[0])
    head = bufs[0][:sos_end]
    if any(b[:sos_end] != head for b in bufs[1:]):
        # mixed corpus batch: group SAME-HEADER runs and decode each
        # group together — baseline AND DRI groups vectorize in
        # lockstep; SOF2 groups take the per-image route below. Header
        # parse is marker-scan only (~us), tiny next to a scalar decode.
        groups: dict[bytes, list[int]] = {}
        for i, b in enumerate(bufs):
            end = _parse_stream(b)[3]
            groups.setdefault(b[:end], []).append(i)
        out: list = [None] * len(bufs)
        for idxs in groups.values():
            for i, im in zip(idxs, decode_jpeg_batch([bufs[i]
                                                      for i in idxs])):
                out[i] = im
        return out
    if frame.get("progressive"):
        # progressive (SOF2): same-SCRIPT batches (identical non-entropy
        # bytes, e.g. anything encode_jpeg_progressive emits) advance
        # every scan in lockstep; script mismatches decode per image.
        # The lockstep step cost is fixed numpy overhead amortized over
        # the batch — measured break-even ~64 images regardless of
        # frame size — so small batches take the scalar path. The batch
        # holds every image's int64 coefficient grid at once
        # (n x blocks x 64 x 8 B per component), so oversized
        # batch x frame combinations also fall back rather than blow a
        # worker heap (the scalar path peaks at ONE image's grid).
        blocks = 3 * (-(-frame["w"] // 8)) * (-(-frame["h"] // 8))
        out = None
        if len(bufs) >= 64 and len(bufs) * blocks * 64 * 8 < 512 << 20:
            out = _decode_progressive_batch(bufs)
        if out is not None:
            return out
        return [decode_jpeg(b) for b in bufs]

    n = len(bufs)
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ncomp = len(scan)

    # shared unit sequence: (comp, block index in MCU-traversal order)
    units_ci = []
    for ci, (comp, _, _) in enumerate(scan):
        units_ci.extend([ci] * (comp["h"] * comp["v"]))
    units_per_mcu = len(units_ci)
    n_mcu = mcuy * mcux
    U = n_mcu * units_per_mcu
    units_ci = np.tile(np.array(units_ci, dtype=np.int64), n_mcu)

    # restart intervals: every interval is an independent entropy
    # stream with reset bit state and DC predictors (T.81 E.1.4) — so
    # a DRI batch decodes in the SAME lockstep advance with each
    # interval as its own stream (image-major order). Bonus: splitting
    # shortens the longest stream by ~n_seg, so the symbol-serial
    # iteration count drops even though total work is unchanged.
    ri = int(frame.get("ri") or 0)
    n_seg = -(-n_mcu // ri) if ri else 1
    if n_seg > 1:
        U_seg = ri * units_per_mcu
        U_last = (n_mcu - (n_seg - 1) * ri) * units_per_mcu
    else:
        U_seg = U_last = U

    # stacked LUTs: (ncomp, 65536)
    dc_sym = np.stack([d.np_sym for _, d, _ in scan])
    dc_len = np.stack([d.np_len for _, d, _ in scan])
    ac_sym = np.stack([a.np_sym for _, _, a in scan])
    ac_len = np.stack([a.np_len for _, _, a in scan])

    if n_seg > 1:
        seglists = [_split_restart_segments(b, sos_end) for b in bufs]
        if any(len(s) != n_seg for s in seglists):
            # corrupt/unexpected marker layout: scalar path reports it
            return [decode_jpeg(b) for b in bufs]
        streams = [s for segs in seglists for s in segs]  # image-major
    else:
        streams = [_destuff(b, sos_end) for b in bufs]
    ns = len(streams)
    U_of = np.full(ns, U_seg, dtype=np.int64)
    U_of[n_seg - 1::n_seg] = U_last
    slens = np.array([len(s) for s in streams], dtype=np.int64)
    maxlen = int(slens.max())
    S = np.zeros((ns, maxlen + 8), dtype=np.uint8)
    for i, s in enumerate(streams):
        S[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
    Sflat = S.reshape(-1).astype(np.int64)
    rowlen = maxlen + 8

    zz = np.zeros((ns, U_seg, 64), dtype=np.int32)
    bitpos = np.zeros(ns, dtype=np.int64)
    unit = np.zeros(ns, dtype=np.int64)
    kpos = np.zeros(ns, dtype=np.int64)  # 0 => DC of `unit` next
    preds = np.zeros((ns, ncomp), dtype=np.int64)
    active = np.ones(ns, dtype=bool)
    imgidx = np.arange(ns, dtype=np.int64)

    maxbits = slens * 8
    while active.any():
        ia = imgidx[active]
        p = bitpos[ia]
        # consumed bits can never exceed the stream legitimately (the
        # final symbol ends exactly at or before the 1s padding); catch
        # runaway decodes of truncated streams BEFORE the byte gather
        # could walk into the next image's row
        if (p > maxbits[ia]).any():
            raise ValueError("JPEG entropy stream truncated")
        b0 = ia * rowlen + (p >> 3)
        sh = p & 7
        full5 = ((Sflat[b0] << 32) | (Sflat[b0 + 1] << 24)
                 | (Sflat[b0 + 2] << 16) | (Sflat[b0 + 3] << 8)
                 | Sflat[b0 + 4])
        w32 = (full5 >> (8 - sh)) & 0xFFFFFFFF
        peek = w32 >> 16
        ci = units_ci[unit[ia]]
        isdc = kpos[ia] == 0

        sym = np.where(isdc, dc_sym[ci, peek], ac_sym[ci, peek]) \
            .astype(np.int64)
        ln = np.where(isdc, dc_len[ci, peek], ac_len[ci, peek]) \
            .astype(np.int64)
        if (ln == 0).any():
            raise ValueError("invalid Huffman code")
        s = np.where(isdc, sym, sym & 0xF)
        mag = (w32 >> (32 - ln - s)) & ((1 << s) - 1)
        ext = np.where(mag >= (1 << np.maximum(s - 1, 0)),
                       mag, mag - (1 << s) + 1)
        ext = np.where(s == 0, 0, ext)
        bitpos[ia] = p + ln + s

        # -- DC transitions
        di = ia[isdc]
        dci = ci[isdc]
        preds[di, dci] += ext[isdc]
        zz[di, unit[di], 0] = preds[di, dci]
        kpos[di] = 1

        # -- AC transitions
        am = ~isdc
        ai = ia[am]
        rs = sym[am]
        sa = s[am]
        run = rs >> 4
        eob = (sa == 0) & (rs != 0xF0)
        zrl = rs == 0xF0
        wr = ~eob & ~zrl
        kk = kpos[ai] + run
        if (kk[wr] > 63).any():
            raise ValueError("AC run past end of block")
        wi = ai[wr]
        zz[wi, unit[wi], kk[wr]] = ext[am][wr]
        kpos[ai] = np.where(eob, 64, np.where(zrl, kpos[ai] + 16, kk + 1))

        adv = active & (kpos > 63)
        unit[adv] += 1
        kpos[adv] = 0
        active &= unit < U_of

    if (bitpos > slens * 8).any():
        raise ValueError("JPEG entropy stream truncated")

    if n_seg > 1:
        # stitch interval streams back into whole-image unit sequences:
        # segments are uniform (same header => same segmentation), so
        # the gather is two reshapes + one concat
        v = zz.reshape(n, n_seg, U_seg, 64)
        zz = np.concatenate(
            [v[:, :-1].reshape(n, (n_seg - 1) * U_seg, 64),
             v[:, -1, :U_last]], axis=1)

    # component planes: traversal-order units -> raster blocks, then
    # dequantize + IDCT batched over every block of every image
    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        hi, vi = comp["h"], comp["v"]
        nby, nbx = mcuy * vi, mcux * hi
        nb = nby * nbx
        by, bx = np.divmod(np.arange(nb), nbx)
        mcu = (by // vi) * mcux + (bx // hi)
        local = (by % vi) * hi + (bx % hi)
        order = np.lexsort((local, mcu))  # raster index per traversal slot
        zt = zz[:, units_ci == ci, :]  # (n, nb, 64) traversal order
        zr = np.empty_like(zt)
        zr[:, order] = zt
        qt = qts[comp["tq"]]
        nat = zr.reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8) \
            .astype(np.float64) * qt[None]
        px = _C.T @ nat @ _C
        px = px.reshape(n, nby, nbx, 8, 8).transpose(0, 1, 3, 2, 4) \
            .reshape(n, nby * 8, nbx * 8) + 128.0
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            px = np.repeat(np.repeat(px, ry, axis=1), rx, axis=2)
        planes.append(px[:, :h, :w])
    if len(planes) == 1:
        out = np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    else:
        out = ycbcr_to_rgb(np.stack(planes, axis=-1))
    return list(out)


# ------------------------------------------------------------ progressive
# ITU-T T.81 SOF2: spectral selection + successive approximation, both
# directions. The encoder emits a libjpeg-style scan script (DC first at
# Al=1 then a refinement bit pass; per-component AC bands first-passed at
# Al>=1 then refined to Al=0), so every decoder path — DC first/refine,
# AC first with EOB-run coding, AC refinement with correction bits
# (T.81 G.1.2.2 / G.1.2.3) — is exercised by our own streams. The
# decoded pixels are EXACTLY the baseline decode of the same quantized
# coefficients (tested): successive approximation is lossless once every
# refinement scan has landed.
#
# The progressive entropy coder is a per-block Python loop by design —
# this is the archival-interop path, not the corpus transcode hot path
# (that stays on the vectorized baseline batch codec).


@functools.lru_cache(maxsize=None)
def _prog_ac_table():
    """AC table for progressive scans: baseline's run/size symbols PLUS
    the EOBn run-length symbols (r<<4 with s=0, r 0..14) progressive
    EOB-run coding needs. Flat 8-bit canonical (176 symbols)."""
    syms = [(r << 4) | s for r in range(16) for s in range(0, 11)]
    return _huff_canonical({s: 8 for s in syms if (s & 0xF) or s <= 0xF0})


class _BitW:
    """MSB-first bit writer with T.81 1s-padding and 0xFF00 stuffing."""

    def __init__(self):
        self.acc = 0
        self.nb = 0
        self.out = bytearray()

    def put(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nb += n
        while self.nb >= 8:
            b = (self.acc >> (self.nb - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
            self.nb -= 8
            self.acc &= (1 << self.nb) - 1

    def flush(self) -> bytes:
        if self.nb:
            self.put((1 << (8 - self.nb)) - 1, 8 - self.nb)
        return bytes(self.out)


def _tozero_shift(v: int, al: int) -> int:
    """AC point transform: v / 2^al truncated toward ZERO (T.81 G.1.1.2;
    DC uses the plain arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


def _mcu_block_seq(comps: list[dict], mcux: int, mcuy: int):
    """(ci, by, bx) triples in interleaved MCU traversal order."""
    seq = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        seq.append((ci, my * c["v"] + vy,
                                    mx * c["h"] + vx))
    return seq


def _true_block_dims(frame: dict, comp: dict) -> tuple[int, int]:
    """Non-interleaved scans traverse the component's OWN block grid
    (ceil dims from the frame size and sampling), not the MCU-padded
    grid (T.81 A.2.2)."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _enc_dc_first(bw: _BitW, comps, coeffs, mcux, mcuy, al, dc_tab):
    preds = [0] * len(comps)
    for ci, by, bx in _mcu_block_seq(comps, mcux, mcuy):
        dcv = int(coeffs[ci][by, bx, 0]) >> al
        diff = dcv - preds[ci]
        preds[ci] = dcv
        s = int(abs(diff)).bit_length()
        c, ln = dc_tab[s]
        bw.put(c, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(bw: _BitW, comps, coeffs, mcux, mcuy, al):
    for ci, by, bx in _mcu_block_seq(comps, mcux, mcuy):
        bw.put((int(coeffs[ci][by, bx, 0]) >> al) & 1, 1)


def _flush_eobrun(bw: _BitW, eobrun: int, corr: list[int], ac_tab) -> int:
    if eobrun:
        rb = eobrun.bit_length() - 1
        c, ln = ac_tab[rb << 4]
        bw.put(c, ln)
        bw.put(eobrun - (1 << rb), rb)
        for b in corr:
            bw.put(b, 1)
        corr.clear()
    return 0


def _enc_ac_first(bw: _BitW, zz_blocks, ss, se, al, ac_tab):
    """First AC pass of a band (Ah=0): run/size with EOB-run coding."""
    eobrun = 0
    none: list[int] = []
    for blk in zz_blocks:
        vals = [_tozero_shift(int(blk[k]), al) for k in range(ss, se + 1)]
        if not any(vals):
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, none, ac_tab)
            continue
        eobrun = _flush_eobrun(bw, eobrun, none, ac_tab)
        r = 0
        last_nz = max(i for i, v in enumerate(vals) if v)
        for i, v in enumerate(vals):
            if i > last_nz:
                eobrun = 1  # trailing zeros: this block starts an EOB run
                break
            if v == 0:
                r += 1
                continue
            while r > 15:
                c, ln = ac_tab[0xF0]
                bw.put(c, ln)
                r -= 16
            s = int(abs(v)).bit_length()
            c, ln = ac_tab[(r << 4) | s]
            bw.put(c, ln)
            bw.put(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
    _flush_eobrun(bw, eobrun, none, ac_tab)


def _enc_ac_refine(bw: _BitW, zz_blocks, ss, se, al, ac_tab):
    """AC refinement pass (Ah=Al+1 -> Al): newly-significant coefficients
    as run/1 + sign, correction bits for already-significant ones
    woven per T.81 G.1.2.3."""
    eobrun = 0
    eob_corr: list[int] = []
    for blk in zz_blocks:
        t = [_tozero_shift(int(blk[k]), al) for k in range(ss, se + 1)]
        new_sig = [i for i, v in enumerate(t) if abs(v) == 1]
        if not new_sig:
            eob_corr.extend((abs(v) & 1) for v in t if abs(v) > 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                eobrun = _flush_eobrun(bw, eobrun, eob_corr, ac_tab)
            continue
        eobrun = _flush_eobrun(bw, eobrun, eob_corr, ac_tab)
        last_new = new_sig[-1]
        r = 0
        corr: list[int] = []
        for i, v in enumerate(t):
            if i > last_new:
                break
            a = abs(v)
            if a == 0:
                r += 1
                continue
            # flush ZRLs at EVERY nonzero coefficient — history ones
            # too. The decoder's ZRL walk consumes exactly the
            # correction bits of history coefficients inside the
            # 16-zero span; deferring the flush past a history
            # coefficient would emit its bit under the wrong symbol and
            # desync the stream (T.81 G.1.2.3 interleave order).
            while r > 15:
                c, ln = ac_tab[0xF0]
                bw.put(c, ln)
                for b in corr:
                    bw.put(b, 1)
                corr.clear()
                r -= 16
            if a > 1:
                corr.append(a & 1)
                continue
            c, ln = ac_tab[(r << 4) | 1]
            bw.put(c, ln)
            bw.put(1 if v > 0 else 0, 1)
            for b in corr:
                bw.put(b, 1)
            corr.clear()
            r = 0
        # tail after the last newly-significant coefficient: its zero
        # runs + correction bits ride the next EOB run
        tail_corr = [(abs(v) & 1) for v in t[last_new + 1:] if abs(v) > 1]
        if last_new < len(t) - 1:
            eobrun = 1
            eob_corr.extend(tail_corr)
    _flush_eobrun(bw, eobrun, eob_corr, ac_tab)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 98,
                            subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grey) -> progressive (SOF2) JFIF.

    Same quantized coefficients as :func:`encode_jpeg` — only the scan
    organization differs, so after all scans a decoder reconstructs
    EXACTLY the baseline image (tested pixel-identical)."""
    arr = np.asarray(arr)
    grey = arr.ndim == 2
    h, w = arr.shape[:2]
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    dc_tab, ac_tab = _flat_dc_table(), _prog_ac_table()

    # identical component prep to the baseline batch encoder
    if grey:
        planes = [arr.astype(np.float64)[None]]
        samp = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(arr[None])
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, 0), (0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, 0), (0, ph), (0, pw)), mode="edge")
            hh, ww = cb.shape[1:]
            cb = cb.reshape(1, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            cr = cr.reshape(1, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coeffs = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        ph, pw = -plane.shape[1] % 8, -plane.shape[2] % 8
        if ph or pw:
            plane = np.pad(plane, ((0, 0), (0, ph), (0, pw)), mode="edge")
        _, hh, ww = plane.shape
        bl = (plane - 128.0).reshape(1, hh // 8, 8, ww // 8, 8) \
            .transpose(0, 1, 3, 2, 4)
        nby, nbx = bl.shape[1:3]
        need_y, need_x = mcuy * vi, mcux * hi
        if nby < need_y or nbx < need_x:
            bl = np.pad(bl, ((0, 0), (0, need_y - nby), (0, need_x - nbx),
                             (0, 0), (0, 0)), mode="edge")
            nby, nbx = need_y, need_x
        qt = qt_l if ci == 0 else qt_c
        coeffs.append(_fdct_quant(bl.reshape(-1, 8, 8), qt)
                      .reshape(nby, nbx, 64).astype(np.int64))

    ncomp = len(planes)
    comps = [dict(cid=ci + 1, h=samp[ci][0], v=samp[ci][1],
                  tq=0 if ci == 0 else 1) for ci in range(ncomp)]
    frame = dict(h=h, w=w, comps=comps)

    def true_blocks(ci):
        nby, nbx = _true_block_dims(frame, comps[ci])
        return [coeffs[ci][by, bx] for by in range(nby)
                for bx in range(nbx)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(comp_ids, tds, tas, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid, td, ta in zip(comp_ids, tds, tas):
            body += bytes([cid, (td << 4) | ta])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qt_l.reshape(64)[ZIGZAG]
                                       .astype(np.uint8)))
    if not grey:
        out += seg(0xFFDB, b"\x01" + bytes(qt_c.reshape(64)[ZIGZAG]
                                           .astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in comps:
        sof += bytes([c["cid"], (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xFFC2, sof)
    out += seg(0xFFC4, _dht_payload(dc_tab, 0, 0))
    out += seg(0xFFC4, _dht_payload(ac_tab, 1, 0))

    all_ids = [c["cid"] for c in comps]
    # scan script: DC first (Al=1) -> AC bands first-pass -> AC
    # refinements -> DC refinement. Y's AC runs two successive
    # approximation levels (2 -> 1 -> 0) to exercise chained refinement.
    bw = _BitW()
    _enc_dc_first(bw, comps, coeffs, mcux, mcuy, 1, dc_tab)
    out += sos(all_ids, [0] * ncomp, [0] * ncomp, 0, 0, 0, 1) + bw.flush()

    bw = _BitW()
    _enc_ac_first(bw, true_blocks(0), 1, 5, 2, ac_tab)
    out += sos([comps[0]["cid"]], [0], [0], 1, 5, 0, 2) + bw.flush()
    bw = _BitW()
    _enc_ac_first(bw, true_blocks(0), 6, 63, 2, ac_tab)
    out += sos([comps[0]["cid"]], [0], [0], 6, 63, 0, 2) + bw.flush()
    for ci in range(1, ncomp):
        bw = _BitW()
        _enc_ac_first(bw, true_blocks(ci), 1, 63, 1, ac_tab)
        out += sos([comps[ci]["cid"]], [0], [0], 1, 63, 0, 1) + bw.flush()

    bw = _BitW()
    _enc_ac_refine(bw, true_blocks(0), 1, 63, 1, ac_tab)
    out += sos([comps[0]["cid"]], [0], [0], 1, 63, 2, 1) + bw.flush()

    bw = _BitW()
    _enc_dc_refine(bw, comps, coeffs, mcux, mcuy, 0)
    out += sos(all_ids, [0] * ncomp, [0] * ncomp, 0, 0, 1, 0) + bw.flush()

    for ci in range(ncomp):
        bw = _BitW()
        _enc_ac_refine(bw, true_blocks(ci), 1, 63, 0, ac_tab)
        out += sos([comps[ci]["cid"]], [0], [0], 1, 63, 1, 0) + bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


class _BitR:
    """MSB-first bit reader over one destuffed entropy segment."""

    __slots__ = ("s", "n", "acc", "nb", "sp")

    def __init__(self, stream: bytes):
        self.s = stream
        self.n = len(stream)
        self.acc = 0
        self.nb = 0
        self.sp = 0

    def bits(self, k: int) -> int:
        while self.nb < k:
            self.acc = (self.acc << 8) | (self.s[self.sp]
                                          if self.sp < self.n else 0)
            self.sp += 1
            self.nb += 8
        v = (self.acc >> (self.nb - k)) & ((1 << k) - 1)
        self.nb -= k
        self.acc &= (1 << self.nb) - 1
        return v

    def huff(self, tab: "_HuffDecoder") -> int:
        while self.nb < 16:
            self.acc = (self.acc << 8) | (self.s[self.sp]
                                          if self.sp < self.n else 0)
            self.sp += 1
            self.nb += 8
        peek = (self.acc >> (self.nb - 16)) & 0xFFFF
        sym = tab.lut_sym[peek]
        ln = tab.lut_len[peek]
        if ln == 0:
            raise ValueError("invalid Huffman code")
        self.nb -= ln
        self.acc &= (1 << self.nb) - 1
        return int(sym)


def _extend(r: int, s: int) -> int:
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


def _dec_dc_scan(br: _BitR, scan, frame, coeffs, mcux, mcuy, ah, al):
    comps = [c for c, _, _ in scan]
    preds = [0] * len(comps)
    for ci, by, bx in _mcu_block_seq(comps, mcux, mcuy):
        if ah == 0:  # first pass
            s = br.huff(scan[ci][1])
            diff = _extend(br.bits(s), s) if s else 0
            preds[ci] += diff
            coeffs[ci][by, bx, 0] = preds[ci] << al
        else:  # refinement: one raw bit
            coeffs[ci][by, bx, 0] |= br.bits(1) << al


def _dec_ac_first(br: _BitR, act, blocks, ss, se, al):
    eobrun = 0
    for blk in blocks:
        if eobrun:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = br.huff(act)
            r, s = sym >> 4, sym & 0xF
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1


def _dec_ac_refine(br: _BitR, act, blocks, ss, se, al):
    p1 = 1 << al
    eobrun = 0

    def correct(blk, k):
        if br.bits(1) and (abs(int(blk[k])) & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else -p1

    for blk in blocks:
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = br.huff(act)
                r, s = sym >> 4, sym & 0xF
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) + (br.bits(r) if r else 0)
                        break  # EOB-run tail handled below
                    # ZRL: skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("refinement size must be 1")
                    newval = p1 if br.bits(1) else -p1
                while k <= se:
                    if blk[k] != 0:
                        correct(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("refinement run past band end")
                    blk[k] = newval
                k += 1
        if eobrun:
            while k <= se:
                if blk[k] != 0:
                    correct(blk, k)
                k += 1
            eobrun -= 1


def _decode_progressive(buf: bytes) -> np.ndarray:
    """Multi-scan SOF2 driver: walks every marker segment, accumulating
    coefficient approximations scan by scan, then reconstructs once."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    n = len(buf)
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
    coeffs: list[np.ndarray] = []
    hmax = vmax = mcux = mcuy = 0
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (length,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2:pos + length]
        pos += length
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qts[tq] = np.frombuffer(body, np.uint8, 64, p) \
                    .astype(np.int64)[UNZIGZAG].reshape(8, 8)
                p += 64
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                dec = _HuffDecoder(bits, body[p + 17:p + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = dec
                p += 17 + nv
        elif marker == 0xC2:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(dict(cid=cid, h=hv >> 4, v=hv & 0xF, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors > 2")
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            coeffs = [np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                               dtype=np.int64) for c in comps]
        elif marker == 0xC0:
            raise ValueError("baseline SOF inside progressive decode")
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise NotImplementedError(
                    "restart intervals in progressive scans")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, c in enumerate(frame["comps"])
                           if c["cid"] == cs)
                sel.append((idx, tt >> 4, tt & 0xF))
            ss, se, aa = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = aa >> 4, aa & 0xF
            br = _BitR(_destuff(buf, pos))
            if ss == 0 and se != 0:
                raise ValueError(
                    "progressive DC scan requires Se=0 (a baseline "
                    "stream relabeled SOF2 lands here)")
            if ss == 0:  # DC scan
                scan = [(frame["comps"][i], dc_tabs.get(td), None)
                        for i, td, _ in sel]
                cs_arr = [coeffs[i] for i, _, _ in sel]
                _dec_dc_scan(br, scan, frame, cs_arr, mcux, mcuy, ah, al)
            else:  # AC scan: exactly one component
                if ns != 1:
                    raise ValueError("interleaved AC scan is illegal")
                i, _, ta = sel[0]
                nby, nbx = _true_block_dims(frame, frame["comps"][i])
                blocks = [coeffs[i][by, bx] for by in range(nby)
                          for bx in range(nbx)]
                if ah == 0:
                    _dec_ac_first(br, ac_tabs[ta], blocks, ss, se, al)
                else:
                    _dec_ac_refine(br, ac_tabs[ta], blocks, ss, se, al)
            # skip the entropy bytes this scan consumed
            arr = np.frombuffer(buf, np.uint8)[pos:]
            ff = np.nonzero(arr[:-1] == 0xFF)[0]
            real = ff[arr[ff + 1] != 0]
            pos += int(real[0]) if len(real) else len(arr)
    if frame is None:
        raise ValueError("no SOF2 frame found")
    return _idct_planes(frame["comps"],
                        [c.astype(np.int32) for c in coeffs], qts,
                        frame["h"], frame["w"], hmax, vmax)


# ---------------------------------------------------------------------------
# Lockstep progressive batch decode (round 5)
#
# A uniform SOF2 corpus (everything encode_jpeg_progressive emits) shares
# every non-entropy byte — frame header, quant/Huffman tables, and the
# whole scan SCRIPT. Only the entropy payloads differ per image, so each
# scan can advance every image together, one symbol (or one band
# position) per vectorized step, exactly like the baseline lockstep
# decoder. Structure mismatches return None and the caller decodes per
# image. Bit-exact against _decode_progressive (tested).
# ---------------------------------------------------------------------------


def _prog_entropy_spans(buf: bytes):
    """(skeleton bytes with entropy elided, [(start, end)] per SOS)."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    spans = []
    pieces = [buf[:2]]
    pos = 2
    n = len(buf)
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pieces.append(buf[pos:pos + 2])
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (length,) = struct.unpack_from(">H", buf, pos)
        pieces.append(buf[pos:pos + length])
        pos += length
        if marker == 0xDA:
            arr = np.frombuffer(buf, np.uint8)[pos:]
            ff = np.nonzero(arr[:-1] == 0xFF)[0]
            real = ff[arr[ff + 1] != 0]
            end = pos + (int(real[0]) if len(real) else len(arr))
            spans.append((pos, end))
            pos = end
    return b"".join(pieces), spans


class _LockBits:
    """Per-scan lockstep bit source: one padded byte matrix over every
    image's destuffed entropy segment, a bit cursor per stream, and the
    32-bit window gather the baseline lockstep decoder uses."""

    def __init__(self, streams: list[bytes]):
        self.n = len(streams)
        slens = np.array([len(s) for s in streams], dtype=np.int64)
        maxlen = int(slens.max()) if self.n else 0
        S = np.zeros((self.n, maxlen + 8), dtype=np.uint8)
        for i, s in enumerate(streams):
            S[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        self.flat = S.reshape(-1).astype(np.int64)
        self.rowlen = maxlen + 8
        self.pos = np.zeros(self.n, dtype=np.int64)
        self.maxbits = slens * 8

    def w32(self, idx: np.ndarray) -> np.ndarray:
        """Next 32 bits (MSB-aligned) for each stream in ``idx``."""
        p = self.pos[idx]
        if (p > self.maxbits[idx] + 64).any():
            raise ValueError("JPEG entropy stream truncated")
        b0 = idx * self.rowlen + (p >> 3)
        sh = p & 7
        full5 = ((self.flat[b0] << 32) | (self.flat[b0 + 1] << 24)
                 | (self.flat[b0 + 2] << 16) | (self.flat[b0 + 3] << 8)
                 | self.flat[b0 + 4])
        return (full5 >> (8 - sh)) & 0xFFFFFFFF


def _batch_huff(w32: np.ndarray, lut_sym: np.ndarray,
                lut_len: np.ndarray):
    """(symbol, code length) per stream from a 16-bit peek."""
    peek = w32 >> 16
    sym = lut_sym[peek].astype(np.int64)
    ln = lut_len[peek].astype(np.int64)
    if (ln == 0).any():
        raise ValueError("invalid Huffman code")
    return sym, ln


def _batch_dc_scan(bits: _LockBits, scan_luts, units, ncomp,
                   coeff_units, ah, al):
    """Interleaved DC scan over every stream, unit-locked: every stream
    decodes the SAME unit at each step, so only bit cursors differ.
    ``coeff_units[u]`` is the (n,) int64 view of unit u's DC slot."""
    n = bits.n
    allidx = np.arange(n, dtype=np.int64)
    if ah == 0:
        preds = np.zeros((n, ncomp), dtype=np.int64)
        for u, ci in enumerate(units):
            w32 = bits.w32(allidx)
            sym, ln = _batch_huff(w32, *scan_luts[ci])
            s = sym
            mag = (w32 >> (32 - ln - s)) & ((np.int64(1) << s) - 1)
            diff = np.where(mag >= (np.int64(1) << np.maximum(s - 1, 0)),
                            mag, mag - (np.int64(1) << s) + 1)
            diff = np.where(s == 0, 0, diff)
            bits.pos += ln + s
            preds[:, ci] += diff
            coeff_units[u][:] = preds[:, ci] << al
    else:
        # refinement: exactly ONE raw bit per unit, consecutively —
        # a single (n, U) gather, no loop
        U = len(units)
        p = bits.pos[:, None] + np.arange(U, dtype=np.int64)[None, :]
        byte = bits.flat[(np.arange(n, dtype=np.int64)[:, None]
                          * bits.rowlen) + (p >> 3)]
        bit = (byte >> (7 - (p & 7))) & 1
        for u in range(U):
            coeff_units[u][:] |= bit[:, u] << al
        bits.pos += U


def _batch_ac_first(bits: _LockBits, lut_sym, lut_len, plane, bmap,
                    ss, se, al):
    """First-pass AC scan: every active stream consumes exactly one
    Huffman symbol (+ payload bits) per step; EOB runs skip whole
    blocks without touching the bit stream. ``plane`` is the padded
    (n, nby*nbx, 64) flat view; ``bmap`` maps the scan's raster
    true-block order into it (non-interleaved scans walk the
    component's own grid, T.81 A.2.2)."""
    n, nb = plane.shape[0], len(bmap)
    blk = np.zeros(n, dtype=np.int64)
    k = np.full(n, ss, dtype=np.int64)
    eob = np.zeros(n, dtype=np.int64)
    one = np.int64(1)
    while True:
        # consume pending EOB runs (bit-free block skips)
        skip = np.minimum(eob, nb - blk)
        blk += skip
        eob -= skip
        act = np.nonzero(blk < nb)[0]
        if not len(act):
            break
        w32 = bits.w32(act)
        sym, ln = _batch_huff(w32, lut_sym, lut_len)
        r, s = sym >> 4, sym & 0xF
        is_eob = (s == 0) & (r < 15)
        is_zrl = (s == 0) & (r == 15)
        place = s > 0
        extra = np.where(place, s, np.where(is_eob, r, 0))
        mag = (w32 >> (32 - ln - extra)) & ((one << extra) - 1)
        bits.pos[act] += ln + extra
        ka = k[act]
        k_new = ka + np.where(place, r, np.where(is_zrl, 16, 0))
        if (place & (k_new > se)).any():
            raise ValueError("AC run past end of band")
        pi = np.nonzero(place)[0]
        if len(pi):
            val = np.where(mag[pi] >= (one << np.maximum(s[pi] - 1, 0)),
                           mag[pi], mag[pi] - (one << s[pi]) + 1)
            plane[act[pi], bmap[blk[act[pi]]], k_new[pi]] = val << al
        ka = np.where(place, k_new + 1, np.where(is_zrl, k_new, ka))
        eob[act] += np.where(is_eob, (one << r) - 1 + mag, 0)
        ended = is_eob | (ka > se)
        blk[act] += ended
        k[act] = np.where(ended, ss, ka)


def _batch_ac_refine(bits: _LockBits, lut_sym, lut_len, plane, bmap,
                     ss, se, al):
    """Refinement AC scan, lockstep with PER-SYMBOL crawl resolution.

    Within a refinement scan the cursor moves strictly forward and each
    block is visited once, so the zero/nonzero pattern the cursor will
    encounter is FROZEN at scan start (corrections keep coefficients
    nonzero; values placed this scan land behind the cursor). Per-block
    prefix sums over that frozen mask turn the scalar position-by-
    position crawl (_dec_ac_refine) into O(1) per symbol: the landing
    zero comes from a zero-rank lookup, the correction-bit count from a
    nonzero-count difference, and the ragged correction bits of every
    stream gather in one flattened pass per step. Streams consuming an
    EOB run resolve one whole block per step the same way.
    ``plane`` / ``bmap`` as in :func:`_batch_ac_first`.
    """
    n, nb = plane.shape[0], len(bmap)
    W = se - ss + 1
    p1 = np.int64(1 << al)
    one = np.int64(1)
    # frozen history mask + padded prefix sums: zcp[.., j] = zeros in
    # band offsets [0, j), nzp likewise for nonzeros
    band = plane[:, bmap][:, :, ss:se + 1]
    nz = band != 0
    pad = np.zeros((n, nb, 1), dtype=np.int64)
    zcp = np.concatenate([pad, np.cumsum(~nz, axis=2)], axis=2)
    nzp = np.concatenate([pad, np.cumsum(nz, axis=2)], axis=2)
    joff = np.arange(W, dtype=np.int64)

    blk = np.zeros(n, dtype=np.int64)
    j = np.zeros(n, dtype=np.int64)  # offset within the band
    eob = np.zeros(n, dtype=np.int64)

    def apply_corrections(streams, blocks, j0, j_land):
        """One correction bit per frozen-nonzero position in
        [j0, j_land) of each stream's current block, in position order
        (== bit order); returns per-stream consumed-bit counts."""
        if not len(streams):
            return
        nzrow = nz[streams, blocks]  # (Q, W)
        mask = nzrow & (joff[None, :] >= j0[:, None])             & (joff[None, :] < j_land[:, None])
        m = mask.sum(axis=1)
        tot = int(m.sum())
        bits.pos[streams] += m  # reserve BEFORE gathering ranks
        if tot == 0:
            return
        q_idx, jpos = np.nonzero(mask)  # row-major: bit order per q
        starts = np.concatenate([[0], np.cumsum(m)[:-1]])
        rank = np.arange(tot, dtype=np.int64) - starts[q_idx]
        st = streams[q_idx]
        bp = (bits.pos[st] - m[q_idx]) + rank
        byte = bits.flat[st * bits.rowlen + (bp >> 3)]
        bit = (byte >> (7 - (bp & 7))) & 1
        pos_flat = bmap[blocks[q_idx]]
        v = plane[st, pos_flat, ss + jpos]
        upd = (bit == 1) & ((np.abs(v) & p1) == 0)
        ui = np.nonzero(upd)[0]
        if len(ui):
            plane[st[ui], pos_flat[ui], ss + jpos[ui]] = \
                v[ui] + np.where(v[ui] > 0, p1, -p1)

    while True:
        act = np.nonzero(blk < nb)[0]
        if not len(act):
            break
        in_eob = eob[act] > 0

        # ---- EOB-run streams: finish one whole block per step
        ei = act[np.nonzero(in_eob)[0]]
        if len(ei):
            apply_corrections(ei, blk[ei], j[ei],
                              np.full(len(ei), W, dtype=np.int64))
            eob[ei] -= 1
            blk[ei] += 1
            j[ei] = 0

        # ---- symbol streams: one symbol + its full crawl per step
        si = act[np.nonzero(~in_eob)[0]]
        if len(si):
            w32 = bits.w32(si)
            sym, ln = _batch_huff(w32, lut_sym, lut_len)
            r, s = sym >> 4, sym & 0xF
            if (s > 1).any():
                raise ValueError("refinement size must be 1")
            is_eob = (s == 0) & (r < 15)
            extra = np.where(is_eob, r, np.where(s == 1, 1, 0))
            mag = (w32 >> (32 - ln - extra)) & ((one << extra) - 1)
            bits.pos[si] += ln + extra
            newval = np.where(is_eob, 0,
                              np.where(s == 1,
                                       np.where(mag == 1, p1, -p1), 0))
            r_skip = np.where(is_eob, 0, r)

            j0 = j[si]
            zrow = zcp[si, blk[si]]  # (Q, W+1) zeros before offset
            # landing zero = the (zeros_before(j0) + r_skip + 1)-th zero;
            # EOB symbols crawl the whole remaining band instead
            target = zrow[np.arange(len(si)), j0] + r_skip + 1
            j_land = np.where(is_eob, W,
                              (zrow[:, 1:] < target[:, None]).sum(axis=1))
            if ((newval != 0) & (j_land >= W)).any():
                raise ValueError("refinement run past band end")
            apply_corrections(si, blk[si], j0, j_land)
            pi = np.nonzero((newval != 0) & (j_land < W))[0]
            if len(pi):
                plane[si[pi], bmap[blk[si[pi]]], ss + j_land[pi]] = \
                    newval[pi]
            eob[si] += np.where(is_eob,
                                (one << r) + np.where(r > 0, mag, 0) - 1,
                                0)
            jn = np.where(is_eob, np.int64(W), j_land + 1)
            ended = jn >= W
            blk[si] += ended
            j[si] = np.where(ended, 0, jn)


def _decode_progressive_batch(bufs: list[bytes]):
    """Lockstep batch decode of same-script SOF2 streams; None when the
    batch's non-entropy structure isn't uniform (caller falls back to
    per-image decode). Pixel-identical to :func:`_decode_progressive`."""
    skel0, spans0 = _prog_entropy_spans(bufs[0])
    all_spans = [spans0]
    for b in bufs[1:]:
        sk, sp = _prog_entropy_spans(b)
        if sk != skel0 or len(sp) != len(spans0):
            return None
        all_spans.append(sp)

    n = len(bufs)
    buf = bufs[0]
    pos = 2
    nbytes = len(buf)
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
    coeffs: list[np.ndarray] = []  # (n, nby_pad, nbx_pad, 64) int64 each
    hmax = vmax = mcux = mcuy = 0
    scan_i = 0
    while pos + 2 <= nbytes:
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (length,) = struct.unpack_from(">H", buf, pos)
        body = buf[pos + 2:pos + length]
        pos += length
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qts[tq] = np.frombuffer(body, np.uint8, 64, p) \
                    .astype(np.int64)[UNZIGZAG].reshape(8, 8)
                p += 64
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits_ = list(body[p + 1:p + 17])
                nv = sum(bits_)
                dec = _HuffDecoder(bits_, body[p + 17:p + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = dec
                p += 17 + nv
        elif marker == 0xC2:
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(dict(cid=cid, h=hv >> 4, v=hv & 0xF, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors > 2")
            mcux = -(-fw // (8 * hmax))
            mcuy = -(-fh // (8 * vmax))
            coeffs = [np.zeros((n, mcuy * c["v"], mcux * c["h"], 64),
                               dtype=np.int64) for c in comps]
        elif marker == 0xC0:
            raise ValueError("baseline SOF inside progressive decode")
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri:
                raise NotImplementedError(
                    "restart intervals in progressive scans")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, c in enumerate(frame["comps"])
                           if c["cid"] == cs)
                sel.append((idx, tt >> 4, tt & 0xF))
            ss, se, aa = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = aa >> 4, aa & 0xF
            if ss == 0 and se != 0:
                raise ValueError(
                    "progressive DC scan requires Se=0 (a baseline "
                    "stream relabeled SOF2 lands here)")
            streams = []
            for ii, b in enumerate(bufs):
                s0, e0 = all_spans[ii][scan_i]
                streams.append(_destuff_arr(
                    np.frombuffer(b, np.uint8)[s0:e0]))
            bits = _LockBits(streams)
            if ss == 0:  # DC scan (interleaved)
                sel_comps = [frame["comps"][i] for i, _, _ in sel]
                scan_luts = [(dc_tabs[td].np_sym, dc_tabs[td].np_len)
                             for _, td, _ in sel]
                seq = _mcu_block_seq(sel_comps, mcux, mcuy)
                units = [ci for ci, _, _ in seq]
                cu = [coeffs[sel[ci][0]][:, by, bx, 0]
                      for ci, by, bx in seq]
                _batch_dc_scan(bits, scan_luts, units, len(sel), cu,
                               ah, al)
            else:  # AC scan: one component, true block raster order
                if ns != 1:
                    raise ValueError("interleaved AC scan is illegal")
                i, _, ta = sel[0]
                nby, nbx = _true_block_dims(frame, frame["comps"][i])
                pad = coeffs[i].shape[2]  # nbx_pad
                by, bx = np.divmod(np.arange(nby * nbx, dtype=np.int64),
                                   nbx)
                bmap = by * pad + bx
                plane = coeffs[i].reshape(n, -1, 64)
                tab = ac_tabs[ta]
                if ah == 0:
                    _batch_ac_first(bits, tab.np_sym, tab.np_len,
                                    plane, bmap, ss, se, al)
                else:
                    _batch_ac_refine(bits, tab.np_sym, tab.np_len,
                                     plane, bmap, ss, se, al)
            scan_i += 1
            s0, e0 = spans0[scan_i - 1]
            pos = e0
    if frame is None:
        raise ValueError("no SOF2 frame found")
    return [_idct_planes(frame["comps"],
                         [c[ii].astype(np.int32) for c in coeffs], qts,
                         frame["h"], frame["w"], hmax, vmax)
            for ii in range(n)]


# ---------------------------------------------------------------------------
# Batch progressive encode (round 5)
#
# Every scan's bit stream is a STATIC function of the quantized
# coefficients, so the whole SOF2 scan script vectorizes with the same
# record machinery as the baseline batch encoder: each Huffman/payload
# emission becomes a (stream, seq, code, len, payload, plen) record
# built with array ops across every image at once, one lexsort puts the
# records in T.81 emission order, and the bit scatter packs per-image
# segments. Byte-identical to encode_jpeg_progressive (tested).
# ---------------------------------------------------------------------------

_SUBB = 1 << 26      # per-block seq window
_INBLK = 1 << 25     # in-block records sort after the block's EOB flush


class _Recs:
    """Flat record accumulator for one scan."""

    def __init__(self):
        self.k, self.q, self.cv, self.cl, self.mv, self.ml = \
            [], [], [], [], [], []

    def emit(self, key, seq, cv, cl, mv, ml):
        self.k.append(np.asarray(key, dtype=np.int64))
        self.q.append(np.asarray(seq, dtype=np.int64))
        self.cv.append(np.asarray(cv, dtype=np.int64))
        self.cl.append(np.asarray(cl, dtype=np.int64))
        self.mv.append(np.asarray(mv, dtype=np.int64))
        self.ml.append(np.asarray(ml, dtype=np.int64))

    def pack(self, n_img: int) -> list[bytes]:
        """Sort by (image, seq), fuse code+payload, pad each image's
        stream to a byte with 1s, bit-scatter, 0xFF-stuff — the
        baseline batch encoder's packing tail, restart-free."""
        if not self.k:
            return [b""] * n_img
        key = np.concatenate(self.k)
        seq = np.concatenate(self.q)
        srt = np.lexsort((seq, key))
        m_len = np.concatenate(self.ml)[srt]
        value = (np.concatenate(self.cv)[srt] << m_len) \
            | np.concatenate(self.mv)[srt]
        nbits = np.concatenate(self.cl)[srt] + m_len
        rec_img = key[srt]
        tot = np.bincount(rec_img, weights=nbits,
                          minlength=n_img).astype(np.int64)
        padded = (tot + 7) & ~np.int64(7)
        img_base = np.concatenate(([0], np.cumsum(padded)))
        cs = np.cumsum(nbits) - nbits
        unpadded_base = np.concatenate(([0], np.cumsum(tot)))[:-1]
        start = img_base[rec_img] + (cs - unpadded_base[rec_img])
        pad = padded - tot
        pmask = pad > 0
        if pmask.any():
            start = np.concatenate([start,
                                    img_base[:-1][pmask] + tot[pmask]])
            value = np.concatenate([value, _POW2[pad[pmask]] - 1])
            nbits = np.concatenate([nbits, pad[pmask]])
        nbytes = int(img_base[-1]) >> 3
        out_b = np.zeros(nbytes + 4, dtype=np.uint8)
        byte0 = start >> 3
        v40 = value << (40 - (start & 7) - nbits)
        for k in range(5):
            np.bitwise_or.at(out_b, byte0 + k,
                             ((v40 >> (32 - 8 * k)) & 0xFF)
                             .astype(np.uint8))
        out_b = out_b[:nbytes]
        bb = img_base >> 3
        out = []
        for i in range(n_img):
            b = out_b[bb[i]:bb[i + 1]]
            ff = np.nonzero(b == 0xFF)[0]
            if len(ff):
                b = np.insert(b, ff + 1, 0)
            out.append(b.tobytes())
        return out


def _prog_dc_scan_recs(coeffs, comps, mcux, mcuy, ah, al,
                       dc_code, dc_len) -> _Recs:
    """Interleaved DC scan records: first pass (ah=0) emits Huffman-coded
    diffs of dc>>al along the MCU traversal; refinement emits one raw
    bit per unit (scalar twins: _enc_dc_first / _enc_dc_refine)."""
    recs = _Recs()
    n_img = coeffs[0].shape[0]
    seq_list = _mcu_block_seq(comps, mcux, mcuy)
    imgs = np.arange(n_img, dtype=np.int64)
    for ci in range(len(comps)):
        # this component's units in traversal order + their global seq
        us = np.array([u for u, (c, _, _) in enumerate(seq_list)
                       if c == ci], dtype=np.int64)
        by = np.array([b for c, b, _ in seq_list if c == ci],
                      dtype=np.int64)
        bx = np.array([b for c, _, b in seq_list if c == ci],
                      dtype=np.int64)
        dc = coeffs[ci][:, by, bx, 0] >> al  # (n, units_ci)
        if ah == 0:
            diff = dc.copy()
            diff[:, 1:] -= dc[:, :-1]
            diff = diff.reshape(-1)
            s = _bit_length(np.abs(diff))
            mag = np.where(diff >= 0, diff, diff + _POW2[s] - 1)
            recs.emit(np.repeat(imgs, len(us)),
                      np.tile(us, n_img),
                      dc_code[s], dc_len[s], mag, s)
        else:
            bit = dc.reshape(-1) & 1
            recs.emit(np.repeat(imgs, len(us)), np.tile(us, n_img),
                      bit, np.ones(len(bit), np.int64),
                      np.zeros(len(bit), np.int64),
                      np.zeros(len(bit), np.int64))
    return recs


def _prog_eob_flushes(recs: _Recs, emit: np.ndarray, trail: np.ndarray,
                      ac_code, ac_len):
    """EOB-run bookkeeping shared by the AC scan builders: one EOBn
    record per pending run, flushed just before the next emitting block
    (seq = block*_SUBB, ahead of its in-block records) or at scan end
    (seq block = nb). Returns (flush_img, flush_eb, prev_eb) so the
    refinement builder can attach the run's correction bits. Assumes
    nb <= 32766 so no run ever hits the 0x7FFF forced flush."""
    n, nb = emit.shape
    img, eb = np.nonzero(emit)
    if len(img):
        firsts = np.concatenate(([True], img[1:] != img[:-1]))
        lasts = np.concatenate((img[1:] != img[:-1], [True]))
        tr_e = trail[img, eb].astype(np.int64)
        prev_eb = np.where(firsts, np.int64(-1),
                           np.concatenate(([0], eb[:-1])))
        prev_tr = np.where(firsts, 0, np.concatenate(([0], tr_e[:-1])))
        count_mid = (eb - prev_eb - 1) + prev_tr
        m = count_mid > 0
        f_img = [img[m]]
        f_eb = [eb[m]]
        f_prev = [prev_eb[m]]
        f_count = [count_mid[m]]
        # end-of-scan flush for images WITH emitting blocks
        li, le, lt = img[lasts], eb[lasts], tr_e[lasts]
        count_end = (nb - 1 - le) + lt
        me = count_end > 0
        f_img.append(li[me])
        f_eb.append(np.full(int(me.sum()), nb, dtype=np.int64))
        f_prev.append(le[me])
        f_count.append(count_end[me])
        has_emit = np.zeros(n, dtype=bool)
        has_emit[img] = True
    else:
        f_img, f_eb, f_prev, f_count = [], [], [], []
        has_emit = np.zeros(n, dtype=bool)
    # images with NO emitting block: one all-empty run of nb blocks
    empty_imgs = np.nonzero(~has_emit)[0]
    if len(empty_imgs) and nb > 0:
        f_img.append(empty_imgs)
        f_eb.append(np.full(len(empty_imgs), nb, dtype=np.int64))
        f_prev.append(np.full(len(empty_imgs), -1, dtype=np.int64))
        f_count.append(np.full(len(empty_imgs), nb, dtype=np.int64))
    if not f_img:
        return (np.empty(0, np.int64),) * 3
    fi = np.concatenate(f_img)
    fe = np.concatenate(f_eb)
    fp = np.concatenate(f_prev)
    fc = np.concatenate(f_count)
    rb = _bit_length(fc) - 1
    sym = rb << 4
    recs.emit(fi, fe * _SUBB, ac_code[sym], ac_len[sym],
              fc - _POW2[rb], rb)
    return fi, fe, fp


def _prog_ac_first_recs(recs: _Recs, band: np.ndarray,
                        ac_code, ac_len) -> None:
    """First-pass AC band records (scalar twin: _enc_ac_first): run/size
    over the band's nonzeros with ZRL expansion, trailing zeros and
    empty blocks folded into EOB runs. ``band`` is the tozero-shifted
    (n, nb, W) window."""
    n, nb, W = band.shape
    flat = band.reshape(n * nb, W)
    nzr, nzp = np.nonzero(flat)
    v = flat[nzr, nzp]
    img_of = nzr // nb
    blk_of = nzr % nb
    last_nz = np.full(n * nb, -1, dtype=np.int64)
    if len(nzr):
        np.maximum.at(last_nz, nzr, nzp)
    firsts = np.concatenate(([True], nzr[1:] != nzr[:-1])) \
        if len(nzr) else np.zeros(0, bool)
    prev = np.where(firsts, np.int64(-1),
                    np.concatenate(([0], nzp[:-1])) if len(nzp) else nzp)
    run = nzp - prev - 1
    nzrl = run >> 4
    rem = run & 15
    s = _bit_length(np.abs(v))
    sym = (rem << 4) | s
    mag = np.where(v >= 0, v, v + _POW2[s] - 1)
    base = blk_of * _SUBB + _INBLK + nzp * 1024
    recs.emit(img_of, base + 512, ac_code[sym], ac_len[sym], mag, s)
    zm = nzrl > 0
    if zm.any():
        reps = nzrl[zm]
        tot = int(reps.sum())
        j = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        zsym = np.full(tot, 0xF0, dtype=np.int64)
        recs.emit(np.repeat(img_of[zm], reps),
                  np.repeat(base[zm], reps) + j,
                  ac_code[zsym], ac_len[zsym],
                  np.zeros(tot, np.int64), np.zeros(tot, np.int64))
    emit2 = (last_nz >= 0).reshape(n, nb)
    trail = ((last_nz < W - 1) & (last_nz >= 0)).reshape(n, nb)
    _prog_eob_flushes(recs, emit2, trail, ac_code, ac_len)


def _group_ranks(keys: np.ndarray) -> np.ndarray:
    """Rank of each element within its run of equal (sorted) keys."""
    if not len(keys):
        return keys.astype(np.int64)
    firsts = np.concatenate(([True], keys[1:] != keys[:-1]))
    starts = np.nonzero(firsts)[0]
    lens = np.diff(np.concatenate((starts, [len(keys)])))
    return np.arange(len(keys), dtype=np.int64) - np.repeat(starts, lens)


def _prog_ac_refine_recs(recs: _Recs, band: np.ndarray,
                         ac_code, ac_len) -> None:
    """Refinement AC band records (scalar twin: _enc_ac_refine, T.81
    G.1.2.3): newly-significant coefficients as run/1 + sign, history
    correction bits woven after the ZRL or symbol that flushes them,
    tails and empty blocks folded into EOB runs whose correction bits
    ride the EOBn flush. Everything is a static function of the band,
    so the interleave is computed with prefix sums and two
    searchsorted passes — no per-position loop."""
    n, nb, W = band.shape
    R = n * nb
    flat = band.reshape(R, W)
    a = np.abs(flat)
    hist = a > 1
    new = a == 1
    blk_of_row = np.arange(R, dtype=np.int64) % nb
    img_of_row = np.arange(R, dtype=np.int64) // nb

    last_new = np.full(R, -1, dtype=np.int64)
    wr, wp = np.nonzero(new)
    if len(wr):
        np.maximum.at(last_new, wr, wp)
    emit_rows = last_new >= 0

    # ---------- in-block records: nonzero positions <= last_new
    Z = np.cumsum(flat == 0, axis=1)  # zeros at positions <= p
    Nc = np.cumsum(new, axis=1)
    nz_mask = (a > 0) & (np.arange(W)[None, :] <= last_new[:, None])
    rr, pp = np.nonzero(nz_mask)  # row-major == emission order
    isnew = new[rr, pp]
    # segment = # news strictly before p; zero-counts reset per segment
    seg = Nc[rr, pp] - isnew.astype(np.int64)
    row_new_start = np.concatenate(
        ([0], np.cumsum(new.sum(axis=1))))[:-1]
    z_reset = np.where(seg > 0,
                       Z[wr, wp][row_new_start[rr] + seg - 1]
                       if len(wr) else 0, 0)
    z_p = Z[rr, pp] - z_reset  # zeros since segment start (p nonzero)
    m = np.where(z_p > 15, (z_p - 16) // 16 + 1, 0)  # ZRLs needed so far
    same_seg = np.zeros(len(rr), dtype=bool)
    if len(rr) > 1:
        same_seg[1:] = (rr[1:] == rr[:-1]) & (seg[1:] == seg[:-1])
    m_prev = np.where(same_seg, np.concatenate(([0], m[:-1])), 0)
    zrl_cnt = m - m_prev

    key = img_of_row[rr]
    base = blk_of_row[rr] * _SUBB + _INBLK + pp * 1024
    # new-significant symbols: (r<<4|1) code fused with the sign bit
    ni = np.nonzero(isnew)[0]
    if len(ni):
        r_fin = z_p[ni] - 16 * m[ni]
        sym = (r_fin << 4) | 1
        sign = (flat[rr[ni], pp[ni]] > 0).astype(np.int64)
        recs.emit(key[ni], base[ni] + 512,
                  (ac_code[sym] << 1) | sign, ac_len[sym] + 1,
                  np.zeros(len(ni), np.int64), np.zeros(len(ni), np.int64))
    # ZRL groups: first at sub 0, extras at 64+j (corr bits sit at 1..63)
    zm = zrl_cnt > 0
    if zm.any():
        reps = zrl_cnt[zm]
        tot = int(reps.sum())
        j = np.arange(tot, dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        sub = np.where(j == 0, 0, 63 + j)
        zsym = np.full(tot, 0xF0, dtype=np.int64)
        recs.emit(np.repeat(key[zm], reps), np.repeat(base[zm], reps) + sub,
                  ac_code[zsym], ac_len[zsym],
                  np.zeros(tot, np.int64), np.zeros(tot, np.int64))
    # history correction bits -> first flush unit STRICTLY after them
    ev_mask = zm | isnew
    hi = np.nonzero(~isnew)[0]  # in-block hist records
    if len(hi):
        Wp = W + 1
        ev_keys = rr[ev_mask] * Wp + pp[ev_mask]
        h_keys = rr[hi] * Wp + pp[hi]
        idx = np.searchsorted(ev_keys, h_keys, side="right")
        # the terminating new of each segment guarantees a next event
        ev_rec = np.nonzero(ev_mask)[0][idx]
        ev_has_zrl = zm[ev_rec]
        rank = _group_ranks(ev_rec)
        sub = np.where(ev_has_zrl, 1, 513) + rank
        recs.emit(key[hi],
                  blk_of_row[rr[ev_rec]] * _SUBB + _INBLK
                  + pp[ev_rec] * 1024 + sub,
                  (a[rr[hi], pp[hi]] & 1).astype(np.int64),
                  np.ones(len(hi), np.int64),
                  np.zeros(len(hi), np.int64),
                  np.zeros(len(hi), np.int64))

    # ---------- EOB runs + their correction bits
    emit2 = emit_rows.reshape(n, nb)
    trail = ((last_new < W - 1) & emit_rows).reshape(n, nb)
    _prog_eob_flushes(recs, emit2, trail, ac_code, ac_len)
    # source bits: hist past last_new (emit rows) + all hist of
    # non-emit rows, ordered (img, block, pos)
    src_mask = hist & (np.arange(W)[None, :] > last_new[:, None])
    sr, sp = np.nonzero(src_mask)
    if len(sr):
        s_img = img_of_row[sr]
        s_blk = blk_of_row[sr]
        ei, eb2 = np.nonzero(emit2)
        nbp = nb + 2
        ekeys = ei * nbp + eb2
        skeys = s_img * nbp + s_blk
        idx = np.searchsorted(ekeys, skeys, side="right")
        in_img = (idx < len(ekeys)) & (ei[np.minimum(idx, len(ei) - 1)]
                                       == s_img)
        flush_eb = np.where(in_img, eb2[np.minimum(idx, len(ei) - 1)], nb)
        rank = _group_ranks(s_img * np.int64(nb + 1) + flush_eb)
        recs.emit(s_img, flush_eb * _SUBB + 1 + rank,
                  (a[sr, sp] & 1).astype(np.int64),
                  np.ones(len(sr), np.int64),
                  np.zeros(len(sr), np.int64),
                  np.zeros(len(sr), np.int64))


def encode_jpeg_progressive_batch(imgs: np.ndarray, quality: int = 98,
                                  subsample: bool = False) -> list[bytes]:
    """(n, h, w, 3) uint8 RGB (or (n, h, w) grey) -> n progressive
    (SOF2) JFIF byte strings — the batch twin of
    :func:`encode_jpeg_progressive`, byte-identical per image (tested).
    Every scan builds its records for all images at once and packs with
    one lexsort + bit scatter; no per-coefficient Python."""
    imgs = np.asarray(imgs)
    grey = imgs.ndim == 3
    n_img, h, w = imgs.shape[:3]
    if n_img == 0:
        return []
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    dc_tab, ac_tab = _flat_dc_table(), _prog_ac_table()
    dc_code = np.zeros(16, np.int64)
    dc_len = np.zeros(16, np.int64)
    for s, (c, ln) in dc_tab.items():
        dc_code[s], dc_len[s] = c, ln
    ac_code = np.zeros(256, np.int64)
    ac_len = np.zeros(256, np.int64)
    for s, (c, ln) in ac_tab.items():
        ac_code[s], ac_len[s] = c, ln

    # identical component prep to encode_jpeg_batch
    if grey:
        planes = [imgs.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(imgs)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, 0), (0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, 0), (0, ph), (0, pw)), mode="edge")
            hh, ww = cb.shape[1:]
            cb = cb.reshape(n_img, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            cr = cr.reshape(n_img, hh // 2, 2, ww // 2, 2).mean(axis=(2, 4))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coeffs = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        ph, pw = -plane.shape[1] % 8, -plane.shape[2] % 8
        if ph or pw:
            plane = np.pad(plane, ((0, 0), (0, ph), (0, pw)), mode="edge")
        nn, hh, ww = plane.shape
        bl = (plane - 128.0).reshape(nn, hh // 8, 8, ww // 8, 8) \
            .transpose(0, 1, 3, 2, 4)
        nby, nbx = bl.shape[1:3]
        need_y, need_x = mcuy * vi, mcux * hi
        if nby < need_y or nbx < need_x:
            bl = np.pad(bl, ((0, 0), (0, need_y - nby),
                             (0, need_x - nbx), (0, 0), (0, 0)),
                        mode="edge")
            nby, nbx = need_y, need_x
        qt = qt_l if ci == 0 else qt_c
        coeffs.append(_fdct_quant(bl.reshape(-1, 8, 8), qt)
                      .reshape(n_img, nby, nbx, 64).astype(np.int64))

    ncomp = len(planes)
    comps = [dict(cid=ci + 1, h=samp[ci][0], v=samp[ci][1],
                  tq=0 if ci == 0 else 1) for ci in range(ncomp)]
    frame = dict(h=h, w=w, comps=comps)
    if max(np.prod(_true_block_dims(frame, c)) for c in comps) > 32766:
        # EOB runs would hit the 0x7FFF forced mid-run flush the
        # builders don't model — frames this large take the scalar path
        return [encode_jpeg_progressive(im, quality=quality,
                                        subsample=subsample)
                for im in imgs]

    def band_of(ci, ss, se, al):
        nby, nbx = _true_block_dims(frame, comps[ci])
        v = coeffs[ci][:, :nby, :nbx].reshape(n_img, nby * nbx, 64) \
            [:, :, ss:se + 1]
        return np.where(v < 0, -((-v) >> al), v >> al)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return seg(0xFFDA, body + bytes([ss, se, (ah << 4) | al]))

    head = bytearray(b"\xff\xd8")
    head += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    head += seg(0xFFDB, b"\x00" + bytes(qt_l.reshape(64)[ZIGZAG]
                                        .astype(np.uint8)))
    if not grey:
        head += seg(0xFFDB, b"\x01" + bytes(qt_c.reshape(64)[ZIGZAG]
                                            .astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in comps:
        sof += bytes([c["cid"], (c["h"] << 4) | c["v"], c["tq"]])
    head += seg(0xFFC2, sof)
    head += seg(0xFFC4, _dht_payload(dc_tab, 0, 0))
    head += seg(0xFFC4, _dht_payload(ac_tab, 1, 0))

    all_ids = [c["cid"] for c in comps]
    # the SAME scan script as the scalar encoder
    script: list[tuple[bytes, list[bytes]]] = []

    def run_dc(ah, al):
        recs = _prog_dc_scan_recs(coeffs, comps, mcux, mcuy, ah, al,
                                  dc_code, dc_len)
        script.append((sos(all_ids, 0, 0, ah, al), recs.pack(n_img)))

    def run_ac(ci, ss, se, ah, al):
        recs = _Recs()
        if ah == 0:
            _prog_ac_first_recs(recs, band_of(ci, ss, se, al),
                                ac_code, ac_len)
        else:
            _prog_ac_refine_recs(recs, band_of(ci, ss, se, al),
                                 ac_code, ac_len)
        script.append((sos([comps[ci]["cid"]], ss, se, ah, al),
                       recs.pack(n_img)))

    run_dc(0, 1)
    run_ac(0, 1, 5, 0, 2)
    run_ac(0, 6, 63, 0, 2)
    for ci in range(1, ncomp):
        run_ac(ci, 1, 63, 0, 1)
    run_ac(0, 1, 63, 2, 1)
    run_dc(1, 0)
    for ci in range(ncomp):
        run_ac(ci, 1, 63, 1, 0)

    head = bytes(head)
    out = []
    for i in range(n_img):
        parts = [head]
        for sos_b, segs in script:
            parts.append(sos_b)
            parts.append(segs[i])
        parts.append(b"\xff\xd9")
        out.append(b"".join(parts))
    return out
