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
Progressive/arithmetic/12-bit modes and restart markers raise
``NotImplementedError`` (honest gate — baseline only).
"""

from __future__ import annotations

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


def _flat_dc_table():
    return _huff_canonical({s: 4 for s in range(12)})


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


# ---------------------------------------------------------------- bits


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int):
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    # hit a marker mid-read: only legal as trailing pad
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        out = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return out


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category bits, appended code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return (s, v if v >= 0 else v + (1 << s) - 1)


def _extend(r: int, s: int) -> int:
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


# ---------------------------------------------------------------- encode


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (nby, nbx, 8, 8) with edge replication."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """blocks (n, 8, 8) centered -> quantized int32 coeffs (n, 64) zigzag."""
    f = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)
    q = np.round(f / qt[None]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(wr: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    diff = int(zz[0]) - pred
    s, bits = _magnitude(diff)
    code, n = dc_tab[s]
    wr.write(code, n)
    if s:
        wr.write(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = ac_tab[0xF0]  # ZRL
            wr.write(code, n)
            run -= 16
        s, bits = _magnitude(v)
        code, n = ac_tab[(run << 4) | s]
        wr.write(code, n)
        wr.write(bits, s)
        run = 0
    if last < 63:
        code, n = ac_tab[0x00]  # EOB
        wr.write(code, n)
    return int(zz[0])


def encode_jpeg(arr: np.ndarray, quality: int = 98,
                subsample: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w) grey) -> baseline JFIF bytes.

    ``subsample=True`` emits 4:2:0 chroma (higher compression, lower
    chroma fidelity); default 4:4:4 keeps the PSNR>=40dB bound on
    arbitrary content.
    """
    arr = np.asarray(arr)
    grey = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        raise ValueError("image too large for JPEG")
    qt_l = _scaled_qt(QT_LUMA, quality)
    qt_c = _scaled_qt(QT_CHROMA, quality)
    dc_tab, ac_tab = _flat_dc_table(), _flat_ac_table()

    if grey:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = -h % 2, -w % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2) \
                .mean(axis=(1, 3))
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
        bl = _component_blocks(plane - 128.0)
        nby, nbx = bl.shape[:2]
        need_y, need_x = mcuy * vi, mcux * hi
        if nby < need_y or nbx < need_x:
            bl = np.pad(bl, ((0, need_y - nby), (0, need_x - nbx),
                             (0, 0), (0, 0)), mode="edge")
        qt = qt_l if ci == 0 else qt_c
        zz = _fdct_quant(bl.reshape(-1, 8, 8), qt) \
            .reshape(bl.shape[0], bl.shape[1], 64)
        comp_blocks.append(zz)

    wr = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(len(planes)):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        zz = comp_blocks[ci][my * vi + by, mx * hi + bx]
                        preds[ci] = _encode_block(
                            wr, zz, preds[ci],
                            dc_tab, ac_tab)
    wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qt_l.reshape(64)[ZIGZAG]
                                       .astype(np.uint8)))
    if not grey:
        out += seg(0xFFDB, b"\x01" + bytes(qt_c.reshape(64)[ZIGZAG]
                                           .astype(np.uint8)))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, hi << 4 | vi, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    out += seg(0xFFC4, _dht_payload(dc_tab, 0, 0))
    out += seg(0xFFC4, _dht_payload(ac_tab, 1, 0))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += wr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


class _HuffDecoder:
    """Canonical decode per T.81 F.2.2.3 (mincode/maxcode/valptr)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, rd: _BitReader) -> int:
        code = rd.read(1)
        ln = 1
        while code > self.maxcode[ln]:
            if ln >= 16:
                raise ValueError("invalid Huffman code in JPEG stream")
            code = (code << 1) | rd.read(1)
            ln += 1
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grey -> (h, w))."""
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
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
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(dict(cid=cid, h=hv >> 4, v=hv & 0xF, tq=tq))
            frame = dict(h=fh, w=fw, comps=comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
            if ri != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["cid"] == cs)
                scan.append((comp, dc_tabs[tt >> 4], ac_tabs[tt & 0xF]))
            return _decode_scan(buf, seg_end, frame, scan, qts)
        # APPn / COM skipped
    raise ValueError("no SOS in JPEG")


def _decode_scan(buf: bytes, pos: int, frame, scan, qts) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors > 2")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    rd = _BitReader(buf, pos)

    coeffs = []
    for comp, _, _ in scan:
        nby, nbx = mcuy * comp["v"], mcux * comp["h"]
        coeffs.append(np.zeros((nby, nbx, 64), dtype=np.int32))
    preds = [0] * len(scan)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (comp, dct, act) in enumerate(scan):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = coeffs[ci][my * comp["v"] + by,
                                        mx * comp["h"] + bx]
                        preds[ci] = _decode_block(rd, zz, preds[ci],
                                                  dct, act)

    planes = []
    for ci, (comp, _, _) in enumerate(scan):
        qt = qts[comp["tq"]]
        zz = coeffs[ci]
        nby, nbx = zz.shape[:2]
        nat = zz.reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8) \
            .astype(np.float64) * qt[None]
        px = np.einsum("xu,nuv,yv->nxy", _C.T, nat, _C.T, optimize=True)
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


def _decode_block(rd: _BitReader, zz: np.ndarray, pred: int,
                  dct: _HuffDecoder, act: _HuffDecoder) -> int:
    s = dct.decode(rd)
    diff = _extend(rd.read(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k <= 63:
        rs = act.decode(rd)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        zz[k] = _extend(rd.read(s), s)
        k += 1
    return dc


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(d * d))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
