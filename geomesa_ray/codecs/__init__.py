"""Pure-NumPy image codecs (no PIL/libjpeg in this sandbox).

The corpus schema carries images as opaque ``bytes`` + ``fmt`` metadata
(input_hint: ``(image_id, bytes, w, h, fmt, caption, phash)``); the
reference's raster stack decodes chunks through ImageIO
(``geomesa-raster/src/main/scala/.../data/Raster.scala:21-60``,
``RasterUtils.scala`` ``imageToBytes``/``bytesToImage``). This package
re-implements the two formats that matter for the payload invariants
from their public specifications:

- :mod:`geomesa_ray.codecs.png` — lossless (RFC 2083 / ISO 15948):
  round-trip is pixel-IDENTICAL (PSNR = inf).
- :mod:`geomesa_ray.codecs.jpeg` — baseline lossy (ITU-T T.81 Annex F,
  JFIF): round-trip satisfies the north-star ``PSNR >= 40 dB`` bound at
  the default quality.
- :mod:`geomesa_ray.codecs.bmp` — trivial uncompressed Windows BI_RGB.

``decode(buf, fmt)`` / ``encode(arr, fmt)`` dispatch by format name and
are what the image stages (``stages/image_ops.py``) call for
``fmt != "raw"`` rows. Formats beyond these still raise
``NotImplementedError`` (honest environment gate).
"""

from __future__ import annotations

import numpy as np

SUPPORTED = ("png", "jpeg", "jpg", "jpeg_progressive", "bmp")


def decode(buf: bytes, fmt: str) -> np.ndarray:
    """``bytes`` payload -> (h, w, 3) uint8 RGB array."""
    f = fmt.lower()
    if f == "png":
        from geomesa_ray.codecs.png import decode_png

        arr = decode_png(buf)
    elif f in ("jpeg", "jpg"):
        from geomesa_ray.codecs.jpeg import decode_jpeg

        arr = decode_jpeg(buf)
    elif f == "bmp":
        from geomesa_ray.codecs.bmp import decode_bmp

        arr = decode_bmp(buf)
    else:
        raise NotImplementedError(
            f"decode of fmt={fmt!r} not implemented (supported here: "
            f"{SUPPORTED} + 'raw'); swap in PIL/turbojpeg for others")
    if arr.ndim == 2:  # grayscale -> RGB for the uniform stage contract
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    elif arr.shape[2] == 4:  # drop alpha
        arr = np.ascontiguousarray(arr[:, :, :3])
    return arr


def encode(arr: np.ndarray, fmt: str, **kw) -> bytes:
    """(h, w, 3) uint8 RGB array -> ``bytes`` payload."""
    f = fmt.lower()
    if f == "png":
        from geomesa_ray.codecs.png import encode_png

        return encode_png(arr, **kw)
    if f in ("jpeg", "jpg"):
        from geomesa_ray.codecs.jpeg import encode_jpeg

        return encode_jpeg(arr, **kw)
    if f == "jpeg_progressive":
        from geomesa_ray.codecs.jpeg import encode_jpeg_progressive

        return encode_jpeg_progressive(arr, **kw)
    if f == "bmp":
        from geomesa_ray.codecs.bmp import encode_bmp

        return encode_bmp(arr)
    if f == "raw":
        return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()
    raise NotImplementedError(f"encode of fmt={fmt!r} not implemented")
