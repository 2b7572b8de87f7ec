"""Dataset readers/writers.

The north-star storage format is Lance (``ray.data.read_lance``); this
sandbox has no ``lance`` package, so readers fall back to Parquet with an
import-gate — the pipeline code is identical either way (both yield Arrow
blocks). Column pruning is always pushed into the read
(``columns=[...]``) so a 2-column transform never ships image payloads.
"""

from __future__ import annotations

import os

import ray.data

try:  # pragma: no cover - lance not available in this sandbox
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_images(fixture_dir: str, columns: list[str] | None = None,
                **kwargs) -> ray.data.Dataset:
    """Read the image+caption table, pruning to ``columns`` at the scan."""
    lance_path = os.path.join(fixture_dir, "images.lance")
    if HAVE_LANCE and os.path.exists(lance_path):
        return ray.data.read_lance(lance_path, columns=columns, **kwargs)
    return ray.data.read_parquet(
        os.path.join(fixture_dir, "images.parquet"), columns=columns, **kwargs
    )


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one of the driver's parquet tables (lineitem, orders, ...)."""
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs
    )
