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


def default_num_blocks() -> int | None:
    """~1 read block per CPU. Ray's default fragments small inputs into
    hundreds of tiny blocks (147 for a 600k-row file), which multiplies
    task overhead and makes sort-shuffles ~6x slower; at real scale the
    analog is targeting the reference's 128 MB partition precedent
    (Z3Table.scala:163) per block."""
    import ray

    if not ray.is_initialized():
        return None
    return max(8, int(ray.cluster_resources().get("CPU", 8)))


def read_images(fixture_dir: str, columns: list[str] | None = None,
                **kwargs) -> ray.data.Dataset:
    """Read the image+caption table, pruning to ``columns`` at the scan."""
    kwargs.setdefault("override_num_blocks", default_num_blocks())
    lance_path = os.path.join(fixture_dir, "images.lance")
    if HAVE_LANCE and os.path.exists(lance_path):
        kwargs.pop("override_num_blocks", None)
        return ray.data.read_lance(lance_path, columns=columns, **kwargs)
    single = os.path.join(fixture_dir, "images.parquet")
    if os.path.exists(single):
        paths = single
    else:  # sharded corpus (images_NNNN.parquet)
        import glob

        paths = sorted(glob.glob(os.path.join(fixture_dir, "images_*.parquet")))
        if not paths:
            raise FileNotFoundError(f"no images parquet under {fixture_dir}")
        # many files: let one block per file stand (better than coalescing)
        if len(paths) >= (kwargs.get("override_num_blocks") or 0):
            kwargs.pop("override_num_blocks", None)
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               **kwargs) -> ray.data.Dataset:
    """Read one of the driver's parquet tables (lineitem, orders, ...)."""
    kwargs.setdefault("override_num_blocks", default_num_blocks())
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, **kwargs
    )
