#!/usr/bin/env python
"""Pre-flight: run the driver's correctness comparison locally.

Usage: python scripts/preflight.py [sf_dir]   (default /root/testdata/sf0.01)

For every oracle-checked queries() entry, runs the Ray pipeline and the
DuckDB oracle side-by-side and reports row-count/schema/value equality —
the same canonicalization the driver uses (name-sorted columns, row sort).
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    q = m.queries()
    o = m.oracle_sql(sf)
    failures = []
    for name in sorted(o):
        t0 = time.time()
        try:
            r = q[name](sf)
            got = canon(r.to_pandas() if hasattr(r, "to_pandas") else r)
            want = canon(con.execute(o[name]).df())
            ok = got.shape == want.shape and list(got.columns) == list(want.columns)
            if ok:
                for c in got.columns:
                    g, w = got[c].to_numpy(), want[c].to_numpy()
                    if g.dtype.kind == "f" or w.dtype.kind == "f":
                        ok = ok and np.array_equal(g.astype(np.float64),
                                                   w.astype(np.float64))
                    else:
                        ok = ok and (pd.Series(g).astype(str)
                                     == pd.Series(w).astype(str)).all()
            status = "OK" if ok else "MISMATCH"
        except Exception as e:  # noqa: BLE001 - report and continue
            status = f"ERROR {type(e).__name__}: {e}"[:80]
            ok = False
            got = []
        if not ok:
            failures.append(name)
        print(f"{name:24s} rows={len(got):8d} {status} {time.time() - t0:5.1f}s")
    rows_only = sorted(set(q) - set(o))
    for name in rows_only:
        t0 = time.time()
        try:
            r = q[name](sf)
            n = r.count() if hasattr(r, "count") and not isinstance(r, pd.DataFrame) \
                else len(r)
            print(f"{name:24s} rows={n:8d} rows-only {time.time() - t0:5.1f}s")
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} ERROR {type(e).__name__}: {e}"[:100])
    print("FAILURES:", failures if failures else "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
