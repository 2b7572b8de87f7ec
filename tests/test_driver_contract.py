"""Mirror of the driver's correctness gate: run each queries() entry and
its oracle_sql() side-by-side (at tiny scale for speed) and require
row-count + schema + value equality after name-sorted columns / row sort.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def oracles():
    return entrymod.oracle_sql(SF)


@pytest.fixture(scope="module")
def qmap():
    return entrymod.queries()


def compare(name, qmap, oracles, con, ray_session):
    got = canon(to_pandas(qmap[name](SF)))
    want = canon(con.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}")
    assert len(got) == len(want), f"{name}: {len(got)} rows vs {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.array_equal(g.astype(np.float64), w.astype(np.float64)), \
                f"{name}.{c}: float values differ"
        else:
            assert (pd.Series(g).astype(str) == pd.Series(w).astype(str)).all(), \
                f"{name}.{c}: values differ"


ORACLE_QUERIES = sorted(entrymod.oracle_sql(SF))
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLE_QUERIES))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, qmap, oracles, con, ray_session):
    assert name in qmap, f"queries() missing {name}"
    assert name in oracles, f"oracle_sql() missing {name}"
    compare(name, qmap, oracles, con, ray_session)


def test_every_oracle_has_query(qmap, oracles):
    assert set(oracles).issubset(set(qmap))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, qmap, ray_session):
    df = to_pandas(qmap[name](SF))
    assert len(df) > 0, f"{name} returned no rows"


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = to_pandas(ds)
    assert len(df) >= 0
    assert "image_id" in df.columns and "region_id" in df.columns
