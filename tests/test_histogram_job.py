"""HistogramJob analog vs DuckDB oracles.

Reference: ``geomesa-jobs/.../analytics/HistogramJob.scala:33-107`` —
attribute histogram with group-by, unique-by (count-distinct semantics)
and regex value filtering; ``safeString`` stringification (null/empty ->
"null", ``:128-136``). Every case below is hash-compared (sorted rows)
against the equivalent SQL run by DuckDB on the same parquet.
"""

import os

import duckdb
import pytest

from tests.conftest import SF_TINY

from geomesa_ray.pipelines.aggregates import histogram_job


def _rows(ds):
    cols = sorted(ds.schema().names)
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def _sql(fdir, q):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(fdir, 'events.parquet')}')")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(fdir, 'documents.parquet')}')")
    res = con.execute(q)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(tuple(r[i] for i in order) for r in res.fetchall())


SAFE = "COALESCE(NULLIF(CAST({c} AS VARCHAR), ''), 'null')"


class TestHistogramJob:
    def test_plain_histogram(self, ray_session):
        got = _rows(histogram_job(SF_TINY, "events", "event_type"))
        want = _sql(SF_TINY, f"""
            SELECT {SAFE.format(c='event_type')} AS event_type,
                   count(*) AS cnt
            FROM events GROUP BY 1""")
        assert got == want and len(got) > 1

    def test_group_by(self, ray_session):
        got = _rows(histogram_job(SF_TINY, "documents", "lang",
                                  group_by=["source"]))
        want = _sql(SF_TINY, f"""
            SELECT {SAFE.format(c='source')} AS source,
                   {SAFE.format(c='lang')} AS lang, count(*) AS cnt
            FROM documents GROUP BY 1, 2""")
        assert got == want and len(got) > 1

    def test_unique_by_is_count_distinct(self, ray_session):
        got = _rows(histogram_job(SF_TINY, "events", "event_type",
                                  unique_by=["user_id"]))
        want = _sql(SF_TINY, f"""
            SELECT {SAFE.format(c='event_type')} AS event_type,
                   count(DISTINCT {SAFE.format(c='user_id')}) AS cnt
            FROM events GROUP BY 1""")
        assert got == want

    def test_group_and_unique_by(self, ray_session):
        got = _rows(histogram_job(SF_TINY, "documents", "lang",
                                  group_by=["source"],
                                  unique_by=["n_chars"]))
        want = _sql(SF_TINY, f"""
            SELECT {SAFE.format(c='source')} AS source,
                   {SAFE.format(c='lang')} AS lang,
                   count(DISTINCT {SAFE.format(c='n_chars')}) AS cnt
            FROM documents GROUP BY 1, 2""")
        assert got == want

    def test_value_regex_filter(self, ray_session):
        got = _rows(histogram_job(SF_TINY, "events", "event_type",
                                  value_regex="^c"))
        want = _sql(SF_TINY, f"""
            SELECT event_type, count(*) AS cnt FROM (
                SELECT {SAFE.format(c='event_type')} AS event_type
                FROM events)
            WHERE regexp_matches(event_type, '^c') GROUP BY 1""")
        assert got == want and len(got) >= 1

    def test_too_many_attributes_raises(self, ray_session):
        with pytest.raises(ValueError, match="more than 8"):
            histogram_job(SF_TINY, "events", "event_type",
                          group_by=["a"] * 5, unique_by=["b"] * 4)

    def test_integer_attribute_stringified(self, ray_session):
        """safeString turns non-string attributes into their string
        form — the histogram keys on 'user_id' strings."""
        got = _rows(histogram_job(SF_TINY, "events", "user_id",
                                  value_regex="^10"))
        want = _sql(SF_TINY, f"""
            SELECT user_id, count(*) AS cnt FROM (
                SELECT {SAFE.format(c='user_id')} AS user_id FROM events)
            WHERE regexp_matches(user_id, '^10') GROUP BY 1""")
        assert got == want and len(got) >= 1
