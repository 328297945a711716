"""Replay the reference's full SQL corpus (sql/queries.sql) on the 250-row
movies fixture: Spark DataFrame builders vs a DuckDB oracle on identical
data (SURVEY §5.6). Order-insensitive comparison, float-tolerant."""

from __future__ import annotations

import duckdb
import pytest

from crawlspark.analytics import CORPUS
from crawlspark.movies import movies_df, movies_rows


@pytest.fixture(scope="module")
def movies(spark):
    return movies_df(spark).cache()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    import pandas as pd

    pdf = pd.DataFrame(movies_rows())
    con.register("movies_all", pdf)
    return con


def _norm(rows):
    out = []
    for r in rows:
        out.append(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(CORPUS.keys()))
def test_corpus_query_matches_duckdb(name, movies, duck):
    builder, oracle_sql = CORPUS[name]
    got = _norm([tuple(r) for r in builder(movies).collect()])
    want = _norm([tuple(r) for r in duck.execute(oracle_sql).fetchall()])
    assert got == want, f"{name}: spark={got[:3]} duck={want[:3]}"
