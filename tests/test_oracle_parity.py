"""Every oracle-checkable registry query must hash-match its DuckDB twin —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from social_media_sentiment_analysis_spark.queries.registry import QUERIES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.md5()
    for row in canon(df).itertuples(index=False):
        h.update(repr(tuple(row)).encode())
    return h.hexdigest()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = QUERIES[name]
    sdf = q.builder(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = duck.execute(q.oracle).df()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf)
