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
    df = q.builder(spark, sf_dir)
    if q.oracle is not None:
        # serialization convention (the knn_ivf r7 lesson): gated outputs
        # must not carry nested types — Spark's pandas bridge yields
        # Python lists where DuckDB's yields numpy arrays, so the repr
        # value hash diverges even on identical values. Serialize arrays
        # to canonical strings (array_join / array_to_string) instead.
        nested = [f.name for f in df.schema.fields
                  if f.dataType.typeName() in ("array", "map", "struct")]
        assert not nested, (
            f"{name}: nested-typed output columns {nested} break the "
            "cross-engine value hash; emit a canonical string instead")
    sdf = df.toPandas()
    if q.oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = duck.execute(q.oracle).df()
    assert len(sdf) == len(odf), f"rowcount {len(sdf)} vs {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert value_hash(sdf) == value_hash(odf)
