"""VARIANT (semi-structured) path: drift absorption semantics and plan
shape. Value correctness is pinned by the oracle gate
(variant_extract / variant_shred / schema_drift_audit); these tests pin
the BEHAVIOR the open-schema design promises."""

from __future__ import annotations

from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.queries.semistructured import (
    q_schema_drift_audit,
    q_variant_shred,
    variant_docs,
)


def test_try_variant_get_absorbs_type_drift(spark):
    """A path whose type drifts row-to-row must read as NULL where the
    requested type doesn't apply — never fail the scan."""
    df = spark.createDataFrame(
        [('{"score":3}',), ('{"score":"high"}',), ('{}',)], "j string"
    ).select(F.parse_json("j").alias("v"))
    got = [r["s"] for r in df.select(
        F.try_variant_get("v", "$.score", "long").alias("s")).collect()]
    assert got == [3, None, None]


def test_variant_survives_unknown_fields(spark):
    """Fields never declared anywhere still round-trip through VARIANT
    (the no-reprocess-on-drift property)."""
    df = spark.createDataFrame(
        [('{"a":1,"surprise":{"deep":[1,2,{"x":"y"}]}}',)], "j string"
    ).select(F.parse_json("j").alias("v"))
    assert df.select(
        F.variant_get("v", "$.surprise.deep[2].x", "string").alias("x")
    ).collect()[0]["x"] == "y"


def test_drift_audit_sees_both_shapes(spark, sf_dir):
    rows = q_schema_drift_audit(spark, sf_dir).collect()
    # the synthesized corpus deliberately contains meta/no-meta and
    # numeric/string score shapes — the audit must surface several cells
    assert len(rows) >= 3
    assert sum(r["n_docs"] for r in rows) > 0
    assert {r["has_meta"] for r in rows} == {True, False}
    assert {r["score_is_number"] for r in rows} == {True, False}


def test_shred_explode_is_mapside(spark, sf_dir):
    """The lateral variant_explode must be a Generate over the scan; the
    shuffles are the rollup's distinct-count pair (dedup exchange + final
    agg exchange — Spark's standard count-distinct expansion, both fed by
    map-side partial aggregates) + 1 range for the sort."""
    plan = q_variant_shred(spark, sf_dir) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    assert plan.count("Exchange hashpartitioning") <= 2
