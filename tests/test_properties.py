"""Property-based tests (hypothesis): Spark Column implementations vs
pure-Python reference semantics on arbitrary inputs.

Each example runs one small Spark job, so example counts are modest; the
value is edge coverage (empty strings, repeated markers, adjacent
timestamps) that fixture tests miss.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.functions.text import (
    BPE_ISH_PATTERN,
    bpe_ish_token_count,
    clean_text,
)
from social_media_sentiment_analysis_spark.operators.temporal import as_of_join

# printable ASCII (no exotic unicode whitespace: Java \s and str.strip()
# disagree outside ASCII — documented engine behavior is ASCII whitespace)
ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=80)

SETTINGS = dict(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


def clean_reference(t: str | None) -> str:
    """The reference's clean_text (twitter_streamer.py:86-96) verbatim."""
    if not t:
        return ""
    t = t.replace("RT @", "")
    t = re.sub(r"\s+", " ", t)
    return t.strip()


@pytest.mark.slow
@given(st.lists(ASCII_TEXT | st.none(), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_clean_text_matches_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.c for r in df.select(clean_text(F.col("t")).alias("c")).collect()]
    assert got == [clean_reference(t) for t in texts]


@pytest.mark.slow
@given(st.lists(ASCII_TEXT, min_size=1, max_size=20))
@settings(**SETTINGS)
def test_bpe_count_matches_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r.n for r in df.select(
        bpe_ish_token_count(F.col("t")).alias("n")).collect()]
    assert got == [len(re.findall(BPE_ISH_PATTERN, t)) for t in texts]


def asof_reference(left, right):
    """Naive per-row as-of: latest right (k, rt) with rt <= t."""
    out = []
    for k, t in left:
        best = None
        for rk, rt, rv in right:
            if rk == k and rt <= t and (best is None or rt > best[0]):
                best = (rt, rv)
        out.append((k, t, best[1] if best else None))
    return sorted(out)


@pytest.mark.slow
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
             min_size=1, max_size=15, unique=True),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
             min_size=0, max_size=15, unique=True),
)
@settings(**SETTINGS)
def test_asof_join_matches_reference(spark, left_rows, right_rows):
    right_vals = [(k, t, f"v{k}_{t}") for k, t in right_rows]  # unique (k,t)
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k long, t long")
    right = spark.createDataFrame(
        right_vals or [(None, None, None)], "k long, rt long, rv string"
    ).filter(F.col("k").isNotNull())
    got = sorted(
        (r.k, r.t, r.rv)
        for r in as_of_join(left, right, "k", "t", "rt").collect())
    assert got == asof_reference(left_rows, right_vals)


def _interval_reference(points, intervals):
    out = []
    for pid, (pk, pt) in enumerate(points):
        for iid, (ik, s, ln) in enumerate(intervals):
            if pk == ik and s <= pt <= s + ln:
                out.append((pid, iid))
    return sorted(out)


@pytest.mark.slow
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)),
             min_size=1, max_size=12),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000),
                       st.integers(0, 900)),
             min_size=1, max_size=8),
    st.sampled_from([60, 301, 3600]),
)
@settings(**SETTINGS)
def test_interval_join_matches_reference(spark, points, intervals, width):
    from social_media_sentiment_analysis_spark.operators.temporal import (
        interval_join,
    )

    mk_ts = "timestampadd(SECOND, {c}, TIMESTAMP_NTZ '2024-01-01')"
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(points)],
        "pid long, k long, t long",
    ).select("pid", "k", F.expr(mk_ts.format(c="t")).alias("pts"))
    right = spark.createDataFrame(
        [(i, k, s, s + ln) for i, (k, s, ln) in enumerate(intervals)],
        "iid long, k long, s long, e long",
    ).select("iid", "k",
             F.expr(mk_ts.format(c="s")).alias("istart"),
             F.expr(mk_ts.format(c="e")).alias("iend"))
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            left, right, left_ts="pts", right_start="istart",
            right_end="iend", keys=("k",), bucket_seconds=width)
        .select("pid", "iid").collect())
    assert got == _interval_reference(points, intervals)


def asof_forward_reference(left, right):
    """Naive per-row forward as-of: earliest right (k, rt) with rt >= t."""
    out = []
    for k, t in left:
        best = None
        for rk, rt, rv in right:
            if rk == k and rt >= t and (best is None or rt < best[0]):
                best = (rt, rv)
        out.append((k, t, best[1] if best else None))
    return sorted(out)


@pytest.mark.slow
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
             min_size=1, max_size=15, unique=True),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
             min_size=0, max_size=15, unique=True),
)
@settings(**SETTINGS)
def test_asof_forward_matches_reference(spark, left_rows, right_rows):
    right_vals = [(k, t, f"v{k}_{t}") for k, t in right_rows]
    left = spark.createDataFrame(
        [(k, t) for k, t in left_rows], "k long, t long")
    right = spark.createDataFrame(
        right_vals or [(None, None, None)], "k long, rt long, rv string"
    ).filter(F.col("k").isNotNull())
    got = sorted(
        (r.k, r.t, r.rv)
        for r in as_of_join(left, right, "k", "t", "rt",
                            direction="forward").collect())
    assert got == asof_forward_reference(left_rows, right_vals)


@pytest.mark.slow
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # day offset
            st.sampled_from(["click", "view"]),          # type
            st.floats(min_value=-100, max_value=100,
                      allow_nan=False, allow_infinity=False),
        ),
        min_size=1, max_size=24),
    st.integers(min_value=0, max_value=23),              # split point
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_rollup_equals_full_recompute(spark, tmp_path_factory,
                                                  rows, split):
    """refresh(refresh(∅, A), B) ≡ rollup(A ∪ B) for arbitrary event
    splits — the mergeable-state contract of operators/incremental.py."""
    import datetime

    from social_media_sentiment_analysis_spark.operators.incremental import (
        daily_rollup_state, refresh_daily_rollup,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    data = [(base + datetime.timedelta(days=d, minutes=i), t, v)
            for i, (d, t, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "ts timestamp_ntz, event_type string, value double")
    split = min(split, len(data))
    a, b = data[:split], data[split:]
    path = str(tmp_path_factory.mktemp("roll") / "state")
    for part in (a, b):
        if part:
            refresh_daily_rollup(
                spark, path,
                spark.createDataFrame(
                    part, "ts timestamp_ntz, event_type string, value double"))

    def snap(sdf):
        return {(str(r.day), r.event_type):
                (r.n_events, round(r.sum_value, 6),
                 round(r.min_value, 6), round(r.max_value, 6))
                for r in sdf.collect()}

    assert snap(spark.read.parquet(path)) == snap(daily_rollup_state(df))


WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta"])
DOC = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


def naive_duplicated_spans(texts: dict[int, str], k: int):
    """Pure-Python reference for duplicated_spans: positions of k-shingles
    occurring in >=2 distinct docs, merged into maximal consecutive runs."""
    from collections import defaultdict

    toks = {i: [t for t in re.split("[^a-z]+", s.lower()) if t]
            for i, s in texts.items()}
    shingles = {i: [" ".join(ts[p:p + k]) for p in range(len(ts) - k + 1)]
                for i, ts in toks.items() if len(ts) >= k}
    docs_of = defaultdict(set)
    for i, shs in shingles.items():
        for s in shs:
            docs_of[s].add(i)
    out = set()
    for i, shs in shingles.items():
        dup = [p for p, s in enumerate(shs) if len(docs_of[s]) >= 2]
        run_start = None
        prev = None
        for p in dup + [None]:
            if p is not None and prev is not None and p == prev + 1:
                prev = p
                continue
            if prev is not None:
                out.add((i, run_start + 1, prev + 1, prev - run_start + k))
            run_start, prev = p, p
        # (loop flushes the final run via the None sentinel)
    return out


@given(docs=st.lists(DOC, min_size=2, max_size=6))
@settings(**SETTINGS)
def test_duplicated_spans_match_reference(spark, docs):
    from social_media_sentiment_analysis_spark.queries.selection import (
        duplicated_spans,
    )

    texts = {i: d for i, d in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, d) for i, d in texts.items()], "doc_id long, text string")
    got = {(r.doc_id, r.start_pos, r.end_pos, r.span_tokens)
           for r in duplicated_spans(df, "text", "doc_id", k=3).collect()}
    assert got == naive_duplicated_spans(texts, 3)


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20))
@settings(**SETTINGS)
def test_round_half_up_matches_duckdb_bitwise(spark, duck, vals):
    """functions/rounding.py: the floor-based rounding must produce the
    IDENTICAL double on Spark and DuckDB for arbitrary inputs — including
    the …5-boundary doubles where the engines' native round() disagree."""
    import duckdb as _duckdb  # noqa: F401

    from social_media_sentiment_analysis_spark.functions.rounding import (
        round_half_up, sql_round_half_up,
    )

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i long, v double")
    got = {r.i: r.r for r in
           df.select("i", round_half_up(F.col("v"), 4).alias("r")).collect()}
    expr = sql_round_half_up("v", 4)
    want = {i: r for i, r in duck.execute(
        "SELECT i, " + expr + " AS r FROM (SELECT "
        "unnest(range(1,  " + str(len(vals) + 1) + ")) - 1 AS i, "
        "unnest(?) AS v)", [vals]).fetchall()}
    assert got == want  # bitwise-equal doubles, no tolerance


def test_native_round_divergence_is_real(spark, duck):
    """The motivating case: a double a few ulps under .00005 rounds DOWN
    under Spark's exact-decimal HALF_UP and UP under DuckDB's numeric
    round — while the shared floor idiom agrees with itself."""
    from social_media_sentiment_analysis_spark.functions.rounding import (
        round_half_up, sql_round_half_up,
    )

    v = 0.59825  # stored double is 0.59824999999999994849…
    spark_native = spark.createDataFrame([(v,)], "v double").select(
        F.round("v", 4).alias("r")).first().r
    duck_native = duck.execute("SELECT round(?, 4)", [v]).fetchone()[0]
    assert spark_native != duck_native  # the documented divergence
    spark_floor = spark.createDataFrame([(v,)], "v double").select(
        round_half_up(F.col("v"), 4).alias("r")).first().r
    duck_floor = duck.execute(
        "SELECT " + sql_round_half_up("?", 4), [v]).fetchone()[0]
    assert spark_floor == duck_floor


def naive_winnowing(texts: dict[int, str], k: int, w: int):
    """Pure-Python winnowing reference: md5-hex k-gram hashes, min per
    w-window (full windows only), fingerprint set = distinct minima."""
    import hashlib

    out = {}
    for i, s in texts.items():
        ts = [t for t in re.split("[^a-z]+", s.lower()) if t]
        hs = [hashlib.md5(" ".join(ts[p:p + k]).encode()).hexdigest()
              for p in range(len(ts) - k + 1)]
        fps = {min(hs[p - w + 1:p + 1]) for p in range(w - 1, len(hs))}
        if fps:
            out[i] = fps
    return out


@given(docs=st.lists(DOC, min_size=1, max_size=5))
@settings(**SETTINGS)
def test_winnowing_fingerprints_match_reference(spark, docs):
    from social_media_sentiment_analysis_spark.queries.selection import (
        winnowing_window_minima,
    )

    texts = {i: d for i, d in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, d) for i, d in texts.items()], "doc_id long, text string")
    rows = (winnowing_window_minima(df, "text", "doc_id", k=2, w=3)
            .select("doc_id", "fp").distinct().collect())
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.fp)
    assert got == naive_winnowing(texts, 2, 3)


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's correctness property: two documents sharing a substring
    of >= w + k - 1 tokens MUST share at least one selected fingerprint."""
    from social_media_sentiment_analysis_spark.queries.selection import (
        winnowing_window_minima,
    )

    k, w = 3, 4
    shared = "one two three four five six"          # 6 tokens = w + k - 1
    texts = {
        0: "left filler junk " + shared + " trailing bits here",
        1: "totally different prefix words " + shared,
    }
    df = spark.createDataFrame(
        [(i, d) for i, d in texts.items()], "doc_id long, text string")
    rows = (winnowing_window_minima(df, "text", "doc_id", k=k, w=w)
            .select("doc_id", "fp").distinct().collect())
    fps: dict[int, set] = {0: set(), 1: set()}
    for r in rows:
        fps[r.doc_id].add(r.fp)
    assert fps[0] & fps[1], "shared w+k-1-token substring must collide"


@pytest.mark.slow
@given(st.lists(ASCII_TEXT, min_size=1, max_size=12),
       st.integers(min_value=1, max_value=9))
@settings(**SETTINGS)
def test_chunk_rows_partitions_the_token_stream(spark, texts, k):
    """chunk_rows is a PARTITION of each doc's token stream: chunks
    concatenated in chunk_id order reproduce the tokenized doc exactly;
    every chunk but the last has exactly k tokens, the last has 1..k —
    the invariant both the batch rewrite and the streaming sink rely on
    for their first-occurrence policies to be well-defined."""
    from social_media_sentiment_analysis_spark.operators.dedup import (
        chunk_rows,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, t string")
    rows = chunk_rows(df, "t", "doc_id", k).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rs] == list(range(len(rs)))
        rebuilt = " ".join(r.txt for r in rs).split(" ")
        # every chunk's token count is k except a ragged last
        for r in rs[:-1]:
            assert r.n_toks == k
        assert 1 <= rs[-1].n_toks <= k
        assert sum(r.n_toks for r in rs) == len(rebuilt)
