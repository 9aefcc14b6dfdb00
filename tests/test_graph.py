"""Connected components: star-contraction vs a union-find reference."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from social_media_sentiment_analysis_spark.operators.graph import connected_components


def union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node of the component
    by_root: dict[int, int] = {}
    for n in parent:
        r = find(n)
        by_root[r] = min(by_root.get(r, n), n)
    return {n: by_root[find(n)] for n in parent}


def spark_labels(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges or [(0, 0)], "a_id long, b_id long")
    if not edges:
        df = df.limit(0)
    out = connected_components(df, "a_id", "b_id").collect()
    return {r["node"]: r["component"] for r in out}


def test_two_components_and_chain(spark):
    # chain 1-2-3-4 plus triangle 10-11-12 plus an isolated pair
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = spark_labels(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges_logarithmically(spark):
    # O(diameter) label flooding would need 63 rounds here; star
    # contraction must finish well inside the 25-round cap.
    edges = [(i, i + 1) for i in range(64)]
    got = spark_labels(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = spark_labels(spark, edges)
    assert got == {1: 1, 2: 1}


def test_empty_edges(spark):
    assert spark_labels(spark, []) == {}


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1, max_size=40))
def test_matches_union_find(spark, edges):
    expect = union_find_labels([(u, v) for u, v in edges if u != v])
    assert spark_labels(spark, edges) == expect


class TestPageRank:
    def test_star_graph_center_dominates_and_mass_conserved(self, spark):
        from social_media_sentiment_analysis_spark.operators.graph import (
            pagerank,
        )
        # 5 leaves all pointing at node 0 (a sink: dangling node)
        edges = spark.createDataFrame(
            [(i, 0) for i in range(1, 6)], "src long, dst long")
        ranks = {r.node: r.rank for r in pagerank(edges, iterations=20).collect()}
        assert len(ranks) == 6
        assert abs(sum(ranks.values()) - 6.0) < 1e-6        # mass conserved
        assert ranks[0] == max(ranks.values())
        leaf = [v for k, v in ranks.items() if k != 0]
        assert max(leaf) - min(leaf) < 1e-9                 # symmetry

    def test_cycle_is_uniform(self, spark):
        from social_media_sentiment_analysis_spark.operators.graph import (
            pagerank,
        )
        edges = spark.createDataFrame(
            [(i, (i + 1) % 4) for i in range(4)], "src long, dst long")
        ranks = [r.rank for r in pagerank(edges, iterations=15).collect()]
        assert all(abs(r - 1.0) < 1e-9 for r in ranks)


class TestLabelPropagation:
    def test_two_cliques_weakly_joined_separate(self, spark):
        from social_media_sentiment_analysis_spark.operators.graph import (
            label_propagation,
        )

        # clique A: 0-4 complete; clique B: 10-14 complete; one bridge 4-10
        edges = []
        for grp in (range(0, 5), range(10, 15)):
            g = list(grp)
            edges += [(a, b) for i, a in enumerate(g) for b in g[i + 1:]]
        edges.append((4, 10))
        df = spark.createDataFrame(edges, "src long, dst long")
        labels = {r.node: r.label
                  for r in label_propagation(df, max_iter=5).collect()}
        a_labels = {labels[n] for n in range(0, 5)}
        b_labels = {labels[n] for n in range(10, 15)}
        assert len(a_labels) == 1 and len(b_labels) == 1
        assert a_labels != b_labels  # the bridge does not merge communities

    def test_deterministic_across_runs(self, spark):
        from social_media_sentiment_analysis_spark.operators.graph import (
            label_propagation,
        )

        edges = [(i, (i + 1) % 8) for i in range(8)] + [(0, 4), (2, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        one = sorted(map(tuple, label_propagation(df, max_iter=4).collect()))
        two = sorted(map(tuple, label_propagation(df, max_iter=4).collect()))
        assert one == two

    def test_string_node_ids_keep_valid_labels(self, spark):
        """The tie-break must not negate the LABEL (string → double cast →
        NULL/ANSI error): media near-dup ids like 'm12' are strings, and a
        clique of them must still resolve to one non-null label."""
        from social_media_sentiment_analysis_spark.operators.graph import (
            label_propagation,
        )

        clique = ["m1", "m2", "m3", "m4"]
        edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
        df = spark.createDataFrame(edges, "src string, dst string")
        labels = {r.node: r.label
                  for r in label_propagation(df, max_iter=5).collect()}
        assert None not in labels.values()
        assert {labels[n] for n in clique} == {"m1"}
