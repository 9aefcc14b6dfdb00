"""Dedup operator family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine — recall against the corpus's planted near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.functions.text import clean_text
from social_media_sentiment_analysis_spark.operators import dedup as dd
from social_media_sentiment_analysis_spark.queries.llmdata import (
    q_dedup_minhash,
    q_dedup_ngram_jaccard,
    q_dedup_simhash,
)
from social_media_sentiment_analysis_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def planted_pairs(spark, sf_dir):
    """Ground truth: pairs found by exact (oracle-checked) n-gram Jaccard."""
    return {
        (r["a_id"], r["b_id"])
        for r in q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }


class TestExactDedup:
    def test_collapses_identical_content(self, spark):
        df = spark.createDataFrame(
            [(1, "hello world"), (2, "hello world"), (3, "other text")],
            ["id", "text"],
        )
        out = {r["keeper_id"]: r["copies"]
               for r in dd.exact_dedup(df, "text", "id").collect()}
        assert out == {1: 2, 3: 1}

    def test_drop_exact_duplicates_keeps_first(self, spark):
        df = spark.createDataFrame(
            [(1, "x y"), (2, "x y"), (3, "z")], ["id", "text"])
        kept = sorted(r["id"] for r in
                      dd.drop_exact_duplicates(df, "text", "id").collect())
        assert kept == [1, 3]

    def test_no_false_merges_on_corpus(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "cleaned", clean_text(F.col("text")))
        n_docs = docs.count()
        n_groups = dd.exact_dedup(docs, "cleaned", "doc_id").count()
        assert n_groups == n_docs  # corpus has near-dups, no exact dups


class TestMinHashLSH:
    def test_full_recall_of_planted_dups(self, spark, sf_dir, planted_pairs):
        got = {(r["a_id"], r["b_id"])
               for r in q_dedup_minhash(spark, sf_dir).collect()}
        assert planted_pairs, "testdata should contain planted near-dups"
        missing = planted_pairs - got
        assert not missing, f"minhash missed {missing}"

    def test_jaccard_values_above_threshold(self, spark, sf_dir):
        for r in q_dedup_minhash(spark, sf_dir).collect():
            assert r["jaccard"] >= 0.5

    def test_signature_shape(self, spark):
        df = spark.createDataFrame([(1, "a b c d e f g h")], ["id", "text"])
        sig = dd.minhash_signatures(df, "text", "id", num_hashes=16).first()["minhash"]
        assert len(sig) == 16
        # distinct seeds must give distinct hash families (regression: a
        # 2-arg transform lambda silently received the array index as seed)
        assert len(set(sig)) > 1

    def test_candidates_detect_shared_prefix_docs(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        df = spark.createDataFrame(
            [(1, base), (2, base + " dup"), (3, "completely different words here")],
            ["id", "text"],
        )
        pairs = dd.minhash_near_duplicates(df, "text", "id", threshold=0.5).collect()
        assert {(r["a_id"], r["b_id"]) for r in pairs} == {(1, 2)}


class TestSimHash:
    def test_recall_of_planted_dups(self, spark, sf_dir, planted_pairs):
        # the registry query now returns the theorem-invariant row
        # (r6 verdict #4); the raw pair recall rides the operator
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "cleaned_text", clean_text(F.col("text")))
        got = {(r["a_id"], r["b_id"]) for r in dd.simhash_near_duplicates(
            docs, "cleaned_text", "doc_id").collect()}
        missing = planted_pairs - got
        assert not missing, f"simhash missed {missing}"

    def test_invariant_row_theorems_hold(self, spark, sf_dir):
        row = q_dedup_simhash(spark, sf_dir).collect()
        assert len(row) == 1
        r = row[0]
        assert r["all_text_dup_pairs_emitted"] is True
        assert r["max_hamming_within_bound"] is True
        assert r["pairs_canonical"] is True
        assert r["n_text_dup_pairs"] >= 0

    def test_identical_texts_zero_hamming(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            ["id", "text"],
        )
        out = dd.simhash_near_duplicates(df, "text", "id").collect()
        assert len(out) == 1 and out[0]["hamming"] == 0

    def test_fingerprint_is_deterministic_long(self, spark):
        df = spark.createDataFrame([(1, "some stable text")], ["id", "text"])
        a = df.select(dd.simhash(F.col("text")).alias("s")).first()["s"]
        b = df.select(dd.simhash(F.col("text")).alias("s")).first()["s"]
        assert a == b and isinstance(a, int)


class TestEmbeddingDedup:
    def test_finds_identical_vectors(self, spark):
        v = [1.0, 2.0, 3.0, 4.0]
        w = [-1.0, 0.5, 2.0, -3.0]
        df = spark.createDataFrame(
            [(1, v, 0), (2, v, 0), (3, w, 0)],
            "id: long, vec: array<float>, label: int",
        )
        out = dd.embedding_near_duplicates(
            df, "vec", "id", block_col="label", threshold=0.99).collect()
        assert {(r["a_id"], r["b_id"]) for r in out} == {(1, 2)}
        assert out[0]["cosine"] == pytest.approx(1.0)

    def test_blocking_limits_pairs(self, spark):
        v = [1.0, 0.0]
        df = spark.createDataFrame(
            [(1, v, 0), (2, v, 1)], "id: long, vec: array<float>, label: int")
        out = dd.embedding_near_duplicates(
            df, "vec", "id", block_col="label", threshold=0.5).collect()
        assert out == []  # identical vectors but different blocks

    def test_unblocked_requires_explicit_opt_in(self, spark):
        """No block_col => all-pairs cartesian; must hard-fail unless the
        caller opts in (scale guard — steer to brp/semdedup instead)."""
        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "id: long, vec: array<float>")
        with pytest.raises(ValueError, match="all-pairs"):
            dd.embedding_near_duplicates(df, "vec", "id")
        assert dd.embedding_near_duplicates(
            df, "vec", "id", allow_full_cartesian=True).collect() == []


def test_simhash_vote_staging_matches_inline_form(spark, sf_dir):
    """The staged (single-traversal) simhash must be bit-identical to the
    per-bit-aggregate convenience form."""
    from pyspark.sql import functions as F

    from social_media_sentiment_analysis_spark.operators.dedup import (
        simhash_features,
        simhash_from_hashes,
        simhash_from_votes,
        simhash_votes,
    )
    from social_media_sentiment_analysis_spark.sources.batch import load_table

    docs = (load_table(spark, sf_dir, "documents").limit(50)
            .select("doc_id", simhash_features(F.col("text")).alias("h")))
    both = (docs
            .withColumn("votes", simhash_votes(F.col("h")))
            .select("doc_id",
                    simhash_from_votes(F.col("votes")).alias("staged"),
                    simhash_from_hashes(F.col("h")).alias("inline")))
    assert both.filter("staged <> inline").count() == 0


class TestBloomDecontamination:
    """Relational Bloom filter (operators/bloom.py) as a decon pre-probe:
    the bitmap may only ADD verify work (false positives), never change
    the answer."""

    def test_matches_exact_decon(self, spark, sf_dir):
        """No false negatives: the bloom-filtered pipeline's manifest is
        row-identical to the exact broadcast-set decon."""
        from social_media_sentiment_analysis_spark.queries.llmdata import (
            q_bloom_decontamination, q_contamination,
        )

        got = q_bloom_decontamination(spark, sf_dir).collect()
        want = q_contamination(spark, sf_dir).collect()
        assert got == want and len(want) > 0

    @staticmethod
    def _shingles(spark, sf_dir):
        from pyspark.sql import functions as F

        from social_media_sentiment_analysis_spark.functions.text import (
            clean_text, shingles_from_tokens, tokens,
        )
        from social_media_sentiment_analysis_spark.queries.llmdata import (
            _SHINGLE_K,
        )
        from social_media_sentiment_analysis_spark.sources.batch import (
            load_table,
        )

        return (load_table(spark, sf_dir, "documents")
                .select("doc_id", F.explode(F.array_distinct(
                    shingles_from_tokens(tokens(clean_text(F.col("text"))),
                                         _SHINGLE_K))).alias("s")))

    def test_bitmap_actually_prunes(self, spark, sf_dir):
        """Superset of the true members, and a small one: bloom-positives
        = true shared mass + ~1% fp of the corpus (10 bits/key)."""
        from pyspark.sql import functions as F

        from social_media_sentiment_analysis_spark.operators.bloom import (
            bloom_bitmap, bloom_probe,
        )

        sh = self._shingles(spark, sf_dir)
        bench = sh.filter(F.col("doc_id") % 100 == 0).select("s").distinct()
        corpus = sh.filter(F.col("doc_id") % 100 != 0)
        bitmap = bloom_bitmap(bench, "s")
        n_corpus = corpus.count()
        n_pass = bloom_probe(corpus, "s", bitmap).count()
        n_true = corpus.join(bench, "s", "left_semi").count()
        assert n_pass >= n_true                    # no false negatives
        assert n_pass <= n_true + 0.05 * n_corpus + 50   # real pruning

    def test_probe_exact_vs_reference_bloom(self, spark, sf_dir):
        """The relational probe IS a Bloom filter: every key folded into
        the bitmap passes its own probe (definitional no-false-negative
        check, key-by-key, not just through the decon pipeline)."""
        from pyspark.sql import functions as F

        from social_media_sentiment_analysis_spark.operators.bloom import (
            bloom_bitmap, bloom_probe,
        )

        sh = self._shingles(spark, sf_dir)
        bench = sh.filter(F.col("doc_id") % 100 == 0).select("s").distinct()
        bitmap = bloom_bitmap(bench, "s")
        n_members = bench.count()
        n_self = bloom_probe(bench, "s", bitmap).count()
        assert n_self == n_members

    def test_probe_plan_no_corpus_shuffle(self, spark, sf_dir):
        """The probed stream never shuffles: the probe pipeline's only
        hash exchanges belong to the bitmap build (bench distinct + slot
        aggregate) — scan -> k broadcast joins -> filter on the corpus
        side adds ZERO."""
        from pyspark.sql import functions as F

        from social_media_sentiment_analysis_spark.operators.bloom import (
            bloom_bitmap, bloom_probe,
        )
        from social_media_sentiment_analysis_spark.plans.inspect import (
            exchange_count, physical_plan,
        )

        sh = self._shingles(spark, sf_dir)
        bench = sh.filter(F.col("doc_id") % 100 == 0).select("s").distinct()
        probed = bloom_probe(sh.filter(F.col("doc_id") % 100 != 0), "s",
                             bloom_bitmap(bench, "s"))
        # the bitmap is checkpointed inside bloom_probe (built once, k
        # consumers), so the probe plan itself carries ZERO hash
        # exchanges: scan -> k broadcast joins -> filter
        assert exchange_count(probed) == 0, physical_plan(probed)[:1500]
        assert physical_plan(probed).count("BroadcastHashJoin") >= 3


class TestDedupRewrite:
    """Semantic pins for q_dedup_rewrite (exact-substring dedup as a
    rewrite; the oracle-parity gate covers the full value contract, these
    pin the remove-all-but-first policy itself)."""

    def _result(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.llmdata import (
            q_dedup_rewrite,
        )
        return q_dedup_rewrite(spark, sf_dir).toPandas()

    def test_kept_equals_global_distinct_chunks(self, spark, sf_dir):
        """Σ n_kept == count of DISTINCT chunk texts corpus-wide: the
        remove-all-but-first policy keeps exactly one survivor per
        distinct chunk content."""
        from social_media_sentiment_analysis_spark.queries.llmdata import (
            _REWRITE_CHUNK, _docs,
        )
        from social_media_sentiment_analysis_spark.functions.text import tokens

        res = self._result(spark, sf_dir)
        docs = _docs(spark, sf_dir).filter(F.col("cleaned_text") != "") \
            .select(tokens(F.col("cleaned_text")).alias("toks"))
        n = F.size("toks")
        chunks = F.transform(
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / F.lit(_REWRITE_CHUNK))),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("toks"), i * _REWRITE_CHUNK + 1,
                             _REWRITE_CHUNK)))
        distinct_chunks = (docs.select(F.explode(chunks).alias("txt"))
                           .distinct().count())
        assert int(res["n_kept"].sum()) == distinct_chunks

    def test_rewrite_is_idempotent_and_cuts_something(self, spark, sf_dir):
        res = self._result(spark, sf_dir)
        assert (res["n_kept"] <= res["n_chunks"]).all()
        assert (res["n_kept"] >= 0).all()
        # the synthetic corpus has cross-doc duplicate chunks by design
        assert (res["n_kept"] < res["n_chunks"]).any()
        # every doc row is present exactly once
        assert res["doc_id"].is_unique

    def test_plan_shape_two_content_exchanges_no_join(self, spark, sf_dir):
        """Chunking map-side; one window exchange on md5(txt); one
        reassembly exchange on doc_id (+ the presentation sort's range
        exchange). No join anywhere."""
        from social_media_sentiment_analysis_spark.plans.inspect import (
            exchange_count, physical_plan,
        )
        from social_media_sentiment_analysis_spark.queries.llmdata import (
            q_dedup_rewrite,
        )
        plan = physical_plan(q_dedup_rewrite(spark, sf_dir))
        assert "Join" not in plan, plan[:1500]
        assert exchange_count(q_dedup_rewrite(spark, sf_dir)) <= 3, plan[:1500]
