"""MLlib layer: IVF ANN recall, LSH-join agreement with exact operators,
trainable sentiment classifier roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.ml import (
    assign_clusters,
    brp_embedding_pairs,
    classify,
    fit_ivf,
    fit_sentiment_classifier,
    ivf_topk,
    minhash_text_pairs,
)
from social_media_sentiment_analysis_spark.operators.similarity import (
    brute_force_topk,
)
from social_media_sentiment_analysis_spark.sources.batch import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents").cache()
    yield df
    df.unpersist()


class TestIVF:
    def test_assignment_covers_all_rows_in_range(self, emb):
        model = fit_ivf(emb, "embedding", k=8, seed=7)
        assigned = assign_clusters(emb, "embedding", model)
        total = emb.count()
        assert assigned.count() == total
        stats = assigned.agg(
            F.min("cluster_id").alias("lo"), F.max("cluster_id").alias("hi"),
            F.countDistinct("cluster_id").alias("n")).first()
        assert stats["lo"] >= 0 and stats["hi"] < 8
        assert stats["n"] > 1  # data actually spreads over cells

    def test_recall_vs_bruteforce(self, emb):
        qvec = list(emb.filter(F.col("vec_id") == 0)
                    .select("embedding").first()[0])
        corpus = emb.filter(F.col("vec_id") != 0)
        exact = {r["vec_id"] for r in brute_force_topk(
            corpus, qvec, "embedding", "vec_id", k=10).collect()}

        model = fit_ivf(emb, "embedding", k=8, seed=7)
        assigned = assign_clusters(corpus, "embedding", model)
        approx = {r["vec_id"] for r in ivf_topk(
            assigned, model, qvec, "embedding", "vec_id",
            k=10, n_probe=4).collect()}
        # probing half the cells must recover at least half the true top-10
        assert len(exact & approx) >= 5

    def test_probe_is_partition_pruned_on_laid_out_table(self, emb, spark,
                                                         tmp_path):
        """At scale the index IS the layout: assigned vectors written
        partitioned by cluster_id make each probe a partition-pruned scan
        reading n_probe/k of the corpus."""
        from social_media_sentiment_analysis_spark.plans.inspect import (
            formatted_plan,
        )
        from social_media_sentiment_analysis_spark.sources.layout import (
            write_partitioned,
        )

        qvec = list(emb.filter(F.col("vec_id") == 0)
                    .select("embedding").first()[0])
        corpus = emb.filter(F.col("vec_id") != 0)
        model = fit_ivf(emb, "embedding", k=8, seed=7)
        out = str(tmp_path / "emb_by_cluster")
        write_partitioned(assign_clusters(corpus, "embedding", model), out,
                          ("cluster_id",))

        table = spark.read.parquet(out)
        probed = ivf_topk(table, model, qvec, "embedding", "vec_id",
                          k=10, n_probe=4)
        plan = formatted_plan(probed)
        pf_line = plan.split("PartitionFilters")[1].split("\n")[0]
        assert "cluster_id" in pf_line and "IN" in pf_line.upper()
        # pruned probe returns the same answer as the in-memory operator
        in_mem = ivf_topk(assign_clusters(corpus, "embedding", model), model,
                          qvec, "embedding", "vec_id", k=10, n_probe=4)
        assert [tuple(r) for r in probed.select("vec_id", "cosine").collect()] \
            == [tuple(r) for r in in_mem.select("vec_id", "cosine").collect()]

    def test_full_probe_equals_bruteforce(self, emb):
        """n_probe = k scans everything → identical to the exact answer."""
        qvec = list(emb.filter(F.col("vec_id") == 0)
                    .select("embedding").first()[0])
        corpus = emb.filter(F.col("vec_id") != 0)
        exact = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(
            corpus, qvec, "embedding", "vec_id", k=10).collect()]
        model = fit_ivf(emb, "embedding", k=4, seed=7)
        assigned = assign_clusters(corpus, "embedding", model)
        full = [(r["vec_id"], r["cosine"]) for r in ivf_topk(
            assigned, model, qvec, "embedding", "vec_id",
            k=10, n_probe=4).collect()]
        assert full == exact


class TestLSHJoins:
    def test_minhash_pairs_agree_with_exact_jaccard(self, docs, spark):
        """Every high-similarity exact pair should be recalled, and reported
        estimates should correlate with exact Jaccard."""
        from social_media_sentiment_analysis_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        sample = docs.limit(200)
        exact = ngram_jaccard_pairs(
            sample, "text", "doc_id", threshold=0.7).collect()
        got = minhash_text_pairs(
            sample, "text", "doc_id", jaccard_threshold=0.5,
            num_hash_tables=8).collect()
        got_pairs = {(r["a_id"], r["b_id"]) for r in got}
        exact_pairs = {(r["a_id"], r["b_id"]) for r in exact}
        if exact_pairs:
            recall = len(exact_pairs & got_pairs) / len(exact_pairs)
            assert recall >= 0.8
        # sanity: join produced ordered unique pairs
        assert all(a < b for a, b in got_pairs)

    def test_brp_pairs_agree_with_exact_cosine(self, emb):
        from social_media_sentiment_analysis_spark.operators.dedup import (
            embedding_near_duplicates,
        )

        threshold = 0.6
        exact = embedding_near_duplicates(
            emb, "embedding", "vec_id", block_col=None,
            threshold=threshold, allow_full_cartesian=True).collect()
        got = brp_embedding_pairs(
            emb, "embedding", "vec_id", cosine_threshold=threshold,
            bucket_length=2.0, num_hash_tables=6).collect()
        exact_pairs = {(r["a_id"], r["b_id"]) for r in exact}
        got_pairs = {(r["a_id"], r["b_id"]) for r in got}
        if exact_pairs:
            recall = len(exact_pairs & got_pairs) / len(exact_pairs)
            assert recall >= 0.8
        # the LSH join may include a few pairs the exact operator's rounding
        # excluded, but every reported cosine must clear the threshold
        assert all(r["cosine"] >= threshold - 1e-6 for r in got)


class TestClassifier:
    def test_train_and_score_roundtrip(self, docs):
        model = fit_sentiment_classifier(docs, text_col="text",
                                         num_features=1 << 12)
        scored = classify(model, docs, text_col="text")
        assert "predicted_sentiment" in scored.columns
        from social_media_sentiment_analysis_spark.ml.classifier import (
            LABELS,
            weak_labels,
        )

        teacher = weak_labels(docs, text_col="text").select("doc_id", "label")
        joined = scored.join(teacher, "doc_id").withColumn(
            "teacher_label",
            F.array(*[F.lit(x) for x in LABELS])[F.col("label").cast("int")])
        n = joined.count()
        agree = joined.filter(
            F.col("predicted_sentiment") == F.col("teacher_label")).count()
        # student fits its own training labels well on a 500-doc corpus
        assert n > 0 and agree / n >= 0.75

    def test_scores_a_stream(self, docs, spark, tmp_path):
        """Train-batch / score-stream: the fitted pipeline is transform-only
        (tokenize, hash, IDF weights, LR weights), so it applies to an
        unbounded stream exactly as written — and stream scores must equal
        batch scores row for row."""
        import json
        import uuid

        model = fit_sentiment_classifier(docs, text_col="text",
                                         num_features=1 << 12)
        sample = docs.select("doc_id", "text").limit(20).collect()
        src = tmp_path / "stream_in"
        src.mkdir()
        with open(src / "batch0.jsonl", "w") as f:
            for r in sample:
                f.write(json.dumps({"doc_id": r.doc_id, "text": r.text})
                        + "\n")

        stream = (spark.readStream.schema("doc_id bigint, text string")
                  .json(str(src)))
        scored = classify(model, stream, text_col="text")
        assert scored.isStreaming
        name = "clf_" + uuid.uuid4().hex[:8]
        q = (scored.select("doc_id", "predicted_sentiment")
             .writeStream.format("memory").queryName(name)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        got = {r.doc_id: r.predicted_sentiment
               for r in spark.table(name).collect()}

        ids = [r.doc_id for r in sample]
        want = {r["doc_id"]: r["predicted_sentiment"]
                for r in classify(model,
                                  docs.filter(F.col("doc_id").isin(ids)),
                                  text_col="text")
                .select("doc_id", "predicted_sentiment").collect()}
        assert got == want and len(got) == 20

    def test_scoring_is_map_side(self, docs):
        """transform must not introduce a shuffle (scoring 100 TB is one
        scan)."""
        model = fit_sentiment_classifier(docs, text_col="text",
                                         num_features=1 << 12)
        scored = classify(model, docs, text_col="text")
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestSemDeDup:
    """SemDeDup (cluster-pruned semantic dedup) contracts."""

    def test_k1_equals_bruteforce_dedup(self, emb):
        """With one cluster the candidate space is all-pairs, so the kept
        set must be EXACTLY the brute-force embedding dedup's kept set."""
        from social_media_sentiment_analysis_spark.ml import semantic_dedup
        from social_media_sentiment_analysis_spark.operators.dedup import (
            embedding_near_duplicates,
        )
        from social_media_sentiment_analysis_spark.operators.graph import (
            connected_components,
        )

        kept_sem = {
            r.vec_id
            for r in semantic_dedup(emb, "embedding", "vec_id",
                                    k=1, threshold=0.97).collect()
        }
        pairs = embedding_near_duplicates(emb, "embedding", "vec_id",
                                          threshold=0.97,
                                          allow_full_cartesian=True)
        comps = connected_components(pairs)
        drops = {r.node for r in comps.collect() if r.node != r.component}
        kept_brute = {r.vec_id for r in emb.collect()} - drops
        assert kept_sem == kept_brute

    def test_cluster_pruned_pairs_are_subset_with_recall(self, emb):
        """k=8 pairs must be a subset of brute-force pairs (no false
        positives — cosine is exact within the cluster) with decent
        recall (near-dups rarely straddle cluster boundaries)."""
        from social_media_sentiment_analysis_spark.ml import (
            semantic_duplicate_pairs,
        )
        from social_media_sentiment_analysis_spark.operators.dedup import (
            embedding_near_duplicates,
        )

        sem = {(r.a_id, r.b_id)
               for r in semantic_duplicate_pairs(
                   emb, "embedding", "vec_id", k=8, threshold=0.97).collect()}
        brute = {(r.a_id, r.b_id)
                 for r in embedding_near_duplicates(
                     emb, "embedding", "vec_id", threshold=0.97,
                     allow_full_cartesian=True).collect()}
        assert sem <= brute
        if brute:
            assert len(sem) / len(brute) >= 0.5

    def test_registry_summary_is_consistent(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )

        rows = QUERIES["dedup_semantic"].builder(spark, sf_dir).collect()
        assert len(rows) == 1
        r = rows[0]
        # contract row: real anchors, both theorems hold on testdata
        assert r.n_total > 0 and 0 < r.n_exact_droppable < r.n_total
        assert r.drops_subset_of_exact and r.drop_recall_ok


class TestALS:
    """ALS collaborative filtering: fit quality vs a popularity baseline,
    recommendation shape and determinism of the registry query."""

    def test_fit_reconstructs_better_than_mean(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.ml import (
            fit_als, purchase_interactions,
        )

        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders")
        inter = purchase_interactions(li, o).cache()
        model = fit_als(inter)
        pred = model.transform(inter)
        # implicit ALS predicts preference (~1 for observed); observed
        # interactions should mostly score positive
        frac_pos = (pred.filter(F.col("prediction") > 0).count()
                    / pred.count())
        assert frac_pos > 0.8
        inter.unpersist()

    def test_registry_recs_shape(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )

        rows = QUERIES["recommend_parts"].builder(spark, sf_dir).collect()
        assert len(rows) == 5   # one contract row per served user
        for r in rows:
            assert r.n_recs == 3
            assert r.ranks_contiguous and r.items_in_catalog
            assert r.scores_nonincreasing


class TestWord2Vec:
    def test_neighbors_and_vocab(self, docs, spark):
        from social_media_sentiment_analysis_spark.ml.word2vec import (
            doc_vectors, fit_word2vec, similar_words, word_vectors,
        )

        model = fit_word2vec(docs, min_count=5, dim=16)
        vocab = word_vectors(model)
        assert vocab.count() > 10
        assert {f.name for f in vocab.schema.fields} == {"word", "vector"}
        some_word = vocab.orderBy("word").first()["word"]
        syn = similar_words(model, some_word, k=3)
        rows = syn.collect()
        assert len(rows) == 3
        assert all(r.query == some_word and r.word != some_word
                   for r in rows)
        # similarities sorted descending
        sims = [r.similarity for r in rows]
        assert sims == sorted(sims, reverse=True)
        dv = doc_vectors(model, docs.limit(20))
        assert dv.count() == 20
        assert "doc_vec" in dv.columns

    def test_registry_query_shape(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.mlqueries import (
            q_word_embeddings,
        )

        out = q_word_embeddings(spark, sf_dir).collect()
        assert len(out) == 1
        r = out[0]
        assert r.query_word and r.n_neighbors == 5
        assert r.excludes_query and r.sims_in_range


class TestPQ:
    """Product quantization: encode/compress invariants and ADC recall
    against exact L2 brute force."""

    def test_codes_shape_and_determinism(self, emb, spark):
        from social_media_sentiment_analysis_spark.ml.pq import (
            encode_pq, fit_pq,
        )

        model = fit_pq(emb, "embedding", m=4, k=8, seed=7)
        enc = encode_pq(emb, "embedding", model)
        rows = enc.select("vec_id", "pq_codes").collect()
        assert all(len(r.pq_codes) == 4 for r in rows)
        assert all(0 <= c < 8 for r in rows for c in r.pq_codes)
        enc2 = encode_pq(emb, "embedding", model)
        assert ({(r.vec_id, tuple(r.pq_codes)) for r in rows}
                == {(r.vec_id, tuple(r.pq_codes))
                    for r in enc2.select("vec_id", "pq_codes").collect()})

    def test_adc_recall_vs_exact(self, emb, spark):
        from social_media_sentiment_analysis_spark.ml.pq import (
            encode_pq, fit_pq, pq_topk,
        )

        qrow = emb.filter(F.col("vec_id") == 0).first()
        query = [float(x) for x in qrow.embedding]
        corpus = emb.filter(F.col("vec_id") != 0)
        # exact L2 top-10
        qc = F.array(*[F.lit(x) for x in query])
        l2 = F.aggregate(
            F.zip_with("embedding", qc, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)
        exact = [r.vec_id for r in
                 corpus.select("vec_id", l2.alias("d"))
                 .orderBy(F.asc("d"), F.asc("vec_id")).limit(10).collect()]

        # fine subspaces (m=16 → 4-dim) suit the synthetic near-uniform
        # embeddings: real clustered embeddings tolerate coarser m
        model = fit_pq(emb, "embedding", m=16, k=16, seed=7)
        enc = encode_pq(corpus, "embedding", model)
        got = [r.vec_id for r in
               pq_topk(enc, model, query, "vec_id", k=30).collect()]
        # the PQ shortlist at 3x depth must recover most exact neighbors
        # (measured 0.7 on this fixture; 0.5 leaves seed margin)
        recall = len(set(exact) & set(got)) / len(exact)
        assert recall >= 0.5, (recall, exact, got)

    def test_ivfpq_composition_subset_of_pq(self, emb, spark):
        from social_media_sentiment_analysis_spark.ml.ivf import (
            assign_clusters, fit_ivf,
        )
        from social_media_sentiment_analysis_spark.ml.pq import (
            encode_pq, fit_pq, ivfpq_topk, pq_topk,
        )

        qrow = emb.filter(F.col("vec_id") == 0).first()
        query = [float(x) for x in qrow.embedding]
        corpus = emb.filter(F.col("vec_id") != 0)
        ivf = fit_ivf(emb, "embedding", k=8, seed=7)
        pq = fit_pq(emb, "embedding", m=16, k=16, seed=7)
        table = encode_pq(assign_clusters(corpus, "embedding", ivf),
                          "embedding", pq)
        got = ivfpq_topk(table, ivf, pq, query, "vec_id", k=10, n_probe=8)
        full = pq_topk(table, pq, query, "vec_id", k=10)
        # probing ALL cells must equal plain ADC over the whole table
        assert ([r.vec_id for r in got.collect()]
                == [r.vec_id for r in full.collect()])
        # fewer probes return a subset of the corpus, still k rows
        some = ivfpq_topk(table, ivf, pq, query, "vec_id", k=10, n_probe=3)
        assert some.count() == 10
