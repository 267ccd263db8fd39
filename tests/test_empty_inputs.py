"""Empty-input robustness: every reusable operator must return an empty
(or well-defined) result on 0-row input — never raise. A 100-TB pipeline
routinely produces empty partitions/filters; an operator that throws on
empty input kills the whole job."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_vecs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_dedup_operators_on_empty(spark):
    from wde_spark.operators import dedup as D

    docs = _empty_docs(spark)
    assert D.exact_dedup(docs).count() == 0
    assert D.minhash_signatures(docs).count() == 0
    assert D.minhash_lsh_pairs(docs).count() == 0
    assert D.neardup_lsh_verified(docs).count() == 0
    assert D.simhash(docs).count() == 0
    assert D.ngram_jaccard_pairs(docs).count() == 0
    assert D.sorted_neighborhood_pairs(docs).count() == 0


def test_similarity_operators_on_empty(spark):
    from wde_spark.operators import similarity as SIM

    vecs = _empty_vecs(spark)
    assert SIM.cosine_topk(vecs, vecs).count() == 0
    assert SIM.lsh_ann(vecs, vecs).count() == 0
    assert SIM.lsh_ann_multi(vecs, vecs).count() == 0
    assert SIM.ivf_ann(vecs, vecs).count() == 0  # empty-centroid branch
    assert SIM.embedding_neardup(vecs).count() == 0


def test_curation_and_textstats_on_empty(spark):
    from wde_spark.operators import curation as CU
    from wde_spark.operators import textstats as TS

    docs = _empty_docs(spark)
    assert CU.repetition_stats(docs).count() == 0
    assert CU.pii_redact(docs).count() == 0
    assert CU.decontaminate(docs, docs).count() == 0
    assert CU.chunk_documents(docs).count() == 0
    assert TS.quality_score(docs).count() == 0
    assert TS.winnowing_fingerprints(docs).count() == 0
    assert TS.tfidf_topk(docs).count() == 0


def test_relational_operators_on_empty(spark):
    from wde_spark.operators import graph as G
    from wde_spark.operators import relational as R

    ev = spark.createDataFrame([], "user_id long, ts timestamp, v double")
    assert R.sessionize(ev, "user_id", "ts", 1800).count() == 0
    assert R.sessionize_bucketed(ev, "user_id", "ts", 1800).count() == 0
    assert R.top_k_per_group(ev, ["user_id"], [F.desc("v")], 3).count() == 0
    assert R.top_k_per_group_salted(ev, ["user_id"], [F.desc("v")], 3).count() == 0
    assert R.last_write_wins(ev, ["user_id"], F.col("ts")).count() == 0
    assert R.last_write_wins_agg(ev, ["user_id"], F.col("ts")).count() == 0
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert G.connected_components(edges).count() == 0
