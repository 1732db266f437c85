"""Product-quantization quality + chunking coverage properties.

The PQ queries are oracle-checked for cross-engine equality; these
tests assert the parts an oracle can't: that ADC search actually
approximates exact search (recall floor), that codes compress, and
that chunking covers every token with the promised overlap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ext import similarity as S
from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_pq_adc_recall_vs_exact(spark):
    """ADC top-50 must contain >= 5 of the exact L2 top-10 (recall@50
    on near-random synthetic vectors; chance overlap would be ~1)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    query = emb.orderBy("vec_id").limit(1)
    adc_ids = {r["vec_id"] for r in S.pq_search_adc(emb, query, k_top=50).collect()}
    qv = query.select(F.col("embedding").alias("__q"))
    exact = (
        emb.crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "__q",
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("d2"),
        )
        .orderBy("d2", "vec_id")
        .limit(10)
    )
    exact_ids = {r["vec_id"] for r in exact.collect()}
    assert len(adc_ids & exact_ids) >= 5
    # the query vector itself must land in its own ADC candidate set
    qid = query.collect()[0]["vec_id"]
    assert qid in adc_ids


def test_pq_encode_compresses_to_m_codes(spark):
    enc = QUERIES["q_emb_pq_encode"](spark, SF_DIR)
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    stats = enc.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("m"), F.max("code").alias("maxc"), F.min("code").alias("minc")
    )
    rows = stats.collect()
    assert len(rows) == n_vecs
    assert all(r["m"] == 8 for r in rows)
    assert all(0 <= r["minc"] and r["maxc"] <= 15 for r in rows)


def test_chunks_cover_all_tokens_with_overlap(spark):
    """Every token position 1..n_tok of every doc falls inside >= 1
    chunk; consecutive chunks overlap by exactly size-stride tokens
    (except a short tail); chunk_ids are dense from 0."""
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    chunks = QUERIES["q_text_chunk"](spark, SF_DIR)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max(F.col("start_tok") + F.col("n_tok") - 1).alias("max_cover"),
        F.min("start_tok").alias("first_start"),
        F.max("chunk_id").alias("max_cid"),
    )
    joined = per_doc.join(docs, "doc_id")
    bad = joined.filter(
        (F.col("max_cover") != F.col("n_tok"))
        | (F.col("first_start") != 1)
        | (F.col("max_cid") != F.col("n_chunks") - 1)
    )
    assert bad.count() == 0
    # stride contract: successive starts differ by exactly 30
    w_bad = (
        chunks.groupBy("doc_id", "chunk_id")
        .agg(F.first("start_tok").alias("start_tok"))
        .withColumn("expected", F.col("chunk_id") * 30 + 1)
        .filter(F.col("start_tok") != F.col("expected"))
    )
    assert w_bad.count() == 0


def test_ivfpq_self_query_ranks_first_and_is_deterministic(spark):
    """The query IS corpus vector 0 (min vec_id): its own ADC distance
    is pure quantization error — the smallest — so it must rank first;
    two runs must agree exactly (derandomized pipeline)."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import ivfpq_search
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    query = emb.orderBy("vec_id").limit(1)
    qid = query.collect()[0]["vec_id"]
    a = [(r.vec_id, r.adc_dist) for r in ivfpq_search(emb, query).collect()]
    b = [(r.vec_id, r.adc_dist) for r in ivfpq_search(emb, query).collect()]
    assert a == b
    assert a[0][0] == qid
    assert all(d >= a[0][1] for _, d in a)


def test_ivfpq_nprobe_widening_only_adds_candidates(spark):
    """More probed cells can only add (never remove or re-rank) list
    members: the nprobe=1 result set is a subset of nprobe=all's
    candidate pool, and distances for shared ids are identical."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.similarity import ivfpq_search
    from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    query = emb.orderBy("vec_id").limit(1)
    narrow = {r.vec_id: r.adc_dist for r in ivfpq_search(emb, query, k_top=1000, nprobe=1).collect()}
    wide = {r.vec_id: r.adc_dist for r in ivfpq_search(emb, query, k_top=1000, nprobe=3).collect()}
    assert set(narrow) <= set(wide)
    for vid, d in narrow.items():
        assert wide[vid] == d
