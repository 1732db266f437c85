"""End-to-end training-corpus build: the filter -> dedup -> pack ->
shard chain as ONE user-facing pipeline (`cli.py corpus`).

Each stage is the same declarative plan the registry exposes as an
individually-oracled query (q_docs_quality_filter, q_dedup_keep_best,
q_pack_sequences, write_training_shards); this module composes them
over a shared lineage so the full build is still a handful of plans -
no intermediate materialization except the final shard export, and a
per-stage row-count summary from one action per stage boundary.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.functions import textfns as TX
from smart_energy_consumption_analytics_using_big_data_spark.sources import writers
from smart_energy_consumption_analytics_using_big_data_spark.sources.catalog import load_table


def quality_filter(docs: DataFrame) -> DataFrame:
    """FineWeb-style gate: language, token band, stopword floor, punct
    ceiling, exact-dup removal (same plan as q_docs_quality_filter but
    keeping the text column for downstream stages)."""
    qf = TX.quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        "n_chars",
        F.md5("text").alias("text_hash"),
        qf["n_tokens"].alias("n_tokens"),
        qf["stopword_ratio"].alias("stopword_ratio"),
        qf["punct_ratio"].alias("punct_ratio"),
        TX.predicted_lang(F.col("text")).alias("pred_lang"),
    ).filter(
        (F.col("pred_lang") == "en")
        & F.col("n_tokens").between(5, 2000)
        & (F.col("stopword_ratio") >= 0.05)
        & (F.col("punct_ratio") <= 0.25)
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_best_dedup(docs: DataFrame) -> DataFrame:
    """Normalized-fingerprint dedup keeping the longest member (same
    plan as q_dedup_keep_best, applied mid-pipeline)."""
    fp = docs.withColumn("__fp", TX.fingerprint_md5(F.col("text")))
    w = Window.partitionBy("__fp").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        fp.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )


def shuffle_order(docs: DataFrame, seed: int = 42, shards: int = 8) -> DataFrame:
    """Deterministic per-epoch training-order shuffle: (doc_id, shard,
    pos) where the permutation is a pure function of (doc_id, seed).

    A different ``seed`` per epoch re-permutes the corpus without any
    state; re-running at any partition layout yields the same order,
    unlike ``orderBy(rand())``. Scale shape: NO global sort - the shard
    is an md5 bucket (embarrassingly parallel projection) and the
    position is a row_number within each shard, so the only shuffle is
    the shard-partitioned window, one reducer per shard regardless of
    corpus size. md5 keys keep the permutation oracle-portable.
    """
    k = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}")))
    shard = F.pmod(
        F.conv(F.substring(k, 1, 8), 16, 10).cast("long"), F.lit(shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    return (
        docs.select("doc_id", k.alias("k"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
    )


def pack_assignments(docs: DataFrame, context: int = 512, shards: int = 8) -> DataFrame:
    """Concat-and-chunk packing metadata per doc (shard, pack_id) -
    hash-sharded so the running-sum window parallelizes."""
    tok = docs.withColumn("__ntok", TX.token_count_bpeish(F.col("text"))).withColumn(
        "__shard",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("int")
            % shards
        ),
    ).withColumn("__ord", F.md5(F.col("doc_id").cast("string")))
    w = (
        Window.partitionBy("__shard")
        .orderBy("__ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tok.withColumn(
            "pack_id",
            F.floor((F.sum("__ntok").over(w) - F.col("__ntok")) / float(context)).cast(
                "bigint"
            ),
        )
        .withColumnRenamed("__shard", "shard")
        .withColumnRenamed("__ntok", "n_tokens_bpeish")
        .drop("__ord")
    )


def build_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = 8,
    context: int = 512,
) -> dict:
    """Run the full chain and export training shards + a summary."""
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    filtered = quality_filter(docs)
    deduped = keep_best_dedup(filtered)
    packed = pack_assignments(deduped, context=context, shards=n_shards)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    writers.write_training_shards(
        packed.select("doc_id", "text", "n_tokens_bpeish", "shard", "pack_id"),
        str(out / "shards"),
        n_shards=n_shards,
        id_col="doc_id",
    )
    n_final, n_packs = (
        packed.agg(
            F.count(F.lit(1)), F.count_distinct("shard", "pack_id")
        ).collect()[0]
    )
    summary = {
        "raw_docs": n_raw,
        "after_quality_filter": filtered.count(),
        "after_dedup": n_final,
        "packs": n_packs,
        "context_tokens": context,
        "n_shards": n_shards,
    }
    (out / "corpus_summary.json").write_text(json.dumps(summary))
    return summary


def build_tokenizer(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_merges: int = 3,
    vocab_top_n: int = 1000,
) -> dict:
    """Train a BPE tokenizer on the corpus and export its artifacts
    (`cli.py tokenize`): the ordered merge table and the encoded
    vocabulary — the two files a downstream tokenization job actually
    consumes (apply merges in order; look token counts up by word).

    Both derive from the same declarative merge iteration the registry
    oracles individually (q_text_bpe_merges / q_text_bpe_encode); this
    stage just persists them. Artifacts are single-file parquet (they
    are vocab-sized by construction — the corpus compaction happened
    inside the plans), plus a JSON summary with the compression ratio
    the merges bought on the exported vocabulary slice.
    """
    docs = load_table(spark, sf_dir, "documents")
    merges = TX.bpe_learn_merges(docs, n_merges=n_merges)
    vocab = TX.bpe_encode_vocab(docs, n_merges=n_merges, top_n=vocab_top_n)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    merges.coalesce(1).write.mode("overwrite").parquet(str(out / "merges.parquet"))
    vocab.coalesce(1).write.mode("overwrite").parquet(str(out / "vocab.parquet"))
    v = spark.read.parquet(str(out / "vocab.parquet"))
    n_vocab, chars, toks = (
        v.agg(
            F.count(F.lit(1)),
            F.sum(F.length("w") * F.col("n_w")).cast("bigint"),
            F.sum(F.col("n_tokens") * F.col("n_w")).cast("bigint"),
        ).collect()[0]
    )
    summary = {
        "n_merges": spark.read.parquet(str(out / "merges.parquet")).count(),
        "vocab_rows": n_vocab,
        "chars_encoded": chars,
        "tokens_encoded": toks,
        "chars_per_token": round(chars / toks, 4) if toks else None,
    }
    (out / "tokenizer_summary.json").write_text(json.dumps(summary))
    return summary
