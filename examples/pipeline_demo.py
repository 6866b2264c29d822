"""End-to-end tour of the engine on the sf0.001 testdata (~30 s on
local[*]): ingest → profile → contract checks → curate (quality gates +
dedup) → train-set assembly → version the result and diff it against the
raw corpus. Every stage is the real operator the gate/bench exercises;
this file is the "new user, ten minutes" narrative of README.md.

Run:  python examples/pipeline_demo.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datamunging_spark import get_spark
from datamunging_spark.operators.dedup import exact_dedup
from datamunging_spark.operators.history import snapshot_diff
from datamunging_spark.operators.pipeline import curate_corpus
from datamunging_spark.operators.quality import (
    corpus_report,
    not_empty_rule,
    range_rule,
    unique_report,
    validation_summary,
)
from datamunging_spark.operators.text import build_vocab, vocab_coverage
from datamunging_spark.operators.trainset import (
    split_dataset,
    take_token_budget,
)
from datamunging_spark.functions import token_count
from datamunging_spark.sources import load_table
from datamunging_spark.sources.versioned import (
    read_table_version,
    write_table_version,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("pipeline_demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. ingest + census
    docs = load_table(spark, sf_dir, "documents")
    print("== corpus census (per source) ==")
    corpus_report(docs).show(truncate=False)

    # 2. data contracts: one-scan rule summary + key uniqueness
    summary = validation_summary(
        docs,
        [
            not_empty_rule("text_present", "text"),
            range_rule("chars_sane", "n_chars", lo=0, hi=10_000_000),
        ],
    ).collect()[0]
    dups = unique_report(docs, ["doc_id"]).count()
    print(f"contracts: {summary.asDict()}  duplicate doc_ids: {dups}")

    # 3. curation: quality gates + paragraph + exact/fuzzy doc dedup
    #    + PII redaction (flags on so the narrative matches what runs)
    curated = curate_corpus(
        docs, redact=True, para_dedup=True
    ).localCheckpoint()
    print(f"curated: {docs.count()} -> {curated.count()} docs")

    # 3b. span-level exact-substring dedup: cut verbatim cross-document
    #     spans >= 40 chars (licence blocks, boilerplate) from all but
    #     the earliest holder — the Lee et al. 2022 step after doc-level
    #     dedup
    from datamunging_spark.operators.spandedup import span_dedup

    curated = span_dedup(curated, min_span=40, gram=24).localCheckpoint()
    print(f"after span dedup: {curated.count()} docs (text trimmed in place)")

    # 3c. continuous-ingest preview: a Bloom filter over the curated
    #     corpus hashes prefilters the next crawl batch — rows it rejects
    #     are definitely new and skip the anti-join
    from datamunging_spark.operators.bloom import bloom_build
    from datamunging_spark.operators.dedup import (
        content_snapshot,
        incremental_dedup,
    )

    snap = content_snapshot(curated).localCheckpoint()
    bloom = bloom_build(snap, ["content_hash"])
    next_batch = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    survivors = incremental_dedup(next_batch, snap, bloom=bloom)
    print(
        f"re-crawl of the raw corpus vs curated snapshot: "
        f"{next_batch.count()} -> {survivors.count()} genuinely new docs"
    )

    # 3d. data selection: DSIR importance resampling — keep the curated
    #     docs whose hashed-ngram distribution looks like a target slice
    #     (src0/src1 standing in for "Wikipedia-like")
    from datamunging_spark.operators.selection import dsir_select

    target = curated.filter(F.col("source").isin("src0", "src1"))
    picked = dsir_select(curated, target, k=200, salt="demo")
    stats = picked.agg(
        F.count(F.lit(1)).alias("n"), F.max("dsir_logw").alias("top")
    ).first()
    top = f"{stats['top']:.2f}" if stats["top"] is not None else "n/a"
    print(f"DSIR-selected {stats['n']} target-like docs (top logw {top})")

    # 4. train-set assembly: leakage-safe split + token budget
    splits = split_dataset(
        curated, {"train": 0.9, "val": 0.1}, id_cols=["doc_id"]
    )
    train = splits.filter(F.col("split") == "train").select(
        "doc_id", "source", token_count("text").cast("long").alias("n_tokens")
    )
    budgeted = take_token_budget(train, 50_000, order_cols=["doc_id"])
    print(f"train docs within 50k-token budget: {budgeted.count()}")

    # 5. vocabulary + coverage over the curated corpus — built via the
    # bounded-shuffle sketch path; certified_exact proves it equals the
    # exact TakeOrdered vocabulary
    vocab = build_vocab(
        curated, vocab_size=200, sketch_k=4096
    ).localCheckpoint()
    cert = vocab.agg(F.min("certified_exact")).first()[0]
    print(f"vocabulary: 200 words via MG sketch, certified_exact={cert}")
    vocab_coverage(curated, vocab).show(truncate=False)

    # 6. version the curated corpus and diff it against the raw one
    store = f"{workdir}/corpus_store"
    write_table_version(curated.select("doc_id", "text"), store, 1)
    v1 = read_table_version(spark, store, 1)
    diff = snapshot_diff(
        docs.select("doc_id", "text"), v1, ["doc_id"]
    ).groupBy("status").count()
    print("== raw -> curated diff ==")
    diff.show()

    # 7. exactness spot check: the curated corpus has no exact dupes left
    assert exact_dedup(curated).count() == curated.count()
    print(f"done; versioned store at {store}")
    spark.stop()


if __name__ == "__main__":
    main()
