"""Measure the filtered-lexical (filter_ids) 10x scale shape.

Claims under test:

1. **The filter join is matched-branch-sized, not corpus-sized**: a
   filtered bm25_topk should cost ~the unfiltered wall (often less --
   fewer rows reach the score aggregate), and the 1x -> 10x growth
   ratio of the filtered query should track the unfiltered one.
2. **Selectivity is free**: a 1% filter and a 50% filter should cost
   about the same -- the semi-join keys on doc id over the
   query-term-pruned matched branch either way.
3. **ann_recall_report closes the tuning loop cheaply**: scoring an
   IVF run against brute-force truth is evaluation-sized (sub-second).

Usage: python tools/measure_filtered_lexical.py [testdata_root]
(default /root/testdata; probes sf0.01 vs sf0.1 documents, best of 3)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from datamunging_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
    index_stats,
    inverted_index,
    term_stats,
)


def best_of(n, fn):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(time.perf_counter() - t0)
    return min(walls)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("measure_filtered_lexical")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = spark.createDataFrame(
        [
            (1, "data quality pipeline"),
            (2, "model training corpus"),
            (3, "deduplication shingle hash"),
            (4, "stream window watermark"),
        ],
        "query_id long, query string",
    )
    for sf in ("sf0.01", "sf0.1"):
        docs = spark.read.parquet(f"{root}/{sf}/documents.parquet")
        post = inverted_index(docs).cache()
        post.count()
        stats = index_stats(docs).cache()
        stats.count()
        dfr = term_stats(post).cache()
        dfr.count()
        n_docs = docs.count()

        def run(flt):
            return bm25_topk(
                post, queries, stats, k=10, dfreq=dfr, filter_ids=flt
            ).count()

        base = best_of(3, lambda: run(None))
        flt01 = docs.filter(F.col("doc_id") % 100 == 0).select("doc_id")
        flt50 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
        w01 = best_of(3, lambda: run(flt01))
        w50 = best_of(3, lambda: run(flt50))
        print(
            f"{sf} ({n_docs} docs): unfiltered={base:.2f}s "
            f"filter_1pct={w01:.2f}s filter_50pct={w50:.2f}s"
        )
        post.unpersist()
        stats.unpersist()
        dfr.unpersist()

    # tuning-loop cost: ann_recall_report over an IVF run vs truth
    from datamunging_spark.operators.similarity import (
        ann_recall_report,
        brute_force_topk,
        ivf_build,
        ivf_search,
    )

    emb = spark.read.parquet(f"{root}/sf0.01/embeddings.parquet")
    qs = emb.limit(16).cache()
    qs.count()
    idx = ivf_build(emb, n_clusters=16)
    idx.assigned.cache().count()
    truth = brute_force_topk(qs, emb, k=10).cache()
    truth.count()
    hits = ivf_search(qs, idx, k=10, n_probe=4).cache()
    hits.count()
    w = best_of(
        3,
        lambda: ann_recall_report(hits, truth)
        .agg(F.avg("recall"))
        .collect(),
    )
    r = (
        ann_recall_report(hits, truth)
        .agg(F.avg("recall").alias("r"))
        .collect()[0]
        .r
    )
    print(f"ann_recall_report: wall={w:.2f}s mean_recall={r:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
