"""Measure the lexical-retrieval family's 10× scale shape (the
composite-probe rule: every composite gets a measured 10× row in
SCALE.md).

Claims under test:

1. **Index build grows ~linearly with the corpus** (tokenize → explode
   → one partial-agg hash aggregate — no join, no sort).
2. **Query time is decoupled from corpus growth when the index-build
   artifacts are precomputed** (the 100 TB configuration): the postings
   scan broadcast-joins the query-term list, so a 10× corpus costs
   ~10× more SCANNED postings but the exchanges stay matched-postings
   sized — the query wall should grow far slower than 10×.
3. **Incremental roll-forward signs only the batch**: advance_index on
   a 10%-sized batch should cost a small fraction of the full rebuild.
4. **(r13) BM25F and the grouped face keep the decoupling**: the
   fielded/grouped query walls should track the plain BM25 wall (same
   broadcast skeleton — one extra matched-sized aggregate for BM25F,
   one string key column for groups), not the corpus.
5. **(r13) boolean with a precomputed df table** (its new 100 TB
   path) should not exceed the on-the-fly wall.

Usage: python tools/measure_retrieval_scale.py [testdata_root]
(default /root/testdata; probes sf0.01 vs sf0.1 documents, best of 3)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from datamunging_spark.operators.retrieval import (  # noqa: E402
    advance_index,
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
        .appName("measure_retrieval_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    tmp = tempfile.mkdtemp(prefix="retrieval_scale_")
    print(
        "| sf | docs | postings rows | build wall | warm query wall "
        "(precomputed index) | incremental fold wall (10% batch) "
        "| phrase wall (positional) | boolean wall | boolean wall "
        "(precomputed df) | bm25f wall (fielded, precomputed) "
        "| grouped bm25 wall (4 groups, precomputed) "
        "| hit_windows+snippets wall (r14) "
        "| grouped bm25f wall (4 groups, r14) |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for sf in ("sf0.01", "sf0.1"):
        docs = spark.read.parquet(
            os.path.join(root, sf, "documents.parquet")
        ).select("doc_id", "text")
        n = docs.count()
        path = f"{tmp}/{sf}"

        def build():
            inverted_index(docs).write.mode("overwrite").parquet(path)

        build_wall = best_of(3, build)
        post = spark.read.parquet(path)
        n_post = post.count()
        stats = index_stats(docs).localCheckpoint()
        dfreq = term_stats(post).localCheckpoint()
        queries = docs.filter(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 40).alias("query"),
        ).localCheckpoint()

        def query():
            bm25_topk(post, queries, stats, k=10, dfreq=dfreq).count()

        query_wall = best_of(3, query)
        cut = int(n * 0.9)
        hist = inverted_index(
            docs.filter(F.col("doc_id") < cut)
        ).localCheckpoint()
        batch = docs.filter(F.col("doc_id") >= cut).localCheckpoint()

        def fold():
            advance_index(hist, batch).count()

        fold_wall = best_of(3, fold)

        from datamunging_spark.operators.retrieval import (
            boolean_topk,
            phrase_topk,
        )

        pos_post = inverted_index(docs, positions=True).localCheckpoint()
        phrases = docs.filter(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ", F.slice(F.split(F.col("text"), " ", -1), 1, 3)
            ).alias("query"),
        ).localCheckpoint()

        def phrase():
            phrase_topk(pos_post, phrases, k=10).count()

        phrase_wall = best_of(3, phrase)
        bq = spark.createDataFrame(
            [(0, "table row", "scan hash", "merge"),
             (1, None, "spark window", "the")],
            "query_id long, must string, should string, must_not string",
        )

        def boolean():
            boolean_topk(post, bq, stats, k=10).count()

        bool_wall = best_of(3, boolean)

        def boolean_pre():
            boolean_topk(post, bq, stats, k=10, dfreq=dfreq).count()

        bool_pre_wall = best_of(3, boolean_pre)

        from datamunging_spark.operators.retrieval import (
            bm25f_topk,
            field_stats,
            fielded_index,
            fielded_term_stats,
        )

        fdocs = docs.select(
            "doc_id",
            F.substring("text", 1, 25).alias("title"),
            F.col("text").alias("body"),
        )
        fpath = f"{tmp}/{sf}_fielded"
        fielded_index(fdocs, ["title", "body"]).write.mode(
            "overwrite"
        ).parquet(fpath)
        fpost = spark.read.parquet(fpath)
        fstats = field_stats(fdocs, ["title", "body"]).localCheckpoint()
        fdfreq = fielded_term_stats(fpost).localCheckpoint()

        def bm25f():
            bm25f_topk(
                fpost, queries, fstats,
                weights={"title": 2.0, "body": 1.0},
                k=10, dfreq=fdfreq,
            ).count()

        bm25f_wall = best_of(3, bm25f)

        gdocs = docs.withColumn(
            "lang", F.pmod(F.col("doc_id"), F.lit(4)).cast("string")
        )
        gpath = f"{tmp}/{sf}_grouped"
        inverted_index(gdocs, group_col="lang").write.mode(
            "overwrite"
        ).parquet(gpath)
        gpost = spark.read.parquet(gpath)
        gstats = index_stats(gdocs, group_col="lang").localCheckpoint()
        gdfreq = term_stats(gpost, group_col="lang").localCheckpoint()
        gqueries = gdocs.filter(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            "lang",
            F.substring("text", 1, 40).alias("query"),
        ).localCheckpoint()

        def grouped():
            bm25_topk(
                gpost, gqueries, gstats, k=10, dfreq=gdfreq,
                group_col="lang",
            ).count()

        grouped_wall = best_of(3, grouped)

        # r14: best-window + snippet leg over score-ranked hits — the
        # claim is hits-sized work after the one positional scan (the
        # postings are cut to the top-k doc list BEFORE term matching)
        from datamunging_spark.operators.retrieval import (
            hit_windows,
            snippets,
        )

        ranked = bm25_topk(
            post, queries, stats, k=10, dfreq=dfreq
        ).localCheckpoint()

        def windows():
            snippets(
                docs, hit_windows(pos_post, ranked, queries), context=3
            ).count()

        win_wall = best_of(3, windows)

        # r14: grouped fielded face — should track the plain bm25f wall
        gfdocs = fdocs.withColumn(
            "lang", F.pmod(F.col("doc_id"), F.lit(4)).cast("string")
        )
        gfpath = f"{tmp}/{sf}_gfielded"
        fielded_index(
            gfdocs, ["title", "body"], group_col="lang"
        ).write.mode("overwrite").parquet(gfpath)
        gfpost = spark.read.parquet(gfpath)
        gffst = field_stats(
            gfdocs, ["title", "body"], group_col="lang"
        ).localCheckpoint()
        gfdfr = fielded_term_stats(
            gfpost, group_col="lang"
        ).localCheckpoint()
        gfq = gdocs.filter(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            "lang",
            F.substring("text", 1, 40).alias("query"),
        ).localCheckpoint()

        def gbm25f():
            bm25f_topk(
                gfpost, gfq, gffst,
                weights={"title": 2.0, "body": 1.0},
                k=10, dfreq=gfdfr, group_col="lang",
            ).count()

        gbm25f_wall = best_of(3, gbm25f)
        print(
            f"| {sf} | {n} | {n_post} | {build_wall:.2f} s "
            f"| {query_wall:.2f} s | {fold_wall:.2f} s "
            f"| {phrase_wall:.2f} s | {bool_wall:.2f} s "
            f"| {bool_pre_wall:.2f} s | {bm25f_wall:.2f} s "
            f"| {grouped_wall:.2f} s | {win_wall:.2f} s "
            f"| {gbm25f_wall:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
