"""Measure bpe_train_distributed's scale claim: the collected pretoken
frequency TABLE grows sublinearly with the corpus (Zipf), so the
driver-side greedy loop's input — and the bounded collect — stay small
while the corpus grows 100×.

Uses the operator's own ``pretoken_frequencies`` pass (one aggregation
per SF for both stats), then times the end-to-end distributed training
for a fixed n_merges. Record the table in SCALE.md next to the
token-counting probe — the printed shape matches the committed one.

Usage: python tools/measure_bpe_train_scale.py [testdata_root]
(default /root/testdata; probes sf0.001, sf0.01, sf0.1 under it)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from datamunging_spark.operators.bpe import (  # noqa: E402
    bpe_train_distributed,
    pretoken_frequencies,
)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("measure_bpe_train_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| sf | docs | pretoken occurrences | distinct pretokens | "
          "train(64 merges) wall |")
    print("|---|---|---|---|---|")
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        path = os.path.join(root, sf, "documents.parquet")
        df = spark.read.parquet(path).select("text")
        docs = df.count()
        stats = pretoken_frequencies(df).agg(
            F.sum("_f").alias("total"), F.count(F.lit(1)).alias("distinct")
        ).collect()[0]
        t0 = time.perf_counter()
        merges = bpe_train_distributed(df, n_merges=64)
        wall = time.perf_counter() - t0
        assert len(merges) == 64
        print(
            f"| {sf} | {docs:,} | {stats['total']:,} | "
            f"{stats['distinct']:,} | {wall:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
