"""Measure bpe_train_distributed's scale claim: the collected pretoken
frequency TABLE grows sublinearly with the corpus (Zipf), so the
driver-side greedy loop's input — and the bounded collect — stay small
while the corpus grows 100×.

Runs the distributed pretoken aggregation (the trainer's only corpus
pass) over the documents table at sf0.001 / sf0.01 / sf0.1 and prints
corpus rows, total pretoken occurrences, and DISTINCT pretokens, plus
the end-to-end distributed-training wall for a fixed n_merges at each
SF. Record the table in SCALE.md next to the token-counting probe.

Usage: python tools/measure_bpe_train_scale.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from datamunging_spark.functions import BPE_ISH_PATTERN  # noqa: E402
from datamunging_spark.operators.bpe import bpe_train_distributed  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("measure_bpe_train_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| sf | docs | pretoken occurrences | distinct pretokens | "
          "distinct/occurrence | train(64 merges) wall |")
    print("|---|---|---|---|---|---|")
    for sf in ["sf0.001", "sf0.01", "sf0.1"]:
        path = f"/root/testdata/{sf}/documents.parquet"
        df = spark.read.parquet(path).select("text")
        docs = df.count()
        pts = df.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
            ).alias("_pt")
        )
        total = pts.count()
        distinct = pts.distinct().count()
        t0 = time.perf_counter()
        merges = bpe_train_distributed(df, n_merges=64)
        wall = time.perf_counter() - t0
        assert len(merges) == 64
        print(
            f"| {sf} | {docs:,} | {total:,} | {distinct:,} | "
            f"{distinct / max(total, 1):.4f} | {wall:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
