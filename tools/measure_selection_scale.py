"""Measure dsir_select's 10× scale shape (the composite-probe rule:
every composite gets a measured 10× row in SCALE.md).

Claims under test: the fitted/ratio tables are CONSTANT (16^hash_chars
rows regardless of corpus), and end-to-end wall grows ~linearly with
the corpus (two feature scans + bounded aggregates — no superlinear
join or sort anywhere).

Usage: python tools/measure_selection_scale.py [testdata_root]
(default /root/testdata; probes sf0.01 vs sf0.1 documents, best of 3)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from datamunging_spark.operators.selection import (  # noqa: E402
    dsir_fit,
    dsir_logratios,
    dsir_select,
    hashed_ngram_features,
)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("measure_selection_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print("| sf | docs | k | ratio-table rows | dsir_select wall (best of 3) |")
    print("|---|---|---|---|---|")
    # k scales with the corpus (10% at both legs) so the comparison
    # doesn't mix a degenerate select-all small leg with a real
    # selection at the big leg (r11 review catch)
    for sf, k in [("sf0.01", 50), ("sf0.1", 500)]:
        docs = spark.read.parquet(
            os.path.join(root, sf, "documents.parquet")
        ).select("doc_id", "source", "text")
        n = docs.count()
        target = docs.filter(
            F.col("source").isin("src0", "src1", "src2", "src3")
        )
        ratios = dsir_logratios(
            dsir_fit(hashed_ngram_features(target)),
            dsir_fit(hashed_ngram_features(docs)),
        )
        rt_rows = ratios.count()
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            dsir_select(docs, target, k=k, salt="probe").count()
            walls.append(time.perf_counter() - t0)
        print(f"| {sf} | {n:,} | {k} | {rt_rows:,} | {min(walls):.2f} s |")
    spark.stop()


if __name__ == "__main__":
    main()
