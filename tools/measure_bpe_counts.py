"""r11 BPE-tier probe: budget accuracy + throughput of the three token
counting tiers on the documents table.

Compares, per tier: total corpus tokens, relative deviation vs the
byte-level BPE fixture counts (the 'real tokenizer' stand-in), and wall
for one full-corpus count — quantifying what a regex-budgeted pipeline
mis-budgets by and what the Arrow BPE pass costs over the JVM regex.

Usage: python tools/measure_bpe_counts.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.functions import bpe_ish_token_count, token_count
from datamunging_spark.operators.bpe import (
    bpe_token_counter,
    load_fixture_merges,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text"
    ).localCheckpoint()
    n_docs = docs.count()
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    counter = bpe_token_counter(spark, load_fixture_merges())
    tiers = {
        "whitespace (token_count)": token_count("text"),
        "regex estimate (bpe_ish)": bpe_ish_token_count("text"),
        "byte-BPE fixture (Arrow)": counter("text"),
    }
    totals, walls = {}, {}
    for name, col in tiers.items():
        t0 = time.perf_counter()
        totals[name] = docs.agg(
            F.sum(col).cast("long")
        ).collect()[0][0]
        walls[name] = time.perf_counter() - t0
    ref = totals["byte-BPE fixture (Arrow)"]
    print(f"{n_docs:,} docs, {n_chars:,} chars ({sf_dir})")
    print("| tier | total tokens | vs BPE | wall (s) | Mchars/s |")
    print("|---|---|---|---|---|")
    for name in tiers:
        t = totals[name]
        print(
            f"| {name} | {t:,} | {t / ref:.1%} of BPE | "
            f"{walls[name]:.2f} | "
            f"{n_chars / walls[name] / 1e6:.1f} |"
        )


if __name__ == "__main__":
    main()
