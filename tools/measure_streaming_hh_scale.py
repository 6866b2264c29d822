"""Measure streaming_heavy_hitters per-batch cost vs stream age
(SCALE.md probe).

The design claim: the stored state is a Misra-Gries summary re-bounded
to ≤ k counter rows at every fold, so batch N costs batch-scan +
O(k) merge no matter how many batches preceded it — unlike the naive
"keep all counts" stream aggregate whose state (and per-batch merge)
grows with the cumulative distinct-key count.

Method: 12 micro-batches of 50k rows each (3 stable heavy keys at 10%
each + ~35k fresh distinct tail keys PER BATCH, so cumulative distinct
keys grow ~35k per batch while the stored summary stays ≤ k=256 rows).
availableNow drains one batch at a time (maxFilesPerTrigger=1 over
files landed incrementally); wall measured per drain. Expect the last
batches to cost ≈ the first (no growth trend); also verify at the end
that the report still brackets the true totals of the 3 stable keys
across the WHOLE stream and that the stored version directory holds
≤ k + 2 rows.

Output: markdown rows for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.sketch import hh_report
from datamunging_spark.sources.versioned import read_table_version
from datamunging_spark.streaming import streaming_heavy_hitters

K = 256
BATCH_ROWS = 50_000
N_BATCHES = 12


def main():
    spark = get_spark("measure_streaming_hh")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="hh_stream_")
    src = f"{work}/feed"
    os.makedirs(src, exist_ok=True)
    table = f"{work}/hh_table"
    ckpt = f"{work}/ckpt"

    def land_batch(i: int):
        base = spark.range(0, BATCH_ROWS, 1, 8)
        df = base.select(
            F.when(
                (F.col("id") % 10) < 3,
                F.concat(F.lit("heavy_"), F.col("id") % 10),
            )
            .otherwise(
                F.concat(F.lit(f"tail_{i}_"), F.col("id"))
            )
            .alias("value")
        )
        df.write.parquet(f"{src}/b{i:03d}")

    def drain():
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", 100)  # one landed dir per drain
            .parquet(src + "/*")
        )
        return streaming_heavy_hitters(
            stream, "value", table, k=K, checkpoint_path=ckpt, keep_last=2
        )

    print("| batch | cumulative distinct keys (approx) | drain wall (s) |")
    print("|---|---|---|")
    walls = []
    for i in range(N_BATCHES):
        land_batch(i)
        t0 = time.perf_counter()
        drain()
        w = time.perf_counter() - t0
        walls.append(w)
        cum = 3 + (i + 1) * int(BATCH_ROWS * 0.7)
        print(f"| {i + 1} | ~{cum:,} | {w:.2f} |")
    head = sum(walls[1:4]) / 3
    tail = sum(walls[-3:]) / 3
    print(f"\nhead mean (batches 2-4): {head:.2f} s; "
          f"tail mean (batches 10-12): {tail:.2f} s; ratio {tail / head:.2f}")
    state = read_table_version(spark, table)
    n_rows = state.count()
    assert n_rows <= K + 2, f"stored summary grew past k: {n_rows}"
    rep = {r.value: r for r in hh_report(state, min_share=0.01).collect()}
    true_heavy = N_BATCHES * BATCH_ROWS * 0.1
    for i in range(3):
        r = rep[f"heavy_{i}"]
        assert r.count_lo <= true_heavy <= r.count_hi, (r, true_heavy)
    print(f"stored summary rows: {n_rows} (≤ {K + 2}); 3 stable heavies "
          f"bracket their true {int(true_heavy):,} counts across all "
          f"{N_BATCHES} batches")


if __name__ == "__main__":
    main()
