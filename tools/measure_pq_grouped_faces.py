"""Late-r15 probe: grouped + filtered faces of the FLAT-SCAN quantized
tier (pq_topk) for SCALE.md.

1. Grouped scan: ONE grouped pq_topk plan (3 groups incl. NULL, the
   batch kernel partitioned by pd.factorize masks) vs the sum of
   per-slice ungrouped runs — results are identical by construction
   (same GLOBAL codebook, same LUT reduction), so the question is
   purely price: the grouped face scans the codes table ONCE where the
   loop pays one filtered scan per group.
2. Filtered scan: filter_ids semi-join BEFORE the kernel vs a naive
   post-filter of the unfiltered top-k (row counts show the contract:
   pre-filter fills k, post-filter under-fills).

Usage: python tools/measure_pq_grouped_faces.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.similarity import (
    pq_encode,
    pq_fit,
    pq_topk,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pqgroupedprobe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        .withColumn(
            "grp",
            F.when(F.col("vec_id") % 3 == 0, "a")
            .when(F.col("vec_id") % 3 == 1, "b")
            .otherwise(F.lit(None).cast("string")),
        )
        .localCheckpoint()
    )
    n = emb.count()
    k = 10
    cb = pq_fit(emb, m=8, k=64, iters=5, max_fit_rows=2000, seed=7)
    enc = pq_encode(emb, cb, group_col="grp").localCheckpoint()
    queries = emb.filter(F.col("vec_id") < 18).localCheckpoint()

    def timed(label, fn, reps=3):
        best = float("inf")
        rows = None
        for _ in range(reps):
            t0 = time.time()
            rows = fn()
            best = min(best, time.time() - t0)
        print(f"{label:34s} {best:6.2f}s  rows={rows}")
        return best

    print(f"corpus={n} vectors, 3 groups (incl. NULL), {k=}, m=8")
    timed(
        "grouped pq_topk (one plan)",
        lambda: len(
            pq_topk(queries, enc, cb, k=k, group_col="grp").collect()
        ),
    )

    def per_slice():
        total = 0
        for gval in ("a", "b", None):
            cond = (
                F.col("grp").isNull()
                if gval is None
                else F.col("grp") == gval
            )
            total += len(
                pq_topk(
                    queries.filter(cond),
                    enc.filter(cond).drop("grp"),
                    cb,
                    k=k,
                ).collect()
            )
        return total

    timed("per-slice loop (3 ungrouped runs)", per_slice)

    # filtered face: 10% predicate
    flt = emb.filter(F.col("vec_id") % 10 == 0).select("grp", "vec_id")
    timed(
        "filter_ids pre-filter (fills k)",
        lambda: len(
            pq_topk(
                queries, enc, cb, k=k, group_col="grp", filter_ids=flt
            ).collect()
        ),
    )
    allowed = {
        (r["grp"], r["vec_id"]) for r in flt.collect()
    }
    timed(
        "naive post-filter (under-fills)",
        lambda: len(
            [
                r
                for r in pq_topk(
                    queries, enc, cb, k=k, group_col="grp"
                ).collect()
                if (r["grp"], r["neighbor_id"]) in allowed
            ]
        ),
    )


if __name__ == "__main__":
    main()
