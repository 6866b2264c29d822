"""Measure heavy_hitters (Misra-Gries) vs the exact groupBy as the
distinct-key count grows (SCALE.md probe).

The design claim of operators/sketch.py is that the sketch's shuffle is
bounded at partitions × (k+2) counter rows no matter how many distinct
keys the column carries, while the exact aggregate must shuffle (a
partial-aggregate row for) every distinct key per partition — so the
exact path's cost grows with the key space and the sketch's does not.

Method: N_heavy = 20 planted heavy keys (1% of rows each) over a
uniform tail of D distinct keys, D in {1e5, 1e6, 4e6, 1.6e7}, total
rows 4 × D, 32 partitions, generator left lazy (both paths recompute
the same codegen expression; materializing 64M rows makes the probe
about storage). Time heavy_hitters_exact(min_share=0.005) vs
heavy_hitters(k=1024, min_share=0.005), median of 3 (collect() both —
the result sets are tiny). Assert on every run: sketch ⊇ planted AND
exact heavy values, and count brackets hold (the guarantee is
re-verified at each scale, not assumed). The exact path is allowed to
fail — under memory pressure it dies with AGGREGATE_OUT_OF_MEMORY at
the 12.8M-key point (observed when run concurrently with another
Spark job), which is reported as a table cell because that structural
failure mode, not local wall, is the sketch's argument. Report wall
plus the shuffle-side row count of each path: distinct keys for
exact, ≤ partitions × (k+2) for the sketch.

Output: markdown rows for SCALE.md.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.sketch import heavy_hitters, heavy_hitters_exact

K = 1024
MIN_SHARE = 0.005
PARTS = 32


def make_data(spark, distinct_tail: int):
    """20 heavy keys at ~1% of rows each (80% of mass in the tail).
    Deterministic (seeded id math, no rand())."""
    total = 4 * distinct_tail
    base = spark.range(0, total, 1, PARTS)
    # ~20% of rows -> one of 20 heavy keys; rest -> unique-ish tail key
    df = base.select(
        F.when(
            (F.col("id") % 5) == 0,
            F.concat(F.lit("heavy_"), (F.col("id") / 5).cast("long") % 20),
        )
        .otherwise(F.concat(F.lit("tail_"), F.col("id") % distinct_tail))
        .alias("value")
    )
    # deliberately NOT materialized: the generator is a cheap codegen
    # expression over range(), recomputed identically inside both timed
    # paths (a localCheckpoint of 64M rows OOMs the block manager and
    # would make the probe about storage, not aggregation)
    return df, total


def bench(fn, reps=3):
    samples = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), out


def main():
    spark = get_spark("measure_sketch_scale")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + Arrow path so the first row isn't a cold outlier
    warm, _ = make_data(spark, 10_000)
    heavy_hitters_exact(warm, "value", MIN_SHARE).collect()
    heavy_hitters(warm, "value", k=K, min_share=MIN_SHARE).collect()
    print("| distinct keys | rows | exact wall (s) | sketch wall (s) | exact shuffle keys | sketch summary rows |")
    print("|---|---|---|---|---|---|")
    for d in (100_000, 1_000_000, 4_000_000, 16_000_000):
        df, total = make_data(spark, d)
        # the exact path is EXPECTED to fall over once the distinct-key
        # aggregate outgrows task memory — that failure mode is the
        # probe's point, so report it instead of crashing
        try:
            exact_wall, exact_rows = bench(
                lambda: heavy_hitters_exact(df, "value", MIN_SHARE).collect()
            )
            exact_cell = f"{exact_wall:.2f}"
        except Exception as e:  # SparkOutOfMemoryError via Py4JJavaError
            exact_rows = None
            exact_cell = (
                "**OOM**" if "OUT_OF_MEMORY" in str(e) else "**FAIL**"
            )
        sketch_wall, sketch_rows = bench(
            lambda: heavy_hitters(df, "value", k=K, min_share=MIN_SHARE).collect()
        )
        sk = {r.value: r for r in sketch_rows}
        # planted ground truth: 20 heavy keys at exactly total/100 rows
        planted = {f"heavy_{i}": total // 100 for i in range(20)}
        assert set(planted) <= set(sk), (
            f"sketch missed planted heavy hitters at D={d}: "
            f"{set(planted) - set(sk)}"
        )
        for v, f_true in planted.items():
            r = sk[v]
            assert r.count_lo <= f_true <= r.count_hi, (v, r, f_true)
        if exact_rows is not None:
            exact_vals = {r.value for r in exact_rows}
            assert exact_vals <= set(sk)
            for r in exact_rows:
                assert sk[r.value].count_lo <= r["count"] <= sk[r.value].count_hi
        # tail residues ≡ 0 (mod 5) never occur (those ids are heavy):
        # distinct tail keys = 0.8·d exactly, plus the 20 heavy keys
        n_distinct = int(0.8 * d) + 20
        print(
            f"| {d:,} tail | {total:,} | {exact_cell} | {sketch_wall:.2f} "
            f"| ~{n_distinct:,} | ≤ {PARTS * (K + 2):,} |"
        )


if __name__ == "__main__":
    main()
