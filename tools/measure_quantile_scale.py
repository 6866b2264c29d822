"""Measure quantiles_sketch (MRL/KLL compactors) vs Spark's exact
`percentile` and one-shot `percentile_approx` as the column grows
(SCALE.md probe — the rank/quantile sibling of measure_sketch_scale).

The design claims of operators/sketch.py's quantile family:

- the sketch's exchange carries SUMMARIES (≤ partitions × k × L rows),
  never the data column, while Spark's exact `percentile` aggregate
  buffers every value of the group in executor memory (an OOM class as
  the group grows — the same structural failure mode the MG probe
  caught on the exact heavy-hitter path);
- `percentile_approx` (Spark's built-in GK) is the right ONE-SHOT
  approximate answer but its state is not exposed: nothing to persist,
  merge across batches, or fold into the versioned store — the
  mergeable summary is what `streaming_quantiles` / incremental
  profiles actually need;
- the carried rank-error budget is honest: at every scale the probe
  re-verifies |est_rank − true count ≤ value| ≤ max_rank_err by exact
  recount (the guarantee is re-proved at each size, not assumed).

Method: N doubles in {4M, 16M, 64M}, 32 partitions, deterministic
skewed generator (id math, no rand(): two dense value clusters + a
long sparse tail — lumpy mass is the hard case for rank sketches).
Time median-of-3: exact `percentile(x, 0.5)`, `percentile_approx(x,
0.5, 10000)`, `quantiles_sketch(k=4096)` at qs=(0.25, 0.5, 0.99).
The bracket re-count runs untimed after each sketch rep.

Output: markdown rows for SCALE.md.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.sketch import (
    quantile_report,
    quantile_summary,
)

K = 4096
PARTS = 32
QS = [0.25, 0.5, 0.99]


def make_data(spark, n: int):
    """Two dense clusters + sparse tail, deterministic."""
    base = spark.range(0, n, 1, PARTS)
    return base.select(
        F.when((F.col("id") % 10) < 4, (F.col("id") % 50).cast("double"))
        .when(
            (F.col("id") % 10) < 8,
            (F.lit(1000.0) + (F.col("id") % 25)).cast("double"),
        )
        .otherwise((F.lit(1e6) + F.col("id")).cast("double"))
        .alias("x")
    )


def timed(fn, reps=3):
    walls = []
    out = None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        walls.append(time.monotonic() - t0)
    return statistics.median(walls), out


def main():
    spark = get_spark("quantile-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print("| rows | exact percentile (s) | percentile_approx (s) | "
          "sketch summary+report (s) | summary rows | max_rank_err / n |")
    print("|---|---|---|---|---|---|")
    for n in (4_000_000, 16_000_000, 64_000_000):
        df = make_data(spark, n)

        def exact():
            return df.agg(F.expr("percentile(x, 0.5)")).collect()[0][0]

        def approx():
            return df.agg(
                F.expr("percentile_approx(x, 0.5, 10000)")
            ).collect()[0][0]

        def sketch():
            s = quantile_summary(df, "x", k=K)
            rows = quantile_report(s, QS).collect()
            return s, rows

        try:
            w_exact, _ = timed(exact)
            exact_cell = f"{w_exact:.2f}"
        except Exception as e:  # noqa: BLE001 — the failure IS the result
            exact_cell = type(e).__name__
        w_approx, _ = timed(approx)
        w_sketch, (s, rows) = timed(sketch)
        # untimed: re-prove the bracket at this scale by exact recount
        for r in rows:
            true_le = df.filter(F.col("x") <= r.value).count()
            assert abs(r.est_rank - true_le) <= r.max_rank_err, (
                n, r.q, r.value, r.est_rank, true_le, r.max_rank_err)
            assert r.n_total == n
        srows = s.count()
        err = rows[0].max_rank_err
        print(
            f"| {n//1_000_000}M | {exact_cell} | {w_approx:.2f} | "
            f"{w_sketch:.2f} | {srows} | {err / n:.5f} |"
        )


if __name__ == "__main__":
    main()
