"""Measure the history family (snapshot_diff / scd2_build /
apply_changelog) at 1x vs 10x input — the SCALE.md probe for the
family's contracts:

* snapshot_diff: each side collapses to (key, 128-bit digest) before its
  single full-outer join, so wall-time should be ~linear in rows and
  INDEPENDENT of row width — probed by diffing customer both slim
  (2 compare columns) and wide (all 6 non-key columns) at both scales.
* scd2_build: one exchange on the key; linear in total snapshot rows.
* apply_changelog: latest-wins window runs over the CHANGELOG only, so
  for a FIXED changelog, growing the base 10x should move wall-time by
  the base scan+join cost only (~linear), never by re-windowing the base.

Usage: python tools/measure_history_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.history import (
    apply_changelog,
    scd2_apply_snapshot,
    scd2_build,
    snapshot_diff,
)
from datamunging_spark.sources import load_table


def timed(label, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    print(f"| {label} | {n} | {best:.2f} |")


def replicate(df, id_col, copies):
    out = [
        df.withColumn(id_col, F.col(id_col) + F.lit(k * 10_000_000))
        for k in range(copies)
    ]
    r = out[0]
    for c in out[1:]:
        r = r.unionByName(c)
    return r


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("measure_history")
    spark.sparkContext.setLogLevel("ERROR")
    cust = load_table(spark, sf_dir, "customer")
    payload = [c for c in cust.columns if c != "c_custkey"]

    print("| probe | rows out | best wall s |")
    print("|---|---|---|")
    for scale in (1, 10):
        base = replicate(cust, "c_custkey", scale).localCheckpoint()
        mutated = base.withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 1.0
            ).otherwise(F.col("c_acctbal")),
        )

        timed(
            f"snapshot_diff slim (2 cols) {scale}x",
            lambda: snapshot_diff(
                base, mutated, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
            ).count(),
        )
        timed(
            f"snapshot_diff wide (all cols) {scale}x",
            lambda: snapshot_diff(
                base, mutated, ["c_custkey"], payload
            ).count(),
        )

        snaps = None
        for v in (1, 2, 3):
            s = base.select(
                "c_custkey",
                F.when(
                    (F.col("c_custkey") + v) % 7 == 0, F.lit("SHIFTED")
                ).otherwise(F.col("c_mktsegment")).alias("seg"),
                F.lit(v).alias("v"),
            )
            snaps = s if snaps is None else snaps.unionByName(s)
        timed(
            f"scd2_build 3 snapshots {scale}x",
            lambda: scd2_build(snaps, ["c_custkey"], ["seg"], "v").count(),
        )

        # FIXED changelog (built from the 1x id range) against a growing base
        changes = (
            cust.filter(F.col("c_custkey") % 7 == 0)
            .select(
                "c_custkey",
                *[
                    (F.lit("MOVED") if c == "c_mktsegment" else F.col(c)).alias(c)
                    for c in payload
                ],
                F.lit(1).alias("ver"),
                F.when(F.col("c_custkey") % 21 == 0, "delete")
                .otherwise("upsert")
                .alias("op"),
            )
            .localCheckpoint()
        )
        timed(
            f"apply_changelog fixed log, base {scale}x",
            lambda: apply_changelog(
                base, changes, ["c_custkey"], "ver", op_col="op"
            ).count(),
        )

        # incremental SCD-2 step: dim grown from the scaled base, one new
        # snapshot applied — cost must track open rows + snapshot, never
        # the closed history
        dim = scd2_build(
            snaps, ["c_custkey"], ["seg"], "v"
        ).localCheckpoint()
        snap4 = base.select(
            "c_custkey",
            F.when(
                (F.col("c_custkey") + 4) % 7 == 0, F.lit("SHIFTED")
            ).otherwise(F.col("c_mktsegment")).alias("seg"),
        )
        timed(
            f"scd2_apply_snapshot one step {scale}x",
            lambda: scd2_apply_snapshot(
                dim, snap4, ["c_custkey"], ["seg"], 4
            ).count(),
        )
    spark.stop()


if __name__ == "__main__":
    main()
