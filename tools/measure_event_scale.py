"""Measure the event-analytics family at 1x vs 10x events — the
SCALE.md probe for the contracts:

* funnel_report: ONE shuffle (per-user sorted-array fold) — linear in
  step-type events; the SQL formulation is k-1 self-joins, which would
  scale superlinearly in practice.
* cohort_retention: first-event agg + user-grain join — linear in
  events, with the join side bounded by |users|.
* interval_join: work = Σ spans/width + true matches. The replicated
  users keep the SAME time window, so every pair overlaps and the true
  match count grows ~100x at 10x users — the output-size floor any
  overlap join pays. Wall-time must track that output, not explode past
  it (the banding never builds a candidate set larger than the output
  + replication).
* hot-user valve (r7): a skewed table where ONE bot user holds 10% of
  all events. Valve-off funnel must still finish (collect_list spills),
  valve-on (max_events_per_user) must cut the bot's contribution to a
  constant; the probe prints both so the trade is measured, not assumed.

Usage: python tools/measure_event_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.relational import (
    cohort_retention,
    funnel_report,
    interval_join,
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


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("measure_events")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")

    print("| probe | rows out | best wall s |")
    print("|---|---|---|")
    for scale in (1, 10):
        e = ev
        if scale > 1:
            e = e.withColumn(
                "_k", F.explode(F.array(*[F.lit(i) for i in range(scale)]))
            ).select(
                (F.col("user_id") + F.col("_k") * 10_000_000).alias(
                    "user_id"
                ),
                "ts",
                "event_type",
            )
        e = e.localCheckpoint()

        timed(
            f"funnel 3-step {scale}x",
            lambda: funnel_report(
                e, "user_id", "ts", "event_type",
                ["view", "click", "purchase"],
            ).count(),
        )
        timed(
            f"cohort retention {scale}x",
            lambda: cohort_retention(e, "user_id", "ts", 7).count(),
        )
        spans = e.groupBy("user_id").agg(
            F.min(F.unix_timestamp("ts")).cast("double").alias("s"),
            (F.min(F.unix_timestamp("ts")) + 3600).cast("double").alias("t"),
        )
        a = spans.select(
            F.col("user_id").alias("a_uid"), F.col("s").alias("a_s"),
            F.col("t").alias("a_t"),
        )
        b = spans.select(
            F.col("user_id").alias("b_uid"), F.col("s").alias("b_s"),
            F.col("t").alias("b_t"),
        )
        timed(
            f"interval overlap self-join {scale}x users",
            lambda: interval_join(
                a, b, "a_s", "a_t", "b_s", "b_t", 1800
            ).count(),
        )

    # Skew probe: bot user = 10% of a 10x event table, all in one key.
    e10 = ev.withColumn(
        "_k", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    )
    bot = e10.filter(F.col("_k") == 0).select(
        F.lit(-1).alias("user_id"), "ts", "event_type"
    )
    skewed = (
        e10.select(
            (F.col("user_id") + F.col("_k") * 10_000_000).alias("user_id"),
            "ts",
            "event_type",
        )
        .unionByName(bot)
        .localCheckpoint()
    )
    steps = ["view", "click", "purchase"]
    timed(
        "funnel skewed 10x (bot=10%), valve off",
        lambda: funnel_report(
            skewed, "user_id", "ts", "event_type", steps
        ).count(),
    )
    timed(
        "funnel skewed 10x, max_events_per_user=1000",
        lambda: funnel_report(
            skewed, "user_id", "ts", "event_type", steps,
            max_events_per_user=1000,
        ).count(),
    )
    # hot bucket: every bot event becomes a 1h span in the same window
    bs = bot.select(
        F.unix_timestamp("ts").cast("double").alias("s"),
        (F.unix_timestamp("ts") + 3600).cast("double").alias("t"),
    ).localCheckpoint()
    bl = bs.select(F.col("s").alias("a_s"), F.col("t").alias("a_t"))
    br = bs.select(F.col("s").alias("b_s"), F.col("t").alias("b_t"))
    timed(
        "interval join bot spans, max_rows_per_bucket=200",
        lambda: interval_join(
            bl, br, "a_s", "a_t", "b_s", "b_t", 1800,
            max_rows_per_bucket=200,
        ).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
