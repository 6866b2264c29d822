"""Measure entity resolution at 1x vs 10x records — the SCALE.md probe for
the blocking contract: candidate-pair volume is Σ_block |block|², so the
published rule is "grow the block-key space with the corpus" (same shape
as SemDeDup's grow-n_clusters rule). Probe three points:

* 1x records, 1,000 blocks — baseline;
* 10x records, 1,000 blocks (**anti-pattern**: blocks 10x fatter →
  ~100x pairs);
* 10x records, 10,000 blocks (**contract**: constant block size →
  ~10x pairs).

Records are the gate query's three-variant construction (base name,
'Cust #' rewrite, ' Inc.' suffix), rebuilt from replicated customer keys
so every replica keeps the digit structure the blocking key hashes.

Usage: python tools/measure_entity_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.entity import name_similarity, resolve_entities
from datamunging_spark.sources import load_tables


def records(customer, copies):
    reps = []
    for k in range(copies):
        reps.append(
            customer.select(
                (F.col("c_custkey") + F.lit(k * 1_000_000)).alias("ck")
            )
        )
    keys = reps[0]
    for r in reps[1:]:
        keys = keys.unionByName(r)
    base = keys.select(
        F.col("ck").cast("bigint").alias("rid"),
        F.format_string("Customer#%09d", F.col("ck")).alias("name"),
    )
    var_a = keys.select(
        (F.col("ck") + 100_000_000).cast("bigint").alias("rid"),
        F.format_string("Cust #%09d", F.col("ck")).alias("name"),
    )
    var_b = keys.filter(F.col("ck") % 10 == 0).select(
        (F.col("ck") + 200_000_000).cast("bigint").alias("rid"),
        F.format_string("Customer#%09d Inc.", F.col("ck")).alias("name"),
    )
    return base.unionByName(var_a).unionByName(var_b)


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    print(f"| {label} | {n} | {best:.2f} |")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("entity-scale")
    spark.sparkContext.setLogLevel("ERROR")
    customer = load_tables(spark, sf_dir)["customer"]
    digits = F.regexp_extract("name", "([0-9]+)", 1).cast("bigint")
    pair_digits_equal = (
        F.regexp_extract("a_name", "([0-9]+)", 1).cast("bigint")
        == F.regexp_extract("b_name", "([0-9]+)", 1).cast("bigint")
    )

    from datamunging_spark.operators.entity import blocked_pairs

    def run(copies, blocks):
        recs = records(customer, copies).localCheckpoint()
        n_pairs = blocked_pairs(
            recs, "rid", digits % blocks, ["name"], max_block=None
        ).count()

        def go():
            return resolve_entities(
                recs,
                "rid",
                block_key=digits % blocks,
                payload=["name"],
                match_cond=pair_digits_equal
                & (name_similarity("a_name", "b_name") >= 0.5),
                max_block=None,
            ).count()

        return n_pairs, go

    print("| probe | candidate pairs | rows out | best wall (s) |")
    print("|---|---|---|---|")
    for label, copies, blocks in [
        ("resolve 1x records, 1,000 blocks", 1, 1_000),
        ("resolve 10x records, 1,000 blocks (anti-pattern)", 10, 1_000),
        ("resolve 10x records, 10,000 blocks (contract)", 10, 10_000),
    ]:
        n_pairs, go = run(copies, blocks)
        timed(f"{label} | {n_pairs:,}", go)
    spark.stop()


if __name__ == "__main__":
    main()
