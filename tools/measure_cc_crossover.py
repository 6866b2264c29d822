"""Measure the connected_component_labels driver/distributed crossover.

dedup.connected_component_labels switches on edge count: graphs at or
below ``driver_threshold`` (default 200k edges) are collected and labeled
with one driver-side union-find; larger graphs take the distributed
large-star/small-star rounds. This script times BOTH paths on the same
synthetic pair graphs around the threshold (50k-400k edges) so the 200k
default is a measured decision, not an assertion. Results land in
SCALE.md ("CC driver/distributed crossover").

Graph shape mirrors an LSH candidate-pair graph: ~80% isolated duplicate
pairs, ~19% 10-vertex near-dup clusters, plus one 2,000-vertex chain (the
adversarial diameter case star rounds exist for). Labels from the two
paths are cross-checked for equality at every size.

Usage: python tools/measure_cc_crossover.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from datamunging_spark import get_spark  # noqa: E402
from datamunging_spark.operators.dedup import (  # noqa: E402
    connected_component_labels,
)


def make_edges(spark, n_edges: int):
    """Deterministic pair graph with n_edges edges (see module docstring)."""
    chain_len = 2_000
    # stars: groups of 9 edges each (vertices base..base+9 all -> base)
    n_star_groups = (n_edges * 19 // 100) // 9
    n_pair = n_edges - (chain_len - 1) - 9 * n_star_groups
    pair_base = 0
    star_base = 10_000_000_000
    chain_base = 20_000_000_000
    pairs = spark.range(n_pair).select(
        (pair_base + F.col("id") * 2).alias("id_a"),
        (pair_base + F.col("id") * 2 + 1).alias("id_b"),
    )
    stars = spark.range(n_star_groups * 9).select(
        (
            star_base + (F.col("id") / 9).cast("long") * 10
            + F.col("id") % 9 + 1
        ).alias("id_a"),
        (star_base + (F.col("id") / 9).cast("long") * 10).alias("id_b"),
    )
    chain = spark.range(chain_len - 1).select(
        (chain_base + F.col("id")).alias("id_a"),
        (chain_base + F.col("id") + 1).alias("id_b"),
    )
    return pairs.union(stars).union(chain).localCheckpoint()


def label_checksum(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("v", "component").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("cc-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    sizes = [50_000, 100_000, 150_000, 200_000, 250_000, 300_000]
    print(f"{'edges':>8} {'driver_s':>9} {'star_s':>8} {'winner':>8}")
    for n in sizes:
        edges = make_edges(spark, n)
        edges.count()
        t_driver, t_star, sums = [], [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            d = connected_component_labels(edges, driver_threshold=10**12)
            s_d = label_checksum(d)
            t_driver.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            s = connected_component_labels(edges, driver_threshold=0)
            s_s = label_checksum(s)
            t_star.append(time.perf_counter() - t0)
            assert (s_d["n"], s_d["h"]) == (s_s["n"], s_s["h"]), (
                f"paths disagree at {n} edges: {s_d} vs {s_s}"
            )
        md, ms = statistics.median(t_driver), statistics.median(t_star)
        print(
            f"{n:>8} {md:>9.2f} {ms:>8.2f} "
            f"{'driver' if md < ms else 'star':>8}"
        )


if __name__ == "__main__":
    main()
