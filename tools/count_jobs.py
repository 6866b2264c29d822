"""Count the Spark JOBS (actions) each heavy composite runs — the number
the materialize-once audit (SCALE.md) optimizes, measured instead of
inferred. Local mode pays ~0.3-0.5 s fixed cost per job, so composite
wall-time ≈ jobs × overhead + real work; cutting redundant jobs was the
round-6 perf lever.

Method: statusTracker job-id set difference around one cold build+count
of each query (includes the eager localCheckpoint jobs that query
construction runs). NB: with AQE enabled every materialized query STAGE
is submitted as its own job, so the count ≈ scheduled stages — which is
the right unit anyway: each carries the local fixed overhead, and each
would be a real stage boundary on a cluster.

Usage: python tools/count_jobs.py [sf_dir] [query ...]
(default /root/testdata/sf0.1, all QUERIES)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from datamunging_spark import get_spark

QUERIES = [
    "x1_incremental_dedup",
    "x1_ingest_cycle",
    "x1_incremental_span",
    "x_curation_full",
    "x1_minhash_pairs",
    "x1_paragraph_dedup",
    "x1_semantic_dedup",
    "x2_pq_topk",
    "x4_lm_quality",
    # r9 additions
    "x1_strip_boilerplate",
    "x4_lang_model",
    "x8_quantiles",
    # r11 addition (grouped sketch faces)
    "x8_grouped_sketch",
    # r12 additions (portable minhash tier, phash dedup, two-tier budget)
    "x1_minhash_portable",
    "x3_phash_neardup",
    "x5_token_budget",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]
    spark = get_spark("job-count")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    entrymod.q_r13_count(spark, sf_dir).count()  # warm
    print("| query | jobs | wall (s) |")
    print("|---|---|---|")
    for name in (only or QUERIES):
        fn = getattr(entrymod, f"q_{name}")
        before = set(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        jobs = len(set(tracker.getJobIdsForGroup(None)) - before)
        print(f"| {name} | {jobs} | {wall:.2f} |")


if __name__ == "__main__":
    main()
