"""Measure IVF advance cost vs HISTORY size (SCALE.md probe).

The design claim of advance_ivf_index / streaming_ivf_ingest is that
per-batch cost tracks BATCH size, not accumulated index size: the batch
is assigned to the FROZEN centroids in one Arrow pass (no per-batch
KMeans fit — the dominant cost of a rebuild), history participates only
as the stored inverted-list table touched by one anti-join scan side
(replace mode) or not at all (append mode), and the delta-log store
writes O(batch) rows per fold. If the claim holds, growing the history
10x while holding the batch fixed should move per-fold wall time by the
anti-join's extra scan cost only, nowhere near 10x — and the full
REBUILD cost (the alternative the advance face exists to avoid) should
scale with the corpus.

Method: embeddings at sf0.1 replicated K times with shifted ids form
the history (K in {1, 10}); the index is built once per K (timed, as
the rebuild comparator); the batch is a FIXED 500-vector slice with
fresh ids, 10% of which REPLACE history vectors (so the anti-join does
real work). Timing covers advance_ivf_index end-to-end (assignment +
drift valve + union materialized via count), median of 3. A second
column times the delta write (what one streaming fold persists).

Output: markdown rows for SCALE.md.
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.similarity import (
    advance_ivf_index,
    ivf_build,
)
from datamunging_spark.sources.io import load_table

BATCH_N = 500
REPS = 3


def main() -> None:
    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    )
    spark = get_spark("ivf-advance-scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_emb = emb.count()

    # fixed batch: 450 fresh vectors (shifted ids) + 50 replacements of
    # history ids (the anti-join must do real work)
    fresh = (
        emb.filter(F.col("vec_id") < 450)
        .withColumn("vec_id", F.col("vec_id") + 10_000_000)
    )
    repl = emb.filter(F.col("vec_id").between(450, 499)).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.99)).alias(
            "embedding"
        ),
    )
    batch = fresh.unionByName(repl).localCheckpoint()
    assert batch.count() == BATCH_N

    print(
        "| history vectors | rebuild ivf_build (s) | advance median (s)"
        " | spread | delta write (s) |"
    )
    print("|---|---|---|---|---|")
    for k in (1, 10):
        hist = emb
        for i in range(1, k):
            hist = hist.union(
                emb.withColumn("vec_id", F.col("vec_id") + i * 1_000_000)
            )
        t0 = time.perf_counter()
        idx = ivf_build(hist, n_clusters=32)
        idx.assigned = idx.assigned.localCheckpoint()
        idx.assigned.count()
        build = time.perf_counter() - t0
        samples = []
        adv = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            adv = advance_ivf_index(idx, batch, replace_ids=True)
            adv.assigned.count()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        # what ONE streaming fold persists: the batch's assigned delta
        # (write volume O(batch), independent of history)
        from datamunging_spark.operators.similarity import _assign_frozen

        delta = _assign_frozen(
            idx, batch, "vec_id", "embedding", None
        ).select("neighbor_id", "_cv", "_cell")
        with tempfile.TemporaryDirectory() as td:
            t0 = time.perf_counter()
            delta.write.mode("overwrite").parquet(f"{td}/d")
            dwrite = time.perf_counter() - t0
        print(
            f"| {k * n_emb:,} | {build:.1f} | {med:.2f} | "
            f"[{min(samples):.2f}, {max(samples):.2f}] | {dwrite:.2f} |"
        )


if __name__ == "__main__":
    main()
