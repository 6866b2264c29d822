"""Measure incremental-SemDeDup cost vs HISTORY size (SCALE.md probe).

The design claim of dedup.incremental_semantic_dedup mirrors the other
incremental families: per-batch cost tracks BATCH size, not history
size. The batch pays ONE frozen-centroid assignment pass (no KMeans
fit — the ~36-of-53-jobs cost of the batch path per the x1_semantic_dedup
audit) and one cell equi-join whose history side is the snapshot's
cell-partitioned assigned table. Growing history 10x while holding the
batch fixed should move wall by the extra join-scan only, nowhere near
10x — and the incremental call should beat re-running the fused
semantic_dedup over history+batch (which refits KMeans every call) by
a widening margin as history grows.

Method: embeddings at sf0.1 replicated K times with shifted ids and a
deterministic per-replica component jitter forms the history (K in
{1, 10}); the snapshot is built once per K (fit amortized — its cost is
reported separately). The batch is a FIXED 500-vector slice with
disjoint ids: 100 near-copies of history vectors (dropped by the
history pass) + 400 reversed-component vectors (genuinely new). Timing
covers incremental_semantic_dedup end-to-end per batch, median of 3.

Output: markdown rows for SCALE.md.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.dedup import (
    incremental_semantic_dedup,
    semantic_dedup,
    semantic_snapshot,
)
from datamunging_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.1"
REPS = 3


def main() -> None:
    spark = get_spark("semantic-scale")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()

    batch = (
        emb.filter(F.col("vec_id") < 500)
        .select(
            (F.col("vec_id") + 90_000_000).alias("vec_id"),
            F.when(
                F.col("vec_id") < 100,
                F.transform(
                    "embedding", lambda x: x * F.lit(1.0) + F.lit(1e-4)
                ),
            )
            .otherwise(F.reverse(F.col("embedding")))
            .alias("embedding"),
        )
        .localCheckpoint()
    )

    print(
        "| history K | hist rows | snapshot fit (s) | incremental batch "
        "(s, median of 3) | survivors | fused semantic_dedup(hist+batch) "
        "(s) |"
    )
    print("|---|---|---|---|---|---|")
    for k in (1, 10):
        hist = emb
        for r in range(1, k):
            hist = hist.unionByName(
                emb.select(
                    (F.col("vec_id") + r * n).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x: x + F.lit(1e-3) * F.lit(float(r)),
                    ).alias("embedding"),
                )
            )
        hist = hist.localCheckpoint()
        h_rows = hist.count()
        t0 = time.perf_counter()
        # clusters sized to history per the SemDeDup ratio contract
        snap = semantic_snapshot(
            hist, id_col="vec_id", n_clusters=16 * k
        )
        fit_s = time.perf_counter() - t0
        walls, surv = [], None
        for _ in range(REPS + 1):  # first run warms, not recorded
            t0 = time.perf_counter()
            out = incremental_semantic_dedup(
                batch, snap, id_col="vec_id", threshold=0.999
            )
            surv = out.count()
            walls.append(time.perf_counter() - t0)
        inc_s = statistics.median(walls[1:])
        t0 = time.perf_counter()
        semantic_dedup(
            hist.unionByName(batch),
            id_col="vec_id",
            threshold=0.999,
            n_clusters=16 * k,
        ).count()
        fused_s = time.perf_counter() - t0
        print(
            f"| {k} | {h_rows} | {fit_s:.2f} | {inc_s:.2f} | {surv} "
            f"| {fused_s:.2f} |"
        )


if __name__ == "__main__":
    main()
