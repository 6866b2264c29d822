"""r15 vector-face probes for SCALE.md.

1. Refine leg: recall@10 vs exact dot-product ranking for plain ADC
   (ivf_pq_topk) and for refine_k ∈ {k, 2k, 5k} — the FAISS RefineFlat
   claim: a few × k of exact re-ranking recovers most of the
   quantization recall loss for ONE hits-sized broadcast join.
2. Grouped faces: wall time of ONE grouped ivf_build+search plan vs
   the sum of per-slice ungrouped runs (same fits by construction) —
   the grouped face must not price worse than the per-slice loop it
   replaces, and the single assignment pass should price better as
   groups grow.
3. Filtered ANN: rows returned by post-filter (under-fills) vs
   pre-filter (fills k) under a 10% predicate, plus wall time.

Usage: python tools/measure_r15_vector_faces.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.similarity import (
    ivf_build,
    ivf_pq_topk,
    ivf_search,
    pq_encode_cells,
    pq_fit,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("r15probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).localCheckpoint()
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 16).localCheckpoint()
    k = 10

    # exact dot-product reference
    mat = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    exact = {}
    for qr in queries.collect():
        qv = mat[qr["vec_id"]]
        ranked = sorted(
            ((float(qv @ v), -i) for i, v in mat.items() if i != qr["vec_id"]),
            reverse=True,
        )[:k]
        exact[qr["vec_id"]] = {-i for _, i in ranked}

    idx = ivf_build(emb, n_clusters=16)
    idx.assigned = idx.assigned.localCheckpoint()
    cb = pq_fit(emb, m=8, k=64, seed=5)
    cells = pq_encode_cells(idx, cb).localCheckpoint()

    def recall(hits):
        by_q: dict = {}
        for r in hits:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        tot = sum(len(by_q.get(q, set()) & exact[q]) for q in exact)
        return tot / (len(exact) * k)

    print(f"corpus n={n}, 16 queries, k={k}, n_probe=16 (all cells)")
    for refine in (None, k, 2 * k, 5 * k):
        t0 = time.perf_counter()
        hits = ivf_pq_topk(
            queries, idx, cb, cells, k=k, n_probe=16, refine_k=refine
        ).collect()
        dt = time.perf_counter() - t0
        print(
            f"refine_k={refine}: recall@10={recall(hits):.3f} "
            f"({dt:.2f}s)"
        )

    # grouped vs per-slice
    g = emb.withColumn(
        "grp",
        F.when(F.col("vec_id") % 3 == 0, "en")
        .when(F.col("vec_id") % 3 == 1, "fr")
        .otherwise(F.lit(None).cast("string")),
    ).localCheckpoint()
    gq = g.filter(F.col("vec_id") < 16)
    t0 = time.perf_counter()
    gidx = ivf_build(g, n_clusters=8, group_col="grp")
    n_g = ivf_search(gq, gidx, k=k, n_probe=4).count()
    t_grouped = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_s = 0
    for gval in ("en", "fr", None):
        cond = (
            F.col("grp").isNull() if gval is None else F.col("grp") == gval
        )
        uidx = ivf_build(g.filter(cond), n_clusters=8)
        n_s += ivf_search(
            gq.filter(cond), uidx, k=k, n_probe=4
        ).count()
    t_slices = time.perf_counter() - t0
    print(
        f"grouped build+search (3 groups, one plan): {t_grouped:.2f}s "
        f"({n_g} rows) vs per-slice loop {t_slices:.2f}s ({n_s} rows)"
    )

    # filtered ANN
    keep = emb.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    t0 = time.perf_counter()
    post_rows = (
        ivf_search(queries, idx, k=k, n_probe=4)
        .filter(F.col("neighbor_id") % 10 == 0)
        .count()
    )
    t_post = time.perf_counter() - t0
    t0 = time.perf_counter()
    pre_rows = ivf_search(
        queries, idx, k=k, n_probe=4, filter_ids=keep
    ).count()
    t_pre = time.perf_counter() - t0
    print(
        f"filtered ANN, 10% predicate: post-filter {post_rows} rows "
        f"({t_post:.2f}s) vs pre-filter {pre_rows} rows ({t_pre:.2f}s) "
        f"— contract k·queries = {k * 16}"
    )


if __name__ == "__main__":
    main()
