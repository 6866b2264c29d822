"""Measure the streaming index store's delta-log claim (r13): a fold
persists only the batch's increment, so per-fold wall/write cost stays
flat as the index grows — against the pre-r13 degenerate mode
(keep_last=1, which forces a full base rewrite every fold, exactly the
old rewrite-per-version behavior).

Protocol: the sf documents corpus split into 8 equal batches, streamed
one batch per drain (files appear incrementally; each drain folds one
micro-batch). Modes:

- delta:   keep_last=8, base_every=64 → cadence 8: fold 1 writes the
           base, folds 2-8 write batch-sized deltas.
- rewrite: keep_last=1 → cadence 1: every fold compacts a full base
           (the r12-and-earlier cost shape).

Reported per fold: drain wall and the bytes of the newly committed
version directory (postings + stats — measured directly per version,
immune to vacuum). Then the read side: read_index_version
reconstruction wall for the delta store's head (base + 7 delta folds)
vs the rewrite store's head (plain read) — the lineage cost the base
cadence bounds.

Usage: python tools/measure_index_ingest_scale.py [sf_dir]
(default /root/testdata/sf0.1)
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("measure_index_ingest_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datamunging_spark.streaming import (
        read_index_version,
        streaming_index_ingest,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    n = docs.count()
    n_batches = 8
    bounds = [round(i * n / n_batches) for i in range(n_batches + 1)]
    tmp = tempfile.mkdtemp(prefix="idx_ingest_scale_")

    results = {}
    for mode, kw in (
        ("delta", dict(keep_last=8, base_every=64)),
        ("rewrite", dict(keep_last=1)),
    ):
        src = f"{tmp}/{mode}_src"
        table = f"{tmp}/{mode}_tbl"
        ckpt = f"{tmp}/{mode}_ckpt"
        os.makedirs(src)
        walls, sizes = [], []
        for i in range(n_batches):
            docs.filter(
                (F.col("doc_id") >= bounds[i])
                & (F.col("doc_id") < bounds[i + 1])
            ).coalesce(1).write.parquet(f"{src}/b{i}")
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src + "/*")
            )
            t0 = time.perf_counter()
            v = streaming_index_ingest(
                stream, table, checkpoint_path=ckpt, **kw
            )
            walls.append(time.perf_counter() - t0)
            # bytes this fold WROTE = the newly committed version
            # directories (postings + stats), measured directly —
            # immune to vacuum shrinking the store mid-run
            sizes.append(
                dir_bytes(f"{table}/v{v}")
                + dir_bytes(f"{table}_stats/v{v}")
            )
        t0 = time.perf_counter()
        rows = read_index_version(spark, table).count()
        read_wall = time.perf_counter() - t0
        results[mode] = (walls, sizes, read_wall, rows)
        print(
            f"| {mode} | "
            + " ".join(f"{w:.2f}" for w in walls)
            + " | "
            + " ".join(f"{s // 1024}K" for s in sizes)
            + f" | head read {read_wall:.2f} s ({rows} postings) |"
        )

    dw, rw = results["delta"][0], results["rewrite"][0]
    print(
        f"fold 2→8 wall growth: delta {dw[1]:.2f}→{dw[7]:.2f} s, "
        f"rewrite {rw[1]:.2f}→{rw[7]:.2f} s"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
