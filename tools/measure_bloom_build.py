"""r10 bloom shuffle-build probe: measure what the word-agg redesign
moves and holds in memory, vs the pre-r10 row-per-position emit.

The r9 docstring retraction left the honest-but-unfixed bound: the old
shuffle build grouped ALL position rows of a chunk in one pandas frame
(~16 B/row, tens of millions for a dense chunk). The r10 build emits
per-batch per-WORD partial ORs, lets Tungsten's partial hash agg keep
OR-ing map-side (spillable), and regroups words by chunk — so the
reduce bound is chunk-sized for real. This probe measures, on one
mid-size build (16M keys, 1% fpp):

- rows the OLD emit would shuffle (per-batch-deduped positions) and the
  max position rows one chunk would group (the old reduce bound);
- rows the NEW emit shuffles (per-batch word ORs), rows after the
  partial agg (distinct nonzero words), and the max word rows one chunk
  groups (the new reduce bound);
- build walls for method='local' vs 'shuffle' + digest equality.

Usage: SPARK_GRAFT_DRIVER_MEM=48g python tools/measure_bloom_build.py [n_keys]
(the OLD-shape stats replay materializes per-position rows, which at
16M keys OOMs the default 8 g local heap — the old design failing its
own probe; the real build needs no such headroom)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datamunging_spark import get_spark
from datamunging_spark.operators.bloom import (
    _positions,
    bloom_build,
    bloom_params,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    spark = get_spark("bloom_probe")
    spark.sparkContext.setLogLevel("ERROR")
    m, k = bloom_params(n, 0.01)
    n_bytes = m // 8
    chunk = 1 << 23
    print(f"n={n:,} keys, fpp=0.01 -> m={m:,} bits "
          f"({n_bytes / 1e6:.0f} MB bitmap), k={k}, chunk=8 MiB "
          f"({max(1, -(-n_bytes // chunk))} chunks)")

    df = spark.range(n).select(
        F.concat(F.lit("key"), F.col("id")).alias("s")
    )
    hashes = df.select(F.xxhash64("s").alias("_h")).localCheckpoint()

    stat_schema = T.StructType([
        T.StructField("kind", T.StringType()),
        T.StructField("key", T.LongType()),
        T.StructField("n", T.LongType()),
    ])
    chunk_bits = chunk * 8
    words_per_chunk = chunk // 8

    def emit_stats(batches):
        # replicate both emit shapes from the same position stream
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            pos = _positions(
                pdf["_h"].to_numpy(np.int64).view(np.uint64), k, m
            ).ravel()
            upos = np.unique(pos)             # old emit: row per position
            wid = np.unique(pos >> np.uint64(6))  # new emit: row per word
            yield pd.DataFrame({
                "kind": np.concatenate([
                    np.repeat("pos_chunk", len(upos)),
                    np.repeat("word", len(wid)),
                ]),
                "key": np.concatenate([
                    (upos // np.uint64(chunk_bits)).astype(np.int64),
                    (wid // np.uint64(words_per_chunk)).astype(np.int64),
                ]),
                "n": np.concatenate([
                    upos.astype(np.int64), wid.astype(np.int64)
                ]),
            })

    stats = hashes.mapInPandas(emit_stats, stat_schema).localCheckpoint()
    old_rows = stats.filter(F.col("kind") == "pos_chunk").count()
    new_rows = stats.filter(F.col("kind") == "word").count()
    per_chunk = (
        stats.groupBy("kind", "key")
        .agg(
            F.count("*").alias("emitted"),
            F.count_distinct("n").alias("distinct"),
        )
        .groupBy("kind")
        .agg(
            F.max("distinct").alias("max_group"),
            F.sum("distinct").alias("total_distinct"),
        )
        .collect()
    )
    pc = {r["kind"]: r for r in per_chunk}
    print(f"| emit shape | shuffle rows | distinct | "
          f"max one-chunk group | reduce-task bytes |")
    print("|---|---|---|---|---|")
    print(
        f"| old: row per position | {old_rows:,} | "
        f"{pc['pos_chunk']['total_distinct']:,} | "
        f"{pc['pos_chunk']['max_group']:,} | "
        f"~{pc['pos_chunk']['max_group'] * 16 / 1e6:.0f} MB |"
    )
    print(
        f"| new: row per word (pre-OR) | {new_rows:,} | "
        f"{pc['word']['total_distinct']:,} | "
        f"{pc['word']['max_group']:,} | "
        f"~{pc['word']['max_group'] * 16 / 1e6:.0f} MB |"
    )

    # the REAL word-agg emit path (bloom._emit_words_fn), runtime
    # shuffle metrics read off the executed plan: this is the number of
    # rows that ACTUALLY shuffle after Spark's map-side partial bit_or
    # agg (level 2 of the pre-OR), vs the per-batch emissions above
    from datamunging_spark.operators.bloom import _WORD_SCHEMA, _emit_words_fn
    from datamunging_spark.plans import executed_plan_rows

    word_agg = (
        hashes.mapInPandas(_emit_words_fn(k, m), _WORD_SCHEMA)
        .groupBy("word_id")
        .agg(F.bit_or("word").alias("word"))
    )
    wr = executed_plan_rows(word_agg)
    print(
        f"word-agg REAL shuffle records (post partial agg): "
        f"{sum(wr['shuffle_rows']):,} "
        f"(vs {new_rows:,} per-batch emissions, {old_rows:,} old "
        f"position rows)"
    )

    walls = {}
    filt = {}
    for method in ("local", "shuffle"):
        t0 = time.perf_counter()
        filt[method] = bloom_build(
            df, ["s"], num_items=n, fpp=0.01, method=method,
            chunk_bytes=chunk,
        )
        walls[method] = time.perf_counter() - t0
    print(f"build wall: local {walls['local']:.1f} s, "
          f"shuffle {walls['shuffle']:.1f} s; digests equal: "
          f"{filt['local'].digest == filt['shuffle'].digest}")
    assert filt["local"].digest == filt["shuffle"].digest


if __name__ == "__main__":
    main()
