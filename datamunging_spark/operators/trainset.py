"""Training-set assembly operators: benchmark decontamination, weighted
source mixing, and deterministic global shuffle.

These are the pipeline steps between a curated corpus (operators/pipeline.py)
and a training run: drop documents that leak evaluation data, re-weight
sources to a target mixture, and fix a reproducible sample/order. All three
are expression-only (no Python in the hot path) and deterministic via the
portable md5 predicates from datamunging_spark.functions, so every step is
cross-engine reproducible — the property that makes training-data lineage
auditable outside Spark.

Scale shapes (see SCALE.md):
- decontamination: benchmark gram set is broadcast (eval suites are tiny
  next to a 100 TB corpus), so the corpus side is explode → broadcast-join →
  map-side-combined count per doc — no corpus shuffle at all.
- source mixing: pure per-row expressions (map weight lookup + md5
  predicate + bounded explode); zero shuffles.
- training shuffle: exactly one range-partitioning exchange on a uniform
  md5 key — the minimum any global shuffle costs; sortWithinPartitions adds
  no exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datamunging_spark.operators.dedup import exploded_ngrams

__all__ = [
    "contamination_report",
    "pack_sequences",
    "take_token_budget",
    "decontaminate",
    "source_mix",
    "training_shuffle",
]


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 5,
    min_overlap: int = 2,
) -> DataFrame:
    """Per-document contamination counts: how many distinct word ``n``-grams
    of each corpus doc appear anywhere in the benchmark (eval) set.

    The standard LLM decontamination primitive (GPT-3-style n-gram
    collision): a training doc is contaminated when it shares at least
    ``min_overlap`` distinct n-grams with the union of benchmark grams.
    Returns (id_col, overlap_grams) for contaminated docs only.

    Plan: corpus grams come from :func:`~.dedup.exploded_ngrams` (posexplode
    + window-lead, codegen-friendly); the benchmark gram set is deduped and
    broadcast — eval sets are KBs-to-MBs against a 100 TB corpus, the
    textbook broadcast dimension. The count per doc is a map-side-combined
    aggregate on the corpus' uniform id key.
    """
    bench_grams = (
        exploded_ngrams(
            benchmark, bench_text_col or text_col, id_col, n, distinct=False
        )
        .select("_sh")
        .distinct()
    )
    corpus_grams = exploded_ngrams(corpus, text_col, id_col, n, distinct=True)
    return (
        corpus_grams.join(F.broadcast(bench_grams), "_sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("overlap_grams"))
        .filter(F.col("overlap_grams") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **report_kwargs,
) -> DataFrame:
    """Remove benchmark-contaminated documents from the corpus: anti-join
    against :func:`contamination_report`. The report side is a small id set
    (contaminated docs only), so the anti-join broadcasts."""
    bad = contamination_report(
        corpus, benchmark, text_col, id_col, **report_kwargs
    ).select(id_col)
    return corpus.join(bad, on=id_col, how="left_anti")


def source_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
) -> DataFrame:
    """Weighted source mixing: resample each source to ``weights[source]``×
    its volume (downsample when < 1, upsample with whole-copy repetition
    when > 1), the standard way a training mixture is rebalanced.

    Deterministic and engine-portable: a doc with weight w keeps
    ``floor(w)`` full copies plus one extra copy iff the first 4 hex chars
    of md5(id) fall under the fractional part — the same portable-predicate
    family as ``row_sample_pred``/``key_sample_pred`` (granularity 1/65536).
    Every kept row is tagged with its ``copy`` index (0-based) so downstream
    shuffles/dedup can tell repetitions apart.

    Pure per-row expressions: one map lookup, one bounded
    ``explode(sequence)``, one md5 — no shuffle, no UDF, safe at any scale.
    """
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad or default_weight < 0:
        raise ValueError(f"negative mix weights: {bad or default_weight}")
    wmap = F.create_map(
        *[x for s, w in weights.items() for x in (F.lit(s), F.lit(float(w)))]
    )
    w = F.coalesce(wmap[F.col(source_col)], F.lit(float(default_weight)))
    floor_w = F.floor(w).cast("int")
    n_copies = F.ceil(w).cast("int")
    frac_thresh = F.lower(
        F.lpad(F.hex(F.floor((w - F.floor(w)) * 65536).cast("int")), 4, "0")
    )
    md5_frac = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(0), n_copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.withColumn("copy", F.explode(copies))
        .filter(
            (F.col("copy") < floor_w)
            | ((F.col("copy") == floor_w) & (md5_frac < frac_thresh))
        )
    )


def training_shuffle(
    df: DataFrame,
    id_cols: list[str],
    salt: str = "0",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training order: a salted md5 key per
    row, range-partitioned and sorted within partitions — writing the result
    yields files that concatenate to one reproducible pseudorandom
    permutation of the corpus (change ``salt`` per epoch for a fresh order).

    Exactly one exchange (RangePartitioning on the uniform md5 key — skew
    impossible by construction); the in-partition sort is local. This is the
    scale-correct alternative to ``orderBy(rand())``'s non-reproducible key
    and to zipWithIndex-style RDD permutations.
    """
    from datamunging_spark.functions import salted_row_key

    out = df.select("*", salted_row_key(id_cols, salt).alias("shuffle_key"))
    parts = num_partitions or out.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    return out.repartitionByRange(int(parts), "shuffle_key").sortWithinPartitions(
        "shuffle_key"
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    max_len: int = 2048,
    num_groups: int | None = None,
) -> DataFrame:
    """Sequence packing for training batches: assign each doc to a bin so
    that no bin exceeds ``max_len`` tokens — the standard sample-packing
    step that keeps context windows dense instead of padding-dominated.

    Packing is inherently sequential, so the scale shape is
    partition-parallel: docs are hashed into ``num_groups`` independent
    groups (defaults to ``spark.sql.shuffle.partitions``), and each group is
    packed with first-fit-decreasing inside one Arrow ``applyInPandas``
    call. Bin ids are globally unique (``group * 2^32 + local_bin``). FFD
    within a group wastes at most ~1/4 capacity vs optimal (classic bound);
    cross-group imbalance vanishes at corpus scale because groups are
    hash-uniform. Docs longer than ``max_len`` get a singleton bin and
    ``truncated=true`` — the caller decides whether to split or drop.

    Returns (id_col, tokens_col, bin_id, bin_tokens, truncated).
    """
    import pandas as pd

    spark = df.sparkSession
    groups = int(
        num_groups or spark.conf.get("spark.sql.shuffle.partitions")
    )
    out_schema = (
        f"{id_col} long, {tokens_col} long, bin_id long, "
        "bin_tokens long, truncated boolean"
    )

    def pack(key, pdf: pd.DataFrame):
        g = int(key[0])
        pdf = pdf.sort_values(tokens_col, ascending=False, kind="mergesort")
        bins: list[int] = []  # remaining capacity per bin
        assign, bin_tok, trunc = [], {}, []
        for _, row in pdf.iterrows():
            t = int(row[tokens_col])
            if t > max_len:
                b = len(bins)
                bins.append(0)
                assign.append(b)
                bin_tok[b] = t
                trunc.append(True)
                continue
            for b, cap in enumerate(bins):
                if cap >= t:
                    bins[b] = cap - t
                    assign.append(b)
                    bin_tok[b] += t
                    trunc.append(False)
                    break
            else:
                b = len(bins)
                bins.append(max_len - t)
                assign.append(b)
                bin_tok[b] = t
                trunc.append(False)
        out = pdf[[id_col, tokens_col]].copy()
        out["bin_id"] = [g * (1 << 32) + b for b in assign]
        out["bin_tokens"] = [bin_tok[b] for b in assign]
        out["truncated"] = trunc
        return out

    keyed = df.select(id_col, tokens_col).withColumn(
        "_g", F.pmod(F.xxhash64(F.col(id_col)), F.lit(groups))
    )
    return keyed.groupBy("_g").applyInPandas(pack, out_schema)


def take_token_budget(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Largest prefix of ``df`` (in ``order_cols`` order) whose running
    token sum stays within ``budget`` — "take the best docs until the
    training budget is full" without ever forming a global single-partition
    cumulative sum.

    Distributed prefix-sum, two passes: (1) range-partition by the order
    columns and collect the per-partition token totals (one tiny row per
    partition to the driver); (2) broadcast the partition base offsets back
    and add a WITHIN-partition window cumsum. Every partition computes its
    rows' global running totals independently — the classic scalable scan
    pattern, vs ``Window.orderBy`` with no partitionBy which funnels the
    corpus through one task. The input is ``localCheckpoint``-ed so both
    passes see the identical partitioning.
    """
    order_cols = order_cols or [tokens_col]
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    rp = (
        df.repartitionByRange(parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = {
        r["_pid"]: r["s"]
        for r in rp.groupBy("_pid")
        .agg(F.sum(F.col(tokens_col).cast("decimal(38,0)")).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid])
    base = F.create_map(
        *[
            x
            for pid, off in offsets.items()
            for x in (F.lit(pid), F.lit(off))
        ]
    )[F.col("_pid")].cast("decimal(38,0)")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = base + F.sum(F.col(tokens_col).cast("decimal(38,0)")).over(w)
    return (
        rp.withColumn("_run", running)
        .filter(F.col("_run") <= F.lit(budget))
        .drop("_pid", "_run")
    )
