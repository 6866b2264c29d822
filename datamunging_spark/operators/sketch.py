"""Frequent-items (heavy-hitter) sketches — the bounded-shuffle answer
to "which values dominate this 100 TB column?".

The exact answer (`heavy_hitters_exact`) is a plain hash aggregate:
correct, and the right tool whenever the distinct-key count fits a
shuffle. At pretraining-corpus scale it often doesn't — a URL-host /
n-gram / token column can carry billions of distinct keys, where the
full groupBy shuffles (and spills) the entire key space just to read
off the few thousand heavy keys at the top.

`heavy_hitters` bounds that: one mapInPandas pass runs a batched
Misra-Gries summary per partition (at most ``k`` counters live at any
moment), so the shuffle carries ≤ partitions × (k + 2) counter rows —
independent of the distinct-key count. Guarantees (classic MG, and the
merge rule of Agarwal et al., "Mergeable Summaries", PODS 2012):

- per partition i, each decrement event subtracts ``t`` from ALL
  counters while ≥ k+1 counters are ≥ t, so the subtracted total d_i
  satisfies (k+1)·d_i ≤ n_i → d_i ≤ n_i/(k+1);
- the merged estimate C(x) = Σ_i c_i(x) brackets the true count:
  C(x) ≤ f(x) ≤ C(x) + Σ_i d_i, with Σ_i d_i ≤ n/(k+1);
- therefore any value with f(x) > n/(k+1) SURVIVES (no false
  negatives above the error floor) — pick k ≈ partitions × (a few ×)
  1/min_share for comfortable margins.

The per-partition pass is Arrow-vectorized (pandas ``value_counts`` per
batch merged into the bounded counter table; the decrement is one
``np.partition`` quantile + vector subtract), never per-row Python.
Ties at the (k+1)-th counter can keep slightly fewer than k counters
after a decrement — harmless, the bound only improves.

No reference-repo counterpart: the reference's frequency analyses are
exact GROUP BY counts (README.md's census/word-count examples), which
`heavy_hitters_exact` covers; the sketch is the engine's scale path.
"""

# NB: no `from __future__ import annotations` — mapInPandas resolves
# real type objects at decoration time elsewhere in this package; keep
# the module convention uniform.

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

_META_DEC = "dec"  # meta row: cnt = this partition's subtracted total d_i
_META_N = "n"  # meta row: cnt = this partition's non-null row count n_i


def heavy_hitters_exact(
    df: DataFrame, col: str, min_share: float = 0.001
) -> DataFrame:
    """Exact heavy hitters: values of ``col`` whose frequency is ≥
    ``min_share`` of the non-null rows. One hash aggregate (map-side
    partial) + a broadcast of the single total row; shuffles the full
    distinct-key space — use :func:`heavy_hitters` when that space is
    the problem. NULLs are excluded (a NULL "value" is a data-quality
    fact, not a frequent item — `invalid_value_report` covers those).
    """
    vals = df.select(F.col(col).alias("value")).filter(
        F.col("value").isNotNull()
    )
    counts = vals.groupBy("value").agg(F.count(F.lit(1)).alias("count"))
    total = vals.agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("count") >= F.col("_n") * F.lit(float(min_share)))
        .select(
            "value",
            "count",
            (F.col("count") / F.col("_n")).alias("share"),
        )
    )


def _mg_partition(k: int):
    """Batched Misra-Gries over an iterator of Arrow batches; at most
    ``k`` counters held between batches."""

    def run(batches):
        import numpy as np
        import pandas as pd

        counters = pd.Series(dtype="int64")
        dec = 0
        n = 0
        for pdf in batches:
            vals = pdf["value"].dropna()
            if not len(vals):
                continue
            n += len(vals)
            vc = vals.value_counts()  # vectorized per-batch exact counts
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                arr = counters.to_numpy()
                # (k+1)-th largest: while >k counters are >= t, subtract
                # t from everything — one decrement event of weight t.
                t = int(np.partition(arr, -(k + 1))[-(k + 1)])
                if t > 0:
                    dec += t
                    counters = counters[counters > t] - t
                else:  # t == 0: enough zero-count ties; just drop them
                    counters = counters[counters > 0]
        out = pd.DataFrame(
            {
                "value": counters.index.astype(object),
                "cnt": counters.to_numpy(dtype="int64"),
                "meta": None,
            }
        )
        meta = pd.DataFrame(
            {
                "value": [None, None],
                "cnt": [dec, n],
                "meta": [_META_DEC, _META_N],
            }
        )
        yield pd.concat([out, meta], ignore_index=True)

    return run


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 4096,
    min_share: float | None = None,
) -> DataFrame:
    """Misra-Gries heavy hitters over ``col`` with ≤ ``k`` counters per
    partition (module docstring has the guarantees). Returns
    ``(value, count_lo, count_hi, n_total, max_err)`` where
    ``count_lo ≤ true count ≤ count_hi`` and ``max_err ≤ n/(k+1)``;
    with ``min_share`` set, keeps only values whose count COULD reach
    ``min_share × n`` (``count_hi`` ≥ threshold — supersets the exact
    answer by the no-false-negative guarantee, pinned by test).

    Plan shape: one Arrow pass over the data (no shuffle), then a hash
    aggregate over ≤ partitions × (k+2) counter rows; the aggregated
    summary is localCheckpointed (it is the bounded working set, read
    by the hitter/meta branches) so the expensive scan runs once.
    ``col`` is stringified for the summary (one key space regardless of
    input type — join back on the string form to recover payloads).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    vals = df.select(F.col(col).cast("string").alias("value"))
    schema = StructType(
        [
            StructField("value", StringType()),
            StructField("cnt", LongType()),
            StructField("meta", StringType()),
        ]
    )
    rows = vals.mapInPandas(_mg_partition(int(k)), schema=schema)
    summary = (
        rows.groupBy("meta", "value")
        .agg(F.sum("cnt").alias("c"))
        .localCheckpoint()
    )
    meta = (
        summary.filter(F.col("meta").isNotNull())
        .groupBy()
        .pivot("meta", [_META_DEC, _META_N])
        .sum("c")
        .select(
            F.coalesce(F.col(_META_DEC), F.lit(0)).alias("max_err"),
            F.coalesce(F.col(_META_N), F.lit(0)).alias("n_total"),
        )
    )
    out = (
        summary.filter(F.col("meta").isNull() & F.col("value").isNotNull())
        .select("value", F.col("c").alias("count_lo"))
        .crossJoin(F.broadcast(meta))
        .select(
            "value",
            "count_lo",
            (F.col("count_lo") + F.col("max_err")).alias("count_hi"),
            "n_total",
            "max_err",
        )
    )
    if min_share is not None:
        out = out.filter(
            F.col("count_hi") >= F.col("n_total") * F.lit(float(min_share))
        )
    return out
