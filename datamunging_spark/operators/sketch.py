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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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
    ``k`` counters held between batches. (A chunked-consolidation
    variant — buffering value_counts and concat+groupby-ing every ~8k
    rows — was measured at the 64M-row probe point and was no faster
    than this per-batch ``Series.add``, so the simpler form stays.)"""

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
                # t from everything — one decrement event of weight t
                # (each event removes >= (k+1)·t mass, so the summed
                # dec stays <= n/(k+1))
                # always >= 1: every live counter is >= 1 by
                # construction, so the decrement always fires
                t = int(np.partition(arr, -(k + 1))[-(k + 1)])
                dec += t
                counters = counters[counters > t] - t
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


def hh_summary(df: DataFrame, col: str, k: int = 4096) -> DataFrame:
    """Build a Misra-Gries SUMMARY of ``col``: the mergeable/persistable
    sketch state — rows ``(value, cnt, meta)`` where data rows carry
    ``meta=NULL`` counters and the two meta rows carry the summed
    decrement total (``meta='dec'``) and non-null row count
    (``meta='n'``). One Arrow pass (≤ ``k`` counters per partition),
    then a hash aggregate over ≤ partitions × (k+2) counter rows;
    localCheckpointed because every consumer (report, merge) reads it
    from several branches and the scan must run once. ``col`` is
    stringified (one key space regardless of input type). Data rows can
    exceed ``k`` here (union of per-partition summaries) — the bounds
    hold regardless; :func:`merge_hh_summaries` re-bounds to ``k`` for
    the stored-state loop.
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
    return (
        rows.groupBy("meta", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )


def merge_hh_summaries(
    a: DataFrame, b: DataFrame | None, k: int = 4096
) -> DataFrame:
    """Merge two summaries into one with ≤ ``k`` data rows — the
    Agarwal et al. (PODS 2012) merge rule: sum counters pointwise, then
    subtract the (k+1)-th largest counter from all and drop ≤ 0,
    charging the subtraction to the decrement total so the count
    bracket / error floor stay true of the COMBINED stream. Everything
    here is summary-sized (≤ ``k`` + partitions × (k+2) rows): the
    orderBy/limit that finds the cutoff collects k+1 longs on the
    driver, the data-sized scan happened in :func:`hh_summary`.
    Associative and commutative, so batches can fold in any order —
    this is the stored-state step of the incremental/streaming loop.
    ``b=None`` re-bounds ``a`` alone (the first-batch seed). Parameter
    drift between the two summaries' build-k is SAFE here, unlike the
    minhash snapshots: the error total is carried explicitly in the
    'dec' meta row, so the reported bracket stays true whatever k each
    side used — k only tunes how tight future bounds are.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = a if b is None else a.unionByName(b)
    merged = (
        u.groupBy("meta", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )
    data = merged.filter(F.col("meta").isNull())
    cuts = [
        r.cnt
        for r in data.select("cnt").orderBy(F.desc("cnt")).limit(k + 1).collect()
    ]
    if len(cuts) <= k:
        return merged
    t = cuts[-1]  # (k+1)-th largest
    rebound = (
        data.filter(F.col("cnt") > t)
        .withColumn("cnt", F.col("cnt") - F.lit(t))
    )
    meta = merged.filter(F.col("meta").isNotNull()).withColumn(
        "cnt",
        F.when(F.col("meta") == _META_DEC, F.col("cnt") + F.lit(t)).otherwise(
            F.col("cnt")
        ),
    )
    return rebound.unionByName(meta)


def hh_report(summary: DataFrame, min_share: float | None = None) -> DataFrame:
    """Render a summary into the heavy-hitter report
    ``(value, count_lo, count_hi, n_total, max_err)`` with
    ``count_lo ≤ true count ≤ count_hi`` and ``max_err`` = the summed
    decrement total (≤ n/(k+1) per the module bounds); ``min_share``
    keeps only values whose count COULD reach ``min_share × n``
    (supersets the exact answer by the no-false-negative guarantee)."""
    meta = (
        summary.filter(F.col("meta").isNotNull())
        .groupBy()
        .pivot("meta", [_META_DEC, _META_N])
        .sum("cnt")
        .select(
            F.coalesce(F.col(_META_DEC), F.lit(0)).alias("max_err"),
            F.coalesce(F.col(_META_N), F.lit(0)).alias("n_total"),
        )
    )
    out = (
        summary.filter(F.col("meta").isNull() & F.col("value").isNotNull())
        .select("value", F.col("cnt").alias("count_lo"))
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


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 4096,
    min_share: float | None = None,
) -> DataFrame:
    """One-shot Misra-Gries heavy hitters: :func:`hh_summary` rendered
    by :func:`hh_report` (module docstring has the guarantees; split
    faces exist for the incremental/streaming fold)."""
    return hh_report(hh_summary(df, col, k), min_share)


def top_k_exact_via_sketch(
    df: DataFrame, col: str, top_n: int, k: int = 4096
) -> DataFrame:
    """EXACT top-``top_n`` most frequent values at bounded shuffle — the
    composition a 100 TB vocabulary/top-domain build needs: the plain
    ``groupBy(col).count().orderBy(...)`` is exact but shuffles a
    partial-aggregate row for EVERY distinct key, which at billions of
    keys is the bottleneck (and the aggregation-OOM risk SCALE.md
    measured). Instead:

    1. :func:`hh_summary` proposes candidates (one Arrow pass, summary
       ≤ partitions × (k+2) rows) — a guaranteed SUPERSET of every
       value with true count > the summary's error total ``max_err``;
    2. candidates are re-counted EXACTLY in one more pass (hash agg
       restricted to candidate keys via a broadcast semi-join — output
       bounded by the candidate count, not the key space);
    3. ``certified_exact``: the V-th exact count is compared against
       ``max_err``. When strictly greater, NO non-candidate can reach
       the top-V (its true count ≤ max_err < the cutoff), so the
       result PROVABLY equals the unbounded exact top-V — an exactness
       certificate computed in-query, no oracle needed. When false
       (k too small for the tail weight), the rows are still the exact
       counts of a best-effort candidate set; raise k and rerun.

    Ties break deterministically (count desc, value asc — the
    ``build_vocab`` convention). Two data passes total, both with
    bounded exchanges; certificate strictness makes boundary ties with
    ``max_err`` fail closed.
    """
    if top_n < 1:
        raise ValueError("top_n must be >= 1")
    s = hh_summary(df, col, k)
    cand = s.filter(F.col("meta").isNull() & F.col("value").isNotNull()).select(
        "value"
    )
    meta = (
        s.filter(F.col("meta") == _META_DEC)
        .groupBy()
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("max_err"))
    )
    vals = df.select(F.col(col).cast("string").alias("value")).filter(
        F.col("value").isNotNull()
    )
    exact = (
        vals.join(F.broadcast(cand), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    top = exact.orderBy(F.desc("count"), F.asc("value")).limit(int(top_n))
    vth = top.agg(
        F.min("count").alias("_vth"), F.count(F.lit(1)).alias("_ntop")
    )
    # fail-closed certificate: with fewer than top_n candidate rows the
    # true top-V could include non-candidates in the unfilled slots —
    # UNLESS max_err == 0, where no counter was ever decremented and the
    # candidate set is provably the COMPLETE key space.
    return (
        top.crossJoin(F.broadcast(meta))
        .crossJoin(F.broadcast(vth))
        .select(
            "value",
            "count",
            (
                (F.col("max_err") == 0)
                | (
                    (F.col("_ntop") == top_n)
                    & (F.col("_vth") > F.col("max_err"))
                )
            ).alias("certified_exact"),
            "max_err",
        )
    )


# ---------------------------------------------------------------------------
# Mergeable per-key distinct counts (DataSketches HLL via Spark built-ins)
# ---------------------------------------------------------------------------

def distinct_sketch(
    df: DataFrame, keys: list[str], col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL distinct-count SKETCH state: one binary DataSketches
    HLL per key group over ``col`` (Spark's built-in ``hll_sketch_agg``
    — JVM-side, whole-stage codegen'd, ~2^lgk bytes per key at ~1.6%
    relative error for lgk=12). The mergeable sibling of the one-shot
    ``approx_count_distinct``: state persists as a plain binary column,
    so "distinct users per domain over the whole crawl" maintains
    incrementally via :func:`merge_distinct_sketches` instead of
    re-scanning history — the same snapshot discipline as the dedup /
    heavy-hitter state. Render with :func:`distinct_estimate`. NULLs in
    ``col`` are ignored (Spark aggregate semantics); NULL key groups
    are real groups.

    Scale shape: one hash aggregate; shuffle carries one partial sketch
    per key per partition (map-side combine merges row values into the
    sketch BEFORE the exchange), so exchange volume is keys × 2^lgk
    bytes, independent of row count or per-key cardinality.
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(int(lgk))).alias("hll")
    )


def merge_distinct_sketches(
    a: DataFrame, b: DataFrame | None, keys: list[str]
) -> DataFrame:
    """Merge two per-key sketch states (outer on keys — a key present on
    one side passes through; present on both unions exactly, per the
    DataSketches merge guarantee: union(sketch(A), sketch(B)) ==
    sketch(A ∪ B), pinned by test). ``b=None`` is the first-batch seed.
    Everything is state-sized: the union aggregates keys × 2 sketch
    rows, never raw data. NULL-safe on keys (a NULL key group keeps
    merging with itself, the incremental_rollup lesson)."""
    if b is None:
        return a
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(F.hll_union_agg(F.col("hll")).alias("hll"))
    )


def distinct_estimate(summary: DataFrame, keys: list[str]) -> DataFrame:
    """Render per-key sketch state into ``(keys..., distinct_est)``."""
    return summary.select(
        *keys, F.hll_sketch_estimate(F.col("hll")).alias("distinct_est")
    )


def hot_keys_sketch(
    df: DataFrame, col: str, threshold: int, k: int = 65536
) -> DataFrame:
    """Hot keys at bounded shuffle — the detector behind the
    ``valve="sketch"`` mode of ``max_gram_df``/``max_fp_df``: one
    Misra-Gries Arrow pass (≤ ``k`` counters per partition) + a
    summary-sized aggregate, RE-BOUNDED to ≤ ``k`` data rows via the
    Agarwal merge rule (``merge_hh_summaries`` — the raw union of
    per-partition summaries can reach partitions × k rows, and on a
    heavy-tailed corpus the global error term would flag nearly all of
    them), instead of the exact valve's one-shuffled-row-per-DISTINCT-
    key groupBy. Returns a single-column frame (named ``col``, cast
    back to its original type) of keys whose MG count UPPER bound
    exceeds ``threshold`` — genuinely ≤ k rows, always
    broadcast-anti-join-able. The re-bound adds its subtraction to the
    error total, so ``count_hi`` stays a true upper bound of the
    combined stream.

    Contract (conservative in the valve's documented direction):

    - **no hot key escapes above the floor** — every key with true row
      count > ``threshold + n/(k+1)`` is present in the summary (MG
      no-false-negative) with ``count_hi ≥ true count > threshold``,
      so it is flagged; keys the summary missed have true count
      ≤ n/(k+1) by the same bound, i.e. the residual fan-out per
      surviving key is capped at ``max(threshold, n/(k+1))``. Size
      ``k ≈ n/threshold`` when the exact cap must hold; any smaller k
      trades cap tightness for counter memory, explicitly.
    - **over-drop, never under-protect** — ``count_hi`` overstates by
      ≤ the decrement total, and row counts overstate DOCUMENT
      frequency when one document repeats a key, so some keys an exact
      df-valve would keep are dropped. That is the valve's existing
      trade (drops lose detection recall, never correctness), priced
      per-corpus in SCALE.md.
    """
    rep = hh_report(
        merge_hh_summaries(hh_summary(df.select(F.col(col)), col, k=k),
                           None, k=k)
    )
    return rep.filter(F.col("count_hi") > int(threshold)).select(
        F.col("value").cast(df.schema[col].dataType).alias(col)
    )


# ---------------------------------------------------------------------------
# Mergeable quantile summaries (MRL/KLL-family level compactors)
# ---------------------------------------------------------------------------
#
# The third leg of the sketch family: frequency (Misra-Gries, above),
# distinct (HLL, above), and now rank/quantiles — "what is the p99
# document length per crawl batch, maintained incrementally?" without
# sorting or shuffling the data column. The exact face already exists
# (`relational.grouped_percentiles`, R15): correct whenever a full sort
# of the group fits the cluster; this is the engine's scale/streaming
# path for when it doesn't.
#
# Design (Manku-Rajagopalan-Lindsay '98 uniform-capacity compactors, the
# simple member of the KLL family; mergeability per Agarwal et al.,
# "Mergeable Summaries", PODS 2012): a summary is a weighted point set —
# retained items at LEVEL ℓ each stand for 2^ℓ original values. Inserts
# land in level 0; whenever a level holds > k items it is COMPACTED:
# sort, keep every other item of an even-length prefix (alternating
# parity), promote the kept items to level ℓ+1.
#
# - **mass is conserved exactly**: 2m items of weight w become m items
#   of weight 2w (the odd leftover stays put), so Σ cnt·2^level == n at
#   all times — an exact in-query invariant, pinned by hypothesis.
# - **rank error is carried exactly**: one compaction at level ℓ shifts
#   the weighted count-below-t of any threshold t by ≤ 2^ℓ, so the
#   summed budget (meta row 'err', the sibling of MG's 'dec') brackets
#   every rank estimate: |est_rank(t) − true_rank(t)| ≤ err_total.
#   Worst case err_total ≤ n·L/k for L ≈ log2(n/k) occupied levels
#   (each compaction consumes ≥ k·2^ℓ mass and charges 2^ℓ), i.e.
#   ~0.7% of n at k=4096 even for n = 10^12 — but consumers should read
#   the CARRIED value, which is exact for the actual fold history.
# - **merging adds budgets**: a merge unions the point sets (groupBy on
#   (level, value) — mass and 'err'/'n' meta rows sum) and re-compacts
#   overfull levels, charging those compactions to the budget like any
#   other. Associative/commutative; parameter drift in k between folds
#   only changes future tightness, never bracket truth (the hh_summary
#   lesson).
#
# Scale shape: the build is one Arrow pass (≤ k items per level per
# partition, levels grow logarithmically); the exchange carries
# summaries (≤ partitions × k × L rows), never data. The re-bound pass
# repartitionByRange's the pooled summary by VALUE, so each task
# compacts a disjoint value range independently — valid because rank
# decomposes over disjoint ranges (mass outside a range is conserved by
# that range's compactions) and each event still charges its 2^ℓ to the
# global budget; no single task ever holds the whole pooled summary.

_META_ERR = "err"  # meta row: cnt = summed rank-error budget

_Q_SCHEMA = StructType(
    [
        StructField("value", DoubleType()),
        StructField("level", IntegerType()),
        StructField("cnt", LongType()),
        StructField("meta", StringType()),
    ]
)


def _compact_levels(levels, parity, k, err):
    """Compact every level holding > k items (cascading); mutates
    ``levels``/``parity`` in place, returns the grown error budget.
    ``levels[l]`` is a float64 array of items with weight 2**l."""
    import numpy as np

    l = 0
    while l < len(levels):
        if len(levels[l]) <= k:
            l += 1
            continue
        buf = np.sort(levels[l])
        m = (len(buf) // 2) * 2  # even-length prefix: mass conserved
        promoted = buf[parity[l] : m : 2]
        parity[l] ^= 1
        if l + 1 == len(levels):
            levels.append(np.empty(0, dtype="float64"))
            parity.append(0)
        levels[l] = buf[m:]  # odd leftover (0 or 1 items) stays
        levels[l + 1] = np.concatenate([levels[l + 1], promoted])
        err += 1 << l  # one compaction event at weight 2^l
        # the promotion may overfill l+1 — loop continues upward
        l += 1
    return err


def _emit_summary(levels, err, n):
    """Render compactor state + meta rows into the summary frame."""
    import pandas as pd

    frames = []
    for lvl, arr in enumerate(levels):
        if not len(arr):
            continue
        vc = pd.Series(arr).value_counts()  # collapse duplicate values
        frames.append(
            pd.DataFrame(
                {
                    "value": vc.index.astype("float64"),
                    "level": lvl,
                    "cnt": vc.to_numpy(dtype="int64"),
                    "meta": None,
                }
            )
        )
    frames.append(
        pd.DataFrame(
            {
                # NaN, not None: keeps the column float64 through the
                # concat so Arrow sees one clean double column
                "value": [float("nan"), float("nan")],
                "level": [0, 0],
                "cnt": [err, n],
                "meta": [_META_ERR, _META_N],
            }
        )
    )
    return pd.concat(frames, ignore_index=True)


def _q_build_partition(k: int):
    """Per-partition compactor build over an iterator of Arrow batches
    of raw ``value`` doubles (NULL/NaN dropped, like the MG pass)."""

    def run(batches):
        import numpy as np

        levels = [np.empty(0, dtype="float64")]
        parity = [0]
        err = 0
        n = 0
        for pdf in batches:
            vals = pdf["value"].dropna().to_numpy(dtype="float64")
            if not len(vals):
                continue
            n += len(vals)
            levels[0] = np.concatenate([levels[0], vals])
            err = _compact_levels(levels, parity, k, err)
        yield _emit_summary(levels, err, n)

    return run


def _recompact_frame(data, meta, k: int):
    """ONE home for the expand → compact → emit → drop-stubs re-bound
    body (the grouped face wraps it per key — a fix to the compaction
    or err-delta accounting must not have to land twice): expand
    (value, level, cnt) data rows back into per-level item arrays
    (bounded — inputs are summary-sized), compact overfull levels, and
    return the re-bounded data rows + an 'err' DELTA meta row when this
    call compacted + the pass-through ``meta`` rows. The consumer
    re-aggregates meta by sum."""
    import numpy as np
    import pandas as pd

    levels = []
    parity = []
    for lvl, grp in data.groupby("level"):
        lvl = int(lvl)
        while len(levels) <= lvl:
            levels.append(np.empty(0, dtype="float64"))
            parity.append(0)
        levels[lvl] = np.repeat(
            grp["value"].to_numpy(dtype="float64"),
            grp["cnt"].to_numpy(dtype="int64"),
        )
    if not levels:
        levels, parity = [np.empty(0, dtype="float64")], [0]
    delta = _compact_levels(levels, parity, k, 0)
    out = _emit_summary(levels, delta, 0)
    # drop the 'n'=0 stub; keep the err delta only when this call
    # actually compacted (meta rows must stay sparse)
    out = out[out["meta"] != _META_N]
    if delta == 0:
        out = out[out["meta"].isna()]
    return pd.concat(
        [out, meta[["value", "level", "cnt", "meta"]]], ignore_index=True
    )


def _q_recompact_partition(k: int):
    """Re-bound a pooled summary's value-range shard via
    :func:`_recompact_frame`; 'n'/'err' meta rows pass through (they
    ride in whatever shard range-partitioning sent their NaN values
    to)."""

    def run(batches):
        import pandas as pd

        pooled = [b for b in batches]
        pdf = (
            pd.concat(pooled, ignore_index=True)
            if pooled
            else pd.DataFrame(columns=["value", "level", "cnt", "meta"])
        )
        yield _recompact_frame(
            pdf[pdf["meta"].isna()], pdf[pdf["meta"].notna()], k
        )

    return run


def _rebound(pooled: DataFrame, k: int, rebound_partitions: int) -> DataFrame:
    """Shared re-bound tail of build/merge: checkpoint the pooled
    summary FIRST — ``repartitionByRange`` computes its range bounds
    with a separate sampling job over the upstream plan, which for the
    build path is the full corpus-wide Arrow scan; checkpointing makes
    the sample read summary-sized rows instead of scanning twice (the
    r9 probe caught the build running every input stage two times).
    With one shard there is nothing to range-split, so a plain
    ``repartition(1)`` skips the sampling job entirely — and with no
    sampling pass to protect, the default path also skips the
    checkpoint (one fewer eager job per build/merge/streaming fold;
    the single scan feeds the one-shard exchange lazily)."""
    shards = (
        pooled.repartition(1)
        if rebound_partitions == 1
        else pooled.localCheckpoint().repartitionByRange(
            rebound_partitions, "value"
        )
    )
    rebound = shards.mapInPandas(_q_recompact_partition(k), schema=_Q_SCHEMA)
    return (
        rebound.groupBy("meta", "level", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )


def quantile_summary(
    df: DataFrame,
    col: str,
    k: int = 4096,
    rebound_partitions: int = 1,
    rebound: bool = True,
) -> DataFrame:
    """Build a mergeable QUANTILE summary of numeric ``col``: rows
    ``(value, level, cnt, meta)`` — data rows (``meta`` NULL) are
    retained items, ``cnt`` items of weight ``2^level`` each; meta rows
    carry the non-null count (``meta='n'``) and the exact accumulated
    rank-error budget (``meta='err'``). One Arrow build pass per
    partition (≤ ``k`` items per level), a summary-sized groupBy, then
    one range-sharded re-compaction so the stored state holds ≤ ``k``
    items per level per re-bound shard — TOTAL with the default single
    shard (the pooled union of per-partition summaries
    would otherwise grow with partition count — the hh_summary /
    merge_hh_summaries split, fused here because unlike MG the re-bound
    needs a sort and is cheapest while the summary is already in Arrow).
    NULL and NaN values are excluded from ``n`` (same contract as the
    MG pass). ``rebound_partitions`` sizes the range shuffle — 1 is
    right up to ~10^2 partitions; at larger cluster scale raise it so
    no task holds the whole pooled summary (module header: range shards
    compact independently and the budget stays exact either way).
    ``rebound=False`` returns the LAZY pooled per-partition union
    instead (data rows can exceed k per level, exactly like
    hh_summary's contract) — for feeding straight into
    :func:`merge_quantile_summaries`, which pools and re-bounds anyway:
    the streaming fold uses it to skip a redundant checkpoint +
    re-compaction per micro-batch (and the skipped compactions don't
    charge the budget twice).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if rebound_partitions < 1:
        # validate BEFORE the corpus-wide Arrow build scan (the
        # shared_span_pairs fail-fast lesson)
        raise ValueError("rebound_partitions must be >= 1")
    vals = df.select(F.col(col).cast("double").alias("value"))
    rows = vals.mapInPandas(_q_build_partition(int(k)), schema=_Q_SCHEMA)
    pooled = rows.groupBy("meta", "level", "value").agg(
        F.sum("cnt").alias("cnt")
    )
    if not rebound:
        return pooled
    return _rebound(pooled, int(k), int(rebound_partitions))


def merge_quantile_summaries(
    a: DataFrame, b: DataFrame | None, k: int = 4096,
    rebound_partitions: int = 1,
) -> DataFrame:
    """Merge two quantile summaries into one with ≤ ``k`` items per
    level: union the weighted point sets (groupBy sums duplicate
    (level, value) mass and the 'n'/'err' meta budgets), then
    re-compact overfull levels, charging the new compactions to the
    budget — everything summary-sized. ``b=None`` re-bounds ``a`` alone
    (the first-batch seed). Associative and commutative up to
    compaction parity (brackets and mass are exact either way), so
    batches fold in any order — the stored-state step of the
    incremental/streaming loop, exactly like :func:`merge_hh_summaries`.
    Build-``k`` drift between the sides is SAFE: budgets are carried
    explicitly, k only tunes future tightness.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    if rebound_partitions < 1:
        raise ValueError("rebound_partitions must be >= 1")
    u = a if b is None else a.unionByName(b)
    pooled = u.groupBy("meta", "level", "value").agg(
        F.sum("cnt").alias("cnt")
    )
    return _rebound(pooled, int(k), int(rebound_partitions))


def quantile_report(summary: DataFrame, qs: list[float]) -> DataFrame:
    """Render a quantile summary at probe points ``qs`` (each in
    [0, 1]): for each q, the retained value at weighted nearest-rank
    ``max(1, ceil(q·n))`` — columns ``(q, value, rank_target, est_rank,
    n_total, max_rank_err)`` with the guarantee ``|est_rank −
    true_count_le(value)| ≤ max_rank_err`` (module header; ``est_rank``
    is the summary's weighted count ≤ value, ``true_count_le`` the
    data's). The window cumsum and the qs join run over SUMMARY-sized
    rows (≤ k·L + |qs|) — the single-partition window is fine here for
    the same reason merge_hh_summaries' k-row collect is. An empty
    summary (n=0) returns every q with NULL value and est_rank 0."""
    spark = summary.sparkSession
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (0.0 <= float(q) <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    meta = (
        summary.filter(F.col("meta").isNotNull())
        .groupBy()
        .pivot("meta", [_META_ERR, _META_N])
        .sum("cnt")
        .select(
            F.coalesce(F.col(_META_ERR), F.lit(0)).alias("max_rank_err"),
            F.coalesce(F.col(_META_N), F.lit(0)).alias("n_total"),
        )
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    data = (
        summary.filter(F.col("meta").isNull())
        # python-API shiftleft takes a literal shift only — SQL form
        # accepts the level column (1L keeps it 64-bit)
        .withColumn("_w", F.expr("cnt * shiftleft(1L, level)"))
        # one row per VALUE before the cumsum: the same value can be
        # retained at several levels, and a mid-tie crossing row would
        # understate est_rank (= the summary's full count ≤ value)
        .groupBy("value")
        .agg(F.sum("_w").alias("_w"))
        .withColumn("_cum", F.sum("_w").over(w))
    )
    from datamunging_spark.sources.io import local_table

    qdf = local_table(spark, [(float(q),) for q in qs], "q double")
    targets = qdf.crossJoin(F.broadcast(meta)).withColumn(
        "rank_target",
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.col("q") * F.col("n_total")).cast("long"),
        ),
    )
    hits = (
        targets.join(
            data.select("value", "_cum"),
            F.col("_cum") >= F.col("rank_target"),
            "left",
        )
        .groupBy("q", "rank_target", "n_total", "max_rank_err")
        .agg(
            F.min_by("value", "_cum").alias("value"),
            F.coalesce(F.min("_cum"), F.lit(0)).alias("est_rank"),
        )
    )
    return hits.select(
        "q", "value", "rank_target", "est_rank", "n_total", "max_rank_err"
    )


def quantiles_sketch(
    df: DataFrame, col: str, qs: list[float], k: int = 4096
) -> DataFrame:
    """One-shot sketched quantiles: :func:`quantile_summary` rendered by
    :func:`quantile_report` (split faces exist for the incremental /
    streaming fold; `relational.grouped_percentiles` is the exact
    face)."""
    return quantile_report(quantile_summary(df, col, k), qs)


# --- grouped quantile profiles -------------------------------------------
#
# The keyed sibling ("doc-length p50/p99 PER SOURCE, maintained
# incrementally") — same compactor math per key group, same meta-row
# budget accounting per key. Scale shape: the build pass holds one
# compactor (≤ k items per level) per key PRESENT IN ITS PARTITION —
# per-task memory is distinct-keys-per-partition × k items, the same
# cardinality trade distinct_sketch documents (keys × 2^lgk bytes); the
# re-bound hash-partitions the pooled summary BY KEY (no range sampling
# to protect, so no checkpoint either), each key's whole summary
# compacting in one task. Exchanges carry summaries only.


def _norm_key(kt):
    """Normalize a pandas groupby(dropna=False) group label: always a
    tuple, with NA components replaced by None. CRITICAL for the keyed
    Arrow passes' memory bound — pandas returns a FRESH float nan
    object as the NA label on every groupby call, and nan != nan with
    identity-based hashing, so a dict keyed on the raw label would
    grow one separate ≤k state per Arrow BATCH for the NULL key group
    (O(batches × k), data-proportional — the r9 fourth-review catch)
    instead of one per key. Spark-side note: this WOULD conflate a
    float key's NaN with NULL (Spark's own groupBy keeps them
    distinct) — which is why :func:`_check_q_keys` rejects
    float/double key columns at every public grouped face; the keys
    that reach here cannot carry NaN."""
    import pandas as pd

    if not isinstance(kt, tuple):
        kt = (kt,)
    return tuple(None if pd.isna(v) else v for v in kt)


def _nullsafe_key_cond(left_alias: str, right_alias: str, keys):
    """AND-fold of eqNullSafe over the key columns of two aliased
    frames — NULL key groups must join with themselves (the
    incremental_rollup lesson); one home for all grouped faces."""
    cond = None
    for c in keys:
        eq = F.col(f"{left_alias}.{c}").eqNullSafe(
            F.col(f"{right_alias}.{c}")
        )
        cond = eq if cond is None else (cond & eq)
    return cond


def _grouped_schema(df: DataFrame, keys: list[str]) -> StructType:
    return StructType(
        [df.schema[name] for name in keys] + list(_Q_SCHEMA.fields)
    )


def _q_grouped_build_partition(keys: list[str], k: int):
    """Per-partition keyed compactor build: dict key-tuple → state."""

    def run(batches):
        import numpy as np
        import pandas as pd

        states = {}  # key tuple -> [levels, parity, err, n]
        for pdf in batches:
            for kt, grp in pdf.groupby(keys, dropna=False, sort=False):
                kt = _norm_key(kt)
                vals = grp["value"].dropna().to_numpy(dtype="float64")
                if not len(vals):
                    continue
                st = states.get(kt)
                if st is None:
                    st = [[np.empty(0, dtype="float64")], [0], 0, 0]
                    states[kt] = st
                st[3] += len(vals)
                st[0][0] = np.concatenate([st[0][0], vals])
                st[2] = _compact_levels(st[0], st[1], k, st[2])
        frames = []
        for kt, (levels, _parity, err, n) in states.items():
            out = _emit_summary(levels, err, n)
            for name, kv in zip(keys, kt):
                out.insert(0, name, [kv] * len(out))
            frames.append(out[keys + ["value", "level", "cnt", "meta"]])
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return run


def _q_grouped_recompact_partition(keys: list[str], k: int):
    """Re-bound each key group of a hash-by-key shard independently;
    per-key meta rows ride the same hash so they pass through here."""

    def run(batches):
        import pandas as pd

        pooled = [b for b in batches]
        if not pooled:
            return
        pdf = pd.concat(pooled, ignore_index=True)
        frames = []
        for kt, grp in pdf.groupby(keys, dropna=False, sort=False):
            kt = _norm_key(kt)
            out = _recompact_frame(
                grp[grp["meta"].isna()], grp[grp["meta"].notna()], k
            )
            for name, kv in zip(keys, kt):
                out.insert(0, name, [kv] * len(out))
            frames.append(out[keys + ["value", "level", "cnt", "meta"]])
        yield pd.concat(frames, ignore_index=True)

    return run


def _grouped_rebound(pooled: DataFrame, keys: list[str], k: int) -> DataFrame:
    shards = pooled.repartition(*[F.col(c) for c in keys])
    rebound = shards.mapInPandas(
        _q_grouped_recompact_partition(keys, k),
        schema=_grouped_schema(pooled, keys),
    )
    return (
        rebound.groupBy(*keys, "meta", "level", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )


_RESERVED_Q_COLS = frozenset(
    {
        # summary columns (both grouped families)
        "value", "level", "cnt", "meta",
        # report output columns (quantile + heavy-hitter surfaces)
        "q", "rank_target", "est_rank", "n_total", "max_rank_err",
        "count_lo", "count_hi", "max_err",
        # meta pivot labels (become columns in the reports) and the
        # internal temp columns of the re-bound/report plans
        "dec", "n", "err", "_rk", "_t", "_w", "_cum",
    }
)


def _check_q_keys(keys, df: DataFrame | None = None) -> None:
    """Shared fail-fast validation for the grouped faces: keys must be
    non-empty (an empty key list would otherwise produce a silent
    NULL-condition join in the report and a bare TypeError in the
    merge), must not collide with the summary/report's own column
    names (a key literally named 'value' would alias the data column
    inside the Arrow pass), and — when a frame is supplied — must not
    be float/double columns: the Arrow passes' pandas
    ``groupby(dropna=False)`` labels NaN as NA, which
    :func:`_norm_key` must fold to None for the memory bound, so a
    float key's NaN group would silently merge into the NULL group —
    diverging from Spark ``groupBy`` (NaN is its own group) and from
    the exact faces. Rejected rather than normalized (r9 ADVICE):
    sketch-grouping BY a float column is a smell — cast to a discrete
    type first and the cast makes the binning explicit."""
    if not keys:
        raise ValueError(
            "keys must be non-empty (the quantile_* functions are the "
            "ungrouped face)"
        )
    bad = sorted(set(keys) & _RESERVED_Q_COLS)
    if bad:
        raise ValueError(
            f"key column(s) {bad} collide with reserved summary/report "
            f"columns {sorted(_RESERVED_Q_COLS)} — rename before grouping"
        )
    if df is not None:
        from pyspark.sql.types import DoubleType, FloatType

        floaty = [
            c for c in keys
            if isinstance(df.schema[c].dataType, (FloatType, DoubleType))
        ]
        if floaty:
            raise ValueError(
                f"float/double grouping key(s) {floaty} are not "
                "supported by the grouped sketch faces (NaN would "
                "conflate with NULL in the Arrow passes, diverging "
                "from Spark groupBy); cast to string/decimal/int first"
            )


def grouped_quantile_summary(
    df: DataFrame, keys: list[str], col: str, k: int = 4096,
    rebound: bool = True,
) -> DataFrame:
    """Per-key quantile summary: :func:`quantile_summary`'s contract
    with every guarantee (exact mass conservation, carried rank-error
    budget, ≤ k items per level after re-bound) holding PER KEY GROUP —
    rows ``(keys..., value, level, cnt, meta)``. NULL keys are real
    groups (null-safe throughout, the incremental_rollup lesson);
    float/double KEY columns are rejected up front — NaN would
    conflate with NULL inside the Arrow passes (see
    :func:`_check_q_keys`), cast to a discrete type first. Use
    for per-source / per-language corpus profiles; at very high key
    cardinality note the per-task build state is
    distinct-keys-per-partition × k items (pre-partition by key or fall
    back to `relational.grouped_percentiles` when each group fits a
    sort)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    _check_q_keys(keys, df)
    vals = df.select(
        *[F.col(c) for c in keys], F.col(col).cast("double").alias("value")
    )
    rows = vals.mapInPandas(
        _q_grouped_build_partition(keys, int(k)),
        schema=_grouped_schema(vals, keys),
    )
    pooled = rows.groupBy(*keys, "meta", "level", "value").agg(
        F.sum("cnt").alias("cnt")
    )
    if not rebound:
        return pooled  # lazy merge input, same contract as the ungrouped
    return _grouped_rebound(pooled, keys, int(k))


def merge_grouped_quantile_summaries(
    a: DataFrame, b: DataFrame | None, keys: list[str], k: int = 4096
) -> DataFrame:
    """Merge two per-key summaries (outer on keys — a key on one side
    passes through re-bounded; on both, masses and budgets add and
    overfull levels re-compact). ``b=None`` re-bounds ``a`` alone."""
    if k < 2:
        raise ValueError("k must be >= 2")
    _check_q_keys(keys, a)
    u = a if b is None else a.unionByName(b)
    pooled = u.groupBy(*keys, "meta", "level", "value").agg(
        F.sum("cnt").alias("cnt")
    )
    return _grouped_rebound(pooled, keys, int(k))


def grouped_quantile_report(
    summary: DataFrame, keys: list[str], qs: list[float]
) -> DataFrame:
    """Render a per-key summary at probe points ``qs``: one row per
    (key group, q) — ``(keys..., q, value, rank_target, est_rank,
    n_total, max_rank_err)`` with the per-key bracket guarantee. The
    window and joins are summary-sized and partitioned BY KEY (no
    single-partition window here, unlike the ungrouped report)."""
    spark = summary.sparkSession
    _check_q_keys(keys)
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (0.0 <= float(q) <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    meta = (
        summary.filter(F.col("meta").isNotNull())
        .groupBy(*keys)
        .pivot("meta", [_META_ERR, _META_N])
        .sum("cnt")
        .select(
            *keys,
            F.coalesce(F.col(_META_ERR), F.lit(0)).alias("max_rank_err"),
            F.coalesce(F.col(_META_N), F.lit(0)).alias("n_total"),
        )
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in keys])
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    data = (
        summary.filter(F.col("meta").isNull())
        .withColumn("_w", F.expr("cnt * shiftleft(1L, level)"))
        .groupBy(*keys, "value")
        .agg(F.sum("_w").alias("_w"))
        .withColumn("_cum", F.sum("_w").over(w))
        .select(*keys, "value", "_cum")
        .alias("d")
    )
    from datamunging_spark.sources.io import local_table

    qdf = local_table(spark, [(float(q),) for q in qs], "q double")
    targets = (
        meta.crossJoin(F.broadcast(qdf))
        .withColumn(
            "rank_target",
            F.greatest(
                F.lit(1).cast("long"),
                F.ceil(F.col("q") * F.col("n_total")).cast("long"),
            ),
        )
        .alias("t")
    )
    hits = (
        targets.join(
            data,
            _nullsafe_key_cond("t", "d", keys)
            & (F.col("d._cum") >= F.col("t.rank_target")),
            "left",
        )
        .groupBy(
            *[F.col(f"t.{c}") for c in keys],
            "t.q",
            "t.rank_target",
            "t.n_total",
            "t.max_rank_err",
        )
        .agg(
            F.min_by("d.value", "d._cum").alias("value"),
            F.coalesce(F.min("d._cum"), F.lit(0)).alias("est_rank"),
        )
    )
    return hits.select(
        *keys, "q", "value", "rank_target", "est_rank",
        "n_total", "max_rank_err",
    )


# --- grouped heavy hitters -------------------------------------------------
#
# Per-key frequent items ("top domains PER LANGUAGE at bounded shuffle")
# — the keyed face of the MG leg, completing per-key coverage across the
# sketch trio (distinct counts are keyed by construction, quantiles grew
# grouped faces above). Exact face: `relational.top_k_per_group`. Same
# cardinality trade as the other grouped faces: the build holds ≤ k
# counters per key PRESENT IN ITS PARTITION. The per-key Agarwal
# re-bound is pure DataFrame algebra — a rank window per key finds each
# key's (k+1)-th counter, the subtraction is charged to that key's
# 'dec' budget by EMITTING the cut as a dec-delta meta row and
# re-aggregating (no null-unsafe key join anywhere).


def _mg_grouped_partition(keys: list[str], k: int):
    """Per-partition keyed Misra-Gries: dict key-tuple → counters."""

    def run(batches):
        import numpy as np
        import pandas as pd

        states = {}  # key tuple -> [counters Series, dec, n]
        for pdf in batches:
            for kt, grp in pdf.groupby(keys, dropna=False, sort=False):
                kt = _norm_key(kt)
                vals = grp["value"].dropna()
                if not len(vals):
                    continue
                st = states.get(kt)
                if st is None:
                    st = [pd.Series(dtype="int64"), 0, 0]
                    states[kt] = st
                st[2] += len(vals)
                vc = vals.value_counts()
                st[0] = st[0].add(vc, fill_value=0).astype("int64")
                if len(st[0]) > k:
                    arr = st[0].to_numpy()
                    t = int(np.partition(arr, -(k + 1))[-(k + 1)])
                    st[1] += t
                    st[0] = st[0][st[0] > t] - t
        frames = []
        for kt, (counters, dec, n) in states.items():
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
            out = pd.concat([out, meta], ignore_index=True)
            for name, kv in zip(keys, kt):
                out.insert(0, name, [kv] * len(out))
            frames.append(out[keys + ["value", "cnt", "meta"]])
        if frames:
            yield pd.concat(frames, ignore_index=True)

    return run


def _grouped_hh_schema(df: DataFrame, keys: list[str]) -> StructType:
    return StructType(
        [df.schema[name] for name in keys]
        + [
            StructField("value", StringType()),
            StructField("cnt", LongType()),
            StructField("meta", StringType()),
        ]
    )


def grouped_hh_summary(
    df: DataFrame, keys: list[str], col: str, k: int = 4096
) -> DataFrame:
    """Per-key Misra-Gries summary of ``col``: hh_summary's contract
    (count bracket, per-key n/(k+1) error floor, mergeable state,
    budgets in per-key 'dec'/'n' meta rows) holding PER KEY GROUP.
    NULL keys are real groups; NULL values excluded from each key's n;
    float/double KEY columns are rejected up front (NaN/NULL
    conflation hazard — see :func:`_check_q_keys`).
    Data rows per key can exceed ``k`` here (union of per-partition
    summaries) — :func:`merge_grouped_hh_summaries` re-bounds per key.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    _check_q_keys(keys, df)
    vals = df.select(
        *[F.col(c) for c in keys], F.col(col).cast("string").alias("value")
    )
    rows = vals.mapInPandas(
        _mg_grouped_partition(keys, int(k)),
        schema=_grouped_hh_schema(vals, keys),
    )
    return (
        rows.groupBy(*keys, "meta", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )


def merge_grouped_hh_summaries(
    a: DataFrame, b: DataFrame | None, keys: list[str], k: int = 4096
) -> DataFrame:
    """Merge per-key summaries and re-bound EVERY key to ≤ ``k`` data
    rows with the Agarwal rule applied per key: a rank window finds
    each key's (k+1)-th counter t_key, all of that key's counters drop
    by t_key (≤ 0 pruned), and t_key is charged to the key's 'dec'
    budget by emitting it as a dec-delta meta row and re-aggregating —
    no key join, so NULL keys need no special casing. Everything is
    summary-sized; ``b=None`` re-bounds ``a`` alone (first-batch seed).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    _check_q_keys(keys, a)
    u = a if b is None else a.unionByName(b)
    merged = (
        u.groupBy(*keys, "meta", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )
    data = merged.filter(F.col("meta").isNull())
    meta = merged.filter(F.col("meta").isNotNull())
    wrk = Window.partitionBy(*[F.col(c) for c in keys]).orderBy(
        F.desc("cnt"), F.asc("value")
    )
    wall = Window.partitionBy(*[F.col(c) for c in keys]).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = data.withColumn("_rk", F.row_number().over(wrk)).withColumn(
        "_t",
        F.coalesce(
            F.max(F.when(F.col("_rk") == k + 1, F.col("cnt"))).over(wall),
            F.lit(0),
        ),
    )
    rebound = (
        ranked.withColumn("cnt", F.col("cnt") - F.col("_t"))
        .filter(F.col("cnt") > 0)
        .drop("_rk", "_t")
    )
    # charge each key's cut to its dec budget WITHOUT a key join: emit
    # one dec-delta meta row per cut key and let the groupBy fold it
    dec_delta = (
        ranked.filter(F.col("_rk") == k + 1)
        .select(
            *keys,
            F.lit(None).cast("string").alias("value"),
            F.col("cnt").alias("cnt"),
            F.lit(_META_DEC).alias("meta"),
        )
    )
    return (
        rebound.unionByName(meta)
        .unionByName(dec_delta)
        .groupBy(*keys, "meta", "value")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint()
    )


def grouped_hh_report(
    summary: DataFrame, keys: list[str], min_share: float | None = None
) -> DataFrame:
    """Render a per-key summary into ``(keys..., value, count_lo,
    count_hi, n_total, max_err)`` with per-key brackets; ``min_share``
    keeps values that COULD reach that share of THEIR key's rows."""
    _check_q_keys(keys)
    meta = (
        summary.filter(F.col("meta").isNotNull())
        .groupBy(*keys)
        .pivot("meta", [_META_DEC, _META_N])
        .sum("cnt")
        .select(
            *keys,
            F.coalesce(F.col(_META_DEC), F.lit(0)).alias("max_err"),
            F.coalesce(F.col(_META_N), F.lit(0)).alias("n_total"),
        )
        .alias("m")
    )
    data = (
        summary.filter(F.col("meta").isNull() & F.col("value").isNotNull())
        .select(*keys, "value", F.col("cnt").alias("count_lo"))
        .alias("d")
    )
    # no broadcast hint: meta is one row per KEY GROUP, which at the
    # high-cardinality regimes this sketch targets can exceed the
    # broadcast limit — let AQE pick (the ungrouped report's broadcast
    # is safe only because its meta is a single row)
    out = data.join(meta, _nullsafe_key_cond("d", "m", keys)).select(
        *[F.col(f"d.{c}") for c in keys],
        "d.value",
        "d.count_lo",
        (F.col("d.count_lo") + F.col("m.max_err")).alias("count_hi"),
        "m.n_total",
        "m.max_err",
    )
    if min_share is not None:
        out = out.filter(
            F.col("count_hi") >= F.col("n_total") * F.lit(float(min_share))
        )
    return out


def grouped_heavy_hitters(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = 4096,
    min_share: float | None = None,
) -> DataFrame:
    """One-shot per-key heavy hitters: summary → per-key re-bound →
    report (split faces exist for the incremental/streaming fold;
    `relational.top_k_per_group` is the exact face)."""
    return grouped_hh_report(
        merge_grouped_hh_summaries(
            grouped_hh_summary(df, keys, col, k), None, keys, k
        ),
        keys,
        min_share,
    )
