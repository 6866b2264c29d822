"""Sampling family (SURVEY.md §2.6, R26-R32) — first-class in the reference
(whole Feature Matrix chapter, README.md:149-231): sample *before* expensive
processing. All samplers are seed-disciplined for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datamunging_spark.functions import key_sample_pred, row_sample_pred


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Pig ``SAMPLE rel 0.2`` / RDD ``sample(False, 0.2)`` (R26/R27/R30,
    README.md:159,229): per-row Bernoulli, no shuffle, pushdown-friendly
    (Spark evaluates the sampler at the scan)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def bernoulli_sample_portable(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    precision: int = 4,
) -> DataFrame:
    """Bernoulli row sample via a portable md5 row-key predicate (R26/R27/R30
    semantics) — deterministic on any engine AND any partitioning, unlike
    the seeded RNG path whose stream is partition-dependent. Pure filter:
    no shuffle, evaluated at the scan. Use when the sample must be exactly
    reproducible outside Spark (e.g. cross-engine lineage of what went into
    a training set); use :func:`bernoulli_sample` when statistical
    independence from the key bits matters more."""
    return df.filter(row_sample_pred(key_cols, fraction, precision))


def sample_by_key(df: DataFrame, key: str, percent: int = 20) -> DataFrame:
    """All-or-none per-key sample (R28) — the operation the reference's
    DataFu ``SampleByKey`` example intended but could not run
    (README.md:173-179). Deterministic md5-prefix predicate: every row of a
    kept key survives; no shuffle, no state, identical result on any engine
    and any partitioning. ``percent`` is approximate (hex-prefix granularity
    1/256)."""
    threshold = int(round(percent / 100.0 * 256)) - 1
    return df.filter(key_sample_pred(key, format(max(threshold, 0), "02x")))


def stratified_sample(
    df: DataFrame,
    key: str,
    fractions: dict,
    seed: int = 42,
    id_cols: list[str] | None = None,
    precision: int = 4,
) -> DataFrame:
    """Per-stratum fraction sampling: unlike R28 this samples rows *within*
    each stratum rather than whole keys. Strata absent from ``fractions``
    are dropped (sampleBy semantics).

    ``id_cols`` given → portable path, same discipline as
    :func:`bernoulli_sample_portable`: a seeded md5 over the row key maps
    each row to a uniform hex bucket, kept when it falls below its
    stratum's threshold — a pure codegen filter (no shuffle, no RNG
    stream), bit-identical on any engine AND any partitioning. The
    stratum threshold rides a tiny ``create_map`` literal, so one CASE-free
    comparison serves every stratum. Fraction granularity 16^-precision.

    ``id_cols=None`` → native ``sampleBy``, whose rand(seed) stream is
    partition-layout-dependent: seed-stable only for a fixed layout. Use
    it when no unique row key exists and cross-run reproducibility is not
    required.
    """
    if id_cols is None:
        return df.sampleBy(key, fractions=fractions, seed=seed)
    scale = 16**precision
    pairs = []
    for v, frac in fractions.items():
        thr = scale if frac >= 1.0 else max(0, int(frac * scale))
        pairs += [F.lit(v), F.lit(thr)]
    thresholds = F.create_map(*pairs)
    from datamunging_spark.functions import salted_row_key

    # the ONE salted-key definition (functions.salted_row_key) — an
    # inline md5(concat_ws(...)) copy here could drift and silently break
    # cross-function key compatibility
    u = F.conv(
        F.substring(salted_row_key(list(id_cols), str(seed)), 1, precision),
        16,
        10,
    ).cast("long")
    return df.filter(
        u < F.coalesce(thresholds.getItem(F.col(key)), F.lit(0))
    )


def _plan_row_count(df: DataFrame) -> int | None:
    """Row count from Catalyst plan statistics, if the optimizer already
    knows it (CBO/ANALYZE'd tables, LocalRelation, cached plans). Returns
    None when only sizeInBytes is available — no job is ever triggered."""
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        # py4j converts the Scala BigInt straight to a Python int.
        return int(rc.get()) if rc.isDefined() else None
    except Exception:  # noqa: BLE001 — py4j/private-API guard
        return None


def sample_n(
    df: DataFrame,
    n: int,
    seed: int | None = None,
    total_rows: int | None = None,
) -> DataFrame:
    """Fixed-N sample (R29, TABLESAMPLE(10000 ROWS), README.md:187).

    seed=None → any-N semantics (``limit``: cheapest, first partitions win —
    Hive's TABLESAMPLE(N ROWS) behavior).

    seed set → uniform random N. Scale shape: shrink the input FIRST with a
    Bernoulli pre-filter of expected size ~1.5·n (fraction needs the total
    row count: ``total_rows`` if given, else Catalyst plan statistics, else
    one counting pass — parquet count() reads footer metadata only, far
    cheaper than ranking every row), THEN rank the survivors by rand(seed).
    The final orderBy+limit compiles to TakeOrderedAndProject (per-partition
    top-n heaps, merge of n·partitions rows — never a full sort), so even
    the no-count fallback is not a global sort; the pre-filter just shrinks
    the heaped input from N_total to ~1.5·n rows. The pre-filter is seeded
    independently (seed+1) of the ranking (seed), so the composition stays
    uniform. Shortfall (sample < n rows) probability at 1.5× + 16
    oversampling is < 1e-9 for any n ≥ 1 (Chernoff).
    """
    if seed is None:
        return df.limit(n)
    total = total_rows if total_rows is not None else _plan_row_count(df)
    if total is None:
        total = df.count()
    if total > 2 * n:
        frac = min(1.0, (1.5 * n + 16.0) / total)
        df = df.sample(withReplacement=False, fraction=frac, seed=seed + 1)
    return df.orderBy(F.rand(seed), *df.columns[:1]).limit(n)


def take(df: DataFrame, n: int) -> list:
    """R31 (README.md:230)."""
    return df.take(n)


def cap_per_group(
    df: DataFrame,
    key_cols: list[str],
    n: int,
    id_cols: list[str] | None = None,
    salt: str = "0",
) -> DataFrame:
    """Deterministic at-most-``n``-rows-per-group cap — the training-mix
    guardrail that stops one domain/source from dominating a corpus.

    Rows within a group are ranked by a salted md5 of ``id_cols`` (the
    shared :func:`~datamunging_spark.functions.salted_row_key`, so the kept
    subset is a reproducible pseudo-random choice, not 'whatever the scan
    returned first', and changes wholesale with ``salt``), then
    row_number ≤ n. One window exchange on the group key; groups are
    independent so AQE skew handling applies to a hot group's sort.
    ``id_cols=None`` defaults to all non-key columns; the chosen columns
    must uniquely identify a row within its group, or rank ties fall back
    to partition-scan order and the cap stops being deterministic.
    """
    from datamunging_spark.functions import salted_row_key

    if not key_cols or (id_cols is not None and not id_cols):
        raise ValueError("key_cols and id_cols must be non-empty")
    ids = (
        id_cols
        if id_cols is not None
        else [c for c in df.columns if c not in key_cols]
    )
    w = Window.partitionBy(*key_cols).orderBy(
        salted_row_key(ids, salt).asc(), *ids
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
