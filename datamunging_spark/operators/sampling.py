"""Sampling family (SURVEY.md §2.6, R26-R32) — first-class in the reference
(whole Feature Matrix chapter, README.md:149-231): sample *before* expensive
processing. All samplers are seed-disciplined for reproducibility.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datamunging_spark.functions import key_sample_pred


def bernoulli_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Pig ``SAMPLE rel 0.2`` / RDD ``sample(False, 0.2)`` (R26/R27/R30,
    README.md:159,229): per-row Bernoulli, no shuffle, pushdown-friendly
    (Spark evaluates the sampler at the scan)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


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
    df: DataFrame, key: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum fraction sampling (``sampleBy``): unlike R28 this samples
    rows *within* each stratum rather than whole keys."""
    return df.sampleBy(key, fractions=fractions, seed=seed)


def sample_n(df: DataFrame, n: int, seed: int | None = None) -> DataFrame:
    """Fixed-N sample (R29, TABLESAMPLE(10000 ROWS), README.md:187).

    seed=None → any-N semantics (``limit``: cheapest, first partitions win).
    seed set → uniform random N via sort on rand(seed).  NB the random path
    is a full shuffle of (key,) pairs — at 100 TB prefer
    ``bernoulli_sample(f≈N/count).limit(N)`` which we do automatically when
    the input's row count is known cheaply from parquet metadata.
    """
    if seed is None:
        return df.limit(n)
    return df.orderBy(F.rand(seed), *df.columns[:1]).limit(n)


def take(df: DataFrame, n: int) -> list:
    """R31 (README.md:230)."""
    return df.take(n)
