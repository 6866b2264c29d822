"""Data-quality validation reports (README.md:122-147 generalized).

The reference's Data Quality chapter is one pattern: compute a validation
column, keep failing rows, aggregate a report (Pig script README.md:126-132:
load → REGEX_EXTRACT → filter is-null → group → count → store). We generalize
rule → report over arbitrary rules, all expression-only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datamunging_spark.functions import regex_extract


@dataclass(frozen=True)
class Rule:
    """A validation rule: name + boolean Column expression (True = valid)."""

    name: str
    predicate: Column


def regex_rule(name: str, col: str, pattern: str) -> Rule:
    """Reference-shaped rule (README.md:127-128): value must match
    ``pattern`` (Pig NULL-on-non-match semantics)."""
    return Rule(name, regex_extract(col, pattern, 1).isNotNull())


def not_empty_rule(name: str, col: str) -> Rule:
    """README.md:117 ``WHERE npi != ''`` shape."""
    return Rule(name, (F.col(col).isNotNull()) & (F.col(col) != ""))


def invalid_rows(df: DataFrame, rule: Rule) -> DataFrame:
    """Rows failing ``rule`` (the filtered Pig relation, README.md:128)."""
    return df.filter(~rule.predicate)


def invalid_value_report(
    df: DataFrame, rule: Rule, group_col: str, out: str = "cnt"
) -> DataFrame:
    """The reference's bad-codes report (README.md:126-132): distinct failing
    values with frequencies. One shuffle on ``group_col``."""
    return (
        invalid_rows(df, rule)
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias(out))
    )


def dataset_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column profile: nulls, distincts, min/max — the standard
    data-quality census. One aggregate row computed in a single scan, then
    unpivoted to one row per column via ``stack`` (no per-column jobs).
    min/max/distinct operate on the string form so heterogeneous column
    types share one output schema.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(s).alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as "
        "(column, n_rows, n_nulls, n_distinct, min_str, max_str)"
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-source corpus census — the one-line-per-source summary a
    curation run logs before/after each stage: doc and token counts,
    distinct normalized contents, the implied duplicate rate, and mean
    document length. One hash-aggregate on the (low-cardinality) source
    key; all expressions, so the same census runs pre- and post-curation
    for stage-by-stage shrinkage accounting.
    """
    from datamunging_spark.functions import normalize_text, token_count

    c = F.coalesce(F.col(text_col), F.lit(""))
    # token_count keeps empty tokens (str.split(' ') parity) — right for
    # R22, wrong for a census; count over the whitespace-collapsed form.
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(normalize_text(c)).cast("long")).alias(
                "n_tokens"
            ),
            F.countDistinct(F.md5(normalize_text(c))).alias("n_distinct"),
            F.round(F.avg(F.length(c)), 6).alias("avg_chars"),
        )
        .withColumn(
            "dup_rate",
            F.round(1 - F.col("n_distinct") / F.col("n_docs"), 6),
        )
    )


def validation_summary(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Engine extension: one-pass multi-rule summary — for each rule, total
    and failing row counts. Single aggregate, no joins: each rule becomes a
    conditional SUM, so 100 rules still cost one scan."""
    aggs = [F.count(F.lit(1)).alias("total_rows")] + [
        F.sum(F.when(~r.predicate, 1).otherwise(0)).alias(f"{r.name}_failed")
        for r in rules
    ]
    return df.agg(*aggs)


def outlier_flags(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    z_thresh: float = 3.0,
    iqr_k: float = 1.5,
) -> DataFrame:
    """Per-group outlier detection: classic z-score AND Tukey IQR fences
    (engine extension; the profiling step a curation run applies to numeric
    quality metrics before thresholding them).

    Adds four columns: ``zscore`` (NULL when the group's stddev is 0 or the
    group has one row), ``is_z_outlier`` (|z| > z_thresh), ``is_iqr_outlier``
    (outside [q1 - k·iqr, q3 + k·iqr], exact interpolated quartiles), and
    ``is_outlier`` (either flag). NULL values get NULL flags.

    Scale shape: ONE aggregate over the group keys computes mean/stddev/q1/q3
    together (the exact ``percentile`` buffers values per group — switch
    points to ``percentile_approx`` inside callers' forks if single groups
    exceed executor memory), then one join back to the facts — identical to
    percentile_bucketize's agg+join shape, broadcast-eligible via AQE when
    key cardinality is small. No global pass when ``keys`` is None: a single
    1-row aggregate broadcast-joins instead.
    """
    v = F.col(value_col).cast("double")
    aggs = [
        F.avg(v).alias("_mu"),
        F.stddev_samp(v).alias("_sigma"),
        F.percentile(v, F.lit(0.25)).alias("_q1"),
        F.percentile(v, F.lit(0.75)).alias("_q3"),
    ]
    if keys:
        # null-safe key equality: groupBy keeps the NULL-key group, so the
        # join back must too (plain `on=keys` would silently strand it)
        stats = df.groupBy(*keys).agg(*aggs).select(
            *[F.col(k).alias(f"_sk_{k}") for k in keys],
            "_mu", "_sigma", "_q1", "_q3",
        )
        cond = F.lit(True)
        for k in keys:
            cond = cond & F.col(k).eqNullSafe(F.col(f"_sk_{k}"))
        joined = df.join(stats, cond, "left").drop(
            *[f"_sk_{k}" for k in keys]
        )
    else:
        stats = df.agg(*aggs)
        # 1-row × n broadcast join (the text.py corpus-count shape)
        joined = df.crossJoin(F.broadcast(stats))
    z = F.when(F.col("_sigma") > 0, (v - F.col("_mu")) / F.col("_sigma"))
    iqr = F.col("_q3") - F.col("_q1")
    lo, hi = F.col("_q1") - iqr_k * iqr, F.col("_q3") + iqr_k * iqr
    return (
        joined.withColumn("zscore", z)
        .withColumn(
            "is_z_outlier",
            F.when(v.isNull(), F.lit(None)).otherwise(
                F.coalesce(F.abs(z) > z_thresh, F.lit(False))
            ),
        )
        .withColumn(
            "is_iqr_outlier",
            F.when(v.isNull(), F.lit(None)).otherwise((v < lo) | (v > hi)),
        )
        .withColumn(
            "is_outlier", F.col("is_z_outlier") | F.col("is_iqr_outlier")
        )
        .drop("_mu", "_sigma", "_q1", "_q3")
    )
