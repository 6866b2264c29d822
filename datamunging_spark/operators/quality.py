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


def accepted_values_rule(
    name: str, col: str, values: list, allow_null: bool = False
) -> Rule:
    """dbt-style ``accepted_values`` contract: the column must be one of
    ``values`` (NULL fails unless ``allow_null``). Listing ``None`` among
    ``values`` is equivalent to ``allow_null=True`` (SQL ``isin`` can
    never match NULL, so it is lifted out rather than silently ignored)."""
    if any(v is None for v in values):
        allow_null = True
        values = [v for v in values if v is not None]
    pred = F.col(col).isin(values) if values else F.lit(False)
    if allow_null:
        pred = pred | F.col(col).isNull()
    else:
        pred = F.coalesce(pred, F.lit(False))
    return Rule(name, pred)


def range_rule(
    name: str, col: str, lo=None, hi=None, allow_null: bool = False
) -> Rule:
    """Numeric bounds contract: ``lo <= col <= hi`` (either side open when
    None; NULL fails unless ``allow_null``). At least one bound is
    required — a bound-less rule would validate nothing while looking
    like a contract."""
    if lo is None and hi is None:
        raise ValueError(f"range_rule {name!r}: provide lo and/or hi")
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= lo)
    if hi is not None:
        pred = pred & (F.col(col) <= hi)
    if allow_null:
        pred = pred | F.col(col).isNull()
    else:
        pred = F.coalesce(pred, F.lit(False))
    return Rule(name, pred)


def unique_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """dbt-style ``unique`` contract, cross-row so not a per-row Rule:
    key tuples appearing more than once, with their multiplicities —
    empty result = contract holds. One hash aggregate on the key (NULL
    keys group and report like any value). At 100 TB this is the same
    uniform-key shuffle as exact dedup."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def referential_report(
    child: DataFrame,
    parent: DataFrame,
    child_cols: list[str],
    parent_cols: list[str] | None = None,
) -> DataFrame:
    """dbt-style ``relationships`` contract: child keys with no matching
    parent row, with occurrence counts — empty result = every foreign key
    resolves. NULL child keys are excluded per SQL FK convention (a NULL
    FK is "no reference", not a broken one).

    Scale shape: aggregate the child side to distinct keys FIRST (one
    uniform shuffle), then LEFT ANTI join against the parent's key
    projection — the anti join's build side is the slim parent key set,
    and with AQE it broadcasts when small."""
    parent_cols = parent_cols or child_cols
    keys = child
    for c in child_cols:
        keys = keys.filter(F.col(c).isNotNull())
    agg = keys.groupBy(*child_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    p = parent.select(
        *[F.col(pc).alias(cc) for cc, pc in zip(child_cols, parent_cols)]
    )
    return agg.join(p, child_cols, "left_anti")


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


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 20,
    target_rows_per_task: int = 5_000_000,
) -> DataFrame:
    """Join/agg-key skew diagnosis: the ``top_n`` hottest key values with
    row count, fraction of the table, and the salt factor that would cap
    each hot key's per-task row count at ``target_rows_per_task`` — the
    number to hand :func:`~datamunging_spark.operators.relational.
    salted_join` (or to confirm AQE's skew split suffices).

    One count aggregate on the keys + a 1-row total broadcast + a bounded
    top-n sort (``orderBy.limit`` plans as TakeOrderedAndProject — per-
    partition heaps, never a global sort). NULL keys report like any
    value, since NULL-heavy columns are the most common real skew.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("fraction"),
            F.greatest(
                F.lit(1),
                F.ceil(F.col("cnt") / F.lit(target_rows_per_task)),
            ).cast("int").alias("suggested_salt"),
        )
        .orderBy(F.desc("cnt"), *key_cols)
        .limit(top_n)
    )


def psi_report(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index drift report between two snapshots of a
    numeric column — the standard "did the distribution move" monitor a
    curation pipeline runs between crawls (PSI < 0.1 stable, 0.1-0.25
    moderate shift, > 0.25 action; the usual credit-scoring rule of thumb).

    Bucket edges are the baseline's ``bins``-quantiles (exact interpolated
    percentile, one aggregate; ``bins - 1`` doubles collected to the
    driver — bounded by the bin count, not data). Both frames then bucket
    through the same CASE ladder and aggregate to per-bucket fractions;
    one output row per bucket with both fractions and the PSI term
    (``eps``-floored so empty buckets stay finite). Total PSI = SUM over
    the returned rows — left to the caller so the per-bucket attribution
    stays visible.
    """
    v = F.col(value_col).cast("double")
    qs = [i / bins for i in range(1, bins)]
    edges_row = baseline.agg(
        F.percentile(v, F.array(*[F.lit(q) for q in qs])).alias("e")
    ).collect()[0]["e"]
    if edges_row is None:
        raise ValueError(
            f"psi_report: baseline has no non-null values in "
            f"{value_col!r}; cannot derive quantile bucket edges"
        )
    edges = [float(e) for e in edges_row]

    def bucketize(frame: DataFrame) -> DataFrame:
        b = F.lit(bins - 1)
        for i in reversed(range(len(edges))):
            b = F.when(v <= edges[i], F.lit(i)).otherwise(b)
        n = frame.filter(v.isNotNull())
        counts = n.groupBy(b.alias("bucket")).agg(
            F.count(F.lit(1)).alias("_n")
        )
        tot = counts.agg(F.sum("_n").alias("_t"))
        return counts.crossJoin(F.broadcast(tot)).select(
            "bucket", (F.col("_n") / F.col("_t")).alias("frac")
        )

    base = bucketize(baseline).withColumnRenamed("frac", "p_base")
    cur = bucketize(current).withColumnRenamed("frac", "p_cur")
    spark = baseline.sparkSession
    all_buckets = spark.range(bins).select(
        F.col("id").cast("int").alias("bucket")
    )
    joined = (
        all_buckets.join(base, "bucket", "left")
        .join(cur, "bucket", "left")
        .fillna(0.0, ["p_base", "p_cur"])
    )
    pb = F.greatest(F.col("p_base"), F.lit(eps))
    pc = F.greatest(F.col("p_cur"), F.lit(eps))
    return joined.withColumn(
        "psi_term", (pc - pb) * F.log(pc / pb)
    ).orderBy("bucket")
