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


def validation_summary(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Engine extension: one-pass multi-rule summary — for each rule, total
    and failing row counts. Single aggregate, no joins: each rule becomes a
    conditional SUM, so 100 rules still cost one scan."""
    aggs = [F.count(F.lit(1)).alias("total_rows")] + [
        F.sum(F.when(~r.predicate, 1).otherwise(0)).alias(f"{r.name}_failed")
        for r in rules
    ]
    return df.agg(*aggs)
