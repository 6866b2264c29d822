"""Heavy-hitter sketch family (operators/sketch.py): exact baseline,
Misra-Gries guarantees (superset of exact, count bracketing, error
floor), exactness below k, empty-input robustness."""

import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.sketch import (
    heavy_hitters,
    heavy_hitters_exact,
)


def _skewed(spark, n_heavy=5, heavy_count=400, n_tail=8000):
    """5 planted heavy keys (400 rows each) over a big distinct tail
    (1 row each): distinct keys >> any reasonable k."""
    heavy = [(f"heavy_{i}",) for i in range(n_heavy) for _ in range(heavy_count)]
    tail = [(f"tail_{j}",) for j in range(n_tail)]
    return spark.createDataFrame(heavy + tail, "value string").repartition(8)


def test_heavy_hitters_exact_basic(spark):
    df = _skewed(spark)
    n = 5 * 400 + 8000
    out = {r.value: r for r in heavy_hitters_exact(df, "value", 0.01).collect()}
    assert set(out) == {f"heavy_{i}" for i in range(5)}
    assert all(out[v]["count"] == 400 for v in out)
    assert all(abs(out[v]["share"] - 400 / n) < 1e-12 for v in out)


def test_heavy_hitters_sketch_supersets_exact_and_brackets_counts(spark):
    df = _skewed(spark)
    n = 5 * 400 + 8000
    min_share = 0.01  # threshold 100 rows; heavies are 400
    exact = {r.value for r in heavy_hitters_exact(df, "value", min_share).collect()}
    sk = heavy_hitters(df, "value", k=64, min_share=min_share)
    rows = {r.value: r for r in sk.collect()}
    # no false negatives: every exact heavy hitter survives the sketch
    assert exact <= set(rows)
    truth = {
        r.value: r.cnt
        for r in df.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for v, r in rows.items():
        assert r.count_lo <= truth[v] <= r.count_hi, v
        assert r.n_total == n
        # d_i <= n_i/(k+1) summed over 8 partitions
        assert r.max_err <= n / (64 + 1) * 8


def test_heavy_hitters_exact_below_k(spark):
    """Fewer distinct keys than k: zero decrements, counts exact."""
    df = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(700)], "value string"
    ).repartition(4)
    out = {r.value: r for r in heavy_hitters(df, "value", k=50).collect()}
    assert set(out) == {f"v{i}" for i in range(7)}
    for r in out.values():
        assert r.max_err == 0
        assert r.count_lo == r.count_hi == 100
        assert r.n_total == 700


def test_heavy_hitters_nulls_and_types(spark):
    """NULLs excluded from counting; non-string col stringified."""
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "value int"
    )
    out = {r.value: r.count_lo for r in heavy_hitters(df, "value", k=10).collect()}
    assert out == {"1": 2, "2": 1}
    ex = {r.value: r["count"] for r in heavy_hitters_exact(df, "value", 0.0).collect()}
    assert ex == {1: 2, 2: 1}


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "value string")
    assert heavy_hitters(df, "value", k=10).count() == 0
    assert heavy_hitters_exact(df, "value", 0.01).count() == 0


def test_heavy_hitters_k_validation(spark):
    df = spark.createDataFrame([("a",)], "value string")
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "value", k=0)


def test_heavy_hitters_summary_is_bounded(spark):
    """The shuffle-side summary is <= partitions x (k+2) rows regardless
    of the distinct-key count — the whole point of the sketch."""
    df = _skewed(spark)  # 8005 distinct keys over 8 partitions
    k = 16
    sk = heavy_hitters(df, "value", k=k)
    # every surviving counter row came from some partition's <=k counters
    assert sk.count() <= 8 * k