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


def test_merge_hh_summaries_bounds_survive_the_fold(spark):
    """Mergeable-summaries property: folding two halves' summaries gives
    a report whose guarantees hold for the COMBINED data — superset of
    exact heavies, count bracketing — and the merged state is re-bounded
    to <= k data rows."""
    from datamunging_spark.operators.sketch import (
        hh_report,
        hh_summary,
        merge_hh_summaries,
    )

    df = _skewed(spark)
    n = 5 * 400 + 8000
    h1 = df.filter(F.crc32(F.col("value")) % 2 == 0)
    h2 = df.filter(F.crc32(F.col("value")) % 2 == 1)
    k = 64
    merged = merge_hh_summaries(
        hh_summary(h1, "value", k), hh_summary(h2, "value", k), k
    )
    assert merged.filter(F.col("meta").isNull()).count() <= k
    rep = {r.value: r for r in hh_report(merged, min_share=0.01).collect()}
    exact = {
        r.value for r in heavy_hitters_exact(df, "value", 0.01).collect()
    }
    assert exact <= set(rep)
    truth = {
        r.value: r.cnt
        for r in df.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for v, r in rep.items():
        assert r.count_lo <= truth[v] <= r.count_hi, v
        assert r.n_total == n


def test_merge_hh_summaries_none_seed_rebounds(spark):
    """b=None re-bounds a single summary to <= k data rows; the report
    still brackets the true counts."""
    from datamunging_spark.operators.sketch import (
        hh_report,
        hh_summary,
        merge_hh_summaries,
    )

    df = _skewed(spark)
    k = 32
    s = hh_summary(df, "value", k)  # union of 8 partition summaries > k
    rb = merge_hh_summaries(s, None, k)
    assert rb.filter(F.col("meta").isNull()).count() <= k
    truth = {
        r.value: r.cnt
        for r in df.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in hh_report(rb).collect():
        assert r.count_lo <= truth[r.value] <= r.count_hi


def test_merge_rebound_survives_all_ties(spark):
    """Boundary: every counter ties at the cutoff — the rebound may drop
    ALL data rows (each loses exactly its full count, charged to the
    error budget), and the guarantees must stay vacuously true: nothing
    whose true count exceeds the reported max_err may be missing."""
    from datamunging_spark.operators.sketch import (
        hh_report,
        hh_summary,
        merge_hh_summaries,
    )

    df = spark.createDataFrame(
        [(f"v{i}",) for i in range(100)], "value string"
    ).repartition(2)
    rb = merge_hh_summaries(hh_summary(df, "value", 10), None, 10)
    assert rb.filter(F.col("meta").isNull()).count() <= 10
    rep = hh_report(rb).collect()
    max_err = (
        rep[0].max_err
        if rep
        else rb.filter(F.col("meta") == "dec").first().cnt
    )
    for r in rep:  # brackets for whatever survived
        assert r.count_lo <= 1 <= r.count_hi
        assert r.n_total == 100
    # every true count is 1; none may be missing unless 1 <= max_err
    if max_err < 1:
        assert len(rep) == 100


def test_streaming_heavy_hitters_folds_and_replays(spark, tmp_path):
    """foreachBatch sketch maintenance: two micro-batch folds bracket
    the full-stream truth; a drain with a lost checkpoint no-ops on the
    already-applied batch (version tags); retention vacuums."""
    from datamunging_spark.operators.sketch import hh_report
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_heavy_hitters

    src = tmp_path / "hh_src"
    src.mkdir()
    b1 = [(f"heavy_{i % 3}",) for i in range(300)] + [
        (f"t1_{j}",) for j in range(500)
    ]
    b2 = [(f"heavy_{i % 3}",) for i in range(300)] + [
        (f"t2_{j}",) for j in range(500)
    ]
    spark.createDataFrame(b1, "value string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, "value string").coalesce(1).write.parquet(
        str(src / "f2")
    )
    table = str(tmp_path / "hh_table")

    def drain(ckpt):
        stream = (
            spark.readStream.schema("value string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_heavy_hitters(
            stream, "value", table, k=16, checkpoint_path=str(tmp_path / ckpt)
        )

    assert drain("hh_ckpt") == 2  # two micro-batches -> v1, v2
    rep = {
        r.value: r
        for r in hh_report(read_table_version(spark, table)).collect()
    }
    # true stream-so-far counts: heavy_i = 200 each, n = 1600
    for i in range(3):
        r = rep[f"heavy_{i}"]
        assert r.count_lo <= 200 <= r.count_hi
        assert r.n_total == 1600
    # lost checkpoint: both batches replay, tags no-op them (no double
    # counting -- n_total would be 3200 if a fold re-applied)
    assert drain("hh_ckpt2") == 2
    rep2 = {
        r.value: r
        for r in hh_report(read_table_version(spark, table)).collect()
    }
    assert rep2[f"heavy_0"].n_total == 1600


def test_heavy_hitters_summary_is_bounded(spark):
    """The shuffle-side summary is <= partitions x (k+2) rows regardless
    of the distinct-key count — the whole point of the sketch."""
    df = _skewed(spark)  # 8005 distinct keys over 8 partitions
    k = 16
    sk = heavy_hitters(df, "value", k=k)
    # every surviving counter row came from some partition's <=k counters
    assert sk.count() <= 8 * k

def test_top_k_exact_via_sketch_certified_equals_exact(spark):
    """The certified path provably equals the unbounded exact top-V:
    same values, same counts, same deterministic tie order."""
    from datamunging_spark.operators.sketch import top_k_exact_via_sketch

    df = _skewed(spark)
    got = top_k_exact_via_sketch(df, "value", top_n=5, k=64).collect()
    assert all(r.certified_exact for r in got)
    truth = (
        df.groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("value"))
        .limit(5)
        .collect()
    )
    assert [(r.value, r["count"]) for r in got] == [
        (r.value, r["count"]) for r in truth
    ]


def test_top_k_exact_via_sketch_uncertified_when_k_too_small(spark):
    """k far below the tail weight: the certificate must fail closed
    (counts of whatever survived are still exact)."""
    from datamunging_spark.operators.sketch import top_k_exact_via_sketch

    df = _skewed(spark, n_heavy=2, heavy_count=30, n_tail=8000)
    got = top_k_exact_via_sketch(df, "value", top_n=5, k=4).collect()
    assert got and not any(r.certified_exact for r in got)
    truth = {
        r.value: r.cnt
        for r in df.groupBy("value").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in got:  # exact recount even without the certificate
        assert truth[r.value] == r["count"]


def test_top_k_exact_via_sketch_zero_err_short_result(spark):
    """Fewer distinct keys than top_n with max_err == 0: the candidate
    set is the complete key space, so the short result certifies."""
    from datamunging_spark.operators.sketch import top_k_exact_via_sketch

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)], "value string"
    )
    got = top_k_exact_via_sketch(df, "value", top_n=10, k=50).collect()
    assert [(r.value, r["count"]) for r in got] == [("a", 5), ("b", 3), ("c", 1)]
    assert all(r.certified_exact and r.max_err == 0 for r in got)


def test_build_vocab_sketch_path_matches_exact(spark):
    """build_vocab(sketch_k=...) certifies and reproduces the default
    exact vocabulary — same words, counts, ranks, tie order."""
    from datamunging_spark.operators.text import build_vocab

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick red fox runs past the sleeping dog"),
            (3, "a slow green turtle watches the quick fox go by"),
            (4, "dogs and foxes and turtles all watch the quick fox"),
        ],
        ["doc_id", "text"],
    ).repartition(3)
    exact = build_vocab(docs, vocab_size=8).collect()
    sk = build_vocab(docs, vocab_size=8, sketch_k=64).collect()
    assert all(r.certified_exact for r in sk)
    assert [(r.word, r.cnt, r.rank) for r in sk] == [
        (r.word, r.cnt, r.rank) for r in exact
    ]


def test_distinct_sketch_estimates_within_hll_error(spark):
    """Per-key HLL estimates land within the lgk=12 error band (~1.6%
    at 1 sigma; assert 5% for slack) of exact distinct counts."""
    from datamunging_spark.operators.sketch import (
        distinct_estimate,
        distinct_sketch,
    )

    rows = [("dom_a", f"u{i}") for i in range(5000)] + [
        ("dom_b", f"u{i % 300}") for i in range(2000)
    ] + [("dom_c", None)] * 10
    df = spark.createDataFrame(rows, "k string, v string").repartition(8)
    est = {
        r.k: r.distinct_est
        for r in distinct_estimate(
            distinct_sketch(df, ["k"], "v"), ["k"]
        ).collect()
    }
    assert abs(est["dom_a"] - 5000) / 5000 < 0.05
    assert abs(est["dom_b"] - 300) / 300 < 0.05
    assert est["dom_c"] == 0  # NULL values ignored, key group kept


def test_merge_distinct_sketches_equals_one_shot(spark):
    """DataSketches merge guarantee: union(sketch(A), sketch(B)) gives
    the SAME estimate as sketch(A ∪ B) — so incremental folds lose
    nothing vs a full recompute. Keys on one side only pass through;
    NULL key groups merge with themselves."""
    from datamunging_spark.operators.sketch import (
        distinct_estimate,
        distinct_sketch,
        merge_distinct_sketches,
    )

    rows = [(k, f"u{i % m}") for k, m, n in
            [("a", 400, 1000), ("b", 50, 200), (None, 70, 100)]
            for i in range(n)]
    a_rows, b_rows = rows[::2], rows[1::2]
    b_rows += [("only_b", f"x{i}") for i in range(150)]
    full = spark.createDataFrame(
        a_rows + b_rows, "k string, v string"
    )
    a = distinct_sketch(spark.createDataFrame(a_rows, "k string, v string"), ["k"], "v")
    b = distinct_sketch(spark.createDataFrame(b_rows, "k string, v string"), ["k"], "v")
    merged = merge_distinct_sketches(a, b, ["k"])
    got = {
        r.k: r.distinct_est
        for r in distinct_estimate(merged, ["k"]).collect()
    }
    want = {
        r.k: r.distinct_est
        for r in distinct_estimate(
            distinct_sketch(full, ["k"], "v"), ["k"]
        ).collect()
    }
    assert got == want  # estimate-identical, not merely close
    assert merge_distinct_sketches(a, None, ["k"]) is a  # first-batch seed


@pytest.mark.slow
def test_streaming_distinct_counts_folds_and_replays(spark, tmp_path):
    """foreachBatch HLL maintenance: two micro-batch folds estimate the
    whole-stream distincts; a lost-checkpoint replay RE-FOLDS (the
    idempotent-union semantics — estimates unchanged); and new files
    landing before the re-drain ARE folded even when the fresh query
    packs them into a low batch id — the data-loss window a
    skip-applied tag check would open."""
    from datamunging_spark.operators.sketch import distinct_estimate
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_distinct_counts

    src = tmp_path / "dc_src"
    src.mkdir()
    b1 = [("dom", f"u{i}") for i in range(400)]
    b2 = [("dom", f"u{i}") for i in range(200, 600)]  # 200 overlap
    spark.createDataFrame(b1, "k string, v string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, "k string, v string").coalesce(1).write.parquet(
        str(src / "f2")
    )
    table = str(tmp_path / "dc_table")

    def drain(ckpt, max_files=1):
        stream = (
            spark.readStream.schema("k string, v string")
            .option("maxFilesPerTrigger", max_files)
            .parquet(str(src) + "/*")
        )
        return streaming_distinct_counts(
            stream, ["k"], "v", table,
            checkpoint_path=str(tmp_path / ckpt),
        )

    assert drain("dc_ckpt") == 2
    state = read_table_version(spark, table)
    assert state.count() == 1  # one sketch row per key
    est = distinct_estimate(state, ["k"]).first().distinct_est
    assert abs(est - 600) / 600 < 0.05  # true whole-stream distinct = 600
    # checkpoint lost AND a new file lands; the fresh query packs ALL
    # files into batch 0 (max_files=10) — with a tag-based skip, batch 0
    # "already applied" would silently drop f3's 200 new visitors; the
    # idempotent re-fold counts them and re-union keeps old ones stable
    b3 = [("dom", f"u{i}") for i in range(600, 800)]
    spark.createDataFrame(b3, "k string, v string").coalesce(1).write.parquet(
        str(src / "f3")
    )
    assert drain("dc_ckpt2", max_files=10) == 3  # one re-folded version
    est2 = distinct_estimate(
        read_table_version(spark, table), ["k"]
    ).first().distinct_est
    assert abs(est2 - 800) / 800 < 0.05  # new visitors NOT lost


def test_hot_keys_sketch_superset_and_equal_at_large_k(spark):
    """hot_keys_sketch at k >= distinct keys is error-free, so its hot
    set EQUALS the exact row-count valve's; at tiny k the decrement
    slack can only ADD keys (over-drop), never miss one hotter than
    threshold + n/(k+1) — the conservative direction the valves need."""
    from pyspark.sql import functions as F

    from datamunging_spark.operators.sketch import hot_keys_sketch

    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 600, F.lit("hot"))
        .when(F.col("id") < 700, F.lit("warm"))
        .otherwise(F.concat(F.lit("cold"), F.col("id")))
        .alias("k")
    )
    exact = {
        r["k"]
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 50)
        .collect()
    }
    assert exact == {"hot", "warm"}
    big_k = {r["k"] for r in hot_keys_sketch(df, "k", 50, k=4096).collect()}
    assert big_k == exact
    # tiny k: n/(k+1) slack inflates count_hi -> superset, and the
    # truly hot key (600 > 50 + 1000/9) is always present
    small = {r["k"] for r in hot_keys_sketch(df, "k", 50, k=8).collect()}
    assert small >= {"hot"}
    assert exact <= small or "warm" in small  # never misses above floor


def test_ngram_sketch_valve_matches_exact(spark):
    """ngram_jaccard_pairs(valve='sketch') at error-free k yields the
    same pairs as the exact valve (grams are distinct per doc, so rows
    == df and the two detectors agree exactly)."""
    from pyspark.sql import functions as F

    from datamunging_spark.operators.dedup import ngram_jaccard_pairs

    docs = [(i, "the common boilerplate gram run appears everywhere here")
            for i in range(12)]
    docs += [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "alpha beta gamma delta epsilon zeta iota kappa")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    kw = dict(n=3, threshold=0.2, max_gram_df=4)
    key = ["id_a", "id_b"]
    exact = ngram_jaccard_pairs(df, df, valve="exact", **kw)
    sk = ngram_jaccard_pairs(df, df, valve="sketch", valve_k=1 << 16, **kw)
    ex = sorted(map(tuple, exact.select(key).collect()))
    sv = sorted(map(tuple, sk.select(key).collect()))
    assert ex == sv
    assert (100, 101) in {(a, b) for a, b in sv} | {
        (b, a) for a, b in sv
    }  # the df=2 genuine pair survives the valve in both modes


# ---------------------------------------------------------------------------
# Quantile summaries (MRL/KLL-family compactors)
# ---------------------------------------------------------------------------


def _true_count_le(values, v):
    return sum(1 for x in values if x <= v)


def test_quantile_sketch_exact_below_k(spark):
    """n <= k and one partition: no compaction ever fires, the budget is
    zero, and every probe returns the exact nearest-rank quantile."""
    import math

    from datamunging_spark.operators.sketch import quantiles_sketch

    vals = [float(x) for x in [7, 1, 9, 3, 3, 5, 2, 8, 4, 6]]
    df = spark.createDataFrame([(v,) for v in vals], "x double").coalesce(1)
    qs = [0.0, 0.1, 0.25, 0.5, 0.9, 1.0]
    out = {r.q: r for r in quantiles_sketch(df, "x", qs, k=64).collect()}
    s = sorted(vals)
    for q in qs:
        r = out[q]
        assert r.max_rank_err == 0
        assert r.n_total == 10
        target = max(1, math.ceil(q * 10))
        assert r.rank_target == target
        assert r.value == s[target - 1], q


def test_quantile_summary_mass_is_conserved(spark):
    """Sum(cnt * 2^level) == n exactly — compaction promotes pairs and
    parks the odd leftover, it never loses mass (module invariant)."""
    from datamunging_spark.operators.sketch import quantile_summary

    df = spark.range(0, 5000).select(
        (F.col("id") % 997).cast("double").alias("x")
    ).repartition(8)
    s = quantile_summary(df, "x", k=32)
    mass = (
        s.filter(F.col("meta").isNull())
        .agg(F.sum(F.expr("cnt * shiftleft(1L, level)")).alias("m"))
        .collect()[0]["m"]
    )
    n = s.filter(F.col("meta") == "n").agg(F.sum("cnt")).collect()[0][0]
    assert mass == n == 5000
    # the stored state is re-bounded: <= k items per level
    per_level = {
        r.level: r.items
        for r in s.filter(F.col("meta").isNull())
        .groupBy("level")
        .agg(F.sum("cnt").alias("items"))
        .collect()
    }
    assert all(items <= 32 for items in per_level.values()), per_level


def test_quantile_sketch_rank_bracket_holds(spark):
    """The carried budget is a true bracket: for every reported value,
    |est_rank - true count<=value| <= max_rank_err, and the budget obeys
    the n*L/k worst case."""
    import math

    from datamunging_spark.operators.sketch import quantiles_sketch

    # adversarially lumpy: two dense clusters + a sparse tail
    vals = (
        [float(i % 50) for i in range(4000)]
        + [1000.0 + (i % 25) for i in range(4000)]
        + [1e6 + i for i in range(500)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    k = 64
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    rows = quantiles_sketch(df, "x", qs, k=k).collect()
    n = len(vals)
    levels = math.ceil(math.log2(max(n / k, 2))) + 2
    for r in rows:
        assert r.n_total == n
        true_le = _true_count_le(vals, r.value)
        assert abs(r.est_rank - true_le) <= r.max_rank_err, (r.q, r.value)
        # first-crossing pick: est_rank reaches the target
        assert r.est_rank >= r.rank_target
        assert r.max_rank_err <= n * levels / k


def test_merge_quantile_summaries_budget_covers_union(spark):
    """sketch(A) merged with sketch(B): mass adds (n = nA + nB) and the
    report still brackets the true ranks of A UNION B."""
    from datamunging_spark.operators.sketch import (
        merge_quantile_summaries,
        quantile_report,
        quantile_summary,
    )

    a_vals = [float(i % 100) for i in range(3000)]
    b_vals = [500.0 + (i % 100) for i in range(2000)]
    a = spark.createDataFrame([(v,) for v in a_vals], "x double").repartition(4)
    b = spark.createDataFrame([(v,) for v in b_vals], "x double").repartition(4)
    merged = merge_quantile_summaries(
        quantile_summary(a, "x", k=32), quantile_summary(b, "x", k=32), k=32
    )
    union = a_vals + b_vals
    rows = quantile_report(merged, [0.1, 0.5, 0.6, 0.9]).collect()
    for r in rows:
        assert r.n_total == len(union)
        true_le = _true_count_le(union, r.value)
        assert abs(r.est_rank - true_le) <= r.max_rank_err, r.q
    # per-level item bound survives the merge
    per_level = (
        merged.filter(F.col("meta").isNull())
        .groupBy("level")
        .agg(F.sum("cnt").alias("items"))
        .collect()
    )
    assert all(r.items <= 32 for r in per_level)


def test_quantile_sketch_nulls_empty_and_validation(spark):
    from datamunging_spark.operators.sketch import (
        quantile_report,
        quantile_summary,
        quantiles_sketch,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    out = {r.q: r for r in quantiles_sketch(df, "x", [0.5, 1.0], k=16).collect()}
    assert out[0.5].n_total == 3  # NULLs excluded from n
    assert out[0.5].value == 2.0
    assert out[1.0].value == 3.0

    empty = spark.createDataFrame([], "x double")
    rows = {r.q: r for r in quantiles_sketch(empty, "x", [0.5], k=16).collect()}
    assert rows[0.5].value is None
    assert rows[0.5].n_total == 0
    assert rows[0.5].est_rank == 0

    with pytest.raises(ValueError):
        quantile_summary(df, "x", k=1)
    with pytest.raises(ValueError):
        quantile_report(quantile_summary(df, "x", k=16), [1.5])


@pytest.mark.slow
def test_streaming_quantiles_folds_and_replays(spark, tmp_path):
    """foreachBatch quantile maintenance: two micro-batch folds bracket
    the full-stream truth; a lost checkpoint replay no-ops (batch tags
    -- the fold double-counts mass if re-applied); retention vacuums."""
    from datamunging_spark.operators.sketch import quantile_report
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_quantiles

    src = tmp_path / "q_src"
    src.mkdir()
    b1 = [(float(i),) for i in range(1000)]
    b2 = [(float(1000 + i),) for i in range(1000)]
    spark.createDataFrame(b1, "x double").coalesce(1).write.parquet(
        str(src / "f1")
    )
    spark.createDataFrame(b2, "x double").coalesce(1).write.parquet(
        str(src / "f2")
    )
    table = str(tmp_path / "q_table")

    def drain(ckpt):
        stream = (
            spark.readStream.schema("x double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_quantiles(
            stream, "x", table, k=64, checkpoint_path=str(tmp_path / ckpt)
        )

    assert drain("q_ckpt") == 2
    union = [v for v, in b1] + [v for v, in b2]
    rows = quantile_report(
        read_table_version(spark, table), [0.25, 0.5, 0.75]
    ).collect()
    for r in rows:
        assert r.n_total == 2000
        true_le = _true_count_le(union, r.value)
        assert abs(r.est_rank - true_le) <= r.max_rank_err
    # lost checkpoint: replays no-op (n_total would double otherwise)
    assert drain("q_ckpt2") == 2
    rows2 = quantile_report(read_table_version(spark, table), [0.5]).collect()
    assert rows2[0].n_total == 2000


def test_grouped_quantile_sketch_exact_below_k(spark):
    """Two key groups with disjoint distributions, n <= k each, one
    partition: zero budget and exact per-key nearest-rank quantiles."""
    from datamunging_spark.operators.sketch import (
        grouped_quantile_report,
        grouped_quantile_summary,
    )

    rows = [("a", float(v)) for v in range(100)] + [
        ("b", 1000.0 + v) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "src string, x double").coalesce(1)
    s = grouped_quantile_summary(df, ["src"], "x", k=256)
    out = {
        (r.src, r.q): r
        for r in grouped_quantile_report(s, ["src"], [0.5, 1.0]).collect()
    }
    assert out[("a", 0.5)].value == 49.0
    assert out[("a", 1.0)].value == 99.0
    assert out[("b", 0.5)].value == 1024.0
    assert out[("b", 1.0)].value == 1049.0
    for r in out.values():
        assert r.max_rank_err == 0
        assert r.n_total == (100 if r.src == "a" else 50)


def test_grouped_quantile_bracket_and_mass_per_key(spark):
    """Per-key guarantees on multi-partition data: mass == n_key
    exactly, bracket within the per-key carried budget, state <= k
    items per level per key."""
    from datamunging_spark.operators.sketch import (
        grouped_quantile_report,
        grouped_quantile_summary,
    )

    rows = [("a", float(i % 500)) for i in range(6000)] + [
        ("b", float(2000 + i % 100)) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "src string, x double").repartition(8)
    s = grouped_quantile_summary(df, ["src"], "x", k=32)
    mass = {
        r.src: r.m
        for r in s.filter(F.col("meta").isNull())
        .groupBy("src")
        .agg(F.sum(F.expr("cnt * shiftleft(1L, level)")).alias("m"))
        .collect()
    }
    assert mass == {"a": 6000, "b": 3000}
    per_level = (
        s.filter(F.col("meta").isNull())
        .groupBy("src", "level")
        .agg(F.sum("cnt").alias("items"))
        .collect()
    )
    assert all(r.items <= 32 for r in per_level)
    truth = {"a": sorted(float(i % 500) for i in range(6000)),
             "b": sorted(float(2000 + i % 100) for i in range(3000))}
    for r in grouped_quantile_report(s, ["src"], [0.25, 0.5, 0.9]).collect():
        vals = truth[r.src]
        true_le = sum(1 for x in vals if x <= r.value)
        assert abs(r.est_rank - true_le) <= r.max_rank_err, (r.src, r.q)
        assert r.n_total == len(vals)


def test_merge_grouped_quantile_summaries_outer_on_keys(spark):
    """A key on one side passes through; a shared key's masses and
    budgets add and the merged bracket covers the union."""
    from datamunging_spark.operators.sketch import (
        grouped_quantile_report,
        grouped_quantile_summary,
        merge_grouped_quantile_summaries,
    )

    a = spark.createDataFrame(
        [("shared", float(i % 100)) for i in range(2000)]
        + [("only_a", float(i)) for i in range(300)],
        "src string, x double",
    ).repartition(4)
    b = spark.createDataFrame(
        [("shared", 500.0 + i % 100) for i in range(1000)],
        "src string, x double",
    ).repartition(4)
    m = merge_grouped_quantile_summaries(
        grouped_quantile_summary(a, ["src"], "x", k=32),
        grouped_quantile_summary(b, ["src"], "x", k=32),
        ["src"],
        k=32,
    )
    rep = {
        (r.src, r.q): r
        for r in grouped_quantile_report(m, ["src"], [0.5]).collect()
    }
    assert rep[("only_a", 0.5)].n_total == 300
    shared = rep[("shared", 0.5)]
    assert shared.n_total == 3000
    union = sorted(
        [float(i % 100) for i in range(2000)]
        + [500.0 + i % 100 for i in range(1000)]
    )
    true_le = sum(1 for x in union if x <= shared.value)
    assert abs(shared.est_rank - true_le) <= shared.max_rank_err


def test_grouped_quantile_null_key_group_and_validation(spark):
    from datamunging_spark.operators.sketch import (
        grouped_quantile_report,
        grouped_quantile_summary,
    )

    df = spark.createDataFrame(
        [("a", 1.0), (None, 10.0), (None, 20.0), ("a", 3.0)],
        "src string, x double",
    )
    s = grouped_quantile_summary(df, ["src"], "x", k=16)
    out = {
        (r.src, r.q): r
        for r in grouped_quantile_report(s, ["src"], [1.0]).collect()
    }
    assert out[(None, 1.0)].value == 20.0  # NULL key is a real group
    assert out[(None, 1.0)].n_total == 2
    assert out[("a", 1.0)].value == 3.0
    with pytest.raises(ValueError):
        grouped_quantile_summary(df, [], "x")
    with pytest.raises(ValueError):
        grouped_quantile_report(s, ["src"], [])


@pytest.mark.slow
def test_streaming_grouped_quantiles_folds(spark, tmp_path):
    """keys= switches the streaming fold to the per-key profile; two
    folds bracket the per-key stream truth and replays no-op."""
    from datamunging_spark.operators.sketch import grouped_quantile_report
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_quantiles

    src = tmp_path / "gq_src"
    src.mkdir()
    b1 = [("a", float(i)) for i in range(400)] + [
        ("b", 1000.0 + i) for i in range(200)
    ]
    b2 = [("a", 400.0 + i) for i in range(400)]
    for n, rows in (("f1", b1), ("f2", b2)):
        spark.createDataFrame(rows, "src string, x double").coalesce(
            1
        ).write.parquet(str(src / n))
    table = str(tmp_path / "gq_table")

    def drain(ckpt):
        stream = (
            spark.readStream.schema("src string, x double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_quantiles(
            stream, "x", table, k=64, keys=["src"],
            checkpoint_path=str(tmp_path / ckpt),
        )

    assert drain("gq_ckpt") == 2
    rep = {
        (r.src, r.q): r
        for r in grouped_quantile_report(
            read_table_version(spark, table), ["src"], [0.5]
        ).collect()
    }
    a = rep[("a", 0.5)]
    assert a.n_total == 800  # both micro-batches folded
    truth_a = sorted([float(i) for i in range(400)] + [400.0 + i for i in range(400)])
    true_le = sum(1 for x in truth_a if x <= a.value)
    assert abs(a.est_rank - true_le) <= a.max_rank_err
    assert rep[("b", 0.5)].n_total == 200
    # lost checkpoint: replays no-op (mass would double otherwise)
    assert drain("gq_ckpt2") == 2
    rep2 = grouped_quantile_report(
        read_table_version(spark, table), ["src"], [0.5]
    ).collect()
    assert {r.src: r.n_total for r in rep2} == {"a": 800, "b": 200}


def test_quantile_ranged_rebound_path(spark):
    """rebound_partitions > 1 (the cluster-scale range-sharded re-bound:
    checkpointed sampling input, per-shard err-delta emission, meta rows
    riding the NaN shard) preserves every guarantee — this is the path
    the default never takes, pinned here so it cannot rot silently."""
    from datamunging_spark.operators.sketch import (
        merge_quantile_summaries,
        quantile_report,
        quantile_summary,
    )

    vals = [float(i % 700) for i in range(8000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    s = quantile_summary(df, "x", k=32, rebound_partitions=3)
    mass = (
        s.filter(F.col("meta").isNull())
        .agg(F.sum(F.expr("cnt * shiftleft(1L, level)")))
        .first()[0]
    )
    assert mass == 8000
    for r in quantile_report(s, [0.1, 0.5, 0.9]).collect():
        true_le = sum(1 for x in vals if x <= r.value)
        assert abs(r.est_rank - true_le) <= r.max_rank_err
        assert r.n_total == 8000
    # a ranged MERGE too (both sides sharded, budgets add)
    m = merge_quantile_summaries(s, s, k=32, rebound_partitions=3)
    r = quantile_report(m, [0.5]).collect()[0]
    assert r.n_total == 16000
    true_le = 2 * sum(1 for x in vals if x <= r.value)
    assert abs(r.est_rank - true_le) <= r.max_rank_err


def test_quantile_summary_rebound_false_is_valid_merge_input(spark):
    """rebound=False returns the lazy pooled union (data rows may exceed
    k per level, like hh_summary); feeding it to merge gives the same
    bracket with NO double-charged budget — merge's budget must be <=
    the rebound-then-merge form's."""
    from datamunging_spark.operators.sketch import (
        merge_quantile_summaries,
        quantile_report,
        quantile_summary,
    )

    vals = [float(i % 300) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    raw = quantile_summary(df, "x", k=32, rebound=False)
    merged = merge_quantile_summaries(raw, None, k=32)
    r = quantile_report(merged, [0.5]).collect()[0]
    true_le = sum(1 for x in vals if x <= r.value)
    assert abs(r.est_rank - true_le) <= r.max_rank_err
    assert r.n_total == 5000
    rebound_first = merge_quantile_summaries(
        quantile_summary(df, "x", k=32), None, k=32
    )
    err_direct = quantile_report(merged, [0.5]).collect()[0].max_rank_err
    err_double = quantile_report(rebound_first, [0.5]).collect()[0].max_rank_err
    assert err_direct <= err_double


def test_grouped_quantile_reserved_key_names_fail_fast(spark):
    from datamunging_spark.operators.sketch import (
        grouped_quantile_report,
        grouped_quantile_summary,
        merge_grouped_quantile_summaries,
    )

    df = spark.createDataFrame(
        [(1.0, "a")], "value double, src string"
    )
    with pytest.raises(ValueError, match="reserved"):
        grouped_quantile_summary(df, ["value"], "value")
    s = grouped_quantile_summary(
        df.withColumnRenamed("value", "x"), ["src"], "x", k=16
    )
    with pytest.raises(ValueError, match="non-empty"):
        merge_grouped_quantile_summaries(s, None, [], k=16)
    with pytest.raises(ValueError, match="non-empty"):
        grouped_quantile_report(s, [], [0.5])
    with pytest.raises(ValueError, match="reserved"):
        grouped_quantile_report(s, ["q"], [0.5])


def test_grouped_heavy_hitters_exact_below_k_per_key(spark):
    """Per-key MG: few distinct values per key and k large — zero
    budget per key, exact per-key counts, NULL key is a real group."""
    from datamunging_spark.operators.sketch import grouped_heavy_hitters

    rows = (
        [("en", "the")] * 30 + [("en", "of")] * 10
        + [("fr", "le")] * 20 + [(None, "na")] * 5
    )
    df = spark.createDataFrame(rows, "lang string, word string").repartition(4)
    out = {
        (r.lang, r.value): r
        for r in grouped_heavy_hitters(df, ["lang"], "word", k=16).collect()
    }
    assert out[("en", "the")].count_lo == out[("en", "the")].count_hi == 30
    assert out[("en", "the")].n_total == 40
    assert out[("fr", "le")].count_lo == 20
    assert out[("fr", "le")].n_total == 20
    assert out[(None, "na")].count_lo == 5  # NULL key group survives
    assert all(r.max_err == 0 for r in out.values())


def test_grouped_heavy_hitters_brackets_and_per_key_floor(spark):
    """Planted per-key heavies over per-key distinct tails: every key's
    heavy survives (no false negatives above ITS key's floor), brackets
    hold against per-key truth, and the per-key re-bound caps data rows
    at k per key."""
    from datamunging_spark.operators.sketch import (
        grouped_heavy_hitters,
        grouped_hh_summary,
        merge_grouped_hh_summaries,
    )

    rows = []
    for lang, tail in (("en", 900), ("fr", 400)):
        rows += [(lang, f"{lang}_heavy")] * 100
        rows += [(lang, f"{lang}_t{j}") for j in range(tail)]
    df = spark.createDataFrame(rows, "lang string, word string").repartition(8)
    out = grouped_heavy_hitters(df, ["lang"], "word", k=32).collect()
    truth = {}
    for lang, tail in (("en", 900), ("fr", 400)):
        truth[(lang, f"{lang}_heavy")] = 100
        for j in range(tail):
            truth[(lang, f"{lang}_t{j}")] = 1
    found = {(r.lang, r.value) for r in out}
    assert ("en", "en_heavy") in found and ("fr", "fr_heavy") in found
    for r in out:
        assert r.count_lo <= truth[(r.lang, r.value)] <= r.count_hi
        assert r.n_total == (1000 if r.lang == "en" else 500)
    s = merge_grouped_hh_summaries(
        grouped_hh_summary(df, ["lang"], "word", k=32), None, ["lang"], k=32
    )
    per_key = (
        s.filter(F.col("meta").isNull())
        .groupBy("lang")
        .count()
        .collect()
    )
    assert all(r["count"] <= 32 for r in per_key)


def test_merge_grouped_hh_outer_on_keys_and_combined_bracket(spark):
    """A key on one side passes through; shared keys' counters and
    budgets fold and the combined-stream bracket holds per key."""
    from datamunging_spark.operators.sketch import (
        grouped_hh_report,
        grouped_hh_summary,
        merge_grouped_hh_summaries,
    )

    a = spark.createDataFrame(
        [("en", "x")] * 50 + [("en", f"a{j}") for j in range(200)]
        + [("de", "nur")] * 7,
        "lang string, word string",
    ).repartition(4)
    b = spark.createDataFrame(
        [("en", "x")] * 30 + [("en", f"b{j}") for j in range(100)],
        "lang string, word string",
    ).repartition(4)
    m = merge_grouped_hh_summaries(
        grouped_hh_summary(a, ["lang"], "word", k=16),
        grouped_hh_summary(b, ["lang"], "word", k=16),
        ["lang"],
        k=16,
    )
    rep = {
        (r.lang, r.value): r
        for r in grouped_hh_report(m, ["lang"]).collect()
    }
    de = rep[("de", "nur")]
    assert de.count_lo <= 7 <= de.count_hi and de.n_total == 7
    en = rep[("en", "x")]
    assert en.count_lo <= 80 <= en.count_hi  # combined-stream truth
    assert en.n_total == 380


@pytest.mark.slow
def test_streaming_grouped_heavy_hitters_folds(spark, tmp_path):
    """keys= switches the streaming HH fold to the per-key profile;
    two folds bracket per-key stream truth and replays no-op."""
    from datamunging_spark.operators.sketch import grouped_hh_report
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_heavy_hitters

    src = tmp_path / "ghh_src"
    src.mkdir()
    b1 = [("en", "the")] * 40 + [("en", f"t1_{j}") for j in range(50)] + [
        ("fr", "le")
    ] * 20
    b2 = [("en", "the")] * 40 + [("fr", "le")] * 20
    for n, rows in (("f1", b1), ("f2", b2)):
        spark.createDataFrame(rows, "lang string, word string").coalesce(
            1
        ).write.parquet(str(src / n))
    table = str(tmp_path / "ghh_table")

    def drain(ckpt):
        stream = (
            spark.readStream.schema("lang string, word string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_heavy_hitters(
            stream, "word", table, k=16, keys=["lang"],
            checkpoint_path=str(tmp_path / ckpt),
        )

    assert drain("ghh_ckpt") == 2
    rep = {
        (r.lang, r.value): r
        for r in grouped_hh_report(
            read_table_version(spark, table), ["lang"]
        ).collect()
    }
    en = rep[("en", "the")]
    assert en.count_lo <= 80 <= en.count_hi
    assert en.n_total == 130
    fr = rep[("fr", "le")]
    assert fr.count_lo <= 40 <= fr.count_hi
    assert fr.n_total == 40
    # lost checkpoint: replays no-op (per-key n would double otherwise)
    assert drain("ghh_ckpt2") == 2
    rep2 = grouped_hh_report(
        read_table_version(spark, table), ["lang"]
    ).collect()
    assert {r.lang: r.n_total for r in rep2}["en"] == 130


def test_grouped_passes_consolidate_na_key_across_batches():
    """pandas groupby(dropna=False) hands back a FRESH nan object as the
    NA group label on every call; without normalization the keyed Arrow
    passes would grow one separate state per BATCH for the NULL key
    (O(batches x k) memory — the bound the sketch exists to prevent).
    Drive the pass functions directly with multiple fake batches and
    require exactly ONE consolidated state per key."""
    import pandas as pd

    from datamunging_spark.operators.sketch import (
        _META_N,
        _mg_grouped_partition,
        _q_grouped_build_partition,
    )

    b1 = pd.DataFrame({"src": [None, None, "a"], "value": ["x", "y", "z"]})
    b2 = pd.DataFrame({"src": [None, "a"], "value": ["x", "z"]})
    out = pd.concat(
        list(_mg_grouped_partition(["src"], 8)(iter([b1, b2]))),
        ignore_index=True,
    )
    n_rows = out[out["meta"] == _META_N]
    # one 'n' meta row per key — TWO would mean the NULL key split
    assert len(n_rows) == 2
    null_n = n_rows[n_rows["src"].isna()]["cnt"].tolist()
    assert null_n == [3]  # both batches' NULL-key rows in one state

    q1 = pd.DataFrame({"src": [None, None], "value": [1.0, 2.0]})
    q2 = pd.DataFrame({"src": [None], "value": [3.0]})
    qout = pd.concat(
        list(_q_grouped_build_partition(["src"], 8)(iter([q1, q2]))),
        ignore_index=True,
    )
    qn = qout[qout["meta"] == _META_N]
    assert len(qn) == 1
    assert qn["cnt"].tolist() == [3]


def test_grouped_faces_reject_float_double_keys(spark):
    """r9 ADVICE (fixed r11): a float/double grouping key can carry NaN,
    which the Arrow passes' _norm_key would fold into the NULL group —
    diverging from Spark groupBy (NaN is its own group) and from the
    exact faces. Every public grouped face fails fast instead; the cast
    to a discrete type is the caller's explicit choice."""
    from datamunging_spark.operators.sketch import (
        grouped_hh_summary,
        grouped_quantile_summary,
        merge_grouped_hh_summaries,
        merge_grouped_quantile_summaries,
    )

    df = spark.createDataFrame(
        [(1.5, "x", 1.0), (float("nan"), "y", 2.0), (None, "y", 3.0)],
        "fkey double, skey string, v double",
    )
    for face in (
        lambda: grouped_quantile_summary(df, ["fkey"], "v", k=4),
        lambda: grouped_hh_summary(df, ["fkey"], "skey", k=4),
        lambda: grouped_quantile_summary(
            df.withColumn("fkey", F.col("fkey").cast("float")),
            ["fkey"], "v", k=4,
        ),
        # mixed key list: the float member alone must trip it
        lambda: grouped_hh_summary(df, ["skey", "fkey"], "v", k=4),
    ):
        with pytest.raises(ValueError, match="float/double grouping"):
            face()
    # merge faces reject a hand-built summary with a float key column
    qsum = grouped_quantile_summary(
        df.withColumn("k2", F.col("fkey").cast("string")), ["k2"], "v", k=4
    )
    bad = qsum.withColumn("k2", F.col("k2").cast("double"))
    with pytest.raises(ValueError, match="float/double grouping"):
        merge_grouped_quantile_summaries(bad, None, ["k2"], k=4)
    hsum = grouped_hh_summary(
        df.withColumn("k2", F.col("fkey").cast("string")), ["k2"], "skey",
        k=4,
    )
    hbad = hsum.withColumn("k2", F.col("k2").cast("double"))
    with pytest.raises(ValueError, match="float/double grouping"):
        merge_grouped_hh_summaries(hbad, None, ["k2"], k=4)
    # the discrete-key path (the documented recourse) still works and
    # keeps NaN distinct from NULL: cast-to-string labels NaN "NaN"
    cast = df.withColumn("kc", F.col("fkey").cast("string"))
    rep = grouped_quantile_summary(cast, ["kc"], "v", k=8)
    labels = {r["kc"] for r in rep.select("kc").distinct().collect()}
    assert "NaN" in labels and None in labels  # distinct groups survive


def test_grouped_sketch_bench_entry_nullsafe_recounts(spark, tmp_path):
    """r11 review catch: the x8_grouped_sketch bench entry's exact
    recounts must join NULL-SAFE on the grouping key — NULL lang/source
    are real groups in the grouped faces, and a plain equi-join would
    false-fail their bracket_ok. Direct-drive on an sf0.001 copy with
    planted NULL keys."""
    import os

    import __spark_entry__ as entry

    src = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{src}/documents.parquet")
    nulled = docs.withColumn(
        "lang",
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang")),
    ).withColumn(
        "source",
        F.when(F.col("doc_id") % 5 == 0, None).otherwise(F.col("source")),
    )
    d = str(tmp_path / "sf_null")
    os.makedirs(d)
    nulled.write.parquet(os.path.join(d, "documents.parquet"))
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        os.symlink(f"{src}/{t}.parquet", os.path.join(d, f"{t}.parquet"))
    rows = entry.q_x8_grouped_sketch(spark, d).collect()
    nullkeys = [r for r in rows if r["key"] is None]
    bad = [
        r for r in rows
        if r["bracket_ok"] is not True or r["within_budget"] is not True
    ]
    assert nullkeys, "planted NULL keys must surface as groups"
    assert not bad, bad[:5]
