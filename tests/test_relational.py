"""Relational core + plan hygiene (SURVEY.md §2.2-§2.4, §4)."""

from pyspark.sql import functions as F

from datamunging_spark.operators.relational import (
    group_count,
    grouped_percentiles,
    percentile_bucketize,
    top_k_per_group,
)
from datamunging_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filters,
    formatted_plan,
)


def test_group_count(tables):
    out = {
        r["event_type"]: r["cnt"]
        for r in group_count(tables["events"], "event_type").collect()
    }
    assert sum(out.values()) == tables["events"].count()


def test_grouped_percentiles_shape(tables):
    out = grouped_percentiles(
        tables["lineitem"], "l_partkey", F.col("l_quantity").cast("double")
    )
    row = out.first()
    assert len(row["percentiles"]) == 11
    assert row["percentiles"] == sorted(row["percentiles"])


def test_percentile_bucketize_labels(tables):
    out = percentile_bucketize(
        tables["lineitem"], "l_partkey", "l_quantity",
        keep_cols=["l_orderkey", "l_linenumber"],
    )
    labels = {r["bucket"] for r in out.select("bucket").distinct().collect()}
    assert labels <= {
        "10th", "20th", "30th", "40th", "50th", "60th",
        "70th", "80th", "90th", "95th", "99th", "99+th",
    }
    assert out.count() == tables["lineitem"].count()


def test_percentile_bucketize_broadcasts(tables):
    """Scale contract: the per-key percentile side must broadcast — the
    fact table is never shuffled for the join (SURVEY.md §4)."""
    out = percentile_bucketize(
        tables["lineitem"], "l_partkey", "l_quantity", keep_cols=["l_orderkey"]
    )
    assert_broadcast_join(out)


def test_filter_pushdown_reaches_scan(tables, spark):
    df = tables["lineitem"].filter(F.col("l_partkey") == 7).select("l_quantity")
    assert_pushed_filters(df, "l_partkey")
    plan = formatted_plan(df)
    # Column pruning: scan must read only the 2 needed columns.
    assert "ReadSchema: struct<l_partkey:bigint,l_quantity:double>" in plan


def test_top_k_per_group_deterministic(tables):
    out = top_k_per_group(
        tables["orders"],
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=2,
    )
    per_group = out.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    assert per_group <= 2
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_join_chain_counts(tables):
    c, n, r = tables["customer"], tables["nation"], tables["region"]
    joined = c.join(n, c.c_nationkey == n.n_nationkey).join(
        r, n.n_regionkey == r.r_regionkey
    )
    assert joined.count() == c.count()  # FK chain is total


def test_salted_join_matches_plain_join_on_tables(spark, tables):
    """Skew-salting must be pure plan hygiene: same rows as the unsalted
    join, with the small side exploded across salt replicas."""
    from datamunging_spark.operators.relational import salted_join

    o = tables["orders"].select("o_orderkey", "o_custkey")
    c = tables["customer"].select("c_custkey", "c_mktsegment").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = o.join(c, "o_custkey").select("o_orderkey", "c_mktsegment")
    salted = salted_join(o, c, ["o_custkey"], n_salt=8).select(
        "o_orderkey", "c_mktsegment"
    )
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_range_join_matches_naive_theta_join(spark, tables):
    """Bucketized range join must return exactly the naive theta join's
    rows, independent of bucket width."""
    from datamunging_spark.operators.relational import range_join

    li = tables["lineitem"].select("l_orderkey", "l_linenumber", "l_extendedprice")
    bands = (
        tables["part"]
        .filter(F.col("p_partkey") <= 50)
        .select(
            "p_partkey",
            (F.col("p_retailprice") * 0.95).alias("lo"),
            (F.col("p_retailprice") * 1.05).alias("hi"),
        )
    )
    naive = li.join(
        bands,
        (F.col("l_extendedprice") >= F.col("lo"))
        & (F.col("l_extendedprice") <= F.col("hi")),
    ).select("l_orderkey", "l_linenumber", "p_partkey")
    for width in (10.0, 97.3, 5000.0):
        fast = range_join(
            li, bands, "l_extendedprice", "lo", "hi", bucket_width=width
        ).select("l_orderkey", "l_linenumber", "p_partkey")
        assert fast.exceptAll(naive).count() == 0
        assert naive.exceptAll(fast).count() == 0


def test_range_join_is_equi_join_not_nested_loop(spark, tables):
    """The physical plan must be a hash/sort-merge EQUI-join on the bucket
    id — never BroadcastNestedLoopJoin/CartesianProduct."""
    from datamunging_spark.operators.relational import range_join

    li = tables["lineitem"].select("l_extendedprice")
    bands = tables["part"].select(
        (F.col("p_retailprice") * 0.9).alias("lo"),
        (F.col("p_retailprice") * 1.1).alias("hi"),
    )
    plan = range_join(
        li, bands, "l_extendedprice", "lo", "hi", bucket_width=100.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_hypertable_rollup_matches_date_trunc(spark, tables):
    """Hour-bucket rollup must equal a plain date_trunc groupBy."""
    from datamunging_spark.operators.relational import hypertable_rollup

    e = tables["events"]
    out = hypertable_rollup(
        e,
        "ts",
        "1 hour",
        {
            "n": F.count(F.lit(1)),
            "sum_value": F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 6
            ),
        },
        keys=["event_type"],
    )
    ref = (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("bucket_start"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 6
            ).alias("sum_value"),
        )
    )
    assert out.exceptAll(ref).count() == 0
    assert ref.exceptAll(out).count() == 0


def test_range_join_left_keeps_unmatched_points(spark):
    import pytest

    from datamunging_spark.operators.relational import range_join

    pts = spark.createDataFrame([(1, 5.0), (2, 500.0)], ["pid", "x"])
    iv = spark.createDataFrame([(10, 0.0, 10.0)], ["iid", "lo", "hi"])
    out = range_join(pts, iv, "x", "lo", "hi", bucket_width=10.0, how="left")
    rows = {r["pid"]: r["iid"] for r in out.collect()}
    assert rows == {1: 10, 2: None}
    # one row per left point even though intervals replicate across buckets
    assert out.count() == 2
    with pytest.raises(ValueError, match="inner"):
        range_join(pts, iv, "x", "lo", "hi", 10.0, how="full")


def test_dataframe_setops_match_sql_semantics(spark):
    # DataFrame union/intersect/subtract keep ANSI bag/set semantics
    # (coverage moved here when the setops gate row folded into the
    # sql_passthrough shared-text entry)
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    assert sorted(
        r["k"] for r in a.union(b).distinct().collect()
    ) == [1, 2, 3, 4]
    assert sorted(r["k"] for r in a.intersect(b).collect()) == [2, 3]
    # subtract = EXCEPT DISTINCT: the duplicate 2 is removed entirely
    assert sorted(r["k"] for r in a.subtract(b).collect()) == [1]
    # exceptAll keeps multiplicity: one 2 survives
    assert sorted(r["k"] for r in a.exceptAll(b).collect()) == [1, 2]


def test_asof_join_matched_null_value_stays_null(spark):
    """ASOF semantics parity (pandas merge_asof / DuckDB ASOF JOIN): the
    MATCHED right row's NULL value must come through as NULL, not be
    backfilled from an earlier right row by the ignorenulls fill."""
    from datamunging_spark.operators.relational import asof_join

    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, None)], "k int, ts int, px double"
    )
    left = spark.createDataFrame([(1, 25)], "k int, ts int")
    out = asof_join(
        left, right, "k", right_cols={"px": "asof_px", "ts": "asof_ts"}
    ).collect()
    assert out[0].asof_ts == 20 and out[0].asof_px is None


def test_asof_join_composite_key(spark):
    from datamunging_spark.operators.relational import asof_join

    right = spark.createDataFrame(
        [(1, "a", 10, 1.0), (1, "b", 10, 2.0)], "k1 int, k2 string, ts int, v double"
    )
    left = spark.createDataFrame(
        [(1, "a", 15), (1, "b", 15), (2, "a", 15)], "k1 int, k2 string, ts int"
    )
    out = asof_join(left, right, ["k1", "k2"], right_cols={"v": "asof_v"})
    got = sorted((r.k1, r.k2, r.asof_v) for r in out.collect())
    assert got == [(1, "a", 1.0), (1, "b", 2.0), (2, "a", None)]


def test_interval_join_overlaps_and_dedup(spark):
    from datamunging_spark.operators.relational import interval_join

    left = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 20.0, 25.0), (3, 40.0, 41.0)],
        "lid int, ls double, le double",
    )
    right = spark.createDataFrame(
        [(10, 5.0, 30.0), (11, 9.0, 9.5), (12, 50.0, 60.0)],
        "rid int, rs double, re double",
    )
    out = interval_join(left, right, "ls", "le", "rs", "re", bucket_width=2.0)
    got = sorted((r.lid, r.rid) for r in out.collect())
    # pair (1,10) spans many shared buckets — must appear exactly once
    assert got == [(1, 10), (1, 11), (2, 10)]


def test_interval_join_matches_duckdb_on_events(spark, tables):
    """Overlap join of per-user session-ish spans vs DuckDB's range
    predicate — validates banding + canonical-bucket dedup on real
    timestamps."""
    import duckdb

    from datamunging_spark.operators.relational import interval_join

    e = tables["events"]
    spans = (
        e.groupBy("user_id")
        .agg(
            F.min(F.unix_timestamp("ts")).cast("double").alias("s"),
            (F.min(F.unix_timestamp("ts")) + 3600).cast("double").alias("t"),
        )
    )
    a = spans.select(
        F.col("user_id").alias("a_uid"), F.col("s").alias("a_s"),
        F.col("t").alias("a_t"),
    )
    b = spans.select(
        F.col("user_id").alias("b_uid"), F.col("s").alias("b_s"),
        F.col("t").alias("b_t"),
    )
    out = interval_join(a, b, "a_s", "a_t", "b_s", "b_t", bucket_width=1800)
    got = sorted((r.a_uid, r.b_uid) for r in out.collect())
    con = duckdb.connect()
    want = sorted(
        (int(x), int(y))
        for x, y in con.execute(
            """
            WITH spans AS (
              SELECT user_id,
                     epoch(min(ts)) AS s, epoch(min(ts)) + 3600 AS t
              FROM read_parquet('/root/testdata/sf0.001/events.parquet')
              GROUP BY user_id)
            SELECT a.user_id, b.user_id
            FROM spans a, spans b
            WHERE a.s <= b.t AND b.s <= a.t
            """
        ).fetchall()
    )
    assert got == want and len(got) >= len(spans.collect())


def test_interval_join_plan_no_cartesian(spark):
    from datamunging_spark.operators.relational import interval_join

    left = spark.createDataFrame([(1, 0.0, 1.0)], "lid int, ls double, le double")
    right = spark.createDataFrame([(2, 0.5, 2.0)], "rid int, rs double, re double")
    plan = (
        interval_join(left, right, "ls", "le", "rs", "re", 1.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoop" not in final


def test_funnel_report_ordered_semantics(spark):
    from datamunging_spark.operators.relational import funnel_report

    rows = [
        # u1 completes a->b->c in order
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        # u2 has b BEFORE a, then no b after a: stops at step 1
        (2, 10, "b"), (2, 20, "a"),
        # u3 only a, b (c missing): step 2
        (3, 10, "a"), (3, 11, "b"),
        # u4 no step-1 event at all: not counted
        (4, 10, "c"),
        # u5 ties: b at the SAME ts as a counts (chained-min ts >= t1
        # semantics, identical to the SQL self-join formulation)
        (5, 10, "a"), (5, 10, "b"),
    ]
    events = spark.createDataFrame(rows, "user_id int, ts int, et string")
    out = funnel_report(events, "user_id", "ts", "et", ["a", "b", "c"])
    got = [(r.step, r.step_name, r.n_users) for r in out.collect()]
    assert got == [(1, "a", 4), (2, "b", 3), (3, "c", 1)]


def test_funnel_report_matches_duckdb_on_events(spark, tables):
    import duckdb

    from datamunging_spark.operators.relational import funnel_report

    out = funnel_report(
        tables["events"], "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )
    got = [(r.step, r.n_users) for r in out.collect()]
    con = duckdb.connect()
    want = con.execute(
        """
        WITH e AS (SELECT * FROM
                   read_parquet('/root/testdata/sf0.001/events.parquet')),
        u1 AS (SELECT user_id, min(ts) t1 FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        u2 AS (SELECT e.user_id, min(ts) t2 FROM e JOIN u1 USING (user_id)
               WHERE event_type = 'click' AND ts >= t1 GROUP BY e.user_id),
        u3 AS (SELECT e.user_id, min(ts) t3 FROM e JOIN u2 USING (user_id)
               WHERE event_type = 'purchase' AND ts >= t2 GROUP BY e.user_id)
        SELECT 1, count(*) FROM u1
        UNION ALL SELECT 2, count(*) FROM u2
        UNION ALL SELECT 3, count(*) FROM u3
        """
    ).fetchall()
    assert got == [(int(s), int(n)) for s, n in want]


def test_cohort_retention_matches_duckdb(spark, tables):
    import duckdb

    from datamunging_spark.operators.relational import cohort_retention

    out = cohort_retention(tables["events"], "user_id", "ts", period_days=7)
    got = sorted(
        (str(r.cohort_start), r.period_offset, r.n_users)
        for r in out.collect()
    )
    con = duckdb.connect()
    want = sorted(
        (str(c), int(o), int(n))
        for c, o, n in con.execute(
            """
            WITH e AS (SELECT * FROM
                       read_parquet('/root/testdata/sf0.001/events.parquet')),
            f AS (SELECT user_id, min(ts) ft FROM e GROUP BY user_id)
            SELECT CAST(date_trunc('day', ft) AS DATE) AS cohort,
                   CAST(floor(date_diff('day', CAST(date_trunc('day', ft) AS DATE),
                                        CAST(e.ts AS DATE)) / 7) AS INT) AS off,
                   count(DISTINCT e.user_id) AS n
            FROM e JOIN f USING (user_id)
            GROUP BY cohort, off
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_flatten_structs(spark):
    from datamunging_spark.operators.relational import flatten_structs

    df = spark.sql(
        """SELECT 1 AS id,
                  named_struct('a', 2, 'b',
                               named_struct('c', 'x', 'd', 3.5)) AS s,
                  array(named_struct('q', 7)) AS arr"""
    )
    out = flatten_structs(df)
    assert out.columns == ["id", "s_a", "s_b_c", "s_b_d", "arr"]
    r = out.collect()[0]
    assert (r.id, r.s_a, r.s_b_c, r.s_b_d) == (1, 2, "x", 3.5)
    assert r.arr[0].q == 7  # arrays (and structs inside them) untouched
    # idempotent on already-flat frames
    flat = spark.createDataFrame([(1, "a")], "id int, s string")
    assert flatten_structs(flat).columns == ["id", "s"]


def test_hypertable_rollup_sliding_windows(spark):
    from datamunging_spark.operators.relational import hypertable_rollup

    ev = spark.createDataFrame(
        [("2024-01-01 00:07:00", 1.0), ("2024-01-01 00:12:00", 2.0)],
        "ts string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
    out = hypertable_rollup(
        ev, "ts", "10 minutes", {"n": F.count(F.lit(1))}, slide="5 minutes"
    ).orderBy("bucket_start")
    rows = [(str(r.bucket_start), r.n) for r in out.collect()]
    # event@07 -> windows starting 00:00 and 00:05; event@12 -> 05 and 10
    assert rows == [
        ("2024-01-01 00:00:00", 1),
        ("2024-01-01 00:05:00", 2),
        ("2024-01-01 00:10:00", 1),
    ]


def test_flatten_structs_collision_and_backtick(spark):
    import pytest as _pytest

    from datamunging_spark.operators.relational import flatten_structs

    # name collision: existing a_b vs flattened a.b -> clear error
    df = spark.sql(
        "SELECT 1 AS a_b, named_struct('b', 2) AS a"
    )
    with _pytest.raises(ValueError, match="a_b"):
        flatten_structs(df)
    # backtick in a nested field name survives escaping
    df2 = spark.createDataFrame([({"a`b": 1},)], "s struct<`a``b`: int>")
    out = flatten_structs(df2)
    assert out.columns == ["s_a`b"]
    assert out.collect()[0][0] == 1


def test_top_k_per_group_rank_methods(spark):
    from datamunging_spark.operators.relational import top_k_per_group

    df = spark.createDataFrame(
        [(1, 30), (1, 20), (1, 20), (1, 10)], "g int, v int"
    )
    order = [F.desc("v")]
    rn = top_k_per_group(df, ["g"], order, 2)
    assert rn.count() == 2
    ties = top_k_per_group(df, ["g"], order, 2, method="rank")
    assert sorted(r.v for r in ties.collect()) == [20, 20, 30]  # boundary tie kept
    dense = top_k_per_group(df, ["g"], order, 2, method="dense_rank")
    assert sorted(r.v for r in dense.collect()) == [20, 20, 30]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        top_k_per_group(df, ["g"], order, 2, method="ntile")


def test_shuffle_partitions_auto_fallback(spark):
    """AQE-managed platforms set spark.sql.shuffle.partitions="auto";
    the distributed-prefix helpers must fall back to defaultParallelism
    instead of raising ValueError."""
    from types import SimpleNamespace

    from datamunging_spark.operators.relational import _shuffle_partitions

    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    fake = SimpleNamespace(
        conf=SimpleNamespace(get=lambda key, default="": "auto"),
        sparkContext=SimpleNamespace(defaultParallelism=7),
    )
    assert _shuffle_partitions(fake) == 7


def test_funnel_report_hot_user_valve(spark):
    from datamunging_spark.operators.relational import funnel_report

    rows = [
        # u1: completes within its first 3 step events
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
        # u2 (the bot): completes only at event 5 — beyond the cap
        (2, 1, "a"), (2, 2, "a"), (2, 3, "a"), (2, 4, "b"), (2, 5, "c"),
    ]
    events = spark.createDataFrame(rows, "user_id int, ts int, et string")
    full = funnel_report(events, "user_id", "ts", "et", ["a", "b", "c"])
    assert [r.n_users for r in full.collect()] == [2, 2, 2]
    capped = funnel_report(
        events, "user_id", "ts", "et", ["a", "b", "c"],
        max_events_per_user=3,
    )
    # the bot's earliest 3 step events are a,a,a -> stage 1 only
    assert [r.n_users for r in capped.collect()] == [2, 1, 1]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        funnel_report(events, "user_id", "ts", "et", ["a"],
                      max_events_per_user=0)


def test_cohort_retention_valve_keeps_cohort(spark):
    import datetime as _dt

    from datamunging_spark.operators.relational import cohort_retention

    def ts(day):
        return _dt.datetime(2024, 1, day)

    rows = [(1, ts(d)) for d in (1, 2, 8, 15)] + [(2, ts(9))]
    events = spark.createDataFrame(rows, "user_id int, ts timestamp")
    capped = cohort_retention(events, "user_id", "ts",
                              max_events_per_user=2)
    got = {(str(r.cohort_start), r.period_offset): r.n_users
           for r in capped.collect()}
    # u1's cohort (Jan 1) is unchanged; its offset-2 (day 15) presence is
    # dropped by the cap, offset-1 (day 8... beyond first 2 events) too
    assert got == {("2024-01-01", 0): 1, ("2024-01-09", 0): 1}


def test_interval_join_hot_bucket_valve(spark):
    from datamunging_spark.operators.relational import interval_join

    # 6 left and 6 right spans all inside one bucket, all overlapping
    left = spark.createDataFrame(
        [(i, 0.1 * i, 1.0) for i in range(6)], "lid int, ls double, le double"
    )
    right = spark.createDataFrame(
        [(i, 0.0, 0.9 + 0.01 * i) for i in range(6)],
        "rid int, rs double, re double",
    )
    full = interval_join(left, right, "ls", "le", "rs", "re", 10.0)
    assert full.count() == 36
    capped = interval_join(
        left, right, "ls", "le", "rs", "re", 10.0, max_rows_per_bucket=2
    )
    # earliest 2 per side by (start, end): lid 0,1 x rid 0,1
    got = sorted((r.lid, r.rid) for r in capped.collect())
    assert got == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_salted_join_matches_plain_join(spark):
    from datamunging_spark.operators.relational import salted_join

    big = spark.createDataFrame(
        [(k % 3, i) for i, k in enumerate(range(300))], "k int, v int"
    )
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (9, "z")], "k int, tag string"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(big, small, ["k"], n_salt=4,
                                   how=how).collect())
        )
        want = sorted(map(tuple, big.join(small, ["k"], how).collect()))
        assert got == want
    # determinism: same salt assignment across runs
    a = salted_join(big, small, ["k"], n_salt=4).count()
    b = salted_join(big, small, ["k"], n_salt=4).count()
    assert a == b == 200

    import pytest as _pytest
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], n_salt=0)
    with _pytest.raises(ValueError):
        salted_join(big.withColumn("tag", F.lit("x")), small, ["k"])


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in more than one salt bucket — the
    point of the operator."""
    from datamunging_spark.operators.relational import salted_join

    hot = spark.createDataFrame(
        [(1, i) for i in range(1000)], "k int, v int"
    )
    dim = spark.createDataFrame([(1, "hot")], "k int, tag string")
    out = salted_join(hot, dim, ["k"], n_salt=8)
    assert out.count() == 1000
    n_buckets = (
        hot.selectExpr("pmod(xxhash64(k, v), 8) AS s")
        .select("s").distinct().count()
    )
    assert n_buckets > 1


def test_incremental_rollup_matches_full_recompute(spark):
    import datetime as _dt

    from datamunging_spark.operators.relational import (
        hypertable_rollup,
        incremental_rollup,
    )

    def ev(day, hour, k, v):
        return (_dt.datetime(2024, 1, day, hour), k, float(v))

    schema = "ts timestamp, k string, v double"
    batch1 = spark.createDataFrame(
        [ev(1, 1, "a", 10), ev(1, 2, "a", 4), ev(1, 3, "b", 7)], schema
    )
    batch2 = spark.createDataFrame(
        [ev(1, 22, "a", 1), ev(2, 5, "a", 9), ev(2, 6, "c", 2)], schema
    )
    aggs = {
        "n": ("count",),
        "total": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    state = incremental_rollup(None, batch1, "ts", "1 day", aggs, keys=["k"])
    state = incremental_rollup(state, batch2, "ts", "1 day", aggs, keys=["k"])

    full = hypertable_rollup(
        batch1.unionByName(batch2),
        "ts",
        "1 day",
        {
            "n": F.count(F.lit(1)),
            "total": F.sum("v"),
            "lo": F.min("v"),
            "hi": F.max("v"),
        },
        keys=["k"],
    )
    got = sorted(map(tuple, state.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want
    # derived avg stays a projection over the maintained parts
    avg = {(r.k, r.bucket_start.day): r.total / r.n
           for r in state.collect()}
    assert avg[("a", 1)] == 5.0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        incremental_rollup(None, batch1, "ts", "1 day", {"m": ("avg", "v")})


def test_incremental_rollup_untouched_cells_pass_through(spark):
    import datetime as _dt

    from datamunging_spark.operators.relational import incremental_rollup

    schema = "ts timestamp, v double"
    b1 = spark.createDataFrame([(_dt.datetime(2024, 1, 1), 5.0)], schema)
    b2 = spark.createDataFrame([(_dt.datetime(2024, 3, 1), 2.0)], schema)
    aggs = {"total": ("sum", "v"), "n": ("count",)}
    state = incremental_rollup(None, b1, "ts", "1 day", aggs)
    state = incremental_rollup(state, b2, "ts", "1 day", aggs)
    rows = {r.bucket_start.month: (r.total, r.n) for r in state.collect()}
    assert rows == {1: (5.0, 1), 3: (2.0, 1)}


def test_incremental_rollup_null_key_cell_merges(spark):
    """A NULL key value is a real cell: folds must merge it, not
    fragment one new row per batch (null-safe grain join)."""
    import datetime as _dt

    from datamunging_spark.operators.relational import incremental_rollup

    schema = "ts timestamp, k string, v double"
    b1 = spark.createDataFrame(
        [(_dt.datetime(2024, 1, 1), None, 1.0)], schema
    )
    b2 = spark.createDataFrame(
        [(_dt.datetime(2024, 1, 1), None, 2.0)], schema
    )
    aggs = {"n": ("count",), "total": ("sum", "v")}
    state = incremental_rollup(None, b1, "ts", "1 day", aggs, keys=["k"])
    state = incremental_rollup(state, b2, "ts", "1 day", aggs, keys=["k"])
    rows = state.collect()
    assert len(rows) == 1
    assert rows[0].k is None and rows[0].n == 2 and rows[0].total == 3.0


def test_reserved_temp_column_guards_raise(spark):
    """Inputs already carrying an operator's reserved temp column raise
    loudly instead of being silently overwritten-and-dropped (ADVICE r7:
    same contract as dedup's _hash_tmp_guard)."""
    import pytest
    from datamunging_spark.operators.relational import (
        cap_rows_per_key,
        interval_join,
        range_join,
        salted_join,
    )

    base = spark.createDataFrame([(1, 10.0, 20.0)], "k int, s double, e double")
    with pytest.raises(ValueError, match="_salt"):
        salted_join(base.withColumn("_salt", F.lit(0)), base.select("k"), ["k"])
    with pytest.raises(ValueError, match="_salt"):
        salted_join(base, base.select("k").withColumn("_salt", F.lit(0)), ["k"])
    with pytest.raises(ValueError, match="_capn"):
        cap_rows_per_key(base.withColumn("_capn", F.lit(1)), ["k"], ["s"], 2)
    with pytest.raises(ValueError, match="_ibl"):
        interval_join(
            base.withColumn("_ibl", F.lit(0)),
            base.selectExpr("k as k2", "s as s2", "e as e2"),
            "s", "e", "s2", "e2", 10.0,
        )
    with pytest.raises(ValueError, match="_ibr"):
        interval_join(
            base,
            base.selectExpr("k as k2", "s as s2", "e as e2")
            .withColumn("_ibr", F.lit(0)),
            "s", "e", "s2", "e2", 10.0,
        )
    pts = spark.createDataFrame([(5.0,)], "p double")
    with pytest.raises(ValueError, match="_rbp"):
        range_join(pts.withColumn("_rbp", F.lit(0)), base, "p", "s", "e", 10.0)
    with pytest.raises(ValueError, match="_rbi"):
        range_join(pts, base.withColumn("_rbi", F.lit(0)), "p", "s", "e", 10.0)
