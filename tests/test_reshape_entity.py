"""Reshape (pivot/melt), gap-fill, and entity-resolution operators."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.entity import (
    blocked_pairs,
    cluster_entities,
    name_similarity,
    resolve_entities,
)
from datamunging_spark.operators.relational import gap_fill, melt, pivot_table


# ---------------------------------------------------------------- reshape


def test_pivot_melt_roundtrip_matches_groupby(spark, tables):
    orders = tables["orders"]
    statuses = [
        r[0] for r in orders.select("o_orderstatus").distinct().collect()
    ]
    wide = pivot_table(
        orders,
        index=["o_orderpriority"],
        pivot_col="o_orderstatus",
        values=statuses,
        agg=F.count(F.lit(1)),
    )
    # one row per priority, one column per status
    assert set(wide.columns) == {"o_orderpriority", *statuses}
    long = melt(
        wide, ["o_orderpriority"], statuses, "o_orderstatus", "cnt"
    ).filter(F.col("cnt").isNotNull())
    expect = {
        (r[0], r[1]): r[2]
        for r in orders.groupBy("o_orderpriority", "o_orderstatus")
        .count()
        .collect()
    }
    got = {(r[0], r[1]): r[2] for r in long.collect()}
    assert got == expect


def test_pivot_with_declared_values_keeps_absent_columns(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2)], "k string, p string, v int"
    )
    wide = pivot_table(df, ["k"], "p", ["x", "y", "z"], F.sum("v"))
    row = wide.collect()[0]
    assert row["z"] is None and row["x"] == 1 and row["y"] == 2
    # declared domain: no extra job to discover distinct pivot values,
    # and the schema is stable even though 'z' never occurs
    assert wide.columns == ["k", "x", "y", "z"]


# ---------------------------------------------------------------- gap_fill


def _ts(day):
    return dt.datetime(2024, 1, day)


def test_gap_fill_forward_fills_missing_days(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(1), 10.0),
            ("a", _ts(4), 40.0),
            ("b", _ts(2), 5.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = gap_fill(df, ["k"], "ts", ["v"], step="1 day")
    rows = {(r["k"], r["ts"].day): (r["v"], r["n_obs"]) for r in out.collect()}
    assert rows == {
        ("a", 1): (10.0, 1),
        ("a", 2): (10.0, 0),
        ("a", 3): (10.0, 0),
        ("a", 4): (40.0, 1),
        ("b", 2): (5.0, 1),
    }


def test_gap_fill_off_grid_observation_carries_forward(spark):
    # an observation between grid points fills later grid points and is
    # counted in the bucket ending at the next grid point
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 0, 0), 1.0),
            ("a", dt.datetime(2024, 1, 1, 10, 30), 99.0),
            ("a", dt.datetime(2024, 1, 3, 0, 0), 3.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = gap_fill(df, ["k"], "ts", ["v"], step="1 day")
    rows = {r["ts"].day: (r["v"], r["n_obs"]) for r in out.collect()}
    assert rows == {1: (1.0, 1), 2: (99.0, 1), 3: (3.0, 1)}


def test_gap_fill_null_value_carried_over(spark):
    df = spark.createDataFrame(
        [("a", _ts(1), 7.0), ("a", _ts(2), None), ("a", _ts(3), 3.0)],
        "k string, ts timestamp, v double",
    )
    out = gap_fill(df, ["k"], "ts", ["v"], step="1 day")
    rows = {r["ts"].day: r["v"] for r in out.collect()}
    # NULL observation at day 2 is treated as missing → locf from day 1
    assert rows == {1: 7.0, 2: 7.0, 3: 3.0}


def test_gap_fill_empty_input(spark):
    df = spark.createDataFrame([], "k string, ts timestamp, v double")
    assert gap_fill(df, ["k"], "ts", ["v"]).count() == 0


def test_gap_fill_null_timestamp_rows_dropped(spark):
    """NULL-timestamp rows cannot sit on the grid; they must neither
    inflate the first grid point's n_obs (NULLs sort first in the window)
    nor seed the carried value."""
    df = spark.createDataFrame(
        [("a", None, 999.0), ("a", _ts(1), 10.0), ("a", _ts(3), 30.0)],
        "k string, ts timestamp, v double",
    )
    out = gap_fill(df, ["k"], "ts", ["v"], step="1 day")
    rows = {r["ts"].day: (r["v"], r["n_obs"]) for r in out.collect()}
    assert rows == {1: (10.0, 1), 2: (10.0, 0), 3: (30.0, 1)}
    # Σ n_obs == total NON-NULL-ts observations
    assert sum(n for _, n in rows.values()) == 2


# ------------------------------------------------------------------ entity


def _people(spark):
    # similarity facts (normalized edit similarity):
    #   1-2: dist 1 / len 10 = 0.900      1-3: dist 2 / len 11 = 0.818
    #   2-3: dist 1 / len 11 = 0.909      4-5: dist 1 / len 11 = 0.909
    return spark.createDataFrame(
        [
            (1, "ACME Corp", "111"),
            (2, "ACME Corps", "111"),    # near-dup of 1
            (3, "ACME Corpse", "111"),   # links to 2; to 1 only transitively
            (4, "Widget LLC", "222"),
            (5, "Widgets LLC", "222"),   # near-dup of 4
            (6, "Other Co", "111"),      # same block, no match
            (7, "Lone Star", None),      # NULL block key → singleton
        ],
        "id bigint, name string, zip string",
    )


def test_blocked_pairs_shape_and_null_blocks(spark):
    df = _people(spark)
    pairs = blocked_pairs(df, "id", F.col("zip"), ["name"])
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # within-block unordered pairs only; id 7 (NULL block) appears nowhere
    assert got == {(1, 2), (1, 3), (2, 3), (1, 6), (2, 6), (3, 6), (4, 5)}
    assert all(a < b for a, b in got)


def test_blocked_pairs_max_block_valve(spark):
    df = _people(spark)
    pairs = blocked_pairs(df, "id", F.col("zip"), ["name"], max_block=2)
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    assert got == {(4, 5)}  # the 4-record "111" block is dropped


def test_name_similarity_bounds(spark):
    df = spark.createDataFrame(
        [
            (0, "abc", "abc"), (1, "abc", "abd"), (2, "abc", "xyz"),
            (3, "", ""), (4, "a", None),
        ],
        "i int, a string, b string",
    )
    vals = {
        r["i"]: r["s"]
        for r in df.select("i", name_similarity("a", "b").alias("s")).collect()
    }
    assert vals[0] == 1.0
    assert abs(vals[1] - (1 - 1 / 3)) < 1e-12
    assert vals[2] == 0.0
    assert vals[3] == 1.0
    assert vals[4] is None


def test_resolve_entities_transitive_and_singletons(spark):
    df = _people(spark)
    out = resolve_entities(
        df,
        "id",
        F.col("zip"),
        ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.85,
    )
    ent = {r["id"]: r["entity_id"] for r in out.collect()}
    # 1–2 and 2–3 match directly; 1–3 alone scores 0.818 < 0.85 →
    # transitive closure still puts all three in entity 1
    assert ent[1] == ent[2] == ent[3] == 1
    assert ent[4] == ent[5] == 4
    assert ent[6] == 6 and ent[7] == 7
    assert out.count() == 7  # no records lost or duplicated


def test_resolve_entities_no_matches_all_singletons(spark):
    df = spark.createDataFrame(
        [(1, "aaa", "1"), (2, "zzz", "1")], "id bigint, name string, zip string"
    )
    out = resolve_entities(
        df, "id", F.col("zip"), ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.9,
    )
    assert {r["id"]: r["entity_id"] for r in out.collect()} == {1: 1, 2: 2}


def test_resolve_entities_empty_input(spark):
    df = spark.createDataFrame([], "id bigint, name string, zip string")
    out = resolve_entities(
        df, "id", F.col("zip"), ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.5,
    )
    assert out.count() == 0


# ---------------------------------------------------- global_row_number / SNM


def test_global_row_number_is_dense_and_ordered(spark, tables):
    from datamunging_spark.operators.relational import global_row_number

    c = tables["customer"].select("c_custkey", "c_name")
    rn = global_row_number(c, ["c_name", "c_custkey"])
    rows = [r for r in rn.orderBy("rn").collect()]
    n = c.count()
    assert [r["rn"] for r in rows] == list(range(1, n + 1))
    names = [r["c_name"] for r in rows]
    assert names == sorted(names)


def test_global_row_number_plan_has_no_single_task_window(spark, tables):
    # the point of the operator: no Window without partitionBy (which
    # funnels all rows through one task); every Window partitions by _pid
    import io
    from contextlib import redirect_stdout

    from datamunging_spark.operators.relational import global_row_number

    rn = global_row_number(
        tables["customer"].select("c_custkey"), ["c_custkey"]
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        rn.explain("formatted")
    plan = buf.getvalue()
    window_segs = [
        seg for seg in plan.split("Arguments: ")[1:]
        if seg.startswith("[row_number()")
    ]
    assert window_segs, plan  # the row_number window must actually appear
    for seg in window_segs:
        assert "_pid" in seg.split("\n", 1)[0]


def test_sorted_neighborhood_pairs_window_semantics(spark):
    from datamunging_spark.operators.entity import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "aa"), (2, "ab"), (3, "ac"), (4, "zz")],
        "id bigint, name string",
    )
    pairs = sorted_neighborhood_pairs(
        df, "id", F.col("name"), ["name"], window=3
    )
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # sort order aa<ab<ac<zz; each record pairs with its next 2 neighbors
    assert got == {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)}


def test_sorted_neighborhood_catches_blocking_key_typo(spark):
    # hash blocking on zip separates these (typo in the key); SNM on the
    # name keeps them adjacent
    from datamunging_spark.operators.entity import (
        blocked_pairs,
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(
        [(1, "ACME Corp", "11111"), (2, "ACME Corp", "11121")],
        "id bigint, name string, zip string",
    )
    hash_pairs = blocked_pairs(df, "id", F.col("zip"), ["name"])
    assert hash_pairs.count() == 0
    snm = sorted_neighborhood_pairs(df, "id", F.col("name"), ["name"])
    assert {(r["a_id"], r["b_id"]) for r in snm.collect()} == {(1, 2)}


def test_sorted_neighborhood_rejects_degenerate_window(spark):
    from datamunging_spark.operators.entity import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", F.col("name"), ["name"], window=1)


# ------------------------------------------------------------------ outliers


def test_outlier_flags_per_group(spark):
    from datamunging_spark.operators.quality import outlier_flags

    data = [("g", float(i)) for i in range(1, 21)] + [("g", 1000.0)]
    df = spark.createDataFrame(data, "k string, v double")
    out = outlier_flags(df, "v", keys=["k"])
    flagged = {r["v"] for r in out.filter("is_outlier").collect()}
    assert flagged == {1000.0}
    row = out.filter(F.col("v") == 1000.0).collect()[0]
    assert row["is_z_outlier"] and row["is_iqr_outlier"]
    assert row["zscore"] > 3


def test_outlier_flags_global_and_nulls(spark):
    from datamunging_spark.operators.quality import outlier_flags

    df = spark.createDataFrame(
        [(float(i),) for i in range(10)] + [(None,), (500.0,)], "v double"
    )
    out = outlier_flags(df, "v")
    rows = {r["v"]: r for r in out.collect()}
    assert rows[500.0]["is_outlier"]
    assert rows[None]["is_z_outlier"] is None
    assert rows[None]["is_iqr_outlier"] is None
    assert not rows[5.0]["is_outlier"]


def test_outlier_flags_constant_group_no_flags(spark):
    from datamunging_spark.operators.quality import outlier_flags

    df = spark.createDataFrame([("k", 7.0)] * 5, "k string, v double")
    out = outlier_flags(df, "v", keys=["k"])
    for r in out.collect():
        assert r["zscore"] is None          # stddev 0 → undefined z
        assert r["is_z_outlier"] is False   # but explicitly not an outlier
        assert r["is_iqr_outlier"] is False


# --------------------------------------------------- review-fix regressions


def test_gap_fill_unaligned_trailing_observation_not_dropped(spark):
    # range not a multiple of step: the 12:00 observation must land in an
    # extra bucket past max(time), not silently vanish
    df = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 0, 0), 1.0),
            ("a", dt.datetime(2024, 1, 2, 12, 0), 2.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = gap_fill(df, ["k"], "ts", ["v"], step="1 day")
    rows = {r["ts"]: (r["v"], r["n_obs"]) for r in out.collect()}
    assert rows == {
        dt.datetime(2024, 1, 1): (1.0, 1),
        dt.datetime(2024, 1, 2): (1.0, 0),
        dt.datetime(2024, 1, 3): (2.0, 1),
    }
    assert sum(n for _, n in rows.values()) == df.count()


def test_outlier_flags_null_key_group_detected(spark):
    # the NULL group-key group is a group: its stats must join back
    # (null-safe equality), so its outliers are flagged, not stranded
    from datamunging_spark.operators.quality import outlier_flags

    data = [(None, float(i)) for i in range(1, 21)] + [(None, 1000.0)]
    df = spark.createDataFrame(data, "k string, v double")
    out = outlier_flags(df, "v", keys=["k"])
    flagged = {r["v"] for r in out.filter("is_outlier").collect()}
    assert flagged == {1000.0}


def test_blocked_and_snm_pairs_union_compatible(spark):
    # docstring contract: run both blocking strategies, union the pair sets
    from datamunging_spark.operators.entity import sorted_neighborhood_pairs

    df = _people(spark).filter(F.col("zip").isNotNull())
    hp = blocked_pairs(df, "id", F.col("zip"), ["name"])
    sp = sorted_neighborhood_pairs(df, "id", F.col("name"), ["name"])
    assert set(hp.columns) == set(sp.columns)
    u = hp.unionByName(sp).dropDuplicates(["a_id", "b_id"])
    assert u.count() >= hp.count()


# ------------------------------------------------- survivorship / monitoring


def test_canonical_records_picks_one_per_entity(spark):
    from datamunging_spark.operators.entity import canonical_records

    df = spark.createDataFrame(
        [(1, 1, "old", 10), (2, 1, "new", 20), (3, 2, "only", 5)],
        "id bigint, entity_id bigint, tag string, updated int",
    )
    out = canonical_records(
        df, "entity_id", [F.desc("updated"), F.asc("id")]
    )
    rows = {r["entity_id"]: r["tag"] for r in out.collect()}
    assert rows == {1: "new", 2: "only"}
    assert out.columns == df.columns  # whole records, no helper columns


def test_merge_entity_fields_fieldwise_first_non_null(spark):
    from datamunging_spark.operators.entity import merge_entity_fields

    df = spark.createDataFrame(
        [
            # entity 1: newest (pref 1) lacks phone; older rows fill it
            (1, 1, "New Name", None),
            (1, 2, None, "555-1"),
            (1, 3, "Old Name", "555-9"),
            (2, 1, None, None),
        ],
        "entity_id bigint, pref int, name string, phone string",
    )
    out = merge_entity_fields(
        df, "entity_id", ["name", "phone"], [F.col("pref")]
    )
    rows = {r["entity_id"]: (r["name"], r["phone"]) for r in out.collect()}
    assert rows[1] == ("New Name", "555-1")  # per-field, not per-record
    assert rows[2] == (None, None)           # all-null stays null


def test_rolling_stats_trailing_window(spark):
    from datamunging_spark.operators.relational import rolling_stats

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(1, 6)],
        "k string, t int, v double",
    )
    out = rolling_stats(df, ["k"], ["t"], "v", window_rows=3,
                        stats=("avg", "sum", "count"))
    rows = {r["t"]: (r["roll_avg"], r["roll_sum"], r["roll_count"])
            for r in out.collect()}
    assert rows[1] == (1.0, 1.0, 1)
    assert rows[3] == (2.0, 6.0, 3)
    assert rows[5] == (4.0, 12.0, 3)  # only last 3 rows in the frame
    with pytest.raises(ValueError, match="unknown rolling"):
        rolling_stats(df, ["k"], ["t"], "v", 3, stats=("median",))


def test_skew_report_hot_key_and_salt(spark):
    from datamunging_spark.operators.quality import skew_report

    data = [("hot",)] * 90 + [("a",)] * 5 + [(None,)] * 5
    df = spark.createDataFrame(data, "k string")
    out = skew_report(df, ["k"], top_n=2, target_rows_per_task=40)
    rows = out.collect()
    assert rows[0]["k"] == "hot" and rows[0]["cnt"] == 90
    assert abs(rows[0]["fraction"] - 0.9) < 1e-9
    assert rows[0]["suggested_salt"] == 3  # ceil(90/40)
    assert len(rows) == 2  # top_n respected


def test_psi_report_stable_vs_shifted(spark):
    from datamunging_spark.operators.quality import psi_report

    base = spark.createDataFrame(
        [(float(i % 100),) for i in range(1000)], "v double"
    )
    same = psi_report(base, base, "v", bins=10)
    rows = same.collect()
    assert len(rows) == 10
    total_same = sum(r["psi_term"] for r in rows)
    assert total_same < 0.01  # identical distributions → PSI ≈ 0
    shifted = spark.createDataFrame(
        [(float(i % 100) + 80.0,) for i in range(1000)], "v double"
    )
    total_shift = sum(
        r["psi_term"] for r in psi_report(base, shifted, "v", bins=10).collect()
    )
    assert total_shift > 0.25  # strong shift → action threshold


# ------------------------------------------------------ incremental resolve


def _hist(spark):
    # already-resolved history: entities 1 (ACME) and 4 (Widget)
    return spark.createDataFrame(
        [
            (1, "ACME Corp", "111", 1),
            (2, "ACME Corps", "111", 1),
            (4, "Widget LLC", "222", 4),
        ],
        "id bigint, name string, zip string, entity_id bigint",
    )


def test_incremental_resolve_adopts_history_entity(spark):
    from datamunging_spark.operators.entity import incremental_resolve

    new = spark.createDataFrame(
        [
            (101, "ACME Corp", "111"),     # direct history match → entity 1
            (102, "Brand New Co", "333"),  # no match → own entity
        ],
        "id bigint, name string, zip string",
    )
    out = incremental_resolve(
        new, _hist(spark), "id", F.col("zip"), ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.85,
    )
    rows = {r["id"]: (r["entity_id"], r["n_hist_matches"])
            for r in out.collect()}
    assert rows[101] == (1, 1)
    assert rows[102] == (102, 0)


def test_incremental_resolve_transitive_through_batch_mate(spark):
    # 201 matches history; 202 matches only 201 — same batch cluster, so
    # 202 must still land in the adopted history entity
    from datamunging_spark.operators.entity import incremental_resolve

    new = spark.createDataFrame(
        [
            (201, "ACME Corps", "111"),
            (202, "ACME Corpse", "111"),  # sim(Corps, Corpse)=0.909 ≥ .85;
                                          # vs history "ACME Corp" = 0.818
        ],
        "id bigint, name string, zip string",
    )
    hist = _hist(spark).filter(F.col("id") == 1)  # only "ACME Corp", ent 1
    out = incremental_resolve(
        new, hist, "id", F.col("zip"), ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.85,
    )
    rows = {r["id"]: r["entity_id"] for r in out.collect()}
    # 201 vs "ACME Corp": sim 0.9 ≥ 0.85 → adopts 1; 202 via 201
    assert rows == {201: 1, 202: 1}


def test_incremental_resolve_bridge_reports_multi_history(spark):
    # one batch cluster matching TWO history entities adopts the min and
    # reports n_hist_matches=2 (merge-review signal, no silent rewrite)
    from datamunging_spark.operators.entity import incremental_resolve

    hist = spark.createDataFrame(
        [(1, "Foo Bar AG", "9", 1), (5, "Foo Baz AG", "9", 5)],
        "id bigint, name string, zip string, entity_id bigint",
    )
    new = spark.createDataFrame(
        [(301, "Foo Bax AG", "9")], "id bigint, name string, zip string"
    )
    out = incremental_resolve(
        new, hist, "id", F.col("zip"), ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.85,
    )
    r = out.collect()[0]
    assert r["entity_id"] == 1 and r["n_hist_matches"] == 2


def test_incremental_resolve_idempotent_reingest(spark):
    # re-ingesting already-resolved records lands them in their own
    # entities (the incremental-dedup idempotence contract, ER flavor)
    from datamunging_spark.operators.entity import incremental_resolve

    hist = _hist(spark)
    replay = hist.drop("entity_id").withColumn(
        "id", F.col("id") + 1000
    )
    out = incremental_resolve(
        replay, hist, "id", F.col("zip"), ["name"],
        match_cond=name_similarity("a_name", "b_name") >= 0.85,
    )
    rows = {r["id"]: r["entity_id"] for r in out.collect()}
    assert rows == {1001: 1, 1002: 1, 1004: 4}


# ------------------------------------------------------- sentence chunking


def test_sentence_chunk_packs_consecutive_sentences(spark):
    from datamunging_spark.operators.text import sentence_chunk_documents

    df = spark.createDataFrame(
        [(1, "A b. C d e. F g h i.")], "doc_id bigint, text string"
    )
    out = sentence_chunk_documents(df, max_tokens=5)
    rows = [
        (r["chunk_id"], r["chunk_text"], r["n_tokens"], r["n_sentences"])
        for r in out.orderBy("chunk_id").collect()
    ]
    # greedy: "A b." (2) + "C d e." (3) = 5 fits; "F g h i." (4) overflows
    assert rows == [(0, "A b. C d e.", 5, 2), (1, "F g h i.", 4, 1)]


def test_sentence_chunk_oversized_sentence_never_split(spark):
    from datamunging_spark.operators.text import sentence_chunk_documents

    long_sent = " ".join(f"w{i}" for i in range(20)) + "."
    df = spark.createDataFrame(
        [(1, f"Short. {long_sent} End.")], "doc_id bigint, text string"
    )
    out = sentence_chunk_documents(df, max_tokens=5)
    rows = [
        (r["chunk_text"], r["n_tokens"])
        for r in out.orderBy("chunk_id").collect()
    ]
    assert rows[0] == ("Short.", 1)
    assert rows[1][1] == 20          # oversized chunk, intact sentence
    assert rows[2] == ("End.", 1)
    # no sentence lost, none split mid-way
    assert " ".join(t for t, _ in rows) == f"Short. {long_sent} End."


def test_sentence_chunk_empty_and_null_docs(spark):
    from datamunging_spark.operators.text import sentence_chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id bigint, text string"
    )
    out = sentence_chunk_documents(df, max_tokens=5)
    rows = {(r["doc_id"], r["chunk_id"]): r["chunk_text"]
            for r in out.collect()}
    assert rows == {(1, 0): "", (2, 0): ""}


def test_sentence_chunk_reconstructs_document(spark, tables):
    from datamunging_spark.operators.text import sentence_chunk_documents

    docs = tables["documents"].limit(50)
    out = sentence_chunk_documents(docs, max_tokens=64)
    # every chunk respects the cap unless it is a single oversized sentence
    bad = out.filter(
        (F.col("n_tokens") > 64) & (F.col("n_sentences") > 1)
    ).count()
    assert bad == 0
    # chunks concatenated in order reproduce the sentence-joined document
    rebuilt = (
        out.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("re")
        )
    )
    import re as _re

    orig = {
        r["doc_id"]: _re.sub(r"(?<=[.!?])\s+", " ", r["text"] or "")
        for r in docs.collect()
    }
    for r in rebuilt.collect():
        assert r["re"] == orig[r["doc_id"]]


def test_streaming_resolve_rolls_history_across_microbatches(spark, tmp_path):
    """foreachBatch ER loop: a record arriving in a LATER micro-batch than
    its entity-mate still adopts the mate's entity via the rolled-forward
    history; fresh records mint new entities; the returned history covers
    seed + both batches."""
    from pyspark.sql import functions as F

    from datamunging_spark.operators.entity import name_similarity
    from datamunging_spark.streaming import streaming_resolve

    src = tmp_path / "er_src"
    src.mkdir()
    spark.createDataFrame(
        [(101, "ACME Corp", "111")], ["id", "name", "zip"]
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        # 201 near-dups batch-1's 101 (cross-micro-batch); 202 is fresh
        [(201, "ACME Corps", "111"), (202, "Fresh Co", "999")],
        ["id", "name", "zip"],
    ).coalesce(1).write.parquet(str(src / "f2"))

    seed = spark.createDataFrame(
        [(1, "Widget LLC", "222", 1)], ["id", "name", "zip", "entity_id"]
    )
    stream = (
        spark.readStream.schema("id long, name string, zip string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = tmp_path / "resolved"
    hist = streaming_resolve(
        stream,
        seed,
        "id",
        F.col("zip"),
        ["name"],
        name_similarity("a_name", "b_name") >= 0.85,
        resolved_path=str(out),
        checkpoint_path=str(tmp_path / "er_ckpt"),
    )
    resolved = spark.read.parquet(str(out))
    ent = {r["id"]: r["entity_id"] for r in resolved.collect()}
    assert ent[101] == 101          # batch 1: new entity
    assert ent[201] == 101          # batch 2: adopted via rolled history
    assert ent[202] == 202          # batch 2: fresh entity
    assert hist.count() == 4        # seed + three streamed records


@pytest.mark.slow
def test_streaming_resolve_bounded_history_and_durability(spark, tmp_path):
    """Compaction + retention: N micro-batches RE-INGESTING the same
    records keep the history row count flat (bounded by distinct ids,
    not stream volume); with history_path set, each batch commits a
    version, old versions are vacuumed to the retention window, and a
    restarted loop resumes from the latest committed version."""
    from pyspark.sql import functions as F

    from datamunging_spark.operators.entity import name_similarity
    from datamunging_spark.sources.versioned import list_table_versions
    from datamunging_spark.streaming import streaming_resolve

    src = tmp_path / "er_src_b"
    src.mkdir()
    rows = [(101, "ACME Corp", "111"), (102, "Fresh Co", "999")]
    # the SAME two records arrive in 4 separate micro-batches
    for i in range(4):
        spark.createDataFrame(rows, ["id", "name", "zip"]).coalesce(
            1
        ).write.parquet(str(src / f"f{i}"))

    seed = spark.createDataFrame(
        [(1, "Widget LLC", "222", 1)], ["id", "name", "zip", "entity_id"]
    )
    hpath = str(tmp_path / "er_hist")

    def run(ckpt):
        stream = (
            spark.readStream.schema("id long, name string, zip string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_resolve(
            stream,
            seed,
            "id",
            F.col("zip"),
            ["name"],
            name_similarity("a_name", "b_name") >= 0.85,
            checkpoint_path=ckpt,
            history_path=hpath,
        )

    hist = run(str(tmp_path / "er_ckpt_b"))
    # flat state: seed + 2 distinct ids, regardless of 4x re-ingestion
    assert hist.count() == 3
    assert sorted(r["id"] for r in hist.collect()) == [1, 101, 102]
    # retention: only the newest keep_last=2 versions survive vacuum
    assert len(list_table_versions(spark, hpath)) == 2
    # restart with a FRESH checkpoint: resumes from the committed
    # history; re-resolving the same ids still does not grow it
    hist2 = run(str(tmp_path / "er_ckpt_b2"))
    assert hist2.count() == 3


def test_blocking_report_sizes_and_valve(spark):
    from datamunging_spark.operators.entity import blocking_report

    df = spark.createDataFrame(
        [(1, "z"), (2, "z"), (3, "z"), (4, "y"), (5, None)],
        "id int, zip string",
    )
    r = blocking_report(df, F.col("zip"), max_block=2).collect()[0]
    assert r.n_blocks == 2 and r.n_null_rows == 1
    assert r.max_block_size == 3 and r.candidate_pairs == 3  # 3C2 + 1C2
    assert r.blocks_over_cap == 1 and r.pairs_dropped_by_cap == 3
    # valve off
    r2 = blocking_report(df, F.col("zip"), max_block=None).collect()[0]
    assert r2.blocks_over_cap == 0 and r2.pairs_dropped_by_cap == 0


@pytest.mark.slow
def test_streaming_rollup_matches_batch_and_survives_restart(spark, tmp_path):
    """foreachBatch continuous aggregate: micro-batch folds equal the
    full-recompute rollup; a second drain with the same checkpoint adds
    only new files; versions stay contiguous with retention."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from datamunging_spark.operators.relational import hypertable_rollup
    from datamunging_spark.sources.versioned import (
        list_table_versions,
        read_table_version,
    )
    from datamunging_spark.streaming import streaming_rollup

    src = tmp_path / "ru_src"
    src.mkdir()
    schema = "ts timestamp, k string, v double"
    b1 = [(_dt.datetime(2024, 1, 1, 3), "a", 5.0),
          (_dt.datetime(2024, 1, 1, 9), "b", 1.0)]
    b2 = [(_dt.datetime(2024, 1, 1, 20), "a", 2.0),
          (_dt.datetime(2024, 1, 2, 4), "a", 7.0)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "f2"))

    table = str(tmp_path / "ru_table")
    ckpt = str(tmp_path / "ru_ckpt")
    aggs = {"n": ("count",), "total": ("sum", "v"), "hi": ("max", "v")}

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        return streaming_rollup(
            stream, table, "ts", "1 day", aggs, keys=["k"],
            checkpoint_path=ckpt,
        )

    assert drain() == 2  # two micro-batches -> v1, v2
    got = sorted(map(tuple, read_table_version(spark, table).collect()))
    full = hypertable_rollup(
        spark.createDataFrame(b1 + b2, schema), "ts", "1 day",
        {"n": F.count(F.lit(1)), "total": F.sum("v"), "hi": F.max("v")},
        keys=["k"],
    )
    assert got == sorted(map(tuple, full.collect()))

    # second drain, same checkpoint, one new file: folds ONLY the new
    # batch (no double counting), version advances to 3, retention holds
    b3 = [(_dt.datetime(2024, 1, 2, 10), "b", 4.0)]
    spark.createDataFrame(b3, schema).coalesce(1).write.parquet(
        str(src / "f3"))
    assert drain() == 3
    assert list_table_versions(spark, table) == [2, 3]  # keep_last=2
    got3 = sorted(map(tuple, read_table_version(spark, table).collect()))
    full3 = hypertable_rollup(
        spark.createDataFrame(b1 + b2 + b3, schema), "ts", "1 day",
        {"n": F.count(F.lit(1)), "total": F.sum("v"), "hi": F.max("v")},
        keys=["k"],
    )
    assert got3 == sorted(map(tuple, full3.collect()))
