"""Dataset-history operators (snapshot_diff, scd2_build) and vocabulary
build/coverage — correctness vs independent re-derivations (pure-Python
and DuckDB) plus plan-shape guards."""

import duckdb
import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.history import (
    row_digest,
    scd2_build,
    snapshot_diff,
)
from datamunging_spark.operators.text import build_vocab, vocab_coverage


# ---------------------------------------------------------------------------
# snapshot_diff
# ---------------------------------------------------------------------------

def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (5, "e", 50)],
        "id int, s string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, None, None), (4, "d", 40), (5, "e", 50)],
        "id int, s string, v int",
    )
    got = {
        r.id: r.status for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {1: "removed", 3: "changed", 4: "added"}
    full = {
        r.id: r.status
        for r in snapshot_diff(
            old, new, ["id"], include_unchanged=True
        ).collect()
    }
    assert full[2] == "unchanged" and full[5] == "unchanged"
    assert len(full) == 5


def test_snapshot_diff_null_vs_value_shift(spark):
    """(NULL, 'x') and ('x', NULL) must NOT collide — the digest keeps
    nulls explicit, unlike xxhash64 where null input is a no-op."""
    old = spark.createDataFrame([(1, None, "x")], "id int, a string, b string")
    new = spark.createDataFrame([(1, "x", None)], "id int, a string, b string")
    got = snapshot_diff(old, new, ["id"]).collect()
    assert [(r.id, r.status) for r in got] == [(1, "changed")]


def test_snapshot_diff_no_compare_cols_raises(spark):
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(ValueError):
        snapshot_diff(df, df, ["id"])


def test_snapshot_diff_single_equi_join_plan(spark):
    old = spark.createDataFrame([(1, "a")], "id int, s string")
    new = spark.createDataFrame([(2, "b")], "id int, s string")
    plan = snapshot_diff(old, new, ["id"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_snapshot_diff_matches_duckdb(spark, tables):
    """Oracle cross-check on real data: mutate customer deterministically
    and diff — DuckDB derives the identical status set."""
    c = tables["customer"]
    old = c.filter(F.col("c_custkey") % 101 != 0)
    new = c.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 1.0
        ).otherwise(F.col("c_acctbal")),
    )
    got = sorted(
        (r.c_custkey, r.status)
        for r in snapshot_diff(
            old, new, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/customer.parquet')"
    )
    want = sorted(
        (int(k), s)
        for k, s in con.execute(
            """
            WITH old AS (SELECT c_custkey, c_acctbal, c_mktsegment
                         FROM customer WHERE c_custkey % 101 <> 0),
                 new AS (SELECT c_custkey,
                                CASE WHEN c_custkey % 13 = 0
                                     THEN c_acctbal + 1.0
                                     ELSE c_acctbal END AS c_acctbal,
                                c_mktsegment
                         FROM customer)
            SELECT COALESCE(o.c_custkey, n.c_custkey) AS k,
                   CASE WHEN o.c_custkey IS NULL THEN 'added'
                        WHEN n.c_custkey IS NULL THEN 'removed'
                        WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                          OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                        THEN 'changed' END AS status
            FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
            WHERE status IS NOT NULL
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# scd2_build
# ---------------------------------------------------------------------------

def test_scd2_intervals_and_current(spark):
    snaps = spark.createDataFrame(
        [
            (1, "x", 1), (1, "x", 2), (1, "y", 3), (1, "y", 4), (1, "x", 5),
            (2, "q", 2), (2, None, 3), (2, None, 4),
        ],
        "id int, attr string, v int",
    )
    rows = sorted(
        scd2_build(snaps, ["id"], ["attr"], "v").collect(),
        key=lambda r: (r.id, r.effective_from),
    )
    got = [
        (r.id, r.attr, r.effective_from, r.effective_to, r.is_current)
        for r in rows
    ]
    assert got == [
        (1, "x", 1, 3, False),
        (1, "y", 3, 5, False),
        (1, "x", 5, None, True),
        (2, "q", 2, 3, False),
        (2, None, 3, None, True),
    ]


def test_scd2_null_transitions_open_intervals(spark):
    """NULL→value and value→NULL are both changes (null-safe compare)."""
    snaps = spark.createDataFrame(
        [(1, None, 1), (1, "a", 2), (1, None, 3)], "id int, a string, v int"
    )
    rows = sorted(
        scd2_build(snaps, ["id"], ["a"], "v").collect(),
        key=lambda r: r.effective_from,
    )
    assert [(r.a, r.effective_from, r.effective_to) for r in rows] == [
        (None, 1, 2), ("a", 2, 3), (None, 3, None)
    ]


def test_scd2_multi_attr_and_single_exchange(spark):
    snaps = spark.createDataFrame(
        [(1, "a", 10, 1), (1, "a", 11, 2), (1, "b", 11, 3)],
        "id int, s string, n int, v int",
    )
    out = scd2_build(snaps, ["id"], ["s", "n"], "v")
    rows = sorted(out.collect(), key=lambda r: r.effective_from)
    assert [(r.s, r.n, r.effective_from) for r in rows] == [
        ("a", 10, 1), ("a", 11, 2), ("b", 11, 3)
    ]
    # windows + agg + lead all share the key partitioning: ONE exchange
    # (AQE's toString renders Final + Initial plans; count the final only)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    n_exchange = final.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_scd2_matches_pure_python(spark, tables):
    """Three synthetic versions of customer segments; re-derive runs with
    a driver-side reference implementation."""
    c = tables["customer"].select("c_custkey", "c_mktsegment").limit(200)
    versions = []
    for v in (1, 2, 3):
        versions.append(
            c.select(
                "c_custkey",
                F.when(
                    (F.col("c_custkey") + v) % 7 == 0, F.lit("SHIFTED")
                ).otherwise(F.col("c_mktsegment")).alias("seg"),
                F.lit(v).alias("v"),
            )
        )
    snaps = versions[0].unionByName(versions[1]).unionByName(versions[2])
    got = sorted(
        (r.c_custkey, r.seg, r.effective_from, r.effective_to, r.is_current)
        for r in scd2_build(snaps, ["c_custkey"], ["seg"], "v").collect()
    )
    # reference: group rows per key, scan versions in order
    by_key = {}
    for r in snaps.collect():
        by_key.setdefault(r.c_custkey, []).append((r.v, r.seg))
    want = []
    for k, vs in by_key.items():
        vs.sort()
        runs = []
        for v, seg in vs:
            if not runs or runs[-1][0] != seg:
                runs.append([seg, v, None])
        for i in range(len(runs) - 1):
            runs[i][2] = runs[i + 1][1]
        for seg, start, end in runs:
            want.append((k, seg, start, end, end is None))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# vocabulary
# ---------------------------------------------------------------------------

def test_build_vocab_deterministic_topk(spark):
    docs = spark.createDataFrame(
        [(1, "b a b c a b"), (2, "a c d"), (3, "")], "doc_id int, text string"
    )
    v = build_vocab(docs, vocab_size=3).collect()
    assert [(r.word, r.cnt, r.rank) for r in v] == [
        ("a", 3, 1), ("b", 3, 2), ("c", 2, 3)
    ]


def test_vocab_coverage_report(spark):
    docs = spark.createDataFrame(
        [(1, "b a b c a b"), (2, "a c d")], "doc_id int, text string"
    )
    v = build_vocab(docs, vocab_size=2)  # a, b
    r = vocab_coverage(docs, v).collect()[0]
    assert r.total_tokens == 9 and r.in_vocab_tokens == 6
    assert r.total_types == 4 and r.in_vocab_types == 2
    assert r.oov_rate == pytest.approx(1 - 6 / 9, abs=1e-6)


def test_vocab_matches_duckdb(spark, tables):
    got = [
        (r.word, r.cnt, r.rank)
        for r in build_vocab(tables["documents"], vocab_size=50).collect()
    ]
    con = duckdb.connect()
    want = con.execute(
        """
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        ), counts AS (
          SELECT word, COUNT(*) AS cnt FROM toks
          WHERE word <> '' GROUP BY word
        )
        SELECT word, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS rank
        FROM counts ORDER BY cnt DESC, word LIMIT 50
        """
    ).fetchall()
    assert got == [(w, int(c), int(rk)) for w, c, rk in want]


def test_build_vocab_no_global_sort(spark, tables):
    """orderBy.limit must plan as TakeOrderedAndProject (per-partition
    heaps), never a full Sort+Exchange of the corpus counts."""
    plan = (
        build_vocab(tables["documents"], vocab_size=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# apply_changelog
# ---------------------------------------------------------------------------

def _base_and_changes(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, s string, v int"
    )
    changes = spark.createDataFrame(
        [
            (2, "B1", 21, 1, "upsert"),   # superseded by v2
            (2, "B2", 22, 2, "upsert"),   # latest wins
            (3, None, None, 1, "delete"),
            (4, "d", 40, 1, "upsert"),    # insert
            (9, None, None, 1, "delete"), # delete of absent key: no-op
        ],
        "id int, s string, v int, ver int, op string",
    )
    return base, changes


def test_apply_changelog_upsert_delete_latest_wins(spark):
    from datamunging_spark.operators.history import apply_changelog

    base, changes = _base_and_changes(spark)
    out = apply_changelog(base, changes, ["id"], "ver", op_col="op")
    got = sorted((r.id, r.s, r.v) for r in out.collect())
    assert got == [(1, "a", 10), (2, "B2", 22), (4, "d", 40)]
    assert out.columns == base.columns


def test_apply_changelog_empty_and_replay_idempotent(spark):
    from datamunging_spark.operators.history import (
        apply_changelog,
        snapshot_diff,
    )

    base, changes = _base_and_changes(spark)
    empty = changes.limit(0)
    unchanged = apply_changelog(base, empty, ["id"], "ver", op_col="op")
    assert sorted(map(tuple, unchanged.collect())) == sorted(
        map(tuple, base.collect())
    )
    once = apply_changelog(base, changes, ["id"], "ver", op_col="op")
    twice = apply_changelog(once, changes, ["id"], "ver", op_col="op")
    # replay is a no-op: diffing the two applications finds nothing
    assert snapshot_diff(once, twice, ["id"]).count() == 0


def test_apply_changelog_pure_upsert_log(spark):
    from datamunging_spark.operators.history import apply_changelog

    base = spark.createDataFrame([(1, "a")], "id int, s string")
    changes = spark.createDataFrame(
        [(1, "a2", 5), (2, "b", 5)], "id int, s string, ver int"
    )
    got = sorted(
        map(tuple, apply_changelog(base, changes, ["id"], "ver").collect())
    )
    assert got == [(1, "a2"), (2, "b")]


def test_apply_changelog_roundtrip_with_diff_matches_duckdb(spark, tables):
    """Compose the family on real data: apply a synthetic changelog to
    customer, then snapshot_diff(base, applied) must recover exactly the
    changelog's effect — cross-checked against DuckDB end to end."""
    from datamunging_spark.operators.history import (
        apply_changelog,
        snapshot_diff,
    )

    c = tables["customer"].select("c_custkey", "c_mktsegment")
    changes = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit(1).alias("ver"),
        F.when(F.col("c_custkey") % 21 == 0, "delete")
        .otherwise("upsert")
        .alias("op"),
    )
    applied = apply_changelog(c, changes, ["c_custkey"], "ver", op_col="op")
    got = sorted(
        (r.c_custkey, r.status)
        for r in snapshot_diff(c, applied, ["c_custkey"]).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (int(k), s)
        for k, s in con.execute(
            """
            WITH c AS (SELECT c_custkey, c_mktsegment FROM
                       read_parquet('/root/testdata/sf0.001/customer.parquet'))
            SELECT c_custkey,
                   CASE WHEN c_custkey % 21 = 0 THEN 'removed'
                        WHEN c_mktsegment <> 'MOVED' THEN 'changed' END AS st
            FROM c WHERE c_custkey % 7 = 0
              AND (c_custkey % 21 = 0 OR c_mktsegment <> 'MOVED')
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_apply_changelog_plan_single_equi_join(spark):
    from datamunging_spark.operators.history import apply_changelog

    base, changes = _base_and_changes(spark)
    plan = (
        apply_changelog(base, changes, ["id"], "ver", op_col="op")
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoop" not in final
    # the latest-wins window runs over the changelog only — exactly one
    # Window exec node in the whole plan (WindowGroupLimit pre-filter
    # nodes that Spark inserts around row_number are fine and don't count)
    assert final.count("Window [") == 1, final


# ---------------------------------------------------------------------------
# scd2_lookup
# ---------------------------------------------------------------------------

def test_scd2_lookup_point_in_time(spark):
    from datamunging_spark.operators.history import scd2_build, scd2_lookup

    snaps = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 3), (1, "z", 5), (2, "q", 2)],
        "id int, attr string, v int",
    )
    dim = scd2_build(snaps, ["id"], ["attr"], "v")
    facts = spark.createDataFrame(
        [(1, 0), (1, 1), (1, 2), (1, 3), (1, 4), (1, 99), (2, 1), (2, 2), (3, 5)],
        "id int, ts int",
    )
    got = {
        (r.id, r.ts): r.attr
        for r in scd2_lookup(facts, dim, ["id"], "ts").collect()
    }
    assert got == {
        (1, 0): None,   # before first interval
        (1, 1): "x", (1, 2): "x",
        (1, 3): "y", (1, 4): "y",
        (1, 99): "z",   # open current interval
        (2, 1): None, (2, 2): "q",
        (3, 5): None,   # unknown key
    }


def test_scd2_lookup_respects_closed_intervals_with_gaps(spark):
    """Externally-built dim with a validity gap: a fact inside the gap gets
    NULL, not the stale earlier interval."""
    from datamunging_spark.operators.history import scd2_lookup

    dim = spark.createDataFrame(
        [(1, "early", 1, 3), (1, "late", 7, None)],
        "id int, attr string, effective_from int, effective_to int",
    )
    facts = spark.createDataFrame(
        [(1, 2), (1, 5), (1, 8)], "id int, ts int"
    )
    got = {
        (r.id, r.ts): r.attr
        for r in scd2_lookup(facts, dim, ["id"], "ts").collect()
    }
    assert got == {(1, 2): "early", (1, 5): None, (1, 8): "late"}


def test_scd2_lookup_composite_key_and_prefix(spark):
    from datamunging_spark.operators.history import scd2_lookup

    dim = spark.createDataFrame(
        [(1, "a", "v1", 1, None), (2, "a", "v2", 1, None)],
        "k1 int, k2 string, attr string, effective_from int, effective_to int",
    )
    facts = spark.createDataFrame(
        [(1, "a", 5, "keep"), (2, "a", 5, "keep")],
        "k1 int, k2 string, ts int, attr string",
    )
    out = scd2_lookup(facts, dim, ["k1", "k2"], "ts", prefix="dim_")
    got = sorted((r.k1, r.attr, r.dim_attr) for r in out.collect())
    assert got == [(1, "keep", "v1"), (2, "keep", "v2")]


def test_scd2_lookup_matches_duckdb(spark, tables):
    """Point-in-time lookup vs DuckDB's interval-predicate join on real
    data: dimension from three synthetic segment snapshots, facts at
    ts=2."""
    from datamunging_spark.operators.history import scd2_build, scd2_lookup

    c = tables["customer"]
    versions = [
        c.select(
            "c_custkey",
            F.when(
                (F.col("c_custkey") + v) % 7 == 0, F.lit("SHIFTED")
            ).otherwise(F.col("c_mktsegment")).alias("seg"),
            F.lit(v).alias("v"),
        )
        for v in (1, 2, 3)
    ]
    dim = scd2_build(
        versions[0].unionByName(versions[1]).unionByName(versions[2]),
        ["c_custkey"], ["seg"], "v",
    )
    facts = c.select("c_custkey", F.lit(2).alias("ts"))
    got = sorted(
        (r.c_custkey, r.seg)
        for r in scd2_lookup(facts, dim, ["c_custkey"], "ts").collect()
    )
    con = duckdb.connect()
    want = sorted(
        (int(k), s)
        for k, s in con.execute(
            """
            WITH c AS (SELECT * FROM
                       read_parquet('/root/testdata/sf0.001/customer.parquet')),
            snaps AS (
              SELECT c_custkey,
                     CASE WHEN (c_custkey + v) % 7 = 0 THEN 'SHIFTED'
                          ELSE c_mktsegment END AS seg, v
              FROM c CROSS JOIN (VALUES (1), (2), (3)) AS t(v)
            )
            SELECT c_custkey, seg FROM snaps WHERE v = 2
            """
        ).fetchall()
    )
    assert got == want


def test_scd2_lookup_no_range_join_plan(spark):
    from datamunging_spark.operators.history import scd2_lookup

    dim = spark.createDataFrame(
        [(1, "a", 1, None)],
        "id int, attr string, effective_from int, effective_to int",
    )
    facts = spark.createDataFrame([(1, 5)], "id int, ts int")
    plan = (
        scd2_lookup(facts, dim, ["id"], "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "BroadcastNestedLoop" not in final
    assert "SortMergeJoin" not in final  # union-tag fill, not a join at all


# ---------------------------------------------------------------------------
# versioned table store
# ---------------------------------------------------------------------------

def test_versioned_store_roll_read_diff(spark, tmp_path):
    from datamunging_spark.operators.history import snapshot_diff
    from datamunging_spark.sources.versioned import (
        latest_table_version,
        list_table_versions,
        read_table_version,
        roll_table_version,
        write_table_version,
    )

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, s string"
    )
    write_table_version(base, path, 1)
    assert latest_table_version(spark, path) == 1

    changes = spark.createDataFrame(
        [(2, "B", 1, "upsert"), (3, None, 1, "delete"), (4, "d", 1, "upsert")],
        "id int, s string, ver int, op string",
    )
    v = roll_table_version(spark, path, changes, ["id"], "ver", op_col="op")
    assert v == 2 and list_table_versions(spark, path) == [1, 2]

    v2 = read_table_version(spark, path)  # latest
    assert sorted(map(tuple, v2.collect())) == [(1, "a"), (2, "B"), (4, "d")]
    # point-in-time read of v1 is untouched
    v1 = read_table_version(spark, path, 1)
    assert sorted(map(tuple, v1.collect())) == [(1, "a"), (2, "b"), (3, "c")]
    # diff across stored versions recovers the changelog's effect
    got = {
        r.id: r.status for r in snapshot_diff(v1, v2, ["id"]).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_versioned_store_seeds_from_empty_and_ignores_torn(spark, tmp_path):
    import os

    from datamunging_spark.sources.versioned import (
        latest_table_version,
        read_table_version,
        roll_table_version,
    )

    path = str(tmp_path / "tbl2")
    changes = spark.createDataFrame(
        [(1, "a", 1, "upsert")], "id int, s string, ver int, op string"
    )
    # empty store: changelog seeds v1
    assert roll_table_version(
        spark, path, changes, ["id"], "ver", op_col="op"
    ) == 1
    assert [(r.id, r.s) for r in read_table_version(spark, path).collect()] \
        == [(1, "a")]
    # torn (marker-less) directory is invisible to readers
    os.makedirs(f"{path}/v2", exist_ok=True)
    assert latest_table_version(spark, path) == 1
    # the next roll retries v2 and commits over the torn directory
    assert roll_table_version(
        spark, path, changes, ["id"], "ver", op_col="op"
    ) == 2
    assert latest_table_version(spark, path) == 2


def test_versioned_store_replay_converges(spark, tmp_path):
    """Re-rolling the same changelog produces a new version with identical
    content — replays converge instead of corrupting."""
    from datamunging_spark.operators.history import snapshot_diff
    from datamunging_spark.sources.versioned import (
        read_table_version,
        roll_table_version,
    )

    path = str(tmp_path / "tbl3")
    changes = spark.createDataFrame(
        [(1, "a", 1, "upsert"), (2, None, 1, "delete")],
        "id int, s string, ver int, op string",
    )
    roll_table_version(spark, path, changes, ["id"], "ver", op_col="op")
    roll_table_version(spark, path, changes, ["id"], "ver", op_col="op")
    v1 = read_table_version(spark, path, 1)
    v2 = read_table_version(spark, path, 2)
    assert snapshot_diff(v1, v2, ["id"]).count() == 0


# ---------------------------------------------------------------------------
# scd2_apply_snapshot (incremental SCD-2 maintenance)
# ---------------------------------------------------------------------------

def test_scd2_apply_snapshot_equals_full_rebuild(spark, tables):
    """The defining contract: folding snapshots one at a time through
    scd2_apply_snapshot yields EXACTLY scd2_build over the whole stack."""
    from datamunging_spark.operators.history import (
        scd2_apply_snapshot,
        scd2_build,
    )

    c = tables["customer"].select("c_custkey", "c_mktsegment").limit(300)
    snaps = {
        v: c.select(
            "c_custkey",
            F.when(
                (F.col("c_custkey") + v) % 5 == 0, F.lit("SHIFTED")
            ).otherwise(F.col("c_mktsegment")).alias("seg"),
        )
        for v in (1, 2, 3, 4)
    }
    stacked = None
    for v, s in snaps.items():
        tagged = s.withColumn("v", F.lit(v))
        stacked = tagged if stacked is None else stacked.unionByName(tagged)
    full = scd2_build(stacked, ["c_custkey"], ["seg"], "v")

    inc = scd2_build(
        snaps[1].withColumn("v", F.lit(1)), ["c_custkey"], ["seg"], "v"
    )
    for v in (2, 3, 4):
        inc = scd2_apply_snapshot(
            inc, snaps[v], ["c_custkey"], ["seg"], v
        ).localCheckpoint()

    key = lambda r: (r.c_custkey, r.effective_from)
    got = sorted(map(tuple, inc.select(*full.columns).collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 300


def test_scd2_apply_snapshot_outcomes(spark):
    from datamunging_spark.operators.history import scd2_apply_snapshot

    dim = spark.createDataFrame(
        [
            (1, "old", 1, 2, False), (1, "x", 2, None, True),  # will change
            (2, "y", 1, None, True),                           # unchanged
            (3, "z", 1, None, True),                           # unobserved
        ],
        "id int, attr string, effective_from int, effective_to int,"
        " is_current boolean",
    )
    snap = spark.createDataFrame(
        [(1, "x2"), (2, "y"), (4, "new")], "id int, attr string"
    )
    out = scd2_apply_snapshot(dim, snap, ["id"], ["attr"], 5)
    got = sorted(
        (r.id, r.attr, r.effective_from, r.effective_to, r.is_current)
        for r in out.collect()
    )
    assert got == [
        (1, "old", 1, 2, False),
        (1, "x", 2, 5, False),
        (1, "x2", 5, None, True),
        (2, "y", 1, None, True),
        (3, "z", 1, None, True),
        (4, "new", 5, None, True),
    ]


def test_scd2_apply_snapshot_single_join_consumption(spark):
    """The join feeds ONE explode, not three filter branches — the plan
    contains exactly one join over the open/snapshot sides."""
    from datamunging_spark.operators.history import scd2_apply_snapshot

    dim = spark.createDataFrame(
        [(1, "x", 1, None, True)],
        "id int, attr string, effective_from int, effective_to int,"
        " is_current boolean",
    )
    snap = spark.createDataFrame([(1, "y")], "id int, attr string")
    plan = (
        scd2_apply_snapshot(dim, snap, ["id"], ["attr"], 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    n_joins = sum(final.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, final
    assert final.count("Generate") == 1  # the single explode


@pytest.mark.slow
def test_streaming_apply_changelog_rolls_versions(spark, tmp_path):
    """foreachBatch CDC loop: two micro-batches roll the versioned store
    through two committed versions; the final table reflects both
    changelogs in order and each intermediate version stays readable."""
    from datamunging_spark.sources.versioned import (
        list_table_versions,
        read_table_version,
        write_table_version,
    )
    from datamunging_spark.streaming import streaming_apply_changelog

    table = str(tmp_path / "cdc_tbl")
    write_table_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string"),
        table,
        1,
    )
    src = tmp_path / "cdc_src"
    src.mkdir()
    spark.createDataFrame(
        [(2, "B", 1, "upsert"), (3, "c", 1, "upsert")],
        "id int, s string, ver int, op string",
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [(1, None, 2, "delete"), (3, "c2", 2, "upsert")],
        "id int, s string, ver int, op string",
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("id int, s string, ver int, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    latest = streaming_apply_changelog(
        stream, table, ["id"], "ver", op_col="op",
        checkpoint_path=str(tmp_path / "cdc_ckpt"),
    )
    assert latest == 3
    assert list_table_versions(spark, table) == [1, 2, 3]
    final = sorted(
        map(tuple, read_table_version(spark, table).collect())
    )
    # the two batches may drain in either file order; both orders converge
    # on the same final state here because the edits touch disjoint pairs
    assert final == [(2, "B"), (3, "c2")] or final == [(2, "B"), (3, "c")]
    # with the observed f1-then-f2 order the middle version holds the
    # after-batch-1 state
    v2 = sorted(map(tuple, read_table_version(spark, table, 2).collect()))
    assert len(v2) == 3 or len(v2) == 2


def test_streaming_apply_changelog_seeds_empty_store(spark, tmp_path):
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_apply_changelog

    table = str(tmp_path / "cdc_tbl2")
    src = tmp_path / "cdc_src2"
    src.mkdir()
    spark.createDataFrame(
        [(1, "a", 1, "upsert")], "id int, s string, ver int, op string"
    ).coalesce(1).write.parquet(str(src / "f1"))
    stream = spark.readStream.schema(
        "id int, s string, ver int, op string"
    ).parquet(str(src) + "/*")
    latest = streaming_apply_changelog(stream, table, ["id"], "ver", op_col="op")
    assert latest == 1
    assert [(r.id, r.s) for r in read_table_version(spark, table).collect()] \
        == [(1, "a")]


def test_extract_changelog_roundtrip(spark, tables):
    """apply(old, extract(old, new)) == new — the closing identity of the
    history family, on real data with adds, deletes, and updates."""
    from datamunging_spark.operators.history import (
        apply_changelog,
        extract_changelog,
        snapshot_diff,
    )

    c = tables["customer"].select("c_custkey", "c_mktsegment", "c_acctbal")
    old = c.filter(F.col("c_custkey") % 11 != 0)       # some keys "new"
    new = c.filter(F.col("c_custkey") % 13 != 0).withColumn(  # some deleted
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 5.0
        ).otherwise(F.col("c_acctbal")),
    )
    log = extract_changelog(old, new, ["c_custkey"], version=7)
    assert set(log.select("ver").distinct().toPandas()["ver"]) == {7}
    rebuilt = apply_changelog(
        old, log, ["c_custkey"], "ver", op_col="op"
    )
    assert snapshot_diff(rebuilt, new, ["c_custkey"]).count() == 0
    assert rebuilt.count() == new.count()
    # the changelog is smaller than the republish (the point of extracting)
    assert log.count() < new.count()


def test_extract_changelog_delete_rows_null_payload(spark):
    from datamunging_spark.operators.history import extract_changelog

    old = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    new = spark.createDataFrame([(1, "a2")], "id int, s string")
    log = {
        (r.id): (r.s, r.op) for r in
        extract_changelog(old, new, ["id"], version=1).collect()
    }
    assert log == {1: ("a2", "upsert"), 2: (None, "delete")}


def test_vacuum_table_versions(spark, tmp_path):
    import os

    import pytest as _pytest

    from datamunging_spark.sources.versioned import (
        list_table_versions,
        vacuum_table_versions,
        write_table_version,
    )

    path = str(tmp_path / "vac")
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    for v in (1, 2, 3, 4):
        write_table_version(df, path, v)
    os.makedirs(f"{path}/v9", exist_ok=True)  # torn (or in-flight)
    deleted = vacuum_table_versions(spark, path, keep_last=2)
    assert deleted == [1, 2]
    assert list_table_versions(spark, path) == [3, 4]
    # torn dirs are KEPT by default: indistinguishable from a concurrent
    # writer's in-flight version
    assert os.path.exists(f"{path}/v9")
    vacuum_table_versions(spark, path, keep_last=2, drop_torn=True)
    assert not os.path.exists(f"{path}/v9")
    with _pytest.raises(ValueError):
        vacuum_table_versions(spark, path, keep_last=0)


def test_vacuum_preserves_cdc_batch_tags(spark, tmp_path):
    """Vacuum must not lose replay detection: a batch tag on a retired
    version survives in the root _CDC_BATCHES manifest, so a stream
    checkpoint replaying a batch older than the retention window still
    no-ops."""
    from datamunging_spark.sources.versioned import (
        batch_already_applied,
        vacuum_table_versions,
        write_table_version,
    )

    path = str(tmp_path / "vac_cdc")
    df = spark.createDataFrame([(1, "a")], "id int, s string")
    for v, bid in ((1, 10), (2, 11), (3, 12), (4, 13)):
        write_table_version(df, path, v, batch_id=bid)
    assert batch_already_applied(spark, path, 10)
    deleted = vacuum_table_versions(spark, path, keep_last=2)
    assert deleted == [1, 2]
    # tags of the retired v1/v2 survive via the manifest
    assert batch_already_applied(spark, path, 10)
    assert batch_already_applied(spark, path, 11)
    # tags of live versions still detected directly
    assert batch_already_applied(spark, path, 13)
    assert not batch_already_applied(spark, path, 99)


def test_apply_changelog_null_op_upserts(spark):
    """A NULL op value means upsert per the 'any other value upserts'
    contract — it must not silently keep the stale base payload."""
    from datamunging_spark.operators.history import apply_changelog

    base = spark.createDataFrame([(1, "old")], "id int, s string")
    changes = spark.createDataFrame(
        [(1, "new", 1, None), (2, "b", 1, None)],
        "id int, s string, ver int, op string",
    )
    got = sorted(
        map(tuple, apply_changelog(base, changes, ["id"], "ver",
                                   op_col="op").collect())
    )
    assert got == [(1, "new"), (2, "b")]


def test_streaming_apply_changelog_second_drain_and_replay(spark, tmp_path):
    """The restart scenario the version arithmetic must survive: drain
    once, then drain AGAIN with the same checkpoint and new files —
    versions stay contiguous; and a simulated replay (same batch tag
    already committed) is a no-op."""
    from datamunging_spark.sources.versioned import (
        batch_already_applied,
        list_table_versions,
        read_table_version,
    )
    from datamunging_spark.streaming import streaming_apply_changelog

    table = str(tmp_path / "cdc_tbl3")
    src = tmp_path / "cdc_src3"
    src.mkdir()
    ckpt = str(tmp_path / "cdc_ckpt3")
    schema = "id int, s string, ver int, op string"

    spark.createDataFrame([(1, "a", 1, "upsert")], schema) \
        .coalesce(1).write.parquet(str(src / "f1"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    assert streaming_apply_changelog(
        stream, table, ["id"], "ver", op_col="op", checkpoint_path=ckpt
    ) == 1

    # second drain, same checkpoint: Spark resumes batch ids at 1
    spark.createDataFrame([(2, "b", 1, "upsert")], schema) \
        .coalesce(1).write.parquet(str(src / "f2"))
    stream2 = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    assert streaming_apply_changelog(
        stream2, table, ["id"], "ver", op_col="op", checkpoint_path=ckpt
    ) == 2
    assert list_table_versions(spark, table) == [1, 2]
    assert sorted(map(tuple, read_table_version(spark, table).collect())) \
        == [(1, "a"), (2, "b")]
    # both drained batches carry their tags -> a replay would no-op
    assert batch_already_applied(spark, table, 0)
    assert batch_already_applied(spark, table, 1)
    assert not batch_already_applied(spark, table, 99)


def test_scd2_dimension_maintained_in_versioned_store(spark, tables, tmp_path):
    """Full composition: the SCD-2 dim lives in the versioned store and
    each crawl rolls it forward with scd2_apply_snapshot — the durable
    shape of dimension maintenance. Every stored version must equal the
    scd2_build full rebuild over the snapshots seen so far."""
    from datamunging_spark.operators.history import (
        scd2_apply_snapshot,
        scd2_build,
    )
    from datamunging_spark.sources.versioned import (
        read_table_version,
        write_table_version,
    )

    c = tables["customer"].select("c_custkey", "c_mktsegment").limit(150)
    snaps = {
        v: c.select(
            "c_custkey",
            F.when(
                (F.col("c_custkey") + v) % 4 == 0, F.lit("SHIFTED")
            ).otherwise(F.col("c_mktsegment")).alias("seg"),
        )
        for v in (1, 2, 3)
    }
    store = str(tmp_path / "dim_store")
    dim = scd2_build(
        snaps[1].withColumn("v", F.lit(1)), ["c_custkey"], ["seg"], "v"
    )
    write_table_version(dim, store, 1)
    for v in (2, 3):
        cur = read_table_version(spark, store)
        nxt = scd2_apply_snapshot(cur, snaps[v], ["c_custkey"], ["seg"], v)
        write_table_version(nxt, store, v)

    stacked = None
    for v in (1, 2, 3):
        t = snaps[v].withColumn("v", F.lit(v))
        stacked = t if stacked is None else stacked.unionByName(t)
        want = sorted(
            map(
                tuple,
                scd2_build(stacked, ["c_custkey"], ["seg"], "v")
                .select("c_custkey", "seg", "effective_from",
                        "effective_to", "is_current")
                .collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                read_table_version(spark, store, v)
                .select("c_custkey", "seg", "effective_from",
                        "effective_to", "is_current")
                .collect(),
            )
        )
        assert got == want, f"stored dim v{v} != full rebuild"


def test_schema_diff_reports_drift(spark):
    from datamunging_spark.operators.history import schema_diff

    old = spark.createDataFrame([], "id int, a string, b int")
    new = spark.createDataFrame([], "id int, a string, c double, b bigint")
    got = schema_diff(old, new)
    assert got == [
        {"column": "b", "status": "type_changed",
         "old_type": "int", "new_type": "bigint"},
        {"column": "c", "status": "added",
         "old_type": None, "new_type": "double"},
    ]
    assert schema_diff(old, old) == []


def test_snapshot_diff_column_attribution(spark):
    from datamunging_spark.operators.history import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id int, s string, v int"
    )
    new = spark.createDataFrame(
        [(1, "a2", 10), (2, "b", 99), (4, "d", 40)], "id int, s string, v int"
    )
    got = {
        r.id: (r.status, sorted(r.changed_columns or []) if
               r.changed_columns is not None else None)
        for r in snapshot_diff(
            old, new, ["id"], attribute_columns=True
        ).collect()
    }
    assert got == {
        1: ("changed", ["s"]),
        2: ("changed", ["v"]),
        3: ("removed", None),
        4: ("added", None),
    }


def test_scd2_validate(spark, tables):
    from datamunging_spark.operators.history import scd2_build, scd2_validate

    # well-formed: scd2_build output has zero violations
    c = tables["customer"].select("c_custkey", "c_mktsegment").limit(100)
    snaps = None
    for v in (1, 2):
        t = c.select(
            "c_custkey",
            F.when((F.col("c_custkey") + v) % 5 == 0, F.lit("S"))
            .otherwise(F.col("c_mktsegment")).alias("seg"),
            F.lit(v).alias("v"),
        )
        snaps = t if snaps is None else snaps.unionByName(t)
    dim = scd2_build(snaps, ["c_custkey"], ["seg"], "v")
    assert scd2_validate(dim, ["c_custkey"]).count() == 0

    # malformed table: every violation class detected
    bad = spark.createDataFrame(
        [
            (1, 5, 5, False),      # empty interval (from >= to)
            (2, 1, None, True), (2, 3, None, True),  # overlap + 2 open rows
            (3, 1, 4, True),       # flag says current but interval closed
            (4, 1, 2, False), (4, 2, None, True),    # clean key
        ],
        "id int, effective_from int, effective_to int, is_current boolean",
    )
    got = sorted(
        (r.id, r.violation) for r in scd2_validate(bad, ["id"]).collect()
    )
    assert (1, "empty_interval") in got
    assert (2, "overlap") in got
    assert (2, "multiple_current") in got
    assert (3, "flag_mismatch") in got
    assert not any(i == 4 for i, _ in got)


def test_scd2_validate_null_flag_is_mismatch(spark):
    """A NULL current_flag must REPORT as flag_mismatch — a non-null-safe
    comparison would NULL-out the predicate and silently validate."""
    from datamunging_spark.operators.history import scd2_validate

    bad = spark.createDataFrame(
        [(1, 1, 2, None), (1, 2, None, True)],
        "id int, effective_from int, effective_to int, is_current boolean",
    )
    got = {
        (r.effective_from, r.violation)
        for r in scd2_validate(bad, ["id"]).collect()
    }
    assert (1, "flag_mismatch") in got
    assert (2, "flag_mismatch") not in got
