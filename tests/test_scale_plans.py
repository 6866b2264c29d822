"""Plan-shape assertions for the 100 TB design points (SCALE.md): bucketed
co-located joins, partition pruning, and broadcast selection. These pin the
*physical plans*, not just results — a regression here is a scale bug even
when answers stay correct."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from datamunging_spark.sources import materialize_columnar
from datamunging_spark.sources.io import write_bucketed_table


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tables, tmp_path):
    """Same-key, same-count bucketed tables join with zero Exchange.
    (Managed tables land in the session warehouse dir, /tmp/spark-warehouse;
    dropped in the finally block.)"""
    write_bucketed_table(
        tables["orders"], "b_orders", "o_custkey", num_buckets=8
    )
    write_bucketed_table(
        tables["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        num_buckets=8,
    )
    # Disable auto-broadcast so the join would OTHERWISE shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(spark.table("b_customer"), "o_custkey")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partition_pruning_on_partitioned_write(spark, tables, tmp_path):
    """Writing partitioned-by-key and filtering on the key prunes the scan
    to matching directories (PartitionFilters, not data filters)."""
    p = str(tmp_path / "events_by_type")
    materialize_columnar(tables["events"], p, partition_by=["event_type"])
    df = spark.read.parquet(p).filter(F.col("event_type") == "click")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    n_click = tables["events"].filter(F.col("event_type") == "click").count()
    assert df.count() == n_click


def test_dim_join_broadcasts(spark, tables):
    """Small-dimension joins pick BroadcastHashJoin (no fact shuffle)."""
    j = tables["customer"].join(
        tables["nation"],
        tables["customer"].c_nationkey == tables["nation"].n_nationkey,
    )
    assert "BroadcastHashJoin" in _plan(j)
