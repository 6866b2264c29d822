"""Reference-pipeline parity on the Medicare-shaped F1 fixture: the actual
chapters of the reference run end-to-end on its actual (dirty) schema.

Covers: R1 csv ingest with framing dirt, R7-R9/R19 data-quality report,
R15-R18/R21 percentile bucketing on padded numeric strings, R24 money parse,
R28 by-key sampling invariant.
"""

import pytest
from pyspark.sql import functions as F

from datamunging_spark.functions import (
    cast_int_hive,
    key_sample_pred,
    parse_money,
)
from datamunging_spark.operators.quality import (
    invalid_value_report,
    regex_rule,
)
from datamunging_spark.operators.relational import percentile_bucketize
from datamunging_spark.sources.medicare_fixture import (
    MEDICARE_SCHEMA,
    medicare_df,
    write_medicare_csv,
)
from datamunging_spark.sources import read_csv

HCPCS_RE = r"(^[A-Z0-9]\d{3}[A-Z0-9]$)"


@pytest.fixture(scope="module")
def medicare(spark):
    df = medicare_df(spark, n_rows=3000, seed=42)
    df.cache()
    return df


def test_csv_ingest_with_framing_dirt(spark, tmp_path):
    """R1: header + trailing copyright line ride inside the file
    (README.md:202-203); quote-aware parsing keeps comma-bearing
    descriptions aligned (README.md:170,203-211)."""
    p = str(tmp_path / "medicare_csv")
    write_medicare_csv(spark, p, n_rows=500, seed=7)
    df = read_csv(spark, p, MEDICARE_SCHEMA, header=True)
    # The copyright line parses as a 1-field row -> npi holds the text.
    # NB: Spark's CSV reader yields NULL for unquoted empty fields where a
    # Hive text table yields '' — the reference's own `npi != ''` guard
    # (README.md:117) drops those rows under EITHER encoding, so R9
    # semantics are preserved; the null-safe coalesce here is only for the
    # copyright-line filter.
    legit = df.filter(
        F.coalesce(~F.col("npi").contains("Copyright"), F.lit(True))
    )
    assert legit.count() == 500
    assert legit.filter(F.col("npi") != "").count() < 500  # R9 guard works
    # Quoted description with embedded commas stays in one column.
    assert (
        legit.filter(F.col("hcpcs_desc").contains("obtaining, preparing"))
        .filter(F.col("hcpcs_drug_indicator").isin("Y", "N", " N "))
        .count()
        > 0
    )


def test_quality_report_bad_hcpcs(medicare):
    """R7+R8+R19+R14 (README.md:126-132): bad-code report. The planted dirt
    rate is ~5%."""
    rule = regex_rule("hcpcs_fmt", "hcpcs_code", HCPCS_RE)
    bad = invalid_value_report(medicare, rule, "hcpcs_code", out="cnt")
    bad_rows = {r["hcpcs_code"]: r["cnt"] for r in bad.collect()}
    assert set(bad_rows) <= {"9921", "q0091", "ABCDE1", "", "99x13"}
    total_bad = sum(bad_rows.values())
    assert 0.02 < total_bad / 3000 < 0.10


def test_percentile_bucketize_on_padded_strings(medicare):
    """R16 flagship on the reference's own shape: cast padded
    line_srvc_cnt strings (R18 NULL-on-failure), bucket per hcpcs_code."""
    df = medicare.filter(F.col("npi") != "").withColumn(
        "srvc", cast_int_hive("line_srvc_cnt")
    )
    assert df.filter(F.col("srvc").isNull()).count() == 0  # trim handles pads
    out = percentile_bucketize(
        df.filter(F.col("hcpcs_code").rlike(HCPCS_RE)),
        "hcpcs_code",
        "srvc",
        keep_cols=["npi"],
    )
    buckets = {r["bucket"] for r in out.select("bucket").distinct().collect()}
    assert "10th" in buckets and ("99th" in buckets or "99+th" in buckets)
    assert out.count() > 0


def test_money_parse(medicare):
    """R24: '$1,234.56' strings -> decimal; NULL on malformed."""
    parsed = medicare.select(
        parse_money("average_submitted_chrg_amt").alias("amt")
    )
    assert parsed.filter(F.col("amt").isNull()).count() == 0
    stats = parsed.agg(F.min("amt").alias("lo"), F.max("amt").alias("hi")).first()
    assert float(stats["lo"]) >= 20.0 and float(stats["hi"]) <= 900.0


def test_by_key_sample_all_or_none(medicare):
    """R28 (fixes the reference's broken DataFu example, README.md:173-179):
    every sampled npi keeps ALL its rows."""
    nonempty = medicare.filter(F.col("npi") != "")
    sampled = nonempty.filter(key_sample_pred("npi"))
    per_key = (
        nonempty.groupBy("npi")
        .agg(F.count(F.lit(1)).alias("n_all"))
        .join(
            sampled.groupBy("npi").agg(F.count(F.lit(1)).alias("n_kept")),
            "npi",
        )
    )
    assert per_key.filter(F.col("n_all") != F.col("n_kept")).count() == 0
    frac = sampled.count() / nonempty.count()
    assert 0.1 < frac < 0.3  # ~19.9% of keys
