"""F1 fixture generator (FIXTURES.md): a deterministic Medicare-Part-B-shaped
dirty table mirroring the reference DDL (README.md:29-56) *including its
dirt* — empty npi rows (README.md:117), ~5% invalid HCPCS codes
(README.md:136-139), quoted commas in descriptions (README.md:170,203-211),
padded numeric strings (README.md:170), and $-prefixed money strings.

Driver-side generation (seeded, a few thousand rows) is intentional: this is
test input, not a scale path.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

MEDICARE_COLUMNS = [
    "npi",
    "nppes_provider_last_org_name",
    "nppes_provider_first_name",
    "nppes_provider_mi",
    "nppes_credentials",
    "nppes_provider_gender",
    "nppes_entity_code",
    "nppes_provider_street1",
    "nppes_provider_street2",
    "nppes_provider_city",
    "nppes_provider_zip",
    "nppes_provider_state",
    "nppes_provider_country",
    "provider_type",
    "medicare_participation_indicator",
    "places_of_service",
    "hcpcs_code",
    "hcpcs_desc",
    "hcpcs_drug_indicator",
    "line_srvc_cnt",
    "bene_unique_cnt",
    "bene_day_srvc_cnt",
    "average_Medicare_allowed_amt",
    "average_submitted_chrg_amt",
    "stdev_submitted_chrg_amt",
    "average_Medicare_payment_amt",
    "stdev_Medicare_payment_amt",
]

#: All-string schema, like the reference's text table (README.md:29-60) —
#: numerics arrive as (sometimes padded) strings; casts happen in queries.
MEDICARE_SCHEMA = StructType(
    [StructField(c, StringType()) for c in MEDICARE_COLUMNS]
)

_SURNAMES = ["SMITH", "JONES", "GARCIA", "CHEN", "PATEL", "MILLER"]
_FIRST = ["JOHN", "MARY", "WEI", "ANA", "RAVI", "SARA"]
_CREDS = ["MD", "M.D.", "PT", "DO", "O.D.", ""]
_TYPES = [
    "Internal Medicine",
    "Obstetrics/Gynecology",
    "General Practice",
    "Diagnostic Radiology",
    "Physical Therapist",
]
_DESCS = [
    "Office/outpatient visit est",
    'Screening papanicolaou smear; obtaining, preparing and conveyance "x"',
    "Injection, epidural, lumbar/sacral",
    "Ultrasound exam, abdominal, complete",
]
_STATES = ["NY", "CA", "TX", "FL", "WA", "IL"]


def _hcpcs(rng: random.Random) -> str:
    """~95% valid per `^[A-Z0-9]\\d{3}[A-Z0-9]$`, ~5% dirty."""
    roll = rng.random()
    if roll < 0.95:
        lead = rng.choice("GQJ9")
        return f"{lead}{rng.randint(0, 999):03d}{rng.choice('0123456789TU')}"
    return rng.choice(["9921", "q0091", "ABCDE1", "", "99x13"])


def medicare_rows(n_rows: int = 5000, seed: int = 42) -> list[tuple[str, ...]]:
    rng = random.Random(seed)
    n_providers = max(n_rows // 5, 1)
    npis = [f"{rng.randint(10**9, 10**10 - 1)}" for _ in range(n_providers)]
    rows = []
    for _ in range(n_rows):
        npi = "" if rng.random() < 0.005 else rng.choice(npis)
        srvc = int(rng.lognormvariate(2.5, 1.0)) + 1
        srvc_s = f" {srvc} " if rng.random() < 0.1 else str(srvc)
        money = lambda lo, hi: f"${rng.uniform(lo, hi):,.2f}"  # noqa: E731
        rows.append(
            (
                npi,
                rng.choice(_SURNAMES),
                rng.choice(_FIRST),
                rng.choice("ABCDEF") if rng.random() < 0.4 else "",
                rng.choice(_CREDS),
                rng.choice(["M", "F", ""]),
                rng.choice(["I", "O"]),
                f"{rng.randint(1, 9999)} MAIN ST",
                "" if rng.random() < 0.9 else f"SUITE {rng.randint(1, 99)}",
                "SPRINGFIELD",
                f"{rng.randint(10**8, 10**9 - 1)}",
                rng.choice(_STATES),
                "US",
                rng.choice(_TYPES),
                rng.choice(["Y", "N"]),
                rng.choice(["O", "F"]),
                _hcpcs(rng),
                rng.choice(_DESCS),
                rng.choice(["Y", "N", " N "]),
                srvc_s,
                str(rng.randint(1, srvc + 1)),
                str(rng.randint(1, srvc + 1)),
                money(10, 500),
                money(20, 900),
                money(0, 100),
                money(5, 400),
                money(0, 80),
            )
        )
    return rows


def medicare_df(
    spark: SparkSession, n_rows: int = 5000, seed: int = 42
) -> DataFrame:
    """The F1 table as a DataFrame (reference text-table analog, R1)."""
    return spark.createDataFrame(medicare_rows(n_rows, seed), MEDICARE_SCHEMA)


def write_medicare_csv(
    spark: SparkSession, path: str, n_rows: int = 5000, seed: int = 42
) -> None:
    """Raw-CSV rendition with the reference's framing dirt: a header line and
    a trailing copyright line riding inside the data (README.md:202-203)."""
    import csv
    import io
    import os

    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(MEDICARE_COLUMNS)
    w.writerows(medicare_rows(n_rows, seed))
    buf.write('"Copyright 2014 CMS-like fixture. All rights reserved."\n')
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "part-00000.csv"), "w") as f:
        f.write(buf.getvalue())
