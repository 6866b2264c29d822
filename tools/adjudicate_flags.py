"""Adjudicate flagged bench queries: isolated warm re-runs.

BASELINE.md's flag rule (Δ>1.3 normalized AND growth>0.4 s) can trip on
load-drain noise — a bench run racing a just-finished pytest session
measures the machine, not the code (r8 embedding-neardup precedent;
r9 x4_text_suite / x_curation_full flags on byte-identical code).
The adjudication protocol: re-run ONLY the flagged queries on a quiet
machine (check `uptime` first), warm (one untimed execution, then
N timed reps), and compare the warm median against the pre-flag round's
median. If the flag vanishes, record it as load-drain; if it
reproduces, profile the query.

Usage:
    python tools/adjudicate_flags.py x4_text_suite x_curation_full [--reps 5]

Prints one JSON line per query:
    {"query": ..., "warm_median": ..., "samples": [...], "load_1m": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from datamunging_spark import get_spark


def main() -> None:
    reps = 5
    names = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    load_1m = os.getloadavg()[0]
    spark = get_spark("adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # JVM/codegen warm (same as bench.py's warm step).
    entrymod.q_r13_count(spark, sf_dir).count()

    for name in names:
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        fn(spark, sf_dir).count()  # per-query warm execution, untimed
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 4))
        print(json.dumps({
            "query": name,
            "warm_median": round(statistics.median(samples), 4),
            "samples": samples,
            "load_1m_at_start": round(load_1m, 2),
        }))


if __name__ == "__main__":
    main()
