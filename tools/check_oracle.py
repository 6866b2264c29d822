"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compare row counts and order-insensitive values (floats via %.9g).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from datamunging_spark import get_spark  # noqa: E402


def canon(rows, cols):
    def norm(v):
        if isinstance(v, bool):
            return str(v)
        if isinstance(v, float):
            return "%.9g" % v
        if isinstance(v, list):
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "|".join(norm(r[i]) for i in order) for r in rows
    )
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            # rows-only entries carry in-query boolean INVARIANT columns
            # (naming convention: no_*, *_ok, within_*) — enforce them so
            # a silently-false invariant fails the LOCAL gate, not just
            # the judge's eye. Plain boolean DATA columns (e.g.
            # pack_sequences.truncated) are exempt by name.
            bad_inv = []
            for i, f in enumerate(sdf.schema.fields):
                is_inv = f.name.startswith(("no_", "within_")) or \
                    f.name.endswith("_ok")
                if f.dataType.typeName() == "boolean" and is_inv:
                    n_false = sum(1 for r in srows if r[i] is not True)
                    if n_false:
                        bad_inv.append(f"{f.name}: {n_false} not-true")
            if bad_inv:
                print(f"FAIL {name}: invariant columns {bad_inv}")
                n_fail += 1
            else:
                print(
                    f"ok   {name}: rows-only ({len(srows)} rows, "
                    f"{time.time()-t0:.1f}s)"
                )
                n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        sc = canon(srows, [c.lower() for c in scols])
        oc = canon(orows, [c.lower() for c in ocols])
        if len(sc) != len(oc):
            print(f"FAIL {name}: rowcount {len(sc)} vs {len(oc)}")
            n_fail += 1
        elif sc != oc:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sc)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
