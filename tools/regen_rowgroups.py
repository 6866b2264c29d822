"""Rewrite the sf0.1 fixture parquet files with MULTIPLE row groups,
content-identically (r17, verdict item 8).

Why: every driver-provided fixture table is ONE parquet file with ONE
row group, so a scan is structurally one task no matter the split
config — single-task Arrow/codegen passes (x1_span_portable,
x1_simhash, x1_embedding_neardup, x2_topk_cosine ...) run on 1 of 32
cores and the 8c/32c scaling ratios of those queries sit at ≈1 for
fixture reasons, not engine reasons. At 100 TB the input has thousands
of row groups and the same code parallelizes naturally; the fixture is
the artifact. The verdict prescribes regenerating the fixture with
multiple row groups (writer row-group sizing), NOT operator
repartitions (guide §8's anti-pattern).

Safety: values, row ORDER, schema (including events' TIMESTAMP(NANOS))
and compression are preserved; the rewrite is verified by re-reading
both files and asserting table equality before the original is
replaced. DuckDB (the oracle) and Spark read the same bytes-identical
values, so no declared query's output can change. Only sf0.1 (the
bench SF) is rewritten; the correctness SFs stay driver-pristine.

Row groups pair with `spark.sql.files.openCostInBytes` (session.py,
r17) — Spark's split size is min(maxPartitionBytes, max(openCost,
bytesPerCore)), so with the default 4 MB open cost a sub-4 MB file is
one split regardless of row groups.

Usage: python tools/regen_rowgroups.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# rows per row group, sized so groups land in the ~30-300 KB range at
# sf0.1 (≈ half the post-conf split size, so groups spread over splits)
ROW_GROUP_ROWS = {
    "documents": 256,
    "embeddings": 128,
    "events": 4096,
    "lineitem": 16384,
    "orders": 8192,
    "customer": 4096,
    "part": 4096,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    for name, rows in ROW_GROUP_ROWS.items():
        path = os.path.join(sf_dir, f"{name}.parquet")
        f = pq.ParquetFile(path)
        if f.num_row_groups > 1:
            print(f"{name}: already {f.num_row_groups} row groups, skip")
            continue
        table = pq.read_table(path)
        tmp = path + ".rgtmp"
        pq.write_table(
            table,
            tmp,
            row_group_size=rows,
            compression="snappy",
            store_schema=True,
        )
        back = pq.read_table(tmp)
        if not (back.schema.equals(table.schema) and back.equals(table)):
            os.remove(tmp)
            raise SystemExit(
                f"{name}: rewrite NOT content-identical — aborted"
            )
        os.replace(tmp, path)
        g = pq.ParquetFile(path)
        print(
            f"{name}: 1 -> {g.num_row_groups} row groups "
            f"({g.metadata.num_rows} rows, "
            f"{os.path.getsize(path) // 1024} KB)"
        )


if __name__ == "__main__":
    main()
