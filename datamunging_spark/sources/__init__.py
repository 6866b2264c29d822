"""Sources & sinks (SURVEY.md §2.1, R1-R6a).

The reference ingests row-oriented delimited text and immediately
materializes a columnar copy for all real work (README.md:29-60, 111-117).
Our columnar format is Parquet (zstd): Catalyst gets column pruning,
predicate pushdown into row-group stats, and vectorized reads for free.
"""

from datamunging_spark.sources.io import (
    load_table,
    load_tables,
    local_table,
    materialize_columnar,
    read_csv,
    read_jsonl,
    read_lines,
    read_whole_files,
    write_csv,
    write_jsonl,
    write_parquet,
)

__all__ = [
    "load_table",
    "load_tables",
    "local_table",
    "materialize_columnar",
    "read_csv",
    "read_jsonl",
    "read_lines",
    "read_whole_files",
    "write_csv",
    "write_jsonl",
    "write_parquet",
]
