"""Versioned parquet table store: immutable ``v{N}`` directories with
commit markers, plus the roll-forward that applies a CDC changelog to
produce the next version — a mini-lakehouse on plain parquet, no table
format required (any engine can read a version directory).

Why versioned paths instead of overwrite-in-place: a rolled-forward
version's plan READS the previous version, and Spark cannot overwrite a
path its own plan is scanning (self-overwrite deletes input files
mid-scan). Immutable versions also give replay/audit and point-in-time
reads for free. Why commit markers: ``write.parquet`` is not atomic at
the directory level on object stores; a reader listing versions must
skip torn writes. Retire old versions out-of-band.

The marker machinery here is shared with the streaming snapshot loop
(datamunging_spark.streaming imports these helpers), so batch tables and
streaming snapshots carry the same durability contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_SNAPSHOTS_COMMITTED"


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def version_committed(spark: SparkSession, vpath: str) -> bool:
    """True when ``vpath`` carries the commit marker."""
    fs, jvm = _fs(spark, vpath)
    return fs.exists(jvm.org.apache.hadoop.fs.Path(f"{vpath}/{COMMIT_MARKER}"))


def mark_committed(spark: SparkSession, vpath: str) -> None:
    """Drop the commit marker into ``vpath`` (the LAST step of a write)."""
    fs, jvm = _fs(spark, vpath)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{vpath}/{COMMIT_MARKER}"), True
    ).close()


def list_table_versions(spark: SparkSession, path: str) -> list[int]:
    """All COMMITTED ``v{N}`` versions under ``path``, ascending. Torn
    (marker-less) directories are invisible — the durability contract."""
    fs, jvm = _fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(jpath):
        return []
    versions = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if name.startswith("v") and name[1:].isdigit():
            v = int(name[1:])
            if version_committed(spark, f"{path}/{name}"):
                versions.append(v)
    return sorted(versions)


def latest_table_version(spark: SparkSession, path: str) -> int | None:
    """Highest committed version number, or None for an empty store."""
    versions = list_table_versions(spark, path)
    return versions[-1] if versions else None


def write_table_version(
    df: DataFrame, path: str, version: int
) -> None:
    """Materialize ``df`` as ``{path}/v{version}`` and commit it. The
    write is overwrite-idempotent: a retried batch rewrites the same
    version directory and re-marks it, so replays converge instead of
    duplicating."""
    vpath = f"{path}/v{version}"
    df.write.mode("overwrite").parquet(vpath)
    mark_committed(df.sparkSession, vpath)


def read_table_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read one committed version (default: latest) — the point-in-time
    read face of the store."""
    if version is None:
        version = latest_table_version(spark, path)
        if version is None:
            raise FileNotFoundError(f"no committed versions under {path}")
    vpath = f"{path}/v{version}"
    if not version_committed(spark, vpath):
        raise FileNotFoundError(f"version v{version} not committed at {path}")
    return spark.read.parquet(vpath)


def roll_table_version(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    op_col: str | None = None,
) -> int:
    """Apply a CDC changelog to the latest committed version and commit
    the result as the next version; returns the new version number. For
    an empty store, the changelog's upserts seed ``v1``.

    One read of the previous version + operators/history.apply_changelog
    (changelog-only window, one merge join) + one write. The write is a
    different directory than the read, so the plan never scans what it is
    overwriting; a crash before the marker leaves a torn, invisible
    directory that the retry rewrites.
    """
    from datamunging_spark.operators.history import apply_changelog

    latest = latest_table_version(spark, path)
    if latest is None:
        payload = [
            c
            for c in changes.columns
            if c not in {version_col} | ({op_col} if op_col else set())
        ]
        base = changes.select(*payload).limit(0)
        new_version = 1
    else:
        base = read_table_version(spark, path, latest)
        new_version = latest + 1
    rolled = apply_changelog(
        base, changes, keys, version_col, op_col=op_col
    )
    write_table_version(rolled, path, new_version)
    return new_version


def vacuum_table_versions(
    spark: SparkSession, path: str, keep_last: int = 2
) -> list[int]:
    """Retire old committed versions, keeping the newest ``keep_last``
    (and every torn directory is removed too — they are invisible
    garbage by contract). Returns the version numbers deleted. The store
    lifecycle's out-of-band cleanup; point-in-time reads older than the
    retention window become FileNotFoundError afterwards, so pick
    ``keep_last`` to cover the audit horizon."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (never vacuum the head)")
    fs, jvm = _fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(jpath):
        return []
    committed = list_table_versions(spark, path)
    keep = set(committed[-keep_last:])
    deleted = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        v = int(name[1:])
        if v in keep:
            continue
        fs.delete(status.getPath(), True)
        if v in set(committed):
            deleted.append(v)
    return sorted(deleted)
