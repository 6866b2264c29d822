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

# Root-level manifest of applied CDC batch ids. Version directories carry
# their own _CDC_BATCH_{id} tag, but vacuum deletes retired versions WITH
# their tags — without a root manifest, a stream checkpoint replaying a
# batch older than the retention window would be re-applied as a new
# version (convergent only because apply_changelog is idempotent, and a
# spurious extra version either way). vacuum_table_versions copies tags
# into this directory before deleting, so batch_already_applied keeps
# detecting replays across the full table lifetime.
BATCHES_DIR = "_CDC_BATCHES"


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
    df: DataFrame, path: str, version: int, batch_id: int | None = None
) -> None:
    """Materialize ``df`` as ``{path}/v{version}`` and commit it. The
    write is overwrite-idempotent: a retried batch rewrites the same
    version directory and re-marks it, so replays converge instead of
    duplicating. ``batch_id`` (streaming) tags the version with its
    producing micro-batch BEFORE the commit marker, so
    :func:`batch_already_applied` can detect replays."""
    vpath = f"{path}/v{version}"
    df.write.mode("overwrite").parquet(vpath)
    if batch_id is not None:
        mark_batch_applied(df.sparkSession, vpath, batch_id)
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
    version: int | None = None,
    batch_id: int | None = None,
) -> int:
    """Apply a CDC changelog to the latest committed version and commit
    the result as the next version; returns the new version number. For
    an empty store, the changelog's upserts seed ``v1``. Pass ``version``
    to pin the target explicitly (streaming replays re-target their OWN
    version); it must be latest+1 (or 1 on an empty store) — the store
    never skips numbers.

    One read of the previous version + operators/history.apply_changelog
    (changelog-only window, one merge join) + one write. The write is a
    different directory than the read, so the plan never scans what it is
    overwriting; a crash before the marker leaves a torn, invisible
    directory that the retry rewrites.
    """
    from datamunging_spark.operators.history import apply_changelog

    latest = latest_table_version(spark, path)
    new_version = (latest or 0) + 1 if version is None else version
    if new_version != (latest or 0) + 1:
        raise ValueError(
            f"version must be contiguous: latest committed is {latest}, "
            f"got target {new_version}"
        )
    if latest is None:
        payload = [
            c
            for c in changes.columns
            if c not in {version_col} | ({op_col} if op_col else set())
        ]
        base = changes.select(*payload).limit(0)
    else:
        base = read_table_version(spark, path, latest)
    rolled = apply_changelog(
        base, changes, keys, version_col, op_col=op_col
    )
    write_table_version(rolled, path, new_version, batch_id=batch_id)
    return new_version


def vacuum_table_versions(
    spark: SparkSession,
    path: str,
    keep_last: int = 2,
    drop_torn: bool = False,
) -> list[int]:
    """Retire old committed versions, keeping the newest ``keep_last``.
    Returns the version numbers deleted. The store lifecycle's
    out-of-band cleanup; point-in-time reads older than the retention
    window become FileNotFoundError afterwards, so pick ``keep_last`` to
    cover the audit horizon.

    ``drop_torn=False`` (default) leaves marker-less directories alone:
    a torn directory is indistinguishable from a version a CONCURRENT
    writer is materializing right now, and deleting it under the writer
    would let the writer's trailing mark_committed stamp a commit marker
    onto a gutted directory. Pass ``drop_torn=True`` only when no writer
    can be active (same single-writer window as any destructive
    maintenance)."""
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
        is_committed = v in set(committed)
        if not is_committed and not drop_torn:
            continue
        if is_committed:
            # Preserve the version's CDC batch tags in the root manifest
            # BEFORE deleting, so replay detection survives retention.
            for fstat in fs.listStatus(status.getPath()):
                fname = fstat.getPath().getName()
                if fname.startswith("_CDC_BATCH_"):
                    bid = fname[len("_CDC_BATCH_"):]
                    fs.mkdirs(
                        jvm.org.apache.hadoop.fs.Path(
                            f"{path}/{BATCHES_DIR}"
                        )
                    )
                    fs.create(
                        jvm.org.apache.hadoop.fs.Path(
                            f"{path}/{BATCHES_DIR}/{bid}"
                        ),
                        True,
                    ).close()
        fs.delete(status.getPath(), True)
        if is_committed:
            deleted.append(v)
    return sorted(deleted)


def mark_batch_applied(
    spark: SparkSession, vpath: str, batch_id: int
) -> None:
    """Record which streaming batch produced ``vpath`` (written BEFORE
    the commit marker, so any committed version carries its batch tag)."""
    fs, jvm = _fs(spark, vpath)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{vpath}/_CDC_BATCH_{batch_id}"),
        True,
    ).close()


def batch_already_applied(
    spark: SparkSession, path: str, batch_id: int
) -> bool:
    """True when some COMMITTED version carries ``batch_id``'s tag — the
    streaming replay test (a crash between the version commit and the
    stream checkpoint replays the batch; the tag makes the replay a
    no-op instead of a double-apply). Also consults the root
    ``_CDC_BATCHES`` manifest, where vacuum preserves the tags of retired
    versions — so detection works even for batches older than the
    retention window. Scan cost is the committed-version count (bounded
    by vacuum retention) plus one manifest existence probe."""
    fs, jvm = _fs(spark, path)
    if fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{path}/{BATCHES_DIR}/{batch_id}")
    ):
        return True
    for v in list_table_versions(spark, path):
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(
                f"{path}/v{v}/_CDC_BATCH_{batch_id}"
            )
        ):
            return True
    return False
