"""Dataset-version history operators: keyed diffs between snapshots and
SCD-2 temporal dimension build.

These close the bookkeeping loop around the repo's continuous-ingest
family (operators/dedup.py incremental_* and the snapshot store in
sources/io.py): once a pipeline republishes a table per crawl/batch, the
first questions are "what changed since the last version?" (audit,
incremental downstream refresh, regression triage) and "what did this
record look like at time T?" (temporal joins, training-data provenance).
Both are standard warehouse surface (dataset diff; Kimball slowly-
changing-dimension type 2) re-expressed Spark-first.

Scale notes are in each docstring; the common discipline: rows travel
the diff shuffle as (key, 128-bit content digest), never as full
payloads, and the SCD-2 build is one shuffle on the entity key with
every window and the final aggregate sharing that partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "schema_diff",
    "row_digest",
    "snapshot_diff",
    "scd2_build",
    "apply_changelog",
    "scd2_lookup",
    "scd2_apply_snapshot",
    "extract_changelog",
    "scd2_validate",
]


def row_digest(compare_cols: list[str]) -> Column:
    """128-bit content digest over ``compare_cols``: md5 of the JSON
    serialization with nulls kept explicit (``ignoreNullFields=false``),
    so NULL vs empty-string vs missing all digest differently and no
    column-shift collisions are possible (unlike ``xxhash64(*cols)``,
    where NULL inputs leave the accumulator unchanged and ``(NULL, x)``
    collides with ``(x, NULL)``)."""
    return F.md5(
        F.to_json(
            F.struct(*[F.col(c) for c in compare_cols]),
            {"ignoreNullFields": "false"},
        )
    )


def schema_diff(old: DataFrame, new: DataFrame) -> list[dict]:
    """Schema drift between two dataset versions — the check that runs
    BEFORE :func:`snapshot_diff` (which requires compatible schemas):
    added / removed / type-changed columns, as a plain list of dicts
    (schemas are driver-side metadata; no job runs).

    Each entry: ``{"column", "status": added|removed|type_changed,
    "old_type", "new_type"}`` (types None when absent). Empty list =
    schemas compatible. Nullability changes are ignored (Spark relaxes
    nullability freely through unions and reads)."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    out = []
    for c in sorted(set(o) | set(n)):
        if c not in n:
            out.append({"column": c, "status": "removed",
                        "old_type": o[c], "new_type": None})
        elif c not in o:
            out.append({"column": c, "status": "added",
                        "old_type": None, "new_type": n[c]})
        elif o[c] != n[c]:
            out.append({"column": c, "status": "type_changed",
                        "old_type": o[c], "new_type": n[c]})
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    attribute_columns: bool = False,
) -> DataFrame:
    """Keyed diff between two versions of a table: one row per key present
    in either side with ``status`` ∈ {added, removed, changed} (plus
    ``unchanged`` when ``include_unchanged``) — the audit/regression
    primitive for republished datasets ("this crawl added 2M docs,
    dropped 40k, rewrote 300k").

    ``compare_cols`` defaults to all non-key columns shared by both
    frames. Key uniqueness per side is the caller's contract (the usual
    primary-key assumption; duplicate keys make the diff fan out as a
    join would).

    Scale shape: each side is first reduced to (keys, digest) — a
    128-bit :func:`row_digest`, so wide rows never cross the wire — then
    ONE full-outer shuffle join on the keys. Status is a null-check CASE
    over the two digest columns. No window, no second scan; cost is two
    slim projections + one join, and with both sides bucketed by the
    keys (sources/io.py write_bucketed_table) the exchange disappears
    entirely.
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    if not compare_cols:
        raise ValueError("snapshot_diff: no compare columns")
    # attribute_columns trades the slim digest shuffle for per-column
    # digests (compare_cols × 128-bit per row instead of one) so changed
    # rows can name WHICH columns moved — triage mode; keep it off for
    # the cheap audit pass on very wide tables.
    if attribute_columns:
        # per-column digests subsume the whole-row digest: row presence is
        # any per-col digest's non-nullness (a digest of a NULL VALUE is
        # still a non-null string), and "changed" is a non-empty
        # changed-columns set — so triage mode shuffles exactly the
        # per-column digests and nothing redundant.
        per_col = lambda c: row_digest([c])  # noqa: E731
        o = old.select(
            *keys, *[per_col(c).alias(f"_oc_{c}") for c in compare_cols]
        )
        n = new.select(
            *keys, *[per_col(c).alias(f"_nc_{c}") for c in compare_cols]
        )
        joined = o.join(n, keys, "full_outer")
        probe = compare_cols[0]
        changed_cols = F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_oc_{c}").eqNullSafe(F.col(f"_nc_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
        status = (
            F.when(F.col(f"_oc_{probe}").isNull(), F.lit("added"))
            .when(F.col(f"_nc_{probe}").isNull(), F.lit("removed"))
            .when(F.size(changed_cols) > 0, F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        out = joined.select(
            *keys,
            status.alias("status"),
            F.when(status == "changed", changed_cols).alias(
                "changed_columns"
            ),
        )
    else:
        o = old.select(*keys, row_digest(compare_cols).alias("_old_d"))
        n = new.select(*keys, row_digest(compare_cols).alias("_new_d"))
        status = (
            F.when(F.col("_old_d").isNull(), F.lit("added"))
            .when(F.col("_new_d").isNull(), F.lit("removed"))
            .when(F.col("_old_d") != F.col("_new_d"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        out = o.join(n, keys, "full_outer").select(
            *keys, status.alias("status")
        )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def scd2_build(
    snapshots: DataFrame,
    keys: list[str],
    attrs: list[str],
    version_col: str,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2 from stacked periodic snapshots:
    collapse consecutive versions with identical ``attrs`` into validity
    intervals — one row per (key, attribute-run) with
    ``[effective_from, effective_to)`` bounds (``effective_to`` NULL on
    the open current row, ``current_flag`` true). The standard temporal
    table a warehouse derives from daily/percrawl republishes, and what a
    training pipeline joins to answer "which version of this record did
    run X train on".

    Semantics: input is the UNION of snapshots, each row tagged with its
    snapshot version in ``version_col`` (a date, timestamp, or
    monotonically increasing batch id — any orderable type). A key absent
    from an intermediate snapshot is treated as "not observed", not as a
    delete: its interval simply extends until the next observed change
    (delete tracking would need a tombstone input; out of scope by
    design, documented here so callers don't assume otherwise).
    Attribute comparison is null-safe (NULL→value and value→NULL both
    open a new interval).

    Scale shape: ONE shuffle on ``keys``. Both windows (the lag-compare
    and the running segment sum) and the final hash aggregate share that
    partitioning, so Catalyst plans a single exchange; the lead() for
    ``effective_to`` runs over the already-aggregated segment rows (one
    row per run, far smaller than the input). Per-key data is the
    snapshot count — bounded, so no skew concern beyond a genuinely hot
    entity key.
    """
    w = Window.partitionBy(*keys).orderBy(version_col)
    # null-safe "did any attr change vs the previous snapshot of this key"
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    is_first = F.lag(version_col).over(w).isNull()
    seg = F.sum(
        F.when(is_first | changed, F.lit(1)).otherwise(F.lit(0))
    ).over(w)
    runs = (
        snapshots.select(*keys, *attrs, version_col)
        .withColumn("_seg", seg)
        .groupBy(*keys, "_seg")
        .agg(
            *[F.first(a).alias(a) for a in attrs],
            F.min(version_col).alias(effective_from),
        )
    )
    w2 = Window.partitionBy(*keys).orderBy("_seg")
    return (
        runs.withColumn(effective_to, F.lead(effective_from).over(w2))
        .withColumn(current_flag, F.col(effective_to).isNull())
        .drop("_seg")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    version_col: str,
    op_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Roll a table version forward by applying a CDC changelog — the
    MERGE/upsert compaction a lakehouse table format performs, expressed
    as plain DataFrame algebra so it runs on bare parquet snapshots (the
    repo's snapshot store, sources/io.py): ``base`` ⊕ ``changes`` → the
    next version. Inverse direction of :func:`snapshot_diff` (which
    recovers the change set from two versions).

    ``changes`` carries the key columns, the full replacement payload
    (same non-key columns as ``base``), a ``version_col`` ordering
    concurrent changes to one key (latest wins; make it total per key —
    ties broken arbitrarily make replays nondeterministic), and optionally
    ``op_col`` where value == ``delete_op`` tombstones the key (any other
    value upserts; ``op_col=None`` = pure upsert log).

    Idempotent by construction: re-applying the same changelog yields the
    same table, and applying an EMPTY changelog returns ``base`` column-
    identical (replay safety — the property continuous ingest needs when
    a batch retries; asserted in tests).

    Scale shape: one row_number window on ``keys`` over the CHANGELOG
    only (bounded by batch size, not table size) keeps each key's latest
    change, then ONE full-outer equi-join against base. Base rows never
    pass through a window; with base bucketed on the keys the exchange on
    the big side disappears. Anti-pattern avoided: no base self-scan, no
    union+window over base∪changes (which would shuffle the full table
    through a sort instead of a join).
    """
    payload = [c for c in base.columns if c not in set(keys)]
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # NULL-safe delete test: a NULL op must mean "upsert" per the
    # "any other value upserts" contract, so coalesce BEFORE the sentinel
    # logic (op==delete_op is NULL for NULL op, and a NULL _del would make
    # the in-changelog test below silently keep the stale base payload).
    is_delete = (
        F.coalesce(F.col(op_col) == delete_op, F.lit(False))
        if op_col is not None
        else F.lit(False)
    )
    ch = latest.select(
        *keys,
        is_delete.alias("_del"),
        F.lit(True).alias("_in_ch"),
        *[F.col(c).alias(f"_ch_{c}") for c in payload],
    )
    merged = base.join(ch, keys, "full_outer")
    # key in changelog: deleted → drop; else take the change's payload.
    # key only in base: keep base payload untouched.
    out = merged.filter(~F.coalesce(F.col("_del"), F.lit(False))).select(
        *keys,
        *[
            F.when(F.col("_in_ch").isNotNull(), F.col(f"_ch_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )
    return out


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str,
    attrs: list[str] | None = None,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
    prefix: str = "",
) -> DataFrame:
    """Temporal (point-in-time) join of facts against an SCD-2 dimension:
    each fact row gains the dimension attributes that were valid AT its
    ``ts_col`` — the consumer side of :func:`scd2_build` ("join each
    training example to the version of the record it was built from").
    Facts whose timestamp predates the key's first interval, or lands in
    a validity gap of an externally-built dimension, keep NULL attributes
    (left-join semantics).

    ``attrs`` defaults to every dim column except keys/interval/flag
    columns; ``prefix`` renames them on the way out (collision hygiene
    when facts already carry same-named columns).

    Scale shape: NOT a range join — interval containment over
    ``[effective_from, effective_to)`` is resolved with the as-of
    union-tag + forward-fill window (operators/relational.asof_join):
    ONE shuffle on (keys, time) and a linear per-key scan, where a
    range-join formulation would pay a per-key quadratic candidate
    blowup. The matched interval's ``effective_to`` is carried through
    the fill and a final guard nulls out matches whose interval closed
    at/before the fact timestamp — for :func:`scd2_build` output the
    guard never fires (intervals are contiguous by construction), but it
    keeps externally-built dimensions with gaps correct.
    """
    from datamunging_spark.operators.relational import asof_join

    if attrs is None:
        skip = set(keys) | {effective_from, effective_to, current_flag}
        attrs = [c for c in dim.columns if c not in skip]
    # asof_join carries right columns through its fill as one never-null
    # struct, so a matched interval's genuinely-NULL field (an open
    # interval's NULL effective_to, a NULL attr run) stays NULL instead of
    # backfilling the previous interval's value — pinned by
    # test_scd2_lookup_respects_closed_intervals_with_gaps.
    right_cols = {a: f"{prefix}{a}" for a in attrs}
    right_cols[effective_to] = "_vt"
    out = asof_join(
        facts,
        dim,
        keys,
        left_ts=ts_col,
        right_ts=effective_from,
        right_cols=right_cols,
    )
    valid = F.col("_vt").isNull() | (F.col("_vt") > F.col(ts_col))
    for a in attrs:
        out = out.withColumn(
            f"{prefix}{a}", F.when(valid, F.col(f"{prefix}{a}"))
        )
    return out.drop("_vt")


def scd2_apply_snapshot(
    dim: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    attrs: list[str],
    version,
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Incrementally maintain an SCD-2 dimension with ONE new snapshot —
    the continuous-ingest face of :func:`scd2_build`, which would
    otherwise rescan every historical snapshot per crawl. Cost tracks the
    CURRENT row set + the new snapshot, never the closed history: closed
    rows pass through untouched, and only the open rows join the
    snapshot.

    Semantics are exactly scd2_build's, maintained one step at a time
    (pinned by the equality-vs-full-rebuild test): a key whose ``attrs``
    changed closes its open interval at ``version`` and opens a new one;
    an unchanged key keeps its open interval; a NEW key opens its first
    interval; a key absent from the snapshot is "not observed" — its open
    interval stays open. ``version`` must sort after every version
    already in ``dim`` (monotonic republishes; same contract as
    scd2_build's stacking order).

    Scale shape: one full-outer equi-join between the open rows and the
    snapshot (both keyed), consumed ONCE (each joined row emits its 1-2
    interval rows through a filtered struct-array explode, not through
    per-outcome filter branches that would re-execute the join), then a
    union with the untouched closed rows. No window at all — the
    lag/segment machinery is only needed when collapsing a whole stack;
    one step is a join.
    """
    out_cols = [*keys, *attrs, effective_from, effective_to, current_flag]
    closed = dim.filter(~F.col(current_flag)).select(*out_cols)
    open_rows = dim.filter(F.col(current_flag)).select(
        *keys,
        *[F.col(a).alias(f"_cur_{a}") for a in attrs],
        F.col(effective_from).alias("_cur_from"),
    )
    snap = snapshot.select(
        *keys,
        *[F.col(a).alias(f"_new_{a}") for a in attrs],
        F.lit(True).alias("_observed"),
    )
    j = open_rows.join(snap, keys, "full_outer")
    in_dim = F.col("_cur_from").isNotNull()
    observed = F.coalesce(F.col("_observed"), F.lit(False))
    changed = F.lit(False)
    for a in attrs:
        changed = changed | ~F.col(f"_cur_{a}").eqNullSafe(
            F.col(f"_new_{a}")
        )
    # Each joined row emits 1-2 interval rows; build them as a filtered
    # struct array and explode — ONE consumption of the join, instead of
    # three filter branches that would each re-execute it.
    to_t = dim.schema[effective_to].dataType
    from_t = dim.schema[effective_from].dataType

    def interval(attr_src, from_col, to_col, cur):
        return F.struct(
            *[F.col(attr_src(a)).alias(a) for a in attrs],
            from_col.cast(from_t).alias(effective_from),
            to_col.cast(to_t).alias(effective_to),
            F.lit(cur).alias(current_flag),
        )

    emitted = F.array_compact(
        F.array(
            # open row survives: unchanged, or key unobserved this round
            F.when(
                in_dim & (~observed | ~changed),
                interval(
                    lambda a: f"_cur_{a}", F.col("_cur_from"),
                    F.lit(None), True,
                ),
            ),
            # open row closes at `version` (attrs changed)
            F.when(
                in_dim & observed & changed,
                interval(
                    lambda a: f"_cur_{a}", F.col("_cur_from"),
                    F.lit(version), False,
                ),
            ),
            # fresh interval opens (new key, or reopening after a change)
            F.when(
                observed & (~in_dim | changed),
                interval(
                    lambda a: f"_new_{a}", F.lit(version),
                    F.lit(None), True,
                ),
            ),
        )
    )
    stepped = j.select(*keys, F.explode(emitted).alias("_iv")).select(
        *keys, "_iv.*"
    )
    return closed.unionByName(stepped)


def extract_changelog(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    version,
    version_col: str = "ver",
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Derive the CDC changelog that transforms ``old`` into ``new`` —
    the exact inverse of :func:`apply_changelog` (round-trip property:
    ``apply_changelog(old, extract_changelog(old, new, ...), ...)``
    equals ``new``, pinned in tests). This is how a pipeline that only
    receives full republishes emits an incremental feed downstream:
    diff the versions, ship the (much smaller) changelog.

    Output: one row per added/changed key carrying ``new``'s full payload
    with ``op='upsert'``, one row per removed key with NULL payload and
    ``op='delete'``; all rows stamped ``version_col = version``.

    Scale shape: :func:`snapshot_diff`'s digest join finds the touched
    keys (slim, width-independent), then ONE equi-join back to ``new``
    fetches payloads for the upserts only. Removed keys never rejoin
    anything — their payload is NULL by definition.
    """
    payload = [c for c in new.columns if c not in set(keys)]
    touched = snapshot_diff(old, new, keys)
    ups = (
        touched.filter(F.col("status") != "removed")
        .select(*keys)
        .join(new, keys)
        .select(
            *keys,
            *payload,
            F.lit(version).alias(version_col),
            F.lit("upsert").alias(op_col),
        )
    )
    dels = touched.filter(F.col("status") == "removed").select(
        *keys,
        *[F.lit(None).cast(new.schema[c].dataType).alias(c) for c in payload],
        F.lit(version).alias(version_col),
        F.lit(delete_op).alias(op_col),
    )
    return ups.unionByName(dels)


def scd2_validate(
    dim: DataFrame,
    keys: list[str],
    effective_from: str = "effective_from",
    effective_to: str = "effective_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Contract checker for an SCD-2 table (the structural invariants
    :func:`scd2_lookup` assumes and :func:`scd2_build` guarantees —
    run this on externally-supplied dimensions before trusting them):
    one violation row per offending interval, tagged
    ``empty_interval`` (from >= to), ``overlap`` (interval intersects
    the key's next interval), ``multiple_current`` (key has >1 open
    row), or ``flag_mismatch`` (current_flag disagrees with
    effective_to's nullness). Empty result = table well-formed.

    Scale shape: ONE shuffle on the keys — both the next-interval lead
    and the open-row count share the key partitioning; violations emit
    through a single filtered struct-array explode (the
    scd2_apply_snapshot pattern — one pass, no per-check branches).
    """
    w = Window.partitionBy(*keys).orderBy(effective_from)
    wk = Window.partitionBy(*keys)
    f, t = F.col(effective_from), F.col(effective_to)
    # window columns first (Spark cannot evaluate window expressions
    # inside a generator), then one filtered-array explode over them
    staged = dim.select(
        *keys, f.alias(effective_from), t.alias(effective_to),
        F.col(current_flag).alias(current_flag),
        F.lead(effective_from).over(w).alias("_nxt_from"),
        F.sum(F.when(t.isNull(), 1).otherwise(0)).over(wk).alias("_n_open"),
    )
    nxt = F.col("_nxt_from")
    checks = [
        ("empty_interval", t.isNotNull() & (f >= t)),
        ("overlap", nxt.isNotNull() & (t.isNull() | (t > nxt))),
        ("multiple_current", t.isNull() & (F.col("_n_open") > 1)),
        # null-safe: a NULL flag must REPORT as mismatch, not NULL-out
        # the predicate and silently validate
        ("flag_mismatch", ~F.col(current_flag).eqNullSafe(t.isNull())),
    ]
    tags = F.array_compact(
        F.array(*[F.when(cond, F.lit(tag)) for tag, cond in checks])
    )
    return staged.select(
        *keys, effective_from, effective_to, current_flag,
        F.explode(tags).alias("violation"),
    )
