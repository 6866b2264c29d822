"""Structured Streaming surface (SURVEY.md §2.8 growth path).

The reference has no streaming (§2.8) — this is the engine's event-stream
extension over the driver's ``events`` table shape: file-source readStream →
watermarked tumbling/sliding window aggregation → sink. Batch/stream share
the same expressions, so every batch operator lifts to streaming unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events parquet drops (exactly-once, replayable)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window count+sum per event_type.

    Late rows beyond ``watermark`` are dropped and state is bounded — the
    standard scale-safe shape (state size ∝ active windows × types, not
    stream length)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running event count + value sum, one output row per user per microbatch.

    The state is two scalars per key — bounded by cardinality(user), not
    stream length. Arrow batches stream through the Python worker; the same
    code path runs per-key-group in batch mode tests. This is the engine's
    template for custom stateful ops the built-in aggregations can't express
    (e.g. decaying counters, per-key model state).
    """

    def update(key, pdfs, state):
        import pandas as pd

        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    df: DataFrame, name: str, timeout_s: int = 60, output_mode: str = "append"
):
    """Drive a stream to completion against a finite file source (test
    harness): memory sink, processAllAvailable, return the sink table name."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return name


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on ingest (X1 lifted to streams): drop any doc
    whose normalized-content md5 was already seen within the watermark
    horizon, via ``dropDuplicatesWithinWatermark``.

    This is the scale-correct ingest-dedup shape: state holds one md5 key
    per distinct doc seen inside the watermark window (bounded by arrival
    rate × horizon, NOT stream length — the engine evicts keys older than
    the watermark). Batch backfill and the streaming path share the same
    normalize+md5 expressions as ``exact_dedup``, so a corpus built by
    stream ingest and one built by batch curation agree on the surviving
    content set (batch keeps min-id per hash; the stream keeps the first
    arrival — same contents, documented survivor difference)."""
    from datamunging_spark.functions import normalize_text

    keyed = docs.withColumn("_h", F.md5(normalize_text(text_col)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def incremental_dedup_stream(
    docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Streaming counterpart of :func:`~datamunging_spark.operators.dedup.
    incremental_dedup`: drop any streamed doc whose normalized content is
    already in the HISTORICAL corpus snapshot (``seen`` — a static
    :func:`~datamunging_spark.operators.dedup.content_snapshot` table),
    then exact-dedup within the stream via
    ``dropDuplicatesWithinWatermark``.

    Scale shape: a stream-static LEFT ANTI join — the idiomatic Spark
    pattern for "filter the stream against a reference table". The static
    side is re-read per micro-batch (so a snapshot replaced on disk is
    picked up without restarting the query), which is exactly why the
    snapshot format is a slim hash-only table: the per-batch cost is one
    scan of 32-char hashes, broadcastable while the history stays small
    and a hash equi-join beyond that. Stream-side state is the same
    bounded within-watermark key set as :func:`dedup_stream`.

    Hash contract matches exact_dedup/content_snapshot (NULL text hashes
    as ''), so the stream and batch ingest paths agree on survivors. To
    roll history forward between runs, feed the sink's accumulated docs to
    :func:`~datamunging_spark.operators.dedup.advance_snapshot` batch-side
    (streaming writes to the snapshot it anti-joins would be a cycle).
    """
    from datamunging_spark.functions import normalize_text

    keyed = docs.withColumn(
        "_h", F.md5(F.coalesce(normalize_text(text_col), F.lit("")))
    )
    fresh = keyed.join(
        seen.select(F.col(hash_col).alias("_h")).distinct(),
        on="_h",
        how="left_anti",
    )
    return (
        fresh.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


# Marker + version-listing machinery is shared with the batch versioned-
# table store (sources/versioned.py) — one durability contract for
# streaming snapshots and batch table versions. Kept under the original
# private names for this module's callers; the marker matters here
# because write_snapshots writes content/ then signatures/ non-
# atomically, and loading a torn version (content without signatures)
# would silently drop the fuzzy-dedup history.
from datamunging_spark.sources.versioned import (
    latest_table_version as _latest_snapshot_version,
    mark_committed as _mark_snapshot_committed,
    version_committed as _snapshot_version_committed,
)


def _delete_subdirs(spark: SparkSession, vpath: str, names) -> None:
    """Remove leftover span-state directories from a torn write attempt
    in the opposite base/delta mode — reconstruction must never mistake
    a gutted base for real state."""
    from datamunging_spark.sources.versioned import _fs

    fs, jvm = _fs(spark, vpath)
    for n in names:
        p = jvm.org.apache.hadoop.fs.Path(f"{vpath}/{n}")
        if fs.exists(p):
            fs.delete(p, True)


def _maybe_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet directory, or None when it does not exist — how the
    optional span-state directories load alongside a snapshot version.
    Only the legitimately-missing-directory AnalysisException maps to
    None (the ``read_snapshots`` contract, dedup.py): a corrupt footer /
    permission / FS error must RAISE, not silently reset span history to
    empty and stop cutting every previously-seen span."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def streaming_ingest(
    docs_stream: DataFrame,
    snapshots=None,
    survivors_path: str | None = None,
    checkpoint_path: str | None = None,
    snapshots_path: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    span: bool = False,
    span_kwargs: dict | None = None,
    snapshots_keep_last: int | None = None,
    span_base_every: int | None = 64,
    **ingest_kwargs,
):
    """Continuous-ingest loop on Structured Streaming via ``foreachBatch``:
    every micro-batch runs the FULL exact+fuzzy
    :func:`~datamunging_spark.operators.dedup.ingest_batch` cycle against
    the current snapshots, appends its survivors to ``survivors_path``
    (parquet), and rolls the snapshots forward for the NEXT micro-batch —
    so near-duplicates are caught ACROSS micro-batches, which the
    bounded-watermark :func:`dedup_stream`/:func:`incremental_dedup_stream`
    state cannot do (their state evicts at the horizon; snapshots are the
    unbounded-history answer, and fuzzy matching needs the signature
    table either way).

    foreachBatch is the idiomatic bridge for batch-only logic (multi-stage
    joins, CC, roll-forward) inside a stream. Exactly-once caveat,
    documented rather than hidden: on failure/restart a micro-batch can
    re-run; the sink append may then duplicate that batch's survivors,
    but the DEDUP STATE stays correct because re-ingesting already-folded
    content yields zero survivors (the idempotence property
    test_advance_snapshot_closes_incremental_loop pins) — dedupe the sink
    on replay or front it with a transactional table format for
    end-to-end exactly-once.

    Runs with ``availableNow`` (drain-and-stop; the test-harness and
    backfill shape — swap the trigger for production continuous runs) and
    returns the final :class:`~datamunging_spark.operators.dedup.
    Snapshots` for persisting via ``write_snapshots``.

    **Restart durability**: when ``checkpoint_path`` is set, Structured
    Streaming SKIPS committed micro-batches on restart — so dedup state
    advanced only in driver memory would be silently lost for exactly
    those batches (their duplicates would pass forever). Set
    ``snapshots_path`` alongside it: each batch's roll-forward is
    persisted to ``{snapshots_path}/v{batch_id}`` (versioned —
    write_snapshots documents why self-overwrite is unsafe) and on start
    the LATEST version is loaded, overriding the ``snapshots`` argument,
    so the snapshot state and the streaming commit log advance together.
    Memory-only state (``snapshots_path=None``) keeps per-batch
    ``localCheckpoint`` pinning and is fine for availableNow drains that
    persist the RETURNED snapshots themselves.

    **Span stage** (``span=True``): after the exact+fuzzy cycle, each
    micro-batch's survivors are span-deduped against ALL prior
    micro-batches via
    :func:`~datamunging_spark.operators.spandedup.incremental_span_dedup`
    — history participates as a rolled-forward winnowing-fingerprint
    snapshot plus a slim (id, text) survivor table fetched per-candidate,
    mirroring how ``advance_snapshot`` rolls the hash/signature state.
    The fingerprint snapshot advances by the operator's ``_return_fps``
    increment (uncut docs' fingerprints reused; only cut docs
    re-winnowed). Ordering contract: the exact/fuzzy snapshots are
    advanced from the PRE-span-cut text (so a replay of an original
    document is still rejected by content hash), while the span state
    and the sink carry the CLEANED text — the keep-earliest rule across
    stages. ``span_kwargs`` forwards min_span/gram/valves. With
    ``snapshots_path`` set the span state is versioned alongside the
    snapshot pair (``span_fps/`` + ``span_texts/`` under the same
    ``v{batch_id}`` directory, covered by the same commit marker).
    Returns ``(snapshots, (span_fps, span_texts))`` when ``span=True``.

    **Span state is a delta log (r9)**: each version persists only the
    BATCH's increment (``span_fps_delta`` + ``span_texts_delta`` — the
    operator's ``_return_fps`` fingerprint increment and the batch's
    cleaned survivors), so the per-fold write is batch-sized, not
    corpus-sized; the in-memory state between batches is the lazy union.
    Loading reconstructs by unioning the newest FULL base (a version
    carrying ``span_fps``/``span_texts``) with every later committed
    version's deltas — old-layout stores, whose every version is a full
    base, reload unchanged. A full base is compacted every
    ``min(snapshots_keep_last, span_base_every)``-th fold (first fold
    included): the retention cadence guarantees the retained tail-K
    window always contains the base the deltas after it need — vacuum
    can then delete older versions without orphaning state
    (``snapshots_keep_last=1`` degenerates to the pre-r9
    full-rewrite-per-version behavior) — while ``span_base_every``
    (r11, default 64) bounds the reconstruction lineage INDEPENDENT of
    retention: without it a retention-free store is a pure delta log
    whose restart reload unions EVERY committed version — an
    operational footgun for long-lived streams (r9 ADVICE). Set
    ``span_base_every=None`` to opt back into the pure delta log,
    accepting O(total folds) reload lineage; the base write itself
    costs one full span-state rewrite per cadence window (amortized:
    1/``span_base_every`` extra state writes). Base-vs-delta is decided
    deterministically from the committed store, so torn-crash replays
    converge (stale files from the other mode are deleted before the
    write — changing ``snapshots_keep_last``/``span_base_every`` across
    a restart cannot resurrect a torn base).

    **Retention** (``snapshots_keep_last``): every version holds the
    full exact/fuzzy snapshot pair (slim) plus the span delta; set
    ``snapshots_keep_last=K`` to ``vacuum_table_versions`` after each
    commit, bounding disk at K × (slim state + batch increment) + one
    compacted span base per window (the same per-batch retention
    ``streaming_resolve`` applies to its history).
    """
    from datamunging_spark.operators.dedup import (
        Snapshots,
        ingest_batch,
        read_snapshots,
        write_snapshots,
    )

    if span_base_every is not None and span_base_every < 1:
        raise ValueError(
            f"span_base_every must be >= 1 or None, got {span_base_every}"
        )
    start = snapshots if snapshots is not None else Snapshots(None, None)
    spark = docs_stream.sparkSession
    state = {
        "snaps": start,
        "span_fps": None,
        "span_texts": None,
        # batch increments stashed by _span_pass for the delta write
        "span_fps_inc": None,
        "span_texts_inc": None,
        # committed versions folded since (and including) the last FULL
        # span base — drives the deterministic base-compaction cadence
        "since_base": 0,
    }

    def _load_span_state(sess, upto_v):
        """Reconstruct the span state as of committed version
        ``upto_v``: newest full base at or before it, plus every later
        committed version's deltas, in version order. Old-layout stores
        (every version a full base) reduce to 'read the latest'."""
        from datamunging_spark.sources.versioned import (
            list_table_versions,
        )

        fps = texts = None
        since = 0
        for v in list_table_versions(sess, snapshots_path):
            if v > upto_v:
                break
            vp = f"{snapshots_path}/v{v:020d}"
            base = _maybe_parquet(sess, f"{vp}/span_fps")
            if base is not None:
                fps = base
                texts = _maybe_parquet(sess, f"{vp}/span_texts")
                since = 1
                continue
            d_fps = _maybe_parquet(sess, f"{vp}/span_fps_delta")
            if d_fps is None:
                continue  # pre-span or span-free version
            d_texts = _maybe_parquet(sess, f"{vp}/span_texts_delta")
            fps = d_fps if fps is None else fps.unionByName(d_fps)
            texts = (
                d_texts if texts is None else texts.unionByName(d_texts)
            )
            since += 1
        state["span_fps"], state["span_texts"] = fps, texts
        state["since_base"] = since

    if snapshots_path is not None:
        latest = _latest_snapshot_version(spark, snapshots_path)
        if latest is not None:
            vpath = f"{snapshots_path}/v{latest:020d}"
            start = read_snapshots(spark, vpath)
            state["snaps"] = start
            if span:
                _load_span_state(spark, latest)

    def _span_pass(surv, bspark):
        """Span-dedup the batch survivors against all prior micro-batches
        and return the cleaned survivors; rolls the in-memory span state.
        Bootstrap (no history yet) uses EMPTY history frames so the one
        operator covers both cases (its empty-side behavior is pinned by
        test_incremental_span_empty_sides)."""
        from datamunging_spark.operators.spandedup import (
            incremental_span_dedup,
        )

        kw = dict(span_kwargs or {})
        hist_fps, hist_texts = state["span_fps"], state["span_texts"]
        if hist_fps is None:
            id_field = surv.schema[id_col]
            hist_fps = bspark.createDataFrame(
                [],
                StructType(
                    [
                        id_field,
                        StructField("fp", LongType()),
                        StructField("pos", IntegerType()),
                    ]
                ),
            )
            hist_texts = bspark.createDataFrame(
                [], StructType([id_field, surv.schema[text_col]])
            )
        cleaned, fps_inc = incremental_span_dedup(
            surv, hist_fps, hist_texts,
            text_col=text_col, id_col=id_col,
            _return_fps=True, **kw,
        )
        cleaned = cleaned.localCheckpoint()  # feeds sink + texts roll
        # materialize the fp increment once: it feeds the in-memory fold
        # AND the per-version delta write
        fps_inc = fps_inc.localCheckpoint()
        texts_inc = cleaned.select(F.col(id_col), F.col(text_col))
        state["span_fps_inc"], state["span_texts_inc"] = fps_inc, texts_inc
        if state["span_fps"] is None:
            new_fps, new_texts = fps_inc, texts_inc
        else:
            new_fps = state["span_fps"].unionByName(fps_inc)
            new_texts = state["span_texts"].unionByName(texts_inc)
        state["span_fps"] = new_fps
        state["span_texts"] = new_texts
        return cleaned

    def _process(batch_df, batch_id):
        if snapshots_path is not None:
            vpath = f"{snapshots_path}/v{batch_id:020d}"
            if _snapshot_version_committed(batch_df.sparkSession, vpath):
                # replay of a batch whose state commit survived a crash
                # (crash landed between the snapshot write and the
                # streaming commit): state is already durable, and the
                # survivor-sink append for this batch already happened —
                # re-running would duplicate the sink AND self-overwrite
                # the version this run's state was loaded from
                # (overwrite deletes input files mid-scan). Full no-op.
                state["snaps"] = read_snapshots(
                    batch_df.sparkSession, vpath
                )
                if span:
                    _load_span_state(batch_df.sparkSession, batch_id)
                return
        if not batch_df.head(1):
            return
        surv, snaps = ingest_batch(
            batch_df,
            state["snaps"],
            text_col,
            id_col,
            threshold=threshold,
            **ingest_kwargs,
        )
        if span:
            surv = _span_pass(surv, batch_df.sparkSession)
        if survivors_path is not None:
            surv.write.mode("append").parquet(survivors_path)
        if snapshots_path is not None:
            vpath = f"{snapshots_path}/v{batch_id:020d}"
            bspark = batch_df.sparkSession
            write_snapshots(snaps, vpath)
            if span:
                # mode("overwrite"), NOT the errorifexists default: a
                # crash between these writes and the commit marker leaves
                # a torn marker-less v{batch_id} on disk; the replayed
                # batch (state reloaded from the PRIOR committed version,
                # so never self-overwriting its own input) must converge,
                # not throw PATH_ALREADY_EXISTS forever — the same
                # replay-convergence contract as write_snapshots /
                # write_table_version. Base-vs-delta is decided from
                # since_base, itself reconstructed from the committed
                # store — deterministic under replay; stale files of the
                # OTHER mode (a torn attempt under a different
                # snapshots_keep_last) are deleted so reconstruction can
                # never pick up a gutted base.
                cadence = min(
                    (
                        c
                        for c in (snapshots_keep_last, span_base_every)
                        if c is not None
                    ),
                    default=None,
                )
                make_base = cadence is not None and (
                    state["since_base"] == 0
                    or state["since_base"] + 1 >= cadence
                )
                from datamunging_spark.parallel import co_materialize

                # fps/texts land in independent subdirs of the SAME
                # uncommitted version dir — overlapped (guide §2.6);
                # the commit marker below still follows BOTH writes, so
                # the torn-write replay contract is unchanged
                if make_base:
                    _delete_subdirs(
                        bspark, vpath,
                        ("span_fps_delta", "span_texts_delta"),
                    )
                    co_materialize(
                        lambda: state["span_fps"]
                        .write.mode("overwrite")
                        .parquet(f"{vpath}/span_fps"),
                        lambda: state["span_texts"]
                        .write.mode("overwrite")
                        .parquet(f"{vpath}/span_texts"),
                    )
                else:
                    _delete_subdirs(
                        bspark, vpath, ("span_fps", "span_texts")
                    )
                    co_materialize(
                        lambda: state["span_fps_inc"]
                        .write.mode("overwrite")
                        .parquet(f"{vpath}/span_fps_delta"),
                        lambda: state["span_texts_inc"]
                        .write.mode("overwrite")
                        .parquet(f"{vpath}/span_texts_delta"),
                    )
            _mark_snapshot_committed(bspark, vpath)
            state["snaps"] = read_snapshots(bspark, vpath)
            if span:
                if make_base:
                    # full reload from the just-written base: plan depth
                    # resets to one flat read
                    _load_span_state(bspark, batch_id)
                else:
                    # delta fold: the in-memory union (prior disk-backed
                    # state ∪ this batch's checkpointed increments) IS
                    # the reconstruction — re-listing and re-probing
                    # every committed version per fold would cost
                    # O(total versions) each micro-batch (r9 review);
                    # only the cadence counter advances
                    state["since_base"] += 1
            if snapshots_keep_last is not None:
                from datamunging_spark.sources.versioned import (
                    vacuum_table_versions,
                )

                vacuum_table_versions(
                    bspark, snapshots_path, keep_last=snapshots_keep_last
                )
        else:
            from datamunging_spark.parallel import co_materialize

            # the per-batch state pins are independent materializations
            # — overlapped (guide §2.6) to cut the micro-batch's serial
            # job chain; pure localCheckpoints, no disk state machine
            thunks = [
                snaps.content.localCheckpoint,
                snaps.signatures.localCheckpoint,
            ]
            if span:
                thunks += [
                    state["span_fps"].localCheckpoint,
                    state["span_texts"].localCheckpoint,
                ]
            done = co_materialize(*thunks)
            state["snaps"] = Snapshots(done[0], done[1])
            if span:
                state["span_fps"], state["span_texts"] = done[2], done[3]

    writer = docs_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    if span:
        return state["snaps"], (state["span_fps"], state["span_texts"])
    return state["snaps"]


def streaming_phash_ingest(
    media_stream: DataFrame,
    hash_snapshot: DataFrame | None = None,
    survivors_path: str | None = None,
    checkpoint_path: str | None = None,
    snapshot_path: str | None = None,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
    gray_decoder=None,
    keep_last: int | None = None,
) -> DataFrame:
    """Continuous MEDIA ingest on Structured Streaming — the multimodal
    leg of :func:`streaming_ingest`: every micro-batch runs
    :func:`~datamunging_spark.operators.multimodal.incremental_phash_dedup`
    against the current dHash snapshot (so image near-dups are caught
    ACROSS micro-batches), appends its survivors to ``survivors_path``
    (parquet), and rolls the snapshot forward for the NEXT batch. The
    state is (id, 8-byte hash) per ever-ingested image — the family's
    slimmest, so unlike the exact+fuzzy+span loop it needs no delta
    log: each fold persists the full snapshot (one slim rewrite).

    Ordering matches streaming_ingest's exactly-once stance: the sink
    append lands BEFORE the snapshot version, so a crash between the
    two can duplicate a batch's survivors on replay but never lose them
    — and the DEDUP state stays correct either way, because
    re-ingesting already-folded payloads yields zero survivors
    (hamming-0 self-match; pinned by the two-batch idempotence test).

    **Restart durability**: with ``checkpoint_path`` set, committed
    micro-batches are skipped on restart — pair it with
    ``snapshot_path`` (a :mod:`sources.versioned` store: version =
    batch_id + 1, overwrite-idempotent, commit-markered) so the hash
    state advances with the commit log; on start the latest committed
    version overrides ``hash_snapshot``. A replayed batch whose version
    already committed is a FULL NO-OP (state reloads from the committed
    version) — re-running it would duplicate the sink and self-overwrite
    the version the run's state reads from (the r12 review reproduced
    that as a restart crash that gutted the committed version). Corollary
    contract, shared with streaming_ingest: ``snapshot_path`` is coupled
    to ONE checkpoint lineage — versions are keyed by batch id, so
    pointing a fresh checkpoint at an existing store replays as no-ops.
    ``keep_last`` vacuums old versions after each fold. Runs with
    ``availableNow`` (drain-and-stop); returns the final snapshot for
    external persistence when ``snapshot_path`` is None
    (localCheckpoint-pinned in that mode)."""
    from datamunging_spark.operators.multimodal import (
        incremental_phash_dedup,
        phash_df,
    )
    from datamunging_spark.sources.versioned import (
        read_table_version,
        vacuum_table_versions,
        write_table_version,
    )

    spark = media_stream.sparkSession
    start = hash_snapshot
    if snapshot_path is not None:
        latest = _latest_snapshot_version(spark, snapshot_path)
        if latest is not None:
            start = read_table_version(spark, snapshot_path, latest)
    state = {"snap": start}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if snapshot_path is not None:
            vpath = f"{snapshot_path}/v{int(batch_id) + 1}"
            if _snapshot_version_committed(spark, vpath):
                # replay of a batch whose snapshot version committed
                # (crash landed between the snapshot write and the
                # streaming commit): the state is already durable and
                # the survivor append already happened — re-running
                # would duplicate the sink AND self-overwrite the
                # version this run's state was loaded from (overwrite
                # deletes input files mid-scan — reproduced by the r12
                # review as a restart crash that then GUTTED the
                # committed version). Full no-op, the streaming_ingest
                # contract.
                state["snap"] = read_table_version(
                    spark, snapshot_path, int(batch_id) + 1
                )
                return
        if not batch_df.head(1):
            # empty micro-batch: nothing to dedup, and a version write
            # would rewrite the entire unchanged snapshot (and, with
            # keep_last, vacuum a REAL older version for an identical
            # copy)
            return
        snap = state["snap"]
        if snap is None:
            # typed empty snapshot: first fold is pure within-batch dedup
            snap = phash_df(
                batch_df.limit(0), id_col=id_col,
                payload_col=payload_col, gray_decoder=gray_decoder,
            )
        surv, surv_sh = incremental_phash_dedup(
            batch_df, snap,
            max_hamming=max_hamming, bands=bands, id_col=id_col,
            payload_col=payload_col, gray_decoder=gray_decoder,
            _return_survivor_hash=True,
        )
        if survivors_path is not None:
            surv.write.mode("append").parquet(survivors_path)
        new_snap = snap.unionByName(surv_sh)
        if snapshot_path is not None:
            write_table_version(
                new_snap, snapshot_path, int(batch_id) + 1,
                batch_id=int(batch_id),
            )
            new_snap = read_table_version(
                spark, snapshot_path, int(batch_id) + 1
            )
            if keep_last is not None:
                vacuum_table_versions(spark, snapshot_path, keep_last)
        else:
            new_snap = new_snap.localCheckpoint()
        state["snap"] = new_snap

    writer = media_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    return state["snap"]


def streaming_resolve(
    records_stream: DataFrame,
    history: DataFrame,
    id_col: str,
    block_key,
    payload: list[str],
    match_cond,
    resolved_path: str | None = None,
    checkpoint_path: str | None = None,
    history_path: str | None = None,
    history_keep_last: int = 2,
    entity_col: str = "entity_id",
    max_block: int | None = 10_000,
) -> DataFrame:
    """Continuous entity resolution via ``foreachBatch`` — the ER face of
    :func:`streaming_ingest`: each micro-batch runs
    :func:`~datamunging_spark.operators.entity.incremental_resolve`
    against the rolling resolved history, appends the labeled batch to
    ``resolved_path`` (parquet, ``n_hist_matches`` kept for the
    merge-review queue), and folds it into the history for the NEXT
    micro-batch — so a record arriving later than its entity-mates still
    adopts their entity, beyond any watermark horizon.

    **Compaction (bounded state)**: only records whose ``id_col`` is NOT
    already historied are folded in (slim-id anti-join, first-wins) — so
    re-ingested/replayed records never grow the history; its row count is
    bounded by DISTINCT record ids, not by stream volume. Labels stay
    correct either way (re-resolving a historied record adopts its own
    entity — pinned by test_incremental_resolve_idempotent_reingest);
    first-wins means a same-id record arriving with a CHANGED payload
    does not update the historied copy (ER history is a label registry,
    not a CDC table — route payload updates through apply_changelog).

    **Durability**: with ``history_path`` set, each batch's compacted
    history is committed to the versioned store (sources/versioned —
    commit markers, MONOTONIC ``latest+1`` numbering so versions never
    collide across restarts, per-version ``_CDC_BATCH_{id}`` replay
    tags), the LATEST version is loaded on start (overriding the
    ``history`` argument), a batch whose tag is already committed is a
    full no-op (crash-replay; tags survive vacuum via the root
    ``_CDC_BATCHES`` manifest), and versions older than
    ``history_keep_last`` are vacuumed each batch — the same retention
    story ``advance_snapshot``/``vacuum_table_versions`` gave dedup.
    Memory-only (``history_path=None``) keeps per-batch
    ``localCheckpoint`` pinning — the availableNow drain/backfill shape.
    Returns the final history. Caveat (same as streaming_ingest): replay
    tags key on batch_id, so a ``history_path`` belongs to ONE logical
    stream+checkpoint lineage — pointing a brand-new stream (fresh
    checkpoint, genuinely new data, batch ids restarting at 0) at an old
    history store would no-op its first batches; use a fresh
    history_path or keep the checkpoint.
    """
    from datamunging_spark.operators.entity import incremental_resolve
    from datamunging_spark.sources.versioned import (
        batch_already_applied,
        latest_table_version,
        read_table_version,
        vacuum_table_versions,
        write_table_version,
    )

    spark = records_stream.sparkSession
    start = history
    if history_path is not None:
        if latest_table_version(spark, history_path) is not None:
            start = read_table_version(spark, history_path)
    state = {"hist": start.localCheckpoint()}

    def _process(batch_df, batch_id):
        bspark = batch_df.sparkSession
        if history_path is not None and batch_already_applied(
            bspark, history_path, batch_id
        ):
            # replay of a batch whose history commit survived a crash
            # (crash between the version commit and the streaming
            # commit): state is durable, the sink append already
            # happened — full no-op, same contract as streaming_ingest
            state["hist"] = read_table_version(bspark, history_path)
            return
        if not batch_df.head(1):
            return
        resolved = incremental_resolve(
            batch_df,
            state["hist"],
            id_col,
            block_key,
            payload,
            match_cond,
            entity_col=entity_col,
            max_block=max_block,
        ).localCheckpoint()
        if resolved_path is not None:
            resolved.write.mode("append").parquet(resolved_path)
        fresh = resolved.drop("n_hist_matches").join(
            state["hist"].select(id_col), id_col, "left_anti"
        )
        new_hist = state["hist"].unionByName(fresh)
        if history_path is not None:
            v = (latest_table_version(bspark, history_path) or 0) + 1
            write_table_version(
                new_hist, history_path, v, batch_id=batch_id
            )
            state["hist"] = read_table_version(bspark, history_path, v)
            vacuum_table_versions(
                bspark, history_path, keep_last=history_keep_last
            )
        else:
            state["hist"] = new_hist.localCheckpoint()

    writer = records_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    return state["hist"]


def streaming_apply_changelog(
    changes_stream: DataFrame,
    table_path: str,
    keys: list[str],
    version_col: str,
    op_col: str | None = None,
    checkpoint_path: str | None = None,
) -> int | None:
    """Continuous CDC materialization via ``foreachBatch``: each
    micro-batch of changelog rows rolls the versioned parquet table at
    ``table_path`` forward one committed version — a thin wrapper over
    sources/versioned.roll_table_version (latest-wins window over the
    BATCH only + one merge join against the current version), so batch
    and streaming rolls share one implementation. A CDC stream in, an
    always-readable sequence of immutable table versions out.

    Replay safety: every committed version carries a ``_CDC_BATCH_{id}``
    tag written BEFORE its commit marker; a replayed micro-batch (crash
    landed between the version commit and the stream checkpoint commit)
    finds its tag on a committed version and no-ops instead of
    double-applying. Version numbers are always latest+1 — recomputed
    per batch from the store, never derived from batch ids — so second
    drains against an existing checkpoint, restarts, and empty batches
    (skipped, no number consumed) all stay contiguous. A crash before
    the commit marker leaves a torn, invisible directory the retry
    overwrites.

    Drains with ``availableNow`` (the backfill/batch-drain shape used by
    the other streaming loops here); returns the latest committed version
    after the drain (None when the stream carried no data and the store
    is empty).
    """
    from datamunging_spark.sources.versioned import (
        batch_already_applied,
        latest_table_version,
        roll_table_version,
    )

    spark = changes_stream.sparkSession

    def _process(batch_df, batch_id):
        if not batch_df.head(1):
            return
        bspark = batch_df.sparkSession
        if batch_already_applied(bspark, table_path, batch_id):
            return
        roll_table_version(
            bspark,
            table_path,
            batch_df,
            keys,
            version_col,
            op_col=op_col,
            batch_id=batch_id,
        )

    writer = changes_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    return latest_table_version(spark, table_path)


def _versioned_stream_fold(
    values_stream: DataFrame,
    table_path: str,
    fold,
    checkpoint_path: str | None,
    keep_last: int,
    skip_applied: bool,
) -> int | None:
    """Shared ``foreachBatch`` scaffold for the fold-into-versioned-store
    streaming operators (rollup / heavy hitters / distinct counts):
    empty-batch guard → load latest committed state → ``fold(state_or_
    None, batch_df)`` → commit as version latest+1 → vacuum to
    ``keep_last`` → availableNow drain → return the latest version. One
    home for the exactly-once contract, so an ordering fix lands once.

    ``skip_applied`` encodes the fold's replay algebra:

    - ``True`` (NON-idempotent folds — rollup sums, MG merges): every
      version carries its micro-batch tag and a replayed batch id
      no-ops, because re-folding would double-count. Required, and
      carries the documented residual risk: after a LOST checkpoint the
      new query renumbers batches from 0, and a low batch id covering
      NEW data will be skipped as "already applied".
    - ``False`` (IDEMPOTENT folds — HLL union, where re-union is the
      identity): replayed batches are RE-FOLDED instead of skipped and
      versions are written untagged. Estimates are unchanged on true
      replays, and the checkpoint-loss case above folds the new data
      instead of silently dropping it — strictly safer, available only
      because the fold is idempotent.
    """
    from datamunging_spark.sources.versioned import (
        batch_already_applied,
        latest_table_version,
        read_table_version,
        vacuum_table_versions,
        write_table_version,
    )

    spark = values_stream.sparkSession

    def _process(batch_df, batch_id):
        if not batch_df.head(1):
            return
        bspark = batch_df.sparkSession
        if skip_applied and batch_already_applied(
            bspark, table_path, batch_id
        ):
            return
        latest = latest_table_version(bspark, table_path)
        state = (
            read_table_version(bspark, table_path, latest)
            if latest is not None
            else None
        )
        folded = fold(state, batch_df)
        write_table_version(
            folded,
            table_path,
            (latest or 0) + 1,
            batch_id=batch_id if skip_applied else None,
        )
        vacuum_table_versions(bspark, table_path, keep_last=keep_last)

    writer = values_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    return latest_table_version(spark, table_path)


def streaming_rollup(
    events_stream: DataFrame,
    table_path: str,
    ts_col: str,
    bucket: str,
    aggs: dict,
    keys: list | None = None,
    checkpoint_path: str | None = None,
    keep_last: int = 2,
) -> int | None:
    """Continuous-aggregate materialization via ``foreachBatch``: each
    micro-batch folds into the stored time-bucketed rollup with
    :func:`~datamunging_spark.operators.relational.incremental_rollup`
    (mergeable sum/count/min/max decomposition — only the batch
    aggregates; event history is never rescanned) and commits the merged
    rollup as the next version of the versioned store at ``table_path``.
    The batch face and this streaming face share one fold implementation,
    exactly like streaming_apply_changelog wraps roll_table_version.

    Exactly-once: incremental_rollup's fold is NOT replay-idempotent
    (re-folding double-counts sums), so every committed version carries
    its micro-batch tag and a replayed batch no-ops — the
    ``batch_already_applied`` contract, durable across vacuum via the
    root manifest. Versions are monotonic latest+1; retired versions are
    vacuumed to ``keep_last`` each commit. Drains with ``availableNow``;
    returns the latest committed version (None for an empty drain on an
    empty store). Read the current rollup with ``read_table_version``.
    """
    from datamunging_spark.operators.relational import incremental_rollup

    return _versioned_stream_fold(
        events_stream,
        table_path,
        lambda state, batch: incremental_rollup(
            state, batch, ts_col, bucket, aggs, keys=keys
        ),
        checkpoint_path,
        keep_last,
        skip_applied=True,  # sum/count folds double-count on re-apply
    )


def streaming_heavy_hitters(
    values_stream: DataFrame,
    col: str,
    table_path: str,
    k: int = 4096,
    keys: list | None = None,
    checkpoint_path: str | None = None,
    keep_last: int = 2,
) -> int | None:
    """Continuous frequent-items maintenance via ``foreachBatch``: each
    micro-batch is summarized by
    :func:`~datamunging_spark.operators.sketch.hh_summary` (one Arrow
    pass, ≤ k counters per partition) and folded into the stored
    Misra-Gries summary with
    :func:`~datamunging_spark.operators.sketch.merge_hh_summaries`
    (summary-sized work only; the stored state stays ≤ k counter rows +
    2 meta rows, so per-batch cost is batch-scan + an O(k) merge no
    matter how long the stream has run). The mergeable-summaries bounds
    survive every fold: the 'dec' meta row carries the exact error
    budget, so :func:`~datamunging_spark.operators.sketch.hh_report`
    over any committed version brackets the TRUE stream-so-far counts.

    ``keys`` switches to the PER-KEY profile (grouped_hh_summary /
    merge_grouped_hh_summaries — "top domains per language over the
    whole stream"); render with ``grouped_hh_report``.

    Exactly-once mirrors :func:`streaming_rollup`: the fold is not
    replay-idempotent (re-folding double-counts), so each committed
    version carries its micro-batch tag and a replayed batch no-ops;
    versions vacuum to ``keep_last``. Drains with ``availableNow``;
    returns the latest committed version. Read the current report with
    ``hh_report(read_table_version(spark, table_path))``.
    """
    from datamunging_spark.operators.sketch import (
        grouped_hh_summary,
        hh_summary,
        merge_grouped_hh_summaries,
        merge_hh_summaries,
    )

    if keys:
        fold = lambda state, batch: merge_grouped_hh_summaries(  # noqa: E731
            grouped_hh_summary(batch, keys, col, k), state, keys, k
        )
    else:
        fold = lambda state, batch: merge_hh_summaries(  # noqa: E731
            hh_summary(batch, col, k), state, k
        )
    return _versioned_stream_fold(
        values_stream,
        table_path,
        fold,
        checkpoint_path,
        keep_last,
        skip_applied=True,  # MG counter merges double-count on re-apply
    )


def streaming_distinct_counts(
    values_stream: DataFrame,
    keys: list,
    col: str,
    table_path: str,
    lgk: int = 12,
    checkpoint_path: str | None = None,
    keep_last: int = 2,
) -> int | None:
    """Continuous per-key distinct-count maintenance via ``foreachBatch``:
    each micro-batch is sketched with
    :func:`~datamunging_spark.operators.sketch.distinct_sketch` (one
    hash aggregate; HLL partials merged map-side) and unioned into the
    stored per-key sketch state with
    :func:`~datamunging_spark.operators.sketch.merge_distinct_sketches`
    — so "distinct users per domain over the whole stream" costs
    batch-scan + a state-sized merge per batch, with state bounded at
    keys × 2^lgk bytes forever and NO rescan of history (DataSketches
    HLL union == the sketch of the union, so folds lose nothing).

    Replay semantics differ from :func:`streaming_rollup` ON PURPOSE:
    HLL union is IDEMPOTENT (re-unioning a batch's sketch is the
    identity), so replayed batches are RE-FOLDED rather than skipped
    (``skip_applied=False`` — versions written untagged). Estimates are
    unchanged on true replays, and after a LOST checkpoint — where a
    fresh query renumbers batches and a low batch id can cover NEW
    files — the new data is folded instead of silently dropped by a
    stale "already applied" tag, the data-loss window the
    non-idempotent folds cannot avoid. The only cost is extra version
    numbers on replay, bounded by vacuum. Drains with ``availableNow``;
    returns the latest committed version. Render the current counts
    with ``distinct_estimate(read_table_version(...))``.
    """
    from datamunging_spark.operators.sketch import (
        distinct_sketch,
        merge_distinct_sketches,
    )

    return _versioned_stream_fold(
        values_stream,
        table_path,
        lambda state, batch: merge_distinct_sketches(
            distinct_sketch(batch, keys, col, lgk), state, keys
        ),
        checkpoint_path,
        keep_last,
        skip_applied=False,  # HLL union is idempotent: re-fold, never skip
    )


def _index_version_is_delta(spark: SparkSession, vpath: str) -> bool:
    """A streaming-index version directory is a DELTA iff it carries a
    ``postings_delta`` subdirectory; otherwise it is a full base (the
    pre-r13 layout, where every version was a full base, classifies as
    all-bases and reloads unchanged)."""
    from datamunging_spark.sources.versioned import _fs

    fs, jvm = _fs(spark, vpath)
    return fs.exists(
        jvm.org.apache.hadoop.fs.Path(f"{vpath}/postings_delta")
    )


def read_index_version(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    id_col: "str | list[str]" = "doc_id",
) -> DataFrame:
    """Reconstruct the postings table as of a committed version of a
    :func:`streaming_index_ingest` store (default: latest): read the
    newest FULL base at or before it, then fold each later committed
    version's delta in order — anti-join its ``replaced_ids`` (batch-
    sized, broadcast), union its ``postings_delta``. The fold replays
    exactly :func:`~datamunging_spark.operators.retrieval.advance_index`
    ``replace_ids=True``, so the reconstruction equals the full table
    that a rewrite-per-version store would hold, with lineage bounded
    by the base cadence (≤ ``min(keep_last, base_every)`` − 1 deltas).
    Old-layout stores (every version a full base) reduce to 'read the
    requested version'. Guaranteed readable: the HEAD (the cadence
    keeps its base inside the retention window). A retained DELTA
    older than the newest base may have lost its own base to vacuum —
    such point-in-time reads raise FileNotFoundError with the
    keep_last guidance rather than returning a partial index."""
    from datamunging_spark.sources.versioned import list_table_versions

    versions = list_table_versions(spark, table_path)
    if version is None:
        if not versions:
            raise FileNotFoundError(
                f"no committed versions under {table_path}"
            )
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(
            f"version v{version} not committed at {table_path}"
        )
    upto = [v for v in versions if v <= version]
    base_v = None
    for v in upto:
        if not _index_version_is_delta(spark, f"{table_path}/v{v}"):
            base_v = v
    if base_v is None:
        raise FileNotFoundError(
            f"no full base at or before v{version} under {table_path} "
            "— the base was vacuumed past the delta chain; raise "
            "keep_last (the base cadence is min(keep_last, base_every))"
        )
    state = spark.read.parquet(f"{table_path}/v{base_v}")
    cols = state.columns
    for v in [v for v in upto if v > base_v]:
        vp = f"{table_path}/v{v}"
        replaced = spark.read.parquet(f"{vp}/replaced_ids")
        delta = spark.read.parquet(f"{vp}/postings_delta")
        if isinstance(id_col, str):
            anti = state.join(
                F.broadcast(replaced), id_col, "left_anti"
            )
        else:
            # grouped stores replace on (group, id) — NULL is a real
            # group, so the anti-join must be NULL-safe per key
            r = replaced.select(
                *[F.col(c).alias(f"_r_{c}") for c in id_col]
            )
            cond = None
            for c in id_col:
                eq = F.col(c).eqNullSafe(F.col(f"_r_{c}"))
                cond = eq if cond is None else (cond & eq)
            anti = state.join(F.broadcast(r), cond, "left_anti")
        state = anti.select(*cols).unionByName(delta)
    return state


def streaming_index_ingest(
    docs_stream: DataFrame,
    table_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    checkpoint_path: str | None = None,
    keep_last: int = 2,
    version_col: str | None = None,
    stats: bool = True,
    base_every: int | None = 64,
    positions: bool = False,
    group_col: str | None = None,
) -> int | None:
    """Continuous inverted-index maintenance via ``foreachBatch`` — the
    lexical-retrieval leg of the versioned-fold family: each micro-batch
    of documents is signed with
    :func:`~datamunging_spark.operators.retrieval.inverted_index` (ONE
    batch-sized aggregate; history never rescanned) and rolled onto the
    stored postings table with
    :func:`~datamunging_spark.operators.retrieval.advance_index`
    ``replace_ids=True`` — so the searchable index is always one
    :func:`read_index_version` away, Lucene's segment-merge freshness
    model on the versioned store.

    **The store is a delta log with base compaction (r13, the span-
    family r9 shape)**: most folds persist only the BATCH's increment
    (``postings_delta`` + ``replaced_ids`` under the version directory)
    — a batch-sized write, so a month of micro-batches costs a month of
    batch-sized deltas, not a month of full index rewrites. A FULL base
    (the version directory as plain parquet, the pre-r13 layout — old
    stores reload unchanged as all-bases) is compacted every
    ``min(keep_last, base_every)``-th fold: the retention term
    guarantees the HEAD's delta chain always has its base inside the
    vacuumed tail-K window (``keep_last=2``, the default, alternates
    base/delta — raise ``keep_last`` to amortize further), while
    ``base_every`` (default 64) bounds the reconstruction lineage on
    top of it. The retention term is NEVER optional —
    ``base_every=None`` only removes the lineage bound; vacuum would
    otherwise delete the only base out from under a pure delta chain
    and brick the store. Base-vs-delta is decided from the COMMITTED
    store alone and torn attempts are deleted whole before the write,
    so crash replays converge on the same mode. Read the HEAD (or any
    version whose base still survives retention — retained deltas
    OLDER than the newest base lose their base to vacuum and raise;
    the head chain is the guaranteed read) with
    :func:`read_index_version`, which replays the delta chain
    (broadcast anti-join + union per delta) onto the newest base.

    ``replace_ids=True`` is what makes the fold REPLAY-IDEMPOTENT (the
    streaming_distinct_counts algebra, ``skip_applied=False``): a
    re-folded batch first anti-joins its own doc ids out of the state,
    so re-applying is the identity — and updated documents in a later
    batch supersede their old postings for free, which append-only
    folds cannot offer. After a lost checkpoint, replayed-or-new
    batches fold correctly instead of being dropped by a stale tag.

    replace_ids supersedes ACROSS batches only — two rows for the same
    doc id WITHIN one micro-batch would both survive the batch's
    (term, doc) aggregate and silently corrupt the index (df/stats
    double-count the doc, BM25 sums stale + new text into one score).
    So within-batch id collisions FAIL FAST by default; pass
    ``version_col`` (a CDC-style monotonic version on the stream) to
    resolve them last-wins instead — ties on the version break on a
    content digest so the winner is deterministic under any
    partitioning. KNOWN GAP, by design: ``version_col`` arbitrates
    WITHIN a micro-batch only — the stored postings carry no version,
    so a stale version arriving in a LATER micro-batch still replaces
    the newer text (last-batch-wins). Per-key-ordered sources (Kafka
    keyed by doc id, Delta CDF) satisfy this for free; for genuinely
    unordered streams route updates through
    ``streaming_apply_changelog`` (which stores and compares versions)
    and rebuild/fold the index from its materialized table.

    **Stats ride the fold** (``stats=True``, default): a one-row
    (n_docs, total_len, avgdl) table is folded through its OWN
    versioned store at ``{table_path}_stats`` — same version numbers
    as the postings store, vacuumed on the same cadence — via the
    :func:`~datamunging_spark.operators.retrieval.combine_index_stats`
    algebra: add the batch's searchable stats, subtract the replaced
    docs' (derived from the history postings' slim (doc, doc_len)
    grain, so the subtraction is always exact and replay re-folds to
    the identity). The maintained invariant is ``stats ==
    stats_from_postings(postings)`` at every version — O(1) to read at
    query time, no index-grain rescan per refresh, and consistent with
    the searchable-corpus convention (zero-term docs invisible; an
    empty-text update under ``replace_ids`` is a DELETE, see
    :func:`~datamunging_spark.operators.retrieval.advance_index`, and
    the subtraction accounts for it automatically). Query the current
    version ANCHORED on the postings head — the stats version commits
    before its postings version, so a crash between the two can leave
    the stats store one version ahead until the replay rewrites it;
    always pass the postings version explicitly::

        v = latest_table_version(spark, table_path)
        bm25_topk(read_index_version(spark, table_path, v), queries,
                  read_table_version(spark, table_path + "_stats", v))

    With
    ``stats=False`` only postings are versioned and the query path
    falls back to
    :func:`~datamunging_spark.operators.retrieval.stats_from_postings`
    (a full index-grain distinct per refresh — fine interactively,
    wasteful in a refresh loop, and the reason ``stats`` defaults on).

    ``positions=True`` maintains a POSITIONAL index (the
    ``inverted_index(..., positions=True)`` layout) so ``phrase_topk``
    / ``near_topk`` / ``hit_windows`` answer straight from the
    streamed store: the flag matters only for the FIRST base — every
    later fold detects positionality from the stored schema (the
    ``advance_index`` contract), so an existing store can never be
    silently degraded by a mismatched flag. Stats are unaffected
    (``doc_len`` rides positional postings too).

    ``group_col`` maintains a GROUPED store (per-language streamed
    corpora — doc ids unique within their group, NULL a real group):
    folds sign and replace at (group, id) grain (the delta replay's
    anti-join is NULL-safe per key), within-batch collisions are
    judged per (group, id), and the stats store holds one row PER
    GROUP folded by the same add/subtract algebra (union + one
    groups-sized aggregate instead of the one-row crossJoin form).
    Read the head with ``read_index_version(...,
    id_col=[group_col, id_col])`` and query it with the grouped
    :func:`~datamunging_spark.operators.retrieval.bm25_topk` face;
    the stats version pairs the same way. Drains with
    ``availableNow``; returns the latest committed version."""
    from pyspark.sql import Window

    from datamunging_spark.operators.retrieval import (
        advance_index,
        combine_index_stats,
        inverted_index,
        stats_from_postings,
    )
    from datamunging_spark.sources.versioned import (
        latest_table_version,
        read_table_version,
        vacuum_table_versions,
        version_committed,
        write_table_version,
    )

    stats_path = f"{table_path}_stats"
    gb = [group_col] if group_col else []
    rid = [group_col, id_col] if group_col else id_col

    def _resolve_batch(batch):
        if version_col is not None:
            w = Window.partitionBy(*gb, id_col).orderBy(
                F.col(version_col).desc(),
                F.md5(F.coalesce(F.col(text_col), F.lit(""))).desc(),
            )
            return (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        dup = (
            batch.groupBy(*gb, id_col)
            .count()
            .filter(F.col("count") > 1)
            .head(1)
        )
        if dup:
            key = f"({group_col}, {id_col})" if group_col else id_col
            vals = tuple(dup[0])[:-1]
            vals = vals[0] if len(vals) == 1 else vals
            raise ValueError(
                f"streaming_index_ingest: micro-batch carries multiple "
                f"rows for {key}={vals!r} — within-batch "
                "collisions corrupt the (term, doc) grain; pass "
                "version_col= for last-wins resolution or dedup the "
                "stream upstream"
            )
        return batch

    def _replaced_slim(state, batch):
        """The (group,) doc, doc_len rows of history docs the batch
        replaces — NULL-safe on the group via the encoded key."""
        if not group_col:
            return (
                state.join(
                    F.broadcast(batch.select(id_col).distinct()),
                    id_col,
                    "semi",
                )
                .select(id_col, "doc_len")
                .distinct()
            )
        from datamunging_spark.operators.retrieval import _gkey

        keyed = state.withColumn("_bk", _gkey(group_col))
        ids = F.broadcast(
            batch.select(
                _gkey(group_col).alias("_bk"), F.col(id_col)
            ).distinct()
        )
        return (
            keyed.join(ids, ["_bk", id_col], "semi")
            .select(group_col, id_col, "doc_len")
            .distinct()
        )

    def _fold_stats(bspark, state, batch):
        """Commit the next stats version BEFORE the scaffold commits
        its postings version (same number — the postings store's
        latest+1). Everything here is batch-sized or group-rows-sized
        except the replaced-docs subtraction, a column-pruned (doc,
        doc_len) semi-join pass over the history postings."""
        next_v = (latest_table_version(bspark, table_path) or 0) + 1
        batch_stats = stats_from_postings(
            inverted_index(
                batch, text_col, id_col, lowercase, group_col=group_col
            ),
            id_col,
            group_col=group_col,
        )
        if state is None:
            new_stats = batch_stats
        else:
            prev_v = next_v - 1
            if version_committed(bspark, f"{stats_path}/v{prev_v}"):
                old_stats = read_table_version(
                    bspark, stats_path, prev_v
                )
            else:  # store predates stats=True: derive once, fold after
                old_stats = stats_from_postings(
                    state, id_col, group_col=group_col
                )
            replaced = _replaced_slim(state, batch)
            if group_col:
                # grouped algebra: negate per group, then one
                # groups-sized union aggregate re-derives avgdl —
                # exact long sums, the combine_index_stats property
                negated = replaced.groupBy(group_col).agg(
                    (-F.count(F.lit(1))).alias("n_docs"),
                    (-F.coalesce(F.sum("doc_len"), F.lit(0)))
                    .cast("long")
                    .alias("total_len"),
                    F.lit(None).cast("double").alias("avgdl"),
                )
                new_stats = (
                    old_stats.unionByName(negated)
                    .unionByName(batch_stats)
                    .groupBy(group_col)
                    .agg(
                        F.sum("n_docs").cast("long").alias("n_docs"),
                        F.sum("total_len")
                        .cast("long")
                        .alias("total_len"),
                    )
                    .filter(F.col("n_docs") > 0)
                    .withColumn(
                        "avgdl",
                        F.col("total_len").cast("double")
                        / F.col("n_docs").cast("double"),
                    )
                )
            else:
                negated = replaced.agg(
                    (-F.count(F.lit(1))).alias("n_docs"),
                    (-F.coalesce(F.sum("doc_len"), F.lit(0)))
                    .cast("long")
                    .alias("total_len"),
                    F.lit(None).cast("double").alias("avgdl"),
                )
                new_stats = combine_index_stats(
                    combine_index_stats(old_stats, negated), batch_stats
                )
        write_table_version(new_stats, stats_path, next_v)
        vacuum_table_versions(bspark, stats_path, keep_last=keep_last)

    def _process(batch_df, batch_id):
        if not batch_df.head(1):
            return
        bspark = batch_df.sparkSession
        latest = latest_table_version(bspark, table_path)
        state = (
            read_index_version(bspark, table_path, latest, rid)
            if latest is not None
            else None
        )
        if state is not None:
            # the grouped face is schema-authoritative like positions/
            # field/pq_codes: a flag flip cannot silently degrade an
            # existing store (the doc_id-only anti-join would delete
            # across groups and the base rewrite would drop the group
            # column)
            known = {
                "term", id_col, "tf", "doc_len", "positions",
            } | ({group_col} if group_col else set())
            extra = sorted(set(state.columns) - known)
            if group_col and group_col not in state.columns:
                raise ValueError(
                    f"streaming_index_ingest: group_col={group_col!r} "
                    "given but the store has no such column — it is "
                    "not a grouped store (or was built with a "
                    "different group column)"
                )
            if extra:
                if "field" in extra:
                    raise ValueError(
                        f"streaming_index_ingest: the store carries "
                        f"column(s) {extra} — this is a FIELDED index "
                        "(fielded_index layout), not an ingest store; "
                        "this fold maintains plain inverted_index "
                        "stores only"
                    )
                raise ValueError(
                    f"streaming_index_ingest: the store carries "
                    f"column(s) {extra} this fold does not understand "
                    "— a GROUPED store needs the same group_col= it "
                    "was built with; otherwise the path points at a "
                    "table with a different layout than this fold "
                    "writes"
                )
        batch = _resolve_batch(batch_df)
        if stats:
            _fold_stats(bspark, state, batch)
        next_v = (latest or 0) + 1
        vpath = f"{table_path}/v{next_v}"
        # torn leftovers from a crashed attempt (possibly in the OTHER
        # base/delta mode after a config change) must not pollute the
        # rewrite — an uncommitted vpath is invisible, delete it whole
        from datamunging_spark.sources.versioned import _fs

        fs, jvm = _fs(bspark, vpath)
        jp = jvm.org.apache.hadoop.fs.Path(vpath)
        if fs.exists(jp):
            fs.delete(jp, True)
        # base-vs-delta decided from the COMMITTED store alone, so
        # replays of the same batch converge on the same mode
        committed = list_table_versions(bspark, table_path)
        newest_base = None
        for v in committed:
            if not _index_version_is_delta(bspark, f"{table_path}/v{v}"):
                newest_base = v
        deltas_since = len(
            [
                v
                for v in committed
                if newest_base is None or v > newest_base
            ]
        )
        # the RETENTION term is never optional: without it, vacuum
        # deletes the only base out from under a pure delta chain and
        # the store is permanently unreadable (the span-family cadence
        # rule — min over the non-None bounds)
        cadence = min(
            c for c in (keep_last, base_every) if c is not None
        )
        write_base = (
            state is None
            or newest_base is None
            or (cadence is not None and deltas_since + 1 >= cadence)
        )
        # positionality: the flag decides the FIRST base; afterwards
        # the stored schema is authoritative (advance_index detects it
        # too, so a flag flip cannot degrade an existing store)
        pos = (
            "positions" in state.columns if state is not None
            else positions
        )
        if write_base:
            folded = (
                inverted_index(
                    batch, text_col, id_col, lowercase, positions=pos,
                    group_col=group_col,
                )
                if state is None
                else advance_index(
                    state,
                    batch,
                    text_col=text_col,
                    id_col=id_col,
                    lowercase=lowercase,
                    replace_ids=True,
                    group_col=group_col,
                )
            )
            write_table_version(folded, table_path, next_v)
        else:
            inverted_index(
                batch, text_col, id_col, lowercase, positions=pos,
                group_col=group_col,
            ).write.mode("overwrite").parquet(f"{vpath}/postings_delta")
            batch.select(*gb, F.col(id_col)).distinct().write.mode(
                "overwrite"
            ).parquet(f"{vpath}/replaced_ids")
            _mark_snapshot_committed(bspark, vpath)
        vacuum_table_versions(bspark, table_path, keep_last=keep_last)

    if base_every is not None and base_every < 1:
        raise ValueError(
            f"base_every must be >= 1 or None, got {base_every}"
        )
    from datamunging_spark.sources.versioned import list_table_versions

    spark = docs_stream.sparkSession
    writer = docs_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    return latest_table_version(spark, table_path)


def load_ivf_index(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
):
    """Reassemble the :class:`~datamunging_spark.operators.similarity.
    IvfIndex` as of a committed version of a :func:`streaming_ivf_ingest`
    store (default: latest): the inverted lists reconstruct through
    :func:`read_index_version` (same delta-log replay, id =
    ``neighbor_id``), the frozen centroids + drift baseline through the
    ``{table_path}_centers`` table (one bounded collect). Centroids are
    FROZEN for the store's lifetime, so any assigned version pairs with
    the one centers version."""
    from datamunging_spark.operators.similarity import (
        ivf_index_from_tables,
    )
    from datamunging_spark.sources.versioned import (
        latest_table_version,
        read_table_version,
    )

    cpath = f"{table_path}_centers"
    cv = latest_table_version(spark, cpath)
    if cv is None:
        raise FileNotFoundError(
            f"no committed centers table under {cpath} — not a "
            "streaming_ivf_ingest store (or the first fold never ran)"
        )
    centers_df = read_table_version(spark, cpath, cv)
    # a grouped store replays its replace/delete folds on (group, id)
    gcols = [
        c
        for c in centers_df.columns
        if c not in ("cell", "center", "mean_fit_dist")
    ]
    rid = [gcols[0], "neighbor_id"] if gcols else "neighbor_id"
    return ivf_index_from_tables(
        read_index_version(spark, table_path, version, rid),
        centers_df,
    )


def load_pq_codebook(spark: SparkSession, table_path: str):
    """The frozen :class:`~datamunging_spark.operators.similarity.
    PqCodebook` of a :func:`streaming_ivf_ingest` store built with
    ``codebook_m`` (persisted relationally at
    ``{table_path}_codebook``). Pair with :func:`load_ivf_index` —
    the store's ``pq_codes`` column plus this codebook is the full
    ``ivf_pq_topk`` serving layout."""
    from datamunging_spark.operators.similarity import (
        pq_codebook_from_table,
    )
    from datamunging_spark.sources.versioned import (
        latest_table_version,
        read_table_version,
    )

    cbpath = f"{table_path}_codebook"
    cbv = latest_table_version(spark, cbpath)
    if cbv is None:
        raise FileNotFoundError(
            f"no committed codebook under {cbpath} — the store was "
            "not built with codebook_m"
        )
    return pq_codebook_from_table(
        read_table_version(spark, cbpath, cbv)
    )


def streaming_ivf_ingest(
    vec_stream: DataFrame,
    table_path: str,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_path: str | None = None,
    keep_last: int = 2,
    base_every: int | None = 64,
    n_clusters: int = 16,
    seed: int = 42,
    max_fit_rows: int = 100_000,
    max_drift: float | None = 2.0,
    version_col: str | None = None,
    codebook_m: int | None = None,
    codebook_k: int = 256,
    codebook_iters: int = 10,
    group_col: str | None = None,
) -> int | None:
    """Continuous IVF vector-index maintenance via ``foreachBatch`` —
    the ANN leg of the versioned-fold family, completing it across
    every index-shaped state the engine ships (exact/fuzzy/span/
    semantic/phash snapshots, the lexical index, now the vector index):
    the FIRST non-empty micro-batch fits the coarse quantizer
    (:func:`~datamunging_spark.operators.similarity.ivf_build`, seeded
    sample ≤ ``max_fit_rows``) and writes the frozen centroids + drift
    baseline ONCE to ``{table_path}_centers`` (the relational
    :func:`~datamunging_spark.operators.similarity.ivf_centers_table`
    — no ``.npy`` side-channel, so restart needs only the store); every
    later batch is assigned to the frozen cells in ONE Arrow pass (no
    per-batch KMeans — the
    :func:`~datamunging_spark.operators.similarity.advance_ivf_index`
    machinery, drift valve included: a shifted embedding distribution
    FAILS the stream with a rebuild instruction rather than silently
    losing recall) and folded onto the stored inverted lists with
    ``replace_ids=True`` semantics — so re-folded batches are the
    identity (replay-idempotent) and updated vectors supersede their
    old rows; a NULL-vector row is a DELETE.

    **The store is the same delta-log with base compaction as
    :func:`streaming_index_ingest`** (identical layout — deltas under
    ``postings_delta``/``replaced_ids``, base cadence
    ``min(keep_last, base_every)``, torn-attempt cleanup, committed-
    store-only mode decisions), so each fold writes O(batch) vector
    rows, not the accumulated corpus — at 100 TB of embeddings a full
    rewrite per micro-batch would dominate everything. Read any
    version back with :func:`load_ivf_index` and search it with
    ``ivf_search``.

    ``codebook_m`` arms the FULL IVF-PQ layout: the first fold also
    fits the product-quantization codebooks on the first batch
    (``pq_fit(m=codebook_m, k=codebook_k, iters=codebook_iters)`` —
    seeded, so a crash-replayed first batch refits the identical
    codebook) and persists them relationally at
    ``{table_path}_codebook`` (``pq_codebook_table``); every fold then
    encodes its batch with the FROZEN codebook and the codes ride the
    SAME versioned rows as a ``pq_codes`` column — one store, no
    second fold to keep consistent, deltas carry codes for free.
    Serve with :func:`load_pq_codebook` + ``ivf_pq_topk(...,
    encoded_cells=index.assigned.select('neighbor_id', '_cell',
    'pq_codes'))``. Codebook freshness is the same add-vs-retrain
    trade as the centroids (the drift valve guards both — a
    distribution shift that breaks cells breaks codes too).

    Within-batch id collisions FAIL FAST by default (two rows for one
    vec_id in a micro-batch would BOTH survive the history anti-join
    and make the id searchable twice — the lexical loop's contract);
    pass ``version_col`` (a CDC-style monotonic version) to resolve
    them last-wins instead, ties broken on a content hash of the
    vector so the winner is deterministic under any partitioning. The
    lexical loop's known gap is shared: the store carries no version,
    so ordering ACROSS micro-batches is the source's job. A FIRST
    batch that carries only NULL-vector (delete) rows is skipped —
    deletes against an empty store are no-ops and there is nothing to
    fit the quantizer on. Drains with ``availableNow``; returns the
    latest committed version.

    ``group_col`` arms the GROUPED store (per-language/per-tenant
    corpora — the grouped ``ivf_build``/``advance_ivf_index``
    semantics, folded): rows carry the group, ids are unique WITHIN
    their group, replace/delete keys on (group, id), the drift valve
    runs per group, and each group gets its own frozen centroids.
    Unlike the advance face, a batch group the store has never seen is
    FIT ON FIRST APPEARANCE: its centroids are fitted from that batch
    (seeded, so a crash-replay refits identically) and appended to the
    centers table as a NEW version — existing groups' centroids stay
    frozen verbatim; the committed centers version at any list version
    covers every group that version's rows mention. The flag is
    schema-authoritative like positions/pq_codes: a grouped store
    refuses an ungrouped fold and vice versa (the doc-id-only replay
    would delete across groups). One GLOBAL PQ codebook serves all
    groups when ``codebook_m`` is set (codes quantize vectors
    group-independently)."""
    from datamunging_spark.operators.similarity import (
        IvfIndex,
        _assign_frozen,
        _assign_frozen_grouped,
        _pq_encode_udf,
        _pygkey,
        ivf_build,
        ivf_centers_table,
        ivf_index_from_tables,
        pq_codebook_from_table,
        pq_codebook_table,
        pq_fit,
    )
    from datamunging_spark.sources.versioned import (
        _fs,
        latest_table_version,
        list_table_versions,
        read_table_version,
        vacuum_table_versions,
        write_table_version,
    )

    if base_every is not None and base_every < 1:
        raise ValueError(
            f"base_every must be >= 1 or None, got {base_every}"
        )
    from pyspark.sql import Window

    cpath = f"{table_path}_centers"
    cbpath = f"{table_path}_codebook"

    def _fit_codebook(bspark, fit_src):
        cb = pq_fit(
            fit_src,
            vec_col=vec_col,
            m=codebook_m,
            k=codebook_k,
            seed=seed,
            max_fit_rows=max_fit_rows,
            iters=codebook_iters,
        )
        write_table_version(pq_codebook_table(cb, bspark), cbpath, 1)
        return cb

    def _with_codes(assigned_df, cb):
        return assigned_df.withColumn(
            "pq_codes", _pq_encode_udf(cb)(F.col("_cv"))
        )

    # the codebook is FROZEN at v1 for the store's lifetime — load it
    # once per drain, not once per micro-batch (m x k rows collected +
    # a numpy rebuild per fold otherwise)
    _cb_cache: dict = {}

    def _load_cb(bspark):
        if "cb" not in _cb_cache:
            cbv = latest_table_version(bspark, cbpath)
            if cbv is None:
                raise ValueError(
                    "streaming_ivf_ingest: the store carries pq_codes "
                    f"but no codebook is committed under {cbpath} — "
                    "the codebook table was deleted; restore it or "
                    "rebuild the store"
                )
            _cb_cache["cb"] = pq_codebook_from_table(
                read_table_version(bspark, cbpath, cbv)
            )
        return _cb_cache["cb"]

    key_cols = ([group_col] if group_col else []) + [vec_id]

    def _resolve_batch(batch):
        if group_col is not None and group_col not in batch.columns:
            raise ValueError(
                f"streaming_ivf_ingest: group_col={group_col!r} given "
                "but the micro-batch has no such column"
            )
        if version_col is not None:
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(version_col).desc(),
                F.hash(F.col(vec_col)).desc(),
            )
            return (
                batch.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        dup = (
            batch.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .head(1)
        )
        if dup:
            raise ValueError(
                f"streaming_ivf_ingest: micro-batch carries multiple "
                f"rows for {tuple(key_cols)}={tuple(dup[0][:-1])!r} — "
                "both would survive the history anti-join and be "
                "searchable twice; pass version_col= for last-wins "
                "resolution or dedup the stream upstream"
            )
        return batch

    def _flag_check(centers_df):
        # groupedness is schema-authoritative from the CENTERS table
        # (like positions/pq_codes): a flip in either direction would
        # make the (group, id) vs id-only replay delete wrong rows
        store_g = [
            c
            for c in centers_df.columns
            if c not in ("cell", "center", "mean_fit_dist")
        ]
        store_gcol = store_g[0] if store_g else None
        if store_gcol != group_col:
            raise ValueError(
                f"streaming_ivf_ingest: the store's centers table says "
                f"group_col={store_gcol!r} but this fold was given "
                f"group_col={group_col!r} — groupedness is decided by "
                "the store; pass the column it was built with (or "
                "rebuild the store to change it)"
            )

    def _ensure_groups(idx, bdf, cv_now):
        """Fit-on-first-appearance: batch groups the store has never
        seen get centroids fitted from THIS batch (seeded — a crash
        replay refits identically) and the merged centers commit as a
        NEW version BEFORE any list write, so a crash between the two
        converges on replay. Existing groups' centroids are carried
        verbatim — still frozen."""
        if group_col is None:
            return idx
        src = bdf.filter(F.col(vec_col).isNotNull())
        known = {_pygkey(g) for g in idx.centers}
        groups = [
            r[group_col]
            for r in src.select(group_col).distinct().collect()
        ]
        new = [g for g in groups if _pygkey(g) not in known]
        if not new:
            return idx
        cond = None
        non_null = [g for g in new if g is not None]
        if non_null:
            cond = F.col(group_col).isin(non_null)
        if any(g is None for g in new):
            isn = F.col(group_col).isNull()
            cond = isn if cond is None else (cond | isn)
        new_idx = ivf_build(
            src.filter(cond),
            corpus_id=vec_id,
            vec_col=vec_col,
            n_clusters=n_clusters,
            seed=seed,
            max_fit_rows=max_fit_rows,
            group_col=group_col,
        )
        merged = IvfIndex(
            new_idx.assigned,  # session carrier; lists live in the store
            {**idx.centers, **new_idx.centers},
            n_clusters,
            {**idx.mean_fit_dist, **new_idx.mean_fit_dist},
            group_col=group_col,
            group_type=new_idx.group_type,
        )
        write_table_version(
            ivf_centers_table(merged), cpath, cv_now + 1
        )
        return merged

    def _assign_rows(idx, bdf):
        if group_col is not None:
            return _assign_frozen_grouped(
                idx, bdf, vec_id, vec_col, max_drift, pin=False
            ).select("neighbor_id", "_cv", "_cell", group_col)
        return _assign_frozen(
            idx, bdf, vec_id, vec_col, max_drift, pin=False
        ).select("neighbor_id", "_cv", "_cell")

    def _process(batch_df, batch_id):
        if not batch_df.head(1):
            return
        bspark = batch_df.sparkSession
        batch_df = _resolve_batch(batch_df)
        cv = latest_table_version(bspark, cpath)
        mv = latest_table_version(bspark, table_path)
        next_v = (mv or 0) + 1
        vpath = f"{table_path}/v{next_v}"
        # torn leftovers from a crashed attempt must not pollute the
        # write — an uncommitted vpath is invisible, delete it whole
        fs, jvm = _fs(bspark, vpath)
        jp = jvm.org.apache.hadoop.fs.Path(vpath)
        if fs.exists(jp):
            fs.delete(jp, True)
        if cv is None:
            fit_src = batch_df.filter(F.col(vec_col).isNotNull())
            if not fit_src.head(1):
                # delete-only first batch: deletes against an empty
                # store are no-ops and KMeans has nothing to fit on —
                # skip; the first REAL batch fits the quantizer
                return
            # first fold: fit the quantizer on this batch, freeze it
            idx = ivf_build(
                fit_src,
                corpus_id=vec_id,
                vec_col=vec_col,
                n_clusters=n_clusters,
                seed=seed,
                max_fit_rows=max_fit_rows,
                group_col=group_col,
            )
            write_table_version(ivf_centers_table(idx), cpath, 1)
            base = idx.assigned
            if codebook_m is not None:
                cb = _fit_codebook(bspark, fit_src)
                base = _with_codes(base, cb)
            write_table_version(base, table_path, next_v)
            vacuum_table_versions(
                bspark, table_path, keep_last=keep_last
            )
            return
        centers = read_table_version(bspark, cpath, cv)
        _flag_check(centers)
        if mv is None:
            # crash landed between the centers commit and the first
            # inverted-list write: re-sign this batch under the
            # committed frozen centers and write the missing base
            shell = ivf_index_from_tables(None, centers)
            shell = _ensure_groups(shell, batch_df, cv)
            first = _assign_rows(shell, batch_df)
            if codebook_m is not None:
                # seeded pq_fit on the SAME replayed batch refits the
                # identical codebook, so a crash between the codebook
                # and list commits converges either way
                cbv = latest_table_version(bspark, cbpath)
                cb = (
                    pq_codebook_from_table(
                        read_table_version(bspark, cbpath, cbv)
                    )
                    if cbv is not None
                    else _fit_codebook(
                        bspark,
                        batch_df.filter(F.col(vec_col).isNotNull()),
                    )
                )
                first = _with_codes(first, cb)
            write_table_version(first, table_path, 1)
            vacuum_table_versions(
                bspark, table_path, keep_last=keep_last
            )
            return
        state = read_index_version(
            bspark,
            table_path,
            None,
            [group_col, "neighbor_id"] if group_col else "neighbor_id",
        )
        # codes are schema-authoritative, like positionality in the
        # lexical loop: the store decides; a flag flip cannot retrofit
        has_codes = "pq_codes" in state.columns
        if has_codes:
            cb = _load_cb(bspark)
        elif codebook_m is not None:
            raise ValueError(
                "streaming_ivf_ingest: codebook_m given but the store "
                "has no pq_codes column — codes cannot be retrofitted "
                "onto an existing store (history would need a full "
                "re-encode); rebuild the store with codebook_m set "
                "from the first fold"
            )
        idx = ivf_index_from_tables(state, centers)
        idx = _ensure_groups(idx, batch_df, cv)
        assigned = _assign_rows(idx, batch_df)
        if has_codes:
            assigned = _with_codes(assigned, cb)
        replaced = batch_df.select(
            *([group_col] if group_col else []),
            F.col(vec_id).alias("neighbor_id"),
        ).distinct()
        # base-vs-delta decided from the COMMITTED store alone (the
        # streaming_index_ingest cadence — retention term NON-optional,
        # or vacuum deletes the only base under a pure delta chain)
        committed = list_table_versions(bspark, table_path)
        newest_base = None
        for v in committed:
            if not _index_version_is_delta(bspark, f"{table_path}/v{v}"):
                newest_base = v
        deltas_since = len(
            [
                v
                for v in committed
                if newest_base is None or v > newest_base
            ]
        )
        cadence = min(
            c for c in (keep_last, base_every) if c is not None
        )
        write_base = newest_base is None or (
            cadence is not None and deltas_since + 1 >= cadence
        )
        if write_base:
            if group_col is not None:
                # (group, id) keys, NULL-safe — the grouped replay
                # contract (read_index_version's list-key fold)
                r = replaced.select(
                    F.col(group_col).alias("_r_g"),
                    F.col("neighbor_id").alias("_r_id"),
                )
                cond = F.col(group_col).eqNullSafe(
                    F.col("_r_g")
                ) & F.col("neighbor_id").eqNullSafe(F.col("_r_id"))
                anti = state.join(F.broadcast(r), cond, "left_anti")
            else:
                anti = state.join(
                    F.broadcast(replaced), "neighbor_id", "left_anti"
                )
            folded = anti.select(*state.columns).unionByName(assigned)
            write_table_version(folded, table_path, next_v)
        else:
            assigned.write.mode("overwrite").parquet(
                f"{vpath}/postings_delta"
            )
            replaced.write.mode("overwrite").parquet(
                f"{vpath}/replaced_ids"
            )
            _mark_snapshot_committed(bspark, vpath)
        vacuum_table_versions(bspark, table_path, keep_last=keep_last)

    spark = vec_stream.sparkSession
    writer = vec_stream.writeStream.foreachBatch(_process).trigger(
        availableNow=True
    )
    if checkpoint_path is not None:
        writer = writer.option("checkpointLocation", checkpoint_path)
    q = writer.start()
    q.processAllAvailable()
    q.stop()
    return latest_table_version(spark, table_path)


def streaming_quantiles(
    values_stream: DataFrame,
    col: str,
    table_path: str,
    k: int = 4096,
    keys: list | None = None,
    checkpoint_path: str | None = None,
    keep_last: int = 2,
) -> int | None:
    """Continuous quantile-profile maintenance via ``foreachBatch`` —
    the rank/quantile leg of the sketch-fold trio (frequency =
    :func:`streaming_heavy_hitters`, distinct =
    :func:`streaming_distinct_counts`): each micro-batch is summarized
    by :func:`~datamunging_spark.operators.sketch.quantile_summary`
    (one Arrow compactor pass, ≤ k items per level) and folded into the
    stored summary with
    :func:`~datamunging_spark.operators.sketch.merge_quantile_summaries`
    (summary-sized union + re-compaction; stored state stays ≤ k items
    per level forever). Mass conservation and the carried rank-error
    budget survive every fold, so
    ``quantile_report(read_table_version(...), qs)`` over any committed
    version brackets the TRUE stream-so-far ranks.

    ``keys`` switches to the PER-KEY profile (grouped_quantile_summary
    / merge_grouped_quantile_summaries — "p99 doc length per source over
    the whole crawl"); render with ``grouped_quantile_report``.

    Exactly-once mirrors :func:`streaming_heavy_hitters`: the fold is
    NOT replay-idempotent (re-merging a batch's summary double-counts
    its mass), so each committed version carries its micro-batch tag
    and a replayed batch no-ops; versions vacuum to ``keep_last``.
    Drains with ``availableNow``; returns the latest committed version.
    """
    from datamunging_spark.operators.sketch import (
        grouped_quantile_summary,
        merge_grouped_quantile_summaries,
        merge_quantile_summaries,
        quantile_summary,
    )

    # rebound=False: the merge pools and re-bounds anyway, so the batch
    # side skips its own checkpoint + re-compaction (one fewer eager job
    # per fold, and the budget isn't charged for a compaction the merge
    # would redo — the r9 second-review finding)
    if keys:
        fold = lambda state, batch: merge_grouped_quantile_summaries(  # noqa: E731
            grouped_quantile_summary(batch, keys, col, k, rebound=False),
            state, keys, k,
        )
    else:
        fold = lambda state, batch: merge_quantile_summaries(  # noqa: E731
            quantile_summary(batch, col, k, rebound=False), state, k
        )
    return _versioned_stream_fold(
        values_stream,
        table_path,
        fold,
        checkpoint_path,
        keep_last,
        skip_applied=True,  # summary mass double-counts on re-apply
    )
