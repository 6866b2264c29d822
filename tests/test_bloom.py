"""Bloom filter build/probe — no false negatives ever, false positives
bounded, chunked build correctness, and the incremental-dedup prefilter
composition it exists for."""

import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.bloom import (
    BloomFilter,
    bloom_build,
    bloom_might_contain,
    bloom_params,
)


def test_bloom_params_sane():
    m, k = bloom_params(1000, 0.01)
    assert m % 8 == 0 and m > 9000  # ~9.6 bits/key at 1%
    assert 5 <= k <= 10
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_bounded_fpp(spark):
    inserted = spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("s")
    )
    bloom = bloom_build(inserted, ["s"], fpp=0.01)
    # every inserted key MUST hit
    hits = inserted.filter(bloom_might_contain(bloom, "s")).count()
    assert hits == 2000
    # disjoint probe set: false-positive rate near nominal (generous 5x)
    probes = spark.range(100000, 110000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("s")
    )
    fp = probes.filter(bloom_might_contain(bloom, "s")).count()
    assert fp <= 0.05 * 10000


def test_empty_build_rejects_everything(spark):
    empty = spark.createDataFrame([], "s string")
    bloom = bloom_build(empty, ["s"])
    probes = spark.createDataFrame([("a",), ("b",)], "s string")
    assert probes.filter(bloom_might_contain(bloom, "s")).count() == 0


def test_chunked_build_matches_single_chunk(spark):
    df = spark.range(0, 500).select(
        F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    whole = bloom_build(df, ["s"], num_items=500, fpp=0.01)
    chunked = bloom_build(
        df, ["s"], num_items=500, fpp=0.01, chunk_bytes=64
    )
    assert whole == chunked  # same bits regardless of chunking


def test_multi_column_keys(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "i int, s string")
    bloom = bloom_build(df, ["i", "s"])
    probe = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "b")], "i int, s string"
    )
    got = {
        (r.i, r.s)
        for r in probe.filter(bloom_might_contain(bloom, "i", "s")).collect()
    }
    assert (1, "a") in got and (2, "b") in got
    # cross-pairings are absent (tuple hashing, not per-column)
    assert len(got) <= 3


def test_incremental_dedup_prefilter_composition(spark):
    """The operator's reason to exist: prefilter a batch against the
    history filter so only might-contain rows pay the exact anti-join —
    final survivors identical to the plain anti-join."""
    hist = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], "doc_id int, text string"
    )
    batch = spark.createDataFrame(
        # 10 re-ingested + 490 new
        [(1000 + i, f"doc {i}") for i in range(10)]
        + [(2000 + i, f"fresh {i}") for i in range(490)],
        "doc_id int, text string",
    )
    hist_hashes = hist.select(F.md5("text").alias("h"))
    bloom = bloom_build(hist_hashes, ["h"], num_items=500)

    b = batch.withColumn("_h", F.md5("text"))
    maybe = b.filter(bloom_might_contain(bloom, "_h"))
    definite_new = b.filter(~bloom_might_contain(bloom, "_h"))
    survivors = definite_new.unionByName(
        maybe.join(hist_hashes, maybe["_h"] == hist_hashes["h"],
                   "left_anti")
    ).drop("_h")

    plain = batch.withColumn("_h", F.md5("text")).join(
        hist_hashes,
        F.col("_h") == F.col("h"),
        "left_anti",
    ).drop("_h")
    assert sorted(map(tuple, survivors.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # and the anti-join side really shrank (no false-negative leak back)
    assert maybe.count() < 50


def test_bloomfilter_is_value_type():
    a = BloomFilter(b"\x00" * 8, 64, 3)
    b = BloomFilter(b"\x00" * 8, 64, 3)
    assert a == b


def test_bloom_or_merge_and_drift(spark):
    from datamunging_spark.operators.bloom import bloom_or

    a_df = spark.createDataFrame([("a",), ("b",)], "s string")
    c_df = spark.createDataFrame([("c",), ("d",)], "s string")
    a = bloom_build(a_df, ["s"], num_items=100)
    c = bloom_build(c_df, ["s"], num_items=100)
    merged = bloom_or(a, c)
    probe = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "s string"
    )
    assert probe.filter(bloom_might_contain(merged, "s")).count() == 4
    other = bloom_build(a_df, ["s"], num_items=5000)  # different m
    with pytest.raises(ValueError):
        bloom_or(a, other)


def test_incremental_dedup_bloom_param_identical_results(spark):
    """incremental_dedup(bloom=...) must return exactly the plain-path
    survivors, across two loop iterations with bloom_or maintenance."""
    from datamunging_spark.operators.bloom import bloom_or
    from datamunging_spark.operators.dedup import (
        content_snapshot,
        incremental_dedup,
    )

    hist = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(300)],
        "doc_id int, text string",
    )
    snap = content_snapshot(hist).localCheckpoint()
    bloom = bloom_build(snap, ["content_hash"], num_items=1000)

    batch1 = spark.createDataFrame(
        [(1000 + i, f"doc number {i}") for i in range(5)]      # dupes
        + [(3000 + i, f"novel text {i}") for i in range(200)],  # new
        "doc_id int, text string",
    )
    plain = incremental_dedup(batch1, snap)
    fast = incremental_dedup(batch1, snap, bloom=bloom)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # loop maintenance: fold batch1's survivors into snapshot + bloom
    surv_snap = content_snapshot(fast)
    snap2 = snap.unionByName(surv_snap).localCheckpoint()
    bloom2 = bloom_or(
        bloom, bloom_build(surv_snap, ["content_hash"], num_items=1000)
    )
    batch2 = spark.createDataFrame(
        [(5000, "novel text 3"), (5001, "really fresh")],  # 1 dup vs b1
        "doc_id int, text string",
    )
    plain2 = incremental_dedup(batch2, snap2)
    fast2 = incremental_dedup(batch2, snap2, bloom=bloom2)
    got = sorted(map(tuple, fast2.collect()))
    assert got == sorted(map(tuple, plain2.collect()))
    assert got == [(5001, "really fresh")]


def test_bloom_broadcast_cached_and_released(spark):
    from datamunging_spark.operators.bloom import (
        _BC_CACHE,
        bloom_release,
    )

    df = spark.createDataFrame([("x",), ("y",)], "s string")
    bloom = bloom_build(df, ["s"], num_items=10)
    before = len(_BC_CACHE)
    df.filter(bloom_might_contain(bloom, "s")).count()
    df.filter(bloom_might_contain(bloom, "s")).count()
    # two calls with the same filter share ONE broadcast
    assert len(_BC_CACHE) == before + 1
    assert bloom_release(bloom) is True
    assert len(_BC_CACHE) == before
    assert bloom_release(bloom) is False  # already gone


def test_incremental_dedup_bloom_temp_column_guard(spark):
    from datamunging_spark.operators.dedup import incremental_dedup

    hist = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    snap = spark.createDataFrame([("h",)], "content_hash string")
    bad = hist.withColumn("__dm_bloom_maybe", pytest.importorskip(
        "pyspark.sql.functions").lit(True))
    bloom = bloom_build(snap, ["content_hash"], num_items=10)
    with pytest.raises(ValueError, match="__dm_bloom_maybe"):
        incremental_dedup(bad, snap, bloom=bloom)


def test_shuffle_build_matches_local(spark):
    """The memory-bounded position-shuffle build produces bit-identical
    filters to the task-local build (and auto stays local for small
    bitmaps)."""
    df = spark.range(0, 800).select(
        F.concat(F.lit("k"), F.col("id")).alias("s")
    )
    local = bloom_build(
        df, ["s"], num_items=800, fpp=0.01, method="local", chunk_bytes=64
    )
    shuffled = bloom_build(
        df, ["s"], num_items=800, fpp=0.01, method="shuffle", chunk_bytes=64
    )
    assert local.bits == shuffled.bits
    assert (local.m, local.k) == (shuffled.m, shuffled.k)
    auto = bloom_build(df, ["s"], num_items=800, fpp=0.01, chunk_bytes=64)
    assert auto.bits == local.bits
    # non-multiple-of-8 chunk_bytes: the word-agg build rounds its chunk
    # down to word alignment; bits must still be identical
    odd = bloom_build(
        df, ["s"], num_items=800, fpp=0.01, method="shuffle", chunk_bytes=60
    )
    assert odd.bits == local.bits
    assert odd.digest == local.digest
    with pytest.raises(ValueError, match="method"):
        bloom_build(df, ["s"], num_items=10, method="bogus")


def test_digest_cached_at_build_and_or(spark):
    from datamunging_spark.operators.bloom import _digest, bloom_or

    df = spark.createDataFrame([("x",), ("y",)], "s string")
    a = bloom_build(df, ["s"], num_items=10)
    assert a.digest == _digest(a.bits)
    b = bloom_build(
        spark.createDataFrame([("z",)], "s string"), ["s"], num_items=10
    )
    merged = bloom_or(a, b)
    assert merged.digest == _digest(merged.bits)
    # hand-built filters (digest=None) still probe fine, but re-hash the
    # bitmap per call; with_digest() is the documented one-time fix
    hand = BloomFilter(a.bits, a.m, a.k)
    assert hand.digest is None
    assert df.filter(bloom_might_contain(hand, "s")).count() == 2
    cached = hand.with_digest()
    assert cached.digest == _digest(a.bits)
    assert cached.with_digest() is cached  # no-op when already cached
    assert df.filter(bloom_might_contain(cached, "s")).count() == 2
    from datamunging_spark.operators.bloom import bloom_release

    bloom_release(hand)
    bloom_release(cached)


def test_bloom_or_release_inputs_evicts_broadcasts(spark):
    from datamunging_spark.operators.bloom import (
        _BC_CACHE,
        bloom_or,
        bloom_release,
    )

    a_df = spark.createDataFrame([("a",)], "s string")
    b_df = spark.createDataFrame([("b",)], "s string")
    a = bloom_build(a_df, ["s"], num_items=10)
    b = bloom_build(b_df, ["s"], num_items=10)
    a_df.filter(bloom_might_contain(a, "s")).count()
    b_df.filter(bloom_might_contain(b, "s")).count()
    before = len(_BC_CACHE)
    merged = bloom_or(a, b, release_inputs=True)
    assert len(_BC_CACHE) == before - 2  # both retired broadcasts evicted
    # merged still covers both key sets
    both = a_df.unionByName(b_df)
    assert both.filter(bloom_might_contain(merged, "s")).count() == 2
    bloom_release(merged)


def test_incremental_dedup_stale_bloom_raises(spark):
    """A filter that does not cover the snapshot (stale: snapshot advanced
    without the bloom_or fold) is caught by the sampled coverage probe."""
    from datamunging_spark.operators.dedup import (
        content_snapshot,
        incremental_dedup,
    )

    hist = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(50)],
        "doc_id int, text string",
    )
    snap = content_snapshot(hist)
    # filter built over a DIFFERENT (disjoint) hash set -> covers nothing
    other = content_snapshot(
        spark.createDataFrame(
            [(i, f"unrelated {i}") for i in range(50)],
            "doc_id int, text string",
        )
    )
    stale = bloom_build(other, ["content_hash"], num_items=100)
    batch = spark.createDataFrame(
        [(100, "doc number 7"), (101, "genuinely new")],
        "doc_id int, text string",
    )
    with pytest.raises(ValueError, match="stale bloom filter"):
        incremental_dedup(batch, snap, bloom=stale)
    # bloom_verify=0 disables the check (documented escape hatch) -- and
    # then the stale filter DOES leak the duplicate, which is the hazard
    leaked = incremental_dedup(batch, snap, bloom=stale, bloom_verify=0)
    assert leaked.count() == 2  # dupe of doc 7 leaked past the anti-join
    # a covering filter passes the check and stays exact
    good = bloom_build(snap, ["content_hash"], num_items=100)
    exact = incremental_dedup(batch, snap, bloom=good)
    assert [r.doc_id for r in exact.collect()] == [101]


def test_stale_bloom_probe_catches_lag_by_one_fold(spark):
    """The documented common failure mode: the snapshot advanced
    (append-only, old rows FIRST) but the matching bloom_or fold was
    forgotten, so the filter covers everything EXCEPT the newest fold.
    A head-of-table limit(N) probe deterministically samples only old
    (covered) hashes and is blind to this; the per-partition first+last
    probe must raise."""
    from datamunging_spark.operators.dedup import (
        Snapshots,
        advance_snapshot,
        content_snapshot,
        incremental_dedup,
    )

    hist = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(200)],
        "doc_id int, text string",
    )
    snap1 = content_snapshot(hist)
    flt1 = bloom_build(snap1, ["content_hash"], num_items=1000)
    batch1 = spark.createDataFrame(
        [(1000 + i, f"fresh content {i}") for i in range(20)],
        "doc_id int, text string",
    )
    survivors = incremental_dedup(batch1, snap1, bloom=flt1)
    snap2 = advance_snapshot(survivors, Snapshots(snap1, None)).content
    # flt1 is now stale by exactly one fold (covers snap1, not batch1's
    # hashes).  The old-rows-first union means limit() would only see
    # covered hashes; the partition probe must still catch it.
    batch2 = spark.createDataFrame(
        [(2000, "fresh content 3"), (2001, "never seen")],
        "doc_id int, text string",
    )
    with pytest.raises(ValueError, match="stale bloom filter"):
        incremental_dedup(batch2, snap2, bloom=flt1)


@pytest.mark.slow
def test_incremental_minhash_band_bloom_identical_results(spark):
    """incremental_minhash_dedup(band_bloom=...) must return exactly the
    plain-path survivors, across two loop iterations with bloom_or
    maintenance over the band keys."""
    from datamunging_spark.operators.bloom import bloom_or
    from datamunging_spark.operators.dedup import (
        band_bloom_build,
        incremental_minhash_dedup,
        minhash_signatures_df,
    )

    def doc(i, tail=""):
        return (
            f"shared prefix words alpha beta gamma delta body {i} "
            f"epsilon zeta eta theta iota kappa {tail}"
        )

    hist = spark.createDataFrame(
        [(i, doc(i)) for i in range(80)], "doc_id int, text string"
    )
    hist_sig = minhash_signatures_df(hist).localCheckpoint()
    n_items = 1000 * 16  # sized for the loop's expected history
    bloom = band_bloom_build(hist_sig, num_items=n_items)

    batch1 = spark.createDataFrame(
        # near-dups of history (one word changed) + genuinely fresh docs
        [(1000 + i, doc(i, "extra")) for i in range(5)]
        + [
            (3000 + i, f"totally different novel content piece {i} "
                       f"unrelated to anything prior {i}")
            for i in range(40)
        ],
        "doc_id int, text string",
    )
    plain = incremental_minhash_dedup(batch1, hist_sig, threshold=0.5)
    fast = incremental_minhash_dedup(
        batch1, hist_sig, threshold=0.5, band_bloom=bloom
    )
    fast_rows = sorted(map(tuple, fast.collect()))
    assert fast_rows == sorted(map(tuple, plain.collect()))
    assert all(r[0] >= 3000 for r in fast_rows)  # near-dups all dropped

    # loop maintenance: fold survivors into snapshot AND filter
    surv_sig = minhash_signatures_df(fast).localCheckpoint()
    hist_sig2 = hist_sig.unionByName(surv_sig).localCheckpoint()
    bloom2 = bloom_or(bloom, band_bloom_build(surv_sig, num_items=n_items))
    batch2 = spark.createDataFrame(
        [(5000, "totally different novel content piece 7 "
                "unrelated to anything prior 7 suffix")]  # near-dup of b1
        + [(5001, "a really genuinely fresh second batch document body")],
        "doc_id int, text string",
    )
    plain2 = incremental_minhash_dedup(batch2, hist_sig2, threshold=0.5)
    fast2 = incremental_minhash_dedup(
        batch2, hist_sig2, threshold=0.5, band_bloom=bloom2
    )
    got = sorted(map(tuple, fast2.collect()))
    assert got == sorted(map(tuple, plain2.collect()))
    assert [r[0] for r in got] == [5001]


def test_incremental_minhash_stale_band_bloom_raises(spark):
    from datamunging_spark.operators.dedup import (
        band_bloom_build,
        incremental_minhash_dedup,
        minhash_signatures_df,
    )

    hist = spark.createDataFrame(
        [(i, f"history document body number {i} with several words")
         for i in range(40)],
        "doc_id int, text string",
    )
    hist_sig = minhash_signatures_df(hist).localCheckpoint()
    other_sig = minhash_signatures_df(
        spark.createDataFrame(
            [(i, f"unrelated corpus text {i} nothing in common")
             for i in range(40)],
            "doc_id int, text string",
        )
    ).localCheckpoint()
    stale = band_bloom_build(other_sig, num_items=2000)
    batch = spark.createDataFrame(
        [(100, "a new batch document")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="stale band bloom"):
        incremental_minhash_dedup(batch, hist_sig, band_bloom=stale)
    # verify=0 escape hatch still runs (and stays correct here only by
    # accident of this batch sharing nothing with history)
    incremental_minhash_dedup(
        batch, hist_sig, band_bloom=stale, band_bloom_verify=0
    ).collect()


def test_ingest_batch_forwards_band_bloom(spark):
    """ingest_batch(**dedup_kwargs) reaches the fuzzy pass when history
    exists and is harmlessly dropped on bootstrap."""
    from datamunging_spark.operators.dedup import (
        band_bloom_build,
        ingest_batch,
    )

    b1 = spark.createDataFrame(
        [(1, "first corpus document body with words"),
         (2, "second corpus document body other words")],
        "doc_id int, text string",
    )
    # bootstrap: band_bloom must be ignored without error
    surv1, snaps1 = ingest_batch(b1, None, band_bloom=None)
    assert surv1.count() == 2
    bloom = band_bloom_build(snaps1.signatures, num_items=1000)
    b2 = spark.createDataFrame(
        [(10, "first corpus document body with words"),   # exact dup
         (11, "a brand new third document body entirely")],
        "doc_id int, text string",
    )
    surv2, snaps2 = ingest_batch(b2, snaps1, band_bloom=bloom)
    assert [r.doc_id for r in surv2.collect()] == [11]


def test_bloom_build_rejects_bad_chunking(spark):
    # r10 ADVICE: chunk_id is IntegerType — a tiny chunk_bytes against a
    # >=16 GiB bitmap would wrap the CAST; both guards raise before any
    # Spark work runs.
    import pytest

    df = spark.createDataFrame([("a",)], "s string")
    with pytest.raises(ValueError, match="chunk_bytes"):
        bloom_build(df, ["s"], num_items=10, chunk_bytes=0)
    with pytest.raises(ValueError, match="IntegerType"):
        bloom_build(
            df, ["s"], num_items=20_000_000_000, chunk_bytes=8,
            method="shuffle",
        )
