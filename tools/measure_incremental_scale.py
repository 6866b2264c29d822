"""Measure incremental-ingest cost vs HISTORY size (SCALE.md probe).

The design claim of the continuous-ingest operators (dedup.incremental_dedup
and dedup.incremental_minhash_dedup) is that per-batch cost tracks BATCH
size, not history size: history participates only as slim snapshots — a
hash set for the exact pass, a signature table for the fuzzy pass — each
touched by one scan-side of an equi-join. If the claim holds, growing the
history snapshot 10x while holding the batch fixed should move wall-time by
the (small) extra scan cost only, nowhere near 10x.

Method: documents at sf0.1 (~5k docs) replicated K times with shifted ids
forms the history (K in {1, 10}); the batch is a FIXED 1,000-doc slice with
ids disjoint from history, 10% of which are exact copies and 10% near-dup
variants of history docs (so the anti-joins do real work). Snapshots are
materialized once (parquet-shaped via localCheckpoint) before timing, like
a production run where they are tables; timing covers exact + fuzzy dedup
end-to-end per batch, median of 3.

Output: markdown rows for SCALE.md.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.dedup import (
    content_snapshot,
    incremental_dedup,
    incremental_minhash_dedup,
    minhash_signatures_df,
)
from datamunging_spark.sources.io import load_table

SF_DIR = "/root/testdata/sf0.1"
BATCH_N = 1000
REPS = 3


def main() -> None:
    spark = get_spark("incremental-scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()

    # Fixed batch: 1000 docs with ids >= 10M (disjoint from any history
    # replica): 100 exact copies of history docs, 100 near-dups (token
    # appended), 800 fresh docs drawn from a disjoint id range.
    base = docs.filter(F.col("doc_id") < 100)
    copies = base.withColumn("doc_id", F.col("doc_id") + 10_000_000)
    nears = base.withColumn(
        "doc_id", F.col("doc_id") + 11_000_000
    ).withColumn("text", F.concat(F.col("text"), F.lit(" drift token")))
    fresh = (
        docs.filter(F.col("doc_id").between(100, 899))
        .withColumn("doc_id", F.col("doc_id") + 12_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" uniq suffix")))
    )
    batch = copies.union(nears).union(fresh).localCheckpoint()
    assert batch.count() == BATCH_N

    print(f"| history docs | snapshot build (s) | batch dedup median (s) | spread |")
    print("|---|---|---|---|")
    for k in (1, 10):
        hist = docs
        for i in range(1, k):
            hist = hist.union(
                docs.withColumn("doc_id", F.col("doc_id") + i * 100_000)
            )
        t0 = time.perf_counter()
        snap = content_snapshot(hist).localCheckpoint()
        sig = minhash_signatures_df(hist).localCheckpoint()
        build = time.perf_counter() - t0
        samples = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = incremental_dedup(batch, snap)
            out = incremental_minhash_dedup(out, sig, threshold=0.5)
            out.count()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        print(
            f"| {k * n_docs:,} | {build:.1f} | {med:.2f} | "
            f"[{min(samples):.2f}, {max(samples):.2f}] |"
        )

    # Bloom prefilter (r7): the scale-relevant number is how many batch
    # rows still reach the exact anti-join — wall-time at local sf is
    # overhead-bound either way. Expectation: ~200 (the planted dupes +
    # near-dups sharing history hashes... exact copies only) + fpp*800.
    from datamunging_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )
    from datamunging_spark.functions import normalize_text

    snap = content_snapshot(docs).localCheckpoint()
    bloom = bloom_build(snap, ["content_hash"], fpp=0.01)
    probed = batch.withColumn(
        "_h", F.md5(F.coalesce(normalize_text("text"), F.lit("")))
    )
    n_maybe = probed.filter(bloom_might_contain(bloom, "_h")).count()
    out_plain = incremental_dedup(batch, snap).count()
    out_bloom = incremental_dedup(batch, snap, bloom=bloom).count()
    print()
    print(
        f"Bloom prefilter: {n_maybe}/{BATCH_N} batch rows reach the "
        f"anti-join (rest are definitely-new); survivors "
        f"{out_bloom} == plain {out_plain}: {out_bloom == out_plain}"
    )

    # Band-bloom prefilter (r8): same trick one level up — the filter
    # holds the HISTORY BAND KEYS, and batch band rows it rejects skip
    # the history band join entirely. Scale-relevant number: fraction of
    # the batch's band rows that still probe the join.
    from datamunging_spark.operators.bloom import bloom_or  # noqa: F401
    from datamunging_spark.operators.dedup import (
        _band_rows,
        band_bloom_build,
    )

    # NOTE on the batch: the timing batch above is ~100% near-dup of
    # history BY CONSTRUCTION (its "fresh" docs are history texts with a
    # 2-word suffix — most of their 16 band keys still collide), which
    # is the prefilter's worst case. Report BOTH: that batch, and a
    # realistic crawl batch whose fresh docs are genuinely novel text.
    novel = (
        spark.range(800)
        .select(
            (F.col("id") + 13_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(20)),
                    lambda i: F.md5(
                        F.concat_ws("-", F.lit("novel"), F.col("id"), i)
                    ),
                ),
            ).alias("text"),
        )
    )
    batch_novel = (
        batch.filter(F.col("doc_id") < 12_000_000).union(novel)
    ).localCheckpoint()
    hist_sig_b = minhash_signatures_df(docs).localCheckpoint()
    band_bloom = band_bloom_build(hist_sig_b, fpp=0.01)
    for label, bdf in (("near-dup-heavy", batch), ("realistic", batch_novel)):
        sig_b = minhash_signatures_df(bdf).localCheckpoint()
        bands_b = _band_rows(sig_b, "doc_id", 64, 16)
        nb = bands_b.count()
        np_ = bands_b.filter(
            bloom_might_contain(band_bloom, "_b", "_k")
        ).count()
        print(
            f"Band-bloom probe fraction ({label} batch): {np_}/{nb} "
            f"band rows reach the history band join"
        )
    batch_sig = minhash_signatures_df(batch).localCheckpoint()
    batch_bands = _band_rows(batch_sig, "doc_id", 64, 16)
    n_bands = batch_bands.count()
    n_probe = batch_bands.filter(
        bloom_might_contain(band_bloom, "_b", "_k")
    ).count()
    s_plain = incremental_minhash_dedup(batch, hist_sig_b, threshold=0.7)
    s_fast = incremental_minhash_dedup(
        batch, hist_sig_b, threshold=0.7, band_bloom=band_bloom
    )
    same = sorted(map(tuple, s_fast.collect())) == sorted(
        map(tuple, s_plain.collect())
    )
    print(
        f"Band-bloom prefilter: {n_probe}/{n_bands} batch band rows reach "
        f"the history band join (rest cannot collide); survivors "
        f"byte-identical to plain path: {same}"
    )

    # Incremental span dedup (r7): same contract — per-batch cost must
    # track the batch + matched candidates, not history size. History
    # text is fetched by keyed join for candidate docs only, so 10x
    # history grows only the fingerprint-join probe side.
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
        winnow_fingerprints,
    )

    print()
    print("| span history docs | snapshot fps | batch spans | median (s) |")
    print("|---|---|---|---|")
    for k in (1, 10):
        hist = docs
        for i in range(1, k):
            hist = hist.union(
                docs.withColumn("doc_id", F.col("doc_id") + i * 100_000)
            )
        hist = hist.localCheckpoint()
        fps = winnow_fingerprints(hist, gram=24).localCheckpoint()
        n_fps = fps.count()
        samples = []
        n_spans = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            n_spans = incremental_shared_spans(
                batch, fps, hist, gram=24
            ).count()
            samples.append(time.perf_counter() - t0)
        print(
            f"| {k * n_docs:,} | {n_fps:,} | {n_spans:,} | "
            f"{statistics.median(samples):.2f} |"
        )


if __name__ == "__main__":
    main()
