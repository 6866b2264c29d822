"""Round-8 span-dedup probes for SCALE.md.

1. **Fingerprint reuse** (VERDICT r7 item 1): incremental_span_dedup's
   within-batch pass reuses the history pass's batch fingerprints and
   re-winnows ONLY the docs the history pass cut. Probe: a fat-text
   batch (winnowing-dominated regime — the 100 TB regime, where text
   mass per doc is KBs, unlike the 300-char sf tables) with ~10% of
   docs sharing a history span; time the shipped single-winnow path vs
   the naive re-winnow-everything composition. Expected: the naive path
   pays one extra full-batch Arrow winnow; the shipped path pays ~10%
   of it.

2. **Hostile boilerplate valve pricing** (VERDICT r7 item 8): SCALE.md's
   10x probe rotates copies so content is disjoint; the hostile case is
   every doc sharing ONE template. The ``max_fp_df`` valve drops any
   fingerprint hotter than the setting, so a template present in ALL n
   docs is dropped whenever n > max_fp_df — its spans go 100% undetected
   (the documented trade) while genuine pairwise duplicates (df=2) are
   still fully detected. Unvalved, the same corpus generates n(n-1)/2
   candidate pairs — the quadratic cost the valve exists to cut. The
   table prints (setting, wall, spans, template cuts found, pairwise
   cuts found) so the practice matches the docstring's theory.

Usage: python tools/measure_span_probes.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    print(f"| {label} | {n} | {best:.2f} |")
    return best


def synth_docs(spark, n, chars, seed_tag):
    """n docs of ~``chars`` chars of doc-unique text (md5-expanded — no
    cross-doc sharing)."""
    reps = max(1, chars // 32)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(reps - 1)),
                lambda i: F.md5(
                    F.concat_ws("-", F.lit(seed_tag), F.col("id"), i)
                ),
            ),
        ).alias("text"),
    )


def _span(tag, key):
    """A ~128-char span unique to (tag, key) — df=2 when planted twice."""
    return F.repeat(F.md5(F.concat_ws("-", F.lit(tag), key.cast("string"))), 4)


def fp_reuse_probe(spark):
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
        incremental_span_dedup,
        remove_shared_spans,
        span_dedup,
        winnow_fingerprints,
    )

    print("\n### Probe 1: within-batch fingerprint reuse (fat-text batch)")
    print("| path | rows | best-of-2 s |")
    print("|---|---|---|")
    # 200 history docs / 2000 batch docs x ~24 KB. Every planted span is
    # UNIQUE to its pair (df=2 — survives the default max_fp_df valve):
    # 10% of batch docs share a span with one history doc; 2% of batch
    # docs form within-batch dup pairs.
    hist = (
        synth_docs(spark, 200, 24_000, "hist")
        .withColumn("text", F.concat("text", _span("h", F.col("doc_id"))))
        .localCheckpoint()
    )
    batch = (
        synth_docs(spark, 2000, 24_000, "batch")
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                # shares history doc ((doc_id/10) % 200)'s span
                F.concat(
                    "text",
                    _span("h", (F.col("doc_id") / 10).cast("long") % 200),
                ),
            )
            .when(
                # docs 1_000_0k1 and 1_000_0k51 pair up within the batch
                (F.col("doc_id") % 100).isin(1, 51),
                F.concat(
                    "text",
                    _span("w", (F.col("doc_id") / 100).cast("long")),
                ),
            )
            .otherwise(F.col("text")),
        )
        .localCheckpoint()
    )
    hist_fps = winnow_fingerprints(hist).localCheckpoint()

    timed(
        "shipped: reuse uncut fps, re-winnow cut docs only",
        lambda: incremental_span_dedup(batch, hist_fps, hist).count(),
    )

    def naive():
        spans = incremental_shared_spans(
            batch, hist_fps, hist
        ).localCheckpoint()
        cleaned = remove_shared_spans(batch, spans)
        return span_dedup(cleaned).count()

    timed("naive: full re-winnow of cleaned batch", naive)


def hostile_boilerplate_probe(spark):
    from datamunging_spark.operators.spandedup import span_dedup

    print("\n### Probe 2: hostile universal-boilerplate corpus vs max_fp_df")
    n = 600
    # non-periodic (a repeated unit would yield extra off-diagonal spans
    # per pair) and length-distinct from the 192-char pairwise spans
    template = (
        "this universal template footer appears verbatim in every single "
        "document of the hostile corpus and a naive detector drowns in it."
    )
    # every doc: unique filler + TEMPLATE + unique filler; docs
    # (i, i+300) for i < 30 additionally share a genuine pairwise span
    pair_tag = F.col("doc_id") % 300
    docs = (
        synth_docs(spark, n, 600, "host")
        .withColumn(
            "text",
            F.concat(
                F.substring("text", 1, 300),
                F.lit(template),
                F.substring("text", 301, 300),
            ),
        )
        .withColumn(
            "text",
            F.when(
                pair_tag < 30,
                # 6x md5 = 192 chars, length-distinct from the template
                F.concat(
                    "text",
                    F.repeat(
                        F.md5(F.concat(F.lit("p"), pair_tag.cast("string"))),
                        6,
                    ),
                ),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint()
    )
    total_template_cuts = n - 1  # keep="first": every later doc loses it
    total_pair_cuts = 30  # the later copy of each planted pair
    tpl_len = len(template)

    print(
        "| max_fp_df | wall s | spans | template cuts (of "
        f"{total_template_cuts}) | pairwise cuts (of {total_pair_cuts}) |"
    )
    print("|---|---|---|---|---|")
    for valve in (64, 256, 1024, None):
        t0 = time.perf_counter()
        rows = span_dedup(docs, max_fp_df=valve, _return_spans=True)[
            1
        ].collect()
        w = time.perf_counter() - t0
        # template spans sit at the template's length (~130); pairwise
        # spans at 192 — length-distinct by construction
        tpl_cut = len(
            {r.doc_b for r in rows if abs(r.length - tpl_len) <= 8}
        )
        pair_cut = len(
            {
                (r.doc_a, r.doc_b)
                for r in rows
                if abs(r.length - 192) <= 8
            }
        )
        print(
            f"| {valve} | {w:.2f} | {len(rows)} | {tpl_cut} | {pair_cut} |"
        )


def strip_boilerplate_probe(spark):
    """The r9 answer to probe 2: report-then-strip on the SAME hostile
    corpus — full template removal at linear cost, vs the valved
    detector's 107/599 and the unvalved detector's quadratic pair
    table."""
    from datamunging_spark.operators.spandedup import (
        boilerplate_templates,
        strip_boilerplate,
    )

    print("\n### Probe 3 (r9): report-then-strip on the probe-2 corpus")
    n = 600
    template = (
        "this universal template footer appears verbatim in every single "
        "document of the hostile corpus and a naive detector drowns in it."
    )
    pair_tag = F.col("doc_id") % 300
    docs = (
        synth_docs(spark, n, 600, "host")
        .withColumn(
            "text",
            F.concat(
                F.substring("text", 1, 300),
                F.lit(template),
                F.substring("text", 301, 300),
            ),
        )
        .withColumn(
            "text",
            F.when(
                pair_tag < 30,
                F.concat(
                    "text",
                    F.repeat(
                        F.md5(F.concat(F.lit("p"), pair_tag.cast("string"))),
                        6,
                    ),
                ),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint()
    )
    # warm + 3 reps, report median
    walls = []
    for _ in range(4):
        t0 = time.perf_counter()
        rep = boilerplate_templates(docs, min_df=0.5).localCheckpoint()
        stripped = strip_boilerplate(docs, rep)
        residual = stripped.filter(
            F.col("text").contains(template)
        ).count()
        walls.append(time.perf_counter() - t0)
    walls = sorted(walls[1:])
    tpls = [r["template"] for r in rep.collect()]
    print(f"| mode | wall (s) | templates mined | template cuts (of {n}) |")
    print("|---|---|---|---|")
    print(
        f"| mine+verify+strip | {walls[1]:.2f} | {len(tpls)} "
        f"| {n - residual} |"
    )
    assert tpls == [template], tpls
    assert residual == 0


def strip_mode_cost_probe(spark):
    """r10: strip cost vs template count — the replace chain rescans
    every char once per template (linear in templates), the Aho-Corasick
    pass scans each char once regardless (build cost is driver-side,
    amortized over the corpus). This is the measurement behind
    strip_mode='auto' switching to the automaton above the replace cap."""
    from datamunging_spark.operators.spandedup import strip_boilerplate

    print("\n### Probe 6 (r10): replace chain vs automaton strip "
          "cost by template count")
    n = 600
    planted = [
        f"planted boilerplate template variant {i:04d} long enough here"
        for i in range(8)
    ]
    docs = (
        synth_docs(spark, n, 1200, "stripcost")
        .withColumn(
            "text",
            F.concat(
                F.substring("text", 1, 600),
                F.element_at(
                    F.array(*[F.lit(p) for p in planted]),
                    (F.col("doc_id") % 8 + 1).cast("int"),
                ),
                F.substring("text", 601, 600),
            ),
        )
        .localCheckpoint()
    )
    print("| templates | replace chain (s) | automaton (s) |")
    print("|---|---|---|")
    for n_tpl in (64, 1024, 4096):
        # planted templates + absent filler templates up to n_tpl —
        # the blocklist shape: most patterns never occur
        tpls = planted + [
            f"absent blocklist template number {i:05d} padded out long"
            for i in range(n_tpl - len(planted))
        ]
        walls = {}
        for mode in ("replace", "automaton"):
            if mode == "replace" and n_tpl > 1024:
                walls[mode] = float("nan")
                continue
            ws = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = strip_boilerplate(docs, tpls, strip_mode=mode)
                res = out.filter(
                    F.col("text").contains(planted[0])
                ).count()
                ws.append(time.perf_counter() - t0)
                assert res == 0
            walls[mode] = sorted(ws)[1]
        print(
            f"| {n_tpl} | {walls['replace']:.2f} "
            f"| {walls['automaton']:.2f} |"
        )


def streaming_span_delta_probe(spark):
    """r9 bounded streaming span state: per-fold disk written by the
    delta log vs the counterfactual full-state rewrite (the pre-r9
    behavior: whole accumulated survivor corpus + fp table per
    version)."""
    import os
    import shutil
    import tempfile

    from datamunging_spark.streaming import streaming_ingest

    print("\n### Probe 4 (r9): streaming span-state delta log, bytes/fold")
    work = tempfile.mkdtemp(prefix="span_delta_probe_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    n_batches, per_batch = 6, 50
    for b in range(n_batches):
        synth_docs(spark, per_batch, 600, f"b{b}").select(
            (F.col("doc_id") + b * per_batch).alias("doc_id"), "text"
        ).coalesce(1).write.parquet(os.path.join(src, f"f{b}"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    snaps = os.path.join(work, "snaps")
    streaming_ingest(
        stream,
        survivors_path=os.path.join(work, "surv"),
        checkpoint_path=os.path.join(work, "ckpt"),
        snapshots_path=snaps,
        threshold=0.9,
        span=True,
    )

    def dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(p)
            for f in fs
        )

    print("| fold | span delta bytes (r9) | full-state bytes (pre-r9 rewrite) |")
    print("|---|---|---|")
    cum = 0
    for i, v in enumerate(sorted(os.listdir(snaps))):
        vp = os.path.join(snaps, v)
        delta = sum(
            dir_bytes(os.path.join(vp, d))
            for d in ("span_fps_delta", "span_texts_delta", "span_fps",
                      "span_texts")
            if os.path.isdir(os.path.join(vp, d))
        )
        cum += delta
        print(f"| {i} | {delta:,} | {cum:,} |")
    shutil.rmtree(work)


def sketch_valve_probe(spark):
    """r9 valve='sketch' pricing on the probe-2 hostile corpus: detection
    outcome + the exchanged rows of the hot-key detection itself
    (exact valve = one row per distinct fp; sketch = bounded summary)."""
    from datamunging_spark.operators.spandedup import (
        span_dedup,
        winnow_fingerprints,
    )

    print("\n### Probe 5 (r9): exact vs sketch valve on the probe-2 corpus")
    n = 600
    template = (
        "this universal template footer appears verbatim in every single "
        "document of the hostile corpus and a naive detector drowns in it."
    )
    pair_tag = F.col("doc_id") % 300
    docs = (
        synth_docs(spark, n, 600, "host")
        .withColumn(
            "text",
            F.concat(
                F.substring("text", 1, 300),
                F.lit(template),
                F.substring("text", 301, 300),
            ),
        )
        .withColumn(
            "text",
            F.when(
                pair_tag < 30,
                F.concat(
                    "text",
                    F.repeat(
                        F.md5(F.concat(F.lit("p"), pair_tag.cast("string"))),
                        6,
                    ),
                ),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint()
    )
    fps = winnow_fingerprints(docs)
    distinct_fps = fps.select("fp").distinct().count()
    parts = fps.rdd.getNumPartitions()
    tpl_len = len(template)
    print(
        "| valve | k | detector rows exchanged | wall (s) | spans "
        "| template cuts (of 599) | pairwise cuts (of 30) |"
    )
    print("|---|---|---|---|---|---|---|")
    for valve, k in (("exact", None), ("sketch", 4096), ("sketch", 256)):
        t0 = time.perf_counter()
        rows = span_dedup(
            docs, max_fp_df=64, valve=valve,
            **({"valve_k": k} if k else {}),
            _return_spans=True,
        )[1].collect()
        w = time.perf_counter() - t0
        tpl_cut = len(
            {r.doc_b for r in rows if abs(r.length - tpl_len) <= 8}
        )
        pair_cut = len(
            {(r.doc_a, r.doc_b) for r in rows if abs(r.length - 192) <= 8}
        )
        exch = (
            f"{distinct_fps:,} (= distinct fps)"
            if valve == "exact"
            else f"<= {parts * (k + 2):,} (partitions x (k+2))"
        )
        print(
            f"| {valve} | {k or '—'} | {exch} | {w:.2f} | {len(rows)} "
            f"| {tpl_cut} | {pair_cut} |"
        )


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fp_reuse_probe(spark)
    hostile_boilerplate_probe(spark)
    strip_boilerplate_probe(spark)
    strip_mode_cost_probe(spark)
    streaming_span_delta_probe(spark)
    sketch_valve_probe(spark)


if __name__ == "__main__":
    main()
