"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line (driver contract; slots in BASELINE.md).

Each query executes end-to-end (scan → plan → action); results land in a
count() so timings measure execution, not driver-side row transfer.

Per-query timing is the MEDIAN of $SPARK_GRAFT_BENCH_REPS (default 3)
back-to-back executions, with the min/max spread recorded alongside.
Single-sample timings are measurement noise, not signal: rounds 3 and 4
both committed phantom multi-x "regressions" on byte-identical code
because a query's one measured execution happened to pay KMeans-fit /
codegen warmup (e.g. x2_ann_lsh run 1 = 4.7 s vs runs 2-3 = 1.0 s).
The median of three absorbs exactly that first-run outlier.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from datamunging_spark import get_spark

# r13: x1_content_hash (0.15 s) and x2_sq8_roundtrip (0.19 s) retired
# from the bench list to fit the driver's ~2000-char tail capture as the
# retrieval entries landed (the contract line was at 1862/1900 chars).
# Both are single-expression ops with pytest coverage and flat history
# (r6-r12); their q_* functions remain callable.
# r15: x5_chunk_documents (0.33 s, one posexplode expression) and
# x6_blocking_report (0.21 s, one groupBy profile) retired the same way
# (pytest-covered, flat r5-r14 history, q_* still callable) to fund the
# round's two composites: x2_ivf_advance (persisted vector store,
# advance + search — the x2_bm25_persisted twin) and x2_hybrid_snippets
# (RRF fusion through hit_windows + snippets, the full serve path).
BENCH_QUERIES = [
    "r13_count",
    "r14_group_count",
    "r16_percentile_bucket",
    "r12_join_agg",
    "pricing_summary",
    "top_revenue_orders",
    "window_topk",
    "r26_sample_bernoulli",
    "x1_minhash_pairs",
    "x1_simhash",
    "x1_span_dedup",
    "x1_incremental_span",
    "x1_embedding_neardup",
    "x2_topk_cosine",
    "x2_ann_lsh",
    "x2_ann_ivf",
    "x4_text_suite",
    "x3_media_features",
    "r33_tfidf",
    "local_supplier_volume",
    "grouping_suite",
    "range_join_bands",
    "promo_revenue",
    "sessionize_events",
    "asof_join",
    "x1_ngram_jaccard",
    "x_curation_full",
    "x5_decontaminate",
    "x5_source_mix",
    "x5_train_shuffle",
    "x5_pack_sequences",
    "x5_token_budget",
    "x1_paragraph_dedup",
    "x1_incremental_dedup",
    "x1_ingest_cycle",
    "x1_url_dedup",
    "x4_gopher_gates",
    "x4_census",
    "x4_lm_quality",
    "x4_doc_quality",
    "x4_bigram_lm",
    "x1_semantic_dedup",
    "x2_pq_topk",
    "reshape_suite",
    "gap_fill",
    "x6_entity_resolution",
    "x6_er_pipeline",
    "x6_snapshot_history",
    "x6_scd2_apply",
    "x6_extract_changelog",
    "x4_vocab",
    "x7_event_suite",
    "x8_heavy_hitters",
    "x8_distinct_users",
    "x1_strip_boilerplate",
    "x4_lang_model",
    "x8_quantiles",
    "x8_grouped_sketch",
    "x5_packed_windows",
    "x5_dsir_select",
    "x1_minhash_portable",
    "x3_phash_neardup",
    "x3_incremental_phash",
    "x1_span_portable",
    "x5_split_shuffle",
    "x2_bm25_hybrid",
    "x2_boolean",
    "x2_bm25_persisted",
    "x2_ivf_advance",
    "x2_hybrid_snippets",
    "x2_bm25f",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Warm the JVM/codegen path once so per-query numbers measure steady state.
    entrymod.q_r13_count(spark, sf_dir).count()

    def _cpu_sample():
        # r17 (verdict item 7): record hypervisor-steal evidence per
        # query in the side artifact so machine-phase adjudication of
        # flagged timings is mechanical (steal vs busy jiffy deltas),
        # not narrative. Passive read; the timing methodology (median
        # of reps of fn().count()) is unchanged.
        try:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()
            v = [int(x) for x in parts[1:9]]
            # busy = user+nice+system+irq+softirq; steal = field 8
            return v[0] + v[1] + v[2] + v[5] + v[6], v[7]
        except OSError:
            return None

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    steal: dict[str, list[int]] = {}
    for name in BENCH_QUERIES:
        # Bench-only queries (retired from the 50-entry gate) resolve to
        # their module-level q_* function.
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        samples = []
        cpu0 = _cpu_sample()
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        cpu1 = _cpu_sample()
        if cpu0 and cpu1:
            # [busy_jiffies, steal_jiffies] across this query's reps
            steal[name] = [cpu1[0] - cpu0[0], cpu1[1] - cpu0[1]]
        # 2 decimals (10 ms) on the contract line: 68 entries at 4
        # decimals broke the driver's ~2000-char tail capture in r12;
        # full precision lives in BENCH_DETAIL.json's spread
        timings[name] = round(statistics.median(samples), 2)
        spread[name] = [round(min(samples), 4), round(max(samples), 4)]

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # The driver captures only the TAIL of stdout (~2000 chars) and parses
    # the final JSON line; round 5's line with the inline spread dict grew
    # past that and recorded parsed=null. Keep the contract line compact
    # and put the per-query min/max spread in a side artifact instead
    # (tools/gen_baseline_table.py folds it into BASELINE.md).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_DETAIL.json"),
        "w",
    ) as fh:
        json.dump(
            {**line, "spread": spread, "cpu_busy_steal": steal}, fh,
            indent=1,
        )
    out = json.dumps(line)
    assert len(out) < 1900, f"bench line too long for driver tail capture: {len(out)}"
    print(out)


if __name__ == "__main__":
    main()
