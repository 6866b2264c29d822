"""Regenerate BASELINE.md's bench table from the bench artifact.

Round 5's table was hand-run mid-round and drifted from the committed
BENCH_r05.json on several medians; round 6's table was generated from an
earlier BENCH_DETAIL.json and drifted from the FINAL committed
BENCH_r06.json total (58.12 vs 53.14 s). The durable fix: the default
source is now the latest driver-committed ``BENCH_r{N}.json`` — the
normative artifact — not whatever BENCH_DETAIL.json a mid-round local
run left behind; the header names the source file; and after writing,
the tool re-reads the table and fails if its total differs from the
source artifact's total (so the table can never silently disagree with
the artifact it claims to render).

Usage:
    python tools/gen_baseline_table.py            # from latest BENCH_r*.json
    python tools/gen_baseline_table.py path.json  # from a specific artifact
                                                  # (BENCH_DETAIL or BENCH_r*)
    python tools/gen_baseline_table.py path.json prev.json  # explicit
                                                  # comparison baseline

The normalized-delta baseline (r16, per the r15 verdict's "two competing
baselines" finding): an explicit second argument wins; otherwise the
committed ``BENCH_anchor.json`` — the working bands, a verified-quiet
clean run promoted to an artifact — is used when present; only without
an anchor does the tool fall back to the previous round's driver
artifact (which may be a drifted-box run). This makes the Δ column and
the flag-adjudication bands the same numbers by construction.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BENCH_TABLE_BEGIN (tools/gen_baseline_table.py) -->"
END = "<!-- BENCH_TABLE_END -->"

# Display annotations per query: (description, reference column). Queries
# missing here still get a row — the table is driven by the artifact, not
# by this map.
NOTES: dict[str, tuple[str, str]] = {
    "r13_count": ("R13 global count", "24.583 (733k rows)"),
    "r14_group_count": ("README.md:126-132 shape", "—"),
    "r16_percentile_bucket": ("README.md:237-261 flagship", "—"),
    "r12_join_agg": ("customer×nation×region", "—"),
    "pricing_summary": ("TPC-H Q1-shaped", "—"),
    "top_revenue_orders": ("TPC-H Q3-shaped", "—"),
    "window_topk": ("top-3 orders per customer", "—"),
    "r26_sample_bernoulli": ("portable 20% sample", "—"),
    "x1_content_hash": ("X1 exact dedup hash", "—"),
    "x1_minhash_pairs": ("X1 MinHash-LSH candidates", "—"),
    "x1_simhash": ("X1 SimHash, 5000 docs", "—"),
    "x1_span_dedup": (
        "X1 exact-substring span dedup + residual invariant (winnowing "
        "fp join, added r7)",
        "—",
    ),
    "x1_incremental_span": (
        "X1+ span dedup vs history fp snapshot, added r7",
        "—",
    ),
    "x1_embedding_neardup": ("X1 embedding-cosine", "—"),
    "x2_topk_cosine": ("X2 brute-force top-k", "—"),
    "x2_ann_lsh": ("X2 ANN, 16 hyperplane tables", "—"),
    "x2_ann_ivf": ("X2 ANN, 16 IVF cells, 8-probe", "—"),
    "x4_text_suite": ("X4 one-scan stats+lang+quality+fp", "—"),
    "x3_media_features": ("mapInPandas extract", "—"),
    "r33_tfidf": ("R33/34 exact TF-IDF", "—"),
    "local_supplier_volume": ("TPC-H Q5-shaped 6-table join", "—"),
    "grouping_suite": ("rollup+cube", "—"),
    "range_join_bands": ("bucketed range join", "—"),
    "promo_revenue": ("TPC-H Q14-shaped", "—"),
    "sessionize_events": ("session_window", "—"),
    "asof_join": ("", "—"),
    "x1_ngram_jaccard": ("gram equi-join, 25 planted pairs", "—"),
    "x_curation_full": (
        "X1+X4 pipeline incl. CC survivor",
        "— (r6: CC materializes the pair plan once — was twice)",
    ),
    "x5_decontaminate": ("5-gram collision, broadcast", "—"),
    "x5_source_mix": ("weighted mixing", "—"),
    "x5_train_shuffle": ("range exchange", "—"),
    "x5_pack_sequences": ("BFD applyInPandas + invariant check", "—"),
    "x5_token_budget": ("two-pass distributed cumsum", "—"),
    "x1_paragraph_dedup": ("C4 line dedup", "—"),
    "x5_chunk_documents": ("overlapping token windows, added r5", "—"),
    "x1_incremental_dedup": (
        "exact+fuzzy vs history snapshots, added r5",
        "— (composite: history anti-join + two LSH scoring rounds + CC; "
        "batch signed once)",
    ),
    "x1_ingest_cycle": (
        "full ingest_batch incl. snapshot roll-forward, added r6",
        "— (the incremental composite plus advance_snapshot, one signing)",
    ),
    "x1_url_dedup": ("canonical-URL dedup, synthesized variants", "—"),
    "x4_gopher_gates": (
        "full Gopher rule set: word + repetition halves",
        "—",
    ),
    "x4_census": ("per-source corpus census", "—"),
    "x4_lm_quality": (
        "unigram-LM score + per-source CCNet bands",
        "—",
    ),
    "x1_semantic_dedup": (
        "SemDeDup incl. residual invariant (IVF build dominates)",
        "—",
    ),
    "x2_pq_topk": (
        "PQ fit+encode+ADC search composite",
        "—",
    ),
    "x2_sq8_roundtrip": (
        "SQ8 quantize+dequantize, in-query scale/2 error invariant",
        "—",
    ),
    "x6_snapshot_history": (
        "diff + SCD-2 + CDC apply round-trip + point-in-time lookup",
        "—",
    ),
    "x4_vocab": ("top-500 vocab + OOV coverage", "—"),
    "x4_doc_quality": (
        "full per-doc quality audit (profile+Gopher+LM bands), added r7",
        "—",
    ),
    "x4_bigram_lm": ("interpolated uni+bigram LM score, added r7", "—"),
    "x6_scd2_apply": ("incremental SCD-2 one-snapshot step, added r7", "—"),
    "x6_extract_changelog": ("republish→CDC diff, added r7", "—"),
    "x6_blocking_report": ("blocking-key profile, added r7", "—"),
    "x7_event_suite": (
        "funnel + cohort retention + interval-overlap join",
        "—",
    ),
    "x8_heavy_hitters": (
        "Misra-Gries frequent words + exact bracket check, added r8",
        "—",
    ),
    "x8_distinct_users": (
        "per-key HLL distinct counts + exact cross-check, added r8",
        "—",
    ),
    "x8_grouped_sketch": (
        "grouped MG + quantile faces, per-key recount brackets, added r11",
        "—",
    ),
}


#: Normalized slowdown ratio above which a query is flagged, AND the
#: absolute (normalized) seconds it must have grown by — both must hold,
#: so sub-second queries cannot be flagged by scheduler jitter.
REGRESSION_RATIO = 1.30
REGRESSION_ABS_S = 0.40


def machine_factor(cur: dict, prev: dict) -> float | None:
    """Cross-run machine/noise factor: the MEDIAN over common queries of
    (current median / previous median). Identical code on a uniformly
    ~10% slower machine yields factor ≈ 1.1 and zero flags; a single
    genuinely regressed query barely moves the median. More robust than
    the r13_count yardstick alone (a bare count's median swings several
    × with JVM warmth), and fully deterministic from the two artifacts —
    re-running the comparison reproduces the same regression list."""
    import statistics

    common = [
        cur["queries"][q] / prev["queries"][q]
        for q in cur["queries"]
        if q in prev["queries"] and prev["queries"][q] > 0
    ]
    return round(statistics.median(common), 4) if common else None


def normalized_deltas(cur: dict, prev: dict) -> tuple[float | None, dict]:
    """Per-query normalized delta vs the previous artifact. Returns
    (factor, {query: (norm_ratio, norm_abs_delta_s, flagged)}) where
    norm_ratio = (cur/prev)/factor — >1 means slower than the machine
    drift explains."""
    f = machine_factor(cur, prev)
    out = {}
    if f is None or f <= 0:
        return f, out
    for q, med in cur["queries"].items():
        p = prev["queries"].get(q)
        if not p:
            continue
        ratio = (med / p) / f
        abs_d = med / f - p
        out[q] = (
            ratio,
            abs_d,
            ratio > REGRESSION_RATIO and abs_d > REGRESSION_ABS_S,
        )
    return f, out


def render(detail: dict, source: str, prev: dict | None,
           prev_source: str | None) -> str:
    factor, deltas = (None, {})
    if prev is not None:
        factor, deltas = normalized_deltas(detail, prev)
    head = (
        f"Generated from `{source}` (reps={detail.get('reps')}, "
        f"sf={detail.get('sf')}, total={detail.get('value')} s) — do not "
        "hand-edit; rerun `python tools/gen_baseline_table.py` after the "
        "round artifact lands."
    )
    if factor is not None:
        flagged = sorted(q for q, d in deltas.items() if d[2])
        head += (
            f" Δ column: per-query slowdown vs `{prev_source}` divided by "
            f"the cross-run machine factor {factor:.2f} (median ratio over "
            "common queries — identical code on a slower machine shows "
            "factor > 1 and Δ ≈ 1.0); **flagged** when Δ > "
            f"{REGRESSION_RATIO} AND the normalized growth exceeds "
            f"{REGRESSION_ABS_S} s. Flagged: "
            + (", ".join(flagged) if flagged else "none")
            + "."
        )
    lines = [
        BEGIN,
        head,
        "",
        "| query | median (s) | [min, max] | Δ norm | reference (Hive-on-Tez) |",
        "|---|---|---|---|---|",
    ]
    spread = detail.get("spread", {})
    for name, med in detail["queries"].items():
        desc, ref = NOTES.get(name, ("", "—"))
        label = f"{name} ({desc})" if desc else name
        lo_hi = spread.get(name)
        rng = f"[{lo_hi[0]:.2f}, {lo_hi[1]:.2f}]" if lo_hi else "—"
        d = deltas.get(name)
        dcol = "—" if d is None else (
            f"**{d[0]:.2f}×**" if d[2] else f"{d[0]:.2f}×"
        )
        lines.append(f"| {label} | {med:.2f} | {rng} | {dcol} | {ref} |")
    lines.append(END)
    return "\n".join(lines)


def round_artifacts() -> list[str]:
    """Driver-committed BENCH_r{N}.json paths, newest first."""
    found = []
    for name in os.listdir(REPO):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", name)
        if m:
            found.append((int(m.group(1)), name))
    return [os.path.join(REPO, n) for _, n in sorted(found, reverse=True)]


def latest_round_artifact() -> str | None:
    arts = round_artifacts()
    return arts[0] if arts else None


def load_detail(src: str) -> dict:
    """Accept either bench.py's BENCH_DETAIL shape or the driver's
    BENCH_r{N}.json wrapper (contract line under ``parsed``)."""
    with open(src) as fh:
        data = json.load(fh)
    return data["parsed"] if "parsed" in data else data


def main() -> None:
    if len(sys.argv) > 1:
        src = sys.argv[1]
    else:
        src = latest_round_artifact() or os.path.join(
            REPO, "BENCH_DETAIL.json"
        )
    detail = load_detail(src)
    # normalized-delta baseline: explicit arg > committed anchor run >
    # newest BENCH_r*.json that is not the source itself (see module
    # docstring — the anchor IS the working bands)
    prev, prev_src = None, None
    anchor = os.path.join(REPO, "BENCH_anchor.json")
    if len(sys.argv) > 2:
        prev, prev_src = (
            load_detail(sys.argv[2]), os.path.basename(sys.argv[2])
        )
    elif os.path.exists(anchor) and \
            os.path.abspath(anchor) != os.path.abspath(src):
        prev, prev_src = load_detail(anchor), "BENCH_anchor.json"
    else:
        for cand in round_artifacts():
            if os.path.abspath(cand) != os.path.abspath(src):
                prev, prev_src = load_detail(cand), os.path.basename(cand)
                break
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as fh:
        doc = fh.read()
    table = render(detail, os.path.basename(src), prev, prev_src)
    pattern = re.compile(
        re.escape(BEGIN) + r".*?" + re.escape(END), flags=re.S
    )
    if pattern.search(doc):
        doc = pattern.sub(lambda _: table, doc)
    else:
        raise SystemExit(
            f"BASELINE.md is missing the {BEGIN!r} / {END!r} markers; "
            "add them around the bench table once, then rerun"
        )
    with open(path, "w") as fh:
        fh.write(doc)
    # Self-check: the written table's total must equal the artifact's —
    # the r6 drift class (table rendered from a different run than the
    # committed artifact) fails loudly here.
    with open(path) as fh:
        written = fh.read()
    m = re.search(r"total=([0-9.]+) s", written)
    if not m or float(m.group(1)) != float(detail["value"]):
        raise SystemExit(
            f"table total {m and m.group(1)} != artifact total "
            f"{detail['value']} from {src} — regenerate, do not hand-edit"
        )
    print(f"wrote {len(detail['queries'])} rows from {src} into {path}")


if __name__ == "__main__":
    main()
