"""Span-level exact-substring dedup (Lee et al. 2022 family) — planted
shared spans must be detected at the winnowing guarantee boundary and
cut from the right copies."""

import pytest

from datamunging_spark.operators.spandedup import (
    remove_shared_spans,
    shared_span_pairs,
    span_dedup,
    winnow_fingerprints,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# Distinct filler so unrelated docs share no qualifying span; each ends
# in a DISTINCT character so maximal extension stops exactly at the
# planted boundary (a common trailing space would legitimately extend
# the span one char left).
A = "alpha bravo charlie delta echo foxtrot golf hotel india juliett."
B = "kilo lima mike november oscar papa quebec romeo sierra tango,"
C = "uniform victor whiskey xray yankee zulu one two three four five;"
D = "six seven eight nine ten eleven twelve thirteen fourteen fifteen:"
E = "sixteen seventeen eighteen nineteen twenty twentyone twentytwo?"
SHARED = "this exact licensed boilerplate sentence repeats verbatim!"  # 58


def test_planted_span_detected_with_offsets(spark):
    df = _mk(spark, [(1, A + SHARED + B), (2, C + SHARED + D)])
    spans = shared_span_pairs(df, min_span=50).collect()
    assert len(spans) == 1
    s = spans[0]
    assert (s.doc_a, s.doc_b) == (1, 2)
    assert s.start_a == len(A) and s.start_b == len(C)
    assert s.length == len(SHARED)


def test_guarantee_boundary(spark):
    """A shared span of EXACTLY min_span chars must be detected (the
    winnowing guarantee t = w + gram - 1 = min_span); one char below
    must not be reported."""
    exact = SHARED[:50]
    df = _mk(spark, [(1, A + exact + B), (2, C + exact)])
    got = shared_span_pairs(df, min_span=50).collect()
    assert len(got) == 1 and got[0].length == 50

    below = SHARED[:49]
    df2 = _mk(spark, [(1, A + below + B), (2, C + below)])
    assert shared_span_pairs(df2, min_span=50).count() == 0


def test_span_dedup_keep_first_and_none(spark):
    df = _mk(
        spark,
        [(1, A + SHARED + B), (2, C + SHARED + D), (3, E)],
    )
    first = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert SHARED in first[1]  # earliest copy survives
    assert SHARED not in first[2]
    assert first[2] == C + D  # cut is exact, neighbors intact
    assert first[3] == E  # untouched doc unchanged

    none = {r.doc_id: r.text for r in span_dedup(df, keep="none").collect()}
    assert SHARED not in none[1] and SHARED not in none[2]
    assert none[1] == A + B


def test_three_way_clique_keeps_earliest_only(spark):
    df = _mk(
        spark,
        [(1, A + SHARED), (2, B + SHARED), (3, C + SHARED + " tail here")],
    )
    out = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert SHARED in out[1]
    assert SHARED not in out[2] and SHARED not in out[3]
    # residual invariant: no qualifying span survives between any pair
    cleaned = _mk(spark, sorted(out.items()))
    assert shared_span_pairs(cleaned, min_span=50).count() == 0


def test_two_distinct_spans_same_pair_both_cut(spark):
    s2 = "another completely different repeated legal disclaimer text"
    df = _mk(spark, [(1, A + SHARED + B + s2), (2, SHARED + C + s2)])
    spans = shared_span_pairs(df).collect()
    assert {s.length for s in spans} == {len(SHARED), len(s2)}
    out = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert out[2] == C


def test_overlapping_spans_interval_merged(spark):
    # doc 3 shares overlapping regions with docs 1 and 2 → the union is
    # cut once, not double-cut or fragmented (the 1∩2 overlap is 48 chars
    # — below min_span, so docs 1 and 2 keep their portions)
    df = _mk(
        spark,
        [
            (1, A + SHARED[:55]),
            (2, B + SHARED[7:]),  # 51 chars; 1∩2 overlap 48 < min_span
            (3, C + SHARED),
        ],
    )
    out = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert out[3] == C
    assert SHARED[:55] in out[1] and SHARED[7:] in out[2]


def test_hot_fingerprint_valve_drops_boilerplate(spark):
    # the shared span appears in every doc; with max_fp_df below the doc
    # count every anchor is valved and nothing is reported — the
    # documented trade, identical to max_gram_df
    rows = [(i, f"doc number {i} says " + SHARED) for i in range(1, 9)]
    df = _mk(spark, rows)
    assert shared_span_pairs(df, max_fp_df=2).count() == 0
    assert shared_span_pairs(df, max_fp_df=None).count() == 8 * 7 // 2


def test_max_pairs_per_doc_valve(spark):
    """A doc matching many partners keeps only its earliest
    max_pairs_per_doc pairs — deterministic, and off by default."""
    rows = [(0, A + SHARED)] + [
        (i, f"doc number {i} says " + SHARED) for i in range(1, 7)
    ]
    df = _mk(spark, rows)
    full = shared_span_pairs(df, max_fp_df=None)
    assert full.count() == 7 * 6 // 2
    capped = shared_span_pairs(df, max_fp_df=None, max_pairs_per_doc=2)
    got = sorted((r.doc_a, r.doc_b) for r in capped.collect())
    # doc 0 keeps partners 1,2; each later doc keeps at most 2 pairs on
    # either side
    assert (0, 1) in got and (0, 2) in got and (0, 6) not in got
    from collections import Counter

    per_doc = Counter()
    for da, db in got:
        per_doc[da] += 1
        per_doc[db] += 1
    assert max(per_doc.values()) <= 4  # ≤ cap per side


def test_short_and_null_docs_skipped(spark):
    df = _mk(spark, [(1, None), (2, "tiny"), (3, A + SHARED + B)])
    assert winnow_fingerprints(df).filter("doc_id < 3").count() == 0
    out = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert out[1] is None and out[2] == "tiny"


def test_empty_input(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    assert shared_span_pairs(df).count() == 0
    assert span_dedup(df).count() == 0


def test_unicode_offsets_are_codepoints(spark):
    # multi-byte chars before the span: offsets must count codepoints,
    # not bytes, and the cut must respect them
    prefix = "héllo wörld ünïcode çhars ahead — " * 2
    df = _mk(spark, [(1, A + SHARED), (2, prefix + SHARED)])
    spans = shared_span_pairs(df).collect()
    assert len(spans) == 1 and spans[0].start_b == len(prefix)
    out = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert out[2] == prefix


def test_remove_shared_spans_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [(1, A + SHARED, "web"), (2, B + SHARED, "book")],
        "doc_id bigint, text string, source string",
    )
    spans = shared_span_pairs(df)
    out = remove_shared_spans(df, spans)
    assert set(out.columns) == {"doc_id", "text", "source"}
    got = {r.doc_id: (r.text, r.source) for r in out.collect()}
    assert got[1] == (A + SHARED, "web")
    assert got[2] == (B, "book")


def test_periodic_content_single_merged_cut(spark):
    # self-similar repeated content creates anchors on several diagonals;
    # the extended spans overlap and must merge into one clean cut
    rep = " repeatme" * 10  # 90 chars, period 9
    df = _mk(spark, [(1, A + rep), (2, B + rep + C)])
    out = {r.doc_id: r.text for r in span_dedup(df).collect()}
    assert out[1] == A + rep
    assert "repeatme" not in out[2]
    assert out[2].startswith(B.rstrip() ) or out[2].startswith(B)
    assert out[2].endswith(C)


def test_gram_must_be_smaller_than_min_span(spark):
    df = _mk(spark, [(1, A)])
    with pytest.raises(ValueError):
        winnow_fingerprints(df, min_span=16, gram=16)
    with pytest.raises(ValueError):
        remove_shared_spans(df, df, keep="both")


def test_shared_span_report_global_and_grouped(spark):
    from datamunging_spark.operators.spandedup import shared_span_report

    df = spark.createDataFrame(
        [
            (1, A + SHARED, "web"),
            (2, B + SHARED, "web"),
            (3, C, "book"),
        ],
        "doc_id bigint, text string, source string",
    )
    g = shared_span_report(df).collect()
    assert len(g) == 1
    r = g[0]
    assert r.n_docs == 3 and r.n_spans == 1 and r.n_pairs == 1
    assert r.max_span == len(SHARED) == r.p50_span
    assert 0 < r.removal_char_frac < 1

    by_src = {
        r.source: r
        for r in shared_span_report(df, group_col="source").collect()
    }
    # the span's doc_b (doc 2) is 'web'; 'book' reports a clean zero row
    assert by_src["web"].n_spans == 1
    assert by_src["book"].n_spans == 0
    assert by_src["book"].removal_char_frac == 0.0


def test_shared_span_report_clean_corpus_zero_row(spark):
    from datamunging_spark.operators.spandedup import shared_span_report

    df = spark.createDataFrame(
        [(1, A), (2, B)], "doc_id bigint, text string"
    )
    r = shared_span_report(df).collect()
    assert len(r) == 1
    assert r[0].n_spans == 0 and r[0].removal_char_frac == 0.0


@pytest.mark.slow
def test_incremental_span_dedup_history_wins(spark):
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
        incremental_span_dedup,
    )

    hist = _mk(spark, [(1, A + SHARED), (2, B)])
    hist_fps = winnow_fingerprints(hist).localCheckpoint()
    batch = _mk(
        spark,
        [
            (100, C + SHARED),         # shares with history doc 1
            (101, D + SHARED + E),     # shares with history AND doc 100
            (102, E),                  # clean
        ],
    )
    spans = incremental_shared_spans(batch, hist_fps, hist)
    got = {(r.doc_a, r.doc_b) for r in spans.collect()}
    assert got == {(1, 100), (1, 101)}  # history pairs only here

    out = {r.doc_id: r.text
           for r in incremental_span_dedup(batch, hist_fps, hist).collect()}
    # history copy survives (not returned); batch copies of SHARED cut
    assert out[100] == C
    assert SHARED not in out[101]
    # within-batch pass: after history removal 101 = D + E, and E (63
    # chars >= min_span) is shared with the LATER doc 102 → 101 keeps
    # it, 102 loses its whole text
    assert out[101] == D + E
    assert out[102] == ""

    # batch pass off: 102 keeps E, only history spans are cut
    no_batch = {
        r.doc_id: r.text
        for r in incremental_span_dedup(
            batch, hist_fps, hist, within_batch=False
        ).collect()
    }
    assert no_batch[102] == E and no_batch[101] == D + E

    # _precomputed_batch_fps seam (r16): a caller-supplied winnow table
    # over exactly the batch (same min_span/gram) must yield the same
    # output as the internal winnow path — this is what lets the entry
    # overlap the batch winnow with the history snapshot build
    pre = winnow_fingerprints(batch).localCheckpoint()
    out_pre = {
        r.doc_id: r.text
        for r in incremental_span_dedup(
            batch, hist_fps, hist, _precomputed_batch_fps=pre
        ).collect()
    }
    assert out_pre == out


def test_incremental_span_dedup_snapshot_rollforward_idempotent(spark):
    """Re-ingesting content already folded into history removes it
    entirely; rolling the snapshot forward with the CLEANED batch keeps
    the loop stable (no self-matching residue)."""
    from datamunging_spark.operators.spandedup import (
        incremental_span_dedup,
    )

    hist = _mk(spark, [(1, A + SHARED)])
    hist_fps = winnow_fingerprints(hist).localCheckpoint()
    batch = _mk(spark, [(100, A + SHARED)])  # exact replay of history doc
    out = incremental_span_dedup(batch, hist_fps, hist).collect()
    assert out[0].text == ""  # the whole text was one shared span

    cleaned = _mk(spark, [(r.doc_id, r.text) for r in out])
    rolled = hist_fps.unionByName(
        winnow_fingerprints(cleaned)
    ).localCheckpoint()
    texts = hist.unionByName(cleaned)
    batch2 = _mk(spark, [(200, B + E)])  # genuinely new
    out2 = incremental_span_dedup(batch2, rolled, texts).collect()
    assert out2[0].text == B + E  # untouched


def test_incremental_span_valve_batch_bounded(spark):
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
    )

    # SHARED present in many history docs -> joint df exceeds the valve
    hist = _mk(
        spark,
        [(i, f"doc number {i} says " + SHARED) for i in range(1, 9)],
    )
    hist_fps = winnow_fingerprints(hist).localCheckpoint()
    batch = _mk(spark, [(100, A + SHARED)])
    assert incremental_shared_spans(
        batch, hist_fps, hist, max_fp_df=2
    ).count() == 0
    assert incremental_shared_spans(
        batch, hist_fps, hist, max_fp_df=None
    ).count() == 8


def test_incremental_span_empty_sides(spark):
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
        incremental_span_dedup,
    )

    hist = _mk(spark, [(1, A + SHARED)])
    hist_fps = winnow_fingerprints(hist)
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    # empty batch
    assert incremental_shared_spans(empty, hist_fps, hist).count() == 0
    assert incremental_span_dedup(empty, hist_fps, hist).count() == 0
    # empty history
    batch = _mk(spark, [(100, B + SHARED)])
    empty_fps = winnow_fingerprints(empty)
    assert incremental_shared_spans(batch, empty_fps, empty).count() == 0
    out = incremental_span_dedup(batch, empty_fps, empty).collect()
    assert out[0].text == B + SHARED


def test_shared_span_report_null_group_attaches(spark):
    from datamunging_spark.operators.spandedup import shared_span_report

    df = spark.createDataFrame(
        [(1, A + SHARED, None), (2, B + SHARED, None), (3, C, "book")],
        "doc_id bigint, text string, source string",
    )
    by_src = {
        r.source: r
        for r in shared_span_report(df, group_col="source").collect()
    }
    assert by_src[None].n_spans == 1  # NULL slice keeps its span mass
    assert by_src["book"].n_spans == 0


def test_incremental_span_pairs_valve(spark):
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
        incremental_span_dedup,
    )

    hist = _mk(
        spark, [(i, f"doc number {i} says " + SHARED) for i in range(1, 7)]
    )
    hist_fps = winnow_fingerprints(hist).localCheckpoint()
    batch = _mk(spark, [(100, A + SHARED)])
    assert incremental_shared_spans(
        batch, hist_fps, hist, max_fp_df=None
    ).count() == 6
    capped = incremental_shared_spans(
        batch, hist_fps, hist, max_fp_df=None, max_pairs_per_doc=2
    )
    assert capped.count() == 2
    # end-to-end forwards the valve without TypeError
    out = incremental_span_dedup(
        batch, hist_fps, hist, max_fp_df=None, max_pairs_per_doc=2
    ).collect()
    assert SHARED not in out[0].text


def test_shared_span_report_all_empty_texts_zero_frac(spark):
    """A group whose texts are all empty/NULL must report
    removal_char_frac = 0.0, never NULL (ADVICE r7: NULL silently skips
    every downstream threshold comparison)."""
    from datamunging_spark.operators.spandedup import shared_span_report

    df = spark.createDataFrame(
        [(1, "", "empty"), (2, None, "empty"),
         (3, "some real text that is long enough to count", "full")],
        "doc_id int, text string, source string",
    )
    rows = {r.source: r for r in
            shared_span_report(df, group_col="source").collect()}
    assert rows["empty"].removal_char_frac == 0.0
    assert rows["empty"].total_chars == 0
    assert rows["full"].removal_char_frac == 0.0  # no spans, nonzero chars
    # global all-empty corpus
    g = shared_span_report(df.filter("source = 'empty'")).collect()
    assert len(g) == 1 and g[0].removal_char_frac == 0.0


def test_incremental_fp_reuse_identical_to_double_winnow(spark):
    """The single-winnow within-batch pass (reuse uncut docs' fingerprints,
    re-winnow only cut docs) is output-identical to the naive composition
    that re-winnows the whole cleaned batch — on a corpus with BOTH
    cross-boundary (history x batch) and within-batch planted spans."""
    from datamunging_spark.operators.spandedup import (
        incremental_shared_spans,
        incremental_span_dedup,
        remove_shared_spans,
    )

    WB = "a second independent within batch duplicated sentence here!!"
    hist = _mk(spark, [(1, A + SHARED), (2, B)])
    hist_fps = winnow_fingerprints(hist).localCheckpoint()
    batch = _mk(
        spark,
        [
            (100, C + SHARED + WB),   # history span AND within-batch span
            (101, D + WB + E),        # within-batch span with 100
            (102, E + SHARED),        # history span; E shared with 101's tail
            (103, B[:20] + "unique tail that matches nobody else at all"),
        ],
    )
    fast = {r.doc_id: r.text
            for r in incremental_span_dedup(batch, hist_fps, hist).collect()}

    # naive composition: history pass, then full re-winnow span_dedup
    spans = incremental_shared_spans(batch, hist_fps, hist).localCheckpoint()
    cleaned = remove_shared_spans(batch, spans)
    naive = {r.doc_id: r.text for r in span_dedup(cleaned).collect()}
    assert fast == naive


def test_incremental_return_fps_matches_fresh_winnow(spark):
    """_return_fps hands back exactly winnow_fingerprints(final text) —
    the append-only snapshot increment — without re-winnowing uncut docs."""
    from datamunging_spark.operators.spandedup import incremental_span_dedup

    WB = "a second independent within batch duplicated sentence here!!"
    hist = _mk(spark, [(1, A + SHARED)])
    hist_fps = winnow_fingerprints(hist).localCheckpoint()
    batch = _mk(
        spark,
        [(100, C + SHARED + WB), (101, D + WB + E), (102, E)],
    )
    final, fps = incremental_span_dedup(
        batch, hist_fps, hist, _return_fps=True
    )
    final = final.localCheckpoint()
    got = sorted(
        (r.doc_id, r.fp, r.pos) for r in fps.collect()
    )
    want = sorted(
        (r.doc_id, r.fp, r.pos)
        for r in winnow_fingerprints(final).collect()
    )
    assert got == want and len(want) > 0

    # within_batch=False flavor too
    final2, fps2 = incremental_span_dedup(
        batch, hist_fps, hist, within_batch=False, _return_fps=True
    )
    final2 = final2.localCheckpoint()
    got2 = sorted((r.doc_id, r.fp, r.pos) for r in fps2.collect())
    want2 = sorted(
        (r.doc_id, r.fp, r.pos)
        for r in winnow_fingerprints(final2).collect()
    )
    assert got2 == want2


def test_sketch_valve_identical_to_exact_above_floor(spark):
    """valve="sketch" with k >= distinct fingerprints has ZERO MG error
    (no counter ever evicts), so its hot set equals the exact valve's
    wherever row count == document frequency — the span table must be
    byte-identical in both modes, on a corpus that exercises both a
    surviving planted span and a valved-away hot template."""
    from pyspark.sql import functions as F

    tpl = "universal hot template fingerprint carrier sentence here!!"
    rows = [(i, f"doc {i} unique filler padding words. " * 2 + tpl)
            for i in range(20)]
    rows += [(100, A + SHARED + B), (101, C + SHARED + D)]
    df = _mk(spark, rows)
    kw = dict(min_span=50, max_fp_df=4)
    exact = shared_span_pairs(df, valve="exact", **kw)
    sk = shared_span_pairs(df, valve="sketch", valve_k=1 << 16, **kw)
    key = ["doc_a", "doc_b", "start_a", "start_b", "length"]
    assert sorted(map(tuple, exact.select(key).collect())) == sorted(
        map(tuple, sk.select(key).collect())
    )
    # the planted pairwise span (df=2) survived, and the hot template's
    # quadratic 20·19/2 pair table did NOT materialize in either mode
    # (a stray boundary-anchor pair or two is the valve's normal
    # residue — identical across modes per the assert above)
    assert sk.filter(
        (F.col("doc_a") == 100) & (F.col("doc_b") == 101)
    ).count() == 1
    assert sk.filter(F.col("doc_a") < 100).count() < 10


def test_sketch_valve_rejects_unknown_mode(spark):
    df = _mk(spark, [(1, A + SHARED + B), (2, C + SHARED + D)])
    with pytest.raises(ValueError, match="valve"):
        shared_span_pairs(df, valve="bogus").collect()


def test_winnow_portable_matches_reference(spark):
    """r12 portable tier: winnowed (pos, fp) sets pinned value-for-value
    against an independent Python reference — md5-first-16-hex uint64
    keys, brute-force rightmost-min-per-window selection (the oracle
    discipline behind the x1_span_portable gate row); the default
    rolling-hash tier is untouched (different fp values, same schema)."""
    import hashlib

    from datamunging_spark.operators.spandedup import winnow_fingerprints

    MS, G = 30, 8
    W = MS - G + 1
    texts = {
        1: "the quick brown fox jumps over the lazy dog repeatedly today",
        2: "prefix text the quick brown fox jumps over the lazy dog end",
        3: "completely different content that shares no span with others",
        4: "short doc",  # < min_span: emits nothing
    }

    def ref(text):
        if len(text) < MS:
            return set()
        n = len(text) - G + 1
        h = [
            int(hashlib.md5(text[i:i + G].encode()).hexdigest()[:16], 16)
            for i in range(n)
        ]
        sel = set()
        if n <= W:
            m = min(h)
            sel.add(max(i for i in range(n) if h[i] == m))
        else:
            for s in range(n - W + 1):
                wnd = h[s:s + W]
                m = min(wnd)
                sel.add(s + max(i for i, v in enumerate(wnd) if v == m))

        def sgn(v):
            return v - (1 << 64) if v >= (1 << 63) else v

        return {(i, sgn(h[i])) for i in sel}

    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got: dict = {}
    for r in winnow_fingerprints(
        df, min_span=MS, gram=G, portable=True
    ).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    want = {i: s for i, t in texts.items() if (s := ref(t))}
    assert got == want
    # shared-span docs 1 and 2 collide on at least one portable fp
    shared = {f for _, f in got[1]} & {f for _, f in got[2]}
    assert shared
    # default tier: same schema, rolling-hash values (disjoint space)
    base = {
        r["fp"]
        for r in winnow_fingerprints(df, min_span=MS, gram=G).collect()
    }
    assert base and base != {f for s in got.values() for _, f in s}
