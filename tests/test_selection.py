"""DSIR data-selection family (operators/selection.py): feature
hashing, smoothed fits, log-ratio scoring, Gumbel top-k resampling —
pinned against a driver-side Python reference implementation (hashlib
md5 + math), which is the strongest oracle available for the
md5-portable discipline: every number must match to the documented
rounding, not just look plausible."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.selection import (
    dsir_fit,
    dsir_logratios,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
    importance_resample,
)

HC = 3  # 4,096 buckets — small spine, few enough collisions that the
# thematic separation check below is collision-stable (at 16^2 a
# cat-doc unigram collides into the finance mass and flips it)


def _norm(t: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", t.lower()).strip().split(" ") if w]


def _grams(t: str) -> list[str]:
    toks = _norm(t)
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(g: str, hc: int = HC) -> str:
    return hashlib.md5(g.encode()).hexdigest()[:hc]


def _py_fit(texts, hc=HC, alpha=1.0):
    cnt: dict[str, int] = {}
    for t in texts:
        for g in _grams(t):
            b = _bucket(g, hc)
            cnt[b] = cnt.get(b, 0) + 1
    total, nb = sum(cnt.values()), 16**hc
    return {
        f"{i:0{hc}x}": round(
            math.log((cnt.get(f"{i:0{hc}x}", 0) + alpha) / (total + alpha * nb)),
            7,
        )
        for i in range(nb)
    }


RAW = [
    (0, "the stock market fell sharply on tuesday"),
    (1, "cats and dogs are popular pets in many homes"),
    (2, "the federal reserve raised interest rates again"),
    (3, "my cat sleeps on the warm windowsill all day"),
    (4, "quarterly earnings beat expectations across the board"),
    (5, "dogs love to play fetch in the park"),
]
TARGET = [
    (100, "cats are wonderful pets and cats sleep a lot"),
    (101, "a dog and a cat can be friends with other pets"),
    (102, "pets like cats and dogs enjoy play and sleep"),
]


def test_hashed_ngram_features_matches_python(spark):
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["bucket"])
        for r in hashed_ngram_features(df, hash_chars=HC).collect()
    )
    want = sorted(
        (i, _bucket(g)) for i, t in RAW for g in _grams(t)
    )
    assert got == want


def test_dsir_fit_complete_smoothed_and_exact(spark):
    df = spark.createDataFrame(RAW, "doc_id long, text string")
    fit = dsir_fit(hashed_ngram_features(df, hash_chars=HC), HC).collect()
    assert len(fit) == 16**HC  # complete bucket space
    want = _py_fit([t for _, t in RAW])
    got = {r["bucket"]: r["logprob"] for r in fit}
    assert got == pytest.approx(want, abs=1e-7)
    # probability mass: sum of exp(logprob) over the complete space = 1
    assert sum(math.exp(v) for v in got.values()) == pytest.approx(1.0, abs=1e-4)


def test_dsir_scores_match_python_reference(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    fit_t = dsir_fit(hashed_ngram_features(tgt, hash_chars=HC), HC)
    fit_r = dsir_fit(hashed_ngram_features(raw, hash_chars=HC), HC)
    ratios = dsir_logratios(fit_t, fit_r)
    got = {
        r["doc_id"]: (r["n_features"], r["dsir_logw"])
        for r in dsir_scores(raw, ratios, hash_chars=HC).collect()
    }
    pt, pr = _py_fit([t for _, t in TARGET]), _py_fit([t for _, t in RAW])
    ratio = {b: round(pt[b] - pr[b], 7) for b in pt}
    for i, t in RAW:
        gs = _grams(t)
        want = sum(ratio[_bucket(g)] for g in gs)
        assert got[i][0] == len(gs)
        assert got[i][1] == pytest.approx(want, abs=1e-6), i
    # the pet-themed raw docs outscore the finance ones under the
    # pet-themed target — the operator's reason to exist. Compare the
    # per-feature MEAN: the raw sum is length-sensitive (every unseen
    # bigram adds negative mass), so doc length would swamp the theme
    # at this tiny scale. normalize=True is exactly that form.
    pets = {1, 3, 5}
    mean = {i: lw / n for i, (n, lw) in got.items()}
    assert min(mean[i] for i in pets) > max(
        mean[i] for i in set(got) - pets
    )
    normed = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_scores(
            raw, ratios, hash_chars=HC, normalize=True
        ).collect()
    }
    for i in got:
        assert normed[i] == pytest.approx(mean[i], abs=1e-9), i


def test_importance_resample_gumbel_exact_and_deterministic(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    sel = dsir_select(raw, tgt, k=3, hash_chars=HC, salt="s1")
    rows = sel.collect()
    assert len(rows) == 3
    # Python reference for the Gumbel keys
    pt, pr = _py_fit([t for _, t in TARGET]), _py_fit([t for _, t in RAW])
    ratio = {b: round(pt[b] - pr[b], 7) for b in pt}

    def gkey(i, t):
        logw = sum(ratio[_bucket(g)] for g in _grams(t))
        h = hashlib.md5(f"s1|{i}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 1.0) / (2**32 + 2.0)
        return logw + (-math.log(-math.log(u)))

    want = sorted(
        ((gkey(i, t), i) for i, t in RAW), reverse=True
    )[:3]
    got = sorted(
        ((r["_gumbel_key"], r["doc_id"]) for r in rows), reverse=True
    )
    assert [i for _, i in got] == [i for _, i in want]
    for (gk, _), (wk, _) in zip(got, want):
        assert gk == pytest.approx(wk, abs=1e-6)
    # same salt → same sample; different salt → (here) different keys
    again = dsir_select(raw, tgt, k=3, hash_chars=HC, salt="s1").collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in rows
    )
    other = dsir_select(raw, tgt, k=3, hash_chars=HC, salt="s2").collect()
    assert {r["_gumbel_key"] for r in other} != {r["_gumbel_key"] for r in rows}


def test_importance_resample_plan_is_take_ordered(spark):
    """The top-k must run as TakeOrdered per-partition heaps, never a
    global sort exchange — the operator's scale contract."""
    scored = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("double").alias("dsir_logw"),
    )
    sel = importance_resample(scored, k=10, id_cols=["doc_id"])
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    # determinism under key ties: the ungrouped sort order carries the
    # id tiebreak, same contract as the grouped path (r11 ADVICE)
    take = next(
        ln for ln in plan.splitlines() if "TakeOrderedAndProject" in ln
    )
    assert "doc_id" in take.split("output")[0]


def test_dsir_scores_wide_bucket_broadcast_falls_back(spark):
    """hash_chars >= 6 makes the complete ratio table 16^6+ rows — too
    wide to broadcast regardless of group count: dsir_scores warns and
    falls back to a shuffle join; narrow widths keep the broadcast
    hint, warning-free (r11 ADVICE)."""
    import warnings

    df = spark.createDataFrame(
        [(0, "alpha beta gamma")], "doc_id long, text string"
    )
    wide = spark.createDataFrame(
        [("abcdef", 0.5)], "bucket string, logratio double"
    )
    with pytest.warns(UserWarning, match="too wide to broadcast"):
        scored = dsir_scores(df, wide, hash_chars=6)
    plan = scored._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in plan.lower()
    narrow = spark.createDataFrame(
        [("abc", 0.5)], "bucket string, logratio double"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        scored_n = dsir_scores(df, narrow, hash_chars=HC)
    plan_n = scored_n._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in plan_n.lower()


def test_featurize_matches_python_on_arbitrary_text(spark):
    """Feature parity extends to arbitrary ASCII text (punctuation
    runs, repeated spaces, empty strings) — ASCII-only per the repo's
    documented normalize_text boundary: Java regex ``\\s`` is ASCII
    while Python's matches unicode whitespace (\\x1c-\\x1f etc.), so
    unicode-whitespace parity is explicitly not a target (see
    tests/test_properties.py's same note)."""
    from hypothesis import given, settings, strategies as st

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40,
    )

    @settings(max_examples=5, deadline=None)
    @given(st.lists(ascii_text, min_size=1, max_size=8))
    def run(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = sorted(
            (r["doc_id"], r["bucket"])
            for r in hashed_ngram_features(df, hash_chars=HC).collect()
        )
        want = sorted(
            (i, _bucket(g)) for i, t in enumerate(texts) for g in _grams(t)
        )
        assert got == want

    run()


def test_featurize_splits_once_in_plan(spark):
    """The token array must stay BOUND as a column: lambda-bearing
    expressions are excluded from subexpression elimination, so an
    inlined form evaluates normalize+split once per reference (6x) —
    pin the optimized plan to exactly one split."""
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        hashed_ngram_features(df, hash_chars=HC)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(") == 1


def test_selection_guards(spark):
    """alpha<=0 raises (log(0) is NULL in Spark SQL and would vanish
    in the decimal sums); mismatched bucket widths raise instead of
    silently joining nothing."""
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    f2 = hashed_ngram_features(df, hash_chars=2)
    f3 = hashed_ngram_features(df, hash_chars=3)
    with pytest.raises(ValueError, match="alpha"):
        dsir_fit(f2, 2, alpha=0.0)
    with pytest.raises(ValueError, match="width mismatch"):
        dsir_fit(f2, hash_chars=3)
    with pytest.raises(ValueError, match="different hash_chars"):
        dsir_logratios(dsir_fit(f2, 2), dsir_fit(f3, 3))
    ratios2 = dsir_logratios(dsir_fit(f2, 2), dsir_fit(f2, 2))
    with pytest.raises(ValueError, match="width mismatch"):
        dsir_scores(df, ratios2, hash_chars=4)


def test_grouped_dsir_per_language_reference_and_contracts(spark):
    """group_col: per-group fits match the Python reference computed
    on each group's slice alone; a doc scores against ITS group's
    ratios; NULL group is a real group; raw groups absent from the
    target are dropped; k applies per group, deterministically."""
    raw_rows = [
        (0, "en", "cats and dogs and cats"),
        (1, "en", "stock market rates"),
        (2, "fr", "les chats et les chiens"),
        (3, "fr", "le marché boursier"),
        (4, None, "cats chats mixed unknown"),
        (5, "de", "katzen und hunde"),  # group absent from target
    ]
    tgt_rows = [
        (100, "en", "cats cats pets"),
        (101, "fr", "les chats adorables"),
        (102, None, "cats unknown pets"),
    ]
    raw = spark.createDataFrame(
        raw_rows, "doc_id long, lang string, text string"
    )
    tgt = spark.createDataFrame(
        tgt_rows, "doc_id long, lang string, text string"
    )
    got = {
        r["doc_id"]: (r["lang"], r["n_features"], r["dsir_logw"])
        for r in dsir_scores(
            raw,
            dsir_logratios(
                dsir_fit(
                    hashed_ngram_features(
                        tgt, hash_chars=HC, group_col="lang"
                    ),
                    HC,
                    group_col="lang",
                ),
                dsir_fit(
                    hashed_ngram_features(
                        raw, hash_chars=HC, group_col="lang"
                    ),
                    HC,
                    group_col="lang",
                ),
                group_col="lang",
            ),
            hash_chars=HC,
            group_col="lang",
        ).collect()
    }
    # de has no target slice -> doc 5 dropped; everything else scored
    assert set(got) == {0, 1, 2, 3, 4}
    # Python reference PER GROUP (each group's fit over its slice only)
    for grp in ["en", "fr", None]:
        pt = _py_fit([t for _, g, t in tgt_rows if g == grp])
        pr = _py_fit([t for _, g, t in raw_rows if g == grp])
        ratio = {b: round(pt[b] - pr[b], 7) for b in pt}
        for i, g, t in raw_rows:
            if g != grp:
                continue
            gs = _grams(t)
            want = sum(ratio[_bucket(x)] for x in gs)
            assert got[i][0] == g and got[i][1] == len(gs)
            assert got[i][2] == pytest.approx(want, abs=1e-6), (i, g)
    # per-group k: one doc per group, deterministic across runs
    sel = dsir_select(
        raw, tgt, k=1, hash_chars=HC, group_col="lang", salt="g"
    )
    rows = sel.collect()
    assert len(rows) == 3 and len({r["lang"] for r in rows}) == 3
    again = dsir_select(
        raw, tgt, k=1, hash_chars=HC, group_col="lang", salt="g"
    ).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again
    )


def test_grouped_resample_plan_and_mismatch_guard(spark):
    """The grouped top-k's scale contract: hash exchanges only (no
    rangepartitioning sort exchange), with the stage-1 window keyed by
    (group, input partition id) so a dominant group can't hash-route
    its whole corpus into one task. Plus the provenance guard: grouped
    ratio tables consumed ungrouped (or vice versa) raise instead of
    silently summing every group's rows."""
    scored = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") % 7).cast("double").alias("dsir_logw"),
    )
    sel = importance_resample(
        scored, k=5, id_cols=["doc_id"], group_col="lang"
    )
    rows = sel.collect()
    assert len(rows) == 15  # 5 per group x 3 groups
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan
    assert "SPARK_PARTITION_ID" in plan.upper() or "_ipid" in plan
    # provenance guard
    df = spark.createDataFrame(
        [(0, "en", "a b")], "doc_id long, lang string, text string"
    )
    grouped_ratios = dsir_logratios(
        dsir_fit(
            hashed_ngram_features(df, hash_chars=HC, group_col="lang"),
            HC,
            group_col="lang",
        ),
        dsir_fit(
            hashed_ngram_features(df, hash_chars=HC, group_col="lang"),
            HC,
            group_col="lang",
        ),
        group_col="lang",
    )
    with pytest.raises(ValueError, match="group mismatch"):
        dsir_scores(df, grouped_ratios, hash_chars=HC)  # ungrouped use
    with pytest.raises(ValueError, match="group mismatch"):
        dsir_fit(hashed_ngram_features(df, hash_chars=HC), HC,
                 group_col="lang")


def test_selection_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    feats = hashed_ngram_features(empty, hash_chars=HC)
    assert feats.count() == 0
    fit = dsir_fit(feats, HC)
    assert fit.count() == 16**HC  # smoothed uniform over the spine
    lp = {r["logprob"] for r in fit.collect()}
    assert len(lp) == 1  # all-equal mass
    with pytest.raises(ValueError, match="id_cols"):
        importance_resample(spark.range(1), k=1, id_cols=[])
    with pytest.raises(ValueError, match="hash_chars"):
        hashed_ngram_features(empty, hash_chars=0)
    # featureless docs are dropped from scores (documented contract)
    blank = spark.createDataFrame(
        [(0, "   "), (1, "real words here")], "doc_id long, text string"
    )
    fit_b = dsir_fit(hashed_ngram_features(blank, hash_chars=HC), HC)
    ids = {
        r["doc_id"]
        for r in dsir_scores(
            blank, dsir_logratios(fit_b, fit_b), hash_chars=HC
        ).collect()
    }
    assert ids == {1}


def test_cluster_balanced_sample_caps_each_cluster(spark):
    """Two planted tight clusters, skewed 20:4 — the cap keeps <=3 per
    cluster (so the dominant topic can't fill the budget), the minority
    cluster survives whole, picks are salt-deterministic and re-deal
    with a different salt."""
    import random

    from datamunging_spark.operators.selection import cluster_balanced_sample

    rnd = random.Random(7)

    def around(cx, cy):
        return [cx + rnd.uniform(-.05, .05), cy + rnd.uniform(-.05, .05)]

    rows = [(i, around(0.0, 0.0)) for i in range(20)] + [
        (100 + i, around(10.0, 10.0)) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<double>")
    out = cluster_balanced_sample(
        df, n_clusters=2, per_cluster_cap=3, salt="s1", seed=1
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r["cluster"], set()).add(r["doc_id"])
    assert len(per) == 2
    assert all(len(v) <= 3 for v in per.values())
    # the two planted clusters never mix
    for v in per.values():
        assert {i < 100 for i in v} in ({True}, {False})
    # deterministic per salt; different salt re-deals the big cluster
    again = cluster_balanced_sample(
        df, n_clusters=2, per_cluster_cap=3, salt="s1", seed=1
    ).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(
        r["doc_id"] for r in out
    )
    other = cluster_balanced_sample(
        df, n_clusters=2, per_cluster_cap=3, salt="s2", seed=1
    ).collect()
    assert sorted(r["doc_id"] for r in other) != sorted(
        r["doc_id"] for r in out
    )
    # no join in the plan: cluster attachment is one Arrow pass with
    # the centroid matrix in the closure
    lazy = cluster_balanced_sample(
        df, n_clusters=2, per_cluster_cap=3, salt="s1", seed=1
    )
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # NULL embeddings excluded (documented), empty input returns empty
    # with the cluster column, name collisions raise
    withnull = spark.createDataFrame(
        rows + [(999, None)], "doc_id long, embedding array<double>"
    )
    got = cluster_balanced_sample(
        withnull, n_clusters=2, per_cluster_cap=100, salt="s1", seed=1
    ).collect()
    assert 999 not in {r["doc_id"] for r in got} and len(got) == 24
    empty = spark.createDataFrame([], "doc_id long, embedding array<double>")
    e = cluster_balanced_sample(empty, n_clusters=2, per_cluster_cap=3)
    assert e.columns[-1] == "cluster" and e.count() == 0
    with pytest.raises(ValueError, match="cluster_col"):
        cluster_balanced_sample(
            df.withColumn("cluster", F.lit(1)), n_clusters=2
        )
