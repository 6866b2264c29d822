"""Training-set assembly operators (X5): decontamination, source mixing,
deterministic training shuffle."""

import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.trainset import (
    contamination_report,
    decontaminate,
    source_mix,
    training_shuffle,
)


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [
        (0, base, "web"),                       # contaminated: == bench 100
        (1, base.replace("dog", "cat"), "web"),  # shares most 5-grams
        (2, "completely different text about spark partitions and shuffles today", "web"),
        (3, "unrelated musings on columnar storage formats and zstd compression", "books"),
        (4, "the quick brown fox appears briefly here then diverges entirely afterwards", "books"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


@pytest.fixture(scope="module")
def evalset(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog near the river bank")],
        ["doc_id", "text"],
    )


def test_contamination_report_counts(corpus, evalset):
    rep = {
        r["doc_id"]: r["overlap_grams"]
        for r in contamination_report(
            corpus, evalset, n=5, min_overlap=2
        ).collect()
    }
    # doc0 is the benchmark verbatim: all 9 of its 5-grams collide.
    assert rep[0] == 9
    # doc1 differs by one word: grams not containing it still collide.
    assert 2 <= rep[1] < 9
    # docs 2/3 share no 5-gram; doc4 shares only "the quick brown fox ..."
    # truncated at "appears" → fewer than min_overlap collisions.
    assert 2 not in rep and 3 not in rep and 4 not in rep


def test_decontaminate_keeps_clean_docs(corpus, evalset):
    kept = {
        r["doc_id"]
        for r in decontaminate(corpus, evalset, n=5, min_overlap=2).collect()
    }
    assert kept == {2, 3, 4}


def test_source_mix_weights(spark):
    df = spark.createDataFrame(
        [(i, "web" if i < 400 else "wiki") for i in range(600)],
        ["doc_id", "source"],
    )
    out = source_mix(df, {"web": 0.5, "wiki": 2.5})
    by_src = {
        r["source"]: r["cnt"]
        for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    # web: 400 docs × 0.5 → ~200 (md5 predicate, binomial CI)
    assert 160 <= by_src["web"] <= 240
    # wiki: 200 docs × 2.5 → 2 full copies (400) + ~100 fractional
    assert 460 <= by_src["wiki"] <= 540
    # copy indices: fractional-only sources never exceed copy 0
    max_copy = {
        r["source"]: r["mc"]
        for r in out.groupBy("source").agg(F.max("copy").alias("mc")).collect()
    }
    assert max_copy["web"] == 0 and max_copy["wiki"] == 2
    # deterministic: same plan twice → identical rows
    again = source_mix(df, {"web": 0.5, "wiki": 2.5})
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def test_source_mix_zero_weight_drops_source(spark):
    df = spark.createDataFrame(
        [(1, "keep"), (2, "drop"), (3, "keep")], ["doc_id", "source"]
    )
    out = source_mix(df, {"drop": 0.0})
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_source_mix_integer_weight_exact_copies(spark):
    df = spark.createDataFrame([(i, "a") for i in range(50)], ["doc_id", "source"])
    out = source_mix(df, {"a": 3.0})
    assert out.count() == 150
    assert out.groupBy("doc_id").count().filter("count != 3").count() == 0


def test_training_shuffle_deterministic_and_range_partitioned(corpus):
    out = training_shuffle(corpus, ["doc_id"], salt="ep0", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    keys1 = [r["shuffle_key"] for r in out.collect()]
    keys2 = [
        r["shuffle_key"]
        for r in training_shuffle(
            corpus, ["doc_id"], salt="ep0", num_partitions=4
        ).collect()
    ]
    assert keys1 == keys2 and len(set(keys1)) == corpus.count()
    # a different salt yields a different permutation
    keys3 = set(
        r["shuffle_key"]
        for r in training_shuffle(
            corpus, ["doc_id"], salt="ep1", num_partitions=4
        ).collect()
    )
    assert keys3 != set(keys1)


def test_source_mix_rejects_negative_weight(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError, match="negative"):
        source_mix(df, {"a": -0.5})


def test_pack_sequences_bin_invariants(spark, tables):
    from datamunging_spark.operators.trainset import pack_sequences

    from datamunging_spark.functions import token_count

    docs = tables["documents"].select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    max_len = 256
    packed = pack_sequences(docs, max_len=max_len, num_groups=8)
    # every doc assigned exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # no non-truncated bin exceeds max_len; truncated bins are singletons
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"),
        F.count("*").alias("n"),
        F.max(F.col("truncated").cast("int")).alias("tr"),
    )
    assert per_bin.filter((F.col("tr") == 0) & (F.col("tot") > max_len)).count() == 0
    assert per_bin.filter((F.col("tr") == 1) & (F.col("n") > 1)).count() == 0
    # bin_tokens column agrees with the recomputed per-bin totals
    bad = (
        packed.groupBy("bin_id", "bin_tokens")
        .agg(F.sum("n_tokens").alias("tot"))
        .filter(F.col("tot") != F.col("bin_tokens"))
    )
    assert bad.count() == 0
    # packing is reasonably dense: far fewer bins than docs
    assert per_bin.count() < docs.count() / 2


def test_take_token_budget_matches_global_prefix(spark, tables):
    from datamunging_spark.functions import token_count
    from datamunging_spark.operators.trainset import take_token_budget

    docs = tables["documents"].select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    budget = 3000
    got = take_token_budget(docs, budget, order_cols=["doc_id"])
    # oracle: exact global prefix via driver-side cumsum in doc_id order
    rows = sorted(docs.collect(), key=lambda r: r["doc_id"])
    run, keep = 0, set()
    for r in rows:
        run += r["n_tokens"]
        if run > budget:
            break
        keep.add(r["doc_id"])
    assert {r["doc_id"] for r in got.collect()} == keep
    assert keep  # budget admits at least some docs


def test_pack_sequences_truncated_bins_stay_closed(spark):
    """Oversized docs get CLOSED singleton bins — a zero/negative-token doc
    (size(NULL)=-1 under ANSI-off) must open/join a normal bin instead."""
    from datamunging_spark.operators.trainset import pack_sequences

    df = spark.createDataFrame(
        [(1, 5000), (2, 0), (3, -1), (4, 100)], "doc_id long, n_tokens long"
    )
    packed = pack_sequences(df, max_len=2048, num_groups=1)
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert rows[1]["truncated"] and not rows[2]["truncated"]
    # the oversized doc's bin contains only itself
    big_bin = rows[1]["bin_id"]
    assert [r["doc_id"] for r in rows.values() if r["bin_id"] == big_bin] == [1]
    # zero/negative-token docs land in the open bin with doc 4
    assert rows[2]["bin_id"] == rows[3]["bin_id"] == rows[4]["bin_id"]
    assert rows[4]["bin_tokens"] == 100


def test_pack_sequences_string_ids(spark):
    from datamunging_spark.operators.trainset import pack_sequences

    df = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], "doc_id string, n_tokens long"
    )
    packed = pack_sequences(df, max_len=64, num_groups=2)
    assert {r["doc_id"] for r in packed.collect()} == {"a", "b", "c"}


def test_pack_sequences_tie_break_deterministic(spark):
    """Equal token counts sort by id, so bin grouping is reproducible:
    ids 10,11,12 all at 50 tokens with max_len=100 must pack {10,11}
    together and 12 alone — any other grouping means the tiebreak broke."""
    from datamunging_spark.operators.trainset import pack_sequences

    df = spark.createDataFrame(
        [(10, 50), (11, 50), (12, 50)], "doc_id long, n_tokens long"
    )
    for _ in range(2):  # identical across repeated runs
        rows = {
            r["doc_id"]: r["bin_id"]
            for r in pack_sequences(df, max_len=100, num_groups=1).collect()
        }
        assert rows[10] == rows[11] != rows[12]


def test_take_token_budget_clamps_negative_counts(spark):
    """A negative token count (size(NULL) = -1 under ANSI-off) must not make
    the running sum dip back under budget — the result has to stay a
    contiguous prefix, not a 'kept, dropped, kept again' pick."""
    from datamunging_spark.operators.trainset import take_token_budget

    df = spark.createDataFrame(
        [(1, 100), (2, 50), (3, -60), (4, 10)], "doc_id long, n_tokens long"
    )
    got = take_token_budget(df, budget=120, order_cols=["doc_id"])
    # clamped running sums: 100, 150, 150, 160 -> only doc 1 fits.
    # unclamped would be 100, 150, 90, 100 -> the buggy {1, 3, 4}.
    assert {r["doc_id"] for r in got.collect()} == {1}


def test_take_token_budget_requires_order(spark, tables):
    from datamunging_spark.operators.trainset import take_token_budget

    with pytest.raises(ValueError, match="order_cols"):
        take_token_budget(tables["documents"], 100)


def test_split_dataset_fractions_determinism_subset_stability(spark, tables):
    """Deterministic train/val/test split: per-split fractions land in CI,
    splits partition the corpus (disjoint + exhaustive), assignment is
    stable on any subset (a doc's split never changes as the corpus
    grows), a new salt re-deals it, and bad weights are refused."""
    import pytest
    from datamunging_spark.operators.trainset import split_dataset

    # the synthetic lineitem repeats (orderkey, linenumber) pairs — dedupe
    # so id_cols uniquely identify a row, per the operator contract
    li = (
        tables["lineitem"]
        .select("l_orderkey", "l_linenumber")
        .dropDuplicates()
        .localCheckpoint()
    )
    n = li.count()
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_dataset(li, w, id_cols=["l_orderkey", "l_linenumber"])
    got = {
        r["split"]: r["cnt"]
        for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(got) == set(w) and sum(got.values()) == n  # exhaustive
    for k, frac in w.items():
        assert abs(got[k] / n - frac) < 0.03, (k, got)
    # subset stability: splitting a 500-row subset assigns identically
    sub = li.limit(500).localCheckpoint()
    a = split_dataset(sub, w, id_cols=["l_orderkey", "l_linenumber"])
    b = split_dataset(li, w, id_cols=["l_orderkey", "l_linenumber"]).join(
        sub, ["l_orderkey", "l_linenumber"], "left_semi"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # salt re-deals: some rows move
    c = split_dataset(sub, w, id_cols=["l_orderkey", "l_linenumber"], salt="1")
    assert c.exceptAll(a).count() > 0
    with pytest.raises(ValueError, match="sum to 1"):
        split_dataset(li, {"train": 0.5, "val": 0.1}, id_cols=["l_orderkey"])
    with pytest.raises(ValueError, match="invalid"):
        split_dataset(li, {"train": -0.5, "val": 1.5}, id_cols=["l_orderkey"])


def test_decontaminate_fuzzy_drops_paraphrase(spark, tables):
    """Fuzzy decontamination catches a lightly-rewritten benchmark doc that
    exact n-gram collision would need a verbatim 5-gram to flag; clean docs
    survive, and the corpus is never deduped against itself (two identical
    clean corpus docs both survive)."""
    from datamunging_spark.operators.trainset import decontaminate_fuzzy

    bench = tables["documents"].orderBy("doc_id").limit(5).select("text")
    leaked = (  # benchmark doc with one appended token: high sig-Jaccard
        tables["documents"].orderBy("doc_id").limit(1)
        .select(F.concat(F.col("text"), F.lit(" tail")).alias("text"))
        .withColumn("doc_id", F.lit(1000).cast("long"))
    )
    clean = tables["documents"].filter(
        F.col("doc_id").between(300, 309)
    ).select("doc_id", "text")
    twin = clean.limit(1).withColumn("doc_id", F.lit(2000).cast("long"))
    corpus = clean.unionByName(leaked.select("doc_id", "text")).unionByName(twin)
    out = {
        r["doc_id"]
        for r in decontaminate_fuzzy(corpus, bench, threshold=0.5).collect()
    }
    assert 1000 not in out                      # paraphrase of benchmark gone
    assert set(range(300, 310)) <= out          # clean docs survive
    assert 2000 in out                          # no corpus self-dedup


def test_decontaminate_substring_exact_containment(spark):
    """Substring decontamination: a doc embedding a benchmark answer
    string verbatim (any case/spacing) is dropped; docs sharing only
    words survive; short benchmark strings below min_len never match;
    empty benchmark is a no-op."""
    from datamunging_spark.operators.trainset import decontaminate_substring

    bench = spark.createDataFrame(
        [("the capital of the ancient empire was carthage",),
         ("tiny",)],  # below min_len: must not kill anything
        ["text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "quiz leak: The  Capital of the Ancient empire WAS carthage, obviously"),
            (2, "discusses capital and empire and carthage separately in prose"),
            (3, "a tiny note about nothing in particular"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"] for r in decontaminate_substring(corpus, bench).collect()
    )
    assert kept == [2, 3]
    empty_bench = spark.createDataFrame([], "text string")
    assert decontaminate_substring(corpus, empty_bench).count() == 3


def test_assign_token_shards_balanced_and_contiguous(spark, tables):
    """Token-balanced sharding: every doc assigned exactly once, shard
    token sums stay within target + one doc overshoot, shards are
    CONTIGUOUS in the given order (a doc never lands in an earlier shard
    than a predecessor), and the whole assignment is deterministic."""
    from datamunging_spark.functions import token_count
    from datamunging_spark.operators.trainset import assign_token_shards

    docs = tables["documents"].select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    target = 2000
    out = assign_token_shards(
        docs, target, order_cols=["doc_id"]
    ).localCheckpoint()
    assert out.count() == docs.count()
    per = (
        out.groupBy("shard")
        .agg(
            F.sum("n_tokens").alias("tot"),
            F.max("n_tokens").alias("mx"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .orderBy("shard")
        .collect()
    )
    # every full shard holds >= target - max_doc and <= target + max_doc
    for r in per[:-1]:
        assert target - r["mx"] <= r["tot"] <= target + r["mx"], r
    # contiguity: shard id ranges do not interleave in doc_id order
    for a, b in zip(per, per[1:]):
        assert a["hi"] < b["lo"]
    again = assign_token_shards(docs, target, order_cols=["doc_id"])
    assert out.exceptAll(again).count() == 0


def test_write_training_shards_layout(spark, tables, tmp_path):
    from datamunging_spark.functions import token_count
    from datamunging_spark.operators.trainset import write_training_shards

    docs = tables["documents"].select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    p = str(tmp_path / "shards")
    entries = write_training_shards(
        docs, p, shard_tokens=5000, order_cols=["doc_id"]
    )
    back = spark.read.parquet(p)
    assert back.count() == docs.count()
    assert back.select("shard").distinct().count() >= 2
    # manifest: written last, and its per-shard stats match the data
    import json

    m = json.loads((tmp_path / "shards" / "_MANIFEST.json").read_text())
    assert m["shards"] == entries and m["n_shards"] == len(entries)
    assert m["total_rows"] == docs.count()
    per_shard = {
        r["shard"]: (r["rows"], r["tokens"])
        for r in back.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("rows"), F.sum("n_tokens").alias("tokens"))
        .collect()
    }
    for e in entries:
        assert per_shard[e["shard"]] == (e["rows"], e["tokens"])
    assert m["total_tokens"] == sum(t for _, t in per_shard.values())
    # manifest=False path unchanged
    p2 = str(tmp_path / "shards2")
    assert write_training_shards(
        docs, p2, shard_tokens=5000, order_cols=["doc_id"], manifest=False
    ) is None
    import os

    assert not os.path.exists(os.path.join(p2, "_MANIFEST.json"))


def test_decontaminate_substring_multipattern_matches_join(spark, tables):
    """The Aho-Corasick mapInPandas matcher must keep exactly the docs the
    broadcast-anti-join matcher keeps (same normalization, same contains-any
    semantics) — the blocklist-scale path cross-checked against the
    oracle-checked path."""
    from pyspark.sql import functions as F

    from datamunging_spark.functions import normalize_text
    from datamunging_spark.operators.trainset import decontaminate_substring

    docs = tables["documents"].select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 15 == 0).select(
        F.substring(normalize_text("text"), 5, 40).alias("text")
    )
    a = decontaminate_substring(docs, bench, min_len=20, matcher="join")
    b = decontaminate_substring(
        docs, bench, min_len=20, matcher="multipattern"
    )
    ids = lambda df: sorted(r["doc_id"] for r in df.collect())  # noqa: E731
    got_a, got_b = ids(a), ids(b)
    assert got_a == got_b
    assert 0 < len(got_b) < docs.count()  # some dropped, not all


def test_ac_automaton_overlapping_and_suffix_patterns(spark):
    """Automaton correctness corners: a pattern that is a suffix of another
    must fire via failure links; overlapping occurrences and mid-text hits
    all detected."""
    from datamunging_spark.operators.trainset import _ac_build, _ac_find_any

    auto = _ac_build(["hers", "ers", "xyz"])
    assert _ac_find_any("zzhersqq", auto)      # 'hers' and suffix 'ers'
    assert _ac_find_any("trainers", auto)      # 'ers' via failure path
    assert _ac_find_any("xyz", auto)
    assert not _ac_find_any("herzxy", auto)
    assert not _ac_find_any("", auto)


def test_temperature_mix_shares(spark):
    """T=1 is the identity mix (every weight 1, one copy per doc); higher T
    flattens shares — the minority source's share strictly rises and the
    majority's falls, with total volume approximately preserved."""
    from pyspark.sql import functions as F

    from datamunging_spark.operators.trainset import temperature_mix

    rows = [(i, "big") for i in range(900)] + [
        (1000 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    t1 = temperature_mix(df, temperature=1.0)
    assert t1.count() == 1000
    assert t1.filter(F.col("copy") != 0).count() == 0

    t5 = temperature_mix(df, temperature=5.0)
    got = {
        r["source"]: r["n"]
        for r in t5.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert got["small"] > 100 and got["big"] < 900  # flattened toward uniform
    assert abs(sum(got.values()) - 1000) < 60  # volume ~preserved (md5 frac)
    small_share = got["small"] / sum(got.values())
    assert 0.1 < small_share < 0.5  # between natural and uniform

    import pytest

    with pytest.raises(ValueError):
        temperature_mix(df, temperature=0.0)


# --- byte-level BPE tier (r11: the real-tokenizer token-counting gap) ---


def test_bpe_trainer_closed_form():
    """Sennrich greedy loop, hand-computed: 'aa aa aa' has pair ('a','a')
    at freq 3 and ('Ġ','a') at 2, so merge 1 is ('a','a'); after it the
    only pair left is ('Ġ','aa')."""
    from datamunging_spark.operators.bpe import bpe_train

    assert bpe_train(["aa aa aa"], 2) == [("a", "a"), ("Ġ", "aa")]
    # ties break lexicographically: 'ab cd' -> all pairs freq 1, and
    # ('Ġ','c') < ('a','b') < ('c','d') in the byte-unicode alphabet
    # ordering of tuples
    m = bpe_train(["ab cd"], 1)
    assert m == [min([("a", "b"), ("Ġ", "c"), ("c", "d")])]


def test_bpe_apply_closed_form():
    """Greedy apply, hand-computed: ranks [ab, abc] tokenize 'abc abc'
    into 3 tokens ('abc', 'Ġ', 'abc' — the leading-space pretoken maps
    space to Ġ which never merges here)."""
    from datamunging_spark.operators.bpe import bpe_encode, merges_to_ranks

    ranks = merges_to_ranks([("a", "b"), ("ab", "c")])
    assert bpe_encode("abc abc", ranks) == ["abc", "Ġ", "abc"]
    # lowest-RANK pair merges first even when a later pair appears
    # earlier in the string: with ranks [bc, ab], 'abc' -> a + bc
    ranks2 = merges_to_ranks([("b", "c"), ("a", "b")])
    assert bpe_encode("abc", ranks2) == ["a", "bc"]
    # unranked pairs never merge; every byte still tokenizes
    assert bpe_encode("xyz", merges_to_ranks([])) == ["x", "y", "z"]


def test_bpe_fixture_regenerates_bit_identical():
    """The committed merges fixture IS bpe_train(fixture_corpus(), 512)
    — regeneration determinism is the fixture's whole contract."""
    from datamunging_spark.operators.bpe import (
        bpe_train,
        fixture_corpus,
        load_fixture_merges,
    )

    assert bpe_train(fixture_corpus(), 512) == load_fixture_merges()


def test_bpe_bytes_to_unicode_reversible():
    from datamunging_spark.operators.bpe import bytes_to_unicode

    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert b2u[ord("a")] == "a" and b2u[ord(" ")] == "Ġ"


def test_bpe_token_counter_matches_driver_encode(spark):
    """The distributed Arrow counter returns exactly
    len(bpe_encode(text)) per row (NULL -> NULL), on ascii, unicode and
    empty strings — the broadcast/memoized path is the same math as the
    driver helper."""
    from datamunging_spark.operators.bpe import (
        bpe_encode,
        bpe_token_counter,
        load_fixture_merges,
        merges_to_ranks,
    )

    merges = load_fixture_merges()
    ranks = merges_to_ranks(merges)
    texts = [
        "the quick brown fox jumps over the lazy dog.",
        "naïve café — déjà vu!",
        "",
        None,
        "numbers 123 4567 and mixed a1b2c3",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    counter = bpe_token_counter(spark, merges)
    got = {
        r["i"]: r["n"]
        for r in df.select("i", counter("text").alias("n")).collect()
    }
    for i, t in enumerate(texts):
        expect = None if t is None else len(bpe_encode(t, ranks))
        assert got[i] == expect, (i, t, got[i], expect)
    # the estimator lower-bounds the real count (one "token" per
    # pretoken vs >= 1 BPE token per pretoken)
    from datamunging_spark.functions import bpe_ish_token_count

    both = df.filter(F.col("text").isNotNull()).select(
        counter("text").alias("bpe"),
        bpe_ish_token_count("text").alias("est"),
    )
    assert both.filter(F.col("bpe") < F.col("est")).count() == 0


def test_token_counter_seam_in_budget_and_packing(spark):
    """take_token_budget/pack_sequences accept token_counter= and
    budget/pack in REAL BPE tokens: the kept prefix and bin loads obey
    the counter's numbers, not the regex estimate's."""
    from datamunging_spark.operators.bpe import (
        bpe_encode,
        bpe_token_counter,
        load_fixture_merges,
        merges_to_ranks,
    )
    from datamunging_spark.operators.trainset import (
        pack_sequences,
        take_token_budget,
    )

    merges = load_fixture_merges()
    ranks = merges_to_ranks(merges)
    texts = [
        (0, "the quick brown fox. "),
        (1, "byte pair encoding merges frequent pairs. "),
        (2, "completely unseen zebra quagga xylophone!"),
        (3, "the the the the the"),
    ]
    counts = {i: len(bpe_encode(t, ranks)) for i, t in texts}
    df = spark.createDataFrame(texts, "doc_id long, text string")
    counter = bpe_token_counter(spark, merges)

    budget = counts[0] + counts[1]  # exactly two docs in doc_id order
    kept = take_token_budget(
        df, budget, order_cols=["doc_id"], token_counter=counter
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1]

    packed = pack_sequences(
        df, max_len=max(counts.values()), num_groups=1,
        token_counter=counter,
    )
    rows = packed.collect()
    assert {r["doc_id"]: r["n_tokens"] for r in rows} == counts
    per_bin: dict = {}
    for r in rows:
        per_bin.setdefault(r["bin_id"], []).append(r)
    for b, rs in per_bin.items():
        assert sum(r["n_tokens"] for r in rs) == rs[0]["bin_tokens"]
        assert rs[0]["bin_tokens"] <= max(counts.values())


def test_bpe_tiktoken_golden(spark):
    """Golden seam (importorskip, like the NER/PIL seams — tiktoken is
    not in this container): where tiktoken IS available, a
    tiktoken-backed counter plugs into the same token_counter= seam and
    its counts match driver-side enc.encode lengths exactly."""
    tiktoken = pytest.importorskip("tiktoken")
    try:
        enc = tiktoken.get_encoding("gpt2")
    except Exception as e:  # vocab fetch needs network
        pytest.skip(f"tiktoken vocab unavailable: {e}")
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import types as T

    from datamunging_spark.operators.trainset import take_token_budget

    def tiktoken_counter(col):
        @pandas_udf(T.LongType())
        def count(s):
            return pd.Series(
                [None if t is None else len(enc.encode(t)) for t in s],
                dtype="object",
            )

        return count(F.col(col) if isinstance(col, str) else col)

    texts = [(0, "hello world"), (1, "the quick brown fox"), (2, None)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", tiktoken_counter("text").alias("n")
        ).collect()
    }
    for i, t in texts:
        assert got[i] == (None if t is None else len(enc.encode(t)))
    kept = take_token_budget(
        df.filter(F.col("text").isNotNull()),
        len(enc.encode("hello world")),
        order_cols=["doc_id"],
        token_counter=tiktoken_counter,
    )
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_token_counter_seam_null_text_clamps(spark):
    """r11 review catch: the counter maps NULL text -> NULL count;
    pack_sequences must clamp that to 0 (its documented non-positive
    behavior), not crash int(NaN), and take_token_budget's greatest()
    clamp must keep NULL-count rows from consuming budget."""
    from datamunging_spark.operators.bpe import (
        bpe_token_counter,
        load_fixture_merges,
    )
    from datamunging_spark.operators.trainset import (
        pack_sequences,
        take_token_budget,
    )

    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, None), (2, "byte pair")],
        "doc_id long, text string",
    )
    counter = bpe_token_counter(spark, load_fixture_merges())
    packed = pack_sequences(
        df, max_len=64, num_groups=1, token_counter=counter
    ).collect()
    by_id = {r["doc_id"]: r for r in packed}
    assert len(by_id) == 3
    assert by_id[1]["n_tokens"] is None  # count passes through untouched
    # zero-token doc joins an open bin, never inflates bin_tokens
    assert by_id[1]["truncated"] is False
    kept = take_token_budget(
        df, 10_000, order_cols=["doc_id"], token_counter=counter
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2]


def test_bpe_merges_file_hash_pair_roundtrips(tmp_path):
    """r11 review catch: a legitimate ('#','#') merge must survive the
    merges-file round trip (comment detection is no-TAB, not
    leading-#)."""
    from datamunging_spark.operators.bpe import (
        load_fixture_merges,
        write_merges,
    )

    p = str(tmp_path / "m.txt")
    write_merges([("#", "#"), ("a", "b")], p)
    assert load_fixture_merges(p) == [("#", "#"), ("a", "b")]


def test_bpe_ids_roundtrip_and_vocab_total():
    """The self-consistent id space is total (every emitted token has
    an id) and byte-level encode∘decode is the identity — including
    multibyte utf-8, emoji, and text full of unseen words."""
    from datamunging_spark.operators.bpe import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_vocab,
        load_fixture_merges,
        merges_to_ranks,
    )

    merges = load_fixture_merges()
    ranks, vocab = merges_to_ranks(merges), bpe_vocab(merges)
    assert len(vocab) == 256 + len(merges)
    for text in [
        "the quick brown fox jumps over the lazy dog.",
        "naïve café — déjà vu! 🚀 日本語テキスト",
        "", "\n\t  mixed\nwhitespace ", "unseen zyzzyva qoph #### 123",
    ]:
        ids = bpe_encode_ids(text, ranks, vocab)
        assert bpe_decode_ids(ids, merges) == text, text


def test_bpe_tokenizer_distributed_matches_driver(spark):
    """The Arrow tokenizer face returns exactly the driver helper's id
    sequence per row (NULL -> NULL), and sum(len) == counter's count."""
    from datamunging_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_token_counter,
        bpe_tokenizer,
        bpe_vocab,
        load_fixture_merges,
        merges_to_ranks,
    )

    merges = load_fixture_merges()
    ranks, vocab = merges_to_ranks(merges), bpe_vocab(merges)
    texts = [(0, "byte pair encoding"), (1, None), (2, "café 123!")]
    df = spark.createDataFrame(texts, "i long, text string")
    tok = bpe_tokenizer(spark, merges)
    cnt = bpe_token_counter(spark, merges)
    rows = {
        r["i"]: r
        for r in df.select(
            "i", tok("text").alias("ids"), cnt("text").alias("n")
        ).collect()
    }
    for i, t in texts:
        if t is None:
            assert rows[i]["ids"] is None and rows[i]["n"] is None
        else:
            assert rows[i]["ids"] == bpe_encode_ids(t, ranks, vocab)
            assert rows[i]["n"] == len(rows[i]["ids"])


def test_concat_packed_sequences_windows(spark):
    """concat_packed_sequences emits real context windows: per bin, the
    member docs' id arrays concatenated in doc_id order, window length
    == bin_tokens <= max_len (truncated singletons excepted), NULL id
    arrays contribute nothing, and the full corpus token stream is
    conserved across windows."""
    from datamunging_spark.operators.trainset import concat_packed_sequences

    docs = [
        (0, [1, 2, 3]),
        (1, [4, 5]),
        (2, [6]),
        (3, None),
        (4, list(range(100, 120))),  # oversize at max_len=8 -> truncated
    ]
    df = spark.createDataFrame(docs, "doc_id long, token_ids array<int>")
    out = concat_packed_sequences(df, max_len=8, num_groups=1).collect()
    all_ids = sorted(i for r in out for i in r["token_ids"])
    assert all_ids == sorted([1, 2, 3, 4, 5, 6] + list(range(100, 120)))
    for r in out:
        assert len(r["token_ids"]) == r["bin_tokens"]
        if not r["truncated"]:
            assert r["bin_tokens"] <= 8
        else:
            assert r["n_docs"] == 1 and r["bin_tokens"] == 20
    # deterministic doc order within a bin: doc 0's ids precede doc 1's
    # wherever they share a bin
    for r in out:
        ids = r["token_ids"]
        if 1 in ids and 4 in ids:
            assert ids.index(1) < ids.index(4)
    # second run identical (deterministic end-to-end)
    again = concat_packed_sequences(df, max_len=8, num_groups=1).collect()
    assert sorted(map(str, again)) == sorted(map(str, out))


def test_concat_packed_sequences_with_bpe_tokenizer(spark):
    """End-to-end: bpe_tokenizer ids -> packed windows; every window
    decodes back to the concatenation of its member docs' text."""
    from datamunging_spark.operators.bpe import (
        bpe_decode_ids,
        bpe_tokenizer,
        load_fixture_merges,
    )
    from datamunging_spark.operators.trainset import concat_packed_sequences

    merges = load_fixture_merges()
    texts = {0: "the quick brown fox. ", 1: "byte pair encoding. ",
             2: "data processing engines. "}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    ).withColumn("token_ids", bpe_tokenizer(spark, merges)("text"))
    out = concat_packed_sequences(df, max_len=4096, num_groups=1).collect()
    assert len(out) == 1  # everything fits one window
    decoded = bpe_decode_ids(out[0]["token_ids"], merges)
    assert decoded == texts[0] + texts[1] + texts[2]


def test_concat_packed_sequences_empty_input(spark):
    """Empty corpus -> empty window table, stable 5-column schema."""
    from datamunging_spark.operators.trainset import concat_packed_sequences

    df = spark.createDataFrame([], "doc_id long, token_ids array<int>")
    out = concat_packed_sequences(df, max_len=8, num_groups=1)
    assert out.columns == [
        "bin_id", "bin_tokens", "n_docs", "truncated", "token_ids"
    ]
    assert out.count() == 0


def test_concat_packed_sequences_rejects_null_and_dup_ids(spark):
    """id_col is a join key: a NULL id raises at the row guard, a
    duplicate id raises at the per-bin window-length guard — neither
    silently emits short/oversized windows (r11 review catch)."""
    import pytest

    from datamunging_spark.operators.trainset import concat_packed_sequences

    nulled = spark.createDataFrame(
        [(0, [1, 2]), (None, [3, 4, 5])],
        "doc_id long, token_ids array<int>",
    )
    with pytest.raises(Exception, match="unique and non-null"):
        concat_packed_sequences(nulled, max_len=8, num_groups=1).collect()

    duped = spark.createDataFrame(
        [(0, [1, 2]), (0, [3, 4, 5]), (1, [6])],
        "doc_id long, token_ids array<int>",
    )
    with pytest.raises(Exception, match="unique and non-null"):
        concat_packed_sequences(duped, max_len=8, num_groups=1).collect()


def test_concat_packed_sequences_split_oversize(spark):
    """split_oversize=True: oversized docs chunk into max_len slices
    before packing — no truncated rows, every window <= max_len, the
    corpus token stream is conserved, and a doc's chunks appear in
    order across the windows' concatenation."""
    from datamunging_spark.operators.trainset import concat_packed_sequences

    big = list(range(100, 120))  # 20 tokens, max_len=8 -> 8+8+4
    docs = [(0, [1, 2, 3]), (1, big), (2, [4, 5])]
    df = spark.createDataFrame(docs, "doc_id long, token_ids array<int>")
    out = concat_packed_sequences(
        df, max_len=8, num_groups=1, split_oversize=True
    ).collect()
    assert not any(r["truncated"] for r in out)
    assert all(r["bin_tokens"] <= 8 for r in out)
    assert all(len(r["token_ids"]) == r["bin_tokens"] for r in out)
    all_ids = sorted(i for r in out for i in r["token_ids"])
    assert all_ids == sorted([1, 2, 3, 4, 5] + big)
    # chunk order: within any single window, the big doc's ids that
    # appear are a contiguous ascending run of `big`
    for r in out:
        sub = [i for i in r["token_ids"] if i in set(big)]
        if sub:
            k = big.index(sub[0])
            assert sub == big[k:k + len(sub)]
    # determinism across runs
    again = concat_packed_sequences(
        df, max_len=8, num_groups=1, split_oversize=True
    ).collect()
    assert sorted(map(str, again)) == sorted(map(str, out))


def test_bpe_train_distributed_matches_local(spark):
    """The distributed trainer (JVM pretoken frequency agg + shared
    greedy loop) reproduces bpe_train exactly on the fixture corpus,
    prunes with min_freq, and fail-fasts on the collect cap."""
    import pytest

    from datamunging_spark.operators.bpe import (
        bpe_train,
        bpe_train_distributed,
        fixture_corpus,
    )

    texts = fixture_corpus()
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_train_distributed(df, n_merges=40) == bpe_train(texts, 40)
    # NULL text rows contribute nothing
    with_null = spark.createDataFrame(
        [(t,) for t in texts] + [(None,)], "text string"
    )
    assert bpe_train_distributed(with_null, n_merges=40) == bpe_train(
        texts, 40
    )
    # min_freq prunes the hapax tail: training still works, merges may
    # differ from the unpruned run
    pruned = bpe_train_distributed(df, n_merges=10, min_freq=3)
    assert len(pruned) == 10
    # cap fail-fast
    with pytest.raises(ValueError, match="distinct pretokens"):
        bpe_train_distributed(df, n_merges=5, max_distinct_pretokens=3)
    # empty corpus: no pretokens, no merges, no crash
    empty = spark.createDataFrame([], "text string")
    assert bpe_train_distributed(empty, n_merges=8) == []


def test_bpe_vocab_duplicate_concat_first_rank_wins():
    """Distinct merges with colliding concatenations (('a','b') then
    ('ab','c') and ('a','bc') both minting 'abc') keep the LOWEST-rank
    id, encode emits that id consistently, and decode stays lossless;
    the committed fixture itself is collision-free."""
    from datamunging_spark.operators.bpe import (
        bpe_decode_ids,
        bpe_encode_ids,
        bpe_vocab,
        load_fixture_merges,
        merges_to_ranks,
    )

    merges = [("a", "b"), ("b", "c"), ("ab", "c"), ("a", "bc")]
    vocab = bpe_vocab(merges)
    assert vocab["abc"] == 256 + 2          # first minting rank wins
    assert len(vocab) == 256 + 3            # one id lost to the collision
    ids = bpe_encode_ids("abcabc", merges_to_ranks(merges), vocab)
    assert 256 + 3 not in ids               # the shadowed id never emits
    assert bpe_decode_ids(ids, merges) == "abcabc"
    # fixture sanity: trainer output has no collisions
    fx = load_fixture_merges()
    assert len(bpe_vocab(fx)) == 256 + len(fx)


def test_write_training_shards_empty_corpus(spark, tmp_path):
    """Empty corpus: zero-shard manifest, no crash — and the conf-read
    path works on sessions that never set shuffle.partitions (Spark 4
    validates explicit conf.get defaults, so conf.get(key, '') throws
    on a plain session — r11 regression)."""
    import json

    from datamunging_spark.operators.relational import _shuffle_partitions
    from datamunging_spark.operators.trainset import write_training_shards

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.unset("spark.sql.shuffle.partitions")
        assert _shuffle_partitions(spark) >= 1  # must not raise
        empty = spark.createDataFrame([], "doc_id long, n_tokens long")
        p = str(tmp_path / "sh")
        assert write_training_shards(
            empty, p, shard_tokens=100, order_cols=["doc_id"]
        ) == []
        m = json.loads((tmp_path / "sh" / "_MANIFEST.json").read_text())
        assert m["n_shards"] == 0 and m["total_tokens"] == 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_cap_tokens_per_group_budgets(spark):
    """Per-group token budgets: keep-while-cumsum<=budget per group in
    salted order (the take_token_budget contract, per group), dict-miss
    groups dropped unless default_budget, NULL/negative counts clamp,
    salt re-deals deterministically."""
    from datamunging_spark.operators.trainset import cap_tokens_per_group

    rows = (
        [(i, "web", 10) for i in range(10)]        # 100 web tokens
        + [(100 + i, "code", 10) for i in range(4)]
        + [(200, "misc", 10), (201, "web", None), (202, "web", -5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = cap_tokens_per_group(
        df, {"web": 30, "code": 1000}, id_cols=["doc_id"], salt="s1"
    )
    # FULL Python reference of the keep set: the salted order is
    # portable md5("s1|id"), the contract is keep-while-inclusive-
    # cumsum-of-CLAMPED-tokens <= budget — so any drift (clamp removed,
    # boundary off-by-one, order change) fails this equality, not just
    # a loose <= bound
    import hashlib

    def ref_keep(group, budget):
        members = sorted(
            ((i, t) for i, g, t in rows if g == group),
            key=lambda it: hashlib.md5(f"s1|{it[0]}".encode()).hexdigest(),
        )
        run, keep = 0, set()
        for i, t in members:
            run += max(t or 0, 0)
            if run <= budget:
                keep.add(i)
        return keep

    want = ref_keep("web", 30) | ref_keep("code", 1000)
    assert {r["doc_id"] for r in out.collect()} == want
    by = {
        r["source"]: (r["n"], r["t"])
        for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.greatest("n_tokens", F.lit(0))).alias("t"),
        ).collect()
    }
    assert by["web"][1] == 30        # exactly three 10-token docs fit
    assert by["code"] == (4, 40)     # whole group fits
    assert "misc" not in by          # dict miss, no default -> dropped
    # NULL/negative clamp to 0: they can be kept without consuming budget
    # default budget admits the miss group
    withdef = cap_tokens_per_group(
        df, {"web": 30}, id_cols=["doc_id"], default_budget=1000
    )
    assert withdef.filter("source = 'misc'").count() == 1
    assert withdef.filter("source = 'code'").count() == 4
    # int budget applies to every group
    allcap = cap_tokens_per_group(df, 20, id_cols=["doc_id"])
    per = {
        r["source"]: r["t"]
        for r in allcap.groupBy("source")
        .agg(F.sum(F.greatest("n_tokens", F.lit(0))).alias("t"))
        .collect()
    }
    assert all(t <= 20 for t in per.values())
    # deterministic per salt, re-deals with another
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in cap_tokens_per_group(
            df, {"web": 30, "code": 1000}, id_cols=["doc_id"], salt="s1"
        ).collect()
    )
    assert a == b
    c = sorted(
        r["doc_id"]
        for r in cap_tokens_per_group(
            df, {"web": 30, "code": 1000}, id_cols=["doc_id"], salt="s2"
        ).collect()
    )
    assert a != c
    # empty input, validation
    import pytest

    empty = spark.createDataFrame([], "doc_id long, source string, n_tokens int")
    assert cap_tokens_per_group(empty, 10, id_cols=["doc_id"]).count() == 0
    with pytest.raises(ValueError, match="id_cols"):
        cap_tokens_per_group(df, 10, id_cols=[])
    with pytest.raises(ValueError, match="default_budget"):
        cap_tokens_per_group(df, 10, id_cols=["doc_id"], default_budget=5)
    # r11 ADVICE: a None KEY budgets the NULL group explicitly —
    # create_map rejects NULL keys, so it rides an isNull branch
    nrows = [(0, None, 10), (1, None, 10), (2, "web", 10)]
    ndf = spark.createDataFrame(
        nrows, "doc_id long, source string, n_tokens int"
    )
    nby = {
        r["source"]: (r["n"], r["t"])
        for r in cap_tokens_per_group(
            ndf, {None: 10, "web": 100}, id_cols=["doc_id"]
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert nby[None] == (1, 10)   # one 10-token doc fits the NULL budget
    assert nby["web"] == (1, 10)
    # None-key-only dict: every non-NULL group is a dict miss (dropped)
    only = cap_tokens_per_group(ndf, {None: 20}, id_cols=["doc_id"])
    assert [r["source"] for r in only.collect()] == [None, None]
    # default_budget still covers non-NULL misses alongside the None key
    defd = cap_tokens_per_group(
        ndf, {None: 10}, id_cols=["doc_id"], default_budget=100
    )
    assert defd.filter("source = 'web'").count() == 1
    assert defd.filter("source IS NULL").count() == 1


def test_split_shuffle_matches_duckdb_oracle(spark):
    """The retired x5_split_shuffle gate row's DuckDB cross-check,
    preserved verbatim per the retirement protocol (r12 — slot given to
    x2_bm25_hybrid): 90/5/5 salted-md5 split + epoch-salted shuffle key
    re-derived in SQL. Split cuts: fixed-width lowercase-hex string
    compare == numeric compare on the first-8-hex-chars value; cut
    constants are printf('%08x', int(cum_weight * 16**8)) computed with
    the SAME float accumulation as split_dataset (0.9, then 0.9+0.05)."""
    import duckdb

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in entrymod.q_x5_split_shuffle(spark, sf).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            """
            SELECT doc_id, source,
                   CASE WHEN substr(md5(concat('v1', '|', CAST(doc_id AS VARCHAR))), 1, 8)
                             < 'e6666666' THEN 'train'
                        WHEN substr(md5(concat('v1', '|', CAST(doc_id AS VARCHAR))), 1, 8)
                             < 'f3333333' THEN 'val'
                        ELSE 'test' END AS split,
                   md5(concat('epoch0', '|', CAST(doc_id AS VARCHAR))) AS shuffle_key
            FROM documents
            """
        ).fetchall()
    )
    assert got == want
