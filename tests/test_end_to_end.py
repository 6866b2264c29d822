"""The user-story test: a mini crawl goes from raw JSONL shards to a
packed, split training set through the engine's own operators only —
the composition a real pipeline runs, exercised end to end so schema or
contract drift between operators fails HERE, not in production.

Chain: read_jsonl (declared schema, corrupt-line quarantine) → strip_html
→ url_dedup → curate_corpus (quality gates + gopher + line dedup + exact
+ fuzzy) → corpus_report census → split_dataset → pack_sequences.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("url", StringType()),
        StructField("html", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def _page(body: str) -> str:
    return (
        "<html><head><style>p{margin:0}</style></head><body>"
        f"<p>{body}</p><div>nav home about contact</div></body></html>"
    )


def _body(stem: str) -> str:
    """A stopword-rich, Gopher-passing body unique to ``stem`` (every
    content word carries the stem, so different stems share almost no
    shingles and are NOT near-dups of each other)."""
    return (
        f"the {stem} report says that we have to be sure of the outcome and "
        + " ".join(
            f"{stem}{i} with the {stem} data that have been seen of it"
            for i in range(8)
        )
    )


GOOD = _body("alpha")


@pytest.fixture(scope="module")
def shards(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    rows1 = [
        (1, "https://www.a.com/x?utm_source=t", _page(GOOD)),
        (2, "http://a.com/x/", _page("different text same url")),  # url dup of 1
        (3, "https://b.org/p", _page(_body("beta"))),
    ]
    rows2 = [
        (4, "https://c.net/q", _page(GOOD + " tail")),  # near-dup of 1
        (5, "https://d.io/r", _page(" ".join(f"zx{i}q" for i in range(80)))),  # gibberish
        (6, "https://e.dev/s", _page(_body("gamma") + " \n gamma line \n gamma line")),
    ]
    import json

    for name, rows in (("s1.jsonl", rows1), ("s2.jsonl", rows2)):
        with open(root / name, "w") as fh:
            for i, u, h in rows:
                fh.write(json.dumps({"doc_id": i, "url": u, "html": h}) + "\n")
            if name == "s2.jsonl":
                fh.write('{"doc_id": 99, "html": "unterminated\n')  # corrupt
    return str(root)


def test_crawl_to_training_set(spark, shards, tmp_path):
    from datamunging_spark.functions import strip_html, token_count
    from datamunging_spark.operators.dedup import url_dedup
    from datamunging_spark.operators.pipeline import curate_corpus
    from datamunging_spark.operators.quality import corpus_report
    from datamunging_spark.operators.trainset import (
        pack_sequences,
        split_dataset,
    )
    from datamunging_spark.sources.io import read_jsonl

    raw = read_jsonl(spark, shards, SCHEMA).localCheckpoint()
    clean = raw.filter(F.col("_corrupt_record").isNull())
    assert raw.count() == 7 and clean.count() == 6  # corrupt line quarantined

    docs = clean.select(
        "doc_id",
        "url",
        strip_html("html").alias("text"),
    ).withColumn("source", F.lit("crawl"))
    assert docs.filter(F.col("text").contains("<p>")).count() == 0

    deduped_urls = url_dedup(docs)  # 2 loses to 1 on canonical URL
    assert sorted(r["doc_id"] for r in deduped_urls.collect()) == [1, 3, 4, 5, 6]

    curated = curate_corpus(
        deduped_urls,
        min_tokens=10,
        fuzzy=True,
        fuzzy_threshold=0.5,
        gopher=True,
        line_dedup=True,
    ).localCheckpoint()
    kept = sorted(r["doc_id"] for r in curated.collect())
    # 4 is a near-dup of 1 (fuzzy), 5 fails the stopword gate; 1/3/6 stay
    assert kept == [1, 3, 6]

    census = {r["source"]: r.asDict() for r in corpus_report(curated).collect()}
    assert census["crawl"]["n_docs"] == 3 and census["crawl"]["dup_rate"] == 0.0

    split = split_dataset(
        curated, {"train": 0.8, "val": 0.2}, id_cols=["doc_id"]
    )
    assert split.count() == 3
    assert {r["split"] for r in split.collect()} <= {"train", "val"}

    packed = pack_sequences(
        split.select(
            "doc_id", token_count("text").cast("long").alias("n_tokens")
        ),
        max_len=2048,
        num_groups=1,
    )
    rows = packed.collect()
    assert len(rows) == 3
    assert all(r["bin_tokens"] <= 2048 or r["truncated"] for r in rows)


def test_curate_corpus_lm_filter_drops_exact_tail(spark, tables):
    """curate_corpus(lm_filter=True) must equal the hand-composed pipeline:
    fit the unigram LM on the (pass-all-gates) corpus, drop the bottom
    lm_tail quantile by mean logprob, then exact-dedup — stage order and
    cut semantics pinned exactly."""
    from datamunging_spark.operators.dedup import exact_dedup
    from datamunging_spark.operators.pipeline import curate_corpus
    from datamunging_spark.operators.text import (
        lm_quality_score,
        unigram_lm_fit,
    )

    docs = tables["documents"].select("doc_id", "text", "source")
    blank = spark.createDataFrame(
        [(990009, "   ", "blank")], ["doc_id", "text", "source"]
    )
    corpus = docs.unionByName(blank)
    got = curate_corpus(
        corpus,
        min_tokens=0,
        max_repetition=1.0,
        fuzzy=False,
        lm_filter=True,
        lm_tail=0.3,
    )
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    # zero-token docs have no LM score and must NOT bypass the quality
    # stage (survivor semi-join, not loser anti-join)
    assert 990009 not in got_ids

    lm = unigram_lm_fit(corpus)
    scored = lm_quality_score(corpus, lm)
    cut = scored.agg(F.percentile("lm_score", F.lit(0.3)).alias("c")).collect()[
        0
    ]["c"]
    surv = scored.filter(F.col("lm_score") > cut).select("doc_id")
    expected = exact_dedup(corpus.join(surv, "doc_id", "semi"))
    exp_ids = {r["doc_id"] for r in expected.select("doc_id").collect()}
    assert got_ids == exp_ids
    assert len(got_ids) < corpus.count()  # the tail actually went


def test_curate_corpus_gopher_rep_stage(spark, tables):
    """gopher_rep=True drops exactly the repetition_pass=False docs (here: a
    planted one-line-repeated spam doc) and composes with the word gates."""
    from datamunging_spark.operators.pipeline import curate_corpus
    from datamunging_spark.operators.text import gopher_repetition_flags

    docs = tables["documents"].select("doc_id", "text", "source")
    spam = spark.createDataFrame(
        [(990001, "buy now\n" * 40, "spam")], ["doc_id", "text", "source"]
    )
    corpus = docs.unionByName(spam)
    out = curate_corpus(
        corpus, min_tokens=0, max_repetition=1.0, fuzzy=False, gopher_rep=True
    )
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 990001 not in kept
    expected_fail = {
        r["doc_id"]
        for r in gopher_repetition_flags(corpus)
        .filter(~F.col("repetition_pass"))
        .select("doc_id")
        .collect()
    }
    # exactly the repetition failures are missing (before exact dedup,
    # which only removes additional identical-content copies)
    assert expected_fail.isdisjoint(kept)


def test_full_stack_training_pipeline_composition(spark, tables):
    """Every round-6 stage composed end-to-end on the driver corpus:
    quality gates (word+repetition) → LM tail filter → exact+fuzzy dedup →
    SEMANTIC dedup via feature-hashed embeddings → deterministic split →
    temperature rebalance → token budget → packing → shard assignment.
    Asserts the cross-stage contracts (monotone shrinkage through filters,
    id subsets, no duplicate (id, copy) pairs, packing caps, contiguous
    shards) rather than any one stage's internals — this is the test that
    catches column collisions and schema drift BETWEEN operators."""
    from datamunging_spark.functions import token_count
    from datamunging_spark.operators.dedup import semantic_dedup
    from datamunging_spark.operators.pipeline import curate_corpus
    from datamunging_spark.operators.text import hashed_embeddings
    from datamunging_spark.operators.trainset import (
        assign_token_shards,
        pack_sequences,
        split_dataset,
        take_token_budget,
        temperature_mix,
    )

    docs = tables["documents"].select("doc_id", "text", "source")
    n0 = docs.count()

    curated = curate_corpus(
        docs,
        min_tokens=5,
        gopher_rep=True,
        lm_filter=True,
        lm_tail=0.2,
        fuzzy=True,
        fuzzy_threshold=0.5,
    ).localCheckpoint()
    n1 = curated.count()
    assert 0 < n1 < n0

    emb = hashed_embeddings(curated, dim=64)
    survivors = semantic_dedup(emb, threshold=0.999, n_clusters=4)
    keep = curated.join(survivors.select("doc_id"), "doc_id", "semi")
    n2 = keep.count()
    assert 0 < n2 <= n1

    split = split_dataset(
        keep, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"], salt="v1"
    )
    train = split.filter(F.col("split") == "train").drop("split")
    assert 0 < train.count() < n2

    mixed = temperature_mix(train, temperature=3.0)
    # (doc_id, copy) is the post-mix identity — no duplicates
    assert (
        mixed.groupBy("doc_id", "copy").count().filter(F.col("count") > 1).count()
        == 0
    )

    sized = mixed.withColumn("n_tokens", token_count(F.col("text")))
    kept_budget = take_token_budget(
        sized, budget=5000, order_cols=["doc_id", "copy"]
    )
    total = kept_budget.agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
    assert total is not None and total <= 5000

    packed = pack_sequences(kept_budget, max_len=512).localCheckpoint()
    over = packed.groupBy("bin_id").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(512))).alias("s")
    ).filter(F.col("s") > 512)
    assert over.count() == 0

    sharded = assign_token_shards(
        kept_budget, shard_tokens=2000, order_cols=["doc_id", "copy"]
    )
    shards = sorted(
        r["shard"] for r in sharded.select("shard").distinct().collect()
    )
    assert shards == list(range(len(shards)))  # contiguous shard ids
    assert sharded.count() == kept_budget.count()


def test_curate_corpus_c4_stage(spark):
    """c4=True: line cleaning runs before the gates (the cleaned text
    is what survives) and the page flags filter; pages failing a C4
    page rule drop while clean pages keep their cleaned text."""
    from datamunging_spark.operators.pipeline import curate_corpus

    good = "\n".join(
        ["A full sentence with enough words right here.",
         "no punctuation so this line goes away",
         "Another proper sentence follows with more words.",
         "And a third full sentence closes the page nicely."]
    )
    brace = "Code page { with braces. Two sentences. Three sentences."
    rows = [(0, good, "web"), (1, brace, "web")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = curate_corpus(df, fuzzy=False, c4=True, min_tokens=3)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {0}
    assert "no punctuation" not in got[0]
    assert got[0].count("\n") == 2  # three surviving lines
