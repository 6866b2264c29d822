"""X1 dedup + X2 similarity: planted-duplicate recall and exact top-k."""

import pytest
from pyspark.sql import functions as F

from datamunging_spark.operators.dedup import (
    dup_groups,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash,
)
from datamunging_spark.operators.similarity import brute_force_topk, lsh_topk


@pytest.fixture(scope="module")
def docs_with_dups(spark, tables):
    """Driver docs + planted exact and near duplicates."""
    base = tables["documents"].limit(50)
    exact = base.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    near = (
        base.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" xtra token")))
    )
    return base.union(exact).union(near)


def test_exact_dedup_removes_planted(docs_with_dups):
    out = exact_dedup(docs_with_dups)
    assert out.count() == 55  # 50 base + 5 near (not exact) survive
    assert out.filter(F.col("doc_id") >= 100000).filter(
        F.col("doc_id") < 200000
    ).count() == 0  # planted exact dups lost to min-id originals


def test_dup_groups(docs_with_dups):
    g = dup_groups(docs_with_dups)
    assert g.count() == 5
    assert g.agg(F.max("n_dups")).first()[0] == 2


def test_minhash_recall_on_near_dups(docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, num_hashes=64, bands=16)
    found = {
        (r["id_a"], r["id_b"]) for r in pairs.collect()
    }
    planted = {(i, i + 200000) for i in range(5)}
    base_ids = [r["doc_id"] for r in docs_with_dups.select("doc_id").collect()]
    planted = {(i, i + 200000) for i in base_ids if i + 200000 in base_ids or i < 50}
    # recall: every planted near-dup pair (and exact pair) is a candidate
    near_expected = {(r, r + 200000) for r in sorted(base_ids)[:5]}
    exact_expected = {(r, r + 100000) for r in sorted(base_ids)[:5]}
    assert near_expected <= found
    assert exact_expected <= found


def test_minhash_dedup_drops_near(docs_with_dups):
    out = minhash_dedup(docs_with_dups, threshold=0.5)
    assert out.filter(F.col("doc_id") >= 100000).count() == 0
    # all 10 planted copies dropped; the driver corpus itself contains
    # planted near-dup pairs (FIXTURES.md F2), so a few base docs may
    # legitimately dedup away too.
    assert 45 <= out.count() <= 50


def test_simhash_near_dups_close(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy cat again and again"),
            (3, "completely different content about spark query engines here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["h"] for r in df.select("doc_id", simhash("text").alias("h")).collect()}
    def hamming(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")
    assert hamming(out[1], out[2]) < hamming(out[1], out[3])


def test_curate_corpus_pipeline(docs_with_dups):
    """X1+X4 pipeline: near-dups dropped, short docs filtered, survivors
    keep the lowest id per content group; report rates are consistent."""
    from datamunging_spark.operators.pipeline import curate_corpus, curation_report

    out = curate_corpus(
        docs_with_dups, min_tokens=2, fuzzy=True, fuzzy_threshold=0.5
    )
    n_in, n_out = docs_with_dups.count(), out.count()
    assert 0 < n_out < n_in  # planted exact + near dups removed
    rep = curation_report(docs_with_dups, out).first()
    assert rep["n_in"] == n_in and rep["n_out"] == n_out
    assert abs(rep["survival_rate"] - n_out / n_in) < 1e-6


def test_ngram_jaccard(spark):
    df = spark.createDataFrame([("a b c d e", "a b c d x")], ["t1", "t2"])
    v = df.select(ngram_jaccard(F.col("t1"), F.col("t2"), 2).alias("j")).first()["j"]
    assert 0 < v < 1


def test_brute_force_topk_exact(tables, spark):
    emb = tables["embeddings"]
    probes = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(probes, emb, k=5)
    rows = out.collect()
    assert len(rows) == 15
    # verify against a local numpy oracle
    import numpy as np

    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for qid in range(3):
        q = data[qid]
        sims = {
            cid: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for cid, v in data.items() if cid != qid
        }
        expect = sorted(sims, key=lambda c: (-sims[c], c))[:5]
        got = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])
               if r["query_id"] == qid]
        assert got == expect


def test_lsh_topk_recall(tables):
    emb = tables["embeddings"]
    probes = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(probes, emb, k=5).filter(F.col("rank") <= 1)
    approx = lsh_topk(probes, emb, k=5, n_planes=4, n_tables=16)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # recall@top1 with 8-table OR-amplification: most exact top-1s found
    assert len(e & a) >= len(e) // 2
