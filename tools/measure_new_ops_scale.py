"""Measure the round-6 additions at 1x vs 10x input — the SCALE.md probe
for operators whose contract says cost tracks a controllable knob:

* semantic dedup: within-cell pair volume is quadratic in cell SIZE, so
  the published contract is "grow n_clusters with the corpus". Probe: 10x
  vectors with 1x clusters (cells 10x fatter -> ~100x pairs, the
  anti-pattern) vs 10x vectors with 10x clusters (constant cell size ->
  ~10x pairs, the contract) — wall-time should follow pair volume.
* unigram-LM fit+score: one explode + two hash aggs + a broadcast join —
  should scale ~linearly in tokens.
* substring decontamination: corpus_rows x probes char scans — linear in
  corpus for a fixed probe set.
* PQ encode + ADC search: one Arrow pass each over the corpus/codes —
  linear in vectors for a fixed query batch.
* span dedup (r7): fingerprints are linear in corpus chars; candidate
  pairs track genuine duplicate MASS, not corpus size. Probe: 10x the
  corpus where each copy's text is alphabet-rotated (so copies share no
  content and the duplicate mass merely replicates 10x) — wall-time
  should scale ~linearly, NOT quadratically in copies.

Usage: python tools/measure_new_ops_scale.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datamunging_spark import get_spark
from datamunging_spark.operators.dedup import semantic_neardup_pairs
from datamunging_spark.operators.text import lm_quality_score, unigram_lm_fit
from datamunging_spark.operators.trainset import decontaminate_substring
from datamunging_spark.sources import load_tables


def timed(label, fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    print(f"| {label} | {n} | {best:.2f} |")


def replicate(df, id_col, copies, jitter=None):
    out = []
    for k in range(copies):
        c = df.withColumn(id_col, F.col(id_col) + F.lit(k * 10_000_000))
        if jitter is not None:
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding", lambda x: x + F.lit(float(k) * jitter)
                ),
            )
        out.append(c)
    r = out[0]
    for c in out[1:]:
        r = r.unionByName(c)
    return r


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"].select("vec_id", "embedding").localCheckpoint()
    docs = t["documents"].select("doc_id", "source", "text").localCheckpoint()
    emb10 = replicate(emb, "vec_id", 10, jitter=0.05).localCheckpoint()
    docs10 = replicate(docs, "doc_id", 10).localCheckpoint()

    print("| probe | rows out | best wall (s) |")
    print("|---|---|---|")
    timed("semantic pairs 1x vectors, 16 cells", lambda: semantic_neardup_pairs(
        emb, id_col="vec_id", threshold=0.35, n_clusters=16).count())
    timed("semantic pairs 10x vectors, 16 cells (anti-pattern)",
          lambda: semantic_neardup_pairs(
              emb10, id_col="vec_id", threshold=0.35, n_clusters=16).count())
    timed("semantic pairs 10x vectors, 160 cells (contract)",
          lambda: semantic_neardup_pairs(
              emb10, id_col="vec_id", threshold=0.35, n_clusters=160).count())

    def lm(d):
        m = unigram_lm_fit(d.filter(F.col("doc_id") % 2 == 0))
        return lm_quality_score(d, m).count()

    timed("unigram LM fit+score 1x docs", lambda: lm(docs))
    timed("unigram LM fit+score 10x docs", lambda: lm(docs10))

    bench = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.substring(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")),
                    1, 48).alias("text")
    ).localCheckpoint()
    timed("substring decontam 1x corpus, fixed probes",
          lambda: decontaminate_substring(docs, bench, min_len=20).count())
    timed("substring decontam 10x corpus, fixed probes",
          lambda: decontaminate_substring(docs10, bench, min_len=20).count())

    from datamunging_spark.operators.similarity import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    cb = pq_fit(emb, m=8, k=64, iters=5, max_fit_rows=2000)
    probes = emb.filter(F.col("vec_id") < 8)

    def pq(corpus):
        return pq_topk(probes, pq_encode(corpus, cb), cb, k=5).count()

    timed("PQ encode+ADC search 1x vectors", lambda: pq(emb))
    timed("PQ encode+ADC search 10x vectors", lambda: pq(emb10))

    from datamunging_spark.operators.spandedup import shared_span_pairs

    alpha = "abcdefghijklmnopqrstuvwxyz"
    rotated = [
        docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * 10_000_000)
        ).withColumn(
            "text", F.translate("text", alpha, alpha[k:] + alpha[:k])
        )
        for k in range(10)
    ]
    docs10r = rotated[0]
    for c in rotated[1:]:
        docs10r = docs10r.unionByName(c)
    docs10r = docs10r.localCheckpoint()
    timed("span-dedup pairs 1x corpus", lambda: shared_span_pairs(
        docs, gram=24).count())
    timed("span-dedup pairs 10x corpus (rotated copies)",
          lambda: shared_span_pairs(docs10r, gram=24).count())


if __name__ == "__main__":
    main()
