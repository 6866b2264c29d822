"""Operator library (SURVEY.md §2). Each submodule groups one family:

  relational  — projection/filter/join/agg/window/set-ops (R7-R21, R25, §2.8)
  sampling    — Bernoulli/by-key/fixed-N/percentage (R26-R32)
  text        — tokenize/TF-IDF/n-grams/lang-ID/quality (R22-R23, R33-R37, X4)
  ml          — Word2Vec/PCA/projection (R38-R41)
  dedup       — exact + MinHash/SimHash/Jaccard near-dup (X1)
  spandedup   — cross-document exact-substring span dedup (X1, Lee et al.)
  bloom       — distributed Bloom build + probe (anti-join prefilter)
  sketch      — Misra-Gries heavy hitters (bounded-shuffle frequent items)
  similarity  — vector search: brute-force/LSH/IVF/PQ top-k, grouped +
                filtered + refine faces, index health & recall eval (X2)
  retrieval   — inverted index + BM25/BM25F/boolean/phrase/proximity,
                grouped + filtered faces, MLT/PRF/spell, RRF (X2 lexical)
  quality     — rule→invalid-rows validation reports (README.md:126-132 shape)
  multimodal  — binary payload columns + mapInPandas feature/resize,
                dHash image near-dup + incremental ingest (X3)
  pipeline    — end-to-end corpus curation (quality gates → dedup)
  trainset    — decontamination, source mixing, training shuffle (X5)
  bpe         — byte-level BPE tokenize/count/train (X5 real-token tier)
  selection   — DSIR hashed-ngram importance resampling (X5, Xie'23)
  entity      — record linkage: block → score → CC cluster (X6)
  history     — snapshot diffs + SCD-2 temporal build (X6 bookkeeping)
"""
