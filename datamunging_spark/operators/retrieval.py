"""Lexical retrieval over a document corpus — inverted index, BM25
ranked search, and reciprocal-rank fusion for hybrid (lexical +
vector) retrieval. The keyword half of the X2 search story: X2's
similarity module answers "which docs are NEAR this vector", this
module answers "which docs MATCH these terms", and :func:`rrf_fuse`
merges the two rankings the way production retrieval stacks do
(Cormack et al. 2009, "Reciprocal Rank Fusion outperforms Condorcet
and individual rank learning methods", SIGIR).

BM25 is Robertson/Sparck-Jones probabilistic ranking in the Lucene
parameterization (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond"):

    score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1)
                              / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
    idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

(the non-negative "+1" idf variant Lucene ships; query-side term
frequency is ignored, also the Lucene default). Repeated query terms
therefore contribute once — queries are sets of terms.

Scale shapes (the 100 TB story):

- **The index is ONE corpus shuffle, paid at build time.**
  :func:`inverted_index` is tokenize → explode → one
  map-side-combinable hash aggregate on (doc, term); the postings
  table (term, doc_id, tf, doc_len) is the materialization a user
  writes to parquet once. ``doc_len`` is denormalized into the
  postings row (8 bytes) so query-time scoring never joins back to a
  corpus-grain table — the Lucene norms-in-the-postings trade.
- **Query time never shuffles the index.** :func:`bm25_topk` semi-joins
  postings to the (broadcast) query-term list — one pushed-down scan,
  no exchange on the postings side — and every later join input is
  query-sized and broadcast. The only shuffle is the per-(query, doc)
  score aggregate over MATCHED postings.
- **df/N/avgdl are index-build artifacts.** :func:`term_stats` and
  :func:`index_stats` are computed once with the index; pass them in
  (the 100 TB path) and query-time df needs no second index scan. If
  ``dfreq`` is omitted, :func:`bm25_topk` derives it on the fly from
  the matched postings — correct (the semi-join keeps every posting of
  each query term) but it re-reads the postings branch; fine
  interactively, wasteful in a query loop.
- **Scores are decimal sums.** Each per-term contribution is cast to
  ``decimal(28,7)`` before the aggregate (the DSIR discipline), so the
  total is reduction-order-free and byte-reproducible in any engine —
  which is what makes the gate row a full DuckDB oracle.
- **Fusion is rank-space.** RRF needs only the two (query, doc, rank)
  top-k tables — k·|queries| rows each, broadcastable; the fused score
  is a fixed-order expression over at most len(rankings) doubles, no
  float aggregation.

Tokenization is the repo's space-split parity form (functions.tokenize
/ the r33 TF-IDF oracle): lowercase then split on single spaces,
dropping empty tokens — byte-reproducible in DuckDB as
``string_split(lower(text), ' ')``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "search_terms",
    "inverted_index",
    "index_stats",
    "term_stats",
    "bm25_topk",
    "boolean_topk",
    "phrase_topk",
    "rrf_fuse",
    "advance_index",
    "combine_index_stats",
    "stats_from_postings",
]

_CONTRIB_DECIMAL = "decimal(28,7)"


def _bm25_parts(k1: float, b: float) -> tuple[Column, Column]:
    """The (idf, tfn) column pair of the BM25 contribution — ONE home
    for the formula both :func:`bm25_topk` and :func:`boolean_topk`
    score with (and that the DuckDB oracles re-derive): Lucene "+1"
    idf over (n_docs, df), k1/b length-normalized tf over
    (tf, doc_len, avgdl). Callers multiply idf * tfn and cast
    ``_CONTRIB_DECIMAL`` — keep that grouping; the oracle SQL is
    parenthesized to match it."""
    idf = F.log(
        F.lit(1.0)
        + (
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * (F.col("doc_len") / F.col("avgdl")))
    )
    return idf, tfn


def search_terms(col: Column | str, lowercase: bool = True) -> Column:
    """``array<string>`` of query/document terms: (lowercase,) split on
    single spaces, empty tokens dropped — the exact tokenization the
    r33 TF-IDF oracle pins, so every downstream count is
    DuckDB-reproducible. The split itself is the canonical
    ``functions.tokenize`` (the str.split-parity form lives in ONE
    place); this wrapper adds the case fold and the empty-token
    filter."""
    from datamunging_spark.functions import tokenize

    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    if lowercase:
        c = F.lower(c)
    return F.filter(tokenize(c), lambda w: w != "")


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    positions: bool = False,
) -> DataFrame:
    """(term, ``id_col``, tf, doc_len) postings — the corpus's inverted
    index at (term, doc) grain, unique per (term, doc) by construction.

    One tokenize + explode + ONE hash aggregate: partial (map-side)
    combine shrinks the shuffle to one row per (doc, term) per
    partition, and ``doc_len`` (total term count of the doc, counted
    BEFORE the explode) rides the group key — constant per doc, so it
    costs no extra aggregate. This is the one corpus-sized shuffle the
    family ever performs; materialize the result with
    ``materialize_columnar`` and query it forever.

    ``positions=True`` adds a ``positions`` column (sorted
    ``array<int>`` of the term's 0-based token offsets in the doc —
    Lucene's positional-postings trade: the index grows by one int per
    token, and :func:`phrase_topk` becomes answerable from the index
    alone). ``tf == size(positions)`` by construction. The aggregate
    stays a single hash agg (``collect_list`` + ``array_sort`` — the
    sort makes the row partitioning-independent, so positional indexes
    are byte-deterministic too).
    """
    toks = df.select(
        F.col(id_col),
        search_terms(text_col, lowercase).alias("_toks"),
    ).withColumn("doc_len", F.size("_toks").cast("long"))
    if not positions:
        return (
            toks.select(id_col, "doc_len", F.explode("_toks").alias("term"))
            .groupBy("term", id_col, "doc_len")
            .agg(F.count(F.lit(1)).alias("tf"))
            .select("term", id_col, "tf", "doc_len")
        )
    return (
        toks.select(
            id_col,
            "doc_len",
            F.posexplode("_toks").alias("_pos", "term"),
        )
        .groupBy("term", id_col, "doc_len")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_sort(F.collect_list(F.col("_pos").cast("int"))).alias(
                "positions"
            ),
        )
        .select("term", id_col, "tf", "doc_len", "positions")
    )


def index_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """One-row (n_docs, total_len, avgdl) corpus statistics for BM25's
    length normalization — a single global aggregate over the SOURCE
    corpus (no shuffle: partial counts reduce to one row), computed
    once at index-build time and broadcast into every query. ``avgdl``
    is a double but exact-sum-derived (sum of long lengths / long
    count), so it is engine-reproducible; ``total_len`` keeps the
    exact long sum so :func:`combine_index_stats` merges without
    float error. Zero-length docs count toward both."""
    return df.select(
        F.size(search_terms(text_col, lowercase)).cast("long").alias("_dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).cast("long").alias("total_len"),
        (
            F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )


def term_stats(postings: DataFrame) -> DataFrame:
    """(term, df) document frequencies from a postings table — one
    map-side-combinable aggregate (postings are unique per (term, doc),
    so ``count(*)`` IS df). Build it with the index and hand it to
    :func:`bm25_topk` as ``dfreq`` so query time never re-derives df."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def bm25_topk(
    postings: DataFrame,
    queries: DataFrame,
    stats: DataFrame,
    k: int = 10,
    query_col: str = "query",
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    dfreq: DataFrame | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-k BM25 hits per query: (query_id, ``id_col``, rank, bm25).

    ``postings`` is an :func:`inverted_index` table (term, id, tf,
    doc_len); ``stats`` the matching one-row :func:`index_stats`;
    ``queries`` a SMALL batch (query_id, query text) — the broadcast
    side by contract, like ``brute_force_topk``'s probe batch.

    Plan: tokenize queries → distinct (query, term) pairs (term SETS —
    the Lucene qtf=1 convention) → broadcast-semi-join postings on term
    (ONE pushed scan of the index, no exchange on the postings side) →
    broadcast df + (n_docs, avgdl) onto the matched rows → per-term
    contributions cast ``decimal(28,7)`` → ONE (query, doc) hash
    aggregate (the only shuffle, sized by matched postings) → top-k
    window per query (WindowGroupLimit pre-filters per partition).
    Ties break on ascending doc id — a total order, so ranks are
    deterministic on any engine and any partitioning.

    ``dfreq``: pass :func:`term_stats`'s table to skip the on-the-fly
    df derivation (which is exact — the semi-join keeps EVERY posting
    of each query term — but costs a second pass over the matched
    branch). Query terms absent from the corpus match nothing and
    contribute nothing; queries with no surviving term return no rows.

    ``max_df_frac``: the stopword valve — drop query terms whose
    document frequency exceeds this fraction of ``n_docs`` (Lucene's
    ``maxDocFreq`` MoreLikeThis guard). A hot term ("the") matches a
    corpus-sized posting slice, so one careless query term can turn
    the score aggregate into a corpus shuffle; such terms also carry
    near-zero idf, so dropping them barely moves the ranking. The cut
    happens on the (broadcast-sized) df table BEFORE the contribution
    rows flow into the aggregate — the 100 TB protection. With the
    precomputed ``dfreq`` it also prunes the matched-postings branch
    itself (df is known before the scan); on the on-the-fly path the
    scan still reads the hot term's postings once to count them.
    Default None (off) — the parity/oracle configuration.
    """
    def _df_valve(d):
        # stopword valve: cut on the broadcast-sized df table, never
        # on the posting rows themselves
        return (
            d.crossJoin(F.broadcast(stats))
            .filter(
                F.col("df")
                <= F.lit(float(max_df_frac)) * F.col("n_docs")
            )
            .select("term", "df")
        )

    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(search_terms(query_col, lowercase)).alias("term"),
        )
        .distinct()
    )
    qterms = qt.select("term").distinct()
    if dfreq is not None:
        # a term_stats table spans the WHOLE corpus vocabulary —
        # semi-join it down to the query terms before anything
        # broadcasts it, or the scale path would broadcast 10^8+ rows
        dfreq = dfreq.join(F.broadcast(qterms), "term")
        if max_df_frac is not None:
            # df known BEFORE the scan: hot terms never reach the
            # postings join at all
            dfreq = _df_valve(dfreq)
            qterms = qterms.join(
                F.broadcast(dfreq.select("term")), "term"
            )
    matched = postings.join(F.broadcast(qterms), "term")
    if dfreq is None:
        # the convenience path reads the matched branch twice (df
        # derivation + scoring) — pin it so an inline-built index is
        # not recomputed (the simhash localCheckpoint precedent); the
        # pinned table is query-term postings only, not the corpus
        matched = matched.localCheckpoint()
        dfreq = term_stats(matched)
        if max_df_frac is not None:
            dfreq = _df_valve(dfreq)
    # df/qt/stats are all query-sized: broadcast every one of them so
    # the matched-postings branch flows shuffle-free into the score agg.
    scored = (
        matched.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf, tfn = _bm25_parts(k1, b)
    per_doc = scored.select(
        "query_id",
        F.col(id_col),
        (idf * tfn).cast(_CONTRIB_DECIMAL).alias("_c"),
    ).groupBy("query_id", id_col).agg(F.sum("_c").alias("_s"))
    from datamunging_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        per_doc,
        ["query_id"],
        [F.col("_s").desc(), F.col(id_col).asc()],
        k,
        rank_out="rank",
    ).select(
        "query_id",
        id_col,
        "rank",
        F.col("_s").cast("double").alias("bm25"),
    )


def advance_index(
    postings: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
    replace_ids: bool = False,
) -> DataFrame:
    """Roll an inverted index forward by one ingest batch — the
    continuous-ingest leg (the X1+ ``advance_snapshot`` convention):
    sign ONLY the batch (tokenize + one batch-sized aggregate) and
    union its postings onto the history table; the historical corpus
    is never rescanned and never shuffles (union is exchange-free —
    each side keeps its partitions).

    Append-only by contract: batch ids must be new. With
    ``replace_ids=True`` the batch may also carry UPDATED documents —
    history postings of any id present in the batch are dropped first
    via a broadcast anti-join on ``id_col`` (one pass over history,
    no exchange: the batch id list is the broadcast side). The caller
    materializes the result as the new index table (same
    write-the-snapshot discipline as ``advance_snapshot``) and keeps
    (n_docs, avgdl) current via :func:`combine_index_stats` — BM25's
    idf/avgdl then drift only by the batch delta, which is the
    standard freshness trade of every incremental text index
    (Lucene's segment model); a periodic full rebuild resets it.
    """
    # positional indexes roll forward as positional indexes — detect
    # from the history schema so a positions=True index can never be
    # silently degraded (or loudly union-mismatched) by a fold
    pos = "positions" in postings.columns
    new_post = inverted_index(
        batch, text_col, id_col, lowercase, positions=pos
    )
    if replace_ids:
        cols = ["term", id_col, "tf", "doc_len"] + (
            ["positions"] if pos else []
        )
        postings = postings.join(
            F.broadcast(batch.select(F.col(id_col)).distinct()),
            id_col,
            "left_anti",
        ).select(*cols)  # anti-join reorders keys-first
    return postings.unionByName(new_post)


def combine_index_stats(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two one-row :func:`index_stats` tables into the combined
    corpus's (n_docs, total_len, avgdl) — counts and exact long token
    totals add, avgdl re-derives from the merged longs (the
    mergeable-summary property, float-error-free: the merged table is
    bit-identical to :func:`index_stats` run on the full corpus).
    Empty sides (n_docs=0) are identity elements. For ``replace_ids``
    updates, subtract the replaced docs' stats first (a one-row table
    with negated n_docs/total_len merges the same way)."""
    ar = a.select(
        F.col("n_docs").alias("_na"), F.col("total_len").alias("_ta")
    )
    br = b.select(
        F.col("n_docs").alias("_nb"), F.col("total_len").alias("_tb")
    )
    return ar.crossJoin(br).select(
        (F.col("_na") + F.col("_nb")).alias("n_docs"),
        (F.col("_ta") + F.col("_tb")).alias("total_len"),
        F.when(
            (F.col("_na") + F.col("_nb")) > 0,
            (F.col("_ta") + F.col("_tb")).cast("double")
            / (F.col("_na") + F.col("_nb")).cast("double"),
        ).alias("avgdl"),
    )


def boolean_topk(
    postings: DataFrame,
    queries: DataFrame,
    stats: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    must_col: str = "must",
    should_col: str = "should",
    must_not_col: str = "must_not",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
) -> DataFrame:
    """Boolean retrieval (the Lucene BooleanQuery trio) ranked by BM25:
    (query_id, ``id_col``, rank, n_must, n_should, bm25). ``queries``
    carries three space-split term-text columns per query — a doc
    qualifies iff it contains EVERY ``must`` term (vacuously true when
    must is empty/NULL, in which case ≥1 ``should`` match is required
    instead — a query can't match the whole corpus by accident) and NO
    ``must_not`` term; qualified docs are scored by BM25 over their
    matched must+should terms (must clauses score too, the Lucene
    convention; a term listed in both roles scores ONCE).

    One postings scan: the union of all three roles' terms broadcasts
    into a single semi-join, pinned via ``localCheckpoint`` (it feeds
    the df derivation and all three role branches), then everything
    downstream is matched-postings-sized — the same 100 TB shape as
    :func:`bm25_topk`. A ``must`` term absent from the corpus matches
    nothing, so its query returns no rows (strict AND, by design).
    Exclusion is a left-anti join on the (query, doc) pairs any
    must_not term hits. Deterministic: decimal(28,7) score sums,
    (score desc, doc asc) ranks."""

    def _role(col, tag):
        # no distinct — the roles groupBy below dedups everything
        return queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(search_terms(col, lowercase)).alias("term"),
            F.lit(tag).alias("_role"),
        )

    # collapse the three roles to per-(query, term) FLAGS before any
    # postings row exists — the join output is then (query, doc,
    # term)-unique by construction, so one doc-grain aggregate
    # suffices (no matched-postings×roles intermediate grain)
    roles = (
        _role(must_col, "m")
        .unionByName(_role(should_col, "s"))
        .unionByName(_role(must_not_col, "x"))
        .groupBy("query_id", "term")
        .agg(
            F.max(F.col("_role") == "m").alias("_is_m"),
            F.max(F.col("_role") == "s").alias("_is_s"),
            F.max(F.col("_role") == "x").alias("_is_x"),
        )
    )
    terms = roles.select("term").distinct()
    matched = postings.join(
        F.broadcast(terms), "term"
    ).localCheckpoint()
    dfreq = term_stats(matched)
    hits = matched.join(F.broadcast(roles), "term")

    # BM25 over the matched (query, doc, term) scoring rows
    scoring = (
        hits.filter(F.col("_is_m") | F.col("_is_s"))
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
    )
    idf, tfn = _bm25_parts(k1, b)
    per_doc = (
        scoring.select(
            "query_id",
            id_col,
            (idf * tfn).cast(_CONTRIB_DECIMAL).alias("_c"),
            "_is_m",
            "_is_s",
        )
        .groupBy("query_id", id_col)
        .agg(
            F.sum("_c").alias("_s"),
            F.sum(F.when(F.col("_is_m"), 1).otherwise(0)).alias("n_must"),
            F.sum(F.when(F.col("_is_s"), 1).otherwise(0)).alias(
                "n_should"
            ),
        )
    )
    # per-query required must count (distinct terms, unseen ones incl.)
    req = (
        roles.filter(F.col("_is_m"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("_req_must"))
    )
    qualified = (
        per_doc.join(F.broadcast(req), "query_id", "left")
        .filter(
            F.when(
                F.coalesce(F.col("_req_must"), F.lit(0)) > 0,
                F.col("n_must") == F.col("_req_must"),
            ).otherwise(F.col("n_should") > 0)
        )
        .drop("_req_must")
    )
    banned = (
        hits.filter(F.col("_is_x"))
        .select("query_id", id_col)
        .distinct()
    )
    survivors = qualified.join(
        banned, ["query_id", id_col], "left_anti"
    )
    from datamunging_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        survivors,
        ["query_id"],
        [F.col("_s").desc(), F.col(id_col).asc()],
        k,
        rank_out="rank",
    ).select(
        "query_id",
        id_col,
        "rank",
        "n_must",
        "n_should",
        F.col("_s").cast("double").alias("bm25"),
    )


def phrase_topk(
    postings: DataFrame,
    phrases: DataFrame,
    k: int = 10,
    query_col: str = "query",
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Exact phrase search over a POSITIONAL index — top-k docs per
    phrase by phrase frequency: (query_id, ``id_col``, rank,
    phrase_freq). ``postings`` must come from
    :func:`inverted_index(..., positions=True) <inverted_index>`;
    ``phrases`` is a SMALL (query_id, phrase text) batch, broadcast by
    contract like :func:`bm25_topk`'s queries.

    The classic positional-intersection algorithm, relational: explode
    each phrase into (offset, term) pairs → broadcast-join postings on
    term (ONE index scan, no exchange on the postings side) → shift
    each matched posting's position list left by its phrase offset →
    per (query, doc), a doc contains the phrase at start p iff p
    survives the INTERSECTION of all shifted lists — intersection is
    commutative, so the ``collect_list`` fold needs no ordering and the
    result is partitioning-independent. Docs missing any phrase term
    are dropped by requiring one matched posting per phrase offset
    (duplicate terms in the phrase are distinct offsets, handled
    exactly: "a a" demands a at p AND p+1). ``phrase_freq`` =
    |intersection| = occurrence count; ranks break ties on ascending
    doc id. The only shuffle is the matched-postings (query, doc)
    aggregate — phrase search at 100 TB costs one pushed index scan,
    like BM25."""
    if "positions" not in postings.columns:
        raise ValueError(
            "phrase_topk needs a positional index — build the postings "
            "with inverted_index(..., positions=True)"
        )
    qp = phrases.select(
        F.col(query_id_col).alias("query_id"),
        F.posexplode(search_terms(query_col, lowercase)).alias(
            "_off", "term"
        ),
    )
    qn = qp.groupBy("query_id").agg(F.count(F.lit(1)).alias("_n_terms"))
    hits = postings.join(F.broadcast(qp), "term").select(
        "query_id",
        id_col,
        F.transform(
            "positions", lambda x: x - F.col("_off")
        ).alias("_shifted"),
    )
    grouped = (
        hits.groupBy("query_id", id_col)
        .agg(
            F.count(F.lit(1)).alias("_n_matched"),
            F.collect_list("_shifted").alias("_arrs"),
        )
        .join(F.broadcast(qn), "query_id")
        .filter(F.col("_n_matched") == F.col("_n_terms"))
        .select(
            "query_id",
            id_col,
            F.size(
                F.aggregate(
                    F.slice(
                        F.col("_arrs"), 2, F.size(F.col("_arrs")) - 1
                    ),
                    F.element_at(F.col("_arrs"), 1),
                    lambda acc, x: F.array_intersect(acc, x),
                )
            ).alias("phrase_freq"),
        )
        .filter(F.col("phrase_freq") > 0)
    )
    from datamunging_spark.operators.relational import top_k_per_group

    return top_k_per_group(
        grouped,
        ["query_id"],
        [F.col("phrase_freq").desc(), F.col(id_col).asc()],
        k,
        rank_out="rank",
    ).select("query_id", id_col, "rank", "phrase_freq")


def stats_from_postings(
    postings: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(n_docs, total_len, avgdl) re-derived from a postings table —
    for consumers holding ONLY the index (e.g. the streaming
    index-maintenance loop, whose versioned state is the postings
    table alone): distinct (doc, doc_len) pairs → one exact-long
    aggregate. DIVERGENCE from :func:`index_stats`, documented: a
    zero-term document has no postings, so it is invisible here —
    n_docs counts docs with ≥1 term (the searchable corpus), which is
    every doc a streamed index can ever return. One index-grain
    distinct (a shuffle over slim (doc, len) rows) — run it at index
    refresh time, not per query; on the build path prefer
    :func:`index_stats` + :func:`combine_index_stats`, which never
    rescan anything."""
    return (
        postings.select(F.col(id_col), F.col("doc_len"))
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("doc_len"), F.lit(0))
            .cast("long")
            .alias("total_len"),
            (
                F.sum("doc_len").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avgdl"),
        )
    )


def rrf_fuse(
    rankings: list[DataFrame],
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two or more per-query rankings
    (Cormack'09): fused score = Σ_i 1/(rrf_k + rank_i), summing only
    the lists the (query, doc) pair appears in.

    Each input needs (``query_col``, ``id_col``, ``rank_col``) — e.g.
    :func:`bm25_topk` output and ``brute_force_topk``/``ivf_topk``
    output (aliased to a common id). Inputs are top-k tables
    (k·|queries| rows), so the full outer joins are tiny; the fused
    score is a FIXED-ORDER expression over len(rankings) doubles (no
    float aggregation — reduction order cannot change it), and the
    fused rank breaks ties on ascending doc id. Output: (query_id,
    doc_id, rank_1..rank_n, rrf, rank).
    """
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    fused = None
    for i, r in enumerate(rankings):
        ri = r.select(
            F.col(query_col).alias("query_id"),
            F.col(id_col).alias("doc_id"),
            F.col(rank_col).cast("long").alias(f"rank_{i + 1}"),
        )
        fused = (
            ri
            if fused is None
            else fused.join(ri, ["query_id", "doc_id"], "full_outer")
        )
    score = None
    for i in range(len(rankings)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(f"rank_{i + 1}")),
            F.lit(0.0),
        )
        score = c if score is None else score + c
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rrf", score)
        .withColumn("rank", F.row_number().over(w))
    )
