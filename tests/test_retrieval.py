"""Lexical retrieval (X2): inverted index, BM25 top-k, RRF fusion."""

import math

import pytest
from pyspark.sql import Row, functions as F

from datamunging_spark.operators.retrieval import (
    advance_index,
    bm25_topk,
    combine_index_stats,
    index_stats,
    inverted_index,
    rrf_fuse,
    stats_from_postings,
    term_stats,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="spark shuffles rows fast"),
            Row(doc_id=2, text="spark spark broadcast join"),
            Row(doc_id=3, text="zebra  stampede"),  # double space: 2 terms
            Row(doc_id=4, text=""),
        ]
    )


def test_inverted_index_tf_and_doc_len(spark):
    post = inverted_index(_docs(spark))
    rows = {(r.term, r.doc_id): (r.tf, r.doc_len) for r in post.collect()}
    assert rows[("spark", 1)] == (1, 4)
    assert rows[("spark", 2)] == (2, 4)
    assert rows[("zebra", 3)] == (1, 2)  # empty token dropped
    # unique per (term, doc); the empty doc contributes no postings
    assert len(rows) == post.count()
    assert not [k for k in rows if k[1] == 4]


def test_index_stats_counts_empty_docs(spark):
    n_docs, total_len, avgdl = index_stats(_docs(spark)).collect()[0]
    assert (n_docs, total_len) == (4, 10)
    assert avgdl == pytest.approx((4 + 4 + 2 + 0) / 4.0)


def test_bm25_planted_relevance_and_hand_score(spark):
    docs = _docs(spark)
    post, stats = inverted_index(docs), index_stats(docs)
    q = spark.createDataFrame([Row(query_id=0, query="zebra")])
    out = bm25_topk(post, q, stats, k=3).collect()
    # 'zebra' appears only in doc 3 → exactly one hit, rank 1
    assert [(r.doc_id, r.rank) for r in out] == [(3, 1)]
    idf = math.log(1.0 + (4 - 1 + 0.5) / (1 + 0.5))
    tfn = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * (2 / 2.5)))
    assert out[0].bm25 == pytest.approx(idf * tfn, abs=1e-6)


def test_bm25_query_term_sets_and_unseen_terms(spark):
    docs = _docs(spark)
    post, stats = inverted_index(docs), index_stats(docs)
    q = spark.createDataFrame(
        [
            Row(query_id=0, query="zebra zebra zebra"),  # qtf ignored
            Row(query_id=1, query="zebra"),
            Row(query_id=2, query="quux xyzzy"),  # nothing matches
        ]
    )
    out = bm25_topk(post, q, stats, k=3)
    scores = {(r.query_id, r.doc_id): r.bm25 for r in out.collect()}
    assert set(scores) == {(0, 3), (1, 3)}
    assert scores[(0, 3)] == scores[(1, 3)]


def test_bm25_matches_duckdb_and_precomputed_dfreq(spark):
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    post, stats = inverted_index(docs), index_stats(docs)
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 40).alias("query"),
    )
    out = bm25_topk(post, queries, stats, k=5)
    got = sorted(
        (r.query_id, r.doc_id, r.rank, round(r.bm25, 6))
        for r in out.collect()
    )
    # the 100 TB path (df from the index-build term_stats table) is
    # byte-identical to the on-the-fly derivation
    pre = bm25_topk(post, queries, stats, k=5, dfreq=term_stats(post))
    assert (
        sorted(
            (r.query_id, r.doc_id, r.rank, round(r.bm25, 6))
            for r in pre.collect()
        )
        == got
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{SF}/documents.parquet'"
    )
    want = sorted(
        (qid, did, rank, round(s, 6))
        for qid, did, rank, s in con.sql(
            """
            WITH terms AS (
              SELECT doc_id,
                     unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x != '')) AS term
              FROM documents
            ), post AS (
              SELECT term, doc_id, count(*) AS tf
              FROM terms GROUP BY term, doc_id
            ), dl AS (
              SELECT doc_id, count(*) AS doc_len FROM terms GROUP BY doc_id
            ), stats AS (
              SELECT count(*) AS n_docs,
                     CAST(sum(len(list_filter(string_split(lower(text), ' '),
                                              x -> x != ''))) AS DOUBLE)
                       / count(*) AS avgdl
              FROM documents
            ), qt AS (
              SELECT DISTINCT doc_id AS query_id,
                     unnest(list_filter(
                         string_split(lower(substring(text, 1, 40)), ' '),
                         x -> x != '')) AS term
              FROM documents WHERE doc_id < 3
            ), dfreq AS (
              SELECT term, count(*) AS df FROM post
              WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY term
            ), per_doc AS (
              SELECT qt.query_id, post.doc_id,
                     sum(CAST(
                       ln(1.0 + (stats.n_docs - dfreq.df + 0.5)
                                / (dfreq.df + 0.5))
                       * ((post.tf * 2.2)
                          / (post.tf + 1.2 * (0.25 + 0.75 *
                               (dl.doc_len / stats.avgdl))))
                       AS DECIMAL(28,7))) AS s
              FROM post
              JOIN qt USING (term) JOIN dfreq USING (term)
              JOIN dl ON dl.doc_id = post.doc_id
              CROSS JOIN stats
              GROUP BY qt.query_id, post.doc_id
            )
            SELECT query_id, doc_id, rank, CAST(s AS DOUBLE) FROM (
              SELECT query_id, doc_id, s,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY s DESC, doc_id) AS rank
              FROM per_doc
            ) WHERE rank <= 5
            """
        ).fetchall()
    )
    assert got == want


def test_bm25_deterministic_under_repartition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    queries = docs.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 30).alias("query"),
    )

    def run(d):
        return sorted(
            (r.query_id, r.doc_id, r.rank, r.bm25)
            for r in bm25_topk(
                inverted_index(d), queries, index_stats(d), k=7
            ).collect()
        )

    assert run(docs) == run(docs.repartition(13))


def test_bm25_query_time_never_shuffles_on_term(spark, tmp_path):
    """With the index-build artifacts precomputed (postings + term df +
    stats — the 100 TB configuration), the query plan's exchanges are
    only the (query, doc) score aggregate and the per-query window:
    nothing repartitions by term, so the postings scan flows straight
    into a broadcast join."""
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inverted_index(docs).write.mode("overwrite").parquet(
        str(tmp_path / "post")
    )
    post = spark.read.parquet(str(tmp_path / "post"))
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 40).alias("query"),
    )
    out = bm25_topk(
        post, queries, index_stats(docs), k=5, dfreq=term_stats(post)
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    for frag in plan.split("Exchange hashpartitioning(")[1:]:
        keys = frag.split(")")[0]
        assert "term" not in keys, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rrf_fuse_hand_math_and_outer_union(spark):
    a = spark.createDataFrame(
        [Row(query_id=0, doc_id=10, rank=1), Row(query_id=0, doc_id=11, rank=2)]
    )
    b = spark.createDataFrame(
        [Row(query_id=0, doc_id=11, rank=1), Row(query_id=0, doc_id=12, rank=2)]
    )
    out = {r.doc_id: r for r in rrf_fuse([a, b], rrf_k=60).collect()}
    assert set(out) == {10, 11, 12}
    assert out[11].rrf == pytest.approx(1 / 62 + 1 / 61)
    assert out[10].rrf == pytest.approx(1 / 61)
    assert out[12].rrf == pytest.approx(1 / 62)
    assert [out[11].rank, out[10].rank, out[12].rank] == [1, 2, 3]
    assert (out[10].rank_1, out[10].rank_2) == (1, None)
    with pytest.raises(ValueError, match="at least two"):
        rrf_fuse([a])


def test_rrf_fuse_tie_breaks_on_doc_id(spark):
    a = spark.createDataFrame(
        [Row(query_id=0, doc_id=20, rank=1), Row(query_id=0, doc_id=5, rank=1)]
    )
    b = spark.createDataFrame(
        [Row(query_id=0, doc_id=5, rank=2), Row(query_id=0, doc_id=20, rank=2)]
    )
    got = [(r.doc_id, r.rank) for r in
           rrf_fuse([a, b]).orderBy("rank").collect()]
    assert got == [(5, 1), (20, 2)]


def test_retrieval_empty_inputs(spark):
    docs = _docs(spark)
    post, stats = inverted_index(docs), index_stats(docs)
    no_q = spark.createDataFrame([], "query_id long, query string")
    assert bm25_topk(post, no_q, stats, k=3).count() == 0
    no_docs = spark.createDataFrame([], "doc_id long, text string")
    assert inverted_index(no_docs).count() == 0
    n_docs, total_len, avgdl = index_stats(no_docs).collect()[0]
    assert (n_docs, total_len, avgdl) == (0, 0, None)


def test_advance_index_append_equals_full_rebuild(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    hist, batch = docs.filter("doc_id < 400"), docs.filter("doc_id >= 400")
    rolled = advance_index(inverted_index(hist), batch)
    full = inverted_index(docs)
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, full.collect())
    )
    # merged stats are bit-identical to full-corpus stats (exact longs)
    merged = combine_index_stats(index_stats(hist), index_stats(batch))
    assert merged.collect() == index_stats(docs).collect()


def test_advance_index_replace_ids_drops_stale_postings(spark):
    docs = _docs(spark)
    updated = spark.createDataFrame(
        [Row(doc_id=1, text="rewritten entirely"), Row(doc_id=9, text="new doc")]
    )
    rolled = advance_index(inverted_index(docs), updated, replace_ids=True)
    terms_for_1 = {r.term for r in rolled.filter("doc_id = 1").collect()}
    assert terms_for_1 == {"rewritten", "entirely"}  # no stale 'spark' rows
    assert rolled.filter("doc_id = 9").count() == 2
    # equals a full rebuild of the post-update corpus
    after = docs.filter("doc_id != 1").unionByName(updated)
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, inverted_index(after).collect())
    )


def test_combine_index_stats_empty_identity(spark):
    docs = _docs(spark)
    empty = spark.createDataFrame([], "doc_id long, text string")
    got = combine_index_stats(index_stats(docs), index_stats(empty)).collect()
    assert got == index_stats(docs).collect()


def test_stats_from_postings_matches_index_stats_minus_empty(spark):
    docs = _docs(spark)
    post = inverted_index(docs)
    n_docs, total_len, avgdl = stats_from_postings(post).collect()[0]
    # the empty doc is invisible to the index: 3 searchable docs
    assert (n_docs, total_len) == (3, 10)
    assert avgdl == pytest.approx(10 / 3)


def test_streaming_index_ingest_folds_and_replaces(spark, tmp_path):
    """Three micro-batches (the third UPDATES a doc from the first) fold
    into a versioned postings table that equals a full rebuild of the
    final corpus; replaying the last batch against the committed store
    is the identity (replace_ids replay algebra)."""
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_index_ingest

    src = tmp_path / "docs_src"
    src.mkdir()
    table = str(tmp_path / "postings_store")
    ckpt = str(tmp_path / "idx_ckpt")
    schema = "doc_id long, text string"
    b1 = [(1, "spark rows fast"), (2, "broadcast join")]
    b2 = [(3, "zebra stampede")]
    b3 = [(1, "rewritten doc one"), (4, "windowed agg")]
    for i, rows in enumerate((b1, b2, b3)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"f{i}")
        )
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    v = streaming_index_ingest(stream, table, checkpoint_path=ckpt)
    assert v == 3
    got = sorted(map(tuple, read_table_version(spark, table).collect()))
    final = spark.createDataFrame(
        [(2, "broadcast join"), (3, "zebra stampede"),
         (1, "rewritten doc one"), (4, "windowed agg")], schema
    )
    assert got == sorted(map(tuple, inverted_index(final).collect()))
    # replay algebra: re-folding the last batch is the identity
    from datamunging_spark.operators.retrieval import advance_index

    replayed = advance_index(
        read_table_version(spark, table),
        spark.createDataFrame(b3, schema),
        replace_ids=True,
    )
    assert sorted(map(tuple, replayed.collect())) == got
    # the committed store is queryable end to end
    q = spark.createDataFrame([(0, "zebra")], "query_id long, query string")
    hits = bm25_topk(
        read_table_version(spark, table),
        q,
        stats_from_postings(read_table_version(spark, table)),
        k=3,
    ).collect()
    assert [(r.doc_id, r.rank) for r in hits] == [(3, 1)]


def test_bm25_max_df_frac_stopword_valve(spark):
    docs = _docs(spark)
    post, stats = inverted_index(docs), index_stats(docs)
    q = spark.createDataFrame(
        [Row(query_id=0, query="spark zebra"), Row(query_id=1, query="zebra")]
    )
    # 'spark' df=2/4 docs > 0.4 → dropped; query 0 degrades to 'zebra'
    out = bm25_topk(post, q, stats, k=4, max_df_frac=0.4)
    scores = {(r.query_id, r.doc_id): r.bm25 for r in out.collect()}
    assert set(scores) == {(0, 3), (1, 3)}
    assert scores[(0, 3)] == scores[(1, 3)]
    # precomputed-df path (prunes before the postings join) agrees
    pre = bm25_topk(
        post, q, stats, k=4, dfreq=term_stats(post), max_df_frac=0.4
    )
    assert {
        (r.query_id, r.doc_id): r.bm25 for r in pre.collect()
    } == scores
    # valve off: 'spark' contributes again and doc ranks change
    full = bm25_topk(post, q, stats, k=4)
    assert full.filter("query_id = 0").count() == 3  # docs 1, 2, 3


def test_streaming_index_ingest_within_batch_collision(spark, tmp_path):
    """Two rows for one doc id inside a single micro-batch fail fast by
    default (they would corrupt the (term, doc) grain); with
    version_col the batch resolves last-wins deterministically."""
    from datamunging_spark.sources.versioned import read_table_version
    from datamunging_spark.streaming import streaming_index_ingest

    schema = "doc_id long, text string, ver long"
    rows = [(1, "old text", 1), (1, "new text", 2), (2, "other doc", 1)]

    def drain(name, **kw):
        src = tmp_path / f"{name}_src"
        src.mkdir()
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / "f0")
        )
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        return streaming_index_ingest(
            stream,
            str(tmp_path / f"{name}_tbl"),
            checkpoint_path=str(tmp_path / f"{name}_ckpt"),
            **kw,
        )

    from pyspark.errors import StreamingQueryException

    with pytest.raises(
        StreamingQueryException, match="within-batch collisions"
    ):
        drain("collide")

    assert drain("versioned", version_col="ver") == 1
    post = read_table_version(spark, str(tmp_path / "versioned_tbl"))
    terms_for_1 = {r.term for r in post.filter("doc_id = 1").collect()}
    assert terms_for_1 == {"new", "text"}  # ver=2 won; ver=1 gone
    assert post.filter("doc_id = 2").count() == 2


def test_phrase_topk_planted_and_duplicate_terms(spark):
    from datamunging_spark.operators.retrieval import phrase_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the red fox jumps red fox again"),
            Row(doc_id=2, text="fox red the jumps"),  # reversed: no match
            Row(doc_id=3, text="red red red"),
            Row(doc_id=4, text="red only"),
        ]
    )
    post = inverted_index(docs, positions=True)
    q = spark.createDataFrame(
        [
            Row(query_id=0, query="red fox"),
            Row(query_id=1, query="red red"),  # duplicate-term phrase
            Row(query_id=2, query="red"),      # single term == tf
            Row(query_id=3, query="red wolf"),  # missing term: no rows
        ]
    )
    out = phrase_topk(post, q, k=5)
    got = {(r.query_id, r.doc_id): (r.rank, r.phrase_freq)
           for r in out.collect()}
    assert got[(0, 1)] == (1, 2)          # "red fox" twice in doc 1
    assert (0, 2) not in got              # reversed order rejected
    assert got[(1, 3)] == (1, 2)          # "red red" at starts 0,1
    assert (1, 1) not in got              # "red ... red" not adjacent
    assert got[(2, 3)] == (1, 3)          # single term: freq == tf
    assert got[(2, 1)] == (2, 2)
    assert not [k_ for k_ in got if k_[0] == 3]
    with pytest.raises(ValueError, match="positional"):
        phrase_topk(inverted_index(docs), q)


def test_phrase_topk_matches_python_reference_and_repartition(spark):
    from datamunging_spark.operators.retrieval import phrase_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    # phrases drawn from real doc prefixes so matches exist
    phrases = [(i, " ".join(t.split(" ")[:2])) for i, t in rows[:3]]

    def ref():
        out = []
        for qid, ph in phrases:
            terms = [w for w in ph.lower().split(" ") if w]
            scored = []
            for did, text in rows:
                toks = [w for w in text.lower().split(" ") if w]
                freq = sum(
                    1
                    for p in range(len(toks) - len(terms) + 1)
                    if toks[p:p + len(terms)] == terms
                )
                if freq:
                    scored.append((did, freq))
            scored.sort(key=lambda x: (-x[1], x[0]))
            out += [
                (qid, did, r + 1, f)
                for r, (did, f) in enumerate(scored[:5])
            ]
        return sorted(out)

    q = spark.createDataFrame(phrases, "query_id long, query string")

    def run(d):
        return sorted(
            (r.query_id, r.doc_id, r.rank, r.phrase_freq)
            for r in phrase_topk(
                inverted_index(d, positions=True), q, k=5
            ).collect()
        )

    assert run(docs) == ref()
    assert run(docs.repartition(17)) == ref()


def test_boolean_topk_must_should_not(spark):
    from datamunging_spark.operators.retrieval import boolean_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark shuffle broadcast join"),
            Row(doc_id=2, text="spark shuffle window"),
            Row(doc_id=3, text="spark broadcast legacy"),
            Row(doc_id=4, text="shuffle broadcast join"),
            Row(doc_id=5, text="unrelated words here"),
        ]
    )
    post, stats = inverted_index(docs), index_stats(docs)
    q = spark.createDataFrame(
        [
            # must both spark+shuffle, boost join, exclude window
            Row(query_id=0, must="spark shuffle", should="join",
                must_not="window"),
            # no must: >=1 should required
            Row(query_id=1, must=None, should="legacy join",
                must_not=""),
            # must term absent from corpus: strict AND -> no rows
            Row(query_id=2, must="spark quux", should="", must_not=""),
        ]
    )
    out = boolean_topk(post, q, stats, k=5)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r)
    # q0: doc 2 excluded (window), doc 3/4 fail must, doc 1 survives
    assert [(r.doc_id, r.n_must, r.n_should) for r in by_q[0]] == [
        (1, 2, 1)
    ]
    # q1: docs containing legacy or join: 1, 3, 4 (no must constraint)
    assert sorted(r.doc_id for r in by_q[1]) == [1, 3, 4]
    assert 2 not in by_q
    # the should ('join') boost must rank doc 1 above doc 2 when the
    # exclusion is lifted
    q2 = spark.createDataFrame(
        [Row(query_id=9, must="spark shuffle", should="join",
             must_not="")]
    )
    ranked = boolean_topk(post, q2, stats, k=5).orderBy("rank").collect()
    assert [r.doc_id for r in ranked] == [1, 2]
    assert ranked[0].bm25 > ranked[1].bm25


def test_boolean_topk_matches_python_reference(spark):
    """Engine boolean+BM25 == a pure-Python reference (same decimal
    quantization discipline as the BM25 property test) on real corpus
    data, including the overlap rule (a term in must AND should scores
    once) and the strict unseen-must behavior."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from datamunging_spark.operators.retrieval import boolean_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    toks = {i: [w for w in t.lower().split(" ") if w] for i, t in rows}
    n_docs = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df: dict = {}
    for ws in toks.values():
        for w in set(ws):
            df[w] = df.get(w, 0) + 1

    qdefs = [
        (0, "table row", "scan table", "merge"),   # overlap: 'table'
        (1, None, "spark window", "the"),
        (2, "row", "", None),
    ]
    k1, b, k, q7 = 1.2, 0.75, 6, Decimal("0.0000001")
    want = []
    for qid, must, should, must_not in qdefs:
        m = {w for w in (must or "").lower().split(" ") if w}
        s = {w for w in (should or "").lower().split(" ") if w}
        x = {w for w in (must_not or "").lower().split(" ") if w}
        scored = []
        for did, ws in toks.items():
            wset = set(ws)
            if x & wset:
                continue
            if m:
                if not m <= wset:
                    continue
            elif not (s & wset):
                continue
            total = Decimal(0)
            nm = ns = 0
            for term in (m | s) & wset:
                idf = math.log(
                    1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5)
                )
                tf = ws.count(term)
                tfn = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * (len(ws) / avgdl))
                )
                total += Decimal(repr(idf * tfn)).quantize(
                    q7, ROUND_HALF_UP
                )
                nm += term in m
                ns += term in s
            scored.append((did, nm, ns, total))
        scored.sort(key=lambda t: (-t[3], t[0]))
        want += [
            (qid, did, r + 1, nm, ns, float(t))
            for r, (did, nm, ns, t) in enumerate(scored[:k])
        ]

    q = spark.createDataFrame(
        qdefs, "query_id long, must string, should string, must_not string"
    )
    got = sorted(
        (r.query_id, r.doc_id, r.rank, r.n_must, r.n_should, r.bm25)
        for r in boolean_topk(
            inverted_index(docs), q, index_stats(docs), k=k
        ).collect()
    )
    assert got == sorted(want)


def test_advance_index_preserves_positional_schema(spark):
    """A positions=True index rolls forward AS a positional index on
    both the append and replace paths — equal to a full positional
    rebuild, and still phrase-searchable (the review found the replace
    path silently stripping positions and the append path throwing)."""
    from datamunging_spark.operators.retrieval import phrase_topk

    docs = _docs(spark)
    hist = inverted_index(docs.filter("doc_id <= 2"), positions=True)
    batch = docs.filter("doc_id > 2")
    appended = advance_index(hist, batch)
    assert "positions" in appended.columns
    assert sorted(map(tuple, appended.collect())) == sorted(
        map(tuple, inverted_index(docs, positions=True).collect())
    )
    upd = spark.createDataFrame(
        [Row(doc_id=2, text="zebra broadcast zebra")]
    )
    replaced = advance_index(
        inverted_index(docs, positions=True), upd, replace_ids=True
    )
    after = docs.filter("doc_id != 2").unionByName(upd)
    assert sorted(map(tuple, replaced.collect())) == sorted(
        map(tuple, inverted_index(after, positions=True).collect())
    )
    q = spark.createDataFrame([Row(query_id=0, query="zebra broadcast")])
    hits = phrase_topk(replaced, q, k=3).collect()
    assert [(r.doc_id, r.phrase_freq) for r in hits] == [(2, 1)]
