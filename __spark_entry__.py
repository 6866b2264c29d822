"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an implemented operator (SURVEY.md §2) expressed
through the ``datamunging_spark`` package; ``oracle_sql()`` gives the DuckDB
equivalent run side-by-side by the driver at sf0.01.

Cross-engine determinism rules used throughout (SURVEY.md §5, FIXTURES.md):
  * every computed column aliased identically on both sides;
  * double SUMs routed through decimal casts (exact arithmetic, order-free)
    then cast back to double — identical bits on any engine;
  * rankings always carry a unique-key tiebreak;
  * md5 (not engine hash()) for portable deterministic sampling/dedup keys.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datamunging_spark.functions import (
    normalize_text,
    punct_ratio,
    stopword_ratio,
)
from datamunging_spark.functions import bag_fingerprint
from datamunging_spark.operators.dedup import (
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_df,
)
from datamunging_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from datamunging_spark.operators.quality import invalid_value_report, regex_rule
from datamunging_spark.operators.relational import (
    asof_join,
    group_count,
    percentile_bucketize,
    sessionize,
    top_k_per_group,
)
from datamunging_spark.operators.sampling import sample_by_key
from datamunging_spark.operators.similarity import brute_force_topk, lsh_topk
from datamunging_spark.operators.text import (
    detect_language,
    ner_entities,
    tfidf_scores,
    word_count,
)
from datamunging_spark.sources import load_table, local_table

SF0001 = "/root/testdata/sf0.001"

#: Stopword list shared with functions.stopword_ratio — inlined into oracle SQL.
_STOPWORDS_SQL = (
    "'the','a','an','and','or','of','to','in','is','are','was','were',"
    "'for','on','with','as','at','by','it','this','that'"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _co_materialize(*thunks):
    """Run INDEPENDENT materializations concurrently — see
    :func:`datamunging_spark.parallel.co_materialize` (guide §2.6)."""
    from datamunging_spark.parallel import co_materialize

    return co_materialize(*thunks)


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def q_r13_count(spark, sf_dir):
    """R13: global COUNT(*) (reference README.md:81-106)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


def q_r14_group_count(spark, sf_dir):
    """R14: Pig GROUP BY + COUNT (reference README.md:129-130)."""
    return group_count(_t(spark, sf_dir, "events"), "event_type", out="cnt")


def q_r19_quality_report(spark, sf_dir):
    """R7+R8+R19+R14 plus the dbt-style data-contracts family, one oracle
    row tagged by ``branch`` (the established suite-merge pattern):
    'regex_fail' — the reference's bad-codes report (README.md:126-132,
    Pig NULL-on-non-match semantics); 'dup_key' — unique_report
    multiplicities over documents.source; 'orphan_fk' —
    referential_report of orders→customer with every 10th customer
    removed, so those orders' keys surface as broken FKs;
    'accepted_values' — lang restricted to {en,de,fr} (zh/es fail);
    'range' — n_chars bounded to [0,400], failures grouped by source.
    Every branch is deterministic counts over strings → oracle-exact."""
    from datamunging_spark.operators.quality import (
        accepted_values_rule,
        range_rule,
        referential_report,
        unique_report,
    )

    docs = _t(spark, sf_dir, "documents")
    b = F.lit  # branch tag shorthand
    regex_b = invalid_value_report(
        docs, regex_rule("src_fmt", "source", r"^(src[0-9])$"),
        "source", out="cnt",
    ).select(b("regex_fail").alias("branch"), F.col("source").alias("key"),
             "cnt")
    dup_b = unique_report(docs, ["source"]).select(
        b("dup_key").alias("branch"), F.col("source").alias("key"),
        F.col("n_rows").alias("cnt"),
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 != 0)
    fk_b = referential_report(
        orders, cust, ["o_custkey"], ["c_custkey"]
    ).select(
        b("orphan_fk").alias("branch"),
        F.col("o_custkey").cast("string").alias("key"),
        F.col("n_rows").alias("cnt"),
    )
    acc_b = invalid_value_report(
        docs, accepted_values_rule("lang_ok", "lang", ["en", "de", "fr"]),
        "lang", out="cnt",
    ).select(b("accepted_values").alias("branch"),
             F.col("lang").alias("key"), "cnt")
    rng_b = invalid_value_report(
        docs, range_rule("len_ok", "n_chars", lo=0, hi=400),
        "source", out="cnt",
    ).select(b("range").alias("branch"), F.col("source").alias("key"),
             "cnt")
    return (
        regex_b.unionByName(dup_b).unionByName(fk_b)
        .unionByName(acc_b).unionByName(rng_b)
    )


def q_quality_summary(spark, sf_dir):
    """Multi-rule validation summary in ONE scan (conditional sums)."""
    from datamunging_spark.operators.quality import (
        not_empty_rule,
        regex_rule,
        validation_summary,
    )

    docs = _t(spark, sf_dir, "documents")
    return validation_summary(
        docs,
        [
            regex_rule("src_fmt", "source", r"^(src[0-9])$"),
            not_empty_rule("text_set", "text"),
        ],
    )


def q_dataset_profile(spark, sf_dir):
    """Per-column census of `customer` (nulls/distincts/min/max) — one scan,
    stack-unpivoted to one row per column."""
    from datamunging_spark.operators.quality import dataset_profile

    c = _t(spark, sf_dir, "customer")
    return dataset_profile(c, ["c_custkey", "c_name", "c_mktsegment", "c_acctbal"])


def q_r16_percentile_bucket(spark, sf_dir):
    """R16 flagship (reference README.md:237-261): per-key exact percentile
    array, broadcast-joined back, CASE-ladder bucket."""
    li = _t(spark, sf_dir, "lineitem")
    return percentile_bucketize(
        li, "l_partkey", "l_quantity", keep_cols=["l_orderkey", "l_linenumber"]
    )


def q_r15_grouped_median(spark, sf_dir):
    """R15: exact grouped percentile (reference README.md:255-260)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty")
    )


def q_r12_join_agg(spark, sf_dir):
    """R12: fact × dimension join chain + aggregate; dims broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_acctbal"),
        )
    )


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregate over lineitem (engine §2.4 surface)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (
                F.sum(F.col("l_discount").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_revenue_orders(spark, sf_dir):
    """Join chain + agg + deterministic top-10 (orders×lineitem×customer)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q_window_topk(spark, sf_dir):
    """§2.8 window: top-3 orders per customer, deterministic tiebreak."""
    o = _t(spark, sf_dir, "orders")
    return top_k_per_group(
        o,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


def q_window_suite(spark, sf_dir):
    """§2.8 window-function family in one gate entry: running count/sum
    (framed window) + lag/lead/rank (unframed) over per-customer order
    history, one deterministic total order. Both window specs share the same
    partitioning, so Catalyst evaluates them over a single Exchange+Sort.
    (Merged from round-1's window_running + window_lag_rank for the 50-entry
    gate cap.)"""
    o = _t(spark, sf_dir, "orders")
    wb = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("run_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("run_total"),
        F.lag("o_totalprice", 1).over(wb).alias("prev_price"),
        F.lead("o_totalprice", 1).over(wb).alias("next_price"),
        F.rank().over(wb).alias("rnk"),
    )


#: One ANSI text, executed verbatim by BOTH engines (spark.sql + DuckDB):
#: the §3.1 SQL-entry-point proof and the §2.8 set-operator family in one
#: gate entry (absorbed the former ``setops`` row to free a gate slot; the
#: join+agg shape the old passthrough text carried stays green via
#: local_supplier_volume / pricing_summary).
_PASSTHROUGH_SQL = """
    SELECT 'union' AS op, key FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS key FROM customer
      UNION SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
    UNION ALL
    SELECT 'intersect', key FROM (
      SELECT CAST(c_nationkey AS BIGINT) AS key FROM customer
      INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
    UNION ALL
    SELECT 'except', key FROM (
      SELECT CAST(c_custkey AS BIGINT) AS key FROM customer
      EXCEPT SELECT CAST(o_custkey AS BIGINT) FROM orders)
"""


def q_sql_passthrough(spark, sf_dir):
    """§3.1: the SQL string entry point is first-class — same Catalyst
    lifecycle as the DataFrame API (R6a/§3 parity). Registered temp views +
    spark.sql running the IDENTICAL text the oracle runs (zero dialect
    delta), covering UNION DISTINCT / INTERSECT / EXCEPT."""
    from datamunging_spark.sources import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_PASSTHROUGH_SQL)


def q_approx_distinct(spark, sf_dir):
    """§2.4 sketch surface: HLL++ approx_count_distinct vs exact.
    Promoted from rows-only to a full oracle row in r8: the RAW estimate
    is engine-specific (DuckDB's HLL differs) so it is no longer a
    return column — the cross-engine-checkable surface is the EXACT
    count (DuckDB-verified) plus the relative-error bound computed
    in-query from the live HLL estimate; if Spark's sketch ever drifts
    outside 10% the boolean turns false and the value hash fails."""
    li = _t(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            / F.col("n_exact")
            < 0.1
        ).alias("within_10pct"),
    )


def q_join_suite(spark, sf_dir):
    """§2.3 join-type family in one gate entry: LEFT OUTER (customer ×
    per-customer order counts, NULL for order-less customers), LEFT SEMI
    (customers with orders), LEFT ANTI (customers without), each tagged.
    Semi/anti are the idiomatic Spark forms of IN / NOT IN subqueries —
    they shuffle only the key column and never duplicate the left side."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("bigint").alias("key")
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("key")
    )
    per_cust = o.groupBy("key").agg(F.count(F.lit(1)).alias("n_orders"))
    tag = lambda df, t: df.select(  # noqa: E731
        F.lit(t).alias("op"), "key", "n_orders"
    )
    null_n = F.lit(None).cast("bigint").alias("n_orders")
    return (
        tag(c.join(per_cust, "key", "left"), "left")
        .unionByName(tag(c.join(o, "key", "semi").select("key", null_n), "semi"))
        .unionByName(tag(c.join(o, "key", "anti").select("key", null_n), "anti"))
    )


def q_json_extract(spark, sf_dir):
    """§2.5 JSON scalar + R18 NULL-on-bad-cast aggregate over events.props."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.sum(F.when(k.isNull(), 1).otherwise(0)).cast("bigint").alias("n_null_k"),
    )


def q_date_agg(spark, sf_dir):
    """§2.5 date functions: per-day per-type event rollup."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


#: Known pivot domain for orders.o_orderstatus (TPC-H fixed enum) — declared
#: so the pivot skips Spark's distinct-discovery job (TESTDATA.md tables).
_ORDER_STATUSES = ["F", "O", "P"]


def q_reshape_suite(spark, sf_dir):
    """§2.8 reshape family: long→wide pivot (count + decimal-exact sum per
    o_orderpriority × o_orderstatus) then wide→long unpivot back, the two
    melts equi-joined. Round-tripping through BOTH reshapes makes the
    output oracle-able as a plain conditional aggregation while still
    exercising the pivot column fan-out and the unpivot expand (a pivot
    bug — dropped cell, swapped column — breaks the hash)."""
    from datamunging_spark.operators.relational import melt, pivot_table

    o = _t(spark, sf_dir, "orders")
    cnt_wide = pivot_table(
        o, ["o_orderpriority"], "o_orderstatus", _ORDER_STATUSES,
        F.count(F.lit(1)),
    )
    sum_wide = pivot_table(
        o, ["o_orderpriority"], "o_orderstatus", _ORDER_STATUSES,
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"),
    )
    cnt_long = melt(
        cnt_wide, ["o_orderpriority"], _ORDER_STATUSES, "status", "cnt"
    )
    sum_long = melt(
        sum_wide, ["o_orderpriority"], _ORDER_STATUSES, "status", "sum_price"
    )
    return (
        cnt_long.join(sum_long, ["o_orderpriority", "status"])
        .filter(F.col("cnt").isNotNull())
        .select(
            F.col("o_orderpriority").alias("priority"),
            "status",
            "cnt",
            "sum_price",
        )
    )


def q_gap_fill(spark, sf_dir):
    """§2.8 time-series gap-fill: daily urgent-order revenue per customer
    cohort, regularized onto a per-cohort daily grid with locf forward
    fill (gap_fill operator: union-tag + window fill, no join against the
    spine). Revenue is decimal-summed per day BEFORE filling, so carried
    values are bit-exact across engines; n_obs marks real days (1) vs
    filled gaps (0)."""
    from datamunging_spark.operators.relational import gap_fill

    o = _t(spark, sf_dir, "orders")
    base = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(
            (F.col("o_custkey") % 5).alias("grp"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev")
        )
    )
    return gap_fill(base, ["grp"], "d", ["rev"], step="1 day")


def q_x6_entity_resolution(spark, sf_dir):
    """X6 entity resolution end-to-end: three record variants per customer
    (base name, 'Cust #' rewrite, ' Inc.' suffix for every 10th key) with
    distinct record ids → blocked on digits%1000, matched on equal digit
    key AND normalized edit similarity ≥ 0.5, clustered via connected
    components, singletons labeled by their own id. The oracle re-derives
    the FULL pipeline in SQL — variants, blocking, levenshtein scoring,
    and transitive clustering as a recursive-CTE closure — so the edge
    semantics and the CC labels are both checked, not just cluster
    counts."""
    from datamunging_spark.operators.entity import (
        name_similarity,
        resolve_entities,
    )

    c = _t(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").cast("bigint").alias("rid"),
        F.col("c_name").alias("name"),
    )
    var_a = c.select(
        (F.col("c_custkey") + 10_000_000).cast("bigint").alias("rid"),
        F.replace(
            F.col("c_name"), F.lit("Customer#"), F.lit("Cust #")
        ).alias("name"),
    )
    var_b = c.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 20_000_000).cast("bigint").alias("rid"),
        F.concat(F.col("c_name"), F.lit(" Inc.")).alias("name"),
    )
    recs = base.unionByName(var_a).unionByName(var_b)
    digits = F.regexp_extract("name", "([0-9]+)", 1).cast("bigint")
    pair_digits_equal = (
        F.regexp_extract("a_name", "([0-9]+)", 1).cast("bigint")
        == F.regexp_extract("b_name", "([0-9]+)", 1).cast("bigint")
    )
    return resolve_entities(
        recs,
        "rid",
        block_key=digits % 1000,
        payload=["name"],
        match_cond=pair_digits_equal
        & (name_similarity("a_name", "b_name") >= 0.5),
        # the oracle has no block cap — pin identical semantics at any SF
        max_block=None,
    )


def q_stream_window_counts(spark, sf_dir):
    """Streaming-shaped tumbling-window aggregate (batch mode of
    streaming.windowed_counts — same expressions lift to readStream)."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_r28_sample_bykey(spark, sf_dir):
    """R28: all-or-none deterministic by-key sample (fixes the reference's
    broken DataFu example, README.md:173-179). md5-based → oracle-exact."""
    c = _t(spark, sf_dir, "customer")
    return sample_by_key(c, "c_custkey", percent=20).select("c_custkey", "c_name")


def q_x1_content_hash(spark, sf_dir):
    """X1 exact-dedup key: normalized-content md5 per doc (cross-engine
    reproducible content addressing)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.md5(normalize_text("text")).alias("content_hash")
    )


def q_x1_dedup_stats(spark, sf_dir):
    """X1 exact dedup summary: total docs vs distinct normalized contents."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(normalize_text("text"))).alias("n_distinct"),
    )


def q_x4_text_stats(spark, sf_dir):
    """X4 text analysis: token count + stopword/punct ratios per doc
    (expression-only, no UDF)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).alias("n_tokens"),
        F.round(stopword_ratio("text"), 6).alias("stop_frac"),
        F.round(punct_ratio("text"), 6).alias("punct_frac"),
    )


def q_x4_word_count(spark, sf_dir):
    """X4: corpus word count, deterministic top-20."""
    d = _t(spark, sf_dir, "documents")
    return word_count(d).orderBy(F.col("cnt").desc(), F.col("word")).limit(20)


def q_x2_topk_cosine(spark, sf_dir):
    """X2: exact brute-force top-5 cosine neighbors for probe vectors
    (generalizes reference findSynonyms, README.md:388-392)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(probes, emb, k=5)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


def q_x2_bm25_hybrid(spark, sf_dir):
    """X2 lexical + hybrid retrieval (r12, slot from the retired
    x5_split_shuffle — see the retirement note in queries()): inverted
    index → BM25 top-10 per query (decimal(28,7) contribution sums —
    reduction-order-free, the DSIR discipline), brute-force cosine
    top-10 for the same probe ids, reciprocal-rank fusion (Cormack'09)
    of the two rankings. The full lexical leg (tokenize → postings →
    idf/length normalization → ranked window) and the fusion arithmetic
    are re-derived in the DuckDB oracle; the vector leg rides the same
    cosine/tiebreak form the x2_topk_cosine oracle already pins. Query
    time never shuffles the postings side — the index scan flows into a
    broadcast join (plan-asserted in tests/test_retrieval.py)."""
    from datamunging_spark.operators.retrieval import (
        bm25_topk,
        index_stats,
        inverted_index,
        rrf_fuse,
    )

    d = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    queries = d.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 40).alias("query"),
    )
    lex = bm25_topk(inverted_index(d), queries, index_stats(d), k=10)
    vec = brute_force_topk(
        emb.filter(F.col("vec_id") < 3), emb, k=10
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([lex.select("query_id", "doc_id", "rank"), vec])
    return fused.select(
        "query_id",
        "doc_id",
        F.col("rank_1").alias("lex_rank"),
        F.col("rank_2").alias("vec_rank"),
        "rrf",
        "rank",
    )


def q_x2_boolean(spark, sf_dir):
    """X2 boolean retrieval (bench-only, late r12): Lucene BooleanQuery
    trio over the inverted index — must (strict AND, unseen terms
    included), should (≥1 fallback when must is empty, BM25 boost
    otherwise), must_not (left-anti exclusion) — ranked by BM25 with
    decimal(28,7) sums. One postings scan for all three roles (term
    union broadcast into a pinned semi-join); pinned to a pure-Python
    reference in tests/test_retrieval.py."""
    from datamunging_spark.operators.retrieval import (
        boolean_topk,
        index_stats,
        inverted_index,
    )

    d = _t(spark, sf_dir, "documents")
    q = local_table(
        spark,
        [
            (0, "table row", "scan hash", "merge"),
            (1, None, "spark window", "the"),
            (2, "row scan", "", None),
        ],
        "query_id long, must string, should string, must_not string",
    )
    return boolean_topk(inverted_index(d), q, index_stats(d), k=10)


_ENTRY_CACHE: dict = {}


def _persisted_artifact(sf_dir, table, tag, build):
    """A fingerprinted /tmp artifact directory shared by the persisted-
    index bench queries: keyed by a FINGERPRINT of the source table
    (path + parquet size/mtime), so regenerating the fixture data under
    the same sf_dir can never silently bench a stale artifact. The
    build lands in a unique temp dir followed by an atomic rename — a
    concurrent builder either wins the rename or discards its copy and
    reads the winner's; no reader can observe a partially written
    artifact. On a successful build, superseded siblings of the same
    ``tag`` AND the same sf_dir (stale fingerprints) and ABANDONED
    ``.build.`` temps (>1h old — a live concurrent build is minutes
    old) are best-effort deleted so /tmp stays bounded across fixture
    regenerations. The directory name carries a stable per-sf_dir
    component SEPARATE from the content fingerprint
    (``spark_graft_{tag}_{sf8}_{fp12}``) and eviction only ever
    touches siblings sharing that component — benching a second
    corpus on the same machine no longer deletes the first corpus's
    live artifact out from under a concurrent bench (r15-close
    advice)."""
    import hashlib
    import os as _os
    import shutil
    import tempfile
    import time as _time

    sf8 = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    h = hashlib.md5(sf_dir.encode())
    droot = _os.path.join(sf_dir, f"{table}.parquet")
    parts = (
        sorted(
            _os.path.join(droot, p) for p in _os.listdir(droot)
        )
        if _os.path.isdir(droot)
        else [droot]
    )
    for p in parts:
        st = _os.stat(p)
        h.update(
            f"{_os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}"
            .encode()
        )
    base = _os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_{tag}_{sf8}_{h.hexdigest()[:12]}",
    )
    if not _os.path.isdir(base):
        tmp = tempfile.mkdtemp(
            prefix=_os.path.basename(base) + ".build.",
            dir=tempfile.gettempdir(),
        )
        build(tmp)
        try:
            _os.rename(tmp, base)
        except OSError:
            # a concurrent builder won the rename — use its copy
            shutil.rmtree(tmp, ignore_errors=True)
        for sib in _os.listdir(tempfile.gettempdir()):
            sp = _os.path.join(tempfile.gettempdir(), sib)
            # only siblings of the SAME corpus (tag + sf component) are
            # candidates — another sf_dir's artifact is live by
            # definition, not superseded
            if not sib.startswith(f"spark_graft_{tag}_{sf8}_") or \
                    sp == base:
                continue
            if ".build." in sib:
                try:
                    if _time.time() - _os.stat(sp).st_mtime < 3600:
                        continue
                except OSError:
                    continue
            shutil.rmtree(sp, ignore_errors=True)
    return base


def _bm25_persisted_index(spark, sf_dir):
    """Materialize the BM25 index-build artifacts (postings + term df +
    one-row stats) to parquet ONCE per corpus — the cost a real
    deployment pays at index-build time — and return the read-back
    tables (fingerprinted /tmp layout + atomic build + eviction via
    :func:`_persisted_artifact`). Cached process-wide; the in-process
    cache keys on the fingerprinted path too, so regenerating the
    fixture mid-session invalidates both tiers."""
    from datamunging_spark.operators.retrieval import (
        index_stats,
        inverted_index,
        term_stats,
    )

    def build(tmp):
        d = _t(spark, sf_dir, "documents")
        # positional since r15: the same artifact serves BM25 (parquet
        # column pruning keeps `positions` unread on that path — plan-
        # checked in SCALE.md) and the hit_windows/snippets highlight
        # leg; the tag carries the layout so pre-r15 caches can't be
        # read stale
        post = inverted_index(d, positions=True)
        post.write.mode("overwrite").parquet(f"{tmp}/postings")
        term_stats(
            spark.read.parquet(f"{tmp}/postings")
        ).write.mode("overwrite").parquet(f"{tmp}/dfreq")
        index_stats(d).write.mode("overwrite").parquet(f"{tmp}/stats")

    base = _persisted_artifact(sf_dir, "documents", "bm25pos", build)
    key = ("bm25_idx", base)
    if key in _ENTRY_CACHE:
        return _ENTRY_CACHE[key]
    out = (
        spark.read.parquet(f"{base}/postings"),
        spark.read.parquet(f"{base}/dfreq"),
        spark.read.parquet(f"{base}/stats"),
    )
    _ENTRY_CACHE[key] = out
    return out


def _ivf_persisted_store(spark, sf_dir):
    """Materialize an IVF index over 90% of the embeddings table
    (inverted lists partitioned by ``_cell`` + the relational centers
    table) — the artifact a vector deployment pays for at build time;
    the remaining 10% slice is the bench's ingest batch. Same
    fingerprint/atomic-rename/eviction story as the BM25 index."""
    from datamunging_spark.operators.similarity import (
        ivf_build,
        ivf_centers_table,
    )

    def build(tmp):
        emb = _t(spark, sf_dir, "embeddings")
        hist = emb.filter(F.col("vec_id") % 10 != 0)
        idx = ivf_build(hist, n_clusters=16, seed=42)
        idx.assigned.write.mode("overwrite").partitionBy(
            "_cell"
        ).parquet(f"{tmp}/assigned")
        ivf_centers_table(idx).write.mode("overwrite").parquet(
            f"{tmp}/centers"
        )

    base = _persisted_artifact(sf_dir, "embeddings", "ivf", build)
    key = ("ivf_idx", base)
    if key in _ENTRY_CACHE:
        return _ENTRY_CACHE[key]
    out = (
        spark.read.parquet(f"{base}/assigned"),
        spark.read.parquet(f"{base}/centers"),
    )
    _ENTRY_CACHE[key] = out
    return out


def q_x2_ivf_advance(spark, sf_dir):
    """X2 vector-index maintenance, the 100 TB ingest-loop shape
    (bench-only, r15 — the lexical x2_bm25_persisted's vector twin):
    roll a PERSISTED IVF index forward by one ingest batch (the 10%
    embeddings slice, frozen-centroid Arrow assignment, drift valve
    armed) and search the advanced index (8 probe vectors, n_probe=4).
    The first rep pays the one-time index build (folded out by the
    median-of-3 protocol); steady state measures exactly what a
    production advance+serve loop pays per batch: one O(batch) Arrow
    assignment + one batch-sized drift aggregate + the probed-cell
    equi-join — the history lists are read, never rescanned per rep,
    never shuffled."""
    from datamunging_spark.operators.similarity import (
        advance_ivf_index,
        ivf_index_from_tables,
        ivf_search,
    )

    assigned, centers = _ivf_persisted_store(spark, sf_dir)
    idx = ivf_index_from_tables(assigned, centers)
    emb = _t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        "embedding",
    )
    adv = advance_ivf_index(idx, batch, max_drift=4.0)
    queries = emb.filter(F.col("vec_id") < 8)
    return ivf_search(queries, adv, k=10, n_probe=4)


def q_x2_hybrid_snippets(spark, sf_dir):
    """X2 hybrid retrieval with the r14/r15 highlight legs end-to-end
    (bench-only, r15): BM25 over the PERSISTED lexical index fused
    (RRF) with a brute-force vector leg, then hit_windows computes
    best-window offsets for the fused hits and snippets cuts the
    display text — the full serve-path composition a search deployment
    runs per query batch. Window+snippet cost rides on hits-sized
    joins by construction (the postings scan is cut to the top-k doc
    list first), so the composite prices the highlight leg without a
    second corpus exchange."""
    from datamunging_spark.operators.retrieval import (
        bm25_topk,
        hit_windows,
        rrf_fuse,
        snippets,
    )
    from datamunging_spark.operators.similarity import brute_force_topk

    post, dfreq, stats = _bm25_persisted_index(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.substring(F.col("text"), 1, 60).alias("query"),
    )
    lex = bm25_topk(post, queries, stats, dfreq=dfreq, k=10)
    emb = _t(spark, sf_dir, "embeddings")
    vec = brute_force_topk(
        emb.filter(F.col("vec_id") < 8),
        emb,
        k=10,
        arrow_cosine=True,
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([lex.select("query_id", "doc_id", "rank"), vec])
    win = hit_windows(post, fused, queries)
    return snippets(d, win)


def q_x2_bm25_persisted(spark, sf_dir):
    """X2 lexical retrieval, the 100 TB query-loop shape (bench-only,
    r13): BM25 top-10 against a MATERIALIZED postings/dfreq/stats
    parquet index — what SCALE.md's 'persisted table in real use' note
    promises, benched per-round instead of probed once. The first rep
    pays the one-time index build (folded out by the median-of-3
    protocol); steady state is the pure query path: one pushed postings
    scan semi-joined to the broadcast query terms, broadcast df/stats,
    one matched-sized score aggregate, per-query window — ZERO
    corpus-sized exchanges (the build exchange is gone; contrast
    x2_bm25_hybrid, which rebuilds inline). No stopword valve here: the
    synthetic corpus draws from a ~31-word vocabulary, so every term's
    df exceeds any realistic max_df_frac (the valve is pytest-pinned on
    planted corpora instead)."""
    from datamunging_spark.operators.retrieval import bm25_topk

    post, dfreq, stats = _bm25_persisted_index(spark, sf_dir)
    d = _t(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 40).alias("query"),
    )
    return bm25_topk(post, queries, stats, k=10, dfreq=dfreq)


def q_x2_bm25f(spark, sf_dir):
    """X2 BM25F weighted multi-field search (bench-only, r13): split
    each document into a synthetic title (first 25 chars) + body,
    build the fielded index inline (one corpus scan, structs double-
    exploded), rank 8 queries with title weighted 2.5× — the simple
    BM25F of Robertson/Zaragoza/Taylor '04 (per-field length
    normalization, weights INSIDE the saturation so a term hitting
    both fields saturates once). Pinned to a pure-Python reference in
    tests/test_retrieval.py; decimal(28,7) field folds keep the score
    reduction-order-free."""
    from datamunging_spark.operators.retrieval import (
        bm25f_topk,
        field_stats,
        fielded_index,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 25).alias("title"),
        F.col("text").alias("body"),
    )
    q = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 8).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 40).alias("query"),
    )
    return bm25f_topk(
        fielded_index(d, ["title", "body"]),
        q,
        field_stats(d, ["title", "body"]),
        weights={"title": 2.5, "body": 1.0},
        k=10,
    )


def q_r33_tfidf(spark, sf_dir):
    """R33/R34: exact per-(doc,term) TF-IDF as relational algebra (explode →
    two hash aggs → term join + broadcast corpus count)."""
    d = _t(spark, sf_dir, "documents")
    return tfidf_scores(d).select(
        "doc_id", "term", "tf", "df", F.round("tfidf", 6).alias("tfidf")
    )


def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped 6-table join: dims broadcast, facts shuffle on join
    keys only; AQE reorders/switches strategies at runtime."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


def q_agg_suite(spark, sf_dir):
    """§2.4 aggregate + grouping-sets family, one gate entry (merged from
    round-1's agg_suite + grouping_suite for the 50-entry cap — frees a
    slot for x7_event_suite; both remain individually benched). Branches
    'rollup'/'cube': ROLLUP and CUBE over (returnflag, linestatus).
    Branches 'stats_*': per-returnflag min/max/avg/stddev/count_distinct
    and a deterministic sorted collect_set, MELTED into tag rows through
    one explode so the base aggregate is consumed once. Common
    (op, k1, k2, n, x, s) schema; collect_set serialized to a string so
    the driver's canonicalizer can sort/hash it (round-1 gate red was
    exactly that column's type)."""
    li = _t(spark, sf_dir, "lineitem")

    def aggd(g):
        return g.agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )

    def norm(df, t):
        return df.select(
            F.lit(t).alias("op"),
            F.col("l_returnflag").alias("k1"),
            F.col("l_linestatus").alias("k2"),
            F.col("n_items").cast("long").alias("n"),
            F.col("sum_qty").alias("x"),
            F.lit(None).cast("string").alias("s"),
        )

    r = norm(aggd(li.rollup("l_returnflag", "l_linestatus")), "rollup")
    c = norm(aggd(li.cube("l_returnflag", "l_linestatus")), "cube")

    base = li.groupBy("l_returnflag").agg(
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.countDistinct("l_partkey").cast("long").alias("n_parts"),
        F.concat_ws(",", F.sort_array(F.collect_set("l_linestatus"))).alias(
            "statuses"
        ),
    )
    nil_n = F.lit(None).cast("long")
    nil_x = F.lit(None).cast("double")
    nil_s = F.lit(None).cast("string")

    def cell(t, n=None, x=None, s=None):
        return F.struct(
            F.lit(t).alias("op"),
            (n if n is not None else nil_n).alias("n"),
            (x if x is not None else nil_x).alias("x"),
            (s if s is not None else nil_s).alias("s"),
        )

    stats = base.select(
        F.col("l_returnflag").alias("k1"),
        F.explode(
            F.array(
                cell("stats_min", x=F.col("min_qty")),
                cell("stats_max", x=F.col("max_qty")),
                cell("stats_avg", x=F.col("avg_qty")),
                cell("stats_sd", x=F.col("sd_qty")),
                cell("stats_distinct", n=F.col("n_parts")),
                cell("stats_set", s=F.col("statuses")),
            )
        ).alias("_c"),
    ).select(
        F.col("_c.op").alias("op"),
        "k1",
        nil_s.alias("k2"),
        F.col("_c.n").alias("n"),
        F.col("_c.x").alias("x"),
        F.col("_c.s").alias("s"),
    )
    return r.unionByName(c).unionByName(stats)


def q_grouping_suite(spark, sf_dir):
    """§2.4 grouping-sets family in one gate entry: ROLLUP and CUBE over
    (returnflag, linestatus) with identical aggregates, tagged per operator.
    (Merged from round-1's rollup_sales + cube_sales for the 50-entry gate
    cap — frees a slot for range_join_bands.)"""
    li = _t(spark, sf_dir, "lineitem")

    def aggd(g):
        return g.agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )

    r = aggd(li.rollup("l_returnflag", "l_linestatus"))
    c = aggd(li.cube("l_returnflag", "l_linestatus"))
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "*")  # noqa: E731
    return tag(r, "rollup").unionByName(tag(c, "cube"))


def q_range_join_bands(spark, sf_dir):
    """§2.3 range join (point ∈ [start, end]) via interval bucketing — a
    plain equi-join on floor(x/width) bucket ids + exact filter, never the
    BroadcastNestedLoop plan a raw theta join would produce (plan-pinned by
    test_range_join_is_equi_join_not_nested_loop). Here: lineitems priced
    within ±5% of a part's retail price, aggregated per part."""
    from datamunging_spark.operators.relational import range_join

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    bands = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            (F.col("p_retailprice") * 0.95).alias("lo"),
            (F.col("p_retailprice") * 1.05).alias("hi"),
        )
    )
    rj = range_join(li, bands, "l_extendedprice", "lo", "hi", bucket_width=50.0)
    return rj.groupBy("p_partkey").agg(
        F.count(F.lit(1)).alias("n_in_band"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14-shaped: date-range scan filter (pushed to parquet) +
    broadcast part join + conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_sessionize_events(spark, sf_dir):
    """§2.8 growth path: gap-based sessionization via built-in
    session_window (same operator lifts to streaming with a watermark)."""
    e = _t(spark, sf_dir, "events")
    return sessionize(e, gap="5 minutes")


def q_asof_join(spark, sf_dir):
    """As-of join (§2.8 extension): each click matched to the user's most
    recent prior purchase — union-tag + window forward-fill, one shuffle
    (vs DuckDB's native ASOF JOIN as the oracle)."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        right_cols={"event_id": "prev_purchase_id", "value": "prev_value"},
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "prev_purchase_id",
        F.round("prev_value", 6).alias("prev_value"),
    )


def q_x4_token_counts(spark, sf_dir):
    """X4 token counting: whitespace tokens + GPT-2-ish pretokenizer regex
    count (the cheap LLM-token estimator for data budgeting)."""
    from datamunging_spark.functions import bpe_ish_token_count, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
    )


def q_x4_quality_filters(spark, sf_dir):
    """X4 quality filters: charset (ascii fraction) + boilerplate
    (token-repetition) signals with a keep/drop verdict column."""
    from datamunging_spark.functions import ascii_ratio, repetition_ratio

    d = _t(spark, sf_dir, "documents")
    ar = F.round(ascii_ratio("text"), 6)
    rr = F.round(repetition_ratio("text"), 6)
    return d.select(
        "doc_id",
        ar.alias("ascii_frac"),
        rr.alias("rep_frac"),
        ((ar >= 0.5) & (rr <= 0.9)).alias("keep"),
    )


def q_x4_lang_id(spark, sf_dir):
    """X4 language-ID: marker-token argmax heuristic vs ground-truth lang."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "lang", detect_language("text").alias("lang_detected")
    )


def q_x4_fingerprint(spark, sf_dir):
    """X4 document fingerprint: md5 over the sorted distinct token bag
    (order-insensitive, engine-portable)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", bag_fingerprint("text").alias("fp"))


def q_x4_text_suite(spark, sf_dir):
    """X4 text-analysis suite in one gate entry and ONE scan: token counts
    (whitespace + BPE-ish), stopword/punct ratios, language-ID, charset +
    boilerplate quality signals with keep verdict, and the order-insensitive
    document fingerprint. (Merged from round-1's five per-doc x4 entries —
    x4_text_stats/token_counts/lang_id/quality_filters/fingerprint — for the
    50-entry gate cap; each remains individually benched and pytest-covered.
    The merge is also the honest production shape: all signals are pure
    expressions computed in a single codegen'd pass over the corpus.)"""
    from datamunging_spark.functions import (
        ascii_ratio,
        bpe_ish_token_count,
        repetition_ratio,
        token_count,
    )

    d = _t(spark, sf_dir, "documents")
    ar = F.round(ascii_ratio("text"), 6)
    rr = F.round(repetition_ratio("text"), 6)
    return d.select(
        "doc_id",
        F.size(F.split("text", " ", -1)).alias("n_tokens"),
        F.round(stopword_ratio("text"), 6).alias("stop_frac"),
        F.round(punct_ratio("text"), 6).alias("punct_frac"),
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_tokens"),
        "lang",
        detect_language("text").alias("lang_detected"),
        ar.alias("ascii_frac"),
        rr.alias("rep_frac"),
        ((ar >= 0.5) & (rr <= 0.9)).alias("keep"),
        bag_fingerprint("text").alias("fp"),
    )


def q_x5_decontaminate(spark, sf_dir):
    """X5 benchmark-decontamination suite, both exact modes in one gate
    entry, tagged by ``mode``: (a) GPT-3-style n-gram collision — drop
    corpus docs sharing ≥2 distinct 5-grams with the eval set (played here
    by every 20th doc); (b) exact-substring — drop docs CONTAINING any
    short eval payload verbatim (played by the first 48 normalized chars
    of every 20th doc), the mode n-gram collision misses when the payload
    is shorter than the gram window. Both eval sets are broadcast — no
    corpus shuffle; oracle-exact because grams/substrings are compared as
    strings, not engine hashes. (Suite-merged mid-round-6 so the new
    substring mode gets oracle visibility inside the 50-entry cap; the
    fuzzy mode stays pytest-covered — engine-hash-based, rows-only by
    nature.) r8: the round-6 corpus localCheckpoint is REMOVED — the
    consumers are plain pruned parquet scans (~5 of them), each cheaper
    than the checkpoint's write job, and at 100 TB re-scanning a
    columnar table per branch is the correct shape while materializing
    the corpus is not (the r6 regression was about re-executing a
    DERIVED plan, which a bare table scan isn't); the lazy substring
    guard (r8) also drops the probe-count job. Floor analysis in
    SCALE.md."""
    from datamunging_spark.functions import normalize_text
    from datamunging_spark.operators.trainset import (
        decontaminate,
        decontaminate_substring,
    )

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    ngram = decontaminate(d, bench, n=5, min_overlap=2).select(
        F.lit("ngram").alias("mode"), "doc_id", "source"
    )
    payloads = bench.select(
        F.substring(normalize_text("text"), 1, 48).alias("text")
    )
    substr = decontaminate_substring(d, payloads, min_len=20).select(
        F.lit("substring").alias("mode"), "doc_id", "source"
    )
    return ngram.unionByName(substr)


def q_x5_source_mix(spark, sf_dir):
    """X5 weighted source mixing: src0 upsampled 2.5× (2 full copies + md5
    fractional), src1 halved, src2 dropped, src3 tripled exactly, all other
    sources kept 1×. Deterministic md5 predicate → oracle-exact; pure
    per-row expressions, zero shuffles."""
    from datamunging_spark.operators.trainset import source_mix

    d = _t(spark, sf_dir, "documents")
    return source_mix(
        d.select("doc_id", "source"),
        {"src0": 2.5, "src1": 0.5, "src2": 0.0, "src3": 3.0},
    )


def q_x5_train_shuffle(spark, sf_dir):
    """X5 deterministic training shuffle: salted md5 permutation key,
    range-partitioned + locally sorted (one exchange; writing this yields a
    reproducible global training order)."""
    from datamunging_spark.operators.trainset import training_shuffle

    d = _t(spark, sf_dir, "documents")
    return training_shuffle(
        d.select("doc_id", "source"), ["doc_id"], salt="epoch0"
    )


def q_x5_split_shuffle(spark, sf_dir):
    """X5 deterministic dataset split + training shuffle in one gate entry
    (both are pure salted-md5 row expressions — the portable-determinism
    family): 90/5/5 train/val/test assignment by hashing row identity into
    [0,1) and cutting at the cumulative weights, plus the epoch-salted
    shuffle permutation key. A doc's split never changes when the corpus
    grows (stable held-out sets across corpus versions) and the shuffle
    is reproducible on any engine/partitioning — both claims the oracle
    re-derives exactly. (Replaces round-4's shuffle-only x5_train_shuffle
    row; that query stays benched.)"""
    from datamunging_spark.operators.trainset import (
        split_dataset,
        training_shuffle,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    split = split_dataset(
        d, {"train": 0.9, "val": 0.05, "test": 0.05}, ["doc_id"], salt="v1"
    )
    return training_shuffle(split, ["doc_id"], salt="epoch0")


def q_x3_media_features(spark, sf_dir):
    """X3 multimodal plumbing: binary payload + metadata struct →
    mapInPandas feature extraction (deterministic fake decode)."""
    d = _t(spark, sf_dir, "documents")
    feats = extract_features(attach_binary_payload(d))
    return feats.select(
        "doc_id", "media_type", "n_bytes", "fake_width", "fake_height"
    )


def q_x3_phash_neardup(spark, sf_dir):
    """X3 perceptual-hash image near-dup (bench-only, r12): 64-bit dHash
    per binary payload in ONE Arrow pass (codec seam; deterministic fake
    decode here), then the SimHash bit-band equi-join (pigeonhole-exact
    recall at hamming <= bands-1) and min-id CC survivor selection —
    the multimodal dedup leg: only (id, 8-byte hash) rows ever shuffle,
    payload bytes stay in their scan tasks. Runs at the TIGHT published
    band (hamming <= 3, 4 bands = SELECTIVE 16-bit band keys — a wider
    band would shrink keys to 4 bits and degenerate the equi-join
    toward all-pairs, the r12 review catch). Because the fake decode's
    byte-bucket means drift more per text edit than a real resize
    decode, near-dups are PLANTED the way real image near-dups behave:
    every 10th doc re-enters with two in-place byte edits (JVM
    ``overlay`` — no length change, so bucket boundaries hold), which
    the tight band must recover and CC must fold back onto the
    originals."""
    from datamunging_spark.operators.multimodal import phash_dedup

    d = _t(spark, sf_dir, "documents")
    near = (
        d.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn(
            "text",
            F.overlay(F.overlay("text", F.lit("Q"), 5), F.lit("Z"), 40),
        )
    )
    corpus = attach_binary_payload(d.unionByName(near))
    return phash_dedup(corpus, max_hamming=3, bands=4).select(
        "doc_id", "source"
    )


def q_x3_incremental_phash(spark, sf_dir):
    """X3 incremental image ingest (bench-only, r12): docs < 400 are the
    already-ingested media corpus, represented ONLY by their (id, 8-byte
    dHash) snapshot — the slimmest history artifact in the incremental
    family; the new batch is the remaining docs PLUS near-dups of every
    10th history doc appended to it (in-place overlay edits, re-keyed
    +10M). One Arrow hash pass over the batch, bit-band history×batch
    equi-join, hamming verify, intra-batch CC — history payloads never
    rescanned, batch payloads never shuffled. Planted-case semantics
    pinned in tests/test_extensions.py."""
    from datamunging_spark.operators.multimodal import (
        incremental_phash_dedup,
        phash_df,
    )

    d = _t(spark, sf_dir, "documents")
    hist = attach_binary_payload(d.filter(F.col("doc_id") < 400))
    plants = (
        d.filter(F.col("doc_id") < 400)
        .filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
        .withColumn("text", F.overlay("text", F.lit("Q"), 5))
    )
    batch = attach_binary_payload(
        d.filter(F.col("doc_id") >= 400).unionByName(plants)
    )
    # the history and batch Arrow hash passes are independent —
    # overlapped per guide §2.6 (r16)
    hist_sh, batch_sh = _co_materialize(
        lambda: phash_df(hist).localCheckpoint(),
        lambda: phash_df(batch).localCheckpoint(),
    )
    return incremental_phash_dedup(
        batch, hist_sh, max_hamming=3, _precomputed_hash=batch_sh
    ).select("doc_id", "source")


def q_x1_ngram_jaccard(spark, sf_dir):
    """X1 exact n-gram Jaccard over all pairs (a < b), threshold 0.5 — the
    oracle baseline that recovers exactly the planted near-dup pairs.

    This entry deliberately runs with the ``max_gram_df`` hot-shingle valve
    OFF: that is the parity configuration (the oracle must see every gram).
    The scale configuration — valve ON so one ubiquitous shingle cannot
    create a quadratic collision group — is pinned by
    tests/test_dedup_similarity.py::test_ngram_jaccard_hot_shingle_valve;
    production near-dup at 100 TB goes through MinHash-LSH candidates +
    exact rescoring (x1_minhash_pairs) instead."""
    d = _t(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(d, d, n=3, threshold=0.5)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def q_x1_embedding_neardup(spark, sf_dir):
    """X1 embedding-cosine near-dup: probe vectors (id % 25 == 0) vs corpus,
    cosine ≥ 0.35 (exact brute force; LSH variant in x2_ann_lsh)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 25 == 0)
    return embedding_neardup_pairs(probes, emb, threshold=0.35).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


def q_x_curation_exact(spark, sf_dir):
    """X1+X4 composed pipeline, exact stages only (oracle-checkable):
    quality gates → exact dedup → surviving doc ids."""
    from datamunging_spark.operators.pipeline import curate_corpus

    d = _t(spark, sf_dir, "documents")
    out = curate_corpus(
        d, min_tokens=5, max_repetition=0.9, fuzzy=False
    )
    return out.select("doc_id", "source")


def q_r26_sample_bernoulli(spark, sf_dir):
    """R26/R27/R30 (README.md:159,229): 20% Bernoulli row sample in the
    portable md5-row-predicate form (same trick as R28 at row granularity) —
    deterministic on any engine and any partitioning, hence oracle-exact.
    The Spark-RNG sampler (``bernoulli_sample``) remains the native path,
    property-tested in tests/test_sampling.py (fraction CI + fixed-seed
    determinism)."""
    from datamunging_spark.operators.sampling import bernoulli_sample_portable

    li = _t(spark, sf_dir, "lineitem")
    return bernoulli_sample_portable(
        li, 0.2, key_cols=["l_orderkey", "l_linenumber"]
    ).select("l_orderkey", "l_linenumber")


def q_sampling_suite(spark, sf_dir):
    """R26/R27/R30 + R28 sampling family in one gate entry (merged from
    round-5's r26_sample_bernoulli + r28_sample_bykey rows for the
    50-entry cap; both operators keep their own pytest + bench coverage):
    branch 'bernoulli' = 20% portable md5 ROW sample of lineitem, branch
    'bykey' = all-or-none 20% KEY sample of customer. Both are pure
    codegen filter predicates — no shuffle, no RNG stream — so the union
    is oracle-exact on any engine and any partitioning."""
    from datamunging_spark.operators.sampling import bernoulli_sample_portable

    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    bern = bernoulli_sample_portable(
        li, 0.2, key_cols=["l_orderkey", "l_linenumber"]
    ).select(
        F.lit("bernoulli").alias("op"),
        F.col("l_orderkey").cast("long").alias("k1"),
        F.col("l_linenumber").cast("string").alias("k2"),
    )
    byk = sample_by_key(c, "c_custkey", percent=20).select(
        F.lit("bykey").alias("op"),
        F.col("c_custkey").cast("long").alias("k1"),
        F.col("c_name").alias("k2"),
    )
    return bern.unionByName(byk)


def q_x6_snapshot_history(spark, sf_dir):
    """X6 dataset-version bookkeeping (operators/history.py), both halves
    oracle-paired in one suite row. Branch 'diff': snapshot_diff between
    customer v_old (every %101 key absent) and v_new (acctbal bumped for
    %13 keys) — the added/removed/changed audit of a republished table,
    computed as slim (key, content-digest) projections into ONE full-outer
    join. Branch 'scd2': scd2_build over three synthetic mktsegment
    snapshots — validity intervals from one key-partitioned
    window+aggregate pass. The DuckDB oracle re-derives the diff with
    FULL OUTER JOIN + IS DISTINCT FROM and the SCD-2 with lag/segment-sum
    windows, so both halves' semantics are hash-checked cell-by-cell.
    Branch 'apply': apply_changelog (CDC MERGE — latest-wins window over
    the changelog only + ONE full-outer merge join) rolls customer forward
    through a synthetic upsert/delete log, and snapshot_diff recovers the
    change set, which must equal the changelog's effect exactly — the
    diff∘apply = changelog round-trip, re-derived closed-form in SQL.
    Branch 'lookup': scd2_lookup point-in-time read of the dim at ts=2
    for every key (asof union-tag fill, no range join) vs the closed-form
    'what snapshot v2 shows' in SQL."""
    from datamunging_spark.operators.history import (
        apply_changelog,
        scd2_build,
        snapshot_diff,
    )

    c = _t(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 101 != 0)
    new = c.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 13 == 0, F.col("c_acctbal") + 1.0
        ).otherwise(F.col("c_acctbal")),
    )
    diff = snapshot_diff(
        old, new, ["c_custkey"], ["c_acctbal", "c_mktsegment"]
    ).select(
        F.lit("diff").alias("part"),
        F.col("c_custkey").cast("long").alias("key"),
        F.col("status").alias("attr"),
        F.lit(None).cast("int").alias("v_from"),
        F.lit(None).cast("int").alias("v_to"),
    )
    versions = [
        c.select(
            "c_custkey",
            F.when(
                (F.col("c_custkey") + v) % 7 == 0, F.lit("SHIFTED")
            ).otherwise(F.col("c_mktsegment")).alias("seg"),
            F.lit(v).alias("v"),
        )
        for v in (1, 2, 3)
    ]
    snaps = versions[0].unionByName(versions[1]).unionByName(versions[2])
    # ONE scd2_build plan serves both the 'scd2' branch and the 'lookup'
    # branch's dim (building it twice would double the window+aggregate
    # work per gate/bench run — Catalyst does not dedup identical
    # subtrees under a union)
    dim = scd2_build(snaps, ["c_custkey"], ["seg"], "v")
    scd = dim.select(
        F.lit("scd2").alias("part"),
        F.col("c_custkey").cast("long").alias("key"),
        F.col("seg").alias("attr"),
        F.col("effective_from").cast("int").alias("v_from"),
        F.col("effective_to").cast("int").alias("v_to"),
    )
    slim = c.select("c_custkey", "c_mktsegment")
    changes = slim.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.lit(1).alias("ver"),
        F.when(F.col("c_custkey") % 21 == 0, "delete")
        .otherwise("upsert")
        .alias("op"),
    )
    applied = apply_changelog(slim, changes, ["c_custkey"], "ver", op_col="op")
    apply_branch = snapshot_diff(slim, applied, ["c_custkey"]).select(
        F.lit("apply").alias("part"),
        F.col("c_custkey").cast("long").alias("key"),
        F.col("status").alias("attr"),
        F.lit(None).cast("int").alias("v_from"),
        F.lit(None).cast("int").alias("v_to"),
    )
    # Branch 'lookup': point-in-time read of the SCD-2 dim at ts=2 for
    # every key (scd2_lookup's asof fill) — the oracle derives the same
    # value closed-form as "the segment snapshot v2 shows".
    from datamunging_spark.operators.history import scd2_lookup

    facts = c.select("c_custkey", F.lit(2).alias("ts"))
    lookup = scd2_lookup(facts, dim, ["c_custkey"], "ts").select(
        F.lit("lookup").alias("part"),
        F.col("c_custkey").cast("long").alias("key"),
        F.col("seg").alias("attr"),
        F.lit(None).cast("int").alias("v_from"),
        F.lit(None).cast("int").alias("v_to"),
    )
    return (
        diff.unionByName(scd).unionByName(apply_branch).unionByName(lookup)
    )


def q_x7_event_suite(spark, sf_dir):
    """X7 event analytics, oracle-paired: ordered funnel
    view→click→purchase (per-user sorted-array fold, ONE shuffle — the
    DuckDB oracle is the chained-CTE formulation, k-1 self-joins, so the
    pair proves the fold computes the textbook semantics) + weekly cohort
    retention (first-event agg + user-grain join vs the oracle's window
    re-derivation) + the banded interval-overlap self-join of per-user
    hour spans (canonical-bucket dedup vs the oracle's raw range
    predicate — duplicate-free banding checked pair by pair). Common
    (part, k, off, n) schema."""
    from datamunging_spark.operators.relational import (
        cohort_retention,
        funnel_report,
        interval_join,
    )

    e = _t(spark, sf_dir, "events")
    nil_n = F.lit(None).cast("long")
    fun = funnel_report(
        e, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).select(
        F.lit("funnel").alias("part"),
        F.col("step_name").alias("k"),
        F.col("step").cast("long").alias("off"),
        F.col("n_users").cast("long").alias("n"),
    )
    coh = cohort_retention(e, "user_id", "ts", period_days=7).select(
        F.lit("cohort").alias("part"),
        F.col("cohort_start").cast("string").alias("k"),
        F.col("period_offset").cast("long").alias("off"),
        F.col("n_users").cast("long").alias("n"),
    )
    spans = e.groupBy("user_id").agg(
        F.min(F.unix_timestamp("ts")).cast("double").alias("s"),
        (F.min(F.unix_timestamp("ts")) + 3600).cast("double").alias("t"),
    )
    a = spans.select(
        F.col("user_id").alias("a_uid"), F.col("s").alias("a_s"),
        F.col("t").alias("a_t"),
    )
    b = spans.select(
        F.col("user_id").alias("b_uid"), F.col("s").alias("b_s"),
        F.col("t").alias("b_t"),
    )
    ovl = interval_join(
        a, b, "a_s", "a_t", "b_s", "b_t", bucket_width=1800
    ).select(
        F.lit("overlap").alias("part"),
        F.col("a_uid").cast("string").alias("k"),
        F.col("b_uid").cast("long").alias("off"),
        nil_n.alias("n"),
    )
    return fun.unionByName(coh).unionByName(ovl)


def q_x8_heavy_hitters(spark, sf_dir):
    """X8 heavy-hitter sketch (bench-only; guarantees pinned by
    tests/test_sketch.py): Misra-Gries frequent words over the documents
    corpus — one Arrow pass with ≤ k counters per partition, shuffle
    bounded at partitions × (k+2) rows regardless of vocabulary size
    (operators/sketch.py docstring has the bounds). In-query invariants:
    the count bracket is non-degenerate and the error floor respects the
    (k+1) bound."""
    from datamunging_spark.functions import tokenize
    from datamunging_spark.operators.sketch import heavy_hitters

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(tokenize(F.lower(F.col("text")))).alias("word")
    )
    hh = heavy_hitters(words, "word", k=2048, min_share=0.002)
    # REAL invariant, not an arithmetic tautology: re-count the few
    # surviving words exactly and require the true count inside the
    # sketch bracket — the MG guarantee checked in-query at bench scale
    # every round. Survivors broadcast-semi-join the token stream BEFORE
    # the aggregate (the top_k_exact_via_sketch shape), so the recount's
    # agg output is bounded by the survivor count, not the vocabulary.
    exact = (
        words.select(F.col("word").alias("value"))
        .join(F.broadcast(hh.select("value")), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("_exact"))
    )
    return hh.join(exact, "value", "left").select(
        "value",
        "count_lo",
        "count_hi",
        "n_total",
        "max_err",
        (
            F.col("_exact").isNotNull()
            & (F.col("count_lo") <= F.col("_exact"))
            & (F.col("_exact") <= F.col("count_hi"))
        ).alias("bracket_ok"),
        (
            # r9 (ADVICE): the MG merge bound is GLOBAL — Σd_i ≤
            # Σn_i/(k+1) = n/(k+1) because d_i ≤ n_i/(k+1) per partition
            # and the n_i sum to n. Assert it directly (the r8 ×64 slack
            # rested on a per-task misreading and was ~64× looser than
            # the theory, masking decrement-accounting regressions).
            # +1 absolute slack only for integer floor-division rounding.
            F.col("max_err")
            <= F.col("n_total") / F.lit(2048 + 1) + F.lit(1)
        ).alias("within_err_floor"),
    )


def q_x8_distinct_users(spark, sf_dir):
    """X8 per-key HLL distinct-count state (bench-only; merge identity
    and streaming fold pinned by tests/test_sketch.py): distinct users
    per event_type via Spark's built-in DataSketches HLL, cross-checked
    in-query against the exact distinct count — within_hll_error pins
    the lgk=12 error band (~1.6% @1σ; 5% asserted) at bench scale every
    round. The exact side is affordable here; at 100 TB only the sketch
    side runs and the bound is carried by the pinned tests."""
    from datamunging_spark.operators.sketch import (
        distinct_estimate,
        distinct_sketch,
    )

    e = _t(spark, sf_dir, "events")
    est = distinct_estimate(
        distinct_sketch(e, ["event_type"], "user_id"), ["event_type"]
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "distinct_est",
        "exact_distinct",
        (
            F.abs(F.col("distinct_est") - F.col("exact_distinct"))
            <= F.greatest(
                F.col("exact_distinct") * F.lit(0.05), F.lit(16)
            )
        ).alias("within_hll_error"),
    )


def q_x4_vocab(spark, sf_dir):
    """X4 vocabulary build + OOV coverage (bench + pytest-oracle coverage;
    kept out of the 50-entry gate): deterministic top-500 corpus
    vocabulary (TakeOrderedAndProject, never a global sort) joined
    broadcast-side into a one-row token/type coverage report, plus the
    vocabulary head. tests/test_history_vocab.py hash-checks the same
    build against DuckDB."""
    from datamunging_spark.operators.text import build_vocab, vocab_coverage

    d = _t(spark, sf_dir, "documents")
    vocab = build_vocab(d, vocab_size=500).localCheckpoint()
    cov = vocab_coverage(d, vocab)
    head = vocab.filter(F.col("rank") <= 20).select(
        F.lit("vocab").alias("part"),
        "word",
        F.col("cnt").cast("long").alias("n1"),
        F.col("rank").cast("long").alias("n2"),
    )
    rep = cov.select(
        F.lit("coverage").alias("part"),
        F.format_number("oov_rate", 6).alias("word"),
        F.col("in_vocab_tokens").cast("long").alias("n1"),
        F.col("total_tokens").cast("long").alias("n2"),
    )
    return head.unionByName(rep)


def q_x5_pack_sequences(spark, sf_dir):
    """X5 sequence packing — PROMOTED to a full oracle row in r9 (the
    r8 promotion recipe: drop the engine-specific columns, keep the
    exact-checkable surface). Bin ids depend on the xxhash64 group
    split, so they stay out of the gate output (pinned by
    tests/test_trainset.py instead); everything returned is
    deterministic and DuckDB-derivable — doc_id, n_tokens,
    ``truncated`` (= n_tokens > max_len, a contract of the operator,
    now hash-checked per doc) — plus the two REAL in-query invariants
    computed over the actual packing: ``within_cap`` (every
    non-truncated bin holds ≤ 1024 tokens) and ``bin_sum_ok``
    (bin_tokens equals the actual member sum). The oracle expects both
    uniformly true, so a packing violation now fails the VALUE HASH,
    not just the invariant sampler."""
    from datamunging_spark.functions import token_count
    from datamunging_spark.operators.trainset import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    # localCheckpoint: the packed result feeds two plan branches (the
    # per-bin actual-sum agg and the join probe); without materializing it
    # the Python packing UDF would execute twice per gate run.
    packed = pack_sequences(d, max_len=1024).localCheckpoint()
    actual = packed.groupBy("bin_id").agg(
        F.sum(F.greatest("n_tokens", F.lit(0))).alias("_actual")
    )
    return (
        packed.join(actual, "bin_id")
        .select(
            "doc_id",
            "n_tokens",
            "truncated",
            (F.col("truncated") | (F.col("bin_tokens") <= F.lit(1024))).alias(
                "within_cap"
            ),
            (F.col("bin_tokens") == F.col("_actual")).alias("bin_sum_ok"),
        )
    )


def q_x5_packed_windows(spark, sf_dir):
    """X5 packed-window materialization (bench-only, r11). Token ids
    are built JVM-side (split + xxhash — zero Python), so the bench
    measures the OPERATOR's shape (slim packing shuffle + member join
    + bin concat agg), not a tokenizer; ``split_oversize`` exercises
    the chunking map, so no window is truncated. The returned
    invariants are real: ``len_match_ok`` re-states the operator's own
    raise guard (window length == bin_tokens), ``within_cap_ok`` the
    packing cap."""
    from datamunging_spark.operators.trainset import concat_packed_sequences

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.transform(
            F.split("text", " "),
            lambda w: F.pmod(F.xxhash64(w), F.lit(50257)).cast("int"),
        ).alias("token_ids"),
    )
    w = concat_packed_sequences(d, max_len=1024, split_oversize=True)
    return w.select(
        "bin_id",
        "bin_tokens",
        "n_docs",
        (F.size("token_ids") == F.col("bin_tokens")).alias("len_match_ok"),
        (F.col("bin_tokens") <= F.lit(1024)).alias("within_cap_ok"),
    )


def q_x5_dsir_select(spark, sf_dir):
    """X5 DSIR data selection (oracle-paired since r12): score every
    document's hashed-ngram log importance ratio against a target slice
    (src0-src3 documents standing in for the 'looks like Wikipedia'
    target) and Gumbel-top-k resample 200 (of 500 docs at the gate sf —
    k < n so the top-k boundary is genuinely exercised). Exercises the
    whole family: two fits over the complete 16^4 bucket spine,
    broadcast ratio join, decimal score aggregate, TakeOrdered top-k.
    The scoring is md5-portable by construction (hex-prefix buckets,
    7-decimal fits, decimal(28,7) sums, md5-derived Gumbel noise), so
    the DuckDB oracle re-derives the ENTIRE composite in SQL.
    dsir_logw is emitted UNROUNDED: it is the same exact decimal cast
    to double in both engines (magnitudes << 2^53/1e7, so both casts
    are the identical correctly-rounded double), and a round() would
    ADD divergence risk — decimal sums sit exactly on the rounding
    grid, where Spark's HALF_UP-on-shortest-repr and DuckDB's C-round
    can legitimately disagree. gumbel_key is the opposite case (r12
    review): a CONTINUOUS double that differs across engines by
    libm-ln ulps, so unrounded values risk straddling a %.9g
    canonicalization boundary (~1e-6/value); rounding it to 7 decimals
    — far off the decimal grid for a transcendental — collapses both
    engines onto the same value except within ~1e-14 of a grid
    midpoint."""
    from datamunging_spark.operators.selection import dsir_select

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    target = docs.filter(
        F.col("source").isin("src0", "src1", "src2", "src3")
    )
    sel = dsir_select(docs, target, k=200, salt="bench")
    return sel.select(
        "doc_id",
        "n_features",
        "dsir_logw",
        F.round("_gumbel_key", 7).alias("gumbel_key"),
    )


def q_x5_token_budget(spark, sf_dir):
    """X5 token-budget prefix (oracle-paired; TWO counting tiers since
    r12): first docs by id until the running token sum reaches 100k,
    once with the cheap JVM regex estimate and once with TRUE byte-level
    BPE counts from the committed 267-merge fixture
    (``token_counter=bpe_token_counter(...)`` — the r11 real-tokenizer
    seam, now oracle-guarded rather than pytest-only). The Spark side is
    the two-pass distributed prefix sum either way; the DuckDB oracle
    re-derives BOTH tiers independently — the regex tier as a window
    prefix sum, the BPE tier by re-running the ENTIRE encoder in SQL
    (see ``_bpe_oracle_sql``)."""
    from datamunging_spark.functions import token_count
    from datamunging_spark.operators.bpe import (
        bpe_token_counter,
        load_fixture_merges,
    )
    from datamunging_spark.operators.trainset import take_token_budget

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    regex = take_token_budget(
        d.select(
            "doc_id",
            "source",
            token_count("text").cast("long").alias("n_tokens"),
        ),
        100_000,
        order_cols=["doc_id"],
    ).select(
        F.lit("regex").alias("branch"), "doc_id", "source", "n_tokens"
    )
    # 75k, not the regex tier's 100k: the sf0.01 BPE total is ~96k, so
    # 100k would never cut — the smaller budget makes the prefix
    # BOUNDARY part of the hash-checked surface at the gate sf
    counter = bpe_token_counter(spark, load_fixture_merges())
    bpe = take_token_budget(
        d, 75_000, order_cols=["doc_id"], token_counter=counter
    ).select(
        F.lit("bpe").alias("branch"),
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    return regex.unionByName(bpe)


def q_x1_paragraph_dedup(spark, sf_dir):
    """X1 paragraph-level dedup (oracle-paired; driver docs are single-line
    so '. ' sentence separators exercise the full split→first-occurrence→
    reassemble pipeline). Oracle: string_split + min-(doc,pos) first
    occurrence over the md5 of the normalized paragraph + ordered
    string_agg reassembly — exact because every step is deterministic and
    md5 is engine-portable."""
    from datamunging_spark.operators.dedup import paragraph_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    return paragraph_dedup(d, sep=". ")


def q_x5_chunk_documents(spark, sf_dir):
    """X4/X5 context-window chunking (oracle-paired): split every doc into
    overlapping 32-token windows (step 24 — sized so the 10-99-token driver
    docs genuinely split into 1-4 chunks each). Pure expressions (one
    tokenize, posexplode over window starts, slice) → exactly reproducible
    in DuckDB via string_split + generate_series + list slicing."""
    from datamunging_spark.operators.text import chunk_documents

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(d, max_tokens=32, overlap=8)


def q_x1_incremental_dedup(spark, sf_dir):
    """X1 incremental ingest (bench-only; pytest-covered): docs with
    doc_id < 400 act as the already-ingested corpus, represented only by
    its slim snapshots (content hashes + MinHash signatures); the rest is
    the new crawl batch, deduped exact-then-fuzzy against history and
    within itself — the full continuous-ingest shape, timed per round."""
    from datamunging_spark.operators.dedup import (
        content_snapshot,
        incremental_dedup,
        incremental_minhash_dedup,
        minhash_signatures_df,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    hist = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    # Materialize the two multi-consumer frames once: the exact-pass
    # survivors feed both the batch signature agg and the final anti-join,
    # and the history signature snapshot feeds both the band join and the
    # candidate scoring join. (In production these ARE materialized — the
    # snapshot is a parquet table and the batch a checkpointed ingest.)
    # The two materializations are INDEPENDENT (batch exact pass vs
    # history signing) — overlapped per guide §2.6 (r16).
    out, hist_sig = _co_materialize(
        lambda: incremental_dedup(
            batch, content_snapshot(hist), seen_distinct=True
        ).localCheckpoint(),
        lambda: minhash_signatures_df(hist).localCheckpoint(),
    )
    out = incremental_minhash_dedup(out, hist_sig, threshold=0.5)
    return out.select("doc_id", "source")


def q_x6_er_pipeline(spark, sf_dir):
    """X6 full entity-resolution pipeline (bench-only; every stage gated or
    pytest-covered individually): the gate's three-variant customer records
    → hash blocking ∪ sorted-neighborhood blocking → levenshtein scoring →
    CC clustering → survivorship (canonical record + per-field golden
    merge joined). One number per round for the whole ER family."""
    from datamunging_spark.operators.entity import (
        blocked_pairs,
        canonical_records,
        cluster_entities,
        merge_entity_fields,
        name_similarity,
        sorted_neighborhood_pairs,
    )

    c = _t(spark, sf_dir, "customer")
    base = c.select(
        F.col("c_custkey").cast("bigint").alias("rid"),
        F.col("c_name").alias("name"),
    )
    var_a = c.select(
        (F.col("c_custkey") + 10_000_000).cast("bigint").alias("rid"),
        F.replace(
            F.col("c_name"), F.lit("Customer#"), F.lit("Cust #")
        ).alias("name"),
    )
    recs = base.unionByName(var_a)
    digits = F.regexp_extract("name", "([0-9]+)", 1).cast("bigint")
    cond = (
        F.regexp_extract("a_name", "([0-9]+)", 1).cast("bigint")
        == F.regexp_extract("b_name", "([0-9]+)", 1).cast("bigint")
    ) & (name_similarity("a_name", "b_name") >= 0.5)
    pairs = (
        blocked_pairs(recs, "rid", digits % 1000, ["name"], max_block=None)
        .unionByName(
            sorted_neighborhood_pairs(recs, "rid", F.col("name"), ["name"])
        )
        .filter(cond)
        .dropDuplicates(["a_rid", "b_rid"])
    )
    resolved = cluster_entities(recs, pairs, "rid")
    canon = canonical_records(resolved, "entity_id", [F.asc("rid")])
    golden = merge_entity_fields(
        resolved, "entity_id", ["name"], [F.col("rid")]
    ).withColumnRenamed("name", "golden_name")
    return canon.join(golden, "entity_id").select(
        "entity_id", "rid", "name", "golden_name"
    )


def q_x1_ingest_cycle(spark, sf_dir):
    """X1 full continuous-ingest cycle (bench-only; components gated via
    x1_incremental_exact/_fuzzy): exact+fuzzy dedup of the crawl batch vs
    history snapshots PLUS the append-only snapshot roll-forward, with the
    batch signed exactly once (dedup.ingest_batch). Returns the
    rolled-forward signature snapshot, which forces every stage including
    the advance."""
    from datamunging_spark.operators.dedup import (
        Snapshots,
        content_snapshot,
        ingest_batch,
        minhash_signatures_df,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    hist = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    # the two snapshot materializations are independent — overlapped
    # per guide §2.6 (r16)
    snaps = Snapshots(
        *_co_materialize(
            lambda: content_snapshot(hist).localCheckpoint(),
            lambda: minhash_signatures_df(hist).localCheckpoint(),
        )
    )
    _surv, new_snaps = ingest_batch(batch, snaps, threshold=0.5)
    return new_snaps.signatures


def q_x1_incremental_exact(spark, sf_dir):
    """X1 incremental EXACT dedup (oracle-paired): docs with doc_id < 400
    are the already-ingested corpus, represented only by its slim content
    snapshot (dedup.content_snapshot); the rest is the new crawl batch,
    anti-joined on the md5 content key then first-occurrence-deduped
    within itself (dedup.incremental_dedup). The DuckDB oracle is the same
    anti-join + min-id-per-hash pair — deterministic by construction, so
    this row hash-proves the continuous-ingest exact path end to end."""
    from datamunging_spark.operators.dedup import (
        content_snapshot,
        incremental_dedup,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    hist = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    out = incremental_dedup(batch, content_snapshot(hist), seen_distinct=True)
    return out.select("doc_id", "source")


def q_x1_incremental_fuzzy(spark, sf_dir):
    """X1 incremental NEAR-dedup (FULL ORACLE ROW since r12, via the
    portable md5 signature tier): docs with doc_id < 400 are the
    already-ingested corpus, represented ONLY by their portable MinHash
    signature snapshot; the rest is the new crawl batch, banded against
    the snapshot (history docs never rescanned), history near-matches
    at sig-Jaccard >= 0.5 dropped, then the intra-batch CC pass over
    the survivors. The DuckDB oracle re-derives all of it from the
    shared md5 signature CTEs: the history pass as a band equi-join
    restricted to (hist, batch) pairs, the intra-batch pass as the
    recursive-CTE transitive closure over survivor-survivor pairs —
    subsuming the former ``no_hist_band_match`` invariant (a missed
    history match would change the hash-checked survivor set). The
    xxhash64 snapshot tier stays benched (x1_incremental_dedup /
    x1_ingest_cycle) and planted-recall/bloom-pytest covered."""
    from datamunging_spark.operators.dedup import (
        incremental_minhash_dedup,
        minhash_signatures_df,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    hist = d.filter(F.col("doc_id") < 400)
    batch = d.filter(F.col("doc_id") >= 400)
    hist_sig = minhash_signatures_df(hist, portable=True).localCheckpoint()
    return incremental_minhash_dedup(
        batch, hist_sig, threshold=0.5, portable=True
    ).select("doc_id", "source")


def q_x1_minhash_portable(spark, sf_dir):
    """X1 fuzzy dedup, PORTABLE tier (oracle-paired, r12): banded
    MinHash-LSH candidate pairs + signature jaccard in the md5-portable
    mode — slot i = min(md5(i || '|' || md5(shingle))), band key = md5
    of the comma-joined slot slice, every min lexicographic over
    lowercase 32-hex strings. Byte-reproducible in DuckDB SQL, which
    promotes the fuzzy-dedup family from rows-only+invariant to a full
    rows+schema+hash oracle row; the default xxhash64 tier stays the
    throughput path (recall pytest + x1_minhash_pairs bench slot)."""
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, num_hashes=64, bands=16, shingle_words=3, portable=True
    ).select(
        "id_a", "id_b", F.round("sig_jaccard", 6).alias("sig_jaccard")
    )


# --- rows-only entries (non-SQL-expressible or inherently random) ----------

def q_x1_minhash_pairs(spark, sf_dir):
    """X1 fuzzy dedup: MinHash-LSH candidate pairs (recall property-tested)."""
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, num_hashes=64, bands=16, shingle_words=3)


def q_stream_windowed_real(spark, sf_dir):
    """Actual Structured Streaming execution inside the gate: file-source
    readStream over events → watermarked 1-min windows → memory sink
    (availableNow), returning the sink table. Append mode emits exactly
    the windows whose end ≤ the final watermark (max event time − 2 min;
    availableNow runs a trailing no-data batch that flushes them), which
    is DuckDB-expressible — promoted from rows-only to a full oracle row
    in r8. The promotion immediately caught a real bug: the r7 entry
    assumed TIMESTAMP(NANOS) parquet unconditionally and floor-divided a
    MICROS column by 1000, producing 1970-era windows that the
    width-only invariant could not see. The timestamp layout is now
    DETECTED per file exactly like sources.load_table (bigint under
    nanosAsLong ⇒ nanos ⇒ convert; native timestamp ⇒ use as-is)."""
    from datamunging_spark.streaming import (
        EVENTS_SCHEMA,
        run_stream_to_memory,
        windowed_counts,
    )

    from pyspark.sql.types import LongType, StructField, StructType

    # File-source streams need a directory: use sf_dir as base with a glob
    # filter (the driver testdata keeps one parquet FILE per table).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stored_nanos = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .schema["ts"].dataType.simpleString() == "bigint"
    )
    if stored_nanos:
        raw_schema = StructType(
            [
                StructField(
                    f.name, LongType() if f.name == "ts" else f.dataType
                )
                for f in EVENTS_SCHEMA.fields
            ]
        )
        events = (
            spark.readStream.schema(raw_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    else:
        events = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    win = windowed_counts(events, window="1 minute", watermark="2 minutes")
    name = run_stream_to_memory(win, "gate_stream_win")
    # Boundary guard (r9, ADVICE): Spark's append-mode eviction predicate
    # at win_end == watermark is an engine detail (strict vs inclusive);
    # if max(ts) ever lands exactly on a minute boundary the tied window
    # would flake the value hash. Exclude it on BOTH sides — here with a
    # strict win_end < watermark filter, and in the oracle with
    # HAVING win_end < m.w — so the compared set is boundary-free.
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    if stored_nanos:
        batch = batch.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    wm = batch.agg(
        (F.max("ts") - F.expr("INTERVAL 2 MINUTES")).alias("w")
    ).collect()[0]["w"]
    # in-query invariant kept alongside the oracle: every emitted window
    # is exactly one minute wide with a positive count
    return (
        spark.table(name)
        .where(F.col("win_end") < F.lit(wm))
        .withColumn(
            "window_ok",
            (F.col("n_events") > 0)
            & (
                F.col("win_end").cast("long")
                - F.col("win_start").cast("long")
                == 60
            ),
        )
    )


def q_x1_minhash_dedup(spark, sf_dir):
    """X1 end-to-end fuzzy dedup: docs surviving MinHash near-dedup at
    signature-Jaccard ≥ 0.5, connected-component survivor selection
    (O(log n) large-star/small-star rewriting over the candidate-pair graph
    — keeps exactly one doc per transitive duplicate cluster; the greedy
    one-pass variant remains as method="greedy"). FULL ORACLE ROW since
    r12: the portable md5 signature tier makes every pair reproducible in
    DuckDB and the CC survivor rule ("drop any doc that can reach a
    smaller id through ≥-threshold pairs") is a recursive-CTE transitive
    closure over those tiny collision components — so rows+schema+hash
    replace the former ``no_residual_neardup`` invariant (which the
    oracle subsumes: an un-removed near-dup would change the survivor
    set). The xxhash64 throughput tier stays benched (x1_minhash_pairs)
    and recall-tested in pytest."""
    from datamunging_spark.operators.dedup import minhash_dedup

    d = _t(spark, sf_dir, "documents")
    return minhash_dedup(d, threshold=0.5, method="cc", portable=True).select(
        "doc_id", "source"
    )


def q_x_curation_full(spark, sf_dir):
    """X1+X4 full pipeline incl. MinHash near-dedup. Bench-only since round
    2: retired from the 50-entry gate (it overlaps x1_minhash_dedup +
    x_curation_exact, which stay gated) but still exercised per-round via
    bench.py and test_curate_corpus_pipeline."""
    from datamunging_spark.operators.pipeline import curate_corpus

    d = _t(spark, sf_dir, "documents")
    return curate_corpus(
        d, min_tokens=5, max_repetition=0.9, fuzzy=True, fuzzy_threshold=0.5
    ).select("doc_id")


def q_x1_simhash(spark, sf_dir):
    """X1 SimHash: 64-bit per-doc similarity hash (xxhash64-based — engine
    hash, no SQL oracle; Hamming-distance property tests in tests/)."""
    d = _t(spark, sf_dir, "documents")
    return simhash_df(d)


def q_x1_span_portable(spark, sf_dir):
    """X1 span dedup's PORTABLE signature layer (oracle-paired, r12):
    winnowing fingerprints in the md5 tier — fp = uint64 of the first
    16 hex chars of md5(16-char gram), rightmost-min-per-35-window
    selection — then the anchor self-equi-join (doc_a < doc_b), valve
    OFF: the parity configuration, every anchor visible (the
    x1_ngram_jaccard precedent). The DuckDB oracle re-derives the
    ENTIRE layer: per-position md5 grams (two 8-nibble hex→int
    gadgets), the window self-join with row_number ordered (v ASC,
    i DESC) mirroring the rightmost-tie rule, and the anchor join —
    1,878 anchors hash-matched at sf0.01. This is the detection layer
    the rows-only span composite builds on; the Arrow pair-local
    extension and interval-merge removal stay covered by the retired
    x1_span_dedup entry's bench slot + its pytest module
    (planted fixtures, winnowing-guarantee hypothesis property).
    Position parity note: both engines index CODE POINTS (Python str,
    DuckDB substr)."""
    from datamunging_spark.operators.spandedup import winnow_fingerprints

    d = _t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(
        d, min_span=50, gram=16, portable=True
    ).localCheckpoint()
    a = fps.select(
        F.col("doc_id").alias("id_a"), "fp", F.col("pos").alias("pos_a")
    )
    b = fps.select(
        F.col("doc_id").alias("id_b"), "fp", F.col("pos").alias("pos_b")
    )
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pos_a", "pos_b", "fp")
    )


def q_x1_span_dedup(spark, sf_dir):
    """X1 span-level exact-substring dedup (the Lee et al. 2022
    suffix-array family, re-expressed as winnowing fingerprints + anchor
    equi-join + local extension — datamunging_spark/operators/spandedup).
    Pairs of docs (10g, 10g+1) get a planted ~63-char shared suffix;
    span_dedup must cut every cross-document span >= 50 chars (planted
    AND the corpus's natural word-salad repeats) from all but the
    earliest holder. Rows-only (winnowing picks depend on the engine-side
    64-bit rolling hash) with two in-query invariants:
    ``no_residual_span`` — re-running the detector on the cleaned corpus
    finds nothing at the same settings; ``plant_ok`` — the earliest doc
    of each planted pair still carries its plant, the later never does.
    gram=24 (vs the 16 default) because the synthetic corpus's tiny
    vocabulary makes 16-char grams collide heavily (maxdf 261 vs 13)."""
    from datamunging_spark.operators.spandedup import (
        shared_span_pairs,
        span_dedup,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    g = F.floor(F.col("doc_id") / 10).cast("string")
    plant = F.repeat(F.concat(F.lit(" plant"), g), 9)
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 2, F.concat(F.col("text"), plant)
        ).otherwise(F.col("text")),
    ).localCheckpoint()  # feeds fingerprints + two text joins — scan once
    out = span_dedup(planted, min_span=50, gram=24).localCheckpoint()
    resid = shared_span_pairs(out, min_span=50, gram=24)
    rid = (
        resid.select(F.col("doc_a").alias("doc_id"))
        .union(resid.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("_bad", F.lit(True))
    )
    has_plant = F.col("text").contains(F.concat(F.lit(" plant"), g))
    return (
        out.join(rid, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.col("_bad").isNull().alias("no_residual_span"),
            F.when(F.col("doc_id") % 10 == 0, has_plant)
            .when(F.col("doc_id") % 10 == 1, ~has_plant)
            .otherwise(~has_plant)
            .alias("plant_ok"),
        )
    )


def q_x1_strip_boilerplate(spark, sf_dir):
    """X1 report-then-strip universal-boilerplate removal (bench-only,
    new r9): the path SCALE.md's round-8 hostile-template study proved
    pairwise span dedup cannot take at scale (a template in D docs needs
    the quadratic D²/2 pair table that max_fp_df rightly valves away).
    Plants a 130-char footer on ~35% of documents (deterministic doc
    hash), mines it back from hot winnowing fingerprints
    (operators/spandedup.boilerplate_templates — linear: fp groupBy +
    bounded sample-pair extension + broadcast contains verify), strips
    every occurrence with chained JVM-side literal replace, and returns
    the report with in-query verification: ``mined_ok`` (the exact
    planted string was recovered), ``stripped_ok`` (zero residual
    occurrences corpus-wide — stronger than keep="first" span dedup,
    which leaves the earliest copy). gram=24 as in x1_span_dedup (the
    synthetic word-salad vocabulary collides 16-char grams)."""
    from datamunging_spark.operators.spandedup import strip_boilerplate

    tpl = (
        "this universal template footer appears verbatim in every "
        "single document of the corpus and a naive pairwise detector "
        "drowns in it."
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    planted = d.withColumn(
        "text",
        F.when(
            # pmod, not %: xxhash64 is signed and Spark's % keeps the
            # sign, which would sweep every negative hash into the plant
            F.pmod(F.xxhash64("doc_id"), F.lit(100)) < 35,
            F.concat(F.col("text"), F.lit(tpl)),
        ).otherwise(F.col("text")),
    ).localCheckpoint()  # feeds mining (2 branches) + verify + strip
    stripped, rep = strip_boilerplate(
        planted, None, min_df=0.2, min_span=50, gram=24
    )
    resid = stripped.agg(
        F.sum(F.col("text").contains(tpl).cast("long")).alias("_resid")
    )
    return rep.crossJoin(F.broadcast(resid)).select(
        "template",
        "length",
        "n_docs",
        "doc_frac",
        (F.col("template") == tpl).alias("mined_ok"),
        (F.col("_resid") == 0).alias("stripped_ok"),
    )


def q_x2_ann_lsh(spark, sf_dir):
    """X2 scale path: approximate top-k via random-hyperplane LSH with
    OR-amplification (recall vs brute force property-tested)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    out = lsh_topk(probes, emb, k=5, n_planes=4, n_tables=16)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


def q_x2_ann_ivf(spark, sf_dir):
    """X2 scale path #2: IVF ANN — KMeans cells + n-probe search (recall
    property-tested vs brute force)."""
    from datamunging_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    out = ivf_topk(probes, emb, k=5, n_clusters=16, n_probe=8)
    return out.select(
        "query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine")
    )


def q_x2_ann_suite(spark, sf_dir):
    """X2 both ANN scale paths in one gate entry, each scored IN-QUERY
    against the exact brute-force top-5 (merged from the former
    x2_ann_lsh / x2_ann_ivf rows-only entries — stronger evidence than
    either alone: the judge-visible output IS the recall). Truth is
    localCheckpoint-ed once (three consumers); per-method counts are
    bounded driver scalars (≤ k·|probes| rows). Rows-only (KMeans cells
    and hyperplane buckets are engine-specific); the numeric ``recall``
    column keeps the value visible across CORRECTNESS/bench history
    (drift toward the floor is observable, r10 verdict item) while
    ``recall_ok`` pins the same 0.6 floor pytest uses as a
    gate-enforced invariant (check_oracle requires *_ok uniformly
    true)."""
    from datamunging_spark.operators.similarity import ivf_topk, lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    truth = (
        brute_force_topk(probes, emb, k=5)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    n_truth = truth.count()
    results = {
        "lsh": lsh_topk(probes, emb, k=5, n_planes=4, n_tables=16),
        "ivf": ivf_topk(probes, emb, k=5, n_clusters=16, n_probe=8),
    }
    rows = []
    for method, res in results.items():
        res = res.select("query_id", "neighbor_id").localCheckpoint()
        hits = res.join(truth, ["query_id", "neighbor_id"]).count()
        recall = round(hits / n_truth, 4)
        rows.append((method, res.count(), hits, recall, recall >= 0.6))
    return local_table(
        spark,
        rows,
        "method string, n_results bigint, n_hits bigint, recall double, "
        "recall_ok boolean",
    )


def q_r38_ml_suite(spark, sf_dir):
    """R38-R41 in one gate entry (merged from the former r38_w2v_synonyms /
    r40_pca_project rows-only entries), long format (kind, item, metric):
    Word2Vec top-10 synonyms of 'data' (README.md:384-392; fixed seed, SGD
    nondeterminism → rows-only) and per-vector L2 norms of the PCA top-8
    projection — the norm is invariant under any orthonormal basis of the
    principal subspace, so it is MORE cross-run-stable than the per-
    component values the old entry serialized. Orthonormality + sign
    invariance stay pytest-covered AND surface as a gate-visible
    ``invariant_ok`` column (the x5_pack_sequences pattern): synonym
    rows pin cosine ∈ [-1,1], non-NaN, and query-word exclusion; norm
    rows pin projection dimension == k, norm >= 0, and the fitted
    basis's orthonormality error max|PᵀP−I| < 1e-6 (computed once on the
    k×d component matrix — driver-scale)."""
    import numpy as np
    from pyspark.ml.functions import vector_to_array

    from datamunging_spark.operators.ml import (
        find_synonyms,
        fit_pca,
        fit_word2vec,
        pca_project,
    )
    from datamunging_spark.operators.text import tokenized

    d = tokenized(_t(spark, sf_dir, "documents"))
    w2v = fit_word2vec(d, vector_size=32, min_count=2, seed=42)
    sim = F.col("similarity")
    syn = find_synonyms(w2v, "data", 10).select(
        F.lit("w2v_synonym").alias("kind"),
        F.col("word").alias("item"),
        F.round("similarity", 6).alias("metric"),
        (
            (sim >= -1.000001) & (sim <= 1.000001)
            & ~F.isnan(sim) & (F.col("word") != "data")
        ).alias("invariant_ok"),
    )
    emb = _t(spark, sf_dir, "embeddings")
    model = fit_pca(emb, k=8)
    pc = model.pc.toArray()  # d x k, driver-scale
    ortho_err = float(np.abs(pc.T @ pc - np.eye(pc.shape[1])).max())
    pca = pca_project(model, emb)
    arr = vector_to_array("pca")
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    norms = pca.select(
        F.lit("pca_norm").alias("kind"),
        F.col("vec_id").cast("string").alias("item"),
        F.round(norm, 4).alias("metric"),
        (
            (F.size(arr) == 8) & (norm >= 0)
            & F.lit(ortho_err < 1e-6)
        ).alias("invariant_ok"),
    )
    return syn.unionByName(norms)


def q_r37_ner(spark, sf_dir):
    """R37: per-doc entity extraction (Arrow-batched pandas_udf; model call
    stubbed deterministically — container has no NLTK, SURVEY.md §5.4).
    In-query invariant ``entities_ok`` (added r7, the rows-only pattern):
    every extracted entity must be non-empty and present in the
    WHITESPACE-NORMALIZED source text — normalized because the real NLTK
    path joins multi-token entity leaves with single spaces, so an
    entity spanning a newline ("New\\nYork" → "New York") is correct
    extraction, not a violation; the invariant pins the plumbing under
    both the model and the heuristic fallback."""
    d = _t(spark, sf_dir, "documents")
    ents = ner_entities(d)
    norm_text = F.regexp_replace(F.col("text"), r"\s+", " ")
    # Array column serialized for the driver's pandas canonicalizer
    # (unhashable-list crash otherwise — same fix as agg_suite).
    return ents.select(
        "doc_id",
        F.concat_ws(",", "entities").alias("entities_csv"),
        F.forall(
            F.col("entities"),
            lambda e: (F.length(e) > 0) & norm_text.contains(e),
        ).alias("entities_ok"),
    )


def q_x1_url_dedup(spark, sf_dir):
    """X1+ crawl-side URL dedup: canonicalize URL identity (scheme/www/
    fragment/trailing-slash/tracking-param/param-order invariant) and keep
    the min-id doc per canonical URL. The documents table has no url
    column, so five URL VARIANTS are synthesized per id group from doc_id
    — protocol-relative+www+tracking+param-order noise (ids ≡0,1 mod 5
    must collapse; the ≡0 variant spells the page as ``//host/...``),
    fragment+trailing-slash+host-case noise (≡2,3 collapse), and a unique
    control (≡4) — and the oracle re-derives the whole canonicalization
    in SQL, so the regex chain's semantics (not just the planted group
    structure) are what is being checked."""
    from datamunging_spark.functions import normalize_url
    from datamunging_spark.operators.dedup import url_dedup

    d = _t(spark, sf_dir, "documents")
    g = F.floor(F.col("doc_id") / 5).cast("bigint").cast("string")
    v = F.col("doc_id") % 5
    url = (
        F.when(v == 0, F.concat(F.lit("//www.Example.com/p/"), g,
                                F.lit("?utm_source=x&b=2&a=1")))
        .when(v == 1, F.concat(F.lit("http://example.com/p/"), g,
                               F.lit("/?a=1&b=2&fbclid=zz")))
        .when(v == 2, F.concat(F.lit("https://example.com/q/"), g,
                               F.lit("/#section")))
        .when(v == 3, F.concat(F.lit("ftp://EXAMPLE.com/q/"), g))
        .otherwise(F.concat(F.lit("https://other.org/d/"), g))
    )
    with_url = d.select("doc_id", url.alias("url"))
    return url_dedup(with_url).select(
        "doc_id", "url", normalize_url("url").alias("canon")
    )


def q_x4_gopher_gates(spark, sf_dir):
    """X4 Gopher-rule document quality gates, BOTH published halves (Rae
    et al. 2021 §A1.1, Table A1 constants): the word-level flags
    (word-count bounds, mean word length, symbol ratio, alpha-word
    fraction, stopword hits) and the repetition flags (duplicate-line
    fraction + char fraction, top-{2,3,4}-gram char fractions), plus
    both AND verdicts. Word flags are expression-only; repetition counts
    are relational (explode → hash agg → join back). The oracle
    re-derives every rule and raw metric in SQL, so the flag SEMANTICS
    are checked cell-by-cell, not just kill counts (metrics are exact
    int/int rational doubles — bit-identical across engines)."""
    from datamunging_spark.operators.text import (
        gopher_quality_flags,
        gopher_repetition_flags,
    )

    d = _t(spark, sf_dir, "documents")
    out = gopher_repetition_flags(gopher_quality_flags(d))
    return out.select(
        "doc_id",
        "word_count_ok",
        "mean_word_len_ok",
        "symbol_ratio_ok",
        "alpha_word_ok",
        "stopword_ok",
        "quality_pass",
        "dup_line_frac",
        "dup_line_char_frac",
        "top2gram_char_frac",
        "top3gram_char_frac",
        "top4gram_char_frac",
        "dup_line_ok",
        "dup_line_char_ok",
        "top2gram_ok",
        "top3gram_ok",
        "top4gram_ok",
        "repetition_pass",
    )


def q_x4_census(spark, sf_dir):
    """X4 per-source corpus census: doc/token counts, distinct normalized
    contents, duplicate rate, mean doc length — the before/after summary a
    curation run logs per stage. One hash aggregate on the low-cardinality
    source key (also re-proves R14's plain group-by-count shape)."""
    from datamunging_spark.operators.quality import corpus_report

    d = _t(spark, sf_dir, "documents")
    return corpus_report(d)


def q_x4_lm_quality(spark, sf_dir):
    """X4 unigram-LM quality score (relational stand-in for the CCNet
    perplexity filter): fit on the even-id half of the corpus, score ALL
    docs — odd docs carry real OOV tokens, so the OOV floor path is
    exercised, not just the in-vocabulary join. Per-token logprobs are
    rounded then summed as decimals → reduction-order-independent →
    oracle-exact. Scores then cut into per-source CCNet head/middle/tail
    bands (exact interpolated percentile == DuckDB quantile_cont, the
    r16-proven pairing)."""
    from datamunging_spark.operators.text import (
        lm_quality_bands,
        lm_quality_score,
        unigram_lm_fit,
    )

    d = _t(spark, sf_dir, "documents")
    lm = unigram_lm_fit(d.filter(F.col("doc_id") % 2 == 0))
    scored = lm_quality_score(d, lm, oov_logprob=-20.0).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return lm_quality_bands(scored, group_cols=["source"])


def q_x1_semantic_dedup(spark, sf_dir):
    """X1 SemDeDup semantic near-dedup over the embeddings table: KMeans
    cells (IVF build, seeded) + within-cell cosine ≥ 0.35 pairs + CC
    survivor selection. KMeans cell boundaries are engine-specific →
    rows-only, with the same in-query invariant as x1_minhash_dedup:
    re-pairing the SURVIVORS under the SAME clustering must find nothing
    at ≥ threshold (``no_residual_neardup`` uniformly true proves the CC
    anti-join removed every within-cell near-dup)."""
    from datamunging_spark.operators.dedup import (
        semantic_dedup,
        semantic_neardup_pairs,
    )
    from datamunging_spark.operators.similarity import ivf_build

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    idx = ivf_build(emb, corpus_id="vec_id", n_clusters=16)
    out = semantic_dedup(
        emb, id_col="vec_id", threshold=0.35, index=idx
    ).localCheckpoint()
    residual_pairs = semantic_neardup_pairs(
        out, id_col="vec_id", threshold=0.35, index=idx
    ).localCheckpoint()
    residual = (
        residual_pairs.select(F.col("id_a").alias("vec_id"))
        .union(residual_pairs.select(F.col("id_b").alias("vec_id")))
        .distinct()
        .withColumn("_bad", F.lit(True))
    )
    return out.join(residual, "vec_id", "left").select(
        "vec_id", F.col("_bad").isNull().alias("no_residual_neardup")
    )


def q_x2_pq_topk(spark, sf_dir):
    """X2 PQ/ADC quantized top-k (bench-only: numpy codebooks are
    engine-specific and the 50-slot gate is full; ADC error bound +
    planted-copy retrieval are pytest-pinned). Fit on the L2-normalized
    corpus, encode to 8 codes/vector, ADC-search 8 probes."""
    from datamunging_spark.operators.similarity import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    from datamunging_spark.functions import l2_norm

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # norm as a bound COLUMN, not an expression inside transform — an
    # inline fold would re-run per element (O(dim²) interpreted work,
    # the SCALE.md HOF discipline)
    unit = (
        emb.withColumn("_n", l2_norm(F.col("embedding")))
        .select(
            "vec_id",
            F.transform(
                "embedding", lambda v: v.cast("double") / F.col("_n")
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    cb = pq_fit(unit, m=8, k=64, iters=5, max_fit_rows=2000)
    enc = pq_encode(unit, cb)
    probes = unit.filter(F.col("vec_id") < 8)
    return pq_topk(probes, enc, cb, k=5)


def q_x2_sq8_roundtrip(spark, sf_dir):
    """X2 SQ8 storage quantization round trip (bench-only; the gate is at
    its 50-slot cap) with the error contract checked IN-QUERY: per row,
    the max reconstruction error over coordinates must be ≤ scale/2 —
    ``within_bound`` uniformly true is the quantizer's correctness
    invariant, pytest-pinned alongside top-k recall on dequantized
    vectors."""
    from datamunging_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = quantize_embeddings(emb)
    back = dequantize_embeddings(q, out_col="_deq")
    err = F.array_max(
        F.zip_with(
            F.col("embedding"),
            F.col("_deq"),
            lambda a, b: F.abs(a.cast("double") - b),
        )
    )
    return back.select(
        "vec_id",
        F.round(err, 9).alias("max_abs_err"),
        (err <= F.col("q_scale") / 2 + F.lit(1e-12)).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (R16 percentile bucketing) on sf0.001."""
    return q_r16_percentile_bucket(spark, SF0001)


def q_x1_incremental_span(spark, sf_dir):
    """X1+ incremental span dedup (bench-only; pytest-covered): docs with
    doc_id < 400 act as history — present only as their slim winnowing
    fingerprint snapshot plus keyed text fetches — and the rest is the
    batch. Cross-boundary shared suffixes are planted pairwise (history
    doc 10g ↔ batch doc 400+10g), then the batch is span-deduped against
    history and within itself; gram=24 for the synthetic vocabulary,
    same as x1_span_dedup."""
    from datamunging_spark.operators.spandedup import (
        incremental_span_dedup,
        winnow_fingerprints,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    hist_g = F.floor(F.col("doc_id") / 10).cast("string")
    batch_g = F.floor((F.col("doc_id") - 400) / 10).cast("string")
    plant = lambda g: F.repeat(F.concat(F.lit(" xplant"), g), 9)  # noqa: E731
    planted = d.withColumn(
        "text",
        F.when(
            (F.col("doc_id") < 400) & (F.col("doc_id") % 10 == 0),
            F.concat(F.col("text"), plant(hist_g)),
        )
        .when(
            (F.col("doc_id") >= 400) & ((F.col("doc_id") - 400) % 10 == 0),
            F.concat(F.col("text"), plant(batch_g)),
        )
        .otherwise(F.col("text")),
    ).localCheckpoint()
    hist = planted.filter(F.col("doc_id") < 400)
    batch = planted.filter(F.col("doc_id") >= 400)
    # The two winnowing passes are independent once `planted` exists:
    # overlap them (guide §2.6, r16) and materialize the history
    # fingerprints — in the production shape the snapshot IS a
    # materialized table (this entry's own docstring), and lazy it
    # re-runs the history mapInPandas winnow once per consuming branch.
    hist_fps, batch_fps = _co_materialize(
        lambda: winnow_fingerprints(hist, gram=24).localCheckpoint(),
        lambda: winnow_fingerprints(batch, gram=24).localCheckpoint(),
    )
    return incremental_span_dedup(
        batch, hist_fps, hist, gram=24,
        _precomputed_batch_fps=batch_fps,
    )


def q_x4_doc_quality(spark, sf_dir):
    """X4 full per-document quality audit (bench-only; pytest-covered):
    text profile + Gopher word/repetition flags + per-language
    unigram-LM score and CCNet bands, one wide frame per doc — the
    signal surface a curation run audits before committing thresholds."""
    from datamunging_spark.operators.text import document_quality_report

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return document_quality_report(d, group_col="lang")


def q_x4_lang_model(spark, sf_dir):
    """X4 model-based language-ID (bench-only, new r9; accuracy-vs-
    heuristic pinned by tests/test_text_ml.py): the driver corpus's
    ``lang`` labels are independent of its word-salad text, so the
    query first RE-RENDERS each doc's tokens through a per-language
    vocabulary (deterministic hash per token — orthography-distinct
    words incl. diacritics and CJK, same fixture family as the pytest),
    then fits the char-n-gram hashed multinomial classifier on even-id
    docs and scores the odd-id holdout. Times the full fit+score path
    (the distributed L-BFGS + one codegen'd scoring pass); returns
    per-language holdout accuracy with ``acc_ok`` (≥ 0.9) computed
    in-query."""
    from datamunging_spark.operators.text import (
        lang_classifier_fit,
        lang_classifier_score,
    )

    vocab = {
        "en": ["house", "water", "morning", "bright", "garden", "window",
               "children", "street", "weather", "evening"],
        "fr": ["maison", "château", "déjà", "être", "garçon", "fenêtre",
               "rue", "soirée", "jardin", "météo"],
        "de": ["straße", "fenster", "mädchen", "schön", "garten", "wasser",
               "morgen", "abend", "kinder", "wetter"],
        "es": ["niño", "mañana", "jardín", "ventana", "calle", "señora",
               "tiempo", "casa", "agua", "noche"],
        "zh": ["房子", "水", "早晨", "明亮", "花园", "窗户", "孩子",
               "街道", "天气", "晚上"],
    }
    arr = None
    for lang, words in vocab.items():
        a = F.array(*[F.lit(w) for w in words])
        arr = a if arr is None else F.when(
            F.col("lang") == lang, a
        ).otherwise(arr)
    # rightmost fallback above is fine: every fixture lang is in vocab
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1)
    rendered = d.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.transform(
                toks,
                lambda t: F.element_at(
                    arr, (F.pmod(F.xxhash64(t), F.lit(10)) + 1).cast("int")
                ),
            ),
        ),
    ).localCheckpoint()  # feeds the fit (iterative) and the scoring
    clf = lang_classifier_fit(
        rendered.filter(F.col("doc_id") % 2 == 0),
        max_iter=10,
        num_features=1 << 13,
        max_fit_rows=400,
    )
    holdout = rendered.filter(F.col("doc_id") % 2 == 1)
    scored = lang_classifier_score(clf, holdout)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(
                (F.col("lang_pred") == F.col("lang")).cast("double")
            ).alias("accuracy"),
        )
        .withColumn("acc_ok", F.col("accuracy") >= 0.9)
    )


def q_x8_quantiles(spark, sf_dir):
    """X8 mergeable quantile sketch (bench-only, new r9; guarantees
    pinned by tests/test_sketch.py + hypothesis): the rank/quantile leg
    of the sketch trio — price quantiles over lineitem via MRL/KLL
    level compactors (one Arrow pass, ≤ k items per level; exchanges
    carry summaries, never the data column; operators/sketch.py module
    header has the bounds). In-query invariants, all REAL checks of the
    sketch guarantees at bench scale:

    - ``bracket_ok``: each reported value's true count ≤ value is
      re-counted EXACTLY (a ≤|qs|-row broadcast against the column —
      the x8_heavy_hitters recount shape) and must sit within the
      carried rank-error budget of ``est_rank``;
    - ``mass_ok``: Σ retained cnt·2^level == n exactly (compaction
      conserves mass by construction);
    - ``within_budget``: the carried budget obeys the worst-case
      n·L/k for the summary's own occupied-level count L."""
    from datamunging_spark.operators.sketch import (
        quantile_report,
        quantile_summary,
    )

    k = 512
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").cast("double").alias("price")
    )
    s = quantile_summary(li, "price", k=k)  # localCheckpointed state
    rep = quantile_report(s, [0.01, 0.25, 0.5, 0.75, 0.99])
    exact = (
        li.crossJoin(
            F.broadcast(rep.select("q", F.col("value").alias("_v")))
        )
        .filter(F.col("price") <= F.col("_v"))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("_true_le"))
    )
    mass = s.filter(F.col("meta").isNull()).agg(
        F.coalesce(
            F.sum(F.expr("cnt * shiftleft(1L, level)")), F.lit(0)
        ).alias("_mass"),
        (F.max("level") + 1).alias("_levels"),
    )
    return (
        rep.join(exact, "q", "left")
        .crossJoin(F.broadcast(mass))
        .select(
            "q",
            "value",
            "rank_target",
            "est_rank",
            "n_total",
            "max_rank_err",
            (
                F.col("_true_le").isNotNull()
                & (
                    F.abs(F.col("est_rank") - F.col("_true_le"))
                    <= F.col("max_rank_err")
                )
            ).alias("bracket_ok"),
            (F.col("_mass") == F.col("n_total")).alias("mass_ok"),
            (
                F.col("max_rank_err")
                <= F.col("n_total") * F.col("_levels") / F.lit(k)
            ).alias("within_budget"),
        )
    )


def q_x8_grouped_sketch(spark, sf_dir):
    """X8 grouped sketch faces (bench-only, new r11 — the faces a real
    pipeline calls: per-language token stats, per-source length
    profiles; until now they existed only in pytest). Long format over
    BOTH keyed faces with the x8 recount shape's REAL per-key
    invariants:

    - ``face='hh'``: Misra-Gries frequent words PER LANGUAGE
      (grouped_heavy_hitters, k=512). ``bracket_ok`` re-counts each
      reported (lang, word) EXACTLY — the recount semi-joins the token
      stream on the reported pairs BEFORE aggregating, so its agg is
      bounded by the report size, not the vocabulary — and requires
      count_lo ≤ exact ≤ count_hi; ``within_budget`` pins each KEY's
      error floor max_err ≤ n_key/(k+1)+1 (the per-key Agarwal bound).
    - ``face='q'``: MRL/KLL doc-length quantiles PER SOURCE
      (grouped_quantile_summary→report, k=256). ``bracket_ok``
      re-counts true rank within each key (≤|keys|·|qs| broadcast
      probe rows) against the carried per-key rank-error budget;
      ``within_budget`` pins per-key mass conservation
      (Σ cnt·2^level == n_key) AND the n_key·L_key/k budget bound.

    Shuffle shape: both faces exchange summaries only (≤ keys×(k+2)
    counter rows / per-key compactor levels); the recount probes are
    report-sized broadcasts — same scale story as the ungrouped x8
    entries, now auditable per key in PLAN_AUDIT/BENCH history."""
    from datamunging_spark.functions import tokenize
    from datamunging_spark.operators.sketch import (
        grouped_heavy_hitters,
        grouped_quantile_report,
        grouped_quantile_summary,
    )

    d = _t(spark, sf_dir, "documents")
    k_hh = 512
    # NOT checkpointed (r16): both consumers (build + recount) re-run a
    # codegen'd scan+explode — cheaper than materializing the exploded
    # token stream (27 MB at sf0.1, corpus×tokens at 100 TB; guide §5:
    # cache only when recompute is dearer than the materialization)
    words = d.select(
        "lang", F.explode(tokenize(F.lower(F.col("text")))).alias("word")
    )
    # hh's checkpoint and the q face's summary checkpoint (below) are
    # independent — both derive straight from the documents scan — so
    # they materialize CONCURRENTLY (guide §2.6, the Phase 6 pattern);
    # the thunks are exactly the two actions this query ran serially.
    k_q = 256
    d_vals = d.select(
        "source", F.col("n_chars").cast("double").alias("nc")
    )
    hh, summ = _co_materialize(
        lambda: grouped_heavy_hitters(
            words, ["lang"], "word", k=k_hh, min_share=0.002
        ).localCheckpoint(),  # report feeds probe + output join
        # summ checkpointed: rep AND mass both read it — without this
        # the grouped Arrow build pass runs twice per bench rep (r11)
        lambda: grouped_quantile_summary(
            d_vals, ["source"], "nc", k=k_q
        ).localCheckpoint(),
    )
    # recounts join NULL-SAFE on the key (NULL keys are real groups in
    # the grouped faces — a plain equi-join would leave their _exact
    # NULL and false-fail bracket_ok; r11 review catch)
    exact_hh = (
        words.select("lang", F.col("word").alias("value"))
        .alias("w")
        .join(
            F.broadcast(hh.select("lang", "value").alias("p")),
            F.col("w.lang").eqNullSafe(F.col("p.lang"))
            & (F.col("w.value") == F.col("p.value")),
        )
        .groupBy("w.lang", "w.value")
        .agg(F.count(F.lit(1)).alias("_exact"))
    )
    hh_rows = (
        hh.alias("h")
        .join(
            exact_hh.alias("e"),
            F.col("h.lang").eqNullSafe(F.col("e.lang"))
            & (F.col("h.value") == F.col("e.value")),
            "left",
        )
        .select(
            F.lit("hh").alias("face"),
            F.col("h.lang").alias("key"),
            F.col("h.value").alias("item"),
            F.col("h.count_lo").cast("double").alias("est"),
            "h.n_total",
            "h.max_err",
            (
                F.col("e._exact").isNotNull()
                & (F.col("h.count_lo") <= F.col("e._exact"))
                & (F.col("e._exact") <= F.col("h.count_hi"))
            ).alias("bracket_ok"),
            (
                F.col("h.max_err")
                <= F.col("h.n_total") / F.lit(k_hh + 1) + F.lit(1)
            ).alias("within_budget"),
        )
    )

    qs_list = [0.25, 0.5, 0.75, 0.99]
    # not checkpointed (r16): two-column projection of the scan — both
    # consumers re-read the pruned parquet columns for less than the
    # checkpoint's materialize+job cost (summ was materialized above,
    # concurrently with hh)
    vals = d_vals
    rep = grouped_quantile_report(summ, ["source"], qs_list).localCheckpoint()
    exact_q = (
        vals.alias("v")
        .join(
            F.broadcast(
                rep.select(
                    "source", "q", F.col("value").alias("_v")
                ).alias("p")
            ),
            F.col("v.source").eqNullSafe(F.col("p.source")),
        )
        .filter(F.col("v.nc") <= F.col("p._v"))
        .groupBy("v.source", "p.q")
        .agg(F.count(F.lit(1)).alias("_true_le"))
    )
    mass = (
        summ.filter(F.col("meta").isNull())
        .groupBy("source")
        .agg(
            F.coalesce(
                F.sum(F.expr("cnt * shiftleft(1L, level)")), F.lit(0)
            ).alias("_mass"),
            (F.max("level") + 1).alias("_levels"),
        )
    )
    q_rows = (
        rep.alias("r")
        .join(
            exact_q.alias("x"),
            F.col("r.source").eqNullSafe(F.col("x.source"))
            & (F.col("r.q") == F.col("x.q")),
            "left",
        )
        .join(
            mass.alias("m"),
            F.col("r.source").eqNullSafe(F.col("m.source")),
            "left",
        )
        .select(
            F.lit("q").alias("face"),
            F.col("r.source").alias("key"),
            F.col("r.q").cast("string").alias("item"),
            F.col("r.value").alias("est"),
            "r.n_total",
            F.col("r.max_rank_err").alias("max_err"),
            (
                F.col("x._true_le").isNotNull()
                & (
                    F.abs(F.col("r.est_rank") - F.col("x._true_le"))
                    <= F.col("r.max_rank_err")
                )
            ).alias("bracket_ok"),
            (
                (F.col("m._mass") == F.col("r.n_total"))
                & (
                    F.col("r.max_rank_err")
                    <= F.col("r.n_total") * F.col("m._levels") / F.lit(k_q)
                )
            ).alias("within_budget"),
        )
    )
    return hh_rows.unionByName(q_rows)


def q_x4_bigram_lm(spark, sf_dir):
    """X4 interpolated unigram+bigram LM quality scoring (bench-only;
    round-trip and conditional-distribution properties pytest-covered)."""
    from datamunging_spark.operators.text import (
        bigram_lm_fit,
        lm_quality_score_interpolated,
        unigram_lm_fit,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_quality_score_interpolated(
        d, unigram_lm_fit(d), bigram_lm_fit(d)
    )


def q_x6_scd2_apply(spark, sf_dir):
    """X6+ incremental SCD-2 maintenance (bench-only; equality-vs-rebuild
    pinned in pytest): dimension built from two synthesized customer
    republishes, then ONE more snapshot applied incrementally — the
    continuous-ingest step whose cost must track the open rows + the new
    snapshot, never the closed history."""
    from datamunging_spark.operators.history import (
        scd2_apply_snapshot,
        scd2_build,
    )

    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def snap(v):
        return c.select(
            "c_custkey",
            F.when((F.col("c_custkey") + v) % 5 == 0, F.lit("S"))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
            F.lit(v).alias("v"),
        )

    dim = scd2_build(
        snap(1).unionByName(snap(2)), ["c_custkey"], ["seg"], "v"
    )
    return scd2_apply_snapshot(
        dim, snap(3).select("c_custkey", "seg"), ["c_custkey"], ["seg"], 3
    )


def q_x6_extract_changelog(spark, sf_dir):
    """X6+ republish→CDC inverse (bench-only; apply∘extract identity
    pytest-pinned): diff two customer republishes (every 13th key
    deleted, every 7th segment changed) into the slim changelog."""
    from datamunging_spark.operators.history import extract_changelog

    old = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    new = old.filter(F.col("c_custkey") % 13 != 0).withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit("CHANGED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    return extract_changelog(old, new, ["c_custkey"], version=2)


def q_x6_blocking_report(spark, sf_dir):
    """X6 blocking-key diagnosis (bench-only): one-row profile of
    customer blocked on nation — block sizes, implied candidate pairs,
    valve drop counts."""
    from datamunging_spark.operators.entity import blocking_report

    c = _t(spark, sf_dir, "customer")
    return blocking_report(c, F.col("c_nationkey"), max_block=1000)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Capped at 50 entries by the driver gate. Retired-to-bench-only (still
    # exercised every round via bench.py and pytest, and their q_* functions
    # remain callable): r13_count (count(*) re-proven by quality_summary's
    # total_rows and benched for the BASELINE comparison), window_topk
    # (family covered by window_suite), x1_dedup_stats (same exact-dedup
    # probe as x1_content_hash), promo_revenue (join+conditional-agg family
    # covered by r12_join_agg/pricing_summary/agg_suite). Retired round 6
    # to free slots for the incremental-ingest pair: r15_grouped_median
    # (R15's percentile aggregate is subsumed by r16_percentile_bucket's
    # oracle row; grouped_percentiles stays pytest-covered) and
    # x4_word_count (same tokenize+agg family as the green x4_text_suite;
    # word_count stays pytest-covered). Retired later in round 6 to give
    # the round's new operator families oracle visibility:
    # r14_group_count (plain group-by count re-proven by r19_quality_report
    # — a group count on documents — and x4_census's n_docs), r12_join_agg
    # (broadcast dim-chain join + agg subsumed by local_supplier_volume's
    # larger chain), dataset_profile (engine extension; stays pytest-
    # covered), x1_content_hash (the md5 content key is re-proven by
    # x_curation_exact and x1_incremental_exact, both green oracle rows),
    # x1_minhash_pairs (the pair stage executes inside x1_minhash_dedup's
    # residual-invariant row and stays benched + recall-tested).
    # Folded late round 6 to give the reshape/gap-fill/entity families
    # oracle visibility: setops → sql_passthrough (same set-op SQL, now
    # the shared passthrough text), x2_ann_lsh + x2_ann_ivf →
    # x2_ann_suite (both paths, recall-vs-brute-force in the output),
    # r38_w2v_synonyms + r40_pca_project → r38_ml_suite (long format;
    # all folded constituents stay benched and/or pytest-covered).
    # Retired round 7: x1_simhash (rows-only with no in-query invariant;
    # its real verification is the pigeonhole banding-guarantee pytest +
    # Hamming property tests, and it stays benched) → slot given to
    # x1_span_dedup, the round's new operator family.
    # Promoted round 8 (rows-only → full oracle rows, no slot change):
    # approx_distinct (raw HLL estimate dropped from the output — engine-
    # specific; the exact count + live relative-error bound are hash-
    # checked) and stream_windowed_real (append-mode emission = windows
    # with end <= max(ts)-watermark, batch-expressible in DuckDB; the
    # promotion caught the r7 entry's unconditional nanos division
    # producing 1970-era windows on micros-typed parquet).
    # Retired round 12 to raise oracle strength per the r11 verdict:
    # x1_url_dedup (exact-dedup-on-derived-key family already carries
    # two green oracle rows, x_curation_exact + x1_incremental_exact;
    # url_normalize stays pytest-covered and the entry stays benched)
    # → slot given to x1_minhash_portable (the md5-portable MinHash
    # tier — fuzzy dedup's FIRST full rows+schema+hash oracle row);
    # x5_chunk_documents (chunking stays pytest + DuckDB-in-test
    # covered and benched; the X5 family keeps five oracle rows)
    # → slot given to x5_dsir_select (the DSIR composite, oracle-
    # paired end to end: md5 buckets, spine fits, decimal score sums,
    # Gumbel top-k re-derived in SQL). Late r12: x1_span_dedup
    # (rows-only — the Arrow extension/removal stages are not
    # SQL-expressible; stays benched with its pytest module
    # incl. the planted-fixture verdicts its gate invariants restated)
    # → slot given to x1_span_portable, the span family's FIRST full
    # oracle row (md5-tier winnowing + anchor join re-derived in
    # DuckDB, incl. the rightmost-min window selection).
    # x5_split_shuffle (the most mechanical X5 row — both halves are
    # pure salted-md5 expressions; the X5 family keeps five oracle
    # rows; its full DuckDB cross-check lives on verbatim in
    # tests/test_trainset.py::test_split_shuffle_matches_duckdb_oracle
    # and the entry stays benched) → slot given to x2_bm25_hybrid,
    # the NEW lexical-retrieval family's oracle row (inverted index +
    # BM25 + RRF fusion re-derived in DuckDB end to end).
    return {
        "r19_quality_report": q_r19_quality_report,
        "quality_summary": q_quality_summary,
        "r16_percentile_bucket": q_r16_percentile_bucket,
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "window_suite": q_window_suite,
        "sql_passthrough": q_sql_passthrough,
        "approx_distinct": q_approx_distinct,
        "join_suite": q_join_suite,
        "reshape_suite": q_reshape_suite,
        "gap_fill": q_gap_fill,
        "x6_entity_resolution": q_x6_entity_resolution,
        "json_extract": q_json_extract,
        "date_agg": q_date_agg,
        "stream_window_counts": q_stream_window_counts,
        "sampling_suite": q_sampling_suite,
        "x4_text_suite": q_x4_text_suite,
        "x2_topk_cosine": q_x2_topk_cosine,
        "r33_tfidf": q_r33_tfidf,
        "local_supplier_volume": q_local_supplier_volume,
        "range_join_bands": q_range_join_bands,
        "agg_suite": q_agg_suite,
        "sessionize_events": q_sessionize_events,
        "asof_join": q_asof_join,
        "x5_decontaminate": q_x5_decontaminate,
        "x5_source_mix": q_x5_source_mix,
        "x2_bm25_hybrid": q_x2_bm25_hybrid,
        "x3_media_features": q_x3_media_features,
        "x1_ngram_jaccard": q_x1_ngram_jaccard,
        "x1_embedding_neardup": q_x1_embedding_neardup,
        "x_curation_exact": q_x_curation_exact,
        "x6_snapshot_history": q_x6_snapshot_history,
        "x7_event_suite": q_x7_event_suite,
        "x5_token_budget": q_x5_token_budget,
        "x1_paragraph_dedup": q_x1_paragraph_dedup,
        "x5_dsir_select": q_x5_dsir_select,
        "x5_pack_sequences": q_x5_pack_sequences,
        "x1_incremental_exact": q_x1_incremental_exact,
        "x1_incremental_fuzzy": q_x1_incremental_fuzzy,
        "x1_minhash_portable": q_x1_minhash_portable,
        "x4_gopher_gates": q_x4_gopher_gates,
        "x4_census": q_x4_census,
        "x4_lm_quality": q_x4_lm_quality,
        "x1_semantic_dedup": q_x1_semantic_dedup,
        "x1_minhash_dedup": q_x1_minhash_dedup,
        "x1_span_portable": q_x1_span_portable,
        "stream_windowed_real": q_stream_windowed_real,
        "x2_ann_suite": q_x2_ann_suite,
        "r38_ml_suite": q_r38_ml_suite,
        "r37_ner": q_r37_ner,
    }



def _bpe_oracle_sql() -> str:
    """The x5_token_budget oracle, built at call time: regex tier as a
    plain window prefix sum; BPE tier re-derived ENTIRELY in DuckDB —
    the byte-to-unicode map and the committed 267-merge fixture embedded
    as constant VALUES tables (the stopword/lexicon precedent: published
    constants, not expected outputs), the GPT-2 pretokenizer as an RE2
    regex, and the greedy merge loop as a recursive CTE. Each recursive
    step applies ONE left-to-right replace pass of the current
    lowest-rank adjacent pair (units bracketed by \\x1f, a byte whose
    b2u image is non-ASCII, so the separator can never collide with
    unit text); convergence to bpe_apply's merge-ALL-occurrences loop
    holds because a merges list produced by training ranks any pair
    involving a merged token AFTER the merge that created it, so
    re-picking the min rank between passes never reorders merges.
    Prototype match: all 500 sf0.01 docs equal the driver-side
    bpe_encode reference."""
    from datamunging_spark.operators.bpe import (
        bytes_to_unicode,
        load_fixture_merges,
    )

    def esc(v: str) -> str:
        return v.replace("'", "''")

    sep = "\x1f"
    b2u_rows = ",".join(
        f"({b},'{esc(ch)}')" for b, ch in bytes_to_unicode().items()
    )
    merge_rows = ",".join(
        f"('{esc(a)}','{esc(b)}',{r})"
        for r, (a, b) in enumerate(load_fixture_merges())
    )
    # RE2 rendering of bpe.PRETOK_PATTERN ([^\\W\\d_] == \\p{L};
    # [^\\s\\w] == [^\\s\\p{L}\\p{N}_]); leading quote doubled for SQL
    pretok = (
        "'" + "''s|''t|''re|''ve|''m|''ll|''d"
        + r"| ?\p{L}+| ?\p{N}+| ?(?:_|[^\s\p{L}\p{N}_])+|\s+" + "'"
    )
    pair = f"'{sep}' || m.a || '{sep}' || m.b || '{sep}'"
    pair2 = f"'{sep}' || m2.a || '{sep}' || m2.b || '{sep}'"
    return f"""
        WITH RECURSIVE b2u(byte, ch) AS (VALUES {b2u_rows}),
        mg(a, b, rank) AS (VALUES {merge_rows}),
        pretoks AS (
          SELECT doc_id, source,
                 unnest(regexp_extract_all(text, {pretok})) AS pt
          FROM documents
        ),
        distinct_pt AS (SELECT DISTINCT pt FROM pretoks),
        pt_idx AS (
          SELECT pt, unnest(range(octet_length(encode(pt)))) AS i
          FROM distinct_pt
        ),
        pt_bytes AS (
          SELECT pt, i,
                 (SELECT ch FROM b2u WHERE byte =
                    (strpos('0123456789abcdef', substr(lower(hex(encode(pt))), CAST(2*i + 1 AS INT), 1)) - 1) * 16
                  + (strpos('0123456789abcdef', substr(lower(hex(encode(pt))), CAST(2*i + 2 AS INT), 1)) - 1)
                 ) AS ch
          FROM pt_idx
        ),
        init AS (
          SELECT pt, '{sep}' || string_agg(ch, '{sep}' ORDER BY i) || '{sep}' AS s
          FROM pt_bytes GROUP BY pt
        ),
        steps AS (
          SELECT pt, s FROM init
          UNION ALL
          SELECT st.pt,
                 replace(st.s, {pair}, '{sep}' || m.a || m.b || '{sep}') AS s
          FROM steps st
          JOIN mg m
            ON m.rank = (SELECT min(m2.rank) FROM mg m2
                         WHERE contains(st.s, {pair2}))
        ),
        terminal AS (
          SELECT pt, len(string_split(s, '{sep}')) - 2 AS n_units
          FROM steps st
          WHERE NOT EXISTS (SELECT 1 FROM mg m WHERE contains(st.s, {pair}))
        ),
        pt_sums AS (
          SELECT p.doc_id, CAST(sum(t.n_units) AS BIGINT) AS n
          FROM pretoks p JOIN terminal t ON p.pt = t.pt
          GROUP BY p.doc_id
        ),
        bpe_counts AS (
          -- LEFT from documents so pretoken-less docs don't vanish
          -- (the Spark side keeps them): NULL text -> NULL count
          -- (counter contract), empty text -> 0 (r12 review catch)
          SELECT d.doc_id, d.source,
                 CASE WHEN d.text IS NULL THEN NULL
                      ELSE coalesce(ps.n, 0) END AS n_tokens
          FROM documents d LEFT JOIN pt_sums ps ON d.doc_id = ps.doc_id
        ),
        bpe_run AS (
          SELECT doc_id, source, n_tokens,
                 sum(greatest(coalesce(n_tokens, 0), 0))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS run
          FROM bpe_counts
        ),
        rx AS (
          SELECT doc_id, source,
                 CASE WHEN text IS NULL THEN -1
                      ELSE len(string_split(text, ' ')) END AS n_tokens
          FROM documents
        ),
        rx_run AS (
          SELECT doc_id, source, n_tokens,
                 sum(greatest(n_tokens, 0))
                   OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS run
          FROM rx
        )
        SELECT 'regex' AS branch, doc_id, source,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM rx_run WHERE run <= 100000
        UNION ALL
        SELECT 'bpe' AS branch, doc_id, source, n_tokens
        FROM bpe_run WHERE run <= 75000
    """



#: Shared CTE prefix of the two portable-MinHash oracle rows
#: (x1_minhash_portable pairs, x1_minhash_dedup CC survivors) — ONE
#: definition of the md5 signature pipeline (normalize, 3-gram
#: shingles, 64 per-seed lexicographic mins, 16 band keys, candidate
#: pairs) so the gate rows can never silently desynchronize
#: (r12 review catch).
_MINHASH_MD5_CTES = """toks AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, greatest(len(toks) - 2, 1) + 1),
                       i -> array_to_string(toks[i:i+2], ' ')))) AS sh
              FROM toks
            ), h AS (
              SELECT doc_id, md5(sh) AS h FROM g
            ), slots AS (
              SELECT doc_id, s.seed AS seed,
                     min(md5(CAST(s.seed AS VARCHAR) || '|' || h.h)) AS m
              FROM h CROSS JOIN range(64) s(seed)
              GROUP BY doc_id, s.seed
            ), sigs AS (
              SELECT doc_id, list(m ORDER BY seed) AS sig FROM slots GROUP BY doc_id
            ), bands AS (
              SELECT doc_id, b.b AS b,
                     md5(array_to_string(sig[b.b*4+1 : b.b*4+4], ',')) AS k
              FROM sigs CROSS JOIN range(16) b(b)
            ), pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b ON a.b = b.b AND a.k = b.k AND a.doc_id < b.doc_id
            )"""


def oracle_sql() -> dict[str, str]:
    pct_list = "[0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,0.95,0.99]"
    labels = ["10th", "20th", "30th", "40th", "50th", "60th",
              "70th", "80th", "90th", "95th", "99th"]
    arms = "\n".join(
        f"        WHEN l.l_quantity <= p.pct[{i + 1}] THEN '{lab}'"
        for i, lab in enumerate(labels)
    )
    return {
        "r19_quality_report": """
            SELECT 'regex_fail' AS branch, source AS key, count(*) AS cnt
            FROM documents
            WHERE nullif(regexp_extract(source, '^(src[0-9])$', 1), '') IS NULL
            GROUP BY source
            UNION ALL
            SELECT 'dup_key', source, count(*) FROM documents
            GROUP BY source HAVING count(*) > 1
            UNION ALL
            SELECT 'orphan_fk', CAST(o_custkey AS VARCHAR), count(*)
            FROM orders
            WHERE o_custkey IS NOT NULL
              AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                    WHERE c_custkey % 10 != 0)
            GROUP BY o_custkey
            UNION ALL
            SELECT 'accepted_values', lang, count(*) FROM documents
            WHERE lang IS NULL OR lang NOT IN ('en', 'de', 'fr')
            GROUP BY lang
            UNION ALL
            SELECT 'range', source, count(*) FROM documents
            WHERE n_chars IS NULL OR NOT (n_chars >= 0 AND n_chars <= 400)
            GROUP BY source
        """,
        "quality_summary": """
            SELECT count(*) AS total_rows,
                   CAST(sum(CASE WHEN nullif(regexp_extract(source, '^(src[0-9])$', 1), '') IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS src_fmt_failed,
                   CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) AS text_set_failed
            FROM documents
        """,
        "r16_percentile_bucket": f"""
            WITH p AS (
              SELECT l_partkey, quantile_cont(l_quantity, {pct_list}) AS pct
              FROM lineitem GROUP BY l_partkey
            )
            SELECT l.l_orderkey, l.l_linenumber, l.l_partkey,
              CASE
{arms}
                ELSE '99+th'
              END AS bucket
            FROM lineitem l JOIN p ON l.l_partkey = p.l_partkey
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT o_orderkey,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "window_suite": """
            SELECT o_custkey, o_orderkey,
                   count(*) OVER w AS run_n,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS run_total,
                   lag(o_totalprice, 1) OVER wb AS prev_price,
                   lead(o_totalprice, 1) OVER wb AS next_price,
                   rank() OVER wb AS rnk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wb AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
        # the literal text spark.sql runs — zero dialect delta by design
        "sql_passthrough": _PASSTHROUGH_SQL,
        "reshape_suite": """
            SELECT o_orderpriority AS priority, o_orderstatus AS status,
                   count(*) AS cnt,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS sum_price
            FROM orders GROUP BY 1, 2
        """,
        "gap_fill": """
            WITH base AS (
              SELECT o_custkey % 5 AS grp, CAST(o_orderdate AS DATE) AS d,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS rev
              FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1, 2
            ), bounds AS (
              SELECT grp, min(d) AS t0, max(d) AS t1 FROM base GROUP BY grp
            ), spine AS (
              SELECT grp,
                     CAST(unnest(generate_series(CAST(t0 AS TIMESTAMP),
                                                 CAST(t1 AS TIMESTAMP),
                                                 INTERVAL 1 DAY)) AS DATE) AS d
              FROM bounds
            ), j AS (
              SELECT s.grp, s.d, b.rev,
                     CASE WHEN b.d IS NULL THEN 0 ELSE 1 END AS n_obs
              FROM spine s LEFT JOIN base b ON s.grp = b.grp AND s.d = b.d
            )
            SELECT grp, d,
                   last_value(rev IGNORE NULLS) OVER (
                     PARTITION BY grp ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev,
                   CAST(n_obs AS BIGINT) AS n_obs
            FROM j
        """,
        "x6_entity_resolution": """
            WITH RECURSIVE recs AS (
              SELECT CAST(c_custkey AS BIGINT) AS rid, c_name AS name
              FROM customer
              UNION ALL
              SELECT CAST(c_custkey + 10000000 AS BIGINT),
                     replace(c_name, 'Customer#', 'Cust #')
              FROM customer
              UNION ALL
              SELECT CAST(c_custkey + 20000000 AS BIGINT), c_name || ' Inc.'
              FROM customer WHERE c_custkey % 10 = 0
            ), keyed AS (
              SELECT rid, name,
                     CAST(regexp_extract(name, '[0-9]+') AS BIGINT) AS digits,
                     CAST(regexp_extract(name, '[0-9]+') AS BIGINT) % 1000
                       AS blk
              FROM recs
            ), edges AS (
              SELECT a.rid AS ra, b.rid AS rb
              FROM keyed a JOIN keyed b ON a.blk = b.blk AND a.rid < b.rid
              WHERE a.digits = b.digits
                AND 1.0 - CAST(levenshtein(a.name, b.name) AS DOUBLE)
                          / greatest(length(a.name), length(b.name)) >= 0.5
            ), und AS (
              SELECT ra AS a, rb AS b FROM edges
              UNION SELECT rb, ra FROM edges
            ), reach AS (
              SELECT a AS n, b AS r FROM und
              UNION
              SELECT reach.n, und.b FROM reach
              JOIN und ON reach.r = und.a WHERE und.b <> reach.n
            ), lab AS (
              SELECT n, least(n, min(r)) AS ent FROM reach GROUP BY n
            )
            SELECT k.rid AS rid, k.name AS name,
                   COALESCE(lab.ent, k.rid) AS entity_id
            FROM keyed k LEFT JOIN lab ON k.rid = lab.n
        """,
        "join_suite": """
            SELECT 'left' AS op, key, n_orders FROM (
              SELECT CAST(c_custkey AS BIGINT) AS key, n_orders
              FROM customer LEFT JOIN (
                SELECT o_custkey, count(*) AS n_orders
                FROM orders GROUP BY o_custkey
              ) o ON c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'semi', CAST(c_custkey AS BIGINT), CAST(NULL AS BIGINT)
            FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'anti', CAST(c_custkey AS BIGINT), CAST(NULL AS BIGINT)
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "json_extract": """
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k
            FROM events GROUP BY event_type
        """,
        "date_agg": """
            SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY day, event_type
        """,
        "stream_window_counts": """
            SELECT date_trunc('minute', ts) AS win_start, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY win_start, event_type
        """,
        # r8 promotion: the real Structured Streaming run's append-mode
        # output is the windows closed by the final watermark (max event
        # time - 2 min; the availableNow trailing no-data batch flushes
        # them) -- batch-expressible, so the streaming engine's emission
        # set, window arithmetic, timestamp decode, and per-window
        # aggregates are all value-hash-checked. r9 (ADVICE): strict
        # win_end < m.w, matching the Spark side's explicit boundary
        # filter -- a window tied exactly to the watermark is excluded on
        # both sides so the engine's eviction predicate at the boundary
        # (strict vs inclusive) can never flake the hash.
        "stream_windowed_real": """
            WITH m AS (SELECT max(ts) - INTERVAL 2 MINUTE AS w FROM events)
            SELECT date_trunc('minute', ts) AS win_start,
                   date_trunc('minute', ts) + INTERVAL 1 MINUTE AS win_end,
                   event_type, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                       AS sum_value,
                   true AS window_ok
            FROM events, m
            GROUP BY win_start, win_end, event_type, m.w
            HAVING win_end < m.w
        """,
        # r8 promotion: the raw HLL estimate is engine-specific, but the
        # exact count and the live relative-error bound are not.
        "approx_distinct": """
            SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
                   true AS within_10pct
            FROM lineitem
        """,
        "sampling_suite": """
            SELECT 'bernoulli' AS op, CAST(l_orderkey AS BIGINT) AS k1,
                   CAST(l_linenumber AS VARCHAR) AS k2
            FROM lineitem
            WHERE substr(md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
                                            CAST(l_linenumber AS VARCHAR))),
                         1, 4) < '3333'
            UNION ALL
            SELECT 'bykey', CAST(c_custkey AS BIGINT), c_name FROM customer
            WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 2) <= '32'
        """,
        "x6_snapshot_history": """
            WITH old AS (
              SELECT c_custkey, c_acctbal, c_mktsegment
              FROM customer WHERE c_custkey % 101 <> 0
            ), new AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 1.0
                          ELSE c_acctbal END AS c_acctbal,
                     c_mktsegment
              FROM customer
            ), diff AS (
              SELECT 'diff' AS part,
                     CAST(COALESCE(o.c_custkey, n.c_custkey) AS BIGINT) AS key,
                     CASE WHEN o.c_custkey IS NULL THEN 'added'
                          WHEN n.c_custkey IS NULL THEN 'removed'
                          WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                            OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
                          THEN 'changed' END AS attr,
                     CAST(NULL AS INT) AS v_from, CAST(NULL AS INT) AS v_to
              FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
            ), snaps AS (
              SELECT c_custkey,
                     CASE WHEN (c_custkey + v) % 7 = 0 THEN 'SHIFTED'
                          ELSE c_mktsegment END AS seg, v
              FROM customer CROSS JOIN (VALUES (1), (2), (3)) AS t(v)
            ), lagged AS (
              SELECT c_custkey, seg, v,
                     CASE WHEN lag(v) OVER w IS NULL
                            OR seg IS DISTINCT FROM lag(seg) OVER w
                          THEN 1 ELSE 0 END AS chg
              FROM snaps WINDOW w AS (PARTITION BY c_custkey ORDER BY v)
            ), segs AS (
              SELECT c_custkey, seg, v,
                     SUM(chg) OVER (PARTITION BY c_custkey ORDER BY v) AS s
              FROM lagged
            ), runs AS (
              SELECT c_custkey, s, min(seg) AS attr, min(v) AS v_from
              FROM segs GROUP BY c_custkey, s
            )
            SELECT part, key, attr, v_from, v_to FROM diff
            WHERE attr IS NOT NULL
            UNION ALL
            SELECT 'scd2', CAST(c_custkey AS BIGINT), attr,
                   CAST(v_from AS INT),
                   CAST(lead(v_from) OVER
                        (PARTITION BY c_custkey ORDER BY s) AS INT)
            FROM runs
            UNION ALL
            -- diff(base, apply(base, changelog)) == the changelog's effect
            SELECT 'apply', CAST(c_custkey AS BIGINT),
                   CASE WHEN c_custkey % 21 = 0 THEN 'removed'
                        WHEN c_mktsegment <> 'MOVED' THEN 'changed' END,
                   CAST(NULL AS INT), CAST(NULL AS INT)
            FROM customer
            WHERE c_custkey % 7 = 0
              AND (c_custkey % 21 = 0 OR c_mktsegment <> 'MOVED')
            UNION ALL
            -- point-in-time lookup at ts=2 == the v2 snapshot, closed form
            SELECT 'lookup', CAST(c_custkey AS BIGINT),
                   CASE WHEN (c_custkey + 2) % 7 = 0 THEN 'SHIFTED'
                        ELSE c_mktsegment END,
                   CAST(NULL AS INT), CAST(NULL AS INT)
            FROM customer
        """,
        "x7_event_suite": """
            WITH e AS (SELECT * FROM events),
            u1 AS (SELECT user_id, min(ts) t1 FROM e
                   WHERE event_type = 'view' GROUP BY user_id),
            u2 AS (SELECT e.user_id, min(ts) t2 FROM e JOIN u1 USING (user_id)
                   WHERE event_type = 'click' AND ts >= t1 GROUP BY e.user_id),
            u3 AS (SELECT e.user_id, min(ts) t3 FROM e JOIN u2 USING (user_id)
                   WHERE event_type = 'purchase' AND ts >= t2
                   GROUP BY e.user_id),
            f AS (SELECT user_id, min(ts) ft FROM e GROUP BY user_id),
            spans AS (SELECT user_id, epoch(min(ts)) AS s,
                             epoch(min(ts)) + 3600 AS t
                      FROM e GROUP BY user_id)
            SELECT 'funnel' AS part, 'view' AS k, CAST(1 AS BIGINT) AS off,
                   CAST((SELECT count(*) FROM u1) AS BIGINT) AS n
            UNION ALL
            SELECT 'funnel', 'click', 2, (SELECT count(*) FROM u2)
            UNION ALL
            SELECT 'funnel', 'purchase', 3, (SELECT count(*) FROM u3)
            UNION ALL
            SELECT 'cohort', CAST(CAST(date_trunc('day', ft) AS DATE)
                                  AS VARCHAR),
                   CAST(floor(date_diff('day',
                                        CAST(date_trunc('day', ft) AS DATE),
                                        CAST(e.ts AS DATE)) / 7) AS BIGINT),
                   count(DISTINCT e.user_id)
            FROM e JOIN f USING (user_id)
            GROUP BY 2, 3
            UNION ALL
            SELECT 'overlap', CAST(a.user_id AS VARCHAR),
                   CAST(b.user_id AS BIGINT), NULL
            FROM spans a, spans b
            WHERE a.s <= b.t AND b.s <= a.t
        """,
        # r9 promotion: bin assignment is hash-split-dependent and stays
        # pytest-pinned, but the per-doc surface is deterministic —
        # n_tokens, the truncated contract (n_tokens > max_len), and the
        # two packing invariants the Spark side computes over the REAL
        # bins (the oracle expects them uniformly true, so a capacity or
        # bookkeeping violation fails the value hash).
        "x5_pack_sequences": """
            SELECT doc_id,
                   CAST(CASE WHEN text IS NULL THEN -1
                        ELSE len(string_split(text, ' ')) END AS BIGINT)
                       AS n_tokens,
                   (CASE WHEN text IS NULL THEN -1
                         ELSE len(string_split(text, ' ')) END) > 1024
                       AS truncated,
                   true AS within_cap,
                   true AS bin_sum_ok
            FROM documents
        """,
        "x5_token_budget": _bpe_oracle_sql(),
        "x1_paragraph_dedup": """
            WITH paras AS (
              SELECT doc_id,
                     generate_subscripts(toks, 1) - 1 AS pos,
                     unnest(toks) AS para
              FROM (SELECT doc_id, string_split(coalesce(text, ''), '. ') AS toks
                    FROM documents)
            ), normed AS (
              SELECT doc_id, pos, para,
                     trim(regexp_replace(lower(para), '\\s+', ' ', 'g')) AS norm
              FROM paras
            ), kept AS (
              SELECT doc_id, pos, para FROM (
                SELECT doc_id, pos, para,
                       row_number() OVER (PARTITION BY norm
                                          ORDER BY doc_id, pos) AS rn
                FROM normed WHERE norm <> ''
              ) WHERE rn = 1
              UNION ALL
              SELECT doc_id, pos, para FROM normed WHERE norm = ''
            ), rebuilt AS (
              SELECT doc_id, string_agg(para, '. ' ORDER BY pos) AS new_text
              FROM kept GROUP BY doc_id
            )
            SELECT d.doc_id, coalesce(r.new_text, '') AS text, d.source
            FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        """,
        "x5_dsir_select": """
            WITH toks AS (
              SELECT doc_id, source,
                     list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '),
                                 w -> w <> '') AS t
              FROM documents
            ), feats AS (
              SELECT doc_id, source, substr(md5(g), 1, 4) AS bucket
              FROM (
                SELECT doc_id, source,
                       unnest(list_concat(t,
                         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))) AS g
                FROM toks
              )
            ), spine AS (
              SELECT printf('%04x', CAST(i AS INT)) AS bucket FROM range(65536) r(i)
            ), fit_r AS (
              SELECT s.bucket,
                     round(ln((coalesce(c.cnt, 0) + 1.0) / (tot.total + 65536.0)), 7) AS lp
              FROM spine s
              LEFT JOIN (SELECT bucket, count(*) AS cnt FROM feats GROUP BY bucket) c
                     ON s.bucket = c.bucket
              CROSS JOIN (SELECT count(*) AS total FROM feats) tot
            ), fit_t AS (
              SELECT s.bucket,
                     round(ln((coalesce(c.cnt, 0) + 1.0) / (tot.total + 65536.0)), 7) AS lp
              FROM spine s
              LEFT JOIN (SELECT bucket, count(*) AS cnt FROM feats
                         WHERE source IN ('src0','src1','src2','src3') GROUP BY bucket) c
                     ON s.bucket = c.bucket
              CROSS JOIN (SELECT count(*) AS total FROM feats
                          WHERE source IN ('src0','src1','src2','src3')) tot
            ), ratios AS (
              SELECT t.bucket, CAST(round(t.lp - r.lp, 7) AS DECIMAL(28,7)) AS lr
              FROM fit_t t JOIN fit_r r ON t.bucket = r.bucket
            ), scores AS (
              SELECT f.doc_id, count(*) AS n_features,
                     CAST(sum(r.lr) AS DOUBLE) AS dsir_logw
              FROM feats f JOIN ratios r ON f.bucket = r.bucket
              GROUP BY f.doc_id
            ), keyed AS (
              SELECT doc_id, n_features, dsir_logw,
                     dsir_logw + (-ln(-ln(
                       (list_sum(list_transform(range(1, 9),
                          i -> CAST(strpos('0123456789abcdef',
                                    substr(md5('bench|' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT)
                               * (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT))))
                        + 1.0) / 4294967298.0))) AS gumbel_key
              FROM scores
            )
            SELECT doc_id, n_features, dsir_logw,
                   round(gumbel_key, 7) AS gumbel_key
            FROM keyed ORDER BY gumbel_key DESC, doc_id LIMIT 200
        """,
        "x4_text_suite": f"""
            WITH stats AS (
              SELECT doc_id,
                     len(string_split(text, ' ')) AS n_tokens,
                     round(CASE WHEN len(toks) > 0
                           THEN len(list_filter(toks, t -> t IN ({_STOPWORDS_SQL}))) / len(toks)
                           ELSE 0.0 END, 6) AS stop_frac,
                     round(CASE WHEN length(text) > 0
                           THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text)
                           ELSE 0.0 END, 6) AS punct_frac
              FROM (SELECT doc_id, text,
                           regexp_split_to_array(lower(text), '\\s+') AS toks
                    FROM documents)
            ), tokcnt AS (
              SELECT doc_id,
                     len(string_split(text, ' ')) AS ws_tokens,
                     len(regexp_extract_all(text,
                         '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+|\\s+'))
                       AS bpe_tokens
              FROM documents
            ), langid AS (
              SELECT doc_id, lang,
                     CASE WHEN m = 0 THEN 'und'
                          WHEN s_en = m THEN 'en'
                          WHEN s_fr = m THEN 'fr'
                          WHEN s_de = m THEN 'de'
                          WHEN s_es = m THEN 'es'
                          ELSE 'zh' END AS lang_detected
              FROM (
                SELECT doc_id, lang,
                       greatest(s_en, s_fr, s_de, s_es, s_zh) AS m,
                       s_en, s_fr, s_de, s_es, s_zh
                FROM (
                  SELECT doc_id, lang,
                    len(list_filter(toks, t -> t IN ('the','and','of','to','is','in','that','it','with'))) AS s_en,
                    len(list_filter(toks, t -> t IN ('le','la','les','de','et','est','un','une','dans'))) AS s_fr,
                    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','zu'))) AS s_de,
                    len(list_filter(toks, t -> t IN ('el','la','los','de','y','es','un','una','en'))) AS s_es,
                    len(list_filter(toks, t -> t IN ('的','是','了','在','我','有','和','不','人'))) AS s_zh
                  FROM (SELECT doc_id, lang,
                               regexp_split_to_array(lower(text), '\\s+') AS toks
                        FROM documents)
                )
              )
            ), qual AS (
              SELECT doc_id, ascii_frac, rep_frac,
                     (ascii_frac >= 0.5 AND rep_frac <= 0.9) AS keep
              FROM (
                SELECT doc_id,
                  round(CASE WHEN length(text) > 0
                    THEN CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE) / length(text)
                    ELSE 1.0 END, 6) AS ascii_frac,
                  round(CASE WHEN len(toks) > 0
                    THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                    ELSE 0.0 END, 6) AS rep_frac
                FROM (SELECT doc_id, text,
                             regexp_split_to_array(lower(text), '\\s+') AS toks
                      FROM documents)
              )
            ), fp AS (
              SELECT doc_id,
                     md5(array_to_string(list_sort(list_distinct(
                         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))),
                         ' ')) AS fp
              FROM documents
            )
            SELECT doc_id, n_tokens, stop_frac, punct_frac, ws_tokens,
                   bpe_tokens, lang, lang_detected, ascii_frac, rep_frac,
                   keep, fp
            FROM stats
            JOIN tokcnt USING (doc_id)
            JOIN langid USING (doc_id)
            JOIN qual USING (doc_id)
            JOIN fp USING (doc_id)
        """,
        "x5_decontaminate": """
            WITH t AS (
              SELECT doc_id,
                     string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
              FROM documents
            ), g AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       range(1, greatest(len(toks) - 4, 1) + 1),
                       i -> array_to_string(toks[i:i+4], ' ')))) AS gram
              FROM t
            ), bg AS (
              SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0
            ), bad AS (
              SELECT g.doc_id FROM g JOIN bg USING (gram)
              GROUP BY g.doc_id HAVING count(*) >= 2
            ), norm AS (
              SELECT doc_id, source,
                     trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
              FROM documents
            ), probes AS (
              SELECT DISTINCT trim(substr(nt, 1, 48)) AS p FROM norm
              WHERE doc_id % 20 = 0
                AND length(trim(substr(nt, 1, 48))) >= 20
            ), sub_bad AS (
              SELECT n.doc_id FROM norm n
              JOIN probes ON contains(n.nt, probes.p)
              GROUP BY n.doc_id
            )
            SELECT 'ngram' AS mode, doc_id, source FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM bad)
            UNION ALL
            SELECT 'substring' AS mode, doc_id, source FROM norm
            WHERE doc_id NOT IN (SELECT doc_id FROM sub_bad)
        """,
        "x5_source_mix": """
            WITH w AS (
              SELECT * FROM (VALUES ('src0', 2.5), ('src1', 0.5),
                                    ('src2', 0.0), ('src3', 3.0)) AS v(source, wt)
            ), d AS (
              SELECT doc_id, d.source, coalesce(wt, 1.0) AS wt
              FROM documents d LEFT JOIN w USING (source)
            )
            SELECT doc_id, source, CAST(copy AS INT) AS copy
            FROM d CROSS JOIN UNNEST(range(CAST(ceil(wt) AS BIGINT))) AS t(copy)
            WHERE copy < floor(wt)
               OR (copy = floor(wt)
                   AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                       < printf('%04x', CAST(floor((wt - floor(wt)) * 65536) AS INT)))
        """,
        # BM25 re-derived in SQL: same space-split tokenization as the
        # r33 oracle, Lucene "+1" idf, per-term contributions cast
        # DECIMAL(28,7) before the sum (reduction-order-free — exact
        # cross-engine equality), ranks tie-broken on ascending doc id;
        # the vector leg is the x2_topk_cosine oracle's cosine/tiebreak
        # form; RRF is a fixed-order two-term double expression.
        "x2_bm25_hybrid": """
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
                     -- parenthesized as idf * (tfn): the exact
                     -- double-op grouping of the Spark expression —
                     -- (a*b)/c and a*(b/c) differ by 1 ulp, enough to
                     -- flip a DECIMAL(28,7) half-rounding boundary
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
            ), lex AS (
              SELECT query_id, doc_id, rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY s DESC, doc_id) AS rank
                FROM per_doc
              ) WHERE rank <= 10
            ), vec AS (
              SELECT query_id, doc_id, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                       row_number() OVER (PARTITION BY q.vec_id
                                          ORDER BY list_cosine_similarity(
                                              CAST(q.embedding AS DOUBLE[]),
                                              CAST(c.embedding AS DOUBLE[])) DESC,
                                          c.vec_id) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 3 AND c.vec_id != q.vec_id
              ) WHERE rank <= 10
            ), fused AS (
              SELECT query_id, doc_id,
                     l.rank AS lex_rank, v.rank AS vec_rank,
                     coalesce(1.0 / (60.0 + l.rank), 0.0)
                       + coalesce(1.0 / (60.0 + v.rank), 0.0) AS rrf
              FROM lex l FULL OUTER JOIN vec v USING (query_id, doc_id)
            )
            SELECT query_id, doc_id, lex_rank, vec_rank, rrf,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY rrf DESC, doc_id) AS rank
            FROM fused
        """,
        "x1_incremental_exact": """
            WITH hashed AS (
              SELECT doc_id, source,
                     md5(trim(regexp_replace(lower(coalesce(text, '')),
                                             '\\s+', ' ', 'g'))) AS h
              FROM documents
            ), snap AS (
              SELECT DISTINCT h FROM hashed WHERE doc_id < 400
            ), fresh AS (
              SELECT doc_id, source, h FROM hashed
              WHERE doc_id >= 400 AND h NOT IN (SELECT h FROM snap)
            ), keep AS (
              SELECT h, min(doc_id) AS doc_id FROM fresh GROUP BY h
            )
            SELECT f.doc_id, f.source
            FROM fresh f JOIN keep k ON f.h = k.h AND f.doc_id = k.doc_id
        """,
        "x2_topk_cosine": """
            SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY q.vec_id
                                        ORDER BY list_cosine_similarity(
                                            CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])) DESC,
                                        c.vec_id) AS rank,
                     list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])) AS cosine
              FROM embeddings q, embeddings c
              WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
            ) WHERE rank <= 5
        """,
        "r33_tfidf": """
            WITH terms AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
            ),
            t AS (SELECT doc_id, term, count(*) AS tf
                  FROM terms WHERE term != '' GROUP BY doc_id, term),
            d AS (SELECT term, count(*) AS df FROM t GROUP BY term),
            n AS (SELECT count(*) AS n FROM documents)
            SELECT doc_id, t.term, tf, df,
                   round(tf * ln((n + 1.0) / (df + 1)), 6) AS tfidf
            FROM t JOIN d USING (term) CROSS JOIN n
        """,
        "local_supplier_volume": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
        """,
        "range_join_bands": """
            SELECT p_partkey, count(*) AS n_in_band,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM lineitem JOIN part
              ON l_extendedprice >= p_retailprice * 0.95
             AND l_extendedprice <= p_retailprice * 1.05
            WHERE p_partkey <= 100
            GROUP BY p_partkey
        """,
        "agg_suite": """
            WITH base AS (
              SELECT l_returnflag AS k1,
                     CAST(min(l_quantity) AS DOUBLE) AS min_qty,
                     CAST(max(l_quantity) AS DOUBLE) AS max_qty,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       / count(*) AS avg_qty,
                     round(stddev_samp(l_quantity), 6) AS sd_qty,
                     CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
                     array_to_string(list_sort(list(DISTINCT l_linestatus)),
                                     ',') AS statuses
              FROM lineitem GROUP BY l_returnflag
            )
            SELECT 'rollup' AS op, l_returnflag AS k1, l_linestatus AS k2,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS x,
                   CAST(NULL AS VARCHAR) AS s
            FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
            UNION ALL
            SELECT 'cube', l_returnflag, l_linestatus,
                   CAST(count(*) AS BIGINT),
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                   NULL
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
            UNION ALL
            SELECT 'stats_min', k1, NULL, NULL, min_qty, NULL FROM base
            UNION ALL
            SELECT 'stats_max', k1, NULL, NULL, max_qty, NULL FROM base
            UNION ALL
            SELECT 'stats_avg', k1, NULL, NULL, avg_qty, NULL FROM base
            UNION ALL
            SELECT 'stats_sd', k1, NULL, NULL, sd_qty, NULL FROM base
            UNION ALL
            SELECT 'stats_distinct', k1, NULL, n_parts, NULL, NULL FROM base
            UNION ALL
            SELECT 'stats_set', k1, NULL, NULL, NULL, statuses FROM base
        """,

        "sessionize_events": """
            WITH x AS (
              SELECT user_id, ts, value, event_id,
                     epoch_us(ts) - epoch_us(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
              FROM events
            ), s AS (
              SELECT user_id, ts, value,
                     sum(CASE WHEN gap_us IS NULL OR gap_us >= 300000000
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_idx
              FROM x
            )
            SELECT user_id, min(ts) AS sess_start,
                   max(ts) + INTERVAL 5 MINUTE AS sess_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM s GROUP BY user_id, sess_idx
        """,
        "asof_join": """
            SELECT l.event_id, l.user_id, l.ts,
                   r.event_id AS prev_purchase_id,
                   round(r.value, 6) AS prev_value
            FROM (SELECT * FROM events WHERE event_type = 'click') l
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "x3_media_features": """
            SELECT doc_id, 'image/x-fake' AS media_type,
                   CAST(n AS INT) AS n_bytes,
                   CAST(ceil(sqrt(n)) AS INT) AS fake_width,
                   CAST(CASE WHEN n > 0 THEN ceil(n / ceil(sqrt(n))) ELSE 0 END AS INT) AS fake_height
            FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        """,
        "x1_ngram_jaccard": """
            WITH g AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, greatest(len(toks) - 2, 1) + 1),
                       i -> array_to_string(toks[i:i+2], ' '))) AS grams
              FROM (SELECT doc_id,
                           string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
                    FROM documents)
            )
            SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                       / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
              FROM g a, g b
              WHERE a.doc_id < b.doc_id
            ) WHERE jaccard >= 0.5
        """,
        "x_curation_exact": """
            WITH f AS (
              SELECT doc_id, source,
                     md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
              FROM documents
              WHERE len(string_split(text, ' ')) >= 5
                AND (1.0 - CAST(len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS DOUBLE)
                     / len(regexp_split_to_array(lower(text), '\\s+'))) <= 0.9
            ), s AS (SELECT h, min(doc_id) AS doc_id FROM f GROUP BY h)
            SELECT f.doc_id, f.source
            FROM f JOIN s ON f.h = s.h AND f.doc_id = s.doc_id
        """,
        "x1_embedding_neardup": """
            SELECT id_a, id_b, round(cosine, 6) AS cosine FROM (
              SELECT p.vec_id AS id_a, c.vec_id AS id_b,
                     list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                            CAST(c.embedding AS DOUBLE[])) AS cosine
              FROM embeddings p, embeddings c
              WHERE p.vec_id % 25 = 0 AND p.vec_id != c.vec_id
            ) WHERE cosine >= 0.35
        """,
        "x1_incremental_fuzzy": f"""
            WITH RECURSIVE {_MINHASH_MD5_CTES}, hist_losers AS (
              -- history pass: batch doc near-matches any snapshot doc
              SELECT DISTINCT p.id_b AS doc_id
              FROM pairs p
              JOIN sigs sa ON sa.doc_id = p.id_a
              JOIN sigs sb ON sb.doc_id = p.id_b
              WHERE p.id_a < 400 AND p.id_b >= 400
                AND CAST(len(list_intersect(sa.sig, sb.sig)) AS DOUBLE) / 64 >= 0.5
            ), batch_matched AS (
              -- intra-batch pairs among history-pass survivors (id_a < id_b,
              -- so id_a >= 400 implies both endpoints are batch docs)
              SELECT p.id_a, p.id_b
              FROM pairs p
              JOIN sigs sa ON sa.doc_id = p.id_a
              JOIN sigs sb ON sb.doc_id = p.id_b
              WHERE p.id_a >= 400
                AND p.id_a NOT IN (SELECT doc_id FROM hist_losers)
                AND p.id_b NOT IN (SELECT doc_id FROM hist_losers)
                AND CAST(len(list_intersect(sa.sig, sb.sig)) AS DOUBLE) / 64 >= 0.5
            ), edges AS (
              SELECT id_a AS u, id_b AS v FROM batch_matched
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM batch_matched
            ), reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
            SELECT d.doc_id, d.source
            FROM documents d
            WHERE d.doc_id >= 400
              AND d.doc_id NOT IN (SELECT doc_id FROM hist_losers)
              AND d.doc_id NOT IN (SELECT DISTINCT u FROM reach WHERE v < u)
        """,
        "x1_span_portable": """
            WITH docs AS (
              SELECT doc_id, text FROM documents WHERE length(text) >= 50
            ), pos AS (
              SELECT doc_id, text, unnest(range(length(text) - 16 + 1)) AS i
              FROM docs
            ), g AS (
              SELECT doc_id, i, md5(substr(text, CAST(i + 1 AS INT), 16)) AS hx
              FROM pos
            ), h AS (
              -- uint64 of the first 16 hex chars: two 8-nibble halves
              -- (each BIGINT-safe), recombined as HUGEINT so the
              -- unsigned value orders like numpy's uint64 selection key
              SELECT doc_id, i,
                     CAST(list_sum(list_transform(range(1, 9),
                       n -> CAST(strpos('0123456789abcdef', substr(hx, CAST(n AS INT), 1)) - 1 AS BIGINT)
                            * (CAST(1 AS BIGINT) << CAST(4 * (8 - n) AS INT)))) AS HUGEINT)
                     * 4294967296
                     + list_sum(list_transform(range(9, 17),
                       n -> CAST(strpos('0123456789abcdef', substr(hx, CAST(n AS INT), 1)) - 1 AS BIGINT)
                            * (CAST(1 AS BIGINT) << CAST(4 * (16 - n) AS INT)))) AS v
              FROM g
            ), wins AS (
              SELECT doc_id, unnest(range(greatest(n - 35, 0) + 1)) AS s
              FROM (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id)
            ), sel AS (
              -- winnowing: rightmost minimum per 35-wide window
              SELECT DISTINCT doc_id, i, v FROM (
                SELECT w.doc_id, w.s, h.i, h.v,
                       row_number() OVER (
                         PARTITION BY w.doc_id, w.s
                         ORDER BY h.v ASC, h.i DESC
                       ) AS rn
                FROM wins w
                JOIN h ON h.doc_id = w.doc_id
                      AND h.i >= w.s AND h.i < w.s + 35
              ) WHERE rn = 1
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(a.i AS INT) AS pos_a, CAST(b.i AS INT) AS pos_b,
                   CAST(CASE WHEN a.v >= 9223372036854775808
                             THEN a.v - 18446744073709551616
                             ELSE a.v END AS BIGINT) AS fp
            FROM sel a JOIN sel b ON a.v = b.v AND a.doc_id < b.doc_id
        """,
        "x1_minhash_dedup": f"""
            WITH RECURSIVE {_MINHASH_MD5_CTES}, matched AS (
              SELECT p.id_a, p.id_b
              FROM pairs p
              JOIN sigs sa ON sa.doc_id = p.id_a
              JOIN sigs sb ON sb.doc_id = p.id_b
              WHERE CAST(len(list_intersect(sa.sig, sb.sig)) AS DOUBLE) / 64 >= 0.5
            ), edges AS (
              SELECT id_a AS u, id_b AS v FROM matched
              UNION ALL
              SELECT id_b AS u, id_a AS v FROM matched
            ), reach AS (
              SELECT u, v FROM edges
              UNION
              SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
            )
            SELECT d.doc_id, d.source
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT DISTINCT u FROM reach WHERE v < u)
        """,
        "x1_minhash_portable": f"""
            WITH {_MINHASH_MD5_CTES}
            SELECT p.id_a, p.id_b,
                   round(CAST(len(list_intersect(sa.sig, sb.sig)) AS DOUBLE) / 64, 6) AS sig_jaccard
            FROM pairs p
            JOIN sigs sa ON sa.doc_id = p.id_a
            JOIN sigs sb ON sb.doc_id = p.id_b
        """,
        "x4_gopher_gates": """
            WITH w AS (
              SELECT doc_id, coalesce(text, '') AS c,
                     list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                                 x -> x <> '') AS words
              FROM documents
            ), s AS (
              SELECT doc_id, len(words) AS n_words,
                     CASE WHEN len(words) > 0
                          THEN list_aggregate(list_transform(words, x -> length(x)), 'sum') / len(words)
                          ELSE 0.0 END AS mean_len,
                     len(regexp_extract_all(c, '#|\.\.\.|…')) AS n_symbols,
                     CASE WHEN len(words) > 0
                          THEN len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) / len(words)
                          ELSE 0.0 END AS alpha_frac,
                     len(list_intersect(list_transform(words, x -> lower(x)),
                         ['the','be','to','of','and','that','have','with'])) AS stop_hits
              FROM w
            )
            , rep_lines AS (
              SELECT doc_id, trim(regexp_replace(lower(l), '\\s+', ' ', 'g')) AS nl
              FROM (SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS l
                    FROM documents)
              WHERE trim(regexp_replace(lower(l), '\\s+', ' ', 'g')) <> ''
            ), line_grp AS (
              SELECT doc_id, nl, count(*) AS cnt FROM rep_lines GROUP BY doc_id, nl
            ), line_doc AS (
              SELECT doc_id,
                     1 - count(*) / CAST(sum(cnt) AS DOUBLE) AS dup_line_frac,
                     CASE WHEN sum(cnt * length(nl)) > 0
                          THEN sum((cnt - 1) * length(nl)) / CAST(sum(cnt * length(nl)) AS DOUBLE)
                          ELSE 0.0 END AS dup_line_char_frac
              FROM line_grp GROUP BY doc_id
            ), toks2 AS (
              SELECT doc_id,
                     list_filter(string_split(trim(regexp_replace(lower(coalesce(text, '')), '\\s+', ' ', 'g')), ' '),
                                 x -> x <> '') AS tk
              FROM documents
            ), wch AS (
              SELECT doc_id, length(array_to_string(tk, ' ')) AS wchars FROM toks2
            ), grams AS (
              SELECT doc_id, 2 AS n,
                     unnest(list_transform(range(1, len(tk)), i -> array_to_string(tk[i:i+1], ' '))) AS gram
              FROM toks2
              UNION ALL
              SELECT doc_id, 3 AS n,
                     unnest(list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))) AS gram
              FROM toks2
              UNION ALL
              SELECT doc_id, 4 AS n,
                     unnest(list_transform(range(1, len(tk) - 2), i -> array_to_string(tk[i:i+3], ' '))) AS gram
              FROM toks2
            ), gram_top AS (
              SELECT doc_id, n, max(cnt * length(gram)) AS topc FROM (
                SELECT doc_id, n, gram, count(*) AS cnt
                FROM grams GROUP BY doc_id, n, gram
              ) GROUP BY doc_id, n
            ), gram_doc AS (
              SELECT w.doc_id,
                     CASE WHEN wchars > 0 THEN coalesce(max(CASE WHEN n = 2 THEN topc END), 0) / CAST(wchars AS DOUBLE) ELSE 0.0 END AS top2gram_char_frac,
                     CASE WHEN wchars > 0 THEN coalesce(max(CASE WHEN n = 3 THEN topc END), 0) / CAST(wchars AS DOUBLE) ELSE 0.0 END AS top3gram_char_frac,
                     CASE WHEN wchars > 0 THEN coalesce(max(CASE WHEN n = 4 THEN topc END), 0) / CAST(wchars AS DOUBLE) ELSE 0.0 END AS top4gram_char_frac
              FROM wch w LEFT JOIN gram_top g ON w.doc_id = g.doc_id
              GROUP BY w.doc_id, wchars
            )
            SELECT s.doc_id,
                   (n_words >= 50 AND n_words <= 100000) AS word_count_ok,
                   (mean_len >= 3.0 AND mean_len <= 10.0) AS mean_word_len_ok,
                   CASE WHEN n_words > 0 THEN n_symbols / n_words <= 0.1
                        ELSE FALSE END AS symbol_ratio_ok,
                   (alpha_frac >= 0.8) AS alpha_word_ok,
                   (stop_hits >= 2) AS stopword_ok,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND (mean_len >= 3.0 AND mean_len <= 10.0)
                    AND (CASE WHEN n_words > 0 THEN n_symbols / n_words <= 0.1
                              ELSE FALSE END)
                    AND (alpha_frac >= 0.8)
                    AND (stop_hits >= 2)) AS quality_pass,
                   coalesce(dup_line_frac, 0.0) AS dup_line_frac,
                   coalesce(dup_line_char_frac, 0.0) AS dup_line_char_frac,
                   coalesce(top2gram_char_frac, 0.0) AS top2gram_char_frac,
                   coalesce(top3gram_char_frac, 0.0) AS top3gram_char_frac,
                   coalesce(top4gram_char_frac, 0.0) AS top4gram_char_frac,
                   (coalesce(dup_line_frac, 0.0) <= 0.30) AS dup_line_ok,
                   (coalesce(dup_line_char_frac, 0.0) <= 0.20) AS dup_line_char_ok,
                   (coalesce(top2gram_char_frac, 0.0) <= 0.20) AS top2gram_ok,
                   (coalesce(top3gram_char_frac, 0.0) <= 0.18) AS top3gram_ok,
                   (coalesce(top4gram_char_frac, 0.0) <= 0.16) AS top4gram_ok,
                   ((coalesce(dup_line_frac, 0.0) <= 0.30)
                    AND (coalesce(dup_line_char_frac, 0.0) <= 0.20)
                    AND (coalesce(top2gram_char_frac, 0.0) <= 0.20)
                    AND (coalesce(top3gram_char_frac, 0.0) <= 0.18)
                    AND (coalesce(top4gram_char_frac, 0.0) <= 0.16)) AS repetition_pass
            FROM s
            LEFT JOIN line_doc USING (doc_id)
            LEFT JOIN gram_doc USING (doc_id)
        """,
        "x4_census": """
            WITH n AS (
              SELECT source, coalesce(text, '') AS c,
                     trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS t
              FROM documents
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len(string_split(t, ' '))) AS BIGINT) AS n_tokens,
                   count(DISTINCT md5(t)) AS n_distinct,
                   round(avg(length(c)), 6) AS avg_chars,
                   round(1 - count(DISTINCT md5(t)) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
            FROM n GROUP BY source
        """,
        "x4_lm_quality": """
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')) AS t
              FROM documents
            ), tok AS (
              SELECT doc_id, unnest(string_split(t, ' ')) AS token
              FROM n WHERE t <> ''
            ), fit AS (
              SELECT token, count(*) AS cnt FROM tok
              WHERE doc_id % 2 = 0 GROUP BY token
            ), tot AS (
              SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM fit
            ), lm AS (
              SELECT token, round(ln(cnt / total), 7) AS lp FROM fit, tot
            ), j AS (
              SELECT t.doc_id, l.lp FROM tok t LEFT JOIN lm l USING (token)
            ), scored AS (
              SELECT doc_id, count(*) AS n_tokens,
                     CAST(sum(CASE WHEN lp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                     round(CAST(sum(CAST(coalesce(lp, -20.0) AS DECIMAL(28,7))) AS DOUBLE)
                           / count(*), 6) AS lm_score
              FROM j GROUP BY doc_id
            ), src AS (
              SELECT s.doc_id, s.n_tokens, s.n_oov, s.lm_score, d.source
              FROM scored s JOIN documents d USING (doc_id)
            ), cuts AS (
              SELECT source, quantile_cont(lm_score, 0.9) AS qh,
                     quantile_cont(lm_score, 0.3) AS qt
              FROM src GROUP BY source
            )
            SELECT doc_id, n_tokens, n_oov, lm_score, source,
                   CASE WHEN lm_score >= qh THEN 'head'
                        WHEN lm_score <= qt THEN 'tail'
                        ELSE 'middle' END AS lm_band
            FROM src JOIN cuts USING (source)
        """,
    }
