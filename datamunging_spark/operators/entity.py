"""Entity resolution / record linkage (X6 extension surface).

The classic three-stage shape — block, score, cluster — expressed
Spark-first:

1. **Blocking** bounds the candidate space: a self-equi-join on a cheap
   blocking key replaces the O(n²) all-pairs comparison with
   O(Σ_block |block|²). This is the record-linkage analog of LSH banding
   (dedup.py's MinHash pipeline) and shares its scale contract: NEVER a
   cross join; one shuffle on the block key; skewed (hot) blocks are
   ordinary join skew that AQE's skew split handles, plus an explicit
   ``max_block`` valve that drops pathological blocks (a block holding
   1% of a 100 TB corpus is a blocking-key bug, not a workload).
2. **Scoring** is pure JVM expression work (``levenshtein``,
   equality/containment predicates) inside whole-stage codegen — no
   Python in the hot path.
3. **Clustering** reuses :func:`~datamunging_spark.operators.dedup.
   connected_component_labels` (large-star/small-star, O(log n) rounds)
   so transitive matches (A≈B, B≈C ⇒ {A,B,C}) resolve to one entity,
   exactly like near-dup survivor selection.

No reference analog (README.md stops at exact joins); this is the
standard Splink/Dedupe.io-style workflow rebuilt on DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datamunging_spark.operators.dedup import connected_component_labels

__all__ = [
    "blocked_pairs",
    "sorted_neighborhood_pairs",
    "name_similarity",
    "cluster_entities",
    "resolve_entities",
    "canonical_records",
    "merge_entity_fields",
    "blocked_pairs_between",
    "incremental_resolve",
    "blocking_report",
]


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    block_key: Column,
    payload: list[str],
    max_block: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs within each blocking-key group.

    Returns one row per unordered pair (``a_<id> < b_<id>``) of records
    sharing ``block_key``, with each ``payload`` column present twice as
    ``a_<col>`` / ``b_<col>``. NULL block keys never match anything
    (SQL equi-join semantics), which is the conventional "missing
    blocking field ⇒ no candidates" rule.

    ``max_block`` drops blocks larger than the cap BEFORE the self-join
    (one count aggregate on the block key), bounding the worst block's
    pair fan-out at max_block²/2. Set ``None`` to disable.
    """
    slim = df.select(
        F.col(id_col), block_key.alias("_blk"), *payload
    ).filter(F.col("_blk").isNotNull())
    slim = _cap_blocks(slim, max_block)
    a = _prefix_select(slim, "a_", id_col, payload)
    b = _prefix_select(slim, "b_", id_col, payload)
    return (
        a.join(b, "_blk")
        .filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        .drop("_blk")
    )


def _cap_blocks(slim: DataFrame, max_block: int | None) -> DataFrame:
    """Drop blocks with more than ``max_block`` rows BEFORE any pair
    join (one count aggregate on ``_blk``); shared valve for the one- and
    two-sided blocking paths. ``None`` disables."""
    if max_block is None:
        return slim
    ok = (
        slim.groupBy("_blk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .filter(F.col("_bn") <= max_block)
        .drop("_bn")
    )
    return slim.join(ok, "_blk")


def _prefix_select(
    slim: DataFrame, prefix: str, id_col: str, payload: list[str]
) -> DataFrame:
    """``_blk`` + id/payload renamed under ``prefix`` — one side of a
    blocked pair join."""
    return slim.select(
        F.col("_blk"),
        F.col(id_col).alias(f"{prefix}{id_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_key: Column,
    payload: list[str],
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood (SNM) candidate pairs: order all records by
    ``sort_key``, pair each record with its next ``window - 1`` neighbors
    in that order. The classic complement to hash blocking
    (:func:`blocked_pairs`): a typo INSIDE the blocking key silently
    separates hash blocks, but usually leaves the record within a few
    sort positions of its duplicate. Run both, union the pair sets, and
    let the scorer decide.

    Scale shape: the global ordering comes from
    :func:`~datamunging_spark.operators.relational.global_row_number`
    (range partition + broadcast offsets — never a single-task window);
    neighbor pairing replicates each record ``window - 1`` times via a
    bounded ``explode`` and EQUI-joins on the target row number. Work is
    O(n · window) with an integer join key — no self cross join at any
    window size. Output matches :func:`blocked_pairs`: ``a_<col>`` /
    ``b_<col>`` with the a-side earlier in sort order.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from datamunging_spark.operators.relational import global_row_number

    slim = df.select(F.col(id_col), sort_key.alias("_sk"), *payload)
    rn = global_row_number(slim, ["_sk", id_col], out="_rn")
    a = rn.withColumn(
        "_off", F.explode(F.array(*[F.lit(i) for i in range(1, window)]))
    ).select(
        (F.col("_rn") + F.col("_off")).alias("_rnb"),
        F.col(id_col).alias(f"a_{id_col}"),
        *[F.col(c).alias(f"a_{c}") for c in payload],
    )
    b = rn.select(
        F.col("_rn").alias("_rnb"),
        F.col(id_col).alias(f"b_{id_col}"),
        *[F.col(c).alias(f"b_{c}") for c in payload],
    )
    return a.join(b, "_rnb").drop("_rnb")


def name_similarity(a: Column | str, b: Column | str) -> Column:
    """Normalized edit similarity: ``1 - levenshtein(a,b) /
    greatest(len(a), len(b))`` in [0, 1]; 1.0 iff equal (two empty
    strings score 1.0 by convention). JVM ``levenshtein`` — codegen'd,
    no UDF. NULL on either side propagates NULL (no-match)."""
    a, b = F.col(a) if isinstance(a, str) else a, (
        F.col(b) if isinstance(b, str) else b
    )
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(a, b) / denom
    )


def cluster_entities(
    records: DataFrame,
    matches: DataFrame,
    id_col: str,
    entity_col: str = "entity_id",
) -> DataFrame:
    """Assign every record an entity id from a matched-pair edge set.

    ``matches`` carries ``a_<id>`` / ``b_<id>`` edges (the filtered
    output of :func:`blocked_pairs`); connected components give each
    linked cluster the minimum member id as its label; records with no
    match become singleton entities labeled by their own id. One CC run
    + one left join — the exact survivor-selection shape of
    ``minhash_dedup``.
    """
    edges = matches.select(
        F.col(f"a_{id_col}").alias("id_a"), F.col(f"b_{id_col}").alias("id_b")
    )
    labels = connected_component_labels(edges).withColumnsRenamed(
        {"v": id_col, "component": "_ent"}
    )
    return records.join(labels, id_col, "left").withColumn(
        entity_col, F.coalesce(F.col("_ent"), F.col(id_col))
    ).drop("_ent")


def resolve_entities(
    df: DataFrame,
    id_col: str,
    block_key: Column,
    payload: list[str],
    match_cond: Column,
    entity_col: str = "entity_id",
    max_block: int | None = 10_000,
) -> DataFrame:
    """One-call block→score→cluster entity resolution.

    ``match_cond`` is a Column predicate over the ``a_<col>`` /
    ``b_<col>`` pair columns (e.g. ``name_similarity("a_name", "b_name")
    >= 0.8``). Returns ``df`` + ``entity_col``; downstream dedup is
    ``top_k_per_group``/``groupBy(entity_col)`` on the label.
    """
    pairs = blocked_pairs(df, id_col, block_key, payload, max_block)
    return cluster_entities(df, pairs.filter(match_cond), id_col, entity_col)


def canonical_records(
    df: DataFrame,
    entity_col: str,
    preference: list[Column],
) -> DataFrame:
    """Survivorship, rule 1 of 2: keep ONE whole record per entity, the
    first under the explicit ``preference`` ordering (e.g.
    ``[F.desc("updated_at"), F.asc("id")]`` — make it a total order with a
    unique tiebreak for determinism). One row_number window on the entity
    key — the top_k_per_group shape with k=1.
    """
    from datamunging_spark.operators.relational import top_k_per_group

    # Collision-safe rank name: a caller-owned "rn" column must survive.
    return top_k_per_group(
        df, [entity_col], preference, 1, rank_out="_cr_rn"
    ).drop("_cr_rn")


def merge_entity_fields(
    df: DataFrame,
    entity_col: str,
    fields: list[str],
    preference: list[Column],
) -> DataFrame:
    """Survivorship, rule 2 of 2: build one GOLDEN record per entity where
    each field independently takes its first NON-NULL value under the
    ``preference`` ordering — fresher-but-sparser records fill from older
    ones fieldwise instead of winning or losing wholesale.

    Deterministic in ONE hash aggregate (map-side combinable): per field,
    ``min`` over a (preference-keys, value) struct built only when the
    value is non-null — lexicographic struct comparison makes this "value
    at the minimum preference key among non-null rows" with no window, no
    second pass, and no reliance on ``first()``'s undefined agg order.
    ``preference`` columns must be ascending (wrap descending wishes as
    negations/inversions); NULL preference keys sort per Spark struct
    ordering.
    """
    aggs = []
    for f in fields:
        s = F.when(
            F.col(f).isNotNull(),
            F.struct(
                *[p.alias(f"_o{i}") for i, p in enumerate(preference)],
                F.col(f).alias("_v"),
            ),
        )
        aggs.append(F.min(s).getField("_v").alias(f))
    return df.groupBy(entity_col).agg(*aggs)


def blocked_pairs_between(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    block_key: Column,
    left_payload: list[str],
    right_payload: list[str],
    max_block: int | None = 10_000,
) -> DataFrame:
    """Cross-frame candidate pairs: every (left, right) record pair that
    shares ``block_key`` — the two-sided sibling of :func:`blocked_pairs`
    for matching a NEW batch against an existing reference set (no a<b
    dedup: the sides are distinct universes). Output columns are
    ``a_<col>`` from left and ``b_<col>`` from right.

    ``max_block`` caps the RIGHT (reference) side's block population —
    the side whose hot keys an incremental pipeline cannot re-key — by
    dropping oversized reference blocks before the join (one count agg).
    """
    a = _prefix_select(
        left.select(F.col(id_col), block_key.alias("_blk"), *left_payload)
        .filter(F.col("_blk").isNotNull()),
        "a_", id_col, left_payload,
    )
    b = _cap_blocks(
        _prefix_select(
            right.select(
                F.col(id_col), block_key.alias("_blk"), *right_payload
            ).filter(F.col("_blk").isNotNull()),
            "b_", id_col, right_payload,
        ),
        max_block,
    )
    return a.join(b, "_blk").drop("_blk")


def incremental_resolve(
    new_df: DataFrame,
    history: DataFrame,
    id_col: str,
    block_key: Column,
    payload: list[str],
    match_cond: Column,
    entity_col: str = "entity_id",
    max_block: int | None = 10_000,
) -> DataFrame:
    """Resolve a NEW batch of records against an already-resolved history
    WITHOUT re-clustering the history — the entity-resolution face of the
    repo's continuous-ingest contract (dedup.py's incremental operators):
    history cost is one blocked equi-join against its records, never a
    history self-join, and history labels are append-only facts.

    ``history`` carries its records plus their assigned ``entity_col``.
    Steps: (1) within-batch resolution (:func:`resolve_entities` — batch
    clusters labeled by min batch record id); (2) batch×history blocked
    pairs scored by the SAME ``match_cond``; (3) every batch cluster that
    matched history adopts the minimum matched history entity id —
    cluster-wide, so a record linked to history only transitively through
    a batch-mate still lands in the right entity; (4) unmatched clusters
    keep their batch-local label. Caller contract (mirrors the dedup
    snapshots): batch record ids must not collide with history entity
    ids, and the roll-forward is ``history ∪ resolved batch``.

    A batch cluster bridging TWO history entities adopts the minimum and
    the others are reported, not rewritten: the returned frame carries
    ``n_hist_matches`` (distinct history entities the cluster hit) so a
    merge-review queue can be ``filter(n_hist_matches > 1)`` — silent
    history rewrites are how incremental ER corrupts its own state.
    """
    within = resolve_entities(
        new_df, id_col, block_key, payload, match_cond,
        entity_col="_batch_ent", max_block=max_block,
    )
    cross = blocked_pairs_between(
        new_df, history, id_col, block_key, payload,
        [*payload, entity_col], max_block,
    )
    rec_matches = (
        cross.filter(match_cond)
        .select(
            F.col(f"a_{id_col}").alias(id_col),
            F.col(f"b_{entity_col}").alias("_hist_ent"),
        )
        .distinct()
    )
    cluster_adopt = (
        within.select(id_col, "_batch_ent")
        .join(rec_matches, id_col)
        .groupBy("_batch_ent")
        .agg(
            F.min("_hist_ent").alias("_cluster_ent"),
            F.countDistinct("_hist_ent").alias("_n_hist"),
        )
    )
    return (
        within.join(cluster_adopt, "_batch_ent", "left")
        .withColumn(
            entity_col,
            F.coalesce(F.col("_cluster_ent"), F.col("_batch_ent")),
        )
        .withColumn(
            "n_hist_matches",
            F.coalesce(F.col("_n_hist"), F.lit(0)).cast("long"),
        )
        .drop("_batch_ent", "_cluster_ent", "_n_hist")
    )


def blocking_report(
    df: DataFrame,
    block_key: Column,
    max_block: int | None = 10_000,
) -> DataFrame:
    """One-row diagnosis of a blocking key BEFORE running the pair join —
    the number that decides whether a key is usable and where to set the
    ``max_block`` valve: block count, size distribution (max/p50/p99),
    total candidate pairs the key implies (Σ n·(n-1)/2 — the actual cost
    driver), and how many blocks/pairs the valve at ``max_block`` would
    drop. NULL keys (which never match) are reported separately.

    Scale shape: one count aggregate on the block key + one global
    aggregate over the (distinct-key-sized) counts — same cost as the
    valve check blocked_pairs already runs, so profiling a key costs no
    more than using it.
    """
    counts = (
        df.select(block_key.alias("_blk"))
        .groupBy("_blk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    over = F.col("_blk").isNotNull() & (
        F.lit(max_block is not None) & (F.col("n") > (max_block or 0))
    )
    return counts.agg(
        F.sum(F.when(F.col("_blk").isNotNull(), 1).otherwise(0)).alias(
            "n_blocks"
        ),
        F.sum(F.when(F.col("_blk").isNull(), F.col("n")).otherwise(0)).alias(
            "n_null_rows"
        ),
        F.max(F.when(F.col("_blk").isNotNull(), F.col("n"))).alias(
            "max_block_size"
        ),
        F.expr("percentile(if(_blk is not null, n, null), 0.5)").alias(
            "p50_block_size"
        ),
        F.expr("percentile(if(_blk is not null, n, null), 0.99)").alias(
            "p99_block_size"
        ),
        F.sum(F.when(F.col("_blk").isNotNull(), pairs).otherwise(0)).alias(
            "candidate_pairs"
        ),
        F.sum(F.when(over, 1).otherwise(0)).alias("blocks_over_cap"),
        F.sum(F.when(over, pairs).otherwise(0)).alias("pairs_dropped_by_cap"),
    )
