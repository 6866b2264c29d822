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
    if max_block is not None:
        ok = (
            slim.groupBy("_blk")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_block)
            .drop("_bn")
        )
        slim = slim.join(ok, "_blk")
    a = slim.select(
        F.col("_blk"),
        F.col(id_col).alias(f"a_{id_col}"),
        *[F.col(c).alias(f"a_{c}") for c in payload],
    )
    b = slim.select(
        F.col("_blk"),
        F.col(id_col).alias(f"b_{id_col}"),
        *[F.col(c).alias(f"b_{c}") for c in payload],
    )
    return (
        a.join(b, "_blk")
        .filter(F.col(f"a_{id_col}") < F.col(f"b_{id_col}"))
        .drop("_blk")
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

    return top_k_per_group(df, [entity_col], preference, 1).drop("rn")


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
