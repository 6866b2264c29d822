"""Multimodal columns (X3): image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs (SURVEY.md north star), so the
*decode* step is a deterministic stand-in, but everything Spark-side is the
real production plumbing: a ``binary`` payload column with a metadata struct,
an explicit output schema, Arrow batch iteration, and a pure map (no shuffle)
over the corpus scan — the shape that holds at 100 TB because each task
streams its own input split through Python once.

Swap ``_fake_decode`` for PIL/libav calls without touching the plan.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def attach_binary_payload(
    df: DataFrame,
    text_col: str = "text",
    media_type: str = "image/x-fake",
    out: str = "payload",
) -> DataFrame:
    """Build an (opaque binary, metadata struct) column pair.

    In production the binary arrives from the source (parquet/tar shards of
    encoded media); here we derive a deterministic payload from the text
    column so the fixture is self-contained and oracle-checkable.
    """
    return df.withColumn(out, F.encode(F.col(text_col), "UTF-8")).withColumn(
        f"{out}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(F.col(out)).alias("n_bytes"),
        ),
    )


#: Output schema of extract_features — declared explicitly: mapInPandas
#: cannot infer, and the driver contract requires stability.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
) -> DataFrame:
    """Decode / feature-extract over binary payloads via ``mapInPandas``.

    ``decoder`` is the codec seam made concrete (r8): a picklable
    ``bytes -> (width, height)`` callable that rides to executors inside
    the closure and runs once per payload inside the Arrow batch loop —
    e.g. a PIL/turbojpeg decode (the importorskip-gated PIL golden test
    pins this path against real PNG bytes). ``None`` (default — the only
    option in this container, where no codec is installed) keeps the
    deterministic fake decode: "dimensions" derived from the byte length
    (width = ceil(sqrt(n)), height = ceil(n/width)). Either way the
    output lands in the SAME ``fake_width``/``fake_height`` columns
    (schema-stable for downstream consumers and the gate oracle; the
    names record that the DEFAULT is fake). First/last byte values are
    decoder-independent. Batches arrive as Arrow record batches; the
    iterator shape keeps peak memory to one batch regardless of
    partition size, and the decoder is loaded once per worker, never
    per row.
    """
    import math

    import pandas as pd

    meta_col = f"{payload_col}_meta"
    src = df.select(id_col, payload_col, F.col(f"{meta_col}.media_type").alias("_mt"))

    def run(batches):
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            if decoder is None:
                width = n_bytes.map(
                    lambda n: int(math.ceil(math.sqrt(n))) if n else 0
                )
                height = [
                    int(math.ceil(n / w)) if w else 0
                    for n, w in zip(n_bytes, width)
                ]
            else:
                dims = [
                    decoder(b) if b else (0, 0) for b in payloads
                ]
                width = [int(w) for w, _ in dims]
                height = [int(h) for _, h in dims]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": pdf["_mt"],
                    "n_bytes": n_bytes,
                    "first_byte": payloads.map(
                        lambda b: int(b[0]) if b else None
                    ),
                    "last_byte": payloads.map(
                        lambda b: int(b[-1]) if b else None
                    ),
                    "fake_width": width,
                    "fake_height": height,
                }
            )

    return src.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized", StringType()),  # binary in production
    ]
)


def resize_images(
    df: DataFrame,
    target: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize step plumbing: mapInPandas over binary payloads with a fixed
    output schema. The resample itself is a deterministic fake (aspect-
    preserving dimension math + a content digest standing in for pixels);
    production swaps the digest line for PIL `Image.resize` bytes.
    """
    import hashlib
    import math

    import pandas as pd

    src = df.select(id_col, payload_col)

    def run(batches):
        for pdf in batches:
            ws, hs, outs = [], [], []
            for b in pdf[payload_col]:
                n = len(b) if b is not None else 0
                w = int(math.ceil(math.sqrt(n))) if n else 0
                h = int(math.ceil(n / w)) if w else 0
                scale = target / max(w, h, 1)
                ws.append(min(w, max(1, round(w * scale))))
                hs.append(min(h, max(1, round(h * scale))))
                outs.append(hashlib.md5(b or b"").hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "out_width": ws,
                    "out_height": hs,
                    "resized": outs,
                }
            )

    return src.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one output row per
    sampled frame (uniform stride over the byte stream as the deterministic
    stand-in for timestamps). Row-explosion inside mapInPandas keeps the
    decode and the fan-out in one Python pass — the shape a real
    libav-backed sampler uses.
    """
    import pandas as pd

    src = df.select(id_col, payload_col)

    def run(batches):
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for doc, b in zip(pdf[id_col], pdf[payload_col]):
                n = len(b) if b is not None else 0
                for i in range(n_frames):
                    ids.append(doc)
                    idxs.append(i)
                    offs.append((i * n) // n_frames if n else 0)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_offset": offs}
            )

    return src.mapInPandas(run, FRAME_SCHEMA)


def _dhash64(grid72) -> int:
    """64-bit dHash of a 9×8 row-major grayscale grid: one bit per
    horizontally-adjacent pixel pair (left > right), MSB-first, packed
    as a SIGNED value for LongType. Module-level: shared by the Arrow
    batch loop and the driver-side property tests."""
    import numpy as np

    g = np.asarray(grid72, dtype=np.float64).reshape(8, 9)
    bits = (g[:, :8] > g[:, 1:]).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def _fake_gray72(b: bytes):
    """Deterministic fake decode: the byte stream bucketed into 72 equal
    spans, bucket means as 'pixels'. Each byte belongs to EXACTLY ONE
    span, so a single in-place substitution moves one bucket mean and
    can flip at most its two adjacent comparisons — ≤ 2 dHash bits, the
    property the hypothesis test pins."""
    import numpy as np

    n = len(b)
    if n == 0:
        return np.zeros(72)
    a = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
    bounds = (np.arange(73) * n) // 72
    sums = np.add.reduceat(a, np.minimum(bounds[:-1], n - 1))
    widths = np.diff(bounds)
    out = np.zeros(72)
    nz = widths > 0
    out[nz] = sums[nz] / widths[nz]
    return out


def phash_df(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    gray_decoder=None,
) -> DataFrame:
    """64-bit difference-hash (dHash) per binary payload — the standard
    perceptual image fingerprint (Krawetz's dHash; the pHash family's
    cheapest member): reduce the image to a 9×8 grayscale grid and emit
    one bit per horizontally-adjacent pixel pair (left > right). Near-
    identical images differ in a few bits; Hamming distance ≤ 3-10 is
    the published near-dup band.

    One Arrow ``mapInPandas`` pass over the corpus scan (the
    :func:`extract_features` shape — no shuffle, one decode per payload,
    numpy inside the batch loop). ``gray_decoder`` is the codec seam
    made concrete: a picklable ``bytes -> 8×9 row-major grayscale array
    (list/ndarray of 72 floats)`` — production decodes with
    PIL/turbojpeg and resizes to 9×8 grayscale (the importorskip golden
    pins that path). ``None`` (this container: no codecs) uses the
    deterministic fake decode: the byte stream bucketed into 72 equal
    spans, bucket means as "pixels" — small payload edits move a few
    bucket means, so planted near-identical payloads land within a few
    Hamming bits, which is exactly the property the banded join needs
    and what the pytest reference pins value-for-value.

    Output column is named ``sh`` so the 64-bit banding machinery
    (:func:`~datamunging_spark.operators.dedup.simhash_pairs` via
    ``_precomputed_sh`` — pigeonhole-exact recall at
    ``max_hamming <= bands-1``) consumes it unchanged. NULL/empty
    payloads hash to 0 (all-equal pixels) and dedup among themselves,
    the exact_dedup NULL-contract analog.
    """
    import pandas as pd

    src = df.select(id_col, payload_col)
    # schema carries the CALLER's id column (name AND type) — a
    # hardcoded doc_id/Long schema would break phash_pairs/phash_dedup
    # for any other id column (r12 review catch)
    schema = StructType(
        [src.schema[id_col], StructField("sh", LongType())]
    )

    def run(batches):
        for pdf in batches:
            hashes = []
            for b in pdf[payload_col]:
                raw = bytes(b) if b is not None else b""
                grid = (
                    _fake_gray72(raw)
                    if gray_decoder is None
                    else gray_decoder(raw)
                )
                hashes.append(_dhash64(grid))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "sh": pd.Series(hashes, dtype="int64")}
            )

    return src.mapInPandas(run, schema)


def phash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    gray_decoder=None,
) -> DataFrame:
    """Candidate near-duplicate IMAGE pairs at dHash Hamming distance ≤
    ``max_hamming`` — the multimodal-pipeline dedup leg: one Arrow hash
    pass (:func:`phash_df`), then the SimHash bit-band machinery
    verbatim (``dedup.simhash_pairs`` with ``_precomputed_sh``): split
    the 64-bit hash into ``bands`` chunks, equi-join docs sharing any
    chunk (pigeonhole: recall is EXACT for ``max_hamming <= bands-1``),
    verify with codegen ``bit_count(xor)``. Only (id, 8-byte hash) rows
    ever shuffle — payload bytes stay in their scan tasks, the "fp
    tables move, media doesn't" design at 100 TB.

    Returns (id_a < id_b, hamming). The hash table is
    ``localCheckpoint``-materialized (one Python pass feeds the banding
    explode and both candidate re-joins)."""
    from datamunging_spark.operators.dedup import simhash_pairs

    ph = phash_df(
        df, id_col=id_col, payload_col=payload_col,
        gray_decoder=gray_decoder,
    ).localCheckpoint()
    return simhash_pairs(
        df, id_col=id_col, max_hamming=max_hamming, bands=bands,
        _precomputed_sh=ph,
    )


def phash_dedup(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    gray_decoder=None,
) -> DataFrame:
    """Image near-dedup: one survivor (min id) per transitive cluster of
    payloads within ``max_hamming`` dHash bits — connected-component
    selection over :func:`phash_pairs` (the same O(log n) large-star/
    small-star labeling minhash_dedup/simhash_dedup use, with the same
    star/chain correctness argument). The loser id set is materialized
    before the anti-join; the corpus-sized payload column crosses no
    exchange at any stage."""
    from datamunging_spark.operators.dedup import (
        connected_component_labels,
    )

    pairs = phash_pairs(
        df, max_hamming=max_hamming, bands=bands, id_col=id_col,
        payload_col=payload_col, gray_decoder=gray_decoder,
    )
    comp = connected_component_labels(pairs)
    losers = (
        comp.filter(F.col("v") != F.col("component"))
        .select(F.col("v").alias(id_col))
        .localCheckpoint()
    )
    return df.join(losers, on=id_col, how="left_anti")


def phash_clusters(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    gray_decoder=None,
) -> DataFrame:
    """Label every payload with its image near-dup cluster id (the
    cluster's min id) instead of dropping losers — the analysis-side
    counterpart of :func:`phash_dedup` (the
    ``dedup.minhash_clusters`` convention): duplicate-density reports,
    survivor auditing, choosing per-cluster representatives by a custom
    rule (e.g. highest resolution once real decoders are plugged in).
    Payloads with no near-dup are their own singleton cluster."""
    from datamunging_spark.operators.dedup import (
        connected_component_labels,
    )

    pairs = phash_pairs(
        df, max_hamming=max_hamming, bands=bands, id_col=id_col,
        payload_col=payload_col, gray_decoder=gray_decoder,
    )
    comp = connected_component_labels(pairs).localCheckpoint()
    return df.join(
        comp.withColumnRenamed("v", id_col), on=id_col, how="left"
    ).withColumn(
        "cluster_id", F.coalesce(F.col("component"), F.col(id_col))
    ).drop("component")


def incremental_phash_dedup(
    new_df: DataFrame,
    hist_phash: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    gray_decoder=None,
    within_batch: bool = True,
    _return_survivor_hash: bool = False,
    _precomputed_hash: DataFrame | None = None,
):
    """Near-dedup a NEW media batch against a PRIOR corpus represented
    only by its dHash table — the multimodal leg of the continuous-
    ingest family (`incremental_dedup` exact / `incremental_minhash_dedup`
    fuzzy / span / semantic siblings): historical PAYLOADS are never
    rescanned; the snapshot is (id, 8-byte hash) — ~KB per thousand
    images, the slimmest snapshot in the family.

    Plan: hash the batch once (one Arrow pass), bit-band BOTH sides
    (``dedup._simhash_band_rows`` — expression-only over the snapshot,
    so band layout can be re-chosen later), equi-join history×batch on
    (band, chunk) — never a self-join over history — verify candidates
    with codegen ``bit_count(xor)`` ≤ ``max_hamming`` (recall EXACT by
    pigeonhole while ``max_hamming <= bands-1``, enforced by
    simhash_pairs' shared validation), anti-join the matched batch ids,
    then (default) the intra-batch :func:`phash_dedup` pass over the
    survivors' already-computed hashes. Batch payloads cross no
    exchange at any stage.

    Roll the snapshot forward by unioning the survivors' hash rows onto
    ``hist_phash`` — pass ``_return_survivor_hash=True`` to get them as
    a second return value from the SAME batch hashing (no re-decode),
    mirroring ``incremental_minhash_dedup(_return_survivor_sig=)``."""
    from datamunging_spark.operators.dedup import (
        _simhash_band_rows,
        connected_component_labels,
        simhash_pairs,
    )

    if not 1 <= bands <= 64 or 64 % bands != 0:
        raise ValueError(f"bands must divide 64, got {bands}")
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs bands >= {max_hamming + 1} "
            "for the pigeonhole recall guarantee"
        )
    if _precomputed_hash is not None:
        # same contract as simhash_pairs' _precomputed_sh: a phash_df
        # table over EXACTLY new_df (same decoder); caller owns
        # materialization — lets the caller overlap the batch hash pass
        # with the history snapshot build (guide §2.6)
        new_sh = _precomputed_hash
    else:
        new_sh = phash_df(
            new_df, id_col=id_col, payload_col=payload_col,
            gray_decoder=gray_decoder,
        ).localCheckpoint()  # feeds history banding, verify join, intra-batch
    nb = _simhash_band_rows(new_sh, id_col, bands).select(
        F.col(id_col).alias("_nid"), "_b", "_k"
    )
    hb = _simhash_band_rows(hist_phash, id_col, bands).select(
        F.col(id_col).alias("_hid"), "_b", "_k"
    )
    from datamunging_spark.operators.dedup import (
        _band_collision_pairs,
        _pair_values,
    )

    cand = _band_collision_pairs(nb, hb, "_nid", "_hid")
    losers = (
        _pair_values(
            cand, new_sh, hist_phash, id_col, "sh",
            "_nid", "_hid", "_sa", "_sb",
        )
        .filter(
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb")))
            <= max_hamming
        )
        .select(F.col("_nid").alias(id_col))
        .distinct()
        .localCheckpoint()
    )
    fresh = new_df.join(losers, on=id_col, how="left_anti")
    if within_batch:
        surv_sh = new_sh.join(losers, on=id_col, how="left_anti")
        pairs = simhash_pairs(
            fresh, id_col=id_col, max_hamming=max_hamming, bands=bands,
            _precomputed_sh=surv_sh,
        )
        comp = connected_component_labels(pairs)
        cc_losers = (
            comp.filter(F.col("v") != F.col("component"))
            .select(F.col("v").alias(id_col))
            .localCheckpoint()
        )
        fresh = fresh.join(cc_losers, on=id_col, how="left_anti")
    if _return_survivor_hash:
        fresh = fresh.localCheckpoint()
        surv = new_sh.join(
            fresh.select(id_col), on=id_col, how="left_semi"
        ).localCheckpoint()
        return fresh, surv
    return fresh


def decode_image_stub(*_args, **_kwargs):
    """Real image decode (PIL/turbojpeg) — NOT IMPLEMENTED in this container.

    Kept as an explicit seam: production replaces ``_fake`` feature columns
    by calling the codec inside ``extract_features``'s batch loop.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed; use extract_features's "
        "deterministic fake decode for plumbing tests"
    )
