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


def decode_image_stub(*_args, **_kwargs):
    """Real image decode (PIL/turbojpeg) — NOT IMPLEMENTED in this container.

    Kept as an explicit seam: production replaces ``_fake`` feature columns
    by calling the codec inside ``extract_features``'s batch loop.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed; use extract_features's "
        "deterministic fake decode for plumbing tests"
    )
