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
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode / feature-extract over binary payloads via ``mapInPandas``.

    Deterministic fake decode: "dimensions" derived from the byte length
    (width = ceil(sqrt(n)), height = ceil(n/width)) plus first/last byte
    values — stand-ins for a real decoder's (width, height, channels).
    Batches arrive as Arrow record batches; the iterator shape keeps peak
    memory to one batch regardless of partition size.
    """
    import math

    import pandas as pd

    meta_col = f"{payload_col}_meta"
    src = df.select(id_col, payload_col, F.col(f"{meta_col}.media_type").alias("_mt"))

    def run(batches):
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            width = n_bytes.map(lambda n: int(math.ceil(math.sqrt(n))) if n else 0)
            height = [
                int(math.ceil(n / w)) if w else 0 for n, w in zip(n_bytes, width)
            ]
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


def decode_image_stub(*_args, **_kwargs):
    """Real image decode (PIL/turbojpeg) — NOT IMPLEMENTED in this container.

    Kept as an explicit seam: production replaces ``_fake`` feature columns
    by calling the codec inside ``extract_features``'s batch loop.
    """
    raise NotImplementedError(
        "image/audio codecs are not installed; use extract_features's "
        "deterministic fake decode for plumbing tests"
    )
