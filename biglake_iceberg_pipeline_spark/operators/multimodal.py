"""Multimodal (image/audio/video) column plumbing.

Design for 100 TB of media: payloads are opaque ``binary`` columns
with typed metadata alongside; decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes stream through Python in
columnar batches (never row-at-a-time pickling), and the schema
contract is explicit so downstream Spark operators stay declarative.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container —
``decode_image`` is a clearly-marked deterministic stub; the Spark
plumbing (schema, batching, partitioning) is real and tested, and a
real decoder drops in by replacing one function.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

FEATURE_DIM = 8

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def decode_image(payload: bytes) -> list[float]:
    """STUB — deterministic fake decoder.

    A real implementation would be `np.asarray(PIL.Image.open(...))` →
    resize → embed. The container has no image libs, so we emit a
    deterministic byte-statistics vector with the same shape contract.
    Raises on None to mirror a real decoder's behavior on corrupt rows.
    """
    if payload is None:
        raise NotImplementedError("no payload; real decoder would raise")
    n = len(payload)
    if n == 0:
        return [0.0] * FEATURE_DIM
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload) % 997),
        float(min(payload)),
        float(max(payload)),
        float(payload[n // 2]),
        float(n % 251),
    ]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each partition streams pandas batches; feature
    vectors come back as a typed array column. Partitioning carries
    over from the input, so co-locating by media_id upstream makes the
    downstream join shuffle-free.
    """

    def _extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "features": pdf["payload"].map(
                        lambda b: None if b is None else decode_image(bytes(b))
                    ),
                }
            )
            yield out

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a fake media payload so
    the plumbing is exercisable on the driver tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
    )
