"""Multimodal columns (north-star surface): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
UDFs over mapInPandas.

The Spark-side plumbing — schema, partition-parallel batching, UDF
signatures, output contracts — is real and tested. The actual media codecs
are NOT available in this environment, so the decode step is a clearly
marked deterministic fake (media_fake_decode) plus a NotImplementedError
stub (media_decode_real) where a codec library would plug in.

Scale: mapInPandas streams Arrow batches through Python — memory is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob
sizes, and each partition decodes independently (1000 executors → 1000
parallel decoders; repartition upstream to size batches to codec memory).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "as_media_column",
    "media_fake_decode",
    "media_decode_real",
    "extract_features",
]

# The typed envelope for an opaque media blob: payload + metadata columns a
# catalog can prune/push down on without touching bytes.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def as_media_column(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Wrap a table's content as opaque media blobs (here: utf-8 bytes of
    the text stand in for encoded media — deterministic, codec-free)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(f"application/x-fake-{kind}").alias("mime"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def media_fake_decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """DETERMINISTIC FAKE decode for environments without codec libraries:
    features are byte-length, md5 of payload, and the first byte. The real
    decoder (media_decode_real) has the identical signature, so swapping it
    in changes nothing about the plan."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "payload_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
                "first_byte": pdf["payload"].map(
                    lambda b: int(b[0]) if len(b) else -1
                ).astype("int32"),
            }
        )


def media_decode_real(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Where PIL/libav/ffmpeg decoding would run (resize, frame-sample,
    spectrogram, ...). Not available in this container."""
    raise NotImplementedError(
        "media codecs (PIL/av) are not installed in this environment; "
        "use media_fake_decode for plumbing tests"
    )


def extract_features(media: DataFrame, decoder=media_fake_decode) -> DataFrame:
    """Run the decoder over Arrow batches, partition-parallel."""
    return media.mapInPandas(decoder, schema=FEATURE_SCHEMA)
