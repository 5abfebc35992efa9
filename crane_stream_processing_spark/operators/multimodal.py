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
    "RESIZED_SCHEMA",
    "FRAME_SCHEMA",
    "as_media_column",
    "media_fake_decode",
    "media_decode_real",
    "extract_features",
    "resize_images",
    "sample_frames",
    "CHUNK_SCHEMA",
    "chunk_audio",
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
        # Null payloads (rows whose source column was NULL) decode as
        # empty media rather than crashing the worker.
        payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(len).astype("int64"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "first_byte": payloads.map(
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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Image resize plumbing (1 row in → 1 row out, new binary payload).
    The DETERMINISTIC FAKE 'decoder' nearest-neighbour-samples the payload
    bytes onto a width×height grid; a real build swaps the inner loop for
    PIL/cv2 (not installed here) with the identical mapInPandas contract."""

    def _resize(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        def grid(b: bytes) -> bytes:
            n = width * height
            if not len(b):
                # empty payload → empty pixels ("no image", not a fake
                # black frame of NULs): consistent with the frame-sample
                # and chunk operators' L=0 handling and with the oracle's
                # character-indexed rebuild, which yields '' for ''
                return b""
            # nearest-neighbour positions across the byte stream
            return bytes(b[(i * len(b)) // n] for i in range(n))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(
                        lambda b: grid(bytes(b) if b is not None else b"")
                    ),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing (1 row in → n rows out): the payload
    is split into ``n_frames`` contiguous chunks — frame i covers bytes
    [⌊i·L/n⌋, ⌊(i+1)·L/n⌋). A real build would demux/seek with libav under
    the same 1→N mapInPandas contract."""

    def _frames(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        rows = {"media_id": [], "frame_idx": [], "frame_len": [], "frame": []}
        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                L = len(b)
                for i in range(n_frames):
                    lo, hi = (i * L) // n_frames, ((i + 1) * L) // n_frames
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(hi - lo)
                    rows["frame"].append(b[lo:hi])
            yield pd.DataFrame(rows)
            rows = {k: [] for k in rows}

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("start_byte", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("chunk", T.BinaryType()),
    ]
)


def chunk_audio(media: DataFrame, chunk_bytes: int = 4096) -> DataFrame:
    """Audio segmentation plumbing (1 row in → ⌈L/chunk_bytes⌉ rows out):
    fixed-size contiguous byte windows — the shape a real build feeds to a
    VAD/resampler per chunk (libav not installed; the fake keeps raw
    bytes). Same 1→N mapInPandas contract as sample_frames; chunks of one
    blob stay inside one task, so downstream per-chunk decode is
    partition-parallel with no shuffle."""

    def _chunks(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        rows = {"media_id": [], "chunk_idx": [], "start_byte": [], "n_bytes": [], "chunk": []}
        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n = max((len(b) + chunk_bytes - 1) // chunk_bytes, 1)
                for i in range(n):
                    lo = i * chunk_bytes
                    hi = min(lo + chunk_bytes, len(b))
                    rows["media_id"].append(mid)
                    rows["chunk_idx"].append(i)
                    rows["start_byte"].append(lo)
                    rows["n_bytes"].append(hi - lo)
                    rows["chunk"].append(b[lo:hi])
            yield pd.DataFrame(rows)
            rows = {k: [] for k in rows}

    return media.mapInPandas(_chunks, schema=CHUNK_SCHEMA)
