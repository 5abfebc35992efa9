"""Multimodal columns (north-star surface): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched pandas
UDFs over mapInPandas.

The Spark-side plumbing — schema, partition-parallel batching, UDF
signatures, output contracts — is real and tested. For UNCOMPRESSED
formats the decode step is REAL too: RIFF/WAVE PCM audio and 24-bit BMP
images are parsed from their public specs with stdlib struct + numpy
(parse_wav_pcm / parse_bmp24, graded end-to-end by the
mm_wav_codec_roundtrip / mm_bmp_codec_roundtrip registry queries and
pinned by golden-byte fixtures). PNG — whose only compression is
zlib/DEFLATE, in the stdlib — is decoded for REAL too (encode_png /
decode_png_pixels: chunk+CRC walk, inflate, all five scanline filters).
Codecs needing external libraries (JPEG/MP3/H.264) are the remaining
boundary: a clearly marked deterministic fake (media_fake_decode) plus a
NotImplementedError stub (media_decode_real) where PIL/libav would plug
in.

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
    "WAV_FEATURE_SCHEMA",
    "BMP_FEATURE_SCHEMA",
    "encode_wav_pcm16",
    "parse_wav_pcm",
    "encode_bmp24",
    "parse_bmp24",
    "synthesize_wav",
    "decode_wav_pcm",
    "wav_energy_windows",
    "wav_features",
    "synthesize_bmp",
    "bmp_features",
    "decode_bmp24_pixels",
    "AHASH_SCHEMA",
    "ahash64",
    "bmp_ahash",
    "PNG_FEATURE_SCHEMA",
    "encode_png",
    "decode_png_pixels",
    "parse_png",
    "synthesize_png",
    "png_features",
    "png_ahash",
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


# ---------------------------------------------------------------------------
# Real uncompressed codecs (pure stdlib + numpy — no PIL/av needed)
#
# The container has no compressed-media libraries, but two ubiquitous
# UNCOMPRESSED container formats are fully decodable from their public
# specs with nothing beyond struct + numpy: RIFF/WAVE PCM audio and
# 24-bit BITMAPINFOHEADER BMP images. These make the decode hook REAL:
# encode→decode roundtrips run actual byte-level codec work (RIFF chunk
# walking, fmt parsing, BMP row padding + bottom-up order), graded
# against closed-form oracles. media_decode_real / NotImplementedError
# remains only for compressed codecs (JPEG/MP3/H.264).
# ---------------------------------------------------------------------------

WAV_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("bits", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
    ]
)

BMP_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("row_pad", T.LongType()),
        T.StructField("file_bytes", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)


def encode_wav_pcm16(samples, sample_rate: int) -> bytes:
    """Encode mono int16 PCM to a WAV container via the STDLIB ``wave``
    module — an independent, spec-conformant writer, so the hand-written
    parser below is graded against an implementation it doesn't share a
    line with."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_pcm(b: bytes):
    """Hand-written RIFF/WAVE PCM decoder core: walks the chunk list
    (word-aligned sizes per the RIFF spec), validates the PCM format tag,
    and numpy-decodes the data chunk. Returns ``(samples, meta)`` where
    ``samples`` is the int64 array of interleaved channel samples and
    ``meta`` = (sample_rate, n_channels, bits). Raises on non-RIFF,
    non-PCM, or truncated input (a fmt/data chunk whose declared size
    overruns the buffer)."""
    import struct as _struct

    import numpy as np

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        size = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + size]
        if cid in (b"fmt ", b"data") and len(body) != size:
            raise ValueError(
                f"truncated {cid.decode('ascii', 'replace').strip()} chunk: "
                f"declared {size} bytes, {len(body)} available"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = _struct.unpack("<HHI", fmt[:8])
    bits = _struct.unpack("<H", fmt[14:16])[0]
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return samples, (int(sample_rate), int(n_channels), int(bits))


def parse_wav_pcm(b: bytes) -> dict:
    """Aggregate features from the REAL decode (:func:`decode_wav_pcm`).

    Multichannel semantics: ``n_samples`` / ``duration_ms`` count FRAMES
    (one per sample instant across all channels), while ``peak`` /
    ``sum_abs`` span every interleaved channel sample — i.e. a stereo
    file's sum_abs includes both channels."""
    import numpy as np

    samples, (sample_rate, n_channels, bits) = decode_wav_pcm(b)
    n_frames = len(samples) // n_channels
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_samples": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate,
        "peak": int(samples.max()) if len(samples) else 0,
        "sum_abs": int(np.abs(samples).sum()),
    }


def encode_bmp24(rgb) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP:
    BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR byte order,
    rows zero-padded to 4-byte boundaries — the on-disk layout every BMP
    reader expects."""
    import struct as _struct

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    padding = b"\x00" * pad
    rows = [rgb[y, :, ::-1].tobytes() + padding for y in reversed(range(h))]
    return header + info + b"".join(rows)


def decode_bmp24_pixels(b: bytes):
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) int64 RGB array —
    the shared byte-level core of parse_bmp24 and the perceptual-hash
    path: validates the 'BM' magic, reads the pixel-array offset from the
    file header (not assumed 54), parses BITMAPINFOHEADER, and
    numpy-decodes the padded bottom-up BGR rows. Anything but the 24-bit
    uncompressed profile raises."""
    import struct as _struct

    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP stream")
    _file_size, _r1, _r2, offset = _struct.unpack("<IHHI", b[2:14])
    hdr_size, w, h, _planes, bpp, comp = _struct.unpack("<IiiHHI", b[14:34])
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    arr = np.frombuffer(b, dtype=np.uint8, offset=offset, count=stride * h)
    arr = arr.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[:, :, ::-1].astype(np.int64)


def parse_bmp24(b: bytes) -> dict:
    """Hand-written BMP decoder (the REAL image decoder) → per-image
    summary dict; byte-level work in :func:`decode_bmp24_pixels`."""
    rgb = decode_bmp24_pixels(b)
    h, w = rgb.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    return {
        "width": w,
        "height": h,
        "row_pad": stride - w * 3,
        "file_bytes": len(b),
        "sum_r": int(rgb[:, :, 0].sum()),
        "sum_g": int(rgb[:, :, 1].sum()),
        "sum_b": int(rgb[:, :, 2].sum()),
    }


# Shared Arrow-batched scaffolding for every real codec: one synthesis
# shape (doc_id → typed media envelope), one decode→features shape, one
# decode→aHash shape. A batch-handling fix lands once, and the next codec
# (the JPEG/MP3 boundary behind media_decode_real) is a two-line addition.
_SYNTH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _synthesize_media(docs: DataFrame, kind: str, mime: str, encode_of_id) -> DataFrame:
    def _synth(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "mime": mime,
                    "payload": [encode_of_id(i) for i in ids],
                }
            )

    return docs.select("doc_id").mapInPandas(_synth, schema=_SYNTH_SCHEMA)


def _decode_features(media: DataFrame, parse_fn, schema: T.StructType) -> DataFrame:
    def _decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            feats = [parse_fn(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].astype("int64").values)
            yield out

    return media.mapInPandas(_decode, schema=schema)


def _decode_ahash(media: DataFrame, pixels_fn) -> DataFrame:
    def _hash(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        for pdf in batches:
            rows = [ahash64(pixels_fn(bytes(p))) for p in pdf["payload"]]
            out = pd.DataFrame(rows, columns=["ahash_w0", "ahash_w1", "bits_set"])
            out.insert(0, "media_id", pdf["media_id"].astype("int64").values)
            yield out

    return media.mapInPandas(_hash, schema=AHASH_SCHEMA)


def _pcm_ramp(doc_id: int, n: int):
    """Deterministic int16 test signal: sample[i] = ((7·id + 13·i) mod
    512) − 256 — closed-form enough for a SQL oracle, irregular enough to
    catch byte-order/offset bugs."""
    import numpy as np

    i = np.arange(n, dtype=np.int64)
    return (((doc_id * 7 + i * 13) % 512) - 256).astype("<i2")


def synthesize_wav(docs: DataFrame) -> DataFrame:
    """doc_id → real WAV payload (stdlib encoder). Rate/length derive
    from doc_id: rate = 8000·(1 + id mod 3), n = 200 + (id mod 300)."""
    return _synthesize_media(
        docs,
        "audio",
        "audio/wav",
        lambda i: encode_wav_pcm16(
            _pcm_ramp(i, 200 + i % 300), 8000 * (1 + i % 3)
        ),
    )


def synthesize_wav_scaled(docs: DataFrame, gain: int = 2) -> DataFrame:
    """doc_id → real WAV of the SAME signal as synthesize_wav but with
    every sample multiplied by an integer ``gain`` — the louder
    re-encode of the same recording. int16 headroom holds exactly
    (_pcm_ramp spans ±256; gain=2 → ±512, no clipping), so windowed
    energies scale by exactly gain² and every energy-DELTA comparison
    is preserved — the algebra behind volume-invariant audio
    fingerprints (see mm_wav_volume_invariant_fp)."""
    return _synthesize_media(
        docs,
        "audio",
        "audio/wav",
        lambda i: encode_wav_pcm16(
            (gain * _pcm_ramp(i, 200 + i % 300)).astype("<i2"),
            8000 * (1 + i % 3),
        ),
    )


def synthesize_wav_perturbed(docs: DataFrame, window_frames: int = 8) -> DataFrame:
    """doc_id → real WAV of the SAME signal as synthesize_wav but with
    ONE energy window edited: the samples of window ``doc_id mod
    n_windows`` (n_windows = ⌈n/window_frames⌉) are doubled — a locally
    louder re-encode (one edit burst), exact in int16 headroom (ramp
    spans ±256, edit → ±512). Quadrupling one window's integer energy
    flips AT MOST TWO energy-delta comparisons (the edges w−1→w and
    w→w+1), so the edited file's fingerprint sits within Hamming
    distance 2 of the original's — the bound behind the banded near-dup
    join's pigeonhole guarantee (see mm_wav_fp_hamming_near_pairs)."""

    def _payload(i: int) -> bytes:
        n = 200 + i % 300
        s = _pcm_ramp(i, n)
        nw = (n + window_frames - 1) // window_frames
        k = i % nw
        s = s.copy()
        s[k * window_frames : (k + 1) * window_frames] *= 2
        return encode_wav_pcm16(s, 8000 * (1 + i % 3))

    return _synthesize_media(docs, "audio", "audio/wav", _payload)


def wav_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode: the UDF sees only payload bytes and
    must recover every feature by parsing the container."""
    return _decode_features(media, parse_wav_pcm, WAV_FEATURE_SCHEMA)


WAV_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def wav_energy_windows(media: DataFrame, window_frames: int = 64) -> DataFrame:
    """Windowed audio feature extraction over the REAL decode — the DSP
    shape every audio-curation pipeline runs (silence trimming, energy
    gating, VAD pre-filters): decode the payload with the hand-written
    RIFF parser, split the PCM into fixed ``window_frames`` windows (the
    trailing partial window kept), and emit per window the integer-exact
    sum of squares and peak plus RMS. 1→n_windows rows, Arrow-batched
    mapInPandas, zero shuffle — partition-parallel at any corpus size.

    Exactness: sum_sq and peak_abs are BIGINT (int16² ≤ 2³⁰, so even
    10⁶-frame windows stay far under 2⁶³); rms = sqrt(sum_sq/n) is left
    UNROUNDED — on identical exact integer inputs the division and the
    correctly-rounded IEEE sqrt are bit-identical in every engine, while
    a round() here would reopen the Python-banker's vs SQL-half-up tie
    hazard. Mono PCM only (the synthesized corpus); multichannel windows
    would need a per-channel explode."""

    def _decode(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import math

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("media_id", "win_idx", "n_frames", "sum_sq", "peak_abs", "rms")}
            for mid, p in zip(pdf["media_id"].astype("int64"), pdf["payload"]):
                samples, (_, n_channels, _) = decode_wav_pcm(bytes(p))
                if n_channels != 1:
                    raise ValueError("wav_energy_windows: mono PCM only")
                for w, start in enumerate(range(0, len(samples), window_frames)):
                    sl = samples[start : start + window_frames]
                    ssq = int((sl * sl).sum())
                    out["media_id"].append(int(mid))
                    out["win_idx"].append(w)
                    out["n_frames"].append(len(sl))
                    out["sum_sq"].append(ssq)
                    out["peak_abs"].append(int(np.abs(sl).max()))
                    out["rms"].append(math.sqrt(ssq / len(sl)))
            yield pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=WAV_ENERGY_SCHEMA)


def _rgb_grid(doc_id: int, w: int, h: int):
    """Deterministic RGB test image: r=(7x+3y+id)%256, g=(5x+11y+2id)%256,
    b=(x+y+3id)%256."""
    import numpy as np

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (x * 7 + y * 3 + doc_id) % 256
    g = (x * 5 + y * 11 + 2 * doc_id) % 256
    b = (x + y + 3 * doc_id) % 256
    return np.stack([r, g, b], axis=-1).astype("uint8")


def synthesize_bmp(docs: DataFrame) -> DataFrame:
    """doc_id → real BMP payload: w = 8 + id mod 9 (exercises every row-pad
    0..3), h = 4 + id mod 5."""
    return _synthesize_media(
        docs,
        "image",
        "image/bmp",
        lambda i: encode_bmp24(_rgb_grid(i, 8 + i % 9, 4 + i % 5)),
    )


def bmp_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL BMP decode (header-driven offset, padding,
    bottom-up) → per-image channel sums."""
    return _decode_features(media, parse_bmp24, BMP_FEATURE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash_w0", T.LongType()),
        T.StructField("ahash_w1", T.LongType()),
        T.StructField("bits_set", T.LongType()),
    ]
)


def ahash64(rgb) -> tuple[int, int, int]:
    """64-bit average hash (aHash) of a decoded RGB array — the classic
    perceptual image fingerprint (resize to 8×8, grayscale, threshold
    each cell at the mean): near-identical images differ in a few bits,
    so image dedup becomes Hamming distance over these codes — the
    binary-quantization recipe, applied to pixels. All-integer variant:
    grayscale = r+g+b (unweighted), NN downsample (source index
    (i·dim)//8), and the mean threshold cleared of its /64 division
    (bit = gray·64 > total) so every bit is exact integer arithmetic.
    Bits pack row-major (cell = y·8 + x) into two 32-bit words, never
    touching the int64 sign bit."""
    import numpy as np

    h, w = rgb.shape[:2]
    sy = (np.arange(8, dtype=np.int64) * h) // 8
    sx = (np.arange(8, dtype=np.int64) * w) // 8
    gray = rgb[sy][:, sx].sum(axis=2)  # (8, 8) int64, 0..765
    total = int(gray.sum())
    bits = (gray * 64 > total).flatten()  # cell = y*8 + x
    w0 = int(sum(1 << i for i in range(32) if bits[i]))
    w1 = int(sum(1 << i for i in range(32) if bits[32 + i]))
    return w0, w1, int(bits.sum())


# ---------------------------------------------------------------------------
# PNG: the first COMPRESSED codec in the real path. PNG's only compression
# is zlib/DEFLATE — in the Python stdlib — so unlike JPEG/MP3 it needs no
# external library: signature + chunk walk (length/type/CRC32), IHDR
# (8-bit truecolor profile), IDAT inflate, and the five-type scanline
# defilter (None/Sub/Up/Average/Paeth) are all implementable from the
# public spec (RFC 2083 / ISO 15948). The encoder deliberately CYCLES the
# filter type per scanline (y mod 5) so a roundtrip exercises every
# defilter branch, and splits the compressed stream across two IDAT
# chunks so multi-IDAT reassembly is on the graded path.
# ---------------------------------------------------------------------------

PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_chunks", T.LongType()),
        T.StructField("sum_r", T.LongType()),
        T.StructField("sum_g", T.LongType()),
        T.StructField("sum_b", T.LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct as _struct
    import zlib as _zlib

    return (
        _struct.pack(">I", len(body))
        + ctype
        + body
        + _struct.pack(">I", _zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    # PaethPredictor per the spec: a=left, b=above, c=upper-left.
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(rgb, color_type: int = 2) -> bytes:
    """Encode a uint8 pixel array as an 8-bit PNG using stdlib zlib
    only: color_type 2 = truecolor RGB from (h, w, 3), 0 = grayscale
    from (h, w), 6 = truecolor+alpha from (h, w, 4). Scanline filters
    cycle y mod 5 so every defilter branch (None/Sub/Up/Average/Paeth)
    is exercised by any image with h >= 5; the IDAT stream is split in
    two chunks."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    rgb = np.asarray(rgb, dtype=np.uint8)
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    if bpp == 1 and rgb.ndim == 2:
        rgb = rgb[:, :, None]
    if rgb.ndim != 3 or rgb.shape[2] != bpp:
        got = rgb.shape[2] if rgb.ndim == 3 else f"ndim={rgb.ndim}"
        raise ValueError(
            f"color_type {color_type} needs {bpp} channels, got {got}"
        )
    h, w = rgb.shape[:2]
    raw = bytearray()
    prior = bytes(w * bpp)
    for y in range(h):
        line = rgb[y].tobytes()
        ft = y % 5
        raw.append(ft)
        if ft == 0:  # None
            raw += line
        else:
            for i in range(len(line)):
                left = line[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                if ft == 1:  # Sub
                    pred = left
                elif ft == 2:  # Up
                    pred = up
                elif ft == 3:  # Average
                    pred = (left + up) // 2
                else:  # Paeth
                    pred = _paeth(left, up, ul)
                raw.append((line[i] - pred) & 0xFF)
        prior = line
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    z = _zlib.compress(bytes(raw), 6)
    mid = max(len(z) // 2, 1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", z[:mid])
        + _png_chunk(b"IDAT", z[mid:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(b: bytes):
    """Decode an 8-bit PNG to ((h, w, 3) int64 RGB, n_chunks): validates
    the signature and every chunk CRC32, accepts the bit-depth-8
    grayscale (color type 0), truecolor (2), and truecolor+alpha (6)
    profiles with deflate / filter-method-0 / non-interlaced, inflates
    the concatenated IDAT bodies, and reverses all five scanline filter
    types (filtering operates on the profile's own bytes-per-pixel).
    Grayscale replicates to 3 channels; alpha is stripped — the return
    is always RGB, so downstream fingerprints are profile-invariant for
    images that encode the same colors. Anything outside those
    profiles, a bad CRC, or a pixel-buffer size mismatch raises."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    if len(b) < len(_PNG_SIG) + 12 or b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = len(_PNG_SIG)
    ihdr = None
    idat = bytearray()
    n_chunks = 0
    ended = False
    while pos + 12 <= len(b) and not ended:
        (length,) = _struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        # one bound covers body AND the 4 CRC bytes, so a stream cut
        # mid-CRC raises ValueError, not struct.error (round-8 advice)
        if pos + 12 + length > len(b):
            raise ValueError(f"truncated {ctype!r} chunk")
        body = b[pos + 8 : pos + 8 + length]
        (crc,) = _struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if crc != (_zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        n_chunks += 1
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
        pos += 12 + length
    if ihdr is None or not idat or not ended:
        raise ValueError("missing IHDR/IDAT/IEND chunk")
    w, h, depth, ctype_n, comp, filt, interlace = _struct.unpack(">IIBBBBB", ihdr)
    if (
        depth != 8
        or ctype_n not in (0, 2, 6)
        or comp != 0
        or filt != 0
        or interlace != 0
    ):
        raise ValueError(
            f"unsupported PNG profile (depth={depth}, color={ctype_n}, "
            f"comp={comp}, filter={filt}, interlace={interlace})"
        )
    raw = _zlib.decompress(bytes(idat))
    bpp = {0: 1, 2: 3, 6: 4}[ctype_n]
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise ValueError("pixel buffer size mismatch")
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (1 + stride)]
        line = bytearray(raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)])
        if ft == 0:
            pass
        elif ft == 2:  # Up — no intra-row dependency: one vector add
            line = bytearray(
                (
                    (np.frombuffer(bytes(line), dtype=np.uint8).astype(np.int64)
                     + prior)
                    & 0xFF
                ).astype(np.uint8).tobytes()
            )
        elif ft == 1:
            # Sub — out[i] = raw[i] + out[i-bpp]: a per-channel-lane
            # prefix sum, and prefix sums commute with mod-256, so the
            # sequential dependence vectorizes exactly: cumsum each of
            # the bpp interleaved lanes in int64, then wrap once.
            lanes = (
                np.frombuffer(bytes(line), dtype=np.uint8)
                .astype(np.int64)
                .reshape(-1, bpp)
            )
            line = bytearray(
                (np.cumsum(lanes, axis=0) & 0xFF)
                .astype(np.uint8)
                .tobytes()
            )
        elif ft in (3, 4):
            # Average/Paeth stay per-byte: their predictors mix the
            # prior ROW through floor-div / a branching min, which does
            # not distribute over prefix sums — the irreducible
            # sequential tail (parallelism comes from Arrow batching
            # across images, tools/scale_probe.py --png).
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                up = int(prior[i])
                ul = int(prior[i - bpp]) if i >= bpp else 0
                if ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = _paeth(left, up, ul)
                line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ft}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prior = out[y]
    px = out.reshape(h, w, bpp)
    if ctype_n == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype_n == 6:
        px = px[:, :, :3]
    return px, n_chunks


def parse_png(b: bytes) -> dict:
    """REAL PNG decode (:func:`decode_png_pixels`) → per-image summary:
    dimensions, chunk count (multi-IDAT proof), RGB channel sums."""
    rgb, n_chunks = decode_png_pixels(b)
    h, w = rgb.shape[:2]
    return {
        "width": w,
        "height": h,
        "n_chunks": n_chunks,
        "sum_r": int(rgb[:, :, 0].sum()),
        "sum_g": int(rgb[:, :, 1].sum()),
        "sum_b": int(rgb[:, :, 2].sum()),
    }


def _png_pixels(b: bytes):
    return decode_png_pixels(b)[0]


def synthesize_png(docs: DataFrame) -> DataFrame:
    """doc_id → real PNG payload over the SAME deterministic RGB grid as
    synthesize_bmp (w = 8 + id mod 9, h = 4 + id mod 5), so BMP and PNG
    decodes of one document must agree pixel-for-pixel and the BMP
    oracles carry over unchanged."""
    return _synthesize_media(
        docs,
        "image",
        "image/png",
        lambda i: encode_png(_rgb_grid(i, 8 + i % 9, 4 + i % 5)),
    )


def png_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL PNG decode (CRC walk, inflate, 5-type
    defilter) → per-image dimensions + channel sums."""
    return _decode_features(media, parse_png, PNG_FEATURE_SCHEMA)


def synthesize_png_perturbed(docs: DataFrame) -> DataFrame:
    """doc_id → real PNG of the SAME grid as synthesize_png but with ONE
    pixel edited: the red channel of pixel (0,0) — the source pixel the
    8×8 aHash downsample samples for cell (0,0), and for every other
    cell whose NN coordinates ((x·w)//8, (y·h)//8) also land on (0,0)
    (h < 8 maps two cell rows onto source row 0) — shifted by +128
    mod 256. The minimal 'slightly edited re-crawl' twin: its aHash
    lands a SMALL Hamming distance from the original's (the edited
    cells plus any cells whose mean-threshold margin the shifted total
    crosses; measured at sf0.01 the distances spread 0..6 with ~78%
    within 3), so it exercises near-duplicate detection rather than
    exact equality. Closed-form enough for the SQL oracle: only the
    sampled-(0,0) red term changes."""

    def _perturbed(i: int):
        import numpy as np  # noqa: F401 — grid already numpy

        g = _rgb_grid(i, 8 + i % 9, 4 + i % 5).copy()
        g[0, 0, 0] = (int(g[0, 0, 0]) + 128) % 256
        return encode_png(g)

    return _synthesize_media(docs, "image", "image/png", _perturbed)


def png_ahash(media: DataFrame) -> DataFrame:
    """REAL compressed-codec decode → perceptual hash: inflate + defilter
    each PNG payload (decode_png_pixels) and emit its aHash words — the
    identical fingerprint bmp_ahash computes from the uncompressed
    container, so cross-codec image dedup is a plain equi-join on
    (ahash_w0, ahash_w1). Partition-parallel, zero shuffle."""
    return _decode_ahash(media, _png_pixels)


def bmp_ahash(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode → perceptual hash: parse each BMP
    payload byte-for-byte (decode_bmp24_pixels) and emit its aHash words
    — the multimodal dedup key. Partition-parallel, zero shuffle."""
    return _decode_ahash(media, decode_bmp24_pixels)


def mixed_media_ahash(media: DataFrame) -> DataFrame:
    """MIXED landing zone → one fingerprint column: a real corpus drop
    never arrives in a single container, so the decode stage dispatches
    per row on the ``mime`` column (image/bmp → decode_bmp24_pixels,
    image/png → the CRC-walk/inflate/defilter chain) and emits the SAME
    all-integer 64-bit aHash for every asset. Codec invariance
    (mm_png_ahash's graded property) is what makes this well-defined:
    the hash depends on pixels, not on which decoder produced them, so
    one equi-join key covers the whole heterogeneous corpus. Unknown
    mimes raise (a silent skip would hide corpus corruption).
    Arrow-batched mapInPandas, zero shuffle."""

    def _hash(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import pandas as pd

        def pixels(mime: str, p: bytes):
            if mime == "image/bmp":
                return decode_bmp24_pixels(p)
            if mime == "image/png":
                return _png_pixels(p)
            raise ValueError(f"no decoder for mime {mime!r}")

        for pdf in batches:
            rows = [
                ahash64(pixels(m, bytes(p)))
                for m, p in zip(pdf["mime"], pdf["payload"])
            ]
            out = pd.DataFrame(
                rows, columns=["ahash_w0", "ahash_w1", "bits_set"]
            )
            out.insert(0, "media_id", pdf["media_id"].astype("int64").values)
            yield out

    return media.mapInPandas(_hash, schema=AHASH_SCHEMA)
