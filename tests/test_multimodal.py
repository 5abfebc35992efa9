"""Multimodal plumbing tests: typed binary envelope, Arrow-batched decode,
resize and frame-sample contracts (the codec itself is a deterministic
fake — media_decode_real raises until PIL/libav exist)."""

from __future__ import annotations

import hashlib

import pytest

from crane_stream_processing_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "abcdefgh" * 4), (3, "")],
        "doc_id long, text string",
    )
    return M.as_media_column(df, "doc_id", "text", kind="image")


def test_envelope_schema_and_bytes(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in M.MEDIA_SCHEMA.fields
    ]
    r = {x.media_id: x for x in media.collect()}
    assert bytes(r[1].payload) == b"hello world"
    assert r[2].n_bytes == 32 and r[3].n_bytes == 0


def test_fake_decode_features(media):
    feats = {r.media_id: r for r in M.extract_features(media).collect()}
    assert feats[1].payload_md5 == hashlib.md5(b"hello world").hexdigest()
    assert feats[1].first_byte == ord("h")
    assert feats[3].first_byte == -1  # empty payload


def test_resize_fixed_grid(media):
    out = {r.media_id: r for r in M.resize_images(media, 4, 4).collect()}
    for mid, r in out.items():
        assert (r.width, r.height) == (4, 4)
        assert len(bytes(r.pixels)) == (0 if mid == 3 else 16)
    # nearest-neighbour sample of 'hello world' (11 bytes) onto 16 cells
    assert bytes(out[1].pixels) == bytes(
        b"hello world"[(i * 11) // 16] for i in range(16)
    )
    # empty payload → empty pixels ("no image", not a fake NUL frame —
    # matches the oracle's char-indexed rebuild of '')
    assert bytes(out[3].pixels) == b""


def test_frame_sample_partition(media):
    frames = M.sample_frames(media, n_frames=4).collect()
    by_id: dict[int, list] = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f)
    assert {len(v) for v in by_id.values()} == {4}
    # frames reassemble the original payload exactly
    joined = b"".join(
        bytes(f.frame) for f in sorted(by_id[2], key=lambda f: f.frame_idx)
    )
    assert joined == b"abcdefgh" * 4


def test_real_decoder_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        M.media_decode_real(iter([]))


# ---------------------------------------------------------------------------
# Real uncompressed codecs (WAV PCM / BMP24) — golden-byte spec pins
# ---------------------------------------------------------------------------


def _golden_wav() -> bytes:
    """Hand-assembled RIFF/WAVE from the spec (NOT via our encoder or the
    stdlib writer): 3 mono 16-bit samples [100, -200, 300] at 8000 Hz,
    with an extra non-fmt/data chunk the parser must skip."""
    import struct

    data = struct.pack("<3h", 100, -200, 300)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size → pad
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + junk
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_parser_golden_bytes():
    f = M.parse_wav_pcm(_golden_wav())
    assert f == {
        "sample_rate": 8000,
        "n_channels": 1,
        "bits": 16,
        "n_samples": 3,
        "duration_ms": 0,
        "peak": 300,
        "sum_abs": 600,
    }


def test_wav_parser_rejects_non_pcm():
    import struct

    bad = _golden_wav().replace(
        b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16),
        b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16),
    )
    with pytest.raises(ValueError, match="unsupported WAV"):
        M.parse_wav_pcm(bad)
    with pytest.raises(ValueError, match="RIFF"):
        M.parse_wav_pcm(b"\x89PNG not audio")


def test_wav_roundtrip_stdlib_writer_to_our_parser():
    import numpy as np

    samples = np.array([0, 32767, -32768, 5], dtype="<i2")
    f = M.parse_wav_pcm(M.encode_wav_pcm16(samples, 44100))
    assert f["sample_rate"] == 44100 and f["n_samples"] == 4
    assert f["peak"] == 32767 and f["sum_abs"] == 0 + 32767 + 32768 + 5


def test_wav_parser_rejects_truncated_data_chunk():
    # A data chunk whose declared size overruns the buffer must raise, not
    # silently yield fewer samples (round-4 ADVICE item).
    good = M.encode_wav_pcm16([100, 200, 300], 8000)
    truncated = good[:-2]  # drop one sample; declared size now overruns
    with pytest.raises(ValueError, match="truncated data chunk"):
        M.parse_wav_pcm(truncated)
    # Same for an fmt chunk cut short mid-file.
    fmt_pos = good.index(b"fmt ")
    with pytest.raises(ValueError, match="truncated fmt chunk"):
        M.parse_wav_pcm(good[: fmt_pos + 8 + 10])


def test_wav_parser_multichannel_frame_vs_sample_semantics():
    # Stereo: n_samples/duration_ms count frames; peak/sum_abs span all
    # interleaved channel samples (documented semantics).
    import io
    import wave

    import numpy as np

    interleaved = np.array([10, -20, 30, -40], dtype="<i2")  # 2 frames
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(1000)
        w.writeframes(interleaved.tobytes())
    f = M.parse_wav_pcm(buf.getvalue())
    assert f["n_channels"] == 2 and f["n_samples"] == 2
    assert f["duration_ms"] == 2 * 1000 // 1000
    assert f["peak"] == 30 and f["sum_abs"] == 10 + 20 + 30 + 40


def _golden_bmp() -> bytes:
    """Hand-assembled 2×2 24-bit BMP from the spec: pixels (row-major,
    top-down logical order) [[red, green], [blue, white]]; stored
    bottom-up, BGR, rows padded from 6 to 8 bytes; pixel offset read from
    the file header (set to 54)."""
    import struct

    header = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
    bottom_row = b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"  # blue, white
    top_row = b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"  # red, green
    return header + info + bottom_row + top_row


def test_bmp_parser_golden_bytes():
    f = M.parse_bmp24(_golden_bmp())
    # red + green + blue + white, channel-wise
    assert f == {
        "width": 2,
        "height": 2,
        "row_pad": 2,
        "file_bytes": 70,
        "sum_r": 255 + 0 + 0 + 255,
        "sum_g": 0 + 255 + 0 + 255,
        "sum_b": 0 + 0 + 255 + 255,
    }


def test_bmp_parser_rejects_unsupported():
    import struct

    b = bytearray(_golden_bmp())
    b[28:30] = struct.pack("<H", 8)  # bpp 24 → 8
    with pytest.raises(ValueError, match="unsupported BMP"):
        M.parse_bmp24(bytes(b))
    with pytest.raises(ValueError, match="not a BMP"):
        M.parse_bmp24(b"GIF89a")


def test_bmp_roundtrip_every_padding(spark):
    import numpy as np

    for w in range(8, 17):  # row_pad cycles 0..3
        rgb = M._rgb_grid(7, w, 5)
        f = M.parse_bmp24(M.encode_bmp24(rgb))
        assert f["width"] == w and f["height"] == 5
        assert f["row_pad"] == (4 - (w * 3) % 4) % 4
        assert f["sum_r"] == int(rgb[:, :, 0].astype(np.int64).sum())


def test_wav_energy_windows_cover_all_samples(spark):
    """Window features must partition the decoded PCM exactly: window
    sum_sq totals equal the whole-file energy, frame counts rebuild the
    file length, and the trailing partial window is kept."""
    import numpy as np

    docs = spark.createDataFrame([(3,), (7,)], "doc_id long")
    media = M.synthesize_wav(docs)
    rows = M.wav_energy_windows(media, window_frames=64).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for did, rs in by_id.items():
        n = 200 + did % 300
        samples = (((did * 7 + np.arange(n, dtype=np.int64) * 13) % 512) - 256)
        assert sum(r.n_frames for r in rs) == n
        assert sum(r.sum_sq for r in rs) == int((samples * samples).sum())
        assert max(r.peak_abs for r in rs) == int(np.abs(samples).max())
        idxs = sorted(r.win_idx for r in rs)
        assert idxs == list(range(len(rs)))
        last = max(rs, key=lambda r: r.win_idx)
        assert last.n_frames == (n % 64 or 64)
        for r in rs:
            assert abs(r.rms - (r.sum_sq / r.n_frames) ** 0.5) < 1e-12


def test_wav_energy_windows_rejects_multichannel(spark):
    import io
    import wave

    import numpy as np
    import pytest as _pytest

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.array([1, 2, 3, 4], dtype="<i2").tobytes())
    payload = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(payload))],
        "media_id long, kind string, mime string, payload binary",
    )
    with _pytest.raises(Exception, match="mono PCM only"):
        M.wav_energy_windows(media).collect()


# ---------------------------------------------------------------------------
# PNG (compressed codec: stdlib zlib DEFLATE + 5-type scanline defilter)
# ---------------------------------------------------------------------------

def test_png_roundtrip_matches_bmp_pixels():
    """One RGB grid, two containers: the PNG decode (inflate + defilter)
    must agree pixel-for-pixel with the BMP decode, and therefore hash-
    identically — the codec-invariance contract mm_png_ahash grades."""
    import numpy as np

    for did in (0, 3, 7, 11):
        w, h = 8 + did % 9, 4 + did % 5
        rgb = M._rgb_grid(did, w, h)
        png_px, n_chunks = M.decode_png_pixels(M.encode_png(rgb))
        bmp_px = M.decode_bmp24_pixels(M.encode_bmp24(rgb))
        assert (png_px == bmp_px).all()
        assert (png_px == rgb.astype(np.int64)).all()
        assert n_chunks == 4  # IHDR + IDAT x2 + IEND
        assert M.ahash64(png_px) == M.ahash64(bmp_px)


def test_png_every_filter_type_roundtrips():
    """The encoder cycles scanline filters y mod 5, so any h >= 5 image
    puts None/Sub/Up/Average/Paeth all on the wire; decode must invert
    each branch exactly."""
    rgb = M._rgb_grid(5, 16, 10)
    decoded, _ = M.decode_png_pixels(M.encode_png(rgb))
    assert (decoded == rgb).all()


def test_png_rejects_corruption_and_foreign_bytes():
    import pytest as _pytest

    rgb = M._rgb_grid(2, 9, 6)
    good = M.encode_png(rgb)
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0xFF  # inside a chunk body or CRC
    with _pytest.raises(ValueError):
        M.decode_png_pixels(bytes(bad))
    with _pytest.raises(ValueError, match="not a PNG"):
        M.decode_png_pixels(b"BM" + good)
    # truncated stream (IEND lost)
    with _pytest.raises(ValueError):
        M.decode_png_pixels(good[:-12])
    # cut mid-CRC (chunk header + body present, CRC bytes clipped — drop
    # IEND's 12 bytes plus 2 bytes of the last IDAT's CRC) must be
    # ValueError, not struct.error (round-8 advice)
    with _pytest.raises(ValueError, match="truncated"):
        M.decode_png_pixels(good[:-14])
    # wrong array rank for the color type raises ValueError, not
    # IndexError (round-8 advice)
    with _pytest.raises(ValueError, match="channels"):
        M.encode_png(rgb[:, :, 0], color_type=2)


def test_mixed_media_ahash_dispatches_and_rejects_unknown(spark):
    """The mime-dispatched decoder fingerprints a heterogeneous BMP+PNG
    batch identically to the per-codec paths, and an unknown mime fails
    loudly instead of silently skipping."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(7,), (8,)], "doc_id long")
    bmp = M.synthesize_bmp(docs)
    png = M.synthesize_png(docs).withColumn(
        "media_id", F.col("media_id") + 100
    )
    mixed = M.mixed_media_ahash(bmp.unionByName(png)).collect()
    got = {r.media_id: (r.ahash_w0, r.ahash_w1) for r in mixed}
    # codec invariance: doc d's BMP hash == doc d's PNG hash
    assert got[7] == got[107] and got[8] == got[108]
    bad = bmp.withColumn("mime", F.lit("image/jpeg"))
    with _pytest.raises(Exception, match="no decoder"):
        M.mixed_media_ahash(bad).collect()


def test_png_golden_bytes():
    """Pin the encoder's byte layout: signature, IHDR fields, and the
    decode of a hand-assembled minimal PNG (single IDAT, filter 0 only)
    built independently of encode_png."""
    import struct
    import zlib

    import numpy as np

    # hand-assembled 2x2 image, filter type 0 rows
    px = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    raw = b"\x00" + px[0].tobytes() + b"\x00" + px[1].tobytes()

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    blob = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    decoded, n_chunks = M.decode_png_pixels(blob)
    assert (decoded == px.astype(np.int64)).all()
    assert n_chunks == 3
    # and our encoder's header parses to the same profile
    ours = M.encode_png(px)
    assert ours[:8] == b"\x89PNG\r\n\x1a\n"
    w, h, depth, ct = struct.unpack(">IIBB", ours[16:26])
    assert (w, h, depth, ct) == (2, 2, 8, 2)


def test_png_ahash_spark_path(spark):
    """End-to-end Spark plumbing: synthesize -> mapInPandas decode ->
    aHash rows equal the BMP path's for the same ids."""
    docs = spark.createDataFrame([(1,), (9,), (13,)], "doc_id long")
    png_rows = {
        r.media_id: (r.ahash_w0, r.ahash_w1, r.bits_set)
        for r in M.png_ahash(M.synthesize_png(docs)).collect()
    }
    bmp_rows = {
        r.media_id: (r.ahash_w0, r.ahash_w1, r.bits_set)
        for r in M.bmp_ahash(M.synthesize_bmp(docs)).collect()
    }
    assert png_rows == bmp_rows and len(png_rows) == 3


def test_png_grayscale_and_rgba_profiles():
    """Profile widening: grayscale (color type 0) replicates to RGB,
    truecolor+alpha (6) strips alpha — the returned pixels are always
    RGB, so fingerprints are profile-invariant for equal colors. Both
    profiles defilter with their own bytes-per-pixel (h >= 5 puts all
    five filters on the wire)."""
    import numpy as np

    rgb = M._rgb_grid(3, 16, 10)
    gray = (rgb.sum(axis=2) % 256).astype(np.uint8)
    dec0, _ = M.decode_png_pixels(M.encode_png(gray, color_type=0))
    assert dec0.shape == (10, 16, 3)
    for c in range(3):
        assert (dec0[:, :, c] == gray).all()
    alpha = ((np.arange(10)[:, None] * 37 + np.arange(16)[None, :]) % 256)
    rgba = np.dstack([rgb, alpha.astype(np.uint8)])
    dec6, _ = M.decode_png_pixels(M.encode_png(rgba, color_type=6))
    assert (dec6 == rgb).all()
    # same colors, three containers -> one fingerprint
    assert M.ahash64(dec6) == M.ahash64(
        M.decode_png_pixels(M.encode_png(rgb))[0]
    )
    # palette PNGs (color type 3) stay outside the profile, explicitly
    import struct
    bad = bytearray(M.encode_png(rgb))
    # color type byte lives at offset 8(sig)+8(len+type)+9 in IHDR
    with pytest.raises(ValueError, match="unsupported PNG profile"):
        hdr = struct.pack(">IIBBBBB", 16, 10, 8, 3, 0, 0, 0)
        import zlib
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(hdr)) + b"IHDR" + hdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + hdr) & 0xFFFFFFFF)
            + bad[8 + 12 + 13:]
        )
        M.decode_png_pixels(bytes(blob))
