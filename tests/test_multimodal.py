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
