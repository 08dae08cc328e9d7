"""Real pure-stdlib media codecs: 24bpp BMP + 16-bit PCM WAV.

Golden-byte tests pin the ABSOLUTE layout (a round-trip alone would let
an encoder/decoder bug pair cancel — e.g. both skipping the BGR swap);
property round-trips cover padding widths and signed samples.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from glug_spark.operators.multimodal import (
    IMG_H,
    IMG_W,
    WAV_N,
    WAV_RATE,
    decode_bmp,
    decode_payload,
    decode_wav,
    doc_pixels,
    doc_samples,
    encode_bmp,
    encode_wav,
)


def _golden_bmp_2x2() -> tuple[bytes, np.ndarray]:
    """Hand-built per the BMP spec (NOT via encode_bmp): 2×2, 24bpp,
    bottom-up BGR rows padded to 8 bytes. Top-left red, top-right
    green, bottom-left blue, bottom-right white."""
    stride = 8  # 2*3 = 6 → padded to 8
    img = (
        # bottom row first (bottom-up): blue (B=255), white
        b"\xff\x00\x00" + b"\xff\xff\xff" + b"\x00\x00"
        # top row: red (stored BGR → 00 00 ff), green
        + b"\x00\x00\xff" + b"\x00\xff\x00" + b"\x00\x00"
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(img),
                       0, 0, 0, 0)
    expected = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    assert stride * 2 == len(img)
    return header + info + img, expected


def test_decode_bmp_golden():
    payload, expected = _golden_bmp_2x2()
    assert np.array_equal(decode_bmp(payload), expected)


def test_decode_wav_golden_with_extra_chunk():
    """Hand-built RIFF with a LIST chunk between fmt and data (and an
    odd-sized chunk exercising word alignment) — the walker must skip
    them and still find fmt/data."""
    samples = np.array([0, 1, -1, 32767, -32768], dtype=np.int16)
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
    odd = b"junk\x05\x00\x00\x00ABCDE\x00"  # size 5 → 1 pad byte
    body = (
        b"WAVE"
        + odd
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got, rate = decode_wav(payload)
    assert rate == 44100
    assert np.array_equal(got, samples)


@pytest.mark.parametrize("h,w", [(1, 1), (2, 2), (4, 5), (3, 7), (5, 4)])
def test_bmp_roundtrip_padding_widths(h, w):
    rng = np.random.default_rng(h * 100 + w)
    pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(pix)), pix)


def test_wav_roundtrip_signed():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=333, dtype=np.int16)
    got, rate = decode_wav(encode_wav(s, 16000))
    assert rate == 16000
    assert np.array_equal(got, s)


def test_decoder_rejects_unsupported():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG....")
    # 8bpp BMP → explicit NotImplementedError, not garbage pixels
    header = struct.pack("<2sIHHI", b"BM", 100, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="24bpp"):
        decode_bmp(header + info)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS")
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 88200, 4, 16)  # stereo
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError, match="mono"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(NotImplementedError, match="no decoder"):
        decode_payload(b"\xff\xd8\xff", "image/jpeg")


def test_decode_payload_dispatch():
    pix = doc_pixels(b"some payload")
    assert pix.shape == (IMG_H, IMG_W, 3)
    assert np.array_equal(decode_payload(encode_bmp(pix), "image/bmp"), pix)
    smp = doc_samples(b"some payload")
    assert smp.shape == (WAV_N,)
    got, rate = decode_payload(encode_wav(smp), "audio/wav")
    assert rate == WAV_RATE
    assert np.array_equal(got, smp)


def test_media_pipeline_real_decode_rows(spark):
    """The fused pipeline's bmp/wav rows must equal an independent
    recomputation from the payload (digest of decoded bytes' hex +
    channel/sample means)."""
    import hashlib

    from pyspark.sql import functions as F

    from glug_spark.operators.multimodal import media_pipeline, media_table

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(20)
    media = media_table(docs)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    got = {
        (r["doc_id"], r["idx"]): (r["digest"], r["metric"])
        for r in media_pipeline(media)
        .where(F.col("stage") == "bmp").collect()
    }
    assert len(got) == 4 * len(payloads)
    for doc_id, raw in payloads.items():
        pix = doc_pixels(raw)
        dec = decode_bmp(encode_bmp(pix))
        assert np.array_equal(dec, pix)
        want_digest = hashlib.md5(
            dec.tobytes().hex().encode("ascii")
        ).hexdigest()
        assert got[(doc_id, 0)] == (want_digest, float(IMG_W * IMG_H))
        for c in range(3):
            mean = float(dec[:, :, c].astype(np.int64).sum()) / (IMG_W * IMG_H)
            assert got[(doc_id, c + 1)][1] == pytest.approx(mean, abs=1e-6)
