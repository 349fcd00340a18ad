"""Real-codec path of the multimodal tier: pure-python binary-PPM decode
(operators/multimodal.py:decode_image) — roundtrip, header edge cases,
reject routing, and the Arrow/no-shuffle plan contract."""

from __future__ import annotations

import pytest

from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
    multimodal as mm,
)


def test_ppm_header_roundtrip_pure_python():
    rgb = bytes(range(12))  # 2x2 RGB
    payload = mm.encode_ppm(2, 2, rgb)
    w, h, mx, raster = mm._decode_ppm(payload)
    assert (w, h, mx) == (2, 2, 255)
    assert raster == rgb


def test_ppm_decoder_handles_comments_and_whitespace():
    raster = b"\x10" * 3
    payload = b"P6\n# a comment line\n  1\t1 # trailing\n255\n" + raster
    assert mm._decode_ppm(payload) == (1, 1, 255, raster)


def test_ppm_decoder_rejects_malformed():
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_ppm(b"P5\n1 1\n255\n\x00")  # greyscale PGM: wrong magic
    with pytest.raises(ValueError):
        mm._decode_ppm(mm.encode_ppm(2, 2, bytes(12))[:-1])  # short raster
    with pytest.raises(ValueError):
        mm._decode_ppm(b"P6\n2 2\n")  # truncated header
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 3)  # 16-bit


def test_decode_image_end_to_end_and_means(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, None)], "doc_id long, text string"
    )
    media = mm.with_ppm_payload(docs)
    out = {r.doc_id: r for r in mm.decode_image(media).collect()}
    assert len(out) == 3
    r1 = out[1]
    assert (r1.width, r1.height, r1.maxval) == (16, 16, 255)
    assert r1.err is None
    # "abc" tiles to 768 bytes: 256 copies of (97, 98, 99) -> exact means
    assert (r1.mean_r, r1.mean_g, r1.mean_b) == (97.0, 98.0, 99.0)
    # empty/None text tiles zero bytes -> all-black image
    for d in (2, 3):
        assert (out[d].mean_r, out[d].mean_g, out[d].mean_b) == (0.0, 0.0, 0.0)


def test_decode_image_routes_or_raises_bad_codec(spark):
    bad = spark.createDataFrame(
        [(1, bytearray(b"JFIF not a ppm")), (2, bytearray(mm.encode_ppm(1, 1, b"\x05\x06\x07")))],
        "doc_id long, payload binary",
    )
    routed = {r.doc_id: r for r in mm.decode_image(bad, on_error="route").collect()}
    assert routed[1].width is None and "unsupported codec" in routed[1].err
    assert routed[2].err is None and routed[2].mean_g == 6.0
    with pytest.raises(Exception, match="unsupported codec"):
        mm.decode_image(bad, on_error="raise").collect()
    with pytest.raises(ValueError, match="on_error"):
        mm.decode_image(bad, on_error="ignore")


def test_decode_image_is_arrow_no_shuffle(spark):
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.plans import (
        checks,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    df = mm.decode_image(mm.with_ppm_payload(docs))
    assert not checks.uses_python_eval(df)
    assert checks.uses_arrow_eval(df)
    assert checks.count_shuffle_exchanges(df) == 0
