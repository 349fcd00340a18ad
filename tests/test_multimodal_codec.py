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


def _media(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_ppm_decoder_rejects_zero_dimensions(spark):
    # 0x0 passes the raster-length check (0 == 0*0*3) but must route as a
    # decode error, not divide by zero pixels downstream
    with pytest.raises(ValueError, match="non-positive"):
        mm._decode_ppm(b"P6\n0 0\n255\n")
    df = mm.decode_image(_media(spark, [(1, b"P6\n0 0\n255\n")]))
    row = df.collect()[0]
    assert row.err is not None and row.mean_r is None


def test_wav_header_roundtrip_pure_python():
    import numpy as np

    pcm = np.arange(-8, 8, dtype="<i2").tobytes()  # 8 stereo frames
    payload = mm.encode_wav(2, 8000, pcm)
    nch, rate, data = mm._decode_wav(payload)
    assert (nch, rate) == (2, 8000)
    assert data == pcm


def test_wav_decoder_rejects_malformed_and_unsupported():
    import struct

    pcm = b"\x00\x00" * 8
    good = mm.encode_wav(1, 8000, pcm)
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_wav(b"\xff\xd8\xff\xe0" + good[4:])  # JPEG magic
    with pytest.raises(ValueError):
        mm._decode_wav(good[:-3])  # truncated data chunk
    with pytest.raises(ValueError):
        mm._decode_wav(good[:10])  # no WAVE form type
    # a non-PCM (compressed) format code routes as unsupported
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3  # audio_format = IEEE float
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_wav(bytes(bad_fmt))
    # 8-bit PCM
    b8 = bytearray(good)
    b8[34] = 8
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_wav(bytes(b8))
    # empty data chunk
    with pytest.raises(ValueError, match="empty data"):
        mm._decode_wav(mm.encode_wav(2, 8000, b""))


def test_decode_audio_end_to_end_rms(spark):
    import numpy as np

    # known samples: L channel constant 1000, R channel constant -2000
    frames = 64
    pcm = np.empty(frames * 2, dtype="<i2")
    pcm[0::2] = 1000
    pcm[1::2] = -2000
    stereo = mm.encode_wav(2, 16000, pcm.tobytes())
    mono = mm.encode_wav(1, 8000, np.full(32, 500, dtype="<i2").tobytes())
    df = mm.decode_audio(
        _media(spark, [(1, stereo), (2, mono), (3, b"not audio at all")])
    )
    rows = {r.doc_id: r for r in df.collect()}
    assert rows[1].n_channels == 2 and rows[1].sample_rate == 16000
    assert rows[1].n_frames == frames
    assert rows[1].rms_l == 1000.0 and rows[1].rms_r == 2000.0
    assert rows[1].duration_s == 0.004
    assert rows[2].n_channels == 1 and rows[2].rms_l == 500.0
    assert rows[2].rms_r is None and rows[2].err is None
    assert rows[3].err is not None and rows[3].rms_l is None
    # fail-fast variant propagates
    with pytest.raises(Exception):
        mm.decode_audio(
            _media(spark, [(3, b"junk")]), on_error="raise"
        ).collect()


def test_with_wav_payload_decodes_cleanly(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = mm.decode_audio(mm.with_wav_payload(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert all(r.err is None for r in rows.values())
    assert all(r.n_frames == mm.WAV_FRAMES for r in rows.values())
    # empty/null text tiles the zero byte: constant -16384 samples
    assert rows[2].rms_l == 16384.0 and rows[3].rms_r == 16384.0


def test_wav_roundtrip_property():
    """Pure-python property check (no Spark): any whole-frame PCM byte
    payload round-trips encode_wav -> _decode_wav identically, for mono
    and stereo and across sample rates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        nch=st.sampled_from([1, 2]),
        rate=st.sampled_from([8000, 16000, 44100]),
        frames=st.integers(min_value=1, max_value=64),
        data=st.data(),
    )
    def check(nch, rate, frames, data):
        pcm = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=frames * nch * 2,
                    max_size=frames * nch * 2,
                )
            )
        )
        got = mm._decode_wav(mm.encode_wav(nch, rate, pcm))
        assert got == (nch, rate, pcm)

    check()


def test_ppm_roundtrip_property():
    """Any raster of w*h*3 bytes round-trips encode_ppm -> _decode_ppm."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=8),
        h=st.integers(min_value=1, max_value=8),
        data=st.data(),
    )
    def check(w, h, data):
        raster = bytes(
            data.draw(
                st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
            )
        )
        assert mm._decode_ppm(mm.encode_ppm(w, h, raster)) == (w, h, 255, raster)

    check()


def test_resize_image_roundtrip_and_means(spark):
    import numpy as np

    # 4x4 image with a known gradient; 2x2 nearest-neighbor keeps the
    # (0,0),(0,2),(2,0),(2,2) source pixels
    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    payload = mm.encode_ppm(4, 4, px.tobytes())
    out = mm.resize_image(
        _media(spark, [(1, payload), (2, b"not an image")]),
        out_w=2, out_h=2,
    )
    rows = {r.doc_id: r for r in out.collect()}
    r1 = rows[1]
    assert (r1.width, r1.height) == (2, 2) and r1.err is None
    # resized payload is itself a valid P6 and decodes to the kept pixels
    w, h, mx, raster = mm._decode_ppm(bytes(r1.payload))
    kept = px[[0, 2]][:, [0, 2]]
    assert (w, h) == (2, 2) and raster == kept.tobytes()
    want = kept.reshape(-1, 3).astype(int).sum(axis=0) / 4
    assert (r1.mean_r, r1.mean_g, r1.mean_b) == tuple(want)
    assert rows[2].err is not None and rows[2].payload is None


# ---------------------------------------------------------------------------
# PNG tier (r7): real compressed decode — zlib inflate + all five filters
# ---------------------------------------------------------------------------


def test_png_roundtrip_property():
    """Any 8-bit raster round-trips encode_png -> _decode_png for gray,
    gray-alpha, RGB and RGBA — with heights ≥5 the encoder's row % 5
    filter cycle forces the decoder through every PNG filter type."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=8),
        h=st.integers(min_value=5, max_value=10),
        color=st.sampled_from([0, 2, 4, 6]),
        data=st.data(),
    )
    def check(w, h, color, data):
        ch = mm._PNG_CHANNELS[color]
        raster = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * ch,
                    max_size=w * h * ch,
                )
            )
        )
        got = mm._decode_png(mm.encode_png(w, h, raster, color))
        assert got == (w, h, ch, raster)

    check()


def test_png_decoder_rejects_malformed_and_unsupported():
    import struct
    import zlib

    raster = bytes(range(16 * 3)) * 16
    good = mm.encode_png(16, 16, raster)
    # non-PNG magic routes as an unsupported codec (JPEG path)
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_png(b"\xff\xd8\xff\xe0" + good)
    # flipped CRC byte is a corruption, not a codec gap
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mm._decode_png(bytes(bad))
    # palette and 16-bit images are declared unsupported
    def mutate_ihdr(depth=8, color=2):
        ihdr = struct.pack(">IIBBBBB", 16, 16, depth, color, 0, 0, 0)
        chunk = (
            struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        return good[:8] + chunk + good[8 + 12 + 13 :]

    with pytest.raises(mm.UnsupportedCodecError, match="palette"):
        mm._decode_png(mutate_ihdr(color=3))
    with pytest.raises(mm.UnsupportedCodecError, match="16-bit"):
        mm._decode_png(mutate_ihdr(depth=16))
    # truncated IDAT stream
    with pytest.raises(ValueError):
        mm._decode_png(good[:60])


def test_decode_png_matches_ppm_decode_and_routes(spark):
    """The PNG corpus tiles the SAME raster as the PPM corpus, so the
    per-channel means must be identical across the two codecs — a real
    cross-codec consistency check — and corrupt payloads route."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abcABC123"), (3, "")],
        "doc_id long, text string",
    )
    png = mm.decode_png(mm.with_png_payload(docs)).collect()
    ppm = {
        r.doc_id: (r.mean_r, r.mean_g, r.mean_b)
        for r in mm.decode_image(mm.with_ppm_payload(docs)).collect()
    }
    assert len(png) == 3
    for r in png:
        assert r.err is None and (r.width, r.height, r.channels) == (16, 16, 3)
        assert (r.mean_r, r.mean_g, r.mean_b) == ppm[r.doc_id]
    # route: a JPEG-magic payload lands as an err row, not an exception
    media = spark.createDataFrame(
        [(9, bytearray(b"\xff\xd8\xff\xe0notapng"))],
        "doc_id long, payload binary",
    )
    routed = mm.decode_png(media).collect()
    assert len(routed) == 1 and routed[0].width is None
    assert "unsupported codec" in routed[0].err
    with pytest.raises(Exception):
        mm.decode_png(media, on_error="raise").collect()


# ---------------------------------------------------------------------------
# baseline JPEG (SOF0) codec
# ---------------------------------------------------------------------------


def test_jpeg_flat_tile_roundtrip_exact():
    """A flat tile at quant=1 round-trips to EXACTLY the double color
    conversion (DCT of a constant block is DC-only, DC exact) — the
    property the registered oracle relies on."""
    import numpy as np

    rgb = bytes([100, 150, 200]) * 256
    w, h, ch, out = mm._decode_jpeg(mm.encode_jpeg(16, 16, rgb))
    assert (w, h, ch) == (16, 16, 3)
    px = np.frombuffer(out, dtype=np.uint8).reshape(-1, 3)
    exp = mm._ycbcr_to_rgb(
        mm._rgb_to_ycbcr(np.array([[[100, 150, 200]]], dtype=np.uint8))
    )[0, 0]
    assert (px == exp).all()


def test_jpeg_roundtrip_property():
    """Arbitrary rasters through the full lossy pipeline (DCT + quantize
    + Huffman + IDCT + two color transforms): per-pixel error stays
    within the quant=1 rounding envelope — this is the test that drives
    the AC coefficient and Huffman run/size paths for real."""
    import numpy as np

    rng = np.random.RandomState(7)
    for w, h in [(8, 8), (24, 16), (17, 9)]:  # incl. non-multiple-of-8
        r = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        ww, hh, ch, out = mm._decode_jpeg(mm.encode_jpeg(w, h, r.tobytes()))
        assert (ww, hh, ch) == (w, h, 3)
        got = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
        err = np.abs(got.astype(int) - r.astype(int))
        # quant=1: DCT round-off + two rounded color transforms; the
        # worst case observed across seeds is 4
        assert err.max() <= 6, err.max()


def test_jpeg_grayscale_roundtrip_exact_at_quant1():
    import numpy as np

    g = bytes(range(64)) * 4  # 16x16 gray ramp
    w, h, ch, out = mm._decode_jpeg(mm.encode_jpeg(16, 16, g, channels=1))
    assert (w, h, ch) == (16, 16, 1)
    got = np.frombuffer(out, dtype=np.uint8)
    err = np.abs(got.astype(int) - np.frombuffer(g, dtype=np.uint8).astype(int))
    assert err.max() <= 1  # no color transform; DCT round-off only


def test_jpeg_decoder_rejects_malformed_and_unsupported():
    rgb = bytes([1, 2, 3]) * 256
    good = mm.encode_jpeg(16, 16, rgb)
    # wrong magic routes as unsupported codec
    with pytest.raises(mm.UnsupportedCodecError):
        mm._decode_jpeg(b"\x89PNG\r\n\x1a\n" + good)
    # a baseline stream RELABELED SOF2 is malformed progressive (a
    # progressive scan with Ss=0 must have Se=0), not unsupported —
    # real SOF2 streams are a supported decode path now
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Ss=0"):
        mm._decode_jpeg(prog)
    # arithmetic-coded (SOF9)
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(mm.UnsupportedCodecError, match="arithmetic"):
        mm._decode_jpeg(arith)
    # sampling factors above 2 route as unsupported (4:2:0/4:2:2 are
    # now REAL decode paths, so 0x22 no longer rejects)
    i = good.find(b"\xff\xc0")
    sub = bytearray(good)
    sub[i + 11] = 0x33  # first component's h/v sampling (FFC0 len2 prec H2 W2 n id → samp)
    with pytest.raises(mm.UnsupportedCodecError, match="not supported"):
        mm._decode_jpeg(bytes(sub))
    # oversampled chroma (Cb at 2x2 alongside Y 2x2) stays rejected
    sub2 = bytearray(mm.encode_jpeg(16, 16, rgb, subsampling="420"))
    i2 = sub2.find(b"\xff\xc0")
    sub2[i2 + 14] = 0x22
    with pytest.raises(mm.UnsupportedCodecError, match="oversampled-chroma"):
        mm._decode_jpeg(bytes(sub2))
    # truncated entropy stream is malformed, not unsupported
    with pytest.raises(ValueError):
        mm._decode_jpeg(good[:-20] + b"\xff\xd9")
    # missing EOI
    with pytest.raises(ValueError, match="EOI"):
        mm._decode_jpeg(good[:-2])


def test_decode_jpeg_end_to_end_and_routing(spark):
    """The registered corpus through the Arrow contract: real docs decode
    to the double-converted md5 color; a poisoned payload routes to err
    under 'route' and raises under 'raise'; plan stays Arrow-only."""
    import hashlib

    import numpy as np

    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.plans import (
        checks,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "")], "doc_id long, text string"
    )
    media = mm.with_jpeg_payload(docs)
    out = {r.doc_id: r for r in mm.decode_jpeg(media).collect()}
    for doc_id, text in [(1, "alpha beta"), (2, "")]:
        d = hashlib.md5(text.encode()).digest()
        exp = mm._ycbcr_to_rgb(
            mm._rgb_to_ycbcr(np.array([[list(d[:3])]], dtype=np.uint8))
        )[0, 0]
        r = out[doc_id]
        assert (r.width, r.height, r.channels) == (16, 16, 3)
        assert (r.mean_r, r.mean_g, r.mean_b) == tuple(float(x) for x in exp)
        assert r.err is None
    # poisoned payload: routed with the reason, others unaffected
    bad = spark.createDataFrame(
        [(9, bytearray(b"MP3\x00not a jpeg"))], "doc_id long, payload binary"
    )
    routed = {r.doc_id: r for r in mm.decode_jpeg(media.unionByName(bad)).collect()}
    assert routed[9].err is not None and "magic" in routed[9].err
    assert routed[1].err is None
    with pytest.raises(Exception):
        mm.decode_jpeg(media.unionByName(bad), on_error="raise").collect()
    # plan: Arrow evaluation, no row-python, no shuffle
    df = mm.decode_jpeg(media)
    assert checks.uses_arrow_eval(df)
    assert not checks.uses_python_eval(df)
    assert checks.count_shuffle_exchanges(df) == 0


# --- perceptual aHash --------------------------------------------------------


def test_image_ahash_known_bits_and_reject_routing(spark):
    """A half-bright/half-dark raster must set exactly the bright half's
    bits (integer mean comparisons, no float threshold); dimensions not
    divisible by the grid reject-route."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        multimodal,
    )

    # 16x16: left 8 columns bright (200), right 8 dark (10)
    raster = bytes(
        (200 if x < 8 else 10)
        for _y in range(16)
        for x in range(16)
        for _c in range(3)
    )
    good = multimodal.encode_ppm(16, 16, raster)
    bad = multimodal.encode_ppm(12, 12, bytes(12 * 12 * 3))  # 12 % 8 != 0
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in multimodal.image_ahash(df).collect()}
    # bright blocks are bx 0..3 of every by → bits b = by*8+bx, bx<4
    want_bits = {by * 8 + bx for by in range(8) for bx in range(4)}
    lo = sum(1 << b for b in want_bits if b < 32)
    hi = sum(1 << (b - 32) for b in want_bits if b >= 32)
    assert (rows[1].hi, rows[1].lo, rows[1].err) == (hi, lo, None)
    assert rows[2].hi is None and "divisible" in rows[2].err


def test_image_phash_pairs_banding_equals_bruteforce(spark):
    """The 8-band blocking must equal the exact all-pairs hamming ≤ 7
    answer (pigeonhole recall), including pairs found via a LATER band
    whose earlier bands differ — built from crafted near-identical
    texts."""
    from connexion2k12_extending_the_axeda_domain_model_simple_batch_processing_framework_spark.operators import (
        multimodal,
    )

    base = "the quick brown fox jumps over the lazy dog " * 20
    texts = [
        base,
        base[:-3] + "cat",          # tiny tail change
        base.replace("quick", "quack"),
        "a completely different document about spark physical plans " * 15,
        base.upper(),                # large change
    ]
    docs = spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in multimodal.image_phash_pairs(docs).collect()
    }
    sigs = {
        r.doc_id: (r.hi, r.lo)
        for r in multimodal.image_ahash(
            multimodal.with_ppm_payload(docs)
        ).collect()
    }
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
                sigs[a][1] ^ sigs[b][1]
            ).count("1")
            if ham <= multimodal.AHASH_MAX_HAMMING:
                want[(a, b)] = ham
    assert got == want
    assert want, "test corpus must produce at least one qualifying pair"


# --- subsampled baseline JPEG (4:2:2 / 4:2:0) --------------------------------


def test_jpeg_subsampled_flat_tiles_roundtrip_exactly():
    """A flat tile's chroma box mean is the same constant, so 4:2:2 and
    4:2:0 round-trip EXACTLY to the double color-conversion result —
    the property the oracle-checked corpus relies on."""
    import numpy as np

    raster = bytes([123, 45, 200]) * 256
    px = np.frombuffer(raster, dtype=np.uint8).reshape(16, 16, 3)
    exp = mm._ycbcr_to_rgb(mm._rgb_to_ycbcr(px))
    for mode in ("444", "422", "420"):
        w, h, nc, out = mm._decode_jpeg(
            mm.encode_jpeg(16, 16, raster, subsampling=mode)
        )
        got = np.frombuffer(out, dtype=np.uint8).reshape(16, 16, 3)
        assert (w, h, nc) == (16, 16, 3), mode
        assert (got == exp).all(), mode


def test_jpeg_420_random_raster_luma_envelope():
    """On arbitrary rasters 4:2:0 loses chroma detail by design, but the
    UNSUBSAMPLED luma must survive: Y recomputed from the decoded RGB
    stays within a small envelope of the original Y, and dimensions that
    are not MCU multiples (pad + crop) come back exact."""
    import numpy as np

    rng = np.random.RandomState(7)
    raster = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    w, h, nc, out = mm._decode_jpeg(
        mm.encode_jpeg(40, 24, raster.tobytes(), subsampling="420")
    )
    assert (w, h, nc) == (40, 24, 3)
    got = np.frombuffer(out, dtype=np.uint8).reshape(24, 40, 3).astype(np.int64)
    orig = raster.astype(np.int64)

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    # chroma errors mostly cancel in the luma direction; clipping at
    # sharp random edges bounds the residual
    assert float(np.abs(luma(got) - luma(orig)).max()) < 16.0
    # and chroma smoothing is bounded: block means survive (mean error
    # well under the per-pixel noise amplitude)
    assert float(np.abs(got - orig).mean()) < 64.0


def test_jpeg_420_decode_query_shape(spark):
    """The registered 4:2:0 corpus decodes through the same Arrow
    contract with byte-identical results to the 4:4:4 corpus (flat
    tiles: subsampling is exact), proving the subsampled scan path
    end-to-end in the engine."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, None)], "doc_id long, text string"
    )
    a = {
        r.doc_id: r
        for r in mm.decode_jpeg(mm.with_jpeg_payload(docs)).collect()
    }
    b = {
        r.doc_id: r
        for r in mm.decode_jpeg(
            mm.with_jpeg_payload(docs, subsampling="420")
        ).collect()
    }
    assert set(a) == set(b) == {1, 2, 3}
    for k in a:
        assert (
            a[k].mean_r, a[k].mean_g, a[k].mean_b, a[k].err
        ) == (b[k].mean_r, b[k].mean_g, b[k].mean_b, b[k].err), k


# --- progressive JPEG (SOF2) -------------------------------------------------


def test_jpeg_progressive_flat_tile_exact():
    rgb = bytes([120, 33, 200]) * 256
    w, h, ch, out = mm._decode_jpeg(mm.encode_jpeg_progressive(16, 16, rgb))
    assert (w, h, ch) == (16, 16, 3)
    assert out == mm._decode_jpeg(mm.encode_jpeg(16, 16, rgb))[3]


def test_jpeg_progressive_equals_baseline_decode():
    """The progressive scans transmit the SAME quantized coefficients the
    baseline encoder sends — decode must be bit-identical, across odd
    dimensions, grayscale, and quant levels that exercise EOBn runs, ZRL
    in refinement, and the correction-bit buffer."""
    import numpy as np

    r = np.random.RandomState(7)
    for (w, h, c, q) in [
        (16, 16, 3, 1),
        (24, 17, 3, 1),
        (8, 8, 1, 1),
        (19, 23, 1, 2),
        (40, 33, 3, 8),
    ]:
        img = r.randint(0, 256, (h, w, c), dtype=np.uint8).tobytes()
        base = mm._decode_jpeg(mm.encode_jpeg(w, h, img, channels=c, quant=q))
        prog = mm._decode_jpeg(
            mm.encode_jpeg_progressive(w, h, img, channels=c, quant=q)
        )
        assert prog == base


def test_jpeg_progressive_smooth_gradient_long_eob_runs():
    """A smooth gradient quantized hard leaves long all-zero AC bands —
    the EOBn accumulation path (runs > 1, category bits) on both sides."""
    import numpy as np

    w, h = 64, 48
    x = np.linspace(0, 255, w)
    img = np.repeat(x[None, :], h, axis=0).astype(np.uint8)
    img3 = np.stack([img, img // 2, 255 - img], axis=2).tobytes()
    base = mm._decode_jpeg(mm.encode_jpeg(w, h, img3, quant=16))
    prog = mm._decode_jpeg(mm.encode_jpeg_progressive(w, h, img3, quant=16))
    assert prog == base


def test_jpeg_progressive_sparse_spikes_zrl_refinement():
    """Flat background with isolated pixel spikes → sparse large
    coefficients with >16-zero gaps: the ZRL-inside-refinement path and
    its positional correction-bit interleave."""
    import numpy as np

    a = np.full((24, 24), 128, dtype=np.uint8)
    a[3, 5] = 255
    a[12, 19] = 0
    a[20, 2] = 200
    img = np.stack([a, a, a], axis=2).tobytes()
    for q in (1, 3):
        base = mm._decode_jpeg(mm.encode_jpeg(24, 24, img, quant=q))
        prog = mm._decode_jpeg(mm.encode_jpeg_progressive(24, 24, img, quant=q))
        assert prog == base


def test_jpeg_progressive_malformed_scans_raise():
    rgb = bytes([9, 9, 9]) * 256
    good = mm.encode_jpeg_progressive(16, 16, rgb)
    # truncated entropy
    with pytest.raises(ValueError):
        mm._decode_jpeg(good[: len(good) // 2] + b"\xff\xd9")
    # an AC scan widened to two components is malformed
    # (find an SOS with Ss>0: header ns=1)
    i = good.find(b"\xff\xda", good.find(b"\xff\xda") + 2)
    assert i > 0
    bad = bytearray(good)
    bad[i + 4] = 2  # ns=2 on an AC scan
    with pytest.raises(ValueError):
        mm._decode_jpeg(bytes(bad))
