"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so the (C-library) codec work happens vectorized per batch,
never per-row over Py4J. Two decode tiers:

- ``decode_image`` is a REAL codec path: a pure-python binary-PPM (P6)
  parser — header, comments, raster validation, per-channel pixel means —
  with reject-routing or fail-fast for unsupported codecs. No media
  libraries needed; swap ``_decode_ppm`` for PIL/libav in production and
  the Spark-side contract is unchanged.
- ``decode_stub`` remains the clearly-marked deterministic fake for formats
  this container genuinely cannot decode (JPEG/MP4 …).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, byte_len long, n_frames long, format string"
)

FRAME_BYTES = 1024  # fake codec: one "frame" per KiB of payload


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Attach a binary payload column (utf-8 bytes of the text stand in for
    a real media blob) plus a metadata struct — the multimodal table shape."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/v1").alias("codec"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a media decoder.

    A real implementation would be, e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not in this container

    and would raise NotImplementedError if the codec is unsupported.
    """
    byte_len = len(payload)
    n_frames = byte_len // FRAME_BYTES + 1
    return byte_len, n_frames, "fake/v1"


def decode_stub(media: DataFrame) -> DataFrame:
    """Vectorized 'decode' over the payload column via mapInPandas.

    Arrow moves each partition to Python in columnar batches; the iterator
    contract keeps memory bounded (one batch in flight). Partitioning is
    preserved — no shuffle — so this pipelines between scan and downstream
    filters at 100 TB.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": decoded.map(lambda d: d[0]),
                    "n_frames": decoded.map(lambda d: d[1]),
                    "format": decoded.map(lambda d: d[2]),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


class UnsupportedCodecError(NotImplementedError):
    """Raised for payloads whose codec this build cannot decode (the
    production error path a PIL/libav-backed decoder would also take)."""


PPM_MAXVAL = 255


def encode_ppm(width: int, height: int, rgb: bytes, maxval: int = PPM_MAXVAL) -> bytes:
    """Serialize a binary (P6) PPM image — the test-vector generator for
    the real decode path below. Raster is ``width*height*3`` RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"raster is {len(rgb)} bytes, need {width}x{height}x3 = {width * height * 3}"
        )
    return b"P6\n%d %d\n%d\n" % (width, height, maxval) + rgb


def _decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """A REAL (pure-python) binary-PPM decoder: parse the P6 header —
    magic, whitespace, ``#`` comments, width/height/maxval, the single
    post-maxval whitespace byte — and validate the raster length. Returns
    (width, height, maxval, raster). Raises UnsupportedCodecError for a
    non-P6 magic and ValueError for a malformed P6."""
    if payload[:2] != b"P6":
        raise UnsupportedCodecError(
            f"unsupported codec magic {payload[:2]!r} (only binary PPM/P6)"
        )
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] not in b"\r\n":
                pos += 1
        elif c.isdigit():
            start = pos
            while pos < len(payload) and payload[pos : pos + 1].isdigit():
                pos += 1
            fields.append(int(payload[start:pos]))
        else:
            raise ValueError(f"bad PPM header byte {c!r} at offset {pos}")
    if pos >= len(payload) or payload[pos : pos + 1] not in b" \t\r\n":
        raise ValueError("missing single whitespace after maxval")
    pos += 1  # exactly ONE whitespace separates header and raster
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        # a 0×0 "image" would pass the raster-length check (0 == 0*0*3)
        # and then divide by zero pixels downstream — reject it here so
        # it routes as a decode error, not a NaN row
        raise ValueError(f"non-positive dimensions {width}x{height}")
    if not (0 < maxval < 65536):
        raise ValueError(f"maxval {maxval} out of range")
    if maxval > 255:
        raise UnsupportedCodecError("16-bit PPM not supported")
    raster = payload[pos:]
    if len(raster) != width * height * 3:
        raise ValueError(
            f"raster is {len(raster)} bytes, header says {width * height * 3}"
        )
    return width, height, maxval, raster


IMAGE_DECODED_SCHEMA = (
    "doc_id long, width long, height long, maxval long, "
    "mean_r double, mean_g double, mean_b double, err string"
)


def decode_image(media: DataFrame, on_error: str = "route") -> DataFrame:
    """Decode the payload column as binary PPM and emit per-channel pixel
    means — the real-codec successor of ``decode_stub``, same Arrow
    ``mapInPandas`` contract (columnar batches, bounded memory, partition
    preserved, no shuffle). Channel means use integer sums divided once,
    rounded half-away at 1e-6 — exact and order-independent.

    ``on_error='route'`` turns undecodable payloads into rows with NULL
    dimensions and the error message in ``err`` (the reject-routing shape
    of sources/jsonl.py); ``on_error='raise'`` propagates — fail-fast for
    pipelines that guarantee their codec upstream.
    """
    import numpy as np

    if on_error not in ("route", "raise"):
        raise ValueError(f"on_error must be 'route' or 'raise', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            out = {k: [] for k in (
                "doc_id", "width", "height", "maxval",
                "mean_r", "mean_g", "mean_b", "err",
            )}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, mx, raster = _decode_ppm(bytes(buf))
                    px = np.frombuffer(raster, dtype=np.uint8).reshape(-1, 3)
                    sums = px.astype(np.int64).sum(axis=0)
                    n = len(px)
                    means = [
                        float(np.floor(s / n * 1e6 + 0.5) / 1e6) for s in sums
                    ]
                    vals = [w, h, mx, *means, None]
                except (UnsupportedCodecError, ValueError) as e:
                    if on_error == "raise":
                        raise
                    vals = [None] * 6 + [str(e)]
                out["doc_id"].append(doc_id)
                for k, v in zip(
                    ("width", "height", "maxval", "mean_r", "mean_g", "mean_b", "err"),
                    vals,
                ):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_DECODED_SCHEMA)


PPM_TILE_W = 16
PPM_TILE_H = 16


def with_ppm_payload(documents: DataFrame) -> DataFrame:
    """Deterministic PPM test corpus: render each doc's utf-8 text tiled
    into a 16×16 RGB raster and serialize with ``encode_ppm`` — real,
    decodable image payloads for exercising ``decode_image`` end to end.
    Arrow-batched (the encode is Python byte-wrangling); empty texts tile
    zeros."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        need = PPM_TILE_W * PPM_TILE_H * 3
        for pdf in it:
            if not len(pdf):
                continue
            payloads = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8") or b"\x00"
                tiled = (raw * (need // len(raw) + 1))[:need]
                payloads.append(encode_ppm(PPM_TILE_W, PPM_TILE_H, tiled))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


RESIZE_W = 8
RESIZE_H = 8

RESIZED_SCHEMA = (
    "doc_id long, width long, height long, payload binary, "
    "mean_r double, mean_g double, mean_b double, err string"
)


def resize_image(
    media: DataFrame,
    out_w: int = RESIZE_W,
    out_h: int = RESIZE_H,
    on_error: str = "route",
) -> DataFrame:
    """Resize the payload column's PPM images by nearest-neighbor
    sampling — the thumbnail/normalization stage of an image-training
    pipeline, behind the same Arrow ``mapInPandas`` contract as
    ``decode_image`` (columnar batches, partition preserved, no
    shuffle). Source pixel for output (x, y) is (⌊x·W/w'⌋, ⌊y·H/h'⌋) —
    pure integer index math, so the resized raster (re-encoded as a
    valid P6 payload) and its channel means are deterministic and the
    oracle replays them from the synthesized corpus. Same
    reject-routing/fail-fast error topology as the decoders.

    Output: (doc_id, width, height, payload, mean_r/g/b, err) where
    width/height/payload describe the RESIZED image.
    """
    import numpy as np

    if on_error not in ("route", "raise"):
        raise ValueError(f"on_error must be 'route' or 'raise', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("width", "height", "payload", "mean_r", "mean_g", "mean_b", "err")
        for pdf in it:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", *cols)}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, mx, raster = _decode_ppm(bytes(buf))
                    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
                    rows = (np.arange(out_h) * h) // out_h
                    colsel = (np.arange(out_w) * w) // out_w
                    rz = px[rows][:, colsel]
                    sums = rz.reshape(-1, 3).astype(np.int64).sum(axis=0)
                    n = out_w * out_h
                    means = [
                        float(np.floor(s / n * 1e6 + 0.5) / 1e6) for s in sums
                    ]
                    vals = [
                        out_w, out_h,
                        encode_ppm(out_w, out_h, rz.tobytes(), mx),
                        *means, None,
                    ]
                except (UnsupportedCodecError, ValueError) as e:
                    if on_error == "raise":
                        raise
                    vals = [None] * 6 + [str(e)]
                out["doc_id"].append(doc_id)
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# compressed-image tier: real PNG decode (stdlib zlib) behind the Arrow
# contract — PPM above is uncompressed; PNG is the representative
# compressed format real corpora actually carry, decodable here with no
# media libraries (DEFLATE via zlib + the five scanline filters).
# ---------------------------------------------------------------------------

import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (only 8-bit depths are supported;
#: palette (3) and 16-bit images route as unsupported codecs)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9, filter type 4): pick whichever of
    left/up/up-left is closest to a+b−c, ties in that order."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(
    width: int, height: int, raster: bytes, color_type: int = 2
) -> bytes:
    """Serialize an 8-bit PNG — the test-vector generator for the real
    decode below (``encode_ppm``'s compressed sibling). Each scanline is
    filtered with type ``row % 5``, cycling through None/Sub/Up/Average/
    Paeth, so a corpus of tiles ≥5 rows tall forces the decoder to
    reverse EVERY filter type — the decode is exercised for real, while
    decoded pixels (and therefore the oracle's channel means) are
    filter-independent."""
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    if len(raster) != stride * height:
        raise ValueError(
            f"raster is {len(raster)} bytes, need {width}x{height}x{ch}"
        )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        line = raster[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        else:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up = prior[i]
                ul = prior[i - ch] if i >= ch else 0
                pred = (
                    left if ft == 1
                    else up if ft == 2
                    else (left + up) // 2 if ft == 3
                    else _paeth(left, up, ul)
                )
                raw.append((line[i] - pred) & 0xFF)
        prior = line
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """A REAL (pure-python, stdlib+numpy) PNG decoder: signature, chunk
    walk with CRC verification, IHDR validation, IDAT concatenation +
    zlib inflate, and per-scanline un-filtering of all five filter types
    (None/Sub/Up/Average/Paeth — Sub/Up vectorized, Average/Paeth
    loop-carried; see the cost-model comment at the un-filter loop).
    Supports 8-bit gray/RGB/gray-alpha/RGBA;
    palette, 16-bit, and interlaced images raise UnsupportedCodecError
    (the route a full decoder build would widen), malformed streams raise
    ValueError. Returns (width, height, channels, unfiltered raster)."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise UnsupportedCodecError(
            f"unsupported codec magic {payload[:4]!r} (PNG signature expected)"
        )
    pos, ihdr, idat, ended = len(_PNG_SIG), None, bytearray(), False
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) != size or pos + 12 + size > len(payload):
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + size
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND chunk")
    if len(ihdr) != 13:
        raise ValueError(f"IHDR is {len(ihdr)} bytes, expected 13")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width <= 0 or height <= 0:
        raise ValueError(f"non-positive dimensions {width}x{height}")
    if color == 3:
        raise UnsupportedCodecError("palette PNG not supported")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"bad color type {color}")
    if depth != 8:
        raise UnsupportedCodecError(f"{depth}-bit PNG not supported (8 only)")
    if interlace:
        raise UnsupportedCodecError("interlaced (Adam7) PNG not supported")
    if comp or filt:
        raise ValueError(f"bad compression/filter method {comp}/{filt}")
    if not idat:
        raise ValueError("missing IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"inflated stream is {len(raw)} bytes, expected {(stride + 1) * height}"
        )
    import numpy as np

    # Un-filtering cost model: None is a copy; Up is elementwise
    # (vectorized add with the prior row); Sub is a per-channel-lane
    # prefix sum (vectorized cumsum mod 256 — the recurrence
    # line[i] += line[i-ch] telescopes). Average and Paeth are
    # NONLINEAR loop-carried recurrences along the scanline (each
    # byte's predictor needs the already-reconstructed left neighbor),
    # so they stay per-byte python — fine at the contract-proving tile
    # sizes here (measured 1.5 ms for a filter-cycling 64x64 RGB tile,
    # dominated by those two filters); a production pipeline swaps a
    # native codec
    # (libpng et al.) behind this same Arrow contract and error
    # topology.
    out = bytearray(stride * height)
    prior = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        seg = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        if ft == 0:
            line = bytearray(seg)
        elif ft == 1:  # Sub: per-lane prefix sum mod 256
            arr = np.frombuffer(seg, dtype=np.uint8).reshape(width, ch)
            line = bytearray(
                (np.cumsum(arr, axis=0, dtype=np.uint64) & 0xFF)
                .astype(np.uint8)
                .tobytes()
            )
        elif ft == 2:  # Up: elementwise add with the prior row
            a = np.frombuffer(seg, dtype=np.uint8).astype(np.uint16)
            p = np.frombuffer(prior, dtype=np.uint8)
            line = bytearray(((a + p) & 0xFF).astype(np.uint8).tobytes())
        elif ft == 3:  # Average (loop-carried: needs reconstructed left)
            line = bytearray(seg)
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth (loop-carried nonlinear predictor)
            line = bytearray(seg)
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prior[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ft} on scanline {y}")
        out[y * stride : (y + 1) * stride] = line
        prior = bytes(line)
    return width, height, ch, bytes(out)


PNG_DECODED_SCHEMA = (
    "doc_id long, width long, height long, channels long, "
    "mean_r double, mean_g double, mean_b double, err string"
)


def decode_png(media: DataFrame, on_error: str = "route") -> DataFrame:
    """Decode the payload column as PNG and emit per-channel pixel means —
    the compressed-format sibling of ``decode_image`` (which reads
    uncompressed PPM), same Arrow ``mapInPandas`` contract: columnar
    batches, bounded memory, partition preserved, no shuffle. Channel
    means use integer sums divided once, rounded half-away at 1e-6 —
    exact and order-independent, so the registered query is
    oracle-checkable over the synthesized corpus. Grayscale reports its
    mean in mean_r with mean_g/mean_b NULL; alpha channels are excluded
    from the means (they're coverage, not color).

    Same reject-routing/fail-fast error topology as the other decoders.
    """
    import numpy as np

    if on_error not in ("route", "raise"):
        raise ValueError(f"on_error must be 'route' or 'raise', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("width", "height", "channels", "mean_r", "mean_g", "mean_b", "err")
        for pdf in it:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", *cols)}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, ch, raster = _decode_png(bytes(buf))
                    px = np.frombuffer(raster, dtype=np.uint8).reshape(-1, ch)
                    color = px[:, : 3 if ch >= 3 else 1]  # drop alpha
                    sums = color.astype(np.int64).sum(axis=0)
                    n = len(px)
                    means = [
                        float(np.floor(s / n * 1e6 + 0.5) / 1e6) for s in sums
                    ]
                    while len(means) < 3:
                        means.append(None)
                    vals = [w, h, ch, *means, None]
                except (UnsupportedCodecError, ValueError) as e:
                    if on_error == "raise":
                        raise
                    vals = [None] * 6 + [str(e)]
                out["doc_id"].append(doc_id)
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=PNG_DECODED_SCHEMA)


def with_png_payload(documents: DataFrame) -> DataFrame:
    """Deterministic PNG test corpus: the SAME 16×16 RGB raster
    ``with_ppm_payload`` tiles from each doc's utf-8 text, serialized as
    a real DEFLATE-compressed PNG with the filter type cycling per
    scanline (row % 5) — so decoding reverses every PNG filter while the
    pixel values (and the oracle's channel means) stay identical to the
    PPM corpus'. ``spread()`` first: the per-doc filter loops are python
    and a small documents scan is ONE split — same argument as
    ``with_jpeg_payload``."""
    from ..functions.partitioning import spread

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        need = PPM_TILE_W * PPM_TILE_H * 3
        for pdf in it:
            if not len(pdf):
                continue
            payloads = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8") or b"\x00"
                tiled = (raw * (need // len(raw) + 1))[:need]
                payloads.append(encode_png(PPM_TILE_W, PPM_TILE_H, tiled))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(documents.select("doc_id", "text")).mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# audio tier: real WAV (RIFF/PCM-16) decode behind the same Arrow contract
# ---------------------------------------------------------------------------

import struct


def encode_wav(n_channels: int, sample_rate: int, pcm: bytes) -> bytes:
    """Serialize a canonical RIFF/WAVE container around 16-bit PCM frames
    (interleaved little-endian) — the test-vector generator for the real
    audio decode below, like ``encode_ppm`` for images."""
    if len(pcm) % (2 * n_channels):
        raise ValueError(
            f"pcm is {len(pcm)} bytes, not a whole number of "
            f"{n_channels}-channel 16-bit frames"
        )
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(payload: bytes) -> tuple[int, int, "bytes"]:
    """A REAL (pure-python) RIFF/WAVE parser: magic, form type, chunk
    walk (even-padded per RIFF), ``fmt `` validation, ``data`` extraction.
    Returns (n_channels, sample_rate, pcm bytes). Raises
    UnsupportedCodecError for a non-RIFF magic or a non-PCM-16 encoding
    (the path a compressed codec — MP3/AAC — would take in this build)
    and ValueError for a malformed container."""
    if payload[:4] != b"RIFF":
        raise UnsupportedCodecError(
            f"unsupported codec magic {payload[:4]!r} (only RIFF/WAVE)"
        )
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("RIFF without WAVE form type")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size % 2)  # chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("fmt chunk too short")
    audio_format, n_channels, sample_rate, _br, block_align, bits = (
        struct.unpack("<HHIIHH", fmt[:16])
    )
    if audio_format != 1:
        raise UnsupportedCodecError(
            f"compressed audio format {audio_format} not supported (PCM only)"
        )
    if bits != 16:
        raise UnsupportedCodecError(f"{bits}-bit PCM not supported (16 only)")
    if n_channels <= 0 or sample_rate <= 0:
        raise ValueError(
            f"non-positive channels/rate {n_channels}/{sample_rate}"
        )
    if block_align != 2 * n_channels:
        raise ValueError(f"block_align {block_align} != {2 * n_channels}")
    if len(data) % block_align:
        raise ValueError(
            f"data chunk {len(data)} bytes is not whole {block_align}-byte frames"
        )
    if not data:
        raise ValueError("empty data chunk")
    return n_channels, sample_rate, data


AUDIO_DECODED_SCHEMA = (
    "doc_id long, n_channels long, sample_rate long, n_frames long, "
    "duration_s double, rms_l double, rms_r double, err string"
)


def decode_audio(media: DataFrame, on_error: str = "route") -> DataFrame:
    """Decode the payload column as RIFF/PCM-16 WAV and emit per-channel
    RMS + duration — the audio twin of ``decode_image``, same Arrow
    ``mapInPandas`` contract (columnar batches, bounded memory, partition
    preserved, no shuffle). RMS uses integer sums of squares (exact,
    order-independent; ≤2³¹ samples of int16 fit int64) divided once,
    sqrt'd (IEEE-exact), rounded half-away at 1e-6 — so the oracle
    replays it bit-for-bit. Mono payloads report rms_r NULL.

    ``on_error='route'`` turns undecodable payloads into rows with NULL
    stats and the message in ``err``; ``on_error='raise'`` propagates.
    """
    import numpy as np

    if on_error not in ("route", "raise"):
        raise ValueError(f"on_error must be 'route' or 'raise', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "n_channels", "sample_rate", "n_frames",
            "duration_s", "rms_l", "rms_r", "err",
        )
        for pdf in it:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", *cols)}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    nch, rate, data = _decode_wav(bytes(buf))
                    a = np.frombuffer(data, dtype="<i2").astype(np.int64)
                    n_frames = len(a) // nch
                    rms = []
                    for ch in range(min(nch, 2)):
                        s = a[ch::nch]
                        r = float(np.sqrt(int((s * s).sum()) / len(s)))
                        rms.append(float(np.floor(r * 1e6 + 0.5) / 1e6))
                    dur = float(
                        np.floor(n_frames / rate * 1e6 + 0.5) / 1e6
                    )
                    vals = [
                        nch, rate, n_frames, dur,
                        rms[0], rms[1] if nch > 1 else None, None,
                    ]
                except (UnsupportedCodecError, ValueError) as e:
                    if on_error == "raise":
                        raise
                    vals = [None] * 6 + [str(e)]
                out["doc_id"].append(doc_id)
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AUDIO_DECODED_SCHEMA)


WAV_CHANNELS = 2
WAV_RATE = 8000
WAV_FRAMES = 256


def with_wav_payload(documents: DataFrame) -> DataFrame:
    """Deterministic WAV test corpus: synthesize each doc's utf-8 text
    into 256 stereo PCM-16 frames (sample = byte-code·256 − 16384, tiled
    over the text) and wrap with ``encode_wav`` — real decodable audio
    payloads for exercising ``decode_audio`` end to end, the
    ``with_ppm_payload`` recipe. Empty texts synthesize from a single
    zero byte (constant −16384 samples)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        need = WAV_FRAMES * WAV_CHANNELS
        for pdf in it:
            if not len(pdf):
                continue
            payloads = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8") or b"\x00"
                codes = np.frombuffer(
                    (raw * (need // len(raw) + 1))[:need], dtype=np.uint8
                )
                # int32 intermediate: byte codes are ASCII (≤127) in this
                # corpus so values fit int16, but never overflow silently
                pcm = (codes.astype(np.int32) * 256 - 16384).astype("<i2")
                payloads.append(
                    encode_wav(WAV_CHANNELS, WAV_RATE, pcm.tobytes())
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


FRAME_STRIDE = 2  # sample every 2nd frame (video keyframe-style sampling)


def sample_frames(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Frame sampling: explode each payload into every ``stride``-th
    fixed-size frame — the video-pipeline step that turns one blob row
    into N frame rows for per-frame featurization.

    Pure binary column math (binary length + binary substr over an
    exploded offset sequence): pipelines off the scan with NO shuffle and
    no Python; at 100 TB each task turns its blob rows into frame rows
    locally. The last frame may be short. Frame indices count SAMPLED
    frames (0,1,2…), ``frame_offset`` is the byte position in the blob.
    """
    n_bytes = F.length("payload")
    starts = F.sequence(
        F.lit(0), n_bytes - 1, F.lit(frame_bytes * stride)
    )
    # zero-byte payloads produce no frames (F.sequence(0, -1) would throw,
    # not return empty — same guard shape as corpus.boilerplate_scrub)
    ex = media.filter(n_bytes > 0).select(
        "doc_id", "payload", F.posexplode(starts).alias("frame_idx", "frame_offset")
    )
    return ex.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("frame_offset").cast("long").alias("frame_offset"),
        F.col("payload").substr(
            F.col("frame_offset") + 1, F.lit(frame_bytes)
        ).alias("frame_bytes"),
    )


FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx long, frame_len long, mean_byte double, max_byte long"
)


def frame_byte_stats(frames: DataFrame) -> DataFrame:
    """Per-frame byte statistics — the featurization stage (mean/max pixel
    value, in production a real embedding model) as Arrow-batched numpy
    over the raw frame bytes: ``np.frombuffer`` per frame, integer sums
    (exact, order-independent) divided once at the end, so the stats are
    bit-identical to the oracle's character-code arithmetic."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            lens, means, maxes = [], [], []
            for buf in pdf["frame_bytes"]:
                a = np.frombuffer(bytes(buf), dtype=np.uint8)
                lens.append(len(a))
                # exact integer HALF_UP round (the r12 div-trick): the
                # double path floor(mean*1e6 + 0.5) is midpoint-exposed
                # on dyadic sums (k/128); (2·s·10⁶ + n) // (2·n) is not.
                # Python ints are arbitrary-precision, so no overflow.
                if len(a):
                    s_, n_ = int(a.sum()), len(a)
                    means.append(((2 * s_ * 1_000_000 + n_) // (2 * n_)) / 1e6)
                else:
                    means.append(0.0)
                maxes.append(int(a.max()) if len(a) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_len": lens,
                    "mean_byte": means,
                    "max_byte": maxes,
                }
            )

    return frames.mapInPandas(batches, schema=FRAME_STATS_SCHEMA)


def frame_dedup(frames: DataFrame) -> DataFrame:
    """Cross-document duplicate-frame report — the video-pipeline step
    that finds re-used intro/outro/static frames across a corpus: md5 over
    the raw frame bytes, ONE map-side-combined shuffle on the hash.
    Canonical occurrence = lexicographic min of (doc_id, frame_idx) via a
    struct-min aggregate (no second pass, no window over the full frame
    table). Composes downstream of ``sample_frames`` so only sampled
    frames pay the hash.

    Output per distinct frame hash: (frame_md5, n_copies, n_docs,
    canon_doc_id, canon_frame_idx).
    """
    h = F.md5(F.col("frame_bytes"))
    canon = F.min(F.struct(F.col("doc_id"), F.col("frame_idx"))).alias("__c")
    return (
        frames.select("doc_id", "frame_idx", h.alias("frame_md5"))
        .groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
            canon,
        )
        .select(
            "frame_md5",
            F.col("n_copies").cast("long").alias("n_copies"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("__c.doc_id").cast("long").alias("canon_doc_id"),
            F.col("__c.frame_idx").cast("long").alias("canon_frame_idx"),
        )
    )


# ---------------------------------------------------------------------------
# image tier: real baseline JPEG (JFIF, SOF0 Huffman) behind the same
# Arrow contract — the most common real-world payload a 100 TB multimodal
# corpus carries. Stdlib+numpy only (the PNG recipe): Annex K Huffman
# tables, float DCT, 4:4:4 / grayscale; progressive (SOF2), arithmetic
# (SOF9+), 12-bit, and subsampled streams reject-route through
# UnsupportedCodecError — the path a native-codec build would widen.
# ---------------------------------------------------------------------------

_JPEG_ZIGZAG: list[int] = []  # generated: natural index per zigzag position


def _zigzag_order() -> list[int]:
    """The JPEG zigzag scan as natural (row*8+col) indices, generated by
    the diagonal walk instead of transcribed (64 constants invite typos)."""
    if _JPEG_ZIGZAG:
        return _JPEG_ZIGZAG
    r = c = 0
    up = True
    for _ in range(64):
        _JPEG_ZIGZAG.append(r * 8 + c)
        if up:
            if c == 7:
                r += 1
                up = False
            elif r == 0:
                c += 1
                up = False
            else:
                r -= 1
                c += 1
        else:
            if r == 7:
                c += 1
                up = True
            elif c == 0:
                r += 1
                up = True
            else:
                r += 1
                c -= 1
    return _JPEG_ZIGZAG


# ITU-T T.81 Annex K typical Huffman tables: (BITS[1..16], HUFFVAL).
# Encoder and decoder both consume the DHT segments, so the tables only
# need to be valid canonical prefix codes — which BITS/HUFFVAL are by
# construction — and byte-identical between the two ends by design.
_JPEG_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> "np.ndarray":
    """Orthonormal 8-point DCT-II basis; F = A·V·Aᵀ, V = Aᵀ·F·A."""
    import numpy as np

    A = np.zeros((8, 8))
    for u in range(8):
        cu = (0.5 / (2.0 ** 0.5)) if u == 0 else 0.5
        for x in range(8):
            A[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return A


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill to the byte edge
        return bytes(self.buf)


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(size category, offset bits) for a DC diff / AC level (F.1.2.1:
    negatives are stored as v-1 in ``size`` low bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(px: "np.ndarray") -> "np.ndarray":
    """JFIF (BT.601 full-range) forward conversion, floor(x+0.5) rounding
    so the oracle can replicate it in SQL (no banker's rounding)."""
    import numpy as np

    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(px: "np.ndarray") -> "np.ndarray":
    """JFIF inverse conversion, floor(x+0.5) rounding + clamp."""
    import numpy as np

    y = px[:, :, 0].astype(np.float64)
    cb = px[:, :, 1].astype(np.float64) - 128.0
    cr = px[:, :, 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


#: encoder subsampling modes → the Y component's (h, v) sampling factors
#: (chroma is always (1, 1) relative to them)
_JPEG_SAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_jpeg(
    width: int,
    height: int,
    raster: bytes,
    channels: int = 3,
    quant: int = 1,
    subsampling: str = "444",
) -> bytes:
    """Serialize a baseline JFIF JPEG (SOF0, Annex K Huffman tables, flat
    quantization ``quant`` for every coefficient) — the test-vector
    generator for the real decode below, the PNG recipe. ``subsampling``
    picks 4:4:4 (default), 4:2:2, or 4:2:0 chroma layout (the variant
    real-world encoders emit by default). ``quant=1`` makes FLAT blocks
    round-trip exactly (a constant block's DCT is DC-only, the DC an
    exact multiple of 1 — and the chroma box mean of a FLAT region is
    the same constant, so subsampling stays exact on flat tiles), which
    keeps a flat-tile corpus oracle-checkable even though JPEG is lossy
    in general. Edge dimensions replicate-pad to MCU multiples."""
    import numpy as np

    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if subsampling not in _JPEG_SAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_JPEG_SAMPLING)}")
    if len(raster) != width * height * channels:
        raise ValueError(
            f"raster is {len(raster)} bytes, need {width}x{height}x{channels}"
        )
    hs_y, vs_y = _JPEG_SAMPLING[subsampling] if channels == 3 else (1, 1)
    samp = [(hs_y, vs_y)] + [(1, 1)] * (channels - 1)
    px = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    comps = _rgb_to_ycbcr(px) if channels == 3 else px
    A = _dct_matrix()
    zz = _zigzag_order()
    qtab = np.full(64, quant, dtype=np.int64)
    mcu_w, mcu_h = 8 * hs_y, 8 * vs_y
    pad_w = (width + mcu_w - 1) // mcu_w * mcu_w
    pad_h = (height + mcu_h - 1) // mcu_h * mcu_h
    padded = np.empty((pad_h, pad_w, channels), dtype=np.float64)
    padded[:height, :width] = comps
    padded[height:, :width] = comps[-1:, :, :]
    padded[:, width:] = padded[:, width - 1 : width, :]
    # per-component planes at their own resolution; chroma is the box
    # mean over the (hs_y, vs_y) window — exact on flat regions
    planes = [padded[:, :, 0]]
    for c in range(1, channels):
        ch = padded[:, :, c]
        planes.append(
            ch.reshape(pad_h // vs_y, vs_y, pad_w // hs_y, hs_y).mean(axis=(1, 3))
        )

    dc_tabs = [_huff_codes(*_JPEG_DC_LUM)] + [_huff_codes(*_JPEG_DC_CHR)] * 2
    ac_tabs = [_huff_codes(*_JPEG_AC_LUM)] + [_huff_codes(*_JPEG_AC_CHR)] * 2
    w = _BitWriter()
    pred = [0] * channels

    def put_block(c: int, block: "np.ndarray") -> None:
        F2 = A @ (block - 128.0) @ A.T
        q = np.floor(F2.flatten() / quant + 0.5).astype(np.int64)
        zzq = q[zz]
        diff = int(zzq[0]) - pred[c]
        pred[c] = int(zzq[0])
        size, bits = _jpeg_magnitude(diff)
        code, ln = dc_tabs[c][size]
        w.put(code, ln)
        if size:
            w.put(bits, size)
        run = 0
        last_nz = max((i for i in range(1, 64) if zzq[i]), default=0)
        for i in range(1, last_nz + 1):
            v = int(zzq[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_tabs[c][0xF0]  # ZRL
                w.put(code, ln)
                run -= 16
            size, bits = _jpeg_magnitude(v)
            code, ln = ac_tabs[c][(run << 4) | size]
            w.put(code, ln)
            w.put(bits, size)
            run = 0
        if last_nz < 63:
            code, ln = ac_tabs[c][0x00]  # EOB
            w.put(code, ln)

    for my in range(pad_h // mcu_h):
        for mx in range(pad_w // mcu_w):
            for c in range(channels):
                hs, vs = samp[c]
                for v in range(vs):
                    for hh in range(hs):
                        by = (my * vs + v) * 8
                        bx = (mx * hs + hh) * 8
                        put_block(c, planes[c][by : by + 8, bx : bx + 8])
    entropy = w.flush()

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qz = bytes(int(qtab[i]) for i in range(64))  # stored in zigzag order
    out += seg(0xDB, b"\x00" + qz)  # DQT id 0 (luma)
    if channels == 3:
        out += seg(0xDB, b"\x01" + qz)  # DQT id 1 (chroma)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for c in range(channels):
        hs, vs = samp[c]
        sof += bytes([c + 1, (hs << 4) | vs, 0 if c == 0 else 1])
    out += seg(0xC0, sof)  # SOF0 baseline
    for tclass, tid, (bits, vals) in (
        (0, 0, _JPEG_DC_LUM),
        (1, 0, _JPEG_AC_LUM),
        (0, 1, _JPEG_DC_CHR),
        (1, 1, _JPEG_AC_CHR),
    )[: 2 if channels == 1 else 4]:
        out += seg(
            0xC4,
            bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals),
        )
    sos = bytes([channels])
    for c in range(channels):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 un-stuffing; an unexpected
    marker inside the scan raises ValueError (truncated stream)."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.buf):
                raise ValueError("entropy stream exhausted mid-block")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf):
                    raise ValueError("dangling 0xFF at end of scan")
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan"
                    )
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value decode map from a DHT's BITS/HUFFVAL."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_read(r: "_BitReader", table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in scan")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` offset bits to a signed level."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """A REAL (pure-python, stdlib+numpy) baseline JPEG decoder: marker
    walk, DQT/DHT/SOF0/SOS parsing, Huffman entropy decode with byte
    un-stuffing and restart-marker handling, dequantization, zigzag
    inversion, float IDCT, level shift, and JFIF YCbCr→RGB conversion.
    Supports 8-bit baseline (SOF0) grayscale and 4:4:4 / 4:2:2 / 4:2:0
    color (interleaved MCUs, nearest chroma upsampling); progressive
    (SOF2), arithmetic-coded (SOF9+), hierarchical, 12-bit, and
    sampling factors above 2 raise UnsupportedCodecError (the routes a
    native-codec build would widen); malformed streams raise ValueError.
    Returns (width, height, channels, RGB/gray raster bytes)."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise UnsupportedCodecError(
            f"unsupported codec magic {payload[:4]!r} (JPEG SOI expected)"
        )
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (size,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + size]
        if len(data) != size - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:  # DQT
            dpos = 0
            while dpos < len(data):
                prec, tid = data[dpos] >> 4, data[dpos] & 0xF
                if prec:
                    raise UnsupportedCodecError("16-bit quant tables not supported")
                qtabs[tid] = np.frombuffer(
                    data[dpos + 1 : dpos + 65], dtype=np.uint8
                ).astype(np.int64)
                dpos += 65
        elif marker == 0xC4:  # DHT
            dpos = 0
            while dpos < len(data):
                tclass, tid = data[dpos] >> 4, data[dpos] & 0xF
                bits = list(data[dpos + 1 : dpos + 17])
                n = sum(bits)
                vals = list(data[dpos + 17 : dpos + 17 + n])
                htabs[(tclass, tid)] = _huff_decoder(bits, vals)
                dpos += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            sof = data
        elif marker == 0xC2:  # SOF2 progressive — its own multi-scan walk
            return _decode_jpeg_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            kind = {
                0xC9: "arithmetic-coded (SOF9)",
                0xCA: "arithmetic progressive (SOF10)",
            }.get(marker, f"SOF{marker - 0xC0}")
            raise UnsupportedCodecError(
                f"{kind} JPEG not supported (baseline/progressive only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data)
        elif marker == 0xDA:  # SOS — entropy data follows
            scan = (data, pos + 2 + size)
            break
        pos += 2 + size
    if sof is None or scan is None:
        raise ValueError("missing SOF0 or SOS segment")
    depth, height, width, ncomp = struct.unpack(">BHHB", sof[:6])
    if depth != 8:
        raise UnsupportedCodecError(f"{depth}-bit JPEG not supported (8 only)")
    if ncomp not in (1, 3):
        raise UnsupportedCodecError(f"{ncomp}-component JPEG not supported")
    if width <= 0 or height <= 0:
        raise ValueError(f"non-positive dimensions {width}x{height}")
    comps = []
    for c in range(ncomp):
        cid, samp, qid = sof[6 + 3 * c : 9 + 3 * c]
        hs, vs = samp >> 4, samp & 0xF
        if hs not in (1, 2) or vs not in (1, 2):
            raise UnsupportedCodecError(
                f"sampling factors {hs}x{vs} not supported (1 or 2 only)"
            )
        if c > 0 and (hs, vs) != (1, 1):
            raise UnsupportedCodecError(
                "subsampled-luma / oversampled-chroma JPEG not supported"
            )
        if qid not in qtabs:
            raise ValueError(f"component {cid} references missing quant table {qid}")
        comps.append((cid, qtabs[qid], hs, vs))
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    if ncomp == 1 and (hmax, vmax) != (1, 1):
        raise UnsupportedCodecError("subsampled grayscale JPEG not supported")
    sos_data, epos = scan
    ns = sos_data[0]
    if ns != ncomp:
        raise UnsupportedCodecError("multi-scan JPEG not supported (interleaved only)")
    ctabs = []
    for c in range(ns):
        cid, tsel = sos_data[1 + 2 * c : 3 + 2 * c]
        dc_t = htabs.get((0, tsel >> 4))
        ac_t = htabs.get((1, tsel & 0xF))
        if dc_t is None or ac_t is None:
            raise ValueError(f"scan component {cid} references missing DHT")
        ctabs.append((dc_t, ac_t))

    # entropy segment runs to EOI; restart markers are consumed inline
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI marker")
    entropy = payload[epos:end]

    A = _dct_matrix()
    zz = np.array(_zigzag_order(), dtype=np.int64)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    nmx = (width + mcu_w - 1) // mcu_w
    nmy = (height + mcu_h - 1) // mcu_h
    # per-component planes at the component's own resolution; chroma
    # upsamples AFTER the scan (nearest — the box-mean inverse)
    planes = [
        np.zeros((nmy * vs * 8, nmx * hs * 8), dtype=np.uint8)
        for _cid, _q, hs, vs in comps
    ]
    pred = [0] * ncomp
    r = _BitReader(entropy)
    mcu = 0
    seg_pos = 0  # reader restart bookkeeping
    for my in range(nmy):
        for mx in range(nmx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align and consume the RSTn marker
                r.n = 0
                p = seg_pos + r.pos
                while p + 1 < len(entropy) and entropy[p] == 0xFF and (
                    0xD0 <= entropy[p + 1] <= 0xD7
                ):
                    p += 2
                    break
                if p == seg_pos + r.pos:
                    raise ValueError(f"missing restart marker before MCU {mcu}")
                r = _BitReader(entropy[p:])
                seg_pos = p
                pred = [0] * ncomp
            for c in range(ncomp):
                dc_t, ac_t = ctabs[c]
                hs, vs = comps[c][2], comps[c][3]
                for v in range(vs):
                    for hh in range(hs):
                        size = _huff_read(r, dc_t)
                        diff = _extend(r.bits(size), size) if size else 0
                        pred[c] += diff
                        coef = np.zeros(64, dtype=np.int64)
                        coef[0] = pred[c]
                        k = 1
                        while k < 64:
                            rs = _huff_read(r, ac_t)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(r.bits(size), size)
                            k += 1
                        deq = (coef * comps[c][1]).astype(np.float64)
                        block = np.zeros(64)
                        block[zz] = deq
                        pix = A.T @ block.reshape(8, 8) @ A + 128.0
                        by = (my * vs + v) * 8
                        bx = (mx * hs + hh) * 8
                        planes[c][by : by + 8, bx : bx + 8] = np.clip(
                            np.floor(pix + 0.5), 0, 255
                        ).astype(np.uint8)
            mcu += 1
    full = np.empty((height, width, ncomp), dtype=np.uint8)
    for c in range(ncomp):
        hs, vs = comps[c][2], comps[c][3]
        plane = planes[c]
        if (hs, vs) != (hmax, vmax):
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full[:, :, c] = plane[:height, :width]
    img = full
    if ncomp == 3:
        img = _ycbcr_to_rgb(img)
    return width, height, ncomp, img.tobytes()


JPEG_DECODED_SCHEMA = PNG_DECODED_SCHEMA  # same report shape


def decode_jpeg(media: DataFrame, on_error: str = "route") -> DataFrame:
    """Decode the payload column as baseline JPEG and emit per-channel
    pixel means — the lossy-format sibling of ``decode_png``, same Arrow
    ``mapInPandas`` contract: columnar batches, bounded memory, partition
    preserved, no shuffle. Grayscale reports its mean in mean_r with
    mean_g/mean_b NULL. Same reject-routing/fail-fast error topology as
    the other decoders (progressive/arithmetic/subsampled streams land
    in ``err`` under ``on_error='route'``)."""
    import numpy as np

    if on_error not in ("route", "raise"):
        raise ValueError(f"on_error must be 'route' or 'raise', got {on_error!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("width", "height", "channels", "mean_r", "mean_g", "mean_b", "err")
        for pdf in it:
            if not len(pdf):
                continue
            out = {k: [] for k in ("doc_id", *cols)}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, ch, raster = _decode_jpeg(bytes(buf))
                    px = np.frombuffer(raster, dtype=np.uint8).reshape(-1, ch)
                    sums = px.astype(np.int64).sum(axis=0)
                    n = len(px)
                    means = [
                        float(np.floor(s / n * 1e6 + 0.5) / 1e6) for s in sums
                    ]
                    while len(means) < 3:
                        means.append(None)
                    vals = [w, h, ch, *means, None]
                except (UnsupportedCodecError, ValueError) as e:
                    if on_error == "raise":
                        raise
                    vals = [None] * 6 + [str(e)]
                out["doc_id"].append(doc_id)
                for k, v in zip(cols, vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=JPEG_DECODED_SCHEMA)


def with_jpeg_payload(
    documents: DataFrame,
    subsampling: str = "444",
    progressive: bool = False,
) -> DataFrame:
    """Deterministic JPEG test corpus: per doc a FLAT 16×16 RGB tile whose
    color is the first three bytes of md5(text), serialized by the real
    baseline encoder at flat quantization 1. A flat tile's DCT is DC-only
    and quant=1 keeps the DC exact, so the decoded pixels equal the
    double color conversion RGB→YCbCr→RGB (floor(x+0.5) rounding both
    ways) — a pure formula DuckDB replays from md5(text), which keeps the
    registered query oracle-checked even though JPEG is lossy in general
    (the encoder's AC/Huffman paths are exercised by the non-flat pytest
    round-trips).

    The input is ``spread()`` first: a small documents table arrives as
    ONE scan split, and the per-doc encode+decode python (~0.8 ms/doc)
    would serialize through a single task — measured 4.1 s at sf0.1
    single-task vs sub-second spread across the session's parallelism
    (at 100 TB the scan has thousands of splits and spread is a no-op).
    """
    import hashlib

    from ..functions.partitioning import spread

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            payloads = []
            for text in pdf["text"]:
                d = hashlib.md5((text or "").encode("utf-8")).digest()
                tile = bytes(d[:3]) * (PPM_TILE_W * PPM_TILE_H)
                payloads.append(
                    encode_jpeg_progressive(PPM_TILE_W, PPM_TILE_H, tile)
                    if progressive
                    else encode_jpeg(
                        PPM_TILE_W,
                        PPM_TILE_H,
                        tile,
                        subsampling=subsampling,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return spread(documents.select("doc_id", "text")).mapInPandas(
        batches, schema="doc_id long, payload binary"
    )


# --- progressive JPEG (SOF2) -------------------------------------------------
#
# The route the baseline decoder's reject-routing reserved: spectral
# selection (per-band scans), successive approximation (high-bits-first
# with refinement scans), EOBn end-of-band runs, restart intervals.
# Implements ITU-T T.81 Annex G (G.1 encode / G.2 decode) from the public
# spec — the same scan discipline libjpeg's phuff codecs follow.


def _progressive_ac_huff() -> tuple[list[int], list[int]]:
    """AC Huffman table for the progressive ENCODER: Annex K's baseline AC
    tables define no EOBn symbols (n ≥ 1), so progressive scans need their
    own table (libjpeg generates optimal ones). One flat canonical table —
    every symbol this encoder can emit at 8 bits (176 < 255, so the
    all-ones code stays unassigned per C.2): EOB0..EOB14, ZRL, and every
    (run, size) with size 1..10."""
    syms = [r << 4 for r in range(15)]  # EOBn
    syms.append(0xF0)  # ZRL
    syms += [(r << 4) | s for r in range(16) for s in range(1, 11)]
    bits = [0] * 16
    bits[7] = len(syms)  # all codes 8 bits long
    return bits, syms


def _quantized_blocks(
    width: int, height: int, raster: bytes, channels: int, quant: int
) -> tuple[list[list["np.ndarray"]], int, int]:
    """Per-component zigzag-quantized coefficient blocks in raster order
    (4:4:4 — every component shares the 8×8 block grid), replicate-padded
    like the baseline encoder. Returns (blocks[c][bi], nbx, nby)."""
    import numpy as np

    px = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    comps = _rgb_to_ycbcr(px) if channels == 3 else px.astype(np.float64)
    A = _dct_matrix()
    zz = _zigzag_order()
    pad_w = (width + 7) // 8 * 8
    pad_h = (height + 7) // 8 * 8
    padded = np.empty((pad_h, pad_w, channels), dtype=np.float64)
    padded[:height, :width] = comps
    padded[height:, :width] = comps[-1:, :, :]
    padded[:, width:] = padded[:, width - 1 : width, :]
    nbx, nby = pad_w // 8, pad_h // 8
    blocks: list[list[np.ndarray]] = [[] for _ in range(channels)]
    for c in range(channels):
        for by in range(nby):
            for bx in range(nbx):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c]
                F2 = A @ (blk - 128.0) @ A.T
                q = np.floor(F2.flatten() / quant + 0.5).astype(np.int64)
                blocks[c].append(q[zz])
    return blocks, nbx, nby


class _ProgressiveACWriter:
    """Per-scan AC emission state: EOBRUN accumulation plus the buffered
    correction bits that must follow a deferred EOBn (T.81 G.1.2.3)."""

    def __init__(self, w: "_BitWriter", table: dict[int, tuple[int, int]]):
        self.w = w
        self.table = table
        self.eobrun = 0
        self.pending: list[int] = []

    def sym(self, s: int) -> None:
        code, ln = self.table[s]
        self.w.put(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun == 0:
            return
        r = self.eobrun.bit_length() - 1
        self.sym(r << 4)
        if r:
            self.w.put(self.eobrun - (1 << r), r)
        self.eobrun = 0
        for b in self.pending:
            self.w.put(b, 1)
        self.pending = []

    def end_block(self, extra_bits: list[int]) -> None:
        """The band ended with trailing zero-history positions (or pending
        corrections): defer one EOB, buffering this block's remaining
        correction bits behind it."""
        self.eobrun += 1
        self.pending.extend(extra_bits)
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def encode_jpeg_progressive(
    width: int,
    height: int,
    raster: bytes,
    channels: int = 3,
    quant: int = 1,
) -> bytes:
    """Serialize a progressive JFIF JPEG (SOF2, 4:4:4) with the canonical
    libjpeg-shaped scan script — the test-vector generator for the real
    progressive decode, exercising every Annex G feature:

    1. DC, interleaved, successive approximation Al=1
    2. DC refinement (raw bits, Ah=1 → Al=0)
    3. per component: AC band 1–5, first pass Al=1 (EOBn runs)
    4. per component: AC band 6–63, first pass Al=1
    5. per component: AC band 1–5 refinement (correction bits)
    6. per component: AC band 6–63 refinement

    The quantized coefficients transmitted are IDENTICAL to what
    ``encode_jpeg`` sends for the same input (the scans only reorder the
    bits), so progressive decode ≡ baseline decode bit-for-bit — the
    round-trip pin the tests use. Flat tiles at quant=1 stay exact."""
    import numpy as np  # noqa: F401  (blocks come back as numpy arrays)

    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(raster) != width * height * channels:
        raise ValueError(
            f"raster is {len(raster)} bytes, need {width}x{height}x{channels}"
        )
    blocks, nbx, nby = _quantized_blocks(width, height, raster, channels, quant)
    dc_tabs = [_huff_codes(*_JPEG_DC_LUM)] + [_huff_codes(*_JPEG_DC_CHR)] * 2
    ac_bits, ac_vals = _progressive_ac_huff()
    ac_tab = _huff_codes(ac_bits, ac_vals)

    def seg(marker: int, data: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    def sos(comp_ids: list[int], tsels: list[int], ss: int, se: int,
            ah: int, al: int, entropy: bytes) -> bytes:
        hdr = bytes([len(comp_ids)])
        for cid, t in zip(comp_ids, tsels):
            hdr += bytes([cid, t])
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + entropy

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qz = bytes([quant]) * 64
    out += seg(0xDB, b"\x00" + qz)
    if channels == 3:
        out += seg(0xDB, b"\x01" + qz)
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for c in range(channels):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += seg(0xC2, sof)  # SOF2 progressive
    for tclass, tid, (bits, vals) in (
        (0, 0, _JPEG_DC_LUM),
        (1, 0, (ac_bits, ac_vals)),
        (0, 1, _JPEG_DC_CHR),
        (1, 1, (ac_bits, ac_vals)),
    )[: 2 if channels == 1 else 4]:
        out += seg(0xC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))

    all_ids = [c + 1 for c in range(channels)]
    nblocks = nbx * nby

    # scan 1: DC first pass, interleaved, Al=1
    w = _BitWriter()
    pred = [0] * channels
    for bi in range(nblocks):
        for c in range(channels):
            v = int(blocks[c][bi][0]) >> 1  # arithmetic shift (G.1.2.1)
            diff = v - pred[c]
            pred[c] = v
            size, bits_ = _jpeg_magnitude(diff)
            code, ln = dc_tabs[c][size]
            w.put(code, ln)
            if size:
                w.put(bits_, size)
    out += sos(all_ids, [0x00 if c == 0 else 0x10 for c in range(channels)],
               0, 0, 0, 1, w.flush())

    # scan 2: DC refinement, one raw bit per block (Ah=1 → Al=0)
    w = _BitWriter()
    for bi in range(nblocks):
        for c in range(channels):
            w.put((int(blocks[c][bi][0]) >> 0) & 1, 1)
    out += sos(all_ids, [0x00] * channels, 0, 0, 1, 0, w.flush())

    def ac_first(c: int, ss: int, se: int, al: int) -> bytes:
        w = _BitWriter()
        aw = _ProgressiveACWriter(w, ac_tab)
        for bi in range(nblocks):
            zq = blocks[c][bi]
            vt = [
                (abs(int(zq[k])) >> al) * (1 if zq[k] >= 0 else -1)
                for k in range(ss, se + 1)
            ]
            last_nz = max((i for i, v in enumerate(vt) if v), default=-1)
            if last_nz < 0:
                aw.end_block([])
                continue
            aw.flush_eob()
            run = 0
            for v in vt[: last_nz + 1]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    aw.sym(0xF0)
                    run -= 16
                size, bits_ = _jpeg_magnitude(v)
                aw.sym((run << 4) | size)
                w.put(bits_, size)
                run = 0
            if last_nz < se - ss:
                aw.end_block([])
        aw.flush_eob()
        return w.flush()

    def ac_refine(c: int, ss: int, se: int, al: int) -> bytes:
        # T.81 G.1.2.3 / the jcphuff discipline: newly-significant coeffs
        # (|v|>>Al == 1) get (run-of-zero-history, size 1) codes + a sign
        # bit; already-nonzero coeffs crossed on the way contribute one
        # buffered correction bit each, emitted right after the symbol
        # (or behind the deferred EOBn)
        w = _BitWriter()
        aw = _ProgressiveACWriter(w, ac_tab)
        for bi in range(nblocks):
            zq = blocks[c][bi]
            tvals = [abs(int(zq[k])) >> al for k in range(ss, se + 1)]
            # last newly-significant position: ZRLs are only legal inside
            # this span (beyond it the deferred EOB covers the zeros)
            eob_idx = max((i for i, t in enumerate(tvals) if t == 1), default=-1)
            run = 0
            corr: list[int] = []
            for i, t in enumerate(tvals):
                if t == 0:
                    run += 1
                    continue
                # ZRL must interleave POSITIONALLY with the correction-bit
                # buffer: the decoder consumes a history coefficient's bit
                # while sweeping the 16-zero stretch it lies in, so flush
                # before buffering any bit that lies past the stretch
                while run > 15 and i <= eob_idx:
                    aw.flush_eob()
                    aw.sym(0xF0)
                    for b in corr:
                        w.put(b, 1)
                    corr = []
                    run -= 16
                if t > 1:  # history-nonzero → correction bit
                    corr.append(t & 1)
                    continue
                # newly significant
                aw.flush_eob()
                aw.sym((run << 4) | 1)
                w.put(1 if zq[ss + i] >= 0 else 0, 1)
                for b in corr:
                    w.put(b, 1)
                corr = []
                run = 0
            if run > 0 or corr:
                aw.end_block(corr)
        aw.flush_eob()
        return w.flush()

    bands = [(1, 5), (6, 63)]
    for ss, se in bands:
        for c in range(channels):
            out += sos([c + 1], [0x00 if c == 0 else 0x01], ss, se, 0, 1,
                       ac_first(c, ss, se, 1))
    for ss, se in bands:
        for c in range(channels):
            out += sos([c + 1], [0x00 if c == 0 else 0x01], ss, se, 1, 0,
                       ac_refine(c, ss, se, 0))
    out += b"\xff\xd9"
    return bytes(out)


def _scan_entropy_end(payload: bytes, pos: int) -> int:
    """Index of the first real marker (not stuffing, not RSTn) at/after
    ``pos`` — the end of a scan's entropy segment."""
    p = pos
    while True:
        p = payload.find(b"\xff", p)
        if p < 0 or p + 1 >= len(payload):
            raise ValueError("entropy segment runs past end of stream")
        nxt = payload[p + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            p += 2
            continue
        return p


def _decode_jpeg_progressive(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL progressive JPEG (SOF2) decoder — T.81 Annex G.2: multi-scan
    marker walk (DHT/DQT may be redefined between scans), spectral
    selection, successive approximation (DC raw-bit refinement, AC
    correction-bit refinement with EOBn end-of-band runs), restart
    intervals, then one dequantize + IDCT + upsample + color convert over
    the accumulated coefficient arrays. Grayscale and 4:4:4/4:2:2/4:2:0
    color, 8-bit; arithmetic coding and 12-bit reject upstream."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise UnsupportedCodecError(
            f"unsupported codec magic {payload[:4]!r} (JPEG SOI expected)"
        )
    pos = 2
    qtabs: dict[int, "np.ndarray"] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (cid, qid, hs, vs)
    coefs: list["np.ndarray"] = []  # per comp: (blocks_y, blocks_x, 64)
    eobrun = 0
    hmax = vmax = 1
    nmx = nmy = 0
    width = height = ncomp = 0

    def comp_grid(ci: int, interleaved: bool) -> tuple[int, int]:
        _cid, _q, hs, vs = comps[ci]
        if interleaved:
            return nmy * vs, nmx * hs
        cw = (width * hs + hmax - 1) // hmax
        ch = (height * vs + vmax - 1) // vmax
        return (ch + 7) // 8, (cw + 7) // 8

    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated marker segment")
        (size,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + size]
        if len(data) != size - 2:
            raise ValueError(f"truncated segment 0xFF{marker:02X}")
        if marker == 0xDB:
            dpos = 0
            while dpos < len(data):
                prec, tid = data[dpos] >> 4, data[dpos] & 0xF
                if prec:
                    raise UnsupportedCodecError("16-bit quant tables not supported")
                qtabs[tid] = np.frombuffer(
                    data[dpos + 1 : dpos + 65], dtype=np.uint8
                ).astype(np.int64)
                dpos += 65
        elif marker == 0xC4:
            dpos = 0
            while dpos < len(data):
                tclass, tid = data[dpos] >> 4, data[dpos] & 0xF
                bits = list(data[dpos + 1 : dpos + 17])
                n = sum(bits)
                vals = list(data[dpos + 17 : dpos + 17 + n])
                htabs[(tclass, tid)] = _huff_decoder(bits, vals)
                dpos += 17 + n
        elif marker == 0xC2:
            sof = data
            depth, height, width, ncomp = struct.unpack(">BHHB", sof[:6])
            if depth != 8:
                raise UnsupportedCodecError(f"{depth}-bit JPEG not supported")
            if ncomp not in (1, 3):
                raise UnsupportedCodecError(
                    f"{ncomp}-component JPEG not supported"
                )
            if width <= 0 or height <= 0:
                raise ValueError(f"non-positive dimensions {width}x{height}")
            for c in range(ncomp):
                cid, samp, qid = sof[6 + 3 * c : 9 + 3 * c]
                hs, vs = samp >> 4, samp & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise UnsupportedCodecError(
                        f"sampling factors {hs}x{vs} not supported"
                    )
                comps.append((cid, qid, hs, vs))
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            nmx = (width + 8 * hmax - 1) // (8 * hmax)
            nmy = (height + 8 * vmax - 1) // (8 * vmax)
            coefs = [
                np.zeros((nmy * vs, nmx * hs, 64), dtype=np.int64)
                for _cid, _q, hs, vs in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("mixed/duplicate SOF in progressive stream")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", data)
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before SOF2")
            ns = data[0]
            scomps = []
            for c in range(ns):
                cid, tsel = data[1 + 2 * c : 3 + 2 * c]
                ci = next(
                    (i for i, cc in enumerate(comps) if cc[0] == cid), None
                )
                if ci is None:
                    raise ValueError(f"scan references unknown component {cid}")
                scomps.append((ci, tsel >> 4, tsel & 0xF))
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if ss == 0 and se != 0:
                raise ValueError("progressive scan with Ss=0 must have Se=0")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            if se > 63 or ss > se:
                raise ValueError(f"bad spectral band {ss}..{se}")
            entropy_start = pos + 2 + size
            entropy_end = _scan_entropy_end(payload, entropy_start)
            # split on restart markers: each sub-segment resets predictors
            segs = []
            p0 = entropy_start
            p = p0
            while p < entropy_end:
                p = payload.find(b"\xff", p, entropy_end)
                if p < 0:
                    break
                if 0xD0 <= payload[p + 1] <= 0xD7:
                    segs.append(payload[p0:p])
                    p0 = p = p + 2
                else:
                    p += 2
            segs.append(payload[p0:entropy_end])
            _decode_progressive_scan(
                scomps, ss, se, ah, al, segs, restart_interval,
                htabs, coefs, comps, nmx, nmy, comp_grid,
            )
            pos = entropy_end
            continue
        pos += 2 + size

    if sof is None:
        raise ValueError("missing SOF2 segment")

    A = _dct_matrix()
    zz = np.array(_zigzag_order(), dtype=np.int64)
    planes = []
    for ci, (cid, qid, hs, vs) in enumerate(comps):
        if qid not in qtabs:
            raise ValueError(f"component {cid} references missing quant table {qid}")
        grid = coefs[ci]
        by, bx = grid.shape[0], grid.shape[1]
        plane = np.zeros((by * 8, bx * 8), dtype=np.uint8)
        q = qtabs[qid]
        for yy in range(by):
            for xx in range(bx):
                deq = (grid[yy, xx] * q).astype(np.float64)
                block = np.zeros(64)
                block[zz] = deq
                pix = A.T @ block.reshape(8, 8) @ A + 128.0
                plane[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8] = np.clip(
                    np.floor(pix + 0.5), 0, 255
                ).astype(np.uint8)
        if (hs, vs) != (hmax, vmax):
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:height, :width])
    full = np.stack(planes, axis=2)
    img = _ycbcr_to_rgb(full) if ncomp == 3 else full
    return width, height, ncomp, img.tobytes()


def _decode_progressive_scan(
    scomps, ss, se, ah, al, segs, restart_interval,
    htabs, coefs, comps, nmx, nmy, comp_grid,
) -> None:
    """One SOS worth of entropy decode into the coefficient arrays —
    dispatches DC-first / DC-refine / AC-first / AC-refine per T.81 G.2,
    resetting predictors and EOB runs at each restart sub-segment."""
    interleaved = len(scomps) > 1
    if ss == 0:
        # DC scan: iterate the MCU grid (interleaved) or the single
        # component's block grid
        units: list[tuple[int, int, int]] = []  # (ci, by, bx)
        if interleaved:
            for my in range(nmy):
                for mx in range(nmx):
                    for ci, _td, _ta in scomps:
                        _cid, _q, hs, vs = comps[ci]
                        for v in range(vs):
                            for hh in range(hs):
                                units.append((ci, my * vs + v, mx * hs + hh))
            per_mcu = sum(comps[ci][2] * comps[ci][3] for ci, _t, _a in scomps)
        else:
            ci = scomps[0][0]
            gy, gx = comp_grid(ci, False)
            units = [(ci, yy, xx) for yy in range(gy) for xx in range(gx)]
            per_mcu = 1
        if ah == 0:
            tabs = {}
            for ci, td, _ta in scomps:
                t = htabs.get((0, td))
                if t is None:
                    raise ValueError(f"DC scan references missing DHT {td}")
                tabs[ci] = t
        ui = 0
        for si, seg_bytes in enumerate(segs):
            r = _BitReader(seg_bytes)
            pred = {ci: 0 for ci, _t, _a in scomps}
            n_units = (
                restart_interval * per_mcu
                if restart_interval and si < len(segs) - 1
                else len(units) - ui
            )
            for _ in range(n_units):
                ci, by, bx = units[ui]
                ui += 1
                if ah == 0:
                    size = _huff_read(r, tabs[ci])
                    diff = _extend(r.bits(size), size) if size else 0
                    pred[ci] += diff
                    coefs[ci][by, bx, 0] = pred[ci] << al
                else:
                    if r.bit():
                        coefs[ci][by, bx, 0] |= 1 << al
        return

    # AC scan: one component, its own block grid
    ci, _td, ta = scomps[0]
    act = htabs.get((1, ta))
    if act is None:
        raise ValueError(f"AC scan references missing DHT {ta}")
    gy, gx = comp_grid(ci, False)
    blocks = [(yy, xx) for yy in range(gy) for xx in range(gx)]
    p1, m1 = 1 << al, -(1 << al)
    bi = 0
    for si, seg_bytes in enumerate(segs):
        r = _BitReader(seg_bytes)
        eobrun = 0
        n_units = (
            restart_interval
            if restart_interval and si < len(segs) - 1
            else len(blocks) - bi
        )
        for _ in range(n_units):
            yy, xx = blocks[bi]
            bi += 1
            cf = coefs[ci][yy, xx]
            if ah == 0:  # AC first pass (G.2.2)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_read(r, act)
                    rr, s = rs >> 4, rs & 0xF
                    if s:
                        k += rr
                        if k > se:
                            raise ValueError("AC run past band end")
                        cf[k] = _extend(r.bits(s), s) << al
                        k += 1
                    else:
                        if rr != 15:
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        k += 16
            else:  # AC refinement (G.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_read(r, act)
                        rr, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s == 0:
                            if rr != 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.bits(rr)
                                break  # sweep the rest of the band below
                            # ZRL: skip 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement scan with size > 1"
                                )
                            newval = p1 if r.bit() else m1
                        while k <= se:
                            if cf[k] != 0:
                                if r.bit() and (int(cf[k]) & p1) == 0:
                                    cf[k] += p1 if cf[k] >= 0 else m1
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if newval:
                            if k > se:
                                raise ValueError("refine run past band end")
                            cf[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if cf[k] != 0:
                            if r.bit() and (int(cf[k]) & p1) == 0:
                                cf[k] += p1 if cf[k] >= 0 else m1
                        k += 1
                    eobrun -= 1


# --- perceptual image hashing (aHash) + near-dup pairs ----------------------

AHASH_GRID = 8  # 8×8 = 64 mean-comparison bits
#: the 64-bit signature is carried as two 32-bit halves (a single long
#: would need bit 63 — the sign bit); eight 8-bit equality bands over
#: (lo, hi) give PIGEONHOLE-guaranteed full recall for hamming ≤ 7 (the
#: band width trades the recall bound against bucket count — 2^8 buckets
#: here; a billion-image corpus would widen bands and multi-probe, the
#: standard knob this operator exposes via AHASH_BANDS).
AHASH_BANDS = [(h, off) for h in ("lo", "hi") for off in (0, 8, 16, 24)]
AHASH_MAX_HAMMING = 7

AHASH_SCHEMA = "doc_id long, hi long, lo long, err string"


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash over REAL-decoded PPM payloads: gray-block
    means on an 8×8 grid, bit b = (block mean > global image mean) — the
    classic aHash, robust to re-encoding and brightness-preserving noise
    where ``frame_dedup``'s exact md5 is not. Arrow ``mapInPandas``
    (decode is Python byte-wrangling), reject-routing like decode_image.

    Pure INTEGER comparisons: gray = r+g+b (no /3), block mean > global
    mean ⇔ blocksum·npx > total·per_block — no float thresholds, so the
    oracle replays every bit exactly. Requires dimensions divisible by
    the grid (the synthesized 16×16 corpus is); others reject-route.
    """
    import numpy as np

    g8 = AHASH_GRID

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            out = {"doc_id": [], "hi": [], "lo": [], "err": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    w, h, _mx, raster = _decode_ppm(bytes(buf))
                    if w % g8 or h % g8:
                        raise UnsupportedCodecError(
                            f"aHash needs dimensions divisible by {g8}, got {w}x{h}"
                        )
                    px = (
                        np.frombuffer(raster, dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(h, w, 3)
                    )
                    gray = px.sum(axis=2)
                    bh, bw = h // g8, w // g8
                    blocks = gray.reshape(g8, bh, g8, bw).sum(axis=(1, 3))
                    total = int(gray.sum())
                    npx, per = h * w, bh * bw
                    bits = (blocks * npx > total * per).flatten()  # b = by*8+bx
                    lo = sum(1 << i for i in range(32) if bits[i])
                    hi = sum(1 << (i - 32) for i in range(32, 64) if bits[i])
                    vals = [hi, lo, None]
                except (UnsupportedCodecError, ValueError) as e:
                    vals = [None, None, str(e)]
                out["doc_id"].append(doc_id)
                for k, v in zip(("hi", "lo", "err"), vals):
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=AHASH_SCHEMA)


def image_phash_pairs(
    documents: DataFrame, max_hamming: int = AHASH_MAX_HAMMING
) -> DataFrame:
    """Perceptual near-dup image pairs by banded aHash — the PERCEPTUAL
    completion of the image-dedup story (``frame_dedup`` catches
    byte-identical frames; this catches re-encoded/slightly-noised ones).
    Candidates come from equi-joins on eight 8-bit signature bands
    (pigeonhole: hamming ≤ 7 ⇒ some band identical — full recall, no
    all-pairs; per-band fan-out bounded by band-bucket sizes), exact
    hamming is two xor+bit_count's on columns already in the row, and a
    pair colliding in several bands is kept only at its FIRST agreeing
    band (the simhash_pairs predicate trick — no distinct over the
    candidate set). One signature computation (Arrow decode pass) is
    shared by all bands and both join sides via cut_lineage.
    """
    assert max_hamming < len(AHASH_BANDS), "bands must outnumber differing bits"
    from ..functions.checkpoint import cut_lineage

    sig = cut_lineage(
        image_ahash(with_ppm_payload(documents))
        .filter(F.col("err").isNull())
        .select("doc_id", "hi", "lo")
    )

    # single-parse expr strings for the band projection and the
    # first-matching-band predicate: same trees as the former Column-API
    # loops (8 bands -> ~28 inequality terms), ~10x fewer py4j round trips
    def band_val_sql(side: str, j: int) -> str:
        col, off = AHASH_BANDS[j]
        return f"(shiftright({side}{col}, {off}) & 255)"

    band_vals = ", ".join(
        band_val_sql("", j) for j in range(len(AHASH_BANDS))
    )
    banded = sig.select(
        "doc_id", "hi", "lo",
        F.posexplode(F.expr(f"array({band_vals})")).alias("band", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = (
        F.bit_count(F.col("a.hi").bitwiseXOR(F.col("b.hi")))
        + F.bit_count(F.col("a.lo").bitwiseXOR(F.col("b.lo")))
    )
    fm = "false"
    for idx in range(len(AHASH_BANDS)):
        earlier_differ = " AND ".join(
            f"{band_val_sql('a.', j)} != {band_val_sql('b.', j)}"
            for j in range(idx)
        ) or "true"
        fm = f"CASE WHEN a.band = {idx} THEN ({earlier_differ}) ELSE {fm} END"
    first_match = F.expr(fm)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(first_match)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
