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
    PPM corpus'."""

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

    return documents.select("doc_id", "text").mapInPandas(
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
                # round half away from zero (like F.round/DuckDB round);
                # python round() is half-to-even and diverges on exact
                # dyadic midpoints such as k/128
                mean = int(a.sum()) / len(a) if len(a) else 0.0
                means.append(np.floor(mean * 1e6 + 0.5) / 1e6)
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
