"""Multimodal (image/audio/video) column handling.

Design: media are **opaque binary columns with typed metadata**, never
driver-side blobs:

* ingest via Spark's native ``binaryFile`` source (path, modification
  time, length, content) — distributed scan, one row per file;
* decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` stages with explicit output schemas —
  the executor-side pattern that scales to 100 TB (each batch touches
  only its partition's bytes; no shuffle added by decode).

Codec policy: 24-bit uncompressed BMP decode is REAL
(:func:`decode_bmp24`, pure stdlib — headers, padding, BGR order,
bottom-up and top-down layouts; gated end-to-end by q295's
encode→decode round-trip against a SQL pixel oracle), and so is
8-bit truecolor PNG (:func:`decode_png24`, pure stdlib — zlib
inflate, per-chunk CRC32, all five scanline unfilters; gated by
q297 the same way), and so is baseline sequential grayscale JPEG
(:func:`decode_jpeg_gray`, pure stdlib+numpy — marker walk, Annex-K
quant/Huffman tables, entropy decode with byte un-stuffing and RSTn
restarts, IDCT; gated by q299 on the constant-block-exact input
class), and so is animated GIF (:func:`decode_gif`, pure stdlib —
block walk with extension skipping, full LZW with variable code
widths and dictionary resets; lossless, so q300 gates per-frame
sampling exactly), and so is the WAV audio container
(:func:`decode_wav16`, RIFF chunk walker cross-validated against the
stdlib ``wave`` module; gated by q298). Codecs that
genuinely need absent libraries (color/progressive JPEG via Pillow,
compressed audio via librosa, video via ffmpeg) stay STUBBED: ``decode_fn`` defaults to a
deterministic fake deriving pseudo-features from the bytes' md5, and
the Spark-side plumbing — schemas, batching, partitioning, UDF
signatures — is real and tested, so swapping in a real decoder is a
one-function change (exactly what ``decode_bmp_features`` does).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "path string, n_bytes bigint, width int, height int, channels int, "
    "features array<float>"
)

FRAME_SAMPLE_SCHEMA = (
    "path string, frame_idx int, frame_ts_ms bigint, frame_md5 string"
)


def binary_folder(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Distributed binary-file scan (one row per file: path,
    modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def _fake_decode(content: bytes, n_features: int = 8) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decoder: pseudo dims and
    features from the content digest. Replace with Pillow/torchvision
    in production:

        raise NotImplementedError("image codec not available in this env")
    """
    digest = hashlib.md5(content).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channels = 1 + digest[2] % 3
    feats = [((b / 255.0) * 2.0 - 1.0) for b in digest[:n_features]]
    return width, height, channels, feats


def extract_image_features(
    binaries: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, int, list[float]]] = _fake_decode,
) -> DataFrame:
    """Arrow-batched decode + featurize over (path, content) rows.

    The per-batch loop runs executor-side; batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch``. Corrupt inputs
    yield a null-feature row instead of failing the task (the
    reference's warn-and-skip error policy, job-reader-jsons.js:41-44).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "path": [],
                "n_bytes": [],
                "width": [],
                "height": [],
                "channels": [],
                "features": [],
            }
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                out["path"].append(path)
                out["n_bytes"].append(len(raw))
                try:
                    w, h, c, feats = decode_fn(raw)
                except Exception:  # noqa: BLE001 - corrupt input policy
                    w = h = c = None
                    feats = None
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return binaries.select("path", "content").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


# ------------------------------------------------- real BMP codec
# (r7: one REAL image decode path, pure stdlib — the verdict ask; as
# of r9 the stub remains ONLY for library-bound formats — color/
# progressive JPEG, inter-predicted video, zstd/snappy — which are a
# documented deployment dependency, not an open item: see the
# "Codec closure" note in PARITY.md)

_BMP_HEADER = 14  # BITMAPFILEHEADER
_BMP_INFO = 40  # BITMAPINFOHEADER


def encode_bmp24(
    width: int, height: int, pixels: list[list[tuple[int, int, int]]]
) -> bytes:
    """Encode top-down RGB rows as a standard 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up row order, BGR byte order, rows
    padded to 4 bytes) — the file any image viewer opens."""
    import struct

    row_size = (3 * width + 3) // 4 * 4
    image_size = row_size * height
    offset = _BMP_HEADER + _BMP_INFO
    header = struct.pack("<2sIHHI", b"BM", offset + image_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        _BMP_INFO, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    body = bytearray()
    for y in range(height - 1, -1, -1):  # file stores rows bottom-up
        row = bytearray()
        for r, g, b in pixels[y]:
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        body += row
    return header + info + bytes(body)


def _corrupt_as_valueerror(fn):
    """Decoders document 'raises ValueError on corrupt input', but a
    truncated segment can surface as struct.error from unpack_from
    (ADVICE r8) — or as IndexError when a segment's LENGTH field is
    valid but its payload is shorter than the fields being indexed
    (e.g. a 3-byte SOS). In-repo callers catch broad Exception
    (warn-and-skip), but direct callers following the documented
    contract would miss both — normalize here so the contract is
    accurate."""
    import functools
    import struct

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except struct.error as exc:
            raise ValueError(f"truncated input: {exc}") from exc
        except IndexError as exc:
            # only IndexErrors RAISED by the byte-parsing code in this
            # module are 'truncated input'; one whose deepest frame is
            # in some other file is a genuine bug in a helper and must
            # propagate, not be swallowed by warn-and-skip callers
            # (ADVICE r9). numpy C-level bound errors surface at the
            # in-module call line and remain indistinguishable — the
            # decoders index numpy buffers only after length checks.
            tb = exc.__traceback__
            while tb is not None and tb.tb_next is not None:
                tb = tb.tb_next
            if tb is not None and tb.tb_frame.f_code.co_filename != __file__:
                raise
            raise ValueError(f"truncated input: {exc}") from exc

    return wrapped


@_corrupt_as_valueerror
def decode_bmp24(
    content: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Pure-stdlib decoder for 24-bit uncompressed BMP: parses the
    file + info headers, honors the pixel-array offset, row padding,
    BGR order, and both bottom-up (height > 0) and top-down
    (height < 0) layouts. Returns (width, height, top-down RGB rows).
    Raises ValueError on non-BMP or unsupported variants (those stay
    behind the stub/NotImplementedError policy)."""
    import struct

    if len(content) < _BMP_HEADER + _BMP_INFO or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < _BMP_INFO:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    if width <= 0 or height == 0:
        raise ValueError("bad dimensions")
    bottom_up = height > 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    if len(content) < offset + row_size * height:
        raise ValueError("truncated pixel array")
    rows = []
    for y in range(height):
        src = height - 1 - y if bottom_up else y
        base = offset + src * row_size
        rows.append(
            [
                (
                    content[base + 3 * x + 2],
                    content[base + 3 * x + 1],
                    content[base + 3 * x],
                )
                for x in range(width)
            ]
        )
    return width, height, rows


def decode_bmp_features(
    content: bytes,
) -> tuple[int, int, int, list[float]]:
    """Real-decode hook for :func:`extract_image_features`: parse the
    BMP and emit per-channel PIXEL SUMS as the feature vector
    (integers, exact in float32 at these sizes) — downstream selects
    derive mean RGB or hash them; corrupt bytes raise and flow into
    the null-row policy."""
    width, height, rows = decode_bmp24(content)
    sums = [0, 0, 0]
    for row in rows:
        for r, g, b in row:
            sums[0] += r
            sums[1] += g
            sums[2] += b
    return width, height, 3, [float(s) for s in sums]


# ------------------------------------------------- real PNG codec
# (r8: second real image decode path, pure stdlib — zlib inflate +
# CRC32 + all five scanline filters; gated end-to-end by q297's
# encode→decode round-trip against a SQL pixel oracle, mirroring the
# r7 BMP pattern. The NotImplementedError stub now remains only for
# JPEG/video, which genuinely need absent libraries.)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick the neighbor
    (left, up, up-left) closest to the linear estimate a + b - c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_filter(ft: int, line: bytes, prev: bytes, bpp: int = 3) -> bytes:
    """Apply scanline filter ``ft`` (0=None 1=Sub 2=Up 3=Average
    4=Paeth) to a raw row given the previous raw row."""
    n = len(line)
    out = bytearray(n)
    for i in range(n):
        left = line[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        elif ft == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"bad filter type {ft}")
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def _png_unfilter(ft: int, cur: bytearray, prev: bytes, bpp: int = 3) -> None:
    """Reverse a scanline filter in place."""
    n = len(cur)
    for i in range(n):
        left = cur[i - bpp] if i >= bpp else 0
        up = prev[i]
        upleft = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = left
        elif ft == 2:
            pred = up
        elif ft == 3:
            pred = (left + up) >> 1
        elif ft == 4:
            pred = _paeth(left, up, upleft)
        else:
            raise ValueError(f"bad filter type {ft}")
        cur[i] = (cur[i] + pred) & 0xFF


def encode_png24(
    width: int,
    height: int,
    pixels: list[list[tuple[int, int, int]]],
    filters: list[int] | None = None,
) -> bytes:
    """Encode top-down RGB rows as a standard 8-bit truecolor PNG
    (IHDR colortype 2, non-interlaced, zlib-compressed IDAT, CRC32
    per chunk) — the file any image viewer opens. ``filters`` sets
    the per-row scanline filter schedule (default: cycle 0..4), so
    the encoder deliberately emits EVERY filter type and acts as the
    decoder's adversary in tests and the q297 gate."""
    import struct
    import zlib

    raw = bytearray()
    prev = bytes(3 * width)
    for y in range(height):
        line = bytes(v for px in pixels[y] for v in px)
        ft = filters[y % len(filters)] if filters else y % 5
        raw.append(ft)
        raw += _png_filter(ft, line, prev)
        prev = line

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


@_corrupt_as_valueerror
def decode_png24(
    content: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Pure-stdlib decoder for 8-bit truecolor non-interlaced PNG:
    verifies the signature and every chunk's CRC32, walks the chunk
    stream (multiple IDATs concatenate), inflates with zlib, and
    reverses all five scanline filters (None/Sub/Up/Average/Paeth).
    Returns (width, height, top-down RGB rows). Raises ValueError on
    non-PNG or unsupported variants (palette, alpha, 16-bit,
    interlaced stay behind the stub/NotImplementedError policy)."""
    import struct
    import zlib

    if len(content) < 8 or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(content):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError("only 8-bit truecolor non-interlaced supported")
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    raw = zlib.decompress(bytes(idat))
    stride = 3 * width
    if len(raw) != height * (1 + stride):
        raise ValueError("bad decompressed length")
    rows, prev = [], bytes(stride)
    for y in range(height):
        base = y * (1 + stride)
        cur = bytearray(raw[base + 1 : base + 1 + stride])
        _png_unfilter(raw[base], cur, prev)
        rows.append(
            [tuple(cur[3 * x : 3 * x + 3]) for x in range(width)]
        )
        prev = bytes(cur)
    return width, height, rows


# PNG variant support (r10): the web's PNGs are mostly NOT 8-bit
# truecolor progressive-free files — palette (ctype 3), grayscale
# (0), alpha channels (4/6), sub-byte depths, 16-bit, and Adam7
# interlacing are all common. decode_png handles every legal
# depth/ctype combination and both interlace modes; decode_png24
# stays as the strict truecolor-only decoder (its rejections are
# load-bearing for older tests/gates).

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
    4: (8, 16), 6: (8, 16),
}
# Adam7 pass origins/strides (x0, y0, dx, dy), PNG spec §8.2
_PNG_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_pack_bits(samples, depth: int, stride: int) -> bytes:
    """Pack sub-byte samples MSB-first into a scanline of ``stride``
    bytes (trailing pad bits zero)."""
    out = bytearray(stride)
    bitpos = 0
    for v in samples:
        byte_i, shift = bitpos // 8, 8 - depth - (bitpos % 8)
        out[byte_i] |= (v & ((1 << depth) - 1)) << shift
        bitpos += depth
    return bytes(out)


def _png_unpack_samples(line: bytes, depth: int, count: int) -> list[int]:
    """Unpack ``count`` samples from a scanline (MSB-first sub-byte
    packing; 16-bit keeps the HIGH byte, the standard 8-bit
    reduction)."""
    if depth == 8:
        return list(line[:count])
    if depth == 16:
        return [line[2 * i] for i in range(count)]
    out = []
    mask = (1 << depth) - 1
    for i in range(count):
        bitpos = i * depth
        out.append((line[bitpos // 8] >> (8 - depth - bitpos % 8)) & mask)
    return out


def encode_png(
    width: int,
    height: int,
    pixels,
    color_type: int = 2,
    bit_depth: int = 8,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: int = 0,
    filters: list[int] | None = None,
) -> bytes:
    """General deterministic PNG writer for gates and tests: gray (0),
    truecolor (2), palette (3, with PLTE), gray+alpha (4), RGBA (6);
    bit depths 1/2/4/8 where legal; interlace 0 or 1 (Adam7 — each
    pass filters independently, per spec). ``pixels[y][x]`` is an int
    for 1-channel types, a tuple otherwise."""
    import struct
    import zlib

    ch = _PNG_CHANNELS[color_type]
    if bit_depth not in _PNG_DEPTHS[color_type] or bit_depth == 16:
        raise ValueError("unsupported encode depth for color type")
    if color_type == 3 and not palette:
        raise ValueError("palette color type needs a palette")

    def pass_bytes(ys, xs):
        out = bytearray()
        bits = bit_depth * ch
        stride = (bits * len(xs) + 7) // 8
        bpp = max(1, bits // 8)
        prev = bytes(stride)
        for ri, y in enumerate(ys):
            samples = []
            for x in xs:
                v = pixels[y][x]
                samples.extend((v,) if ch == 1 else tuple(v))
            line = (
                bytes(samples)
                if bit_depth == 8
                else _png_pack_bits(samples, bit_depth, stride)
            )
            ft = filters[ri % len(filters)] if filters else ri % 5
            out.append(ft)
            out += _png_filter(ft, line, prev, bpp)
            prev = line
        return out

    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _PNG_ADAM7:
            xs = list(range(x0, width, dx))
            ys = list(range(y0, height, dy))
            if xs and ys:
                raw += pass_bytes(ys, xs)
    else:
        raw += pass_bytes(range(height), range(width))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace
    )
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if color_type == 3:
        out += chunk(b"PLTE", bytes(v for rgb in palette for v in rgb))
    out += chunk(b"IDAT", zlib.compress(bytes(raw), 6)) + chunk(b"IEND", b"")
    return out


@_corrupt_as_valueerror
def decode_png(
    content: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Pure-stdlib decoder for EVERY legal PNG pixel layout: gray /
    truecolor / palette / gray+alpha / RGBA, bit depths 1-16
    (sub-byte MSB-first; 16-bit reduced to the high byte), Adam7
    interlacing (per-pass filtering), chunk CRC verification, multiple
    IDATs. Alpha is dropped and gray scales exactly
    (255 / (2^d - 1) is an integer for d in 1/2/4). Returns top-down
    RGB rows; ValueError on corrupt framing or palette overruns."""
    import struct
    import zlib

    if len(content) < 8 or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    plte: bytes | None = None
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(content):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if ctype not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[ctype]:
        raise ValueError("illegal PNG depth/color-type combination")
    if comp != 0 or filt != 0 or interlace > 1:
        raise ValueError("unsupported PNG compression/filter/interlace")
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG without a valid PLTE")
        palette = [tuple(plte[3 * i : 3 * i + 3]) for i in range(len(plte) // 3)]
    ch = _PNG_CHANNELS[ctype]
    scale = {1: 255, 2: 85, 4: 17}.get(depth, 1)
    raw = zlib.decompress(bytes(idat))
    rows: list[list] = [[(0, 0, 0)] * width for _ in range(height)]
    rpos = 0

    def do_pass(ys, xs):
        nonlocal rpos
        bits = depth * ch
        stride = (bits * len(xs) + 7) // 8
        bpp = max(1, bits // 8)
        prev = bytes(stride)
        for y in ys:
            if rpos + 1 + stride > len(raw):
                raise ValueError("truncated PNG pixel data")
            ft = raw[rpos]
            cur = bytearray(raw[rpos + 1 : rpos + 1 + stride])
            rpos += 1 + stride
            _png_unfilter(ft, cur, prev, bpp)
            samples = _png_unpack_samples(bytes(cur), depth, ch * len(xs))
            row = rows[y]
            for i, x in enumerate(xs):
                s = samples[i * ch : (i + 1) * ch]
                if ctype == 0:
                    g = s[0] * scale
                    row[x] = (g, g, g)
                elif ctype == 2:
                    row[x] = (s[0], s[1], s[2])
                elif ctype == 3:
                    if s[0] >= len(palette):
                        raise ValueError("palette index out of range")
                    row[x] = palette[s[0]]
                elif ctype == 4:
                    g = s[0] * scale
                    row[x] = (g, g, g)
                else:
                    row[x] = (s[0], s[1], s[2])
            prev = bytes(cur)

    if interlace:
        for x0, y0, dx, dy in _PNG_ADAM7:
            xs = list(range(x0, width, dx))
            ys = list(range(y0, height, dy))
            if xs and ys:
                do_pass(ys, xs)
    else:
        do_pass(range(height), range(width))
    if rpos != len(raw):
        raise ValueError("PNG pixel data length mismatch")
    return width, height, rows


def decode_png_features(
    content: bytes,
) -> tuple[int, int, int, list[float]]:
    """Real-decode hook for :func:`extract_image_features` (PNG twin
    of :func:`decode_bmp_features`): per-channel pixel sums as the
    feature vector; corrupt bytes raise into the null-row policy.
    Routes through :func:`decode_png`, so every legal PNG pixel
    layout (palette/gray/alpha/sub-byte/16-bit/Adam7) decodes."""
    width, height, rows = decode_png(content)
    sums = [0, 0, 0]
    for row in rows:
        for r, g, b in row:
            sums[0] += r
            sums[1] += g
            sums[2] += b
    return width, height, 3, [float(s) for s in sums]


# ------------------------------------------------- real JPEG codec
# (r8: baseline sequential JPEG, grayscale, pure stdlib+numpy — the
# last stubbed image codec gets a real path. Full machinery: 8x8 DCT,
# standard Annex-K luminance quant + Huffman tables, zigzag, DC
# differential coding, AC run-length with ZRL/EOB, canonical Huffman
# entropy coding, 0xFF byte stuffing, DRI/RSTn restart markers, JFIF
# APP0 + COM segments. Gated end-to-end by q299 (constant-per-block
# images round-trip EXACTLY through the lossy pipeline — DC-only
# blocks with even-valued levels quantize without rounding — hashed
# against a SQL pixel oracle); the AC/entropy layer is exactly
# invertible for ANY integer coefficient block and is property-tested
# separately. Color JPEG (chroma subsampling) and progressive stay
# behind the stub policy. Reference parity: the reference pipes media
# through opaque Buffer columns (lib/etl.js Thru/Mapper contract);
# decode here is the same executor-side 1:1 batch stage as q295/q297.)

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Table K.1 (luminance quantization)
_JPEG_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# ITU-T T.81 Tables K.3/K.5 (luminance DC/AC Huffman specs):
# counts-per-code-length 1..16, then symbol values in code order.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 Annex C): symbol ->
    (code, bit length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode_table(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """(bit length, code) -> symbol, for MSB-first sequential decode."""
    return {(ln, c): s for s, (c, ln) in _huff_codes(bits, vals).items()}


def _dct_matrix():
    """8x8 orthonormal DCT-II matrix: F = T @ f @ T.T (T.81 A.3.3)."""
    import math

    import numpy as np

    t = np.empty((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            t[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return t


class _JpegBitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (the pre-marker rule)."""
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)

    def marker(self, byte2: int) -> None:
        """Emit a raw marker (not subject to stuffing)."""
        self.align()
        self.out += bytes((0xFF, byte2))


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(category size, magnitude bits) for a DIFF/AC value (F.1.2.1.1:
    negatives are one's-complemented within their category)."""
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_block_coeffs(
    w: _JpegBitWriter,
    zz: list[int],
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-encode one quantized block (zigzag order); returns the
    new DC predictor."""
    size, mag = _jpeg_magnitude(zz[0] - pred)
    w.write(*dc_codes[size])
    if size:
        w.write(mag, size)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            w.write(*ac_codes[0xF0])  # ZRL: 16 zeros
            run -= 16
        size, mag = _jpeg_magnitude(zz[k])
        w.write(*ac_codes[(run << 4) | size])
        w.write(mag, size)
        run = 0
    if run:
        w.write(*ac_codes[0x00])  # EOB
    return zz[0]


def encode_jpeg_gray(
    width: int,
    height: int,
    pixels: list[list[int]],
    restart_interval: int = 0,
    comment: bytes | None = b"node_etl_spark",
    quant: list[int] | None = None,
) -> bytes:
    """Encode top-down grayscale rows (ints 0..255) as a baseline
    sequential JFIF JPEG (SOF0, one component, standard Annex-K
    luminance quant + Huffman tables) — the file any image viewer
    opens. ``restart_interval`` > 0 plants DRI/RSTn markers (and a
    COM segment is planted by default), so the encoder acts as the
    decoder's adversary exactly like the PNG/WAV twins."""
    import struct

    import numpy as np

    q = list(quant) if quant is not None else list(_JPEG_QUANT_LUMA)
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.shape != (height, width) or width <= 0 or height <= 0:
        raise ValueError("bad pixel grid")
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.pad(
        arr, ((0, 8 * bh - height), (0, 8 * bw - width)), mode="edge"
    )
    t = _dct_matrix()
    qmat = np.asarray(q, dtype=np.float64).reshape(8, 8)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    w = _JpegBitWriter()
    w.out += bytes((0xFF, 0xD8))  # SOI
    # APP0/JFIF v1.1, no thumbnail
    app0 = b"JFIF\x00" + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    w.out += bytes((0xFF, 0xE0)) + struct.pack(">H", 2 + len(app0)) + app0
    if comment is not None:
        w.out += bytes((0xFF, 0xFE)) + struct.pack(">H", 2 + len(comment)) + comment
    dqt = bytes([0]) + bytes(q[_JPEG_ZIGZAG[i]] for i in range(64))
    w.out += bytes((0xFF, 0xDB)) + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0))
    w.out += bytes((0xFF, 0xC0)) + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    w.out += bytes((0xFF, 0xC4)) + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        w.out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, restart_interval)
    sos = bytes((1, 1, 0x00, 0, 63, 0))
    w.out += bytes((0xFF, 0xDA)) + struct.pack(">H", 2 + len(sos)) + sos

    pred, mcu, rst = 0, 0, 0
    n_mcus = bw * bh
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                pred = 0
            block = padded[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] - 128.0
            coeffs = np.rint((t @ block @ t.T) / qmat).astype(np.int64)
            zz = [int(coeffs.flat[_JPEG_ZIGZAG[k]]) for k in range(64)]
            pred = _encode_block_coeffs(w, zz, pred, dc_codes, ac_codes)
            mcu += 1
    assert mcu == n_mcus
    w.align()
    w.out += bytes((0xFF, 0xD9))  # EOI
    return bytes(w.out)


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded data: un-stuffs
    0xFF 0x00, refuses to read through a real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy data")
            b = self.data[self.pos]
            if b == 0xFF:
                if (
                    self.pos + 1 >= len(self.data)
                    or self.data[self.pos + 1] != 0x00
                ):
                    raise ValueError("marker inside entropy data")
                self.pos += 2
            else:
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def align(self) -> None:
        self.n = 0


def _read_huff(br: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _receive_extend(br: _JpegBitReader, size: int) -> int:
    if size == 0:
        return 0
    v = _receive(br, size)
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block_coeffs(
    br: _JpegBitReader,
    pred: int,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
) -> list[int]:
    """Entropy-decode one block into zigzag-order coefficients
    (exact inverse of :func:`_encode_block_coeffs`)."""
    zz = [0] * 64
    zz[0] = pred + _receive_extend(br, _read_huff(br, dc_tab))
    k = 1
    while k < 64:
        sym = _read_huff(br, ac_tab)
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError("bad AC symbol")
            k += 16  # ZRL
            continue
        k += run
        if k > 63:
            raise ValueError("AC coefficient index overflow")
        zz[k] = _receive_extend(br, size)
        k += 1
    return zz


def _expect_rst(br, content: bytes, rst: int) -> int:
    br.align()
    if (
        br.pos + 2 > len(content)
        or content[br.pos] != 0xFF
        or content[br.pos + 1] != 0xD0 + rst
    ):
        raise ValueError("missing restart marker")
    br.pos += 2
    return (rst + 1) % 8


def _decode_prog_dc_first(br, content, coefs, dc_tab, al, ri) -> None:
    pred, rst = 0, 0
    for i in range(len(coefs)):
        if ri and i and i % ri == 0:
            rst = _expect_rst(br, content, rst)
            pred = 0
        pred += _receive_extend(br, _read_huff(br, dc_tab))
        coefs[i][0] = pred << al


def _decode_prog_dc_refine(br, content, coefs, al, ri) -> None:
    rst = 0
    for i in range(len(coefs)):
        if ri and i and i % ri == 0:
            rst = _expect_rst(br, content, rst)
        if br.read_bit():
            coefs[i][0] |= 1 << al


def _receive(br, n: int) -> int:
    v = 0
    for _ in range(n):
        v = (v << 1) | br.read_bit()
    return v


def _decode_prog_ac_first(br, content, coefs, ac_tab, ss, se, al, ri):
    eobrun, rst = 0, 0
    for i, zz in enumerate(coefs):
        if ri and i and i % ri == 0:
            if eobrun:
                raise ValueError("EOB run crosses restart interval")
            rst = _expect_rst(br, content, rst)
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = _read_huff(br, ac_tab)
            r, size = sym >> 4, sym & 0x0F
            if size == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += _receive(br, r)
                break
            k += r
            if k > se:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _receive_extend(br, size) << al
            k += 1


def _decode_prog_ac_refine(br, content, coefs, ac_tab, ss, se, al, ri):
    p1, eobrun, rst = 1 << al, 0, 0

    def correct(zz, k) -> None:
        if br.read_bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else -p1

    for i, zz in enumerate(coefs):
        if ri and i and i % ri == 0:
            if eobrun:
                raise ValueError("EOB run crosses restart interval")
            rst = _expect_rst(br, content, rst)
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _read_huff(br, ac_tab)
                r, size = sym >> 4, sym & 0x0F
                newval = 0
                if size == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += _receive(br, r)
                        break
                    # ZRL: pass 16 zero-history coefficients below
                else:
                    if size != 1:
                        raise ValueError("bad refinement symbol")
                    newval = p1 if br.read_bit() else -p1
                while k <= se:
                    if zz[k] != 0:
                        correct(zz, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("refinement position overflow")
                    zz[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0:
                    correct(zz, k)
                k += 1
            eobrun -= 1


@_corrupt_as_valueerror
def decode_jpeg_gray(content: bytes) -> tuple[int, int, list[list[int]]]:
    """Pure stdlib+numpy decoder for grayscale JPEG — BOTH baseline
    sequential (SOF0) and progressive (SOF2, spectral selection +
    successive approximation per T.81 Annex G): walks the marker
    stream (skipping APPn/COM, honoring mid-stream DQT/DHT/DRI),
    entropy-decodes every scan with byte un-stuffing and RSTn resets
    (predictor AND EOB-run state), accumulates coefficients across
    progressive scans (DC first/refine, AC first with EOB runs, the
    AC refinement correction-bit algorithm), then dequantizes,
    inverse-zigzags, applies the 8x8 IDCT, and crops edge padding.
    Returns (width, height, top-down gray rows). Raises ValueError on
    non-JPEG or unsupported variants (color, arithmetic coding,
    12-bit, hierarchical stay behind the documented libjpeg
    deployment dependency — PARITY.md codec closure)."""
    import struct

    import numpy as np

    if len(content) < 4 or content[:2] != bytes((0xFF, 0xD8)):
        raise ValueError("not a JPEG file")
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    progressive = None
    comp_q = 0
    restart_interval = 0
    coefs: list[list[int]] | None = None
    n_scans = 0
    saw_eoi = False
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("expected marker")
        m = content[pos + 1]
        if m == 0xFF:  # fill byte
            pos += 1
            continue
        if m == 0xD9:  # EOI
            saw_eoi = True
            pos += 2
            break
        if pos + 4 > len(content):
            raise ValueError("truncated segment")
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(content):
            raise ValueError("truncated segment")
        seg = content[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if m == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if i + 65 > len(seg):
                    raise ValueError("short DQT")
                zzq = seg[i + 1 : i + 65]
                tbl = [0] * 64
                for k in range(64):
                    tbl[_JPEG_ZIGZAG[k]] = zzq[k]
                quant[tq] = tbl
                i += 65
        elif m == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise ValueError("short DHT")
                tab = _huff_decode_table(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                i += 17 + n
        elif m in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if progressive is not None:
                raise ValueError("multiple SOF segments")
            progressive = m == 0xC2
            prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale supported")
            if seg[7] != 0x11:  # component list starts at offset 6
                raise ValueError("subsampling unsupported")
            comp_q = seg[8]
            if width <= 0 or height <= 0:
                raise ValueError("bad dimensions")
            bw, bh = (width + 7) // 8, (height + 7) // 8
            coefs = [[0] * 64 for _ in range(bw * bh)]
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                "only baseline (SOF0) and progressive (SOF2) supported"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS — one scan; progressive files have many
            if coefs is None:
                raise ValueError("SOS before SOF")
            if seg[0] != 1:
                raise ValueError("only single-component scans supported")
            td, ta = seg[2] >> 4, seg[2] & 0x0F
            ss, se, ah, al = seg[3], seg[4], seg[5] >> 4, seg[5] & 0x0F
            br = _JpegBitReader(content, pos)
            if not progressive:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    raise ValueError("bad baseline scan header")
                if td not in dc_tabs or ta not in ac_tabs:
                    raise ValueError("missing quant/Huffman table")
                pred, rst = 0, 0
                for i in range(len(coefs)):
                    if restart_interval and i and i % restart_interval == 0:
                        rst = _expect_rst(br, content, rst)
                        pred = 0
                    zz = _decode_block_coeffs(
                        br, pred, dc_tabs[td], ac_tabs[ta]
                    )
                    pred = zz[0]
                    coefs[i] = zz
            elif ss == 0:  # progressive DC scan
                if se != 0:
                    raise ValueError("bad DC scan band")
                if ah == 0:
                    if td not in dc_tabs:
                        raise ValueError("missing quant/Huffman table")
                    _decode_prog_dc_first(
                        br, content, coefs, dc_tabs[td], al, restart_interval
                    )
                else:
                    if ah != al + 1:
                        raise ValueError("bad successive approximation")
                    _decode_prog_dc_refine(
                        br, content, coefs, al, restart_interval
                    )
            else:  # progressive AC scan
                if not ss <= se <= 63:
                    raise ValueError("bad AC scan band")
                if ta not in ac_tabs:
                    raise ValueError("missing quant/Huffman table")
                if ah == 0:
                    _decode_prog_ac_first(
                        br, content, coefs, ac_tabs[ta], ss, se, al,
                        restart_interval,
                    )
                else:
                    if ah != al + 1:
                        raise ValueError("bad successive approximation")
                    _decode_prog_ac_refine(
                        br, content, coefs, ac_tabs[ta], ss, se, al,
                        restart_interval,
                    )
            n_scans += 1
            br.align()
            pos = br.pos
        # APPn (0xE0-0xEF) / COM (0xFE): skipped via seglen
    if not saw_eoi:
        raise ValueError("missing EOI")
    if coefs is None or width is None or height is None or n_scans == 0:
        raise ValueError("missing SOF/SOS")
    if comp_q not in quant:
        raise ValueError("missing quant/Huffman table")
    qmat = np.asarray(quant[comp_q], dtype=np.float64).reshape(8, 8)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    t = _dct_matrix()
    blocks = np.empty((bh * bw, 8, 8), dtype=np.float64)
    for mcu, zz in enumerate(coefs):
        c = np.zeros(64, dtype=np.float64)
        for k in range(64):
            c[_JPEG_ZIGZAG[k]] = zz[k]
        blocks[mcu] = c.reshape(8, 8) * qmat
    # batched IDCT over all blocks: f = T.T @ F @ T, level shift, clamp
    spatial = np.einsum("ux,nuv,vy->nxy", t, blocks, t)
    spatial = np.clip(np.rint(spatial + 128.0), 0, 255).astype(np.int64)
    img = np.empty((bh * 8, bw * 8), dtype=np.int64)
    for mcu in range(bh * bw):
        by, bx = divmod(mcu, bw)
        img[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = spatial[mcu]
    return width, height, [list(map(int, r)) for r in img[:height, :width]]


def decode_jpeg_features(content: bytes) -> tuple[int, int, int, list[float]]:
    """Real-decode hook for :func:`extract_image_features` (JPEG twin
    of :func:`decode_bmp_features` / :func:`decode_png_features`):
    the feature vector is the gray pixel sum; corrupt bytes raise
    into the null-row policy."""
    width, height, rows = decode_jpeg_gray(content)
    total = 0
    for row in rows:
        total += sum(row)
    return width, height, 1, [float(total)]


# ------------------------------------------------ color JPEG (r9)
# (baseline YCbCr with 4:2:0 / 4:2:2 / 4:4:4 chroma subsampling —
# interleaved MCUs, two quantization tables, nearest-neighbor chroma
# upsampling on decode. Pure stdlib+numpy; the "color JPEG needs
# libjpeg" line in PARITY.md narrows to progressive color and
# arithmetic coding. The exact gate (q308) works in the YCbCr domain,
# where constant-per-MCU planes survive the lossy pipeline
# bit-for-bit; the RGB conversion layer is deterministic integer math
# unit-tested separately.)

# ITU-T T.81 Table K.2 (chrominance quantization)
_JPEG_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

_JPEG_SUBSAMPLING = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def _plane_blocks_zz(plane, qmat, t):
    """Quantized zigzag coefficients for one padded plane, block
    row-major. ``plane`` dims must be multiples of 8."""
    import numpy as np

    h, w = plane.shape
    zzs = []
    for by in range(h // 8):
        row = []
        for bx in range(w // 8):
            block = plane[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] - 128.0
            coeffs = np.rint((t @ block @ t.T) / qmat).astype(np.int64)
            row.append(
                [int(coeffs.flat[_JPEG_ZIGZAG[k]]) for k in range(64)]
            )
        zzs.append(row)
    return zzs


def encode_jpeg_color(
    width: int,
    height: int,
    y_rows: list[list[int]],
    cb_rows: list[list[int]],
    cr_rows: list[list[int]],
    subsampling: str = "420",
    restart_interval: int = 0,
    comment: bytes | None = b"node_etl_spark",
) -> bytes:
    """Encode full-resolution YCbCr planes as a baseline color JFIF
    JPEG (SOF0, three components, K.1 luma + K.2 chroma quantization,
    interleaved MCUs). ``subsampling``: '444', '422' (2x1), or '420'
    (2x2, the web default); chroma planes are box-averaged
    (round-half-up) to the subsampled grid. All components share the
    standard luminance Huffman tables (spec-legal table reuse — a
    production encoder would add the K.4/K.6 chroma tables; entropy
    choice does not affect exactness). ``restart_interval`` (in MCUs)
    plants DRI/RSTn resetting all three DC predictors."""
    import struct

    import numpy as np

    if subsampling not in _JPEG_SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    sh, sv = _JPEG_SUBSAMPLING[subsampling]
    planes = []
    for rows in (y_rows, cb_rows, cr_rows):
        a = np.asarray(rows, dtype=np.float64)
        if a.shape != (height, width) or width <= 0 or height <= 0:
            raise ValueError("bad plane grid")
        planes.append(a)
    ypl, cbpl, crpl = planes
    mcu_w, mcu_h = 8 * sh, 8 * sv
    mw, mh = -(-width // mcu_w), -(-height // mcu_h)

    def pad_to(a, ph, pw):
        return np.pad(
            a, ((0, ph - a.shape[0]), (0, pw - a.shape[1])), mode="edge"
        )

    ypad = pad_to(ypl, mh * mcu_h, mw * mcu_w)
    subs = []
    for c in (cbpl, crpl):
        cpad = pad_to(c, mh * mcu_h, mw * mcu_w)
        # box-average to the subsampled grid, round half up
        sub = cpad.reshape(mh * 8, sv, mw * 8, sh).sum(axis=(1, 3))
        subs.append(np.floor((sub + sh * sv / 2.0) / (sh * sv)))
    t = _dct_matrix()
    qy = np.asarray(_JPEG_QUANT_LUMA, dtype=np.float64).reshape(8, 8)
    qc = np.asarray(_JPEG_QUANT_CHROMA, dtype=np.float64).reshape(8, 8)
    yzz = _plane_blocks_zz(ypad, qy, t)
    cbzz = _plane_blocks_zz(subs[0], qc, t)
    crzz = _plane_blocks_zz(subs[1], qc, t)

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    w = _JpegBitWriter()
    w.out += bytes((0xFF, 0xD8))
    app0 = (
        b"JFIF\x00" + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    w.out += bytes((0xFF, 0xE0)) + struct.pack(">H", 2 + len(app0)) + app0
    if comment is not None:
        w.out += (
            bytes((0xFF, 0xFE)) + struct.pack(">H", 2 + len(comment)) + comment
        )
    for tq, q in ((0, _JPEG_QUANT_LUMA), (1, _JPEG_QUANT_CHROMA)):
        dqt = bytes([tq]) + bytes(q[_JPEG_ZIGZAG[i]] for i in range(64))
        w.out += bytes((0xFF, 0xDB)) + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        (1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1)
    )
    w.out += bytes((0xFF, 0xC0)) + struct.pack(">H", 2 + len(sof)) + sof
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    w.out += bytes((0xFF, 0xC4)) + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        w.out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, restart_interval)
    sos = bytes((3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0))
    w.out += bytes((0xFF, 0xDA)) + struct.pack(">H", 2 + len(sos)) + sos

    preds = [0, 0, 0]
    rst = 0
    mcu = 0
    for my in range(mh):
        for mx in range(mw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for by in range(sv):
                for bx in range(sh):
                    zz = yzz[my * sv + by][mx * sh + bx]
                    preds[0] = _encode_block_coeffs(
                        w, zz, preds[0], dc_codes, ac_codes
                    )
            preds[1] = _encode_block_coeffs(
                w, cbzz[my][mx], preds[1], dc_codes, ac_codes
            )
            preds[2] = _encode_block_coeffs(
                w, crzz[my][mx], preds[2], dc_codes, ac_codes
            )
            mcu += 1
    w.align()
    w.out += bytes((0xFF, 0xD9))
    return bytes(w.out)


@_corrupt_as_valueerror
def decode_jpeg_ycbcr(
    content: bytes,
) -> tuple[int, int, list[list[int]], list[list[int]], list[list[int]]]:
    """Pure stdlib+numpy decoder for baseline COLOR JPEG (SOF0, three
    components, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling): walks the
    marker stream, entropy-decodes the interleaved MCU scan with
    per-component DC predictors and RSTn resets, dequantizes with the
    per-component quantization tables, applies the 8x8 IDCT, and
    upsamples chroma to full resolution by nearest-neighbor
    replication (a spec-conformant decoder choice — matched by the
    encoder twin, documented for external files). Returns (width,
    height, Y rows, Cb rows, Cr rows) at full resolution. Grayscale
    files belong to :func:`decode_jpeg_gray`; progressive color and
    arithmetic coding stay behind the libjpeg deployment dependency
    (PARITY.md)."""
    import struct

    import numpy as np

    if len(content) < 4 or content[:2] != bytes((0xFF, 0xD8)):
        raise ValueError("not a JPEG file")
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    comps = None  # list of (comp_id, h, v, tq)
    restart_interval = 0
    sos = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError("expected marker")
        m = content[pos + 1]
        if m == 0xFF:
            pos += 1
            continue
        (seglen,) = struct.unpack_from(">H", content, pos + 2)
        if seglen < 2 or pos + 2 + seglen > len(content):
            raise ValueError("truncated segment")
        seg = content[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if m == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zzq = seg[i + 1 : i + 65]
                if len(zzq) < 64:
                    raise ValueError("short DQT")
                tbl = [0] * 64
                for k in range(64):
                    tbl[_JPEG_ZIGZAG[k]] = zzq[k]
                quant[tq] = tbl
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise ValueError("short DHT")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_decode_table(
                    bits, vals
                )
                i += 17 + n
        elif m == 0xC0:
            prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 3:
                raise ValueError(
                    "decode_jpeg_ycbcr handles 3-component color; use "
                    "decode_jpeg_gray for grayscale"
                )
            comps = []
            for c in range(3):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            if comps[1][1:3] != (1, 1) or comps[2][1:3] != (1, 1):
                raise ValueError("chroma sampling factors must be 1x1")
            if comps[0][1] not in (1, 2) or comps[0][2] not in (1, 2):
                raise ValueError("luma sampling factors must be 1 or 2")
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif m == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF")
            if seg[0] != 3:
                raise ValueError("expected interleaved 3-component scan")
            tabs = {}
            for c in range(3):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                tabs[cid] = (tt >> 4, tt & 0x0F)
            sos = (pos, tabs)
            break
    if sos is None or width is None or comps is None:
        raise ValueError("missing SOF/SOS")
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    sh, sv = comps[0][1], comps[0][2]
    mw, mh = -(-width // (8 * sh)), -(-height // (8 * sv))
    t = _dct_matrix()
    qmats = []
    for cid, _h, _v, tq in comps:
        if tq not in quant:
            raise ValueError("missing quant/Huffman table")
        qmats.append(
            np.asarray(quant[tq], dtype=np.float64).reshape(8, 8)
        )
    pos, tabs = sos
    for cid, _h, _v, _tq in comps:
        td, ta = tabs[cid]
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("missing quant/Huffman table")
    br = _JpegBitReader(content, pos)
    # per-component coefficient planes at subsampled block resolution
    nblocks = [(mh * sv, mw * sh), (mh, mw), (mh, mw)]
    blocks = [
        np.zeros((bh * bw, 8, 8), dtype=np.float64)
        for bh, bw in nblocks
    ]
    preds = [0, 0, 0]
    rst = 0
    for mcu in range(mh * mw):
        if restart_interval and mcu and mcu % restart_interval == 0:
            rst = _expect_rst(br, content, rst)
            preds = [0, 0, 0]
        my, mx = divmod(mcu, mw)
        for ci, (cid, ch, cv, _tq) in enumerate(comps):
            td, ta = tabs[cid]
            for by in range(cv):
                for bx in range(ch):
                    zz = _decode_block_coeffs(
                        br, preds[ci], dc_tabs[td], ac_tabs[ta]
                    )
                    preds[ci] = zz[0]
                    c = np.zeros(64, dtype=np.float64)
                    for k in range(64):
                        c[_JPEG_ZIGZAG[k]] = zz[k]
                    bh, bw = nblocks[ci]
                    row = my * cv + by
                    col = mx * ch + bx
                    blocks[ci][row * bw + col] = (
                        c.reshape(8, 8) * qmats[ci]
                    )
    br.align()
    if (
        br.pos + 2 > len(content)
        or content[br.pos] != 0xFF
        or content[br.pos + 1] != 0xD9
    ):
        raise ValueError("missing EOI")
    planes = []
    for ci in range(3):
        bh, bw = nblocks[ci]
        spatial = np.einsum("ux,nuv,vy->nxy", t, blocks[ci], t)
        spatial = np.clip(np.rint(spatial + 128.0), 0, 255).astype(np.int64)
        img = np.empty((bh * 8, bw * 8), dtype=np.int64)
        for b in range(bh * bw):
            by, bx = divmod(b, bw)
            img[8 * by : 8 * by + 8, 8 * bx : 8 * bx + 8] = spatial[b]
        planes.append(img)
    ypl = planes[0][:height, :width]
    out = [ [list(map(int, r)) for r in ypl] ]
    for ci in (1, 2):
        up = np.repeat(np.repeat(planes[ci], sv, axis=0), sh, axis=1)
        out.append([list(map(int, r)) for r in up[:height, :width]])
    return width, height, out[0], out[1], out[2]


def ycbcr_to_rgb_rows(y_rows, cb_rows, cr_rows):
    """JFIF YCbCr -> RGB (BT.601 full-range, round-half-away, clamp):
    the deterministic integer conversion layer over
    :func:`decode_jpeg_ycbcr`."""
    import numpy as np

    y = np.asarray(y_rows, dtype=np.float64)
    cb = np.asarray(cb_rows, dtype=np.float64) - 128.0
    cr = np.asarray(cr_rows, dtype=np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = []
    for ch in (r, g, b):
        out.append(np.clip(np.rint(ch), 0, 255).astype(np.int64))
    rr, gg, bb = out
    return [
        [(int(rr[yx, xx]), int(gg[yx, xx]), int(bb[yx, xx]))
         for xx in range(rr.shape[1])]
        for yx in range(rr.shape[0])
    ]


def decode_jpeg_rgb(
    content: bytes,
) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Baseline color JPEG -> top-down RGB rows (decode_jpeg_ycbcr +
    the BT.601 conversion)."""
    w, h, y, cb, cr = decode_jpeg_ycbcr(content)
    return w, h, ycbcr_to_rgb_rows(y, cb, cr)


def decode_jpeg_color_features(
    content: bytes,
) -> tuple[int, int, int, list[float]]:
    """Real-decode hook for :func:`extract_image_features` over COLOR
    JPEGs: features = exact per-plane YCbCr sums (the integer domain
    the q308 oracle can recompute); corrupt bytes raise into the
    null-row policy."""
    w, h, y, cb, cr = decode_jpeg_ycbcr(content)
    sums = []
    for plane in (y, cb, cr):
        total = 0
        for row in plane:
            total += sum(row)
        sums.append(float(total))
    return w, h, 3, sums


# ------------------------------------------- progressive JPEG scans
# (r9: SOF2 progressive grayscale gets REAL — spectral selection +
# successive approximation per ITU-T T.81 Annex G, the scan scripts
# every web JPEG encoder emits. The entropy layer below implements
# both directions: DC first/refine, AC first with EOB-run
# accumulation, and the AC refinement correction-bit algorithm
# (G.1.2.3) whose interleaving of newly-significant coefficients,
# buffered correction bits, and EOB runs is the classically
# bug-prone part of every JPEG codec. Only grayscale: color JPEG
# stays a libjpeg deployment dependency — PARITY.md codec closure.)

# Progressive AC scans need EOBn symbols (r<<4 with r<15) that the
# baseline Annex-K table lacks, so use a fixed full-alphabet canonical
# table: all 256 symbols at 8-9 bits (254 at len 8, 2 at len 9 — the
# all-ones 9-bit code stays unassigned per C.2). A production encoder
# would optimize per-image; fixed tables keep encode deterministic.
_JPEG_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0]
_JPEG_PROG_AC_VALS = list(range(256))


class _ProgScanWriter:
    """Encoder state for one progressive scan: bit writer + EOB-run
    accumulator + buffered correction bits (libjpeg-style, public
    T.81 Annex G semantics)."""

    def __init__(self, w: "_JpegBitWriter", ac_codes) -> None:
        self.w = w
        self.ac_codes = ac_codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits buffered behind the run

    def sym(self, s: int) -> None:
        code, ln = self.ac_codes[s]
        self.w.write(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.be:
            self.w.write(b, 1)
        self.be = []


def _encode_dc_first_scan(w, zzs, dc_codes, al, restart_interval) -> None:
    pred, rst = 0, 0
    for i, zz in enumerate(zzs):
        if restart_interval and i and i % restart_interval == 0:
            w.marker(0xD0 + rst)
            rst = (rst + 1) % 8
            pred = 0
        v = zz[0] >> al  # arithmetic shift: floor, refinement restores
        diff, pred = v - pred, v
        size, bits = _jpeg_magnitude(diff)
        code, ln = dc_codes[size]
        w.write(code, ln)
        w.write(bits, size)
    w.align()


def _encode_dc_refine_scan(w, zzs, al, restart_interval) -> None:
    rst = 0
    for i, zz in enumerate(zzs):
        if restart_interval and i and i % restart_interval == 0:
            w.marker(0xD0 + rst)
            rst = (rst + 1) % 8
        w.write((zz[0] >> al) & 1, 1)
    w.align()


def _encode_ac_first_scan(w, zzs, ac_codes, ss, se, al, restart_interval):
    st = _ProgScanWriter(w, ac_codes)
    rst = 0
    for i, zz in enumerate(zzs):
        if restart_interval and i and i % restart_interval == 0:
            st.flush_eobrun()
            w.marker(0xD0 + rst)
            rst = (rst + 1) % 8
        r = 0
        for k in range(ss, se + 1):
            t = abs(zz[k]) >> al  # point transform truncates toward 0
            if t == 0:
                r += 1
                continue
            st.flush_eobrun()
            while r > 15:
                st.sym(0xF0)  # ZRL
                r -= 16
            v = t if zz[k] > 0 else -t
            size, bits = _jpeg_magnitude(v)
            st.sym((r << 4) | size)
            w.write(bits, size)
            r = 0
        if r > 0:
            st.eobrun += 1
            if st.eobrun == 0x7FFF:
                st.flush_eobrun()
    st.flush_eobrun()
    w.align()


def _encode_ac_refine_scan(w, zzs, ac_codes, ss, se, al, restart_interval):
    st = _ProgScanWriter(w, ac_codes)
    rst = 0
    for i, zz in enumerate(zzs):
        if restart_interval and i and i % restart_interval == 0:
            st.flush_eobrun()
            w.marker(0xD0 + rst)
            rst = (rst + 1) % 8
        absv = [abs(zz[k]) >> al for k in range(ss, se + 1)]
        # last newly-significant position bounds ZRL emission (G.1.2.3)
        eob = -1
        for j, t in enumerate(absv):
            if t == 1:
                eob = j
        r, br = 0, []
        for j, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and j <= eob:
                st.flush_eobrun()
                st.sym(0xF0)
                r -= 16
                for b in br:
                    w.write(b, 1)
                br = []
            if t > 1:
                # already significant: queue this scan's correction bit
                br.append(t & 1)
                continue
            st.flush_eobrun()
            st.sym((r << 4) | 1)
            w.write(1 if zz[ss + j] > 0 else 0, 1)
            for b in br:
                w.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            st.eobrun += 1
            st.be.extend(br)
            # cap well below the 0x7FFF run limit so the buffered
            # correction-bit list stays bounded too
            if st.eobrun == 0x7FFF or len(st.be) > 900:
                st.flush_eobrun()
    st.flush_eobrun()
    w.align()


def encode_jpeg_progressive_gray(
    width: int,
    height: int,
    pixels: list[list[int]],
    restart_interval: int = 0,
    comment: bytes | None = b"node_etl_spark",
    quant: list[int] | None = None,
    dc_al: int = 1,
    ac_al: int = 2,
    spectral_split: int = 5,
) -> bytes:
    """Encode grayscale rows as a PROGRESSIVE JPEG (SOF2) with the
    scan script real encoders use: DC first at successive-
    approximation level ``dc_al``, AC first scans split into two
    spectral bands at ``spectral_split``, then DC/AC refinement
    scans walking each approximation level down to 0. Same DCT/
    quantization as :func:`encode_jpeg_gray`, so for the exact input
    class (constant even-valued 8x8 blocks) the decoded pixels match
    the baseline path bit-for-bit. ``restart_interval`` plants RSTn
    markers inside EVERY scan (EOB runs must flush at restart
    boundaries — the adversarial corner)."""
    import struct

    import numpy as np

    if not 0 <= dc_al <= 13 or not 0 <= ac_al <= 13:
        raise ValueError("approximation levels must be in 0..13")
    if not 1 <= spectral_split <= 62:
        raise ValueError("spectral_split must be in 1..62")
    q = list(quant) if quant is not None else list(_JPEG_QUANT_LUMA)
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.shape != (height, width) or width <= 0 or height <= 0:
        raise ValueError("bad pixel grid")
    bw, bh = (width + 7) // 8, (height + 7) // 8
    padded = np.pad(
        arr, ((0, 8 * bh - height), (0, 8 * bw - width)), mode="edge"
    )
    t = _dct_matrix()
    qmat = np.asarray(q, dtype=np.float64).reshape(8, 8)
    # shared block-DCT/quantize/zigzag helper (also used by the color
    # encoder) — one implementation to keep quantization in sync
    zzs = [zz for row in _plane_blocks_zz(padded, qmat, t) for zz in row]

    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_PROG_AC_BITS, _JPEG_PROG_AC_VALS)

    w = _JpegBitWriter()
    w.out += bytes((0xFF, 0xD8))  # SOI
    app0 = (
        b"JFIF\x00" + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    w.out += bytes((0xFF, 0xE0)) + struct.pack(">H", 2 + len(app0)) + app0
    if comment is not None:
        w.out += (
            bytes((0xFF, 0xFE)) + struct.pack(">H", 2 + len(comment)) + comment
        )
    dqt = bytes([0]) + bytes(q[_JPEG_ZIGZAG[i]] for i in range(64))
    w.out += bytes((0xFF, 0xDB)) + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, height, width, 1) + bytes((1, 0x11, 0))
    w.out += bytes((0xFF, 0xC2)) + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    dht = (
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10])
        + bytes(_JPEG_PROG_AC_BITS)
        + bytes(_JPEG_PROG_AC_VALS)
    )
    w.out += bytes((0xFF, 0xC4)) + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        w.out += bytes((0xFF, 0xDD)) + struct.pack(">HH", 4, restart_interval)

    def sos(ss, se, ah, al):
        hdr = bytes((1, 1, 0x00, ss, se, (ah << 4) | al))
        w.out += bytes((0xFF, 0xDA)) + struct.pack(">H", 2 + len(hdr)) + hdr

    bands = [(1, spectral_split), (spectral_split + 1, 63)]
    # scan script: DC first, AC firsts, then refinements down to 0
    sos(0, 0, 0, dc_al)
    _encode_dc_first_scan(w, zzs, dc_codes, dc_al, restart_interval)
    for ss, se in bands:
        sos(ss, se, 0, ac_al)
        _encode_ac_first_scan(w, zzs, ac_codes, ss, se, ac_al, restart_interval)
    for al in range(dc_al - 1, -1, -1):
        sos(0, 0, al + 1, al)
        _encode_dc_refine_scan(w, zzs, al, restart_interval)
    for al in range(ac_al - 1, -1, -1):
        for ss, se in bands:
            sos(ss, se, al + 1, al)
            _encode_ac_refine_scan(
                w, zzs, ac_codes, ss, se, al, restart_interval
            )
    w.out += bytes((0xFF, 0xD9))  # EOI
    return bytes(w.out)


# ------------------------------------------------- real GIF codec
# (r8: the video-shaped path gets a real multi-frame container —
# animated GIF89a with a full LZW implementation, pure stdlib. GIF is
# lossless, so frame sampling gates EXACTLY: q300 encodes a
# deterministic animation per document, decodes it back, and hashes
# per-frame index/palette sums against a SQL oracle. The LZW layer is
# the real thing: variable code widths 3..12 bits LSB-first, CLEAR/
# EOI codes, the KwKwK corner case, dictionary reset at 4096, 255-byte
# sub-block framing. True video codecs (H.264 etc. via ffmpeg) stay
# behind the stub policy; GIF is the honest stdlib-only member of the
# family, and sample_frames' fake digest path remains for opaque
# formats.)


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR first, grows the code width when
    the next free code no longer fits (encoder grows one code LATER
    than the dictionary add — the classic off-by-one that decoders
    time against), resets at 4096, ends with EOI. LSB-first packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = n = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    nxt = eoi + 1
    emit(clear, width)
    prefix: tuple[int, ...] = ()
    for k in indices:
        cand = prefix + (k,)
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        table[cand] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt == 4096 + 1:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
        prefix = (k,)
    if prefix:
        emit(table[prefix], width)
        # the decoder adds one more entry while PROCESSING this final
        # code (the encoder's emit-then-add loop never adds for it, so
        # the usual one-add-ahead offset between the two bump rules
        # breaks here): when that last entry lands exactly on
        # 1 << width, the decoder widens before reading EOI — emit
        # EOI at the width the decoder's state implies (hypothesis
        # falsified the mcs=2 boundary, r10)
        if nxt == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(
    data: bytes, min_code_size: int, expect: int
) -> list[int]:
    """Inverse of :func:`_gif_lzw_encode`; stops after EOI. Raises
    ValueError on codes beyond the dictionary or missing EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = acc = n = 0

    def read(width: int) -> int:
        nonlocal pos, acc, n
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        return v

    width = min_code_size + 1
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    nxt = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    while True:
        code = read(width)
        if code == clear:
            table = {i: [i] for i in range(clear)}
            nxt = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError("LZW code out of range")
        out.extend(entry)
        if prev is not None and nxt < 4096:
            table[nxt] = prev + [entry[0]]
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != expect:
        raise ValueError("LZW pixel count mismatch")
    return out


def _gif_subblocks(data: bytes) -> bytes:
    """Wrap raw bytes in GIF's <=255-byte length-prefixed sub-blocks
    plus the 0x00 terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    frames: list[list[list[int]]],
    palette: list[tuple[int, int, int]],
    delays_cs: list[int] | None = None,
    loop: bool = True,
    comment: bytes | None = b"node_etl_spark",
) -> bytes:
    """Encode palette-index frames (top-down rows) as an animated
    GIF89a — global color table, per-frame graphic control extension
    with centisecond delays, real LZW image data. A NETSCAPE looping
    application extension and a comment extension are planted by
    default, so a decoder that can't skip unknown extension blocks
    breaks (the adversarial-encoder pattern of the BMP/PNG/WAV/JPEG
    twins)."""
    import struct

    if not palette or len(palette) > 256:
        raise ValueError("palette must have 1..256 entries")
    depth = max(2, (len(palette) - 1).bit_length() or 1)
    table_n = 1 << depth
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, depth bits/pixel
    out += struct.pack(
        "<HHBBB", width, height, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    for i in range(table_n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _gif_subblocks(
            b"\x01\x00\x00"
        )
    if comment is not None:
        out += b"\x21\xfe" + _gif_subblocks(comment)
    for fi, frame in enumerate(frames):
        delay = delays_cs[fi] if delays_cs else 10
        # graphic control extension: no disposal, no transparency
        out += b"\x21\xf9" + _gif_subblocks(
            struct.pack("<BHB", 0, delay, 0)
        )
        # image descriptor: full frame, no local table, not interlaced
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        idx = [v for row in frame for v in row]
        if len(idx) != width * height or any(
            not (0 <= v < len(palette)) for v in idx
        ):
            raise ValueError("bad frame indices")
        out.append(depth)  # LZW minimum code size
        out += _gif_subblocks(_gif_lzw_encode(idx, depth))
    out.append(0x3B)  # trailer
    return bytes(out)


@_corrupt_as_valueerror
def decode_gif(
    content: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[tuple[int, list[list[int]]]]]:
    """Pure-stdlib decoder for animated GIF87a/89a with a global
    color table: walks the block stream (skipping extensions it
    doesn't know via the sub-block chain, capturing per-frame delays
    from graphic control extensions) and LZW-decodes every frame.
    Returns (width, height, palette, frames) with frames as
    (delay_cs, top-down index rows). Raises ValueError on non-GIF or
    unsupported variants (local color tables, interlace, partial-
    frame composition stay behind the stub policy)."""
    import struct

    if len(content) < 13 or content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF file")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    if width <= 0 or height <= 0:
        raise ValueError("bad dimensions")
    if not packed & 0x80:
        raise ValueError("missing global color table")
    table_n = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * table_n > len(content):
        raise ValueError("truncated color table")
    palette = [
        tuple(content[pos + 3 * i : pos + 3 * i + 3]) for i in range(table_n)
    ]
    pos += 3 * table_n

    def skip_subblocks(p: int) -> tuple[bytes, int]:
        data = bytearray()
        while True:
            if p >= len(content):
                raise ValueError("truncated sub-blocks")
            ln = content[p]
            p += 1
            if ln == 0:
                return bytes(data), p
            if p + ln > len(content):
                raise ValueError("truncated sub-block")
            data += content[p : p + ln]
            p += ln

    frames: list[tuple[int, list[list[int]]]] = []
    delay = 0
    ended = False
    while pos < len(content):
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            ended = True
            break
        if block == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated extension")
            label = content[pos]
            pos += 1
            data, pos = skip_subblocks(pos)
            if label == 0xF9:  # graphic control
                if len(data) < 3:
                    raise ValueError("short graphic control extension")
                (delay,) = struct.unpack_from("<H", data, 1)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if (left, top, fw, fh) != (0, 0, width, height):
            raise ValueError("partial-frame composition unsupported")
        if fpacked & 0x80:
            raise ValueError("local color tables unsupported")
        if fpacked & 0x40:
            raise ValueError("interlaced frames unsupported")
        if pos >= len(content):
            raise ValueError("missing LZW code size")
        mcs = content[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError("bad LZW minimum code size")
        data, pos = skip_subblocks(pos)
        idx = _gif_lzw_decode(data, mcs, width * height)
        if any(v >= table_n for v in idx):
            raise ValueError("palette index out of range")
        rows = [idx[y * width : (y + 1) * width] for y in range(height)]
        frames.append((delay, rows))
        delay = 0
    if not ended or not frames:
        raise ValueError("missing trailer or no frames")
    return width, height, palette, frames


def gif_frame_stats(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    every_k: int = 1,
) -> DataFrame:
    """REAL frame sampling over animated GIFs: decode the container
    (:func:`decode_gif`), keep every ``every_k``-th frame, and emit
    per-frame exact stats — cumulative timestamp from the GCE delays,
    index sum, and palette-mapped red-channel sum. The real-decode
    twin of :func:`sample_frames` (which stays as the opaque-format
    stub): same 1:N Arrow-batched executor-side explosion, zero
    shuffles, corrupt files yield no rows (warn-and-skip)."""
    if every_k < 1:
        # reject up front — inside the mapInPandas stage this would
        # surface as a ZeroDivisionError failing the whole task
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, frame_idx int, frame_ts_ms bigint,"
        " n_px bigint, sum_idx bigint, sum_r bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fis, tss, ns, sis, srs = [], [], [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                try:
                    w, h, palette, frames = decode_gif(bytes(content))
                except Exception:  # noqa: BLE001 - corrupt input policy
                    continue
                ts = 0
                for fi, (delay, rows) in enumerate(frames):
                    ts += delay * 10  # centiseconds -> ms
                    if fi % every_k:
                        continue
                    sum_idx = sum_r = 0
                    for row in rows:
                        for v in row:
                            sum_idx += v
                            sum_r += palette[v][0]
                    ids.append(rid)
                    fis.append(fi)
                    tss.append(ts)
                    ns.append(w * h)
                    sis.append(sum_idx)
                    srs.append(sum_r)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.Series(fis, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "n_px": pd.Series(ns, dtype="int64"),
                    "sum_idx": pd.Series(sis, dtype="int64"),
                    "sum_r": pd.Series(srs, dtype="int64"),
                }
            )

    return binaries.select(id_col, content_col).mapInPandas(
        batches, schema=schema
    )


# ------------------------------------------- WebDataset-style shards
# (r8: large multimodal training corpora ship as TAR SHARDS — the
# WebDataset layout: each shard is a tar whose members group into
# samples by the filename prefix before the first dot ("000017.jpg" +
# "000017.txt" + "000017.meta.json" = one sample), and loaders stream
# samples by member ADJACENCY, never by a global index. Both halves
# are pure stdlib (tarfile/gzip) and fully real; shard explode and
# sample grouping are 1:N / N:M mapInPandas stages that add ZERO
# shuffles because WebDataset's adjacency contract makes grouping
# partition-local — exactly the property that lets the format scale
# to 100 TB of shards. Gated end-to-end by q301/q302.)


def encode_tar_shard(
    members: list[tuple[str, bytes]], compress: bool = False
) -> bytes:
    """Encode (name, bytes) members as a DETERMINISTIC ustar tar
    (fixed mtime/uid/gid/mode so identical inputs produce identical
    shard bytes — required for content-addressed shard dedup);
    ``compress=True`` gzips the shard (mtime=0) into a ``.tar.gz``."""
    import gzip
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(
        fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
    ) as tf:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            ti.uid = ti.gid = 0
            ti.mode = 0o644
            tf.addfile(ti, io.BytesIO(data))
    raw = buf.getvalue()
    return gzip.compress(raw, 6, mtime=0) if compress else raw


def iter_tar_members(content: bytes) -> "Iterator[tuple[str, bytes]]":
    """Walk a tar / tar.gz shard's REGULAR members in archive order
    (the order WebDataset semantics depend on). Compression is
    sniffed by ``tarfile`` itself (``r:*``). Directories, links and
    special entries are skipped; a corrupt archive raises."""
    import io
    import tarfile

    with tarfile.open(fileobj=io.BytesIO(content), mode="r:*") as tf:
        for ti in tf:
            if not ti.isreg():
                continue
            f = tf.extractfile(ti)
            yield ti.name, (f.read() if f is not None else b"")


def explode_tar_members(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """1:N shard explode: one output row per regular tar member —
    (id, member_name, member_size, member_bytes). Arrow-batched,
    partition-local, zero shuffles; corrupt shards yield no rows
    (warn-and-skip). Compose with :func:`decode_image_auto` /
    :func:`webdataset_samples` downstream."""
    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, member_name string, member_size bigint,"
        " member_bytes binary"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, names, sizes, blobs = [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                try:
                    members = list(iter_tar_members(bytes(content)))
                except Exception:  # noqa: BLE001 - corrupt input policy
                    continue
                for name, data in members:
                    ids.append(rid)
                    names.append(name)
                    sizes.append(len(data))
                    blobs.append(data)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "member_name": pd.Series(names, dtype="object"),
                    "member_size": pd.Series(sizes, dtype="int64"),
                    "member_bytes": pd.Series(blobs, dtype="object"),
                }
            )

    return binaries.select(id_col, content_col).mapInPandas(
        batches, schema=schema
    )


def webdataset_samples(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """WebDataset sample grouping: members group by the basename
    prefix before the FIRST dot; the remainder is the part extension
    (multi-dot extensions like ``meta.json`` stay whole). Grouping
    uses member ADJACENCY within the shard — the WebDataset contract
    — so it is partition-local with zero shuffles (a groupBy on
    sample key would shuffle the entire corpus for nothing). Emits
    one row per sample: (id, sample_key, parts map<ext, bytes>)."""
    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, sample_key string, parts map<string,binary>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, keys, parts = [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                try:
                    members = list(iter_tar_members(bytes(content)))
                except Exception:  # noqa: BLE001 - corrupt input policy
                    continue
                cur_key, cur_parts = None, {}
                for name, data in members:
                    base = name.rsplit("/", 1)[-1]
                    key, _, ext = base.partition(".")
                    if key != cur_key:
                        if cur_key is not None:
                            ids.append(rid)
                            keys.append(cur_key)
                            parts.append(cur_parts)
                        cur_key, cur_parts = key, {}
                    cur_parts[ext] = data
                if cur_key is not None:
                    ids.append(rid)
                    keys.append(cur_key)
                    parts.append(cur_parts)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "sample_key": pd.Series(keys, dtype="object"),
                    "parts": pd.Series(parts, dtype="object"),
                }
            )

    return binaries.select(id_col, content_col).mapInPandas(
        batches, schema=schema
    )


# ------------------------------------------- compressed text columns
# (r8: text corpora land in lakes with per-value compression — a
# binary column of gzip/zlib/bz2/lzma payloads next to typed metadata.
# All four codecs are stdlib and deterministic (gzip pinned to
# mtime=0), so the round-trip gates exactly (q304). Vectorized
# pandas_udf: one Arrow crossing per batch; decompression sniffs the
# codec from magic bytes by default, because real lakes mix codecs
# across files and eras. snappy is REAL as of r9 (pure-stdlib framed
# + raw, see below); zstd needs an absent library and follows the
# stub policy — the sniff returns None and the value becomes a NULL
# (warn-and-skip), never garbage.)

# --- snappy (r9): REAL pure-stdlib implementation. The raw format's
# decoder is complete (literal + all three copy-tag widths, including
# overlapping copies); the encoder emits the spec-legal all-literal
# form (deterministic; production swaps python-snappy behind the same
# two functions for ratio). The FRAMED container (sNaPpY magic,
# masked-CRC32C chunks) is what makes snappy sniffable — raw snappy
# has no magic — so compress_bytes emits framed and the sniffer
# recognizes it; decompress accepts framed or raw. zstd stays the one
# genuinely library-bound codec (PARITY.md codec closure).

_SNAPPY_MAGIC = b"\xff\x06\x00\x00sNaPpY"

_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), reflected poly 0x82F63B78 — the checksum
    the snappy framing format requires (stdlib zlib.crc32 is CRC-32/
    ISO-HDLC, a different polynomial)."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            tbl.append(c)
        _CRC32C_TABLE = tbl
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _snappy_mask_crc(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _snappy_raw_compress(data: bytes) -> bytes:
    """Raw snappy stream in the spec-legal all-literal form: varint
    uncompressed length, then literal runs."""
    out = bytearray()
    n = len(data)
    while True:  # varint
        if n < 0x80:
            out.append(n)
            break
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    pos = 0
    while pos < len(data):
        run = data[pos : pos + 65536]
        ln = len(run) - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 256:
            out += bytes((60 << 2, ln))
        else:
            out += bytes((61 << 2, ln & 0xFF, ln >> 8))
        out += run
        pos += len(run)
    return bytes(out)


def _snappy_raw_decompress(data: bytes) -> bytes:
    """Full raw-snappy decoder: 00 literal, 01/10/11 copy tags,
    overlapping copies handled byte-wise per the spec."""
    pos, shift, want = 0, 0, 0
    while True:  # varint uncompressed length
        if pos >= len(data):
            raise ValueError("truncated snappy varint")
        b = data[pos]
        want |= (b & 0x7F) << shift
        pos += 1
        shift += 7
        if not b & 0x80:
            break
        if shift > 35:
            raise ValueError("snappy varint overflow")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        ttype = tag & 3
        pos += 1
        if ttype == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(data):
                    raise ValueError("truncated snappy literal length")
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(data):
                raise ValueError("truncated snappy literal")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if ttype == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x07) + 4
            if pos >= len(data):
                raise ValueError("truncated snappy copy")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif ttype == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > len(data):
                raise ValueError("truncated snappy copy")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > len(data):
                raise ValueError("truncated snappy copy")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("bad snappy copy offset")
        start = len(out) - off
        for i in range(ln):  # byte-wise: copies may overlap themselves
            out.append(out[start + i])
    if len(out) != want:
        raise ValueError("snappy length mismatch")
    return bytes(out)


def _snappy_frame_compress(data: bytes) -> bytes:
    out = bytearray(_SNAPPY_MAGIC)
    pos = 0
    while True:
        chunk = data[pos : pos + 65536]
        crc = _snappy_mask_crc(_crc32c(chunk)).to_bytes(4, "little")
        comp = _snappy_raw_compress(chunk)
        # framing spec: prefer an uncompressed (0x01) chunk when the
        # compressed form is not smaller (ADVICE r9 — the all-literal
        # encoder always expands by the length header, so every chunk
        # takes this branch today; a real LZ77 matcher dropped behind
        # _snappy_raw_compress flips it automatically). The CRC covers
        # the UNCOMPRESSED bytes in both chunk types.
        if len(comp) < len(chunk):
            ctype, body = 0x00, comp
        else:
            ctype, body = 0x01, chunk
        payload = crc + body
        out += bytes((ctype,)) + len(payload).to_bytes(3, "little") + payload
        pos += 65536
        if pos >= len(data):
            break
    return bytes(out)


def _snappy_frame_decompress(data: bytes) -> bytes:
    if not data.startswith(_SNAPPY_MAGIC):
        raise ValueError("not a framed snappy stream")
    pos = len(_SNAPPY_MAGIC)
    out = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated snappy chunk header")
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1 : pos + 4], "little")
        pos += 4
        if pos + ln > len(data):
            raise ValueError("truncated snappy chunk")
        body = data[pos : pos + ln]
        pos += ln
        if ctype == 0x00 or ctype == 0x01:  # compressed / uncompressed
            if ln < 4:
                raise ValueError("short snappy chunk")
            crc = int.from_bytes(body[:4], "little")
            payload = (
                _snappy_raw_decompress(body[4:])
                if ctype == 0x00
                else bytes(body[4:])
            )
            if _snappy_mask_crc(_crc32c(payload)) != crc:
                raise ValueError("snappy chunk checksum mismatch")
            out += payload
        elif ctype == 0xFE or 0x80 <= ctype <= 0xFD:
            continue  # padding / skippable
        else:
            raise ValueError(f"unknown snappy chunk type {ctype:#x}")
    return bytes(out)


# --------------------------------------------------------------------
# zstd (RFC 8878) — r10, closing the last codec from PARITY's
# deployment-dependency list. Two engines behind one seam:
#   * COMPRESS: the system libzstd via a pure-stdlib ctypes binding
#     (no pip package needed — libzstd.so ships with every mainstream
#     distro); falls back to `_zstd_stored_compress`, which writes a
#     valid zstd frame of RAW blocks + content checksum that every
#     conformant decoder reads (entropy ENCODING is the genuinely
#     library-bound half).
#   * DECOMPRESS: libzstd when present (the 100 TB fast path), else
#     `_zstd_py_decompress` — a complete pure-stdlib RFC 8878 frame
#     decoder (FSE, Huffman literals incl. 4-stream, interleaved
#     sequence bitstreams, repeat offsets, XXH64 content checksum),
#     cross-validated against real libzstd output in unit tests.
# --------------------------------------------------------------------

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_ZSTD_MAX_OUT = 1 << 27  # 128 MiB per value: decompression-bomb guard

# XXH64 primes (public domain reference constants)
_XX64_P1 = 0x9E3779B185EBCA87
_XX64_P2 = 0xC2B2AE3D27D4EB4F
_XX64_P3 = 0x165667B19E3779F9
_XX64_P4 = 0x85EBCA77C2B2AE63
_XX64_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _xxh64(data: bytes, seed: int = 0) -> int:
    """Pure-stdlib XXH64 (zstd's frame checksum is its low 32 bits,
    seed 0). Cross-checked against the JVM implementation via Spark's
    xxhash64(binary, seed 42) in tests — two independent codebases
    agreeing on random inputs."""
    import struct

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XX64_P1 + _XX64_P2) & _M64
        v2 = (seed + _XX64_P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XX64_P1) & _M64
        while i <= n - 32:
            a, b, c, d = struct.unpack_from("<4Q", data, i)
            v1 = (rotl((v1 + a * _XX64_P2) & _M64, 31) * _XX64_P1) & _M64
            v2 = (rotl((v2 + b * _XX64_P2) & _M64, 31) * _XX64_P1) & _M64
            v3 = (rotl((v3 + c * _XX64_P2) & _M64, 31) * _XX64_P1) & _M64
            v4 = (rotl((v4 + d * _XX64_P2) & _M64, 31) * _XX64_P1) & _M64
            i += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (rotl((v * _XX64_P2) & _M64, 31) * _XX64_P1) & _M64
            h = (h * _XX64_P1 + _XX64_P4) & _M64
    else:
        h = (seed + _XX64_P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (rotl((k * _XX64_P2) & _M64, 31) * _XX64_P1) & _M64
        h = (rotl(h, 27) * _XX64_P1 + _XX64_P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _XX64_P1) & _M64
        h = (rotl(h, 23) * _XX64_P2 + _XX64_P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XX64_P5) & _M64
        h = (rotl(h, 11) * _XX64_P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XX64_P2) & _M64
    h ^= h >> 29
    h = (h * _XX64_P3) & _M64
    h ^= h >> 32
    return h


_LIBZSTD_CACHE: list = []  # [] unprobed; [None] absent; [lib] loaded


def _libzstd():
    """ctypes handle to the SYSTEM libzstd, or None. Stdlib-only
    binding (ctypes) — no pip package; parameter enums are stable ABI
    (zstd.h: compressionLevel=100, contentSizeFlag=200,
    checksumFlag=201)."""
    if _LIBZSTD_CACHE:
        return _LIBZSTD_CACHE[0]
    import ctypes
    import ctypes.util

    lib = None
    names = ["libzstd.so.1", "libzstd.so", "libzstd.1.dylib"]
    found = ctypes.util.find_library("zstd")
    if found:
        names.append(found)
    for name in names:
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    if lib is not None:
        try:
            c = ctypes
            lib.ZSTD_isError.restype = c.c_uint
            lib.ZSTD_isError.argtypes = [c.c_size_t]
            lib.ZSTD_compressBound.restype = c.c_size_t
            lib.ZSTD_compressBound.argtypes = [c.c_size_t]
            lib.ZSTD_createCCtx.restype = c.c_void_p
            lib.ZSTD_freeCCtx.argtypes = [c.c_void_p]
            lib.ZSTD_CCtx_setParameter.restype = c.c_size_t
            lib.ZSTD_CCtx_setParameter.argtypes = [c.c_void_p, c.c_int, c.c_int]
            lib.ZSTD_compress2.restype = c.c_size_t
            lib.ZSTD_compress2.argtypes = [
                c.c_void_p, c.c_void_p, c.c_size_t, c.c_char_p,
                c.c_size_t,
            ]  # (cctx, dst, dstCap, src, srcSize)
            lib.ZSTD_decompress.restype = c.c_size_t
            lib.ZSTD_decompress.argtypes = [
                c.c_void_p, c.c_size_t, c.c_char_p, c.c_size_t,
            ]
            lib.ZSTD_getFrameContentSize.restype = c.c_ulonglong
            lib.ZSTD_getFrameContentSize.argtypes = [c.c_char_p, c.c_size_t]
            lib.ZSTD_findFrameCompressedSize.restype = c.c_size_t
            lib.ZSTD_findFrameCompressedSize.argtypes = [
                c.c_char_p, c.c_size_t,
            ]
        except AttributeError:  # too old / stripped: treat as absent
            lib = None
    _LIBZSTD_CACHE.append(lib)
    return lib


def _zstd_lib_compress(data: bytes, level: int = 3) -> bytes:
    import ctypes

    lib = _libzstd()
    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise ValueError("zstd context allocation failed")
    try:
        lib.ZSTD_CCtx_setParameter(cctx, 100, level)  # compressionLevel
        lib.ZSTD_CCtx_setParameter(cctx, 200, 1)  # contentSizeFlag
        lib.ZSTD_CCtx_setParameter(cctx, 201, 1)  # checksumFlag
        bound = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        ret = lib.ZSTD_compress2(cctx, dst, bound, data, len(data))
        if lib.ZSTD_isError(ret):
            raise ValueError("zstd compression failed")
        return dst.raw[:ret]
    finally:
        lib.ZSTD_freeCCtx(cctx)


def _zstd_lib_decompress(data: bytes) -> bytes:
    """Frame-by-frame libzstd decode: legal inputs may carry LEADING
    SKIPPABLE FRAMES or be several concatenated frames (RFC 8878 §3),
    so sizing the destination from the first frame's content size
    alone mis-reports them as corrupt (ADVICE r10). Frames without a
    content-size field fall through to the pure-Python streaming
    decoder for the whole input."""
    import ctypes

    lib = _libzstd()
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        frame = data[pos:]
        fsize = lib.ZSTD_findFrameCompressedSize(frame, len(frame))
        if lib.ZSTD_isError(fsize) or fsize == 0:
            raise ValueError("corrupt zstd frame")
        size = lib.ZSTD_getFrameContentSize(frame, len(frame))
        if size == _M64:  # ZSTD_CONTENTSIZE_UNKNOWN: stream w/o FCS
            return _zstd_py_decompress(data)
        if size == _M64 - 1:  # ZSTD_CONTENTSIZE_ERROR
            raise ValueError("corrupt zstd frame header")
        # skippable frames report content size 0 and emit nothing
        if size:
            if len(out) + size > _ZSTD_MAX_OUT:
                raise ValueError("zstd content too large")
            dst = ctypes.create_string_buffer(int(size))
            ret = lib.ZSTD_decompress(
                dst, int(size), data[pos : pos + fsize], fsize
            )
            if lib.ZSTD_isError(ret) or ret != size:
                raise ValueError("corrupt zstd payload")
            out += dst.raw[: int(size)]
        pos += fsize
    return bytes(out)


def _zstd_stored_compress(data: bytes) -> bytes:
    """Valid zstd frame using only RAW blocks (single-segment, content
    size + XXH64 checksum): the pure-stdlib WRITER fallback when
    libzstd is absent. Expands by 3 bytes per 128 KiB plus a 9-17 byte
    envelope; every conformant decoder (including libzstd and
    _zstd_py_decompress) reads it."""
    n = len(data)
    if n < 256:
        fcs_code, fcs = 0, n.to_bytes(1, "little")
    elif n <= 0xFFFF + 256:
        fcs_code, fcs = 1, (n - 256).to_bytes(2, "little")
    elif n < (1 << 32):
        fcs_code, fcs = 2, n.to_bytes(4, "little")
    else:
        fcs_code, fcs = 3, n.to_bytes(8, "little")
    out = bytearray(_ZSTD_MAGIC)
    out.append((fcs_code << 6) | (1 << 5) | (1 << 2))  # single-seg+checksum
    out += fcs
    pos = 0
    while True:
        chunk = data[pos : pos + 131072]  # Block_Maximum_Size
        pos += len(chunk)
        last = 1 if pos >= n else 0
        out += ((len(chunk) << 3) | last).to_bytes(3, "little")  # type raw
        out += chunk
        if last:
            break
    out += (_xxh64(data, 0) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


_LIBZSTD_DICT_CACHE: list = []  # [] unprobed; [None] absent; [lib] ready


def _libzstd_dict():
    """The same ctypes libzstd handle with the DICTIONARY entry points
    bound (ZDICT_trainFromBuffer + *_usingDict), or None when the
    library is absent or too old. Dictionary compression is the small-
    record lever: a 4 KiB dict trained on sample records amortizes the
    shared structure (keys, enum values, date shapes) that per-record
    frames cannot exploit. zstd manual: ZDICT_trainFromBuffer wants
    ~100x dictSize of sample bytes and >= ~10 samples."""
    if _LIBZSTD_DICT_CACHE:
        return _LIBZSTD_DICT_CACHE[0]
    import ctypes as c

    lib = _libzstd()
    if lib is not None:
        try:
            lib.ZDICT_trainFromBuffer.restype = c.c_size_t
            lib.ZDICT_trainFromBuffer.argtypes = [
                c.c_void_p, c.c_size_t, c.c_char_p,
                c.POINTER(c.c_size_t), c.c_uint,
            ]
            lib.ZDICT_isError.restype = c.c_uint
            lib.ZDICT_isError.argtypes = [c.c_size_t]
            lib.ZSTD_createDCtx.restype = c.c_void_p
            lib.ZSTD_freeDCtx.argtypes = [c.c_void_p]
            lib.ZSTD_CCtx_loadDictionary.restype = c.c_size_t
            lib.ZSTD_CCtx_loadDictionary.argtypes = [
                c.c_void_p, c.c_char_p, c.c_size_t,
            ]
            lib.ZSTD_createDDict.restype = c.c_void_p
            lib.ZSTD_createDDict.argtypes = [c.c_char_p, c.c_size_t]
            lib.ZSTD_decompress_usingDDict.restype = c.c_size_t
            lib.ZSTD_decompress_usingDDict.argtypes = [
                c.c_void_p, c.c_void_p, c.c_size_t, c.c_char_p,
                c.c_size_t, c.c_void_p,
            ]
        except AttributeError:  # stripped/ancient build: no dict API
            lib = None
    _LIBZSTD_DICT_CACHE.append(lib)
    return lib


def zstd_train_dict(samples, dict_size: int = 4096) -> bytes:
    """Train a zstd dictionary on sample records (ZDICT_trainFromBuffer
    through the stdlib ctypes binding — no pip package). Returns the
    dictionary bytes, or b"" when libzstd is absent or the trainer
    rejects the sample set (too few / too small samples) — callers
    treat b"" as "compress without a dictionary", so the pipeline
    degrades to plain per-record frames instead of failing.

    Training runs DRIVER-SIDE on a bounded sample (the zstd manual's
    guidance is ~100x dict_size of sample bytes); the resulting dict
    is small (KBs) and broadcasts to executors for both compress and
    decompress. Deterministic for a fixed sample list and library
    version."""
    import ctypes as c

    lib = _libzstd_dict()
    samples = [bytes(s) for s in samples if s]
    if lib is None or len(samples) < 8:
        return b""
    buf = b"".join(samples)
    sizes = (c.c_size_t * len(samples))(*[len(s) for s in samples])
    dst = c.create_string_buffer(int(dict_size))
    ret = lib.ZDICT_trainFromBuffer(
        dst, int(dict_size), buf, sizes, len(samples)
    )
    if lib.ZDICT_isError(ret):
        return b""
    return dst.raw[:ret]


def zstd_compress_dict(data: bytes, dict_bytes: bytes, level: int = 3) -> bytes:
    """Compress one record against a trained dictionary. Uses the
    ADVANCED one-shot API (ZSTD_CCtx_loadDictionary + ZSTD_compress2)
    rather than legacy ZSTD_compress_usingDict, because only the
    advanced path lets us set contentSizeFlag + checksumFlag — the
    legacy call writes NO XXH64 checksum, and a bit-flipped frame can
    then silently decode to garbage (caught on the q325 gate). Empty
    dict (or absent library) falls back to the plain zstd writer, so
    the output is always a valid zstd frame; frames written WITH a
    dict carry its dictID and refuse to decode without it."""
    import ctypes as c

    lib = _libzstd_dict()
    if lib is None or not dict_bytes:
        return compress_bytes(data, "zstd")
    cctx = lib.ZSTD_createCCtx()
    if not cctx:
        raise ValueError("zstd context allocation failed")
    try:
        lib.ZSTD_CCtx_setParameter(cctx, 100, int(level))  # level
        lib.ZSTD_CCtx_setParameter(cctx, 200, 1)  # contentSizeFlag
        lib.ZSTD_CCtx_setParameter(cctx, 201, 1)  # checksumFlag
        ret = lib.ZSTD_CCtx_loadDictionary(
            cctx, dict_bytes, len(dict_bytes)
        )
        if lib.ZSTD_isError(ret):
            raise ValueError("zstd dictionary load failed")
        bound = lib.ZSTD_compressBound(len(data))
        dst = c.create_string_buffer(bound)
        ret = lib.ZSTD_compress2(cctx, dst, bound, data, len(data))
        if lib.ZSTD_isError(ret):
            raise ValueError("zstd dictionary compression failed")
        return dst.raw[:ret]
    finally:
        lib.ZSTD_freeCCtx(cctx)


# (dict bytes -> digested DDict pointer + one reusable DCtx), cached
# per worker process: ZSTD_decompress_usingDict re-digests the whole
# dictionary on EVERY call, which dominated q325's decode profile.
# A DDict digests once and is sharable/read-only thereafter; never
# freed (a handful of KB per distinct dictionary per worker).
_ZSTD_DDICT_CACHE: dict = {}


def zstd_decompress_dict(data: bytes, dict_bytes: bytes) -> bytes:
    """Decompress one dictionary-compressed record against a cached
    digested dictionary (ZSTD_createDDict once per worker +
    ZSTD_decompress_usingDDict per record). Plain frames (no dictID)
    pass through unchanged semantics, so a mixed store reads with one
    code path. ValueError on corrupt payloads, size lies, or a
    missing/mismatched dictionary — never garbage bytes."""
    import ctypes as c

    lib = _libzstd_dict()
    if lib is None or not dict_bytes:
        return decompress_bytes(data, "zstd")
    if len(data) < 4 or data[:4] != _ZSTD_MAGIC:
        raise ValueError("not a zstd frame")
    size = lib.ZSTD_getFrameContentSize(data, len(data))
    if size in (_M64, _M64 - 1):  # unknown or unreadable content size
        raise ValueError("corrupt zstd frame header")
    if size > _ZSTD_MAX_OUT:
        raise ValueError("zstd content too large")
    # keyed by the bytes object itself: bytes caches its __hash__, so
    # the 4 KiB dict is hashed once per OBJECT, not once per record
    # (keying by the pure-python _xxh64 re-hashed the dict per call
    # and was 5x slower than no DDict at all)
    key = dict_bytes
    cached = _ZSTD_DDICT_CACHE.get(key)
    if cached is None:
        ddict = lib.ZSTD_createDDict(dict_bytes, len(dict_bytes))
        dctx = lib.ZSTD_createDCtx()
        if not ddict or not dctx:
            raise ValueError("zstd context allocation failed")
        cached = _ZSTD_DDICT_CACHE[key] = (ddict, dctx)
    ddict, dctx = cached
    dst = c.create_string_buffer(max(int(size), 1))
    ret = lib.ZSTD_decompress_usingDDict(
        dctx, dst, int(size), data, len(data), ddict
    )
    if lib.ZSTD_isError(ret) or ret != size:
        raise ValueError("corrupt zstd payload")
    return dst.raw[: int(size)]


class _ZstdBackBits:
    """Backward bitstream (RFC 8878 §4.1): the encoder writes bits
    back-to-front; the final byte carries a 1-bit end marker. read(n)
    past the start zero-fills (legal only where the spec allows —
    callers check `pos` for overflow)."""

    __slots__ = ("val", "pos")

    def __init__(self, data: bytes):
        if not data:
            raise ValueError("empty zstd bitstream")
        v = int.from_bytes(data, "little")
        if v == 0:
            raise ValueError("missing zstd bitstream end marker")
        self.val = v
        self.pos = v.bit_length() - 1  # drop the padding marker bit

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos - n
        self.pos = p
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        return (self.val << -p) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        p = self.pos - n
        if p >= 0:
            return (self.val >> p) & ((1 << n) - 1)
        return (self.val << -p) & ((1 << n) - 1)


def _fse_table(counts, accuracy_log):
    """FSE decode table per RFC 8878 §4.1.1: cell i -> (symbol, nbits,
    baseline). '-1' (less-than-one) symbols take cells from the table
    end; the rest spread with the standard (size/2 + size/8 + 3)
    step."""
    size = 1 << accuracy_log
    syms = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            syms[high] = s
            high -= 1
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(counts):
        for _ in range(max(c, 0)):
            syms[pos] = s
            pos = (pos + step) & mask
            while pos > high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("corrupt FSE distribution")
    nxt = [c if c > 0 else 1 for c in counts]
    table = []
    for i in range(size):
        s = syms[i]
        x = nxt[s]
        nxt[s] = x + 1
        nbits = accuracy_log - (x.bit_length() - 1)
        table.append((s, nbits, (x << nbits) - size))
    return table


def _fse_read_distribution(data: bytes, offset: int, max_symbol: int):
    """Read an FSE normalized-count header (forward, LSB-first).
    Returns (counts, accuracy_log, bytes_consumed). Mirrors the
    reference FSE_readNCount flow: threshold reads with one-bit-short
    small values, 2-bit zero-repeat flags after a zero count."""
    bitpos = 0

    def peek(n: int) -> int:
        end = offset + (bitpos + n + 7) // 8
        chunk = int.from_bytes(data[offset:end], "little")
        return (chunk >> bitpos) & ((1 << n) - 1)

    accuracy_log = peek(4) + 5
    bitpos += 4
    if accuracy_log > 9:
        raise ValueError("FSE accuracy log too large")
    remaining = (1 << accuracy_log) + 1
    threshold = 1 << accuracy_log
    nbits = accuracy_log + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1 and len(counts) <= max_symbol:
        if prev_zero:
            while True:
                rep = peek(2)
                bitpos += 2
                counts.extend([0] * rep)
                if rep != 3:
                    break
            prev_zero = False
            if len(counts) > max_symbol:
                break
        maxv = 2 * threshold - 1 - remaining
        v = peek(nbits)
        if (v & (threshold - 1)) < maxv:
            v &= threshold - 1
            bitpos += nbits - 1
        else:
            if v >= threshold:
                v -= maxv
            bitpos += nbits
        count = v - 1  # 0 encodes the 'less than 1' (-1) probability
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("corrupt FSE distribution total")
    used = (bitpos + 7) // 8
    if offset + used > len(data):
        raise ValueError("truncated FSE distribution")
    return counts, accuracy_log, used


def _huf_table(weights):
    """Canonical Huffman decode table from explicit weights plus the
    implicit last weight (completes the power of two). Table of
    2^max_bits cells -> (symbol, nbits); lowest-weight symbols fill
    from cell 0 (RFC 8878 §4.2.1)."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("empty huffman weights")
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left == 0 or left & (left - 1):
        raise ValueError("corrupt huffman weights")
    if max_bits > 11:
        raise ValueError("huffman code length over 11 bits")
    weights = list(weights) + [left.bit_length()]
    table = [None] * (1 << max_bits)
    code = 0
    for w in range(1, max_bits + 1):
        nbits = max_bits + 1 - w
        span = 1 << (w - 1)
        for s, ws in enumerate(weights):
            if ws == w:
                table[code : code + span] = [(s, nbits)] * span
                code += span
    if code != len(table):
        raise ValueError("corrupt huffman weights")
    return table, max_bits


def _huf_read_weights(data: bytes, offset: int):
    """Huffman tree description (RFC 8878 §4.2.1.2): header byte >= 128
    means direct 4-bit weights; < 128 means FSE-compressed weights
    (two interleaved states, emission from the OTHER state after
    bitstream overflow — the reference FSE_decompress interleave
    rule). Returns (weights, bytes_consumed)."""
    hb = data[offset]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        raw = data[offset + 1 : offset + 1 + nbytes]
        if len(raw) < nbytes:
            raise ValueError("truncated huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nbytes
    comp = data[offset + 1 : offset + 1 + hb]
    if len(comp) < hb:
        raise ValueError("truncated huffman weights")
    counts, al, used = _fse_read_distribution(comp, 0, 255)
    if al > 6:
        raise ValueError("huffman weight accuracy log over 6")
    table = _fse_table(counts, al)
    bs = _ZstdBackBits(comp[used:])
    states = [bs.read(al), bs.read(al)]
    if bs.pos < 0:
        raise ValueError("truncated huffman weight stream")
    weights = []
    i = 0
    while len(weights) < 256:
        sym, nb, base = table[states[i & 1]]
        weights.append(sym)
        states[i & 1] = base + bs.read(nb)
        if bs.pos < 0:  # overflow: flush the OTHER state and stop
            weights.append(table[states[(i + 1) & 1]][0])
            break
        i += 1
    else:
        raise ValueError("huffman weights overflow")
    return weights, 1 + hb


def _huf_decode_stream(table, max_bits, data, out_len):
    if out_len == 0:
        return b""
    bs = _ZstdBackBits(data)
    out = bytearray()
    while len(out) < out_len:
        s, nb = table[bs.peek(max_bits)]
        bs.pos -= nb
        if bs.pos < 0:
            raise ValueError("corrupt huffman literal stream")
        out.append(s)
    if bs.pos != 0:
        raise ValueError("huffman literal stream not fully consumed")
    return bytes(out)


# Sequence code tables (RFC 8878 §3.1.1.3.2.1): code -> (baseline, bits)
_ZSTD_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3),
    (40, 3), (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10),
    (2048, 11), (4096, 12), (8192, 13), (16384, 14), (32768, 15),
    (65536, 16),
]
_ZSTD_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3),
    (59, 3), (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9),
    (1027, 10), (2051, 11), (4099, 12), (8195, 13), (16387, 14),
    (32771, 15), (65539, 16),
]
# Predefined FSE distributions (RFC 8878 §3.1.1.3.2.2)
_ZSTD_LL_DEFAULT = ([
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
], 6)
_ZSTD_ML_DEFAULT = ([
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1,
], 6)
_ZSTD_OF_DEFAULT = ([
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1,
], 5)
_ZSTD_PREDEF_CACHE: dict = {}


def _zstd_seq_table(data, sp, mode, prev, default, max_code, max_al):
    """One sequence-section table per compression mode: 0 predefined,
    1 RLE (single 1-cell state), 2 FSE-described, 3 repeat previous.
    Returns ((table, accuracy_log), new_offset)."""
    if mode == 0:
        key = id(default)
        if key not in _ZSTD_PREDEF_CACHE:
            counts, al = default
            _ZSTD_PREDEF_CACHE[key] = (_fse_table(counts, al), al)
        return _ZSTD_PREDEF_CACHE[key], sp
    if mode == 1:
        sym = data[sp]
        if sym > max_code:
            raise ValueError("zstd RLE sequence symbol out of range")
        return ([(sym, 0, 0)], 0), sp + 1
    if mode == 2:
        counts, al, used = _fse_read_distribution(data, sp, max_code)
        if al > max_al:
            raise ValueError("zstd sequence accuracy log too large")
        return (_fse_table(counts, al), al), sp + used
    if prev is None:
        raise ValueError("zstd repeat mode with no previous table")
    return prev, sp


def _zstd_decode_block(block: bytes, out: bytearray, ctx: dict) -> None:
    """One compressed block: literals section (raw/RLE/Huffman incl.
    the 4-stream split) + sequences section (interleaved FSE states,
    backward bitstream, repeat-offset history)."""
    if not block:
        raise ValueError("empty zstd compressed block")
    b0 = block[0]
    lt = b0 & 3
    sf = (b0 >> 2) & 3
    if lt <= 1:  # raw / RLE literals
        if sf in (0, 2):
            regen, p = b0 >> 3, 1
        elif sf == 1:
            regen, p = (b0 >> 4) | (block[1] << 4), 2
        else:
            regen = (b0 >> 4) | (block[1] << 4) | (block[2] << 12)
            p = 3
        if lt == 0:
            literals = bytes(block[p : p + regen])
            p += regen
        else:
            literals = block[p : p + 1] * regen
            p += 1
        if len(literals) != regen:
            raise ValueError("truncated zstd literals")
    else:  # Huffman-compressed / treeless literals
        if sf == 0:
            streams, szbits, hlen = 1, 10, 3
        elif sf == 1:
            streams, szbits, hlen = 4, 10, 3
        elif sf == 2:
            streams, szbits, hlen = 4, 14, 4
        else:
            streams, szbits, hlen = 4, 18, 5
        hdr = int.from_bytes(block[:hlen], "little")
        regen = (hdr >> 4) & ((1 << szbits) - 1)
        comp = (hdr >> (4 + szbits)) & ((1 << szbits) - 1)
        section = block[hlen : hlen + comp]
        if len(section) != comp:
            raise ValueError("truncated zstd literals section")
        p = hlen + comp
        q = 0
        if lt == 2:
            weights, q = _huf_read_weights(section, 0)
            ctx["huf"] = _huf_table(weights)
        if ctx["huf"] is None:
            raise ValueError("treeless literals with no previous table")
        table, max_bits = ctx["huf"]
        if streams == 1:
            literals = _huf_decode_stream(table, max_bits, section[q:], regen)
        else:
            if q + 6 > len(section):
                raise ValueError("truncated zstd stream jump table")
            sizes = [
                int.from_bytes(section[q : q + 2], "little"),
                int.from_bytes(section[q + 2 : q + 4], "little"),
                int.from_bytes(section[q + 4 : q + 6], "little"),
            ]
            q += 6
            sizes.append(len(section) - q - sum(sizes))
            if sizes[3] <= 0:
                raise ValueError("corrupt zstd stream sizes")
            r = (regen + 3) // 4
            regs = [r, r, r, regen - 3 * r]
            if regs[3] < 0:
                raise ValueError("corrupt zstd 4-stream regen size")
            lit = bytearray()
            for sz, rg in zip(sizes, regs):
                lit += _huf_decode_stream(
                    table, max_bits, section[q : q + sz], rg
                )
                q += sz
            literals = bytes(lit)
    # ---- sequences section ----
    seq = block[p:]
    if not seq:
        raise ValueError("missing zstd sequences section")
    s0 = seq[0]
    if s0 == 0:
        out += literals
        return
    if s0 < 128:
        nseq, sp = s0, 1
    elif s0 < 255:
        nseq, sp = ((s0 - 128) << 8) + seq[1], 2
    else:
        nseq, sp = int.from_bytes(seq[1:3], "little") + 0x7F00, 3
    modes = seq[sp]
    sp += 1
    if modes & 3:
        raise ValueError("reserved zstd sequence mode bits set")
    ctx["ll"], sp = _zstd_seq_table(
        seq, sp, modes >> 6, ctx["ll"], _ZSTD_LL_DEFAULT, 35, 9
    )
    ctx["of"], sp = _zstd_seq_table(
        seq, sp, (modes >> 4) & 3, ctx["of"], _ZSTD_OF_DEFAULT, 31, 8
    )
    ctx["ml"], sp = _zstd_seq_table(
        seq, sp, (modes >> 2) & 3, ctx["ml"], _ZSTD_ML_DEFAULT, 52, 9
    )
    (ll_tab, ll_al), (of_tab, of_al), (ml_tab, ml_al) = (
        ctx["ll"], ctx["of"], ctx["ml"],
    )
    bs = _ZstdBackBits(seq[sp:])
    ll_state = bs.read(ll_al)
    of_state = bs.read(of_al)
    ml_state = bs.read(ml_al)
    if bs.pos < 0:
        raise ValueError("truncated zstd sequence bitstream")
    rep = ctx["rep"]
    lp = 0
    for i in range(nseq):
        of_code = of_tab[of_state][0]
        if of_code > 31:
            raise ValueError("zstd offset code out of range")
        ofv = (1 << of_code) + bs.read(of_code)
        mlb, mlx = _ZSTD_ML_CODE[ml_tab[ml_state][0]]
        ml = mlb + bs.read(mlx)
        llb, llx = _ZSTD_LL_CODE[ll_tab[ll_state][0]]
        ll = llb + bs.read(llx)
        if ofv > 3:
            offset = ofv - 3
            rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        else:
            k = ofv if ll != 0 else ofv + 1  # ll==0 shifts the history
            if k == 1:
                offset = rep[0]
            elif k == 2:
                offset = rep[1]
                rep[1], rep[0] = rep[0], offset
            elif k == 3:
                offset = rep[2]
                rep[2], rep[1], rep[0] = rep[1], rep[0], offset
            else:  # k == 4: Repeated_Offset1 - 1
                offset = rep[0] - 1
                rep[2], rep[1], rep[0] = rep[1], rep[0], offset
        if offset <= 0:
            raise ValueError("corrupt zstd repeat offset")
        if lp + ll > len(literals):
            raise ValueError("zstd literals overrun")
        out += literals[lp : lp + ll]
        lp += ll
        if offset > len(out):
            raise ValueError("zstd match before window start")
        if len(out) + ml > _ZSTD_MAX_OUT:
            raise ValueError("zstd output too large")
        if ml:
            if offset == 1:
                out += out[-1:] * ml
            elif ml <= offset:
                start = len(out) - offset
                out += out[start : start + ml]
            else:  # self-overlapping copy
                start = len(out) - offset
                for _ in range(ml):
                    out.append(out[start])
                    start += 1
        if i != nseq - 1:  # update states: LL, then ML, then OF
            _s, nb, base = ll_tab[ll_state]
            ll_state = base + bs.read(nb)
            _s, nb, base = ml_tab[ml_state]
            ml_state = base + bs.read(nb)
            _s, nb, base = of_tab[of_state]
            of_state = base + bs.read(nb)
            if bs.pos < 0:
                raise ValueError("zstd sequence bitstream overrun")
    if bs.pos != 0:
        raise ValueError("zstd sequence bitstream not fully consumed")
    out += literals[lp:]


@_corrupt_as_valueerror
def _zstd_py_decompress(data: bytes) -> bytes:
    """Pure-stdlib zstd decoder (RFC 8878): frame header, raw/RLE/
    compressed blocks, Huffman literals (direct + FSE-compressed
    weights, 1- and 4-stream), FSE sequence tables (predefined / RLE /
    described / repeat), interleaved backward bitstream, repeat-offset
    history, skippable frames, XXH64 content checksum. Dictionaries
    and windows over 128 MiB are rejected. Cross-validated against
    real libzstd output in tests/test_multimodal.py."""
    pos = 0
    out_all = bytearray()
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated zstd magic")
        mv = int.from_bytes(data[pos : pos + 4], "little")
        if (mv & 0xFFFFFFF0) == 0x184D2A50:  # skippable frame
            if pos + 8 > len(data):
                raise ValueError("truncated zstd skippable frame")
            pos += 8 + int.from_bytes(data[pos + 4 : pos + 8], "little")
            if pos > len(data):
                raise ValueError("truncated zstd skippable frame")
            continue
        if data[pos : pos + 4] != _ZSTD_MAGIC:
            raise ValueError("not a zstd frame")
        pos = _zstd_decode_frame(data, pos + 4, out_all)
    return bytes(out_all)


def _zstd_decode_frame(data: bytes, pos: int, out_all: bytearray) -> int:
    fhd = data[pos]
    pos += 1
    if fhd & 0x08:
        raise ValueError("reserved zstd frame header bit set")
    single = (fhd >> 5) & 1
    if not single:
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        if base + (base // 8) * (wd & 7) > _ZSTD_MAX_OUT:
            raise ValueError("zstd window too large")
    did_len = (0, 1, 2, 4)[fhd & 3]
    if did_len:
        if int.from_bytes(data[pos : pos + did_len], "little"):
            raise ValueError("zstd dictionaries not supported")
        pos += did_len
    fcs_len = (1 if single else 0, 2, 4, 8)[fhd >> 6]
    fcs = None
    if fcs_len:
        if pos + fcs_len > len(data):
            raise ValueError("truncated zstd frame header")
        fcs = int.from_bytes(data[pos : pos + fcs_len], "little")
        pos += fcs_len
        if fcs_len == 2:
            fcs += 256
        if fcs > _ZSTD_MAX_OUT:
            raise ValueError("zstd content too large")
    start = len(out_all)
    ctx = {"huf": None, "ll": None, "of": None, "ml": None, "rep": [1, 4, 8]}
    while True:
        if pos + 3 > len(data):
            raise ValueError("truncated zstd block header")
        bh = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last, btype, bsize = bh & 1, (bh >> 1) & 3, bh >> 3
        if btype == 0:
            if pos + bsize > len(data):
                raise ValueError("truncated zstd raw block")
            out_all += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:
            if pos >= len(data):
                raise ValueError("truncated zstd RLE block")
            out_all += data[pos : pos + 1] * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > len(data):
                raise ValueError("truncated zstd compressed block")
            _zstd_decode_block(data[pos : pos + bsize], out_all, ctx)
            pos += bsize
        else:
            raise ValueError("reserved zstd block type")
        if len(out_all) > _ZSTD_MAX_OUT:
            raise ValueError("zstd output too large")
        if last:
            break
    content = bytes(out_all[start:])
    if fcs is not None and len(content) != fcs:
        raise ValueError("zstd content size mismatch")
    if (fhd >> 2) & 1:  # content checksum
        if pos + 4 > len(data):
            raise ValueError("truncated zstd checksum")
        want = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if (_xxh64(content, 0) & 0xFFFFFFFF) != want:
            raise ValueError("zstd content checksum mismatch")
    return pos


_TEXT_CODECS = ("gzip", "zlib", "bz2", "lzma", "snappy", "zstd")


def compress_bytes(data: bytes, codec: str) -> bytes:
    """Deterministically compress one value (gzip mtime=0, fixed
    levels) — same bytes in, same bytes out, forever."""
    import bz2
    import gzip
    import lzma
    import zlib

    if codec == "gzip":
        return gzip.compress(data, 6, mtime=0)
    if codec == "zlib":
        return zlib.compress(data, 6)
    if codec == "bz2":
        return bz2.compress(data, 9)
    if codec == "lzma":
        return lzma.compress(data, preset=6)
    if codec == "snappy":
        return _snappy_frame_compress(data)
    if codec == "zstd":
        # entropy ENCODING is the library-bound half: use the system
        # libzstd via ctypes when present (level 3, content size +
        # checksum); else write the raw-block stored frame — valid
        # zstd either way
        if _libzstd() is not None:
            return _zstd_lib_compress(data)
        return _zstd_stored_compress(data)
    raise ValueError(f"unknown codec {codec!r} (supported: {_TEXT_CODECS})")


def sniff_compression(data: bytes) -> str | None:
    """Identify a compression container from magic bytes."""
    if len(data) >= 2 and data[:2] == b"\x1f\x8b":
        return "gzip"
    if len(data) >= 6 and data[:6] == b"\xfd7zXZ\x00":
        return "lzma"
    if len(data) >= 3 and data[:3] == b"BZh":
        return "bz2"
    if len(data) >= 10 and data[:10] == _SNAPPY_MAGIC:
        return "snappy"
    if len(data) >= 4 and data[:4] == _ZSTD_MAGIC:
        return "zstd"
    if (
        len(data) >= 4
        and (int.from_bytes(data[:4], "little") & 0xFFFFFFF0) == 0x184D2A50
    ):
        return "zstd"  # skippable frame (legal leading frame)
    if (
        len(data) >= 2
        and (data[0] & 0x0F) == 8  # CM=8 (deflate) — any CINFO window
        and (data[0] >> 4) <= 7  # CINFO<=7 per RFC1950 (32 KiB max)
        and (data[0] * 256 + data[1]) % 31 == 0  # FCHECK divisibility
    ):
        # ADVICE r8: CMF 0x08-0x68 streams (smaller deflate windows from
        # other writers) are RFC1950-valid too, not just the common 0x78
        return "zlib"
    return None


def decompress_bytes(data: bytes, codec: str = "auto") -> bytes:
    """Inverse of :func:`compress_bytes`; ``codec='auto'`` sniffs the
    container. Raises ValueError on unknown containers or corrupt
    payloads (callers map this to the NULL-out policy)."""
    import bz2
    import gzip
    import lzma
    import zlib

    kind = sniff_compression(data) if codec == "auto" else codec
    if kind == "zlib" and codec == "auto":
        # the RFC1950 sniff is a weak heuristic (low nibble 8, CINFO
        # <= 7, 1/31 checksum pass), not a magic: arbitrary binary can
        # satisfy it. Attempt the inflate and report an UNKNOWN
        # container on failure instead of committing to 'corrupt
        # zlib' (ADVICE r9); explicit codec='zlib' keeps the precise
        # corrupt-payload error below.
        try:
            return zlib.decompress(data)
        except Exception:  # noqa: BLE001 - sniff false positive
            raise ValueError("unknown compression container") from None
    try:
        if kind == "gzip":
            return gzip.decompress(data)
        if kind == "zlib":
            return zlib.decompress(data)
        if kind == "bz2":
            return bz2.decompress(data)
        if kind == "lzma":
            return lzma.decompress(data)
        if kind == "snappy":
            if data.startswith(_SNAPPY_MAGIC):
                return _snappy_frame_decompress(data)
            return _snappy_raw_decompress(data)
        if kind == "zstd":
            # system libzstd (ctypes) when present — the fast path —
            # else the pure-stdlib RFC 8878 decoder; identical outputs
            # (pinned by the cross-engine tests)
            if _libzstd() is not None:
                return _zstd_lib_decompress(data)
            return _zstd_py_decompress(data)
    except Exception as exc:  # noqa: BLE001 - normalize codec errors
        raise ValueError(f"corrupt {kind} payload") from exc
    raise ValueError("unknown compression container")


def compress_text(text_col, codec: str = "gzip"):
    """Column expression: UTF-8 encode + compress a string column into
    a binary column (vectorized pandas_udf; NULL-safe)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if codec not in _TEXT_CODECS:
        raise ValueError(f"unknown codec {codec!r}")

    @pandas_udf("binary")
    def comp(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else compress_bytes(v.encode("utf-8"), codec)
        )

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return comp(c)


def decompress_text(bin_col, codec: str = "auto", on_unknown: str = "null"):
    """Column expression: decompress a binary column back to a string
    column. Unknown containers / corrupt payloads / invalid UTF-8
    become NULL (the warn-and-skip policy), never garbage.

    ``on_unknown='raw'`` decodes UNSNIFFABLE payloads as plain UTF-8
    instead of nulling them — the mixed-folder contract where
    uncompressed shards sit next to compressed ones. A payload whose
    container IS recognized but fails to decompress still nulls out
    (ADVICE r10: a corrupt .gz must contribute zero rows, never feed
    its raw bytes downstream as if they were text)."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    if on_unknown not in ("null", "raw"):
        raise ValueError(f"unknown on_unknown mode {on_unknown!r}")

    @pandas_udf("string")
    def decomp(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            b = bytes(v)
            try:
                return decompress_bytes(b, codec).decode("utf-8")
            except UnicodeDecodeError:
                return None
            except ValueError as exc:
                # "unknown compression container" covers both the
                # no-magic case and a weak zlib sniff that failed to
                # inflate (decompress_bytes folds the latter into the
                # former); sniffed-but-corrupt raises "corrupt <kind>"
                if on_unknown == "raw" and str(exc).startswith("unknown"):
                    try:
                        return b.decode("utf-8")
                    except UnicodeDecodeError:
                        return None
                return None

        return s.map(one)

    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    return decomp(c)


# ----------------------------------------- container sniffing dispatch
# (r8: with four real codecs in the family, production folders are
# MIXED — route each file by magic bytes instead of forcing one
# decode_fn per scan. Pure container sniffing, no decode attempted.)


def sniff_media_type(content: bytes) -> str | None:
    """Identify a media container from magic bytes: 'bmp', 'png',
    'jpeg', 'gif', 'wav', 'avi', or None for unknown formats.
    Sniffing only reads the header — it never decodes."""
    if len(content) >= 8 and content[:8] == _PNG_SIG:
        return "png"
    if len(content) >= 2 and content[:2] == b"BM":
        return "bmp"
    if len(content) >= 2 and content[:2] == b"\xff\xd8":
        return "jpeg"
    if len(content) >= 6 and content[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"WAVE"
    ):
        return "wav"
    if (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"AVI "
    ):
        return "avi"
    return None


def decode_image_auto(content: bytes) -> tuple[int, int, int, list[float]]:
    """Magic-dispatching image decode hook for
    :func:`extract_image_features`: BMP/PNG/JPEG route to their real
    decoders; GIF decodes frame 0 and palette-maps it to per-channel
    sums. Unknown containers raise into the null-row policy (audio
    and video are not single images — WAV and AVI deliberately raise
    here; route AVI through video_frame_stats instead)."""
    kind = sniff_media_type(content)
    if kind == "bmp":
        return decode_bmp_features(content)
    if kind == "png":
        return decode_png_features(content)
    if kind == "jpeg":
        try:
            return decode_jpeg_features(content)  # grayscale (SOF0/SOF2)
        except ValueError:
            # 3-component baseline: decode to RGB, per-channel sums
            # (the same feature convention as BMP/PNG)
            w, h, rgb = decode_jpeg_rgb(content)
            sums = [0, 0, 0]
            for row in rgb:
                for r, g, b in row:
                    sums[0] += r
                    sums[1] += g
                    sums[2] += b
            return w, h, 3, [float(s) for s in sums]
    if kind == "gif":
        width, height, palette, frames = decode_gif(content)
        sums = [0, 0, 0]
        for row in frames[0][1]:
            for v in row:
                r, g, b = palette[v]
                sums[0] += r
                sums[1] += g
                sums[2] += b
        return width, height, 3, [float(s) for s in sums]
    raise ValueError(f"not an image container: {kind or 'unknown'}")


# ------------------------------------------------- real WAV container
# (r8: the audio path gets a real container parser next to q147's raw
# PCM stand-in — pure stdlib RIFF/WAVE chunk walking with the classic
# traps: unknown chunks between fmt and data, odd-size chunk pad
# bytes. Gated end-to-end by q298. The sample MATH was already real;
# this makes the container real too. Compressed audio codecs stay
# stubbed — genuinely absent libraries.)


def encode_wav16(
    sample_rate: int, samples: list[int], junk: bytes | None = b"x" * 7
) -> bytes:
    """Encode mono signed-16-bit PCM as a standard RIFF/WAVE file. By
    default a 7-byte LIST chunk (odd size -> pad byte required by the
    RIFF spec) is planted BETWEEN fmt and data, so a parser that
    assumes fmt-then-data contiguity or forgets odd-size padding
    breaks — the encoder is the decoder's adversary, as with PNG."""
    import struct

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    data = struct.pack(f"<{len(samples)}h", *samples)
    body = chunk(b"fmt ", fmt)
    if junk is not None:
        body += chunk(b"LIST", junk)
    body += chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


@_corrupt_as_valueerror
def decode_wav16(content: bytes) -> tuple[int, list[int]]:
    """Pure-stdlib parser for mono PCM16 RIFF/WAVE: verifies the
    RIFF/WAVE magic, walks the chunk list honoring odd-size pad
    bytes and skipping unknown chunks, and requires fmt before data.
    Returns (sample_rate, samples as signed ints). Raises ValueError
    on non-WAV or unsupported variants (compressed formats, multi-
    channel, other bit depths stay behind the stub policy)."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (length,) = struct.unpack_from("<I", content, pos + 4)
        payload = content[pos + 8 : pos + 8 + length]
        if len(payload) < length:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            fmt = payload
        elif tag == b"data":
            data = payload
        pos += 8 + length + (length % 2)  # odd chunks carry a pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("short fmt chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt)
    if (audio_fmt, channels, bits) != (1, 1, 16):
        raise ValueError("only mono PCM16 supported")
    if len(data) % 2:
        raise ValueError("odd data length for 16-bit samples")
    return rate, list(struct.unpack(f"<{len(data) // 2}h", data))


def wav_window_energy(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    window: int = 64,
) -> DataFrame:
    """Windowed audio energy over REAL WAV files: parse the RIFF
    container (:func:`decode_wav16`), then per non-overlapping window
    of ``window`` samples emit ``sum(s^2)`` as BIGINT — the real-
    container twin of :func:`pcm_window_energy` (which interprets raw
    bytes). One Arrow-batched 1:N pass, zero shuffles; corrupt files
    yield no rows (warn-and-skip). Returns (id, sample_rate, win,
    n_samples, energy)."""
    import numpy as np

    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, sample_rate int, win bigint,"
        " n_samples bigint, energy bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, rates, wins, ns, es = [], [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                try:
                    rate, samples = decode_wav16(bytes(content))
                except Exception:  # noqa: BLE001 - corrupt input policy
                    continue
                if not samples:
                    continue
                s = np.asarray(samples, dtype=np.int64)
                d = s * s
                starts = np.arange(0, len(s), window)
                e = np.add.reduceat(d, starts)
                sizes = np.minimum(starts + window, len(s)) - starts
                k = len(starts)
                ids.extend([rid] * k)
                rates.extend([rate] * k)
                wins.extend(range(k))
                ns.extend(sizes.tolist())
                es.extend(e.tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "win": pd.Series(wins, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(es, dtype="int64"),
                }
            )

    return binaries.select(id_col, content_col).mapInPandas(
        batches, schema=schema
    )


AHASH_CELLS = 60  # grid cells = hash bits; 60 keeps the signed-int64
# fingerprint compatible with dedup.simhash_band_pairs' 6x10-bit combos

# byte classes for the fake "gray grid": cell i = count of this byte
# in the content. A real decoder yields coarse luminance cells that
# move LITTLE under small image edits; a histogram over content bytes
# has the same smoothness property (an md5-style grid would be
# avalanche — only exact duplicates would ever collide, defeating the
# point of a perceptual hash).
AHASH_CLASSES = (
    "abcdefghijklmnopqrstuvwxyz"  # 26 letters
    "0123456789"                  # 10 digits
    " .,:;!?-_()[]{}'\"/@#%*+="    # 24 punctuation/space classes
)
assert len(AHASH_CLASSES) == AHASH_CELLS


def _fake_gray_grid(content: bytes) -> list[int]:
    """Deterministic stand-in for decode+resize-to-gray-grid: 60 cell
    intensities = per-byte-class counts over the content (ASCII-safe
    under UTF-8: multi-byte sequences never contain ASCII bytes).
    Replace with a real decoder + luma resize in production; the
    hash/banding pipeline downstream is unchanged."""
    return [content.count(c.encode()) for c in AHASH_CLASSES]


def ahash60(
    binaries: DataFrame,
    grid_fn: Callable[[bytes], list[int]] = _fake_gray_grid,
    id_col: str = "path",
    content_col: str = "content",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint — the classic
    pHash-family baseline: decode to a small gray grid, then bit i =
    1 iff cell i is above the grid mean (compared as
    ``cells*n > sum`` to stay integer-exact and engine-portable).
    Visually-near-identical media produce Hamming-close fingerprints;
    feed the output to ``dedup.simhash_band_pairs`` for
    guaranteed-complete near-dup candidates — the same banding scale
    shape as text SimHash, applied to the image modality. Returns
    (id_col, phash long, *carry_cols) — extra columns ride the Arrow
    batch unchanged (e.g. an album/source segment key for scoped
    banding), saving the join-back shuffle."""
    carry = list(carry_cols)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for content in pdf[content_col]:
                cells = grid_fn(bytes(content))
                total = sum(cells)
                n = len(cells)
                h = 0
                for i, c in enumerate(cells):
                    if c * n > total:
                        h |= 1 << i
                hashes.append(h)
            out = pdf[[id_col, *carry]].reset_index(drop=True)
            out["phash"] = pd.Series(hashes, dtype="int64")
            yield out[[id_col, "phash", *carry]]

    id_type = binaries.schema[id_col].dataType.simpleString()
    carry_schema = "".join(
        f", {c} {binaries.schema[c].dataType.simpleString()}" for c in carry
    )
    return binaries.select(id_col, content_col, *carry).mapInPandas(
        batches, schema=f"{id_col} {id_type}, phash long{carry_schema}"
    )


def sample_frames(
    binaries: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame sampling (stub): emits one row per sampled frame
    with a deterministic frame digest. 1:N mapInPandas — the row
    explosion happens executor-side, partition-local."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"path": [], "frame_idx": [], "frame_ts_ms": [], "frame_md5": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                n = min(max_frames, max(1, len(raw) // 64))
                for i in range(n):
                    chunk = raw[i * 64 : (i + 1) * 64] or raw
                    rows["path"].append(path)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(rows)

    return binaries.select("path", "content").mapInPandas(
        batches, schema=FRAME_SAMPLE_SCHEMA
    )


def attach_media_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata columns for an opaque binary column: size and
    content digest (dedup key for exact media dedup)."""
    return df.withColumn("media_md5", F.md5(F.col("content"))).withColumn(
        "media_bytes", F.length(F.col("content"))
    )


def pcm_window_energy(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    window: int = 256,
) -> DataFrame:
    """Windowed audio energy over an opaque binary column, treating
    the payload as unsigned 8-bit PCM samples — the silence-detection
    / loudness-profiling primitive, runnable without any codec: a
    real decoder (librosa/ffmpeg, absent here) would only swap the
    byte interpretation, not the plumbing.

    Per row: non-overlapping windows of ``window`` samples (trailing
    partial window kept with its true size), energy =
    ``sum((s - 128)^2)`` as BIGINT — all-integer, so the DuckDB
    oracle (:func:`pcm_energy_oracle_sql`, hex-sliced byte
    extraction) matches exactly. One Arrow-batched 1:N pass, zero
    shuffles; numpy ``add.reduceat`` keeps the inner loop vectorized.
    """
    import numpy as np

    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, win bigint, n_samples bigint, energy bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, wins, ns, es = [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                # null ids drop WITH their row (same Arrow hazard as
                # winnow_fingerprints: nullable int64 ids arrive as
                # float64+NaN and cannot convert back to bigint)
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                if content is None or len(content) == 0:
                    continue
                s = np.frombuffer(bytes(content), dtype=np.uint8).astype(
                    np.int64
                )
                d = (s - 128) ** 2
                starts = np.arange(0, len(s), window)
                e = np.add.reduceat(d, starts)
                sizes = np.minimum(starts + window, len(s)) - starts
                k = len(starts)
                ids.extend([rid] * k)
                wins.extend(range(k))
                ns.extend(sizes.tolist())
                es.extend(e.tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "win": pd.Series(wins, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(es, dtype="int64"),
                }
            )

    from ..util import spread

    return spread(binaries.select(id_col, content_col)).mapInPandas(
        batches, schema=schema
    )


def pcm_energy_oracle_sql(
    table: str = "documents",
    id_: str = "doc_id",
    payload_sql: str = "encode(text)",
    window: int = 256,
) -> str:
    """DuckDB mirror of :func:`pcm_window_energy`: bytes recovered by
    slicing ``hex(payload)`` two chars at a time (DuckDB has no
    direct blob indexing), then the same integer window aggregate."""
    return f"""
    WITH b AS (
        SELECT {id_} AS doc_id, hex({payload_sql}) AS h,
               octet_length({payload_sql}) AS n
        FROM {table} WHERE octet_length({payload_sql}) > 0),
    samp AS (
        SELECT doc_id, (i - 1) // {window} AS win,
               CAST(concat('0x', substr(h, 2 * i - 1, 2)) AS BIGINT) AS v
        FROM b, unnest(range(1, n + 1)) AS t(i))
    SELECT doc_id, CAST(win AS BIGINT) AS win,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM((v - 128) * (v - 128)) AS BIGINT) AS energy
    FROM samp GROUP BY 1, 2
    """


@_corrupt_as_valueerror
def _bmp_gray_np(content: bytes):
    """Vectorized 24-bit-BMP -> integer gray plane, the exact
    ``(r+g+b)//3`` semantics of :func:`decode_bmp24` (equality pinned
    by tests) without building 3*w*h Python tuples — the
    :func:`image_ahash` hot path (q309: one frombuffer/reshape per
    image instead of per-pixel list work). Rejects exactly the
    variants the scalar decoder rejects."""
    import struct

    import numpy as np

    if len(content) < _BMP_HEADER + _BMP_INFO or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < _BMP_INFO:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    if width <= 0 or height == 0:
        raise ValueError("bad dimensions")
    bottom_up = height > 0
    height = abs(height)
    row_size = (3 * width + 3) // 4 * 4
    if len(content) < offset + row_size * height:
        raise ValueError("truncated pixel array")
    arr = np.frombuffer(
        content, dtype=np.uint8, count=row_size * height, offset=offset
    ).reshape(height, row_size)[:, : 3 * width]
    px = arr.reshape(height, width, 3).astype(np.int64)
    if bottom_up:
        px = px[::-1]
    return width, height, px.sum(axis=2) // 3


def image_ahash(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    rows: int = 6,
    cols: int = 10,
) -> DataFrame:
    """REAL-pixel perceptual average-hash over decoded images (r9: the
    fake byte-class grid in :func:`ahash60` finally has a real-decode
    twin, now that BMP/PNG/JPEG decoders exist): magic-route each
    binary to its decoder (BMP/PNG -> RGB -> integer gray (r+g+b)//3,
    JPEG -> grayscale or color path), box-partition the gray plane
    into ``rows x cols`` cells (boundaries floor(y*rows/h) — exact for
    any dims), and set bit (i*cols + j) iff the cell MEAN exceeds the
    global mean, compared entirely in cross-multiplied integers
    (cell_sum * total_px > total_sum * cell_px — no float thresholds,
    so both engines agree bit-for-bit). The default 6x10 grid emits a
    60-bit fingerprint directly compatible with
    dedup.simhash_band_pairs' Manku combination banding, which is how
    perceptual near-dup pairs stay a bucket join at 100 TB, never
    all-pairs. One Arrow-batched pass, zero shuffles; corrupt or
    non-image files yield no rows (warn-and-skip)."""
    import numpy as np

    if rows * cols > 62:
        raise ValueError("fingerprint must fit a signed 64-bit integer")
    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, phash bigint, width int, height int"

    def gray_of(content: bytes):
        kind = sniff_media_type(content)
        if kind == "bmp":
            # vectorized hot path: same exact integers as decode_bmp24
            # (equality pinned by tests), ~5x on q309's 80x48 corpus
            return _bmp_gray_np(content)
        if kind == "png":
            # general decoder: palette/gray/alpha/sub-byte/Adam7
            # fingerprints too, not just 8-bit truecolor (r10)
            w, h, px = decode_png(content)
            g = np.asarray(px, dtype=np.int64)
            return w, h, g.sum(axis=2) // 3
        if kind == "jpeg":
            try:
                w, h, g = decode_jpeg_gray(content)
                return w, h, np.asarray(g, dtype=np.int64)
            except ValueError:
                w, h, rgb = decode_jpeg_rgb(content)
                g = np.asarray(rgb, dtype=np.int64)
                return w, h, g.sum(axis=2) // 3
        raise ValueError(f"not a supported image container: {kind!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hashes, ws, hs = [], [], [], []
            for rid, content in zip(pdf[id_col], pdf[content_col]):
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                try:
                    w, h, gray = gray_of(bytes(content))
                except Exception:  # noqa: BLE001 - corrupt input policy
                    continue
                ri = (np.arange(h, dtype=np.int64) * rows) // h
                ci = (np.arange(w, dtype=np.int64) * cols) // w
                idx = (ri[:, None] * cols + ci[None, :]).ravel()
                cell_sum = np.bincount(
                    idx, weights=gray.ravel().astype(np.float64),
                    minlength=rows * cols,
                ).astype(np.int64)
                cell_px = np.bincount(idx, minlength=rows * cols)
                total_sum = int(cell_sum.sum())
                total_px = w * h
                phash = 0
                for k in range(rows * cols):
                    # cross-multiplied integer mean comparison (exact;
                    # python ints, no int64 overflow at any image size)
                    if int(cell_sum[k]) * total_px > total_sum * int(
                        cell_px[k]
                    ):
                        phash |= 1 << k
                ids.append(rid)
                hashes.append(phash)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "phash": pd.Series(hashes, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return binaries.select(id_col, content_col).mapInPandas(
        batches, schema=schema
    )


def ahash60_phash_sql(text_expr: str = "text") -> str:
    """DuckDB expression mirroring :func:`ahash60` over the fake
    gray grid (per-byte-class counts of ``text_expr``): cell i =
    occurrence count of AHASH_CLASSES[i], bit i = cell*60 > total —
    the same all-integer rule, so the fingerprint is bit-identical.
    (A real decoder would make this oracle impossible; the fake grid
    is exactly what keeps the banding pipeline gateable.)"""
    cnts = [
        f"(length({text_expr}) - length(replace({text_expr}, "
        f"'{c.replace(chr(39), chr(39) * 2)}', '')))"
        for c in AHASH_CLASSES
    ]
    total = " + ".join(f"c{i}" for i in range(len(cnts)))
    cells = ", ".join(f"{e} AS c{i}" for i, e in enumerate(cnts))
    bits = " + ".join(
        f"CASE WHEN c{i} * {len(cnts)} > tot THEN CAST({1 << i} AS BIGINT) "
        f"ELSE 0 END"
        for i in range(len(cnts))
    )
    return f"""(
        SELECT {bits} FROM (
            SELECT *, {total} AS tot FROM (SELECT {cells})))"""


# ----------------------------------------------- real AVI video container
# (r9: the VIDEO path gets a real container. MJPEG-in-AVI is the one
# video format expressible with zero external libraries: the container
# is RIFF (same chunk grammar as WAV, plus nested LISTs and an idx1
# index), and each frame payload is a baseline JPEG — which
# decode_jpeg_gray already parses for real. Gated end-to-end by q306
# on the constant-block exactness class. Inter-frame-predicted codecs
# (H.264/VP9/AV1...) genuinely need ffmpeg and stay behind the
# documented deployment-dependency policy — see PARITY.md; they plug
# into the same decode hook.)


def encode_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: list[bytes],
    ms_per_frame: int = 33,
    junk: bytes | None = b"j" * 5,
) -> bytes:
    """Encode JPEG frame payloads as a standard MJPEG AVI: RIFF/'AVI '
    with a LIST hdrl (avih + LIST strl with 'vids'/'MJPG' strh and a
    BITMAPINFOHEADER strf), a LIST movi of '00dc' chunks, and an idx1
    index. The encoder is the decoder's adversary, as with WAV/PNG: a
    JUNK chunk (odd-sized by default, so the RIFF pad-byte rule is
    exercised) is planted between hdrl and movi, and odd-length JPEG
    payloads get pad bytes a naive offset walker will misread."""
    import struct

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    nf = len(jpeg_frames)
    rate = 1000  # frames per `scale` units: scale=ms_per_frame, rate=1000
    avih = struct.pack(
        "<IIIIIIIIII4I",
        ms_per_frame * 1000,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        nf,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        ms_per_frame,  # dwScale
        rate,  # dwRate: rate/scale = fps*1000/1000
        0,  # dwStart
        nf,  # dwLength (frames)
        0,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (default)
        0,  # dwSampleSize (0 = variable, one frame per chunk)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_payload = b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = lst(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the movi LIST payload
    # (the conventional form: offset of the ckid from the 'movi' tag)
    idx_entries, off = [], 4
    for f in jpeg_frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = hdrl
    if junk is not None:
        body += chunk(b"JUNK", junk)
    body += movi + idx1
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


@_corrupt_as_valueerror
def decode_avi_mjpeg(content: bytes) -> tuple[int, int, int, list[bytes]]:
    """Pure-stdlib parser for MJPEG AVI: verifies the RIFF/'AVI '
    magic, walks the top-level chunk list honoring odd-size pad bytes
    and skipping JUNK/unknown chunks, parses avih inside LIST hdrl
    for dimensions and frame timing, and collects the '00dc'/'00db'
    frame payloads inside LIST movi in stream order (rec-grouped
    movi lists are flattened). Returns (width, height, us_per_frame,
    [jpeg_bytes, ...]) — frame timing stays in MICROSECONDS (the
    container's dwMicroSecPerFrame unit): dividing to ms here would
    floor 33333 us (30 fps) to 33 ms and drift timestamps ~1%
    cumulatively (ADVICE r9); callers derive ms per frame INDEX as
    fi * us_per_frame // 1000. Raises ValueError on non-AVI, truncated, or
    non-MJPEG streams (other fourccs stay behind the documented
    ffmpeg deployment-dependency policy)."""
    import struct

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    def walk(data: bytes, pos: int, end: int):
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (length,) = struct.unpack_from("<I", data, pos + 4)
            payload_end = pos + 8 + length
            if payload_end > end:
                raise ValueError("truncated chunk")
            yield tag, pos + 8, payload_end
            pos = payload_end + (length % 2)

    width = height = us_per_frame = None
    # multi-stream AVIs (video + audio, or several video streams):
    # stream index = strl order; frame chunks are tagged "NNdc"/"NNdb"
    # with NN the two-digit stream number. Collect per stream and keep
    # only the FIRST 'vids' stream's frames, validating ITS fourcc —
    # merging all streams would interleave foreign codec chunks into
    # the frame numbering (r9 review finding).
    stream_idx = 0
    video_stream: tuple[int, bytes] | None = None
    by_stream: dict[bytes, list[bytes]] = {}

    def scan_movi(pos: int, end: int) -> None:
        for tag, p0, p1 in walk(content, pos, end):
            if tag == b"LIST" and content[p0 : p0 + 4] == b"rec ":
                scan_movi(p0 + 4, p1)
            elif tag[2:4] in (b"dc", b"db"):
                by_stream.setdefault(tag[:2], []).append(content[p0:p1])

    for tag, p0, p1 in walk(content, 12, len(content)):
        if tag != b"LIST":
            continue
        kind = content[p0 : p0 + 4]
        if kind == b"hdrl":
            for t2, q0, q1 in walk(content, p0 + 4, p1):
                if t2 == b"avih":
                    if q1 - q0 < 40:
                        raise ValueError("short avih chunk")
                    vals = struct.unpack_from("<10I", content, q0)
                    us_per_frame = vals[0]
                    width, height = vals[8], vals[9]
                elif t2 == b"LIST" and content[q0 : q0 + 4] == b"strl":
                    for t3, r0, r1 in walk(content, q0 + 4, q1):
                        if t3 == b"strh" and r1 - r0 >= 8:
                            fcc_type = content[r0 : r0 + 4]
                            if (
                                fcc_type == b"vids"
                                and video_stream is None
                            ):
                                video_stream = (
                                    stream_idx,
                                    content[r0 + 4 : r0 + 8],
                                )
                    stream_idx += 1
        elif kind == b"movi":
            scan_movi(p0 + 4, p1)
    if width is None or us_per_frame is None:
        raise ValueError("missing avih header")
    if video_stream is not None:
        idx, handler = video_stream
        if handler not in (b"MJPG", b"mjpg", b"\x00" * 4):
            raise ValueError(
                f"unsupported video fourcc {handler!r}: only MJPEG "
                "decodes in-repo; modern codecs need ffmpeg "
                "(deployment dependency)"
            )
        frames = by_stream.get(b"%02d" % idx, [])
    else:
        # header-less minimal files: stream 00 by convention
        frames = by_stream.get(b"00", [])
    return width, height, us_per_frame, frames


def video_frame_stats(
    binaries: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    every_k: int | str = 1,
) -> DataFrame:
    """REAL video decode + frame sampling: parse the AVI container
    (:func:`decode_avi_mjpeg`), keep every ``every_k``-th frame,
    decode each sampled frame's baseline JPEG payload
    (:func:`decode_jpeg_gray`), and emit exact per-frame stats —
    millisecond timestamp from the container frame timing, pixel
    count, gray-level sum. The real-decode video twin of
    :func:`gif_frame_stats`: same 1:N Arrow-batched executor-side
    explosion, zero shuffles, corrupt files yield no rows
    (warn-and-skip). Frames the sampler skips are never
    entropy-decoded — at 100 TB a 1-in-k frame sample pays 1/k of the
    JPEG decode cost, because MJPEG has no inter-frame prediction.

    ``every_k`` is either a constant stride or the NAME of an int
    column in ``binaries`` giving a per-row stride (adaptive
    sampling: e.g. stride proportional to clip length or inversely to
    source quality) — the skip happens before decode either way."""
    import numpy as np

    per_row = isinstance(every_k, str)
    if not per_row and every_k < 1:
        raise ValueError(f"every_k must be >= 1, got {every_k}")
    id_type = binaries.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, frame_idx int, frame_ts_ms bigint,"
        " n_px bigint, sum_gray bigint"
    )
    in_cols = [id_col, content_col] + ([every_k] if per_row else [])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fis, tss, ns, sgs = [], [], [], [], []
            ks = pdf[every_k] if per_row else None
            for i, (rid, content) in enumerate(
                zip(pdf[id_col], pdf[content_col])
            ):
                if rid is None or (
                    isinstance(rid, float) and pd.isna(rid)
                ):
                    continue
                if per_row:
                    kv = ks.iloc[i]
                    if kv is None or pd.isna(kv):
                        continue  # NULL stride: warn-and-skip row
                    k = int(kv)
                else:
                    k = every_k
                if k < 1:
                    continue  # per-row bad stride: warn-and-skip row
                try:
                    _w, _h, uspf, frames = decode_avi_mjpeg(bytes(content))
                except Exception:  # noqa: BLE001 - corrupt input policy
                    continue
                for fi, payload in enumerate(frames):
                    if fi % k:
                        continue
                    try:
                        fw, fh, rows = decode_jpeg_gray(payload)
                    except Exception:  # noqa: BLE001 - corrupt frame
                        continue
                    px = np.asarray(rows, dtype=np.int64)
                    ids.append(rid)
                    fis.append(fi)
                    # µs-domain product floored ONCE per timestamp:
                    # per-frame ms rounding would drift cumulatively
                    tss.append(fi * uspf // 1000)
                    ns.append(fw * fh)
                    sgs.append(int(px.sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.Series(fis, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "n_px": pd.Series(ns, dtype="int64"),
                    "sum_gray": pd.Series(sgs, dtype="int64"),
                }
            )

    return binaries.select(*in_cols).mapInPandas(
        batches, schema=schema
    )
