"""Multimodal (image/audio/video) column plumbing (north star; BASELINE.json).

Media assets are opaque ``binary`` columns + typed metadata structs; all
heavy per-asset work runs as Arrow-batched ``mapInPandas`` so bytes never
round-trip through the driver and never become Python objects row-by-row.

The decode kernels themselves are STUBBED — this container ships no
image/audio codecs — behind :data:`DECODERS`. ``deterministic_fake``
produces a stable feature vector from the md5 of the bytes (so tests can
assert end-to-end plumbing: schema, batching, partitioning, join-back),
and ``strict`` raises NotImplementedError at the point a real codec
(Pillow/torchaudio/ffmpeg) would be called on a cluster image.

Scale notes: assets are large blobs — partition by size not count
(``maxPartitionBytes``), keep metadata in a separate narrow table joined
by asset_id so planning/filtering never touches bytes, and push filters
(mime/type/size) onto the metadata table before the decode stage runs.
"""

from __future__ import annotations

import hashlib
import math
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(data: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-dim pseudo-feature vector from
    md5("{i}:" + hex(bytes)).

    Stands in for a real decode→embed kernel; stable across runs/engines so
    the distributed plumbing is testable without codecs. Hashing the HEX
    encoding of the payload (rather than the raw bytes) is deliberate:
    SQL engines' md5() typically takes strings, so the kernel output is
    reproducible as ``md5(i || ':' || lower(hex(media)))`` — which lets the
    driver hash-compare the whole mapInPandas pipeline against a DuckDB
    oracle instead of a weaker rows-only check.
    """
    hx = data.hex().encode()
    out = []
    for i in range(FEATURE_DIM):
        h = hashlib.md5(f"{i}:".encode() + hx).digest()
        out.append(int.from_bytes(h[:4], "big") / 2**32 - 0.5)
    return out


def _pixel_features(w: int, h: int, pixels: list[tuple[int, int, int]]) -> list[float]:
    """FEATURE_DIM-dim feature vector from decoded RGB pixels (row-major).

    All statistics accumulate in exact integers before one final float
    division, so the vector is bit-deterministic across platforms:
    [w, h, mean_rgb×3, first_pixel×3, last_pixel×3, min/max/mean gray,
    var_gray, n_pixels] — first/last pixel exposure is what lets tests
    value-check the decode against the raw image bytes.
    """
    if w <= 0 or h <= 0:
        # w=0 / h=0 headers are syntactically valid PPM/BMP; fail with the
        # loud ValueError the strict decoder promises, not ZeroDivisionError
        raise ValueError(f"zero-pixel image: {w}x{h}")
    n = len(pixels)
    sr = sum(p[0] for p in pixels)
    sg = sum(p[1] for p in pixels)
    sb = sum(p[2] for p in pixels)
    grays = [p[0] + p[1] + p[2] for p in pixels]  # 0..765 ints
    sgray = sum(grays)
    s2gray = sum(g * g for g in grays)
    var = (s2gray / n) - (sgray / n) ** 2
    return [
        float(w),
        float(h),
        sr / n / 255.0,
        sg / n / 255.0,
        sb / n / 255.0,
        pixels[0][0] / 255.0,
        pixels[0][1] / 255.0,
        pixels[0][2] / 255.0,
        pixels[-1][0] / 255.0,
        pixels[-1][1] / 255.0,
        pixels[-1][2] / 255.0,
        min(grays) / 765.0,
        max(grays) / 765.0,
        sgray / n / 765.0,
        var / (765.0 * 765.0),
        float(n),
    ]


def _ppm_pixels(data: bytes) -> tuple[int, int, list[tuple[int, int, int]]]:
    """REAL image decode: binary PPM (P6, maxval 255) — the one raster
    format parseable with zero codec dependencies. Header tokens may be
    separated by any whitespace/comments per the netpbm spec. Returns
    (w, h, row-major RGB pixels) for feature or resize consumers."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval (comments start '#')
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} != 255 unsupported")
    raster = data[i : i + 3 * w * h]
    if len(raster) != 3 * w * h:
        raise ValueError("truncated PPM raster")
    pixels = [
        (raster[3 * p], raster[3 * p + 1], raster[3 * p + 2])
        for p in range(w * h)
    ]
    return w, h, pixels


def _ppm_features(data: bytes) -> list[float]:
    w, h, pixels = _ppm_pixels(data)
    return _pixel_features(w, h, pixels)


def _resize_nearest(
    w: int,
    h: int,
    pixels: list[tuple[int, int, int]],
    max_dim: int,
) -> tuple[int, int, list[tuple[int, int, int]]]:
    """Aspect-fit nearest-neighbor resize — the EXECUTED half of the
    resize_targets plan, with the identical target-dimension arithmetic
    (half-up via floor(x+0.5), floor-to-1) so plan and execution can
    never disagree. Source index mapping is pure integer floor
    ((x·w)//tw), deterministic and SQL-replayable."""
    scale = min(1.0, max_dim / max(w, h))
    tw = max(int(math.floor(w * scale + 0.5)), 1)
    th = max(int(math.floor(h * scale + 0.5)), 1)
    if (tw, th) == (w, h):
        return w, h, pixels
    out = [
        pixels[((y * h) // th) * w + ((x * w) // tw)]
        for y in range(th)
        for x in range(tw)
    ]
    return tw, th, out


def _bmp_features(data: bytes) -> list[float]:
    """REAL image decode: uncompressed 24-bit BI_RGB BMP (the Windows
    default). Rows are stored bottom-up, BGR, padded to 4 bytes — decoded
    here to the same row-major RGB pixel list as the PPM path, so the
    same image in either container yields the identical feature vector
    (asserted in tests)."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    compression = int.from_bytes(data[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    pixels = []
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = off + src_row * stride
        for x in range(w):
            b, g, r = data[base + 3 * x : base + 3 * x + 3]
            pixels.append((r, g, b))
    return _pixel_features(w, h, pixels)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6): pick the neighbor (left a,
    up b, upper-left c) closest to a+b-c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_features(data: bytes) -> list[float]:
    """REAL image decode: 8-bit grayscale/truecolor/palette (color
    types 0/2/3/6) non-interlaced PNG — the first COMPRESSED real-world
    format in the strict trio's lineage, decodable with zero new
    dependencies because PNG's only compression is DEFLATE (stdlib
    ``zlib``) plus five per-scanline byte filters (None/Sub/Up/Average/
    Paeth, RFC 2083) unfiltered here by hand. Alpha is dropped (not
    composited) for RGBA so the same pixels in PNG, PPM, or BMP yield
    the identical feature vector (asserted in tests); palette pixels
    resolve through PLTE, gray expands to (g, g, g). 16-bit and
    Adam7-interlaced PNGs still raise — honest unsupported-codec
    boundaries, same policy as BMP's bpp gate."""
    if not data.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat, plte = 8, None, bytearray(), None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln  # length + type + body + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, compression, filter_method, interlace = ihdr[8:13]
    if bit_depth != 8 or color_type not in (0, 2, 3, 6):
        raise NotImplementedError(
            f"only 8-bit gray/truecolor/palette PNG supported "
            f"(bit_depth={bit_depth}, color_type={color_type}); "
            "16-bit and gray+alpha need a real codec library"
        )
    if color_type == 3:
        if plte is None or len(plte) == 0 or len(plte) % 3 != 0:
            raise ValueError("palette PNG missing/malformed PLTE chunk")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG unsupported")
    if compression != 0 or filter_method != 0:
        raise ValueError(
            f"invalid PNG compression/filter method "
            f"({compression}/{filter_method})"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"zero-pixel image: {w}x{h}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG IDAT stream: {exc}") from exc
    ch = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG raster")
    pixels: list[tuple[int, int, int]] = []
    prior = bytes(stride)
    for row in range(h):
        base = row * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ft == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prior[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(a, prior[x], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        for p in range(w):
            if color_type == 0:
                g = line[p]
                pixels.append((g, g, g))
            elif color_type == 3:
                idx = line[p]
                if idx * 3 + 2 >= len(plte):
                    raise ValueError(
                        f"palette index {idx} out of range "
                        f"({len(plte) // 3} PLTE entries)"
                    )
                pixels.append(
                    (plte[idx * 3], plte[idx * 3 + 1], plte[idx * 3 + 2])
                )
            else:
                pixels.append(
                    (line[p * ch], line[p * ch + 1], line[p * ch + 2])
                )
        prior = bytes(line)
    return _pixel_features(w, h, pixels)


def _wav_parse(data: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WAVE walk shared by the whole-clip feature kernel and the
    decimation kernel: returns (channels, rate, interleaved int16
    samples). fmt must precede data per spec; unknown chunks skipped."""
    if not (data[:4] == b"RIFF" and data[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
            break  # fmt precedes data per spec; nothing else needed
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (format={audio_format}, "
            f"bits={bits}); compressed audio needs real codec libraries"
        )
    if channels <= 0 or rate <= 0:
        raise ValueError(f"invalid WAV header: channels={channels} rate={rate}")
    n = len(raw) // 2
    if n == 0:
        raise ValueError("zero-sample audio")
    samples = [
        int.from_bytes(raw[2 * i : 2 * i + 2], "little", signed=True)
        for i in range(n)
    ]
    return channels, rate, samples


def _wav_features(data: bytes) -> list[float]:
    """REAL audio decode: 16-bit PCM RIFF/WAVE — like PPM/BMP, the one
    audio container parseable with zero codec dependencies. Walks the
    RIFF chunk list (fmt must precede data per spec; unknown chunks are
    skipped), reads interleaved little-endian int16 samples, and returns
    a FEATURE_DIM vector of waveform statistics. All accumulation is in
    exact integers before the final float divisions, so the vector is
    bit-deterministic across platforms:

    [channels, sample_rate, n_frames, duration_ms, min, max, mean, rms,
     zero_crossing_rate, first_sample, last_sample, abs_mean, clip_frac,
     n_samples, energy_db_proxy, 1.0 (audio marker)]

    (amplitudes normalized by 2^15; rms uses sqrt of an exact integer
    ratio, cross-platform exact like the gray-variance in the image path).
    """
    channels, rate, samples = _wav_parse(data)
    n = len(samples)
    frames = n // channels
    s = sum(samples)
    s2 = sum(x * x for x in samples)
    sabs = sum(abs(x) for x in samples)
    zc = sum(
        1
        for i in range(1, n)
        if (samples[i - 1] >= 0) != (samples[i] >= 0)
    )
    clip = sum(1 for x in samples if abs(x) >= 32767)
    full = 32768.0
    return [
        float(channels),
        float(rate),
        float(frames),
        frames * 1000.0 / rate,
        min(samples) / full,
        max(samples) / full,
        s / n / full,
        (s2 / n) ** 0.5 / full,
        zc / (n - 1) if n > 1 else 0.0,
        samples[0] / full,
        samples[-1] / full,
        sabs / n / full,
        clip / n,
        float(n),
        s2 / n / (full * full),
        1.0,
    ]


def _decode_dib_frame(raw: bytes, w: int, h: int) -> list[int]:
    """Decode one uncompressed 24-bit DIB frame (bottom-up, BGR, rows
    padded to 4 bytes — the BMP raster layout without the BMP header) to
    a row-major list of gray values (r+g+b, ints 0..765)."""
    stride = (3 * w + 3) // 4 * 4
    if len(raw) < stride * h:
        raise ValueError("truncated DIB frame")
    grays = []
    for row in range(h):
        base = (h - 1 - row) * stride
        for x in range(w):
            b, g, r = raw[base + 3 * x : base + 3 * x + 3]
            grays.append(r + g + b)
    return grays


def _avi_features(data: bytes) -> list[float]:
    """REAL video decode: uncompressed 24-bit DIB frames in an AVI (RIFF)
    container — completing the zero-codec-dependency trio (PPM/BMP image,
    PCM WAV audio, DIB AVI video). Walks the RIFF tree (hdrl → avih main
    header, strl → strf BITMAPINFOHEADER; movi → ``..db`` frame chunks),
    decodes every frame with the same bottom-up/BGR/padded-stride raster
    logic as the BMP path, and returns a FEATURE_DIM vector of spatial +
    temporal statistics. All accumulation is in exact integers before the
    final float divisions, so the vector is bit-deterministic:

    [w, h, n_frames, fps, duration_ms, mean_gray, first_frame_mean,
     last_frame_mean, motion (mean abs frame-to-frame gray delta),
     min_gray, max_gray, first_pixel_gray (frame 0),
     last_pixel_gray (last frame), var_gray, n_pixels_total,
     2.0 (video marker)]

    (grays normalized by 765 = 3*255, like the image path).
    """
    w, h, usec_per_frame, per_frame = _avi_parse(data)
    npx = w * h
    nf = len(per_frame)
    total = nf * npx
    sgray = sum(g for fr in per_frame for g in fr)
    s2gray = sum(g * g for fr in per_frame for g in fr)
    motion = sum(
        abs(b - a)
        for f1, f2 in zip(per_frame, per_frame[1:])
        for a, b in zip(f1, f2)
    )
    var = (s2gray / total) - (sgray / total) ** 2
    full = 765.0
    return [
        float(w),
        float(h),
        float(nf),
        1_000_000.0 / usec_per_frame,
        nf * usec_per_frame / 1000.0,
        sgray / total / full,
        sum(per_frame[0]) / npx / full,
        sum(per_frame[-1]) / npx / full,
        motion / (npx * (nf - 1)) / full if nf > 1 else 0.0,
        min(min(fr) for fr in per_frame) / full,
        max(max(fr) for fr in per_frame) / full,
        per_frame[0][0] / full,
        per_frame[-1][-1] / full,
        var / (full * full),
        float(total),
        2.0,
    ]


def _avi_parse(
    data: bytes,
) -> tuple[int, int, int, list[list[int]]]:
    """RIFF/AVI container walk shared by the whole-clip feature kernel
    and the frame-sampling kernel: returns (w, h, usec_per_frame,
    per-frame gray lists)."""
    if not (data[:4] == b"RIFF" and data[8:12] == b"AVI "):
        raise ValueError("not a RIFF/AVI payload")

    def chunks(buf: bytes):
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            sz = int.from_bytes(buf[pos + 4 : pos + 8], "little")
            yield cid, buf[pos + 8 : pos + 8 + sz]
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned

    avih = strf = None
    frames: list[bytes] = []
    for cid, body in chunks(data[12:]):
        if cid != b"LIST":
            continue
        kind, inner = body[:4], body[4:]
        if kind == b"hdrl":
            for cid2, b2 in chunks(inner):
                if cid2 == b"avih":
                    avih = b2
                elif cid2 == b"LIST" and b2[:4] == b"strl":
                    for cid3, b3 in chunks(b2[4:]):
                        if cid3 == b"strf" and strf is None:
                            strf = b3
        elif kind == b"movi":
            for cid2, b2 in chunks(inner):
                # '00db'/'01db'… = uncompressed DIB frame for stream NN
                if cid2[2:4] == b"db":
                    frames.append(b2)
    if avih is None or strf is None:
        raise ValueError("AVI missing avih/strf header")
    usec_per_frame = int.from_bytes(avih[0:4], "little")
    w = int.from_bytes(avih[32:36], "little")
    h = int.from_bytes(avih[36:40], "little")
    bpp = int.from_bytes(strf[14:16], "little")
    compression = int.from_bytes(strf[16:20], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit DIB AVI supported (bpp={bpp}, "
            f"compression={compression}); codec'd video needs ffmpeg"
        )
    if w <= 0 or h <= 0:
        raise ValueError(f"zero-pixel video: {w}x{h}")
    if not frames or usec_per_frame <= 0:
        raise ValueError("AVI with no frames or invalid frame rate")

    per_frame = [_decode_dib_frame(raw, w, h) for raw in frames]
    return w, h, usec_per_frame, per_frame


def _gif_lzw_decode(
    stream: bytes, min_code_size: int, max_pixels: int
) -> list[int]:
    """GIF-variant LZW decode (GIF89a spec appendix F): variable code
    width from min_code_size+1 to 12 bits, LSB-first bit packing, clear
    and end-of-information codes, the KwKwK self-referencing case, and
    the GIF 'early change' width bump (width grows when the NEXT free
    code would no longer fit)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[tuple[int, ...] | None] = [
        (i,) for i in range(clear)
    ] + [None, None]
    acc = nbits = pos = 0
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    while True:
        while nbits < width:
            if pos >= len(stream):
                raise ValueError("truncated GIF LZW stream")
            acc |= stream[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [(i,) for i in range(clear)] + [None, None]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream must open with a literal")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)  # KwKwK
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        # GIF early change, decoder side: the decoder's dictionary lags
        # one code behind the encoder's (its append for the encoder's
        # t-th add happens while reading code t+1), so it must widen at
        # 2^width - 1 where the encoder widens at 2^width.
        if (
            prev is not None
            and len(table) == (1 << width) - 1
            and width < 12
        ):
            width += 1
        assert entry is not None
        out.extend(entry)
        prev = entry
        if len(out) >= max_pixels:
            return out
    return out


def _gif_features(data: bytes) -> list[float]:
    """REAL image decode: GIF87a/89a — the second COMPRESSED real-world
    format in the strict kernel, and unlike PNG its decompressor (GIF
    LZW) has no stdlib shortcut, so it is implemented here by hand:
    sub-block reassembly → variable-width LSB-first LZW → palette
    lookup → the shared :func:`_pixel_features` statistics. Extensions
    (graphic control, comment, application) are skipped; local color
    tables override the global one; the FIRST image frame is decoded
    (standard still-image semantics for animated files). Interlaced
    images raise NotImplementedError — the honest unsupported boundary,
    same policy as PNG's Adam7 gate."""
    if not (data.startswith(b"GIF87a") or data.startswith(b"GIF89a")):
        raise ValueError("not a GIF payload")
    pos = 13
    gct = None
    packed = data[10]
    if packed & 0x80:
        size = 2 ** ((packed & 0x07) + 1)
        gct = [
            (data[pos + 3 * k], data[pos + 3 * k + 1], data[pos + 3 * k + 2])
            for k in range(size)
        ]
        pos += 3 * size
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label byte + data sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            w = int.from_bytes(data[pos + 5 : pos + 7], "little")
            h = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x40:
                raise NotImplementedError(
                    "interlaced GIF unsupported (needs a real codec "
                    "library's row-reorder path)"
                )
            palette = gct
            if ipacked & 0x80:
                size = 2 ** ((ipacked & 0x07) + 1)
                palette = [
                    (
                        data[pos + 3 * k],
                        data[pos + 3 * k + 1],
                        data[pos + 3 * k + 2],
                    )
                    for k in range(size)
                ]
                pos += 3 * size
            if palette is None:
                raise ValueError("GIF image with no color table")
            if w <= 0 or h <= 0:
                raise ValueError(f"zero-pixel image: {w}x{h}")
            min_code_size = data[pos]
            pos += 1
            stream = bytearray()
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF image data")
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                stream += data[pos : pos + ln]
                pos += ln
            indices = _gif_lzw_decode(bytes(stream), min_code_size, w * h)
            if len(indices) < w * h:
                raise ValueError("truncated GIF raster")
            if max(indices[: w * h]) >= len(palette):
                raise ValueError("GIF pixel index outside color table")
            pixels = [palette[i] for i in indices[: w * h]]
            return _pixel_features(w, h, pixels)
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


# JPEG zigzag order (ITU-T T.81 Figure 5): zigzag index -> (row, col).
_JPEG_ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded JPEG scan data with
    0xFF00 byte unstuffing; raises on marker bytes inside the scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan data")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG scan data")
                m = self.data[self.pos]
                self.pos += 1
                if m != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xff{m:02x} inside JPEG scan"
                    )
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume a restart boundary (T.81 E.2.4): discard padding bits
        to the byte boundary, then expect an RST0-7 marker. The marker
        index is accepted leniently (not checked for modulo-8 cycling)."""
        self.nbits = 0
        if self.pos + 2 > len(self.data):
            raise ValueError("truncated JPEG scan data")
        if self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _jpeg_build_huffman(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol canonical Huffman map from a DHT
    segment's BITS/HUFFVAL lists (T.81 Annex C code assignment)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_read_huffman(reader: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DC/AC magnitude decode (T.81 F.12): t-bit value v to signed."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _jpeg_idct_block(coef: list[list[float]]) -> list[list[float]]:
    """Naive exact 8x8 inverse DCT (T.81 A.3.3) in float64."""
    import math

    out = [[0.0] * 8 for _ in range(8)]
    c = [1.0 / math.sqrt(2.0)] + [1.0] * 7
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c[u] * c[v] * coef[u][v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y][x] = s / 4.0
    return out


def _jpeg_render_block(zz: list[int], quant: list[int]) -> list[list[float]]:
    """Zigzag coefficient vector → dequantized 8x8 spatial block."""
    coef = [[0.0] * 8 for _ in range(8)]
    for zi, (rr, cc) in enumerate(_JPEG_ZIGZAG):
        coef[rr][cc] = zz[zi] * quant[zi]
    return _jpeg_idct_block(coef)


def _jpeg_place_block(
    plane: list[list[int]], by: int, bx: int, blk: list[list[float]]
) -> None:
    """Level-shift, clamp, and store one decoded block into its plane."""
    for yy in range(8):
        row = plane[by * 8 + yy]
        for xx in range(8):
            v = int(round(blk[yy][xx])) + 128
            row[bx * 8 + xx] = min(255, max(0, v))


def _jpeg_nonint_grid(
    w: int, h: int, hi: int, vi: int, hmax: int, vmax: int
) -> tuple[int, int]:
    """Block grid of a NON-interleaved scan (T.81 A.2.2): the component's
    own ceil dimensions, NOT padded to whole MCUs — smaller than the
    interleaved grid whenever the image ends mid-MCU."""
    cw = (w * hi + hmax - 1) // hmax
    ch = (h * vi + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _prog_ac_first(
    reader: "_JpegBitReader",
    zzc: list[int],
    ac_tab: dict,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC first scan for one block (T.81 G.1.2.2): place new
    coefficients at magnitude 2^Al; EOBn symbols start a run of
    end-of-band blocks. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _jpeg_read_huffman(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.bits(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG AC run past end of band")
        zzc[k] = _jpeg_extend(reader.bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(
    reader: "_JpegBitReader",
    zzc: list[int],
    ac_tab: dict,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC refinement for one block (T.81 G.1.2.3): one
    correction bit per already-nonzero coefficient in the band; new
    coefficients appear at ±2^Al; ZRL skips 16 zero-HISTORY positions
    (correction bits still read for nonzero ones passed over). Returns
    the remaining EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_read_huffman(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.bits(r)
                    break
                # r == 15: skip 16 zero-history coefficients below
            else:
                if s != 1:
                    raise ValueError(
                        "invalid magnitude in JPEG AC refinement"
                    )
                val = p1 if reader.bit() else m1
            while k <= se:
                c = zzc[k]
                if c != 0:
                    if reader.bit() and (c & p1) == 0:
                        zzc[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zzc[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = zzc[k]
            if c != 0:
                if reader.bit() and (c & p1) == 0:
                    zzc[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_progressive_scan(
    reader: "_JpegBitReader",
    body: bytes,
    comps: list[tuple],
    coefs: list[list[list[int]]],
    huff: dict,
    geom: tuple,
    restart_interval: int,
) -> None:
    """Apply ONE progressive SOS to the accumulated coefficient arrays.

    DC scans (Ss=0) may interleave all components (MCU geometry) or run
    non-interleaved; AC scans are single-component non-interleaved by
    definition (T.81 G.1). Successive approximation: first scans (Ah=0)
    place values at 2^Al; refinement scans (Ah=Al+1) add one bit.
    Restart markers reset DC predictors and the EOB run.
    """
    w, h, hmax, vmax, mw, mh = geom
    ns = body[0]
    sel = []
    for si in range(ns):
        cs = body[1 + 2 * si]
        td = body[2 + 2 * si] >> 4
        ta = body[2 + 2 * si] & 0x0F
        ci = next(
            (i for i, c in enumerate(comps) if c[0] == cs), None
        )
        if ci is None:
            raise ValueError("JPEG scan references unknown component")
        sel.append((ci, td, ta))
    ss = body[1 + 2 * ns]
    se = body[2 + 2 * ns]
    ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F

    def at_restart(done: int) -> bool:
        return bool(
            restart_interval and done and done % restart_interval == 0
        )

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        preds = [0] * len(comps)

        def dc_one(ci: int, td: int, idx: int) -> None:
            zzc = coefs[ci][idx]
            if ah == 0:
                dc_tab = huff.get((0, td))
                if dc_tab is None:
                    raise ValueError("JPEG scan references missing DHT")
                t = _jpeg_read_huffman(reader, dc_tab)
                diff = _jpeg_extend(reader.bits(t), t)
                preds[ci] += diff
                zzc[0] = preds[ci] << al
            else:
                if reader.bit():
                    zzc[0] |= 1 << al

        done = 0
        if ns > 1:
            for my in range(mh):
                for mx in range(mw):
                    if at_restart(done):
                        reader.restart()
                        preds = [0] * len(comps)
                    done += 1
                    for ci, td, _ in sel:
                        _, _, hi, vi = comps[ci]
                        for dy in range(vi):
                            for dx in range(hi):
                                idx = (my * vi + dy) * (mw * hi) + (
                                    mx * hi + dx
                                )
                                dc_one(ci, td, idx)
        else:
            ci, td, _ = sel[0]
            _, _, hi, vi = comps[ci]
            bw, bh = _jpeg_nonint_grid(w, h, hi, vi, hmax, vmax)
            for by in range(bh):
                for bx in range(bw):
                    if at_restart(done):
                        reader.restart()
                        preds = [0] * len(comps)
                    done += 1
                    dc_one(ci, td, by * (mw * hi) + bx)
        return

    # AC scan: single component, non-interleaved
    if ns != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    ci, _, ta = sel[0]
    ac_tab = huff.get((1, ta))
    if ac_tab is None:
        raise ValueError("JPEG scan references missing DHT")
    _, _, hi, vi = comps[ci]
    bw, bh = _jpeg_nonint_grid(w, h, hi, vi, hmax, vmax)
    eobrun = 0
    done = 0
    for by in range(bh):
        for bx in range(bw):
            if at_restart(done):
                reader.restart()
                eobrun = 0
            done += 1
            zzc = coefs[ci][by * (mw * hi) + bx]
            if ah == 0:
                eobrun = _prog_ac_first(
                    reader, zzc, ac_tab, ss, se, al, eobrun
                )
            else:
                eobrun = _prog_ac_refine(
                    reader, zzc, ac_tab, ss, se, al, eobrun
                )


def _jpeg_features(data: bytes) -> list[float]:
    """REAL image decode: baseline sequential JFIF/JPEG — the format
    every actual crawl asset uses — implemented from the T.81 spec with
    zero dependencies: marker parse, DQT/DHT tables, MSB-first Huffman
    entropy decode with byte unstuffing, DC prediction, zigzag,
    dequantize, naive float64 IDCT, level shift, interleaved-MCU
    assembly with chroma upsampling, YCbCr->RGB. Supported: 8-bit
    baseline (SOF0) AND progressive (SOF2, multi-scan spectral
    selection + successive approximation incl. AC refinement),
    grayscale, ANY sampling-factor combination in 1..4 — which covers
    4:4:4, 4:2:2, and the 4:2:0 that dominates real crawls
    (value-checked at 4:2:0, 4:4:4, and the progressive twin by the
    oracle fixtures) — and DRI/RSTn restart intervals (byte-align +
    predictor reset at each boundary). 12-bit precision and arithmetic
    coding raise NotImplementedError — the honest boundaries where a
    production cluster registers libjpeg. The first decoded frame's
    pixels feed the shared :func:`_pixel_features` statistics."""
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    progressive = False
    coefs: list[list[list[int]]] | None = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                # all scans applied: dequantize + IDCT the accumulated
                # coefficient arrays and assemble pixels
                w, h, comps = frame
                hmax = max(c[2] for c in comps)
                vmax = max(c[3] for c in comps)
                mw = (w + 8 * hmax - 1) // (8 * hmax)
                mh = (h + 8 * vmax - 1) // (8 * vmax)
                planes = [
                    [[0] * (mw * hi * 8) for _ in range(mh * vi * 8)]
                    for (_, _, hi, vi) in comps
                ]
                for ci, (cid, tq, hi, vi) in enumerate(comps):
                    quant = qt.get(tq)
                    if quant is None:
                        raise ValueError("JPEG frame missing DQT table")
                    stride = mw * hi
                    for by in range(mh * vi):
                        for bx in range(stride):
                            blk = _jpeg_render_block(
                                coefs[ci][by * stride + bx], quant
                            )
                            _jpeg_place_block(planes[ci], by, bx, blk)
                return _jpeg_pixels(planes, comps, w, h, hmax, vmax)
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        seglen = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quant tables unsupported"
                    )
                qt[tid] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _jpeg_build_huffman(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            precision = body[0]
            if precision != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                samp = body[7 + 3 * ci]
                hi, vi = samp >> 4, samp & 0x0F
                tq = body[8 + 3 * ci]
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(
                        f"invalid JPEG sampling factors {hi}x{vi}"
                    )
                comps.append((cid, tq, hi, vi))
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG unsupported"
                )
            if ncomp == 1:
                # single-component scans are non-interleaved (T.81
                # A.2.2): one block per MCU over the full-resolution
                # grid, whatever the declared sampling factors
                cid, tq, _, _ = comps[0]
                comps = [(cid, tq, 1, 1)]
            frame = (w, h, comps)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG SOF marker 0xff{marker:02x} — "
                "extended/lossless/arithmetic need libjpeg"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            w, h, comps = frame
            if w <= 0 or h <= 0:
                raise ValueError(f"zero-pixel image: {w}x{h}")
            if progressive:
                hmax = max(c[2] for c in comps)
                vmax = max(c[3] for c in comps)
                mw = (w + 8 * hmax - 1) // (8 * hmax)
                mh = (h + 8 * vmax - 1) // (8 * vmax)
                if coefs is None:
                    coefs = [
                        [
                            [0] * 64
                            for _ in range(mw * hi * mh * vi)
                        ]
                        for (_, _, hi, vi) in comps
                    ]
                reader = _JpegBitReader(data, pos + seglen)
                _jpeg_progressive_scan(
                    reader,
                    body,
                    comps,
                    coefs,
                    huff,
                    (w, h, hmax, vmax, mw, mh),
                    restart_interval,
                )
                # the entropy-coded segment has no recorded length:
                # resume the marker walk where the scan's reader stopped
                pos = reader.pos
                continue
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError(
                    "multi-scan sequential JPEG unsupported"
                )
            scan_tables = {}
            for si in range(ns):
                cs = body[1 + 2 * si]
                td, ta = body[2 + 2 * si] >> 4, body[2 + 2 * si] & 0x0F
                scan_tables[cs] = (td, ta)
            reader = _JpegBitReader(data, pos + seglen)
            # Interleaved MCU geometry (T.81 A.2.3): the MCU covers
            # 8*hmax x 8*vmax pixels; component i contributes hi*vi
            # blocks per MCU in raster order, into a plane whose block
            # grid is (mw*hi) x (mh*vi) — padding blocks beyond the
            # visible area are decoded then cropped.
            hmax = max(c[2] for c in comps)
            vmax = max(c[3] for c in comps)
            mw = (w + 8 * hmax - 1) // (8 * hmax)
            mh = (h + 8 * vmax - 1) // (8 * vmax)
            planes = [
                [[0] * (mw * hi * 8) for _ in range(mh * vi * 8)]
                for (_, _, hi, vi) in comps
            ]
            pred = [0] * len(comps)
            mcu_done = 0
            for my in range(mh):
                for mx in range(mw):
                    # restart boundary every `restart_interval` MCUs:
                    # byte-align, consume RSTn, reset DC predictors
                    # (T.81 E.2.4)
                    if (
                        restart_interval
                        and mcu_done
                        and mcu_done % restart_interval == 0
                    ):
                        reader.restart()
                        pred = [0] * len(comps)
                    mcu_done += 1
                    for ci, (cid, tq, hi, vi) in enumerate(comps):
                        td, ta = scan_tables[cid]
                        dc_tab = huff.get((0, td))
                        ac_tab = huff.get((1, ta))
                        quant = qt.get(tq)
                        if dc_tab is None or ac_tab is None or quant is None:
                            raise ValueError(
                                "JPEG scan references missing DHT/DQT table"
                            )
                        for dy in range(vi):
                            for dx in range(hi):
                                zz = [0] * 64
                                t = _jpeg_read_huffman(reader, dc_tab)
                                diff = _jpeg_extend(reader.bits(t), t)
                                pred[ci] += diff
                                zz[0] = pred[ci]
                                k = 1
                                while k < 64:
                                    rs = _jpeg_read_huffman(reader, ac_tab)
                                    r, s = rs >> 4, rs & 0x0F
                                    if s == 0:
                                        if r == 15:  # ZRL
                                            k += 16
                                            continue
                                        break  # EOB
                                    k += r
                                    if k > 63:
                                        raise ValueError(
                                            "JPEG AC run past end of block"
                                        )
                                    zz[k] = _jpeg_extend(reader.bits(s), s)
                                    k += 1
                                blk = _jpeg_render_block(zz, quant)
                                _jpeg_place_block(
                                    planes[ci], my * vi + dy, mx * hi + dx,
                                    blk,
                                )
            return _jpeg_pixels(planes, comps, w, h, hmax, vmax)
        pos += seglen
    raise ValueError("JPEG contains no scan data")


def _jpeg_pixels(
    planes: list[list[list[int]]],
    comps: list[tuple],
    w: int,
    h: int,
    hmax: int,
    vmax: int,
) -> list[float]:
    """Assemble RGB pixels from decoded component planes (grayscale
    expansion or chroma-upsampled YCbCr→RGB) and hand them to the
    shared feature statistics — common tail of the baseline and
    progressive decode paths."""
    pixels = []
    if len(comps) == 1:
        for y in range(h):
            for x in range(w):
                g = planes[0][y][x]
                pixels.append((g, g, g))
    else:
        # chroma upsampling: nearest sample by integer index scaling
        # (x*hi//hmax, y*vi//vmax) — exact for the box-replicated
        # subsampled grids baseline encoders emit
        h0, v0 = comps[0][2], comps[0][3]
        h1, v1 = comps[1][2], comps[1][3]
        h2, v2 = comps[2][2], comps[2][3]
        for y in range(h):
            for x in range(w):
                yv = planes[0][y * v0 // vmax][x * h0 // hmax]
                cb = planes[1][y * v1 // vmax][x * h1 // hmax] - 128
                cr = planes[2][y * v2 // vmax][x * h2 // hmax] - 128
                r = min(255, max(0, int(round(yv + 1.402 * cr))))
                g = min(
                    255,
                    max(
                        0,
                        int(round(yv - 0.344136 * cb - 0.714136 * cr)),
                    ),
                )
                b = min(255, max(0, int(round(yv + 1.772 * cb))))
                pixels.append((r, g, b))
    return _pixel_features(w, h, pixels)


def _strict_decode(data: bytes) -> list[float]:
    """Decode REAL formats implementable without codec libraries (binary
    PPM, uncompressed 24-bit BMP, 8-bit truecolor PNG via stdlib zlib,
    16-bit PCM WAV, uncompressed DIB AVI); raise for anything needing
    Pillow/torchaudio/ffmpeg — strict mode turns a silently-fake feature
    into a loud error on a cluster missing codecs."""
    if data.startswith(b"P6"):
        return _ppm_features(data)
    if data.startswith(b"BM"):
        return _bmp_features(data)
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return _png_features(data)
    if data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
        return _gif_features(data)
    if data.startswith(b"\xff\xd8"):
        return _jpeg_features(data)
    if data.startswith(b"RIFF"):
        # RIFF is a container family: dispatch on the form type
        if data[8:12] == b"WAVE":
            return _wav_features(data)
        if data[8:12] == b"AVI ":
            return _avi_features(data)
    raise NotImplementedError(
        "media decode beyond PPM/BMP/PNG/GIF/JPEG/WAV/AVI requires "
        "codec "
        "libraries "
        "(Pillow/torchaudio/ffmpeg) not present in this container; "
        "install them on the cluster image and register a real kernel "
        "in DECODERS"
    )


DECODERS = {
    "deterministic_fake": _fake_features,
    "ppm": _ppm_features,
    "bmp": _bmp_features,
    "png": _png_features,
    "gif": _gif_features,
    "jpeg": _jpeg_features,
    "wav": _wav_features,
    "avi": _avi_features,
    "strict": _strict_decode,
}


def synthetic_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Small deterministic asset table (binary payloads derived from md5)
    for exercising the plumbing."""
    rows = []
    for i in range(n):
        blob = hashlib.md5(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        # every 3rd asset is a "video" with a deterministic duration so the
        # frame-sampling planner has real fan-out to cost
        is_video = i % 3 == 0
        rows.append(
            (
                i,
                bytearray(blob),
                "video/fake" if is_video else "image/fake",
                8 + i % 32,
                8 + (i * 3) % 32,
                500 * (1 + i % 9) if is_video else None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_ppm_assets(
    spark: SparkSession, n: int = 16, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL binary PPM (P6) images with
    deterministic md5-derived pixels — the fixture for the strict-mode
    decode path (no codec library needed to parse P6)."""
    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        raster = bytearray()
        for p in range(w * h):
            raster += hashlib.md5(f"{seed}:{i}:{p}".encode()).digest()[:3]
        blob = f"P6\n{w} {h}\n255\n".encode() + bytes(raster)
        rows.append((i, bytearray(blob), "image/x-portable-pixmap", w, h, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_png_assets(
    spark: SparkSession, n: int = 16, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL zlib-compressed PNGs with the
    SAME md5-derived pixels as :func:`synthetic_ppm_assets` (pixel p of
    asset i is md5("{seed}:{i}:{p}")[:3], identical dims) — so the
    compressed-format decode is value-checkable against raw pixel math,
    and per-asset features must equal the PPM twin's. The encoder cycles
    all five scanline filter types (filter = row_index % 5), so every
    unfilter branch (None/Sub/Up/Average/Paeth) is exercised; odd assets
    are RGBA (alpha = md5 byte 3, dropped by the decoder), even assets
    RGB."""

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + ctype
            + body
            + zlib.crc32(ctype + body).to_bytes(4, "big")
        )

    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        rgba = i % 2 == 1
        ch = 4 if rgba else 3
        px = [
            hashlib.md5(f"{seed}:{i}:{p}".encode()).digest()[:4]
            for p in range(w * h)
        ]
        stride = w * ch
        prior = bytes(stride)
        out = bytearray()
        for row in range(h):
            line = bytearray()
            for x in range(w):
                line += px[row * w + x][:ch]
            ft = row % 5
            out.append(ft)
            if ft == 0:  # None
                out += line
            elif ft == 1:  # Sub
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    out.append((line[x] - left) & 0xFF)
            elif ft == 2:  # Up
                for x in range(stride):
                    out.append((line[x] - prior[x]) & 0xFF)
            elif ft == 3:  # Average
                for x in range(stride):
                    left = line[x - ch] if x >= ch else 0
                    out.append((line[x] - ((left + prior[x]) >> 1)) & 0xFF)
            else:  # Paeth
                for x in range(stride):
                    a = line[x - ch] if x >= ch else 0
                    c = prior[x - ch] if x >= ch else 0
                    out.append((line[x] - _paeth(a, prior[x], c)) & 0xFF)
            prior = bytes(line)
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes((8, 6 if rgba else 2, 0, 0, 0))
        )
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b"")
        )
        rows.append((i, bytearray(blob), "image/png", w, h, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        len(body).to_bytes(4, "big")
        + ctype
        + body
        + zlib.crc32(ctype + body).to_bytes(4, "big")
    )


def _png_filter_rows(
    raster: list[bytes], stride: int, ch: int
) -> bytearray:
    """Apply the per-row filter cycle (row % 5) used by every PNG
    fixture, returning the filtered raster ready for DEFLATE."""
    prior = bytes(stride)
    out = bytearray()
    for row, line in enumerate(raster):
        ft = row % 5
        out.append(ft)
        if ft == 0:
            out += line
        elif ft == 1:
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                out.append((line[x] - left) & 0xFF)
        elif ft == 2:
            for x in range(stride):
                out.append((line[x] - prior[x]) & 0xFF)
        elif ft == 3:
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                out.append((line[x] - ((left + prior[x]) >> 1)) & 0xFF)
        else:
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                c = prior[x - ch] if x >= ch else 0
                out.append((line[x] - _paeth(a, prior[x], c)) & 0xFF)
        prior = bytes(line)
    return out


def synthetic_png_palette_assets(
    spark: SparkSession, n: int = 12, seed: int = 42
) -> DataFrame:
    """Palette (color type 3) PNGs with the SAME md5-derived pixels as
    :func:`synthetic_ppm_assets`: the PLTE is the image's pixels in
    raster order (fixture dims keep w·h ≤ 48 < 256, so index == pixel
    position) — a full exercise of the palette-lookup decode path whose
    features must equal the truecolor/PPM twins bit-for-bit. Scanline
    filters cycle per row exactly like the truecolor fixture, now over
    1-byte-per-pixel index rows."""
    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        px = [
            hashlib.md5(f"{seed}:{i}:{p}".encode()).digest()[:3]
            for p in range(w * h)
        ]
        plte = b"".join(px)
        raster = [
            bytes(range(row * w, (row + 1) * w)) for row in range(h)
        ]
        out = _png_filter_rows(raster, w, 1)
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes((8, 3, 0, 0, 0))
        )
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b"")
        )
        rows.append((i, bytearray(blob), "image/png", w, h, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_png_gray_assets(
    spark: SparkSession, n: int = 12, seed: int = 42
) -> DataFrame:
    """Grayscale (color type 0) PNGs: pixel p of asset i is the single
    byte md5("{seed}:g:{i}:{p}")[0], which the decoder must expand to
    (g, g, g); filters cycle per row over the 1-byte-per-pixel rows."""
    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        gs = [
            hashlib.md5(f"{seed}:g:{i}:{p}".encode()).digest()[0]
            for p in range(w * h)
        ]
        raster = [
            bytes(gs[row * w : (row + 1) * w]) for row in range(h)
        ]
        out = _png_filter_rows(raster, w, 1)
        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes((8, 0, 0, 0, 0))
        )
        blob = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
            + _png_chunk(b"IEND", b"")
        )
        rows.append((i, bytearray(blob), "image/png", w, h, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """GIF-variant LZW encode (fixture-side twin of :func:`_gif_lzw_decode`):
    greedy longest-match dictionary build, variable code width with the
    GIF early-change bump, clear code at 4096, LSB-first packing."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    codes: list[tuple[int, int]] = [(clear, width)]
    buf: tuple[int, ...] = ()
    for idx in indices:
        cand = buf + (idx,)
        if cand in table:
            buf = cand
            continue
        codes.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4096:
            codes.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (idx,)
    if buf:
        codes.append((table[buf], width))
    codes.append((end, width))
    acc = nbits = 0
    out = bytearray()
    for code, wd in codes:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def synthetic_gif_assets(
    spark: SparkSession, n: int = 16, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL LZW-compressed GIFs with the
    SAME md5-derived pixels as :func:`synthetic_ppm_assets` (pixel p of
    asset i is md5("{seed}:{i}:{p}")[:3], identical dims) — so the GIF
    decode is value-checkable against raw pixel math and per-asset
    features must equal the PPM twin's. The palette is the image's
    distinct colors in first-appearance order padded to a power of two;
    even assets are GIF87a with a global color table, odd assets GIF89a
    with a graphic-control extension and a LOCAL color table (no global)
    — exercising the extension-skip and table-override paths."""
    rows = []
    for i in range(n):
        w, h = 4 + i % 5, 3 + i % 4
        px = [
            tuple(hashlib.md5(f"{seed}:{i}:{p}".encode()).digest()[:3])
            for p in range(w * h)
        ]
        colors: list[tuple[int, int, int]] = []
        index_of: dict[tuple[int, int, int], int] = {}
        for c in px:
            if c not in index_of:
                index_of[c] = len(colors)
                colors.append(c)
        k = max(1, (len(colors) - 1).bit_length())
        colors += [(0, 0, 0)] * ((1 << k) - len(colors))
        mcs = max(2, k)
        indices = [index_of[c] for c in px]
        lzw = _gif_lzw_encode(indices, mcs)
        sub = bytearray()
        for off in range(0, len(lzw), 255):
            blockbytes = lzw[off : off + 255]
            sub += bytes((len(blockbytes),)) + blockbytes
        sub += b"\x00"
        ct = b"".join(bytes(c) for c in colors)
        wle = w.to_bytes(2, "little")
        hle = h.to_bytes(2, "little")
        if i % 2 == 0:  # GIF87a, global color table
            blob = (
                b"GIF87a" + wle + hle
                + bytes((0x80 | 0x70 | (k - 1), 0, 0)) + ct
                + b"\x2c" + b"\x00" * 4 + wle + hle + b"\x00"
                + bytes((mcs,)) + sub + b"\x3b"
            )
        else:  # GIF89a, GCE to skip, local color table only
            blob = (
                b"GIF89a" + wle + hle + bytes((0x70, 0, 0))
                + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
                + b"\x2c" + b"\x00" * 4 + wle + hle
                + bytes((0x80 | (k - 1),))
                + ct + bytes((mcs,)) + sub + b"\x3b"
            )
        rows.append((i, bytearray(blob), "image/gif", w, h, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


class _JpegBitWriter:
    """MSB-first bit writer with JPEG byte stuffing (0xFF -> 0xFF 0x00)
    and 1-fill padding to the byte boundary (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)

    def restart(self, m: int) -> None:
        """Byte-align (1-fill, stuffed like any entropy byte) then emit
        the RSTm marker RAW — markers are never byte-stuffed."""
        self.flush()
        self.out += bytes((0xFF, 0xD0 + (m % 8)))


def synthetic_jpeg_assets(
    spark: SparkSession, n: int = 12, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL baseline JFIF/JPEGs built so
    the (normally lossy) decode is BIT-EXACT and oracle-replayable:
    every 8x8 block is a constant gray level (Y = first md5 byte of
    "{seed}:{i}:{bx}:{by}", Cb=Cr=128), so the forward DCT has only a
    DC coefficient (8*(Y-128), exactly integral), the quant tables are
    all-ones, and the IDCT reconstructs Y exactly — while the decoder
    still exercises the full real pipeline: marker parse, custom DHT
    Huffman decode, DC prediction across blocks, byte unstuffing,
    zigzag, dequantize, IDCT, YCbCr->RGB. Even assets are 3-component
    4:4:4 color, odd assets single-component grayscale; dims span 1x1
    to 2x3 blocks."""
    dc_cats = 12  # DC diff range +-2040 -> categories 0..11
    dc_bits = [0, 0, 0, dc_cats] + [0] * 12
    dc_vals = list(range(dc_cats))
    dc_codes = {t: (4, t) for t in range(dc_cats)}  # canonical: len 4
    ac_bits = [1] + [0] * 15
    ac_vals = [0x00]  # EOB only: fixture blocks are DC-only

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") + body

    rows = []
    for i in range(n):
        bw, bh = 1 + i % 2, 1 + i % 3
        w, h = 8 * bw, 8 * bh
        ncomp = 1 if i % 2 else 3
        blocky = [
            [
                hashlib.md5(f"{seed}:{i}:{bx}:{by}".encode()).digest()[0]
                for bx in range(bw)
            ]
            for by in range(bh)
        ]
        writer = _JpegBitWriter()
        pred = [0] * ncomp
        for by in range(bh):
            for bx in range(bw):
                for ci in range(ncomp):
                    dc = 8 * (blocky[by][bx] - 128) if ci == 0 else 0
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    t = abs(diff).bit_length()
                    ln, code = dc_codes[t]
                    writer.write(code, ln)
                    if t:
                        writer.write(
                            diff if diff >= 0 else diff + (1 << t) - 1, t
                        )
                    writer.write(0, 1)  # EOB (AC code '0', length 1)
        scan = writer.flush()
        dqt = seg(0xDB, bytes((0x00,)) + bytes([1] * 64))
        sof_body = bytes((8,)) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        sof_body += bytes((ncomp,))
        for ci in range(ncomp):
            sof_body += bytes((ci + 1, 0x11, 0))
        dht = seg(0xC4, bytes((0x00,)) + bytes(dc_bits[:16]) + bytes(dc_vals))
        dht += seg(0xC4, bytes((0x10,)) + bytes(ac_bits) + bytes(ac_vals))
        sos_body = bytes((ncomp,))
        for ci in range(ncomp):
            sos_body += bytes((ci + 1, 0x00))
        sos_body += bytes((0, 63, 0))
        blob = (
            b"\xff\xd8"
            + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
            + dqt
            + seg(0xC0, sof_body)
            + dht
            + seg(0xDA, sos_body)
            + scan
            + b"\xff\xd9"
        )
        rows.append(
            (i, bytearray(blob), "image/jpeg", w, h, None)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_jpeg420_assets(
    spark: SparkSession, n: int = 12, seed: int = 42
) -> DataFrame:
    """Asset table of REAL 4:2:0 chroma-subsampled baseline JPEGs — the
    layout of virtually every crawled JPEG (Y sampling 2x2, Cb/Cr 1x1,
    16x16-pixel MCUs of four Y blocks + one Cb + one Cr). Engineered
    bit-exact like :func:`synthetic_jpeg_assets`: every 8x8 Y block is
    a constant level (first md5 byte of "{seed}:{i}:{bx}:{by}" over the
    PADDED block grid — partial MCUs force the decoder to decode then
    crop padding blocks) and each MCU carries constant nontrivial
    chroma (Cb, Cr = first two md5 bytes of "{seed}:{i}:c:{mx}:{my}"),
    so DC-only blocks + unit quant make the full pipeline — MCU
    interleave, per-component DC prediction, chroma upsampling, and the
    REAL YCbCr->RGB conversion — exactly replayable from the formula.
    Dims span 1..3 blocks per axis, covering full-MCU, half-MCU-wide,
    and half-MCU-tall geometries. Asset i carries restart interval
    ``i % 3`` MCUs (0 = none): real crawl JPEGs use DRI/RSTn routinely,
    and restarts change the BYTE STREAM (alignment, marker, predictor
    reset) but not the pixels — so the same oracle value-checks both
    the plain and the restart-segmented entropy layouts."""
    rows = [
        (
            i,
            bytearray(
                _dc_only_subsampled_jpeg(
                    i,
                    seed,
                    8 * (1 + i % 3),
                    8 * (1 + (i // 3) % 3),
                    restart_interval=i % 3,
                )
            ),
            "image/jpeg",
            8 * (1 + i % 3),
            8 * (1 + (i // 3) % 3),
            None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _dc_only_subsampled_jpeg(
    i: int,
    seed: int,
    w: int,
    h: int,
    yh: int = 2,
    yv: int = 2,
    restart_interval: int = 0,
) -> bytes:
    """One DC-only subsampled baseline JPEG blob: Y sampled ``yh``x``yv``
    (2x2 → 4:2:0, 2x1 → 4:2:2), chroma 1x1. Y level per 8x8 block from
    md5("{seed}:{i}:{bx}:{by}") over the PADDED Y-block grid; (Cb, Cr)
    per MCU from md5("{seed}:{i}:c:{mx}:{my}")[:2]. With
    ``restart_interval`` > 0 a DRI segment is written and an RSTn marker
    (byte-aligned, DC predictors reset) is inserted every that many MCUs
    — same decoded pixels, different byte stream. Shared by the
    :func:`synthetic_jpeg420_assets` fixture and the parity tests."""
    dc_cats = 12  # DC diff range +-2040 -> categories 0..11
    dc_bits = [0, 0, 0, dc_cats] + [0] * 12
    dc_vals = list(range(dc_cats))
    dc_codes = {t: (4, t) for t in range(dc_cats)}  # canonical: len 4
    ac_bits = [1] + [0] * 15
    ac_vals = [0x00]  # EOB only: fixture blocks are DC-only

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") + body

    mw = (w + 8 * yh - 1) // (8 * yh)
    mh = (h + 8 * yv - 1) // (8 * yv)
    blocky = [
        [
            hashlib.md5(f"{seed}:{i}:{bx}:{by}".encode()).digest()[0]
            for bx in range(yh * mw)
        ]
        for by in range(yv * mh)
    ]
    chroma = [
        [
            hashlib.md5(f"{seed}:{i}:c:{mx}:{my}".encode()).digest()[:2]
            for mx in range(mw)
        ]
        for my in range(mh)
    ]
    writer = _JpegBitWriter()
    pred = [0, 0, 0]

    def emit_dc(ci: int, level: int) -> None:
        dc = 8 * (level - 128)
        diff = dc - pred[ci]
        pred[ci] = dc
        t = abs(diff).bit_length()
        ln, code = dc_codes[t]
        writer.write(code, ln)
        if t:
            writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        writer.write(0, 1)  # EOB (AC code '0', length 1)

    mcu_done = 0
    for my in range(mh):
        for mx in range(mw):
            if (
                restart_interval
                and mcu_done
                and mcu_done % restart_interval == 0
            ):
                writer.restart((mcu_done // restart_interval - 1) % 8)
                pred[0] = pred[1] = pred[2] = 0
            mcu_done += 1
            for dy in range(yv):
                for dx in range(yh):
                    emit_dc(0, blocky[yv * my + dy][yh * mx + dx])
            emit_dc(1, chroma[my][mx][0])
            emit_dc(2, chroma[my][mx][1])
    scan = writer.flush()
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    dqt = seg(0xDB, bytes((0x00,)) + bytes([1] * 64))
    sof_body = bytes((8,)) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes((3,))
    sof_body += bytes((1, (yh << 4) | yv, 0))  # Y
    sof_body += bytes((2, 0x11, 0))  # Cb: 1x1
    sof_body += bytes((3, 0x11, 0))  # Cr: 1x1
    dht = seg(0xC4, bytes((0x00,)) + bytes(dc_bits[:16]) + bytes(dc_vals))
    dht += seg(0xC4, bytes((0x10,)) + bytes(ac_bits) + bytes(ac_vals))
    sos_body = bytes((3,))
    for ci in range(3):
        sos_body += bytes((ci + 1, 0x00))
    sos_body += bytes((0, 63, 0))
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt
        + dri
        + seg(0xC0, sof_body)
        + dht
        + seg(0xDA, sos_body)
        + scan
        + b"\xff\xd9"
    )


def _dc_only_progressive_jpeg(
    i: int, seed: int, w: int, h: int, yh: int = 2, yv: int = 2
) -> bytes:
    """PROGRESSIVE (SOF2) twin of :func:`_dc_only_subsampled_jpeg` —
    identical pixels, five-scan progressive layout: interleaved DC
    first scan at Al=1, DC refinement scan (raw bits, Ah=1→Al=0), then
    one non-interleaved AC first scan per component whose entire band
    is one EOB run (the fixture's blocks are DC-only). Exercises
    successive approximation, multi-scan coefficient accumulation, the
    interleaved-vs-non-interleaved grid distinction on partial MCUs,
    and EOBn run coding — all value-checkable because the decoded
    pixels must equal the baseline twin's exactly."""
    dc_cats = 12
    dc_bits = [0, 0, 0, dc_cats] + [0] * 12
    dc_vals = list(range(dc_cats))
    dc_codes = {t: (4, t) for t in range(dc_cats)}
    # AC table: EOBn symbols r<<4 for r in 0..3 (runs up to 15 blocks),
    # four codes of length 3
    ac_bits = [0, 0, 4] + [0] * 13
    ac_vals = [0x00, 0x10, 0x20, 0x30]
    ac_codes = {0x00: (3, 0), 0x10: (3, 1), 0x20: (3, 2), 0x30: (3, 3)}

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + (len(body) + 2).to_bytes(2, "big") + body

    mw = (w + 8 * yh - 1) // (8 * yh)
    mh = (h + 8 * yv - 1) // (8 * yv)
    blocky = [
        [
            hashlib.md5(f"{seed}:{i}:{bx}:{by}".encode()).digest()[0]
            for bx in range(yh * mw)
        ]
        for by in range(yv * mh)
    ]
    chroma = [
        [
            hashlib.md5(f"{seed}:{i}:c:{mx}:{my}".encode()).digest()[:2]
            for mx in range(mw)
        ]
        for my in range(mh)
    ]
    samp = [(yh, yv), (1, 1), (1, 1)]

    def mcu_order():  # (ci, dc) stream in interleaved MCU order
        for my in range(mh):
            for mx in range(mw):
                for dy in range(yv):
                    for dx in range(yh):
                        yield 0, 8 * (blocky[yv * my + dy][yh * mx + dx] - 128)
                yield 1, 8 * (chroma[my][mx][0] - 128)
                yield 2, 8 * (chroma[my][mx][1] - 128)

    def sos(comp_spec: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int, scan: bytes) -> bytes:
        body = bytes((len(comp_spec),))
        for cid, tdta in comp_spec:
            body += bytes((cid, tdta))
        body += bytes((ss, se, (ah << 4) | al))
        return seg(0xDA, body) + scan

    # scan 1: interleaved DC first, Al=1 (codes dc >> 1 as diffs)
    wr = _JpegBitWriter()
    pred = [0, 0, 0]
    for ci, dc in mcu_order():
        v = dc >> 1
        diff = v - pred[ci]
        pred[ci] = v
        t = abs(diff).bit_length()
        ln, code = dc_codes[t]
        wr.write(code, ln)
        if t:
            wr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    scan1 = sos([(1, 0), (2, 0), (3, 0)], 0, 0, 0, 1, wr.flush())

    # scan 2: DC refinement, Ah=1 Al=0 — one raw bit per block
    wr = _JpegBitWriter()
    for ci, dc in mcu_order():
        wr.write(dc & 1, 1)
    scan2 = sos([(1, 0), (2, 0), (3, 0)], 0, 0, 1, 0, wr.flush())

    # scans 3-5: AC first per component — the whole band is one EOB run
    ac_scans = b""
    for ci, cid in ((0, 1), (1, 2), (2, 3)):
        hi, vi = samp[ci]
        cw = (w * hi + yh - 1) // yh
        ch = (h * vi + yv - 1) // yv
        nblocks = ((cw + 7) // 8) * ((ch + 7) // 8)
        r = nblocks.bit_length() - 1  # 2^r <= nblocks < 2^(r+1)
        extra = nblocks - (1 << r)
        wr = _JpegBitWriter()
        ln, code = ac_codes[r << 4]
        wr.write(code, ln)
        if r:
            wr.write(extra, r)
        ac_scans += sos([(cid, 0)], 1, 63, 0, 0, wr.flush())

    dqt = seg(0xDB, bytes((0x00,)) + bytes([1] * 64))
    sof_body = bytes((8,)) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes((3,))
    sof_body += bytes((1, (yh << 4) | yv, 0))
    sof_body += bytes((2, 0x11, 0))
    sof_body += bytes((3, 0x11, 0))
    dht = seg(0xC4, bytes((0x00,)) + bytes(dc_bits[:16]) + bytes(dc_vals))
    dht += seg(0xC4, bytes((0x10,)) + bytes(ac_bits) + bytes(ac_vals))
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + dqt
        + seg(0xC2, sof_body)
        + dht
        + scan1
        + scan2
        + ac_scans
        + b"\xff\xd9"
    )


def synthetic_jpeg_progressive_assets(
    spark: SparkSession, n: int = 12, seed: int = 42
) -> DataFrame:
    """Progressive-JPEG asset table: byte-for-byte DIFFERENT files from
    :func:`synthetic_jpeg420_assets` (five-scan SOF2 layout) that must
    decode to byte-for-byte IDENTICAL pixels — so the same per-pixel
    oracle value-checks the whole progressive machinery."""
    rows = [
        (
            i,
            bytearray(
                _dc_only_progressive_jpeg(
                    i, seed, 8 * (1 + i % 3), 8 * (1 + (i // 3) % 3)
                )
            ),
            "image/jpeg",
            8 * (1 + i % 3),
            8 * (1 + (i // 3) % 3),
            None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_wav_assets(
    spark: SparkSession, n: int = 8, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL 16-bit PCM WAV files with
    deterministic md5-derived samples — the audio fixture for the
    strict-mode decode path (RIFF needs no codec library to parse)."""
    rows = []
    for i in range(n):
        channels = 1 + i % 2
        rate = 8000 * (1 + i % 3)
        frames = 50 + 10 * i
        raw = bytearray()
        for p in range(frames * channels):
            h = hashlib.md5(f"{seed}:{i}:{p}".encode()).digest()
            val = int.from_bytes(h[:2], "big", signed=True)
            raw += val.to_bytes(2, "little", signed=True)
        fmt = (
            (1).to_bytes(2, "little")
            + channels.to_bytes(2, "little")
            + rate.to_bytes(4, "little")
            + (rate * channels * 2).to_bytes(4, "little")
            + (channels * 2).to_bytes(2, "little")
            + (16).to_bytes(2, "little")
        )
        body = (
            b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(raw).to_bytes(4, "little") + bytes(raw)
        )
        blob = b"RIFF" + len(body).to_bytes(4, "little") + body
        rows.append((i, bytearray(blob), "audio/wav", None, None,
                     frames * 1000 // rate))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_avi_assets(
    spark: SparkSession, n: int = 6, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL AVI files (RIFF container,
    uncompressed 24-bit DIB frames, bottom-up BGR rows padded to 4
    bytes) with deterministic md5-derived pixels — the video fixture for
    the strict-mode decode path. Pixel (r,g,b) for asset i, frame f,
    row-major pixel p is md5("{seed}:{i}:{f}:{p}")[:3], so a DuckDB
    oracle can re-derive every frame byte and value-check the whole
    container parse + temporal statistics."""

    def u32(v: int) -> bytes:
        return v.to_bytes(4, "little")

    def u16(v: int) -> bytes:
        return v.to_bytes(2, "little")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + u32(len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    rows = []
    for i in range(n):
        w, h = 4 + i % 3, 3 + i % 2
        nf = 4 + i % 3
        usec = 40000 * (1 + i % 2)  # 25 / 12.5 fps
        stride = (3 * w + 3) // 4 * 4
        frames = []
        for f in range(nf):
            px = [
                hashlib.md5(f"{seed}:{i}:{f}:{p}".encode()).digest()[:3]
                for p in range(w * h)
            ]
            raw = bytearray()
            for row in range(h - 1, -1, -1):  # bottom-up rows
                for x in range(w):
                    r, g, b = px[row * w + x]
                    raw += bytes((b, g, r))  # BGR order
                raw += b"\x00" * (stride - 3 * w)
            frames.append(chunk(b"00db", bytes(raw)))
        avih = (
            u32(usec) + u32(0) + u32(0) + u32(0) + u32(nf) + u32(0)
            + u32(1) + u32(0) + u32(w) + u32(h) + u32(0) * 4
        )
        strh = (
            b"vids" + b"DIB " + u32(0) + u16(0) + u16(0) + u32(0)
            + u32(usec) + u32(1_000_000) + u32(0) + u32(nf)
            + u32(stride * h) + u32(0) + u32(0) + u16(0) * 4
        )
        strf = (
            u32(40) + u32(w) + u32(h) + u16(1) + u16(24) + u32(0)
            + u32(stride * h) + u32(0) + u32(0) + u32(0) + u32(0)
        )
        body = (
            b"AVI "
            + lst(b"hdrl", chunk(b"avih", avih)
                  + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
            + lst(b"movi", b"".join(frames))
        )
        blob = b"RIFF" + u32(len(body)) + body
        rows.append((i, bytearray(blob), "video/x-msvideo", w, h,
                     nf * usec // 1000))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def extract_features(
    assets: DataFrame, decoder: str = "deterministic_fake", batch_size_hint: int = 256
) -> DataFrame:
    """Decode/feature-extract each asset via Arrow-batched mapInPandas.

    The UDF sees pandas batches of (asset_id, media); bytes stay in Arrow
    buffers between JVM and Python. Output is the narrow FEATURES_SCHEMA —
    blobs are dropped as early as possible.
    """
    kernel = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(bytes(b)) if b is not None else None for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["media"]],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "media").mapInPandas(run, FEATURES_SCHEMA)


def resized_features(assets: DataFrame, max_dim: int = 8) -> DataFrame:
    """Decode + REAL aspect-fit nearest-neighbor resize + features in one
    Arrow mapInPandas kernel — the pixel work :func:`resize_targets`
    only plans. Target dimensions use the plan's exact arithmetic
    (half-up, floor-to-1), and the nearest-neighbor source mapping is
    integer floor — so an oracle can replay the resized pixels from the
    fixture's generative formula, value-checking the executed resize
    the same way the decoders are checked. PPM (the raw-pixel
    container) here; the compressed containers share the same resize
    helper once decoded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["media"]:
                if b is None:
                    feats.append(None)
                    continue
                w, h, px = _ppm_pixels(bytes(b))
                tw, th, out = _resize_nearest(w, h, px, max_dim)
                feats.append(_pixel_features(tw, th, out))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [
                        len(b) if b is not None else 0
                        for b in pdf["media"]
                    ],
                    "features": feats,
                }
            )

    return assets.select("asset_id", "media").mapInPandas(
        run, FEATURES_SCHEMA
    )


DECIMATED_AUDIO_SCHEMA = (
    "asset_id BIGINT, channels INT, sample_rate INT, new_rate INT, "
    "kept_frames BIGINT, rms DOUBLE, abs_mean DOUBLE, "
    "first_s DOUBLE, last_s DOUBLE"
)


def decimated_audio_features(
    assets: DataFrame, factor: int = 3
) -> DataFrame:
    """The EXECUTED audio downsampling: integer decimation (keep every
    ``factor``-th FRAME, all channels — the resample path that needs no
    filter arithmetic and stays bit-exact), then waveform statistics
    over the kept samples. Exact-integer accumulation before one float
    division per statistic, so every row replays from the fixture's
    md5-derived samples. One Arrow mapInPandas kernel, output one
    narrow row per asset."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "channels": [], "sample_rate": [],
                "new_rate": [], "kept_frames": [], "rms": [],
                "abs_mean": [], "first_s": [], "last_s": [],
            }
            for aid, b in zip(pdf["asset_id"], pdf["media"]):
                if b is None:
                    continue
                ch, rate, samples = _wav_parse(bytes(b))
                frames = len(samples) // ch
                kept = [
                    samples[f * ch + c]
                    for f in range(0, frames, factor)
                    for c in range(ch)
                ]
                n = len(kept)
                s2 = sum(x * x for x in kept)
                sabs = sum(abs(x) for x in kept)
                out["asset_id"].append(aid)
                out["channels"].append(ch)
                out["sample_rate"].append(rate)
                out["new_rate"].append(rate // factor)
                out["kept_frames"].append(n // ch)
                out["rms"].append(math.sqrt(s2 / n) / 32768.0)
                out["abs_mean"].append(sabs / n / 32768.0)
                out["first_s"].append(kept[0] / 32768.0)
                out["last_s"].append(kept[-1] / 32768.0)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, DECIMATED_AUDIO_SCHEMA
    )


FRAME_FEATURES_SCHEMA = (
    "asset_id BIGINT, frame_idx INT, frame_ts_ms BIGINT, "
    "mean_gray DOUBLE, first_gray DOUBLE, last_gray DOUBLE, n_px BIGINT"
)


def sampled_frame_features(
    assets: DataFrame, every_n: int = 2
) -> DataFrame:
    """The EXECUTED frame sampling — the byte-touching stage
    :func:`frame_sample_plan` only costs: decode the AVI container,
    keep every ``every_n``-th frame, and emit ONE ROW PER SAMPLED FRAME
    with its timestamp and gray statistics (the clip-level features
    collapse the temporal axis; training pipelines want the per-frame
    fan-out). All statistics are exact-integer sums before one final
    float division, so the rows are oracle-replayable from the
    fixture's per-frame md5 pixel formula.

    Scale shape: one Arrow mapInPandas kernel per asset batch, fan-out
    bounded by the sampled frame count — the plan's n_frames is the
    exact cardinality contract for this stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "frame_idx": [], "frame_ts_ms": [],
                "mean_gray": [], "first_gray": [], "last_gray": [],
                "n_px": [],
            }
            for aid, b in zip(pdf["asset_id"], pdf["media"]):
                if b is None:
                    continue
                w, h, usec, per_frame = _avi_parse(bytes(b))
                npx = w * h
                for f in range(0, len(per_frame), every_n):
                    grays = per_frame[f]
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(f)
                    out["frame_ts_ms"].append(f * usec // 1000)
                    out["mean_gray"].append(sum(grays) / npx / 765.0)
                    out["first_gray"].append(grays[0] / 765.0)
                    out["last_gray"].append(grays[-1] / 765.0)
                    out["n_px"].append(npx)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, FRAME_FEATURES_SCHEMA
    )


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (asset, frame_ts) the decode
    stage would extract — metadata-only, no bytes touched, so the expensive
    stage's fan-out is known (and costable) before any decoding."""
    return (
        assets.filter(F.col("duration_ms").isNotNull())
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def resize_targets(
    assets: DataFrame, max_dim: int = 224
) -> DataFrame:
    """Resize *planning* (aspect-preserving fit into max_dim×max_dim):
    target dimensions are pure JVM arithmetic over the metadata columns —
    no bytes touched, no Python. The pixel work itself belongs in the
    decode kernel (``extract_features``); planning separately lets the
    expensive stage be filtered/costed first (e.g. skip assets already
    small enough)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest(F.col("width"), F.col("height")),
    )

    # explicit HALF-UP via floor(x + 0.5): engines disagree on round(DOUBLE)
    # midpoint direction, floor does not — keeps the plan oracle-replayable
    def half_up(c):
        return F.floor(c + F.lit(0.5)).cast("int")

    return assets.filter(
        F.col("width").isNotNull() & F.col("height").isNotNull()
    ).select(
        "asset_id",
        "width",
        "height",
        F.greatest(half_up(F.col("width") * scale), F.lit(1)).alias(
            "target_width"
        ),
        F.greatest(half_up(F.col("height") * scale), F.lit(1)).alias(
            "target_height"
        ),
        (scale < 1.0).alias("needs_resize"),
    )


def shard_packing_plan(
    assets: DataFrame,
    budget_bytes: int,
    id_col: str = "asset_id",
    bytes_col: str = "n_bytes",
    seed: int = 13,
    num_partitions: int = 32,
) -> DataFrame:
    """WebDataset-style shard packing *plan*: assets are laid out in a
    deterministic PRF order and packed CONTIGUOUSLY into byte-budgeted
    shards — ``shard = floor(bytes_before_me / budget)``, so an asset that
    straddles a budget boundary belongs to the shard where it started
    (streaming first-fit, same contract as ``textops.pack_sequences``).
    Metadata-only: the plan costs one prefix sum over (id, n_bytes); the
    byte-moving write stage consumes it afterwards, already knowing every
    shard's exact membership and size.

    Scale shape: the global PRF-ordered running sum is a DISTRIBUTED
    prefix sum (``relational.partitioned_prefix_sum``: range-partitioned
    slices + broadcast slice offsets), NOT a single-partition window — so
    the GLOBAL contiguous packing semantics survive unchanged at any asset
    count; ``num_partitions`` bounds the per-task sort. This supersedes
    the earlier super-shard design (which bounded the window by giving up
    cross-super-shard contiguity): exact byte sums make the distributed
    prefix bit-identical to the sequential layout, so no semantics trade
    is needed. The per-shard ``pos`` window is partitioned by shard —
    bounded by budget/min-asset-size rows per partition.
    """
    from bigdata_capstone_spark.functions.portable import salted_md5_long
    from bigdata_capstone_spark.operators.relational import (
        partitioned_prefix_sum,
    )
    from pyspark.sql.window import Window

    h = salted_md5_long(F.col(id_col).cast("string"), seed)
    packed = partitioned_prefix_sum(
        assets.withColumn("__h", h),
        [F.col("__h"), F.col(id_col)],
        F.col(bytes_col).cast("long"),
        "__before",
        num_partitions=num_partitions,
        inclusive=False,
    ).withColumn(
        "shard", F.floor(F.col("__before") / budget_bytes).cast("int")
    )
    pos = Window.partitionBy("shard").orderBy("__h", id_col)
    return packed.withColumn(
        "pos", F.row_number().over(pos).cast("int")
    ).select(id_col, "shard", "pos", bytes_col)


def synthetic_ppm_pair_assets(
    spark: SparkSession, n: int = 16, seed: int = 42
) -> DataFrame:
    """Near-duplicate image fixture for perceptual-hash dedup: asset
    i >= n/2 carries the SAME md5-derived pixels as asset i - n/2 with
    every channel's least-significant bit flipped (XOR 1) — the
    re-encode/requantize-grade perturbation a perceptual hash must see
    through (gray shifts by at most 3 of 765 per pixel) while md5/exact
    dedup goes blind. Dims 11-13 x 9-10 so the dHash resize is a real
    downscale. Deterministic: pixel p of asset i is
    md5("{seed}:{base}:{p}")[:3] (base = i mod n/2), XOR 1 iff
    i >= n/2 — replayable in SQL."""
    rows = []
    half = n // 2
    for i in range(n):
        base = i % half
        w, h = 11 + base % 3, 9 + base % 2
        raster = bytearray()
        for p in range(w * h):
            r, g, b = hashlib.md5(f"{seed}:{base}:{p}".encode()).digest()[:3]
            if i >= half:
                r, g, b = r ^ 1, g ^ 1, b ^ 1
            raster += bytes((r, g, b))
        blob = f"P6\n{w} {h}\n255\n".encode() + bytes(raster)
        rows.append(
            (i, bytearray(blob), "image/x-portable-pixmap", w, h, None)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


DHASH_SCHEMA = "asset_id BIGINT, dhash BIGINT"


def image_dhash(
    assets: DataFrame, hash_w: int = 8, hash_h: int = 7
) -> DataFrame:
    """Perceptual difference-hash per image: decode, nearest-neighbor
    resize to (hash_w+1) x hash_h, grayscale as the INTEGER channel sum
    (no /3 float), bit (x, y) = 1 iff gray(x+1, y) > gray(x, y), packed
    row-major into a BIGINT. The default 8x7 = 56 bits keeps the hash
    inside a signed 64-bit lane in every engine (a 64-bit dHash would
    overflow BIGINT sign in both Spark and the SQL oracle).

    Everything after decode is exact integer arithmetic with the same
    floor-mapping as the executed resize (src = (t*src_dim)//tgt_dim),
    so the hash replays bit-for-bit from the fixture's generative
    formula. One Arrow mapInPandas kernel, one narrow row per asset;
    downstream near-dup joins see only (id, 56-bit hash) — the
    digest-only shuffle discipline of the text dedup family applied to
    pixels."""
    tw, th = hash_w + 1, hash_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, b in zip(pdf["asset_id"], pdf["media"]):
                if b is None:
                    continue
                w, h, px = _ppm_pixels(bytes(b))
                gray = [
                    [
                        sum(px[((y * h) // th) * w + (x * w) // tw])
                        for x in range(tw)
                    ]
                    for y in range(th)
                ]
                v = 0
                for y in range(hash_h):
                    for x in range(hash_w):
                        if gray[y][x + 1] > gray[y][x]:
                            v |= 1 << (y * hash_w + x)
                ids.append(aid)
                hashes.append(v)
            yield pd.DataFrame({"asset_id": ids, "dhash": hashes})

    return assets.select("asset_id", "media").mapInPandas(run, DHASH_SCHEMA)


AUDIO_WINDOW_SCHEMA = (
    "asset_id BIGINT, win_idx INT, start_frame INT, "
    "n_samples INT, sum_sq BIGINT"
)


def audio_window_energy(
    assets: DataFrame, window_frames: int = 16
) -> DataFrame:
    """Decode stage of energy-based audio segmentation: one row per
    NON-OVERLAPPING ``window_frames`` window with its exact integer
    energy (sum of squared int16 samples, all channels; the trailing
    partial window keeps its own n_samples). DELIBERATELY ends here —
    thresholding and run-grouping are relational work that belongs
    JVM-side (:func:`audio_energy_segments`), so the Python boundary
    stays decode-only and the windows frame (a few rows per asset) is
    what shuffles, never samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "win_idx": [], "start_frame": [],
                "n_samples": [], "sum_sq": [],
            }
            for aid, b in zip(pdf["asset_id"], pdf["media"]):
                if b is None:
                    continue
                ch, _rate, samples = _wav_parse(bytes(b))
                frames = len(samples) // ch
                for w in range((frames + window_frames - 1) // window_frames):
                    fs = w * window_frames
                    fe = min(fs + window_frames, frames)
                    vals = [
                        samples[f * ch + c]
                        for f in range(fs, fe)
                        for c in range(ch)
                    ]
                    out["asset_id"].append(aid)
                    out["win_idx"].append(w)
                    out["start_frame"].append(fs)
                    out["n_samples"].append(len(vals))
                    out["sum_sq"].append(sum(v * v for v in vals))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, AUDIO_WINDOW_SCHEMA
    )


def audio_energy_segments(
    windows: DataFrame, threshold: int = 357_000_000
) -> DataFrame:
    """VAD-style active segments from per-window energies: a window is
    ACTIVE when its mean square per sample >= ``threshold``, tested as
    the integer cross-multiply sum_sq >= threshold * n_samples (no
    float in the decision); consecutive active windows fuse into one
    segment via gaps-and-islands (win_idx − row_number). Returns one
    row per segment: (asset_id, start_win, end_win, n_windows,
    start_frame, n_samples, sum_sq, rms_r).

    Scale shape: pure DataFrame work over the window frame (a few rows
    per asset); the one window function partitions by asset_id, whose
    width is duration-bounded. The only float is the reported rms,
    rounded 6 dp from exact integers."""
    from pyspark.sql.window import Window

    # LONG cross-multiply: threshold * n_samples overflows INT lanes
    act = windows.filter(
        F.col("sum_sq")
        >= F.lit(threshold).cast("long") * F.col("n_samples").cast("long")
    )
    w = Window.partitionBy("asset_id").orderBy("win_idx")
    return (
        act.withColumn("__g", F.col("win_idx") - F.row_number().over(w))
        .groupBy("asset_id", "__g")
        .agg(
            F.min("win_idx").alias("start_win"),
            F.max("win_idx").alias("end_win"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
            F.min("start_frame").alias("start_frame"),
            F.sum("n_samples").cast("long").alias("n_samples"),
            F.sum("sum_sq").alias("sum_sq"),
        )
        .select(
            "asset_id", "start_win", "end_win", "n_windows",
            "start_frame", "n_samples", "sum_sq",
            F.round(
                F.sqrt(F.col("sum_sq") / F.col("n_samples")) / 32768.0, 6
            ).alias("rms_r"),
        )
    )


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF container METADATA (ISO/IEC 14496-12 box walk) — decode-
# free. The strict decoders above honestly refuse compressed codecs
# (H.264/HEVC/AAC payloads need real codec libraries); what multimodal
# curation filters on BEFORE any decode is the container metadata:
# duration, track geometry, codec fourcc, language. A box walk needs no
# codec — only the length-prefixed box grammar — so it belongs in the
# pure-Python kernel family with full fixture-replay oracles.
# ---------------------------------------------------------------------------

MP4_META_SCHEMA = (
    "asset_id BIGINT, major_brand STRING, mvhd_timescale INT, "
    "mvhd_duration_ms BIGINT, track_id INT, handler STRING, codec STRING, "
    "timescale INT, duration_ms BIGINT, width INT, height INT, lang STRING"
)


def _mp4_boxes(buf: bytes, start: int = 0, end: int | None = None):
    """Iterate (type, body_start, body_end) over a box sequence,
    honoring 64-bit largesize (size==1) and size==0 (box extends to end
    of enclosure, ISO 14496-12 §4.2). Raises on truncation — a half
    box is a corrupt container, not a silent stop."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated ISO-BMFF box header")
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if pos + size > end or size < body - pos:
            raise ValueError("ISO-BMFF box overruns its enclosure")
        yield btype, body, pos + size
        pos += size


def _mp4_child(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _mp4_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def _fullbox_version(data: bytes, body: int, btype: str) -> int:
    """Version byte of a FullBox body. mvhd/tkhd/mdhd exist in version 0
    (32-bit times) and version 1 (64-bit creation/modification/duration
    — the layout real muxers emit for long recordings); anything else is
    a spec violation and raises, matching the walk's raise-on-corruption
    contract (ADVICE r8: v1 silently parsed at v0 offsets yields garbage
    durations/track ids)."""
    v = data[body]
    if v not in (0, 1):
        raise ValueError(f"unsupported {btype} box version {v}")
    return v


def _mp4_metadata(data: bytes) -> list[dict]:
    """One dict per track: the decode-free curation fields. Box ORDER is
    not assumed (streaming layouts put moov after mdat); unknown boxes
    (free/skip/mdat/udta/...) are skipped by the grammar itself. Both
    FullBox versions of mvhd/tkhd/mdhd are parsed (v0 32-bit times, v1
    64-bit times per ISO 14496-12); an unknown version raises."""
    top = {t: (s, e) for t, s, e in _mp4_boxes(data)}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("not an ISO-BMFF file (missing ftyp/moov)")
    fs, _fe = top[b"ftyp"]
    brand = data[fs : fs + 4].decode("ascii", "replace")
    ms, me = top[b"moov"]
    mv = _mp4_child(data, ms, me, b"mvhd")
    if mv is None:
        raise ValueError("moov has no mvhd")
    s, _ = mv
    if _fullbox_version(data, s, "mvhd") == 0:
        mv_ts = int.from_bytes(data[s + 12 : s + 16], "big")
        mv_dur = int.from_bytes(data[s + 16 : s + 20], "big")
    else:  # v1: creation(8) modification(8) timescale(4) duration(8)
        mv_ts = int.from_bytes(data[s + 20 : s + 24], "big")
        mv_dur = int.from_bytes(data[s + 24 : s + 32], "big")
    rows = []
    for t, ts_, te in _mp4_boxes(data, ms, me):
        if t != b"trak":
            continue
        tk = _mp4_child(data, ts_, te, b"tkhd")
        md = _mp4_child(data, ts_, te, b"mdia")
        if tk is None or md is None:
            raise ValueError("trak missing tkhd/mdia")
        ks, _ = tk
        if _fullbox_version(data, ks, "tkhd") == 0:
            track_id = int.from_bytes(data[ks + 12 : ks + 16], "big")
            geo = ks + 76
        else:  # v1: creation(8) mod(8) id(4) res(4) duration(8) → +12
            track_id = int.from_bytes(data[ks + 20 : ks + 24], "big")
            geo = ks + 88
        width = int.from_bytes(data[geo : geo + 4], "big") >> 16
        height = int.from_bytes(data[geo + 4 : geo + 8], "big") >> 16
        mh = _mp4_child(data, *md, b"mdhd")
        hd = _mp4_child(data, *md, b"hdlr")
        mi = _mp4_child(data, *md, b"minf")
        if mh is None or hd is None or mi is None:
            raise ValueError("mdia missing mdhd/hdlr/minf")
        hs, _ = mh
        if _fullbox_version(data, hs, "mdhd") == 0:
            ts = int.from_bytes(data[hs + 12 : hs + 16], "big")
            dur = int.from_bytes(data[hs + 16 : hs + 20], "big")
            packed = int.from_bytes(data[hs + 20 : hs + 22], "big")
        else:  # v1: creation(8) mod(8) timescale(4) duration(8) lang(2)
            ts = int.from_bytes(data[hs + 20 : hs + 24], "big")
            dur = int.from_bytes(data[hs + 24 : hs + 32], "big")
            packed = int.from_bytes(data[hs + 32 : hs + 34], "big")
        lang = "".join(
            chr(0x60 + ((packed >> sh) & 0x1F)) for sh in (10, 5, 0)
        )
        ds, _ = hd
        handler = data[ds + 8 : ds + 12].decode("ascii", "replace")
        sb = _mp4_child(data, *mi, b"stbl")
        if sb is None:
            raise ValueError("minf missing stbl")
        sd = _mp4_child(data, *sb, b"stsd")
        if sd is None:
            raise ValueError("stbl missing stsd")
        ss, _ = sd
        # stsd: vf(4) + entry_count(4) + first entry (size(4) + fourcc(4))
        codec = data[ss + 12 : ss + 16].decode("ascii", "replace")
        rows.append(
            {
                "major_brand": brand,
                "mvhd_timescale": mv_ts,
                "mvhd_duration_ms": mv_dur * 1000 // mv_ts,
                "track_id": track_id,
                "handler": handler,
                "codec": codec,
                "timescale": ts,
                "duration_ms": dur * 1000 // ts,
                "width": width,
                "height": height,
                "lang": lang,
            }
        )
    return rows


def _mp4_box(btype: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return (
            (1).to_bytes(4, "big")
            + btype
            + (16 + len(body)).to_bytes(8, "big")
            + body
        )
    return (8 + len(body)).to_bytes(4, "big") + btype + body


def synthetic_mp4_assets(
    spark: SparkSession, n: int = 8, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL minimal ISO-BMFF files with
    deterministic metadata derived from the asset index (ms = 1200 +
    100*i, geometry 160+16*i x 90+9*i, codec cycling avc1/hev1/vp09,
    audio language cycling eng/deu/fra) — every field the box walk
    extracts is a closed-form function of i, so a DuckDB oracle
    re-derives the expected table without parsing bytes.

    Adversarial orderings baked in: odd assets use the streaming layout
    (moov AFTER mdat, with a free box in between); i % 3 == 0 assets
    carry an unknown 'skip' box INSIDE moov; i % 4 == 0 assets write
    mdat with a 64-bit largesize header. mdat payloads are md5-derived
    junk the walk must never read."""

    def u32(v: int) -> bytes:
        return v.to_bytes(4, "big")

    def u16(v: int) -> bytes:
        return v.to_bytes(2, "big")

    def fixed1616(v: int) -> bytes:
        return u32(v << 16)

    def lang_pack(lang: str) -> bytes:
        c1, c2, c3 = (ord(c) - 0x60 for c in lang)
        return u16((c1 << 10) | (c2 << 5) | c3)

    matrix = b"".join(
        u32(x) for x in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    )

    def trak(
        track_id: int, handler: bytes, codec: bytes, w: int, h: int,
        ts: int, dur: int, lang: str,
    ) -> bytes:
        tkhd = _mp4_box(
            b"tkhd",
            u32(7) + u32(0) + u32(0) + u32(track_id) + u32(0) + u32(0)
            + b"\x00" * 8 + u16(0) + u16(0) + u16(0) + u16(0) + matrix
            + fixed1616(w) + fixed1616(h),
        )
        mdhd = _mp4_box(
            b"mdhd",
            u32(0) + u32(0) + u32(0) + u32(ts) + u32(dur)
            + lang_pack(lang) + u16(0),
        )
        hdlr = _mp4_box(
            b"hdlr", u32(0) + u32(0) + handler + b"\x00" * 12 + b"x\x00"
        )
        entry_body = b"\x00" * 6 + u16(1) + b"\x00" * 16 + u16(w) + u16(h)
        entry = (8 + len(entry_body)).to_bytes(4, "big") + codec + entry_body
        stsd = _mp4_box(b"stsd", u32(0) + u32(1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        return _mp4_box(b"trak", tkhd + mdia)

    video_codecs = [b"avc1", b"hev1", b"vp09"]
    audio_langs = ["eng", "deu", "fra"]
    rows = []
    for i in range(n):
        ms_dur = 1200 + 100 * i
        w, h = 160 + 16 * i, 90 + 9 * i
        mvhd = _mp4_box(
            b"mvhd",
            u32(0) + u32(0) + u32(0) + u32(1000) + u32(ms_dur)
            + u32(0x10000) + u16(0x0100) + u16(0) + b"\x00" * 8 + matrix
            + b"\x00" * 24 + u32(3),
        )
        traks = trak(
            1, b"vide", video_codecs[i % 3], w, h, 90000, ms_dur * 90, "und"
        )
        if i % 2 == 1:
            traks += trak(
                2, b"soun", b"mp4a", 0, 0, 48000, ms_dur * 48,
                audio_langs[i % 3],
            )
        moov_body = mvhd + traks
        if i % 3 == 0:
            moov_body += _mp4_box(b"skip", b"ignore me")
        moov = _mp4_box(b"moov", moov_body)
        junk = b"".join(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            for j in range(4 + i)
        )
        mdat = _mp4_box(b"mdat", junk, large=(i % 4 == 0))
        ftyp = _mp4_box(b"ftyp", b"isom" + u32(0x200) + b"isomiso2avc1mp41")
        if i % 2 == 1:  # streaming layout: moov after mdat
            blob = ftyp + _mp4_box(b"free", b"\x00" * 8) + mdat + moov
        else:
            blob = ftyp + moov + mdat
        rows.append(
            (i, bytearray(blob), "video/mp4", w, h, ms_dur)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def mp4_container_metadata(assets: DataFrame) -> DataFrame:
    """Decode-free ISO-BMFF metadata walk via Arrow mapInPandas: one row
    per track — (major_brand, mvhd duration, track id, handler, codec
    fourcc, media timescale, duration, geometry, language). These are
    the fields a multimodal curation filter reads BEFORE deciding to
    decode anything (codec allowlists, duration/geometry gates, language
    routing); at 100 TB the walk touches a few hundred header bytes per
    asset while mdat (the overwhelming payload mass) is skipped by the
    box grammar — bytes stay in Arrow buffers, one kernel call per
    batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "asset_id", "major_brand", "mvhd_timescale",
                "mvhd_duration_ms", "track_id", "handler", "codec",
                "timescale", "duration_ms", "width", "height", "lang",
            )}
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                for row in _mp4_metadata(bytes(blob)):
                    out["asset_id"].append(aid)
                    for k, v in row.items():
                        out[k].append(v)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, MP4_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# JPEG JFIF / EXIF tag walk — the still-image sibling of the MP4 box
# walk: decode-free header metadata (density, orientation, camera
# make/model, capture time, geometry) read from APP0/APP1/SOF segments
# without touching entropy-coded data. EXIF's TIFF IFD comes in BOTH
# byte orders in the wild (II little / MM big) — the walk handles both.
# ---------------------------------------------------------------------------

JPEG_META_SCHEMA = (
    "asset_id BIGINT, jfif_version STRING, density_units INT, "
    "x_density INT, y_density INT, byte_order STRING, make STRING, "
    "model STRING, orientation INT, datetime STRING, width INT, "
    "height INT"
)

_EXIF_TAGS = {0x010F: "make", 0x0110: "model",
              0x0112: "orientation", 0x0132: "datetime"}


def _exif_ifd0(tiff: bytes) -> dict:
    """Parse IFD0 of an EXIF TIFF blob (both byte orders). ASCII values
    beyond the 4 inline bytes follow the offset; trailing NUL stripped.
    Returns {name: value} for the curation tags (make, model,
    orientation, datetime) plus 'byte_order'."""
    if tiff[:2] == b"II":
        bo = "little"
    elif tiff[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("EXIF TIFF header has unknown byte order")

    def u(b: bytes) -> int:
        return int.from_bytes(b, bo)

    if u(tiff[2:4]) != 42:
        raise ValueError("EXIF TIFF magic != 42")
    ifd = u(tiff[4:8])
    if ifd + 2 > len(tiff):
        raise ValueError("truncated EXIF IFD0")
    n = u(tiff[ifd : ifd + 2])
    out: dict = {"byte_order": "II" if bo == "little" else "MM"}
    for e in range(n):
        off = ifd + 2 + 12 * e
        ent = tiff[off : off + 12]
        if len(ent) < 12:
            raise ValueError("truncated EXIF IFD entry")
        tag, typ, cnt = u(ent[0:2]), u(ent[2:4]), u(ent[4:8])
        name = _EXIF_TAGS.get(tag)
        if name is None:
            continue
        if typ == 2:  # ASCII
            size = cnt
            if size <= 4:
                raw = ent[8 : 8 + size]
            else:
                p = u(ent[8:12])
                if p + size > len(tiff):
                    raise ValueError("EXIF ASCII value overruns TIFF blob")
                raw = tiff[p : p + size]
            out[name] = raw.rstrip(b"\x00").decode("ascii", "replace")
        elif typ == 3:  # SHORT
            out[name] = u(ent[8:10])
    return out


def _jpeg_header_metadata(data: bytes) -> dict:
    """Walk JPEG marker segments up to SOS/EOI collecting JFIF (APP0),
    EXIF (APP1) and frame geometry (SOFn) — no entropy-coded byte is
    read. Raises on truncation or a missing SOI, honest like the strict
    decoders; absent optional segments yield None fields."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    out = {
        "jfif_version": None, "density_units": None,
        "x_density": None, "y_density": None, "byte_order": None,
        "make": None, "model": None, "orientation": None,
        "datetime": None, "width": None, "height": None,
    }
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: header region over
            return out
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG segment header")
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xE0 and body[:5] == b"JFIF\x00":
            out["jfif_version"] = f"{body[5]}.{body[6]:02d}"
            out["density_units"] = body[7]
            out["x_density"] = int.from_bytes(body[8:10], "big")
            out["y_density"] = int.from_bytes(body[10:12], "big")
        elif marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            out.update(_exif_ifd0(body[6:]))
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            out["height"] = int.from_bytes(body[1:3], "big")
            out["width"] = int.from_bytes(body[3:5], "big")
        pos += 2 + seg_len
    raise ValueError("JPEG ended without SOS/EOI")


def synthetic_jpeg_exif_assets(
    spark: SparkSession, n: int = 8, seed: int = 42
) -> DataFrame:
    """JPEG headers with JFIF + EXIF segments whose every field is a
    closed-form function of the asset index: density (72+2i, 96+3i),
    orientation 1+(i%8), make/model/datetime strings, geometry
    (32+8i x 24+6i) — and the EXIF byte order ALTERNATES II/MM so both
    endiannesses are exercised. Long ASCII values spill past the 4
    inline entry bytes into offset storage (the other layout branch).
    No scan data: the walk's whole point is reading curation fields
    without decoding."""
    rows = []
    for i in range(n):
        bo = "little" if i % 2 == 0 else "big"

        def u16(v, bo=None, _bo_default=bo):
            return v.to_bytes(2, bo or _bo_default)

        def u32(v, bo=None, _bo_default=bo):
            return v.to_bytes(4, bo or _bo_default)

        make = f"maker{i % 3}"  # <= 6 chars + NUL -> offset storage
        model = f"m{i}"  # short enough to inline when <= 3 chars + NUL
        dt = f"2024:01:{2 + i:02d} 10:00:00"
        # IFD0 with 4 entries; ASCII values longer than 4 bytes live
        # after the entry table
        entries = []
        tail = b""
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * 4 + 4
        for tag, typ, val in (
            (0x010F, 2, make.encode() + b"\x00"),
            (0x0110, 2, model.encode() + b"\x00"),
            (0x0112, 3, 1 + (i % 8)),
            (0x0132, 2, dt.encode() + b"\x00"),
        ):
            if typ == 2:
                cnt = len(val)
                if cnt <= 4:
                    inline = val + b"\x00" * (4 - cnt)
                else:
                    inline = u32(data_off + len(tail))
                    tail += val
                entries.append(u16(tag) + u16(typ) + u32(cnt) + inline)
            else:
                entries.append(
                    u16(tag) + u16(typ) + u32(1) + u16(val) + b"\x00\x00"
                )
        tiff = (
            (b"II" if bo == "little" else b"MM")
            + u16(42)
            + u32(ifd_off)
            + u16(4)
            + b"".join(entries)
            + u32(0)  # next-IFD pointer
            + tail
        )
        exif = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + (2 + len(exif)).to_bytes(2, "big") + exif
        jfif = (
            b"JFIF\x00\x01\x02"
            + bytes([1])
            + (72 + 2 * i).to_bytes(2, "big")
            + (96 + 3 * i).to_bytes(2, "big")
            + b"\x00\x00"
        )
        app0 = b"\xff\xe0" + (2 + len(jfif)).to_bytes(2, "big") + jfif
        w, h = 32 + 8 * i, 24 + 6 * i
        sof_body = (
            bytes([8])
            + h.to_bytes(2, "big")
            + w.to_bytes(2, "big")
            + bytes([1, 1, 0x11, 0])
        )
        sof = b"\xff\xc0" + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
        blob = b"\xff\xd8" + app0 + app1 + sof + b"\xff\xd9"
        rows.append((i, bytearray(blob), "image/jpeg", w, h, None))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def jpeg_header_metadata(assets: DataFrame) -> DataFrame:
    """Decode-free JPEG JFIF/EXIF metadata via Arrow mapInPandas — the
    still-image curation fields (orientation for rotation-normalizing,
    capture time and camera for provenance filters, density and
    geometry gates) read from header segments only; entropy-coded data
    is never touched, so cost per asset is tens of header bytes
    regardless of image size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "jfif_version", "density_units", "x_density", "y_density",
            "byte_order", "make", "model", "orientation", "datetime",
            "width", "height",
        )
        for pdf in batches:
            out = {"asset_id": []}
            out.update({c: [] for c in cols})
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                meta = _jpeg_header_metadata(bytes(blob))
                out["asset_id"].append(aid)
                for c in cols:
                    out[c].append(meta[c])
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, JPEG_META_SCHEMA
    )


# ---------------------------------------------------------------------------
# PDF document-metadata walk — the third decode-free metadata family
# (r9 verdict Missing #4), beside the ISO-BMFF box walk and the JPEG
# JFIF/EXIF tag walk: header version, classic cross-reference table(s)
# including incremental-update /Prev chains, trailer, page tree count,
# first-page geometry, and the /Info provenance fields — everything a
# crawl-curation filter reads from the other dominant document asset
# class WITHOUT a renderer. Content streams (the payload mass) are
# located by the xref but never read. Honest-refusal boundaries match
# the strict decoders: cross-reference STREAMS (PDF 1.5 compressed
# xref, which would require FlateDecode + object-stream parsing) and
# escaped/hex string syntax raise rather than guess.
# ---------------------------------------------------------------------------

PDF_META_SCHEMA = (
    "asset_id BIGINT, version STRING, n_objects INT, page_count INT, "
    "media_w INT, media_h INT, producer STRING, title STRING, "
    "creation_date STRING, n_updates INT"
)

import re as _re  # noqa: E402  (module-local alias, stdlib)

_PDF_REF = rb"(\d+)\s+\d+\s+R"


def _pdf_dict_body(data: bytes, pos: int) -> tuple[bytes, int]:
    """Bytes inside the << >> starting at ``pos`` (nesting-aware) and
    the index just past the closing >>. Raises on an unterminated
    dictionary — a truncated trailer is corruption, not a silent
    default."""
    if data[pos : pos + 2] != b"<<":
        raise ValueError("expected dictionary at offset %d" % pos)
    depth, i = 0, pos
    n = len(data)
    while i < n:
        two = data[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[pos + 2 : i - 2], i
        else:
            i += 1
    raise ValueError("unterminated PDF dictionary")


def _pdf_key_ref(d: bytes, key: bytes) -> int | None:
    m = _re.search(_re.escape(key) + rb"\s+" + _PDF_REF, d)
    return int(m.group(1)) if m else None


def _pdf_key_int(d: bytes, key: bytes) -> int | None:
    m = _re.search(_re.escape(key) + rb"\s+(\d+)", d)
    return int(m.group(1)) if m else None


def _pdf_key_str(d: bytes, key: bytes) -> str | None:
    """Literal-string value of ``key``. The walk reads provenance
    fields only; escaped (backslash) and hex <...> strings raise —
    the honest boundary of a renderer-free parser, same contract as
    the unsupported-codec raises in the decoders."""
    m = _re.search(_re.escape(key) + rb"\s*(.)", d)
    if m is None:
        return None
    if m.group(1) == b"<":
        raise ValueError(f"hex string value for {key.decode()} unsupported")
    m = _re.search(_re.escape(key) + rb"\s*\(([^()]*)\)", d)
    if m is None:
        raise ValueError(f"unparseable string value for {key.decode()}")
    if b"\\" in m.group(1):
        raise ValueError(
            f"escaped string value for {key.decode()} unsupported"
        )
    return m.group(1).decode("latin-1")


def _pdf_object_dict(data: bytes, offsets: dict[int, int], num: int) -> bytes:
    if num not in offsets:
        raise ValueError(f"object {num} missing from xref")
    pos = offsets[num]
    m = _re.match(rb"(\d+)\s+(\d+)\s+obj\b", data[pos : pos + 64])
    if m is None or int(m.group(1)) != num:
        raise ValueError(f"xref offset for object {num} is wrong")
    start = data.index(b"<<", pos)
    body, _end = _pdf_dict_body(data, start)
    return body


def _pdf_xref_walk(data: bytes) -> tuple[dict[int, int], bytes, int]:
    """Header check + startxref -> classic xref table(s) + trailer(s)
    through the /Prev incremental-update chain (newest section wins
    per object, per spec). Returns (object offsets, newest trailer
    dict body, number of xref sections). Raises on: missing
    header/startxref/EOF, cross-reference streams (PDF 1.5 compressed
    xref), malformed entries. Shared by the metadata walk and the
    text-extraction kernel."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    tail = data.rfind(b"startxref")
    if tail < 0 or b"%%EOF" not in data[tail:]:
        raise ValueError("missing startxref/%%EOF tail")
    xref_pos = int(data[tail + 9 : data.index(b"%%EOF", tail)].strip())

    offsets: dict[int, int] = {}
    trailer0: bytes | None = None
    n_sections = 0
    while True:
        n_sections += 1
        if data[xref_pos : xref_pos + 4] != b"xref":
            raise ValueError(
                "cross-reference stream unsupported (decode-free walk "
                "reads classic xref tables only)"
            )
        pos = xref_pos + 4
        while data[pos : pos + 1] in (b"\r", b"\n", b" "):
            pos += 1
        while not data[pos : pos + 7] == b"trailer":
            m = _re.match(rb"(\d+)\s+(\d+)\s*[\r\n]+", data[pos : pos + 32])
            if m is None:
                raise ValueError("malformed xref subsection header")
            first, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            for j in range(count):
                ent = data[pos : pos + 20]
                em = _re.match(rb"(\d{10}) (\d{5}) ([nf])", ent)
                if em is None:
                    raise ValueError("malformed 20-byte xref entry")
                # newest section wins: never overwrite an entry already
                # claimed by a NEWER xref (we walk newest -> oldest)
                if em.group(3) == b"n" and (first + j) not in offsets:
                    offsets[first + j] = int(em.group(1))
                pos += 20
            while data[pos : pos + 1] in (b"\r", b"\n", b" "):
                pos += 1
        tb, _ = _pdf_dict_body(data, data.index(b"<<", pos))
        if trailer0 is None:
            trailer0 = tb
        prev = _pdf_key_int(tb, b"/Prev")
        if prev is None:
            break
        xref_pos = prev
    return offsets, trailer0, n_sections


def _pdf_metadata(data: bytes) -> dict:
    """Walk one PDF: header version -> xref/trailer chain
    (:func:`_pdf_xref_walk`) -> catalog -> page tree count +
    first-page MediaBox -> /Info provenance strings. Content streams
    are never read."""
    offsets, trailer0, n_sections = _pdf_xref_walk(data)
    version = data[5 : data.index(b"\n", 5)].strip().decode("ascii")

    size = _pdf_key_int(trailer0, b"/Size")
    root_ref = _pdf_key_ref(trailer0, b"/Root")
    info_ref = _pdf_key_ref(trailer0, b"/Info")
    if size is None or root_ref is None:
        raise ValueError("trailer missing /Size or /Root")
    cat = _pdf_object_dict(data, offsets, root_ref)
    pages_ref = _pdf_key_ref(cat, b"/Pages")
    if pages_ref is None:
        raise ValueError("catalog missing /Pages")
    pages = _pdf_object_dict(data, offsets, pages_ref)
    page_count = _pdf_key_int(pages, b"/Count")
    kids = _re.search(rb"/Kids\s*\[(.*?)\]", pages, _re.S)
    if page_count is None or kids is None:
        raise ValueError("page tree missing /Count or /Kids")
    first_kid = _re.search(_PDF_REF, kids.group(1))
    if first_kid is None:
        raise ValueError("empty /Kids array")
    page = _pdf_object_dict(data, offsets, int(first_kid.group(1)))
    mb = _re.search(
        rb"/MediaBox\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s+(\d+)\s*\]", page
    )
    if mb is None:
        raise ValueError("first page missing /MediaBox")
    media_w = int(mb.group(3)) - int(mb.group(1))
    media_h = int(mb.group(4)) - int(mb.group(2))
    producer = title = created = None
    if info_ref is not None:
        info = _pdf_object_dict(data, offsets, info_ref)
        producer = _pdf_key_str(info, b"/Producer")
        title = _pdf_key_str(info, b"/Title")
        created = _pdf_key_str(info, b"/CreationDate")
    return {
        "version": version,
        "n_objects": size,
        "page_count": page_count,
        "media_w": media_w,
        "media_h": media_h,
        "producer": producer,
        "title": title,
        "creation_date": created,
        "n_updates": n_sections - 1,
    }


def pdf_document_metadata(assets: DataFrame) -> DataFrame:
    """Decode-free PDF metadata via Arrow mapInPandas: one row per
    document — version, object count, page count, first-page geometry,
    producer / title / creation date, and how many incremental updates
    the file carries (a provenance signal: re-saved PDFs accrete
    update sections). At 100 TB the walk reads the header line, the
    xref/trailer tail, and a handful of dictionary objects — content
    streams, the payload mass, are never touched; bytes stay in Arrow
    buffers, one kernel call per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "version", "n_objects", "page_count", "media_w", "media_h",
            "producer", "title", "creation_date", "n_updates",
        )
        for pdf in batches:
            out = {"asset_id": []}
            out.update({c: [] for c in cols})
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                meta = _pdf_metadata(bytes(blob))
                out["asset_id"].append(aid)
                for c in cols:
                    out[c].append(meta[c])
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, PDF_META_SCHEMA
    )


def synthetic_pdf_assets(
    spark: SparkSession, n: int = 8, seed: int = 42
) -> DataFrame:
    """Asset table whose payloads are REAL minimal PDFs (classic xref
    tables, correct byte offsets) with closed-form metadata: version
    cycles 1.4/1.5/1.7, page count 1 + i%4, first-page MediaBox
    612+i x 792+2i, /Info producer 'prod'||i%3 / title 't'||i /
    creation date D:2024010(1+i%9)100000. ODD assets carry one
    INCREMENTAL UPDATE that supersedes the /Info object (producer ->
    'prodU'||i%3) via a second xref section with /Prev — the walk must
    follow the chain and let the newest section win. Content streams
    are md5-derived junk the walk must never parse."""
    rows = []
    for i in range(n):
        n_pages = 1 + i % 4
        w, h = 612 + i, 792 + 2 * i
        version = ["1.4", "1.5", "1.7"][i % 3]
        info_num = 3 + n_pages
        stream_num = 4 + n_pages
        size = 5 + n_pages
        junk = hashlib.md5(f"{seed}:pdf:{i}".encode()).digest() * 4

        buf = bytearray()
        offsets = {}

        def obj(num: int, body: bytes) -> None:
            offsets[num] = len(buf)
            buf.extend(b"%d 0 obj\n" % num)
            buf.extend(body)
            buf.extend(b"\nendobj\n")

        buf.extend(b"%%PDF-%s\n" % version.encode())
        buf.extend(b"%\xe2\xe3\xcf\xd3\n")  # binary-detection comment
        obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        kids = b" ".join(b"%d 0 R" % (3 + p) for p in range(n_pages))
        obj(
            2,
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages),
        )
        for p in range(n_pages):
            obj(
                3 + p,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] >>"
                % (w, h),
            )
        obj(
            info_num,
            b"<< /Producer (prod%d) /Title (t%d) "
            b"/CreationDate (D:2024010%d100000) >>"
            % (i % 3, i, 1 + i % 9),
        )
        obj(
            stream_num,
            b"<< /Length %d >>\nstream\n" % len(junk)
            + junk
            + b"\nendstream",
        )
        xref0 = len(buf)
        buf.extend(b"xref\n0 %d\n" % size)
        buf.extend(b"0000000000 65535 f \n")
        for num in range(1, size):
            buf.extend(b"%010d 00000 n \n" % offsets[num])
        buf.extend(
            b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (size, info_num, xref0)
        )
        if i % 2 == 1:
            # incremental update: new /Info generation supersedes the
            # original through a /Prev-chained xref section
            new_info = len(buf)
            buf.extend(b"%d 0 obj\n" % info_num)
            buf.extend(
                b"<< /Producer (prodU%d) /Title (t%d) "
                b"/CreationDate (D:2024010%d100000) >>"
                % (i % 3, i, 1 + i % 9)
            )
            buf.extend(b"\nendobj\n")
            xref1 = len(buf)
            buf.extend(b"xref\n%d 1\n" % info_num)
            buf.extend(b"%010d 00000 n \n" % new_info)
            buf.extend(
                b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R "
                b"/Prev %d >>\nstartxref\n%d\n%%%%EOF\n"
                % (size, info_num, xref0, xref1)
            )
        rows.append(
            (i, bytearray(bytes(buf)), "application/pdf", None, None, None)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


# ---------------------------------------------------------------------------
# PDF TEXT extraction — the step that makes PDFs CURATABLE: FlateDecode
# (zlib — the one compression this container genuinely ships, same as
# the PNG decoder) content streams are inflated and their text-showing
# operators (Tj, TJ) parsed in content order. Honest boundaries: any
# other /Filter raises, escaped/hex string syntax raises, and
# cross-reference streams raise in the shared xref walk.
# ---------------------------------------------------------------------------

PDF_TEXT_SCHEMA = (
    "asset_id BIGINT, page_no INT, text STRING, n_stream_bytes BIGINT, "
    "filter STRING"
)

_PDF_TJ = _re.compile(rb"\(([^()\\]*)\)\s*Tj")
_PDF_TJA = _re.compile(rb"\[((?:[^\[\]\\])*)\]\s*TJ")
_PDF_STR = _re.compile(rb"\(([^()\\]*)\)")


def _pdf_page_streams(data: bytes) -> list[tuple[int, bytes, str, int]]:
    """(page_no, inflated content bytes, filter name, raw stream size)
    per page, pages in /Kids order. Stream bytes are located by the
    object's declared /Length (never by scanning for 'endstream' —
    binary payloads may contain that byte string)."""
    offsets, trailer0, _n = _pdf_xref_walk(data)
    root_ref = _pdf_key_ref(trailer0, b"/Root")
    if root_ref is None:
        raise ValueError("trailer missing /Root")
    cat = _pdf_object_dict(data, offsets, root_ref)
    pages_ref = _pdf_key_ref(cat, b"/Pages")
    if pages_ref is None:
        raise ValueError("catalog missing /Pages")
    pages = _pdf_object_dict(data, offsets, pages_ref)
    kids = _re.search(rb"/Kids\s*\[(.*?)\]", pages, _re.S)
    if kids is None:
        raise ValueError("page tree missing /Kids")
    out = []
    for p, km in enumerate(_re.finditer(_PDF_REF, kids.group(1))):
        page = _pdf_object_dict(data, offsets, int(km.group(1)))
        c_ref = _pdf_key_ref(page, b"/Contents")
        if c_ref is None:
            raise ValueError(f"page {p} missing /Contents")
        if c_ref not in offsets:
            raise ValueError(f"content object {c_ref} missing from xref")
        pos = offsets[c_ref]
        start = data.index(b"<<", pos)
        body, dict_end = _pdf_dict_body(data, start)
        length = _pdf_key_int(body, b"/Length")
        if length is None:
            raise ValueError("content stream missing /Length")
        fm = _re.search(rb"/Filter\s*/(\w+)", body)
        sm = _re.compile(rb"stream\r?\n").search(data, dict_end)
        if sm is None:
            raise ValueError("content object has no stream keyword")
        raw = data[sm.end() : sm.end() + length]
        if len(raw) != length:
            raise ValueError("content stream truncated vs declared /Length")
        if fm is None:
            filt, content = "none", raw
        elif fm.group(1) == b"FlateDecode":
            filt, content = "FlateDecode", zlib.decompress(raw)
        else:
            raise ValueError(
                f"unsupported stream filter {fm.group(1).decode()} "
                "(FlateDecode only)"
            )
        out.append((p + 1, content, filt, length))
    return out


def _pdf_content_text(content: bytes) -> str:
    """Text shown by a content stream: Tj string operands and TJ array
    string elements, in operator order, joined by single spaces.
    Escaped (backslash) strings raise — the honest subset boundary;
    kerning numbers inside TJ arrays are ignored (they move the pen,
    not the text)."""
    if b"\\" in content:
        raise ValueError("escaped string syntax in content stream "
                         "unsupported")
    parts: list[tuple[int, str]] = []
    for m in _PDF_TJ.finditer(content):
        parts.append((m.start(), m.group(1).decode("latin-1")))
    for m in _PDF_TJA.finditer(content):
        joined = " ".join(
            s.group(1).decode("latin-1")
            for s in _PDF_STR.finditer(m.group(1))
        )
        parts.append((m.start(), joined))
    return " ".join(t for _pos, t in sorted(parts))


def pdf_text_extract(assets: DataFrame) -> DataFrame:
    """Per-page PDF text via Arrow mapInPandas: the xref walk locates
    each page's content stream by declared /Length, FlateDecode
    inflates it (zlib — a REAL decompression, the PNG decoder's
    sibling), and the Tj/TJ text operators are read in content order —
    turning the dominant document asset class into rows the text
    stack (dedup, quality, lang-ID, BM25) can consume. Returns
    (asset_id, page_no, text, n_stream_bytes, filter).

    Scale shape: cost per asset is the xref tail + per-page inflate of
    the text stream — image/font streams other objects may hold are
    never touched (located-by-xref, read-by-/Length); bytes stay in
    Arrow buffers, one kernel call per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "page_no": [], "text": [],
                "n_stream_bytes": [], "filter": [],
            }
            for aid, blob in zip(pdf["asset_id"], pdf["media"]):
                for page_no, content, filt, nraw in _pdf_page_streams(
                    bytes(blob)
                ):
                    out["asset_id"].append(aid)
                    out["page_no"].append(page_no)
                    out["text"].append(_pdf_content_text(content))
                    out["n_stream_bytes"].append(nraw)
                    out["filter"].append(filt)
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media").mapInPandas(
        run, PDF_TEXT_SCHEMA
    )


def synthetic_pdf_text_assets(
    spark: SparkSession, n: int = 8, seed: int = 42
) -> DataFrame:
    """REAL minimal PDFs whose pages carry FlateDecode content streams
    with closed-form text: page p of doc i shows
    'pdf doc {i}' (Tj) + 'page {p} quick brown fox jumps {i+p}'
    (TJ array with kerning numbers the parser must skip). Page count
    1 + i%3. Object layout: catalog(1), pages(2), page objects,
    content streams, info — classic xref, no updates (the update chain
    is the metadata fixture's concern)."""
    rows = []
    for i in range(n):
        n_pages = 1 + i % 3
        buf = bytearray()
        offsets = {}

        def obj(num: int, body: bytes) -> None:
            offsets[num] = len(buf)
            buf.extend(b"%d 0 obj\n" % num)
            buf.extend(body)
            buf.extend(b"\nendobj\n")

        buf.extend(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        kids = b" ".join(b"%d 0 R" % (3 + p) for p in range(n_pages))
        obj(
            2,
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages),
        )
        first_content = 3 + n_pages
        for p in range(n_pages):
            obj(
                3 + p,
                b"<< /Type /Page /Parent 2 0 R "
                b"/MediaBox [0 0 612 792] /Contents %d 0 R >>"
                % (first_content + p),
            )
        for p in range(n_pages):
            ops = (
                b"BT /F1 12 Tf 72 720 Td (pdf doc %d) Tj "
                b"[(page %d) -250 (quick brown fox jumps %d)] TJ ET"
                % (i, p + 1, i + p + 1)
            )
            comp = zlib.compress(ops)
            obj(
                first_content + p,
                b"<< /Length %d /Filter /FlateDecode >>\nstream\n"
                % len(comp)
                + comp
                + b"\nendstream",
            )
        size = 3 + 2 * n_pages
        xref0 = len(buf)
        buf.extend(b"xref\n0 %d\n" % size)
        buf.extend(b"0000000000 65535 f \n")
        for num in range(1, size):
            buf.extend(b"%010d 00000 n \n" % offsets[num])
        buf.extend(
            b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n"
            b"%%%%EOF\n" % (size, xref0)
        )
        rows.append(
            (i, bytearray(bytes(buf)), "application/pdf", None, None, None)
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
