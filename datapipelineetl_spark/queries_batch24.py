"""Twenty-fourth query battery — STAGED in round 16 for the round-17
verify window.

Round-16 depth (VERDICT r15 item 5): the video EXECUTION leg gets its
driver-facing value oracles — ``sample_frames``
(``operators/multimodal.py``, the MJPEG-AVI demux → per-frame
baseline-JPEG decode → P6 emit pipeline) was pinned by hand-built-AVI
unit tests only; these two queries apply the exact ``q_resize_media``
discipline (kernel OUTPUT BYTES reconstructed by the oracle and
compared as hex) to decoded video frames:

- ``q_sample_frames`` — grayscale MJPEG AVIs (4 flat-DC 8×8 frames per
  video, frame levels an explicit doc_id/index formula both engines
  compute), ``every_n=2`` sampling: the oracle re-derives each sampled
  frame's FULL P6 byte stream (header + 192 level bytes), its index,
  its container timestamp (40 ms/frame), and the valid=false
  observation row for a non-AVI payload.
- ``q_sample_frames_thumb_color`` — one-frame 4:2:0 color AVIs (flat
  YCbCr per video, levels again formula-derived) thumbnailed to 2×2:
  the oracle replays the JFIF YCbCr→RGB conversion
  (floor(x + 0.5) + clamp, the decoder's exact rounding) and rebuilds
  the thumbnail bytes — so chroma replication, color conversion and
  the pixel-center gather are all value-checked cross-engine.

The AVI payloads are built DRIVER-SIDE by `_flat_avi` — a
metadata-sized fixture constructor (≤ 6 tiny videos per query, the
same driver-literal budget as the ANN query vectors); the operator
under test runs distributed through the Arrow-batched ``mapInPandas``
kernel. Flat-DC blocks are lossless through quant-1 DCT (IDCT of a
pure-DC block is exactly level − 128 + 128), which is what makes the
decoded bytes analytically reconstructable in SQL.

Same staging contract as batches 11–23: separate dicts so importing
this module cannot grow the live ``queries()`` surface mid-round;
``tests/test_corpus_oracles.py`` runs the driver-style comparison
locally; ``register()`` promotes when the r17 window has slots.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datapipelineetl_spark.queries import _t

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        if oracle is not None:
            STAGED_ORACLES[name] = oracle
        return fn

    return deco


def register() -> None:
    """Round-17 wiring: promote the staged queries into the live
    registry (call from __spark_entry__ next to the batch-23 register,
    then give them window slots via tools/rotate_window.py)."""
    from datapipelineetl_spark.queries import ORACLES as _GLOBAL_ORACLES
    from datapipelineetl_spark.queries import QUERIES as _GLOBAL_QUERIES

    _GLOBAL_QUERIES.update(STAGED_QUERIES)
    _GLOBAL_ORACLES.update(STAGED_ORACLES)


# ---- flat-DC MJPEG-AVI fixture builder (driver-side, metadata-sized) ----
#
# Minimal baseline-JPEG encoder for FLAT blocks only: quant table all
# 1s, one canonical DC table (symbols 0..11 at 4 bits = the canonical
# assignment `_jpeg_pixels` rebuilds) and a one-symbol AC table (EOB at
# 2 bits). A flat block at level L encodes DC diff (L-128)*8 and EOB;
# quant-1 IDCT reproduces L exactly, so the decoded bytes are
# analytically known — the property the oracles replay.

_DC_SYMS = list(range(12))


class _Bits:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def dc_sym(self, diff: int) -> None:
        s = abs(diff).bit_length()
        self.put(s, 4)  # canonical: code == symbol index at 4 bits
        if s:
            self.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def eob(self) -> None:
        self.put(0, 2)  # EOB (the only AC symbol, 2-bit code 0)

    def dc(self, diff: int) -> None:
        self.dc_sym(diff)
        self.eob()

    def done(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = self.n = 0
        return bytes(self.buf)


def _dht(tc: int, syms: list[int], length: int) -> bytes:
    counts = [0] * 16
    counts[length - 1] = len(syms)
    return bytes([tc << 4]) + bytes(counts) + bytes(syms)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _flat_jpeg(w: int, h: int, comps: list[tuple[int, int, int]],
               levels: list[int], progressive: bool = False) -> bytes:
    """One-MCU flat JPEG: ``comps`` = [(cid, hs, vs)] (total sampling
    must cover w×h in a single MCU), ``levels`` = per-component flat
    level; only each component's FIRST block carries the level (the
    rest encode diff 0 — flat across the MCU). With
    ``progressive=True`` the SAME coefficients are written as an SOF2
    multi-scan stream (one interleaved DC scan + one EOB-only AC scan
    per component) — exercising `_jpeg_pixels_progressive` end to end
    with analytically identical output."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs in comps:
        sof += bytes([cid, (hs << 4) | vs, 0])
    out += _seg(0xC2 if progressive else 0xC0, sof)
    out += _seg(0xC4, _dht(0, _DC_SYMS, 4))
    out += _seg(0xC4, _dht(1, [0x00], 2))

    def sos_hdr(scomps: list[int], ss: int, se: int) -> bytes:
        sos = bytes([len(scomps)])
        for cid in scomps:
            sos += bytes([cid, 0x00])
        return sos + bytes([ss, se, 0])

    if not progressive:
        bits = _Bits()
        for (cid, hs, vs), lvl in zip(comps, levels):
            bits.dc((lvl - 128) * 8)
            for _ in range(hs * vs - 1):
                bits.dc(0)
        out += _seg(0xDA, sos_hdr([c[0] for c in comps], 0, 63))
        out += bits.done()
    else:
        dcb = _Bits()
        for (cid, hs, vs), lvl in zip(comps, levels):
            dcb.dc_sym((lvl - 128) * 8)
            for _ in range(hs * vs - 1):
                dcb.dc_sym(0)
        out += _seg(0xDA, sos_hdr([c[0] for c in comps], 0, 0))
        out += dcb.done()
        for cid, hs, vs in comps:
            acb = _Bits()
            for _ in range(hs * vs):  # one-MCU frame: nat grid = hs×vs
                acb.eob()
            out += _seg(0xDA, sos_hdr([cid], 1, 63))
            out += acb.done()
    out += b"\xff\xd9"
    return bytes(out)


def _float_wav(samples: list[float], sr: int) -> bytes:
    """Minimal IEEE-float32 mono WAV (format code 3) — the round-16
    `_wav_samples` float leg's fixture; samples land on the 16-bit
    grid via rint(clip(x,-1,1)·32767) in the decoder."""
    data = struct.pack(f"<{len(samples)}f", *samples)
    fmt = struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)
    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _flat_avi(jpeg_frames: list[bytes], usec_per_frame: int,
              w: int, h: int) -> bytes:
    """Minimal MJPEG-AVI: RIFF 'AVI ' with an hdrl LIST (avih carrying
    the frame interval the demux reads) and a movi LIST of 00dc
    chunks, word-aligned — the envelope `_avi_mjpeg_frames` walks."""

    def chunk(cid: bytes, payload: bytes) -> bytes:
        out = cid + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) & 1 else b"")

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec_per_frame, 0, 0, 0, len(jpeg_frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---- q_sample_frames: grayscale, every_n=2, full frames ----

_SFG_DOCS = 6      # videos built for doc_id < 6
_SFG_NF = 4        # frames per video
_SFG_EVERY = 2     # sample stride → indexes 0, 2
_SFG_USEC = 40000  # 40 ms/frame → ts 0, 80
_SFG_DIM = 8
# frame level formula — evaluated identically by both engines; range
# 28..227 keeps flat-DC decode clip-free
_SFG_LVL = "({d} * 31 + {i} * 53) % 200 + 28"


@query(
    "q_sample_frames",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_SFG_DOCS}),
    fr AS (
      SELECT media_id, idx,
             {_SFG_LVL.format(d="media_id", i="idx")} AS lvl
      FROM ids CROSS JOIN (SELECT unnest([0, 2]) AS idx)),
    hdr AS (SELECT hex(encode('P6' || chr(10) || '{_SFG_DIM} {_SFG_DIM}'
                              || chr(10) || '255' || chr(10))) AS h)
    SELECT media_id,
           CAST(idx AS INT) AS frame_index,
           CAST(idx * {_SFG_USEC // 1000} AS BIGINT) AS frame_ts_ms,
           CAST({_SFG_DIM} AS INT) AS frame_width,
           CAST({_SFG_DIM} AS INT) AS frame_height,
           TRUE AS valid,
           h || repeat(lpad(upper(to_hex(lvl)), 2, '0'),
                       {_SFG_DIM * _SFG_DIM * 3}) AS payload_hex
    FROM fr CROSS JOIN hdr
    UNION ALL
    SELECT CAST(-1 AS BIGINT), NULL, NULL, NULL, NULL, FALSE, NULL
    """,
)
def q_sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL video frame-sampling pipeline value-checked
    cross-engine: for each document id < {0}, a driver-built MJPEG AVI
    of {1} flat-DC grayscale frames (frame i of video d at level
    (d·31 + i·53) mod 200 + 28 — a formula BOTH engines evaluate),
    `multimodal.sample_frames(every_n={2})` demuxes the RIFF
    container, entropy-decodes every sampled frame through the real
    baseline-JPEG decoder, and emits P6 frames with container
    timestamps ({3} ms/frame); the oracle reconstructs each sampled
    frame's exact byte stream (header + 192 level bytes), index and
    timestamp, plus the single valid=false observation row a non-AVI
    payload yields. This closes VERDICT r15 Missing #4 — the video
    EXECUTION leg was test-pinned but had no driver-facing value
    check.

    Scale: the fixture build is metadata-sized ({0} tiny videos,
    driver-literal budget); the demux+decode kernel is the production
    Arrow-batched ``mapInPandas`` path — video bytes never leave the
    executor, only sampled frames' P6 artifacts do, and decode cost
    scales with frames SAMPLED (every_n is the lever)."""
    from datapipelineetl_spark.operators import multimodal  # noqa: PLC0415

    ids = sorted(
        int(r.doc_id)
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _SFG_DOCS)
        .select("doc_id")
        .collect()
    )
    rows = [
        (
            d,
            _flat_avi(
                [
                    _flat_jpeg(
                        _SFG_DIM, _SFG_DIM, [(1, 1, 1)],
                        [(d * 31 + i * 53) % 200 + 28],
                    )
                    for i in range(_SFG_NF)
                ],
                _SFG_USEC, _SFG_DIM, _SFG_DIM,
            ),
        )
        for d in ids
    ] + [(-1, b"not a video")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = multimodal.sample_frames(df, every_n=_SFG_EVERY)
    return out.select(
        "media_id", "frame_index", "frame_ts_ms", "frame_width",
        "frame_height", "valid", F.hex("payload").alias("payload_hex"),
    )


q_sample_frames.__doc__ = q_sample_frames.__doc__.format(
    _SFG_DOCS, _SFG_NF, _SFG_EVERY, _SFG_USEC // 1000
)


# ---- q_sample_frames_thumb_color: 4:2:0 color, 2x2 thumbnails ----

_SFC_DOCS = 4
_SFC_DIM = 16   # one 4:2:0 MCU
_SFC_TH = 2     # thumbnail 2x2
_SFC_USEC = 33000
# flat YCbCr levels per video — clip-free through the JFIF conversion
_SFC_Y = "({d} * 37) % 160 + 48"
_SFC_CB = "({d} * 29) % 160 + 48"
_SFC_CR = "({d} * 41) % 160 + 48"
# the decoder's exact conversion: floor(x + 0.5), then 0..255 clamp
_JFIF = {
    "r": "FLOOR(y + 1.402 * (cr - 128) + 0.5)",
    "g": "FLOOR(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)",
    "b": "FLOOR(y + 1.772 * (cb - 128) + 0.5)",
}


@query(
    "q_sample_frames_thumb_color",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_SFC_DOCS}),
    lv AS (
      SELECT media_id,
             CAST({_SFC_Y.format(d="media_id")} AS DOUBLE) AS y,
             CAST({_SFC_CB.format(d="media_id")} AS DOUBLE) AS cb,
             CAST({_SFC_CR.format(d="media_id")} AS DOUBLE) AS cr
      FROM ids),
    px AS (
      SELECT media_id,
             CAST(LEAST(GREATEST({_JFIF["r"]}, 0), 255) AS INT) AS r,
             CAST(LEAST(GREATEST({_JFIF["g"]}, 0), 255) AS INT) AS g,
             CAST(LEAST(GREATEST({_JFIF["b"]}, 0), 255) AS INT) AS b
      FROM lv),
    hdr AS (SELECT hex(encode('P6' || chr(10) || '{_SFC_TH} {_SFC_TH}'
                              || chr(10) || '255' || chr(10))) AS h)
    SELECT media_id,
           CAST(0 AS INT) AS frame_index,
           CAST(0 AS BIGINT) AS frame_ts_ms,
           CAST({_SFC_TH} AS INT) AS frame_width,
           CAST({_SFC_TH} AS INT) AS frame_height,
           TRUE AS valid,
           h || repeat(lpad(upper(to_hex(r)), 2, '0')
                       || lpad(upper(to_hex(g)), 2, '0')
                       || lpad(upper(to_hex(b)), 2, '0'),
                       {_SFC_TH * _SFC_TH}) AS payload_hex
    FROM px CROSS JOIN hdr
    """,
)
def q_sample_frames_thumb_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The color + thumbnail leg of the same pipeline: one-frame 4:2:0
    MJPEG AVIs (flat YCbCr per video, levels formula-derived from
    doc_id), thumbnailed to {0}×{0} by `sample_frames(width, height)`.
    Value-checks three kernel stages at once, all reconstructed by the
    oracle: chroma replication across the 2×2 Y blocks of the MCU,
    the JFIF YCbCr→RGB conversion at the decoder's exact rounding
    (floor(x + 0.5), 0..255 clamp — replayed in SQL), and the shared
    pixel-center thumbnail gather (flat frames thumbnail to the same
    flat RGB).

    Scale: as q_sample_frames — metadata-sized fixture build,
    production Arrow-batched demux/decode kernel; with thumbnailing
    only thumbnail-sized artifacts leave the executor."""
    from datapipelineetl_spark.operators import multimodal  # noqa: PLC0415

    ids = sorted(
        int(r.doc_id)
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _SFC_DOCS)
        .select("doc_id")
        .collect()
    )
    rows = [
        (
            d,
            _flat_avi(
                [
                    _flat_jpeg(
                        _SFC_DIM, _SFC_DIM,
                        [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
                        [
                            (d * 37) % 160 + 48,
                            (d * 29) % 160 + 48,
                            (d * 41) % 160 + 48,
                        ],
                    )
                ],
                _SFC_USEC, _SFC_DIM, _SFC_DIM,
            ),
        )
        for d in ids
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = multimodal.sample_frames(df, every_n=1, width=_SFC_TH, height=_SFC_TH)
    return out.select(
        "media_id", "frame_index", "frame_ts_ms", "frame_width",
        "frame_height", "valid", F.hex("payload").alias("payload_hex"),
    )


q_sample_frames_thumb_color.__doc__ = q_sample_frames_thumb_color.__doc__.format(
    _SFC_TH
)


# ---- q_image_stats_progressive: the SOF2 decoder driver-facing ----

_PJ_DOCS = 5
_PJ_DIM = 16  # one 4:2:0 MCU


@query(
    "q_image_stats_progressive",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_PJ_DOCS}),
    lv AS (
      SELECT media_id,
             CAST({_SFC_Y.format(d="media_id")} AS DOUBLE) AS y,
             CAST({_SFC_CB.format(d="media_id")} AS DOUBLE) AS cb,
             CAST({_SFC_CR.format(d="media_id")} AS DOUBLE) AS cr
      FROM ids),
    px AS (
      SELECT media_id,
             CAST(LEAST(GREATEST({_JFIF["r"]}, 0), 255) AS INT) AS r,
             CAST(LEAST(GREATEST({_JFIF["g"]}, 0), 255) AS INT) AS g,
             CAST(LEAST(GREATEST({_JFIF["b"]}, 0), 255) AS INT) AS b
      FROM lv)
    SELECT media_id, 'jpeg' AS detected_format,
           CAST({_PJ_DIM} AS INT) AS width, CAST({_PJ_DIM} AS INT) AS height,
           CAST({_PJ_DIM * _PJ_DIM} AS BIGINT) AS n_pixels,
           CAST(r AS DOUBLE) AS mean_r,
           CAST(g AS DOUBLE) AS mean_g,
           CAST(b AS DOUBLE) AS mean_b,
           r AS min_r, g AS min_g, b AS min_b,
           r AS max_r, g AS max_g, b AS max_b,
           TRUE AS valid
    FROM px
    """,
)
def q_image_stats_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-16 PROGRESSIVE JPEG decoder (`_jpeg_pixels_progressive`
    — T.81 §G multi-scan: interleaved DC scan + per-component AC scans)
    driver-facing: for each document id < {0}, a driver-built one-MCU
    4:2:0 SOF2 stream at formula-derived flat YCbCr levels runs
    through `multimodal.image_stats`; the oracle replays the JFIF
    YCbCr→RGB conversion at the decoder's exact rounding
    (floor(x+0.5), 0..255 clamp) and every flat-image statistic. A
    flat image through the full multi-scan machinery (DC interleave,
    AC EOB runs, dequant, IDCT, chroma replication) must reproduce the
    formula exactly — any scan-ordering or refinement bug shows up as
    a value mismatch.

    Scale: fixture build is metadata-sized ({0} tiny streams); the
    decode runs in the production Arrow-batched `image_stats` kernel —
    13 scalars per image leave the executor."""
    from datapipelineetl_spark.operators import multimodal  # noqa: PLC0415

    ids = sorted(
        int(r.doc_id)
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _PJ_DOCS)
        .select("doc_id")
        .collect()
    )
    rows = [
        (
            d,
            _flat_jpeg(
                _PJ_DIM, _PJ_DIM,
                [(1, 2, 2), (2, 1, 1), (3, 1, 1)],
                [
                    (d * 37) % 160 + 48,
                    (d * 29) % 160 + 48,
                    (d * 41) % 160 + 48,
                ],
                progressive=True,
            ),
        )
        for d in ids
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return multimodal.image_stats(df)


q_image_stats_progressive.__doc__ = q_image_stats_progressive.__doc__.format(
    _PJ_DOCS
)


# ---- q_audio_stats_float: the IEEE-float WAV leg driver-facing ----

_FW_DOCS = 6
_FW_N = 8       # samples per clip
_FW_SR = 8000   # → duration_ms = 8 * 1000 // 8000 = 1
# sample formula: k in [-20, 20]; x = k/64 is float32-exact and
# k·32767/64 never lands on a .5 boundary (that needs k ≡ 32 mod 64),
# so rint == floor(x+0.5) on both engines
_FW_K = "(({d} * 13 + {j} * 7) % 41 - 20)"


@query(
    "q_audio_stats_float",
    f"""
    WITH ids AS (
      SELECT doc_id AS media_id FROM documents WHERE doc_id < {_FW_DOCS}),
    s AS (
      SELECT media_id, {_FW_K.format(d="media_id", j="j")} AS k
      FROM ids CROSS JOIN
           (SELECT unnest(generate_series(0, {_FW_N - 1})) AS j)),
    c AS (
      SELECT media_id,
             CAST(FLOOR(k * 32767.0 / 64.0 + 0.5) AS BIGINT) AS cent
      FROM s),
    agg AS (
      SELECT media_id,
             SUM(cent) AS ssum, SUM(cent * cent) AS ssq,
             CAST(MAX(ABS(cent)) AS INT) AS peak
      FROM c GROUP BY media_id)
    SELECT media_id,
           CAST({_FW_SR} AS INT) AS sample_rate,
           CAST(1 AS INT) AS n_channels,
           CAST(32 AS INT) AS bit_depth,
           CAST({_FW_N} AS BIGINT) AS n_frames,
           CAST({_FW_N * 1000 // _FW_SR} AS BIGINT) AS duration_ms,
           CAST(ssum AS DOUBLE) / {_FW_N} AS mean_sample,
           peak AS peak_abs,
           SQRT(CAST(ssq AS DOUBLE) / {_FW_N}) AS rms,
           TRUE AS valid
    FROM agg
    """,
)
def q_audio_stats_float(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-16 IEEE-float WAV leg (`_wav_samples` format code 3)
    driver-facing: for each document id < {0}, a driver-built float32
    mono WAV whose {1} samples follow an explicit formula (x = k/64,
    k = (d·13 + j·7) mod 41 − 20 — float32-exact, never on a rounding
    boundary) runs through `multimodal.audio_stats`; the oracle
    replays the float→16-bit-grid conversion (rint(clip·32767) ==
    floor(x+0.5) off boundaries), the exact int-sum/n mean, the peak,
    and the RMS whose radicand is an exact small integer in float64 on
    both engines (the bits>16 float64-accumulator path, overflow-free
    by construction here).

    Scale: as q_image_stats_progressive — metadata-sized fixture,
    production Arrow kernel, 8 scalars per clip out."""
    from datapipelineetl_spark.operators import multimodal  # noqa: PLC0415

    ids = sorted(
        int(r.doc_id)
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _FW_DOCS)
        .select("doc_id")
        .collect()
    )
    rows = [
        (
            d,
            _float_wav(
                [
                    ((d * 13 + j * 7) % 41 - 20) / 64.0
                    for j in range(_FW_N)
                ],
                _FW_SR,
            ),
        )
        for d in ids
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return multimodal.audio_stats(df)


q_audio_stats_float.__doc__ = q_audio_stats_float.__doc__.format(
    _FW_DOCS, _FW_N
)
