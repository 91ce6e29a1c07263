"""Multimodal (image/audio/video) column plumbing for training pipelines.

Media travels as opaque ``binary`` columns with a typed metadata struct —
the schema, partitioning, Arrow batch shape and UDF signatures here are
the real, production plan; only the *codec* step is swapped: the runtime
container has no image/audio libraries, so decode resolves to either

* a clearly-marked ``NotImplementedError`` stub (``strict=True``), or
* a deterministic fake decoder (``strict=False``, default for tests):
  features are derived from a stable sha256 stream of the bytes, so
  every downstream operator (dedup by content hash, feature extraction,
  ANN over media embeddings) is exercised end-to-end with real shuffles
  and real Arrow batches.

At scale the decode is a ``mapInPandas`` pass — one Python worker per
input partition, Arrow-batched, no shuffle — and the binary column should
be stored in its own parquet column chunk so scans that don't touch
pixels never read them (column pruning does this automatically).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from beast_spark.queries._util import rnd

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_meta",
    "audio_stats",
    "decode_bmp",
    "decode_features",
    "decode_image",
    "decode_wav",
    "encode_bmp",
    "encode_ppm",
    "encode_wav",
    "resize_image_nearest",
    "sample_frames",
    "wav_samples",
    "dft8_coefs",
    "stft8_power",
]

# Canonical media-row shape: content + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


# -- real codec: netpbm (PPM P6 / PGM P5) — pure bytes, no libraries ----
#
# The container ships no PIL/opencv/pyav, but the netpbm formats are
# fully decodable with stdlib byte parsing, so the IMAGE leg of the
# multimodal stack is a real codec, not a stub: header parse → raw pixel
# plane → stats/resize. Other formats (JPEG/PNG/audio/video) stay behind
# the deterministic fake (or ``strict`` raise) until a real library is
# available.


def encode_ppm(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Binary netpbm encode: P5 grayscale (1 channel) / P6 RGB (3)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 (P5) or 3 (P6)")
    if len(pixels) != width * height * channels:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{channels}")
    magic = b"P5" if channels == 1 else b"P6"
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + pixels


def encode_bmp(width: int, height: int, pixels_rgb: bytes) -> bytes:
    """24-bit uncompressed (BI_RGB) BMP from top-down RGB pixel bytes.

    Emits the canonical on-disk layout: BITMAPFILEHEADER +
    BITMAPINFOHEADER(40), bottom-up row order, BGR byte order, rows
    padded to 4-byte boundaries — the format every Windows-origin
    training corpus actually contains.
    """
    import struct

    if len(pixels_rgb) != width * height * 3:
        raise ValueError(f"pixel buffer {len(pixels_rgb)} != {width}x{height}x3")
    row_len = width * 3
    pad = (4 - row_len % 4) % 4
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = pixels_rgb[y * row_len : (y + 1) * row_len]
        for x in range(0, row_len, 3):  # RGB → BGR
            raster += bytes((row[x + 2], row[x + 1], row[x]))
        raster += b"\x00" * pad
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    offset = 14 + 40
    return b"BM" + struct.pack("<IHHI", offset + len(raster), 0, 0, offset) + dib + raster


def decode_bmp(raw: bytes) -> tuple[int, int, int, bytes]:
    """Parse a 24-bit BI_RGB BMP → (3, width, height, top-down RGB bytes).

    Handles bottom-up (positive height) and top-down (negative height)
    rasters, BGR→RGB, and 4-byte row padding. Raises ValueError for
    anything else (compressed, paletted, ≠24bpp) — the "fall back to
    fake/strict" signal, same contract as the netpbm decoder.
    """
    import struct

    if raw[:2] != b"BM":
        raise ValueError("not a BMP image")
    if len(raw) < 54:
        raise ValueError("truncated BMP header")
    offset = struct.unpack_from("<I", raw, 10)[0]
    dib_size = struct.unpack_from("<I", raw, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    w, h = struct.unpack_from("<ii", raw, 18)
    bpp = struct.unpack_from("<H", raw, 28)[0]
    compression = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    row_len = w * 3
    stride = (row_len + 3) & ~3
    if len(raw) < offset + stride * h:
        raise ValueError("truncated BMP raster")
    out = bytearray(row_len * h)
    for y in range(h):
        sy = y if top_down else h - 1 - y
        src = offset + sy * stride
        dst = y * row_len
        for x in range(0, row_len, 3):  # BGR → RGB
            out[dst + x] = raw[src + x + 2]
            out[dst + x + 1] = raw[src + x + 1]
            out[dst + x + 2] = raw[src + x]
    return 3, w, h, bytes(out)


def decode_image(raw: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary image → (channels, width, height, pixels).

    Dispatches on magic bytes: netpbm P5/P6 (whitespace/comment-tolerant
    header per the spec) or 24-bit BI_RGB BMP (:func:`decode_bmp`).
    Raises ValueError for anything else — callers use that as the "not
    an image we can decode" signal and fall back to the fake/strict path.
    """
    if raw[:2] == b"BM":
        return decode_bmp(raw)
    if raw[:2] == b"P5":
        channels = 1
    elif raw[:2] == b"P6":
        channels = 3
    else:
        raise ValueError("not a binary netpbm (P5/P6) or BMP image")
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(raw):
            raise ValueError("truncated netpbm header")
        c = raw[pos]
        if c in b"#":  # comment to end-of-line
            while pos < len(raw) and raw[pos] not in b"\r\n":
                pos += 1
        elif c in b" \t\r\n":
            pos += 1
        elif c in b"0123456789":
            start = pos
            while pos < len(raw) and raw[pos] in b"0123456789":
                pos += 1
            fields.append(int(raw[start:pos]))
        else:
            raise ValueError(f"bad netpbm header byte {bytes([c])!r}")
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit netpbm supported, maxval={maxval}")
    pos += 1  # exactly one whitespace byte separates header and raster
    n = width * height * channels
    pixels = raw[pos : pos + n]
    if len(pixels) != n:
        raise ValueError(f"raster has {len(pixels)} bytes, expected {n}")
    return channels, width, height, pixels


def resize_image_nearest(raw: bytes, target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resample, re-encoded in the INPUT's format
    (netpbm in → netpbm out, BMP in → BMP out).

    src index = ``i * src_dim // target_dim`` (exact integer math — the
    standard nearest-neighbor grid, deterministic everywhere).
    """
    channels, w, h, px = decode_image(raw)
    out = bytearray(target_w * target_h * channels)
    o = 0
    for y in range(target_h):
        sy = y * h // target_h
        row = sy * w * channels
        for x in range(target_w):
            sx = row + (x * w // target_w) * channels
            out[o : o + channels] = px[sx : sx + channels]
            o += channels
    if raw[:2] == b"BM":
        return encode_bmp(target_w, target_h, bytes(out))
    return encode_ppm(target_w, target_h, bytes(out), channels)


# -- real codec: WAV (RIFF PCM 16-bit) — pure bytes, no libraries -------


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """16-bit PCM WAV from interleaved int16 samples (RIFF/WAVE layout:
    fmt chunk + data chunk, little-endian)."""
    import struct

    if len(samples) % channels:
        raise ValueError(f"{len(samples)} samples not divisible by {channels} channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(raw: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a 16-bit PCM WAV → (channels, sample_rate, n_frames, samples).

    Walks the RIFF chunk list (tolerating extra chunks like LIST/INFO and
    odd-size padding, per the spec); raises ValueError for anything that
    is not integer PCM 16-bit — the "fall back to fake/strict" signal,
    same contract as the image decoders.
    """
    import struct

    if raw[:4] != b"RIFF" or len(raw) < 12 or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only integer PCM 16-bit supported (format={audio_format}, bits={bits})")
    if channels < 1:
        raise ValueError("bad channel count")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return channels, sample_rate, n // channels, samples


def audio_stats(df: DataFrame, content_col: str = "content", strict: bool = False) -> DataFrame:
    """content → typed audio stats columns (the audio twin of
    :func:`decode_features`): channels, sample_rate, n_frames,
    duration_ms, peak (max |sample|), sum_sq (exact int64), zero
    crossings, first/last sample. WAV PCM decodes with the REAL codec;
    other content yields NULL stats (or raises under ``strict``). Every
    stat is integer math or one float64 divide — replayable exactly by
    any engine from the same samples."""
    stat_fields = [
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_ms", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("zero_cross", T.LongType(), True),
        T.StructField("first_s", T.IntegerType(), True),
        T.StructField("last_s", T.IntegerType(), True),
    ]
    out_schema = T.StructType(df.schema.fields + stat_fields)
    cols = df.columns
    names = [f.name for f in stat_fields]

    def stats(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw in pdf[content_col]:
                if raw is None:
                    rows.append([None] * len(names))
                    continue
                try:
                    ch, rate, n_frames, s = decode_wav(bytes(raw))
                except ValueError:
                    if strict:
                        raise NotImplementedError(
                            "no real codec for this content (WAV PCM is built in; "
                            "install torchaudio/pyav for other formats)"
                        )
                    rows.append([None] * len(names))
                    continue
                zc = sum(1 for i in range(len(s) - 1) if (s[i] >= 0) != (s[i + 1] >= 0))
                rows.append(
                    [
                        ch,
                        rate,
                        n_frames,
                        n_frames * 1000.0 / rate,
                        max(abs(v) for v in s) if s else None,
                        sum(v * v for v in s),
                        zc,
                        s[0] if s else None,
                        s[-1] if s else None,
                    ]
                )
            yield pd.DataFrame(
                {
                    **{c: pdf[c] for c in cols},
                    **{n: [r[i] for r in rows] for i, n in enumerate(names)},
                }
            )

    return df.mapInPandas(stats, out_schema)


def _image_features(raw: bytes, dims: int) -> list[float] | None:
    """Real decoded-pixel features for netpbm content, else None.

    [channels, width, height, mean, min, max, first-pixel, last-pixel]
    truncated/zero-padded to ``dims``. mean is an exact-int sum divided
    once in float64 — replayable by any engine from the same pixels.
    """
    try:
        channels, w, h, px = decode_image(raw)
    except ValueError:
        return None
    feats = [
        float(channels),
        float(w),
        float(h),
        sum(px) / len(px),
        float(min(px)),
        float(max(px)),
        float(px[0]),
        float(px[-1]),
    ]
    return (feats + [0.0] * dims)[:dims]


def _fake_features(raw: bytes, dims: int) -> list[float]:
    """Deterministic pseudo-features from the content's sha256 stream.

    Feature i = ``u32(sha256(HEX ':' i)[:8]) / 2^32 - 0.5`` where HEX is
    the uppercase hex of the bytes. Every term is a power-of-two divide,
    so the value is EXACT in float64 — any engine with sha256() replays
    it bit-for-bit (the q50 DuckDB oracle does:
    ``('0x'||substr(sha256(hex(content)||':'||i),1,8))::BIGINT/4294967296.0 - 0.5``).
    """
    hx = raw.hex().upper()
    return [
        int(hashlib.sha256(f"{hx}:{i}".encode()).hexdigest()[:8], 16) / 2**32 - 0.5
        for i in range(dims)
    ]


def attach_media_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata: content length + content hash (for exact
    dedup of media assets) — no Python, no decode."""
    return df.withColumn("content_len", F.length(F.col(content_col))).withColumn(
        "content_sha", F.sha2(F.col(content_col), 256)
    )


def decode_features(
    df: DataFrame,
    content_col: str = "content",
    dims: int = 32,
    strict: bool = False,
) -> DataFrame:
    """content → float feature vector (``features`` array<double> column).

    netpbm (P5/P6) content decodes with the REAL codec
    (:func:`decode_image` → pixel stats). Everything else falls back to
    the deterministic sha256 fake, or — with ``strict=True`` — raises
    NotImplementedError where a real codec (PIL / torchaudio / pyav)
    would run; the container ships none of them. The Spark-side contract
    (schema, batching, null passthrough) is identical in every mode.
    """
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )
    cols = df.columns

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for raw in pdf[content_col]:
                if raw is None:
                    feats.append(None)
                    continue
                real = _image_features(bytes(raw), dims)
                if real is not None:
                    feats.append(real)
                elif strict:
                    raise NotImplementedError(
                        "no real codec for this content (netpbm is built in; "
                        "install PIL/pyav for other formats)"
                    )
                else:
                    feats.append(_fake_features(bytes(raw), dims))
            yield pd.DataFrame({**{c: pdf[c] for c in cols}, "features": feats})

    return df.mapInPandas(decode, out_schema)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """Explode each media blob into ``n_frames`` evenly-spaced frame slices.

    Real video decoding would yield decoded frames here; the plumbing —
    posexplode fan-out, per-frame binary payloads, frame index column —
    is the production shape. Frame bytes are byte-range slices (fake
    codec) so sizes/partitioning behave realistically.
    """
    frame_idx = F.posexplode(F.expr(f"sequence(0, {n_frames - 1})"))
    sliced = df.select(
        F.col(id_col),
        frame_idx.alias("_seq_pos", "frame_idx"),
        F.col(content_col),
    ).drop("_seq_pos")
    return sliced.select(
        id_col,
        "frame_idx",
        F.expr(f"substring({content_col}, frame_idx * (length({content_col}) div {n_frames}) + 1, "
               f"greatest(length({content_col}) div {n_frames}, 1))").alias("frame_bytes"),
    )


def resize_media(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    content_col: str = "content",
    strict: bool = False,
) -> DataFrame:
    """content → resized content (``resized`` binary + updated meta dims).

    netpbm content resizes with the REAL codec (nearest-neighbor,
    :func:`resize_image_nearest`); other formats fall back to a
    deterministic byte-downsample (or ``strict`` raise) so sizes, Arrow
    batching and downstream schema behave like production. Same contract
    as :func:`decode_features`: Arrow-batched mapInPandas, null
    passthrough.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("resized", T.BinaryType(), True),
            T.StructField("resized_w", T.IntegerType(), True),
            T.StructField("resized_h", T.IntegerType(), True),
        ]
    )
    cols = df.columns
    budget = max(1, target_w * target_h // 256)  # fake byte budget

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            outs = []
            for raw in pdf[content_col]:
                if raw is None:
                    outs.append(None)
                    continue
                b = bytes(raw)
                try:
                    outs.append(resize_image_nearest(b, target_w, target_h))
                    continue
                except ValueError:
                    pass  # not netpbm → fake/strict path below
                if strict:
                    raise NotImplementedError(
                        "no real codec for this content (netpbm is built in; "
                        "install PIL/opencv for other formats)"
                    )
                else:
                    step = max(1, len(b) // budget)
                    outs.append(b[::step][:budget])
            yield pd.DataFrame(
                {
                    **{c: pdf[c] for c in cols},
                    "resized": outs,
                    "resized_w": target_w,
                    "resized_h": target_h,
                }
            )

    return df.mapInPandas(resize, out_schema)


def wav_samples(
    df: DataFrame, content_col: str = "content", strict: bool = False
) -> DataFrame:
    """content → (channels, sample_rate, samples array<int>): the raw
    interleaved int16 samples via the REAL RIFF/WAVE parser
    (:func:`decode_wav`) — the decode stage feature extractors
    (:func:`stft8_power`) consume. Arrow-batched mapInPandas like
    :func:`audio_stats`; non-WAV content yields NULLs (or raises under
    ``strict``). The samples stay an engine-typed array column, so
    everything downstream runs JVM-side."""
    extra = [
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("samples", T.ArrayType(T.IntegerType()), True),
    ]
    out_schema = T.StructType(df.schema.fields + extra)
    cols = df.columns

    def parse(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ch_l, sr_l, s_l = [], [], []
            for raw in pdf[content_col]:
                if raw is None:
                    ch_l.append(None), sr_l.append(None), s_l.append(None)
                    continue
                try:
                    ch, rate, _n, s = decode_wav(bytes(raw))
                except ValueError:
                    if strict:
                        raise NotImplementedError(
                            "no real codec for this content (WAV PCM is built "
                            "in; install torchaudio/pyav for other formats)"
                        )
                    ch_l.append(None), sr_l.append(None), s_l.append(None)
                    continue
                ch_l.append(ch), sr_l.append(rate), s_l.append(list(s))
            yield pd.DataFrame(
                {
                    **{c: pdf[c] for c in cols},
                    "channels": ch_l,
                    "sample_rate": sr_l,
                    "samples": s_l,
                }
            )

    return df.mapInPandas(parse, out_schema)


# sqrt(1/2) as its shortest-repr double: the ONLY irrational the 8-point
# DFT needs, so every twiddle factor is an exactly-representable literal
# and the transform replays bit-for-bit in any IEEE-754 engine.
SQRT_HALF = 0.7071067811865476


def dft8_coefs() -> list[list[tuple[int, float, float]]]:
    """The 8-point DFT coefficient table: for each output bin m (0–4 —
    real input, so bins above Nyquist mirror), the (k, cos, sin) terms
    of X_m = Σ_k s_k·e^{-2πi·mk/8}. All coefficients are drawn from
    {0, ±1, ±sqrt(1/2)} — exact double literals — which is what makes
    an honest cross-engine EXACT oracle possible for a Fourier
    transform: generic cos()/sin() are not correctly-rounded and
    differ between libm implementations, these constants are.
    Shared by the Spark expression builder (:func:`stft8_power`) and
    the SQL oracle generator so the two sides cannot drift."""
    cos_t = [1.0, SQRT_HALF, 0.0, -SQRT_HALF, -1.0, -SQRT_HALF, 0.0, SQRT_HALF]
    sin_t = [0.0, SQRT_HALF, 1.0, SQRT_HALF, 0.0, -SQRT_HALF, -1.0, -SQRT_HALF]
    return [
        [(k, cos_t[(m * k) % 8], sin_t[(m * k) % 8]) for k in range(8)]
        for m in range(5)
    ]


def stft8_power(
    df: DataFrame,
    samples_col: str = "samples",
    id_col: str = "media_id",
    round_digits: int = 2,
) -> DataFrame:
    """Short-time Fourier power spectrogram, frame size 8, hop 8, as
    PURE JVM column expressions — no Python, no UDF: the per-bin dot
    products unroll into whole-stage-codegen arithmetic over array
    slices, so the spectrogram costs one map stage at any scale (the
    feature-extraction shape a 100-TB audio pipeline needs: decode
    once, then stay columnar).

    Returns (id, frame, bin, power) with power = re² + im² of the
    8-point DFT of each non-overlapping 8-sample frame (bins 0–4;
    real input, upper bins mirror), rounded with the shared floor-form
    so the value replays exactly in the DuckDB oracle. Trailing
    samples beyond the last full frame are dropped (standard STFT
    framing)."""
    # sequence(0, -1) yields a DESCENDING [0, -1] in Spark (implicit
    # step -1), so a sub-frame-length clip must gate to an empty array
    # explicitly or it emits a partial frame 0 plus a crashing frame -1.
    n_frames = (F.size(samples_col) / 8).cast("int")
    frame_idx = F.when(
        n_frames >= 1, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    frames = df.select(
        id_col,
        F.col(samples_col).alias("_s"),
        F.explode(frame_idx).alias("frame"),
    ).select(
        id_col,
        "frame",
        F.slice(F.col("_s"), F.col("frame") * 8 + 1, 8).alias("_f"),
    )

    def _sum(terms: list[tuple[int, float]]) -> F.Column:
        acc = None
        for k, c in terms:
            t = F.element_at(F.col("_f"), k + 1) * F.lit(c)
            acc = t if acc is None else acc + t
        return acc if acc is not None else F.lit(0.0)

    powers = []
    for m, row in enumerate(dft8_coefs()):
        re = _sum([(k, c) for k, c, _s in row if c != 0.0])
        im = _sum([(k, s) for k, _c, s in row if s != 0.0])
        powers.append(rnd(re * re + im * im, round_digits).alias(f"_p{m}"))
    wide = frames.select(id_col, "frame", *powers)
    n_bins = len(powers)
    stack = ", ".join(f"{m}L, _p{m}" for m in range(n_bins))
    return wide.selectExpr(
        id_col, "frame", f"stack({n_bins}, {stack}) AS (bin, power)"
    )
