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

__all__ = ["MEDIA_SCHEMA", "attach_media_meta", "decode_features", "sample_frames"]

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
    """content → float feature vector (``features`` array<float> column).

    ``strict=True`` raises NotImplementedError where a real codec (PIL /
    torchaudio / pyav) would run — the container ships none of them. The
    Spark-side contract (schema, batching, null passthrough) is identical
    in both modes.
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
                elif strict:
                    raise NotImplementedError(
                        "real media codec unavailable in this environment; "
                        "install PIL/pyav and replace _fake_features"
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

    Real image resizing (PIL/opencv) happens at the marked stub; the fake
    path emits a deterministic byte-downsample of the original content so
    sizes, Arrow batching and downstream schema behave like production.
    Same contract as :func:`decode_features`: Arrow-batched mapInPandas,
    null passthrough, ``strict=True`` raises where the codec would run.
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
                elif strict:
                    raise NotImplementedError(
                        "real image codec unavailable in this environment; "
                        "install PIL/opencv and replace the byte-downsample"
                    )
                else:
                    b = bytes(raw)
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
