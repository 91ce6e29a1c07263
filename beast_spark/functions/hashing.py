"""Cross-engine hash primitives.

``xxhash64`` is Spark's fastest 64-bit hash (one JVM intrinsic) and the
default family for every bucketing operator here — but it exists only in
Spark, so results built on it cannot be replayed by another SQL engine.
These md5/sha256-derived twins produce identical values in ANY engine
with standard hash functions (verified bit-exact against DuckDB):

    Spark:  conv(substr(md5(s), 1, 15), 16, 10)::long
    DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex chars = 60 bits — always non-negative in a signed 64-bit long, so
no ANSI overflow and identical signedness semantics everywhere. Use the
``hash_family="md5"`` variants when output must be independently
verifiable (audit trails, cross-engine oracle checks); the xxhash64
family is ~3× cheaper and the right default at scale.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_long", "md5_long_py", "sha256_long", "MD5_LONG_BITS"]

MD5_LONG_BITS = 60  # 15 hex chars


def _as_col(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def md5_long(col: str | Column, chars: int = 15) -> Column:
    """First ``chars`` hex digits of md5(utf8(col)) as a non-negative long."""
    return F.conv(F.substring(F.md5(F.encode(_as_col(col), "UTF-8")), 1, chars), 16, 10).cast(
        "long"
    )


def md5_long_py(s: str, chars: int = 15) -> int:
    """Driver-side twin of :func:`md5_long` (e.g. for constant folding)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:chars], 16)


def sha256_long(col: str | Column, chars: int = 8) -> Column:
    """First ``chars`` hex digits of sha256(utf8(col)) as a long (8 → 32 bits)."""
    return F.conv(
        F.substring(F.sha2(_as_col(col).cast("string"), 256), 1, chars), 16, 10
    ).cast("long")
