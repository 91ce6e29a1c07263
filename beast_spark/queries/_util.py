"""Cross-engine deterministic rounding.

Spark's ``round()`` converts the double to its shortest decimal string and
applies HALF_UP (java.math.BigDecimal); DuckDB's rounds the binary value
(libm). On exact ties (e.g. an average landing on 7.775) the two disagree
by one ulp of the last kept digit. Both engines evaluate
``floor(x * 10^d + 0.5) / 10^d`` with identical IEEE-754 semantics, so the
queries and their oracles share that formula instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column, digits: int = 2) -> Column:
    """Deterministic round-half-up: floor(x·10^d + 0.5)/10^d (matches sql_rnd)."""
    factor = 10 ** digits
    return F.floor(col * factor + F.lit(0.5)) / factor


def sql_rnd(expr: str, digits: int = 2) -> str:
    """The DuckDB-side twin of :func:`rnd` for oracle SQL strings."""
    factor = 10 ** digits
    return f"floor(({expr}) * {factor} + 0.5) / {factor}"


def cents(col: Column, digits: int = 2) -> Column:
    """Exact integer representation of a fixed-point value (e.g. cents).

    ``avg()`` over cent-valued doubles is a cross-engine hazard: the true
    mean often sits exactly on a rounding cliff (sum-of-cents / 2^k), and
    Spark/DuckDB summation-order noise decides which side each engine
    lands on. Integer sums are order-independent, so summing exact cents
    and dividing once yields bit-identical results in both engines.
    """
    return F.floor(col * 10 ** digits + F.lit(0.5)).cast("long")


def exact_avg(col: Column, digits: int = 2, out_digits: int = 2) -> Column:
    """Order-independent average of a fixed-point column (see :func:`cents`)."""
    return rnd(
        F.sum(cents(col, digits)) / F.count(col) / float(10 ** digits), out_digits
    )


def scratch_dir(prefix: str) -> str:
    """A temp dir whose lifetime is the PROCESS, not the query build.

    Queries that materialize persisted-index state (q98/q164/q172/q173)
    cannot delete it inside the query function — the returned DataFrame
    still reads the files when the driver finally collects it. Deleting
    nothing leaks a dir per build (registry sweeps build every query).
    This registers an atexit cleanup instead: the files survive as long
    as any returned frame can be consumed, and the interpreter removes
    them on exit."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def scratch_table(spark, base: str) -> str:
    """A session-unique catalog table name with atexit DROP.

    Fixed ``saveAsTable`` names collide across concurrent sessions
    sharing a warehouse dir (and across repeated builds in one session);
    a uuid suffix makes each build independent, and the atexit hook
    drops the catalog entry (the external data files live under a
    :func:`scratch_dir` and are cleaned by its own hook)."""
    import atexit
    import uuid

    name = f"{base}_{uuid.uuid4().hex[:12]}"

    def _drop() -> None:
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass  # session already stopped at interpreter exit

    atexit.register(_drop)
    return name
