"""Embedding-vector utilities: normalization and int8 quantization —
the storage/transport layer of an embedding pipeline. At 100 TB of
float32 vectors, symmetric int8 cuts the footprint 4× (and the shuffle
bytes of every downstream join with it) at a bounded reconstruction
error of scale/2 per element; ANN recall loss is typically negligible
at 8 bits.

All column-expression math (`transform`/`aggregate` folds, no UDFs),
double-precision, deterministic — every value has an exact ANSI-SQL
twin so the oracle replays quantization bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def l2_norm(vec: str | Column) -> Column:
    v = _as_col(vec)
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )


def normalize(vec: str | Column) -> Column:
    """Unit-length copy of the vector (NULL for zero/empty vectors —
    a zero embedding has no direction and should not silently pass)."""
    v = _as_col(vec)
    n = l2_norm(v)
    return F.when(n > 0, F.transform(v, lambda x: x.cast("double") / n)).otherwise(
        F.lit(None)
    )


def int8_scale(vec: str | Column) -> Column:
    """Symmetric per-vector quantization scale: max|v| / 127 (0 for the
    all-zero vector — its quantized form is all zeros)."""
    v = _as_col(vec)
    return (
        F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x.cast("double"))))
        / 127.0
    )


def quantize_int8(vec: str | Column) -> Column:
    """Symmetric int8 code: round(v / scale) ∈ [-127, 127] per element
    (round = half-away-from-zero in both Spark and DuckDB, so codes are
    engine-identical). Pair with :func:`int8_scale` — reconstruction is
    ``code * scale`` with error ≤ scale/2 per element."""
    v = _as_col(vec)
    s = int8_scale(v)
    return F.when(s > 0, F.transform(v, lambda x: F.round(x.cast("double") / s).cast("tinyint"))).otherwise(
        F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    )


def dequantize_int8(codes: str | Column, scale: str | Column) -> Column:
    q = _as_col(codes)
    s = _as_col(scale)
    return F.transform(q, lambda x: x.cast("double") * s)
