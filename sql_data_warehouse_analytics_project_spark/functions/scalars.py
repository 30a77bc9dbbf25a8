"""Scalar column helpers (maps reference §2.8 scalar-function surface).

Everything here is a built-in Column expression — JVM-side, inside
whole-stage codegen. No Python UDFs (reference policy restated in
SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type used for money math. The testdata doubles are exact
#: 2-decimal values, so this cast is lossless and makes every downstream
#: sum/product exact and ORDER-INDEPENDENT — which is what lets a
#: distributed Spark aggregate hash-match a single-threaded DuckDB oracle
#: (SURVEY.md §7.2 risk 6).
MONEY = "decimal(18,2)"


def money(c: str | Column) -> Column:
    """Cast a 2-decimal double column to exact decimal for aggregation."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(MONEY)


def safe_div(num: Column, den: Column) -> Column:
    """NULL-on-zero division guard — reference ``NULLIF(x,0)`` idiom
    (``sql/common_queries.py:433``)."""
    return F.when(den == 0, F.lit(None)).otherwise(num / den)


def pct(num: Column, den: Column, scale: int = 2) -> Column:
    """``ROUND(100.0 * num / den, scale)`` with divide guard
    (``sql/common_queries.py:226-228``)."""
    return F.round(safe_div(num * F.lit(100.0), den), scale)


def row_hash(*cols: str, sep: str = "||") -> Column:
    """SHA-256 content hash of the named columns, order-normalized.

    Reference computes this per-row in Python over a *sorted* column dict
    (``medallion/bronze.py:255-268``); here it is columnar
    ``sha2(concat_ws(...))`` with the same sorted-column-name normalization,
    so the hash is deterministic regardless of projection order. NULLs are
    encoded as a sentinel so (NULL, 'x') ≠ ('x', NULL).
    """
    ordered = sorted(cols)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in ordered]
    return F.sha2(F.concat_ws(sep, *parts), 256)


def yyyymmdd_to_date(c: str | Column) -> Column:
    """Cast-or-null for int ``yyyymmdd`` date encodings with 0/garbage values
    (reference sales CSV defect, SURVEY.md §1.4: 19 bad rows → NULL)."""
    c = F.col(c) if isinstance(c, str) else c
    s = c.cast("string")
    return F.when(
        (F.length(s) == 8) & (c > 19000101) & (c < 21000101),
        F.to_date(s, "yyyyMMdd"),
    ).otherwise(F.lit(None).cast("date"))
