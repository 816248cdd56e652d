"""Presentation scalar functions (C5/C6/C13) — pure built-ins."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNITS = ["B", "KB", "MB", "GB", "TB", "PB"]


def bytes_human(n: Column) -> Column:
    """C5 — log-base-1024 unit formatting (src/lib/utils.ts:8-14):
    '1.5 MB' style, two significant decimals like the reference."""
    expr = F.when(n <= 0, F.lit("0 B"))
    for i, unit in enumerate(_UNITS):
        lo = 1024**i
        hi = 1024 ** (i + 1)
        expr = expr.when(
            (n >= lo) & (n < hi),
            F.concat(
                F.format_number(n / F.lit(float(lo)), 2), F.lit(f" {unit}")
            ),
        )
    return expr.otherwise(F.lit("huge"))


def epoch_to_date(epoch_secs: Column) -> Column:
    """C6 — epoch→date string (ClusterResultsView.tsx:161)."""
    return F.date_format(F.from_unixtime(epoch_secs), "yyyy-MM-dd")


def percent(used: Column, total: Column) -> Column:
    """C13/A11 — round(used/total×100) (ScanQueueView.tsx:182)."""
    return F.when(total == 0, F.lit(0)).otherwise(
        F.round(used / total * 100).cast("int")
    )
