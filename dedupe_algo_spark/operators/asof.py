"""As-of (backward temporal) join — Spark-native, no range explosion.

Snapshot corpora are temporal: "which snapshot of this url was live at
time T", "what was the user's latest prior event". Spark has no ASOF
JOIN operator (DuckDB/Pandas do); the naive Spark encodings are both
wrong at scale — an inequality theta-join degenerates to
broadcast-nested-loop, and `join + filter + row_number` materializes
every (left, right) pair sharing a key before pruning to the latest.

The scale-correct encoding is the tagged-union window trick: union
both sides into one stream keyed by the join key, sort each key group
by (ts, side) once, and carry the most recent right-side payload
forward with ``last(payload, ignorenulls=True)`` over an unbounded-
preceding window. Cost: ONE shuffle on the key (the same exchange a
plain equi-join would pay), one per-group sort, zero row
amplification — each side's rows appear exactly once. At equal
timestamps the right row sorts BEFORE the left row, so backward
semantics are inclusive (right_ts ≤ left_ts), matching DuckDB's
``ASOF LEFT JOIN ... ON l.ts >= r.ts``.

Skewed keys behave like any window aggregate (one key group = one
task); at web scale pick the key accordingly (url, user) — the
payload struct is the only extra bytes the shuffle carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of-backward join: every ``left`` row gains the columns of
    the ``right`` row with the greatest ``right_ts`` ≤ ``left_ts`` for
    the same key (NULLs when no prior right row exists — left-outer
    semantics).

    ``right_cols`` limits which right columns are carried (default: all
    non-key, non-ts); each lands as ``<name><suffix>``, plus
    ``<right_ts><suffix>`` with the matched row's timestamp.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    # Both payloads ride the union as structs — no join-back, no row
    # ids (monotonically_increasing_id is recompute-unstable), and the
    # single exchange carries exactly the bytes an equi-join would.
    rpay = F.struct(
        F.col(right_ts).alias(right_ts), *[F.col(c) for c in right_cols]
    )
    lpay = F.struct(*[F.col(c) for c in left.columns])
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),  # right sorts first at equal ts
        rpay.alias("_pay"),
        F.lit(None).cast(
            left.select(lpay.alias("_l")).schema["_l"].dataType
        ).alias("_lpay"),
    )
    l_stream = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            right.select(rpay.alias("_r")).schema["_r"].dataType
        ).alias("_pay"),
        lpay.alias("_lpay"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l_stream)
        .withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
        .where(F.col("_side") == 1)
    )
    sel = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    sel.append(F.col(f"_m.{right_ts}").alias(f"{right_ts}{suffix}"))
    sel.extend(F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in right_cols)
    return out.select(*sel)
