"""As-of (most-recent-prior) join — the time-series operator Spark has no
built-in for.

For each left row, attach the single right row with the greatest
``right.on <= left.on`` within the same ``by`` keys (pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` semantics, direction='backward').

Scalable shape: **tag + union + running last-non-null window** — one
shuffle on (by, on) total, no per-key driver loop, and no range-join
candidate blowup (a naive ``l JOIN r ON r.ts <= l.ts`` explodes to
O(|l|·|r|) per key before picking the max). Right rows at the exact left
timestamp are visible (<=), matching DuckDB/pandas defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``{prefix}{col}`` for each right value column (and
    ``{prefix}{on}``, the matched right timestamp); nulls when no right
    row precedes. ``by`` defaults to no keying (one global timeline).
    """
    by = list(by or [])
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c not in by]

    # ALL right-row values ride in ONE struct: last-non-null over the
    # struct picks the whole matched row atomically. Filling each column
    # independently would tear rows — a null value in the matched right
    # row would be silently replaced by a stale value from an older row
    # (and different columns could even come from different rows).
    r_struct = F.struct(F.col(on).alias(on), *[F.col(c).alias(c) for c in value_cols])
    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}" for c in [on, *value_cols]
            )
            + ">"
        ).alias("_r"),
    )
    r_tag = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in by and c != on
        ],
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        r_struct.alias("_r"),
    ).select(*l_tag.columns)

    # right rows sort before left rows at equal timestamps so an
    # exact-timestamp right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *[c for c in l_tag.columns if c not in ("_side", "_r")],
        F.col("_side"),
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    m = F.col("_r")
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in left.columns],
            m[on].alias(f"{prefix}{on}"),
            *[m[c].alias(f"{prefix}{c}") for c in value_cols],
        )
    )
