"""Time-series regularization: fixed-step resampling with gap fill.

Event streams are irregular; downstream models (rate monitors, anomaly
scoring, seq2seq training windows) want a dense per-key grid. This
module buckets events to a fixed step, then materializes EVERY bucket
between each key's first and last event — empty buckets appear with
count 0 — and forward-fills the last observed aggregate across gaps.

Scale contract: bucketing is a projection; the aggregate is one
map-side-combinable ``groupBy(key, bucket)``; the dense grid comes from
a per-key ``sequence`` explode whose width is (key's active span /
step) — generated data, never a corpus-sized join against a calendar
table. The forward-fill window partitions by key, bounded by one key's
bucket count (the funnel/doc-rebuild discipline), never corpus size.

Cross-engine float discipline: values sum as decimal(18,6) (exact,
order-independent — the ``q_events_stats`` rule); bucket keys are
``date_trunc`` timestamps so no epoch/timezone arithmetic is involved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNITS = {"hour", "day", "minute", "week", "month"}


def resample_gapfill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Per-key dense time grid at ``unit`` granularity:
    (key, bucket, n, total, filled) where n/total aggregate the key's
    events in that bucket (0 / NULL when empty) and ``filled`` carries
    the last non-empty bucket's total forward across gaps (NULL before
    the first observation — which cannot happen here since grids start
    at each key's first event).

    ``unit`` must be a ``date_trunc`` unit (hour/day/...): bucket
    identity stays a timestamp, so both engines agree without epoch or
    timezone arithmetic.

    Rows with a NULL timestamp have no bucket and are EXCLUDED from the
    grid (they aggregate into a null-bucket group the sequence bounds
    ignore and the grid join never matches) — filter or impute upstream
    if they must count.
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    b = F.date_trunc(unit, F.col(ts_col))
    v = F.col(value_col).cast("decimal(18,6)")
    agg = (
        df.select(F.col(key_col), b.alias("bucket"), v.alias("_v"))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_v").alias("total"))
        .localCheckpoint(eager=False)  # consumed by grid AND the join
    )
    grid = agg.groupBy(key_col).agg(
        F.sequence(
            F.min("bucket"), F.max("bucket"), F.expr(f"interval 1 {unit}")
        ).alias("_bs")
    )
    dense = grid.select(key_col, F.explode("_bs").alias("bucket"))
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dense.join(agg, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            "total",
            F.last("total", ignorenulls=True).over(w).alias("filled"),
        )
    )
