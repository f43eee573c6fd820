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


def anomalous_buckets(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "day",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-key anomaly flags over the DENSE resampled grid: buckets whose
    total deviates more than ``z_threshold`` standard deviations from the
    key's own mean — including empty buckets as zeros, so an unusually
    QUIET period flags too (raw aggregates can't see silence; the gap
    fill is what makes it visible). Returns (key, bucket, total, z) for
    flagged buckets; keys with fewer than 2 buckets or zero variance
    drop out.

    Two-phase stats (the events_zscore discipline): per-key mean/std
    derive from exact decimal sum and sum-of-squares aggregates joined
    back — never a per-key window sort; z is IEEE ops in a fixed order
    rounded to 6 dp, so the DuckDB replay is bit-identical.
    """
    grid = resample_gapfill(df, key_col, ts_col, value_col, unit)
    xd = F.coalesce(F.col("total"), F.lit(0)).cast("decimal(18,6)")
    # consumed by the stats aggregate AND the join back — cut the lineage
    # so the grid assembly runs once
    rows = grid.select(key_col, "bucket", xd.alias("_x")).localCheckpoint(
        eager=False
    )
    stats = rows.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum("_x").alias("_s"),
        F.sum(F.col("_x") * F.col("_x")).alias("_ss"),
    )
    m = F.col("_m").cast("double")
    s = F.col("_s").cast("double")
    ss = F.col("_ss").cast("double")
    mean = s / m
    std = F.sqrt((ss - s * s / m) / (m - F.lit(1.0)))
    z = F.round((F.col("_x").cast("double") - mean) / std, 6)
    # variance > 0 guards the zero-variance key explicitly (otherwise a
    # 1-ulp x-vs-mean residual divided by std=0 would flag as +-inf)
    var = (ss - s * s / m) / (m - F.lit(1.0))
    # no broadcast HINT: stats is KEY-COUNT-sized (one row per key — at
    # corpus scale that's billions); AQE broadcasts it when it is small,
    # and the hash join co-partitions with the grid otherwise
    return (
        rows.join(stats, key_col)
        .filter((F.col("_m") >= 2) & (var > 0))
        .select(
            key_col,
            "bucket",
            F.col("_x").alias("total"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > F.lit(float(z_threshold)))
    )
