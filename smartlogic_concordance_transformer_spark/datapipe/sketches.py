"""Approximate sketches: the sublinear-state answers a 100 TB scan needs.

Exact `count(distinct x)` shuffles every distinct value; exact
percentiles sort or hold all values per group. At corpus scale the
sketch versions are the only answers that fit in memory: HyperLogLog++
for cardinality (`approx_count_distinct`, relative standard deviation
`rsd`), and Spark's Greenwald-Khanna variant for quantiles
(`approx_percentile`, bounded rank error). Both are map-side-combinable
aggregates — state per task is the sketch, not the data.

Honesty note (why these are NOT in the DuckDB oracle gate): sketch
outputs are implementation-defined — DuckDB's HLL and quantile sketches
produce different estimates for the same input, so cross-engine
hash-equality is the wrong check. The contract here is the ERROR BOUND,
asserted against the exact answer in pytest
(`tests/test_datapipe.py::test_distinct_count_estimate_within_rsd`,
`::test_quantile_estimate_within_rank_error`). HLL estimation is
order-insensitive (register maxima), so reruns and repartitions agree;
the quantile sketch's merge order can shift estimates within the bound,
so only the bound — not the exact value — is the contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_count_estimate(
    df: DataFrame,
    col: str,
    group_by: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct count per group (or global): ``n_distinct``
    with relative standard deviation ``rsd``. Shuffle payload per group
    is one HLL sketch (~1.04/rsd² bytes-ish), never the value set."""
    agg = F.approx_count_distinct(col, rsd=rsd).alias("n_distinct")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def quantile_estimate(
    df: DataFrame,
    col: str,
    quantiles: list[float],
    group_by: list[str] | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate quantiles per group (or global): ``qs`` is an array
    aligned with ``quantiles``. Rank error ≤ 1/accuracy of the group
    size; state per task is the sketch."""
    if not quantiles or not all(0.0 <= q <= 1.0 for q in quantiles):
        raise ValueError("quantiles must be non-empty values in [0, 1]")
    agg = F.percentile_approx(col, quantiles, accuracy).alias("qs")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def heavy_hitters(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Misra-Gries heavy hitters: (value, est_count) for the candidate
    frequent items of ``col``, using k counters of state PER TASK instead
    of a corpus-wide groupBy — the single-pass answer to "what are the
    hot keys" that a skew diagnosis runs BEFORE deciding how to salt.

    Guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
    PODS'12): with n total rows, every value whose true frequency
    exceeds n/(k+1) is present, and estimates satisfy
    ``f(x) - n/(k+1) <= est_count(x) <= f(x)`` (never overcounts; the
    decrement step undercounts each partition by at most n_p/(k+1), and
    the per-partition undercounts sum to at most n/(k+1)). Which
    BELOW-THRESHOLD values appear is partitioning-dependent — like the
    quantile sketch, the bound (not the row set) is the contract, so
    this stays outside the cross-engine hash gate.

    Plan: one ``mapInPandas`` pass keeping a k-entry dict per task
    (Arrow-batched, never a per-row Python UDF), then a groupBy over the
    <= k * n_tasks summary rows. The corpus itself is never shuffled.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    import pandas as pd

    out_schema = f"`{col}` string, est bigint"

    def _mg(batches):
        # weighted/batched Misra-Gries (Agarwal et al.): fold each Arrow
        # batch's exact value_counts into the counters, then reduce to
        # <= k entries by subtracting the (k+1)-th largest count from all
        # and dropping the non-positive — same n/(k+1) decrement-mass
        # bound as the row-at-a-time form, no per-row Python loop
        counters: dict[str, int] = {}
        for pdf in batches:
            for v, c in pdf[col].value_counts().items():
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {
                    key: cnt - m for key, cnt in counters.items() if cnt > m
                }
        if counters:
            yield pd.DataFrame(
                {col: list(counters.keys()), "est": list(counters.values())}
            )

    summaries = (
        df.select(F.col(col).cast("string").alias(col))
        .filter(F.col(col).isNotNull())  # nulls are not a "value"
        .mapInPandas(_mg, schema=out_schema)
    )
    return summaries.groupBy(col).agg(F.sum("est").alias("est_count"))
