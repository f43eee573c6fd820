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
