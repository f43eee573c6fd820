"""Data-quality constraint suite (the Deequ idea, Spark-first).

A 100 TB ingest needs declarative validation BEFORE expensive downstream
stages: nulls where keys should be, duplicate keys, out-of-range values,
malformed strings, broken foreign keys. This module turns a constraint
list into ONE aggregation pass (each scalar constraint is a
``sum(case when violated)`` — map-side combinable, no per-constraint
scan) plus one slim anti-join per referential constraint, and returns a
tidy report frame ``(constraint, column, total, violations, passed)``.

The job-level analog is ``metrics.gtg_check`` (ledger completeness /
count conservation); this is the data-level contract. Everything stays
in-plan — no driver-side row iteration; the report itself is a
DataFrame built by unpivoting the single aggregate row.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``name`` (kind), ``column`` (reported label) and a
    violation predicate built lazily against the checked frame."""

    name: str
    column: str
    violated: Column | None = None  # null for the non-predicate kinds
    ref: tuple[DataFrame, str] | None = None
    unique_cols: tuple[str, ...] | None = None


def not_null(col: str) -> Check:
    return Check("not_null", col, F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    c = F.col(col)
    return Check(
        "in_range", col, c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
    )


def matches(col: str, regex: str) -> Check:
    c = F.col(col)
    return Check("matches", col, c.isNull() | ~c.rlike(regex))


def in_set(col: str, values: list) -> Check:
    c = F.col(col)
    return Check("in_set", col, c.isNull() | ~c.isin(values))


def unique(*cols: str) -> Check:
    return Check("unique", ",".join(cols), unique_cols=tuple(cols))


def ref_integrity(col: str, other: DataFrame, other_col: str) -> Check:
    return Check("ref_integrity", col, ref=(other, other_col))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every constraint; returns one report row per check.

    Plan shape: all predicate checks fold into ONE ``agg`` over one scan
    (plus ``count`` for the total); each ``unique`` adds an exact
    ``count_distinct`` to the same aggregate; each ``ref_integrity``
    is a broadcast-right anti-join count over the child's key column
    only (column-pruned). ``violations`` for ``unique`` = rows beyond
    the first occurrence of each duplicated key tuple.
    """
    if not checks:
        raise ValueError("no checks given")
    aggs = [F.count(F.lit(1)).alias("_total")]
    labels: list[tuple[str, str, str]] = []  # (name, column, agg alias)
    for i, ch in enumerate(checks):
        alias = f"_v{i}"
        if ch.ref is not None:
            continue  # joined separately below
        if ch.unique_cols is not None:
            aggs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in ch.unique_cols])
                ).alias(alias)
            )
        else:
            aggs.append(
                F.sum(F.when(ch.violated, 1).otherwise(0)).alias(alias)
            )
        labels.append((ch.name, ch.column, alias))
    row = df.agg(*aggs)

    stacked = ", ".join(
        f"'{name}', '{col}', cast({alias} as long)" for name, col, alias in labels
    )
    report = row.selectExpr(
        f"stack({len(labels)}, {stacked}) as (constraint, column, violations)",
        "_total as total",
    ).select("constraint", "column", "total", "violations")

    for ch in checks:
        if ch.ref is None:
            continue
        other, other_col = ch.ref
        keys = other.select(F.col(other_col).alias(ch.column)).distinct()
        orphans = (
            df.select(ch.column)
            .filter(F.col(ch.column).isNotNull())
            .join(F.broadcast(keys), ch.column, "anti")
        )
        part = orphans.agg(
            F.lit(ch.name).alias("constraint"),
            F.lit(ch.column).alias("column"),
            F.lit(None).cast("long").alias("total"),
            F.count(F.lit(1)).alias("violations"),
        )
        # total for ref checks = the parent frame's row count; reuse the
        # aggregate row rather than a second scan
        part = part.crossJoin(F.broadcast(row.select("_total"))).select(
            "constraint", "column", F.col("_total").alias("total"), "violations"
        )
        report = report.unionByName(part)

    return report.withColumn("passed", F.col("violations") == 0)


def corpus_report(
    df,
    source_col: str = "source",
    text_col: str = "text",
    lang_col: str | None = "lang",
):
    """Per-source corpus mixing report — the table a data-curation run
    publishes next to its output: (source, n_docs, n_tokens,
    mean_quality, n_lang_en). One single-pass map-side-combinable
    aggregation over one scan; token and quality expressions are the
    shared ``text.py`` definitions, so the report cannot drift from the
    filters that act on those signals. mean_quality sums exact decimals
    (quality is quarter-valued) and divides once (the zscore
    discipline)."""
    from pyspark.sql import functions as F

    from .text import quality_score, token_count

    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(text_col)).alias("n_tokens"),
        F.sum(quality_score(text_col).cast("decimal(18,6)")).alias("_q"),
    ]
    if lang_col is not None:
        aggs.append(
            F.sum(
                F.when(F.col(lang_col) == "en", F.lit(1)).otherwise(F.lit(0))
            ).alias("n_lang_en")
        )
    out = df.groupBy(source_col).agg(*aggs)
    return out.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.col("_q").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("mean_quality"),
        *(["n_lang_en"] if lang_col is not None else []),
    )
