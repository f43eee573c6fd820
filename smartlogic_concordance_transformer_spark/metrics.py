"""Per-partition lineage + metrics (north rule: 'checkpoint-resumable per
partition with lineage + triple-count metrics logged per partition').

One aggregation computes everything per bucket: doc counts by status,
triple counts by predicate/op, and the run manifest is dumped as JSON next
to the ledger. Structured, machine-readable, cheap (single shuffle)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(good: DataFrame, quarantine: DataFrame, triples: DataFrame) -> DataFrame:
    """Per-bucket metric rows: (bucket, metric, value)."""
    doc_ok = good.groupBy("bucket").agg(F.count("*").alias("value")).select(
        "bucket", F.lit("docs_valid").alias("metric"), "value"
    )
    doc_ops = good.groupBy("bucket", "op").agg(F.count("*").alias("value")).select(
        "bucket", F.concat(F.lit("docs_"), F.col("op")).alias("metric"), "value"
    )
    doc_bad = quarantine.groupBy("bucket", "status").agg(F.count("*").alias("value")).select(
        "bucket", F.concat(F.lit("docs_"), F.col("status")).alias("metric"), "value"
    )
    trip = triples.groupBy("bucket", "pred").agg(F.count("*").alias("value")).select(
        "bucket", F.concat(F.lit("triples_"), F.col("pred")).alias("metric"), "value"
    )
    return doc_ok.unionByName(doc_ops).unionByName(doc_bad).unionByName(trip)


def write_run_manifest(root: str, metrics_df: DataFrame, extra: dict | None = None) -> dict:
    rows = metrics_df.collect()
    # Merge with a prior manifest so a resume run (which only recomputes
    # pending buckets) updates those buckets in place instead of clobbering
    # the full-run lineage.
    per_bucket: dict[str, dict[str, int]] = {}
    prior_path = os.path.join(root, "run_manifest.json")
    if os.path.exists(prior_path):
        with open(prior_path) as f:
            per_bucket = json.load(f).get("per_bucket", {})
    touched = {str(r["bucket"]) for r in rows}
    for b in touched:
        per_bucket[b] = {}
    for r in rows:
        per_bucket[str(r["bucket"])][r["metric"]] = int(r["value"])
    totals: dict[str, int] = {}
    for metrics in per_bucket.values():
        for m, v in metrics.items():
            totals[m] = totals.get(m, 0) + v
    manifest = {
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "totals": totals,
        "per_bucket": per_bucket,
        "touched_buckets": sorted(touched, key=int),
        **(extra or {}),
    }
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, "run_manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, path)
    return manifest
