"""Streaming incremental near-dup ingest: the daily-ingest dedup shape as
an executable Structured Streaming job, not prose.

``minhash_incremental_candidates`` (dedup.py) already gives the per-batch
algebra — new batch banded against the persisted corpus signature table,
existing corpus probed ONCE, never self-joined. This module wires it into
``foreachBatch`` so an unbounded document stream maintains:

* ``<store>/sigs``       — the corpus MinHash signature table (grows by
  one batch per trigger; partitioned by ingest batch),
* ``<store>/candidates`` — every (new, existing|new) near-dup candidate
  pair discovered, tagged with the batch that surfaced it.

Exactly-once per batch: both tables are partitioned by ``batch_id`` and
each micro-batch dynamically overwrites ONLY its own partition, so a
replayed batch (foreachBatch is at-least-once on restart) rewrites the
same rows instead of duplicating them — the standard idempotent-sink
pattern, same as io_tables' ledger-guarded buckets.

At 100 TB the per-trigger cost is O(new x collisions): the signature
store is scanned once per batch (a columnar scan of 8-byte band hashes,
prunable by band if bucketed) and never self-joined. Not in the
reference (its stream is stateless per-message; streaming.py covers that
path) — this is north-rule new-design surface, the streaming twin of the
batch ``dedup_incremental`` contract query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_incremental_candidates, minhash_signatures

SIGS = "sigs"
CANDIDATES = "candidates"


def _dirs(store_dir: str) -> tuple[str, str]:
    return os.path.join(store_dir, SIGS), os.path.join(store_dir, CANDIDATES)


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — works for any
    scheme Spark can write (local, hdfs://, s3a://). An explicit check
    instead of catching read exceptions: a corrupt store or a transient
    FS failure must PROPAGATE and stop the stream, never be silently
    treated as 'no corpus yet' (which would drop every cross-batch
    near-dup pair for that batch with zero signal)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def read_signature_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The persisted corpus signature table, or None before first batch."""
    sig_dir, _ = _dirs(store_dir)
    if not _hadoop_path_exists(spark, sig_dir):
        return None
    return spark.read.parquet(sig_dir)


def read_candidates(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """All candidate pairs discovered so far, or None if none yet."""
    _, cand_dir = _dirs(store_dir)
    if not _hadoop_path_exists(spark, cand_dir):
        return None
    return spark.read.parquet(cand_dir)


def ingest_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 5,
    bands: int = 16,
    rows_per_band: int = 4,
) -> None:
    """One micro-batch: sign, probe the store, persist pairs + signatures.

    Pure function of (batch rows, store state, batch_id) — shared by the
    streaming sink and by batch backfill loops, so replaying a day through
    either path yields byte-identical tables. Idempotent per batch_id via
    partition overwrite (see module docstring).
    """
    sig_dir, cand_dir = _dirs(store_dir)
    base = read_signature_store(spark, store_dir)
    if base is not None:
        # probe strictly EARLIER batches only: batch ids are monotonic in
        # Structured Streaming, so this both excludes a replayed batch's
        # own previous output and keeps a late replay byte-identical to
        # its original run (it cannot see batches committed after it)
        base = base.filter(F.col("batch_id") < batch_id).drop("batch_id")
    new_rows = batch_df.dropDuplicates([key_col])
    if base is not None:
        # minhash_incremental_candidates requires keys globally unique
        # across both frames; a doc_id re-ingested in a later batch
        # (routine in real streams) would otherwise accumulate duplicate
        # signature rows in the store and make the probe emit degenerate
        # (X, X) self-pairs (base-side rows carry no a != b filter).
        # Anti-join the batch against the store's keys: a re-ingest is a
        # no-op — its signature is already persisted and its pairs were
        # emitted by the batch that first saw it. Cost per trigger is one
        # slim key-column scan of the store joined against the (small)
        # batch, cheaper than signing the re-ingests it removes.
        new_rows = new_rows.join(base.select(key_col), key_col, "left_anti")
    new_sigs = minhash_signatures(
        new_rows,
        text_col=text_col,
        key_col=key_col,
        num_hashes=num_hashes,
        k=k,
    # one computation feeds the probe join (both sides), the candidate
    # write, AND the signature write — cut lineage eagerly or the kernel
    # runs once per consumer
    ).localCheckpoint()
    if base is not None:
        cands = minhash_incremental_candidates(
            new_sigs, base, key_col=key_col, bands=bands, rows_per_band=rows_per_band,
            truncate_lineage=False,
        )
    else:
        # first batch: no corpus yet; new-vs-new only (empty base frame
        # would need a schema — simpler and cheaper to skip the union)
        cands = minhash_incremental_candidates(
            new_sigs, new_sigs.limit(0), key_col=key_col, bands=bands,
            rows_per_band=rows_per_band, truncate_lineage=False,
        )
    (
        cands.withColumn("batch_id", F.lit(batch_id))
        .repartition(1)  # candidate sets are tiny relative to the corpus
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(cand_dir)
    )
    (
        new_sigs.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(sig_dir)
    )


def start_incremental_dedup_stream(
    source: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 5,
    bands: int = 16,
    rows_per_band: int = 4,
):
    """Attach the incremental-dedup sink to a streaming DataFrame of
    (key_col, text_col) documents and start it. Returns the
    StreamingQuery; candidates/signatures land under ``store_dir``."""
    spark = source.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, store_dir,
            text_col=text_col, key_col=key_col, num_hashes=num_hashes,
            k=k, bands=bands, rows_per_band=rows_per_band,
        )

    return (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
