"""Streaming incremental near-dup ingest: the daily-ingest dedup shape as
an executable Structured Streaming job, not prose.

``minhash_incremental_candidates`` (dedup.py) already gives the per-batch
algebra — new batch banded against the persisted corpus signature table,
existing corpus probed ONCE, never self-joined. The same algebra holds
for all three incremental kernels, so the sink is generic over an
``IngestKernel`` (sign, probe) pair: ``minhash_kernel`` (default),
``simhash_kernel`` (8-byte fingerprints, hamming-banded probe), and
``semantic_kernel`` (SemDeDup — assigned ``(key, cell, vec)`` rows,
within-cell cosine probe against fixed centroids). This module wires the
kernel into ``foreachBatch`` so an unbounded document stream maintains:

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
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_incremental_candidates, minhash_signatures

SIGS = "sigs"
CANDIDATES = "candidates"


@dataclass(frozen=True)
class IngestKernel:
    """A pluggable (sign, probe) pair for the incremental ingest sink.

    All three incremental dedup kernels (MinHash, SimHash, SemDeDup)
    share the same per-batch algebra — sign the new rows once, probe the
    persisted corpus table once, never self-join the existing side — so
    the sink is generic over:

    * ``sign``:  batch DataFrame -> signature/fingerprint DataFrame with
      ONE row per ``key_col`` (this is what the store persists,
      partitioned by batch_id — MinHash signatures, SimHash fingerprints,
      or SemDeDup's assigned ``(key, cell, vec)`` rows).
    * ``probe``: (new_sigs, base_sigs) -> candidate pairs ``(a, b, ...)``
      where ``a`` is a new key and ``b`` an existing key or a new key
      with ``a < b`` — the shared contract of
      ``minhash_incremental_candidates`` /
      ``simhash_incremental_candidates`` /
      ``semantic_dedup_incremental_pairs``. Must accept an EMPTY
      base frame (first batch).
    * ``key_col``: the key column name in both frames; keys must be
      globally unique across the stream (the sink enforces this by
      anti-joining re-ingests against the store).
    """

    sign: Callable[[DataFrame], DataFrame]
    probe: Callable[[DataFrame, DataFrame], DataFrame]
    key_col: str = "doc_id"


def minhash_kernel(
    text_col: str = "text",
    key_col: str = "doc_id",
    num_hashes: int = 64,
    k: int = 5,
    bands: int = 16,
    rows_per_band: int = 4,
) -> IngestKernel:
    """The default kernel: MinHash signatures, banded-LSH probe."""

    def sign(df: DataFrame) -> DataFrame:
        return minhash_signatures(
            df, text_col=text_col, key_col=key_col, num_hashes=num_hashes, k=k
        )

    def probe(new_sigs: DataFrame, base_sigs: DataFrame) -> DataFrame:
        # lineage already cut by the sink's localCheckpoint on new_sigs
        return minhash_incremental_candidates(
            new_sigs, base_sigs, key_col=key_col, bands=bands,
            rows_per_band=rows_per_band, truncate_lineage=False,
        )

    return IngestKernel(sign, probe, key_col)


def simhash_kernel(
    text_col: str = "text",
    key_col: str = "doc_id",
    token_hash: Callable | None = None,
) -> IngestKernel:
    """SimHash fingerprints (zero-shuffle sign), 4x16-bit-chunk banded
    popcount probe at hamming <= 3 — the store persists one 8-byte
    fingerprint per key."""
    from .dedup import simhash, simhash_incremental_candidates

    def sign(df: DataFrame) -> DataFrame:
        return simhash(df, text_col=text_col, key_col=key_col, token_hash=token_hash)

    def probe(new_fps: DataFrame, base_fps: DataFrame) -> DataFrame:
        return simhash_incremental_candidates(
            new_fps, base_fps, key_col=key_col, truncate_lineage=False
        )

    return IngestKernel(sign, probe, key_col)


def semantic_kernel(
    centroids: list[list[float]],
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.99,
) -> IngestKernel:
    """SemDeDup over a FIXED centroid table (train once on a seed corpus,
    then stream): sign = scale-invariant spherical assignment (each row
    assigned exactly once, ever — the store persists ``(key, cell,
    vec)``, cell-partitionable at scale); probe = within-cell cosine
    against the persisted assigned corpus."""
    from .similarity import semantic_dedup_incremental_pairs, spherical_assign

    def sign(df: DataFrame) -> DataFrame:
        return spherical_assign(df, centroids, vec_col).select(
            key_col, F.col("_cell").alias("cell"), vec_col
        )

    def probe(new_assigned: DataFrame, base_assigned: DataFrame) -> DataFrame:
        return semantic_dedup_incremental_pairs(
            new_assigned, base_assigned, centroids, threshold=threshold,
            vec_col=vec_col, key_col=key_col, truncate_lineage=False,
            new_assigned=True,
        )

    return IngestKernel(sign, probe, key_col)


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
    kernel: IngestKernel | None = None,
) -> None:
    """One micro-batch: sign, probe the store, persist pairs + signatures.

    Pure function of (batch rows, store state, batch_id) — shared by the
    streaming sink and by batch backfill loops, so replaying a day through
    either path yields byte-identical tables. Idempotent per batch_id via
    partition overwrite (see module docstring).

    ``kernel``: the (sign, probe) pair to run — defaults to the MinHash
    kernel built from the legacy text/hash parameters; pass
    ``simhash_kernel(...)`` or ``semantic_kernel(...)`` to maintain a
    fingerprint or assigned-embedding store instead (one store per
    kernel — signature schemas differ).
    """
    if kernel is None:
        kernel = minhash_kernel(
            text_col=text_col, key_col=key_col, num_hashes=num_hashes,
            k=k, bands=bands, rows_per_band=rows_per_band,
        )
    key_col = kernel.key_col
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
    # one computation feeds the probe join (both sides), the candidate
    # write, AND the signature write — cut lineage eagerly or the sign
    # kernel runs once per consumer
    new_sigs = kernel.sign(new_rows).localCheckpoint()
    # first batch: no corpus yet; new-vs-new only (an empty base frame
    # needs a schema — the signed batch's own limit(0) provides it)
    cands = kernel.probe(new_sigs, base if base is not None else new_sigs.limit(0))
    (
        cands.withColumn("batch_id", F.lit(batch_id))
        # r8: size-driven rebalance instead of an unconditional
        # repartition(1). For the routine tiny candidate set AQE
        # coalesces to one output file exactly as before; a pathological
        # all-collide batch (candidates ~ O(batch^2)) now splits by
        # advisory partition size instead of serializing one task.
        .hint("rebalance")
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
    kernel: IngestKernel | None = None,
):
    """Attach the incremental-dedup sink to a streaming DataFrame of
    (key_col, text_col) documents — or, with ``kernel=semantic_kernel
    (...)``, of (key, embedding) vectors — and start it. Returns the
    StreamingQuery; candidates/signatures land under ``store_dir``."""
    spark = source.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            spark, batch_df, batch_id, store_dir,
            text_col=text_col, key_col=key_col, num_hashes=num_hashes,
            k=k, bands=bands, rows_per_band=rows_per_band, kernel=kernel,
        )

    return (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )
