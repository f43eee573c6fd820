"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for the sandbox (local[N], single JVM) but every knob is
the one you would set on a 1000-executor cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow on (the one
pandas UDF in the parse stage exchanges Arrow batches), shuffle partitions
sized to cores at small SF and to data volume at large SF.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the spark-submit --py-files story).

    On a real cluster the job is submitted with ``--py-files pkg.zip``; when
    the session is built programmatically (tests, notebooks, the driver's
    verify harness) we zip the package and ``addPyFile`` it so executor
    Python workers can unpickle the parse UDF regardless of the caller's
    cwd/sys.path.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), "smartlogic_concordance_transformer_spark_pkg"
    )
    archive = shutil.make_archive(
        zip_path, "zip", root_dir=root, base_dir=os.path.basename(pkg_dir)
    )
    spark.sparkContext.addPyFile(archive)


def get_spark(
    app_name: str = "smartlogic-concordance-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # NOTE (r8): a spark.sql.files.minPartitionNum=cores floor (+
        # lower openCostInBytes) was tried and REVERTED with
        # measurements: the big scan-bound job (the 600k-doc KG fold) is
        # CPU-oversubscription-bound at local[N] (N JVM task threads + N
        # Python workers on N cores), so extra splits bought nothing
        # there, while every multi-stage query paid ~10-25% more in
        # per-stage task overhead at bench scale. Fan-out operators that
        # need parallelism ahead of an expensive stage spread explicitly
        # (see __spark_entry__._spread). Details in OPTIMIZATION_r08.md.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Throughput collector: this engine's hot path is allocation-heavy
        # (strings, Arrow buffers); ParallelGC measured ~2x faster than G1
        # on the 32-thread local pipeline. Harmless on real executors.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
