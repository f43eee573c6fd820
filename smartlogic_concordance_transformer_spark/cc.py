"""Entity linking: connected components over the concordance edge set.

Concepts that share a derived variant UUID (or concord with each other)
form one equivalence class; the canonical node is the lexicographic-min
UUID in the class. The reference has no cross-document linking at all (one
Kafka message = one star), so this operator is new design mandated by the
north rule, not parity.

Algorithm: iterative min-label propagation (the alternating-min-id /
hash-to-min family of Kiveris et al., "Connected Components in MapReduce
and Beyond", SOCC'14) expressed as DataFrame joins:

    labels(node) <- min(labels(node), min over neighbors' labels)

repeated until fixpoint. Per iteration: one shuffle-join (edges x labels)
+ one min-aggregation. Scale properties:

* ``min`` is partially aggregatable -> map-side combine defuses the
  reduce-side skew of hot canonical hubs automatically;
* the join side is salt-able: AQE skew-join splitting is on, and an
  explicit ``salt`` parameter pre-splits known-hot authority prefixes by
  appending a salt bucket to the join key (each hot node's neighbor list
  is split across S partitions, min-merged afterwards);
* lineage is truncated every iteration with ``localCheckpoint`` so plans
  don't grow (a 20-iteration loop otherwise compounds into a plan Spark
  spends minutes optimizing);
* iteration count is bounded by graph diameter; concordance graphs are
  near-star (diameter <= a few hops), so expect 3-5 iterations. A ``max_iter``
  guard raises rather than silently emitting a half-converged labeling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    pass


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    return fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).filter(
        F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_iter: int = 25,
    salt: int = 0,
) -> DataFrame:
    """Edge list -> (node, component) with component = min node id reachable.

    ``salt > 0`` splits each node's incoming messages across ``salt``
    buckets before the min-merge — use for graphs with mega-hubs where a
    single reduce key would otherwise own millions of rows. (With salt=0
    map-side partial min already handles moderate skew.)
    """
    spark = edges.sparkSession
    sym = _symmetrize(edges, src, dst).persist()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        msgs = (
            sym.join(labels.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), "label")
        )
        candidates = msgs.unionByName(labels.select("node", "label"))
        if salt > 1:
            # two-phase min: (node, bucket) partial min, then node min
            candidates = (
                candidates.withColumn("bucket", F.pmod(F.xxhash64("label"), F.lit(salt)))
                .groupBy("node", "bucket")
                .agg(F.min("label").alias("label"))
            )
        new_labels = candidates.groupBy("node").agg(F.min("label").alias("label")).localCheckpoint()

        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels.withColumnRenamed("label", "component")
    sym.unpersist()
    raise ConvergenceError(f"connected_components did not converge in {max_iter} iterations")


def canonical_mapping(edges: DataFrame, src: str = "subj", dst: str = "obj", **kw) -> DataFrame:
    """(node, canonical) — canonical = lexicographic min UUID per class."""
    return connected_components(edges, src, dst, **kw).withColumnRenamed("component", "canonical")


def canonical_triples(edges: DataFrame, src: str = "subj", dst: str = "obj", **kw) -> DataFrame:
    """Re-rooted equivalence edges: (canonical, concordsWith, member) for
    every non-canonical member of each class."""
    mapping = canonical_mapping(edges, src, dst, **kw)
    return mapping.filter(F.col("node") != F.col("canonical")).select(
        F.col("canonical").alias("subj"),
        F.lit("concordsWith").alias("pred"),
        F.col("node").alias("obj"),
    )
