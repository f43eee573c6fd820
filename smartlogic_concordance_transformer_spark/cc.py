"""Entity linking: connected components over the concordance edge set.

Concepts that share a derived variant UUID (or concord with each other)
form one equivalence class; the canonical node is the lexicographic-min
UUID in the class. The reference has no cross-document linking at all (one
Kafka message = one star), so this operator is new design mandated by the
north rule, not parity.

Algorithm: **alternating large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) — converges in
O(log^2 n) rounds regardless of graph diameter, unlike plain min-label
propagation which needs diameter rounds (a 20k-doc synthetic corpus
already chains shared-id components past 25 hops; found by running the
actual spark-submit job, see tests).

Both star operations are expressed as groupBy-min + join — **never a
collect_list of neighbors**, so a mega-hub's edge list stays distributed
and map-side partial `min` defuses reduce-side skew automatically; AQE
skew-join splitting handles the join side; an explicit ``salt`` pre-splits
known-hot keys two-phase. Lineage is truncated per round with
``localCheckpoint`` so plans don't compound.

    large-star: for each node u, m = min(N(u) ∪ {u});
                emit (v, m) for every neighbor v > u
    small-star: direct edges so u >= v, m = min(N<=(u));
                emit (v, m) for v in N<=(u), plus (u, m)

Fixpoint: the small-star output edge set is stable (checked by count +
order-insensitive hash). Result edges then form a star forest rooted at
each component's minimum node.
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
    ).distinct()


def _min_neighbor(edges: DataFrame, salt: int) -> DataFrame:
    """(u, m) where m = min neighbor of u; optional two-phase salted min
    for mega-hub keys."""
    if salt > 1:
        partial = (
            edges.withColumn("_b", F.pmod(F.xxhash64("v"), F.lit(salt)))
            .groupBy("u", "_b")
            .agg(F.min("v").alias("v"))
        )
        return partial.groupBy("u").agg(F.min("v").alias("m"))
    return edges.groupBy("u").agg(F.min("v").alias("m"))


def _large_star(edges: DataFrame, salt: int) -> DataFrame:
    # neighborhoods are over the undirected graph: symmetrize first
    # (small-star output is directed, so this cannot be assumed).
    # r8: NO distinct on either end of this operator — the loop feeds it
    # small-star output, which is distinct and strictly directed (u > v),
    # so fwd ∪ rev cannot contain duplicates (a pair would need both
    # orientations in the input); and even under duplicate input rows the
    # groupBy-min is unaffected while the duplicate (v, m) outputs are
    # absorbed by small-star's own distincts in the same round. Each
    # removed distinct was a full Exchange per round — at sf0.1 the loop
    # is bound by per-stage scheduling latency, and at scale by shuffled
    # bytes; both shrink.
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = _min_neighbor(sym, salt).withColumn("m", F.least(F.col("m"), F.col("u")))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(sym: DataFrame, salt: int) -> DataFrame:
    directed = sym.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m = _min_neighbor(directed, salt)  # m <= all of N<=(u) < u
    joined = directed.join(m, "u")
    to_min = joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
    self_edge = m.select(F.col("u"), F.col("m").alias("v"))
    return (
        to_min.unionByName(self_edge)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_iter: int = 40,
    salt: int = 0,
) -> DataFrame:
    """Edge list -> (node, component); component = min node id reachable."""
    # canonical directed form (u > v, distinct) — the same invariant
    # small-star output carries, so EVERY round's large-star sees a
    # duplicate-free input (see _large_star); also halves the initial
    # distinct vs materializing both orientations
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    if cur.isEmpty():
        return cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    prev_fp = None
    for i in range(max_iter):
        # lazy checkpoint: the fingerprint action right below materializes
        # it, so each round costs ONE job instead of two (eager checkpoint
        # job + fingerprint job)
        cur = _small_star(_large_star(cur, salt), salt).localCheckpoint(eager=False)
        # The convergence probe is itself a full driver action. Probe
        # every round for the first 3 (small graphs converge immediately),
        # then every 2nd round — a skipped round's stars simply fold into
        # the next probed job, so the action count halves on long chains.
        # Comparing fingerprints 2 rounds apart is still sound: one round
        # is a deterministic function of the edge set that strictly
        # decreases the Kiveris potential until the fixpoint, so the edge
        # set cannot 2-cycle — fp(i) == fp(i-2) already implies fp(i) is
        # the fixpoint (a missed consecutive fixpoint only costs one
        # extra cheap round over the final star forest). The LAST
        # iteration always probes, so the effective iteration budget at
        # the max_iter boundary is unchanged — a graph that used to
        # converge exactly at max_iter still does.
        if i >= 3 and i % 2 == 1 and i != max_iter - 1:
            continue
        fp = _fingerprint(cur)
        if fp == prev_fp:
            # star forest: every remaining edge points node -> root.
            # r8: NO distinct on the assembled output — members rows are
            # unique (cur is distinct), roots rows are unique (their own
            # distinct), and the two sets are disjoint (members have
            # node != component by the u != v filter, roots have node ==
            # component), so the old trailing distinct was a full
            # output-sized Exchange that could never remove a row.
            roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
                "component", F.col("node")
            )
            members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
            return members.unionByName(roots)
        prev_fp = fp
    raise ConvergenceError(f"connected_components did not converge in {max_iter} iterations")


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    **kw,
) -> DataFrame:
    """Daily-ingest entity linking: fold a batch of new concordance edges
    into a persisted ``(node, component)`` label table WITHOUT re-running
    connected components over the whole graph.

    Returns the full updated label table, row-identical to a from-scratch
    ``connected_components`` over (star edges of ``labels``) ∪ ``new_edges``
    — the label table is an exact connectivity encoding (every node points
    at its component root), so only components actually touched by the
    batch can change.

    Plan shape (the 100 TB contract, same family as
    ``minhash_incremental_candidates`` / ``semantic_dedup_incremental_pairs``):

    * the persisted ``labels`` table is NEVER shuffled — it is scanned
      with two broadcast joins (semi for the affected slice, anti for the
      pass-through slice). Both broadcast sides are batch-sized: the
      batch's node set, then the affected component-id set.
    * the iterative CC loop runs ONLY over the affected subgraph — one
      star edge per affected member plus the new edges. Components the
      batch never touches contribute zero edges to the loop.
    * at scale, persist ``labels`` partitioned/bucketed by ``component``:
      the semi/anti scans then partition-prune instead of reading the
      full store.

    Component ids stay consistent with a full recompute: the merged
    class's label is the min node id across all merged old classes and
    any brand-new nodes, which is exactly what CC over star+new edges
    yields. Brand-new nodes (absent from ``labels``) enter via the new
    edges alone.
    """
    new_sym = _symmetrize(new_edges, src, dst)
    batch_nodes = new_sym.select(F.col("u").alias("node")).distinct()
    affected = (
        labels.join(F.broadcast(batch_nodes), "node", "semi")
        .select("component")
        .distinct()
    )
    affected_members = labels.join(F.broadcast(affected), "component", "semi")
    star = affected_members.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    updated = connected_components(
        star.unionByName(new_edges.select(F.col(src), F.col(dst))), src, dst, **kw
    )
    untouched = labels.join(F.broadcast(affected), "component", "anti")
    return untouched.unionByName(updated)


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
