"""Connected-components property tests: Spark label propagation vs a plain
Python union-find oracle on seeded random graphs (SURVEY.md section 5)."""

import random

import pytest
from pyspark.sql import functions as F

from smartlogic_concordance_transformer_spark.cc import (
    ConvergenceError,
    canonical_triples,
    connected_components,
)


def union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 50, 40), (2, 200, 150), (3, 300, 600)])
def test_cc_matches_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [
        (f"n{rng.randrange(n_nodes):04d}", f"n{rng.randrange(n_nodes):04d}")
        for _ in range(n_edges)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    expected = union_find_components(edges)
    # canonical root per component = min node id
    comp_min = {}
    for n, root in expected.items():
        comp_min.setdefault(root, n)
        comp_min[root] = min(comp_min[root], n)
    expected_canon = {n: comp_min[root] for n, root in expected.items()}

    df = spark.createDataFrame(edges, "subj string, obj string")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == expected_canon


def test_cc_long_chain(spark):
    # path graph: worst case for naive propagation; must still converge
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(40)]
    df = spark.createDataFrame(chain, "subj string, obj string")
    got = {r.node: r.component for r in connected_components(df, max_iter=50).collect()}
    assert set(got.values()) == {"c000"}
    assert len(got) == 41


def test_cc_salted_equals_unsalted(spark):
    rng = random.Random(9)
    edges = [("hub", f"x{i}") for i in range(200)] + [
        (f"x{rng.randrange(200)}", f"y{i}") for i in range(100)
    ]
    df = spark.createDataFrame(edges, "subj string, obj string")
    plain = {r.node: r.component for r in connected_components(df).collect()}
    salted = {r.node: r.component for r in connected_components(df, salt=8).collect()}
    assert plain == salted


def test_cc_convergence_guard(spark):
    chain = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(30)]
    df = spark.createDataFrame(chain, "subj string, obj string")
    with pytest.raises(ConvergenceError):
        connected_components(df, max_iter=2)


def test_canonical_triples_shape(spark):
    edges = [("b", "a"), ("b", "c"), ("d", "e")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    rows = {(r.subj, r.pred, r.obj) for r in canonical_triples(df).collect()}
    assert rows == {
        ("a", "concordsWith", "b"),
        ("a", "concordsWith", "c"),
        ("d", "concordsWith", "e"),
    }


def test_cc_converges_on_chained_shared_id_corpus(spark):
    """Regression: a production-shaped corpus (shared-id pools chained by
    multi-pool docs) has graph diameter far beyond small test graphs; the
    star algorithm must converge where plain label propagation (diameter-
    bound) failed at 25 iterations. Found via the real spark-submit run."""
    from pyspark.sql import functions as F

    from smartlogic_concordance_transformer_spark.gen import generate_source_repos
    from smartlogic_concordance_transformer_spark.transform import transform
    from smartlogic_concordance_transformer_spark.triples import emit_triples

    src = generate_source_repos(spark, 20000, seed=42)
    good, _ = transform(src)
    edges = emit_triples(good).filter(
        (F.col("pred") == "concordsWith") & (F.col("op") == "upsert")
    )
    comp = connected_components(edges, salt=8)
    # partition invariant: every node appears exactly once
    assert comp.count() == comp.select("node").distinct().count()
    # canonical is the component min
    assert comp.filter(F.col("component") > F.col("node")).count() == 0


def _labels_of(spark, edges):
    df = spark.createDataFrame(edges, "subj string, obj string")
    return connected_components(df)


@pytest.mark.parametrize("seed,n_nodes,n_base,n_new", [(11, 60, 50, 12), (12, 250, 200, 40)])
def test_incremental_cc_equals_full_recompute(spark, seed, n_nodes, n_base, n_new):
    from smartlogic_concordance_transformer_spark.cc import incremental_components

    rng = random.Random(seed)

    def mk(n):
        out = []
        while len(out) < n:
            u, v = f"n{rng.randrange(n_nodes):04d}", f"n{rng.randrange(n_nodes):04d}"
            if u != v:
                out.append((u, v))
        return out

    base, new = mk(n_base), mk(n_new)
    labels = _labels_of(spark, base)
    new_df = spark.createDataFrame(new, "subj string, obj string")
    got = {r.node: r.component for r in incremental_components(labels, new_df).collect()}

    full = union_find_components(base + new)
    comp_min = {}
    for n, root in full.items():
        comp_min[root] = min(comp_min.get(root, n), n)
    expected = {n: comp_min[root] for n, root in full.items()}
    assert got == expected


def test_incremental_cc_disjoint_batch_leaves_store_untouched(spark):
    # a batch touching only brand-new nodes must pass every existing label
    # row through unchanged and add exactly the new component
    from smartlogic_concordance_transformer_spark.cc import incremental_components

    labels = _labels_of(spark, [("a", "b"), ("c", "d")])
    before = {(r.node, r.component) for r in labels.collect()}
    new_df = spark.createDataFrame([("x2", "x1")], "subj string, obj string")
    got = {(r.node, r.component) for r in incremental_components(labels, new_df).collect()}
    assert got == before | {("x1", "x1"), ("x2", "x1")}


def test_incremental_cc_merges_across_existing_components(spark):
    # one bridge edge merges two persisted components; the merged label is
    # the min across BOTH old classes (full-recompute semantics)
    from smartlogic_concordance_transformer_spark.cc import incremental_components

    labels = _labels_of(spark, [("m1", "m2"), ("k1", "k2"), ("z1", "z2")])
    new_df = spark.createDataFrame([("m2", "k2")], "subj string, obj string")
    got = {(r.node, r.component) for r in incremental_components(labels, new_df).collect()}
    assert got == {
        ("k1", "k1"), ("k2", "k1"), ("m1", "k1"), ("m2", "k1"),
        ("z1", "z1"), ("z2", "z1"),
    }


def test_incremental_cc_store_is_broadcast_probed_never_shuffled(spark):
    # the persisted label table enters the plan through broadcast semi/anti
    # joins only, so the store is never hash-exchanged. The CC loop's two
    # store probes ran eagerly (checkpoint truncates them); the final plan
    # still carries the pass-through anti join and, inside its broadcast
    # subtree, the batch-node semi probe — both must be BroadcastHashJoin.
    from smartlogic_concordance_transformer_spark.cc import incremental_components

    labels = _labels_of(spark, [("a", "b"), ("c", "d")]).localCheckpoint()
    new_df = spark.createDataFrame([("b", "c")], "subj string, obj string")
    out = incremental_components(labels, new_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
