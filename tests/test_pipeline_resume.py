"""End-to-end pipeline + checkpoint/resume semantics over the synthetic
source generator."""

import json
import os
import shutil

from pyspark.sql import functions as F

from smartlogic_concordance_transformer_spark.gen import generate_source_repos
from smartlogic_concordance_transformer_spark.io_tables import CheckpointLedger
from smartlogic_concordance_transformer_spark.pipeline import run_pipeline

N_DOCS = 1500
N_BUCKETS = 8


def _triples_set(spark, root):
    return {
        (r.subj, r.pred, r.obj, r.op)
        for r in spark.read.parquet(os.path.join(root, "triples")).collect()
    }


def test_generator_is_deterministic(spark):
    a = generate_source_repos(spark, 200, seed=5).orderBy("path").collect()
    b = generate_source_repos(spark, 200, seed=5).orderBy("path").collect()
    assert a == b
    c = generate_source_repos(spark, 200, seed=6).orderBy("path").collect()
    assert a != c


def test_generator_covers_all_scenarios(spark):
    src = generate_source_repos(spark, 2000, seed=11)
    from smartlogic_concordance_transformer_spark.transform import transform

    good, quar = transform(src)
    statuses = {r.status for r in quar.select("status").distinct().collect()}
    assert statuses == {"SyntacticallyIncorrect", "SemanticallyIncorrect"}
    ops = {r.op for r in good.select("op").distinct().collect()}
    assert ops == {"upsert", "delete"}
    errors = " | ".join(r.error for r in quar.select("error").distinct().collect())
    for marker in (
        "duplicate TME id values",
        "is not a valid TME Id",
        "Type has not been set",
        "concept type not allowed",
        "More than 1 concept",
        "does not support concordance",
        "Missing/invalid @graph field",
        "invalid json",
    ):
        assert marker in errors, marker


def test_pipeline_run_and_resume(spark, tmp_path):
    out = str(tmp_path / "kg")
    src = generate_source_repos(spark, N_DOCS, seed=7)
    m1 = run_pipeline(spark, src, out, n_buckets=N_BUCKETS)
    assert set(CheckpointLedger(out).done_buckets()) == set(range(N_BUCKETS))
    baseline = _triples_set(spark, out)
    assert baseline
    assert m1["totals"].get("docs_valid", 0) > 0
    assert m1["totals"].get("docs_SyntacticallyIncorrect", 0) > 0
    assert os.path.exists(os.path.join(out, "run_manifest.json"))

    # Kill-simulation: drop two buckets' ledger entries; resume must
    # recompute exactly those and leave the final table identical.
    for b in (1, 4):
        os.remove(os.path.join(out, "_ledger", f"bucket={b}.json"))
    m2 = run_pipeline(spark, src, out, n_buckets=N_BUCKETS)
    assert set(CheckpointLedger(out).done_buckets()) == set(range(N_BUCKETS))
    assert _triples_set(spark, out) == baseline
    # resume run only touched the two pending buckets, and the merged
    # manifest still carries the full-run totals
    assert {int(b) for b in m2["touched_buckets"]} <= {1, 4}
    assert m2["totals"] == m1["totals"]


def test_pipeline_single_parse_pass(spark, tmp_path):
    # the op-typed unified frame is persisted before the three-sink
    # fan-out, so every source row flows through the parse stage exactly
    # once per run — an unpersisted fan-out would show 3x here
    acc = spark.sparkContext.accumulator(0)

    @F.udf("string")
    def counted(c):
        acc.add(1)
        return c

    src = generate_source_repos(spark, 300, seed=9).withColumn(
        "content", counted("content")
    )
    run_pipeline(spark, src, str(tmp_path / "kg3"), n_buckets=4, run_cc=False)
    assert acc.value == 300


def test_gtg_report_and_injected_mismatch(spark, tmp_path):
    from smartlogic_concordance_transformer_spark.metrics import gtg_check

    out = str(tmp_path / "kg4")
    src = generate_source_repos(spark, 400, seed=13)
    m = run_pipeline(spark, src, out, n_buckets=4, run_cc=False)
    assert m["gtg"]["ok"]
    assert m["gtg"]["ledger_complete"]
    assert m["gtg"]["mismatches"] == []

    # injected fault 1: clobber one bucket of the durable triples output
    b = next(
        int(k)
        for k, v in m["per_bucket"].items()
        if sum(x for name, x in v.items() if name.startswith("triples_")) > 0
    )
    shutil.rmtree(os.path.join(out, "triples", f"bucket={b}"))
    m2 = gtg_check(spark, out, n_buckets=4)
    assert not m2["gtg"]["ok"]
    assert any(
        x["check"] == "triples_durable" and x["bucket"] == b
        for x in m2["gtg"]["mismatches"]
    )

    # injected fault 2: a missing ledger entry flips ledger_complete
    os.remove(os.path.join(out, "_ledger", "bucket=2.json"))
    m3 = gtg_check(spark, out, n_buckets=4)
    assert not m3["gtg"]["ledger_complete"]
    assert m3["gtg"]["missing_ledger"] == [2]

    # injected fault 3: a CORRUPT (unreadable) table must be flagged as
    # table_unreadable, not conflated with a correctly-empty one
    for f in os.listdir(os.path.join(out, "quarantine")):
        p = os.path.join(out, "quarantine", f)
        if os.path.isdir(p):
            for part in os.listdir(p):
                if part.endswith(".parquet"):
                    with open(os.path.join(p, part), "wb") as fh:
                        fh.write(b"not a parquet file")
    m4 = gtg_check(spark, out, n_buckets=4)
    assert not m4["gtg"]["ok"]
    assert any(
        x["check"] == "table_unreadable" and x["table"] == "quarantine"
        for x in m4["gtg"]["mismatches"]
    )
    # and the whole-table flag suppresses the per-bucket 0-count noise
    assert not any(
        x["check"] == "quarantine_durable" for x in m4["gtg"]["mismatches"]
    )


def test_resume_noop_when_all_done(spark, tmp_path):
    out = str(tmp_path / "kg2")
    src = generate_source_repos(spark, 300, seed=3)
    run_pipeline(spark, src, out, n_buckets=4, run_cc=False)
    before = _triples_set(spark, out)
    m = run_pipeline(spark, src, out, n_buckets=4, run_cc=False)
    assert _triples_set(spark, out) == before
    assert m["touched_buckets"] == []


def test_gtg_infers_n_buckets_from_ledger_meta(spark, tmp_path):
    # trailing buckets with no ledger entry must be visible even when the
    # caller omits n_buckets: the ledger meta is authoritative
    from smartlogic_concordance_transformer_spark.metrics import gtg_check

    out = str(tmp_path / "kg5")
    run_pipeline(spark, generate_source_repos(spark, 300, seed=21), out, n_buckets=6, run_cc=False)
    # drop the LAST bucket's ledger entry — max(done)+1 inference would hide it
    os.remove(os.path.join(out, "_ledger", "bucket=5.json"))
    m = gtg_check(spark, out)  # no n_buckets passed
    assert not m["gtg"]["ledger_complete"]
    assert m["gtg"]["missing_ledger"] == [5]
