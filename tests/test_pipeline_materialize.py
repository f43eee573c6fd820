"""pretraining_pipeline with a durable StageMaterializer: barriers become
persisted parquet tables with ledger entries, a killed run resumes from
the last completed stage, and the materialized result is byte-identical
to the default (localCheckpoint) run."""

import pytest
from pyspark.sql import functions as F

from smartlogic_concordance_transformer_spark.datapipe.curation import (
    pretraining_pipeline,
)
from smartlogic_concordance_transformer_spark.io_tables import StageMaterializer


@pytest.fixture()
def corpus(spark):
    # small corpus with planted failures for every stage: an exact twin
    # (41), a near-dup (42: one-token append of 2), spam (43), a leaked
    # benchmark doc (3), plus a boilerplate header on every doc
    base = [
        (1, "src0", "the quick brown fox jumps over the lazy dog and runs far away today"),
        (2, "src0", "a completely different document about spark engines and shuffle costs in production"),
        (3, "src0", "the benchmark evaluation sentence that must be caught by decontamination checks here"),
        (4, "src1", "yet another ordinary document describing parquet readers and arrow batches nicely"),
        (5, "src1", "fifth document with plain ordinary content about nothing in particular at all"),
        (41, "src1", "the quick brown fox jumps over the lazy dog and runs far away today"),
        (42, "src1", "a completely different document about spark engines and shuffle costs in production zq"),
        (43, "src1", "spam " * 40 + "doc43"),
    ]
    rows = [
        (i, s, "=== COOKIE HEADER ===\n" + t + "\n(c) footer line")
        for i, s, t in base
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    bench = spark.createDataFrame(
        [("the benchmark evaluation sentence that must be caught by decontamination checks here",)],
        "text string",
    )
    return docs, bench


def _run(docs, bench, **kw):
    out = pretraining_pipeline(
        docs, bench, boilerplate_min_docs=3, min_quality=0.5, **kw
    )
    return sorted(tuple(r) for r in out.collect())


def test_materialized_run_matches_default(spark, corpus, tmp_path):
    docs, bench = corpus
    default = _run(docs, bench)
    mat = StageMaterializer(spark, str(tmp_path / "stages"))
    got = _run(docs, bench, materialize=mat)
    assert got == default
    assert mat.computed == [
        "cleaned", "base", "s2", "sigs", "dup_keys", "flagged", "kept_mix"
    ]
    assert mat.reused == []
    # every stage has a committed ledger entry with a row count
    entries = {e["stage"]: e for e in mat.ledger.entries()}
    assert set(entries) == set(mat.computed)
    assert all(e["rows"] >= 0 and e["status"] == "done" for e in entries.values())
    # the planted failures actually exercised the stages
    stages = {r[0]: r[2] for r in got}
    assert stages[41] == "exact_dup" and stages[42] == "near_dup"
    assert stages[43] == "repetition" and stages[3] == "contaminated"


def test_kill_between_stages_then_resume(spark, corpus, tmp_path):
    docs, bench = corpus
    root = str(tmp_path / "stages")
    expected = _run(docs, bench)

    class Killed(RuntimeError):
        pass

    class KillAfter(StageMaterializer):
        def __call__(self, df, stage):
            if len(self.computed) + len(self.reused) == 3:
                raise Killed(stage)  # die before persisting the 4th stage
            return super().__call__(df, stage)

    killer = KillAfter(spark, root)
    with pytest.raises(Killed):
        _run(docs, bench, materialize=killer)
    assert killer.computed == ["cleaned", "base", "s2"]

    # resume over the same root: completed stages are READ, not recomputed
    resumed = StageMaterializer(spark, root)
    got = _run(docs, bench, materialize=resumed)
    assert got == expected
    assert resumed.reused == ["cleaned", "base", "s2"]
    assert resumed.computed == ["sigs", "dup_keys", "flagged", "kept_mix"]


def test_orphaned_data_dir_is_overwritten(spark, corpus, tmp_path):
    # crash AFTER the parquet write but BEFORE the ledger commit leaves an
    # orphaned data dir; the rerun must overwrite it, not trust it
    docs, bench = corpus
    root = str(tmp_path / "stages")
    expected = _run(docs, bench)

    orphan = StageMaterializer(spark, root)
    # fake the crash: persist "cleaned" with WRONG content, no ledger entry
    docs.limit(1).select(
        "doc_id", F.lit("garbage").alias("clean")
    ).write.parquet(str(tmp_path / "stages" / "cleaned"))

    got = _run(docs, bench, materialize=orphan)
    assert got == expected
    assert "cleaned" in orphan.computed and orphan.reused == []


def test_fingerprint_mismatch_refuses_stale_stages(spark, corpus, tmp_path):
    # a rerun over the same root with changed params/input must NOT
    # silently reuse persisted stages (the r5 ADVICE item: the ledger
    # keyed on stage name only) — the fingerprint stamps every entry and
    # resume refuses on mismatch
    docs, bench = corpus
    root = str(tmp_path / "stages")
    first = StageMaterializer(spark, root, fingerprint="params-v1")
    _run(docs, bench, materialize=first)
    assert all(e["fingerprint"] == "params-v1" for e in first.ledger.entries())

    # same fingerprint: resume reuses everything
    again = StageMaterializer(spark, root, fingerprint="params-v1")
    _run(docs, bench, materialize=again)
    assert again.computed == [] and len(again.reused) == 7

    # changed fingerprint: refuse, naming both fingerprints
    changed = StageMaterializer(spark, root, fingerprint="params-v2")
    with pytest.raises(ValueError, match="params-v1.*params-v2"):
        _run(docs, bench, materialize=changed)

    # an unfingerprinted run must not consume a fingerprinted root either
    unfp = StageMaterializer(spark, root)
    with pytest.raises(ValueError, match="fingerprint"):
        _run(docs, bench, materialize=unfp)


def test_footer_rows_falls_back_on_corrupt_footer(spark, tmp_path):
    # pq.read_metadata raises pyarrow ArrowInvalid (NOT OSError) on a
    # truncated footer — the post-write crash path the fallback exists
    # for; with a session it must fall back to the Spark count over the
    # intact files' directory, without one it must re-raise
    import pyarrow as pa
    import pytest

    from smartlogic_concordance_transformer_spark.io_tables import (
        _parquet_footer_rows,
    )

    path = str(tmp_path / "t")
    spark.range(10).write.parquet(path)
    assert _parquet_footer_rows(path) == 10
    with open(f"{path}/corrupt.parquet", "wb") as f:
        f.write(b"PAR1 not a real footer")
    with pytest.raises(pa.lib.ArrowInvalid):
        _parquet_footer_rows(path, spark=None)
    # with a session the ArrowInvalid must be swallowed and the Spark
    # count taken instead — exercise the except branch directly on an
    # intact table (metadata read stubbed to raise, Spark can still read)
    import os
    import pyarrow.parquet as pq

    os.remove(f"{path}/corrupt.parquet")

    def boom(*a, **k):
        raise pa.lib.ArrowInvalid("truncated footer")

    real = pq.read_metadata
    pq.read_metadata = boom
    try:
        assert _parquet_footer_rows(path, spark=spark) == 10
        with pytest.raises(pa.lib.ArrowInvalid):
            _parquet_footer_rows(path, spark=None)
    finally:
        pq.read_metadata = real
