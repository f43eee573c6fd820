"""Streaming incremental near-dup ingest (datapipe/streaming_dedup.py):
three file-source micro-batches through foreachBatch, cross-batch twins
found, store bookkeeping exact, per-batch idempotence on replay."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from smartlogic_concordance_transformer_spark.datapipe.dedup import (
    minhash_incremental_candidates,
    minhash_signatures,
)
from smartlogic_concordance_transformer_spark.datapipe.streaming_dedup import (
    ingest_batch,
    read_candidates,
    read_signature_store,
    start_incremental_dedup_stream,
)

MH = dict(num_hashes=16, k=3, bands=4, rows_per_band=4)


def _text(i: int) -> str:
    # 24 tokens unique to doc i: no accidental shingle overlap across docs
    return " ".join(f"tok{j}x{i}" for j in range(24))


def _batches():
    b0 = [(i, _text(i)) for i in range(10)]
    b1 = [(i, _text(i)) for i in range(10, 20)]
    b1[3] = (13, _text(3))   # exact cross-batch twin of doc 3
    b1[6] = (16, _text(15))  # exact within-batch twin of doc 15
    b2 = [(i, _text(i)) for i in range(20, 30)]
    b2[5] = (25, _text(3))   # twin of docs 3 and 13
    return [b0, b1, b2]


def _write_batch(in_dir, name, rows):
    os.makedirs(in_dir, exist_ok=True)
    tmp = os.path.join(in_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.replace(tmp, os.path.join(in_dir, name))


SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _pairs(df):
    return {(r.a, r.b) for r in df.select("a", "b").collect()}


def test_streaming_incremental_dedup(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches()

    _write_batch(in_dir, "b0.json", batches[0])
    src = spark.readStream.schema(SCHEMA).json(in_dir)
    q = start_incremental_dedup_stream(src, store, ckpt, **MH)
    try:
        q.processAllAvailable()
        for n, rows in (("b1.json", batches[1]), ("b2.json", batches[2])):
            _write_batch(in_dir, n, rows)
            q.processAllAvailable()
    finally:
        q.stop()

    sigs = read_signature_store(spark, store)
    assert sigs.count() == 30
    assert {
        (r.batch_id, r.n) for r in sigs.groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    } == {(0, 10), (1, 10), (2, 10)}

    got = read_candidates(spark, store)
    got_pairs = _pairs(got)
    # planted exact twins are guaranteed candidates (jaccard 1.0 collides
    # in every band); a/b orientation per the operator contract
    assert {(13, 3), (15, 16), (25, 3), (25, 13)} <= got_pairs

    # the streaming run must equal the sequential batch-backfill reference
    expected: set = set()
    base = None
    for rows in batches:
        batch_sigs = minhash_signatures(
            spark.createDataFrame(rows, SCHEMA),
            num_hashes=MH["num_hashes"],
            k=MH["k"],
        ).localCheckpoint()
        probe = base if base is not None else batch_sigs.limit(0)
        expected |= _pairs(
            minhash_incremental_candidates(
                batch_sigs, probe, bands=MH["bands"], rows_per_band=MH["rows_per_band"]
            )
        )
        base = batch_sigs if base is None else base.unionByName(batch_sigs)
    assert got_pairs == expected

    # batch attribution: every pair's a-key belongs to the batch that
    # surfaced it
    for r in got.collect():
        assert r.a // 10 == r.batch_id

    # idempotence: replaying batch 1 (foreachBatch is at-least-once on
    # restart) overwrites its own partitions, never duplicates
    before_sig = sorted(map(tuple, sigs.select("doc_id", "batch_id").collect()))
    before_cand = sorted(map(tuple, got.select("a", "b", "batch_id").collect()))
    ingest_batch(
        spark, spark.createDataFrame(batches[1], SCHEMA), 1, store, **MH
    )
    sigs2 = read_signature_store(spark, store)
    got2 = read_candidates(spark, store)
    assert sorted(map(tuple, sigs2.select("doc_id", "batch_id").collect())) == before_sig
    assert sorted(map(tuple, got2.select("a", "b", "batch_id").collect())) == before_cand


def test_all_collide_batch_still_ingests(spark, tmp_path):
    # r8 (the round-7 watch item): the candidate sink no longer forces a
    # single partition, so a pathological batch in which EVERY document
    # is a near-duplicate of every other (candidates ~ O(batch^2)) must
    # still ingest correctly — all n*(n-1)/2 pairs emitted, and a replay
    # stays idempotent
    store = str(tmp_path / "store")
    n = 40
    rows = [(i, _text(0)) for i in range(n)]
    df = spark.createDataFrame(rows, SCHEMA)
    ingest_batch(spark, df, 0, store, **MH)
    cands = read_candidates(spark, store)
    got = _pairs(cands)
    assert len(got) == n * (n - 1) // 2
    assert all(a < b for a, b in got)
    ingest_batch(spark, df, 0, store, **MH)  # replay: byte-identical
    assert _pairs(read_candidates(spark, store)) == got


def test_reingested_key_is_a_noop(spark, tmp_path):
    # a doc_id re-ingested in a LATER batch (routine in real streams)
    # must not accumulate a duplicate signature row or emit a degenerate
    # (X, X) self-pair — the probe's contract requires keys globally
    # unique across both frames, so the batch is anti-joined against the
    # store's keys and a re-ingest is a no-op
    store = str(tmp_path / "store")
    b0 = [(i, _text(i)) for i in range(5)]
    ingest_batch(spark, spark.createDataFrame(b0, SCHEMA), 0, store, **MH)
    # batch 1: doc 3 re-ingested verbatim, doc 7 new twin of doc 2
    b1 = [(3, _text(3)), (7, _text(2)), (8, _text(8))]
    ingest_batch(spark, spark.createDataFrame(b1, SCHEMA), 1, store, **MH)

    sigs = read_signature_store(spark, store)
    rows = {(r.doc_id, r.batch_id) for r in sigs.select("doc_id", "batch_id").collect()}
    assert (3, 0) in rows and (3, 1) not in rows  # one sig row per key
    assert sigs.count() == 7  # 5 + the 2 genuinely-new docs
    pairs = _pairs(read_candidates(spark, store))
    assert (3, 3) not in pairs
    assert (7, 2) in pairs


def test_streaming_simhash_kernel_equals_backfill(spark, tmp_path):
    """The pluggable SimHash kernel through the SAME foreachBatch sink:
    streaming ingest == sequential batch backfill over the raw operators
    (simhash sign, hamming-banded incremental probe)."""
    from smartlogic_concordance_transformer_spark.datapipe.dedup import (
        simhash,
        simhash_incremental_candidates,
    )
    from smartlogic_concordance_transformer_spark.datapipe.streaming_dedup import (
        simhash_kernel,
    )

    in_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    batches = _batches()

    _write_batch(in_dir, "b0.json", batches[0])
    src = spark.readStream.schema(SCHEMA).json(in_dir)
    q = start_incremental_dedup_stream(src, store, ckpt, kernel=simhash_kernel())
    try:
        q.processAllAvailable()
        for n, rows in (("b1.json", batches[1]), ("b2.json", batches[2])):
            _write_batch(in_dir, n, rows)
            q.processAllAvailable()
    finally:
        q.stop()

    sigs = read_signature_store(spark, store)
    assert sigs.count() == 30 and "simhash" in sigs.columns
    got_pairs = _pairs(read_candidates(spark, store))
    # exact twins have identical fingerprints (hamming 0) — guaranteed
    assert {(13, 3), (15, 16), (25, 3), (25, 13)} <= got_pairs

    expected: set = set()
    base = None
    for rows in batches:
        fps = simhash(spark.createDataFrame(rows, SCHEMA)).localCheckpoint()
        probe = base if base is not None else fps.limit(0)
        expected |= _pairs(simhash_incremental_candidates(fps, probe))
        base = fps if base is None else base.unionByName(fps)
    assert got_pairs == expected


VSCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _vec_batches():
    """30 vectors in 18-d around two centroids (e0, e1): doc i sits in
    cell i % 2 at a distinct angle (cos 0.3 toward the centroid, sin 0.3
    toward basis axis 2 + i//2), so same-cell non-twins have cosine
    cos^2(0.3) ~ 0.913 < 0.99 and never pair; planted twins are SCALED
    copies (scale-invariant assignment + cosine exactly 1)."""
    import math

    def vec(i):
        v = [0.0] * 18
        v[i % 2] = math.cos(0.3)
        v[2 + i // 2] = math.sin(0.3)
        return v

    def scaled(i, s):
        return [x * s for x in vec(i)]

    b0 = [(i, vec(i)) for i in range(10)]
    b1 = [(i, vec(i)) for i in range(10, 20)]
    b1[3] = (13, scaled(3, 2.0))    # cross-batch twin of 3 (cell 1)
    b1[6] = (16, scaled(15, 2.0))   # within-batch twin of 15 (cell 1)
    b2 = [(i, vec(i)) for i in range(20, 30)]
    b2[5] = (25, scaled(3, 0.5))    # twin of 3 and 13
    return [b0, b1, b2]


CENTROIDS = [
    [1.0] + [0.0] * 17,
    [0.0, 1.0] + [0.0] * 16,
]


def _write_vec_batch(in_dir, name, rows):
    os.makedirs(in_dir, exist_ok=True)
    tmp = os.path.join(in_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        for vec_id, emb in rows:
            f.write(json.dumps({"vec_id": vec_id, "embedding": emb}) + "\n")
    os.replace(tmp, os.path.join(in_dir, name))


def test_streaming_semantic_kernel_equals_backfill(spark, tmp_path):
    """The pluggable SemDeDup kernel: the store persists ASSIGNED
    (key, cell, embedding) rows — each vector is assigned exactly once,
    ever — and streaming ingest == sequential backfill over
    spherical_assign + semantic_dedup_incremental_pairs."""
    from smartlogic_concordance_transformer_spark.datapipe.similarity import (
        semantic_dedup_incremental_pairs,
        spherical_assign,
    )
    from smartlogic_concordance_transformer_spark.datapipe.streaming_dedup import (
        semantic_kernel,
    )

    in_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    batches = _vec_batches()

    _write_vec_batch(in_dir, "b0.json", batches[0])
    src = spark.readStream.schema(VSCHEMA).json(in_dir)
    q = start_incremental_dedup_stream(
        src, store, ckpt, kernel=semantic_kernel(CENTROIDS)
    )
    try:
        q.processAllAvailable()
        for n, rows in (("b1.json", batches[1]), ("b2.json", batches[2])):
            _write_vec_batch(in_dir, n, rows)
            q.processAllAvailable()
    finally:
        q.stop()

    sigs = read_signature_store(spark, store)
    assert sigs.count() == 30 and "cell" in sigs.columns
    # scaled twins land in the SAME cell (scale-invariant assignment)
    cells = {r.vec_id: r.cell for r in sigs.collect()}
    assert cells[13] == cells[3] == cells[25] and cells[16] == cells[15]
    got_pairs = _pairs(read_candidates(spark, store))
    assert {(13, 3), (15, 16), (25, 3), (25, 13)} <= got_pairs

    expected: set = set()
    base = None
    for rows in batches:
        na = (
            spherical_assign(
                spark.createDataFrame(rows, VSCHEMA), CENTROIDS, "embedding"
            )
            .select("vec_id", F.col("_cell").alias("cell"), "embedding")
            .localCheckpoint()
        )
        probe = base if base is not None else na.limit(0)
        expected |= _pairs(
            semantic_dedup_incremental_pairs(
                na, probe, CENTROIDS, key_col="vec_id",
                new_assigned=True, truncate_lineage=False,
            )
        )
        base = na if base is None else base.unionByName(na)
    assert got_pairs == expected


def test_streaming_posting_store_equals_sequential(spark, tmp_path):
    # the PostingStore wired as a foreachBatch sink over a file-source
    # stream must equal the sequential two-ingest backfill
    from smartlogic_concordance_transformer_spark.datapipe.ranking import (
        PostingStore,
        inverted_index,
    )

    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    rows0 = [(1, "alpha beta gamma"), (2, "beta gamma delta")]
    rows1 = [(3, "gamma delta epsilon"), (4, "alpha epsilon")]

    store = PostingStore(str(tmp_path / "idx"), n_buckets=8)
    _write_batch(in_dir, "b0.json", rows0)
    src = spark.readStream.schema(SCHEMA).json(in_dir)
    q = (
        src.writeStream.foreachBatch(lambda df, i: store.ingest(df, i))
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(in_dir, "b1.json", rows1)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r.token: (r.df_t, tuple(r.postings))
           for r in store.posting_lists(spark, min_df=1, max_df_frac=1.0).collect()}
    all_docs = spark.createDataFrame(rows0 + rows1, SCHEMA)
    want = {r.token: (r.df_t, tuple(r.postings))
            for r in inverted_index(all_docs, min_df=1, max_df_frac=1.0).collect()}
    assert got == want
