"""Deterministic negative sampling for KG-embedding training data.

TransE-family training (Bordes et al., NIPS'13) needs, for every
positive triple, k corrupted triples with the head or tail replaced by a
"random" entity. At 100 TB the sampling must be deterministic (rerun /
resume / engine-identical — the repo's no-RNG discipline) and must not
collect the entity vocabulary to the driver.

Construction — a consistent-hash ring probed with the repo's md5 bridge:

* every entity gets a 60-bit position ``h = md5_long60(entity)``;
* the i-th negative for triple t targets position
  ``g = md5_long60(t, i)`` and picks the entity with the SMALLEST
  ``h >= g``, wrapping to the global minimum — the classic
  consistent-hashing successor rule. For ideal hashes each entity is
  chosen proportionally to its hash-gap, i.e. asymptotically uniform;
  what matters for training is that it is fixed, corpus-wide, and
  engine-portable.

Scale shape: the successor lookup is NOT a global sort/window (a
single-task timeline at corpus scale). The ring is cut into ``2**bits``
buckets by the hash's top bits; a target probes its OWN bucket (entries
``>= g``, priority 0) and the NEXT bucket (all entries, priority 1 —
``(b+1) mod 2**bits``, so the wraparound lands on bucket 0 whose min IS
the global min), and takes ``min(priority, h, entity)``. Exactness of
the 2-bucket probe requires every bucket nonempty — runtime-asserted
(one count; with |E| ≫ 2**bits an empty bucket has ~e^-(E/2^bits)
probability). Each probe is an equi-join on the bucket id: candidates
per target ≈ 2·|E|/2**bits, tunable.

Negatives that collide with the original entity are dropped (not
resampled) — deterministic, oracle-replayable, and an expected loss of
only ~k/|E| per positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import md5_long60


def negative_samples(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    n_neg: int = 2,
    corrupt: str = "obj",
    entities: DataFrame | None = None,
    bits: int | None = None,
    salt: str = "neg",
    check_buckets: bool = True,
) -> DataFrame:
    """(subj, pred, obj, i, neg) — for every positive triple, up to
    ``n_neg`` deterministic corruption entities for the ``corrupt`` slot
    (the trainer substitutes ``neg`` into that slot). ``entities``
    defaults to the triple set's own subj ∪ obj vocabulary.

    ``bits=None`` (default) sizes the ring for ~32 entities per bucket
    from one count of the vocabulary — the RESULT is bits-invariant (the
    successor rule never mentions buckets), only the probe fan-out
    changes, so callers can tune freely."""
    if corrupt not in (subj, obj, "subj", "obj"):
        raise ValueError(f"corrupt must be the subj or obj column, got {corrupt!r}")
    if bits is not None and not 1 <= bits <= 20:
        raise ValueError("bits must be in [1, 20]")
    if n_neg < 1:
        raise ValueError("n_neg must be >= 1")
    corrupt_col = subj if corrupt in (subj, "subj") else obj

    if entities is None:
        entities = (
            triples.select(F.col(subj).alias("_ent"))
            .unionByName(triples.select(F.col(obj).alias("_ent")))
            .distinct()
        )
    else:
        entities = entities.select(F.col(entities.columns[0]).alias("_ent")).distinct()
    if bits is None:
        entities = entities.localCheckpoint()
        n_ents = entities.count()
        bits = max(1, min(20, (n_ents // 32).bit_length() - 1 if n_ents >= 64 else 1))
    n_buckets = 1 << bits
    shift = 60 - bits
    ring = entities.select(
        "_ent", md5_long60("_ent", f"{salt}:e").alias("_h")
    ).withColumn("_rb", F.shiftright("_h", shift))
    if check_buckets:
        n_nonempty = ring.select("_rb").distinct().count()
        if n_nonempty != n_buckets:
            raise ValueError(
                f"hash ring has {n_buckets - n_nonempty} empty buckets at "
                f"bits={bits} — the 2-bucket successor probe would be "
                "inexact; lower bits for this vocabulary size"
            )

    targets = triples.select(subj, pred, obj).withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.lit(n_neg)))
    )
    tkey = F.concat_ws("\x1f", F.col(subj), F.col(pred), F.col(obj), F.col("i"))
    targets = targets.withColumn("_g", md5_long60(tkey, f"{salt}:t")).withColumn(
        "_tb", F.shiftright("_g", shift)
    )
    probes = targets.withColumn("_j", F.explode(F.array(F.lit(0), F.lit(1)))).withColumn(
        "_rb", F.pmod(F.col("_tb") + F.col("_j"), F.lit(n_buckets))
    )
    cand = (
        probes.join(ring, "_rb")
        .filter((F.col("_j") == 1) | (F.col("_h") >= F.col("_g")))
        .groupBy(subj, pred, obj, "i")
        .agg(
            F.min(
                F.struct(
                    F.col("_j").alias("p"),
                    F.col("_h").alias("h"),
                    F.col("_ent").alias("ent"),
                )
            ).alias("_pick")
        )
    )
    return cand.select(
        subj, pred, obj, "i", F.col("_pick.ent").alias("neg")
    ).filter(F.col("neg") != F.col(corrupt_col))
