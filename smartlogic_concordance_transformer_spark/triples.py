"""Triple emission: concordance documents -> (subj, pred, obj) edges.

Each valid document is a star graph (SURVEY.md 1.2): the concept UUID links
to one variant UUID per external authority id. Two predicates:

* ``(concept_uuid, concordsWith, variant_uuid)`` — the equivalence edge the
  connected-components pass links over;
* ``(variant_uuid, identifiesAs, authority:authorityValue)`` — the typed
  identity of each variant node.

Tombstones (empty concordance lists -> DELETE in the reference,
``service.go:321-333``) become op='delete' rows so an Iceberg
``MERGE INTO ... WHEN MATCHED AND op='delete' THEN DELETE`` (or the parquet
ledger fallback) can retract previously-written edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRED_CONCORDS = "concordsWith"
PRED_IDENTIFIES = "identifiesAs"


def emit_triples(good: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """concordances DF (from transform) -> triples DF.

    Output: doc_key, subj, pred, obj, authority, op [+ carry]. Narrow (no
    shuffle): one explode + projections, stays in the fold output's stage.
    """
    carry = tuple(carry)

    # Two chained explodes, ZERO higher-order functions: HOF lambdas
    # (transform/filter) are CodegenFallback — interpreted, allocation-heavy
    # — while explode + CreateArray/CreateNamedStruct/CaseWhen all stay
    # inside whole-stage codegen. First explode yields one row per
    # concordance (or one null row for a tombstone doc); the second turns
    # each into its (concordsWith, identifiesAs) pair. Still a single
    # narrow stage: no shuffle, and the upstream parse UDF runs once.
    e1 = good.select(
        "doc_key",
        "op",
        "concept_uuid",
        *carry,
        F.explode_outer(
            F.when(F.size("concordances") > 0, F.col("concordances"))
        ).alias("_c"),
    )
    c = F.col("_c")
    null_s = F.lit(None).cast("string")
    pair = F.when(
        c.isNotNull(),
        F.array(
            F.struct(
                F.col("concept_uuid").alias("subj"),
                F.lit(PRED_CONCORDS).alias("pred"),
                c["uuid"].alias("obj"),
                c["authority"].alias("authority"),
            ),
            F.struct(
                c["uuid"].alias("subj"),
                F.lit(PRED_IDENTIFIES).alias("pred"),
                F.concat(c["authority"], F.lit(":"), c["authorityValue"]).alias("obj"),
                c["authority"].alias("authority"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("concept_uuid").alias("subj"),
                F.lit(PRED_CONCORDS).alias("pred"),
                null_s.alias("obj"),
                null_s.alias("authority"),
            )
        )
    )
    exploded = e1.select("doc_key", "op", *carry, F.explode(pair).alias("t"))
    return exploded.select(
        "doc_key",
        F.col("t")["subj"].alias("subj"),
        F.col("t")["pred"].alias("pred"),
        F.col("t")["obj"].alias("obj"),
        F.col("t")["authority"].alias("authority"),
        "op",
        *carry,
    )
