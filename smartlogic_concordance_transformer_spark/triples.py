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
    exploded = good.select(
        "doc_key",
        "concept_uuid",
        "op",
        *carry,
        F.explode_outer("concordances").alias("c"),
    )
    concords = exploded.filter(F.col("c").isNotNull()).select(
        "doc_key",
        F.col("concept_uuid").alias("subj"),
        F.lit(PRED_CONCORDS).alias("pred"),
        F.col("c")["uuid"].alias("obj"),
        F.col("c")["authority"].alias("authority"),
        "op",
        *carry,
    )
    identifies = exploded.filter(F.col("c").isNotNull()).select(
        "doc_key",
        F.col("c")["uuid"].alias("subj"),
        F.lit(PRED_IDENTIFIES).alias("pred"),
        F.concat(F.col("c")["authority"], F.lit(":"), F.col("c")["authorityValue"]).alias("obj"),
        F.col("c")["authority"].alias("authority"),
        "op",
        *carry,
    )
    tombstones = exploded.filter(F.col("c").isNull()).select(
        "doc_key",
        F.col("concept_uuid").alias("subj"),
        F.lit(PRED_CONCORDS).alias("pred"),
        F.lit(None).cast("string").alias("obj"),
        F.lit(None).cast("string").alias("authority"),
        "op",
        *carry,
    )
    return concords.unionByName(identifies).unionByName(tombstones)
