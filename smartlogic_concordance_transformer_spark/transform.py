"""Validation + UUID derivation + concordance assembly (operators F1-F8,
V1-V2, U1-U3, D1-D2, A1-A2, E2 of SURVEY.md section 2).

The reference applies a sequential per-document fold
(``/root/reference/smartlogic/service.go:96-183``): validate the envelope,
then walk identifier lists in a fixed authority order (TME -> FACTSET ->
DBPedia -> Geonames -> Wikidata), deriving a UUID per id, erroring on the
first invalid/duplicate/self-concordant id (TME/FACTSET) or skipping
blanks/duplicates (locations).

Spark-first re-expression — **no UDFs, pure Column expressions**:

1.  doc-level envelope checks -> a ``doc_error`` struct via ``when`` chains;
2.  ``posexplode`` each authority array with an ``authority_rank`` literal
    -> one long (doc, rank, pos, authority, value) relation;
3.  derive UUIDs natively (md5 kernels, whole-stage codegen);
4.  duplicate detection with one window over (doc, derived_uuid) ordered by
    (rank, pos) — Go's first-occurrence-wins fold becomes ``row_number``;
5.  the reference's "error on FIRST bad id in payload order" becomes
    ``min_by((rank, pos))`` over per-id error flags;
6.  reassemble ordered concordance arrays with ``array_sort`` over
    (rank, pos)-keyed structs — no ``collect_list`` ordering hazard.

Scale notes: everything between parse and sink is narrow except the two
window/group operations, which shuffle on ``doc_key`` — the natural,
perfectly-parallel key (one document = one independent unit of work; no
cross-doc skew possible since per-doc id arrays are tiny). At 10^12 rows
this plan is embarrassingly parallel; AQE coalesces the post-shuffle
partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .parse import parse_concept
from .uuids import ft_factset_uuid, ft_md5_uuid

# Statuses (service.go:35-41) and their HTTP codes (handlers.go:148-166).
SYNTACTICALLY_INCORRECT = "SyntacticallyIncorrect"
SEMANTICALLY_INCORRECT = "SemanticallyIncorrect"
VALID_CONCEPT = "ValidConcept"
STATUS_HTTP = {
    SYNTACTICALLY_INCORRECT: 400,
    SEMANTICALLY_INCORRECT: 422,
    VALID_CONCEPT: 200,
}

THING_PREFIX = "http://www.ft.com/thing/"
LOCATION_PREFIX = "http://www.ft.com/ontology/managedlocation/"
UUID_RE = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
TME_RE = "^[^-]+-[^-]+$"          # exactly two non-empty '-'-parts (service.go:293-299)
FACTSET_RE = "^0.{5}-E$"          # len 8, leading '0', '-E' suffix (service.go:301-304)

# Authority processing order (service.go:148-173).
AUTH_TME, AUTH_FACTSET, AUTH_DBPEDIA, AUTH_GEONAMES, AUTH_WIKIDATA = (
    "TME", "FACTSET", "DBPedia", "Geonames", "Wikidata",
)
AUTHORITY_RANK = {AUTH_TME: 1, AUTH_FACTSET: 2, AUTH_DBPEDIA: 3, AUTH_GEONAMES: 4, AUTH_WIKIDATA: 5}

_ERR_GRAPH_MISSING = "invalid Request Json: Missing/invalid @graph field"
_ERR_GRAPH_MULTI = (
    "invalid Request Json: More than 1 concept in smartlogic concept payload "
    "which is currently not supported"
)
_ERR_ID_MISSING = "invalid Request Json: Missing/invalid @id field"
_ERR_TYPE_NOT_ALLOWED = "concept type not allowed"


def parse_stage(source: DataFrame, content_col: str = "content") -> DataFrame:
    """source_repos -> + (doc_key, concept struct). Column-pruned: only
    ``content`` feeds the UDF; lineage columns ride along untouched."""
    df = source.withColumn(
        "doc_key",
        F.sha2(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in ("repo", "path", "commit") if c in source.columns],
                F.col(content_col),
            ),
            256,
        ),
    )
    return df.withColumn("concept", parse_concept(content_col))


def doc_validate(parsed: DataFrame) -> DataFrame:
    """Envelope-level checks F1-F6 -> doc_status/doc_error columns.

    Exact error strings + status enum parity: service.go:96-143.
    """
    c = F.col("concept")
    concept_uuid = F.when(
        c["id"].startswith(THING_PREFIX)
        & F.regexp_extract(c["id"], f"^{THING_PREFIX}(.*)$", 1).rlike(UUID_RE),
        F.regexp_extract(c["id"], f"^{THING_PREFIX}(.*)$", 1),
    ).when(
        c["id"].startswith(LOCATION_PREFIX)
        & F.regexp_extract(c["id"], f"^{LOCATION_PREFIX}(.*)$", 1).rlike(UUID_RE),
        F.regexp_extract(c["id"], f"^{LOCATION_PREFIX}(.*)$", 1),
    )
    authority = F.when(
        concept_uuid.isNotNull() & c["id"].startswith(THING_PREFIX), F.lit("Smartlogic")
    ).when(
        concept_uuid.isNotNull() & c["id"].startswith(LOCATION_PREFIX), F.lit("ManagedLocation")
    )

    first_type = F.element_at(c["types"], 1)
    short_type = F.substring_index(first_type, "/", -1)

    df = (
        parsed.withColumn("concept_uuid", concept_uuid)
        .withColumn("concept_authority", authority)
        .withColumn("short_type", short_type)
    )

    err = (
        F.when(
            c["parse_error"].isNotNull(),
            F.struct(
                F.lit(SYNTACTICALLY_INCORRECT).alias("status"),
                c["parse_error"].alias("error"),
            ),
        )
        .when(
            c["n_concepts"] == 0,
            F.struct(F.lit(SEMANTICALLY_INCORRECT).alias("status"), F.lit(_ERR_GRAPH_MISSING).alias("error")),
        )
        .when(
            c["n_concepts"] > 1,
            F.struct(F.lit(SEMANTICALLY_INCORRECT).alias("status"), F.lit(_ERR_GRAPH_MULTI).alias("error")),
        )
        .when(
            F.col("concept_uuid").isNull(),
            F.struct(F.lit(SEMANTICALLY_INCORRECT).alias("status"), F.lit(_ERR_ID_MISSING).alias("error")),
        )
        .when(
            F.size(F.coalesce(c["types"], F.array())) == 0,
            F.struct(
                F.lit(SYNTACTICALLY_INCORRECT).alias("status"),
                F.concat(
                    F.lit("bad Request: Type has not been set for concept: "),
                    F.col("concept_uuid"),
                    F.lit(")"),  # trailing ')' is in the reference format string (service.go:118)
                ).alias("error"),
            ),
        )
        .when(
            first_type == "skos:Concept",  # denylist, sole entry (service.go:46-52)
            F.struct(F.lit(SEMANTICALLY_INCORRECT).alias("status"), F.lit(_ERR_TYPE_NOT_ALLOWED).alias("error")),
        )
        .when(
            F.col("short_type").isin("Membership", "MembershipRole")
            & (F.size(F.coalesce(c["tme"], F.array())) > 0),
            F.struct(
                F.lit(SYNTACTICALLY_INCORRECT).alias("status"),
                F.concat(
                    F.lit("bad Request: Concept type "),
                    F.col("short_type"),
                    F.lit(" does not support concordance"),
                ).alias("error"),
            ),
        )
    )
    return df.withColumn("doc_error", err)


def _explode_authority(df: DataFrame, field: str, authority: str) -> DataFrame:
    rank = AUTHORITY_RANK[authority]
    return df.select(
        "doc_key",
        "concept_uuid",
        F.lit(rank).alias("rank"),
        F.lit(authority).alias("authority"),
        F.posexplode(
            F.coalesce(F.col("concept")[field], F.array().cast("array<string>"))
        ).alias("pos", "value"),
    )


def id_stage(valid_docs: DataFrame) -> DataFrame:
    """Explode all five identifier arrays, derive UUIDs, flag errors/skips.

    Output grain: one row per (doc, authority, position) id with columns
    ``derived_uuid``, ``skip`` (location blank/dup), ``id_error``
    (struct status/error or null).
    """
    parts = [
        _explode_authority(valid_docs, f, a)
        for f, a in (
            ("tme", AUTH_TME),
            ("factset", AUTH_FACTSET),
            ("dbpedia", AUTH_DBPEDIA),
            ("geonames", AUTH_GEONAMES),
            ("wikidata", AUTH_WIKIDATA),
        )
    ]
    ids = parts[0]
    for p in parts[1:]:
        ids = ids.unionByName(p)

    is_tme = F.col("rank") == 1
    is_factset = F.col("rank") == 2
    is_location = F.col("rank") >= 3

    # F7: blank location values are skipped with a warning (service.go:255-258).
    blank = is_location & (F.trim(F.col("value")) == "")

    valid = (
        F.when(is_tme, F.col("value").rlike(TME_RE))
        .when(is_factset, F.col("value").rlike(FACTSET_RE))
        .otherwise(F.lit(True))
    )
    derived = F.when(
        blank | ~valid, F.lit(None)
    ).otherwise(
        F.when(is_factset, ft_factset_uuid(F.col("value"))).otherwise(ft_md5_uuid(F.col("value")))
    )
    ids = ids.withColumn("blank", blank).withColumn("valid", valid).withColumn("derived_uuid", derived)

    # D1/D2: duplicate derived UUIDs. Window ordered by Go's processing
    # order (rank, pos); the first occurrence wins, later ones are dups.
    w = Window.partitionBy("doc_key", "derived_uuid").orderBy("rank", "pos")
    ids = ids.withColumn(
        "dup",
        F.when(F.col("derived_uuid").isNull(), F.lit(False)).otherwise(F.row_number().over(w) > 1),
    )

    # Per-id error, precedence as the reference fold: self-concordance,
    # then invalid, then duplicate (TME/FACTSET only; locations skip dups).
    self_err = F.concat(
        F.when(
            is_location,
            F.concat(
                F.lit("bad Request: Payload from Smartlogic has a Smartlogic uuid that "
                      "is the same as the uuid generated from "),
                F.col("authority"),
                F.lit(" id"),
            ),
        ).otherwise(
            F.concat(
                F.lit("bad Request: Payload from smartlogic has a smartlogic uuid that "
                      "is the same as the uuid generated from the "),
                F.col("authority"),
                F.lit(" id"),
            )
        )
    )
    invalid_err = F.concat(
        F.lit("Bad Request: Concordance id "),
        F.col("value"),
        F.lit(" is not a valid "),
        F.col("authority"),
        F.lit(" Id"),
    )
    dup_err = F.concat(
        F.lit("bad Request: Payload from smartlogic contains duplicate "),
        F.col("authority"),
        F.lit(" id values"),
    )
    id_error = (
        F.when(F.col("blank"), F.lit(None))
        .when(
            F.col("derived_uuid") == F.col("concept_uuid"),
            F.struct(F.lit(SYNTACTICALLY_INCORRECT).alias("status"), self_err.alias("error")),
        )
        .when(
            ~F.col("valid"),
            F.struct(F.lit(SYNTACTICALLY_INCORRECT).alias("status"), invalid_err.alias("error")),
        )
        .when(
            F.col("dup") & (is_tme | is_factset),
            F.struct(F.lit(SYNTACTICALLY_INCORRECT).alias("status"), dup_err.alias("error")),
        )
    )
    skip = F.col("blank") | (F.col("dup") & is_location)
    return ids.withColumn("id_error", id_error).withColumn("skip", skip)


def fold_stage(ids: DataFrame) -> DataFrame:
    """Aggregate per-doc: FIRST error in (rank, pos) order, else the ordered
    concordance array. One shuffle on doc_key."""
    order_key = F.col("rank") * F.lit(1_000_000) + F.col("pos")
    agg = (
        ids.groupBy("doc_key")
        .agg(
            F.min_by(
                F.col("id_error"), F.when(F.col("id_error").isNotNull(), order_key)
            ).alias("id_error"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        ~F.col("skip") & F.col("id_error").isNull(),
                        F.struct(
                            order_key.alias("ord"),
                            F.struct(
                                F.col("authority").alias("authority"),
                                F.col("value").alias("authorityValue"),
                                F.col("derived_uuid").alias("uuid"),
                            ).alias("cid"),
                        ),
                    )
                )
            ).alias("sorted_ids"),
        )
        .withColumn("concordances", F.transform(F.col("sorted_ids"), lambda x: x["cid"]))
        .drop("sorted_ids")
    )
    return agg


def transform(
    source: DataFrame, content_col: str = "content", carry: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline: source table -> (concordances DF, quarantine DF).

    concordances: doc_key, concept_uuid, authority, concordances (array),
                  upp_json (byte-exact), op ('upsert'|'delete') [+ carry]
    quarantine:   doc_key, concept_uuid, status, http_code, error [+ carry]

    ``carry`` columns from the source (e.g. the partition bucket, repo,
    path) ride through to both outputs — doc-level attributes never enter
    the exploded id relation, so carrying them is free.
    """
    carry = tuple(carry)
    parsed = doc_validate(parse_stage(source, content_col))
    parsed = parsed.persist()

    doc_bad = parsed.filter(F.col("doc_error").isNotNull())
    doc_ok = parsed.filter(F.col("doc_error").isNull())

    ids = id_stage(doc_ok)
    folded = fold_stage(ids)

    assembled = (
        doc_ok.select("doc_key", "concept_uuid", "concept_authority", *carry)
        .join(folded, "doc_key", "left")  # left: docs with zero ids keep an empty array
        .withColumn(
            "concordances",
            F.coalesce(
                F.col("concordances"),
                F.array().cast("array<struct<authority:string,authorityValue:string,uuid:string>>"),
            ),
        )
    )

    id_bad = assembled.filter(F.col("id_error").isNotNull()).select(
        "doc_key",
        "concept_uuid",
        F.col("id_error")["status"].alias("status"),
        F.col("id_error")["error"].alias("error"),
        *carry,
    )
    quarantine = doc_bad.select(
        "doc_key",
        "concept_uuid",
        F.col("doc_error")["status"].alias("status"),
        F.col("doc_error")["error"].alias("error"),
        *carry,
    ).unionByName(id_bad)
    quarantine = quarantine.withColumn(
        "http_code",
        F.when(F.col("status") == SYNTACTICALLY_INCORRECT, F.lit(400))
        .when(F.col("status") == SEMANTICALLY_INCORRECT, F.lit(422))
        .otherwise(F.lit(500)),
    )

    good = assembled.filter(F.col("id_error").isNull()).select(
        "doc_key",
        "concept_uuid",
        F.col("concept_authority").alias("authority"),
        "concordances",
        *carry,
    )
    # E1: byte-exact UPP JSON — key order = Go struct order (model.go:50-60);
    # empty list stays [] (service.go:146). to_json of struct preserves
    # field order; ignoreNullFields drops nothing here (no nulls possible).
    good = good.withColumn(
        "upp_json",
        F.to_json(
            F.struct(
                F.col("authority"),
                F.col("concept_uuid").alias("uuid"),
                F.col("concordances"),
            )
        ),
    ).withColumn(
        "op",
        F.when(F.size("concordances") > 0, F.lit("upsert")).otherwise(F.lit("delete")),
    )
    return good, quarantine
