"""Vectorized JSON-LD parse: ``content`` string -> typed concept struct.

This is the only Python stage in the pipeline. The reference decodes each
Kafka message body with a polymorphic unmarshaller
(``/root/reference/smartlogic/model.go:67-95``) that dispatches on
``strings.Contains(@id, "managedlocation")``: editorial concepts read the
``http://www.ft.com/ontology/<field>`` key namespace, ManagedLocation
concepts read ``http://www.ft.com/ontology/managedlocation/<field>``.
The two namespaces are mutually exclusive per concept, and editorial
concepts have **no** DBpedia field at all (``model.go:117-119``).

Spark-first shape: one ``pandas_udf`` over Arrow batches (no per-row Python
at the Spark level), returning a single struct column; every downstream
operator is a native Column expression. Schema below is the union of both
namespaces plus envelope diagnostics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .fastjson import loads as _loads

# Editorial key namespace (model.go:34-39). NOTE: no dbpedia key.
_ED = "http://www.ft.com/ontology/"
_EDITORIAL_KEYS = {
    "tme": _ED + "TMEIdentifier",
    "factset": _ED + "factsetIdentifier",
    "wikidata": _ED + "wikidataIdentifier",
    "geonames": _ED + "geonamesIdentifier",
}
# ManagedLocation key namespace (model.go:26-32).
_ML = "http://www.ft.com/ontology/managedlocation/"
_ML_KEYS = {
    "tme": _ML + "TMEIdentifier",
    "factset": _ML + "factsetIdentifier",
    "dbpedia": _ML + "dbpediaId",
    "geonames": _ML + "geonamesId",
    "wikidata": _ML + "wikidataId",
}

CONCEPT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("types", T.ArrayType(T.StringType())),
        T.StructField("n_concepts", T.IntegerType()),
        T.StructField("parse_error", T.StringType()),
        T.StructField("tme", T.ArrayType(T.StringType())),
        T.StructField("factset", T.ArrayType(T.StringType())),
        T.StructField("dbpedia", T.ArrayType(T.StringType())),
        T.StructField("geonames", T.ArrayType(T.StringType())),
        T.StructField("wikidata", T.ArrayType(T.StringType())),
    ]
)


def _values(node: dict, key: str) -> list[str]:
    """Extract the @value list for an identifier key; tolerate junk shapes.

    The Go unmarshaller errors on non-list identifier fields
    (``invalidTmeListInput.json`` -> decode error); we mirror that by
    raising, which lands the row in parse_error.
    """
    raw = node.get(key)
    if raw is None:
        return []
    if not isinstance(raw, list):
        raise ValueError(f"json: cannot unmarshal value for {key}")
    out = []
    for item in raw:
        if not isinstance(item, dict):
            raise ValueError(f"json: cannot unmarshal entry for {key}")
        v = item.get("@value")
        out.append("" if v is None else str(v))
    return out


def _parse_one(content: str) -> dict:
    base = {
        "id": None,
        "types": None,
        "n_concepts": 0,
        "parse_error": None,
        "tme": [],
        "factset": [],
        "dbpedia": [],
        "geonames": [],
        "wikidata": [],
    }
    if content is None or content == "":
        base["parse_error"] = "EOF"
        return base
    try:
        doc = _loads(content)
    except Exception as exc:  # malformed JSON -> decode error (service.go:79)
        base["parse_error"] = f"invalid json: {exc}"
        return base
    if not isinstance(doc, dict):
        base["parse_error"] = "invalid json: payload is not an object"
        return base
    graph = doc.get("@graph")
    if not isinstance(graph, list):
        graph = []
    base["n_concepts"] = len(graph)
    if len(graph) != 1:
        return base  # F1 / F2 quarantine decided downstream
    node = graph[0]
    if not isinstance(node, dict):
        base["parse_error"] = "invalid json: concept is not an object"
        return base
    cid = node.get("@id")
    base["id"] = cid if isinstance(cid, str) else None
    types = node.get("@type")
    if isinstance(types, list):
        base["types"] = [str(t) for t in types]
    elif isinstance(types, str):
        base["types"] = [types]
    # Namespace dispatch: contains, not prefix (model.go:78).
    keys = _ML_KEYS if (isinstance(cid, str) and "managedlocation" in cid) else _EDITORIAL_KEYS
    try:
        for field, key in keys.items():
            base[field] = _values(node, key)
    except ValueError as exc:
        base["parse_error"] = str(exc)
        base.update({k: [] for k in ("tme", "factset", "dbpedia", "geonames", "wikidata")})
    return base


@pandas_udf(CONCEPT_SCHEMA)
def parse_concept_udf(content: pd.Series) -> pd.DataFrame:
    """Arrow-batched JSON-LD parse. One call handles ~10k rows."""
    records = [_parse_one(c) for c in content]
    return pd.DataFrame.from_records(records, columns=[f.name for f in CONCEPT_SCHEMA.fields])


# deterministic in fact; the flag stops PushDownPredicates from
# substituting validation filters through the parse projection, which
# would plan a second ArrowEvalPython running the parse twice per row
# (same duplication measured and fixed on the fused engine, pyfold.py)
parse_concept_udf = parse_concept_udf.asNondeterministic()


def parse_concept(content: Column | str) -> Column:
    c = F.col(content) if isinstance(content, str) else content
    return parse_concept_udf(c)
