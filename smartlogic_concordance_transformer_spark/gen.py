"""Deterministic synthetic source_repos generator — pure Spark SQL.

Synthesizes the engine's input table (repo, path, commit, lang, content)
at any scale, fully distributed: ``spark.range(n)`` + hash-derived
pseudo-randomness (``xxhash64(id, seed)``), JSON-LD payloads assembled with
``format_string``/``transform``/``array_join``. No Python in the loop, no
driver-side row building — the same generator that makes 1k rows for tests
makes 10^9 rows on a cluster.

Scenario mix (per-doc, hash-decided; deterministic given seed):

    0-64   valid editorial concept, 1-4 TME ids (+ factset/wikidata/geonames)
    65-77  valid managedlocation concept (TME+DBpedia+Geonames+Wikidata)
    78-84  valid concept with no ids        -> tombstone/delete path
    85-88  duplicate TME ids                -> quarantine (D1 reject)
    89-91  invalid TME id                   -> quarantine (V1)
    92-93  missing @type                    -> quarantine (F4)
    94     banned type skos:Concept         -> quarantine (F5)
    95     two concepts in @graph           -> quarantine (F2)
    96     Membership with TME ids          -> quarantine (F6)
    97     missing @graph                   -> quarantine (F1)
    98-99  malformed JSON                   -> quarantine (parse)

Knobs:
* ``link_pct`` — percent of TME ids drawn from a small shared pool, so
  distinct concepts concord to the same variant UUID and form multi-doc
  connected components (exercises entity linking);
* ``hot_pct`` — percent of shared-pool draws that hit pool slot 0 (a
  mega-hub), exercising skew handling in CC;
* ``n_repos`` — distinct repo values (checkpoint/resume partition grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _h(col_expr: str, salt: int) -> str:
    return f"abs(xxhash64({col_expr}, {salt}))"


def generate_source_repos(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    link_pct: int = 20,
    hot_pct: int = 10,
    pool_size: int = 1000,
    n_repos: int = 16,
    partitions: int | None = None,
) -> DataFrame:
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    s = seed

    # Per-doc deterministic driver values.
    df = df.selectExpr(
        "id",
        f"pmod({_h('id', s)}, 100) as scenario",
        f"pmod({_h('id', s + 1)}, 4) + 1 as n_tme",
        f"concat(substr(md5(concat('u', id, '_', {s})), 1, 8), '-',"
        f" substr(md5(concat('u', id, '_', {s})), 9, 4), '-',"
        f" substr(md5(concat('u', id, '_', {s})), 13, 4), '-',"
        f" substr(md5(concat('u', id, '_', {s})), 17, 4), '-',"
        f" substr(md5(concat('u', id, '_', {s})), 21, 12)) as concept_uuid",
        f"pmod({_h('id', s + 2)}, {n_repos}) as repo_id",
    )

    # TME value per (doc, i): shared-pool draw with probability link_pct,
    # of which hot_pct hit slot 0; otherwise a doc-unique value.
    tme_val = (
        f"case when pmod(abs(xxhash64(id, i, {s + 3})), 100) < {link_pct} then "
        f"  concat('SHARED', "
        f"    case when pmod(abs(xxhash64(id, i, {s + 4})), 100) < {hot_pct} then 0 "
        f"         else pmod(abs(xxhash64(id, i, {s + 5})), {pool_size}) end, "
        f"    '-taxonomy') "
        f"else concat(substr(md5(concat('t', id, '_', i, '_', {s})), 1, 16), '-taxonomy') end"
    )
    tme_arr = (
        f"transform(sequence(1, n_tme), i -> "
        f"format_string('{{\"@value\":\"%s\"}}', {tme_val}))"
    )
    factset_val = (
        f"concat('0', upper(substr(md5(concat('f', id, '_', {s})), 1, 5)), '-E')"
    )
    df = df.selectExpr(
        "*",
        f"array_join({tme_arr}, ',') as tme_json",
        f"{factset_val} as factset_value",
        f"concat('http://dbpedia.org/resource/R', {_h('id', s + 6)}) as dbp",
        f"concat('http://sws.geonames.org/', pmod({_h('id', s + 7)}, 10000000), '/') as geo",
        f"concat('http://www.wikidata.org/entity/Q', pmod({_h('id', s + 8)}, 100000000)) as wqd",
    )

    ed_prefix = "http://www.ft.com/thing/"
    ml_prefix = "http://www.ft.com/ontology/managedlocation/"
    ed_ns = "http://www.ft.com/ontology/"
    ml_ns = "http://www.ft.com/ontology/managedlocation/"

    editorial = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Brand"],"{ed_ns}TMEIdentifier":[', tme_json, ']',
        case when pmod({_h('id', s + 9)}, 3) = 0
             then concat(',"{ed_ns}factsetIdentifier":[{{"@value":"', factset_value, '"}}]')
             else '' end,
        case when pmod({_h('id', s + 10)}, 3) = 0
             then concat(',"{ed_ns}wikidataIdentifier":[{{"@type":"xsd:anyURI","@value":"', wqd, '"}}]')
             else '' end,
        case when pmod({_h('id', s + 11)}, 4) = 0
             then concat(',"{ed_ns}geonamesIdentifier":[{{"@type":"xsd:anyURI","@value":"', geo, '"}}]')
             else '' end,
        '}}]}}')"""
    )
    managed = (
        f"""concat('{{"@graph":[{{"@id":"{ml_prefix}', concept_uuid,
        '","@type":["{ed_ns}Location"],"{ml_ns}TMEIdentifier":[', tme_json, ']',
        ',"{ml_ns}dbpediaId":[{{"@type":"xsd:anyURI","@value":"', dbp, '"}}]',
        ',"{ml_ns}geonamesId":[{{"@type":"xsd:anyURI","@value":"', geo, '"}}]',
        ',"{ml_ns}wikidataId":[{{"@type":"xsd:anyURI","@value":"', wqd, '"}}]',
        '}}]}}')"""
    )
    no_ids = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Brand"]}}]}}')"""
    )
    dup_tme = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Brand"],"{ed_ns}TMEIdentifier":[{{"@value":"DUP', id,
        '-tax"}},{{"@value":"DUP', id, '-tax"}}]}}]}}')"""
    )
    bad_tme = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Brand"],"{ed_ns}TMEIdentifier":[{{"@value":"no-hyphen-extra-', id,
        '"}}]}}]}}')"""
    )
    no_types = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid, '"}}]}}')"""
    )
    banned = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["skos:Concept"]}}]}}')"""
    )
    multi = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Brand"]}},{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Brand"]}}]}}')"""
    )
    membership = (
        f"""concat('{{"@graph":[{{"@id":"{ed_prefix}', concept_uuid,
        '","@type":["{ed_ns}Membership"],"{ed_ns}TMEIdentifier":[', tme_json, ']}}]}}')"""
    )
    no_graph = """'{"notgraph": []}'"""
    malformed = """concat('{"@graph": [{', id)"""

    content = f"""
        case
          when scenario < 65 then {editorial}
          when scenario < 78 then {managed}
          when scenario < 85 then {no_ids}
          when scenario < 89 then {dup_tme}
          when scenario < 92 then {bad_tme}
          when scenario < 94 then {no_types}
          when scenario = 94 then {banned}
          when scenario = 95 then {multi}
          when scenario = 96 then {membership}
          when scenario = 97 then {no_graph}
          else {malformed}
        end as content
    """
    out = df.selectExpr(
        "concat('synthetic/repo-', repo_id) as repo",
        "concat('concepts/', id, '.json') as path",
        f"substr(sha2(concat('c', id, '_', {s}), 256), 1, 40) as commit",
        "'json' as lang",
        content,
    )
    return out
