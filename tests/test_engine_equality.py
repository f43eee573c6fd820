"""The two transform engines (sql Column-expressions vs fused Arrow UDF)
must be byte-equal on generated data, including unicode and every
quarantine branch."""

from pyspark.sql import functions as F

from smartlogic_concordance_transformer_spark.gen import generate_source_repos
from smartlogic_concordance_transformer_spark.transform import transform


def _collect(spark, df, engine):
    good, quar = transform(df, engine=engine, carry=("path",))
    g = {r.path: (r.concept_uuid, r.authority, r.upp_json, r.op) for r in good.collect()}
    q = {r.path: (r.concept_uuid, r.status, r.http_code, r.error) for r in quar.collect()}
    return g, q


def test_engines_byte_equal_on_generated_corpus(spark):
    src = generate_source_repos(spark, 3000, seed=123).withColumnRenamed("path", "path")
    g_sql, q_sql = _collect(spark, src, "sql")
    g_arrow, q_arrow = _collect(spark, src, "arrow")
    assert set(g_sql) == set(g_arrow)
    assert set(q_sql) == set(q_arrow)
    for k in g_sql:
        assert g_sql[k] == g_arrow[k], (k, g_sql[k], g_arrow[k])
    for k in q_sql:
        assert q_sql[k] == q_arrow[k], (k, q_sql[k], q_arrow[k])


def test_engines_equal_on_unicode(spark):
    payload = (
        '{"@graph":[{"@id":"http://www.ft.com/thing/20db1bd6-59f9-4404-adb5-3165a448f8b0",'
        '"@type":["http://www.ft.com/ontology/Brand"],'
        '"http://www.ft.com/ontology/TMEIdentifier":[{"@value":"éüñ-tæx"}],'
        '"http://www.ft.com/ontology/wikidataIdentifier":[{"@value":"http://w.org/中文"}]}]}'
    )
    df = spark.createDataFrame(
        [("r", "p0", "c", "json", payload)],
        "repo string, path string, commit string, lang string, content string",
    )
    out = {}
    for engine in ("sql", "arrow"):
        good, _ = transform(df, engine=engine)
        out[engine] = good.first().upp_json
    assert out["sql"] == out["arrow"]
    assert "éüñ" in out["arrow"]  # raw UTF-8, no \u escapes
