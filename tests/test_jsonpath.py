"""ESJsonPath dotted-key resolution — ported from the reference's
`ESJsonPathTest.java` (get: lines 54-66; tokenize corpus: 71-93;
getLiteralPath/getPossiblePaths: 22-50)."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.functions.jsonpath import (
    _literal_path,
    es_json_path,
    json_path_col,
    json_path_select,
)


def _get(spark, json, path, default=""):
    row = spark.createDataFrame([(json,)], "j string").select(
        es_json_path("j", path, default).alias("v")).first()
    return row.v


def test_literal_path():
    # ESJsonPathTest.getLiteralPath
    assert _literal_path("target") == "$['target']"
    assert _literal_path("_opennlp.target") == "$['_opennlp.target']"
    assert _literal_path("it's") == "$['it\\'s']"


# ESJsonPathTest.get (CsvSource rows) — scalars coerced to strings
@pytest.mark.parametrize("json,path,expected", [
    ('{"target": 1}', "target", "1"),
    ('{"target": "0"}', "target", "0"),
    ('{"_opennlp.target": "1"}', "_opennlp.target", "1"),
    ('{"_opennlp": {"target": "0"}}', "_opennlp.target", "0"),
])
def test_get_reference_cases(spark, json, path, expected):
    assert _get(spark, json, path) == expected


def test_prefer_top_level_literal_key(spark):
    # ESJsonPathTest.tokenize last case: both forms present →
    # top-level literal key wins
    json = ('{"_opennlp.target": "hello world",'
            ' "_opennlp": {"target": "1.234"}}')
    assert _get(spark, json, "_opennlp.target") == "hello world"


def test_missing_returns_default(spark):
    assert _get(spark, '{"a": 1}', "b") == ""
    assert _get(spark, '{"a": 1}', "b.c") == ""
    assert _get(spark, '{"a": 1}', "b.c", default="fallback") == "fallback"


def test_tokenize_composition(spark):
    """ESJsonPathTest.tokenize: the extracted string feeds the analyzer
    chain exactly like `NLPTokenizer...tokenize(jsonPath.get(path))`."""
    from elasticsearch_nlp_classifier_spark.analyzer import get_analyzer

    # "default" is the engine's twin of the reference's
    # NLPTokenizer.getDefaultTokenizer() ("1.234" stays one token)
    an = get_analyzer("default")
    cases = [
        ('{"text": 1}', "text", ["1"]),
        ('{"text": "hello world"}', "text", ["hello", "world"]),
        ('{"_opennlp.target": "hello world"}', "_opennlp.target",
         ["hello", "world"]),
        ('{"_opennlp": {"target": "1.234"}}', "_opennlp.target",
         ["1.234"]),
    ]
    for json, path, want in cases:
        assert an.tokenize(_get(spark, json, path)) == want


def test_dataframe_helpers(spark):
    df = spark.createDataFrame(
        [(1, '{"a.b": "x", "a": {"b": "y"}, "c": 7}')],
        "id bigint, json string")
    out = json_path_col(df, "a.b").first()
    assert out["a.b"] == "x"
    sel = json_path_select(df, ["a.b", "c", "nope"]).first()
    assert (sel["a.b"], sel["c"], sel["nope"]) == ("x", "7", "")


def test_pure_codegen_no_python_boundary(spark):
    """The extraction must stay JVM-side (GetJsonObject expressions) —
    no BatchEvalPython / ArrowEvalPython in the plan."""
    df = spark.range(3).select(
        F.concat(F.lit('{"k.l": "'), F.col("id").cast("string"),
                 F.lit('"}')).alias("j"))
    plan = df.select(es_json_path("j", "k.l"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan
    assert "get_json_object" in plan.lower()
