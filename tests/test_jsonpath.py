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


def test_fuzz_jsonpath_vs_python_json(spark):
    """60 generated documents × paths vs a direct Python evaluator of
    the documented resolution order (literal top-level key first, then
    nested traversal, else default)."""
    import json as pyjson
    import random

    rng = random.Random(20260824)
    scalar_keys = ["a", "b", "a.b", "b.c", "it's"]
    docs, cases = [], []
    for i in range(60):
        doc = {}
        for k in rng.sample(scalar_keys, rng.randint(1, 4)):
            doc[k] = rng.choice(["v1", "hello world", "", "42",
                                 rng.randint(0, 99)])
        if rng.random() < 0.5:
            # nested object only under "x"; bare "x" is never queried
            # (querying an object-valued key renders engine-specific
            # JSON text — out of the reference's scalar contract)
            doc["x"] = {"y": rng.choice(["nested", rng.randint(0, 9)])}
        docs.append(pyjson.dumps(doc))
        cases.append(rng.choice(scalar_keys
                                + ["x.y", "missing", "a.b.c", "b.c.d"]))

    def ref(doc_s, path):
        d = pyjson.loads(doc_s)
        if path in d and not isinstance(d[path], (dict, list)):
            return str(d[path])
        if "." in path:
            cur = d
            for part in path.split("."):
                if not isinstance(cur, dict) or part not in cur:
                    return ""
                cur = cur[part]
            return str(cur) if not isinstance(cur, (dict, list)) else ""
        return ""

    df = spark.createDataFrame(
        [(i, j, p) for i, (j, p) in enumerate(zip(docs, cases))],
        "i bigint, j string, p string")
    outs = {}
    for path in set(cases):
        sub = df.where(F.col("p") == path).select(
            "i", es_json_path("j", path).alias("v")).collect()
        for r in sub:
            outs[r.i] = r.v
    bad = [(i, docs[i], cases[i], outs[i], ref(docs[i], cases[i]))
           for i in range(60) if outs[i] != ref(docs[i], cases[i])]
    assert not bad, bad[:3]


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
