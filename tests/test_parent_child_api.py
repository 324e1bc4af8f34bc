"""Parent/child (join-field) queries + small admin APIs, pinned
against plain-Python replicas."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query import (
    analyze_api,
    children_agg,
    field_caps,
    has_child,
    has_parent,
    mget,
    parent_id_query,
    render_search_template,
    validate_query,
)

PARENTS = [
    # (okey, status, price)
    (1, "O", 100.0),
    (2, "F", 250.0),
    (3, "O", 80.0),
    (4, "P", 500.0),
    (5, "F", 10.0),  # no children
]
CHILDREN = [
    # (okey, line, qty)
    (1, 1, 5.0), (1, 2, 30.0),
    (2, 1, 45.0), (2, 2, 50.0), (2, 3, 2.0),
    (3, 1, 50.0),
    (4, 1, 1.0), (4, 2, 1.0),
]


@pytest.fixture(scope="module")
def rel(spark):
    p = spark.createDataFrame(
        PARENTS, "o_orderkey bigint, o_orderstatus string, "
                 "o_totalprice double").cache()
    c = spark.createDataFrame(
        CHILDREN, "l_orderkey bigint, l_linenumber int, "
                  "l_quantity double").cache()
    return p, c


def test_has_child_min_max(rel):
    p, c = rel
    got = {r["o_orderkey"] for r in has_child(
        p, c, "o_orderkey", "l_orderkey",
        F.col("l_quantity") >= 30.0).collect()}
    assert got == {1, 2, 3}
    got2 = {r["o_orderkey"] for r in has_child(
        p, c, "o_orderkey", "l_orderkey",
        F.col("l_quantity") >= 30.0, min_children=2).collect()}
    assert got2 == {2}
    got3 = {r["o_orderkey"] for r in has_child(
        p, c, "o_orderkey", "l_orderkey", F.lit(True),
        min_children=1, max_children=2).collect()}
    assert got3 == {1, 3, 4}  # order 2 has 3 children, 5 has none


def test_has_parent(rel):
    p, c = rel
    got = {(r["l_orderkey"], r["l_linenumber"]) for r in has_parent(
        p, c, "o_orderkey", "l_orderkey",
        F.col("o_totalprice") > 200.0).collect()}
    want = {(k, ln) for k, ln, _ in CHILDREN if k in (2, 4)}
    assert got == want


def test_parent_id_query(rel):
    _, c = rel
    got = {(r["l_orderkey"], r["l_linenumber"])
           for r in parent_id_query(c, "l_orderkey", 2).collect()}
    assert got == {(2, 1), (2, 2), (2, 3)}


def test_children_agg(rel):
    p, c = rel
    out = [(r["key"], r["doc_count"]) for r in children_agg(
        p, c, "o_orderkey", "l_orderkey", "o_orderstatus").collect()]
    # O: orders 1,3 -> 2+1=3 children; F: order 2 -> 3; P: order 4 -> 2
    assert dict(out) == {"O": 3, "F": 3, "P": 2}
    # orderBy desc count, key asc
    assert out == [("F", 3), ("O", 3), ("P", 2)]
    filtered = dict((r["key"], r["doc_count"]) for r in children_agg(
        p, c, "o_orderkey", "l_orderkey", "o_orderstatus",
        child_filter=F.col("l_quantity") >= 30.0).collect())
    assert filtered == {"F": 2, "O": 2}


def test_analyze_api(spark):
    rows = [(r["token"], r["position"])
            for r in analyze_api(spark, "Data VALUE table",
                                 analyzer="simple_code").collect()]
    assert rows == [("data", 0), ("value", 1), ("table", 2)]


def test_field_caps(rel):
    p, _ = rel
    caps = {f: (t, s, a) for f, t, s, a in field_caps(
        p, text_fields={"o_orderstatus"})}
    assert caps["o_orderkey"] == ("long", True, True)
    assert caps["o_orderstatus"] == ("text", True, False)
    assert caps["o_totalprice"] == ("double", True, True)


def test_validate_query_valid_and_invalid():
    ok = validate_query("lang:en AND n_chars:[10 TO 500]")
    assert ok["valid"] and ok["error"] is None
    assert ok["explanation"]
    bad = validate_query("lang:(en OR")  # unbalanced paren
    assert not bad["valid"]
    assert bad["error"]


def test_render_search_template():
    t = "lang:{{lang}} AND n_chars:[{{lo}} TO {{hi}}]"
    assert render_search_template(t, {"lang": "en", "lo": 1, "hi": 9}) \
        == "lang:en AND n_chars:[1 TO 9]"
    with pytest.raises(KeyError):
        render_search_template(t, {"lang": "en"})


def test_mget_found_and_missing(rel):
    p, _ = rel
    out = {r["o_orderkey"]: (r["found"], r["o_totalprice"])
           for r in mget(p, [2, 99, 4], id_col="o_orderkey").collect()}
    assert out[2] == (True, 250.0)
    assert out[4] == (True, 500.0)
    assert out[99] == (False, None)
    assert len(out) == 3


# --- _count / profile / sliced scroll ---------------------------------------


def test_count_api_agrees_with_search(spark):
    from elasticsearch_nlp_classifier_spark.query import count_api
    from elasticsearch_nlp_classifier_spark.functions.query_string import (
        compile_query_string,
    )

    df = spark.createDataFrame(
        [(1, "alpha", 3), (2, "beta", 5), (3, "alpha", 9), (4, "gamma", 5)],
        "id bigint, tag string, n int",
    )
    qs = "tag:alpha OR n:5"
    got = count_api(df, qs)
    want = df.where(
        compile_query_string(qs, df.schema.fieldNames())).count()
    assert got == {"count": want} and want == 4  # ids 1,3 alpha + 2,4 n=5
    assert count_api(df, "") == {"count": 4}  # match_all


def test_sliced_scan_disjoint_exhaustive(spark):
    from elasticsearch_nlp_classifier_spark.query import sliced_scan

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    m = 4
    parts = [set(r.doc_id for r in sliced_scan(df, i, m).collect())
             for i in range(m)]
    allids = set(range(500))
    assert set().union(*parts) == allids            # exhaustive
    assert sum(len(p) for p in parts) == 500        # disjoint
    # deterministic across invocations
    again = set(r.doc_id for r in sliced_scan(df, 2, m).collect())
    assert again == parts[2]
    # balanced-ish (hash-uniform): no slice is empty or >2x fair share
    assert all(0 < len(p) < 2 * 500 / m for p in parts)
    with pytest.raises(ValueError):
        sliced_scan(df, 4, 4)


def test_profile_search_phases_and_hits(spark, corpus_sf_tiny, tmp_path):
    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import profile_search
    from elasticsearch_nlp_classifier_spark.query.wand import wand_topk
    import pandas as pd

    idx = build_physical_index(
        corpus_sf_tiny["docs"], str(tmp_path / "prof_ix"),
        text_col="content", analyzer="code")
    prof = profile_search(idx, "tokenize stream error", k=5)
    # phases present and non-negative; total >= sum of parts is NOT
    # required (phases overlap driver work), but each must be sane
    for ph in ("analyze_ms", "stats_probe_ms", "candidate_count_ms",
               "score_ms"):
        assert prof["phases"][ph] >= 0.0
    assert prof["took_ms"] >= prof["phases"]["score_ms"]
    assert prof["terms"] and set(prof["term_stats"]) <= set(prof["terms"])
    for st in prof["term_stats"].values():
        assert st["df"] > 0 and st["idf"] > 0
    assert prof["candidate_blocks"] > 0
    # hits identical to the plain search
    direct = wand_topk(
        idx, pd.DataFrame([{"query_id": 0,
                            "query_text": "tokenize stream error"}]),
        k=5).collect()
    assert [(h["doc_id"], h["rank"]) for h in prof["hits"]] == \
           [(r.doc_id, r.rank) for r in direct]
