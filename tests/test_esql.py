"""ES|QL compiler: parse → DataFrame plan → results.

Every case compiles a piped ES|QL string and checks the collected
result against either a hand-computed expectation or the equivalent
hand-written DataFrame program on the same input.  A plan assertion
pins the no-UDF contract (the compiled plan must stay JVM-side).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query.esql import EsqlError, esql


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [
        (1, "alice", "click", 10.0, dt.datetime(2024, 1, 1, 10, 30)),
        (2, "alice", "view", 5.0, dt.datetime(2024, 1, 1, 11, 45)),
        (3, "bob", "click", 20.0, dt.datetime(2024, 1, 2, 9, 0)),
        (4, "bob", "click", None, dt.datetime(2024, 1, 2, 9, 30)),
        (5, "carol", "error", 1.5, dt.datetime(2024, 1, 3, 23, 59)),
        (6, None, "view", 7.25, dt.datetime(2024, 1, 4, 0, 1)),
    ]
    df = spark.createDataFrame(
        rows, "id long, user string, etype string, value double, ts timestamp"
    )
    return {"t": df}


def test_where_eval_keep(tbl):
    out = esql(
        'FROM t | WHERE etype == "click" AND value IS NOT NULL'
        " | EVAL v2 = value * 2 + 1 | KEEP id, v2 | SORT id",
        tbl,
    ).collect()
    assert [(r.id, r.v2) for r in out] == [(1, 21.0), (3, 41.0)]


def test_stats_by(tbl):
    out = esql(
        "FROM t | STATS n = COUNT(*), total = SUM(value), "
        "m = MAX(value) BY etype | SORT etype",
        tbl,
    ).collect()
    assert [(r.etype, r.n, r.total, r.m) for r in out] == [
        ("click", 3, 30.0, 20.0),
        ("error", 1, 1.5, 1.5),
        ("view", 2, 12.25, 7.25),
    ]


def test_stats_global_scalar_wrapped_agg(tbl):
    row = esql(
        "FROM t | STATS a = ROUND(AVG(value) * 10, 2), "
        "nd = COUNT_DISTINCT(etype), med = MEDIAN(value)",
        tbl,
    ).collect()[0]
    assert row.a == round((10 + 5 + 20 + 1.5 + 7.25) / 5 * 10, 2)
    assert row.nd == 3
    assert row.med == 7.25


def test_date_trunc_bucket(tbl):
    out = esql(
        "FROM t | EVAL d = DATE_TRUNC(1 day, ts) | "
        "STATS n = COUNT(*) BY d | SORT d",
        tbl,
    ).collect()
    assert [(r.d.day, r.n) for r in out] == [(1, 2), (2, 2), (3, 1), (4, 1)]
    out2 = esql(
        "FROM t | EVAL b = BUCKET(value, 10) | WHERE b IS NOT NULL | "
        "STATS n = COUNT(*) BY b | SORT b",
        tbl,
    ).collect()
    assert [(r.b, r.n) for r in out2] == [(0.0, 3), (10.0, 1), (20.0, 1)]


def test_like_rlike_in(tbl):
    out = esql('FROM t | WHERE user LIKE "*li*" | STATS n = COUNT(*)', tbl)
    assert out.collect()[0].n == 2
    out = esql('FROM t | WHERE etype RLIKE "cl.*|err.*" | STATS n = COUNT(*)', tbl)
    assert out.collect()[0].n == 4
    out = esql('FROM t | WHERE etype IN ("view", "error") | STATS n = COUNT(*)', tbl)
    assert out.collect()[0].n == 3


def test_sort_nulls_limit(tbl):
    out = esql("FROM t | SORT value DESC NULLS LAST | LIMIT 2 | KEEP id", tbl)
    assert [r.id for r in out.collect()] == [3, 1]
    out = esql("FROM t | SORT value ASC NULLS FIRST | LIMIT 1 | KEEP id", tbl)
    assert [r.id for r in out.collect()] == [4]


def test_rename_drop(tbl):
    out = esql("FROM t | RENAME user AS who | DROP ts, value", tbl)
    assert out.columns == ["id", "who", "etype"]


def test_row_mv_expand(tbl, spark):
    out = esql(
        'ROW s = "a,b,c" | EVAL parts = SPLIT(s, ",") | MV_EXPAND parts '
        "| STATS n = COUNT(*), vals = VALUES(parts)",
        tbl,
        spark,
    ).collect()[0]
    assert out.n == 3 and list(out.vals) == ["a", "b", "c"]


def test_string_functions(tbl, spark):
    row = esql(
        'ROW s = "Hello World" | EVAL up = TO_UPPER(s), l = LENGTH(s), '
        'sub = SUBSTRING(s, 1, 5), r3 = RIGHT(s, 5), sw = STARTS_WITH(s, "Hell"), '
        'rep = REPLACE(s, "World", "ES"), loc = LOCATE(s, "World")',
        tbl,
        spark,
    ).collect()[0]
    assert row.up == "HELLO WORLD"
    assert row.l == 11
    assert row.sub == "Hello"
    assert row.r3 == "World"
    assert row.sw is True
    assert row.rep == "Hello ES"
    assert row.loc == 7


def test_case_and_cast(tbl):
    out = esql(
        'FROM t | EVAL sev = CASE(value > 15, "hi", value > 5, "mid", "lo"), '
        "iv = value::integer | WHERE value IS NOT NULL | KEEP id, sev, iv | SORT id",
        tbl,
    ).collect()
    assert [(r.id, r.sev, r.iv) for r in out] == [
        (1, "mid", 10), (2, "lo", 5), (3, "hi", 20), (5, "lo", 1), (6, "mid", 7),
    ]


def test_dissect(tbl, spark):
    row = esql(
        'ROW line = "GET /index.html 200" | DISSECT line "%{verb} %{path} %{code}" '
        "| EVAL c = TO_INT(code)",
        tbl,
        spark,
    ).collect()[0]
    assert (row.verb, row.path, row.c) == ("GET", "/index.html", 200)


def test_grok(tbl, spark):
    row = esql(
        'ROW line = "WARN 17 192.168.0.9 disk low" | '
        'GROK line "%{LOGLEVEL:lvl} %{INT:n} %{IP:ip} %{GREEDYDATA:msg}"',
        tbl,
        spark,
    ).collect()[0]
    assert (row.lvl, row.n, row.ip, row.msg) == ("WARN", "17", "192.168.0.9", "disk low")


def test_enrich(tbl, spark):
    pol = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive")], "etype string, kind string"
    )
    out = esql(
        "FROM t | ENRICH kinds ON etype | STATS n = COUNT(*) BY kind | SORT kind NULLS LAST",
        tbl,
        enrich_policies={"kinds": (pol, "etype")},
    ).collect()
    assert [(r.kind, r.n) for r in out] == [("interactive", 3), ("passive", 2), (None, 1)]


def test_duration_literal_and_date_math(tbl):
    out = esql(
        "FROM t | WHERE ts >= TO_DATETIME(\"2024-01-02 00:00:00\") "
        "AND ts < TO_DATETIME(\"2024-01-02 00:00:00\") + 1 day | KEEP id | SORT id",
        tbl,
    ).collect()
    assert [r.id for r in out] == [3, 4]


def test_date_diff_extract(tbl, spark):
    row = esql(
        'ROW a = TO_DATETIME("2024-01-01 00:00:00"), b = TO_DATETIME("2024-01-03 12:00:00") '
        '| EVAL dd = DATE_DIFF("hour", a, b), y = DATE_EXTRACT("year", a)',
        tbl,
        spark,
    ).collect()[0]
    assert row.dd == 60 and row.y == 2024


def test_keep_wildcard(tbl):
    out = esql("FROM t | EVAL value_sq = value * value | KEEP value*, id", tbl)
    assert out.columns == ["value", "value_sq", "id"]


def test_percentile_top_weighted(tbl):
    row = esql(
        "FROM t | STATS p50 = PERCENTILE(value, 50), t2 = TOP(value, 2, \"desc\"), "
        "w = WEIGHTED_AVG(value, value)",
        tbl,
    ).collect()[0]
    assert row.p50 == 7.25
    assert list(row.t2) == [20.0, 10.0]
    tot = 10.0**2 + 5**2 + 20**2 + 1.5**2 + 7.25**2
    assert abs(row.w - tot / (10 + 5 + 20 + 1.5 + 7.25)) < 1e-9


def test_mv_functions(tbl, spark):
    row = esql(
        'ROW s = "3,1,2,3" | EVAL a = SPLIT(s, ",") | EVAL '
        "n = MV_COUNT(a), dd = MV_DEDUPE(a), f = MV_FIRST(a), la = MV_LAST(a), "
        'j = MV_CONCAT(a, \"-\"), srt = MV_SORT(a)',
        tbl,
        spark,
    ).collect()[0]
    assert row.n == 4
    assert sorted(row.dd) == ["1", "2", "3"]
    assert (row.f, row.la, row.j) == ("3", "3", "3-1-2-3")
    assert list(row.srt) == ["1", "2", "3", "3"]


def test_from_union(tbl, spark):
    t2 = spark.createDataFrame(
        [(7, "dave", "click", 2.0, dt.datetime(2024, 1, 5))],
        "id long, user string, etype string, value double, ts timestamp",
    )
    out = esql("FROM t, t2 | STATS n = COUNT(*)", {**tbl, "t2": t2})
    assert out.collect()[0].n == 7


def test_no_python_udf_in_plan(tbl):
    """The compiled plan must be pure Catalyst — no BatchEvalPython /
    ArrowEvalPython nodes anywhere (the whole point of compiling to
    built-ins: whole-stage codegen survives)."""
    df = esql(
        'FROM t | WHERE etype == "click" | EVAL d = DATE_TRUNC(1 day, ts), '
        "s = CONCAT(user, \"!\") | STATS n = COUNT(*), sv = SUM(value) BY d "
        "| SORT d | LIMIT 3",
        tbl,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "PythonUDF" not in plan


def test_filter_pushdown_reaches_scan(tbl, spark, tmp_path):
    """WHERE on a FROM-ed parquet table must land in PushedFilters."""
    p = str(tmp_path / "t.parquet")
    tbl["t"].write.mode("overwrite").parquet(p)
    pq = spark.read.parquet(p)
    df = esql('FROM t | WHERE etype == "click" | KEEP id, etype', {"t": pq})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "etype" in plan.split("PushedFilters")[1][:200]


def test_errors(tbl):
    with pytest.raises(EsqlError):
        esql("FROM nope | LIMIT 1", tbl)
    with pytest.raises(EsqlError):
        esql("FROM t | FROBNICATE x", tbl)
    with pytest.raises(EsqlError):
        esql("FROM t | WHERE NOSUCHFN(value)", tbl)
    with pytest.raises(EsqlError):
        esql("FROM t | LIMIT x", tbl)
    with pytest.raises(EsqlError):
        esql("WHERE value > 1", tbl)


def test_lookup_join_adds_and_clobbers_fields(spark):
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    main = spark.createDataFrame(
        [(1, "a", "old1"), (2, "b", "old2"), (3, "zz", "old3")],
        "id bigint, code string, label string")
    lookup = spark.createDataFrame(
        [("a", "Alpha", 10), ("b", "Beta", 20)],
        "code string, label string, weight int")
    out = {r.id: r for r in esql(
        "FROM main | LOOKUP JOIN codes ON code | SORT id",
        tables={"main": main, "codes": lookup},
    ).collect()}
    assert out[1].label == "Alpha" and out[1].weight == 10  # clobbered
    assert out[3].label is None and out[3].weight is None   # no match
    # plan stays broadcast (main relation never shuffles)
    plan = esql("FROM main | LOOKUP JOIN codes ON code",
                tables={"main": main, "codes": lookup}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lookup_join_errors(spark):
    from elasticsearch_nlp_classifier_spark.query.esql import EsqlError, esql

    main = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(EsqlError, match="unknown lookup index"):
        esql("FROM main | LOOKUP JOIN nope ON id", tables={"main": main})
    with pytest.raises(EsqlError, match="no\\s+field"):
        esql("FROM main | LOOKUP JOIN l ON nope",
             tables={"main": main, "l": main})


def test_sample_seeded_and_bounded(spark):
    from elasticsearch_nlp_classifier_spark.query.esql import esql

    main = spark.range(2000).withColumnRenamed("id", "n")
    a = esql("FROM main | SAMPLE 0.25 7", tables={"main": main}).count()
    b = esql("FROM main | SAMPLE 0.25 7", tables={"main": main}).count()
    assert a == b                     # seeded -> reproducible
    assert 300 < a < 700              # ~500 expected, generous bounds


def test_match_function(spark):
    docs = spark.createDataFrame(
        [(1, "error handling in the parser"),
         (2, "handling edge cases"),
         (3, "nothing relevant here")],
        "doc_id bigint, text string",
    )
    out = esql('FROM d | WHERE MATCH(text, "parser error") | KEEP doc_id '
               "| SORT doc_id", {"d": docs}).collect()
    assert [r.doc_id for r in out] == [1]       # OR over analyzed tokens
    out = esql('FROM d | WHERE MATCH(text, "handling") | KEEP doc_id '
               "| SORT doc_id", {"d": docs}).collect()
    assert [r.doc_id for r in out] == [1, 2]


def test_match_phrase_order_and_boundaries(spark):
    docs = spark.createDataFrame(
        [(1, "error handling matters"),
         (2, "handling error matters"),           # reversed order
         (3, "terror handlings matter")],         # substrings only
        "doc_id bigint, text string",
    )
    out = esql('FROM d | WHERE MATCH_PHRASE(text, "error handling") '
               "| KEEP doc_id", {"d": docs}).collect()
    assert [r.doc_id for r in out] == [1]


def test_qstr_function(spark):
    docs = spark.createDataFrame(
        [(1, "en", "the data pipeline"),
         (2, "de", "the data pipeline"),
         (3, "en", "unrelated words")],
        "doc_id bigint, lang string, text string",
    )
    out = esql('FROM d | WHERE QSTR("lang:en AND data", text) '
               "| KEEP doc_id", {"d": docs}).collect()
    assert [r.doc_id for r in out] == [1]


def test_fulltext_functions_stay_jvm_side(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    for q in ('FROM d | WHERE MATCH(text, "a")',
              'FROM d | WHERE MATCH_PHRASE(text, "a b")',
              'FROM d | WHERE QSTR("a", text)'):
        plan = esql(q, {"d": docs})._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_change_point_command(spark):
    # flat 10s then a step to 100s: change point = first high key
    rows = [(k, 10.0 + (k % 2)) for k in range(8)] + \
           [(k, 100.0 + (k % 2)) for k in range(8, 16)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    out = esql("FROM s | CHANGE_POINT v ON k | SORT k", {"s": df}).collect()
    assert len(out) == 16                        # all rows pass through
    flagged = [r for r in out if r.type is not None]
    assert len(flagged) == 1
    assert flagged[0].k == 8 and flagged[0].type == "step_change"
    assert flagged[0].t_stat is not None
    # AS renames both annotation columns
    out2 = esql("FROM s | CHANGE_POINT v ON k AS cpt, stat", {"s": df})
    assert "cpt" in out2.columns and "stat" in out2.columns


def test_change_point_short_series_passthrough(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double")
    out = esql("FROM s | CHANGE_POINT v ON k", {"s": df}).collect()
    assert len(out) == 2 and all(r.type is None for r in out)


def test_fork_command(tbl):
    out = esql(
        'FROM t | FORK (WHERE etype == "click" | STATS n = COUNT(*)) '
        "(STATS total = SUM(value))",
        tbl,
    ).collect()
    by_fork = {r._fork: r for r in out}
    assert by_fork["fork1"].n == 3 and by_fork["fork1"].total is None
    assert by_fork["fork2"].total == 43.75 and by_fork["fork2"].n is None


def test_fork_errors(tbl):
    with pytest.raises(EsqlError, match="at least two"):
        esql("FROM t | FORK (LIMIT 1)", tbl)
    with pytest.raises(EsqlError, match="parenthesized"):
        esql("FROM t | FORK LIMIT 1", tbl)


def test_inlinestats_by(tbl):
    out = esql(
        "FROM t | INLINESTATS gn = COUNT(*), gmax = MAX(value) BY etype "
        "| SORT id",
        tbl,
    ).collect()
    assert len(out) == 6                         # rows survive
    assert out[0].gn == 3 and out[0].gmax == 20.0   # click group
    assert out[4].gn == 1 and out[4].gmax == 1.5    # error group
    # same-named existing column is replaced, not duplicated
    out2 = esql("FROM t | INLINESTATS value = AVG(value) BY etype", tbl)
    assert out2.columns.count("value") == 1


def test_inlinestats_global(tbl):
    out = esql("FROM t | INLINESTATS n = COUNT(*) | SORT id", tbl).collect()
    assert len(out) == 6 and all(r.n == 6 for r in out)


def test_inlinestats_expression_key(tbl):
    out = esql(
        "FROM t | INLINESTATS n = COUNT(*) BY day = DATE_TRUNC(1 day, ts) "
        "| SORT id",
        tbl,
    ).collect()
    assert out[0].n == 2 and out[0].day.day == 1    # two rows on Jan 1
    assert out[4].n == 1
