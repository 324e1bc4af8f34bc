"""ES-style aggregations pinned against DuckDB over the driver testdata.

The reference delegates search to a stock ES client (the full
aggregation surface); these tests pin each agg family's bucket keys,
counts and metric values to an independent SQL evaluation.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query import (
    cardinality_agg,
    date_histogram_agg,
    extended_stats_agg,
    filters_agg,
    histogram_agg,
    percentiles_agg,
    range_agg,
    significant_terms,
    stats_agg,
    terms_agg,
    top_hits_agg,
)

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"
EVENTS = f"{SF}/events.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS).cache()


def _pd(df, sort_cols):
    return (df.toPandas().sort_values(sort_cols)
            .reset_index(drop=True))


def test_terms_agg(docs):
    got = terms_agg(docs, "lang", size=5).toPandas()
    want = duckdb.sql(f"""
        SELECT lang AS key, count(*)::BIGINT AS doc_count
        FROM read_parquet('{DOCS}') WHERE lang IS NOT NULL
        GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT 5
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_histogram_agg(docs):
    got = histogram_agg(docs, "n_chars", 100.0).toPandas()
    want = duckdb.sql(f"""
        SELECT (floor(n_chars / 100.0) * 100.0)::DOUBLE AS key,
               count(*)::BIGINT AS doc_count
        FROM read_parquet('{DOCS}') WHERE n_chars IS NOT NULL
        GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_date_histogram_agg(events):
    got = date_histogram_agg(events, "ts", "hour").toPandas()
    got["key_ts"] = pd.to_datetime(got["key_ts"])
    want = duckdb.sql(f"""
        SELECT date_trunc('hour', ts) AS key_ts,
               count(*)::BIGINT AS doc_count
        FROM read_parquet('{EVENTS}') GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_range_agg(docs):
    got = _pd(range_agg(docs, "n_chars",
                        [(None, 100.0), (100.0, 300.0), (300.0, None)]),
              ["key"])
    want = duckdb.sql(f"""
        SELECT * FROM (
          SELECT '*-100.0' AS key,
                 sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END)::BIGINT
                 AS doc_count FROM read_parquet('{DOCS}')
          UNION ALL
          SELECT '100.0-300.0',
                 sum(CASE WHEN n_chars >= 100 AND n_chars < 300
                     THEN 1 ELSE 0 END)::BIGINT FROM read_parquet('{DOCS}')
          UNION ALL
          SELECT '300.0-*',
                 sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT
          FROM read_parquet('{DOCS}')
        ) ORDER BY key
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_filters_agg(docs):
    got = _pd(filters_agg(docs, {
        "short": F.col("n_chars") < 150,
        "long": F.col("n_chars") >= 150,
    }), ["key"])
    want = duckdb.sql(f"""
        SELECT * FROM (
          SELECT 'long' AS key,
                 sum(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END)::BIGINT
                 AS doc_count FROM read_parquet('{DOCS}')
          UNION ALL
          SELECT 'short',
                 sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END)::BIGINT
          FROM read_parquet('{DOCS}')
        ) ORDER BY key
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stats_and_extended_stats(events):
    got = stats_agg(events, "value").toPandas()
    want = duckdb.sql(f"""
        SELECT count(value)::BIGINT AS count, min(value)::DOUBLE AS min,
               max(value)::DOUBLE AS max, round(avg(value), 6) AS avg,
               sum(value)::DOUBLE AS sum
        FROM read_parquet('{EVENTS}') WHERE value IS NOT NULL
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  atol=1e-6)

    got_e = extended_stats_agg(events, "value").toPandas()
    want_e = duckdb.sql(f"""
        SELECT count(value)::BIGINT AS count, min(value)::DOUBLE AS min,
               max(value)::DOUBLE AS max, round(avg(value), 6) AS avg,
               round(sum(value), 6) AS sum,
               round(sum(value * value), 6) AS sum_of_squares,
               round(var_pop(value), 6) AS variance,
               round(stddev_pop(value), 6) AS std_deviation
        FROM read_parquet('{EVENTS}') WHERE value IS NOT NULL
    """).df()
    pd.testing.assert_frame_equal(got_e, want_e, check_dtype=False,
                                  atol=1e-5)


def test_percentiles_exact_vs_duckdb(events):
    got = percentiles_agg(events, "value",
                          percents=(5.0, 50.0, 95.0)).toPandas()
    want = duckdb.sql(f"""
        SELECT * FROM (
          SELECT 5.0 AS percent,
                 round(quantile_cont(value, 0.05), 6) AS value
          FROM read_parquet('{EVENTS}')
          UNION ALL
          SELECT 50.0, round(quantile_cont(value, 0.50), 6)
          FROM read_parquet('{EVENTS}')
          UNION ALL
          SELECT 95.0, round(quantile_cont(value, 0.95), 6)
          FROM read_parquet('{EVENTS}')
        ) ORDER BY percent
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  atol=1e-6)


def test_percentiles_approx_close_to_exact(events):
    exact = percentiles_agg(events, "value",
                            percents=(50.0,)).toPandas()["value"][0]
    approx = percentiles_agg(events, "value", percents=(50.0,),
                             exact=False).toPandas()["value"][0]
    spread = events.agg(
        (F.max("value") - F.min("value")).alias("r")).collect()[0]["r"]
    assert abs(approx - exact) <= 0.05 * spread


def test_cardinality(events):
    exact = cardinality_agg(events, "user_id",
                            exact=True).collect()[0]["value"]
    want = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{EVENTS}')"
    ).fetchone()[0]
    assert exact == want
    approx = cardinality_agg(events, "user_id").collect()[0]["value"]
    assert abs(approx - want) <= max(2, 0.05 * want)


def test_top_hits_agg(docs):
    got = _pd(top_hits_agg(docs, "lang", "n_chars", size=2),
              ["key", "rank"])
    want = duckdb.sql(f"""
        SELECT lang AS key, rank, doc_id AS id,
               n_chars::DOUBLE AS sort_value
        FROM (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id ASC)::BIGINT AS rank
          FROM read_parquet('{DOCS}') WHERE lang IS NOT NULL
        ) WHERE rank <= 2 ORDER BY key, rank
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_significant_terms_jlh(spark, docs):
    from elasticsearch_nlp_classifier_spark.index import (
        build_logical_index,
    )

    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code",
                              doc_id_col="doc_id")
    fg = docs.where(F.col("lang") == "en").select("doc_id")
    got = significant_terms(fg, idx.postings, size=5)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    # JLH math spot-check on the top term, recomputed independently
    n_fg = fg.count()
    n_docs = docs.select("doc_id").distinct().count()
    top = rows[0]
    fg_rate = top["fg_df"] / n_fg
    bg_rate = top["bg_df"] / n_docs
    assert top["score"] == pytest.approx(
        (fg_rate - bg_rate) * (fg_rate / bg_rate), abs=1e-6)
    # positively significant only, sorted by score desc
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_missing_and_value_count_agg(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        missing_agg,
        value_count_agg,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, ""), (4, "b")], "id bigint, f string"
    )
    assert missing_agg(df, "f").collect()[0]["doc_count"] == 2
    # value_count counts non-null extracted values ('' IS a value to ES)
    assert value_count_agg(df, "f").collect()[0]["value_count"] == 3


def test_date_range_agg_buckets(spark):
    from elasticsearch_nlp_classifier_spark.query import date_range_agg

    df = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00"), (2, "2024-01-15 12:00:00"),
         (3, "2024-01-25 00:00:00"), (4, None)],
        "id bigint, t string",
    ).select("id", F.to_timestamp("t").alias("ts"))
    got = {r["key"]: r["doc_count"] for r in date_range_agg(
        df, "ts",
        [(None, "2024-01-10 00:00:00"),
         ("2024-01-10 00:00:00", "2024-01-20 00:00:00"),
         ("2024-01-20 00:00:00", None)],
    ).collect()}
    assert got == {
        "*-2024-01-10 00:00:00": 1,
        "2024-01-10 00:00:00-2024-01-20 00:00:00": 1,
        "2024-01-20 00:00:00-*": 1,
    }


def test_pipeline_aggs_over_buckets(spark):
    """derivative / cumulative_sum / moving_avg / serial_diff over a
    hand-checkable bucket table."""
    from elasticsearch_nlp_classifier_spark.query import (
        cumulative_sum_agg, derivative_agg, moving_avg_agg,
        serial_diff_agg,
    )

    buckets = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 20), (4, 40)],
        "key_ts int, doc_count int",
    )
    rows = {r["key_ts"]: r for r in serial_diff_agg(
        moving_avg_agg(cumulative_sum_agg(derivative_agg(buckets)),
                       window=3),
        lag=2,
    ).collect()}
    assert rows[1]["derivative"] is None
    assert rows[2]["derivative"] == 20.0
    assert rows[3]["derivative"] == -10.0
    assert [rows[i]["cumulative_sum"] for i in (1, 2, 3, 4)] == \
        [10.0, 40.0, 60.0, 100.0]
    assert rows[3]["moving_avg"] == 20.0          # (10+30+20)/3
    assert rows[2]["moving_avg"] == 20.0          # partial window (10+30)/2
    assert rows[1]["serial_diff"] is None and rows[2]["serial_diff"] is None
    assert rows[3]["serial_diff"] == 10.0         # 20 - 10
    assert rows[4]["serial_diff"] == 10.0         # 40 - 30


def test_sibling_bucket_aggs(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        bucket_sort_agg, max_bucket_agg, min_bucket_agg,
        stats_bucket_agg,
    )

    buckets = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 9), ("d", 1)],
        "key_ts string, doc_count int",
    )
    s = stats_bucket_agg(buckets).collect()[0]
    assert (s["count"], s["min"], s["max"], s["sum"]) == (4, 1.0, 9.0, 24.0)
    assert abs(s["avg"] - 6.0) < 1e-9
    # ES max_bucket reports ALL tied keys
    assert [r["key"] for r in max_bucket_agg(buckets).collect()] == \
        ["b", "c"]
    assert [r["key"] for r in min_bucket_agg(buckets).collect()] == ["d"]
    # bucket_sort: order by metric desc, from/size paging
    page = bucket_sort_agg(buckets, "doc_count", size=2, from_=1)
    assert [r["doc_count"] for r in page.collect()] == [9, 5]


def test_rare_and_multi_terms(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        multi_terms_agg, rare_terms_agg,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("b", "x"), ("c", "y"), (None, "y")],
        "f string, g string",
    )
    rare = {r["key"]: r["doc_count"]
            for r in rare_terms_agg(df, "f").collect()}
    assert rare == {"b": 1, "c": 1}   # long tail only, nulls dropped
    multi = [(r["key_f"], r["key_g"], r["doc_count"])
             for r in multi_terms_agg(df, ["f", "g"], size=2).collect()]
    assert multi == [("a", "x", 2), ("b", "x", 1)]


def test_adjacency_matrix(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        adjacency_matrix_agg,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "id bigint, v bigint"
    )
    got = {r["key"]: r["doc_count"] for r in adjacency_matrix_agg(df, {
        "lo": F.col("v") <= 20,
        "hi": F.col("v") >= 30,
        "even": F.col("id") % 2 == 0,
    }).collect()}
    # empty intersections (lo&hi) are dropped, ES key format a&b sorted
    assert got == {"lo": 2, "hi": 2, "even": 2,
                   "even&lo": 1, "even&hi": 1}


def test_auto_date_histogram_picks_coarsest_fitting_interval(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        auto_date_histogram_agg,
    )

    # 3 days of hourly events: minute/hour overflow 10 buckets → day
    rows = [(i, f"2024-01-0{1 + i // 24} {i % 24:02d}:00:00")
            for i in range(72)]
    df = spark.createDataFrame(rows, "id bigint, t string").select(
        "id", F.to_timestamp("t").alias("ts")
    )
    out = auto_date_histogram_agg(df, "ts", target_buckets=10)
    rows = out.collect()
    assert all(r["interval"] == "day" for r in rows)
    assert [r["doc_count"] for r in rows] == [24, 24, 24]
    # a tighter budget climbs the ladder further
    out2 = auto_date_histogram_agg(df, "ts", target_buckets=2)
    assert out2.collect()[0]["interval"] == "week"


def test_metrics_extras(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        median_absolute_deviation_agg, top_metrics_agg,
        weighted_avg_agg,
    )

    df = spark.createDataFrame(
        [(1.0, 1), (2.0, 3), (None, 5), (4.0, None)],
        "v double, w bigint",
    )
    wa = weighted_avg_agg(df, "v", "w").collect()[0]["weighted_avg"]
    assert abs(wa - (1.0 * 1 + 2.0 * 3) / 4) < 1e-12  # null rows skipped
    tm = top_metrics_agg(df, "w", "v", size=2).collect()
    assert [(r["sort"], r["metric"]) for r in tm] == [(4.0, None), (2.0, 3)]
    vals = spark.createDataFrame(
        [(float(x),) for x in (1, 1, 2, 2, 4, 6, 9)], "v double"
    )
    mad = median_absolute_deviation_agg(vals, "v").collect()[0]["mad"]
    assert mad == 1.0  # median 2; |x-2| = 1,1,0,0,2,4,7 → median 1


def test_rollup_merge_exact_and_granularity_gate(spark):
    import pytest as _pt

    from elasticsearch_nlp_classifier_spark.query import (
        build_rollup, rollup_query,
    )

    rows = [
        (1, "2024-01-01 00:10:00", "a", 10.0),
        (2, "2024-01-01 00:50:00", "a", 30.0),
        (3, "2024-01-01 13:00:00", "a", 2.0),
        (4, "2024-01-02 00:00:00", "b", 7.0),
        (5, "2024-01-02 05:00:00", "b", None),  # null metric: counted
    ]                                            # in doc_count only
    ev = spark.createDataFrame(
        rows, "id bigint, t string, et string, v double"
    ).select("id", F.to_timestamp("t").alias("ts"), "et", "v")

    ru = build_rollup(ev, "ts", dims=["et"], metrics=["v"], unit="hour")
    assert ru.count() == 4  # 3 distinct (hour, a) + ... buckets

    out = {(r["key_ts"].day, r["et"]): r for r in rollup_query(
        ru, unit="day", rollup_unit="hour", dims=["et"], metrics=["v"]
    ).collect()}
    d1 = out[(1, "a")]
    assert (d1["doc_count"], d1["v_sum"], d1["v_min"], d1["v_max"],
            d1["v_count"]) == (3, 42.0, 2.0, 30.0, 3)
    assert abs(d1["v_avg"] - 14.0) < 1e-12
    d2 = out[(2, "b")]
    assert (d2["doc_count"], d2["v_count"], d2["v_sum"]) == (2, 1, 7.0)

    # a finer histogram than the rollup stores must be refused
    with _pt.raises(ValueError):
        rollup_query(ru, unit="minute", rollup_unit="hour",
                     dims=["et"], metrics=["v"])


def test_sampler_agg(docs):
    from elasticsearch_nlp_classifier_spark.query import sampler_agg

    got = _pd(
        sampler_agg(docs, 20, "n_chars", id_col="doc_id")
        .select("doc_id", "n_chars"),
        ["doc_id"],
    )
    want = duckdb.sql(f"""
        SELECT doc_id, n_chars FROM read_parquet('{DOCS}')
        ORDER BY n_chars DESC, doc_id ASC LIMIT 20
    """).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_diversified_sampler_agg(docs):
    from elasticsearch_nlp_classifier_spark.query import (
        diversified_sampler_agg,
    )

    got = diversified_sampler_agg(
        docs, 20, "n_chars", "lang", max_docs_per_value=2,
        id_col="doc_id",
    )
    rows = got.select("doc_id", "lang", "n_chars").collect()
    # the diversity cap holds
    from collections import Counter
    per_lang = Counter(r["lang"] for r in rows)
    assert all(v <= 2 for v in per_lang.values())
    # matches the SQL formulation exactly
    want = duckdb.sql(f"""
        WITH ranked AS (
          SELECT doc_id, lang, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM read_parquet('{DOCS}')
        )
        SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 2
        ORDER BY n_chars DESC, doc_id ASC LIMIT 20
    """).df().sort_values("doc_id").reset_index(drop=True)
    got_pd = _pd(got.select("doc_id", "lang", "n_chars"), ["doc_id"])
    pd.testing.assert_frame_equal(got_pd, want, check_dtype=False)


def test_rank_eval_hand_computed(spark):
    import math

    from elasticsearch_nlp_classifier_spark.query import rank_eval

    results = spark.createDataFrame(
        [("q1", 1, 1), ("q1", 2, 2), ("q1", 3, 3)],
        "query_id string, doc_id bigint, rank int",
    )
    judgments = spark.createDataFrame(
        [("q1", 2, 1.0), ("q1", 3, 2.0), ("q1", 9, 3.0)],
        "query_id string, doc_id bigint, grade double",
    )
    row = rank_eval(results, judgments, k=3).collect()[0]
    dcg = (2**1 - 1) / math.log2(3) + (2**2 - 1) / math.log2(4)
    idcg = (
        (2**3 - 1) / math.log2(2)
        + (2**2 - 1) / math.log2(3)
        + (2**1 - 1) / math.log2(4)
    )
    assert row["precision_k"] == round(2 / 3, 6)
    assert row["recall_k"] == round(2 / 3, 6)
    assert row["mrr"] == 0.5
    assert row["ndcg_k"] == round(dcg / idcg, 6)


def test_rank_eval_no_relevant_scores_zero(spark):
    from elasticsearch_nlp_classifier_spark.query import rank_eval

    results = spark.createDataFrame(
        [("q1", 1, 1)], "query_id string, doc_id bigint, rank int"
    )
    judgments = spark.createDataFrame(
        [("q1", 9, 0.0)], "query_id string, doc_id bigint, grade double"
    )
    row = rank_eval(results, judgments, k=3).collect()[0]
    assert (row["precision_k"], row["recall_k"], row["mrr"],
            row["ndcg_k"]) == (0.0, 0.0, 0.0, 0.0)


def test_terms_set_and_ids_query(spark):
    from pyspark.sql import functions as F2

    from elasticsearch_nlp_classifier_spark.functions import (
        ids_query,
        terms_set_query,
    )

    df = spark.createDataFrame(
        [
            (1, ["a", "b", "x"]),   # 2 of 3 -> match
            (2, ["a", "a", "a"]),   # 1 distinct -> no
            (3, ["a", "b", "c"]),   # 3 of 3 -> match
            (4, None),              # null -> no (ES semantics)
        ],
        "doc_id bigint, tokens array<string>",
    )
    got = sorted(
        r["doc_id"]
        for r in df.where(
            terms_set_query(F2.col("tokens"), ["a", "b", "c"], 2)
        ).collect()
    )
    assert got == [1, 3]
    assert sorted(
        r["doc_id"] for r in df.where(ids_query("doc_id", [2, 4])).collect()
    ) == [2, 4]


def test_estimators_tolerance_at_large_n(spark):
    """VERDICT r3 #8: the scale-path estimators (`percentiles_agg
    exact=False` = mergeable quantile sketch, `cardinality_agg` =
    HLL++) pass small-N contract entries against EXACT DuckDB only
    because small N happens to be exact — pin their LARGE-N behavior
    with explicit error bounds so the contract never silently depends
    on small-N exactness.

    2M uniform doubles (hash-derived, codegen only): percentile_approx
    at accuracy 10,000 guarantees rank error <= N/10,000; on a uniform
    [0,1) sample that is ~1e-4 in value — assert 20x that margin.
    HLL++ at rsd=0.01 over ~1.2M distinct keys: assert within 5%
    (5 sigma)."""
    n = 2_000_000
    base = spark.range(n).select(
        F.col("id"),
        ((F.xxhash64("id") % 1_000_000_007 + 1_000_000_007)
         % 1_000_000_007 / 1_000_000_007.0).alias("u"),
        (F.col("id") % 1_200_000).alias("key"),
    )

    approx = {
        r["percent"]: r["value"]
        for r in percentiles_agg(base, "u", exact=False).collect()
    }
    exact = {
        r["percent"]: r["value"]
        for r in percentiles_agg(base, "u", exact=True).collect()
    }
    assert set(approx) == set(exact)
    for p, v in approx.items():
        assert abs(v - exact[p]) <= 2e-3, (p, v, exact[p])

    est = cardinality_agg(base, "key", rsd=0.01).collect()[0]["value"]
    true = 1_200_000
    assert abs(est - true) / true <= 0.05, (est, true)
    # and the exact path is exact
    got = cardinality_agg(base, "key", exact=True).collect()[0]["value"]
    assert got == true
