"""Property-fuzz the aggs surface against DuckDB (VERDICT r3 #7).

`query/aggs.py` is the largest module; its contract entries gate one
path each.  Here ≥100 random agg trees — bucket layer (terms /
terms+subs / histogram / extended-bounds histogram / date_histogram)
× optional pipeline layer (derivative, cumulative_sum, moving_avg,
serial_diff, stats_bucket, max_bucket, min_bucket) — are generated
from a grammar, and the TEST (not the engine) translates each tree to
DuckDB SQL implementing the documented ES semantics; results are
value-compared."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query.aggs import (
    cumulative_sum_agg,
    date_histogram_agg,
    derivative_agg,
    histogram_agg,
    max_bucket_agg,
    min_bucket_agg,
    moving_avg_agg,
    serial_diff_agg,
    stats_bucket_agg,
    terms_agg,
    terms_agg_subs,
)

N_CASES = 110
CATS = [f"cat{i}" for i in range(10)]


@pytest.fixture(scope="module")
def agg_env(spark):
    rng = random.Random(20260822)
    rows = []
    base = pd.Timestamp("2026-01-01")
    for i in range(4000):
        cat = None if rng.random() < 0.05 else \
            CATS[min(int(rng.expovariate(0.35)), 9)]
        rows.append((
            i, cat, rng.randint(0, 499),
            round(rng.uniform(-5, 5), 3),
            base + pd.Timedelta(hours=rng.randint(0, 1400)),
        ))
    pdf = pd.DataFrame(rows, columns=["doc_id", "cat", "n", "v", "ts"])
    sdf = spark.createDataFrame(
        pdf, "doc_id bigint, cat string, n bigint, v double, ts timestamp"
    ).cache()
    sdf.count()
    con = duckdb.connect()
    con.register("t", pdf)
    return sdf, con


# ------------------------------------------------------- bucket layer

def _gen_terms(rng):
    size = rng.choice([3, 5, 10, 20])
    include = exclude = None
    inc_sql = exc_sql = ""
    r = rng.random()
    if r < 0.25:
        include = rng.sample(CATS, rng.randint(2, 6))
        vals = ", ".join(f"'{v}'" for v in include)
        inc_sql = f"AND cat IN ({vals})"
    elif r < 0.45:
        include = f"cat[0-{rng.randint(2, 8)}]"
        inc_sql = f"AND regexp_matches(cat, '^(?:{include})$')"
    if rng.random() < 0.3:
        exclude = rng.sample(CATS, rng.randint(1, 3))
        vals = ", ".join(f"'{v}'" for v in exclude)
        exc_sql = f"AND cat NOT IN ({vals})"

    def run(df):
        return terms_agg(df, "cat", size=size, include=include,
                         exclude=exclude)

    sql = f"""
        SELECT cat AS key, count(*)::BIGINT AS doc_count FROM t
        WHERE cat IS NOT NULL {inc_sql} {exc_sql}
        GROUP BY 1 ORDER BY doc_count DESC, key ASC LIMIT {size}"""
    return run, sql, None


def _gen_terms_subs(rng):
    size = rng.choice([5, 10])
    fns = rng.sample(["sum", "avg", "min", "max"], rng.randint(1, 3))
    subs = {}
    sql_subs = []
    for fn in fns:
        name = f"{fn}_n"
        subs[name] = getattr(F, fn)("n")
        cast = "DOUBLE" if fn == "avg" else "BIGINT"
        sql_subs.append(f"{fn}(n)::{cast} AS {name}")
    order_by = rng.choice([None, "_key"] + [f"{fn}_n" for fn in fns])
    order_dir = rng.choice(["asc", "desc"])

    def run(df):
        return terms_agg_subs(df, "cat", subs, size=size,
                              order_by=order_by, order_dir=order_dir)

    if order_by is None or order_by == "doc_count":
        osql = f"doc_count {order_dir.upper()}, key ASC"
    elif order_by == "_key":
        osql = f"key {order_dir.upper()}"
    else:
        osql = f"{order_by} {order_dir.upper()}, key ASC"
    sql = f"""
        SELECT cat AS key, count(*)::BIGINT AS doc_count,
               {', '.join(sql_subs)}
        FROM t WHERE cat IS NOT NULL
        GROUP BY 1 ORDER BY {osql} LIMIT {size}"""
    return run, sql, None


def _gen_histogram(rng):
    iv = rng.choice([10.0, 25.0, 50.0, 75.0])
    if rng.random() < 0.4:
        lo, hi = sorted((rng.randint(-100, 200), rng.randint(250, 700)))
        mdc = 0
        lo_k, hi_k = int(lo // iv), int(hi // iv)

        def run(df):
            return histogram_agg(df, "n", iv, min_doc_count=0,
                                 extended_bounds=(lo, hi))

        sql = f"""
            WITH agg AS (
              SELECT (floor(n / {iv}) * {iv})::DOUBLE AS key,
                     count(*)::BIGINT AS doc_count
              FROM t WHERE n IS NOT NULL GROUP BY 1
            ),
            spine AS (
              SELECT (x * {iv})::DOUBLE AS key
              FROM generate_series({lo_k}, {hi_k}) AS s(x)
            )
            SELECT key, coalesce(doc_count, 0)::BIGINT AS doc_count
            FROM spine FULL OUTER JOIN agg USING (key)
            WHERE coalesce(doc_count, 0) >= {mdc} ORDER BY key"""
        return run, sql, "key"
    mdc = rng.choice([1, 2, 5])

    def run(df):
        return histogram_agg(df, "n", iv, min_doc_count=mdc)

    sql = f"""
        SELECT (floor(n / {iv}) * {iv})::DOUBLE AS key,
               count(*)::BIGINT AS doc_count
        FROM t WHERE n IS NOT NULL GROUP BY 1
        HAVING count(*) >= {mdc} ORDER BY key"""
    return run, sql, "key"


def _gen_date_histogram(rng):
    unit = rng.choice(["hour", "day", "week", "month"])

    def run(df):
        return date_histogram_agg(df, "ts", unit=unit)

    sql = f"""
        SELECT date_trunc('{unit}', ts) AS key_ts,
               count(*)::BIGINT AS doc_count
        FROM t WHERE ts IS NOT NULL GROUP BY 1 ORDER BY key_ts"""
    return run, sql, "key_ts"


# ----------------------------------------------------- pipeline layer

def _gen_pipeline(rng, key_col):
    kc = key_col
    kind = rng.choice(["derivative", "cumulative_sum", "moving_avg",
                       "serial_diff", "stats_bucket", "max_bucket",
                       "min_bucket"])
    if kind == "derivative":
        return (lambda b: derivative_agg(b, "doc_count", kc),
                f""", piped AS (
              SELECT *, (doc_count - lag(doc_count, 1) OVER
                         (ORDER BY {kc}))::DOUBLE AS derivative
              FROM buckets
            ) SELECT * FROM piped""")
    if kind == "cumulative_sum":
        return (lambda b: cumulative_sum_agg(b, "doc_count", kc),
                f""", piped AS (
              SELECT *, sum(doc_count) OVER (ORDER BY {kc}
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              )::DOUBLE AS cumulative_sum
              FROM buckets
            ) SELECT * FROM piped""")
    if kind == "moving_avg":
        w = rng.choice([2, 3, 5])
        return (lambda b: moving_avg_agg(b, "doc_count", kc, window=w),
                f""", piped AS (
              SELECT *, avg(doc_count) OVER (ORDER BY {kc}
                ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
              )::DOUBLE AS moving_avg
              FROM buckets
            ) SELECT * FROM piped""")
    if kind == "serial_diff":
        lag = rng.choice([1, 2, 3])
        return (lambda b: serial_diff_agg(b, "doc_count", kc, lag=lag),
                f""", piped AS (
              SELECT *, (doc_count - lag(doc_count, {lag}) OVER
                         (ORDER BY {kc}))::DOUBLE AS serial_diff
              FROM buckets
            ) SELECT * FROM piped""")
    if kind == "stats_bucket":
        return (lambda b: stats_bucket_agg(b, "doc_count"),
                """ SELECT count(*)::BIGINT AS count,
                   min(doc_count)::DOUBLE AS min,
                   max(doc_count)::DOUBLE AS max,
                   avg(doc_count)::DOUBLE AS avg,
                   sum(doc_count)::DOUBLE AS sum
            FROM buckets""")
    agg = "max" if kind == "max_bucket" else "min"
    fn = max_bucket_agg if kind == "max_bucket" else min_bucket_agg
    return (lambda b: fn(b, "doc_count", kc),
            f""" SELECT {kc} AS key, doc_count::DOUBLE AS value
            FROM buckets
            WHERE doc_count = (SELECT {agg}(doc_count) FROM buckets)
            ORDER BY key""")


def _gen_case(rng):
    gen = rng.choice([_gen_terms, _gen_terms, _gen_terms_subs,
                      _gen_terms_subs, _gen_histogram, _gen_histogram,
                      _gen_date_histogram])
    run, sql, key_col = gen(rng)
    if key_col is not None and rng.random() < 0.55:
        prun, psql = _gen_pipeline(rng, key_col)
        sql = f"WITH buckets AS ({sql}){psql}"
        run2 = run

        def run(df, _r=run2, _p=prun):  # noqa: B006 - capture
            return _p(_r(df))
    return run, sql


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        elif pdf[c].dtype == object or str(pdf[c].dtype).startswith(
                "datetime"):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_fuzz_aggs_vs_duckdb(spark, agg_env):
    sdf, con = agg_env
    rng = random.Random(5150)
    mismatches = []
    nonempty = 0
    for i in range(N_CASES):
        run, sql = _gen_case(rng)
        got = run(sdf).toPandas()
        want = con.sql(sql).df()
        nonempty += bool(len(want))
        g, w = _canon(got), _canon(want)
        same = sorted(g.columns) == sorted(w.columns) and len(g) == len(w)
        if same:
            for c in g.columns:
                gv, wv = g[c], w[c]
                if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                    import numpy as np

                    ga = gv.astype(float).to_numpy()
                    wa = wv.astype(float).to_numpy()
                    ok = np.allclose(ga, wa, rtol=0, atol=1e-9,
                                     equal_nan=True)
                else:
                    ok = (gv.astype(str).to_numpy()
                          == wv.astype(str).to_numpy()).all()
                if not ok:
                    same = False
                    break
        if not same:
            mismatches.append((i, sql, g.head(12), w.head(12)))
    assert not mismatches, (
        f"{len(mismatches)}/{N_CASES} agg mismatches; first: "
        f"case {mismatches[0][0]}\nsql: {mismatches[0][1]}\n"
        f"spark:\n{mismatches[0][2]}\nduck:\n{mismatches[0][3]}"
    )
    assert nonempty >= N_CASES * 3 // 4, nonempty
