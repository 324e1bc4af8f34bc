"""Field collapsing, search_after pagination, composite aggregation,
and document chunking — pinned against DuckDB / exhaustive specs."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators import chunk_documents
from elasticsearch_nlp_classifier_spark.query import (
    collapse_topk,
    composite_agg,
    search_after,
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


def test_collapse_topk_vs_duckdb(docs):
    got = (collapse_topk(docs, "lang", "n_chars", k=3)
           .toPandas().sort_values("rank").reset_index(drop=True))
    want = duckdb.sql(f"""
        WITH best AS (
          SELECT lang AS key, doc_id AS id, n_chars::DOUBLE AS sort_value,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY round(n_chars, 9) DESC, doc_id ASC) AS rn
          FROM read_parquet('{DOCS}') WHERE lang IS NOT NULL
        )
        SELECT row_number() OVER (ORDER BY round(sort_value, 9) DESC,
                                  id ASC)::BIGINT AS rank,
               key, id, sort_value
        FROM best WHERE rn = 1 ORDER BY rank LIMIT 3
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_search_after_pages_cover_exactly(docs):
    """Walking pages via search_after reproduces the global order with
    no gaps or repeats, and deep pages never re-read earlier rows."""
    hits = docs.select("doc_id", F.col("n_chars").alias("score"))
    full = [(r["id"], r["sort_value"]) for r in
            hits.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
            .select(F.col("doc_id").alias("id"),
                    F.col("score").cast("double").alias("sort_value"))
            .limit(25).collect()]
    pages, cursor = [], None
    for _ in range(5):
        page = search_after(hits, cursor, "score", "doc_id",
                            size=5).collect()
        assert len(page) == 5
        pages.extend((r["id"], r["sort_value"]) for r in page)
        cursor = (page[-1]["sort_value"], page[-1]["id"])
    assert pages == full


def test_composite_agg_pagination(events):
    p1 = composite_agg(events, ["event_type", "user_id"],
                       size=7).collect()
    assert len(p1) == 7
    after = (p1[-1]["event_type"], p1[-1]["user_id"])
    p2 = composite_agg(events, ["event_type", "user_id"], size=7,
                       after=after).collect()
    got = [(r["event_type"], r["user_id"], r["doc_count"])
           for r in p1 + p2]
    want = [tuple(r) for r in duckdb.sql(f"""
        SELECT event_type, user_id, count(*)::BIGINT
        FROM read_parquet('{EVENTS}')
        WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 14
    """).fetchall()]
    assert got == want


def test_composite_after_validates(events):
    with pytest.raises(ValueError):
        composite_agg(events, ["event_type"], after=("a", "b"))


# --- chunking ---------------------------------------------------------------

def _spec_chunks(text, max_tokens, overlap):
    toks = [t for t in (text or "").split() if t]
    if not toks:
        return []
    stride = max_tokens - overlap
    out, i = [], 0
    while True:
        w = toks[i * stride: i * stride + max_tokens]
        out.append((i, " ".join(w), len(w)))
        if i * stride + max_tokens >= len(toks):
            break
        i += 1
    return out


@pytest.mark.parametrize("max_tokens,overlap", [
    (10, 0), (10, 2), (5, 4), (100, 10),
])
def test_chunk_documents_matches_spec(spark, max_tokens, overlap):
    rows = [
        (0, " ".join(f"t{i}" for i in range(23))),
        (1, "one two three"),
        (2, ""),
        (3, None),
        (4, "exactlyten " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(
        (r["id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, max_tokens, overlap).collect()
    )
    want = sorted(
        (did, cid, ctext, n)
        for did, text in rows
        for cid, ctext, n in _spec_chunks(text, max_tokens, overlap)
    )
    assert got == want


def test_chunk_coverage_and_overlap_invariants(spark, docs):
    out = chunk_documents(docs, 64, 8).cache()
    # every chunk except a doc's last has exactly max_tokens tokens
    w_max = out.groupBy("id").agg(F.max("chunk_id").alias("last"))
    not_last = out.join(w_max, "id").where("chunk_id < last")
    assert not_last.where("n_tokens <> 64").count() == 0
    # reconstruction: stride-prefix of each chunk concatenated == doc tokens
    stride = 64 - 8
    rebuilt = (
        out.withColumn(
            "_pre",
            F.when(
                F.col("chunk_id")
                < F.max("chunk_id").over(Window.partitionBy("id")),
                F.slice(F.split("chunk_text", r"\s+"), 1, stride),
            ).otherwise(F.split("chunk_text", r"\s+")),
        )
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("chunk_id", "_pre")))
             .alias("ps"))
        .select(
            "id",
            F.flatten(F.transform("ps", lambda s: s["_pre"]))
            .alias("toks"),
        )
    )
    orig = docs.select(
        F.col("doc_id").alias("id"),
        F.filter(F.split(F.coalesce("text", F.lit("")), r"\s+"),
                 lambda t: t != "").alias("want"),
    ).where(F.size("want") > 0)
    bad = (rebuilt.join(orig, "id")
           .where(F.col("toks") != F.col("want")).count())
    assert bad == 0


def test_chunk_validates_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, 10, 10)


# --------------------------------------------------------- sparse_vector


def test_sparse_vector_topk_vs_plain_python(spark):
    import math

    from elasticsearch_nlp_classifier_spark.query import (
        sparse_vector_topk,
        text_expansion_features,
    )

    docs = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple cherry cherry date"),
        (3, "date elderberry"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    feats = text_expansion_features(df, "text", analyzer="simple_code")

    # plain-python twin of the expansion weights
    toks = {i: t.split() for i, t in docs}
    n = sum(1 for ws in toks.values() if ws)
    dfreq = {}
    for ws in toks.values():
        for t in set(ws):
            dfreq[t] = dfreq.get(t, 0) + 1

    def w(i, t):
        return toks[i].count(t) * math.log(1 + n / dfreq[t])

    got_feats = {(r.doc_id, r.feature): r.weight for r in feats.collect()}
    for (i, t), v in got_feats.items():
        assert v == __import__("pytest").approx(w(i, t))

    q = {"apple": 2.0, "cherry": 1.0, "missing": 5.0}
    got = [(r.doc_id, r.rank, r.score_r9)
           for r in sparse_vector_topk(feats, q, k=3).collect()]
    spec = sorted(
        (
            (i, round(sum(qw * w(i, t) for t, qw in q.items()
                          if t in toks[i]), 9))
            for i in toks if any(t in toks[i] for t in q)
        ),
        key=lambda p: (-p[1], p[0]),
    )[:3]
    assert got == [(i, r + 1, s) for r, (i, s) in enumerate(spec)]


def test_sparse_vector_empty_query(spark):
    from elasticsearch_nlp_classifier_spark.query import sparse_vector_topk

    feats = spark.createDataFrame(
        [(0, "a", 1.0)], "doc_id bigint, feature string, weight double"
    )
    assert sparse_vector_topk(feats, {}, k=5).count() == 0


def test_sparse_vector_prunes_scan_to_query_features(spark):
    from elasticsearch_nlp_classifier_spark.query import sparse_vector_topk

    feats = spark.createDataFrame(
        [(0, "a", 1.0), (0, "b", 2.0), (1, "b", 1.0), (1, "zz", 9.0)],
        "doc_id bigint, feature string, weight double",
    )
    plan = sparse_vector_topk(
        feats, {"b": 1.0}, k=2
    )._jdf.queryExecution().executedPlan().toString()
    # the query-feature restriction must sit in the scan-side filter,
    # not after the join (Catalyst folds a 1-element isin to equality)
    assert "IN (b)" in plan or "= b)" in plan, plan[:2000]
    assert plan.index("= b)" if "= b)" in plan else "IN (b)") > plan.index(
        "BroadcastHashJoin"
    ), "feature filter must be below the join (scan side)"
    got = [(r.doc_id, r.score_r9)
           for r in sparse_vector_topk(feats, {"b": 1.0}, k=2).collect()]
    assert got == [(0, 2.0), (1, 1.0)]


def test_collapse_inner_hits_structure(spark):
    from elasticsearch_nlp_classifier_spark.query import (
        collapse_inner_hits,
        collapse_topk,
    )

    hits = spark.createDataFrame(
        [(1, "a", 9.0), (2, "a", 7.0), (3, "a", 5.0),
         (4, "b", 8.0), (5, "b", 6.0),
         (6, "c", 4.0)],
        "doc_id bigint, grp string, score double",
    )
    out = {r.key: r for r in collapse_inner_hits(
        hits, "grp", "score", k=2, inner_size=2).collect()}
    # global ranking by best-of-group: a(9) then b(8); c cut by k=2
    assert set(out) == {"a", "b"}
    assert out["a"].rank == 1 and out["a"].id == 1
    assert [(h.id, h.sort_value) for h in out["a"].inner_hits] == \
        [(1, 9.0), (2, 7.0)]  # inner_size=2 cuts doc 3
    assert [(h.id, h.sort_value) for h in out["b"].inner_hits] == \
        [(4, 8.0), (5, 6.0)]
    # representative row agrees with plain collapse
    plain = {r.key: r.id for r in collapse_topk(
        hits, "grp", "score", k=2).collect()}
    assert {k: v.id for k, v in out.items()} == plain
