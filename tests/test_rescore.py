"""function_score and two-phase rescore semantics."""

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    bm25_topk,
    function_score,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_function_score_modifiers(spark):
    hits = spark.createDataFrame(
        [(1, 2.0, 99.0), (2, 3.0, 0.0)], "doc_id bigint, score double, f double"
    )
    got = {r["doc_id"]: r["score"] for r in
           function_score(hits, "f", factor=0.1, modifier="ln1p",
                          boost_mode="sum").collect()}
    assert got[1] == pytest.approx(2.0 + math.log(1 + 9.9))
    assert got[2] == pytest.approx(3.0 + math.log(1.0))

    got_m = {r["doc_id"]: r["score"] for r in
             function_score(hits, "f", factor=2.0, modifier="sqrt",
                            boost_mode="multiply").collect()}
    assert got_m[1] == pytest.approx(2.0 * math.sqrt(198.0))
    # ES log1p is log10
    got_l = {r["doc_id"]: r["score"] for r in
             function_score(hits, "f", modifier="log1p",
                            boost_mode="sum").collect()}
    assert got_l[1] == pytest.approx(2.0 + math.log10(100.0))

    with pytest.raises(ValueError):
        function_score(hits, "f", modifier="exp")


def test_rescore_phrase_reorders_within_window(spark, docs,
                                               tmp_path_factory):
    from elasticsearch_nlp_classifier_spark.index.blocks import (
        build_physical_index,
    )
    from elasticsearch_nlp_classifier_spark.query import rescore_phrase
    from elasticsearch_nlp_classifier_spark.query.phrase import (
        match_phrase,
    )

    out = str(tmp_path_factory.mktemp("ridx") / "idx")
    index = build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True,
    )
    res = rescore_phrase(index, "data value", window_size=50, k=10,
                         query_weight=1.0, rescore_weight=100.0,
                         analyzer="simple_code").collect()
    assert len(res) == 10
    # with a dominant rescore weight, every phrase-matching doc in the
    # window outranks every non-matching one
    phrase_docs = {r["doc_id"] for r in
                   match_phrase(index, "data value",
                                analyzer="simple_code").collect()}
    ranks_phrase = [r["rank"] for r in res if r["doc_id"] in phrase_docs]
    ranks_other = [r["rank"] for r in res if r["doc_id"] not in phrase_docs]
    assert ranks_phrase and (not ranks_other
                             or max(ranks_phrase) < min(ranks_other))
    # scores are the weighted combination, strictly rank-ordered
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_decay_score_reference_points(spark):
    """The ES decay contract: value is 1.0 at origin and exactly
    ``decay`` at distance ``scale``, for all three curves."""
    from elasticsearch_nlp_classifier_spark.query import decay_score

    hits = spark.createDataFrame(
        [(1, 1.0, 200.0), (2, 1.0, 300.0), (3, 1.0, 100.0),
         (4, 1.0, 1000.0)],
        "doc_id bigint, score double, n double",
    )
    for fn in ("gauss", "exp", "linear"):
        got = {r["doc_id"]: r["score"] for r in
               decay_score(hits, "n", origin=200.0, scale=100.0,
                           decay=0.5, fn=fn).collect()}
        assert got[1] == pytest.approx(1.0), fn
        assert got[2] == pytest.approx(0.5), fn   # |x-origin| == scale
        assert got[3] == pytest.approx(0.5), fn
    # linear hits exactly 0 beyond scale/(1-decay); gauss/exp never do
    lin = {r["doc_id"]: r["score"] for r in
           decay_score(hits, "n", origin=200.0, scale=100.0,
                       decay=0.5, fn="linear").collect()}
    assert lin[4] == 0.0
    g = {r["doc_id"]: r["score"] for r in
         decay_score(hits, "n", origin=200.0, scale=100.0,
                     decay=0.5, fn="gauss").collect()}
    assert 0.0 < g[4] < 1e-6

    with pytest.raises(ValueError):
        decay_score(hits, "n", 0.0, 1.0, fn="nope")


def test_decay_score_offset_flat_zone(spark):
    from elasticsearch_nlp_classifier_spark.query import decay_score

    hits = spark.createDataFrame(
        [(1, 2.0, 230.0), (2, 2.0, 350.0)],
        "doc_id bigint, score double, n double",
    )
    got = {r["doc_id"]: r["score"] for r in
           decay_score(hits, "n", origin=200.0, scale=100.0, decay=0.5,
                       offset=50.0, fn="exp").collect()}
    assert got[1] == pytest.approx(2.0)          # inside the offset zone
    assert got[2] == pytest.approx(2.0 * 0.5)    # d = 100 = scale


def test_random_score_deterministic_uniform(spark):
    from elasticsearch_nlp_classifier_spark.query import random_score

    hits = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit(1.0).alias("score")
    )
    a = random_score(hits, seed="s1").toPandas().sort_values("doc_id")
    b = random_score(hits, seed="s1").toPandas().sort_values("doc_id")
    c = random_score(hits, seed="s2").toPandas().sort_values("doc_id")
    assert (a.score.values == b.score.values).all()       # reproducible
    assert (a.score.values != c.score.values).any()       # seed matters
    assert ((a.score.values >= 0) & (a.score.values < 1)).all()
    # roughly uniform: mean within 10% of 0.5 on 500 draws
    assert abs(a.score.mean() - 0.5) < 0.05


def test_decay_score_geo_reference_points(spark):
    """Geo decay: 1.0 at the origin, exactly `decay` at scale_km."""
    import math

    from elasticsearch_nlp_classifier_spark.query import decay_score_geo

    origin = (50.0, 10.0)
    # a point ~111.19 km due north (1 degree of latitude)
    rows = [(1, 50.0, 10.0, 1.0), (2, 51.0, 10.0, 1.0)]
    df = spark.createDataFrame(
        rows, "doc_id long, lat double, lon double, score double"
    )
    km_per_deg = 111.19492664455873  # R_earth * pi / 180 for R=6371.0088
    out = {r.doc_id: r.score for r in decay_score_geo(
        df, "lat", "lon", origin, scale_km=km_per_deg, decay=0.5,
    ).collect()}
    assert out[1] == pytest.approx(1.0, abs=1e-9)
    assert out[2] == pytest.approx(0.5, rel=1e-6)
