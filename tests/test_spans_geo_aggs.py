"""Span-query family, intervals query, geo queries/aggs, and the new
metric aggs (string_stats / boxplot / matrix_stats / t_test /
scripted_metric) — each pinned against an independent plain-Python
spec."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index.blocks import (
    build_physical_index,
)
from elasticsearch_nlp_classifier_spark.query import (
    boxplot_agg,
    geo_bounding_box_query,
    geo_bounds_agg,
    geo_centroid_agg,
    geo_distance_agg,
    geo_distance_query,
    geotile_grid_agg,
    haversine_km,
    intervals_match,
    matrix_stats_agg,
    scripted_metric_agg,
    span_first,
    span_not,
    span_or,
    string_stats_agg,
    t_test_agg,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "quick brown quick brown quick brown"),
    (2, "brown quick and the fox is lazy"),
    (3, "the quick red fox"),
    (4, "entirely unrelated words here"),
    (5, ""),
    (6, "quick"),
    (7, "one quick brown fox and another quick brown fox"),
    (8, "fox alpha beta gamma quick delta brown"),
]

TOKS = {i: t.split() for i, t in DOCS}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string").cache()


@pytest.fixture(scope="module")
def pos_index(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("spanidx") / "idx")
    return build_physical_index(
        docs, out, text_col="text", analyzer="simple_code",
        with_positions=True, block_size=4,
    )


def _rows(df):
    return {r["doc_id"]: r["n_matches"] for r in df.collect()}


# ---------------------------------------------------------------- spans


def test_span_or_counts_union_occurrences(pos_index):
    got = _rows(span_or(pos_index, ["quick", "fox"],
                        analyzer="simple_code"))
    want = {
        i: sum(1 for w in ws if w in ("quick", "fox"))
        for i, ws in TOKS.items()
    }
    want = {i: n for i, n in want.items() if n > 0}
    assert got == want


def test_span_first_boundary(pos_index):
    # spans ending within the first 2 positions: position p needs p+1<=2
    got = _rows(span_first(pos_index, "quick", end=2,
                           analyzer="simple_code"))
    want = {}
    for i, ws in TOKS.items():
        n = sum(1 for p, w in enumerate(ws) if w == "quick" and p + 1 <= 2)
        if n:
            want[i] = n
    assert got == want


def test_span_first_requires_single_term(pos_index):
    with pytest.raises(ValueError):
        span_first(pos_index, "quick brown", end=3,
                   analyzer="simple_code")


def test_span_not_window(pos_index):
    # 'quick' occurrences with no 'brown' within 1 before / 1 after
    got = _rows(span_not(pos_index, "quick", "brown", pre=1, post=1,
                         analyzer="simple_code"))
    want = {}
    for i, ws in TOKS.items():
        bpos = {p for p, w in enumerate(ws) if w == "brown"}
        n = sum(
            1 for p, w in enumerate(ws)
            if w == "quick"
            and not any(q in bpos for q in range(p - 1, p + 2))
        )
        if n:
            want[i] = n
    assert got == want, (got, want)


def test_span_not_exclude_absent_keeps_all(pos_index):
    got = _rows(span_not(pos_index, "fox", "zzz", pre=5, post=5,
                         analyzer="simple_code"))
    want = {i: sum(1 for w in ws if w == "fox")
            for i, ws in TOKS.items() if "fox" in ws}
    assert got == want


def _intervals_spec(terms, max_gaps):
    """Anchor-based unordered intervals spec (module docstring)."""
    want = {}
    for i, ws in TOKS.items():
        pos = {t: [p for p, w in enumerate(ws) if w == t] for t in terms}
        if any(not v for v in pos.values()):
            continue
        anchors = sorted({p for t in terms for p in pos[t]})
        n = 0
        for p in anchors:
            nxt = []
            ok = True
            for t in terms:
                after = [q for q in pos[t] if q >= p]
                if not after:
                    ok = False
                    break
                nxt.append(min(after))
            if ok and max(nxt) - p - (len(terms) - 1) <= max_gaps:
                n += 1
        if n:
            want[i] = n
    return want


@pytest.mark.parametrize("max_gaps", [0, 1, 3])
def test_intervals_unordered_matches_spec(pos_index, max_gaps):
    got = _rows(intervals_match(pos_index, "brown quick",
                                max_gaps=max_gaps, ordered=False,
                                analyzer="simple_code"))
    assert got == _intervals_spec(["brown", "quick"], max_gaps)


def test_intervals_ordered_is_span_near(pos_index):
    from elasticsearch_nlp_classifier_spark.query import span_near

    a = _rows(intervals_match(pos_index, "quick fox", max_gaps=2,
                              ordered=True, analyzer="simple_code"))
    b = _rows(span_near(pos_index, "quick fox", slop=2,
                        analyzer="simple_code"))
    assert a == b and a  # non-empty


def test_intervals_rejects_duplicate_terms(pos_index):
    with pytest.raises(ValueError):
        intervals_match(pos_index, "quick quick", ordered=False,
                        analyzer="simple_code")


# ----------------------------------------------------------------- geo

PTS = [
    # (id, lat, lon)
    (0, 0.0, 0.0),
    (1, 10.0, 20.0),
    (2, -35.5, 150.1),
    (3, 51.5, -0.12),
    (4, 51.6, -0.11),
    (5, 89.0, 179.9),
    (6, -89.0, -179.9),
    (7, 40.7, -74.0),
]


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        PTS, "id bigint, lat double, lon double"
    ).cache()


def _hav(lat1, lon1, lat2, lon2):
    r = 6371.0
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return 2 * r * math.asin(math.sqrt(a))


def test_haversine_matches_python(pts):
    rows = pts.select(
        "id",
        haversine_km(F.col("lat"), F.col("lon"), 51.5, -0.12).alias("d"),
    ).collect()
    for r in rows:
        lat, lon = PTS[r["id"]][1], PTS[r["id"]][2]
        assert r["d"] == pytest.approx(_hav(lat, lon, 51.5, -0.12),
                                       rel=1e-9)


def test_geo_distance_query_radius(pts):
    got = {r["id"] for r in pts.where(
        geo_distance_query(F.col("lat"), F.col("lon"), 51.5, -0.12, 50.0)
    ).collect()}
    want = {i for i, la, lo in PTS if _hav(la, lo, 51.5, -0.12) <= 50.0}
    assert got == want == {3, 4}


def test_geo_bounding_box_plain_and_dateline(pts):
    got = {r["id"] for r in pts.where(
        geo_bounding_box_query(F.col("lat"), F.col("lon"),
                               top=60.0, left=-10.0, bottom=30.0,
                               right=30.0)
    ).collect()}
    assert got == {3, 4}
    # antimeridian crossing: left=170 > right=-170
    got = {r["id"] for r in pts.where(
        geo_bounding_box_query(F.col("lat"), F.col("lon"),
                               top=90.0, left=170.0, bottom=-90.0,
                               right=-170.0)
    ).collect()}
    want = {i for i, _, lo in PTS if lo >= 170.0 or lo <= -170.0}
    assert got == want == {5, 6}


def test_geo_distance_agg_rings(pts):
    out = {r["key"]: r["doc_count"] for r in geo_distance_agg(
        pts, F.col("lat"), F.col("lon"), 0.0, 0.0,
        [(None, 3000.0), (3000.0, 10000.0), (10000.0, None)],
    ).collect()}
    dist = {i: _hav(la, lo, 0.0, 0.0) for i, la, lo in PTS}
    assert out["*-3000.0"] == sum(1 for d in dist.values() if d < 3000)
    assert out["3000.0-10000.0"] == sum(
        1 for d in dist.values() if 3000 <= d < 10000)
    assert out["10000.0-*"] == sum(1 for d in dist.values() if d >= 10000)


def _tile(lat, lon, z):
    n = 1 << z
    lat = max(min(lat, 85.05112878), -85.05112878)
    x = int((lon + 180.0) / 360.0 * n)
    rl = math.radians(lat)
    y = int((1 - math.log(math.tan(rl) + 1 / math.cos(rl)) / math.pi)
            / 2 * n)
    return f"{z}/{min(x, n - 1)}/{max(min(y, n - 1), 0)}"


@pytest.mark.parametrize("z", [0, 3, 7])
def test_geotile_grid_matches_slippy_spec(pts, z):
    out = {r["key"]: r["doc_count"] for r in geotile_grid_agg(
        pts, F.col("lat"), F.col("lon"), precision=z, size=100,
    ).collect()}
    want = {}
    for _, la, lo in PTS:
        k = _tile(la, lo, z)
        want[k] = want.get(k, 0) + 1
    assert out == want


def test_geo_centroid_and_bounds(pts):
    c = geo_centroid_agg(pts, F.col("lat"), F.col("lon")).collect()[0]
    lats = [la for _, la, _ in PTS]
    lons = [lo for _, _, lo in PTS]
    assert c["lat"] == pytest.approx(sum(lats) / len(lats), abs=1e-6)
    assert c["lon"] == pytest.approx(sum(lons) / len(lons), abs=1e-6)
    b = geo_bounds_agg(pts, F.col("lat"), F.col("lon")).collect()[0]
    assert (b["top"], b["left"], b["bottom"], b["right"]) == (
        max(lats), min(lons), min(lats), max(lons))


# ------------------------------------------------------------ new aggs


def test_string_stats(docs):
    out = string_stats_agg(docs, "text").collect()[0]
    texts = [t for _, t in DOCS]
    lens = [len(t) for t in texts]
    assert out["count"] == len(texts)
    assert out["min_length"] == min(lens)
    assert out["max_length"] == max(lens)
    assert out["avg_length"] == pytest.approx(sum(lens) / len(lens),
                                              abs=1e-6)
    chars = "".join(texts)
    from collections import Counter

    cnt = Counter(chars)
    n = sum(cnt.values())
    h = -sum(c / n * math.log2(c / n) for c in cnt.values())
    assert out["entropy"] == pytest.approx(h, abs=1e-6)


def test_boxplot_exact_and_approx(spark):
    vals = [float(v) for v in range(1, 102)]  # 1..101
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = boxplot_agg(df, "v", exact=True).collect()[0]
    assert (out["min"], out["q1"], out["q2"], out["q3"], out["max"]) == (
        1.0, 26.0, 51.0, 76.0, 101.0)
    approx = boxplot_agg(df, "v", exact=False).collect()[0]
    assert approx["q2"] == pytest.approx(51.0, abs=2.0)


def test_matrix_stats_vs_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.normal(10, 3, 400)
    y = 2.0 * x + rng.normal(0, 1, 400)
    z = rng.uniform(0, 5, 400)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    rows = {(r["field_a"], r["field_b"]): r
            for r in matrix_stats_agg(df, ["x", "y", "z"]).collect()}
    arr = {"x": x, "y": y, "z": z}
    for f, v in arr.items():
        r = rows[(f, f)]
        m = v.mean()
        m2 = ((v - m) ** 2).mean()
        m3 = ((v - m) ** 3).mean()
        m4 = ((v - m) ** 4).mean()
        assert r["count"] == 400
        assert r["mean"] == pytest.approx(m, abs=1e-5)
        assert r["variance"] == pytest.approx(m2, rel=1e-5)
        assert r["skewness"] == pytest.approx(m3 / m2**1.5, abs=1e-5)
        assert r["kurtosis"] == pytest.approx(m4 / m2**2, abs=1e-5)
        assert r["correlation"] == 1.0
    r = rows[("x", "y")]
    cov = np.cov(x, y, bias=True)[0, 1]
    corr = np.corrcoef(x, y)[0, 1]
    assert r["covariance"] == pytest.approx(cov, rel=1e-5)
    assert r["correlation"] == pytest.approx(corr, rel=1e-5)
    # null rows (missing any field) are excluded like ES
    df2 = df.unionByName(spark.createDataFrame(
        [(None, 1.0, 1.0)], "x double, y double, z double"))
    assert matrix_stats_agg(df2, ["x", "y"]).collect()[0]["count"] == 400


def test_t_test_welch_and_pooled(spark):
    a = [5.1, 4.9, 5.3, 5.0, 5.2, 4.8, 5.05, 5.15]
    b = [4.2, 4.4, 4.1, 4.3, 4.25, 4.35]
    rows = ([("a", v) for v in a] + [("b", v) for v in b])
    df = spark.createDataFrame(rows, "grp string, v double")
    out = t_test_agg(df, "v", F.col("grp") == "a", F.col("grp") == "b",
                     typ="heteroscedastic").collect()[0]
    na, nb = len(a), len(b)
    ma, mb = np.mean(a), np.mean(b)
    va, vb = np.var(a, ddof=1), np.var(b, ddof=1)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert out["t_value"] == pytest.approx(t, abs=1e-6)
    assert out["degrees_of_freedom"] == pytest.approx(dof, abs=1e-5)
    out2 = t_test_agg(df, "v", F.col("grp") == "a", F.col("grp") == "b",
                      typ="homoscedastic").collect()[0]
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    t2 = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert out2["t_value"] == pytest.approx(t2, abs=1e-6)
    assert out2["degrees_of_freedom"] == na + nb - 2


def test_scripted_metric_mergeable(spark):
    import pandas as pd

    rows = [(f"g{i % 3}", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "grp string, v double")

    def map_fn(pdf):
        return {"s": float(pdf["v"].sum()), "n": int(len(pdf))}

    def reduce_fn(states):
        return {"s": sum(s["s"] for s in states),
                "n": sum(s["n"] for s in states)}

    def finalize(st):
        return {"mean_v": round(st["s"] / st["n"], 6)}

    out = {r["grp"]: r["mean_v"] for r in scripted_metric_agg(
        df, "grp", map_fn, reduce_fn, finalize,
        state_fields=["s", "n"], out_schema="mean_v double",
    ).collect()}
    want = {}
    agg = {}
    for g, v in rows:
        agg.setdefault(g, []).append(v)
    for g, vs in agg.items():
        want[g] = round(sum(vs) / len(vs), 6)
    assert out == want
    assert isinstance(pd.DataFrame(), pd.DataFrame)  # pandas used above


# ------------------------------------------- span_containing / within / multi


def _big_spans(ws, t1, t2, slop):
    out = []
    for p, w in enumerate(ws):
        if w != t1:
            continue
        qs = [q for q, v in enumerate(ws) if v == t2 and q > p]
        if not qs:
            continue
        q = min(qs)  # greedy-minimal, as the engine documents
        if q - p - 1 <= slop:
            out.append((p, q))
    return out


@pytest.mark.parametrize("slop", [0, 1, 3])
def test_span_containing_vs_spec(pos_index, slop):
    from elasticsearch_nlp_classifier_spark.query import span_containing

    got = _rows(span_containing(
        pos_index, ("quick", "fox", slop), "brown",
        analyzer="simple_code",
    ))
    want = {}
    for i, ws in TOKS.items():
        n = sum(
            1 for (p, q) in _big_spans(ws, "quick", "fox", slop)
            if any(ws[r] == "brown" for r in range(p, q + 1))
        )
        if n > 0:
            want[i] = n
    assert got == want


@pytest.mark.parametrize("slop", [0, 2, 4])
def test_span_within_vs_spec(pos_index, slop):
    from elasticsearch_nlp_classifier_spark.query import span_within

    got = _rows(span_within(
        pos_index, "brown", ("quick", "fox", slop),
        analyzer="simple_code",
    ))
    want = {}
    for i, ws in TOKS.items():
        spans = _big_spans(ws, "quick", "fox", slop)
        n = sum(
            1 for r, w in enumerate(ws)
            if w == "brown" and any(p <= r <= q for (p, q) in spans)
        )
        if n > 0:
            want[i] = n
    assert got == want


def test_span_multi_prefix_and_wildcard(pos_index):
    from elasticsearch_nlp_classifier_spark.query import span_multi

    # prefix: qu* -> {quick}
    got = _rows(span_multi(pos_index, "qu*"))
    want = {i: sum(1 for w in ws if w.startswith("qu"))
            for i, ws in TOKS.items()}
    want = {i: n for i, n in want.items() if n > 0}
    assert got == want

    # wildcard with ?: f?x -> {fox}
    got = _rows(span_multi(pos_index, "f?x"))
    want = {i: sum(1 for w in ws if w == "fox") for i, ws in TOKS.items()}
    want = {i: n for i, n in want.items() if n > 0}
    assert got == want


def test_span_multi_no_expansion_is_empty(pos_index):
    from elasticsearch_nlp_classifier_spark.query import span_multi

    assert span_multi(pos_index, "zzz*").count() == 0
