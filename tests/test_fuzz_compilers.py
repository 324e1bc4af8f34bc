"""Property-fuzz the two compilers against DuckDB (VERDICT r2 #5).

Random ES Query-DSL bodies and ES|QL pipelines are generated from a
small grammar; for each case the TEST (not the engine) independently
translates the same AST to DuckDB SQL implementing the documented
semantics, and results are value-compared.  This gates the long tail
of both compilers the way the contract entries gate single paths.

- DSL: bool (must/should/must_not/filter/minimum_should_match with
  per-should boosts), dis_max (tie_breaker), constant_score,
  boosting, and bare match — ≥120 generated bodies.
- ES|QL: FROM | WHERE (comparisons, AND/OR/NOT, IN, IS NULL) | EVAL |
  KEEP | STATS ... BY | SORT | LIMIT — ≥100 generated pipelines.

Scoring spec under test (bm25.py docstring): idf = ln(1+(N−df+.5)/(df+.5)),
tf̂ = tf/(tf+1.2·(0.25+0.75·dl/avgdl)), rank on round(score, 9) DESC,
doc_id ASC.
"""

from __future__ import annotations

import random
import re

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query import (
    RetrieverContext,
    es_search,
)
from elasticsearch_nlp_classifier_spark.query.esql import esql

VOCAB = ["data", "spark", "index", "query", "engine", "value", "build",
         "merge", "token", "block", "score", "shard", "cache", "batch",
         "error", "retry"]
K = 10

N_DSL_CASES = 120
N_ESQL_CASES = 100


def _mk_docs(rng: random.Random, n=80):
    rows = []
    for i in range(n):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(4, 12))]
        rows.append((i, " ".join(words)))
    return rows


@pytest.fixture(scope="module")
def dsl_env(spark):
    rng = random.Random(20260821)
    rows = _mk_docs(rng)
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    idx = build_logical_index(docs, text_col="text",
                              analyzer="simple_code")
    idx.postings = idx.postings.cache()
    idx.postings.count()
    idx.corpus_stats  # freeze
    ctx = RetrieverContext(index=idx, docs=docs, analyzer="simple_code",
                           text_field="text")
    con = duckdb.connect()
    con.register("fdocs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return ctx, con


_PRELUDE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM fdocs
),
posts AS (SELECT doc_id, unnest(w) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM posts
       GROUP BY 1, 2),
dl AS (SELECT doc_id, len(w)::BIGINT AS dl FROM toks WHERE len(w) > 0),
stats AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
corpus AS (SELECT count(*)::BIGINT AS n,
                  sum(dl)::DOUBLE / count(*) AS avgdl FROM dl)
"""

_CONTRIB = (
    "{b} * ln(1 + ((SELECT n FROM corpus) - s.df + 0.5) / (s.df + 0.5))"
    " * tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl"
    " / (SELECT avgdl FROM corpus)))"
)

_FINISH = """
SELECT row_number() OVER (ORDER BY round(score, 9) DESC, doc_id ASC)
         ::BIGINT AS rank,
       doc_id, round(score, 6) AS score_r6
FROM scored ORDER BY rank LIMIT {k}
"""


def _tok(s: str) -> list[str]:
    # the trivially-specified simple_code tokenizer, reimplemented
    # independently of the engine's analyzer module
    return re.findall(r"[a-z0-9]+", s.lower())


def _per_sql(clause_rows: list[tuple[str, str, float]]) -> str:
    vals = ", ".join(f"('{t}', '{c}', {b!r})" for t, c, b in clause_rows)
    return f"""
clause(term, clause, boost) AS (VALUES {vals}),
per AS (
  SELECT tf.doc_id, c.clause, {_CONTRIB.format(b='c.boost')} AS contrib
  FROM clause c
  JOIN tf ON tf.term = c.term
  JOIN stats s ON s.term = c.term
  JOIN dl ON dl.doc_id = tf.doc_id
)"""


def _bool_sql(body: dict) -> str:
    must = sorted({t for s in body.get("must", []) for t in _tok(s)})
    should: dict[str, float] = {}
    for s, b in body.get("should", []):
        for t in _tok(s):
            should[t] = max(should.get(t, 0.0), float(b))
    must_not = sorted({t for s in body.get("must_not", [])
                       for t in _tok(s)})
    filt = sorted({t for s in body.get("filter", []) for t in _tok(s)})
    msm = body.get("minimum_should_match")
    if msm is None:
        msm = 0 if (must or filt) else 1
    rows = ([(t, "must", 1.0) for t in must]
            + [(t, "should", b) for t, b in sorted(should.items())]
            + [(t, "filter", 0.0) for t in filt])
    mn_sql = ""
    if must_not:
        terms = ", ".join(f"'{t}'" for t in must_not)
        mn_sql = (f"AND doc_id NOT IN (SELECT doc_id FROM tf "
                  f"WHERE term IN ({terms}))")
    return _PRELUDE + "," + _per_sql(rows) + f""",
agg AS (
  SELECT doc_id, sum(contrib) AS score,
         count(CASE WHEN clause = 'must' THEN 1 END) AS nm,
         count(CASE WHEN clause = 'should' THEN 1 END) AS ns,
         count(CASE WHEN clause = 'filter' THEN 1 END) AS nf
  FROM per GROUP BY 1
),
scored AS (
  SELECT doc_id, score FROM agg
  WHERE nm = {len(must)} AND nf = {len(filt)} AND ns >= {msm} {mn_sql}
)""" + _FINISH.format(k=K)


def _match_sql(text: str) -> str:
    terms = sorted(set(_tok(text)))
    rows = [(t, "must", 1.0) for t in terms]
    if not rows:
        return _PRELUDE + """,
scored AS (SELECT doc_id, 0.0 AS score FROM dl WHERE 1 = 0)
""" + _FINISH.format(k=K)
    return _PRELUDE + "," + _per_sql(rows) + """,
scored AS (SELECT doc_id, sum(contrib) AS score FROM per GROUP BY 1)
""" + _FINISH.format(k=K)


def _dis_max_sql(texts: list[str], tie: float) -> str:
    rows = [(t, qi) for qi, q in enumerate(texts)
            for t in sorted(set(_tok(q)))]
    vals = ", ".join(f"('{t}', {qi})" for t, qi in rows)
    return _PRELUDE + f""",
clause(term, qidx) AS (VALUES {vals}),
per AS (
  SELECT tf.doc_id, c.qidx, {_CONTRIB.format(b='1.0')} AS contrib
  FROM clause c
  JOIN tf ON tf.term = c.term
  JOIN stats s ON s.term = c.term
  JOIN dl ON dl.doc_id = tf.doc_id
),
perq AS (SELECT doc_id, qidx, sum(contrib) AS qs FROM per GROUP BY 1, 2),
scored AS (
  SELECT doc_id, max(qs) + {tie!r} * (sum(qs) - max(qs)) AS score
  FROM perq GROUP BY 1
)""" + _FINISH.format(k=K)


def _constant_score_sql(text: str, boost: float) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(_tok(text))))
    return _PRELUDE + f""",
scored AS (
  SELECT DISTINCT doc_id, {boost!r} AS score FROM tf
  WHERE term IN ({terms})
)""" + _FINISH.format(k=K)


def _boosting_sql(pos: str, neg: str, nb: float) -> str:
    rows = [(t, "must", 1.0) for t in sorted(set(_tok(pos)))]
    neg_terms = ", ".join(f"'{t}'" for t in sorted(set(_tok(neg))))
    return _PRELUDE + "," + _per_sql(rows) + f""",
possum AS (SELECT doc_id, sum(contrib) AS score FROM per GROUP BY 1),
negdocs AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({neg_terms})),
scored AS (
  SELECT p.doc_id,
         CASE WHEN n.doc_id IS NOT NULL THEN p.score * {nb!r}
              ELSE p.score END AS score
  FROM possum p LEFT JOIN negdocs n ON n.doc_id = p.doc_id
)""" + _FINISH.format(k=K)


def _rand_text(rng: random.Random) -> str:
    n = rng.randint(1, 2)
    words = [rng.choice(VOCAB + ["zzzunknown"]) if rng.random() < 0.1
             else rng.choice(VOCAB) for _ in range(n)]
    return " ".join(words)


def _gen_dsl_case(rng: random.Random):
    kind = rng.choice(["bool", "bool", "bool", "match", "dis_max",
                       "constant_score", "boosting"])
    if kind == "match":
        text = _rand_text(rng)
        return ({"query": {"match": {"text": text}}, "size": K},
                _match_sql(text))
    if kind == "dis_max":
        texts = [_rand_text(rng) for _ in range(rng.randint(1, 3))]
        tie = rng.choice([0.0, 0.3, 0.7])
        body = {"query": {"dis_max": {
            "queries": [{"match": {"text": t}} for t in texts],
            "tie_breaker": tie}}, "size": K}
        return body, _dis_max_sql(texts, tie)
    if kind == "constant_score":
        text, boost = _rand_text(rng), rng.choice([1.0, 2.5])
        body = {"query": {"constant_score": {
            "filter": {"match": {"text": text}}, "boost": boost}},
            "size": K}
        return body, _constant_score_sql(text, boost)
    if kind == "boosting":
        pos, neg = _rand_text(rng), _rand_text(rng)
        nb = rng.choice([0.2, 0.5])
        body = {"query": {"boosting": {
            "positive": {"match": {"text": pos}},
            "negative": {"match": {"text": neg}},
            "negative_boost": nb}}, "size": K}
        return body, _boosting_sql(pos, neg, nb)
    # bool
    spec: dict = {}
    if rng.random() < 0.8:
        spec["must"] = [_rand_text(rng)
                        for _ in range(rng.randint(1, 2))]
    if rng.random() < 0.7:
        spec["should"] = [(_rand_text(rng), rng.choice([1.0, 1.5, 2.0]))
                          for _ in range(rng.randint(1, 2))]
    if not spec:
        spec["should"] = [(_rand_text(rng), 1.0)]
    if rng.random() < 0.4:
        spec["must_not"] = [_rand_text(rng)]
    if rng.random() < 0.4:
        spec["filter"] = [_rand_text(rng)]
    body_bool: dict = {}
    for key, vals in spec.items():
        if key == "should":
            body_bool["should"] = [
                {"match": {"text": {"query": t, "boost": b}}}
                if b != 1.0 else {"match": {"text": t}}
                for t, b in vals
            ]
        else:
            body_bool[key] = [{"match": {"text": t}} for t in vals]
    if spec.get("should") and rng.random() < 0.3:
        body_bool["minimum_should_match"] = rng.randint(0, 2)
    sql_spec = {k: v for k, v in spec.items()}
    if "minimum_should_match" in body_bool:
        sql_spec["minimum_should_match"] = \
            body_bool["minimum_should_match"]
    return ({"query": {"bool": body_bool}, "size": K},
            _bool_sql(sql_spec))


def test_fuzz_dsl_vs_duckdb(spark, dsl_env):
    ctx, con = dsl_env
    rng = random.Random(77)
    cases = [_gen_dsl_case(rng) for _ in range(N_DSL_CASES)]
    # grouped-union execution: one Spark job per 30 cases
    group = 30
    mismatches = []
    nonempty = 0
    for g0 in range(0, len(cases), group):
        chunk = cases[g0:g0 + group]
        union = None
        for ci, (body, _) in enumerate(chunk):
            out = es_search(body, ctx).select(
                F.lit(g0 + ci).alias("case_id"), "rank", "doc_id",
                F.round("score", 6).alias("score_r6"))
            union = out if union is None else union.unionByName(out)
        got = union.toPandas()
        for ci, (body, sql) in enumerate(chunk):
            g = got[got.case_id == g0 + ci][
                ["rank", "doc_id", "score_r6"]].reset_index(drop=True)
            w = con.sql(sql).df()
            w.columns = ["rank", "doc_id", "score_r6"]
            g = g.sort_values("rank").reset_index(drop=True)
            w = w.sort_values("rank").reset_index(drop=True)
            nonempty += bool(len(g))
            if len(g) != len(w) or not (
                (g["doc_id"].to_numpy() == w["doc_id"].to_numpy()).all()
                and (abs(g["score_r6"].to_numpy()
                         - w["score_r6"].to_numpy()) < 1e-9).all()
            ):
                mismatches.append((g0 + ci, body, g, w))
    assert not mismatches, (
        f"{len(mismatches)} DSL mismatches; first: "
        f"{mismatches[0][1]}\nspark:\n{mismatches[0][2]}\n"
        f"duck:\n{mismatches[0][3]}"
    )
    # anti-vacuity: the generator must actually hit the corpus — a bug
    # that empties every result would otherwise pass silently
    assert nonempty >= N_DSL_CASES // 2, nonempty


# ---------------------------------------------------------------- ES|QL

LANGS = ["en", "de", "fr", None]


@pytest.fixture(scope="module")
def esql_env(spark):
    rng = random.Random(99)
    rows = [(i, rng.choice(LANGS), rng.randint(20, 520))
            for i in range(300)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
    sdf = spark.createDataFrame(
        pdf, "doc_id bigint, lang string, n_chars bigint").cache()
    sdf.count()
    con = duckdb.connect()
    con.register("fdocs", pdf)
    return sdf, con


def _gen_cond(rng: random.Random, depth=0):
    """(esql_cond, sql_cond) pair from one random predicate AST."""
    if depth < 2 and rng.random() < 0.35:
        op = rng.choice(["AND", "OR"])
        (ea, sa), (eb, sb) = (_gen_cond(rng, depth + 1),
                              _gen_cond(rng, depth + 1))
        return f"({ea} {op} {eb})", f"({sa} {op} {sb})"
    if depth < 2 and rng.random() < 0.15:
        e, s = _gen_cond(rng, depth + 1)
        return f"NOT ({e})", f"NOT ({s})"
    leaf = rng.choice(["num_cmp", "lang_eq", "lang_ne", "mod", "in",
                       "null"])
    if leaf == "num_cmp":
        c = rng.randint(50, 500)
        op = rng.choice([">", ">=", "<", "<="])
        return f"n_chars {op} {c}", f"n_chars {op} {c}"
    if leaf == "lang_eq":
        v = rng.choice(["en", "de", "fr"])
        return f'lang == "{v}"', f"lang = '{v}'"
    if leaf == "lang_ne":
        v = rng.choice(["en", "de", "fr"])
        return f'lang != "{v}"', f"lang <> '{v}'"
    if leaf == "mod":
        m, r = rng.choice([3, 7]), rng.randint(0, 2)
        return f"doc_id % {m} == {r}", f"doc_id % {m} = {r}"
    if leaf == "in":
        vs = rng.sample(["en", "de", "fr"], rng.randint(1, 2))
        e = ", ".join(f'"{v}"' for v in vs)
        s = ", ".join(f"'{v}'" for v in vs)
        return f"lang IN ({e})", f"lang IN ({s})"
    return ("lang IS NOT NULL", "lang IS NOT NULL") \
        if rng.random() < 0.5 else ("lang IS NULL", "lang IS NULL")


def _gen_esql_case(rng: random.Random):
    esql_parts = ["FROM fdocs"]
    sql_where = ""
    if rng.random() < 0.75:
        e, s = _gen_cond(rng)
        esql_parts.append(f"WHERE {e}")
        sql_where = f"WHERE {s}"
    with_eval = rng.random() < 0.5
    eval_sql = ""
    if with_eval:
        a, b = rng.choice([2, 5, 9]), rng.choice([3, 4])
        esql_parts.append(f"EVAL v = n_chars % {a} + doc_id % {b}")
        eval_sql = f"n_chars % {a} + doc_id % {b}"
    if rng.random() < 0.5:
        # STATS ... BY — full group set, compared order-insensitively
        aggs_esql, aggs_sql = ["n = COUNT(*)"], ["count(*)::BIGINT AS n"]
        if rng.random() < 0.7:
            col = "v" if with_eval else "n_chars"
            col_sql = f"({eval_sql})" if with_eval else "n_chars"
            fn = rng.choice(["SUM", "MIN", "MAX", "AVG"])
            aggs_esql.append(f"x = {fn}({col})")
            aggs_sql.append(f"{fn.lower()}({col_sql})::DOUBLE AS x")
        key = rng.choice(["lang", None])
        if key:
            esql_parts.append(
                f"STATS {', '.join(aggs_esql)} BY {key}")
            sql = (f"SELECT {', '.join(aggs_sql)}, {key} "
                   f"FROM fdocs {sql_where} GROUP BY {key}")
        else:
            esql_parts.append(f"STATS {', '.join(aggs_esql)}")
            sql = (f"SELECT {', '.join(aggs_sql)} "
                   f"FROM fdocs {sql_where}")
        return " | ".join(esql_parts), sql
    keep = ["doc_id", "lang", "n_chars"] + (["v"] if with_eval else [])
    esql_parts.append(f"KEEP {', '.join(keep)}")
    sel = ["doc_id", "lang", "n_chars"] + (
        [f"{eval_sql} AS v"] if with_eval else [])
    sql = f"SELECT {', '.join(sel)} FROM fdocs {sql_where}"
    if rng.random() < 0.6:
        n = rng.randint(5, 40)
        d = rng.choice(["ASC", "DESC"])
        esql_parts.append(f"SORT doc_id {d}")
        esql_parts.append(f"LIMIT {n}")
        sql += f" ORDER BY doc_id {d} LIMIT {n}"
    return " | ".join(esql_parts), sql


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_fuzz_esql_vs_duckdb(spark, esql_env):
    sdf, con = esql_env
    rng = random.Random(4242)
    mismatches = []
    nonempty = 0
    for i in range(N_ESQL_CASES):
        q, sql = _gen_esql_case(rng)
        got = esql(q, tables={"fdocs": sdf}, spark=spark).toPandas()
        want = con.sql(sql).df()
        nonempty += bool(len(want))
        g, w = _canon(got), _canon(want)
        same = (sorted(g.columns) == sorted(w.columns)
                and len(g) == len(w))
        if same:
            for c in g.columns:
                gv, wv = g[c], w[c]
                if gv.dtype.kind == "f" or wv.dtype.kind == "f":
                    ok = (abs(gv.astype(float).to_numpy()
                              - wv.astype(float).to_numpy())
                          < 1e-9).all()
                else:
                    ok = (gv.astype(str).to_numpy()
                          == wv.astype(str).to_numpy()).all()
                if not ok:
                    same = False
                    break
        if not same:
            mismatches.append((i, q, sql, g.head(), w.head()))
    assert not mismatches, (
        f"{len(mismatches)}/{N_ESQL_CASES} ES|QL mismatches; first: "
        f"{mismatches[0]}"
    )
    assert nonempty >= N_ESQL_CASES // 2, nonempty

# ------------------------------------------------- nested bool (r3 #3)

N_NESTED_CASES = 70


def _ref_env(rows):
    """Independent pure-Python BM25 environment over the fuzz corpus —
    no engine modules; implements the documented scoring spec from
    scratch (module docstring)."""
    import math

    tf = {}
    dl = {}
    for doc_id, text in rows:
        toks = _tok(text)
        if not toks:
            continue
        dl[doc_id] = len(toks)
        m = tf.setdefault(doc_id, {})
        for t in toks:
            m[t] = m.get(t, 0) + 1
    df = {}
    for m in tf.values():
        for t in m:
            df[t] = df.get(t, 0) + 1
    n = len(dl)
    avgdl = sum(dl.values()) / n

    def contrib(doc, t, boost=1.0):
        f = tf[doc].get(t, 0)
        if not f:
            return None
        idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
        return boost * idf * f / (f + 1.2 * (0.25 + 0.75
                                             * dl[doc] / avgdl))

    return {"tf": tf, "contrib": contrib}


def _ref_bool(spec, env):
    """Reference evaluator for (possibly nested) bool specs →
    {doc_id: score} of the FULL match set.  Spec clauses: plain str
    (leaf must/filter/must_not), (str, boost) (leaf should), or
    ("bool", subspec) anywhere.

    Deliberately NOT a mirror of the engine's required/optional frame
    algebra (the round-4 mirror replicated _bool_frame's join
    decomposition and therefore shared its must_not blind spot): this
    walks every doc in the corpus and applies the documented ES
    semantics directly — all musts/filters match, must_not excludes at
    level scope unconditionally, matching shoulds add score and count
    toward minimum_should_match, and a doc must match at least one
    positive clause to appear at all."""
    leaf = {"must": [], "should": [], "must_not": [], "filter": []}
    nest = {"must": [], "should": [], "must_not": [], "filter": []}
    for sec in ("must", "should", "must_not", "filter"):
        for c in spec.get(sec, []):
            if isinstance(c, tuple) and c[0] == "bool":
                nest[sec].append(_ref_bool(c[1], env))
            else:
                leaf[sec].append(c)

    must_t = sorted({t for s in leaf["must"] for t in _tok(s)})
    filt_t = sorted({t for s in leaf["filter"] for t in _tok(s)})
    mn_t = sorted({t for s in leaf["must_not"] for t in _tok(s)})
    should_b: dict[str, float] = {}
    for s, b in leaf["should"]:
        for t in _tok(s):
            should_b[t] = max(should_b.get(t, 0.0), float(b))

    tf, contrib = env["tf"], env["contrib"]
    has_required = bool(must_t or filt_t or nest["must"] or nest["filter"])

    msm = spec.get("minimum_should_match")
    if msm is None:
        msm = 0 if has_required else 1
    msm = int(msm)

    out: dict = {}
    for doc in tf:
        # must_not: unconditional level-scope exclusion (ES semantics)
        if any(t in tf[doc] for t in mn_t):
            continue
        if any(doc in f for f in nest["must_not"]):
            continue
        # required conjuncts
        if any(t not in tf[doc] for t in must_t):
            continue
        if any(t not in tf[doc] for t in filt_t):
            continue
        if any(doc not in f for f in nest["must"]):
            continue
        if any(doc not in f for f in nest["filter"]):
            continue
        score = sum(contrib(doc, t) for t in must_t)
        for f in nest["must"]:
            score += f[doc]
        cnt = 0
        for t, b in should_b.items():
            c = contrib(doc, t, b)
            if c is not None:
                score += c
                cnt += 1
        for f in nest["should"]:
            if doc in f:
                score += f[doc]
                cnt += 1
        if cnt < msm:
            continue
        # must appear via at least one positive clause (a level of only
        # must_nots / only missed shoulds matches nothing)
        if not has_required and cnt == 0:
            continue
        out[doc] = score
    return out


def _spec_to_body(spec) -> dict:
    body: dict = {}
    for sec in ("must", "should", "must_not", "filter"):
        out = []
        for c in spec.get(sec, []):
            if isinstance(c, tuple) and c[0] == "bool":
                out.append({"bool": _spec_to_body(c[1])})
            elif sec == "should":
                t, b = c
                out.append({"match": {"text": {"query": t, "boost": b}}}
                           if b != 1.0 else {"match": {"text": t}})
            else:
                out.append({"match": {"text": c}})
        if out:
            body[sec] = out
    if "minimum_should_match" in spec:
        body["minimum_should_match"] = spec["minimum_should_match"]
    return body


def _gen_flat_spec(rng: random.Random) -> dict:
    spec: dict = {}
    if rng.random() < 0.7:
        spec["must"] = [_rand_text(rng)]
    if rng.random() < 0.7:
        spec["should"] = [(_rand_text(rng), rng.choice([1.0, 2.0]))
                          for _ in range(rng.randint(1, 2))]
    if not spec:
        spec["must"] = [_rand_text(rng)]
    if rng.random() < 0.3:
        spec["must_not"] = [_rand_text(rng)]
    if rng.random() < 0.3:
        spec["filter"] = [_rand_text(rng)]
    if spec.get("should") and rng.random() < 0.3:
        spec["minimum_should_match"] = rng.randint(0, 2)
    return spec


def _gen_nested_spec(rng: random.Random, depth=0) -> dict:
    spec = _gen_flat_spec(rng)
    if depth >= 2:
        return spec
    # plant 1-2 nested bools in random sections
    for _ in range(rng.randint(1, 2)):
        sec = rng.choice(["must", "should", "must_not", "filter"])
        sub = (
            _gen_nested_spec(rng, depth + 1) if rng.random() < 0.25
            else _gen_flat_spec(rng)
        )
        spec.setdefault(sec, []).append(("bool", sub))
    return spec


def test_fuzz_nested_bool_vs_reference(spark, dsl_env):
    """≥60 generated depth-≤3 nested bool bodies vs an independent
    pure-Python evaluator of the documented semantics."""
    ctx, _con = dsl_env
    rng = random.Random(31337)
    rows = _mk_docs(random.Random(20260821))  # same corpus as dsl_env
    env = _ref_env(rows)
    group = 35
    specs = [_gen_nested_spec(rng) for _ in range(N_NESTED_CASES)]
    mismatches = []
    nonempty = 0
    for g0 in range(0, len(specs), group):
        chunk = specs[g0:g0 + group]
        union = None
        for ci, spec in enumerate(chunk):
            body = {"query": {"bool": _spec_to_body(spec)}, "size": K}
            out = es_search(body, ctx).select(
                F.lit(g0 + ci).alias("case_id"), "rank", "doc_id",
                F.round("score", 6).alias("score_r6"))
            union = out if union is None else union.unionByName(out)
        got_all = union.toPandas()
        for ci, spec in enumerate(chunk):
            scores = _ref_bool(spec, env)
            ranked = sorted(scores.items(),
                            key=lambda kv: (-round(kv[1], 9), kv[0]))[:K]
            want = [(d, round(s, 6)) for d, s in ranked]
            g = got_all[got_all.case_id == g0 + ci].sort_values("rank")
            got = list(zip(g.doc_id.astype(int), g.score_r6))
            nonempty += bool(want)
            if len(got) != len(want) or any(
                gd != wd or abs(gs - ws) > 1e-9
                for (gd, gs), (wd, ws) in zip(got, want)
            ):
                mismatches.append((g0 + ci, spec, got, want))
    assert not mismatches, (
        f"{len(mismatches)} nested-bool mismatches; first: "
        f"{mismatches[0]}"
    )
    assert nonempty >= N_NESTED_CASES // 2, nonempty
