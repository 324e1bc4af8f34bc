"""ES Query-DSL JSON → ranked execution — the `_search` body compiler.

Reference users speak Query DSL JSON through the stock
`RestHighLevelClient` (`utils/elasticsearch/ESClient.java`);
this module lets them paste that JSON at this engine and get the same
ranked answer, dispatching every node to the already-tested operator
for it:

    es_search({"query": {"bool": {
        "must": [{"match": {"text": "disaster"}}],
        "should": [{"match": {"text": "fire", "boost": 2.0}}],
        "must_not": [{"match": {"text": "drill"}}]}}}, ctx, k=10)

Supported query-context nodes → operator:

- ``match`` / ``match_all``                → `bm25.bm25_topk` (WAND
  path when ctx carries a physical index) / all-docs constant score
- ``bool`` (must/should/filter/must_not/minimum_should_match, clauses
  match/term over the indexed text field OR nested ``bool`` sub-bodies
  to any depth)                            → `bm25.bool_query_topk`
  (flat bodies: single-scan plan) / `_bool_frame` (nested bodies:
  recursive frame algebra — see its docstring)
- ``dis_max``                              → `compound.dis_max_topk`
- ``constant_score``                       → `compound.constant_score_topk`
- ``boosting``                             → `compound.boosting_topk`
- ``multi_match`` (ctx.extra["indexes"])   → `compound.multi_match_topk`
- ``function_score`` (field_value_factor)  → sub-query + `rescore.function_score`
- top-level ``retriever`` / ``knn`` bodies → `retriever.retrieve`

Every node returns the same bounded frame ``(rank, doc_id, score)``
(rank 1..k, ties → doc_id ASC on round(score, 9)); compound nodes pass
clause STRINGS down to single-scan operators — the compiler adds zero
physical work on top of the operator it dispatches to, so the 100 TB
story is whatever the dispatched operator's is (each is plan-audited
in its own module).

Deliberately absent (raise, never silently approximate):
``span``/``intervals`` bodies (call `query/spans.py` directly),
scripted scoring other than ``field_value_factor`` (use
`features.script_score_topk`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .retriever import RetrieverContext, retrieve

__all__ = ["es_search", "compile_query_node"]


def _match_text(
    clause: dict,
    ctx: RetrieverContext | None = None,
    honor_boost: bool = False,
) -> tuple[str, str, float]:
    """(field, text, boost) from a match/term clause body.

    ``ctx``: when it carries ``text_field``, a clause naming a
    different field raises (the module contract: raise, never silently
    approximate — a pasted ``{"match": {"body": ...}}`` must not score
    against whatever field the index was built on).
    ``honor_boost=True`` means the caller applies the returned boost
    (should clauses) or the clause runs in ES filter context where
    boosts have no effect by ES's own semantics (filter / must_not).
    Otherwise a non-default boost the compiler cannot honor (must,
    dis_max/boosting sub-queries) raises rather than being dropped."""
    kind, body = next(iter(clause.items()))
    if kind not in ("match", "term"):
        raise ValueError(
            f"bool sub-clause {kind!r} unsupported — flatten to "
            "match/term or call the operator module directly"
        )
    fieldname, spec = next(iter(body.items()))
    if ctx is not None:
        ctx.check_field(fieldname, kind)
    if isinstance(spec, dict):
        text = spec.get("query", spec.get("value"))
        boost = float(spec.get("boost", 1.0))
    else:
        text, boost = spec, 1.0
    # term carries its boost inline in ES too
    if isinstance(body.get(fieldname), dict) and "boost" in body[fieldname]:
        boost = float(body[fieldname]["boost"])
    if not honor_boost and boost != 1.0:
        raise ValueError(
            f"{kind} clause boost={boost} in a position this compiler "
            "cannot honor — move the boosted clause to 'should' (where "
            "per-clause boosts are applied) or call bm25.bool_query_topk "
            "directly"
        )
    return fieldname, str(text), boost


def _finish(out: DataFrame, k: int) -> DataFrame:
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
    return (
        out.select("doc_id", F.col("score").cast("double").alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "doc_id", "score")
    )


_BOOL_SECTIONS = ("must", "should", "must_not", "filter")


def _has_nested_bool(body: dict) -> bool:
    return any(
        next(iter(c)) == "bool"
        for sec in _BOOL_SECTIONS
        for c in body.get(sec, [])
    )


def _bool_frame(body: dict, ctx: RetrieverContext,
                depth: int = 0) -> DataFrame:
    """Nested ``bool`` → UNCUT match frame ``(doc_id, score)``.

    ES semantics, composed recursively: a nested bool in ``must`` /
    ``should`` is a sub-query scored by ITS bool-sum (its own
    ``minimum_should_match`` applied inside); in ``filter`` it is a
    pure predicate (score 0); in ``must_not`` an exclusion set.
    Leaf clauses of each level keep the flat compiler's exact
    single-scan semantics (`bm25.bool_query_frame` — every analyzed
    must/filter token required, per-term boosted should scores,
    should counts per TERM); a matched nested should counts 1 toward
    the level's ``minimum_should_match``.  The default msm is ES's: 1
    when the level has no must/filter member (leaf or nested), else 0.

    Scale shape: composition is hash joins on ``doc_id`` between
    sub-frames (inner for must/filter, left for should, anti for
    must_not) — sub-frames can be corpus-sized, so unlike the flat
    single-scan plan this costs one doc_id shuffle per nested member;
    the compiler only takes this path when the body actually nests,
    and the top-k cut stays OUTSIDE (`_finish`) so every join is on
    full match sets (cutting sub-queries first would be wrong, not
    just slow)."""
    if depth > 8:
        raise ValueError("bool nesting deeper than 8 levels")
    from ..analyzer.chain import get_analyzer
    from .bm25 import bool_query_frame, match_filter

    leaf: dict[str, list] = {s: [] for s in _BOOL_SECTIONS}
    nested: dict[str, list] = {s: [] for s in _BOOL_SECTIONS}
    for sec in _BOOL_SECTIONS:
        for c in body.get(sec, []):
            if next(iter(c)) == "bool":
                nested[sec].append(_bool_frame(c["bool"], ctx, depth + 1))
            elif sec == "should":
                _, text, boost = _match_text(c, ctx, honor_boost=True)
                leaf["should"].append((text, boost))
            else:
                leaf[sec].append(
                    _match_text(c, ctx, honor_boost=(sec != "must"))[1]
                )

    tok = get_analyzer(ctx.analyzer).tokenize
    leaf_req = any(tok(s) for s in leaf["must"]) \
        or any(tok(s) for s in leaf["filter"])
    has_leaf_scoring = leaf_req or any(tok(s) for s, _ in leaf["should"])

    zero = F.lit(0).cast("bigint")
    required, optional = [], []
    if has_leaf_scoring:
        base = bool_query_frame(
            ctx.index, must=leaf["must"], should=leaf["should"],
            must_not=leaf["must_not"], filter_terms=leaf["filter"],
            analyzer=ctx.analyzer,
        ).select("doc_id", "score", F.col("n_should").alias("cnt"))
        (required if leaf_req else optional).append(base)
    for f in nested["must"]:
        required.append(f.select("doc_id", "score", zero.alias("cnt")))
    for f in nested["filter"]:
        required.append(f.select(
            "doc_id", F.lit(0.0).alias("score"), zero.alias("cnt")))
    for f in nested["should"]:
        optional.append(f.select(
            "doc_id", "score", F.lit(1).cast("bigint").alias("cnt")))

    msm = body.get("minimum_should_match")
    if msm is None:
        msm = 0 if (leaf_req or nested["must"] or nested["filter"]) else 1
    msm = int(msm)

    spark = ctx.index.postings.sparkSession
    if not required and not optional:
        return spark.createDataFrame([], "doc_id bigint, score double")

    if required:
        cand = required[0]
        for i, f in enumerate(required[1:]):
            r = f.select("doc_id", F.col("score").alias(f"_s{i}"),
                         F.col("cnt").alias(f"_c{i}"))
            cand = cand.join(r, "doc_id").select(
                "doc_id",
                (F.col("score") + F.col(f"_s{i}")).alias("score"),
                (F.col("cnt") + F.col(f"_c{i}")).alias("cnt"),
            )
        for i, f in enumerate(optional):
            r = f.select("doc_id", F.col("score").alias(f"_os{i}"),
                         F.col("cnt").alias(f"_oc{i}"))
            cand = cand.join(r, "doc_id", "left").select(
                "doc_id",
                (F.col("score")
                 + F.coalesce(F.col(f"_os{i}"), F.lit(0.0))).alias("score"),
                (F.col("cnt")
                 + F.coalesce(F.col(f"_oc{i}"), zero)).alias("cnt"),
            )
    else:
        cand = optional[0]
        for f in optional[1:]:
            cand = cand.unionByName(f)
        cand = cand.groupBy("doc_id").agg(
            F.sum("score").alias("score"), F.sum("cnt").alias("cnt"))

    for f in nested["must_not"]:
        cand = cand.join(f.select("doc_id"), "doc_id", "left_anti")
    if leaf["must_not"] and not leaf_req:
        # ES must_not excludes at LEVEL scope. bool_query_frame's internal
        # anti-join only reaches every candidate when the base frame is
        # inner-joined (leaf_req: leaf must/filter present). With only leaf
        # shoulds the base lands in `optional` (left-joined/unioned), so docs
        # surviving via nested members would dodge the exclusion — anti-join
        # the whole level here whenever the base is not required.
        for s in leaf["must_not"]:
            cand = cand.join(match_filter(ctx.index, s, ctx.analyzer),
                             "doc_id", "left_anti")

    if msm > 0:
        cand = cand.where(F.col("cnt") >= F.lit(msm))
    return cand.select(
        "doc_id", F.col("score").cast("double").alias("score"))


def compile_query_node(q: dict, ctx: RetrieverContext, k: int) -> DataFrame:
    """One query-context node → ``(rank, doc_id, score)``."""
    if len(q) != 1:
        raise ValueError(f"query node must have exactly one key: {sorted(q)}")
    kind, body = next(iter(q.items()))

    if kind == "match":
        return retrieve({"standard": {"query": {"match": body}}}, ctx, k)

    if kind == "match_all":
        if ctx.docs is None:
            raise ValueError("match_all needs ctx.docs")
        boost = float(body.get("boost", 1.0))
        return _finish(
            ctx.docs.select("doc_id", F.lit(boost).alias("score")), k
        )

    if kind == "bool":
        if _has_nested_bool(body):
            return _finish(_bool_frame(body, ctx), k)
        from .bm25 import bool_query_topk

        must, should, must_not, filt = [], [], [], []
        for c in body.get("must", []):
            must.append(_match_text(c, ctx)[1])
        for c in body.get("should", []):
            _, text, boost = _match_text(c, ctx, honor_boost=True)
            should.append((text, boost))
        # filter/must_not run in ES filter context: boosts are inert
        # there by ES semantics, so honor_boost=True (nothing to drop)
        for c in body.get("must_not", []):
            must_not.append(_match_text(c, ctx, honor_boost=True)[1])
        for c in body.get("filter", []):
            filt.append(_match_text(c, ctx, honor_boost=True)[1])
        out = bool_query_topk(
            ctx.index, must=must, should=should, must_not=must_not,
            filter_terms=filt,
            minimum_should_match=body.get("minimum_should_match"),
            k=k, analyzer=ctx.analyzer,
        )
        return out.select("rank", "doc_id", "score")

    if kind == "dis_max":
        from .compound import dis_max_topk

        texts = [_match_text(c, ctx)[1] for c in body["queries"]]
        return dis_max_topk(
            ctx.index, texts,
            tie_breaker=float(body.get("tie_breaker", 0.0)),
            k=k, analyzer=ctx.analyzer,
        ).select("rank", "doc_id", "score")

    if kind == "constant_score":
        from .compound import constant_score_topk

        _, text, _ = _match_text(body["filter"], ctx, honor_boost=True)
        return constant_score_topk(
            ctx.index, text, boost=float(body.get("boost", 1.0)),
            k=k, analyzer=ctx.analyzer,
        ).select("rank", "doc_id", "score")

    if kind == "boosting":
        from .compound import boosting_topk

        return boosting_topk(
            ctx.index,
            _match_text(body["positive"], ctx)[1],
            _match_text(body["negative"], ctx)[1],
            negative_boost=float(body.get("negative_boost", 0.5)),
            k=k, analyzer=ctx.analyzer,
        ).select("rank", "doc_id", "score")

    if kind == "multi_match":
        from .compound import multi_match_topk

        indexes = ctx.extra.get("indexes")
        if not indexes:
            raise ValueError("multi_match needs ctx.extra['indexes'] "
                             "(per-field LogicalIndex map)")
        mode = body.get("type", "best_fields")
        boosts = {}
        fields = []
        for f_spec in body["fields"]:
            if "^" in f_spec:
                name, b = f_spec.split("^", 1)
                boosts[name] = float(b)
            else:
                name = f_spec
            fields.append(name)
        return multi_match_topk(
            {f_name: indexes[f_name] for f_name in fields},
            body["query"], field_boosts=boosts or None, mode=mode,
            tie_breaker=float(body.get("tie_breaker", 0.0)),
            k=k, analyzer=ctx.analyzer,
        ).select("rank", "doc_id", "score")

    if kind == "function_score":
        from .rescore import function_score

        fvf = body.get("field_value_factor")
        if not fvf:
            raise ValueError("function_score: only field_value_factor is "
                             "compiled — use features.script_score_topk "
                             "for arbitrary scripts")
        sub = compile_query_node(body["query"], ctx, max(10 * k, 100))
        if ctx.docs is None:
            raise ValueError("function_score needs ctx.docs for the "
                             "factor field")
        fieldname = fvf["field"]
        # broadcast the BOUNDED side: sub is ≤10k ranked candidates;
        # ctx.docs is the corpus (broadcasting it would OOM at scale).
        # Inner join: Spark cannot broadcast the preserved side of an
        # outer join, and sub's doc_ids exist in ctx.docs by
        # construction (they came from the index built over it).
        hits = F.broadcast(sub).join(
            ctx.docs.select("doc_id", fieldname), "doc_id",
        )
        out = function_score(
            hits, fieldname,
            factor=float(fvf.get("factor", 1.0)),
            modifier=fvf.get("modifier", "none"),
            boost_mode=body.get("boost_mode", "multiply"),
        )
        return _finish(out.select("doc_id", "score"), k)

    raise ValueError(f"unsupported query node {kind!r}")


def es_search(body: dict, ctx: RetrieverContext, k: int = 10) -> DataFrame:
    """Execute an ES ``_search`` request body: ``{"query": ...}``,
    ``{"retriever": ...}``, or ``{"knn": ...}`` → ``(rank, doc_id,
    score)``, honoring top-level ``size``."""
    k = int(body.get("size", k))
    if "retriever" in body:
        return retrieve(body["retriever"], ctx, k)
    if "knn" in body and "query" not in body:
        return retrieve({"knn": body["knn"]}, ctx, k)
    if "query" in body:
        return compile_query_node(body["query"], ctx, k)
    raise ValueError("search body needs 'query', 'retriever', or 'knn'")
