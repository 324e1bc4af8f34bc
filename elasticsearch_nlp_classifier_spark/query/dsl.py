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
  restricted to match/term over the indexed text field)
                                           → `bm25.bool_query_topk`
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

Deliberately absent (raise, never silently approximate): nested
``bool`` inside ``bool`` (flatten client-side), ``span``/``intervals``
bodies (call `query/spans.py` directly), scripted scoring other than
``field_value_factor`` (use `features.script_score_topk`).
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
