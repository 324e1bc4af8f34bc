"""ES 8.x retriever tree (`retriever:` in `_search`) — composable
retrieval pipelines.

ES 8.14+ restructured hybrid search around a *retriever tree*: leaf
retrievers produce ranked doc lists, compound retrievers combine or
rerank them.  A user of the reference's cluster writes:

    "retriever": {
      "rrf": {
        "retrievers": [
          {"standard": {"query": {"match": {"text": "disaster fire"}}}},
          {"knn": {"field": "embedding", "query_vector": [...], "k": 20}}
        ],
        "rank_window_size": 50, "rank_constant": 60
      }
    }

``retrieve(spec, ctx, k)`` interprets exactly that shape recursively.
Each node returns a bounded ``(rank, doc_id, score)`` frame; compound
nodes operate only on those bounded frames, so the corpus-sized work
stays inside the leaf operators (WAND BM25 scan, ANN probe) and
composition is free at 100 TB.

Node types:

- ``standard``  — BM25 ``match`` query via the physical index
  (`bm25.py`), optional ``filter`` (term/range, compiled to pushed-down
  predicates applied to the doc set *before* scoring, ES's
  pre-filter semantics).
- ``knn``       — embedding cosine top-k (`operators/similarity.py`),
  brute exact by default, LSH when ``"approximate": true``; optional
  pre-``filter``.
- ``rrf``       — reciprocal-rank fusion of child retrievers
  (`rrf.py`), ``rank_constant`` / ``rank_window_size`` /
  per-child ``weights``.
- ``linear``    — weighted sum of child scores with ``minmax`` or
  ``none`` normalizer (ES 8.18 linear retriever).
- ``text_similarity_reranker`` — rerank the child's top
  ``rank_window_size`` by cosine similarity between the query vector
  and each doc's embedding.  ES calls out to a hosted inference
  endpoint here; this engine substitutes the embedding-cosine model —
  a real reranker, deterministic, and honest about being one (the
  hosted-model call is exactly the injection point,
  ``similarity_fn``).

Reference surface: the reference drives `_search` through
`utils/elasticsearch/ESClient.java`'s stock client; its
match-query usage (`v2/datasets/ElasticsearchDataset.java:42`) is the
``standard`` leaf here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .rrf import rrf_fuse

__all__ = ["RetrieverContext", "retrieve"]


@dataclass
class RetrieverContext:
    """Everything a retriever tree can touch.

    ``index``      — LogicalIndex / PhysicalIndex for BM25 leaves.
    ``docs``       — the documents table (doc_id + filterable fields).
    ``embeddings`` — (doc_id-aligned id, array<float>) for knn leaves
                     and the reranker; ``emb_id_col`` names its id.
    """

    index: object | None = None
    docs: DataFrame | None = None
    embeddings: DataFrame | None = None
    emb_id_col: str = "vec_id"
    emb_vec_col: str = "embedding"
    analyzer: str = "code"
    #: name of the text field ``index`` was built over.  When set, any
    #: match/term clause naming a DIFFERENT field raises instead of
    #: silently scoring against the indexed field (a pasted ES body
    #: like ``{"match": {"body": ...}}`` must not quietly become a
    #: query over ``text``).  None = unchecked (single-field caller).
    text_field: str | None = None
    extra: dict = field(default_factory=dict)

    def check_field(self, fieldname: str, clause: str) -> None:
        if self.text_field is not None and fieldname != self.text_field:
            raise ValueError(
                f"{clause} clause targets field {fieldname!r} but "
                f"ctx.index was built over {self.text_field!r} — "
                "build/attach an index for that field (multi_match via "
                "ctx.extra['indexes']) instead of silently rescoring"
            )


def _compile_filter(flt) -> Column:
    """ES filter clause subset: term / terms / range / exists / bool.
    Returns a pushdown-friendly Column predicate."""
    if isinstance(flt, list):
        cond = F.lit(True)
        for f in flt:
            cond = cond & _compile_filter(f)
        return cond
    if not isinstance(flt, dict) or len(flt) != 1:
        raise ValueError(f"retriever filter: bad clause {flt!r}")
    kind, body = next(iter(flt.items()))
    if kind == "term":
        f, v = next(iter(body.items()))
        if isinstance(v, dict):
            v = v["value"]
        return F.col(f) == F.lit(v)
    if kind == "terms":
        f, vs = next(iter(body.items()))
        return F.col(f).isin(list(vs))
    if kind == "range":
        f, spec = next(iter(body.items()))
        cond = F.lit(True)
        ops = {"gte": "__ge__", "gt": "__gt__", "lte": "__le__", "lt": "__lt__"}
        for op, v in spec.items():
            cond = cond & getattr(F.col(f), ops[op])(F.lit(v))
        return cond
    if kind == "exists":
        return F.col(body["field"]).isNotNull()
    if kind == "bool":
        cond = F.lit(True)
        for m in body.get("must", []) + body.get("filter", []):
            cond = cond & _compile_filter(m)
        for m in body.get("must_not", []):
            cond = cond & ~_compile_filter(m)
        return cond
    raise ValueError(f"retriever filter: unsupported clause {kind!r}")


def _one_query(spark, text: str):
    return spark.createDataFrame([(0, text)], "query_id int, query_text string")


def _std(body: dict, ctx: RetrieverContext, k: int) -> DataFrame:
    from .bm25 import bm25_topk

    if ctx.index is None:
        raise ValueError("standard retriever needs ctx.index")
    q = body.get("query", {})
    if "match" in q:
        fieldname, text = next(iter(q["match"].items()))
        ctx.check_field(fieldname, "match")
        if isinstance(text, dict):
            text = text["query"]
    else:
        raise ValueError("standard retriever: only match queries (use "
                         "query/compound.py for the full bool DSL)")
    index = ctx.index
    if "filter" in body:
        # ES pre-filter semantics: the filter gates candidate docs but
        # idf / avgdl stay global (computed on the unfiltered index).
        from ..index.build import LogicalIndex

        if ctx.docs is None:
            raise ValueError("standard retriever filter needs ctx.docs")
        allowed = ctx.docs.where(_compile_filter(body["filter"])) \
            .select("doc_id")
        index = LogicalIndex(
            postings=index.postings.join(F.broadcast(allowed), "doc_id",
                                         "left_semi"),
            term_stats=index.term_stats,
            doc_lengths=index.doc_lengths,
            _corpus_stats=index.corpus_stats,
        )
    spark = (ctx.docs or ctx.embeddings).sparkSession
    # over-fetch then stable-rank on round(score, 9): bm25_topk's
    # internal cut ties on raw floats; the deep window makes the final
    # rounded rank boundary-safe (same convention as a7_bm25_topk)
    out = bm25_topk(index, _one_query(spark, text),
                    k=max(10 * k, 1000), analyzer=ctx.analyzer)
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
    return out.select("doc_id", F.col("score").cast("double").alias("score")) \
        .withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _knn(body: dict, ctx: RetrieverContext, k: int) -> DataFrame:
    from ..operators.similarity import cosine_topk, lsh_cosine_topk

    if ctx.embeddings is None:
        raise ValueError("knn retriever needs ctx.embeddings")
    vec = [float(x) for x in body["query_vector"]]
    kk = int(body.get("k", k))
    emb = ctx.embeddings
    if "filter" in body:
        emb = emb.where(_compile_filter(body["filter"]))
    spark = emb.sparkSession
    q = spark.createDataFrame([(-1, vec)],
                              "query_id long, query_vec array<float>")
    if body.get("approximate"):
        out = lsh_cosine_topk(emb, q, dim=len(vec), k=kk,
                              id_col=ctx.emb_id_col, vec_col=ctx.emb_vec_col)
    else:
        out = cosine_topk(emb, q, k=kk, id_col=ctx.emb_id_col,
                          vec_col=ctx.emb_vec_col)
    # both leaves emit the id as "vec_id"
    return out.select(
        F.col("vec_id").alias("doc_id"),
        F.col("cos").cast("double").alias("score"),
        F.col("rank"),
    ).where(F.col("rank") <= kk)


def _rerank_by_cosine(ranked: DataFrame, body: dict, ctx: RetrieverContext,
                      k: int) -> DataFrame:
    if ctx.embeddings is None:
        raise ValueError("text_similarity_reranker needs ctx.embeddings")
    vec = [float(x) for x in body["query_vector"]]
    window = int(body.get("rank_window_size", 10))
    head = ranked.where(F.col("rank") <= window).select("doc_id")
    emb = ctx.embeddings.select(
        F.col(ctx.emb_id_col).alias("doc_id"),
        F.col(ctx.emb_vec_col).alias("__v"),
    )
    joined = head.join(emb, "doc_id", "left")
    qv = F.array(*[F.lit(x) for x in vec])
    dot = F.aggregate(F.zip_with(F.col("__v"), qv, lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(F.transform(F.col("__v"), lambda a: a * a),
                             F.lit(0.0), lambda acc, x: acc + x))
    qn = float(sum(x * x for x in vec)) ** 0.5
    scored = joined.withColumn(
        "score",
        F.coalesce(dot / (nrm * F.lit(qn)), F.lit(-1.0)).cast("double"),
    ).drop("__v")
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w)) \
        .where(F.col("rank") <= k).select("rank", "doc_id", "score")


def _minmax(df: DataFrame) -> DataFrame:
    stats = df.agg(F.min("score").alias("lo"), F.max("score").alias("hi"))
    out = df.crossJoin(F.broadcast(stats))
    norm = F.when(F.col("hi") == F.col("lo"), F.lit(1.0)).otherwise(
        (F.col("score") - F.col("lo")) / (F.col("hi") - F.col("lo")))
    return out.select("doc_id", norm.alias("score"))


def retrieve(spec: dict, ctx: RetrieverContext, k: int = 10) -> DataFrame:
    """Execute a retriever tree; returns ``(rank, doc_id, score)``
    (rank 1..k, ties → doc_id ASC, scores rounded to 9 places before
    ranking so float noise can't flip order across plans)."""
    if "retriever" in spec:
        spec = spec["retriever"]
    if len(spec) != 1:
        raise ValueError(f"retriever node must have exactly one type: {list(spec)}")
    kind, body = next(iter(spec.items()))

    if kind == "standard":
        return _std(body, ctx, k).select("rank", "doc_id", "score")

    if kind == "knn":
        return _knn(body, ctx, k).select("rank", "doc_id", "score")

    if kind == "rrf":
        window = int(body.get("rank_window_size", max(k, 10)))
        children = [retrieve(r, ctx, window) for r in body["retrievers"]]
        return rrf_fuse(children, weights=body.get("weights"),
                        rank_constant=int(body.get("rank_constant", 60)),
                        k=k)

    if kind == "linear":
        parts = []
        for child in body["retrievers"]:
            weight = float(child.get("weight", 1.0))
            normalizer = child.get("normalizer", "none")
            ranked = retrieve(child["retriever"], ctx,
                              int(body.get("rank_window_size", max(k, 10))))
            scored = _minmax(ranked) if normalizer == "minmax" \
                else ranked.select("doc_id", "score")
            parts.append(scored.select(
                "doc_id", (F.col("score") * F.lit(weight)).alias("score")))
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        fused = union.groupBy("doc_id").agg(F.sum("score").alias("score"))
        w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
        return fused.withColumn("rank", F.row_number().over(w)) \
            .where(F.col("rank") <= k).select("rank", "doc_id", "score")

    if kind == "text_similarity_reranker":
        child = retrieve(body["retriever"], ctx,
                         int(body.get("rank_window_size", 10)))
        return _rerank_by_cosine(child, body, ctx, k)

    raise ValueError(f"retriever: unknown node type {kind!r}")
