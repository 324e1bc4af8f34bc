"""Block-max pruned BM25 top-k over the compressed index.

Variant of block-max WAND (Ding & Suel 2011 — public algorithm) adapted
to a batch engine, exact by construction:

1. **Candidate pruning at the scan**: query terms → term buckets →
   parquet *partition pruning* on ``tb``, plus a broadcast join on
   ``term`` — only the query terms' blocks are ever read.
2. **Champion seeding**: the query term with the largest single-term
   upper bound is decoded exactly; the k-th best single-term score is a
   valid lower bound θ of the final k-th best total (every total ≥ its
   own single-term contribution, so the final k-th best ≥ θ).
3. **Block-max interval pruning**: sweep the docID axis; for each
   elementary interval the sum of covering blocks' upper bounds
   (ub = idf·max_tfhat) bounds any doc's total score there.  Blocks
   whose entire span never reaches θ are skipped *without decoding* —
   the block-max skip of BMW at block granularity.
4. Surviving blocks: one concatenated varbyte decode (self-delimiting
   streams), segmented delta-cumsum, vectorized BM25 contributions,
   bincount aggregation, exact top-k with (score DESC, doc_id ASC).

Exactness: a doc only in skipped regions has total ≤ interval UB < θ ≤
final k-th score, so it cannot enter the top-k.  Scores of surviving
docs are computed from *all* their postings (a surviving block is
decoded in full), in term-sorted order — the same float64 summation
order as the brute-force path and the pandas oracle.

Scale shape: one task per query (queries parallelize across the set);
per-query work is bounded by pruned-block decode, not by posting count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.blocks import N_TERM_BUCKETS, PhysicalIndex, term_bucket
from ..index.codec import segmented_delta_decode, vb_decode
from .bm25 import analyze_queries, idf_col

RESULT_SCHEMA = "query_id bigint, rank int, doc_id bigint, score double"


def _topk_one_query(pdf: pd.DataFrame) -> pd.DataFrame:
    """pdf: candidate blocks of ONE query, columns: query_id, k, term,
    idf, first_doc, last_doc, max_tfhat, n, docs_vb, tfs_vb, dls_vb."""
    if not len(pdf):
        return pd.DataFrame(
            columns=["query_id", "rank", "doc_id", "score"]
        ).astype({"query_id": "int64", "rank": "int32",
                  "doc_id": "int64", "score": "float64"})
    query_id = int(pdf["query_id"].iloc[0])
    k = int(pdf["k"].iloc[0])
    pdf = pdf.sort_values(["term", "first_doc"]).reset_index(drop=True)
    ub = (pdf["idf"] * pdf["max_tfhat"]).to_numpy(np.float64)

    # --- champion seeding: exact-decode the strongest term
    theta = -np.inf
    per_term_max = pdf.assign(_ub=ub).groupby("term")["_ub"].max()
    if len(per_term_max) > 1:  # pruning pointless for single-term queries
        champion = per_term_max.idxmax()
        cmask = (pdf["term"] == champion).to_numpy()
        cscores = _exact_scores(pdf[cmask])
        if len(cscores) >= k:
            theta = np.partition(cscores["score"].to_numpy(), -k)[-k]

        # --- interval sweep: max covering-UB per block span
        lo = pdf["first_doc"].to_numpy(np.int64)
        hi = pdf["last_doc"].to_numpy(np.int64)
        events = np.concatenate([lo, hi + 1])
        deltas = np.concatenate([ub, -ub])
        order = np.argsort(events, kind="stable")
        pts, inv = np.unique(events[order], return_inverse=True)
        cov = np.zeros(len(pts))
        np.add.at(cov, inv, deltas[order])
        cov = np.cumsum(cov)  # coverage on [pts[i], pts[i+1])
        # running max of cov over [i1..i2] per block via prefix trick
        i1 = np.searchsorted(pts, lo, side="right") - 1
        i2 = np.searchsorted(pts, hi, side="right") - 1
        keep = np.zeros(len(pdf), dtype=bool)
        for j in range(len(pdf)):  # ≤ blocks-per-query, metadata only
            keep[j] = cov[i1[j]: i2[j] + 1].max() >= theta
        pdf = pdf[keep].reset_index(drop=True)

    scores = _exact_scores(pdf)
    if not len(scores):
        return pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "rank": pd.Series([], dtype="int32"),
             "doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    s = scores["score"].to_numpy()
    d = scores["doc_id"].to_numpy()
    cand = np.lexsort((d, -s))[:k]  # (score DESC, doc_id ASC)
    return pd.DataFrame(
        {
            "query_id": np.full(len(cand), query_id, dtype=np.int64),
            "rank": np.arange(1, len(cand) + 1, dtype=np.int32),
            "doc_id": d[cand],
            "score": s[cand],
        }
    )


def _exact_scores(blocks: pd.DataFrame) -> pd.DataFrame:
    """Decode blocks (one concatenated varbyte pass) and aggregate exact
    per-doc BM25 contributions, term-sorted accumulation order."""
    if not len(blocks):
        return pd.DataFrame({"doc_id": [], "score": []})
    ns = blocks["n"].to_numpy(np.int64)
    docs = segmented_delta_decode(
        vb_decode(b"".join(blocks["docs_vb"])).astype(np.int64), ns
    )
    tfs = vb_decode(b"".join(blocks["tfs_vb"])).astype(np.float64)
    dls = vb_decode(b"".join(blocks["dls_vb"])).astype(np.float64)
    idf = np.repeat(blocks["idf"].to_numpy(np.float64), ns)
    avgdl = np.repeat(blocks["avgdl"].to_numpy(np.float64), ns)
    contrib = idf * tfs / (tfs + 1.2 * (0.25 + 0.75 * dls / avgdl))
    uniq, inv = np.unique(docs, return_inverse=True)
    sums = np.bincount(inv, weights=contrib)
    return pd.DataFrame({"doc_id": uniq, "score": sums})


def wand_topk(
    index: PhysicalIndex,
    queries: "DataFrame | pd.DataFrame",
    k: int | None = None,
    analyzer: str = "code",
    n_buckets: int = N_TERM_BUCKETS,
) -> DataFrame:
    """(query_id, rank, doc_id, score) — exact BM25 top-k via the
    compressed index with block-max pruning.

    Query latency shape: the query *batch* is tiny, so its analysis
    runs driver-side with the identical ``Analyzer`` chain the index
    UDFs wrap (parity-tested), and term stats come from ONE pushed-down
    ``isin`` probe of the (small) term_stats table.  The only other
    Spark job is the pruned block scan + per-query scoring — two jobs
    total per batch, regardless of query count.
    """
    import math

    from ..analyzer.chain import get_analyzer

    stats = index.corpus_stats
    doc_count = stats["doc_count"]
    avgdl = float(stats["avgdl"]) or 1.0

    qp = queries.toPandas() if isinstance(queries, DataFrame) else queries
    an = get_analyzer(analyzer)
    if k is not None:
        ks = {int(q): int(k) for q in qp["query_id"]}
    elif "k" in qp.columns:
        ks = dict(zip((int(q) for q in qp["query_id"]),
                      (int(x) for x in qp["k"])))
    else:
        ks = {int(q): 10 for q in qp["query_id"]}
    pairs = sorted({
        (int(qid), t)
        for qid, text in zip(qp["query_id"], qp["query_text"])
        for t in an.tokenize(text)
    })
    if not pairs:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    terms = sorted({t for _, t in pairs})

    # job 1: tiny probe — df + term bucket for just the query terms
    # (isin pushes into the parquet scan; JVM computes the bucket hash)
    stats_pdf = (
        index.term_stats.where(F.col("term").isin(terms))
        .select("term", "df", term_bucket(F.col("term"), n_buckets).alias("tb"))
        .toPandas()
    )
    df_by_term = dict(zip(stats_pdf["term"], stats_pdf["df"]))
    tb_by_term = dict(zip(stats_pdf["term"], stats_pdf["tb"]))

    q_rows = [
        {
            "query_id": qid,
            "term": t,
            "idf": math.log(
                1.0 + (doc_count - df_by_term[t] + 0.5)
                / (df_by_term[t] + 0.5)
            ),
            "k": ks[qid],
        }
        for qid, t in pairs
        if t in df_by_term
    ]
    if not q_rows:
        return index.spark.createDataFrame([], RESULT_SCHEMA)
    buckets = sorted({int(tb_by_term[r["term"]]) for r in q_rows})

    # job 2: pruned block scan + scoring.  Two pruning layers reach the
    # parquet reader: hive partition pruning on tb, and an `isin` on
    # term — blocks are term-sorted within each bucket file, so parquet
    # row-group min/max stats skip nearly all non-candidate groups.
    q_terms = sorted({r["term"] for r in q_rows})
    blocks = (
        index.blocks.where(F.col("tb").isin(buckets))
        .where(F.col("term").isin(q_terms))
        .select("term", "block_id", "n", "first_doc", "last_doc",
                "max_tfhat", "docs_vb", "tfs_vb", "dls_vb")
        # explicit projection: a positional index also carries pos_vb,
        # which BM25 scoring never reads — keep it out of the scan
    )
    qdf = index.spark.createDataFrame(
        pd.DataFrame(q_rows, columns=["query_id", "term", "idf", "k"])
    )
    cand = blocks.join(F.broadcast(qdf), "term").withColumn(
        "avgdl", F.lit(avgdl)
    )

    out = cand.groupBy("query_id").applyInPandas(
        lambda pdf: _topk_one_query(pdf), RESULT_SCHEMA
    )
    return out.orderBy("query_id", "rank")
