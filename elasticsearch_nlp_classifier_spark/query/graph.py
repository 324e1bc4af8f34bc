"""ES Graph explore API (``POST /<index>/_graph/explore``).

ES's graph API walks term-co-occurrence: seed docs (a query) →
significant terms in those docs become *vertices* → docs containing
those terms → next wave of significant terms, with *edges* weighted by
doc overlap.  The reference's cluster exposes it to every client
(`utils/elasticsearch/ESClient.java`); Kibana's graph UI
is this API.

Spark-first re-expression over the engine's own postings relation
(`index/build.py` — (doc_id, term, tf, dl)):

- a **wave** is two hash joins + one aggregation, all equi-joins on
  ``term`` / ``doc_id``:  seed-term postings → matching docs (semi
  join) → those docs' postings → per-term foreground counts;
- **significance** is ES's default JLH score computed from the
  foreground (seed-doc) vs background (whole-index) term frequencies:
  ``(fg% − bg%) × (fg% / bg%)`` — plain column arithmetic over the
  aggregated counts (``use_significance=False`` falls back to raw
  doc_count, exactly the API's flag);
- **edges** are (source_term, target_term, overlap) from one
  postings⋈postings equi-join on doc_id restricted to wave terms.

Hop count is a driver-side loop over bounded term sets (ES's
``connections`` nesting); every wave's data volume is
``|wave_terms| × avg_df`` postings rows, never the corpus.  Guardrails
(``min_doc_count``, ``vertices_per_hop``) are the API's own knobs and
also the skew bound — a stop-word seed is capped by top-N
significance, not df.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["graph_explore"]


def _wave(
    postings: DataFrame,
    term_stats: DataFrame,
    doc_count: int,
    seed_terms: list[str],
    vertices_per_hop: int,
    min_doc_count: int,
    use_significance: bool,
) -> DataFrame:
    """One exploration wave: (term, fg_count, bg_count, score) for the
    top candidate vertices co-occurring with ``seed_terms``."""
    spark = postings.sparkSession
    seeds = spark.createDataFrame([(t,) for t in seed_terms], "term string")
    seed_docs = (
        postings.join(F.broadcast(seeds), "term", "left_semi")
        .select("doc_id").distinct()
    )
    fg_total = seed_docs.count()
    if fg_total == 0:
        return spark.createDataFrame(
            [], "term string, fg_count long, bg_count long, score double")

    fg = (
        postings.join(seed_docs.hint("broadcast") if fg_total <= 1_000_000
                      else seed_docs, "doc_id", "left_semi")
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("fg_count"))
        .where(F.col("fg_count") >= min_doc_count)
    )
    cand = fg.join(term_stats.select("term", F.col("df").alias("bg_count")),
                   "term")
    fg_pct = F.col("fg_count") / F.lit(float(fg_total))
    bg_pct = F.col("bg_count") / F.lit(float(doc_count))
    jlh = F.when(
        (F.col("bg_count") > 0) & (fg_pct > bg_pct),
        (fg_pct - bg_pct) * (fg_pct / bg_pct),
    ).otherwise(F.lit(0.0))
    scored = cand.withColumn(
        "score",
        jlh if use_significance else F.col("fg_count").cast("double"),
    ).where(~F.col("term").isin(seed_terms))
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("term"))
    return scored.withColumn("__r", F.row_number().over(w)) \
        .where(F.col("__r") <= vertices_per_hop).drop("__r")


def graph_explore(
    postings: DataFrame,
    term_stats: DataFrame,
    doc_count: int,
    seed_terms: list[str],
    hops: int = 1,
    vertices_per_hop: int = 5,
    min_doc_count: int = 3,
    use_significance: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Explore ``hops`` waves out from ``seed_terms``.

    Returns ``(vertices, edges)``:
    ``vertices`` — (term, hop, fg_count, bg_count, score_r6);
    ``edges``    — (source, target, overlap) doc-co-occurrence counts
    between consecutive-wave terms (source hop < target hop).
    """
    spark = postings.sparkSession
    all_vertices: DataFrame | None = None
    all_edges: DataFrame | None = None
    frontier = list(dict.fromkeys(seed_terms))
    seen = set(frontier)

    for hop in range(1, hops + 1):
        wave = _wave(postings, term_stats, doc_count, frontier,
                     vertices_per_hop, min_doc_count, use_significance)
        wave = wave.where(~F.col("term").isin(list(seen))) \
            .withColumn("hop", F.lit(hop))
        rows = wave.select("term").collect()
        new_terms = [r.term for r in rows]
        if not new_terms:
            break

        src = spark.createDataFrame([(t,) for t in frontier], "source string")
        tgt = spark.createDataFrame([(t,) for t in new_terms], "target string")
        pa = postings.select(F.col("term").alias("source"), "doc_id") \
            .join(F.broadcast(src), "source")
        pb = postings.select(F.col("term").alias("target"), "doc_id") \
            .join(F.broadcast(tgt), "target")
        edges = pa.join(pb, "doc_id").groupBy("source", "target") \
            .agg(F.countDistinct("doc_id").alias("overlap")) \
            .where(F.col("overlap") >= min_doc_count)

        vert = wave.select("term", "hop", "fg_count", "bg_count",
                           F.round("score", 6).alias("score_r6"))
        all_vertices = vert if all_vertices is None \
            else all_vertices.unionByName(vert)
        all_edges = edges if all_edges is None \
            else all_edges.unionByName(edges)
        frontier = new_terms
        seen.update(new_terms)

    if all_vertices is None:
        all_vertices = spark.createDataFrame(
            [], "term string, hop int, fg_count long, bg_count long, score_r6 double")
        all_edges = spark.createDataFrame(
            [], "source string, target string, overlap long")
    return all_vertices, all_edges
