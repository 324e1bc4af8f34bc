"""ES `_graph/explore` analog: significant-term co-occurrence waves.

Covers: hop-1 vertices against an independent DuckDB JLH oracle,
hop-2 frontier advance (wave-2 seeds = wave-1 vertices, `seen`
exclusion), edge overlap counts, and the `use_significance=False`
raw-count mode.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.index import build_logical_index
from elasticsearch_nlp_classifier_spark.query.graph import graph_explore

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(DOCS).cache()


@pytest.fixture(scope="module")
def idx(docs):
    ix = build_logical_index(docs, text_col="text",
                             analyzer="simple_code",
                             doc_id_col="doc_id")
    ix.postings.cache().count()
    ix.term_stats.cache().count()
    return ix


def _explore(docs, idx, **kw):
    n_docs = docs.select("doc_id").distinct().count()
    return graph_explore(idx.postings, idx.term_stats, n_docs, **kw)


def test_hop1_vertices_match_duckdb_jlh(docs, idx):
    verts, _ = _explore(docs, idx, seed_terms=["data"], hops=1,
                        vertices_per_hop=5, min_doc_count=2)
    got = verts.toPandas().sort_values("term").reset_index(drop=True)
    want = duckdb.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text),
                                                '[^a-z0-9]+'),
                             x -> x <> '') AS w
          FROM read_parquet('{DOCS}')
        ),
        posts AS (SELECT doc_id, unnest(w) AS term FROM toks),
        tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
               FROM posts GROUP BY 1, 2),
        seed_docs AS (SELECT DISTINCT doc_id FROM tf
                      WHERE term = 'data'),
        n_fg AS (SELECT count(*)::DOUBLE AS n FROM seed_docs),
        n_all AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM tf),
        fg AS (SELECT term, count(*)::BIGINT AS fg_count
               FROM tf JOIN seed_docs USING (doc_id)
               GROUP BY 1 HAVING count(*) >= 2),
        bg AS (SELECT s.term, count(*)::BIGINT AS bg_count
               FROM tf s GROUP BY 1),
        scored AS (
          SELECT f.term, fg_count, bg_count,
                 CASE WHEN fg_count / (SELECT n FROM n_fg)
                           > bg_count / (SELECT n FROM n_all)
                 THEN (fg_count / (SELECT n FROM n_fg)
                       - bg_count / (SELECT n FROM n_all))
                      * ((fg_count / (SELECT n FROM n_fg))
                         / (bg_count / (SELECT n FROM n_all)))
                 ELSE 0.0 END AS score
          FROM fg f JOIN bg USING (term)
          WHERE f.term <> 'data')
        SELECT term, 1 AS hop, fg_count, bg_count,
               round(score, 6) AS score_r6
        FROM scored
        ORDER BY round(score, 9) DESC, term ASC LIMIT 5
    """).df().sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hop2_frontier_and_seen_exclusion(docs, idx):
    verts, edges = _explore(docs, idx, seed_terms=["data"], hops=2,
                            vertices_per_hop=4, min_doc_count=2)
    vp = verts.toPandas()
    hop1 = set(vp[vp.hop == 1].term)
    hop2 = set(vp[vp.hop == 2].term)
    assert "data" not in hop1 | hop2
    assert not (hop1 & hop2), "seen terms must not reappear"
    assert 0 < len(hop1) <= 4 and len(hop2) <= 4
    # every edge connects a previous-frontier term to a new-wave term
    ep = edges.toPandas()
    assert set(ep.source) <= {"data"} | hop1
    assert set(ep.target) <= hop1 | hop2


def test_edge_overlap_counts_exact(docs, idx):
    verts, edges = _explore(docs, idx, seed_terms=["data"], hops=1,
                            vertices_per_hop=3, min_doc_count=2)
    targets = [r.term for r in verts.collect()]
    ep = edges.toPandas()
    posts = idx.postings.select("term", "doc_id").toPandas()
    data_docs = set(posts[posts.term == "data"].doc_id)
    for t in targets:
        t_docs = set(posts[posts.term == t].doc_id)
        want = len(data_docs & t_docs)
        got_rows = ep[(ep.source == "data") & (ep.target == t)]
        if want >= 2:
            assert int(got_rows.overlap.iloc[0]) == want
        else:
            assert got_rows.empty


def test_raw_count_mode(docs, idx):
    verts, _ = _explore(docs, idx, seed_terms=["data"], hops=1,
                        vertices_per_hop=5, min_doc_count=2,
                        use_significance=False)
    vp = verts.toPandas()
    # raw mode scores = fg_count; ordering by fg_count desc, term asc
    assert (vp.score_r6 == vp.fg_count).all()


def test_unknown_seed_returns_empty(docs, idx):
    verts, edges = _explore(docs, idx, seed_terms=["zzzznotaterm"],
                            hops=2, vertices_per_hop=5)
    assert verts.count() == 0 and edges.count() == 0
