"""rank_vectors / ColBERT maxsim late interaction: numpy parity of the
Catalyst score expression, rerank recall vs brute, pooled-vector math."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.query.late_interaction import (
    maxsim_rerank_ivf,
    maxsim_topk,
    split_vectors,
)

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"
CHUNKS = 8


@pytest.fixture(scope="module")
def mv(spark):
    emb = spark.read.parquet(EMB)
    return split_vectors(emb, "embedding", CHUNKS).select(
        "vec_id", "vecs"
    ).cache()


@pytest.fixture(scope="module")
def queries(mv):
    return (
        mv.where(F.col("vec_id") < 3)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vecs").alias("qvecs"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def ref(mv):
    pdf = mv.toPandas()
    ids = pdf.vec_id.to_numpy()
    V = np.stack([
        np.stack([np.asarray(c, dtype=np.float64) for c in vecs])
        for vecs in pdf.vecs
    ])  # (n, chunks, d)
    return ids, V


def _np_maxsim(Q, D):
    # Q: (cq, d), D: (cd, d) -> sum over q of max over d of dot
    return (Q @ D.T).max(axis=1).sum()


def test_split_vectors_shape(mv):
    row = mv.first()
    assert len(row.vecs) == CHUNKS
    assert len(row.vecs[0]) == 64 // CHUNKS


def test_maxsim_matches_numpy(mv, queries, ref):
    ids, V = ref
    pos = {v: i for i, v in enumerate(ids)}
    got = maxsim_topk(mv, queries, k=5, id_col="vec_id").toPandas()
    for qid in (0, 1, 2):
        Q = V[pos[qid]]
        scores = {
            ids[j]: _np_maxsim(Q, V[j])
            for j in range(len(ids)) if ids[j] != qid
        }
        want = sorted(
            scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0])
        )[:5]
        g = got[got.query_id == qid].sort_values("rank")
        assert list(g.doc_id) == [w[0] for w in want]
        np.testing.assert_allclose(
            g.score_r6.to_numpy(), [round(w[1], 6) for w in want],
            atol=2e-6,
        )


def test_rerank_recall_vs_brute(mv, queries):
    brute = maxsim_topk(mv, queries, k=10, id_col="vec_id").toPandas()
    rer = maxsim_rerank_ivf(
        mv, queries, k=10, n_candidates=100,
        n_cells=8, n_probe=4, id_col="vec_id",
    ).toPandas()
    hits = tot = 0
    for qid in (0, 1, 2):
        want = set(brute[brute.query_id == qid].doc_id)
        gotq = set(rer[rer.query_id == qid].doc_id)
        hits += len(want & gotq)
        tot += len(want)
    assert hits / tot >= 0.6, f"rerank recall {hits/tot:.2f}"


def test_rerank_scores_are_exact_maxsim(mv, queries):
    """Whatever candidates the ANN stage picked, their displayed
    scores must equal the brute maxsim scores."""
    brute = maxsim_topk(
        mv, queries, k=10**6, id_col="vec_id"
    ).toPandas().set_index(["query_id", "doc_id"]).score_r6
    rer = maxsim_rerank_ivf(
        mv, queries, k=10, n_candidates=50,
        n_cells=8, n_probe=2, id_col="vec_id",
    ).toPandas()
    for row in rer.itertuples():
        assert brute.loc[(row.query_id, row.doc_id)] == pytest.approx(
            row.score_r6, abs=1e-9
        )
