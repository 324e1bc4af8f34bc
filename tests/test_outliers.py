"""ES ML outlier_detection analog: kNN table, LOF/LDOF math vs an
independent numpy reference, IVF approximate path recall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators.outliers import (
    knn_table,
    outlier_scores,
)

SF = "/root/testdata/sf0.001"
EMB = f"{SF}/embeddings.parquet"
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def ref(emb):
    """Numpy reference: ids, matrix, full distance matrix, kNN ids."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf.vec_id.to_numpy()
    X = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    D = np.sqrt(d2)
    np.fill_diagonal(D, np.inf)
    # rank by (dist, nbr_id) like the engine
    order = np.lexsort((np.broadcast_to(ids, D.shape), D), axis=1)
    return {"ids": ids, "X": X, "D": D, "knn": order[:, :K]}


def test_knn_exact_matches_numpy(emb, ref):
    got = knn_table(emb, k=K).toPandas()
    ids, D, knn = ref["ids"], ref["D"], ref["knn"]
    pos = {v: i for i, v in enumerate(ids)}
    for vid in ids[:50]:
        i = pos[vid]
        want_nbrs = [ids[j] for j in knn[i]]
        g = got[got.vec_id == vid].sort_values("rank")
        assert list(g.nbr_id) == want_nbrs
        want_d = [D[i, j] for j in knn[i]]
        np.testing.assert_allclose(g.dist.to_numpy(), want_d, rtol=1e-9)


def test_lof_ldof_vs_numpy(emb, ref):
    got = outlier_scores(emb, k=K).toPandas().set_index("vec_id")
    ids, D, knn = ref["ids"], ref["D"], ref["knn"]
    pos = {v: i for i, v in enumerate(ids)}
    kth = D[np.arange(len(ids))[:, None], knn][:, -1]
    kmean = D[np.arange(len(ids))[:, None], knn].mean(1)
    # lrd
    lrd = np.empty(len(ids))
    for i in range(len(ids)):
        reach = np.maximum(D[i, knn[i]], kth[knn[i]])
        lrd[i] = 1.0 / max(reach.mean(), 1e-12)
    for vid in ids[:30]:
        i = pos[vid]
        lof = lrd[knn[i]].mean() / lrd[i]
        nbrs = knn[i]
        inner = []
        for a in range(K):
            for b in range(a + 1, K):
                inner.append(D[nbrs[a], nbrs[b]])
        ldof = kmean[i] / max(np.mean(inner), 1e-12)
        row = got.loc[vid]
        assert row.kth_dist_r6 == pytest.approx(kth[i], abs=2e-6)
        assert row.mean_dist_r6 == pytest.approx(kmean[i], abs=2e-6)
        assert row.lof_r6 == pytest.approx(lof, abs=2e-6)
        assert row.ldof_r6 == pytest.approx(ldof, abs=2e-6)


def test_outlier_score_normalization(emb):
    got = outlier_scores(emb, k=K).toPandas()
    assert (got.outlier_score_r6 >= 0).all()
    assert (got.outlier_score_r6 <= 1).all()
    # a planted far-away outlier must get the top score
    spark = emb.sparkSession
    dim = len(emb.select("embedding").first()[0])
    far = spark.createDataFrame(
        [(99999, [100.0] * dim, 0)], emb.schema
    )
    with_out = emb.unionByName(far)
    scored = outlier_scores(with_out, k=K).toPandas()
    top = scored.sort_values("outlier_score_r6").iloc[-1]
    assert top.vec_id == 99999
    assert top.outlier_score_r6 == 1.0


def test_ivf_knn_recall(emb, ref):
    got = knn_table(
        emb, k=K, method="ivf", dim=ref["X"].shape[1],
        n_cells=8, n_probe=4,
    ).toPandas()
    ids, knn = ref["ids"], ref["knn"]
    pos = {v: i for i, v in enumerate(ids)}
    hits = tot = 0
    for vid, grp in got.groupby("vec_id"):
        want = {ids[j] for j in knn[pos[vid]]}
        hits += len(set(grp.nbr_id) & want)
        tot += K
    assert tot > 0
    assert hits / tot >= 0.7, f"IVF kNN recall {hits/tot:.2f} < 0.7"
