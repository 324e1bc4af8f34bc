"""ES ML outlier detection (data frame analytics ``outlier_detection``).

ES's analytics job scores every row of a feature frame by an ensemble
of four distance-based methods over the row's k nearest neighbours
(public docs + the open C++ ml-cpp implementation outline):

- ``distance_kth_nn`` — distance to the k-th nearest neighbour,
- ``distance_knn``    — mean distance to the k nearest neighbours,
- ``lof``             — local outlier factor (Breunig et al. 2000),
- ``ldof``            — local distance-based outlier factor (Zhang
  et al. 2009): mean kNN distance ÷ mean pairwise distance *among*
  the neighbours,

then combines normalized method scores into one ``outlier_score``.
The reference repo reaches this via its hosted ES cluster's ML
endpoints (same service surface as `utils/elasticsearch/
ESClient.java`); here every stage is a DataFrame
relational plan over the embeddings table.

Spark-first shape
-----------------
The whole computation is joins + window ranks + aggregations over a
``(vec_id, nbr_id, dist, rank)`` kNN relation:

- **exact** kNN is the quarantined small-scale/oracle baseline (a
  cross join — O(n²), never the scale path);
- **ivf** kNN reuses the IVF machinery from ``similarity.py``: assign
  every vector to its centroid cell, probe the ``n_probe`` nearest
  cells, rank candidates — candidate volume is ``n_probe/n_cells`` of
  the corpus per row, embarrassingly parallel, no driver state beyond
  the (n_cells × dim) centroid matrix.

LOF/LDOF are *relational* here: reachability = one join of the kNN
table with the neighbours' own k-distances; LDOF's neighbour-pairwise
mean = the kNN table self-joined on ``vec_id`` (k² rows per vector,
k is a small constant).  Distances are computed JVM-side
(``zip_with`` + ``aggregate``), no per-row Python anywhere.

Determinism: method scores are rounded to 6 decimals *before* the
min-max ensemble normalization, so Spark and an independent SQL oracle
normalize bit-identical inputs.  Ties in neighbour rank break by
``nbr_id`` ascending.  Standardization of input features (ES default)
is out of scope — pass pre-scaled vectors; ``compute_feature_influence``
is not implemented.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["knn_table", "outlier_scores"]

_EPS = 1e-12


def _euclid(a, b):
    # cast each element to double BEFORE subtracting: the storage type
    # is float32, and float-precision subtraction would diverge from a
    # double-arithmetic SQL oracle at ~1e-7 — far above the 1e-6
    # rounding contract
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def knn_table(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    centroids: np.ndarray | None = None,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """k nearest neighbours of every vector: ``(vec_id, nbr_id, dist,
    rank)``, euclidean, rank 1..k by (dist ASC, nbr_id ASC).

    ``method='exact'`` is the all-pairs baseline (oracle-checkable,
    O(n²) — small SF only).  ``method='ivf'`` probes IVF cells and is
    the 100 TB path; with duplicated/clustered data a vector's true
    neighbours live in its probed cells with high probability
    (recall pinned in tests vs the exact path).
    """
    left = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va")
    )
    if method == "exact":
        right = embeddings.select(
            F.col(id_col).alias("nbr_id"), F.col(vec_col).alias("vb")
        )
        pairs = left.crossJoin(right).where(
            F.col("vec_id") != F.col("nbr_id")
        )
    elif method == "ivf":
        from .similarity import ivf_candidates, ivf_train_centroids

        if centroids is None:
            if dim is None:
                raise ValueError("ivf method needs dim or centroids")
            centroids = ivf_train_centroids(
                embeddings, dim, n_cells, id_col=id_col, vec_col=vec_col
            )
        pairs = ivf_candidates(
            embeddings,
            left.select(
                F.col("vec_id").alias("query_id"),
                F.col("va").alias("query_vec"),
            ),
            centroids,
            n_probe=n_probe,
            id_col=id_col,
            vec_col=vec_col,
        ).select(
            F.col("query_id").alias("vec_id"),
            F.col(id_col).alias("nbr_id"),
            F.col("qv").alias("va"),
            F.col(vec_col).alias("vb"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    scored = pairs.select(
        "vec_id", "nbr_id", _euclid(F.col("va"), F.col("vb")).alias("dist")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def outlier_scores(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "exact",
    **knn_kwargs,
) -> DataFrame:
    """Per-row outlier scores: ``(vec_id, kth_dist_r6, mean_dist_r6,
    lof_r6, ldof_r6, outlier_score_r6)``.

    ``outlier_score`` = mean of the four min-max-normalized method
    scores (each method rounded to 6 decimals first — the documented
    determinism contract; a constant-valued method normalizes to 0).
    """
    knn = knn_table(
        embeddings, k, id_col, vec_col, method, **knn_kwargs
    ).cache()

    base = knn.groupBy("vec_id").agg(
        F.max("dist").alias("kth_dist"),
        F.avg("dist").alias("mean_dist"),
    )

    # --- LOF: reach(p,o) = max(dist(p,o), kdist(o)); lrd = 1/avg reach
    kdist = base.select("vec_id", "kth_dist")
    reach = knn.join(
        kdist.select(
            F.col("vec_id").alias("nbr_id"),
            F.col("kth_dist").alias("kdist_o"),
        ),
        "nbr_id",
    ).select(
        "vec_id", "nbr_id",
        F.greatest("dist", "kdist_o").alias("reach"),
    )
    lrd = reach.groupBy("vec_id").agg(
        (F.lit(1.0) / F.greatest(F.avg("reach"), F.lit(_EPS))).alias("lrd")
    )
    lof = (
        knn.join(
            lrd.select(
                F.col("vec_id").alias("nbr_id"),
                F.col("lrd").alias("lrd_o"),
            ),
            "nbr_id",
        )
        .groupBy("vec_id")
        .agg(F.avg("lrd_o").alias("avg_lrd_o"))
        .join(lrd, "vec_id")
        .select(
            "vec_id", (F.col("avg_lrd_o") / F.col("lrd")).alias("lof")
        )
    )

    # --- LDOF: mean kNN dist / mean pairwise dist among the neighbours
    na = knn.select("vec_id", F.col("nbr_id").alias("a"))
    nb = knn.select("vec_id", F.col("nbr_id").alias("b"))
    nbr_pairs = na.join(nb, "vec_id").where(F.col("a") < F.col("b"))
    vecs = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    )
    inner = (
        nbr_pairs.join(
            vecs.select(F.col("vid").alias("a"), F.col("v").alias("va")),
            "a",
        )
        .join(
            vecs.select(F.col("vid").alias("b"), F.col("v").alias("vb")),
            "b",
        )
        .select(
            "vec_id", _euclid(F.col("va"), F.col("vb")).alias("d")
        )
        .groupBy("vec_id")
        .agg(F.avg("d").alias("inner_mean"))
    )
    ldof = base.join(inner, "vec_id").select(
        "vec_id",
        (
            F.col("mean_dist")
            / F.greatest(F.col("inner_mean"), F.lit(_EPS))
        ).alias("ldof"),
    )

    methods = (
        base.join(lof, "vec_id")
        .join(ldof, "vec_id")
        .select(
            "vec_id",
            F.round("kth_dist", 6).alias("kth_dist_r6"),
            F.round("mean_dist", 6).alias("mean_dist_r6"),
            F.round("lof", 6).alias("lof_r6"),
            F.round("ldof", 6).alias("ldof_r6"),
        )
    )

    cols = ["kth_dist_r6", "mean_dist_r6", "lof_r6", "ldof_r6"]
    extrema = methods.agg(
        *[F.min(c).alias(f"min_{c}") for c in cols],
        *[F.max(c).alias(f"max_{c}") for c in cols],
    )
    norm = [
        F.when(
            F.col(f"max_{c}") > F.col(f"min_{c}"),
            (F.col(c) - F.col(f"min_{c}"))
            / (F.col(f"max_{c}") - F.col(f"min_{c}")),
        )
        .otherwise(F.lit(0.0))
        .alias(f"n_{c}")
        for c in cols
    ]
    scored = methods.crossJoin(F.broadcast(extrema)).select(
        "vec_id", *cols, *norm
    )
    ncols = [F.col(f"n_{c}") for c in cols]
    return scored.select(
        "vec_id", *cols,
        F.round(
            (ncols[0] + ncols[1] + ncols[2] + ncols[3]) / F.lit(4.0), 6
        ).alias("outlier_score_r6"),
    )
