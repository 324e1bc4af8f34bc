"""ES function_score and rescore: post-retrieval score shaping.

``function_score`` re-weights a scored hit set with a document-signal
function (the common ``field_value_factor`` form: ``score ×
factor·f(field)``) — one projection over the hits, no extra scan.

``rescore`` is ES's two-phase ranking: take the cheap retriever's top
``window_size`` hits, re-score only that window with an expensive
secondary query (here: phrase/proximity match), and combine
``query_weight × primary + rescore_weight × secondary``.  The whole
point is scale: the expensive scorer touches ``window_size`` rows, not
the corpus — the same top-k-then-refine shape as the ANN exact-rerank
paths in ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "function_score", "rescore_phrase", "decay_score", "random_score",
]


_MODIFIERS = {
    "none": lambda c: c,
    "log1p": lambda c: F.log(10.0, c + F.lit(1.0)),  # ES log1p = log10(1+x)
    "ln1p": lambda c: F.log(c + F.lit(1.0)),
    "sqrt": F.sqrt,
}


def function_score(
    hits: DataFrame,
    field: str,
    factor: float = 1.0,
    modifier: str = "none",
    boost_mode: str = "multiply",
    score_col: str = "score",
) -> DataFrame:
    """ES ``function_score`` with ``field_value_factor``: combine the
    query score with ``modifier(field × factor)`` (ES applies the
    factor before the modifier).  ``boost_mode`` is ``multiply`` or
    ``sum`` (the two common modes)."""
    if modifier not in _MODIFIERS:
        raise ValueError(f"unknown modifier {modifier!r}")
    fv: Column = _MODIFIERS[modifier](
        F.col(field).cast("double") * F.lit(float(factor))
    )
    combined = (
        F.col(score_col) * fv if boost_mode == "multiply"
        else F.col(score_col) + fv
    )
    return hits.withColumn(score_col, combined)


def decay_score(
    hits: DataFrame,
    field: str,
    origin: float,
    scale: float,
    decay: float = 0.5,
    offset: float = 0.0,
    fn: str = "gauss",
    boost_mode: str = "multiply",
    score_col: str = "score",
) -> DataFrame:
    """ES ``function_score`` decay functions (``gauss``/``exp``/
    ``linear``) on a numeric field: the decay value is 1.0 at
    ``origin`` (± ``offset``) and exactly ``decay`` at distance
    ``scale``, falling per the chosen curve (ES reference math):

    - gauss:  ``exp(-d² / 2σ²)`` with ``σ² = -scale² / (2 ln decay)``
    - exp:    ``exp(λ d)``       with ``λ = ln(decay) / scale``
    - linear: ``max(0, (s - d) / s)`` with ``s = scale / (1 - decay)``

    where ``d = max(0, |x - origin| - offset)``.  Pure JVM column
    arithmetic over the hit set — one projection, no extra scan, so it
    composes with any retriever at any scale."""
    import math

    x = F.col(field).cast("double")
    d = F.greatest(
        F.abs(x - F.lit(float(origin))) - F.lit(float(offset)), F.lit(0.0)
    )
    if fn == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        dv: Column = F.exp(-(d * d) / F.lit(2.0 * sigma2))
    elif fn == "exp":
        lam = math.log(decay) / scale
        dv = F.exp(F.lit(lam) * d)
    elif fn == "linear":
        s = scale / (1.0 - decay)
        dv = F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))
    else:
        raise ValueError(f"unknown decay function {fn!r}")
    combined = (
        F.col(score_col) * dv if boost_mode == "multiply"
        else F.col(score_col) + dv
    )
    return hits.withColumn(score_col, combined)


def random_score(
    hits: DataFrame,
    seed: str = "",
    id_col: str = "doc_id",
    boost_mode: str = "multiply",
    score_col: str = "score",
) -> DataFrame:
    """ES ``function_score`` ``random_score``: a deterministic
    uniform-[0,1) draw per document, reproducible across runs/engines
    for a fixed ``seed`` + ``field`` (ES requires exactly that pairing
    for consistent scoring).  Reuses the engine's md5-threshold hash
    (``operators/sampling.hash_uniform``) so the DuckDB oracle computes
    the identical value."""
    from ..operators.sampling import hash_uniform

    rv = hash_uniform(F.col(id_col), salt=seed)
    combined = (
        F.col(score_col) * rv if boost_mode == "multiply"
        else F.col(score_col) + rv
    )
    return hits.withColumn(score_col, combined)


def rescore_phrase(
    index,
    query: str,
    window_size: int = 50,
    k: int = 10,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    analyzer: str = "code",
) -> DataFrame:
    """Two-phase ranking: WAND BM25 retrieves the top ``window_size``
    docs; only that window is re-scored with the exact-phrase match
    count and re-ranked by ``query_weight × bm25 + rescore_weight ×
    n_phrase_matches``.  Returns ``(rank, doc_id, score)``.

    The phrase scorer's positional decode is pruned to the phrase
    terms AND the window's doc set never leaves the cluster — the
    rescore join is window-sized (broadcast)."""
    import pandas as pd

    from .phrase import match_phrase
    from .wand import wand_topk

    spark = index.spark
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [0], "query_text": [query],
                      "k": [window_size]})
    )
    primary = wand_topk(index, q, analyzer=analyzer).select(
        "doc_id", F.col("score").alias("bm25")
    )
    phrases = match_phrase(index, query, analyzer=analyzer).select(
        "doc_id", F.col("n_matches").cast("double").alias("n_phrase")
    )
    combined = (
        primary.join(F.broadcast(phrases), "doc_id", "left")
        .withColumn(
            "score",
            F.lit(float(query_weight)) * F.col("bm25")
            + F.lit(float(rescore_weight))
            * F.coalesce(F.col("n_phrase"), F.lit(0.0)),
        )
    )
    w = Window.orderBy(F.desc(F.round("score", 9)), F.asc("doc_id"))
    return (
        combined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("rank").cast("bigint").alias("rank"),
                "doc_id", "score")
    )


def decay_score_geo(
    hits: DataFrame,
    lat_col: str,
    lon_col: str,
    origin: tuple[float, float],
    scale_km: float,
    decay: float = 0.5,
    offset_km: float = 0.0,
    fn: str = "gauss",
    boost_mode: str = "multiply",
    score_col: str = "score",
) -> DataFrame:
    """ES ``function_score`` decay on a **geo_point** field: the decay
    input is great-circle distance (km) from ``origin`` instead of a
    numeric delta — ES's ``"gauss": {"location": {"origin": "...",
    "scale": "10km"}}`` form.  Reuses the numeric curves
    (`decay_score`) on a computed haversine column; everything stays
    JVM-side codegen like the numeric variant."""
    from .geo import haversine_km

    d = haversine_km(F.col(lat_col), F.col(lon_col), *origin)
    tmp = hits.withColumn("__geo_dist_km", d)
    out = decay_score(
        tmp, "__geo_dist_km", origin=0.0, scale=scale_km,
        decay=decay, offset=offset_km, fn=fn, boost_mode=boost_mode,
        score_col=score_col,
    )
    return out.drop("__geo_dist_km")
