"""ES ``phrase`` suggester ("did you mean ...?"): per-position
candidate terms from the corpus vocabulary (edit distance), whole
phrases re-ranked by a corpus bigram language model times an
error-channel prior — the same generator+LM shape ES documents for its
phrase suggester, over the engine's own LM (``operators/lm.py``).

Scale split: everything corpus-sized is distributed — the vocabulary
scan that generates candidates (one filter over the unigram table) and
the bigram/unigram count lookups (broadcast-probe joins).  Everything
phrase-sized (≤ max_candidates^positions combinations, capped) is
driver-side, like any query planner.  Collects are bounded by
``positions × max_candidates`` and the candidate-pair count.
"""

from __future__ import annotations

import math
from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.lm import bigram_counts


def phrase_suggest(
    docs: DataFrame,
    text: str,
    text_col: str = "text",
    max_candidates: int = 3,
    max_edits: int = 2,
    k: int = 5,
    alpha: float = 0.5,
    error_rate: float = 0.2,
    model: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Top-``k`` corrected phrases: ``(rank, suggestion, score)``.

    score(phrase) = ln P(w_1)                       (unigram start, add-α)
                  + Σ_{i>1} ln P(w_i | w_{i-1})     (bigram LM, add-α)
                  + Σ_i dist(w_i, input_i) · ln(error_rate)

    The original token is always a candidate (distance 0), so the
    input phrase itself is scored and only outranked by genuinely
    more-likely corrections.  ``error_rate`` is the per-edit channel
    prior; the default 0.2 is calibrated for plain Levenshtein (which
    charges transpositions like teh→the as TWO edits) — lower it for a
    stricter suggester on large corpora where LM gaps dominate."""
    tokens = [t for t in text.lower().split() if t]
    if not tokens or len(tokens) > 8:
        raise ValueError("phrase_suggest takes 1-8 tokens")
    uni, bi = model if model is not None else bigram_counts(docs, text_col)
    uni = uni.cache()
    spark = docs.sparkSession
    stats = uni.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c").alias("total")
    ).head()
    v, total = stats["v"], float(stats["total"] or 0)

    # --- candidate generation: one distributed pass over the vocab ---
    inp = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "pos int, itok string"
    )
    cand = (
        uni.crossJoin(F.broadcast(inp))
        .where(
            (F.abs(F.length("term") - F.length("itok")) <= max_edits)
            & (F.levenshtein("term", "itok") <= max_edits)
        )
        .select("pos", "itok", "term", "c",
                F.levenshtein("term", "itok").alias("dist"))
    )
    w = Window.partitionBy("pos").orderBy(
        F.asc("dist"), F.desc("c"), F.asc("term")
    )
    top = cand.withColumn("rk", F.row_number().over(w)) \
        .where(F.col("rk") <= max_candidates).collect()

    uni_c: dict[str, int] = {}
    cands: dict[int, dict[str, int]] = {i: {} for i in range(len(tokens))}
    for r in top:
        cands[r["pos"]][r["term"]] = r["dist"]
        uni_c[r["term"]] = r["c"]
    for i, t in enumerate(tokens):  # original always a candidate
        cands[i].setdefault(t, 0)

    # unigram counts for any OOV originals default to 0
    missing = sorted({t for cs in cands.values() for t in cs} - set(uni_c))
    if missing:
        got = uni.join(
            F.broadcast(spark.createDataFrame([(t,) for t in missing],
                                              "term string")),
            "term",
        ).collect()
        uni_c.update({r["term"]: r["c"] for r in got})
        uni_c.update({t: 0 for t in missing if t not in uni_c})

    # --- bigram counts for candidate adjacent pairs (bounded probe) ---
    pairs = sorted({
        (a, b)
        for i in range(len(tokens) - 1)
        for a in cands[i] for b in cands[i + 1]
    })
    bi_c: dict[tuple[str, str], int] = {}
    if pairs:
        probe = spark.createDataFrame(pairs, "t1 string, t2 string")
        got = bi.join(F.broadcast(probe), ["t1", "t2"]).collect()
        bi_c = {(r["t1"], r["t2"]): r["c"] for r in got}

    # --- enumerate + score (phrase-sized, driver-side) ---
    log_err = math.log(error_rate)
    scored: list[tuple[str, float]] = []
    for combo in product(*(sorted(cands[i]) for i in range(len(tokens)))):
        lm = math.log((uni_c.get(combo[0], 0) + alpha) / (total + alpha * v))
        for a, b in zip(combo, combo[1:]):
            lm += math.log(
                (bi_c.get((a, b), 0) + alpha)
                / (uni_c.get(a, 0) + alpha * v)
            )
        penalty = sum(cands[i][t] for i, t in enumerate(combo)) * log_err
        scored.append((" ".join(combo), lm + penalty))
    scored.sort(key=lambda s: (-s[1], s[0]))
    return spark.createDataFrame(
        [(i + 1, s, sc) for i, (s, sc) in enumerate(scored[:k])],
        "rank bigint, suggestion string, score double",
    )
