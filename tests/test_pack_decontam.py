"""Sequence packing and benchmark decontamination."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from elasticsearch_nlp_classifier_spark.operators import (
    decontaminate,
    ngram_contamination,
    pack_mapping,
    pack_tokens,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


# ------------------------------------------------------- decontamination

EVAL_ITEMS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta"),   # 8-gram of doc 0
    (1, "completely unrelated benchmark question about nothing shared here"),
]

CORPUS = [
    "intro words alpha beta gamma delta epsilon zeta eta theta trailing tail",
    "a clean document with no overlap against any benchmark item at all",
    "another clean one totally disjoint from the eval set of course",
]


def test_ngram_contamination_flags_overlap(spark):
    docs = _docs(spark, CORPUS)
    ev = spark.createDataFrame(EVAL_ITEMS, "eval_id bigint, text string")
    rep = ngram_contamination(docs, ev, n=8).toPandas()
    # doc 0 contains eval 0's single 8-gram verbatim -> exactly one hit
    assert rep[["id", "eval_id"]].values.tolist() == [[0, 0]]
    r = rep.iloc[0]
    assert r.n_collisions == 1 and r.eval_ngrams == 1 and r.overlap_frac == 1.0

    clean = decontaminate(docs, ev, n=8).toPandas()
    assert sorted(clean.doc_id) == [1, 2]


def test_contamination_partial_overlap_fraction(spark):
    # eval item has 3 distinct 4-grams; corpus doc contains 2 of them
    ev = spark.createDataFrame(
        [(7, "one two three four five six")], "eval_id bigint, text string"
    )  # 4-grams: {one two three four, two three four five, three four five six}
    docs = _docs(spark, ["xx one two three four five yy"])
    # doc 4-grams include {one two three four, two three four five}
    rep = ngram_contamination(docs, ev, n=4).toPandas()
    assert len(rep) == 1
    assert rep.iloc[0].n_collisions == 2
    assert rep.iloc[0].eval_ngrams == 3
    assert rep.iloc[0].overlap_frac == pytest.approx(2 / 3)


# ------------------------------------------------------------- packing

def _window_oracle_mapping(spark, docs, seq_len, sep_tokens=1):
    """Single-task window twin of pack_mapping (small data only)."""
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
        .cast("bigint").alias("n_toks"),
    ).where(F.col("n_toks") > 0)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    offs = toks.withColumn(
        "offset",
        F.coalesce(F.sum(F.col("n_toks") + sep_tokens).over(w), F.lit(0)),
    )
    L = F.lit(seq_len)
    ex = offs.select(
        "id", "n_toks", "offset",
        F.explode(
            F.sequence(F.floor(F.col("offset") / L),
                       F.floor((F.col("offset") + F.col("n_toks") - 1) / L))
        ).alias("seq_id"),
    )
    ss = F.col("seq_id") * L
    a = F.greatest("offset", ss)
    b = F.least(F.col("offset") + F.col("n_toks"), ss + L)
    return ex.select(
        "seq_id", "id", (a - F.col("offset")).alias("doc_off"),
        (a - ss).alias("seq_off"), (b - a).alias("n_toks"),
    )


def test_pack_mapping_matches_window_oracle(spark):
    texts = [
        " ".join(f"d{i}t{j}" for j in range(3 + (i * 7) % 11))
        for i in range(40)
    ]
    texts[5] = ""  # empty doc skipped
    docs = _docs(spark, texts)
    got = pack_mapping(docs, seq_len=16).toPandas().sort_values(
        ["seq_id", "id"]).reset_index(drop=True)
    want = _window_oracle_mapping(spark, docs, 16).toPandas().sort_values(
        ["seq_id", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # invariants: slices tile each doc exactly, sequences never overlap
    for _id, g in got.groupby("id"):
        g = g.sort_values("doc_off")
        assert g.doc_off.iloc[0] == 0
        assert (g.doc_off + g.n_toks).iloc[:-1].tolist() == \
            g.doc_off.iloc[1:].tolist()
    for _sid, g in got.groupby("seq_id"):
        g = g.sort_values("seq_off")
        assert (g.seq_off >= 0).all() and ((g.seq_off + g.n_toks) <= 16).all()
        ends = (g.seq_off + g.n_toks).iloc[:-1]
        assert (g.seq_off.iloc[1:].values - ends.values >= 0).all()


def test_pack_tokens_reconstruction(spark):
    texts = [
        " ".join(f"d{i}t{j}" for j in range(2 + (i * 5) % 9))
        for i in range(25)
    ]
    docs = _docs(spark, texts)
    L = 12
    mapping = pack_mapping(docs, seq_len=L)
    packed = pack_tokens(docs, mapping, seq_len=L).toPandas()
    assert (packed.tokens.map(len) == L).all()
    # stream of real tokens (pads/seps dropped) == docs concatenated in order
    stream = [
        t
        for _, row in packed.sort_values("seq_id").iterrows()
        for t in row.tokens
        if t not in ("<|sep|>", "<|pad|>")
    ]
    expected = [t for txt in texts for t in txt.split()]
    assert stream == expected
