"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F2/F3).

Every row is a pure function of its index ``i`` and the seed, so the
corpus is identical regardless of Spark partitioning or parallelism —
the property the two-parallelism scaling runs and checkpoint-resume
tests depend on.  The same row function backs (a) a pure-pandas
generator for unit tests/oracles and (b) a distributed ``mapInPandas``
generator for big scale factors.

Schema (BASELINE.json input_hint):
``(repo:string, path:string, commit:string, lang:string, content:string)``
— uniqueness key ``(repo, path, commit)``; ingest invariant:
``sha256(content)`` equality against the generator manifest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42

_LANGS = ["python", "java", "scala", "js", "go", "md"]
_LANG_W = np.array([0.30, 0.22, 0.12, 0.16, 0.10, 0.10])
_EXT = {"python": "py", "java": "java", "scala": "scala",
        "js": "js", "go": "go", "md": "md"}

# Zipf head: skewed common code terms (the explicit skew the north rule
# requires the index build to survive — 'the', 'import', 'return', ...).
_HEAD = (
    "the import return def class if else for while self public static "
    "void function var const int string new this null true false package "
    "from with not and or in is to of data value result type error test "
    "file line name list map set get put add key index node len print"
).split()

_LANG_KW = {
    "python": ["def", "self", "import", "elif", "lambda", "yield"],
    "java": ["public", "static", "void", "extends", "implements", "final"],
    "scala": ["val", "object", "trait", "implicit", "case", "match"],
    "js": ["function", "const", "let", "async", "await", "undefined"],
    "go": ["func", "chan", "defer", "goroutine", "struct", "interface"],
    "md": ["readme", "documentation", "install", "usage", "license", "badge"],
}

_N_MID = 2000  # mid-frequency identifier pool size


def gen_row(i: int) -> dict:
    """Row ``i`` of the corpus — pure, deterministic."""
    rng = np.random.default_rng([SEED, i])
    repo = f"org{i % 7}/repo{i % 23}"
    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_W))]
    d = int(rng.integers(0, 40))
    path = f"src/dir{d}/file_{i}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()

    n_tokens = int(rng.integers(30, 401))
    kinds = rng.choice(3, size=n_tokens, p=[0.55, 0.40, 0.05])
    # Zipf-distributed head terms (skew), uniform mid ids, unique rares.
    zipf_idx = np.minimum(rng.zipf(1.3, size=n_tokens) - 1, len(_HEAD) - 1)
    mid_idx = rng.integers(0, _N_MID, size=n_tokens)
    toks = []
    n_rare = 0
    kw = _LANG_KW[lang]
    for k, zi, mi in zip(kinds, zipf_idx, mid_idx):
        if k == 0:
            toks.append(_HEAD[int(zi)])
        elif k == 1:
            toks.append(f"id_{int(mi)}")
        else:
            toks.append(f"uniq_{i}_{n_rare}")
            n_rare += 1
    # language-signal keywords (lets the NB classifier learn `lang`)
    n_kw = max(3, n_tokens // 20)
    kw_pos = rng.integers(0, n_tokens, size=n_kw)
    for p in kw_pos:
        toks[int(p)] = kw[int(rng.integers(0, len(kw)))]
    # line breaks every ~8 tokens to look file-ish
    parts = []
    for j in range(0, len(toks), 8):
        parts.append(" ".join(toks[j:j + 8]))
    content = "\n".join(parts)
    return {"repo": repo, "path": path, "commit": commit,
            "lang": lang, "content": content}


def gen_corpus_pdf(n_docs: int, start: int = 0) -> pd.DataFrame:
    """Pure-pandas corpus slice [start, start+n_docs)."""
    return pd.DataFrame([gen_row(i) for i in range(start, start + n_docs)])


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def gen_corpus_df(spark, n_docs: int, partitions: int = 32):
    """Distributed deterministic corpus as a DataFrame (mapInPandas over
    ``spark.range`` — each task generates only its own rows, so this
    scales to any n_docs without a driver-side materialization)."""

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame([gen_row(int(i)) for i in pdf["id"]])

    rng_df = spark.range(0, n_docs, 1, partitions)
    return rng_df.mapInPandas(gen, CORPUS_SCHEMA)


def write_corpus(spark, n_docs: int, path: str, partitions: int = 32) -> None:
    """Write corpus parquet + sha256 manifest (the 'reference dataset'
    our ingest is verified against — FIXTURES.md F1)."""
    from pyspark.sql import functions as F

    df = gen_corpus_df(spark, n_docs, partitions)
    df.write.mode("overwrite").parquet(f"{path}/corpus_docs.parquet")
    (
        spark.read.parquet(f"{path}/corpus_docs.parquet")
        .select("repo", "path", "commit",
                F.sha2(F.col("content"), 256).alias("sha256"))
        .write.mode("overwrite").parquet(f"{path}/corpus_manifest.parquet")
    )


def verify_ingest(spark, docs_df, manifest_path: str):
    """Per-row sha256(content) equality vs the generator manifest
    (BASELINE.json input_hint invariant). Returns dict of counts."""
    from pyspark.sql import functions as F

    manifest = spark.read.parquet(manifest_path)
    joined = (
        docs_df.select("repo", "path", "commit",
                       F.sha2(F.col("content"), 256).alias("sha256_actual"))
        .join(manifest, ["repo", "path", "commit"], "full_outer")
    )
    agg = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("sha256_actual") == F.col("sha256"), 1)
              .otherwise(0)).alias("matched"),
        F.sum(F.when(F.col("sha256_actual").isNull()
                     | F.col("sha256").isNull(), 1).otherwise(0))
        .alias("missing"),
    ).collect()[0]
    return {"total": agg["total"], "matched": agg["matched"],
            "missing": agg["missing"],
            "ok": agg["matched"] == agg["total"] and agg["missing"] == 0}
