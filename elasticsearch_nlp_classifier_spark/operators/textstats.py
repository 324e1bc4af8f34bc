"""Text-analysis operators for training-data pipelines — language ID,
quality scoring, token counting, document fingerprinting.  All pure
built-in expressions (codegen, SQL-expressible for the DuckDB oracle) —
including the rolling-hash fingerprint (``aggregate`` fold, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker words per language — tiny stopword-overlap heuristic.  Chosen
# to be disjoint across languages.  zh is detected by CJK char presence.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour", "que", "pas"],
    "es": ["el", "los", "las", "es", "en", "un", "una", "por", "para", "con"],
}


def words_col(text_col: Column) -> Column:
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def lang_id(text_col: Column) -> Column:
    """Heuristic language ID: CJK chars -> zh; else argmax marker-word
    hit count (ties -> language code ASC); no hits -> 'und'."""
    words = words_col(text_col)
    scores = [
        F.struct(
            F.size(F.array_intersect(
                F.array_distinct(words),
                F.array(*[F.lit(w) for w in ws]),
            )).alias("hits"),
            F.lit(code).alias("code"),
        )
        for code, ws in sorted(LANG_MARKERS.items())
    ]
    # array_max on (hits, code) structs picks max hits; ties -> max code,
    # so invert: sort desc by hits, asc by code via negative trick
    best = F.array_max(F.array(*[
        F.struct(s["hits"].alias("hits"),
                 # invert code ordering so array_max tie-breaks ASC
                 F.lit(len(LANG_MARKERS) - i).alias("inv"),
                 s["code"].alias("code"))
        for i, s in enumerate(scores)
    ]))
    has_cjk = text_col.rlike("[\\u4e00-\\u9fff]")
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best["hits"] > 0, best["code"])
        .otherwise(F.lit("und"))
    )


def token_count(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words_col(text_col))


def bpe_ish_token_count(text_col: Column) -> Column:
    """BPE-ish upper bound: count of GPT-2-style pre-tokenizer pieces
    (contractions, letter runs, digit runs, symbol runs, spaces folded
    into the following piece)."""
    pieces = F.regexp_extract_all(
        text_col,
        F.lit(r"('s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+)"),
        1,
    )
    return F.size(pieces)


def quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_tokens, n_chars_seen, avg_token_len, punct_ratio,
    alpha_ratio, stopword_ratio, quality_score (documented formula:
    weighted mean of [length-in-range, low punct, high alpha, stopword
    presence] — each component in [0,1])."""
    t = F.col(text_col)
    words = words_col(t)
    n_tok = F.size(words)
    n_char = F.length(t)
    n_punct = n_char - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(words), en_stop))

    punct_ratio = F.when(n_char > 0, n_punct / n_char).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_char > 0, n_alpha / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stop_hits / F.least(n_tok, F.lit(10))).otherwise(F.lit(0.0))
    len_ok = F.when((n_tok >= 10) & (n_tok <= 100_000), F.lit(1.0)).otherwise(F.lit(0.0))

    score = (
        0.25 * len_ok
        + 0.25 * (1.0 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.25 * F.least(alpha_ratio * 1.5, F.lit(1.0))
        + 0.25 * F.least(stop_ratio, F.lit(1.0))
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


# Rolling polynomial fingerprint parameters, sized so every
# intermediate fits signed-64 exactly in BOTH engines (Spark bigint and
# DuckDB BIGINT): h < M = 2^43-9, h·P < 2^43·2^20 < 2^63.
FP_MOD = (1 << 43) - 9
FP_BASE = 999_983
FP_SEED = 1_469_598_103


def rolling_fingerprint(text_col: Column) -> Column:
    """Order-sensitive rolling-hash fingerprint over normalized words
    (whitespace/case-insensitive) — a PURE JVM expression: per-word
    60-bit md5-prefix values folded with ``aggregate`` (no Python in
    the path; round 1 ran a per-row-per-word pandas loop here).  The
    identical fold is ANSI-SQL-expressible (DuckDB ``list_transform``
    + ``list_reduce``), so the operator is oracle-checkable."""
    words = words_col(text_col)
    wv = lambda w: (  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("bigint")
        % F.lit(FP_MOD)
    )
    return F.aggregate(
        words,
        F.lit(FP_SEED).cast("bigint"),
        lambda acc, w: (acc * F.lit(FP_BASE) + wv(w)) % F.lit(FP_MOD),
    )


def rolling_fingerprint_sql(text_expr: str = "text") -> str:
    """The DuckDB-dialect twin of ``rolling_fingerprint`` (oracle)."""
    return (
        "list_reduce(list_prepend("
        f"{FP_SEED}::BIGINT, "
        "list_transform("
        f"list_filter(string_split_regex(lower({text_expr}), '\\s+'), "
        "x -> x <> ''), "
        "w -> ('0x' || substr(md5(w), 1, 15))::BIGINT "
        f"% {FP_MOD})), "
        f"(a, b) -> (a * {FP_BASE} + b) % {FP_MOD})"
    )


def document_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sha256, rolling_fp) — exact + normalized fingerprints."""
    return df.select(
        F.col(id_col).alias("id"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
        rolling_fingerprint(F.col(text_col)).alias("rolling_fp"),
    )
