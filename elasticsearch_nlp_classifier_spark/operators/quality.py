"""Gopher-style document-quality filters for training-data pipelines.

Implements the repetition and shape heuristics published in Rae et al.
2021 ("Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", §A1.1) — the de-facto public recipe for filtering
web/code corpora before LLM training:

- duplicate-line fraction and duplicate-line *character* fraction
- top-n-gram character fraction (most frequent word n-gram's coverage)
- duplicate-n-gram character fraction (chars inside any repeated n-gram)
- symbol-to-word ratio ("#", "...", ellipsis)
- bullet-start / ellipsis-end line fractions
- fraction of words containing an alphabetic character
- mean word length and length-in-range gates

Scale shape (the part that matters at 100 TB):

- Everything expressible per-row stays a pure Catalyst expression
  (codegen, zero shuffle): line fractions, symbol ratios, word-shape
  stats all come from ``split``/``filter``/``aggregate`` over arrays.
- The n-gram mode/duplication stats need a per-(doc, gram) count — that
  is ONE shuffle keyed by ``(doc_id, xxhash64(gram))``, with map-side
  partial aggregation (duplicate grams combine before the exchange) and
  no skew (the key embeds doc_id, so no gram is globally hot).
- The per-doc metric tables re-join on ``doc_id`` — co-partitioned
  aggregates of aggregates, each one row per doc.

Every metric is ANSI-SQL-expressible; the DuckDB twin used by the
correctness oracle lives in ``repetition_stats_sql``.

Reference scope note: the reference repo classifies already-curated
Kaggle text (SURVEY §2); these operators are the corpus-preparation
stage upstream of it, per the training-data-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import words_col


def _lines_col(text_col: Column) -> Column:
    """Non-empty lines (split on \\n, blank lines dropped)."""
    return F.filter(
        F.split(text_col, "\n"), lambda ln: F.trim(ln) != ""
    )


# --- pure per-row shape metrics (no shuffle) --------------------------------


def shape_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the per-row Gopher shape metrics as pure expressions.

    Columns added: ``n_words, mean_word_len, alpha_word_frac,
    symbol_word_ratio, bullet_line_frac, ellipsis_line_frac,
    dup_line_frac, dup_line_char_frac``.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = words_col(t)
    n_words = F.size(words)
    total_wchars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    mean_word_len = F.when(n_words > 0, total_wchars / n_words).otherwise(
        F.lit(0.0)
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_word_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(
        F.lit(0.0)
    )
    # Gopher counts '#' and '...' occurrences relative to word count
    n_hash = F.length(t) - F.length(F.regexp_replace(t, "#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"(\.\.\.|…)"), 1))
    symbol_word_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).otherwise(F.lit(0.0))

    lines = _lines_col(t)
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^([-*•])"))
    )
    ellipsis_end = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$"))
    )
    bullet_line_frac = F.when(n_lines > 0, bullet / n_lines).otherwise(
        F.lit(0.0)
    )
    ellipsis_line_frac = F.when(
        n_lines > 0, ellipsis_end / n_lines
    ).otherwise(F.lit(0.0))

    # duplicate lines: occurrences beyond the first of each distinct line
    n_distinct_lines = F.size(F.array_distinct(lines))
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_distinct_lines) / n_lines
    ).otherwise(F.lit(0.0))
    # chars inside those duplicate occurrences / total line chars.
    # O(distinct × lines) JVM comparisons per row — fine for real docs
    # (code files are hundreds of lines); stays entirely in codegen.
    line_chars = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda a, ln: a + F.length(ln)
    )
    dup_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("bigint"),
        lambda a, d: a
        + (F.size(F.filter(lines, lambda ln: ln == d)) - 1) * F.length(d),
    )
    dup_line_char_frac = F.when(
        line_chars > 0, dup_chars / line_chars
    ).otherwise(F.lit(0.0))

    return df.select(
        "*",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_word_frac.alias("alpha_word_frac"),
        symbol_word_ratio.alias("symbol_word_ratio"),
        bullet_line_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        dup_line_frac.alias("dup_line_frac"),
        dup_line_char_frac.alias("dup_line_char_frac"),
    )


# --- n-gram repetition metrics (one keyed shuffle) ---------------------------


def _ngrams(words: Column, n: int) -> Column:
    """Word n-grams joined by a single space (1-based slice)."""
    starts = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts, lambda i: F.array_join(F.slice(words, i, n), " ")
    )


def ngram_repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 8,
) -> DataFrame:
    """Per-doc n-gram repetition metrics (Gopher §A1.1 items 5-6).

    Returns ``(id_col, top{top_n}gram_char_frac, dup{dup_n}gram_char_frac)``:

    - ``top_ngram_char_frac``: characters covered by the single most
      frequent ``top_n``-gram ÷ total word characters.
    - ``dup_ngram_char_frac``: characters inside occurrences (beyond the
      first) of any repeated ``dup_n``-gram ÷ total word characters.
      (Upper-bound variant: overlapping repeats are counted per
      occurrence, not de-overlapped — same contract as the oracle.)

    Plan: explode n-grams → ``groupBy(id, gram)`` (ONE exchange, partial
    map-side combine, key embeds the doc id so no global hot key) →
    per-doc aggregate → broadcast-size per-doc rows joined back on id.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = words_col(t)
    total_wchars = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda a, w: a + F.length(w)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        words.alias("words"),
        total_wchars.alias("total_wchars"),
    )

    def gram_counts(n: int) -> DataFrame:
        g = base.select(
            "id", "total_wchars", F.explode(_ngrams(F.col("words"), n)).alias("gram")
        )
        # gram char length excluding the joining spaces (word chars only)
        glen = F.length(F.col("gram")) - F.lit(n - 1)
        return (
            g.groupBy("id", "gram")
            .agg(
                F.count("*").alias("cnt"),
                F.first("total_wchars").alias("total_wchars"),
                F.first(glen).alias("glen"),
            )
        )

    top = (
        gram_counts(top_n)
        .groupBy("id")
        .agg(
            (
                # scalar composite ordering key (cnt, then glen): DuckDB's
                # max_by twin can't order by a struct
                F.max_by(
                    F.col("cnt") * F.col("glen"),
                    F.col("cnt") * F.lit(1 << 32) + F.col("glen"),
                )
                / F.greatest(F.first("total_wchars"), F.lit(1))
            ).alias(f"top{top_n}gram_char_frac")
        )
    )
    dup = (
        gram_counts(dup_n)
        .groupBy("id")
        .agg(
            (
                F.sum(
                    F.when(
                        F.col("cnt") > 1, (F.col("cnt") - 1) * F.col("glen")
                    ).otherwise(F.lit(0))
                )
                / F.greatest(F.first("total_wchars"), F.lit(1))
            ).alias(f"dup{dup_n}gram_char_frac")
        )
    )
    ids = df.select(F.col(id_col).alias("id")).distinct()
    out = (
        ids.join(top, "id", "left")
        .join(dup, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(f"top{top_n}gram_char_frac", F.lit(0.0)).alias(
                f"top{top_n}gram_char_frac"
            ),
            F.coalesce(f"dup{dup_n}gram_char_frac", F.lit(0.0)).alias(
                f"dup{dup_n}gram_char_frac"
            ),
        )
    )
    return out


def repetition_stats_sql(
    docs_table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 8,
) -> str:
    """DuckDB twin of ``ngram_repetition_stats`` (correctness oracle)."""
    words = (
        f"list_filter(string_split_regex(lower(coalesce({text_expr}, ''))"
        ", '\\s+'), x -> x <> '')"
    )

    def grams_cte(n: int) -> str:
        # literal n per CTE: DuckDB can't bind a VALUES-joined n inside
        # the lateral range expression
        return f"""
  SELECT id, total_wchars, {n} AS n,
         array_to_string(words[i:i + {n - 1}], ' ') AS gram,
         length(array_to_string(words[i:i + {n - 1}], ' ')) - {n - 1}
           AS glen
  FROM docs,
       LATERAL (SELECT unnest(range(1, len(words) - {n} + 2)) AS i) s
  WHERE len(words) >= {n}"""

    return f"""
WITH docs AS (
  SELECT {id_expr} AS id, {words} AS words,
         coalesce(list_sum(list_transform({words}, w -> length(w))), 0)
           AS total_wchars
  FROM {docs_table}
),
grams AS ({grams_cte(top_n)}
  UNION ALL{grams_cte(dup_n)}
),
counts AS (
  SELECT id, n, gram, count(*) AS cnt,
         first(total_wchars) AS total_wchars, first(glen) AS glen
  FROM grams GROUP BY id, n, gram
),
top AS (
  SELECT id,
         max_by(cnt * glen, cnt * 4294967296 + glen) * 1.0
           / greatest(first(total_wchars), 1) AS topf
  FROM counts WHERE n = {top_n} GROUP BY id
),
dup AS (
  SELECT id,
         sum(CASE WHEN cnt > 1 THEN (cnt - 1) * glen ELSE 0 END) * 1.0
           / greatest(first(total_wchars), 1) AS dupf
  FROM counts WHERE n = {dup_n} GROUP BY id
)
SELECT d.id AS {id_expr},
       round(coalesce(top.topf, 0.0), 6) AS top{top_n}gram_char_frac_r6,
       round(coalesce(dup.dupf, 0.0), 6) AS dup{dup_n}gram_char_frac_r6
FROM (SELECT DISTINCT id FROM docs) d
LEFT JOIN top USING (id) LEFT JOIN dup USING (id)
"""


# --- the combined pass/fail gate ---------------------------------------------

#: Published Gopher thresholds (Rae et al. 2021 Table A1), adapted:
#: word-count bounds relaxed for code snippets.
GOPHER_THRESHOLDS = {
    "min_words": 10,
    "max_words": 200_000,
    "min_mean_word_len": 2.0,
    "max_mean_word_len": 12.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.6,
    "max_dup_line_frac": 0.3,
    "max_dup_line_char_frac": 0.2,
    "max_top2gram_char_frac": 0.2,
    "max_dup8gram_char_frac": 0.1,
}


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict | None = None,
) -> DataFrame:
    """All Gopher metrics + a boolean ``gopher_pass`` column.

    One keyed shuffle (the n-gram counts) + one doc-id join; everything
    else is codegen expressions on the scan.
    """
    th = {**GOPHER_THRESHOLDS, **(thresholds or {})}
    shaped = shape_stats(df, text_col)
    reps = ngram_repetition_stats(df, text_col, id_col)
    out = shaped.join(reps, id_col)
    passed = (
        (F.col("n_words") >= th["min_words"])
        & (F.col("n_words") <= th["max_words"])
        & (F.col("mean_word_len") >= th["min_mean_word_len"])
        & (F.col("mean_word_len") <= th["max_mean_word_len"])
        & (F.col("symbol_word_ratio") <= th["max_symbol_word_ratio"])
        & (F.col("bullet_line_frac") <= th["max_bullet_line_frac"])
        & (F.col("ellipsis_line_frac") <= th["max_ellipsis_line_frac"])
        & (F.col("alpha_word_frac") >= th["min_alpha_word_frac"])
        & (F.col("dup_line_frac") <= th["max_dup_line_frac"])
        & (F.col("dup_line_char_frac") <= th["max_dup_line_char_frac"])
        & (F.col("top2gram_char_frac") <= th["max_top2gram_char_frac"])
        & (F.col("dup8gram_char_frac") <= th["max_dup8gram_char_frac"])
    )
    return out.withColumn("gopher_pass", passed)
