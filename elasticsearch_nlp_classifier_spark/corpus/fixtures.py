"""F2 tweets table + F3 BM25 query set (FIXTURES.md).

Deterministic (seed 42), pure functions of the row index — same contract
as the corpus generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42

_KEYWORDS = ["", "earthquake", "fire", "flood", "storm", "crash",
             "explosion", "sunset", "music", "food"]
_DISASTER_WORDS = ["earthquake", "fire", "flood", "storm", "crash",
                   "explosion", "collapse", "emergency", "damage", "rescue"]
_BENIGN_WORDS = ["sunset", "music", "food", "game", "movie", "holiday",
                 "coffee", "beach", "party", "book"]
_FILLER = ["today", "just", "really", "amazing", "watch", "people",
           "city", "news", "time", "love", "happening", "near"]
_LOCATIONS = ["", "London", "New York", "Tokyo", "", "Paris", "", "Sydney"]


def gen_tweet(i: int) -> dict:
    rng = np.random.default_rng([SEED, 7919, i])
    is_disaster = int(rng.random() < 0.43)
    pool = _DISASTER_WORDS if is_disaster else _BENIGN_WORDS
    n = int(rng.integers(6, 18))
    words = [pool[int(k)] for k in rng.integers(0, len(pool), size=2)]
    words += [_FILLER[int(k)] for k in rng.integers(0, len(_FILLER), size=n - 2)]
    rng.shuffle(words)
    # 15% label noise so accuracy is realistic, not 1.0
    target = is_disaster if rng.random() > 0.15 else 1 - is_disaster
    if rng.random() < 0.25:
        words.append(f"#{pool[int(rng.integers(0, len(pool)))]}")
    if rng.random() < 0.15:
        words.append("@someone")
    if rng.random() < 0.15:
        words.append(f"http://t.co/x{i}")
    kw = _KEYWORDS[int(rng.integers(0, len(_KEYWORDS)))]
    return {
        "id": i,
        "keyword": kw,
        "location": _LOCATIONS[int(rng.integers(0, len(_LOCATIONS)))],
        "text": " ".join(words),
        "target": str(target),
    }


def gen_tweets_pdf(n: int, test_frac: float = 0.3) -> pd.DataFrame:
    """Tweets table; last ``test_frac`` rows get target='' (unlabeled test
    split, the rows P9 must filter before training)."""
    rows = [gen_tweet(i) for i in range(n)]
    cut = int(n * (1 - test_frac))
    for r in rows[cut:]:
        r["target"] = ""
    return pd.DataFrame(rows)


TWEETS_SCHEMA = "id int, keyword string, location string, text string, target string"


# --- F3: fixed BM25 query set ------------------------------------------------
# mix: single rare term / single skewed term / 2-4 term / absent terms.
QUERIES: list[dict] = [
    {"query_id": 1, "query_text": "import", "k": 10},
    {"query_id": 2, "query_text": "the", "k": 10},
    {"query_id": 3, "query_text": "uniq_7_0", "k": 10},
    {"query_id": 4, "query_text": "def self import", "k": 10},
    {"query_id": 5, "query_text": "public static void", "k": 10},
    {"query_id": 6, "query_text": "id_17 id_42", "k": 10},
    {"query_id": 7, "query_text": "error test file line", "k": 10},
    {"query_id": 8, "query_text": "zzz_not_in_corpus", "k": 10},
    {"query_id": 9, "query_text": "implicit trait match", "k": 10},
    {"query_id": 10, "query_text": "func chan defer", "k": 10},
    {"query_id": 11, "query_text": "readme documentation usage", "k": 10},
    {"query_id": 12, "query_text": "import", "k": 1},
    {"query_id": 13, "query_text": "data value result", "k": 100},
    {"query_id": 14, "query_text": "async await undefined", "k": 10},
    {"query_id": 15, "query_text": "return the import zzz_not_in_corpus", "k": 10},
]


def queries_pdf() -> pd.DataFrame:
    return pd.DataFrame(QUERIES)


def query_batch_pdf(n: int = 120) -> pd.DataFrame:
    """Deterministic n-query batch: the F3 set tiled with fresh ids.

    Throughput-scaling measurements need the batch large enough that
    per-query scoring work (one task per query) dominates the fixed
    per-job driver/scheduler overhead — a 15-query batch finishes in
    one task wave at any parallelism and measures JVM constants, not
    the engine."""
    base = pd.DataFrame(QUERIES)
    reps = (n + len(base) - 1) // len(base)
    out = pd.concat([base] * reps, ignore_index=True).iloc[:n].copy()
    out["query_id"] = range(1, n + 1)
    return out
