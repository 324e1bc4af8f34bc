"""Pure-pandas multinomial NB oracle — identical spec to `nb.py`
(FIXTURES.md F6: engine must match 100% of labels; k-fold mean accuracy
to 1e-12)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

from ..analyzer.chain import Analyzer

ALPHA = 1.0


def train_oracle(rows: list[dict], text_cols: list[str], label_col: str,
                 analyzer: Analyzer, alpha: float = ALPHA) -> dict:
    labeled = [r for r in rows if r.get(label_col) not in (None, "")]
    term_counts: dict[str, Counter] = defaultdict(Counter)
    doc_counts: Counter = Counter()
    for r in labeled:
        toks = analyzer.tokenize_fields(*[r.get(c) for c in text_cols])
        c = r[label_col]
        doc_counts[c] += 1
        term_counts[c].update(toks)
    vocab = set()
    for c in term_counts:
        vocab.update(term_counts[c])
    v = len(vocab)
    n = len(labeled)
    model = {"vocab": vocab, "classes": {}}
    for c in sorted(doc_counts):
        total = sum(term_counts[c].values())
        model["classes"][c] = {
            "log_prior": math.log(doc_counts[c] / n),
            "default_ll": math.log(alpha / (total + alpha * v)),
            "ll": {
                t: math.log((cnt + alpha) / (total + alpha * v))
                for t, cnt in term_counts[c].items()
            },
        }
    return model


def predict_oracle(model: dict, rows: list[dict], text_cols: list[str],
                   analyzer: Analyzer, id_col: str = "id") -> pd.DataFrame:
    out = []
    vocab = model["vocab"]
    for r in rows:
        toks = [
            t for t in analyzer.tokenize_fields(*[r.get(c) for c in text_cols])
            if t in vocab
        ]
        counts = Counter(toks)
        best_c, best_s = None, None
        for c in sorted(model["classes"]):
            m = model["classes"][c]
            s = m["log_prior"]
            for t, cnt in counts.items():
                s += cnt * m["ll"].get(t, m["default_ll"])
            if best_s is None or s > best_s:
                best_c, best_s = c, s
        out.append({id_col: r[id_col], "prediction": best_c, "score": best_s})
    return pd.DataFrame(out)
