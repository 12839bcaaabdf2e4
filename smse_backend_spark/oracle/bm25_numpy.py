"""In-repo numpy BM25 reference oracle.

The reference test suite never asserts ranking correctness (its similarity
layer is mocked with random vectors — ``tests/conftest.py:7-23`` in
``/root/reference``); this oracle supplies the golden rankings the engine is
graded against: exact BM25 (k1=1.2, b=0.75), the same tokenizer, and the
total order (score desc, doc_id asc).

Deliberately simple and single-node — it exists to be *obviously correct*,
not fast.
"""

from __future__ import annotations

import math
from collections import Counter

from smse_backend_spark import B, K1
from smse_backend_spark.functions.tokenizer import tokenize_py


def bm25_topk_py(
    docs: list[tuple[int, str]],
    query_text: str,
    k: int = 10,
    round_to: int | None = 6,
) -> list[tuple[int, float]]:
    """docs = [(doc_id, content)]; returns [(doc_id, score)] in rank order."""
    terms = sorted(set(tokenize_py(query_text)))
    if not terms or not docs:
        return []
    toks = {doc_id: tokenize_py(content) for doc_id, content in docs}
    n = float(len(docs))
    avgdl = sum(len(t) for t in toks.values()) / n
    tfs = {doc_id: Counter(t) for doc_id, t in toks.items()}
    df = {t: sum(1 for c in tfs.values() if c[t] > 0) for t in terms}
    idf = {t: math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5)) for t in terms if df[t] > 0}

    scores: dict[int, float] = {}
    for doc_id, counts in tfs.items():
        s = 0.0
        dl = float(len(toks[doc_id]))
        for t, w in idf.items():
            tf = counts.get(t, 0)
            if tf:
                s += w * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        if s > 0.0:
            # round BEFORE ranking: the engine orders by the rounded score
            # (rounded for cross-engine hash stability), so ties at the
            # rounding granularity must resolve by doc_id here too.
            scores[doc_id] = round(s, round_to) if round_to is not None else s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
