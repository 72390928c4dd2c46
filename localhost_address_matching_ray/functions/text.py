"""Text-analysis kernels for the training-data-pipeline operators:
language-ID heuristic, quality scoring, token counting, fingerprints.

These run over the ``documents`` table (``doc_id, text, lang, source,
n_chars``). Every rule is deterministic and (where noted) expressible in
DuckDB SQL so the driver's oracle can verify values exactly.
"""

from __future__ import annotations

import re

import numpy as np

from localhost_address_matching_ray.functions.normalize import normalize_content

#: Marker stopword sets per language, ordered — argmax with first-wins
#: tie-break on this order. Chosen to be tiny so the SQL oracle can encode
#: the identical rule as CASE/greatest expressions.
LANG_MARKERS: list[tuple[str, frozenset[str]]] = [
    ("en", frozenset({"the", "a", "of", "and", "to"})),
    ("de", frozenset({"der", "die", "das", "und", "nicht"})),
    ("fr", frozenset({"le", "la", "et", "les", "des"})),
    ("es", frozenset({"el", "los", "las", "que", "y"})),
    ("zh", frozenset({"de", "shi", "bu", "le", "zai"})),
]

#: English-ish stopwords for the quality stopword-ratio feature.
QUALITY_STOPWORDS = frozenset({"the", "a", "of", "and", "to", "in", "is", "it"})

_BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_PUNCT = re.compile(r"[^\w\s]")


def predict_lang(tokens: list[str]) -> str:
    """Deterministic marker-count language ID: the lang with the most marker
    hits wins; ties (incl. all-zero) resolve to the earliest lang in
    LANG_MARKERS order. SQL-expressible as nested CASE on per-set counts."""
    best_lang, best_count = LANG_MARKERS[0][0], -1
    for lang, markers in LANG_MARKERS:
        c = sum(1 for t in tokens if t in markers)
        if c > best_count:
            best_lang, best_count = lang, c
    return best_lang


def stopword_ratio(tokens: list[str]) -> float:
    """Fraction of tokens in QUALITY_STOPWORDS; 0.0 for empty docs.
    Exact int/int division → SQL-identical doubles."""
    if not tokens:
        return 0.0
    return sum(1 for t in tokens if t in QUALITY_STOPWORDS) / len(tokens)


def bpe_ish_token_count(text: str) -> int:
    """Count of BPE-ish tokens: letter runs, digit runs, single punctuation.
    SQL: ``len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))``."""
    return len(_BPE_ISH.findall(text))


def punct_count(text: str) -> int:
    """Count of punctuation chars (non-word, non-space).
    SQL: ``length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))``."""
    return len(_PUNCT.findall(text))


def quality_features(texts) -> dict[str, np.ndarray]:
    """Vectorized per-doc quality features with SQL-identical semantics.

    Returns columns: n_tokens, n_chars_norm, mean_token_len, stop_ratio,
    punct_cnt, bpe_tokens, pred_lang, keep (the filter decision).
    """
    n = len(texts)
    n_tokens = np.empty(n, dtype=np.int64)
    n_chars_norm = np.empty(n, dtype=np.int64)
    mean_token_len = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    punct_cnt = np.empty(n, dtype=np.int64)
    bpe_tokens = np.empty(n, dtype=np.int64)
    pred_lang: list[str] = []
    for i, t in enumerate(texts):
        norm = normalize_content(t)
        toks = norm.split(" ") if norm else []
        nt = len(toks)
        n_tokens[i] = nt
        nc = len(norm) - (nt - 1 if nt > 1 else 0)  # chars excluding separators
        n_chars_norm[i] = nc
        mean_token_len[i] = nc / nt if nt else 0.0
        stop_ratio[i] = stopword_ratio(toks)
        punct_cnt[i] = punct_count(t)
        bpe_tokens[i] = bpe_ish_token_count(t)
        pred_lang.append(predict_lang(toks))
    keep = (n_tokens >= 5) & (n_tokens <= 100_000) & (stop_ratio <= 0.6)
    return {
        "n_tokens": n_tokens,
        "n_chars_norm": n_chars_norm,
        "mean_token_len": mean_token_len,
        "stop_ratio": stop_ratio,
        "punct_cnt": punct_cnt,
        "bpe_tokens": bpe_tokens,
        "pred_lang": pred_lang,
        "keep": keep,
    }
