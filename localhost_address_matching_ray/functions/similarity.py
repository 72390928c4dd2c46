"""Similarity kernels for in-block pair scoring.

The reference's matching layer is a stub (``matching/__init__.py``, 0 bytes);
its closest analogs are longest-match ranking (``static_parser.py:139-147``)
and suffix-variant resolution (``test/test_static_parser.py:73-87``). Per the
north_rule we implement real pairwise kernels: token-set Jaccard,
Levenshtein, Jaro-Winkler, MinHash-estimated Jaccard, cosine.

Definitions deliberately match DuckDB 1.0 builtins so oracle SQL can
reproduce values bit-for-bit (integer-derived divisions) or to 6 decimals
(accumulation-order-sensitive ones).
"""

from __future__ import annotations

import numpy as np


def duckdb_round(x, decimals: int):
    """DuckDB ``round(x, d)`` semantics for DOUBLE: ``std::round(x·10^d)/10^d``
    (half away from zero). Arrow's ``pc.round`` and ``np.round`` use
    different scaling/tie rules and produce different last-ulp doubles —
    every oracle-compared float goes through THIS helper on the Ray side."""
    p = 10.0 ** decimals
    x = np.asarray(x, dtype=np.float64)
    return np.trunc(x * p + np.copysign(0.5, x)) / p


def token_set_jaccard(tokens_a: list[str], tokens_b: list[str]) -> float:
    """|A∩B| / |A∪B| over distinct tokens. SQL equivalent:
    ``len(list_intersect(ta, tb)) / len(list_distinct(ta || tb))``
    — both sides are exact IEEE divisions of the same ints."""
    sa, sb = set(tokens_a), set(tokens_b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def levenshtein(s: str, t: str) -> int:
    """Classic edit distance (insert/delete/substitute, unit costs) over
    CODEPOINTS. DuckDB ``levenshtein(s, t)`` edits UTF-8 BYTES, so the two
    agree on ASCII only — ``levenshtein_batch(unit="byte")`` is the
    DuckDB-exact kernel."""
    if s == t:
        return 0
    if not s:
        return len(t)
    if not t:
        return len(s)
    if len(s) > len(t):
        s, t = t, s
    prev = list(range(len(s) + 1))
    for j, tc in enumerate(t, 1):
        cur = [j]
        for i, sc in enumerate(s, 1):
            cur.append(min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (sc != tc)))
        prev = cur
    return prev[-1]


def levenshtein_batch(a, b, unit: str = "byte") -> np.ndarray:
    """Edit distance for N string pairs at once — the vectorized kernel the
    fuzzy-verify stage runs inside ``map_batches``.

    ``unit="byte"`` (default) edits UTF-8 bytes — bit-identical to DuckDB
    ``levenshtein``, which is byte-level (``levenshtein('é','e') = 2``), so
    oracle queries compare exactly on any input. ``unit="codepoint"``
    matches the scalar ``levenshtein`` above on non-ASCII text (the two
    agree on ASCII).

    Wagner-Fischer with the column loop vectorized across BOTH the pair axis
    and the row axis: for column ``j`` let ``t[i] = min(prev[i]+1,
    prev[i-1]+cost_i)``; the remaining in-row dependency
    ``cur[i] = min(t[i], cur[i-1]+1)`` telescopes to
    ``cur[i] = i + cummin(t[k]-k)``, one ``np.minimum.accumulate`` per
    column. Total work O(max_len(b) · N · max_len(a)) numpy cells with no
    per-pair Python. Padding needs no sentinel: the cell read for pair ``p``
    is ``(la_p, lb_p)`` and depends only on real characters of both strings.
    """
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, np.int64)
    if unit == "byte":
        a = np.char.encode(a, "utf-8")
        b = np.char.encode(b, "utf-8")
        view_t = np.uint8
    elif unit == "codepoint":
        view_t = np.uint32
    else:
        raise ValueError(f"unit must be 'byte' or 'codepoint', got {unit!r}")
    la = np.char.str_len(a)
    lb = np.char.str_len(b)
    ma = max(1, int(la.max()))
    mb = max(1, int(lb.max()))
    kind = a.dtype.kind  # 'S' after encode, 'U' otherwise
    codes_a = (
        a.astype(f"{kind}{ma}").view(view_t).reshape(n, ma)
    )
    codes_b = (
        b.astype(f"{kind}{mb}").view(view_t).reshape(n, mb)
    )
    out = np.where(lb == 0, la, 0).astype(np.int64)
    idx = np.arange(ma + 1, dtype=np.int32)
    prev = np.broadcast_to(idx, (n, ma + 1)).copy()
    rows = np.arange(n)
    t = np.empty_like(prev)
    for j in range(1, mb + 1):
        cost = (codes_a != codes_b[:, j - 1 : j]).astype(np.int32)
        t[:, 0] = j
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=t[:, 1:])
        cur = np.minimum.accumulate(t - idx, axis=1)
        cur += idx
        done = lb == j
        if done.any():
            out[done] = cur[rows[done], la[done]]
        prev, t = cur, prev
    return out


def jaro(s: str, t: str) -> float:
    """Jaro similarity (match window floor(max/2)−1, half-transpositions)."""
    if s == t:
        return 1.0
    ls, lt = len(s), len(t)
    if ls == 0 or lt == 0:
        return 0.0
    window = max(ls, lt) // 2 - 1
    s_match = [False] * ls
    t_match = [False] * lt
    m = 0
    for i, c in enumerate(s):
        lo, hi = max(0, i - window), min(lt, i + window + 1)
        for j in range(lo, hi):
            if not t_match[j] and t[j] == c:
                s_match[i] = t_match[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    k = trans = 0
    for i in range(ls):
        if s_match[i]:
            while not t_match[k]:
                k += 1
            if s[i] != t[k]:
                trans += 1
            k += 1
    trans //= 2
    return (m / ls + m / lt + (m - trans) / m) / 3.0


def jaro_winkler(s: str, t: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler (common-prefix boost ≤ 4 chars) — DuckDB
    ``jaro_winkler_similarity`` semantics. Compare rounded to 6 decimals in
    oracle queries (accumulation order can differ in the last ulp)."""
    j = jaro(s, t)
    prefix = 0
    for a, b in zip(s[:4], t[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def char_jaccard(s: str, t: str) -> float:
    """Character-set Jaccard — DuckDB ``jaccard(s, t)`` semantics."""
    sa, sb = set(s), set(t)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def cosine_topk(
    queries: np.ndarray, corpus: np.ndarray, k: int, round_decimals: int = 6
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Brute-force cosine top-k of each query row against a corpus batch.

    Returns (query_idx, corpus_idx, score) flattened arrays, scores rounded
    to ``round_decimals`` so ranking ties resolve identically to the DuckDB
    oracle (which also ranks on the rounded value). All float64 matmul.
    """
    nq_ = np.sqrt((queries * queries).sum(axis=1))
    nc_ = np.sqrt((corpus * corpus).sum(axis=1))
    sims = duckdb_round((queries @ corpus.T) / (nq_[:, None] * nc_[None, :]), round_decimals)
    k = min(k, sims.shape[1])
    # stable top-k: sort by (-score, corpus_idx)
    order = np.lexsort((np.arange(sims.shape[1])[None, :].repeat(len(sims), 0), -sims), axis=1)
    top = order[:, :k]
    qi = np.repeat(np.arange(len(sims)), k)
    ci = top.ravel()
    return qi, ci, sims[qi, ci]


def jaro_batch(a, b, unit: str = "byte") -> np.ndarray:
    """Jaro similarity for N string pairs at once — vectorized across the
    pair axis like ``levenshtein_batch``.

    ``unit="byte"`` is bit-identical to DuckDB ``jaro_similarity``, which
    matches UTF-8 BYTES (``jaro('é','e')`` treats 'é' as two symbols) and
    returns 0.0 when either side is empty (even ``('','')``). The matching
    loop runs over the columns of the shorter-padded matrix: for source
    position ``i`` every pair finds its FIRST unmatched target byte inside
    the Jaro window (one eligible-mask + argmax per column, no per-pair
    Python); half-transpositions come from one scatter-gather of the
    matched symbols. Work is O(max_len(a) · N · max_len(b)) numpy cells.
    """
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, np.float64)
    if unit == "byte":
        a = np.char.encode(a, "utf-8")
        b = np.char.encode(b, "utf-8")
        view_t = np.uint8
    elif unit == "codepoint":
        view_t = np.uint32
    else:
        raise ValueError(f"unit must be 'byte' or 'codepoint', got {unit!r}")
    la = np.char.str_len(a).astype(np.int64)
    lb = np.char.str_len(b).astype(np.int64)
    ma = max(1, int(la.max()))
    mb = max(1, int(lb.max()))
    kind = a.dtype.kind  # 'S' after encode, 'U' otherwise
    codes_a = a.astype(f"{kind}{ma}").view(view_t).reshape(n, ma)
    codes_b = b.astype(f"{kind}{mb}").view(view_t).reshape(n, mb)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jb = np.arange(mb, dtype=np.int64)
    s_match = np.zeros((n, ma), dtype=bool)
    t_match = np.zeros((n, mb), dtype=bool)
    rows = np.arange(n)
    for i in range(ma):
        lo = np.maximum(i - window, 0)[:, None]
        hi = np.minimum(lb, i + window + 1)[:, None]
        elig = (jb >= lo) & (jb < hi) & ~t_match
        elig &= codes_b == codes_a[:, i : i + 1]
        elig &= (la > i)[:, None]
        hit = elig.any(axis=1)
        s_match[:, i] = hit
        t_match[rows[hit], elig.argmax(axis=1)[hit]] = True
    m = s_match.sum(axis=1).astype(np.int64)
    mm = max(1, int(m.max()))
    # gather matched symbols of each side in order into an (n, mm) pad;
    # positions past m stay 0 on BOTH sides so they never count as mismatch
    sm = np.zeros((n, mm), dtype=view_t)
    tm = np.zeros((n, mm), dtype=view_t)
    rs, cs = np.nonzero(s_match)
    sm[rs, (np.cumsum(s_match, axis=1) - 1)[rs, cs]] = codes_a[rs, cs]
    rt, ct = np.nonzero(t_match)
    tm[rt, (np.cumsum(t_match, axis=1) - 1)[rt, ct]] = codes_b[rt, ct]
    trans = (sm != tm).sum(axis=1) // 2
    mf = m.astype(np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        j = (mf / la + mf / lb + (mf - trans) / mf) / 3.0
    return np.where(m == 0, 0.0, j)


def jaro_winkler_batch(
    a,
    b,
    unit: str = "byte",
    prefix_weight: float = 0.1,
    boost_threshold: float = 0.7,
) -> np.ndarray:
    """Jaro-Winkler for N pairs — bit-identical to DuckDB
    ``jaro_winkler_similarity`` at the defaults (byte symbols, prefix bonus
    capped at 4 symbols and applied only when jaro > 0.7, empty side → 0.0;
    property-tested pair-for-pair in ``test_similarity.py``). The scalar
    ``jaro_winkler`` above keeps the unthresholded variant the flagship
    stem assist uses."""
    j = jaro_batch(a, b, unit=unit)
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    n = len(a)
    if n == 0:
        return j
    if unit == "byte":
        a = np.char.encode(a, "utf-8")
        b = np.char.encode(b, "utf-8")
        view_t = np.uint8
    else:
        view_t = np.uint32
    la = np.char.str_len(a).astype(np.int64)
    lb = np.char.str_len(b).astype(np.int64)
    pw = min(4, max(1, int(la.max())), max(1, int(lb.max())))
    kind = a.dtype.kind
    pa_ = a.astype(f"{kind}{pw}").view(view_t).reshape(n, -1)[:, :pw]
    pb_ = b.astype(f"{kind}{pw}").view(view_t).reshape(n, -1)[:, :pw]
    eq = (pa_ == pb_) & (np.arange(pw) < np.minimum(la, lb)[:, None])
    prefix = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    return np.where(j > boost_threshold, j + prefix * prefix_weight * (1.0 - j), j)
