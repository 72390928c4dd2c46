"""Phonetic keying for blocking — American Soundex.

The classic entity-resolution blocking key (names that sound alike share a
key even when spelled differently), complementing the engine's exact-stem
and LSH blocking families. The implemented variant is the official
algorithm (NARA "American Soundex"): letters only, first letter saved,
h/w are TRANSPARENT (same-code consonants separated by h/w collapse),
vowels break adjacency but emit nothing, leading code dropped unless the
name starts with h/w, pad/truncate to letter + 3 digits. Verified against
the published test vectors (Robert→R163, Tymczak→T522, Pfister→P236,
Ashcraft→A261, Honeyman→H555) in ``tests/test_similarity.py``.

``soundex_batch`` is the hot-path kernel: a per-COLUMN state machine over
the padded byte matrix — O(max_len) numpy passes across all rows at once,
no per-string Python. ``soundex_sql(col)`` renders the *identical*
algorithm as a DuckDB regexp_replace chain so queries built on the kernel
are exactly oracle-checkable.
"""

from __future__ import annotations

import numpy as np

_GROUPS: list[tuple[str, int]] = [
    ("aeiouy", 0), ("bfpv", 1), ("cgjkqsxz", 2), ("dt", 3),
    ("l", 4), ("mn", 5), ("r", 6), ("hw", 7),
]

_LUT = np.full(256, 255, np.uint8)  # 255 = not a letter
for _chars, _code in _GROUPS:
    for _ch in _chars:
        _LUT[ord(_ch)] = _code


def soundex_batch(names) -> np.ndarray:
    """American Soundex of each string (``''`` for letter-free input).

    Case-insensitive; non-letters (digits, spaces, punctuation, any
    non-ASCII byte) are stripped BEFORE coding, so they are fully
    transparent to adjacency — matching :func:`soundex_sql`.
    """
    a = np.asarray(names, dtype="U")
    n = len(a)
    if n == 0:
        return np.zeros(0, "U4")
    b = np.char.encode(np.char.lower(a), "utf-8")
    width = max(1, b.dtype.itemsize)
    mat = b.view(np.uint8).reshape(n, width)
    codes = _LUT[mat]
    is_letter = codes != 255

    rows = np.arange(n)
    first_idx = is_letter.argmax(axis=1)
    has_letter = is_letter.any(axis=1)
    first_ch = mat[rows, first_idx]
    first_is_hw = (first_ch == ord("h")) | (first_ch == ord("w"))

    prev = np.full(n, 254, np.uint8)     # last coded letter (for collapse)
    firstcoded = np.zeros(n, bool)       # emitted at least one collapsed code
    cnt = np.zeros(n, np.int64)          # digits kept so far (≤ 3)
    digits = np.full((n, 3), ord("0"), np.uint8)
    for j in range(width):
        c = codes[:, j]
        coded = (c != 255) & (c != 7)            # a letter with a code slot
        emit = coded & (c != prev)               # survives adjacent-collapse
        is_first_emit = emit & ~firstcoded
        firstcoded |= emit
        keep = emit & (c != 0) & ~(is_first_emit & ~first_is_hw)
        can = keep & (cnt < 3)
        digits[rows[can], cnt[can]] = c[can] + ord("0")
        cnt[can] += 1
        prev[coded] = c[coded]                   # h/w + non-letters: transparent

    out = np.empty((n, 4), np.uint8)
    # letter-free rows are blanked below; keep their bytes ASCII-decodable
    out[:, 0] = np.where(has_letter, first_ch - (ord("a") - ord("A")), ord("0"))
    out[:, 1:] = digits
    res = out.view("S4").reshape(n).astype("U4")
    res[~has_letter] = ""
    return res


def soundex_sql(col: str) -> str:
    """DuckDB expression computing the SAME Soundex as :func:`soundex_batch`
    (oracle mirror; parity is property-tested)."""
    e = f"regexp_replace(lower({col}), '[^a-z]', '', 'g')"
    m = f"regexp_replace({e}, '[hw]', '', 'g')"
    for chars, code in _GROUPS[:-1]:
        cls = f"[{chars}]" if len(chars) > 1 else chars
        m = f"regexp_replace({m}, '{cls}', '{code}', 'g')"
    # RE2 (DuckDB's regex engine) has no backreferences — collapse each
    # digit's runs explicitly
    for code in range(7):
        m = f"regexp_replace({m}, '{code}{code}+', '{code}', 'g')"
    first = f"substr({e}, 1, 1)"
    dropped = f"CASE WHEN {first} IN ('h','w') THEN {m} ELSE substr({m}, 2) END"
    digits = f"regexp_replace({dropped}, '0', '', 'g')"
    return (
        f"CASE WHEN {e} = '' THEN '' "
        f"ELSE upper({first}) || substr({digits} || '000', 1, 3) END"
    )
