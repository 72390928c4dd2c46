"""Normalization kernels — the code-corpus analog of the reference's
normalizer chain (``src/address_matching/normalization/normalize_address.py``).

Reference → ours:

* ``pre_normalize`` (NFKC + whitespace smoothing, ``normalize_address.py:128-136``)
  → :func:`normalize_content` (NFC + whitespace run collapse + trim).
* ``normalize_static_parser`` — the *join-key* normalization with ASCII fold
  (``normalize_address.py:240-268``) → :func:`canonicalize_path` /
  :func:`path_stem` — the blocking-key canonicalizer.
* abbreviation canonicalization (``mah./mh./mahallesi → mah``,
  ``normalize_address.py:52-108``) → separator folding in paths
  (``-``/space → ``_``) so renamed-path copies share a stem.
* idempotence property (``normalize_address.py:290-296``) → every function
  here satisfies ``f(f(x)) == f(x)``; tested in ``tests/test_normalize.py``.

Each kernel documents its exact DuckDB-SQL equivalent so the driver's oracle
comparison is byte-identical.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

_WS_RUN = re.compile(r"\s+")
_SLASH_RUN = re.compile(r"/+")
_SEP_FOLD = re.compile(r"[-\s]+")
_NON_STEM = re.compile(r"[^a-z0-9_]+")


def normalize_content(text: str) -> str:
    """Whitespace-insensitive content canonical form.

    NFC-normalize, collapse every whitespace run to a single space, trim.
    SQL equivalent: ``trim(regexp_replace(nfc_normalize(content), '\\s+', ' ', 'g'))``.
    Idempotent.
    """
    return _WS_RUN.sub(" ", unicodedata.normalize("NFC", text)).strip()


def normalize_content_array(texts) -> list[str]:
    """Vectorized :func:`normalize_content` over any string sequence."""
    sub, norm = _WS_RUN.sub, unicodedata.normalize
    return [sub(" ", norm("NFC", t)).strip() for t in texts]


#: ASCII members of Python-re ``\s`` — the only ones an ASCII row can contain
_ASCII_WS_PAT = "[\\t\\n\\x0b\\x0c\\r\\x1c-\\x1f ]+"

def _has_c_controls(arr) -> bool:
    """Does ANY value carry a byte in \\x1c-\\x1f? One numpy range-compare
    over the raw value buffer (~25× cheaper than substring scans). These
    four separators are in Python-``\\s`` (the scalar spec) but NOT in
    Arrow's ``ascii_split_whitespace`` class, so an array carrying them
    must take the RE2 path. Returns True (= be conservative) for
    non-string layouts."""
    import pyarrow as pa

    if pa.types.is_string(arr.type):
        off_t = np.int32
    elif pa.types.is_large_string(arr.type):
        off_t = np.int64
    else:
        return True
    bufs = arr.buffers()
    if bufs[2] is None:
        return False
    offs = np.frombuffer(bufs[1], off_t)
    lo = int(offs[arr.offset])
    hi = int(offs[arr.offset + len(arr)])
    nb = np.frombuffer(bufs[2], np.uint8)[lo:hi]
    return bool(((nb >= 28) & (nb <= 31)).any())


def _split_join_collapse(arr):
    """Whitespace collapse + trim via Arrow's NON-regex kernels:
    ``ascii_split_whitespace`` emits one part per token (empty parts only
    at the row edges), ``binary_join(…, ' ')`` + ``utf8_trim`` rebuild the
    collapsed string — measured ~2.8× faster than the RE2 global
    substitution on code text. Exact for rows without \\x1c-\\x1f (the
    caller routes those rows elsewhere)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    parts = pc.ascii_split_whitespace(arr)
    sep = pa.scalar(" ", pa.large_string()) if pa.types.is_large_string(arr.type) else " "
    return pc.utf8_trim(pc.binary_join(parts, sep), characters=" ")


def normalize_content_arrow(arr):
    """:func:`normalize_content` over an Arrow string array, bit-identical.

    ASCII rows (the overwhelming majority of a code corpus) run entirely in
    C — NFC is the identity on ASCII, so only the whitespace collapse +
    trim remain, executed by the non-regex split+join kernels
    (:func:`_split_join_collapse`). Rows carrying \\x1c-\\x1f (in
    Python-``\\s`` but not Arrow's ascii whitespace class) take the RE2
    substitution; non-ASCII rows fall back to the scalar kernel per row
    (pyarrow's ``utf8_normalize`` cannot be used: as of 16.x it fails to
    COMPOSE — NFC('e'+U+0301) stays decomposed). Parity is property-tested
    in ``tests/test_normalize.py``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    is_ascii = pc.string_is_ascii(arr)
    if _has_c_controls(arr):
        fast = pc.utf8_trim(
            pc.replace_substring_regex(arr, pattern=_ASCII_WS_PAT, replacement=" "),
            characters=" ",
        )
    else:
        fast = _split_join_collapse(arr)
    if pc.all(is_ascii).as_py():
        return fast
    mask = np.asarray(is_ascii.to_numpy(zero_copy_only=False), dtype=bool)
    slow_idx = np.flatnonzero(~mask)
    slow_vals = normalize_content_array(arr.take(pa.array(slow_idx)).to_pylist())
    out = fast.to_pylist()
    for i, v in zip(slow_idx, slow_vals):
        out[i] = v
    return pa.array(out, pa.string())


def strip_comments_arrow(arr, comment_styles):
    """:func:`strip_comments` over an Arrow string array, bit-identical
    (RE2 ``(?s)`` == Python ``re.S``; the line patterns are shared)."""
    import pyarrow.compute as pc

    if "/*" in comment_styles:
        arr = pc.replace_substring_regex(arr, pattern=r"(?s)/\*.*?\*/", replacement=" ")
    for style in comment_styles:
        if style == "#":
            arr = pc.replace_substring_regex(arr, pattern=r"#[^\n]*", replacement=" ")
        elif style == "//":
            arr = pc.replace_substring_regex(arr, pattern=r"//[^\n]*", replacement=" ")
    return arr


def canonicalize_path(path: str) -> str:
    """Canonical repo path: NFC, lowercase, ``\\`` → ``/``, collapse ``//``,
    strip leading ``./`` and ``/``, trim.

    SQL equivalent:
    ``regexp_replace(regexp_replace(lower(nfc_normalize(p)), '\\\\', '/', 'g'), '/+', '/', 'g')``
    then ``regexp_replace(..., '^(\\./)+|^/+', '')``. Idempotent.
    """
    p = unicodedata.normalize("NFC", path).lower().replace("\\", "/")
    p = _SLASH_RUN.sub("/", p).strip()
    p = re.sub(r"^(\./)+", "", p)
    return p.lstrip("/")


def canonicalize_path_array(paths) -> list[str]:
    return [canonicalize_path(p) for p in paths]


def path_stem(canonical_path: str) -> str:
    """Blocking stem of an already-canonical path: final component, extension
    dropped, ``-``/space folded to ``_``, non ``[a-z0-9_]`` stripped.

    The ``mah/mh/mahallesi → mah`` analog: renamed copies
    (``Foo-Bar.py`` / ``foo_bar.py``) share the stem ``foo_bar``.
    SQL equivalent (on the canonical path):
    ``regexp_replace(regexp_replace(regexp_replace(p, '^.*/', ''), '\\.[^.]*$', ''), '[^a-z0-9_]+', '_', 'g')``
    — note SQL folds every non-stem char to ``_`` in one pass, so this
    function does the same. Idempotent.
    """
    name = canonical_path.rsplit("/", 1)[-1]
    dot = name.rfind(".")
    if dot > 0:
        name = name[:dot]
    return _NON_STEM.sub("_", name)


def path_stem_array(canonical_paths) -> list[str]:
    return [path_stem(p) for p in canonical_paths]


def tokenize(normalized_content: str) -> list[str]:
    """Whitespace tokens of an already-normalized content string
    (``static_parser.py:60-61`` analog). SQL: ``string_split(c, ' ')``."""
    return normalized_content.split(" ") if normalized_content else []


def strip_stop_tokens(tokens: list[str], stop: frozenset[str]) -> list[str]:
    """Drop per-lang stop tokens before shingling — the standalone-``mah``
    strip analog (``data/ptt_data/map.py:211-215``)."""
    return [t for t in tokens if t not in stop]


def strip_comments(text: str, comment_styles: tuple[str, ...]) -> str:
    """Remove line comments / block comments for the given per-lang styles.

    Supports ``#``, ``//`` (to end of line) and ``/*`` (to matching ``*/``).
    Deliberately simple (no string-literal awareness) — deterministic and
    cheap; used for the comment-insensitive near-dup variant only.
    """
    if "/*" in comment_styles:
        text = re.sub(r"/\*.*?\*/", " ", text, flags=re.S)
    for style in comment_styles:
        if style == "#":
            text = re.sub(r"#[^\n]*", " ", text)
        elif style == "//":
            text = re.sub(r"//[^\n]*", " ", text)
    return text


def token_count_array(texts) -> np.ndarray:
    """Token counts via the same whitespace rule as :func:`normalize_content`.
    SQL: ``len(string_split(trim(regexp_replace(text,'\\s+',' ','g')), ' '))``
    (with empty → 0)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        n = normalize_content(t)
        out[i] = len(n.split(" ")) if n else 0
    return out
