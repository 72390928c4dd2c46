"""Deterministic corpus fixtures with planted duplicate clusters.

The analog of the reference's gazetteer-consistent synthetic generators
(``data/synth/group_A2E_BIO_synth.py:313-424`` — seeded ``random.Random``,
config-driven probabilities, ground truth known by construction) and of the
goldset stratification spec (``data/goldset/goldset_1k.md:1-61``).

Generates the three tables of FIXTURES.md:

* ``corpus(repo, path, commit, lang, content)`` — planted variant classes:
  exact / whitespace / comment / rename / minor_edit duplicates, hard
  negatives, singletons, plus an optional giant hot cluster to force the
  salting path.
* ``labeled_pairs(left_id, right_id, block_key, is_match, pair_class)``.
* ``clusters_expected(row_id, cluster_id)`` — cluster_id = min raw
  ``content_sha256`` of the planted cluster.

Reproducible from ``(seed, spec)`` alone — no time, no unseeded randomness.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass, field

import pyarrow as pa

from localhost_address_matching_ray.functions.hashing import sha256_hex

_LANGS = ["python", "javascript", "java", "go", "c", "markdown"]
#: skewed lang weights (FIXTURES.md: ~45% python) to exercise hot-key handling
_LANG_WEIGHTS = [0.45, 0.20, 0.12, 0.10, 0.08, 0.05]
_EXT = {"python": "py", "javascript": "js", "java": "java", "go": "go", "c": "c", "markdown": "md"}
_COMMENT = {"python": "#", "javascript": "//", "java": "//", "go": "//", "c": "//", "markdown": ""}

_BASE_WORDS = [
    "load", "parse", "merge", "flush", "index", "batch", "shard", "token",
    "codec", "frame", "queue", "route", "cache", "chunk", "score", "probe",
]


@dataclass(frozen=True)
class CorpusSpec:
    """Probabilities follow FIXTURES.md §1 defaults."""

    n_base: int = 2000
    seed: int = 42
    p_exact: float = 0.10
    p_whitespace: float = 0.08
    p_comment: float = 0.08
    p_rename: float = 0.06
    p_minor_edit: float = 0.08
    p_hard_negative: float = 0.05
    hot_cluster_size: int = 0      # >0 plants one giant exact-dup cluster
    vocab_size: int = 4000         # big vocab → unrelated docs have low Jaccard
    min_lines: int = 8
    max_lines: int = 40
    langs: tuple[str, ...] = tuple(_LANGS)
    lang_weights: tuple[float, ...] = tuple(_LANG_WEIGHTS)


@dataclass
class _Row:
    repo: str
    path: str
    commit: str
    lang: str
    content: str
    cluster: int           # planted cluster index
    pair_class: str = "base"

    def row_id(self) -> str:
        return sha256_hex(f"{self.repo}|{self.path}|{self.commit}")[:16]


def _vocab(spec: CorpusSpec) -> list[str]:
    return [f"{_BASE_WORDS[i % len(_BASE_WORDS)]}_{i}" for i in range(spec.vocab_size)]


def _commit(rng: random.Random) -> str:
    return hashlib.sha256(str(rng.getrandbits(64)).encode()).hexdigest()[:40]


def _gen_body(rng: random.Random, vocab: list[str], lang: str, spec: CorpusSpec) -> str:
    """A code-ish document: a comment header + lines of identifier tokens.
    Token sampling is one bulk ``rng.choices`` call (the per-token
    ``rng.choice`` loop dominated generation time at bench scales)."""
    lines = []
    cm = _COMMENT[lang]
    if cm:
        lines.append(f"{cm} module {rng.choice(vocab)} generated")
    n_lines = rng.randint(spec.min_lines, spec.max_lines)
    counts = [rng.randint(4, 9) for _ in range(n_lines)]
    toks = rng.choices(vocab, k=sum(counts))
    pos = 0
    for c in counts:
        lines.append(" ".join(toks[pos:pos + c]))
        pos += c
    return "\n".join(lines) + "\n"


def _ws_variant(rng: random.Random, content: str) -> str:
    """Whitespace-only reformat: random double spaces / trailing blanks /
    extra newlines. Token stream is unchanged."""
    out = []
    for line in content.split("\n"):
        if line and rng.random() < 0.4:
            line = line.replace(" ", "  ", 1)
        if rng.random() < 0.3:
            line = line + "  "
        out.append(line)
        if rng.random() < 0.15:
            out.append("")
    return "\n".join(out)


def _comment_variant(rng: random.Random, content: str, lang: str) -> str:
    """Comment churn: add a fresh comment line near the top."""
    cm = _COMMENT[lang] or "#"
    lines = content.split("\n")
    lines.insert(1, f"{cm} reviewed rev{rng.randint(0, 9999)} checked")
    return "\n".join(lines)


def _minor_edit_variant(rng: random.Random, content: str, vocab: list[str]) -> str:
    """≤5% token edits — must still cluster (Jaccard ≥ ~0.9)."""
    toks = content.split(" ")
    n_edit = max(1, int(len(toks) * 0.04))
    for _ in range(n_edit):
        i = rng.randrange(len(toks))
        toks[i] = rng.choice(vocab)
    return " ".join(toks)


def _noise_path(rng: random.Random, path: str) -> str:
    """Rename-class path noise: case flips, '-' vs '_', vendored prefix —
    the stem canonicalizer must fold these back together."""
    p = path
    if rng.random() < 0.5:
        p = p.replace("_", "-")
    if rng.random() < 0.5:
        name = p.rsplit("/", 1)[-1]
        p = p[: len(p) - len(name)] + name.title()
    if rng.random() < 0.4:
        p = "vendor/" + p
    return p


def generate_corpus(spec: CorpusSpec = CorpusSpec()) -> dict[str, pa.Table]:
    """Build corpus + labeled_pairs + clusters_expected tables (see module doc)."""
    rng = random.Random(spec.seed)
    vocab = _vocab(spec)
    rows: list[_Row] = []
    pairs: list[tuple[_Row, _Row, bool, str]] = []
    cluster_idx = 0

    for i in range(spec.n_base):
        lang = rng.choices(spec.langs, weights=spec.lang_weights, k=1)[0]
        repo = f"org{rng.randint(0, 40)}/proj{rng.randint(0, 12)}"
        stem = f"{rng.choice(_BASE_WORDS)}_{rng.randint(0, 999)}"
        path = f"src/pkg{rng.randint(0, 9)}/{stem}.{_EXT[lang]}"
        content = _gen_body(rng, vocab, lang, spec)
        base = _Row(repo, path, _commit(rng), lang, content, cluster_idx)
        rows.append(base)

        r = rng.random()
        cum = 0.0
        variant: _Row | None = None
        for p, cls in [
            (spec.p_exact, "exact"),
            (spec.p_whitespace, "whitespace"),
            (spec.p_comment, "comment"),
            (spec.p_rename, "rename"),
            (spec.p_minor_edit, "minor_edit"),
            (spec.p_hard_negative, "hard_negative"),
        ]:
            cum += p
            if r < cum:
                if cls == "exact":
                    variant = _Row(f"fork/{repo}", path, _commit(rng), lang, content, cluster_idx, cls)
                elif cls == "whitespace":
                    variant = _Row(repo, path, _commit(rng), lang, _ws_variant(rng, content), cluster_idx, cls)
                elif cls == "comment":
                    variant = _Row(repo, path, _commit(rng), lang, _comment_variant(rng, content, lang), cluster_idx, cls)
                elif cls == "rename":
                    variant = _Row(f"mirror/{repo}", _noise_path(rng, path), _commit(rng), lang, content, cluster_idx, cls)
                elif cls == "minor_edit":
                    variant = _Row(repo, path, _commit(rng), lang, _minor_edit_variant(rng, content, vocab), cluster_idx, cls)
                else:  # hard_negative: same stem/lang/path shape, unrelated body
                    cluster_idx += 1
                    variant = _Row(
                        f"other/{repo}", path, _commit(rng), lang,
                        _gen_body(rng, vocab, lang, spec), cluster_idx, cls,
                    )
                break
        if variant is not None:
            rows.append(variant)
            is_match = variant.pair_class != "hard_negative"
            pairs.append((base, variant, is_match, variant.pair_class))
        cluster_idx += 1

    # optional giant hot cluster to force the salting path: minor-edit
    # variants (distinct content, high Jaccard) sharing one path stem, so the
    # stem block and the MinHash band blocks both blow past max_block_rows
    if spec.hot_cluster_size > 0:
        lang = "python"
        content = _gen_body(rng, vocab, lang, spec)
        stem = "hot_module"
        for j in range(spec.hot_cluster_size):
            body = content if j == 0 else _minor_edit_variant(rng, content, vocab)
            rows.append(_Row(
                f"hot/org{j % 17}", f"src/{stem}.py", _commit(rng), lang,
                body, cluster_idx, "minor_edit" if j else "base",
            ))
        pairs.append((rows[-spec.hot_cluster_size], rows[-1], True, "minor_edit"))
        cluster_idx += 1

    # random cross-cluster negatives, one per ~20 base rows
    base_rows = [x for x in rows if x.pair_class == "base"]
    for _ in range(max(4, spec.n_base // 20)):
        a, b = rng.sample(base_rows, 2)
        if a.cluster != b.cluster:
            pairs.append((a, b, False, "random_negative"))

    corpus = pa.table({
        "repo": [x.repo for x in rows],
        "path": [x.path for x in rows],
        "commit": [x.commit for x in rows],
        "lang": [x.lang for x in rows],
        "content": pa.array([x.content for x in rows], type=pa.large_string()),
    })

    # expected clusters: cluster_id = min raw content sha256 in the cluster
    by_cluster: dict[int, list[_Row]] = {}
    for x in rows:
        by_cluster.setdefault(x.cluster, []).append(x)
    cluster_id = {
        c: min(sha256_hex(x.content) for x in members)
        for c, members in by_cluster.items()
    }
    clusters_expected = pa.table({
        "row_id": [x.row_id() for x in rows],
        "cluster_id": [cluster_id[x.cluster] for x in rows],
    })

    from localhost_address_matching_ray.functions.normalize import canonicalize_path, path_stem
    labeled_pairs = pa.table({
        "left_id": [a.row_id() for a, _, _, _ in pairs],
        "right_id": [b.row_id() for _, b, _, _ in pairs],
        "block_key": [
            f"{a.lang}:{path_stem(canonicalize_path(a.path))}" for a, _, _, _ in pairs
        ],
        "is_match": [m for _, _, m, _ in pairs],
        "pair_class": [c for _, _, _, c in pairs],
    })
    return {
        "corpus": corpus,
        "labeled_pairs": labeled_pairs,
        "clusters_expected": clusters_expected,
    }


def corpus_stats(tables: dict[str, pa.Table]) -> dict[str, float]:
    """Distribution sanity (FIXTURES.md §6 / ``compute_stats`` analog,
    ``generate_A2E_BIO_synth.py:67-274``): class rates and lang skew.
    Benchmarks should refuse to run if these drift from the spec."""
    lp = tables["labeled_pairs"].to_pydict()
    corpus = tables["corpus"].to_pydict()
    n = len(corpus["repo"])
    from collections import Counter
    classes = Counter(lp["pair_class"])
    langs = Counter(corpus["lang"])
    stats: dict[str, float] = {f"pair_class_{k}": v / max(1, len(lp["pair_class"])) for k, v in classes.items()}
    stats.update({f"lang_{k}": v / n for k, v in langs.items()})
    stats["n_rows"] = float(n)
    stats["n_pairs"] = float(len(lp["pair_class"]))
    return stats
