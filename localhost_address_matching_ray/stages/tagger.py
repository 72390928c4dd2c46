"""Deterministic rule-based entity tagger — the NER-stage analog with real
span machinery.

Reference shape (``src/address_matching/parsing/ner_address_parser.py``):
load the model once per worker (``load_pipeline`` :44-49), stream batches,
convert entity char-spans to BIO tags over whitespace tokens
(``spans_to_bio`` :63-78), aggregate spans (``aggregate_entities`` :80-87),
flatten to a display column (``join_entities_flat`` :89-98), and append the
derived columns to the input rows (:197-202).

Here the "model" is a compiled, ordered regex rule set (deterministic — no
weights in the sandbox), held in actor state and applied per batch by an
actor pool (``map_batches(EntityTagger, concurrency=N)``) — the A1 pattern
with real, non-stub state. The span→BIO step is a genuine char-overlap join
of entity spans onto whitespace tokens (M13), entity aggregation sorts and
slices by offsets (M14), and the flat projection groups by type order of
appearance (M15).

Every output column is SQL-reproducible (see ``pipelines/queries.py``
``doc_entity_tags``); the nested ``entities`` column (native Arrow
``list<struct>``) is rows-only checked.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

#: ordered, first-wins token classification rules — (type, pattern). The
#: CASE-expression mirror lives in the doc_entity_tags oracle SQL; keep both
#: in sync.
DEFAULT_RULES: list[tuple[str, str]] = [
    ("NUM", r"^[0-9]+$"),
    ("URL", r"^https?://"),
    ("EMAIL", r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
    ("CONST", r"^[A-Z][A-Z0-9_]{2,}$"),
    ("CAMEL", r"^[a-z]+([A-Z][a-z0-9]*)+$"),
]

_TOKEN_RE = re.compile(r"\S+")

ENTITY_TYPE = pa.struct([
    ("type", pa.string()), ("text", pa.string()),
    ("start", pa.int32()), ("end", pa.int32()),
])


@dataclass(frozen=True)
class Span:
    type: str
    text: str
    start: int
    end: int


def token_spans(text: str) -> list[tuple[str, int, int]]:
    """Whitespace tokens + char offsets (``ner_address_parser.py:53-61``)."""
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def classify_tokens(
    tokens: list[str], rules: list[tuple[str, re.Pattern]]
) -> list[str]:
    """First-wins rule match per token; 'O' when nothing matches."""
    out = []
    for tok in tokens:
        t = "O"
        for name, rx in rules:
            if rx.search(tok):
                t = name
                break
        out.append(t)
    return out


def aggregate_entities(
    toks: list[tuple[str, int, int]], types: list[str], text: str
) -> tuple[list[Span], list[str]]:
    """Merge consecutive same-type tokens into entity char spans, sorted by
    start, text sliced from the original (``aggregate_entities`` analog:
    sort by start, slice by offsets). Also returns each entity's
    single-space token join — the whitespace-normalized form the flat
    projection (and its SQL oracle's ``string_agg(tok, ' ')``) uses, which
    differs from the raw slice when tokens are separated by runs of
    whitespace."""
    spans: list[Span] = []
    flat_texts: list[str] = []
    i = 0
    n = len(toks)
    while i < n:
        t = types[i]
        if t == "O":
            i += 1
            continue
        j = i
        while j + 1 < n and types[j + 1] == t:
            j += 1
        start, end = toks[i][1], toks[j][2]
        spans.append(Span(t, text[start:end], start, end))
        flat_texts.append(" ".join(tk for tk, _, _ in toks[i : j + 1]))
        i = j + 1
    return spans, flat_texts


def spans_to_bio(text: str, spans: list[Span]) -> list[str]:
    """Char-overlap join of entity spans onto whitespace tokens, emitting
    B-/I- tags — the reference's exact alignment algorithm
    (``ner_address_parser.py:63-78``): a token starting at or before a span's
    start that overlaps it gets B-, subsequent overlapping tokens get I-."""
    toks = token_spans(text)
    tags = ["O"] * len(toks)
    spans = sorted(spans, key=lambda s: s.start)
    si = 0
    for ti, (_, ts, te) in enumerate(toks):
        while si < len(spans) and spans[si].end <= ts:
            si += 1
        if si >= len(spans):
            break
        sp = spans[si]
        if ts < sp.end and te > sp.start:  # overlap
            tags[ti] = ("B-" if ts <= sp.start else "I-") + sp.type
    return tags


def join_entities_flat(spans: list[Span], flat_texts: list[str]) -> str:
    """``TYPE=text | TYPE=text`` in order of appearance
    (``join_entities_flat`` analog); text is the single-space token join."""
    return " | ".join(f"{s.type}={ft}" for s, ft in zip(spans, flat_texts))


class EntityTagger:
    """Callable-class actor: compiled rule set built once per actor
    (``__init__``), batches tagged in ``__call__`` — the reference's
    "load model once, stream batches" split with real state."""

    def __init__(self, rules: list[tuple[str, str]] | None = None) -> None:
        self.rules = [
            (name, re.compile(pat)) for name, pat in (rules or DEFAULT_RULES)
        ]

    def tag_one(self, text: str) -> tuple[list[str], list[Span], list[str]]:
        toks = token_spans(text)
        types = classify_tokens([t for t, _, _ in toks], self.rules)
        spans, flat_texts = aggregate_entities(toks, types, text)
        tags = spans_to_bio(text, spans)
        return tags, spans, flat_texts

    def __call__(self, batch: pa.Table) -> pa.Table:
        pred, n_ent, flat, ents = [], [], [], []
        for text in batch["text"].to_pylist():
            tags, spans, flat_texts = self.tag_one(text)
            pred.append(" ".join(tags))
            n_ent.append(len(spans))
            flat.append(join_entities_flat(spans, flat_texts))
            ents.append([
                {"type": s.type, "text": s.text, "start": s.start, "end": s.end}
                for s in spans
            ])
        # row merge: input columns + appended predictions (M16 analog)
        return (
            batch.select(["doc_id"])
            .append_column("pred_tags", pa.array(pred, pa.string()))
            .append_column("n_entities", pa.array(np.asarray(n_ent, np.int64), pa.int64()))
            .append_column("entities_flat", pa.array(flat, pa.string()))
            .append_column("entities", pa.array(ents, pa.list_(ENTITY_TYPE)))
        )


def with_input_order(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Enable order-preserving execution for this dataset: Ray's streaming
    executor reorders block completion by default; with this flag the
    output rows come back in input order — the reference CLI's contract
    (``ner_address_parser.py:211-212`` writes predictions aligned to input
    rows). Costs pipeline flexibility (a slow block stalls its successors),
    so it is opt-in; map-only lineages keep intra-block order either way."""
    ds.context.execution_options.preserve_order = True
    return ds


def tag_documents(
    docs: ray.data.Dataset,
    rules: list[tuple[str, str]] | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 1024,
    preserve_order: bool = False,
) -> ray.data.Dataset:
    """Actor-pool tagging stage: ``docs`` needs (doc_id, text); appends
    pred_tags / n_entities / entities_flat / entities. With
    ``preserve_order`` the output row order equals the input row order
    (see :func:`with_input_order`)."""
    out = docs.map_batches(
        EntityTagger,
        fn_constructor_args=(rules,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return with_input_order(out) if preserve_order else out
