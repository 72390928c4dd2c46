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
import pyarrow.compute as pc
import ray.data

#: Exactly the codepoints Python's ``re`` \s (== str.isspace()) matches —
#: verified exhaustively over the full codepoint range in
#: test_tagger.py::test_whitespace_lut_matches_re. Unicode's White_Space
#: property differs (it lacks 0x1c-0x1f), so Arrow's utf8_split_whitespace
#: can NOT be used: token boundaries must equal ``\S+`` finditer's.
_WS_CODEPOINTS = (
    0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
    0x85, 0xA0, 0x1680,
    0x2000, 0x2001, 0x2002, 0x2003, 0x2004, 0x2005, 0x2006, 0x2007,
    0x2008, 0x2009, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000,
)
_WS_LUT = np.zeros(0x3001, dtype=bool)
_WS_LUT[list(_WS_CODEPOINTS)] = True

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
    "load model once, stream batches" split with real state.

    ``__call__`` is fully vectorized (round-3 VERDICT ask #4): the batch is
    tokenized in ONE numpy pass over the concatenated codepoint array,
    rules run once per UNIQUE token via Arrow's RE2 ``match_substring_regex``
    (first-wins emulated by applying rules in reverse), and BIO tags /
    entity runs / per-doc joins come from numpy run detection + Arrow
    ``binary_join`` — per-ENTITY Python survives only in the (sparse) raw
    text slices. :meth:`tag_one` keeps the scalar reference path; the two
    must agree (fuzz-tested in test_tagger.py).

    RE2 caveat: a user rule RE2 cannot compile (lookarounds, backrefs)
    falls back to Python ``re`` over unique tokens automatically; a rule
    that compiles but means something different under RE2 (``\\d``/``\\w``
    are ASCII there) should be written with explicit classes (the default
    rules are) or forced scalar with ``vectorize=False``."""

    def __init__(
        self, rules: list[tuple[str, str]] | None = None, vectorize: bool = True
    ) -> None:
        raw = list(rules or DEFAULT_RULES)
        self.rules = [(name, re.compile(pat)) for name, pat in raw]
        self._rule_pats = raw
        self._vectorize = vectorize
        self._type_names = np.array(["O"] + [name for name, _ in raw])
        #: tag-string dictionary: idx 0 = "O", 1..k = B-<type>, k+1..2k = I-
        #: (BIO tags become one int-index build + one C dictionary decode —
        #: np.char.add measured at half the batch wall)
        self._tag_dict = pa.array(
            ["O"] + [f"B-{n}" for n, _ in raw] + [f"I-{n}" for n, _ in raw],
            pa.string(),
        )
        self._n_rules = len(raw)
        #: per-rule: RE2-compilable? probed once per actor
        self._re2_ok = []
        for _, pat in raw:
            try:
                pc.match_substring_regex(pa.array(["probe"]), pattern=pat)
                self._re2_ok.append(True)
            except pa.ArrowInvalid:
                self._re2_ok.append(False)

    def tag_one(self, text: str) -> tuple[list[str], list[Span], list[str]]:
        toks = token_spans(text)
        types = classify_tokens([t for t, _, _ in toks], self.rules)
        spans, flat_texts = aggregate_entities(toks, types, text)
        tags = spans_to_bio(text, spans)
        return tags, spans, flat_texts

    def _classify_unique(self, uniq: pa.Array) -> np.ndarray:
        """Type code (0='O', i+1=rule i) per unique token — first-wins via
        reverse application so earlier rules overwrite later ones."""
        codes = np.zeros(len(uniq), dtype=np.int32)
        uniq_py: list[str] | None = None
        for i in range(len(self._rule_pats) - 1, -1, -1):
            name, pat = self._rule_pats[i]
            if self._re2_ok[i]:
                m = pc.match_substring_regex(uniq, pattern=pat).to_numpy(
                    zero_copy_only=False
                )
            else:
                if uniq_py is None:
                    uniq_py = uniq.to_pylist()
                rx = self.rules[i][1]
                m = np.fromiter(
                    (rx.search(t) is not None for t in uniq_py),
                    dtype=bool, count=len(uniq_py),
                )
            codes[m] = i + 1
        return codes

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        if n_docs == 0 or not self._vectorize:
            return self._call_scalar(batch)
        texts = batch["text"].to_pylist()
        big = "\n".join(texts)  # '\n' is whitespace: tokens never span docs
        u32 = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32)
        lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
        doc_start = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=doc_start[1:])
        # --- tokenize: one mask pass (exact Python-\s semantics via LUT) ---
        is_ws = (u32 <= 0x3000) & _WS_LUT[np.minimum(u32, 0x3000)]
        nonws = ~is_ws
        starts = nonws & ~np.concatenate(([False], nonws[:-1]))
        ends = nonws & ~np.concatenate((nonws[1:], [False]))
        tok_start_abs = np.flatnonzero(starts)
        tok_end_abs = np.flatnonzero(ends) + 1
        n_tok = len(tok_start_abs)
        toks = big.split()  # same whitespace set as the LUT (str.isspace)
        assert len(toks) == n_tok, "tokenizer mask / str.split disagreement"
        doc_idx = np.searchsorted(doc_start, tok_start_abs, side="right") - 1
        tok_start = tok_start_abs - doc_start[doc_idx]
        tok_end = tok_end_abs - doc_start[doc_idx]
        # --- classify unique tokens only ---
        tok_arr = pa.array(toks, pa.string())
        d = tok_arr.dictionary_encode()
        tok_code = self._classify_unique(d.dictionary)[
            d.indices.to_numpy(zero_copy_only=False)
        ] if n_tok else np.empty(0, np.int32)
        # --- run detection: entity = maximal same-type run within a doc ---
        if n_tok:
            new_run = np.concatenate(([True], (doc_idx[1:] != doc_idx[:-1])
                                      | (tok_code[1:] != tok_code[:-1])))
        else:
            new_run = np.empty(0, bool)
        is_ent = tok_code > 0
        is_b = new_run & is_ent
        # BIO tag per token: int index into the precomputed tag dictionary,
        # decoded in one C take — no per-token string building
        tag_idx = np.where(
            is_ent, tok_code + np.where(is_b, 0, self._n_rules), 0
        ).astype(np.int32)
        tag_sarr = pa.DictionaryArray.from_arrays(
            pa.array(tag_idx), self._tag_dict
        ).cast(pa.string())
        tok_per_doc = np.bincount(doc_idx, minlength=n_docs)
        t_off = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(tok_per_doc, out=t_off[1:])
        pred = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(t_off), tag_sarr), " "
        )
        # --- entities: run starts/ends → char spans ---
        run_starts = np.flatnonzero(new_run)
        run_ends = np.concatenate((run_starts[1:], [n_tok]))
        emask = is_ent[run_starts] if n_tok else np.empty(0, bool)
        e_s, e_e = run_starts[emask], run_ends[emask]
        ent_doc = doc_idx[e_s]
        ent_type = self._type_names[tok_code[e_s]]
        ent_start = tok_start[e_s].astype(np.int32)
        ent_end = tok_end[e_e - 1].astype(np.int32)
        # sparse per-ENTITY work: raw char slice + single-space token join
        abs_s, abs_e = tok_start_abs[e_s], tok_end_abs[e_e - 1]
        ent_text = [big[a:b] for a, b in zip(abs_s.tolist(), abs_e.tolist())]
        ent_flat = [" ".join(toks[a:b]) for a, b in zip(e_s.tolist(), e_e.tolist())]
        ent_struct = pa.StructArray.from_arrays(
            [
                pa.array(ent_type, pa.string()),
                pa.array(ent_text, pa.string()),
                pa.array(ent_start, pa.int32()),
                pa.array(ent_end, pa.int32()),
            ],
            fields=list(ENTITY_TYPE),
        )
        ent_per_doc = np.bincount(ent_doc, minlength=n_docs)
        e_off = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(ent_per_doc, out=e_off[1:])
        entities = pa.ListArray.from_arrays(pa.array(e_off), ent_struct)
        flat = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(e_off),
                pa.array(
                    [f"{t}={f}" for t, f in zip(ent_type.tolist(), ent_flat)],
                    pa.string(),
                ),
            ),
            " | ",
        )
        # row merge: input columns + appended predictions (M16 analog)
        return (
            batch.select(["doc_id"])
            .append_column("pred_tags", pred)
            .append_column("n_entities", pa.array(ent_per_doc, pa.int64()))
            .append_column("entities_flat", flat)
            .append_column("entities", entities)
        )

    def _call_scalar(self, batch: pa.Table) -> pa.Table:
        """Reference scalar path (pre-round-4 behavior) — used for empty
        batches, ``vectorize=False``, and as the fuzz-test oracle."""
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
