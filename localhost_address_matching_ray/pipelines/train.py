"""Distributed training analog: induce tagger rules from labeled tokens.

The reference's lifecycle is data factory → TRAINING → evaluation
(``SURVEY.md §3.3``: synthetic corpus → fine-tune the NER model → seqeval);
our engine already had the factory (``fixtures``) and the evaluation
(``pipelines/eval``) — this module is the training third.  With no weights
in the sandbox, the "model" is the tagger's gazetteer: a vocabulary of
(token → entity type) learned from a labeled corpus, compiled into the
ordered regex rule set ``stages/tagger.EntityTagger`` already consumes.

The fit is a real distributed aggregation, not a driver loop: per-batch
Arrow hash group-by combiners count (token, type) pairs (the shuffle
carries vocabulary, never token occurrences), one vocabulary-keyed
``groupby`` merges partials, and a per-token purity vote picks the
dominant type.  Only the thresholded vocabulary — the model artifact, the
analog of the reference's trained weights — is collected on the driver,
with a stated per-type ceiling.

Label noise handling: a token is adopted only when ``n_dominant >=
min_count`` and ``n_dominant / n_total >= min_purity`` (O counts included
in the denominator), so sporadic mislabels and mostly-O tokens are
rejected rather than memorized.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from localhost_address_matching_ray.stages.tagger import EntityTagger


def token_type_counts(labeled: ray.data.Dataset) -> ray.data.Dataset:
    """(token, type, n) totals from a labeled Dataset carrying the CoNLL
    columns ``tokens: list<string>`` and ``tags: list<string>`` (BIO).

    ``O`` rows are KEPT — :func:`fit_tagger_rules` needs them in the purity
    denominator; filter ``type != 'O'`` downstream if only entities matter.
    """

    def partial(t: pa.Table) -> pa.Table:
        tok = pc.list_flatten(t["tokens"])
        typ = pc.replace_substring_regex(pc.list_flatten(t["tags"]), r"^[BI]-", "")
        g = (
            pa.table({"token": tok, "type": typ})
            .group_by(["token", "type"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["token", "type", "n"])

    return (
        labeled.map_batches(partial, batch_format="pyarrow")
        .groupby(["token", "type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def fit_tagger_rules(
    labeled: ray.data.Dataset,
    *,
    min_count: int = 2,
    min_purity: float = 0.8,
    max_tokens_per_type: int = 50_000,
    fit_collect_max_rows: int = 5_000_000,
) -> tuple[list[tuple[str, str]], pa.Table]:
    """Learn gazetteer rules from a labeled corpus; returns
    ``(rules, vocab)`` where *rules* is an ``EntityTagger``-ready ordered
    ``(type, pattern)`` list (one anchored, escaped alternation per type)
    and *vocab* the adopted ``(token, type, n, purity)`` table.

    The driver holds only the vocabulary (≤ ``max_tokens_per_type`` rows
    per type, dominant-count order) — the model artifact.  Deterministic:
    ties on the dominant type break lexicographically; rule order is
    sorted by type name; alternation members by (-n, token).
    """

    from localhost_address_matching_ray.config import bucket_width
    from localhost_address_matching_ray.functions.hashing import TokenHasher, u64_bucket

    hasher = TokenHasher()
    nb = bucket_width()

    def tag_bucket(t: pa.Table) -> pa.Table:
        # bucket by token-hash so one token's counts co-locate; vote runs
        # vectorized over a whole bucket, never one call per token
        th = hasher.hash_token_array(t["token"])
        return t.append_column("vb", pa.array(u64_bucket(th, nb)))

    def vote_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _EMPTY_VOCAB
        tok = np.asarray(g["token"].to_pylist(), dtype=object)
        typ = np.asarray(g["type"].to_pylist(), dtype=object)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(tok, kind="mergesort")
        tok, typ, n = tok[order], typ[order], n[order]
        starts = np.concatenate(([0], np.flatnonzero(tok[1:] != tok[:-1]) + 1))
        seg = np.zeros(len(tok), np.int64)
        seg[starts[1:]] = 1
        seg = np.cumsum(seg)
        totals = np.add.reduceat(n, starts)
        # dominant non-O row per token: order rows (token, -n, type lexical),
        # first entity row of each segment wins
        _, typ_code = np.unique(typ, return_inverse=True)
        o2 = np.lexsort((typ_code, -n, seg))
        ent = typ[o2] != "O"
        cand = o2[ent]
        _, first = np.unique(seg[cand], return_index=True)
        dom = cand[first]
        n_dom = n[dom]
        purity = n_dom / totals[seg[dom]]
        keep = (n_dom >= min_count) & (purity >= min_purity)
        return pa.table({
            "token": pa.array(tok[dom][keep], pa.string()),
            "type": pa.array(typ[dom][keep], pa.string()),
            "n": pa.array(n_dom[keep], pa.int64()),
            "purity": pa.array(purity[keep], pa.float64()),
        })

    vocab_ds = (
        token_type_counts(labeled)
        .map_batches(tag_bucket, batch_format="pyarrow")
        .groupby("vb")
        .map_groups(vote_bucket, batch_format="pyarrow")
    )
    parts = [ray.get(ref) for ref in vocab_ds.to_arrow_refs()]
    parts = [p for p in parts if p.num_rows]
    vocab = pa.concat_tables(parts) if parts else _EMPTY_VOCAB
    if vocab.num_rows > fit_collect_max_rows:
        raise ValueError(
            f"learned vocabulary ({vocab.num_rows} rows) exceeds "
            f"fit_collect_max_rows={fit_collect_max_rows}; raise min_count/"
            "min_purity or the ceiling — the artifact must fit the driver"
        )
    vocab = vocab.sort_by(
        [("type", "ascending"), ("n", "descending"), ("token", "ascending")]
    )

    rules: list[tuple[str, str]] = []
    typ_np = np.asarray(vocab["type"].to_pylist(), dtype=object)
    tok_np = np.asarray(vocab["token"].to_pylist(), dtype=object)
    kept_rows: list[int] = []
    for t in sorted(set(typ_np)):
        rows = np.flatnonzero(typ_np == t)[:max_tokens_per_type]
        kept_rows.extend(rows.tolist())
        alts = "|".join(re.escape(tok) for tok in tok_np[rows])
        rules.append((t, f"^(?:{alts})$"))
    vocab = vocab.take(pa.array(sorted(kept_rows), pa.int64()))
    return rules, vocab


_EMPTY_VOCAB = pa.table({
    "token": pa.array([], pa.string()),
    "type": pa.array([], pa.string()),
    "n": pa.array([], pa.int64()),
    "purity": pa.array([], pa.float64()),
})


class _SelfLabelCounts:
    """Actor-pool combiner for :func:`doc_token_type_counts`: tokenize each
    batch with the tagger's own tokenizer, classify UNIQUE tokens once
    (``EntityTagger._classify_unique`` — the per-actor compiled rule state),
    and emit per-batch (token, type, n) partials."""

    def __init__(self, rules: list[tuple[str, str]] | None = None) -> None:
        self.tagger = EntityTagger(rules)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks = "\n".join(texts).split()  # '\n' is whitespace: no cross-doc token
        if not toks:
            return pa.table({
                "token": pa.array([], pa.string()),
                "type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            })
        d = pa.array(toks, pa.string()).dictionary_encode()
        codes = self.tagger._classify_unique(d.dictionary)
        cnt = np.bincount(
            d.indices.to_numpy(zero_copy_only=False), minlength=len(d.dictionary)
        )
        keep = codes > 0
        return pa.table({
            "token": d.dictionary.filter(pa.array(keep)),
            "type": pa.array(self.tagger._type_names[codes[keep]], pa.string()),
            "n": pa.array(cnt[keep].astype(np.int64), pa.int64()),
        })


def doc_token_type_counts(
    docs: ray.data.Dataset,
    *,
    rules: list[tuple[str, str]] | None = None,
    min_count: int = 2,
    concurrency: int | tuple[int, int] = (1, 8),
) -> ray.data.Dataset:
    """Self-training vocabulary over a document table: label every token
    with the (current) rule set, count (token, type), keep counts >=
    *min_count* — the distributed shape of one fit iteration, with the
    labels coming from the model itself instead of an annotated corpus."""
    counts = docs.map_batches(
        _SelfLabelCounts,
        fn_constructor_args=(rules,),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    agg = counts.groupby(["token", "type"]).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow",
    )
