"""Training analog: distributed (token, type) counting + purity-vote fit."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from localhost_address_matching_ray.pipelines.train import (
    fit_tagger_rules,
    token_type_counts,
)
from localhost_address_matching_ray.stages.tagger import EntityTagger


def _labeled(rows):
    toks, tags = zip(*rows) if rows else ((), ())
    return ray.data.from_arrow(pa.table({
        "tokens": pa.array(list(toks), pa.list_(pa.string())),
        "tags": pa.array(list(tags), pa.list_(pa.string())),
    }))


def test_token_type_counts_merges_partials_and_strips_bio():
    ds = _labeled([
        (["alpha", "x", "alpha"], ["B-X", "O", "I-X"]),
        (["alpha", "beta"], ["B-X", "B-Y"]),
    ])
    got = token_type_counts(ds).to_pandas()
    counts = {(r.token, r.type): r.n for r in got.itertuples()}
    assert counts[("alpha", "X")] == 3  # B- and I- both count toward X
    assert counts[("beta", "Y")] == 1
    assert counts[("x", "O")] == 1


def test_fit_recovers_vocab_and_rejects_noise():
    rows = []
    # alpha: 5×X + 1×Y mislabel → purity 5/6 ≥ 0.8, adopted as X
    rows += [(["alpha"], ["B-X"])] * 5 + [(["alpha"], ["B-Y"])]
    # beta: clean Y twice → adopted
    rows += [(["beta"], ["B-Y"])] * 2
    # gamma: mostly O, one X → purity 0.1, rejected
    rows += [(["gamma"], ["O"])] * 9 + [(["gamma"], ["B-X"])]
    # delta: one Z → below min_count, rejected
    rows += [(["delta"], ["B-Z"])]
    rules, vocab = fit_tagger_rules(_labeled(rows), min_count=2, min_purity=0.8)
    learned = {(r["token"], r["type"]) for r in vocab.to_pylist()}
    assert learned == {("alpha", "X"), ("beta", "Y")}
    tagger = EntityTagger(rules)
    tags, _, _ = tagger.tag_one("alpha beta gamma delta")
    assert tags == ["B-X", "B-Y", "O", "O"]


def test_fit_escapes_regex_metacharacters():
    rows = [(["a+b*c"], ["B-SYM"])] * 3 + [(["apbxc"], ["O"])] * 3
    rules, vocab = fit_tagger_rules(_labeled(rows), min_count=2, min_purity=0.8)
    assert [r["token"] for r in vocab.to_pylist()] == ["a+b*c"]
    tagger = EntityTagger(rules)
    assert tagger.tag_one("a+b*c")[0] == ["B-SYM"]
    assert tagger.tag_one("apbxc")[0] == ["O"]  # '+'/'*' must not act as regex


def test_fit_empty_corpus_yields_no_rules():
    rules, vocab = fit_tagger_rules(_labeled([]), min_count=1)
    assert rules == [] and vocab.num_rows == 0


def test_fit_max_tokens_per_type_caps_alternation():
    rows = [([f"tok{i}"], ["B-T"]) for i in range(6) for _ in range(2 + i)]
    rules, vocab = fit_tagger_rules(
        _labeled(rows), min_count=2, min_purity=0.5, max_tokens_per_type=3
    )
    assert vocab.num_rows == 3
    # highest-support tokens kept: tok5 (7), tok4 (6), tok3 (5)
    assert {r["token"] for r in vocab.to_pylist()} == {"tok5", "tok4", "tok3"}
