"""The reference's full lifecycle (SURVEY §3.3) composed end to end through
real surfaces: data factory → CoNLL write/read round-trip → distributed
fit → inference with the learned model → seqeval-style report.

Every arrow in `factory → train → eval` goes through the same public API a
user would call; nothing is stubbed or mocked."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from localhost_address_matching_ray.pipelines.eval import tagger_report
from localhost_address_matching_ray.pipelines.train import fit_tagger_rules
from localhost_address_matching_ray.sources.conll import read_conll, write_conll
from localhost_address_matching_ray.stages.tagger import EntityTagger

_VOCAB = {
    "scan": "OP", "merge": "OP", "join": "OP",
    "table": "STRUCT", "row": "STRUCT", "batch": "STRUCT",
}
_FILLER = ["the", "of", "and", "fast", "value", "data"]


def _make_labeled(rng, n_docs: int, noise: float = 0.0):
    """Seeded corpus of labeled docs over a known gazetteer; optional label
    noise flips a typed token's label to a wrong type."""
    types = sorted(set(_VOCAB.values()))
    docs = []
    for i in range(n_docs):
        n = int(rng.integers(4, 10))
        toks = [
            str(rng.choice(list(_VOCAB) if rng.random() < 0.5 else _FILLER))
            for _ in range(n)
        ]
        tags, prev = [], None
        for t in toks:
            ty = _VOCAB.get(t)
            if ty is None:
                tags.append("O")
                prev = None
            else:
                if noise and rng.random() < noise:
                    ty = str(rng.choice([x for x in types if x != ty]))
                tags.append(("I-" if prev == ty else "B-") + ty)
                prev = ty
        docs.append({
            "raw": " ".join(toks), "rid": f"d{i}", "group": "train",
            "tokens": toks, "tags": tags,
        })
    return docs


def test_factory_conll_fit_eval_loop(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    docs = _make_labeled(rng, 120, noise=0.08)
    ds = ray.data.from_items(docs)

    # CoNLL round-trip: the labeled corpus travels through the real file
    # format between the factory and the trainer
    out = str(tmp_path / "conll")
    paths = write_conll(ds, out)
    labeled = read_conll(paths)
    assert labeled.count() == 120

    # distributed fit under 8% label noise
    rules, vocab = fit_tagger_rules(labeled, min_count=2, min_purity=0.6)
    learned = {r["token"]: r["type"] for r in vocab.to_pylist()}
    assert learned == _VOCAB  # noise rejected, full gazetteer recovered

    # inference with the learned model vs the CLEAN labels
    tagger = EntityTagger(rules)
    clean = _make_labeled(np.random.default_rng(11), 120, noise=0.0)
    pred = [tagger.tag_one(d["raw"])[0] for d in clean]
    gold = [d["tags"] for d in clean]
    rep = tagger_report(pred, gold)
    assert rep["micro"]["f1"] == 1.0
    for lbl in sorted(set(_VOCAB.values())):
        assert rep["per_label"][lbl]["f1"] == 1.0
