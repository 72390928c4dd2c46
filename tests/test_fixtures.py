"""Fixture-generator distribution sanity — FIXTURES.md §6 / the
``compute_stats`` analog (``generate_A2E_BIO_synth.py:67-274``)."""

from localhost_address_matching_ray.fixtures import CorpusSpec, corpus_stats, generate_corpus


def test_reproducible():
    a = generate_corpus(CorpusSpec(n_base=100, seed=7))
    b = generate_corpus(CorpusSpec(n_base=100, seed=7))
    assert a["corpus"].equals(b["corpus"])
    assert a["labeled_pairs"].equals(b["labeled_pairs"])
    assert a["clusters_expected"].equals(b["clusters_expected"])


def test_seed_changes_output():
    a = generate_corpus(CorpusSpec(n_base=100, seed=7))
    b = generate_corpus(CorpusSpec(n_base=100, seed=8))
    assert not a["corpus"].equals(b["corpus"])


def test_distribution_targets(small_fixture_tables):
    stats = corpus_stats(small_fixture_tables)
    # lang skew as configured (±10% absolute at this scale)
    assert abs(stats["lang_python"] - 0.45) < 0.12
    # every planted variant class appears
    for cls in ("pair_class_exact", "pair_class_whitespace", "pair_class_comment",
                "pair_class_rename", "pair_class_minor_edit", "pair_class_hard_negative"):
        assert stats.get(cls, 0) > 0, cls
    assert stats["n_pairs"] >= 50


def test_clusters_expected_consistent(small_fixture_tables):
    t = small_fixture_tables
    ids = set(t["clusters_expected"]["row_id"].to_pylist())
    lp = t["labeled_pairs"].to_pydict()
    assert set(lp["left_id"]) <= ids and set(lp["right_id"]) <= ids
    # matching pairs share an expected cluster; hard negatives don't
    cl = dict(zip(t["clusters_expected"]["row_id"].to_pylist(),
                  t["clusters_expected"]["cluster_id"].to_pylist()))
    for l, r, m, c in zip(lp["left_id"], lp["right_id"], lp["is_match"], lp["pair_class"]):
        if m:
            assert cl[l] == cl[r], c
        else:
            assert cl[l] != cl[r], c


def test_hot_cluster_planted():
    t = generate_corpus(CorpusSpec(n_base=50, seed=3, hot_cluster_size=40))
    from collections import Counter
    sizes = Counter(t["clusters_expected"]["cluster_id"].to_pylist())
    assert max(sizes.values()) >= 40
