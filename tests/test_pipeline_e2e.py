"""End-to-end linkage pipeline on the planted-cluster fixture corpus.

The BASELINE gate: pairwise F1 ≥ 0.99 on labeled pairs at fixed blocking
keys, plus stage-level invariants (exact dedup counts, hot-key salting,
cluster/expected agreement)."""

import pyarrow as pa
import pytest
import ray.data

from localhost_address_matching_ray.config import PipelineConfig
from localhost_address_matching_ray.fixtures import CorpusSpec, generate_corpus
from localhost_address_matching_ray.pipelines.eval import explain_pair, pairwise_f1
from localhost_address_matching_ray.pipelines.linkage import link_corpus


@pytest.fixture(scope="module")
def linkage_result(small_fixture_tables):
    corpus = ray.data.from_arrow(small_fixture_tables["corpus"])
    return link_corpus(corpus, PipelineConfig(feature_concurrency=2))


def test_pairwise_f1_gate(linkage_result, small_fixture_tables):
    report = pairwise_f1(linkage_result["clusters"], small_fixture_tables["labeled_pairs"])
    assert report.f1 >= 0.99, (
        f"F1={report.f1:.4f} P={report.precision:.4f} R={report.recall:.4f} "
        f"per_class={report.per_class}"
    )


def test_cluster_partition_matches_expected(linkage_result, small_fixture_tables):
    """Predicted partition == planted partition (compared as co-membership
    over expected clusters, order-free)."""
    pred = {r["row_id"]: r["cluster_id"] for r in linkage_result["clusters"].take_all()}
    exp_tbl = small_fixture_tables["clusters_expected"].to_pydict()
    exp = dict(zip(exp_tbl["row_id"], exp_tbl["cluster_id"]))
    assert set(pred) == set(exp)
    # group rows by expected cluster; every expected cluster must map to
    # exactly one predicted cluster (no splits) at ≥99% of rows
    from collections import defaultdict
    by_exp = defaultdict(set)
    for rid, ecl in exp.items():
        by_exp[ecl].add(pred[rid])
    splits = sum(1 for s in by_exp.values() if len(s) > 1)
    assert splits / len(by_exp) < 0.01, f"{splits}/{len(by_exp)} expected clusters split"


def test_exact_dedup_counts(linkage_result, small_fixture_tables):
    from localhost_address_matching_ray.stages.dedup import exact_dedup

    n_all = small_fixture_tables["corpus"].num_rows
    n_reps = exact_dedup(linkage_result["normalized"]).count()
    assert n_reps < n_all  # planted exact/whitespace dups collapse
    shas = linkage_result["normalized"].select_columns(["content_sha256_norm"])
    n_distinct = shas.groupby("content_sha256_norm").count().count()
    assert n_reps == n_distinct


def test_collapse_exact_first_mode(small_fixture_tables):
    """The exact-collapse pipeline shape (config flag) produces the same
    clustering as the default no-collapse shape."""
    import ray.data

    from localhost_address_matching_ray.config import PipelineConfig
    from localhost_address_matching_ray.pipelines.linkage import link_corpus

    corpus = ray.data.from_arrow(small_fixture_tables["corpus"])
    res = link_corpus(corpus, PipelineConfig(collapse_exact_first=True, feature_concurrency=2))
    from localhost_address_matching_ray.pipelines.eval import pairwise_f1

    rep = pairwise_f1(res["clusters"], small_fixture_tables["labeled_pairs"])
    assert rep.f1 >= 0.99


def test_clusters_schema_and_rows(linkage_result, small_fixture_tables):
    clusters = linkage_result["clusters"]
    assert clusters.count() == small_fixture_tables["corpus"].num_rows
    schema = clusters.schema()
    assert set(schema.names) == {"row_id", "cluster_id"}


def test_explain_pair(linkage_result, small_fixture_tables):
    lp = small_fixture_tables["labeled_pairs"].to_pydict()
    rep = explain_pair(linkage_result, lp["left_id"][0], lp["right_id"][0])
    assert rep["left_id"] == lp["left_id"][0]
    assert "same_cluster" in rep and rep[lp["left_id"][0]]["stem"] is not None


def test_suggest_matches(linkage_result, small_fixture_tables):
    """Ranked near-miss suggestions: a matched pair's partner appears in the
    suggestion list, ranked by similarity (test_static_parser.py:63-71
    analog)."""
    from localhost_address_matching_ray.pipelines.eval import suggest_matches

    lp = small_fixture_tables["labeled_pairs"].to_pydict()
    i = lp["is_match"].index(True)
    left, right = lp["left_id"][i], lp["right_id"][i]
    sugg = suggest_matches(linkage_result, left, k=5)
    assert sugg and all(
        s["minhash_jaccard_est"] >= sugg[-1]["minhash_jaccard_est"] for s in sugg
    )
    assert any(s["row_id"] == right for s in sugg)
    assert suggest_matches(linkage_result, "nonexistent-row", k=3) == []


def test_duplicate_free_corpus_links_clean():
    """Regression: a corpus with NO duplicate keys must link without error.

    With singleton_suppression=True (the default) every key emission is
    suppressed, so _PayloadEmitter batches produce zero block rows; the
    emitter previously emitted full-batch sigp/sigp2 columns alongside 0-row
    key columns (ArrowInvalid: 'expected length 0 but got length N')."""
    tables = generate_corpus(CorpusSpec(
        n_base=30, seed=11, p_exact=0, p_whitespace=0, p_comment=0,
        p_rename=0, p_minor_edit=0, p_hard_negative=0,
    ))
    res = link_corpus(
        ray.data.from_arrow(tables["corpus"]), PipelineConfig(feature_concurrency=2)
    )
    clusters = res["clusters"].take_all()
    assert len(clusters) == tables["corpus"].num_rows
    # no duplicates planted → every row is its own cluster
    assert len({r["cluster_id"] for r in clusters}) == len(clusters)


def test_salting_path_clusters_hot_key():
    """A giant exact-dup cluster above max_block_rows still comes out as one
    cluster (rep-bridge correctness), via the salted sub-block path."""
    tables = generate_corpus(CorpusSpec(n_base=60, seed=5, hot_cluster_size=50))
    cfg = PipelineConfig(max_block_rows=16, salt_buckets=4, feature_concurrency=2)
    res = link_corpus(ray.data.from_arrow(tables["corpus"]), cfg)
    report = pairwise_f1(res["clusters"], tables["labeled_pairs"])
    assert report.f1 >= 0.99
    # the hot exact cluster: all 50 rows share one predicted cluster
    exp = tables["clusters_expected"].to_pydict()
    from collections import Counter, defaultdict
    sizes = Counter(exp["cluster_id"])
    hot_cl = max(sizes, key=sizes.get)
    pred = {r["row_id"]: r["cluster_id"] for r in res["clusters"].take_all()}
    hot_pred = {pred[rid] for rid, c in zip(exp["row_id"], exp["cluster_id"]) if c == hot_cl}
    assert len(hot_pred) == 1


def test_single_row_corpus_and_unknown_lang():
    """Degenerate shapes the 100-TB path must survive: a one-row corpus
    (every distributed stage sees n=1 — joins/groupbys must not crash on
    empty partitions) and a lang with no LangConfig (falls back to default
    shingle_k / no comment styles, still links its exact duplicate)."""
    import pyarrow as pa

    one = pa.table({
        "repo": ["r1"], "path": ["a/b.py"], "commit": ["c1"],
        "lang": ["python"], "content": pa.array(["x = 1\n"], pa.large_string()),
    })
    res = link_corpus(ray.data.from_arrow(one), PipelineConfig(feature_concurrency=2))
    rows = res["clusters"].take_all()
    assert len(rows) == 1 and rows[0]["cluster_id"]

    # unknown lang: two exact copies + one unrelated file, lang never
    # registered in PipelineConfig.lang_configs
    body = "SELECT a, b FROM t WHERE a > 1\n" * 4
    unk = pa.table({
        "repo": ["r1", "r2", "r3"],
        "path": ["q/one.xqy", "q/two.xqy", "q/other.xqy"],
        "commit": ["c1", "c2", "c3"],
        "lang": ["xquery", "xquery", "xquery"],
        "content": pa.array([body, body, "totally different content\n"],
                            pa.large_string()),
    })
    res2 = link_corpus(ray.data.from_arrow(unk), PipelineConfig(feature_concurrency=2))
    from localhost_address_matching_ray.functions.hashing import row_id_arrow

    rid_of = dict(zip(
        row_id_arrow(unk["repo"], unk["path"], unk["commit"]),
        unk["path"].to_pylist(),
    ))
    got = {rid_of[r["row_id"]]: r["cluster_id"] for r in res2["clusters"].take_all()}
    assert got["q/one.xqy"] == got["q/two.xqy"]
    assert got["q/other.xqy"] != got["q/one.xqy"]
