"""Checkpoint/resume semantics — the generalization of the reference's
pickle cache with content-hash signature + version hint
(``data/ptt_data/map.py:159-203``): valid manifest → stage skipped; changed
input fingerprint or pipeline version → stage recomputed."""

import os

import pyarrow as pa
import ray.data

from localhost_address_matching_ray.state.checkpoint import (
    checkpoint_valid,
    load_or_compute,
    write_checkpoint,
)


def _toy(n=10):
    return ray.data.from_arrow(pa.table({"x": list(range(n))}))


def test_write_and_validate(tmp_path):
    d = str(tmp_path / "stage1")
    out = write_checkpoint(_toy(), d, "fp1", "stage1", "v1")
    assert out.count() == 10
    assert checkpoint_valid(d, "fp1", "stage1", "v1")
    assert not checkpoint_valid(d, "fp2", "stage1", "v1")   # input changed
    assert not checkpoint_valid(d, "fp1", "stage1", "v2")   # code version changed
    assert not checkpoint_valid(d, "fp1", "other", "v1")    # different stage


def test_load_or_compute_skips_when_valid(tmp_path):
    root = str(tmp_path)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return _toy(5)

    a = load_or_compute(root, "fp", "s", "v1", compute)
    assert a.count() == 5 and calls["n"] == 1
    b = load_or_compute(root, "fp", "s", "v1", compute)
    assert b.count() == 5 and calls["n"] == 1  # resumed, not recomputed
    c = load_or_compute(root, "fp", "s", "v2", compute)
    assert c.count() == 5 and calls["n"] == 2  # version bump invalidates


def test_load_or_compute_none_dir_streams():
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return _toy(3)

    out = load_or_compute(None, "fp", "s", "v", compute)
    assert out.count() == 3 and calls["n"] == 1


def test_pipeline_resumes_from_checkpoints(tmp_path, small_fixture_tables):
    """Full pipeline twice with the same checkpoint dir: second run reuses
    every stage checkpoint and produces the identical clustering."""
    from localhost_address_matching_ray.config import PipelineConfig
    from localhost_address_matching_ray.pipelines.linkage import link_corpus

    corpus = ray.data.from_arrow(small_fixture_tables["corpus"])
    cfg = PipelineConfig(feature_concurrency=2, checkpoint_dir=str(tmp_path / "ckpt"))
    r1 = link_corpus(corpus, cfg, input_fingerprint="fixture-v1")
    c1 = sorted((r["row_id"], r["cluster_id"]) for r in r1["clusters"].take_all())
    # manifests exist for each checkpointed stage
    for stage in ("normalized", "features", "edges", "clusters"):
        assert os.path.exists(tmp_path / "ckpt" / stage / "_manifest.json"), stage
    r2 = link_corpus(corpus, cfg, input_fingerprint="fixture-v1")
    c2 = sorted((r["row_id"], r["cluster_id"]) for r in r2["clusters"].take_all())
    assert c1 == c2


def test_minhash_mode_flip_invalidates_feature_checkpoints(tmp_path, small_fixture_tables):
    """Flipping minhash_mode with the same checkpoint dir must NOT reuse
    the feature-derived checkpoints (OPH and classic signature values are
    incomparable) — the stage version embeds the mode — while still
    producing the same clustering (F1-equivalent families)."""
    import json

    from localhost_address_matching_ray.config import PipelineConfig
    from localhost_address_matching_ray.pipelines.linkage import link_corpus

    corpus = ray.data.from_arrow(small_fixture_tables["corpus"])
    base = dict(feature_concurrency=2, checkpoint_dir=str(tmp_path / "ck"))
    r1 = link_corpus(corpus, PipelineConfig(minhash_mode="oph", **base),
                     input_fingerprint="f1")
    c1 = sorted((r["row_id"], r["cluster_id"]) for r in r1["clusters"].take_all())
    man = json.load(open(tmp_path / "ck" / "features" / "_manifest.json"))
    assert "+mh-oph" in man["pipeline_version"]

    r2 = link_corpus(corpus, PipelineConfig(minhash_mode="classic", **base),
                     input_fingerprint="f1")
    c2 = sorted((r["row_id"], r["cluster_id"]) for r in r2["clusters"].take_all())
    man = json.load(open(tmp_path / "ck" / "features" / "_manifest.json"))
    assert "+mh-classic" in man["pipeline_version"]  # recomputed
    assert c1 == c2  # same clustering from either family on the fixture
