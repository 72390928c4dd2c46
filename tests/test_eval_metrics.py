"""Eval-harness and metrics-sidecar unit tests."""

import json

import numpy as np
import pyarrow as pa
import ray.data

from localhost_address_matching_ray.pipelines.eval import PairwiseReport, pairwise_f1
from localhost_address_matching_ray.state.metrics import StageMetrics, dataset_histogram


def _clusters(mapping: dict[str, str]) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "row_id": pa.array(list(mapping), pa.string()),
        "cluster_id": pa.array(list(mapping.values()), pa.string()),
    }))


def _pairs(rows):
    return pa.table({
        "left_id": pa.array([r[0] for r in rows], pa.string()),
        "right_id": pa.array([r[1] for r in rows], pa.string()),
        "block_key": pa.array(["k"] * len(rows), pa.string()),
        "is_match": pa.array([r[2] for r in rows], pa.bool_()),
        "pair_class": pa.array([r[3] for r in rows], pa.string()),
    })


def test_pairwise_f1_counts():
    clusters = _clusters({"a": "c1", "b": "c1", "c": "c2", "d": "c3"})
    report = pairwise_f1(clusters, _pairs([
        ("a", "b", True, "exact"),         # TP
        ("a", "c", True, "minor_edit"),    # FN (predicted apart)
        ("c", "d", False, "hard_negative"),  # TN
        ("a", "d", False, "random"),       # TN
    ]))
    assert (report.tp, report.fp, report.fn, report.tn) == (1, 0, 1, 2)
    assert report.precision == 1.0 and report.recall == 0.5
    assert report.per_class["exact"]["tp"] == 1
    assert report.per_class["minor_edit"]["fn"] == 1


def test_pairwise_f1_fp_case():
    clusters = _clusters({"a": "c1", "b": "c1"})
    report = pairwise_f1(clusters, _pairs([("a", "b", False, "hard_negative")]))
    assert report.fp == 1 and report.precision == 0.0


def test_perfect_report_properties():
    r = PairwiseReport(tp=10, fp=0, fn=0, tn=5, per_class={})
    assert r.f1 == 1.0


def test_dataset_histogram_matches_numpy():
    vals = np.linspace(0, 1, 101)
    ds = ray.data.from_arrow(pa.table({"score": pa.array(vals, pa.float64())}))
    edges, counts = dataset_histogram(ds, "score", bins=10, lo=0.0, hi=1.0)
    ref_counts, ref_edges = np.histogram(vals, bins=np.linspace(0, 1, 11))
    assert counts == [int(c) for c in ref_counts]
    assert edges == [float(e) for e in ref_edges]


def test_stage_metrics_write(tmp_path):
    m = StageMetrics()
    m.count("normalize", "rows", 100)
    m.histogram("edges", "score", np.array([0.1, 0.5, 0.9]))
    path = m.write(str(tmp_path))
    data = json.loads(open(path).read())
    assert any(r["metric"] == "rows" and r["value"] == 100 for r in data)
    assert any(r["metric"] == "score_hist" for r in data)


def test_tagger_report_per_label():
    """Strict span-level P/R/F1 per entity type + micro/macro (the seqeval
    harness analog)."""
    from localhost_address_matching_ray.pipelines.eval import tagger_report

    gold = [
        ["B-NUM", "O", "B-URL", "I-URL", "O"],
        ["B-NUM", "I-NUM", "O"],
    ]
    pred = [
        ["B-NUM", "O", "B-URL", "O", "O"],      # URL boundary wrong
        ["B-NUM", "I-NUM", "O"],                 # exact
    ]
    rep = tagger_report(pred, gold)
    assert rep["per_label"]["NUM"] == {
        "precision": 1.0, "recall": 1.0, "f1": 1.0, "support": 2,
    }
    url = rep["per_label"]["URL"]
    assert url["precision"] == 0.0 and url["recall"] == 0.0 and url["support"] == 1
    micro = rep["micro"]
    assert micro["precision"] == 2 / 3 and micro["recall"] == 2 / 3
    assert abs(rep["macro"]["f1"] - 0.5) < 1e-12

    # perfect agreement on the tagger's own output
    from localhost_address_matching_ray.stages.tagger import EntityTagger

    t = EntityTagger()
    tags = [t.tag_one("visit https://x.io NOW 42 fooBar")[0]]
    rep2 = tagger_report(tags, tags)
    assert rep2["micro"]["f1"] == 1.0 and set(rep2["per_label"]) >= {"URL", "NUM"}


def test_tagger_report_confusion_matrix():
    """%-confusion over boundary-matched spans (training nb cell 28 analog):
    matched spans pair gold type with pred type; missed gold spans land in
    the O column, spurious pred spans in the O row; rows sum to 100."""
    from localhost_address_matching_ray.pipelines.eval import tagger_report

    gold = [
        ["B-NUM", "O", "B-URL", "O"],   # NUM matched as NUM; URL mislabeled NUM
        ["B-NUM", "O", "O"],             # NUM missed entirely
    ]
    pred = [
        ["B-NUM", "O", "B-NUM", "O"],
        ["O", "O", "B-URL"],             # spurious URL
    ]
    conf = tagger_report(pred, gold)["confusion"]
    assert conf["NUM"] == {"NUM": 50.0, "O": 50.0}   # 1 matched, 1 missed
    assert conf["URL"] == {"NUM": 100.0}             # mislabeled
    assert conf["O"] == {"URL": 100.0}               # spurious
    for row in conf.values():
        assert abs(sum(row.values()) - 100.0) < 0.05


def test_tagger_report_lenient_start():
    """seqeval's IOB2 leniency: a bare I-X after O starts an entity. Strict
    mode (default) drops it; lenient mode scores it — parity flag for gold
    authored under the seqeval convention (ADVICE round 3)."""
    from localhost_address_matching_ray.pipelines.eval import tagger_report

    gold = [["O", "I-NUM", "I-NUM", "O"]]   # seqeval-style bare I- entity
    pred = [["O", "B-NUM", "I-NUM", "O"]]
    strict = tagger_report(pred, gold)
    assert strict["micro"]["recall"] == 0.0   # gold span invisible in strict
    lenient = tagger_report(pred, gold, lenient_start=True)
    assert lenient["micro"]["f1"] == 1.0
    # type change mid-entity also starts a new one under leniency
    gold2 = [["B-URL", "I-NUM", "O"]]
    pred2 = [["B-URL", "B-NUM", "O"]]
    assert tagger_report(pred2, gold2, lenient_start=True)["micro"]["f1"] == 1.0


def test_tagger_report_length_mismatch():
    import pytest

    from localhost_address_matching_ray.pipelines.eval import tagger_report

    with pytest.raises(ValueError):
        tagger_report([["O"]], [])
