"""Pairwise evaluation harness + explain diagnostics.

Reference analogs: the seqeval P/R/F1 harness (training nb cells 21/26-28,
SURVEY.md G6) → pairwise precision/recall/F1 on labeled pairs at fixed
blocking keys (the BASELINE.json metric, target ≥ 0.99); and the rich
failure explain report of ``test/test_static_parser.py:89-133`` →
:func:`explain_pair`.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import ray.data


@dataclass(frozen=True)
class PairwiseReport:
    tp: int
    fp: int
    fn: int
    tn: int
    per_class: dict[str, dict[str, int]]

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if (self.tp + self.fp) else 1.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if (self.tp + self.fn) else 1.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if (p + r) else 0.0


def _cluster_lookup(clusters: ray.data.Dataset, ids: set[str]) -> dict[str, str]:
    """Broadcast-semi-join: filter the cluster table to the labeled ids
    (vectorized is_in inside map_batches — the ids set is tiny), then
    collect only those rows."""
    import pyarrow.compute as pc

    id_arr = pa.array(sorted(ids), pa.string())

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["row_id"], value_set=id_arr))

    out = clusters.map_batches(pick, batch_format="pyarrow").take_all()
    return {r["row_id"]: r["cluster_id"] for r in out}


def pairwise_f1(clusters: ray.data.Dataset, labeled_pairs: pa.Table) -> PairwiseReport:
    """Join predicted co-membership against labeled pairs (at their recorded
    blocking keys) and report TP/FP/FN/TN overall and per pair_class."""
    lp = labeled_pairs.to_pydict()
    ids = set(lp["left_id"]) | set(lp["right_id"])
    lookup = _cluster_lookup(clusters, ids)

    tp = fp = fn = tn = 0
    per_class: dict[str, dict[str, int]] = {}
    for lid, rid, is_match, cls in zip(
        lp["left_id"], lp["right_id"], lp["is_match"], lp["pair_class"]
    ):
        pred = lookup.get(lid) is not None and lookup.get(lid) == lookup.get(rid)
        cell = per_class.setdefault(cls, {"tp": 0, "fp": 0, "fn": 0, "tn": 0})
        if pred and is_match:
            tp += 1; cell["tp"] += 1
        elif pred and not is_match:
            fp += 1; cell["fp"] += 1
        elif not pred and is_match:
            fn += 1; cell["fn"] += 1
        else:
            tn += 1; cell["tn"] += 1
    return PairwiseReport(tp, fp, fn, tn, per_class)


def _bio_entities(
    tags: list[str], lenient_start: bool = False
) -> set[tuple[int, int, str]]:
    """Entity spans (start_tok, end_tok_exclusive, type) from one BIO tag
    sequence. Strict mode (default): an entity starts only at B-X, matching
    the tagger's own emission — a stray I-X with no B- opener is dropped.
    ``lenient_start=True`` applies seqeval's default IOB2 leniency instead
    (an I-X after O / a different type STARTS an entity), for parity runs
    against gold sequences authored under the seqeval convention (the
    reference's training nb scores with seqeval)."""
    ents: set[tuple[int, int, str]] = set()
    start, typ = None, None
    for i, tag in enumerate(tags + ["O"]):
        if tag.startswith("B-") or tag == "O" or (
            tag.startswith("I-") and typ is not None and tag[2:] != typ
        ):
            if typ is not None:
                ents.add((start, i, typ))
                start, typ = None, None
            if tag.startswith("B-"):
                start, typ = i, tag[2:]
            elif lenient_start and tag.startswith("I-"):
                start, typ = i, tag[2:]
        elif tag.startswith("I-") and typ is None:
            if lenient_start:
                start, typ = i, tag[2:]
            # else: stray I- without a B- opener — not an entity (strict)
    return ents


def tagger_report(
    pred_tags: list[list[str]], gold_tags: list[list[str]],
    lenient_start: bool = False,
) -> dict:
    """Per-entity-type P/R/F1 + micro/macro + confusion matrix over aligned
    BIO tag sequences — the reference's seqeval harness analog (training nb
    cells 21, 26-28): strict span-level matching (an entity counts only if
    type AND both boundaries agree). ``lenient_start`` switches span
    extraction to seqeval's IOB2 leniency (see :func:`_bio_entities`).
    Returns ``{"per_label": {type: {precision, recall, f1, support}},
    "micro": {...}, "macro": {...}, "confusion": {gold_type: {pred_type:
    pct}}}`` where confusion rows are boundary-matched entities plus an
    ``"O"`` row/column for missed/spurious spans (reference: training nb
    cell 28's %-confusion matrix), each row summing to 100.0 (±rounding)."""
    if len(pred_tags) != len(gold_tags):
        raise ValueError(
            f"pred/gold length mismatch: {len(pred_tags)} vs {len(gold_tags)}"
        )
    tp: dict[str, int] = {}
    fp: dict[str, int] = {}
    fn: dict[str, int] = {}
    conf: dict[str, dict[str, int]] = {}

    def bump(gold_t: str, pred_t: str) -> None:
        row = conf.setdefault(gold_t, {})
        row[pred_t] = row.get(pred_t, 0) + 1

    for pseq, gseq in zip(pred_tags, gold_tags):
        p = _bio_entities(pseq, lenient_start)
        g = _bio_entities(gseq, lenient_start)
        for _, _, t in p & g:
            tp[t] = tp.get(t, 0) + 1
        for _, _, t in p - g:
            fp[t] = fp.get(t, 0) + 1
        for _, _, t in g - p:
            fn[t] = fn.get(t, 0) + 1
        # confusion: boundary-matched spans pair gold type with pred type;
        # unmatched gold spans go to the "O" column, unmatched pred spans
        # to the "O" row (missed / spurious).
        p_by_span = {(s, e): t for s, e, t in p}
        g_by_span = {(s, e): t for s, e, t in g}
        for span, gt in g_by_span.items():
            bump(gt, p_by_span.get(span, "O"))
        for span, pt in p_by_span.items():
            if span not in g_by_span:
                bump("O", pt)

    def prf(tp_, fp_, fn_) -> dict:
        prec = tp_ / (tp_ + fp_) if (tp_ + fp_) else 0.0
        rec = tp_ / (tp_ + fn_) if (tp_ + fn_) else 0.0
        f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
        return {"precision": prec, "recall": rec, "f1": f1,
                "support": tp_ + fn_}

    labels = sorted(set(tp) | set(fp) | set(fn))
    per_label = {
        t: prf(tp.get(t, 0), fp.get(t, 0), fn.get(t, 0)) for t in labels
    }
    micro = prf(sum(tp.values()), sum(fp.values()), sum(fn.values()))
    macro = {
        "precision": sum(d["precision"] for d in per_label.values()) / len(per_label)
        if per_label else 0.0,
        "recall": sum(d["recall"] for d in per_label.values()) / len(per_label)
        if per_label else 0.0,
        "f1": sum(d["f1"] for d in per_label.values()) / len(per_label)
        if per_label else 0.0,
        "support": micro["support"],
    }
    confusion = {
        gt: {
            pt: round(100.0 * n / sum(row.values()), 2)
            for pt, n in sorted(row.items())
        }
        for gt, row in sorted(conf.items())
    }
    return {
        "per_label": per_label, "micro": micro, "macro": macro,
        "confusion": confusion,
    }


def explain_pair(result: dict[str, ray.data.Dataset], left_id: str, right_id: str) -> dict:
    """Debug report for one pair: normalized fields, feature presence,
    estimated similarity, cluster assignments — the analog of the static
    parser's failure diagnostics (tree sizes / token windows / candidates)."""
    import numpy as np
    import pyarrow.compute as pc

    ids = pa.array([left_id, right_id], pa.string())

    def pick(ds: ray.data.Dataset, col: str = "row_id") -> list[dict]:
        return ds.map_batches(
            lambda t: t.filter(pc.is_in(t[col], value_set=ids)),
            batch_format="pyarrow",
        ).take_all()

    norm = {r["row_id"]: r for r in pick(result["normalized"])}
    feats = {r["row_id"]: r for r in pick(result["features"])}
    clus = {r["row_id"]: r for r in pick(result["clusters"])}

    report: dict = {"left_id": left_id, "right_id": right_id}
    for rid in (left_id, right_id):
        n = norm.get(rid, {})
        report[rid] = {
            "path_canonical": n.get("path_canonical"),
            "stem": n.get("stem"),
            "content_sha256_norm": n.get("content_sha256_norm"),
            "n_tokens": n.get("n_tokens"),
            "is_rep": rid in feats,
            "cluster_id": clus.get(rid, {}).get("cluster_id"),
        }
    fl, fr = feats.get(left_id), feats.get(right_id)
    if fl is not None and fr is not None:
        sl = np.frombuffer(fl["sig"], dtype=np.uint64)
        sr = np.frombuffer(fr["sig"], dtype=np.uint64)
        report["minhash_jaccard_est"] = float((sl == sr).mean())
    report["same_cluster"] = (
        clus.get(left_id, {}).get("cluster_id") is not None
        and clus.get(left_id, {}).get("cluster_id") == clus.get(right_id, {}).get("cluster_id")
    )
    return report


def suggest_matches(
    result: dict[str, ray.data.Dataset], row_id: str, k: int = 5,
    max_candidates: int = 10_000,
) -> list[dict]:
    """Ranked near-miss suggestions for one row — the analog of the static
    parser's scored suggestion list (``test/test_static_parser.py:63-71``:
    candidates scored by containment/prefix/common-token, top-k).

    Candidates = rows sharing ANY blocking key with the target (the same
    hierarchical key families the pipeline blocks on), scored by MinHash
    Jaccard estimate + stem Jaro-Winkler, ranked on (est, jw, row_id).
    Diagnostic only: one broadcast scan over the feature table."""
    import numpy as np
    import pyarrow.compute as pc

    from localhost_address_matching_ray.functions.similarity import jaro_winkler

    feats = result["features"]
    target = feats.map_batches(
        lambda t: t.filter(pc.equal(t["row_id"], row_id)), batch_format="pyarrow"
    ).take_all()
    if not target:
        return []
    tgt = target[0]
    tgt_hashes = np.asarray(tgt["block_hashes"], dtype=np.uint64)
    tgt_sig = np.frombuffer(tgt["sig"], dtype=np.uint64)
    key_arr = np.sort(tgt_hashes)

    def sharing(t: pa.Table) -> pa.Table:
        col = t["block_hashes"].combine_chunks()
        kh = col.values.to_numpy(zero_copy_only=False).astype(np.uint64)
        lengths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
        pos = np.minimum(np.searchsorted(key_arr, kh), len(key_arr) - 1)
        hit_flat = key_arr[pos] == kh
        row_hit = np.zeros(t.num_rows, dtype=bool)
        np.logical_or.at(row_hit, np.repeat(np.arange(t.num_rows), lengths), hit_flat)
        return t.select(["row_id", "sig", "stem"]).filter(pa.array(row_hit))

    cands = feats.map_batches(sharing, batch_format="pyarrow").take(max_candidates + 1)
    scored = []
    for r in cands:
        if r["row_id"] == row_id:
            continue
        est = float((np.frombuffer(r["sig"], dtype=np.uint64) == tgt_sig).mean())
        jw = jaro_winkler(tgt["stem"], r["stem"])
        scored.append({
            "row_id": r["row_id"], "stem": r["stem"],
            "minhash_jaccard_est": est, "stem_jw": round(jw, 6),
        })
    scored.sort(key=lambda d: (-d["minhash_jaccard_est"], -d["stem_jw"], d["row_id"]))
    return scored[:k]
