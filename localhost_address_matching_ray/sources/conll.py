"""CoNLL labeled-corpus interchange IO (S5/S6).

Block format — exactly the reference's (``group_A2E_BIO_synth.py:430-441``
writer, training-notebook ``read_conll_blocks`` reader):

    <raw>, <rid>, <group>
    token<TAB>tag
    token<TAB>tag

    <raw>, <rid>, <group>
    ...

(one header line per sample, one ``token\\ttag`` line per token, blank-line
separated blocks). The Dataset carries the same fields as native columns:
``raw: string, rid: string, group: string, tokens: list<string>,
tags: list<string>``.

Distribution model: the writer emits one ``part-*.conll`` file per Arrow
batch from inside ``map_batches`` (tasks write independently — per-block
files, resumable output); the reader treats one file as one parse task
(``read_binary_files`` → ``flat_map``-style block parse), since CoNLL blocks
cannot be split mid-file.
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import ray.data

CONLL_SCHEMA = pa.schema([
    ("raw", pa.string()),
    ("rid", pa.string()),
    ("group", pa.string()),
    ("tokens", pa.list_(pa.string())),
    ("tags", pa.list_(pa.string())),
])


def _block_text(raw: str, rid: str, group: str, tokens, tags) -> str:
    lines = [f"{raw}, {rid}, {group}"]
    lines.extend(f"{tok}\t{tag}" for tok, tag in zip(tokens, tags))
    return "\n".join(lines)


def write_conll(ds: ray.data.Dataset, out_dir: str) -> list[str]:
    """Write a labeled Dataset (CONLL_SCHEMA columns) as CoNLL part files;
    returns the written paths."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        blocks = [
            _block_text(r, i, g, tk, tg)
            for r, i, g, tk, tg in zip(
                t["raw"].to_pylist(), t["rid"].to_pylist(), t["group"].to_pylist(),
                t["tokens"].to_pylist(), t["tags"].to_pylist(),
            )
        ]
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.conll")
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n\n".join(blocks) + "\n")
        os.replace(tmp, path)  # atomic per part (map.py:200-203 pattern)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_blocks": pa.array([len(blocks)], pa.int64())})

    manifest = ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=4096
    ).take_all()
    return sorted(r["path"] for r in manifest)


def parse_conll_text(text: str) -> list[dict]:
    """One file's text → list of {raw, rid, group, tokens, tags} dicts
    (``read_conll_blocks`` analog; header = last-two-comma split so the raw
    text may itself contain commas)."""
    samples = []
    for block in text.split("\n\n"):
        lines = [ln for ln in block.split("\n") if ln.strip()]
        if not lines:
            continue
        header = lines[0]
        raw, rid, group = header.rsplit(", ", 2)
        tokens, tags = [], []
        for ln in lines[1:]:
            tok, _, tag = ln.partition("\t")
            tokens.append(tok)
            tags.append(tag)
        samples.append({
            "raw": raw, "rid": rid, "group": group,
            "tokens": tokens, "tags": tags,
        })
    return samples


def read_conll(paths: str | list[str]) -> ray.data.Dataset:
    """CoNLL files → Dataset with CONLL_SCHEMA columns; one file per task."""
    files = ray.data.read_binary_files(paths, file_extensions=["conll"])

    def parse(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for data in batch["bytes"].to_pylist():
            rows.extend(parse_conll_text(data.decode("utf-8")))
        return pa.table({
            "raw": pa.array([r["raw"] for r in rows], pa.string()),
            "rid": pa.array([r["rid"] for r in rows], pa.string()),
            "group": pa.array([r["group"] for r in rows], pa.string()),
            "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.string())),
            "tags": pa.array([r["tags"] for r in rows], pa.list_(pa.string())),
        })

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)
