"""Corpus source readers beyond Parquet.

The reference's primary source is chunked CSV (S1,
``ner_address_parser.py:132-153``: 5k-row chunks, ``dtype=str``,
``keep_default_na=False``). Ray Data's streaming executor replaces the chunk
loop; these wrappers pin the same semantics: every corpus column read as
string, missing values as empty strings (never NaN — the
``keep_default_na=False`` lesson), schema coerced to the canonical corpus
schema.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]

CORPUS_SCHEMA = pa.schema([
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("lang", pa.string()),
    ("content", pa.large_string()),
])


def _coerce(batch: pa.Table) -> pa.Table:
    cols = {}
    for name in CORPUS_COLUMNS:
        col = batch[name]
        typ = pa.large_string() if name == "content" else pa.string()
        col = col.cast(typ)
        # keep_default_na=False analog: nulls become empty strings
        cols[name] = pa.compute.coalesce(col, pa.scalar("", typ))
    return pa.table(cols)


def read_corpus_parquet(paths, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, columns=columns or CORPUS_COLUMNS)


def read_corpus_csv(paths) -> ray.data.Dataset:
    """CSV corpus (S1 analog). All columns forced to string; nulls → ''."""
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        paths,
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in CORPUS_COLUMNS},
            strings_can_be_null=False,
        ),
    )
    return ds.map_batches(_coerce, batch_format="pyarrow")


def read_corpus_json(paths) -> ray.data.Dataset:
    """JSONL corpus. Same coercion contract as the CSV reader."""
    ds = ray.data.read_json(paths)
    return ds.map_batches(_coerce, batch_format="pyarrow")
