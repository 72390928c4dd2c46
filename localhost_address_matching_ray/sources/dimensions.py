"""File-driven dimension-table ingestion (S3).

The reference loads its 73k-row gazetteer workbook once at startup and
broadcasts it into parser state (``data/ptt_data/map.py:101-125`` —
``pd.read_excel``, drop header, select columns, build dict). The analog here:
a per-language config table (the engine's dimension side) read ONCE on the
driver from Parquet/CSV, turned into ``LangConfig`` objects, and carried into
worker state via ``PipelineConfig.lang_configs`` →
``FeatureExtractor.__init__`` — the broadcast-small-side pattern; the
dimension never shuffles.

File schema (Parquet native types, or CSV with ``|``-separated list cells):

  lang           string        (key — duplicate langs: last row wins, like a
                                dict build)
  comment_styles list<string>  comment openers ('#', '//', '/*')
  stop_tokens    list<string>  tokens stripped before shingling
  shingle_k      int           per-lang shingle width
"""

from __future__ import annotations

import os

import pyarrow as pa

from localhost_address_matching_ray.config import LangConfig


def write_lang_configs(configs: dict[str, LangConfig], path: str) -> str:
    """Serialize a LangConfig dict to a dimension file (.parquet or .csv)."""
    langs = sorted(configs)
    rows = [configs[lang] for lang in langs]
    if path.endswith(".xlsx"):
        from localhost_address_matching_ray.sources.xlsx import write_xlsx

        return write_xlsx(path, [
            ["lang", "comment_styles", "stop_tokens", "shingle_k"],
            *[
                [lc.lang, "|".join(lc.comment_styles), "|".join(lc.stop_tokens),
                 lc.shingle_k]
                for lc in rows
            ],
        ])
    if path.endswith(".csv"):
        import csv

        with open(path, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            w.writerow(["lang", "comment_styles", "stop_tokens", "shingle_k"])
            for lc in rows:
                w.writerow([
                    lc.lang, "|".join(lc.comment_styles), "|".join(lc.stop_tokens),
                    lc.shingle_k,
                ])
        return path
    import pyarrow.parquet as pq

    t = pa.table({
        "lang": pa.array([lc.lang for lc in rows], pa.string()),
        "comment_styles": pa.array(
            [list(lc.comment_styles) for lc in rows], pa.list_(pa.string())
        ),
        "stop_tokens": pa.array(
            [list(lc.stop_tokens) for lc in rows], pa.list_(pa.string())
        ),
        "shingle_k": pa.array([lc.shingle_k for lc in rows], pa.int32()),
    })
    pq.write_table(t, path)
    return path


def load_lang_configs(path: str) -> dict[str, LangConfig]:
    """Driver-side one-time read of the dimension file → LangConfig dict
    (the ``Turkey.load`` analog). Accepts .parquet, .csv or .xlsx (the
    reference's gazetteer is an Excel workbook, map.py:101-125: read, drop
    the header row, select columns — mirrored here via the stdlib xlsx
    reader; duplicate langs: last row wins, like a dict build)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".xlsx":
        from localhost_address_matching_ray.sources.xlsx import read_xlsx_rows

        rows = read_xlsx_rows(path)
        if not rows:
            return {}
        header = rows[0]
        idx = {name: i for i, name in enumerate(header)}
        out: dict[str, LangConfig] = {}
        for row in rows[1:]:
            lang = row[idx["lang"]]
            if not lang:
                continue
            out[lang] = LangConfig(
                lang=lang,
                comment_styles=tuple(
                    s for s in row[idx["comment_styles"]].split("|") if s
                ),
                stop_tokens=tuple(
                    s for s in row[idx["stop_tokens"]].split("|") if s
                ),
                shingle_k=int(float(row[idx["shingle_k"]])),
            )
        return out
    if ext == ".csv":
        import csv

        out: dict[str, LangConfig] = {}
        with open(path, newline="", encoding="utf-8") as f:
            for row in csv.DictReader(f):
                out[row["lang"]] = LangConfig(
                    lang=row["lang"],
                    comment_styles=tuple(
                        s for s in row["comment_styles"].split("|") if s
                    ),
                    stop_tokens=tuple(s for s in row["stop_tokens"].split("|") if s),
                    shingle_k=int(row["shingle_k"]),
                )
        return out
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    out = {}
    for lang, styles, stops, k in zip(
        t["lang"].to_pylist(), t["comment_styles"].to_pylist(),
        t["stop_tokens"].to_pylist(), t["shingle_k"].to_pylist(),
    ):
        out[lang] = LangConfig(
            lang=lang,
            comment_styles=tuple(styles or ()),
            stop_tokens=tuple(stops or ()),
            shingle_k=int(k),
        )
    return out
