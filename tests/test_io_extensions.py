"""S3/S5/S6 + §2.10 surfaces: file-driven dimension ingestion into actor
state, CoNLL round-trip, and the extra_rules user-rewrite hook."""

import pyarrow as pa
import ray.data

from localhost_address_matching_ray.config import LangConfig, PipelineConfig
from localhost_address_matching_ray.sources.conll import read_conll, write_conll
from localhost_address_matching_ray.sources.dimensions import (
    load_lang_configs,
    write_lang_configs,
)


def _dim_configs():
    return {
        "python": LangConfig("python", ("#",), ("def", "import"), 3),
        "mylang": LangConfig("mylang", ("//", "/*"), ("begin", "end"), 2),
        "plain": LangConfig("plain", (), (), 4),
    }


def test_lang_config_roundtrip_parquet(tmp_path):
    p = str(tmp_path / "dims.parquet")
    write_lang_configs(_dim_configs(), p)
    assert load_lang_configs(p) == _dim_configs()


def test_lang_config_roundtrip_csv(tmp_path):
    p = str(tmp_path / "dims.csv")
    write_lang_configs(_dim_configs(), p)
    assert load_lang_configs(p) == _dim_configs()


def test_lang_config_roundtrip_xlsx(tmp_path):
    """The reference's gazetteer source is an Excel workbook
    (map.py:101-125) — the .xlsx path must round-trip like parquet/csv."""
    p = str(tmp_path / "dims.xlsx")
    write_lang_configs(_dim_configs(), p)
    assert load_lang_configs(p) == _dim_configs()


def test_xlsx_reader_handles_shared_strings_and_gaps(tmp_path):
    """Excel-authored workbooks use sharedStrings and omit empty cells —
    build one by hand (sharedStrings part + sparse cell refs) and check the
    reader reconstructs rows with gaps filled and numbers as text."""
    import zipfile

    from localhost_address_matching_ray.sources.xlsx import (
        read_xlsx_rows,
        write_xlsx,
    )

    # start from our own writer for the envelope, then swap in a
    # sharedStrings-based sheet like Excel emits
    p = str(tmp_path / "excel_style.xlsx")
    write_xlsx(p, [["placeholder"]])
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row>'
        "</sheetData></worksheet>"
    )
    sst = (
        f'<?xml version="1.0"?><sst {ns} count="3" uniqueCount="3">'
        "<si><t>lang</t></si><si><t>k</t></si>"
        "<si><r><t>py</t></r><r><t>thon</t></r></si></sst>"  # rich-text runs
    )
    with zipfile.ZipFile(p) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/worksheets/sheet1.xml"] = sheet.encode()
    parts["xl/sharedStrings.xml"] = sst.encode()
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    rows = read_xlsx_rows(p)
    assert rows == [["lang", "", "k"], ["python", "42", ""]]


def test_xlsx_reader_handles_absolute_rel_targets(tmp_path):
    """OOXML permits absolute part names in relationship Targets
    ('/xl/worksheets/sheet1.xml'); the resolver must not double-prefix."""
    import zipfile

    from localhost_address_matching_ray.sources.xlsx import read_xlsx_rows, write_xlsx

    p = str(tmp_path / "abs_target.xlsx")
    write_xlsx(p, [["a", "b"], ["1", "2"]])
    with zipfile.ZipFile(p) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    parts["xl/_rels/workbook.xml.rels"] = parts["xl/_rels/workbook.xml.rels"].replace(
        b'Target="worksheets/sheet1.xml"', b'Target="/xl/worksheets/sheet1.xml"'
    )
    assert b"/xl/worksheets/sheet1.xml" in parts["xl/_rels/workbook.xml.rels"]
    with zipfile.ZipFile(p, "w") as zf:
        for n, data in parts.items():
            zf.writestr(n, data)
    assert read_xlsx_rows(p) == [["a", "b"], ["1", "2"]]


def test_dimension_file_drives_actor_state(tmp_path):
    """File → LangConfig dict → feature-stage worker state: the per-lang
    comment style from the FILE decides which tokens survive (map.py:101-125
    broadcast analog: reference data and query data share one config)."""
    from localhost_address_matching_ray.stages.feature_stage import extract_features

    p = str(tmp_path / "dims.parquet")
    write_lang_configs(_dim_configs(), p)
    cfg = PipelineConfig(lang_configs=load_lang_configs(p))

    corpus = ray.data.from_arrow(pa.table({
        "row_id": pa.array([format(1, "016x"), format(2, "016x")], pa.string()),
        "lang": pa.array(["mylang", "plain"], pa.string()),
        "stem": pa.array(["a", "a"], pa.string()),
        # identical content except a //-comment: in mylang the comment is
        # stripped (configured style), in plain it is kept
        "content": pa.array(
            ["alpha beta // zap\ngamma delta", "alpha beta // zap\ngamma delta"],
            pa.large_string(),
        ),
    }))
    out = extract_features(corpus, cfg).take_all()
    by_lang = {r["lang"]: r for r in out}
    assert by_lang["mylang"]["n_tokens_sig"] < by_lang["plain"]["n_tokens_sig"]


def test_conll_roundtrip(tmp_path):
    rows = pa.table({
        "raw": pa.array(["istanbul, kadikoy mah 3", "short one"], pa.string()),
        "rid": pa.array(["r1", "r2"], pa.string()),
        "group": pa.array(["A", "B"], pa.string()),
        "tokens": pa.array(
            [["istanbul", "kadikoy", "mah", "3"], ["short", "one"]],
            pa.list_(pa.string()),
        ),
        "tags": pa.array(
            [["B-IL", "B-M", "I-M", "B-NUM"], ["O", "O"]], pa.list_(pa.string())
        ),
    })
    out_dir = str(tmp_path / "conll")
    paths = write_conll(ray.data.from_arrow(rows), out_dir)
    assert paths and all(p.endswith(".conll") for p in paths)
    back = read_conll(paths).take_all()
    got = sorted((r["rid"], r["raw"], tuple(r["tokens"]), tuple(r["tags"]),
                  r["group"]) for r in back)
    want = sorted((r, raw, tuple(tk), tuple(tg), g) for raw, r, g, tk, tg in zip(
        rows["raw"].to_pylist(), rows["rid"].to_pylist(), rows["group"].to_pylist(),
        rows["tokens"].to_pylist(), rows["tags"].to_pylist(),
    ))
    assert got == want


def test_conll_header_commas_survive():
    """Raw text containing ', ' round-trips (header split is last-two)."""
    from localhost_address_matching_ray.sources.conll import (
        _block_text,
        parse_conll_text,
    )

    raw = "a, b, c street"
    block = _block_text(raw, "id9", "G", ["a,", "b,"], ["O", "O"])
    got = parse_conll_text(block)
    assert got[0]["raw"] == raw and got[0]["rid"] == "id9"


def test_extra_rules_rewrite_affects_dedup():
    """User rule folding colour→color makes the two spellings exact dups
    (content_sha256_norm equal) — the extra_rules chain-extension semantics."""
    from localhost_address_matching_ray.stages.normalize_stage import normalize_corpus

    corpus = ray.data.from_arrow(pa.table({
        "repo": pa.array(["r", "r"], pa.string()),
        "path": pa.array(["a.py", "b.py"], pa.string()),
        "commit": pa.array(["c1", "c2"], pa.string()),
        "lang": pa.array(["python", "python"], pa.string()),
        "content": pa.array(
            ["the colour map", "the color map"], pa.large_string()
        ),
    }))
    plain = normalize_corpus(corpus).take_all()
    assert plain[0]["content_sha256_norm"] != plain[1]["content_sha256_norm"]
    ruled = normalize_corpus(
        corpus, extra_rules=((r"\bcolour\b", "color"),)
    ).take_all()
    assert ruled[0]["content_sha256_norm"] == ruled[1]["content_sha256_norm"]
