"""Minimal XLSX read/write for dimension workbooks — pure stdlib.

The reference ingests its gazetteer as an Excel workbook
(``data/ptt_data/map.py:101-125``: ``pd.read_excel`` → drop header → select
columns). This container has no openpyxl, so the adapter speaks the format
directly: an .xlsx file is a zip of XML parts, and a dimension workbook only
needs one sheet of string/number cells. The reader handles shared strings,
inline strings, formula-cached strings and numbers; the writer emits inline
strings (no sharedStrings part needed), which round-trips through this
reader AND through pandas/openpyxl.

Driver-side only, by design: dimension workbooks are small (the reference's
is 73k rows) and are read ONCE, then broadcast into worker state — the file
itself never enters the Dataset plane.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26 ..."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def _sheet_part(zf: zipfile.ZipFile, sheet: str | None) -> str:
    """Resolve the zip part name of the requested (or first) worksheet via
    workbook.xml + its rels — sheet order in the workbook is authoritative,
    not the part file names."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target") for r in rels.findall(f"{_REL_NS}Relationship")
    }
    rid_attr = (
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    )
    for sh in wb.find(f"{_NS}sheets").findall(f"{_NS}sheet"):
        if sheet is None or sh.get("name") == sheet:
            target = rid_to_target[sh.get(rid_attr)]
            if target.startswith("/"):
                # OOXML permits absolute part names ('/xl/worksheets/…');
                # they are already workbook-root-relative once de-slashed
                return target.lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise KeyError(f"sheet {sheet!r} not found in workbook")


def read_xlsx_rows(path: str, sheet: str | None = None) -> list[list[str]]:
    """Worksheet → list of rows of cell strings (missing cells → '').

    Numbers come back as their XML text (e.g. '3'); callers cast. Rows are
    padded to the max column seen so downstream indexing is safe."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                # an <si> may be plain <t> or rich-text runs of <r><t>
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        ws = ET.fromstring(zf.read(_sheet_part(zf, sheet)))
        rows: list[list[str]] = []
        max_cols = 0
        for row in ws.iter(f"{_NS}row"):
            cells: dict[int, str] = {}
            for c in row.findall(f"{_NS}c"):
                m = _CELL_REF.match(c.get("r", ""))
                ci = _col_index(m.group(1)) if m else len(cells)
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find(f"{_NS}is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(f"{_NS}t"))
                        if is_el is not None else ""
                    )
                else:
                    v = c.find(f"{_NS}v")
                    raw = v.text if v is not None and v.text is not None else ""
                    val = shared[int(raw)] if ctype == "s" and raw else raw
                cells[ci] = val
            width = max(cells) + 1 if cells else 0
            max_cols = max(max_cols, width)
            rows.append([cells.get(i, "") for i in range(width)])
        return [r + [""] * (max_cols - len(r)) for r in rows]


def _col_name(i: int) -> str:
    name = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        name = chr(ord("A") + rem) + name
    return name


def write_xlsx(path: str, rows: list[list[object]], sheet: str = "Sheet1") -> str:
    """Rows of str/int/float cells → a minimal single-sheet .xlsx (inline
    strings; numbers as number cells). Valid per ECMA-376 part 1 minimums."""
    body: list[str] = []
    for ri, row in enumerate(rows, start=1):
        cells = []
        for ci, val in enumerate(row):
            ref = f"{_col_name(ci)}{ri}"
            if isinstance(val, (int, float)) and not isinstance(val, bool):
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(val))}</t></is></c>"
                )
        body.append(f'<row r="{ri}">{"".join(cells)}</row>')
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook_xml)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return path
