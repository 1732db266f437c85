"""Minimal pure-stdlib .xlsx reader/writer (S5 dimension source).

The reference ingests ``Tariffs.xlsx`` through ``pd.read_excel``
(`data_preprocessing.py:57-64`), which needs openpyxl. Dimension
tables are tiny by contract, so a dependency-free parser is enough:
an .xlsx file is a zip of XML parts (ECMA-376 / ISO 29500
SpreadsheetML), and the subset a tabular dimension uses is just
``xl/workbook.xml`` (sheet list), ``xl/sharedStrings.xml`` (string
pool) and ``xl/worksheets/sheetN.xml`` (cells).

Scope (documented, not silent): cell types number / shared string /
inline string / boolean / formula-cached-string. Excel serial-date
*styles* are not decoded - store dates as ISO strings (what the
fixture writer does) and parse downstream.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

_NS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKGREL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB3' -> 27."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_letters(idx: int) -> str:
    """0 -> 'A', 27 -> 'AB'."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    # A shared string item may be a plain <t> or rich-text runs <r><t>;
    # concatenating every descendant <t> covers both.
    return ["".join(t.text or "" for t in si.iter(f"{_NS_MAIN}t")) for si in root]


def _sheet_part(zf: zipfile.ZipFile, sheet: int | str) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.find(f"{_NS_MAIN}sheets")
    rels = {
        rel.get("Id"): rel.get("Target")
        for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")).iter(
            f"{_NS_PKGREL}Relationship"
        )
    }
    chosen = None
    for i, sh in enumerate(sheets):
        if sheet == i or sheet == sh.get("name"):
            chosen = rels[sh.get(f"{_NS_REL}id")]
            break
    if chosen is None:
        raise ValueError(f"sheet {sheet!r} not found in workbook")
    if chosen.startswith("/"):
        return chosen.lstrip("/")
    return f"xl/{chosen}"


def _cell_value(cell: ET.Element, strings: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        is_el = cell.find(f"{_NS_MAIN}is")
        return "".join(t.text or "" for t in is_el.iter(f"{_NS_MAIN}t"))
    v = cell.find(f"{_NS_MAIN}v")
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return strings[int(v.text)]
    if ctype == "b":
        return bool(int(v.text))
    if ctype == "str":  # formula cached string
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx(path: str, sheet: int | str = 0, header: bool = True) -> pd.DataFrame:
    """Parse one worksheet into a pandas DataFrame (first row = header)."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_part(zf, sheet)))
        rows: list[dict[int, object]] = []
        for row in root.iter(f"{_NS_MAIN}row"):
            cells: dict[int, object] = {}
            for pos, cell in enumerate(row):
                ref = cell.get("r")
                cells[_col_index(ref) if ref else pos] = _cell_value(cell, strings)
            rows.append(cells)
    if not rows:
        return pd.DataFrame()
    width = max(max(r, default=-1) for r in rows) + 1
    table = [[r.get(i) for i in range(width)] for r in rows]
    if header:
        cols = [str(c) if c is not None else f"col{i}" for i, c in enumerate(table[0])]
        return pd.DataFrame(table[1:], columns=cols)
    return pd.DataFrame(table)


_XLSX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_XLSX_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_XLSX_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="{name}" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_XLSX_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def write_xlsx(path: str, pdf: pd.DataFrame, sheet_name: str = "Sheet1") -> None:
    """Write a small DataFrame as .xlsx (inline strings + numbers).

    Fixture/test writer for the S5 round-trip - dimension-sized data
    only; everything non-numeric is serialized as an inline string.
    """
    lines = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">',
        "<sheetData>",
    ]
    all_rows = [list(pdf.columns)] + pdf.values.tolist()
    for rn, row in enumerate(all_rows, start=1):
        lines.append(f'<row r="{rn}">')
        for cn, val in enumerate(row):
            ref = f"{_col_letters(cn)}{rn}"
            if val is None or (isinstance(val, float) and pd.isna(val)):
                continue
            if isinstance(val, bool):
                lines.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                lines.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                lines.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{_xml_escape(str(val))}</t></is></c>'
                )
        lines.append("</row>")
    lines += ["</sheetData>", "</worksheet>"]
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        zf.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        zf.writestr("xl/workbook.xml", _XLSX_WORKBOOK.format(name=_xml_escape(sheet_name)))
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", "".join(lines))
