"""Minimal XLSX (SpreadsheetML) reader/writer — stdlib zipfile + XML.

The reference reads Swiss PRTR point sources from an Excel file
(``pd.read_excel``, emiproc/inventories/swiss.py:442) via openpyxl,
which this container does not ship.  XLSX is a public OOXML format
(ECMA-376): a zip holding ``xl/workbook.xml``, ``xl/worksheets/
sheetN.xml`` and ``xl/sharedStrings.xml``.  This module implements the
subset needed for tabular data files: shared/inline strings, numbers,
the first worksheet — enough to decode the PRTR publication (and to
write fixtures for tests).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    col = 0
    for ch in ref:
        if ch.isalpha():
            col = col * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return col - 1


def read_xlsx(
    path: str,
    header_row: int = 0,
    skip_rows: tuple[int, ...] = (),
    sheet_index: int = 0,
) -> pd.DataFrame:
    """First-worksheet XLSX → DataFrame.  ``header_row``/``skip_rows``
    are 0-based physical row indexes (pandas ``skiprows`` analogue)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        sheet_names = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError(f"no worksheets in {path}")
        root = ET.fromstring(z.read(sheet_names[sheet_index]))

    rows: list[tuple[int, dict[int, object]]] = []
    for row in root.iter(f"{NS}row"):
        cells: dict[int, object] = {}
        for c in row.findall(f"{NS}c"):
            ref = c.get("r", "")
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                val = "".join(t.text or "" for t in c.iter(f"{NS}t"))
            else:
                v = c.find(f"{NS}v")
                if v is None or v.text is None:
                    continue
                if ctype == "s":
                    val = shared[int(v.text)]
                elif ctype in ("str", "b"):
                    val = v.text
                else:
                    try:
                        val = float(v.text)
                    except ValueError:
                        val = v.text
            cells[_col_index(ref)] = val
        rows.append((int(row.get("r", len(rows) + 1)) - 1, cells))

    by_index = dict(rows)
    if header_row not in by_index:
        raise ValueError(f"header row {header_row} missing in {path}")
    header = by_index[header_row]
    ncols = max(header) + 1
    names = [str(header.get(i, f"col{i}")) for i in range(ncols)]
    data = []
    skip = set(skip_rows) | {header_row}
    for idx in sorted(by_index):
        if idx in skip:
            continue
        cells = by_index[idx]
        data.append([cells.get(i) for i in range(ncols)])
    return pd.DataFrame(data, columns=names)


def write_xlsx(path: str, rows: list[list[object]]) -> str:
    """Minimal single-sheet writer (inline strings) for fixtures."""

    def cell(ref: str, v: object) -> str:
        if v is None:
            return ""
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        txt = (
            str(v).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
        return f'<c r="{ref}" t="inlineStr"><is><t>{txt}</t></is></c>'

    def colname(i: int) -> str:
        name = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            name = chr(ord("A") + rem) + name
        return name

    body = []
    for r, row in enumerate(rows, start=1):
        cells = "".join(cell(f"{colname(i)}{r}", v) for i, v in enumerate(row))
        body.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    return path
