"""Stdlib .xlsx codec (no openpyxl/xlrd): SURVEY.md S4 real path.

An .xlsx workbook is a zip of XML parts (ECMA-376 SpreadsheetML):
``xl/workbook.xml`` lists sheets, ``xl/_rels/workbook.xml.rels`` maps
them to ``xl/worksheets/sheetN.xml`` parts, and shared strings live in
``xl/sharedStrings.xml``. ``zipfile`` + ``xml.etree`` parse all of it;
this module reads real workbooks (ref MultiModalHelper.py:334,381-387
and DemandHelper.py:1379,1537 read BART/CPI/EIA .xls sheets) and also
writes minimal-but-valid workbooks so tests can commit genuine
fixtures without an Excel installation.

Excel sheets here are small dimension inputs (hundreds of rows), so
parsing is driver-side; the result feeds ``spark.createDataFrame`` as
a broadcastable dim — the right scale shape against a 100 TB fact
side.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


class Formula(str):
    """Marks a cell value as an Excel formula (written as ``<f>`` —
    spreadsheet apps calculate it on open). Example:
    ``Formula("E14-F14")``."""


def _col_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26, ..."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(65 + rem) + letters
    return letters


def _local(tag: str) -> str:
    return tag.rpartition("}")[2]


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    strings = []
    for si in ET.fromstring(data):
        if _local(si.tag) != "si":
            continue
        # plain <t> or rich-text runs <r><t>; concatenate every <t>
        strings.append(
            "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
        )
    return strings


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip member path)] in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {}
    for rel in rels:
        target = rel.get("Target", "")
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = "xl/" + target
        rel_target[rel.get("Id")] = target
    out = []
    for el in wb.iter():
        if _local(el.tag) != "sheet":
            continue
        rid = next(
            (v for k, v in el.attrib.items() if _local(k) == "id"), None
        )
        out.append((el.get("name"), rel_target.get(rid)))
    return out


def _cell_value(cell: ET.Element, shared: list[str]):
    ctype = cell.get("t", "n")
    v_el = next((c for c in cell if _local(c.tag) == "v"), None)
    if ctype == "inlineStr":
        return "".join(
            t.text or "" for t in cell.iter() if _local(t.tag) == "t"
        )
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if ctype == "s":
        return shared[int(raw)]
    if ctype == "str":
        return raw
    if ctype == "b":
        return bool(int(raw))
    num = float(raw)
    return int(num) if num.is_integer() else num


def read_xlsx_raw(path: str, sheet: int | str = 0) -> list[list]:
    """Parse one worksheet into a raw row-major grid (lists padded
    with None). Real zip + SpreadsheetML parse, stdlib only."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        parts = _sheet_parts(zf)
        if isinstance(sheet, str):
            member = dict(parts).get(sheet)
            if member is None:
                raise KeyError(
                    f"no sheet named {sheet!r}; have {[n for n, _ in parts]}"
                )
        else:
            member = parts[sheet][1]
        root = ET.fromstring(zf.read(member))
        rows: dict[int, dict[int, object]] = {}
        max_col = -1
        for row_el in root.iter():
            if _local(row_el.tag) != "row":
                continue
            for cell in row_el:
                if _local(cell.tag) != "c":
                    continue
                ref = cell.get("r")
                m = _CELL_REF.fullmatch(ref or "")
                if not m:
                    continue
                ci = _col_index(m.group(1))
                ri = int(m.group(2)) - 1
                val = _cell_value(cell, shared)
                if val is not None:
                    rows.setdefault(ri, {})[ci] = val
                    max_col = max(max_col, ci)
    if not rows:
        return []
    n_rows = max(rows) + 1
    return [
        [rows.get(r, {}).get(c) for c in range(max_col + 1)]
        for r in range(n_rows)
    ]


def read_xlsx_grid(
    path: str,
    sheet: int | str = 0,
    header: int = 0,
    index_col: int | None = 0,
    skiprows: int | None = None,
) -> pd.DataFrame:
    """Worksheet → pandas grid with ``read_csv``-style header /
    index_col / skiprows semantics (drop-in for the CSV fixture path
    in :func:`sources.excel.read_sheet_grid`)."""
    raw = read_xlsx_raw(path, sheet=sheet)
    if skiprows:
        raw = raw[skiprows:]
    header_row = raw[header]
    data = raw[header + 1 :]
    frame = pd.DataFrame(data, columns=header_row)
    if index_col is not None:
        frame = frame.set_index(frame.columns[index_col])
        frame.index.name = header_row[index_col]
    return frame


# ---------------------------------------------------------------------------
# writer (valid minimal workbook — used to build committed fixtures)
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
{overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def write_xlsx(path: str, sheets: dict[str, list[list]]) -> None:
    """{sheet name: row-major grid} → a real .xlsx file. Strings go
    through sharedStrings (t="s"), numbers are inline, None cells are
    omitted — the standard layout every Excel reader expects."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xmls = []
    for grid in sheets.values():
        rows_xml = []
        for ri, row in enumerate(grid):
            cells = []
            for ci, val in enumerate(row):
                if val is None or (isinstance(val, float) and val != val):
                    continue
                ref = f"{_col_letters(ci)}{ri + 1}"
                if isinstance(val, Formula):
                    cells.append(f'<c r="{ref}"><f>{escape(val)}</f></c>')
                elif isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
                else:
                    cells.append(
                        f'<c r="{ref}" t="s"><v>{sref(str(val))}</v></c>'
                    )
            rows_xml.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
        sheet_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main"><sheetData>'
            + "".join(rows_xml)
            + "</sheetData></worksheet>"
        )

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet_tags = "".join(
        f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, name in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{rns}">'
        f"<sheets>{sheet_tags}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/'
        'package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{rns}/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + f'<Relationship Id="rId{len(sheets) + 1}" '
        f'Type="{rns}/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    shared_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<sst xmlns="{ns}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheets))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(overrides=overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", shared_xml)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
