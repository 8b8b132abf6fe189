"""Dependency-free .xlsx codec (stdlib zipfile + ElementTree).

Parity: reference `datagrunt_agent/sql/ingestion/load_excel.sql` loads
.xlsx inboxes end-to-end. No Excel library ships in this container, but
xlsx is a ZIP of XML parts — this module reads and writes the minimal
SpreadsheetML subset the ingestion path needs: one sheet, a header row,
shared/inline strings, numeric and boolean cells.

Reader compatibility: handles sharedStrings (what Excel/openpyxl
emit), inline strings (what this writer emits), formula-result cells
(`t="str"`), and booleans. Writer emits inline strings so no
sharedStrings table is needed.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(ref: str) -> int:
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def write_xlsx(path_or_buf, header: list[str], rows: list[tuple]) -> None:
    """Write one sheet with a header row; strings inline, numbers and
    booleans typed."""

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
        )

    lines = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>',
    ]
    for r, vals in enumerate([tuple(header)] + [tuple(r) for r in rows]):
        cells = "".join(
            cell_xml(f"{_col_letter(c)}{r + 1}", v)
            for c, v in enumerate(vals)
        )
        lines.append(f'<row r="{r + 1}">{cells}</row>')
    lines.append("</sheetData></worksheet>")
    sheet = "\n".join(lines)

    with zipfile.ZipFile(path_or_buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def read_xlsx(path_or_bytes) -> tuple[list[str], list[list]]:
    """Parse the first worksheet into (header, rows). Numeric cells
    come back as float, booleans as bool, everything else as str;
    gaps are None."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    with zipfile.ZipFile(src) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet_names = sorted(
            n
            for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheet_names:
            raise ValueError("no worksheet found")
        root = ET.fromstring(z.read(sheet_names[0]))

    grid: list[dict[int, object]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row.findall(f"{_NS}c"):
            ref = c.get("r") or f"{_col_letter(len(cells))}1"
            idx = _col_index(ref)
            t = c.get("t", "n")
            if t == "inlineStr":
                cells[idx] = "".join(
                    el.text or "" for el in c.iter(f"{_NS}t")
                )
                continue
            v = c.find(f"{_NS}v")
            if v is None or v.text is None:
                cells[idx] = None
            elif t == "s":
                cells[idx] = shared[int(v.text)]
            elif t == "b":
                cells[idx] = v.text == "1"
            elif t == "str":
                cells[idx] = v.text
            else:
                cells[idx] = float(v.text)
        grid.append(cells)

    if not grid:
        return [], []
    width = max(max(g) + 1 for g in grid if g) if any(grid) else 0
    dense = [[g.get(i) for i in range(width)] for g in grid]
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(dense[0])]
    return header, dense[1:]
