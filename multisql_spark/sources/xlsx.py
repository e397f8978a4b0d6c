"""Minimal XLSX read/write on the Python stdlib (zipfile + ElementTree).

Parity target: the reference's spreadsheet backend
(`src/databases/sheet/base.rs`, `sheet/mutable.rs`) — one table per
sheet, header row, whole-book load and rewrite-on-write. No third-party
excel library exists in this image, so this implements the minimal OOXML
subset those semantics need: sharedStrings, inline strings, numeric and
boolean cells. Dates (numeric serials) surface as numbers, formulas as
their cached values.

This is an embedded small-data format (the reference loads entire books
into memory too): reads/writes materialize on the driver by design.
Big data belongs in parquet; this backend exists for source parity.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)

Cell = None | bool | int | float | str


def _col_index(ref: str) -> int:
    """'BC12' → zero-based column index of 'BC'."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def read_workbook(path: str) -> dict[str, list[list[Cell]]]:
    """All sheets as row-major cell grids (ragged rows padded later)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rel_target = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in rels
        }
        sheets: dict[str, list[list[Cell]]] = {}
        for sh in wb.find(f"{_NS}sheets"):
            name = sh.get("name")
            target = rel_target[sh.get(f"{_RNS}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            sroot = ET.fromstring(z.read(target))
            rows: list[list[Cell]] = []
            for row in sroot.iter(f"{_NS}row"):
                cells: list[Cell] = []
                for c in row.findall(f"{_NS}c"):
                    idx = _col_index(c.get("r", ""))
                    while len(cells) < idx:
                        cells.append(None)
                    cells.append(_cell_value(c, shared))
                rows.append(cells)
            sheets[name] = rows
        return sheets


def _cell_value(c, shared: list[str]) -> Cell:
    t = c.get("t", "n")
    v = c.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(
            el.text or "" for el in is_el.iter(f"{_NS}t")
        ) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() and "e" not in v.text.lower() else num


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def write_workbook(path: str, sheets: dict[str, list[list[Cell]]]) -> None:
    """Write a minimal workbook: one worksheet per dict entry, inline
    strings (no sharedStrings part needed)."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            _CONTENT_TYPES.format(
                sheet_overrides="\n".join(
                    f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                    'ContentType="application/vnd.openxmlformats-'
                    'officedocument.spreadsheetml.worksheet+xml"/>'
                    for i in range(len(names))
                )
            ),
        )
        z.writestr("_rels/.rels", _ROOT_RELS)
        sheet_tags = "".join(
            f'<sheet name="{escape(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            "<workbook"
            ' xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
            ' xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            "<Relationships"
            ' xmlns="http://schemas.openxmlformats.org/package/2006/'
            'relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
                "openxmlformats.org/officeDocument/2006/relationships/"
                f'worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, name in enumerate(names):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[name])
            )


def _sheet_xml(rows: list[list[Cell]]) -> str:
    body = []
    for r, row in enumerate(rows, start=1):
        cells = []
        for cidx, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_letter(cidx)}{r}"
            if isinstance(val, bool):
                cells.append(
                    f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>'
                )
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                    f"{escape(str(val))}</t></is></c>"
                )
        body.append(f'<row r="{r}">{"".join(cells)}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<worksheet"
        ' xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )


_IDENT_RE = re.compile(r"[^0-9A-Za-z_]")


def sheet_to_table(rows: list[list[Cell]]) -> tuple[list[str], list[list[Cell]]]:
    """Header detection per the reference's discernment
    (src/databases/csv/discern.rs:16-41 applied by the sheet backend):
    a header row is assumed iff every first-row cell is a string."""
    if not rows:
        return [], []
    width = max(len(r) for r in rows)
    padded = [list(r) + [None] * (width - len(r)) for r in rows]
    first = padded[0]
    if first and all(isinstance(c, str) for c in first):
        headers = [
            _IDENT_RE.sub("_", h) if h else f"col{i}"
            for i, h in enumerate(first)
        ]
        return headers, padded[1:]
    return [f"col{i}" for i in range(width)], padded
