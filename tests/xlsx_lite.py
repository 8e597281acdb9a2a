"""Minimal xlsx reader (zip + sheet XML + sharedStrings) — the container has
no openpyxl; this reads the reference's calibration workbooks
(datasets/itext2kg/similar_entities/*.xlsx, similar_relations/*.xlsx), which
are plain two-column shared-string sheets."""

from __future__ import annotations

import re
import zipfile

_SI = re.compile(r"<si>(.*?)</si>", re.S)
_T = re.compile(r"<t[^>]*>(.*?)</t>", re.S)
_ROW = re.compile(r"<row[^>]*>(.*?)</row>", re.S)
_CELL = re.compile(r"<c ([^>]*?)/?>(?:<v>(.*?)</v>)?", re.S)
_ATTR_R = re.compile(r'r="([A-Z]+)\d+"')
_ATTR_T = re.compile(r't="(\w+)"')


def _unescape(s: str) -> str:
    return (
        s.replace("&lt;", "<")
        .replace("&gt;", ">")
        .replace("&quot;", '"')
        .replace("&apos;", "'")
        .replace("&amp;", "&")
    )


def read_xlsx(path: str) -> list[dict[str, str]]:
    """Rows as dicts keyed by the header row's values."""
    z = zipfile.ZipFile(path)
    shared: list[str] = []
    try:
        ss = z.read("xl/sharedStrings.xml").decode("utf-8", "replace")
        for si in _SI.findall(ss):
            shared.append(_unescape("".join(_T.findall(si))))
    except KeyError:
        pass
    sheet = z.read("xl/worksheets/sheet1.xml").decode("utf-8", "replace")
    rows = []
    for row_xml in _ROW.findall(sheet):
        cells = {}
        for attrs, val in _CELL.findall(row_xml):
            if val is None or val == "":
                continue
            mr = _ATTR_R.search(attrs)
            if not mr:
                continue
            mt = _ATTR_T.search(attrs)
            cells[mr.group(1)] = (
                shared[int(val)] if mt and mt.group(1) == "s" else _unescape(val)
            )
        rows.append(cells)
    if not rows:
        return []
    header = rows[0]
    out = []
    for r in rows[1:]:
        out.append({header.get(c, c): v for c, v in r.items()})
    return out
