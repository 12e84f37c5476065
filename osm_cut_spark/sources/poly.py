"""Osmosis ``.poly`` polygon file reader (driver-side, pure Python).

Format semantics match the reference reader
(``/root/reference/src/osm_polygon_compiler.erl:85-161``):

* the first line is a free-form name and is ignored (erl:88);
* each section opens with an id line; a ``!`` prefix marks an *exclude*
  ring (erl:107-114);
* coordinate lines are two whitespace-separated floats, exponent notation
  allowed (regex at erl:154-161);
* ``END`` closes a section; a further ``END`` (or EOF, which the reference
  treats as an error — we accept it leniently) closes the file (erl:104-127);
* rings are auto-closed downstream by the geometry kernel
  (extended_polygon_points, erl:140-146).

Polygon files are tiny (KBs); this runs on the driver and the compiled
result is broadcast.
"""

from __future__ import annotations

import re
from pathlib import Path

from osm_cut_spark.functions.geometry import PreparedPolygon, RingDef, prepare_polygon

_FLOAT = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"
_POINT_RE = re.compile(rf"^\s*({_FLOAT})\s+({_FLOAT})\s*$")
_SECTION_RE = re.compile(r"(!?)(\d+)")


def read_poly(path: str | Path) -> list[RingDef]:
    """Parse a .poly file into [(kind, [(x, y), ...]), ...]."""
    lines = Path(path).read_text().splitlines()
    if not lines:
        raise ValueError(f"empty .poly file: {path}")
    rings: list[RingDef] = []
    i = 1  # skip the name line
    n = len(lines)
    while i < n:
        line = lines[i].strip()
        i += 1
        if not line:
            continue
        if line.startswith("END"):
            break  # end of file marker
        m = _SECTION_RE.search(line)
        if not m:
            raise ValueError(f"polygon section header expected, got: {line!r}")
        kind = "exclude" if m.group(1) == "!" else "include"
        points: list[tuple[float, float]] = []
        while i < n:
            pline = lines[i].strip()
            i += 1
            if pline.startswith("END"):
                break
            if not pline:
                continue
            pm = _POINT_RE.match(pline)
            if not pm:
                raise ValueError(f"bad point line in {path}: {pline!r}")
            points.append((float(pm.group(1)), float(pm.group(2))))
        else:
            raise ValueError(f"section not closed with END in {path}")
        rings.append((kind, points))
    if not rings:
        raise ValueError(f"no polygon sections in {path}")
    return rings


def compile_poly(path: str | Path) -> PreparedPolygon:
    """Read + compile a .poly file into a broadcastable PreparedPolygon."""
    return prepare_polygon(read_poly(path))
