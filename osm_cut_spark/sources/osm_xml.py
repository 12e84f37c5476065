"""Driver-side OSM XML fixture loader (small files only — tests/fixtures).

Produces the engine's canonical element dicts from an OSM XML file, with
the same typed-projection semantics as the reference parser
(/root/reference/src/osm_parser.erl:232-325): id/version/uid/changeset ->
int, lon/lat -> float, timestamp/user kept as opaque strings, absent
attributes tolerated (way 2 in the 1.osm fixture has no metadata), tags as
ordered (k, v) pairs, way nd-refs and relation member triples in document
order.

This is NOT a distributed scan: planet-scale input arrives as the
interleaved document table (see sources/docs.py). The XML path exists so
the reference's fixture files can be loaded verbatim for golden tests.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Any

Element = dict[str, Any]

_INT_ATTRS = ("version", "uid", "changeset")
_STR_ATTRS = ("timestamp", "user")


def _meta(attrs: dict[str, str]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k in _INT_ATTRS:
        out[k] = int(attrs[k]) if k in attrs else None
    for k in _STR_ATTRS:
        out[k] = attrs.get(k)
    return out


def load_osm_xml(path: str | Path) -> list[Element]:
    """Parse an OSM XML file into ordered canonical element dicts."""
    root = ET.parse(str(path)).getroot()
    if root.tag != "osm":
        raise ValueError(f"not an OSM file: root tag {root.tag!r}")
    return root_to_elements(root)


def root_to_elements(root: ET.Element) -> list[Element]:
    """Canonical element dicts from a parsed <osm> (or fragment) root —
    shared by the fixture loader and the distributed chunk parser."""
    elements: list[Element] = []
    for el in root:
        if el.tag == "bound":  # ignored, like osm_parser.erl:119-120
            continue
        tags = [(t.attrib["k"], t.attrib["v"]) for t in el if t.tag == "tag"]
        if el.tag == "node":
            elements.append(
                {
                    "kind": "node",
                    "id": int(el.attrib["id"]),
                    "lon": float(el.attrib["lon"]),
                    "lat": float(el.attrib["lat"]),
                    **_meta(el.attrib),
                    "tags": tags,
                }
            )
        elif el.tag == "way":
            elements.append(
                {
                    "kind": "way",
                    "id": int(el.attrib["id"]),
                    "nds": [int(nd.attrib["ref"]) for nd in el if nd.tag == "nd"],
                    **_meta(el.attrib),
                    "tags": tags,
                }
            )
        elif el.tag == "relation":
            elements.append(
                {
                    "kind": "relation",
                    "id": int(el.attrib["id"]),
                    "members": [
                        (m.attrib["type"], int(m.attrib["ref"]), m.attrib.get("role", ""))
                        for m in el
                        if m.tag == "member"
                    ],
                    **_meta(el.attrib),
                    "tags": tags,
                }
            )
    return elements
