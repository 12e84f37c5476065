"""Distributed OSM XML -> interleaved-docs converter.

Role of the reference's streaming SAX reader (osm_parser.erl:27-48 reads
100 KB continuation chunks so planet-size XML never sits in memory): here
the file is split into BYTE RANGES that parse in parallel — the classic
Hadoop XML-input-format re-sync trick, Spark-shaped:

* the driver plans ``ceil(size / target_chunk_bytes)`` (start, end) ranges
  (a few ints — no file data touches the driver);
* each task seeks to its range, re-syncs FORWARD to the first top-level
  element start tag (``<node`` / ``<way`` / ``<relation``) at or after
  ``start``, and parses every element whose start byte lies in
  [start, end) — reading past ``end`` to finish the last element, so
  every element is owned by exactly one range and none is split;
* elements are packed into interleaved documents of ``elements_per_doc``
  spans runs; doc ids embed (chunk, local doc) zero-padded so LEXICOGRAPHIC
  doc_id order == file stream order (the non-complete relation semantics
  depend on (doc_id, offset) ordering).

Re-sync is exact for well-formed OSM XML because a raw ``<`` cannot occur
inside attribute values (XML requires ``&lt;``); comments/CDATA containing
fake element starts are NOT supported (OSM planet dumps contain neither).

Scale notes: ranges are embarrassingly parallel (one task per ~32 MB);
peak memory per task = chunk size + one element of slop; the output is a
normal DataFrame, so the converter composes with `.write.parquet` or a
direct `extract()` without materializing the whole file anywhere.
"""

from __future__ import annotations

import math
import os
import re
import xml.etree.ElementTree as ET
from pathlib import Path
from typing import Iterator

import pandas as pd

from osm_cut_spark.sources.docs import DOC_SCHEMA, elements_to_doc_rows
from osm_cut_spark.sources.osm_xml import root_to_elements

# a top-level element start: '<node' / '<way' / '<relation' followed by a
# name-boundary char, so '<nd' or a hypothetical '<nodex' cannot match
_SYNC_RE = re.compile(rb"<(node|way|relation)[\s/>]")
_READ_BLOCK = 1 << 20
_OVERLAP = 16  # covers the longest sync tag split across read blocks


def _find_sync(f, pos: int, limit: int) -> int:
    """Offset of the first top-level element start in [``pos``, ``limit``)
    (== limit when none)."""
    f.seek(pos)
    base = pos
    carry = b""
    while base < limit:
        block = f.read(_READ_BLOCK)
        if not block:
            break
        data = carry + block
        m = _SYNC_RE.search(data)
        if m:
            found = base - len(carry) + m.start()
            return found if found < limit else limit
        carry = data[-_OVERLAP:]
        base += len(block)
    return limit


def parse_range(path: str, start: int, end: int, max_element_bytes: int = 16 << 20) -> list:
    """Canonical elements whose start byte lies in [start, end).

    The read past ``end`` (finishing the last owned element) is capped at
    ``max_element_bytes``: a malformed file with no sync point near the
    range boundary fails fast with a clear error instead of one task
    silently buffering to the end of the file.
    """
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        first = _find_sync(f, start, size)
        if first >= end or first >= size:
            return []
        cap = min(size, end + max_element_bytes)
        stop = _find_sync(f, end, cap)
        if stop == cap and cap < size:
            raise ValueError(
                f"no top-level element start within {max_element_bytes} bytes "
                f"past range end {end} of {path!r}: element oversized or file "
                "malformed (raise max_element_bytes only if elements really "
                "are this large)"
            )
        f.seek(first)
        raw = f.read(stop - first)
    # the final range carries the document tail; strip the closing root tag
    text = raw.rstrip()
    if text.endswith(b"</osm>"):
        text = text[: -len(b"</osm>")]
    root = ET.fromstring(b"<osm>" + text + b"</osm>")
    return root_to_elements(root)


def osm_xml_to_docs(
    spark,
    path: str | Path,
    target_chunk_bytes: int = 32 << 20,
    elements_per_doc: int = 1000,
    doc_prefix: str | None = None,
):
    """Distributed convert of an OSM XML file into the interleaved-docs
    DataFrame (the engine's contractual input shape).

    ``elements_per_doc`` mirrors the reference's 1000-element pipeline
    batches (osm_processor.erl:37); doc ids are ``{prefix}-{chunk:06d}-
    {doc:08d}`` so their lexicographic order is the file's element order.
    """
    path = str(path)
    prefix = doc_prefix if doc_prefix is not None else Path(path).stem
    size = os.path.getsize(path)
    n_chunks = max(1, math.ceil(size / target_chunk_bytes))
    bounds = [size * i // n_chunks for i in range(n_chunks + 1)]
    ranges = spark.createDataFrame(
        [(i, bounds[i], bounds[i + 1]) for i in range(n_chunks)],
        "chunk INT, start LONG, end LONG",
    ).repartition(n_chunks, "chunk")

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples():
                els = parse_range(path, int(row.start), int(row.end))
                if not els:
                    continue
                rows = elements_to_doc_rows(
                    els, elements_per_doc, doc_prefix=f"{prefix}-{int(row.chunk):06d}"
                )
                yield pd.DataFrame(
                    {
                        "doc_id": [r["doc_id"] for r in rows],
                        "spans": [[tuple(s) for s in r["spans"]] for r in rows],
                    }
                )

    return ranges.mapInPandas(convert, DOC_SCHEMA)
