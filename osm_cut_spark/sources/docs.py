"""Interleaved-document table codec + deterministic synthetic generator.

The engine's primary input (BASELINE.json ``input_hint``) is an
Iceberg-style table::

    documents_interleaved(doc_id string,
                          spans array<struct<kind string, text string,
                                             media_ref string, offset int>>)

OSM elements are encoded as span runs inside a document, mirroring the
element stream the reference consumes (nodes -> ways -> relations,
/root/reference/src/osm_parser.erl:114-152):

* ``node`` / ``way`` / ``relation`` parent span: ``text`` = canonical JSON
  of the element attributes (sorted keys, compact separators, absent attrs
  omitted — the permissive-attr semantics of osm_parser.erl:232-263);
* followed by child spans in document order: ``nd`` ({"ref": n}),
  ``member`` ({"ref","role","type"}), ``tag`` ({"k","v"});
* interleaved free-text ``text`` spans and ``media`` spans (opaque
  ``media_ref``, binary payload lives elsewhere) may appear between
  elements — they belong to the document, not to any element;
* ``offset`` is the 0-based span position in the document; spans are
  stored offset-sorted.  The per-row correctness invariant is
  span-sequence equality on (kind, text, media_ref, order).

Fidelity rule: downstream operators NEVER re-serialize attribute JSON —
they carry the original span text through and re-emit it verbatim (only
filtering child spans and renumbering offsets), so output span equality is
byte-exact regardless of float-rendering differences between runtimes.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import numpy as np
import pandas as pd

from pyspark.sql import types as T

from osm_cut_spark.sources.osm_xml import Element

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)

_META_KEYS = ("version", "timestamp", "uid", "user", "changeset")


def _cjson(obj: dict[str, Any]) -> str:
    """Canonical JSON: sorted keys, compact, None values omitted."""
    return json.dumps(
        {k: v for k, v in obj.items() if v is not None},
        sort_keys=True,
        separators=(",", ":"),
    )


Span = tuple[str, str | None, str | None, int]  # kind, text, media_ref, offset


def element_to_spans(el: Element, start_offset: int = 0) -> list[Span]:
    """Encode one canonical element dict into its span run."""
    kind = el["kind"]
    attrs: dict[str, Any] = {"id": el["id"]}
    if kind == "node":
        attrs["lon"] = float(el["lon"])
        attrs["lat"] = float(el["lat"])
    for k in _META_KEYS:
        attrs[k] = el.get(k)
    off = start_offset
    spans: list[Span] = [(kind, _cjson(attrs), None, off)]
    off += 1
    if kind == "way":
        for ref in el["nds"]:
            spans.append(("nd", _cjson({"ref": int(ref)}), None, off))
            off += 1
    elif kind == "relation":
        for mtype, ref, role in el["members"]:
            spans.append(
                ("member", _cjson({"type": mtype, "ref": int(ref), "role": role}), None, off)
            )
            off += 1
    for k, v in el.get("tags", ()):
        spans.append(("tag", _cjson({"k": k, "v": v}), None, off))
        off += 1
    return spans


def spans_to_elements(spans: Iterable[Span]) -> list[Element]:
    """Python reference decoder (tests + goldens; Spark ingest is the real path)."""
    ordered = sorted(spans, key=lambda s: s[3])
    elements: list[Element] = []
    cur: Element | None = None
    for kind, text, _media, _off in ordered:
        if kind in ("node", "way", "relation"):
            attrs = json.loads(text)
            cur = {
                "kind": kind,
                "id": attrs["id"],
                **{k: attrs.get(k) for k in _META_KEYS},
                "tags": [],
            }
            if kind == "node":
                cur["lon"] = attrs["lon"]
                cur["lat"] = attrs["lat"]
            elif kind == "way":
                cur["nds"] = []
            else:
                cur["members"] = []
            elements.append(cur)
        elif kind == "nd" and cur is not None and cur["kind"] == "way":
            cur["nds"].append(json.loads(text)["ref"])
        elif kind == "member" and cur is not None and cur["kind"] == "relation":
            m = json.loads(text)
            cur["members"].append((m["type"], m["ref"], m.get("role", "")))
        elif kind == "tag" and cur is not None:
            t = json.loads(text)
            cur["tags"].append((t["k"], t["v"]))
        # 'text' / 'media' spans belong to the document, not an element
    return elements


def elements_to_doc_rows(
    elements: list[Element],
    elements_per_doc: int = 0,
    doc_prefix: str = "doc",
) -> list[dict[str, Any]]:
    """Pack elements into document rows.

    ``elements_per_doc=0`` packs everything into a single document (the
    1.osm fixture shape); otherwise chunks of that size.
    """
    if elements_per_doc <= 0:
        groups = [elements]
    else:
        groups = [
            elements[i : i + elements_per_doc]
            for i in range(0, len(elements), elements_per_doc)
        ]
    rows = []
    for gi, group in enumerate(groups):
        spans: list[Span] = []
        off = 0
        for el in group:
            run = element_to_spans(el, off)
            spans.extend(run)
            off += len(run)
        rows.append({"doc_id": f"{doc_prefix}-{gi:08d}", "spans": spans})
    return rows


def doc_rows_to_spark(spark, rows: list[dict[str, Any]]):
    """Materialize document rows as a Spark DataFrame with the table schema."""
    data = [(r["doc_id"], [tuple(s) for s in r["spans"]]) for r in rows]
    return spark.createDataFrame(data, DOC_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic generator (scale-parametrized bench/test input)
# ---------------------------------------------------------------------------


def synthesize_osm_docs(
    n_docs: int,
    seed: int = 42,
    nodes_per_doc: int = 8,
    ways_per_doc: int = 2,
    relations_per_doc: int = 1,
    bbox: tuple[float, float, float, float] = (-2.0, -2.0, 14.0, 9.0),
    hot_fraction: float = 0.0,
    hot_point: tuple[float, float] = (2.0, 1.0),
    media_every: int = 5,
    text_every: int = 3,
) -> pd.DataFrame:
    """Generate a deterministic interleaved-docs pandas frame.

    Node coordinates are uniform over ``bbox`` (which straddles the fixture
    triangle so a polygon cut selects a nontrivial subset); ``hot_fraction``
    of nodes collapse near ``hot_point`` to synthesize a dense-metro skew
    cell.  Ways reference node ids within the same document (plus one
    cross-doc ref per way); relations reference local ways/nodes and
    occasionally the previous document's relation (exercising closure).
    Text and media spans are interleaved between elements.

    Output columns: doc_id string, spans list[(kind, text, media_ref, offset)].
    """
    rng = np.random.default_rng(seed)
    xmin, ymin, xmax, ymax = bbox
    total_nodes = n_docs * nodes_per_doc
    lon = rng.uniform(xmin, xmax, total_nodes)
    lat = rng.uniform(ymin, ymax, total_nodes)
    if hot_fraction > 0:
        hot = rng.random(total_nodes) < hot_fraction
        lon[hot] = hot_point[0] + rng.normal(0, 1e-4, int(hot.sum()))
        lat[hot] = hot_point[1] + rng.normal(0, 1e-4, int(hot.sum()))
    versions = rng.integers(1, 9, total_nodes)
    uids = rng.integers(1, 5000, total_nodes)
    changesets = rng.integers(1, 10_000_000, total_nodes)

    doc_ids: list[str] = []
    spans_col: list[list[Span]] = []
    node_id = 1
    way_id = 1
    rel_id = 1
    for d in range(n_docs):
        spans: list[Span] = []
        off = 0

        def emit(kind: str, text: str | None, media_ref: str | None = None):
            nonlocal off
            spans.append((kind, text, media_ref, off))
            off += 1

        local_nodes: list[int] = []
        for j in range(nodes_per_doc):
            i = d * nodes_per_doc + j
            if text_every and (node_id % text_every) == 0:
                emit("text", f"prose about node {node_id} in document {d}")
            if media_every and (node_id % media_every) == 0:
                emit("media", None, f"media://img/{node_id:012d}.jpg")
            attrs = {
                "id": node_id,
                "lon": round(float(lon[i]), 7),
                "lat": round(float(lat[i]), 7),
                "version": int(versions[i]),
                "timestamp": "2026-01-01T00:00:00Z",
                "uid": int(uids[i]),
                "user": f"user{int(uids[i]) % 97}",
                "changeset": int(changesets[i]),
            }
            emit("node", _cjson(attrs))
            if node_id % 4 == 0:
                emit("tag", _cjson({"k": "amenity", "v": f"poi{node_id % 11}"}))
            local_nodes.append(node_id)
            node_id += 1

        for w in range(ways_per_doc):
            emit("way", _cjson({"id": way_id, "version": 1, "uid": int(uids[d * nodes_per_doc]), "timestamp": "2026-01-01T00:00:00Z"}))
            k = max(2, nodes_per_doc // 2)
            picks = [local_nodes[(w * 3 + t) % len(local_nodes)] for t in range(k)]
            if d > 0:
                picks.append((d - 1) * nodes_per_doc + 1)  # cross-doc ref
            for ref in picks:
                emit("nd", _cjson({"ref": ref}))
            emit("tag", _cjson({"k": "highway", "v": "service" if way_id % 2 else "track"}))
            way_id += 1

        for r in range(relations_per_doc):
            emit("relation", _cjson({"id": rel_id, "version": 1}))
            emit("member", _cjson({"type": "way", "ref": way_id - 1 - r, "role": "outer"}))
            emit("member", _cjson({"type": "node", "ref": local_nodes[0], "role": ""}))
            if rel_id > 1 and rel_id % 3 == 0:
                emit("member", _cjson({"type": "relation", "ref": rel_id - 1, "role": "sub"}))
            emit("tag", _cjson({"k": "type", "v": "multipolygon"}))
            rel_id += 1

        doc_ids.append(f"syn-{d:08d}")
        spans_col.append(spans)

    return pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})


def synthetic_docs_spark(spark, n_docs: int, partitions: int | None = None, **kw):
    """Synthesize and load as a Spark DataFrame (Arrow-batched)."""
    pdf = synthesize_osm_docs(n_docs, **kw)
    df = spark.createDataFrame(
        [(r.doc_id, r.spans) for r in pdf.itertuples()], DOC_SCHEMA
    )
    if partitions:
        df = df.repartition(partitions)
    return df


def synthetic_docs_distributed(
    spark,
    n_docs: int,
    seed: int = 42,
    nodes_per_doc: int = 8,
    ways_per_doc: int = 2,
    relations_per_doc: int = 1,
    bbox: tuple[float, float, float, float] = (-2.0, -2.0, 14.0, 9.0),
    partitions: int | None = None,
):
    """Scale-path generator: builds the docs table ENTIRELY with JVM
    expressions over ``spark.range`` — no driver loop, no Python workers —
    so benchmark inputs of millions of documents materialize in seconds
    and generation parallelizes with the cluster.

    Determinism comes from xxhash64 of (seed, doc, index) — identical
    output for identical parameters at any parallelism.  Attribute JSON is
    canonical (alphabetical keys, compact) like the codec's Python path.
    """
    from pyspark.sql import functions as F

    xmin, ymin, xmax, ymax = bbox
    npd, wpd, rpd = nodes_per_doc, ways_per_doc, relations_per_doc

    def u01(*cols):
        """Deterministic uniform [0,1) from hashed ints."""
        h = F.xxhash64(F.lit(seed), *cols)
        return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0

    d = F.col("d")
    base = spark.range(n_docs).select(F.col("id").alias("d"))
    if partitions:
        base = base.repartition(partitions)

    def node_struct(j):
        nid = d * npd + j + 1
        lon = F.round(F.lit(xmin) + u01(nid, F.lit(1)) * (xmax - xmin), 7)
        lat = F.round(F.lit(ymin) + u01(nid, F.lit(2)) * (ymax - ymin), 7)
        uid = F.pmod(F.xxhash64(F.lit(seed), nid, F.lit(3)), F.lit(5000)) + 1
        attrs = F.concat(
            F.lit('{"changeset":'), (F.pmod(nid * 7919, F.lit(10_000_000)) + 1).cast("string"),
            F.lit(',"id":'), nid.cast("string"),
            F.lit(',"lat":'), lat.cast("string"),
            F.lit(',"lon":'), lon.cast("string"),
            F.lit(',"timestamp":"2026-01-01T00:00:00Z","uid":'), uid.cast("string"),
            F.lit(',"user":"user'), F.pmod(uid, F.lit(97)).cast("string"),
            F.lit('","version":'), (F.pmod(nid, F.lit(8)) + 1).cast("string"),
            F.lit("}"),
        )
        return ("node", attrs, F.lit(None).cast("string"))

    # build the per-doc span list as a flat python list of (kind, text_col,
    # media_ref_col) tuples; offsets assigned at the end by index
    parts: list[tuple[str, object, object]] = []
    for j in range(npd):
        nid = d * npd + j + 1
        # interleave text / media spans like the Python generator
        parts.append(
            (
                "textif",
                F.when(F.pmod(nid, F.lit(3)) == 0, F.concat(F.lit("prose about node "), nid.cast("string"))).otherwise(F.lit(None)),
                F.lit(None).cast("string"),
            )
        )
        parts.append(
            (
                "mediaif",
                F.lit(None).cast("string"),
                F.when(F.pmod(nid, F.lit(5)) == 0, F.concat(F.lit("media://img/"), nid.cast("string"), F.lit(".jpg"))).otherwise(F.lit(None)),
            )
        )
        parts.append(node_struct(j))
        parts.append(
            (
                "tagif",
                F.when(F.pmod(nid, F.lit(4)) == 0, F.concat(F.lit('{"k":"amenity","v":"poi'), F.pmod(nid, F.lit(11)).cast("string"), F.lit('"}'))).otherwise(F.lit(None)),
                F.lit(None).cast("string"),
            )
        )
    for w in range(wpd):
        wid = d * wpd + w + 1
        parts.append(("way", F.concat(F.lit('{"id":'), wid.cast("string"), F.lit(',"version":1}')), F.lit(None).cast("string")))
        k = max(2, npd // 2)
        for t in range(k):
            ref = d * npd + ((w * 3 + t) % npd) + 1
            parts.append(("nd", F.concat(F.lit('{"ref":'), ref.cast("string"), F.lit("}")), F.lit(None).cast("string")))
        # cross-doc ref (previous doc's first node)
        parts.append(
            (
                "ndif",
                F.when(d > 0, F.concat(F.lit('{"ref":'), ((d - 1) * npd + 1).cast("string"), F.lit("}"))).otherwise(F.lit(None)),
                F.lit(None).cast("string"),
            )
        )
        parts.append(("tag", F.lit('{"k":"highway","v":"service"}'), F.lit(None).cast("string")))
    for r in range(rpd):
        rid = d * rpd + r + 1
        parts.append(("relation", F.concat(F.lit('{"id":'), rid.cast("string"), F.lit(',"version":1}')), F.lit(None).cast("string")))
        parts.append(("member", F.concat(F.lit('{"ref":'), (d * wpd + wpd - r).cast("string"), F.lit(',"role":"outer","type":"way"}')), F.lit(None).cast("string")))
        parts.append(("member", F.concat(F.lit('{"ref":'), (d * npd + 1).cast("string"), F.lit(',"role":"","type":"node"}')), F.lit(None).cast("string")))
        parts.append(
            (
                "memberif",
                F.when((rid > 1) & (F.pmod(rid, F.lit(3)) == 0), F.concat(F.lit('{"ref":'), (rid - 1).cast("string"), F.lit(',"role":"sub","type":"relation"}'))).otherwise(F.lit(None)),
                F.lit(None).cast("string"),
            )
        )

    span_structs = []
    for kind, text, media in parts:
        if kind.endswith("if"):
            real_kind = {"textif": "text", "mediaif": "media", "tagif": "tag", "ndif": "nd", "memberif": "member"}[kind]
            present = text.isNotNull() if real_kind != "media" else media.isNotNull()
            span_structs.append(
                F.when(
                    present,
                    F.struct(
                        F.lit(real_kind).alias("kind"),
                        text.alias("text"),
                        media.alias("media_ref"),
                        F.lit(0).alias("offset"),
                    ),
                ).otherwise(F.lit(None))
            )
        else:
            span_structs.append(
                F.struct(
                    F.lit(kind).alias("kind"),
                    text.alias("text"),
                    media.alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            )

    spans = F.expr(
        "transform(spans0, (s, i) -> struct(s.kind AS kind, s.text AS text,"
        " s.media_ref AS media_ref, int(i) AS offset))"
    )
    return (
        base.withColumn("spans0", F.filter(F.array(*span_structs), lambda s: s.isNotNull()))
        .select(
            F.concat(F.lit("syn-"), F.lpad(d.cast("string"), 8, "0")).alias("doc_id"),
            spans.alias("spans"),
        )
    )
