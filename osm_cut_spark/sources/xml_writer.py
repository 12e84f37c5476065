"""OSM XML sink — textual reconstruction of extraction output (SURVEY S6).

Mirrors the reference writer's structure
(/root/reference/src/osm_writer.erl:218-292,
src/osm_simple_xml_formatter.erl:22-103): ``<?xml version="1.0"?>``
header, newline-prefixed tags, 2-space indentation per depth, attribute
order id/lon/lat/version/timestamp/uid/changeset/user, children as
nd/member then tag elements, XML attribute escaping.

Two deliberate divergences from the reference writer (documented, not
replicated): (1) osm_writer.erl:274-282 emits way nd-refs and relation
members in REVERSED order (its prepend loop) — we emit document order,
which matches the reference's *parser/test* semantics (way 1 keeps
[1,2,3,4,1] in processor_SUITE.erl:230) rather than its serializer
artifact; (2) absent attributes are omitted instead of rendered as
"undefined".

Provided both as a driver-side function over collected elements (parity
tests) and as a JVM column expression for distributed writes
(spark.write.text of the rendered column).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from osm_cut_spark.sources.osm_xml import Element

_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ('"', "&quot;")]


def _esc(v: Any) -> str:
    s = str(v)
    for a, b in _ESC:
        s = s.replace(a, b)
    return s


def _fmt_num(v: Any) -> str:
    """Coordinates: integral floats render like the source ints (0.0 -> 0).

    The integral collapse is guarded to |v| < 1e15 so the distributed
    column path (bigint cast) and this Python path stay byte-identical.
    """
    if isinstance(v, float) and v.is_integer() and abs(v) < 1e15:
        return str(int(v))
    return str(v)


_META = ("version", "timestamp", "uid", "changeset", "user")


def _attrs(pairs: list[tuple[str, Any]]) -> str:
    return "".join(f' {k}="{_esc(v)}"' for k, v in pairs if v is not None)


def element_to_xml(el: Element, depth: int = 1) -> str:
    pad = "  " * depth
    pad2 = "  " * (depth + 1)
    kind = el["kind"]
    pairs: list[tuple[str, Any]] = [("id", el["id"])]
    if kind == "node":
        pairs += [("lon", _fmt_num(el["lon"])), ("lat", _fmt_num(el["lat"]))]
    pairs += [(k, el.get(k)) for k in _META]
    children: list[str] = []
    if kind == "way":
        children += [f'{pad2}<nd ref="{r}"/>' for r in el["nds"]]
    elif kind == "relation":
        children += [
            f'{pad2}<member type="{_esc(t)}" ref="{r}" role="{_esc(ro)}"/>'
            for t, r, ro in el["members"]
        ]
    children += [f'{pad2}<tag k="{_esc(k)}" v="{_esc(v)}"/>' for k, v in el.get("tags", ())]
    head = f"{pad}<{kind}{_attrs(pairs)}"
    if not children:
        return head + "/>"
    return head + ">\n" + "\n".join(children) + f"\n{pad}</{kind}>"


def elements_to_xml(elements: list[Element]) -> str:
    """Full OSM XML document from ordered canonical element dicts."""
    body = "\n".join(element_to_xml(e) for e in elements)
    return f'<?xml version="1.0"?>\n<osm version="0.6" generator="osm_cut_spark">\n{body}\n</osm>\n'


def _xml_escape_col(c: Column) -> Column:
    out = c
    for a, b in _ESC:
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def element_xml_column() -> Column:
    """JVM expression rendering an extraction output row (kind, attrs_json,
    out_child_spans) to its XML string — for distributed text sinks.

    Operates on the verbatim span JSON: attributes parse once with
    from_json; child spans render in stored (document) order.
    """
    a = F.from_json(
        "attrs_json",
        "id BIGINT, lon DOUBLE, lat DOUBLE, version BIGINT, timestamp STRING,"
        " uid BIGINT, user STRING, changeset BIGINT",
    )

    def attr(name, col):
        return F.when(col.isNotNull(), F.concat(F.lit(f' {name}="'), _xml_escape_col(col.cast("string")), F.lit('"'))).otherwise(F.lit(""))

    def attr_coord(name):
        # never re-serialize floats: render the VERBATIM JSON number token.
        # A double->string cast (and even get_json_object, which re-renders
        # through Jackson) yields Java scientific notation for tiny values,
        # diverging from the source text — so slice the token out of the
        # canonical attrs JSON (compact, sorted keys, unquoted numbers)
        # with a regex.  Only the integral collapse (2.0 -> "2", mirroring
        # _fmt_num) rewrites the token.
        tok = F.regexp_extract(F.col("attrs_json"), f'"{name}":([^,}}]+)', 1)
        tok = F.when(tok != "", tok)
        d = tok.cast("double")
        integral = d.isNotNull() & (d == F.floor(d)) & (F.abs(d) < F.lit(1e15))
        val = F.when(integral, d.cast("bigint").cast("string")).otherwise(tok)
        return F.when(tok.isNotNull(), F.concat(F.lit(f' {name}="'), val, F.lit('"'))).otherwise(F.lit(""))

    head_attrs = F.concat(
        attr("id", a.getField("id")),
        F.when(F.col("kind") == "node", F.concat(
            attr_coord("lon"),
            attr_coord("lat"),
        )).otherwise(F.lit("")),
        attr("version", a.getField("version")),
        attr("timestamp", a.getField("timestamp")),
        attr("uid", a.getField("uid")),
        attr("changeset", a.getField("changeset")),
        attr("user", a.getField("user")),
    )

    # each child span's JSON parses exactly once (bound in an inner
    # transform), not once per rendered attribute
    child = F.expr(
        """
        array_join(transform(
          transform(out_child_spans, c -> struct(
            c.kind AS kind,
            CASE WHEN c.kind = 'nd'
                 THEN from_json(c.text, 'ref BIGINT').ref END AS nd_ref,
            CASE WHEN c.kind = 'member'
                 THEN from_json(c.text, 'type STRING, ref BIGINT, role STRING') END AS m,
            CASE WHEN c.kind = 'tag'
                 THEN from_json(c.text, 'k STRING, v STRING') END AS t)),
          x -> CASE x.kind
            WHEN 'nd' THEN concat('    <nd ref="', x.nd_ref, '"/>')
            WHEN 'member' THEN concat('    <member type="', x.m.type,
                 '" ref="', x.m.ref,
                 '" role="', replace(replace(replace(replace(x.m.role,
                     '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '"/>')
            WHEN 'tag' THEN concat('    <tag k="', replace(replace(replace(replace(x.t.k,
                     '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'),
                 '" v="', replace(replace(replace(replace(x.t.v,
                     '&', '&amp;'), '<', '&lt;'), '>', '&gt;'), '"', '&quot;'), '"/>')
          END), '\n')
        """
    )

    open_tag = F.concat(F.lit("  <"), F.col("kind"), head_attrs)
    return F.when(F.size("out_child_spans") == 0, F.concat(open_tag, F.lit("/>"))).otherwise(
        F.concat(
            open_tag,
            F.lit(">\n"),
            child,
            F.lit("\n  </"),
            F.col("kind"),
            F.lit(">"),
        )
    ).alias("xml")


def write_xml(elements_out: DataFrame, path: str, sharded: bool = False):
    """Distributed XML sink: render per-element XML, write ordered text.

    Order = (phase, doc_id, offset) like the reference's phase-ordered
    output (osm_process_complete.erl:60-64).  Header/footer lines are
    added with rank sentinels so the sorted text write produces a
    well-formed document even across partitions.

    ``sharded=False`` (escript parity — /root/reference/cut.escript:4-7
    writes ONE file) funnels the sorted stream through one task: fine for
    country cuts, a driver-side bottleneck at 100 TB.  ``sharded=True``
    keeps the global range sort but writes one text file PER RANGE
    PARTITION: part files are globally ordered by name (part-00000 holds
    the lowest range), so ``cat part-*`` in filename order — or any
    order-preserving downstream reader — reconstructs the identical
    single-file document with no single-task funnel.
    """
    body = elements_out.select(
        F.col("phase"), F.col("doc_id"), F.col("offset"), element_xml_column()
    )
    spark = elements_out.sparkSession
    header = spark.createDataFrame(
        [(-1, "", -1, '<?xml version="1.0"?>\n<osm version="0.6" generator="osm_cut_spark">')],
        "phase INT, doc_id STRING, offset INT, xml STRING",
    )
    footer = spark.createDataFrame(
        [(999, "￿", 2**31 - 1, "</osm>")], "phase INT, doc_id STRING, offset INT, xml STRING"
    )
    out = (
        header.unionByName(body).unionByName(footer)
        .orderBy("phase", "doc_id", "offset")
        .select("xml")
    )
    if not sharded:
        out = out.coalesce(1)
    out.write.mode("overwrite").text(path)
