"""OwlTimeParser / OwlTimeSerializer (O5/O6, /root/reference/owltimeparser.js
and owltimeserializer.js): OWL-Time instants/intervals become *temporal
context anchors* (interfaces on the time context entity) carrying begin/end
dates, rdf:type lists and DateTimeDescription links; statements touching an
anchor become links binding the context AT the anchor.

Documented divergences from the reference (deliberate):

- **single time context, by id**: after the first consumed statement the
  reference assigns ``this.timeContext`` an entity OBJECT and then compares /
  hashes it where ids are expected (owltimeparser.js:44-46,366-372,385-389 —
  ``createSpoUri(s,p,o,context)`` with an object stringifies to
  "[object Object]"). We use the context *id*: ``options.time_context`` or
  the graph of the first consumed statement.
- **deterministic date formatting**: finish() formats computed begin/end with
  ``Date.toLocaleString()`` (locale/timezone dependent; also defined twice —
  the second definition wins, both identical). We emit ISO-8601 UTC
  (``yyyy-MM-ddTHH:mm:ss.SSSZ``).
- **1-based months**: the reference calls ``setMonth(value)`` with the
  OWL-Time month literal, silently shifting months by one (JS months are
  0-based). We treat time:month as the 1-based calendar month.
- **anchor rdf:type lists** are JSON-encoded into the interface property slot
  (our interface properties are ``map<string,string>``); the serializer
  decodes them back to one triple per type.
- the anchor-property serializer (``serializeTemporalAnchorProperty``) exists
  in the reference but is never called from serializer.js — we wire it in
  (emitting into the time context graph), otherwise anchor state would be
  unserializable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from rdf2hk_spark import constants as C
from rdf2hk_spark.functions import terms as T
from rdf2hk_spark.operators.parse import ENTITY_COLUMNS, ParseOptions, parse_quads

TIME = "http://www.w3.org/2006/time#"
INSTANT_URI = f"<{TIME}Instant>"
INTERVAL_URIS = [
    f"<{TIME}Interval>", f"<{TIME}ProperInterval>", f"<{TIME}DateTimeInterval>",
]
HAS_BEGINNING_URI = f"<{TIME}hasBeginning>"
HAS_END_URI = f"<{TIME}hasEnd>"
IN_DATE_TIME_URI = f"<{TIME}inXSDDateTime>"
XSD_DATE_TIME_URI = f"<{TIME}xsdDateTime>"
HAS_TIME_URI = f"<{TIME}hasTime>"
HAS_DTD_URI = f"<{TIME}hasDateTimeDescription>"
DTD_URI = f"<{TIME}DateTimeDescription>"
YEAR_URI = f"<{TIME}year>"
MONTH_URI = f"<{TIME}month>"
DAY_URI = f"<{TIME}day>"
# owltime.js:54-58 order (timeZone, unitType, year, month, day, hour, minute,
# second, week, dayOfYear, dayOfWeek, monthOfYear)
GENERAL_DTD_URIS = [
    f"<{TIME}timeZone>", f"<{TIME}unitType>", YEAR_URI, MONTH_URI, DAY_URI,
    f"<{TIME}hour>", f"<{TIME}minute>", f"<{TIME}second>", f"<{TIME}week>",
    f"<{TIME}dayOfYear>", f"<{TIME}dayOfWeek>", f"<{TIME}monthOfYear>",
]
XSD_DATETIME = "<http://www.w3.org/2001/XMLSchema#dateTime>"

_IFACE_TYPE = (
    "map<string,struct<type:string, key:string, properties:map<string,string>>>"
)


def _decoded(o: str = "o") -> Column:
    """getValueFromLiteral(o, {}, true): inner value, numbers canonicalized,
    lang dropped (the reference passes a throwaway typeInfo here)."""
    v = T.literal_value(o)
    n = T.js_number_string(v)
    return F.when(
        T.literal_datatype(o).isin(C.NUMBER_DATATYPES) & n.isNotNull(), n
    ).otherwise(v)


def _static_mask() -> Column:
    """owltimeparser.js:47-50 minus the data-dependent anchor membership."""
    return (
        F.col("o").isin(INSTANT_URI, *INTERVAL_URIS)
        | F.col("p").isin(
            HAS_BEGINNING_URI, HAS_END_URI, IN_DATE_TIME_URI, HAS_TIME_URI,
            HAS_DTD_URI, *GENERAL_DTD_URIS,
        )
    )


def parse_with_owl_time(
    quads: DataFrame,
    opts: ParseOptions | None = None,
    time_context: str | None = None,
) -> DataFrame:
    """parse_quads with convertOwlTime semantics.

    NOTE (eagerness): construction runs ONE eager Spark job — a map-side
    partial ``min_by(g, stmt_idx)`` + count aggregate over the consumed
    OWL-Time statements (single output row, no global sort) — to pick the
    time context and detect the no-op case. The anchor/interface
    assembly also assumes a single time context whose anchors are bounded
    in number (they funnel through one context's interface list, matching
    the reference's in-memory `timeContext` at owltimeparser.js:34-45)."""
    opts = opts or ParseOptions()
    spark = quads.sparkSession

    static = quads.filter(_static_mask())
    # anchors = subjects of statically-consumed statements, except hasTime
    # which anchors its OBJECT (owltimeparser.js:75-83)
    anchor_ids = (
        static.select(
            F.when(F.col("p") == HAS_TIME_URI, F.col("o"))
            .otherwise(F.col("s"))
            .alias("aid")
        )
        .distinct()
    )
    q2 = quads.join(
        anchor_ids.select(F.col("aid").alias("s")).withColumn("_an", F.lit(True)),
        "s", "left",
    )
    consumed = _static_mask() | F.col("_an").eqNullSafe(True)
    tq = q2.filter(consumed).drop("_an")
    base = parse_quads(q2.filter(~consumed).drop("_an"), opts)

    # one partial-aggregate job, not a global sort (see docstring note)
    first = tq.select(
        F.min_by("g", "stmt_idx").alias("g"), F.count("*").alias("n")
    ).first()
    if first["n"] == 0:
        return base  # no OWL-Time statements — plugin is a no-op
    ctx_id = time_context or first["g"]
    if ctx_id is None or ctx_id == C.HK_NULL_URI:
        ctx_id = C.HK_NULL_URI

    # ---- per-anchor scalar state (dict-overwrite ⇒ last stmt wins) -------
    def last(val: Column, cond: Column) -> Column:
        return F.max_by(F.when(cond, val), F.when(cond, F.col("stmt_idx")))

    # instantDatetimeMap (js:84-88)
    inst_dt = (
        tq.filter(F.col("p") == IN_DATE_TIME_URI)
        .groupBy("s")
        .agg(last(_decoded(), F.lit(True)).alias("idt"))
        .select(F.col("s").alias("inst"), "idt")
    )
    # rdf:type branch fires for typed instants/intervals and any typed anchor
    # (js:105-116); since every consumed subject is an anchor candidate, all
    # consumed rdf:type statements collect here
    type_rows = tq.filter(F.col("p") == C.RDF_TYPE_URI)
    types = (
        type_rows.groupBy("s")
        .agg(
            F.to_json(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("stmt_idx", "o"))),
                    lambda x: x["o"],
                )
            ).alias("type_json")
        )
    )

    be = tq.filter(
        F.col("p").isin(
            HAS_BEGINNING_URI, HAS_END_URI, IN_DATE_TIME_URI, XSD_DATE_TIME_URI
        )
    ).join(inst_dt, tq["o"] == inst_dt["inst"], "left")
    is_lit = ~T.is_uri_or_blank_node("o")
    # begin/end value per statement (js:118-158,197-204): hasBeginning/hasEnd
    # substitute a known instant datetime else keep the raw o; inXSDDateTime
    # uses the decoded literal; xsdDateTime keeps the RAW literal term
    bval = (
        F.when(F.col("p") == HAS_BEGINNING_URI, F.coalesce("idt", F.col("o")))
        .when(F.col("p") == IN_DATE_TIME_URI, _decoded())
        .when((F.col("p") == XSD_DATE_TIME_URI) & is_lit, F.col("o"))
    )
    eval_ = (
        F.when(F.col("p") == HAS_END_URI, F.coalesce("idt", F.col("o")))
        .when(F.col("p") == IN_DATE_TIME_URI, _decoded())
        .when((F.col("p") == XSD_DATE_TIME_URI) & is_lit, F.col("o"))
    )
    be_agg = be.withColumn("bval", bval).withColumn("eval", eval_).groupBy("s").agg(
        last(F.col("bval"), F.col("bval").isNotNull()).alias("begin"),
        last(F.col("eval"), F.col("eval").isNotNull()).alias("end"),
        last(F.col("o"), F.col("p") == HAS_BEGINNING_URI).alias("has_beginning"),
        last(F.col("o"), F.col("p") == HAS_END_URI).alias("has_end"),
    )

    # interval → DateTimeDescription (js:159-166, last wins) and the
    # description's predicate map (js:167-174)
    iv_dtd = (
        tq.filter(F.col("p") == HAS_DTD_URI)
        .groupBy("s")
        .agg(last(F.col("o"), F.lit(True)).alias("desc_id"))
    )
    dtd = (
        tq.filter(F.col("p").isin(GENERAL_DTD_URIS))
        .groupBy("s")
        .agg(
            *[
                last(F.when(F.col("p") == u, _decoded()), F.col("p") == u).alias(
                    f"v{i}"
                )
                for i, u in enumerate(GENERAL_DTD_URIS)
            ],
            *[
                last(F.when(F.col("p") == u, F.col("o")), F.col("p") == u).alias(
                    f"raw{i}"
                )
                for i, u in enumerate(GENERAL_DTD_URIS)
            ],
        )
        .withColumnRenamed("s", "desc_id")
    )
    iy, im, idx_ = (
        GENERAL_DTD_URIS.index(YEAR_URI),
        GENERAL_DTD_URIS.index(MONTH_URI),
        GENERAL_DTD_URIS.index(DAY_URI),
    )
    ivd = iv_dtd.join(dtd, "desc_id", "left")
    y = F.col(f"v{iy}").try_cast("int")
    m = F.col(f"v{im}").try_cast("int")
    d = F.col(f"v{idx_}").try_cast("int")
    m1 = F.coalesce(m, F.lit(1))
    d1 = F.coalesce(d, F.lit(1))
    begin_dt = F.make_date(y, m1, d1)
    end_day = (
        F.when(d.isNotNull(), begin_dt)
        .when(m.isNotNull(), F.last_day(begin_dt))
        .otherwise(F.make_date(y, F.lit(12), F.lit(31)))
    )
    fmt = lambda dt, tail: F.concat(F.date_format(dt, "yyyy-MM-dd"), F.lit(tail))
    dtd_begin = F.when(y.isNotNull(), fmt(begin_dt, "T00:00:00.000Z"))
    dtd_end = F.when(y.isNotNull(), fmt(end_day, "T23:59:59.999Z"))
    # unsupported description predicates pass through as anchor properties
    # (js warn branch), keyed by predicate with the RAW term value
    passthrough = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(u) for i, u in enumerate(GENERAL_DTD_URIS)]),
            F.array(*[
                F.col(f"raw{i}")
                if GENERAL_DTD_URIS[i] not in (YEAR_URI, MONTH_URI, DAY_URI)
                else F.lit(None).cast("string")
                for i, u in enumerate(GENERAL_DTD_URIS)
            ]),
        ),
        lambda k, v: v.isNotNull(),
    )
    supported = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit(YEAR_URI), F.lit(MONTH_URI), F.lit(DAY_URI)),
            F.array(F.col(f"raw{iy}"), F.col(f"raw{im}"), F.col(f"raw{idx_}")),
        ),
        lambda k, v: v.isNotNull(),
    )
    ivd = ivd.select(
        F.col("s").alias("aid"), "desc_id",
        dtd_begin.alias("dtd_begin"), dtd_end.alias("dtd_end"),
        F.map_concat(supported, passthrough).alias("dtd_props"),
    )

    # ---- assemble anchor interface structs --------------------------------
    anchors = (
        anchor_ids
        .join(types.withColumnRenamed("s", "aid"), "aid", "left")
        .join(be_agg.withColumnRenamed("s", "aid"), "aid", "left")
        .join(ivd, "aid", "left")
    )
    # descriptions consumed by an interval are deleted from the interfaces
    # (finish(): delete timeContext.interfaces[descriptionId])
    desc_ids = ivd.select(F.col("desc_id").alias("aid")).distinct()
    anchors = anchors.join(desc_ids, "aid", "left_anti")

    base_entries = F.array(
        F.struct(F.lit(C.RDF_TYPE_URI).alias("k"), F.col("type_json").alias("v")),
        F.struct(F.lit("begin").alias("k"), F.coalesce("begin", "dtd_begin").alias("v")),
        F.struct(F.lit("end").alias("k"), F.coalesce("end", "dtd_end").alias("v")),
        F.struct(F.lit(HAS_BEGINNING_URI).alias("k"), F.col("has_beginning").alias("v")),
        F.struct(F.lit(HAS_END_URI).alias("k"), F.col("has_end").alias("v")),
        F.struct(F.lit(HAS_DTD_URI).alias("k"), F.col("desc_id").alias("v")),
    )
    props = F.map_from_entries(F.filter(base_entries, lambda e: e["v"].isNotNull()))
    props = F.map_concat(
        props,
        F.map_filter(
            F.coalesce(
                F.col("dtd_props"),
                F.from_json(F.lit("{}"), "map<string,string>"),
            ),
            lambda k, v: ~F.map_contains_key(props, k),
        ),
    )
    iface = F.struct(
        F.lit("temporal").alias("type"), F.col("aid").alias("key"),
        props.alias("properties"),
    )
    ctx_ifaces = anchors.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct(F.col("aid"), iface))).alias(
            "u_interfaces"
        )
    ).withColumn("id", F.lit(ctx_id))

    # ---- anchor links (js:176-216 else-branch) ----------------------------
    a_s = anchor_ids.select(F.col("aid").alias("s")).withColumn("s_an", F.lit(True))
    a_o = anchor_ids.select(F.col("aid").alias("o")).withColumn("o_an", F.lit(True))
    handled = (
        (F.col("p") == C.RDF_TYPE_URI)
        | F.col("p").isin(
            HAS_BEGINNING_URI, HAS_END_URI, IN_DATE_TIME_URI, HAS_DTD_URI,
            *GENERAL_DTD_URIS,
        )
        | ((F.col("p") == XSD_DATE_TIME_URI) & is_lit)
    )
    linkable = (
        tq.join(a_s, "s", "left").join(a_o, "o", "left")
        .filter(
            ~handled
            & (F.col("s_an").eqNullSafe(True) | F.col("o_an").eqNullSafe(True))
        )
    )
    s_an = F.col("s_an").eqNullSafe(True)
    o_an = F.col("o_an").eqNullSafe(True)
    a_links = linkable.select(
        T.create_spo_uri(F.col("s"), F.col("p"), F.col("o"), F.lit(ctx_id)).alias("id"),
        F.lit(C.LINK).alias("type"),
        F.col("p").alias("connector"),
        F.lit(ctx_id).alias("parent"),
        F.array(
            F.struct(
                F.lit(opts.subject_label).alias("role"),
                F.when(s_an, F.lit(ctx_id)).otherwise(F.col("s")).alias("comp"),
                F.when(s_an, F.col("s")).otherwise(F.lit(C.LAMBDA)).alias("anchor"),
            ),
            F.struct(
                F.lit(opts.object_label).alias("role"),
                F.when(o_an, F.lit(ctx_id)).otherwise(F.col("o")).alias("comp"),
                F.when(o_an, F.col("o")).otherwise(F.lit(C.LAMBDA)).alias("anchor"),
            ),
        ).alias("binds"),
    ).distinct()

    # ---- merge -------------------------------------------------------------
    # convertToContextAnchor deletes any same-id entity (js:91-101); anchors
    # therefore suppress base entities. The time context entity receives the
    # interfaces map (created if absent).
    out = base.join(anchor_ids.withColumnRenamed("aid", "id"), "id", "left_anti")
    out = out.join(ctx_ifaces.select("id", "u_interfaces"), "id", "left")
    out = out.withColumn(
        "interfaces", F.coalesce("u_interfaces", "interfaces")
    ).drop("u_interfaces")
    ctx_missing = ctx_ifaces.join(out.select("id"), "id", "left_anti").select(
        "id", F.lit(C.CONTEXT).alias("type"), F.col("u_interfaces").alias("interfaces")
    )
    for name, typ in [
        ("parent", "string"), ("connector", "string"), ("ref", "string"),
        ("className", "string"), ("roles", "map<string,string>"),
        ("binds", "array<struct<role:string, comp:string, anchor:string>>"),
        ("properties", "map<string,array<string>>"),
        ("metaProperties", "map<string,array<string>>"),
    ]:
        ctx_missing = ctx_missing.withColumn(name, F.lit(None).cast(typ))
    link_e = a_links
    for name, typ in [
        ("ref", "string"), ("className", "string"),
        ("roles", "map<string,string>"),
        ("properties", "map<string,array<string>>"),
        ("metaProperties", "map<string,array<string>>"),
        ("interfaces", _IFACE_TYPE),
    ]:
        link_e = link_e.withColumn(name, F.lit(None).cast(typ))
    return (
        out.select(*ENTITY_COLUMNS)
        .unionByName(ctx_missing.select(*ENTITY_COLUMNS))
        .unionByName(link_e.select(*ENTITY_COLUMNS))
    )


# ---------------------------------------------------------------------------
# O6 — OwlTimeSerializer
# ---------------------------------------------------------------------------

def serialize_owl_time(
    entities: DataFrame,
    time_context: str,
    default_graph: str | None = None,
    subject_label: str = C.DEFAULT_SUBJECT_ROLE,
    object_label: str = C.DEFAULT_OBJECT_ROLE,
) -> DataFrame:
    """OWL-Time quads: anchor-link re-expansion (serializeTemporalAnchorBind,
    owltimeserializer.js:20-45) + anchor-property emission
    (serializeTemporalAnchorProperty, js:47-94 — unwired in the reference,
    implemented per intent into the time context graph). Returns (s,p,o,g)
    rows to union with serialize_entities' output for the remaining entities.
    """
    e = entities
    tc = F.lit(time_context)

    # ---- anchor links -------------------------------------------------------
    links = e.filter(
        (F.col("type") == C.LINK) & F.col("binds").isNotNull()
    )
    sb = F.filter("binds", lambda b: b["role"] == subject_label)[0]
    ob = F.filter("binds", lambda b: b["role"] == object_label)[0]
    lj = links.select(
        "connector", "parent",
        sb["comp"].alias("s_comp"), sb["anchor"].alias("s_anchor"),
        ob["comp"].alias("o_comp"), ob["anchor"].alias("o_anchor"),
    )
    lj = lj.filter((F.col("s_comp") == tc) | (F.col("o_comp") == tc))
    # grandparent of the link: parent of its parent entity, else default
    gp = e.select(F.col("id").alias("parent"), F.col("parent").alias("gparent"))
    lj = lj.join(gp, "parent", "left")
    s_term = F.when(F.col("s_comp") == tc, F.col("s_anchor")).otherwise(
        F.col("s_comp")
    )
    o_term = F.when(F.col("o_comp") == tc, F.col("o_anchor")).otherwise(
        F.col("o_comp")
    )
    dg = F.lit(default_graph) if default_graph else F.lit(None).cast("string")
    subj_only = (F.col("s_comp") == tc) & (F.col("o_comp") != tc)
    g_term = F.when(subj_only, F.coalesce("parent", dg)).otherwise(
        F.coalesce("gparent", dg)
    )
    link_quads = lj.select(
        s_term.alias("s"), F.col("connector").alias("p"),
        o_term.alias("o"), g_term.alias("g"),
    )

    # ---- anchor properties --------------------------------------------------
    ctx = e.filter((F.col("id") == tc) & F.col("interfaces").isNotNull())
    an = ctx.select(F.explode("interfaces").alias("aid", "iface")).select(
        "aid", F.col("iface.properties").alias("props")
    )
    kv = an.select("aid", F.explode("props").alias("k", "v"))
    types_arr = F.from_json(F.col("v"), "array<string>")
    type_triples = kv.filter(F.col("k") == C.RDF_TYPE_URI).select(
        "aid", F.explode(types_arr).alias("t")
    ).select(
        F.col("aid").alias("s"), F.lit(C.RDF_TYPE_URI).alias("p"),
        F.col("t").alias("o"), tc.alias("g"),
    )
    is_instant = F.exists(
        types_arr, lambda t: t == F.lit(INSTANT_URI)
    )
    type_map = kv.filter(F.col("k") == C.RDF_TYPE_URI).select(
        "aid", is_instant.alias("inst")
    )
    other = kv.filter(F.col("k") != C.RDF_TYPE_URI).join(type_map, "aid", "left")
    lit_term = F.when(
        F.col("v").startswith('"'), F.col("v")  # raw literal term passthrough
    ).otherwise(F.concat(F.lit('"'), F.col("v"), F.lit('"')))
    dt_lit = F.concat(F.lit('"'), F.col("v"), F.lit('"^^'), F.lit(XSD_DATETIME))
    begin_end = F.col("k").isin("begin", "end")
    res_obj = F.col("k").isin(HAS_BEGINNING_URI, HAS_END_URI, HAS_DTD_URI)
    plain = other.select(
        F.col("aid").alias("s"),
        F.when(begin_end, F.concat(F.lit("<hk://id/"), F.col("k"), F.lit(">")))
        .otherwise(F.col("k")).alias("p"),
        F.when(res_obj, F.col("v")).otherwise(lit_term).alias("o"),
        tc.alias("g"),
    )
    instant_dt = other.filter(
        begin_end & F.col("inst").eqNullSafe(True) & ~F.col("v").startswith('"')
    ).select(
        F.col("aid").alias("s"), F.lit(IN_DATE_TIME_URI).alias("p"),
        dt_lit.alias("o"), tc.alias("g"),
    ).distinct()
    # DateTimeDescription re-expansion: anchors holding a description pointer
    # re-emit (desc, rdf:type, DateTimeDescription) + (desc, pred, literal)
    desc_ptr = kv.filter(F.col("k") == HAS_DTD_URI).select(
        "aid", F.col("v").alias("desc_id")
    )
    desc_type = desc_ptr.select(
        F.col("desc_id").alias("s"), F.lit(C.RDF_TYPE_URI).alias("p"),
        F.lit(DTD_URI).alias("o"), tc.alias("g"),
    ).distinct()
    dtd_vals = kv.filter(F.col("k").isin(GENERAL_DTD_URIS)).join(desc_ptr, "aid")
    desc_props = dtd_vals.select(
        F.col("desc_id").alias("s"), F.col("k").alias("p"),
        F.col("v").alias("o"), tc.alias("g"),
    )
    # anchor-side GENERAL predicates are re-pointed at the description, so the
    # anchor row itself is dropped from `plain`
    plain = plain.join(
        dtd_vals.select(F.col("aid").alias("s"), F.col("k").alias("p")).distinct(),
        ["s", "p"], "left_anti",
    )

    out = link_quads
    for b in [type_triples, plain, instant_dt, desc_type, desc_props]:
        out = out.unionByName(b)
    return out.dropDuplicates(["s", "p", "o", "g"])
