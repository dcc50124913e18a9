"""SHACL shapes re-expressed as DataFrame schema rules + triple validation.

north_star: triples are "typed against SHACL-style node/property shapes (the
repo's rdfs:Class / sh:NodeShape / sh:property patterns reimplemented as
DataFrame schema rules)". Two entry points:

- ``shape_rules_from_shacl``: pivots a SHACL triple table (as produced by
  operators.extract.convert_specs_df, graph='shacl') into a relational rules
  table (target_class, path, datatype, min_count, max_count, in_values,
  node_kind, pattern, value_class, min_inclusive, max_inclusive) — pure
  DataFrame self-joins on the property-shape bnode, with
  rdf:first/rdf:rest list reconstruction for sh:in. Reference shape emission:
  shacl_converter.py:616-654 (property shapes), :344-353 (sh:in lists).

- ``validate_triples``: checks a kg triple table against a rules table and
  returns a violations DataFrame (quarantine); rules are broadcast (tiny dim
  vs 10^12 triples), counting checks aggregate per (s, p) with map-side
  partial aggregation — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SH = "http://www.w3.org/ns/shacl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST, RDF_REST, RDF_NIL = RDF + "first", RDF + "rest", RDF + "nil"
RDF_TYPE = RDF + "type"
DASH_LIST = "http://datashapes.org/dash#ListShape"


def _po(triples: DataFrame, pred: str, out: str, kind: str | None = None) -> DataFrame:
    # subjects encode bnodes as "_:label" while bnode objects are bare labels
    # (extract.TRIPLES_SCHEMA) — strip the prefix so shape-to-shape joins line up
    d = triples.filter(F.col("p") == pred)
    if kind:
        d = d.filter(F.col("o_kind") == kind)
    return d.select(F.col("file"),
                    F.regexp_replace("s", "^_:", "").alias("shape"),
                    F.col("o").alias(out))


def _rdf_lists(triples: DataFrame) -> DataFrame:
    """Reconstruct rdf:first/rdf:rest cons lists -> (file, head, values).

    One ``applyInPandas`` chain-walk per file: a shapes graph is per-file
    METADATA (bounded by schema size, ~10^4 triples), so each file's cons
    cells fit one Arrow batch and a linear dict-walk beats an iterative
    join loop (which costs one Spark job per list element).
    """
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    cells = (triples.filter(F.col("p").isin(RDF_FIRST, RDF_REST))
             .select("file", F.regexp_replace("s", "^_:", "").alias("cell"),
                     "p", "o"))

    schema = StructType([
        StructField("file", StringType(), False),
        StructField("head", StringType(), False),
        StructField("values", ArrayType(StringType()), False),
    ])

    def walk(pdf):
        import pandas as pd

        first, rest = {}, {}
        for cell, p, o in zip(pdf["cell"], pdf["p"], pdf["o"]):
            (first if p == RDF_FIRST else rest)[cell] = o
        heads = set(first) - {nxt for nxt in rest.values() if nxt != RDF_NIL}
        rows = []
        fname = pdf["file"].iloc[0]
        for head in heads:
            values, cell, seen = [], head, set()
            while cell in first and cell not in seen:
                seen.add(cell)
                values.append(first[cell])
                nxt = rest.get(cell, RDF_NIL)
                if nxt == RDF_NIL:
                    break
                cell = nxt
            rows.append((fname, head, values))
        return pd.DataFrame(rows, columns=["file", "head", "values"])

    return cells.groupBy("file").applyInPandas(walk, schema)


def _alt_value_sets(shacl: DataFrame) -> DataFrame:
    """(file, shape, any_datatype, any_class) for every shape carrying an
    sh:xone / sh:or / sh:or_ alternative list whose members ALL resolve
    to a datatype-bearing OR class-bearing node shape (the converter's
    encoding of OpenAPI oneOf/anyOf — ``sh:or_`` mirrors the reference's
    attr-name quirk, shacl_converter.py logical-operator emission). A
    conforming value is a literal of one of ``any_datatype`` or a node
    typed with one of ``any_class``; either array may be empty (null).
    Members carrying extra facets (sh:in, sh:minInclusive) are accepted
    by their datatype alone, and alternative lists with STRUCTURAL
    members (nested sh:property shapes) are skipped entirely — both are
    sound relaxations: validation may under-flag alternatives, never
    wrongly flag a conforming value."""
    heads = None
    for pred in (SH + "xone", SH + "or", SH + "or_"):
        h = _po(shacl, pred, "head")
        heads = h if heads is None else heads.unionByName(h)
    lists = _rdf_lists(shacl)
    dt = (_po(shacl, SH + "datatype", "m_dt")
          .withColumnRenamed("shape", "member"))
    cls = (_po(shacl, SH + "class", "m_cls", kind="iri")
           .withColumnRenamed("shape", "member"))
    members = (heads.join(lists, ["file", "head"])
               .select("file", "shape",
                       F.explode("values").alias("member"),
                       F.size("values").alias("n_members")))
    agg = (members.join(dt, ["file", "member"], "left")
           .join(cls, ["file", "member"], "left")
           .groupBy("file", "shape")
           .agg(F.max("n_members").alias("n_members"),
                F.count("m_dt").alias("n_dt"),
                F.count("m_cls").alias("n_cls"),
                F.array_sort(F.collect_set("m_dt")).alias("dts"),
                F.array_sort(F.collect_set("m_cls")).alias("clss")))
    nonempty = lambda c: F.when(F.size(c) > 0, c)  # noqa: E731
    return (agg.filter(F.col("n_dt") + F.col("n_cls")
                       == F.col("n_members"))
            .select("file", "shape",
                    nonempty(F.col("dts")).alias("any_datatype"),
                    nonempty(F.col("clss")).alias("any_class")))


def _list_shape_info(shacl: DataFrame) -> DataFrame:
    """(file, shape, is_list, list_member_datatype, list_member_class) for
    every shape carrying ``sh:node dash:ListShape`` — the converter's
    array encoding (reference shacl_converter.py array handler): the
    MEMBER constraints live on a nested sh:property shape whose path is
    the ``( [sh:zeroOrMorePath rdf:rest] rdf:first )`` sequence."""
    flag = (_po(shacl, SH + "node", "ref", kind="iri")
            .filter(F.col("ref") == DASH_LIST).select("file", "shape"))
    mlink = _po(shacl, SH + "property", "mshape")
    mdt = (_po(shacl, SH + "datatype", "m_dt")
           .withColumnRenamed("shape", "mshape"))
    mcls = (_po(shacl, SH + "class", "m_cls", kind="iri")
            .withColumnRenamed("shape", "mshape"))
    mem = (mlink.join(mdt, ["file", "mshape"], "left")
           .join(mcls, ["file", "mshape"], "left")
           .groupBy("file", "shape")
           .agg(F.min("m_dt").alias("list_member_datatype"),
                F.min("m_cls").alias("list_member_class")))
    return (flag.join(mem, ["file", "shape"], "left")
            .select("file", "shape", F.lit(True).alias("is_list"),
                    "list_member_datatype", "list_member_class"))


def shape_rules_from_shacl(shacl: DataFrame) -> DataFrame:
    """SHACL triple table -> rules(target_class, path, datatype, min_count,
    max_count, in_values, node_kind, pattern, value_class [sh:class],
    min_inclusive, max_inclusive)."""
    node_shape = _po(shacl, SH + "targetClass", "target_class")
    prop_link = _po(shacl, SH + "property", "prop_shape").withColumnRenamed("shape", "node")
    path = _po(shacl, SH + "path", "path", kind="iri")
    datatype = _po(shacl, SH + "datatype", "datatype")
    min_c = _po(shacl, SH + "minCount", "min_count")
    max_c = _po(shacl, SH + "maxCount", "max_count")
    node_kind = _po(shacl, SH + "nodeKind", "node_kind")
    pattern = _po(shacl, SH + "pattern", "pattern")
    value_cls = _po(shacl, SH + "class", "value_class", kind="iri")
    min_inc = _po(shacl, SH + "minInclusive", "min_inclusive")
    max_inc = _po(shacl, SH + "maxInclusive", "max_inclusive")
    min_len = _po(shacl, SH + "minLength", "min_length")
    max_len = _po(shacl, SH + "maxLength", "max_length")
    severity = _po(shacl, SH + "severity", "severity", kind="iri")
    message = _po(shacl, SH + "message", "message")
    in_head = _po(shacl, SH + "in", "head")
    lists = _rdf_lists(shacl)

    prop = (
        node_shape.join(prop_link, on=[node_shape.file == prop_link.file,
                                       node_shape.shape == prop_link.node])
        .select(node_shape.file, "target_class", F.col("prop_shape").alias("shape"))
        .join(path, ["file", "shape"])
        .join(datatype, ["file", "shape"], "left")
        .join(min_c, ["file", "shape"], "left")
        .join(max_c, ["file", "shape"], "left")
        .join(node_kind, ["file", "shape"], "left")
        .join(pattern, ["file", "shape"], "left")
        .join(value_cls, ["file", "shape"], "left")
        .join(min_inc, ["file", "shape"], "left")
        .join(max_inc, ["file", "shape"], "left")
        .join(min_len, ["file", "shape"], "left")
        .join(max_len, ["file", "shape"], "left")
        .join(severity, ["file", "shape"], "left")
        .join(message, ["file", "shape"], "left")
        .join(in_head, ["file", "shape"], "left")
        .join(lists, ["file", "head"], "left")
        .join(_alt_value_sets(shacl), ["file", "shape"], "left")
        .join(_list_shape_info(shacl), ["file", "shape"], "left")
    )
    return prop.select(
        "file", "target_class", "path", "datatype",
        F.col("min_count").cast("int").alias("min_count"),
        F.col("max_count").cast("int").alias("max_count"),
        F.col("values").alias("in_values"),
        "node_kind", "pattern",
        # sh:class / sh:minInclusive / sh:maxInclusive — kept as the shapes
        # graph's lexical forms; validate_triples casts at check time so the
        # detail strings stay engine-portable
        "value_class", "min_inclusive", "max_inclusive",
        # sh:minLength / sh:maxLength (string handler, convert/shacl.py —
        # emitted only when the datatype is xsd:string, quirk §2.5.8)
        F.col("min_length").cast("int").alias("min_length"),
        F.col("max_length").cast("int").alias("max_length"),
        # sh:severity / sh:message on the property shape — consumed by
        # attach_severity (validate_triples output stays 5-column)
        "severity", "message",
        # property-level sh:xone/or datatype / class alternatives
        "any_datatype", "any_class",
        # inline array properties (sh:node dash:ListShape on the property
        # shape itself); aliased arrays resolve via resolve_scalar_aliases
        "is_list", "list_member_datatype", "list_member_class",
    )


def resolve_scalar_aliases(rules: DataFrame, shacl: DataFrame) -> DataFrame:
    """Rewrite ``value_class`` rules that point at SCALAR or LIST ALIAS
    shapes into datatype-set / list rules.

    The converter (mirroring the reference) encodes an OpenAPI alias like
    ``Level: oneOf [integer, number]`` as a node shape ``sh:targetClass
    :Level ; sh:xone (<integer shape> <number shape>)`` — and every
    property referencing it gets ``sh:class :Level``. Taken literally,
    sh:class demands an IRI instance, so the alias's LITERAL values would
    all be flagged. This resolution step joins each rule's value_class
    against the shapes graph: when the target is a node shape with NO
    sh:property links but a direct sh:datatype or an all-datatype
    alternative list, the rule's value_class is cleared and
    ``any_datatype`` is filled with the allowed set instead. Plain
    aliases the converter emits NO shape for at all (e.g. the reference's
    ComDefs:DateTime — ``sh:class`` with no target shape anywhere) stay
    untouched: there is nothing to resolve against, and validate_triples'
    open-typing semantics are the caller's policy decision.

    Both inputs are vocabulary-sized; every join here is dimension-scale.
    """
    for c in ("any_datatype", "any_class"):
        if c not in rules.columns:
            rules = rules.withColumn(c, F.lit(None).cast("array<string>"))
    alias_tc = _po(shacl, SH + "targetClass", "alias_class")
    direct = _po(shacl, SH + "datatype", "direct_dt")
    alts = _alt_value_sets(shacl)
    has_prop = (_po(shacl, SH + "property", "x")
                .select("file", "shape").dropDuplicates()
                .withColumn("is_obj", F.lit(True)))
    payload = F.coalesce(
        F.col("alt_dts"),
        F.when(F.col("direct_dt").isNotNull(), F.array("direct_dt")))
    alias = (alias_tc
             .join(direct, ["file", "shape"], "left")
             .join(alts.withColumnsRenamed({"any_datatype": "alt_dts",
                                            "any_class": "alt_cls"}),
                   ["file", "shape"], "left")
             .join(has_prop, ["file", "shape"], "left")
             .filter(F.col("is_obj").isNull())
             .select("file", "alias_class", payload.alias("alias_dts"),
                     F.col("alt_cls").alias("alias_cls"))
             .filter(F.col("alias_dts").isNotNull()
                     | F.col("alias_cls").isNotNull())
             .dropDuplicates(["file", "alias_class"]))
    joined = rules.join(
        F.broadcast(alias),
        (rules["file"] == alias["file"])
        & (rules["value_class"] == alias["alias_class"]), "left")
    keep = [c for c in rules.columns
            if c not in ("value_class", "any_datatype", "any_class")]
    matched0 = (F.col("alias_dts").isNotNull()
                | F.col("alias_cls").isNotNull())
    out = joined.select(
        *[rules[c] for c in keep],
        F.when(matched0, F.lit(None).cast("string"))
        .otherwise(rules["value_class"]).alias("value_class"),
        F.coalesce(rules["any_datatype"], F.col("alias_dts"))
        .alias("any_datatype"),
        F.coalesce(rules["any_class"], F.col("alias_cls"))
        .alias("any_class"))

    # LIST aliases (ReportList-style: targetClass + sh:node ListShape +
    # member constraints): the referencing rule becomes a list rule
    for c, t in (("is_list", "boolean"),
                 ("list_member_datatype", "string"),
                 ("list_member_class", "string")):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(None).cast(t))
    list_alias = (alias_tc.join(_list_shape_info(shacl), ["file", "shape"])
                  .select("file", "alias_class",
                          F.col("list_member_datatype").alias("l_dt"),
                          F.col("list_member_class").alias("l_cls"))
                  .dropDuplicates(["file", "alias_class"]))
    joined2 = out.join(
        F.broadcast(list_alias),
        (out["file"] == list_alias["file"])
        & (out["value_class"] == list_alias["alias_class"]), "left")
    keep2 = [c for c in out.columns
             if c not in ("value_class", "is_list",
                          "list_member_datatype", "list_member_class")]
    matched = F.col("alias_class").isNotNull()
    return joined2.select(
        *[out[c] for c in keep2],
        F.when(matched, F.lit(None).cast("string"))
        .otherwise(out["value_class"]).alias("value_class"),
        F.when(matched, F.lit(True)).otherwise(out["is_list"])
        .alias("is_list"),
        F.coalesce(out["list_member_datatype"], F.col("l_dt"))
        .alias("list_member_datatype"),
        F.coalesce(out["list_member_class"], F.col("l_cls"))
        .alias("list_member_class"))


def align_rules_to_namespace(rules: DataFrame, kg_ns: str) -> DataFrame:
    """Import converted-spec shape rules into the KG vocabulary BY LOCAL
    NAME: <specns#AlarmRecord> -> <kg#AlarmRecord>, <specns#surfaceForm> ->
    <kg#surfaceForm>.

    This is the ontology-alignment step that closes the shapes-as-rules loop
    (north_star): sources.transcripts.class_vocab_df types extracted
    entities by the SAME local-name convention, so rules derived from a real
    OpenAPI spec via shape_rules_from_shacl become directly enforceable
    against the transcript graph. Datatype/cardinality/sh:in payloads pass
    through untouched.
    """
    def realign(col):
        return F.concat(F.lit(kg_ns), F.regexp_extract(col, r"([^#/]+)$", 1))

    extras = [c for c in ("pattern", "min_inclusive", "max_inclusive",
                          "min_length", "max_length",
                          "severity", "message",
                          "any_datatype", "is_list",
                          "list_member_datatype")
              if c in rules.columns]
    aligned = rules.select(
        "file",
        F.when(F.col("target_class").isNotNull(),
               realign(F.col("target_class"))).alias("target_class"),
        realign(F.col("path")).alias("path"),
        "datatype", "min_count", "max_count", "in_values", "node_kind",
        *extras,
        # sh:class references spec-namespace classes; realign by local name
        # like target_class so value typing checks hit the kg vocabulary
        *([F.when(F.col("value_class").isNotNull(),
                  realign(F.col("value_class"))).alias("value_class")]
          if "value_class" in rules.columns else []),
        *([F.when(F.col("list_member_class").isNotNull(),
                  realign(F.col("list_member_class")))
           .alias("list_member_class")]
          if "list_member_class" in rules.columns else []),
        # class-alternative sets realign element-wise
        *([F.transform(F.col("any_class"),
                       lambda x: F.concat(
                           F.lit(kg_ns),
                           F.regexp_extract(x, r"([^#/]+)$", 1)))
           .alias("any_class")]
          if "any_class" in rules.columns else []))
    return aligned


def kg_shape_rules(spark, kg_ns: str) -> DataFrame:
    """Shape rules for the transcript KG vocabulary (the DataFrame-native
    equivalent of hand-written sh:PropertyShapes for the kg namespace).

    minCount rules are class-scoped (sh:targetClass semantics): SHACL
    enumerates focus nodes by class, and only a scoped rule lets
    validate_triples fire count=0 violations for a wholly absent property
    (ADVICE r1 — the unscoped variants were dead rules). Extraction emits
    rdf:type kg:Turn / kg:Conversation for exactly this reason.
    """
    xsd = "http://www.w3.org/2001/XMLSchema#"
    turn_cls, conv_cls = kg_ns + "Turn", kg_ns + "Conversation"
    rows = [
        # (target_class — None applies to any subject with the path), path,
        # datatype, min_count, max_count, in_values, node_kind, pattern
        (turn_cls, kg_ns + "role", xsd + "string", 1, 1,
         ["user", "assistant", "tool", "system"], None, None),
        (turn_cls, kg_ns + "atTime", xsd + "dateTime", 1, 1, None, None,
         r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T"),  # sh:pattern (partial match)
        (turn_cls, kg_ns + "mentions", None, None, None, None, SH + "IRI",
         None),
        (conv_cls, kg_ns + "hasTurn", None, 1, None, None, SH + "IRI", None),
        (None, kg_ns + "surfaceForm", xsd + "string", None, None, None, None,
         None),
        (None, RDF_TYPE, None, None, None, None, SH + "IRI", None),
    ]
    return spark.createDataFrame(
        [("kg", *r) for r in rows],
        "file string, target_class string, path string, datatype string, "
        "min_count int, max_count int, in_values array<string>, "
        "node_kind string, pattern string")


def infer_shapes(triples: DataFrame, max_in: int = 8,
                 file: str = "inferred") -> DataFrame:
    """Schema discovery: instance triples -> shape rules (the REVERSE of
    shape_rules_from_shacl — the converter derives rules from authored
    specs; this derives them from data, closing the loop for sources that
    ship no spec). Per (class, path) over subjects typed with that class:

    - max_count / min_count: per-subject triple counts; min_count drops to 0
      unless EVERY subject of the class carries the path (SHACL minCount
      semantics over the observed universe);
    - datatype: emitted iff all objects are literals of ONE datatype;
    - node_kind: sh:IRI iff all objects are IRIs;
    - in_values: the sorted distinct-object list iff all-literal and the
      distinct count is <= max_in (the enum heuristic — mirrors the
      reference's sh:in emission for schema enums, shacl_converter.py
      ~:344-353, derived from data instead of the spec);
    - value_class: emitted iff all objects are IRIs and EVERY distinct
      object node carries a common rdf:type (min IRI when several do) —
      the data-derived counterpart of the converter's sh:class emission;
    - min_inclusive / max_inclusive: observed numeric range (original
      lexical forms) iff every literal of the group parses as a number.

    The output feeds validate_triples directly, and validating the SOURCE
    graph against its own inferred rules yields zero violations by
    construction (asserted in tests — the self-consistency invariant).

    Scale: two passes over the typed-property join. Pass 1 is all bounded
    aggregation state (counts, one max). Pass 2 collects the actual
    in_values lists ONLY for (class, path) groups pass 1 proved small
    (broadcast semi-join on the qualifying pairs) — collect_set state is
    bounded by max_in per group, never by corpus cardinality.
    """
    typed = (triples.filter(F.col("p") == RDF_TYPE)
             .select(F.col("s"), F.col("o").alias("cls"))
             .dropDuplicates())
    props = (triples.filter(F.col("p") != RDF_TYPE)
             .select("s", "p", "o", "o_kind", "o_datatype")
             .join(typed, "s"))

    class_sizes = typed.groupBy("cls").agg(F.count(F.lit(1)).alias("n_subj"))

    # distinct VALUE NODES per focus, the same identity validate_triples
    # counts — duplicate input rows must not inflate cardinality bounds
    subj_counts = (props.groupBy("cls", "p", "s")
                   .agg(F.countDistinct(
                       F.concat_ws("\x01", "o", "o_kind",
                                   F.coalesce("o_datatype", F.lit("\x02"))))
                        .alias("n")))
    card = (subj_counts.groupBy("cls", "p")
            .agg(F.max("n").alias("max_count"),
                 F.min("n").alias("min_n"),
                 F.count(F.lit(1)).alias("n_with")))

    obj = (props.groupBy("cls", "p")
           .agg(F.countDistinct("o").alias("n_obj"),
                F.count(F.when(F.col("o_kind") != "literal", 1)).alias("n_nonlit"),
                F.count(F.when(F.col("o_kind") != "iri", 1)).alias("n_noniri"),
                F.countDistinct(F.when(F.col("o_kind") == "literal",
                                       F.col("o_datatype"))).alias("n_dt"),
                F.max(F.when(F.col("o_kind") == "literal",
                             F.col("o_datatype"))).alias("one_dt")))

    enum_groups = (obj.filter((F.col("n_obj") <= max_in) & (F.col("n_nonlit") == 0))
                   .select("cls", "p"))
    in_vals = (props.join(F.broadcast(enum_groups), ["cls", "p"], "left_semi")
               .groupBy("cls", "p")
               .agg(F.array_sort(F.collect_set("o")).alias("in_values")))

    # sh:class discovery: a common type carried by EVERY distinct object
    # node of the group (min IRI when several qualify, for determinism).
    # Distinct (group, object) pairs first, so the type join and both
    # aggregations run over object cardinality, not triple cardinality.
    obj_nodes = (props.filter(F.col("o_kind") == "iri")
                 .select("cls", "p", "o").dropDuplicates())
    n_onodes = (obj_nodes.groupBy("cls", "p")
                .agg(F.countDistinct("o").alias("n_onodes")))
    vclass = (obj_nodes
              .join(typed.select(F.col("s").alias("o"),
                                 F.col("cls").alias("otype")), "o")
              .groupBy("cls", "p", "otype")
              .agg(F.countDistinct("o").alias("n_t"))
              .join(n_onodes, ["cls", "p"])
              .filter(F.col("n_t") == F.col("n_onodes"))
              .groupBy("cls", "p")
              .agg(F.min("otype").alias("value_class")))

    # numeric-range discovery: when EVERY literal of the group parses as a
    # number, emit observed [min, max] as sh:minInclusive/maxInclusive —
    # keeping the ORIGINAL lexical forms (min_by/max_by on the cast value)
    # so the rule stays engine-portable and self-validation is exact.
    lits = (props.filter(F.col("o_kind") == "literal")
            .select("cls", "p", "o",
                    F.col("o").try_cast("double").alias("num")))
    rng = (lits.groupBy("cls", "p")
           .agg(F.count(F.when(F.col("num").isNull(), 1)).alias("n_nonnum"),
                F.min_by("o", "num").alias("min_lex"),
                F.max_by("o", "num").alias("max_lex")))

    return (card
            .join(obj, ["cls", "p"])
            .join(F.broadcast(class_sizes), "cls")
            .join(in_vals, ["cls", "p"], "left")
            .join(vclass, ["cls", "p"], "left")
            .join(rng, ["cls", "p"], "left")
            .select(
                F.lit(file).alias("file"),
                F.col("cls").alias("target_class"),
                F.col("p").alias("path"),
                F.when((F.col("n_nonlit") == 0) & (F.col("n_dt") == 1),
                       F.col("one_dt")).alias("datatype"),
                F.when(F.col("n_with") == F.col("n_subj"), F.col("min_n"))
                .otherwise(F.lit(0)).cast("int").alias("min_count"),
                F.col("max_count").cast("int").alias("max_count"),
                F.col("in_values"),
                F.when(F.col("n_noniri") == 0, F.lit(SH + "IRI")).alias("node_kind"),
                F.lit(None).cast("string").alias("pattern"),
                F.when(F.col("n_noniri") == 0, F.col("value_class"))
                .alias("value_class"),
                F.when(F.col("n_nonnum") == 0, F.col("min_lex"))
                .alias("min_inclusive"),
                F.when(F.col("n_nonnum") == 0, F.col("max_lex"))
                .alias("max_inclusive")))


def validate_triples(triples: DataFrame, rules: DataFrame) -> DataFrame:
    """Triple table vs rules -> violations(s, p, o, violation, detail).

    Per-triple checks (datatype / sh:in / nodeKind / sh:pattern /
    sh:minInclusive / sh:maxInclusive) are a broadcast join; cardinality
    checks aggregate counts per (s, p); sh:class anti-joins value nodes
    against the type table. Subjects with no matching rule pass
    (open-world, as SHACL semantics dictate).

    minCount for a wholly ABSENT property fires only for class-scoped rules:
    focus nodes are enumerated from rdf:type (SHACL target semantics), then
    anti-joined against observed (s, p) to emit count=0 violations. An
    unscoped (target_class null) min_count rule has no focus-node universe
    and is checked only for present-but-undercounted values.
    """
    for c, t in (("pattern", "string"), ("value_class", "string"),
                 ("min_inclusive", "string"), ("max_inclusive", "string"),
                 ("min_length", "int"), ("max_length", "int"),
                 ("any_datatype", "array<string>"),
                 ("any_class", "array<string>"), ("is_list", "boolean"),
                 ("list_member_datatype", "string"),
                 ("list_member_class", "string")):
        if c not in rules.columns:  # older / hand-built rule tables
            rules = rules.withColumn(c, F.lit(None).cast(t))
    # dimension-sized probe (rules are broadcast-tiny by contract): each
    # join-backed branch below is built ONLY when a rule of its kind
    # exists — otherwise the dead branch's join still lands in the
    # physical plan (the guard columns become real runtime columns after
    # the rule join, so Catalyst cannot fold them away), and the list
    # branch would even run eager pointer-doubling jobs
    present = rules.agg(
        F.count("value_class").alias("n_vc"),
        F.count("any_class").alias("n_ac"),
        F.count(F.when(F.col("is_list").eqNullSafe(True), 1))
        .alias("n_list")).first()
    has_list_rules = present["n_list"] > 0
    r = F.broadcast(rules.withColumnRenamed("path", "p").drop("file"))

    # class-scoped rules (target_class set) apply only to subjects typed with
    # that class: resolve subject types once, then a broadcast semi-filter.
    s_types = (triples.filter(F.col("p") == RDF_TYPE)
               .select(F.col("s").alias("ts"), F.col("o").alias("stype"))
               .dropDuplicates())
    joined = triples.join(r, on="p", how="inner")
    scoped = joined.filter(F.col("target_class").isNotNull()).join(
        s_types, (F.col("s") == F.col("ts")) & (F.col("target_class") == F.col("stype")),
        "left_semi")
    per_triple = joined.filter(F.col("target_class").isNull()).unionByName(scoped)

    # the four per-triple checks run in ONE pass: a conditional array of
    # violation structs, exploded and null-filtered (the shape_drift
    # trick). Four separate filter branches would each re-run the
    # rule-join scan when unioned — at corpus scale that's 4 traversals
    # of the triple table for one validation.
    def _viol(cond, name, detail):
        return F.when(cond, F.struct(F.lit(name).alias("violation"),
                                     detail.alias("detail")))

    checks = F.array(
        _viol(F.col("datatype").isNotNull() & (F.col("o_kind") == "literal")
              & (F.col("o_datatype") != F.col("datatype")),
              "datatypeMismatch",
              F.concat(F.lit("expected "), "datatype", F.lit(" got "),
                       F.coalesce("o_datatype", F.lit("null")))),
        _viol(F.col("in_values").isNotNull()
              & ~F.array_contains(F.col("in_values"), F.col("o")),
              "notInList", F.concat_ws(",", "in_values")),
        _viol((F.col("node_kind") == SH + "IRI") & (F.col("o_kind") != "iri"),
              "nodeKindViolation",
              F.concat(F.lit("expected IRI got "), "o_kind")),
        # sh:pattern: XPath matches() semantics = PARTIAL match, exactly
        # RLIKE. The pattern is a per-rule column (non-foldable regexp) —
        # still JVM codegen; SHACL applies it to the lexical form only.
        _viol(F.col("pattern").isNotNull() & (F.col("o_kind") == "literal")
              & ~F.regexp_like(F.col("o"), F.col("pattern")),
              "patternMismatch", F.concat(F.lit("pattern "), "pattern")),
        # sh:minInclusive / sh:maxInclusive: numeric comparison on the cast
        # lexical form; a non-numeric literal cannot satisfy the bound, so
        # it violates (SHACL treats incomparable values as violations). The
        # rule columns stay lexical so detail strings are engine-portable.
        # try_cast, not cast: ANSI mode makes cast THROW on a malformed
        # lexical, and a dirty literal must yield a violation, not a crash
        _viol(F.col("min_inclusive").isNotNull()
              & (F.col("o_kind") == "literal")
              & (F.col("o").try_cast("double").isNull()
                 | (F.col("o").try_cast("double")
                    < F.col("min_inclusive").try_cast("double"))),
              "minInclusiveViolation",
              F.concat(F.lit("minInclusive "), "min_inclusive",
                       F.lit(" got "), "o")),
        _viol(F.col("max_inclusive").isNotNull()
              & (F.col("o_kind") == "literal")
              & (F.col("o").try_cast("double").isNull()
                 | (F.col("o").try_cast("double")
                    > F.col("max_inclusive").try_cast("double"))),
              "maxInclusiveViolation",
              F.concat(F.lit("maxInclusive "), "max_inclusive",
                       F.lit(" got "), "o")),
        # sh:minLength / sh:maxLength: character length of the lexical
        # form (SHACL spec §4.4.1-2); non-literal values violate (an IRI
        # has no lexical form under these components per the converter's
        # intent — it only ever emits them on xsd:string properties)
        _viol(F.col("min_length").isNotNull()
              & ((F.col("o_kind") != "literal")
                 | (F.length("o") < F.col("min_length"))),
              "minLengthViolation",
              F.concat(F.lit("minLength "),
                       F.col("min_length").cast("string"),
                       F.lit(" got len "),
                       F.length("o").cast("string"))),
        _viol(F.col("max_length").isNotNull()
              & ((F.col("o_kind") != "literal")
                 | (F.length("o") > F.col("max_length"))),
              "maxLengthViolation",
              F.concat(F.lit("maxLength "),
                       F.col("max_length").cast("string"),
                       F.lit(" got len "),
                       F.length("o").cast("string"))),
        # sh:xone/sh:or alternatives (incl. resolved aliases): a literal
        # value must carry one of the allowed datatypes; a node value is
        # only legal when the rule offers class alternatives (checked by
        # the anti-join branch below)
        _viol(((F.col("any_datatype").isNotNull()
                | F.col("any_class").isNotNull())
               & (F.col("o_kind") == "literal")
               & (F.col("any_datatype").isNull()
                  | ~F.array_contains(
                      F.col("any_datatype"),
                      F.coalesce(F.col("o_datatype"), F.lit("\x02")))))
              | (F.col("any_datatype").isNotNull()
                 & F.col("any_class").isNull()
                 & (F.col("o_kind") != "literal")),
              "noneOfDatatypes",
              F.concat(F.lit("expected one of "),
                       F.concat_ws(",", F.coalesce("any_datatype",
                                                   "any_class")),
                       F.lit(" got "),
                       F.coalesce("o_datatype", "o_kind"))),
    )
    row_viol = (per_triple
                .select("s", "p", "o", F.explode(checks).alias("v"))
                .filter(F.col("v").isNotNull())
                .select("s", "p", "o", "v.violation", "v.detail"))

    # cardinality over the already rule-scoped rows: partial (map-side)
    # aggregation handles the fan-in; (s, p) keys are near-unique so no skew.
    # countDistinct over the triple identity, NOT count(1): a subject typed
    # with two classes whose shapes both constrain this path joins one row
    # per matching rule, and raw counts would double.
    counts = (
        per_triple.filter(F.col("min_count").isNotNull() | F.col("max_count").isNotNull())
        .groupBy("s", "p", "min_count", "max_count")
        .agg(F.countDistinct(
            # concat_ws, not multi-col countDistinct: the latter silently
            # drops rows where ANY column is null (o_datatype is null for IRIs)
            F.concat_ws("\x01", "file", "graph", "o", "o_kind",
                        F.coalesce("o_datatype", F.lit("\x02")))).alias("n")))
    card_viol = (
        counts.filter((F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))) |
                      (F.col("min_count").isNotNull() & (F.col("n") < F.col("min_count"))))
        .select("s", "p", F.lit(None).cast("string").alias("o"),
                F.lit("cardinalityViolation").alias("violation"),
                F.concat(F.lit("count="), F.col("n").cast("string"),
                         F.lit(" min="), F.coalesce(F.col("min_count").cast("string"), F.lit("-")),
                         F.lit(" max="), F.coalesce(F.col("max_count").cast("string"), F.lit("-")))
                .alias("detail")))

    # count=0 minCount violations: focus nodes (subjects typed with the
    # rule's target class) that carry NO triple for the constrained path.
    # s_types is one row per (subject, class); min_rules is broadcast-tiny,
    # and the observed side is pre-filtered to constrained paths only, so
    # the anti-join shuffles the focus-node set, not the triple table.
    min_rules = (rules.filter(F.col("min_count").isNotNull()
                              & (F.col("min_count") >= 1)
                              & F.col("target_class").isNotNull())
                 .select("target_class", F.col("path").alias("mp"), "min_count")
                 .dropDuplicates())
    focus = s_types.join(F.broadcast(min_rules),
                         F.col("stype") == F.col("target_class"))
    observed = (triples.join(F.broadcast(min_rules.select("mp").dropDuplicates()),
                             triples.p == F.col("mp"), "left_semi")
                .select(F.col("s").alias("os"), F.col("p").alias("op"))
                .dropDuplicates())
    absent_viol = (
        focus.join(observed, (F.col("ts") == F.col("os")) & (F.col("mp") == F.col("op")),
                   "left_anti")
        .select(F.col("ts").alias("s"), F.col("mp").alias("p"),
                F.lit(None).cast("string").alias("o"),
                F.lit("cardinalityViolation").alias("violation"),
                F.concat(F.lit("count=0 min="), F.col("min_count").cast("string"),
                         F.lit(" max=-")).alias("detail")))

    # sh:class: every value node of a constrained path must be typed with
    # the rule's class (direct typing — run over an rdfs_entail-closed
    # graph when subclass instances should count, mirroring SHACL's
    # "SHACL instance of" semantics). Literals can never be instances, so
    # they violate per-row; node values anti-join the type table on the
    # OBJECT node — candidates are deduped first so the shuffle carries
    # distinct (value, class) pairs, not the triple table.
    branches = [row_viol, card_viol, absent_viol]
    # bnode OBJECTS are bare labels while typed SUBJECTS carry the "_:"
    # prefix (extract.TRIPLES_SCHEMA) — normalize before any type join
    onode = F.when(F.col("o_kind") == "bnode",
                   F.concat(F.lit("_:"), F.col("o"))).otherwise(F.col("o"))
    if present["n_vc"] > 0:
        cls_rows = per_triple.filter(F.col("value_class").isNotNull())
        branches.append(
            cls_rows.filter(F.col("o_kind") == "literal")
            .select("s", "p", "o",
                    F.lit("classViolation").alias("violation"),
                    F.concat(F.lit("expected instance of "), "value_class",
                             F.lit(" got literal")).alias("detail")))
        branches.append(
            cls_rows.filter(F.col("o_kind") != "literal")
            .select("s", "p", "o", "value_class", onode.alias("onode"))
            .dropDuplicates()
            .join(s_types, (F.col("onode") == F.col("ts"))
                  & (F.col("value_class") == F.col("stype")),
                  "left_anti")
            .select("s", "p", "o",
                    F.lit("classViolation").alias("violation"),
                    F.concat(F.lit("expected instance of "),
                             "value_class").alias("detail")))

    # class ALTERNATIVES (sh:xone/or over class members, incl. resolved
    # union aliases): a node value must be typed with at least one class
    # in the set. array_contains in a join condition would force a
    # nested-loop join — instead EXPLODE the (tiny) class set per
    # candidate and keep both joins equi: satisfied candidates via a
    # semi-join, violations via an anti-join on the candidate key.
    if present["n_ac"] > 0:
        ac_nodes = (per_triple.filter(F.col("any_class").isNotNull()
                                      & (F.col("o_kind") != "literal"))
                    .select("s", "p", "o", "any_class",
                            onode.alias("onode"))
                    .dropDuplicates())
        sat = (ac_nodes.select("s", "p", "o", "onode",
                               F.explode("any_class").alias("cand"))
               .join(s_types, (F.col("onode") == F.col("ts"))
                     & (F.col("cand") == F.col("stype")), "left_semi")
               .select("s", "p", "o").dropDuplicates())
        branches.append(
            ac_nodes.join(sat, ["s", "p", "o"], "left_anti")
            .select("s", "p", "o",
                    F.lit("noneOfClasses").alias("violation"),
                    F.concat(F.lit("expected instance of one of "),
                             F.concat_ws(",", "any_class"))
                    .alias("detail")))

    # list-valued rules (is_list): the value node must head a well-formed
    # rdf list (rdf:nil = the empty list) whose MEMBERS satisfy the member
    # constraints. Members are harvested ONCE for the whole validation via
    # rdflists.list_members (ancestor pointer doubling — log rounds over
    # the cell table), then every member check is a broadcast-rule join.
    if has_list_rules:
        from .rdflists import RDF_NIL, list_members

        lrows = per_triple.filter(F.col("is_list").eqNullSafe(True))
        branches.append(
            lrows.filter(F.col("o_kind") == "literal")
            .select("s", "p", "o", F.lit("notAList").alias("violation"),
                    F.lit("got literal").alias("detail")))
        lheads = (lrows.filter(F.col("o_kind") != "literal")
                  .select("s", "p", "o", onode.alias("head"),
                          "list_member_datatype", "list_member_class")
                  .dropDuplicates())
        cons_cells = (triples.filter(F.col("p").isin(RDF_FIRST, RDF_REST))
                      .select(F.col("s").alias("head")).dropDuplicates())
        branches.append(
            lheads.filter(F.col("head") != RDF_NIL)
            .join(cons_cells, "head", "left_anti")
            .select("s", "p", "o", F.lit("notAList").alias("violation"),
                    F.lit("no cons cell").alias("detail")))
        mem = lheads.join(list_members(triples), "head")
        branches.append(
            mem.filter(F.col("list_member_datatype").isNotNull()
                       & ((F.col("member_kind") != "literal")
                          | (F.col("member_datatype")
                             != F.col("list_member_datatype"))))
            .select("s", "p", F.col("member").alias("o"),
                    F.lit("listMemberDatatype").alias("violation"),
                    F.concat(F.lit("expected "), "list_member_datatype",
                             F.lit(" got "),
                             F.coalesce("member_datatype", "member_kind"))
                    .alias("detail")))
        mnorm = (F.when(F.col("member_kind") == "bnode",
                        F.concat(F.lit("_:"), F.col("member")))
                 .otherwise(F.col("member")))
        mcls = mem.filter(F.col("list_member_class").isNotNull())
        branches.append(
            mcls.filter(F.col("member_kind") == "literal")
            .select("s", "p", F.col("member").alias("o"),
                    F.lit("listMemberClass").alias("violation"),
                    F.concat(F.lit("expected instance of "),
                             "list_member_class",
                             F.lit(" got literal")).alias("detail")))
        branches.append(
            mcls.filter(F.col("member_kind") != "literal")
            .select("s", "p", "member", "list_member_class",
                    mnorm.alias("mnode"))
            .dropDuplicates()
            .join(s_types, (F.col("mnode") == F.col("ts"))
                  & (F.col("list_member_class") == F.col("stype")),
                  "left_anti")
            .select("s", "p", F.col("member").alias("o"),
                    F.lit("listMemberClass").alias("violation"),
                    F.concat(F.lit("expected instance of "),
                             "list_member_class").alias("detail")))

    # dedupe: a triple matched by several rules reports each violation once
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.dropDuplicates()


def closed_shape_violations(triples: DataFrame, rules: DataFrame,
                            closed_classes: list[str],
                            ignored: tuple[str, ...] = (RDF_TYPE,)
                            ) -> DataFrame:
    """``sh:closed true`` validation — the one SHACL core constraint the
    per-path rule checks cannot express, because it fires on predicates the
    shape DOESN'T declare (SHACL spec §4.8.1, ClosedConstraintComponent).

    For each class in ``closed_classes``, focus nodes (subjects typed with
    the class) may only carry predicates that some class-scoped rule
    declares as a path, plus ``ignored`` (sh:ignoredProperties — rdf:type
    by default, as every real-world closed shape ignores it).

    Scale shape: allowed (class, path) pairs are vocabulary-sized and
    broadcast; the focus-node typing join is the ONE unavoidable shuffle
    (subject-keyed, the same key canonicalization/validation already
    shuffle on, so the exchange is reusable across validation stages).
    The predicate anti-join itself is a broadcast left_anti — the 10^12
    triple side streams.
    """
    allowed = (rules.filter(F.col("target_class").isin(list(closed_classes)))
               .select(F.col("target_class").alias("cls"),
                       F.col("path").alias("ap"))
               .dropDuplicates())
    focus = (triples.filter((F.col("p") == RDF_TYPE)
                            & F.col("o").isin(list(closed_classes)))
             .select(F.col("s").alias("fs"), F.col("o").alias("cls"))
             .dropDuplicates())
    cand = (triples.filter(~F.col("p").isin(list(ignored)))
            .join(focus, F.col("s") == F.col("fs")))
    return (cand
            .join(F.broadcast(allowed),
                  (cand["cls"] == allowed["cls"]) & (cand["p"] == allowed["ap"]),
                  "left_anti")
            .select("s", "p", "o",
                    F.lit("closedShapeViolation").alias("violation"),
                    F.concat(F.lit("predicate "), F.col("p"),
                             F.lit(" not declared for closed "),
                             F.col("cls")).alias("detail"))
            .dropDuplicates())



PAIR_KINDS = {
    SH + "equals": "equals",
    SH + "disjoint": "disjoint",
    SH + "lessThan": "lessThan",
    SH + "lessThanOrEquals": "lessThanOrEquals",
}


def pair_rules_from_shacl(shacl: DataFrame) -> DataFrame:
    """SHACL triple table -> property-PAIR rules (file, target_class, path,
    pair_kind, other_path): sh:equals / sh:disjoint / sh:lessThan /
    sh:lessThanOrEquals off property shapes (SHACL core §4.5, the
    PropertyPairConstraintComponent family). The OpenAPI converter never
    emits these (OpenAPI has no cross-property comparisons), so they enter
    via authored shapes graphs — e.g. Turtle ingested with
    sources.turtle_source — or hand-built rule tables."""
    node_shape = _po(shacl, SH + "targetClass", "target_class")
    prop_link = (_po(shacl, SH + "property", "prop_shape")
                 .withColumnRenamed("shape", "node"))
    path = _po(shacl, SH + "path", "path", kind="iri")
    pairs = None
    for pred, kind in PAIR_KINDS.items():
        d = (_po(shacl, pred, "other_path", kind="iri")
             .withColumn("pair_kind", F.lit(kind)))
        pairs = d if pairs is None else pairs.unionByName(d)
    return (node_shape
            .join(prop_link, on=[node_shape.file == prop_link.file,
                                 node_shape.shape == prop_link.node])
            .select(node_shape.file, "target_class",
                    F.col("prop_shape").alias("shape"))
            .join(path, ["file", "shape"])
            .join(pairs, ["file", "shape"])
            .select("file", "target_class", "path", "pair_kind",
                    "other_path"))


def pair_constraint_violations(triples: DataFrame,
                               pair_rules: DataFrame) -> DataFrame:
    """Property-pair validation (SHACL core §4.5) -> violations
    (s, p, o, violation, detail):

    - ``equals``: the focus node's value SET for path must equal its set
      for other_path — each value on one side missing from the other is a
      ``pairNotEqual`` violation;
    - ``disjoint``: any value shared by both paths is ``pairNotDisjoint``;
    - ``lessThan`` / ``lessThanOrEquals``: every (path value, other value)
      pair must compare strictly-less / less-or-equal. Comparison follows
      SPARQL ``<``: numeric when both lexical forms cast, plain string
      comparison when both are literals; pairs involving a non-literal are
      incomparable and violate (SHACL: failure to compare is a violation).

    Scale shape: the rules table is vocabulary-sized and BROADCAST; the
    triple side is pre-filtered to constrained paths only (two narrow
    slices of the corpus), and every join is keyed on the focus subject —
    the same subject key validation/canonicalization already shuffle on.
    Class-scoped rules semi-join focus nodes against rdf:type first so
    unscoped subjects never enter the value joins. Per-focus value sets
    are cardinality-bounded in real shapes (sh:maxCount 1 is the
    converter's default), so the lessThan pair join stays linear.
    """
    rules = (pair_rules.select("target_class", "path", "pair_kind",
                               "other_path").dropDuplicates()
             .withColumn("rule_id", F.xxhash64(
                 F.coalesce("target_class", F.lit("\x00")),
                 "path", "pair_kind", "other_path")))
    r = F.broadcast(rules)

    s_types = (triples.filter(F.col("p") == RDF_TYPE)
               .select(F.col("s").alias("ts"), F.col("o").alias("stype"))
               .dropDuplicates())

    # value key: literal identity includes the datatype; nodes their kind
    def vkey(o, kind, dt):
        return F.concat_ws("\x01", o, kind,
                           F.coalesce(dt, F.lit("\x02")))

    def side(path_col, prefix):
        v = (triples.join(r, triples["p"] == r[path_col])
             .select("s", "rule_id", "target_class", "pair_kind",
                     r["path"].alias("rpath"),
                     r["other_path"].alias("ropath"),
                     F.col("o").alias(prefix + "_o"),
                     F.col("o_kind").alias(prefix + "_kind"),
                     vkey(F.col("o"), F.col("o_kind"),
                          F.col("o_datatype")).alias(prefix + "_key")))
        scoped = (v.filter(F.col("target_class").isNotNull())
                  .join(s_types,
                        (F.col("s") == F.col("ts"))
                        & (F.col("target_class") == F.col("stype")),
                        "left_semi"))
        return v.filter(F.col("target_class").isNull()).unionByName(scoped)

    va = side("path", "a")
    vb = side("other_path", "b")

    def out(df, pcol, ocol, name, detail):
        vio = F.lit(name) if isinstance(name, str) else name
        return df.select(F.col("s"), F.col(pcol).alias("p"),
                         F.col(ocol).alias("o"),
                         vio.alias("violation"),
                         detail.alias("detail"))

    eq_a = va.filter(F.col("pair_kind") == "equals")
    eq_b = vb.filter(F.col("pair_kind") == "equals")
    branches = [
        # equals: value on path missing from other_path (and vice versa)
        out(eq_a.join(eq_b.select("s", "rule_id",
                                  F.col("b_key").alias("a_key")),
                      ["s", "rule_id", "a_key"], "left_anti"),
            "rpath", "a_o", "pairNotEqual",
            F.concat(F.lit("value missing from "), "ropath")),
        out(eq_b.join(eq_a.select("s", "rule_id",
                                  F.col("a_key").alias("b_key")),
                      ["s", "rule_id", "b_key"], "left_anti"),
            "rpath", "b_o", "pairNotEqual",
            F.concat(F.lit("value only on "), "ropath")),
        # disjoint: shared value
        out(va.filter(F.col("pair_kind") == "disjoint")
            .join(vb.filter(F.col("pair_kind") == "disjoint")
                  .select("s", "rule_id", F.col("b_key").alias("a_key")),
                  ["s", "rule_id", "a_key"], "left_semi"),
            "rpath", "a_o", "pairNotDisjoint",
            F.concat(F.lit("value shared with "), "ropath")),
    ]
    # lessThan / lessThanOrEquals: all (a, b) pairs per focus node
    lt = (va.filter(F.col("pair_kind").isin("lessThan", "lessThanOrEquals"))
          .join(vb.filter(F.col("pair_kind")
                          .isin("lessThan", "lessThanOrEquals"))
                .select("s", "rule_id", "b_o", "b_kind"),
                ["s", "rule_id"]))
    a_num = F.col("a_o").try_cast("double")
    b_num = F.col("b_o").try_cast("double")
    both_lit = (F.col("a_kind") == "literal") & (F.col("b_kind") == "literal")
    both_num = both_lit & a_num.isNotNull() & b_num.isNotNull()
    ok_lt = F.when(both_num, a_num < b_num).otherwise(
        both_lit & (F.col("a_o") < F.col("b_o")))
    ok_le = F.when(both_num, a_num <= b_num).otherwise(
        both_lit & (F.col("a_o") <= F.col("b_o")))
    branches.append(
        out(lt.filter(((F.col("pair_kind") == "lessThan") & ~ok_lt)
                      | ((F.col("pair_kind") == "lessThanOrEquals")
                         & ~ok_le)),
            "rpath", "a_o",
            F.when(F.col("pair_kind") == "lessThan",
                   F.lit("pairNotLessThan"))
            .otherwise(F.lit("pairNotLessThanOrEquals")),
            F.concat(F.lit("vs "), "ropath", F.lit(" value "), "b_o")))
    res = branches[0]
    for bdf in branches[1:]:
        res = res.unionByName(bdf)
    return res.dropDuplicates()


def qualified_rules_from_shacl(shacl: DataFrame) -> DataFrame:
    """SHACL triple table -> qualified-value-shape rules (file,
    target_class, path, q_class, q_datatype, q_min, q_max): property
    shapes carrying ``sh:qualifiedValueShape [sh:class C | sh:datatype D]``
    with ``sh:qualifiedMinCount`` / ``sh:qualifiedMaxCount`` (SHACL core
    §4.7.5-6). Like the pair rules, these enter via authored shapes
    graphs — OpenAPI has no per-value-subset cardinalities."""
    node_shape = _po(shacl, SH + "targetClass", "target_class")
    prop_link = (_po(shacl, SH + "property", "prop_shape")
                 .withColumnRenamed("shape", "node"))
    path = _po(shacl, SH + "path", "path", kind="iri")
    qlink = (_po(shacl, SH + "qualifiedValueShape", "qshape")
             .withColumnRenamed("shape", "pshape"))
    qcls = (_po(shacl, SH + "class", "q_class", kind="iri")
            .withColumnRenamed("shape", "qshape"))
    qdt = (_po(shacl, SH + "datatype", "q_datatype")
           .withColumnRenamed("shape", "qshape"))
    qmin = (_po(shacl, SH + "qualifiedMinCount", "q_min")
            .withColumnRenamed("shape", "pshape"))
    qmax = (_po(shacl, SH + "qualifiedMaxCount", "q_max")
            .withColumnRenamed("shape", "pshape"))
    return (node_shape
            .join(prop_link, on=[node_shape.file == prop_link.file,
                                 node_shape.shape == prop_link.node])
            .select(node_shape.file, "target_class",
                    F.col("prop_shape").alias("shape"))
            .join(path, ["file", "shape"])
            .join(qlink.withColumnRenamed("pshape", "shape"),
                  ["file", "shape"])
            .join(qcls, ["file", "qshape"], "left")
            .join(qdt, ["file", "qshape"], "left")
            .join(qmin.withColumnRenamed("pshape", "shape"),
                  ["file", "shape"], "left")
            .join(qmax.withColumnRenamed("pshape", "shape"),
                  ["file", "shape"], "left")
            .select("file", "target_class", "path", "q_class",
                    "q_datatype",
                    F.col("q_min").cast("int").alias("q_min"),
                    F.col("q_max").cast("int").alias("q_max")))


def qualified_shape_violations(triples: DataFrame,
                               qrules: DataFrame) -> DataFrame:
    """sh:qualifiedValueShape validation -> violations(s, p, o,
    violation, detail): per focus node, the COUNT of path values
    conforming to the qualified shape (typed with ``q_class``, or a
    literal of ``q_datatype``) must lie in [q_min, q_max].

    qualifiedMinCount fires for wholly-absent / wholly-nonconforming
    properties only on CLASS-SCOPED rules (focus nodes enumerable from
    rdf:type — the same SHACL-target discipline validate_triples uses
    for minCount). Scale shape: rules broadcast; candidate values are
    one predicate-filtered slice; conformance of node values is a
    distinct-(value, class) semi-join against the type table; counting
    aggregates per (focus, rule) with map-side partials."""
    rules = (qrules.select("target_class", "path", "q_class",
                           "q_datatype", "q_min", "q_max")
             .dropDuplicates()
             .withColumn("rule_id", F.xxhash64(
                 F.coalesce("target_class", F.lit("\x00")), "path",
                 F.coalesce("q_class", F.lit("\x00")),
                 F.coalesce("q_datatype", F.lit("\x00")),
                 F.coalesce(F.col("q_min").cast("string"), F.lit("-")),
                 F.coalesce(F.col("q_max").cast("string"), F.lit("-")))))
    r = F.broadcast(rules)

    s_types = (triples.filter(F.col("p") == RDF_TYPE)
               .select(F.col("s").alias("ts"), F.col("o").alias("stype"))
               .dropDuplicates())

    cand = (triples.join(r, triples["p"] == r["path"])
            .select("s", "rule_id", "target_class", "path",
                    "q_class", "q_datatype", "q_min", "q_max",
                    "o", "o_kind", "o_datatype"))
    scoped = (cand.filter(F.col("target_class").isNotNull())
              .join(s_types, (F.col("s") == F.col("ts"))
                    & (F.col("target_class") == F.col("stype")),
                    "left_semi"))
    cand = cand.filter(F.col("target_class").isNull()).unionByName(scoped)

    # conformance: datatype rules are a row predicate; class rules
    # semi-join the (distinct) value nodes against the type table
    onode = F.when(F.col("o_kind") == "bnode",
                   F.concat(F.lit("_:"), F.col("o"))).otherwise(F.col("o"))
    dt_ok = (F.col("q_datatype").isNotNull()
             & (F.col("o_kind") == "literal")
             & (F.col("o_datatype") == F.col("q_datatype")))
    cls_cand = (cand.filter(F.col("q_class").isNotNull()
                            & (F.col("o_kind") != "literal"))
                .withColumn("onode", onode))
    cls_ok = cls_cand.join(
        s_types, (F.col("onode") == F.col("ts"))
        & (F.col("q_class") == F.col("stype")), "left_semi").drop("onode")
    conforming = cand.filter(dt_ok).unionByName(cls_ok)

    vkey = F.concat_ws("\x01", "o", "o_kind",
                       F.coalesce("o_datatype", F.lit("\x02")))
    counts = (conforming.groupBy("s", "rule_id")
              .agg(F.countDistinct(vkey).alias("n")))

    # focus universe: class-scoped rules enumerate typed subjects (so
    # n=0 can fire); unscoped rules only see subjects carrying the path
    scoped_focus = (s_types.join(
        r.filter(F.col("target_class").isNotNull()),
        F.col("stype") == F.col("target_class"))
        .select(F.col("ts").alias("s"), "rule_id"))
    unscoped_focus = (cand.filter(F.col("target_class").isNull())
                      .select("s", "rule_id").dropDuplicates())
    focus = scoped_focus.unionByName(unscoped_focus).dropDuplicates()

    checked = (focus.join(counts, ["s", "rule_id"], "left")
               .withColumn("n", F.coalesce("n", F.lit(0)))
               .join(r.select("rule_id", F.col("path").alias("rpath"),
                              "q_min", "q_max"), "rule_id"))
    detail = F.concat(F.lit("conforming="), F.col("n").cast("string"),
                      F.lit(" min="),
                      F.coalesce(F.col("q_min").cast("string"),
                                 F.lit("-")),
                      F.lit(" max="),
                      F.coalesce(F.col("q_max").cast("string"),
                                 F.lit("-")))
    return (checked.filter(
        (F.col("q_min").isNotNull() & (F.col("n") < F.col("q_min")))
        | (F.col("q_max").isNotNull() & (F.col("n") > F.col("q_max"))))
        .select("s", F.col("rpath").alias("p"),
                F.lit(None).cast("string").alias("o"),
                F.when(F.col("q_min").isNotNull()
                       & (F.col("n") < F.col("q_min")),
                       F.lit("qualifiedMinCountViolation"))
                .otherwise(F.lit("qualifiedMaxCountViolation"))
                .alias("violation"),
                detail.alias("detail"))
        .dropDuplicates())


_COMPONENT_OF = {
    "datatypeMismatch": SH + "DatatypeConstraintComponent",
    "notInList": SH + "InConstraintComponent",
    "nodeKindViolation": SH + "NodeKindConstraintComponent",
    "patternMismatch": SH + "PatternConstraintComponent",
    "classViolation": SH + "ClassConstraintComponent",
    "minInclusiveViolation": SH + "MinInclusiveConstraintComponent",
    "maxInclusiveViolation": SH + "MaxInclusiveConstraintComponent",
    "minLengthViolation": SH + "MinLengthConstraintComponent",
    "maxLengthViolation": SH + "MaxLengthConstraintComponent",
    # property-pair constraints (pair_constraint_violations)
    "pairNotEqual": SH + "EqualsConstraintComponent",
    "pairNotDisjoint": SH + "DisjointConstraintComponent",
    "pairNotLessThan": SH + "LessThanConstraintComponent",
    "pairNotLessThanOrEquals": SH + "LessThanOrEqualsConstraintComponent",
    # qualified value shapes (qualified_shape_violations)
    "qualifiedMinCountViolation": SH + "QualifiedMinCountConstraintComponent",
    "qualifiedMaxCountViolation": SH + "QualifiedMaxCountConstraintComponent",
    # datatype alternatives may originate from sh:or or sh:xone; for
    # datatype-only members the two coincide, reported as sh:or
    "noneOfDatatypes": SH + "OrConstraintComponent",
    "noneOfClasses": SH + "OrConstraintComponent",
    # list checks realize the converter's `sh:node dash:ListShape`
    "notAList": SH + "NodeConstraintComponent",
    "listMemberDatatype": SH + "NodeConstraintComponent",
    "listMemberClass": SH + "NodeConstraintComponent",
}
XSD_BOOL = "http://www.w3.org/2001/XMLSchema#boolean"


def attach_severity(violations: DataFrame, rules: DataFrame,
                    default: str | None = None) -> DataFrame:
    """Add ``severity`` / ``message`` columns to a violations frame from
    the rules' ``sh:severity`` / ``sh:message`` declarations (SHACL spec
    §2.1.4-5): one broadcast join on the constrained path; when several
    rules for the same path declare different values, the lexicographic
    MIN wins (deterministic). ``default`` fills paths with no declared
    severity (``sh:Violation`` when None). Kept SEPARATE from
    validate_triples so the quarantine schema — and every existing
    oracle — stays 5-column unless a caller opts in."""
    for c in ("severity", "message"):
        if c not in rules.columns:
            rules = rules.withColumn(c, F.lit(None).cast("string"))
    sev = (rules.groupBy(F.col("path").alias("vp"))
           .agg(F.min("severity").alias("severity"),
                F.min("message").alias("message")))
    return (violations
            .join(F.broadcast(sev), violations["p"] == F.col("vp"), "left")
            .drop("vp")
            .withColumn("severity",
                        F.coalesce("severity",
                                   F.lit(default or SH + "Violation"))))


def validation_report_triples(violations: DataFrame,
                              file: str = "validation",
                              graph: str = "report") -> DataFrame:
    """validate_triples output -> a W3C SHACL validation report as TRIPLES
    (the reference world's native result format: `sh:ValidationReport` /
    `sh:ValidationResult`, SHACL spec §3.6), in the repo's standard
    TRIPLES_SCHEMA so the report unions into the graph, exports through the
    Turtle/N-Triples sinks, and is queryable with the BGP/SPARQL surface
    ("which focus nodes fail which constraint components").

    Shape emitted per violation row (one result node):
      _:vr_<md5>  rdf:type sh:ValidationResult ;
                  sh:focusNode <s> ; sh:resultPath <p> ;
                  sh:value "o" (when present) ;
                  sh:resultSeverity sh:Violation ;
                  sh:sourceConstraintComponent <mapped component> ;
                  sh:resultMessage "detail" .
      _:report    rdf:type sh:ValidationReport ;
                  sh:conforms false ; sh:result _:vr_<md5> .
    plus, for an EMPTY violation table, the two-triple conforming report.

    cardinalityViolation rows split into Min/MaxCountConstraintComponent by
    parsing the pinned detail string (count vs min). Result-node ids are
    content-hashed (md5 of the violation identity) — deterministic under
    any partitioning, stable across runs. One projection pass over the
    violations table + a one-row count aggregate for the header; no joins.
    """
    count_n = F.regexp_extract("detail", r"count=(\d+)", 1).cast("long")
    min_n = F.regexp_extract("detail", r"min=(\d+)", 1)
    component = (F.when(F.col("violation") == "cardinalityViolation",
                        F.when((min_n != "") & (count_n < min_n.cast("long")),
                               F.lit(SH + "MinCountConstraintComponent"))
                        .otherwise(F.lit(SH + "MaxCountConstraintComponent")))
                 .otherwise(F.element_at(
                     F.create_map(*[F.lit(x) for kv in _COMPONENT_OF.items()
                                    for x in kv]),
                     F.col("violation"))))
    rid = F.concat(F.lit("_:vr_"), F.md5(F.concat_ws(
        "\x01", "s", "p", F.coalesce("o", F.lit("\x02")),
        "violation", "detail")))

    def emit(s, p, o_kind, o, dt=None):
        return F.struct(
            s.alias("s"), p.alias("p"), F.lit(o_kind).alias("o_kind"),
            o.alias("o"),
            (F.lit(dt) if dt else F.lit(None).cast("string"))
            .alias("o_datatype"))

    report = F.lit("_:report")
    extra = [c for c in ("severity", "message")
             if c in violations.columns]
    per_result = (violations.select(rid.alias("rid"), "s", "p", "o",
                                    "violation", "detail", *extra,
                                    component.alias("component"))
                  .select(F.explode(F.array(
                      emit(F.col("rid"), F.lit(RDF_TYPE), "iri",
                           F.lit(SH + "ValidationResult")),
                      emit(F.col("rid"), F.lit(SH + "focusNode"), "iri",
                           F.col("s")),
                      emit(F.col("rid"), F.lit(SH + "resultPath"), "iri",
                           F.col("p")),
                      emit(F.col("rid"), F.lit(SH + "resultSeverity"), "iri",
                           F.coalesce(F.col("severity"),
                                      F.lit(SH + "Violation"))
                           if "severity" in violations.columns
                           else F.lit(SH + "Violation")),
                      emit(F.col("rid"),
                           F.lit(SH + "sourceConstraintComponent"), "iri",
                           F.col("component")),
                      emit(F.col("rid"), F.lit(SH + "resultMessage"),
                           "literal", F.col("detail")),
                      F.when(F.col("o").isNotNull(),
                             emit(F.col("rid"), F.lit(SH + "value"),
                                  "literal", F.col("o"))),
                      # a declared sh:message becomes a SECOND
                      # resultMessage alongside the diagnostic detail
                      (F.when(F.col("message").isNotNull(),
                              emit(F.col("rid"),
                                   F.lit(SH + "resultMessage"),
                                   "literal", F.col("message")))
                       if "message" in violations.columns
                       else F.lit(None).cast(
                           "struct<s string, p string, o_kind string, "
                           "o string, o_datatype string>")),
                      emit(report, F.lit(SH + "result"), "bnode",
                           F.col("rid")),
                  )).alias("t"))
                  .filter(F.col("t").isNotNull())
                  .select("t.*"))

    header = (violations.agg(F.count(F.lit(1)).alias("n"))
              .select(F.explode(F.array(
                  emit(report, F.lit(RDF_TYPE), "iri",
                       F.lit(SH + "ValidationReport")),
                  emit(report, F.lit(SH + "conforms"), "literal",
                       F.when(F.col("n") > 0, "false").otherwise("true"),
                       XSD_BOOL),
              )).alias("t")).select("t.*"))

    return (header.unionByName(per_result)
            .select(F.lit(file).alias("file"), F.lit(graph).alias("graph"),
                    "s", "p", "o_kind", "o", "o_datatype"))


def rule_conflicts(rules: DataFrame) -> DataFrame:
    """Cross-file shape-rule conflicts per (target_class, path) — the
    vocabulary-governance check for a rules table merged from MANY specs
    (e.g. successive 3GPP releases converted separately): two files
    constraining the same property incompatibly is a spec bug to surface
    before validation enforces an arbitrary winner.

    Output (target_class, path, facet, values, n_files), one row per
    conflicting facet:

    - datatype / node_kind / value_class / pattern: more than one
      distinct non-null value across files ("values" = the sorted
      distinct set, comma-joined);
    - in_values: more than one distinct non-null enum signature
      (pipe-joined value list);
    - cardinality: max(min_count) > min(max_count) — no cardinality can
      satisfy all files at once ("values" = "min>max").

    One aggregation pass over the vocabulary-sized rules table; the
    conditional-struct-array explode mirrors shape_drift.
    """
    facets = ["datatype", "node_kind", "value_class", "pattern"]
    for c in ("value_class",):
        if c not in rules.columns:
            rules = rules.withColumn(c, F.lit(None).cast("string"))
    in_sig = F.when(F.col("in_values").isNotNull(),
                    F.concat_ws("|", "in_values"))
    agg = (rules.groupBy("target_class", "path").agg(
        F.countDistinct("file").alias("n_files"),
        *[F.array_sort(F.collect_set(f)).alias(f"{f}_vals")
          for f in facets],
        F.array_sort(F.collect_set(in_sig)).alias("in_values_vals"),
        F.max("min_count").alias("max_min"),
        F.min("max_count").alias("min_max")))

    def conflict(facet, cond, values):
        return F.when(cond, F.struct(F.lit(facet).alias("facet"),
                                     values.alias("values")))

    entries = [conflict(f, F.size(f"{f}_vals") > 1,
                        F.concat_ws(",", f"{f}_vals"))
               for f in facets + ["in_values"]]
    entries.append(conflict(
        "cardinality", F.col("max_min") > F.col("min_max"),
        F.concat(F.col("max_min").cast("string"), F.lit(">"),
                 F.col("min_max").cast("string"))))
    return (agg.select("target_class", "path", "n_files",
                       F.explode(F.array(*entries)).alias("c"))
            .filter(F.col("c").isNotNull())
            .select("target_class", "path", "c.facet", "c.values",
                    "n_files"))


def shape_drift(old_rules: DataFrame, new_rules: DataFrame) -> DataFrame:
    """Schema drift between two shape-rule snapshots (typically
    ``infer_shapes`` over two data generations, or an authored spec's rules
    vs data-inferred ones): (target_class, path, change, before, after).

    Changes reported per (class, path): property_added / property_removed,
    and per-facet *_changed rows for min_count, max_count, datatype,
    node_kind, in_values, pattern. A full-outer join on the rule identity +
    one conditional-array explode — rule tables are vocabulary-sized, so
    this runs anywhere; at 100 TB the expensive part is producing the rule
    snapshots (infer_shapes), not diffing them.
    """
    facets = ["min_count", "max_count", "datatype", "node_kind", "pattern"]
    # sh:class / range facets diff only when both snapshots carry them —
    # infer_shapes output predates these columns and must keep diffing
    facets += [c for c in ("value_class", "min_inclusive", "max_inclusive",
                           "any_datatype", "any_class", "is_list",
                           "list_member_datatype", "list_member_class")
               if c in old_rules.columns and c in new_rules.columns]

    def side(df, tag):
        cols = [F.coalesce(F.col("target_class"), F.lit("")).alias(f"{tag}_tc"),
                F.col("path").alias(f"{tag}_path")]
        cols += [F.col(f).cast("string").alias(f"{tag}_{f}") for f in facets]
        cols += [F.concat_ws(",", "in_values").alias(f"{tag}_in_values"),
                 F.lit(True).alias(f"{tag}_present")]
        return df.select(*cols)

    o, n = side(old_rules, "o"), side(new_rules, "n")
    j = o.join(n, (F.col("o_tc") == F.col("n_tc"))
               & (F.col("o_path") == F.col("n_path")), "full_outer")

    tc = F.coalesce(F.col("o_tc"), F.col("n_tc"))
    path = F.coalesce(F.col("o_path"), F.col("n_path"))

    def chg(name, before, after, cond):
        return F.when(cond, F.struct(
            F.lit(name).alias("change"),
            before.alias("before"), after.alias("after")))

    entries = [
        chg("property_added", F.lit(None).cast("string"), F.lit(None).cast("string"),
            F.col("o_present").isNull()),
        chg("property_removed", F.lit(None).cast("string"), F.lit(None).cast("string"),
            F.col("n_present").isNull()),
    ]
    both = F.col("o_present").isNotNull() & F.col("n_present").isNotNull()
    for f in facets + ["in_values"]:
        ov, nv = F.col(f"o_{f}"), F.col(f"n_{f}")
        entries.append(chg(f"{f}_changed", ov, nv,
                           both & ~ov.eqNullSafe(nv)))

    return (j.select(tc.alias("_tc"), path.alias("path"),
                     F.explode(F.array(*entries)).alias("c"))
            .filter(F.col("c").isNotNull())
            .select(F.when(F.col("_tc") != "", F.col("_tc")).alias("target_class"),
                    "path", "c.change", "c.before", "c.after"))
