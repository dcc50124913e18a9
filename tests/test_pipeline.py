"""Pipeline-layer tests: snapshots/resume, Turtle sink, shape validation,
canonicalization ground truth, end-to-end run."""

import pathlib

import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.canonicalize import canonical_entity_map
from openapi_to_rdf_spark.operators.components import connected_components
from openapi_to_rdf_spark.operators.extract import (
    ENT_NS, KG_NS, extract_transcript_triples,
)
from openapi_to_rdf_spark.operators.shapes import (
    kg_shape_rules, shape_rules_from_shacl, validate_triples,
)
from openapi_to_rdf_spark.plans.pipeline import run_pipeline
from openapi_to_rdf_spark.plans.snapshot import (
    fingerprint, materialize, read_manifest, read_snapshot, write_snapshot,
)
from openapi_to_rdf_spark.sources.transcripts import class_vocab_df, synth_transcripts


def test_snapshot_roundtrip_and_lineage(spark, tmp_path):
    df = spark.range(0, 1000, 1, 4).withColumn("g", F.pmod("id", F.lit(3)))
    fp = fingerprint("t", 1)
    man = write_snapshot(df, tmp_path / "t", fp, count_by=["g"])
    assert man["metrics"]["rows"] == 1000
    assert sum(man["lineage"].values()) == 1000
    assert len(man["lineage"]) >= 1
    assert sum(man["metrics"]["counts"].values()) == 1000
    back = read_snapshot(spark, tmp_path / "t", fp)
    assert back.count() == 1000
    assert read_manifest(tmp_path / "t")["fingerprint"] == fp


def test_materialize_skips_committed_stage(spark, tmp_path):
    calls = []

    def thunk():
        calls.append(1)
        return spark.range(10)

    fp = fingerprint("stage", "a")
    materialize(thunk, spark, tmp_path / "s", fp)
    materialize(thunk, spark, tmp_path / "s", fp)
    assert len(calls) == 1  # second call resumed from the committed snapshot


def test_turtle_sink_roundtrip(spark, tmp_path):
    from openapi_to_rdf_spark.convert.shacl import convert_shacl
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.sinks import write_turtle
    from openapi_to_rdf_spark.triplecore.turtle import parse_turtle
    from openapi_to_rdf_spark.triplecore.canon import canonicalize_bnodes

    src = pathlib.Path("/root/reference/assets/MnS-Rel-19-OpenAPI/OpenAPI/TS28623_GenericNrm.yaml")
    specs = spark.createDataFrame([(src.name, src.read_text())], ["path", "content"])
    triples = convert_specs_df(specs)
    res = {(r.graph): r for r in write_turtle(triples, str(tmp_path / "out")).collect()}
    assert set(res) == {"rdf", "shacl"}
    conv = convert_shacl(src.name, src.read_text())
    for gname, expected in [("rdf", conv.rdf), ("shacl", conv.sh)]:
        written = parse_turtle(pathlib.Path(res[gname].out_path).read_text())
        assert canonicalize_bnodes(written) == canonicalize_bnodes(expected)


def test_shape_rules_from_converted_spec(spark):
    from openapi_to_rdf_spark.operators.extract import convert_specs_df

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Alarm:
      type: object
      required: [severity]
      properties:
        severity:
          type: string
          enum: [CRITICAL, MAJOR, MINOR]
        count:
          type: integer
"""
    specs = spark.createDataFrame([("alarms.yaml", yaml_text)], ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = {r["path"].rsplit("#", 1)[-1]: r
             for r in shape_rules_from_shacl(shacl).collect()}
    assert sorted(rules["severity"]["in_values"]) == ["CRITICAL", "MAJOR", "MINOR"]
    assert rules["severity"]["min_count"] == 1 and rules["severity"]["max_count"] == 1
    assert rules["count"]["datatype"].endswith("integer")
    assert rules["count"]["min_count"] is None


def test_converted_pattern_rule_enforced(spark):
    """sh:pattern emitted by the converter flows through shape_rules_from_
    shacl into validate_triples: a literal off the regex is flagged, a
    conforming one passes (XPath matches() = partial-match semantics)."""
    from openapi_to_rdf_spark.operators.extract import convert_specs_df

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Cell:
      type: object
      properties:
        nci:
          type: string
          pattern: '^[0-9A-F]{16}$'
"""
    specs = spark.createDataFrame([("cells.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = shape_rules_from_shacl(shacl)
    nci = [r for r in rules.collect() if r["path"].endswith("#nci")]
    assert nci and nci[0]["pattern"] == "^[0-9A-F]{16}$"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    path, cls = nci[0]["path"], nci[0]["target_class"]
    triples = spark.createDataFrame(
        [("c0", "kg", "x#1", rdf_type, "iri", cls, None),
         ("c0", "kg", "x#2", rdf_type, "iri", cls, None),
         ("c0", "kg", "x#1", path, "literal", "0123456789ABCDEF",
          xsd + "string"),
         ("c0", "kg", "x#2", path, "literal", "not-a-cell-id",
          xsd + "string")],
        "file string, graph string, s string, p string, o_kind string, "
        "o string, o_datatype string")
    v = validate_triples(triples, rules).collect()
    assert [(r.s, r.violation) for r in v] == [("x#2", "patternMismatch")]


def test_validate_triples_catches_violations(spark):
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    iso = "2026-01-01T00:00:00Z"
    rows = [
        # focus-node types (class-scoped rules need them)
        *[("c0", "kg", f"t#{i}", rdf_type, "iri", KG_NS + "Turn", None)
          for i in (1, 2, 3, 4)],
        *[("c0", "kg", f"t#{i}", KG_NS + "atTime", "literal", iso,
           xsd + "dateTime") for i in (2, 3, 4)],
        ("c0", "kg", "t#3", KG_NS + "role", "literal", "user", xsd + "string"),
        # role not in the allowed list
        ("c0", "kg", "t#1", KG_NS + "role", "literal", "alien", xsd + "string"),
        # atTime with wrong datatype AND a lexical form off the sh:pattern
        ("c0", "kg", "t#1", KG_NS + "atTime", "literal", "x", xsd + "string"),
        # duplicate role (maxCount 1)
        ("c0", "kg", "t#2", KG_NS + "role", "literal", "user", xsd + "string"),
        ("c0", "kg", "t#2", KG_NS + "role", "literal", "tool", xsd + "string"),
        # mentions must be an IRI
        ("c0", "kg", "t#3", KG_NS + "mentions", "literal", "oops", xsd + "string"),
        # clean turn: typed + role + atTime present and conforming
        ("c0", "kg", "t#4", KG_NS + "role", "literal", "user", xsd + "string"),
    ]
    triples = spark.createDataFrame(
        rows, "file string, graph string, s string, p string, o_kind string, "
              "o string, o_datatype string")
    v = validate_triples(triples, kg_shape_rules(spark, KG_NS))
    kinds = {r.violation for r in v.collect()}
    assert kinds == {"notInList", "datatypeMismatch", "cardinalityViolation",
                     "nodeKindViolation", "patternMismatch"}
    assert v.filter((F.col("s") == "t#1")
                    & (F.col("violation") == "patternMismatch")).count() == 1
    assert v.filter(F.col("s") == "t#4").count() == 0


def test_validate_min_count_fires_for_absent_property(spark):
    """A typed focus node MISSING a min_count=1 property entirely must fire
    count=0 (ADVICE r1: the aggregate-only check could never see absent
    properties, making every minCount rule dead)."""
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    triples = spark.createDataFrame([
        # typed turn with NO role and NO atTime at all
        ("c0", "kg", "t#bare", rdf_type, "iri", KG_NS + "Turn", None),
        # conversation with no hasTurn
        ("c0", "kg", "cv#empty", rdf_type, "iri", KG_NS + "Conversation", None),
        # untyped subject with no properties -> open world, no violations
        ("c0", "kg", "x#untyped", KG_NS + "surfaceForm", "literal", "ok",
         xsd + "string"),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    v = validate_triples(triples, kg_shape_rules(spark, KG_NS))
    got = {(r.s, r.p): r.detail for r in v.collect()}
    assert got == {
        ("t#bare", KG_NS + "role"): "count=0 min=1 max=-",
        ("t#bare", KG_NS + "atTime"): "count=0 min=1 max=-",
        ("cv#empty", KG_NS + "hasTurn"): "count=0 min=1 max=-",
    }


def test_converted_class_and_range_rules_enforced(spark):
    """sh:class and sh:minInclusive/maxInclusive emitted by the converter
    flow through shape_rules_from_shacl into validate_triples: an untyped
    or literal value under a sh:class rule is flagged, a correctly-typed
    one passes; numbers outside [min, max] (or non-numeric lexicals) are
    flagged, in-range ones pass."""
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.shapes import shape_rules_from_shacl

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Alarm:
      type: object
      properties:
        source:
          $ref: '#/components/schemas/ManagedElement'
        level:
          type: integer
          minimum: 0
          maximum: 10
    ManagedElement:
      type: object
      properties:
        name:
          type: string
"""
    specs = spark.createDataFrame([("alarms.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = shape_rules_from_shacl(shacl)
    by_path = {r["path"].rsplit("#", 1)[-1]: r for r in rules.collect()}
    assert by_path["source"]["value_class"].endswith("#ManagedElement")
    assert by_path["level"]["min_inclusive"] == "0"
    assert by_path["level"]["max_inclusive"] == "10"

    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    alarm = by_path["source"]["target_class"]
    me_cls = by_path["source"]["value_class"]
    src_p, lvl_p = by_path["source"]["path"], by_path["level"]["path"]
    triples = spark.createDataFrame([
        *[("c0", "kg", f"a#{i}", rdf_type, "iri", alarm, None)
          for i in (1, 2, 3, 4, 5, 6, 7)],
        ("c0", "kg", "me#ok", rdf_type, "iri", me_cls, None),
        # typed object -> passes; untyped -> classViolation;
        # literal -> classViolation
        ("c0", "kg", "a#1", src_p, "iri", "me#ok", None),
        ("c0", "kg", "a#2", src_p, "iri", "me#ghost", None),
        ("c0", "kg", "a#3", src_p, "literal", "inline", xsd + "string"),
        # in-range / below / above / non-numeric
        ("c0", "kg", "a#4", lvl_p, "literal", "5", xsd + "integer"),
        ("c0", "kg", "a#5", lvl_p, "literal", "-3", xsd + "integer"),
        ("c0", "kg", "a#6", lvl_p, "literal", "99", xsd + "integer"),
        ("c0", "kg", "a#7", lvl_p, "literal", "NaNish", xsd + "integer"),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    v = validate_triples(triples, rules)
    got = {(r.s, r.violation) for r in v.collect()}
    assert got == {
        ("a#2", "classViolation"), ("a#3", "classViolation"),
        ("a#5", "minInclusiveViolation"), ("a#6", "maxInclusiveViolation"),
        # a non-numeric lexical can satisfy neither bound
        ("a#7", "minInclusiveViolation"), ("a#7", "maxInclusiveViolation"),
    }
    details = {r.violation: r.detail for r in v.collect() if r.s == "a#5"}
    assert details["minInclusiveViolation"] == "minInclusive 0 got -3"


def test_min_max_length_rules_end_to_end(spark):
    """sh:minLength/sh:maxLength: the converter emits them on xsd:string
    properties (quirk: only when the datatype stays xsd:string);
    shape_rules_from_shacl pivots them and validate_triples enforces the
    character-length bounds on the lexical form."""
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.shapes import shape_rules_from_shacl

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Tag:
      type: object
      properties:
        label:
          type: string
          minLength: 2
          maxLength: 4
"""
    specs = spark.createDataFrame([("tags.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = shape_rules_from_shacl(shacl)
    row = rules.collect()[0]
    assert (row["min_length"], row["max_length"]) == (2, 4)

    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    lbl, tag_cls = row["path"], row["target_class"]
    triples = spark.createDataFrame([
        *[("c0", "kg", s, rdf_type, "iri", tag_cls, None)
          for s in ("t#ok", "t#short", "t#long", "t#iri")],
        ("c0", "kg", "t#ok", lbl, "literal", "abc", xsd + "string"),
        ("c0", "kg", "t#short", lbl, "literal", "a", xsd + "string"),
        ("c0", "kg", "t#long", lbl, "literal", "abcdef", xsd + "string"),
        ("c0", "kg", "t#iri", lbl, "iri", "http://x", None),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    got = {(r.s, r.violation)
           for r in validate_triples(triples, rules).collect()}
    # the IRI value also violates nodeKind-free length checks (no lexical
    # form) and the converter's cardinality default maxCount=1 is fine here
    assert ("t#short", "minLengthViolation") in got
    assert ("t#long", "maxLengthViolation") in got
    assert ("t#iri", "minLengthViolation") in got
    assert not any(s == "t#ok" for (s, _) in got)
    details = {r.s: r.detail
               for r in validate_triples(triples, rules).collect()
               if r.violation == "minLengthViolation"}
    assert details["t#short"] == "minLength 2 got len 1"


def test_scalar_alias_rules_resolve_to_datatype_sets(spark):
    """A property whose sh:class points at a scalar alias (OpenAPI oneOf
    over primitives -> targetClass + sh:xone of datatype shapes) must
    validate literals against the datatype SET, not demand an IRI
    instance; a plain alias the converter emits no shape for stays a
    class rule."""
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.shapes import (
        resolve_scalar_aliases, shape_rules_from_shacl)

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Alarm:
      type: object
      properties:
        severity:
          $ref: '#/components/schemas/Level'
        thresh:
          $ref: '#/components/schemas/Hysteresis'
    Level:
      oneOf:
        - type: integer
        - type: number
    Hysteresis:
      type: number
"""
    specs = spark.createDataFrame([("alarms.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = resolve_scalar_aliases(shape_rules_from_shacl(shacl), shacl)
    by_path = {r["path"].rsplit("#", 1)[-1]: r for r in rules.collect()}
    xsd = "http://www.w3.org/2001/XMLSchema#"
    sev = by_path["severity"]
    assert sev["value_class"] is None
    assert sorted(sev["any_datatype"]) == [xsd + "double", xsd + "integer"]
    # no shape exists for Hysteresis -> nothing to resolve against
    assert by_path["thresh"]["value_class"].endswith("#Hysteresis")
    assert by_path["thresh"]["any_datatype"] is None

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    alarm, sev_p = sev["target_class"], sev["path"]
    triples = spark.createDataFrame([
        *[("c0", "kg", f"a#{i}", rdf_type, "iri", alarm, None)
          for i in (1, 2, 3)],
        ("c0", "kg", "a#1", sev_p, "literal", "3", xsd + "integer"),
        ("c0", "kg", "a#2", sev_p, "literal", "oops", xsd + "string"),
        ("c0", "kg", "a#3", sev_p, "iri", "lvl#3", None),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    v = validate_triples(triples, rules)
    got = {(r.s, r.violation) for r in v.collect()}
    assert got == {("a#2", "noneOfDatatypes"), ("a#3", "noneOfDatatypes")}
    d = {r.s: r.detail for r in v.collect()}
    assert d["a#2"].endswith("got " + xsd + "string")
    assert d["a#3"].endswith("got iri")


def test_rule_conflicts_across_files(spark):
    from openapi_to_rdf_spark.operators.shapes import rule_conflicts

    xsd = "http://www.w3.org/2001/XMLSchema#"
    schema = ("file string, target_class string, path string, "
              "datatype string, min_count int, max_count int, "
              "in_values array<string>, node_kind string, pattern string")
    rules = spark.createDataFrame([
        ("f1", "C", "p1", xsd + "integer", 1, 1, None, None, None),
        ("f2", "C", "p1", xsd + "string", None, None, None, None, None),
        ("f1", "C", "p2", None, 2, None, ["a", "b"], None, None),
        ("f2", "C", "p2", None, None, 1, ["a"], None, None),
        # identical constraints in both files: no conflict
        ("f1", "C", "p3", xsd + "string", 0, 1, None, None, None),
        ("f2", "C", "p3", xsd + "string", 0, 1, None, None, None),
    ], schema)
    got = {(r.target_class, r.path, r.facet): r.values
           for r in rule_conflicts(rules).collect()}
    assert set(got) == {("C", "p1", "datatype"), ("C", "p2", "in_values"),
                        ("C", "p2", "cardinality")}
    assert got[("C", "p1", "datatype")] == (
        xsd + "integer," + xsd + "string")
    assert got[("C", "p2", "in_values")] == "a,a|b"
    assert got[("C", "p2", "cardinality")] == "2>1"


def test_list_rules_validate_members(spark):
    """sh:node dash:ListShape flows into list rules: inline arrays carry
    member datatypes, aliased arrays (ReportList-style) resolve through
    sh:class; validation walks instance cons chains and checks members."""
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.rdflists import (
        RDF_FIRST, RDF_NIL, RDF_REST)
    from openapi_to_rdf_spark.operators.shapes import (
        resolve_scalar_aliases, shape_rules_from_shacl)

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Alarm:
      type: object
      properties:
        tags:
          type: array
          items:
            type: string
        reports:
          $ref: '#/components/schemas/ReportList'
    ReportList:
      type: array
      items:
        $ref: '#/components/schemas/Report'
    Report:
      type: object
      properties:
        body:
          type: string
"""
    specs = spark.createDataFrame([("alarms.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = resolve_scalar_aliases(shape_rules_from_shacl(shacl), shacl)
    by_path = {r["path"].rsplit("#", 1)[-1]: r for r in rules.collect()}
    xsd = "http://www.w3.org/2001/XMLSchema#"
    assert by_path["tags"]["is_list"] is True
    assert by_path["tags"]["list_member_datatype"] == xsd + "string"
    rep = by_path["reports"]
    assert (rep["is_list"], rep["value_class"]) == (True, None)
    assert rep["list_member_class"].endswith("#Report")

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    alarm = by_path["tags"]["target_class"]
    tags_p, reports_p = by_path["tags"]["path"], rep["path"]
    report_cls = rep["list_member_class"]
    triples = spark.createDataFrame([
        *[("c0", "kg", f"a#{i}", rdf_type, "iri", alarm, None)
          for i in (1, 2, 3, 4, 5, 6)],
        # clean single-element string list
        ("c0", "kg", "a#1", tags_p, "bnode", "l1", None),
        ("c0", "kg", "_:l1", RDF_FIRST, "literal", "x", xsd + "string"),
        ("c0", "kg", "_:l1", RDF_REST, "iri", RDF_NIL, None),
        # wrong member datatype
        ("c0", "kg", "a#2", tags_p, "bnode", "l2", None),
        ("c0", "kg", "_:l2", RDF_FIRST, "literal", "5", xsd + "integer"),
        ("c0", "kg", "_:l2", RDF_REST, "iri", RDF_NIL, None),
        # literal where a list belongs / node with no cons cell
        ("c0", "kg", "a#3", tags_p, "literal", "oops", xsd + "string"),
        ("c0", "kg", "a#4", tags_p, "iri", "nolist#4", None),
        # two-element report list: first member typed, second untyped
        ("c0", "kg", "a#5", reports_p, "bnode", "l5", None),
        ("c0", "kg", "_:l5", RDF_FIRST, "iri", "rep#ok", None),
        ("c0", "kg", "_:l5", RDF_REST, "bnode", "l6", None),
        ("c0", "kg", "_:l6", RDF_FIRST, "iri", "rep#ghost", None),
        ("c0", "kg", "_:l6", RDF_REST, "iri", RDF_NIL, None),
        ("c0", "kg", "rep#ok", rdf_type, "iri", report_cls, None),
        # rdf:nil = the empty list, valid
        ("c0", "kg", "a#6", tags_p, "iri", RDF_NIL, None),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    v = validate_triples(triples, rules)
    got = {(r.s, r.violation, r.o) for r in v.collect()}
    assert got == {
        ("a#2", "listMemberDatatype", "5"),
        ("a#3", "notAList", "oops"),
        ("a#4", "notAList", "nolist#4"),
        ("a#5", "listMemberClass", "rep#ghost"),
    }


def test_union_alias_rules_resolve_to_class_sets(spark):
    """A property whose sh:class points at a UNION alias (OpenAPI oneOf
    over object refs -> targetClass + sh:xone of sh:class members) must
    accept values typed with ANY member class and flag others; literals
    can satisfy no class alternative."""
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.shapes import (
        resolve_scalar_aliases, shape_rules_from_shacl)

    yaml_text = """
openapi: 3.0.1
components:
  schemas:
    Alarm:
      type: object
      properties:
        origin:
          $ref: '#/components/schemas/AnyNode'
    AnyNode:
      oneOf:
        - $ref: '#/components/schemas/Cell'
        - $ref: '#/components/schemas/Router'
    Cell:
      type: object
      properties:
        cid: {type: string}
    Router:
      type: object
      properties:
        rid: {type: string}
"""
    specs = spark.createDataFrame([("net.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    rules = resolve_scalar_aliases(shape_rules_from_shacl(shacl), shacl)
    origin = [r for r in rules.collect()
              if r["path"].endswith("#origin")][0]
    assert origin["value_class"] is None
    assert sorted(c.rsplit("#", 1)[-1] for c in origin["any_class"]) == \
        ["Cell", "Router"]

    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    xsd = "http://www.w3.org/2001/XMLSchema#"
    alarm, p = origin["target_class"], origin["path"]
    cell = [c for c in origin["any_class"] if c.endswith("#Cell")][0]
    triples = spark.createDataFrame([
        *[("c0", "kg", f"a#{i}", rdf_type, "iri", alarm, None)
          for i in (1, 2, 3)],
        ("c0", "kg", "n#cell", rdf_type, "iri", cell, None),
        ("c0", "kg", "n#other", rdf_type, "iri", alarm, None),
        ("c0", "kg", "a#1", p, "iri", "n#cell", None),    # typed Cell: ok
        ("c0", "kg", "a#2", p, "iri", "n#other", None),   # wrong class
        ("c0", "kg", "a#3", p, "literal", "inline", xsd + "string"),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    v = validate_triples(triples, rules)
    got = {(r.s, r.violation) for r in v.collect()}
    assert got == {("a#2", "noneOfClasses"), ("a#3", "noneOfDatatypes")}


def test_align_rules_realigns_value_class(spark):
    from openapi_to_rdf_spark.operators.shapes import (
        align_rules_to_namespace)

    rules = spark.createDataFrame(
        [("f", "http://x/spec#Alarm", "http://x/spec#source", None, None,
          None, None, None, None, "http://x/spec#ManagedElement", "0",
          None)],
        "file string, target_class string, path string, datatype string, "
        "min_count int, max_count int, in_values array<string>, "
        "node_kind string, pattern string, value_class string, "
        "min_inclusive string, max_inclusive string")
    row = align_rules_to_namespace(rules, KG_NS).collect()[0]
    assert row["value_class"] == KG_NS + "ManagedElement"
    assert row["target_class"] == KG_NS + "Alarm"
    assert row["min_inclusive"] == "0"


def test_canonicalize_empty_normalization_guard(spark):
    """Entities with no [a-z0-9] characters must self-map, never merge:
    their padded shingle sets would be degenerate-identical ('___'), so
    without the guard two unrelated non-Latin strings band-collide AND
    verify at Jaccard 1.0 (ADVICE r1)."""
    ents = spark.createDataFrame(
        [("e1", "Σήμα κινδύνου"), ("e2", "警报记录"), ("e3", "!!! ???"),
         ("e4", "alarm-rec-1"), ("e5", "alarm_rec_1")],
        ["ent", "surface"])
    m = {r.ent: r.canonical
         for r in canonical_entity_map(ents, threshold=0.9).collect()}
    assert m["e1"] == "e1" and m["e2"] == "e2" and m["e3"] == "e3"
    assert m["e4"] == m["e5"]  # normal aliases still merge
    assert len(m) == 5


@pytest.mark.parametrize("driver_limit", [None, 0])
def test_connected_components_high_diameter_chain(spark, driver_limit):
    """A 40-node path graph converges to one component on BOTH regimes —
    the distributed loop (driver_limit=0) must iterate past the seeding
    pass (alias clusters are shallow; this guards the general case)."""
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(39)], ["src", "dst"])
    comp = {r.node: r.component
            for r in connected_components(
                edges, driver_limit=driver_limit).collect()}
    assert set(comp.values()) == {"n00"}
    assert len(comp) == 40


@pytest.mark.parametrize("driver_limit", [None, 0])
def test_connected_components_salted(spark, driver_limit):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "a")],
        ["src", "dst"])
    comp = {r.node: r.component
            for r in connected_components(
                edges, driver_limit=driver_limit).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == comp["p"] == comp["q"] == comp["r"]
    assert comp["x"] == comp["y"] != comp["a"]


def test_connected_components_regimes_agree(spark):
    """Driver union-find and distributed Shiloach–Vishkin return the SAME
    (node, component) map on a messy random graph (self-loops, duplicate
    and reversed edges, scrambled ids, singleton-free by construction)."""
    import random

    rng = random.Random(20260819)
    ids = [f"v{rng.randrange(10**6):06d}" for _ in range(400)]
    raw = [(rng.choice(ids), rng.choice(ids)) for _ in range(600)]
    raw += [(b, a) for a, b in raw[:100]] + [(x, x) for x in ids[:20]]
    edges = spark.createDataFrame(raw, ["src", "dst"])
    local = {(r.node, r.component)
             for r in connected_components(edges).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(edges, driver_limit=0).collect()}
    assert local == dist and local


def test_connected_components_byte_guard_routes_wide_ids(spark, monkeypatch):
    """VERDICT r3 #8: an edge set UNDER the count limit but with wide node
    ids must take the distributed path (the driver guard is now sized in
    estimated collected bytes, not edges). Observed by making the driver
    path un-runnable and checking the job still completes — then checking
    narrow ids DO hit the driver path under the same monkeypatch."""
    from openapi_to_rdf_spark.operators import components as C

    def boom(pairs):
        raise AssertionError("driver path must not run")

    monkeypatch.setattr(C, "_driver_components", boom)
    wide = spark.createDataFrame(
        [("A" * 4000 + str(i), "A" * 4000 + str(i + 1)) for i in range(40)],
        ["src", "dst"])
    comp = {r.node: r.component
            for r in C.connected_components(
                wide, byte_limit=100_000).collect()}
    assert len(set(comp.values())) == 1          # one 41-node chain

    narrow = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    with pytest.raises(AssertionError, match="driver path"):
        C.connected_components(narrow, byte_limit=100_000).collect()


def test_canonicalization_ground_truth(spark):
    turns = synth_transcripts(spark, 300, 42)
    tr = extract_transcript_triples(turns, class_vocab_df(spark))
    ents = (tr.filter(F.col("p") == KG_NS + "surfaceForm")
            .select(F.col("s").alias("ent"), F.col("o").alias("surface"))
            .dropDuplicates(["ent"]))
    cmap = canonical_entity_map(ents, threshold=0.9)
    j = cmap.withColumn("true_id", F.regexp_extract("ent", r"(\d{4})$", 1))
    missed = (j.groupBy("true_id")
              .agg(F.countDistinct("canonical").alias("n")).filter("n > 1").count())
    over = (j.groupBy("canonical")
            .agg(F.countDistinct("true_id").alias("n")).filter("n > 1").count())
    assert missed == 0 and over == 0
    assert cmap.count() == ents.count()  # total map: every entity covered


def test_pipeline_end_to_end_and_resume(spark, tmp_path):
    m1 = run_pipeline(spark, tmp_path / "wd", n_convs=200, seed=42)
    assert set(m1) == {"transcripts", "extract", "entities", "canonical_map",
                       "graph", "violations"}
    assert m1["violations"]["metrics"]["rows"] == 0
    assert m1["graph"]["metrics"]["rows"] > 0
    assert "role" in m1["graph"]["metrics"]["counts"]
    # second run resumes every stage (identical commit timestamps)
    m2 = run_pipeline(spark, tmp_path / "wd", n_convs=200, seed=42)
    assert all(m1[k]["committed_at"] == m2[k]["committed_at"] for k in m1)


def test_transcripts_deterministic_across_parallelism(spark):
    """Same (seed, n) at different partition counts -> identical rows; this is
    what makes the N-vs-4N scaling benchmark run on identical input."""
    a = synth_transcripts(spark, 100, 42, partitions=2)
    b = synth_transcripts(spark, 100, 42, partitions=16)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # stable turn ordering invariant: text depends only on (conv_id, turn_idx)
    assert a.groupBy("conv_id", "turn_idx").count().filter("count > 1").isEmpty()


def test_pipeline_quarantines_corrupt_transcripts(spark, tmp_path):
    """Mutated input (invalid role) must land in the violations quarantine,
    not crash the pipeline (reference per-file error isolation, main.py:56-77,
    re-expressed as row-level quarantine)."""
    turns = synth_transcripts(spark, 50, seed=3)
    corrupt = turns.withColumn(
        "role", F.when(F.col("turn_idx") == 0, F.lit("alien"))
        .otherwise(F.col("role")))
    m = run_pipeline(spark, tmp_path / "wd", transcripts=corrupt,
                     input_fp="corrupt-50-3")
    assert m["violations"]["metrics"]["rows"] > 0
    assert "notInList" in m["violations"]["metrics"]["counts"]
    assert m["graph"]["metrics"]["rows"] > 0  # conforming triples still land


def _spec_rules(spark, yaml_text):
    from openapi_to_rdf_spark.operators.extract import convert_specs_df
    from openapi_to_rdf_spark.operators.shapes import align_rules_to_namespace

    specs = spark.createDataFrame([("kgvocab.yaml", yaml_text)],
                                  ["path", "content"])
    shacl = convert_specs_df(specs).filter(F.col("graph") == "shacl")
    return align_rules_to_namespace(shape_rules_from_shacl(shacl), KG_NS)


def test_pipeline_enforces_converted_spec_rules(spark, tmp_path):
    """The shapes-as-rules loop closed from a REAL spec: a converted OpenAPI
    schema constrains the transcript graph end-to-end. A spec declaring
    surfaceForm as date-time plants a datatype violation for every
    AlarmRecord-typed entity (extraction emits xsd:string); the conforming
    spec variant produces a clean run (VERDICT r1 task 6)."""
    bad_spec = """
openapi: 3.0.1
components:
  schemas:
    AlarmRecord:
      type: object
      required: [surfaceForm]
      properties:
        surfaceForm:
          type: string
          format: date-time
"""
    m = run_pipeline(spark, tmp_path / "bad", n_convs=60, seed=5,
                     spec_rules=_spec_rules(spark, bad_spec))
    counts = m["violations"]["metrics"]["counts"]
    assert counts.get("datatypeMismatch", 0) > 0

    # and the violating subjects are AlarmRecord entities on surfaceForm
    viol = read_snapshot(spark, tmp_path / "bad" / "violations",
                         m["violations"]["fingerprint"])
    dt = viol.filter(F.col("violation") == "datatypeMismatch")
    assert dt.filter(~F.col("s").startswith(ENT_NS)).count() == 0
    assert dt.filter(F.col("p") != KG_NS + "surfaceForm").count() == 0

    good_spec = bad_spec.replace("\n          format: date-time", "")
    m2 = run_pipeline(spark, tmp_path / "good", n_convs=60, seed=5,
                      spec_rules=_spec_rules(spark, good_spec))
    counts2 = m2["violations"]["metrics"]["counts"]
    # datatype now conforms (xsd:string both sides)
    assert counts2.get("datatypeMismatch", 0) == 0
    # what remains is real SHACL semantics, not noise: the spec's auto-
    # emitted maxCount 1 (reference quirk, shacl_converter.py:650-651)
    # genuinely fires on canonical entities that absorbed alias spellings —
    # a merged entity has one surfaceForm PER ALIAS. Verify that every
    # residual violation is exactly that case (count>1 on surfaceForm).
    viol2 = read_snapshot(spark, tmp_path / "good" / "violations",
                          m2["violations"]["fingerprint"])
    residual = viol2.filter(
        (F.col("violation") != "cardinalityViolation")
        | (F.col("p") != KG_NS + "surfaceForm")
        | ~F.col("detail").rlike("^count=[2-9]"))
    assert residual.count() == 0


def test_validate_no_double_count_across_classes(spark):
    """A subject typed with two classes whose shapes both constrain the same
    path must not double-count its single value (maxCount 1 satisfied)."""
    xsd = "http://www.w3.org/2001/XMLSchema#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    triples = spark.createDataFrame([
        ("f", "g", "e1", rdf_type, "iri", "ClassA", None),
        ("f", "g", "e1", rdf_type, "iri", "ClassB", None),
        ("f", "g", "e1", "p:name", "literal", "x", xsd + "string"),
    ], "file string, graph string, s string, p string, o_kind string, "
       "o string, o_datatype string")
    rules = spark.createDataFrame([
        ("f", "ClassA", "p:name", xsd + "string", None, 1, None, None),
        ("f", "ClassB", "p:name", xsd + "string", None, 1, None, None),
    ], "file string, target_class string, path string, datatype string, "
       "min_count int, max_count int, in_values array<string>, node_kind string")
    assert validate_triples(triples, rules).count() == 0


def test_connected_components_hot_star(spark):
    """A 20k-leaf star: the hub's label fan-in is the worst-case hot key the
    salted two-stage aggregation exists for — correctness at volume."""
    edges = spark.createDataFrame(
        [("hub", f"leaf{i:05d}") for i in range(20_000)], ["src", "dst"])
    comp = connected_components(edges, driver_limit=0)  # distributed path
    assert comp.count() == 20_001
    assert comp.select("component").distinct().count() == 1
    assert comp.filter(F.col("component") != "hub").count() == 0


def test_read_transcript_table_formats(spark, tmp_path):
    """External transcript ingestion: parquet/json/csv all land on the
    canonical schema with (conv_id, turn_idx) uniqueness enforced; no
    schema inference anywhere (a 100 TB inference pass is a full extra
    scan)."""
    from openapi_to_rdf_spark.sources.transcripts import read_transcript_table

    turns = synth_transcripts(spark, 25, seed=8).localCheckpoint()
    # plant a duplicate row to prove ingest dedup
    dup = turns.unionByName(turns.limit(3))

    dup.write.parquet(str(tmp_path / "p"))
    dup.write.json(str(tmp_path / "j"))
    (dup.write.option("header", "true")
     .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ssXXX")
     .csv(str(tmp_path / "c")))

    for fmt, sub in [("parquet", "p"), ("json", "j"), ("csv", "c")]:
        back = read_transcript_table(spark, str(tmp_path / sub), fmt)
        assert back.schema.simpleString() == turns.schema.simpleString(), fmt
        # pin the frame: exceptAll over a dropDuplicates(subset) lineage
        # trips a Catalyst attribute-binding bug in this Spark build
        back = back.localCheckpoint()
        assert back.count() == turns.count(), fmt
        # csv serializes null tool as empty -> compare on key columns there
        cmp_cols = (["conv_id", "turn_idx", "role", "text", "ts"]
                    if fmt == "csv" else back.columns)
        assert back.select(cmp_cols).exceptAll(turns.select(cmp_cols)).isEmpty(), fmt


def test_pipeline_links_stage_against_registry(spark, tmp_path):
    """The optional links stage: canonical entities scored against the
    authority registry, kg:linksTo/kg:linkScore materialized and resumable.
    Every canonical entity must link to the registry row whose %04d suffix
    matches (the generator grammar guarantees sim 1.0 to exactly one name)."""
    from openapi_to_rdf_spark.sources.transcripts import entity_registry_df

    reg = entity_registry_df(spark)
    m1 = run_pipeline(spark, tmp_path / "wd", n_convs=120, seed=42,
                      registry=reg)
    assert "links" in m1 and m1["links"]["metrics"]["rows"] > 0
    assert set(m1["links"]["metrics"]["counts"]) == {"linksTo", "linkScore"}

    from openapi_to_rdf_spark.plans.snapshot import read_snapshot

    links = (read_snapshot(spark, tmp_path / "wd" / "links")
             .filter(F.col("p").endswith("linksTo")))
    rows = links.collect()
    assert len(rows) > 0 and len(rows) == len({r.s for r in rows})
    for r in rows:
        # entity IRI ...#<word-sep-word-sep-NNNN> must link to registry id NNNN
        true_id = int(r.s[-4:])
        assert r.o.endswith(f"#{true_id}"), (r.s, r.o)

    # resume: second run recomputes nothing
    m2 = run_pipeline(spark, tmp_path / "wd", n_convs=120, seed=42,
                      registry=reg)
    assert m2["links"]["committed_at"] == m1["links"]["committed_at"]


def test_pipeline_coref_stage(spark, tmp_path):
    """Optional coref stage: a pronoun turn yields a recovered kg#mentions
    triple whose object is the CANONICAL entity (an alias spelling in the
    antecedent turn must remap through the canonical map)."""
    import datetime as dt

    from openapi_to_rdf_spark.operators.extract import ENT_NS

    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "user", "create AlarmRecord#alpha-bravo-0001 now",
         None, ts),
        # alias spelling of the same entity ("_" separators)
        ("c1", 1, "user", "also tag AlarmRecord#alpha_bravo_0001",
         None, ts),
        ("c1", 2, "user", "then restart it", None, ts),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    m = run_pipeline(spark, tmp_path / "wd", transcripts=df,
                     input_fp="coref-fixture-1", coref=True)
    assert m["coref"]["metrics"]["rows"] == 1
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot

    got = read_snapshot(spark, tmp_path / "wd" / "coref").collect()
    assert got[0].s.endswith("c1/2")
    assert got[0].graph == "kg_coref"
    # canonical map collapses both alias spellings to one entity; the
    # recovered reference must point at that canonical IRI
    canon = read_snapshot(spark, tmp_path / "wd" / "canonical_map")
    canonical = {r.canonical for r in canon.collect()}
    assert len(canonical) == 1
    assert got[0].o in canonical
    assert got[0].o.startswith(ENT_NS)


def test_pipeline_entailed_stage(spark, tmp_path):
    """--entail materializes the RDFS closure delta: every kg#mentions
    edge gains its kg#relatedTo super-edge (prp-spo1), every typed entity
    is lifted to kg#Entity (cax-sco), the vocabulary itself is included,
    and resume returns the identical snapshot."""
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot

    wd = tmp_path / "kg"
    m1 = run_pipeline(spark, wd, n_convs=120, seed=3, entail=True)
    assert "entailed" in m1

    graph = read_snapshot(spark, wd / "graph")
    ent = read_snapshot(spark, wd / "entailed")
    kg = "http://ericsson.com/models/3gpp/kg#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    mentions = {(r.s, r.o) for r in
                graph.filter(F.col("p") == kg + "mentions")
                .select("s", "o").collect()}
    related = {(r.s, r.o) for r in
               ent.filter(F.col("p") == kg + "relatedTo")
               .select("s", "o").collect()}
    assert mentions and related == mentions

    typed_ents = {r.s for r in
                  graph.filter((F.col("p") == rdf_type)
                               & F.col("s").contains("/entity#"))
                  .select("s").collect()}
    lifted = {r.s for r in
              ent.filter((F.col("p") == rdf_type)
                         & (F.col("o") == kg + "Entity"))
              .select("s").collect()}
    # every class-typed entity lifts to kg#Entity; turns lift too (range
    # of hasTurn) but entities must all be covered
    assert typed_ents and typed_ents <= lifted

    # vocabulary present in the delta
    assert ent.filter(
        F.col("p") == "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
    ).count() == 1

    # resume: identical fingerprints, no recompute
    m2 = run_pipeline(spark, wd, n_convs=120, seed=3, entail=True)
    assert m2["entailed"]["fingerprint"] == m1["entailed"]["fingerprint"]


def test_pipeline_all_optional_stages_together(spark, tmp_path):
    """Capstone: every optional stage at once — converted-spec shape rules,
    authority-registry linking, coref recovery, and RDFS entailment — all
    stages present, mutually consistent, and the whole DAG resumes as a
    no-op. Exercises stage-fingerprint chaining across the full option
    surface, not just each flag in isolation."""
    from openapi_to_rdf_spark.operators.extract import (
        KG_NS, convert_specs_df,
    )
    from openapi_to_rdf_spark.operators.shapes import (
        align_rules_to_namespace, shape_rules_from_shacl,
    )
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot
    from openapi_to_rdf_spark.sources.specs import (
        spec_paths_df, with_content,
    )
    from openapi_to_rdf_spark.sources.transcripts import entity_registry_df

    spec = ("/root/reference/assets/MnS-Rel-19-OpenAPI/OpenAPI/"
            "TS28623_ComDefs.yaml")
    shacl = convert_specs_df(
        with_content(spec_paths_df(spark, [spec]))
    ).filter(F.col("graph") == "shacl")
    spec_rules = align_rules_to_namespace(shape_rules_from_shacl(shacl),
                                          KG_NS)

    wd = tmp_path / "wd"
    m1 = run_pipeline(spark, wd, n_convs=150, seed=7,
                      spec_rules=spec_rules,
                      registry=entity_registry_df(spark),
                      coref=True, entail=True, consistency=True)
    expected = {"transcripts", "extract", "entities", "canonical_map",
                "graph", "violations", "entailed", "coref", "links",
                "consistency"}
    assert expected <= set(m1)
    assert m1["violations"]["metrics"]["rows"] == 0   # clean corpus
    assert m1["entailed"]["metrics"]["rows"] > 0
    assert m1["links"]["metrics"]["rows"] > 0
    # extraction invariant: no subject typed with two disjoint top classes
    assert m1["consistency"]["metrics"]["rows"] == 0

    # cross-stage consistency: every entity the linker linked exists in
    # the graph, and its entailed kg#Entity type is present
    kg = "http://ericsson.com/models/3gpp/kg#"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    linked = {r.s for r in read_snapshot(spark, wd / "links")
              .filter(F.col("p") == kg + "linksTo").select("s").collect()}
    graph_subjects = {r.s for r in read_snapshot(spark, wd / "graph")
                      .select("s").distinct().collect()}
    lifted = {r.s for r in read_snapshot(spark, wd / "entailed")
              .filter((F.col("p") == rdf_type)
                      & (F.col("o") == kg + "Entity")).collect()}
    assert linked and linked <= graph_subjects
    assert linked <= lifted

    m2 = run_pipeline(spark, wd, n_convs=150, seed=7,
                      spec_rules=spec_rules,
                      registry=entity_registry_df(spark),
                      coref=True, entail=True, consistency=True)
    for stage in expected:
        assert m2[stage]["committed_at"] == m1[stage]["committed_at"], stage


def test_pipeline_provenance_stage(spark, tmp_path):
    """--tool-results: the provenance stage joins invocations to results
    within the bound and its producedResult edges attach to TURN IRIs that
    exist in the graph (not orphans); resume is a no-op."""
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot
    from openapi_to_rdf_spark.sources.transcripts import synth_tool_results

    wd = tmp_path / "kg"
    turns = synth_transcripts(spark, 150, seed=9)
    results = synth_tool_results(turns, seed=9)
    m1 = run_pipeline(spark, wd, n_convs=150, seed=9, tool_results=results)
    assert m1["provenance"]["metrics"]["rows"] > 0
    assert set(m1["provenance"]["metrics"]["counts"]) == {
        "producedResult", "resultStatus"}

    kg = "http://ericsson.com/models/3gpp/kg#"
    prov = read_snapshot(spark, wd / "provenance")
    graph = read_snapshot(spark, wd / "graph")
    turn_subjects = {
        r.s for r in graph.filter(F.col("s").contains("/turn#"))
        .select("s").distinct().collect()}
    edges = prov.filter(F.col("p") == kg + "producedResult").collect()
    assert edges and all(r.s in turn_subjects for r in edges)
    assert all(r.o_kind == "iri" for r in edges)
    status = prov.filter(F.col("p") == kg + "resultStatus").collect()
    assert {r.o for r in status} <= {"ok", "error"}
    assert all(r.o_kind == "literal" for r in status)

    m2 = run_pipeline(spark, wd, n_convs=150, seed=9, tool_results=results)
    assert (m2["provenance"]["committed_at"]
            == m1["provenance"]["committed_at"])


def test_snapshot_history_time_travel_rollback_expire(spark, tmp_path):
    """Iceberg snapshot semantics over one table dir: parent-chained
    commits, newest-first history, committed_at time travel, atomic
    rollback, retention GC that never breaks the kept chain."""
    import time as _time

    from openapi_to_rdf_spark.plans.snapshot import (
        expire_snapshots, read_snapshot, read_snapshot_asof, rollback,
        snapshot_history, write_snapshot)

    td = tmp_path / "tbl"
    fps = []
    stamps = []
    for i in (1, 2, 3):
        fp = fingerprint("v", i)
        write_snapshot(spark.range(i * 10).withColumn("v", F.lit(i)),
                       td, fp)
        fps.append(fp)
        stamps.append(read_manifest(td, fp)["committed_at"])
        _time.sleep(1.1)      # committed_at has second granularity

    hist = snapshot_history(td)
    assert [m["fingerprint"] for m in hist] == list(reversed(fps))
    assert [m["sequence"] for m in hist] == [2, 1, 0]
    assert hist[0]["parent"] == fps[1] and hist[2]["parent"] is None

    # LATEST reads v3; time travel to the second commit's timestamp
    assert read_snapshot(spark, td).count() == 30
    assert read_snapshot_asof(spark, td, stamps[1]).count() == 20
    import pytest as _pytest
    with _pytest.raises(ValueError):
        read_snapshot_asof(spark, td, "1999-01-01T00:00:00Z")

    # rollback: LATEST swaps, history re-walks from the older commit
    rollback(td, fps[0])
    assert read_snapshot(spark, td).count() == 10
    assert [m["fingerprint"] for m in snapshot_history(td)] == [fps[0]]
    rollback(td, fps[2])
    assert read_snapshot(spark, td).count() == 30

    # expiry keeps the newest 2 chain commits, drops the oldest
    expired = expire_snapshots(td, keep_last=2)
    assert expired == [fps[0]]
    assert read_snapshot(spark, td).count() == 30
    assert read_snapshot(spark, td, fps[1]).count() == 20
    with _pytest.raises(Exception):
        read_snapshot(spark, td, fps[0]).count()

    # resume interplay: an expired fingerprint recomputes via materialize
    again = materialize(lambda: spark.range(10).withColumn("v", F.lit(1)),
                        spark, td, fps[0])
    assert again.count() == 10


def test_remap_triples_ignores_identity_map_rows(spark):
    """r5: remap_triples pre-filters the canonical map to CHANGED rows
    (identity entries are no-ops under left-join+coalesce) — the output
    must be invariant to how many self-mappings the map carries, and a
    rewrite that collapses onto an untouched-entity row must still dedup."""
    from openapi_to_rdf_spark.operators.canonicalize import remap_triples

    E = "urn:ent:"
    cols = "file string, graph string, s string, p string, o_kind string, " \
           "o string, o_datatype string"
    triples = spark.createDataFrame(
        [("f", "g", E + "a", "p1", "iri", E + "b", None),
         ("f", "g", E + "b", "p1", "iri", E + "b", None),   # a->b collapses onto this
         ("f", "g", E + "c", "p2", "literal", "x", "xsd:string"),
         ("f", "g", "urn:other:k", "p3", "literal", "y", None)],
        cols)
    full_map = spark.createDataFrame(
        [(E + "a", E + "b"),                 # changed
         (E + "b", E + "b"), (E + "c", E + "c")],  # identity noise
        "ent string, canonical string")
    changed_only = full_map.filter("ent != canonical")

    want = {tuple(r) for r in remap_triples(triples, changed_only, E).collect()}
    got = {tuple(r) for r in remap_triples(triples, full_map, E).collect()}
    assert got == want
    assert ("f", "g", E + "b", "p1", "iri", E + "b", None) in got
    assert len([r for r in got if r[2] == E + "b" and r[3] == "p1"]) == 1
    assert ("f", "g", "urn:other:k", "p3", "literal", "y", None) in got
    assert len(got) == 3
