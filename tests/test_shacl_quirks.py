"""Unit tests for the reference's verified quirks (SURVEY.md section 2.5) on
small inline specs — these pin behaviors the golden P/R gate would only catch
in aggregate."""

import textwrap

from openapi_to_rdf_spark.convert.shacl import convert_shacl, SH
from openapi_to_rdf_spark.triplecore.terms import (
    RDF_TYPE, RDFS_CLASS, XSD_INTEGER, XSD_STRING,
)


def conv(body: str):
    text = "components:\n  schemas:\n" + textwrap.indent(textwrap.dedent(body), "    ")
    return convert_shacl("TS99999_Unit.yaml", text)


NS = "http://ericsson.com/models/3gpp/TS99999/Unit#"


def test_top_level_string_no_nodeshape():
    c = conv("""
    Mcc:
      type: string
      pattern: '^[0-9]{3}$'
    """)
    assert (("i", NS + "Mcc"), RDF_TYPE, RDFS_CLASS) in c.rdf
    assert c.sh == set()  # class only — no shape, no pattern (quirk 2.5#2)


def test_top_level_boolean_emits_nothing():
    c = conv("""
    Flag:
      type: boolean
    """)
    assert c.rdf == set() and c.sh == set()


def test_top_level_ref_emits_nothing():
    c = conv("""
    Alias:
      $ref: '#/components/schemas/Other'
    """)
    assert c.rdf == set() and c.sh == set()  # quirk 2.5#3


def test_boolean_property_gets_default_nodekind():
    c = conv("""
    Obj:
      type: object
      properties:
        flag:
          type: boolean
    """)
    assert any(p == SH["nodeKind"] and o == SH["IRI"] for _, p, o in c.sh)


def test_maxcount_on_ref_property():
    c = conv("""
    Obj:
      type: object
      properties:
        link:
          $ref: '#/components/schemas/Other'
    """)
    assert any(p == SH["maxCount"] and o == ("l", "1", XSD_INTEGER) for _, p, o in c.sh)


def test_enum_none_becomes_null_string():
    c = conv("""
    Obj:
      type: object
      properties:
        state:
          type: string
          enum: [null, UNKNOWN]
    """)
    firsts = {o for _, p, o in c.sh if p[1].endswith("#first")}
    assert ("l", "NULL", XSD_STRING) in firsts
    assert ("l", "UNKNOWN", XSD_STRING) in firsts


def test_unknown_format_falls_to_string_and_drops_pattern():
    c = conv("""
    Obj:
      type: object
      properties:
        ts:
          type: string
          format: date-time
          pattern: 'x+'
    """)
    # pattern silently dropped because datatype is not xsd:string (quirk 2.5#8)
    assert not any(p == SH["pattern"] for _, p, o in c.sh)
    assert any(o == ("i", "http://www.w3.org/2001/XMLSchema#dateTime") for _, p, o in c.sh)


def test_ref_datatype_heuristic_is_name_based():
    c = conv("""
    Obj:
      type: object
      properties:
        a:
          $ref: 'TS1_X.yaml#/components/schemas/Uinteger'
    """)
    # "Uinteger" contains "int" -> datatype, not class (quirk 2.5#9)
    assert any(p == SH["datatype"] and o == ("i", "http://www.w3.org/2001/XMLSchema#integer")
               for _, p, o in c.sh)


def test_allof_top_level_two_nodeshapes():
    c = conv("""
    Notify:
      allOf:
        - $ref: 'TS2_Defs.yaml#/components/schemas/Header'
        - type: object
          properties:
            period:
              type: integer
    """)
    node_shapes = {s for s, p, o in c.sh if p == RDF_TYPE and o == SH["NodeShape"]}
    assert len(node_shapes) == 2  # quirk 2.5#5
    targets = [o for s, p, o in c.sh if p == SH["targetClass"]]
    assert targets == [("i", NS + "Notify")] * 2 or set(targets) == {("i", NS + "Notify")}


def test_sh_or_underscore_uri():
    c = conv("""
    U:
      anyOf:
        - type: string
        - type: object
          properties:
            a: {type: string}
    """)
    # mixed datatype+class -> sh:or_ with the trailing underscore (quirk 2.5#1)
    assert any(p == ("i", "http://www.w3.org/ns/shacl#or_") for _, p, o in c.sh)


def test_unresolvable_ref_placeholder():
    c = conv("""
    Obj:
      type: object
      properties:
        x:
          $ref: 'not-a-known#format'
    """)
    assert any("UnresolvedRef_" in o[1] for _, p, o in c.sh if p == SH["class"])
    assert c.warnings


def test_single_survivor_oneof_inlined():
    c = conv("""
    Obj:
      type: object
      properties:
        v:
          oneOf:
            - type: boolean
            - type: string
              pattern: 'a+'
    """)
    # boolean operand shape is pruned as empty, string survives alone ->
    # constraints copied onto the property shape, no sh:xone emitted
    assert not any(p == SH["xone"] for _, p, o in c.sh)
    assert any(p == SH["pattern"] for _, p, o in c.sh)
