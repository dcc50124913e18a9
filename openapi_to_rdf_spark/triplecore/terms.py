"""RDF term model for the PySpark KG-construction engine.

Pure-Python, zero-dependency replacement for the rdflib term types the
reference uses (reference: /root/reference/openapi_to_rdf/shacl_converter.py:4-7).
Terms are plain tuples so they hash/compare fast inside Python sets and
serialize trivially into Spark rows:

    ("i", uri)                    IRI
    ("b", label)                  blank node
    ("l", lexical, datatype_uri)  literal (RDF 1.1: plain literal == xsd:string)

A triple is a 3-tuple of terms; a graph is a ``set`` of triples (matching
rdflib.Graph's set semantics that the reference relies on for dedup,
shacl_converter.py:579-584).
"""

from __future__ import annotations

# --- well-known namespaces -------------------------------------------------
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
SH_NS = "http://www.w3.org/ns/shacl#"
DASH_NS = "http://datashapes.org/dash#"
OWL_NS = "http://www.w3.org/2002/07/owl#"

STANDARD_PREFIXES = {
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "xsd": XSD_NS,
    "sh": SH_NS,
    "dash": DASH_NS,
    "owl": OWL_NS,
}

XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_FLOAT = XSD_NS + "float"
XSD_BOOLEAN = XSD_NS + "boolean"

RDF_TYPE = ("i", RDF_NS + "type")
RDF_FIRST = ("i", RDF_NS + "first")
RDF_REST = ("i", RDF_NS + "rest")
RDF_NIL = ("i", RDF_NS + "nil")
RDF_PROPERTY = ("i", RDF_NS + "Property")
RDFS_CLASS = ("i", RDFS_NS + "Class")
RDFS_COMMENT = ("i", RDFS_NS + "comment")
RDFS_LABEL = ("i", RDFS_NS + "label")
RDFS_DOMAIN = ("i", RDFS_NS + "domain")
RDFS_RANGE = ("i", RDFS_NS + "range")
RDFS_RESOURCE = ("i", RDFS_NS + "Resource")


def iri(uri: str) -> tuple:
    return ("i", uri)


def bnode(label: str) -> tuple:
    return ("b", label)


def canonical_double(value: float) -> str:
    """Canonical lexical form for xsd:double so parser and emitter agree.

    rdflib's Turtle writer prints 0.2 as ``2e-01``; we normalize both sides
    through ``repr(float(...))`` before comparing.
    """
    return repr(float(value))


def literal(value) -> tuple:
    """Mirror rdflib ``Literal(python_value)`` typing rules
    (reference emits literals only via that constructor):
    bool -> xsd:boolean, int -> xsd:integer, float -> xsd:double,
    everything else -> xsd:string with ``str()`` lexical form.
    """
    if isinstance(value, bool):
        return ("l", "true" if value else "false", XSD_BOOLEAN)
    if isinstance(value, int):
        return ("l", str(value), XSD_INTEGER)
    if isinstance(value, float):
        return ("l", canonical_double(value), XSD_DOUBLE)
    return ("l", str(value), XSD_STRING)


def typed_literal(lexical: str, datatype: str) -> tuple:
    """Literal with an explicit datatype, lexical form normalized for the
    numeric/boolean types so set comparison is insensitive to formatting."""
    if datatype == XSD_INTEGER:
        lexical = str(int(lexical))
    elif datatype in (XSD_DOUBLE, XSD_FLOAT):
        lexical = canonical_double(float(lexical))
    elif datatype == XSD_DECIMAL:
        f = float(lexical)
        lexical = str(int(f)) if f == int(f) else repr(f)
    elif datatype == XSD_BOOLEAN:
        lexical = lexical.strip().lower()
    return ("l", lexical, datatype)


def is_iri(term: tuple) -> bool:
    return term[0] == "i"


def is_bnode(term: tuple) -> bool:
    return term[0] == "b"


def is_literal(term: tuple) -> bool:
    return term[0] == "l"
