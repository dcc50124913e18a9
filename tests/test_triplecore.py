"""Unit tests for the Turtle reader/writer and bnode canonicalization."""

from openapi_to_rdf_spark.triplecore.terms import (
    XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, XSD_STRING, iri, literal,
)
from openapi_to_rdf_spark.triplecore.turtle import parse_turtle, serialize_turtle
from openapi_to_rdf_spark.triplecore.canon import canonicalize_bnodes, precision_recall

RDF_T = ("i", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")


def test_parse_basic():
    ttl = """
@prefix ex: <http://example.org/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:a a ex:Class ;
    ex:count 42 ;
    ex:frac 2e-01 ;
    ex:flag true ;
    ex:name "hi \\"there\\"" .
"""
    triples = parse_turtle(ttl)
    ex = "http://example.org/"
    assert (("i", ex + "a"), RDF_T, ("i", ex + "Class")) in triples
    assert (("i", ex + "a"), ("i", ex + "count"), ("l", "42", XSD_INTEGER)) in triples
    assert (("i", ex + "a"), ("i", ex + "frac"), ("l", "0.2", XSD_DOUBLE)) in triples
    assert (("i", ex + "a"), ("i", ex + "flag"), ("l", "true", XSD_BOOLEAN)) in triples
    assert (("i", ex + "a"), ("i", ex + "name"), ("l", 'hi "there"', XSD_STRING)) in triples


def test_parse_bnodes_and_collections():
    ttl = """
@prefix ex: <http://example.org/> .
[] a ex:Shape ;
    ex:items ( 1 2 3 ) ;
    ex:nested [ ex:val "x" ] .
"""
    triples = parse_turtle(ttl)
    firsts = [t for t in triples if t[1][1].endswith("#first")]
    assert len(firsts) == 3
    rests = [t for t in triples if t[1][1].endswith("#rest")]
    assert len(rests) == 3
    assert any(t[2] == ("l", "x", XSD_STRING) for t in triples)


def test_parse_long_string():
    ttl = '''@prefix ex: <http://example.org/> .
ex:a ex:doc """line one
line "two"
line three""" .
'''
    triples = parse_turtle(ttl)
    (t,) = triples
    assert t[2] == ("l", 'line one\nline "two"\nline three', XSD_STRING)


def test_roundtrip():
    src = {
        (("i", "http://e/x"), ("i", "http://e/p"), ("l", "a\nb", XSD_STRING)),
        (("b", "z1"), ("i", "http://e/p"), ("l", "7", XSD_INTEGER)),
        (("i", "http://e/x"), ("i", "http://e/q"), ("b", "z1")),
    }
    out = parse_turtle(serialize_turtle(src))
    assert precision_recall(out, src)["precision"] == 1.0
    assert precision_recall(out, src)["recall"] == 1.0


def test_canonicalization_isomorphic():
    p = ("i", "http://e/p")
    q = ("i", "http://e/q")
    g1 = {(("b", "a"), p, ("l", "1", XSD_INTEGER)), (("b", "a"), q, ("b", "b")),
          (("b", "b"), p, ("l", "2", XSD_INTEGER))}
    g2 = {(("b", "x"), p, ("l", "1", XSD_INTEGER)), (("b", "x"), q, ("b", "y")),
          (("b", "y"), p, ("l", "2", XSD_INTEGER))}
    assert canonicalize_bnodes(g1) == canonicalize_bnodes(g2)


def test_canonicalization_distinguishes():
    p = ("i", "http://e/p")
    g1 = {(("b", "a"), p, ("l", "1", XSD_INTEGER))}
    g2 = {(("b", "a"), p, ("l", "2", XSD_INTEGER))}
    assert canonicalize_bnodes(g1) != canonicalize_bnodes(g2)


def test_literal_typing_mirrors_rdflib():
    assert literal(True) == ("l", "true", XSD_BOOLEAN)
    assert literal(1) == ("l", "1", XSD_INTEGER)
    assert literal(0.2) == ("l", "0.2", XSD_DOUBLE)
    assert literal("s") == ("l", "s", XSD_STRING)
