"""SPARQL 1.1 semantics conformance — the W3C-spec edge cases engines
get wrong, each as a small fixed-data check of the TEXT front-end
end to end (text → algebra → DataFrame). Complements test_sparql.py
(surface coverage) with the places where the REC's evaluation semantics
diverge from the "obvious" relational reading:

- MINUS vs NOT EXISTS asymmetry on domain-disjoint patterns (§8.3.3);
- OPTIONAL as LeftJoin-with-condition, incl. the no-shared-variable
  product form and nested OPTIONAL;
- COUNT(?v) skipping unbound vs COUNT(*) counting rows (§18.5.1.2);
- aggregates over an EMPTY solution multiset (one row, COUNT 0);
- unbound ordering (nulls group before bound values in ASC);
- blank-node labels in patterns acting as fresh variables;
- UNION column alignment (unshared variables unbound, not dropped).
"""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.sparql import sparql_query  # noqa: E402

EX = "http://example.org/"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
PFX = f"PREFIX ex: <{EX}> "

T = [
    ("a", TYPE, "Person"), ("b", TYPE, "Person"), ("c", TYPE, "Person"),
    ("a", EX + "name", "alice"), ("b", EX + "name", "bob"),
    ("c", EX + "name", "carol"),
    ("a", EX + "age", "42"), ("b", EX + "age", "7"),
    ("a", EX + "knows", "b"), ("b", EX + "knows", "c"),
    ("a", EX + "city", "oslo"), ("b", EX + "city", "oslo"),
    ("c", EX + "city", "lund"),
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(T, ["s", "p", "o"]).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


# ------------------------------------------------- MINUS vs NOT EXISTS

def test_minus_disjoint_domains_removes_nothing(g):
    """§8.3.3: MINUS keeps μ when dom(μ) ∩ dom(μ') = ∅ — a MINUS group
    sharing NO variable with the outer group removes nothing, even
    though its pattern matches (the spec's canonical example)."""
    out = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:city "oslo" . MINUS { ?y ex:age "7" } }""")
    assert rows(out) == {("a",), ("b",)}


def test_not_exists_disjoint_pattern_still_filters(g):
    """The asymmetric twin: FILTER NOT EXISTS substitutes μ into the
    pattern — with no shared variable the pattern's truth is global, so
    a matching pattern removes EVERY row (and a non-matching one
    none)."""
    out = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:city "oslo" . FILTER NOT EXISTS { ?y ex:age "7" } }""")
    assert rows(out) == set()
    out2 = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:city "oslo" . FILTER NOT EXISTS { ?y ex:age "99" } }""")
    assert rows(out2) == {("a",), ("b",)}


def test_exists_disjoint_pattern_keeps_all_iff_any_solution(g):
    out = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:city "oslo" . FILTER EXISTS { ?y ex:age "7" } }""")
    assert rows(out) == {("a",), ("b",)}
    out2 = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:city "oslo" . FILTER EXISTS { ?y ex:age "99" } }""")
    assert rows(out2) == set()


def test_minus_null_shared_var_is_domain_disjoint(g):
    """A shared variable left UNBOUND by OPTIONAL is outside dom(μ):
    such rows are domain-disjoint from every μ' and survive the MINUS
    even when the MINUS group binds that variable."""
    out = sparql_query(g, PFX + """SELECT ?x ?a WHERE {
        ?x a "Person" . OPTIONAL { ?x ex:age ?a }
        MINUS { ?z ex:name "bob" . ?z ex:age ?a } }""")
    # MINUS binds ?a = "7" (bob's age): removes the b row; a survives
    # (42 ≠ 7) and c survives because its ?a is UNBOUND → disjoint
    assert rows(out) == {("a", "42"), ("c", None)}


# --------------------------------------------------------- OPTIONAL

def test_optional_no_shared_variable_is_product(g):
    """LeftJoin(Ω₁, Ω₂, true) with disjoint domains = the product when
    the optional side is non-empty; μ₁ with unbound extension when
    empty."""
    out = sparql_query(g, PFX + """SELECT ?n ?z WHERE {
        ?x ex:age "42" ; ex:name ?n .
        OPTIONAL { ?y ex:city "paris" . BIND(?y AS ?z) } }""")
    assert rows(out) == {("alice", None)}
    out2 = sparql_query(g, PFX + """SELECT ?n ?z WHERE {
        ?x ex:age "42" ; ex:name ?n .
        OPTIONAL { ?y ex:city "oslo" . BIND(?y AS ?z) } }""")
    assert rows(out2) == {("alice", "a"), ("alice", "b")}


def test_nested_optional(g):
    out = sparql_query(g, PFX + """SELECT ?x ?y ?cy WHERE {
        ?x a "Person" .
        OPTIONAL { ?x ex:knows ?y . OPTIONAL { ?y ex:city ?cy } } }""")
    assert rows(out) == {("a", "b", "oslo"), ("b", "c", "lund"),
                         ("c", None, None)}


# -------------------------------------------------------- aggregates

def test_count_var_skips_unbound_count_star_counts_rows(g):
    out = sparql_query(g, PFX + """SELECT (COUNT(?age) AS ?n_age)
        (COUNT(*) AS ?n_rows) WHERE {
        ?x a "Person" . OPTIONAL { ?x ex:age ?age } }""")
    assert rows(out) == {(2, 3)}


def test_aggregate_over_empty_solutions_yields_one_zero_row(g):
    out = sparql_query(g, PFX + """SELECT (COUNT(?x) AS ?n) WHERE {
        ?x ex:city "paris" }""")
    assert rows(out) == {(0,)}


def test_group_by_drops_empty_groups_entirely(g):
    """With GROUP BY, an empty solution multiset yields NO rows (the
    one-zero-row rule is only for the implicit single group)."""
    out = sparql_query(g, PFX + """SELECT ?c (COUNT(?x) AS ?n) WHERE {
        ?x ex:city ?c . FILTER(?c = "paris") } GROUP BY ?c""")
    assert rows(out) == set()


# ------------------------------------------------- modifiers & terms

def test_order_by_unbound_sorts_first_asc(g):
    out = sparql_query(g, PFX + """SELECT ?x ?age WHERE {
        ?x a "Person" . OPTIONAL { ?x ex:age ?age } }
        ORDER BY ?age ?x""")
    got = [tuple(r) for r in out.collect()]
    assert got[0] == ("c", None)           # unbound before any bound value


def test_blank_node_label_is_fresh_variable(g):
    """_:b in a pattern is an existential — it matches like a variable
    (and joins within the group when repeated)."""
    out = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:knows _:b . _:b ex:city "oslo" }""")
    assert rows(out) == {("a",)}           # a knows b, b in oslo


def test_union_unshared_variables_come_back_unbound(g):
    out = sparql_query(g, PFX + """SELECT ?x ?n ?age WHERE {
        { ?x ex:name ?n . ?x ex:city "lund" }
        UNION { ?x ex:age ?age . ?x ex:city "oslo" } }""")
    assert rows(out) == {("c", "carol", None), ("a", None, "42"),
                         ("b", None, "7")}


def test_values_joins_after_optional_preserves_nulls(g):
    out = sparql_query(g, PFX + """SELECT ?x ?age WHERE {
        ?x a "Person" . OPTIONAL { ?x ex:age ?age }
        VALUES ?x { "b" "c" } }""")
    assert rows(out) == {("b", "7"), ("c", None)}
