"""Property-based tests (hypothesis): Turtle round-trip, bnode
canonicalization invariance, converter totality over generated specs."""

import pathlib
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.triplecore.canon import canonicalize_bnodes  # noqa: E402
from openapi_to_rdf_spark.triplecore.terms import (  # noqa: E402
    bnode, iri, literal, typed_literal,
)
from openapi_to_rdf_spark.triplecore.turtle import (  # noqa: E402
    parse_turtle, serialize_turtle,
)

XSD = "http://www.w3.org/2001/XMLSchema#"

iris = st.builds(
    lambda a, b: iri(f"http://example.org/{a}#{b}"),
    st.text(st.characters(categories=("Lu", "Ll", "Nd")), min_size=1, max_size=8),
    st.text(st.characters(categories=("Lu", "Ll", "Nd")), min_size=1, max_size=8))
bnodes = st.builds(lambda x: bnode(f"b{x}"), st.integers(0, 5))
plain_texts = st.text(max_size=40)
literals = st.one_of(
    st.builds(literal, plain_texts),
    st.builds(literal, st.integers(-10**9, 10**9)),
    st.builds(literal, st.booleans()),
    st.builds(lambda s: typed_literal(s, XSD + "dateTime"), plain_texts),
)
subjects = st.one_of(iris, bnodes)
objects = st.one_of(iris, bnodes, literals)
triples = st.sets(st.tuples(subjects, iris, objects), min_size=0, max_size=25)


@settings(max_examples=60, deadline=None)
@given(triples)
def test_turtle_roundtrip(ts):
    """serialize -> parse recovers the triple set up to bnode relabeling."""
    text = serialize_turtle(ts)
    back = parse_turtle(text)
    assert canonicalize_bnodes(back) == canonicalize_bnodes(ts)


@settings(max_examples=30, deadline=None)
@given(triples, st.permutations(list(range(6))))
def test_bnode_canonicalization_invariant_to_relabeling(ts, perm):
    """Renaming bnodes consistently never changes the canonical form."""
    def rename(term):
        if term[0] == "b" and term[1].startswith("b") and term[1][1:].isdigit():
            return bnode(f"b{perm[int(term[1][1:])]}")
        return term

    renamed = {(rename(s), p, rename(o) if o[0] == "b" else o) for s, p, o in ts}
    assert canonicalize_bnodes(renamed) == canonicalize_bnodes(ts)


schema_defs = st.deferred(lambda: st.one_of(
    st.fixed_dictionaries({"type": st.just("string")},
                          optional={"enum": st.lists(st.sampled_from(["A", "B", None]), max_size=3),
                                    "pattern": st.just("^[a-z]+$"),
                                    "maxLength": st.integers(1, 99)}),
    st.fixed_dictionaries({"type": st.just("integer")},
                          optional={"minimum": st.integers(-5, 5)}),
    st.fixed_dictionaries({"type": st.just("boolean")}),
    st.fixed_dictionaries({"$ref": st.sampled_from(
        ["#/components/schemas/Other", "ext.yaml#/components/schemas/Int32"])}),
    st.fixed_dictionaries(
        {"type": st.just("object")},
        optional={"properties": st.dictionaries(
            st.sampled_from(["alpha", "beta-x", "gamma"]), schema_defs, max_size=2),
            "required": st.lists(st.sampled_from(["alpha", "gamma"]), max_size=2)}),
    st.fixed_dictionaries({"type": st.just("array")},
                          optional={"items": schema_defs,
                                    "minItems": st.integers(0, 3)}),
    st.fixed_dictionaries({"anyOf": st.lists(schema_defs, min_size=1, max_size=2)}),
))


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(st.sampled_from(["Alpha", "Beta", "Other"]),
                       schema_defs, min_size=1, max_size=3))
def test_converter_total_and_deterministic(schemas):
    """convert_shacl never crashes on generated spec trees and is a pure
    function of its input."""
    import yaml

    from openapi_to_rdf_spark.convert.shacl import convert_shacl

    text = yaml.safe_dump(
        {"openapi": "3.0.1", "components": {"schemas": schemas}})
    a = convert_shacl("gen.yaml", text)
    b = convert_shacl("gen.yaml", text)
    assert (a.rdf, a.sh) == (b.rdf, b.sh)
    # every emitted triple is well-formed (3 terms, tagged kinds)
    for s, p, o in a.rdf | a.sh:
        assert s[0] in ("i", "b") and p[0] == "i" and o[0] in ("i", "b", "l")


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 64) - 1),
       st.lists(st.integers(min_value=0, max_value=63), min_size=0,
                max_size=3, unique=True))
def test_simhash_block_banding_pigeonhole(sig, flip_bits):
    """The Manku block-combination banding NEVER misses a pair within
    Hamming <= 3: for any signature and any <=3 bit flips, at least one
    block-combination key matches exactly (pure-python mirror of the
    operator's key construction in operators/dedup.py::simhash_pairs)."""
    from openapi_to_rdf_spark.operators.dedup import _simhash_block_keys

    n_blocks, max_h = 5, 3
    other = sig
    for b in flip_bits:
        other ^= 1 << b

    widths = [(64 // n_blocks) + (1 if i < 64 % n_blocks else 0)
              for i in range(n_blocks)]
    starts = [sum(widths[:i]) for i in range(n_blocks)]

    def block(s, i):
        return (s >> starts[i]) & ((1 << widths[i]) - 1)

    combos = _simhash_block_keys(n_blocks, max_h)
    assert len(combos) == 10  # C(5,2)
    assert any(all(block(sig, i) == block(other, i) for i in combo)
               for combo in combos)


# -- Spark-backed graph-operator properties (small random graphs vs pure-
# python references; low example counts — each example is a Spark job) ----

edge_lists = st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                      min_size=1, max_size=25)


@settings(max_examples=10, deadline=None)
@given(edge_lists, st.integers(1, 3))
def test_k_core_matches_python_peel(spark, edges, k):
    """k_core == the sequential peel on any random multigraph (direction,
    duplicates and self-loops collapse first)."""
    from collections import defaultdict

    from openapi_to_rdf_spark.operators.graphrank import k_core

    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    expected = {n: len(vs) for n, vs in adj.items()}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.degree for r in k_core(df, k).collect()}
    assert got == expected


triple_lists = st.lists(
    st.tuples(st.integers(0, 7), st.sampled_from(["p", "q", "r", "s"]),
              st.integers(0, 9)),
    min_size=1, max_size=30)


@settings(max_examples=10, deadline=None)
@given(triple_lists)
def test_characteristic_sets_partition_property(spark, ts):
    """Characteristic sets PARTITION subjects and triples on any random
    graph, and per-set stats equal the python reference."""
    from collections import defaultdict

    from openapi_to_rdf_spark.operators.kgstats import characteristic_sets

    by_s = defaultdict(list)
    for s, p, _ in ts:
        by_s[s].append(p)
    expected = defaultdict(lambda: [0, 0])
    for s, preds in by_s.items():
        cs = ",".join(sorted(set(preds)))
        expected[cs][0] += 1
        expected[cs][1] += len(preds)

    df = spark.createDataFrame([(str(s), p, str(o)) for s, p, o in ts],
                               ["s", "p", "o"])
    got = {r.cs: [r.n_subjects, r.n_triples]
           for r in characteristic_sets(df).collect()}
    assert got == dict(expected)
    assert sum(v[0] for v in got.values()) == len(by_s)
    assert sum(v[1] for v in got.values()) == len(ts)
