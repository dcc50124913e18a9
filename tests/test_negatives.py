"""corrupt_triples: python-reference exact equality + invariants."""

import hashlib

from openapi_to_rdf_spark.operators.negatives import (
    corrupt_triples, entity_index,
)

SCHEMA = "s string, p string, o string, o_kind string"


def _graph(spark):
    rows = [
        ("e1", "knows", "e2", "iri"),
        ("e2", "knows", "e3", "iri"),
        ("e3", "knows", "e1", "iri"),
        ("e1", "name", "Alice", "literal"),   # literal: never corrupted
        ("e4", "knows", "e2", "iri"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _uint32(*parts) -> int:
    return int(hashlib.md5("\x01".join(parts).encode()).hexdigest()[:8], 16)


def _reference(rows, k):
    pos = {(s, p, o) for s, p, o, kind in rows if kind == "iri"}
    ents = sorted({s for s, *_ in rows}
                  | {o for _, _, o, kind in rows if kind == "iri"})
    out = set()
    for s, p, o in pos:
        for side in ("s", "o"):
            for j in range(k):
                ent = ents[_uint32(s, p, o, side, str(j)) % len(ents)]
                cs, co = (ent, o) if side == "s" else (s, ent)
                orig = s if side == "s" else o
                if ent != orig and (cs, p, co) not in pos:
                    out.add((cs, p, co, side, j))
    return out


def test_exact_python_reference_equality(spark):
    g = _graph(spark)
    got = {(r.s, r.p, r.o, r.side, r.j)
           for r in corrupt_triples(g, k=3).collect()}
    rows = [tuple(r) for r in g.collect()]
    assert got == _reference(rows, k=3)
    assert len(got) > 0


def test_invariants(spark):
    g = _graph(spark)
    pos = {(r.s, r.p, r.o) for r in g.filter("o_kind = 'iri'").collect()}
    negs = corrupt_triples(g, k=4).collect()
    for r in negs:
        assert (r.s, r.p, r.o) not in pos          # never a true triple
        assert r.side in ("s", "o") and 0 <= r.j < 4
    # literals never appear as corrupted objects or subjects
    ents = {r.ent for r in entity_index(g).collect()}
    assert "Alice" not in ents
    for r in negs:
        assert r.s in ents and r.o in ents


def test_deterministic_across_runs(spark):
    g = _graph(spark)
    a = sorted(map(tuple, corrupt_triples(g, k=2).collect()))
    b = sorted(map(tuple, corrupt_triples(g, k=2).collect()))
    assert a == b


def test_entity_index_and_corrupt_on_bare_triples(spark):
    """ADVICE r2: a bare (s, p, o) table (no o_kind column) must work end
    to end — every object counts as an IRI."""
    from openapi_to_rdf_spark.operators.negatives import (
        corrupt_triples, entity_index)

    tri = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a")],
        "s string, p string, o string")
    idx = {r["ent"]: r["idx"] for r in entity_index(tri).collect()}
    assert set(idx) == {"a", "b", "c"}
    assert sorted(idx.values()) == [1, 2, 3]
    neg = corrupt_triples(tri, k=2)
    assert neg.count() > 0
    # no corruption reproduces a positive
    pos = {("a", "p", "b"), ("b", "p", "c"), ("c", "q", "a")}
    assert all((r["s"], r["p"], r["o"]) not in pos for r in neg.collect())
