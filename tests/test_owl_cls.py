"""OWL 2 RL class-expression fragment (entailment.owl_cls_entail):
staged semi-naive loop == naive Python rule fixpoint on an adversarial
vocabulary where every rule feeds another."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.entailment import (  # noqa: E402
    OWL_EQC, OWL_HV, OWL_INT, OWL_ONP, OWL_SVF, OWL_THING, OWL_UNI,
    RDF_TYPE, owl_cls_entail)
from openapi_to_rdf_spark.operators.rdflists import (  # noqa: E402
    RDF_FIRST, RDF_NIL, RDF_REST)


def _rdf_list(head, items):
    rows, cur = [], head
    for i, item in enumerate(items):
        rows.append((cur, RDF_FIRST, item))
        nxt = f"{head}_cell{i + 1}" if i + 1 < len(items) else RDF_NIL
        rows.append((cur, RDF_REST, nxt))
        cur = nxt
    return rows


def _naive_fixpoint(triples):
    """Reference implementation: fire all seven rules until nothing new."""
    ts = set(triples)
    onp = {s: o for s, p, o in ts if p == OWL_ONP}
    hv = {s: o for s, p, o in ts if p == OWL_HV}
    svf = {s for s, p, o in ts if p == OWL_SVF and o == OWL_THING}
    # list membership
    first = {s: o for s, p, o in ts if p == RDF_FIRST}
    rest = {s: o for s, p, o in ts if p == RDF_REST}

    def items(head):
        out, cur = [], head
        while cur != RDF_NIL and cur in first:
            out.append(first[cur])
            cur = rest.get(cur, RDF_NIL)
        return out

    ints = {s: items(o) for s, p, o in ts if p == OWL_INT}
    unis = {s: items(o) for s, p, o in ts if p == OWL_UNI}
    eqc = [(s, o) for s, p, o in ts if p == OWL_EQC]
    schema = {OWL_HV, OWL_ONP, OWL_SVF, OWL_INT, OWL_UNI, OWL_EQC}
    while True:
        new = set()
        typ = {(s, o) for s, p, o in ts if p == RDF_TYPE}
        prp = {(s, p, o) for s, p, o in ts
               if p != RDF_TYPE and p not in schema}
        for x, c in typ:
            if c in hv:  # cls-hv1
                new.add((x, onp[c], hv[c]))
            for a, b2 in eqc:  # cax-eqc1/2
                if c == a:
                    new.add((x, RDF_TYPE, b2))
                if c == b2:
                    new.add((x, RDF_TYPE, a))
            for u, mem in unis.items():  # cls-uni
                if c in mem:
                    new.add((x, RDF_TYPE, u))
            for i, mem in ints.items():  # cls-int2
                if c == i:
                    new.update((x, RDF_TYPE, m) for m in mem)
        for i, mem in ints.items():  # cls-int1
            for x in {s for s, c in typ}:
                if all((x, m) in typ for m in mem):
                    new.add((x, RDF_TYPE, i))
        for x, p, o in prp:
            for r, v in hv.items():  # cls-hv2
                if onp.get(r) == p and o == v:
                    new.add((x, RDF_TYPE, r))
            for r in svf:  # cls-svf2
                if onp.get(r) == p:
                    new.add((x, RDF_TYPE, r))
        if new <= ts:
            return ts
        ts |= new


def _vocab():
    rows = [
        # R1: role=admin restriction, equivalent to C1
        ("R1", OWL_ONP, "p:role"), ("R1", OWL_HV, "admin"),
        ("R1", OWL_EQC, "C1"),
        # R2: owns someValuesFrom Thing
        ("R2", OWL_ONP, "p:owns"), ("R2", OWL_SVF, OWL_THING),
        # U = C1 ∪ C2 ; I = C1 ∩ C3
        ("U", OWL_UNI, "lu"), ("I", OWL_INT, "li"),
        # chaining: I is itself equivalent to C4, and C4 in a union U2
        ("I", OWL_EQC, "C4"), ("U2", OWL_UNI, "lu2"),
        # R3: hasValue on p:tag with value minted by R1's hv1? no — keep
        # a second hasValue whose edge is PRODUCED by hv1: C4 members get
        # p:role admin? instead: C4 hasValue on p:role 'admin' would loop
        # back consistently; include to stress convergence
        ("C4", OWL_ONP, "p:role"), ("C4", OWL_HV, "admin"),
    ]
    rows += _rdf_list("lu", ["C1", "C2"])
    rows += _rdf_list("li", ["C1", "C3"])
    rows += _rdf_list("lu2", ["C4", "C9"])
    return rows


def test_matches_naive_fixpoint(spark):
    data = _vocab() + [
        ("u1", "p:role", "admin"),       # hv2 -> R1 -> eqc C1 -> uni U
        ("u1", RDF_TYPE, "C3"),          # with C1: int1 -> I -> eqc C4
                                         # -> uni U2; hv1 from C4 asserted
        ("u2", "p:role", "user"),        # nothing
        ("u2", "p:owns", "thing1"),      # svf2 -> R2
        ("u3", RDF_TYPE, "C2"),          # uni -> U only
    ]
    want = _naive_fixpoint(data)
    df = spark.createDataFrame(data, ["s", "p", "o"])
    got = {(r.s, r.p, r.o) for r in owl_cls_entail(df).collect()}
    assert got == want
    # spot checks: the full chain fired for u1
    for c in ["R1", "C1", "U", "I", "C4", "U2"]:
        assert ("u1", RDF_TYPE, c) in got
    assert ("u2", RDF_TYPE, "R2") in got
    assert ("u3", RDF_TYPE, "U") in got and ("u3", RDF_TYPE, "I") not in got


def test_converges_and_raises_on_tiny_budget(spark):
    import pytest

    data = _vocab() + [("u1", "p:role", "admin"), ("u1", RDF_TYPE, "C3")]
    df = spark.createDataFrame(data, ["s", "p", "o"])
    with pytest.raises(RuntimeError, match="did not converge"):
        owl_cls_entail(df, max_rounds=1)


def test_no_expressions_is_identity(spark):
    data = [("a", "p:x", "b"), ("a", RDF_TYPE, "C")]
    df = spark.createDataFrame(data, ["s", "p", "o"])
    got = {(r.s, r.p, r.o) for r in owl_cls_entail(df).collect()}
    assert got == set(data)
