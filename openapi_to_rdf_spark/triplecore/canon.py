"""Blank-node canonicalization and precision/recall comparison.

The reference's bnode labels are random per process (rdflib ``BNode()``,
shacl_converter.py:790-792), and ours are deterministic counters — so golden
comparison must quotient both triple sets by graph isomorphism on bnodes.
The shape graphs are forests (every bnode has at most one incoming edge and
no cycles), so iterative color refinement (WL hashing) converges to an exact
canonical form; we run it to fixpoint with a generous iteration cap.
"""

from __future__ import annotations

import hashlib


def _h(*parts: str) -> str:
    m = hashlib.sha256()
    for p in parts:
        m.update(p.encode("utf-8", "surrogatepass"))
        m.update(b"\x1f")
    return m.hexdigest()[:24]


def _term_key(term: tuple, colors: dict) -> str:
    if term[0] == "b":
        return "B" + colors[term]
    if term[0] == "i":
        return "I" + term[1]
    return "L" + term[1] + "\x00" + term[2]


def canonicalize_bnodes(triples: set[tuple], max_iter: int = 24) -> set[tuple]:
    """Relabel bnodes by WL color refinement; returns a new triple set."""
    bnodes = {t for tr in triples for t in (tr[0], tr[2]) if t[0] == "b"}
    if not bnodes:
        return set(triples)
    colors = {b: "init" for b in bnodes}
    out_edges: dict[tuple, list] = {b: [] for b in bnodes}
    in_edges: dict[tuple, list] = {b: [] for b in bnodes}
    for s, p, o in triples:
        if s[0] == "b":
            out_edges[s].append((p, o))
        if o[0] == "b":
            in_edges[o].append((s, p))
    for _ in range(max_iter):
        nxt = {}
        for b in bnodes:
            sig_out = sorted(_h("o", pr[1], _term_key(ob, colors)) for pr, ob in out_edges[b])
            sig_in = sorted(_h("i", _term_key(sb, colors), pr[1]) for sb, pr in in_edges[b])
            nxt[b] = _h(colors[b], *sig_out, "||", *sig_in)
        stable = len(set(nxt.values())) == len(set(colors.values()))
        colors = nxt
        if stable:
            break

    def relabel(t):
        return ("b", colors[t]) if t[0] == "b" else t

    return {(relabel(s), p, relabel(o)) for (s, p, o) in triples}


def precision_recall(ours: set[tuple], golden: set[tuple]) -> dict:
    """P/R between two triple sets after bnode canonicalization."""
    a = canonicalize_bnodes(ours)
    b = canonicalize_bnodes(golden)
    inter = len(a & b)
    return {
        "ours": len(a),
        "golden": len(b),
        "intersection": inter,
        "precision": inter / len(a) if a else 1.0,
        "recall": inter / len(b) if b else 1.0,
        "missing": sorted(b - a)[:20],
        "extra": sorted(a - b)[:20],
    }
