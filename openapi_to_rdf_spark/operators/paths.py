"""SPARQL 1.1 property paths over the triple table, compiled to DataFrame
joins and semi-naive fixpoints — the navigational half of the BGP query
surface (operators/bgp): ``foaf:knows+``, ``placedBy/inNation/name``,
``^inNation``, etc.

A path expression is a small AST of nested tuples (no string parser — the
tuple form IS the public API, mirroring how bgp.py takes pattern tuples):

- ``"http://…/pred"``          — an IRI: one predicate step
- ``("seq", p1, p2, …)``      — p1/p2/…    sequence
- ``("alt", p1, p2, …)``      — p1|p2|…    alternation
- ``("inv", p)``              — ^p          inverse
- ``("+", p)``                — p+          one-or-more
- ``("*", p)``                — p*          zero-or-more
- ``("?", p)``                — p?          zero-or-one
- ``("between", p, lo, hi)``  — p{lo,hi}    bounded repetition (engine
  extension, as in Jena/Virtuoso; SPARQL 1.1 dropped it from the REC)
- ``("nps", p1, p2, …)``      — !(p1|p2|…) negated property set: one
  step over any predicate NOT listed (the REC's NegatedPropertySet;
  inverse members compose as ``("inv", ("nps", …))``)

Compilation: every sub-path compiles to a pair relation (s, o). Fixed-
length forms keep SPARQL's bag semantics (a seq join yields one row per
distinct ROUTE, exactly as the spec counts solutions); the closure forms
(+, *, ?, between) are DISTINCT pair sets, again exactly per spec
("arbitrary length path" solutions are duplicate-free).

Scale design:

- An atom is one pruned scan: constant predicates hit the graph snapshot's
  ``pred`` partition column (plans/pipeline.py vertical partitioning), so
  a path touches only the predicates it names — never the whole graph.
- ``+`` with both ends variable is SEMI-NAIVE transitive closure: each
  round joins only the NEW pairs (the frontier) against the base step,
  anti-joins the accumulated set, and localCheckpoints to keep the plan
  flat (same iteration discipline as operators/components and graphrank).
  Work per round is O(frontier × avg-degree), not O(closure²), and the
  loop stops the first empty round. Full closure is inherently
  output-bounded (it can be quadratic in nodes on dense graphs) — that is
  the QUERY's cost, not an implementation artifact; ``max_rounds`` fails
  loudly rather than silently truncating (the lesson from the CC
  high-diameter fix).
- ``+`` / ``*`` with a CONSTANT end is rewritten to directional BFS from
  that constant (frontier = reachable node set, state O(nodes) not
  O(pairs)) — the difference between "everything reachable from X" and
  materializing all-pairs reachability, and the rewrite a 10^12-triple
  deployment depends on.
- Bounded ``between`` unrolls hi joins with early stop — no fixpoint, no
  driver sync beyond the per-round emptiness check shared with ``+``.

``path_query`` binds the pair relation's ends to constants/variables like
one BGP pattern; bgp.bgp_query accepts a path tuple in predicate position,
so paths compose with ordinary patterns (shared-variable equi-joins) for
free. Driver oracles: ``bgp_path_orders`` (seq+inv vs the relational join
DuckDB runs on the base tables) and ``bgp_path_closure`` (bounded closure
vs a recursive CTE).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PathSpec = "str | tuple"

_CLOSURE_OPS = {"+", "*", "?", "between"}


def _atom_pairs(triples: DataFrame, iri: str) -> DataFrame:
    """One predicate step -> (s, o), with the graph snapshot's ``pred``
    partition pruned when present (same trick as bgp.bgp_query)."""
    scan = triples
    if "pred" in triples.columns:
        local = re.search(r"([A-Za-z0-9_]+)$", iri)
        if local:
            scan = scan.filter(F.col("pred") == local.group(1))
    return scan.filter(F.col("p") == iri).select("s", "o")


def _graph_nodes(triples: DataFrame) -> DataFrame:
    """Every term that appears as subject or object — the domain of the
    zero-length path per SPARQL 1.1 (ZeroLengthPath over the graph)."""
    return (triples.select(F.col("s").alias("n"))
            .unionAll(triples.select(F.col("o").alias("n")))
            .dropDuplicates(["n"]))


def _closure_pairs(base: DataFrame, max_rounds: int) -> DataFrame:
    """Distinct (s, o) pairs connected by >= 1 step of ``base`` — semi-
    naive evaluation: round r joins only pairs first derived in round r-1.
    """
    base = base.dropDuplicates(["s", "o"]).localCheckpoint()
    reached = base
    frontier = base
    for _ in range(max_rounds):
        nxt = (frontier.select("s", F.col("o").alias("m"))
               .join(base.select(F.col("s").alias("m"), "o"), "m")
               .select("s", "o")
               .dropDuplicates(["s", "o"])
               .join(reached, ["s", "o"], "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            return reached
        reached = reached.unionByName(nxt).localCheckpoint()
        frontier = nxt
    raise RuntimeError(
        f"path closure did not converge in {max_rounds} rounds — raise "
        "max_rounds (the graph has longer simple paths than expected)")


def _reachable_from(base: DataFrame, seeds: DataFrame,
                    max_rounds: int) -> DataFrame:
    """Nodes reachable in >= 1 step from each seed -> (s=seed, o=node).
    Frontier state is (seed, node) — O(seeds × reached), never all pairs.
    With one constant seed this is plain BFS."""
    base = base.dropDuplicates(["s", "o"]).localCheckpoint()
    first = (seeds.select(F.col("n").alias("s"))
             .join(base, "s").select("s", "o")
             .dropDuplicates(["s", "o"]).localCheckpoint())
    reached = first
    frontier = first
    for _ in range(max_rounds):
        nxt = (frontier.select("s", F.col("o").alias("m"))
               .join(base.select(F.col("s").alias("m"), "o"), "m")
               .select("s", "o")
               .dropDuplicates(["s", "o"])
               .join(reached, ["s", "o"], "left_anti")
               .localCheckpoint())
        if nxt.isEmpty():
            return reached
        reached = reached.unionByName(nxt).localCheckpoint()
        frontier = nxt
    raise RuntimeError(
        f"path closure did not converge in {max_rounds} rounds — raise "
        "max_rounds (the graph has longer simple paths than expected)")


def _bounded_pairs(base: DataFrame, lo: int, hi: int,
                   nodes: DataFrame) -> DataFrame:
    """Distinct pairs connected by a path of length in [lo, hi] (lo=0
    contributes the identity over the graph's nodes)."""
    if not (0 <= lo <= hi):
        raise ValueError(f"bad repetition bounds {{{lo},{hi}}}")
    base = base.dropDuplicates(["s", "o"]).localCheckpoint()
    parts = []
    if lo == 0:
        parts.append(nodes.select(F.col("n").alias("s"),
                                  F.col("n").alias("o")))
    # pairs-at-exactly-r derived incrementally; dedup happens at the end
    cur = base
    for r in range(1, hi + 1):
        if r >= max(lo, 1):
            parts.append(cur)
        if r < hi:
            cur = (cur.select("s", F.col("o").alias("m"))
                   .join(base.select(F.col("s").alias("m"), "o"), "m")
                   .select("s", "o")
                   .dropDuplicates(["s", "o"])
                   .localCheckpoint())
            if cur.isEmpty():
                break
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates(["s", "o"])


def compile_path(triples: DataFrame, path, *,
                 max_rounds: int = 40) -> DataFrame:
    """Compile a path expression to its pair relation (s, o)."""
    if isinstance(path, str):
        return _atom_pairs(triples, path)
    if not isinstance(path, tuple) or not path:
        raise ValueError(f"bad path expression: {path!r}")
    op = path[0]
    if op == "seq":
        if len(path) < 3:
            raise ValueError("seq needs >= 2 sub-paths")
        out = compile_path(triples, path[1], max_rounds=max_rounds)
        for sub in path[2:]:
            right = compile_path(triples, sub, max_rounds=max_rounds)
            out = (out.select("s", F.col("o").alias("m"))
                   .join(right.select(F.col("s").alias("m"), "o"), "m")
                   .select("s", "o"))
        return out
    if op == "alt":
        if len(path) < 3:
            raise ValueError("alt needs >= 2 sub-paths")
        parts = [compile_path(triples, sub, max_rounds=max_rounds)
                 for sub in path[1:]]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    if op == "inv":
        inner = compile_path(triples, path[1], max_rounds=max_rounds)
        return inner.select(F.col("o").alias("s"), F.col("s").alias("o"))
    if op == "+":
        base = compile_path(triples, path[1], max_rounds=max_rounds)
        return _closure_pairs(base, max_rounds)
    if op == "*":
        base = compile_path(triples, path[1], max_rounds=max_rounds)
        ident = _graph_nodes(triples).select(F.col("n").alias("s"),
                                             F.col("n").alias("o"))
        return (_closure_pairs(base, max_rounds)
                .unionByName(ident).dropDuplicates(["s", "o"]))
    if op == "?":
        base = compile_path(triples, path[1], max_rounds=max_rounds)
        ident = _graph_nodes(triples).select(F.col("n").alias("s"),
                                             F.col("n").alias("o"))
        return (base.dropDuplicates(["s", "o"])
                .unionByName(ident).dropDuplicates(["s", "o"]))
    if op == "nps":
        if len(path) < 2:
            raise ValueError("nps needs >= 1 excluded predicate")
        # one scan, NOT prunable by the pred partition (the complement
        # spans partitions by construction) — the REC's NPS is inherently
        # a full-predicate-space step; still one filter, no joins
        return (triples.filter(~F.col("p").isin(list(path[1:])))
                .select("s", "o"))
    if op == "between":
        _, sub, lo, hi = path
        base = compile_path(triples, sub, max_rounds=max_rounds)
        return _bounded_pairs(base, lo, hi, _graph_nodes(triples))
    raise ValueError(f"unknown path operator {op!r}")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def path_query(triples: DataFrame, subject: str, path, obj: str, *,
               select: list[str] | None = None, distinct: bool = False,
               max_rounds: int = 40) -> DataFrame:
    """Match ``subject path obj`` — one path pattern — returning variable
    bindings exactly like bgp.bgp_query (one column per variable).

    Constant-end closures are rewritten to seeded BFS instead of the full
    pair fixpoint (see module docstring) — ``path_query(g, "node#42",
    ("+", p), "?x")`` explores only node#42's reachable set.
    """
    is_closure = (isinstance(path, tuple) and path
                  and path[0] in ("+", "*"))
    pairs = None
    if is_closure and (not _is_var(subject) or not _is_var(obj)):
        base = compile_path(triples, path[1], max_rounds=max_rounds)
        if not _is_var(subject):
            seeds = triples.sparkSession.createDataFrame(
                [(subject,)], ["n"])
            pairs = _reachable_from(base, seeds, max_rounds)
        else:  # constant object: BFS over the reversed step relation
            seeds = triples.sparkSession.createDataFrame([(obj,)], ["n"])
            rev = base.select(F.col("o").alias("s"), F.col("s").alias("o"))
            pairs = (_reachable_from(rev, seeds, max_rounds)
                     .select(F.col("o").alias("s"), F.col("s").alias("o")))
        if path[0] == "*":
            # zero-length: the constant end relates to itself (per SPARQL
            # ZeroLengthPath with one bound term)
            const = subject if not _is_var(subject) else obj
            ident = triples.sparkSession.createDataFrame(
                [(const, const)], ["s", "o"])
            pairs = pairs.unionByName(ident).dropDuplicates(["s", "o"])
    if pairs is None:
        pairs = compile_path(triples, path, max_rounds=max_rounds)

    cols = []
    seen: dict[str, str] = {}
    for term, col in zip((subject, obj), ("s", "o")):
        if _is_var(term):
            name = term[1:]
            if name in seen:  # ?x path ?x — same-term cycles
                pairs = pairs.filter(F.col(col) == F.col(seen[name]))
            else:
                seen[name] = col
                cols.append(F.col(col).alias(name))
        else:
            pairs = pairs.filter(F.col(col) == term)
    out = pairs.select(*cols)
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    return out.dropDuplicates() if distinct else out
