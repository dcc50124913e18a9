"""Named graphs — quad (g, s, p, o) pattern matching and SPARQL 1.1
graph management, the dataset layer above the triple-table BGP engine.

An RDF *dataset* is one default graph plus named graphs; SPARQL reaches
the named ones through ``GRAPH <iri> {..}`` / ``GRAPH ?g {..}`` and
Update manages them with ADD/COPY/MOVE/CLEAR. The engine's quad table is
the triple table plus a ``g`` column; at scale it is partitioned by
(g, predicate) so a constant-graph constant-predicate pattern prunes to
ONE partition directory, and ``GRAPH ?g`` over a selective pattern scans
only that predicate's partitions across graphs.

Compilation is the same classic SPARQL→relational mapping as
operators/bgp, with the graph position participating exactly like the
others: a shared ``?g`` between two patterns joins them on the graph
column (the quad-store equivalent of 'both facts in the SAME named
graph'), which is how provenance-per-source datasets are queried
('find X and Y asserted by the same source').

The reference has no dataset concept (one converter output = one file);
this is store surface, and the driver hash-verifies it end to end
(``bgp_graphs``): the 4-pattern quad query over an RDF dataset encoding
of orders must reproduce DuckDB's relational join on the base tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import _is_var

Pattern4 = tuple[str, str, str, str]   # (g, s, p, o)
_GSPO = ["g", "s", "p", "o"]


def quad_query(quads: DataFrame, patterns: list[Pattern4],
               select: list[str] | None = None,
               distinct: bool = False,
               filters: list | None = None) -> DataFrame:
    """Match a conjunctive quad-pattern list; one column per variable.

    Each pattern is (graph, subject, predicate, object); ``?``-terms are
    variables. Same algebra as :func:`operators.bgp.bgp_query` — each
    pattern is one pruned scan with its constants pushed down, patterns
    join pairwise on shared variables — with the graph term a first-class
    join position. ``GRAPH <iri> {..}`` is a constant graph term on every
    pattern of the group; ``GRAPH ?g {..}`` is the same variable on every
    pattern (see :func:`graph_group` for the sugar).
    """
    if not patterns:
        raise ValueError("empty quad BGP")
    out: DataFrame | None = None
    for pat in patterns:
        if len(pat) != 4:
            raise ValueError(f"quad pattern needs 4 terms, got {pat!r}")
        scan = quads
        cols = []
        seen: dict[str, str] = {}
        for term, col in zip(pat, _GSPO):
            if _is_var(term):
                name = term[1:]
                if name in seen:
                    scan = scan.filter(F.col(col) == F.col(seen[name]))
                else:
                    seen[name] = col
                    cols.append(F.col(col).alias(name))
            else:
                scan = scan.filter(F.col(col) == term)
        scan = scan.select(*cols)
        if out is None:
            out = scan
        else:
            shared = sorted(set(out.columns) & set(scan.columns))
            out = out.join(scan, shared) if shared else out.crossJoin(scan)
    for cond in filters or []:
        out = out.filter(cond)
    if select:
        out = out.select(*[v.lstrip("?") for v in select])
    return out.dropDuplicates() if distinct else out


def graph_group(quads: DataFrame, graph: str,
                patterns: list[tuple[str, str, str]],
                **kwargs) -> DataFrame:
    """``GRAPH graph { triple patterns }`` — prefix every triple pattern
    with the graph term (constant IRI or ``?var``) and compile."""
    return quad_query(quads, [(graph, s, p, o) for s, p, o in patterns],
                      **kwargs)


def default_graph(quads: DataFrame,
                  graphs: list[str] | None = None) -> DataFrame:
    """The SPARQL dataset clause: ``FROM g1 FROM g2 ...`` builds the
    query's default graph as the MERGE (set union) of the named graphs —
    all of them when ``graphs`` is None. Returns a plain (s, p, o) triple
    table ready for the operators/bgp surface; the distinct is over the
    merged slice only, and a single-graph FROM skips it (one graph is
    already a set)."""
    sel = quads if graphs is None else quads.filter(F.col("g").isin(graphs))
    out = sel.select("s", "p", "o")
    return out if graphs is not None and len(graphs) == 1 \
        else out.dropDuplicates()


# --------------------------------------------------------------------------
# SPARQL 1.1 Update graph management (§3.2): CLEAR / ADD / COPY / MOVE.
# A quad table cannot represent an EMPTY named graph, so DROP ≡ CLEAR
# here (the spec's only difference is whether the empty graph lingers);
# every operation is a pure quads → quads function, like operators/update.
# --------------------------------------------------------------------------

def clear_graph(quads: DataFrame, graph: str) -> DataFrame:
    """``CLEAR GRAPH <g>`` — one pushed-down partition-pruning filter."""
    return quads.filter(F.col("g") != graph)


def add_graph(quads: DataFrame, src: str, dst: str) -> DataFrame:
    """``ADD <src> TO <dst>`` — copy src's triples into dst, keeping
    dst's existing ones (set semantics: the anti-join's build side is
    the src slice, never the whole store)."""
    src_rows = quads.filter(F.col("g") == src)
    dst_rows = quads.filter(F.col("g") == dst)
    new = (src_rows.withColumn("g", F.lit(dst))
           .join(dst_rows, _GSPO, "left_anti"))
    return quads.unionByName(new)


def copy_graph(quads: DataFrame, src: str, dst: str) -> DataFrame:
    """``COPY <src> TO <dst>`` — dst becomes exactly src's content
    (spec: dst is cleared first)."""
    if src == dst:
        return quads
    return (clear_graph(quads, dst)
            .unionByName(quads.filter(F.col("g") == src)
                         .withColumn("g", F.lit(dst))))


def move_graph(quads: DataFrame, src: str, dst: str) -> DataFrame:
    """``MOVE <src> TO <dst>`` — copy then drop the source."""
    if src == dst:
        return quads
    return clear_graph(copy_graph(quads, src, dst), src)
