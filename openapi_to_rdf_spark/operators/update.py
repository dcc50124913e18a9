"""SPARQL 1.1 Update over the triple table — DELETE/INSERT WHERE, ground
INSERT/DELETE DATA — compiled to anti-joins and unions over the snapshot.

The engine's graphs are immutable snapshot tables (plans/snapshot), so an
update is a PURE function old-graph → new-graph; persisting the result
through ``materialize`` gives the versioned, lineage-tracked mutation an
Iceberg-style store would record. That matches SPARQL 1.1 Update §2.2
exactly: each operation maps a graph store to a graph store.

Semantics (SPARQL 1.1 Update §3.1.3, the Modify operation):

- ONE evaluation of the WHERE group produces the bindings; BOTH templates
  are instantiated from those same pre-update bindings (an insert can
  therefore never feed the delete of the same operation, and vice versa);
- deletes apply before inserts, so a triple matched by both templates
  ends up PRESENT in the result;
- unbound template instantiations (a template variable the WHERE left
  null, e.g. out of an OPTIONAL) are silently skipped, per the spec.

Scale shape — the plans are why this works at 10^12 triples:

- the delete is one anti-join of the base on (s, p, o) against the
  instantiated delete set. The delete set is solution-sized, typically
  orders of magnitude below the graph, so AQE broadcasts it and the base
  is touched in ONE pruned pass with no shuffle of graph rows;
- set semantics are restored WITHOUT the graph ever becoming a join
  build side: I \\ (B \\ D) is computed as hits = B ⋉ I (a semi-join
  whose output is at most insert-sized), then pure solution-sized set
  arithmetic. The base is probed exactly twice (delete anti-join +
  insert semi-join) and never globally deduplicated — an update touching
  0.001% of a 100 TB graph does 0.001%-sized shuffles;
- ground-data operations skip WHERE evaluation entirely: the triple list
  lives on the driver (an UPDATE request body, inherently small) and is
  broadcast.

No counterpart exists in the reference (openapi-to-rdf is a one-way
converter); this is engine surface a KG *store* needs once graphs are
queryable, and the driver hash-verifies it end to end (``kg_update``):
the DELETE/INSERT WHERE over the RDF encoding of orders must reproduce
the CASE-rewrite DuckDB runs on the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import Pattern, _is_var, bgp_query

_SPO = ["s", "p", "o"]


def _instantiate(bindings: DataFrame, template: list[Pattern]) -> DataFrame:
    """Template patterns → (s, p, o) rows, one set per template pattern,
    unioned. Constants pass through; variables must be bound by the
    WHERE group. Rows where any instantiated position is null (an
    OPTIONAL variable that didn't match) are dropped, per SPARQL 1.1
    Update §3.1.3's 'unbound variable instantiates nothing'."""
    bound = set(bindings.columns)
    parts = []
    for s, p, o in template:
        cols = []
        for term, name in zip((s, p, o), _SPO):
            if _is_var(term):
                if term[1:] not in bound:
                    raise ValueError(f"template variable {term} is not "
                                     "bound by the WHERE patterns")
                cols.append(F.col(term[1:]).cast("string").alias(name))
            else:
                cols.append(F.lit(term).alias(name))
        part = bindings.select(*cols)
        parts.append(part.filter(F.col("s").isNotNull()
                                 & F.col("p").isNotNull()
                                 & F.col("o").isNotNull()))
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out.dropDuplicates()


def delete_insert(triples: DataFrame, where: list[Pattern],
                  delete: list[Pattern] | None = None,
                  insert: list[Pattern] | None = None,
                  filters: list | None = None,
                  values: dict[str, list] | None = None,
                  optional: list[list[Pattern]] | None = None) -> DataFrame:
    """SPARQL 1.1 ``DELETE {..} INSERT {..} WHERE {..}`` — returns the
    new graph. At least one of ``delete``/``insert`` is required.

    The WHERE group supports the :func:`bgp_query` surface via
    ``filters``/``values``/``optional``; it is evaluated ONCE against the
    pre-update graph and feeds both templates (§3.1.3 — see module doc).
    A template pattern mentioning an OPTIONAL-only variable instantiates
    nothing for the solutions where it is unbound.
    """
    if not delete and not insert:
        raise ValueError("DELETE/INSERT WHERE needs at least one template")
    spo = triples.select(*_SPO)
    bindings = bgp_query(triples, where, filters=filters, values=values,
                         optional=optional)
    out = spo
    dset = _instantiate(bindings, delete) if delete else None
    if dset is not None:
        # the delete set is the anti-join's BUILD side (right), so Spark
        # broadcasts it when solution-sized and the graph is probed once
        out = out.join(dset, _SPO, "left_anti")
    if insert:
        ins = _instantiate(bindings, insert)
        # Set semantics with the graph ONLY ever on the probe side:
        # I \ (B \ D) is rewritten through hits = B ⋉ I (output at most
        # insert-sized), survivors = hits \ D, new = I \ survivors — the
        # graph is never a join build side, never globally deduplicated,
        # and every set-difference runs between solution-sized relations.
        hits = spo.join(ins, _SPO, "left_semi")
        if dset is not None:
            hits = hits.join(dset, _SPO, "left_anti")
        out = out.unionByName(ins.join(hits, _SPO, "left_anti"))
    return out


def delete_where(triples: DataFrame, patterns: list[Pattern],
                 filters: list | None = None) -> DataFrame:
    """SPARQL 1.1 ``DELETE WHERE {..}`` — the shorthand where the WHERE
    group doubles as the delete template (§3.1.3.1)."""
    return delete_insert(triples, patterns, delete=patterns,
                         filters=filters)


def insert_where(triples: DataFrame, where: list[Pattern],
                 insert: list[Pattern],
                 filters: list | None = None) -> DataFrame:
    """SPARQL 1.1 ``INSERT {..} WHERE {..}`` — materialized inference:
    CONSTRUCT the derived triples and keep them in the graph."""
    return delete_insert(triples, where, insert=insert, filters=filters)


def _ground(spark, data: list[tuple]) -> DataFrame:
    rows = [(str(s), str(p), str(o)) for s, p, o in data]
    return spark.createDataFrame(rows, _SPO).dropDuplicates()


def insert_data(triples: DataFrame, data: list[tuple]) -> DataFrame:
    """SPARQL 1.1 ``INSERT DATA`` — ground triples, no WHERE. The data
    lives on the driver (an update request body), so it broadcasts; the
    dedup-against-base anti-join probes the graph once."""
    ground = F.broadcast(_ground(triples.sparkSession, data))
    spo = triples.select(*_SPO)
    # same probe-side discipline as delete_insert: which of the new
    # triples already exist (one broadcast semi-join pass over the
    # graph, output bounded by the request size), then add the rest
    hits = F.broadcast(spo.join(ground, _SPO, "left_semi"))
    return spo.unionByName(ground.join(hits, _SPO, "left_anti"))


def delete_data(triples: DataFrame, data: list[tuple]) -> DataFrame:
    """SPARQL 1.1 ``DELETE DATA`` — ground triples, no WHERE; one
    broadcast anti-join pass over the graph. Absent triples are a no-op,
    per the spec."""
    ground = F.broadcast(_ground(triples.sparkSession, data))
    return triples.select(*_SPO).join(ground, _SPO, "left_anti")
