"""RDF collection (rdf:first / rdf:rest) well-formedness over the triple
table — the graph-hygiene check behind the converter's ``dash:ListShape``
emission (reference shacl_converter.py wraps every array property in a
list shape; instance graphs carrying malformed cons structures break any
consumer that walks them, including operators.shapes._rdf_lists).

Unlike the shapes-graph list walk (per-file, vocabulary-sized, one Arrow
batch), instance lists are corpus-scale: every check here is expressed as
joins/aggregations over the cell table, and termination is a pointer-
DOUBLING loop (log2(max list length) self-joins of the cell-sized
successor relation) — never a per-element walk.

Issues reported, one row per (cell, issue):

- ``multi_first`` / ``multi_rest``: a cons cell with >1 rdf:first (or
  rdf:rest) — ambiguous element / successor;
- ``missing_first`` / ``missing_rest``: a cell carrying only half of the
  cons pair;
- ``dangling_rest``: rest points at a node that is neither ``rdf:nil``
  nor a cons cell;
- ``shared_tail``: a cell referenced by >1 rdf:rest — two lists merging
  into one tail (legal RDF, but invalid for SHACL list shapes and for
  any in-place list rewrite);
- ``unterminated``: following rest never reaches ``rdf:nil`` within
  ``2**max_rounds`` steps — a cycle, or a list longer than the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST, RDF_REST, RDF_NIL = RDF + "first", RDF + "rest", RDF + "nil"


def _cells(triples: DataFrame) -> DataFrame:
    """(cell, p, target): cons triples with subject/object bnode labels
    normalized to one convention (subjects carry '_:', bnode objects are
    bare — extract.TRIPLES_SCHEMA)."""
    tgt = F.when(F.col("o_kind") == "bnode",
                 F.concat(F.lit("_:"), F.col("o"))).otherwise(F.col("o"))
    return (triples.filter(F.col("p").isin(RDF_FIRST, RDF_REST))
            .select(F.col("s").alias("cell"), "p", tgt.alias("target")))


def list_integrity(triples: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Cons-structure issues -> (cell, issue). See module doc for kinds."""
    cons = _cells(triples)
    per_cell = (cons.groupBy("cell").agg(
        F.count(F.when(F.col("p") == RDF_FIRST, 1)).alias("n_first"),
        F.count(F.when(F.col("p") == RDF_REST, 1)).alias("n_rest"),
        F.max(F.when(F.col("p") == RDF_REST, F.col("target")))
        .alias("rest_target")))

    def issue(name, cond):
        return F.when(cond, F.lit(name))

    flat = (per_cell.select("cell", F.explode(F.array(
        issue("multi_first", F.col("n_first") > 1),
        issue("multi_rest", F.col("n_rest") > 1),
        issue("missing_first", (F.col("n_first") == 0)
              & (F.col("n_rest") > 0)),
        issue("missing_rest", (F.col("n_rest") == 0)
              & (F.col("n_first") > 0)),
    )).alias("issue")).filter(F.col("issue").isNotNull()))

    cell_ids = per_cell.select("cell")
    # rest targets that are neither nil nor a cons cell
    dangling = (per_cell.filter(F.col("rest_target").isNotNull()
                                & (F.col("rest_target") != RDF_NIL))
                .join(cell_ids.withColumnRenamed("cell", "rest_target"),
                      "rest_target", "left_anti")
                .select("cell", F.lit("dangling_rest").alias("issue")))

    shared = (cons.filter((F.col("p") == RDF_REST)
                          & (F.col("target") != RDF_NIL))
              .groupBy("target").agg(F.count(F.lit(1)).alias("n_in"))
              .filter(F.col("n_in") > 1)
              .select(F.col("target").alias("cell"),
                      F.lit("shared_tail").alias("issue")))

    # termination: pointer doubling on the successor relation, absorbing
    # at any non-cell node (nil or a dangling exit). After round r every
    # pointer has advanced 2**r steps or left the cell set; survivors
    # whose pointer is STILL a cell sit on (or feed) a cycle, or exceed
    # the length bound. multi_rest cells use an arbitrary successor —
    # they are already flagged above, and one witness path suffices.
    ptr = (per_cell.filter(F.col("rest_target").isNotNull())
           .select("cell", F.col("rest_target").alias("ptr"))
           .localCheckpoint())
    nxt = ptr.select(F.col("cell").alias("ptr"),
                     F.col("ptr").alias("ptr2"))
    for _ in range(max_rounds):
        hop = (ptr.join(nxt, "ptr", "left")
               .select("cell", F.coalesce("ptr2", "ptr").alias("ptr"))
               .localCheckpoint())
        # converged when no pointer is a live cell anymore
        live = hop.join(cell_ids.withColumnRenamed("cell", "ptr"), "ptr",
                        "left_semi")
        ptr = hop
        if live.isEmpty():
            break
        nxt = ptr.select(F.col("cell").alias("ptr"),
                         F.col("ptr").alias("ptr2"))
    unterminated = (ptr.join(cell_ids.withColumnRenamed("cell", "ptr"),
                             "ptr", "left_semi")
                    .select("cell", F.lit("unterminated").alias("issue")))

    return (flat.unionByName(dangling).unionByName(shared)
            .unionByName(unterminated).dropDuplicates())


def list_members(triples: DataFrame, max_rounds: int = 16) -> DataFrame:
    """(head, member, member_kind, member_datatype): every rdf list's
    elements keyed by the list HEAD cell.

    Scale shape: each cell finds its chain head by ANCESTOR POINTER
    DOUBLING over the reversed rest relation — state is one pointer per
    cell and rounds are log2(max list length), never a per-element walk
    and never the quadratic all-pairs closure. Shared tails keep the
    lexicographically smallest parent (deterministic; list_integrity
    flags them); cells on a rest-cycle converge to an arbitrary cycle
    member that matches no real head, so cyclic lists simply contribute
    no members (list_integrity reports them as unterminated).
    """
    cons = _cells(triples)
    cells = cons.select("cell").distinct()
    # parents is probed for convergence EVERY pass below — materialize it
    # once or each probe re-runs the caller's full lineage (r5 profile:
    # the probe cost as much as the jump itself on instance-sized chains)
    parents = (cons.filter((F.col("p") == RDF_REST)
                           & (F.col("target") != RDF_NIL))
               .select(F.col("target").alias("child"),
                       F.col("cell").alias("parent"))
               .join(cells.withColumnRenamed("cell", "child"), "child",
                     "left_semi")
               .groupBy("child").agg(F.min("parent").alias("anc"))
               .localCheckpoint())
    anc = parents.select(F.col("child").alias("cell"), "anc")
    # BATCHED pointer jumping (r5, the components.py lesson applied here):
    # compose JUMPS_PER_PASS jumps into ONE plan per materialization —
    # chain depth divides by 2^(jumps) per pass, and the driver pays one
    # localCheckpoint + one convergence probe per PASS instead of per
    # jump. Job count, not shuffle volume, throttles iterative DataFrame
    # walks: the 711-element list_member_check stress dropped from ~10
    # materialized rounds to 4.
    jumps_per_pass = 3
    for _ in range(max_rounds):
        cur = anc
        for _ in range(jumps_per_pass):
            up = cur.select(F.col("cell").alias("anc"),
                            F.col("anc").alias("anc2"))
            cur = (cur.join(up, "anc", "left")
                   .select("cell", F.coalesce("anc2", "anc").alias("anc")))
        nxt = cur.localCheckpoint()
        # converged when no pointer still has an ancestor of its own
        still = nxt.join(parents.withColumnRenamed("child", "anc"),
                         "anc", "left_semi")
        anc = nxt
        if still.isEmpty():
            break
    roots = (cells.join(anc, "cell", "left")
             .select("cell", F.coalesce("anc", "cell").alias("head")))
    firsts = (triples.filter(F.col("p") == RDF_FIRST)
              .select(F.col("s").alias("cell"),
                      F.col("o").alias("member"),
                      F.col("o_kind").alias("member_kind"),
                      F.col("o_datatype").alias("member_datatype")))
    return firsts.join(roots, "cell").select(
        "head", "member", "member_kind", "member_datatype")
