"""R2RML-lite: declarative relational-table -> RDF-triple mapping.

The reference converts OpenAPI *schemas* to RDF; a complete KG factory
also has to lift ordinary TABLES into the graph (W3C R2RML / RML — the
"direct mapping with templates" core). This module implements the subset
that covers real lakehouse lifting without ever leaving codegen:

- ``iri_template("urn:order:{o_orderkey}")`` — an R2RML *template-valued
  term map* compiled to ``concat(lit, cast(col as string), ...)``;
- per-column *predicate-object maps* (literal with an optional XSD
  datatype, or an IRI minted from a template — R2RML's join-free
  ``rr:template``-based reference to a parent table: when the FK column
  itself feeds the parent's subject template, no join is needed at all);
- an optional ``rr:class`` triple per row.

Scale shape: ONE narrow projection per table — mint the subject, build an
array of (p, o_kind, o, o_datatype) structs, explode, drop nulls. No
shuffle, no Python, no join; 10^12 rows stream straight from the scan to
the sink, and Catalyst prunes the scan to exactly the referenced columns.
NULL column values emit no triple (R2RML semantics: a NULL-valued term
map produces no triple, rr:termMap NULLs are skipped).

Output is the engine's wide triple schema (file, graph, s, p, o_kind, o,
o_datatype), so mapped tables compose directly with validate_triples,
entailment, SPARQL/BGP and the Turtle/N-Triples sinks.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_PLACEHOLDER = re.compile(r"\{([^{}]+)\}")


def iri_template(template: str) -> F.Column:
    """Compile an R2RML ``rr:template`` string — ``"urn:o:{col}"`` — to a
    codegen concat. Placeholders are column names; everything else is
    literal text. Multiple placeholders are allowed (compound keys)."""
    parts: list[F.Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit(template)


@dataclass(frozen=True)
class PredicateMap:
    """One predicate-object map: emit ``<subject> <predicate> <object>``
    per row. Exactly one of ``column`` / ``template`` supplies the object:

    - ``column`` -> literal object (optionally typed with ``datatype``);
    - ``template`` -> IRI object (R2RML rr:template term map — this is how
      FK references reach the parent table's subjects without a join).

    A NULL in any referenced column suppresses the triple (R2RML NULL
    semantics); for templates the triple is suppressed if ANY placeholder
    column is NULL (concat of a NULL is NULL, which we rely on).
    """

    predicate: str
    column: str | None = None
    template: str | None = None
    datatype: str | None = None

    def object_struct(self) -> F.Column:
        if (self.column is None) == (self.template is None):
            raise ValueError(
                f"PredicateMap({self.predicate}): exactly one of column/"
                "template must be set")
        if self.template is not None:
            o, kind, dt = iri_template(self.template), "iri", None
        else:
            o, kind, dt = F.col(self.column).cast("string"), "literal", \
                self.datatype
        return F.when(o.isNotNull(), F.struct(
            F.lit(self.predicate).alias("p"),
            F.lit(kind).alias("o_kind"),
            o.alias("o"),
            F.lit(dt).cast("string").alias("o_datatype")))


def table_to_triples(df: DataFrame, subject_template: str,
                     predicate_maps: list[PredicateMap],
                     class_iri: str | None = None,
                     file: str = "r2rml", graph: str = "kg",
                     distinct: bool = False) -> DataFrame:
    """Lift one table into the triple store: one projection + explode.

    ``distinct=False`` (default) keeps bag semantics — the caller's
    materialization dedup (or a PK-unique source) owns set semantics, the
    same contract extract_transcript_triples documents. ``distinct=True``
    adds the full-width dropDuplicates for direct-to-sink use.
    """
    entries = [pm.object_struct() for pm in predicate_maps]
    if class_iri is not None:
        entries.insert(0, F.struct(
            F.lit(RDF_TYPE).alias("p"), F.lit("iri").alias("o_kind"),
            F.lit(class_iri).alias("o"),
            F.lit(None).cast("string").alias("o_datatype")))
    subj = iri_template(subject_template)
    out = (df
           .select(subj.alias("s"),
                   F.explode(F.array(*entries)).alias("r"))
           .filter(F.col("r").isNotNull() & F.col("s").isNotNull())
           .select(F.lit(file).alias("file"), F.lit(graph).alias("graph"),
                   "s", "r.p", "r.o_kind", "r.o", "r.o_datatype"))
    return out.dropDuplicates() if distinct else out


def tables_to_triples(mappings: list[tuple[DataFrame, str,
                                           list[PredicateMap],
                                           str | None]],
                      file: str = "r2rml", graph: str = "kg") -> DataFrame:
    """Map several tables and union the emissions — the whole-database
    direct mapping. Each union branch stays an independent narrow scan, so
    the combined plan is still shuffle-free."""
    frames = [table_to_triples(df, tpl, pms, cls, file=file, graph=graph)
              for df, tpl, pms, cls in mappings]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
