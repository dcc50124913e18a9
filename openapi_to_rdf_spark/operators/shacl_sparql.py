"""SHACL-SPARQL constraints (SHACL spec §5, ``sh:sparql``): arbitrary
SPARQL SELECT queries as validation rules, executed by the repo's own
SPARQL front-end (sparql.py) over the triple table.

This closes the last expressiveness gap in the shapes layer: the core
constraint components (shapes.validate_triples / closed_shape_violations)
cover everything the converter emits, but real governance rules are often
relational ("a tool turn must carry a tool edge", "an order's customer
must exist") — exactly what sh:sparql is for. Each constraint is a SELECT
projecting ``?this`` (the focus node, per the SHACL-SPARQL convention)
and optionally ``?path`` / ``?value``; every binding is a violation.

Scale: the CONSTRAINT LIST is vocabulary-sized (tens of rules), so the
driver loop is over rules, never data; each query compiles to the same
BGP/filter DataFrame algebra every other graph query uses — predicate
pushdown, broadcast joins and AQE apply unchanged, and the unioned result
is one job. Violations land in validate_triples' (s, p, o, violation,
detail) shape, so reports, quarantine and validation_report_triples
compose unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sparql_constraint_violations(
        triples: DataFrame,
        constraints: list[tuple[str, str, str]]) -> DataFrame:
    """``constraints``: (constraint_id, message, sparql_select_text) — each
    SELECT must project ``?this``; ``?path`` and ``?value`` are optional.

    Returns (s, p, o, violation, detail): s = focus node, p/o = the bound
    path/value (null when the query doesn't project them), violation =
    'sparqlConstraint:<id>', detail = the constraint message.
    """
    from ..sparql import sparql_query

    frames = []
    for cid, message, text in constraints:
        res = sparql_query(triples.select("s", "p", "o"), text)
        if "this" not in res.columns:
            raise ValueError(
                f"sh:sparql constraint {cid!r} must project ?this "
                f"(got columns {res.columns})")
        path = (F.col("path") if "path" in res.columns
                else F.lit(None).cast("string"))
        value = (F.col("value") if "value" in res.columns
                 else F.lit(None).cast("string"))
        frames.append(res.select(
            F.col("this").alias("s"), path.alias("p"), value.alias("o"),
            F.lit(f"sparqlConstraint:{cid}").alias("violation"),
            F.lit(message).alias("detail")))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.dropDuplicates()
