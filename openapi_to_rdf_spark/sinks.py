"""Turtle file sink: triple DataFrame -> per-file .ttl text.

Reference behavior (shacl_converter.py:945-975, rdf_converter.py:381-387):
SHACL mode writes output/rdf/<name>_rdf.ttl + output/shacl/<name>_shacl.ttl,
OWL mode a single <name>.ttl. Here serialization is a distributed
``groupBy(file, graph).applyInPandas`` stage — each (file, graph) group is one
Arrow batch serialized by the deterministic triplecore serializer, written
executor-side so the driver never holds file content. Output naming mirrors
the reference layout.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

RESULT_SCHEMA = StructType([
    StructField("file", StringType(), False),
    StructField("graph", StringType(), False),
    StructField("out_path", StringType(), False),
    StructField("triples", LongType(), False),
])

_SUBDIR = {"rdf": "rdf", "shacl": "shacl", "owl": ""}
_SUFFIX = {"rdf": "_rdf", "shacl": "_shacl", "owl": ""}


def _row_to_triple(rec) -> tuple:
    from .triplecore.terms import bnode, iri, typed_literal

    s = bnode(rec.s[2:]) if rec.s.startswith("_:") else iri(rec.s)
    if rec.o_kind == "iri":
        o = iri(rec.o)
    elif rec.o_kind == "bnode":
        o = bnode(rec.o[2:] if rec.o.startswith("_:") else rec.o)
    else:
        o = typed_literal(rec.o, rec.o_datatype or "http://www.w3.org/2001/XMLSchema#string")
    return s, iri(rec.p), o


def write_turtle(triples: DataFrame, output_dir: str) -> DataFrame:
    """Serialize each (file, graph) partition to Turtle under output_dir.

    Returns a small result DataFrame (file, graph, out_path, triples) — the
    action that drives the job; callers typically ``.collect()`` it as the
    run summary (reference main.py:79-86 ✓/✗ report).
    """
    from .triplecore.turtle import serialize_turtle

    def serialize(pdf):
        import pandas as pd

        fname, gname = pdf["file"].iloc[0], pdf["graph"].iloc[0]
        stem = fname.rsplit(".", 1)[0].replace("-", "_")
        sub = _SUBDIR.get(gname, gname)
        out_dir = os.path.join(output_dir, sub) if sub else output_dir
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"{stem}{_SUFFIX.get(gname, '')}.ttl")
        triples = {_row_to_triple(r) for r in pdf.itertuples()}
        with open(out_path, "w", encoding="utf-8") as fh:
            fh.write(serialize_turtle(triples))
        return pd.DataFrame(
            [(fname, gname, out_path, len(triples))],
            columns=["file", "graph", "out_path", "triples"])

    return triples.groupBy("file", "graph").applyInPandas(serialize, RESULT_SCHEMA)
