"""Distributed Turtle SOURCE — read .ttl files (including the reference's
own golden outputs) back into the wide triple schema.

Turtle is a STATEFUL syntax (@prefix declarations scope the whole file),
so unlike N-Triples (sources/ntriples.py — line-granular, pure codegen)
the parse unit is a file: each worker runs the repo's own Turtle parser
(triplecore/turtle.py — the parser the golden P/R gate itself relies on,
rdflib being unavailable offline) over whole file bodies inside one
Arrow-batched mapInPandas stage. Parallelism is per-file — exactly the
YAML ingest's model (operators/extract.py), and the right call: a corpus
of many Turtle files scales horizontally, while a single monster .ttl
should be exported as N-Triples instead (sinks.write_ntriples documents
that asymmetry; this reader exists for interchange with the reference
world, not as the 100 TB path).

Bnode labels are prefixed with the file's md5-stem so labels never
collide across files (Turtle bnode labels are file-scoped by the
grammar); structural comparison goes through triplecore.canon as usual.

Per-file error isolation mirrors the YAML ingest: a file that fails to
parse yields one row in the companion errors frame instead of failing
the job (read_turtle's ``errors=True``).
"""

from __future__ import annotations

import hashlib
import pathlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

XSD_STRING = "http://www.w3.org/2001/XMLSchema#"+"string"

TRIPLES_DDL = ("file string, graph string, s string, p string, "
               "o_kind string, o string, o_datatype string")
ERRORS_DDL = "file string, error string"


def _term(t: tuple, scope: str) -> tuple[str, str, str | None]:
    """Parser term tuple -> (kind, value, datatype)."""
    tag = t[0]
    if tag == "i":
        return "iri", t[1], None
    if tag == "b":
        return "bnode", f"_:{scope}_{t[1]}", None
    return "literal", t[1], (None if t[2] == XSD_STRING else t[2])


def read_turtle(spark: SparkSession, path: str, graph: str = "kg",
                errors: bool = False) -> DataFrame | tuple[DataFrame,
                                                           DataFrame]:
    """Read a Turtle file / directory / glob into the triple store schema.

    ``errors=True`` additionally returns a (file, error) frame of files
    that failed to parse (quarantine-not-crash, like the YAML ingest).
    """
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.ttl")
             .load(path)
             .select("path", "content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from openapi_to_rdf_spark.triplecore.turtle import parse_turtle
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                name = pathlib.Path(p).name
                scope = hashlib.md5(name.encode()).hexdigest()[:8]
                try:
                    triples = parse_turtle(bytes(content).decode("utf-8"))
                except Exception as exc:  # noqa: BLE001 — quarantine row
                    out.append((name, graph, "_:error", "urn:parse:error",
                                "literal", f"{type(exc).__name__}: {exc}",
                                None, True))
                    continue
                for s, pr, o in triples:
                    sk, sv, _ = _term(s, scope)
                    _, pv, _ = _term(pr, scope)
                    ok, ov, od = _term(o, scope)
                    out.append((name, graph, sv, pv, ok, ov, od, False))
            yield pd.DataFrame(out, columns=[
                "file", "graph", "s", "p", "o_kind", "o", "o_datatype",
                "_err"])

    wide = files.mapInPandas(
        parse, TRIPLES_DDL + ", _err boolean")
    good = wide.filter(~wide["_err"]).drop("_err")
    if not errors:
        return good
    err = (wide.filter(wide["_err"])
           .selectExpr("file", "o as error"))
    return good, err
