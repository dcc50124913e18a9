"""Distributed N-Triples SOURCE — the parse twin of sinks.write_ntriples.

N-Triples is the line-oriented interchange syntax, which is exactly what
makes it parseable at 100 TB with zero Python: each line is independent,
so ``spark.read.text`` splits the files arbitrarily across executors and
the whole parse is a codegen projection (regexp_extract + a bounded
unescape chain). No state, no shuffle; a 10^12-line dump parses at scan
speed and lands directly in the engine's wide triple schema.

Grammar subset (full coverage of what ntriples_line emits, plus language
tags which the sink never produces but foreign dumps carry):

    subject    := <IRI> | _:label
    predicate  := <IRI>
    object     := <IRI> | _:label | "literal" ( ^^<IRI> | @langtag )?

Escapes inside literals mirror the sink (sinks.py::ntriples_line): the
backslash pairs ``\\\\ \\" \\n \\r \\t``. Unescaping is order-safe via a
sentinel: ``\\\\`` is parked on \\x00 first so ``\\\\n`` (a backslash
then 'n') is never confused with ``\\n`` (a newline). \\x00 cannot occur
in the input — the N-Triples grammar forbids raw control characters.

Plain literals parse with ``o_datatype = xsd:string`` (the grammar makes
the two spellings the same term; the SINK collapses xsd:string to the
plain form, so round-trips normalize through the explicit spelling).
Comment lines (#...) and blank lines are skipped; anything else that
fails the grammar is surfaced by :func:`ntriples_errors` — the same
quarantine-not-crash posture the YAML ingest uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# One master regex per line: subject, predicate, raw object tail.
_LINE = (r'^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+'
         r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9-]+)?)'
         r'\s*\.\s*$')
_LIT = r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([A-Za-z0-9-]+))?$'


def _unescape(c: F.Column) -> F.Column:
    c = F.regexp_replace(c, r"\\\\", "\x00")
    c = F.regexp_replace(c, r'\\"', '"')
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    return F.regexp_replace(c, "\x00", r"\\")


def parse_ntriples_lines(lines: DataFrame, col: str = "value",
                         file: str = "ntriples",
                         graph: str = "kg") -> DataFrame:
    """Parse a string column of N-Triples lines into the wide triple
    schema (file, graph, s, p, o_kind, o, o_datatype, o_lang). Pure
    codegen; malformed lines are dropped here (see ntriples_errors)."""
    v = F.col(col)
    s_raw = F.regexp_extract(v, _LINE, 1)
    p = F.regexp_extract(v, _LINE, 2)
    o_raw = F.regexp_extract(v, _LINE, 3)

    lit_lex = F.regexp_extract(o_raw, _LIT, 1)
    lit_dt = F.regexp_extract(o_raw, _LIT, 2)
    lit_lang = F.regexp_extract(o_raw, _LIT, 3)

    o_kind = (F.when(o_raw.startswith("<"), "iri")
              .when(o_raw.startswith("_:"), "bnode")
              .otherwise("literal"))
    o = (F.when(o_raw.startswith("<"),
                F.substring(o_raw, 2, F.length(o_raw) - F.lit(2)))
         .when(o_raw.startswith("_:"), o_raw)
         .otherwise(_unescape(lit_lex)))
    o_datatype = (F.when(o_kind != "literal", F.lit(None).cast("string"))
                  .when(lit_lang != "", F.lit(RDF_LANGSTRING))
                  .when(lit_dt != "", lit_dt)
                  .otherwise(F.lit(XSD_STRING)))
    subj = F.when(s_raw.startswith("<"),
                  F.substring(s_raw, 2, F.length(s_raw) - F.lit(2))) \
            .otherwise(s_raw)
    return (lines
            .filter(v.rlike(_LINE))
            .select(F.lit(file).alias("file"), F.lit(graph).alias("graph"),
                    subj.alias("s"), p.alias("p"), o_kind.alias("o_kind"),
                    o.alias("o"), o_datatype.alias("o_datatype"),
                    F.when(lit_lang != "", lit_lang).alias("o_lang")))


def ntriples_errors(lines: DataFrame, col: str = "value") -> DataFrame:
    """Non-empty, non-comment lines that fail the grammar — the parse-side
    quarantine (per-line error isolation, mirroring the YAML ingest's
    per-file isolation)."""
    v = F.trim(F.col(col))
    return (lines.filter((v != "") & ~v.startswith("#")
                         & ~F.col(col).rlike(_LINE))
            .select(F.col(col).alias("line")))


def read_ntriples(spark: SparkSession, path: str, file: str = "ntriples",
                  graph: str = "kg") -> DataFrame:
    """Read an N-Triples dump (a file, a directory of part files, or a
    glob) into the triple store schema. Splitting is line-granular, so
    parallelism follows spark.sql.files.maxPartitionBytes — no per-file
    driver state."""
    return parse_ntriples_lines(spark.read.text(path), file=file,
                                graph=graph)
