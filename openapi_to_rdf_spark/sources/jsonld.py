"""Distributed JSON-LD SOURCE — the parse twin of sinks.write_jsonld.

Dialect: LINE-DELIMITED FLATTENED JSON-LD — one flattened node object per
line (the streaming profile used for bulk interchange; JSON-LD 1.1
flattened form restricted to one node per line, no nested @graph, @context
pre-expanded so keys are absolute IRIs):

    {"@id": "<iri or _:bnode>",
     "@type": ["<class iri>", ...],
     "<predicate iri>": [{"@id": "<iri>"},
                         {"@value": "lex", "@type": "<datatype iri>"},
                         {"@value": "plain"}], ...}

Line-orientation is what makes this parseable at 100 TB with zero Python:
``spark.read.text`` splits files arbitrarily across executors, and the
whole parse is JVM codegen — ``from_json`` to ``map<string,string>``
captures each key's RAW JSON text (Spark's Jackson parser returns the
unparsed structure for string-typed fields), then the value arrays parse
with a second ``from_json``. No state, no shuffle, scan-speed.

Normalizations (documented, mirroring the N-Triples source):
- plain ``@value`` parses with ``o_datatype = xsd:string`` (same term);
- bnode objects ``{"@id": "_:b"}`` land as ``o_kind='bnode'`` with the
  bare label (the store's object convention);
- non-string ``@value`` tokens from foreign docs (numbers, booleans)
  are captured as their lexical text with no datatype — i.e. treated as
  plain literals;
- lines that fail the grammar are dropped here and surfaced by
  :func:`jsonld_errors` (quarantine-not-crash, like the YAML ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_NODE_T = "map<string,string>"
_VALS_T = "array<struct<`@id` string, `@value` string, `@type` string>>"


def parse_jsonld_lines(lines: DataFrame, col: str = "value",
                       file: str = "jsonld",
                       graph: str = "kg") -> DataFrame:
    """Parse a string column of flattened-JSON-LD node lines into the wide
    triple schema (file, graph, s, p, o_kind, o, o_datatype). Pure
    codegen; malformed lines are dropped here (see jsonld_errors)."""
    node = (lines
            .select(F.from_json(F.col(col), _NODE_T).alias("m"))
            .filter(F.col("m").isNotNull()
                    & F.col("m").getItem("@id").isNotNull())
            .select(F.col("m").getItem("@id").alias("s"), "m"))

    def wide(df):
        return df.select(
            F.lit(file).alias("file"), F.lit(graph).alias("graph"),
            "s", "p", "o_kind", "o", "o_datatype")

    types = (node
             .select("s", F.explode(
                 F.from_json(F.col("m").getItem("@type"),
                             "array<string>")).alias("o"))
             .select("s", F.lit(RDF_TYPE).alias("p"),
                     F.lit("iri").alias("o_kind"), "o",
                     F.lit(None).cast("string").alias("o_datatype")))

    preds = (node
             .select("s", F.explode(
                 F.map_filter("m", lambda k, _:
                              ~k.isin("@id", "@type"))).alias("p", "raw"))
             .select("s", "p", F.explode(
                 F.from_json("raw", _VALS_T)).alias("v"))
             .filter(F.col("v.@id").isNotNull()
                     | F.col("v.@value").isNotNull()))
    vid = F.col("v.@id")
    objs = preds.select(
        "s", "p",
        F.when(vid.isNotNull() & vid.startswith("_:"), F.lit("bnode"))
        .when(vid.isNotNull(), F.lit("iri"))
        .otherwise(F.lit("literal")).alias("o_kind"),
        F.when(vid.isNotNull() & vid.startswith("_:"),
               F.substring(vid, 3, 2147483647))
        .when(vid.isNotNull(), vid)
        .otherwise(F.col("v.@value")).alias("o"),
        F.when(vid.isNotNull(), F.lit(None).cast("string"))
        .otherwise(F.coalesce(F.col("v.@type"), F.lit(XSD_STRING)))
        .alias("o_datatype"))

    return wide(types).unionByName(wide(objs))


def read_jsonld(spark: SparkSession, path: str, file: str = "jsonld",
                graph: str = "kg") -> DataFrame:
    """Read a directory/file of line-delimited flattened JSON-LD into the
    wide triple schema."""
    return parse_jsonld_lines(spark.read.text(path), file=file,
                              graph=graph)


def jsonld_errors(lines: DataFrame, col: str = "value") -> DataFrame:
    """Lines that fail the node grammar (unparseable JSON, or no ``@id``)
    — the quarantine view; blank lines are not errors."""
    m = F.from_json(F.col(col), _NODE_T)
    return (lines
            .filter(F.length(F.trim(F.col(col))) > 0)
            .filter(m.isNull() | m.getItem("@id").isNull())
            .select(F.col(col).alias("line")))
