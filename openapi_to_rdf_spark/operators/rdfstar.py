"""Statement-level metadata (provenance, confidence, source attribution)
over the triple table — the RDF-star / reification layer of the triple
factory.

Every serious extraction pipeline needs to say things ABOUT statements:
which file/turn produced this triple, with what linker confidence, when.
RDF-star writes that as annotations on quoted triples; classic RDF uses
reification quads. Both need a stable identity per statement, and at
10^12 triples that identity must be computable WITHOUT coordination:
``statement_id`` is a skolem IRI from the md5 of the (s, p, o) content —
deterministic under any partitioning, identical across engines and runs
(the same content-address idea as canonicalization's entity hashing),
and join-free to mint.

The reified output is ordinary (s, p, o) rows, so the whole SPARQL/BGP
surface queries statement metadata with no new machinery: e.g. "mentions
extracted below confidence 0.3" is one BGP over the annotation graph
joined to rdf:subject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
STMT_NS = "urn:stmt:"


def statement_id(s=None, p=None, o=None, stmt_ns: str = STMT_NS) -> F.Column:
    """Content-addressed skolem IRI for a triple: ``urn:stmt:<md5>``."""
    s = F.col("s") if s is None else s
    p = F.col("p") if p is None else p
    o = F.col("o") if o is None else o
    return F.concat(F.lit(stmt_ns),
                    F.md5(F.concat_ws("\x01", s, p, o)))


def reify(triples: DataFrame, stmt_ns: str = STMT_NS) -> DataFrame:
    """(s, p, o) -> four reification rows per DISTINCT triple:

        <stmt> rdf:type rdf:Statement ;
               rdf:subject <s> ; rdf:predicate <p> ; rdf:object <o> .

    One projection + explode over the deduped input; no joins."""
    stmt = statement_id(stmt_ns=stmt_ns)

    def t(p, o):
        return F.struct(F.col("stmt").alias("s"), F.lit(p).alias("p"),
                        o.alias("o"))

    return (triples.select("s", "p", "o").dropDuplicates()
            .withColumn("stmt", stmt)
            .select(F.explode(F.array(
                t(RDF + "type", F.lit(RDF + "Statement")),
                t(RDF + "subject", F.col("s")),
                t(RDF + "predicate", F.col("p")),
                t(RDF + "object", F.col("o")),
            )).alias("r"))
            .select("r.s", "r.p", "r.o"))


def annotate(triples: DataFrame, props: dict[str, str],
             stmt_ns: str = STMT_NS) -> DataFrame:
    """Annotation triples from EXTRA COLUMNS of a triples frame:
    ``props`` maps column name -> annotation predicate IRI; each non-null
    value becomes ``<stmt> <pred> <value>``. The statement id is minted
    from (s, p, o) content, so annotations attach to the same skolem the
    reified (or RDF-star-serialized) graph carries, with no join between
    the two emissions."""
    stmt = statement_id(stmt_ns=stmt_ns)
    entries = [F.when(F.col(c).isNotNull(),
                      F.struct(F.col("stmt").alias("s"),
                               F.lit(pred).alias("p"),
                               F.col(c).cast("string").alias("o")))
               for c, pred in props.items()]
    return (triples.select("s", "p", "o", *props.keys()).dropDuplicates()
            .withColumn("stmt", stmt)
            .select(F.explode(F.array(*entries)).alias("r"))
            .filter(F.col("r").isNotNull())
            .select("r.s", "r.p", "r.o"))
