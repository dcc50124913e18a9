"""KG-to-text verbalization — the INVERSE of the extraction stage:
render (subj, pred, obj) triples and per-entity neighborhoods as
natural-language strings, the synthetic-data generator that turns a
knowledge graph back into pretraining/SFT text (KELM-style corpus
construction, Agarwal et al. 2021).

Reference scope note: no counterpart in the reference CLI; this is
engine surface for the training-data pipeline mandate — the KG the
pipeline builds becomes prompt/corpus material.

Everything is codegen string algebra: a vocabulary-sized template table
broadcast onto the triple corpus (one join, no shuffle beyond it), and
entity cards as one groupBy(entity) with an order-pinned sorted fold —
the render_conversations discipline, deterministic under any
partitioning. No Python, no floats; both engines produce byte-identical
strings, so the oracles are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_TEMPLATE = "{s} has {p} {o}."


def _label(col: F.Column) -> F.Column:
    """Human label of a term: the part after the last '#' or '/', with
    underscores/dashes spaced — pure regexp codegen."""
    local = F.element_at(F.split(col, "[#/]"), -1)
    return F.regexp_replace(local, "[_-]+", " ")


def _tokenize(pattern: str) -> list[str]:
    """Split a template ONCE at build time into literal segments and
    placeholder markers (\\x00s/\\x00p/\\x00o). Single-pass expansion:
    literal segments are emitted verbatim and substituted labels are
    never rescanned, so a label that itself contains '{o}' survives
    as-is (ADVICE r2: sequential F.replace re-substituted it)."""
    import re

    return [("\x00" + part[1]) if re.fullmatch(r"\{[spo]\}", part) else part
            for part in re.split(r"(\{[spo]\})", pattern) if part]


def verbalize_triples(triples: DataFrame,
                      templates: dict[str, str] | None = None) -> DataFrame:
    """(s, p, o, text): one sentence per distinct triple. ``templates``
    maps predicate -> pattern with {s}/{p}/{o} placeholders; unmapped
    predicates fall back to DEFAULT_TEMPLATE. The template table is
    vocabulary-sized -> broadcast join carrying the pre-tokenized
    segment array; rendering is one fold over the segments (JVM
    aggregate + concat — still a single codegen projection)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    spark = triples.sparkSession
    t = triples.select("s", "p", "o").dropDuplicates()
    rows = [(p, _tokenize(pat)) for p, pat in (templates or {}).items()]
    schema = StructType([StructField("p", StringType()),
                         StructField("toks", ArrayType(StringType()))])
    tpl = spark.createDataFrame(rows or [("", [])], schema)
    if not rows:
        tpl = tpl.limit(0)
    default_toks = F.array(*[F.lit(x) for x in _tokenize(DEFAULT_TEMPLATE)])
    t = (t.join(F.broadcast(tpl), "p", "left")
         .withColumn("toks", F.coalesce(F.col("toks"), default_toks)))
    s_lab, p_lab, o_lab = (_label(F.col(c)) for c in ("s", "p", "o"))
    text = F.aggregate(
        F.col("toks"), F.lit(""),
        lambda acc, tok: F.concat(
            acc,
            F.when(tok == "\x00s", s_lab)
            .when(tok == "\x00p", p_lab)
            .when(tok == "\x00o", o_lab)
            .otherwise(tok)))
    return t.select("s", "p", "o", text.alias("text"))


def entity_cards(triples: DataFrame, max_facts: int = 8,
                 templates: dict[str, str] | None = None) -> DataFrame:
    """(ent, n_facts, card): one newline-joined text block per subject
    entity — its verbalized facts in (p, o) lexicographic order,
    truncated to max_facts — the RAG context card / SFT knowledge
    snippet. One groupBy with an array_sort+slice fold: deterministic
    under any partitioning, no window needed."""
    v = verbalize_triples(triples, templates)
    return (v.groupBy(F.col("s").alias("ent"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_facts"),
                 F.array_join(
                     F.slice(
                         F.transform(
                             F.array_sort(F.collect_list(
                                 F.struct("p", "o", "text"))),
                             lambda x: x.text),
                         1, max_facts),
                     "\n").alias("card")))
