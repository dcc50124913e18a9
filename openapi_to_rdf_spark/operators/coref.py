"""Recency-based anaphora resolution over conversation turns.

Transcript KG construction loses every triple whose object is realized as a
pronoun ("restart it", "what about that one") — the mention detector
(operators.extract, MENTION_RE) only sees explicit ``Class#key`` surface
forms. This operator recovers those references with the classic recency
heuristic: a pronoun resolves to the MOST RECENT explicit entity mention in
any STRICTLY EARLIER turn of the same conversation (the dominant baseline
for dialogue anaphora; within-turn antecedents are deliberately excluded so
the rule is order-stable and SQL-checkable).

Spark shape — this is exactly one window pass:

- mention + pronoun detection are JVM ``regexp_extract_all`` / codegen
  (no Python in the data path);
- the antecedent is ``last(value, ignorenulls=True)`` over
  ``partitionBy(conv_id).orderBy(turn_idx).rowsBetween(unboundedPreceding,
  -1)`` — running-state window, O(1) memory per row, ONE shuffle on
  conv_id (conversations are small and numerous: no skew);
- no joins, no second pass. At 10^12 turns the cost is the conv_id
  exchange, which the extraction pipeline already pays — co-partition and
  this becomes exchange-free.

No counterpart in the reference (schema converter, no dialogue handling);
the output feeds the same kg#mentions predicate extraction emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .extract import KG_NS, MENTION_RE, TURN_NS

DEFAULT_PRONOUN_RE = r"\b(it|them|that one|this one)\b"


def resolve_anaphora(turns: DataFrame,
                     mention_pattern: str = MENTION_RE,
                     pronoun_pattern: str = DEFAULT_PRONOUN_RE) -> DataFrame:
    """turns (conv_id, turn_idx, text, ...) -> (conv_id, turn_idx, pronoun,
    antecedent) for every turn containing >=1 pronoun whose conversation has
    an explicit mention in an earlier turn.

    ``antecedent`` is the entity KEY (mention group 2) of the latest
    mention in the closest earlier mention-bearing turn; within that turn,
    the LAST mention wins (nearest to the pronoun in reading order).
    ``pronoun`` is the first pronoun surface in the turn (evidence column).
    """
    mentions = F.expr(
        f"regexp_extract_all(text, '{mention_pattern}', 2)")
    last_mention = F.when(F.size(mentions) > 0,
                          F.element_at(mentions, -1))
    pronoun = F.regexp_extract(F.col("text"), pronoun_pattern, 0)

    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    scored = (turns
              .select("conv_id", "turn_idx",
                      last_mention.alias("_m"),
                      pronoun.alias("pronoun"))
              .withColumn("antecedent",
                          F.last("_m", ignorenulls=True).over(w)))
    return (scored
            .filter((F.col("pronoun") != "")
                    & F.col("antecedent").isNotNull())
            .select("conv_id", "turn_idx", "pronoun", "antecedent"))


def coref_triples(resolved: DataFrame, ent_ns: str,
                  kg_ns: str = KG_NS, turn_ns: str = TURN_NS) -> DataFrame:
    """Resolution table -> kg#mentions triples (graph='kg_coref' so
    provenance distinguishes recovered references from explicit ones)."""
    return resolved.select(
        F.col("conv_id").alias("file"), F.lit("kg_coref").alias("graph"),
        F.concat(F.lit(turn_ns), F.col("conv_id"), F.lit("/"),
                 F.col("turn_idx").cast("string")).alias("s"),
        F.lit(kg_ns + "mentions").alias("p"),
        F.lit("iri").alias("o_kind"),
        F.concat(F.lit(ent_ns), F.col("antecedent")).alias("o"),
        F.lit(None).cast("string").alias("o_datatype"))
