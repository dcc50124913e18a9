"""Dialogue topic segmentation by lexical cohesion (TextTiling-style).

Long multi-turn conversations mix topics; KG construction and SFT-pair
assembly both want TOPIC-COHERENT spans (a mentions edge across a topic
boundary is weaker evidence; a training pair spanning one is noise). The
classic signal (Hearst's TextTiling) is a drop in lexical cohesion between
adjacent blocks — re-expressed here per turn pair:

  boundary(t) = 1  if turn t is the conversation's first turn, or
                   jaccard(tokens(t-1), tokens(t)) < threshold
  segment(t)  = running sum of boundaries - 1   (0-based per conversation)

Spark shape — one window pass, all JVM:

- tokenization is ``regexp_extract_all`` + ``array_distinct`` (codegen);
- the previous turn's token set arrives via ``lag`` over
  ``partitionBy(conv_id).orderBy(turn_idx)`` — the SAME single conv_id
  exchange every other per-conversation operator here uses (co-partition
  and it's exchange-free);
- the running segment index is a cumulative sum over the same window —
  no joins, no second shuffle, O(tokens-per-turn) state per row.

Token sets (not bags) make the measure length-robust; the Jaccard is
emitted 1e6-scaled for engine-portable comparison. No counterpart in the
reference (no dialogue handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def segment_turns(turns: DataFrame, threshold: float = 0.2,
                  text_col: str = "text") -> DataFrame:
    """turns (conv_id, turn_idx, text, ...) -> (conv_id, turn_idx, segment,
    jaccard_e6). ``segment`` is 0-based per conversation; ``jaccard_e6`` is
    the cohesion with the previous turn (null on each conversation's first
    turn)."""
    toks = F.array_distinct(
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")

    scored = (turns
              .select("conv_id", "turn_idx", toks.alias("_t"))
              .withColumn("_prev", F.lag("_t").over(w))
              .withColumn(
                  "_jac",
                  F.when(
                      F.col("_prev").isNotNull(),
                      F.size(F.array_intersect("_t", "_prev"))
                      / F.greatest(F.size(F.array_union("_t", "_prev")),
                                   F.lit(1)))))
    boundary = F.when(F.col("_prev").isNull()
                      | (F.col("_jac") < threshold), 1).otherwise(0)
    running = (Window.partitionBy("conv_id").orderBy("turn_idx")
               .rowsBetween(Window.unboundedPreceding, 0))
    return (scored
            .withColumn("segment",
                        (F.sum(boundary).over(running) - 1).cast("int"))
            .select("conv_id", "turn_idx", "segment",
                    F.round(F.col("_jac") * 1000000).cast("long")
                    .alias("jaccard_e6")))


def segment_stats(segmented: DataFrame) -> DataFrame:
    """(conv_id, segment) -> turn span + length; the table SFT-pair
    assembly and mentions-edge weighting consume."""
    return (segmented.groupBy("conv_id", "segment")
            .agg(F.min("turn_idx").alias("first_turn"),
                 F.max("turn_idx").alias("last_turn"),
                 F.count(F.lit(1)).alias("n_turns")))
