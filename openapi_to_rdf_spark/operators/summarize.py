"""Extractive conversation summarization — the context-condensation
stage of a transcript training pipeline: pick each conversation's k most
salient turns by a deterministic INTEGER salience score and render them,
in original order, as a compact summary block (the cheap classical
baseline an LLM-summarization stage would replace; also the "context
stuffing" selector for SFT examples whose full history exceeds budget).

Salience is a sum of integer signals — opening-turn bonus, assistant
bonus, tool-call bonus, capped length prior — so scores, the top-k cut
(score DESC, turn_idx ASC) and the rendered text are all reproducible
bit-for-bit in any engine; no floats, no Python.

Scale shape: one window per conversation (the engine's standard
conv_id partitioning — bounded conversations, no skew) plus one
conv-keyed fold; both on the key transcript tables already shuffle on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def turn_salience(turns: DataFrame, length_cap: int = 50) -> DataFrame:
    """Input turns + an integer ``salience`` column:
    2000·[turn_idx = 0] + 1000·[role = assistant] + 500·[tool present]
    + 20·min(n_tokens, length_cap). Pure codegen projection."""
    toks = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    sal = (F.when(F.col("turn_idx") == 0, 2000).otherwise(0)
           + F.when(F.col("role") == "assistant", 1000).otherwise(0)
           + F.when(F.col("tool").isNotNull(), 500).otherwise(0)
           + F.least(toks, F.lit(length_cap)) * 20)
    return turns.withColumn("salience", sal.cast("long"))


def extractive_summary(turns: DataFrame, k: int = 3,
                       length_cap: int = 50) -> DataFrame:
    """(conv_id, n_kept, summary): the k most salient turns per
    conversation (ties broken by earlier turn_idx), re-assembled in
    ORIGINAL turn order as 'role: text' lines."""
    scored = turn_salience(turns, length_cap)
    w = Window.partitionBy("conv_id").orderBy(F.desc("salience"),
                                              F.col("turn_idx"))
    kept = (scored.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k))
    line = F.concat_ws(": ", F.col("role"), F.col("text"))
    return (kept.groupBy("conv_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.struct(F.col("turn_idx"),
                                      line.alias("line")))),
                         lambda x: x.line),
                     "\n").alias("summary")))
