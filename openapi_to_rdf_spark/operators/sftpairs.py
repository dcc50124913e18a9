"""Conversation-to-training-example operators: the last mile of a
transcript pipeline, turning multi-turn conversations into SFT context/
response pairs, rendered chat texts, DPO-style preference pairs, and a
cross-conversation boilerplate-turn report.

All four are single-exchange designs on the conversation key (the same
partitioning extraction already uses), pure codegen, and engine-portable
— each has an exact DuckDB twin in the driver contract.

- context_response_pairs: one bounded window per conversation — the
  context is the previous <= max_context turns rendered "role: text",
  emitted once per target-role turn. No shuffle beyond the conv key.
- render_conversations: one groupBy(conv) with an ORDER-PINNED fold
  (sort_array over (idx, role, text) structs), the chat-template render.
- preference_pairs: responses grouped by an exact prompt key (md5 of the
  rendered context); chosen/rejected by max_by/min_by on a
  (score, tiebreak) struct — deterministic under any partitioning; a
  pair is emitted only when the score gap clears min_margin.
- boilerplate_turns: md5-keyed turn-text rollup counting conversations
  sharing the same turn verbatim (canned responses, templated refusals)
  — exact_dedup's turn-level sibling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def context_response_pairs(turns: DataFrame, target_role: str,
                           max_context: int = 8,
                           conv_col: str = "conv_id",
                           idx_col: str = "turn_idx",
                           role_col: str = "role",
                           text_col: str = "text") -> DataFrame:
    """(conv, idx, context, response) for every turn of ``target_role``:
    context = up to ``max_context`` preceding turns rendered
    "role: text" joined by newlines (empty string for a conversation
    opener). One window on the conversation key."""
    w = (Window.partitionBy(conv_col).orderBy(idx_col)
         .rowsBetween(-max_context, -1))
    line = F.concat(F.col(role_col), F.lit(": "), F.col(text_col))
    return (turns
            .withColumn("context",
                        F.concat_ws("\n", F.collect_list(line).over(w)))
            .withColumn("n_context",
                        F.count(F.lit(1)).over(w).cast("int"))
            .filter(F.col(role_col) == target_role)
            .select(F.col(conv_col).alias("conv_id"),
                    F.col(idx_col).alias("turn_idx"),
                    "context", "n_context",
                    F.col(text_col).alias("response")))


def render_conversations(turns: DataFrame,
                         conv_col: str = "conv_id",
                         idx_col: str = "turn_idx",
                         role_col: str = "role",
                         text_col: str = "text") -> DataFrame:
    """One rendered chat text per conversation: turns sorted by index,
    each "role: text", newline-joined — the chat-template render as ONE
    groupBy + a sorted-struct fold (no window, no Python)."""
    item = F.struct(F.col(idx_col).alias("i"),
                    F.concat(F.col(role_col), F.lit(": "),
                             F.col(text_col)).alias("line"))
    return (turns.groupBy(F.col(conv_col).alias("conv_id"))
            .agg(F.count(F.lit(1)).cast("int").alias("n_turns"),
                 F.concat_ws(
                     "\n",
                     F.transform(F.sort_array(F.collect_list(item)),
                                 lambda s: s.getField("line")))
                 .alias("rendered")))


def preference_pairs(pairs: DataFrame, score_col: str,
                     min_margin: int = 1,
                     context_col: str = "context",
                     response_col: str = "response",
                     id_cols: tuple[str, str] = ("conv_id", "turn_idx"),
                     ) -> DataFrame:
    """DPO-style preference pairs: responses sharing the SAME prompt
    (exact md5 of the context) pair best-vs-worst by score. Chosen and
    rejected resolve via max_by/min_by on a (score, conv, idx) struct,
    so ties break identically in any engine/partitioning; groups whose
    gap is below ``min_margin`` (or with a single response) emit
    nothing. Output: (prompt_key, context, chosen, rejected,
    chosen_score, rejected_score, n_candidates)."""
    c0, c1 = id_cols
    key = F.struct(F.col(score_col), F.col(c0), F.col(c1))
    g = (pairs
         .groupBy(F.md5(F.col(context_col)).alias("prompt_key"))
         .agg(F.min(F.col(context_col)).alias("context"),
              F.max_by(F.col(response_col), key).alias("chosen"),
              F.min_by(F.col(response_col), key).alias("rejected"),
              F.max(F.col(score_col)).alias("chosen_score"),
              F.min(F.col(score_col)).alias("rejected_score"),
              F.count(F.lit(1)).alias("n_candidates")))
    return g.filter(
        F.col("chosen_score") - F.col("rejected_score") >= min_margin)


def boilerplate_turns(turns: DataFrame, min_convs: int = 3,
                      conv_col: str = "conv_id",
                      role_col: str = "role",
                      text_col: str = "text") -> DataFrame:
    """Turn texts repeated verbatim across >= min_convs conversations —
    canned responses / templated refusals that SFT dedup should drop or
    downweight. One md5-keyed rollup; the sample turn text resolves by
    min so the report row is deterministic."""
    return (turns
            .select(F.md5(F.col(text_col)).alias("text_md5"),
                    F.col(conv_col).alias("conv"),
                    F.col(role_col).alias("role"),
                    F.col(text_col).alias("text"))
            .groupBy("text_md5")
            .agg(F.countDistinct("conv").alias("n_convs"),
                 F.count(F.lit(1)).alias("n_turns"),
                 F.min("role").alias("sample_role"),
                 F.min("text").alias("text"))
            .filter(F.col("n_convs") >= min_convs))
