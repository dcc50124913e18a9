"""Greedy sequence packing: batch documents into fixed token-budget packs —
the step between curation and tokenization in an LLM training pipeline
(packing short documents into full-length training sequences).

Semantics (pinned exactly, and reproduced by the driver's DuckDB oracle
via a recursive CTE — ``doc_packing``):

- Packing runs WITHIN groups (``group_col``, e.g. language, split, or an
  explicit shard key) over documents in ascending ``id_col`` order.
- A document joins the current pack unless that would push the pack's
  token sum past ``budget``, in which case it opens a new pack.
- A single document larger than the budget occupies its own pack (it must
  go somewhere; truncation is the tokenizer's decision, not the packer's).
- pack_id is 0-based per group; output is one row per document with its
  pack assignment — deterministic in (input, budget, ordering).

Scale design: greedy packing is inherently sequential *within* a group —
that is the algorithm, not an implementation artifact — so the GROUP is
the parallelism unit, exactly how production packers shard (pack within
each worker's shard; cross-shard packing buys nothing because packs don't
span shards anyway). The implementation is one ``applyInPandas`` per
group: Arrow ships (id, n_tokens) pairs — two narrow int columns, never
text — and the per-group pass is a single O(n) integer loop. For 10^12
documents, pick a group key with enough cardinality (e.g. split × hash
bucket) that groups fit an executor; the packer neither sorts globally
nor shuffles anything wider than the two columns it packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens


def pack_documents(docs: DataFrame, budget: int,
                   group_col: str = "lang", id_col: str = "doc_id",
                   tokens_col: str | None = None,
                   text_col: str = "text") -> DataFrame:
    """(group, doc_id, n_tokens, pack_id) per document; see module doc.

    ``tokens_col``: use a precomputed token-count column; default counts
    whitespace tokens of ``text_col`` (functions.text.token_count, the
    same definition the hash-verified doc_tokens query uses).
    """
    if tokens_col is None:
        base = docs.select(F.col(group_col).alias("grp"),
                           F.col(id_col).alias("id"),
                           token_count(F.col(text_col)).cast("long")
                           .alias("n_tokens"))
    else:
        base = docs.select(F.col(group_col).alias("grp"),
                           F.col(id_col).alias("id"),
                           F.col(tokens_col).cast("long").alias("n_tokens"))

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("id").reset_index(drop=True)
        toks = pdf["n_tokens"].to_numpy()
        pack_ids = []
        pack_id, cur = 0, 0
        for t in toks:
            if cur > 0 and cur + t > budget:
                pack_id += 1
                cur = 0
            cur += t
            pack_ids.append(pack_id)
        return pd.DataFrame({"grp": pdf["grp"], "id": pdf["id"],
                             "n_tokens": pdf["n_tokens"],
                             "pack_id": pack_ids})

    out = base.groupBy("grp").applyInPandas(
        pack, "grp string, id long, n_tokens long, pack_id long")
    return out.select(F.col("grp").alias(group_col),
                      F.col("id").alias(id_col), "n_tokens", "pack_id")


def assemble_packs(docs: DataFrame, budget: int,
                   group_col: str = "lang", id_col: str = "doc_id",
                   text_col: str = "text",
                   vocab_size: int = 32768) -> DataFrame:
    """Assemble each pack into an actual training sequence — one row per
    pack with the concatenated token-id array, per-token segment ids, and
    a content digest:

    - ``input_ids``:   hashed token ids (xxhash64 mod ``vocab_size`` — a
      deterministic stand-in for a real BPE vocab; swapping in a trained
      tokenizer changes only this lambda), documents concatenated in
      ascending ``id_col`` order;
    - ``segment_ids``: for token i, the 0-based index of its source
      document within the pack — what an attention mask / position-id
      reset consumes downstream;
    - ``n_docs`` / ``seq_len``;
    - ``content_sha``: md5 over the pack's texts joined with RS (0x1e) in
      id order — the SQL-expressible digest the driver's DuckDB oracle
      verifies (``pack_assembly``), proving assembly order and membership
      without shipping arrays through the hash gate.

    Scale design: the packer ships only (id, n_tokens) through Arrow
    (pack_documents); assembly then joins assignments back to the text
    ONCE (shuffle keyed by the pack — bounded by ``budget`` tokens per
    group) and builds the arrays entirely JVM-side: sort_array over
    (id, text) structs, then transform/flatten lambdas. No Python touches
    the text; each output row is <= budget tokens by construction (plus
    lone oversize docs, which get their own pack by packer semantics).
    """
    packed = pack_documents(docs, budget, group_col=group_col,
                            id_col=id_col, text_col=text_col)
    joined = packed.join(
        docs.select(F.col(group_col), F.col(id_col), F.col(text_col)),
        [group_col, id_col])
    per_pack = (joined.groupBy(group_col, "pack_id")
                .agg(F.array_sort(F.collect_list(F.struct(
                    F.col(id_col).alias("id"),
                    F.col(text_col).alias("text")))).alias("parts")))
    tok_ids = F.flatten(F.transform(
        "parts",
        lambda d: F.transform(
            tokens(d["text"]),
            lambda t: F.pmod(F.xxhash64(t), F.lit(vocab_size))
            .cast("int"))))
    seg_ids = F.flatten(F.transform(
        "parts",
        lambda d, i: F.transform(tokens(d["text"]),
                                 lambda _: i.cast("int"))))
    return per_pack.select(
        group_col, "pack_id",
        F.size("parts").alias("n_docs"),
        tok_ids.alias("input_ids"),
        seg_ids.alias("segment_ids"),
        F.size(tok_ids).alias("seq_len"),
        F.md5(F.array_join(F.transform("parts", lambda d: d["text"]),
                           "\x1e")).alias("content_sha"))


def pack_stats(packed: DataFrame, budget: int,
               group_col: str = "lang") -> DataFrame:
    """Packing efficiency per group: packs, fill rate, oversize count —
    the numbers a training-data pipeline monitors per shard."""
    per_pack = (packed.groupBy(group_col, "pack_id")
                .agg(F.sum("n_tokens").alias("pack_tokens"),
                     F.count(F.lit(1)).alias("n_docs")))
    return (per_pack.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_packs"),
                 F.sum("n_docs").alias("n_docs"),
                 F.round(F.avg("pack_tokens") / budget, 6).alias("fill_rate"),
                 F.sum(F.when(F.col("pack_tokens") > budget, 1).otherwise(0))
                 .alias("n_oversize")))


def context_windows(df: DataFrame, k: int, part_col: str,
                    order_cols: list[str], line_col, target_col) -> DataFrame:
    """Sliding-context assembly: for every row, join the previous ``k``
    rows' ``line_col`` renderings (in ``order_cols`` order within
    ``part_col``) into a ``context`` string, with the row's own
    ``target_col`` as the training target — the transcript→SFT-example
    step of an LLM data pipeline.

    One window pass per partition (bounded by conversation length — no
    shuffle beyond the partitionBy). The frame rows are collected as
    (order-cols, line) structs and array_sort'ed, so context order is a
    deterministic property of the data, not of collect_list's iteration
    order; null lines are kept as empty strings (array_join would
    silently DROP null elements).

    Output: input columns + (n_context, context, target).
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(part_col)
         .orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(-k, -1))
    item = F.struct(
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.coalesce(line_col.cast("string"), F.lit("")).alias("_line"))
    ctx = F.array_sort(F.collect_list(item).over(w))
    return (df.withColumn("_ctx", ctx)
            .withColumn("n_context", F.size("_ctx").cast("long"))
            .withColumn("context", F.array_join(
                F.transform(F.col("_ctx"), lambda s: s["_line"]), "\n"))
            .withColumn("target", target_col.cast("string"))
            .drop("_ctx"))


def sft_pairs(turns: DataFrame, k: int = 4,
              target_role: str = "assistant") -> DataFrame:
    """(context, target) training pairs from multi-turn transcripts: each
    ``target_role`` turn becomes one example whose context is the previous
    ``k`` turns rendered as "role: text" lines. Turns with no preceding
    context are dropped (nothing to condition on)."""
    line = F.concat_ws(": ", F.coalesce(F.col("role"), F.lit("")),
                       F.coalesce(F.col("text"), F.lit("")))
    out = context_windows(turns, k, "conv_id", ["turn_idx"], line,
                          F.col("text"))
    return (out.filter((F.col("role") == target_role)
                       & (F.col("n_context") >= 1))
            .select("conv_id", "turn_idx", "n_context", "context", "target"))


def chunk_documents(docs: DataFrame, chunk: int, overlap: int = 0,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-size overlapping word chunks — the
    RAG-index / long-context training-data assembly step (each chunk is
    one retrieval unit or one training row).

    Semantics (pinned exactly; DuckDB twin is driver query ``doc_chunks``):
    chunk ``i`` covers words ``[i*step, i*step + chunk)`` with ``step =
    chunk - overlap``; a document emits ``1`` chunk if it has ≤ ``chunk``
    words, else ``ceil((n - chunk)/step) + 1`` — full coverage, every
    chunk start < n, last chunk possibly short. Zero-word documents emit
    one empty chunk (the caller decides whether to drop them; silently
    losing rows is worse).

    Scale design: the whole operator is ONE narrow projection —
    split/filter into an in-row word array, explode a per-row index
    sequence, slice — no shuffle, no Python, embarrassingly parallel.
    The word array is projected BELOW the explode, and the Generate
    boundary stops CollapseProject from re-inlining the split into each
    downstream reference (asserted in tests/test_packing.py: one
    ``split(`` in the optimized plan) — the expression-explosion trap
    functions/text.word_ngrams documents.
    """
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got {overlap=} {chunk=}")
    step = chunk - overlap
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = docs.select(F.col(id_col), words.alias("w"))
    n = F.size(F.col("w"))
    k = (F.when(n <= chunk, F.lit(1))
         .otherwise(F.ceil((n - F.lit(chunk)) / F.lit(step)) + 1)
         .cast("int"))
    sliced = F.slice(F.col("w"), F.col("i") * step + 1, chunk)
    return (base.select(id_col, "w",
                        F.explode(F.sequence(F.lit(0), k - 1)).alias("i"))
            .select(F.col(id_col),
                    F.col("i").cast("int").alias("chunk_idx"),
                    F.array_join(sliced, " ").alias("chunk_text"),
                    F.size(sliced).cast("int").alias("n_tokens")))
