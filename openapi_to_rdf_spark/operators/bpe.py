"""BPE merge-rule training over a document corpus (Sennrich et al.
2016) — the tokenizer-construction step of a training-data pipeline,
done Spark-first.

Structure (and why it scales):

1. ONE pass over the 100 TB corpus: whitespace tokenize → explode →
   groupBy(word).sum — the only stage that touches the raw text. Its
   output is the WORD FREQUENCY TABLE, bounded by vocabulary size
   (10^6-10^8 rows even web-scale), which is what every subsequent
   round runs on. This is the standard map-reduce BPE formulation
   (word-counts once, merges on the counts), not the naive
   re-scan-the-corpus-per-merge loop.
2. Each merge round on the freq table: adjacent-pair counts
   (posexplode + groupBy, weighted by word frequency), a TakeOrdered(1)
   argmax with a deterministic tie-break (count desc, pair lexicographic)
   — the only driver-visible value per round — then the winning pair is
   folded into every word's symbol array JVM-side (`F.aggregate`
   left-to-right, exactly BPE's non-overlapping greedy merge; no Python
   in the loop). `localCheckpoint` per round keeps the plan flat across
   rounds (the growing-lineage lesson from the CC loop).

The per-round driver sync is inherent to BPE (merge i+1's counts depend
on merge i's rewrite; trainers that batch disjoint merges per round
trade exactness for rounds — this one reproduces reference BPE exactly,
verified against a pure-Python implementation in tests/test_bpe.py). Driver query
``bpe_merges`` is rows-only: the iterative argmax is not
ANSI-SQL-expressible (the python-reference equality test is the
correctness evidence, same pattern as the LSH operators).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the single corpus-wide pass."""
    return (docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))


def _merge_step(words: DataFrame, a: str, b: str) -> DataFrame:
    """Fold (a, b) -> a+b left-to-right through every symbol array —
    BPE's greedy non-overlapping merge, all JVM."""
    merged = F.lit(a + b)
    return words.withColumn(
        "syms",
        F.aggregate(
            "syms",
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(merged)),
            ).otherwise(F.concat(acc, F.array(x)))))


def train_bpe(docs: DataFrame, n_merges: int, *,
              text_col: str = "text") -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules; returns them in order as
    (left, right, weighted_count). Symbols start as characters; merges
    operate on the word-frequency table only."""
    words = (word_freqs(docs, text_col=text_col)
             .select(F.split(F.col("word"), "").alias("syms"), "freq")
             .localCheckpoint())
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (words
                 .select("freq", "syms",
                         F.posexplode("syms").alias("i", "a"))
                 # element_at is 1-indexed, posexplode 0-indexed →
                 # (pos i, pos i+1) is (a, element_at(i+2))
                 .withColumn("b", F.try_element_at(
                     F.col("syms"), F.col("i") + 2))
                 .filter(F.col("b").isNotNull())
                 .groupBy("a", "b").agg(F.sum("freq").alias("n")))
        best = (pairs.orderBy(F.col("n").desc(), "a", "b").limit(1)
                .collect())
        if not best:
            break
        row = best[0]
        rules.append((row.a, row.b, row.n))
        words = _merge_step(words, row.a, row.b).localCheckpoint()
    return rules


def bpe_merge_table(spark, docs: DataFrame, n_merges: int, *,
                    text_col: str = "text") -> DataFrame:
    """The learned rules as (rank, left, right, merged, weight) — the
    DataFrame form the driver query returns."""
    rules = train_bpe(docs, n_merges, text_col=text_col)
    return spark.createDataFrame(
        [(i + 1, a, b, a + b, int(n)) for i, (a, b, n) in enumerate(rules)],
        ["rank", "left", "right", "merged", "weight"])


def bpe_encode(docs: DataFrame, rules: list[tuple], *, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Apply trained merge rules -> (doc_id, pieces array<string>).

    The corpus is NEVER encoded row by row: tokens explode once, the
    DISTINCT word vocabulary (Zipf: orders of magnitude smaller than the
    corpus) is encoded exactly once by an Arrow-batched pandas UDF, and the
    pieces join back to the positional token stream (word-level caching —
    the same trick tokenizer libraries use, here as a dataflow). Encoding
    replays the trainer's exact discipline — each rule folded left-to-right
    in rank order — so encoding the training corpus reproduces the
    trainer's final symbol table (asserted in tests). A rule can only fire
    if its merged string is a substring of the word (pieces are contiguous
    substrings), which prunes the 10^4-rule loop to the handful relevant
    per word.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ordered = [(a, b, a + b) for a, b, *_ in rules]

    @pandas_udf(ArrayType(StringType()))
    def enc(words: pd.Series) -> pd.Series:
        out = []
        for w in words:
            syms = list(w)
            for a, b, ab in ordered:
                if len(syms) < 2:
                    break
                if ab not in w:
                    continue
                new = []
                for s in syms:
                    if new and new[-1] == a and s == b:
                        new[-1] = ab
                    else:
                        new.append(s)
                syms = new
            out.append(syms)
        return pd.Series(out)

    toks = docs.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"))
    vocab = toks.select("word").distinct().withColumn("pieces", enc("word"))
    return (toks.join(vocab, "word")
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list(F.struct("pos", "pieces")))
                 .alias("_sp"))
            .select(id_col,
                    F.flatten(F.col("_sp").getField("pieces")).alias("pieces")))


def piece_frequencies(docs: DataFrame, rules: list[tuple], *,
                      text_col: str = "text") -> DataFrame:
    """(piece, n_occurrences) corpus-wide under the trained tokenizer —
    the vocabulary-coverage report (and the driver-query surface for
    bpe_encode; deterministic given docs + rules)."""
    enc = bpe_encode(docs, rules, text_col=text_col)
    return (enc.select(F.explode("pieces").alias("piece"))
            .groupBy("piece").agg(F.count(F.lit(1)).alias("n_occurrences")))
