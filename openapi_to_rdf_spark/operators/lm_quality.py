"""Character n-gram language-model perplexity scoring (CCNet-style quality
filtering).

The CCNet / RedPajama / Dolma pipelines score every document with a small
language model trained on a trusted corpus and keep/bucket documents by
perplexity. This module is that operator, Spark-first:

- ``train_char_lm`` is ONE linear scan -> explode -> groupBy over character
  n-grams of the LM-normalized text ([a-z0-9 ] alphabet). Over that 37-char
  alphabet the trigram vocabulary is bounded by 37^3 = 50,653 rows no matter
  the corpus size, so the trained model is always broadcastable.
- ``lm_perplexity`` scores a (possibly different) corpus: explode grams,
  TWO BROADCAST joins (gram counts + context counts — both tiny), one
  linear groupBy(doc_id). No sort, no wide shuffle: at 100 TB this is a
  single scan with map-side partial aggregation on the doc key.

Probability model: add-alpha smoothed conditional
``p(g) = (c(g) + alpha) / (C(ctx(g)) + alpha * V)`` where ``ctx`` is the
(n-1)-char prefix, ``C`` sums trigram counts by prefix (self-consistent with
the gram table), and ``V = 37`` (alphabet size incl. space). Unseen grams in
an unseen context back off to the uniform 1/V.

Everything is pyspark.sql.functions (JVM codegen) — no Python in the hot
path — and has an exact DuckDB twin in ``__spark_entry__.py`` (query
``lm_perplexity``).

Reference parity note: the reference (EricssonResearch/openapi-to-rdf) has no
quality-scoring stage; this is part of the mandated training-data-pipeline
surface, following the published CCNet design (Wenzek et al., 2020).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_ngrams_all

# |{a-z}| + |{0-9}| + space — the closed alphabet lm_normalized maps into.
ALPHABET_SIZE = 37


def train_char_lm(docs: DataFrame, text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Count character n-grams over the LM-normalized corpus.

    Returns ``(gram string, ctx string, n_gram long)`` — at most
    ALPHABET_SIZE**n rows, broadcastable at any corpus size. ``ctx`` is the
    (n-1)-char prefix used as the conditioning context.
    """
    return (docs
            .select(F.explode(char_ngrams_all(F.col(text_col), n))
                    .alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n_gram"))
            .withColumn("ctx", F.substring("gram", 1, n - 1)))


def lm_perplexity(docs: DataFrame, lm: DataFrame | None = None,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, alpha: float = 0.1) -> DataFrame:
    """Per-document char-LM perplexity.

    ``lm`` is a ``train_char_lm`` output (train on a TRUSTED corpus, score
    the target corpus — the CCNet pattern); if None, trains on ``docs``
    itself (self-perplexity, the repetition/garbage signal).

    Returns ``(id_col, n_grams long, nlp_e6 long, ppl_e6 long)`` — average
    negative log-likelihood per gram and its exp (perplexity), e6-fixed for
    cross-engine comparison. Documents with fewer than n normalized chars
    get ``n_grams = 0`` and NULL scores.
    """
    if lm is None:
        lm = train_char_lm(docs, text_col=text_col, n=n)
    ctx_counts = lm.groupBy("ctx").agg(F.sum("n_gram").alias("n_ctx"))

    grams = docs.select(
        F.col(id_col),
        F.explode(char_ngrams_all(F.col(text_col), n)).alias("gram"))
    scored = (grams
              .withColumn("ctx", F.substring("gram", 1, n - 1))
              .join(F.broadcast(lm.select("gram", "n_gram")), "gram", "left")
              .join(F.broadcast(ctx_counts), "ctx", "left")
              .withColumn("lp", F.log(
                  (F.coalesce(F.col("n_gram"), F.lit(0)) + F.lit(alpha))
                  / (F.coalesce(F.col("n_ctx"), F.lit(0))
                     + F.lit(alpha * ALPHABET_SIZE))))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.avg(-F.col("lp")).alias("nlp")))

    e6 = lambda c: F.round(c * 1e6).cast("long")  # noqa: E731
    return (docs.select(id_col)
            .join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    e6(F.col("nlp")).alias("nlp_e6"),
                    e6(F.exp("nlp")).alias("ppl_e6")))


def perplexity_filter(docs: DataFrame, lm: DataFrame,
                      max_ppl: float, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      alpha: float = 0.1) -> DataFrame:
    """Keep documents whose LM perplexity is at most ``max_ppl`` (docs too
    short to score are kept — no evidence against them). Returns the input
    rows + a ``ppl_e6`` column."""
    scores = lm_perplexity(docs, lm, id_col=id_col, text_col=text_col,
                           n=n, alpha=alpha)
    return (docs.join(scores.select(id_col, "ppl_e6"), id_col)
            .filter(F.col("ppl_e6").isNull()
                    | (F.col("ppl_e6") <= max_ppl * 1e6)))


# --------------------------------------------------------------------------
# Gopher rule-based quality filter (Rae et al. 2021, MassiveText, Table A1)
# --------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", *,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_word_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """The Gopher/MassiveText rule-based document filter as ONE projection:
    per-doc signals + a composite ``gopher_pass`` flag.

    Signals (defaults are the published MassiveText thresholds):

    - ``n_words`` in [min_words, max_words] and ``mean_word_len`` in
      [min_mean_word_len, max_mean_word_len];
    - ``symbol_word_ratio`` (occurrences of '#' or '...' per word) ≤ max;
    - ``bullet_frac`` / ``ellipsis_frac`` — fraction of non-empty lines
      starting with a bullet / ending with an ellipsis — ≤ max;
    - ``alpha_word_frac`` — fraction of words containing a [A-Za-z]
      character — ≥ min;
    - ``stop_hits`` — how many of the 8 MassiveText stopwords appear — ≥
      min (the "is this prose at all" test).

    Scale design: every signal is a higher-order array expression over the
    in-row token/line arrays (filter/transform/aggregate) — whole-stage
    codegen, zero shuffles, zero Python; the filter is embarrassingly
    parallel at any corpus size and composes with the WITHIN-doc
    repetition signals (operators/dedup.doc_repetition) and the LM score
    (lm_perplexity above) for the full Gopher §A1.1 battery. Every
    expression has an exact DuckDB twin (driver query ``doc_gopher``).
    Within-doc dup-line/top-n-gram rules live in doc_repetition; combine
    with a join on ``id_col`` when the complete rule set is wanted.
    """
    c = F.col(text_col)
    words = F.filter(F.split(F.lower(c), r"\s+"), lambda w: w != "")
    lines = F.filter(F.split(c, "\n"), lambda ln: F.trim(ln) != "")
    n_words = F.size(words)
    n_lines = F.size(lines)
    sum_word_len = F.aggregate(words, F.lit(0).cast("long"),
                               lambda acc, w: acc + F.length(w))
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ell = ((F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit(""))))
             / 3).cast("long")
    n_bullet = F.size(F.filter(
        lines, lambda ln: ln.rlike(r"^\s*[-*•]")))
    n_ell_lines = F.size(F.filter(
        lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    stop_hits = None
    for sw in GOPHER_STOPWORDS:
        hit = F.array_contains(words, sw).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    out = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        ratio(sum_word_len, n_words).alias("mean_word_len"),
        ratio(n_hash + n_ell, n_words).alias("symbol_word_ratio"),
        ratio(n_bullet, n_lines).alias("bullet_frac"),
        ratio(n_ell_lines, n_lines).alias("ellipsis_frac"),
        ratio(n_alpha, n_words).alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_hits"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stop_hits") >= min_stop_hits))


def compression_ratio(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      level: int = 6) -> DataFrame:
    """DEFLATE compression ratio per document — the CCNet/MassiveText
    quality signal the statistical filters can't fake: highly repetitive
    or templated text compresses far below prose (ratio ≈ compressed
    bytes / raw utf-8 bytes; lower = more redundant). Returns
    (id_col, raw_bytes, gz_bytes, ratio); NULL ratio for empty text.

    Execution: an Arrow-batched pandas UDF (zlib is CPU-bound C code per
    row inside the batch — the same honest profile as the multimodal
    decoders; there is no JVM-side DEFLATE expression). Deterministic
    for a fixed zlib version and level, embarrassingly parallel, zero
    shuffles. This is the documented exception to the codegen-only rule,
    kept OUT of extraction/validation hot paths."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _gz_bytes(s):  # pd.Series -> pd.Series (scalar pandas UDF)
        import zlib

        return s.map(lambda t: len(zlib.compress(t.encode("utf-8"), level))
                     if isinstance(t, str) else None)

    raw = F.octet_length(F.col(text_col))
    return (docs.select(id_col,
                        raw.cast("long").alias("raw_bytes"),
                        _gz_bytes(F.col(text_col)).alias("gz_bytes"))
            .withColumn("ratio",
                        F.when(F.col("raw_bytes") > 0,
                               F.col("gz_bytes")
                               / F.col("raw_bytes"))))
