"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, arXiv:2302.03169) over hashed word n-grams: select raw documents
whose n-gram distribution looks like a small TARGET corpus, by importance
weights from a bucketed bag-of-ngrams model and Gumbel-top-k resampling.

Method (all public):
- featurize each document as counts over ``n_buckets`` hash buckets of
  its word unigrams + bigrams (with multiplicity);
- fit target and raw bucket distributions with Laplace +1 smoothing;
- per raw document, log importance weight
  ``log w(x) = sum_b c_b(x) * ln(p_target(b) / p_raw(b))``;
- resample without replacement by ranking ``log w(x) + Gumbel(u_x)``
  where ``u_x`` is a content-hash uniform (derandomized, like every
  sampler in operators/sampling.py).

Scale design (the reason DSIR beats classifier scoring at 10^12 docs):
- The fitted model is TWO ``n_buckets``-row tables — vocabulary-sized by
  construction, broadcast to the scoring scan; the raw corpus is touched
  once to fit and once to score, both as explode + (doc, bucket) groupBy
  on keys the engine shuffles well.
- Everything is engine-portable codegen: md5-derived bucket ids, ONE
  ``ln`` per bucket taken on a ratio of exact integer products (all
  < 2^53, so the doubles agree bit-for-bit across engines), e6-rounded
  per-doc sums. No Python anywhere.
- Gumbel-top-k compiles to TakeOrderedAndProject (per-partition heaps +
  a k-row driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openapi_to_rdf_spark.functions.text import word_ngrams_all
from openapi_to_rdf_spark.operators.sampling import hash_fraction


def ngram_buckets(col: Column, n_buckets: int = 4096,
                  bigrams: bool = True) -> Column:
    """Hashed n-gram feature stream: array<long> of bucket ids (WITH
    multiplicity) for the word unigrams (+bigrams) of the normalized
    text. Bucket id = uint32(md5 prefix) mod n_buckets — the same
    engine-portable uniform hash as sampling.hash_fraction."""
    grams = word_ngrams_all(col, 1)
    if bigrams:
        grams = F.concat(grams, word_ngrams_all(col, 2))
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
        .cast("long") % n_buckets)


def bucket_counts(docs: DataFrame, text_col: str = "text",
                  n_buckets: int = 4096, bigrams: bool = True) -> DataFrame:
    """Corpus bucket histogram: (bucket, cnt) over every n-gram occurrence.
    At most ``n_buckets`` rows — a broadcastable model whatever the corpus
    size (that boundedness is DSIR's entire scale story)."""
    return (docs
            .select(F.explode(ngram_buckets(F.col(text_col), n_buckets,
                                            bigrams)).alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def _ratio_table(raw_dist: DataFrame, tgt_dist: DataFrame,
                 n_buckets: int) -> DataFrame:
    """Per-bucket log p_target/p_raw with Laplace +1 smoothing:
    ln(((ct+1) * (Nr+B)) / ((cr+1) * (Nt+B))) — a SINGLE ln of a ratio of
    exact integer products (each < 2^53), so both engines compute the
    identical double. Buckets absent from BOTH corpora are irrelevant
    (no document can contain them — the raw distribution is fitted on
    the very corpus being scored)."""
    r = raw_dist.select(F.col("bucket"), F.col("cnt").alias("cr"))
    t = tgt_dist.select(F.col("bucket").alias("tb"), F.col("cnt").alias("ct"))
    totals_r = raw_dist.agg(F.sum("cnt").cast("long").alias("n_raw"))
    totals_t = tgt_dist.agg(F.sum("cnt").cast("long").alias("n_tgt"))
    joined = (r.join(t, r.bucket == t.tb, "full_outer")
              .select(F.coalesce(F.col("bucket"), F.col("tb")).alias("bucket"),
                      F.coalesce(F.col("cr"), F.lit(0)).alias("cr"),
                      F.coalesce(F.col("ct"), F.lit(0)).alias("ct"))
              .crossJoin(F.broadcast(totals_r))
              .crossJoin(F.broadcast(totals_t)))
    num = (F.col("ct") + 1) * (F.col("n_raw") + F.lit(n_buckets))
    den = (F.col("cr") + 1) * (F.col("n_tgt") + F.lit(n_buckets))
    # e9-quantized so the per-doc weighted sum is INTEGER arithmetic:
    # summation order (Spark partial aggs vs DuckDB) can then never move
    # the e6 rounding of the final weight
    return joined.select(
        "bucket", "cr", "ct",
        F.round(F.log(num.cast("double") / den.cast("double")) * 1e9)
        .cast("long").alias("log_ratio_e9"))


def dsir_log_weights(raw: DataFrame, target: DataFrame, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     n_buckets: int = 4096,
                     bigrams: bool = True) -> DataFrame:
    """Per raw-document DSIR log importance weight, e6-scaled:
    (id_col, n_grams, log_w_e6). Documents whose normalized text has no
    n-grams score 0 (kept — zero evidence, not zero worth).

    Plan: two corpus histograms (bounded, broadcast), one exploded
    (doc, bucket) count, one broadcast join, one per-doc rollup."""
    raw_dist = bucket_counts(raw, text_col, n_buckets, bigrams)
    tgt_dist = bucket_counts(target, text_col, n_buckets, bigrams)
    ratios = _ratio_table(raw_dist, tgt_dist, n_buckets)

    per_doc_bucket = (raw
                      .select(F.col(id_col),
                              F.explode(ngram_buckets(F.col(text_col),
                                                      n_buckets, bigrams))
                              .alias("bucket"))
                      .groupBy(id_col, "bucket")
                      .agg(F.count(F.lit(1)).alias("c")))
    scored = (per_doc_bucket
              .join(F.broadcast(ratios.select("bucket", "log_ratio_e9")),
                    "bucket")
              .groupBy(id_col)
              .agg(F.sum("c").cast("long").alias("n_grams"),
                   F.round(F.sum(F.col("c") * F.col("log_ratio_e9"))
                           / 1000.0)
                   .cast("long").alias("log_w_e6")))
    return (raw.select(id_col).distinct()
            .join(scored, id_col, "left")
            .select(id_col,
                    F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
                    F.coalesce(F.col("log_w_e6"), F.lit(0))
                    .alias("log_w_e6")))


def dsir_sample(raw: DataFrame, target: DataFrame, k: int, *,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = 4096, bigrams: bool = True) -> DataFrame:
    """Gumbel-top-k importance resampling (the DSIR selection step),
    derandomized: rank ``log_w + Gumbel(u)`` with u = hash_fraction(id)
    and keep the top k. Gumbel noise = -ln(-ln(u)); u = 0 (md5 prefix
    00000000, p = 2^-32) yields -inf = never sampled, the same corner
    semantics as sampling.weighted_sample. The already-e6-rounded weight
    re-enters as log_w_e6 / 1e6 so both engines rank identical doubles.

    Output: (id_col, n_grams, log_w_e6, rank)."""
    lw = dsir_log_weights(raw, target, id_col=id_col, text_col=text_col,
                          n_buckets=n_buckets, bigrams=bigrams)
    u = hash_fraction(F.col(id_col))
    key = F.col("log_w_e6") / 1e6 - F.log(-F.log(u))
    ranked = lw.orderBy(key.desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(key.desc(), F.col(id_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w))
