"""Deterministic sampling & dataset-split operators for training data.

Random sampling is useless at 10^12 rows if it isn't reproducible across
reruns, engines, and partitionings — so these assign rows by a content hash
(md5 of the key), never by RNG state: the same row always lands in the same
split/sample regardless of cluster size, executor count, or engine
(ANSI-SQL-expressible, so the DuckDB oracle reproduces the exact rows).

hash_fraction(key) = first 8 hex chars of md5(key) as a uniform uint32 /
2^32 — stable, engine-portable, and fine-grained enough for per-mille
sampling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_fraction(key: Column) -> Column:
    """Uniform [0,1) fraction derived from md5(key) — deterministic and
    identical in any engine with md5 + hex parsing."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10) \
        .cast("double") / (2.0 ** 32)


def deterministic_sample(df: DataFrame, fraction: float, key_col: str) -> DataFrame:
    """Keep rows with hash_fraction(key) < fraction. Content-addressed: the
    sample is a stable subset — append-only growth never reshuffles it."""
    return df.filter(hash_fraction(F.col(key_col)) < fraction)


def group_sampling_rates(df: DataFrame, alpha: float = 0.3,
                         keep_frac: float = 0.5,
                         group_col: str = "lang") -> DataFrame:
    """Temperature-based (alpha) sampling rates per group — the
    multilingual rebalancing rule (exponentiated-count sampling as in
    mBERT/XLM-R data mixing): target share q_g ∝ n_g^alpha, so
    low-resource groups are up-weighted relative to their raw share.

    Pinned semantics (exact DuckDB oracle, ``temperature_sample``): with
    T = keep_frac × Σ n_g the target corpus size,

        rate_g = min(1, T × q_g / n_g)

    — the acceptance probability that realizes the q distribution, capped
    at 1 (a group too small to fill its target share keeps everything;
    the realized total then lands slightly under T, which is how the rule
    is applied in practice rather than re-normalizing iteratively).

    One narrow aggregation (groups are few) -> a broadcastable rate table.
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum(F.pow("n", F.lit(alpha))).alias("z"),
                     F.sum("n").alias("big_n"))
    return (counts.crossJoin(F.broadcast(tot))
            .select(F.col("grp").alias(group_col),
                    F.col("n").cast("long").alias("n"),
                    F.least(F.lit(1.0),
                            F.lit(keep_frac) * F.col("big_n")
                            * (F.pow("n", F.lit(alpha)) / F.col("z"))
                            / F.col("n")).alias("rate")))


def temperature_sample(df: DataFrame, alpha: float = 0.3,
                       keep_frac: float = 0.5, group_col: str = "lang",
                       key_col: str = "doc_id") -> DataFrame:
    """Deterministic alpha-sampled corpus: row kept iff
    hash_fraction(key) < rate_{group}. Content-addressed like every
    sampler here — stable across reruns, engines, partitionings; the rate
    table is broadcast (groups number in the dozens, the corpus doesn't
    shuffle)."""
    rates = F.broadcast(
        group_sampling_rates(df, alpha=alpha, keep_frac=keep_frac,
                             group_col=group_col).select(group_col, "rate"))
    return (df.join(rates, group_col)
            .filter(hash_fraction(F.col(key_col)) < F.col("rate"))
            .drop("rate"))


def stratified_sample(df: DataFrame, k: int, group_col: str = "lang",
                      key_col: str = "doc_id",
                      prefilter_margin: float | None = 8.0) -> DataFrame:
    """Exactly min(k, n_g) rows per group — the k rows with the smallest
    hash_fraction(key) (ties broken by key), so the sample is the same
    deterministic set in any engine, on any partitioning, and is a
    *prefix-stable* subset: growing k only adds rows, never swaps them.

    The naive plan — row_number() partitioned by group over the whole
    corpus — is a groupwise total sort: with dozens of language-sized
    groups at 10^12 rows, every 'en' row lands on one task. So by default
    a two-phase plan runs instead: (1) per-group counts (one narrow agg)
    give an acceptance rate margin*k/n_g; rows are prefiltered on
    hash < rate, leaving ~margin*k survivors per group; (2) the exact
    row_number top-k runs on that tiny survivor set. The top-k rows all
    have the k smallest hashes, which lie below the threshold whenever
    the group has >= k survivors — Chernoff: P(survivors < k) <=
    exp(-k(m-1)^2/(2m)), ~1e-13 per group at m=8, k=10 — and since the
    hash is content-derived the outcome is a deterministic property of
    the dataset (verified, not re-rolled per run): the equality test vs
    the pure-window path proves it for a given corpus once and for all.
    ``prefilter_margin=None`` forces the single-window plan (small data /
    paranoid callers).
    """
    h = hash_fraction(F.col(key_col))
    cand = df
    if prefilter_margin is not None:
        rates = (df.groupBy(group_col)
                 .agg(F.count(F.lit(1)).alias("_n"))
                 .select(group_col,
                         F.least(F.lit(1.0),
                                 F.lit(prefilter_margin * k) / F.col("_n"))
                         .alias("_rate")))
        cand = (df.join(F.broadcast(rates), group_col)
                .filter(h < F.col("_rate")).drop("_rate"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k).drop("_rn"))


def train_val_test_split(df: DataFrame, key_col: str,
                         val: float = 0.1, test: float = 0.1) -> DataFrame:
    """Adds a ``split`` column ∈ {train, val, test} by content hash. The
    same key always lands in the same split — the leakage-safe way to split
    when near-duplicate documents share a canonical key after dedup."""
    h = hash_fraction(F.col(key_col))
    return df.withColumn(
        "split",
        F.when(h < test, F.lit("test"))
        .when(h < test + val, F.lit("val"))
        .otherwise(F.lit("train")))


def weighted_sample(df: DataFrame, k: int, weight_col: str, key_col: str,
                    group_col: str | None = None) -> DataFrame:
    """Efraimidis–Spirakis (A-ES) weighted sampling WITHOUT replacement,
    derandomized: each row's uniform draw is ``hash_fraction(key)`` and
    the k rows with the largest ``u^(1/w)`` — equivalently the largest
    ``ln(u)/w``, computed that way to stay in a numerically tame range —
    are kept. Per the ES result this yields inclusion probabilities
    proportional to weight for sampling without replacement, but
    content-addressed: the same rows win on any engine, partitioning, or
    rerun. Rows with ``weight <= 0`` are excluded (zero weight means
    never sampled; ES is undefined there).

    Scale design: with ``group_col`` the ranking is one window per group
    (shuffle on the group key only); the global form is orderBy+limit,
    which Spark plans as TakeOrderedAndProject — per-partition top-k
    heaps + a k-row driver merge, never a global sort. The u = 0 corner
    (md5 prefix 00000000, p = 2^-32) maps to ln(0) = -inf = never
    sampled — consistent with the continuous formulation.

    Output: input columns + ``rank`` (1-based within the sample).
    """
    u = hash_fraction(F.col(key_col))
    es_key = F.log(u) / F.col(weight_col)
    eligible = df.filter(F.col(weight_col) > 0)
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(
            es_key.desc(), F.col(key_col).asc())
        return (eligible.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k))
    ranked = (eligible
              .orderBy(es_key.desc(), F.col(key_col).asc())
              .limit(k))
    w = Window.orderBy(es_key.desc(), F.col(key_col).asc())
    return ranked.withColumn("rank", F.row_number().over(w))


def mixture_sample(docs: DataFrame, targets: dict[str, float],
                   group_col: str = "source", key_col: str = "doc_id",
                   token_col: str | None = None) -> DataFrame:
    """Fixed-recipe corpus mixing (the Dolma/RedPajama "data recipe"
    step): given target RELATIVE shares per group, pick the LARGEST
    budget B for which every targeted group can supply ``B * share_g``
    tokens without upsampling — i.e. ``B = min_g(T_g / share_g)`` over
    the groups present — then keep each document with
    ``hash_fraction(key) < rate_g`` where ``rate_g = B*share_g/T_g``
    (the binding group gets rate 1.0 and survives whole). Shares need
    not sum to 1 (only ratios matter); groups missing from ``targets``
    are dropped; ``token_col=None`` mixes by document count instead of
    tokens.

    Sampled token mass per group ≈ B·share_g (exact in expectation;
    content-hash selection makes the realized subset deterministic and
    append-stable). Everything is relational — the budget travels as a
    broadcast one-row cross join, no driver collect — and engine-
    portable (exact DuckDB oracle: driver query ``mixture_sample``).
    """
    if not targets or any(v <= 0 for v in targets.values()):
        raise ValueError("targets must be a non-empty {group: share>0} map")
    spark = docs.sparkSession
    tok = F.col(token_col) if token_col else F.lit(1)
    tgt = F.broadcast(spark.createDataFrame(
        sorted(targets.items()), ["grp", "share"]))
    totals = (docs.select(F.col(group_col).alias("grp"), tok.alias("tk"))
              .groupBy("grp").agg(F.sum("tk").alias("t_g"))
              .join(tgt, "grp"))
    budget = F.broadcast(totals.agg(
        F.min(F.col("t_g") / F.col("share")).alias("budget")))
    rates = (totals.crossJoin(budget)
             .select("grp", (F.col("budget") * F.col("share")
                             / F.col("t_g")).alias("rate")))
    return (docs.join(F.broadcast(rates),
                      docs[group_col] == rates["grp"])
            .filter(hash_fraction(F.col(key_col)) < F.col("rate"))
            .drop("grp", "rate"))


def mixture_upsample(docs: DataFrame, targets: dict[str, float],
                     group_col: str = "source", key_col: str = "doc_id",
                     token_col: str | None = None,
                     max_budget_tokens: float | None = None) -> DataFrame:
    """:func:`mixture_sample` with UPSAMPLING: instead of capping the
    budget at the scarcest group, each group meets its share by
    REPEATING documents — ``rate_g`` may exceed 1, and a document is
    emitted ``floor(rate)`` times plus one more when its hash fraction
    falls under the fractional remainder (epochs-per-source, the way
    recipes actually oversample rare high-quality sources). The budget
    is the LARGEST group's full-use point (``max_g(T_g / share_g)``) or
    an explicit ``max_budget_tokens`` cap.

    Output = input columns + ``copy_idx`` (0-based repetition index) —
    downstream shuffles must keep it in dedup keys or the copies
    collapse right back. Same relational shape as mixture_sample
    (broadcast one-row budget, content-hash remainder); exact DuckDB
    twin ``mixture_upsample``.
    """
    if not targets or any(v <= 0 for v in targets.values()):
        raise ValueError("targets must be a non-empty {group: share>0} map")
    spark = docs.sparkSession
    tok = F.col(token_col) if token_col else F.lit(1)
    tgt = F.broadcast(spark.createDataFrame(
        sorted(targets.items()), ["grp", "share"]))
    totals = (docs.select(F.col(group_col).alias("grp"), tok.alias("tk"))
              .groupBy("grp").agg(F.sum("tk").alias("t_g"))
              .join(tgt, "grp"))
    budget_expr = F.max(F.col("t_g") / F.col("share")).alias("budget")
    budget = F.broadcast(totals.agg(budget_expr))
    if max_budget_tokens is not None:
        budget = F.broadcast(totals.agg(
            F.least(F.max(F.col("t_g") / F.col("share")),
                    F.lit(float(max_budget_tokens))).alias("budget")))
    rates = (totals.crossJoin(budget)
             .select("grp", (F.col("budget") * F.col("share")
                             / F.col("t_g")).alias("rate")))
    base = F.floor(F.col("rate")).cast("int")
    extra = (hash_fraction(F.col(key_col))
             < (F.col("rate") - F.floor(F.col("rate")))).cast("int")
    reps = base + extra
    return (docs.join(F.broadcast(rates),
                      docs[group_col] == rates["grp"])
            .withColumn("_reps", reps)
            .filter(F.col("_reps") > 0)
            .withColumn("copy_idx",
                        F.explode(F.sequence(F.lit(0), F.col("_reps") - 1)))
            .drop("grp", "rate", "_reps"))


def shuffle_shards(df: DataFrame, n_shards: int, key_col: str,
                   seed: str = "0") -> DataFrame:
    """Deterministic global training shuffle -> original columns +
    (shard, pos): every row is assigned a shard by content hash of
    (key, seed) and a dense 0-based position by the hash order WITHIN
    its shard — the epoch-reshufflable, engine-portable materialization
    of "globally shuffle 100 TB then read shard-sequentially".

    Changing ``seed`` re-deals the entire permutation (epoch reshuffle);
    identical inputs yield identical shards/positions in any engine with
    md5 (ties broken by the key itself, so the order is total). The only
    shuffle is the per-shard window sort; at corpus scale each shard
    sorts independently (n_shards ≫ executors spreads the sort), and a
    writer partitions the output by shard for sequential reads."""
    h = F.md5(F.concat_ws("\x01", F.col(key_col).cast("string"),
                          F.lit(seed)))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
             % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("_h", key_col)
    return (df.withColumn("_h", h).withColumn("shard", shard)
            .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
            .drop("_h"))
