"""Event-stream batch operators: sessionization, as-of join, rollup.

These cover the generic-engine categories SURVEY.md §2.4 lists beyond the
reference's own surface (windows, grouping sets, temporal joins) — the ops a
transcript/event pipeline needs at 100 TB. All pure DataFrame; shuffles are
keyed on user_id (high cardinality, no skew) or broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ntz_epoch(ts_col: str):
    """Wall-clock seconds since 1970 for a TIMESTAMP_NTZ column — computed
    with timestampdiff so the result is independent of the session timezone
    (a `cast('timestamp').cast('long')` would shift by the session offset
    and, worse, non-uniformly across DST transitions)."""
    return F.expr(
        f"timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', "
        f"cast({ts_col} as timestamp_ntz))")


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds ``gap_minutes``.

    One shuffle (partition by user), two window passes over it — the
    classic lag → boundary-flag → running-sum pattern; both windows share
    the same partitioning so Catalyst plans a single exchange.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    epoch = _ntz_epoch(ts_col)
    gap = epoch - F.lag(epoch).over(w)
    with_flag = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)))
    return with_flag.withColumn(
        "session_seq", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).drop("new_session")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates (events, span seconds, value sum)."""
    s = sessionize(events, gap_minutes)
    return (s.groupBy("user_id", "session_seq")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max(_ntz_epoch("ts")) - F.min(_ntz_epoch("ts")))
                 .alias("span_sec"),
                 F.round(F.sum("value") * 1000000).cast("long").alias("sum_value_e6")))


def asof_join(left: DataFrame, right: DataFrame, on: str, left_ts: str,
              right_ts: str, right_cols: list[str]) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts for the same key.

    Implemented as union → single window pass (the sort-based as-of):
    tag rows, order by (key, ts, tag), carry the last right value forward
    with last_value(ignoreNulls). One shuffle on the key — no range-join
    explosion, no per-key loop; this is the scalable form of the operator
    (a broadcast-range join would blow up at 10^12 rows).
    """
    lt = left.withColumn("_tag", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = right.select(
        F.col(on), F.col(right_ts).alias("_ts"),
        *[F.col(c) for c in right_cols]).withColumn("_tag", F.lit(0))
    both = lt.unionByName(rt, allowMissingColumns=True)
    # NB: determinism requires right unique per (key, right_ts) — pre-agg the
    # right side if it isn't (multiple right rows at one ts would carry an
    # arbitrary one)
    w = (Window.partitionBy(on).orderBy(F.col("_ts").asc(), F.col("_tag").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = both.select(
        "*", *[F.last(F.when(F.col("_tag") == 0, F.col(c)), ignorenulls=True)
               .over(w).alias(f"_asof_{c}") for c in right_cols])
    return (carried.filter(F.col("_tag") == 1)
            .drop("_tag", "_ts", *right_cols)
            .select("*", *[F.col(f"_asof_{c}").alias(c) for c in right_cols])
            .drop(*[f"_asof_{c}" for c in right_cols]))


def range_join(points: DataFrame, intervals: DataFrame, point_ts: str,
               start_col: str, end_col: str, on: str | None = None,
               bin_minutes: int = 60,
               interval_cols: list[str] | None = None) -> DataFrame:
    """Point-in-interval join: each point row matched with every interval
    row whose half-open window ``[start_col, end_col)`` contains
    ``point_ts`` (and that shares the optional equality key ``on``).

    Spark has no native range-join strategy — a raw ``ts >= start AND
    ts < end`` condition plans BroadcastNestedLoopJoin (or a cartesian
    product), which is quadratic and unusable at 10^12 events. This is the
    bin-bucketing reformulation (the same trick behind Databricks' range
    join hint): pick a bin width, explode each interval into the bins it
    overlaps, map each point to its single bin, hash equi-join on
    (key, bin), then apply the exact predicate as a residual filter.
    Shuffle is keyed, never a product; the only cost knob is the
    explosion factor ceil(span/bin)+1 per interval, so choose
    ``bin_minutes`` near the median interval length (shorter bins = more
    interval duplicates; longer bins = more residual-filter waste).

    Both timestamp→bin mappings truncate the same way, and the bin range
    is closed on both ends, so no qualifying pair can straddle a bin the
    interval didn't emit — the residual filter then makes the result
    exact (verified row-for-row against DuckDB's inequality join by the
    ``range_join_windows`` oracle).
    """
    w = bin_minutes * 60
    icols = interval_cols or []
    es, ee = _ntz_epoch(start_col), _ntz_epoch(end_col)
    iv = (intervals.filter(F.col(end_col) > F.col(start_col))
          .select(*([on] if on else []),
                  F.col(start_col).alias("_start"),
                  F.col(end_col).alias("_end"),
                  *icols,
                  F.explode(F.sequence(
                      F.floor(es / w),
                      F.greatest(F.floor(ee / w), F.floor(es / w))))
                  .alias("_bin")))
    pt = points.withColumn("_bin", F.floor(_ntz_epoch(point_ts) / w))
    keys = ["_bin"] + ([on] if on else [])
    return (pt.join(iv, keys)
            .filter((F.col(point_ts) >= F.col("_start"))
                    & (F.col(point_ts) < F.col("_end")))
            .drop("_bin", "_start", "_end"))


def hypertable_rollup(events: DataFrame,
                      widths_minutes: tuple[int, ...] = (15, 60, 1440),
                      ts_col: str = "ts",
                      value_col: str = "value") -> DataFrame:
    """Hypertable-style continuous aggregate: event counts + value sums at
    several time-bucket granularities (15 min / hour / day by default),
    returned as one frame keyed by (gran_min, bucket_start_sec).

    The scale property is WHERE each level aggregates from: raw events are
    scanned and shuffled exactly once, into the finest buckets; each
    finest partial row is then EXPLODED into its (granularity, bucket)
    memberships and one final aggregation produces every level from the
    partials (sum-of-sums, sum-of-counts) — the way TimescaleDB
    continuous aggregates and OLAP rollup trees materialize hierarchies.
    At 10^12 events the finest partial table is ~6 orders of magnitude
    smaller than raw, so the explode+reagg over partials is noise — vs.
    the naive UNION of per-level GROUP BYs, which rescans the full corpus
    per level (and which a DataFrame union of branches sharing ``base``
    lineage would silently plan: Spark does not reliably reuse the
    common exchange across union branches — measured, 3 FileScans; the
    explode form has exactly one by construction, plan-asserted in
    tests). Requires each width to be a multiple of the finest
    (checked), so coarser buckets are exact unions of finer ones.

    Bucket identity is wall-clock seconds since epoch (long), not a
    timestamp — timezone-free, engine-portable, and exactly what the
    ``hypertable_rollup`` DuckDB oracle recomputes level by level from
    the raw table.
    """
    widths = sorted(widths_minutes)
    w0 = widths[0]
    for w in widths:
        if w % w0:
            raise ValueError(f"width {w} min is not a multiple of the "
                             f"finest width {w0} min")
    # values are fixed to e6 integers BEFORE any sum: integer addition is
    # associative, so partial-of-partial re-aggregation is bit-identical
    # to a direct per-level sum (a double sum re-associated across levels
    # could flip the final rounding vs the oracle's one-pass sum)
    base = (events.groupBy(
        F.floor(_ntz_epoch(ts_col) / (w0 * 60)).alias("_b0"))
        .agg(F.count(F.lit(1)).alias("_n"),
             F.sum(F.round(F.col(value_col) * 1000000).cast("long"))
             .alias("_s")))
    membership = F.array(*[
        F.struct(F.lit(w).cast("long").alias("gran_min"),
                 (F.floor(F.col("_b0") * w0 / w) * (w * 60)).cast("long")
                 .alias("bucket_start_sec"))
        for w in widths])
    return (base.select("_n", "_s", F.explode(membership).alias("_m"))
            .groupBy("_m.gran_min", "_m.bucket_start_sec")
            .agg(F.sum("_n").cast("long").alias("n"),
                 F.sum("_s").cast("long").alias("sum_value_e6")))


def event_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP (event_type, event day) — grouping-sets coverage; partial
    aggregation handles the fan-in, grouping_id disambiguates levels."""
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    return (events.select("event_type", day, "value")
            .rollup("event_type", "day")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("value") * 1000000).cast("long").alias("sum_value_e6"),
                 F.grouping_id().alias("grp")))


def transition_counts(df: DataFrame, group_col: str, order_cols: list[str],
                      label_col: str, endpoints: bool = True) -> DataFrame:
    """Markov-style flow mining: (src, dst, n) transition counts of
    ``label_col`` within each group under a total order — the tool-call
    flow miner for agent transcripts (group=conv_id, order=turn_idx,
    label=tool) and the event-funnel miner for event streams
    (group=user_id, order=[ts, event_id]).

    ``endpoints=True`` adds __START__ -> first and last -> __END__ edges so
    entry/exit distributions come out of the same pass (the sequence-mining
    convention).

    One window pass (lag + lead share a single sort), one map-side-combined
    count. The per-group sort is bounded by group length (turns per
    conversation / events per user), never corpus-wide. Deterministic iff
    ``order_cols`` is a total order within each group — pass a unique
    tiebreaker (event_id, turn_idx) as the last column.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    wp = Window.partitionBy(group_col)
    # endpoints come from row positions, NOT lag()/lead() nullness — a NULL
    # label is a legitimate state (transcript turns without a tool call),
    # and lag()==NULL cannot distinguish "first row" from "previous label
    # was NULL"
    base = df.select(
        F.lag(label_col).over(w).alias("_prev"),
        F.col(label_col).alias("_dst"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_cnt"))
    is_first = F.col("_rn") == 1
    inner = (base.filter(~is_first)
             .select(F.col("_prev").alias("src"), F.col("_dst").alias("dst")))
    if endpoints:
        head = base.filter(is_first).select(
            F.lit("__START__").alias("src"), F.col("_dst").alias("dst"))
        tail = base.filter(F.col("_rn") == F.col("_cnt")).select(
            F.col("_dst").alias("src"), F.lit("__END__").alias("dst"))
        inner = inner.unionAll(head).unionAll(tail)
    return inner.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))


def label_path_counts(df: DataFrame, group_col: str, order_cols: list[str],
                      label_col: str, n: int = 3,
                      sep: str = ">") -> DataFrame:
    """Frequent length-n label paths (path, n_occurrences): the n-gram
    generalization of transition_counts (n=2 == its endpoint-free edges).

    collect_list is safe here because group length is bounded by the
    group's own event count (turns per conversation); the sort-under-struct
    trick keeps ordering deterministic without a second window pass.
    """
    seq = (df.groupBy(group_col)
           .agg(F.array_sort(F.collect_list(F.struct(
               *[F.col(c) for c in order_cols],
               F.col(label_col).alias("_lab")))).alias("_seq")))

    # bind the extracted label array ONCE as a lambda variable — referencing
    # the getField tree inside the per-gram lambda would re-inline the
    # array<struct> extraction per gram (the word_ngrams pathology)
    def grams_of(labs):
        # guard: Spark sequence(1, 0) counts DOWN, so short groups must
        # short-circuit to an empty array instead of emitting ghost grams
        idx = F.sequence(F.lit(1), F.size(labs) - n + 1)
        # null_replacement: array_join silently DROPS null elements, which
        # would collapse "a>NULL>b" into "a>b"
        g = F.transform(idx, lambda i: F.array_join(F.slice(labs, i, n), sep,
                                                    "__NULL__"))
        return F.when(F.size(labs) >= n, g).otherwise(
            F.array().cast("array<string>"))

    grams = seq.select(F.explode(F.element_at(
        F.transform(F.array(F.col("_seq").getField("_lab")), grams_of), 1))
        .alias("path"))
    return grams.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))


def conversation_quality(turns: DataFrame, target_role: str = "assistant",
                         conv_col: str = "conv_id",
                         order_cols: list[str] | None = None,
                         role_col: str = "role",
                         ts_col: str | None = "ts") -> DataFrame:
    """Per-conversation structural quality report — the transcript-level
    curation gate (SFT corpora drop conversations that are single-role,
    never reach the target role, or stall for hours mid-dialogue):

    - ``n_turns`` / ``n_roles`` — size and role diversity;
    - ``consec_same_role`` — adjacent turns by the same speaker (role-
      alternation violations);
    - ``n_target`` — turns by ``target_role`` (the trainable signal);
    - ``first_role`` / ``last_role`` — openers and danglers (a
      conversation ending on a user turn has no trainable completion);
    - ``max_gap_s`` — longest wall-clock stall (None without ``ts_col``);
    - ``well_formed`` — ≥2 roles, no alternation violation, ≥1 target
      turn, ends on the target role.

    ONE window pass per conversation (lag on the conv_id partition) +
    one groupBy on the same key — Catalyst reuses the exchange, so the
    whole report is a single shuffle keyed by conversation, the same
    partitioning every per-conversation op here uses.
    """
    order_cols = order_cols or ["turn_idx"]
    w = Window.partitionBy(conv_col).orderBy(*order_cols)
    same = (F.lag(role_col).over(w) == F.col(role_col)).cast("int")
    base = turns
    cols = [F.col(conv_col), F.col(role_col),
            F.coalesce(same, F.lit(0)).alias("same_as_prev"),
            F.struct(*order_cols).alias("ord")]
    if ts_col is not None:
        # microsecond-exact epoch: SECOND-truncating diffs disagree with
        # DuckDB's boundary-counting date_diff on fractional timestamps;
        # exact µs diffs (then ONE floor after the max — floor is
        # monotone, so max∘floor == floor∘max) are engine-portable
        base = turns.withColumn("_ep_us", F.expr(
            f"timestampdiff(MICROSECOND, "
            f"timestamp_ntz'1970-01-01 00:00:00', "
            f"cast({ts_col} as timestamp_ntz))"))
        cols.append((F.col("_ep_us") - F.lag("_ep_us").over(w))
                    .alias("gap_us"))
    enriched = base.select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_turns"),
            F.countDistinct(role_col).alias("n_roles"),
            F.sum("same_as_prev").alias("consec_same_role"),
            F.sum((F.col(role_col) == target_role).cast("int"))
            .alias("n_target"),
            F.min_by(role_col, F.col("ord")).alias("first_role"),
            F.max_by(role_col, F.col("ord")).alias("last_role")]
    if ts_col is not None:
        aggs.append(F.floor(F.max("gap_us") / 1_000_000)
                    .cast("long").alias("max_gap_s"))
    out = enriched.groupBy(conv_col).agg(*aggs)
    return out.withColumn(
        "well_formed",
        (F.col("n_roles") >= 2) & (F.col("consec_same_role") == 0)
        & (F.col("n_target") >= 1) & (F.col("last_role") == target_role))
