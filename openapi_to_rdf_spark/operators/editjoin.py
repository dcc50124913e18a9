"""Edit-distance similarity join: all pairs within Levenshtein distance k,
PassJoin-style (Li/Deng/Feng 2011) — segment-pigeonhole candidates, exact
verify. The string-similarity join family token-Jaccard can't express
(operators/dedup covers set overlap; this covers typos/OCR/near-identical
identifiers).

Candidate generation (exact, no false negatives):

- Index side: every string s is split into k+1 contiguous segments with
  the even-partition boundaries start_i = floor(i*len/(k+1)). If
  ed(s, r) <= k then (pigeonhole) at least one FULL segment of s appears
  in r verbatim, shifted by at most k positions.
- Probe side: every string r enumerates, for every candidate partner
  length ls in [len(r)-k, len(r)+k] and every segment index i, the
  substrings of r with the segment's length whose start is within +-k of
  the segment's home position — a bounded (2k+1)^2 * (k+1) expansion per
  row, built as ONE codegen array + explode (no UDF).
- Candidates = equi-join on (segment text, segment index, partner
  length); verify = built-in ``levenshtein`` <= k; dedupe to id_a < id_b.

Strings shorter than k+1 have empty segments (pigeonhole void), so the
short stratum (len <= 2k, which is everything such a string can pair
with under the length filter) is joined brute-force within itself — a
tiny length-bounded bucket in real corpora, and a LOUD guard refuses to
cross-join it above ``max_short`` rows rather than silently going
quadratic.

Scale: the segment equi-join shuffles on (seg_text, i, ls) — hot
segments (shared prefixes like 'Customer#0000') fan out, which is
exactly AQE skew-join territory; the verify is one broadcast-free
filter on the joined rows; nothing is ever all-pairs outside the short
stratum. Exact DuckDB oracle: driver query ``edit_dup_pairs``
(brute-force levenshtein + length filter at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_bounds(length_col, i: int, k: int):
    """(start, seg_len) of segment i under the even partition of a
    string of the given length into k+1 parts (0-based start)."""
    start = F.floor(length_col * i / (k + 1)).cast("int")
    end = F.floor(length_col * (i + 1) / (k + 1)).cast("int")
    return start, (end - start)


def edit_distance_pairs(df: DataFrame, id_col: str = "id",
                        text_col: str = "text", k: int = 1,
                        max_short: int = 10_000) -> DataFrame:
    """All unordered pairs (id_a < id_b) with
    ``levenshtein(text_a, text_b) <= k`` → (id_a, id_b, dist)."""
    if k < 1:
        raise ValueError("k must be >= 1 (k=0 is exact_dedup's job)")
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(text_col).alias("txt"))
            .dropDuplicates(["id"])
            .withColumn("ln", F.length("txt"))
            .localCheckpoint())

    long_side = base.filter(F.col("ln") >= k + 1)

    # ---- index side: k+1 real segments per string -------------------------
    seg_entries = []
    for i in range(k + 1):
        start, seg_len = _seg_bounds(F.col("ln"), i, k)
        seg_entries.append(F.struct(
            F.lit(i).alias("seg_i"), start.alias("seg_start"),
            F.substring(F.col("txt"), start + 1, seg_len).alias("seg")))
    segs = (long_side.select(
        F.col("id").alias("a_id"), F.col("txt").alias("a_txt"),
        F.col("ln").alias("ls"),
        F.explode(F.array(*seg_entries)).alias("e"))
        .select("a_id", "a_txt", "ls", "e.seg_i", "e.seg_start", "e.seg"))

    # ---- probe side: bounded substring enumeration ------------------------
    sub_entries = []
    for dls in range(-k, k + 1):          # partner length ls = ln + dls
        ls = F.col("ln") + dls
        for i in range(k + 1):
            start, seg_len = _seg_bounds(ls, i, k)
            for shift in range(-k, k + 1):
                pos = start + shift
                ok = ((ls >= k + 1) & (pos >= 0)
                      & (pos + seg_len <= F.col("ln")) & (seg_len >= 1))
                sub_entries.append(F.when(ok, F.struct(
                    ls.cast("int").alias("p_ls"), F.lit(i).alias("seg_i"),
                    F.substring(F.col("txt"), pos + 1, seg_len)
                    .alias("seg"))))
    subs = (base.select(
        F.col("id").alias("b_id"), F.col("txt").alias("b_txt"),
        F.explode(F.array(*sub_entries)).alias("e"))
        .filter(F.col("e").isNotNull())
        .select("b_id", "b_txt", "e.p_ls", "e.seg_i", "e.seg")
        .dropDuplicates())

    cand = (segs.join(subs, (segs["seg"] == subs["seg"])
                      & (segs["seg_i"] == subs["seg_i"])
                      & (segs["ls"] == subs["p_ls"])
                      & (segs["a_id"] != subs["b_id"]))
            .select("a_id", "a_txt", "b_id", "b_txt"))

    verified = (cand
                .filter(F.levenshtein("a_txt", "b_txt") <= k)
                .select(F.least("a_id", "b_id").alias("id_a"),
                        F.greatest("a_id", "b_id").alias("id_b"),
                        F.levenshtein("a_txt", "b_txt").alias("dist"))
                .dropDuplicates(["id_a", "id_b"]))

    # ---- short stratum: strings the pigeonhole can't index ----------------
    short = base.filter(F.col("ln") <= 2 * k)
    n_short = short.count()
    if n_short > max_short:
        raise ValueError(
            f"{n_short} strings of length <= {2 * k} exceed max_short="
            f"{max_short}; the short stratum would cross-join "
            "quadratically — dedupe or bucket these upstream")
    if n_short > 1:
        a = short.select(F.col("id").alias("s_a"), F.col("txt").alias("t_a"))
        b = short.select(F.col("id").alias("s_b"), F.col("txt").alias("t_b"))
        short_pairs = (a.join(b, F.col("s_a") < F.col("s_b"))
                       .filter(F.levenshtein("t_a", "t_b") <= k)
                       .select(F.col("s_a").alias("id_a"),
                               F.col("s_b").alias("id_b"),
                               F.levenshtein("t_a", "t_b").alias("dist")))
        verified = verified.unionByName(short_pairs) \
            .dropDuplicates(["id_a", "id_b"])
    return verified
