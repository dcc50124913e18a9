"""Golden-record consolidation (survivorship) after entity canonicalization.

Canonicalization (operators/canonicalize.py) answers "which mentions are the
same entity"; consolidation answers "what does the merged entity LOOK like".
Once a canonical map collapses k mention records into one entity, their
attribute values usually disagree (alias spellings, stale addresses, partial
records) and the KG needs ONE value per (entity, attribute) — the classic
master-data-management survivorship step (Talburt's ER model stage 4; the
reference has no counterpart — it never merges records at all).

Survivorship rules (both deterministic, pinned for the oracle):

- ``majority``: the value with the highest support (row count, or the sum of
  ``weight_col``); ties break to the lexicographically smallest value.
- ``latest``: the value with the newest ``ts_col`` timestamp; exact-tie
  timestamps break to the lexicographically smallest value.

Scale design:

- support counting is a (canon, attr, value) groupBy — map-side partial
  aggregation absorbs hot entities (a celebrity entity with 10^7 mentions
  contributes at most one partial row per task per distinct value);
- the per-(canon, attr) winner is ONE ``min(struct(...))`` aggregation
  (the communities.py argmax idiom) — no window, no join-back, so the
  whole operator is two keyed shuffles end to end;
- the canonical map joins on the mention id — at cluster scale bucket both
  sides by the id so the join is exchange-free; the map is usually much
  smaller than the mention table (only merged mentions need rows: identity
  mappings may be omitted and default to the mention id itself).

Output per (canon, attr): the winning value, its support, plus the
conflict profile a steward reads (n_values distinct candidates, n_records
contributing rows) — the "how contested was this field" signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULES = ("majority", "latest")


def consolidate_attributes(attrs: DataFrame,
                           cmap: DataFrame | None = None,
                           rule: str = "majority",
                           id_col: str = "ent",
                           attr_col: str = "attr",
                           value_col: str = "value",
                           weight_col: str | None = None,
                           ts_col: str | None = None,
                           map_id_col: str = "ent",
                           map_canon_col: str = "canon") -> DataFrame:
    """attrs (ent, attr, value [, weight][, ts]) -> one golden row per
    (canon, attr): (canon, attr, value, support, n_values, n_records).

    ``cmap`` maps mention ids to canonical ids (left join; unmapped
    mentions canonicalize to themselves). ``rule='latest'`` requires
    ``ts_col`` and reports support as the support of the winning value,
    counted the same way as majority mode."""
    if rule not in _RULES:
        raise ValueError(f"rule must be one of {_RULES}, got {rule!r}")
    if rule == "latest" and ts_col is None:
        raise ValueError("rule='latest' requires ts_col")

    rows = attrs.select(
        F.col(id_col).cast("string").alias("ent"),
        F.col(attr_col).cast("string").alias("attr"),
        F.col(value_col).cast("string").alias("value"),
        (F.col(weight_col).cast("double") if weight_col
         else F.lit(1.0)).alias("w"),
        *([F.col(ts_col).cast("timestamp").alias("ts")] if ts_col else []),
    ).filter(F.col("value").isNotNull())

    if cmap is not None:
        m = cmap.select(F.col(map_id_col).cast("string").alias("ent"),
                        F.col(map_canon_col).cast("string").alias("canon"))
        rows = (rows.join(m, "ent", "left")
                .withColumn("canon", F.coalesce("canon", "ent")))
    else:
        rows = rows.withColumn("canon", F.col("ent"))

    # stage 1: per-candidate support — map-side combine bounds hot-entity
    # fan-in at (tasks x distinct values) partial rows before the shuffle
    per_value = rows.groupBy("canon", "attr", "value").agg(
        F.sum("w").alias("support"),
        F.count(F.lit(1)).alias("n_rows"),
        *([F.max("ts").alias("latest_ts")] if ts_col else []),
    )

    # stage 2: argmax + conflict profile in ONE aggregation (no window)
    if rule == "majority":
        best = F.min(F.struct((-F.col("support")).alias("k1"),
                              F.col("value").alias("v"),
                              F.col("support").alias("s")))
    else:  # latest: newest ts wins, exact ties -> smallest value
        best = F.min(F.struct(
            (-F.unix_micros(F.col("latest_ts"))).alias("k1"),
            F.col("value").alias("v"),
            F.col("support").alias("s")))
    return (per_value.groupBy("canon", "attr")
            .agg(best.alias("best"),
                 F.count(F.lit(1)).alias("n_values"),
                 F.sum("n_rows").alias("n_records"))
            .select("canon", "attr",
                    F.col("best.v").alias("value"),
                    F.col("best.s").alias("support"),
                    "n_values", "n_records"))


def consolidation_conflicts(golden: DataFrame,
                            min_values: int = 2) -> DataFrame:
    """Stewardship view over consolidate_attributes output: the contested
    fields (>= min_values distinct candidates), worst first — the review
    queue a data steward works through after a merge wave."""
    return (golden.filter(F.col("n_values") >= min_values)
            .orderBy(F.col("n_values").desc(), "canon", "attr"))
