"""Entity-resolution clustering evaluation: pairwise P/R/F1 and B-cubed.

canonicalize.py produces a predicted partition of mentions; when a gold
partition exists (labeled sample, authority registry join, or a planted
synthetic corpus), the standard ER quality numbers are pairwise
precision/recall/F1 (Fellegi-Sunter tradition) and B-cubed (Bagga & Baldwin
1998) — the two metrics every ER paper reports. The reference has no
counterpart (it never merges records); this is the evaluation loop for the
graft's canonicalization stage.

Scale design — never materialize pairs:

- Pairwise TP = sum over contingency cells (pred_cluster x gold_cluster) of
  C(n_ij, 2); predicted/gold pair totals likewise from the marginals. One
  join on the mention id + three groupBys over CLUSTER-sized tables — a
  10^9-mention corpus with 10^6-member clusters never enumerates the 10^12
  within-cluster pairs the naive definition suggests.
- B-cubed precision for mention m = n_ij / n_i (its cell over its predicted
  cluster), recall = n_ij / n_j; the per-mention average folds into
  cell-weighted sums: sum_cells(n_ij^2 / n_i) / N — again contingency-sized
  arithmetic only.
- Everything is integer counting until the final divisions, so the driver
  oracle replays it exactly (ratios e6-scaled).

Mentions missing from either map are dropped (inner join) — evaluate on the
labeled subset; singletons count (their C(1,2)=0 pairs contribute nothing
to pairwise but anchor B-cubed, which rewards leaving them unmerged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(n):
    return (n * (n - F.lit(1))) / 2


def clustering_metrics(pred: DataFrame, gold: DataFrame,
                       id_col: str = "ent",
                       pred_col: str = "canon",
                       gold_col: str = "canon") -> DataFrame:
    """pred (ent, canon) x gold (ent, canon) -> ONE row:
    (n_items, tp_pairs, pred_pairs, gold_pairs,
     pair_precision_e6, pair_recall_e6, pair_f1_e6,
     b3_precision_e6, b3_recall_e6, b3_f1_e6).

    Pairwise: a pair of mentions counts as TP iff co-clustered in BOTH
    partitions. B-cubed: per-mention cell/cluster ratios, averaged."""
    p = pred.select(F.col(id_col).cast("string").alias("ent"),
                    F.col(pred_col).cast("string").alias("pc"))
    g = gold.select(F.col(id_col).cast("string").alias("ent"),
                    F.col(gold_col).cast("string").alias("gc"))
    both = p.join(g, "ent")

    # contingency cells + marginals (all cluster-sized)
    cells = both.groupBy("pc", "gc").agg(F.count(F.lit(1)).alias("nij"))
    pm = cells.groupBy("pc").agg(F.sum("nij").alias("ni"))
    gm = cells.groupBy("gc").agg(F.sum("nij").alias("nj"))

    stats = (cells.join(pm, "pc").join(gm, "gc")
             .agg(F.sum("nij").alias("n_items"),
                  F.sum(_pairs(F.col("nij"))).cast("long").alias("tp_pairs"),
                  F.sum(F.col("nij") * F.col("nij") / F.col("ni"))
                  .alias("b3p_sum"),
                  F.sum(F.col("nij") * F.col("nij") / F.col("nj"))
                  .alias("b3r_sum")))
    ppairs = (pm.agg(F.sum(_pairs(F.col("ni"))).cast("long")
                     .alias("pred_pairs")))
    gpairs = (gm.agg(F.sum(_pairs(F.col("nj"))).cast("long")
                     .alias("gold_pairs")))

    def e6(col):
        return F.round(col * 1000000).cast("long")

    out = (stats.crossJoin(ppairs).crossJoin(gpairs)
           .withColumn("pair_p", F.when(F.col("pred_pairs") > 0,
                                        F.col("tp_pairs") / F.col("pred_pairs"))
                       .otherwise(F.lit(1.0)))
           .withColumn("pair_r", F.when(F.col("gold_pairs") > 0,
                                        F.col("tp_pairs") / F.col("gold_pairs"))
                       .otherwise(F.lit(1.0)))
           .withColumn("b3_p", F.col("b3p_sum") / F.col("n_items"))
           .withColumn("b3_r", F.col("b3r_sum") / F.col("n_items")))

    def f1(pcol, rcol):
        return F.when(pcol + rcol > 0,
                      2 * pcol * rcol / (pcol + rcol)).otherwise(F.lit(0.0))

    return out.select(
        "n_items", "tp_pairs", "pred_pairs", "gold_pairs",
        e6(F.col("pair_p")).alias("pair_precision_e6"),
        e6(F.col("pair_r")).alias("pair_recall_e6"),
        e6(f1(F.col("pair_p"), F.col("pair_r"))).alias("pair_f1_e6"),
        e6(F.col("b3_p")).alias("b3_precision_e6"),
        e6(F.col("b3_r")).alias("b3_recall_e6"),
        e6(f1(F.col("b3_p"), F.col("b3_r"))).alias("b3_f1_e6"))
