"""Changelog application (MERGE), temporal (SCD2) materialization, and
snapshot-to-snapshot set diff.

The graft's graph tables are Iceberg-style snapshots (plans/snapshot.py);
this module adds the other half of a lakehouse table lifecycle: applying
a CDC changelog of upserts/deletes onto a base snapshot (the MERGE INTO
behind merge-on-read compaction) and materializing a changelog as a
type-2 slowly-changing dimension (validity intervals instead of
overwrite).

Both are single-window designs: union base+changes, one
partitionBy(keys) window, one filter — the only shuffle is the window's
hash partition on the merge keys, which is the theoretical minimum for a
keyed merge. No driver round-trips, no iterative logic, so the plan is
identical at 10^12 rows; skewed merge keys hit AQE's skew handling like
any other window.

Determinism contract: ``seq_cols`` must totally order each key's changes
(e.g. (ts, change_id)); the caller owns supplying the tie-break, exactly
as Delta's MERGE requires a deterministic source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OP_COL = "op"  # 'U' (upsert) | 'D' (delete)


def apply_changelog(base: DataFrame, changes: DataFrame,
                    key_cols: list[str], seq_cols: list[str],
                    op_col: str = OP_COL) -> DataFrame:
    """Latest-wins MERGE: the final state of every key after replaying
    ``changes`` (columns: keys + seq + op + payload) over ``base``
    (columns: keys + payload — a plain snapshot, implicitly older than
    every change). A key whose latest change is 'D' is absent from the
    result; a key absent from base is inserted by its first 'U'.

    Output columns: keys + payload (base's column set minus nothing) —
    seq/op are consumed.
    """
    payload = [c for c in base.columns if c not in key_cols]
    for c in payload:
        if c not in changes.columns:
            raise ValueError(f"changes missing payload column {c!r}")
    cols = list(dict.fromkeys([*key_cols, *seq_cols, op_col, *payload]))
    ch = changes.select(*cols).withColumn("_chg", F.lit(1))
    bs = base.select(
        *[F.col(c) if c in base.columns
          else (F.lit("U") if c == op_col else F.lit(None)).alias(c)
          for c in cols]).withColumn("_chg", F.lit(0))
    both = ch.unionByName(bs)
    # _chg ranks every change before the base snapshot (base is
    # implicitly older), then seq orders the changes among themselves —
    # so base survives only for keys with no changes at all
    order = [F.col("_chg").desc()] + \
        [F.col(c).desc_nulls_last() for c in seq_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (both.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col(op_col) == "U"))
            .select(*key_cols, *payload))


def changelog_to_scd2(changes: DataFrame, key_cols: list[str],
                      seq_col: str, tie_cols: list[str] | None = None,
                      op_col: str = OP_COL) -> DataFrame:
    """Type-2 dimension from a changelog: every 'U' becomes a versioned
    row valid from its own sequence value until the NEXT change of the
    same key (NULL = still current); a 'D' closes the previous interval
    without emitting a row. One window, one filter.

    Output: all change columns minus op, plus ``valid_to`` (same type as
    ``seq_col``) and ``is_current``.
    """
    tie = tie_cols or []
    w = Window.partitionBy(*key_cols).orderBy(seq_col, *tie)
    return (changes
            .withColumn("valid_to", F.lead(seq_col).over(w))
            .filter(F.col(op_col) == "U")
            .drop(op_col)
            .withColumn("is_current", F.col("valid_to").isNull()))


def snapshot_diff(old: DataFrame, new: DataFrame,
                  cols: list[str] | None = None) -> DataFrame:
    """Set difference between two snapshots of the same table (e.g. two
    graph materializations): rows only in ``new`` come back with
    op='added', rows only in ``old`` with op='removed'; rows in both are
    silent. A changed row is, by set semantics, one removed + one added.

    ONE shuffle total: tag each side, union, groupBy the compared
    columns, keep groups seen on a single side — vs the naive pair of
    EXCEPTs (two joins, two shuffles of the big side). Duplicate rows
    within a side collapse (snapshots are sets); min/max of the side tag
    makes that explicit rather than an accident of EXCEPT.

    Output: ``op`` + ``cols`` (default: old's column set).
    """
    cols = cols or old.columns
    tagged = (old.select(*cols).withColumn("_side", F.lit(-1))
              .unionByName(new.select(*cols).withColumn("_side", F.lit(1))))
    return (tagged.groupBy(*cols)
            .agg(F.min("_side").alias("_lo"), F.max("_side").alias("_hi"))
            .filter(F.col("_lo") == F.col("_hi"))
            .select(F.when(F.col("_lo") == 1, F.lit("added"))
                    .otherwise(F.lit("removed")).alias("op"), *cols))
