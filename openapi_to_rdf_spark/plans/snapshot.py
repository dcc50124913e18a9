"""Iceberg-style snapshot layer: Parquet data + manifest JSON + lineage.

Offline sandbox has no Iceberg jars (SURVEY.md §7.4), so snapshots are plain
partitioned Parquet directories with an Iceberg-compatible *semantics* layer:

    <table_dir>/
        snap-<fingerprint16>/
            manifest.json      # schema, input fingerprint, per-file lineage,
                               # row/triple counts, wall time, app id
            data/...parquet    # (optionally hive-partitioned)
        LATEST                 # name of the current snapshot dir (atomic swap)

Checkpoint-resume (north_rule "resumable from checkpoint with per-partition
lineage + metrics"): every pipeline stage derives a deterministic fingerprint
from (upstream fingerprint, stage name, params); ``materialize`` skips the
whole Spark job when a committed snapshot with that fingerprint already
exists, so a killed run re-executes only stages after the last commit.

A real Iceberg catalog drops in by replacing write_snapshot/read_snapshot with
``df.writeTo(table)`` / ``spark.table`` — the fingerprint + metrics sidecar
logic is catalog-agnostic by design.
"""

from __future__ import annotations

import hashlib
import json
import pathlib
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def fingerprint(*parts: object) -> str:
    """Deterministic stage fingerprint from arbitrary JSON-able parts."""
    h = hashlib.sha256()
    for p in parts:
        h.update(json.dumps(p, sort_keys=True, default=str).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def _snap_dir(table_dir: str | pathlib.Path, fp: str) -> pathlib.Path:
    return pathlib.Path(table_dir) / f"snap-{fp}"


def snapshot_exists(table_dir: str | pathlib.Path, fp: str) -> bool:
    return (_snap_dir(table_dir, fp) / "manifest.json").exists()


def write_snapshot(df: DataFrame, table_dir: str | pathlib.Path, fp: str,
                   partition_by: list[str] | None = None,
                   count_by: list[str] | None = None,
                   stats_cols: tuple[str, str, str] | None = None) -> dict:
    """Materialize df as snapshot `fp` under table_dir; returns the manifest.

    Lineage is recorded per *output file* (the unit a resumed/percolated read
    actually consumes): after the write, one metadata-only Spark job groups by
    ``input_file_name`` for row counts. ``count_by`` adds aggregate metric
    counts (e.g. triples per graph) to the manifest.

    ``stats_cols=(p, s, o)`` is ANALYZE-on-write for triple tables: one
    extra pass over the written data records per-predicate (n_triples,
    distinct_subjects, distinct_objects) planner statistics in the
    manifest — vocabulary-sized, so they belong WITH the table metadata
    (Iceberg keeps its column stats the same way). The BGP optimizer
    loads them back via ``bgp.stats_from_manifest`` and orders joins
    without ever scanning the instance data at plan time.
    """
    snap = _snap_dir(table_dir, fp)
    data_dir = snap / "data"
    t0 = time.time()
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(data_dir))

    spark = df.sparkSession
    back = spark.read.parquet(str(data_dir))
    lineage_rows = (
        back.groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    root = str(data_dir)
    lineage = {r["file"].split(root, 1)[-1].lstrip("/"): r["rows"]
               for r in lineage_rows}
    metrics: dict[str, object] = {"rows": int(sum(lineage.values()))}
    if count_by:
        metrics["counts"] = {
            "|".join(str(r[c]) for c in count_by): r["n"]
            for r in back.groupBy(*count_by).agg(F.count(F.lit(1)).alias("n")).collect()
        }
    if stats_cols:
        p_col, s_col, o_col = stats_cols
        metrics["predicate_stats"] = {
            r["p"]: [r["n"], r["ds"], r["do"]]
            for r in back.groupBy(F.col(p_col).alias("p"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.countDistinct(s_col).alias("ds"),
                 F.countDistinct(o_col).alias("do")).collect()
        }

    # commit chain (Iceberg snapshot-history semantics): the new commit's
    # parent is whatever LATEST pointed at; sequence increments along the
    # chain so history / time travel order never depends on clock ties
    parent, sequence = None, 0
    latest_ptr = pathlib.Path(table_dir) / "LATEST"
    if latest_ptr.exists():
        prev = latest_ptr.read_text().strip()
        prev_man = pathlib.Path(table_dir) / prev / "manifest.json"
        if prev != f"snap-{fp}" and prev_man.exists():
            parent = prev.removeprefix("snap-")
            sequence = json.loads(prev_man.read_text()).get("sequence", 0) + 1

    manifest = {
        "snapshot": f"snap-{fp}",
        "fingerprint": fp,
        "parent": parent,
        "sequence": sequence,
        "schema": json.loads(back.schema.json()),
        "partition_by": partition_by or [],
        "lineage": lineage,
        "metrics": metrics,
        "wall_seconds": round(time.time() - t0, 3),
        "app_id": spark.sparkContext.applicationId,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    # manifest.json is the commit marker: written last, so a crash mid-write
    # leaves an uncommitted (and resume-invisible) snapshot.
    (snap / "manifest.json").write_text(json.dumps(manifest, indent=1))
    latest = pathlib.Path(table_dir) / "LATEST"
    tmp = latest.with_suffix(".tmp")
    tmp.write_text(f"snap-{fp}")
    tmp.replace(latest)  # atomic pointer swap, Iceberg-commit style
    return manifest


def read_snapshot(spark: SparkSession, table_dir: str | pathlib.Path,
                  fp: str | None = None) -> DataFrame:
    table_dir = pathlib.Path(table_dir)
    snap = _snap_dir(table_dir, fp) if fp else table_dir / (table_dir / "LATEST").read_text().strip()
    return spark.read.parquet(str(snap / "data"))


def read_manifest(table_dir: str | pathlib.Path, fp: str | None = None) -> dict:
    table_dir = pathlib.Path(table_dir)
    snap = _snap_dir(table_dir, fp) if fp else table_dir / (table_dir / "LATEST").read_text().strip()
    return json.loads((snap / "manifest.json").read_text())


def materialize(df_thunk, spark: SparkSession, table_dir: str | pathlib.Path,
                fp: str, partition_by: list[str] | None = None,
                count_by: list[str] | None = None,
                stats_cols: tuple[str, str, str] | None = None) -> DataFrame:
    """Resume-aware stage commit: skip the job if snapshot fp is committed.

    ``df_thunk`` is a zero-arg callable so a resumed stage pays zero plan
    construction / recompute cost. Returns the (possibly re-read) DataFrame.
    """
    if not snapshot_exists(table_dir, fp):
        write_snapshot(df_thunk(), table_dir, fp, partition_by=partition_by,
                       count_by=count_by, stats_cols=stats_cols)
    return read_snapshot(spark, table_dir, fp)


def snapshot_history(table_dir: str | pathlib.Path) -> list[dict]:
    """Commit chain of a table, NEWEST first: walk parent pointers from
    LATEST (Iceberg's snapshot-history metadata, kept as the manifests
    themselves). Pre-chain manifests (no parent field) terminate the
    walk. Pure driver-side metadata — never touches data files."""
    table_dir = pathlib.Path(table_dir)
    latest = table_dir / "LATEST"
    if not latest.exists():
        return []
    out, fp = [], latest.read_text().strip().removeprefix("snap-")
    seen: set = set()
    while fp and fp not in seen:
        seen.add(fp)
        man_path = _snap_dir(table_dir, fp) / "manifest.json"
        if not man_path.exists():
            break
        man = json.loads(man_path.read_text())
        out.append(man)
        fp = man.get("parent")
    return out


def read_snapshot_asof(spark: SparkSession,
                       table_dir: str | pathlib.Path,
                       asof: str) -> DataFrame:
    """Time travel: read the newest commit on the LATEST chain with
    ``committed_at <= asof`` (ISO-8601 UTC, the manifests' own format —
    lexicographic comparison is chronological). Raises if the whole
    chain is newer than ``asof``."""
    for man in snapshot_history(table_dir):
        if man["committed_at"] <= asof:
            return read_snapshot(spark, table_dir, man["fingerprint"])
    raise ValueError(f"no snapshot committed at or before {asof!r} "
                     f"in {table_dir}")


def rollback(table_dir: str | pathlib.Path, fp: str) -> dict:
    """Atomically point LATEST back at an existing snapshot (Iceberg
    ``rollback_to_snapshot``). The abandoned commits stay on disk —
    re-readable by fingerprint, GC'd by :func:`expire_snapshots`."""
    if not snapshot_exists(table_dir, fp):
        raise ValueError(f"snapshot {fp!r} does not exist in {table_dir}")
    latest = pathlib.Path(table_dir) / "LATEST"
    tmp = latest.with_suffix(".tmp")
    tmp.write_text(f"snap-{fp}")
    tmp.replace(latest)
    return read_manifest(table_dir, fp)


def expire_snapshots(table_dir: str | pathlib.Path,
                     keep_last: int = 2) -> list[str]:
    """Retention GC (Iceberg ``expire_snapshots``): delete every snapshot
    directory NOT among the newest ``keep_last`` commits of the LATEST
    chain. Returns the expired fingerprints. Resume interplay
    (documented): an expired stage fingerprint simply recomputes on the
    next run — expiry trades storage for recompute, never correctness."""
    import shutil

    table_dir = pathlib.Path(table_dir)
    keep = {m["fingerprint"]
            for m in snapshot_history(table_dir)[:max(keep_last, 1)]}
    expired = []
    for snap in sorted(table_dir.glob("snap-*")):
        fp = snap.name.removeprefix("snap-")
        if fp not in keep:
            shutil.rmtree(snap)
            expired.append(fp)
    return expired
