"""Structured-Streaming ingest for the transcript → triple factory.

The reference is batch-only (SURVEY.md §2.4: streaming absent); this is the
engine extension for continuously-arriving transcripts. Design:

- the micro-batch path (``foreachBatch``) reuses the *batch* extractor
  verbatim, so streaming and batch emission semantics are identical by
  construction; per-turn/entity dedup applies within each micro-batch, and
  global set semantics land in the downstream snapshot merge (exactly like
  re-running the batch pipeline over an appended partition).
- exactly-once: the sink appends Parquet keyed by ``batch_id`` under the
  output dir and Spark's streaming checkpoint (WAL + committed offsets)
  guarantees a batch is either fully reprocessed or skipped on restart —
  re-delivered batches overwrite their own partition (idempotent).
- a pure-streaming variant (``stream_turn_triples``) exposes the stateless
  transform chain directly (regex/explode/joins are all streaming-safe) with
  watermarked within-watermark dedup for pipelines that want a true
  continuous query instead of micro-batch commits.
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.extract import extract_transcript_triples


def stream_turn_triples(stream: DataFrame, class_vocab: DataFrame | None = None,
                        watermark: str = "10 minutes") -> DataFrame:
    """Continuous-query variant: stateless emission + watermarked dedup.

    Input: a STREAMING DataFrame with the transcript schema. Output: a
    streaming triple DataFrame. Every dedup in the extractor runs as
    ``dropDuplicatesWithinWatermark`` here (within_watermark=True), so the
    dedup state is EVICTED as event time advances — state stays bounded by
    the watermark delay, not the corpus (ADVICE r1: plain dropDuplicates on
    keys without the event-time column never evicts). Keys recurring after
    eviction re-emit; use the foreachBatch path when corpus-global dedup is
    required (the downstream snapshot merge restores set semantics either
    way).
    """
    wm = stream.withWatermark("ts", watermark)
    return extract_transcript_triples(wm, class_vocab, within_watermark=True)


def start_stream_pipeline(stream: DataFrame, output_dir: str,
                          class_vocab: DataFrame | None = None,
                          trigger_once: bool = True,
                          construct: str | None = None,
                          rules: DataFrame | None = None):
    """foreachBatch micro-batch pipeline: batch extractor + idempotent
    per-batch Parquet commit + per-batch metrics sidecar.

    ``construct``: an optional SPARQL CONSTRUCT string (sparql.py surface)
    run over each batch's freshly-extracted triples; the derived triples
    commit idempotently under ``derived/`` — materialized inference
    maintained incrementally. Semantics are BATCH-LOCAL: a rule fires when
    all its premises are in the same micro-batch, which is exact for
    conversation-contained rules because the ingest contract delivers a
    conversation's turns together (the same premise-locality assumption
    the incremental entailment stage makes); cross-conversation rules
    belong in the batch pipeline over the merged snapshot.

    ``rules``: an optional shape-rules table (operators.shapes layout) —
    each batch's triples are validated with validate_triples and the
    violations commit idempotently under ``violations/``, the streaming
    counterpart of the batch pipeline's quarantine stage. Same batch-local
    caveat: class-scoped minCount (count=0) and sh:class checks see one
    conversation's triples at a time, which is exact for the kg rules
    because extraction emits a subject's rdf:type alongside its
    properties in the same batch.

    Returns the StreamingQuery (caller awaits termination).
    """
    out = pathlib.Path(output_dir)
    data_dir = out / "triples"
    derived_dir = out / "derived"
    viol_dir = out / "violations"
    metrics_dir = out / "_batch_metrics"

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        triples = extract_transcript_triples(batch_df, class_vocab)
        # partition-by-batch overwrite => replayed batches are idempotent
        (triples.withColumn("batch_id", F.lit(batch_id))
         .write.mode("overwrite")
         .parquet(str(data_dir / f"batch_id={batch_id}")))
        if construct:
            from ..sparql import sparql_query

            committed = spark.read.parquet(
                str(data_dir / f"batch_id={batch_id}"))
            (sparql_query(committed.select("s", "p", "o"), construct)
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .parquet(str(derived_dir / f"batch_id={batch_id}")))
        if rules is not None:
            from ..operators.shapes import validate_triples

            (validate_triples(triples, rules)
             .withColumn("batch_id", F.lit(batch_id))
             .write.mode("overwrite")
             .parquet(str(viol_dir / f"batch_id={batch_id}")))
        n = spark.read.parquet(str(data_dir / f"batch_id={batch_id}")).count()
        (spark.createDataFrame([(batch_id, n)], "batch_id long, triples long")
         .write.mode("overwrite")
         .parquet(str(metrics_dir / f"batch_id={batch_id}")))

    writer = (stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", str(out / "_checkpoint")))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_triples(spark, output_dir: str) -> DataFrame:
    """Read back everything the streaming pipeline has committed."""
    return spark.read.option("basePath", str(pathlib.Path(output_dir) / "triples")) \
        .parquet(str(pathlib.Path(output_dir) / "triples" / "batch_id=*"))


def read_stream_derived(spark, output_dir: str) -> DataFrame:
    """Read back the CONSTRUCT-derived triples committed per batch."""
    return spark.read.option("basePath", str(pathlib.Path(output_dir) / "derived")) \
        .parquet(str(pathlib.Path(output_dir) / "derived" / "batch_id=*"))


def read_stream_violations(spark, output_dir: str) -> DataFrame:
    """Read back the per-batch shape-validation quarantine."""
    return spark.read.option(
        "basePath", str(pathlib.Path(output_dir) / "violations")) \
        .parquet(str(pathlib.Path(output_dir) / "violations" / "batch_id=*"))
