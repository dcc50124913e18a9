"""Structured-Streaming ingest: file-source micro-batches through the batch
extractor with checkpointed exactly-once commits."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.sources.transcripts import (  # noqa: E402
    class_vocab_df, synth_transcripts,
)
from openapi_to_rdf_spark.streaming.ingest import (  # noqa: E402
    read_stream_triples, start_stream_pipeline,
)
from openapi_to_rdf_spark.operators.extract import (  # noqa: E402
    extract_transcript_triples,
)


def test_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "incoming"
    out = tmp_path / "out"

    turns = synth_transcripts(spark, 100, seed=7)
    # arrival in two chunks, split by conversation (a conversation's turns
    # arrive together, preserving the stable turn-ordering invariant)
    turns.filter(F.col("conv_id") < "c000000050").coalesce(1) \
        .write.parquet(str(src / "chunk0"))
    turns.filter(F.col("conv_id") >= "c000000050").coalesce(1) \
        .write.parquet(str(src / "chunk1"))

    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true").parquet(str(src)))
    q = start_stream_pipeline(stream, str(out), class_vocab_df(spark))
    q.awaitTermination(120)

    got = read_stream_triples(spark, str(out)) \
        .select("file", "graph", "s", "p", "o_kind", "o", "o_datatype") \
        .dropDuplicates()
    expected = extract_transcript_triples(turns, class_vocab_df(spark)) \
        .dropDuplicates()
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()

    # restart with no new data: checkpoint makes it a no-op (exactly-once)
    n_before = read_stream_triples(spark, str(out)).count()
    stream2 = (spark.readStream.schema(turns.schema)
               .option("recursiveFileLookup", "true").parquet(str(src)))
    q2 = start_stream_pipeline(stream2, str(out), class_vocab_df(spark))
    q2.awaitTermination(120)
    assert read_stream_triples(spark, str(out)).count() == n_before


def test_stateful_conversation_tracking(spark, tmp_path):
    """applyInPandasWithState: per-conversation running summaries accumulate
    across micro-batches (update mode, state survives between batches)."""
    from openapi_to_rdf_spark.streaming.stateful import track_conversations

    src = tmp_path / "src"
    turns = synth_transcripts(spark, 30, seed=11)
    # two chunks SPLIT BY TURN: the same conversation appears in both batches,
    # so correct totals require state carry-over
    turns.filter(F.col("turn_idx") < 2).coalesce(1).write.parquet(str(src / "c0"))
    turns.filter(F.col("turn_idx") >= 2).coalesce(1).write.parquet(str(src / "c1"))

    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = (track_conversations(stream).writeStream
         .format("memory").queryName("convs").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    # last update per conversation must equal the batch ground truth
    got = (spark.table("convs")
           .groupBy("conv_id").agg(F.max("n_turns").alias("n_turns")))
    expected = turns.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()


def test_incremental_canonicalization_equals_batch(spark, tmp_path):
    """Streaming canonical map == full-recompute canonical map (VERDICT r1
    task 7). Three micro-batches split by conversation: alias spellings of
    one entity arrive in DIFFERENT batches, so equality requires the
    incremental new-vs-seen band join to find cross-batch pairs."""
    from openapi_to_rdf_spark.operators.canonicalize import canonical_entity_map
    from openapi_to_rdf_spark.streaming.incremental import (
        batch_entities, merge_batch, read_canonical_map,
        start_incremental_canonicalization,
    )

    turns = synth_transcripts(spark, 120, seed=13)
    src = tmp_path / "src"
    for i, (lo, hi) in enumerate([("c000000000", "c000000040"),
                                  ("c000000040", "c000000080"),
                                  ("c000000080", "c999999999")]):
        (turns.filter((F.col("conv_id") >= lo) & (F.col("conv_id") < hi))
         .coalesce(1).write.parquet(str(src / f"chunk{i}")))

    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    state = tmp_path / "state"
    q = start_incremental_canonicalization(stream, str(state),
                                           class_vocab_df(spark))
    q.awaitTermination(180)

    got = read_canonical_map(spark, str(state))
    ents = batch_entities(turns, class_vocab_df(spark))
    expected = canonical_entity_map(ents, threshold=0.9)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
    # cross-batch merging actually happened (not all singletons)
    assert got.filter(F.col("ent") != F.col("canonical")).count() > 0

    # replaying the LAST batch (mid-commit crash model) is a no-op: the
    # state excludes the batch's own partitions when computing its delta
    last_ents = batch_entities(
        spark.read.parquet(str(src / "chunk2")), class_vocab_df(spark))
    merge_batch(spark, state, last_ents, batch_id=2, threshold=0.9)
    replayed = read_canonical_map(spark, str(state))
    assert replayed.exceptAll(expected).isEmpty()
    assert expected.exceptAll(replayed).isEmpty()


def test_cli_stream_subcommand(spark, tmp_path, capsys):
    """`stream` CLI: drain a transcript directory into committed triple
    batches + the incremental canonical map."""
    from openapi_to_rdf_spark.cli import main

    turns = synth_transcripts(spark, 40, seed=21)
    turns.coalesce(1).write.parquet(str(tmp_path / "in" / "c0"))
    rc = main(["stream", "--input-dir", str(tmp_path / "in"),
               "--output-dir", str(tmp_path / "out"), "--canonicalize"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "triples committed:" in out and "canonical map:" in out
    n_expected = extract_transcript_triples(turns, class_vocab_df(spark)).count()
    n_line = [ln for ln in out.splitlines() if "triples committed" in ln][0]
    assert int(n_line.split(":")[1]) == n_expected


def test_stream_compaction_equals_batch_graph(spark, tmp_path):
    """Streamed batches + incremental canonical map + compaction == the
    batch pipeline's remapped graph (canonicalization is retroactive, so
    compaction — not per-batch remap — is the correct materialization)."""
    from openapi_to_rdf_spark.operators.canonicalize import (
        canonical_entity_map, remap_triples,
    )
    from openapi_to_rdf_spark.operators.extract import (
        ENT_NS, KG_NS, extract_transcript_triples,
    )
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot
    from openapi_to_rdf_spark.streaming.incremental import (
        compact_graph, start_incremental_canonicalization,
    )
    from openapi_to_rdf_spark.streaming.ingest import start_stream_pipeline

    turns = synth_transcripts(spark, 80, seed=17)
    src = tmp_path / "src"
    turns.filter(F.col("conv_id") < "c000000040").coalesce(1) \
        .write.parquet(str(src / "c0"))
    turns.filter(F.col("conv_id") >= "c000000040").coalesce(1) \
        .write.parquet(str(src / "c1"))

    def stream():
        return (spark.readStream.schema(turns.schema)
                .option("recursiveFileLookup", "true")
                .option("maxFilesPerTrigger", "1").parquet(str(src)))

    out, state = tmp_path / "out", tmp_path / "state"
    start_stream_pipeline(stream(), str(out), class_vocab_df(spark)) \
        .awaitTermination(120)
    start_incremental_canonicalization(stream(), str(state),
                                       class_vocab_df(spark)) \
        .awaitTermination(180)

    man = compact_graph(spark, str(out), str(state), str(tmp_path / "wd"))
    got = (read_snapshot(spark, tmp_path / "wd" / "graph", man["fingerprint"])
           .select("file", "graph", "s", "p", "o_kind", "o", "o_datatype"))

    tr = extract_transcript_triples(turns, class_vocab_df(spark))
    ents = (tr.filter(F.col("p") == KG_NS + "surfaceForm")
            .select(F.col("s").alias("ent"), F.col("o").alias("surface"))
            .dropDuplicates(["ent"]))
    expected = remap_triples(tr, canonical_entity_map(ents, threshold=0.9),
                             ENT_NS)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
    # re-compacting with unchanged state resumes (same fingerprint)
    assert compact_graph(spark, str(out), str(state),
                         str(tmp_path / "wd"))["fingerprint"] == man["fingerprint"]


def test_continuous_variant_runs(spark, tmp_path):
    """stream_turn_triples: the pure-streaming path executes across MULTIPLE
    micro-batches and emits the same triple set as batch; its dedups are
    watermark-evicted (bounded state), not plain dropDuplicates."""
    from openapi_to_rdf_spark.streaming.ingest import stream_turn_triples

    turns = synth_transcripts(spark, 20, seed=9)
    turns.filter(F.col("conv_id") < "c000000010").coalesce(1) \
        .write.parquet(str(tmp_path / "src" / "c0"))
    turns.filter(F.col("conv_id") >= "c000000010").coalesce(1) \
        .write.parquet(str(tmp_path / "src" / "c1"))
    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(tmp_path / "src")))
    out = stream_turn_triples(stream, class_vocab_df(spark))

    # bounded-state evidence: the analyzed plan dedups WITHIN the watermark
    # (state evicted by event time), with no unbounded Deduplicate node
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan
    assert "\nDeduplicate " not in plan.replace("DeduplicateWithinWatermark", "DWW")

    q = (out.writeStream.format("memory").queryName("cont_t").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # keys recurring after watermark eviction may re-emit identical rows —
    # set-compare, as the downstream snapshot merge would
    got = spark.table("cont_t").dropDuplicates()
    expected = extract_transcript_triples(turns, class_vocab_df(spark))
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()


def test_incremental_links_score_once_and_match_batch(spark, tmp_path):
    """Incremental linking: each representative surface is scored at most
    once ever (cache growth proves it), the result equals a from-scratch
    link_entities over the current representatives, and retroactive
    canonical merges are handled by lookup, not rescoring."""
    from openapi_to_rdf_spark.operators.linker import link_entities
    from openapi_to_rdf_spark.streaming.incremental import (
        batch_entities, incremental_links, merge_batch, read_canonical_map,
    )
    from openapi_to_rdf_spark.sources.transcripts import entity_registry_df

    reg = entity_registry_df(spark)
    turns = synth_transcripts(spark, 80, seed=13)
    state = tmp_path / "state"

    b1 = turns.filter(F.col("conv_id") < "c000000040")
    merge_batch(spark, state, batch_entities(b1, class_vocab_df(spark)),
                batch_id=0, threshold=0.9)
    l1 = incremental_links(spark, str(state), reg)
    n_cached_1 = sum(1 for d in state.glob("link_cache-*/*.parquet"))
    assert l1.filter(F.col("entity_id").isNotNull()).count() > 0

    b2 = turns.filter(F.col("conv_id") >= "c000000040")
    merge_batch(spark, state, batch_entities(b2, class_vocab_df(spark)),
                batch_id=1, threshold=0.9)
    l2 = incremental_links(spark, str(state), reg)

    # equality with a from-scratch link over the CURRENT representatives.
    # localCheckpoint both sides: exceptAll over dropDuplicates(subset)
    # lineage trips the same Catalyst attribute-binding bug noted in
    # test_read_transcript_table_formats
    reps = (read_canonical_map(spark, str(state))
            .select(F.col("canonical").alias("ent"))
            .dropDuplicates(["ent"])
            .withColumn("m_key", F.regexp_extract("ent", "([^#]+)$", 1)))
    expected = (link_entities(reps, reg, class_col=None)
                .select("ent",
                        F.col("entity_id").cast("string").alias("entity_id"),
                        "sim", "score")).localCheckpoint()
    l2 = l2.localCheckpoint()
    assert l2.exceptAll(expected).isEmpty()
    assert expected.exceptAll(l2).isEmpty()

    # cache grew (new surfaces scored) but third call scores nothing new
    n_cached_2 = sum(1 for d in state.glob("link_cache-*/*.parquet"))
    assert n_cached_2 > n_cached_1
    l3 = incremental_links(spark, str(state), reg).localCheckpoint()
    n_cached_3 = sum(1 for d in state.glob("link_cache-*/*.parquet"))
    assert n_cached_3 == n_cached_2          # pure lookup, no rescoring
    assert l3.exceptAll(expected).isEmpty()

    # every linked representative resolves to its true registry id
    for r in l2.filter(F.col("entity_id").isNotNull()).collect():
        assert int(r.entity_id) == int(r.ent[-4:]), (r.ent, r.entity_id)


def test_incremental_doc_dedup_matches_batch(spark, tmp_path):
    """merge_dedup_batch: two-batch ingest produces the SAME cluster map
    as a single-shot recompute — exact dups (same normalized text) and
    near dups (small edit) both crossing the batch boundary; replaying a
    batch is a no-op."""
    from openapi_to_rdf_spark.operators.canonicalize import (
        band_table, nonempty_normalized, verify_pairs,
    )
    from openapi_to_rdf_spark.operators.components import (
        connected_components,
    )
    from openapi_to_rdf_spark.functions.text import doc_fingerprint
    from openapi_to_rdf_spark.streaming.incremental import (
        merge_dedup_batch, read_dedup_map,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the observers take careful notes about the behavior")
    docs = [
        (1, base),
        (2, base + "!!"),                       # exact dup (normalizes equal)
        (3, base.replace("careful", "detailed")),   # near dup of 1
        (4, "completely unrelated text about spark shuffle partitions "
            "and adaptive query execution behavior at scale"),
        (5, base.replace("observers", "watchers")),  # near dup, batch 2
        (6, base + " !?"),                      # exact dup, batch 2
        (7, "another singleton document with its own vocabulary entirely"),
    ]
    b1 = spark.createDataFrame(docs[:4], ["doc_id", "text"])
    b2 = spark.createDataFrame(docs[4:], ["doc_id", "text"])

    sd = tmp_path / "state"
    merge_dedup_batch(spark, sd, b1, batch_id=0, threshold=0.8)
    merge_dedup_batch(spark, sd, b2, batch_id=1, threshold=0.8)
    inc = {r.doc_id: r.canonical for r in read_dedup_map(spark, sd).collect()}
    assert len(inc) == 7

    # batch ground truth: same machinery in one shot
    all_df = (spark.createDataFrame(docs, ["doc_id", "text"])
              .select(F.col("doc_id").cast("string").alias("id"), "text")
              .withColumn("fingerprint", doc_fingerprint(F.col("text"))))
    witness = all_df.groupBy("fingerprint").agg(F.min("id").alias("w"))
    exact = (all_df.join(witness, "fingerprint")
             .filter(F.col("id") != F.col("w"))
             .select(F.least("id", "w").alias("src"),
                     F.greatest("id", "w").alias("dst")))
    bands = band_table(nonempty_normalized(all_df, "text"), "id", "text",
                       k=64, bands=8)
    cand = (bands.alias("a").join(bands.alias("b"), ["band", "band_hash"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates())
    near = verify_pairs(cand, all_df, "id", "text", threshold=0.8)
    comps = connected_components(exact.unionByName(near)
                                 .dropDuplicates(["src", "dst"]))
    full = {r.node: r.component for r in comps.collect()}
    expected = {int(i): int(full.get(str(i), str(i))) for i, _ in docs}
    assert {int(k): int(v) for k, v in inc.items()} == expected

    # the planted structure actually holds: {1,2,3,5,6} one cluster
    assert len({inc[str(i)] for i in (1, 2, 3, 5, 6)}) == 1
    assert inc["4"] != inc["1"] and inc["7"] != inc["1"]

    # replay batch 1: cluster map unchanged (idempotent)
    merge_dedup_batch(spark, sd, b2, batch_id=1, threshold=0.8)
    again = {r.doc_id: r.canonical
             for r in read_dedup_map(spark, sd).collect()}
    assert again == inc

    # the same merge driven through Structured Streaming (one file per
    # micro-batch) lands on an equivalent clustering: canonical picks may
    # differ with arrival order, but the PARTITION of docs is identical
    from openapi_to_rdf_spark.streaming.incremental import (
        start_incremental_doc_dedup,
    )
    src = tmp_path / "src"
    b1.coalesce(1).write.parquet(str(src / "slice0"))
    b2.coalesce(1).write.parquet(str(src / "slice1"))
    stream = (spark.readStream.schema(b1.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    st2 = tmp_path / "state2"
    q = start_incremental_doc_dedup(stream, str(st2), threshold=0.8)
    q.awaitTermination(180)
    streamed = {r.doc_id: r.canonical
                for r in read_dedup_map(spark, st2).collect()}

    def groups(cmap):
        inv = {}
        for d, c in cmap.items():
            inv.setdefault(c, set()).add(d)
        return {frozenset(v) for v in inv.values()}

    assert groups(streamed) == groups(inc)


def test_compact_dedup_state_preserves_map_and_replay(spark, tmp_path):
    """Compaction rewrites the batch_id partitions into one base sentinel:
    cluster map identical, a FURTHER merge still finds cross-boundary
    near-dups against the compacted state, replay stays a no-op, and a
    second compaction alternates sentinels without loss."""
    from openapi_to_rdf_spark.streaming.incremental import (
        compact_dedup_state, merge_dedup_batch, read_dedup_map,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the observers take careful notes about the behavior")
    b1 = spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about spark shuffle "
                        "partitions and adaptive query execution")],
        ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(3, base + "!!")], ["doc_id", "text"])              # exact dup of 1
    b3 = spark.createDataFrame(
        [(4, base.replace("careful", "detailed"))],          # near dup of 1
        ["doc_id", "text"])

    sd = tmp_path / "state"
    merge_dedup_batch(spark, sd, b1, batch_id=0, threshold=0.8)
    merge_dedup_batch(spark, sd, b2, batch_id=1, threshold=0.8)
    before = {r.doc_id: r.canonical
              for r in read_dedup_map(spark, sd).collect()}

    n = compact_dedup_state(spark, sd)
    assert n["docs"] == 2 and n["bands"] == 2 and n["edges"] == 2
    assert [d.name for d in sorted((sd / "docs").glob("batch_id=*"))] \
        == ["batch_id=-1"]

    # replay batch 1 against the compacted state: still a no-op
    merge_dedup_batch(spark, sd, b2, batch_id=1, threshold=0.8)
    after = {r.doc_id: r.canonical
             for r in read_dedup_map(spark, sd).collect()}
    assert after == before

    # a NEW batch still merges against compacted history (near dup of 1)
    merge_dedup_batch(spark, sd, b3, batch_id=2, threshold=0.8)
    m = {r.doc_id: r.canonical for r in read_dedup_map(spark, sd).collect()}
    assert m["4"] == m["1"] == m["3"] and m["2"] != m["1"]

    # second compaction alternates the sentinel, map still intact
    n2 = compact_dedup_state(spark, sd)
    assert n2["docs"] == 3  # base + replayed(empty) + new partitions
    merge_dedup_batch(spark, sd, b3, batch_id=2, threshold=0.8)
    m2 = {r.doc_id: r.canonical
          for r in read_dedup_map(spark, sd).collect()}
    assert m2 == m


def test_stream_construct_matches_batch(spark, tmp_path):
    """Per-batch SPARQL CONSTRUCT (materialized inference maintained
    incrementally): for a conversation-contained rule the streamed
    derivation equals the batch CONSTRUCT over all triples, because the
    ingest contract delivers a conversation's turns together."""
    from openapi_to_rdf_spark.operators.extract import KG_NS
    from openapi_to_rdf_spark.sparql import sparql_query
    from openapi_to_rdf_spark.streaming.ingest import read_stream_derived

    src = tmp_path / "incoming"
    out = tmp_path / "out"
    turns = synth_transcripts(spark, 60, seed=11)
    turns.filter(F.col("conv_id") < "c000000030").coalesce(1) \
        .write.parquet(str(src / "chunk0"))
    turns.filter(F.col("conv_id") >= "c000000030").coalesce(1) \
        .write.parquet(str(src / "chunk1"))

    rule = (f'PREFIX kg: <{KG_NS}> '
            'CONSTRUCT { ?c kg:hasUserTurn ?t } '
            'WHERE { ?c kg:hasTurn ?t . ?t kg:role "user" }')
    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = start_stream_pipeline(stream, str(out), class_vocab_df(spark),
                              construct=rule)
    q.awaitTermination(120)

    got = read_stream_derived(spark, str(out)) \
        .select("s", "p", "o").dropDuplicates()
    expected = sparql_query(
        extract_transcript_triples(turns, class_vocab_df(spark))
        .select("s", "p", "o"), rule)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
    assert got.count() > 0
    assert {r.p for r in got.select("p").distinct().collect()} == {
        KG_NS + "hasUserTurn"}


def test_stream_validation_matches_batch(spark, tmp_path):
    """Per-batch shape validation (streaming quarantine): for
    conversation-contained rules the streamed violation set equals batch
    validate_triples over all extracted triples."""
    from openapi_to_rdf_spark.operators.extract import KG_NS
    from openapi_to_rdf_spark.operators.shapes import validate_triples
    from openapi_to_rdf_spark.streaming.ingest import read_stream_violations

    xsd = "http://www.w3.org/2001/XMLSchema#"
    # stricter-than-real rule so the synthetic corpus actually violates:
    # only "user" is an allowed role
    rules = spark.createDataFrame(
        [("kg", KG_NS + "Turn", KG_NS + "role", xsd + "string", 1, 1,
          ["user"], None, None)],
        "file string, target_class string, path string, datatype string, "
        "min_count int, max_count int, in_values array<string>, "
        "node_kind string, pattern string")

    src = tmp_path / "incoming"
    out = tmp_path / "out"
    turns = synth_transcripts(spark, 60, seed=13)
    turns.filter(F.col("conv_id") < "c000000030").coalesce(1) \
        .write.parquet(str(src / "chunk0"))
    turns.filter(F.col("conv_id") >= "c000000030").coalesce(1) \
        .write.parquet(str(src / "chunk1"))

    stream = (spark.readStream.schema(turns.schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    q = start_stream_pipeline(stream, str(out), class_vocab_df(spark),
                              rules=rules)
    q.awaitTermination(120)

    got = read_stream_violations(spark, str(out)) \
        .select("s", "p", "o", "violation", "detail").dropDuplicates()
    expected = validate_triples(
        extract_transcript_triples(turns, class_vocab_df(spark)), rules)
    assert got.exceptAll(expected).isEmpty()
    assert expected.exceptAll(got).isEmpty()
    assert got.filter(F.col("violation") == "notInList").count() > 0


def test_incremental_state_refuses_banding_config_change(spark, tmp_path):
    """r4: band tables are universe-keyed state — resuming a state dir
    under a different (k, bands, shingle, hash_mode) configuration must
    raise loudly instead of silently losing cross-batch candidates."""
    import pytest as _pytest

    from openapi_to_rdf_spark.streaming.incremental import merge_batch

    ents = spark.createDataFrame([("e1", "srv-1"), ("e2", "srv.1")],
                                 ["ent", "surface"])
    sd = tmp_path / "state"
    merge_batch(spark, sd, ents, batch_id=0, threshold=0.9, k=64)
    # same config replays fine (idempotent path already tested elsewhere)
    merge_batch(spark, sd, ents, batch_id=1, threshold=0.9, k=64)
    with _pytest.raises(ValueError, match="banding config"):
        merge_batch(spark, sd, ents, batch_id=2, threshold=0.9, k=32)


def test_incremental_state_refuses_unstamped_legacy_dir(spark, tmp_path):
    """ADVICE r4 (medium): a state dir that already HOLDS state but lacks
    banding.json predates stamping — its signature universe is unknown
    (pre-r4 dirs are md5-universe), so merge_batch must refuse instead of
    silently stamping the CURRENT config over it. An explicit
    write_banding_stamp with the original configuration unblocks it."""
    import pytest as _pytest

    from openapi_to_rdf_spark.streaming.incremental import (
        merge_batch, write_banding_stamp)

    ents = spark.createDataFrame([("e1", "srv-1"), ("e2", "srv.1")],
                                 ["ent", "surface"])
    sd = tmp_path / "state"
    merge_batch(spark, sd, ents, batch_id=0, threshold=0.9, k=64)
    (sd / "banding.json").unlink()          # simulate a pre-stamp dir
    with _pytest.raises(ValueError, match="no banding.json stamp"):
        merge_batch(spark, sd, ents, batch_id=1, threshold=0.9, k=64)

    # the operator who KNOWS the original universe stamps it explicitly —
    # resume then works under the matching config and still refuses others
    write_banding_stamp(sd, k=64, bands=8, shingle=3, threshold=0.9)
    merge_batch(spark, sd, ents, batch_id=1, threshold=0.9, k=64)
    with _pytest.raises(ValueError, match="banding config"):
        merge_batch(spark, sd, ents, batch_id=2, threshold=0.9, k=64,
                    hash_mode="md5")
    # a second explicit stamp must not overwrite the first
    with _pytest.raises(ValueError, match="refusing to overwrite"):
        write_banding_stamp(sd, k=32, bands=4, shingle=3, threshold=0.9)


def test_incremental_stamp_derives_from_band_table_args(spark, tmp_path):
    """ADVICE r4: the stamp must reflect the ACTUAL band_table signature
    universe, not hardcoded literals — a non-default seed/hash_mode must
    land in banding.json verbatim."""
    import json

    from openapi_to_rdf_spark.streaming.incremental import merge_batch

    ents = spark.createDataFrame([("e1", "srv-1")], ["ent", "surface"])
    sd = tmp_path / "state"
    merge_batch(spark, sd, ents, batch_id=0, threshold=0.9, k=64,
                seed=11, hash_mode="md5")
    stamp = json.loads((sd / "banding.json").read_text())
    assert stamp["seed"] == 11 and stamp["hash_mode"] == "md5"
    assert stamp["k"] == 64 and stamp["bands"] == 8
