"""Greedy sequence packing (operators/packing): semantics pinned on
planted token sequences; the driver hash-verifies ``doc_packing`` against
a DuckDB recursive-CTE walk."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.packing import (  # noqa: E402
    pack_documents, pack_stats,
)


def _packed(spark, rows, budget):
    df = spark.createDataFrame(rows, "lang string, doc_id long, t long")
    out = pack_documents(df, budget=budget, tokens_col="t")
    return {(r.lang, r.doc_id): r.pack_id for r in out.collect()}


def test_greedy_boundaries_exact(spark):
    rows = [("en", i, t) for i, t in
            enumerate([300, 150, 100, 400, 60, 30, 500, 10])]
    got = _packed(spark, rows, 500)
    assert got == {("en", 0): 0, ("en", 1): 0,   # 300+150 = 450
                   ("en", 2): 1, ("en", 3): 1,   # 100+400 = 500, exact fit
                   ("en", 4): 2, ("en", 5): 2,   # 60+30 = 90
                   ("en", 6): 3,                 # 90+500 > 500 -> new pack
                   ("en", 7): 4}                 # 500+10 > 500 -> new pack


def test_exact_fit_and_overflow(spark):
    rows = [("en", 0, 250), ("en", 1, 250), ("en", 2, 1), ("en", 3, 499)]
    got = _packed(spark, rows, 500)
    # 250+250 = 500 fits exactly; 1 opens pack 1; 1+499 = 500 fits
    assert got == {("en", 0): 0, ("en", 1): 0, ("en", 2): 1, ("en", 3): 1}


def test_oversize_doc_own_pack(spark):
    rows = [("en", 0, 100), ("en", 1, 900), ("en", 2, 100), ("en", 3, 100)]
    got = _packed(spark, rows, 500)
    # 900 > budget: own pack (never merged with neighbours)
    assert got == {("en", 0): 0, ("en", 1): 1, ("en", 2): 2, ("en", 3): 2}


def test_groups_pack_independently(spark):
    rows = [("en", 0, 400), ("de", 1, 400), ("en", 2, 400), ("de", 3, 400)]
    got = _packed(spark, rows, 500)
    assert got == {("en", 0): 0, ("en", 2): 1, ("de", 1): 0, ("de", 3): 1}


def test_deterministic_across_partitionings(spark):
    rows = [("l%d" % (i % 3), i, 37 + (i * 17) % 211) for i in range(300)]
    df2 = spark.createDataFrame(rows, "lang string, doc_id long, t long") \
        .repartition(2)
    df16 = spark.createDataFrame(rows, "lang string, doc_id long, t long") \
        .repartition(16)
    a = {(r.lang, r.doc_id): r.pack_id for r in
         pack_documents(df2, 500, tokens_col="t").collect()}
    b = {(r.lang, r.doc_id): r.pack_id for r in
         pack_documents(df16, 500, tokens_col="t").collect()}
    assert a == b and len(a) == 300


def test_pack_stats_fill_and_oversize(spark):
    rows = [("en", 0, 400), ("en", 1, 50), ("en", 2, 900)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, t long")
    packed = pack_documents(df, 500, tokens_col="t")
    st = pack_stats(packed, budget=500).collect()[0]
    # packs: [400+50]=450, [900]; fill = avg(450,900)/500 = 1.35
    assert (st.n_packs, st.n_docs, st.n_oversize) == (2, 3, 1)
    assert abs(st.fill_rate - 1.35) < 1e-9


def test_packing_default_tokens_match_doc_tokens(spark):
    """Default token counting equals the hash-verified doc_tokens basis."""
    from openapi_to_rdf_spark.functions.text import token_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_documents(docs, budget=500)
    direct = docs.select("doc_id", token_count(F.col("text")).cast("long")
                         .alias("n_tokens"))
    assert (packed.select("doc_id", "n_tokens")
            .exceptAll(direct).isEmpty())


def test_assemble_packs_ids_segments_digest(spark):
    import hashlib

    from openapi_to_rdf_spark.operators.packing import assemble_packs

    docs = spark.createDataFrame(
        [("en", 1, "a b c"), ("en", 2, "d e"), ("en", 3, "f g h i"),
         ("de", 1, "x y z w q")], ["lang", "doc_id", "text"])
    out = {(r.lang, r.pack_id): r
           for r in assemble_packs(docs, budget=5).collect()}
    en0 = out[("en", 0)]
    # docs 1+2 fit the 5-token budget; doc 3 opens pack 1
    assert (en0.n_docs, en0.seq_len) == (2, 5)
    assert en0.segment_ids == [0, 0, 0, 1, 1]
    assert len(en0.input_ids) == 5
    assert all(0 <= t < 32768 for t in en0.input_ids)
    # same token -> same id within and across packs (hash determinism)
    assert en0.content_sha == hashlib.md5(b"a b c\x1ed e").hexdigest()
    en1 = out[("en", 1)]
    assert (en1.n_docs, en1.segment_ids) == (1, [0, 0, 0, 0])


def test_assemble_packs_budget_and_order(spark):
    """Every assembled pack is <= budget tokens unless it is a lone
    oversize doc, and input_ids concatenate docs in ascending id order."""
    from openapi_to_rdf_spark.operators.packing import assemble_packs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = assemble_packs(docs, budget=500).collect()
    assert rows
    for r in rows:
        assert r.seq_len == len(r.input_ids) == len(r.segment_ids)
        assert r.seq_len <= 500 or r.n_docs == 1
        # segment ids are a non-decreasing 0-based run per pack
        assert r.segment_ids[0] == 0 and r.segment_ids[-1] == r.n_docs - 1
        assert all(b - a in (0, 1) for a, b in
                   zip(r.segment_ids, r.segment_ids[1:]))


def test_context_windows_order_and_nulls(spark):
    from openapi_to_rdf_spark.operators.packing import context_windows

    rows = [("c1", 1, "u", "hi"), ("c1", 2, "a", None),
            ("c1", 3, "u", "bye"), ("c2", 1, "u", "solo")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, "
                                     "role string, text string")
    out = context_windows(df, 2, "conv_id", ["turn_idx"],
                          F.col("text"), F.col("text"))
    got = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
    assert got[("c1", 1)]["n_context"] == 0
    assert got[("c1", 2)]["context"] == "hi"
    # NULL line kept as empty string, order preserved
    assert got[("c1", 3)]["context"] == "hi\n"
    assert got[("c1", 3)]["n_context"] == 2
    assert got[("c2", 1)]["n_context"] == 0


def test_sft_pairs_from_transcripts(spark):
    from openapi_to_rdf_spark.operators.packing import sft_pairs
    from openapi_to_rdf_spark.sources.transcripts import synth_transcripts

    turns = synth_transcripts(spark, 50, seed=7).cache()
    pairs = sft_pairs(turns, k=3).collect()
    assert pairs, "expected assistant turns with context"
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in pairs}
    # python reference on one conversation
    rows = sorted(turns.filter(F.col("conv_id") == pairs[0]["conv_id"])
                  .collect(), key=lambda r: r["turn_idx"])
    for i, r in enumerate(rows):
        if r["role"] != "assistant" or i == 0:
            assert (r["conv_id"], r["turn_idx"]) not in by_key
            continue
        want = "\n".join(
            f"{p['role']}: {p['text'] if p['text'] is not None else ''}"
            for p in rows[max(0, i - 3):i])
        got = by_key[(r["conv_id"], r["turn_idx"])]
        assert got["context"] == want
        assert got["target"] == r["text"]
        assert got["n_context"] == min(i, 3)
    turns.unpersist()


# ---- chunk_documents -------------------------------------------------------

def test_chunk_documents_exact_layout(spark):
    from openapi_to_rdf_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, "")],
        ["doc_id", "text"])
    rows = {(r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
            for r in chunk_documents(docs, 4, overlap=1).collect()}
    # 10 words, chunk 4, step 3 -> starts 0,3,6
    assert rows[(1, 0)] == ("a b c d", 4)
    assert rows[(1, 1)] == ("d e f g", 4)
    assert rows[(1, 2)] == ("g h i j", 4)
    assert rows[(2, 0)] == ("x y", 2)      # short doc: one chunk
    assert rows[(3, 0)] == ("", 0)         # empty doc: one empty chunk
    assert len(rows) == 5


def test_chunk_documents_full_coverage_no_overlap(spark):
    from openapi_to_rdf_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(23))
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = (chunk_documents(docs, 5).orderBy("chunk_idx").collect())
    # step == chunk: concatenation reconstructs the document exactly
    assert " ".join(r.chunk_text for r in got) == text
    assert [r.n_tokens for r in got] == [5, 5, 5, 5, 3]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from openapi_to_rdf_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, overlap=4)


def test_chunk_documents_splits_word_array_once(spark):
    from openapi_to_rdf_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = (chunk_documents(docs, 2, overlap=1)
            ._jdf.queryExecution().optimizedPlan().toString())
    assert plan.count("split(") == 1


def test_chunk_documents_invariants_sweep(spark):
    """One job, 121 docs × 3 (chunk, overlap) configs: drop-overlap
    reconstruction recovers every document exactly, chunk sizes are
    bounded, and chunk counts match the pinned ceil arithmetic."""
    import math

    from openapi_to_rdf_spark.operators.packing import chunk_documents

    docs = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(121)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for chunk, overlap in ((7, 0), (10, 3), (4, 3)):
        step = chunk - overlap
        out = {}
        for r in chunk_documents(df, chunk, overlap=overlap).collect():
            out.setdefault(r.doc_id, {})[r.chunk_idx] = (r.chunk_text,
                                                         r.n_tokens)
        for n, text in docs:
            chunks = [out[n][i] for i in range(len(out[n]))]
            expect_k = 1 if n <= chunk else math.ceil((n - chunk) / step) + 1
            assert len(chunks) == expect_k, (n, chunk, overlap)
            assert all(c[1] <= chunk for c in chunks)
            # reconstruction: chunk 0 whole, then drop `overlap` words
            words = []
            for i, (ct, _) in enumerate(chunks):
                ws = ct.split() if ct else []
                words.extend(ws if i == 0 else ws[overlap:])
            assert " ".join(words) == text, (n, chunk, overlap)
