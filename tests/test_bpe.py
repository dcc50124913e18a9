"""Distributed BPE merge training (operators/bpe) vs a pure-Python
reference implementation: exact merge-sequence equality (pairs, order,
weighted counts), greedy non-overlap semantics ("aaaa" → two "aa"), and
the deterministic tie-break."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.bpe import (  # noqa: E402
    train_bpe,
)


def ref_bpe(texts, n_merges):
    freqs = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    words = [(list(w), f) for w, f in freqs.items()]
    rules = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in words:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        # count desc, then lexicographic (a, b) asc — the operator's
        # documented tie-break
        (a, b), n = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((a, b, n))
        out_words = []
        for syms, f in words:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            out_words.append((out, f))
        words = out_words
    return rules


TEXTS = ["low lower lowest low",
         "new newer newest new new",
         "wider wide widest low new",
         "hug hugs hugged hug"]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])


def test_matches_reference_merge_sequence(spark):
    got = train_bpe(_docs(spark), 10)
    want = ref_bpe(TEXTS, 10)
    assert [(a, b, int(n)) for a, b, n in got] == want


def test_greedy_nonoverlap_and_exhaustion(spark):
    texts = ["aaaa aaaa bb"]
    got = train_bpe(_docs(spark, texts), 50)
    want = ref_bpe(texts, 50)
    assert [(a, b, int(n)) for a, b, n in got] == want
    # first merge is (a,a) with weight 3 per word occurrence? no:
    # "aaaa" has 3 adjacent (a,a) pairs × freq 2 = 6
    assert got[0][:2] == ("a", "a") and int(got[0][2]) == 6
    # exhaustion: fewer rules than requested, loop stopped cleanly
    assert len(got) < 50


def test_tie_break_is_lexicographic(spark):
    # "ba" and "ab" both appear twice; (a,b) must win over (b,a)
    texts = ["ab ab ba ba"]
    got = train_bpe(_docs(spark, texts), 1)
    assert got[0][:2] == ("a", "b")
    assert ref_bpe(texts, 1)[0][:2] == ("a", "b")


def ref_encode(texts, rules):
    """Per-text piece sequence by replaying the merge rules in rank order
    (the reference apply semantics — identical fold as ref_bpe's rounds)."""
    def enc_word(w):
        syms = list(w)
        for a, b, *_ in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    return [[p for w in t.split() for p in enc_word(w)] for t in texts]


def test_bpe_encode_matches_reference(spark):
    from openapi_to_rdf_spark.operators.bpe import bpe_encode

    texts = ["the cat sat on the mat", "the cats sat", "a mat on a cat",
             "aaaa aaa the the the"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rules = ref_bpe(texts, 12)
    got = {r.doc_id: list(r.pieces)
           for r in bpe_encode(docs, rules).collect()}
    expected = dict(enumerate(ref_encode(texts, rules)))
    assert got == expected


def test_bpe_encode_roundtrip_and_zero_rules(spark):
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.bpe import bpe_encode

    texts = ["abc abd", "abc abc"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    # zero rules -> pure character split
    got = {r.doc_id: list(r.pieces) for r in bpe_encode(docs, []).collect()}
    assert got == {0: list("abcabd"), 1: list("abcabc")}
    # concatenating pieces always reconstructs the tokenized text
    rules = ref_bpe(texts, 5)
    enc = bpe_encode(docs, rules).withColumn(
        "joined", F.concat_ws("", "pieces"))
    for r in enc.collect():
        assert r.joined == texts[r.doc_id].replace(" ", "")


def test_piece_frequencies(spark):
    from openapi_to_rdf_spark.operators.bpe import piece_frequencies

    texts = ["the cat", "the the"]
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    rules = ref_bpe(texts, 4)
    got = {r.piece: r.n_occurrences
           for r in piece_frequencies(docs, rules).collect()}
    expected = {}
    for seq in ref_encode(texts, rules):
        for p in seq:
            expected[p] = expected.get(p, 0) + 1
    assert got == expected
