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
