"""Vocabulary induction + OOV coverage (operators/vocab): deterministic
top-V with lexicographic ties, per-doc coverage incl. the empty-document
edge, and vocab/scorer tokenizer agreement. Driver oracles ``vocab_top``
/ ``vocab_oov`` pin both against DuckDB at sf0.01."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.vocab import (  # noqa: E402
    build_vocab, oov_stats,
)

DOCS = [(1, "alpha beta beta gamma"),
        (2, "alpha alpha delta"),
        (3, ""),                      # no tokens at all
        (4, "??? !!!"),               # tokenizer yields nothing
        (5, "epsilon zeta")]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_build_vocab_counts_and_ties(spark):
    got = [(r.term, r.term_count, r.term_rank)
           for r in build_vocab(_docs(spark), size=3)
           .orderBy("term_rank").collect()]
    # alpha=3, beta=2, then the count-1 terms tie → lexicographic
    assert got == [("alpha", 3, 1), ("beta", 2, 2), ("delta", 1, 3)]


def test_oov_stats_per_doc(spark):
    docs = _docs(spark)
    vocab = build_vocab(docs, size=3)  # {alpha, beta, delta}
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.oov_rate_e6)
           for r in oov_stats(docs, vocab).collect()}
    assert got[1] == (4, 1, 250000)    # gamma is OOV
    assert got[2] == (3, 0, 0)         # fully covered
    assert got[3] == (0, 0, 0)         # empty doc stays present
    assert got[4] == (0, 0, 0)         # punctuation-only likewise
    assert got[5] == (2, 2, 1000000)   # fully OOV
    assert set(got) == {1, 2, 3, 4, 5}
