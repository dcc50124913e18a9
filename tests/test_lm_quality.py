"""Char-ngram LM perplexity (CCNet-style quality scoring)."""

import math

import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.lm_quality import (
    ALPHABET_SIZE, lm_perplexity, perplexity_filter, train_char_lm)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat. the cat sat again."),
        (1, "The CAT   sat on the mat -- the cat sat AGAIN?"),  # same normalized
        (2, "zq"),                                   # too short: 0 grams
        (3, "xjqz vwkp qqqq zzzz xjqz vwkp"),        # garbage vs corpus
        (4, "the mat sat on the cat"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _py_lm(texts, n=3):
    import re
    from collections import Counter
    grams = Counter()
    for t in texts:
        s = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
        for i in range(len(s) - n + 1):
            grams[s[i:i + n]] += 1
    ctx = Counter()
    for g, c in grams.items():
        ctx[g[:n - 1]] += c
    return grams, ctx


def _py_nlp(text, grams, ctx, n=3, alpha=0.1):
    import re
    s = re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()
    lps = []
    for i in range(len(s) - n + 1):
        g = s[i:i + n]
        p = (grams.get(g, 0) + alpha) / (ctx.get(g[:n - 1], 0)
                                         + alpha * ALPHABET_SIZE)
        lps.append(-math.log(p))
    return (len(lps), sum(lps) / len(lps)) if lps else (0, None)


def test_matches_pure_python(docs):
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    grams, ctx = _py_lm(rows.values())
    got = {r["doc_id"]: r for r in lm_perplexity(docs).collect()}
    assert set(got) == set(rows)
    for did, text in rows.items():
        n_grams, nlp = _py_nlp(text, grams, ctx)
        assert got[did]["n_grams"] == n_grams
        if nlp is None:
            assert got[did]["nlp_e6"] is None and got[did]["ppl_e6"] is None
        else:
            assert got[did]["nlp_e6"] == round(nlp * 1e6)
            assert got[did]["ppl_e6"] == round(math.exp(nlp) * 1e6)


def test_normalization_invariance_and_garbage_ordering(docs):
    got = {r["doc_id"]: r["ppl_e6"] for r in lm_perplexity(docs).collect()}
    assert got[0] == got[1]            # case/punct-invariant
    assert got[2] is None              # too short to score
    assert got[3] > got[0]             # garbage scores worse than corpus-like
    assert got[3] > got[4]


def test_cross_corpus_scoring(spark, docs):
    """Train on the in-domain docs, score held-out text (the CCNet shape):
    unseen grams in unseen contexts back off to uniform 1/V."""
    lm = train_char_lm(docs.filter("doc_id <= 1"))
    heldout = spark.createDataFrame(
        [(9, "!!??;;")], "doc_id int, text string")  # normalizes to ""
    got = lm_perplexity(heldout, lm).collect()[0]
    assert got["n_grams"] == 0 and got["ppl_e6"] is None

    unseen = spark.createDataFrame([(8, "wwww")], "doc_id int, text string")
    r = lm_perplexity(unseen, lm).collect()[0]
    assert r["n_grams"] == 2
    assert r["nlp_e6"] == round(-math.log(1 / ALPHABET_SIZE) * 1e6)


def test_perplexity_filter_keeps_short_docs(docs):
    lm = train_char_lm(docs)
    scored = {r["doc_id"]: r["ppl_e6"]
              for r in lm_perplexity(docs, lm).collect()}
    cutoff = scored[0] / 1e6 + 0.5
    kept = {r["doc_id"]
            for r in perplexity_filter(docs, lm, max_ppl=cutoff).collect()}
    assert 0 in kept and 1 in kept and 2 in kept   # short doc kept
    assert 3 not in kept                            # garbage filtered


def test_plan_is_python_free(docs):
    plan = (lm_perplexity(docs)
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_compression_ratio_orders_redundancy(spark):
    from openapi_to_rdf_spark.operators.lm_quality import compression_ratio

    docs = spark.createDataFrame(
        [("rep", "spam " * 400),
         ("prose", "The quarterly fault report lists heterogeneous alarm "
                   "causes across managed elements, each with distinct "
                   "severity, timestamps and operator annotations."),
         ("empty", "")], ["doc_id", "text"])
    out = {r.doc_id: r for r in compression_ratio(docs).collect()}
    assert out["rep"].ratio < 0.05                  # repetition collapses
    assert out["prose"].ratio > out["rep"].ratio
    assert out["empty"].ratio is None
    assert out["prose"].raw_bytes == len(
        "The quarterly fault report lists heterogeneous alarm causes "
        "across managed elements, each with distinct severity, "
        "timestamps and operator annotations.".encode())
    # deterministic across runs
    again = {r.doc_id: r.gz_bytes for r in compression_ratio(docs).collect()}
    assert again == {k: v.gz_bytes for k, v in out.items()}


def test_compression_ratio_python_zlib_oracle(spark):
    """VERDICT r2 #5 tail: doc_compression's exact oracle. zlib is not
    SQL-expressible, so the independent twin is plain Python zlib over the
    same parquet — every (raw_bytes, gz_bytes) must match bit-for-bit on
    the full sf0.001 corpus."""
    import zlib

    import pyarrow.parquet as pq

    from openapi_to_rdf_spark.operators.lm_quality import compression_ratio

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = {r.doc_id: (r.raw_bytes, r.gz_bytes)
           for r in compression_ratio(docs).collect()}

    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    exp = {int(d): (len(t.encode("utf-8")),
                    len(zlib.compress(t.encode("utf-8"), 6)))
           for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())}
    assert got == exp
