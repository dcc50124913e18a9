"""Term-dictionary encoding — openapi_to_rdf_spark.operators.dictionary."""

import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.dictionary import (
    audit_collisions, decode_triples, encode_triples, encoding_stats,
    term_dictionary, term_dictionary_hash,
)


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("e:a", "p:knows", "e:b"),
        ("e:a", "p:knows", "e:c"),
        ("e:b", "p:name", "bob"),
        ("e:c", "p:name", "carol"),
        ("e:c", "p:knows", "e:a"),
    ]
    return spark.createDataFrame(rows, "s string, p string, o string")


def _as_set(df):
    return {tuple(r) for r in df.select("s", "p", "o").collect()}


def test_dense_ids_are_lexical_ranks(spark, triples):
    d = term_dictionary(triples).collect()
    terms = sorted(r["term"] for r in d)
    assert len(terms) == 7  # e:a e:b e:c p:knows p:name bob carol
    by_term = {r["term"]: r["id"] for r in d}
    assert [by_term[t] for t in terms] == list(range(1, 8))


def test_round_trip_dense(spark, triples):
    d = term_dictionary(triples)
    enc = encode_triples(triples, d)
    assert set(enc.columns) == {"s_id", "p_id", "o_id"}
    assert enc.count() == 5
    assert _as_set(decode_triples(enc, d)) == _as_set(triples)


def test_round_trip_hash_and_audit(spark, triples):
    d = term_dictionary_hash(triples)
    assert audit_collisions(d).count() == 0
    enc = encode_triples(triples, d)
    assert _as_set(decode_triples(enc, d)) == _as_set(triples)
    # hash ids are content-addressed: rebuilding yields identical ids
    again = {r["term"]: r["id"] for r in term_dictionary_hash(triples).collect()}
    for r in d.collect():
        assert again[r["term"]] == r["id"]
        assert r["id"] >= 0


def test_encoding_stats_compression(spark, triples):
    d = term_dictionary(triples)
    row = encoding_stats(triples, encode_triples(triples, d), d).first()
    assert row["n_triples"] == 5 and row["n_terms"] == 7
    assert row["raw_bytes"] == sum(
        len(s) + len(p) + len(o) for s, p, o in _as_set(triples))
    assert row["encoded_bytes"] == 5 * 24


def test_extra_columns_pass_through(spark, triples):
    with_extra = triples.withColumn("w", F.length("o"))
    d = term_dictionary(triples)
    enc = encode_triples(with_extra, d)
    assert "w" in enc.columns
    back = decode_triples(enc, d)
    got = {(r["s"], r["p"], r["o"]): r["w"] for r in back.collect()}
    assert got[("e:b", "p:name", "bob")] == 3
