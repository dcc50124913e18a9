"""Deterministic training shuffle (sampling.shuffle_shards)."""

import hashlib

from openapi_to_rdf_spark.operators.sampling import shuffle_shards


def _mk(spark, n=200):
    return spark.createDataFrame([(i, f"d{i}") for i in range(n)],
                                 "doc_id long, text string")


def ref_assign(i, seed, n_shards):
    h = hashlib.md5(f"{i}\x01{seed}".encode()).hexdigest()
    return int(h[:8], 16) % n_shards, h


def test_matches_python_md5_and_positions(spark):
    df = _mk(spark)
    rows = shuffle_shards(df, 8, "doc_id", seed="ep1").collect()
    exp = {}
    for i in range(200):
        sh, h = ref_assign(i, "ep1", 8)
        exp.setdefault(sh, []).append((h, i))
    exp_pos = {}
    for sh, lst in exp.items():
        for pos, (_, i) in enumerate(sorted(lst)):
            exp_pos[i] = (sh, pos)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in rows}
    assert got == exp_pos


def test_positions_dense_per_shard(spark):
    rows = shuffle_shards(_mk(spark), 4, "doc_id").collect()
    per = {}
    for r in rows:
        per.setdefault(r["shard"], []).append(r["pos"])
    assert set(per) <= set(range(4))
    for poss in per.values():
        assert sorted(poss) == list(range(len(poss)))


def test_seed_reshuffles(spark):
    df = _mk(spark)
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(df, 8, "doc_id", seed="a").collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shuffle_shards(df, 8, "doc_id", seed="b").collect()}
    assert a != b  # epoch reshuffle actually re-deals
    assert set(a) == set(b)  # but it's the same row universe


def test_original_columns_survive(spark):
    out = shuffle_shards(_mk(spark, 10), 2, "doc_id")
    assert set(out.columns) == {"doc_id", "text", "shard", "pos"}
