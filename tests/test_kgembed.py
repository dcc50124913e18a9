"""TransE link prediction (operators/kgembed): every Spark result is
cross-checked against an independent pure-Python/NumPy re-derivation of
the same integer arithmetic — hash init, L1 scores, sign-SGD epoch,
filtered ranks."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.kgembed import (
    corruption_pairs, embedding_rows, hash_embeddings,
    link_prediction_ranks, lp_metrics, relation_index, transe_epoch,
    transe_score,
)
from openapi_to_rdf_spark.operators.negatives import entity_index

DIM, SPAN = 8, 8

TRIPLES = [
    ("a", "likes", "b"), ("a", "likes", "c"), ("b", "likes", "c"),
    ("c", "knows", "d"), ("d", "knows", "a"), ("b", "knows", "d"),
    ("e", "likes", "a"), ("e", "knows", "b"),
]


def ref_vec(name: str) -> np.ndarray:
    out = []
    for j in range(DIM):
        h = hashlib.md5(f"{name}\x01{j}".encode()).hexdigest()[:8]
        out.append(int(h, 16) % (2 * SPAN + 1) - SPAN)
    return np.array(out, dtype=np.int64)


def ref_score(s, p, o):
    return int(np.abs(ref_vec(s) + ref_vec(p) - ref_vec(o)).sum())


@pytest.fixture(scope="module")
def store(spark):
    df = spark.createDataFrame(TRIPLES, "s string, p string, o string") \
        .withColumn("o_kind", F.lit("iri"))
    ents = entity_index(df)
    return (df, hash_embeddings(ents, dim=DIM, span=SPAN),
            hash_embeddings(relation_index(df), name_col="name",
                            dim=DIM, span=SPAN))


def test_hash_embeddings_match_reference(store):
    _, ent_emb, _ = store
    rows = {r["name"]: r["vec"] for r in ent_emb.collect()}
    assert set(rows) == {"a", "b", "c", "d", "e"}
    for name, vec in rows.items():
        assert vec == list(ref_vec(name))
        assert all(-SPAN <= v <= SPAN for v in vec)


def test_transe_score_matches_numpy(store):
    df, ent_emb, rel_emb = store
    got = {(r["s"], r["p"], r["o"]): r["score"]
           for r in transe_score(df, ent_emb, rel_emb).collect()}
    assert len(got) == len(TRIPLES)
    for (s, p, o), sc in got.items():
        assert sc == ref_score(s, p, o)


def _ref_pairs(k=1):
    """Reproduce corruption_pairs in pure Python."""
    ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    pos = set(TRIPLES)
    out = []
    for (s, p, o) in TRIPLES:
        for side in ("s", "o"):
            for j in range(k):
                h = hashlib.md5(
                    "\x01".join([s, p, o, side, str(j)]).encode()
                ).hexdigest()[:8]
                pick = ents[int(h, 16) % len(ents)]
                cs, co = (pick, o) if side == "s" else (s, pick)
                if (side == "s" and pick == s) or \
                   (side == "o" and pick == o):
                    continue
                if (cs, p, co) in pos:
                    continue
                out.append((s, p, o, side, j, cs, co))
    return out


def test_corruption_pairs_match_reference(store):
    df, _, _ = store
    got = {tuple(r) for r in corruption_pairs(df, k=1)
           .select("s", "p", "o", "side", "j", "cs", "co").collect()}
    assert got == set(_ref_pairs(1))


def _ref_epoch(pairs, margin=4, lr=1):
    """Full-batch integer sign-SGD epoch in NumPy."""
    ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    rels = sorted({t[1] for t in TRIPLES})
    E = {e: ref_vec(e).copy() for e in ents}
    R = {r: ref_vec(r).copy() for r in rels}
    dE = {e: np.zeros(DIM, dtype=np.int64) for e in ents}
    dR = {r: np.zeros(DIM, dtype=np.int64) for r in rels}
    for (s, p, o, side, j, cs, co) in pairs:
        d_pos = int(np.abs(E[s] + R[p] - E[o]).sum())
        d_neg = int(np.abs(E[cs] + R[p] - E[co]).sum())
        if d_pos + margin > d_neg:
            g = np.sign(E[s] + R[p] - E[o]).astype(np.int64)
            gn = np.sign(E[cs] + R[p] - E[co]).astype(np.int64)
            dE[s] -= lr * g
            dE[o] += lr * g
            dR[p] -= lr * g
            dE[cs] += lr * gn
            dE[co] -= lr * gn
            dR[p] += lr * gn
    return ({e: E[e] + dE[e] for e in ents},
            {r: R[r] + dR[r] for r in rels})


def test_transe_epoch_matches_numpy(store):
    df, ent_emb, rel_emb = store
    pairs = corruption_pairs(df, k=1)
    new_e, new_r = transe_epoch(pairs, ent_emb, rel_emb, margin=4, lr=1)
    exp_e, exp_r = _ref_epoch(_ref_pairs(1), margin=4, lr=1)
    got_e = {r["name"]: r["vec"] for r in new_e.collect()}
    got_r = {r["name"]: r["vec"] for r in new_r.collect()}
    assert {k: list(v) for k, v in exp_e.items()} == got_e
    assert {k: list(v) for k, v in exp_r.items()} == got_r
    # the epoch must actually move something (pairs exist and violate)
    base = {r["name"]: r["vec"] for r in ent_emb.collect()}
    assert any(got_e[n] != base[n] for n in got_e)


def test_embedding_rows_flatten(store):
    _, ent_emb, _ = store
    rows = embedding_rows(ent_emb).collect()
    assert len(rows) == 5 * DIM
    one = {(r["dim"]): r["v"] for r in rows if r["name"] == "a"}
    assert [one[j] for j in range(DIM)] == list(ref_vec("a"))


def _ref_ranks():
    ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    pos = set(TRIPLES)
    out = {}
    for (s, p, o) in TRIPLES:
        gold = ref_score(s, p, o)
        better = 0
        for c in ents:
            if c == o or (s, p, c) in pos:
                continue
            if ref_score(s, p, c) < gold:
                better += 1
        out[(s, p, o)] = better + 1
    return out


def test_link_prediction_ranks_match_numpy(store):
    df, ent_emb, rel_emb = store
    got = {(r["s"], r["p"], r["o"]): r["rank"]
           for r in link_prediction_ranks(df, df, ent_emb, rel_emb)
           .collect()}
    assert got == _ref_ranks()


def test_lp_metrics_integer_exact(store):
    df, ent_emb, rel_emb = store
    ranks = link_prediction_ranks(df, df, ent_emb, rel_emb)
    m = lp_metrics(ranks).collect()[0]
    ref = _ref_ranks()
    assert m["n"] == len(ref)
    assert m["sum_rank"] == sum(ref.values())
    assert m["sum_rr_e6"] == sum(1_000_000 // r for r in ref.values())
    for k in (1, 3, 10):
        assert m[f"hits_{k}"] == sum(1 for r in ref.values() if r <= k)


def test_transe_train_two_epochs_matches_numpy(store):
    from openapi_to_rdf_spark.operators.kgembed import transe_train

    df, ent_emb, rel_emb = store
    pairs = corruption_pairs(df, k=1)
    got_e, got_r = transe_train(pairs, ent_emb, rel_emb, epochs=2,
                                margin=4, lr=1)

    ref_pairs = _ref_pairs(1)
    E, R = _ref_epoch(ref_pairs, margin=4, lr=1)

    def ref_epoch_from(E, R, pairs, margin=4, lr=1):
        dE = {e: np.zeros(DIM, dtype=np.int64) for e in E}
        dR = {r: np.zeros(DIM, dtype=np.int64) for r in R}
        for (s, p, o, side, j, cs, co) in pairs:
            d_pos = int(np.abs(E[s] + R[p] - E[o]).sum())
            d_neg = int(np.abs(E[cs] + R[p] - E[co]).sum())
            if d_pos + margin > d_neg:
                g = np.sign(E[s] + R[p] - E[o]).astype(np.int64)
                gn = np.sign(E[cs] + R[p] - E[co]).astype(np.int64)
                dE[s] -= lr * g
                dE[o] += lr * g
                dR[p] -= lr * g
                dE[cs] += lr * gn
                dE[co] -= lr * gn
                dR[p] += lr * gn
        return ({e: E[e] + dE[e] for e in E},
                {r: R[r] + dR[r] for r in R})

    E2, R2 = ref_epoch_from(E, R, ref_pairs)
    assert {r["name"]: r["vec"] for r in got_e.collect()} == \
        {k: list(v) for k, v in E2.items()}
    assert {r["name"]: r["vec"] for r in got_r.collect()} == \
        {k: list(v) for k, v in R2.items()}


def test_epoch_reduces_violated_margin_loss(store):
    """Sanity: one epoch decreases the total hinge loss over the SAME
    pair set (full-batch sign step with small lr on this store)."""
    df, ent_emb, rel_emb = store
    pairs = corruption_pairs(df, k=1)

    def loss(e, r):
        p = pairs.join(e.select(F.col("name").alias("s"),
                                F.col("vec").alias("_es")), "s") \
            .join(e.select(F.col("name").alias("o"),
                           F.col("vec").alias("_eo")), "o") \
            .join(e.select(F.col("name").alias("cs"),
                           F.col("vec").alias("_ecs")), "cs") \
            .join(e.select(F.col("name").alias("co"),
                           F.col("vec").alias("_eco")), "co") \
            .join(r.select(F.col("name").alias("p"),
                           F.col("vec").alias("_rp")), "p")
        l1 = lambda a, b, c: F.aggregate(  # noqa: E731
            F.zip_with(F.zip_with(F.col(a), F.col(b), lambda x, y: x + y),
                       F.col(c), lambda x, y: x - y),
            F.lit(0).cast("long"), lambda acc, v: acc + F.abs(v))
        h = F.greatest(F.lit(0).cast("long"),
                       l1("_es", "_rp", "_eo") + F.lit(4)
                       - l1("_ecs", "_rp", "_eco"))
        return p.agg(F.sum(h)).collect()[0][0]

    before = loss(ent_emb, rel_emb)
    new_e, new_r = transe_epoch(pairs, ent_emb, rel_emb, margin=4, lr=1)
    after = loss(new_e, new_r)
    assert after < before


def test_complex_score_matches_numpy_and_asymmetry(store):
    from openapi_to_rdf_spark.operators.kgembed import complex_score

    df, ent_emb, rel_emb = store
    got = {(r["s"], r["p"], r["o"]): r["score"]
           for r in complex_score(df, ent_emb, rel_emb).collect()}
    h = DIM // 2
    for (s, p, o), sc in got.items():
        es, rp, eo = ref_vec(s), ref_vec(p), ref_vec(o)
        re_s, im_s = es[:h], es[h:]
        re_r, im_r = rp[:h], rp[h:]
        re_o, im_o = eo[:h], eo[h:]
        exp = int((re_s * re_r * re_o + im_s * re_r * im_o
                   + re_s * im_r * im_o - im_s * im_r * re_o).sum())
        assert sc == exp
    # asymmetry: score(s,p,o) != score(o,p,s) somewhere (DistMult can't)
    spark = df.sparkSession
    rev = df.select(F.col("o").alias("s"), "p", F.col("s").alias("o"))
    rev_got = {(r["s"], r["p"], r["o"]): r["score"]
               for r in complex_score(rev, ent_emb, rel_emb).collect()}
    assert any(got[(s, p, o)] != rev_got[(o, p, s)]
               for (s, p, o) in got)


def _ref_ranks_model(score, higher):
    ents = sorted({t[0] for t in TRIPLES} | {t[2] for t in TRIPLES})
    pos = set(TRIPLES)
    out = {}
    for (s, p, o) in TRIPLES:
        gold = score(s, p, o)
        better = 0
        for c in ents:
            if c == o or (s, p, c) in pos:
                continue
            cs = score(s, p, c)
            if (cs > gold) if higher else (cs < gold):
                better += 1
        out[(s, p, o)] = better + 1
    return out


@pytest.mark.parametrize("model,higher", [("transe", False),
                                          ("distmult", True),
                                          ("complex", True)])
def test_link_prediction_ranks_all_models(store, model, higher):
    df, ent_emb, rel_emb = store
    got = {(r["s"], r["p"], r["o"]): r["rank"]
           for r in link_prediction_ranks(df, df, ent_emb, rel_emb,
                                          model=model).collect()}
    h = DIM // 2

    def sc(s, p, o):
        es, rp, eo = ref_vec(s), ref_vec(p), ref_vec(o)
        if model == "transe":
            return int(np.abs(es + rp - eo).sum())
        if model == "distmult":
            return int((es * rp * eo).sum())
        re_s, im_s = es[:h], es[h:]
        re_r, im_r = rp[:h], rp[h:]
        re_o, im_o = eo[:h], eo[h:]
        return int((re_s * re_r * re_o + im_s * re_r * im_o
                    + re_s * im_r * im_o - im_s * im_r * re_o).sum())

    assert got == _ref_ranks_model(sc, higher)
