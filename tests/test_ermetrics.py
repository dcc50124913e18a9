"""ER clustering evaluation (operators.ermetrics) vs a pure-Python
pair-enumerating reference."""

import itertools
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.ermetrics import clustering_metrics  # noqa: E402


def _maps(spark, pred, gold):
    p = spark.createDataFrame(list(pred.items()), "ent string, canon string")
    g = spark.createDataFrame(list(gold.items()), "ent string, canon string")
    return p, g


def _py_reference(pred, gold):
    """Brute-force pair enumeration + per-item B-cubed."""
    items = sorted(set(pred) & set(gold))
    tp = pp = gp = 0
    for a, b in itertools.combinations(items, 2):
        sp, sg = pred[a] == pred[b], gold[a] == gold[b]
        pp += sp
        gp += sg
        tp += sp and sg
    b3p = b3r = 0.0
    for m in items:
        cell = sum(1 for x in items
                   if pred[x] == pred[m] and gold[x] == gold[m])
        b3p += cell / sum(1 for x in items if pred[x] == pred[m])
        b3r += cell / sum(1 for x in items if gold[x] == gold[m])
    n = len(items)
    pair_p = tp / pp if pp else 1.0
    pair_r = tp / gp if gp else 1.0
    return dict(n_items=n, tp_pairs=tp, pred_pairs=pp, gold_pairs=gp,
                pair_p=pair_p, pair_r=pair_r,
                b3_p=b3p / n, b3_r=b3r / n)


def _check(spark, pred, gold):
    p, g = _maps(spark, pred, gold)
    row = clustering_metrics(p, g).collect()[0]
    ref = _py_reference(pred, gold)
    assert row.n_items == ref["n_items"]
    assert row.tp_pairs == ref["tp_pairs"]
    assert row.pred_pairs == ref["pred_pairs"]
    assert row.gold_pairs == ref["gold_pairs"]
    assert row.pair_precision_e6 == round(ref["pair_p"] * 1e6)
    assert row.pair_recall_e6 == round(ref["pair_r"] * 1e6)
    assert row.b3_precision_e6 == round(ref["b3_p"] * 1e6)
    assert row.b3_recall_e6 == round(ref["b3_r"] * 1e6)
    return row


def test_perfect_clustering_scores_one(spark):
    pred = {f"m{i}": f"c{i % 3}" for i in range(9)}
    row = _check(spark, pred, dict(pred))
    assert row.pair_f1_e6 == 1000000
    assert row.b3_f1_e6 == 1000000


def test_over_merge_hits_precision_not_recall(spark):
    gold = {"a": "g1", "b": "g1", "c": "g2", "d": "g2"}
    pred = {k: "one" for k in gold}  # everything merged
    row = _check(spark, pred, gold)
    assert row.pair_recall_e6 == 1000000
    assert row.pair_precision_e6 < 1000000


def test_under_merge_hits_recall_not_precision(spark):
    gold = {"a": "g1", "b": "g1", "c": "g1", "d": "g2"}
    pred = {k: k for k in gold}  # all singletons
    row = _check(spark, pred, gold)
    # no predicted pairs at all -> precision pinned to 1.0 by convention
    assert row.pair_precision_e6 == 1000000
    assert row.pair_recall_e6 == 0
    assert row.b3_precision_e6 == 1000000
    assert row.b3_recall_e6 < 1000000


def test_mixed_partition_matches_bruteforce(spark):
    gold = {f"m{i}": f"g{i % 4}" for i in range(20)}
    pred = {f"m{i}": f"p{(i + (1 if i % 5 == 0 else 0)) % 4}"
            for i in range(20)}
    _check(spark, pred, gold)


def test_unlabeled_mentions_dropped(spark):
    gold = {"a": "g1", "b": "g1"}
    pred = {"a": "p1", "b": "p1", "z": "p9"}  # z has no gold label
    row = _check(spark, {k: pred[k] for k in gold}, gold)
    full = clustering_metrics(*_maps(spark, pred, gold)).collect()[0]
    assert (full.n_items, full.tp_pairs) == (row.n_items, row.tp_pairs)
