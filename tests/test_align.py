"""Instance-based ontology alignment (operators.align)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.align import (  # noqa: E402
    align_classes,
    best_alignment,
    class_profiles,
    drop_ubiquitous,
)

SCHEMA = "s string, p string, o string"
T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _graph(spec):
    """spec: {class: (n_instances, [preds])} → triple rows."""
    rows = []
    for cls, (n, preds) in spec.items():
        for i in range(n):
            s = f"{cls}/{i}"
            rows.append((s, T, cls))
            for p in preds:
                rows.append((s, p, f"v{i}"))
    return rows


def test_profiles_are_distinct_pred_sets(spark):
    g = _df(spark, _graph({"A": (3, ["p", "q"]), "B": (1, ["q"])}))
    got = {(r.cls, r.pred) for r in class_profiles(g).collect()}
    assert got == {("A", "p"), ("A", "q"), ("B", "q")}


def test_alignment_recovers_renamed_classes(spark):
    a = _df(spark, _graph({
        "v1:Cust": (4, ["nation", "balance", "segment"]),
        "v1:Supp": (3, ["nation", "rating"]),
    }))
    b = _df(spark, _graph({
        "v2:Client": (2, ["nation", "balance", "since"]),
        "v2:Vendor": (2, ["nation", "rating"]),
    }))
    best = {r.class_a: (r.class_b, r.shared)
            for r in best_alignment(align_classes(a, b)).collect()}
    assert best == {"v1:Cust": ("v2:Client", 2),
                    "v1:Supp": ("v2:Vendor", 2)}


def test_integer_jaccard_threshold_boundary(spark):
    a = _df(spark, _graph({"A": (1, ["p", "q", "r"])}))
    b = _df(spark, _graph({"B": (1, ["p", "q", "x"])}))
    # jaccard = 2/4 exactly; >= 1/2 keeps, anything stricter drops
    keep = align_classes(a, b, threshold=(1, 2)).collect()
    assert [(r.class_a, r.class_b) for r in keep] == [("A", "B")]
    assert align_classes(a, b, threshold=(201, 400)).count() == 0


def test_drop_ubiquitous_prunes_hub_predicates(spark):
    g = _df(spark, _graph({
        "A": (1, ["label", "pa"]), "B": (1, ["label", "pb"]),
        "C": (1, ["label", "pc"]),
    }))
    pruned = drop_ubiquitous(class_profiles(g), max_classes=2)
    assert {r.pred for r in pruned.collect()} == {"pa", "pb", "pc"}
    # alignment across copies of the graph no longer matches via label
    cands = align_classes(g, g, max_classes_per_pred=2).collect()
    assert {(r.class_a, r.class_b) for r in cands} == {
        ("A", "A"), ("B", "B"), ("C", "C")}


def test_best_alignment_tiebreak_deterministic(spark):
    a = _df(spark, _graph({"A": (1, ["p", "q"])}))
    b = _df(spark, _graph({"B1": (1, ["p", "q"]), "B2": (1, ["p", "q"])}))
    best = best_alignment(align_classes(a, b)).collect()
    assert len(best) == 1 and best[0].class_b == "B1"
