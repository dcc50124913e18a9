"""Golden-record survivorship (operators.consolidate)."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.consolidate import (  # noqa: E402
    consolidate_attributes,
    consolidation_conflicts,
)

SCHEMA = "ent string, attr string, value string, ts timestamp"


def _attrs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _golden(df):
    return {(r.canon, r.attr): (r.value, r.support, r.n_values, r.n_records)
            for r in df.collect()}


def test_majority_picks_most_supported_value(spark):
    rows = [("a1", "city", "Lund", None), ("a2", "city", "Lund", None),
            ("a3", "city", "Lnd", None),
            ("a1", "segment", "AUTO", None)]
    cmap = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("a3", "A")], "ent string, canon string")
    out = _golden(consolidate_attributes(_attrs(spark, rows), cmap))
    assert out[("A", "city")] == ("Lund", 2.0, 2, 3)
    assert out[("A", "segment")] == ("AUTO", 1.0, 1, 1)


def test_majority_tie_breaks_to_smallest_value(spark):
    rows = [("a1", "city", "Oslo", None), ("a2", "city", "Bergen", None)]
    cmap = spark.createDataFrame([("a1", "A"), ("a2", "A")],
                                 "ent string, canon string")
    out = _golden(consolidate_attributes(_attrs(spark, rows), cmap))
    assert out[("A", "city")][0] == "Bergen"


def test_unmapped_mentions_canonicalize_to_themselves(spark):
    rows = [("a1", "city", "Lund", None), ("b9", "city", "Kista", None)]
    cmap = spark.createDataFrame([("a1", "A")], "ent string, canon string")
    out = _golden(consolidate_attributes(_attrs(spark, rows), cmap))
    assert ("A", "city") in out and ("b9", "city") in out
    assert out[("b9", "city")][0] == "Kista"


def test_latest_rule_newest_ts_wins_then_smallest_value(spark):
    import datetime as dt

    t0, t1 = dt.datetime(2026, 1, 1), dt.datetime(2026, 3, 1)
    rows = [("a1", "addr", "old street", t0), ("a2", "addr", "new street", t1),
            # exact-tie timestamps -> lexicographically smallest value
            ("a3", "mail", "zzz@x", t1), ("a4", "mail", "aaa@x", t1)]
    cmap = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("a3", "A"), ("a4", "A")],
        "ent string, canon string")
    out = _golden(consolidate_attributes(_attrs(spark, rows), cmap,
                                         rule="latest", ts_col="ts"))
    assert out[("A", "addr")][0] == "new street"
    assert out[("A", "mail")][0] == "aaa@x"


def test_weight_col_overrides_row_counting(spark):
    df = spark.createDataFrame(
        [("a1", "city", "Lund", 1.0), ("a2", "city", "Kista", 5.0)],
        "ent string, attr string, value string, w double")
    cmap = spark.createDataFrame([("a1", "A"), ("a2", "A")],
                                 "ent string, canon string")
    out = _golden(consolidate_attributes(df, cmap, weight_col="w"))
    assert out[("A", "city")] == ("Kista", 5.0, 2, 2)


def test_null_values_do_not_compete(spark):
    rows = [("a1", "city", None, None), ("a1", "city", None, None),
            ("a2", "city", "Lund", None)]
    cmap = spark.createDataFrame([("a1", "A"), ("a2", "A")],
                                 "ent string, canon string")
    out = _golden(consolidate_attributes(_attrs(spark, rows), cmap))
    assert out[("A", "city")][0] == "Lund"


def test_conflicts_view_orders_most_contested_first(spark):
    rows = [("a1", "city", "X", None), ("a2", "city", "Y", None),
            ("a3", "city", "Z", None),
            ("a1", "seg", "A", None), ("a2", "seg", "B", None),
            ("a1", "ok", "same", None), ("a2", "ok", "same", None)]
    cmap = spark.createDataFrame(
        [(e, "E") for e in ("a1", "a2", "a3")], "ent string, canon string")
    g = consolidate_attributes(_attrs(spark, rows), cmap)
    conf = consolidation_conflicts(g).collect()
    assert [(r.attr, r.n_values) for r in conf] == [("city", 3), ("seg", 2)]


def test_deterministic_under_repartition(spark):
    rows = [(f"m{i}", "city", ["Lund", "Kista", "Oslo"][i % 3], None)
            for i in range(60)]
    cmap = spark.createDataFrame(
        [(f"m{i}", f"E{i % 4}") for i in range(60)],
        "ent string, canon string")
    a = _golden(consolidate_attributes(_attrs(spark, rows), cmap))
    b = _golden(consolidate_attributes(
        _attrs(spark, rows).repartition(16), cmap.repartition(7)))
    assert a == b


def test_bad_rule_and_missing_ts_rejected(spark):
    df = _attrs(spark, [("a1", "city", "Lund", None)])
    with pytest.raises(ValueError):
        consolidate_attributes(df, rule="newest")
    with pytest.raises(ValueError):
        consolidate_attributes(df, rule="latest")
