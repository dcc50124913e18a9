"""Cross-document line boilerplate: census + order-preserving strip."""

from pyspark.sql import functions as F

from openapi_to_rdf_spark.operators.dedup import (
    boilerplate_lines, strip_boilerplate,
)

HDR = "Subscribe to our newsletter"


def _docs(spark):
    rows = [
        (1, f"{HDR}\nalpha body one\nbravo body two"),
        (2, f"  {HDR.upper()}  \ncharlie body\ndelta body"),
        (3, f"{HDR.lower()}\necho body\nalpha body one"),
        (4, f"{HDR}\n{HDR}\nfoxtrot body"),   # repeated within ONE doc
        (5, HDR),                              # pure boilerplate
        (6, "golf body\nhotel body"),          # no boilerplate at all
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_census_counts_distinct_docs_after_normalization(spark):
    got = {r.line: r.n_docs
           for r in boilerplate_lines(_docs(spark), min_df=3).collect()}
    # case/whitespace variants collapse; doc 4's duplicate counts ONCE
    assert got == {HDR.lower(): 5}


def test_strip_preserves_order_and_returns_empty_for_pure_boilerplate(spark):
    got = {r.doc_id: r.text
           for r in strip_boilerplate(_docs(spark), min_df=3).collect()}
    assert got == {
        1: "alpha body one\nbravo body two",
        2: "charlie body\ndelta body",
        3: "echo body\nalpha body one",
        4: "foxtrot body",
        5: "",                       # all-boilerplate doc kept, emptied
        6: "golf body\nhotel body",  # untouched
    }


def test_strip_below_threshold_is_identity(spark):
    d = _docs(spark)
    got = {r.doc_id: r.text for r in strip_boilerplate(d, min_df=6).collect()}
    # HDR appears in 5 docs < 6: nothing qualifies, every text round-trips
    assert got == {r.doc_id: r.text for r in d.collect()}


def test_strip_plan_broadcasts_census(spark):
    plan = strip_boilerplate(_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
