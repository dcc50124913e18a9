"""Physical-plan audit: regenerates PLANS.md — one row per flagship query
with the optimizer properties the engine's 100 TB claims rest on
(exchange count, join strategies, parquet pushdown, Python-freeness,
whole-stage-codegen spans). Explain-only: nothing executes.

Usage: python scripts/plan_audit.py [> PLANS.md]
"""

import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SF = "/root/testdata/sf0.01"

# flagship paths, one per operator family
AUDIT = [
    "kg_extract", "kg_canonicalize", "minhash_clusters", "simhash_pairs",
    "ngram_dup_pairs", "cosine_topk", "ann_topk", "bm25_topk",
    "shipping_priority", "pricing_summary", "sessionize", "asof_join",
    "range_join_windows", "hypertable_rollup", "rdfs_entail", "owl_entail",
    "kg_violations", "doc_gopher", "doc_chunks", "doc_packing",
    "mixture_sample", "weighted_sample", "conv_quality", "strip_boilerplate",
    "semantic_dedup", "bgp_orders", "doc_pagerank", "dict_encode",
    "graph_walks", "graph_skipgrams", "edit_dup_pairs", "rrf_events",
    "user_setop_sketch", "value_anomalies", "value_equidepth",
    "image_dups", "kg_char_sets", "kg_star_card", "kg_void", "kg_kcore",
    "kg_asof", "bgp_optimized", "source_overlap", "kg_dangling",
    "bgp_subquery", "kg_update", "bgp_graphs", "sparql_select",
    "sparql_agg", "kg_sameas", "kg_ifp", "sparql_from",
    "entity_consolidate", "er_metrics", "graph_sssp", "value_qsketch",
    "kg_class_violations", "kg_validation_report", "rule_conflicts",
    "list_integrity", "graph_digest", "discover_keys", "statement_graph",
    "list_member_check",
    "owl_chain", "kg_pair_violations", "owl_inconsistencies",
    "parse_jsonld", "kg_haskey", "kg_qualified_violations", "sparql_star",
    "order_similarity", "forecast_revenue", "promo_revenue", "brand_revenue",
    "kg_rule_mine", "kg_rule_predict", "kg_align", "graph_modularity",
    "late_orders", "priority_shipments", "waiting_suppliers",
    "idle_customers",
    "local_supplier_volume", "volume_shipping", "market_share",
    "product_profit", "returned_items", "customer_distribution",
    "top_supplier", "part_supplier_counts", "small_qty_revenue",
    "promo_suppliers", "dsir_weights", "dsir_sample", "graph_betweenness",
    "kg_triple_rules", "sft_pairs", "sft_render", "preference_pairs",
    "boilerplate_turns", "graph_harmonic", "quality_clf",
    "kg_embed_scores", "kg_embed_epoch", "kg_link_ranks", "kg_lp_metrics",
    "tool_transitions", "tool_chains", "tool_retries", "trajectory_stats",
    "feature_propagation", "graph_ppr", "kg_subgraph", "doc_shards",
    "maxsim_topk", "kg_distmult_scores", "graph_ra_links",
    "kg_verbalize", "kg_entity_cards", "kg_complex_scores",
    "kg_distmult_ranks", "conv_summaries", "tool_latencies",
    "scripted_convs", "trajectory_dup_pairs",
    # r3: the composed end-to-end pipeline + quantized two-stage top-k
    "training_batches", "quantized_topk",
    # r4 (VERDICT r3 #6): every query whose r3 wall exceeded 3s is audited
    # — including the single most expensive one (owl_cls_entail, 20.7s)
    "owl_cls_entail", "shape_drift", "kg_hits", "lm_perplexity",
    "url_curation", "infer_shapes", "kg_extract_exact",
]


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # formatted mode: "(7) Exchange" operator headers (ReusedExchange is
    # its own header and must NOT count as a shuffle), "[codegen id : N]"
    # annotations for whole-stage spans
    ops = re.findall(r"^\(\d+\) (\w+)", plan, re.M)
    n = lambda name: sum(1 for o in ops if o == name)  # noqa: E731
    return {
        "exchanges": n("Exchange"),
        "bhj": n("BroadcastHashJoin"),
        "smj": n("SortMergeJoin"),
        "bnlj": n("BroadcastNestedLoopJoin"),
        "cartesian": n("CartesianProduct"),
        "python": sum(n(x) for x in
                      ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                       "FlatMapGroupsInPandas")),
        "codegen": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "pushed": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "takeordered": n("TakeOrderedAndProject"),
    }


def main() -> None:
    import __spark_entry__ as em
    from openapi_to_rdf_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    print("# PLANS — physical-plan audit of flagship queries")
    print()
    print("Regenerate with `python scripts/plan_audit.py > PLANS.md`. "
          "Explain-only (ExplainMode=formatted) at sf0.01; the numbers "
          "are STATIC plans — AQE may further coalesce/convert at "
          "runtime, never the reverse for the properties audited here.")
    print()
    print("Columns: Exch = shuffle exchanges in the whole plan (iterative "
          "ops count every round materialized into the static plan); "
          "BHJ/SMJ = broadcast vs sort-merge joins; NLJ = broadcast "
          "nested loop; Cart = cartesian products (always 0); Py = "
          "Python/Arrow stages (vectorized only — row-UDFs don't exist "
          "in this repo); WSCG = distinct whole-stage-codegen spans; "
          "Push = scans with non-empty PushedFilters; TopK = "
          "TakeOrderedAndProject (top-k without a global sort).")
    print()
    print("NLJ caveat: in the validation-family queries every counted "
          "NLJ is a DEGENERATE existence probe, not a row join — "
          "Catalyst pushes the rule-join predicate into each "
          "constant-predicate union branch, leaving a condition-less "
          "LeftSemi against a LocalLimit-1 broadcast of the "
          "vocabulary-sized rules dim ('does any rule constrain this "
          "predicate at all'). Constant work per branch; the instance "
          "side is never nested-looped.")
    print()
    print("| query | Exch | BHJ | SMJ | NLJ | Cart | Py | WSCG | Push | TopK |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name in AUDIT:
        m = audit_one(qs[name](spark, SF))
        print(f"| {name} | {m['exchanges']} | {m['bhj']} | {m['smj']} "
              f"| {m['bnlj']} | {m['cartesian']} | {m['python']} "
              f"| {m['codegen']} | {m['pushed']} | {m['takeordered']} |")
    print()
    print("Invariants the suite also asserts in tests/test_plans.py: "
          "zero CartesianProduct anywhere; zero Python in the extraction "
          "and validation hot paths; broadcast (never sort-merge) for "
          "every vocabulary/dimension join.")
    print()
    print("Note: owl_inconsistencies' BNLJ count is a FIXTURE artifact — "
          "the driver query synthesizes its store as a union of branches "
          "whose predicate is a constant, so Catalyst folds each branch's "
          "declared-predicate semi-join into a LocalLimit-1 existence "
          "probe (BroadcastNestedLoopJoin over a 1-row build side, "
          "condition constant per branch). Over a real table scan the "
          "same join plans as a broadcast hash semi-join on p.")
    spark.stop()


if __name__ == "__main__":
    main()
