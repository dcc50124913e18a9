"""BGP pattern matching (operators/bgp): binding semantics on planted
graphs, partition pruning against a predicate-partitioned snapshot, and
(driver-side) the bgp_orders hash-check vs DuckDB's relational join."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.bgp import bgp_query  # noqa: E402

T = [
    ("a", "knows", "b"), ("b", "knows", "c"), ("a", "knows", "c"),
    ("a", "name", "alice"), ("b", "name", "bob"), ("c", "name", "carol"),
    ("a", "likes", "a"),                       # self-loop for ?x likes ?x
]


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(T, ["s", "p", "o"]).cache()


def test_two_pattern_join_bindings(g):
    got = {(r.x, r.n) for r in bgp_query(
        g, [("?x", "knows", "?y"), ("?y", "name", "?n")],
        select=["?x", "?n"]).collect()}
    assert got == {("a", "bob"), ("a", "carol"), ("b", "carol")}


def test_constant_subject_and_object(g):
    rows = bgp_query(g, [("a", "knows", "?y"), ("?y", "knows", "c")]).collect()
    assert [r.y for r in rows] == ["b"]


def test_repeated_variable_in_one_pattern(g):
    rows = bgp_query(g, [("?x", "likes", "?x")]).collect()
    assert [r.x for r in rows] == ["a"]


def test_bag_vs_distinct_semantics(g):
    # ?x knows ?y . ?x name "alice" -> alice appears per knows-edge (bag)
    pats = [("?x", "knows", "?y"), ("?x", "name", "?n")]
    bag = bgp_query(g, pats, select=["?n"]).collect()
    assert sorted(r.n for r in bag) == ["alice", "alice", "bob"]
    dis = bgp_query(g, pats, select=["?n"], distinct=True).collect()
    assert sorted(r.n for r in dis) == ["alice", "bob"]


def test_disconnected_patterns_cross_join(g):
    rows = bgp_query(g, [("a", "name", "?n1"), ("c", "name", "?n2")]).collect()
    assert {(r.n1, r.n2) for r in rows} == {("alice", "carol")}


def test_empty_patterns_rejected(g):
    with pytest.raises(ValueError):
        bgp_query(g, [])


def test_pipeline_graph_bgp_and_partition_pruning(spark, tmp_path):
    """BGP over a real pipeline graph snapshot: constant-predicate patterns
    must prune to single pred= partitions (PartitionFilters in the plan),
    and the role query must return exactly the per-role turn counts."""
    from openapi_to_rdf_spark.operators.extract import KG_NS
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot
    from tests.test_plans import _plan

    run_pipeline(spark, tmp_path / "wd", n_convs=60, seed=42)
    graph = read_snapshot(spark, tmp_path / "wd" / "graph")

    q = bgp_query(graph, [
        ("?turn", KG_NS + "role", "user"),
        ("?turn", KG_NS + "atTime", "?ts"),
    ])
    plan = _plan(q)
    assert "PartitionFilters: [isnotnull(pred" in plan.replace("#", "")
    n_user_bgp = q.count()
    n_user_direct = graph.filter(
        (F.col("p") == KG_NS + "role") & (F.col("o") == "user")).count()
    assert n_user_bgp == n_user_direct > 0


def test_optional_group_left_join_semantics(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_query as q

    rows = q(g, [("?x", "name", "?n")],
             optional=[[("?x", "knows", "?y"), ("?y", "name", "?yn")]]).collect()
    by_n = {}
    for r in rows:
        by_n.setdefault(r.n, set()).add(r.yn)
    assert by_n == {"alice": {"bob", "carol"}, "bob": {"carol"},
                    "carol": {None}}          # carol knows nobody -> null


def test_optional_without_shared_variable_rejected(g):
    with pytest.raises(ValueError):
        bgp_query(g, [("?x", "name", "?n")],
                  optional=[[("?a", "likes", "?b")]])


def test_union_aligns_columns_by_name(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_union

    rows = bgp_union(g, [
        [("a", "knows", "?y")],               # binds y
        [("?z", "likes", "a")],               # binds z
    ]).collect()
    got = {(r.y, r.z) for r in rows}
    assert got == {("b", None), ("c", None), (None, "a")}


def test_minus_removes_matching_bindings(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_minus

    # people with a name, MINUS those who know someone
    rows = bgp_minus(g, [("?x", "name", "?n")],
                     minus=[("?x", "knows", "?y")]).collect()
    assert {(r.x, r.n) for r in rows} == {("c", "carol")}

    with pytest.raises(ValueError):
        bgp_minus(g, [("?x", "name", "?n")], minus=[("?a", "likes", "?b")])


def test_construct_instantiates_template(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_construct

    out = bgp_construct(
        g, where=[("?x", "knows", "?y"), ("?y", "name", "?yn")],
        template=[("?x", "friendName", "?yn"),
                  ("?x", "hasFriend", "?y")])
    got = {(r.s, r.p, r.o) for r in out.collect()}
    assert got == {("a", "friendName", "bob"), ("a", "friendName", "carol"),
                   ("b", "friendName", "carol"),
                   ("a", "hasFriend", "b"), ("a", "hasFriend", "c"),
                   ("b", "hasFriend", "c")}

    with pytest.raises(ValueError):
        bgp_construct(g, where=[("?x", "knows", "?y")],
                      template=[("?x", "p", "?unbound")])


def test_solution_modifiers(g):
    # FILTER + VALUES + ORDER/LIMIT/OFFSET compose in algebra order
    pats = [("?x", "knows", "?y"), ("?y", "name", "?n")]
    got = bgp_query(g, pats, values={"?n": ["bob", "carol"]},
                    filters=["x <> 'b'"], select=["?n"],
                    order_by=["-n"]).collect()
    assert [r.n for r in got] == ["carol", "bob"]
    # bindings (bag): [bob, carol, carol] — offset skips the first
    page = bgp_query(g, pats, select=["?n"], order_by=["n"],
                     limit=2, offset=1).collect()
    assert [r.n for r in page] == ["carol", "carol"]


def test_values_unbound_variable_rejected(g):
    with pytest.raises(ValueError, match="not bound"):
        bgp_query(g, [("?x", "knows", "?y")], values={"?zzz": ["a"]})


def test_order_limit_plans_topk(g):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k), never a global Sort of all bindings."""
    df = bgp_query(g, [("?x", "knows", "?y")], order_by=["x"], limit=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_ask_true_false_and_short_circuit_plan(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_ask

    assert bgp_ask(g, [("?x", "knows", "?y")]).collect()[0].ask is True
    assert bgp_ask(g, [("?x", "hates", "?y")]).collect()[0].ask is False
    # FILTER/VALUES thread through
    assert bgp_ask(g, [("?x", "name", "?n")],
                   values={"?n": ["bob"]}).collect()[0].ask is True
    plan = bgp_ask(g, [("?x", "knows", "?y")]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Limit" in plan  # short-circuits before the count


def test_describe_subject_and_object_triples(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_describe

    # describe ?y for ?y known by a: nodes {b, c}
    got = {(r.s, r.p, r.o) for r in bgp_describe(
        g, [("a", "knows", "?y")], "?y").collect()}
    assert got == {
        ("b", "knows", "c"), ("b", "name", "bob"),   # subject hits (b)
        ("c", "name", "carol"),                       # subject hits (c)
        ("a", "knows", "b"), ("a", "knows", "c"),     # object hits
    }
    # each triple exactly once even when both s and o are described nodes
    rows = bgp_describe(g, [("?x", "knows", "?y")], "?x").collect()
    assert len(rows) == len(set((r.s, r.p, r.o) for r in rows))
    plan = bgp_describe(g, [("a", "knows", "?y")], "?y") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_bgp_agg_eager_matches_fallback(spark):
    """Eager-pushdown SUM/MIN/MAX/AVG/COUNT == aggregate-after-join, on a
    graph with join fan-out (two orders per customer, customers sharing a
    nation) so the bag semantics of the rewrite actually matter."""
    from openapi_to_rdf_spark.operators.bgp import bgp_agg

    t = []
    for c, (nat, prices) in enumerate(
            [("N1", [10, 20]), ("N1", [5]), ("N2", [7, 8, 9])]):
        t.append((f"c{c}", "inNation", nat))
        for i, p in enumerate(prices):
            t += [(f"o{c}_{i}", "placedBy", f"c{c}"),
                  (f"o{c}_{i}", "price", str(p))]
    g = spark.createDataFrame(t, ["s", "p", "o"])
    pats = [("?o", "placedBy", "?c"), ("?o", "price", "?tp"),
            ("?c", "inNation", "?nat")]
    aggs = {"cnt": ("count", "?o"), "total": ("sum", "?tp", "long"),
            "lo": ("min", "?tp", "long"), "hi": ("max", "?tp", "long"),
            "mean": ("avg", "?tp", "double")}

    def snap(df):
        return {r.nat: (r.cnt, r.total, r.lo, r.hi, round(r.mean, 9))
                for r in df.collect()}

    eager = snap(bgp_agg(g, pats, ["?nat"], aggs))
    plain = snap(bgp_agg(g, pats, ["?nat"], aggs, eager=False))
    assert eager == plain
    assert eager == {"N1": (3, 35, 5, 20, round(35 / 3, 9)),
                     "N2": (3, 24, 7, 9, 8.0)}


def test_bgp_agg_rejects_unknown_fn(spark):
    import pytest as _pytest

    from openapi_to_rdf_spark.operators.bgp import bgp_agg

    g = spark.createDataFrame([("a", "p", "b")], ["s", "p", "o"])
    with _pytest.raises(ValueError, match="unsupported"):
        bgp_agg(g, [("?x", "p", "?y")], ["?x"],
                {"m": ("median", "?y")})


def test_order_patterns_selectivity_and_connectivity():
    from openapi_to_rdf_spark.operators.bgp import order_patterns

    stats = {"knows": (1000, 100, 100), "name": (100, 100, 90),
             "type": (100, 100, 2)}
    pats = [("?x", "knows", "?y"),        # est 1000
            ("?y", "type", "Person"),     # est 100/2 = 50  <- most selective
            ("?x", "name", "?n")]         # est 100
    got = order_patterns(pats, stats)
    # starts at the selective type pattern, then stays CONNECTED: knows
    # (est 1000) must precede name because name shares no var with ?y yet
    assert got == [("?y", "type", "Person"), ("?x", "knows", "?y"),
                   ("?x", "name", "?n")]


def test_order_patterns_disconnected_fallback():
    from openapi_to_rdf_spark.operators.bgp import order_patterns

    stats = {"a": (10, 10, 10), "b": (5, 5, 5)}
    got = order_patterns([("?x", "a", "?y"), ("?p", "b", "?q")], stats)
    # no shared variables anywhere: falls back to global smallest first
    assert got[0] == ("?p", "b", "?q")


def test_optimized_bindings_equal_unoptimized(g):
    from openapi_to_rdf_spark.operators.bgp import (
        bgp_query_optimized, predicate_stats,
    )

    pats = [("?x", "knows", "?y"), ("?y", "name", "?n"),
            ("?x", "name", "?xn")]
    base = {tuple(sorted(r.asDict().items()))
            for r in bgp_query(g, pats).collect()}
    stats = predicate_stats(g)
    opt = {tuple(sorted(r.asDict().items()))
           for r in bgp_query_optimized(g, pats, stats=stats).collect()}
    assert opt == base and len(base) > 0
    # stats are what one scan says they are
    assert stats["knows"] == (3, 2, 2) and stats["name"][0] == 3


def test_estimate_pattern_shapes():
    from openapi_to_rdf_spark.operators.bgp import estimate_pattern

    stats = {"knows": (1000, 100, 200)}
    assert estimate_pattern(("?x", "knows", "?y"), stats, 5000) == 1000
    assert estimate_pattern(("?x", "knows", "bob"), stats, 5000) == 5.0
    assert estimate_pattern(("a", "knows", "bob"), stats, 5000) == 1.0
    assert estimate_pattern(("?x", "missing", "?y"), stats, 5000) == 1.0
    # variable predicate: total-based with the 1/10 heuristic
    assert estimate_pattern(("?x", "?p", "?y"), stats, 5000) == 5000.0


def test_exists_keeps_only_matching_bindings(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_exists

    # people with a name who know someone: a, b (c knows nobody)
    got = {r.x for r in bgp_exists(
        g, [("?x", "name", "?n")], [("?x", "knows", "?y")]).collect()}
    assert got == {"a", "b"}
    # semi-join: no duplication even though a knows TWO people
    rows = bgp_exists(g, [("?x", "name", "?n")],
                      [("?x", "knows", "?y")]).collect()
    assert len(rows) == 2
    with pytest.raises(ValueError):
        bgp_exists(g, [("?x", "name", "?n")], [("?a", "likes", "?b")])


def test_agg_count_distinct(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_agg

    # per knower: distinct known people vs bag count with name fan-out
    got = {r.x: (r.nd, r.nb) for r in bgp_agg(
        g, [("?x", "knows", "?y"), ("?y", "name", "?yn")],
        ["?x"], {"nd": ("count_distinct", "?y"),
                 "nb": ("count", "?y")}).collect()}
    assert got == {"a": (2, 2), "b": (1, 1)}
    # distinct collapses what the bag count double-counts
    g2 = g.unionByName(g.sparkSession.createDataFrame(
        [("b", "name", "robert")], ["s", "p", "o"]))
    got2 = {r.x: (r.nd, r.nb) for r in bgp_agg(
        g2, [("?x", "knows", "?y"), ("?y", "name", "?yn")],
        ["?x"], {"nd": ("count_distinct", "?y"),
                 "nb": ("count", "?y")}).collect()}
    assert got2["a"] == (2, 3)  # bob counted twice in the bag, once distinct


def test_agg_group_concat_and_sample(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_agg

    got = {r.x: (r.names, r.pick) for r in bgp_agg(
        g, [("?x", "knows", "?y"), ("?y", "name", "?yn")],
        ["?x"], {"names": ("group_concat", "?yn", "|"),
                 "pick": ("sample", "?yn")}).collect()}
    # group_concat sorted for determinism; sample derandomized to min
    assert got == {"a": ("bob|carol", "bob"), "b": ("carol", "carol")}


def test_optimizer_uses_manifest_stats(spark, tmp_path):
    """ANALYZE-on-write loop: the pipeline's graph manifest carries
    per-predicate planner stats identical to a fresh scan, and
    bgp_query_optimized planning from them returns the same bindings."""
    from openapi_to_rdf_spark.operators.bgp import (
        bgp_query_optimized, predicate_stats, stats_from_manifest,
    )
    from openapi_to_rdf_spark.operators.extract import KG_NS
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot

    out = run_pipeline(spark, tmp_path / "wd", n_convs=60, seed=42)
    graph = read_snapshot(spark, tmp_path / "wd" / "graph")
    stored = stats_from_manifest(out["graph"])
    assert stored == predicate_stats(graph)
    assert all(len(v) == 3 for v in stored.values()) and stored

    pats = [("?turn", KG_NS + "atTime", "?ts"),
            ("?turn", KG_NS + "role", "user")]
    base = {(r.turn, r.ts)
            for r in bgp_query_optimized(graph, pats).collect()}
    direct = {(r.turn, r.ts)
              for r in bgp_query_optimized(graph, pats,
                                           stats=stored).collect()}
    assert base == direct and len(base) > 0

    with pytest.raises(ValueError, match="no predicate_stats"):
        stats_from_manifest({"metrics": {}})


def test_cli_query_subcommand(spark, tmp_path, capsys):
    """`query` CLI: statistics-ordered BGP over a materialized workdir
    graph, kg: prefix expansion, select/limit, and the row count agrees
    with the direct operator."""
    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.operators.extract import KG_NS
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.plans.snapshot import read_snapshot

    run_pipeline(spark, tmp_path / "wd", n_convs=40, seed=42)
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "?t kg:role user . ?t kg:atTime ?ts",
               "--select", "t,ts", "--limit", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0] == "t\tts"
    assert lines[-1].startswith("(5 row(s) shown")

    graph = read_snapshot(spark, tmp_path / "wd" / "graph")
    n = bgp_query(graph, [("?t", KG_NS + "role", "user"),
                          ("?t", KG_NS + "atTime", "?ts")]).count()
    assert n >= 5

    assert main(["query", "--workdir", str(tmp_path / "wd"),
                 "?t kg:role"]) == 2  # malformed pattern


def test_cli_query_path_suffix_and_explain(spark, tmp_path, capsys):
    """query CLI path syntax: kg:pred+ compiles to a closure in predicate
    position; --explain prints a plan instead of rows."""
    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, tmp_path / "wd", n_convs=30, seed=42)
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "?c kg:hasTurn+ ?t . ?t kg:role user",
               "--select", "c,t", "--limit", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "c\tt"

    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "?t kg:role user", "--explain"])
    assert rc == 0
    assert "Physical Plan" in capsys.readouterr().out


def test_bind_extends_solutions_and_filters_see_it(g):
    """BIND adds a computed variable to every solution; a FILTER after it
    constrains the bound value (SPARQL group-element order)."""
    rows = bgp_query(g, [("?x", "name", "?n")],
                     bind={"?tag": "concat(x, '/', n)"},
                     filters=["tag <> 'b/bob'"]).collect()
    assert sorted(r.tag for r in rows) == ["a/alice", "c/carol"]


def test_bind_rejects_rebinding(g):
    with pytest.raises(ValueError):
        bgp_query(g, [("?x", "name", "?n")], bind={"?n": "x"})


def test_subquery_joins_aggregate_bindings(g):
    """A nested SELECT (here a per-?x degree aggregate) inner-joins the
    outer bindings on the shared variable; carol (no knows edge) drops,
    per subselect-join semantics."""
    from openapi_to_rdf_spark.operators.bgp import bgp_agg

    sub = bgp_agg(g, [("?x", "knows", "?y")], ["?x"],
                  {"deg": ("count", "?y")})
    rows = bgp_query(g, [("?x", "name", "?n")], subqueries=[sub]).collect()
    assert {(r.n, r.deg) for r in rows} == {("alice", 2), ("bob", 1)}


def test_subquery_without_shared_variable_rejected(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_agg

    sub = bgp_agg(g, [("?q", "knows", "?y")], ["?q"],
                  {"deg": ("count", "?y")})
    with pytest.raises(ValueError):
        bgp_query(g, [("?x", "name", "?n")], subqueries=[sub])


def test_cli_query_filter_and_bind(spark, tmp_path, capsys):
    """query CLI --filter/--bind: FILTER prunes bindings by a SQL
    condition; BIND derives a projectable variable."""
    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, tmp_path / "wd", n_convs=30, seed=42)
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "?t kg:role ?r",
               "--filter", "r <> 'user'",
               "--bind", "tag=concat(r, '!')",
               "--select", "r,tag", "--limit", "4"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "r\ttag"
    body = [ln.split("\t") for ln in lines[1:-1]]
    assert body and all(r != "user" and tag == r + "!" for r, tag in body)

    assert main(["query", "--workdir", str(tmp_path / "wd"),
                 "?t kg:role ?r", "--bind", "notanassignment"]) == 2
