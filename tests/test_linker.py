"""Entity-link scoring (operators/linker) — the north star's second
extraction stage ("mention detection and entity-link scoring").

Correctness strategy mirrors the dedup operators: the bipartite
prefix-filtered candidate join is proven EXACT against a python brute
force; scoring/tie-break semantics are pinned by planted registries; the
end-to-end transcript case asserts 100% top-1 accuracy on the generator's
alias grammar; and the driver hash-verifies ``kg_link_entities`` against a
brute-force DuckDB oracle (scripts/oracle_check.py)."""

import pathlib
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.linker import (  # noqa: E402
    _bipartite_jaccard_pairs, link_entities, link_surfaces, link_triples,
    registry_from_canonical_map,
)
from openapi_to_rdf_spark.sources.transcripts import (  # noqa: E402
    entity_registry_df, synth_transcripts,
)


def _grams(t, n=3):
    s = re.sub(r"[^a-z0-9]", "", t.lower())
    if len(s) < n:
        s = s.ljust(n, "_")
    return {s[i:i + n] for i in range(len(s) - n + 1)}


def test_bipartite_pairs_exact_vs_bruteforce(spark):
    """Prefix filtering across two DIFFERENT sets must lose nothing."""
    left = [("l%d" % i, t) for i, t in enumerate([
        "the quick brown fox", "a slow green turtle", "spark shuffle notes",
        "quick brown foxes", "totally unrelated words here",
    ])]
    right = [("r%d" % i, t) for i, t in enumerate([
        "the quick brown fox", "slow green turtles", "spark shuffle handbook",
        "nothing in common at all", "qk brwn fx",
    ])]
    for thr in (0.3, 0.5, 0.8):
        lt = spark.createDataFrame(
            [(i, sorted(_grams(t))) for i, t in left], "id string, grams array<string>")
        rt = spark.createDataFrame(
            [(i, sorted(_grams(t))) for i, t in right], "id string, grams array<string>")
        got = {(r.id_l, r.id_r): r.sim
               for r in _bipartite_jaccard_pairs(lt, rt, thr).collect()}
        expected = {}
        for li, ltxt in left:
            for ri, rtxt in right:
                a, b = _grams(ltxt), _grams(rtxt)
                j = len(a & b) / len(a | b)
                if round(j, 6) >= thr:
                    expected[(li, ri)] = round(j, 6)
        assert got == expected, f"threshold {thr}"


def test_link_scoring_class_bonus_prior_and_tiebreak(spark):
    """The three score components and the deterministic tie-break, each
    isolated with a planted registry."""
    # two registry entries with IDENTICAL names: class bonus must decide
    reg = spark.createDataFrame(
        [(1, "alpha node", "TypeA", 0.0), (2, "alpha node", "TypeB", 0.0)],
        ["entity_id", "name", "class_name", "prior"])
    surf = spark.createDataFrame([("alpha node", "TypeB")], ["surface", "m_class"])
    row = link_surfaces(surf, reg).collect()[0]
    assert (row.entity_id, row.sim, row.score) == (2, 1.0, 1.1)

    # same names, same class: prior must decide
    reg = spark.createDataFrame(
        [(1, "alpha node", None, 0.2), (2, "alpha node", None, 0.8)],
        "entity_id long, name string, class_name string, prior double")
    row = link_surfaces(surf, reg).collect()[0]
    assert row.entity_id == 2 and row.score == 1.04

    # full tie: lowest entity_id wins
    reg = spark.createDataFrame(
        [(7, "alpha node", None, 0.0), (3, "alpha node", None, 0.0)],
        "entity_id long, name string, class_name string, prior double")
    row = link_surfaces(surf, reg).collect()[0]
    assert row.entity_id == 3

    # null mention class never earns the bonus
    surf_null = spark.createDataFrame(
        [("alpha node", None)], "surface string, m_class string")
    reg = spark.createDataFrame(
        [(1, "alpha node", None, 0.0)],
        "entity_id long, name string, class_name string, prior double")
    row = link_surfaces(surf_null, reg).collect()[0]
    assert row.score == 1.0


def test_link_transcript_aliases_top1_accuracy(spark):
    """Every alias spelling the generator emits ("-", "_", ".") must link
    to its true registry entity (the %04d suffix) at sim exactly 1.0 —
    separator variants normalize to identical shingle sets and no other
    registry name shares one."""
    turns = synth_transcripts(spark, 150, seed=42)
    mentions = (turns.select(F.explode(F.expr(
        "regexp_extract_all(text, '([A-Z][A-Za-z0-9_]+)#([a-z0-9][a-z0-9_.-]{0,40}[a-z0-9])', 2)"))
        .alias("m_key")).dropDuplicates(["m_key"]))
    linked = link_entities(mentions, entity_registry_df(spark),
                           class_col=None, sim_threshold=0.8)
    rows = linked.collect()
    assert len(rows) > 100
    for r in rows:
        true_id = int(r.m_key[-4:])
        assert r.entity_id == true_id, (r.m_key, r.entity_id)
        assert r.sim == 1.0


def test_link_fuzzy_corruption_still_top1(spark):
    """Dropped characters (sim < 1) must still link to the true entity."""
    reg = entity_registry_df(spark, 500)
    # corrupt: remove the 2nd char of the first word ("spark typo")
    surf = (reg.filter(F.col("entity_id").isin([42, 74, 137, 256, 399]))
            .select(F.col("entity_id").alias("true_id"),
                    F.concat(F.expr("substring(name, 1, 1)"),
                             F.expr("substring(name, 3)")).alias("m_key")))
    linked = link_entities(surf, reg, class_col=None, sim_threshold=0.4)
    for r in linked.collect():
        assert r.entity_id == r.true_id and 0.4 <= r.sim < 1.0


def test_link_entities_nil_and_duplicate_propagation(spark):
    reg = entity_registry_df(spark, 100)
    mentions = spark.createDataFrame(
        [("alpha-bravo-0024", "c1"), ("alpha-bravo-0024", "c2"),
         ("alpha-bravo-0024", "c1"), ("xqzw", "c1")],
        ["m_key", "conv"])
    out = link_entities(mentions, reg, class_col=None).collect()
    assert len(out) == 4                       # every input row survives
    by_key = {}
    for r in out:
        by_key.setdefault(r.m_key, []).append(r)
    assert all(r.entity_id == 24 for r in by_key["alpha-bravo-0024"])
    assert len(by_key["alpha-bravo-0024"]) == 3
    nil = by_key["xqzw"][0]
    assert nil.entity_id is None and nil.sim is None  # NIL link, row kept


def test_link_triples_layout(spark):
    links = spark.createDataFrame(
        [("alpha_bravo_0024", None, 24, 1.0, 1.0),
         ("nolink", None, None, None, None)],
        "surface string, m_class string, entity_id long, sim double, score double")
    tr = link_triples(links, "kg#", "ent#", "reg#").collect()
    assert len(tr) == 2                        # NIL row emits nothing
    by_p = {r.p: r for r in tr}
    e = by_p["kg#linksTo"]
    assert (e.s, e.o, e.o_kind) == ("ent#alpha_bravo_0024", "reg#24", "iri")
    s = by_p["kg#linkScore"]
    assert s.o_kind == "literal" and s.o == "1.000000"
    assert s.o_datatype.endswith("decimal")


def test_registry_from_canonical_map_closes_loop(spark):
    """Batch 1 canonicalizes; its map becomes the registry batch 2 links
    against — the incremental-authority pattern."""
    cmap = spark.createDataFrame(
        [("alpha-bravo-0042", "alpha-bravo-0042"),
         ("alpha_bravo_0042", "alpha-bravo-0042"),
         ("alpha.bravo.0042", "alpha-bravo-0042"),
         ("cedar-delta-0074", "cedar-delta-0074")],
        ["ent", "canonical"])
    reg = registry_from_canonical_map(cmap)
    rows = {r.entity_id: r for r in reg.collect()}
    assert set(rows) == {"alpha-bravo-0042", "cedar-delta-0074"}
    assert rows["alpha-bravo-0042"].prior == 0.03   # 3 aliases / 100

    new_batch = spark.createDataFrame([("alpha~bravo~0042",)], ["m_key"])
    linked = link_entities(new_batch, reg, class_col=None).collect()[0]
    assert linked.entity_id == "alpha-bravo-0042" and linked.sim == 1.0


def test_linker_plan_no_cartesian_product(spark):
    """The candidate join must stay a shingle equi-join: no CartesianProduct
    or BroadcastNestedLoopJoin anywhere in the link plan."""
    from tests.test_plans import _plan

    reg = entity_registry_df(spark, 200)
    mentions = spark.createDataFrame([("alpha-bravo-0024", "X")],
                                     ["m_key", "m_class"])
    plan = _plan(link_entities(mentions, reg))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan            # scoring is all-JVM


def test_registry_with_rank_priors(spark):
    """PageRank importance becomes the link prior: equal-sim ties resolve
    toward the graph-central entity."""
    from openapi_to_rdf_spark.operators.linker import registry_with_rank_priors

    reg = spark.createDataFrame(
        [("e1", "alpha node", None, 0.0), ("e2", "alpha node", None, 0.0)],
        "entity_id string, name string, class_name string, prior double")
    ranks = spark.createDataFrame(
        [("e1", 0.02), ("e2", 0.08), ("e9", 0.10)], ["node", "rank"])
    reg2 = registry_with_rank_priors(reg, ranks)
    priors = {r.entity_id: r.prior for r in reg2.collect()}
    assert priors == {"e1": 0.2, "e2": 0.8}   # normalized by max rank

    surf = spark.createDataFrame(
        [("alpha node", None)], "surface string, m_class string")
    row = link_surfaces(surf, reg2).collect()[0]
    assert row.entity_id == "e2"              # prior breaks the sim tie


def test_linker_accuracy_floors(spark):
    """Graded-corruption accuracy report (driver query linker_accuracy):
    floors set below the measured values (1.0/1.0/1.0/0.94)."""
    from openapi_to_rdf_spark.operators.recall import linker_accuracy_report

    rep = {r.corruption: r for r in linker_accuracy_report(spark).collect()}
    assert set(rep) == {"sep_swap", "drop1", "drop2", "word_cut"}
    assert rep["sep_swap"].accuracy_e6 == 1_000_000   # normalizes away
    assert rep["drop1"].accuracy_e6 >= 950_000
    assert rep["drop2"].accuracy_e6 >= 900_000
    assert rep["word_cut"].accuracy_e6 >= 850_000     # measured 0.94
    assert all(r.n_total == 400 for r in rep.values())
