"""SPARQL 1.1 text front-end (sparql.py): tokenizer/parser unit checks,
text-vs-tuple-API equivalence, and end-to-end semantics for every
supported algebra form — SELECT modifiers, aggregates/HAVING, OPTIONAL/
UNION/MINUS/EXISTS, property paths, VALUES/BIND, subqueries, GRAPH,
ASK/CONSTRUCT/DESCRIBE, and Update request application. The driver
hash-verifies the same front-end against DuckDB (``sparql_select``,
``sparql_agg``)."""

import pathlib
import sys

import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.sparql import (  # noqa: E402
    SparqlSyntaxError, parse_query, parse_update, sparql_query,
    sparql_update)

EX = "http://example.org/"
TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

T = [
    ("a", TYPE, "Person"), ("b", TYPE, "Person"), ("c", TYPE, "Person"),
    ("d", TYPE, "Robot"),
    ("a", EX + "name", "alice"), ("b", EX + "name", "bob"),
    ("c", EX + "name", "carol"), ("d", EX + "name", "hal"),
    ("a", EX + "age", "42"), ("b", EX + "age", "7"), ("c", EX + "age", "19"),
    ("a", EX + "knows", "b"), ("b", EX + "knows", "c"),
    ("a", EX + "city", "oslo"), ("b", EX + "city", "oslo"),
    ("c", EX + "city", "lund"),
]

PFX = f"PREFIX ex: <{EX}> "


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(T, ["s", "p", "o"]).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- parser

def test_parse_prefixes_and_a_keyword():
    q = parse_query(PFX + "SELECT ?s WHERE { ?s a ex:Thing }")
    assert q.where.patterns == [("?s", TYPE, EX + "Thing")]


def test_parse_predicate_object_lists():
    q = parse_query(PFX + "SELECT * WHERE { ?s ex:p 1 ; ex:q 2 , 3 . }")
    assert q.where.patterns == [("?s", EX + "p", "1"), ("?s", EX + "q", "2"),
                                ("?s", EX + "q", "3")]


def test_parse_paths():
    q = parse_query(PFX + "SELECT * WHERE { ?s ex:p/^ex:q+ ?o }")
    assert q.where.patterns == [
        ("?s", ("seq", EX + "p", ("inv", ("+", EX + "q"))), "?o")]
    q2 = parse_query(PFX + "SELECT * WHERE { ?s !(ex:p|ex:q) ?o }")
    assert q2.where.patterns == [("?s", ("nps", EX + "p", EX + "q"), "?o")]


def test_parse_typed_literal_keeps_lexical_form():
    q = parse_query(PFX + 'SELECT * WHERE { ?s ex:v "7"^^ex:int }')
    assert q.where.patterns == [("?s", EX + "v", "7")]


def test_syntax_errors_carry_offsets():
    with pytest.raises(SparqlSyntaxError, match="offset"):
        parse_query("SELECT ?x WHERE { ?x }")
    with pytest.raises(SparqlSyntaxError, match="undeclared prefix"):
        parse_query("SELECT ?x WHERE { ?x nope:p 1 }")


# ------------------------------------------------------------- semantics

def test_select_equals_tuple_api(g):
    from openapi_to_rdf_spark.operators.bgp import bgp_query
    text = sparql_query(g, PFX + """SELECT ?n WHERE {
        ?x a "Person" . ?x ex:name ?n . ?x ex:city "oslo" }""")
    tup = bgp_query(g, [("?x", TYPE, "Person"), ("?x", EX + "name", "?n"),
                        ("?x", EX + "city", "oslo")], select=["?n"])
    assert rows(text) == rows(tup) == {("alice",), ("bob",)}


def test_filter_numeric_cast_and_regex(g):
    out = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:age ?a . FILTER(?a >= 19 && REGEX(?x, "^[abc]$")) }""")
    assert rows(out) == {("a",), ("c",)}


def test_optional_keeps_unmatched_null(g):
    out = sparql_query(g, PFX + """SELECT ?n ?a WHERE {
        ?x ex:name ?n . OPTIONAL { ?x ex:age ?a } }""")
    assert ("hal", None) in rows(out) and ("alice", "42") in rows(out)


def test_union_minus_exists(g):
    u = sparql_query(g, PFX + """SELECT DISTINCT ?x WHERE {
        { ?x ex:city "lund" } UNION { ?x ex:age "42" } }""")
    assert rows(u) == {("a",), ("c",)}
    m = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x a "Person" . MINUS { ?x ex:knows ?y } }""")
    assert rows(m) == {("c",)}
    e = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x a "Person" . FILTER NOT EXISTS { ?x ex:age ?a } }""")
    assert rows(e) == set()
    e2 = sparql_query(g, PFX + """SELECT ?x WHERE {
        ?x ex:city "oslo" . FILTER EXISTS { ?x ex:knows ?y } }""")
    assert rows(e2) == {("a",), ("b",)}


def test_bind_and_values(g):
    out = sparql_query(g, PFX + """SELECT ?n ?u WHERE {
        ?x ex:name ?n . VALUES ?x { "a" "c" }
        BIND(UCASE(?n) AS ?u) }""")
    assert rows(out) == {("alice", "ALICE"), ("carol", "CAROL")}


def test_multi_var_values(g):
    out = sparql_query(g, PFX + """SELECT ?n WHERE {
        ?x ex:name ?n . ?x ex:city ?c .
        VALUES (?x ?c) { ("a" "oslo") ("c" "oslo") } }""")
    assert rows(out) == {("alice",)}


def test_property_path_text(g):
    out = sparql_query(g, PFX + "SELECT ?y WHERE { \"a\" ex:knows+ ?y }")
    assert rows(out) == {("b",), ("c",)}
    inv = sparql_query(g, PFX + "SELECT ?y WHERE { \"c\" ^ex:knows ?y }")
    assert rows(inv) == {("b",)}


def test_aggregates_group_by_having_order(g):
    out = sparql_query(g, PFX + """SELECT ?c (COUNT(?x) AS ?n) WHERE {
        ?x ex:city ?c } GROUP BY ?c HAVING (COUNT(?x) > 1)
        ORDER BY DESC(?n) LIMIT 1""")
    assert [tuple(r) for r in out.collect()] == [("oslo", 2)]


def test_agg_sum_avg_cast_and_count_star(g):
    out = sparql_query(g, PFX + """SELECT (SUM(xsd:integer(?a)) AS ?s)
        (COUNT(*) AS ?n) WHERE { ?x ex:age ?a }""")
    assert [tuple(r) for r in out.collect()] == [(68, 3)]


def test_group_concat_and_sample(g):
    out = sparql_query(g, PFX + """SELECT ?c
        (GROUP_CONCAT(?n; SEPARATOR=",") AS ?names)
        (SAMPLE(?n) AS ?one) WHERE {
        ?x ex:city ?c . ?x ex:name ?n } GROUP BY ?c ORDER BY ?c""")
    assert [tuple(r) for r in out.collect()] == [
        ("lund", "carol", "carol"), ("oslo", "alice,bob", "alice")]


def test_subquery_joins_on_shared_var(g):
    out = sparql_query(g, PFX + """SELECT ?n WHERE {
        ?x ex:name ?n .
        { SELECT ?x (COUNT(?y) AS ?k) WHERE { ?x ex:knows ?y } GROUP BY ?x }
        FILTER(?k = 1) }""")
    assert rows(out) == {("alice",), ("bob",)}


def test_select_expression_projection(g):
    out = sparql_query(g, PFX + """SELECT ?n (STRLEN(?n) AS ?len)
        WHERE { "a" ex:name ?n }""")
    assert [tuple(r) for r in out.collect()] == [("alice", 5)]


def test_distinct_offset_limit(g):
    out = sparql_query(g, PFX + """SELECT DISTINCT ?c WHERE {
        ?x ex:city ?c } ORDER BY ?c LIMIT 1 OFFSET 1""")
    assert [tuple(r) for r in out.collect()] == [("oslo",)]


def test_ask_construct_describe(g):
    assert sparql_query(g, PFX + 'ASK WHERE { "a" ex:knows "b" }') \
        .collect()[0].ask is True
    assert sparql_query(g, PFX + 'ASK WHERE { "b" ex:knows "a" }') \
        .collect()[0].ask is False
    built = sparql_query(g, PFX + """CONSTRUCT { ?y ex:knownBy ?x }
        WHERE { ?x ex:knows ?y }""")
    assert rows(built) == {("b", EX + "knownBy", "a"),
                           ("c", EX + "knownBy", "b")}
    desc = sparql_query(g, PFX + """DESCRIBE ?x WHERE {
        ?x ex:name "carol" }""")
    assert rows(desc) == {t for t in T if "c" in (t[0], t[2])} - {
        ("a", EX + "city", "oslo"), ("b", EX + "city", "oslo")}


def test_graph_patterns_over_quads(spark):
    quads = spark.createDataFrame(
        [("g1", "a", EX + "p", "x"), ("g2", "a", EX + "p", "y"),
         ("g2", "y", EX + "q", "z")], ["g", "s", "p", "o"])
    out = sparql_query(quads, PFX + """SELECT ?g ?o WHERE {
        GRAPH ?g { "a" ex:p ?o . ?o ex:q ?z } }""")
    assert rows(out) == {("g2", "y")}
    const = sparql_query(quads, PFX + """SELECT ?o WHERE {
        GRAPH <g1> { "a" ex:p ?o } }""")
    assert rows(const) == {("x",)}


# ---------------------------------------------------------------- update

def test_update_modify_roundtrip(g):
    out = sparql_update(g, PFX + """
        DELETE { ?x ex:city "oslo" } INSERT { ?x ex:city "OSL" }
        WHERE { ?x ex:city "oslo" }""")
    have = rows(out)
    assert ("a", EX + "city", "OSL") in have
    assert ("a", EX + "city", "oslo") not in have
    assert len(have) == len(T)


def test_update_data_ops_and_sequence(g):
    out = sparql_update(g, PFX + """
        INSERT DATA { "z" ex:name "zed" . "z" a "Person" } ;
        DELETE DATA { "d" ex:name "hal" }""")
    have = rows(out)
    assert ("z", EX + "name", "zed") in have and ("z", TYPE, "Person") in have
    assert ("d", EX + "name", "hal") not in have
    assert len(have) == len(T) + 1


def test_update_graph_management(spark):
    quads = spark.createDataFrame(
        [("g1", "a", "p", "1"), ("g2", "b", "p", "2")],
        ["g", "s", "p", "o"])
    out = sparql_update(quads, "COPY <g1> TO <g2> ; CLEAR GRAPH <g1>")
    assert rows(out) == {("g2", "a", "p", "1")}
    ins = sparql_update(quads,
                        'INSERT DATA { GRAPH <g3> { "c" <p> "3" } }')
    assert ("g3", "c", "p", "3") in rows(ins)


def test_update_parse_shapes():
    ops = parse_update('DELETE WHERE { ?s <p> "x" }')
    assert ops[0]["kind"] == "modify" and ops[0]["delete"] == ops[0][
        "where"].patterns
    with pytest.raises(SparqlSyntaxError, match="ground"):
        parse_update("INSERT DATA { ?x <p> 1 }")


def test_update_rejects_wrong_frame_kind(g, spark):
    quads = spark.createDataFrame([("g1", "a", "p", "1")],
                                  ["g", "s", "p", "o"])
    with pytest.raises(ValueError, match="quad frame"):
        sparql_update(g, "CLEAR GRAPH <g1>")
    with pytest.raises(ValueError, match="triple frame"):
        sparql_update(quads, 'DELETE { ?s <p> ?o } WHERE { ?s <p> ?o }')


# ------------------------------------------------------------- CLI wiring

def test_cli_query_accepts_full_sparql(spark, tmp_path, capsys):
    """`query` CLI routes full SPARQL text (PREFIX/SELECT detection)
    through the parser, with manifest statistics driving join order."""
    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, tmp_path / "wd", n_convs=30, seed=42)
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "SELECT ?r (COUNT(?t) AS ?n) WHERE { ?t kg:role ?r } "
               "GROUP BY ?r ORDER BY ?r", "--limit", "10"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "r\tn"
    assert "assistant" in out and "user" in out


def test_cli_update_commits_new_snapshot(spark, tmp_path, capsys):
    """`update` CLI: applies a SPARQL Update, commits a NEW snapshot
    (LATEST moves, previous fingerprint stays readable), survivors keep
    lineage metadata and inserts carry update provenance."""
    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.operators.extract import KG_NS
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline
    from openapi_to_rdf_spark.plans.snapshot import read_manifest, read_snapshot

    run_pipeline(spark, tmp_path / "wd", n_convs=30, seed=42)
    wd = str(tmp_path / "wd")
    before = read_manifest(wd + "/graph")["fingerprint"]
    rc = main(["update", "--workdir", wd,
               'DELETE { ?t kg:role "user" } INSERT { ?t kg:role "human" } '
               'WHERE { ?t kg:role "user" }'])
    assert rc == 0
    assert "graph updated" in capsys.readouterr().out
    after = read_manifest(wd + "/graph")
    assert after["fingerprint"] != before
    g = read_snapshot(spark, wd + "/graph")
    roles = {r.o for r in g.filter(F.col("p") == KG_NS + "role")
             .select("o").distinct().collect()}
    assert "human" in roles and "user" not in roles
    ins = g.filter((F.col("o") == "human")).select("file", "o_kind").first()
    assert ins.file == "update" and ins.o_kind == "literal"
    # the pre-update snapshot is still readable by fingerprint
    old = read_snapshot(spark, wd + "/graph", before)
    assert old.filter(F.col("o") == "user").count() > 0
    # statistics were re-analyzed on write: the new predicate set is queryable
    rc = main(["query", "--workdir", wd,
               'ASK WHERE { ?t kg:role "human" }'])
    assert rc == 0
    assert "true" in capsys.readouterr().out.lower()


def test_cli_query_graph_over_store_dataset(spark, tmp_path, capsys):
    """GRAPH queries against the materialized store read the pipeline's
    subgraph column (kg / entail / ...) as the dataset's graph term."""
    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, tmp_path / "wd", n_convs=20, seed=42)
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "SELECT ?g (COUNT(?t) AS ?n) WHERE { "
               "GRAPH ?g { ?t kg:role ?r } } GROUP BY ?g"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0] == "g\tn"
    assert "kg" in out


def test_results_json_and_csv(g, tmp_path):
    import json

    from openapi_to_rdf_spark.sparql import (sparql_results_json,
                                             write_results_csv)

    sel = sparql_query(g, PFX + """SELECT ?x ?a WHERE {
        ?x a "Person" . OPTIONAL { ?x ex:age ?a } } ORDER BY ?x""")
    doc = json.loads(sparql_results_json(sel))
    assert doc["head"]["vars"] == ["x", "a"]
    got = {(b["x"]["value"], b.get("a", {}).get("value"))
           for b in doc["results"]["bindings"]}
    assert got == {("a", "42"), ("b", "7"), ("c", "19")}
    # unbound OPTIONAL variable is OMITTED from its binding, per the spec
    iris = sparql_query(g, PFX + "SELECT ?p WHERE { \"a\" ?p \"b\" }")
    b0 = json.loads(sparql_results_json(iris))["results"]["bindings"][0]
    assert b0["p"]["type"] == "uri"

    ask = json.loads(sparql_results_json(
        sparql_query(g, PFX + 'ASK WHERE { "a" ex:knows "b" }')))
    assert ask == {"head": {}, "boolean": True}

    write_results_csv(sel, str(tmp_path / "res"))
    body = "\n".join(p.read_text() for p in sorted(
        (tmp_path / "res").glob("part-*")))
    lines = {l for l in body.splitlines() if l}
    assert "x,a" in lines and "a,42" in lines


def test_cli_query_formats(spark, tmp_path, capsys):
    import json

    from openapi_to_rdf_spark.cli import main
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, tmp_path / "wd", n_convs=20, seed=42)
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "SELECT ?r (COUNT(?t) AS ?n) WHERE { ?t kg:role ?r } "
               "GROUP BY ?r", "--format", "json"])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["head"]["vars"] == ["r", "n"]
    assert {b["r"]["value"] for b in doc["results"]["bindings"]} >= {
        "user", "assistant"}
    rc = main(["query", "--workdir", str(tmp_path / "wd"),
               "?t kg:role ?r", "--select", "r", "--distinct",
               "--format", "csv"])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "r" and "user" in out


def test_update_empty_data_block_is_noop(g):
    out = sparql_update(g, "INSERT DATA { }")
    assert rows(out) == set(T)


def test_from_dataset_clause_merges_graphs(spark):
    quads = spark.createDataFrame(
        [("g1", "a", EX + "p", "1"), ("g1", "b", EX + "p", "2"),
         ("g2", "a", EX + "p", "1"), ("g2", "c", EX + "p", "3"),
         ("g3", "d", EX + "p", "4")], ["g", "s", "p", "o"])
    # FROM merges g1+g2 with SET semantics: (a p 1) asserted in both
    # graphs yields ONE solution; g3 is outside the dataset
    out = sparql_query(quads, PFX + """SELECT ?s FROM <g1> FROM <g2>
        WHERE { ?s ex:p ?o }""")
    got = [r.s for r in out.collect()]
    assert sorted(got) == ["a", "b", "c"]
    # only FROM NAMED -> the default graph is EMPTY per the spec
    empty = sparql_query(quads, PFX + """SELECT ?s FROM NAMED <g1>
        WHERE { ?s ex:p ?o }""")
    assert empty.count() == 0


def test_from_named_restricts_graph_patterns(spark):
    quads = spark.createDataFrame(
        [("g1", "a", EX + "p", "1"), ("g2", "c", EX + "p", "3"),
         ("g3", "d", EX + "p", "4")], ["g", "s", "p", "o"])
    out = sparql_query(quads, PFX + """SELECT ?g ?s
        FROM NAMED <g1> FROM NAMED <g3>
        WHERE { GRAPH ?g { ?s ex:p ?o } }""")
    assert rows(out) == {("g1", "a"), ("g3", "d")}


def test_from_requires_quad_frame(g):
    with pytest.raises(ValueError, match="quad"):
        sparql_query(g, PFX + "SELECT ?s FROM <g1> WHERE { ?s ex:p ?o }")


# ------------------------------------------------------ SPARQL-star << >>

def _star_graph(spark):
    """Base edges + their reification + one confidence annotation each
    (the rdfstar emission modes a triple factory materializes)."""
    from openapi_to_rdf_spark.operators.rdfstar import annotate, reify

    base = [("t1", EX + "mentions", "e1", "0.90"),
            ("t2", EX + "mentions", "e2", "0.20"),
            ("t1", EX + "role", "user", "0.99")]
    wide = spark.createDataFrame(base, ["s", "p", "o", "confidence"])
    bdf = wide.select("s", "p", "o")
    ann = annotate(wide, {"confidence": EX + "conf"})
    return bdf.unionByName(reify(bdf)).unionByName(ann)


def test_star_ground_quoted_triple(spark):
    g = _star_graph(spark)
    got = sparql_query(g, f"""{PFX}
        SELECT ?c WHERE {{ << <t2> ex:mentions <e2> >> ex:conf ?c }}""")
    assert [r.c for r in got.collect()] == ["0.20"]


def test_star_variable_quoted_triple(spark):
    g = _star_graph(spark)
    got = sparql_query(g, f"""{PFX}
        SELECT ?t ?e ?c WHERE {{
          << ?t ex:mentions ?e >> ex:conf ?c .
          FILTER (?c >= "0.5")
        }} ORDER BY ?t""")
    assert [(r.t, r.e, r.c) for r in got.collect()] == [("t1", "e1", "0.90")]


def test_star_joins_base_graph(spark):
    g = _star_graph(spark)
    # quoted-triple metadata joined with an ordinary pattern on the base
    got = sparql_query(g, f"""{PFX}
        SELECT ?e WHERE {{
          ?t ex:role "user" .
          << ?t ex:mentions ?e >> ex:conf ?c .
        }}""")
    assert [r.e for r in got.collect()] == ["e1"]


def test_star_construct_with_ground_quoted_subject(spark):
    g = _star_graph(spark)
    got = sparql_query(g, f"""{PFX}
        CONSTRUCT {{ << <t1> ex:mentions <e1> >> ex:reviewed "yes" }}
        WHERE {{ ?t ex:role "user" }}""")
    rows = got.collect()
    assert len(rows) == 1
    import hashlib
    stmt = "urn:stmt:" + hashlib.md5(
        "\x01".join(("t1", EX + "mentions", "e1")).encode()).hexdigest()
    assert (rows[0].s, rows[0].p, rows[0].o) == (stmt, EX + "reviewed",
                                                 "yes")
    # and it matches the id rdfstar.annotate minted
    assert g.filter((F.col("s") == stmt)
                    & (F.col("p") == EX + "conf")).count() == 1
