"""Schema discovery: operators.shapes.infer_shapes (rules FROM data)."""

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.operators.shapes import (  # noqa: E402
    RDF_TYPE, SH, infer_shapes, validate_triples,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
KG = "http://example.org/kg#"


def _t(spark, rows):
    """rows: (s, p, o, o_kind, o_datatype)."""
    return spark.createDataFrame(
        [("f", "kg", *r) for r in rows],
        "file string, graph string, s string, p string, o string, "
        "o_kind string, o_datatype string")


def _corpus(spark):
    rows = []
    for i in range(4):
        s = f"ent{i}"
        rows.append((s, RDF_TYPE, KG + "Thing", "iri", None))
        rows.append((s, KG + "name", f"name-{i}", "literal", XSD + "string"))
        rows.append((s, KG + "status", "on" if i % 2 else "off", "literal",
                     XSD + "string"))
        rows.append((s, KG + "linkedTo", f"other{i}", "iri", None))
        if i < 2:  # optional property: only half the subjects carry it
            rows.append((s, KG + "note", f"n{i}", "literal", XSD + "string"))
        if i == 0:  # multi-valued on one subject
            rows.append((s, KG + "linkedTo", "extra", "iri", None))
    return _t(spark, rows)


def test_infer_cardinality_datatype_kind_and_enum(spark):
    rules = {r.path: r for r in infer_shapes(_corpus(spark)).collect()}

    name = rules[KG + "name"]
    assert (name.target_class, name.min_count, name.max_count) == (KG + "Thing", 1, 1)
    assert name.datatype == XSD + "string"
    assert name.node_kind is None          # literals, not IRIs
    assert name.in_values == ["name-0", "name-1", "name-2", "name-3"]

    status = rules[KG + "status"]
    assert status.in_values == ["off", "on"]   # the enum heuristic
    assert (status.min_count, status.max_count) == (1, 1)

    note = rules[KG + "note"]
    assert note.min_count == 0             # absent on some subjects
    assert note.max_count == 1

    linked = rules[KG + "linkedTo"]
    assert linked.node_kind == SH + "IRI"
    assert linked.datatype is None
    assert linked.in_values is None        # IRIs are never enum candidates
    assert (linked.min_count, linked.max_count) == (1, 2)


def test_infer_enum_respects_max_in(spark):
    rules = {r.path: r
             for r in infer_shapes(_corpus(spark), max_in=2).collect()}
    assert rules[KG + "name"].in_values is None       # 4 distinct > 2
    assert rules[KG + "status"].in_values == ["off", "on"]


def test_infer_mixed_kinds_emit_neither_datatype_nor_kind(spark):
    t = _t(spark, [
        ("a", RDF_TYPE, KG + "T", "iri", None),
        ("a", KG + "p", "lit", "literal", XSD + "string"),
        ("a", KG + "p", "someiri", "iri", None),
    ])
    r = infer_shapes(t).collect()[0]
    assert r.datatype is None and r.node_kind is None
    assert r.in_values is None            # mixed kinds never enum


def test_infer_duplicate_rows_do_not_inflate_counts(spark):
    base = [("a", RDF_TYPE, KG + "T", "iri", None),
            ("a", KG + "p", "v", "literal", XSD + "string")]
    t = _t(spark, base + base)            # every triple duplicated
    r = [x for x in infer_shapes(t).collect() if x.path == KG + "p"][0]
    assert (r.min_count, r.max_count) == (1, 1)


def test_self_consistency_source_validates_clean(spark):
    """The defining invariant: a graph always satisfies its own inferred
    shapes (and a mutated graph does not)."""
    src = _corpus(spark)
    rules = infer_shapes(src)
    assert validate_triples(src, rules).count() == 0

    # plant a violation: ent1 gets a second status value (maxCount 1)
    bad = src.unionByName(_t(spark, [
        ("ent1", KG + "status", "degraded", "literal", XSD + "string")]))
    v = validate_triples(bad, rules).collect()
    kinds = {r.violation for r in v}
    # the extra value breaks maxCount AND falls outside the inferred sh:in
    assert "cardinalityViolation" in kinds
    assert "notInList" in kinds


def test_kg_pipeline_graph_self_validates(spark):
    """End-to-end on the real extractor output: infer from the transcript
    KG, validate the same graph -> clean."""
    from openapi_to_rdf_spark.operators.extract import extract_transcript_triples
    from openapi_to_rdf_spark.sources.transcripts import (
        class_vocab_df, synth_transcripts,
    )

    triples = extract_transcript_triples(synth_transcripts(spark, 40, seed=3),
                                         class_vocab_df(spark))
    rules = infer_shapes(triples)
    assert rules.count() > 0
    assert validate_triples(triples, rules).count() == 0


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "file string, target_class string, path string, "
              "datatype string, min_count int, max_count int, "
              "in_values array<string>, node_kind string, pattern string")


def test_shape_drift_facets(spark):
    from openapi_to_rdf_spark.operators.shapes import shape_drift

    old = _rules(spark, [
        ("f", KG + "T", KG + "a", XSD + "string", 1, 1, ["x", "y"], None, None),
        ("f", KG + "T", KG + "gone", None, 0, 1, None, None, None),
        ("f", None, KG + "u", None, None, None, None, None, None),
    ])
    new = _rules(spark, [
        ("f", KG + "T", KG + "a", XSD + "integer", 0, 2, ["x", "y", "z"],
         None, None),
        ("f", KG + "T", KG + "fresh", None, 1, 1, None, None, None),
        ("f", None, KG + "u", None, None, None, None, None, None),
    ])
    got = {(r.target_class, r.path, r.change): (r.before, r.after)
           for r in shape_drift(old, new).collect()}
    assert got == {
        (KG + "T", KG + "a", "datatype_changed"): (XSD + "string", XSD + "integer"),
        (KG + "T", KG + "a", "min_count_changed"): ("1", "0"),
        (KG + "T", KG + "a", "max_count_changed"): ("1", "2"),
        (KG + "T", KG + "a", "in_values_changed"): ("x,y", "x,y,z"),
        (KG + "T", KG + "gone", "property_removed"): (None, None),
        (KG + "T", KG + "fresh", "property_added"): (None, None),
    }


def test_shape_drift_composes_with_inference(spark):
    """Data drift end-to-end: inferring shapes over a corpus generation
    that loses a conditional property reports property_removed (and the
    cardinality consequences), nothing else spurious."""
    from openapi_to_rdf_spark.operators.shapes import infer_shapes, shape_drift

    full = _corpus(spark)
    # second generation: the optional note property disappears entirely
    reduced = full.filter(F.col("p") != KG + "note")
    drift = shape_drift(infer_shapes(full), infer_shapes(reduced)).collect()
    got = {(r.path, r.change) for r in drift}
    assert (KG + "note", "property_removed") in got
    # nothing else about the surviving properties changed
    assert all(p == KG + "note" for p, _ in got)


def test_shape_drift_identical_is_empty(spark):
    from openapi_to_rdf_spark.operators.shapes import infer_shapes, shape_drift

    src = _corpus(spark)
    assert shape_drift(infer_shapes(src), infer_shapes(src)).count() == 0


def test_infer_value_class_and_numeric_range(spark):
    """value_class requires a COMMON type across every distinct object
    node; min/max_inclusive require every literal to parse numerically
    and keep the original lexical forms."""
    rows = [
        ("a1", RDF_TYPE, KG + "Alarm", "iri", None),
        ("a2", RDF_TYPE, KG + "Alarm", "iri", None),
        # every source object typed Device -> value_class
        ("a1", KG + "source", "d1", "iri", None),
        ("a2", KG + "source", "d2", "iri", None),
        ("d1", RDF_TYPE, KG + "Device", "iri", None),
        ("d2", RDF_TYPE, KG + "Device", "iri", None),
        # one untyped target -> no common class for seenBy
        ("a1", KG + "seenBy", "d1", "iri", None),
        ("a2", KG + "seenBy", "ghost", "iri", None),
        # numeric literals -> observed range, lexical forms preserved
        ("a1", KG + "level", "5", "literal", XSD + "integer"),
        ("a2", KG + "level", "-3.5", "literal", XSD + "decimal"),
        # one non-numeric literal poisons the range for note
        ("a1", KG + "note", "7", "literal", XSD + "string"),
        ("a2", KG + "note", "high", "literal", XSD + "string"),
    ]
    rules = {r.path: r for r in infer_shapes(_t(spark, rows)).collect()
             if r.target_class == KG + "Alarm"}
    assert rules[KG + "source"]["value_class"] == KG + "Device"
    assert rules[KG + "seenBy"]["value_class"] is None
    lvl = rules[KG + "level"]
    assert (lvl["min_inclusive"], lvl["max_inclusive"]) == ("-3.5", "5")
    assert rules[KG + "note"]["min_inclusive"] is None
    # d1/d2 are typed subjects too: Device has no properties -> no rules
    # beyond Alarm's; self-validation must stay clean with the new facets
    src = _t(spark, rows)
    assert validate_triples(src, infer_shapes(src)).count() == 0


# --------------------------------------------------------------------------
# W3C validation-report triples
# --------------------------------------------------------------------------

def _report(spark, violations_rows):
    from openapi_to_rdf_spark.operators.shapes import (
        validation_report_triples)

    v = spark.createDataFrame(
        violations_rows,
        "s string, p string, o string, violation string, detail string")
    return validation_report_triples(v)


def test_report_conforms_true_when_no_violations(spark):
    t = _report(spark, [])
    rows = {(r.s, r.p, r.o) for r in t.collect()}
    assert ("_:report", RDF_TYPE, SH + "ValidationReport") in rows
    assert ("_:report", SH + "conforms", "true") in rows
    assert len(rows) == 2


def test_report_result_shape_and_components(spark):
    t = _report(spark, [
        ("e1", KG + "age", "abc", "datatypeMismatch",
         "expected integer got string"),
        ("e2", KG + "role", None, "cardinalityViolation",
         "count=0 min=1 max=-"),
        ("e3", KG + "tag", None, "cardinalityViolation",
         "count=5 min=- max=2"),
    ]).collect()
    by_sp = {}
    for r in t:
        by_sp.setdefault((r.s, r.p), []).append(r)
    # conforms false with results attached
    assert any(r.o == "false" and r.o_datatype and r.o_datatype.endswith(
        "boolean") for r in by_sp[("_:report", SH + "conforms")])
    results = [r.o for r in by_sp[("_:report", SH + "result")]]
    assert len(results) == 3 and all(o.startswith("_:vr_") for o in results)
    comp = {r.s: r.o for r in t
            if r.p == SH + "sourceConstraintComponent"}
    focus = {r.o: r.s for r in t if r.p == SH + "focusNode"}
    assert comp[focus["e1"]] == SH + "DatatypeConstraintComponent"
    assert comp[focus["e2"]] == SH + "MinCountConstraintComponent"
    assert comp[focus["e3"]] == SH + "MaxCountConstraintComponent"
    # sh:value present only where o was non-null
    vals = [r for r in t if r.p == SH + "value"]
    assert len(vals) == 1 and vals[0].o == "abc"


def test_report_components_for_class_and_range(spark):
    t = _report(spark, [
        ("e1", KG + "source", "me#ghost", "classViolation",
         "expected instance of " + KG + "ManagedElement"),
        ("e2", KG + "level", "-3", "minInclusiveViolation",
         "minInclusive 0 got -3"),
        ("e3", KG + "level", "99", "maxInclusiveViolation",
         "maxInclusive 10 got 99"),
    ]).collect()
    comp = {r.s: r.o for r in t if r.p == SH + "sourceConstraintComponent"}
    focus = {r.o: r.s for r in t if r.p == SH + "focusNode"}
    assert comp[focus["e1"]] == SH + "ClassConstraintComponent"
    assert comp[focus["e2"]] == SH + "MinInclusiveConstraintComponent"
    assert comp[focus["e3"]] == SH + "MaxInclusiveConstraintComponent"


def test_report_ids_content_hashed_and_deterministic(spark):
    rows = [("e1", KG + "x", "v", "notInList", "a,b"),
            ("e2", KG + "x", "v", "notInList", "a,b")]
    a = {(r.s, r.p, r.o) for r in _report(spark, rows).collect()}
    b = {(r.s, r.p, r.o)
         for r in _report(spark, list(reversed(rows))).collect()}
    assert a == b
    # distinct violations -> distinct result nodes
    ids = {r.s for r in _report(spark, rows).collect()
           if r.p == SH + "focusNode"}
    assert len(ids) == 2


def test_report_round_trips_from_validate_triples(spark):
    """End to end: planted violation -> validate -> report triples are a
    valid TRIPLES_SCHEMA frame queryable for the failing focus node."""
    from openapi_to_rdf_spark.operators.shapes import (
        validation_report_triples)

    rules = spark.createDataFrame(
        [("f", None, KG + "age", None, None, XSD + "integer", None, None,
          None)],
        "file string, target_class string, path string, min_count long, "
        "max_count long, datatype string, in_values array<string>, "
        "node_kind string, pattern string")
    bad = _t(spark, [("e9", KG + "age", "xyz", "literal", XSD + "string")])
    rep = validation_report_triples(validate_triples(bad, rules))
    assert rep.columns == ["file", "graph", "s", "p", "o_kind", "o",
                           "o_datatype"]
    focus = [r.o for r in rep.collect() if r.p == SH + "focusNode"]
    assert focus == ["e9"]


# --------------------------------------------------------------------------
# RDF list integrity
# --------------------------------------------------------------------------

def test_list_integrity_flags_malformed_cons_structures(spark):
    from openapi_to_rdf_spark.operators.rdflists import (
        RDF_FIRST, RDF_NIL, RDF_REST, list_integrity)

    rows = [
        # well-formed: h -> c2 -> nil
        ("_:h", RDF_FIRST, "a", "literal", None),
        ("_:h", RDF_REST, "c2", "bnode", None),
        ("_:c2", RDF_FIRST, "b", "literal", None),
        ("_:c2", RDF_REST, RDF_NIL, "iri", None),
        # two firsts
        ("_:m", RDF_FIRST, "x", "literal", None),
        ("_:m", RDF_FIRST, "y", "literal", None),
        ("_:m", RDF_REST, RDF_NIL, "iri", None),
        # first without rest
        ("_:x", RDF_FIRST, "z", "literal", None),
        # rest into a node that is no cons cell
        ("_:d", RDF_FIRST, "w", "literal", None),
        ("_:d", RDF_REST, "ghost", "bnode", None),
        # second list merging into c2
        ("_:s1", RDF_FIRST, "s", "literal", None),
        ("_:s1", RDF_REST, "c2", "bnode", None),
        # 2-cycle
        ("_:y1", RDF_FIRST, "p", "literal", None),
        ("_:y1", RDF_REST, "y2", "bnode", None),
        ("_:y2", RDF_FIRST, "q", "literal", None),
        ("_:y2", RDF_REST, "y1", "bnode", None),
    ]
    t = spark.createDataFrame(
        [("f", "kg", *r) for r in rows],
        "file string, graph string, s string, p string, o string, "
        "o_kind string, o_datatype string")
    got = {(r.cell, r.issue) for r in list_integrity(t).collect()}
    assert got == {
        ("_:m", "multi_first"),
        ("_:x", "missing_rest"),
        ("_:d", "dangling_rest"),
        ("_:c2", "shared_tail"),
        ("_:y1", "unterminated"),
        ("_:y2", "unterminated"),
    }


# --------------------------------------------------------------------------
# WL graph signatures
# --------------------------------------------------------------------------

def test_graph_digest_bnode_relabel_invariant(spark):
    from openapi_to_rdf_spark.operators.graphsig import graph_digest

    def g(b1, b2):
        return spark.createDataFrame([
            ("e1", KG + "via", b1), (b1, KG + "to", "e2"),
            ("e2", KG + "via", b2), (b2, KG + "to", "e3"),
            (b1, KG + "tag", "hot"),
        ], "s string, p string, o string")

    d1 = graph_digest(g("_:a", "_:b")).collect()[0]
    d2 = graph_digest(g("_:x9", "_:q")).collect()[0]     # relabeled bnodes
    assert (d1.digest, d1.n_nodes, d1.n_triples) == \
           (d2.digest, d2.n_nodes, d2.n_triples)

    # renaming a NAMED node or dropping a triple must move the digest
    d3 = graph_digest(g("_:a", "_:b").withColumn(
        "o", F.when(F.col("o") == "e3", "e4").otherwise(F.col("o"))))
    assert d3.collect()[0].digest != d1.digest
    d4 = graph_digest(g("_:a", "_:b").filter(F.col("p") != KG + "tag"))
    assert d4.collect()[0].digest != d1.digest


def test_wl_colors_distinguish_bnode_structure(spark):
    from openapi_to_rdf_spark.operators.graphsig import wl_colors

    t = spark.createDataFrame([
        # _:a and _:b have identical neighborhoods; _:c differs
        ("e1", KG + "via", "_:a"), ("_:a", KG + "to", "e2"),
        ("e1", KG + "via", "_:b"), ("_:b", KG + "to", "e2"),
        ("e1", KG + "via", "_:c"), ("_:c", KG + "to", "e3"),
    ], "s string, p string, o string")
    colors = {r.node: r.color for r in wl_colors(t, rounds=2).collect()}
    assert colors["_:a"] == colors["_:b"]
    assert colors["_:a"] != colors["_:c"]


def test_discover_keys_flags_identity_candidates(spark):
    from openapi_to_rdf_spark.operators.kgstats import discover_keys

    rows = [
        # uid: unique both ways -> functional + inverse_functional
        ("e1", KG + "uid", "u1"), ("e2", KG + "uid", "u2"),
        # role: functional fan-in -> functional only
        ("e1", KG + "role", "admin"), ("e2", KG + "role", "admin"),
        # tag: multi-valued -> neither
        ("e1", KG + "tag", "a"), ("e1", KG + "tag", "b"),
        ("e2", KG + "tag", "a"),
        # duplicate assertion must not break functionality
        ("e1", KG + "role", "admin"),
        # rdf:type excluded entirely
        ("e1", RDF_TYPE, KG + "T"), ("e2", RDF_TYPE, KG + "T"),
    ]
    t = spark.createDataFrame(rows, "s string, p string, o string")
    got = {r.p: r for r in discover_keys(t).collect()}
    assert RDF_TYPE not in got
    assert (got[KG + "uid"].functional,
            got[KG + "uid"].inverse_functional) == (True, True)
    assert (got[KG + "role"].functional,
            got[KG + "role"].inverse_functional) == (True, False)
    assert (got[KG + "tag"].functional,
            got[KG + "tag"].inverse_functional) == (False, False)
    assert got[KG + "role"].n_pairs == 2  # deduped


# --------------------------------------------------------------------------
# Statement-level metadata (reification / RDF-star skolems)
# --------------------------------------------------------------------------

def test_reify_and_annotate_round_trip_through_bgp(spark):
    from openapi_to_rdf_spark.operators.bgp import bgp_query
    from openapi_to_rdf_spark.operators.rdfstar import annotate, reify

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    t = spark.createDataFrame(
        [("e1", KG + "mentions", "ent#a", "turn0", 0.9),
         ("e2", KG + "mentions", "ent#b", "turn1", 0.2),
         ("e1", KG + "mentions", "ent#a", "turn0", 0.9)],  # dup collapses
        "s string, p string, o string, src string, conf double")
    graph = reify(t).unionByName(annotate(
        t, {"src": KG + "fromTurn", "conf": KG + "confidence"}))
    assert graph.count() == 2 * 4 + 2 * 2

    # statement ids are content-addressed: both emissions agree, any
    # partitioning/order agrees
    low = bgp_query(graph, [
        ("?st", KG + "confidence", "0.2"),
        ("?st", RDF + "subject", "?s"),
        ("?st", RDF + "object", "?o"),
    ])
    assert [(r.s, r.o) for r in low.collect()] == [("e2", "ent#b")]


def test_statement_ids_deterministic_across_runs(spark):
    from openapi_to_rdf_spark.operators.rdfstar import reify

    t = spark.createDataFrame([("a", "p", "b"), ("c", "q", "d")],
                              "s string, p string, o string")
    a = {(r.s, r.p, r.o) for r in reify(t).collect()}
    b = {(r.s, r.p, r.o)
         for r in reify(t.repartition(7).sortWithinPartitions("o"))
         .collect()}
    assert a == b
