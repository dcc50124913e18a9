"""OWL-mode converter coverage (no goldens exist in the reference — these are
semantics tests derived from rdf_converter.py behavior) + the drop-in library
API wrappers."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from openapi_to_rdf_spark.convert.owl import convert_owl  # noqa: E402
from openapi_to_rdf_spark.triplecore.turtle import parse_turtle  # noqa: E402

from conftest import FIXTURE_DIR, fixture_names  # noqa: E402

OWL = "http://www.w3.org/2002/07/owl#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
NS = "http://example.org/rdf/"
TNS = NS + "test#"  # namespace minted from the filename test.yaml

SPEC = """
openapi: 3.0.1
info:
  title: Test API
  version: 1.2.3
  description: A test
components:
  schemas:
    Thing:
      type: object
      description: A thing
      required: [name]
      properties:
        name:
          type: string
        size:
          type: integer
        other:
          $ref: '#/components/schemas/Color'
    Color:
      type: string
      enum: [RED, BLUE]
    Either:
      oneOf:
        - $ref: '#/components/schemas/Thing'
        - $ref: '#/components/schemas/Color'
"""


def _graph():
    return convert_owl("test.yaml", SPEC, NS)


def test_owl_object_class_and_properties():
    g = _graph()
    triples = {(s[1], p[1], o[1] if o[0] != "l" else o[1]) for s, p, o in g.g}
    cls = TNS + "Thing"
    assert (cls, RDF + "type", OWL + "Class") in triples
    # required string property -> DatatypeProperty + FunctionalProperty
    name_p = TNS + "name"
    assert (name_p, RDF + "type", OWL + "DatatypeProperty") in triples
    assert (name_p, RDFS + "domain", cls) in triples
    # $ref to enum-class -> ObjectProperty (name-heuristic: 'color' has no
    # float/int/string substring)
    other_p = TNS + "other"
    assert (other_p, RDF + "type", OWL + "ObjectProperty") in triples


def test_owl_enum_individuals():
    g = _graph()
    triples = {(s[1], p[1], o[1]) for s, p, o in g.g if o[0] in ("i", "b")}
    # reference rdf_converter.py:192-205: individuals are NamedIndividual +
    # label/comment only (NOT typed as members of the enum class)
    assert (TNS + "RED", RDF + "type", OWL + "NamedIndividual") in triples
    # owl:oneOf list present on the enum class
    assert any(p == OWL + "oneOf" for _, p, _ in ((s[1], p[1], o) for s, p, o in g.g)
               if True)


def test_owl_header_metadata():
    g = _graph()
    lits = {(s[1], p[1], o[1]) for s, p, o in g.g if o[0] == "l"}
    assert any(v == "1.2.3" for _, p, v in lits if p.endswith("version"))


def test_owl_all_fixtures_convert():
    """Every corpus spec converts deterministically with plausible volume."""
    total = 0
    for stem in fixture_names():
        text = (FIXTURE_DIR / f"{stem}.yaml").read_text(encoding="utf-8")
        g1 = convert_owl(f"{stem}.yaml", text, NS)
        g2 = convert_owl(f"{stem}.yaml", text, NS)
        assert g1.g == g2.g  # deterministic
        total += len(g1.g)
    assert total > 10_000


def test_api_wrappers(tmp_path):
    from openapi_to_rdf_spark.api import (
        OpenAPIToRDFConverter, OpenAPIToSHACLConverter,
    )

    spec = tmp_path / "my-api.yaml"
    spec.write_text(SPEC)

    conv = OpenAPIToSHACLConverter(str(spec), output_dir=str(tmp_path / "out"))
    rdf_path, shacl_path = conv.run()
    assert pathlib.Path(rdf_path).name == "my_api_rdf.ttl"
    assert parse_turtle(pathlib.Path(rdf_path).read_text())
    assert parse_turtle(pathlib.Path(shacl_path).read_text())
    assert conv.rdf_triples and conv.shacl_triples

    owl = OpenAPIToRDFConverter(str(spec), output_dir=str(tmp_path / "out2"))
    path = owl.run()
    assert parse_turtle(pathlib.Path(path).read_text())


def test_owl_shacl_cross_consistency_all_fixtures():
    """OWL mode has no reference goldens; cross-check it against the
    golden-gated SHACL mode over ALL 38 fixtures, scoped to TOP-LEVEL
    schemas: (a) every top-level `type: object` schema yields an owl:Class,
    and (b) every owl:Class that names a top-level schema also exists as a
    SHACL-mode rdfs:Class. Full equality is wrong by the reference's own
    design: the OWL handler covers only object/enum/oneOf schemas, mints a
    header-metadata class from info.title, and registers INLINE property
    objects as named classes (rdf_converter.py:238-318) where SHACL mode
    keeps them anonymous NodeShapes — those stay out of scope here."""
    import pathlib

    import yaml

    from openapi_to_rdf_spark.convert.owl import OWL_NS, convert_owl
    from openapi_to_rdf_spark.convert.shacl import convert_shacl, format_name

    fixture_dir = pathlib.Path(
        "/root/reference/assets/MnS-Rel-19-OpenAPI/OpenAPI")
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rdfs_class = "http://www.w3.org/2000/01/rdf-schema#Class"
    checked = 0
    for path in sorted(fixture_dir.glob("*.yaml")):
        text = path.read_text()
        owl = convert_owl(path.name, text, "http://x/rdf/")
        sh = convert_shacl(path.name, text)
        owl_classes = {s[1].rsplit("#", 1)[-1] for s, p, o in owl.g
                       if p[1] == rdf_type and o == ("i", OWL_NS + "Class")}
        shacl_classes = {s[1].rsplit("#", 1)[-1] for s, p, o in sh.rdf
                         if p[1] == rdf_type and o == ("i", rdfs_class)}
        data = yaml.safe_load(text) or {}
        schemas = (data.get("components") or {}).get("schemas", {}) or {}
        top_names = {format_name(n) for n in schemas}
        obj_names = {format_name(n) for n, d in schemas.items()
                     if isinstance(d, dict) and d.get("type") == "object"}
        # (a) coverage: every top-level object schema became an owl:Class
        missing_owl = obj_names - owl_classes
        assert not missing_owl, f"{path.name}: no owl:Class for {sorted(missing_owl)[:5]}"
        # (b) consistency: OWL's top-level classes all exist in SHACL mode
        owl_only = (owl_classes & top_names) - shacl_classes
        assert not owl_only, f"{path.name}: OWL-only classes {sorted(owl_only)[:5]}"
        checked += 1
    assert checked == 38


def test_register_views_sql_surface(spark, tmp_path):
    """Everything is reachable through spark.sql too: testdata views + the
    materialized KG graph view."""
    from openapi_to_rdf_spark.api import register_views
    from openapi_to_rdf_spark.plans.pipeline import run_pipeline

    run_pipeline(spark, tmp_path / "wd", n_convs=30, seed=2)
    names = register_views(spark, "/root/testdata/sf0.001",
                           graph_dir=str(tmp_path / "wd" / "graph"))
    assert "documents" in names and "kg_graph" in names
    n_docs = spark.sql("SELECT COUNT(*) AS n FROM documents").first().n
    assert n_docs == 500
    roles = spark.sql("""
        SELECT o AS role, COUNT(*) AS n FROM kg_graph
        WHERE p LIKE '%#role' GROUP BY o ORDER BY o
    """).collect()
    assert {r.role for r in roles} <= {"user", "assistant", "tool", "system"}
    assert sum(r.n for r in roles) > 0
