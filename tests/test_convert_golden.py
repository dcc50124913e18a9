"""The P/R >= 0.95 correctness gate (BASELINE.json `metric`).

Runs the pure spec->triples function over every reference fixture and compares
bnode-canonicalized triple sets against the committed goldens
(/root/reference/output/{rdf,shacl}/*.ttl). Target is exact match (1.0);
the assertion threshold is the mandated 0.95.
"""

import pathlib

import pytest

from openapi_to_rdf_spark.convert.shacl import convert_shacl
from openapi_to_rdf_spark.triplecore.turtle import parse_turtle
from openapi_to_rdf_spark.triplecore.canon import precision_recall

from conftest import FIXTURE_DIR, GOLDEN_RDF, GOLDEN_SHACL, fixture_names

THRESHOLD = 0.95


@pytest.mark.parametrize("stem", fixture_names())
def test_golden_pr(stem):
    spec = (FIXTURE_DIR / f"{stem}.yaml").read_text()
    conv = convert_shacl(f"{stem}.yaml", spec)
    golden_rdf = parse_turtle((GOLDEN_RDF / f"{stem}_rdf.ttl").read_text())
    golden_sh = parse_turtle((GOLDEN_SHACL / f"{stem}_shacl.ttl").read_text())
    pr_rdf = precision_recall(conv.rdf, golden_rdf)
    pr_sh = precision_recall(conv.sh, golden_sh)
    assert pr_rdf["precision"] >= THRESHOLD, pr_rdf
    assert pr_rdf["recall"] >= THRESHOLD, pr_rdf
    assert pr_sh["precision"] >= THRESHOLD, pr_sh
    assert pr_sh["recall"] >= THRESHOLD, pr_sh


def test_corpus_is_complete():
    assert len(fixture_names()) == 38
